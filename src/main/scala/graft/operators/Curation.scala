package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Corpus-curation operators a production training-data pipeline runs
  * between raw crawl and tokenizer: repetition-based quality filters
  * (the Gopher rules: duplicate-line fraction, duplicate-line character
  * fraction, top n-gram character fraction), C4-style line/page
  * heuristics, URL canonicalization + registered-domain rollups,
  * deterministic dataset splits, per-source mixture sampling, and
  * greedy sequence packing into token-budget bins.
  *
  * Everything is a pure column program (codegen'd, no UDFs) with an
  * exact DuckDB mirror in the corresponding queries. The fixture corpus
  * is single-line word soup, so the line-shaped operators take a LINES
  * relation as input; the queries derive it by deterministic reflow
  * (`reflowLines`) plus dirty-fixture injection (`boilerplateLines`,
  * the same injector pattern as `TextAnalysis.injectPii` and the media
  * encode fixtures) — in production the lines relation is just
  * `split(text, '\n')` exploded.
  *
  * Scale shape: per-doc filters are one explode + one (doc-keyed)
  * aggregation — a single hash shuffle keyed by doc_id, linear in
  * corpus size, no driver state. Reference semantics extended per
  * SURVEY §2.12 (north-star extension; reference has no data-quality
  * surface — `/root/reference/README.md:18-22` defines only the
  * map/reduce loop).
  */
object Curation {

  val WordsPerLine = 8

  /** Reflow each document's normalized word stream into fixed-width
    * pseudo-lines. Output: doc_id, line_id (0-based INT), line.
    *
    * The per-doc `transform(sequence(...))` re-evaluates the normalize+
    * split chain per line if Catalyst inlines it through the projection
    * (no CSE inside HOF lambdas — SURVEY §8); with bounded document
    * length that is a bounded constant factor, not a scale hazard.
    * Mirror: `unnest(range(0, nl)) AS i` + `array_to_string(ws[i*W+1 :
    * i*W+W], ' ')`. */
  def reflowLines(docs: DataFrame, wordsPerLine: Int = WordsPerLine): DataFrame = {
    val w = lit(wordsPerLine)
    docs
      .withColumn("ws", words(normText(col("text"))))
      .withColumn("nl", floor((size(col("ws")) + (wordsPerLine - 1)) / w).cast("int"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("nl") - 1),
          i => array_join(slice(col("ws"), i * w + 1, w), " "))))
      .toDF("doc_id", "line_id", "line")
  }

  /** The injected boilerplate line (word-soup-disjoint vocabulary so it
    * never collides with an organic reflowed line). */
  val BoilerLine = "subscribe to our newsletter click here for more"

  /** Dirty-fixture injector: docs hit by the modulus gain `base +
    * doc_id % mod` copies of [[BoilerLine]] (line_ids from 1000, disjoint
    * from reflowed ids). Models the boilerplate-heavy web page the
    * repetition filters exist to catch. */
  def boilerplateLines(docs: DataFrame, every: Int = 7, base: Int = 3,
                       mod: Int = 5): DataFrame =
    docs.filter(col("doc_id") % every === 0)
      .select(col("doc_id"),
        posexplode(array_repeat(lit(BoilerLine),
          (lit(base) + col("doc_id") % mod).cast("int"))))
      .select(col("doc_id"), (col("pos") + 1000).cast("int").as("line_id"),
        col("col").as("line"))

  /** Gopher-style duplicate-line repetition stats over a lines relation:
    * fraction of lines that are duplicates (counted with multiplicity)
    * and fraction of characters living in duplicated lines. Both are
    * integer/integer divisions — IEEE-exact cross-engine, no rounding.
    * One shuffle keyed by (doc_id, line), one by doc_id.
    * Output: doc_id, n_lines, dup_line_frac, dup_char_frac, rep_ok. */
  def repetitionStats(lines: DataFrame, maxDupLineFrac: Double = 0.30,
                      maxDupCharFrac: Double = 0.20): DataFrame = {
    val cnts = lines.groupBy("doc_id", "line")
      .agg(count(lit(1)).as("cnt"))
      .select(col("doc_id"), col("cnt"), length(col("line")).cast("long").as("len"))
    cnts.groupBy("doc_id")
      .agg(
        sum(col("cnt")).as("n_lines"),
        sum(when(col("cnt") > 1, col("cnt")).otherwise(0L)).as("dup_lines"),
        sum(col("cnt") * col("len")).as("all_chars"),
        sum(when(col("cnt") > 1, col("cnt") * col("len")).otherwise(0L)).as("dup_chars"))
      .select(col("doc_id"), col("n_lines"),
        (col("dup_lines").cast("double") / col("n_lines")).as("dup_line_frac"),
        (col("dup_chars").cast("double") / col("all_chars")).as("dup_char_frac"))
      .withColumn("rep_ok",
        col("dup_line_frac") <= maxDupLineFrac
          && col("dup_char_frac") <= maxDupCharFrac)
  }

  /** Gopher top n-gram character fraction: the single most frequent word
    * n-gram's characters (count × gram length) as a fraction of the
    * normalized document's characters. Deterministic argmax via
    * (count DESC, gram ASC). `bound` is the keep threshold (Gopher uses
    * 0.20 for 2-grams, 0.18 for 3-grams).
    * Output: doc_id, gram_n, top_gram, top_cnt, top_frac, gram_ok. */
  def topNgramStats(docs: DataFrame, n: Int, bound: Double): DataFrame = {
    val p = docs
      .withColumn("norm", normText(col("text")))
      .withColumn("nc", length(col("norm")).cast("long"))
      .withColumn("ws", words(col("norm")))
    val grams = p.select(col("doc_id"), col("nc"),
      explode(shingles(col("ws"), n)).as("g"))
    val cnts = grams.groupBy("doc_id", "nc", "g").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("cnt").desc, col("g"))
    cnts.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("doc_id"), lit(n).as("gram_n"), col("g").as("top_gram"),
        col("cnt").as("top_cnt"),
        ((col("cnt") * length(col("g"))).cast("double") / col("nc")).as("top_frac"))
      .withColumn("gram_ok", col("top_frac") <= bound)
  }

  /** C4-style page cleaning over a (possibly decorated) lines relation:
    * keep lines that end in terminal punctuation AND have ≥ `minWords`
    * words; flag pages containing a blocklist marker anywhere; keep
    * pages with ≥ `minKeptLines` surviving lines and no marker.
    * Output: doc_id, n_lines, n_kept, has_bad, page_kept. */
  def c4Stats(lines: DataFrame, minWords: Int = 5, minKeptLines: Int = 3,
              badMarker: String = "lorem ipsum"): DataFrame = {
    val kept = lines.select(col("doc_id"),
      (col("line").endsWith(".")
        && size(split(col("line"), " ")) >= minWords).cast("long").as("k"),
      col("line").contains(badMarker).cast("long").as("bad"))
    kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"), sum(col("k")).as("n_kept"),
        (max(col("bad")) === 1).as("has_bad"))
      .withColumn("page_kept", !col("has_bad") && col("n_kept") >= minKeptLines)
  }

  /** Stateless column-program form of the C4 page gate over REAL lines
    * (`split(text, '\n')`): pure per-row array programs — no explode, no
    * shuffle, no state — so the identical expression runs unchanged in a
    * streaming append pipeline (StreamingCurationSpec pins that, and
    * CurationSpec pins equivalence with `c4Stats` over exploded lines).
    * This is the form a 100 TB ingest filter actually ships: gate at the
    * scan, before anything wide. */
  def c4PageGate(text: Column, minWords: Int = 5, minKeptLines: Int = 3,
                 badMarker: String = "lorem ipsum"): Column = {
    val lines = split(text, "\n")
    val kept = filter(lines, l =>
      l.endsWith(".") && size(split(l, " ")) >= minWords)
    val bad = exists(lines, l => l.contains(badMarker))
    !bad && size(kept) >= minKeptLines
  }

  /** CCNet-style cross-document line deduplication: keep only the FIRST
    * corpus-wide occurrence of each distinct line, "first" = lowest
    * (doc_id, line_id) encoded as `doc_id·10⁶ + line_id` so the winner
    * is a plain `min` — a partial→final aggregate in which hot
    * boilerplate lines (the very thing this filter removes) combine
    * map-side instead of piling their millions of copies onto one
    * window partition. The per-doc survival report then needs NO join
    * back to the lines: each distinct line has exactly one winner, so
    * regrouping the winners by their encoded doc_id yields kept
    * lines/chars directly — two aggregate shuffles total, no skew
    * hazard, no row_number over a hot key.
    *
    * Fractions are int/int divisions — IEEE-exact cross-engine.
    * Output: doc_id, n_lines, n_kept, kept_line_frac, kept_char_frac. */
  def crossDocLineDedup(lines: DataFrame): DataFrame = {
    val wins = lines
      .groupBy("line")
      .agg(min(col("doc_id") * 1000000L + col("line_id")).as("win"))
      .select(floor(col("win") / 1000000L).cast("long").as("doc_id"),
        length(col("line")).cast("long").as("len"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"), sum(col("len")).as("kept_chars"))
    val totals = lines.groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"),
        sum(length(col("line")).cast("long")).as("all_chars"))
    totals.join(wins, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (coalesce(col("n_kept"), lit(0L)).cast("double") / col("n_lines"))
          .as("kept_line_frac"),
        (coalesce(col("kept_chars"), lit(0L)).cast("double") / col("all_chars"))
          .as("kept_char_frac"))
  }

  /** Deterministic hash split: the Knuth multiplicative hash over a
    * 31-bit-masked doc_id (mask first — Spark wraps on Long overflow
    * while DuckDB raises, see x22) mapped to [0,1000); `cuts` are the
    * per-mille boundaries train/val/test. No RNG: reproducible across
    * engines, retries, and corpus growth (a doc's split never changes).
    * Output: doc_id + split. */
  def datasetSplit(docs: DataFrame, trainPerMille: Int = 800,
                   valPerMille: Int = 900): DataFrame = {
    val h = (col("doc_id") % 2147483647L) * 2654435761L % 1000
    docs.withColumn("split",
      when(h < trainPerMille, "train")
        .when(h < valPerMille, "val")
        .otherwise("test"))
  }

  /** Per-source mixture sampling: each source keeps a deterministic
    * fraction of its docs (hash-thresholded — no RNG, so the sample is
    * stable under reruns and corpus appends). `ratePct` maps a source
    * name to its target keep-percentage as a Column program.
    * Output: docs + target_pct + kept. */
  def mixtureSample(docs: DataFrame, ratePct: Column): DataFrame = {
    // a different salt than datasetSplit so the two hashes are independent
    val h = ((col("doc_id") + 7919L) % 2147483647L) * 2654435761L % 100
    docs.withColumn("target_pct", ratePct).withColumn("kept", h < col("target_pct"))
  }

  /** α-TEMPERATURE mixture weighting — the data-mixing recipe (Pile /
    * LLaMA style): per-source sampling weight ∝ n_tokens^α with α = ½,
    * normalized over sources, and the implied epochs per source for a
    * fixed token budget (weight·budget / n_tokens — upsampled small
    * sources read > 1 epoch, downsampled big ones < 1). α = ½ keeps the
    * power a true IEEE `sqrt` (correctly rounded by the standard, so
    * cross-engine exact with no rounding contract); the normalizer is an
    * exact DECIMAL sum of round-6 values cast back once — the 1-row
    * broadcast L1 pattern, so the plan is one source-keyed aggregate plus
    * a scalar broadcast at any corpus size.
    * Output: source, n_docs, n_tokens, weight, epochs. */
  def mixtureWeights(docs: DataFrame, budgetTokens: Long): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val per = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(size(words(normText(col("text")))).cast("long")).as("n_tokens"))
      .withColumn("w_raw", round(sqrt(col("n_tokens").cast("double")), 6))
    val tot = per.agg(sum(col("w_raw").cast(dec)).cast("double").as("tw"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("w_raw") / col("tw"), 6).as("weight"))
      .withColumn("epochs",
        round(col("weight") * budgetTokens / col("n_tokens"), 6))
  }

  /** TOKEN-BUDGET-CONSTRAINED selection — "take the best documents until
    * the budget is spent" in a shape that survives any corpus size: docs
    * land in BOUNDED score buckets (floor(score·1000) clamped to ±500 —
    * 1001 buckets forever), bucket token totals accumulate best-first
    * (the one window runs over ≤ 1001 rows, never the corpus), and a
    * bucket is kept iff its inclusive cumulative total fits the budget
    * (half the corpus's tokens, read as a 1-row broadcast). The per-doc
    * verdict is its bucket's. Budget resolution is the bucket width —
    * the exact cut inside the one boundary bucket is a bounded per-bucket
    * refinement a caller can add; the wholesale form is deterministic
    * and window-safe.
    * Input columns: doc_id, `scoreCol` (double), `ntokCol` (long).
    * Output: doc_id, bucket, ntok, kept. */
  def budgetSelect(scored: DataFrame, scoreCol: String, ntokCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dd = graft.core.Caches.scoped(scored.select(col("doc_id"),
      col(ntokCol).as("ntok"),
      greatest(lit(-500L), least(lit(500L),
        floor(col(scoreCol) * 1000).cast("long"))).as("bucket")))
    val bud = dd.agg(floor(sum(col("ntok")) / 2).cast("long").as("budget"))
    val bk = dd.groupBy("bucket").agg(sum(col("ntok")).as("btok"))
    // bounded window: ≤ 1001 bucket rows regardless of corpus size
    val w = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val keepb = bk.withColumn("cum_tok", sum(col("btok")).over(w))
      .crossJoin(broadcast(bud))
      .select(col("bucket"), (col("cum_tok") <= col("budget")).as("kept_bucket"))
    // the decision table is ≤ 1001 rows by construction — broadcast it
    // explicitly so the per-doc join never shuffles the corpus
    dd.join(broadcast(keepb), Seq("bucket"))
      .select(col("doc_id"), col("bucket"), col("ntok"),
        col("kept_bucket").as("kept"))
  }

  /** CCNet-style n-gram language-model quality score: train add-one-
    * smoothed bigram probabilities on the corpus itself, then score every
    * document by its mean log P(w₂|w₁) — predictable, fluent text scores
    * high; word-soup and boilerplate-injected outliers score low. This is
    * the LM-perplexity quality bucket of the CCNet pipeline with the
    * corpus standing in for the reference LM (at 100 TB the counts come
    * from a held-out reference corpus — one upstream swap of the `ref`
    * argument, identical plan).
    *
    * Scale shape: two count aggregations (unigram, bigram — both keyed
    * equi-shuffles over the vocabulary, map-side combined), the vocab
    * size V as a 1-row broadcast scalar (the L1-normalize pattern), then
    * one equi join per doc-bigram against the count tables. No window, no
    * driver state, no all-pairs anything.
    *
    * The verdict is corpus-RELATIVE (CCNet's head/tail buckets): a doc is
    * `lm_ok` iff its mean log-prob beats the corpus-wide mean — computed
    * as one more 1-row broadcast scalar, so the gate splits any corpus at
    * any scale with no hand-tuned constant.
    *
    * Cross-engine float discipline: (c₁₂+1)/(c₁+V) is one IEEE double
    * division; its `ln` (libm) is rounded to 6 immediately; the per-doc
    * and corpus sums run in DECIMAL(18,6) so aggregation order cannot
    * drift the low bits; each mean is one more IEEE division, identical
    * on both engines, so the comparison is exact.
    * Output: doc_id, n_bigrams, avg_logp, lm_ok. */
  def bigramLmScore(docs: DataFrame, ref: DataFrame): DataFrame = {
    val toks = ref.select(words(normText(col("text"))).as("ws"))
    val uni = toks.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bi = toks.select(explode(shingles(col("ws"), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c12"))
    val docBi = docs
      .select(col("doc_id"), words(normText(col("text"))).as("ws"))
      .select(col("doc_id"),
        explode(shingles(col("ws"), 2)).as("bg"))
    // LEFT joins: a bigram unseen in the reference must receive the
    // add-one-smoothed floor 1/(c1+V) (and 1/V when w1 itself is OOV),
    // not vanish from the doc's mean — inner joins here would bias
    // avg_logp UPWARD for exactly the word-soup docs the gate exists to
    // catch, and drop all-OOV docs from the output entirely. Invisible
    // when ref = docs (every bigram matches); load-bearing the moment
    // the ref argument is swapped for a held-out corpus.
    val scored = docBi
      .join(bi, Seq("bg"), "left")
      .withColumn("w1", element_at(split(col("bg"), " "), 1))
      .join(uni.withColumnRenamed("w", "w1"), Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("lp", round(
        log((coalesce(col("c12"), lit(0L)) + 1L).cast("double")
          / (coalesce(col("c1"), lit(0L)) + col("v"))), 6))
    val dec = org.apache.spark.sql.types.DecimalType(18, 6)
    val perDoc = scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("lp").cast(dec)).cast("double").as("slp"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("slp") / col("n_bigrams")).as("avg_logp"))
    val corpus = scored.agg(
      (sum(col("lp").cast(dec)).cast("double") / count(lit(1))).as("corpus_avg"))
    perDoc.crossJoin(broadcast(corpus))
      .select(col("doc_id"), col("n_bigrams"), col("avg_logp"),
        (col("avg_logp") >= col("corpus_avg")).as("lm_ok"))
  }

  /** DSIR-style importance-weighted data selection (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * estimate hashed-n-gram feature distributions for a TARGET slice and
    * the RAW corpus, score every document by its mean per-feature
    * log-importance ln p̂_target(f) − ln p̂_raw(f), then resample via the
    * Gumbel-top-k trick — add a Gumbel(0,1) draw to each doc's
    * log-weight and keep the top `keepFrac` by the noised key, which is
    * exactly sampling-without-replacement proportional to the importance
    * weights.
    *
    * Determinism: the Gumbel draw's uniform is the Knuth multiplicative
    * hash of doc_id over a 2²⁰ lattice (the [[datasetSplit]] no-RNG
    * policy — reproducible across engines, retries, and appends), and
    * the keep threshold is the exact percentile of the noised key (the
    * proven x19/x96 `percentile` ≡ `quantile_cont` contract) applied as
    * a 1-row broadcast.
    *
    * Scale shape: features hash into a FIXED 4096-bucket space (the
    * paper's hashing trick), so the λ weight table is ≤ 4096 rows at any
    * corpus size — one bucket-keyed count aggregation, a 1-row totals
    * broadcast, then a broadcast hash join of exploded doc features
    * against λ plus one doc-keyed partial→final sum. No corpus sort (the
    * percentile aggregates), no window, no driver state.
    *
    * Cross-engine float discipline: bucket counts/products are exact
    * BIGINTs, each λ is one IEEE division → `ln` round-6 → µ-nat
    * integer lift (the x89 weight discipline); the Gumbel chain rounds
    * after every `ln`; the final key is one round-6 of two IEEE
    * divisions plus the add.
    * Output: doc_id, n_feats, imp_mu (Σλ in µ-nats), gkey, selected. */
  /** The DSIR feature-bucket space: 4096 buckets, first three md5 hex
    * nibbles (mirrored in SQL by `TextFunctions.md5BucketSql`). */
  val DsirBuckets = 4096

  private def dsirBucket(c: Column): Column =
    conv(substring(md5(c), 1, 3), 16, 10).cast("long")

  /** doc_id, tgt, fs (unigram+bigram features) — cached: feeds both the
    * λ estimate and the per-doc scoring pass. */
  private def dsirFeats(docs: DataFrame, isTarget: Column): DataFrame =
    graft.core.Caches.scoped(
      docs.select(col("doc_id"), isTarget.as("tgt"),
          words(normText(col("text"))).as("ws"))
        .withColumn("fs", concat(col("ws"), shingles(col("ws"), 2)))
        .select(col("doc_id"), col("tgt"), col("fs")))

  /** Bucket-keyed target/raw feature counts (b, ct, cr) — the SUFFICIENT
    * STATISTIC of the DSIR estimator: ≤ 4096 rows, exactly mergeable by
    * per-bucket addition, which is what makes the estimator incremental
    * ([[writeDsirStore]] / [[dsirSelectIncremental]]). */
  private def dsirCountsOf(feats: DataFrame): DataFrame =
    feats.select(col("tgt"), explode(col("fs")).as("t"))
      .select(col("tgt"), dsirBucket(col("t")).as("b"))
      .groupBy("b").agg(
        sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cr"))

  /** λ(b) = ln( p̂_target(b) / p̂_raw(b) ) with add-one smoothing over the
    * fixed bucket space: exact BIGINT products (< 2⁵³), one IEEE
    * division, ln round-6, µ-lifted — x89's weight discipline. ≤ 4096
    * rows at any corpus size. */
  private def dsirLambdaFromCounts(counts: DataFrame): DataFrame = {
    val nBuckets = DsirBuckets.toLong
    val tot = counts.agg(sum("ct").as("tt"), sum("cr").as("tr"))
    // each factor is cast to double BEFORE multiplying: the BIGINT
    // products would overflow Int64 near corpus totals of ~10¹²
    // features (Spark wraps silently, DuckDB raises); double products
    // are exact below 2⁵³ — the whole fixture/bench envelope — and
    // merely correctly-rounded above it, where λ feeds ln anyway
    counts.crossJoin(broadcast(tot))
      .select(col("b"),
        floor(round(log(
          ((col("ct") + 1L).cast("double") * (col("tr") + nBuckets).cast("double"))
            / ((col("cr") + 1L).cast("double") * (col("tt") + nBuckets).cast("double"))), 6)
          * 1000000d + 0.5d).cast("long").as("lam"))
  }

  private def dsirLambdaOf(feats: DataFrame): DataFrame =
    dsirLambdaFromCounts(dsirCountsOf(feats))

  /** The trained λ table alone (b → µ-nat log-importance) — what a
    * streaming deployment freezes at train time and ships to the ingest
    * gate ([[dsirGate]]). */
  def dsirLambda(docs: DataFrame, isTarget: Column): DataFrame =
    dsirLambdaOf(dsirFeats(docs, isTarget))

  /** Stateless scan-side DSIR gate for a FROZEN λ table: mean per-feature
    * importance ≥ `thresholdNats`, computed per row with an O(1)
    * array-indexed lookup (λ dense over the 4096-bucket space — a map
    * literal would be a linear key scan per feature, the known
    * `element_at`-on-map trap). No shuffle, no state: the exact shape an
    * append-mode stream filter ships in — train λ in batch
    * ([[dsirLambda]]), freeze it into this Column, gate the ingest
    * stream. The batch [[dsirSelect]] path adds Gumbel resampling on
    * top; a fixed-threshold gate is the streaming stand-in (a stream
    * cannot take a corpus percentile). */
  def dsirGate(text: Column, lamByBucket: Seq[Long],
               thresholdNats: Double): Column = {
    require(lamByBucket.size == DsirBuckets,
      s"λ array must cover all $DsirBuckets buckets (fill absent with 0)")
    val ws = words(normText(text))
    val fs = concat(ws, shingles(ws, 2))
    val arr = typedlit(lamByBucket)
    val s = aggregate(transform(fs, t =>
      element_at(arr, dsirBucket(t).cast("int") + 1)),
      lit(0L), (a, x) => a + x)
    s.cast("double") / 1000000.0d / size(fs).cast("double") >= thresholdNats
  }

  def dsirSelect(docs: DataFrame, isTarget: Column,
                 keepFrac: Double = 0.25): DataFrame = {
    val feats = dsirFeats(docs, isTarget)
    dsirScoreAndResample(feats, dsirLambdaOf(feats), keepFrac)
  }

  /** Persist the DSIR sufficient statistic (b, ct, cr — ≤ 4096 rows
    * regardless of corpus size) so later batches can update the
    * estimator without rescanning old text: the x41/x81/x93 store
    * cadence, here with a store ~5 orders of magnitude smaller than a
    * gram store because the hashing trick already bounded the space. */
  def writeDsirStore(docs: DataFrame, isTarget: Column, path: String): Unit = {
    dsirCountsOf(dsirFeats(docs, isTarget))
      .write.mode("overwrite").parquet(path)
    // after the data — parquet overwrite deletes the dir, manifest
    // included; absence reads under the pre-manifest contract
    graft.streaming.StoreFs.writeGeometry(docs.sparkSession, path, Seq(
      "family" -> "dsir", "key_columns" -> "b"))
  }

  /** DELETE documents' contribution from the DSIR count store (round
    * 14, the [[graft.operators.Dedup.deleteFromGramStore]] move): the
    * estimator's sufficient statistic is exactly mergeable by
    * per-bucket ADDITION, so forgetting docs is an exact NEGATIVE-DELTA
    * append — the removed docs' bucket counts land negated and net out
    * at every read ([[dsirSelectIncremental]] union+sums) and at the
    * next [[compactDsirStore]]. Needs the removed docs WITH text and
    * the SAME `isTarget` labeling they were counted under (the store
    * holds only hashed counts). A tagged (streaming) store gets deltas
    * at the −1 sentinel, which every read includes and no replay
    * self-exclusion filter matches. */
  def deleteFromDsirStore(removedDocs: DataFrame, isTarget: Column,
                          path: String,
                          batchId: Option[Long] = None): Unit = {
    val spark = removedDocs.sparkSession
    if (batchId.exists(graft.streaming.StoreFs.markerExists(spark, path, _)))
      return
    graft.streaming.StoreFs.requireFamily(spark, path, "dsir",
      "deleteFromDsirStore")
    val deltas = dsirCountsOf(dsirFeats(removedDocs, isTarget))
      .select(col("b"), (-col("ct")).as("ct"), (-col("cr")).as("cr"))
    val tagged = graft.streaming.StoreFs
      .storeExists(spark, path) && spark.read
      .parquet(graft.streaming.StoreFs.dataDir(spark, path))
      .columns.contains("batch_id")
    (if (tagged) deltas.select(lit(-1L).as("batch_id"), col("b"),
        col("ct"), col("cr"))
     else deltas)
      .write.mode("append")
      .parquet(graft.streaming.StoreFs.dataDir(spark, path))
    batchId.foreach(graft.streaming.StoreFs.writeMarker(spark, path, _))
  }

  /** COMPACT a DSIR count store: sum-merge accumulated rows to one per
    * bucket (≤ 4096 rows total), swapping the compacted generation in
    * atomically ([[graft.streaming.StoreFs.swapInCompacted]] — a crash
    * never leaves the store empty, and the sibling write never reads its
    * own output, so no localCheckpoint is needed). Handles both layouts:
    * the batch store (b, ct, cr) and the streaming store, whose batch_id
    * tags collapse to the −1 generation sentinel — a sentinel never
    * equals a live batch id, so the stream's self-exclusion filter stays
    * correct, and `_graft_batch_*` replay markers ride across the swap
    * (the `swapInCompacted` contract since ADVICE r9): a checkpoint
    * replay of a pre-compaction batch appends nothing instead of
    * double-counting its rows into the −1 generation. */
  def compactDsirStore(spark: org.apache.spark.sql.SparkSession,
                       path: String, keepGens: Int = 1,
                       keepAgeMs: Long = 0L): Unit = {
    // torn-append replay safety: seal folded tags as markers first
    // (counts are SUM-merged, so a post-compaction re-append would
    // double-count — the strictest form of the hazard)
    graft.streaming.StoreFs.sealTagMarkers(spark, path)
    val df = spark.read
      .parquet(graft.streaming.StoreFs.dataDir(spark, path))
    val summed = df.groupBy("b")
      .agg(sum("ct").as("ct"), sum("cr").as("cr"))
    val merged =
      if (df.columns.contains("batch_id"))
        summed.select(lit(-1L).as("batch_id"), col("b"), col("ct"), col("cr"))
      else summed
    graft.streaming.StoreFs.swapInCompacted(spark, path,
      keepGens = keepGens, keepAgeMs = keepAgeMs)(merged.write.parquet(_))
  }

  /** Incremental DSIR: the estimator over old ∪ batch is recovered by
    * ADDING the stored bucket counts to the batch's (exactly — the
    * counts are the sufficient statistic), then only the BATCH is
    * scored and resampled. Old text is never rescanned; the merge is a
    * ≤ 4096-row union+sum. Decisions for old docs are immutable (the
    * store contract shared with the other incremental operators).
    * Output: the [[dsirSelect]] columns for batch docs only. */
  def dsirSelectIncremental(batch: DataFrame, isTarget: Column,
                            store: DataFrame,
                            keepFrac: Double = 0.25): DataFrame = {
    val feats = dsirFeats(batch, isTarget)
    val comb = dsirCountsOf(feats)
      .unionByName(store.select("b", "ct", "cr"))
      .groupBy("b").agg(sum("ct").as("ct"), sum("cr").as("cr"))
    dsirScoreAndResample(feats, dsirLambdaFromCounts(comb), keepFrac)
  }

  /** Public forms for external estimator state (the streaming cadence):
    * the batch's own mergeable counts, and per-doc importance scored
    * against counts accumulated elsewhere. */
  def dsirCounts(docs: DataFrame, isTarget: Column): DataFrame =
    dsirCountsOf(dsirFeats(docs, isTarget))

  def dsirImportanceAgainst(docs: DataFrame, isTarget: Column,
                            counts: DataFrame): DataFrame =
    dsirImportance(dsirFeats(docs, isTarget), dsirLambdaFromCounts(counts))

  /** Per-doc Σλ: broadcast join against the ≤ 4096-row λ table; n_feats
    * rides through the explode (no corpus join-back).
    * Output: doc_id, n_feats, imp_mu. */
  private def dsirImportance(feats: DataFrame, lam: DataFrame): DataFrame =
    feats.select(col("doc_id"),
        size(col("fs")).cast("long").as("n_feats"), explode(col("fs")).as("t"))
      .withColumn("b", dsirBucket(col("t")))
      .join(broadcast(lam), Seq("b"), "left")
      .groupBy("doc_id")
      .agg(first(col("n_feats")).as("n_feats"),
        sum(coalesce(col("lam"), lit(0L))).as("imp_mu"))

  private def dsirScoreAndResample(feats: DataFrame, lam: DataFrame,
                                   keepFrac: Double): DataFrame = {
    val scored = dsirImportance(feats, lam)
    // Gumbel(0,1) from the doc_id lattice uniform: g = −ln(−ln u),
    // rounding after each ln (libm discipline)
    // doc_id bounded mod 2³¹−1 first (the datasetSplit guard) so the
    // Knuth product never overflows BIGINT at production id ranges
    val u = ((((col("doc_id") % 2147483647L) * 2654435761L) % 1048576L)
      .cast("double") + 0.5d) / 1048576.0d
    // the inner round-6 can collapse −ln(u) to exactly 0 when u sits at
    // the top of the 2²⁰ lattice (1-in-2²⁰ doc_ids) — clamp at the
    // smallest round-6 positive so the outer ln never sees 0 (Spark
    // would yield NULL, DuckDB would raise; both mirrored in the SQL)
    val keyed = graft.core.Caches.scoped(scored
      .withColumn("g",
        round(-log(greatest(round(-log(u), 6), lit(0.000001d))), 6))
      .withColumn("gkey", round(
        col("imp_mu").cast("double") / 1000000.0d / col("n_feats") + col("g"), 6))
      .drop("g"))
    val thr = keyed.agg(
      round(expr(s"percentile(gkey, ${1.0 - keepFrac})"), 6).as("thr"))
    keyed.crossJoin(broadcast(thr))
      .select(col("doc_id"), col("n_feats"), col("imp_mu"), col("gkey"),
        (col("gkey") >= col("thr")).as("selected"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): score each
    * document with the held-out bigram LM ([[bigramLmScore]]) and assign
    * it to the `head` / `middle` / `tail` third of the corpus by score —
    * CCNet's downstream contract where head feeds training directly,
    * middle is candidate, tail is dropped or mined.
    *
    * The two cut points are exact corpus terciles (the x19/x96
    * `percentile` ≡ `quantile_cont` contract), computed in ONE aggregate
    * and applied as a 1-row broadcast — no corpus sort, no window; the
    * bucketing adds a single scalar-broadcast stage to the LM-score
    * plan at any corpus size. Raw (unrounded) `avg_logp` is compared
    * against round-6 thresholds: both sides of the comparison are
    * engine-exact (DECIMAL-summed means; round-6 interpolants).
    * Output: doc_id, n_bigrams, avg_logp, ppl_bucket. */
  def perplexityBuckets(docs: DataFrame, ref: DataFrame): DataFrame = {
    val scored = graft.core.Caches.scoped(bigramLmScore(docs, ref)
      .select(col("doc_id"), col("n_bigrams"), col("avg_logp")))
    val thr = scored.agg(
      round(expr(s"percentile(avg_logp, ${1.0 / 3})"), 6).as("t1"),
      round(expr(s"percentile(avg_logp, ${2.0 / 3})"), 6).as("t2"))
    scored.crossJoin(broadcast(thr))
      .select(col("doc_id"), col("n_bigrams"), col("avg_logp"),
        when(col("avg_logp") >= col("t2"), "head")
          .when(col("avg_logp") >= col("t1"), "middle")
          .otherwise("tail").as("ppl_bucket"))
  }

  /** Greedy sequence packing: within each fixed-size shard (doc_id div
    * `shardSize` — shard COUNT grows with the corpus, shard SIZE stays
    * bounded, so the per-group fold below is O(shardSize), never
    * corpus-proportional), documents in doc_id order are packed
    * first-fit into bins of at most `budget` tokens (a document larger
    * than the budget gets its own bin). The fold is an in-order
    * `aggregate` HOF over the sorted per-shard doc list — sequential by
    * construction, which is exactly what greedy packing semantically is;
    * parallelism comes from the shard fan-out, the way a 1000-executor
    * packing job actually runs. Output: doc_id, shard, bin, ntok. */
  def packSequences(docs: DataFrame, budget: Int, shardSize: Int = 64): DataFrame =
    packByShard(docs
      .select(col("doc_id"),
        floor(col("doc_id") / shardSize).cast("long").as("shard"),
        size(words(normText(col("text")))).cast("long").as("ntok")), budget)

  /** The packing fold over a CALLER-KEYED (doc_id, shard, ntok) relation —
    * the export DAG packs BPE token counts within (split, shard) keys
    * instead of word counts within doc_id ranges; the fold itself is
    * identical. `shard` may be any groupable type. */
  def packByShard(toks: DataFrame, budget: Int): DataFrame = {
    val packed = toks.groupBy("shard")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("ntok")))).as("ds"))
      .withColumn("bins", expr(
        s"""aggregate(ds,
           |  named_struct(
           |    'bins', cast(array() as array<struct<doc_id:bigint,bin:int,ntok:bigint>>),
           |    'bin', 0, 'cum', cast(0 as bigint)),
           |  (acc, x) -> named_struct(
           |    'bins', concat(acc.bins, array(named_struct(
           |      'doc_id', x.doc_id,
           |      'bin', CASE WHEN acc.cum > 0 AND acc.cum + x.ntok > $budget
           |                  THEN acc.bin + 1 ELSE acc.bin END,
           |      'ntok', x.ntok))),
           |    'bin', CASE WHEN acc.cum > 0 AND acc.cum + x.ntok > $budget
           |                THEN acc.bin + 1 ELSE acc.bin END,
           |    'cum', CASE WHEN acc.cum > 0 AND acc.cum + x.ntok > $budget
           |                THEN x.ntok ELSE acc.cum + x.ntok END),
           |  acc -> acc.bins)""".stripMargin))
    packed.select(col("shard"), explode(col("bins")).as("b"))
      .select(col("b.doc_id").as("doc_id"), col("shard"),
        col("b.bin").as("bin"), col("b.ntok").as("ntok"))
  }
}
