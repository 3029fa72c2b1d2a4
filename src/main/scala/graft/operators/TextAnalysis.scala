package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Text-analysis operators for training-data pipelines (north star):
  * language-ID heuristic, quality scoring, token statistics, document
  * fingerprinting. All pure column programs (codegen'd; no UDFs), each with
  * an exact SQL mirror used by the oracles.
  */
object TextAnalysis {

  /** Tiny deterministic stopword lexicons for the n-gram/stopword
    * language-ID heuristic. Intentionally small: the *operator* is the
    * deliverable (explode → membership → argmax), not lexical coverage. */
  val Lexicons: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht"),
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "une"))

  private def inLex(w: Column, lang: String): Column =
    w.isInCollection(Lexicons(lang)).cast("int")

  /** Per-doc stopword scores per language + deterministic argmax.
    * Output: doc_id, lang, s_de, s_en, s_es, s_fr, predicted_lang. */
  def langId(docs: DataFrame): DataFrame = {
    val toks = prepared(docs)
      .select(col("doc_id"), col("lang"), explode(col("ws")).as("w"))
    val scored = toks.groupBy("doc_id", "lang")
      .agg(
        sum(inLex(col("w"), "de")).as("s_de"),
        sum(inLex(col("w"), "en")).as("s_en"),
        sum(inLex(col("w"), "es")).as("s_es"),
        sum(inLex(col("w"), "fr")).as("s_fr"))
    scored.withColumn("predicted_lang",
      when(col("s_de") >= col("s_en") && col("s_de") >= col("s_es")
        && col("s_de") >= col("s_fr"), "de")
        .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr"), "en")
        .when(col("s_es") >= col("s_fr"), "es")
        .otherwise("fr"))
  }

  private def prepared(docs: DataFrame) =
    docs.withColumn("norm", normText(col("text")))
      .withColumn("ws", words(col("norm")))

  // --- PII scrubbing — the redaction pass every shipping corpus runs.
  // Patterns stay in the RE2 ∩ Java-regex common subset (plain character
  // classes, bounded repetition) so the DuckDB oracle replays the exact
  // same matches byte-for-byte.

  /** Email/phone patterns (shared with the oracle SQL verbatim). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+1-[0-9]{3}-555-[0-9]{4}"

  /** Inject deterministic PII into the fixture text (the corpus has
    * none — the same encode-fixture pattern as the media codecs: the
    * injector plays the role of the dirty upstream corpus, the scrubber
    * is the deliverable). Every doc gains an email; every third doc a
    * phone number. Output: doc_id, t (dirty text). */
  def injectPii(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat(
        col("text"), lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.org"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" or call +1-202-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit(""))).as("t"))

  /** Scrub: count then replace emails/phones with typed placeholders.
    * Grades the exact redacted BYTES via md5 (shipping the clean text
    * would bloat the compare; the hash pins every byte of it). Pure
    * column program — the regex engines run inside codegen.
    * Output: doc_id, n_emails, n_phones, clean_hash. */
  def redactPii(dirty: DataFrame, textCol: String = "t"): DataFrame = {
    val t = col(textCol)
    val clean = regexp_replace(
      regexp_replace(t, EmailRe, "[EMAIL]"), PhoneRe, "[PHONE]")
    dirty.select(col("doc_id"),
      regexp_count(t, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(t, lit(PhoneRe)).cast("long").as("n_phones"),
      md5(clean).as("clean_hash"))
  }

  /** Per-doc quality metrics: lengths, word stats, stopword ratio and a
    * bounded composite score (all exact double arithmetic — no libm). */
  def quality(docs: DataFrame): DataFrame = {
    val allStops = Lexicons.values.flatten.toSeq.distinct
    val p = prepared(docs)
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("n_chars_norm", length(col("norm")).cast("long"))
    p.select(
      col("doc_id"),
      col("n_chars_norm"),
      col("n_words"),
      ((col("n_chars_norm") - (col("n_words") - 1)).cast("double") / col("n_words"))
        .as("avg_word_len"),
      (size(filter(col("ws"), w => w.isInCollection(allStops))).cast("double")
        / col("n_words")).as("stopword_ratio"),
      (size(array_distinct(col("ws"))).cast("double") / col("n_words"))
        .as("type_token_ratio"))
      .withColumn("quality_score",
        least(col("n_words").cast("double") / 100.0, lit(1.0)) * 0.5
          + col("stopword_ratio") * 0.3 + col("type_token_ratio") * 0.2)
  }

  /** Token counts: whitespace tokens vs regex tokens (BPE-ish pre-token
    * pattern: letter runs | digit runs | single other non-space). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(trim(col("text")), "\\s+")).as("ws_tokens"),
      size(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("rx_tokens"),
      size(array_distinct(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))).as("rx_distinct"))

  /** FastText-style hashed linear quality classifier: features are the
    * normalized unigrams plus word bigrams (the fastText word-ngram
    * trick); each feature's weight is a deterministic signed integer
    * living in its own md5 (`TextFunctions.md5WeightSql` — the hashing
    * trick taken literally: no weight table exists, so scoring is a
    * zero-shuffle, zero-float column program that can gate at the scan
    * like `Curation.c4PageGate`). The verdict is an integer
    * cross-multiply, 1000·score ≥ θ‰·n_feats — no division, no rounding
    * contract. A real trained model swaps the hash-weight fragment for
    * a broadcast weight-table join; the plan shape is unchanged.
    * Output: doc_id, n_feats, score_sum, kept. */
  def hashedClassifier(docs: DataFrame, thetaPerMille: Long = -50L): DataFrame =
    docs.select(col("doc_id"), words(normText(col("text"))).as("ws"))
      .withColumn("fs", concat(col("ws"), shingles(col("ws"), 2)))
      .select(col("doc_id"),
        size(col("fs")).cast("long").as("n_feats"),
        expr(s"""aggregate(transform(fs, w -> ${graft.functions.TextFunctions.md5WeightSql("w")}),
                |CAST(0 AS BIGINT), (a, x) -> a + x)""".stripMargin).as("score_sum"))
      .withColumn("kept", col("score_sum") * 1000L >= lit(thetaPerMille) * col("n_feats"))

  /** The classifier verdict as a single stateless Column — the
    * streaming/scan-side form of [[hashedClassifier]] (the c4PageGate
    * pattern: identical expression runs unchanged in an append stream).
    * The weight here is `conv(md5 hex, 16, 10)` instead of the oracle's
    * instr-nibble fragment — same integer by construction, and the
    * OperatorsSpec law pins gate ≡ hashedClassifier.kept row-for-row. */
  def classifierGate(text: Column, thetaPerMille: Long = -50L): Column = {
    val ws = words(normText(text))
    val fs = concat(ws, shingles(ws, 2))
    val score = aggregate(transform(fs, w =>
      conv(substring(md5(w), 1, 3), 16, 10).cast("long") - 2048L),
      lit(0L), (a, x) => a + x)
    score * 1000L >= lit(thetaPerMille) * size(fs).cast("long")
  }

  /** TRAINED linear classifier — the weight-table swap
    * [[hashedClassifier]]'s doc comment promises, exercised for real:
    * per-feature weights are closed-form Naive-Bayes log-odds trained
    * from a label column (`isPos`) over the same unigram+bigram features,
    * w(t) = ln( (c⁺(t)+1)·(N⁻+V) / ((c⁻(t)+1)·(N⁺+V)) ) in µ-nats
    * (round-6 then integer-lift, so the score stays BIGINT arithmetic
    * like x78's). The production pattern is distillation: train the
    * cheap linear gate to mimic an expensive signal, serve it at the
    * scan.
    *
    * Scale/plan shape: training is one explode + term-keyed count
    * aggregation (shuffles — that is the TRAINING side, run once); the
    * vocabulary is capped at `maxVocab` by frequency (deterministic term
    * tie-break). SCORING is a broadcast HASH join of the exploded
    * features against the capped weight table plus one doc-keyed
    * partial→final sum — no shuffle join anywhere (PlanShapeSpec pins
    * it), and the exchange moves doc-cardinality rows after map-side
    * combine. (A 1-row map-column broadcast was tried first: Spark's map
    * lookup is a linear key scan and the joined map value materializes
    * per row — measured 16 s vs ~2 s for this shape at sf0.1. The md5
    * hashing-trick gate x78 remains the zero-shuffle scan-side form.)
    * Unseen features score 0 (neutral), the natural out-of-vocab policy
    * for a capped table.
    * Output: doc_id, is_pos, n_feats, score_sum, pred_pos, correct. */
  def trainedClassifier(docs: DataFrame, isPos: Column,
                        maxVocab: Int = 4096): DataFrame = {
    val base = docs.select(col("doc_id"), isPos.as("pos"),
      words(normText(col("text"))).as("ws"))
    val feats = graft.core.Caches.scoped(
      base.withColumn("fs", concat(col("ws"), shingles(col("ws"), 2)))
        .select(col("doc_id"), col("pos"), col("fs")))
    val ex = feats.select(col("pos"), explode(col("fs")).as("t"))
    val counts = ex.groupBy("t").agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("cpos"),
      sum(when(!col("pos"), 1L).otherwise(0L)).as("cneg"))
    val tot = counts.agg(sum("cpos").as("pos_tot"), sum("cneg").as("neg_tot"),
      count(lit(1)).as("v"))
    // round-6 log-odds: each factor is cast to double BEFORE multiplying
    // (dsirLambdaFromCounts' overflow-safe form — the BIGINT products
    // would wrap silently near ~10¹² total features; double products are
    // exact below 2⁵³, the whole fixture/bench envelope, and merely
    // correctly-rounded above it, where they feed ln anyway), ln rounded
    // to 6 immediately — the x85 transcendental discipline — then
    // µ-lifted to a BIGINT weight
    val weights = counts.crossJoin(broadcast(tot))
      .select(col("t"), (col("cpos") + col("cneg")).as("df"),
        floor(round(log(
          ((col("cpos") + 1L).cast("double") * (col("neg_tot") + col("v")).cast("double"))
            / ((col("cneg") + 1L).cast("double") * (col("pos_tot") + col("v")).cast("double"))), 6)
          * 1000000d + 0.5d).cast("long").as("wgt"))
      .orderBy(col("df").desc, col("t")).limit(maxVocab)
    // is_pos/n_feats ride THROUGH the explode and fold as first() in the
    // same aggregate — no doc-keyed join-back of two corpus-cardinality
    // tables (that planned as a SortMergeJoin). Every doc survives the
    // explode: `words` of even an empty text yields one token, so fs is
    // never empty.
    feats.select(col("doc_id"), col("pos").as("is_pos"),
        size(col("fs")).cast("long").as("n_feats"), explode(col("fs")).as("t"))
      .join(broadcast(weights.select("t", "wgt")), Seq("t"), "left")
      .groupBy("doc_id")
      .agg(first(col("is_pos")).as("is_pos"), first(col("n_feats")).as("n_feats"),
        sum(coalesce(col("wgt"), lit(0L))).as("score_sum"))
      .withColumn("pred_pos", col("score_sum") >= 0L)
      .withColumn("correct", col("pred_pos") === col("is_pos"))
  }

  /** The hashed-embedding dimensionality ([[hashedEmbedding]]). */
  val EmbedDim = 64

  /** TEXT → EMBEDDING without a model: the feature-hashing (signed
    * random-projection) document embedding — every unigram+bigram
    * feature adds ±1 to one of [[EmbedDim]] buckets (bucket = md5
    * nibbles mod d, sign = the 4th nibble's top bit), giving each doc a
    * sparse signed count vector whose cosine approximates feature-set
    * similarity. This closes the pipeline gap where every embedding
    * operator assumed vectors arrive from outside: hashed vectors feed
    * the SAME integer-cosine machinery (the x76 cross-multiplied τ²
    * test) with zero floats anywhere — components and the squared norm
    * are exact BIGINTs, so the output is engine-exact by construction,
    * no rounding contract at all.
    *
    * Scale shape: one explode + ONE doc-keyed aggregation building the
    * dense array directly as `dim` conditional sums (codegen'd partial →
    * final HashAggregate; the shuffle carries one dim-long partial row
    * per doc per map task). The earlier two-step form — a (doc_id,
    * bucket)-keyed sum, a SECOND exchange regrouping by doc_id, and an
    * ObjectHashAggregate collect_list → map_from_entries probe per
    * component — paid a whole extra shuffle plus a non-codegen aggregate
    * for the same exact integers (guide §2.4: two operations keyed the
    * same way share one exchange). The explode is `explode_outer`: `fs`
    * is provably non-empty (words("") = [""]), and the non-outer form
    * makes Catalyst infer a `size(fs) > 0` filter that re-derives the
    * whole tokenize+shingle chain per row below the Generate (measured
    * in the y04 plan as a Filter recomputing regexp_replace+split+
    * zip_with twice per row). Output: doc_id, vec (array<bigint>,
    * length d), norm_sq, nnz. */
  def hashedEmbedding(docs: DataFrame, dim: Int = EmbedDim): DataFrame = {
    // NULL-text docs are dropped (ADVICE r17): `fs` is provably non-empty
    // only for non-NULL text (words("") = [""]); split(NULL) is NULL and
    // the explode_outer below would otherwise surface such a doc as an
    // all-zero vector the oracle's unnest-based replay drops. A plain
    // base-column isnotnull pushes into the scan (no expression
    // re-derivation — unlike the inferred size(fs) > 0 filter this
    // operator exists to avoid).
    val base = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), words(normText(col("text"))).as("ws"))
      .withColumn("fs", concat(col("ws"), shingles(col("ws"), 2)))
      .select(col("doc_id"), explode_outer(col("fs")).as("t"))
    val signed = base.select(col("doc_id"),
      (conv(substring(md5(col("t")), 1, 3), 16, 10).cast("long") % dim).as("b"),
      when(conv(substring(md5(col("t")), 4, 1), 16, 10).cast("long") >= 8L, 1L)
        .otherwise(-1L).as("s"))
    val sums = (0 until dim).map(j =>
      sum(when(col("b") === j.toLong, col("s")).otherwise(0L)).as(s"__v$j"))
    signed.groupBy("doc_id")
      .agg(sums.head, sums.tail: _*)
      .select(col("doc_id"),
        array((0 until dim).map(j => col(s"__v$j")): _*).as("vec"))
      .withColumn("norm_sq",
        graft.functions.VectorFunctions.dotLong(col("vec"), col("vec")))
      .withColumn("nnz",
        size(filter(col("vec"), x => x =!= 0L)))
  }

  /** TEXT-ONLY SEMANTIC NEAR-DUP — the full embedding dedup flow with no
    * model anywhere: [[hashedEmbedding]] vectors are bucketed by the
    * sign pattern of their first nbits components (nbits corpus-adaptive
    * via `autoBits` — occupancy-bounded cells, the x79 lever, so the
    * within-cell pair space stays linear), and same-cell pairs are
    * tested with the integer cross-multiplied τ² rule (x76 discipline:
    * dot² · 10⁴ ≥ τ²bp · ‖a‖² · ‖b‖², zero floats end to end). A doc is
    * kept iff no lower-id same-cell doc is τ-close.
    * Output: doc_id, cell, n_close, kept. */
  /** The cross-multiplied τ² verdict in DECIMAL(38,0): dot²·10⁴ and
    * τ²bp·‖a‖²·‖b‖² stay exact integers, but BOTH sides overflow Int64
    * for high-repetition documents (norm² ~ 10¹⁰ → products ~ 10²³ —
    * Spark wraps silently, DuckDB raises; the oracles mirror this with
    * HUGEINT). Decimal 38 holds ~10³⁸ — out of physical reach. */
  private def tauSqTest(dot: Column, tauSqBp: Column,
                        na: Column, nb: Column): Column = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    dot.cast(dec) * dot.cast(dec) * lit(10000L).cast(dec) >=
      tauSqBp.cast(dec) * na.cast(dec) * nb.cast(dec)
  }

  /** XOR masks of Hamming weight ≤ `radius` over `maxBits` bits — the
    * multi-probe neighborhood (C(maxBits, ≤radius) masks: 93 at
    * maxBits = 8 radius 3; 6885 at 16/5 — still a broadcast-explode
    * bound, never corpus-proportional). Enumerated in ascending weight,
    * within weight by ascending lowest-set-bit — a deterministic order
    * both engines can replay. */
  private[graft] def hammingMasks(maxBits: Int, radius: Int): Seq[Int] = {
    require(0 <= radius && radius <= maxBits,
      s"0 ≤ radius ≤ maxBits required, got $radius/$maxBits")
    def combos(start: Int, k: Int): Seq[Int] =
      if (k == 0) Seq(0)
      else (start to maxBits - k).flatMap(i =>
        combos(i + 1, k - 1).map(_ | (1 << i)))
    (0 to radius).flatMap(combos(0, _))
  }

  /** Shared sign-cell builder for the hashed near-dup family: per doc
    * the 64-long hashed embedding, its norm², the auto-bits sign cell
    * over the corpus count, and the active nbits. ONE definition, used
    * by the production operator, the recall panel, and the scale/notch
    * probes — so every measurement grades the identical cell geometry.
    * Output: (doc_id, vec, nsq, cell, nbits). */
  private[graft] def hashedCells(docs: DataFrame, targetOcc: Int = 8,
                                 maxBits: Int = 12,
                                 capOfCount: Option[Column => Column] = None)
      : DataFrame = {
    import graft.functions.VectorFunctions
    val v = hashedEmbedding(docs)
    val n = v.agg(count(lit(1)).as("__n"))
    val raw = VectorFunctions.autoBits(col("__n"), targetOcc, maxBits)
    // capOfCount: an optional RUNTIME bit-count cap derived from the same
    // 1-row count broadcast (the y12 notch-promotion dial) — the static
    // maxBits stays the hyperplane enumeration bound, the cap only masks.
    val nbits = capOfCount.map(c => least(raw, c(col("__n")))).getOrElse(raw)
    val base = v.crossJoin(broadcast(n))
      .withColumn("nbits", nbits)
      .withColumn("cell", (0 until maxBits).map(j =>
        when(lit(j) < nbits && element_at(col("vec"), j + 1) >= 0L,
          lit(1 << j)).otherwise(lit(0))).reduce(_ + _))
    val cols = Seq(col("doc_id"), col("vec"), col("norm_sq").as("nsq"),
      col("cell"), col("nbits")) ++
      capOfCount.map(c => c(col("__n")).as("cap"))
    base.select(cols: _*)
  }

  /** Pigeonhole-banded candidate pairs within Hamming ≤ `radiusCol` of
    * each other's sign cells. EXACT-COVER band boundaries: band j =
    * bits [⌊j·nbits/B⌋, ⌊(j+1)·nbits/B⌋) — the B bands tile exactly
    * the nbits active bits (runtime scalar, integer arithmetic only).
    * A ceil-width tiling would leave, at nbits values not divisible by
    * B, a trailing band whose bits lie partly or wholly ABOVE nbits —
    * a constant-key (or 2-value-key) band whose equi-join degenerates
    * to ~n² rows at intermediate corpus sizes (nbits 9, 13, …). Exact
    * cover has no such band whenever nbits ≥ B; when nbits < B (tiny
    * corpora only) some bands have width 0 → key 0 on every row → an
    * all-pairs fallback that is semantically EXACT there, because max
    * cell distance = nbits < B means every pair is within any radius
    * the caller can ask B bands to cover. Correctness needs only
    * radius ≤ B − 1 (any pair differing in ≤ B−1 bits agrees exactly
    * on ≥ 1 of B bands); `radiusCol` may be a runtime column as long
    * as that bound holds everywhere. Same-band collisions outside the
    * radius are discarded by an integer popcount filter BEFORE any dot
    * is computed, and a pair agreeing on several bands is kept only in
    * its first agreeing band's join — each unordered pair survives
    * exactly once. Each band join shuffles the corpus payload exactly
    * ONCE (shuffle-hash: the band key has bounded cardinality, so each
    * partition hash-builds its band slice — never a sort of the
    * payload, never a global hash relation). */
  /** Candidate pairs within Hamming ≤ `radiusCol` of each other's sign
    * cells, by PROXY-SIDE MASK ENUMERATION: the ≤ C(maxBits, ≤maxRadius)
    * XOR masks are a static list, narrowed ONCE (one interpreted filter
    * over one row — the active-nbits window and the runtime radius are
    * corpus-global) to a bounded broadcast frame; the probe side crosses
    * only (id, cell) with it — the vector payload NEVER rides through
    * the mask expansion (the historical 24.4×-at-10×-data failure was
    * payload×masks through the exchange, not the masks themselves).
    * Each unordered pair (a, b) with cell distance ≤ radius matches
    * exactly one mask (m = a_cell ^ b_cell is unique), and `a_id < b_id`
    * keeps one of the two symmetric matches — the same pair set the
    * pigeonhole bands produced, exactly once, with NO band fan-out: the
    * band form's narrow bands (width nbits/B ≤ 2 at the graded
    * geometries) generated Σ_j n²/2^w_j ≈ 2n² raw join rows (measured
    * ~50M at sf0.1) where this form generates n·|masks|·occupancy
    * (~4.3M) — every surviving row a real candidate. The payload
    * attaches to the bounded candidate set afterwards by one id
    * equi-join per side (guide §8: decide with small rows, move the
    * heavy bytes once).
    *
    * SIGNATURE CONTRACT (ADVICE r17): `a_nbits` and `radiusCol` must be
    * CORPUS-GLOBAL constants (both derive from the one corpus count
    * here); the single limit(1) row below is how the static mask list is
    * narrowed, so a genuinely per-row radius or bit count would silently
    * under-/over-probe. The replaced pigeonhole-band form supported a
    * per-row radius — a caller that needs one must band, not mask. */
  private def maskedCellPairs(a: DataFrame, b: DataFrame, maxBits: Int,
                              maxRadius: Int, radiusCol: Column): DataFrame = {
    // one representative row carries the corpus-global (nbits, radius);
    // the static mask list narrows against it ONCE, then broadcasts
    val mrow = a.select(col("a_nbits").as("__nb"), radiusCol.as("__rad")).limit(1)
    def popcount(m: Column): Column =
      (0 until maxBits).map(j => shiftright(m, j).bitwiseAND(lit(1))).reduce(_ + _)
    val allMasks = array(hammingMasks(maxBits, maxRadius).map(lit): _*)
    val masksDf = mrow.select(explode(filter(allMasks, m =>
      popcount(m) <= col("__rad") && m < expr("shiftleft(1, __nb)"))).as("__m"))
    val aprobe = a.select(col("a_id"), col("a_cell"))
      .crossJoin(broadcast(masksDf))
      .select(col("a_id"), col("a_cell").bitwiseXOR(col("__m")).as("__t"))
    val cands = b.join(aprobe.hint("shuffle_hash"), col("__t") === col("b_cell"))
      .filter(col("a_id") < col("b_id"))
      .drop("__t")
    // attach the a-side payload to the bounded candidate set (one id
    // equi-join; AQE broadcasts the corpus side locally, SMJ at scale).
    // toDF severs attribute lineage — cands' a_id traces to the same
    // cached cells frame, and identical exprIds would make the self-join
    // ambiguous.
    cands.join(a.select(col("a_id"), col("va"), col("na"))
      .toDF("a_id", "va", "na"), Seq("a_id"))
  }

  def hashedNearDup(docs: DataFrame, tauSqBp: Long = 2025L,
                    targetOcc: Int = 8, maxBits: Int = 12,
                    probeHamming: Int = 0): DataFrame = {
    import graft.functions.VectorFunctions
    // radius is the recall dial (see hashedNearDupRecall): candidate
    // cost grows as band selectivity 2^(nbits/(radius+1)) shrinks, so
    // large radii are only affordable at large nbits — bounded here at
    // the point where 12-bit cells still give ≥ 2-bit bands
    require(0 <= probeHamming && probeHamming <= 5,
      s"probeHamming ≤ 5 supported, got $probeHamming")
    val cells = graft.core.Caches.scoped(hashedCells(docs, targetOcc, maxBits))
    val a = cells.toDF("a_id", "va", "na", "a_cell", "a_nbits")
    val b = cells.toDF("b_id", "vb", "nb", "b_cell", "b_nbits")
    // probeHamming > 0 widens the candidate neighborhood to all cells
    // within that Hamming distance (the y06-measured recall lever:
    // 0.04 single-probe → 0.84 at radius 3), generated by PROXY-SIDE
    // mask enumeration (see maskedCellPairs): the masks expand only an
    // (id, cell) frame, the payload attaches to the bounded candidate
    // set afterwards — the r14 regression was the payload riding the
    // mask explode, and the r15 pigeonhole-band replacement fixed the
    // bytes but fanned the JOIN out to Σ n²/2^(nbits/B) raw rows (its
    // bands are 1–2 bits wide at every graded geometry; measured ~50M
    // rows vs ~4.3M mask candidates at sf0.1). Each unordered pair
    // matches exactly one mask, so each survives exactly once — the
    // same pair set both earlier forms produced.
    val pairs =
      if (probeHamming == 0)
        a.join(b, col("a_cell") === col("b_cell"))
          .filter(col("a_id") < col("b_id"))
      else maskedCellPairs(a, b, maxBits, probeHamming, lit(probeHamming))
    val close = pairs
      .withColumn("dot", VectorFunctions.dotLong(col("va"), col("vb")))
      .filter(col("dot") > 0L && tauSqTest(col("dot"), lit(tauSqBp),
        col("na"), col("nb")))
      .groupBy(col("b_id").as("doc_id")).agg(count(lit(1)).as("n_close"))
    cells.select("doc_id", "cell").join(close, Seq("doc_id"), "left")
      .select(col("doc_id"), col("cell"),
        coalesce(col("n_close"), lit(0L)).as("n_close"),
        (coalesce(col("n_close"), lit(0L)) === 0L).as("kept"))
  }

  /** The PRODUCTION form of the multi-probe near-dup: the probe radius
    * is not a constant but a function of the corpus — NotchProbe
    * measured (SCALE.md) that a τ-close pair differs in ≈ 0.35·nbits
    * sign bits in expectation, so any FIXED radius loses recall as
    * auto-bits grows with the corpus (radius 3: recall 0.84 at nbits 6
    * but 0.49 at nbits 12). The rule radius = clamp(round(nbits/3), 3,
    * maxRadius) holds recall ≥ 0.6 at every measured operating point
    * (0.84 / 0.72 / 0.65 at nbits 6 / 12 / 13). The radius is computed
    * as an integer column from the SAME 1-row count broadcast that
    * yields nbits — (2·nbits + 3) div 6 is round(nbits/3) in exact
    * integer arithmetic — so there is no driver-side scalar, and the
    * plan has ONE shape: the static Hamming ≤ maxRadius mask list
    * covers every radius the rule can choose, narrowed to the runtime
    * (nbits, radius) window once per corpus (see maskedCellPairs).
    * Output adds the chosen nbits and radius so the dial itself is
    * graded. */
  def hashedNearDupAutoRadius(docs: DataFrame, tauSqBp: Long = 2025L,
                              targetOcc: Int = 8, maxBits: Int = 12,
                              maxRadius: Int = 5): DataFrame = {
    import graft.functions.VectorFunctions
    require(3 <= maxRadius && maxRadius <= 5,
      s"3 ≤ maxRadius ≤ 5 supported, got $maxRadius")
    val cells = graft.core.Caches.scoped(
      hashedCells(docs, targetOcc, maxBits)
        .withColumn("radius", least(lit(maxRadius),
          greatest(lit(3), expr("(2 * nbits + 3) div 6"))).cast("int")))
    val a = cells.toDF("a_id", "va", "na", "a_cell", "a_nbits", "a_radius")
    val b = cells.toDF("b_id", "vb", "nb", "b_cell", "b_nbits", "b_radius")
    val pairs = maskedCellPairs(a, b, maxBits, maxRadius, col("a_radius"))
    val close = pairs
      .withColumn("dot", VectorFunctions.dotLong(col("va"), col("vb")))
      .filter(col("dot") > 0L && tauSqTest(col("dot"), lit(tauSqBp),
        col("na"), col("nb")))
      .groupBy(col("b_id").as("doc_id")).agg(count(lit(1)).as("n_close"))
    cells.select("doc_id", "cell", "nbits", "radius")
      .join(close, Seq("doc_id"), "left")
      .select(col("doc_id"), col("cell"), col("nbits"), col("radius"),
        coalesce(col("n_close"), lit(0L)).as("n_close"),
        (coalesce(col("n_close"), lit(0L)) === 0L).as("kept"))
  }

  /** [[hashedNearDupAutoRadius]] with the maxBits NOTCH PROMOTION as a
    * second integer dial from the SAME 1-row count broadcast: the
    * standing cap `lowCap` = 12 (4096 cells) holds expected occupancy ≤
    * targetOcc only while n ≤ targetOcc·2^lowCap; past that the capped
    * cell space saturates and occupancy grows linearly again — the
    * regime NotchProbe measured at the 50k corpus (occ 16.3 vs 10.3,
    * every wall 1.3–1.6× higher than the promoted cap; SCALE.md "the
    * maxBits notch"). The rule: cap = highCap iff n > targetOcc·2^lowCap
    * else lowCap — one integer comparison, no driver scalar, replayed
    * bit-for-bit by the oracle. Hyperplanes are enumerated statically at
    * `highCap` and masked by the runtime bit count (the lshBucketMasked
    * discipline), so BOTH regimes run one plan shape; the radius dial
    * (y10's clamp((2·nbits+3)/6, 3, 5)) then tracks the promoted bit
    * count — at the notch, promotion raises nbits, which raises the
    * radius the rule picks, which the Hamming ≤ maxRadius mask list
    * already covers.
    * Output: doc_id, cell, cap, nbits, radius, n_close, kept. */
  def hashedNearDupAutoCap(docs: DataFrame, tauSqBp: Long = 2025L,
                           targetOcc: Int = 8, lowCap: Int = 12,
                           highCap: Int = 16, maxRadius: Int = 5): DataFrame = {
    import graft.functions.VectorFunctions
    require(lowCap < highCap && highCap <= 32,
      s"lowCap < highCap <= 32 required, got $lowCap/$highCap")
    require(3 <= maxRadius && maxRadius <= 5,
      s"3 ≤ maxRadius ≤ 5 supported, got $maxRadius")
    val capOfN = (n: Column) =>
      when(n > (targetOcc.toLong << lowCap), highCap).otherwise(lowCap)
    val cells = graft.core.Caches.scoped(
      hashedCells(docs, targetOcc, highCap, Some(capOfN))
        .withColumn("radius", least(lit(maxRadius),
          greatest(lit(3), expr("(2 * nbits + 3) div 6"))).cast("int")))
    val a = cells.select(col("doc_id").as("a_id"), col("vec").as("va"),
      col("nsq").as("na"), col("cell").as("a_cell"),
      col("nbits").as("a_nbits"), col("radius").as("a_radius"))
    val b = cells.select(col("doc_id").as("b_id"), col("vec").as("vb"),
      col("nsq").as("nb"), col("cell").as("b_cell"),
      col("nbits").as("b_nbits"), col("radius").as("b_radius"))
    val pairs = maskedCellPairs(a, b, highCap, maxRadius, col("a_radius"))
    val close = pairs
      .withColumn("dot", VectorFunctions.dotLong(col("va"), col("vb")))
      .filter(col("dot") > 0L && tauSqTest(col("dot"), lit(tauSqBp),
        col("na"), col("nb")))
      .groupBy(col("b_id").as("doc_id")).agg(count(lit(1)).as("n_close"))
    cells.select("doc_id", "cell", "cap", "nbits", "radius")
      .join(close, Seq("doc_id"), "left")
      .select(col("doc_id"), col("cell"), col("cap"), col("nbits"),
        col("radius"),
        coalesce(col("n_close"), lit(0L)).as("n_close"),
        (coalesce(col("n_close"), lit(0L)) === 0L).as("kept"))
  }

  /** RECALL PANEL for the text-only near-dup path (the x43/x55 grading
    * contract applied to [[hashedNearDup]]'s sign-cell bucketing): for a
    * bounded probe set, count the τ-close partners found (a) within the
    * probe's own cell — the single-probe baseline — and (b) within all
    * cells at Hamming distance ≤ 3 of it — the x48 multi-probe lever,
    * ≤ 93 bounded probe cells per probe — against the brute-force truth
    * over the whole corpus. All three sides run the identical integer τ²
    * test, so found ⊆ true by construction; the ratios are the only
    * floats (one IEEE division each, round-6). Measured at sf0.01:
    * single-probe 0.04 (sign bits barely agree at cos 0.45 — the honest
    * baseline number), Hamming ≤ 3 multi-probe 0.84 ≥ the 0.6 production
    * bound. Output: one row — n_probes, n_true, n_single, n_multi,
    * recall_single, recall_multi, recall_ok (multi vs `bound`). */
  def hashedNearDupRecall(docs: DataFrame, probeCount: Int = 32,
                          tauSqBp: Long = 2025L, targetOcc: Int = 8,
                          maxBits: Int = 12, bound: Double = 0.6,
                          radius: Int = 3): DataFrame = {
    val cells = graft.core.Caches.scoped(hashedCells(docs, targetOcc, maxBits))
    // BOUNDED deterministic probe set (the Similarity.withBoundedProbeFlag
    // discipline): the probeCount smallest (md5(doc_id), doc_id) members —
    // the brute-force truth side stays O(nProbes · n) at any corpus
    // size, where the earlier `doc_id % mod` fraction made the grading
    // query itself O(n²/mod).
    val pids: DataFrame = cells.select(col("doc_id"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .limit(probeCount)
    val probes = cells.join(broadcast(pids), Seq("doc_id"))
      .toDF("p_id", "pv", "pn", "p_cell", "p_nbits")
    val close = (c: DataFrame) => c
      .filter(col("p_id") =!= col("doc_id"))
      .withColumn("dot",
        graft.functions.VectorFunctions.dotLong(col("pv"), col("vec")))
      .filter(col("dot") > 0L && tauSqTest(col("dot"), lit(tauSqBp),
        col("pn"), col("nsq")))
    // the SAME Hamming ≤ 3 neighborhood hashedNearDup(probeHamming = 3)
    // probes — shared generator, so the panel grades exactly the
    // production candidate set; per probe only masks inside its active
    // nbits window apply, and each target cell is distinct so no
    // candidate is double-counted
    val probesMulti = probes
      .withColumn("mask",
        explode(array(hammingMasks(maxBits, radius).map(lit): _*)))
      .filter(expr("mask < shiftleft(1, p_nbits)"))
      .withColumn("t_cell", expr("p_cell ^ mask"))
    val nTrue = close(cells.crossJoin(broadcast(probes)))
      .agg(count(lit(1)).as("n_true"))
    val nSingle = close(cells.join(broadcast(probes),
        col("cell") === col("p_cell")))
      .agg(count(lit(1)).as("n_single"))
    val nMulti = close(cells.join(broadcast(probesMulti),
        col("cell") === col("t_cell")))
      .agg(count(lit(1)).as("n_multi"))
    val nProbes = probes.agg(count(lit(1)).as("n_probes"))
    val rec = (num: Column) => round(
      when(col("n_true") === 0L, 1.0d)
        .otherwise(num.cast("double") / col("n_true")), 6)
    nProbes.crossJoin(nTrue).crossJoin(nSingle).crossJoin(nMulti)
      .withColumn("recall_single", rec(col("n_single")))
      .withColumn("recall_multi", rec(col("n_multi")))
      .withColumn("recall_ok", col("recall_multi") >= bound)
  }

  /** Document fingerprints: md5 of normalized text plus min/max seeded
    * shingle hashes (a 1-hash MinHash — the rolling-window signature). */
  def fingerprints(docs: DataFrame): DataFrame = {
    val p = prepared(docs).withColumn("sh5", shingles(col("ws"), 5))
    p.select(
      col("doc_id"),
      md5(col("norm")).as("fp_full"),
      array_min(transform(col("sh5"), s => md5(s))).as("fp_min"),
      array_max(transform(col("sh5"), s => md5(s))).as("fp_max"))
  }
}
