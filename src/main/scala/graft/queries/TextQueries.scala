package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables._
import graft.operators.{Curation, TextAnalysis}

/** Text-analysis suite (north star): language-ID, quality scoring, token
  * counting, fingerprinting — each oracle recomputes the identical
  * algorithm in DuckDB SQL. */
object TextQueries {

  private val normSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
  private def lexList(lang: String): String =
    TextAnalysis.Lexicons(lang).map(w => s"'$w'").mkString("(", ",", ")")

  // --- X6: stopword-lexicon language ID (explode → membership → argmax)
  val x06 = Query(
    "x06_text_langid",
    Some(s"""
      WITH n AS (SELECT doc_id, lang, $normSql AS norm FROM documents),
      tok AS (SELECT doc_id, lang, unnest(string_split(norm, ' ')) AS w FROM n),
      scored AS (
        SELECT doc_id, lang,
               CAST(SUM(CASE WHEN w IN ${lexList("de")} THEN 1 ELSE 0 END) AS BIGINT) AS s_de,
               CAST(SUM(CASE WHEN w IN ${lexList("en")} THEN 1 ELSE 0 END) AS BIGINT) AS s_en,
               CAST(SUM(CASE WHEN w IN ${lexList("es")} THEN 1 ELSE 0 END) AS BIGINT) AS s_es,
               CAST(SUM(CASE WHEN w IN ${lexList("fr")} THEN 1 ELSE 0 END) AS BIGINT) AS s_fr
        FROM tok GROUP BY doc_id, lang)
      SELECT doc_id, lang, s_de, s_en, s_es, s_fr,
             CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                  WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                  WHEN s_es >= s_fr THEN 'es'
                  ELSE 'fr' END AS predicted_lang
      FROM scored
      ORDER BY doc_id""")
  ) { (s, d) =>
    TextAnalysis.langId(documents(s, d))
      .select("doc_id", "lang", "s_de", "s_en", "s_es", "s_fr", "predicted_lang")
      .orderBy("doc_id")
  }

  // --- X7: quality metrics (exact double arithmetic; no libm)
  private val allStopsSql =
    TextAnalysis.Lexicons.values.flatten.toSeq.distinct
      .map(w => s"'$w'").mkString("(", ",", ")")

  val x07 = Query(
    "x07_text_quality",
    Some(s"""
      WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
      w AS (SELECT doc_id, string_split(norm, ' ') AS ws,
                   length(norm) AS nc FROM n),
      m AS (
        SELECT doc_id,
               CAST(nc AS BIGINT) AS n_chars_norm,
               CAST(len(ws) AS BIGINT) AS n_words,
               CAST(nc - (len(ws) - 1) AS DOUBLE) / len(ws) AS avg_word_len,
               CAST(len(list_filter(ws, x -> x IN $allStopsSql)) AS DOUBLE)
                 / len(ws) AS stopword_ratio,
               CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS type_token_ratio
        FROM w)
      SELECT doc_id, n_chars_norm, n_words, avg_word_len, stopword_ratio,
             type_token_ratio,
             least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.5
               + stopword_ratio * 0.3 + type_token_ratio * 0.2 AS quality_score
      FROM m
      ORDER BY doc_id""")
  ) { (s, d) =>
    TextAnalysis.quality(documents(s, d)).orderBy("doc_id")
  }

  // --- X8: whitespace vs regex tokenization counts
  val x08 = Query(
    "x08_text_tokens",
    Some("""
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS ws_tokens,
             CAST(len(regexp_extract_all(lower(text),
               '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS rx_tokens,
             CAST(len(list_distinct(regexp_extract_all(lower(text),
               '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS INT) AS rx_distinct
      FROM documents
      ORDER BY doc_id""")
  ) { (s, d) =>
    TextAnalysis.tokenCounts(documents(s, d)).orderBy("doc_id")
  }

  // --- X9: md5 + min/max shingle-hash fingerprints
  val x09 = Query(
    "x09_text_fingerprint",
    Some(s"""
      WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
      w AS (SELECT doc_id, norm, string_split(norm, ' ') AS ws FROM n),
      sh AS (
        SELECT doc_id, norm,
               CASE WHEN len(ws) >= 5 THEN
                 list_transform(
                   list_distinct(list_transform(range(1, len(ws) - 3),
                     j -> array_to_string(ws[j:j+4], ' '))),
                   x -> md5(x))
               ELSE [] END AS hs
        FROM w)
      SELECT doc_id, md5(norm) AS fp_full,
             list_aggregate(hs, 'min') AS fp_min,
             list_aggregate(hs, 'max') AS fp_max
      FROM sh
      ORDER BY doc_id""")
  ) { (s, d) =>
    TextAnalysis.fingerprints(documents(s, d)).orderBy("doc_id")
  }

  // --- X22: quality gate + deterministic stratified sample (the standard
  // training-data downsampling step: no RNG, reproducible across engines
  // and retries — a Knuth-style multiplicative hash on the key).
  val x22 = Query(
    "x22_quality_sample",
    Some(s"""
      WITH m AS (
        SELECT lang,
               (len(string_split($normSql, ' ')) >= 20
                 AND ((doc_id % 2147483647) * 2654435761) % 100 < 30) AS kept
        FROM documents)
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      FROM m GROUP BY lang
      ORDER BY lang""")
  ) { (s, d) =>
    import graft.functions.TextFunctions._
    // doc_id is masked to 31 bits before the Knuth multiply so the product
    // stays under 2^63: Spark silently wraps on Long overflow while DuckDB
    // raises on BIGINT overflow, so the unmasked form diverges (or errors)
    // once doc_id exceeds ~3.5e9.
    documents(s, d)
      .select(col("lang"),
        (size(words(normText(col("text")))) >= 20
          && (col("doc_id") % 2147483647L) * 2654435761L % 100 < 30).as("kept"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy("lang")
  }

  // --- X32: top-k tokens per language — the custom two-phase TopKPerKey
  // operator applied to a high-cardinality aggregate (|vocab| keys into
  // the partial heaps), the Zipf-head view every corpus study starts with.
  val x32 = Query(
    "x32_top_tokens",
    Some(s"""
      WITH tok AS (
        SELECT lang, unnest(string_split($normSql, ' ')) AS w FROM documents),
      cnts AS (
        SELECT lang, w, CAST(count(*) AS BIGINT) AS cnt
        FROM tok GROUP BY lang, w),
      ranked AS (
        SELECT lang, w, cnt,
               CAST(row_number() OVER (PARTITION BY lang
                 ORDER BY cnt DESC, w) AS INT) AS rk
        FROM cnts)
      SELECT lang, w, cnt, rk FROM ranked WHERE rk <= 5
      ORDER BY lang, rk""")
  ) { (s, d) =>
    import graft.functions.TextFunctions._
    import org.apache.spark.sql.expressions.Window
    val toks = documents(s, d)
      .select(col("lang"), explode(words(normText(col("text")))).as("w"))
    val cnts = toks.groupBy("lang", "w").agg(count(lit(1)).as("cnt"))
    val top = graft.plans.TopK.perKey(cnts, Seq(cnts("lang")),
      Seq(cnts("cnt").desc, cnts("w")), k = 5)
    val wd = Window.partitionBy("lang").orderBy(col("cnt").desc, col("w"))
    top.withColumn("rk", row_number().over(wd))
      .select("lang", "w", "cnt", "rk")
      .orderBy("lang", "rk")
  }

  // --- X39: bigram stats via the custom Catalyst Generator (UDTF surface)
  // — NGramGenerator emits n-gram rows directly (fused generate) instead
  // of slice-arrays → zip_with → explode; the oracle replays the same
  // bigrams relationally.
  val x39 = Query(
    "x39_ngram_generator",
    Some(s"""
      WITH w AS (
        SELECT lang, string_split($normSql, ' ') AS ws FROM documents),
      grams AS (
        SELECT lang,
               unnest(list_transform(range(1, len(ws)),
                 j -> array_to_string(ws[j:j+1], ' '))) AS g
        FROM w WHERE len(ws) >= 2)
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_grams,
             CAST(count(DISTINCT g) AS BIGINT) AS n_distinct
      FROM grams GROUP BY lang
      ORDER BY lang""")
  ) { (s, d) =>
    import graft.functions.TextFunctions._
    import graft.functions.NGramGenerator
    documents(s, d)
      .select(col("lang"),
        NGramGenerator.ngrams(s, words(normText(col("text"))), 2).as("g"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_grams"), countDistinct(col("g")).as("n_distinct"))
      .orderBy("lang")
  }

  // --- X60: PII scrubbing — deterministic emails/phones injected into
  // the fixture text (the corpus has none; the injector stands in for the
  // dirty upstream, exactly like the media encode fixtures), then the
  // scrubber counts and redacts them. The oracle replays the identical
  // regexes (RE2 ∩ Java common subset) and grades every byte of the
  // redacted text through its md5.
  val x60 = Query(
    "x60_text_redact",
    Some(s"""
      WITH p AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@mail.example.org'
                    || CASE WHEN doc_id % 3 = 0
                            THEN ' or call +1-202-555-' ||
                                 lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                            ELSE '' END AS t
        FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(t, '${TextAnalysis.EmailRe}')) AS BIGINT)
               AS n_emails,
             CAST(len(regexp_extract_all(t, '${TextAnalysis.PhoneRe}')) AS BIGINT)
               AS n_phones,
             md5(regexp_replace(
                   regexp_replace(t, '${TextAnalysis.EmailRe}', '[EMAIL]', 'g'),
                   '${TextAnalysis.PhoneRe}', '[PHONE]', 'g')) AS clean_hash
      FROM p
      ORDER BY doc_id""")
  ) { (s, d) =>
    TextAnalysis.redactPii(TextAnalysis.injectPii(documents(s, d)))
      .orderBy("doc_id")
  }

  // --- X78: fastText-style hashed linear classifier — unigram + bigram
  // features, each feature's signed weight derived from its own md5
  // (TextFunctions.md5WeightSql, interpolated into BOTH engines
  // verbatim). Score and verdict are pure BIGINT arithmetic: no weight
  // table, no shuffle, no float anywhere.
  val x78 = Query(
    "x78_quality_classifier",
    Some(s"""
      WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
      w AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM n),
      f AS (SELECT doc_id, list_concat(ws,
              list_transform(range(1, len(ws)),
                j -> array_to_string(ws[j:j+1], ' '))) AS fs
            FROM w),
      s AS (SELECT doc_id, CAST(len(fs) AS BIGINT) AS n_feats,
              CAST(list_aggregate(list_transform(fs,
                w -> ${graft.functions.TextFunctions.md5WeightSql("w")}),
                'sum') AS BIGINT) AS score_sum
            FROM f)
      SELECT doc_id, n_feats, score_sum,
             score_sum * 1000 >= -50 * n_feats AS kept
      FROM s ORDER BY doc_id""")
  ) { (s, d) =>
    TextAnalysis.hashedClassifier(documents(s, d)).orderBy("doc_id")
  }

  // --- X89: TRAINED classifier weights — the swap x78's doc comment
  // promises, graded: closed-form Naive-Bayes log-odds per unigram/bigram
  // feature, trained against the lang='en' label (distillation: the
  // cheap linear gate learns to mimic a signal), vocabulary capped by
  // frequency, scoring via broadcast hash join + one doc-keyed
  // partial→final sum (PlanShapeSpec pins no shuffle join). Weights are
  // round-6 ln lifted to BIGINT µ-nats; the doc score is pure integer
  // arithmetic.
  /** x89's training+scoring CTE chain (no leading WITH), ending in
    * `f (doc_id, pos, fs)` and `ds (doc_id, score_sum)` — x96/x97
    * compose selection policies on top of the same scores. */
  private val classifierCtes: String = s"""
      n AS (SELECT doc_id, lang = 'en' AS pos, $normSql AS norm
                 FROM documents),
      w AS (SELECT doc_id, pos, string_split(norm, ' ') AS ws FROM n),
      f AS (SELECT doc_id, pos, list_concat(ws,
              list_transform(range(1, len(ws)),
                j -> array_to_string(ws[j:j+1], ' '))) AS fs
            FROM w),
      ex AS (SELECT pos, unnest(fs) AS t FROM f),
      c AS (SELECT t,
              CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS cpos,
              CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS cneg
            FROM ex GROUP BY t),
      tt AS (SELECT CAST(SUM(cpos) AS BIGINT) AS pos_tot,
                    CAST(SUM(cneg) AS BIGINT) AS neg_tot,
                    CAST(count(*) AS BIGINT) AS v
             FROM c),
      wt AS (SELECT t,
               CAST(floor(round(ln((CAST(cpos + 1 AS DOUBLE)
                   * CAST(neg_tot + v AS DOUBLE))
                 / (CAST(cneg + 1 AS DOUBLE) * CAST(pos_tot + v AS DOUBLE))),
                 6) * 1000000 + 0.5)
                 AS BIGINT) AS wgt
             FROM c, tt ORDER BY cpos + cneg DESC, t LIMIT 4096),
      sx AS (SELECT doc_id, unnest(fs) AS t FROM f),
      ds AS (SELECT sx.doc_id,
               CAST(COALESCE(SUM(w2.wgt), 0) AS BIGINT) AS score_sum
             FROM sx LEFT JOIN wt w2 ON w2.t = sx.t GROUP BY sx.doc_id)"""

  val x89 = Query(
    "x89_classifier_trained",
    Some(s"""
      WITH $classifierCtes
      SELECT f.doc_id, f.pos AS is_pos, CAST(len(f.fs) AS BIGINT) AS n_feats,
             COALESCE(ds.score_sum, CAST(0 AS BIGINT)) AS score_sum,
             COALESCE(ds.score_sum, 0) >= 0 AS pred_pos,
             (COALESCE(ds.score_sum, 0) >= 0) = f.pos AS correct
      FROM f LEFT JOIN ds ON ds.doc_id = f.doc_id
      ORDER BY f.doc_id""")
  ) { (s, d) =>
    TextAnalysis.trainedClassifier(documents(s, d), isPos = col("lang") === "en")
      .orderBy("doc_id")
  }

  // --- X96: TOP-p% SELECTION by trained-classifier score — the DCLM /
  // fastText curation step ("keep the best 10% by classifier score"):
  // per-feature-normalized score (one IEEE division of the BIGINT sums),
  // threshold = the exact 90th percentile (Spark `percentile` ≡ DuckDB
  // `quantile_cont`, the proven x19 contract, round-6), applied as a
  // 1-row broadcast — no sort of the corpus, no window.
  private val SelPct = 0.9
  val x96 = Query(
    "x96_classifier_select",
    Some(s"""
      WITH $classifierCtes,
      sc2 AS (SELECT f.doc_id,
                CAST(COALESCE(ds.score_sum, 0) AS DOUBLE) / len(f.fs)
                  AS score_pf
              FROM f LEFT JOIN ds ON ds.doc_id = f.doc_id),
      thr AS (SELECT round(quantile_cont(score_pf, $SelPct), 6) AS t FROM sc2)
      SELECT doc_id, round(score_pf, 6) AS score_pf,
             score_pf >= thr.t AS selected
      FROM sc2, thr ORDER BY doc_id""")
  ) { (s, d) =>
    val scored = TextAnalysis.trainedClassifier(documents(s, d),
        isPos = col("lang") === "en")
      .select(col("doc_id"),
        (col("score_sum").cast("double") / col("n_feats")).as("score_pf"))
    val thr = scored.agg(
      round(expr(s"percentile(score_pf, $SelPct)"), 6).as("t"))
    scored.crossJoin(broadcast(thr))
      .select(col("doc_id"), round(col("score_pf"), 6).as("score_pf"),
        (col("score_pf") >= col("t")).as("selected"))
      .orderBy("doc_id")
  }

  // --- X97: TOKEN-BUDGET-CONSTRAINED corpus selection — "take the best
  // docs until the budget is spent", made scalable: docs land in BOUNDED
  // score buckets (floor(score_pf·1000), clamped to ±500 — 1001 buckets
  // at ANY corpus size), bucket token totals accumulate best-first (a
  // window over ≤ 1001 rows — bounded, never corpus-sized), and a bucket
  // is kept iff its inclusive cumulative fits the budget (half the
  // corpus's tokens, a 1-row broadcast — no hand-tuned constant). Per-doc
  // verdict = the bucket's. Budget resolution is the bucket width; an
  // exact doc-level cut inside the boundary bucket is a per-bucket
  // (bounded) refinement left to the caller.
  val x97 = Query(
    "x97_budget_select",
    Some(s"""
      WITH $classifierCtes,
      sc2 AS (SELECT f.doc_id, CAST(len(f.fs) AS BIGINT) AS n_feats,
                CAST(COALESCE(ds.score_sum, 0) AS DOUBLE) / len(f.fs)
                  AS score_pf
              FROM f LEFT JOIN ds ON ds.doc_id = f.doc_id),
      wtok AS (SELECT doc_id, CAST(len(string_split(norm, ' ')) AS BIGINT)
                 AS ntok
               FROM n),
      dd AS (SELECT s.doc_id, w2.ntok,
               CAST(greatest(-500, least(500,
                 CAST(floor(s.score_pf * 1000) AS BIGINT))) AS BIGINT)
                 AS bucket
             FROM sc2 s JOIN wtok w2 ON w2.doc_id = s.doc_id),
      bud AS (SELECT CAST(floor(SUM(ntok) / 2) AS BIGINT) AS budget FROM dd),
      bk AS (SELECT bucket, CAST(SUM(ntok) AS BIGINT) AS btok
             FROM dd GROUP BY bucket),
      cum AS (SELECT bucket, btok,
                CAST(SUM(btok) OVER (ORDER BY bucket DESC
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
              FROM bk),
      keepb AS (SELECT bucket, cum_tok, cum_tok <= bud.budget AS kept_bucket
                FROM cum, bud)
      SELECT d.doc_id, d.bucket, d.ntok, k.kept_bucket AS kept
      FROM dd d JOIN keepb k ON k.bucket = d.bucket
      ORDER BY d.doc_id""")
  ) { (s, d) =>
    import graft.functions.TextFunctions._
    val docs = documents(s, d)
    val scored = TextAnalysis.trainedClassifier(docs,
        isPos = col("lang") === "en")
      .select(col("doc_id"),
        (col("score_sum").cast("double") / col("n_feats")).as("score_pf"))
    val withTok = scored.join(
      docs.select(col("doc_id"),
        size(words(normText(col("text")))).cast("long").as("ntok")), "doc_id")
    graft.operators.Curation.budgetSelect(withTok, "score_pf", "ntok")
      .orderBy("doc_id")
  }

  // --- X98: DSIR IMPORTANCE-RESAMPLED SELECTION (Xie et al. 2023) —
  // hashed-n-gram importance weights ln p̂_target/p̂_raw over a FIXED
  // 4096-bucket feature space (λ table bounded at any corpus size),
  // per-doc mean log-weight, then Gumbel-top-k resampling: a
  // deterministic Gumbel(0,1) draw (Knuth-hash uniform — no RNG) added
  // to the log-weight, keep the top 25% by exact percentile threshold
  // (1-row broadcast). Sampling-without-replacement proportional to
  // importance, reproducible across engines, retries, and appends.
  val x98 = Query(
    "x98_dsir_select",
    Some(s"""
      WITH n AS (SELECT doc_id, lang = 'en' AS tgt, $normSql AS norm
                 FROM documents),
      w AS (SELECT doc_id, tgt, string_split(norm, ' ') AS ws FROM n),
      f AS (SELECT doc_id, tgt, list_concat(ws,
              list_transform(range(1, len(ws)),
                j -> array_to_string(ws[j:j+1], ' '))) AS fs
            FROM w),
      ex AS (SELECT tgt, ${graft.functions.TextFunctions.md5BucketSql("t0.t")} AS b
             FROM (SELECT tgt, unnest(fs) AS t FROM f) t0),
      c AS (SELECT b, CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct,
              CAST(count(*) AS BIGINT) AS cr
            FROM ex GROUP BY b),
      tt AS (SELECT CAST(SUM(ct) AS BIGINT) AS tt2,
                    CAST(SUM(cr) AS BIGINT) AS tr
             FROM c),
      lam AS (SELECT b, CAST(floor(round(ln((CAST(ct + 1 AS DOUBLE) * (tr + 4096))
                / (CAST(cr + 1 AS DOUBLE) * (tt2 + 4096))), 6) * 1000000 + 0.5) AS BIGINT)
                AS lam
              FROM c, tt),
      sx AS (SELECT doc_id, CAST(len(fs) AS BIGINT) AS n_feats,
               unnest(fs) AS t
             FROM f),
      sb AS (SELECT doc_id, n_feats,
               ${graft.functions.TextFunctions.md5BucketSql("t")} AS b
             FROM sx),
      ds AS (SELECT sb.doc_id, MIN(sb.n_feats) AS n_feats,
               CAST(SUM(COALESCE(l.lam, 0)) AS BIGINT) AS imp_mu
             FROM sb LEFT JOIN lam l ON l.b = sb.b GROUP BY sb.doc_id),
      gk AS (SELECT doc_id, n_feats, imp_mu,
               round(CAST(imp_mu AS DOUBLE) / 1000000.0 / n_feats
                 + round(-ln(greatest(round(-ln(
                     (CAST(((doc_id % 2147483647) * 2654435761) % 1048576
                        AS DOUBLE) + 0.5) / 1048576.0), 6), 0.000001)), 6), 6) AS gkey
             FROM ds),
      thr AS (SELECT round(quantile_cont(gkey, 0.75), 6) AS t FROM gk)
      SELECT doc_id, n_feats, imp_mu, gkey, gkey >= thr.t AS selected
      FROM gk, thr ORDER BY doc_id""")
  ) { (s, d) =>
    Curation.dsirSelect(documents(s, d), isTarget = col("lang") === "en")
      .orderBy("doc_id")
  }

  // --- Y03: INCREMENTAL DSIR — the x41/x81/x93 store cadence applied to
  // the importance estimator: the old corpus (doc_id % 10 < 8) lives
  // only as its ≤ 4096-row bucket-count store (the estimator's exactly-
  // mergeable sufficient statistic); a new batch adds its own counts,
  // re-derives λ over old ∪ batch WITHOUT rescanning old text (plan
  // guard), and scores/resamples only itself. The oracle replays the
  // combined counts from the raw table.
  private def dsirStorePath(sfDir: String): String = {
    val f = new java.io.File(sfDir, "documents.parquet")
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${f.length}:${f.lastModified}:dsir1".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    s"${sys.props("java.io.tmpdir")}/graft-dsirstore-" +
      s"${sfDir.replaceAll("[^A-Za-z0-9._-]", "_")}-$fp"
  }

  private def ensureDsirStore(s: org.apache.spark.sql.SparkSession,
                              d: String): String = {
    val path = dsirStorePath(d)
    if (!new java.io.File(path, "_SUCCESS").exists())
      Curation.writeDsirStore(documents(s, d).filter(col("doc_id") % 10 < 8),
        isTarget = col("lang") === "en", path)
    path
  }

  val y03 = Query(
    "y03_dsir_incr",
    Some(s"""
      WITH n AS (SELECT doc_id, lang = 'en' AS tgt, $normSql AS norm
                 FROM documents),
      w AS (SELECT doc_id, tgt, string_split(norm, ' ') AS ws FROM n),
      f AS (SELECT doc_id, tgt, list_concat(ws,
              list_transform(range(1, len(ws)),
                j -> array_to_string(ws[j:j+1], ' '))) AS fs
            FROM w),
      ex AS (SELECT tgt, ${graft.functions.TextFunctions.md5BucketSql("t0.t")} AS b
             FROM (SELECT tgt, unnest(fs) AS t FROM f) t0),
      c AS (SELECT b, CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct,
              CAST(count(*) AS BIGINT) AS cr
            FROM ex GROUP BY b),
      tt AS (SELECT CAST(SUM(ct) AS BIGINT) AS tt2,
                    CAST(SUM(cr) AS BIGINT) AS tr
             FROM c),
      lam AS (SELECT b, CAST(floor(round(ln((CAST(ct + 1 AS DOUBLE) * (tr + 4096))
                / (CAST(cr + 1 AS DOUBLE) * (tt2 + 4096))), 6) * 1000000 + 0.5) AS BIGINT)
                AS lam
              FROM c, tt),
      sx AS (SELECT doc_id, CAST(len(fs) AS BIGINT) AS n_feats,
               unnest(fs) AS t
             FROM f WHERE doc_id % 10 >= 8),
      sb AS (SELECT doc_id, n_feats,
               ${graft.functions.TextFunctions.md5BucketSql("t")} AS b
             FROM sx),
      ds AS (SELECT sb.doc_id, MIN(sb.n_feats) AS n_feats,
               CAST(SUM(COALESCE(l.lam, 0)) AS BIGINT) AS imp_mu
             FROM sb LEFT JOIN lam l ON l.b = sb.b GROUP BY sb.doc_id),
      gk AS (SELECT doc_id, n_feats, imp_mu,
               round(CAST(imp_mu AS DOUBLE) / 1000000.0 / n_feats
                 + round(-ln(greatest(round(-ln(
                     (CAST(((doc_id % 2147483647) * 2654435761) % 1048576
                        AS DOUBLE) + 0.5) / 1048576.0), 6), 0.000001)), 6), 6) AS gkey
             FROM ds),
      thr AS (SELECT round(quantile_cont(gkey, 0.75), 6) AS t FROM gk)
      SELECT doc_id, n_feats, imp_mu, gkey, gkey >= thr.t AS selected
      FROM gk, thr ORDER BY doc_id""")
  ) { (s, d) =>
    val store = s.read.parquet(graft.streaming.StoreFs.dataDir(s, ensureDsirStore(s, d)))
    Curation.dsirSelectIncremental(
        documents(s, d).filter(col("doc_id") % 10 >= 8),
        isTarget = col("lang") === "en", store)
      .orderBy("doc_id")
  }

  // --- Y04: HASHED DOCUMENT EMBEDDING — text → vector without a model
  // (feature hashing / signed random projection): every unigram+bigram
  // adds ±1 to one of 64 buckets. Components, squared norm, and the
  // positional checksum are exact BIGINTs — zero floats, no rounding
  // contract. Graded by integer digests (the x67 discipline: scalar
  // digests, not array columns): norm², nnz, component sum, and the
  // position-weighted checksum Σ (j+1)·v[j] that pins every component.
  val y04 = Query(
    "y04_hash_embedding",
    Some(s"""
      WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
      w AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM n),
      f AS (SELECT doc_id, list_concat(ws,
              list_transform(range(1, len(ws)),
                j -> array_to_string(ws[j:j+1], ' '))) AS fs
            FROM w),
      sx AS (SELECT doc_id, unnest(fs) AS t FROM f),
      sg AS (SELECT doc_id,
               ${graft.functions.TextFunctions.md5BucketSql("t")} % 64 AS b,
               CASE WHEN (instr('0123456789abcdef', substr(md5(t), 4, 1)) - 1)
                      >= 8 THEN 1 ELSE -1 END AS s
             FROM sx),
      cells AS (SELECT doc_id, b, CAST(SUM(s) AS BIGINT) AS v
                FROM sg GROUP BY doc_id, b),
      dv AS (SELECT d.doc_id, r.j, CAST(COALESCE(c.v, 0) AS BIGINT) AS v
             FROM (SELECT doc_id FROM n) d
             CROSS JOIN (SELECT unnest(range(0, 64)) AS j) r
             LEFT JOIN cells c ON c.doc_id = d.doc_id AND c.b = r.j),
      vecs AS (SELECT doc_id, list(v ORDER BY j) AS vec FROM dv GROUP BY doc_id)
      SELECT doc_id,
             CAST(list_aggregate(list_transform(vec, x -> x * x), 'sum')
               AS BIGINT) AS norm_sq,
             CAST(len(list_filter(vec, x -> x <> 0)) AS INT) AS nnz,
             CAST(list_aggregate(vec, 'sum') AS BIGINT) AS v_sum,
             CAST(list_aggregate(list_transform(range(1, 65),
               j -> vec[j] * j), 'sum') AS BIGINT) AS chk
      FROM vecs ORDER BY doc_id""")
  ) { (s, d) =>
    TextAnalysis.hashedEmbedding(documents(s, d))
      .select(col("doc_id"), col("norm_sq"), col("nnz"),
        aggregate(col("vec"), lit(0L), (a, x) => a + x).as("v_sum"),
        aggregate(zip_with(col("vec"),
            sequence(lit(1L), lit(64L)), (v, j) => v * j),
          lit(0L), (a, x) => a + x).as("chk"))
      .orderBy("doc_id")
  }

  // --- Y05: TEXT-ONLY SEMANTIC NEAR-DUP — the end-to-end story y04
  // exists for: text → hashed embedding → corpus-adaptive sign-bit
  // cells → integer cross-multiplied τ² verdicts, no model and no float
  // anywhere. x76 semantics (kept iff no lower-id same-cell τ-close
  // doc), exact-dup texts collapse at cos = 1.
  private val hashCellSql: String =
    (0 until 12).map(j =>
      s"(CASE WHEN $j < nbits AND vec[${j + 1}] >= 0 THEN ${1 << j} ELSE 0 END)")
      .mkString(" + ")
  val y05 = Query(
    "y05_hash_neardup",
    Some(s"""
      WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
      w AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM n),
      f AS (SELECT doc_id, list_concat(ws,
              list_transform(range(1, len(ws)),
                j -> array_to_string(ws[j:j+1], ' '))) AS fs
            FROM w),
      sx AS (SELECT doc_id, unnest(fs) AS t FROM f),
      sg AS (SELECT doc_id,
               ${graft.functions.TextFunctions.md5BucketSql("t")} % 64 AS b,
               CASE WHEN (instr('0123456789abcdef', substr(md5(t), 4, 1)) - 1)
                      >= 8 THEN 1 ELSE -1 END AS s
             FROM sx),
      cells AS (SELECT doc_id, b, CAST(SUM(s) AS BIGINT) AS v
                FROM sg GROUP BY doc_id, b),
      dv AS (SELECT d.doc_id, r.j, CAST(COALESCE(c.v, 0) AS BIGINT) AS v
             FROM (SELECT doc_id FROM n) d
             CROSS JOIN (SELECT unnest(range(0, 64)) AS j) r
             LEFT JOIN cells c ON c.doc_id = d.doc_id AND c.b = r.j),
      vecs AS (SELECT doc_id, list(v ORDER BY j) AS vec FROM dv GROUP BY doc_id),
      cnt AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM n),
      nb AS (SELECT CAST(${SimilarityQueries.nbitsSqlFor(8, 12)} AS INT) AS nbits
             FROM cnt),
      vn AS (SELECT doc_id, vec,
               CAST(list_aggregate(list_transform(vec, x -> x * x), 'sum')
                 AS BIGINT) AS nsq
             FROM vecs),
      ce AS (SELECT doc_id, vec, nsq, CAST($hashCellSql AS INT) AS cell
             FROM vn, nb),
      pr AS (SELECT a.doc_id AS a2, b.doc_id AS b2, a.cell,
               CAST(list_aggregate(list_transform(range(1, 65),
                 j -> a.vec[j] * b.vec[j]), 'sum') AS BIGINT) AS dot,
               a.nsq AS na, b.nsq AS nb2
             FROM ce a JOIN ce b ON a.cell = b.cell AND a.doc_id < b.doc_id),
      cl AS (SELECT b2 AS doc_id, CAST(count(*) AS BIGINT) AS n_close
             FROM pr WHERE dot > 0 AND CAST(dot AS HUGEINT) * dot * 10000 >= CAST(2025 AS HUGEINT) * na * nb2
             GROUP BY b2)
      SELECT ce.doc_id, ce.cell,
             CAST(COALESCE(cl.n_close, 0) AS BIGINT) AS n_close,
             COALESCE(cl.n_close, 0) = 0 AS kept
      FROM ce LEFT JOIN cl ON cl.doc_id = ce.doc_id
      ORDER BY ce.doc_id""")
  ) { (s, d) =>
    TextAnalysis.hashedNearDup(documents(s, d)).orderBy("doc_id")
  }

  // --- Y06: RECALL GRADE for the text-only near-dup path — the x43/x55
  // self-grading contract extended to the hashed-vector flow: brute-
  // force τ-close truth for a bounded probe set vs what the y05 sign
  // cells actually find. found ⊆ true by construction (identical
  // integer test); the ratio is the only float (one IEEE division,
  // round-6), graded at the ≥ 0.6 production bound.
  val y06 = Query(
    "y06_hash_recall",
    Some(s"""
      WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
      w AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM n),
      f AS (SELECT doc_id, list_concat(ws,
              list_transform(range(1, len(ws)),
                j -> array_to_string(ws[j:j+1], ' '))) AS fs
            FROM w),
      sx AS (SELECT doc_id, unnest(fs) AS t FROM f),
      sg AS (SELECT doc_id,
               ${graft.functions.TextFunctions.md5BucketSql("t")} % 64 AS b,
               CASE WHEN (instr('0123456789abcdef', substr(md5(t), 4, 1)) - 1)
                      >= 8 THEN 1 ELSE -1 END AS s
             FROM sx),
      cells AS (SELECT doc_id, b, CAST(SUM(s) AS BIGINT) AS v
                FROM sg GROUP BY doc_id, b),
      dv AS (SELECT d.doc_id, r.j, CAST(COALESCE(c.v, 0) AS BIGINT) AS v
             FROM (SELECT doc_id FROM n) d
             CROSS JOIN (SELECT unnest(range(0, 64)) AS j) r
             LEFT JOIN cells c ON c.doc_id = d.doc_id AND c.b = r.j),
      vecs AS (SELECT doc_id, list(v ORDER BY j) AS vec FROM dv GROUP BY doc_id),
      cnt AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM n),
      nb AS (SELECT CAST(${SimilarityQueries.nbitsSqlFor(8, 12)} AS INT) AS nbits
             FROM cnt),
      vn AS (SELECT doc_id, vec,
               CAST(list_aggregate(list_transform(vec, x -> x * x), 'sum')
                 AS BIGINT) AS nsq
             FROM vecs),
      ce AS (SELECT doc_id, vec, nsq, CAST($hashCellSql AS INT) AS cell
             FROM vn, nb),
      ${SimilarityQueries.pidsCteSql("n", "doc_id")},
      pz AS (SELECT doc_id AS p_id, vec AS pv, nsq AS pn, cell AS p_cell
             FROM ce JOIN pids USING (doc_id)),
      tp AS (SELECT CAST(count(*) AS BIGINT) AS c FROM (
               SELECT CAST(list_aggregate(list_transform(range(1, 65),
                 j -> z.pv[j] * e.vec[j]), 'sum') AS BIGINT) AS dot,
                 z.pn AS pn, e.nsq AS nsq
               FROM ce e, pz z WHERE z.p_id <> e.doc_id) t
             WHERE dot > 0 AND CAST(dot AS HUGEINT) * dot * 10000 >= CAST(2025 AS HUGEINT) * pn * nsq),
      fs AS (SELECT CAST(count(*) AS BIGINT) AS c FROM (
               SELECT CAST(list_aggregate(list_transform(range(1, 65),
                 j -> z.pv[j] * e.vec[j]), 'sum') AS BIGINT) AS dot,
                 z.pn AS pn, e.nsq AS nsq
               FROM ce e JOIN pz z ON z.p_cell = e.cell
               WHERE z.p_id <> e.doc_id) t
             WHERE dot > 0 AND CAST(dot AS HUGEINT) * dot * 10000 >= CAST(2025 AS HUGEINT) * pn * nsq),
      msk AS (SELECT 0 AS mk FROM nb
              UNION ALL
              SELECT (1 << CAST(i AS INT))
              FROM (SELECT unnest(range(0, nbits)) AS i FROM nb)
              UNION ALL
              SELECT (1 << CAST(a.i AS INT)) + (1 << CAST(b.j AS INT))
              FROM (SELECT unnest(range(0, nbits)) AS i FROM nb) a,
                   (SELECT unnest(range(0, nbits)) AS j FROM nb) b
              WHERE a.i < b.j
              UNION ALL
              SELECT (1 << CAST(a.i AS INT)) + (1 << CAST(b.j AS INT))
                   + (1 << CAST(c.k AS INT))
              FROM (SELECT unnest(range(0, nbits)) AS i FROM nb) a,
                   (SELECT unnest(range(0, nbits)) AS j FROM nb) b,
                   (SELECT unnest(range(0, nbits)) AS k FROM nb) c
              WHERE a.i < b.j AND b.j < c.k),
      fm AS (SELECT CAST(count(*) AS BIGINT) AS c FROM (
               SELECT CAST(list_aggregate(list_transform(range(1, 65),
                 j -> z.pv[j] * e.vec[j]), 'sum') AS BIGINT) AS dot,
                 z.pn AS pn, e.nsq AS nsq
               FROM ce e JOIN (SELECT p.*, m.mk FROM pz p, msk m) z
                 ON xor(z.p_cell, z.mk) = e.cell
               WHERE z.p_id <> e.doc_id) t
             WHERE dot > 0 AND CAST(dot AS HUGEINT) * dot * 10000 >= CAST(2025 AS HUGEINT) * pn * nsq),
      np AS (SELECT CAST(count(*) AS BIGINT) AS n_probes FROM pz),
      rec AS (SELECT np.n_probes, tp.c AS n_true, fs.c AS n_single,
                fm.c AS n_multi,
                round(CASE WHEN tp.c = 0 THEN 1.0
                           ELSE CAST(fs.c AS DOUBLE) / tp.c END, 6)
                  AS recall_single,
                round(CASE WHEN tp.c = 0 THEN 1.0
                           ELSE CAST(fm.c AS DOUBLE) / tp.c END, 6)
                  AS recall_multi
              FROM np, tp, fs, fm)
      SELECT n_probes, n_true, n_single, n_multi, recall_single,
             recall_multi, recall_multi >= 0.5 AS recall_ok
      FROM rec""")
  ) { (s, d) =>
    // bound 0.5: re-benchmarked floor at the production radius rule
    // (y10 picks radius 3 at both graded SFs) on the unbiased
    // hash-ordered probe set — 0.93 at sf0.01, 0.58 at sf0.1 (nbits
    // grows to 10 and a FIXED radius loses recall, exactly the y10
    // geometry; the radius dial, not the bound, is the recall lever).
    TextAnalysis.hashedNearDupRecall(documents(s, d), bound = 0.5)
  }

  // --- Y07: MULTI-PROBE text-only near-dup — y05's verdict contract
  // run over the y06-proven candidate neighborhood (all cells within
  // Hamming 3, recall 0.84 vs single-probe 0.04): the production form
  // of the model-free dedup. A pair is generated once (the XOR mask
  // between two cells is unique), verdicts stay integer-exact.
  val y07 = Query(
    "y07_hash_neardup_mp",
    Some(s"""
      WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
      w AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM n),
      f AS (SELECT doc_id, list_concat(ws,
              list_transform(range(1, len(ws)),
                j -> array_to_string(ws[j:j+1], ' '))) AS fs
            FROM w),
      sx AS (SELECT doc_id, unnest(fs) AS t FROM f),
      sg AS (SELECT doc_id,
               ${graft.functions.TextFunctions.md5BucketSql("t")} % 64 AS b,
               CASE WHEN (instr('0123456789abcdef', substr(md5(t), 4, 1)) - 1)
                      >= 8 THEN 1 ELSE -1 END AS s
             FROM sx),
      cells AS (SELECT doc_id, b, CAST(SUM(s) AS BIGINT) AS v
                FROM sg GROUP BY doc_id, b),
      dv AS (SELECT d.doc_id, r.j, CAST(COALESCE(c.v, 0) AS BIGINT) AS v
             FROM (SELECT doc_id FROM n) d
             CROSS JOIN (SELECT unnest(range(0, 64)) AS j) r
             LEFT JOIN cells c ON c.doc_id = d.doc_id AND c.b = r.j),
      vecs AS (SELECT doc_id, list(v ORDER BY j) AS vec FROM dv GROUP BY doc_id),
      cnt AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM n),
      nb AS (SELECT CAST(${SimilarityQueries.nbitsSqlFor(8, 12)} AS INT) AS nbits
             FROM cnt),
      vn AS (SELECT doc_id, vec,
               CAST(list_aggregate(list_transform(vec, x -> x * x), 'sum')
                 AS BIGINT) AS nsq
             FROM vecs),
      ce AS (SELECT doc_id, vec, nsq, CAST($hashCellSql AS INT) AS cell
             FROM vn, nb),
      msk AS (SELECT 0 AS mk FROM nb
              UNION ALL
              SELECT (1 << CAST(i AS INT))
              FROM (SELECT unnest(range(0, nbits)) AS i FROM nb)
              UNION ALL
              SELECT (1 << CAST(a.i AS INT)) + (1 << CAST(b.j AS INT))
              FROM (SELECT unnest(range(0, nbits)) AS i FROM nb) a,
                   (SELECT unnest(range(0, nbits)) AS j FROM nb) b
              WHERE a.i < b.j
              UNION ALL
              SELECT (1 << CAST(a.i AS INT)) + (1 << CAST(b.j AS INT))
                   + (1 << CAST(c.k AS INT))
              FROM (SELECT unnest(range(0, nbits)) AS i FROM nb) a,
                   (SELECT unnest(range(0, nbits)) AS j FROM nb) b,
                   (SELECT unnest(range(0, nbits)) AS k FROM nb) c
              WHERE a.i < b.j AND b.j < c.k),
      pr AS (SELECT a.doc_id AS a2, b.doc_id AS b2,
               CAST(list_aggregate(list_transform(range(1, 65),
                 j -> a.vec[j] * b.vec[j]), 'sum') AS BIGINT) AS dot,
               a.nsq AS na, b.nsq AS nb2
             FROM (SELECT c0.*, m.mk FROM ce c0, msk m) a
             JOIN ce b ON xor(a.cell, a.mk) = b.cell
               AND a.doc_id < b.doc_id),
      cl AS (SELECT b2 AS doc_id, CAST(count(*) AS BIGINT) AS n_close
             FROM pr WHERE dot > 0 AND CAST(dot AS HUGEINT) * dot * 10000 >= CAST(2025 AS HUGEINT) * na * nb2
             GROUP BY b2)
      SELECT ce.doc_id, ce.cell,
             CAST(COALESCE(cl.n_close, 0) AS BIGINT) AS n_close,
             COALESCE(cl.n_close, 0) = 0 AS kept
      FROM ce LEFT JOIN cl ON cl.doc_id = ce.doc_id
      ORDER BY ce.doc_id""")
  ) { (s, d) =>
    TextAnalysis.hashedNearDup(documents(s, d), probeHamming = 3)
      .orderBy("doc_id")
  }

  // --- Y10: AUTO-RADIUS multi-probe near-dup — the production dial:
  // NotchProbe measured (SCALE.md) that fixed-radius recall decays as
  // auto-bits grows (0.84 at nbits 6 → 0.49 at 12), and that
  // radius = clamp(round(nbits/3), 3, 5) re-crosses the 0.6 bound at
  // every operating point. This query grades the RULE itself: the
  // chosen nbits and radius ride in the output, and the oracle replays
  // the identical integer formula ((2·nbits + 3) // 6, clamped) plus a
  // brute-force Hamming ≤ radius pair set — a wrong clamp, rounding
  // mode, band decomposition, or uniqueness bug all hash-mismatch. At
  // sf0.01 the rule picks radius 3, so the verdicts coincide with
  // y07's by design — what is graded here beyond y07 is the dial.
  val y10 = Query(
    "y10_hash_neardup_autorad",
    Some(s"""
      WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
      w AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM n),
      f AS (SELECT doc_id, list_concat(ws,
              list_transform(range(1, len(ws)),
                j -> array_to_string(ws[j:j+1], ' '))) AS fs
            FROM w),
      sx AS (SELECT doc_id, unnest(fs) AS t FROM f),
      sg AS (SELECT doc_id,
               ${graft.functions.TextFunctions.md5BucketSql("t")} % 64 AS b,
               CASE WHEN (instr('0123456789abcdef', substr(md5(t), 4, 1)) - 1)
                      >= 8 THEN 1 ELSE -1 END AS s
             FROM sx),
      cells AS (SELECT doc_id, b, CAST(SUM(s) AS BIGINT) AS v
                FROM sg GROUP BY doc_id, b),
      dv AS (SELECT d.doc_id, r.j, CAST(COALESCE(c.v, 0) AS BIGINT) AS v
             FROM (SELECT doc_id FROM n) d
             CROSS JOIN (SELECT unnest(range(0, 64)) AS j) r
             LEFT JOIN cells c ON c.doc_id = d.doc_id AND c.b = r.j),
      vecs AS (SELECT doc_id, list(v ORDER BY j) AS vec FROM dv GROUP BY doc_id),
      cnt AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM n),
      nb AS (SELECT CAST(${SimilarityQueries.nbitsSqlFor(8, 12)} AS INT) AS nbits
             FROM cnt),
      rb AS (SELECT nbits,
               CAST(LEAST(5, GREATEST(3, (2 * nbits + 3) // 6)) AS INT) AS radius
             FROM nb),
      vn AS (SELECT doc_id, vec,
               CAST(list_aggregate(list_transform(vec, x -> x * x), 'sum')
                 AS BIGINT) AS nsq
             FROM vecs),
      ce AS (SELECT doc_id, vec, nsq, CAST($hashCellSql AS INT) AS cell,
               nbits, radius
             FROM vn, rb),
      pr AS (SELECT a.doc_id AS a2, b.doc_id AS b2,
               CAST(list_aggregate(list_transform(range(1, 65),
                 j -> a.vec[j] * b.vec[j]), 'sum') AS BIGINT) AS dot,
               a.nsq AS na, b.nsq AS nb2
             FROM ce a JOIN ce b ON a.doc_id < b.doc_id
               AND bit_count(xor(a.cell, b.cell)) <= a.radius),
      cl AS (SELECT b2 AS doc_id, CAST(count(*) AS BIGINT) AS n_close
             FROM pr WHERE dot > 0 AND CAST(dot AS HUGEINT) * dot * 10000 >= CAST(2025 AS HUGEINT) * na * nb2
             GROUP BY b2)
      SELECT ce.doc_id, ce.cell, ce.nbits, ce.radius,
             CAST(COALESCE(cl.n_close, 0) AS BIGINT) AS n_close,
             COALESCE(cl.n_close, 0) = 0 AS kept
      FROM ce LEFT JOIN cl ON cl.doc_id = ce.doc_id
      ORDER BY ce.doc_id""")
  ) { (s, d) =>
    TextAnalysis.hashedNearDupAutoRadius(documents(s, d)).orderBy("doc_id")
  }

  // --- Y12: maxBits NOTCH-PROMOTION near-dup — the second production
  // dial measured by NotchProbe (SCALE.md "the maxBits notch"): the
  // standing 12-bit cap saturates once n > targetOcc·2^12 = 32768 and
  // occupancy grows linearly again; the promotion rule caps the bit
  // count at 16 past that threshold — one integer comparison on the same
  // 1-row count broadcast as nbits and the y10 radius. This query grades
  // the RULE: cap, nbits and radius ride in the output, and the oracle
  // replays raw autoBits at 16, LEAST with the promoted cap, the radius
  // clamp, and the brute-force Hamming ≤ radius pair set. At sf0.01 the
  // corpus sits below the notch (cap 12, nbits 6), so verdicts coincide
  // with y10's — what is graded beyond y10 is the promotion dial itself;
  // NotchProbe measures the promoted regime at the 50k corpus.
  private val hashCellSql16: String =
    (0 until 16).map(j =>
      s"(CASE WHEN $j < nbits AND vec[${j + 1}] >= 0 THEN ${1 << j} ELSE 0 END)")
      .mkString(" + ")
  val y12 = Query(
    "y12_hash_neardup_autocap",
    Some(s"""
      WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
      w AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM n),
      f AS (SELECT doc_id, list_concat(ws,
              list_transform(range(1, len(ws)),
                j -> array_to_string(ws[j:j+1], ' '))) AS fs
            FROM w),
      sx AS (SELECT doc_id, unnest(fs) AS t FROM f),
      sg AS (SELECT doc_id,
               ${graft.functions.TextFunctions.md5BucketSql("t")} % 64 AS b,
               CASE WHEN (instr('0123456789abcdef', substr(md5(t), 4, 1)) - 1)
                      >= 8 THEN 1 ELSE -1 END AS s
             FROM sx),
      cells AS (SELECT doc_id, b, CAST(SUM(s) AS BIGINT) AS v
                FROM sg GROUP BY doc_id, b),
      dv AS (SELECT d.doc_id, r.j, CAST(COALESCE(c.v, 0) AS BIGINT) AS v
             FROM (SELECT doc_id FROM n) d
             CROSS JOIN (SELECT unnest(range(0, 64)) AS j) r
             LEFT JOIN cells c ON c.doc_id = d.doc_id AND c.b = r.j),
      vecs AS (SELECT doc_id, list(v ORDER BY j) AS vec FROM dv GROUP BY doc_id),
      cnt AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM n),
      nb AS (SELECT CAST(CASE WHEN cnt > 32768 THEN 16 ELSE 12 END AS INT) AS cap,
               CAST(LEAST(${SimilarityQueries.nbitsSqlFor(8, 16)},
                 CASE WHEN cnt > 32768 THEN 16 ELSE 12 END) AS INT) AS nbits
             FROM cnt),
      rb AS (SELECT cap, nbits,
               CAST(LEAST(5, GREATEST(3, (2 * nbits + 3) // 6)) AS INT) AS radius
             FROM nb),
      vn AS (SELECT doc_id, vec,
               CAST(list_aggregate(list_transform(vec, x -> x * x), 'sum')
                 AS BIGINT) AS nsq
             FROM vecs),
      ce AS (SELECT doc_id, vec, nsq, CAST($hashCellSql16 AS INT) AS cell,
               cap, nbits, radius
             FROM vn, rb),
      pr AS (SELECT a.doc_id AS a2, b.doc_id AS b2,
               CAST(list_aggregate(list_transform(range(1, 65),
                 j -> a.vec[j] * b.vec[j]), 'sum') AS BIGINT) AS dot,
               a.nsq AS na, b.nsq AS nb2
             FROM ce a JOIN ce b ON a.doc_id < b.doc_id
               AND bit_count(xor(a.cell, b.cell)) <= a.radius),
      cl AS (SELECT b2 AS doc_id, CAST(count(*) AS BIGINT) AS n_close
             FROM pr WHERE dot > 0 AND CAST(dot AS HUGEINT) * dot * 10000 >= CAST(2025 AS HUGEINT) * na * nb2
             GROUP BY b2)
      SELECT ce.doc_id, ce.cell, ce.cap, ce.nbits, ce.radius,
             CAST(COALESCE(cl.n_close, 0) AS BIGINT) AS n_close,
             COALESCE(cl.n_close, 0) = 0 AS kept
      FROM ce LEFT JOIN cl ON cl.doc_id = ce.doc_id
      ORDER BY ce.doc_id""")
  ) { (s, d) =>
    TextAnalysis.hashedNearDupAutoCap(documents(s, d)).orderBy("doc_id")
  }

  // --- Y39: COUNT-MIN-SKETCH heavy hitters — the frequency-sketch tier
  // the HLL (q08b) and percentile (x35) sketches don't cover: one CMS
  // over the full token stream (built-in `count_min_sketch` aggregate,
  // fixed seed), then the exact top-10 tokens are checked against the
  // sketch's estimates. Graded via the q08b self-grading pattern —
  // sketch VALUES never cross engines, only their provable properties:
  // `overest_ok` (CMS never underestimates — a hard guarantee, not a
  // probability) and `bound_ok` (est − exact ≤ ε·N at ε = 0.001 —
  // deterministic for the fixed fixture + seed, verified at both SFs).
  // The only driver-side data: the 10-row top-k and one ~KB sketch
  // binary (the sanctioned bounded collect).
  val y39 = Query(
    "y39_cms_heavy_hitters",
    Some(s"""
      WITH t AS (SELECT unnest(string_split($normSql, ' ')) AS w FROM documents),
      c AS (SELECT w AS token, CAST(count(*) AS BIGINT) AS exact_n
            FROM t GROUP BY w)
      SELECT token, exact_n,
             CAST(1 AS INT) AS overest_ok, CAST(1 AS INT) AS bound_ok
      FROM c ORDER BY exact_n DESC, token LIMIT 10""")
  ) { (s, d) =>
    import graft.functions.TextFunctions._
    import s.implicits._
    val toks = documents(s, d)
      .select(explode(words(normText(col("text")))).as("token"))
    val counts = graft.core.Caches.scoped(
      toks.groupBy("token").agg(count(lit(1)).as("exact_n")))
    val top = counts.orderBy(col("exact_n").desc, col("token"))
      .limit(10).collect()
    val nTotal = counts.agg(sum(col("exact_n"))).head.getLong(0)
    val eps = 0.001
    val sketchBytes = toks
      .agg(expr(s"count_min_sketch(token, ${eps}d, 0.99d, 42)"))
      .head.getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(sketchBytes))
    val bound = math.ceil(eps * nTotal).toLong
    top.map { r =>
      val token = r.getString(0); val exact = r.getLong(1)
      val est = cms.estimateCount(token)
      (token, exact,
        if (est >= exact) 1 else 0,
        if (est - exact <= bound) 1 else 0)
    }.toSeq.toDF("token", "exact_n", "overest_ok", "bound_ok")
      .orderBy(col("exact_n").desc, col("token"))
  }

  val all: Seq[Query] = Seq(x06, x07, x08, x09, x22, x32, x39, x60, x78, x89,
    x96, x97, x98, y03, y04, y05, y06, y07, y10, y12, y39)
}
