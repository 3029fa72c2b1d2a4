package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables._
import graft.operators.{Quantization, Retrieval}

/** Lexical retrieval + int8 quantization suite. BM25's one libm call
  * (ln) is rounded to 6 before use and its Scala-precomputed constants
  * are interpolated into the oracle text (shortest-repr doubles round-
  * trip exactly); the quantization queries are integer-exact end to end
  * — no float aggregation anywhere in their graded output. */
object RetrievalQueries {

  private val normSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

  // --- X66: BM25 top-10 per query term.
  private val Terms = Seq("spark", "window", "customer", "vector", "stream")
  private val K1 = 1.2
  private val B = 0.75
  private val termsSql = Terms.map(t => s"'$t'").mkString("(", ",", ")")

  val x66 = Query(
    "x66_bm25_topk",
    Some(s"""
      WITH w AS (SELECT doc_id, string_split($normSql, ' ') AS ws FROM documents),
      p AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS dl FROM w),
      g AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CAST(dl AS DECIMAL(18,0))) AS DOUBLE) / count(*) AS avgdl
            FROM p),
      tf AS (SELECT term, doc_id, dl, CAST(count(*) AS BIGINT) AS tf
             FROM (SELECT doc_id, dl, unnest(ws) AS term FROM p)
             WHERE term IN $termsSql GROUP BY term, doc_id, dl),
      df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
      sc AS (SELECT t.term, t.doc_id, t.tf,
               ROUND(ROUND(ln((g.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0), 6)
                 * (t.tf * ${K1 + 1.0})
                 / (t.tf + $K1 * (${1.0 - B} + $B * t.dl / g.avgdl)), 6) AS score
             FROM tf t JOIN df f USING (term) CROSS JOIN g),
      r AS (SELECT term, doc_id, tf, score,
              CAST(row_number() OVER (PARTITION BY term
                ORDER BY score DESC, doc_id) AS INT) AS rk
            FROM sc)
      SELECT term, doc_id, tf, score, rk FROM r WHERE rk <= 10
      ORDER BY term, rk""")
  ) { (s, d) =>
    Retrieval.bm25TopK(documents(s, d), Terms, k = 10, k1 = K1, b = B)
      .orderBy("term", "rk")
  }

  // --- Y19: x66 served from the persisted INVERTED INDEX — the query
  // plan never reads document text (plan-pinned): tf rows come from the
  // postings table's term-pruned scan, corpus scalars from the compact
  // doclen table. Same oracle as x66 — byte-identical output through a
  // corpus-scan-free plan is the store's correctness contract (the x41
  // signature-store move applied to retrieval; the ScaleProbe x66 row
  // measures exactly the per-query tokenize this store amortizes).
  private def indexStorePath(sfDir: String): String =
    StoreFixtures.path("graft-bm25index", sfDir, "documents.parquet",
      "bm25idx1")

  private def ensureIndexStore(s: org.apache.spark.sql.SparkSession,
                               d: String): String = {
    val path = indexStorePath(d)
    StoreFixtures.onceBySuccess(path, "postings") {
      Retrieval.writeIndexStore(documents(s, d), path)
    }
  }

  val y19 = Query(
    "y19_bm25_store",
    Some(s"""
      WITH w AS (SELECT doc_id, string_split($normSql, ' ') AS ws FROM documents),
      p AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS dl FROM w),
      g AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CAST(dl AS DECIMAL(18,0))) AS DOUBLE) / count(*) AS avgdl
            FROM p),
      tf AS (SELECT term, doc_id, dl, CAST(count(*) AS BIGINT) AS tf
             FROM (SELECT doc_id, dl, unnest(ws) AS term FROM p)
             WHERE term IN $termsSql GROUP BY term, doc_id, dl),
      df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
      sc AS (SELECT t.term, t.doc_id, t.tf,
               ROUND(ROUND(ln((g.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0), 6)
                 * (t.tf * ${K1 + 1.0})
                 / (t.tf + $K1 * (${1.0 - B} + $B * t.dl / g.avgdl)), 6) AS score
             FROM tf t JOIN df f USING (term) CROSS JOIN g),
      r AS (SELECT term, doc_id, tf, score,
              CAST(row_number() OVER (PARTITION BY term
                ORDER BY score DESC, doc_id) AS INT) AS rk
            FROM sc)
      SELECT term, doc_id, tf, score, rk FROM r WHERE rk <= 10
      ORDER BY term, rk""")
  ) { (s, d) =>
    Retrieval.bm25TopKFromStore(s, ensureIndexStore(s, d), Terms,
        k = 10, k1 = K1, b = B)
      .orderBy("term", "rk")
  }

  // --- Y20: the index store's INCREMENTAL lifecycle — base store built
  // from 80% of the corpus, the remaining 20% APPENDED as a batch (only
  // the batch is tokenized, old text never rescanned — the x41/x93
  // cadence), then the SAME x66 oracle answered from the two-generation
  // store. Full-corpus-identical answers from an incrementally grown
  // index is the lifecycle's correctness contract.
  private def ensureIncrIndexStore(s: org.apache.spark.sql.SparkSession,
                                   d: String): String = {
    val path = indexStorePath(d) + "-incr"
    StoreFixtures.onceByMarker(path, "_graft_appended") {
      Retrieval.writeIndexStore(
        documents(s, d).filter(col("doc_id") % 10 < 8), path)
      Retrieval.appendIndexStore(
        documents(s, d).filter(col("doc_id") % 10 >= 8), path)
    }
  }

  val y20 = Query(
    "y20_bm25_store_incr",
    Some(s"""
      WITH w AS (SELECT doc_id, string_split($normSql, ' ') AS ws FROM documents),
      p AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS dl FROM w),
      g AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CAST(dl AS DECIMAL(18,0))) AS DOUBLE) / count(*) AS avgdl
            FROM p),
      tf AS (SELECT term, doc_id, dl, CAST(count(*) AS BIGINT) AS tf
             FROM (SELECT doc_id, dl, unnest(ws) AS term FROM p)
             WHERE term IN $termsSql GROUP BY term, doc_id, dl),
      df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
      sc AS (SELECT t.term, t.doc_id, t.tf,
               ROUND(ROUND(ln((g.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0), 6)
                 * (t.tf * ${K1 + 1.0})
                 / (t.tf + $K1 * (${1.0 - B} + $B * t.dl / g.avgdl)), 6) AS score
             FROM tf t JOIN df f USING (term) CROSS JOIN g),
      r AS (SELECT term, doc_id, tf, score,
              CAST(row_number() OVER (PARTITION BY term
                ORDER BY score DESC, doc_id) AS INT) AS rk
            FROM sc)
      SELECT term, doc_id, tf, score, rk FROM r WHERE rk <= 10
      ORDER BY term, rk""")
  ) { (s, d) =>
    Retrieval.bm25TopKFromStore(s, ensureIncrIndexStore(s, d), Terms,
        k = 10, k1 = K1, b = B)
      .orderBy("term", "rk")
  }

  // --- Y35: x66's oracle answered from a STREAM-BUILT index store —
  // the y19 contract applied to the §2.10 ingest path itself: the
  // corpus arrives as a 3-micro-batch file-source STREAM (one file per
  // trigger, data never driver-side), `IndexIngest.run`'s foreachBatch
  // appends each batch to doclen/postings/positions with replay-safe
  // tags, and the finished store serves BM25 with no document-text
  // scan. Byte-identity with the full-corpus oracle is exactly the
  // "stream ≡ batch" claim the IndexIngestSpec proves — here put under
  // the driver's DuckDB contract. (Reference semantics: the validator
  // loop's continuously maintained state, neurons/validator.py:146,168.)
  private def ensureStreamIndexStore(s: org.apache.spark.sql.SparkSession,
                                     d: String): String =
    StoreFixtures.onceByMarker(indexStorePath(d) + "-stream",
        "_graft_stream_done") {
      val path = indexStorePath(d) + "-stream"
      val stage = java.nio.file.Files
        .createTempDirectory("graft-y35-stage-").toString
      // stage the corpus as exactly 3 files = 3 micro-batches
      documents(s, d).select(col("doc_id"), col("text"))
        .repartition(3).write.mode("overwrite").parquet(stage)
      val src = s.readStream
        .schema("doc_id BIGINT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
      val q = graft.streaming.IndexIngest.run(src, path,
        checkpoint = java.nio.file.Files
          .createTempDirectory("graft-y35-ckpt-").toString)()
      try q.processAllAvailable() finally q.stop()
    }

  val y35 = Query(
    "y35_bm25_stream_store",
    Some(s"""
      WITH w AS (SELECT doc_id, string_split($normSql, ' ') AS ws FROM documents),
      p AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS dl FROM w),
      g AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CAST(dl AS DECIMAL(18,0))) AS DOUBLE) / count(*) AS avgdl
            FROM p),
      tf AS (SELECT term, doc_id, dl, CAST(count(*) AS BIGINT) AS tf
             FROM (SELECT doc_id, dl, unnest(ws) AS term FROM p)
             WHERE term IN $termsSql GROUP BY term, doc_id, dl),
      df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
      sc AS (SELECT t.term, t.doc_id, t.tf,
               ROUND(ROUND(ln((g.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0), 6)
                 * (t.tf * ${K1 + 1.0})
                 / (t.tf + $K1 * (${1.0 - B} + $B * t.dl / g.avgdl)), 6) AS score
             FROM tf t JOIN df f USING (term) CROSS JOIN g),
      r AS (SELECT term, doc_id, tf, score,
              CAST(row_number() OVER (PARTITION BY term
                ORDER BY score DESC, doc_id) AS INT) AS rk
            FROM sc)
      SELECT term, doc_id, tf, score, rk FROM r WHERE rk <= 10
      ORDER BY term, rk""")
  ) { (s, d) =>
    Retrieval.bm25TopKFromStore(s, ensureStreamIndexStore(s, d), Terms,
        k = 10, k1 = K1, b = B)
      .orderBy("term", "rk")
  }

  // --- Y38: PREFIX (wildcard) term search from the index store — the
  // range-pruning face of the term-sorted layout: `term LIKE 'st%'` is
  // a StringStartsWith filter, which parquet prunes via the sorted
  // postings' row-group min/max term stats (the same physical lever the
  // exact-term IN filter uses, applied to a RANGE). No document-text
  // scan in the plan (pinned); the oracle replays the tokenize.
  // "s" covers 6 of the word-soup fixture's 31 distinct terms — the
  // widest prefix family the synthetic vocabulary offers
  private val PrefixQ = "s"
  val y38 = Query(
    "y38_prefix_search",
    Some(s"""
      WITH w AS (SELECT doc_id, string_split($normSql, ' ') AS ws FROM documents),
      t AS (SELECT doc_id, unnest(ws) AS term FROM w),
      f AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM t
            WHERE term LIKE '$PrefixQ%' GROUP BY term, doc_id)
      SELECT term, CAST(count(*) AS BIGINT) AS df,
             CAST(SUM(tf) AS BIGINT) AS tf_total
      FROM f GROUP BY term ORDER BY term""")
  ) { (s, d) =>
    s.read.parquet(graft.streaming.StoreFs.dataDir(s, s"${ensureIndexStore(s, d)}/postings"))
      .filter(col("term").startsWith(PrefixQ))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_total"))
      .orderBy("term")
  }

  // --- Y17: HYBRID RETRIEVAL (BM25 ⊕ embedding) fused by Reciprocal
  // Rank Fusion — the production shape for corpus search: lexical and
  // semantic lists each cut to 50 by distributed top-k, fused on ranks
  // alone (1/(60+rk) per list). Every rank input is an exact integer
  // (micro-unit BM25 mass; BIGINT hashed-embedding dot vs the probe
  // doc), so the only floats in the output are two IEEE divisions added
  // in fixed order.
  private val ProbeDoc = 42L

  val y17 = Query(
    "y17_hybrid_rrf",
    Some(s"""
      WITH w AS (SELECT doc_id, string_split($normSql, ' ') AS ws FROM documents),
      p AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS dl FROM w),
      g AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CAST(dl AS DECIMAL(18,0))) AS DOUBLE) / count(*) AS avgdl
            FROM p),
      tf AS (SELECT term, doc_id, dl, CAST(count(*) AS BIGINT) AS tf
             FROM (SELECT doc_id, dl, unnest(ws) AS term FROM p)
             WHERE term IN $termsSql GROUP BY term, doc_id, dl),
      df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
      sc AS (SELECT t.term, t.doc_id, t.tf,
               ROUND(ROUND(ln((g.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0), 6)
                 * (t.tf * ${K1 + 1.0})
                 / (t.tf + $K1 * (${1.0 - B} + $B * t.dl / g.avgdl)), 6) AS score
             FROM tf t JOIN df f USING (term) CROSS JOIN g),
      lexdoc AS (SELECT doc_id,
                   CAST(SUM(CAST(floor(score * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
                     AS lex_int
                 FROM sc GROUP BY doc_id),
      lexr AS (SELECT doc_id,
                 CAST(row_number() OVER (ORDER BY lex_int DESC, doc_id) AS INT)
                   AS lex_rk
               FROM lexdoc QUALIFY lex_rk <= 50),
      fe AS (SELECT doc_id, list_concat(ws,
               list_transform(range(1, len(ws)),
                 j -> array_to_string(ws[j:j+1], ' '))) AS fs
             FROM w),
      sx AS (SELECT doc_id, unnest(fs) AS t FROM fe),
      sg AS (SELECT doc_id,
               ${graft.functions.TextFunctions.md5BucketSql("t")} % 64 AS b,
               CASE WHEN (instr('0123456789abcdef', substr(md5(t), 4, 1)) - 1)
                      >= 8 THEN 1 ELSE -1 END AS s
             FROM sx),
      cells AS (SELECT doc_id, b, CAST(SUM(s) AS BIGINT) AS v
                FROM sg GROUP BY doc_id, b),
      dv AS (SELECT d.doc_id, r.j, CAST(COALESCE(c.v, 0) AS BIGINT) AS v
             FROM (SELECT doc_id FROM w) d
             CROSS JOIN (SELECT unnest(range(0, 64)) AS j) r
             LEFT JOIN cells c ON c.doc_id = d.doc_id AND c.b = r.j),
      vecs AS (SELECT doc_id, list(v ORDER BY j) AS vec FROM dv GROUP BY doc_id),
      q AS (SELECT vec AS qvec FROM vecs WHERE doc_id = $ProbeDoc),
      dots AS (SELECT v.doc_id,
                 CAST(list_aggregate(list_transform(range(1, 65),
                   j -> v.vec[j] * q.qvec[j]), 'sum') AS BIGINT) AS dot
               FROM vecs v CROSS JOIN q WHERE v.doc_id <> $ProbeDoc),
      semr AS (SELECT doc_id,
                 CAST(row_number() OVER (ORDER BY dot DESC, doc_id) AS INT)
                   AS sem_rk
               FROM dots QUALIFY sem_rk <= 50),
      fuse AS (SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
                 l.lex_rk, s.sem_rk,
                 ROUND(COALESCE(CAST(1 AS DOUBLE) / (60 + l.lex_rk), 0)
                   + COALESCE(CAST(1 AS DOUBLE) / (60 + s.sem_rk), 0), 6) AS rrf
               FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id)
      SELECT doc_id, lex_rk, sem_rk, rrf,
             CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS rk
      FROM fuse QUALIFY rk <= 20 ORDER BY rk""")
  ) { (s, d) =>
    Retrieval.hybridRrf(documents(s, d), Terms, ProbeDoc,
      kList = 50, kOut = 20, k1 = K1, b = B)
  }

  // --- Y18: the MANY-QUERY form of y17 — a batch of (query_id, terms,
  // probe doc) resolved in one BM25 pass over the union term set and one
  // embedding pass against the broadcast probe vectors; every bounded
  // cut goes through the two-phase TopKPerKey operator keyed by
  // query_id (the swap y17's scaladoc promises), so query count scales
  // the broadcasts, never the corpus scans.
  private val BatchQueries = Seq(
    (1L, Seq("spark", "window", "stream"), 42L),
    (2L, Seq("customer", "vector"), 137L))

  // shared by y18 (scan form) and y49 (store-served form): the oracle
  // is the EXACT hybrid answer, so both forms must reproduce it —
  // which is why y49's semantic arm is the exact cell-pruned store,
  // not an approximate ANN shortlist. `where` restricts the CORPUS
  // (deletion semantics — y61 grades against the pipeline over the
  // corpus minus the tombstoned docs, stats included); `lexCand` /
  // `semCand` restrict only the CANDIDATES (filtered-search semantics
  // — y64: stats stay whole, the request just may not see some docs).
  private def hybridBatchOracleWhere(where: String,
                                     lexCand: String = "",
                                     semCand: String = ""): String = s"""
      WITH qt AS (SELECT CAST(q AS BIGINT) AS query_id, t AS term
                  FROM (VALUES ${BatchQueries.flatMap { case (q, ts, _) =>
                    ts.map(t => s"($q,'$t')") }.mkString(",")}) v(q, t)),
      qp AS (SELECT CAST(q AS BIGINT) AS query_id, CAST(p AS BIGINT) AS probe_id
             FROM (VALUES ${BatchQueries.map { case (q, _, p) =>
               s"($q,$p)" }.mkString(",")}) v(q, p)),
      w AS (SELECT doc_id, string_split($normSql, ' ') AS ws
            FROM documents$where),
      p AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS dl FROM w),
      g AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CAST(dl AS DECIMAL(18,0))) AS DOUBLE) / count(*) AS avgdl
            FROM p),
      tf AS (SELECT term, doc_id, dl, CAST(count(*) AS BIGINT) AS tf
             FROM (SELECT doc_id, dl, unnest(ws) AS term FROM p)
             WHERE term IN (SELECT term FROM qt) GROUP BY term, doc_id, dl),
      df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
      sc AS (SELECT t.term, t.doc_id, t.tf,
               ROUND(ROUND(ln((g.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0), 6)
                 * (t.tf * ${K1 + 1.0})
                 / (t.tf + $K1 * (${1.0 - B} + $B * t.dl / g.avgdl)), 6) AS score
             FROM tf t JOIN df f USING (term) CROSS JOIN g),
      lexdoc AS (SELECT qt.query_id, sc.doc_id,
                   CAST(SUM(CAST(floor(score * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
                     AS lex_int
                 FROM sc JOIN qt USING (term)$lexCand
                 GROUP BY qt.query_id, sc.doc_id),
      lexr AS (SELECT query_id, doc_id,
                 CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY lex_int DESC, doc_id) AS INT) AS lex_rk
               FROM lexdoc QUALIFY lex_rk <= 50),
      fe AS (SELECT doc_id, list_concat(ws,
               list_transform(range(1, len(ws)),
                 j -> array_to_string(ws[j:j+1], ' '))) AS fs
             FROM w),
      sx AS (SELECT doc_id, unnest(fs) AS t FROM fe),
      sg AS (SELECT doc_id,
               ${graft.functions.TextFunctions.md5BucketSql("t")} % 64 AS b,
               CASE WHEN (instr('0123456789abcdef', substr(md5(t), 4, 1)) - 1)
                      >= 8 THEN 1 ELSE -1 END AS s
             FROM sx),
      cells AS (SELECT doc_id, b, CAST(SUM(s) AS BIGINT) AS v
                FROM sg GROUP BY doc_id, b),
      dv AS (SELECT d.doc_id, r.j, CAST(COALESCE(c.v, 0) AS BIGINT) AS v
             FROM (SELECT doc_id FROM w) d
             CROSS JOIN (SELECT unnest(range(0, 64)) AS j) r
             LEFT JOIN cells c ON c.doc_id = d.doc_id AND c.b = r.j),
      vecs AS (SELECT doc_id, list(v ORDER BY j) AS vec FROM dv GROUP BY doc_id),
      q AS (SELECT qp.query_id, qp.probe_id, v.vec AS qvec
            FROM vecs v JOIN qp ON v.doc_id = qp.probe_id),
      dots AS (SELECT q.query_id, v.doc_id,
                 CAST(list_aggregate(list_transform(range(1, 65),
                   j -> v.vec[j] * q.qvec[j]), 'sum') AS BIGINT) AS dot
               FROM vecs v CROSS JOIN q
               WHERE v.doc_id <> q.probe_id$semCand),
      semr AS (SELECT query_id, doc_id,
                 CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY dot DESC, doc_id) AS INT) AS sem_rk
               FROM dots QUALIFY sem_rk <= 50),
      fuse AS (SELECT COALESCE(l.query_id, s.query_id) AS query_id,
                 COALESCE(l.doc_id, s.doc_id) AS doc_id,
                 l.lex_rk, s.sem_rk,
                 ROUND(COALESCE(CAST(1 AS DOUBLE) / (60 + l.lex_rk), 0)
                   + COALESCE(CAST(1 AS DOUBLE) / (60 + s.sem_rk), 0), 6) AS rrf
               FROM lexr l FULL OUTER JOIN semr s
                 ON l.query_id = s.query_id AND l.doc_id = s.doc_id)
      SELECT query_id, doc_id, lex_rk, sem_rk, rrf,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY rrf DESC, doc_id) AS INT) AS rk
      FROM fuse QUALIFY rk <= 20 ORDER BY query_id, rk"""

  private val hybridBatchOracle = hybridBatchOracleWhere("")

  val y18 = Query(
    "y18_hybrid_rrf_batch",
    Some(hybridBatchOracle)
  ) { (s, d) =>
    Retrieval.hybridRrfBatch(documents(s, d), BatchQueries,
        kList = 50, kOut = 20, k1 = K1, b = B)
      .orderBy("query_id", "rk")
  }

  // --- Y49: y18 served ENTIRELY from persisted stores — the VERDICT-r9
  // fix for the repo's last corpus-scan-per-batch plan: the lexical arm
  // reads the y19 inverted index (term-pruned postings, compact doclen),
  // the semantic arm reads an ExactIvf vector store (hashed embeddings
  // persisted PARTITIONED BY coarse cell; Cauchy–Schwarz cell bounds
  // prune the scan while PROVABLY returning the exact top-50 — the
  // recall guarantee an ADC shortlist can't give), and the fusion tail
  // is y18's. Same oracle as y18: byte-identical hybrid answers through
  // a plan with NO document-text or embedding computation (plan-pinned)
  // is the store composition's correctness contract.
  private def ensureVecStore(s: org.apache.spark.sql.SparkSession,
                             d: String): String = {
    val path = StoreFixtures.path("graft-vecstore", d, "documents.parquet",
      "vecstore2")
    StoreFixtures.onceBySuccess(path, "vecs") {
      graft.operators.ExactIvf.writeVecStore(
        graft.operators.TextAnalysis.hashedEmbedding(documents(s, d))
          .select("doc_id", "vec"),
        path, nCells = 16, iters = 1)
    }
  }

  val y49 = Query(
    "y49_hybrid_store",
    Some(hybridBatchOracle)
  ) { (s, d) =>
    Retrieval.hybridRrfBatchFromStores(s, ensureIndexStore(s, d),
        ensureVecStore(s, d), BatchQueries,
        kList = 50, kOut = 20, k1 = K1, b = B, nprobe0 = 4)
      .orderBy("query_id", "rk")
  }

  // --- Y52: y49 served from INCREMENTALLY-built stores — both arms'
  // lifecycles under the exact oracle at once: the lexical arm reads
  // the y20 two-generation index (80% base + 20% appended batch, old
  // text never re-tokenized) and the semantic arm an 80/20 vec store
  // grown by `ExactIvf.appendToVecStore` under frozen coarse cells
  // (bound-safe two-phase append). Exactness is clustering- and
  // generation-independent by the Cauchy–Schwarz guarantee, so the
  // incrementally-grown stores must reproduce the full-corpus hybrid
  // answer byte-for-byte — the strongest form of the y20/y25
  // "full-corpus-identical answers from an incrementally grown store"
  // contract, because the graded rows fuse BOTH stores.
  private def ensureIncrVecStore(s: org.apache.spark.sql.SparkSession,
                                 d: String): String = {
    // fingerprint parent for staleness
    val path = ensureVecStore(s, d) + "-incr"
    StoreFixtures.onceByMarker(path, "_graft_appended") {
      val vecs = graft.operators.TextAnalysis
        .hashedEmbedding(documents(s, d)).select("doc_id", "vec")
      graft.operators.ExactIvf.writeVecStore(
        vecs.filter(col("doc_id") % 10 < 8), path, nCells = 16, iters = 1)
      graft.operators.ExactIvf.appendToVecStore(s,
        vecs.filter(col("doc_id") % 10 >= 8), path, batchId = Some(1L))
    }
  }

  val y52 = Query(
    "y52_hybrid_store_incr",
    Some(hybridBatchOracle)
  ) { (s, d) =>
    Retrieval.hybridRrfBatchFromStores(s, ensureIncrIndexStore(s, d),
        ensureIncrVecStore(s, d), BatchQueries,
        kList = 50, kOut = 20, k1 = K1, b = B, nprobe0 = 4)
      .orderBy("query_id", "rk")
  }

  // --- Y55: y49 through the query-TABLE serve API (VERDICT r10 #4) —
  // the same stores, the same oracle, but the queries arrive as a
  // DataFrame (query_id, terms, probe_id) instead of a driver Seq: the
  // shape a real serving user has. The query side enters both arms as a
  // JOIN (probe vectors fetched by join, lexical fan-out joined on
  // term); the only driver-side literals are the distinct term list
  // (postings pushdown) and the surviving cell ids (partition pruning),
  // both bounded by store geometry, not query count. Byte-identical
  // rows to y49 is the overload's correctness contract.
  val y55 = Query(
    "y55_hybrid_store_df",
    Some(hybridBatchOracle)
  ) { (s, d) =>
    import s.implicits._
    val q = BatchQueries.toDF("query_id", "terms", "probe_id")
    Retrieval.hybridRrfBatchFromStores(s, ensureIndexStore(s, d),
        ensureVecStore(s, d), q,
        kList = 50, kOut = 20, k1 = K1, b = B, nprobe0 = 4)
      .orderBy("query_id", "rk")
  }

  // --- Y57: the SQL-NATIVE serving surface (VERDICT r11 #7) — the y55
  // store-served hybrid invoked from PURE SQL through the registered
  // `graft_hybrid_rrf` TABLE FUNCTION, graded under the same exact
  // hybrid oracle. Parity is by SHARED IMPLEMENTATION, not a SQL
  // re-statement: the TVF builder drives the DataFrame serving code and
  // splices its analyzed plan in place of the call, so a spark.sql-only
  // user (BI tool, notebook) gets the identical store-served plan —
  // DPP cell pruning included (pinned in SqlParityStoreSpec). The
  // TVF's 5-arg form defaults (k1=1.2, b=0.75, nprobe0=4) are exactly
  // the y55 constants.
  val y57 = Query(
    "y57_hybrid_sql_tvf",
    Some(hybridBatchOracle)
  ) { (s, d) =>
    import s.implicits._
    BatchQueries.toDF("query_id", "terms", "probe_id")
      .createOrReplaceTempView("y57_queries")
    s.sql(
      s"""SELECT * FROM graft_hybrid_rrf('${ensureIndexStore(s, d)}',
         '${ensureVecStore(s, d)}', 'y57_queries', 50, 20)""")
      .orderBy("query_id", "rk")
  }

  // --- Y59: SNAPSHOT-pinned hybrid serving graded under the exact
  // oracle (VERDICT r12 #4 made adversarial): dedicated index + vec
  // stores are built over the corpus, snapshotted (freeze), and then
  // POISONED — decoy documents stuffed with the batch queries' own
  // terms (tf far above any real doc) enter the live index, and the
  // probes' own vectors scaled 1000× enter the live vec store, so the
  // LIVE hybrid answer is provably different on every query. The
  // graded query serves AT the snapshot and must still hash-match the
  // DuckDB oracle over the ORIGINAL documents table: one leaked decoy
  // row — a torn sub-table pin, a snapshot reading the live
  // generation, a bound computed against post-snapshot cells — flips
  // the hash. Time travel correctness, graded.
  private def ensureSnapshotStores(s: org.apache.spark.sql.SparkSession,
                                   d: String)
      : (String, String, Long, Long) = {
    import s.implicits._
    val root = StoreFixtures.path("graft-snapstores", d,
      "documents.parquet", "snapstores1")
    val idsFile = new java.io.File(root, "_graft_snap_ids")
    StoreFixtures.onceByMarker(root, "_graft_snap_done") {
      val docs = documents(s, d)
      Retrieval.writeIndexStore(docs, s"$root/idx")
      graft.operators.ExactIvf.writeVecStore(
        graft.operators.TextAnalysis.hashedEmbedding(docs)
          .select("doc_id", "vec"),
        s"$root/vec", nCells = 16, iters = 1)
      val idxSnap = Retrieval.snapshotIndexStore(s, s"$root/idx")
      val vecSnap = graft.operators.ExactIvf.snapshotVecStore(s, s"$root/vec")
      // poison the LIVE stores: per-query term-stuffed decoy docs...
      val decoyDocs = BatchQueries.zipWithIndex.map { case ((_, ts, _), i) =>
        (9000000L + i, Seq.fill(12)(ts).flatten.mkString(" "))
      }.toDF("doc_id", "text")
      Retrieval.appendIndexStore(decoyDocs, s"$root/idx")
      // ...and the probes' own vectors scaled 1000× (dot(q, 1000q) =
      // 1000·‖q‖² provably tops every live ranking)
      val probeIds = BatchQueries.map(_._3)
      val decoyVecs = graft.operators.TextAnalysis.hashedEmbedding(docs)
        .filter(col("doc_id").isInCollection(probeIds))
        .select((col("doc_id") + 9100000L).as("doc_id"),
          transform(col("vec"), x => x * 1000L).as("vec"))
      graft.operators.ExactIvf.appendToVecStore(s, decoyVecs,
        s"$root/vec", batchId = Some(1L))
      java.nio.file.Files.writeString(idsFile.toPath, s"$idxSnap,$vecSnap")
      ()
    }
    val Array(i, v) = java.nio.file.Files.readString(idsFile.toPath)
      .trim.split(",")
    (s"$root/idx", s"$root/vec", i.toLong, v.toLong)
  }

  val y59 = Query(
    "y59_hybrid_snapshot_serve",
    Some(hybridBatchOracle)
  ) { (s, d) =>
    val (idx, vec, idxSnap, vecSnap) = ensureSnapshotStores(s, d)
    Retrieval.hybridRrfBatchFromStoresSnapshot(s, idx, idxSnap, vec,
        vecSnap, BatchQueries, kList = 50, kOut = 20, k1 = K1, b = B,
        nprobe0 = 4)
      .orderBy("query_id", "rk")
  }

  // --- Y58: the query-TABLE BM25 surface (VERDICT r12 #3) graded under
  // the exact x66/y19 oracle: the terms enter as a RELATION (a temp
  // view with duplicates — the dedup is part of the contract) through
  // the graft_bm25_topk_table TVF, which analyzes to the DeferredServe
  // leaf and resolves the SAME store-served scoring code at execution.
  // Identical rows to y19 through a pure-SQL, relation-terms entry
  // point is the surface's correctness contract.
  // the oracle shared by the two query-table BM25 regimes (y58 literal
  // pushdown, y60 broadcast): the regime is a pruning decision, never a
  // semantics one, so both must hash-match the same SQL
  // `candWhere` (round 15) restricts the RANKED CANDIDATES only — the
  // g/df corpus statistics stay whole and ranks are dense within the
  // allowed set, the filtered-search (not deletion) semantics
  private def bm25TableOracle: String = bm25TableOracleWhere("")

  private def bm25TableOracleWhere(candWhere: String): String = s"""
      WITH w AS (SELECT doc_id, string_split($normSql, ' ') AS ws FROM documents),
      p AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS dl FROM w),
      g AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CAST(dl AS DECIMAL(18,0))) AS DOUBLE) / count(*) AS avgdl
            FROM p),
      tf AS (SELECT term, doc_id, dl, CAST(count(*) AS BIGINT) AS tf
             FROM (SELECT doc_id, dl, unnest(ws) AS term FROM p)
             WHERE term IN $termsSql GROUP BY term, doc_id, dl),
      df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
      sc AS (SELECT t.term, t.doc_id, t.tf,
               ROUND(ROUND(ln((g.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0), 6)
                 * (t.tf * ${K1 + 1.0})
                 / (t.tf + $K1 * (${1.0 - B} + $B * t.dl / g.avgdl)), 6) AS score
             FROM tf t JOIN df f USING (term) CROSS JOIN g),
      r AS (SELECT term, doc_id, tf, score,
              CAST(row_number() OVER (PARTITION BY term
                ORDER BY score DESC, doc_id) AS INT) AS rk
            FROM sc$candWhere)
      SELECT term, doc_id, tf, score, rk FROM r WHERE rk <= 10
      ORDER BY term, rk"""

  val y58 = Query(
    "y58_bm25_table_tvf",
    Some(bm25TableOracle)
  ) { (s, d) =>
    import s.implicits._
    // duplicates collapse on the serve side; the oracle's IN-set is the
    // same distinct vocabulary
    (Terms ++ Terms.take(2)).toDF("term")
      .createOrReplaceTempView("y58_terms")
    s.sql(s"""SELECT * FROM graft_bm25_topk_table(
         '${ensureIndexStore(s, d)}', 'y58_terms', 10, $K1, $B)""")
      .orderBy("term", "rk")
  }

  // --- Y60: the OVER-CEILING regime of the query-table BM25 serve
  // (VERDICT r13 #6 — the last ungraded serve regime): above
  // MaxTermPushdown the distinct terms stay a broadcast JOIN against
  // the postings scan — no literal in the plan, one unpruned postings
  // pass (at that vocabulary the request reads a corpus-scale slice
  // regardless). Graded by forcing the ceiling to 0 so the SAME
  // request y58 serves through the literal arm goes through the
  // broadcast arm — identical rows to the identical oracle is the
  // two-regime contract. The no-literal plan shape is spec-pinned
  // (SqlParityStoreSpec regime-2 row).
  val y60 = Query(
    "y60_bm25_broadcast_regime",
    Some(bm25TableOracle)
  ) { (s, d) =>
    import s.implicits._
    Retrieval.bm25TopKFromStore(s, ensureIndexStore(s, d),
        (Terms ++ Terms.take(2)).toDF("term"), 10, K1, B,
        maxTermPushdown = 0)
      .orderBy("term", "rk")
  }

  // --- Y68: PREDICATE-FILTERED BM25 serving graded (round 15 — the
  // lexical arm of the filtered-search surface, through the pure-SQL
  // graft_bm25_topk_filtered TVF): the allowed set (doc_id % 3 == 1)
  // restricts the RANKED CANDIDATES while the corpus statistics stay
  // whole — df, N and avgdl keep their full-corpus values (filtering
  // who may be RETURNED is not deleting who was INDEXED — the y64/y61
  // distinction) and ranks are dense within the allowed set. A serve
  // that shifted stats, or post-filtered an unfiltered top-10 (rank
  // holes + lost in-filter docs past rank 10), hash-mismatches.
  val y68 = Query(
    "y68_bm25_filtered_serve",
    Some(bm25TableOracleWhere(" WHERE doc_id % 3 = 1"))
  ) { (s, d) =>
    import s.implicits._
    (Terms ++ Terms.take(2)).toDF("term")
      .createOrReplaceTempView("y68_terms")
    documents(s, d).select("doc_id").filter(col("doc_id") % 3 === 1)
      .createOrReplaceTempView("y68_allowed")
    s.sql(s"""SELECT * FROM graft_bm25_topk_filtered(
         '${ensureIndexStore(s, d)}', 'y68_terms', 'y68_allowed', 10,
         $K1, $B)""")
      .orderBy("term", "rk")
  }

  // --- Y61: DELETION PROPAGATION graded (round 14): dedicated index +
  // vec stores are built over the FULL corpus, then every doc with
  // doc_id % 7 == 3 (~14% — including docs that sat inside the live
  // top-k lists) is deleted from BOTH store families through the
  // tombstone APIs, with the rows still physically present (no purge).
  // The graded serve must hash-match the DuckDB replay of the hybrid
  // pipeline over `documents WHERE doc_id % 7 <> 3` — which means the
  // lexical arm's df, N and avgdl must all shift exactly as if the
  // docs were never indexed (a post-filtered ranking would keep the
  // undeleted corpus's scores and mismatch), and the semantic arm's
  // phase-1 d_k must be computed over visible rows only (a d_k seeded
  // from a deleted row would over-prune and drop true top-k rows).
  private def ensureDeletedStores(s: org.apache.spark.sql.SparkSession,
                                  d: String): (String, String) = {
    val root = StoreFixtures.path("graft-delstores", d,
      "documents.parquet", "delstores1")
    StoreFixtures.onceByMarker(root, "_graft_del_done") {
      val docs = documents(s, d)
      Retrieval.writeIndexStore(docs, s"$root/idx")
      graft.operators.ExactIvf.writeVecStore(
        graft.operators.TextAnalysis.hashedEmbedding(docs)
          .select("doc_id", "vec"),
        s"$root/vec", nCells = 16, iters = 1)
      val del = docs.select("doc_id").filter(col("doc_id") % 7 === 3)
      Retrieval.deleteFromIndexStore(s, del, s"$root/idx")
      graft.operators.ExactIvf.deleteFromVecStore(s, del, s"$root/vec",
        idCol = "doc_id")
    }
    (s"$root/idx", s"$root/vec")
  }

  val y61 = Query(
    "y61_hybrid_deleted_serve",
    Some(hybridBatchOracleWhere(" WHERE doc_id % 7 <> 3"))
  ) { (s, d) =>
    val (idx, vec) = ensureDeletedStores(s, d)
    Retrieval.hybridRrfBatchFromStores(s, idx, vec, BatchQueries,
        kList = 50, kOut = 20, k1 = K1, b = B, nprobe0 = 4)
      .orderBy("query_id", "rk")
  }

  // --- Y63: the hybrid batch served from a RECLUSTERED vec store
  // (round 14): the store is built over 80% of the corpus at nCells=8,
  // grown by an appendToVecStore batch (r2max inflation — the bound
  // decay recluster exists for), then RECLUSTERED online to nCells=24
  // through the atomic epoch cutover. The graded serve runs entirely in
  // the new epoch (new geometry, new assignments, new groups) and must
  // still hash-match the SAME exact hybrid oracle as y49 — the epoch
  // redirect under the DuckDB contract: one row from a torn
  // cells/vecs pair, a stale-geometry read, or a lost append would
  // flip the hash.
  private def ensureReclusteredStores(s: org.apache.spark.sql.SparkSession,
                                      d: String): (String, String) = {
    val root = StoreFixtures.path("graft-reclstores", d,
      "documents.parquet", "reclstores1")
    StoreFixtures.onceByMarker(root, "_graft_recl_done") {
      val docs = documents(s, d)
      Retrieval.writeIndexStore(docs, s"$root/idx")
      val vecs = graft.operators.TextAnalysis.hashedEmbedding(docs)
        .select("doc_id", "vec")
      graft.operators.ExactIvf.writeVecStore(
        vecs.filter(col("doc_id") % 10 < 8), s"$root/vec",
        nCells = 8, iters = 1)
      graft.operators.ExactIvf.appendToVecStore(s,
        vecs.filter(col("doc_id") % 10 >= 8), s"$root/vec",
        batchId = Some(1L))
      graft.operators.ExactIvf.reclusterVecStore(s, s"$root/vec",
        nCells = 24, iters = 1)
    }
    (s"$root/idx", s"$root/vec")
  }

  val y63 = Query(
    "y63_hybrid_recluster_serve",
    Some(hybridBatchOracle)
  ) { (s, d) =>
    val (idx, vec) = ensureReclusteredStores(s, d)
    Retrieval.hybridRrfBatchFromStores(s, idx, vec, BatchQueries,
        kList = 50, kOut = 20, k1 = K1, b = B, nprobe0 = 4)
      .orderBy("query_id", "rk")
  }

  // --- Y64: PREDICATE-FILTERED hybrid retrieval graded (round 14) —
  // the metadata-filtered RAG serving pattern, through the pure-SQL
  // graft_hybrid_rrf_filtered TVF: the allowed set (doc_id % 3 == 0)
  // restricts BOTH arms' CANDIDATES while the corpus statistics stay
  // whole — the oracle keeps the full-corpus N/avgdl/df and applies
  // the predicate only to the lexdoc and dots candidate sets, so a
  // serve that wrongly shifted stats (deletion semantics) or wrongly
  // post-filtered an unfiltered top-kList (rank gaps) hash-mismatches.
  // Probe 137 is OUTSIDE the allowed set: it may still ask (the y62
  // contract) but must never appear in any result list.
  val y64 = Query(
    "y64_hybrid_filtered_serve",
    Some(hybridBatchOracleWhere("",
      lexCand = " WHERE sc.doc_id % 3 = 0",
      semCand = " AND v.doc_id % 3 = 0"))
  ) { (s, d) =>
    import s.implicits._
    BatchQueries.toDF("query_id", "terms", "probe_id")
      .createOrReplaceTempView("y64_queries")
    documents(s, d).select("doc_id").filter(col("doc_id") % 3 === 0)
      .createOrReplaceTempView("y64_allowed")
    s.sql(
      s"""SELECT * FROM graft_hybrid_rrf_filtered(
         '${ensureIndexStore(s, d)}', '${ensureVecStore(s, d)}',
         'y64_queries', 'y64_allowed', 50, 20)""")
      .orderBy("query_id", "rk")
  }

  // --- Y69: the DELETION ⊕ FILTER composition graded end-to-end
  // (round 15): the hybrid batch served from the y61 TOMBSTONED stores
  // (~14% deleted, rows physically present) under a y64-style allowed
  // predicate (doc_id % 3 == 0) whose set deliberately OVERLAPS the
  // deleted one — the two visibility mechanisms carry different
  // semantics and must compose: deletion shifts the corpus statistics
  // (df/N/avgdl over survivors, the semantic arm's d_k over visible
  // rows), while the filter restricts CANDIDATES only against those
  // survivor statistics. The oracle is the replay over
  // `documents WHERE doc_id % 7 <> 3` with candidate-only predicates
  // on both arms; an allowed-but-deleted doc surfacing, or stats
  // computed over the unfiltered/undeleted corpus, flips the hash.
  // Probe 137 (137 % 3 = 2) is again outside the allowed set.
  val y69 = Query(
    "y69_hybrid_deleted_filtered",
    Some(hybridBatchOracleWhere(" WHERE doc_id % 7 <> 3",
      lexCand = " WHERE sc.doc_id % 3 = 0",
      semCand = " AND v.doc_id % 3 = 0"))
  ) { (s, d) =>
    import s.implicits._
    val (idx, vec) = ensureDeletedStores(s, d)
    Retrieval.hybridRrfBatchFromStoresFiltered(s, idx, vec,
        BatchQueries.toDF("query_id", "terms", "probe_id"),
        documents(s, d).select("doc_id").filter(col("doc_id") % 3 === 0),
        kList = 50, kOut = 20, k1 = K1, b = B, nprobe0 = 4)
      .orderBy("query_id", "rk")
  }

  // --- Y62: PREDICATE-FILTERED exact vector serving graded (round 14):
  // the metadata-filtered search shape ("top-k among docs WHERE …") on
  // the exact-IVF store — the classic filtered-ANN recall trap done
  // right: the `allowed` set (docs with doc_id % 3 == 0) applies to
  // every candidate scan INCLUDING phase 1's, so d_k is the kth-best
  // ALLOWED dot and the cell bound keeps every cell that could hold an
  // allowed top-k row — exact top-k over the subset, unconditionally.
  // Probe 137 (137 % 3 = 2) is deliberately OUTSIDE the allowed set:
  // restricting the candidate corpus and restricting who may ask are
  // different contracts, and the oracle proves the serve honors that.
  val y62 = Query(
    "y62_exact_topk_filtered",
    Some(s"""
      WITH qp AS (SELECT CAST(q AS BIGINT) AS query_id,
                    CAST(p AS BIGINT) AS probe_id
                  FROM (VALUES ${BatchQueries.map { case (q, _, p) =>
                    s"($q,$p)" }.mkString(",")}) v(q, p)),
      w AS (SELECT doc_id, string_split($normSql, ' ') AS ws FROM documents),
      fe AS (SELECT doc_id, list_concat(ws,
               list_transform(range(1, len(ws)),
                 j -> array_to_string(ws[j:j+1], ' '))) AS fs
             FROM w),
      sx AS (SELECT doc_id, unnest(fs) AS t FROM fe),
      sg AS (SELECT doc_id,
               ${graft.functions.TextFunctions.md5BucketSql("t")} % 64 AS b,
               CASE WHEN (instr('0123456789abcdef', substr(md5(t), 4, 1)) - 1)
                      >= 8 THEN 1 ELSE -1 END AS s
             FROM sx),
      cells AS (SELECT doc_id, b, CAST(SUM(s) AS BIGINT) AS v
                FROM sg GROUP BY doc_id, b),
      dv AS (SELECT d.doc_id, r.j, CAST(COALESCE(c.v, 0) AS BIGINT) AS v
             FROM (SELECT doc_id FROM w) d
             CROSS JOIN (SELECT unnest(range(0, 64)) AS j) r
             LEFT JOIN cells c ON c.doc_id = d.doc_id AND c.b = r.j),
      vecs AS (SELECT doc_id, list(v ORDER BY j) AS vec FROM dv GROUP BY doc_id),
      q AS (SELECT qp.query_id, qp.probe_id, v.vec AS qvec
            FROM vecs v JOIN qp ON v.doc_id = qp.probe_id),
      dots AS (SELECT q.query_id, v.doc_id,
                 CAST(list_aggregate(list_transform(range(1, 65),
                   j -> v.vec[j] * q.qvec[j]), 'sum') AS BIGINT) AS dot
               FROM vecs v CROSS JOIN q
               WHERE v.doc_id <> q.probe_id AND v.doc_id % 3 = 0),
      r AS (SELECT query_id, doc_id AS vec_id, dot,
              CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY dot DESC, doc_id) AS INT) AS rk
            FROM dots)
      SELECT query_id, vec_id, dot, rk FROM r WHERE rk <= 20
      ORDER BY query_id, rk""")
  ) { (s, d) =>
    import s.implicits._
    val q = BatchQueries.map { case (qid, _, p) => (qid, p) }
      .toDF("query_id", "probe_id")
    val allowed = documents(s, d).select(col("doc_id").as("vec_id"))
      .filter(col("vec_id") % 3 === 0)
    graft.operators.ExactIvf.topDotBatchFromStoreFiltered(s,
        ensureVecStore(s, d), q, allowed, k = 20, nprobe0 = 4)
      .orderBy("query_id", "rk")
  }

  // --- X67/X68: int8 quantization. Shared oracle CTEs lift vectors to
  // integer micro-units, derive the per-vector integer scale, and code
  // via one IEEE-deterministic double division.
  private[queries] val codesCtes = """
      e AS (SELECT vec_id,
              list_transform(CAST(embedding AS DOUBLE[]),
                x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS xs
            FROM embeddings),
      s AS (SELECT vec_id, xs,
              list_aggregate(list_transform(xs, x -> abs(x)), 'max') AS scale_int
            FROM e),
      qq AS (SELECT vec_id, xs, scale_int,
               list_transform(xs, x -> greatest(-127, least(127,
                 CAST(floor(x * 127.0 / scale_int + 0.5) AS BIGINT)))) AS q
             FROM s)"""

  val x67 = Query(
    "x67_embed_quantize",
    Some(s"""
      WITH $codesCtes,
      h AS (SELECT vec_id, xs, scale_int, q,
              list_transform(q, v -> CAST(floor(v * scale_int / 127.0 + 0.5) AS BIGINT))
                AS xhat
            FROM qq)
      SELECT vec_id, scale_int,
             CAST(list_aggregate(q, 'sum') AS BIGINT) AS q_sum,
             CAST(len(list_filter(q, v -> abs(v) = 127)) AS INT) AS n_sat,
             CAST(list_aggregate(list_transform(range(1, len(xs) + 1),
               j -> (xs[j] - xhat[j]) * (xs[j] - xhat[j])), 'sum') AS BIGINT) AS sse
      FROM h ORDER BY vec_id""")
  ) { (s, d) =>
    Quantization.int8Stats(embeddings(s, d)).orderBy("vec_id")
  }

  val x68 = Query(
    "x68_quantized_search",
    Some(s"""
      WITH $codesCtes,
      pr AS (SELECT vec_id AS probe_id, q AS qp FROM qq WHERE vec_id % 100 = 0),
      c AS (SELECT probe_id, vec_id AS neighbor_id,
              CAST(list_aggregate(list_transform(range(1, len(q) + 1),
                j -> q[j] * qp[j]), 'sum') AS BIGINT) AS dot
            FROM qq CROSS JOIN pr WHERE vec_id <> probe_id),
      r AS (SELECT probe_id, neighbor_id, dot,
              CAST(row_number() OVER (PARTITION BY probe_id
                ORDER BY dot DESC, neighbor_id) AS INT) AS rk
            FROM c)
      SELECT probe_id, neighbor_id, dot, rk FROM r WHERE rk <= 5
      ORDER BY probe_id, rk""")
  ) { (s, d) =>
    Quantization.quantizedTopK(embeddings(s, d), col("vec_id") % 100 === 0, k = 5)
      .orderBy("probe_id", "rk")
  }

  // --- X75: quantized IVF — int8 codes (x67) composed with a bounded
  // centroid set and integer-dot assignment + cell search. The whole
  // flow is integer arithmetic (the x68 guarantee extended to the
  // scale-path ANN): no float exists between the µ-unit lift and the
  // graded output, so the oracle needs no rounding contract at all.
  val x75 = Query(
    "x75_quantized_ivf",
    Some(s"""
      WITH $codesCtes,
      cents AS (SELECT vec_id AS cent_id, q AS qc FROM qq
                WHERE vec_id % 64 = 0 ORDER BY vec_id LIMIT 16),
      asg AS (SELECT vec_id, q, cent_id,
                CAST(list_aggregate(list_transform(range(1, len(q) + 1),
                  j -> q[j] * qc[j]), 'sum') AS BIGINT) AS adot
              FROM qq CROSS JOIN cents),
      cells AS (SELECT vec_id, q, cell FROM (
                  SELECT vec_id, q, cent_id AS cell,
                         row_number() OVER (PARTITION BY vec_id
                           ORDER BY adot DESC, cent_id) AS rn
                  FROM asg) WHERE rn = 1),
      pr AS (SELECT vec_id AS probe_id, q AS qp, cell FROM cells
             WHERE vec_id % 100 = 0),
      c AS (SELECT probe_id, v.vec_id AS neighbor_id, v.cell,
              CAST(list_aggregate(list_transform(range(1, len(v.q) + 1),
                j -> v.q[j] * qp[j]), 'sum') AS BIGINT) AS dot
            FROM cells v JOIN pr USING (cell) WHERE v.vec_id <> probe_id),
      r AS (SELECT probe_id, neighbor_id, cell, dot,
              CAST(row_number() OVER (PARTITION BY probe_id
                ORDER BY dot DESC, neighbor_id) AS INT) AS rk
            FROM c)
      SELECT probe_id, neighbor_id, cell, dot, rk FROM r WHERE rk <= 5
      ORDER BY probe_id, rk""")
  ) { (s, d) =>
    Quantization.quantizedIvfTopK(embeddings(s, d),
        centPred = col("vec_id") % 64 === 0, maxCents = 16,
        probePred = col("vec_id") % 100 === 0, k = 5)
      .orderBy("probe_id", "rk")
  }

  // --- X88: recall grading of the QUANTIZED search paths — x55 grades
  // the float ANN paths; this panel grades what the 100 TB story
  // actually ships, DECOMPOSED by loss source:
  //   quant_brute      vs FLOAT truth   ≥ 0.6  (pure int8 quantization loss)
  //   quant_ivf        vs INTEGER truth ≥ 0.3  (untrained 16-cell baseline)
  //   quant_ivf_trained vs INTEGER truth ≥ 0.6 (Lloyd codebook, int8-encoded
  //                                             — the production index shape)
  // Grading IVF against the integer-exact ranking isolates BUCKETING loss
  // from quantization loss (the quant_brute row already carries that);
  // one shared reference could not tell the two apart.
  private val QuantBound = 0.6
  private val WeakQuantBound = 0.3
  /** int8 brute force vs FLOAT truth re-benchmarked on the unbiased
    * hash-ordered probe set: top-5 boundary near-ties flip under int8
    * rounding, reading 0.59-0.71 across the graded SFs (the old 0.92 was
    * the correlated %100 probe set) — 0.5 is the honest regression
    * floor for pure quantization loss; the trained-IVF row keeps the
    * 0.6 production bound with the 6-cell nprobe dial. */
  private val QuantBruteFloor = 0.5
  private val QuantNProbe = 6
  private val recallCosSql =
    """CASE WHEN list_dot_product(av, av) = 0 OR list_dot_product(pv, pv) = 0 THEN 0.0
      |     ELSE list_dot_product(pv, av)
      |          / (sqrt(list_dot_product(pv, pv)) * sqrt(list_dot_product(av, av))) END"""
      .stripMargin
  val x88 = Query(
    "x88_ann_recall_quantized",
    Some(s"""
      WITH $codesCtes,
      ${SimilarityQueries.kmeansCtes},
      ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      ${SimilarityQueries.pidsCteSql("ev")},
      probes AS (SELECT vec_id AS probe_id, v AS pv FROM ev
                 JOIN pids USING (vec_id)),
      np AS (SELECT CAST(count(*) AS BIGINT) AS n_probes FROM probes),
      xsc AS (SELECT probe_id, a.vec_id AS neighbor_id, a.v AS av, pv
              FROM ev a CROSS JOIN probes WHERE a.vec_id <> probe_id),
      xr AS (SELECT probe_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY probe_id
                 ORDER BY $recallCosSql DESC, neighbor_id) AS rk
             FROM xsc),
      exact AS (SELECT probe_id, neighbor_id FROM xr WHERE rk <= 5),
      qpr AS (SELECT vec_id AS probe_id, q AS qp FROM qq JOIN pids USING (vec_id)),
      qc AS (SELECT probe_id, vec_id AS neighbor_id,
               CAST(list_aggregate(list_transform(range(1, len(q) + 1),
                 j -> q[j] * qp[j]), 'sum') AS BIGINT) AS dot
             FROM qq CROSS JOIN qpr WHERE vec_id <> probe_id),
      qr AS (SELECT probe_id, neighbor_id, row_number() OVER (PARTITION BY
               probe_id ORDER BY dot DESC, neighbor_id) AS rk FROM qc),
      qb AS (SELECT probe_id, neighbor_id FROM qr WHERE rk <= 5),
      cents AS (SELECT vec_id AS cent_id, q AS qcode FROM qq
                WHERE vec_id % 64 = 0 ORDER BY vec_id LIMIT 16),
      asg AS (SELECT vec_id, q, cent_id,
                CAST(list_aggregate(list_transform(range(1, len(q) + 1),
                  j -> q[j] * qcode[j]), 'sum') AS BIGINT) AS adot
              FROM qq CROSS JOIN cents),
      cells AS (SELECT vec_id, q, cell FROM (
                  SELECT vec_id, q, cent_id AS cell,
                         row_number() OVER (PARTITION BY vec_id
                           ORDER BY adot DESC, cent_id) AS rn
                  FROM asg) WHERE rn = 1),
      ipr AS (SELECT probe_id, qp, cell FROM (
                SELECT vec_id AS probe_id, q AS qp, cent_id AS cell,
                       row_number() OVER (PARTITION BY vec_id
                         ORDER BY adot DESC, cent_id) AS rn
                FROM asg WHERE vec_id IN (SELECT vec_id FROM pids))
              WHERE rn <= $QuantNProbe),
      ic AS (SELECT probe_id, v.vec_id AS neighbor_id,
               CAST(list_aggregate(list_transform(range(1, len(v.q) + 1),
                 j -> v.q[j] * qp[j]), 'sum') AS BIGINT) AS dot
             FROM cells v JOIN ipr USING (cell) WHERE v.vec_id <> probe_id),
      ir AS (SELECT probe_id, neighbor_id, row_number() OVER (PARTITION BY
               probe_id ORDER BY dot DESC, neighbor_id) AS rk FROM ic),
      qi AS (SELECT probe_id, neighbor_id FROM ir WHERE rk <= 5),
      qce AS (SELECT cent_id,
                list_transform(cv, x -> CAST(floor(x * 1000000 + 0.5)
                  AS BIGINT)) AS cxs
              FROM c2),
      qcs AS (SELECT cent_id, cxs,
                list_aggregate(list_transform(cxs, x -> abs(x)), 'max')
                  AS cscale
              FROM qce),
      qcent AS (SELECT cent_id,
                  list_transform(cxs, x -> greatest(-127, least(127,
                    CAST(floor(x * 127.0 / cscale + 0.5) AS BIGINT)))) AS qc2
                FROM qcs),
      tasg AS (SELECT vec_id, q, cent_id,
                 CAST(list_aggregate(list_transform(range(1, len(q) + 1),
                   j -> q[j] * qc2[j]), 'sum') AS BIGINT) AS adot
               FROM qq CROSS JOIN qcent),
      tcl AS (SELECT vec_id, q, cell FROM (
                SELECT vec_id, q, cent_id AS cell,
                       row_number() OVER (PARTITION BY vec_id
                         ORDER BY adot DESC, cent_id) AS rn
                FROM tasg) WHERE rn = 1),
      tpr AS (SELECT probe_id, qp, cell FROM (
                SELECT vec_id AS probe_id, q AS qp, cent_id AS cell,
                       row_number() OVER (PARTITION BY vec_id
                         ORDER BY adot DESC, cent_id) AS rn
                FROM tasg WHERE vec_id IN (SELECT vec_id FROM pids))
              WHERE rn <= $QuantNProbe),
      tc AS (SELECT probe_id, v.vec_id AS neighbor_id,
               CAST(list_aggregate(list_transform(range(1, len(v.q) + 1),
                 j -> v.q[j] * qp[j]), 'sum') AS BIGINT) AS dot
             FROM tcl v JOIN tpr USING (cell) WHERE v.vec_id <> probe_id),
      tr2 AS (SELECT probe_id, neighbor_id, row_number() OVER (PARTITION BY
                probe_id ORDER BY dot DESC, neighbor_id) AS rk FROM tc),
      qt AS (SELECT probe_id, neighbor_id FROM tr2 WHERE rk <= 5),
      hits AS (
        SELECT 'quant_brute' AS method, CAST(count(*) AS BIGINT) AS total_hits,
               $QuantBruteFloor AS bound
        FROM qb SEMI JOIN exact USING (probe_id, neighbor_id)
        UNION ALL
        SELECT 'quant_ivf', CAST(count(*) AS BIGINT), $WeakQuantBound
        FROM qi SEMI JOIN qb USING (probe_id, neighbor_id)
        UNION ALL
        SELECT 'quant_ivf_trained', CAST(count(*) AS BIGINT), $QuantBound
        FROM qt SEMI JOIN qb USING (probe_id, neighbor_id))
      SELECT method, n_probes, total_hits,
             CAST(total_hits AS DOUBLE) / (n_probes * 5) AS recall,
             CASE WHEN CAST(total_hits AS DOUBLE) / (n_probes * 5)
                    >= bound THEN 1 ELSE 0 END AS recall_ok
      FROM hits, np
      ORDER BY method""")
  ) { (s, d) =>
    import graft.operators.Similarity
    val emb = embeddings(s, d)
    val probePred = col("vec_id").isInCollection(
      Similarity.boundedProbeIds(emb, SimilarityQueries.NProbesBound))
    val floatExact = graft.core.Caches.scoped(
      Similarity.bruteForceTopK(emb, probePred, k = 5)
        .select("probe_id", "neighbor_id"))
    val intExact = graft.core.Caches.scoped(
      Quantization.quantizedTopK(emb, probePred, k = 5)
        .select("probe_id", "neighbor_id"))
    val nProbes = emb.filter(probePred).select(count(lit(1)).as("n_probes"))
    Similarity.recallPanel(nProbes, k = 5, Seq(
      ("quant_brute", intExact, floatExact, QuantBruteFloor),
      ("quant_ivf", Quantization.quantizedIvfTopKMulti(emb,
        centPred = col("vec_id") % 64 === 0, maxCents = 16,
        probePred, k = 5, nProbeCells = QuantNProbe), intExact, WeakQuantBound),
      ("quant_ivf_trained", Quantization.quantizedIvfTrainedTopK(emb,
        initPred = col("vec_id") % 125 === 0, iters = 2, probePred, k = 5,
        maxCents = 32, nProbeCells = QuantNProbe), intExact, QuantBound)))
      .orderBy("method")
  }

  // --- X76: SemDeDup — semantic dedup inside quantized IVF cells. The
  // cosine-≥-τ test is cross-multiplied into pure BIGINT arithmetic
  // (τ = 0.45, τ² = 2025/10⁴ exactly), so like x67/x68/x75 the oracle
  // needs no rounding contract anywhere. Keep-one-per-ε-ball decided
  // by lowest vec_id.
  val x76 = Query(
    "x76_semantic_dedup",
    Some(s"""
      WITH $codesCtes,
      cents AS (SELECT vec_id AS cent_id, q AS qc FROM qq
                WHERE vec_id % 32 = 0 ORDER BY vec_id LIMIT 16),
      asg AS (SELECT vec_id, q, cent_id,
                CAST(list_aggregate(list_transform(range(1, len(q) + 1),
                  j -> q[j] * qc[j]), 'sum') AS BIGINT) AS adot
              FROM qq CROSS JOIN cents),
      cells AS (SELECT vec_id, q, cell FROM (
                  SELECT vec_id, q, cent_id AS cell,
                         row_number() OVER (PARTITION BY vec_id
                           ORDER BY adot DESC, cent_id) AS rn
                  FROM asg) WHERE rn = 1),
      nn AS (SELECT vec_id, cell, q,
               CAST(list_aggregate(list_transform(range(1, len(q) + 1),
                 j -> q[j] * q[j]), 'sum') AS BIGINT) AS nrm
             FROM cells),
      pairs AS (SELECT b.vec_id,
                  CAST(list_aggregate(list_transform(range(1, len(a.q) + 1),
                    j -> a.q[j] * b.q[j]), 'sum') AS BIGINT) AS dot,
                  a.nrm AS lon, b.nrm AS hin
                FROM nn a JOIN nn b ON a.cell = b.cell AND a.vec_id < b.vec_id),
      cl AS (SELECT vec_id, CAST(count(*) AS BIGINT) AS n_close FROM pairs
             WHERE dot > 0 AND dot * dot * 10000 >= 2025 * lon * hin
             GROUP BY vec_id)
      SELECT n.vec_id, n.cell,
             COALESCE(cl.n_close, CAST(0 AS BIGINT)) AS n_close,
             COALESCE(cl.n_close, CAST(0 AS BIGINT)) = 0 AS kept
      FROM nn n LEFT JOIN cl ON cl.vec_id = n.vec_id
      ORDER BY n.vec_id""")
  ) { (s, d) =>
    Quantization.semanticDedup(embeddings(s, d),
        centPred = col("vec_id") % 32 === 0, maxCents = 16)
      .orderBy("vec_id")
  }

  // --- X79: SemDeDup on CORPUS-ADAPTIVE cells — the scale fix for x76's
  // measured 11.2×-at-10× curve (fixed C ⇒ linear cell growth ⇒ quadratic
  // pair join). Cells are the x46 occupancy-bounded masked-LSH buckets
  // (integer-comparison bit count from the corpus count — the oracle
  // replays mask and bucket bit-for-bit); the verdict is the same
  // cross-multiplied BIGINT cosine as x76.
  val x79 = Query(
    "x79_semantic_dedup_auto",
    Some(s"""
      WITH $codesCtes,
      nc AS (SELECT count(*) AS cnt FROM embeddings),
      nb AS (SELECT CAST(${SimilarityQueries.nbitsSqlFor(SimilarityQueries.TargetOcc, SimilarityQueries.DedupMaxBits)} AS INT) AS nbits FROM nc),
      ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      bk AS (SELECT vec_id, CAST(${SimilarityQueries.maskedBucketSqlFor(SimilarityQueries.DedupMaxBits)} AS INT) AS cell
             FROM ev, nb),
      nn AS (SELECT q.vec_id, bk.cell, q.q,
               CAST(list_aggregate(list_transform(range(1, len(q.q) + 1),
                 j -> q.q[j] * q.q[j]), 'sum') AS BIGINT) AS nrm
             FROM qq q JOIN bk ON bk.vec_id = q.vec_id),
      pairs AS (SELECT b.vec_id,
                  CAST(list_aggregate(list_transform(range(1, len(a.q) + 1),
                    j -> a.q[j] * b.q[j]), 'sum') AS BIGINT) AS dot,
                  a.nrm AS lon, b.nrm AS hin
                FROM nn a JOIN nn b ON a.cell = b.cell AND a.vec_id < b.vec_id),
      cl AS (SELECT vec_id, CAST(count(*) AS BIGINT) AS n_close FROM pairs
             WHERE dot > 0 AND dot * dot * 10000 >= 2025 * lon * hin
             GROUP BY vec_id)
      SELECT n.vec_id, n.cell,
             COALESCE(cl.n_close, CAST(0 AS BIGINT)) AS n_close,
             COALESCE(cl.n_close, CAST(0 AS BIGINT)) = 0 AS kept
      FROM nn n LEFT JOIN cl ON cl.vec_id = n.vec_id
      ORDER BY n.vec_id""")
  ) { (s, d) =>
    Quantization.semanticDedupAuto(embeddings(s, d),
        targetOcc = SimilarityQueries.TargetOcc,
        maxBits = SimilarityQueries.DedupMaxBits, dim = SimilarityQueries.Dim)
      .orderBy("vec_id")
  }

  // --- X81: INCREMENTAL semantic dedup from the persisted code store —
  // the x41 cadence applied to embeddings: the old corpus (vec_id % 10
  // < 8) lives only as its ~70 B/vector code store (int8 codes + frozen
  // auto-bits cell + norm); the new batch (% 10 ≥ 8) is quantized and
  // bucketed with the store's FROZEN mask and dropped iff τ-close to any
  // stored vector (old decisions immutable) or a lower-id batch-mate.
  // The oracle replays the whole flow, including the frozen nbits
  // derived from the OLD corpus count only. PlanShapeSpec pins that
  // every embeddings scan carries the new-batch filter.
  private def codeStorePath(sfDir: String): String = {
    // fingerprint includes the mask params AND the plane family (via the
    // widest plane's actual components): a store built under different
    // bucketing has different frozen cells and must not be silently reused
    val planeTag = graft.functions.VectorFunctions
      .plane(SimilarityQueries.DedupMaxBits - 1, SimilarityQueries.Dim)
      .map(_.toInt).mkString(",")
    StoreFixtures.path("graft-codestore", sfDir, "embeddings.parquet",
      s"${SimilarityQueries.TargetOcc}:${SimilarityQueries.DedupMaxBits}:" +
        planeTag)
  }

  private def ensureCodeStore(s: org.apache.spark.sql.SparkSession, d: String): String = {
    val path = codeStorePath(d)
    StoreFixtures.onceBySuccess(path, "") {
      Quantization.writeCodeStore(
        embeddings(s, d).filter(col("vec_id") % 10 < 8), path,
        targetOcc = SimilarityQueries.TargetOcc,
        maxBits = SimilarityQueries.DedupMaxBits, dim = SimilarityQueries.Dim)
    }
  }

  val x81 = Query(
    "x81_semantic_dedup_incr",
    Some(s"""
      WITH $codesCtes,
      oc AS (SELECT count(*) AS cnt FROM embeddings WHERE vec_id % 10 < 8),
      nb AS (SELECT CAST(${SimilarityQueries.nbitsSqlFor(SimilarityQueries.TargetOcc, SimilarityQueries.DedupMaxBits)} AS INT) AS nbits FROM oc),
      ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      bk AS (SELECT vec_id, CAST(${SimilarityQueries.maskedBucketSqlFor(SimilarityQueries.DedupMaxBits)} AS INT) AS cell
             FROM ev, nb),
      nn AS (SELECT q.vec_id, bk.cell, q.q,
               CAST(list_aggregate(list_transform(range(1, len(q.q) + 1),
                 j -> q.q[j] * q.q[j]), 'sum') AS BIGINT) AS nrm
             FROM qq q JOIN bk ON bk.vec_id = q.vec_id),
      pairs AS (SELECT b.vec_id,
                  CAST(list_aggregate(list_transform(range(1, len(a.q) + 1),
                    j -> a.q[j] * b.q[j]), 'sum') AS BIGINT) AS dot,
                  a.nrm AS lon, b.nrm AS hin
                FROM nn a JOIN nn b ON a.cell = b.cell
                WHERE b.vec_id % 10 >= 8
                  AND (a.vec_id % 10 < 8 OR a.vec_id < b.vec_id)),
      cl AS (SELECT vec_id, CAST(count(*) AS BIGINT) AS n_close FROM pairs
             WHERE dot > 0 AND dot * dot * 10000 >= 2025 * lon * hin
             GROUP BY vec_id)
      SELECT n.vec_id, n.cell,
             COALESCE(cl.n_close, CAST(0 AS BIGINT)) AS n_close,
             COALESCE(cl.n_close, CAST(0 AS BIGINT)) = 0 AS kept
      FROM nn n LEFT JOIN cl ON cl.vec_id = n.vec_id
      WHERE n.vec_id % 10 >= 8
      ORDER BY n.vec_id""")
  ) { (s, d) =>
    val store = s.read.parquet(graft.streaming.StoreFs.dataDir(s, ensureCodeStore(s, d)))
    Quantization.semanticDedupFromStore(
        embeddings(s, d).filter(col("vec_id") % 10 >= 8), store,
        maxBits = SimilarityQueries.DedupMaxBits, dim = SimilarityQueries.Dim)
      .orderBy("vec_id")
  }

  // --- X82: hot-cell-capped semantic dedup — the x58 boilerplate-cluster
  // policy composed into x79: cells over the cap are decided wholesale
  // (keep min vec_id; dropped members report the family size) and never
  // enter the pair join, so candidate volume stays ≤ cap·|cells| no
  // matter how the corpus clusters. Sub-cap cells keep the exact
  // pairwise verdict; the oracle replays both branches.
  private val SemCap = 24
  val x82 = Query(
    "x82_semantic_dedup_capped",
    Some(s"""
      WITH $codesCtes,
      nc AS (SELECT count(*) AS cnt FROM embeddings),
      nb AS (SELECT CAST(${SimilarityQueries.nbitsSqlFor(SimilarityQueries.TargetOcc, SimilarityQueries.DedupMaxBits)} AS INT) AS nbits FROM nc),
      ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      bk AS (SELECT vec_id, CAST(${SimilarityQueries.maskedBucketSqlFor(SimilarityQueries.DedupMaxBits)} AS INT) AS cell
             FROM ev, nb),
      nn AS (SELECT q.vec_id, bk.cell, q.q,
               CAST(list_aggregate(list_transform(range(1, len(q.q) + 1),
                 j -> q.q[j] * q.q[j]), 'sum') AS BIGINT) AS nrm
             FROM qq q JOIN bk ON bk.vec_id = q.vec_id),
      sz AS (SELECT cell, CAST(count(*) AS BIGINT) AS csz,
                    MIN(vec_id) AS cmin
             FROM nn GROUP BY cell),
      sm AS (SELECT n.* FROM nn n JOIN sz ON sz.cell = n.cell
             WHERE sz.csz <= $SemCap),
      pairs AS (SELECT b.vec_id,
                  CAST(list_aggregate(list_transform(range(1, len(a.q) + 1),
                    j -> a.q[j] * b.q[j]), 'sum') AS BIGINT) AS dot,
                  a.nrm AS lon, b.nrm AS hin
                FROM sm a JOIN sm b ON a.cell = b.cell AND a.vec_id < b.vec_id),
      cl AS (SELECT vec_id, CAST(count(*) AS BIGINT) AS n_close FROM pairs
             WHERE dot > 0 AND dot * dot * 10000 >= 2025 * lon * hin
             GROUP BY vec_id),
      smallout AS (SELECT n.vec_id, n.cell,
                     COALESCE(cl.n_close, CAST(0 AS BIGINT)) AS n_close,
                     COALESCE(cl.n_close, CAST(0 AS BIGINT)) = 0 AS kept
                   FROM sm n LEFT JOIN cl ON cl.vec_id = n.vec_id),
      hotout AS (SELECT n.vec_id, n.cell,
                   CASE WHEN n.vec_id = sz.cmin THEN CAST(0 AS BIGINT)
                        ELSE sz.csz - 1 END AS n_close,
                   n.vec_id = sz.cmin AS kept
                 FROM nn n JOIN sz ON sz.cell = n.cell WHERE sz.csz > $SemCap)
      SELECT vec_id, cell, n_close, kept
      FROM (SELECT * FROM smallout UNION ALL SELECT * FROM hotout)
      ORDER BY vec_id""")
  ) { (s, d) =>
    Quantization.semanticDedupCapped(embeddings(s, d),
        targetOcc = SimilarityQueries.TargetOcc,
        maxBits = SimilarityQueries.DedupMaxBits,
        dim = SimilarityQueries.Dim, cap = SemCap)
      .orderBy("vec_id")
  }

  // --- X90: hot-cell SECONDARY SPLIT — the verdict-REFINING alternative
  // to x82's wholesale cap: cells over the cap are re-bucketed under 4
  // more hyperplanes of the same family (sub-cell ids extend the cell
  // id's bit prefix) and the exact pairwise integer-cosine test runs
  // inside sub-cells. Sub-cap cells are bit-identical to x79; every
  // emitted verdict remains a real cosine comparison (x82 decides
  // non-identical family members wholesale). The trade is recall across
  // sub-cell boundaries — the standard LSH contract, one level finer.
  private val RefineExtraBits = 4
  val x90 = Query(
    "x90_semantic_dedup_refined",
    Some(s"""
      WITH $codesCtes,
      nc AS (SELECT count(*) AS cnt FROM embeddings),
      nb AS (SELECT CAST(${SimilarityQueries.nbitsSqlFor(SimilarityQueries.TargetOcc, SimilarityQueries.DedupMaxBits)} AS INT) AS nbits,
                    CAST(least(${SimilarityQueries.nbitsSqlFor(SimilarityQueries.TargetOcc, SimilarityQueries.DedupMaxBits)} + $RefineExtraBits,
                      ${SimilarityQueries.DedupMaxBits}) AS INT) AS nbits2
             FROM nc),
      ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      bk AS (SELECT vec_id,
               CAST(${SimilarityQueries.maskedBucketSqlVar(SimilarityQueries.DedupMaxBits, "nbits")} AS INT) AS cell,
               CAST(${SimilarityQueries.maskedBucketSqlVar(SimilarityQueries.DedupMaxBits, "nbits2")} AS INT) AS subcell
             FROM ev, nb),
      nn AS (SELECT q.vec_id, bk.cell, bk.subcell, q.q,
               CAST(list_aggregate(list_transform(range(1, len(q.q) + 1),
                 j -> q.q[j] * q.q[j]), 'sum') AS BIGINT) AS nrm
             FROM qq q JOIN bk ON bk.vec_id = q.vec_id),
      sz AS (SELECT cell, CAST(count(*) AS BIGINT) AS csz FROM nn GROUP BY cell),
      un AS (SELECT n.vec_id, 0 AS branch, n.cell, n.q, n.nrm
             FROM nn n JOIN sz ON sz.cell = n.cell WHERE sz.csz <= $SemCap
             UNION ALL
             SELECT n.vec_id, 1 AS branch, n.subcell AS cell, n.q, n.nrm
             FROM nn n JOIN sz ON sz.cell = n.cell WHERE sz.csz > $SemCap),
      pairs AS (SELECT b.vec_id,
                  CAST(list_aggregate(list_transform(range(1, len(a.q) + 1),
                    j -> a.q[j] * b.q[j]), 'sum') AS BIGINT) AS dot,
                  a.nrm AS lon, b.nrm AS hin
                FROM un a JOIN un b ON a.branch = b.branch
                  AND a.cell = b.cell AND a.vec_id < b.vec_id),
      cl AS (SELECT vec_id, CAST(count(*) AS BIGINT) AS n_close FROM pairs
             WHERE dot > 0 AND dot * dot * 10000 >= 2025 * lon * hin
             GROUP BY vec_id)
      SELECT u.vec_id, u.cell,
             COALESCE(cl.n_close, CAST(0 AS BIGINT)) AS n_close,
             COALESCE(cl.n_close, CAST(0 AS BIGINT)) = 0 AS kept
      FROM un u LEFT JOIN cl ON cl.vec_id = u.vec_id
      ORDER BY u.vec_id""")
  ) { (s, d) =>
    Quantization.semanticDedupRefined(embeddings(s, d),
        targetOcc = SimilarityQueries.TargetOcc,
        maxBits = SimilarityQueries.DedupMaxBits,
        dim = SimilarityQueries.Dim, cap = SemCap,
        extraBits = RefineExtraBits)
      .orderBy("vec_id")
  }

  // --- X84: RAG/embedding document chunking — overlapping fixed-size
  // token windows (32 tokens, stride 24) with per-chunk md5 fingerprints.
  // The chunk count formula (1 for one-chunk docs, else
  // 1 + ⌈(n − size)/stride⌉) keeps the final chunk anchored at the last
  // token. A pure per-row column program: ZERO shuffles (PlanShapeSpec
  // pins no exchange) — this runs over all 100 TB before embedding.
  // Everything is integer arithmetic plus md5; both engines
  // bit-identical, no rounding contract.
  private val ChunkSize = 32
  private val ChunkStride = 24
  val x84 = Query(
    "x84_doc_chunks",
    Some(s"""
      WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
      w AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM n),
      k AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n,
              CASE WHEN len(ws) <= $ChunkSize THEN CAST(1 AS BIGINT)
                   ELSE CAST(floor((len(ws) - $ChunkSize + ${ChunkStride - 1})
                          / $ChunkStride) AS BIGINT) + 1 END AS nch
            FROM w),
      c AS (SELECT doc_id, ws, n, unnest(range(0, nch)) AS i FROM k)
      SELECT doc_id, CAST(i AS INT) AS chunk_id,
             CAST(i * $ChunkStride AS BIGINT) AS start_tok,
             least(CAST($ChunkSize AS BIGINT), n - i * $ChunkStride) AS n_toks,
             md5(array_to_string(
               ws[CAST(i * $ChunkStride + 1 AS INT) :
                  CAST(i * $ChunkStride
                       + least($ChunkSize, n - i * $ChunkStride) AS INT)],
               ' ')) AS chunk_hash
      FROM c ORDER BY doc_id, chunk_id""")
  ) { (s, d) =>
    Retrieval.chunkDocs(documents(s, d), chunkSize = ChunkSize, stride = ChunkStride)
      .orderBy("doc_id", "chunk_id")
  }

  // --- Y23/Y24: EXACT PHRASE SEARCH over a positional index — the
  // retrieval capability BM25's bag-of-words postings cannot answer.
  // Occurrence starts are the classical positional intersect: the first
  // term's postings equi-joined with each later term's postings shifted
  // by −i on (doc_id, pos); every join touches only the phrase terms'
  // postings (term-pruned; at scale, row-group-pruned store reads), so
  // candidate volume is Σ df(tᵢ) — never the corpus. y23 grades the
  // scan path; y24 answers the SAME oracle from the persisted
  // positional store with no document-text scan in the plan.
  private val Phrases = Seq(Seq("fast", "table"), Seq("table", "part"),
    Seq("value", "table", "part"))
  private val PhraseK = 10
  /** Shared phrase-match CTE chain (through `r`, the ranked hits) —
    * reused verbatim by y23, the y28 same-oracle/different-plan pair,
    * and y29's snippet join. */
  private val phraseCtes: String = {
    val allTerms = Phrases.flatten.distinct
      .map(t => s"'$t'").mkString("(", ",", ")")
    def matchCte(i: Int, ts: Seq[String]) = {
      val joins = ts.zipWithIndex.drop(1).map { case (t, j) =>
        s"JOIN pos p$j ON p$j.doc_id = p0.doc_id " +
          s"AND p$j.pos = p0.pos + $j AND p$j.term = '$t'"
      }.mkString(" ")
      s"""m$i AS (
        SELECT '${ts.mkString(" ")}' AS phrase, p0.doc_id,
               CAST(count(*) AS BIGINT) AS n_occ,
               CAST(min(p0.pos) AS BIGINT) AS first_pos
        FROM pos p0 $joins
        WHERE p0.term = '${ts.head}'
        GROUP BY p0.doc_id)"""
    }
    val unions = Phrases.indices.map(i => s"SELECT * FROM m$i")
      .mkString(" UNION ALL ")
    s"""w AS (SELECT doc_id, string_split($normSql, ' ') AS ws FROM documents),
      pos AS (SELECT doc_id, ws[p] AS term, CAST(p - 1 AS BIGINT) AS pos
              FROM w, UNNEST(range(1, len(ws) + 1)) t(p)
              WHERE ws[p] IN $allTerms),
      ${Phrases.zipWithIndex.map { case (ts, i) => matchCte(i, ts) }
        .mkString(",")},
      u AS ($unions),
      r AS (SELECT phrase, doc_id, n_occ, first_pos,
              CAST(row_number() OVER (PARTITION BY phrase
                ORDER BY n_occ DESC, doc_id) AS INT) AS rk
            FROM u)"""
  }

  private val phraseOracleSql: String = s"""
      WITH $phraseCtes
      SELECT phrase, doc_id, n_occ, first_pos, rk FROM r WHERE rk <= $PhraseK
      ORDER BY phrase, rk"""

  val y23 = Query("y23_phrase_search", Some(phraseOracleSql)) { (s, d) =>
    Retrieval.phraseSearch(documents(s, d), Phrases, k = PhraseK)
      .orderBy("phrase", "rk")
  }

  private def ensurePositionalStore(s: org.apache.spark.sql.SparkSession,
                                    d: String): String = {
    val path = StoreFixtures.path("graft-posindex", d, "documents.parquet",
      "posidx1")
    StoreFixtures.onceBySuccess(path, "positions") {
      Retrieval.writePositionalStore(documents(s, d), path)
    }
  }

  val y24 = Query("y24_phrase_store", Some(phraseOracleSql)) { (s, d) =>
    Retrieval.phraseSearchFromStore(s, ensurePositionalStore(s, d), Phrases,
        k = PhraseK)
      .orderBy("phrase", "rk")
  }

  // --- Y26: PROXIMITY (NEAR/w) SEARCH — the unordered co-occurrence
  // relaxation of y23: per-doc count of (pos_a, pos_b) pairs within the
  // window. The engine runs the y16 interval-banding shape (side b
  // keeps band ⌊pos/w⌋, side a explodes to its ≤3 reachable bands, join
  // on (doc_id, band) — each qualifying pair lands in exactly one
  // joined row, candidate volume window-local instead of df×df); the
  // oracle states the naive doc_id-join + range-filter semantics the
  // banding provably preserves.
  private val ProxPairs = Seq(("fast", "table"), ("spark", "window"))
  private val ProxWindow = 4
  private val proxOracleSql: String = {
    val allTerms = ProxPairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(t => s"'$t'").mkString("(", ",", ")")
    val pairCtes = ProxPairs.zipWithIndex.map { case ((ta, tb), i) =>
      s"""pr$i AS (
        SELECT '$ta' AS term_a, '$tb' AS term_b, a.doc_id,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM pos a JOIN pos b ON b.doc_id = a.doc_id
          AND abs(a.pos - b.pos) <= $ProxWindow AND a.pos <> b.pos
        WHERE a.term = '$ta' AND b.term = '$tb'
        GROUP BY a.doc_id)"""
    }.mkString(",")
    val unions = ProxPairs.indices.map(i => s"SELECT * FROM pr$i")
      .mkString(" UNION ALL ")
    s"""
      WITH w AS (SELECT doc_id, string_split($normSql, ' ') AS ws FROM documents),
      pos AS (SELECT doc_id, ws[p] AS term, CAST(p - 1 AS BIGINT) AS pos
              FROM w, UNNEST(range(1, len(ws) + 1)) t(p)
              WHERE ws[p] IN $allTerms),
      $pairCtes,
      u AS ($unions)
      SELECT term_a, term_b, doc_id, n_pairs,
             CAST(row_number() OVER (PARTITION BY term_a, term_b
               ORDER BY n_pairs DESC, doc_id) AS INT) AS rk
      FROM u QUALIFY rk <= $PhraseK
      ORDER BY term_a, term_b, rk"""
  }

  val y26 = Query("y26_proximity_search", Some(proxOracleSql)) { (s, d) =>
    Retrieval.proximitySearch(documents(s, d), ProxPairs,
        window = ProxWindow, k = PhraseK)
      .orderBy("term_a", "term_b", "rk")
  }

  // --- Y27: LATE-INTERACTION (MaxSim) RETRIEVAL — the ColBERT scoring
  // shape with no model: token vectors are ±1 md5 sums of the token's
  // character trigrams (subword hashing — "streaming" shares most
  // components with "stream"), score(doc) = Σ_q max over doc tokens of
  // the integer dot. Vectors exist once per DISTINCT token (the x02
  // dictionary trick); the query terms are deliberately morphological
  // variants absent from the corpus vocabulary, so the ranking is pure
  // subword similarity — fuzzy retrieval BM25's exact terms can't do.
  private val MaxSimTerms = Seq("streaming", "vectors", "tables")
  private val MaxSimDim = 32
  private val maxSimOracleSql: String = {
    val termsList = MaxSimTerms.map(t => s"'$t'").mkString("[", ", ", "]")
    def vecCtes(tag: String, src: String) = s"""
      f$tag AS (SELECT token, substr(token, j, 3) AS g
                FROM $src,
                UNNEST(range(1, greatest(length(token) - 2, 1) + 1)) t(j)),
      sg$tag AS (SELECT token,
                   ${graft.functions.TextFunctions.md5BucketSql("g")}
                     % $MaxSimDim AS b,
                   CASE WHEN (instr('0123456789abcdef', substr(md5(g), 4, 1))
                          - 1) >= 8 THEN 1 ELSE -1 END AS s
                 FROM f$tag),
      c$tag AS (SELECT token, b, CAST(SUM(s) AS BIGINT) AS v
                FROM sg$tag GROUP BY token, b),
      dv$tag AS (SELECT t.token, r.j, CAST(COALESCE(c.v, 0) AS BIGINT) AS v
                 FROM $src t
                 CROSS JOIN (SELECT unnest(range(0, $MaxSimDim)) AS j) r
                 LEFT JOIN c$tag c ON c.token = t.token AND c.b = r.j),
      vv$tag AS (SELECT token, list(v ORDER BY j) AS tv
                 FROM dv$tag GROUP BY token)"""
    s"""
      WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
      dt AS (SELECT DISTINCT doc_id, unnest(string_split(norm, ' ')) AS token
             FROM n),
      vocab AS (SELECT DISTINCT token FROM dt),
      qt AS (SELECT unnest($termsList) AS token),
      ${vecCtes("v", "vocab")},
      ${vecCtes("q", "qt")},
      dots AS (SELECT v.token, q.token AS q_term,
                 CAST(list_aggregate(list_transform(range(1, $MaxSimDim + 1),
                   i -> v.tv[i] * q.tv[i]), 'sum') AS BIGINT) AS dot
               FROM vvv v CROSS JOIN vvq q),
      pt AS (SELECT d.doc_id, s.q_term, MAX(s.dot) AS max_dot
             FROM dt d JOIN dots s ON s.token = d.token
             GROUP BY d.doc_id, s.q_term),
      sc AS (SELECT doc_id, CAST(SUM(max_dot) AS BIGINT) AS score
             FROM pt GROUP BY doc_id)
      SELECT doc_id, score,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rk
      FROM sc QUALIFY rk <= $PhraseK
      ORDER BY rk"""
  }

  val y27 = Query("y27_maxsim_retrieval", Some(maxSimOracleSql)) { (s, d) =>
    Retrieval.maxSimTopK(documents(s, d), MaxSimTerms, k = PhraseK,
        dim = MaxSimDim)
      .orderBy("rk")
  }

  // --- Y28: COST-BASED phrase planning — y23's exact semantics through
  // the reordered plan: the intersect chain seeds from the RAREST term
  // (ascending df, one bounded |terms|-row probe) so a stop-word-grade
  // phrase term never becomes the seed side; every later join is
  // bounded by the rare side. Same oracle text as y23 — identical rows
  // through a different join tree is the optimization's correctness
  // contract (the y19 store pattern applied to join ordering).
  val y28 = Query("y28_phrase_rarest_first", Some(phraseOracleSql)) { (s, d) =>
    Retrieval.phraseSearchRarestFirst(documents(s, d), Phrases, k = PhraseK)
      .orderBy("phrase", "rk")
  }

  // --- Y29: keyword-in-context SNIPPETS — the top phrase hits (bounded:
  // ≤ k·|phrases| rows) broadcast back into ONE documents scan; the
  // snippet is the ±context token window around the first occurrence,
  // a pure column program after the bounded join.
  private val SnippetContext = 3
  val y29 = Query(
    "y29_phrase_snippets",
    Some {
      val lenCase = Phrases.map(ts =>
        s"WHEN '${ts.mkString(" ")}' THEN ${ts.length}").mkString(" ")
      s"""
      WITH $phraseCtes,
      h AS (SELECT phrase, doc_id, rk, first_pos FROM r WHERE rk <= $PhraseK)
      SELECT h.phrase, h.doc_id, h.rk,
             array_to_string(list_slice(w.ws,
               greatest(h.first_pos - $SnippetContext, 0) + 1,
               h.first_pos + (CASE h.phrase $lenCase END) + $SnippetContext),
               ' ') AS snippet
      FROM h JOIN w ON w.doc_id = h.doc_id
      ORDER BY phrase, rk"""
    }
  ) { (s, d) =>
    Retrieval.phraseSnippets(documents(s, d), Phrases, k = PhraseK,
        context = SnippetContext)
      .orderBy("phrase", "rk")
  }

  val all: Seq[Query] = Seq(x66, x67, x68, x75, x76, x79, x81, x82, x84, x88,
    x90, y17, y18, y19, y20, y23, y24, y26, y27, y28, y29, y35, y38, y49,
    y52, y55, y57, y58, y59, y60, y61, y62, y63, y64, y68, y69)
}
