package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** SQL-parity batch 5 (VERDICT r10 #2): the STORE-SERVED tier. The
  * y49–y53 oracles are exercised by the driver through DuckDB over the
  * raw tables; a BI user of THIS engine, though, queries the persisted
  * stores through `spark.sql` — so each test here registers the store
  * tables as temp views and asserts that the SQL a user would type
  * against them returns row-identical results to the DataFrame serving
  * path (the graded query). Float discipline matches the serving code:
  * every arithmetic chain is anchored in DOUBLE (bare float literals
  * parse as DECIMAL in Spark SQL, whose division rounds differently),
  * and the store-side integer columns (tf, dl, dots) keep the BIGINT
  * contract end to end. */
class SqlParityStoreSpec extends AnyFunSuite with SparkTest {

  private def resolved(dir: String): String =
    graft.streaming.StoreFs.dataDir(spark, dir)

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  // ---- y50: SCD2 dimension served from the stream-built change store --

  test("y50 SCD2 store: BI SQL over the changes view == DataFrame serve") {
    val viaDf = Inventory.byName("y50_scd2_stream_store").run(spark, sfDir)
    val path = StoreFixtures.path("graft-scd2store", sfDir, "events.parquet",
      "scd2store2")
    spark.read.parquet(resolved(s"$path/changes"))
      .createOrReplaceTempView("scd2_changes")
    val viaSql = spark.sql("""
      SELECT user_id, state, valid_from_us, valid_to_us,
             CASE WHEN valid_to_us IS NULL THEN 1 ELSE 0 END AS is_current
      FROM (SELECT user_id, state, valid_from_us,
              LEAD(valid_from_us) OVER (
                PARTITION BY user_id ORDER BY change_seq) AS valid_to_us
            FROM scd2_changes)
      ORDER BY user_id, valid_from_us""")
    assert(sortedRows(viaDf) == sortedRows(viaSql),
      "y50: SQL over the change store and the DataFrame serve diverge")
  }

  // ---- y53: behavioral mart served from the three reach stores -------

  test("y53 mart stores: BI SQL over the reach views == DataFrame serve") {
    val viaDf = Inventory.byName("y53_mart_stream_store").run(spark, sfDir)
    val p = StoreFixtures.path("graft-martstore", sfDir, "events.parquet",
      "martstore1")
    import org.apache.spark.sql.functions.col
    spark.read.parquet(resolved(s"$p/steps")).filter(col("user_id") >= 0L)
      .createOrReplaceTempView("mart_steps")
    spark.read.parquet(resolved(s"$p/cells")).filter(col("user_id") >= 0L)
      .createOrReplaceTempView("mart_cells")
    spark.read.parquet(resolved(s"$p/pairs")).filter(col("user_id") >= 0L)
      .createOrReplaceTempView("mart_pairs")
    val viaSql = spark.sql("""
      WITH spec AS (SELECT * FROM VALUES
             (1, 'view'), (2, 'click'), (3, 'purchase') AS t(step, event_type)),
      counts AS (SELECT step, COUNT(*) AS n_users FROM mart_steps GROUP BY step),
      filled AS (SELECT s.step, s.event_type,
                   COALESCE(c.n_users, CAST(0 AS BIGINT)) AS n_users
                 FROM spec s LEFT JOIN counts c USING (step)),
      base AS (SELECT n_users AS n0 FROM filled WHERE step = 1),
      fun AS (SELECT 'funnel' AS section, CAST(step AS STRING) AS k1,
                event_type AS k2, n_users AS n,
                CASE WHEN n0 = 0 THEN CAST(NULL AS DOUBLE)
                     ELSE ROUND(CAST(n_users AS DOUBLE) / n0, 6) END AS ratio
              FROM filled CROSS JOIN base),
      ret0 AS (SELECT cohort_w, week_offset, COUNT(*) AS n_active
               FROM mart_cells GROUP BY cohort_w, week_offset),
      ret AS (SELECT 'retention' AS section, CAST(cohort_w AS STRING) AS k1,
                CAST(week_offset AS STRING) AS k2, n_active AS n,
                ROUND(CAST(n_active AS DOUBLE) /
                  MAX(CASE WHEN week_offset = 0 THEN n_active END)
                    OVER (PARTITION BY cohort_w), 6) AS ratio
              FROM ret0),
      tra0 AS (SELECT from_type, to_type, COUNT(*) AS n
               FROM mart_pairs GROUP BY from_type, to_type),
      tra AS (SELECT 'transition' AS section, from_type AS k1, to_type AS k2,
                n, ROUND(CAST(n AS DOUBLE) /
                  SUM(n) OVER (PARTITION BY from_type), 6) AS ratio
              FROM tra0)
      SELECT * FROM fun UNION ALL SELECT * FROM ret UNION ALL SELECT * FROM tra
      ORDER BY section, k1, k2""")
    assert(sortedRows(viaDf) == sortedRows(viaSql),
      "y53: SQL over the reach stores and the DataFrame serve diverge")
  }

  // ---- y49 / y52: hybrid RRF served from index + vector stores -------

  /** The BI-SQL formulation of the store-served hybrid batch: BM25 from
    * the postings/doclen views, exact BIGINT dots from the vec view via
    * higher-order functions, the y18 RRF fusion tail — correctness
    * parity only (the SQL scan reads all cells; the cell PRUNING is the
    * DataFrame path's plan-level lever, pinned in PlanShapeSpec). */
  private val hybridStoreSql = """
      WITH qt AS (SELECT CAST(q AS BIGINT) AS query_id, t AS term FROM VALUES
             (1,'spark'),(1,'window'),(1,'stream'),(2,'customer'),(2,'vector')
             AS v(q, t)),
      qp AS (SELECT CAST(q AS BIGINT) AS query_id, CAST(p AS BIGINT) AS probe_id
             FROM VALUES (1, 42), (2, 137) AS v(q, p)),
      g AS (SELECT COUNT(*) AS n_docs,
              CAST(SUM(CAST(dl AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*) AS avgdl
            FROM idx_doclen),
      tf AS (SELECT term, doc_id, dl, tf FROM idx_postings
             WHERE term IN (SELECT term FROM qt)),
      df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      sc AS (SELECT t.term, t.doc_id, t.tf,
               ROUND(ROUND(LN((CAST(g.n_docs AS DOUBLE) - f.df + 0.5)
                   / (f.df + CAST(0.5 AS DOUBLE)) + 1.0), 6)
                 * (t.tf * CAST(2.2 AS DOUBLE))
                 / (t.tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
                     + CAST(0.75 AS DOUBLE) * t.dl / g.avgdl)), 6) AS score
             FROM tf t JOIN df f USING (term) CROSS JOIN g),
      lexdoc AS (SELECT qt.query_id, sc.doc_id,
                   SUM(CAST(FLOOR(score * CAST(1000000 AS DOUBLE) + 0.5)
                     AS BIGINT)) AS lex_int
                 FROM sc JOIN qt USING (term) GROUP BY qt.query_id, sc.doc_id),
      lexr AS (SELECT query_id, doc_id, lex_rk FROM (
                 SELECT query_id, doc_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY lex_int DESC, doc_id) AS INT) AS lex_rk
                 FROM lexdoc) WHERE lex_rk <= 50),
      q AS (SELECT qp.query_id, qp.probe_id, v.vm AS qvec
            FROM vec_vecs v JOIN qp ON v.vec_id = qp.probe_id),
      dots AS (SELECT q.query_id, v.vec_id AS doc_id,
                 AGGREGATE(ZIP_WITH(v.vm, q.qvec, (a, b) -> a * b),
                   CAST(0 AS BIGINT), (acc, x) -> acc + x) AS dot
               FROM vec_vecs v CROSS JOIN q WHERE v.vec_id <> q.probe_id),
      semr AS (SELECT query_id, doc_id, sem_rk FROM (
                 SELECT query_id, doc_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY dot DESC, doc_id) AS INT) AS sem_rk
                 FROM dots) WHERE sem_rk <= 50),
      fuse AS (SELECT COALESCE(l.query_id, s.query_id) AS query_id,
                 COALESCE(l.doc_id, s.doc_id) AS doc_id, l.lex_rk, s.sem_rk,
                 ROUND(COALESCE(CAST(1 AS DOUBLE) / (60 + l.lex_rk),
                     CAST(0 AS DOUBLE))
                   + COALESCE(CAST(1 AS DOUBLE) / (60 + s.sem_rk),
                     CAST(0 AS DOUBLE)), 6) AS rrf
               FROM lexr l FULL OUTER JOIN semr s
                 ON l.query_id = s.query_id AND l.doc_id = s.doc_id)
      SELECT query_id, doc_id, lex_rk, sem_rk, rrf, rk FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY rrf DESC, doc_id) AS INT) AS rk FROM fuse)
      WHERE rk <= 20 ORDER BY query_id, rk"""

  private def hybridParity(queryName: String, indexPath: String,
                           vecPath: String): Unit = {
    val viaDf = Inventory.byName(queryName).run(spark, sfDir)
    spark.read.parquet(resolved(s"$indexPath/doclen"))
      .select("doc_id", "dl")
      .createOrReplaceTempView("idx_doclen")
    spark.read.parquet(resolved(s"$indexPath/postings"))
      .select("term", "doc_id", "dl", "tf")
      .createOrReplaceTempView("idx_postings")
    spark.read.option("mergeSchema", "true")
      .parquet(resolved(s"$vecPath/vecs"))
      .select("vec_id", "vm")
      .createOrReplaceTempView("vec_vecs")
    val viaSql = spark.sql(hybridStoreSql)
    assert(sortedRows(viaDf) == sortedRows(viaSql),
      s"$queryName: SQL over the stores and the DataFrame serve diverge")
  }

  test("y49 hybrid stores: BI SQL over index+vec views == DataFrame serve") {
    hybridParity("y49_hybrid_store",
      StoreFixtures.path("graft-bm25index", sfDir, "documents.parquet",
        "bm25idx1"),
      StoreFixtures.path("graft-vecstore", sfDir, "documents.parquet",
        "vecstore2"))
  }

  test("y52 incremental hybrid stores: the same BI SQL over the two-generation views == DataFrame serve") {
    hybridParity("y52_hybrid_store_incr",
      StoreFixtures.path("graft-bm25index", sfDir, "documents.parquet",
        "bm25idx1") + "-incr",
      StoreFixtures.path("graft-vecstore", sfDir, "documents.parquet",
        "vecstore2") + "-incr")
  }

  // ---- y51: IVFADC served path from coarse/books/codes views ---------

  test("y51 IVFADC stores: BI SQL over coarse/books/codes views == DataFrame serve") {
    val viaDf = Inventory.byName("y51_ivfadc_serve").run(spark, sfDir)
    val path = StoreFixtures.path("graft-ivfadc", sfDir, "embeddings.parquet",
      "ivfadc2")
    val probeIds = graft.operators.Similarity.boundedProbeIds(
      graft.sources.Tables.embeddings(spark, sfDir), 32)
    spark.read.parquet(s"$path/coarse").createOrReplaceTempView("ivf_coarse")
    spark.read.parquet(s"$path/books").createOrReplaceTempView("ivf_books")
    spark.read.parquet(resolved(s"$path/codes"))
      .select("vec_id", "sub", "cell", "ivf_cell")
      .createOrReplaceTempView("ivf_codes")
    graft.sources.Tables.embeddings(spark, sfDir)
      .createOrReplaceTempView("embeddings")
    // nprobe=6, m=8, subDim=8, kShort=100, k=10 — the y51 constants
    val viaSql = spark.sql(s"""
      WITH mv AS (SELECT vec_id, TRANSFORM(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
               AS vm FROM embeddings),
      pm AS (SELECT vec_id AS probe_id, vm AS pm FROM mv
             WHERE vec_id IN (${probeIds.mkString(",")})),
      pc AS (SELECT probe_id, pm, ivf_cell, ccvm,
               AGGREGATE(ZIP_WITH(pm, ccvm, (a, b) -> (a - b) * (a - b)),
                 CAST(0 AS BIGINT), (acc, x) -> acc + x) AS cd2
             FROM pm CROSS JOIN ivf_coarse),
      pcell AS (SELECT probe_id, ivf_cell,
                  ZIP_WITH(pm, ccvm, (a, b) -> a - b) AS prm FROM (
                  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                    ORDER BY cd2, ivf_cell) AS cr FROM pc) WHERE cr <= 6),
      psv AS (SELECT probe_id, ivf_cell, sub,
                SLICE(prm, sub * 8 + 1, 8) AS psvm
              FROM pcell LATERAL VIEW EXPLODE(SEQUENCE(0, 7)) s AS sub),
      lut AS (SELECT probe_id, ivf_cell, sub, cent_id AS cell,
                AGGREGATE(ZIP_WITH(psvm, cvm, (a, b) -> (a - b) * (a - b)),
                  CAST(0 AS BIGINT), (acc, x) -> acc + x) AS pd2
              FROM psv JOIN ivf_books USING (sub)),
      sc AS (SELECT probe_id, vec_id AS neighbor_id, SUM(pd2) AS adc_d2
             FROM ivf_codes JOIN lut USING (ivf_cell, sub, cell)
             WHERE vec_id <> probe_id GROUP BY probe_id, vec_id),
      shortl AS (SELECT probe_id, neighbor_id FROM (
                   SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                     ORDER BY adc_d2, neighbor_id) AS sr FROM sc)
                 WHERE sr <= 100),
      rr AS (SELECT s.probe_id, s.neighbor_id,
               AGGREGATE(ZIP_WITH(v.vm, p.pm, (a, b) -> (a - b) * (a - b)),
                 CAST(0 AS BIGINT), (acc, x) -> acc + x) AS d2
             FROM shortl s JOIN mv v ON v.vec_id = s.neighbor_id
             JOIN pm p ON p.probe_id = s.probe_id)
      SELECT probe_id, neighbor_id, d2, rk FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
          ORDER BY d2, neighbor_id) AS INT) AS rk FROM rr) WHERE rk <= 10
      ORDER BY probe_id, rk""")
    assert(sortedRows(viaDf) == sortedRows(viaSql),
      "y51: SQL over the IVFADC stores and the DataFrame serve diverge")
  }

  // ---- y54: curation verdicts served from the stream-built store ----

  test("y54 verdict store: BI SQL over the verdicts view == DataFrame serve") {
    // running the graded query first also builds the fixture store
    val viaDf = Inventory.byName("y54_curation_stream_store").run(spark, sfDir)
    val p = StoreFixtures.path("graft-curationstream", sfDir,
      "documents.parquet", "curstream1")
    spark.read.parquet(resolved(s"$p/verdicts"))
      .createOrReplaceTempView("cur_verdicts")
    val viaSql = spark.sql("""
      SELECT stage, lang, COUNT(*) AS n_docs
      FROM (SELECT lang,
              CASE WHEN gated = 0 THEN 'gated'
                   WHEN dropped = 1 THEN 'dup'
                   WHEN semdropped = 1 THEN 'semdup'
                   WHEN kept = 1 THEN 'kept'
                   ELSE 'lowlam' END AS stage
            FROM cur_verdicts)
      GROUP BY stage, lang ORDER BY stage, lang""")
    assert(sortedRows(viaDf) == sortedRows(viaSql),
      "y54: SQL over the verdict store and the DataFrame serve diverge")
  }

  // ---- the registered TABLE-FUNCTION surface (VERDICT r11 #7) --------
  //
  // The rows above prove the stores answer hand-written BI SQL; these
  // prove a pure-SQL user can invoke the SERVING CODE ITSELF — the
  // graft_* table functions registered by GraftExtensions analyze to a
  // DeferredServe leaf (VERDICT r12 #2: zero jobs / zero cache pins at
  // analysis) whose execution drives the SAME DataFrame serving code,
  // so parity is by shared implementation, and the plan pins (DPP cell
  // pruning) carry over to the SQL form through the resolved INNER
  // plan.

  /** The deferred TVF's REAL serve plan: the caller must have executed
    * the frame (the serve resolves at execution), after which every
    * DeferredServeExec in the tree exposes its resolved inner plan. */
  private def innerPlans(df: org.apache.spark.sql.DataFrame): String = {
    val found = deferredServeNodes(df)
    assert(found.nonEmpty, "no DeferredServeExec in the TVF plan — " +
      "did the deferred strategy unregister?")
    found.map(_.inner.queryExecution.executedPlan.toString).mkString("\n")
  }

  test("graft_exact_topk / graft_hybrid_rrf: pure SQL drives the store serves, plans keep DPP") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "spark shuffles partition data across executors"),
      (2L, "parquet row group statistics prune column scans"),
      (3L, "watermarks bound state in streaming aggregations"),
      (4L, "broadcast joins avoid shuffling the large side"),
      (5L, "adaptive execution replans skewed shuffle joins"),
      (6L, "columnar scans batch rows for whole stage codegen")
    ).toDF("doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft-tvf-hybrid-").toString
    val idx = s"$root/idx"; val vec = s"$root/vec"
    graft.operators.Retrieval.writeIndexStore(docs, idx)
    graft.operators.ExactIvf.writeVecStore(
      graft.operators.TextAnalysis.hashedEmbedding(docs)
        .select(col("doc_id"), col("vec")),
      vec, nCells = 2, iters = 1)
    val queries = Seq(
      (1L, Seq("spark", "shuffle"), 1L),
      (2L, Seq("parquet", "scans"), 2L),
      (3L, Seq("joins", "broadcast"), 4L))
    queries.toDF("query_id", "terms", "probe_id")
      .createOrReplaceTempView("tvf_queries")

    val exactSql = spark.sql(
      s"SELECT * FROM graft_exact_topk('$vec', 'tvf_queries', 3, 2)")
    val exactDf = graft.operators.ExactIvf.topDotBatchFromStore(
      spark, vec, queries.map { case (q, _, p) => (q, p) }, k = 3,
      nprobe0 = 2)
    assert(sortedRows(exactSql) == sortedRows(exactDf),
      "graft_exact_topk: the SQL surface and the DataFrame serve diverge")
    // the plan pins carry over: DPP cell pruning, no literal cell list
    // (through the deferred node's resolved inner plan)
    val exactPlan = innerPlans(exactSql)
    assert(exactPlan.contains("dynamicpruningexpression"),
      s"the SQL form must keep DPP cell pruning:\n$exactPlan")
    assert("(ivf_cell|cell_bucket)#\\d+L? (IN \\(|INSET)".r.findFirstIn(exactPlan).isEmpty,
      s"no literal cell-id list in the SQL form either:\n$exactPlan")

    val hybridSql = spark.sql(
      s"SELECT * FROM graft_hybrid_rrf('$idx', '$vec', 'tvf_queries', 5, 4)")
    val hybridDf = graft.operators.Retrieval.hybridRrfBatchFromStores(
      spark, idx, vec, queries, kList = 5, kOut = 4)
    assert(sortedRows(hybridSql) == sortedRows(hybridDf),
      "graft_hybrid_rrf: the SQL surface and the DataFrame serve diverge")

    // the 8-arg form: SQL decimal literals (k1/b) must parse — a bare
    // 1.2 evals as Spark's Decimal, not a java Number
    val hybridSql8 = spark.sql(
      s"""SELECT * FROM graft_hybrid_rrf('$idx', '$vec', 'tvf_queries',
         5, 4, 1.2, 0.75, 4)""")
    assert(sortedRows(hybridSql8) == sortedRows(hybridDf),
      "graft_hybrid_rrf 8-arg form diverges from the 5-arg defaults")

    val bm25Sql = spark.sql(
      s"SELECT * FROM graft_bm25_topk('$idx', 'spark, shuffle, joins', 3)")
    val bm25Df = graft.operators.Retrieval.bm25TopKFromStore(
      spark, idx, Seq("spark", "shuffle", "joins"), k = 3)
    assert(sortedRows(bm25Sql) == sortedRows(bm25Df),
      "graft_bm25_topk: the SQL surface and the DataFrame serve diverge")
  }

  test("graft_*_at: pure SQL time travel — poisoned live stores, the TVF serves the pinned snapshot (VERDICT r13 #2)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // the y59 adversarial scenario driven through the SQL surface:
    // snapshot both hybrid stores, poison every LIVE ranking with
    // provable-top decoys, then the _at TVFs must still hash-match the
    // original corpus while the live TVFs must move
    val docs = (0L until 60L).map { i =>
      (i, s"alpha term${i % 5} document $i about topic${i % 3} body")
    }.toDF("doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft-tvf-at-").toString
    val idx = s"$root/idx"; val vec = s"$root/vec"; val adc = s"$root/adc"
    graft.operators.Retrieval.writeIndexStore(docs, idx)
    graft.operators.ExactIvf.writeVecStore(
      graft.operators.TextAnalysis.hashedEmbedding(docs)
        .select(col("doc_id"), col("vec")), vec, nCells = 4, iters = 1)
    val emb = (0L until 60L).map { i =>
      (i, (0 until 8).map(j => ((i * 31 + j * 17) % 201) - 100L).toArray)
    }.toDF("vec_id", "embedding")
    graft.operators.Pq.writeIvfadcStore(emb, adc, nCells = 4, m = 2,
      dim = 8, nCents = 8, iters = 1)
    val queries = Seq((1L, Seq("term1", "alpha"), 8L),
      (2L, Seq("term3"), 21L))
    queries.toDF("query_id", "terms", "probe_id")
      .createOrReplaceTempView("tvfat_queries")
    Seq(8L, 21L).toDF("probe_id").createOrReplaceTempView("tvfat_probes")
    emb.createOrReplaceTempView("tvfat_emb")

    val idxSnap = graft.operators.Retrieval.snapshotIndexStore(spark, idx)
    val vecSnap = graft.operators.ExactIvf.snapshotVecStore(spark, vec)
    val adcSnap = graft.operators.Pq.snapshotIvfadcStore(spark, adc)
    def liveHybrid = spark.sql(s"SELECT * FROM graft_hybrid_rrf('$idx', " +
      s"'$vec', 'tvfat_queries', 10, 5)")
    def liveExact = spark.sql(s"SELECT * FROM graft_exact_topk('$vec', " +
      "'tvfat_queries', 5, 2)")
    def liveAdc = spark.sql(s"SELECT * FROM graft_ivfadc_topk('$adc', " +
      "'tvfat_emb', 'tvfat_probes', 2, 20, 5, 2, 8)")
    val hybrid0 = sortedRows(liveHybrid)
    val exact0 = sortedRows(liveExact)
    val adc0 = sortedRows(liveAdc)

    // poison every live store: docs that provably top each lexical
    // list (tf-dense repeats), vectors that provably top each dot
    // ranking (the probe's own vector scaled 1000×), IVFADC decoys at
    // ADC distance 0
    val docs2 = Seq(
      (200L, Seq.fill(12)("term1").mkString(" ") + " alpha dense page"),
      (201L, Seq.fill(12)("term3").mkString(" ") + " dense page body"))
      .toDF("doc_id", "text")
    graft.operators.Retrieval.appendIndexStore(docs2, idx)
    val vecDecoys = graft.operators.TextAnalysis.hashedEmbedding(
        docs.filter(col("doc_id").isin(8L, 21L)))
      .select((col("doc_id") + 1000L).as("doc_id"),
        org.apache.spark.sql.functions.transform(col("vec"),
          v => v * 1000L).as("vec"))
    graft.operators.ExactIvf.appendToVecStore(spark, vecDecoys, vec,
      batchId = Some(1L), idCol = "doc_id", vecCol = "vec")
    val adcDecoys = emb.filter(col("vec_id").isin(8L, 21L))
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    graft.operators.Pq.appendToIvfadcStore(spark, adcDecoys, adc,
      m = 2, dim = 8, batchId = Some(1L))
    // the decoys enter the caller's embeddings view too — the live
    // serve must rank them; the pinned shortlist never contains them
    emb.unionAll(adcDecoys).createOrReplaceTempView("tvfat_emb")

    assert(sortedRows(liveHybrid) != hybrid0,
      "the decoys must move the live hybrid TVF")
    assert(sortedRows(liveExact) != exact0,
      "the decoys must move the live exact TVF")
    assert(sortedRows(liveAdc) != adc0,
      "the decoys must move the live IVFADC TVF")
    // the _at TVFs serve the pinned snapshots — row-identical to both
    // the pre-poison answers and the Scala snapshot forms
    val exactAt = spark.sql(s"SELECT * FROM graft_exact_topk_at('$vec', " +
      s"$vecSnap, 'tvfat_queries', 5, 2)")
    assert(sortedRows(exactAt) == exact0)
    assert(sortedRows(exactAt) == sortedRows(
      graft.operators.ExactIvf.topDotBatchFromStoreSnapshot(spark, vec,
        vecSnap, queries.map { case (q, _, p) => (q, p) }, k = 5,
        nprobe0 = 2)),
      "graft_exact_topk_at must equal the Scala snapshot form")
    val hybridAt = spark.sql(s"SELECT * FROM graft_hybrid_rrf_at('$idx', " +
      s"$idxSnap, '$vec', $vecSnap, 'tvfat_queries', 10, 5)")
    assert(sortedRows(hybridAt) == hybrid0)
    assert(sortedRows(hybridAt) == sortedRows(
      graft.operators.Retrieval.hybridRrfBatchFromStoresSnapshot(spark,
        idx, idxSnap, vec, vecSnap, queries, kList = 10, kOut = 5)),
      "graft_hybrid_rrf_at must equal the Scala snapshot form")
    val adcAt = spark.sql(s"SELECT * FROM graft_ivfadc_topk_at('$adc', " +
      s"$adcSnap, 'tvfat_emb', 'tvfat_probes', 2, 20, 5, 2, 8)")
    assert(sortedRows(adcAt) == adc0)
    // and the 7-arg form reads geometry from the manifest
    assert(sortedRows(spark.sql(
      s"SELECT * FROM graft_ivfadc_topk_at('$adc', $adcSnap, " +
        "'tvfat_emb', 'tvfat_probes', 2, 20, 5)")) == adc0)
  }

  test("graft_bm25_topk_table: relation terms == literal form; postings stay term-pruned") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark shuffles partition data across executors"),
      (2L, "parquet row group statistics prune column scans"),
      (3L, "watermarks bound state in streaming aggregations"),
      (4L, "broadcast joins avoid shuffling the large side"),
      (5L, "spark broadcast joins replan under adaptive execution")
    ).toDF("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft-tvf-bm25t-").toString + "/idx"
    graft.operators.Retrieval.writeIndexStore(docs, idx)
    // duplicates collapse; a term absent from the corpus scores nothing
    Seq("spark", "broadcast", "spark", "nosuchterm").toDF("term")
      .createOrReplaceTempView("bm25t_terms")
    val viaLit = graft.operators.Retrieval.bm25TopKFromStore(
      spark, idx, Seq("spark", "broadcast", "nosuchterm"), k = 3)
    val viaTable = spark.sql(
      s"SELECT * FROM graft_bm25_topk_table('$idx', 'bm25t_terms', 3)")
    assert(sortedRows(viaTable) == sortedRows(viaLit),
      "the relation-terms form must equal the literal form")
    // pruning regime 1 (≤ MaxTermPushdown): the DISTINCT terms push as
    // the postings scan's literal IN filter — row-group pruning intact
    val p = innerPlans(viaTable)
    assert(p.contains("In(term"),
      s"the bounded term set must push into the postings scan:\n$p")
    // pruning regime 2 (above the ceiling, forced here with ceiling 0):
    // terms stay a broadcast JOIN — no literal, answers identical
    val joined = graft.operators.Retrieval.bm25TopKFromStore(spark, idx,
      Seq("spark", "broadcast", "nosuchterm").toDF("term"), 3,
      1.2, 0.75, 0)
    assert(sortedRows(joined) == sortedRows(viaLit),
      "the join regime must stay row-identical")
    val pj = joined.queryExecution.executedPlan.toString
    assert(!pj.contains("In(term"),
      s"above the ceiling no term literal may enter the plan:\n$pj")
  }

  test("graft_store_audit: the store fsck is reachable from pure SQL") {
    import spark.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("graft-tvf-audit-").toString + "/codes"
    Seq((1L, 10L, 0L)).toDF("doc_id", "code", "batch_id")
      .write.mode("overwrite").parquet(store)
    graft.streaming.StoreFs.sealTagMarkers(spark, store)
    // sealed, no owner → the audit's 'owner' warn, via SQL
    val viaSql = spark.sql(
      s"SELECT * FROM graft_store_audit('$store') WHERE level = 'warn'")
    assert(viaSql.collect().exists(r =>
      r.getAs[String]("check") == "owner"),
      "the SQL audit must surface the unowned sealed store")
    graft.streaming.StoreFs.adoptStore(spark, store, "ckpt-z")
    assert(spark.sql(s"SELECT * FROM graft_store_audit('$store')")
      .count() == 0L, "a claimed healthy store audits clean via SQL")
    // the 3-arg form arms the reader-SLA retention check from SQL:
    // two quick compactions leave a grace window of seconds — a 1 h
    // SLA must warn
    graft.operators.Dedup.compactSignatureStore(spark, store)
    graft.operators.Dedup.compactSignatureStore(spark, store)
    val sla = spark.sql(
      s"SELECT * FROM graft_store_audit('$store', '', 3600)")
      .collect()
    assert(sla.exists(r => r.getAs[String]("check") == "retention" &&
      r.getAs[String]("level") == "warn"),
      s"the SQL form must arm the retention check: ${sla.toSeq}")
  }

  test("graft_ivfadc_topk: pure SQL drives the IVFADC store serve") {
    import spark.implicits._
    val emb = (0L until 120L).map { i =>
      (i, (0 until 8).map(j => (((i * 31 + j * 17) % 201) - 100).toFloat / 100f))
    }.toDF("vec_id", "embedding")
    val path = java.nio.file.Files
      .createTempDirectory("graft-tvf-ivfadc-").toString
    graft.operators.Pq.writeIvfadcStore(emb, path, nCells = 4, m = 2,
      dim = 8, nCents = 8, iters = 1)
    emb.createOrReplaceTempView("tvf_emb")
    Seq(3L, 41L, 77L).toDF("probe_id").createOrReplaceTempView("tvf_probes")
    val viaSql = spark.sql(s"""
      SELECT * FROM graft_ivfadc_topk('$path', 'tvf_emb', 'tvf_probes',
                                      2, 20, 5, 2, 8)""")
    val viaDf = graft.operators.Pq.ivfadcTopKFromStore(spark, path, emb,
      Seq(3L, 41L, 77L), nprobe = 2, kShort = 20, k = 5, m = 2, dim = 8)
    assert(sortedRows(viaSql) == sortedRows(viaDf),
      "graft_ivfadc_topk: the SQL surface and the DataFrame serve diverge")
  }
}
