package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** The exact-IVF contract: the cell-pruned store serve returns EXACTLY
  * brute-force top-k by (dot DESC, id) — for any clustering, any probe
  * budget, ties included. Pruning is a performance lever; these specs
  * pin that it is never a correctness lever. */
class ExactIvfSpec extends AnyFunSuite with SparkTest {

  private val Dim = 8

  // deterministic integer vectors with repeats (ties) and a heavy skew:
  // ids 0..9 share one direction (one hot cell), the rest spread out
  private def fixture(n: Int) = {
    import spark.implicits._
    (0L until n).map { i =>
      val v = (0 until Dim).map { j =>
        if (i < 10) (j + 1).toLong * 100L            // identical hot docs
        else ((i * 31 + j * 17) % 201) - 100L
      }.toArray
      (i, v)
    }.toDF("doc_id", "vec")
  }

  private def brute(vecs: org.apache.spark.sql.DataFrame,
                    queries: Seq[(Long, Long)], k: Int): Seq[String] = {
    import spark.implicits._
    val qp = queries.toDF("query_id", "probe_id")
    val probes = vecs.join(qp, col("doc_id") === col("probe_id"))
      .select(col("query_id"), col("probe_id"), col("vec").as("qvec"))
    vecs.crossJoin(broadcast(probes))
      .filter(col("doc_id") =!= col("probe_id"))
      .select(col("query_id"), col("doc_id"),
        graft.functions.VectorFunctions.dotLong(col("vec"), col("qvec"))
          .as("dot"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("dot").desc, col("doc_id"))))
      .filter(col("rk") <= k)
      .select("query_id", "doc_id", "dot", "rk")
      .collect().map(_.toString).sorted.toSeq
  }

  private def served(path: String, queries: Seq[(Long, Long)], k: Int,
                     nprobe0: Int): Seq[String] =
    ExactIvf.topDotBatchFromStore(spark, path, queries, k, nprobe0)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("dot"), col("rk"))
      .collect().map(_.toString).sorted.toSeq

  test("store serve == brute force, including ties in the hot cell") {
    val vecs = fixture(300)
    val path = java.nio.file.Files
      .createTempDirectory("graft-exactivf-test-").toString
    ExactIvf.writeVecStore(vecs, path, nCells = 8, iters = 1)
    val queries = Seq((1L, 3L), (2L, 137L), (3L, 250L))
    assert(served(path, queries, k = 20, nprobe0 = 2) ==
      brute(vecs, queries, k = 20))
  }

  test("minimal phase-1 budget (nprobe0=1) still returns the exact answer") {
    val vecs = fixture(300)
    val path = java.nio.file.Files
      .createTempDirectory("graft-exactivf-np1-test-").toString
    ExactIvf.writeVecStore(vecs, path, nCells = 8, iters = 1)
    val queries = Seq((1L, 42L), (2L, 7L))
    assert(served(path, queries, k = 15, nprobe0 = 1) ==
      brute(vecs, queries, k = 15))
  }

  test("k larger than any phase-1 cell set forces the all-cells fallback, still exact") {
    val vecs = fixture(120)
    val path = java.nio.file.Files
      .createTempDirectory("graft-exactivf-deep-test-").toString
    ExactIvf.writeVecStore(vecs, path, nCells = 12, iters = 1)
    // k close to the corpus: phase 1 cannot fill k → n < k fallback
    val queries = Seq((1L, 11L))
    assert(served(path, queries, k = 110, nprobe0 = 1) ==
      brute(vecs, queries, k = 110))
  }

  test("degenerate clustering (nCells=1) degrades to a full scan, never to wrong rows") {
    val vecs = fixture(150)
    val path = java.nio.file.Files
      .createTempDirectory("graft-exactivf-one-test-").toString
    ExactIvf.writeVecStore(vecs, path, nCells = 1, iters = 1)
    val queries = Seq((1L, 5L), (2L, 100L))
    assert(served(path, queries, k = 10, nprobe0 = 3) ==
      brute(vecs, queries, k = 10))
  }

  test("the bound actually prunes on clustered data (and never costs a row)") {
    import spark.implicits._
    // four tight, well-separated clusters: the bound should eliminate
    // far clusters for a probe inside one of them
    val vecs = (0L until 400L).map { i =>
      val c = (i % 4).toInt
      val base = Array.fill(Dim)(0L)
      base(c * 2) = 10000L
      base(c * 2 + 1) = -7000L
      (i, base.zipWithIndex.map { case (v, j) =>
        v + ((i * 31 + j * 17) % 21) - 10L }) // small intra-cluster noise
    }.toDF("doc_id", "vec")
    val path = java.nio.file.Files
      .createTempDirectory("graft-exactivf-prune-test-").toString
    ExactIvf.writeVecStore(vecs, path, nCells = 8, iters = 2)
    val queries = Seq((1L, 0L), (2L, 5L), (3L, 10L))
    val stats = ExactIvf.pruneStats(spark, path, queries, k = 10, nprobe0 = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(stats.nonEmpty)
    assert(stats.map(_._2).sum < stats.map(_._1).sum,
      s"the bound should skip at least one far cluster: ${stats.toSeq}")
    // and pruning never costs a row
    assert(served(path, queries, k = 10, nprobe0 = 2) ==
      brute(vecs, queries, k = 10))
  }

  test("grouped (coarse-over-coarse) bound path: exact answers, fewer bound rows on clustered data (VERDICT r13 #1)") {
    import spark.implicits._
    // the same four tight clusters as the prune-power row, at a
    // geometry where the group level can amortize (the √nCells group
    // pass plus seed/survivor cells must undercut bounding ALL cells —
    // at a handful of cells the overhead ties, which is exactly why
    // the serve keeps the flat path below the floor)
    val vecs = (0L until 1600L).map { i =>
      val c = (i % 4).toInt
      val base = Array.fill(Dim)(0L)
      base(c * 2) = 10000L
      base(c * 2 + 1) = -7000L
      (i, base.zipWithIndex.map { case (v, j) =>
        v + ((i * 31 + j * 17) % 21) - 10L })
    }.toDF("doc_id", "vec")
    val path = java.nio.file.Files
      .createTempDirectory("graft-exactivf-group-test-").toString
    ExactIvf.writeVecStore(vecs, path, nCells = 64, iters = 2)
    val queries = Seq((1L, 0L), (2L, 5L), (3L, 10L))
    val expect = brute(vecs, queries, k = 10)
    // flat path first (16 cells is under the default floor)
    val flatStats = ExactIvf.pruneStats(spark, path, queries,
      k = 10, nprobe0 = 2).collect()
    assert(served(path, queries, k = 10, nprobe0 = 2) == expect)
    spark.conf.set("spark.graft.serve.groupFloor", "1")
    try {
      // grouped path: row-identical serve, ties/degenerate geometry
      // covered by the same brute-force oracle
      assert(served(path, queries, k = 10, nprobe0 = 2) == expect,
        "the grouped bound level must never cost a row")
      val gStats = ExactIvf.pruneStats(spark, path, queries,
        k = 10, nprobe0 = 2).collect()
      // flat bound rows = nCells per (query, probe) row; grouped =
      // √nCells group bounds + cells of seed + surviving groups only
      val flatRows = flatStats.map(_.getLong(3)).sum
      val gRows = gStats.map(_.getLong(3)).sum
      assert(gRows < flatRows,
        s"grouped bound rows ($gRows) must undercut flat ($flatRows) " +
          "on clustered data")
      // and the grouped survivors still include every true top-k cell:
      // answers above already pinned row identity
      // deep-k fallback (n < k keeps all groups AND all cells)
      assert(served(path, Seq((9L, 3L)), k = 1590, nprobe0 = 1) ==
        brute(vecs, Seq((9L, 3L)), k = 1590))
      // degenerate geometry: one cell → one group, still exact
      val p1 = java.nio.file.Files
        .createTempDirectory("graft-exactivf-group1-test-").toString
      ExactIvf.writeVecStore(vecs, p1, nCells = 1, iters = 1)
      assert(served(p1, queries, k = 10, nprobe0 = 3) ==
        brute(vecs, queries, k = 10))
    } finally spark.conf.unset("spark.graft.serve.groupFloor")
  }

  test("grouped path under append: raised r2max propagates into the group radius (no stale group bound)") {
    import spark.implicits._
    val vecs = fixture(300)
    val path = java.nio.file.Files
      .createTempDirectory("graft-exactivf-groupappend-test-").toString
    ExactIvf.writeVecStore(vecs.filter(col("doc_id") % 10 < 8), path,
      nCells = 8, iters = 1)
    // the appended rows include far-from-centroid vectors (r2max must
    // grow); group radii are derived live from the cells table, so the
    // grouped serve sees the raise with no group-store maintenance
    ExactIvf.appendToVecStore(spark,
      vecs.filter(col("doc_id") % 10 >= 8), path, batchId = Some(1L))
    spark.conf.set("spark.graft.serve.groupFloor", "1")
    try {
      val queries = Seq((1L, 3L), (2L, 289L))
      assert(served(path, queries, k = 20, nprobe0 = 2) ==
        brute(vecs, queries, k = 20),
        "the grouped serve must stay exact across appends")
      // compaction preserves the cell_group column and the answer
      ExactIvf.compactVecStore(spark, path)
      assert(served(path, queries, k = 20, nprobe0 = 2) ==
        brute(vecs, queries, k = 20))
      val cells = spark.read.parquet(
        graft.streaming.StoreFs.dataDir(spark, s"$path/cells"))
      assert(cells.columns.contains("cell_group"),
        "the group assignment must survive the cells merge")
    } finally spark.conf.unset("spark.graft.serve.groupFloor")
  }

  test("DataFrame query input: identical rows to the Seq form; the query side joins, not collects") {
    import spark.implicits._
    val vecs = fixture(300)
    val path = java.nio.file.Files
      .createTempDirectory("graft-exactivf-df-test-").toString
    ExactIvf.writeVecStore(vecs, path, nCells = 8, iters = 1)
    val queries = Seq((1L, 3L), (2L, 137L), (3L, 250L))
    // a duplicated input row must be idempotent (it would otherwise
    // duplicate the probe row and every downstream candidate)
    val dfOut = ExactIvf.topDotBatchFromStore(spark, path,
      (queries ++ Seq((1L, 3L))).toDF("query_id", "probe_id"),
      k = 20, nprobe0 = 2)
    assert(dfOut.select(col("query_id"), col("vec_id").as("doc_id"),
        col("dot"), col("rk")).collect().map(_.toString).sorted.toSeq ==
      brute(vecs, queries, k = 20))
    // the probe fetch must be a JOIN against the query frame — no
    // collected probe-id literal list in the scan (the Seq form's shape)
    val p = dfOut.queryExecution.executedPlan.toString
    assert(!p.contains("In(vec_id"),
      s"DataFrame form must not push a collected probe-id list:\n$p")
    // a probe id absent from the store still fails loudly
    val bad = Seq((9L, 999999L)).toDF("query_id", "probe_id")
    val e = intercept[IllegalArgumentException] {
      ExactIvf.topDotBatchFromStore(spark, path, bad, k = 5, nprobe0 = 2)
    }
    assert(e.getMessage.contains("absent"))
  }

  test("incremental append under frozen cells: exact serving across generations; replay heals") {
    val vecs = fixture(300)
    val path = java.nio.file.Files
      .createTempDirectory("graft-exactivf-incr-test-").toString
    ExactIvf.writeVecStore(vecs.filter(col("doc_id") % 10 < 8), path,
      nCells = 8, iters = 1)
    val batch = vecs.filter(col("doc_id") % 10 >= 8)
    ExactIvf.appendToVecStore(spark, batch, path, batchId = Some(1L))
    val queries = Seq((1L, 3L), (2L, 289L)) // probe 289 is an APPENDED row
    val expect = brute(vecs, queries, k = 20)
    assert(served(path, queries, k = 20, nprobe0 = 2) == expect,
      "the two-generation store must serve the exact full-corpus answer")
    // marker fast path, then a crash-before-marker replay: neither may
    // duplicate a vec_id (a duplicate would double-appear in top-k)
    ExactIvf.appendToVecStore(spark, batch, path, batchId = Some(1L))
    assert(served(path, queries, k = 20, nprobe0 = 2) == expect)
    new java.io.File(s"$path/vecs").listFiles()
      .filter(_.getName.startsWith("_graft_batch_")).foreach(_.delete())
    ExactIvf.appendToVecStore(spark, batch, path, batchId = Some(1L))
    assert(served(path, queries, k = 20, nprobe0 = 2) == expect,
      "crash-before-marker replay must heal, not duplicate")
    // the bound-safety order: r2max can only have grown
    val r2 = spark.read
      .parquet(graft.streaming.StoreFs.dataDir(spark, s"$path/cells"))
      .agg(org.apache.spark.sql.functions.min("r2max")).head.getLong(0)
    assert(r2 >= 0L)
  }

  test("a vec_id re-ingested in a LATER batch drops: no duplicate rows inside top-k (ADVICE r10)") {
    val vecs = fixture(240)
    val path = java.nio.file.Files
      .createTempDirectory("graft-exactivf-xbatch-test-").toString
    ExactIvf.writeVecStore(vecs.filter(col("doc_id") < 200), path,
      nCells = 8, iters = 1)
    // batch 1 appends 200..239; batch 2 re-ingests an OVERLAP
    // (220..239) plus nothing new — before the cross-batch anti-join,
    // each overlapped vec_id landed twice and served twice inside top-k
    ExactIvf.appendToVecStore(spark,
      vecs.filter(col("doc_id") >= 200), path, batchId = Some(1L))
    ExactIvf.appendToVecStore(spark,
      vecs.filter(col("doc_id") >= 220), path, batchId = Some(2L))
    val n = spark.read.parquet(s"$path/vecs")
      .select("vec_id").distinct().count()
    assert(spark.read.parquet(s"$path/vecs").count() == n,
      "every vec_id must appear exactly once across generations")
    val queries = Seq((1L, 230L), (2L, 5L))
    assert(served(path, queries, k = 25, nprobe0 = 2) ==
      brute(vecs, queries, k = 25),
      "serving must stay exact under cross-batch re-ingest")
  }

  test("a groups-table centroid owning zero cells cannot swallow an append (ADVICE r16)") {
    import spark.implicits._
    val vecs = fixture(200)
    val path = java.nio.file.Files
      .createTempDirectory("graft-exactivf-emptygroup-test-").toString
    ExactIvf.writeVecStore(vecs.filter(col("doc_id") < 190), path,
      nCells = 8, iters = 1)
    // doctor a PHANTOM group centroid that owns zero cells, placed
    // exactly on batch row 190's vector so it wins the level-1 argmin —
    // the writeAssigned reassignment can leave such a centroid for
    // real; before the cells semi-join, every batch vector nearest to
    // it silently vanished from the append while the marker committed
    val phantom = Seq((999L,
      (0 until Dim).map(j => ((190L * 31 + j * 17) % 201) - 100L).toArray))
      .toDF("cell_group", "gcvm")
    phantom.write.mode("append").parquet(s"$path/groups")
    ExactIvf.appendToVecStore(spark,
      vecs.filter(col("doc_id") >= 190), path, batchId = Some(1L))
    assert(spark.read
      .parquet(graft.streaming.StoreFs.dataDir(spark, s"$path/vecs"))
      .select("vec_id").distinct().count() == 200L,
      "every batch row must land even when a group centroid owns no cells")
    val queries = Seq((1L, 190L), (2L, 5L))
    assert(served(path, queries, k = 15, nprobe0 = 2) ==
      brute(vecs, queries, k = 15),
      "the serve must stay exact over the healed append")
  }

  test("cross-policy re-ingest: a row stored in a NON-nearest cell still dedups on append (ADVICE r16)") {
    import spark.implicits._
    // two tight clusters with one centroid each; the even ids below 10
    // (cluster-A vectors) are DELIBERATELY stored in cell B — legal
    // under the writeVecStoreAssigned contract (serve exactness never
    // depends on which cell a row lives in). A re-ingest of those ids
    // assigns them to cell A, so a visible-side prune to the BATCH's
    // cells would never see the stored copies and land duplicates the
    // serve returns twice — the r17 unpruned key-column anti-join must
    // drop them.
    val n = 60
    val raw = (0L until n).map { i =>
      val base = Array.fill(Dim)(0L)
      if (i % 2 == 0) base(0) = 1000L else base(1) = 1000L
      (i, base.zipWithIndex.map { case (v, j) =>
        v + ((i * 7 + j * 3) % 11) - 5L })
    }
    val vecs = raw.toDF("vec_id", "vm")
    val cA = Array.tabulate(Dim)(j => if (j == 0) 1000L else 0L)
    val cB = Array.tabulate(Dim)(j => if (j == 1) 1000L else 0L)
    val cents = Seq((0L, cA), (1L, cB)).toDF("ivf_cell", "ccvm")
    val assigned = vecs.withColumn("ivf_cell",
      when(col("vec_id") < 10, lit(1L))
        .otherwise(when(col("vec_id") % 2 === 0, lit(0L))
          .otherwise(lit(1L))))
    val path = java.nio.file.Files
      .createTempDirectory("graft-exactivf-xpolicy-test-").toString
    ExactIvf.writeVecStoreAssigned(spark, assigned, cents, path)
    // re-ingest ONLY the cross-policy ids (0,2,4,6,8): the whole batch
    // assigns to cell A, while every stored copy lives in cell B
    ExactIvf.appendToVecStore(spark,
      vecs.filter(col("vec_id") < 10 && col("vec_id") % 2 === 0),
      path, batchId = Some(1L), idCol = "vec_id", vecCol = "vm")
    val stored = spark.read
      .parquet(graft.streaming.StoreFs.dataDir(spark, s"$path/vecs"))
      .select("vec_id")
    assert(stored.count() == n && stored.distinct().count() == n,
      "a re-ingested id whose stored copy lives outside the batch's " +
        "cells must drop, not duplicate")
    val bruteVecs = vecs.toDF("doc_id", "vec")
    val queries = Seq((1L, 0L), (2L, 1L))
    assert(served(path, queries, k = 12, nprobe0 = 2) ==
      brute(bruteVecs, queries, k = 12))
  }

  test("compaction preserves answers, partition layout and the -1 sentinel") {
    val vecs = fixture(200)
    val path = java.nio.file.Files
      .createTempDirectory("graft-exactivf-compact-test-").toString
    ExactIvf.writeVecStore(vecs.filter(col("doc_id") % 10 < 7), path,
      nCells = 6, iters = 1)
    ExactIvf.appendToVecStore(spark,
      vecs.filter(col("doc_id") % 10 >= 7), path, batchId = Some(1L))
    val queries = Seq((1L, 11L), (2L, 197L))
    val before = served(path, queries, k = 15, nprobe0 = 2)
    ExactIvf.compactVecStore(spark, path)
    assert(served(path, queries, k = 15, nprobe0 = 2) == before,
      "compaction must not change a single answer")
    val liveVecs = graft.streaming.StoreFs.dataDir(spark, s"$path/vecs")
    val compacted = spark.read.parquet(liveVecs)
    assert(compacted.select("batch_id").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(-1L))
    assert(compacted.columns.contains("ivf_cell"),
      "the cell partition layout must survive compaction")
    // the sealed watermark rides across the flip: a replay of batch 1
    // appends nothing
    assert(java.nio.file.Files.readString(
      new java.io.File(liveVecs, "_graft_sealed").toPath).trim == "1")
    ExactIvf.appendToVecStore(spark,
      vecs.filter(col("doc_id") % 10 >= 7), path, batchId = Some(1L))
    assert(served(path, queries, k = 15, nprobe0 = 2) == before)
  }

  test("Trigger.AvailableNow drains a file backlog into the vec store then stops") {
    import spark.implicits._
    // the scheduled batch-over-stream cadence (the IndexIngest/PqIngest
    // discipline) for the exact-IVF store
    val vecs = fixture(220)
    val path = java.nio.file.Files
      .createTempDirectory("graft-exactivf-avail-test-").toString
    val stage = java.nio.file.Files
      .createTempDirectory("graft-exactivf-avail-stage-").toString
    ExactIvf.writeVecStore(vecs.filter(col("doc_id") % 10 < 6), path,
      nCells = 8, iters = 1)
    vecs.filter(col("doc_id") % 10 >= 6)
      .repartition(2).write.mode("overwrite").parquet(stage)
    val q = spark.readStream
      .schema("doc_id BIGINT, vec ARRAY<BIGINT>")
      .option("maxFilesPerTrigger", 1).parquet(stage)
      .writeStream
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-exactivf-avail-ckpt-").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.streaming.VecIngest.processBatch(batch.toDF(), id, path); ()
      }
      .start()
    assert(q.awaitTermination(120000),
      "AvailableNow must terminate after draining the backlog")
    val queries = Seq((1L, 9L), (2L, 216L))
    assert(served(path, queries, k = 15, nprobe0 = 2) ==
      brute(vecs, queries, k = 15),
      "the drained store must serve the exact full-corpus answer")
  }

  test("streaming ingest (VecIngest) grows the store; serving stays exact") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val vecs = fixture(250)
    val path = java.nio.file.Files
      .createTempDirectory("graft-exactivf-stream-test-").toString
    ExactIvf.writeVecStore(vecs.filter(col("doc_id") % 10 < 6), path,
      nCells = 8, iters = 1)
    val rest = vecs.filter(col("doc_id") % 10 >= 6)
      .as[(Long, Seq[Long])].collect()
    val (b1, b2) = rest.partition(_._1 % 10 < 8)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Long])]
    val q = graft.streaming.VecIngest.run(
      input.toDF().toDF("doc_id", "vec"), path,
      checkpoint = java.nio.file.Files
        .createTempDirectory("graft-exactivf-stream-ckpt-").toString)()
    try {
      input.addData(b1.toSeq: _*); q.processAllAvailable()
      input.addData(b2.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val queries = Seq((1L, 7L), (2L, 246L)) // probe 246 arrived by stream
    assert(served(path, queries, k = 20, nprobe0 = 2) ==
      brute(vecs, queries, k = 20),
      "the stream-grown store must serve the exact full-corpus answer")
  }
}
