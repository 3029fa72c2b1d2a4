package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** The bounded-directory cell layout (VERDICT r12 #1): partitioning a
  * cell-laid store by raw `ivf_cell` keeps O(nCells) directories — at
  * SemDeDup-scale cell counts the FileIndex listing and tiny-file
  * opens dominate the serve wall. The bucketed layout partitions by
  * `cell_bucket = ivf_cell % nBuckets` (cell id stays a data column,
  * files sorted by it), DPP prunes on the bucket, and the cell-level
  * join drops co-bucketed strangers. These specs pin: answers
  * IDENTICAL to the legacy layout across write/append/compact, the
  * directory cap, the DPP pin moving to the bucket column, the
  * ingest-side DPP prune (VERDICT r12 #8), and the geometry manifest
  * (VERDICT r12 #9) with its fail-fast validation. */
class BucketedLayoutSpec extends AnyFunSuite with SparkTest {

  private val Dim = 8

  private def vecFixture(n: Int) = {
    import spark.implicits._
    (0L until n).map { i =>
      val v = (0 until Dim).map { j =>
        ((i * 31 + j * 17) % 201) - 100L
      }.toArray
      (i, v)
    }.toDF("doc_id", "vec")
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def partDirs(dir: String): Seq[String] =
    Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(_.isDirectory).map(_.getName).filterNot(_.startsWith("_"))

  test("bucketed exact-IVF store: identical answers, bounded directories, DPP on the bucket") {
    val vecs = vecFixture(240)
    val legacy = java.nio.file.Files
      .createTempDirectory("graft-bucket-legacy-").toString
    val bucketed = java.nio.file.Files
      .createTempDirectory("graft-bucket-new-").toString
    ExactIvf.writeVecStore(vecs, legacy, nCells = 12, iters = 1,
      nBuckets = 0)
    ExactIvf.writeVecStore(vecs, bucketed, nCells = 12, iters = 1,
      nBuckets = 4)
    // the layout cap: 12 cells land in at most 4 bucket directories
    assert(partDirs(s"$legacy/vecs").size == 12,
      s"legacy layout is one directory per cell: ${partDirs(s"$legacy/vecs")}")
    val bdirs = partDirs(s"$bucketed/vecs")
    assert(bdirs.size <= 4 && bdirs.forall(_.startsWith("cell_bucket=")),
      s"bucketed layout must cap directories at nBuckets: $bdirs")
    // geometry manifest records the layout
    assert(graft.streaming.StoreFs.readGeometry(spark, bucketed)
      .get("n_buckets").contains("4"))
    val queries = (0L until 5L).map(q => (q, q * 40L + 7L))
    val fromLegacy = rows(ExactIvf.topDotBatchFromStore(
      spark, legacy, queries, k = 10, nprobe0 = 3))
    val served = ExactIvf.topDotBatchFromStore(
      spark, bucketed, queries, k = 10, nprobe0 = 3)
    assert(rows(served) == fromLegacy,
      "the bucketed layout must serve byte-identical answers")
    // the DPP pin moves to the bucket column; no literal list survives
    val p = served.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruningexpression"),
      s"bucket pruning must be DPP:\n$p")
    assert("PartitionFilters: \\[[^\\]]*cell_bucket".r.findFirstIn(p).isDefined,
      s"the partition filter must target cell_bucket:\n$p")
    assert("(ivf_cell|cell_bucket)#\\d+L? (IN \\(|INSET)".r.findFirstIn(p).isEmpty,
      s"no literal cell/bucket list may survive in the plan:\n$p")
  }

  test("bucketed store: append under frozen cells + compact preserve answers and layout") {
    val vecs = vecFixture(240)
    val grown = java.nio.file.Files
      .createTempDirectory("graft-bucket-incr-").toString
    val full = java.nio.file.Files
      .createTempDirectory("graft-bucket-full-").toString
    ExactIvf.writeVecStore(vecs.filter(col("doc_id") % 10 < 8), grown,
      nCells = 12, iters = 1, nBuckets = 4)
    ExactIvf.appendToVecStore(spark,
      vecs.filter(col("doc_id") % 10 >= 8), grown, batchId = Some(1L))
    // a replay of the same batch is a no-op (marker fast path), and a
    // re-ingest of visible ids drops in the anti-join
    ExactIvf.appendToVecStore(spark,
      vecs.filter(col("doc_id") % 10 >= 8), grown, batchId = Some(1L))
    ExactIvf.writeVecStore(vecs, full, nCells = 12, iters = 1,
      nBuckets = 4)
    val queries = (0L until 5L).map(q => (q, q * 40L + 7L))
    // exactness is clustering-independent (the Cauchy–Schwarz
    // guarantee), so the grown store and the full rebuild must agree
    // row-for-row even though their coarse cells differ
    val wantFull = rows(ExactIvf.topDotBatchFromStore(
      spark, full, queries, k = 10, nprobe0 = 3))
    assert(rows(ExactIvf.topDotBatchFromStore(
      spark, grown, queries, k = 10, nprobe0 = 3)) == wantFull)
    // compaction folds the generations and PRESERVES the bucket layout
    ExactIvf.compactVecStore(spark, grown)
    val gen = graft.streaming.StoreFs.dataDir(spark, s"$grown/vecs")
    val dirs = partDirs(gen)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("cell_bucket=")),
      s"compaction must preserve the bucketed layout: $dirs")
    assert(rows(ExactIvf.topDotBatchFromStore(
      spark, grown, queries, k = 10, nprobe0 = 3)) == wantFull,
      "compaction must not change served answers")
  }

  test("ingest-side prune is DPP too: the visible-side plan carries no cell literal") {
    val vecs = vecFixture(240)
    val path = java.nio.file.Files
      .createTempDirectory("graft-bucket-ingestdpp-").toString
    ExactIvf.writeVecStore(vecs, path, nCells = 12, iters = 1,
      nBuckets = 4)
    val visible = spark.read.parquet(
      graft.streaming.StoreFs.dataDir(spark, s"$path/vecs"))
    // real cell ids (trainCoarse cell ids are SAMPLED vec_ids, not
    // 0..nCells−1 — the spec must not assume dense numbering)
    val cellsTable = spark.read.parquet(
      graft.streaming.StoreFs.dataDir(spark, s"$path/cells"))
    val allCells = cellsTable.select("ivf_cell").collect()
      .map(_.getLong(0)).sorted.toSeq
    val chosen = allCells.take(3)
    // the batch's cells as a DISTRIBUTED frame (the call-site shape:
    // a projection of the cached residual frame) — a driver-built
    // LocalRelation would fold the arming filter away and DPP could
    // never plant
    val batchCells = cellsTable.select("ivf_cell")
      .filter(col("ivf_cell").isInCollection(chosen))
    val pruned = ExactIvf.pruneToCells(spark, visible,
      batchCells, buckets = 4)
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruningexpression"),
      s"the ingest prune must be DPP (VERDICT r12 #8):\n$p")
    // the STORE scan must carry no literal cell/bucket list (the
    // fixture's own isin() on the cells table is the test harness, not
    // the ingest plan under pin)
    val vecScans = p.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("/vecs"))
      .toSeq
    assert(vecScans.nonEmpty, s"no vecs scan found:\n$p")
    assert(vecScans.forall(l =>
      "(ivf_cell|cell_bucket)#\\d+L? (IN \\(|INSET)".r.findFirstIn(l).isEmpty),
      s"no cell literal may survive on the store scan:\n$p")
    // and it selects exactly the chosen cells' BUCKETS' rows — the
    // documented superset semantics (co-bucketed strangers are the
    // downstream joins' job to drop)
    val chosenBuckets = chosen.map(c => (c % 4).toInt).toSet
    val expected = allCells.filter(c => chosenBuckets((c % 4).toInt)).toSet
    assert(pruned.select("ivf_cell").distinct().collect()
      .map(_.getLong(0)).toSet == expected,
      s"pruned cells must be the chosen buckets' cells ($expected)")
  }

  test("a lost geometry manifest fails an append fast instead of mixing partition layouts") {
    val vecs = vecFixture(80)
    val path = java.nio.file.Files
      .createTempDirectory("graft-bucket-lostgeo-").toString
    ExactIvf.writeVecStore(vecs.filter(col("doc_id") % 2 === 0), path,
      nCells = 4, iters = 1, nBuckets = 2)
    // simulate the manifest lost/overwritten out-of-band: the append
    // would then read "legacy" and write ivf_cell= directories beside
    // the cell_bucket= ones — partition discovery fails for every
    // reader after that (review r13); the layout guard refuses instead
    assert(new java.io.File(path,
      graft.streaming.StoreFs.GeometryName).delete())
    val e = intercept[IllegalArgumentException](
      ExactIvf.appendToVecStore(spark,
        vecs.filter(col("doc_id") % 2 === 1), path, batchId = Some(1L)))
    assert(e.getMessage.contains("layout mismatch"))
    // restoring the manifest lets the append proceed
    graft.streaming.StoreFs.writeGeometry(spark, path, Seq(
      "family" -> "exact_ivf", "n_cells" -> "4", "n_buckets" -> "2"))
    ExactIvf.appendToVecStore(spark,
      vecs.filter(col("doc_id") % 2 === 1), path, batchId = Some(1L))
    assert(spark.read.parquet(
      graft.streaming.StoreFs.dataDir(spark, s"$path/vecs"))
      .select("vec_id").distinct().count() == 80L)
  }

  test("bucketed IVFADC: identical answers to legacy; geometry validates the caller") {
    val emb = vecFixture(200).toDF("vec_id", "embedding")
    val legacy = java.nio.file.Files
      .createTempDirectory("graft-bucket-ivfadc0-").toString
    val bucketed = java.nio.file.Files
      .createTempDirectory("graft-bucket-ivfadc1-").toString
    Pq.writeIvfadcStore(emb, legacy, nCells = 6, m = 2, dim = Dim,
      nCents = 8, iters = 1, nBuckets = 0)
    Pq.writeIvfadcStore(emb, bucketed, nCells = 6, m = 2, dim = Dim,
      nCents = 8, iters = 1, nBuckets = 3)
    assert(partDirs(s"$bucketed/codes").size <= 3)
    val probes = Seq(3L, 43L, 83L)
    val want = rows(Pq.ivfadcTopKFromStore(spark, legacy, emb, probes,
      nprobe = 2, kShort = 20, k = 5, m = 2, dim = Dim))
    val served = Pq.ivfadcTopKFromStore(spark, bucketed, emb, probes,
      nprobe = 2, kShort = 20, k = 5, m = 2, dim = Dim)
    assert(rows(served) == want,
      "bucketed IVFADC must serve byte-identical answers")
    val p = served.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruningexpression") &&
      "PartitionFilters: \\[[^\\]]*cell_bucket".r.findFirstIn(p).isDefined,
      s"IVFADC bucket pruning must be DPP on cell_bucket:\n$p")
    // VERDICT r12 #9: a caller whose geometry disagrees with the build
    // fails fast naming the recorded geometry
    val e = intercept[IllegalArgumentException](
      Pq.ivfadcTopKFromStore(spark, bucketed, emb, probes,
        nprobe = 2, kShort = 20, k = 5, m = 4, dim = Dim).collect())
    assert(e.getMessage.contains("built with m=2"))
  }

  test("IVFADC grouped probe-cell selection: identical rows to the flat path, across append + compaction") {
    import spark.implicits._
    val emb = vecFixture(240).toDF("vec_id", "embedding")
    val path = java.nio.file.Files
      .createTempDirectory("graft-bucket-ivfadc-grp-").toString
    Pq.writeIvfadcStore(emb.filter(col("vec_id") < 200), path,
      nCells = 6, m = 2, dim = Dim, nCents = 8, iters = 1)
    val probes = Seq(3L, 43L, 83L, 123L)
    def serve() = rows(Pq.ivfadcTopKFromStore(spark, path, emb, probes,
      nprobe = 2, kShort = 20, k = 5, m = 2, dim = Dim))
    val flat = serve() // default floor: |probes|·nCells far below it
    spark.conf.set("spark.graft.serve.groupFloor", "1")
    try {
      assert(serve() == flat,
        "the grouped probe→cell selection must pick the identical " +
          "nprobe cells (exact top-nprobe by (L2², id) is the contract)")
      // appends under the frozen (grouped) coarse table, then compaction
      Pq.appendToIvfadcStore(spark, emb.filter(col("vec_id") >= 200),
        path, m = 2, dim = Dim, batchId = Some(1L))
      spark.conf.unset("spark.graft.serve.groupFloor")
      val flatAfter = serve()
      spark.conf.set("spark.graft.serve.groupFloor", "1")
      assert(serve() == flatAfter, "grouped == flat after append")
      Pq.compactCodesStore(spark, path)
      assert(serve() == flatAfter, "grouped == flat after compaction")
      // degenerate geometry: one cell → one group, still identical
      val p1 = java.nio.file.Files
        .createTempDirectory("graft-bucket-ivfadc-grp1-").toString
      Pq.writeIvfadcStore(emb, p1, nCells = 1, m = 2, dim = Dim,
        nCents = 4, iters = 1)
      val g1 = rows(Pq.ivfadcTopKFromStore(spark, p1, emb, probes,
        nprobe = 3, kShort = 20, k = 5, m = 2, dim = Dim))
      spark.conf.unset("spark.graft.serve.groupFloor")
      assert(rows(Pq.ivfadcTopKFromStore(spark, p1, emb, probes,
        nprobe = 3, kShort = 20, k = 5, m = 2, dim = Dim)) == g1)
    } finally spark.conf.unset("spark.graft.serve.groupFloor")
  }

  test("the 6-argument graft_ivfadc_topk form reads (m, dim, vecCol) from the manifest") {
    import spark.implicits._
    val emb = vecFixture(200).toDF("vec_id", "embedding")
    val path = java.nio.file.Files
      .createTempDirectory("graft-bucket-tvf-").toString
    Pq.writeIvfadcStore(emb, path, nCells = 4, m = 2, dim = Dim,
      nCents = 8, iters = 1)
    emb.createOrReplaceTempView("blspec_emb")
    Seq(3L, 43L).toDF("probe_id").createOrReplaceTempView("blspec_probes")
    val short = spark.sql(
      s"SELECT * FROM graft_ivfadc_topk('$path', 'blspec_emb', " +
        "'blspec_probes', 2, 20, 5)")
    val explicit = spark.sql(
      s"SELECT * FROM graft_ivfadc_topk('$path', 'blspec_emb', " +
        s"'blspec_probes', 2, 20, 5, 2, $Dim)")
    assert(rows(short) == rows(explicit),
      "the manifest-driven form must equal the explicit-geometry form")
  }
}
