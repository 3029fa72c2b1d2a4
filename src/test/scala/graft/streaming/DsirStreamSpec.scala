package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.operators.Curation

/** Streaming DSIR (the y03 cadence as a stream): each micro-batch scores
  * itself against the estimator over everything seen so far (prior count
  * store + its own counts), then appends its tagged counts. Pins the
  * load-bearing invariants: the store accumulates per-batch sufficient
  * statistics that sum to the full-corpus counts, batch decisions use
  * the sharpened cross-batch estimator, and the append-before-marker
  * crash window is fully replay-exact (self-exclusion + idempotent
  * append). */
class DsirStreamSpec extends AnyFunSuite with SparkTest {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val tau = 0.0
  private def isTgt = col("doc_id") % 2 === 0

  private val b0 = Seq(
    0L -> "alpha beta gamma", 1L -> "north south east",
    2L -> "alpha gamma delta", 3L -> "west north upper")
  private val b1 = Seq(
    10L -> "alpha beta delta", 11L -> "south east lower")

  test("micro-batches score against the accumulated count store") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val store = tmpDir("graft-dsirstream-") + "/counts"
    val input = MemoryStream[(Long, String)]
    val kept = scala.collection.mutable.Map.empty[Long, Boolean]
    val q = DsirStream.run(input.toDF().toDF("doc_id", "text"), isTgt,
      store, tau, checkpoint = tmpDir("graft-dsirstream-ckpt-")) {
      (dec, _) =>
        dec.collect().foreach(r =>
          kept(r.getLong(0)) = r.getAs[Boolean]("kept"))
    }
    try {
      input.addData(b0: _*)
      q.processAllAvailable()
      input.addData(b1: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(kept.keySet == (b0 ++ b1).map(_._1).toSet)
    // the stored statistics sum to the full-corpus counts exactly
    val all = (b0 ++ b1).toDF("doc_id", "text")
    val full = Curation.dsirCounts(all, isTgt).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val stored = spark.read.parquet(store)
      .groupBy("b").agg(sum("ct").as("ct"), sum("cr").as("cr")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stored == full, "store must hold the exact mergeable statistic")
    assert(spark.read.parquet(store).select("batch_id").distinct().count() == 2)
    // batch 1's decisions used the CROSS-BATCH estimator: recompute
    // against the combined counts and compare verdicts
    val expect = Curation.dsirImportanceAgainst(
        b1.toDF("doc_id", "text"), isTgt,
        Curation.dsirCounts(all, isTgt))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2).toDouble / 1e6 / r.getLong(1) >= tau)).toMap
    assert(b1.map(_._1).forall(id => kept(id) == expect(id)),
      s"stream verdicts $kept must match the combined-estimator replay $expect")
  }

  test("the append-before-marker crash window is fully replay-exact") {
    import spark.implicits._
    val store = tmpDir("graft-dsirreplay-") + "/counts"
    var first = Map.empty[Long, Boolean]
    var second = Map.empty[Long, Boolean]
    def grab(into: Map[Long, Boolean] => Unit)(dec: org.apache.spark.sql.DataFrame, id: Long): Unit =
      into(dec.collect().map(r => r.getLong(0) -> r.getAs[Boolean]("kept")).toMap)
    DsirStream.processBatch(b0.toDF("doc_id", "text"), 0L, isTgt, store, tau,
      grab(first = _))
    DsirStream.processBatch(b1.toDF("doc_id", "text"), 1L, isTgt, store, tau,
      grab(first = _))
    val firstRun = first
    val rowsAfterFirst = spark.read.parquet(store).count()
    // simulate the crash: batch 1's counts landed but its marker did not
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(new org.apache.hadoop.fs.Path(store, "_graft_batch_1"), false))
    DsirStream.processBatch(b1.toDF("doc_id", "text"), 1L, isTgt, store, tau,
      grab(second = _))
    // decisions identical (self-exclusion) AND no duplicate statistics
    // (idempotent append)
    assert(second == firstRun, s"replay flipped decisions: $second vs $firstRun")
    assert(spark.read.parquet(store).count() == rowsAfterFirst,
      "replay must not double-append the batch's counts")
  }
}
