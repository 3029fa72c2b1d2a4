package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** End-to-end validator lifecycle over a stream of rounds (SURVEY §3.1):
  * scatter → transform(+corruption) → score → keyed EMA state. */
class ValidatorRoundSpec extends AnyFunSuite with SparkTest {

  test("corrupted peer's EMA decays; honest peers stay at 1.0") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val steps = MemoryStream[java.lang.Long]
    val scored = ValidatorLoop.validatorRounds(steps.toDS(), nPeers = 4,
      corruptUids = Set(3L))
    val q = ValidatorLoop.emaUpdates(scored, alpha = 0.9).writeStream
      .format("memory").queryName("vr_out").outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-vr-").toString)
      .start()
    steps.addData(1L, 2L); q.processAllAvailable()
    steps.addData(3L); q.processAllAvailable()
    val rows = spark.table("vr_out")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.struct("n", "ema")).as("m"))
      .selectExpr("user_id", "m.n AS n", "m.ema AS ema")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    q.stop()
    assert(rows(0L) == (3L, 1.0) && rows(1L) == (3L, 1.0) && rows(2L) == (3L, 1.0))
    assert(rows(3L)._2 == 0.0) // corrupted every round: EMA of constant 0
  }

  test("runPipeline: full loop emits L1 weights on the sink cadence") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val steps = MemoryStream[java.lang.Long]
    val sunk = scala.collection.mutable.ArrayBuffer.empty[(Long, Map[Long, Double])]
    val q = ValidatorLoop.runPipeline(steps.toDS(), nPeers = 3,
      corruptUids = Set(2L), alpha = 0.9,
      java.nio.file.Files.createTempDirectory("graft-vp-").toString) { (df, id) =>
      sunk += id -> df.collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("weight")).toMap
    }
    steps.addData(1L); q.processAllAvailable() // batch 0: no sink
    steps.addData(2L); q.processAllAvailable() // batch 1: sink
    q.stop()
    assert(sunk.map(_._1) == Seq(1L))
    val weights = sunk.head._2
    // peers 0,1 honest (score 1 → weight 1/2 each); peer 2 corrupted → 0
    assert(weights(0L) == 0.5 && weights(1L) == 0.5 && weights(2L) == 0.0)
  }
}
