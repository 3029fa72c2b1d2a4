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
}
