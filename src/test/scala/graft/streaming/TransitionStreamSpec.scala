package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.operators.Funnels

/** Streaming transition pairs must equal the batch operator's adjacency
  * over the same events delivered out of order, and an emitted pair is
  * never revised. */
class TransitionStreamSpec extends AnyFunSuite with SparkTest {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-trans-stream-").toString

  private def ev(uid: Long, sec: Long, id: Long, ty: String) =
    TransitionStream.Ev(uid, new Timestamp(sec * 1000),
      sec * 1000000L, id, ty)

  // u1's CLICK arrives a batch late but in-grace — a premature fold
  // would emit view→purchase, a pair the true sequence never contains.
  // u2 exercises the equal-timestamp tie-break by event_id.
  private val all = Seq(
    ev(1, 100, 1, "view"), ev(1, 130, 2, "click"), ev(1, 160, 3, "purchase"),
    ev(2, 200, 4, "view"), ev(2, 210, 6, "click"), ev(2, 210, 5, "scroll"))

  test("stream == batch transitions over out-of-order delivery") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[TransitionStream.Ev]
    val q = TransitionStream.pairReaches(
        input.toDS().withWatermark("ts", "40 seconds"))
      .writeStream.format("memory").queryName("trans_out")
      .outputMode("append").option("checkpointLocation", tmpDir()).start()

    def pairs(): Seq[(Long, String, String)] =
      spark.table("trans_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

    try {
      // batch 1: view@100 and purchase@160 — the click@130 is missing;
      // watermark after this batch is 120, so only view is final and NO
      // pair may emit (view→purchase would be wrong)
      input.addData(ev(1, 100, 1, "view"), ev(1, 160, 3, "purchase"))
      q.processAllAvailable()
      assert(pairs().isEmpty, s"no pair can be final yet: ${pairs()}")

      // batch 2: the click arrives late (130 ≥ watermark 120 — in
      // grace); u2's tie pair lands too
      input.addData(ev(1, 130, 2, "click"), ev(2, 200, 4, "view"),
        ev(2, 210, 6, "click"), ev(2, 210, 5, "scroll"))
      q.processAllAvailable()
      // drain every buffer
      input.addData(ev(99, 1000, 9, "view"))
      q.processAllAvailable()
    } finally q.stop()

    val got = pairs().filterNot(_._1 == 99L)
    assert(got.size == got.toSet.size, s"pairs must be unique here: $got")
    // u1: view→click→purchase, never view→purchase; u2: the equal-ts
    // pair orders by event_id (scroll id 5 before click id 6)
    assert(got.toSet == Set(
      (1L, "view", "click"), (1L, "click", "purchase"),
      (2L, "view", "scroll"), (2L, "scroll", "click")),
      s"stream adjacency diverged: $got")

    // stream ≡ batch: the aggregated pairs equal Funnels.transitions
    val batch = Funnels.transitions(
        all.toDF().select(col("user_id"), col("event_id"),
          timestamp_micros(col("ts_us")).as("ts"), col("event_type")))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val streamAgg = got.groupBy(p => (p._2, p._3))
      .map { case (k, v) => k -> v.size.toLong }
    assert(streamAgg == batch, s"stream $streamAgg must equal batch $batch")
  }
}
