package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.operators.Funnels

/** Streaming funnel must equal the batch operator over the same events
  * (delivered out of order), gate every emission on the watermark, and
  * never revise an emitted step. */
class FunnelStreamSpec extends AnyFunSuite with SparkTest {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-funnel-stream-").toString

  private def ev(uid: Long, sec: Long, ty: String) =
    FunnelStream.Ev(uid, new Timestamp(sec * 1000), sec * 1000000L, ty)

  private val Steps = Seq("view", "click", "purchase")
  private val WithinUs = 100L * 1000000L // 100 s window

  // u1 completes all three steps — with the click arriving a batch LATE
  // (out of order, in-window). u2's click precedes their view (must not
  // count); u3's click lands outside the window.
  private val all = Seq(
    ev(1, 10, "view"), ev(1, 25, "click"), ev(1, 30, "purchase"),
    ev(2, 40, "click"), ev(2, 50, "view"),
    ev(3, 10, "view"), ev(3, 150, "click"))

  test("stream == batch funnel over out-of-order delivery; watermark gates") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[FunnelStream.Ev]
    val q = FunnelStream.stepReaches(
        input.toDS().withWatermark("ts", "10 seconds"), Steps, WithinUs)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").option("checkpointLocation", tmpDir()).start()

    def reached(): Set[(Long, Int, Long)] =
      spark.table("funnel_out").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(3))).toSet

    try {
      // batch 1: u1's view@10 and purchase@30 — the CLICK is missing, so
      // nothing beyond step 1 may emit even once 10/30 pass the watermark
      input.addData(ev(1, 10, "view"), ev(1, 30, "purchase"),
        ev(3, 10, "view"))
      q.processAllAvailable()
      assert(!reached().exists(_._2 > 1), s"no click yet: ${reached()}")

      // batch 2: the click@25 arrives late (strictly inside the 20 s
      // watermark's grace) — once the watermark passes 30 s the whole
      // chain finalizes
      input.addData(ev(1, 25, "click"), ev(2, 40, "click"),
        ev(2, 50, "view"), ev(3, 150, "click"))
      q.processAllAvailable()
      // push the watermark far past every event so all buffers drain
      input.addData(ev(99, 500, "view"))
      q.processAllAvailable()
    } finally q.stop()

    val got = reached()
    assert(got.contains((1L, 1, 10000000L)) &&
      got.contains((1L, 2, 25000000L)) && got.contains((1L, 3, 30000000L)),
      s"u1 must complete the funnel with exact times: $got")
    // u2: view counts (step 1), the earlier click never does; u3: click
    // outside the 100 s window
    assert(got.filter(_._1 == 2L).map(_._2) == Set(1))
    assert(got.filter(_._1 == 3L).map(_._2) == Set(1))

    // stream ≡ batch: per-step user counts match Funnels.funnel on the
    // FINALIZED events (u99's sentinel view is still ahead of the
    // watermark, so the stream — correctly — has not emitted it)
    val batchDf = all.toDF()
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("ts_us")).as("ts"))
    val batch = Funnels.funnel(batchDf, Steps, WithinUs / 1000000L)
      .collect().map(r => r.getAs[Int]("step") -> r.getAs[Long]("n_users"))
      .toMap
    val streamCounts = (1 to Steps.length).map(s =>
      s -> got.count(g => g._2 == s && g._1 != 99L).toLong).toMap
    assert(streamCounts == batch,
      s"stream $streamCounts must equal batch $batch")
  }
}
