package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.operators.Funnels

/** Streaming cohort retention must equal the batch operator over the
  * same events (delivered out of order): each (cohort, offset) cell
  * emits exactly once, anchors on the user's watermark-finalized FIRST
  * event, and an emitted cell is never revised — so a downstream
  * streaming count over the cells is the live retention table. */
class RetentionStreamSpec extends AnyFunSuite with SparkTest {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-retention-stream-").toString

  private def ev(uid: Long, sec: Long) =
    RetentionStream.Ev(uid, new Timestamp(sec * 1000), sec * 1000000L)

  private val PeriodUs = 100L * 1000000L // 100 s "weeks"

  // u1: anchor at 95 s, with the ANCHOR arriving a batch late (out of
  // order, still inside the 30 s grace — the watermark after batch 1 is
  // 120 − 30 = 90): a premature fold would anchor at 120 s and shift
  // the whole cohort from 0 to 1. u2: two events inside one period →
  // one cell only.
  private val all = Seq(
    ev(1, 120), ev(1, 95), ev(1, 350),
    ev(2, 205), ev(2, 260))

  test("stream == batch retention over out-of-order delivery; cells final") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[RetentionStream.Ev]
    val q = RetentionStream.cellReaches(
        input.toDS().withWatermark("ts", "30 seconds"), PeriodUs)
      .writeStream.format("memory").queryName("retention_out")
      .outputMode("append").option("checkpointLocation", tmpDir()).start()

    def cells(): Seq[(Long, Long, Long)] =
      spark.table("retention_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    try {
      // batch 1: u1's 120 s event arrives FIRST — the true anchor (95 s)
      // is still missing, and the watermark has not passed 120 s, so
      // nothing may emit yet
      input.addData(ev(1, 120))
      q.processAllAvailable()
      assert(cells().isEmpty, s"nothing final yet: ${cells()}")

      // batch 2: the 95 s anchor arrives late but in-grace; once the
      // watermark passes both, the anchor must be 95 s — cohort 0
      input.addData(ev(1, 95), ev(2, 205))
      q.processAllAvailable()
      input.addData(ev(1, 350), ev(2, 260))
      q.processAllAvailable()
      // push the watermark far past every event so all buffers drain
      input.addData(ev(99, 2000))
      q.processAllAvailable()
    } finally q.stop()

    val got = cells().filterNot(_._1 == 99L)
    // exactly-once: no duplicate cells
    assert(got.size == got.toSet.size, s"cells must be unique: $got")
    // u1 anchors at 95 s (cohort 0): offsets 0 (95/120 s), 2 (350 s)
    assert(got.filter(_._1 == 1L).toSet ==
      Set((1L, 0L, 0L), (1L, 0L, 2L)),
      s"u1's late-arriving anchor must win: $got")
    // u2 anchors at 205 s (cohort 2): both events in offset 0
    assert(got.filter(_._1 == 2L).toSet == Set((2L, 2L, 0L)), s"$got")

    // stream ≡ batch: aggregating the emitted cells reproduces
    // Funnels.retentionCohorts over the finalized events
    val batch = Funnels.retentionCohorts(
        all.toDF().select(col("user_id"),
          timestamp_micros(col("ts_us")).as("ts")),
        periodSec = PeriodUs / 1000000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val streamAgg = got.groupBy(c => (c._2, c._3))
      .map { case (k, v) => k -> v.size.toLong }
    assert(streamAgg == batch, s"stream $streamAgg must equal batch $batch")
  }
}
