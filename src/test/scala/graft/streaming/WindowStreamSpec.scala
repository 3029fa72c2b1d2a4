package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.queries.Hygiene.dsum

/** Top-level so Spark can derive its encoder (an inner class would
  * capture the suite's scope). */
final case class WinEv(ts: Timestamp, event_type: String, value: Double)

/** Streaming twin of y46's sliding windows — the one batch shape whose
  * twin is PURELY built-in Structured Streaming: a watermarked
  * `groupBy(window(ts, 2d, 1d), type)` aggregate in Append mode emits
  * each (window, type) cell exactly once, after the watermark passes
  * the window END — finalized, never revised. The spec pins stream ≡
  * batch over out-of-order in-grace delivery, with the same exact
  * DECIMAL value sums (the Hygiene discipline survives the stateful
  * aggregation path too). */
class WindowStreamSpec extends AnyFunSuite with SparkTest {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-window-stream-").toString

  private def ev(daySec: Long, tpe: String, v: Double) =
    WinEv(new Timestamp(daySec * 1000), tpe, v)

  private val Day = 86400L
  private val all = Seq(
    ev(Day / 2, "view", 1.25), ev(Day + 100, "view", 2.5),
    ev(Day + 200, "click", 0.75), ev(2 * Day + 50, "view", 4.0))

  test("streaming sliding windows == batch y46 shape over out-of-order delivery") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[WinEv]
    val agg = input.toDS()
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "2 days", "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), 2).as("sum_value"))
      .select(unix_micros(col("window.start")).as("w_start_us"),
        col("event_type"), col("n_events"), col("sum_value"))
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("append").option("checkpointLocation", tmpDir()).start()
    try {
      // out of order but in-grace: day-1 events arrive before day-0's
      input.addData(ev(Day + 100, "view", 2.5))
      q.processAllAvailable()
      input.addData(ev(Day / 2, "view", 1.25), ev(Day + 200, "click", 0.75))
      q.processAllAvailable()
      input.addData(ev(2 * Day + 50, "view", 4.0))
      q.processAllAvailable()
      input.addData(ev(30 * Day, "drain", 0.0)) // push wm past all windows
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("win_out")
      .filter(col("event_type") =!= "drain")
      .collect().map(_.toString).sorted.toSeq
    val batch = all.toDF()
      .groupBy(window(col("ts"), "2 days", "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), 2).as("sum_value"))
      .select(unix_micros(col("window.start")).as("w_start_us"),
        col("event_type"), col("n_events"), col("sum_value"))
      .collect().map(_.toString).sorted.toSeq
    assert(got == batch,
      s"stream windows\n$got\nmust equal batch windows\n$batch")
    // every event lands in exactly two sliding windows
    assert(batch.size >= 4)
    // exactly-once: no duplicate (window, type) cells
    assert(got.size == got.toSet.size)
  }
}
