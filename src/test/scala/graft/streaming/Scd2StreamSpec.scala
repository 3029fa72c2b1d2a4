package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** Streaming SCD2 must equal the batch window form (y41) over the same
  * events delivered OUT OF ORDER: change detection compares against the
  * watermark-finalized previous event in (ts, event_id) order, closed
  * intervals emit exactly once, and the change-point store reconstructs
  * the full dimension (current rows included) under a per-user lead. */
class Scd2StreamSpec extends AnyFunSuite with SparkTest {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-scd2-stream-").toString

  private def ev(uid: Long, sec: Long, id: Long, tpe: String) =
    Scd2Stream.Ev(uid, new Timestamp(sec * 1000), sec * 1000000L, id, tpe)

  // u1: view → view (no change) → click → view; the FIRST event arrives
  // a batch late (out of order, inside the 30 s grace — the watermark
  // after batch 1 is 120 − 30 = 90) — a premature fold would open the
  // dimension at 120 s. u2: same-timestamp pair delivered in REVERSED
  // id order within one batch: the batch window orders (ts, event_id),
  // so the stream's fold must too (signup before view at 205 s).
  private val all = Seq(
    ev(1, 95, 10, "view"), ev(1, 120, 11, "view"), ev(1, 200, 12, "click"),
    ev(1, 350, 13, "view"),
    ev(2, 205, 20, "signup"), ev(2, 205, 21, "view"), ev(2, 260, 22, "view"))

  // delivery schedule: out of order across batches but always inside
  // the grace window of the then-current watermark (rows below the
  // watermark are dropped by the engine's late-data filter — the same
  // contract the batch grace period gives a real pipeline)
  private val batches = Seq(
    Seq(ev(1, 120, 11, "view")),
    Seq(ev(1, 95, 10, "view"), ev(2, 205, 21, "view"),
      ev(2, 205, 20, "signup")),
    Seq(ev(1, 350, 13, "view"), ev(1, 200, 12, "click"),
      ev(2, 260, 22, "view")),
    Seq(ev(99, 2000, 999, "view"))) // drain sentinel

  private def batchDimension() = {
    import spark.implicits._
    val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    all.toDF()
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_us").as("tus"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("valid_to_us", lead(col("tus"), 1).over(w))
      .select(col("user_id"), col("event_type").as("state"),
        col("tus").as("valid_from_us"), col("valid_to_us"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
  }

  test("closed intervals: stream == batch under out-of-order delivery, exactly once") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Scd2Stream.Ev]
    val q = Scd2Stream.closedIntervals(
        input.toDS().withWatermark("ts", "30 seconds"))
      .writeStream.format("memory").queryName("scd2_iv")
      .outputMode("append").option("checkpointLocation", tmpDir()).start()
    try {
      for (b <- batches) { input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val got = spark.table("scd2_iv").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq.filterNot(_._1 == 99L)
    assert(got.size == got.toSet.size, s"intervals must be unique: $got")
    val expectClosed = batchDimension().collect {
      case (u, st, from, Some(to)) => (u, st, from, to)
    }
    assert(got.toSet == expectClosed,
      s"stream ${got.toSet} must equal batch closed intervals $expectClosed")
    // and the rows the stream must NOT emit are exactly the current ones
    assert(batchDimension().count(_._4.isEmpty) == 2,
      "fixture sanity: one open interval per user")
  }

  test("change-point store + lead window reconstructs the FULL dimension") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Scd2Stream.Ev]
    val store = tmpDir()
    val q = Scd2Stream.changes(
        input.toDS().withWatermark("ts", "30 seconds"))
      .writeStream.format("parquet").option("path", store)
      .outputMode("append").option("checkpointLocation", tmpDir()).start()
    try {
      for (b <- batches) { input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    // change_seq is the deterministic tie-break: u2's two changes share
    // valid_from_us = 205 s, and a time-only ordering would reconstruct
    // their intervals in shuffle order
    val w = Window.partitionBy("user_id").orderBy("change_seq")
    val dim = spark.read.parquet(store).filter(col("user_id") =!= 99L)
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
      .select("user_id", "state", "valid_from_us", "valid_to_us")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(dim == batchDimension(),
      s"store-reconstructed dimension $dim must equal batch ${batchDimension()}")
  }
}
