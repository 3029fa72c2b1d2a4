package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.operators.Funnels

/** The behavioral mart served from STREAM outputs must equal the batch
  * mart over the same finalized events (VERDICT r9 item 7): the three
  * stream twins (FunnelStream / RetentionStream / TransitionStream)
  * materialize per-user reach facts exactly once; `martFromReaches`
  * aggregates those compact tables into the y48 (section, k1, k2, n,
  * ratio) shape — a dashboard reads |reaches| rows, never the event
  * log. */
class MartStreamSpec extends AnyFunSuite with SparkTest {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-mart-stream-").toString

  private val Steps = Seq("view", "click", "purchase")
  private val WithinSec = 1000L
  private val PeriodSec = 100L

  private def row(uid: Long, sec: Long, id: Long, tpe: String) =
    (uid, new Timestamp(sec * 1000), sec * 1000000L, id, tpe)

  // u1 completes the funnel (view 95 → click 200 → purchase 350, all
  // inside the 1000 s window) with the anchor arriving late; u2 stalls
  // at click and spans two retention periods; u3 only views.
  private val all = Seq(
    row(1, 95, 10, "view"), row(1, 120, 11, "view"),
    row(1, 200, 12, "click"), row(1, 350, 13, "purchase"),
    row(2, 205, 20, "view"), row(2, 206, 21, "click"),
    row(2, 330, 22, "view"),
    row(3, 260, 30, "view"))

  private val batches = Seq(
    Seq(row(1, 120, 11, "view")),
    Seq(row(1, 95, 10, "view"), row(2, 205, 20, "view"),
      row(2, 206, 21, "click")),
    Seq(row(1, 350, 13, "purchase"), row(1, 200, 12, "click"),
      row(2, 330, 22, "view"), row(3, 260, 30, "view")),
    Seq(row(99, 5000, 999, "view"))) // drain sentinel

  test("stream-served mart == batch mart over the same finalized events") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val funIn = MemoryStream[FunnelStream.Ev]
    val retIn = MemoryStream[RetentionStream.Ev]
    val traIn = MemoryStream[TransitionStream.Ev]
    val qs = Seq(
      FunnelStream.stepReaches(
          funIn.toDS().withWatermark("ts", "30 seconds"), Steps,
          WithinSec * 1000000L)
        .writeStream.format("memory").queryName("mart_steps")
        .outputMode("append").option("checkpointLocation", tmpDir()).start(),
      RetentionStream.cellReaches(
          retIn.toDS().withWatermark("ts", "30 seconds"),
          PeriodSec * 1000000L)
        .writeStream.format("memory").queryName("mart_cells")
        .outputMode("append").option("checkpointLocation", tmpDir()).start(),
      TransitionStream.pairReaches(
          traIn.toDS().withWatermark("ts", "30 seconds"))
        .writeStream.format("memory").queryName("mart_pairs")
        .outputMode("append").option("checkpointLocation", tmpDir()).start())
    try {
      for (b <- batches) {
        funIn.addData(b.map(r =>
          FunnelStream.Ev(r._1, r._2, r._3, r._5)): _*)
        retIn.addData(b.map(r =>
          RetentionStream.Ev(r._1, r._2, r._3)): _*)
        traIn.addData(b.map(r =>
          TransitionStream.Ev(r._1, r._2, r._3, r._4, r._5)): _*)
        qs.foreach(_.processAllAvailable())
      }
    } finally qs.foreach(_.stop())

    val served = Funnels.martFromReaches(
        spark.table("mart_steps").filter(col("user_id") =!= 99L),
        spark.table("mart_cells").filter(col("user_id") =!= 99L),
        spark.table("mart_pairs").filter(col("user_id") =!= 99L),
        Steps)
      .collect().map(_.toString).toSeq

    val batch = Funnels.mart(
        all.toDF("user_id", "ts", "ts_us", "event_id", "event_type")
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("ts")),
        Steps, WithinSec, PeriodSec)
      .collect().map(_.toString).toSeq

    assert(served == batch,
      s"stream-served mart\n$served\nmust equal batch mart\n$batch")
    // and the fixture exercises all three sections non-trivially
    assert(batch.exists(_.contains("funnel")) &&
      batch.exists(_.contains("retention")) &&
      batch.exists(_.contains("transition")))
  }
}
