package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** Streaming as-of must equal the batch operator on the same events, emit
  * nothing ahead of the watermark, and drain buffered lefts on watermark
  * advance alone (event-time timeout, no traffic on the key). */
class AsOfStreamSpec extends AnyFunSuite with SparkTest {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-asof-stream-").toString

  private def ev(uid: Long, sec: Long, id: Long, right: Boolean) =
    AsOfStream.Ev(uid, new Timestamp(sec * 1000), sec * 1000000L, id, right)

  // key 1: rights 101@10s, 102@12s (12s arrives a batch LATE — in-window
  // out-of-order); lefts 2@5s (no prior right), 1@15s, 3@30s, 4@40s.
  // key 2: right 201@8s, left 5@20s.
  private val all = Seq(
    ev(1, 10, 101, right = true), ev(1, 15, 1, right = false),
    ev(1, 5, 2, right = false), ev(1, 12, 102, right = true),
    ev(1, 30, 3, right = false), ev(1, 40, 4, right = false),
    ev(2, 8, 201, right = true), ev(2, 20, 5, right = false))

  test("stream == batch operator; watermark gates emission; timeout drains") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[AsOfStream.Ev]
    val q = AsOfStream.matches(
        input.toDS().withWatermark("ts", "10 seconds"))
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").option("checkpointLocation", tmpDir()).start()

    def results(): Map[Long, (Option[Long], Option[Long])] =
      spark.table("asof_out").collect()
        .map(r => r.getLong(1) -> (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap

    // batch 1 (+ its follow-up timeout batch: processAllAvailable runs
    // it once the watermark lands at 15s-10s=5s): ONLY 2@5s is due —
    // no prior right → outer null; 1@15s stays buffered
    input.addData(ev(1, 10, 101, right = true), ev(1, 15, 1, right = false),
      ev(1, 5, 2, right = false), ev(2, 8, 201, right = true))
    q.processAllAvailable()
    assert(results() == Map(2L -> (None, None)),
      "only lefts at-or-behind the watermark may emit")

    // batch 2: 102@12s arrives out-of-order but inside the window;
    // watermark reaches 30s-10s=20s → 1@15s matches 102 (not 101: the
    // later in-window right wins), 5@20s matches 201
    input.addData(ev(1, 12, 102, right = true), ev(1, 30, 3, right = false),
      ev(2, 20, 5, right = false))
    q.processAllAvailable()
    assert(results() == Map(2L -> (None, None),
      1L -> (Some(102L), Some(3000000L)), 5L -> (Some(201L), Some(12000000L))))

    // batch 3: watermark 40s-10s=30s → 3@30s due
    input.addData(ev(1, 40, 4, right = false))
    q.processAllAvailable()
    assert(results() == Map(2L -> (None, None),
      1L -> (Some(102L), Some(3000000L)), 5L -> (Some(201L), Some(12000000L)),
      3L -> (Some(102L), Some(18000000L))))

    // batches 4/5: dummy-key traffic only — buffered left 4@40s must
    // drain purely by watermark advance + event-time timeout
    input.addData(ev(99, 100, 999, right = true))
    q.processAllAvailable()
    input.addData(ev(99, 101, 998, right = true))
    q.processAllAvailable()
    val got = results()
    q.stop()
    assert(got == Map(
      2L -> (None, None), 1L -> (Some(102L), Some(3000000L)),
      5L -> (Some(201L), Some(12000000L)),
      3L -> (Some(102L), Some(18000000L)), 4L -> (Some(102L), Some(28000000L))))

    // parity: the batch operator on the SAME events produces the same map
    val lefts = all.filter(!_.isRight)
      .map(e => (e.user_id, e.ts, e.id)).toDF("user_id", "ts", "left_id")
    val rights = all.filter(_.isRight)
      .map(e => (e.user_id, e.ts, e.id)).toDF("user_id", "ts", "right_id")
    val batch = graft.plans.AsOf.join(lefts, rights, Seq("user_id"), "ts", "ts",
        outer = true, rightTieBreak = Seq("right_id"))
      .select(col("left_id"), col("right_id"),
        (unix_micros(col("ts")) - unix_micros(col("ts_r"))).as("gap_us"))
      .collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    assert(batch == got)
  }

  test("tolerance + inner drops out-of-bound and unmatched lefts") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[AsOfStream.Ev]
    val q = AsOfStream.matches(
        input.toDS().withWatermark("ts", "10 seconds"),
        toleranceUs = Some(5000000L), outer = false)
      .writeStream.format("memory").queryName("asof_tol_out")
      .outputMode("append").option("checkpointLocation", tmpDir()).start()
    input.addData(all: _*)
    q.processAllAvailable()
    input.addData(ev(99, 100, 999, right = true))
    q.processAllAvailable()
    input.addData(ev(99, 101, 998, right = true))
    q.processAllAvailable()
    val got = spark.table("asof_tol_out").collect()
      .map(r => r.getLong(1) -> r.get(3).asInstanceOf[Long]).toMap
    q.stop()
    // only 1@15s→102@12s (gap 3s) is within 5s; 5→201 gap 12s fails, 3/4
    // fail, 2 has no match — inner drops all of those
    assert(got == Map(1L -> 102L))
  }
}
