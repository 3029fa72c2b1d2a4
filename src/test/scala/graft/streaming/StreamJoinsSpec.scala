package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

final case class SsjEvent(user_id: Long, ts: Timestamp, id: Long)

/** Native stream–stream time-range join: every in-window pair, equal to
  * the batch join on the same events, across out-of-order batches. */
class StreamJoinsSpec extends AnyFunSuite with SparkTest {

  private def e(uid: Long, sec: Long, id: Long) =
    SsjEvent(uid, new Timestamp(sec * 1000), id)

  test("stream-stream prior-window join == batch join; state is engine-bounded") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val lefts = MemoryStream[SsjEvent]   // "purchases"
    val rights = MemoryStream[SsjEvent]  // "clicks"
    val windowUs = 20L * 1000000  // 20 s
    val joined = StreamJoins.priorWindowJoin(
      lefts.toDF().withWatermark("ts", "10 seconds"),
      rights.toDF().withWatermark("ts", "10 seconds"),
      "user_id", windowUs)
    val q = joined.select(col("id"), col("id_r")).writeStream
      .format("memory").queryName("ssj_out").outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ssj-").toString)
      .start()

    // key 1: rights at 5s, 12s, 30s; lefts at 15s (pairs: 5s? 15-20=-5 →
    // yes both 5,12), 31s (pairs 12? 31-20=11 → 12s,30s), key 2 no match
    rights.addData(e(1, 5, 101), e(1, 12, 102), e(2, 50, 201))
    lefts.addData(e(1, 15, 1))
    q.processAllAvailable()
    rights.addData(e(1, 30, 103))       // out-of-order vs left 31s batch
    lefts.addData(e(1, 31, 2), e(2, 8, 3))
    q.processAllAvailable()
    // flush: advance both watermarks far past everything
    rights.addData(e(99, 200, 999))
    lefts.addData(e(99, 200, 998))
    q.processAllAvailable()

    val got = spark.table("ssj_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(got == Set((1L, 101L), (1L, 102L), (2L, 102L), (2L, 103L)))

    // batch parity on the same events
    val lb = Seq(e(1, 15, 1), e(1, 31, 2), e(2, 8, 3)).toDF()
    val rb = Seq(e(1, 5, 101), e(1, 12, 102), e(1, 30, 103), e(2, 50, 201)).toDF()
    val batch = StreamJoins.priorWindowJoin(lb, rb, "user_id", windowUs)
      .select(col("id"), col("id_r")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch == got)
  }
}
