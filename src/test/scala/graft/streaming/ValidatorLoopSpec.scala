package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** Streaming semantics tests (SURVEY §5.2): keyed EMA state across
  * micro-batches, watermark windows, in-watermark dedup, and the
  * every-2-batches sink cadence (R8/R10). */
class ValidatorLoopSpec extends AnyFunSuite with SparkTest {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-stream-").toString

  test("flatMapGroupsWithState EMA across micro-batches == one-shot fold") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val alpha = 0.9
    val input = MemoryStream[ValidatorLoop.Obs]
    val q = ValidatorLoop.emaUpdates(input.toDS(), alpha).writeStream
      .format("memory").queryName("ema_out").outputMode("update")
      .option("checkpointLocation", tmpDir()).start()
    // three micro-batches for one key, values 1,2 | 3 | 4
    input.addData(ValidatorLoop.Obs(1, 10, 1, 1.0), ValidatorLoop.Obs(1, 20, 2, 2.0))
    q.processAllAvailable()
    input.addData(ValidatorLoop.Obs(1, 30, 3, 3.0))
    q.processAllAvailable()
    input.addData(ValidatorLoop.Obs(1, 40, 4, 4.0))
    q.processAllAvailable()
    val rows = spark.table("ema_out").orderBy("n").collect()
    q.stop()
    val expect = Seq(1.0, 2.0, 3.0, 4.0)
      .tail.foldLeft(1.0)((s, x) => alpha * s + (1 - alpha) * x)
    assert(rows.last.getAs[Double]("ema") === expect)
    assert(rows.last.getAs[Long]("n") === 4L)
    assert(rows.length == 3) // one update per micro-batch
  }

  test("transformWithState EMA (RocksDB ValueState) matches the fold") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val alpha = 0.9
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    var q: Option[org.apache.spark.sql.streaming.StreamingQuery] = None
    try {
      val input = MemoryStream[ValidatorLoop.Obs]
      val query = ValidatorLoop.emaUpdatesTws(input.toDS(), alpha).writeStream
        .format("memory").queryName("ema_tws_out").outputMode("update")
        .option("checkpointLocation", tmpDir()).start()
      q = Some(query)
      input.addData(ValidatorLoop.Obs(1, 10, 1, 1.0), ValidatorLoop.Obs(1, 20, 2, 2.0))
      query.processAllAvailable()
      input.addData(ValidatorLoop.Obs(1, 30, 3, 3.0))
      query.processAllAvailable()
      val rows = spark.table("ema_tws_out").orderBy("n").collect()
      val expect = Seq(1.0, 2.0, 3.0)
        .tail.foldLeft(1.0)((s, x) => alpha * s + (1 - alpha) * x)
      assert(rows.last.getAs[Double]("ema") === expect)
      assert(rows.last.getAs[Long]("n") === 3L)
    } finally {
      q.foreach(_.stop())
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("seeded EMA state (init=1.0) replays the reference trajectory") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val alpha = 0.9
    val input = MemoryStream[ValidatorLoop.Obs]
    val q = ValidatorLoop.emaUpdates(input.toDS(), alpha, init = Some(1.0))
      .writeStream
      .format("memory").queryName("ema_seeded_out").outputMode("update")
      .option("checkpointLocation", tmpDir()).start()
    input.addData(ValidatorLoop.Obs(1, 10, 1, 1.0), ValidatorLoop.Obs(1, 20, 2, 2.0))
    q.processAllAvailable()
    input.addData(ValidatorLoop.Obs(1, 30, 3, 3.0))
    q.processAllAvailable()
    val rows = spark.table("ema_seeded_out").orderBy("n").collect()
    q.stop()
    // the reference fold: scores start at 1.0, every observation folds in
    // (/root/reference/neurons/validator.py:110,146)
    val expect = Seq(1.0, 2.0, 3.0).foldLeft(1.0)((s, x) => alpha * s + (1 - alpha) * x)
    assert(rows.last.getAs[Double]("ema") === expect)
    assert(rows.last.getAs[Long]("n") === 3L)
  }

  test("watermarked tumbling window counts") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val q = ValidatorLoop.windowedCounts(df, "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("win_out").outputMode("update")
      .option("checkpointLocation", tmpDir()).start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    input.addData((t(1), "click", 1.0), (t(4), "click", 2.0), (t(12), "view", 5.0))
    q.processAllAvailable()
    val rows = spark.table("win_out")
      .select(col("window.start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("start").collect()
    q.stop()
    assert(rows.length == 2)
    assert(rows(0).getLong(2) == 2 && rows(0).getDouble(3) == 3.0)
    assert(rows(1).getString(1) == "view")
  }

  test("dropDuplicatesWithinWatermark removes in-horizon duplicates") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = input.toDF().toDF("event_id", "ts", "value")
    val q = ValidatorLoop.dedupedStream(df, "1 hour")
      .writeStream.format("memory").queryName("dedup_out").outputMode("append")
      .option("checkpointLocation", tmpDir()).start()
    val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    input.addData((1L, ts, 1.0), (1L, ts, 1.0), (2L, ts, 2.0))
    q.processAllAvailable()
    input.addData((1L, ts, 1.0), (3L, ts, 3.0)) // replay of id 1 within horizon
    q.processAllAvailable()
    val n = spark.table("dedup_out").count()
    q.stop()
    assert(n == 3) // ids 1,2,3 exactly once
  }

  test("EMA state survives a checkpoint restart (log-and-continue policy)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val alpha = 0.9
    val ckpt = tmpDir()
    val input = MemoryStream[ValidatorLoop.Obs]
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double)]()
    def start() = ValidatorLoop.emaUpdates(input.toDS(), alpha).writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[ValidatorLoop.EmaUpdate], _: Long) =>
        batch.collect().foreach(u => seen.add(u.n -> u.ema)); ()
      }.start()
    val q1 = start()
    input.addData(ValidatorLoop.Obs(7, 10, 1, 1.0), ValidatorLoop.Obs(7, 20, 2, 2.0))
    q1.processAllAvailable()
    q1.stop() // simulated failure/restart
    val q2 = start()
    input.addData(ValidatorLoop.Obs(7, 30, 3, 3.0))
    q2.processAllAvailable()
    q2.stop()
    val expect = Seq(1.0, 2.0, 3.0).tail.foldLeft(1.0)((s, x) => alpha * s + (1 - alpha) * x)
    import scala.jdk.CollectionConverters._
    val last = seen.asScala.maxBy(_._1)
    assert(last._1 == 3L)
    assert(last._2 == expect) // state restored across restart, fold continued
  }

  test("session windows close after the gap + watermark") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val df = input.toDF().toDF("ts", "user_id", "value")
    val sessioned = df.withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val q = sessioned.writeStream.format("memory").queryName("sess_out")
      .outputMode("append")
      .option("checkpointLocation", tmpDir()).start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // user 1: events at 10:00,10:02 (one session), then 10:20 (new session)
    input.addData((t(0), 1L, 1.0), (t(2), 1L, 1.0))
    q.processAllAvailable()
    input.addData((t(20), 1L, 1.0))
    q.processAllAvailable()
    input.addData((t(40), 1L, 1.0)) // advances watermark, closes 10:20 session
    q.processAllAvailable()
    val rows = spark.table("sess_out")
      .select(col("session_window.start").cast("string").as("start"), col("n"))
      .orderBy("start").collect()
    q.stop()
    assert(rows.length >= 2)
    assert(rows(0).getLong(1) == 2) // 10:00+10:02 merged into one session
    assert(rows(1).getLong(1) == 1)
  }

  test("stream-static dimension join (R11 peer-registry-refresh analogue)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val peers = Seq((1L, "alice", 10.0), (2L, "bob", 5.0)).toDF("uid", "peer_key", "stake")
    val input = MemoryStream[(Long, Double)]
    val joined = input.toDF().toDF("uid", "resp")
      .join(peers, "uid") // static side re-read per micro-batch
      .select(col("uid"), col("peer_key"), (col("resp") * col("stake")).as("weighted"))
    val q = joined.writeStream.format("memory").queryName("ss_join_out")
      .outputMode("append").option("checkpointLocation", tmpDir()).start()
    input.addData((1L, 2.0), (2L, 3.0), (99L, 1.0)) // 99 = unregistered → dropped
    q.processAllAvailable()
    val rows = spark.table("ss_join_out").orderBy("uid").collect()
    q.stop()
    assert(rows.map(_.getString(1)).toSeq == Seq("alice", "bob"))
    assert(rows.map(_.getDouble(2)).toSeq == Seq(20.0, 15.0))
  }

  test("sliding windows assign events to overlapping frames") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    val slid = input.toDF().toDF("ts", "value")
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = slid.writeStream.format("memory").queryName("slide_out")
      .outputMode("update").option("checkpointLocation", tmpDir()).start()
    input.addData((java.sql.Timestamp.valueOf("2024-01-01 10:07:00"), 1.0))
    q.processAllAvailable()
    val starts = spark.table("slide_out")
      .select(col("window.start").cast("string").as("s")).orderBy("s")
      .collect().map(_.getString(0))
    q.stop()
    // one event at 10:07 → windows [10:00,10:10) and [10:05,10:15)
    assert(starts.toSeq == Seq("2024-01-01 10:00:00", "2024-01-01 10:05:00"))
  }

  test("weight sink fires only on odd batchIds and L1-normalizes (R9/R10)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val sunk = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val q = ValidatorLoop.weightSink(
      input.toDF().toDF("user_id", "score"), tmpDir()) { (df, batchId) =>
      sunk += batchId -> df.agg(sum("weight")).first().getDouble(0)
    }
    input.addData((1L, 2.0), (2L, 2.0)); q.processAllAvailable() // batch 0: no sink
    input.addData((1L, 3.0), (2L, 1.0)); q.processAllAvailable() // batch 1: sink
    input.addData((1L, 5.0)); q.processAllAvailable()            // batch 2: no sink
    q.stop()
    assert(sunk.map(_._1).toSeq == Seq(1L)) // every-2nd-round cadence
    assert(math.abs(sunk.head._2 - 1.0) < 1e-12) // weights sum to 1
  }
}
