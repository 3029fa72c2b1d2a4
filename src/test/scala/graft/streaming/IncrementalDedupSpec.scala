package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** Streaming signature-store dedup (the x41 cadence as a stream): each
  * micro-batch dedups in-batch, then against the store, then appends its
  * survivors' signatures so the NEXT batch sees them. */
class IncrementalDedupSpec extends AnyFunSuite with SparkTest {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val A = "spark rocks " * 10
  private val B = "totally different corpus words here now " * 5
  private val C = "novel third document body entirely fresh " * 5
  private val D = "fourth unique payload nothing shared at all " * 5

  test("micro-batches dedup against the growing signature store") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val store = tmpDir("graft-stream-store-") + "/sigs"
    val input = MemoryStream[(Long, String)]
    val decisions = scala.collection.mutable.Map.empty[Long, Int]
    val q = IncrementalDedup.run(
      input.toDF().toDF("doc_id", "text"), store, estThreshold = 0.5,
      checkpoint = tmpDir("graft-stream-ckpt-")) { (dec, _) =>
      dec.collect().foreach(r => decisions(r.getLong(0)) = r.getInt(1))
    }
    try {
      // batch 1: A and B — no store yet, both kept
      input.addData((1L, A), (2L, B))
      q.processAllAvailable()
      assert(decisions.toMap == Map(1L -> 0, 2L -> 0))
      // batch 2: dup-of-store (A), fresh C, in-batch dup pair (D, D):
      // 11 dropped vs store; 12 kept; 13 kept, 14 dropped vs 13 in-batch
      decisions.clear()
      input.addData((11L, A), (12L, C), (13L, D), (14L, D))
      q.processAllAvailable()
      assert(decisions.toMap == Map(11L -> 1, 12L -> 0, 13L -> 0, 14L -> 1))
      // batch 3: dup of batch-2 SURVIVORS (C and D) — proves the store
      // grew with batch 2's kept docs; fresh doc still passes
      decisions.clear()
      input.addData((21L, C), (22L, D), (23L, "genuinely new final text " * 5))
      q.processAllAvailable()
      assert(decisions.toMap == Map(21L -> 1, 22L -> 1, 23L -> 0))
    } finally q.stop()
    // store holds exactly the kept docs' signatures
    val stored = spark.read.parquet(store).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(stored == Set(1L, 2L, 12L, 13L, 23L))
  }

  test("closure mode: one survivor per cluster, store members always win") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val store = tmpDir("graft-closure-store-") + "/sigs"
    val input = MemoryStream[(Long, String)]
    val decisions = scala.collection.mutable.Map.empty[Long, Int]
    val q = IncrementalDedup.run(
      input.toDF().toDF("doc_id", "text"), store, estThreshold = 0.5,
      checkpoint = tmpDir("graft-closure-ckpt-"), closure = true) { (dec, _) =>
      dec.collect().foreach(r => decisions(r.getLong(0)) = r.getInt(1))
    }
    try {
      // batch 1 (no store yet): in-batch CLOSURE — the {1,2,3} dup
      // cluster keeps exactly its minimum; 4 is fresh
      input.addData((1L, A), (2L, A), (3L, A), (4L, B))
      q.processAllAvailable()
      assert(decisions.toMap == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 0))
      // batch 2 vs store: doc 0 duplicates store doc 1 — the STORE member
      // wins even though 0 < 1 (old docs are already in the corpus; a
      // smallest-id-global policy would wrongly evict the stored doc)
      decisions.clear()
      input.addData((0L, A), (10L, C))
      q.processAllAvailable()
      assert(decisions.toMap == Map(0L -> 1, 10L -> 0))
    } finally q.stop()
    val stored = spark.read.parquet(store).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(stored == Set(1L, 4L, 10L))
  }

  test("checkpoint-replayed batch is not appended twice") {
    import spark.implicits._
    val store = tmpDir("graft-replay-store-") + "/sigs"
    val batch = Seq((1L, A), (2L, B)).toDF("doc_id", "text")
    IncrementalDedup.processBatch(batch, 7L, store, 0.5, (_, _) => ())
    val n1 = spark.read.parquet(store).count()
    IncrementalDedup.processBatch(batch, 7L, store, 0.5, (_, _) => ()) // replay
    assert(spark.read.parquet(store).count() == n1)
  }

  test("signature-store compaction preserves every decision and the row set") {
    import spark.implicits._
    import graft.operators.Dedup
    val store = tmpDir("graft-compact-store-") + "/sigs"
    // two appended batches → multi-file store layout
    IncrementalDedup.processBatch(Seq((1L, A), (2L, B)).toDF("doc_id", "text"),
      0L, store, 0.5, (_, _) => ())
    IncrementalDedup.processBatch(Seq((11L, C)).toDF("doc_id", "text"),
      1L, store, 0.5, (_, _) => ())
    val probe = Seq((21L, A), (22L, C), (23L, D)).toDF("doc_id", "text")
    def decide(): Map[Long, Int] =
      Dedup.incrementalDropDecisionsFromStore(probe,
        spark.read.parquet(graft.streaming.StoreFs.dataDir(spark, store)), 0.5)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val before = decide()
    assert(before == Map(21L -> 1, 22L -> 1, 23L -> 0))
    Dedup.compactSignatureStore(spark, store)
    assert(decide() == before, "compaction must not change any decision")
    val ids = spark.read.parquet(graft.streaming.StoreFs.dataDir(spark, store)).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.sorted == Seq(1L, 2L, 11L), "compaction must preserve the row set")
    // the cadence continues across a compaction: the next batch still
    // dedups against the compacted store and appends its survivors
    var dec2 = Map.empty[Long, Int]
    IncrementalDedup.processBatch(Seq((31L, C), (32L, D)).toDF("doc_id", "text"),
      2L, store, 0.5, (dec, _) =>
        dec2 = dec.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap)
    assert(dec2 == Map(31L -> 1, 32L -> 0))
    assert(spark.read.parquet(graft.streaming.StoreFs.dataDir(spark, store)).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 11L, 32L))
  }

  test("crash-window replay (marker lost) keeps decisions and does not bloat the store") {
    import spark.implicits._
    val store = tmpDir("graft-crash-store-") + "/sigs"
    IncrementalDedup.processBatch(Seq((1L, A), (2L, B)).toDF("doc_id", "text"),
      0L, store, 0.5, (_, _) => ())
    val b1 = Seq((11L, C)).toDF("doc_id", "text")
    var first = Map.empty[Long, Int]
    IncrementalDedup.processBatch(b1, 1L, store, 0.5, (dec, _) =>
      first = dec.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap)
    assert(first == Map(11L -> 0), "fresh doc must be kept")
    val n1 = spark.read.parquet(store).count()
    // the append landed but the marker write was lost — the replay
    // probes a store holding the batch's OWN signatures. Without the
    // self-exclusion in incrementalDropDecisionsFromStore every kept
    // doc would band-match itself at est = 1 and silently flip to
    // dropped; and the anti-join append must skip already-stored rows.
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(new org.apache.hadoop.fs.Path(store, "_graft_batch_1"), false))
    var replay = Map.empty[Long, Int]
    IncrementalDedup.processBatch(b1, 1L, store, 0.5, (dec, _) =>
      replay = dec.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap)
    assert(replay == first, s"crash-window replay flipped decisions: $replay vs $first")
    val ids = spark.read.parquet(store).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.size == ids.distinct.size, s"duplicated signature rows: $ids")
    assert(spark.read.parquet(store).count() == n1)
  }
}
