package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** Streaming semantic dedup (the x81 cadence as a stream): each
  * micro-batch dedups within itself (bootstrap) or against the frozen
  * code store, then appends its survivors' codes so the NEXT batch sees
  * them. Pins the three load-bearing invariants: store growth across
  * batches, the mask frozen from the BOOTSTRAP's full-batch count, and
  * replay-idempotent `kept` decisions in the append-before-marker crash
  * window (the self-match exclusion in semanticDedupFromStore). */
class SemanticDedupStreamSpec extends AnyFunSuite with SparkTest {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val Dim = 8
  // orthogonal directions: cos = 0 between distinct ones (never τ-close),
  // cos = 1 between copies (always τ-close) — verdicts depend only on
  // which direction each vector repeats, not on LSH cell layout
  private def axis(i: Int): Array[Float] =
    Array.tabulate(Dim)(j => if (j == i) 1f else 0f)

  test("micro-batches dedup against the growing code store") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val store = tmpDir("graft-semstream-") + "/codes"
    val input = MemoryStream[(Long, Array[Float])]
    val decisions = scala.collection.mutable.Map.empty[Long, (Long, Boolean)]
    // targetOcc = 4 with ≤ 4-vector batches ⇒ autoBits = 0: one cell, so
    // the flow under test is pure store-vs-batch τ logic
    val q = SemanticDedupStream.run(
      input.toDF().toDF("vec_id", "embedding"), store, targetOcc = 4,
      maxBits = 8, dim = Dim, checkpoint = tmpDir("graft-semstream-ckpt-")) {
      (dec, _) =>
        dec.collect().foreach(r =>
          decisions(r.getLong(0)) = (r.getLong(2), r.getBoolean(3)))
    }
    try {
      // batch 0 (bootstrap): 3 is a copy of 1 → dropped in-batch
      input.addData((1L, axis(0)), (2L, axis(1)), (3L, axis(0)))
      q.processAllAvailable()
      assert(decisions.toMap ==
        Map(1L -> ((0L, true)), 2L -> ((0L, true)), 3L -> ((1L, false))))
      // batch 1: 11 duplicates STORED 1 → dropped; 12 is fresh → kept
      decisions.clear()
      input.addData((11L, axis(0)), (12L, axis(2)))
      q.processAllAvailable()
      assert(decisions.toMap == Map(11L -> ((1L, false)), 12L -> ((0L, true))))
      // batch 2: 21 duplicates batch-1 SURVIVOR 12 — proves the store
      // grew with batch 1's kept codes; 22 is fresh → kept
      decisions.clear()
      input.addData((21L, axis(2)), (22L, axis(3)))
      q.processAllAvailable()
      assert(decisions.toMap == Map(21L -> ((1L, false)), 22L -> ((0L, true))))
    } finally q.stop()
    // store holds exactly the kept vectors' codes, under ONE frozen mask
    val stored = spark.read.parquet(store)
    assert(stored.select("vec_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 12L, 22L))
    assert(stored.select("nbits").distinct().count() == 1)
  }

  test("bootstrap freezes the mask from the FULL batch count, not survivors") {
    import spark.implicits._
    // targetOcc = 1: full count 3 ⇒ autoBits = 2; survivor count 2 ⇒
    // autoBits = 1 — the straddled boundary. The store must freeze 2,
    // the mask the bootstrap's emitted decisions were computed under.
    val store = tmpDir("graft-semboot-") + "/codes"
    val batch = Seq((1L, axis(0)), (2L, axis(1)), (3L, axis(0)))
      .toDF("vec_id", "embedding")
    var cells = Map.empty[Long, Int]
    SemanticDedupStream.processBatch(batch, 0L, store, targetOcc = 1,
      maxBits = 8, dim = Dim, (dec, _) =>
        cells = dec.filter(col("kept")).collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap)
    val stored = spark.read.parquet(store)
      .select("vec_id", "cell", "nbits").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(stored.keySet == Set(1L, 2L))
    stored.foreach { case (id, (cell, nbits)) =>
      assert(nbits == 2, s"store must freeze the full-batch mask (vec $id)")
      assert(cell == cells(id),
        s"store cell must equal the emitted bootstrap decision (vec $id)")
    }
  }

  test("code-store compaction preserves decisions, the frozen mask, and the row set") {
    import spark.implicits._
    import graft.operators.Quantization
    val store = tmpDir("graft-semcompact-") + "/codes"
    // two appended batches → multi-file store layout
    SemanticDedupStream.processBatch(
      Seq((1L, axis(0)), (2L, axis(1))).toDF("vec_id", "embedding"),
      0L, store, 4, 8, Dim, (_, _) => ())
    SemanticDedupStream.processBatch(
      Seq((11L, axis(2))).toDF("vec_id", "embedding"),
      1L, store, 4, 8, Dim, (_, _) => ())
    val probe = Seq((21L, axis(0)), (22L, axis(2)), (23L, axis(3)))
      .toDF("vec_id", "embedding")
    def decide(): Map[Long, Boolean] =
      Quantization.semanticDedupFromStore(probe,
        spark.read.parquet(graft.streaming.StoreFs.dataDir(spark, store)), 8, Dim)
        .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val before = decide()
    assert(before == Map(21L -> false, 22L -> false, 23L -> true))
    val nbitsBefore = spark.read.parquet(store).select("nbits")
      .distinct().collect().map(_.getInt(0)).toSeq
    Quantization.compactCodeStore(spark, store)
    assert(decide() == before, "compaction must not change any decision")
    val stored = spark.read.parquet(graft.streaming.StoreFs.dataDir(spark, store))
    assert(stored.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 11L), "compaction must preserve the row set")
    assert(stored.select("nbits").distinct().collect().map(_.getInt(0)).toSeq ==
      nbitsBefore, "compaction must not touch the frozen mask")
    // the cadence continues across a compaction: the next batch dedups
    // against the compacted store and appends its survivors under the
    // same frozen mask
    var dec2 = Map.empty[Long, Boolean]
    SemanticDedupStream.processBatch(
      Seq((31L, axis(2)), (32L, axis(3))).toDF("vec_id", "embedding"),
      2L, store, 4, 8, Dim, (dec, _) =>
        dec2 = dec.collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap)
    assert(dec2 == Map(31L -> false, 32L -> true))
    assert(spark.read
      .parquet(graft.streaming.StoreFs.dataDir(spark, store))
      .select("vec_id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 11L, 32L))
  }

  test("replayed batch in the append-before-marker crash window keeps decisions") {
    import spark.implicits._
    val store = tmpDir("graft-semreplay-") + "/codes"
    val b0 = Seq((1L, axis(0)), (2L, axis(1))).toDF("vec_id", "embedding")
    SemanticDedupStream.processBatch(b0, 0L, store, 4, 8, Dim, (_, _) => ())
    val b1 = Seq((11L, axis(0)), (12L, axis(2))).toDF("vec_id", "embedding")
    var first = Map.empty[Long, Boolean]
    SemanticDedupStream.processBatch(b1, 1L, store, 4, 8, Dim, (dec, _) =>
      first = dec.collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap)
    assert(first == Map(11L -> false, 12L -> true))
    // marker present ⇒ replay is a no-op (no double append)
    val n1 = spark.read.parquet(store).count()
    SemanticDedupStream.processBatch(b1, 1L, store, 4, 8, Dim, (_, _) => ())
    assert(spark.read.parquet(store).count() == n1)
    // crash window: append landed but the marker write was lost — the
    // replay re-decides against a store that already holds 12's codes.
    // Without the self-match exclusion 12 would τ-match its own stored
    // copy (cos = 1) and flip to kept = false, silently dropping the
    // batch downstream; decisions must be idempotent instead.
    assert(new java.io.File(store, "_graft_batch_1").delete())
    var replay = Map.empty[Long, Boolean]
    SemanticDedupStream.processBatch(b1, 1L, store, 4, 8, Dim, (dec, _) =>
      replay = dec.collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap)
    assert(replay == first, "crash-window replay must not flip any decision")
    // ...and the anti-join append must not duplicate 12's stored codes —
    // future batches would double-witness it in n_close otherwise
    val ids = spark.read.parquet(store).select("vec_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.size == ids.distinct.size,
      s"crash-window replay duplicated store rows: $ids")
    assert(spark.read.parquet(store).count() == n1)
  }
}
