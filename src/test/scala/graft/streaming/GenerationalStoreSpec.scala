package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.operators.Dedup

/** The generation-pointer store layout (VERDICT r10 #1): a compaction
  * must never leave a window in which a concurrent serving read fails —
  * the old rename-in-place swap had a store-absent gap between its two
  * renames (and renames are copy+delete on S3, stretching that gap to
  * minutes at 100 TB store sizes). The generational contract: the
  * compactor writes the next `_gen-<N>` directory FULLY, flips it live
  * with ONE atomic commit-marker creation, and the previous generation
  * survives a full further compaction cadence as the in-flight
  * readers' grace window. */
class GenerationalStoreSpec extends AnyFunSuite with SparkTest {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val A = "the quick brown fox jumps over the lazy dog again and again"
  private val B = "an entirely different document about spark physical plans"
  private val C = "a third text on parquet row group statistics and pruning"

  private def ls(dir: String): Seq[String] =
    Option(new java.io.File(dir).listFiles()).toSeq.flatten.map(_.getName)

  private def ids(dir: String): Seq[Long] =
    spark.read.parquet(dir).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq

  test("a read in flight across a compaction never fails and keeps its generation's answer") {
    import spark.implicits._
    val store = tmpDir("graft-gen-inflight-") + "/sigs"
    IncrementalDedup.processBatch(
      Seq((1L, A), (2L, B)).toDF("doc_id", "text"), 0L, store, 0.5,
      (_, _) => ())
    IncrementalDedup.processBatch(
      Seq((3L, C)).toDF("doc_id", "text"), 1L, store, 0.5, (_, _) => ())
    // an in-flight reader: resolves the live generation (still the flat
    // root) and pins its file listing BEFORE the compaction flips
    val inFlight = spark.read
      .parquet(StoreFs.dataDir(spark, store)).select("doc_id")
    Dedup.compactSignatureStore(spark, store)
    // the race the old swap lost: the reader's files must still exist
    assert(inFlight.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L),
      "an in-flight read across the flip must complete with its generation's rows")
    // a fresh reader resolves the new generation — answer parity
    assert(ids(StoreFs.dataDir(spark, store)) == Seq(1L, 2L, 3L))
    // layout: one committed generation, flip marker at the root
    assert(ls(store).contains("_gen-00000001"))
    assert(ls(store).contains("_graft_commit_1"))
  }

  test("grace policy: the previous generation survives exactly one further compaction") {
    import spark.implicits._
    val store = tmpDir("graft-gen-grace-") + "/sigs"
    IncrementalDedup.processBatch(
      Seq((1L, A), (2L, B)).toDF("doc_id", "text"), 0L, store, 0.5,
      (_, _) => ())
    // compaction 1: flat ("generation 0") files stay for in-flight reads
    Dedup.compactSignatureStore(spark, store)
    assert(ls(store).exists(_.endsWith(".parquet")),
      "generation-0 flat files must survive their grace window")
    // a reader that resolved generation 1 before compaction 2 flips
    val gen1 = StoreFs.dataDir(spark, store)
    assert(gen1.endsWith("_gen-00000001"))
    val inFlight = spark.read.parquet(gen1).select("doc_id")
    // compaction 2: flat remnants reclaimed, generation 1 kept as grace
    Dedup.compactSignatureStore(spark, store)
    assert(!ls(store).exists(_.endsWith(".parquet")),
      "generation-0 flat files must be reclaimed once generation 2 commits")
    assert(ls(store).contains("_gen-00000001"))
    assert(ls(store).contains("_gen-00000002"))
    assert(inFlight.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // compaction 3: generation 1's grace expires
    Dedup.compactSignatureStore(spark, store)
    assert(!ls(store).contains("_gen-00000001"))
    assert(!ls(store).contains("_graft_commit_1"))
    assert(ls(store).contains("_gen-00000002"), "grace for the previous generation")
    assert(ids(StoreFs.dataDir(spark, store)) == Seq(1L, 2L),
      "answers must be invariant across every flip")
  }

  test("a crashed compaction's uncommitted generation is invisible and reclaimed") {
    import spark.implicits._
    val store = tmpDir("graft-gen-crash-") + "/sigs"
    IncrementalDedup.processBatch(
      Seq((1L, A), (2L, B)).toDF("doc_id", "text"), 0L, store, 0.5,
      (_, _) => ())
    // simulate a compactor that died mid-write: a partial generation
    // directory with NO commit marker
    val stale = new java.io.File(store, "_gen-00000001")
    assert(stale.mkdirs())
    java.nio.file.Files.writeString(
      new java.io.File(stale, "part-junk.parquet").toPath, "not parquet")
    // readers never see it
    assert(StoreFs.dataDir(spark, store) == store,
      "an uncommitted generation must be invisible to readers")
    // ... and the ingest cadence keeps working against the flat root
    IncrementalDedup.processBatch(
      Seq((3L, C)).toDF("doc_id", "text"), 1L, store, 0.5, (_, _) => ())
    // the next compaction reclaims the carcass and commits cleanly
    Dedup.compactSignatureStore(spark, store)
    assert(ids(StoreFs.dataDir(spark, store)) == Seq(1L, 2L, 3L))
    assert(ls(store).contains("_graft_commit_1"))
  }

  test("a genuinely CONCURRENT reader hammering the store never fails across append+compact cycles") {
    import spark.implicits._
    // the interleaved tests above pin a listing and then flip; this one
    // runs a real racing thread — resolve-pointer → read → assert, in a
    // tight loop — while the main thread appends and compacts
    // repeatedly. The contract under test: no read ever throws
    // (FILE_NOT_EXIST was the old swap's failure mode) and every read
    // sees at least its resolve-time docs (generations are immutable
    // once committed; appends only add).
    val store = tmpDir("graft-gen-race-") + "/sigs"
    IncrementalDedup.processBatch(
      Seq((1L, A), (2L, B)).toDF("doc_id", "text"), 0L, store, 0.5,
      (_, _) => ())
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val reader = new Thread(() => {
      while (!stop.get() && failure.get() == null) {
        try {
          val n = spark.read.parquet(StoreFs.dataDir(spark, store))
            .select("doc_id").distinct().count()
          if (n < 2) throw new AssertionError(s"read saw only $n docs")
          reads.incrementAndGet()
        } catch { case t: Throwable => failure.set(t) }
      }
    }, "graft-race-reader")
    reader.start()
    try {
      // four genuinely distinct texts — a near-dup would (correctly) be
      // dropped by the dedup gate and never reach the store
      val texts = Seq(C,
        "orchestration of executor memory fractions under adaptive plans",
        "watermark semantics for late arriving events in session windows",
        "columnar shredding of nested structs into leaf streams")
      for (i <- 1 to 4) {
        IncrementalDedup.processBatch(
          Seq((2L + i, texts(i - 1))).toDF("doc_id", "text"),
          i.toLong, store, 0.5, (_, _) => ())
        Dedup.compactSignatureStore(spark, store)
      }
    } finally { stop.set(true); reader.join(30000) }
    assert(failure.get() == null,
      s"a concurrent read failed during the compaction cycles: ${failure.get()}")
    assert(reads.get() > 0, "the racing reader must have completed reads")
    assert(ids(StoreFs.dataDir(spark, store)) == (1L to 6L).toSeq)
  }

  test("replay markers and the seal ride the flip; appends land in the live generation") {
    import spark.implicits._
    val store = tmpDir("graft-gen-markers-") + "/sigs"
    IncrementalDedup.processBatch(
      Seq((1L, A), (2L, B)).toDF("doc_id", "text"), 0L, store, 0.5,
      (_, _) => ())
    Dedup.compactSignatureStore(spark, store)
    // the signature store is doc-keyed (no batch tags → no seal): the
    // per-batch marker itself must ride into generation 1 and resolve
    // through the generation pointer
    assert(StoreFs.markerExists(spark, store, 0L),
      "the replay marker must resolve through the generation pointer")
    val gen1 = StoreFs.dataDir(spark, store)
    assert(ls(gen1).contains("_graft_batch_0"))
    // a post-flip append lands INSIDE the live generation, not the root
    IncrementalDedup.processBatch(
      Seq((3L, C)).toDF("doc_id", "text"), 1L, store, 0.5, (_, _) => ())
    assert(ids(gen1) == Seq(1L, 2L, 3L),
      "appends must land in the live generation")
    assert(StoreFs.markerExists(spark, store, 1L))
  }
}
