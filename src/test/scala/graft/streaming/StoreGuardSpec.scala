package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** The round-12 store-lifecycle hardening, pinned behavior by behavior:
  * the two-phase stale-lock takeover (ADVICE r11 medium — a bare
  * delete-then-create takeover let two compactors both hold the mutex),
  * GC never eating the held lock or the owner record (ADVICE r11 low),
  * junk layout names degrading to findings instead of exceptions,
  * configurable generation retention (VERDICT r11 #4), snapshot reads
  * pinned at a committed generation (VERDICT r11 #8), and the
  * checkpoint-identity guard (VERDICT r11 #3). */
class StoreGuardSpec extends AnyFunSuite with SparkTest {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def writeRows(dir: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    ids.toDF("doc_id").write.mode("overwrite").parquet(dir)
  }

  private def readIds(dir: String): Seq[Long] =
    spark.read.parquet(dir).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq

  private def touch(dir: String, name: String, content: String = ""): Unit = {
    val f = new java.io.File(dir, name)
    java.nio.file.Files.writeString(f.toPath, content)
    ()
  }

  private def compactTo(store: String, ids: Seq[Long],
                        staleLockMs: Long = 24L * 3600 * 1000,
                        keepGens: Int = 1,
                        keepAgeMs: Long = 0L): Unit =
    StoreFs.swapInCompacted(spark, store, staleLockMs, keepGens, keepAgeMs)(
      writeRows(_, ids))

  // ---- lock takeover (ADVICE r11, medium) ----------------------------

  test("a young compaction lock refuses a second compactor") {
    val store = tmpDir("graft-lock-young-") + "/s"
    writeRows(store, Seq(1L))
    touch(store, StoreFs.LockName, "live-holder")
    val e = intercept[IllegalStateException](compactTo(store, Seq(1L)))
    assert(e.getMessage.contains("another compaction holds"))
    // the live holder's lock is untouched
    assert(new java.io.File(store, StoreFs.LockName).exists())
  }

  test("a stale lock is taken over through the takeover lock, then both locks are released") {
    val store = tmpDir("graft-lock-stale-") + "/s"
    writeRows(store, Seq(1L, 2L))
    touch(store, StoreFs.LockName, "crashed-holder")
    assert(new java.io.File(store, StoreFs.LockName)
      .setLastModified(System.currentTimeMillis() - 100000L))
    compactTo(store, Seq(1L, 2L), staleLockMs = 10000L)
    assert(readIds(StoreFs.dataDir(spark, store)) == Seq(1L, 2L))
    assert(!new java.io.File(store, StoreFs.LockName).exists(),
      "the lock must be released on the successful exit path")
    assert(!new java.io.File(store, StoreFs.TakeoverName).exists(),
      "the takeover lock must be released after the takeover completes")
  }

  test("a takeover already in flight refuses a second takeover contender") {
    val store = tmpDir("graft-lock-takeover-") + "/s"
    writeRows(store, Seq(1L))
    touch(store, StoreFs.LockName, "crashed-holder")
    assert(new java.io.File(store, StoreFs.LockName)
      .setLastModified(System.currentTimeMillis() - 100000L))
    touch(store, StoreFs.TakeoverName, "racing-takeover")
    val e = intercept[IllegalStateException](
      compactTo(store, Seq(1L), staleLockMs = 10000L))
    assert(e.getMessage.contains("takeover"))
    // the in-flight takeover's lock is NOT stolen
    assert(new java.io.File(store, StoreFs.TakeoverName).exists())
  }

  test("a young lock never triggers a takeover attempt") {
    val store = tmpDir("graft-lock-replaced-") + "/s"
    writeRows(store, Seq(1L))
    touch(store, StoreFs.LockName, "holder")
    intercept[IllegalStateException](compactTo(store, Seq(1L)))
    assert(!new java.io.File(store, StoreFs.TakeoverName).exists(),
      "no takeover file may be created when the lock is young")
  }

  // ---- GC exclusions (ADVICE r11, low) -------------------------------

  test("generation GC never deletes the held lock, the takeover lock, or the owner record") {
    val store = tmpDir("graft-gc-excl-") + "/s"
    writeRows(store, Seq(1L))          // flat generation-0 data
    StoreFs.adoptStore(spark, store, "ckpt-A")
    compactTo(store, Seq(1L))          // live = 1: flat files in grace
    compactTo(store, Seq(1L))          // live = 2: flat remnants reclaimed
    // the flat data is gone, but the protected names survive — before
    // this fix the flat-remnant clause deleted the compactor's own held
    // lock mid-run, letting a second compactor acquire before return
    val names = new java.io.File(store).listFiles().map(_.getName).toSet
    assert(!names.exists(_.endsWith(".parquet")),
      "flat generation-0 data must be reclaimed")
    assert(names.contains(StoreFs.OwnerName),
      "the owner record must survive every flip")
    assert(StoreFs.ownerOf(spark, store).contains("ckpt-A"))
    // the compaction above already proves the lock survives its own
    // GC (the release at exit found it present); pin the exclusion
    // directly at the GC unit level too:
    val (fs, p) = StoreFs.fsPath(spark, store)
    touch(store, StoreFs.LockName, "held")
    touch(store, StoreFs.TakeoverName, "inflight")
    touch(store, "stray-file.txt", "junk")
    StoreFs.gcGenerations(fs, p, live = 2L, keepGens = 1)
    val after = new java.io.File(store).listFiles().map(_.getName).toSet
    assert(after.contains(StoreFs.LockName), "GC must not eat the held lock")
    assert(after.contains(StoreFs.TakeoverName),
      "GC must not eat an in-flight takeover lock")
    assert(after.contains(StoreFs.OwnerName), "GC must not eat the owner")
    assert(!after.contains("stray-file.txt"),
      "ordinary flat remnants are still reclaimed")
  }

  test("junk layout names never crash resolution, GC, or compaction") {
    val store = tmpDir("graft-junk-names-") + "/s"
    writeRows(store, Seq(1L, 2L))
    touch(store, "_graft_commit_tmp", "editor backup")
    touch(store, "_graft_batch_tmp", "crashed tool")
    assert(new java.io.File(store, "_gen-junk").mkdirs())
    assert(StoreFs.dataDir(spark, store) == store,
      "junk commit markers must not resolve to a generation")
    compactTo(store, Seq(1L, 2L))
    assert(readIds(StoreFs.dataDir(spark, store)) == Seq(1L, 2L))
  }

  // ---- configurable retention (VERDICT r11 #4) -----------------------

  test("keepGens=2: a reader spanning two compaction cadences keeps its generation") {
    val store = tmpDir("graft-retention-") + "/s"
    writeRows(store, Seq(1L, 2L))
    compactTo(store, Seq(1L, 2L), keepGens = 2)            // live = 1
    val gen1 = StoreFs.dataDir(spark, store)
    assert(gen1.endsWith("_gen-00000001"))
    val slowReader = spark.read.parquet(gen1).select("doc_id")
    compactTo(store, Seq(1L, 2L, 3L), keepGens = 2)        // live = 2
    compactTo(store, Seq(1L, 2L, 3L, 4L), keepGens = 2)    // live = 3
    // under the default grace (keepGens = 1) generation 1 would be gone
    // by now; the widened retention keeps it a full extra cadence
    assert(new java.io.File(store, "_gen-00000001").exists(),
      "generation 1 must survive two cadences under keepGens = 2")
    assert(slowReader.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L),
      "the slow reader must complete against its pinned generation")
    compactTo(store, Seq(1L, 2L, 3L, 4L, 5L), keepGens = 2) // live = 4
    assert(!new java.io.File(store, "_gen-00000001").exists(),
      "generation 1's widened grace expires at live = 4")
    assert(new java.io.File(store, "_gen-00000002").exists())
    assert(readIds(StoreFs.dataDir(spark, store)) == (1L to 5L))
  }

  test("keepAgeMs: the age floor keeps a generation that count-based grace alone would expire") {
    val hour = 3600L * 1000
    val store = tmpDir("graft-age-retention-") + "/s"
    writeRows(store, Seq(1L, 2L))
    // three compactions in quick succession — the backfill/re-run burst
    // that cycles count-based grace in minutes (VERDICT r12 #6)
    compactTo(store, Seq(1L, 2L), keepAgeMs = hour)             // live 1
    compactTo(store, Seq(1L, 2L, 3L), keepAgeMs = hour)         // live 2
    compactTo(store, Seq(1L, 2L, 3L, 4L), keepAgeMs = hour)     // live 3
    // under keepGens = 1 alone, generation 1 is reclaimed at live = 3;
    // its supersession (commit 2) is seconds old, so the age floor
    // keeps it — a reader inside the 1 h SLA cannot lose its files
    assert(new java.io.File(store, "_gen-00000001").exists(),
      "a generation superseded seconds ago must survive the age floor")
    assert(readIds(s"$store/_gen-00000001") == Seq(1L, 2L))
    // age out generation 1 (its supersession = commit 2's mtime) while
    // generation 2's supersession (commit 3) stays young
    assert(new java.io.File(store, "_graft_commit_2")
      .setLastModified(System.currentTimeMillis() - 2 * hour))
    compactTo(store, Seq(1L, 2L, 3L, 4L, 5L), keepAgeMs = hour) // live 4
    assert(!new java.io.File(store, "_gen-00000001").exists(),
      "past the SLA the count-expired generation is reclaimed")
    assert(new java.io.File(store, "_gen-00000002").exists(),
      "a young supersession still holds its generation past the count floor")
    assert(readIds(StoreFs.dataDir(spark, store)) == (1L to 5L))
  }

  // ---- snapshot reads (VERDICT r11 #8) -------------------------------

  test("dataDirAt pins a committed generation across later compactions") {
    val store = tmpDir("graft-snapshot-") + "/s"
    writeRows(store, Seq(1L, 2L))
    assert(StoreFs.dataDirAt(spark, store, 0L) == store,
      "generation 0 of a flat store is the root")
    compactTo(store, Seq(1L, 2L), keepGens = 2)             // gen 1
    compactTo(store, Seq(1L, 2L, 3L), keepGens = 2)         // gen 2
    assert(StoreFs.committedGenerations(spark, store) == Seq(1L, 2L))
    // generations are immutable: the pinned read answers AS OF its flip
    assert(readIds(StoreFs.dataDirAt(spark, store, 1L)) == Seq(1L, 2L))
    assert(readIds(StoreFs.dataDirAt(spark, store, 2L)) == Seq(1L, 2L, 3L))
    assert(StoreFs.dataDirAt(spark, store, 2L) ==
      StoreFs.dataDir(spark, store))
    // asking for a never-committed or GC'd generation is an ERROR, not
    // silently wrong data
    val never = intercept[IllegalStateException](
      StoreFs.dataDirAt(spark, store, 9L))
    assert(never.getMessage.contains("never committed"))
    // generation 0 is superseded but its flat files are still inside
    // their grace window (live = 2, keepGens = 2) — a pinned gen-0
    // reader keeps access exactly like a pinned committed generation
    assert(StoreFs.dataDirAt(spark, store, 0L) == store)
    assert(readIds(store) == Seq(1L, 2L))
    compactTo(store, Seq(1L, 2L, 3L, 4L), keepGens = 1)     // gen 3, GC to 2
    val flatGone = intercept[IllegalStateException](
      StoreFs.dataDirAt(spark, store, 0L))
    assert(flatGone.getMessage.contains("compacted away"))
    compactTo(store, Seq(1L, 2L, 3L, 4L), keepGens = 1)     // gen 4, GC to 3
    val gone = intercept[IllegalStateException](
      StoreFs.dataDirAt(spark, store, 1L))
    assert(gone.getMessage.contains("GC'd"))
  }

  // ---- checkpoint-identity guard (VERDICT r11 #3) --------------------

  test("claimOwner: first claim records; re-claim no-ops; mismatch fails fast") {
    val store = tmpDir("graft-owner-") + "/s"
    StoreFs.claimOwner(spark, store, "ckpt-A")
    assert(StoreFs.ownerOf(spark, store).contains("ckpt-A"))
    StoreFs.claimOwner(spark, store, "ckpt-A") // restart of the same stream
    val e = intercept[IllegalStateException](
      StoreFs.claimOwner(spark, store, "ckpt-B"))
    assert(e.getMessage.contains("owned by checkpoint 'ckpt-A'"))
    // the escape hatch re-homes explicitly
    StoreFs.adoptStore(spark, store, "ckpt-B")
    StoreFs.claimOwner(spark, store, "ckpt-B")
    assert(StoreFs.ownerOf(spark, store).contains("ckpt-B"))
  }

  test("claimOwner refuses a first claim on a store with prior ingest state") {
    import spark.implicits._
    val store = tmpDir("graft-owner-sealed-") + "/s"
    // a pre-guard store: batch-tagged rows sealed with no owner record
    Seq((1L, 0L), (2L, 1L)).toDF("doc_id", "batch_id")
      .write.mode("overwrite").parquet(store)
    StoreFs.sealTagMarkers(spark, store)
    val e = intercept[IllegalStateException](
      StoreFs.claimOwner(spark, store, "ckpt-new"))
    assert(e.getMessage.contains("sealed through 1"))
    assert(e.getMessage.contains("adopt"))
    // markers alone (no seal) refuse the same way
    val store2 = tmpDir("graft-owner-marked-") + "/s"
    writeRows(store2, Seq(1L))
    StoreFs.writeMarker(spark, store2, 0L)
    val e2 = intercept[IllegalStateException](
      StoreFs.claimOwner(spark, store2, "ckpt-new"))
    assert(e2.getMessage.contains("replay markers"))
  }

  test("autoAdopt migration: a consistent checkpoint adopts; fresh or lagging ones still refuse") {
    import spark.implicits._
    // a pre-guard store sealed through batch 1 — the ADVICE r12 medium:
    // without a migration path, even the store's OWN stream restarting
    // with its ORIGINAL checkpoint hard-fails after the guard upgrade
    val store = tmpDir("graft-owner-migrate-") + "/s"
    Seq((1L, 0L), (2L, 1L)).toDF("doc_id", "batch_id")
      .write.mode("overwrite").parquet(store)
    StoreFs.sealTagMarkers(spark, store)
    // the store's original checkpoint: committed through batch 1
    val ckpt = tmpDir("graft-owner-migrate-ckpt-")
    assert(new java.io.File(ckpt, "commits").mkdirs())
    touch(s"$ckpt/commits", "0", "v1")
    touch(s"$ckpt/commits", "1", "v1")
    assert(StoreFs.checkpointFrontier(spark, ckpt).contains(1L))
    // default (opt-in off): adoption stays an explicit operator step
    val e0 = intercept[IllegalStateException](
      StoreFs.claimOwner(spark, store, ckpt))
    assert(e0.getMessage.contains("autoAdopt"))
    try {
      spark.conf.set("spark.graft.store.autoAdopt", "true")
      // a FRESH checkpoint (no commits) is the actual hazard the guard
      // exists for — auto-adopt must never wave it through
      val fresh = tmpDir("graft-owner-migrate-fresh-")
      val e1 = intercept[IllegalStateException](
        StoreFs.claimOwner(spark, store, fresh))
      assert(e1.getMessage.contains("does not cover"))
      // a LAGGING checkpoint (frontier 0 < seal 1) refuses the same way
      val lag = tmpDir("graft-owner-migrate-lag-")
      assert(new java.io.File(lag, "commits").mkdirs())
      touch(s"$lag/commits", "0", "v1")
      val e2 = intercept[IllegalStateException](
        StoreFs.claimOwner(spark, store, lag))
      assert(e2.getMessage.contains("does not cover"))
      assert(StoreFs.ownerOf(spark, store).isEmpty,
        "a refused auto-adopt must not record any owner")
      // the consistent original checkpoint adopts and proceeds
      StoreFs.claimOwner(spark, store, ckpt)
      assert(StoreFs.ownerOf(spark, store).contains(ckpt))
      // subsequent claims are the ordinary owned fast path
      StoreFs.claimOwner(spark, store, ckpt)
    } finally spark.conf.unset("spark.graft.store.autoAdopt")
  }

  test("an empty owner record (claim crashed mid-write) is refused with the adopt remediation") {
    val store = tmpDir("graft-owner-empty-") + "/s"
    StoreFs.claimOwner(spark, store, "ckpt-A")
    java.nio.file.Files.writeString(
      new java.io.File(store, StoreFs.OwnerName).toPath, "")
    val e = intercept[IllegalStateException](
      StoreFs.claimOwner(spark, store, "ckpt-A"))
    assert(e.getMessage.contains("empty owner record"))
    assert(e.getMessage.contains("adoptStore"))
  }

  test("subdir-layout stores (vec/PQ) claim their owner at the MARKER root") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // the silent-loss scenario the review caught: vec-store markers
    // live at $path/vecs — an owner recorded anywhere else would let a
    // fresh checkpoint's first claim succeed against a marked store
    val path = tmpDir("graft-owner-vec-")
    graft.operators.ExactIvf.writeVecStore(
      (0L until 40L).map(i => (i, (0 until 4).map(j =>
        ((i * 31 + j * 17) % 201) - 100L).toArray)).toDF("doc_id", "vec"),
      path, nCells = 2, iters = 1)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Long])]
    val ckptA = tmpDir("graft-owner-vec-ckptA-")
    val q = VecIngest.run(input.toDF().toDF("doc_id", "vec"), path, ckptA)()
    try {
      input.addData((100L, Seq(1L, 2L, 3L, 4L)))
      q.processAllAvailable()
    } finally q.stop()
    assert(StoreFs.ownerOf(spark, s"$path/vecs").contains(ckptA),
      "the owner must be recorded at the marker root ($path/vecs)")
    val e = intercept[IllegalStateException] {
      VecIngest.run(input.toDF().toDF("doc_id", "vec"), path,
        tmpDir("graft-owner-vec-ckptB-"))()
    }
    assert(e.getMessage.contains("owned by checkpoint"))
  }

  test("a fresh-checkpoint stream pointed at an owned store errors at start, not silently") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val store = tmpDir("graft-owner-stream-") + "/sigs"
    val ckptA = tmpDir("graft-owner-ckptA-")
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = IncrementalDedup.run(
      input.toDF().toDF("doc_id", "text"), store, 0.5, ckptA)()
    try {
      input.addData((1L,
        "the quick brown fox jumps over the lazy dog again and again"))
      q.processAllAvailable()
    } finally q.stop()
    assert(StoreFs.ownerOf(spark, store).contains(ckptA))
    // the silent-data-loss mode this guard converts into an error: a
    // FRESH checkpoint restarts batch ids at 0, and id 0's marker is
    // already in the store — before the guard its batches would no-op
    val e = intercept[IllegalStateException] {
      IncrementalDedup.run(
        input.toDF().toDF("doc_id", "text"), store, 0.5,
        tmpDir("graft-owner-ckptB-"))()
    }
    assert(e.getMessage.contains("owned by checkpoint"))
    // a RESTART of the owning stream (same checkpoint) is the normal
    // path and still works
    val q2 = IncrementalDedup.run(
      input.toDF().toDF("doc_id", "text"), store, 0.5, ckptA)()
    try {
      input.addData((2L,
        "an entirely different document about spark physical plans"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.read.parquet(StoreFs.dataDir(spark, store))
      .select("doc_id").distinct().count() == 2L)
  }
}
