package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.operators.Dedup

/** [[StoreAudit]] — the store fsck. Each test manufactures one of the
  * layout states the auditor classifies (healthy, orphaned commit,
  * crashed carcass, stalled GC, torn seal, half-cleaned markers, torn
  * multi-table frontier, over-reaching seal, duplicate natural keys)
  * and pins the finding level the 100 TB operator would triage by. */
class StoreAuditSpec extends AnyFunSuite with SparkTest {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val A = "the quick brown fox jumps over the lazy dog again and again"
  private val B = "an entirely different document about spark physical plans"
  private val C = "a third text on parquet row group statistics and pruning"

  private def sigStore(prefix: String, compact: Boolean = false): String = {
    import spark.implicits._
    val store = tmpDir(prefix) + "/sigs"
    IncrementalDedup.processBatch(
      Seq((1L, A), (2L, B)).toDF("doc_id", "text"), 0L, store, 0.5,
      (_, _) => ())
    IncrementalDedup.processBatch(
      Seq((3L, C)).toDF("doc_id", "text"), 1L, store, 0.5, (_, _) => ())
    if (compact) Dedup.compactSignatureStore(spark, store)
    // a HEALTHY stream-built store records its owning checkpoint (the
    // run() cadence claims it; direct processBatch fixtures adopt) —
    // an ingested-but-unowned store is itself a finding since r12
    StoreFs.adoptStore(spark, store, "ckpt-test")
    store
  }

  private def findings(dir: String,
                       subDirs: Seq[String] = Seq.empty) =
    StoreAudit.auditFindings(spark, dir, subDirs)

  test("a healthy store (flat or compacted) audits clean, shallow and deep") {
    val flat = sigStore("graft-audit-clean-")
    assert(findings(flat).isEmpty, s"flat store: ${findings(flat)}")
    val compacted = sigStore("graft-audit-cleanc-", compact = true)
    val fs = findings(compacted)
    assert(fs.isEmpty, s"compacted store: $fs")
    val deep = StoreAudit.auditDeep(spark, compacted, Seq("doc_id"))
    assert(deep.count() == 0L, "deep audit of a healthy store is empty")
  }

  test("an orphaned commit marker (live generation deleted out-of-band) is an error") {
    val store = sigStore("graft-audit-orphan-", compact = true)
    val gen = new java.io.File(store, "_gen-00000001")
    gen.listFiles().foreach(_.delete())
    assert(gen.delete())
    val fs = findings(store)
    assert(fs.exists(f => f.check == "generation-layout" && f.level == "error"),
      s"expected an orphaned-commit error, got $fs")
  }

  test("one crashed carcass is info; several leaked carcasses are a warning") {
    val store = sigStore("graft-audit-carcass-", compact = true)
    assert(new java.io.File(store, "_gen-00000002").mkdirs())
    val one = findings(store)
    assert(one.exists(f => f.check == "generation-layout" && f.level == "info"))
    assert(!one.exists(_.level == "error"))
    assert(new java.io.File(store, "_gen-00000003").mkdirs())
    val two = findings(store)
    assert(two.exists(f => f.check == "generation-layout" && f.level == "warn"),
      s"two uncommitted generations must warn, got $two")
  }

  test("a generation past its grace window (stalled GC) is a warning") {
    val store = sigStore("graft-audit-grace-", compact = true)
    Dedup.compactSignatureStore(spark, store)
    Dedup.compactSignatureStore(spark, store) // live = 3, grace keeps 2
    // resurrect generation 1 as if GC had never run
    assert(new java.io.File(store, "_gen-00000001").mkdirs())
    val fs = findings(store)
    assert(fs.exists(f => f.check == "generation-layout" &&
      f.level == "warn" && f.detail.contains("grace")), s"got $fs")
  }

  test("an unparsable seal file is a warning; markers below the seal are a warning") {
    import spark.implicits._
    val store = tmpDir("graft-audit-seal-") + "/codes"
    // a batch-tagged store family (the DSIR/code convention): build via
    // raw writes so the seal state is fully controlled
    Seq((1L, 10L, 0L), (2L, 11L, 0L), (3L, 12L, 1L))
      .toDF("doc_id", "code", "batch_id")
      .write.mode("overwrite").parquet(store)
    StoreFs.sealTagMarkers(spark, store)
    StoreFs.adoptStore(spark, store, "ckpt-test") // silence the owner check
    assert(findings(store).isEmpty, "a clean seal audits clean")
    // a marker the seal already covers (a seal pass that stopped before
    // cleaning) — and a torn seal file
    new java.io.FileOutputStream(
      new java.io.File(store, "_graft_batch_0")).close()
    val fs1 = findings(store)
    assert(fs1.exists(f => f.check == "markers" && f.level == "warn"),
      s"got $fs1")
    java.nio.file.Files.writeString(
      new java.io.File(store, "_graft_sealed").toPath, "not-a-number")
    val fs2 = findings(store)
    assert(fs2.exists(f => f.check == "seal" && f.level == "warn"),
      s"got $fs2")
  }

  test("multi-table: a torn frontier is info; a seal past the frontier min is an error") {
    import spark.implicits._
    val root = tmpDir("graft-audit-index-") + "/idx"
    val docs = Seq((1L, A), (2L, B)).toDF("doc_id", "text")
    IndexIngest.processBatch(docs, 0L, root)
    StoreFs.adoptStore(spark, root, "ckpt-test") // markers → owned or warn
    val subs = Seq("doclen", "postings", "positions").map(s => s"$root/$s")
    assert(findings(root, subs).isEmpty, "a fully-landed index audits clean")
    // torn frontier: batch 1's doclen landed, crash before postings/
    // positions — replay will heal it, so info, not error
    Seq((3L, 7L, 1L)).toDF("doc_id", "dl", "batch_id")
      .write.mode("append").parquet(s"$root/doclen")
    val torn = findings(root, subs)
    assert(torn.exists(f => f.check == "frontier" && f.level == "info"),
      s"got $torn")
    assert(!torn.exists(_.level == "error"))
    // the data-loss state the multi-table seal prevents: a seal
    // covering batch 1 while postings/positions never landed it
    java.nio.file.Files.writeString(
      new java.io.File(root, "_graft_sealed").toPath, "1")
    val lost = findings(root, subs)
    assert(lost.exists(f => f.check == "frontier" && f.level == "error"),
      s"got $lost")
  }

  test("deep audit: duplicate natural keys are an error naming the worst multiplicity") {
    import spark.implicits._
    val store = tmpDir("graft-audit-dup-") + "/vecs"
    Seq((1L, 5L), (2L, 6L), (2L, 7L), (2L, 8L))
      .toDF("vec_id", "payload")
      .write.mode("overwrite").parquet(store)
    val deep = StoreAudit.auditDeep(spark, store, Seq("vec_id")).collect()
    assert(deep.exists(r => r.getAs[String]("check") == "keys" &&
      r.getAs[String]("level") == "error" &&
      r.getAs[String]("detail").contains("×3")), s"got ${deep.toSeq}")
  }

  test("a held lock is info below the stale ceiling, warn past it; a takeover file warns") {
    val store = sigStore("graft-audit-lock-", compact = true)
    java.nio.file.Files.writeString(
      new java.io.File(store, StoreFs.LockName).toPath, "holder")
    val young = findings(store)
    assert(young.exists(f => f.check == "lock" && f.level == "info" &&
      f.detail.contains("in progress")), s"got $young")
    // ... and the flat-remnant heuristic must NOT misreport the held
    // lock as stale generation-0 files (ADVICE r11)
    assert(new java.io.File(store, StoreFs.LockName).delete())
    Dedup.compactSignatureStore(spark, store) // live = 2: remnant clause armed
    java.nio.file.Files.writeString(
      new java.io.File(store, StoreFs.LockName).toPath, "holder")
    val live2 = findings(store)
    assert(!live2.exists(_.detail.contains("flat generation-0")),
      s"a held lock is not a generation-0 remnant: $live2")
    // past the stale ceiling the same lock is a crash remnant
    assert(new java.io.File(store, StoreFs.LockName)
      .setLastModified(System.currentTimeMillis() - 100000L))
    val stale = StoreAudit.auditFindings(spark, store,
      staleLockMs = 10000L)
    assert(stale.exists(f => f.check == "lock" && f.level == "warn" &&
      f.detail.contains("stale ceiling")), s"got $stale")
    assert(new java.io.File(store, StoreFs.LockName).delete())
    java.nio.file.Files.writeString(
      new java.io.File(store, StoreFs.TakeoverName).toPath, "t")
    val takeover = findings(store)
    assert(takeover.exists(f => f.check == "lock" && f.level == "warn" &&
      f.detail.contains("takeover")), s"got $takeover")
  }

  test("a sealed store with no recorded owner warns; claiming it clears the finding") {
    import spark.implicits._
    val store = tmpDir("graft-audit-owner-") + "/codes"
    Seq((1L, 10L, 0L)).toDF("doc_id", "code", "batch_id")
      .write.mode("overwrite").parquet(store)
    StoreFs.sealTagMarkers(spark, store)
    val unowned = findings(store)
    assert(unowned.exists(f => f.check == "owner" && f.level == "warn" &&
      f.detail.contains("adoptStore")), s"got $unowned")
    StoreFs.adoptStore(spark, store, "ckpt-y")
    assert(!findings(store).exists(_.check == "owner"))
    // markers-only ingest state (no seal yet) is the SAME refused
    // state and must warn the same way
    import spark.implicits._
    val marked = tmpDir("graft-audit-owner2-") + "/sigs"
    Seq((1L, 2L)).toDF("doc_id", "sig")
      .write.mode("overwrite").parquet(marked)
    StoreFs.writeMarker(spark, marked, 0L)
    val m = findings(marked)
    assert(m.exists(f => f.check == "owner" && f.level == "warn" &&
      f.detail.contains("replay markers")), s"got $m")
  }

  test("a grace window narrower than the declared reader SLA is a retention warning") {
    val store = sigStore("graft-audit-sla-", compact = true)
    Dedup.compactSignatureStore(spark, store) // live = 2: count floor engaged
    // the two surviving commit markers are seconds apart — a 1 h reader
    // SLA cannot be covered by count-based grace at this cadence
    val slaMs = 3600L * 1000
    val fs = StoreAudit.auditFindings(spark, store, readerSlaMs = slaMs)
    assert(fs.exists(f => f.check == "retention" && f.level == "warn" &&
      f.detail.contains("keepAgeMs")), s"got $fs")
    // no SLA declared → no finding (the default audit stays quiet)
    assert(!findings(store).exists(_.check == "retention"))
    // a window wider than the SLA audits clean
    assert(new java.io.File(store, "_graft_commit_1")
      .setLastModified(System.currentTimeMillis() - 2 * slaMs))
    assert(!StoreAudit.auditFindings(spark, store, readerSlaMs = slaMs)
      .exists(_.check == "retention"))
  }

  test("an EMPTY owner record is a warn naming adoptStore — the wedged state claimOwner refuses") {
    val store = sigStore("graft-audit-emptyowner-")
    // simulate a claim that crashed between the owner file's create and
    // its content write: the record exists but is blank — before ADVICE
    // r12 the audit read this as "owned" and reported the store clean
    // while claimOwner refused every restart on it
    java.nio.file.Files.writeString(
      new java.io.File(store, StoreFs.OwnerName).toPath, "")
    val fs = findings(store)
    assert(fs.exists(f => f.check == "owner" && f.level == "warn" &&
      f.detail.contains("EMPTY") && f.detail.contains("adoptStore")),
      s"got $fs")
    // re-homing the store clears the finding
    StoreFs.adoptStore(spark, store, "ckpt-test")
    assert(!findings(store).exists(_.check == "owner"))
  }

  test("junk layout names yield findings, never exceptions") {
    val store = sigStore("graft-audit-junk-", compact = true)
    java.nio.file.Files.writeString(
      new java.io.File(store, "_graft_commit_tmp").toPath, "backup")
    java.nio.file.Files.writeString(
      new java.io.File(store, "_graft_batch_tmp").toPath, "junk")
    val fs = findings(store) // before ADVICE r11 this threw NumberFormatException
    assert(fs.count(f => f.check == "generation-layout" &&
      f.level == "warn" && f.detail.contains("non-numeric")) == 2, s"got $fs")
  }

  test("the fleet shape: audits of many stores union into one health table") {
    val clean = sigStore("graft-audit-fleet1-", compact = true)
    val broken = sigStore("graft-audit-fleet2-", compact = true)
    assert(new java.io.File(broken, "_gen-00000002").mkdirs())
    val health = StoreAudit.audit(spark, clean)
      .unionByName(StoreAudit.audit(spark, broken))
    assert(health.columns.toSeq ==
      Seq("store", "check", "level", "detail"))
    assert(health.count() == 1L)
    assert(health.select("store").head.getString(0) == broken)
  }
}
