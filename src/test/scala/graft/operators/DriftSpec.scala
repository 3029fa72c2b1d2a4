package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.streaming.StoreAudit

/** Retrain/recluster trigger observability (round 15 — VERDICT r14
  * #4): the r14 lifecycle levers (reclusterVecStore,
  * retrainIvfadcStore/retrainPqStore) existed with no gauge saying
  * WHEN to pull them. The `drift` audit finding is that gauge:
  *
  *  - exact-IVF: live Σ r2max over the cells table vs the build-time
  *    sum recorded in `_graft_build_stats` — appends inflate cell
  *    radii and every serve's bound loosens;
  *  - PQ / IVFADC: the newest append's mean residual quantization
  *    error (recorded at encode time, the only moment raw vector and
  *    code coexist) vs the build-time mean — drifted data quantizes
  *    worse under frozen books, which is silent recall erosion.
  *
  * Contract pinned here: no finding at build parity, no WARN for an
  * in-distribution append, WARN past the action threshold on a truly
  * drifted append, and the finding CLEARS after the corresponding
  * lever (recluster/retrain) because both sides of the gauge live in
  * the epoch root the rebuild replaces. */
class DriftSpec extends AnyFunSuite with SparkTest
    with org.scalatest.BeforeAndAfterEach {

  override def afterEach(): Unit = {
    graft.core.Caches.releaseAll()
    spark.catalog.clearCache()
  }

  private val Dim = 8

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-drift-").toString

  private def drift(dir: String): Seq[StoreAudit.Finding] =
    StoreAudit.auditFindings(spark, dir).filter(_.check == "drift")

  /** Integer vec-store rows: ids jitter tightly around sign·1000·(j+1)
    * (the ReclusterSpec two-cluster fixture). */
  private def cluster(ids: Range, sign: Long) = {
    import spark.implicits._
    ids.map { i =>
      val v = (0 until Dim).map { j =>
        sign * 1000L * (j + 1) + ((i * 31 + j * 17) % 21) - 10L
      }.toArray
      (i.toLong, v)
    }.toDF("doc_id", "vec")
  }

  /** Double embedding rows for the PQ family: small jittered values
    * around a per-dimension pattern, scaled by `scale` to simulate
    * distribution drift (residuals under frozen books grow ∝ scale²). */
  private def emb(ids: Range, scale: Double) = {
    import spark.implicits._
    ids.map { i =>
      val v = (0 until Dim).map { j =>
        scale * (0.02 * (j + 1) + 0.001 * ((i * 13 + j * 7) % 17))
      }.toArray
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("exact-IVF: bound-drift fires on r2max inflation, clears after recluster") {
    val path = tmp()
    ExactIvf.writeVecStore(cluster(0 until 100, +1L), path,
      nCells = 2, iters = 1)
    // build parity: live Σ r2max IS the recorded sum — no finding
    assert(drift(path).isEmpty)
    // a far-away appended cluster inflates r2max by orders of
    // magnitude — the regime where phase 2 stops pruning
    ExactIvf.appendToVecStore(spark, cluster(100 until 200, -1L), path)
    val fired = drift(path)
    assert(fired.exists(_.level == "warn"), fired.toString)
    assert(fired.head.detail.contains("reclusterVecStore"))
    // the lever the finding names resets the gauge: the new epoch
    // records ITS build-time sum and live == build again
    ExactIvf.reclusterVecStore(spark, path, nCells = 4, iters = 1)
    assert(drift(path).isEmpty)
  }

  test("IVFADC: quantizer-drift fires on a drifted append, not an in-distribution one, and clears after retrain") {
    val path = tmp()
    val base = emb(0 until 150, 1.0)
    Pq.writeIvfadcStore(base, path, nCells = 2, m = 2, dim = Dim,
      nCents = 4, iters = 1)
    // no appends yet → no batch stats → no finding
    assert(drift(path).isEmpty)
    // in-distribution growth: same generator, new ids — the batch
    // quantizes about as well as the build did, below the threshold
    Pq.appendToIvfadcStore(spark, emb(150 until 200, 1.0), path,
      m = 2, dim = Dim, batchId = Some(1L))
    assert(!drift(path).exists(_.level == "warn"), drift(path).toString)
    // drifted batch: ×50 scale → residuals under the frozen books
    // explode; recall erodes silently without this signal
    Pq.appendToIvfadcStore(spark, emb(200 until 250, 50.0), path,
      m = 2, dim = Dim, batchId = Some(2L))
    val fired = drift(path)
    assert(fired.exists(_.level == "warn"), fired.toString)
    assert(fired.head.detail.contains("retrain"))
    // retrain re-fits the quantizers at the live distribution: fresh
    // build stats, no batch stats in the new epoch — gauge reset
    val all = base.unionAll(emb(150 until 200, 1.0))
      .unionAll(emb(200 until 250, 50.0))
    Pq.retrainIvfadcStore(spark, all, path, nCells = 2, m = 2,
      dim = Dim, nCents = 4, iters = 1)
    assert(drift(path).isEmpty)
  }

  test("flat PQ: quantizer-drift fires and clears after retrain") {
    val path = tmp()
    val base = emb(0 until 150, 1.0)
    Pq.writePqStore(base, path, m = 2, dim = Dim, nCents = 4, iters = 1)
    assert(drift(path).isEmpty)
    Pq.appendToPqStore(spark, emb(150 until 200, 50.0), path,
      m = 2, dim = Dim, batchId = Some(1L))
    assert(drift(path).exists(_.level == "warn"), drift(path).toString)
    Pq.retrainPqStore(spark, base.unionAll(emb(150 until 200, 50.0)),
      path, m = 2, dim = Dim, nCents = 4, iters = 1)
    assert(drift(path).isEmpty)
  }

  test("cumulative drift fires when many small batches drift but the newest is clean") {
    val path = tmp()
    Pq.writePqStore(emb(0 until 150, 1.0), path, m = 2, dim = Dim,
      nCents = 4, iters = 1)
    val b0 = graft.streaming.StoreFs.readBuildStats(spark, path)(
      "qerr_mean").toDouble
    assert(b0 > 0.0)
    // pin the store's noise floor low (round 16): this test's claim is
    // the CUMULATIVE gauge arithmetic at a 5x ratio, independent of
    // the fixture's natural qerr spread
    graft.streaming.StoreFs.writeBuildStats(spark, path, Seq(
      "qerr_mean" -> b0.toString, "qerr_cv" -> "0.1",
      "n_rows" -> "150"))
    // slow drift: ten drifted batches, then one clean one — the
    // newest-batch ratio sits near 1 while the standing appended mass
    // quantizes 5x worse (the erosion the cumulative gauge exists for)
    (1 to 10).foreach { i =>
      graft.streaming.StoreFs.appendBatchStats(spark, path, Seq(
        "qerr_mean" -> (b0 * 5.0).toString, "n_rows" -> "100",
        "batch_id" -> i.toString))
    }
    graft.streaming.StoreFs.appendBatchStats(spark, path, Seq(
      "qerr_mean" -> b0.toString, "n_rows" -> "100",
      "batch_id" -> "11"))
    val fired = drift(path)
    assert(fired.exists(_.level == "warn"), fired.toString)
    assert(fired.head.detail.contains("appended mass"))
  }

  test("torn stats entries (no qerr_mean) neither dilute the mass nor carry the newest ratio") {
    val path = tmp()
    Pq.writePqStore(emb(0 until 150, 1.0), path, m = 2, dim = Dim,
      nCents = 4, iters = 1)
    val b0 = graft.streaming.StoreFs.readBuildStats(spark, path)(
      "qerr_mean").toDouble
    // pin the noise floor low — the claim here is the mass arithmetic
    graft.streaming.StoreFs.writeBuildStats(spark, path, Seq(
      "qerr_mean" -> b0.toString, "qerr_cv" -> "0.1",
      "n_rows" -> "150"))
    // one genuinely drifted batch...
    graft.streaming.StoreFs.appendBatchStats(spark, path, Seq(
      "qerr_mean" -> (b0 * 5.0).toString, "n_rows" -> "100",
      "batch_id" -> "1"))
    // ...then ten torn entries: rows recorded, qerr_mean lost. Counting
    // their mass at qerr=0 would read the cumulative gauge as
    // 500/(100+10000) ≈ 0.05× and MASK the drift (ADVICE r15)
    (2 to 11).foreach { i =>
      graft.streaming.StoreFs.appendBatchStats(spark, path, Seq(
        "n_rows" -> "1000", "batch_id" -> i.toString))
    }
    val fired = drift(path)
    assert(fired.exists(_.level == "warn"), fired.toString)
  }

  test("per-store noise floor: a noisy corpus stays quiet at 2.5x, a stable one warns below 2.0") {
    def store(cv: String): String = {
      val path = tmp()
      Pq.writePqStore(emb(0 until 150, 1.0), path, m = 2, dim = Dim,
        nCents = 4, iters = 1)
      val b0 = graft.streaming.StoreFs.readBuildStats(spark, path)(
        "qerr_mean").toDouble
      // pin the recorded spread — the claim is the threshold
      // DERIVATION, not the fixture's natural variability
      graft.streaming.StoreFs.writeBuildStats(spark, path, Seq(
        "qerr_mean" -> b0.toString, "qerr_cv" -> cv, "n_rows" -> "150"))
      path
    }
    def batchAt(path: String, ratio: Double): Unit = {
      val b0 = graft.streaming.StoreFs.readBuildStats(spark, path)(
        "qerr_mean").toDouble
      graft.streaming.StoreFs.appendBatchStats(spark, path, Seq(
        "qerr_mean" -> (b0 * ratio).toString, "n_rows" -> "100",
        "batch_id" -> "1"))
    }
    // NOISY but stationary (cv 0.8 → floor (1+2.4)·1.2 = 4.08): a
    // 2.5x batch is inside the store's own noise — the global 2.0
    // constant would have warned spuriously
    val noisy = store("0.8")
    batchAt(noisy, 2.5)
    assert(!drift(noisy).exists(_.level == "warn"),
      drift(noisy).toString)
    // STABLE corpus (cv 0.02 → floor ~1.27): a 1.5x batch is genuine
    // drift this store would previously have sat on quietly below 2.0
    val quiet = store("0.02")
    batchAt(quiet, 1.5)
    assert(drift(quiet).exists(_.level == "warn"),
      drift(quiet).toString)
    // an EXPLICIT operator threshold is honored — raised to the floor,
    // never lowered below it
    spark.conf.set("spark.graft.audit.driftRatio", "2.0")
    try {
      assert(!drift(quiet).exists(_.level == "warn"),
        drift(quiet).toString)
      assert(!drift(noisy).exists(_.level == "warn"),
        drift(noisy).toString)
    } finally spark.conf.unset("spark.graft.audit.driftRatio")
  }

  test("variance drift: a live spread wider than the build raises the floor; it never tightens it (round 17)") {
    def store(cv: String): String = {
      val path = tmp()
      Pq.writePqStore(emb(0 until 150, 1.0), path, m = 2, dim = Dim,
        nCents = 4, iters = 1)
      val b0 = graft.streaming.StoreFs.readBuildStats(spark, path)(
        "qerr_mean").toDouble
      graft.streaming.StoreFs.writeBuildStats(spark, path, Seq(
        "qerr_mean" -> b0.toString, "qerr_cv" -> cv, "n_rows" -> "150"))
      path
    }
    def batchAt(path: String, ratio: Double, liveCv: String): Unit = {
      val b0 = graft.streaming.StoreFs.readBuildStats(spark, path)(
        "qerr_mean").toDouble
      graft.streaming.StoreFs.appendBatchStats(spark, path, Seq(
        "qerr_mean" -> (b0 * ratio).toString, "n_rows" -> "1000",
        "batch_id" -> "1", "qerr_cv" -> liveCv))
    }
    // STABLE build (cv 0.02 → stale floor ~1.27) whose corpus variance
    // then GROWS: the appended mass records a within-batch cv of 0.8,
    // so the effective floor derives from the live spread (4.08) — a
    // 1.6x batch that the frozen build floor would have warned on is
    // inside the store's CURRENT noise (VERDICT r16 #8)
    val widened = store("0.02")
    batchAt(widened, 1.6, liveCv = "0.8")
    assert(!drift(widened).exists(_.level == "warn"),
      drift(widened).toString)
    assert(drift(widened).exists(_.level == "info"),
      drift(widened).toString)
    // the live cv never LOWERS the floor: a noisy build (cv 0.8, floor
    // 4.08) with quieter live batches keeps its build floor — a 2.5x
    // batch stays inside it
    val noisy = store("0.8")
    batchAt(noisy, 2.5, liveCv = "0.02")
    assert(!drift(noisy).exists(_.level == "warn"),
      drift(noisy).toString)
    // and with NO live cv recorded (pre-r17 appends), the build floor
    // stands: the 1.6x batch on the stable store warns as before
    val stale = store("0.02")
    graft.streaming.StoreFs.appendBatchStats(spark, stale, Seq(
      "qerr_mean" -> (graft.streaming.StoreFs.readBuildStats(spark,
        stale)("qerr_mean").toDouble * 1.6).toString,
      "n_rows" -> "1000", "batch_id" -> "1"))
    assert(drift(stale).exists(_.level == "warn"), drift(stale).toString)
  }

  test("recall history: three eroding panels yield a trend finding; a recovering one clears it (round 17)") {
    val path = tmp()
    Pq.writePqStore(emb(0 until 100, 1.0), path, m = 2, dim = Dim,
      nCents = 4, iters = 1)
    def recallF() = StoreAudit.auditFindings(spark, path)
      .filter(_.check == "recall")
    def panel(recall: String, atMs: Long): Unit =
      graft.streaming.StoreFs.writeRecallStats(spark, path, Seq(
        "recall" -> recall, "floor" -> "0.5", "k" -> "5",
        "n_probes" -> "8", "at_ms" -> atMs.toString))
    val t0 = System.currentTimeMillis()
    panel("0.90", t0)
    panel("0.85", t0 + 1)
    // two panels: no trend yet (and both clear the floor — no warn)
    assert(recallF().isEmpty, recallF().toString)
    panel("0.80", t0 + 2)
    // three monotonically eroding panels past the 0.02 margin → the
    // trend is reported (info — a projection, not a lever trigger)
    // with the sequence and the newest value in the detail
    val trending = recallF()
    assert(trending.exists(f => f.level == "info" &&
      f.detail.contains("trend") && f.detail.contains("0.8000")),
      trending.toString)
    assert(!trending.exists(_.level == "warn"), trending.toString)
    // a recovering fourth panel breaks the monotone slide → quiet
    panel("0.88", t0 + 3)
    assert(recallF().isEmpty, recallF().toString)
    // the history is bounded: many panels keep only the newest window
    (4L until 40L).foreach(i => panel("0.88", t0 + i))
    assert(graft.streaming.StoreFs.readRecallHistory(spark, path).size <=
      graft.streaming.StoreFs.RecallHistoryKeep)
  }

  test("adoption refuses an internally inconsistent legacy layout (round 17)") {
    // exact-IVF with a TRUNCATED cells table: vecs reference a cell
    // the observed layout cannot name — pre-r17 adoption recorded a
    // wrong n_cells silently and every serve pruned on it
    val path = tmp()
    ExactIvf.writeVecStore(
      cluster(0 until 50, +1L).unionAll(cluster(50 until 100, -1L)),
      path, nCells = 4, iters = 1)
    assert(new java.io.File(path, "_graft_geometry").delete())
    val cellsDir = graft.streaming.StoreFs.dataDir(spark, s"$path/cells")
    val cellsDf = spark.read.parquet(cellsDir)
    // drop the cell holding the MOST vecs so the orphan is guaranteed
    val vecsDf = spark.read.parquet(
      graft.streaming.StoreFs.dataDir(spark, s"$path/vecs"))
    val busiest = vecsDf.groupBy("ivf_cell")
      .agg(count(lit(1)).as("n")).orderBy(col("n").desc)
      .head.getLong(0)
    val kept = cellsDf.collect().filter(
      _.getAs[Long]("ivf_cell") != busiest)
    spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(kept: _*)),
      cellsDf.schema).write.mode("overwrite").parquet(cellsDir)
    spark.catalog.refreshByPath(cellsDir)
    val e = intercept[IllegalArgumentException] {
      graft.streaming.StoreFs.adoptLegacyStore(spark, path)
    }
    assert(e.getMessage.contains("absent from"), e.getMessage)
    assert(!new java.io.File(path, "_graft_geometry").exists(),
      "a refused adoption must not leave a manifest behind")
    // flat-PQ with TRUNCATED books: codes carry a sub with no codebook
    // — the derived m would mis-slice every ADC sum
    val pqPath = tmp()
    Pq.writePqStore(emb(0 until 80, 1.0), pqPath, m = 2, dim = Dim,
      nCents = 4, iters = 1)
    assert(new java.io.File(pqPath, "_graft_geometry").delete())
    val booksDf = spark.read.parquet(s"$pqPath/books")
    val keptBooks = booksDf.collect().filter(r =>
      r.getAs[Number]("sub").longValue() == 0L)
    spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(keptBooks: _*)),
      booksDf.schema).write.mode("overwrite").parquet(s"$pqPath/books")
    spark.catalog.refreshByPath(s"$pqPath/books")
    val e2 = intercept[IllegalArgumentException] {
      graft.streaming.StoreFs.adoptLegacyStore(spark, pqPath)
    }
    assert(e2.getMessage.contains("no codebook"), e2.getMessage)
  }

  test("batch stats roll up past the cap with the cumulative mass preserved") {
    val path = tmp()
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    (1 to 80).foreach { i =>
      graft.streaming.StoreFs.appendBatchStats(spark, path, Seq(
        "qerr_mean" -> (if (i <= 40) "10.0" else "20.0"),
        "n_rows" -> "50", "batch_id" -> i.toString))
    }
    val entries = graft.streaming.StoreFs.readBatchStats(spark, path)
    // self-maintained: far fewer files than appends...
    assert(entries.size < 40, s"${entries.size} stats files")
    // ...with the total appended mass and its weighted error intact
    val mass = entries.map(_._2("n_rows").toLong).sum
    assert(mass == 80L * 50)
    val cum = entries.map(e =>
      e._2("qerr_mean").toDouble * e._2("n_rows").toLong).sum / mass
    assert(math.abs(cum - 15.0) < 1e-9, cum.toString)
    // the newest entry is the newest APPEND, never a rollup
    assert(entries.last._2("batch_id") == "80")
  }

  test("cellSlackReport separates recoverable slack (purge) from genuine widening (recluster)") {
    import spark.implicits._
    val path = tmp()
    // one tight cluster + one far cluster → 2 cells, slack 1 each
    ExactIvf.writeVecStore(
      cluster(0 until 60, +1L).unionAll(cluster(60 until 120, -1L)),
      path, nCells = 2, iters = 1)
    val clean = ExactIvf.cellSlackReport(spark, path).collect()
    assert(clean.forall(r => math.abs(r.getAs[Double]("slack_ratio") - 1.0)
      < 1e-9), clean.mkString(";"))
    // append members FAR from one cell's centroid, then tombstone
    // them: recorded r2max keeps covering the deleted members while
    // the visible actual shrinks back — recoverable slack
    val far = cluster(200 until 210, +1L)
      .select(col("doc_id"), transform(col("vec"), x => x * 7L).as("vec"))
    ExactIvf.appendToVecStore(spark, far, path)
    ExactIvf.deleteFromVecStore(spark,
      (200L until 210L).toDF("doc_id"), path, idCol = "doc_id")
    val slack = ExactIvf.cellSlackReport(spark, path).collect()
    assert(slack.exists(r => !r.isNullAt(r.fieldIndex("slack_ratio")) &&
      r.getAs[Double]("slack_ratio") > 5.0), slack.mkString(";"))
    // the purge's re-tighten restores the bound — slack back to 1
    ExactIvf.compactVecStore(spark, path)
    val after = ExactIvf.cellSlackReport(spark, path).collect()
    assert(after.forall(r => math.abs(r.getAs[Double]("slack_ratio") - 1.0)
      < 1e-9), after.mkString(";"))
  }

  test("served-recall gauge: panel records, fsck grades floor + staleness, epoch resets it") {
    val path = tmp()
    val base = emb(0 until 150, 1.0)
    Pq.writeIvfadcStore(base, path, nCells = 2, m = 2, dim = Dim,
      nCents = 4, iters = 1)
    def recallF() = StoreAudit.auditFindings(spark, path)
      .filter(_.check == "recall")
    // no panel yet → gauge unavailable, no finding (opt-in, like drift)
    assert(recallF().isEmpty)
    // the maintenance-cadence panel: serves from the LIVE store, grades
    // against exact truth, RECORDS the result at the epoch root
    val probeIds = Similarity.boundedProbeIds(base, 8)
    val panel = Pq.servedRecallPanel(spark,
      Seq(("live", path, 0.1)), base, probeIds,
      nprobe = 2, kShort = 30, k = 5, m = 2, dim = Dim).collect()
    assert(panel.length == 1)
    val rec = graft.streaming.StoreFs.readRecallStats(spark, path)
    assert(rec.get("recall").exists(_.toDoubleOption.isDefined), rec)
    assert(rec.contains("at_ms"))
    // recall above its floor → quiet
    assert(recallF().isEmpty, recallF().toString)
    // appends landing AFTER the panel make the record STALE (info):
    // the recorded recall grades a smaller store
    Thread.sleep(2) // the batch-stats millis clock must advance
    Pq.appendToIvfadcStore(spark, emb(150 until 180, 1.0), path,
      m = 2, dim = Dim, batchId = Some(1L))
    assert(recallF().exists(f => f.level == "info" &&
      f.detail.contains("stale") || f.detail.contains("re-run")),
      recallF().toString)
    // a BELOW-FLOOR record is the warn that pulls the retrain lever
    graft.streaming.StoreFs.writeRecallStats(spark, path, Seq(
      "recall" -> "0.40", "floor" -> "0.90", "k" -> "5",
      "n_probes" -> "8",
      "at_ms" -> System.currentTimeMillis().toString))
    val fired = recallF()
    assert(fired.exists(f => f.level == "warn" &&
      f.detail.contains("retrain")), fired.toString)
    // the retrain retires the record with its epoch — the new
    // quantizers start UNGAUGED rather than inheriting a stale verdict
    Pq.retrainIvfadcStore(spark, base.unionAll(emb(150 until 180, 1.0)),
      path, nCells = 2, m = 2, dim = Dim, nCents = 4, iters = 1)
    assert(recallF().isEmpty, recallF().toString)
  }

  test("estate audit discovers every store under a root and unions their findings") {
    import spark.implicits._
    val root = tmp()
    // two stores at different depths + one non-store dir
    ExactIvf.writeVecStore(cluster(0 until 50, +1L), s"$root/a/vec",
      nCells = 2, iters = 1)
    Pq.writePqStore(emb(0 until 80, 1.0), s"$root/b/deep/pq",
      m = 2, dim = Dim, nCents = 4, iters = 1)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/not-a-store"))
    ExactIvf.deleteFromVecStore(spark, Seq(3L).toDF("doc_id"),
      s"$root/a/vec", idCol = "doc_id")
    val fs = graft.streaming.StoreAudit.estateFindings(spark, root)
    val stores = fs.map(_.store).distinct.sorted
    assert(stores.exists(_.endsWith("/a/vec")), stores.toString)
    assert(stores.exists(_.endsWith("/b/deep/pq")), stores.toString)
    // the vec store's pending tombstone surfaces through the estate walk
    assert(fs.exists(f => f.store.endsWith("/a/vec") &&
      f.check == "tombstones"), fs.mkString(";"))
    // SQL surface: same findings through the TVF
    val viaSql = spark.sql(
      s"SELECT * FROM graft_estate_audit('$root')").collect()
    assert(viaSql.map(_.getAs[String]("store")).distinct.sorted.toSeq ==
      stores)
    // an empty estate is a warn, not a silent zero-row success
    val empty = graft.streaming.StoreAudit.estateFindings(spark,
      s"$root/not-a-store")
    assert(empty.exists(f => f.check == "estate" && f.level == "warn"))
  }

  test("adoptLegacyStore derives a manifest and the estate walk starts seeing the store") {
    import spark.implicits._
    val root = tmp()
    val path = s"$root/legacy"
    ExactIvf.writeVecStore(cluster(0 until 100, +1L), path,
      nCells = 2, iters = 1)
    val recorded = graft.streaming.StoreFs.readGeometry(spark, path)
    // simulate a pre-manifest store: the manifest never existed
    assert(new java.io.File(path, "_graft_geometry").delete())
    val before = StoreAudit.estateFindings(spark, root)
    assert(!before.exists(f => f.store.endsWith("/legacy") &&
      f.check == "estate" && f.detail.contains("discovered")),
      before.mkString(";"))
    // adoption derives the manifest from the OBSERVED layout — family,
    // n_cells, dim, and a bucket modulus consistent with every
    // existing (cell, bucket) pair (a wrong modulus would make serves
    // prune the wrong partitions)
    val adopted = graft.streaming.StoreFs.adoptLegacyStore(spark, path)
    assert(adopted("family") == "exact_ivf", adopted.toString)
    assert(adopted("n_cells") == recorded("n_cells"), adopted.toString)
    assert(adopted("dim") == recorded("dim"), adopted.toString)
    // the derived modulus keeps every stored row self-consistent
    val vecs = spark.read.parquet(
      graft.streaming.StoreFs.dataDir(spark, s"$path/vecs"))
    if (vecs.columns.contains("cell_bucket")) {
      val b = adopted("n_buckets").toLong
      assert(b > 0)
      assert(vecs.filter(
        org.apache.spark.sql.functions.pmod(col("ivf_cell"),
          org.apache.spark.sql.functions.lit(b)) =!= col("cell_bucket"))
        .count() == 0L)
    }
    // the estate walk now discovers it and surfaces its findings
    ExactIvf.deleteFromVecStore(spark, Seq(3L).toDF("doc_id"), path,
      idCol = "doc_id")
    val after = StoreAudit.estateFindings(spark, root)
    assert(after.exists(f => f.store.endsWith("/legacy") &&
      f.check == "estate"), after.mkString(";"))
    assert(after.exists(f => f.store.endsWith("/legacy") &&
      f.check == "tombstones"), after.mkString(";"))
    // serves still answer exactly through the adopted manifest
    val served = ExactIvf.topDotBatchFromStore(spark, path,
      Seq((1L, 7L)), 5, nprobe0 = 2)
    assert(served.count() == 5L)
    // adopting a store that HAS a manifest is refused
    intercept[IllegalArgumentException] {
      graft.streaming.StoreFs.adoptLegacyStore(spark, path)
    }
  }

  test("pre-r15 store (no build stats) produces no drift findings") {
    val path = tmp()
    ExactIvf.writeVecStore(cluster(0 until 50, +1L), path,
      nCells = 2, iters = 1)
    // simulate a pre-r15 store: build stats absent
    val f = new java.io.File(path, "_graft_build_stats")
    assert(f.exists())
    f.delete()
    ExactIvf.appendToVecStore(spark, cluster(50 until 100, -1L), path)
    assert(drift(path).isEmpty)
  }
}
