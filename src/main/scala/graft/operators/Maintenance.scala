package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.streaming.{StoreAudit, StoreFs}

/** The MAINTENANCE LOOP (round 15) — the cadence owner the lifecycle
  * levers were missing. Rounds 14–15 built the levers (purge
  * compaction, online recluster/retrain, epoch GC) and the gauges
  * (tombstone backlog, drift findings, awaiting-GC ages); what no one
  * owned was the decision: VERDICT r14 asked "who calls gc, when" and
  * the drift finding says "pull the lever" without pulling it. Each
  * `maintain*Store` closes that loop for one family in one idempotent
  * call an operator can run on any cadence (cron, a foreachBatch hook,
  * a post-ingest step):
  *
  *   1. read the store's own audit findings (one bounded fsck pass);
  *   2. drift past the action threshold → the REBUILD lever
  *      (recluster for the exact family, retrain for PQ/IVFADC — the
  *      rebuild reads visible rows, so it is also the purge);
  *   3. otherwise a pending tombstone backlog → the PURGE lever (the
  *      family's compactor, under the caller's retention — which also
  *      folds generations and seals markers, its standing duties);
  *   4. epoch GC with the caller's count + age floor (a no-op before
  *      any rebuild).
  *
  * Idempotent by construction: every lever resets the gauge that fired
  * it (recluster/retrain write fresh build stats in the new epoch and
  * clear batch stats; compaction purges and clears applied
  * tombstones), so a second immediate call reports zero actions.
  * Retention parameters are the caller's contract exactly as on the
  * underlying levers: size `keepGens`/`keepAgeMs`/`keepEpochs`/
  * `epochKeepAgeMs` to the deployment's longest pinned read.
  *
  * Deliberately NOT exposed as a SQL table function: the serving TVFs
  * are pure reads a dashboard may re-plan freely; maintenance MUTATES
  * the store, and a mutation hiding inside a SELECT would run once per
  * (re)execution of an innocent-looking query. The fsck (pure) stays
  * SQL-reachable via `graft_store_audit`; the loop stays a Scala call.
  */
object StoreMaintenance {

  /** One lever pulled (or explicitly skipped) by a maintenance pass. */
  final case class Action(store: String, action: String, detail: String)

  private def driftWarn(fs: Seq[StoreAudit.Finding]): Option[String] =
    fs.find(f => f.check == "drift" && f.level == "warn").map(_.detail)

  /** The served-recall gauge (round 16): a recall-below-floor warn is
    * RANKING erosion measured directly — a stronger retrain signal
    * than the qerr proxy, and the two compose as OR (either fires the
    * lever). The retrain retires the recall record with its epoch, so
    * the lever resets this gauge too (the idempotency contract). */
  private def recallWarn(fs: Seq[StoreAudit.Finding]): Option[String] =
    fs.find(f => f.check == "recall" && f.level == "warn").map(_.detail)

  /** "Retrain did not recover recall" (round 17 — VERDICT r16 #3): a
    * recall ERROR finding means the retrain lever was already pulled
    * for this signal (the `recall_retrain` epoch flag) and the
    * post-retrain panel is STILL below the floor — the floor is
    * unattainable at this serve/geometry, and pulling the lever again
    * every pass would burn a full rebuild per cadence tick forever.
    * The loop SURFACES it (like io) and does not retrain on the recall
    * channel; a genuine qerr drift warn keeps its own trigger. */
  private def recallErrors(path: String,
                           fs: Seq[StoreAudit.Finding]): Seq[Action] =
    fs.filter(f => f.check == "recall" && f.level == "error").map(f =>
      Action(path, "surface", s"recall error: ${f.detail}"))

  /** Stamp the LIVE epoch (the one the retrain just produced) as born
    * from a recall-triggered retrain — the audit reads this to grade a
    * still-below-floor post-retrain panel as the unattainable-floor
    * ERROR. Cleared by the first panel that meets the floor
    * ([[graft.operators.Pq.servedRecallPanel]]); never carried across
    * retrains (a fresh epoch starts unflagged unless THIS loop flags
    * it). */
  private def flagRecallRetrain(spark: SparkSession, path: String): Unit =
    StoreFs.updateGeometry(spark, StoreFs.liveRoot(spark, path),
      Seq("recall_retrain" -> "1"))

  private def backlog(fs: Seq[StoreAudit.Finding]): Boolean =
    fs.exists(f => f.check == "tombstones" && f.level == "info")

  /** I/O failures are SURFACED, never acted on (ADVICE r15 / VERDICT
    * r15 #2): an `io` finding means the audit itself could not read a
    * sub-table, so every gauge downstream of it is untrustworthy — the
    * loop reports the findings and pulls no lever (a transient FS error
    * must cost a retry, not a full rebuild). */
  private def ioErrors(path: String,
                       fs: Seq[StoreAudit.Finding]): Seq[Action] =
    fs.filter(_.check == "io").map(f =>
      Action(path, "surface", s"io ${f.level}: ${f.detail}"))

  private def geoInt(spark: SparkSession, path: String, key: String,
                     what: String): Int =
    StoreFs.readGeometry(spark, StoreFs.liveRoot(spark, path))
      .get(key).flatMap(_.toIntOption)
      .getOrElse(throw new IllegalArgumentException(
        s"$what needs '$key' in the geometry manifest at $path to " +
          "rebuild at the store's own geometry — pass the store through " +
          "its writer once (pre-manifest stores predate the levers)"))

  /** The store's recorded vector column (ADVICE r15, medium): the
    * retrain levers must re-fit the quantizers from the SAME column the
    * build used — defaulting to "embedding" here either crashes the
    * pass (column missing) or silently retrains from the wrong data
    * when the caller's table happens to carry both. */
  private def geoVecCol(spark: SparkSession, path: String): String =
    StoreFs.readGeometry(spark, StoreFs.liveRoot(spark, path))
      .getOrElse("vec_col", "embedding")

  /** Maintain an exact-IVF vec store: recluster on drift (at the
    * store's recorded geometry unless `reclusterCells` overrides),
    * else purge-compact on a tombstone backlog, then epoch GC. */
  def maintainVecStore(spark: SparkSession, path: String,
                       keepGens: Int = 1, keepAgeMs: Long = 0L,
                       keepEpochs: Int = 1, epochKeepAgeMs: Long = 0L,
                       reclusterCells: Int = -1,
                       iters: Int = 2): Seq[Action] = {
    val findings = StoreAudit.auditFindings(spark, path,
      keepGens = keepGens)
    val io = ioErrors(path, findings)
    if (io.nonEmpty) return io
    val acts = scala.collection.mutable.ArrayBuffer.empty[Action]
    def recluster(why: String): Unit = {
      val nCells =
        if (reclusterCells > 0) reclusterCells
        else geoInt(spark, path, "n_cells", "maintainVecStore")
      ExactIvf.reclusterVecStore(spark, path, nCells, iters)
      acts += Action(path, "recluster",
        s"nCells=$nCells (drift: $why)")
    }
    def purge(detail: String): Unit = {
      ExactIvf.compactVecStore(spark, path, keepGens, keepAgeMs)
      acts += Action(path, "purge-compact", detail)
    }
    driftWarn(findings) match {
      case Some(why) if backlog(findings) =>
        // PURGE-FIRST when drift and a tombstone backlog co-fire
        // (VERDICT r15 #1): pending tombstones hold r2max up — the
        // exact case cellSlackReport isolates — and the purge's
        // re-tighten resets the gauge at one bounded compaction cost.
        // Re-audit, and pull the recluster only if the warn SURVIVES
        // the purge (genuine widening); the old drift-first order
        // spent the most expensive lever where a ~10 s purge sufficed.
        purge("backlog purged before judging drift (purge-first: " +
          "tombstones can hold r2max up)")
        driftWarn(StoreAudit.auditFindings(spark, path,
            keepGens = keepGens))
          .foreach(w2 => recluster(s"survived the purge — $w2"))
      case Some(why) => recluster(why)
      case None if backlog(findings) =>
        purge("pending tombstones purged under the caller's retention")
      case None => ()
    }
    ExactIvf.gcReclusterEpochs(spark, path, keepEpochs, epochKeepAgeMs)
    acts.toSeq
  }

  /** Maintain an IVFADC store: retrain on drift (fresh quantizers at
    * the recorded geometry — codes are lossy, so the caller's standing
    * `emb` table feeds the rebuild), else purge-compact on a backlog,
    * then epoch GC. */
  def maintainIvfadcStore(spark: SparkSession, emb: DataFrame,
                          path: String,
                          keepGens: Int = 1, keepAgeMs: Long = 0L,
                          keepEpochs: Int = 1, epochKeepAgeMs: Long = 0L,
                          iters: Int = 1): Seq[Action] = {
    val findings = StoreAudit.auditFindings(spark, path,
      keepGens = keepGens)
    val io = ioErrors(path, findings)
    if (io.nonEmpty) return io
    val acts = scala.collection.mutable.ArrayBuffer.empty[Action]
    // no purge-first here (unlike the vec family): the PQ-family gauge
    // is quantization error recorded at encode time — tombstones never
    // inflate it, so a purge cannot clear a qerr drift warn and the
    // retrain (which reads visible rows) is also the purge. The
    // served-recall gauge (round 16) composes as OR: ranking erosion
    // measured directly fires the same lever. A recall ERROR
    // (unattainable floor, round 17) is surfaced and never retrained.
    acts ++= recallErrors(path, findings)
    val recallTrig = recallWarn(findings)
    driftWarn(findings).orElse(recallTrig) match {
      case Some(why) =>
        val (nCells, m, dim, nCents) = (
          geoInt(spark, path, "n_cells", "maintainIvfadcStore"),
          geoInt(spark, path, "m", "maintainIvfadcStore"),
          geoInt(spark, path, "dim", "maintainIvfadcStore"),
          geoInt(spark, path, "n_cents", "maintainIvfadcStore"))
        Pq.retrainIvfadcStore(spark, emb, path, nCells, m, dim, nCents,
          iters, vecCol = geoVecCol(spark, path))
        if (recallTrig.isDefined) flagRecallRetrain(spark, path)
        acts += Action(path, "retrain",
          s"nCells=$nCells m=$m nCents=$nCents (drift: $why)")
      case None if backlog(findings) =>
        Pq.compactCodesStore(spark, path, keepGens, keepAgeMs)
        acts += Action(path, "purge-compact",
          "pending tombstones purged under the caller's retention")
      case None => ()
    }
    ExactIvf.gcReclusterEpochs(spark, path, keepEpochs, epochKeepAgeMs)
    acts.toSeq
  }

  /** Maintain a flat PQ store: retrain on drift, else purge-compact,
    * then epoch GC. */
  def maintainPqStore(spark: SparkSession, emb: DataFrame, path: String,
                      keepGens: Int = 1, keepAgeMs: Long = 0L,
                      keepEpochs: Int = 1, epochKeepAgeMs: Long = 0L,
                      iters: Int = 1): Seq[Action] = {
    val findings = StoreAudit.auditFindings(spark, path,
      keepGens = keepGens)
    val io = ioErrors(path, findings)
    if (io.nonEmpty) return io
    val acts = scala.collection.mutable.ArrayBuffer.empty[Action]
    acts ++= recallErrors(path, findings)
    val recallTrig = recallWarn(findings)
    driftWarn(findings).orElse(recallTrig) match {
      case Some(why) =>
        val (m, dim, nCents) = (
          geoInt(spark, path, "m", "maintainPqStore"),
          geoInt(spark, path, "dim", "maintainPqStore"),
          geoInt(spark, path, "n_cents", "maintainPqStore"))
        Pq.retrainPqStore(spark, emb, path, m, dim, nCents, iters,
          vecCol = geoVecCol(spark, path))
        if (recallTrig.isDefined) flagRecallRetrain(spark, path)
        acts += Action(path, "retrain",
          s"m=$m nCents=$nCents (drift: $why)")
      case None if backlog(findings) =>
        Pq.compactCodesStore(spark, path, keepGens, keepAgeMs)
        acts += Action(path, "purge-compact",
          "pending tombstones purged under the caller's retention")
      case None => ()
    }
    ExactIvf.gcReclusterEpochs(spark, path, keepEpochs, epochKeepAgeMs)
    acts.toSeq
  }

  /** ESTATE-LEVEL maintenance fan-out (round 16 — VERDICT r15 #4): a
    * hundred-store estate previously needed a hand-written driver loop
    * because the retrain lever needs each store's raw-embeddings table,
    * which discovery cannot conjure. The build-time `emb_source`
    * manifest pointer (a parquet path or table/view name, recorded by
    * `writePqStore`/`writeIvfadcStore` and carried across retrains)
    * closes that: discovery walks the lake
    * ([[StoreAudit.discoverStoreRoots]] — the estate fsck's walk), and
    * each discovered store gets its family's right lever in one call:
    *
    *   - `exact_ivf` → [[maintainVecStore]] (purge-first, recluster);
    *   - `ivfadc` / `pq` → resolve the recorded `emb_source` through
    *     `resolveEmb` (default: catalog table/view name, else a parquet
    *     path) and [[maintainIvfadcStore]]/[[maintainPqStore]]; when a
    *     retrain trigger stands but the source does not resolve, the
    *     store is SKIPPED AND REPORTED (never half-maintained) — the
    *     backlog purge and epoch GC, which need no embeddings, still
    *     run;
    *   - an `index_postings` sub marks its PARENT as a BM25/positional
    *     index root → [[maintainIndexStore]];
    *   - sub-table families (`index_doclen`, `positional`, `*_tombs`)
    *     are owned by their parent's pass;
    *   - ingest-owned families (signature / code / gram / dsir) get
    *     their compactor on a standing tombstone backlog, and an
    *     unknown family with a backlog is skip-and-reported
    *     ([[maintainIngestOwnedStore]], round 17) — never walked past
    *     silently.
    *
    * Idempotent like the per-store loops (every lever resets its
    * gauge), so one cron cadence can own a whole lake prefix. A store
    * whose pass throws yields an `error` action naming it — one broken
    * store never takes down the estate pass. */
  def maintainEstate(spark: SparkSession, root: String,
                     maxDepth: Int = 4,
                     keepGens: Int = 1, keepAgeMs: Long = 0L,
                     keepEpochs: Int = 1, epochKeepAgeMs: Long = 0L,
                     iters: Int = 1,
                     resolveEmb: String => Option[DataFrame] = null,
                     recallProbes: Int = 0,
                     recallK: Int = 10, recallNprobe: Int = 4,
                     recallKShort: Int = 100,
                     recallFloor: Double = 0.5)
      : Seq[Action] = {
    val resolver: String => Option[DataFrame] =
      Option(resolveEmb).getOrElse(defaultEmbResolver(spark))
    val roots = StoreAudit.discoverStoreRoots(spark, root, maxDepth)
    if (roots.isEmpty)
      return Seq(Action(root, "skip",
        s"no stores discovered under $root (depth $maxDepth) — " +
          "pre-manifest stores are invisible to discovery; adopt them " +
          "(StoreFs.adoptLegacyStore) or maintain by explicit path"))
    val withFam = roots.map(p => p -> StoreFs
      .readGeometry(spark, StoreFs.liveRoot(spark, p))
      .getOrElse("family", ""))
    val subsumed = Set("index_doclen", "positional")
    def guarded(p: String)(pass: => Seq[Action]): Seq[Action] =
      try pass catch { case e: Exception =>
        Seq(Action(p, "error",
          s"maintenance pass failed (estate continues): ${e.getMessage}"))
      }
    val perStore = withFam.flatMap {
      case (p, "exact_ivf") => guarded(p)(
        maintainVecStore(spark, p, keepGens, keepAgeMs, keepEpochs,
          epochKeepAgeMs, iters = iters))
      case (p, fam @ ("ivfadc" | "pq")) => guarded(p)(
        maintainPqFamilyResolved(spark, p, fam, resolver, keepGens,
          keepAgeMs, keepEpochs, epochKeepAgeMs, iters))
      case (p, "index_postings") => guarded(p)(
        maintainIndexStore(spark,
          new org.apache.hadoop.fs.Path(p).getParent.toString,
          keepGens, keepAgeMs))
      case (_, f) if subsumed(f) || f.endsWith("_tombs") => Seq.empty
      // ingest-owned families (round 17 — VERDICT r16 #4): signature /
      // code / gram / dsir stores have no drift lever, but their
      // tombstone/delta backlogs were walked right past when the
      // owning ingest was decommissioned — the estate pass now runs
      // their compactor on a standing backlog (or skip-and-reports a
      // family it has no compactor for), never silent.
      case (p, f) if f.nonEmpty => guarded(p)(
        maintainIngestOwnedStore(spark, p, f, keepGens, keepAgeMs))
      case _ => Seq.empty
    }
    // RECALL CADENCE (round 16, opt-in via recallProbes > 0; round 17
    // extends it to the flat-PQ family — VERDICT r16 #1, the last
    // ungauged ranking channel): after the levers, run the
    // served-recall panel on every IVFADC and flat-PQ store whose
    // gauge is MISSING or STALE (no record, or appends landed after the
    // newest panel) and whose emb_source resolves — the panel the fsck's
    // `recall` check grades, now owned by the same cron that owns the
    // levers (servedRecallPanel serves each store through ITS family's
    // production path). Fresh records are never re-graded (the
    // staleness gate is what keeps the second estate pass at zero
    // actions), and a store that was just retrained above starts
    // ungauged, so the SAME pass grades its new epoch.
    val panels =
      if (recallProbes <= 0) Seq.empty
      else withFam.collect { case (p, "ivfadc" | "pq") => p }.flatMap { p =>
        guarded(p) {
          val eff = StoreFs.liveRoot(spark, p)
          val rec = StoreFs.readRecallStats(spark, eff)
          val newestAppend = StoreFs.readBatchStats(spark, eff)
            .lastOption
            .flatMap(_._1.stripPrefix("stats-").take(16).toLongOption)
          val stale = rec.isEmpty || {
            (rec.get("at_ms").flatMap(_.toLongOption), newestAppend) match {
              case (Some(t), Some(b)) => b > t
              case (None, _)          => true
              case _                  => false
            }
          }
          val src = StoreFs.readGeometry(spark, eff)
            .getOrElse("emb_source", "")
          (if (!stale) None
           else resolver(src) match {
             case None => Some(Action(p, "skip",
               s"recall gauge ${if (rec.isEmpty) "missing" else "stale"} " +
                 s"but emb_source ${
                   if (src.isEmpty) "is not recorded"
                   else s"'$src' does not resolve"} — the panel needs " +
                 "the embeddings table (Pq.servedRecallPanel)"))
             case Some(emb) =>
               // floor preference (round 17 — VERDICT r16 #2): the
               // manifest's epoch-durable recall_floor (carried across
               // retrains like emb_source) > the newest record's floor
               // > the caller's default — so a retrain no longer
               // resets the store's declared contract to 0.5
               val floor = StoreFs.readGeometry(spark, eff)
                 .get("recall_floor").flatMap(_.toDoubleOption)
                 .orElse(rec.get("floor").flatMap(_.toDoubleOption))
                 .getOrElse(recallFloor)
               val (m, dim) = (
                 geoInt(spark, p, "m", "maintainEstate recall panel"),
                 geoInt(spark, p, "dim", "maintainEstate recall panel"))
               val vecCol = geoVecCol(spark, p)
               val probes = Similarity.boundedProbeIds(emb, recallProbes)
               val row = Pq.servedRecallPanel(spark,
                   Seq(("estate", p, floor)), emb, probes,
                   recallNprobe, recallKShort, recallK, m, dim, vecCol)
                 .collect().head
               Some(Action(p, "recall-panel",
                 f"served recall ${row.getAs[Double]("recall")}%.4f " +
                   f"recorded (floor $floor%.2f, k=$recallK, " +
                   s"n_probes=${row.getAs[Long]("n_probes")})"))
           }).toSeq
        }
      }
    perStore ++ panels
  }

  /** Default `emb_source` resolution: a catalog table/view name wins;
    * otherwise the string is read as a parquet path. Unresolvable (or
    * empty) → None, which the estate pass reports instead of acting. */
  def defaultEmbResolver(spark: SparkSession)(src: String)
      : Option[DataFrame] =
    if (src.isEmpty) None
    else {
      // a path-shaped source makes tableExists THROW (invalid name),
      // not return false — each probe fails independently so the
      // parquet fallback always gets its chance
      val byName =
        try {
          if (spark.catalog.tableExists(src)) Some(spark.table(src))
          else None
        } catch { case _: Exception => None }
      byName.orElse(
        try Some(spark.read.parquet(src))
        catch { case _: Exception => None })
    }

  private def maintainPqFamilyResolved(spark: SparkSession, path: String,
                                       fam: String,
                                       resolver: String => Option[DataFrame],
                                       keepGens: Int, keepAgeMs: Long,
                                       keepEpochs: Int,
                                       epochKeepAgeMs: Long,
                                       iters: Int): Seq[Action] = {
    val src = StoreFs.readGeometry(spark, StoreFs.liveRoot(spark, path))
      .getOrElse("emb_source", "")
    resolver(src) match {
      case Some(emb) if fam == "ivfadc" =>
        maintainIvfadcStore(spark, emb, path, keepGens, keepAgeMs,
          keepEpochs, epochKeepAgeMs, iters)
      case Some(emb) =>
        maintainPqStore(spark, emb, path, keepGens, keepAgeMs,
          keepEpochs, epochKeepAgeMs, iters)
      case None =>
        // the reduced pass: everything that needs no embeddings still
        // runs (backlog purge, epoch GC); a standing retrain trigger is
        // reported, never half-acted on
        val findings = StoreAudit.auditFindings(spark, path,
          keepGens = keepGens)
        val io = ioErrors(path, findings)
        if (io.nonEmpty) return io
        val acts = scala.collection.mutable.ArrayBuffer.empty[Action]
        acts ++= recallErrors(path, findings)
        driftWarn(findings).orElse(recallWarn(findings)).foreach { why =>
          acts += Action(path, "skip",
            s"retrain trigger stands but emb_source ${
              if (src.isEmpty) "is not recorded" else s"'$src' does not resolve"
            } — record one at build (write*Store(embSource=…)) or run " +
              s"maintain${if (fam == "ivfadc") "Ivfadc" else "Pq"}Store " +
              s"with the embeddings table (trigger: $why)")
        }
        if (backlog(findings)) {
          Pq.compactCodesStore(spark, path, keepGens, keepAgeMs)
          acts += Action(path, "purge-compact",
            "pending tombstones purged under the caller's retention")
        }
        ExactIvf.gcReclusterEpochs(spark, path, keepEpochs,
          epochKeepAgeMs)
        acts.toSeq
    }
  }

  /** Estate-level attention for the INGEST-OWNED store families
    * (round 17 — VERDICT r16 #4): signature / code / gram / dsir
    * stores have no drift gauge (no frozen quantizers) and their
    * compaction normally rides the ingest cadence — but an ORPHANED
    * store (ingest decommissioned, deletes still arriving) accumulated
    * a tombstone backlog the estate pass walked right past. Now: a
    * standing backlog pulls the family's own compactor (which is also
    * the purge); a family this loop has no compactor for is
    * skip-and-reported, never silent. Clean stores stay zero-action
    * (the estate idempotency contract). */
  def maintainIngestOwnedStore(spark: SparkSession, path: String,
                               family: String,
                               keepGens: Int = 1, keepAgeMs: Long = 0L)
      : Seq[Action] = {
    val findings = StoreAudit.auditFindings(spark, path,
      keepGens = keepGens)
    val io = ioErrors(path, findings)
    if (io.nonEmpty) return io
    if (!backlog(findings)) return Seq.empty
    family match {
      case "signature" =>
        Dedup.compactSignatureStore(spark, path, keepGens, keepAgeMs)
        Seq(Action(path, "purge-compact",
          "pending tombstones purged under the caller's retention " +
            "(estate lever for an ingest-owned signature store)"))
      case "code" =>
        Quantization.compactCodeStore(spark, path, keepGens, keepAgeMs)
        Seq(Action(path, "purge-compact",
          "generations folded under the caller's retention " +
            "(estate lever for an ingest-owned code store)"))
      case "gram" =>
        Dedup.compactGramStore(spark, path, keepGens, keepAgeMs)
        Seq(Action(path, "purge-compact",
          "gram counts netted and purged under the caller's retention " +
            "(estate lever for an ingest-owned gram store)"))
      case "dsir" =>
        Curation.compactDsirStore(spark, path, keepGens, keepAgeMs)
        Seq(Action(path, "purge-compact",
          "bucket counts folded under the caller's retention " +
            "(estate lever for an ingest-owned dsir store)"))
      case f =>
        Seq(Action(path, "skip",
          s"standing tombstone backlog but the estate loop has no " +
            s"compactor for family '$f' — run its ingest cadence's " +
            "compactor by explicit path"))
    }
  }

  /** Maintain a BM25/positional index store: purge-compact on a
    * tombstone backlog (the lexical family has no frozen quantizers,
    * so there is no drift lever — stats shift exactly at every
    * delete). */
  def maintainIndexStore(spark: SparkSession, path: String,
                         keepGens: Int = 1, keepAgeMs: Long = 0L)
      : Seq[Action] = {
    val findings = StoreAudit.auditFindings(spark, path,
      keepGens = keepGens)
    val io = ioErrors(path, findings)
    if (io.nonEmpty) return io
    if (backlog(findings)) {
      Retrieval.compactIndexStore(spark, path, keepGens, keepAgeMs)
      Seq(Action(path, "purge-compact",
        "pending tombstones purged under the caller's retention"))
    } else Seq.empty
  }
}
