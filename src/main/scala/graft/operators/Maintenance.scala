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

  private def backlog(fs: Seq[StoreAudit.Finding]): Boolean =
    fs.exists(f => f.check == "tombstones" && f.level == "info")

  private def geoInt(spark: SparkSession, path: String, key: String,
                     what: String): Int =
    StoreFs.readGeometry(spark, StoreFs.liveRoot(spark, path))
      .get(key).flatMap(_.toIntOption)
      .getOrElse(throw new IllegalArgumentException(
        s"$what needs '$key' in the geometry manifest at $path to " +
          "rebuild at the store's own geometry — pass the store through " +
          "its writer once (pre-manifest stores predate the levers)"))

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
    val acts = scala.collection.mutable.ArrayBuffer.empty[Action]
    driftWarn(findings) match {
      case Some(why) =>
        val nCells =
          if (reclusterCells > 0) reclusterCells
          else geoInt(spark, path, "n_cells", "maintainVecStore")
        ExactIvf.reclusterVecStore(spark, path, nCells, iters)
        acts += Action(path, "recluster",
          s"nCells=$nCells (drift: $why)")
      case None if backlog(findings) =>
        ExactIvf.compactVecStore(spark, path, keepGens, keepAgeMs)
        acts += Action(path, "purge-compact",
          "pending tombstones purged under the caller's retention")
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
    val acts = scala.collection.mutable.ArrayBuffer.empty[Action]
    driftWarn(findings) match {
      case Some(why) =>
        val (nCells, m, dim, nCents) = (
          geoInt(spark, path, "n_cells", "maintainIvfadcStore"),
          geoInt(spark, path, "m", "maintainIvfadcStore"),
          geoInt(spark, path, "dim", "maintainIvfadcStore"),
          geoInt(spark, path, "n_cents", "maintainIvfadcStore"))
        Pq.retrainIvfadcStore(spark, emb, path, nCells, m, dim, nCents,
          iters)
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
    val acts = scala.collection.mutable.ArrayBuffer.empty[Action]
    driftWarn(findings) match {
      case Some(why) =>
        val (m, dim, nCents) = (
          geoInt(spark, path, "m", "maintainPqStore"),
          geoInt(spark, path, "dim", "maintainPqStore"),
          geoInt(spark, path, "n_cents", "maintainPqStore"))
        Pq.retrainPqStore(spark, emb, path, m, dim, nCents, iters)
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

  /** Maintain a BM25/positional index store: purge-compact on a
    * tombstone backlog (the lexical family has no frozen quantizers,
    * so there is no drift lever — stats shift exactly at every
    * delete). */
  def maintainIndexStore(spark: SparkSession, path: String,
                         keepGens: Int = 1, keepAgeMs: Long = 0L)
      : Seq[Action] = {
    val findings = StoreAudit.auditFindings(spark, path,
      keepGens = keepGens)
    if (backlog(findings)) {
      Retrieval.compactIndexStore(spark, path, keepGens, keepAgeMs)
      Seq(Action(path, "purge-compact",
        "pending tombstones purged under the caller's retention"))
    } else Seq.empty
  }
}
