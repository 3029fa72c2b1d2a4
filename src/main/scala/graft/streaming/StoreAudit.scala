package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Invariant auditor for the incremental-store layout ([[StoreFs]]) —
  * the fsck a 100 TB operator runs before trusting a store that has
  * lived through crashes, restarts and compactions. Every layout
  * contract the store families rely on is checked and reported as a
  * finding row, so a fleet of stores can be audited in one pass and the
  * reports unioned into a single health table:
  *
  *   - `generation-layout`: commit markers must pair with their
  *     generation directories (an orphan marker means the live data was
  *     deleted out-of-band — every read of the store fails), at most
  *     one uncommitted carcass may await reclaim, and generations past
  *     their grace window should have been GC'd (wasted storage, and a
  *     sign the compaction cadence stopped).
  *   - `seal`: a `_graft_sealed` file that EXISTS but does not parse is
  *     reported — [[StoreFs.sealedThrough]] reads it as "no seal",
  *     which is the safe direction (replays anti-join instead of
  *     skipping), but the operator should know the watermark is gone
  *     because every restart now pays the anti-join scan.
  *   - `markers`: per-batch `_graft_batch_*` markers at or below the
  *     seal are redundant (the seal subsumes them; compaction cleans
  *     them) — their presence marks a half-finished seal pass.
  *   - `frontier` (multi-table stores): per-sub max batch tags that
  *     disagree mark a torn frontier batch awaiting its replay heal —
  *     expected after a crash, INFO. A SEAL covering ids past the
  *     frontier min is the data-loss condition the multi-table seal
  *     exists to prevent (the replay would no-op and the unlanded
  *     subs' rows are gone) — ERROR.
  *   - `keys` (deep audit): the visible data must hold each natural
  *     key once — a duplicate means an ingest bypassed the anti-join
  *     contract and top-k / BM25 answers double-count until a
  *     compaction dedups. This is the only check that scans data; it
  *     reads the key columns only, one aggregation per store.
  *
  * All filesystem checks are bounded listing/read RPCs on the store
  * root and its live generation — no data files are opened — so the
  * shallow audit is safe to run on a cadence against production-sized
  * stores. Levels: `error` (answers are or will be wrong), `warn`
  * (degraded but correct), `info` (expected transient state). */
object StoreAudit {

  final case class Finding(store: String, check: String, level: String,
                           detail: String)

  /** Shallow (filesystem-only) audit of one store directory. For a
    * multi-table store pass its sub-table directories in `subDirs`
    * (markers and the seal live at `dir` itself, per the
    * [[StoreFs.sealTagMarkersMulti]] contract); a single-table store
    * passes none and is checked in place. */
  def auditFindings(spark: SparkSession, dir: String,
                    subDirs: Seq[String] = Seq.empty): Seq[Finding] = {
    val layoutTargets = if (subDirs.isEmpty) Seq(dir) else subDirs
    val layout = layoutTargets.flatMap(d => generationFindings(spark, d))
    // marker root: the store dir itself (resolved through its own
    // pointer for single-table stores; multi-table roots are never
    // swapped, so resolution is the identity there)
    val (fs, markerP) = StoreFs.resolved(spark, dir)
    val seal = sealFindings(fs, markerP, dir)
    val sealId = StoreFs.sealedThrough(fs, markerP)
    val markers = markerFindings(fs, markerP, dir, sealId)
    val frontier =
      if (subDirs.isEmpty) Seq.empty
      else frontierFindings(spark, dir, subDirs, sealId)
    layout ++ seal ++ markers ++ frontier
  }

  /** Deep audit: the shallow findings plus the natural-key uniqueness
    * scan over the visible data. `keyCols` is the store's natural key
    * (e.g. `doc_id` for signatures, `term, doc_id` for postings); for
    * a multi-table store give one entry per sub in `subDirs` order. */
  def auditDeep(spark: SparkSession, dir: String,
                keyCols: Seq[String],
                subDirs: Seq[String] = Seq.empty,
                subKeyCols: Seq[Seq[String]] = Seq.empty): DataFrame = {
    val shallow = auditFindings(spark, dir, subDirs)
    val keyed: Seq[(String, Seq[String])] =
      if (subDirs.isEmpty) Seq(dir -> keyCols)
      else subDirs.zip(
        if (subKeyCols.nonEmpty) subKeyCols else Seq.fill(subDirs.size)(keyCols))
    val dups = keyed.flatMap { case (d, keys) => keyFindings(spark, d, keys) }
    toDf(spark, shallow ++ dups)
  }

  /** [[auditFindings]] as a DataFrame — the fleet-audit entry point:
    * union the result over every store path in the estate. */
  def audit(spark: SparkSession, dir: String,
            subDirs: Seq[String] = Seq.empty): DataFrame =
    toDf(spark, auditFindings(spark, dir, subDirs))

  private def toDf(spark: SparkSession, fs: Seq[Finding]): DataFrame = {
    import spark.implicits._
    fs.toDF()
  }

  // ---- generation layout ---------------------------------------------

  private def generationFindings(spark: SparkSession,
                                 dir: String): Seq[Finding] = {
    val (fs, p) = StoreFs.fsPath(spark, dir)
    if (!fs.exists(p)) return Seq.empty
    val names = fs.listStatus(p).map(_.getPath.getName).toSeq
    val commits = names.filter(_.startsWith(StoreFs.commitPrefix))
      .map(_.stripPrefix(StoreFs.commitPrefix).toLong).sorted
    val gens = names.filter(_.startsWith(StoreFs.genPrefix))
      .map(_.stripPrefix(StoreFs.genPrefix).toLong).sorted
    val live = commits.maxOption
    val orphanCommits = commits.filterNot(gens.contains)
    val orphan = orphanCommits.map(n => Finding(dir, "generation-layout",
      "error", s"commit marker _graft_commit_$n has no _gen-$n directory" +
        " — the committed generation was deleted out-of-band; reads of" +
        " the live store will fail"))
    val carcasses = live match {
      case Some(l) => gens.filter(_ > l)
      case None    => gens
    }
    val carcass =
      if (carcasses.size > 1)
        Seq(Finding(dir, "generation-layout", "warn",
          s"${carcasses.size} uncommitted generation directories" +
            s" (${carcasses.mkString(", ")}) — swapInCompacted reclaims" +
            " only the NEXT generation number; the older carcasses leak" +
            " until removed"))
      else carcasses.map(n => Finding(dir, "generation-layout", "info",
        s"uncommitted generation _gen-$n awaits a compaction (in" +
          " progress, or a crashed compactor the next run reclaims)"))
    val pastGrace = live.toSeq.flatMap { l =>
      val stale = gens.filter(n => n < l - 1)
      val flatRemnants = l >= 2 && names.exists(n =>
        !n.startsWith(StoreFs.genPrefix) &&
          !n.startsWith(StoreFs.commitPrefix) && !n.startsWith("."))
      stale.map(n => Finding(dir, "generation-layout", "warn",
        s"generation _gen-$n is past its grace window (live is $l) and" +
          " should have been GC'd — the compaction cadence may have" +
          " stopped")) ++
        (if (flatRemnants)
           Seq(Finding(dir, "generation-layout", "warn",
             "flat generation-0 files remain at the root past their" +
               s" grace window (live is $l)"))
         else Seq.empty)
    }
    orphan ++ carcass ++ pastGrace
  }

  // ---- seal + markers ------------------------------------------------

  private def sealFindings(fs: FileSystem, p: Path,
                           dir: String): Seq[Finding] = {
    val f = new Path(p, "_graft_sealed")
    if (fs.exists(f) && StoreFs.sealedThrough(fs, p).isEmpty)
      Seq(Finding(dir, "seal", "warn",
        "_graft_sealed exists but its content does not parse — replays" +
          " fall back to the anti-join (correct but pays a scan per" +
          " restarted batch); re-run a compaction to rewrite it"))
    else Seq.empty
  }

  private def markerFindings(fs: FileSystem, p: Path, dir: String,
                             sealId: Option[Long]): Seq[Finding] =
    sealId.toSeq.flatMap { seal =>
      if (!fs.exists(p)) Seq.empty
      else {
        val redundant = fs.listStatus(p).map(_.getPath.getName)
          .filter(_.startsWith("_graft_batch_"))
          .map(_.stripPrefix("_graft_batch_").toLong)
          .filter(_ <= seal)
        if (redundant.isEmpty) Seq.empty
        else Seq(Finding(dir, "markers", "warn",
          s"${redundant.length} per-batch marker(s) at or below the seal" +
            s" ($seal) — subsumed by the watermark; a seal pass stopped" +
            " before cleaning them"))
      }
    }

  // ---- multi-table frontier ------------------------------------------

  private def frontierFindings(spark: SparkSession, dir: String,
                               subDirs: Seq[String],
                               sealId: Option[Long]): Seq[Finding] = {
    val maxPerSub = subDirs.map(d => d -> StoreFs.maxRealTag(spark, d))
    val present = maxPerSub.collect { case (d, Some(m)) => d -> m }
    val torn =
      if (present.size > 1 && present.map(_._2).distinct.size > 1)
        Seq(Finding(dir, "frontier", "info",
          "per-sub max batch tags disagree (" +
            present.map { case (d, m) =>
              s"${new Path(d).getName}=$m" }.mkString(", ") +
            ") — a torn frontier batch awaits its replay heal"))
      else Seq.empty
    // the data-loss condition sealTagMarkersMulti exists to prevent:
    // the seal covers a batch id some sub never landed
    val overSealed = for {
      seal <- sealId.toSeq
      (d, m) <- present if m < seal
    } yield Finding(dir, "frontier", "error",
      s"the seal ($seal) covers batch ids past ${new Path(d).getName}'s" +
        s" max landed tag ($m) — a replay of the covered batches will" +
        " no-op and their rows in that sub-table are lost; restore the" +
        " seal to the frontier min or re-ingest the covered batches")
    torn ++ overSealed
  }

  // ---- deep: natural-key uniqueness ----------------------------------

  private def keyFindings(spark: SparkSession, dir: String,
                          keys: Seq[String]): Seq[Finding] = {
    if (!StoreFs.storeExists(spark, dir)) return Seq.empty
    val src = spark.read.option("mergeSchema", "true")
      .parquet(StoreFs.dataDir(spark, dir))
    if (!keys.forall(src.columns.contains)) return Seq.empty
    val dup = src.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .agg(count(lit(1)), max("n")).collect()(0)
    if (dup.isNullAt(1) || dup.getLong(0) == 0L) Seq.empty
    else Seq(Finding(dir, "keys", "error",
      s"${dup.getLong(0)} natural key(s) (${keys.mkString(", ")}) appear" +
        s" more than once (worst ×${dup.getLong(1)}) — an ingest" +
        " bypassed the anti-join contract; serving answers double-count" +
        " until a compaction dedups"))
  }
}
