package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Store-directory probes for the foreachBatch dedup cadences, resolved
  * through the Hadoop FileSystem of the ACTIVE SESSION — not
  * `java.io.File`, which silently answers "absent" for every path on a
  * non-local filesystem (HDFS/S3 — where a 100 TB store actually
  * lives): replay markers would never be seen, every restart would
  * re-process appended batches, and an overwrite-mode bootstrap would
  * destroy the store it failed to detect. */
private[graft] object StoreFs {

  private def fsAndPath(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Has `batchId`'s append been recorded — either its own
    * `_graft_batch_<id>` marker, or a compaction's `_graft_sealed`
    * watermark covering id ≤ its recorded value? The watermark is
    * sound because foreachBatch commits batches SEQUENTIALLY: if any
    * batch M's rows are in the store, every batch < M completed fully,
    * so a restart can only ever replay the store's MAXIMUM id — which
    * the seal covers. Cost per call: two bounded RPCs (exists + a
    * ≤ 32-byte read), never a directory listing — the markers live
    * beside the data files of a store that can hold thousands of
    * objects. */
  def markerExists(spark: SparkSession, dir: String, batchId: Long): Boolean = {
    val (fs, p) = fsAndPath(spark, dir)
    fs.exists(new Path(p, s"_graft_batch_$batchId")) ||
      sealedThrough(fs, p).exists(batchId <= _)
  }

  /** The fixed-name `_graft_sealed` file holds the sealed-through id as
    * text; unreadable/absent/torn content reads as "no seal" — the
    * conservative direction (a replay runs its anti-join instead of
    * skipping). */
  private[streaming] def sealedThrough(fs: FileSystem, p: Path): Option[Long] = {
    val f = new Path(p, "_graft_sealed")
    if (!fs.exists(f)) None
    else
      try {
        val in = fs.open(f)
        try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
        finally in.close()
      } catch { case _: Exception => None }
  }

  private def writeSeal(fs: FileSystem, p: Path, id: Long): Unit = {
    val out = fs.create(new Path(p, "_graft_sealed"), true)
    try out.write(id.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Record that `batchId`'s append landed (idempotent overwrite). */
  def writeMarker(spark: SparkSession, dir: String, batchId: Long): Unit = {
    val (fs, p) = fsAndPath(spark, dir)
    fs.create(new Path(p, s"_graft_batch_$batchId"), true).close()
  }

  /** Atomic-swap rewrite of a store directory: `writeTo` materializes
    * the new generation into a sibling `._compact_tmp` directory; only
    * after it completes is the live directory renamed aside and the new
    * one renamed into place, and the old generation is deleted LAST. A
    * crash mid-`writeTo` leaves the live store untouched (stale tmp is
    * reclaimed on the next call); a crash between the two renames leaves
    * a complete copy at `._compact_old` — recoverable by hand — instead
    * of the in-place overwrite's empty directory, which IncrementalDedup
    * would silently treat as a fresh corpus and re-admit every
    * duplicate. Renames are metadata-only on HDFS/local FS; the
    * store-absent window is two namespace ops, never a data copy.
    *
    * `_graft_batch_<id>` replay markers are CARRIED ACROSS the swap
    * (copied into the new generation before the rename): a streaming
    * ingest whose batch was appended (marker written) but whose
    * checkpoint had not yet committed when compaction ran still hits
    * the marker fast path on restart — without this, the replay would
    * re-append every row of that batch onto the compacted generation
    * and duplicate its natural keys (ADVICE r9). */
  def swapInCompacted(spark: SparkSession, dir: String)
                     (writeTo: String => Unit): Unit = {
    val (fs, p) = fsAndPath(spark, dir)
    val tmp = new Path(p.getParent, p.getName + "._compact_tmp")
    val old = new Path(p.getParent, p.getName + "._compact_old")
    fs.delete(tmp, true)
    fs.delete(old, true)
    writeTo(tmp.toString)
    if (fs.exists(p)) {
      fs.listStatus(p).map(_.getPath.getName)
        .filter(_.startsWith("_graft_batch_"))
        .foreach(n => fs.create(new Path(tmp, n), true).close())
      // the seal carries CONTENT (the sealed-through id) — copy bytes,
      // not just the name
      sealedThrough(fs, p).foreach(writeSeal(fs, tmp, _))
    }
    if (fs.exists(p) && !fs.rename(p, old))
      throw new java.io.IOException(s"compact: could not move $p aside")
    if (!fs.rename(tmp, p)) {
      fs.rename(old, p) // best-effort restore of the live generation
      throw new java.io.IOException(s"compact: could not move $tmp into place")
    }
    fs.delete(old, true)
  }

  /** Seal every batch tag PRESENT IN THE STORE under one
    * `_graft_sealed_<maxId>` watermark — called by compactors before
    * the tag-collapsing rewrite (ADVICE r10): an append whose rows
    * committed but whose marker write was lost (the one crash window
    * the row-level anti-join covers) is healed pre-compaction by the
    * anti-join seeing its tagged rows; post-compaction the tags are
    * folded into the −1 sentinel, so the replay guard must exist
    * BEFORE the fold or a checkpoint replay of that batch re-appends
    * every row. One watermark file covers every id ≤ max (sound per
    * the [[markerExists]] sequential-commit argument), and the
    * now-redundant per-batch `_graft_batch_*` markers are cleaned up —
    * marker count stays O(1) instead of growing with stream lifetime
    * (a year of 5-minute batches is ~10⁵ marker files otherwise).
    * Idempotent. */
  def sealTagMarkers(spark: SparkSession, dir: String,
                     markerDir: Option[String] = None): Unit = {
    if (!storeExists(spark, dir)) return
    val src = spark.read.option("mergeSchema", "true").parquet(dir)
    if (!src.columns.contains("batch_id")) return
    // the tagless base generation reads its tag as NULL under
    // mergeSchema — only real (≥ 0) batch ids count
    val ids = src.select("batch_id").distinct().collect()
      .filter(!_.isNullAt(0)).map(_.getLong(0)).filter(_ >= 0L)
    if (ids.isEmpty) return
    val (fs, p) = fsAndPath(spark, markerDir.getOrElse(dir))
    val newSeal = math.max(ids.max, sealedThrough(fs, p).getOrElse(-1L))
    writeSeal(fs, p, newSeal)
    // per-batch markers AT OR BELOW the seal are subsumed — reclaim
    // them. Markers ABOVE it must stay: a marker-only batch (all rows
    // gated out or duplicate — a marker written, no tagged rows landed)
    // has an id past every store tag, and deleting its marker would
    // make a checkpoint replay re-emit that batch downstream (the
    // at-most-once guard the marker-before-emit ordering exists for).
    fs.listStatus(p).map(_.getPath).foreach { f =>
      val n = f.getName
      if (n.startsWith("_graft_batch_") &&
          n.stripPrefix("_graft_batch_").toLong <= newSeal)
        fs.delete(f, false)
      ()
    }
  }

  /** Does the directory hold a parquet store (data files or _SUCCESS)? */
  def storeExists(spark: SparkSession, dir: String): Boolean = {
    val (fs, p) = fsAndPath(spark, dir)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      n == "_SUCCESS" || n.endsWith(".parquet")
    }
  }
}
