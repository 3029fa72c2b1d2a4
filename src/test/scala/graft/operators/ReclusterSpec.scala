package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** Online recluster of the exact-IVF store (round 14): the epoch
  * redirect must cut a complete rebuilt store over ATOMICALLY — serving
  * answers identical before and after (exactness is clustering-
  * independent), pruning restored, appends/deletes/compactions routed
  * to the live epoch, pre-recluster snapshots untouched, and streaming
  * replays healed across the epoch boundary. */
class ReclusterSpec extends AnyFunSuite with SparkTest
    with org.scalatest.BeforeAndAfterEach {

  // every serve pins scoped caches (planServe's probe/bound/pair
  // frames) that the harness mains sweep between queries; a suite that
  // serves dozens of times must sweep too, or the shared test JVM's
  // heap fills across the full run (found as an OOM abort in the
  // 50-suite run — each store build + serve here pins several frames)
  override def afterEach(): Unit = {
    graft.core.Caches.releaseAll()
    spark.catalog.clearCache()
  }

  private val Dim = 8

  /** Two well-separated clusters: ids [0, n) jitter around +1000·(j+1)
    * ("A"), ids [n, 2n) around −1000·(j+1) ("B"). */
  private def cluster(ids: Range, sign: Long) = {
    import spark.implicits._
    ids.map { i =>
      val v = (0 until Dim).map { j =>
        sign * 1000L * (j + 1) + ((i * 31 + j * 17) % 21) - 10L
      }.toArray
      (i.toLong, v)
    }.toDF("doc_id", "vec")
  }

  private def brute(vecs: org.apache.spark.sql.DataFrame,
                    queries: Seq[(Long, Long)], k: Int): Seq[String] = {
    import spark.implicits._
    val qp = queries.toDF("query_id", "probe_id")
    val probes = vecs.join(qp, col("doc_id") === col("probe_id"))
      .select(col("query_id"), col("probe_id"), col("vec").as("qvec"))
    vecs.crossJoin(broadcast(probes))
      .filter(col("doc_id") =!= col("probe_id"))
      .select(col("query_id"), col("doc_id"),
        graft.functions.VectorFunctions.dotLong(col("vec"), col("qvec"))
          .as("dot"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("dot").desc, col("doc_id"))))
      .filter(col("rk") <= k)
      .select("query_id", "doc_id", "dot", "rk")
      .collect().map(_.toString).sorted.toSeq
  }

  private def served(path: String, queries: Seq[(Long, Long)],
                     k: Int): Seq[String] =
    ExactIvf.topDotBatchFromStore(spark, path, queries, k, nprobe0 = 2)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("dot"),
        col("rk"))
      .collect().map(_.toString).sorted.toSeq

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-recluster-").toString

  test("recluster: identical answers, new geometry, pruning restored after drift") {
    val a = cluster(0 until 100, +1L)
    val b = cluster(100 until 200, -1L)
    val path = tmp()
    // build on A only (nCells=2 both in the A region), then append the
    // far-away B — r2max inflates and the A-probe serve stops pruning
    ExactIvf.writeVecStore(a, path, nCells = 2, iters = 1)
    ExactIvf.appendToVecStore(spark, b, path)
    val all = a.unionAll(b)
    val queries = Seq((1L, 7L), (2L, 150L))
    assert(served(path, queries, 15) == brute(all, queries, 15))
    val statsBefore = ExactIvf.pruneStats(spark, path, Seq((1L, 7L)), 15)
      .head()
    val fracBefore = statsBefore.getAs[Long]("survivors").toDouble /
      statsBefore.getAs[Long]("n_cells")
    ExactIvf.reclusterVecStore(spark, path, nCells = 8, iters = 2)
    // answers identical by the exactness guarantee; geometry is new
    assert(served(path, queries, 15) == brute(all, queries, 15))
    val geo = graft.streaming.StoreFs.readGeometry(spark,
      graft.streaming.StoreFs.liveRoot(spark, path))
    assert(geo("n_cells") == "8")
    val statsAfter = ExactIvf.pruneStats(spark, path, Seq((1L, 7L)), 15)
      .head()
    val fracAfter = statsAfter.getAs[Long]("survivors").toDouble /
      statsAfter.getAs[Long]("n_cells")
    assert(fracAfter < fracBefore,
      s"pruning did not improve: $fracBefore -> $fracAfter")
  }

  test("post-recluster appends land in the live epoch; a replayed old-epoch batch heals") {
    import spark.implicits._
    val a = cluster(0 until 80, +1L)
    val path = tmp()
    ExactIvf.writeVecStore(a, path, nCells = 4, iters = 1)
    val batch = cluster(80 until 100, +1L)
    ExactIvf.appendToVecStore(spark, batch, path, batchId = Some(7L))
    ExactIvf.reclusterVecStore(spark, path, nCells = 6, iters = 1)
    val eff = graft.streaming.StoreFs.liveRoot(spark, path)
    assert(eff != path)
    // a checkpoint replay of batch 7 crosses the epoch boundary: no
    // marker in the new epoch, so the anti-join must absorb every row
    ExactIvf.appendToVecStore(spark, batch, path, batchId = Some(7L))
    val live = spark.read.option("mergeSchema", "true")
      .parquet(graft.streaming.StoreFs.dataDir(spark, s"$eff/vecs"))
    assert(live.count() == live.select("vec_id").distinct().count())
    assert(live.count() == 100L)
    // a NEW append lands in the live epoch, not the superseded root
    val more = cluster(100 until 110, +1L)
    ExactIvf.appendToVecStore(spark, more, path, batchId = Some(8L))
    val qs = Seq((1L, 5L))
    assert(served(path, qs, 10) ==
      brute(a.unionAll(batch).unionAll(more), qs, 10))
    val oldVecs = spark.read.option("mergeSchema", "true")
      .parquet(graft.streaming.StoreFs.dataDir(spark, s"$path/vecs"))
    assert(oldVecs.filter(col("vec_id") >= 100L).count() == 0L)
  }

  test("recluster is a purge: tombstoned rows stay deleted and are physically gone in the new epoch") {
    import spark.implicits._
    val a = cluster(0 until 60, +1L)
    val path = tmp()
    ExactIvf.writeVecStore(a, path, nCells = 4, iters = 1)
    ExactIvf.deleteFromVecStore(spark, Seq(11L, 12L).toDF("vec_id"), path)
    ExactIvf.reclusterVecStore(spark, path, nCells = 4, iters = 1)
    val eff = graft.streaming.StoreFs.liveRoot(spark, path)
    val live = spark.read.option("mergeSchema", "true")
      .parquet(graft.streaming.StoreFs.dataDir(spark, s"$eff/vecs"))
    assert(live.filter(col("vec_id").isInCollection(Seq(11L, 12L)))
      .count() == 0L)
    assert(graft.streaming.StoreFs.liveTombsDir(spark, eff).isEmpty)
    val qs = Seq((1L, 5L))
    assert(served(path, qs, 10) ==
      brute(a.filter(!col("doc_id").isInCollection(Seq(11L, 12L))),
        qs, 10))
    // delete-after-recluster still works (routes to the live epoch)
    ExactIvf.deleteFromVecStore(spark, Seq(5L).toDF("vec_id"), path)
    val e = intercept[IllegalArgumentException] {
      served(path, qs, 10)
    }
    assert(e.getMessage.contains("deleted"))
  }

  test("a pre-recluster snapshot keeps serving its pinned epoch") {
    val a = cluster(0 until 60, +1L)
    val path = tmp()
    ExactIvf.writeVecStore(a, path, nCells = 4, iters = 1)
    val snap = ExactIvf.snapshotVecStore(spark, path, freeze = false)
    // recluster DROPS rows (a tombstone lands first) so the live answer
    // provably differs from the pinned one
    import spark.implicits._
    ExactIvf.deleteFromVecStore(spark, Seq(3L).toDF("vec_id"), path)
    ExactIvf.reclusterVecStore(spark, path, nCells = 6, iters = 1)
    val qs = Seq((1L, 7L))
    val pinned = ExactIvf.topDotBatchFromStoreSnapshot(spark, path, snap,
        qs, 10)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("dot"),
        col("rk"))
      .collect().map(_.toString).sorted.toSeq
    assert(pinned == brute(a, qs, 10))
    assert(served(path, qs, 10) ==
      brute(a.filter(col("doc_id") =!= 3L), qs, 10))
    // a snapshot taken AFTER the recluster records the new epoch's subs
    val snap2 = ExactIvf.snapshotVecStore(spark, path, freeze = false)
    val pinned2 = ExactIvf.topDotBatchFromStoreSnapshot(spark, path,
        snap2, qs, 10)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("dot"),
        col("rk"))
      .collect().map(_.toString).sorted.toSeq
    assert(pinned2 == brute(a.filter(col("doc_id") =!= 3L), qs, 10))
  }

  test("IVFADC retrain: epoch cutover equals a fresh build on the visible rows; deletes don't resurrect") {
    import spark.implicits._
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val (m, dim) = (8, 64)
    val path = tmp()
    Pq.writeIvfadcStore(emb, path, nCells = 4, m = m, dim = dim,
      nCents = 8, iters = 1)
    val probes = emb.select("vec_id").orderBy("vec_id").limit(2)
      .collect().map(_.getLong(0)).toSeq
    def serve(p: String): Seq[String] =
      Pq.ivfadcTopKFromStore(spark, p, emb, probes, nprobe = 2,
          kShort = 30, k = 10, m = m, dim = dim)
        .collect().map(_.toString).sorted.toSeq
    val victim = serve(path).map(_.split(",")(1).trim.toLong).head
    Pq.deleteFromCodesStore(spark, Seq(victim).toDF("vec_id"), path)
    // retrain under NEW geometry (nCells 4 -> 6): the cutover must
    // serve exactly what a fresh build over the visible rows serves
    // (integer Lloyd is deterministic, so the reference is exact)
    Pq.retrainIvfadcStore(spark, emb, path, nCells = 6, m = m, dim = dim,
      nCents = 8, iters = 1)
    val ref = tmp()
    Pq.writeIvfadcStore(emb.filter(col("vec_id") =!= victim), ref,
      nCells = 6, m = m, dim = dim, nCents = 8, iters = 1)
    assert(serve(path) == serve(ref))
    assert(!serve(path).exists(_.contains(s",$victim,")))
    val eff = graft.streaming.StoreFs.liveRoot(spark, path)
    assert(eff != path)
    assert(graft.streaming.StoreFs.readGeometry(spark, eff)("n_cells")
      == "6")
    // a post-retrain append encodes under the NEW quantizers and lands
    // in the live epoch
    val extra = emb.limit(5)
      .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
    Pq.appendToIvfadcStore(spark, extra, path, m = m, dim = dim,
      batchId = Some(3L))
    val liveCodes = spark.read.option("mergeSchema", "true")
      .parquet(graft.streaming.StoreFs.dataDir(spark, s"$eff/codes"))
    assert(liveCodes.filter(col("vec_id") >= 900000L).count() == 5L * m)
    val oldCodes = spark.read.option("mergeSchema", "true")
      .parquet(graft.streaming.StoreFs.dataDir(spark, s"$path/codes"))
    assert(oldCodes.filter(col("vec_id") >= 900000L).count() == 0L)
  }

  test("the fsck sees the epoch layer: live epoch, awaiting-GC count, broken top marker, stale reserve") {
    val a = cluster(0 until 40, +1L)
    val path = tmp()
    ExactIvf.writeVecStore(a, path, nCells = 4, iters = 1)
    ExactIvf.reclusterVecStore(spark, path, nCells = 4, iters = 1)
    def findings(): Seq[(String, String, String)] =
      graft.streaming.StoreAudit.audit(spark, path)
        .collect().map(r => (r.getString(1), r.getString(2),
          r.getString(3))).toSeq
    val f1 = findings()
    assert(f1.exists { case (c, l, d) =>
      c == "epoch" && l == "info" && d.contains("live epoch 1") })
    assert(f1.exists { case (c, l, d) =>
      c == "epoch" && l == "info" && d.contains("gcReclusterEpochs") })
    assert(!f1.exists(_._2 == "error"))
    // a stale reservation (crashed rebuild) warns
    val (fs, p) = (new org.apache.hadoop.fs.Path(path))
      .getFileSystem(spark.sessionState.newHadoopConf()) ->
      new org.apache.hadoop.fs.Path(path)
    fs.create(new org.apache.hadoop.fs.Path(p,
      "_graft_root_00000002.reserve"), true).close()
    assert(findings().exists { case (c, l, d) =>
      c == "epoch" && l == "warn" && d.contains("never committed") })
    fs.delete(new org.apache.hadoop.fs.Path(p,
      "_graft_root_00000002.reserve"), false)
    // the silent-stale-fallback hazard is an ERROR: delete the live
    // epoch's directory out-of-band — resolution falls back to epoch 0
    // with no error anywhere else, and only the fsck can say so
    fs.delete(new org.apache.hadoop.fs.Path(p, "_re-00000001"), true)
    assert(findings().exists { case (c, l, d) =>
      c == "epoch" && l == "error" && d.contains("stale data") })
  }

  test("epoch GC reclaims superseded epochs; the live store is untouched") {
    val a = cluster(0 until 50, +1L)
    val path = tmp()
    ExactIvf.writeVecStore(a, path, nCells = 4, iters = 1)
    ExactIvf.reclusterVecStore(spark, path, nCells = 4, iters = 1)
    ExactIvf.reclusterVecStore(spark, path, nCells = 6, iters = 1)
    ExactIvf.reclusterVecStore(spark, path, nCells = 8, iters = 1)
    ExactIvf.gcReclusterEpochs(spark, path, keepEpochs = 1)
    // live = 3, keep 2..3: epoch 0 (root subs) and epoch 1 reclaimed
    assert(!new java.io.File(s"$path/vecs").exists())
    assert(!new java.io.File(s"$path/_re-00000001").exists())
    assert(new java.io.File(s"$path/_re-00000002").exists())
    val qs = Seq((1L, 5L))
    assert(served(path, qs, 10) == brute(a, qs, 10))
    // hybrid-compatible entry points still resolve (compaction routes
    // to the live epoch)
    ExactIvf.compactVecStore(spark, path)
    assert(served(path, qs, 10) == brute(a, qs, 10))
  }

  test("epoch GC refuses a broken top marker and keys its floor to the SERVING epoch") {
    // ADVICE r14 (medium): the floor used to come from the highest
    // marker NAME — with the top marker's directory missing (the state
    // the fsck flags as error), GC kept grace relative to a DEAD epoch
    // and could reclaim the epoch resolution actually serves. Now GC
    // derives the floor from liveRoot and REFUSES when they disagree.
    val a = cluster(0 until 50, +1L)
    val path = tmp()
    ExactIvf.writeVecStore(a, path, nCells = 4, iters = 1)
    ExactIvf.reclusterVecStore(spark, path, nCells = 4, iters = 1)
    ExactIvf.reclusterVecStore(spark, path, nCells = 6, iters = 1)
    val (fs, p) = (new org.apache.hadoop.fs.Path(path))
      .getFileSystem(spark.sessionState.newHadoopConf()) ->
      new org.apache.hadoop.fs.Path(path)
    // break the cutover: the top epoch's directory vanishes out-of-band
    fs.delete(new org.apache.hadoop.fs.Path(p, "_re-00000002"), true)
    val e = intercept[IllegalArgumentException] {
      ExactIvf.gcReclusterEpochs(spark, path, keepEpochs = 1)
    }
    assert(e.getMessage.contains("does not resolve"))
    // nothing was reclaimed: resolution fell back to epoch 1, and both
    // surviving epochs (0 and 1) are intact — serves still answer
    assert(new java.io.File(s"$path/vecs").exists())
    assert(new java.io.File(s"$path/_re-00000001").exists())
    val qs = Seq((1L, 5L))
    assert(served(path, qs, 10) == brute(a, qs, 10))
  }

  test("epoch GC age floor: a superseded epoch younger than keepAgeMs survives keepEpochs") {
    val a = cluster(0 until 50, +1L)
    val path = tmp()
    ExactIvf.writeVecStore(a, path, nCells = 4, iters = 1)
    ExactIvf.reclusterVecStore(spark, path, nCells = 4, iters = 1)
    ExactIvf.reclusterVecStore(spark, path, nCells = 6, iters = 1)
    // live = 2, keepEpochs = 1 → epoch 0 is past the count floor, but
    // its supersession (marker 1's mtime) is seconds old — the age
    // floor must keep it however many reclusters just chained
    ExactIvf.gcReclusterEpochs(spark, path, keepEpochs = 1,
      keepAgeMs = 3600L * 1000L)
    assert(new java.io.File(s"$path/vecs").exists())
    // the fsck's awaiting-GC finding carries per-epoch ages (the
    // operator's reclaimable-when signal)
    val ages = graft.streaming.StoreAudit.audit(spark, path)
      .collect().map(_.getString(3))
      .filter(_.contains("gcReclusterEpochs"))
    assert(ages.exists(_.contains("epoch 0 (superseded")))
    // without the floor the same call reclaims it; serving unaffected
    ExactIvf.gcReclusterEpochs(spark, path, keepEpochs = 1)
    assert(!new java.io.File(s"$path/vecs").exists())
    val qs = Seq((1L, 5L))
    assert(served(path, qs, 10) == brute(a, qs, 10))
  }

  test("single-writer: appends racing a rebuild fail fast; a crashed rebuild's stale lock self-heals") {
    // VERDICT r14 #2: reclusterVecStore used to read, rebuild and
    // commit with no exclusion — an append landing in the old epoch
    // after the rebuild's read was silently absent from the new epoch.
    // The rebuild lock makes the single-writer contract enforced.
    val a = cluster(0 until 40, +1L)
    val path = tmp()
    ExactIvf.writeVecStore(a, path, nCells = 4, iters = 1)
    // simulate an in-flight rebuild holding the lock
    graft.streaming.StoreFs.acquireRebuildLock(spark, path,
      "reclusterVecStore")
    val extra = cluster(100 until 110, +1L)
    val e = intercept[IllegalStateException] {
      ExactIvf.appendToVecStore(spark, extra, path)
    }
    assert(e.getMessage.contains("rebuild is in flight"))
    assert(e.getMessage.contains("reclusterVecStore"))
    // a second rebuild refuses too (one rebuild per store)
    val e2 = intercept[IllegalStateException] {
      ExactIvf.reclusterVecStore(spark, path, nCells = 4, iters = 1)
    }
    assert(e2.getMessage.contains("rebuild"))
    // crashed rebuild: once the lock ages past the stale window the
    // append is NOT blocked (the crashed rebuild never committed, so
    // its epoch is unreachable) and the next rebuild takes over
    assert(new java.io.File(path, "_graft_rebuilding")
      .setLastModified(System.currentTimeMillis() - 25L * 3600 * 1000))
    ExactIvf.appendToVecStore(spark, extra, path)
    ExactIvf.reclusterVecStore(spark, path, nCells = 6, iters = 1)
    // the rebuild released its lock, and the racing append's rows are
    // present in the new epoch (they landed BEFORE the rebuild's read)
    assert(!new java.io.File(path, "_graft_rebuilding").exists())
    val all = a.unionByName(extra)
    val qs = Seq((1L, 5L), (2L, 105L))
    assert(served(path, qs, 10) == brute(all, qs, 10))
    // the IVFADC family rides the same gate
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val pq = tmp()
    Pq.writeIvfadcStore(emb, pq, nCells = 4, m = 8, dim = 64,
      nCents = 8, iters = 1)
    graft.streaming.StoreFs.acquireRebuildLock(spark, pq,
      "retrainIvfadcStore")
    val e3 = intercept[IllegalStateException] {
      Pq.appendToIvfadcStore(spark, emb.limit(1), pq, m = 8, dim = 64)
    }
    assert(e3.getMessage.contains("retrainIvfadcStore"))
    graft.streaming.StoreFs.releaseRebuildLock(spark, pq)
  }

  test("the fsck's tombstone clock resolves through the epoch redirect") {
    // ADVICE r14 (low): tombstoneFindings probed only the flat tombs
    // locations, reporting ZERO pending tombstones on exactly the
    // epoch-redirected stores — the compliance clock went dark after
    // every recluster. The probe now resolves through liveRoot.
    import spark.implicits._
    val a = cluster(0 until 40, +1L)
    val path = tmp()
    ExactIvf.writeVecStore(a, path, nCells = 4, iters = 1)
    ExactIvf.reclusterVecStore(spark, path, nCells = 4, iters = 1)
    ExactIvf.deleteFromVecStore(spark, Seq(5L, 7L).toDF("vec_id"), path)
    val tombFindings = graft.streaming.StoreAudit.audit(spark, path)
      .filter(col("check") === "tombstones").collect()
    assert(tombFindings.exists(_.getString(3).contains(
      "2 pending tombstone")))
  }
}
