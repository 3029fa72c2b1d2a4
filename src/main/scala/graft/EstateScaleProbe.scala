package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Estate-maintenance cost probe at O(100)-store scope (SCALE.md round
  * 17 — VERDICT r16 #7): `StoreMaintenance.maintainEstate` claims its
  * discovery walk is listings-only and its per-store fan-out confines
  * every failure to the store that raised it — this probe makes both
  * claims numbers. A mixed estate is synthesized under one root
  * (exact-IVF / IVFADC / flat-PQ / signature / BM25-index families,
  * round-robin), most stores healthy, a handful seeded with real
  * conditions:
  *
  *   - tombstone backlogs (vec + signature + index) → purge levers;
  *   - a below-floor recall record on an ivfadc store whose
  *     `emb_source` resolves → the retrain lever;
  *   - BROKEN stores: corrupt parquet under one store's cells table
  *     (io → surface) and an epoch marker naming a missing directory
  *     (epoch error).
  *
  * Measured: estate discovery, the estate fsck, maintenance pass 1
  * (levers fire) and pass 2 (idempotent — the walk's own cost).
  * Asserted: the pass never dies on a broken store, lever actions land
  * only where conditions were seeded, and pass 2 pulls zero levers.
  *
  * Usage: EstateScaleProbe [nStores] [rowsPerStore]
  */
object EstateScaleProbe {
  def main(args: Array[String]): Unit = {
    val nStores = args.headOption.map(_.toInt).getOrElse(96)
    val rowsPer = args.lift(1).map(_.toInt).getOrElse(200)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Engine.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-estate-scale-probe"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dim = 8
    val root = java.nio.file.Files
      .createTempDirectory("graft-estatescale-probe-").toString

    def emb(ids: Range, salt: Long) = ids.map { i =>
      (i.toLong, (0 until dim).map(j =>
        0.02 * (j + 1) + 0.001 * ((i * 13 + j * 7 + salt) % 17)).toArray)
    }.toDF("vec_id", "embedding")
    def vecs(ids: Range, sign: Long) = ids.map { i =>
      (i.toLong, (0 until dim).map(j =>
        sign * 1000L * (j + 1) + ((i * 31 + j * 17) % 21) - 10L).toArray)
    }.toDF("doc_id", "vec")
    def docs(n: Int, salt: Int) = (0L until n.toLong).map(i =>
      (i, s"estate probe doc $i salt $salt " + ("filler " * (i % 4).toInt)))
      .toDF("doc_id", "text")

    val src = s"$root/_sources/emb"
    emb(0 until rowsPer, 0L).write.parquet(src)

    val t0 = System.nanoTime()
    (0 until nStores).foreach { i =>
      val p = f"$root/tier${i % 4}/store$i%03d"
      i % 5 match {
        case 0 =>
          graft.operators.ExactIvf.writeVecStore(vecs(0 until rowsPer, +1L),
            p, nCells = 2, iters = 1)
        case 1 =>
          graft.operators.Pq.writeIvfadcStore(spark.read.parquet(src), p,
            nCells = 2, m = 2, dim = dim, nCents = 4, iters = 1,
            embSource = src)
        case 2 =>
          graft.operators.Pq.writePqStore(spark.read.parquet(src), p,
            m = 2, dim = dim, nCents = 4, iters = 1, embSource = src)
        case 3 =>
          graft.operators.Dedup.writeSignatureStore(docs(60, i), p)
        case _ =>
          graft.operators.Retrieval.writeIndexStore(docs(60, i), p)
      }
    }
    println(f"""{"built_stores":$nStores,"build_sec":${(System.nanoTime() - t0) / 1e9}%.1f}""")

    // seeded conditions — a handful of real operator situations
    graft.operators.ExactIvf.deleteFromVecStore(spark,
      Seq(3L, 5L).toDF("doc_id"), f"$root/tier0/store000", idCol = "doc_id")
    graft.operators.Dedup.deleteFromSignatureStore(spark,
      Seq(2L).toDF("doc_id"), f"$root/tier3/store003")
    graft.operators.Retrieval.deleteFromIndexStore(spark,
      Seq(4L).toDF("doc_id"), f"$root/tier0/store004")
    graft.streaming.StoreFs.writeRecallStats(spark, f"$root/tier1/store001",
      Seq("recall" -> "0.40", "floor" -> "0.90", "k" -> "5",
        "n_probes" -> "8", "at_ms" -> System.currentTimeMillis().toString))
    // broken #1: corrupt parquet under a vec store's cells table
    def corrupt(f: java.io.File): Unit =
      if (f.isDirectory) f.listFiles().foreach(corrupt)
      else if (f.getName.endsWith(".parquet")) {
        val w = new java.io.FileOutputStream(f)
        try w.write("not parquet".getBytes("UTF-8")) finally w.close()
      }
    corrupt(new java.io.File(f"$root/tier1/store005/cells"))
    // broken #2: an epoch marker naming a missing directory, on a
    // signature store (no panel/lever noise — the fsck's epoch error
    // just stands while the walk moves on)
    val mk = new java.io.FileOutputStream(
      new java.io.File(f"$root/tier0/store008", "_graft_root_00000007"))
    try mk.write("_re-00000007".getBytes("UTF-8")) finally mk.close()

    val t1 = System.nanoTime()
    val discovered = graft.streaming.StoreAudit
      .discoverStoreRoots(spark, root, maxDepth = 4)
    val discSec = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val findings = graft.streaming.StoreAudit.estateFindings(spark, root)
    val fsckSec = (System.nanoTime() - t2) / 1e9
    val t3 = System.nanoTime()
    val pass1 = graft.operators.StoreMaintenance.maintainEstate(spark,
      root, recallProbes = 4, recallK = 5, recallNprobe = 2,
      recallKShort = 30, recallFloor = 0.1)
    val p1Sec = (System.nanoTime() - t3) / 1e9
    val t4 = System.nanoTime()
    val pass2 = graft.operators.StoreMaintenance.maintainEstate(spark,
      root, recallProbes = 4, recallK = 5, recallNprobe = 2,
      recallKShort = 30, recallFloor = 0.1)
    val p2Sec = (System.nanoTime() - t4) / 1e9

    val byAction = pass1.groupBy(_.action).view.mapValues(_.size).toMap
    println(f"""{"discovered":${discovered.size},"discover_sec":$discSec%.2f,"fsck_findings":${findings.size},"fsck_sec":$fsckSec%.1f,"pass1_sec":$p1Sec%.1f,"pass2_sec":$p2Sec%.1f}""")
    println(s"""{"pass1_actions":${pass1.size},"by_action":${
      byAction.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}")},"pass2_actions":${pass2.size}}""")
    pass1.foreach(a => println(s"  ${a.store.stripPrefix(root)} ${a.action}"))

    // zero cross-store propagation: the estate pass completed (we are
    // here), every discovered store was walked, lever/surface actions
    // land only on the seeded stores. Index roots discover as their
    // manifested SUB-tables, so the count is ≥ nStores.
    require(discovered.size >= nStores,
      s"discovery found ${discovered.size} of $nStores")
    val levers = pass1.filter(a =>
      a.action == "purge-compact" || a.action == "retrain" ||
        a.action == "recluster")
    val leverStores = levers.map(_.store.stripPrefix(root)).toSet
    require(leverStores == Set("/tier0/store000", "/tier3/store003",
        "/tier0/store004", "/tier1/store001"),
      s"unexpected lever targets: $leverStores")
    require(pass1.exists(a => a.store.contains("store005") &&
      (a.action == "surface" || a.action == "error")),
      "the corrupt store must surface, not vanish")
    // pass 2 pulls no levers (recall panels may re-run only where a
    // gauge is stale; nothing is here)
    val p2Levers = pass2.filter(a =>
      a.action == "purge-compact" || a.action == "retrain" ||
        a.action == "recluster" || a.action == "recall-panel")
    require(p2Levers.isEmpty, s"pass 2 pulled levers: $p2Levers")
    spark.stop()
  }
}
