package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deletion-propagation cost probe (SCALE.md, round 14): measures the
  * per-serve overhead of a standing tombstone backlog — the anti-join
  * every serve pays between a delete and its purge — at 10× fixture
  * scale, against the zero-tombstone baseline and the post-purge store.
  *
  * The claims under test (SCALE.md "deletion propagation — the cost
  * model"): (1) the tombstone anti-join runs on the PRUNED candidate
  * side, so its cost tracks the backlog fraction, not the corpus; (2)
  * purge restores the exact zero-tombstone serve; (3) BM25's extra
  * doclen anti-join rides the scalar aggregation that already scans
  * that compact table.
  *
  * Usage: DeletionProbe [sfDir] [deletedPct] [reps]
  */
object DeletionProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val delPct = args.lift(1).map(_.toInt).getOrElse(10)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Engine.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-deletion-probe"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val work = s"${sys.props("java.io.tmpdir")}/graft-delprobe-" +
      base.replaceAll("[^A-Za-z0-9._-]", "_") + s"-$delPct"
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val nDocs = docs.count()
    val t0 = System.nanoTime()
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete(); ()
    }
    rmrf(new java.io.File(work))
    graft.operators.Retrieval.writeIndexStore(docs, s"$work/idx")
    graft.operators.ExactIvf.writeVecStore(
      graft.operators.TextAnalysis.hashedEmbedding(docs)
        .select("doc_id", "vec"),
      s"$work/vec", nCells = 64, iters = 1)
    println(f"""{"build_sec":${(System.nanoTime() - t0) / 1e9}%.1f,"n_docs":$nDocs,"deleted_pct":$delPct}""")

    val queries = Seq(
      (1L, Seq("spark", "window", "stream"), 42L),
      (2L, Seq("customer", "vector"), 137L),
      (3L, Seq("stream", "filter"), 1042L),
      (4L, Seq("vector", "window"), 2042L))
    def serve(label: String): Unit = {
      // warm + steady-state median over `reps` executions
      val times = (0 to reps).map { _ =>
        spark.catalog.clearCache()
        graft.core.Caches.releaseAll()
        val t = System.nanoTime()
        val n = graft.operators.Retrieval.hybridRrfBatchFromStores(spark,
          s"$work/idx", s"$work/vec", queries,
          kList = 50, kOut = 20).count()
        val sec = (System.nanoTime() - t) / 1e9
        require(n > 0)
        sec
      }.drop(1).sorted
      val med = times(times.size / 2)
      println(f"""{"mode":"$label","serve_sec_median":$med%.2f,"reps":$reps}""")
    }

    serve("no_tombstones")
    val del = docs.select("doc_id").filter(pmod(col("doc_id"), lit(100L))
      < delPct)
    val td = System.nanoTime()
    graft.operators.Retrieval.deleteFromIndexStore(spark, del, s"$work/idx")
    graft.operators.ExactIvf.deleteFromVecStore(spark, del, s"$work/vec",
      idCol = "doc_id")
    println(f"""{"delete_sec":${(System.nanoTime() - td) / 1e9}%.1f,"n_deleted":${del.count()}}""")
    serve("pending_tombstones")
    val tp = System.nanoTime()
    graft.operators.Retrieval.compactIndexStore(spark, s"$work/idx")
    graft.operators.ExactIvf.compactVecStore(spark, s"$work/vec")
    println(f"""{"purge_sec":${(System.nanoTime() - tp) / 1e9}%.1f}""")
    serve("purged")
    spark.stop()
  }
}
