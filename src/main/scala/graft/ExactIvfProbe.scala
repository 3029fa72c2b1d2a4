package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prune-power probe for the exact-IVF vector store (SCALE.md): builds
  * the y49 store over a corpus dir's hashed document embeddings and
  * prints, per probe, how many of the store's cells the Cauchy–Schwarz
  * bound lets the serve scan skip. The served answer never depends on
  * these numbers (exactness is unconditional); they measure read
  * volume — the dial is nCells ∝ corpus.
  * Usage: ExactIvfProbe [sfDir] [nCells] [k] [nprobe0] [nBuckets]
  * (`nBuckets`: −1 = the auto-bucketed default layout, 0 = the legacy
  * one-directory-per-cell layout — the r12 metadata-wall comparison
  * point, VERDICT r12 #1)
  */
object ExactIvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val nCells = args.lift(1).map(_.toInt).getOrElse(16)
    val k = args.lift(2).map(_.toInt).getOrElse(50)
    val nprobe0 = args.lift(3).map(_.toInt).getOrElse(4)
    val nBuckets = args.lift(4).map(_.toInt).getOrElse(-1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Engine.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-exactivf-probe"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vecs = graft.operators.TextAnalysis
      .hashedEmbedding(graft.sources.Tables.documents(spark, sfDir))
      .select("doc_id", "vec")
    val path = java.nio.file.Files
      .createTempDirectory("graft-exactivf-probe-").toString
    graft.operators.ExactIvf.writeVecStore(vecs, path, nCells, iters = 1,
      nBuckets = nBuckets)
    // probes: the y18/y49 convention — a handful of corpus docs
    val probeIds = vecs.select("doc_id")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .limit(8).collect().map(_.getLong(0))
    val queries = probeIds.zipWithIndex.map { case (p, i) => (i.toLong, p) }
    val stats = graft.operators.ExactIvf
      .pruneStats(spark, path, queries.toSeq, k, nprobe0)
      .collect()
    stats.foreach { r =>
      println(s"""{"query":${r.getLong(0)},"cells":${r.getLong(1)},""" +
        s""""survivors":${r.getLong(2)}}""")
    }
    val tot = stats.map(_.getLong(1)).sum.toDouble
    val sur = stats.map(_.getLong(2)).sum.toDouble
    val layoutBuckets = graft.streaming.StoreFs.readGeometry(spark, path)
      .getOrElse("n_buckets", "0")
    println(f"""{"sf_dir":"$sfDir","n_cells":$nCells,"n_buckets":$layoutBuckets,"mean_survivor_frac":${sur / tot}%.3f}""")
    // the served answer itself, timed — at high nCells this is the row
    // that proves the DPP serve plan stays O(1)-size (VERDICT r11 #1:
    // the old isInCollection list was O(nCells) literals per serve)
    val t0 = System.nanoTime()
    val served = graft.operators.ExactIvf
      .topDotBatchFromStore(spark, path, queries.toSeq, k, nprobe0).count()
    println(f"""{"serve_rows":$served,"serve_sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    spark.stop()
  }
}
