package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Build-cost probe for the COMPOSED curation pipeline under the
  * PRODUCTION auto-cells mask (VERDICT r12 #7): the graded y54 fixture
  * pins `autoBits = 0` so the stream's frozen mask provably equals the
  * DuckDB oracle's — which makes its measured 100× build the one-cell
  * ALL-PAIRS worst case (~75 min, SCALE.md Round-12), not the curve a
  * production deployment pays. This probe runs the SAME 3-batch
  * composed ingest (gates → shingle-dedup store → semantic-dedup store
  * → λ gate) with auto cells engaged (`targetOcc` small, occupancy-
  * bounded buckets — the x79/x81 regime) and prints the build wall and
  * the two stores' sizes, so SCALE.md can carry the production build
  * row next to the grading-pin row.
  * Usage: CurationBuildProbe [sfDir] [targetOcc]
  */
object CurationBuildProbe {
  private def dirBytes(d: java.io.File): Long =
    if (!d.exists()) 0L
    else if (d.isFile) d.length()
    else Option(d.listFiles()).toSeq.flatten.map(dirBytes).sum

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val targetOcc = args.lift(1).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Engine.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-curation-build-probe"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // page-shaped corpus (the y54 reflow: the synthetic single-line
    // fixture text would be dropped wholesale by the C4 page gate)
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val pages = graft.core.Caches.scoped(
      graft.operators.Curation.reflowLines(docs)
        .select(col("doc_id"), col("line_id"),
          concat(col("line"),
            when((col("doc_id") + col("line_id")) % 3 =!= 0, ".")
              .otherwise(""))
          .as("line"))
        .groupBy("doc_id")
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("line_id"),
            col("line")))), x => x.getField("line")), "\n").as("text")))
    val ids = pages.select("doc_id").collect().map(_.getLong(0)).sorted
    val nDocs = ids.length
    val (c1, c2) = (ids(nDocs / 3), ids(2 * nDocs / 3))
    val root = java.nio.file.Files
      .createTempDirectory("graft-curation-probe-").toString
    // λ/τ: permissive frozen gate (the λ stage's cost is one column
    // program either way; selection quality is not under measurement)
    val lam = Seq.fill(graft.operators.Curation.DsirBuckets)(0L)
    val cuts = Seq(
      pages.filter(col("doc_id") < c1),
      pages.filter(col("doc_id") >= c1 && col("doc_id") < c2),
      pages.filter(col("doc_id") >= c2))
    val t0 = System.nanoTime()
    cuts.zipWithIndex.foreach { case (b, i) =>
      graft.streaming.CurationStream.processBatch(
        b.select("doc_id", "text"), i.toLong,
        s"$root/sigs", s"$root/codes",
        estThreshold = 0.5, targetOcc = targetOcc,
        lam = lam, tau = -1e9,
        onBatch = (dec, _) =>
          dec.write.mode("append").parquet(s"$root/verdicts"))
    }
    val buildSec = (System.nanoTime() - t0) / 1e9
    graft.core.Caches.releaseAll()
    val sigB = dirBytes(new java.io.File(s"$root/sigs"))
    val codeB = dirBytes(new java.io.File(s"$root/codes"))
    println(f"""{"probe":"y54_auto_build","sf_dir":"$sfDir",""" +
      f""""docs":$nDocs,"target_occ":$targetOcc,""" +
      f""""build_sec":$buildSec%.1f,"sig_store_bytes":$sigB,""" +
      f""""code_store_bytes":$codeB}""")
    spark.stop()
  }
}
