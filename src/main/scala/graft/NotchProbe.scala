package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The maxBits-NOTCH and probe-RADIUS probe (SCALE.md): measure the
  * hashed-embedding near-dup family at a large synthetic corpus under
  * the STANDING cap (maxBits = 12, 4096 cells) versus the next notch
  * (maxBits = 16), and across the multi-probe radius ladder, on
  * identical semantics — same hashed vectors, same integer τ² test,
  * same auto-bits rule; only the measured parameter differs.
  *
  * What it turns from extrapolation into measurement:
  *  - SCALE.md's "beyond ~65k× occupancy grows again; next notch is a
  *    larger maxBits" contract — occupancy and wall per cap;
  *  - the recall-vs-radius curve at scale: τ-close pairs differ in
  *    ≈ 0.35·nbits sign bits in expectation, so a FIXED radius loses
  *    recall as auto-bits grows with the corpus — radius is the dial,
  *    and its banded cost (selectivity 2^(nbits/(radius+1)) per band)
  *    is what this probe prices.
  *
  * Per measurement one JSON line: wall seconds plus cell-occupancy
  * stats, and for the recall panel the recall values themselves. The
  * panel's probe set is the graded y06 bound itself (hash-ordered
  * limit 32): constant-size at any corpus factor, so the probe count is
  * the controlled variable and the corpus is the treatment.
  *
  * Usage: NotchProbe [factor] [synthDir] [radii] — defaults 100,
  * /tmp/graft-scale-x100, 3 (shares ScaleProbe's synth corpus).
  */
object NotchProbe {

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def run(spark: SparkSession, docs: DataFrame, maxBits: Int,
                  radii: Seq[Int]): Unit = {
    import graft.operators.TextAnalysis
    // cell occupancy under this cap (one pass, reported per setting)
    val occ = TextAnalysis.hashedCells(docs, targetOcc = 8, maxBits = maxBits)
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_cells"), avg("n").as("occ_avg"),
        max("n").as("occ_max"))
      .collect()(0)
    println(f"""{"probe":"notch","max_bits":$maxBits,"n_cells":${occ.getLong(0)},"occ_avg":${occ.getDouble(1)}%.1f,"occ_max":${occ.getLong(2)}}""")
    def measure(name: String, df: => DataFrame): Unit = {
      graft.core.Caches.releaseAll(); spark.catalog.clearCache()
      val (_, sec) = time {
        df.write.format("noop").mode("overwrite").save()
      }
      println(f"""{"probe":"notch","max_bits":$maxBits,"query":"$name","sec":$sec%.1f}""")
    }
    measure("y05_single_probe",
      TextAnalysis.hashedNearDup(docs, maxBits = maxBits))
    radii.foreach { r =>
      measure(s"y07_multi_probe_r$r",
        TextAnalysis.hashedNearDup(docs, maxBits = maxBits, probeHamming = r))
      graft.core.Caches.releaseAll(); spark.catalog.clearCache()
      val (rec, recSec) = time {
        TextAnalysis.hashedNearDupRecall(docs,
          maxBits = maxBits, radius = r).collect()(0)
      }
      println(f"""{"probe":"notch","max_bits":$maxBits,"radius":$r,"query":"y06_recall","sec":$recSec%.1f,"n_probes":${rec.getAs[Long]("n_probes")},"n_true":${rec.getAs[Long]("n_true")},"recall_single":${rec.getAs[Double]("recall_single")},"recall_multi":${rec.getAs[Double]("recall_multi")}}""")
    }
    graft.core.Caches.releaseAll(); spark.catalog.clearCache()
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val synthDir = args.lift(1).getOrElse(s"/tmp/graft-scale-x$factor")
    val radii = args.lift(2).map(_.split(",").toSeq.map(_.toInt))
      .getOrElse(Seq(3))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Engine.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-notch"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ScaleProbe.ensureSynth(spark, base, synthDir, factor)
    val docs = spark.read.parquet(s"$synthDir/documents.parquet")
    Seq(12, 16).foreach(run(spark, docs, _, radii))
    spark.stop()
  }
}
