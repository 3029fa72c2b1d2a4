package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hot-key skew probe for the as-of join (SCALE.md): one pathological
  * key holds the ENTIRE right history, so `AsOf.join`'s key-clustered
  * merge necessarily runs on one task; `AsOf.joinSalted` re-keys the
  * merge by (key, time-bucket). Prints median wall times for both forms
  * at the given right-side row count (default 10⁷ — the "one key's
  * whole history on one executor" regime) plus a result-equality check.
  * Usage: AsOfSkewProbe [nRight] [nLeft] [bucketUs]
  */
object AsOfSkewProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val nLeft = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val bucketUs = args.lift(2).map(_.toLong).getOrElse(n) // ~100 buckets
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Engine.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-asofskew"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // all rows on ONE key; times unique so the two forms are comparable
    // row-for-row
    val right = spark.range(n).select(lit(7).as("k"),
      (col("id") * 100L).as("t"), (col("id") + n * 10).as("rv"))
    val left = spark.range(nLeft).select(lit(7).as("k"),
      (col("id") * (n * 100L / nLeft) + 3L).as("t"), col("id").as("lv"))

    def med(label: String, f: () => Unit): Double = {
      f() // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"""{"form":"$label","n_right":$n,"median_sec":${ts(1)}%.2f}""")
      ts(1)
    }
    val base = med("asof_hotkey_base", () =>
      graft.plans.AsOf.join(left, right, Seq("k"), "t", "t")
        .write.format("noop").mode("overwrite").save())
    val salted = med("asof_hotkey_salted", () =>
      graft.plans.AsOf.joinSalted(left, right, Seq("k"), "t", "t", bucketUs)
        .write.format("noop").mode("overwrite").save())
    // both directions (the AsOfJoinSpec discipline): one-sided exceptAll
    // passes even when the salted form silently DROPS rows
    val baseDf = graft.plans.AsOf.join(left, right, Seq("k"), "t", "t")
    val saltDf = graft.plans.AsOf.joinSalted(left, right, Seq("k"), "t", "t", bucketUs)
    val eq = saltDf.exceptAll(baseDf).isEmpty && baseDf.exceptAll(saltDf).isEmpty
    println(f"""{"salted_over_base":${salted / base}%.2f,"equal":$eq}""")
    spark.stop()
  }
}
