package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every inventory query against
  * SPARK_GRAFT_SF_DIR, forcing full materialization through the `noop`
  * sink (a bare count() would let Catalyst prune projections and
  * under-measure), and prints exactly one JSON metrics line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.Engine.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Steady-state measurement: one untimed warmup pass at the target SF
    // (JIT/C2 of the generated code needs row volume — a small-SF warmup
    // leaves the first big run interpreting the codegen'd loops).
    SparkEntry.queries.values.foreach { fn =>
      try {
        graft.core.Caches.releaseAll()
        spark.catalog.clearCache()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      } catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // Median of 3 timed in-JVM passes per query: a single pass is at the
    // mercy of this machine's periodic external load spikes (and any
    // residual JIT), which is exactly what sank the n=1 round-1 artifact —
    // the median absorbs one bad pass without hiding a real regression.
    val reps = 3
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        graft.core.Caches.releaseAll()
        spark.catalog.clearCache() // query-local caches must not leak across timings
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          if (!failed.contains(name)) failed += name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          None
        }
      }
      val median =
        if (times.isEmpty) 0.0 else times.sorted.apply(times.size / 2)
      name -> median
    }
    // 3-decimal (ms) precision: the driver captures stdout through a pipe
    // that truncates long lines, and full 15-digit doubles pushed the
    // 187-query line past the capture window (PERF_r17 parsed nothing).
    def fmt(v: Double): String =
      java.lang.String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // A failing query must be visible in the artifact, not just stderr —
    // otherwise its near-zero "timing" reads as a speedup.
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    println(line)
    // The stdout line is the driver's contract, but the driver's capture
    // truncates long lines (BENCH_r05 lost q01–x28 and the total), so the
    // complete artifact is ALSO written to a committed file — the audit
    // trail must not depend on a pipe buffer.
    // Per-core-count default name: the driver invokes the bench at two core
    // counts and a fixed name let the second run clobber the first (the r17
    // 32-core artifact was lost that way).
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", s"BENCH_FULL_c$cpus.json")
    try {
      val w = new java.io.PrintWriter(new java.io.File(out), "UTF-8")
      try w.println(line) finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    spark.stop()
  }
}
