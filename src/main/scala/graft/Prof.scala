package graft

import org.apache.spark.sql.SparkSession

/** Per-query profiler: runs each named query against sf0.1 with the
  * noop sink, printing per-run wall times (JIT vs steady-state).
  * `-nK` as the first arg sets K timed reps after one untimed warmup
  * (default 3, no separate warmup — the historical behavior); with
  * `-nK` the BASELINE.md pinned-idle protocol median is also printed. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (reps, warmup, names) = args.headOption match {
      case Some(a) if a.startsWith("-n") => (a.drop(2).toInt, true, args.drop(1))
      case _ => (3, false, args)
    }
    val spark = graft.core.Engine.configure(
      SparkSession.builder().master("local[32]").appName("graft-prof"),
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(name: String): Double = {
      graft.core.Caches.releaseAll()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (name <- names) {
      if (warmup) once(name)
      val times = (1 to reps).map { i =>
        val t = once(name)
        println(f"$name run$i: $t%.2f s")
        t
      }
      if (warmup)
        println(f"$name MEDIAN: ${times.sorted.apply(times.size / 2)}%.2f s")
    }
    spark.stop()
  }
}
