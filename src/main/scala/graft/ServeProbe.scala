package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Where does one store-serve second go? (VERDICT r17 item 5.)
  * For each named query, splits a steady-state invocation into
  *   build   — query function call: fixture-ensure marker checks +
  *             spark.read listing/footers + plan construction (driver)
  *   analyze — forcing queryExecution.executedPlan (driver)
  *   execute — the noop write (jobs; includes AQE re-planning rounds)
  * and counts the Spark jobs the execution launches. Run AFTER a warmup
  * pass so fixtures exist and codegen is JIT'd. */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Engine.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-serveprobe"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val names = if (args.nonEmpty) args.toSeq else Seq("y55_hybrid_store_df")
    for (name <- names) {
      // warmup (builds fixtures, JITs)
      graft.core.Caches.releaseAll(); spark.catalog.clearCache()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      for (i <- 1 to 2) {
        graft.core.Caches.releaseAll(); spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        jobs.set(0)
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        println(f"$name run$i: build ${(t1 - t0) / 1e3}%.0f us, " +
          f"analyze ${(t2 - t1) / 1e3}%.0f us, " +
          f"execute ${(t3 - t2) / 1e3}%.0f us, jobs ${jobs.get()}")
      }
    }
    spark.stop()
  }
}
