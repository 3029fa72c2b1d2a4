package graft

import org.apache.spark.sql.SparkSession

/** Per-query profiler: runs each named query 3× against sf0.1 with the
  * noop sink, printing per-run wall times (JIT vs steady-state). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Engine.configure(
      SparkSession.builder().master("local[32]").appName("graft-prof"),
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args; i <- 1 to 3) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
