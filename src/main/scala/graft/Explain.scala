package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: dumps `explain("formatted")` for selected
  * queries so pushdown/broadcast/codegen properties can be reviewed
  * (`tools/explain.sh [queryName ...]`). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.core.Engine.configure(
      SparkSession.builder().master("local[8]").appName("graft-explain"),
      shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
