package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** Directory partitioning — the other pruning mechanism (distinct from
  * parquet row-group predicate pushdown): partition columns prune whole
  * directories at planning time, and dimension filters prune fact
  * partitions at runtime via dynamic partition pruning. */
class PartitioningSpec extends AnyFunSuite with SparkTest {

  test("static partition pruning: lang filter scans only that partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part-").toString
    Tables.documents(spark, sfDir)
      .write.partitionBy("lang").mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = q.queryExecution.executedPlan.toString
    // the lang predicate lands in PartitionFilters (directory pruning),
    // not PushedFilters (row-group pruning)
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
    assert("""PartitionFilters: \[[^\]]*= en""".r.findFirstIn(plan).isDefined, plan)
    val enCount = Tables.documents(spark, sfDir).filter(col("lang") === "en").count()
    assert(q.count() == enCount)
  }

  test("dynamic partition pruning fires on a dim-filtered fact join") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp-").toString
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "100.0")
    Tables.documents(spark, sfDir)
      .write.partitionBy("lang").mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = Tables.documents(spark, sfDir)
      .select("lang").distinct().filter(col("lang").isin("en", "fr"))
    val joined = fact.join(dim, "lang").groupBy("lang").count()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"DPP did not fire:\n$plan")
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = Tables.documents(spark, sfDir)
      .filter(col("lang").isin("en", "fr")).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }
}
