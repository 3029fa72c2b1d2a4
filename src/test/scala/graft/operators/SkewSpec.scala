package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** Salting rewrites must be semantics-preserving. */
class SkewSpec extends AnyFunSuite with SparkTest {

  test("salted two-phase sum == direct sum (decimal-exact)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // heavily skewed: 90% of rows on key "hot"
    val df = (1 to 20000).map { i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", rnd.nextDouble() * 100)
    }.toDF("key", "v")
    val direct = df.groupBy("key")
      .agg(sum(col("v").cast("decimal(18,6)")).cast("double").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(df, "key", col("v"), "s", salts = 16)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted == direct)
  }

  test("AQE splits a skewed sort-merge join: skew=true in the final plan") {
    // Salting (above) is the MANUAL skew lever; this pins that the
    // engine's AUTOMATIC lever — AQE skew-join, enabled in
    // Engine.configure — actually engages: a fact-fact join where one key
    // holds ~95% of the rows must re-plan with the skewed partition split
    // (the SMJ node reports skew=true). Thresholds are lowered to make
    // the test-sized skew visible; production uses the defaults.
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      val fact1 = spark.range(200000).select(
        when(col("id") % 20 === 0, col("id") % 97).otherwise(0L).as("k"),
        col("id").as("v1"),
        lit("padpadpadpadpadpadpadpadpadpadpad").as("pad"))
      val fact2 = spark.range(97).select(col("id").as("k"), col("id").as("v2"))
      val joined = fact1.join(fact2, "k")
      // drive THIS DataFrame's own adaptive plan (count()/write wrap it in
      // a fresh QueryExecution whose final plan we couldn't inspect)
      joined.queryExecution.toRdd.count()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(p.contains("skew=true"), s"AQE did not mark the skewed join:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join == plain join on skewed fact") {
    import spark.implicits._
    val fact = (1 to 5000).map(i => (if (i % 100 == 0) i % 5 else 0, i)).toDF("k", "v")
    val dim = Seq((0, "zero"), (1, "one"), (2, "two"), (3, "three"), (4, "four"))
      .toDF("k", "name")
    val plain = fact.join(dim, "k").groupBy("name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8).groupBy("name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}
