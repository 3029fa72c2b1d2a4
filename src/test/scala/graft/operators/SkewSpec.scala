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
