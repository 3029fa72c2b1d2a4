package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** The custom TopKPerKey operator must agree with the window formulation
  * and plan as partial→exchange→final with no WindowExec/global sort. */
class TopKPerKeySpec extends AnyFunSuite with SparkTest {

  private def data = {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    (1 to 20000).map(i => (i % 37, rnd.nextDouble(), i.toLong))
      .toDF("key", "score", "id").repartition(8)
  }

  test("matches row_number window formulation") {
    val df = data
    val viaTopK = TopK.perKey(df, Seq(df("key")),
        Seq(df("score").desc_nulls_last, df("id")), k = 5)
      .select("key", "id").collect().map(r => (r.getInt(0), r.getLong(2 - 1))).toSet
    val w = Window.partitionBy("key").orderBy(col("score").desc_nulls_last)
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("key", "id").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(viaTopK == viaWindow)
  }

  test("plans as partial+final TopKPerKeyExec with an exchange between") {
    val df = data
    val plan = TopK.perKey(df, Seq(df("key")), Seq(df("score").desc), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), plan)
    // two-phase: partial (true) feeding a hash exchange feeding final (false)
    assert(plan.indexOf("TopKPerKey") != plan.lastIndexOf("TopKPerKey"),
      s"expected two-phase plan:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(key"), s"missing exchange:\n$plan")
  }

  test("flush-on-overflow stays exact at 1e5 keys with a tiny in-flight cap") {
    // 100k distinct keys, 2 rows each, partial-phase map capped at 64 keys:
    // thousands of flushes per partition — memory bounded, result exact.
    val df = spark.range(200000).select(
      (col("id") % 100000).as("key"),
      (col("id") * 2654435761L % 999983).cast("double").as("score"),
      col("id").as("rid")).repartition(8)
    val viaTopK = TopK.perKey(df, Seq(df("key")),
        Seq(df("score").desc, df("rid")), k = 1, maxKeysInFlight = 64)
      .select("key", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy("key").orderBy(col("score").desc, col("rid"))
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 1)
      .select("key", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaTopK.size == 100000)
    assert(viaTopK == viaWindow)
  }

  test("final-phase sort-spill fallback stays exact past the key cap") {
    // maxKeysInFlight=2 with ~125 distinct keys per final partition: the
    // final phase abandons its heap map and goes through the
    // UnsafeExternalRowSorter (disk-backed) streaming take-k — result
    // must still be exactly the window formulation's. k=3 with duplicate
    // scores stresses the sorted-run group boundaries.
    val df = spark.range(30000).select(
      (col("id") % 500).as("key"),
      ((col("id") * 48271) % 101).cast("double").as("score"),
      col("id").as("rid")).repartition(8)
    val viaTopK = TopK.perKey(df, Seq(df("key")),
        Seq(df("score").desc, df("rid")), k = 3, maxKeysInFlight = 2)
      .select("key", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy("key").orderBy(col("score").desc, col("rid"))
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("key", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaTopK.size == 1500)
    assert(viaTopK == viaWindow)
  }

  test("property: random shapes agree with the window formulation") {
    // Seeded-random sweep across the operator's regimes: k ∈ {1,3,7},
    // key cardinality from few-hot to ≫cap, caps that keep the final
    // phase in heap mode AND push it into sort-spill, duplicate-heavy
    // scores for tie boundaries. Every case must equal the window form.
    val rnd = new scala.util.Random(2024)
    for (case_ <- 1 to 6) {
      val nRows = 2000 + rnd.nextInt(8000)
      val nKeys = Seq(5, 200, 5000)(rnd.nextInt(3))
      val k = Seq(1, 3, 7)(rnd.nextInt(3))
      val cap = Seq(2, 64, TopKPerKeyExec.DefaultMaxKeysInFlight)(rnd.nextInt(3))
      val scoreMod = Seq(7, 1000003)(rnd.nextInt(2)) // heavy vs rare ties
      val df = spark.range(nRows).select(
        (col("id") % nKeys).as("key"),
        ((col("id") * 2654435761L) % scoreMod).cast("double").as("score"),
        col("id").as("rid")).repartition(1 + rnd.nextInt(8))
      val viaTopK = TopK.perKey(df, Seq(df("key")),
          Seq(df("score").desc, df("rid")), k, maxKeysInFlight = cap)
        .select("key", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = Window.partitionBy("key").orderBy(col("score").desc, col("rid"))
      val viaWindow = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select("key", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaTopK == viaWindow,
        s"case $case_: rows=$nRows keys=$nKeys k=$k cap=$cap mod=$scoreMod")
    }
  }

  test("float keys with distinct encodings (-0.0/0.0, NaN bits) group as one key") {
    // The operator groups by binary key equality (heap map, spill-scan
    // adjacent compare) and hash-partitions on key bytes — the API entry
    // must canonicalize float keys or each encoding becomes its own
    // group. Both -0.0 and 0.0 rows must land in ONE group of k, in heap
    // mode AND in the spill path.
    import spark.implicits._
    val rows = Seq.tabulate(40)(i =>
      (if (i % 2 == 0) 0.0 else -0.0, i.toDouble, i.toLong)) ++
      Seq.tabulate(10)(i => (1.5, i.toDouble, (100 + i).toLong))
    val df = rows.toDF("key", "score", "rid").repartition(4)
    for (cap <- Seq(TopKPerKeyExec.DefaultMaxKeysInFlight, 1)) {
      val out = TopK.perKey(df, Seq(df("key")),
          Seq(df("score").desc, df("rid")), k = 3, maxKeysInFlight = cap)
        .select("key", "rid").collect().map(r => (r.getDouble(0), r.getLong(1)))
      val zeroGroup = out.filter(_._1 == 0.0)
      assert(zeroGroup.length == 3,
        s"cap=$cap: -0.0/0.0 split into multiple groups: ${out.mkString(",")}")
      assert(zeroGroup.map(_._2).toSet == Set(39L, 38L, 37L), s"cap=$cap")
      assert(out.count(_._1 == 1.5) == 3, s"cap=$cap")
    }
  }

  test("k larger than group size returns whole groups") {
    import spark.implicits._
    val df = Seq((1, 1.0), (1, 2.0), (2, 3.0)).toDF("key", "score").repartition(3)
    val out = TopK.perKey(df, Seq(df("key")), Seq(df("score").desc), k = 10)
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSet
    assert(out == Set((1, 1.0), (1, 2.0), (2, 3.0)))
  }
}
