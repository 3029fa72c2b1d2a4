package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** The custom AsOfJoinExec must agree with a brute-force oracle across
  * inner/outer, strict/exact, and tolerance variants, handle nulls with
  * SQL key semantics, and plan as two key-Exchanges feeding one merge —
  * no WindowExec, no Union. */
class AsOfJoinSpec extends AnyFunSuite with SparkTest {

  // Duplicate keys AND duplicate timestamps on both sides; rv unique so
  // the tiebreak is total.
  private lazy val (leftDf, rightDf, leftRows, rightRows) = {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val l = (1 to 4000).map(i => (rnd.nextInt(31), rnd.nextInt(997).toLong, i.toLong))
    val r = (1 to 2500).map(i => (rnd.nextInt(31), rnd.nextInt(997).toLong, 100000L + i))
    (l.toDF("k", "t", "lv").repartition(7),
     r.toDF("k", "t", "rv").repartition(5), l, r)
  }

  /** Driver-side oracle: latest right row per left row; ties → max rv. */
  private def expected(exact: Boolean, tolUs: Option[Long])
      : Map[Long, Option[Long]] =
    leftRows.map { case (lk, lt, lv) =>
      val cand = rightRows.filter { case (rk, rt, _) =>
        rk == lk && (if (exact) rt <= lt else rt < lt) &&
          tolUs.forall(tol => lt - rt <= tol)
      }
      lv -> (if (cand.isEmpty) None
             else Some(cand.maxBy(c => (c._2, c._3))._3))
    }.toMap

  private def got(df: DataFrame): Map[Long, Option[Long]] =
    df.select("lv", "rv").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap

  test("inner strict as-of matches brute force") {
    val j = AsOf.join(leftDf, rightDf, Seq("k"), "t", "t",
      rightTieBreak = Seq("rv"))
    assert(got(j) == expected(exact = false, None).filter(_._2.isDefined))
  }

  test("allowExact admits equal timestamps") {
    val j = AsOf.join(leftDf, rightDf, Seq("k"), "t", "t",
      allowExact = true, rightTieBreak = Seq("rv"))
    assert(got(j) == expected(exact = true, None).filter(_._2.isDefined))
  }

  test("left outer pads unmatched rows with nulls") {
    val j = AsOf.join(leftDf, rightDf, Seq("k"), "t", "t",
      outer = true, rightTieBreak = Seq("rv"))
    assert(j.count() == leftRows.size)
    assert(got(j) == expected(exact = false, None))
  }

  test("tolerance bounds the gap (outer)") {
    val j = AsOf.join(leftDf, rightDf, Seq("k"), "t", "t",
      toleranceUs = Some(25L), outer = true, rightTieBreak = Seq("rv"))
    assert(got(j) == expected(exact = false, Some(25L)))
  }

  test("null keys and times never match; outer keeps the left row") {
    import spark.implicits._
    val l = Seq((Some(1), Some(10L), 1L), (None, Some(10L), 2L),
      (Some(1), None, 3L)).toDF("k", "t", "lv")
    val r = Seq((Some(1), Some(5L), 9L), (None, Some(1L), 8L),
      (Some(1), None, 7L)).toDF("k", "t", "rv")
    val inner = AsOf.join(l, r, Seq("k"), "t", "t")
    assert(got(inner) == Map(1L -> Some(9L)))
    val outer = AsOf.join(l, r, Seq("k"), "t", "t", outer = true)
    assert(got(outer) == Map(1L -> Some(9L), 2L -> None, 3L -> None))
  }

  test("colliding right columns are suffixed; timestamps normalize to micros") {
    import spark.implicits._
    val l = Seq((1, "2024-01-01 00:00:10", 1L)).toDF("k", "ts", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val r = Seq((1, "2024-01-01 00:00:04", 2L)).toDF("k", "ts", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val j = AsOf.join(l, r, Seq("k"), "ts", "ts")
    assert(j.columns.toSeq == Seq("k", "ts", "v", "k_r", "ts_r", "v_r"))
    val row = j.select(unix_micros(col("ts")) - unix_micros(col("ts_r"))).head()
    assert(row.getLong(0) == 6000000L)
  }

  test("plans as one merge over two key exchanges — no window, no union") {
    val plan = AsOf.join(leftDf, rightDf, Seq("k"), "t", "t")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Union"), plan)
    assert("Exchange hashpartitioning\\(k".r.findAllIn(plan).size == 2, plan)
  }

  test("bucketed inputs join with ZERO exchanges — the 100 TB event-store layout") {
    spark.sql("DROP TABLE IF EXISTS b_asof_l")
    spark.sql("DROP TABLE IF EXISTS b_asof_r")
    leftDf.write.bucketBy(4, "k").sortBy("k", "t")
      .mode("overwrite").saveAsTable("b_asof_l")
    rightDf.write.bucketBy(4, "k").sortBy("k", "t")
      .mode("overwrite").saveAsTable("b_asof_r")
    val j = AsOf.join(spark.table("b_asof_l"), spark.table("b_asof_r"),
      Seq("k"), "t", "t", rightTieBreak = Seq("rv"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Exchange"),
      s"bucketed as-of join must not shuffle either side:\n$plan")
    // values identical to the unbucketed plan
    assert(got(j) == expected(exact = false, None).filter(_._2.isDefined))
  }

  test("merge preserves the left side's partitioning for downstream reuse") {
    // groupBy on the join key directly above the as-of join must not
    // re-shuffle: the exec declares outputPartitioning = left's.
    val agg = AsOf.join(leftDf, rightDf, Seq("k"), "t", "t")
      .groupBy("k").agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(k".r.findAllIn(plan).size == 2,
      s"expected no extra exchange above the merge:\n$plan")
  }

  test("salted == unsalted on tie-free data, all variants") {
    import spark.implicits._
    // unique right times per key so equal-(key, time) tie arbitrariness
    // cannot differ between the two physical forms
    val rnd = new scala.util.Random(43)
    val l = (1 to 3000).map(i =>
      (rnd.nextInt(13), rnd.nextInt(100000).toLong, i.toLong))
    val r = (0 until 2000).map(i =>
      (i % 13, i.toLong * 50 + (i % 13), 200000L + i))
    val lDf = l.toDF("k", "t", "lv").repartition(7)
    val rDf = r.toDF("k", "t", "rv").repartition(5)
    for ((exact, tol, outer) <- Seq(
        (false, None, false), (true, None, false),
        (false, Some(5000L), true), (false, None, true))) {
      val base = AsOf.join(lDf, rDf, Seq("k"), "t", "t",
        allowExact = exact, toleranceUs = tol, outer = outer)
      val salted = AsOf.joinSalted(lDf, rDf, Seq("k"), "t", "t",
        bucketUs = 7000L, allowExact = exact, toleranceUs = tol,
        outer = outer)
      assert(salted.columns.toSeq == base.columns.toSeq)
      assert(salted.exceptAll(base).isEmpty && base.exceptAll(salted).isEmpty,
        s"variant (exact=$exact tol=$tol outer=$outer) diverged")
    }
  }

  test("salted spreads ONE pathological key across tasks at 1e6 rows") {
    import spark.implicits._
    // one key holds the entire history: the unsalted exec necessarily
    // merges it in a single task; the salted form must (a) produce the
    // identical result and (b) key the merge by (k, bucket) so the work
    // spreads across partitions
    val n = 1000000
    val rDf = spark.range(n.toLong)
      .select(lit(7).as("k"), (col("id") * 100L).as("t"),
        (col("id") + 5000000L).as("rv"))
    val lDf = spark.range(20000L)
      .select(lit(7).as("k"), (col("id") * 4999L + 3L).as("t"),
        col("id").as("lv"))
    val bucketUs = 1000000L // 1000 buckets over the 1e8-µs span
    val salted = AsOf.joinSalted(lDf, rDf, Seq("k"), "t", "t", bucketUs)
    val base = AsOf.join(lDf, rDf, Seq("k"), "t", "t")
    assert(salted.exceptAll(base).isEmpty && base.exceptAll(salted).isEmpty,
      "salted must reproduce the unsalted result exactly")
    // plan: the final merge's keys include the time bucket (AQE wraps
    // the exec, so assert on the plan text like the other shape pins)
    val planStr = salted.queryExecution.executedPlan.toString
    assert(planStr.contains("AsOfJoin") &&
      planStr.contains("__graft_asof_bucket"),
      s"final merge must be keyed by (k, bucket):\n$planStr")
    // runtime: the hot key's rows actually occupy multiple partitions
    // (AQE coalescing bounds the count at this data size — the contrast
    // with the unsalted form's single occupied partition is the claim)
    def occupied(df: org.apache.spark.sql.DataFrame): Int = df.rdd
      .mapPartitions(it => Iterator.single(if (it.hasNext) 1 else 0))
      .sum().toInt
    val baseOcc = occupied(base)
    val saltedOcc = occupied(salted)
    assert(baseOcc == 1,
      s"unsalted: one key must pin one partition, got $baseOcc")
    assert(saltedOcc > 1,
      s"salted: the key must spread across tasks, got $saltedOcc partitions")
  }
}
