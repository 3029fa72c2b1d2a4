package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.functions.VectorFunctions

/** The injected optimizer rule must fire on self-cosine and preserve
  * semantics (1.0 / 0.0-for-zero-vector / null propagation). Inputs are
  * derived from range() — a constant local Seq would be folded into a
  * LocalRelation before the rule is observable. */
class SelfCosineRewriteSpec extends AnyFunSuite with SparkTest {

  private def vecs = spark.range(1, 4).select(col("id"),
    when(col("id") === 2, array(lit(0f), lit(0f)))
      .when(col("id") === 3, lit(null).cast("array<float>"))
      .otherwise(array(col("id").cast("float"), lit(1f))).as("v"))

  test("rule rewrites cosine(a,a) and preserves results") {
    val out = vecs.select(col("id"),
      VectorFunctions.cosineSim(col("v"), col("v")).as("c"))
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_self_cosine"), s"rule did not fire:\n$plan")
    assert(!plan.contains("graft_cosine("), s"original expression survived:\n$plan")
    val rows = out.orderBy("id").collect()
    assert(rows(0).getDouble(1) == 1.0)
    assert(rows(1).getDouble(1) == 0.0)
    assert(rows(2).isNullAt(1))
  }

  test("rewrite preserves NaN semantics for non-finite vectors") {
    val df = spark.range(1, 3).select(col("id"),
      when(col("id") === 1, array(lit(Float.NaN), lit(1f)))
        .otherwise(array(lit(Float.PositiveInfinity), lit(1f))).as("v"))
    val out = df.select(col("id"),
      VectorFunctions.cosineSim(col("v"), col("v")).as("c"))
    assert(out.queryExecution.optimizedPlan.toString.contains("graft_self_cosine"))
    val rows = out.orderBy("id").collect()
    // full cosine(a,a) yields NaN for NaN/Inf elements; the zero-scan must too
    assert(rows.forall(r => r.getDouble(1).isNaN), rows.toSeq)
  }

  test("rule leaves distinct-argument cosine untouched") {
    val out = vecs.select(VectorFunctions.cosineSim(col("v"),
      reverse(col("v"))).as("c"))
    assert(out.queryExecution.optimizedPlan.toString.contains("graft_cosine"))
    val r = out.orderBy(col("c")).collect()
    assert(r.length == 3)
  }
}
