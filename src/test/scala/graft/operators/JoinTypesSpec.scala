package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** Join-type / set-op completeness: the variants not exercised by a graded
  * query (right outer, multiset EXCEPT ALL / INTERSECT ALL). */
class JoinTypesSpec extends AnyFunSuite with SparkTest {

  test("right outer join mirrors the left outer of the swapped sides") {
    import spark.implicits._
    val a = Seq((1, "a1"), (2, "a2")).toDF("k", "av")
    val b = Seq((2, "b2"), (3, "b3")).toDF("k", "bv")
    val right = a.join(b, Seq("k"), "right_outer")
      .select("k", "av", "bv").collect().map(_.toSeq).toSet
    val swapped = b.join(a, Seq("k"), "left_outer")
      .select("k", "av", "bv").collect().map(_.toSeq).toSet
    assert(right == swapped)
    assert(right.exists(r => r(1) == null)) // unmatched right row surfaces
  }

  test("exceptAll / intersectAll keep multiplicity (bag semantics)") {
    import spark.implicits._
    val a = Seq(1, 1, 1, 2, 3).toDF("x")
    val b = Seq(1, 2, 2).toDF("x")
    val except = a.exceptAll(b).collect().map(_.getInt(0)).sorted.toSeq
    val intersect = a.intersectAll(b).collect().map(_.getInt(0)).sorted.toSeq
    assert(except == Seq(1, 1, 3))   // 3×1 minus 1×1 → 2×1; 2 cancels; 3 stays
    assert(intersect == Seq(1, 2))   // min multiplicities
  }
}
