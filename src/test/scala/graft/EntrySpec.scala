package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() returns rows; every query is runnable at
  * sf0.001; oracle coverage is explicit. */
class EntrySpec extends AnyFunSuite with SparkTest {

  test("entry() flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and returns rows at sf0.001") {
    val empties = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (n == 0) Some(name) else None
    }
    assert(empties.isEmpty, s"queries with empty results: $empties")
  }

  test("oracle coverage: every query has SQL except declared sketch ops") {
    val weak = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(weak == Set("q08b_hll_approx"), s"unexpected weak queries: $weak")
  }
}
