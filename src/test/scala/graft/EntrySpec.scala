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

  test("inventory names are unique (Map would silently drop collisions)") {
    val names = graft.queries.Inventory.all.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate names: ${names.diff(names.distinct)}")
    assert(SparkEntry.queries.size == names.size)
  }

  test("oracle coverage: every query has SQL — no weak entries") {
    val weak = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(weak.isEmpty, s"unexpected weak queries: $weak")
  }

  test("HLL sketch self-grades within 3σ of its 5% rsd") {
    // q08b outputs approx_ok = 1 iff |approx-exact|/exact <= 0.15; the
    // engine-specific sketch value itself never leaves the query.
    val rows = SparkEntry.queries("q08b_hll_approx")(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("approx_ok") == 1, s"flag=${r.get(0)}: $r")
    }
  }
}
