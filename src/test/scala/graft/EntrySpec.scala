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

  test("oracle coverage: every query has SQL except declared sketch ops") {
    val weak = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(weak == Set("q08b_hll_approx"), s"unexpected weak queries: $weak")
  }

  test("HLL sketch stays within its 5% rsd of the exact distinct count") {
    val rows = SparkEntry.queries("q08b_hll_approx")(spark, sfDir).collect()
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.15, // ~3σ of rsd=0.05
        s"flag=${r.get(0)}: approx=$approx exact=$exact")
    }
  }
}
