package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** SQL-string entry-path parity (SURVEY §2 "API surface"): the inventory
  * is DataFrame-built, but a user of the engine's SQL surface must get
  * identical results from `spark.sql(...)` text. For queries whose oracle
  * SQL is portable ANSI (no DuckDB-only functions), the oracle text itself
  * doubles as the Spark SQL formulation — so this spec runs THE SAME
  * string the DuckDB oracle runs, through Spark's parser/analyzer, and
  * asserts row-identity with the DataFrame build. Covers aggregation
  * (q02), window functions (x26), and GROUPING SETS (x28); x45 covers the
  * extension-function SQL path as a driver-graded query.
  */
class SqlParitySpec extends AnyFunSuite with SparkTest {

  private def parity(name: String): Unit = {
    import graft.sources.Tables
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    val q = Inventory.byName(name)
    val viaDf = q.run(spark, sfDir).collect().toSeq
    val viaSql = spark.sql(q.sql.get).collect().toSeq
    assert(viaDf.size == viaSql.size, s"$name: row counts differ")
    assert(viaDf == viaSql, s"$name: SQL text and DataFrame build diverge")
  }

  test("q02 aggregation: SQL text == DataFrame build") { parity("q02_group_agg") }
  test("x26 window functions: SQL text == DataFrame build") { parity("x26_window_funcs") }
  test("x28 grouping sets: SQL text == DataFrame build") { parity("x28_grouping_sets") }
}
