package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** Regression: a click at exactly the purchase timestamp must NOT match
  * (as-of = latest STRICTLY-prior click; DuckDB oracle uses p.ts > c.ts).
  * Fixture timestamps are unique per user, so this probes synthetic data
  * through the same window construction the graded query uses. */
class AsofTieSpec extends AnyFunSuite with SparkTest {
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._

  test("same-ts click is invisible; earlier click still matches") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 11:00:00")
    val ev = Seq(
      (1L, t0, 10L, "click"),     // strictly prior
      (1L, t1, 11L, "click"),     // same ts as purchase — must not match
      (1L, t1, 12L, "purchase"),
      (2L, t1, 20L, "click"),     // same ts, no earlier click
      (2L, t1, 21L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    // identical construction to TemporalQueries.x11
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"),
        when(col("event_type") === "purchase", 0).otherwise(1),
        col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val out = ev
      .withColumn("click_id",
        last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select("user_id", "click_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).contains(10L), s"expected the strictly-prior click: $out")
    assert(out(2L).isEmpty, s"same-ts click must not match: $out")
  }
}
