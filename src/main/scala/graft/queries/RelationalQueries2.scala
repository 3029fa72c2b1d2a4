package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables._
import Hygiene._

/** Second relational coverage wave: pivot, correlated/scalar subqueries,
  * exact percentiles, ordered string aggregation. */
object RelationalQueries2 {

  // --- X17: pivot (groupBy().pivot() → fixed output columns)
  val x17 = Query(
    "x17_pivot",
    Some("""
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
             CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
      FROM events
      GROUP BY user_id
      ORDER BY user_id""")
  ) { (s, d) =>
    events(s, d)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(coalesce(count(lit(1)), lit(0L)))
      .na.fill(0L)
      .orderBy("user_id")
  }

  // --- X18: scalar + correlated subqueries (decorrelation rewrites)
  val x18 = Query(
    "x18_subqueries",
    Some("""
      SELECT c_custkey, c_name
      FROM customer c
      WHERE EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > (SELECT avg(o_totalprice) FROM orders))
      ORDER BY c_custkey""")
  ) { (s, d) =>
    orders(s, d).createOrReplaceTempView("x18_orders")
    customer(s, d).createOrReplaceTempView("x18_customer")
    s.sql("""
      SELECT c_custkey, c_name
      FROM x18_customer c
      WHERE EXISTS (
              SELECT 1 FROM x18_orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > (SELECT avg(o_totalprice) FROM x18_orders))
      ORDER BY c_custkey""")
  }

  // --- X19: exact percentiles (sort-based linear interpolation)
  val x19 = Query(
    "x19_percentiles",
    Some("""
      SELECT event_type,
             round(quantile_cont(value, 0.5), 6) AS p50,
             round(quantile_cont(value, 0.9), 6) AS p90,
             min(value) AS vmin,
             max(value) AS vmax
      FROM events
      GROUP BY event_type
      ORDER BY event_type""")
  ) { (s, d) =>
    events(s, d)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        min("value").as("vmin"),
        max("value").as("vmax"))
      .orderBy("event_type")
  }

  // --- X20: ordered distinct string aggregation
  val x20 = Query(
    "x20_string_agg",
    Some("""
      SELECT l_returnflag,
             string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
             CAST(COUNT(DISTINCT l_linestatus) AS BIGINT) AS n_statuses
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")
  ) { (s, d) =>
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        array_join(array_sort(collect_set(col("l_linestatus"))), ",").as("statuses"),
        countDistinct(col("l_linestatus")).as("n_statuses"))
      .orderBy("l_returnflag")
  }

  val all: Seq[Query] = Seq(x17, x18, x19, x20)
}
