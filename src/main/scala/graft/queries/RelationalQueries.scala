package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType}
import graft.sources.Tables._
import Hygiene._

/** SURVEY §2.13 Q1–Q10: the relational core.
  *
  * Scale notes (100 TB posture):
  *  - Dimension joins (`nation`, `region`, `customer`, `supplier`) are
  *    explicitly `broadcast()` — at any scale those stay "small side".
  *  - Fact-to-fact joins (`lineitem ⋈ orders`) are left to the planner:
  *    sort-merge with AQE skew handling at scale, broadcast at test SF.
  *  - Aggregations rely on Spark's partial→final HashAggregate (map-side
  *    combine), the Spark analogue of the reference's intermediary
  *    aggregation tier (SURVEY R13, /root/reference/README.md:20).
  */
object RelationalQueries {

  // --- Q1: scan + filter + project (SURVEY R2/R3; pushdown visible in scan)
  val q01 = Query(
    "q01_scan_filter_project",
    Some("""
      SELECT l_orderkey, l_linenumber, l_quantity,
             l_extendedprice * (1 - l_discount) AS net_price
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
        AND l_discount > 0.02
      ORDER BY l_orderkey, l_linenumber""")
  ) { (s, d) =>
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
        && col("l_discount") > 0.02)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // --- Q2: grouped aggregation battery (TPC-H Q1 shape)
  val q02 = Query(
    "q02_group_agg",
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
             CAST(COUNT(*) AS BIGINT) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2001-09-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")
  ) { (s, d) =>
    val discPrice = col("l_extendedprice") * (lit(1) - col("l_discount"))
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity"), 2).as("sum_qty"),
        dsum(col("l_extendedprice"), 2).as("sum_base_price"),
        dsum(discPrice, 6).as("sum_disc_price"),
        dsum(discPrice * (lit(1) + col("l_tax")), 6).as("sum_charge"),
        (dsum(col("l_quantity"), 2) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice"), 2) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  // --- Q3: multi-way star join + agg (broadcast dims; TPC-H Q5 shape)
  val q03 = Query(
    "q03_join_agg",
    Some("""
      SELECT n_name,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name""")
  ) { (s, d) =>
    lineitem(s, d)
      .join(orders(s, d).filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  // --- Q4: LEFT ANTI join (SURVEY R4 blacklist semantics)
  val q04 = Query(
    "q04_anti_join",
    Some("""
      SELECT c_custkey, c_name, c_acctbal
      FROM customer
      WHERE c_custkey NOT IN (
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      ORDER BY c_custkey""")
  ) { (s, d) =>
    customer(s, d)
      .join(orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")
  }

  // --- Q5: LEFT SEMI join (SURVEY R4 accept-set semantics)
  val q05 = Query(
    "q05_semi_join",
    Some("""
      SELECT s_suppkey, s_name, s_acctbal
      FROM supplier
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01')
      ORDER BY s_suppkey""")
  ) { (s, d) =>
    supplier(s, d)
      .join(
        lineitem(s, d).filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1997-01-01").cast("timestamp")),
        col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name", "s_acctbal")
      .orderBy("s_suppkey")
  }

  // --- Q6: top-k by aggregate (TakeOrderedAndProject; SURVEY R5/§2.7)
  val q06 = Query(
    "q06_topk_customers",
    Some("""
      SELECT c.c_custkey, c.c_name,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      FROM customer c
      JOIN orders   ON o_custkey = c.c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY c.c_custkey, c.c_name
      ORDER BY revenue DESC, c_custkey
      LIMIT 10""")
  ) { (s, d) =>
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(10)
  }

  // --- Q7: ranking + running-sum window (SURVEY §2.6)
  val q07 = Query(
    "q07_window_rank",
    Some("""
      SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                      PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_spend
        FROM orders)
      WHERE rn <= 3
      ORDER BY o_custkey, rn""")
  ) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        dsumOver(col("o_totalprice"), 2, w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("run_spend"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  // --- Q8a: exact distinct counts (expand-based distinct aggregation)
  val q08 = Query(
    "q08_count_distinct",
    Some("""
      SELECT l_returnflag,
             CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS distinct_parts,
             CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS distinct_supps,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")
  ) { (s, d) =>
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("distinct_parts"),
        countDistinct(col("l_suppkey")).as("distinct_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  // --- Q8b: HLL sketch (approx_count_distinct). Sketch values differ
  // across engines, so the sketch itself is never compared; instead the
  // query grades its own relative error against the exact count computed
  // in the same pass (|approx-exact|/exact ≤ 0.15 — rsd is 0.05, so 3σ).
  // The oracle asserts the criterion must hold, making rows/schema/hash
  // all gradeable without ever hashing an engine-specific cardinality.
  val q08b = Query(
    "q08b_hll_approx",
    Some("""
      SELECT l_returnflag,
             CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
             CAST(1 AS INT) AS approx_ok
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")
  ) { (s, d) =>
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.05).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        when(abs(col("approx_parts") - col("exact_parts")).cast(DoubleType)
          / col("exact_parts") <= 0.15, 1).otherwise(0).as("approx_ok"))
      .orderBy("l_returnflag")
  }

  // --- Q9: ROLLUP hierarchy (Expand-based grouping sets)
  val q09 = Query(
    "q09_rollup",
    Some("""
      SELECT COALESCE(n_name, '_ALL_') AS nation,
             COALESCE(CAST(year(o_orderdate) AS INT), -1) AS order_year,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY ROLLUP(n_name, CAST(year(o_orderdate) AS INT))
      ORDER BY nation, order_year""")
  ) { (s, d) =>
    val base = orders(s, d)
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), year(col("o_orderdate")).cast(IntegerType).as("oy"),
        col("o_totalprice"))
    base.createOrReplaceTempView("q09_base")
    s.sql("""
      SELECT COALESCE(n_name, '_ALL_') AS nation,
             COALESCE(oy, -1) AS order_year,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_orders
      FROM q09_base
      GROUP BY ROLLUP(n_name, oy)
      ORDER BY nation, order_year""")
  }

  // --- Q10: set operations (union distinct / intersect / except)
  val q10 = Query(
    "q10_set_ops",
    Some("""
      SELECT 'building_or_machinery' AS tag, c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      UNION ALL
      SELECT 'open_and_closed' AS tag, c_custkey FROM (
        SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT
        SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F')
      UNION ALL
      SELECT 'building_no_urgent' AS tag, c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT
        SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      ORDER BY tag, c_custkey""")
  ) { (s, d) =>
    val cust = customer(s, d)
    val ord = orders(s, d)
    val a = cust.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      .union(cust.filter(col("c_mktsegment") === "MACHINERY").select("c_custkey"))
      .distinct()
      .select(lit("building_or_machinery").as("tag"), col("c_custkey"))
    val b = ord.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("c_custkey"))
      .intersect(ord.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("c_custkey")))
      .select(lit("open_and_closed").as("tag"), col("c_custkey"))
    val c = cust.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      .except(ord.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("c_custkey")))
      .select(lit("building_no_urgent").as("tag"), col("c_custkey"))
    a.unionAll(b).unionAll(c).orderBy("tag", "c_custkey")
  }

  val all: Seq[Query] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q08b, q09, q10)
}
