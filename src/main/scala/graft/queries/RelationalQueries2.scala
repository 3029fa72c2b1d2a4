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

  // --- X23: full/left/right outer joins + null-introducing predicates
  val x23 = Query(
    "x23_outer_joins",
    Some("""
      WITH urgent AS (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_urgent
        FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey),
      seg AS (SELECT c_custkey, c_mktsegment FROM customer)
      SELECT COALESCE(c_mktsegment, '_NO_CUSTOMER_') AS segment,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN n_urgent IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_without_urgent,
             CAST(SUM(COALESCE(n_urgent, 0)) AS BIGINT) AS total_urgent
      FROM seg FULL OUTER JOIN urgent ON c_custkey = o_custkey
      GROUP BY 1
      ORDER BY segment""")
  ) { (s, d) =>
    val urgent = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .groupBy("o_custkey").agg(count(lit(1)).as("n_urgent"))
    customer(s, d).select("c_custkey", "c_mktsegment")
      .join(urgent, col("c_custkey") === col("o_custkey"), "full_outer")
      .groupBy(coalesce(col("c_mktsegment"), lit("_NO_CUSTOMER_")).as("segment"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("n_urgent").isNull, 1L).otherwise(0L)).as("n_without_urgent"),
        sum(coalesce(col("n_urgent"), lit(0L))).as("total_urgent"))
      .orderBy("segment")
  }

  // --- X24: LIKE / IN / BETWEEN predicate battery over part (+ join)
  val x24 = Query(
    "x24_part_predicates",
    Some("""
      SELECT p_brand,
             CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(SUM(CASE WHEN p_type LIKE '%ECO%' THEN 1 ELSE 0 END) AS BIGINT) AS n_economy,
             CAST(SUM(CASE WHEN p_size BETWEEN 10 AND 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_mid_size,
             CAST(SUM(CASE WHEN regexp_matches(p_name, '^[a-m]') THEN 1 ELSE 0 END) AS BIGINT) AS n_first_half,
             CAST(SUM(CAST(CASE WHEN p_size IN (5, 15, 25, 35, 45) THEN p_retailprice ELSE 0 END AS DECIMAL(18,2))) AS DOUBLE) AS price_selected
      FROM part
      GROUP BY p_brand
      ORDER BY p_brand""")
  ) { (s, d) =>
    part(s, d)
      .groupBy("p_brand")
      .agg(
        count(lit(1)).as("n_parts"),
        sum(when(col("p_type").like("%ECO%"), 1L).otherwise(0L)).as("n_economy"),
        sum(when(col("p_size").between(10, 20), 1L).otherwise(0L)).as("n_mid_size"),
        sum(when(col("p_name").rlike("^[a-m]"), 1L).otherwise(0L)).as("n_first_half"),
        sum(when(col("p_size").isin(5, 15, 25, 35, 45), col("p_retailprice"))
          .otherwise(lit(0)).cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("price_selected"))
      .orderBy("p_brand")
  }

  // --- Y42: PIVOT — the wide-reshape face of grouped aggregation:
  // per-user event counts pivoted to one column per event type. The
  // pivot VALUES are explicit (the deterministic-schema contract; an
  // inferred pivot would scan for distinct values first and its column
  // order would be data-dependent), and absent combinations coalesce
  // to 0 on both sides. Catalyst rewrites pivot to conditional
  // aggregation — exactly the oracle's portable formulation.
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")
  val y42 = Query(
    "y42_pivot",
    Some(s"""
      SELECT user_id,
             ${EventTypes.map(t =>
               s"CAST(COALESCE(SUM(CASE WHEN event_type = '$t' THEN 1 END), 0) AS BIGINT) AS n_$t")
               .mkString(",\n             ")}
      FROM events GROUP BY user_id ORDER BY user_id""")
  ) { (s, d) =>
    val piv = events(s, d)
      .groupBy("user_id")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
    piv.select(col("user_id") +:
        EventTypes.map(t => coalesce(col(s"`$t`"), lit(0L)).as(s"n_$t")): _*)
      .orderBy("user_id")
  }

  // --- Y43: UNPIVOT (melt) — the inverse reshape: lineitem's three
  // quantity-ish measures melted to (key, measure, value) rows via the
  // first-class `unpivot` (Spark 3.4+), graded against the UNION ALL
  // expansion it is defined as.
  val y43 = Query(
    "y43_unpivot",
    Some("""
      WITH m AS (
        SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
               CAST(l_quantity AS DOUBLE) AS value FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'extendedprice',
               CAST(l_extendedprice AS DOUBLE) FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount',
               CAST(l_discount AS DOUBLE) FROM lineitem)
      SELECT measure, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM m GROUP BY measure ORDER BY measure""")
  ) { (s, d) =>
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("double"),
        col("l_extendedprice").cast("double"),
        col("l_discount").cast("double"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity").as("quantity"),
          col("l_extendedprice").as("extendedprice"),
          col("l_discount").as("discount")),
        "measure", "value")
      .groupBy("measure")
      .agg(count(lit(1)).as("n"),
        dsum(col("value"), 2).as("total"))
      .orderBy("measure")
  }

  // --- Y47: CORRELATION / COVARIANCE — the bivariate-stats aggregates
  // (§2.5 tail). The graded values come from EXACT DECIMAL sufficient
  // statistics (n, Σx, Σy, Σxy, Σx², Σy²) assembled into the closed
  // forms in identically-ordered DOUBLE arithmetic — accumulation-order
  // noise never reaches the output — and Spark's BUILT-IN `corr` is
  // self-graded against the exact value (|Δ| ≤ 1e-4 flag, the q08b
  // pattern: a float-accumulated aggregate's value cannot cross
  // engines, its agreement with the exact form can).
  val y47 = Query(
    "y47_corr_stats",
    Some("""
      WITH s AS (SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                          * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                          * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
                 FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
             ROUND((n * sxy - sx * sy)
               / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_xy,
             ROUND((sxy - sx * sy / n) / n, 6) AS covar_pop_xy,
             CAST(1 AS INT) AS builtin_ok
      FROM s ORDER BY l_returnflag""")
  ) { (s, d) =>
    val dec = (c: String) =>
      col(c).cast(org.apache.spark.sql.types.DecimalType(18, 2))
    val stats = lineitem(s, d).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(dec("l_quantity")).cast("double").as("sx"),
        sum(dec("l_extendedprice")).cast("double").as("sy"),
        sum(dec("l_quantity") * dec("l_extendedprice")).cast("double").as("sxy"),
        sum(dec("l_quantity") * dec("l_quantity")).cast("double").as("sxx"),
        sum(dec("l_extendedprice") * dec("l_extendedprice")).cast("double").as("syy"),
        corr(col("l_quantity"), col("l_extendedprice")).as("corr_builtin"))
    stats.select(col("l_returnflag"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy"))
          / sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
            * (col("n") * col("syy") - col("sy") * col("sy"))), 6)
          .as("corr_xy"),
        round((col("sxy") - col("sx") * col("sy") / col("n")) / col("n"), 6)
          .as("covar_pop_xy"),
        when(abs(col("corr_builtin")
            - (col("n") * col("sxy") - col("sx") * col("sy"))
              / sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                * (col("n") * col("syy") - col("sy") * col("sy"))))
            <= 0.0001, 1).otherwise(0).as("builtin_ok"))
      .orderBy("l_returnflag")
  }

  val all: Seq[Query] = Seq(x17, x18, x19, x20, x23, x24, y42, y43, y47)
}
