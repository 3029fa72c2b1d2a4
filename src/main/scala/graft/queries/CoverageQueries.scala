package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}
import graft.sources.Tables._
import graft.operators.Scoring
import Hygiene._

/** Round-2 coverage closures (VERDICT r1 "What's missing"):
  *
  *  - x26: the declared-but-unexercised window-function tail — `rank`,
  *    `dense_rank`, `lag`, `lead` (SURVEY §2.6).
  *  - x27: driver-gradeable batch proxy for the R10 sink cadence —
  *    "(step+1) % 2 == 0 sinks weights"
  *    (/root/reference/neurons/validator.py:149).
  *  - x28: explicit GROUPING SETS (SURVEY §2.5; same Expand machinery as
  *    ROLLUP/CUBE, arbitrary set list).
  *  - x29: reference-exact seeded EMA — the validator initializes every
  *    score slot at 1.0 before folding
  *    (/root/reference/neurons/validator.py:110), so the fold is
  *    s_n = α^n·1 + Σ (1-α)·α^(n-k)·x_k, unlike q13's s₁=x₁ variant.
  */
object CoverageQueries {

  // --- X26: rank/dense_rank over a tie-heavy ordering + lag/lead over a
  // unique ordering. Ties (o_orderpriority has 5 values) make rank and
  // dense_rank actually diverge; lag/lead run over a deterministic
  // unique-keyed window so their neighbors are well-defined.
  val x26 = Query(
    "x26_window_funcs",
    Some("""
      SELECT o_custkey, o_orderkey,
             CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS INT) AS pri_rank,
             CAST(DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS INT) AS pri_dense,
             lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_price,
             lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next_price
      FROM orders
      ORDER BY o_custkey, o_orderkey""")
  ) { (s, d) =>
    val wTies = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    val wUnique = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      rank().over(wTies).as("pri_rank"),
      dense_rank().over(wTies).as("pri_dense"),
      lag("o_totalprice", 1).over(wUnique).as("prev_price"),
      lead("o_totalprice", 1).over(wUnique).as("next_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  // --- X27: R10 sink cadence. Rounds = hourly event buckets; the step
  // index is derived arithmetically from the bucket's offset to the
  // earliest bucket (scalar agg broadcast back — NOT a global row_number
  // window, which would single-partition the frame), so sink rounds are
  // (step+1) % 2 == 0 exactly as the reference gates its weight pushes.
  val x27 = Query(
    "x27_sink_cadence",
    Some("""
      WITH rounds AS (
        SELECT date_trunc('hour', ts) AS rt, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1),
      t0 AS (SELECT min(rt) AS rt0 FROM rounds)
      SELECT CAST(floor((epoch(rt) - epoch(rt0)) / 3600) AS BIGINT) AS step,
             strftime(rt, '%Y-%m-%d %H:%M:%S') AS round_t,
             n_events,
             CASE WHEN (CAST(floor((epoch(rt) - epoch(rt0)) / 3600) AS BIGINT) + 1) % 2 = 0
                  THEN 1 ELSE 0 END AS sinks_weights
      FROM rounds, t0
      ORDER BY step""")
  ) { (s, d) =>
    val rounds = events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("rt"))
      .agg(count(lit(1)).as("n_events"))
    val t0 = rounds.agg(min(unix_timestamp(col("rt"))).as("__t0"))
    rounds.crossJoin(broadcast(t0))
      .select(
        floor((unix_timestamp(col("rt")) - col("__t0")) / 3600).cast(LongType).as("step"),
        date_format(col("rt"), "yyyy-MM-dd HH:mm:ss").as("round_t"),
        col("n_events"))
      .withColumn("sinks_weights",
        when((col("step") + 1) % 2 === 0, 1).otherwise(0))
      .orderBy("step")
  }

  // --- X28: explicit GROUPING SETS — full detail, per-returnflag, and
  // grand total in one Expand pass (never-null group cols, so COALESCE
  // markers are unambiguous).
  val x28 = Query(
    "x28_grouping_sets",
    Some("""
      SELECT COALESCE(l_returnflag, '_ALL_') AS rf,
             COALESCE(l_linestatus, '_ALL_') AS ls,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      ORDER BY rf, ls""")
  ) { (s, d) =>
    lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .select(
        coalesce(col("l_returnflag"), lit("_ALL_")).as("rf"),
        coalesce(col("l_linestatus"), lit("_ALL_")).as("ls"),
        col("sum_qty"), col("n_rows"))
      .orderBy("rf", "ls")
  }

  // --- X29: seeded EMA replay (reference-exact init semantics).
  val x29 = Query(
    "x29_ema_seeded",
    Some("""
      WITH o AS (
        SELECT user_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM events)
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             ROUND(SUM(0.1 * POW(0.9, n - rn) * value) + POW(0.9, MAX(n)) * 1.0, 6) AS ema
      FROM o
      GROUP BY user_id
      ORDER BY user_id""")
  ) { (s, d) =>
    Scoring.emaClosedFormSeeded(events(s, d), "user_id", "value", 0.9, 1.0,
        col("ts"), col("event_id"))
      .orderBy("user_id")
  }

  // --- X30: analytic-function frames — ntile, percent_rank, cume_dist,
  // first/last/nth_value over an explicit full ROWS frame (the default
  // frame stops at CURRENT ROW for last_value, a classic trap — pinned
  // explicitly on both engines). All rank-derived ratios are exact int
  // divisions, so doubles are bit-identical cross-engine.
  val x30 = Query(
    "x30_window_frames",
    Some("""
      SELECT o_custkey, o_orderkey,
             CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS INT) AS quartile,
             percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS pr,
             cume_dist() OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS cd,
             first_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_price,
             last_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
             nth_value(o_totalprice, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_price
      FROM orders
      ORDER BY o_custkey, o_orderkey""")
  ) { (s, d) =>
    val wKey = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    val wPrice = Window.partitionBy("o_custkey").orderBy("o_totalprice")
    val full = wKey.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      ntile(4).over(wKey).as("quartile"),
      percent_rank().over(wPrice).as("pr"),
      cume_dist().over(wPrice).as("cd"),
      first_value(col("o_totalprice")).over(full).as("first_price"),
      last_value(col("o_totalprice")).over(full).as("last_price"),
      nth_value(col("o_totalprice"), 2).over(full).as("second_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  // --- X35: percentile sketch under a self-graded criterion (the q08b
  // pattern applied to approx_percentile): the sketch's p50 estimate must
  // land inside the exact [p45, p55] band computed in the same pass —
  // accuracy 10000 bounds rank error at ~1e-4, so the 5-point band is a
  // generous-but-real guarantee. The sketch value itself is never
  // hash-compared.
  val x35 = Query(
    "x35_approx_percentile",
    Some("""
      SELECT l_returnflag,
             round(quantile_cont(l_extendedprice, 0.45), 2) AS p45,
             round(quantile_cont(l_extendedprice, 0.55), 2) AS p55,
             CAST(1 AS INT) AS approx_ok
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")
  ) { (s, d) =>
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("ap50"),
        // one sort pass for both exact quantiles (array form), not two
        expr("percentile(l_extendedprice, array(0.45, 0.55))").as("pband"))
      // band edges rounded to cents: both engines interpolate
      // lo + (hi-lo)·frac with possible last-ulp differences, and a 1e-6
      // rounding boundary at price magnitude ~1e4 sits ~1e5 ulps away —
      // 1e-2 makes the boundary unreachable by ulp noise.
      .select(col("l_returnflag"),
        round(element_at(col("pband"), 1), 2).as("p45"),
        round(element_at(col("pband"), 2), 2).as("p55"),
        when(col("ap50") >= element_at(col("pband"), 1)
          && col("ap50") <= element_at(col("pband"), 2), 1)
          .otherwise(0).as("approx_ok"))
      .orderBy("l_returnflag")
  }

  // --- X37: skew-salted aggregation under the oracle — the two-phase
  // groupBy(key, salt) → groupBy(key) rewrite must be bit-equal to the
  // direct sum (decimal-exact partials make it so regardless of which
  // salt bucket each row lands in). The oracle is the PLAIN sum: the
  // salting is invisible in the result, visible only in the plan.
  val x37 = Query(
    "x37_salted_agg",
    Some("""
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")
  ) { (s, d) =>
    graft.operators.Skew.saltedSum(
        lineitem(s, d), "l_returnflag", col("l_quantity"), "sum_qty", salts = 16)
      .orderBy("l_returnflag")
  }

  // --- X52: skew-salted JOIN under the oracle (completing x37's salted
  // AGG): the small side is replicated salts×, the fact side salted by a
  // row-id hash, join key becomes (key, salt) — one hot key spreads over
  // `salts` reducers. The salt is nondeterministic ACROSS RUNS
  // (monotonically_increasing_id) but provably invisible in the result:
  // every fact row matches exactly its salt's replica. Oracle is the
  // PLAIN join — as with x37, the rewrite must be bit-equal.
  val x52 = Query(
    "x52_salted_join",
    Some("""
      WITH dim(l_returnflag, label) AS (
        VALUES ('A', 'accepted'), ('N', 'neutral'), ('R', 'returned'))
      SELECT label,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem JOIN dim USING (l_returnflag)
      GROUP BY label
      ORDER BY label""")
  ) { (s, d) =>
    val spark = s
    import spark.implicits._
    val dim = Seq(("A", "accepted"), ("N", "neutral"), ("R", "returned"))
      .toDF("l_returnflag", "label")
    graft.operators.Skew.saltedJoin(
        lineitem(s, d).select("l_returnflag", "l_quantity"), dim,
        key = "l_returnflag", salts = 16)
      .groupBy("label")
      .agg(dsum(col("l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy("label")
  }

  val all: Seq[Query] = Seq(x26, x27, x28, x29, x30, x35, x37, x52)
}
