package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral analytics over the event stream (north-star extension,
  * SURVEY §2.12): ordered funnels and cohort retention — the two
  * classic "how do users move through time" OLAP shapes.
  *
  * Determinism discipline: all time arithmetic runs on `unix_micros`
  * BIGINTs (exact µs integers in both engines — no interval/calendar
  * functions whose week/zone rules could differ); the only float in
  * either output is one final ratio division.
  */
object Funnels {

  /** Ordered funnel with a per-step time bound: a user reaches step i+1
    * iff they have a `steps(i+1)` event STRICTLY after their step-i
    * completion time and within `withinSec` of it; completion times are
    * earliest-qualifying (min), so the whole chain is deterministic.
    *
    * Scale shape: step 1 is one keyed aggregation; each later step is
    * one equi-join keyed by user_id between that step's event slice and
    * the (user, t) frontier — |steps| linear keyed passes, no windows,
    * no per-user sorting; the conversion denominator is the 1-row
    * step-1 count broadcast back (the L1-normalize pattern).
    * Output: step, event_type, n_users, conv_pct (of step 1). */
  def funnel(events: DataFrame, steps: Seq[String],
             withinSec: Long): DataFrame = {
    require(steps.nonEmpty)
    val withinUs = withinSec * 1000000L
    val ev = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("tus"))
    val frontiers = steps.tail.scanLeft(
      graft.core.Caches.scoped(
        ev.filter(col("event_type") === steps.head)
          .groupBy("user_id").agg(min(col("tus")).as("t")))) { (prev, s) =>
      graft.core.Caches.scoped(
        ev.filter(col("event_type") === s)
          .join(prev.select(col("user_id"), col("t").as("t_prev")), "user_id")
          .filter(col("tus") > col("t_prev") &&
            col("tus") <= col("t_prev") + withinUs)
          .groupBy("user_id").agg(min(col("tus")).as("t")))
    }
    val base = broadcast(frontiers.head.agg(count(lit(1)).as("n0")))
    frontiers.zipWithIndex.map { case (f, i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(steps(i)).as("event_type"),
          col("n_users"))
    }.reduce(_.unionAll(_))
      .crossJoin(base)
      .select(col("step"), col("event_type"), col("n_users"),
        // NULL-guard the divisor (the z-score's se discipline): with an
        // empty step 1, Spark's x/0 yields NULL but DuckDB's IEEE
        // doubles yield inf — a latent cross-engine mismatch
        when(col("n0") === 0L, lit(null).cast("double"))
          .otherwise(round(col("n_users").cast("double") / col("n0"), 6))
          .as("conv_pct"))
  }

  /** Event-transition matrix (the Sankey/path-analysis table): for each
    * ordered (event_type → next event_type) pair within a user's
    * event-time sequence, the transition count and its share of the
    * source type's outgoing transitions.
    *
    * Scale shape: ONE window keyed by user (per-user history fits a
    * partition by construction — the x11/x13 argument), then a
    * partial→final count per (from, to) pair — the output is
    * |event_types|² rows regardless of corpus size. The share is one
    * integer/integer division. Output: from_type, to_type, n, out_share. */
  def transitions(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tus"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val outs = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_out"))
    pairs.join(broadcast(outs), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("n_out"), 6).as("out_share"))
  }

  /** Two-arm experiment readout: users are assigned to arms by the
    * deterministic md5 split (the x69 convention — stable under corpus
    * growth, no RNG), "exposed" = has a `exposureType` event,
    * "converted" = has a `conversionType` event strictly after their
    * first exposure; the readout is per-arm integer counts, the
    * conversion-rate difference, and the pooled two-proportion
    * z-score (the only transcendental — one sqrt — rounded 6).
    *
    * Scale shape: two keyed aggregations (first exposure, any
    * qualifying conversion) and a 2-row final fold. */
  def abTest(events: DataFrame, exposureType: String,
             conversionType: String): DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("tus"))
    val arm = (conv(substring(md5(col("user_id").cast("string")), 1, 4), 16, 10)
      .cast("long") % 2).as("arm")
    val exposed = graft.core.Caches.scoped(
      ev.filter(col("event_type") === exposureType)
        .groupBy("user_id").agg(min(col("tus")).as("t_exp"))
        .select(col("user_id"), arm, col("t_exp")))
    val converted = ev.filter(col("event_type") === conversionType)
      .join(exposed.select("user_id", "t_exp"), "user_id")
      .filter(col("tus") > col("t_exp"))
      .select("user_id").distinct()
      .withColumn("conv", lit(1L))
    // one-row conditional-sum pivot (ADVICE r8): the old per-arm
    // filter + crossJoin pivot silently produced ZERO rows when either
    // arm had no exposed users — callers expecting a 1-row readout got
    // nothing. A single global aggregate always yields exactly one row,
    // with empty-arm counts coalesced to 0.
    val flat = exposed.join(converted, Seq("user_id"), "left")
      .select(col("arm"), coalesce(col("conv"), lit(0L)).as("conv"))
    def armSum(a: Int, c: org.apache.spark.sql.Column) =
      coalesce(sum(when(col("arm") === a, c)), lit(0L))
    flat.agg(
        armSum(0, lit(1L)).as("n0"), armSum(0, col("conv")).as("c0"),
        armSum(1, lit(1L)).as("n1"), armSum(1, col("conv")).as("c1"))
      // an empty arm has no defined rate — NULL, never a 0-divide
      .withColumn("p0", when(col("n0") === 0L, lit(null).cast("double"))
        .otherwise(col("c0").cast("double") / col("n0")))
      .withColumn("p1", when(col("n1") === 0L, lit(null).cast("double"))
        .otherwise(col("c1").cast("double") / col("n1")))
      // every divisor is guarded: under ANSI mode (the Spark 4
      // default) x/0 THROWS — a degenerate pool must read as NULL,
      // not kill the job
      .withColumn("p_pool",
        when(col("n0") + col("n1") === 0L, lit(null).cast("double"))
          .otherwise((col("c0") + col("c1")).cast("double")
            / (col("n0") + col("n1"))))
      .withColumn("se",
        when(col("n0") === 0L || col("n1") === 0L,
            lit(null).cast("double"))
          .otherwise(sqrt(col("p_pool") * (lit(1.0) - col("p_pool"))
            * (lit(1.0) / col("n0") + lit(1.0) / col("n1")))))
      .select(col("n0"), col("c0"), col("n1"), col("c1"),
        round(col("p0"), 6).as("rate0"), round(col("p1"), 6).as("rate1"),
        round(col("p1") - col("p0"), 6).as("lift"),
        // degenerate readout (0% or 100% pooled conversion, or an
        // empty arm) has no defined z — NULL in both engines, never a
        // division error
        when(col("se") === 0d, lit(null).cast("double"))
          .otherwise(round((col("p1") - col("p0")) / col("se"), 6)).as("z"))
  }

  /** Cohort retention: users are grouped by the epoch-period of their
    * FIRST event (cohort), and each (cohort, offset) cell counts the
    * distinct users with any event `offset` periods after their own
    * first event. Period math is integer division of epoch-µs — no
    * calendar/week-rule dependence.
    *
    * Scale shape: one keyed min (first event), one keyed join back to
    * the events (user-keyed, linear), a distinct + partial→final count
    * per (cohort, offset) cell, and a bounded cohort-size table joined
    * on cohort. Output: cohort_w, week_offset, n_active, n_cohort,
    * retention. */
  def retentionCohorts(events: DataFrame, periodSec: Long): DataFrame = {
    val p = periodSec * 1000000L
    val ev = events.select(col("user_id"), unix_micros(col("ts")).as("tus"))
    val first = graft.core.Caches.scoped(
      ev.groupBy("user_id").agg(min(col("tus")).as("t0")))
    val cells = ev.join(first, "user_id")
      .select(col("user_id"), expr(s"t0 div ${p}L").as("cohort_w"),
        expr(s"(tus - t0) div ${p}L").as("week_offset"))
      .distinct()
      .groupBy("cohort_w", "week_offset").agg(count(lit(1)).as("n_active"))
    val sizes = first
      .groupBy(expr(s"t0 div ${p}L").as("cohort_w"))
      .agg(count(lit(1)).as("n_cohort"))
    cells.join(broadcast(sizes), "cohort_w")
      .select(col("cohort_w"), col("week_offset"), col("n_active"), col("n_cohort"),
        round(col("n_active").cast("double") / col("n_cohort"), 6)
          .as("retention"))
  }

  /** The BEHAVIORAL MART (y48): funnel ⊕ retention ⊕ transitions
    * normalized into one (section, k1, k2, n, ratio) union over a
    * single events scan family. */
  def mart(events: DataFrame, steps: Seq[String], withinSec: Long,
           periodSec: Long): DataFrame = {
    val fun = funnel(events, steps, withinSec)
      .select(lit("funnel").as("section"),
        col("step").cast("string").as("k1"), col("event_type").as("k2"),
        col("n_users").as("n"), col("conv_pct").as("ratio"))
    val ret = retentionCohorts(events, periodSec)
      .select(lit("retention").as("section"),
        col("cohort_w").cast("string").as("k1"),
        col("week_offset").cast("string").as("k2"),
        col("n_active").as("n"), col("retention").as("ratio"))
    val tra = transitions(events)
      .select(lit("transition").as("section"),
        col("from_type").as("k1"), col("to_type").as("k2"),
        col("n"), col("out_share").as("ratio"))
    fun.unionAll(ret).unionAll(tra).orderBy("section", "k1", "k2")
  }

  /** [[mart]] assembled from the MATERIALIZED stream-twin outputs
    * instead of raw events — the serving plan a live dashboard reads at
    * 100 TB: `FunnelStream.StepReach`, `RetentionStream.CellReach` and
    * `TransitionStream.Pair` rows are per-user FINAL facts (each
    * emitted exactly once, watermark-finalized), so the mart is three
    * keyed aggregations over compact reach tables — |reaches| rows,
    * never the event log. Row-identical to [[mart]] over the finalized
    * events by construction (spec-pinned in MartStreamSpec):
    *  - funnel: step counts from StepReach, zero-filled from the step
    *    spec (an empty step has no reach rows but the mart still
    *    carries its 0 row), ratio against the step-1 count with the
    *    same NULL-guarded divisor;
    *  - retention: n_active = cells per (cohort, offset); n_cohort =
    *    that cohort's offset-0 cells (every user reaches offset 0 at
    *    its own anchor);
    *  - transitions: pair counts + out-share, the batch tail verbatim. */
  def martFromReaches(stepReaches: DataFrame, cells: DataFrame,
                      pairs: DataFrame, steps: Seq[String]): DataFrame = {
    val spark = stepReaches.sparkSession
    import spark.implicits._
    val counts = stepReaches.groupBy("step")
      .agg(count(lit(1)).as("n_users"))
    val spec = steps.zipWithIndex
      .map { case (s, i) => (i + 1, s) }.toDF("step", "event_type")
    val filled = broadcast(spec).join(counts, Seq("step"), "left")
      .select(col("step"), col("event_type"),
        coalesce(col("n_users"), lit(0L)).as("n_users"))
    val base = broadcast(filled.filter(col("step") === 1)
      .select(col("n_users").as("n0")))
    val fun = filled.crossJoin(base)
      .select(lit("funnel").as("section"),
        col("step").cast("string").as("k1"), col("event_type").as("k2"),
        col("n_users").as("n"),
        when(col("n0") === 0L, lit(null).cast("double"))
          .otherwise(round(col("n_users").cast("double") / col("n0"), 6))
          .as("ratio"))
    // per-cohort and per-source denominators via KEYED windows over the
    // already-aggregated rows (|cohorts|·|offsets| and |types|² rows) —
    // a self-join back onto the same materialized table trips Catalyst's
    // conflicting-reference check, and the window needs no second scan
    val wc = org.apache.spark.sql.expressions.Window.partitionBy("cohort_w")
    val ret = cells.groupBy("cohort_w", "week_offset")
      .agg(count(lit(1)).as("n_active"))
      .withColumn("n_cohort",
        max(when(col("week_offset") === 0L, col("n_active"))).over(wc))
      .select(lit("retention").as("section"),
        col("cohort_w").cast("string").as("k1"),
        col("week_offset").cast("string").as("k2"),
        col("n_active").as("n"),
        round(col("n_active").cast("double") / col("n_cohort"), 6)
          .as("ratio"))
    val wf = org.apache.spark.sql.expressions.Window.partitionBy("from_type")
    val tra = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("n_out", sum(col("n")).over(wf))
      .select(lit("transition").as("section"),
        col("from_type").as("k1"), col("to_type").as("k2"), col("n"),
        round(col("n").cast("double") / col("n_out"), 6).as("ratio"))
    fun.unionAll(ret).unionAll(tra).orderBy("section", "k1", "k2")
  }
}
