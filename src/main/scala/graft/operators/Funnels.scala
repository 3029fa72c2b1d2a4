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
        round(col("n_users").cast("double") / col("n0"), 6).as("conv_pct"))
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
}
