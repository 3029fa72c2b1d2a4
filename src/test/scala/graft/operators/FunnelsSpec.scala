package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** Laws of the behavioral-analytics pair (funnel, cohort retention). */
class FunnelsSpec extends AnyFunSuite with SparkTest {

  private def ev(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("user_id", "event_type", "t")
      .select(col("user_id"), col("event_type"),
        to_timestamp(col("t")).as("ts"))
  }

  test("funnel: ordering and the per-step window are both enforced") {
    val d = ev(
      // u1 completes the whole funnel in order, within windows
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 11:00:00"),
      (1L, "purchase", "2024-01-01 12:00:00"),
      // u2 clicks BEFORE viewing → click must not count
      (2L, "click", "2024-01-02 09:00:00"),
      (2L, "view", "2024-01-02 10:00:00"),
      // u3 clicks 25h after viewing → outside the 24h window
      (3L, "view", "2024-01-03 10:00:00"),
      (3L, "click", "2024-01-04 11:00:00"),
      // u4 never views: purchase alone must not enter the funnel
      (4L, "purchase", "2024-01-01 10:00:00"))
    val r = Funnels.funnel(d, Seq("view", "click", "purchase"), 86400L)
      .collect().map(x => x.getAs[Int]("step") ->
        (x.getAs[Long]("n_users"), x.getAs[Double]("conv_pct"))).toMap
    assert(r(1) == ((3L, 1.0)))          // u1, u2, u3 viewed
    assert(r(2) == ((1L, 0.333333)))     // only u1's click qualifies
    assert(r(3) == ((1L, 0.333333)))
  }

  test("funnel: earliest completion seeds the next window (min semantics)") {
    // u1's FIRST view is 10:00; a click 23h later is inside ITS window
    // even though a later view exists closer to the click
    val d = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-02 08:00:00"),
      (1L, "click", "2024-01-02 09:00:00"))
    val r = Funnels.funnel(d, Seq("view", "click"), 86400L)
      .collect().map(x => x.getAs[Int]("step") -> x.getAs[Long]("n_users")).toMap
    assert(r == Map(1 -> 1L, 2 -> 1L))
  }

  test("transitions: in-order pairs per user; shares sum to 1 per source") {
    val d = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 11:00:00"),
      (1L, "view", "2024-01-01 12:00:00"),
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "purchase", "2024-01-01 11:00:00"))
      .withColumn("event_id", col("user_id") * 100 +
        unix_timestamp(col("ts")) % 100000)
    val r = Funnels.transitions(d).collect()
      .map(x => (x.getAs[String]("from_type"), x.getAs[String]("to_type")) ->
        (x.getAs[Long]("n"), x.getAs[Double]("out_share"))).toMap
    // u1: view→click, click→view; u2: view→purchase
    assert(r(("view", "click")) == ((1L, 0.5)))
    assert(r(("view", "purchase")) == ((1L, 0.5)))
    assert(r(("click", "view")) == ((1L, 1.0)))
    assert(r.size == 3)
  }

  test("abTest: conversion counts only strictly after first exposure") {
    val d = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "purchase", "2024-01-01 11:00:00"),   // converts
      (2L, "purchase", "2024-01-02 09:00:00"),   // BEFORE the view
      (2L, "view", "2024-01-02 10:00:00"),
      (3L, "view", "2024-01-03 10:00:00"))       // never converts
    val r = Funnels.abTest(d, "view", "purchase").collect()
    assert(r.length == 1)
    val row = r.head
    val n = row.getAs[Long]("n0") + row.getAs[Long]("n1")
    val c = row.getAs[Long]("c0") + row.getAs[Long]("c1")
    assert(n == 3L, s"all three viewers are exposed: $row")
    assert(c == 1L, s"only u1's post-exposure purchase converts: $row")
  }

  test("abTest: degenerate pools still yield one readout row") {
    // no exposures at all — the old per-arm filter + cross-product
    // pivot silently returned ZERO rows here (ADVICE r8)
    val empty = Funnels.abTest(ev((1L, "click", "2024-01-01 10:00:00")),
      "view", "purchase").collect()
    assert(empty.length == 1, "empty pools must yield a degenerate row")
    assert(empty.head.getAs[Long]("n0") == 0L &&
      empty.head.getAs[Long]("n1") == 0L)
    assert(empty.head.isNullAt(empty.head.fieldIndex("rate0")),
      "an empty arm has no defined rate")
    // one arm empty: md5-parity arms are data-dependent, so find a uid
    // for each arm and use only one of them
    def armOf(uid: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(uid.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 4), 16) % 2
    }
    val uid0 = (1L to 100L).find(armOf(_) == 0L).get
    val one = Funnels.abTest(ev((uid0, "view", "2024-01-01 10:00:00"),
      (uid0, "purchase", "2024-01-01 11:00:00")), "view", "purchase")
      .collect()
    assert(one.length == 1, "a one-arm readout must still be one row")
    assert(one.head.getAs[Long]("n0") == 1L &&
      one.head.getAs[Long]("c0") == 1L &&
      one.head.getAs[Long]("n1") == 0L)
    assert(one.head.isNullAt(one.head.fieldIndex("rate1")))
  }

  test("retention: cohorts anchor on each user's own first event") {
    val d = ev(
      (1L, "view", "2024-01-01 00:00:00"),  // u1 cohort week W
      (1L, "click", "2024-01-09 00:00:00"), // 8 days later → offset 1
      (2L, "view", "2024-01-10 00:00:00"),  // u2 starts a week later
      (2L, "view", "2024-01-11 00:00:00"))  // same week → offset 0 only
    val r = Funnels.retentionCohorts(d, 604800L).collect()
      .map(x => (x.getAs[Long]("cohort_w"), x.getAs[Long]("week_offset")) ->
        (x.getAs[Long]("n_active"), x.getAs[Long]("n_cohort"),
          x.getAs[Double]("retention"))).toMap
    val cohorts = r.keys.map(_._1).toSet
    assert(cohorts.size == 2, s"two distinct cohorts expected: $r")
    // every cohort has an offset-0 row with full retention
    r.groupBy(_._1._1).foreach { case (_, cells) =>
      val zero = cells.find(_._1._2 == 0L).get._2
      assert(zero._3 == 1.0, s"offset 0 must retain everyone: $r")
    }
    // u1's offset-1 activity shows up in exactly one cell
    assert(r.count { case ((_, off), (na, _, _)) => off == 1L && na == 1L } == 1)
  }
}
