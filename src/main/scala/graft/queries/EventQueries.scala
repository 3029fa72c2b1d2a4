package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType}
import graft.sources.Tables._
import graft.operators.Scoring
import Hygiene._

/** SURVEY §2.13 Q11–Q13: scalar-function battery, time bucketing, and the
  * reference's EMA fold (R8) in closed form over the `events` table.
  *
  * Cross-engine notes (mirrored in each oracle):
  *  - DuckDB `year/day/hour/length` return BIGINT where Spark returns INT →
  *    explicit casts on both sides.
  *  - DuckDB `log` is log10, Spark's is ln → oracle uses `ln`.
  *  - `floor` returns DOUBLE in DuckDB → cast BIGINT both sides.
  *  - Transcendentals (sqrt/ln/pow) rounded to 6 decimals on both sides.
  */
object EventQueries {

  // --- Q11: scalar function battery (string/json/date/math/array HOF)
  val q11 = Query(
    "q11_scalar_battery",
    Some("""
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
             upper(event_type) AS et_upper,
             substr(event_type, 1, 3) AS et_sub,
             CAST(length(event_type) AS INT) AS et_len,
             event_type || '_' || CAST(user_id AS VARCHAR) AS et_user,
             regexp_extract(props, '"k": ([0-9]+)', 1) AS k_rx,
             array_to_string(regexp_extract_all(props, '[0-9]+', 0), ',') AS all_nums,
             strftime(ts, '%Y-%m-%d') AS ev_date,
             CAST(year(ts) AS INT) AS ev_year,
             CAST(day(ts) AS INT) AS ev_day,
             CAST(hour(ts) AS INT) AS ev_hour,
             CAST(floor(epoch(ts)) AS BIGINT) AS ev_epoch,
             abs(value) AS v_abs,
             CAST(floor(value) AS BIGINT) AS v_floor,
             CAST(ceil(value) AS BIGINT) AS v_ceil,
             round(sqrt(abs(value)), 6) AS v_sqrt,
             round(ln(abs(value) + 1), 6) AS v_ln,
             round(pow(abs(value), 0.3), 6) AS v_pow,
             event_id % 7 AS id_mod,
             round(list_sum([value, value * 2, value * 3]), 6) AS v_arrsum,
             CAST(1000 * CAST(string_split(CAST(event_id % 4 AS VARCHAR) || '.' || CAST(event_id % 10 AS VARCHAR) || '.' || CAST(event_id % 7 AS VARCHAR), '.')[1] AS INT)
                +   10 * CAST(string_split(CAST(event_id % 4 AS VARCHAR) || '.' || CAST(event_id % 10 AS VARCHAR) || '.' || CAST(event_id % 7 AS VARCHAR), '.')[2] AS INT)
                +        CAST(string_split(CAST(event_id % 4 AS VARCHAR) || '.' || CAST(event_id % 10 AS VARCHAR) || '.' || CAST(event_id % 7 AS VARCHAR), '.')[3] AS INT) AS INT) AS spec_version
      FROM events
      ORDER BY event_id""")
  ) { (s, d) =>
    events(s, d).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast(IntegerType).as("k_val"),
      upper(col("event_type")).as("et_upper"),
      substring(col("event_type"), 1, 3).as("et_sub"),
      length(col("event_type")).as("et_len"),
      concat(col("event_type"), lit("_"), col("user_id").cast("string")).as("et_user"),
      regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).as("k_rx"),
      array_join(regexp_extract_all(col("props"), lit("[0-9]+"), lit(0)), ",").as("all_nums"),
      date_format(col("ts"), "yyyy-MM-dd").as("ev_date"),
      year(col("ts")).as("ev_year"),
      dayofmonth(col("ts")).as("ev_day"),
      hour(col("ts")).as("ev_hour"),
      unix_timestamp(col("ts")).as("ev_epoch"),
      abs(col("value")).as("v_abs"),
      floor(col("value")).as("v_floor"),
      ceil(col("value")).as("v_ceil"),
      round(sqrt(abs(col("value"))), 6).as("v_sqrt"),
      round(log(abs(col("value")) + 1), 6).as("v_ln"),
      round(pow(abs(col("value")), 0.3), 6).as("v_pow"),
      (col("event_id") % 7).as("id_mod"),
      round(aggregate(
        array(col("value"), col("value") * 2, col("value") * 3),
        lit(0.0), (acc, x) => acc + x), 6).as("v_arrsum"),
      // R15 version encode (/root/reference/template/__init__.py:22-24):
      // dotted "maj.min.patch" string → 1000·major + 10·minor + patch.
      {
        val vstr = concat_ws(".",
          (col("event_id") % 4).cast("string"),
          (col("event_id") % 10).cast("string"),
          (col("event_id") % 7).cast("string"))
        val parts = split(vstr, "\\.")
        (parts.getItem(0).cast(IntegerType) * 1000
          + parts.getItem(1).cast(IntegerType) * 10
          + parts.getItem(2).cast(IntegerType)).cast(IntegerType).as("spec_version")
      })
      .orderBy("event_id")
  }

  // --- Q12: tumbling time buckets (batch formulation of §2.10 windows)
  val q12 = Query(
    "q12_time_buckets",
    Some("""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket, event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value,
             min(value) AS min_value,
             max(value) AS max_value
      FROM events
      GROUP BY 1, 2
      ORDER BY bucket, event_type""")
  ) { (s, d) =>
    events(s, d)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value"), 2).as("sum_value"),
        (dsum(col("value"), 2) / count(lit(1))).as("avg_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy("bucket", "event_type")
  }

  // --- Q13: per-key EMA replay, closed form (SURVEY R8;
  // /root/reference/neurons/validator.py:109-110,146 — α=0.9)
  val q13 = Query(
    "q13_ema_replay",
    Some("""
      WITH o AS (
        SELECT user_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n
        FROM events)
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             ROUND(SUM(CASE WHEN rn = 1 THEN POW(0.9, n - 1) * value
                            ELSE 0.1 * POW(0.9, n - rn) * value END), 6) AS ema
      FROM o
      GROUP BY user_id
      ORDER BY user_id""")
  ) { (s, d) =>
    Scoring.emaClosedForm(events(s, d), "user_id", "value", 0.9,
        col("ts"), col("event_id"))
      .orderBy("user_id")
  }

  // --- X40: scalar battery 2 — the §2.9 declared tail: to_date/datediff/
  // month/quarter/dayofweek, array membership/sort/HOF-filter. Cross-engine
  // notes: DuckDB date_diff takes (unit, start, end) vs Spark
  // datediff(end, start); DuckDB dayofweek is 0-based Sunday vs Spark's
  // 1-based Sunday (+1 in the oracle); sorted-array values surface via
  // element_at (doubles compared as doubles — never stringified).
  val x40 = Query(
    "x40_scalar_battery2",
    Some("""
      SELECT event_id,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) AS days_since,
             CAST(month(ts) AS INT) AS ev_month,
             CAST(quarter(ts) AS INT) AS ev_quarter,
             CAST(dayofweek(ts) + 1 AS INT) AS ev_dow,
             CAST(CASE WHEN list_contains([value, 2 * value, -value], round(value, 1)) THEN 1 ELSE 0 END AS INT) AS has_v,
             list_sort([value, 2 * value, -value])[1] AS arr_min,
             CAST(len(list_filter([value, 2 * value, -value], x -> x > 0)) AS INT) AS n_pos
      FROM events
      ORDER BY event_id""")
  ) { (s, d) =>
    val arr = array(col("value"), col("value") * 2, -col("value"))
    events(s, d).select(
      col("event_id"),
      datediff(to_date(col("ts")), lit("2024-01-01").cast("date")).as("days_since"),
      month(col("ts")).as("ev_month"),
      quarter(col("ts")).as("ev_quarter"),
      dayofweek(col("ts")).as("ev_dow"),
      // probe a value NOT guaranteed present (round(v,1) ∈ arr iff v has
      // ≤1 decimal) — membership of arr's own first element was trivially
      // always-true and couldn't discriminate a broken implementation
      when(array_contains(arr, round(col("value"), 1)), 1).otherwise(0).as("has_v"),
      element_at(sort_array(arr), 1).as("arr_min"),
      size(filter(arr, x => x > 0)).as("n_pos"))
      .orderBy("event_id")
  }

  // --- Y31: ORDERED FUNNEL (view → click → purchase, each step within
  // 24 h of the previous, earliest-completion semantics) — the classic
  // behavioral-analytics shape: |steps| keyed linear passes, no
  // windows, no per-user sort; all time math on exact epoch-µs
  // BIGINTs. Conversion is of step 1 (one broadcast 1-row scalar).
  private val FunnelSteps = Seq("view", "click", "purchase")
  private val FunnelWithinSec = 86400L
  val y31 = Query(
    "y31_funnel",
    Some {
      val wUs = FunnelWithinSec * 1000000L
      s"""
      WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
      s1 AS (SELECT user_id, min(tus) AS t FROM ev
             WHERE event_type = '${FunnelSteps(0)}' GROUP BY user_id),
      s2 AS (SELECT e.user_id, min(e.tus) AS t
             FROM ev e JOIN s1 p USING (user_id)
             WHERE e.event_type = '${FunnelSteps(1)}'
               AND e.tus > p.t AND e.tus <= p.t + $wUs
             GROUP BY e.user_id),
      s3 AS (SELECT e.user_id, min(e.tus) AS t
             FROM ev e JOIN s2 p USING (user_id)
             WHERE e.event_type = '${FunnelSteps(2)}'
               AND e.tus > p.t AND e.tus <= p.t + $wUs
             GROUP BY e.user_id),
      n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s1),
      n2 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s2),
      n3 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s3),
      u AS (
        SELECT CAST(1 AS INT) AS step, '${FunnelSteps(0)}' AS event_type,
               n AS n_users FROM n1
        UNION ALL
        SELECT CAST(2 AS INT), '${FunnelSteps(1)}', n FROM n2
        UNION ALL
        SELECT CAST(3 AS INT), '${FunnelSteps(2)}', n FROM n3)
      SELECT step, event_type, n_users,
             ROUND(CAST(n_users AS DOUBLE) / NULLIF(n1.n, 0), 6) AS conv_pct
      FROM u, n1 ORDER BY step"""
    }
  ) { (s, d) =>
    graft.operators.Funnels.funnel(events(s, d), FunnelSteps,
        withinSec = FunnelWithinSec)
      .orderBy("step")
  }

  // --- Y32: COHORT RETENTION — users grouped by the epoch-week of
  // their first event; each (cohort, offset) cell counts distinct
  // users active `offset` weeks after their own first event. Integer
  // division of epoch-µs — no week-rule/calendar dependence.
  private val RetentionPeriodSec = 604800L
  val y32 = Query(
    "y32_retention_cohorts",
    Some {
      val p = RetentionPeriodSec * 1000000L
      s"""
      WITH ev AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
      f AS (SELECT user_id, min(tus) AS t0 FROM ev GROUP BY user_id),
      a AS (SELECT DISTINCT e.user_id, f.t0 // $p AS cohort_w,
                   (e.tus - f.t0) // $p AS week_offset
            FROM ev e JOIN f USING (user_id)),
      na AS (SELECT cohort_w, week_offset, CAST(count(*) AS BIGINT) AS n_active
             FROM a GROUP BY cohort_w, week_offset),
      nc AS (SELECT t0 // $p AS cohort_w, CAST(count(*) AS BIGINT) AS n_cohort
             FROM f GROUP BY 1)
      SELECT na.cohort_w, na.week_offset, na.n_active, nc.n_cohort,
             ROUND(CAST(n_active AS DOUBLE) / n_cohort, 6) AS retention
      FROM na JOIN nc USING (cohort_w)
      ORDER BY cohort_w, week_offset"""
    }
  ) { (s, d) =>
    graft.operators.Funnels.retentionCohorts(events(s, d),
        periodSec = RetentionPeriodSec)
      .orderBy("cohort_w", "week_offset")
  }

  // --- Y33: EVENT-TRANSITION MATRIX (Sankey/path analysis) — one
  // user-keyed window (per-user history fits a partition), then a
  // partial→final (from, to) count; output is |types|² rows at any
  // corpus size. Share = one exact-int division.
  val y33 = Query(
    "y33_event_transitions",
    Some("""
      WITH o AS (SELECT user_id, event_type, epoch_us(ts) AS tus, event_id
                 FROM events),
      p AS (SELECT event_type AS from_type,
                   lead(event_type) OVER (PARTITION BY user_id
                     ORDER BY tus, event_id) AS to_type
            FROM o),
      c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
            FROM p WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
      t AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_out
            FROM c GROUP BY from_type)
      SELECT c.from_type, c.to_type, c.n,
             ROUND(CAST(c.n AS DOUBLE) / t.n_out, 6) AS out_share
      FROM c JOIN t USING (from_type)
      ORDER BY from_type, to_type""")
  ) { (s, d) =>
    graft.operators.Funnels.transitions(events(s, d))
      .orderBy("from_type", "to_type")
  }

  // --- Y34: TWO-ARM EXPERIMENT READOUT — deterministic md5 user split
  // (arm = hex-digit parity, the x69 convention: stable under corpus
  // growth, no RNG), exposed = has a view, converted = purchase
  // STRICTLY after the user's first exposure; per-arm integer counts +
  // pooled two-proportion z (one sqrt, rounded 6).
  val y34 = Query(
    "y34_ab_test",
    Some("""
      WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
      ex AS (SELECT user_id, min(tus) AS t_exp,
               CAST((instr('0123456789abcdef',
                 substr(md5(CAST(user_id AS VARCHAR)), 4, 1)) - 1) % 2
                 AS BIGINT) AS arm
             FROM ev WHERE event_type = 'view' GROUP BY user_id),
      cv AS (SELECT DISTINCT e.user_id
             FROM ev e JOIN ex USING (user_id)
             WHERE e.event_type = 'purchase' AND e.tus > ex.t_exp),
      -- one-row conditional-sum pivot (matches Funnels.abTest): a
      -- per-arm filter + cross-product pivot would yield ZERO rows when
      -- either arm is empty; the single aggregate always yields one row
      -- with empty-arm counts coalesced to 0 and undefined rates NULL
      flat AS (SELECT ex.arm,
                 CASE WHEN cv.user_id IS NOT NULL THEN 1 ELSE 0 END AS conv
               FROM ex LEFT JOIN cv ON cv.user_id = ex.user_id),
      pv AS (SELECT
               CAST(COALESCE(SUM(CASE WHEN arm = 0 THEN 1 END), 0) AS BIGINT) AS n0,
               CAST(COALESCE(SUM(CASE WHEN arm = 0 THEN conv END), 0) AS BIGINT) AS c0,
               CAST(COALESCE(SUM(CASE WHEN arm = 1 THEN 1 END), 0) AS BIGINT) AS n1,
               CAST(COALESCE(SUM(CASE WHEN arm = 1 THEN conv END), 0) AS BIGINT) AS c1
             FROM flat)
      SELECT n0, c0, n1, c1,
             ROUND(CAST(c0 AS DOUBLE) / NULLIF(n0, 0), 6) AS rate0,
             ROUND(CAST(c1 AS DOUBLE) / NULLIF(n1, 0), 6) AS rate1,
             ROUND(CAST(c1 AS DOUBLE) / NULLIF(n1, 0)
               - CAST(c0 AS DOUBLE) / NULLIF(n0, 0), 6) AS lift,
             ROUND((CAST(c1 AS DOUBLE) / NULLIF(n1, 0)
                 - CAST(c0 AS DOUBLE) / NULLIF(n0, 0))
               / NULLIF(sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                 * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                 * (1.0 / n0 + 1.0 / n1)), 0.0), 6) AS z
      FROM pv""")
  ) { (s, d) =>
    graft.operators.Funnels.abTest(events(s, d),
      exposureType = "view", conversionType = "purchase")
  }

  // --- Y41: SCD TYPE-2 DIMENSION BUILD — the warehouse-maintenance
  // shape: each user's event_type changes open a new validity interval
  // (valid_from = the change's time, valid_to = the next change's, NULL
  // = current). Change detection is one user-keyed lag, interval
  // construction one user-keyed lead — both windows share the
  // partitioning, so ONE exchange total; all time math exact epoch-µs
  // BIGINTs (timestamps stay out of graded output).
  // shared by y41 (batch window form) and y50 (stream-built store form)
  private val scd2Oracle = """
      WITH o AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
                 FROM events),
      s AS (SELECT user_id, event_type, tus, event_id,
                   lag(event_type) OVER (PARTITION BY user_id
                     ORDER BY tus, event_id) AS prev_type
            FROM o),
      c AS (SELECT user_id, event_type, tus, event_id FROM s
            WHERE prev_type IS NULL OR prev_type <> event_type),
      iv AS (SELECT user_id, event_type AS state, tus AS valid_from_us,
                    lead(tus) OVER (PARTITION BY user_id
                      ORDER BY tus, event_id) AS valid_to_us
             FROM c)
      SELECT user_id, state, valid_from_us, valid_to_us,
             CASE WHEN valid_to_us IS NULL THEN 1 ELSE 0 END AS is_current
      FROM iv ORDER BY user_id, valid_from_us"""

  val y41 = Query(
    "y41_scd2_dimension",
    Some(scd2Oracle)
  ) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    val o = events(s, d).select(col("user_id"), col("event_id"),
      col("event_type"), unix_micros(col("ts")).as("tus"))
    o.withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull ||
        col("prev_type") =!= col("event_type"))
      .withColumn("valid_to_us", lead(col("tus"), 1).over(w))
      .select(col("user_id"), col("event_type").as("state"),
        col("tus").as("valid_from_us"), col("valid_to_us"),
        when(col("valid_to_us").isNull, 1).otherwise(0).as("is_current"))
      .orderBy("user_id", "valid_from_us")
  }

  // --- Y50: y41's oracle answered from a STREAM-BUILT change-point
  // store — the y35 contract applied to dimension maintenance: events
  // arrive as a multi-file stream (data never driver-side),
  // `Scd2Stream.changes` folds each user's watermark-finalized type
  // changes and appends them to a parquet store exactly once, and the
  // dimension (closed intervals AND current NULL-valid_to rows) is
  // reconstructed by one per-user lead window over the COMPACT change
  // store (|changes| rows, not |events|). Byte-identity with the batch
  // window form's oracle is the "stream ≡ batch" claim of Scd2StreamSpec
  // put under the driver's DuckDB contract. The watermark delay spans
  // the fixture (unordered file slabs must all stay in-grace — the same
  // grace/completeness trade a real pipeline tunes down for bounded
  // disorder), and one sentinel row past max+delay drains every buffer;
  // the sentinel itself never folds, so the store holds real users only.
  /** Stage the events fixture for a watermark-finalized stream build:
    * 3 parquet files (= 3 micro-batches, data never driver-side) plus a
    * user −1 DRAIN SENTINEL landing as a LATER file (append → later
    * mtime, so the file source processes it last). The watermark delay
    * spans the fixture, so unordered file slabs all stay in-grace, and
    * the sentinel's ts past max + delay pushes the watermark over every
    * real event; the sentinel itself never folds. Returns
    * (stageDir, delaySec). */
  private def stageEventStream(s: org.apache.spark.sql.SparkSession,
                               d: String): (String, Long) = {
    val ev = events(s, d).select(col("user_id"), col("ts"),
      unix_micros(col("ts")).as("ts_us"), col("event_id"),
      col("event_type"))
    val span = ev.agg(min(col("ts_us")).as("lo"), max(col("ts_us")).as("hi"))
      .head()
    val delaySec = (span.getLong(1) - span.getLong(0)) / 1000000L + 3600L
    val stage = java.nio.file.Files
      .createTempDirectory("graft-evstage-").toString
    ev.repartition(3).write.mode("overwrite").parquet(stage)
    import s.implicits._
    Seq((-1L, span.getLong(1) + (delaySec + 86400L) * 1000000L))
      .toDF("user_id", "sent_us")
      .select(col("user_id"), timestamp_micros(col("sent_us")).as("ts"),
        col("sent_us").as("ts_us"), lit(-1L).as("event_id"),
        lit("view").as("event_type"))
      .coalesce(1).write.mode("append").parquet(stage)
    (stage, delaySec)
  }

  private def stagedSource(s: org.apache.spark.sql.SparkSession,
                           stage: String, delaySec: Long)
      : org.apache.spark.sql.DataFrame =
    s.readStream
      .schema("user_id BIGINT, ts TIMESTAMP, ts_us BIGINT, " +
        "event_id BIGINT, event_type STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(stage)
      .withWatermark("ts", s"$delaySec seconds")

  private def runToStore(q: org.apache.spark.sql.Dataset[_], path: String,
                         name: String): Unit = {
    val sq = q.writeStream.format("parquet").option("path", path)
      .outputMode("append")
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory(s"graft-$name-ckpt-").toString)
      .start()
    try sq.processAllAvailable() finally sq.stop()
  }

  private def ensureStreamScd2Store(s: org.apache.spark.sql.SparkSession,
                                    d: String): String = {
    val path = StoreFixtures.path("graft-scd2store", d, "events.parquet",
      "scd2store2")
    StoreFixtures.onceByMarker(path, "_graft_stream_done") {
      import s.implicits._
      val (stage, delaySec) = stageEventStream(s, d)
      runToStore(graft.streaming.Scd2Stream.changes(
          stagedSource(s, stage, delaySec)
            .as[graft.streaming.Scd2Stream.Ev]),
        s"$path/changes", "y50")
    }
  }

  val y50 = Query(
    "y50_scd2_stream_store",
    Some(scd2Oracle)
  ) { (s, d) =>
    // ORDER BY change_seq, not valid_from_us: the fold ordinal is the
    // deterministic tie-break when two changes share a microsecond
    // (ADVICE r10) — it reproduces the oracle's (tus, event_id) order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("change_seq")
    s.read.parquet(graft.streaming.StoreFs.dataDir(s, s"${ensureStreamScd2Store(s, d)}/changes"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
      .select(col("user_id"), col("state"), col("valid_from_us"),
        col("valid_to_us"),
        when(col("valid_to_us").isNull, 1).otherwise(0).as("is_current"))
      .orderBy("user_id", "valid_from_us")
  }

  // --- Y46: SLIDING time windows in BATCH — q12's tumbling buckets
  // generalized: `window(ts, "2 days", "1 day")`, so every event lands
  // in exactly TWO epoch-aligned windows (start = day(t) and
  // day(t) − 1). The oracle replays the assignment arithmetically
  // (UNNEST over the two offsets); window starts graded as exact
  // epoch-µs BIGINTs, never formatted timestamps.
  val y46 = Query(
    "y46_sliding_window",
    Some("""
      WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
                        event_type, value
                 FROM events),
      w AS (SELECT ((tus // 86400000000) - CAST(k AS BIGINT)) * 86400000000
                     AS w_start_us,
                   event_type, value
            FROM e, UNNEST(range(0, 2)) t(k))
      SELECT w_start_us, event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM w GROUP BY w_start_us, event_type
      ORDER BY w_start_us, event_type""")
  ) { (s, d) =>
    events(s, d)
      .groupBy(window(col("ts"), "2 days", "1 day").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        dsum(col("value"), 2).as("sum_value"))
      .select(unix_micros(col("w.start")).as("w_start_us"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("w_start_us", "event_type")
  }

  // --- Y48: BEHAVIORAL MART — funnel ⊕ retention ⊕ transitions
  // composed into ONE DAG over one events scan family (the x53
  // composition-grading discipline applied to the behavioral suite):
  // the three sections normalize into a (section, k1, k2, n, ratio)
  // union, so the graded artifact is the mart a dashboard would read,
  // not three independent queries. Each section keeps its own
  // documented scale shape; the union adds no shuffle.
  // shared by y48 (batch composition) and y53 (stream-store-served)
  private val martOracle: String = {
    val wUs = FunnelWithinSec * 1000000L
    val p = RetentionPeriodSec * 1000000L
    s"""
      WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tus,
                         event_id
                  FROM events),
      s1 AS (SELECT user_id, min(tus) AS t FROM ev
             WHERE event_type = '${FunnelSteps(0)}' GROUP BY user_id),
      s2 AS (SELECT e.user_id, min(e.tus) AS t
             FROM ev e JOIN s1 pp USING (user_id)
             WHERE e.event_type = '${FunnelSteps(1)}'
               AND e.tus > pp.t AND e.tus <= pp.t + $wUs
             GROUP BY e.user_id),
      s3 AS (SELECT e.user_id, min(e.tus) AS t
             FROM ev e JOIN s2 pp USING (user_id)
             WHERE e.event_type = '${FunnelSteps(2)}'
               AND e.tus > pp.t AND e.tus <= pp.t + $wUs
             GROUP BY e.user_id),
      n1 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s1),
      fun AS (
        SELECT 'funnel' AS section, '1' AS k1, '${FunnelSteps(0)}' AS k2,
               n1.n AS n, ROUND(CAST(n1.n AS DOUBLE) / NULLIF(n1.n, 0), 6) AS ratio
        FROM n1
        UNION ALL
        SELECT 'funnel', '2', '${FunnelSteps(1)}', CAST(count(*) AS BIGINT),
               ROUND(CAST(count(*) AS DOUBLE) / NULLIF((SELECT n FROM n1), 0), 6)
        FROM s2
        UNION ALL
        SELECT 'funnel', '3', '${FunnelSteps(2)}', CAST(count(*) AS BIGINT),
               ROUND(CAST(count(*) AS DOUBLE) / NULLIF((SELECT n FROM n1), 0), 6)
        FROM s3),
      f AS (SELECT user_id, min(tus) AS t0 FROM ev GROUP BY user_id),
      a AS (SELECT DISTINCT e.user_id, f.t0 // $p AS cohort_w,
                   (e.tus - f.t0) // $p AS week_offset
            FROM ev e JOIN f USING (user_id)),
      na AS (SELECT cohort_w, week_offset,
                    CAST(count(*) AS BIGINT) AS n_active
             FROM a GROUP BY cohort_w, week_offset),
      nc AS (SELECT t0 // $p AS cohort_w, CAST(count(*) AS BIGINT) AS n_cohort
             FROM f GROUP BY 1),
      ret AS (
        SELECT 'retention' AS section,
               CAST(na.cohort_w AS VARCHAR) AS k1,
               CAST(na.week_offset AS VARCHAR) AS k2,
               na.n_active AS n,
               ROUND(CAST(n_active AS DOUBLE) / n_cohort, 6) AS ratio
        FROM na JOIN nc USING (cohort_w)),
      pr AS (SELECT event_type AS from_type,
                    lead(event_type) OVER (PARTITION BY user_id
                      ORDER BY tus, event_id) AS to_type
             FROM ev),
      tc AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
             FROM pr WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
      tt AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_out
             FROM tc GROUP BY from_type),
      tra AS (
        SELECT 'transition' AS section, tc.from_type AS k1,
               tc.to_type AS k2, tc.n,
               ROUND(CAST(tc.n AS DOUBLE) / tt.n_out, 6) AS ratio
        FROM tc JOIN tt USING (from_type))
      SELECT section, k1, k2, n, ratio
      FROM (SELECT * FROM fun UNION ALL SELECT * FROM ret
            UNION ALL SELECT * FROM tra)
      ORDER BY section, k1, k2"""
  }

  val y48 = Query(
    "y48_behavior_mart",
    Some(martOracle)
  ) { (s, d) =>
    graft.operators.Funnels.mart(events(s, d), FunnelSteps,
      withinSec = FunnelWithinSec, periodSec = RetentionPeriodSec)
  }

  // --- Y53: y48's oracle answered from STREAM-BUILT reach stores — the
  // y35/y50 grading pattern applied to the mart composition: the three
  // behavioral stream twins (FunnelStream / RetentionStream /
  // TransitionStream) each drain the staged event stream into a parquet
  // store of per-user FINAL reach facts (exactly-once, watermark-
  // finalized), and the mart is `Funnels.martFromReaches` over those
  // compact tables — three keyed aggregations over |reaches| rows, the
  // event log never reread at serve time. Byte-identity with the batch
  // composition's oracle is MartStreamSpec's "stream-served ≡ batch"
  // claim put under the driver's DuckDB contract.
  private def ensureMartStores(s: org.apache.spark.sql.SparkSession,
                               d: String): String = {
    val path = StoreFixtures.path("graft-martstore", d, "events.parquet",
      "martstore1")
    StoreFixtures.onceByMarker(path, "_graft_stream_done") {
      import s.implicits._
      val (stage, delaySec) = stageEventStream(s, d)
      runToStore(graft.streaming.FunnelStream.stepReaches(
          stagedSource(s, stage, delaySec)
            .select("user_id", "ts", "ts_us", "event_type")
            .as[graft.streaming.FunnelStream.Ev],
          FunnelSteps, FunnelWithinSec * 1000000L),
        s"$path/steps", "y53-steps")
      runToStore(graft.streaming.RetentionStream.cellReaches(
          stagedSource(s, stage, delaySec)
            .select("user_id", "ts", "ts_us")
            .as[graft.streaming.RetentionStream.Ev],
          RetentionPeriodSec * 1000000L),
        s"$path/cells", "y53-cells")
      runToStore(graft.streaming.TransitionStream.pairReaches(
          stagedSource(s, stage, delaySec)
            .as[graft.streaming.TransitionStream.Ev]),
        s"$path/pairs", "y53-pairs")
    }
  }

  val y53 = Query(
    "y53_mart_stream_store",
    Some(martOracle)
  ) { (s, d) =>
    val p = ensureMartStores(s, d)
    graft.operators.Funnels.martFromReaches(
      s.read.parquet(graft.streaming.StoreFs.dataDir(s, s"$p/steps")).filter(col("user_id") >= 0L),
      s.read.parquet(graft.streaming.StoreFs.dataDir(s, s"$p/cells")).filter(col("user_id") >= 0L),
      s.read.parquet(graft.streaming.StoreFs.dataDir(s, s"$p/pairs")).filter(col("user_id") >= 0L),
      FunnelSteps)
  }

  val all: Seq[Query] = Seq(q11, q12, q13, x40, y31, y32, y33, y34, y41,
    y46, y48, y50, y53)
}
