package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's scale-oriented defaults.
  *
  * Design posture (SURVEY §7.1, §7.5 "100 TB design posture"): everything
  * here is a *scale* knob, not a correctness knob — AQE for runtime
  * re-planning (partition coalescing, skew-join splitting), a bounded
  * broadcast threshold so dimension tables broadcast but fact tables never
  * do, and a shuffle-partition count sized to the local harness (on a real
  * cluster this would be `spark.sql.shuffle.partitions` ≈ 2–3× total cores,
  * or left to AQE's coalescing).
  */
object Engine {

  /** Apply engine defaults to a builder; caller picks master/app. */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // Deterministic µs timestamps in written parquet (oracle compares at µs).
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // events.ts is TIMESTAMP(NANOS): surface as long, converted in Tables.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // A 40-query inventory generates several hundred codegen units; the
      // default 100-entry cache evicts them between runs, forcing Janino
      // recompilation + fresh JIT per query (measured 3-4x wall inflation).
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // Dimension-table scans are tiny; don't let tiny files fragment tasks.
      .config("spark.sql.files.maxPartitionBytes", (128L * 1024 * 1024).toString)
      // InferFiltersFromGenerate synthesizes `size(e) > 0 AND isnotnull(e)`
      // below every explode; filter pushdown then substitutes the
      // generator's input EXPRESSION into that filter, so every text query
      // re-derives its whole tokenize+shingle chain (regexp_replace +
      // split + zip_with per row) once more just to prove non-emptiness —
      // visible as the monster Filter under each Generate in the r17
      // before-plans. The corpus explodes here are over expressions that
      // are never empty (words() yields ≥ 1 token), so the inferred filter
      // prunes nothing at any scale — cost without benefit, independent of
      // cluster size (a per-ROW effect, not a local[32] artifact).
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      // Status-store hygiene for LONG-LIVED sessions (a 185-query
      // Verify run, the 52-suite test JVM): the SQL listener retains a
      // physicalPlanDescription STRING per execution (default 1000),
      // and the iterated plans here (Lloyd rounds, store lifecycles)
      // render to multi-MB trees — that is a driver-heap leak, not
      // telemetry. Cap the plan string itself too: generateTreeString
      // honors the cap WHILE building, so one pathological plan cannot
      // OOM the render (observed: suite OOM inside explainString).
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.sql.maxPlanStringLength", (256 * 1024).toString)
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "50")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = configure(
      SparkSession.builder().master(s"local[$cores]").appName("graft"),
      shufflePartitions = math.max(cores, 4)
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
