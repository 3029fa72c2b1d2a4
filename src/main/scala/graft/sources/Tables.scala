package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver fixtures (`FIXTURES.md`).
  *
  * All tables are parquet; reads are plain `spark.read.parquet`, so Catalyst
  * gets full predicate-pushdown / column-pruning freedom (check
  * `PushedFilters` / `ReadSchema` in `.explain("formatted")`). Nothing is
  * cached here — at 100 TB a cache of the fact table is a liability; the
  * dimension tables are small enough that re-scans are free.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to map
    * to TimestampType. With `spark.sql.legacy.parquet.nanosAsLong=true`
    * (set by Engine/Verify/Bench) it surfaces as LongType nanos; convert to
    * a µs timestamp here (matches DuckDB's µs compare, SURVEY §7.5). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      // TIMESTAMP(NANOS) fixture flavor: surfaced as long via the
      // nanosAsLong legacy conf, truncated to µs here.
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      // µs isAdjustedToUTC=false fixture flavor (round-8 regeneration):
      // Spark infers TIMESTAMP_NTZ, which unix_micros/window arithmetic
      // reject. The cast interprets the wall-clock value in the session
      // time zone — pinned to UTC by Engine.configure — so the resulting
      // instants carry the SAME microsecond values DuckDB sees reading
      // the column naively; oracle parity is unchanged.
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
