package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** A named engine query with an optional DuckDB oracle.
  *
  * `run` is the Spark-native program; `sql` is semantically-equivalent ANSI
  * SQL the driver executes in DuckDB over the same parquet tables. Column
  * names/types and row order must match exactly (driver hashes values after
  * sorting columns by name) — hence the cross-engine hygiene helpers below.
  */
final case class Query(
    name: String,
    sql: Option[String]
)(val run: (SparkSession, String) => DataFrame)

/** Cross-engine numeric hygiene.
  *
  * Hash-matching DuckDB means floating-point results must be *bit-identical*,
  * not just close. Rules used throughout the inventory:
  *
  *  - Row-level arithmetic over the same doubles is IEEE-deterministic in
  *    both engines → no rounding needed.
  *  - Aggregation order differs between engines (Spark partial/final
  *    HashAggregate vs DuckDB's scan order), so double sums drift in the low
  *    bits. Fix: sum *exactly* in DECIMAL(18,s) and cast the exact result
  *    back to DOUBLE (`dsum` here ≡ `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS
  *    DOUBLE)` in the oracle).
  *  - Averages/ratios: exact-decimal sums divided as doubles.
  *  - Transcendentals (pow/exp/cosine): not guaranteed identical across
  *    libm implementations → `round(x, 6)` on O(1) values.
  */
object Hygiene {
  /** Exact decimal sum surfaced as double; mirror in DuckDB SQL as
    * `CAST(SUM(CAST(expr AS DECIMAL(18,s)) ) AS DOUBLE)`. */
  def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Exact decimal windowed sum surfaced as double. */
  def dsumOver(c: Column, scale: Int, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast(DecimalType(18, scale))).over(w).cast(DoubleType)
}
