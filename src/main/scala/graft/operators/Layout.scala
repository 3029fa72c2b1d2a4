package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-LAYOUT operators — the lever that decides how much of 100 TB
  * a query ever reads. Partitioned layouts prune on one column and
  * bucketed layouts co-locate one join key; Z-ORDER clustering is the
  * multi-column generalization: interleave the bits of per-column range
  * buckets so that rows close in EITHER dimension land close in the sort
  * order, giving every file tight min/max ranges on BOTH columns — the
  * property parquet row-group skipping and file pruning feed on. A
  * z-ordered write is then just `repartitionByRange(zkey).sortWithinPartitions
  * (zkey).write` — the key computation below is the whole trick.
  *
  * Everything is integer-exact: per-column buckets come from one
  * IEEE division of BIGINT-exact differences against the 1-row
  * broadcast min/max (the L1-normalize pattern — no collect), and the
  * bit interleave is shift/mask arithmetic. */
object Layout {

  /** Input columns + b1, b2 (range buckets of `c1`, `c2`) + zkey (their
    * bit interleave, `bits` bits per dimension — even bits from c1, odd
    * from c2). Degenerate columns (min = max) bucket to 0. */
  def zorderKey(df: DataFrame, c1: String, c2: String, bits: Int = 8): DataFrame = {
    val nb = (1L << bits).toDouble
    val mm = df.agg(
      min(col(c1)).as("__mn1"), max(col(c1)).as("__mx1"),
      min(col(c2)).as("__mn2"), max(col(c2)).as("__mx2"))
    def bucket(c: String, mn: String, mx: String): Column =
      floor((col(c) - col(mn)).cast("double") * nb
        / (col(mx) - col(mn) + 1L)).cast("long")
    val withB = df.crossJoin(broadcast(mm))
      .withColumn("b1", bucket(c1, "__mn1", "__mx1"))
      .withColumn("b2", bucket(c2, "__mn2", "__mx2"))
    val z = (0 until bits).map { j =>
      shiftleft(shiftright(col("b1"), j).bitwiseAND(lit(1L)), 2 * j) +
        shiftleft(shiftright(col("b2"), j).bitwiseAND(lit(1L)), 2 * j + 1)
    }.reduce(_ + _)
    withB.withColumn("zkey", z)
      .drop("__mn1", "__mx1", "__mn2", "__mx2")
  }

  /** Per-ZONE layout statistics — the pruning evidence: zones are
    * contiguous zkey ranges (the files a z-ordered write would produce),
    * and each zone's min/max on BOTH source columns shows the bounded
    * rectangle a scan planner would skip by. One aggregate over zone
    * cardinality. Output: zone, n_rows, c1_min, c1_max, c2_min, c2_max. */
  def zorderZoneStats(df: DataFrame, c1: String, c2: String,
                      bits: Int = 8, zoneShift: Int = 8): DataFrame =
    zorderKey(df, c1, c2, bits)
      .groupBy(shiftright(col("zkey"), zoneShift).as("zone"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(c1)).as("c1_min"), max(col(c1)).as("c1_max"),
        min(col(c2)).as("c2_min"), max(col(c2)).as("c2_max"))
}
