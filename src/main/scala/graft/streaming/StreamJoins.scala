package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Native stream–stream joins (SURVEY §2.10): unlike [[AsOfStream]]'s
  * keyed-state latest-prior matching, these emit EVERY pair inside the
  * time window, using Spark's built-in stream-stream join machinery —
  * watermarks on both sides bound the buffered state, and the time-range
  * condition tells the state store when a buffered row can never match
  * again and is safe to evict (the cross-side retention bound each input
  * derives from the other's watermark).
  *
  * At 100 TB-scale streams this is the shape to prefer whenever the
  * full pair set (not just the latest match) is wanted: state per key is
  * O(rows inside the watermark+window horizon), enforced by the engine
  * rather than by operator code.
  */
object StreamJoins {

  /** All (left, right) pairs with equal `key` where the right event
    * happened within `[windowUs, 0)` BEFORE the left event (strictly
    * prior, y14's convention). Both inputs MUST carry a watermark on
    * `ts`; output is append-mode (pairs are final once both watermarks
    * pass). Columns: left untouched; right's are suffixed `_r`. */
  def priorWindowJoin(left: DataFrame, right: DataFrame, key: String,
                      windowUs: Long): DataFrame = {
    val r = right.toDF(right.columns.map(_ + "_r"): _*)
    // the range condition stays on the RAW event-time columns — that is
    // what lets the engine derive each side's state retention horizon
    // from the other side's watermark (wrapping them in unix_micros
    // would defeat the watermark analysis)
    left.join(r,
      col(key) === col(s"${key}_r") &&
        col("ts_r") >= col("ts") - expr(s"INTERVAL $windowUs MICROSECOND") &&
        col("ts_r") < col("ts"))
  }
}
