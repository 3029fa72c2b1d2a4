package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** The validator's scoring fold (SURVEY R7→R8→R9), generalized:
  *
  *  - R7 correctness predicate: `resp == expected` → 1.0 / 0.0
  *    (/root/reference/neurons/validator.py:134-141, predicate :140)
  *  - R8 EMA running aggregate per key, α=0.9
  *    (/root/reference/neurons/validator.py:109-110,146)
  *  - R9 L1 normalization of the score vector
  *    (/root/reference/neurons/validator.py:151)
  *
  * All formulated as declarative column programs: the EMA uses its closed
  * form s_n = α^(n-1)·x_1 + Σ_{k≥2} (1-α)·α^(n-k)·x_k over a row_number
  * window, so Catalyst keeps the whole thing in codegen (no per-row state).
  * The streaming formulation (true incremental state) lives in
  * `graft.streaming.ValidatorLoop`.
  */
object Scoring {

  /** R7: 1.0 where `resp === expected`, else 0.0 — summed exactly in
    * decimal so the fold is deterministic cross-engine. */
  def scoreCol(resp: Column, expected: Column): Column =
    when(resp === expected, lit(1)).otherwise(lit(0)).cast(DecimalType(18, 1))

  /** R8 closed-form EMA over an ordered-per-key frame.
    * Input df needs: key, orderCols (unique per key), valueCol.
    * Output: key, n_events, ema (rounded to 6 — pow() is libm-dependent). */
  def emaClosedForm(df: DataFrame, key: String, valueCol: String,
                    alpha: Double, orderCols: Column*): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(orderCols: _*)
    val wAll = Window.partitionBy(col(key))
    df.select(col(key), col(valueCol).as("x"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(wAll).as("n"))
      .groupBy(col(key))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(
          when(col("rn") === 1, pow(lit(alpha), col("n") - 1) * col("x"))
            .otherwise(lit(1 - alpha) * pow(lit(alpha), col("n") - col("rn")) * col("x"))), 6)
          .as("ema"))
  }

  /** R8 closed-form EMA with an explicit initial state s₀ — the
    * reference-exact variant: the validator seeds every score slot with
    * 1.0 before folding (/root/reference/neurons/validator.py:110,
    * `torch.ones_like`), so s_n = α^n·s₀ + Σ_{k=1..n} (1-α)·α^(n-k)·x_k.
    * `emaClosedForm` (s₁ = x₁) remains the unseeded variant. */
  def emaClosedFormSeeded(df: DataFrame, key: String, valueCol: String,
                          alpha: Double, init: Double, orderCols: Column*): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(orderCols: _*)
    val wAll = Window.partitionBy(col(key))
    df.select(col(key), col(valueCol).as("x"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(wAll).as("n"))
      .groupBy(col(key))
      .agg(
        count(lit(1)).as("n_events"),
        round(
          sum(lit(1 - alpha) * pow(lit(alpha), col("n") - col("rn")) * col("x"))
            + pow(lit(alpha), max(col("n"))) * lit(init), 6)
          .as("ema"))
  }

  /** R9: L1-normalize a non-negative score column over the whole frame,
    * appending it as `outCol`. scoreCol must be integer-valued doubles
    * (exact), so the global sum is order-independent and the division
    * bit-deterministic.
    *
    * Shape: scalar `agg(sum)` broadcast back via a 1-row cross join — NOT
    * `sum().over(Window.partitionBy())`, which moves the whole frame to a
    * single partition (the "No Partition Defined" WindowExec collapse). */
  def withL1Weight(df: DataFrame, scoreCol: Column, outCol: String): DataFrame = {
    val total = df.agg(sum(scoreCol).as("__l1_total"))
    df.crossJoin(broadcast(total))
      .withColumn(outCol, scoreCol / col("__l1_total"))
      .drop("__l1_total")
  }
}
