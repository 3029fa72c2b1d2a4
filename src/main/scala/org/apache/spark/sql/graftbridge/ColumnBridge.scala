package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column↔Expression converters, for
  * exposing native Catalyst expressions (e.g. graft's CosineSimilarity) as
  * user-facing Columns. Lives under org.apache.spark.sql.* solely to
  * satisfy the access scope — no Spark internals are modified. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Full ColumnNode→Expression conversion via the session's converter —
    * unlike the lazy `expression(Column)` wrapper, the result contains no
    * non-serializable ColumnNodeExpression nodes and can be embedded in a
    * hand-built LogicalPlan. */
  def expression(spark: org.apache.spark.sql.SparkSession, c: Column): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].expression(c)

  /** Spark's floating-point canonicalizer (NaN bit patterns → the
    * canonical NaN, -0.0 → 0.0) for GROUPING-key expressions — the same
    * normalization the optimizer applies to Aggregate/Window/Join keys,
    * which hand-built plan nodes must request themselves. Identity for
    * types that need no normalization (the needs-check mirrors the
    * optimizer's own, whose method is not public). */
  def normalizeFloatingNumbers(e: Expression): Expression =
    if (containsFloat(e.dataType))
      org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)
    else e

  private def containsFloat(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case FloatType | DoubleType => true
      case StructType(fields) => fields.exists(f => containsFloat(f.dataType))
      case ArrayType(et, _) => containsFloat(et)
      case _ => false
    }
  }

  /** DataFrame from a hand-built logical plan (private[sql] in Spark). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
