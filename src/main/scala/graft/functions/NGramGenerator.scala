package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst `Generator` (the UDTF surface, SURVEY §2.11): emits the
  * word n-grams of a token array as rows, space-joined — one fused
  * generate instead of build-k-slices → zip_with → explode. Completes the
  * Catalyst extension-type inventory next to Expression(+codegen), Rule,
  * Strategy+Exec, Aggregator, and TypedImperativeAggregate.
  *
  * Semantics match `TextFunctions.shingles(ws, n)` + `explode` exactly
  * (duplicates preserved, < n tokens ⇒ zero rows, null array ⇒ zero
  * rows), which the spec asserts. `CodegenFallback` is standard for
  * generators — `GenerateExec` itself isn't whole-stage compiled for
  * arbitrary generators; the per-row work here is pure string assembly.
  */
case class NGramGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    // nullable: a null TOKEN inside the array nulls its n-grams (the same
    // null propagation as concat() in the array formulation)
    StructType(StructField("ngram", StringType, nullable = true) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"n must be >= 1, got $n")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"ngrams requires array<string>, got ${other.simpleString}")
  }

  private val separator = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < n) Nil
    else (0 to arr.numElements() - n).iterator.map { i =>
      // assemble on the binary form — no String round-trips in the hot path
      val parts = new Array[UTF8String](n)
      var j = 0
      var anyNull = false
      while (j < n) {
        val t = arr.getUTF8String(i + j)
        if (t == null) anyNull = true else parts(j) = t
        j += 1
      }
      // concatWs SKIPS nulls; we want concat()-style null propagation
      InternalRow(if (anyNull) null else UTF8String.concatWs(separator, parts: _*))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGramGenerator =
    copy(child = newChild)
}

object NGramGenerator {
  /** Generator Column: use like `explode` — one output row per n-gram. */
  def ngrams(spark: org.apache.spark.sql.SparkSession, ws: Column, n: Int): Column =
    ColumnBridge.column(NGramGenerator(ColumnBridge.expression(spark, ws), n))
}
