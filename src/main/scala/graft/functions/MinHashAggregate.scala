package graft.functions

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a `TypedImperativeAggregate` — the binary-buffer
  * UDAF path (SURVEY §4 item 4: "MinHash-LSH TypedImperativeAggregate for
  * 100 TB"). One pass over exploded shingles produces all `numHashes`
  * minima; the buffer is a flat `Array[String]` serialized compactly, so
  * partial aggregation/merge happens map-side like any built-in agg —
  * versus the `numHashes`-separate-`min(...)` DataFrame formulation, which
  * carries independent agg buffers per hash.
  *
  * Hash contract: identical to the portable oracle and to
  * `Dedup.minhashSignatures` — TWO seeded lowercase-hex digests per row
  * (`md5(s) || md5("1|" + s)`, 64 hex chars), hash i = hex chars
  * [8i, 8i+8), minima by lexicographic hex order (fixed-width lowercase
  * hex ⇒ lexicographic == numeric; DuckDB replays it as
  * `min(substr(md5(s) || md5('1|' || s), 8*i+1, 8))`). 32-bit slices —
  * one digest's 16-bit slices degenerate on 65k-shingle docs (min of n
  * uniform 16-bit draws → 0).
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int = 8,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[String]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string shingle column, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): Array[String] = Array.fill(numHashes)(null)

  require(numHashes <= 8, s"two md5s yield 64 hex chars = 8 slices of 8; got $numHashes")

  override def update(buf: Array[String], input: InternalRow): Array[String] = {
    val v = child.eval(input)
    if (v == null) return buf
    val md = MinHashAgg.localMd5.get()
    val bytes = v.asInstanceOf[UTF8String].getBytes
    md.reset()
    val h1 = hexOf(md.digest(bytes))
    md.reset()
    md.update(MinHashAgg.Seed1)
    val hex = h1 + hexOf(md.digest(bytes))
    var i = 0
    while (i < numHashes) {
      val slice = hex.substring(8 * i, 8 * i + 8)
      if (buf(i) == null || slice.compareTo(buf(i)) < 0) buf(i) = slice
      i += 1
    }
    buf
  }

  override def merge(b1: Array[String], b2: Array[String]): Array[String] = {
    var i = 0
    while (i < numHashes) {
      if (b1(i) == null || (b2(i) != null && b2(i).compareTo(b1(i)) < 0)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[String]): Any =
    if (buf(0) == null) null
    else new GenericArrayData(buf.map(UTF8String.fromString(_): Any))

  override def serialize(buf: Array[String]): Array[Byte] = {
    val joined = buf.map(s => if (s == null) "" else s).mkString(",")
    joined.getBytes(StandardCharsets.UTF_8)
  }

  override def deserialize(bytes: Array[Byte]): Array[String] =
    new String(bytes, StandardCharsets.UTF_8)
      .split(",", -1).map(s => if (s.isEmpty) null else s)

  private def hexOf(b: Array[Byte]): String = {
    val digits = MinHashAgg.HexDigits
    val out = new Array[Char](b.length * 2)
    var i = 0
    while (i < b.length) {
      val x = b(i) & 0xff
      out(i * 2) = digits(x >>> 4)
      out(i * 2 + 1) = digits(x & 0xf)
      i += 1
    }
    new String(out)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

object MinHashAgg {
  private[functions] val HexDigits = "0123456789abcdef".toCharArray
  // second-digest seed prefix, matching md5('1|' || s) in the oracle
  private[functions] val Seed1 = "1|".getBytes(StandardCharsets.UTF_8)
  // MessageDigest is stateful and not thread-safe; one per task thread
  // (getInstance per row measured ~5x the whole aggregation's cost).
  private[functions] val localMd5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Aggregate Column: array of `numHashes` minhash hex strings. The
    * session-aware Column→Expression conversion is required — the lazy
    * wrapper would embed a non-serializable ColumnNodeExpression. */
  def minhash(spark: SparkSession, shingle: Column, numHashes: Int = 8): Column =
    ColumnBridge.column(
      MinHashAgg(ColumnBridge.expression(spark, shingle), numHashes)
        .toAggregateExpression())
}
