package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

class VectorFunctionsSpec extends AnyFunSuite with SparkTest {

  private def vecsDf = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until 50).map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("id", "v")
  }

  test("native codegen'd cosine ≡ HOF formulation") {
    val a = vecsDf.toDF("ida", "va")
    val b = vecsDf.toDF("idb", "vb")
    val both = a.crossJoin(b).select(
      VectorFunctions.cosineSim(col("va"), col("vb")).as("native"),
      VectorFunctions.cosineSimHof(col("va"), col("vb")).as("hof"))
    val diffs = both.select(max(abs(col("native") - col("hof")))).first().getDouble(0)
    assert(diffs == 0.0, s"native vs HOF drift: $diffs") // same left fold → bit-identical
  }

  test("cosine of identical vectors is 1, zero vector yields 0, nulls propagate") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
      (Array(0f, 0f, 0f), Array(1f, 2f, 3f))).toDF("a", "b")
    val r = df.select(VectorFunctions.cosineSim(col("a"), col("b"))).collect()
    assert(math.abs(r(0).getDouble(0) - 1.0) < 1e-12)
    assert(r(1).getDouble(0) == 0.0)
    val n = df.select(VectorFunctions.cosineSim(lit(null).cast("array<float>"), col("b")))
      .collect()
    assert(n.forall(_.isNullAt(0)))
  }

  test("graft_cosine is registered in SQL via SparkSessionExtensions") {
    val r = spark.sql(
      "SELECT graft_cosine(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)), " +
        "array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)))").first().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  private def longVecsDf = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (0 until 40).map(i =>
      (i.toLong, Array.fill(16)((rnd.nextInt(4001) - 2000).toLong)))
      .toDF("id", "v")
  }

  test("native codegen'd integer dot ≡ HOF formulation, exactly") {
    val a = longVecsDf.toDF("ida", "va")
    val b = longVecsDf.toDF("idb", "vb")
    val both = a.crossJoin(b).select(
      VectorFunctions.dotLong(col("va"), col("vb")).as("native"),
      VectorFunctions.dotLongHof(col("va"), col("vb")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.filter(col("native").isNull).count() == 0)
  }

  test("integer dot: null array, null element and length mismatch all yield null") {
    import spark.implicits._
    val df = Seq(
      (Array[java.lang.Long](1L, 2L), Array[java.lang.Long](3L, 4L)),
      (Array[java.lang.Long](1L, null), Array[java.lang.Long](3L, 4L))
    ).toDF("a", "b")
    val r = df.select(VectorFunctions.dotLong(col("a"), col("b")).as("d")).collect()
    assert(r(0).getLong(0) == 11L)
    assert(r(1).isNullAt(0)) // null element — the HOF acc+null collapse
    val n = df.select(VectorFunctions.dotLong(lit(null).cast("array<bigint>"), col("b")))
      .collect()
    assert(n.forall(_.isNullAt(0)))
    // length mismatch → null (the HOF's zip_with null padding collapse)
    val m = spark.sql("SELECT graft_dot_long(array(1L, 2L, 3L), array(1L, 2L))")
      .collect()
    assert(m.forall(_.isNullAt(0)))
  }

  test("graft_dot_long is registered in SQL via SparkSessionExtensions") {
    val r = spark.sql("SELECT graft_dot_long(array(2L, 3L), array(5L, 7L))")
      .first().getLong(0)
    assert(r == 31L)
  }

  test("native lsh bucket ≡ HOF formulation (fixed and masked bit counts)") {
    // float vectors, every nbits in 0..maxBits, including the runtime form
    val maxBits = 12
    val base = vecsDf
    for (nb <- Seq(0, 1, 4, 7, 12)) {
      val both = base.select(
        VectorFunctions.lshBucket(col("v"), maxBits, 16).as("nat_fixed"),
        VectorFunctions.lshBucketHof(col("v"), maxBits, 16).as("hof_fixed"),
        VectorFunctions.lshBucketMasked(col("v"), lit(nb), maxBits, 16).as("nat"),
        VectorFunctions.lshBucketMaskedHof(col("v"), lit(nb), maxBits, 16).as("hof"))
      assert(both.filter(col("nat") =!= col("hof")
        || col("nat_fixed") =!= col("hof_fixed")).count() == 0, s"nbits=$nb")
    }
    // double-element vectors (the quantized paths)
    val dbl = vecsDf.select(col("id"),
      org.apache.spark.sql.functions.transform(col("v"),
        x => x.cast("double")).as("v"))
    val bothD = dbl.select(
      VectorFunctions.lshBucketMasked(col("v"), lit(9), maxBits, 16).as("nat"),
      VectorFunctions.lshBucketMaskedHof(col("v"), lit(9), maxBits, 16).as("hof"))
    assert(bothD.filter(col("nat") =!= col("hof")).count() == 0)
    // length-mismatch and null-element collapse to bucket 0, like the HOF
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}
    val odd = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(Seq[Any](1f, 2f)),
        Row(Seq[Any](1f, null, 3f, 4f, 1f, 2f, 3f, 4f,
          1f, 2f, 3f, 4f, 1f, 2f, 3f, 4f))),
      StructType(Seq(StructField("v", ArrayType(FloatType, true)))))
    val r = odd.select(
      VectorFunctions.lshBucketMasked(col("v"), lit(9), maxBits, 16).as("nat"),
      VectorFunctions.lshBucketMaskedHof(col("v"), lit(9), maxBits, 16).as("hof"))
      .collect()
    assert(r.forall(row => row.getInt(0) == 0 && row.getInt(0) == row.getInt(1)))
  }

  test("native hadamard rotate ≡ HOF formulation, exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val mv = (0 until 30).map(i =>
      (i.toLong, Array.fill(16)((rnd.nextInt(4000001) - 2000000).toLong)))
      .toDF("id", "vm")
    val both = mv.select(
      graft.operators.Pq.hadamardRotate(col("vm"), 16).as("nat"),
      graft.operators.Pq.hadamardRotateHof(col("vm"), 16).as("hof"))
    assert(both.filter(col("nat") =!= col("hof")).count() == 0)
    // null element: every component nulls out in both forms (acc + null)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}
    val withNull = spark.createDataFrame(
      java.util.Arrays.asList(Row(Seq[Any](1L, null, 3L, 4L, 5L, 6L, 7L, 8L,
        9L, 10L, 11L, 12L, 13L, 14L, 15L, 16L))),
      StructType(Seq(StructField("vm", ArrayType(LongType, true)))))
    val r = withNull.select(
      graft.operators.Pq.hadamardRotate(col("vm"), 16).as("nat"),
      graft.operators.Pq.hadamardRotateHof(col("vm"), 16).as("hof")).first()
    assert(r.getSeq[Any](0) == r.getSeq[Any](1))
    assert(r.getSeq[Any](0).forall(_ == null))
  }

  test("lsh bucket ids are stable and within range") {
    val b = vecsDf.select(VectorFunctions.lshBucket(col("v"), nBits = 4, dim = 16).as("bucket"))
      .collect().map(_.getInt(0))
    assert(b.forall(x => x >= 0 && x < 16))
    val b2 = vecsDf.select(VectorFunctions.lshBucket(col("v"), nBits = 4, dim = 16).as("bucket"))
      .collect().map(_.getInt(0))
    assert(b.toSeq == b2.toSeq)
  }
}
