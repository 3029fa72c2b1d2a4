package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** R14 law: split∘scatter∘dedup∘reassemble ≡ identity, for arbitrary
  * payloads, chunk counts, and redundancy (SURVEY §5.2 property tests). */
class ChunkOpsSpec extends AnyFunSuite with SparkTest {
  import scala.jdk.CollectionConverters._

  private def docsOf(texts: Seq[String]) = {
    val rows = texts.zipWithIndex.map { case (t, i) =>
      org.apache.spark.sql.Row(i.toLong, t)
    }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
  }

  test("round trip is the identity for assorted payloads / k / r") {
    val texts = Seq("", "a", "abc", "hello world " * 40, "μλti-byte ünïcode ᚠ" * 7)
    for (k <- Seq(1, 3, 8); r <- Seq(1, 3)) {
      val rt = ChunkOps.roundTrip(docsOf(texts), "doc_id", "text", k, r, nDest = 8)
      val joined = docsOf(texts).join(rt, "doc_id")
        .select(col("doc_id"), (col("text") === col("reassembled")).as("ok"))
        .collect()
      assert(joined.length == texts.length, s"k=$k r=$r lost docs")
      assert(joined.forall(_.getBoolean(1)), s"k=$k r=$r corrupted payloads")
    }
  }

  test("round trip identity holds for seeded random strings (property)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val texts = Seq.fill(6)(rnd.alphanumeric.take(rnd.nextInt(200)).mkString)
      val rt = ChunkOps.roundTrip(docsOf(texts), "doc_id", "text", k = 4, r = 2, nDest = 4)
      val bad = docsOf(texts).join(rt, "doc_id")
        .filter(col("text") =!= col("reassembled")).count()
      assert(bad == 0)
    }
  }

  test("replica dedup picks a deterministic winner") {
    // Corrupt one replica: the winner must be min(payload), stably —
    // determinism (not majority vote) is the contract (SURVEY §7.5).
    val chunks = ChunkOps.split(docsOf(Seq("abcdefgh")), "doc_id", "text", 4)
    val scattered = ChunkOps.scatter(chunks, "doc_id", r = 3, nDest = 4)
      .withColumn("payload",
        when(col("replica") === 2 && col("chunk_id") === 1, lit("ZZ"))
          .otherwise(col("payload")))
    val deduped = ChunkOps.dedupReplicas(scattered, "doc_id")
      .orderBy("chunk_id").collect()
    // ASCII 'Z' < 'c', so min() deterministically picks the corrupted
    // replica for chunk 1 — stable winner, whatever the shuffle order.
    assert(deduped.map(_.getString(2)).toSeq == Seq("ab", "ZZ", "ef", "gh"))
  }
}
