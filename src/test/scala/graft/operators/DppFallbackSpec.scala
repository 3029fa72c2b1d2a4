package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** ADVICE r12 (medium): the serve tier's cell pruning rides on Spark
  * inserting a dynamic-partition-pruning subquery — an OPTIMIZER
  * service a session can switch off (`spark.sql.optimizer
  * .dynamicPartitionPruning.enabled=false`) and an upgrade can
  * re-gate. Before this fix that session silently degraded every
  * store serve to a FULL cell scan; now the serve checks the conf and
  * falls back to the pre-r12 bounded literal cell-id list. These
  * specs pin both halves of that contract: answers identical with the
  * conf off, and the fallback plan still pruned (a literal ivf_cell
  * membership predicate on the store scan, no DPP subquery). */
class DppFallbackSpec extends AnyFunSuite with SparkTest {

  private val Dim = 8
  private val DppConf = "spark.sql.optimizer.dynamicPartitionPruning.enabled"

  private def vecFixture(n: Int) = {
    import spark.implicits._
    (0L until n).map { i =>
      val v = (0 until Dim).map { j =>
        ((i * 31 + j * 17) % 201) - 100L
      }.toArray
      (i, v)
    }.toDF("doc_id", "vec")
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def withDppOff[A](body: => A): A = {
    spark.conf.set(DppConf, "false")
    try body finally spark.conf.set(DppConf, "true")
  }

  test("exact-IVF serve with DPP disabled: identical rows via the literal cell-list fallback") {
    val vecs = vecFixture(200)
    val path = java.nio.file.Files
      .createTempDirectory("graft-dppoff-exact-").toString
    ExactIvf.writeVecStore(vecs, path, nCells = 8, iters = 1)
    val queries = (0L until 4L).map(q => (q, q * 20L + 3L))
    val on = rows(ExactIvf.topDotBatchFromStore(
      spark, path, queries, k = 10, nprobe0 = 2))
    withDppOff {
      val df = ExactIvf.topDotBatchFromStore(
        spark, path, queries, k = 10, nprobe0 = 2)
      assert(rows(df) == on,
        "the fallback serve must answer row-identically to the DPP serve")
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("dynamicpruningexpression"),
        s"no DPP subquery may plan with the optimizer rule off:\n$p")
      assert("PartitionFilters: \\[[^\\]]*(ivf_cell|cell_bucket)".r.findFirstIn(p).isDefined,
        s"the fallback must still prune cell partitions (literal list):\n$p")
    }
  }

  test("IVFADC serve with DPP disabled: identical rows, codes scan still cell-pruned") {
    val emb = vecFixture(160).toDF("vec_id", "embedding")
    val path = java.nio.file.Files
      .createTempDirectory("graft-dppoff-ivfadc-").toString
    Pq.writeIvfadcStore(emb, path, nCells = 4, m = 2, dim = Dim,
      nCents = 8, iters = 1)
    val probes = Seq(3L, 43L, 83L)
    val on = rows(Pq.ivfadcTopKFromStore(spark, path, emb, probes,
      nprobe = 2, kShort = 20, k = 5, m = 2, dim = Dim))
    withDppOff {
      val df = Pq.ivfadcTopKFromStore(spark, path, emb, probes,
        nprobe = 2, kShort = 20, k = 5, m = 2, dim = Dim)
      assert(rows(df) == on,
        "the fallback serve must answer row-identically to the DPP serve")
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("dynamicpruningexpression"),
        s"no DPP subquery may plan with the optimizer rule off:\n$p")
      assert("PartitionFilters: \\[[^\\]]*(ivf_cell|cell_bucket)".r.findFirstIn(p).isDefined,
        s"the fallback must still prune cell partitions (literal list):\n$p")
    }
  }

  test("hybrid store serve with DPP disabled stays row-identical (the y55 shape)") {
    import spark.implicits._
    val docs = (0L until 60L).map { i =>
      (i, s"term${i % 7} shared words document number $i about " +
        s"topic${i % 3} and filler content ${i % 11}")
    }.toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dppoff-hybrid-").toString
    Retrieval.writeIndexStore(docs, s"$dir/idx")
    ExactIvf.writeVecStore(
      graft.operators.TextAnalysis.hashedEmbedding(docs)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("vec")),
      s"$dir/vec", nCells = 4, iters = 1)
    val queries = Seq((1L, Seq("term1", "topic2"), 8L),
      (2L, Seq("term3"), 21L))
    val on = rows(Retrieval.hybridRrfBatchFromStores(
      spark, s"$dir/idx", s"$dir/vec", queries, kList = 10, kOut = 5))
    withDppOff {
      assert(rows(Retrieval.hybridRrfBatchFromStores(
        spark, s"$dir/idx", s"$dir/vec", queries,
        kList = 10, kOut = 5)) == on)
    }
  }
}
