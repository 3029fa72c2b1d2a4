package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** The serve-batch broadcast contract, ENFORCED (VERDICT r11 #2): the
  * store serves broadcast per-query frames (probe vectors, pair sets,
  * the term fan-out), so a batch larger than `maxBatch` distinct
  * queries is auto-chunked and the chunk answers unioned. These specs
  * drive over-threshold batches through the chunked path and pin
  * row-identity with the unchunked form — the "answers identical by
  * construction" claim, made empirical. */
class ServeChunkSpec extends AnyFunSuite with SparkTest {

  private val Dim = 8

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

  test("exact-IVF Seq serve: an over-threshold batch chunks to identical rows") {
    val vecs = vecFixture(200)
    val path = java.nio.file.Files
      .createTempDirectory("graft-chunk-exact-").toString
    ExactIvf.writeVecStore(vecs, path, nCells = 8, iters = 1)
    val queries = (0L until 9L).map(q => (q, q * 20L + 3L))
    val whole = rows(ExactIvf.topDotBatchFromStore(
      spark, path, queries, k = 10, nprobe0 = 2))
    val chunked = rows(ExactIvf.topDotBatchFromStore(
      spark, path, queries, k = 10, nprobe0 = 2, maxBatch = 3))
    assert(chunked == whole, "3-query chunks must union to the whole answer")
    // a degenerate bound (every query its own chunk) still agrees
    val single = rows(ExactIvf.topDotBatchFromStore(
      spark, path, queries, k = 10, nprobe0 = 2, maxBatch = 1))
    assert(single == whole)
    // an EMPTY batch returns an empty frame, not a reduce-on-nothing
    // crash (the pre-chunking behavior, preserved)
    assert(ExactIvf.topDotBatchFromStore(
      spark, path, Seq.empty[(Long, Long)], k = 10, nprobe0 = 2)
      .count() == 0L)
    // a query_id listed with SEVERAL probe rows must land whole in one
    // chunk — positional grouping would split it and union two
    // independent per-chunk rankings (review r12)
    val multi = Seq((1L, 3L), (2L, 43L), (1L, 83L), (3L, 123L))
    val wholeM = rows(ExactIvf.topDotBatchFromStore(
      spark, path, multi, k = 10, nprobe0 = 2))
    val chunkedM = rows(ExactIvf.topDotBatchFromStore(
      spark, path, multi, k = 10, nprobe0 = 2, maxBatch = 2))
    assert(chunkedM == wholeM,
      "a multi-probe query must not split across chunks")
  }

  test("exact-IVF DataFrame serve: hash-chunking keeps each query whole and the union identical") {
    import spark.implicits._
    val vecs = vecFixture(200)
    val path = java.nio.file.Files
      .createTempDirectory("graft-chunk-exactdf-").toString
    ExactIvf.writeVecStore(vecs, path, nCells = 8, iters = 1)
    val qdf = (0L until 7L).map(q => (q, q * 25L + 1L))
      .toDF("query_id", "probe_id")
    val whole = rows(ExactIvf.topDotBatchFromStore(
      spark, path, qdf, k = 12, nprobe0 = 2))
    val chunked = rows(ExactIvf.topDotBatchFromStore(
      spark, path, qdf, k = 12, nprobe0 = 2, maxBatch = 2))
    assert(chunked == whole)
  }

  test("IVFADC store serve: chunked probe batches (Seq and table forms) are row-identical") {
    val emb = vecFixture(160).toDF("vec_id", "embedding")
    val path = java.nio.file.Files
      .createTempDirectory("graft-chunk-ivfadc-").toString
    Pq.writeIvfadcStore(emb, path, nCells = 4, m = 2, dim = Dim,
      nCents = 8, iters = 1)
    val probeIds = Seq(3L, 41L, 77L, 99L, 120L, 151L)
    val whole = rows(Pq.ivfadcTopKFromStore(spark, path, emb, probeIds,
      nprobe = 2, kShort = 20, k = 5, m = 2, dim = Dim))
    val chunked = rows(Pq.ivfadcTopKFromStore(spark, path, emb, probeIds,
      nprobe = 2, kShort = 20, k = 5, m = 2, dim = Dim,
      vecCol = "embedding", maxBatch = 2))
    assert(chunked == whole)
    import spark.implicits._
    val probeDf = probeIds.toDF("probe_id")
    val wholeDf = rows(Pq.ivfadcTopKFromStore(spark, path, emb, probeDf,
      nprobe = 2, kShort = 20, k = 5, m = 2, dim = Dim, "embedding"))
    val chunkedDf = rows(Pq.ivfadcTopKFromStore(spark, path, emb, probeDf,
      nprobe = 2, kShort = 20, k = 5, m = 2, dim = Dim, "embedding",
      maxBatch = 2))
    assert(wholeDf == whole, "table form must equal the Seq form")
    assert(chunkedDf == whole)
  }

  test("store-served hybrid RRF: chunked query batches are row-identical (both forms)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark shuffles partition data across executors"),
      (2L, "parquet row group statistics prune column scans"),
      (3L, "watermarks bound state in streaming aggregations"),
      (4L, "broadcast joins avoid shuffling the large side"),
      (5L, "adaptive execution replans skewed shuffle joins"),
      (6L, "columnar scans batch rows for whole stage codegen")
    ).toDF("doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft-chunk-hybrid-").toString
    val idx = s"$root/idx"; val vec = s"$root/vec"
    Retrieval.writeIndexStore(docs, idx)
    ExactIvf.writeVecStore(
      graft.operators.TextAnalysis.hashedEmbedding(docs)
        .select(col("doc_id"), col("vec")),
      vec, nCells = 2, iters = 1)
    val queries = Seq(
      (1L, Seq("spark", "shuffle"), 1L),
      (2L, Seq("parquet", "scans"), 2L),
      (3L, Seq("streaming", "state"), 3L),
      (4L, Seq("joins", "broadcast"), 4L),
      (5L, Seq("codegen", "rows"), 6L))
    val whole = rows(Retrieval.hybridRrfBatchFromStores(
      spark, idx, vec, queries, kList = 5, kOut = 4))
    val chunked = rows(Retrieval.hybridRrfBatchFromStores(
      spark, idx, vec, queries, kList = 5, kOut = 4,
      k1 = 1.2, b = 0.75, nprobe0 = 4, maxBatch = 2))
    assert(chunked == whole)
    val qdf = queries.toDF("query_id", "terms", "probe_id")
    val wholeDf = rows(Retrieval.hybridRrfBatchFromStores(
      spark, idx, vec, qdf, 5, 4, 1.2, 0.75, 4))
    val chunkedDf = rows(Retrieval.hybridRrfBatchFromStores(
      spark, idx, vec, qdf, 5, 4, 1.2, 0.75, 4, maxBatch = 2))
    assert(wholeDf == whole, "table form must equal the Seq form")
    assert(chunkedDf == whole)
  }
}
