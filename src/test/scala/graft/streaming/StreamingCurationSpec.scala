package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.operators.{Curation, TextAnalysis}

/** The quality gate as an ingest-time STREAM filter: `c4PageGate` is a
  * stateless per-row column program, so the exact expression graded in
  * batch (x64 semantics) drops bad pages in an append-mode stream with
  * no state store and no watermark — the shape a 100 TB ingest filter
  * ships in. */
class StreamingCurationSpec extends AnyFunSuite with SparkTest {

  private val good =
    (1 to 4).map(i => s"this is a perfectly fine sentence number $i.").mkString("\n")
  private val marked =
    "lorem ipsum dolor sit amet consectetur adipiscing elit.\n" + good
  private val junk = "no punctuation lines here at all\nshort one.\nugh"

  test("the stateless page gate runs unchanged on an append-mode stream") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .filter(Curation.c4PageGate(col("text")))
      .writeStream.format("memory").queryName("curation_gate")
      .outputMode("append").start()
    try {
      input.addData((1L, good), (2L, marked), (3L, junk))
      q.processAllAvailable()
      assert(spark.sql("select doc_id from curation_gate")
        .as[Long].collect().toSet == Set(1L))
      // later batches keep flowing through the same stateless gate
      input.addData((4L, good), (5L, junk))
      q.processAllAvailable()
      assert(spark.sql("select doc_id from curation_gate")
        .as[Long].collect().toSet == Set(1L, 4L))
    } finally q.stop()
  }

  test("the hashed classifier gates an append-mode stream statelessly") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // batch verdicts over the corpus fixture are the ground truth; the
    // same Column must admit exactly the batch-kept docs from a stream
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().take(60)
    val expect = TextAnalysis.hashedClassifier(docs.toSeq.toDF("doc_id", "text"))
      .filter(col("kept")).select("doc_id").as[Long].collect().toSet
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .filter(TextAnalysis.classifierGate(col("text")))
      .writeStream.format("memory").queryName("classifier_gate")
      .outputMode("append").start()
    try {
      input.addData(docs.take(30).toSeq)
      q.processAllAvailable()
      input.addData(docs.drop(30).toSeq)
      q.processAllAvailable()
      assert(spark.sql("select doc_id from classifier_gate")
        .as[Long].collect().toSet == expect)
      assert(expect.nonEmpty && expect.size < docs.length,
        "stream fixture should drop some docs and keep some")
    } finally q.stop()
  }

  test("a frozen DSIR λ table gates an append-mode stream statelessly") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // train λ on a batch bootstrap corpus, freeze it into the dense
    // 4096-slot array, then gate a stream: kept docs must be exactly
    // those whose batch mean importance clears the threshold
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang")
      .collect().take(60).map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val bootstrap = docs.toSeq.toDF("doc_id", "text", "lang")
    val lamArr = {
      val m = Curation.dsirLambda(bootstrap, isTarget = col("lang") === "en")
        .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
      (0 until Curation.DsirBuckets).map(b => m.getOrElse(b, 0L))
    }
    val batch = Curation.dsirSelect(bootstrap, isTarget = col("lang") === "en")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("imp_mu").toDouble / 1e6 / r.getAs[Long]("n_feats")))
    // deployment picks the threshold from the TRAINING batch (a stream
    // has no corpus percentile): the batch median splits the fixture
    val tau = batch.map(_._2).sorted.apply(batch.length / 2)
    val expect = batch.filter(_._2 >= tau).map(_._1).toSet
    graft.core.Caches.releaseAll()
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .filter(Curation.dsirGate(col("text"), lamArr, tau))
      .writeStream.format("memory").queryName("dsir_gate")
      .outputMode("append").start()
    try {
      input.addData(docs.take(30).map(d => (d._1, d._2)).toSeq)
      q.processAllAvailable()
      input.addData(docs.drop(30).map(d => (d._1, d._2)).toSeq)
      q.processAllAvailable()
      assert(spark.sql("select doc_id from dsir_gate")
        .as[Long].collect().toSet == expect)
      assert(expect.nonEmpty && expect.size < docs.length,
        "the λ gate should split the fixture")
    } finally q.stop()
  }
}
