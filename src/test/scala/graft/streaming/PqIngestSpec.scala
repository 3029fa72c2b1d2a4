package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.operators.{Pq, Similarity}

/** Streaming code-store ingest: a store grown micro-batch by
  * micro-batch under frozen quantizers must hold exactly the codes a
  * full batch encode produces, serve ADC identically, and replay
  * without duplicating a row. */
class PqIngestSpec extends AnyFunSuite with SparkTest {

  private val M = 8
  private val Dim = 64
  private def emb = graft.sources.Tables.embeddings(spark, sfDir)

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("stream-grown PQ store == full encode; serving identical; replay safe") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val path = tmpDir("graft-pqingest-")
    // base generation + frozen books from 60% of the corpus
    Pq.writePqStore(emb.filter(col("vec_id") % 10 < 6), path, M, Dim,
      nCents = 8, iters = 1)
    // the remaining 40% arrives as TWO micro-batches
    val rest = emb.filter(col("vec_id") % 10 >= 6)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val (b1, b2) = rest.partition(_._1 % 10 < 8)
    val input = MemoryStream[(Long, Seq[Float])]
    val q = PqIngest.run(input.toDF().toDF("vec_id", "embedding"), path,
      M, Dim, checkpoint = tmpDir("graft-pqingest-ckpt-"))()
    try {
      input.addData(b1.toSeq: _*)
      q.processAllAvailable()
      input.addData(b2.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val books = spark.read.parquet(s"$path/books")
    def stored = spark.read.option("mergeSchema", "true")
      .parquet(s"$path/codes").select("vec_id", "sub", "cell")
      .collect().map(_.toString).sorted.toSeq
    val full = Pq.encode(emb, books, M, Dim).select("vec_id", "sub", "cell")
      .collect().map(_.toString).sorted.toSeq
    assert(stored == full,
      "stream-grown codes must equal a full encode under the frozen books")

    // serving from the stream-grown store == the recompute path
    val probeIds = Similarity.boundedProbeIds(emb, 4)
    val served = Pq.adcTopKFromStore(spark, path, emb, probeIds, k = 5, M, Dim)
      .collect().map(_.toString).sorted.toSeq
    val recompute = Pq.adcTopK(emb, books, probeIds, k = 5, M, Dim)
      .collect().map(_.toString).sorted.toSeq
    assert(served == recompute)

    // crash-before-marker replay of the LAST batch appends nothing
    new java.io.File(s"$path/codes").listFiles()
      .filter(_.getName.startsWith("_graft_batch_")).foreach(_.delete())
    PqIngest.processBatch(b2.toSeq.toDF("vec_id", "embedding"), 1L, path,
      M, Dim, ivfadc = false)
    assert(stored == full, "replay must heal, not duplicate")
  }

  test("stream-grown IVFADC store keeps frozen-quantizer encode parity") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val path = tmpDir("graft-ivfadcingest-")
    Pq.writeIvfadcStore(emb.filter(col("vec_id") % 10 < 8), path,
      nCells = 4, M, Dim, nCents = 8, iters = 1)
    val rest = emb.filter(col("vec_id") % 10 >= 8)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val input = MemoryStream[(Long, Seq[Float])]
    val q = PqIngest.run(input.toDF().toDF("vec_id", "embedding"), path,
      M, Dim, checkpoint = tmpDir("graft-ivfadcingest-ckpt-"),
      ivfadc = true)()
    try {
      input.addData(rest.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    val coarse = spark.read.parquet(s"$path/coarse")
    val books = spark.read.parquet(s"$path/books")
    val mv = Pq.microVectors(emb)
    val res = Pq.coarseResiduals(mv, coarse)
    val full = Pq.assign(
        Pq.residualSubvectors(res, M, Dim).drop("ivf_cell"), books)
      .select(col("vec_id"), col("sub"), col("cell"))
      .join(res.select("vec_id", "ivf_cell"), Seq("vec_id"))
      .select("vec_id", "ivf_cell", "sub", "cell")
      .collect().map(_.toString).sorted.toSeq
    val stored = spark.read.option("mergeSchema", "true")
      .parquet(s"$path/codes")
      .select("vec_id", "ivf_cell", "sub", "cell")
      .collect().map(_.toString).sorted.toSeq
    assert(stored == full,
      "stream-grown IVFADC codes must equal a full frozen-quantizer encode")
  }

  test("Trigger.AvailableNow drains a file backlog into the PQ store then stops") {
    import spark.implicits._
    // the batch-over-stream production cadence (the IndexIngest
    // discipline applied to the code store): a scheduled job opens the
    // stream, encodes everything that has arrived under the frozen
    // books, and exits — same checkpoint, same exactly-once contract
    val path = tmpDir("graft-pqingest-avail-")
    val stage = tmpDir("graft-pqingest-stage-")
    Pq.writePqStore(emb.filter(col("vec_id") % 10 < 6), path, M, Dim,
      nCents = 8, iters = 1)
    emb.filter(col("vec_id") % 10 >= 6)
      .select(col("vec_id"), col("embedding"))
      .repartition(2).write.mode("overwrite").parquet(stage)
    val q = spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", 1).parquet(stage)
      .writeStream
      .option("checkpointLocation", tmpDir("graft-pqingest-avail-ckpt-"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        PqIngest.processBatch(batch.toDF(), id, path, M, Dim,
          ivfadc = false); ()
      }
      .start()
    assert(q.awaitTermination(120000),
      "AvailableNow must terminate after draining the backlog")
    val books = spark.read.parquet(s"$path/books")
    val stored = spark.read.option("mergeSchema", "true")
      .parquet(s"$path/codes").select("vec_id", "sub", "cell")
      .collect().map(_.toString).sorted.toSeq
    val full = Pq.encode(emb, books, M, Dim).select("vec_id", "sub", "cell")
      .collect().map(_.toString).sorted.toSeq
    assert(stored == full,
      "the drained store must equal a full encode under the frozen books")
  }
}
