package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.operators.Retrieval

/** Streaming index ingest: the store a stream builds must answer BM25
  * and phrase queries exactly like the batch-built store over the same
  * corpus, and the append-before-marker crash window must be
  * replay-idempotent per table. */
class IndexIngestSpec extends AnyFunSuite with SparkTest {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Resolve a (possibly generational) store sub-dir to its live data
    * directory — raw-path reads after a compaction see the previous
    * generation kept for in-flight readers' grace. */
  private def live(dir: String): String = StoreFs.dataDir(spark, dir)

  private val b0 = Seq(
    0L -> "fast table scan on the big table",
    1L -> "spark window functions over a stream",
    2L -> "fast table part value merge")
  private val b1 = Seq(
    10L -> "the table part arrived fast",
    11L -> "window spark window batch")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("stream-built store answers BM25 + phrase exactly like the batch paths") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val store = tmpDir("graft-idxingest-")
    val input = MemoryStream[(Long, String)]
    val q = IndexIngest.run(input.toDF().toDF("doc_id", "text"), store,
      checkpoint = tmpDir("graft-idxingest-ckpt-"))()
    try {
      input.addData(b0: _*)
      q.processAllAvailable()
      input.addData(b1: _*)
      q.processAllAvailable()
    } finally q.stop()
    val all = (b0 ++ b1).toDF("doc_id", "text")
    val terms = Seq("table", "spark", "fast")
    assert(rows(Retrieval.bm25TopKFromStore(spark, store, terms, k = 5)) ==
      rows(Retrieval.bm25TopK(all, terms, k = 5)))
    val phrases = Seq(Seq("fast", "table"), Seq("table", "part"))
    assert(rows(Retrieval.phraseSearchFromStore(spark, store, phrases, k = 5)) ==
      rows(Retrieval.phraseSearch(all, phrases, k = 5)))
  }

  test("compaction preserves answers and survives further stream appends") {
    import spark.implicits._
    val store = tmpDir("graft-idxingest-compact-")
    IndexIngest.processBatch(b0.toDF("doc_id", "text"), 0L, store)
    IndexIngest.processBatch(b1.take(1).toDF("doc_id", "text"), 1L, store)
    val terms = Seq("table", "fast", "spark")
    val phrases = Seq(Seq("fast", "table"))
    val before = (rows(Retrieval.bm25TopKFromStore(spark, store, terms, 5)),
      rows(Retrieval.phraseSearchFromStore(spark, store, phrases, 5)))
    Retrieval.compactIndexStore(spark, store)
    val after = (rows(Retrieval.bm25TopKFromStore(spark, store, terms, 5)),
      rows(Retrieval.phraseSearchFromStore(spark, store, phrases, 5)))
    assert(before == after, "compaction must not change a single answer")
    // batch tags collapse to the −1 sentinel GENERATION, kept as a
    // literal column so the store schema stays uniform under later
    // tagged appends (the ADVICE-r8 mixed-schema window)
    val compacted = spark.read.parquet(live(s"$store/postings"))
    assert(compacted.columns.contains("batch_id"))
    assert(compacted.select("batch_id").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(-1L))
    // the stream keeps appending onto the compacted generation
    IndexIngest.processBatch(b1.drop(1).toDF("doc_id", "text"), 2L, store)
    val all = (b0 ++ b1).toDF("doc_id", "text")
    assert(rows(Retrieval.bm25TopKFromStore(spark, store, terms, 5)) ==
      rows(Retrieval.bm25TopK(all, terms, 5)))
  }

  test("crash-before-marker replay AFTER a compaction appends nothing") {
    import spark.implicits._
    val store = tmpDir("graft-idxingest-compact-replay-")
    IndexIngest.processBatch(b0.toDF("doc_id", "text"), 0L, store)
    Retrieval.compactIndexStore(spark, store)
    // append a post-compaction batch, then simulate the crash window:
    // rows landed but the marker did not
    IndexIngest.processBatch(b1.toDF("doc_id", "text"), 1L, store)
    def counts = Seq("doclen", "postings", "positions")
      .map(s => spark.read.parquet(live(s"$store/$s")).count())
    val landed = counts
    // markers live at the (flat) store root — the generational sub-dirs
    // carry only data; IndexIngest's marker root is the store itself
    new java.io.File(store).listFiles()
      .filter(_.getName.startsWith("_graft_batch_")).foreach(_.delete())
    IndexIngest.processBatch(b1.toDF("doc_id", "text"), 1L, store)
    assert(counts == landed,
      "replay over a compacted+appended store must not duplicate rows")
  }

  test("replay onto a batch-built (tagless) store appends nothing") {
    import spark.implicits._
    // the pre-fix failure mode: a tagless generation mixed with tagged
    // appends could hide the batch_id column from a non-merged schema
    // pick, turning the replay anti-join into a no-op match
    val store = tmpDir("graft-idxingest-takeover-")
    Retrieval.writeIndexStore(b0.toDF("doc_id", "text"), store)
    Retrieval.writePositionalStore(b0.toDF("doc_id", "text"), store)
    IndexIngest.processBatch(b1.toDF("doc_id", "text"), 1L, store)
    def counts = Seq("doclen", "postings", "positions")
      .map(s => spark.read.parquet(s"$store/$s").count())
    val landed = counts
    new java.io.File(store).listFiles()
      .filter(_.getName.startsWith("_graft_batch_")).foreach(_.delete())
    IndexIngest.processBatch(b1.toDF("doc_id", "text"), 1L, store)
    assert(counts == landed,
      "replay onto a mixed tagless+tagged store must not duplicate rows")
  }

  test("TORN multi-table append: compaction seals only fully-landed ids; replay heals the unlanded tables") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    // ADVICE r10 (medium): batch 1 crashes after doclen landed but
    // before postings/positions. A seal computed from doclen's tags
    // alone would cover batch 1, the replay would short-circuit, and
    // the batch's postings/positions rows would be lost forever
    // (silently wrong BM25/phrase answers). The multi-table seal stops
    // at min-across-subs and compaction preserves the frontier's tags,
    // so the replay's per-table anti-join heals each table.
    val store = tmpDir("graft-idxingest-torn-")
    IndexIngest.processBatch(b0.toDF("doc_id", "text"), 0L, store)
    // simulate the torn batch-1 append: ONLY doclen lands (the exact
    // rows IndexIngest would write), no marker
    val p = b1.toDF("doc_id", "text")
      .select(col("doc_id"), words(normText(col("text"))).as("ws"))
      .withColumn("dl", size(col("ws")).cast("long"))
    p.select(col("doc_id"), col("dl")).withColumn("batch_id", lit(1L))
      .write.mode("append").parquet(s"$store/doclen")
    Retrieval.compactIndexStore(spark, store)
    // the torn frontier must NOT be sealed: batch 1 is not covered
    assert(!StoreFs.markerExists(spark, store, 1L),
      "seal must stop at the id fully landed in ALL sub-tables")
    // ... and its doclen tag must survive the fold for the anti-join
    val doclenTags = spark.read.parquet(live(s"$store/doclen"))
      .select("batch_id").distinct().collect().map(_.getLong(0)).toSet
    assert(doclenTags == Set(-1L, 1L))
    // replay of batch 1: doclen appends nothing, postings/positions land
    IndexIngest.processBatch(b1.toDF("doc_id", "text"), 1L, store)
    assert(spark.read.parquet(live(s"$store/doclen")).count() ==
      (b0.size + b1.size).toLong, "doclen must not duplicate")
    val all = (b0 ++ b1).toDF("doc_id", "text")
    val terms = Seq("table", "spark", "fast")
    assert(rows(Retrieval.bm25TopKFromStore(spark, store, terms, 5)) ==
      rows(Retrieval.bm25TopK(all, terms, 5)),
      "healed store must answer exactly like the batch path")
    assert(rows(Retrieval.phraseSearchFromStore(spark, store,
        Seq(Seq("table", "part")), 5)) ==
      rows(Retrieval.phraseSearch(all, Seq(Seq("table", "part")), 5)))
    // a later compaction (store now consistent) seals through batch 1
    Retrieval.compactIndexStore(spark, store)
    assert(StoreFs.markerExists(spark, store, 1L))
  }

  test("Trigger.AvailableNow drains a file backlog then stops on its own") {
    import spark.implicits._
    // the batch-over-stream production pattern: a scheduled job opens
    // the stream, processes everything that has arrived, and exits —
    // same checkpoint, same exactly-once contract as the live stream
    val store = tmpDir("graft-idxingest-avail-")
    val stage = tmpDir("graft-idxingest-stage-")
    b0.toDF("doc_id", "text").repartition(2)
      .write.mode("overwrite").parquet(stage)
    val q = spark.readStream.schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(stage)
      .writeStream
      .option("checkpointLocation", tmpDir("graft-idxingest-avail-ckpt-"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        IndexIngest.processBatch(batch.toDF(), id, store); ()
      }
      .start()
    assert(q.awaitTermination(120000),
      "AvailableNow must terminate after draining the backlog")
    val terms = Seq("table", "fast")
    assert(rows(Retrieval.bm25TopKFromStore(spark, store, terms, 5)) ==
      rows(Retrieval.bm25TopK(b0.toDF("doc_id", "text"), terms, 5)))
  }

  test("replayed batch appends nothing; marker short-circuits") {
    import spark.implicits._
    val store = tmpDir("graft-idxingest-replay-")
    val batch = b0.toDF("doc_id", "text")
    IndexIngest.processBatch(batch, 0L, store)
    def counts = Seq("doclen", "postings", "positions")
      .map(s => spark.read.parquet(s"$store/$s").count())
    val first = counts
    // marker fast path
    IndexIngest.processBatch(batch, 0L, store)
    assert(counts == first)
    // simulate a crash BEFORE the marker: delete it, replay — the
    // anti-join must still append zero rows
    val fs = new java.io.File(store).listFiles()
      .filter(_.getName.startsWith("_graft_batch_"))
    fs.foreach(_.delete())
    IndexIngest.processBatch(batch, 0L, store)
    assert(counts == first, "anti-join replay must be a no-op")
  }
}
