package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.functions.TextFunctions._

/** STREAMING retrieval-index ingest — the §2.10 twin of the y19/y20/y24
  * index stores: documents arrive as a stream; each micro-batch is
  * tokenized ONCE and appended to all three index tables —
  *
  *   - `doclen/`   (doc_id, dl)            — BM25 corpus scalars,
  *   - `postings/` (term, doc_id, dl, tf)  — BM25 inverted index,
  *   - `positions/`(term, doc_id, pos)     — phrase/proximity index —
  *
  * so `Retrieval.bm25TopKFromStore` / `phraseSearchFromStore` serve
  * queries from a store that is always one micro-batch behind the
  * stream, and old text is never rescanned (the x41 cadence).
  *
  * Restart safety (the DsirStream discipline): every appended row is
  * tagged with its batch_id, and the append is idempotent at ROW
  * granularity — an anti-join on (batch_id, natural key) against the
  * already-visible generation means a full checkpoint replay appends
  * nothing and a crash MID-append heals (only the missing rows land on
  * the re-run, each table independently). The `_graft_batch_<id>`
  * marker is a pure fast-path short-circuit. Serving reads between a
  * mid-append crash and its replay may see a partial latest batch —
  * the standard eventually-consistent trade of non-transactional
  * multi-table appends; decisions converge at replay. The extra
  * batch_id column is invisible to the serving paths (they select
  * their own columns).
  */
object IndexIngest {

  def run(docs: DataFrame, storePath: String, checkpoint: String)
         (onBatch: Long => Unit = _ => ()): StreamingQuery = {
    StoreFs.claimOwner(docs.sparkSession, storePath, checkpoint)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, storePath)
        onBatch(batchId)
        ()
      }
      .start()
  }

  /** One micro-batch step, also callable from batch jobs/tests. */
  def processBatch(batch: DataFrame, batchId: Long,
                   storePath: String): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    if (StoreFs.markerExists(spark, storePath, batchId))
      return // checkpoint replay of a fully-recorded batch
    // geometry bootstrap/guard (VERDICT r13 #4): the first micro-batch
    // CREATES the store, so the manifest lands here; later batches
    // validate the family before mutating anything
    StoreFs.ensureGeometry(spark, s"$storePath/doclen", "index_doclen",
      Seq("key_columns" -> "doc_id"), "IndexIngest")
    StoreFs.ensureGeometry(spark, s"$storePath/postings", "index_postings",
      Seq("layout" -> "term_sorted", "key_columns" -> "term,doc_id"),
      "IndexIngest")
    StoreFs.ensureGeometry(spark, s"$storePath/positions", "positional",
      Seq("layout" -> "term_sorted", "key_columns" -> "term,doc_id,pos"),
      "IndexIngest")
    // one tokenize pass, frozen so the three appends share it (and so
    // no append-triggered recache can recompute it — the
    // IncrementalDedup lesson)
    val p = graft.core.Caches.scopedCheckpoint(
      batch
        .select(col("doc_id"), words(normText(col("text"))).as("ws"))
        .withColumn("dl", size(col("ws")).cast("long"))
        .localCheckpoint(true))

    def appendDedup(payload: DataFrame, sub: String,
                    keys: Seq[String]): Unit = {
      val dir = s"$storePath/$sub"
      val tagged = payload.withColumn("batch_id", lit(batchId))
      val novel =
        if (StoreFs.storeExists(spark, dir)) {
          // a compacted (or batch-written) generation has no batch_id
          // column — treat its rows as the −1 sentinel generation (the
          // DsirStream convention), which never collides with a real id.
          // mergeSchema is load-bearing: after a compaction the dir can
          // MIX tagless compacted files with tagged appended files, and
          // the default single-file schema pick could hide the batch_id
          // column entirely — a crash-before-marker replay would then
          // see every row as the sentinel and re-append the batch
          // (duplicate postings ⇒ inflated tf). Compaction now also
          // writes a literal −1 tag, but merge keeps pre-fix stores safe.
          val raw = spark.read.option("mergeSchema", "true")
            .parquet(StoreFs.dataDir(spark, dir))
          val visible =
            if (raw.columns.contains("batch_id")) raw
            else raw.withColumn("batch_id", lit(-1L))
          tagged.join(
            visible.filter(col("batch_id") === batchId)
              .select((keys :+ "batch_id").map(col): _*),
            keys :+ "batch_id", "left_anti")
        } else tagged
      novel.write.mode("append").parquet(StoreFs.dataDir(spark, dir))
    }

    appendDedup(p.select(col("doc_id"), col("dl")), "doclen",
      Seq("doc_id"))
    appendDedup(
      p.select(col("doc_id"), col("dl"), explode(col("ws")).as("term"))
        .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf")),
      "postings", Seq("term", "doc_id"))
    appendDedup(
      p.select(col("doc_id"),
          posexplode(col("ws")).as(Seq("pos", "term")))
        .select(col("term"), col("doc_id"), col("pos").cast("long").as("pos")),
      "positions", Seq("term", "doc_id", "pos"))
    StoreFs.writeMarker(spark, storePath, batchId)
  }
}
