package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Quantization

/** The STREAMING form of incremental semantic dedup (x81 is its batch
  * form): embedding vectors arrive as a stream; each micro-batch is
  *
  *   1. deduplicated WITHIN the batch (keep-lowest-id per τ-ball, x79
  *      semantics) while no store exists — the bootstrap batch also
  *      freezes the auto-bits cell mask from its own count,
  *   2. thereafter deduplicated AGAINST the persisted code store under
  *      the store's FROZEN mask — only the batch is quantized/bucketed;
  *      the old corpus is its ~70 B/vector codes, never its embeddings,
  *   3. survivors' codes are APPENDED to the store, so the next batch
  *      sees them.
  *
  * `foreachBatch` for the same reason as [[IncrementalDedup]]: the store
  * is cross-batch state that must outlive the query and be shared with
  * batch jobs (x81 reads the same layout), so it lives in parquet, not
  * the state store. Restart safety mirrors [[IncrementalDedup]]: a
  * `_graft_batch_<id>` marker makes checkpoint replays skip the append;
  * a crash between append and marker re-appends codes, which cannot flip
  * any decision (an extra copy of a stored vector only adds a duplicate
  * τ-close WITNESS for future batches — the verdict `n_close > 0` is
  * threshold-free on the count's magnitude only through `> 0`, which
  * duplicates cannot change... they CAN inflate `n_close`, so the marker
  * IS load-bearing for the graded count; decisions (kept) stay correct
  * regardless).
  *
  * At 100 TB this is the production loop: the store grows by one batch
  * of codes per interval; the mask stays frozen until an operator-
  * decided store rebuild (the IVF-retrain cadence).
  */
object SemanticDedupStream {

  /** Start the streaming semantic dedup. `emb` must be a STREAMING
    * DataFrame with (vec_id, embedding). `onBatch` observes each batch's
    * decisions (vec_id, cell, n_close, kept). */
  def run(emb: DataFrame, storePath: String, targetOcc: Int, maxBits: Int,
          dim: Int, checkpoint: String)
         (onBatch: (DataFrame, Long) => Unit = (_, _) => ()): StreamingQuery =
    emb.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, storePath, targetOcc, maxBits,
          dim, onBatch)
        ()
      }
      .start()

  /** One micro-batch step, also callable from batch jobs/tests. */
  def processBatch(batch: DataFrame, batchId: Long, storePath: String,
                   targetOcc: Int, maxBits: Int, dim: Int,
                   onBatch: (DataFrame, Long) => Unit): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val marker = new java.io.File(storePath, s"_graft_batch_$batchId")
    if (marker.exists()) return // checkpoint replay of an appended batch
    val storeExists = new java.io.File(storePath, "_SUCCESS").exists() ||
      new java.io.File(storePath).list() != null &&
        new java.io.File(storePath).list().exists(_.endsWith(".parquet"))
    // localCheckpoint BEFORE the store append — the append fires Spark's
    // recacheByPath, and a lazily re-evaluated plan would re-read the
    // store including the batch's own just-written codes (the
    // IncrementalDedup lesson, same hazard shape).
    val raw =
      if (storeExists)
        Quantization.semanticDedupFromStore(
          batch, spark.read.parquet(storePath), maxBits, dim)
      else
        Quantization.semanticDedupAuto(batch, targetOcc, maxBits, dim)
    val decisions = graft.core.Caches.scopedCheckpoint(raw.localCheckpoint(true))
    val kept = batch.join(decisions.filter(col("kept"))
      .select("vec_id"), "vec_id")
    if (storeExists)
      Quantization.appendToCodeStore(kept, spark.read.parquet(storePath),
        storePath, maxBits, dim)
    else
      // bootstrap: the mask is frozen from THIS batch's corpus count
      Quantization.writeCodeStore(kept, storePath, targetOcc, maxBits, dim)
    marker.createNewFile()
    onBatch(decisions, batchId)
    graft.core.Caches.releaseAll()
  }
}
