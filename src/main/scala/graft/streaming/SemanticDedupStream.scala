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
  * `_graft_batch_<id>` marker makes checkpoint replays skip the append.
  * The crash window between append and marker is where the guarantees
  * split: `kept` decisions are replay-IDEMPOTENT because
  * [[Quantization.semanticDedupFromStore]] excludes a probe's own stored
  * copy from the old side (without that, every survivor would τ-match
  * itself at cos = 1 and the replay would silently drop the whole batch)
  * and survivors are pairwise non-τ-close by construction, so re-deciding
  * against the mutated store flips nothing; `n_close` COUNTS can still
  * inflate on the REPLAYED batch's own report (a kept batch-mate is then
  * witnessed both as its stored copy and as its in-batch row), so the
  * marker remains load-bearing for that one graded count, but never for
  * decisions — and never for FUTURE batches: the append anti-joins
  * already-stored vec_ids, so neither a full replay nor a crash
  * mid-append can leave duplicate codes in the store (a partial append
  * heals — the missing remainder lands on the re-run).
  *
  * At 100 TB this is the production loop: the store grows by one batch
  * of codes per interval; the mask stays frozen until an operator-
  * decided store rebuild (the IVF-retrain cadence).
  */
object SemanticDedupStream {

  /** Start the streaming semantic dedup. `emb` must be a STREAMING
    * DataFrame with (vec_id, embedding). `onBatch` observes each batch's
    * decisions (vec_id, cell, n_close, kept). `tauNumSq`/`tauDenSq` are
    * the τ² basis points of the cross-multiplied cosine test (the
    * x76/x79 dial — default cos ≥ 0.45; a composed text pipeline over
    * hashed bag-of-words embeddings wants it tighter). */
  def run(emb: DataFrame, storePath: String, targetOcc: Int, maxBits: Int,
          dim: Int, checkpoint: String, tauNumSq: Long = 2025L,
          tauDenSq: Long = 10000L)
         (onBatch: (DataFrame, Long) => Unit = (_, _) => ()): StreamingQuery = {
    StoreFs.claimOwner(emb.sparkSession, storePath, checkpoint)
    emb.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, storePath, targetOcc, maxBits,
          dim, onBatch, tauNumSq, tauDenSq)
        ()
      }
      .start()
  }

  /** One micro-batch step, also callable from batch jobs/tests. */
  def processBatch(batch: DataFrame, batchId: Long, storePath: String,
                   targetOcc: Int, maxBits: Int, dim: Int,
                   onBatch: (DataFrame, Long) => Unit,
                   tauNumSq: Long = 2025L, tauDenSq: Long = 10000L): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    if (StoreFs.markerExists(spark, storePath, batchId))
      return // checkpoint replay of an appended batch
    val storeExists = StoreFs.storeExists(spark, storePath)
    // localCheckpoint BEFORE the store append — the append fires Spark's
    // recacheByPath, and a lazily re-evaluated plan would re-read the
    // store including the batch's own just-written codes (the
    // IncrementalDedup lesson, same hazard shape).
    val raw =
      if (storeExists)
        Quantization.semanticDedupFromStore(
          batch,
          spark.read.parquet(StoreFs.dataDir(spark, storePath)),
          maxBits, dim, tauNumSq, tauDenSq)
      else
        Quantization.semanticDedupAuto(batch, targetOcc, maxBits, dim,
          tauNumSq, tauDenSq)
    val decisions = graft.core.Caches.scopedCheckpoint(raw.localCheckpoint(true))
    val kept = batch.join(decisions.filter(col("kept"))
      .select("vec_id"), "vec_id")
    if (storeExists)
      // anti-join append: a replay (or a crash mid-append) may find part
      // of this batch's codes already stored; appending blindly would
      // duplicate them and inflate every FUTURE batch's n_close. Writing
      // only the not-yet-stored survivors makes the append idempotent
      // AND heals partial appends (the missing remainder lands).
      Quantization.appendToCodeStore(
        kept.join(
          spark.read.parquet(StoreFs.dataDir(spark, storePath))
            .select("vec_id"),
          Seq("vec_id"), "left_anti"),
        spark.read.parquet(StoreFs.dataDir(spark, storePath)),
        storePath, maxBits, dim)
    else
      // bootstrap: the mask is frozen from the FULL batch's corpus count —
      // the same count semanticDedupAuto derived its cells from. Freezing
      // from the smaller survivor set could straddle an autoBits boundary
      // and store cell ids that disagree with batch 0's emitted decisions.
      Quantization.writeCodeStore(kept, storePath, targetOcc, maxBits, dim,
        maskCorpus = Some(batch))
    StoreFs.writeMarker(spark, storePath, batchId)
    onBatch(decisions, batchId)
    graft.core.Caches.releaseAll()
  }
}
