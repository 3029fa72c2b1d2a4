package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Pq

/** STREAMING code-store ingest — the §2.10 twin of the PQ / IVFADC
  * stores (y25 / y36), completing the store-family symmetry: every
  * persisted store (signature, gram, DSIR, semantic-code, index,
  * positional, PQ, IVFADC) now has both a batch append cadence and a
  * streaming one.
  *
  * Each micro-batch of embeddings is encoded under the store's FROZEN
  * quantizers and appended; restart safety is inherited wholesale from
  * the appends' own batch-tag + anti-join + `_graft_batch_<id>` marker
  * discipline (`Pq.appendToPqStore` / `appendToIvfadcStore` are safe to
  * retry by construction), so a checkpoint replay appends nothing and a
  * crash mid-append heals row-wise. `writePqStore` / `writeIvfadcStore`
  * must have built the base generation first — retraining the
  * quantizers is a store-rebuild cadence decision (the frozen-mask
  * trade every incremental store shares).
  */
object PqIngest {

  def run(emb: DataFrame, storePath: String, m: Int, dim: Int,
          checkpoint: String, ivfadc: Boolean = false)
         (onBatch: Long => Unit = _ => ()): StreamingQuery = {
    // owner at the MARKER root: PQ and IVFADC appends keep markers and
    // seal under $path/codes (the VecIngest rationale)
    StoreFs.claimOwner(emb.sparkSession, s"$storePath/codes", checkpoint)
    emb.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, storePath, m, dim, ivfadc)
        onBatch(batchId)
        ()
      }
      .start()
  }

  /** One micro-batch step, also callable from batch jobs/tests. */
  def processBatch(batch: DataFrame, batchId: Long, storePath: String,
                   m: Int, dim: Int, ivfadc: Boolean): Unit = {
    if (batch.isEmpty) return
    if (ivfadc)
      Pq.appendToIvfadcStore(batch.sparkSession, batch, storePath, m, dim,
        Some(batchId))
    else
      Pq.appendToPqStore(batch.sparkSession, batch, storePath, m, dim,
        Some(batchId))
  }
}
