package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.ExactIvf

/** STREAMING vec-store ingest — the §2.10 twin of the exact-IVF vector
  * store (y49's semantic arm), completing the store-family symmetry:
  * like the signature/gram/DSIR/code/index/PQ/IVFADC stores, the vec
  * store now has both a batch append cadence and a streaming one.
  *
  * Each micro-batch is assigned under the store's FROZEN coarse cells
  * and appended via [[ExactIvf.appendToVecStore]], whose two-phase
  * bound-safety order (raise r2max first, rows second) and batch-tag +
  * anti-join + marker discipline make every crash window heal on
  * replay — an interrupted batch can only leave a conservative bound,
  * never a wrong pruning decision. */
object VecIngest {

  def run(vecs: DataFrame, storePath: String, checkpoint: String,
          idCol: String = "doc_id", vecCol: String = "vec")
         (onBatch: Long => Unit = _ => ()): StreamingQuery = {
    // the owner record must live at the MARKER root — for the vec
    // store that is $path/vecs (where appendToVecStore keeps its
    // replay markers and seal), not the enclosing store root: the
    // guard's pre-claim ingest-state probe and StoreAudit's owner
    // check both resolve the same directory the markers do
    StoreFs.claimOwner(vecs.sparkSession, s"$storePath/vecs", checkpoint)
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, storePath, idCol, vecCol)
        onBatch(batchId)
        ()
      }
      .start()
  }

  /** One micro-batch step, also callable from batch jobs/tests. */
  def processBatch(batch: DataFrame, batchId: Long, storePath: String,
                   idCol: String = "doc_id", vecCol: String = "vec"): Unit = {
    if (batch.isEmpty) return
    ExactIvf.appendToVecStore(batch.sparkSession, batch, storePath,
      Some(batchId), idCol, vecCol)
  }
}
