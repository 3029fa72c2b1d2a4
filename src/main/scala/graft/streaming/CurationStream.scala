package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{Curation, Dedup, TextAnalysis}

/** The COMPOSED ingest-curation pipeline — every stage of the batch
  * curation DAG in one `foreachBatch` stream, in pipeline order:
  *
  *   1. C4 page gate (x64 semantics) — stateless per-row filter,
  *   2. hashed quality-classifier gate (x78) — stateless per-row filter,
  *   3. cross-batch incremental dedup against the persisted signature
  *      store ([[IncrementalDedup]], the x41 cadence) — the one STATEFUL
  *      stage, state = the parquet store, never the corpus,
  *   4. frozen DSIR λ gate (the deployment form of x98: λ trained on a
  *      bootstrap corpus, frozen into a dense ≤4096-slot array, threshold
  *      picked on the training batch) — stateless again.
  *
  * Each piece is individually graded/spec'd; this module is the shape a
  * real ingest ships — one stream, one store, one decision per document —
  * and StreamingCurationSpec proves the composition: stream decisions over
  * any batch split ≡ [[curationBatch]] on the same corpus (given the
  * arrival-order = id-order discipline every incremental family here
  * uses, so "first seen wins" and "lowest id wins" agree).
  *
  * Scale shape: gates are zero-state column programs; dedup state is
  * ~100 B/doc signatures appended per batch (old text never rescanned);
  * the λ table is a broadcast-sized constant. Nothing in the loop grows
  * with corpus age except the signature store, which compaction
  * (Dedup.compactSignatureStore) keeps one-row-per-doc.
  */
object CurationStream {

  /** Start the composed curation stream. `docs` must be a STREAMING
    * DataFrame with (doc_id, text). `onBatch` observes every input doc's
    * final verdict: (doc_id, gated, dropped, kept) — `gated` 1 if it
    * passed both stateless gates, `dropped` 1 if dedup removed it,
    * `kept` 1 iff it survived the whole pipeline. The frame is backed by
    * the batch's released-on-return checkpoint: materialize it INSIDE
    * the callback (same contract as [[IncrementalDedup.run]]). */
  def run(docs: DataFrame, storePath: String, estThreshold: Double,
          lam: Seq[Long], tau: Double, checkpoint: String)
         (onBatch: (DataFrame, Long) => Unit = (_, _) => ()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, storePath, estThreshold,
          lam, tau, onBatch)
        ()
      }
      .start()

  /** One micro-batch step, also callable from batch jobs/tests. */
  def processBatch(batch: DataFrame, batchId: Long, storePath: String,
                   estThreshold: Double, lam: Seq[Long], tau: Double,
                   onBatch: (DataFrame, Long) => Unit): Unit = {
    if (batch.isEmpty) return
    val gated = batch.filter(Curation.c4PageGate(col("text")) &&
      TextAnalysis.classifierGate(col("text")))
    if (gated.isEmpty) {
      // nothing survives the stateless gates: no store traffic, but the
      // verdicts are still emitted (all gated = 0)
      onBatch(batch.select(col("doc_id"), lit(0).as("gated"),
        lit(0).as("dropped"), lit(0).as("kept")), batchId)
      return
    }
    // the dedup stage owns the store protocol (marker replay-skip,
    // localCheckpointed decisions, anti-join append); observe its
    // verdicts through its own callback, and — like every consumer of
    // that callback — finish USING them inside it: the decisions frame
    // is a local checkpoint that processBatch releases (unrecoverably)
    // on return, so the λ-gate join and verdict emission must run while
    // it is alive. A checkpoint-replayed batch never reaches the
    // callback — the composed decisions were already emitted the first
    // time, so emission is skipped with it.
    IncrementalDedup.processBatch(gated, batchId, storePath, estThreshold,
      onBatch = (dec, _) => {
        val selected = gated
          .join(dec.filter(col("dropped") === 0).select("doc_id"), "doc_id")
          .filter(Curation.dsirGate(col("text"), lam, tau))
          .select(col("doc_id"), lit(1).as("kept"))
        val verdicts = batch.select("doc_id")
          .join(gated.select(col("doc_id"), lit(1).as("gated")), Seq("doc_id"), "left")
          .join(dec.select(col("doc_id"), col("dropped")), Seq("doc_id"), "left")
          .join(selected, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("gated"), lit(0)).as("gated"),
            coalesce(col("dropped"), lit(0)).as("dropped"),
            coalesce(col("kept"), lit(0)).as("kept"))
        onBatch(verdicts, batchId)
      })
  }

  /** The SAME pipeline as one batch DAG — the spec's ground truth and the
    * backfill form: gates → whole-corpus greedy dedup (x21 semantics,
    * lowest-id winner) → frozen λ gate. Returns the same verdict schema
    * as the stream's `onBatch`. Stream ≡ batch whenever arrival order
    * agrees with id order (the store's winner rule). */
  def curationBatch(docs: DataFrame, estThreshold: Double,
                    lam: Seq[Long], tau: Double): DataFrame = {
    val gated = docs.filter(Curation.c4PageGate(col("text")) &&
      TextAnalysis.classifierGate(col("text")))
    val dec = Dedup.minhashDedupDecisions(gated, estThreshold)
    val selected = gated
      .join(dec.filter(col("dropped") === 0).select("doc_id"), "doc_id")
      .filter(Curation.dsirGate(col("text"), lam, tau))
      .select(col("doc_id"), lit(1).as("kept"))
    docs.select("doc_id")
      .join(gated.select(col("doc_id"), lit(1).as("gated")), Seq("doc_id"), "left")
      .join(dec.select(col("doc_id"), col("dropped")), Seq("doc_id"), "left")
      .join(selected, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("gated"), lit(0)).as("gated"),
        coalesce(col("dropped"), lit(0)).as("dropped"),
        coalesce(col("kept"), lit(0)).as("kept"))
  }
}
