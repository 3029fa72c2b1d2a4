package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{Curation, Dedup, Quantization, TextAnalysis}

/** The COMPOSED ingest-curation pipeline — every stage of the batch
  * curation DAG in one `foreachBatch` stream, in pipeline order:
  *
  *   1. C4 page gate (x64 semantics) — stateless per-row filter,
  *   2. hashed quality-classifier gate (x78) — stateless per-row filter,
  *   3. cross-batch incremental dedup against the persisted signature
  *      store ([[IncrementalDedup]], the x41 cadence) — STATEFUL,
  *      state = the parquet signature store, never the corpus,
  *   4. cross-batch SEMANTIC dedup against the persisted code store
  *      ([[SemanticDedupStream]], the x81 cadence) over the model-free
  *      hashed document embedding (y04): catches near-duplicates the
  *      shingle stage misses (reordered/paraphrase-shaped text shares
  *      unigram mass but few shingles) — the second stateful stage,
  *   5. frozen DSIR λ gate (the deployment form of x98: λ trained on a
  *      bootstrap corpus, frozen into a dense ≤4096-slot array, threshold
  *      picked on the training batch) — stateless again.
  *
  * Each piece is individually graded/spec'd; this module is the shape a
  * real ingest ships — one stream, two stores, one decision per document —
  * and StreamingCurationSpec proves the composition: stream decisions over
  * any batch split ≡ [[curationBatch]] on the same corpus (given the
  * arrival-order = id-order discipline every incremental family here
  * uses, so "first seen wins" and "lowest id wins" agree, and a mask
  * regime where the bootstrap and the whole corpus agree on autoBits —
  * the spec pins targetOcc accordingly).
  *
  * Scale shape: gates are zero-state column programs; dedup state is
  * ~100 B/doc signatures + ~70 B/doc codes appended per batch (old text
  * never rescanned); the λ table is a broadcast-sized constant. Nothing
  * in the loop grows with corpus age except the two stores, which
  * compaction (Dedup.compactSignatureStore /
  * Quantization.compactCodeStore) keeps one-row-per-doc.
  *
  * Crash-window contract: each stateful stage has its own
  * `_graft_batch_<id>` marker. A crash BETWEEN the signature-store
  * marker and the code-store append replays as a no-op (the sig marker
  * short-circuits the whole batch), losing that batch's codes from the
  * semantic store: future duplicates of those survivors are then KEPT —
  * a bounded recall loss, never a correctness flip, matching the
  * at-most-once verdict delivery both stages already have.
  */
object CurationStream {

  /** Semantic-stage defaults: the hashed embedding's native dimension and
    * the auto-bits ceiling shared with the y04/y05 family. */
  val SemDim: Int = TextAnalysis.EmbedDim
  val SemMaxBits: Int = 8

  /** The hashed document embedding lifted to the code-store layout:
    * (vec_id, embedding float[dim]) — exact, the bigint counts are far
    * inside float's 2²⁴ integer range. */
  private def semEmbedding(docs: DataFrame, dim: Int): DataFrame =
    TextAnalysis.hashedEmbedding(docs, dim)
      .select(col("doc_id").as("vec_id"),
        transform(col("vec"), x => x.cast("float")).as("embedding"))

  /** Start the composed curation stream. `docs` must be a STREAMING
    * DataFrame with (doc_id, text). `onBatch` observes every input doc's
    * final verdict: (doc_id, gated, dropped, semdropped, kept) — `gated`
    * 1 if it passed both stateless gates, `dropped` 1 if shingle dedup
    * removed it, `semdropped` 1 if semantic dedup removed it, `kept` 1
    * iff it survived the whole pipeline. The frame is backed by the
    * batch's released-on-return checkpoint: materialize it INSIDE the
    * callback (same contract as [[IncrementalDedup.run]]). */
  def run(docs: DataFrame, storePath: String, codeStorePath: String,
          estThreshold: Double, targetOcc: Int,
          lam: Seq[Long], tau: Double, checkpoint: String,
          semTauSqBp: Long = 4900L)
         (onBatch: (DataFrame, Long) => Unit = (_, _) => ()): StreamingQuery = {
    StoreFs.claimOwner(docs.sparkSession, storePath, checkpoint)
    StoreFs.claimOwner(docs.sparkSession, codeStorePath, checkpoint)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, storePath, codeStorePath,
          estThreshold, targetOcc, lam, tau, onBatch, semTauSqBp)
        ()
      }
      .start()
  }

  /** One micro-batch step, also callable from batch jobs/tests. */
  def processBatch(batch: DataFrame, batchId: Long, storePath: String,
                   codeStorePath: String, estThreshold: Double,
                   targetOcc: Int, lam: Seq[Long], tau: Double,
                   onBatch: (DataFrame, Long) => Unit,
                   semTauSqBp: Long = 4900L): Unit = {
    if (batch.isEmpty) return
    // Pin the gate result before fan-out: `gated` feeds the isEmpty
    // probe, the dedup stage, the λ-gate join and the verdict join — the
    // C4/classifier column programs are deterministic, so recompute is a
    // cost bug, not a correctness one (the bpeTrain/IncrementalDedup
    // discipline). The cache lives until the dedup stage's releaseAll().
    val gated = graft.core.Caches.scoped(
      batch.filter(Curation.c4PageGate(col("text")) &&
        TextAnalysis.classifierGate(col("text"))))
    if (gated.isEmpty) {
      // Nothing survives the stateless gates: no store traffic, but the
      // verdicts are still emitted (all gated = 0) — guarded by the SAME
      // store-directory marker the dedup stage uses, so a checkpoint
      // replay of an all-gated-out batch never reaches the callback
      // either (marker before emit = the normal path's at-most-once
      // ordering; the store dir may not exist yet, but a marker file
      // alone never makes storeExists() true).
      val spark = batch.sparkSession
      if (!StoreFs.markerExists(spark, storePath, batchId)) {
        StoreFs.writeMarker(spark, storePath, batchId)
        onBatch(batch.select(col("doc_id"), lit(0).as("gated"),
          lit(0).as("dropped"), lit(0).as("semdropped"),
          lit(0).as("kept")), batchId)
      }
      graft.core.Caches.releaseAll()
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
        // shingle-dedup survivors feed the semantic stage; pin them — the
        // frame fans out to the embedding lift, the λ join and the
        // verdict join, and recomputing it re-runs the decision join.
        val sigSurv = graft.core.Caches.scoped(gated
          .join(dec.filter(col("dropped") === 0).select("doc_id"), "doc_id"))
        // The semantic stage owns the code-store protocol (frozen mask,
        // marker, anti-join append) — its callback is where the λ gate
        // and verdict emission run, for the same released-on-return
        // reason as the enclosing callback. IncrementalDedup's sig-store
        // marker for this batch is already written, so a replay never
        // reaches this point — the semantic stage here only sees live
        // batches (its own marker guards the append-crash window).
        val emitVerdicts = (semdec: DataFrame) => {
          val semKept = semdec.filter(col("kept"))
            .select(col("vec_id").as("doc_id"))
          val selected = sigSurv.join(semKept, "doc_id")
            .filter(Curation.dsirGate(col("text"), lam, tau))
            .select(col("doc_id"), lit(1).as("kept"))
          val verdicts = batch.select("doc_id")
            .join(gated.select(col("doc_id"), lit(1).as("gated")),
              Seq("doc_id"), "left")
            .join(dec.select(col("doc_id"), col("dropped")),
              Seq("doc_id"), "left")
            .join(semdec.select(col("vec_id").as("doc_id"),
              (lit(1) - col("kept").cast("int")).as("semdropped")),
              Seq("doc_id"), "left")
            .join(selected, Seq("doc_id"), "left")
            .select(col("doc_id"),
              coalesce(col("gated"), lit(0)).as("gated"),
              coalesce(col("dropped"), lit(0)).as("dropped"),
              coalesce(col("semdropped"), lit(0)).as("semdropped"),
              coalesce(col("kept"), lit(0)).as("kept"))
          onBatch(verdicts, batchId)
        }
        if (sigSurv.isEmpty)
          // every gated doc was a shingle duplicate: no semantic-store
          // traffic, and the semantic stage would skip its callback on an
          // empty batch — emit with an empty semantic verdict set.
          emitVerdicts(sigSurv.select(col("doc_id").as("vec_id"),
            lit(true).as("kept")))
        else
          SemanticDedupStream.processBatch(
            semEmbedding(sigSurv, SemDim), batchId, codeStorePath,
            targetOcc, SemMaxBits, SemDim,
            onBatch = (semdec, _) => emitVerdicts(semdec),
            tauNumSq = semTauSqBp)
      })
  }

  /** The SAME pipeline as one batch DAG — the spec's ground truth and the
    * backfill form: gates → whole-corpus greedy dedup (x21 semantics,
    * lowest-id winner) → whole-corpus semantic dedup (x79 semantics over
    * the hashed embedding, auto mask from the survivor count) → frozen λ
    * gate. Returns the same verdict schema as the stream's `onBatch`.
    * Stream ≡ batch whenever arrival order agrees with id order (the
    * stores' winner rule) and autoBits agrees between the stream's
    * bootstrap survivor count and the batch survivor count (pin
    * `targetOcc` above both, as the spec does, or accept mask drift as a
    * recall difference). */
  def curationBatch(docs: DataFrame, estThreshold: Double, targetOcc: Int,
                    lam: Seq[Long], tau: Double,
                    semTauSqBp: Long = 4900L): DataFrame = {
    val gated = docs.filter(Curation.c4PageGate(col("text")) &&
      TextAnalysis.classifierGate(col("text")))
    val dec = Dedup.minhashDedupDecisions(gated, estThreshold)
    val sigSurv = gated
      .join(dec.filter(col("dropped") === 0).select("doc_id"), "doc_id")
    val semdec = Quantization.semanticDedupAuto(
      semEmbedding(sigSurv, SemDim), targetOcc, SemMaxBits, SemDim,
      tauNumSq = semTauSqBp)
    val selected = sigSurv
      .join(semdec.filter(col("kept")).select(col("vec_id").as("doc_id")),
        "doc_id")
      .filter(Curation.dsirGate(col("text"), lam, tau))
      .select(col("doc_id"), lit(1).as("kept"))
    docs.select("doc_id")
      .join(gated.select(col("doc_id"), lit(1).as("gated")), Seq("doc_id"), "left")
      .join(dec.select(col("doc_id"), col("dropped")), Seq("doc_id"), "left")
      .join(semdec.select(col("vec_id").as("doc_id"),
        (lit(1) - col("kept").cast("int")).as("semdropped")),
        Seq("doc_id"), "left")
      .join(selected, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("gated"), lit(0)).as("gated"),
        coalesce(col("dropped"), lit(0)).as("dropped"),
        coalesce(col("semdropped"), lit(0)).as("semdropped"),
        coalesce(col("kept"), lit(0)).as("kept"))
  }
}
