package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Dedup

/** The STREAMING form of the signature-store dedup cadence (x41 is its
  * batch form): documents arrive as a stream; each micro-batch is
  *
  *   1. deduplicated WITHIN the batch (greedy pairwise, `x21` semantics),
  *   2. deduplicated AGAINST the persisted signature store — only the
  *      batch is shingled/hashed, the corpus is its signatures,
  *   3. survivors' signatures are APPENDED to the store, so the next
  *      batch sees them.
  *
  * `foreachBatch` is the right tool (not a stateful operator): the store
  * is cross-batch state that must outlive the query and be shared with
  * batch jobs, so it lives in parquet, not the state store. Restart
  * safety: the checkpoint replays an in-flight batch; the append of a
  * replayed batch would duplicate signatures, which is HARMLESS for
  * dedup decisions (band collisions are set-semantics — `distinct` on
  * candidate pairs) but is still guarded by recording the last appended
  * batchId in the store directory (`_graft_batch_<id>` marker).
  *
  * At 100 TB this is the production loop: the store grows by one batch of
  * ~100 B/doc rows per interval; nothing ever rescans old text.
  */
object IncrementalDedup {

  /** Start the streaming dedup. `docs` must be a STREAMING DataFrame with
    * (doc_id, text). `onBatch` observes each batch's decisions
    * (doc_id, dropped — 1 if duplicate of the store or of an
    * earlier-kept doc in the same batch). `closure = true` switches the
    * per-batch policy from greedy pairwise to CLUSTER CLOSURE (the x56
    * semantics: smallest-id connected components over the batch ∪
    * store-frontier edge set — one survivor per duplicate cluster,
    * store members always win). */
  def run(docs: DataFrame, storePath: String, estThreshold: Double,
          checkpoint: String, closure: Boolean = false)
         (onBatch: (DataFrame, Long) => Unit = (_, _) => ()): StreamingQuery = {
    StoreFs.claimOwner(docs.sparkSession, storePath, checkpoint)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, storePath, estThreshold, onBatch,
          closure)
        ()
      }
      .start()
  }

  /** One micro-batch step, also callable from batch jobs/tests. */
  def processBatch(batch: DataFrame, batchId: Long, storePath: String,
                   estThreshold: Double,
                   onBatch: (DataFrame, Long) => Unit,
                   closure: Boolean = false): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    if (StoreFs.markerExists(spark, storePath, batchId))
      return // checkpoint replay of an appended batch
    // geometry bootstrap/guard (VERDICT r13 #4): first batch records
    // the family, later batches fail fast on a wrong-store path
    StoreFs.ensureGeometry(spark, storePath, "signature",
      Seq("key_columns" -> "doc_id"), "IncrementalDedup")
    val storeExists = StoreFs.storeExists(spark, storePath)
    // MATERIALIZE decisions BEFORE the store append — as a LOCAL
    // CHECKPOINT, not a cache: the plan reads the store parquet, and the
    // append below fires Spark's recacheByPath, which would RECOMPUTE a
    // persisted plan against the appended files (each doc then collides
    // with its own just-written signatures). localCheckpoint severs the
    // lineage entirely (LogicalRDD), so neither `kept` below nor a lazy
    // re-evaluation inside `onBatch` can ever re-read the store.
    val raw =
      if (closure) {
        // cluster-closure policy: in-batch-only closure until the store
        // exists, then the bounded incremental edge set against it
        val dec =
          if (storeExists)
            // VISIBLE read (round 14): tombstoned docs stop matching the
            // moment their delete lands — the append anti-join below
            // stays raw (a still-present row blocks re-append until
            // purge, the delete-wins contract)
            Dedup.incrementalClusterClosure(
              batch,
              Dedup.readSignatureStore(spark, storePath),
              estThreshold)
          else Dedup.clusterClosureDecisions(batch, estThreshold)
        dec.select(col("doc_id"), (lit(1) - col("kept")).as("dropped"))
      } else {
        // greedy pairwise policy (x21 in-batch + x41 vs-store semantics)
        val inBatch = Dedup.minhashDedupDecisions(batch, estThreshold)
        val vsStore =
          if (storeExists)
            Dedup.incrementalDropDecisionsFromStore(
              batch,
              Dedup.readSignatureStore(spark, storePath),
              estThreshold)
              .withColumnRenamed("dropped", "dropped_store")
          else batch.select(col("doc_id"), lit(0).as("dropped_store"))
        inBatch.withColumnRenamed("dropped", "dropped_batch")
          .join(vsStore, "doc_id")
          .select(col("doc_id"),
            greatest(col("dropped_batch"), col("dropped_store")).as("dropped"))
      }
    val decisions = graft.core.Caches.scopedCheckpoint(raw.localCheckpoint(true))
    val kept = batch.join(decisions.filter(col("dropped") === 0)
      .select("doc_id"), "doc_id")
    // anti-join append: decisions were already replay-safe (duplicate
    // signatures only produce duplicate candidate pairs, which the band
    // joins' `distinct` absorbs), but a crash-window replay would still
    // BLOAT the store with re-appended rows forever. One row per doc_id
    // makes the doc-keyed anti-join heal exactly: a partial append's
    // missing docs land on the re-run, present ones are skipped.
    val sigs = Dedup.minhashSignatures(kept)
    val toAppend =
      if (storeExists)
        sigs.join(spark.read.parquet(StoreFs.dataDir(spark, storePath))
            .select("doc_id"),
          Seq("doc_id"), "left_anti")
      else sigs
    toAppend.write.mode("append")
      .parquet(StoreFs.dataDir(spark, storePath))
    StoreFs.writeMarker(spark, storePath, batchId)
    onBatch(decisions, batchId)
    graft.core.Caches.releaseAll()
  }
}
