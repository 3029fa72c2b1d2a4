package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Curation

/** The STREAMING form of incremental DSIR (y03 is its batch form):
  * documents arrive as a stream; each micro-batch
  *
  *   1. computes its own bucket counts (the estimator's exactly-mergeable
  *      ≤ 4096-row sufficient statistic),
  *   2. derives λ over PRIOR counts + its own — the estimator over
  *      everything seen so far — and scores itself with a fixed
  *      threshold τ in nats (a stream cannot take a corpus percentile;
  *      the `dsirGate` deployment contract),
  *   3. APPENDS its counts (tagged with batch_id) to the store, so the
  *      estimator keeps sharpening as data flows.
  *
  * `foreachBatch` for the same reason as [[IncrementalDedup]]: the store
  * is cross-batch state shared with batch jobs (`Curation.writeDsirStore`
  * uses the same columns minus the tag), so it lives in parquet, not the
  * state store. Restart safety STRENGTHENS the [[SemanticDedupStream]]
  * contract: decisions are replay-idempotent by construction because the
  * prior-count read EXCLUDES rows tagged with the replaying batch's own
  * id (self-exclusion at the statistic level — a replay after a crash
  * between append and marker re-derives λ from exactly the counts the
  * original run saw), and the append anti-joins rows already landed
  * under (batch_id, bucket) — so the append-before-marker crash window
  * corrupts NOTHING: decisions and future counts are both replay-exact,
  * a partial append heals row-wise on the re-run, and the
  * `_graft_batch_<id>` marker is a pure fast-path short-circuit.
  *
  * At 100 TB this is the production loop: the store grows by ≤ 4096
  * rows per interval (compaction = sum by bucket over old generations,
  * the gram-store cadence) and the gate stays a stateless column
  * program; only λ derivation touches the store.
  */
object DsirStream {

  /** Start the streaming DSIR scorer. `docs` must be a STREAMING
    * DataFrame with (doc_id, text) plus whatever `isTarget` reads.
    * `onBatch` observes each batch's decisions
    * (doc_id, n_feats, imp_mu, kept). */
  def run(docs: DataFrame, isTarget: Column, storePath: String,
          thresholdNats: Double, checkpoint: String)
         (onBatch: (DataFrame, Long) => Unit = (_, _) => ()): StreamingQuery = {
    StoreFs.claimOwner(docs.sparkSession, storePath, checkpoint)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, isTarget, storePath,
          thresholdNats, onBatch)
        ()
      }
      .start()
  }

  /** One micro-batch step, also callable from batch jobs/tests. */
  def processBatch(batch: DataFrame, batchId: Long, isTarget: Column,
                   storePath: String, thresholdNats: Double,
                   onBatch: (DataFrame, Long) => Unit): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    if (StoreFs.markerExists(spark, storePath, batchId))
      return // checkpoint replay of a fully-recorded batch
    // geometry bootstrap/guard (VERDICT r13 #4)
    StoreFs.ensureGeometry(spark, storePath, "dsir",
      Seq("key_columns" -> "b"), "DsirStream")
    val storeExists = StoreFs.storeExists(spark, storePath)
    // materialize the batch counts BEFORE the append fires recacheByPath
    // (the IncrementalDedup lesson): both the λ derivation and the append
    // payload must see one frozen copy
    val bc = graft.core.Caches.scopedCheckpoint(
      Curation.dsirCounts(batch, isTarget).localCheckpoint(true))
    // a store bootstrapped by the BATCH writer (Curation.writeDsirStore)
    // has no batch_id column — treat its rows as the −1 generation
    // sentinel so the stream can take over an existing batch store
    def readStore() = {
      // mergeSchema: once the stream appends tagged rows onto a
      // batch-bootstrapped (tagless) store the directory mixes schemas,
      // and the default single-file schema pick could hide batch_id —
      // breaking both the self-exclusion filter and the append
      // anti-join on replay (the IndexIngest ADVICE-r8 window)
      val raw = spark.read.option("mergeSchema", "true")
        .parquet(StoreFs.dataDir(spark, storePath))
      if (raw.columns.contains("batch_id")) raw
      else raw.withColumn("batch_id", lit(-1L))
    }
    val combined =
      if (storeExists)
        // self-exclusion: a crash-replay whose counts already landed must
        // not double-count itself — decisions replay-idempotent
        bc.unionByName(readStore()
            .filter(col("batch_id") =!= batchId).select("b", "ct", "cr"))
          .groupBy("b").agg(sum("ct").as("ct"), sum("cr").as("cr"))
      else bc
    val decisions = graft.core.Caches.scopedCheckpoint(
      Curation.dsirImportanceAgainst(batch, isTarget, combined)
        .withColumn("kept",
          col("imp_mu").cast("double") / 1000000.0d / col("n_feats")
            >= thresholdNats)
        .localCheckpoint(true))
    val tagged = bc.withColumn("batch_id", lit(batchId))
      .select("batch_id", "b", "ct", "cr")
    // idempotent append at ROW granularity: anti-join on (batch_id, b)
    // so a full replay appends nothing and a crash MID-append (some of
    // the ≤ 4096 rows visible, the rest lost) heals — the missing
    // buckets land on the re-run instead of being skipped wholesale (an
    // all-or-nothing existence probe would permanently under-count
    // them). The store side is ≤ 4096 rows per generation — bounded.
    val toAppend =
      if (storeExists)
        tagged.join(readStore().select("batch_id", "b"),
          Seq("batch_id", "b"), "left_anti")
      else tagged
    if (storeExists) toAppend.write.mode("append")
      .parquet(StoreFs.dataDir(spark, storePath))
    else toAppend.write.mode("overwrite").parquet(storePath)
    StoreFs.writeMarker(spark, storePath, batchId)
    onBatch(decisions, batchId)
    graft.core.Caches.releaseAll()
  }
}
