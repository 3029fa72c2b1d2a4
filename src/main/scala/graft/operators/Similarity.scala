package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Similarity search over an embedding column (north-star extension,
  * SURVEY §2.12).
  *
  * Two paths, same contract:
  *  - `bruteForceTopK`: exact. The probe set is broadcast; every executor
  *    scans its partition of the corpus computing the codegen'd cosine —
  *    O(|corpus|·|probes|) but embarrassingly parallel and shuffle-free
  *    until the final per-probe top-k (window over probe partitions).
  *    Right answer at 100 TB when |probes| is small.
  *  - `lshBucketed`: approximate scale path. Sign-bit bucketing on
  *    deterministic hyperplanes turns the cross join into an equi-join on
  *    bucket id — candidate volume drops from |corpus|·|probes| to
  *    Σ_bucket |corpus_b|·|probes_b|. The IVF analogue with hash cells.
  */
object Similarity {

  /** Deterministic BOUNDED probe-id set: the `nProbes` corpus members
    * with the smallest (md5(id), id) — a fixed-size query workload at
    * any corpus size. The recall panels' brute-force truth side is
    * probes × corpus, so a corpus-FRACTION probe set (`id % mod`) makes
    * the grading query itself O(n²/mod) — a scale-killer at 100 TB; with
    * this bound the truth side is O(nProbes · n), linear. Hash ordering
    * keeps the set deterministic, spread over the id space, and exactly
    * oracle-replayable (ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT k).
    * Returned as a driver-side list — a constant-size TakeOrdered over
    * ids only (never corpus-proportional, the sanctioned bounded-collect
    * shape) — so the resulting `isInCollection` predicate survives every
    * operator's internal projection and pushes into the scan. */
  def boundedProbeIds(emb: DataFrame, nProbes: Int,
                      idCol: String = "vec_id"): Seq[Long] =
    emb.select(col(idCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(nProbes)
      .collect().map(_.getLong(0)).toSeq

  /** For each probe row, the exact top-k cosine neighbors.
    * Output: probe_id, neighbor_id, label, cos (rounded 6). */
  def bruteForceTopK(emb: DataFrame, probePred: Column, k: Int): DataFrame = {
    // toDF breaks attribute lineage so the self-join isn't flagged ambiguous
    val probes = emb.filter(probePred)
      .select(col("vec_id"), col("embedding")).toDF("probe_id", "probe_emb")
    val scored = emb.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("label"),
        cosineSim(col("probe_emb"), col("embedding")).as("cos_raw"))
    // Custom TopKPerKey plan (partial heaps → exchange → final): only
    // ≤ k rows per probe per map partition ever reach the shuffle — no
    // global sort of the candidate space. The rank window afterwards runs
    // over ≤ k·|probes| rows.
    val topk = graft.plans.TopK.perKey(scored, Seq(scored("probe_id")),
      Seq(scored("cos_raw").desc, scored("neighbor_id")), k)
    val w = Window.partitionBy("probe_id").orderBy(col("cos_raw").desc, col("neighbor_id"))
    topk.withColumn("rk", row_number().over(w))
      .select(col("probe_id"), col("neighbor_id"), col("label"),
        round(col("cos_raw"), 6).as("cos"), col("rk"))
  }

  /** Shared cell-restricted search phase (used by the LSH and IVF paths):
    * `corpus` must carry vec_id, embedding, and a partition-key column
    * `cellCol`; probes are the corpus rows matching `probePred`, broadcast
    * and equi-joined on the cell so candidate volume is Σ_cell
    * |corpus_cell|·|probes_cell|. Per-probe top-k via the two-phase
    * TopKPerKey (bounded heaps, no global sort); the rank window runs over
    * ≤ k·|probes| rows. Contract: `probePred` must select a BOUNDED probe
    * set (a fixed query workload, not a corpus fraction) — the single-cell
    * probe table is broadcast; the multi-probe/nprobe variants, whose probe
    * tables are exploded and corpus-proportional, leave the join strategy
    * to AQE instead. Output: probe_id, neighbor_id, <cellCol>, cos, rk. */
  def searchByCell(corpus: DataFrame, cellCol: String,
                   probePred: Column, k: Int): DataFrame = {
    val probes = corpus.filter(probePred)
      .select(col("vec_id"), col("embedding"), col(cellCol))
      .toDF("probe_id", "probe_emb", cellCol)
    val cands = corpus
      .join(broadcast(probes), Seq(cellCol))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col(cellCol),
        cosineSim(col("probe_emb"), col("embedding")).as("cos_raw"))
    val topk = graft.plans.TopK.perKey(cands, Seq(cands("probe_id")),
      Seq(cands("cos_raw").desc, cands("neighbor_id")), k)
    val w = Window.partitionBy("probe_id").orderBy(col("cos_raw").desc, col("neighbor_id"))
    topk.withColumn("rk", row_number().over(w))
      .select(col("probe_id"), col("neighbor_id"), col(cellCol),
        round(col("cos_raw"), 6).as("cos"), col("rk"))
  }

  /** LSH-bucketed approximate top-k: candidates restricted to the probe's
    * sign-bit bucket. Output: probe_id, neighbor_id, bucket, cos, rk. */
  def lshBucketed(emb: DataFrame, probePred: Column, k: Int,
                  nBits: Int, dim: Int): DataFrame = {
    val bucketed = emb
      .select(col("vec_id"), col("embedding"),
        lshBucket(col("embedding"), nBits, dim).as("bucket"))
    searchByCell(bucketed, "bucket", probePred, k)
  }

  /** Multi-probe LSH top-k: like `lshBucketed`, but each probe searches
    * its own bucket PLUS every bucket within Hamming distance `radius`
    * of it (≤ `radius` hyperplane signs flipped) — the standard recall
    * lever that does NOT lower the bit count: near neighbors that fall
    * just across a few hyperplanes become reachable, candidate volume
    * grows only C(nBits, ≤radius)×probes-side (the corpus is never
    * re-bucketed, and each corpus vector still lives in exactly one
    * bucket, so no candidate is produced twice). Recall ≥ single-probe
    * at equal nBits by construction (probe-set ⊇ {own bucket});
    * OperatorsSpec measures the strict improvement. radius = 1 is the
    * classic one-flip form; the x55 panel runs radius 2, which is what
    * clears the ≥ 0.6 production recall bound on the unbiased
    * hash-ordered probe set (τ-close pairs disagree on ~0.35·nBits sign
    * bits in expectation — the same geometry as the hashed-text family's
    * radius dial). Output: probe_id, neighbor_id, bucket, cos, rk. */
  def lshBucketedMultiProbe(emb: DataFrame, probePred: Column, k: Int,
                            nBits: Int, dim: Int, radius: Int = 1): DataFrame = {
    val bucketed = emb
      .select(col("vec_id"), col("embedding"),
        lshBucket(col("embedding"), nBits, dim).as("bucket"))
    // shared mask enumerator with the hashed-text family (0-mask included)
    val probeBuckets = TextAnalysis.hammingMasks(nBits, radius)
      .map(m => col("bucket").bitwiseXOR(lit(m)))
    val probes = bucketed.filter(probePred)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"),
        explode(array(probeBuckets: _*)).as("bucket"))
    // No broadcast hint: the probe table is |probes|·(nBits+1) rows of full
    // embedding vectors — corpus-proportional when probePred selects a
    // fraction of the corpus. AQE picks broadcast at runtime when the
    // measured size is under the threshold; a forced hint would be a
    // driver OOM at scale (same defect class as a forced dim broadcast).
    val cands = bucketed
      .join(probes, Seq("bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("bucket"),
        cosineSim(col("probe_emb"), col("embedding")).as("cos_raw"))
    val topk = graft.plans.TopK.perKey(cands, Seq(cands("probe_id")),
      Seq(cands("cos_raw").desc, cands("neighbor_id")), k)
    val w = Window.partitionBy("probe_id").orderBy(col("cos_raw").desc, col("neighbor_id"))
    topk.withColumn("rk", row_number().over(w))
      .select(col("probe_id"), col("neighbor_id"), col("bucket"),
        round(col("cos_raw"), 6).as("cos"), col("rk"))
  }

  /** `lshBucketedMultiProbe` with the hyperplane count derived FROM the
    * corpus size (`autoBits`, the x46 lever) — the fix for the THIRD
    * corpus-proportional parameter the 100× scale probe caught: at fixed
    * nBits the multi-probe candidate volume is (nBits+1)·|probes|·
    * |corpus|/2^nBits, quadratic in the corpus (measured 46× wall at
    * 100× data); with occupancy-bounded bits the per-bucket population —
    * and so the candidate volume per probe — stays constant. The probe
    * list masks to the active bit count (XOR only the first nbits
    * planes). Output: probe_id, neighbor_id, bucket, cos, rk. */
  def lshBucketedMultiProbeAuto(emb: DataFrame, probePred: Column, k: Int,
                                targetOcc: Int, maxBits: Int, dim: Int): DataFrame = {
    val n = emb.agg(count(lit(1)).as("__n"))
    val nbits = autoBits(col("__n"), targetOcc, maxBits)
    val bucketed = emb.crossJoin(broadcast(n))
      .select(col("vec_id"), col("embedding"),
        lshBucketMasked(col("embedding"), nbits, maxBits, dim).as("bucket"),
        nbits.as("nbits"))
    val probeBuckets = array((col("bucket") +:
      (0 until maxBits).map(j =>
        when(lit(j) < col("nbits"), col("bucket").bitwiseXOR(lit(1 << j)))
          .otherwise(lit(-1)))): _*)
    val probes = bucketed.filter(probePred)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"),
        explode(filter(probeBuckets, b => b >= 0)).as("bucket"))
    // No broadcast hint (see lshBucketedMultiProbe): the exploded probe
    // table is corpus-proportional; AQE decides at runtime from its
    // measured size.
    val cands = bucketed
      .join(probes, Seq("bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("bucket"),
        cosineSim(col("probe_emb"), col("embedding")).as("cos_raw"))
    val topk = graft.plans.TopK.perKey(cands, Seq(cands("probe_id")),
      Seq(cands("cos_raw").desc, cands("neighbor_id")), k)
    val w = Window.partitionBy("probe_id").orderBy(col("cos_raw").desc, col("neighbor_id"))
    topk.withColumn("rk", row_number().over(w))
      .select(col("probe_id"), col("neighbor_id"), col("bucket"),
        round(col("cos_raw"), 6).as("cos"), col("rk"))
  }

  /** IVF-style approximate top-k: a broadcast codebook (corpus rows
    * matching `centPred` — standing in for trained centroids; at scale a
    * fixed table, so assignment is |corpus|·C, linear) assigns each vector
    * to its max-cosine cell via TopKPerKey k=1, then the search joins
    * probes to their cell only. Output: probe_id, neighbor_id, cell, cos,
    * rk. */
  def ivfTopK(emb: DataFrame, centPred: Column, probePred: Column,
              k: Int): DataFrame = {
    // zero-shuffle argmax fold over the packed broadcast codebook (the
    // assignCells k=1 shape; bit-identical ordering and cosine)
    val cb = graft.core.Caches.scoped(
      emb.filter(centPred)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
        .agg(collect_list(struct(col("cent_id"), col("cvec"))).as("__cb")))
    // cell table feeds both the probe set and the search side → scoped
    // cache (released by the harness after the query materializes)
    val cells = graft.core.Caches.scoped(
      emb.select("vec_id", "embedding")
        .crossJoin(broadcast(cb.filter(size(col("__cb")) > 0)))
        .select(col("vec_id"), col("embedding"),
          argmaxCosine(col("embedding"), col("__cb"))
            .getField("cell").as("cell")))
    searchByCell(cells, "cell", probePred, k)
  }

  /** End-to-end TRAINED IVF search — the composition x47's codebook exists
    * for: `kmeansCodebook` (Lloyd, deterministic) → `assignCells` (argmax
    * cosine vs the broadcast codebook) → `searchByCell` (probes equi-joined
    * to their cell). Runs on the 6-decimal-quantized vectors throughout, so
    * the DuckDB oracle replays training AND search bit-for-bit (same
    * cross-engine contract as `kmeansCodebook`; the codegen'd cosine now
    * reads double arrays natively). Scale shape: training is linear in the
    * corpus (C = maxCents bounded), assignment is one broadcast-scored pass
    * + TopKPerKey k=1, search is the cell equi-join — never all-pairs.
    * Output: probe_id, neighbor_id, cell, cos, rk. */
  def ivfTrainedTopK(emb: DataFrame, initPred: Column, iters: Int,
                     probePred: Column, k: Int, maxCents: Int = 32,
                     nProbeCells: Int = 1): DataFrame = {
    val e = emb.select(col("vec_id"), quantize(col("embedding")).as("vq"))
    val cb = graft.core.Caches.scoped(kmeansCodebook(emb, initPred, iters, maxCents))
    if (nProbeCells == 1) {
      // the assigned-cell table feeds the probe set AND the search side
      val cells = graft.core.Caches.scoped(
        assignCells(e, cb).select(col("vec_id"), col("vq").as("embedding"), col("cell")))
      searchByCell(cells, "cell", probePred, k)
    } else {
      // nprobe > 1 — the IVF recall lever (the analogue of LSH
      // multi-probe): each PROBE searches its nProbeCells nearest cells;
      // the corpus stays single-cell, so no candidate is produced twice
      // and candidate volume grows only nProbeCells× on the probe side.
      val cells = assignCells(e, cb).select(col("vec_id"), col("vq"), col("cell"))
      val probes = assignCells(e.filter(probePred), cb, k = nProbeCells)
        .select(col("vec_id").as("probe_id"), col("vq").as("probe_emb"), col("cell"))
      // No broadcast hint: |probes|·nProbeCells rows of full vectors is
      // corpus-proportional under a fractional probePred; AQE broadcasts
      // at runtime only when the measured size allows.
      val cands = cells
        .join(probes, Seq("cell"))
        .filter(col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("cell"),
          cosineSim(col("probe_emb"), col("vq")).as("cos_raw"))
      val topk = graft.plans.TopK.perKey(cands, Seq(cands("probe_id")),
        Seq(cands("cos_raw").desc, cands("neighbor_id")), k)
      val w = Window.partitionBy("probe_id").orderBy(col("cos_raw").desc, col("neighbor_id"))
      topk.withColumn("rk", row_number().over(w))
        .select(col("probe_id"), col("neighbor_id"), col("cell"),
          round(col("cos_raw"), 6).as("cos"), col("rk"))
    }
  }

  /** Recall@k grading core: each (method, approx-result, bound) is scored
    * against the exact `bruteForceTopK` on the SAME probe set. recall =
    * |approx top-k ∩ exact top-k| / (k·probes), computed as one integer
    * hit-count per method and a single double division (deterministic
    * cross-engine — no float aggregation order). `recall_ok` applies the
    * per-method bound the way the sketch queries (q08b/x35) self-grade: a
    * bucketing regression (too many hyperplanes, degenerate codebook) flips
    * the flag even though both sides still "run".
    * Output: one row per method — method, n_probes, total_hits, recall,
    * recall_ok. */
  def recallForMethods(emb: DataFrame, probePred: Column, k: Int,
                       methods: Seq[(String, DataFrame, Double)]): DataFrame = {
    // exact top-k feeds every method's intersection join → scoped cache
    val exact = graft.core.Caches.scoped(
      bruteForceTopK(emb, probePred, k).select("probe_id", "neighbor_id"))
    val nProbes = emb.filter(probePred).select(count(lit(1)).as("n_probes"))
    recallPanel(nProbes, k, methods.map { case (m, a, b) => (m, a, exact, b) })
  }

  /** [[recallForMethods]] generalized to a PER-METHOD exact reference:
    * the quantized panel (x88) decomposes its loss by grading the int8
    * brute force against FLOAT truth (pure quantization error) and the
    * int8 IVF against INTEGER truth (pure bucketing error) — one shared
    * reference could not express that. */
  def recallPanel(nProbes: DataFrame, k: Int,
                  methods: Seq[(String, DataFrame, DataFrame, Double)]): DataFrame =
    methods.map { case (method, approx, exact, bound) =>
      approx.select("probe_id", "neighbor_id")
        .join(exact.select("probe_id", "neighbor_id"),
          Seq("probe_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("total_hits"))
        .crossJoin(broadcast(nProbes))
        .select(
          lit(method).as("method"), col("n_probes"), col("total_hits"),
          (col("total_hits").cast("double") / (col("n_probes") * k)).as("recall"))
        .withColumn("recall_ok", when(col("recall") >= bound, 1).otherwise(0))
    }.reduce(_.unionAll(_))

  /** Self-graded ANN quality of the two baseline approximate paths
    * (`lshBucketed`, `ivfTopK`) — see `recallForMethods`; x55 grades the
    * production paths (multi-probe, trained IVF) at a higher bound. */
  def recallAtK(emb: DataFrame, centPred: Column, probePred: Column, k: Int,
                nBits: Int, dim: Int, bound: Double): DataFrame =
    recallForMethods(emb, probePred, k, Seq(
      ("lsh", lshBucketed(emb, probePred, k, nBits, dim), bound),
      ("ivf", ivfTopK(emb, centPred, probePred, k), bound)))

  /** Embedding near-duplicate pairs, bucketed (the 100 TB shape): sign-bit
    * LSH buckets turn the all-pairs space into a per-bucket equi-join, then
    * the exact cosine filters candidates. Each vector lands in exactly one
    * bucket, so no pair is emitted twice and no O(n²) space is ever
    * materialized — candidate volume is Σ_bucket |bucket|². Approximate by
    * construction: pairs whose hyperplane signs differ are never compared
    * (`nearDupPairs` below is the exact oracle for recall specs). */
  def nearDupPairsBucketed(emb: DataFrame, threshold: Double,
                           nBits: Int, dim: Int): DataFrame =
    bucketSelfJoinPairs(
      emb.select(col("vec_id"), col("embedding"),
        lshBucket(col("embedding"), nBits, dim).as("bucket")),
      threshold)

  /** `nearDupPairsBucketed` with the hyperplane count derived FROM the
    * corpus size (`VectorFunctions.autoBits`): expected bucket occupancy
    * stays ≤ targetOcc as the corpus grows, so candidate volume scales
    * ~linearly instead of quadratically — the fix for the measured 5.2×
    * growth of the fixed-bit variant at 10× data (SCALE.md). The count is
    * a scalar agg broadcast back into the plan (no driver action, no
    * collect). */
  def nearDupPairsAutoBucketed(emb: DataFrame, threshold: Double,
                               targetOcc: Int, maxBits: Int, dim: Int): DataFrame = {
    val n = emb.agg(count(lit(1)).as("__n"))
    bucketSelfJoinPairs(
      emb.crossJoin(broadcast(n))
        .select(col("vec_id"), col("embedding"),
          lshBucketMasked(col("embedding"),
            autoBits(col("__n"), targetOcc, maxBits), maxBits, dim).as("bucket")),
      threshold)
  }

  /** K-means (Lloyd) codebook training for IVF — the "trained centroids"
    * the x34 skeleton stood in for. Deterministic and CROSS-ENGINE EXACT
    * by construction, so DuckDB can replay every iteration bit-for-bit:
    *
    *  - all vectors are quantized to 6 decimals up front (a double within
    *    ~1e-22 of a 6-decimal value casts to the same DECIMAL(18,8) in
    *    both engines regardless of rounding mode — unquantized doubles
    *    would not);
    *  - centroid means are exact DECIMAL(18,8) sums divided once as
    *    doubles (aggregation order cannot perturb them), then re-quantized
    *    to 6 decimals — the next iteration's inputs are again exact;
    *  - assignment is argmax cosine with cent_id tie-break; cosines of
    *    bit-identical inputs are bit-identical (row-level IEEE fold).
    *
    * Scale shape: centroids are a broadcast (C rows); each iteration is
    * one |corpus|·C scored pass + TopKPerKey k=1 + a (cell, dim)
    * aggregation — linear in the corpus BECAUSE C is bounded: the init
    * takes the `maxCents` LOWEST vec_ids matching `initPred`
    * (deterministic TakeOrdered), never a corpus fraction. The scale
    * probe measured the unbounded form at 8.2× wall for 10× data
    * (corpus-proportional C ⇒ quadratic assignment) — the cap restores
    * ~linear growth (SCALE.md). Empty cells drop out (standard Lloyd
    * behavior), identically in the oracle.
    * Output: cent_id (cell key), cv (trained centroid, array<double>). */
  def kmeansCodebook(emb: DataFrame, initPred: Column, iters: Int,
                     maxCents: Int = 32, dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val e = emb.select(col("vec_id"), quantize(col("embedding")).as("vq"))
    var cents = e.filter(initPred)
      .orderBy("vec_id").limit(maxCents)
      .select(col("vec_id").as("cent_id"), col("vq").as("cv"))
    for (_ <- 1 to iters) {
      // Per-iteration centroid update as ONE cell-keyed aggregation of
      // `dim` exact decimal component sums + a count (codegen'd partial →
      // final HashAggregate: the exchange carries one dim-wide partial
      // row per (cell, map task), never corpus rows). The earlier
      // posexplode form blew each row up ×dim, shuffled (cell, d) keys,
      // then paid a SECOND exchange + ObjectHashAggregate to regroup the
      // components into the array (guide §2.3 aggregate before you
      // shuffle / §2.4 share one exchange). Same math exactly: decimal
      // sums are order-insensitive, divided once as doubles, round-6.
      val sums = (0 until dim).map(j =>
        sum(element_at(col("vq"), j + 1).cast(DecimalType(18, 8))).as(s"__s$j"))
      val comp = assignCells(e, cents)
        .groupBy(col("cell").as("cent_id"))
        .agg(count(lit(1)).as("__n"), sums: _*)
      cents = comp.select(col("cent_id"),
        array((0 until dim).map(j =>
          round(col(s"__s$j").cast("double") / col("__n"), 6)): _*).as("cv"))
    }
    cents
  }

  /** Per-vector k nearest (max-cosine) cells for quantized vectors against
    * a broadcast codebook, via TopKPerKey (k=1 → the standard assignment;
    * k>1 → the probe side of an nprobe search). Output: vec_id, vq, cell,
    * a_cos — one row per (vector, assigned cell). */
  def assignCells(e: DataFrame, cents: DataFrame, k: Int = 1): DataFrame =
    if (k == 1) {
      // ZERO-SHUFFLE argmax fold (the r17 "revisit with a native codegen
      // argmax" note, done): the codebook is packed into ONE broadcast
      // row and each vector computes its argmax-cosine cell in a single
      // codegen'd expression — no ×C row expansion, no TopKPerKey heap
      // exchange. `ArgmaxCosine` reproduces the TopKPerKey(k=1) ordering
      // (a_cos DESC, cent_id ASC) with the bit-identical CosineSimilarity
      // fold per pair, so every assignment and a_cos is unchanged
      // (oracle-hash-confirmed family-wide). The empty-codebook guard
      // sits on the 1-row broadcast side (size > 0), mirroring the empty
      // crossJoin — never a per-corpus-row filter.
      val cb = graft.core.Caches.scoped(
        cents.agg(collect_list(struct(col("cent_id"), col("cv"))).as("__cb")))
      e.crossJoin(broadcast(cb.filter(size(col("__cb")) > 0)))
        .select(col("vec_id"), col("vq"),
          argmaxCosine(col("vq"), col("__cb")).as("__am"))
        .select(col("vec_id"), col("vq"),
          col("__am").getField("cell").as("cell"),
          col("__am").getField("a_cos").as("a_cos"))
    } else {
      // k > 1 (the nprobe probe side): the ×C scored expansion through
      // the two-phase TopKPerKey heap remains the right shape.
      val scored = e.crossJoin(broadcast(cents.select(col("cent_id"), col("cv"))))
        .select(col("vec_id"), col("vq"), col("cent_id"),
          cosineSim(col("vq"), col("cv")).as("a_cos"))
      graft.plans.TopK.perKey(scored, Seq(scored("vec_id")),
          Seq(scored("a_cos").desc, scored("cent_id")), k)
        .select(col("vec_id"), col("vq"), col("cent_id").as("cell"), col("a_cos"))
    }

  /** 6-decimal quantization of a float/double array (see kmeansCodebook). */
  def quantize(v: Column): Column =
    transform(v, x => round(x.cast("double"), 6))

  /** Shared tail: per-bucket self-join (a < b) + exact-cosine filter. */
  private def bucketSelfJoinPairs(bucketed: DataFrame, threshold: Double): DataFrame = {
    val a = bucketed.toDF("vec_a", "emb_a", "bucket")
    val b = bucketed.toDF("vec_b", "emb_b", "bucket")
    a.join(b, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        cosineSim(col("emb_a"), col("emb_b")).as("cos_raw"))
      .filter(col("cos_raw") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos_raw"), 6).as("cos"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold over all (a<b)
    * pairs. Exact/quadratic — the test oracle for `nearDupPairsBucketed`;
    * at scale always use the bucketed form. */
  def nearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val a = emb.select(col("vec_id"), col("embedding")).toDF("vec_a", "emb_a")
    val b = emb.select(col("vec_id"), col("embedding")).toDF("vec_b", "emb_b")
    a.crossJoin(b)
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        cosineSim(col("emb_a"), col("emb_b")).as("cos_raw"))
      .filter(col("cos_raw") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos_raw"), 6).as("cos"))
  }
}
