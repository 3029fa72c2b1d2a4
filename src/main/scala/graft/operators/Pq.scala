package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.dotLong

/** Product Quantization (Jégou, Douze, Schmid 2011) — the vector
  * compression step of the ANN family that int8 symmetric quantization
  * (x67/x68) and IVF (x34/x54) do not cover: the 100 TB story for
  * similarity search is codes of a few BYTES per vector, scanned with
  * integer table lookups, never the float embeddings.
  *
  * Capability extends the reference's arbitrary-binary payload scope
  * (`/root/reference/README.md:18-22`) the same way the rest of the
  * embedding family does; nothing here ports reference code.
  *
  * Determinism contract (cross-engine exact, like the k-means family at
  * `Similarity.kmeansCodebook`): every vector is lifted ONCE to integer
  * micro-units (`floor(x·1e6 + 0.5)` per dimension — the x67 convention),
  * and every quantity after that is integer arithmetic:
  *
  *  - subspace split: dim-D vector → m contiguous subvectors of D/m;
  *  - per-subspace codebooks: Lloyd rounds where assignment is argmin
  *    INTEGER squared L2 (tie → smaller cent_id) and the update is
  *    per-dimension `floor(sum/count + 0.5)` — one IEEE double division
  *    of exact BIGINTs, deterministic in both engines;
  *  - encoding: per (vector, subspace) the argmin cell — m small ids per
  *    vector, the PQ code;
  *  - ADC search: a probe precomputes its distance LUT (m·C integer
  *    entries, one per (subspace, cell)); the approximate distance to a
  *    corpus vector is the SUM of m LUT hits selected by the vector's
  *    code — never a float op against the corpus embedding.
  *
  * Scale shape (SCALE.md row "PQ-ADC"): codebooks are C·m rows —
  * broadcast; training and encoding are one linear pass per Lloyd round
  * (corpus × C·m bounded integer dots); the LUT is |probes|·m·C rows —
  * broadcast; the search scans the CODES table (m short ids ≈ bytes per
  * vector — the corpus-side state, like the x81 code store, ~3 orders
  * smaller than the embeddings), partial-aggregates the per-subspace
  * hits map-side to |probes|·n rows keyed by (probe, vec), and bounds
  * the result with the two-phase TopKPerKey. The embeddings themselves
  * are read only by training/encoding — a probe batch never rescans
  * them.
  */
object Pq {

  /** Integer micro-unit lift of one double, the x67 convention —
    * `floor(x·1e6 + 0.5)`; exact in both engines. */
  private def micro(x: Column): Column =
    floor(x * lit(1000000d) + lit(0.5d)).cast("long")

  /** Subvector table: one row per (vector, subspace) with the micro-lifted
    * contiguous slice. Output: vec_id, sub (0-based), svm array<long>. */
  def subvectors(emb: DataFrame, m: Int, dim: Int,
                 vecCol: String = "embedding"): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    emb.select(col("vec_id"),
        explode(transform(sequence(lit(0), lit(m - 1)), s =>
          struct(s.as("sub"),
            transform(slice(col(vecCol), s * subDim + lit(1), lit(subDim)),
              x => micro(x.cast("double"))).as("svm")))).as("sv"))
      .select(col("vec_id"), col("sv.sub").as("sub"), col("sv.svm").as("svm"))
  }

  /** Exact integer squared L2 between two micro arrays via three
    * codegen'd BIGINT dots: |a−b|² = a·a + b·b − 2·a·b. */
  def l2sq(a: Column, b: Column): Column =
    dotLong(a, a) + dotLong(b, b) - lit(2L) * dotLong(a, b)

  /** The deterministic BOUNDED training/codebook sample: subvectors of
    * the `nCents` corpus ids with the smallest (md5(id), id) — the same
    * hash-ordered bound as the recall-panel probes, so codebook size is
    * a constant, never a corpus fraction (the x47 lesson: proportional C
    * makes assignment quadratic). cent_id = the sample's vec_id. */
  def sampleCodebooks(sv: DataFrame, nCents: Int): DataFrame = {
    val sample = sv.select(col("vec_id")).distinct()
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(nCents)
    sv.join(broadcast(sample), Seq("vec_id"))
      .select(col("sub"), col("vec_id").as("cent_id"), col("svm").as("cvm"))
  }

  /** Micro-lifted full vectors: (vec_id, vm array<long>). */
  def microVectors(emb: DataFrame, vecCol: String = "embedding"): DataFrame =
    emb.select(col("vec_id"),
      transform(col(vecCol), x => micro(x.cast("double"))).as("vm"))

  /** Sylvester–Hadamard rotation of a micro vector: rm[i] = Σ_j
    * (−1)^popcount(i AND j) · vm[j] — an INTEGER orthogonal-up-to-scale
    * transform (Hᵀ·H = dim·I, so ‖Ha − Hb‖² = dim·‖a − b‖² exactly and
    * the L2 ranking is provably unchanged). This is the structured
    * pre-rotation of the OPQ family (energy spread across PQ subspaces
    * without training a rotation); `dim` must be a power of two. */
  def hadamardRotate(vm: Column, dim: Int): Column = {
    require((dim & (dim - 1)) == 0, s"Hadamard needs a power of two, got $dim")
    // Native codegen'd fast Walsh–Hadamard ([[graft.functions
    // .HadamardRotateLong]]): the HOF form was an O(dim²) interpreted
    // fold — 4096 closure-framed element_at probes per row at dim 64.
    // Provably bit-identical (exact BIGINT ring arithmetic; the spec
    // cross-checks against this HOF reference).
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.HadamardRotateLong(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(vm), dim))
  }

  /** Reference HOF formulation of [[hadamardRotate]] (CodegenFallback;
    * kept for the property cross-check). */
  def hadamardRotateHof(vm: Column, dim: Int): Column = {
    require((dim & (dim - 1)) == 0, s"Hadamard needs a power of two, got $dim")
    transform(sequence(lit(0), lit(dim - 1)), i =>
      aggregate(sequence(lit(0), lit(dim - 1)), lit(0L), (acc, j) =>
        acc + when(bit_count(i.bitwiseAND(j)) % 2 === 0,
          element_at(vm, (j + 1).cast("int")))
          .otherwise(-element_at(vm, (j + 1).cast("int")))))
  }

  /** Subvector split of an ALREADY-micro long-array column — the seam
    * that lets the PQ stack run on transformed vectors (e.g. the
    * Hadamard rotation) without a second lift. */
  def subvectorsMicro(mv: DataFrame, m: Int, dim: Int,
                      microCol: String = "vm"): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    mv.select(col("vec_id"),
        explode(transform(sequence(lit(0), lit(m - 1)), s =>
          struct(s.as("sub"),
            slice(col(microCol), s * subDim + lit(1), lit(subDim)).as("svm"))))
          .as("sv"))
      .select(col("vec_id"), col("sv.sub").as("sub"), col("sv.svm").as("svm"))
  }

  /** [[trainCodebooks]] over a prepared subvector frame. `subDim` (the
    * static svm length, when the caller knows it) selects the
    * one-exchange Lloyd update: one (sub, cell)-keyed codegen
    * HashAggregate of `subDim` exact BIGINT component sums + a count,
    * array rebuilt in a Project — the same per-component
    * `floor(sum/count + 0.5)` on the same exact integers (BIGINT sums
    * are order-insensitive ⇒ bit-identical codebooks). The legacy
    * `subDim = -1` path (kept for callers that cannot know the length
    * statically) pays posexplode ×subDim, a (sub, cell, d)-keyed
    * exchange, AND a second exchange + ObjectHashAggregate
    * (collect_list) to regroup the array — the exact two-exchange
    * anti-pattern r17 removed from `Similarity.kmeansCodebook`
    * (guide §2.3 aggregate before you shuffle / §2.4 share one
    * exchange). Contract of the fast path: every svm has length
    * exactly `subDim` (true by construction for every subvector
    * split here — element_at past the end would NULL the component). */
  def trainCodebooksSv(svIn: DataFrame, nCents: Int, iters: Int,
                       subDim: Int = -1): DataFrame = {
    val sv = graft.core.Caches.scoped(svIn)
    var books = sampleCodebooks(sv, nCents)
    for (_ <- 1 to iters) {
      books =
        if (subDim >= 1) {
          val sums = (0 until subDim).map(j =>
            sum(element_at(col("svm"), j + 1)).as(s"__s$j"))
          assign(sv, books)
            .groupBy(col("sub"), col("cell").as("cent_id"))
            .agg(count(lit(1)).as("__n"), sums: _*)
            .select(col("sub"), col("cent_id"),
              array((0 until subDim).map(j =>
                floor(col(s"__s$j").cast("double") / col("__n") + lit(0.5d))
                  .cast("long")): _*).as("cvm"))
        } else {
          assign(sv, books)
            .select(col("sub"), col("cell"), posexplode(col("svm")).as(Seq("d", "x")))
            .groupBy("sub", "cell", "d")
            .agg(floor(sum(col("x")).cast("double") / count(lit(1)) + lit(0.5d))
              .cast("long").as("cm"))
            .groupBy(col("sub"), col("cell").as("cent_id"))
            .agg(transform(array_sort(collect_list(struct(col("d"), col("cm")))),
              s => s.getField("cm")).as("cvm"))
        }
    }
    books
  }

  /** Exact integer-L2 brute-force top-k over prepared micro vectors. */
  def l2TopKMicro(mv: DataFrame, probeIds: Seq[Long], k: Int): DataFrame = {
    val probes = mv.filter(col("vec_id").isInCollection(probeIds))
      .toDF("probe_id", "pm")
    val scored = mv.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        l2sq(col("pm"), col("vm")).as("d2"))
    val topk = graft.plans.TopK.perKey(scored, Seq(scored("probe_id")),
      Seq(scored("d2"), scored("neighbor_id")), k)
    val w = Window.partitionBy("probe_id").orderBy(col("d2"), col("neighbor_id"))
    topk.withColumn("rk", row_number().over(w))
      .select(col("probe_id"), col("neighbor_id"), col("d2"), col("rk"))
  }

  /** ROTATED-PQ recall panel: the full trained-ADC + exact-re-rank
    * pipeline on Hadamard-rotated vectors, graded against the exact-L2
    * truth on the SAME rotated vectors (provably the identical ranking
    * as unrotated truth — ‖Ha−Hb‖² = dim·‖a−b‖²; spec-pinned). The
    * rotation spreads per-dimension energy across all m subspaces, the
    * standard fix when contiguous dimensions are correlated. Output:
    * the x43-shaped panel rows. */
  def rotatedAdcRecallPanel(emb: DataFrame, m: Int, dim: Int, nCents: Int,
                            nProbes: Int, k: Int, kShort: Int,
                            rawBound: Double, rerankBound: Double,
                            vecCol: String = "embedding"): DataFrame = {
    val probeIds = Similarity.boundedProbeIds(emb, nProbes)
    val mv = graft.core.Caches.scoped(
      microVectors(emb, vecCol)
        .select(col("vec_id"), hadamardRotate(col("vm"), dim).as("vm")))
    val sv = subvectorsMicro(mv, m, dim)
    val books = trainCodebooksSv(sv, nCents, iters = 1, subDim = dim / m)
    val codes = assign(sv, books).select(col("vec_id"), col("sub"),
      col("cell"), col("d2"))
    val probeSv = sv.filter(col("vec_id").isInCollection(probeIds))
    val raw = adcTopKFromCodes(probeSv, codes, books, probeIds, k)
    val shortl = adcTopKFromCodes(probeSv, codes, books, probeIds, kShort)
      .select("probe_id", "neighbor_id")
    val probes = mv.filter(col("vec_id").isInCollection(probeIds))
      .toDF("probe_id", "pm")
    val reranked = {
      val scored = mv
        .join(broadcast(shortl), mv("vec_id") === shortl("neighbor_id"))
        .join(broadcast(probes), Seq("probe_id"))
        .select(col("probe_id"), col("neighbor_id"),
          l2sq(col("pm"), col("vm")).as("d2"))
      val w = Window.partitionBy("probe_id")
        .orderBy(col("d2"), col("neighbor_id"))
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
    }
    val exact = graft.core.Caches.scoped(
      l2TopKMicro(mv, probeIds, k).select("probe_id", "neighbor_id"))
    val nP = emb.filter(col("vec_id").isInCollection(probeIds))
      .select(count(lit(1)).as("n_probes"))
    Similarity.recallPanel(nP, k, Seq(
      ("pq_rot_rerank", reranked, exact, rerankBound),
      ("pq_rot_trained", raw, exact, rawBound)))
  }

  /** Per-(vector, subspace) nearest cell against broadcast codebooks:
    * argmin integer L2², tie → smaller cent_id, via the two-phase
    * TopKPerKey (k=1). Output: vec_id, sub, svm, cell, d2. */
  def assign(sv: DataFrame, books: DataFrame): DataFrame = {
    val scored = sv.join(broadcast(books), Seq("sub"))
      .select(col("vec_id"), col("sub"), col("svm"), col("cent_id"),
        l2sq(col("svm"), col("cvm")).as("d2"))
    graft.plans.TopK.perKey(scored, Seq(scored("vec_id"), scored("sub")),
        Seq(scored("d2"), scored("cent_id")), 1)
      .select(col("vec_id"), col("sub"), col("svm"),
        col("cent_id").as("cell"), col("d2"))
  }

  /** Per-subspace Lloyd codebook training over the micro-integer
    * subvectors: `iters` rounds of assign → per-(sub, cell, dim)
    * integer-mean update (`floor(sum/count + 0.5)` — exact BIGINT sum,
    * one deterministic double division). All m subspaces train in the
    * SAME pass — the subspace id is just another grouping key, so the
    * per-round cost is one corpus-linear scored scan + one bounded
    * aggregation, identical to one k-means round. Empty cells drop
    * (standard Lloyd), identically in the oracle.
    * Output: sub, cent_id, cvm array<long>. */
  def trainCodebooks(emb: DataFrame, m: Int, dim: Int, nCents: Int,
                     iters: Int, vecCol: String = "embedding"): DataFrame =
    trainCodebooksSv(subvectors(emb, m, dim, vecCol), nCents, iters,
      subDim = dim / m)

  /** PQ encoding: each vector's m-cell code, one row per (vec_id, sub)
    * with the chosen cell and its exact residual d2 — the table a code
    * store would persist (≈ m small ids per vector; the embeddings are
    * not needed again after this pass). */
  def encode(emb: DataFrame, books: DataFrame, m: Int, dim: Int,
             vecCol: String = "embedding"): DataFrame =
    assign(subvectors(emb, m, dim, vecCol), books)
      .select(col("vec_id"), col("sub"), col("cell"), col("d2"))

  /** Asymmetric-distance top-k: probes (a BOUNDED id set) compute their
    * exact integer LUT against the broadcast codebooks; corpus CODES
    * join the broadcast LUT on (sub, cell) and partial-aggregate the m
    * per-subspace hits into the ADC distance keyed by (probe, vec) —
    * map-side combine collapses the m rows before the exchange, so the
    * shuffle carries |probes|·n rows, and TopKPerKey bounds the output.
    * Output: probe_id, neighbor_id, adc_d2, rk. */
  def adcTopK(emb: DataFrame, books: DataFrame, probeIds: Seq[Long], k: Int,
              m: Int, dim: Int, vecCol: String = "embedding"): DataFrame = {
    val codes = encode(emb, books, m, dim, vecCol)
    adcTopKFromCodes(subvectors(emb, m, dim, vecCol), codes, books,
      probeIds, k)
  }

  /** [[adcTopK]] split at the production seam: `codes` is the persisted
    * corpus state; only the PROBES' subvectors are recomputed. */
  def adcTopKFromCodes(probeSv: DataFrame, codes: DataFrame,
                       books: DataFrame, probeIds: Seq[Long],
                       k: Int): DataFrame = {
    val lut = probeSv
      .filter(col("vec_id").isInCollection(probeIds))
      .toDF("probe_id", "sub", "pvm")
      .join(broadcast(books), Seq("sub"))
      .select(col("probe_id"), col("sub"), col("cent_id").as("cell"),
        l2sq(col("pvm"), col("cvm")).as("pd2"))
    val scored = codes.join(broadcast(lut), Seq("sub", "cell"))
      .filter(col("vec_id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(col("pd2")).as("adc_d2"))
    val topk = graft.plans.TopK.perKey(scored, Seq(scored("probe_id")),
      Seq(scored("adc_d2"), scored("neighbor_id")), k)
    val w = Window.partitionBy("probe_id")
      .orderBy(col("adc_d2"), col("neighbor_id"))
    topk.withColumn("rk", row_number().over(w))
      .select(col("probe_id"), col("neighbor_id"), col("adc_d2"), col("rk"))
  }

  /** Exact integer-L2 brute-force top-k over the FULL micro-lifted
    * vectors — the truth side PQ approximates (PQ targets L2, so the
    * panel grades against L2 truth, not the cosine panels' truth).
    * Broadcast probes, codegen'd BIGINT dots, TopKPerKey bound.
    * Output: probe_id, neighbor_id, d2, rk. */
  def l2TopK(emb: DataFrame, probeIds: Seq[Long], k: Int,
             vecCol: String = "embedding"): DataFrame = {
    val mv = emb.select(col("vec_id"),
      transform(col(vecCol), x => micro(x.cast("double"))).as("vm"))
    val probes = mv.filter(col("vec_id").isInCollection(probeIds))
      .toDF("probe_id", "pm")
    val scored = mv.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        l2sq(col("pm"), col("vm")).as("d2"))
    val topk = graft.plans.TopK.perKey(scored, Seq(scored("probe_id")),
      Seq(scored("d2"), scored("neighbor_id")), k)
    val w = Window.partitionBy("probe_id").orderBy(col("d2"), col("neighbor_id"))
    topk.withColumn("rk", row_number().over(w))
      .select(col("probe_id"), col("neighbor_id"), col("d2"), col("rk"))
  }

  /** Exact re-rank of a bounded ADC shortlist — the refine stage of the
    * production PQ design (IVFADC-R): the ADC scan over codes nominates
    * `kShort` candidates per probe, and ONLY those |probes|·kShort rows
    * are re-scored with the exact integer L2² against the stored
    * vectors (the shortlist side broadcasts into the corpus scan — the
    * full embeddings are never distance-scored corpus-wide). Raises
    * recall@k to the shortlist's containment rate while the corpus-wide
    * scan still touches only the m-id codes.
    * Output: probe_id, neighbor_id, d2, rk. */
  def adcRerankTopK(emb: DataFrame, books: DataFrame, probeIds: Seq[Long],
                    kShort: Int, k: Int, m: Int, dim: Int,
                    vecCol: String = "embedding"): DataFrame = {
    val short = adcTopK(emb, books, probeIds, kShort, m, dim, vecCol)
      .select("probe_id", "neighbor_id")
    val mv = emb.select(col("vec_id"),
      transform(col(vecCol), x => micro(x.cast("double"))).as("vm"))
    val probes = mv.filter(col("vec_id").isInCollection(probeIds))
      .toDF("probe_id", "pm")
    val scored = mv.join(broadcast(short), mv("vec_id") === short("neighbor_id"))
      .join(broadcast(probes), Seq("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        l2sq(col("pm"), col("vm")).as("d2"))
    val w = Window.partitionBy("probe_id").orderBy(col("d2"), col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Persist the PQ corpus state — `books/` (the frozen per-subspace
    * codebooks, C·m rows) and `codes/` (vec_id, sub, cell: the m-id
    * encoding, the ONLY corpus-side table an ADC query reads). The
    * embeddings are scanned once here and never again by the search
    * path; the same append/compact lifecycle as the signature/code/gram
    * stores applies. */
  def writePqStore(emb: DataFrame, path: String, m: Int, dim: Int,
                   nCents: Int, iters: Int,
                   vecCol: String = "embedding",
                   embSource: String = ""): Unit = {
    // geometry record (VERDICT r13 #4, the last family without one):
    // the append-time (m, dim) contract — codes cut under different
    // slicing silently double-count subspaces in every ADC sum.
    // `emb_source` (round 16 — VERDICT r15 #4): an optional pointer
    // (parquet path or table/view name) to the standing raw-embeddings
    // table, which the retrain lever needs and discovery cannot
    // conjure — recording it at build time is what lets
    // StoreMaintenance.maintainEstate pull the retrain without a
    // hand-written per-store driver loop.
    graft.streaming.StoreFs.writeGeometry(emb.sparkSession, path, Seq(
      "family" -> "pq", "m" -> m.toString, "dim" -> dim.toString,
      "n_cents" -> nCents.toString, "vec_col" -> vecCol) ++
      (if (embSource.nonEmpty) Seq("emb_source" -> embSource) else Nil))
    // books + the encode pass each feed TWO consumers (data write and
    // the drift-stats agg) — scoped caches keep the build one Lloyd
    // train + one encode (ADVICE r15: an uncached `books` re-ran every
    // Lloyd round, and a second encode(emb, …) re-scanned the corpus,
    // roughly doubling flat-PQ build cost). Stats aggregate BEFORE the
    // codes write, which also materializes the cache.
    val books = graft.core.Caches.scoped(
      trainCodebooks(emb, m, dim, nCents, iters, vecCol))
    books.write.mode("overwrite").parquet(s"$path/books")
    val assigned = graft.core.Caches.scoped(
      encode(emb, books, m, dim, vecCol))
    writeQerrStats(emb.sparkSession, path, assigned)
    assigned.select("vec_id", "sub", "cell")
      .write.mode("overwrite").parquet(s"$path/codes")
  }

  /** Append a NEW batch under the store's FROZEN codebooks — the
    * incremental ingest cadence (the x81 code-store move): only the
    * batch is subvector-split and assigned; old embeddings and old
    * codes are never recomputed. Codebooks stay frozen per store
    * generation (retrain = rebuild, the same trade as the LSH mask
    * width).
    *
    * SAFE TO RETRY (ADVICE r8) and CROSS-BATCH UNIQUE (ADVICE r10):
    * the batch is anti-joined on (vec_id, sub) against EVERY visible
    * row — a retry, a crash-replay, or a vec_id re-ingested in a
    * LATER batch all append only the missing rows (a duplicate
    * (vec_id, sub) row would double-count that subspace in every ADC
    * sum; ids are immutable under the frozen-books contract, so
    * dropping the re-ingest is the consistent answer). With an
    * explicit `batchId` the `_graft_batch_<id>` marker is the
    * fast-path short-circuit and rows are tagged for compaction's
    * seal; with `batchId = None` (plain batch callers) there is no
    * marker and rows carry the −1 sentinel, so successive untagged
    * appends of DIFFERENT batches all land (ADVICE r9). */
  def appendToPqStore(spark: org.apache.spark.sql.SparkSession,
                      newEmb: DataFrame, path: String, m: Int, dim: Int,
                      batchId: Option[Long] = None,
                      vecCol: String = "embedding"): Unit = {
    // the single-writer gate (round 15 — the appendToVecStore
    // rationale): fail fast while a retrain holds the rebuild lock
    graft.streaming.StoreFs.requireNoRebuild(spark, path,
      "appendToPqStore")
    val eff = graft.streaming.StoreFs.liveRoot(spark, path)
    val dir = s"$eff/codes"
    if (batchId.exists(graft.streaming.StoreFs.markerExists(spark, dir, _)))
      return
    // geometry guard (VERDICT r13 #4): a caller whose (m, dim) disagree
    // with the build mis-slices every appended code. The family check
    // accepts both flat-PQ and IVFADC roots (this append is the flat
    // form; the IVFADC path has its own appendToIvfadcStore).
    val geo = graft.streaming.StoreFs.readGeometry(spark, eff)
    geo.get("family").foreach { f => require(f == "pq",
      s"appendToPqStore at $path expects a 'pq' store but the geometry " +
        s"manifest records family='$f' (recorded: $geo)") }
    for (gm <- geo.get("m").flatMap(_.toIntOption))
      require(gm == m, s"store $path was built with m=$gm but the " +
        s"caller passed m=$m (recorded geometry: $geo)")
    for (gd <- geo.get("dim").flatMap(_.toIntOption))
      require(gd == dim, s"store $path was built with dim=$gd but the " +
        s"caller passed dim=$dim (recorded geometry: $geo)")
    val books = spark.read.parquet(s"$eff/books")
    // d2 rides along to the batch-stats record (drift gauge, round
    // 15) and is dropped before the write — the codes schema is
    // unchanged
    val tagged = encode(newEmb, books, m, dim, vecCol)
      .select("vec_id", "sub", "cell", "d2")
      .withColumn("batch_id", lit(batchId.getOrElse(-1L)))
    val novel =
      if (graft.streaming.StoreFs.storeExists(spark, dir)) {
        // anti-join against ALL visible (vec_id, sub) rows, not just
        // this batch's generation (ADVICE r10): encode is
        // deterministic under the frozen books, so a vec_id
        // re-ingested in a LATER batch would land duplicate rows and
        // double-count its subspaces in every ADC sum until a
        // compaction dedups. The scan reads only the two key columns
        // of a codes store (no payload width); a replay heals the
        // same way, with the marker as its fast path.
        val visible = spark.read.option("mergeSchema", "true")
          .parquet(graft.streaming.StoreFs.dataDir(spark, dir))
        tagged.join(visible.select("vec_id", "sub"),
          Seq("vec_id", "sub"), "left_anti")
      } else tagged
    val pinned = graft.core.Caches.scoped(novel)
    // drift gauge (round 15): this batch's mean residual quantization
    // error under the FROZEN books. Aggregated BEFORE the data write —
    // the agg both materializes the pinned cache and, should the cache
    // be lost, re-derives `novel` against the codes dir in its
    // pre-append state (after the write, the anti-join would see the
    // batch's own rows and count zero)
    // qerr_cv = the batch's WITHIN-batch spread (round 17 — VERDICT
    // r16 #8, same agg pass): the audit's noise floor can then track a
    // corpus whose variance itself drifts after build. Within-batch by
    // construction — a pooled-across-batches cv would absorb
    // between-batch MEAN drift and raise the floor exactly when the
    // gauge should fire (a self-masking gauge).
    val q = pinned.agg(avg(col("d2")).as("m"), count(lit(1)).as("n"),
      stddev_pop(col("d2")).as("sd")).head
    pinned.drop("d2").write.mode("append")
      .parquet(graft.streaming.StoreFs.dataDir(spark, dir))
    if (q.getLong(1) > 0L)
      graft.streaming.StoreFs.appendBatchStats(spark, eff, Seq(
        "qerr_mean" -> q.getDouble(0).toString,
        "n_rows" -> q.getLong(1).toString,
        "batch_id" -> batchId.getOrElse(-1L).toString) ++
        (if (!q.isNullAt(2) && q.getDouble(0) > 0.0)
           Seq("qerr_cv" -> (q.getDouble(2) / q.getDouble(0)).toString)
         else Nil))
    batchId.foreach(graft.streaming.StoreFs.writeMarker(spark, dir, _))
  }

  /** ADC top-k answered ENTIRELY from the store: codes + frozen books
    * are read back; the embeddings table is touched only for the
    * BOUNDED probe rows (the id filter pushes into the scan —
    * plan-pinned in PlanShapeSpec). */
  def adcTopKFromStore(spark: org.apache.spark.sql.SparkSession,
                       path: String, emb: DataFrame, probeIds: Seq[Long],
                       k: Int, m: Int, dim: Int,
                       vecCol: String = "embedding"): DataFrame = {
    // family guard (VERDICT r13 #4): an IVFADC root also has books +
    // codes, but its codes are RESIDUAL-coded — flat-ADC sums over
    // them are silently wrong numbers, not an error
    val eff = graft.streaming.StoreFs.liveRoot(spark, path)
    graft.streaming.StoreFs.requireFamily(spark, eff, "pq", "ADC serve")
    val books = spark.read.parquet(s"$eff/books")
    val codes0 = spark.read.parquet(graft.streaming.StoreFs.dataDir(spark, s"$eff/codes"))
    // deletion propagation (round 14): tombstoned ids never enter the
    // ADC sums — surviving neighbors are exactly the no-such-rows store's
    val codes = graft.streaming.StoreFs.liveTombsDir(spark, eff)
      .fold(codes0)(d => codes0.join(
        graft.streaming.StoreFs.readTombstones(spark, d, "vec_id"),
        Seq("vec_id"), "left_anti"))
    val probeSv = subvectors(
      emb.filter(col("vec_id").isInCollection(probeIds)), m, dim, vecCol)
    adcTopKFromCodes(probeSv, codes, books, probeIds, k)
  }

  /** [[adcTopKFromStore]] with the exact re-rank stage — the flat-PQ
    * production serve (the [[adcRerankTopK]] IVFADC-R refine applied to
    * the persisted store): the ADC scan over the stored codes nominates
    * `kShort` candidates per probe, and only those |probes|·kShort rows
    * are re-scored with exact integer L2² against the caller's
    * embeddings. This is the serve the flat-PQ recall panel grades
    * (round 17 — VERDICT r16 #1: the one ranking channel y70 left
    * ungauged). Output: probe_id, neighbor_id, d2, rk (≤ k per probe). */
  def adcRerankTopKFromStore(spark: org.apache.spark.sql.SparkSession,
                             path: String, emb: DataFrame,
                             probeIds: Seq[Long], kShort: Int, k: Int,
                             m: Int, dim: Int,
                             vecCol: String = "embedding"): DataFrame = {
    val short = adcTopKFromStore(spark, path, emb, probeIds, kShort, m,
      dim, vecCol)
    val probeRows = emb.filter(col("vec_id").isInCollection(probeIds))
    ivfadcRerank(emb, short.select("probe_id", "neighbor_id"), probeRows,
      k, vecCol)
  }

  // ---- IVFADC (Jégou et al. 2011 §IV): coarse cells + residual PQ ----
  //
  // adcTopKFromCodes scans ALL codes per probe batch; the standard
  // 100 TB shape restricts the scan to the probes' nprobe nearest
  // COARSE cells and PQ-encodes the RESIDUAL x − c(x) (residuals
  // cluster far tighter than raw vectors, so the same C spends its
  // cells on finer structure). Everything below stays in the micro-unit
  // BIGINT contract: coarse centroids are integer Lloyd means, residuals
  // are integer subtractions, and the per-(probe, cell) LUT is exact
  // integer L2² — bit-identical cross-engine.

  /** Coarse quantizer: integer k-means on the FULL micro vector — the
    * PQ trainer at m = 1 (the subspace id is just a constant grouping
    * key). Output: ivf_cell, ccvm array<long>. */
  def trainCoarse(mv: DataFrame, nCells: Int, iters: Int,
                  dim: Int = -1): DataFrame =
    trainCodebooksSv(
      mv.select(col("vec_id"), lit(0).as("sub"), col("vm").as("svm")),
      nCells, iters, subDim = dim)
      .select(col("cent_id").as("ivf_cell"), col("cvm").as("ccvm"))

  /** Coarse assignment + residual: each vector's nearest coarse cell
    * (argmin integer L2², tie → smaller cell id) and the exact integer
    * residual rm = vm − centroid. Output: vec_id, ivf_cell, rm. */
  def coarseResiduals(mv: DataFrame, coarse: DataFrame): DataFrame =
    assign(
        mv.select(col("vec_id"), lit(0).as("sub"), col("vm").as("svm")),
        coarse.select(lit(0).as("sub"), col("ivf_cell").as("cent_id"),
          col("ccvm").as("cvm")))
      .join(broadcast(coarse),
        col("cell") === coarse("ivf_cell"))
      .select(col("vec_id"), col("ivf_cell"),
        zip_with(col("svm"), col("ccvm"), (a, b) => a - b).as("rm"))

  /** Residual subvector split CARRYING the coarse cell (the plain
    * [[subvectorsMicro]] would need a corpus-sized join to restore it).
    * Output: vec_id, ivf_cell, sub, svm. */
  def residualSubvectors(res: DataFrame, m: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    res.select(col("vec_id"), col("ivf_cell"),
        explode(transform(sequence(lit(0), lit(m - 1)), s =>
          struct(s.as("sub"),
            slice(col("rm"), s * subDim + lit(1), lit(subDim)).as("svm"))))
          .as("sv"))
      .select(col("vec_id"), col("ivf_cell"),
        col("sv.sub").as("sub"), col("sv.svm").as("svm"))
  }

  /** Persist the IVFADC corpus state: `coarse/` (≤ nCells centroids),
    * `books/` (residual-PQ codebooks, C·m rows), and `codes/` —
    * (vec_id, sub, cell, ivf_cell) PARTITIONED BY
    * `cell_bucket = ivf_cell % nBuckets` (the bounded-directory layout,
    * [[ExactIvf.DefaultBuckets]] — VERDICT r12 #1), so a probe batch's
    * cell list prunes the scan to its buckets at O(nBuckets) metadata
    * cost whatever nCells is; `nBuckets = 0` keeps the legacy
    * one-directory-per-cell layout. The store records its geometry
    * (family, nCells, nBuckets, m, dim, nCents, vecCol) so serves
    * validate the caller's contract and the SQL surface can read
    * (m, dim) instead of demanding 8 arguments. The embeddings are
    * scanned only here. */
  def writeIvfadcStore(emb: DataFrame, path: String, nCells: Int, m: Int,
                       dim: Int, nCents: Int, iters: Int,
                       vecCol: String = "embedding",
                       nBuckets: Int = -1,
                       embSource: String = ""): Unit = {
    val buckets = ExactIvf.resolveBuckets(nBuckets, nCells)
    val groups = ExactIvf.resolveGroups(-1, nCells)
    // manifest BEFORE data — the ExactIvf.writeVecStore rationale
    // (review r13): a post-data crash window would let the next
    // append write the other layout into the same directory.
    // emb_source: the writePqStore rationale (round 16).
    graft.streaming.StoreFs.writeGeometry(emb.sparkSession, path, Seq(
      "family" -> "ivfadc", "n_cells" -> nCells.toString,
      "n_buckets" -> buckets.toString, "m" -> m.toString,
      "dim" -> dim.toString, "n_cents" -> nCents.toString,
      "vec_col" -> vecCol, "n_groups" -> groups.toString) ++
      (if (embSource.nonEmpty) Seq("emb_source" -> embSource) else Nil))
    val mv = graft.core.Caches.scoped(microVectors(emb, vecCol))
    val coarse0 = graft.core.Caches.scoped(trainCoarse(mv, nCells, iters, dim))
    // coarse-over-coarse level (VERDICT r13 #1, the ExactIvf
    // rationale carried to the APPROXIMATE path): the probe→cell
    // ranking crossJoins every probe with every coarse centroid —
    // |probes|·nCells integer L2²s per serve chunk, the same quadratic
    // term the exact serve had, plus an O(nCells·dim) coarse broadcast.
    // A √nCells group level (frozen with the centroids) lets the serve
    // prune whole groups through the triangle inequality BEFORE any
    // per-cell distance — with the exact nprobe selection preserved
    // (see ivfadcShortlist). Cells are frozen, so the assignment needs
    // no incremental maintenance.
    val cmv = coarse0.select(col("ivf_cell").as("vec_id"),
      col("ccvm").as("vm"))
    val gcent = graft.core.Caches.scoped(trainCoarse(cmv, groups, iters, dim))
    val asg = coarseResiduals(cmv, gcent)
      .select(col("vec_id").as("ivf_cell"), col("ivf_cell").as("cell_group"))
    gcent.select(col("ivf_cell").as("cell_group"), col("ccvm").as("gcvm"))
      .write.mode("overwrite").parquet(s"$path/groups")
    val coarse = graft.core.Caches.scoped(
      coarse0.join(broadcast(asg), Seq("ivf_cell")))
    coarse.write.mode("overwrite").parquet(s"$path/coarse")
    val res = graft.core.Caches.scoped(coarseResiduals(mv, coarse))
    val rsv = graft.core.Caches.scoped(residualSubvectors(res, m, dim))
    // cache books + the single residual-encode pass (ADVICE r15 — the
    // writePqStore rationale: the second assign re-evaluated the whole
    // Lloyd train and re-encoded the corpus just for the stats agg)
    val books = graft.core.Caches.scoped(
      trainCodebooksSv(rsv.drop("ivf_cell"), nCents, iters, subDim = dim / m))
    books.write.mode("overwrite").parquet(s"$path/books")
    val assigned = graft.core.Caches.scoped(
      assign(rsv.drop("ivf_cell"), books))
    writeQerrStats(emb.sparkSession, path, assigned)
    ExactIvf.writeCellLaid(
      assigned
        .select(col("vec_id"), col("sub"), col("cell"))
        .join(res.select(col("vec_id"), col("ivf_cell")), Seq("vec_id")),
      buckets, s"$path/codes", overwrite = true)
  }

  /** Drift gauge (round 15): record the build-time mean residual
    * quantization error (micro² per (vec, sub) row) — the number the
    * codes table cannot carry (codes are lossy; d2 exists only at
    * encode time). Appends record their own batch's mean via
    * [[graft.streaming.StoreFs.appendBatchStats]], and the audit's
    * newest-vs-build ratio is the retrain-trigger signal. Build-only
    * cost: one more assign pass over the CACHED residual subvectors. */
  private def writeQerrStats(spark: org.apache.spark.sql.SparkSession,
                             path: String, assigned: DataFrame): Unit = {
    val q = assigned.agg(avg(col("d2")).as("m"),
      count(lit(1)).as("n"), stddev_pop(col("d2")).as("s")).head
    val mean = if (q.isNullAt(0)) 0.0 else q.getDouble(0)
    // the store's own NOISE FLOOR (round 16 — VERDICT r15 #5): the
    // in-distribution per-row qerr spread, recorded as a coefficient
    // of variation. The audit derives each store's warn threshold
    // from it — a naturally-variable corpus (large cv) needs a higher
    // bar than the global 2.0 constant, a stable one (small cv)
    // deserves a far lower one. Free: the same agg pass.
    val cv =
      if (mean <= 0.0 || q.isNullAt(2)) 0.0 else q.getDouble(2) / mean
    graft.streaming.StoreFs.writeBuildStats(spark, path, Seq(
      "qerr_mean" -> mean.toString,
      "qerr_cv" -> cv.toString,
      "n_rows" -> q.getLong(1).toString))
  }

  /** [[writeIvfadcStore]] for EXTERNALLY-CLUSTERED corpora (the
    * [[ExactIvf.writeVecStoreAssigned]] analog): `assigned` is
    * (vec_id, vm, ivf_cell) with the coarse assignment already decided
    * offline, `centroids` is (ivf_cell, ccvm). Both vector columns are
    * MICRO-UNIT integer arrays (the [[microVectors]] space — the serve
    * micro-lifts its probe embeddings by 1e6, and the stored residuals
    * must live in that same space). Residual codebooks are still
    * trained here (cheap — sampled init + bounded iters over the
    * residual subvectors); only the corpus-scale coarse k-means is
    * skipped. IVFADC is approximate by contract, so a non-nearest
    * assignment costs recall, never correctness of the serve's own
    * semantics (exact ADC sums over the probed cells' codes). */
  def writeIvfadcStoreAssigned(spark: org.apache.spark.sql.SparkSession,
                               assigned: DataFrame, centroids: DataFrame,
                               path: String, m: Int, dim: Int,
                               nCents: Int, iters: Int,
                               nBuckets: Int = -1): Unit = {
    val coarse0 = graft.core.Caches.scoped(
      centroids.select(col("ivf_cell"), col("ccvm")))
    val nCells = coarse0.count().toInt
    val buckets = ExactIvf.resolveBuckets(nBuckets, nCells)
    val groups = ExactIvf.resolveGroups(-1, nCells)
    graft.streaming.StoreFs.writeGeometry(spark, path, Seq(
      "family" -> "ivfadc", "n_cells" -> nCells.toString,
      "n_buckets" -> buckets.toString, "m" -> m.toString,
      "dim" -> dim.toString, "n_cents" -> nCents.toString,
      "vec_col" -> "embedding", "n_groups" -> groups.toString))
    val cmv = coarse0.select(col("ivf_cell").as("vec_id"),
      col("ccvm").as("vm"))
    val gcent = graft.core.Caches.scoped(trainCoarse(cmv, groups, iters, dim))
    val asg = coarseResiduals(cmv, gcent)
      .select(col("vec_id").as("ivf_cell"), col("ivf_cell").as("cell_group"))
    gcent.select(col("ivf_cell").as("cell_group"), col("ccvm").as("gcvm"))
      .write.mode("overwrite").parquet(s"$path/groups")
    coarse0.join(broadcast(asg), Seq("ivf_cell"))
      .write.mode("overwrite").parquet(s"$path/coarse")
    // residuals from the GIVEN assignment (not nearest-cell): exact
    // integer subtraction against the assigned cell's centroid
    val res = graft.core.Caches.scoped(
      assigned.select(col("vec_id"), col("vm"), col("ivf_cell"))
        .join(broadcast(coarse0), Seq("ivf_cell"))
        .select(col("vec_id"), col("ivf_cell"),
          zip_with(col("vm"), col("ccvm"), (a, b) => a - b).as("rm")))
    val rsv = graft.core.Caches.scoped(residualSubvectors(res, m, dim))
    val books = graft.core.Caches.scoped(
      trainCodebooksSv(rsv.drop("ivf_cell"), nCents, iters, subDim = dim / m))
    books.write.mode("overwrite").parquet(s"$path/books")
    val encoded = graft.core.Caches.scoped(
      assign(rsv.drop("ivf_cell"), books))
    writeQerrStats(spark, path, encoded)
    ExactIvf.writeCellLaid(
      encoded
        .select(col("vec_id"), col("sub"), col("cell"))
        .join(res.select(col("vec_id"), col("ivf_cell")), Seq("vec_id")),
      buckets, s"$path/codes", overwrite = true)
  }

  /** Append a NEW batch under the store's FROZEN coarse centroids AND
    * residual codebooks — the x81/y25 incremental cadence extended to
    * IVFADC: only the batch is coarse-assigned, residualized and
    * PQ-encoded; old embeddings and old codes are never recomputed.
    * Retraining either quantizer = store rebuild (the same trade as the
    * LSH mask width). Same retry discipline as [[appendToPqStore]]:
    * anti-join on (vec_id, sub) against every visible row (cross-batch
    * unique — ADVICE r10 — here pruned to the batch's coarse cells),
    * marker fast path with an explicit batchId, −1 sentinel tag and no
    * marker with `batchId = None` (ADVICE r9). */
  def appendToIvfadcStore(spark: org.apache.spark.sql.SparkSession,
                          newEmb: DataFrame, path: String, m: Int, dim: Int,
                          batchId: Option[Long] = None,
                          vecCol: String = "embedding"): Unit = {
    // the single-writer gate (round 15 — the appendToVecStore
    // rationale): rows encoded into an epoch mid-retrain vanish at
    // cutover; fail fast while the rebuild lock is live
    graft.streaming.StoreFs.requireNoRebuild(spark, path,
      "appendToIvfadcStore")
    // route to the LIVE EPOCH (post-retrain ingest must encode under
    // the new quantizers, not a superseded epoch's)
    val eff = graft.streaming.StoreFs.liveRoot(spark, path)
    val dir = s"$eff/codes"
    if (batchId.exists(graft.streaming.StoreFs.markerExists(spark, dir, _)))
      return
    val coarse = spark.read.parquet(s"$eff/coarse")
    val books = spark.read.parquet(s"$eff/books")
    val mv = microVectors(newEmb, vecCol)
    val res = graft.core.Caches.scoped(coarseResiduals(mv, coarse))
    val rsv = residualSubvectors(res, m, dim)
    // d2 rides along to the batch-stats record (drift gauge, round
    // 15) and is dropped before the write — the codes schema is
    // unchanged
    val tagged = assign(rsv.drop("ivf_cell"), books)
      .select(col("vec_id"), col("sub"), col("cell"), col("d2"))
      .join(res.select(col("vec_id"), col("ivf_cell")), Seq("vec_id"))
      .withColumn("batch_id", lit(batchId.getOrElse(-1L)))
    val buckets = graft.streaming.StoreFs.readGeometry(spark, eff)
      .get("n_buckets").flatMap(_.toIntOption).getOrElse(0)
    val novel = {
      // anti-join on (vec_id, sub) against ALL visible rows (ADVICE
      // r10 — cross-batch unique ids, same argument as
      // [[appendToPqStore]]); coarse assignment is deterministic under
      // the frozen centroids, so a duplicate can only live in the
      // cells THIS batch maps to — the visible side prunes to those
      // partitions (bounded by nCells) through the DPP join shape
      // (VERDICT r12 #8: no cell literal in the append plan; the
      // literal list is the DPP-off fallback) and reads only the key
      // columns.
      val visible = spark.read.option("mergeSchema", "true")
        .parquet(graft.streaming.StoreFs.dataDir(spark, dir))
      // layout guard (review r13) — the appendToVecStore rationale
      val bucketed = visible.columns.contains("cell_bucket")
      require(bucketed == (buckets > 0),
        s"store layout mismatch at $dir: data is " +
          s"${if (bucketed) "bucketed" else "legacy"} but the geometry " +
          s"manifest records n_buckets=$buckets — restore the manifest " +
          "(StoreFs.writeGeometry) before appending")
      tagged.join(
        ExactIvf.pruneToCells(spark, visible, res.select("ivf_cell"),
            buckets)
          .select("vec_id", "sub"),
        Seq("vec_id", "sub"), "left_anti")
    }
    val pinned = graft.core.Caches.scoped(novel)
    // drift gauge (round 15): this batch's mean residual quantization
    // error under the FROZEN coarse cells + books — the retrain
    // trigger's input, recorded from the encode pass the append
    // already ran. Aggregated BEFORE the data write: the agg
    // materializes the pinned cache, and on cache loss it re-derives
    // `novel` against the codes dir's pre-append state (post-write,
    // the anti-join would see the batch's own rows and count zero)
    // within-batch qerr_cv rides along (the appendToPqStore rationale)
    val q = pinned.agg(avg(col("d2")).as("m"), count(lit(1)).as("n"),
      stddev_pop(col("d2")).as("sd")).head
    ExactIvf.writeCellLaid(pinned.drop("d2"), buckets,
      graft.streaming.StoreFs.dataDir(spark, dir), overwrite = false)
    if (q.getLong(1) > 0L)
      graft.streaming.StoreFs.appendBatchStats(spark, eff, Seq(
        "qerr_mean" -> q.getDouble(0).toString,
        "n_rows" -> q.getLong(1).toString,
        "batch_id" -> batchId.getOrElse(-1L).toString) ++
        (if (!q.isNullAt(2) && q.getDouble(0) > 0.0)
           Seq("qerr_cv" -> (q.getDouble(2) / q.getDouble(0)).toString)
         else Nil))
    batchId.foreach(graft.streaming.StoreFs.writeMarker(spark, dir, _))
  }

  /** COMPACT a PQ or IVFADC codes store: per-batch appends leave one
    * small file set per generation; compaction deduplicates by the
    * natural key (idempotent-append tags collapse to the −1 sentinel,
    * kept as a literal column so later tagged appends never produce a
    * mixed schema — the IndexIngest discipline), preserves the
    * partition layout when the store is cell-partitioned (IVFADC), and
    * swaps the new generation in atomically (`StoreFs.swapInCompacted`
    * — a crash never leaves an empty store). Serving answers are
    * provably unchanged (spec-pinned). `_graft_batch_*` replay markers
    * ride across the swap (the `swapInCompacted` contract since ADVICE
    * r9): a PqIngest batch appended (marker written) but whose
    * checkpoint had not yet committed when compaction ran still hits
    * the marker fast path on restart — its rows are already folded into
    * the −1 generation, and re-appending them would duplicate
    * (vec_id, sub) keys and double-count subspaces in every ADC sum. */
  def compactCodesStore(spark: org.apache.spark.sql.SparkSession,
                        path: String, keepGens: Int = 1,
                        keepAgeMs: Long = 0L): Unit = {
    val eff = graft.streaming.StoreFs.liveRoot(spark, path)
    val dir = s"$eff/codes"
    if (!graft.streaming.StoreFs.storeExists(spark, dir)) return
    // seal every folded tag as a marker FIRST: a torn append (rows
    // committed, marker lost) must replay as a no-op after its tag
    // collapses to the -1 sentinel (ADVICE r10)
    graft.streaming.StoreFs.sealTagMarkers(spark, dir)
    val src = spark.read.option("mergeSchema", "true")
      .parquet(graft.streaming.StoreFs.dataDir(spark, dir))
    val partitioned = src.columns.contains("ivf_cell")
    val buckets = graft.streaming.StoreFs.readGeometry(spark, eff)
      .get("n_buckets").flatMap(_.toIntOption).getOrElse(0)
    val keys = if (partitioned) Seq("vec_id", "ivf_cell", "sub")
               else Seq("vec_id", "sub")
    // PURGE (round 14): tombstoned ids drop from the rewrite and
    // exactly the applied tombstones are cleared — the compactVecStore
    // crash-order argument (purged codes + uncleared tombstones just
    // re-exclude already-absent ids); no bound recompute here, ADC
    // carries no per-cell bounds
    val applied = graft.streaming.StoreFs.liveTombsDir(spark, eff)
      .map(d => graft.core.Caches.scoped(
        graft.streaming.StoreFs.readTombstones(spark, d, "vec_id")))
    val merged0 = src.drop("batch_id", "cell_bucket").dropDuplicates(keys)
      .withColumn("batch_id", lit(-1L))
    val merged = applied.fold(merged0)(t =>
      merged0.join(t, Seq("vec_id"), "left_anti"))
    graft.streaming.StoreFs.swapInCompacted(spark, dir,
        keepGens = keepGens, keepAgeMs = keepAgeMs) { tmp =>
      if (partitioned) ExactIvf.writeCellLaid(merged, buckets, tmp,
        overwrite = true)
      else merged.write.parquet(tmp)
    }
    applied.foreach { t =>
      // caller's retention on the tombs swap too (ADVICE r14, low —
      // the compactVecStore rationale)
      val tombsSub = s"$eff/tombs"
      graft.streaming.StoreFs.swapInCompacted(spark, tombsSub,
          keepGens = keepGens, keepAgeMs = keepAgeMs) { tmp =>
        spark.read.schema("vec_id LONG, batch_id LONG")
          .parquet(graft.streaming.StoreFs.dataDir(spark, tombsSub))
          .join(t, Seq("vec_id"), "left_anti")
          .write.parquet(tmp)
      }
      spark.catalog.refreshByPath(tombsSub)
    }
  }

  /** DELETE vectors from a PQ or IVFADC codes store by id (round 14 —
    * deletion propagation for the approximate family): tombstones at
    * `$path/tombs` exclude the ids from every ADC/IVFADC shortlist (an
    * excluded id never consumes a kShort slot, so surviving neighbors
    * are what the store would have served had the ids never been
    * encoded); physical purge + tombstone clearing happen at the next
    * [[compactCodesStore]]. Semantics per
    * [[graft.streaming.StoreFs.appendTombstones]]. */
  def deleteFromCodesStore(spark: org.apache.spark.sql.SparkSession,
                           ids: DataFrame, path: String,
                           batchId: Option[Long] = None,
                           idCol: String = "vec_id"): Unit =
    graft.streaming.StoreFs.appendTombstones(spark,
      s"${graft.streaming.StoreFs.liveRoot(spark, path)}/tombs",
      ids.select(col(idCol).as("vec_id")), "vec_id", "codes_tombs",
      batchId)

  /** IVFADC-R search from the store: probes rank the broadcast coarse
    * centroids (bounded × ≤ nCells), take their nprobe nearest cells,
    * and compute a PER-CELL residual LUT (the residual of the SAME
    * probe differs per cell — the detail that distinguishes IVFADC from
    * flat ADC). The codes scan reads ONLY the probed cells' partitions
    * — via dynamic partition pruning off the broadcast LUT join, with
    * no driver-side cell list at all; candidates join
    * the broadcast LUT on (ivf_cell, sub, cell), partial-aggregate the
    * m per-subspace hits, and the kShort shortlist is exactly re-ranked
    * against the full vectors (probe + shortlist filters push into the
    * embeddings scan). Output: probe_id, neighbor_id, d2, rk. */
  def ivfadcTopKFromStore(spark: org.apache.spark.sql.SparkSession,
                          path: String, emb: DataFrame, probeIds: Seq[Long],
                          nprobe: Int, kShort: Int, k: Int, m: Int, dim: Int,
                          vecCol: String = "embedding",
                          maxBatch: Int = ExactIvf.MaxServeBatch): DataFrame = {
    // the ExactIvf.MaxServeBatch broadcast contract (VERDICT r11 #2):
    // the serve broadcasts the probe rows and the per-cell LUT, so an
    // oversized probe batch is auto-chunked (per-probe answers are
    // independent; the union is row-identical by construction)
    require(maxBatch >= 1, s"maxBatch must be >= 1, got $maxBatch")
    // an empty probe batch serves once (empty result) — grouped() of an
    // empty Seq yields NO chunks, and reduce over none would throw
    val chunks = probeIds.distinct.grouped(maxBatch).toSeq match {
      case Seq() => Seq(Seq.empty[Long])
      case cs    => cs
    }
    chunks.map { chunk =>
      serveIvfadc(spark, path, emb,
        emb.filter(col("vec_id").isInCollection(chunk)),
        nprobe, kShort, k, m, dim, vecCol,
        nProbes = chunk.size.toLong)
    }.reduce(_ unionAll _)
  }

  /** The probe-TABLE form of [[ivfadcTopKFromStore]]: `probes` is a
    * DataFrame with a probe_id column — the query side enters the plan
    * as a JOIN against the embeddings relation instead of a collected
    * literal id list (the ExactIvf/Retrieval query-table discipline);
    * the codes scan's cell pruning is dynamic partition pruning, so the
    * serve holds NO driver-side cell state. Row-identical to the Seq
    * form (same serve tail). */
  def ivfadcTopKFromStore(spark: org.apache.spark.sql.SparkSession,
                          path: String, emb: DataFrame, probes: DataFrame,
                          nprobe: Int, kShort: Int, k: Int, m: Int, dim: Int,
                          vecCol: String): DataFrame =
    ivfadcTopKFromStore(spark, path, emb, probes, nprobe, kShort, k, m, dim,
      vecCol, ExactIvf.MaxServeBatch)

  /** [[ivfadcTopKFromStore]] (probe-TABLE form) with an explicit
    * serve-chunk bound. */
  def ivfadcTopKFromStore(spark: org.apache.spark.sql.SparkSession,
                          path: String, emb: DataFrame, probes: DataFrame,
                          nprobe: Int, kShort: Int, k: Int, m: Int, dim: Int,
                          vecCol: String,
                          maxBatch: Int): DataFrame =
    ivfadcTableResolved(spark, path, emb, probes, nprobe, kShort, k, m,
      dim, vecCol, maxBatch, None)

  /** PREDICATE-FILTERED IVFADC serving (round 15 — the
    * [[graft.operators.ExactIvf.topDotBatchFromStoreFiltered]] contract
    * carried to the approximate path): `allowed` is a relation of
    * permitted `vec_id`s, applied AFTER the cell-pruned LUT join and
    * BEFORE the kShort cut — a disallowed id never consumes a shortlist
    * slot, so the shortlist is kShort candidates OVER THE ALLOWED SET,
    * not a post-filtered unfiltered list with rank holes. Composes with
    * tombstones (anti excludes, semi restricts). The recall contract,
    * stated honestly: the serve stays APPROXIMATE — the probed cells
    * are still the nprobe nearest at the store's geometry, so a very
    * selective filter concentrated outside those cells can underfill;
    * the remedies are widening nprobe/kShort or falling back to the
    * exact filtered serve (which is exact over the subset at any
    * selectivity). Probes are NOT gated by `allowed` (restricting the
    * candidate corpus and restricting who may ask are different
    * contracts — the y62 discipline). */
  def ivfadcTopKFromStoreFiltered(spark: org.apache.spark.sql.SparkSession,
                                  path: String, emb: DataFrame,
                                  probes: DataFrame, allowed: DataFrame,
                                  nprobe: Int, kShort: Int, k: Int,
                                  m: Int, dim: Int,
                                  vecCol: String = "embedding",
                                  maxBatch: Int = ExactIvf.MaxServeBatch)
      : DataFrame =
    ivfadcTableResolved(spark, path, emb, probes, nprobe, kShort, k, m,
      dim, vecCol, maxBatch, None, Some(allowed))

  private def ivfadcTableResolved(spark: org.apache.spark.sql.SparkSession,
                                  path: String, emb: DataFrame,
                                  probes: DataFrame,
                                  nprobe: Int, kShort: Int, k: Int,
                                  m: Int, dim: Int, vecCol: String,
                                  maxBatch: Int,
                                  dirs: IvfadcDirs,
                                  allowedIn: Option[DataFrame] = None)
      : DataFrame = {
    require(maxBatch >= 1, s"maxBatch must be >= 1, got $maxBatch")
    // the caller's visibility predicate, normalized + pinned ONCE for
    // every chunk (the hybridTableResolved discipline)
    val allowed = allowedIn.map(a => graft.core.Caches.scoped(
      a.select(col("vec_id").cast("long").as("vec_id")).distinct()))
    // distinct: a duplicated probe_id row would duplicate the probe's
    // rows through the LUT join and double-count its per-subspace sums.
    // Pinned before the count + fan-out (the ExactIvf rationale: a
    // nondeterministic source must not re-execute per chunk).
    val pids = graft.core.Caches.scoped(
      probes.select(col("probe_id")).distinct())
    val n = pids.count()
    val nChunks = math.max(1L, (n + maxBatch - 1) / maxBatch).toInt
    // oversized probe batches chunk by a deterministic probe_id hash
    // (the ExactIvf.MaxServeBatch broadcast contract, VERDICT r11 #2)
    (0 until nChunks).map { i =>
      val chunk =
        if (nChunks == 1) pids
        else pids.filter(pmod(hash(col("probe_id")), lit(nChunks)) === i)
      serveIvfadc(spark, path, emb,
        emb.join(chunk, col("vec_id") === col("probe_id")).drop("probe_id"),
        nprobe, kShort, k, m, dim, vecCol, dirs,
        nProbes = (n + nChunks - 1) / nChunks, allowed = allowed)
    }.reduce(_ unionAll _)
  }

  /** Record the IVFADC store's current generation tuple (codes +
    * coarse + books) as one consistent snapshot (VERDICT r13 #3 — the
    * approximate serving path gets the same time-travel contract the
    * exact and hybrid paths have); returns the id for
    * [[ivfadcTopKFromStoreSnapshot]]. `freeze` (default true) compacts
    * the codes table right after the manifest lands — codes appends
    * write INTO the live generation (the dataDirAt contract), so an
    * unfrozen pin would keep tracking ingest. coarse/books are frozen
    * at build time (retraining is a rebuild) and are recorded for
    * completeness. The freeze compaction runs under the CALLER's
    * retention (the snapshotVecStore rationale). */
  def snapshotIvfadcStore(spark: org.apache.spark.sql.SparkSession,
                          path: String, freeze: Boolean = true,
                          keepGens: Int = 1,
                          keepAgeMs: Long = 0L): Long = {
    // tombs rides the manifest only when it exists (the VecDirs
    // contract); the freeze compaction also purges pending tombstones.
    // Sub paths are EPOCH paths; the manifest stays at the original
    // root so the snapshot listing survives a retrain.
    val eff = graft.streaming.StoreFs.liveRoot(spark, path)
    val subs = Seq(s"$eff/codes", s"$eff/coarse", s"$eff/books") ++
      (if (graft.streaming.StoreFs.storeExists(spark, s"$eff/tombs"))
         Seq(s"$eff/tombs") else Nil)
    val id = graft.streaming.StoreFs.createSnapshot(spark, path, subs)
    if (freeze) compactCodesStore(spark, path, keepGens, keepAgeMs)
    id
  }

  /** ONLINE RETRAIN of an IVFADC store (round 14 — the
    * [[graft.operators.ExactIvf.reclusterVecStore]] move for the
    * approximate family): quantizers are frozen per store, so a corpus
    * whose distribution drifts slowly loses recall (residuals grow
    * against stale codebooks) — the documented remedy was a rebuild at
    * a new path. This rebuilds COMPLETE under a fresh epoch directory
    * (new nCells / m / nCents / layout allowed — the epoch carries its
    * own geometry manifest) and cuts over with ONE atomic
    * `_graft_root_<id>` creation; serves, appends, compactions,
    * deletes and snapshots all route through
    * [[graft.streaming.StoreFs.liveRoot]] from that instant. Codes are
    * LOSSY, so the rebuild needs the RAW embeddings (`emb`) — the
    * caller's standing embeddings table; the old epoch's tombstones
    * are applied to it (a retrain must not resurrect deleted ids) and
    * mid-build deletes re-apply before the cutover (exact under the
    * single-writer contract). */
  def retrainIvfadcStore(spark: org.apache.spark.sql.SparkSession,
                         emb: DataFrame, path: String, nCells: Int,
                         m: Int, dim: Int, nCents: Int, iters: Int,
                         vecCol: String = "embedding",
                         nBuckets: Int = -1): Unit = {
    // single-writer contract enforced (round 15 — the
    // reclusterVecStore rationale): appends encoding under the OLD
    // books would be lost at cutover; they fail fast while this holds
    graft.streaming.StoreFs.acquireRebuildLock(spark, path,
      "retrainIvfadcStore")
    try retrainIvfadcLocked(spark, emb, path, nCells, m, dim, nCents,
      iters, vecCol, nBuckets)
    finally graft.streaming.StoreFs.releaseRebuildLock(spark, path)
  }

  private def retrainIvfadcLocked(spark: org.apache.spark.sql.SparkSession,
                                  emb: DataFrame, path: String,
                                  nCells: Int, m: Int, dim: Int,
                                  nCents: Int, iters: Int,
                                  vecCol: String,
                                  nBuckets: Int): Unit = {
    val eff = graft.streaming.StoreFs.liveRoot(spark, path)
    val t0 = graft.streaming.StoreFs.liveTombsDir(spark, eff)
      .map(d => graft.core.Caches.scoped(
        graft.streaming.StoreFs.readTombstones(spark, d, "vec_id")))
    t0.foreach(_.count())
    val visible = t0.fold(emb)(t => emb.join(t, Seq("vec_id"),
      "left_anti"))
    val (id, newRoot) = graft.streaming.StoreFs.reserveEpoch(spark, path)
    // the emb_source pointer rides into the new epoch's manifest —
    // otherwise the FIRST retrain would orphan the estate fan-out's
    // ability to retrain again (round 16)
    writeIvfadcStore(visible, newRoot, nCells, m, dim, nCents, iters,
      vecCol, nBuckets,
      embSource = graft.streaming.StoreFs.readGeometry(spark, eff)
        .getOrElse("emb_source", ""))
    // the declared recall floor is epoch-durable like emb_source
    // (round 17 — VERDICT r16 #2): the retrain retires the recall
    // RECORD by design (new quantizers start ungauged), but retiring
    // the store's declared contract with it meant the next panel fell
    // back to the caller's default at exactly the moment the floor was
    // enforced. The recall_retrain flag is deliberately NOT carried —
    // a fresh epoch starts unflagged; the maintenance loop re-sets it
    // only when ITS retrain fired on a recall warn.
    graft.streaming.StoreFs.readGeometry(spark, eff).get("recall_floor")
      .foreach(f => graft.streaming.StoreFs.updateGeometry(spark,
        newRoot, Seq("recall_floor" -> f)))
    graft.streaming.StoreFs.liveTombsDir(spark, eff).foreach { d =>
      val cur = graft.streaming.StoreFs.readTombstones(spark, d, "vec_id")
      val residual = t0.fold(cur)(t => cur.join(t, Seq("vec_id"),
        "left_anti"))
      if (residual.limit(1).count() > 0)
        graft.streaming.StoreFs.appendTombstones(spark,
          s"$newRoot/tombs", residual, "vec_id", "codes_tombs", None)
    }
    graft.streaming.StoreFs.commitRoot(spark, path, id)
  }

  /** [[retrainIvfadcStore]] for the FLAT PQ store. */
  def retrainPqStore(spark: org.apache.spark.sql.SparkSession,
                     emb: DataFrame, path: String, m: Int, dim: Int,
                     nCents: Int, iters: Int,
                     vecCol: String = "embedding"): Unit = {
    graft.streaming.StoreFs.acquireRebuildLock(spark, path,
      "retrainPqStore")
    try retrainPqLocked(spark, emb, path, m, dim, nCents, iters, vecCol)
    finally graft.streaming.StoreFs.releaseRebuildLock(spark, path)
  }

  private def retrainPqLocked(spark: org.apache.spark.sql.SparkSession,
                              emb: DataFrame, path: String, m: Int,
                              dim: Int, nCents: Int, iters: Int,
                              vecCol: String): Unit = {
    val eff = graft.streaming.StoreFs.liveRoot(spark, path)
    val t0 = graft.streaming.StoreFs.liveTombsDir(spark, eff)
      .map(d => graft.core.Caches.scoped(
        graft.streaming.StoreFs.readTombstones(spark, d, "vec_id")))
    t0.foreach(_.count())
    val visible = t0.fold(emb)(t => emb.join(t, Seq("vec_id"),
      "left_anti"))
    val (id, newRoot) = graft.streaming.StoreFs.reserveEpoch(spark, path)
    writePqStore(visible, newRoot, m, dim, nCents, iters, vecCol,
      embSource = graft.streaming.StoreFs.readGeometry(spark, eff)
        .getOrElse("emb_source", ""))
    // recall_floor rides into the new epoch (the retrainIvfadcLocked
    // rationale); the recall_retrain flag does not
    graft.streaming.StoreFs.readGeometry(spark, eff).get("recall_floor")
      .foreach(f => graft.streaming.StoreFs.updateGeometry(spark,
        newRoot, Seq("recall_floor" -> f)))
    graft.streaming.StoreFs.liveTombsDir(spark, eff).foreach { d =>
      val cur = graft.streaming.StoreFs.readTombstones(spark, d, "vec_id")
      val residual = t0.fold(cur)(t => cur.join(t, Seq("vec_id"),
        "left_anti"))
      if (residual.limit(1).count() > 0)
        graft.streaming.StoreFs.appendTombstones(spark,
          s"$newRoot/tombs", residual, "vec_id", "codes_tombs", None)
    }
    graft.streaming.StoreFs.commitRoot(spark, path, id)
  }

  /** [[ivfadcTopKFromStore]] (probe-TABLE form) AT a pinned snapshot:
    * codes, coarse and books resolve through ONE createSnapshot
    * manifest, all-or-nothing — a codes compaction (or further ingest)
    * after the snapshot cannot move the pinned shortlist, and a GC'd
    * generation errors instead of serving mixed state. The exact
    * re-rank still runs against the CALLER's `emb` relation — pin that
    * input too (a snapshot of its own store, or an immutable path) for
    * a fully reproducible serve. */
  def ivfadcTopKFromStoreSnapshot(spark: org.apache.spark.sql.SparkSession,
                                  path: String, snapshotId: Long,
                                  emb: DataFrame, probes: DataFrame,
                                  nprobe: Int, kShort: Int, k: Int,
                                  m: Int, dim: Int,
                                  vecCol: String = "embedding",
                                  maxBatch: Int = ExactIvf.MaxServeBatch)
      : DataFrame = {
    val dirs = graft.streaming.StoreFs.snapshotDataDirs(spark, path,
      snapshotId)
    // suffix-matched keys (the snapshotVecDirs rationale): a snapshot
    // taken after a retrain records EPOCH-root sub paths, whose shared
    // parent is also where the pinned data's geometry lives
    def find(sub: String): Option[(String, String)] =
      dirs.get(s"$path/$sub").map(v => (s"$path/$sub", v))
        .orElse(dirs.find(_._1.endsWith(s"/$sub")))
    def need(sub: String): (String, String) = find(sub).getOrElse(
      throw new IllegalArgumentException(
        s"snapshot $snapshotId of $path does not record a /$sub sub; " +
          s"recorded: ${dirs.keys.mkString(", ")}"))
    val (coarseKey, coarseDir) = need("coarse")
    ivfadcTableResolved(spark, path, emb, probes, nprobe, kShort, k, m,
      dim, vecCol, maxBatch,
      Some(IvfadcStoreDirs(coarseDir, need("books")._2, need("codes")._2,
        find("tombs").map(_._2),
        geoRoot = coarseKey.stripSuffix("/coarse"))))
  }

  /** Served-recall panel against LIVE stores on a maintenance cadence
    * (round 16 — VERDICT r15 #1): the engine analogue of the
    * reference's continuous output-quality scoring loop
    * (`/root/reference/neurons/validator.py:134-146` — every round,
    * every responder gets graded against ground truth). The r15 drift
    * stats gauge QUANTIZATION error; a store can quantize well and
    * still RANK poorly once the query distribution shifts, and nothing
    * watched that channel on live stores — the x55/x43 panels ran only
    * as fixture queries. This runs the panel against the stores an
    * operator actually serves from:
    *
    *   - each (method, storePath, floor) serves its IVFADC-R top-k
    *     from the LIVE store (the production path: nprobe cell pruning,
    *     ADC shortlist, exact re-rank);
    *   - ONE exact integer-L2 truth arm over the caller's embeddings
    *     (bounded: |probes| ≤ the x55 hash-ordered cap — O(|probes|·n),
    *     shared by every method via a scoped cache);
    *   - the result is RECORDED on each store's live epoch root
    *     ([[graft.streaming.StoreFs.writeRecallStats]]), where the fsck
    *     grades it: below its floor → `recall` warn (pull the retrain
    *     lever); appends after the panel → stale info (re-run).
    *
    * A retrain retires the record with its epoch — the new quantizers
    * start ungauged until the next cadence pass, exactly like the
    * drift stats. Output: the x43-shaped panel rows (method, n_probes,
    * total_hits, recall, recall_ok), deterministic cross-engine
    * (integer hits, one double division). */
  def servedRecallPanel(spark: org.apache.spark.sql.SparkSession,
                        stores: Seq[(String, String, Double)],
                        emb: DataFrame, probeIds: Seq[Long],
                        nprobe: Int, kShort: Int, k: Int,
                        m: Int, dim: Int,
                        vecCol: String = "embedding",
                        record: Boolean = true): DataFrame = {
    // the record's clock is captured BEFORE any serve runs (ADVICE r16,
    // low): stamping after the serve let an append land between the
    // serve and the record write with a batch-stats millis OLDER than
    // at_ms — the record then read as fresh although it graded the
    // pre-append store, and the cadence never re-panelled it. With the
    // pre-serve stamp, any concurrent append makes the record stale.
    val atMs = System.currentTimeMillis()
    val exact = graft.core.Caches.scoped(
      l2TopK(emb, probeIds, k, vecCol).select("probe_id", "neighbor_id"))
    val nP = emb.filter(col("vec_id").isInCollection(probeIds))
      .select(count(lit(1)).as("n_probes"))
    // each store serves through ITS family's production path (round 17
    // — VERDICT r16 #1: the flat-PQ family was the one ungauged ranking
    // channel): ivfadc → the IVFADC-R serve; pq → the ADC-shortlist +
    // exact-re-rank serve (nprobe does not apply — flat PQ has no
    // coarse cells). Family is read from the live epoch's manifest; an
    // unrecorded family keeps the pre-r17 ivfadc contract.
    val panel = Similarity.recallPanel(nP, k,
      stores.map { case (method, path, floor) =>
        val fam = graft.streaming.StoreFs.readGeometry(spark,
          graft.streaming.StoreFs.liveRoot(spark, path))
          .getOrElse("family", "ivfadc")
        val served = fam match {
          case "pq" => adcRerankTopKFromStore(spark, path, emb, probeIds,
            kShort, k, m, dim, vecCol)
          case _ => ivfadcTopKFromStore(spark, path, emb, probeIds,
            nprobe, kShort, k, m, dim, vecCol)
        }
        (method, served, exact, floor)
      })
    if (!record) return panel
    // ≤ |stores| rows — collected ONCE so the gauge write never re-runs
    // the exact-truth arm, then returned as a local frame
    val rows = panel.collect()
    rows.foreach { r =>
      val method = r.getString(r.fieldIndex("method"))
      stores.find(_._1 == method).foreach { case (_, path, floor) =>
        val eff = graft.streaming.StoreFs.liveRoot(spark, path)
        graft.streaming.StoreFs.writeRecallStats(spark, eff, Seq(
          "recall" -> r.getAs[Double]("recall").toString,
          "floor" -> floor.toString,
          "k" -> k.toString,
          "n_probes" -> r.getAs[Long]("n_probes").toString,
          "at_ms" -> atMs.toString))
        // the floor is a declaration about the STORE, not about one
        // panel (VERDICT r16 #2) — persist it in the geometry manifest,
        // where the retrain carries it into the next epoch (the
        // emb_source discipline), so the contract survives the exact
        // moment it gets enforced. A panel meeting the floor also
        // clears the recall-retrain flag: the lever demonstrably
        // recovered recall, so a LATER erosion retrains again instead
        // of reporting the floor unattainable.
        graft.streaming.StoreFs.updateGeometry(spark, eff,
          Seq("recall_floor" -> floor.toString),
          remove = if (r.getAs[Double]("recall") >= floor)
            Seq("recall_retrain") else Seq.empty)
      }
    }
    spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(rows: _*)),
      panel.schema)
  }

  /** Resolved sub-table directories for one IVFADC serve — live or
    * snapshot-pinned — plus the EPOCH ROOT whose geometry manifest and
    * groups table describe them (a post-retrain epoch can change m /
    * dim / nCells / nBuckets). A pinned tuple's `tombs = None` means a
    * pre-first-delete snapshot — no exclusions, never a fallback to
    * live tombstones. */
  private[operators] final case class IvfadcStoreDirs(
      coarse: String, books: String, codes: String,
      tombs: Option[String], geoRoot: String)
  private type IvfadcDirs = Option[IvfadcStoreDirs]

  private def serveIvfadc(spark: org.apache.spark.sql.SparkSession,
                          path: String, emb: DataFrame, probeRows0: DataFrame,
                          nprobe: Int, kShort: Int, k: Int, m: Int, dim: Int,
                          vecCol: String,
                          dirs: IvfadcDirs = None,
                          nProbes: Long = -1L,
                          allowed: Option[DataFrame] = None): DataFrame = {
    // geometry-manifest validation (VERDICT r12 #9): a caller whose
    // (m, dim) disagree with the build would silently mis-slice every
    // probe residual — fail fast naming the recorded geometry instead.
    // Manifest absent (pre-r13 store) = trust the caller, as before.
    // The family guard (r14) rejects a flat-PQ root, whose codes are
    // NOT residual-coded — the IVFADC LUT over them answers wrong.
    // Geometry is read at the EPOCH root the resolved subs belong to
    // (live epoch, or the snapshot's pinned one — a retrain can change
    // every geometry number).
    val geoRoot = dirs.map(_.geoRoot).getOrElse(
      graft.streaming.StoreFs.liveRoot(spark, path))
    graft.streaming.StoreFs.requireFamily(spark, geoRoot, "ivfadc",
      "IVFADC serve")
    val geo = graft.streaming.StoreFs.readGeometry(spark, geoRoot)
    for (gm <- geo.get("m").flatMap(_.toIntOption))
      require(gm == m,
        s"store $path was built with m=$gm but the caller passed m=$m " +
          s"(recorded geometry: $geo)")
    for (gd <- geo.get("dim").flatMap(_.toIntOption))
      require(gd == dim,
        s"store $path was built with dim=$gd but the caller passed " +
          s"dim=$dim (recorded geometry: $geo)")
    val probeRows = graft.core.Caches.scoped(probeRows0)
    val coarse = spark.read.parquet(
      dirs.map(_.coarse).getOrElse(s"$geoRoot/coarse"))
    val books = spark.read.parquet(
      dirs.map(_.books).getOrElse(s"$geoRoot/books"))
    val codesDir = dirs.map(_.codes).getOrElse(
      graft.streaming.StoreFs.dataDir(spark, s"$geoRoot/codes"))
    // deletion propagation (round 14): live serves read the live
    // tombstones; a pinned serve reads exactly what its manifest
    // recorded (None = pre-first-delete snapshot, no exclusions)
    val tombsDir = dirs match {
      case Some(d) => d.tombs
      case None => graft.streaming.StoreFs.liveTombsDir(spark, geoRoot)
    }
    val tombs = tombsDir.map(d => graft.core.Caches.scoped(
      graft.streaming.StoreFs.readTombstones(spark, d, "vec_id")))
    val shortl = ivfadcShortlist(spark, geoRoot, probeRows, nprobe,
      kShort, m, dim, coarse, books, vecCol, codesDir, tombs, nProbes,
      allowed)
    ivfadcRerank(emb, shortl, probeRows, k, vecCol)
  }

  private def ivfadcShortlist(spark: org.apache.spark.sql.SparkSession,
                              path: String, probeRows: DataFrame,
                              nprobe: Int, kShort: Int,
                              m: Int, dim: Int, coarse: DataFrame,
                              books: DataFrame, vecCol: String,
                              codesDir: String,
                              tombs: Option[DataFrame],
                              nProbes: Long = -1L,
                              allowed: Option[DataFrame] = None)
      : DataFrame = {
    val subDim = dim / m
    val pmv = graft.core.Caches.scoped(
      microVectors(probeRows, vecCol).toDF("probe_id", "pm"))
    // probe→cell selection: EXACT top-nprobe coarse cells per probe by
    // (L2² asc, cell id). The flat form crossJoins every probe with
    // every centroid — |probes|·nCells distances + an O(nCells·dim)
    // coarse broadcast, the same quadratic term the exact serve had
    // (VERDICT r13 #1). Above the shared op-count floor the serve goes
    // two-level: rank GROUPS by the triangle-inequality lower bound
    // lb(q, g) = max(0, ‖q − gc‖ − max_c(‖cc − gc‖)) ≤ min_{c∈g} ‖q−c‖,
    // seed with the nprobe lowest-lb groups' cells, take d* = the
    // seed's nprobe-th exact distance, and keep every group whose lb
    // could still beat d* — a kept set that PROVABLY contains the true
    // top-nprobe cells (any true top cell has ‖q−c‖ ≤ d*, so its
    // group's lb ≤ d* and it survives; ties kept by ≤ with rounding
    // margins in the conservative direction), so the final exact top-k
    // over surviving groups' cells selects the identical nprobe set.
    // The geometry's n_cells avoids a coarse count; pre-r14 stores
    // (no cell_group) keep the flat path.
    val geo = graft.streaming.StoreFs.readGeometry(spark, path)
    val nCellsGeo = geo.get("n_cells").flatMap(_.toIntOption).getOrElse(0)
    // the chunkers pass the (per-chunk) probe count so the gate never
    // costs a count job of its own; -1 (direct callers) falls back to
    // counting the bounded cached probe frame
    val nP = if (nProbes >= 0L) nProbes else pmv.count()
    val useGroups = geo.get("n_groups").flatMap(_.toIntOption).exists(_ > 0) &&
      coarse.columns.contains("cell_group") && nCellsGeo > 0 &&
      nP * nCellsGeo * dim >= ExactIvf.groupServeFloor(spark)
    val selected =
      if (!useGroups) {
        val pcScored = pmv.crossJoin(broadcast(
            coarse.select("ivf_cell", "ccvm")))
          .select(col("probe_id"), col("pm"), col("ivf_cell"), col("ccvm"),
            l2sq(col("pm"), col("ccvm")).as("cd2"))
        graft.plans.TopK.perKey(pcScored, Seq(pcScored("probe_id")),
          Seq(pcScored("cd2"), pcScored("ivf_cell")), nprobe)
      } else {
        val groupsT = spark.read.parquet(
          graft.streaming.StoreFs.dataDir(spark, s"$path/groups"))
        // per-group max cell-to-group-centroid radius, rounded UP (+1):
        // derived live from the coarse table, one linear ≤ nCells pass
        val grads = coarse.join(broadcast(groupsT), Seq("cell_group"))
          .select(col("cell_group"),
            (ceil(sqrt(l2sq(col("ccvm"), col("gcvm")).cast("double")))
              .cast("long") + lit(1L)).as("crad"))
          .groupBy("cell_group").agg(max(col("crad")).as("grad"))
        val gstats = graft.core.Caches.scoped(
          grads.join(broadcast(groupsT), Seq("cell_group")))
        // lower bound in radius units, rounded DOWN (floor) so fp can
        // only make it SMALLER — pruning stays conservative
        val pg = graft.core.Caches.scoped(
          pmv.crossJoin(broadcast(gstats))
            .select(col("probe_id"), col("cell_group"),
              greatest(lit(0L),
                floor(sqrt(l2sq(col("pm"), col("gcvm")).cast("double")))
                  .cast("long") - col("grad")).as("glb")))
        def cellsIn(qg: DataFrame): DataFrame =
          coarse.select("ivf_cell", "ccvm", "cell_group")
            .join(qg, Seq("cell_group"))
            .join(broadcast(pmv), Seq("probe_id"))
            .select(col("probe_id"), col("pm"), col("ivf_cell"),
              col("ccvm"), l2sq(col("pm"), col("ccvm")).as("cd2"))
        val seedGroups = graft.plans.TopK.perKey(pg, Seq(pg("probe_id")),
            Seq(pg("glb"), pg("cell_group")), nprobe)
          .select(col("probe_id").cast("long").as("probe_id"),
            col("cell_group"))
        val seedCells = cellsIn(seedGroups)
        val dstar = graft.core.Caches.scoped(
          graft.plans.TopK.perKey(seedCells, Seq(seedCells("probe_id")),
              Seq(seedCells("cd2"), seedCells("ivf_cell")), nprobe)
            .groupBy("probe_id")
            .agg(count(lit(1)).as("n"), max(col("cd2")).as("dstar")))
        // a group survives if the probe is underfilled (seed < nprobe
        // cells) or its lb could still beat d* (ceil + 1: rounded UP,
        // ties kept)
        val surv = pg.join(broadcast(dstar), Seq("probe_id"), "left")
          .filter(col("n").isNull || col("n") < nprobe ||
            col("glb") <= ceil(sqrt(col("dstar").cast("double")))
              .cast("long") + lit(1L))
          .select(col("probe_id").cast("long").as("probe_id"),
            col("cell_group"))
        val candCells = cellsIn(surv)
        graft.plans.TopK.perKey(candCells, Seq(candCells("probe_id")),
          Seq(candCells("cd2"), candCells("ivf_cell")), nprobe)
      }
    val probeCells = graft.core.Caches.scoped(
      selected.select(col("probe_id"), col("ivf_cell"),
        zip_with(col("pm"), col("ccvm"), (a, b) => a - b).as("prm")))
    // the codes scan is cell-pruned by DYNAMIC PARTITION PRUNING off
    // the broadcast LUT join (VERDICT r11 #1 — the ExactIvf.scanCells
    // rationale): no driver-side cell-id collect, no O(|probes|·nprobe)
    // literal predicate; the `ivf_cell >= 0` filter is a semantic no-op
    // (trainCoarse numbers cells 0..nCells−1) that satisfies the
    // likely-selective gate so the DPP subquery is inserted on the
    // partition-column key of the (ivf_cell, sub, cell) join.
    // FALLBACK (ADVICE r12, medium — the ExactIvf.scanCells rationale):
    // with the DPP optimizer rule disabled the join would silently scan
    // EVERY cell's codes; the serve checks the conf and falls back to
    // the bounded literal cell-id list (≤ |probes|·nprobe ids, read
    // from the cached probeCells frame) so pruning never vanishes.
    val dpp = ExactIvf.dppEnabled(spark)
    // bucketed layout (VERDICT r12 #1, the ExactIvf.scanCells shape):
    // DPP prunes bucket DIRECTORIES; the ivf_cell key of the same
    // equi-join drops co-bucketed strangers row-side
    val buckets = graft.streaming.StoreFs.readGeometry(spark, path)
      .get("n_buckets").flatMap(_.toIntOption).getOrElse(0)
    val partCol = if (buckets > 0) "cell_bucket" else "ivf_cell"
    val joinKeys =
      if (buckets > 0) Seq("cell_bucket", "ivf_cell", "sub", "cell")
      else Seq("ivf_cell", "sub", "cell")
    val codesAll = spark.read.parquet(codesDir)
    val codes =
      if (dpp) codesAll
      else {
        val cellIds = probeCells.select("ivf_cell").distinct()
          .collect().map(_.getLong(0)).toSeq
        val partIds =
          if (buckets > 0)
            cellIds.map(math.floorMod(_, buckets.toLong)).distinct
          else cellIds
        codesAll.filter(col(partCol).isInCollection(partIds))
      }
    val psv = probeCells.select(col("probe_id"), col("ivf_cell"),
        explode(transform(sequence(lit(0), lit(m - 1)), s =>
          struct(s.as("sub"),
            slice(col("prm"), s * subDim + lit(1), lit(subDim)).as("psvm"))))
          .as("sv"))
      .select(col("probe_id"), col("ivf_cell"),
        col("sv.sub").as("sub"), col("sv.psvm").as("psvm"))
    val lut0 = psv.join(broadcast(books), Seq("sub"))
      .select(col("probe_id"), col("ivf_cell"), col("sub"),
        col("cent_id").as("cell"), l2sq(col("psvm"), col("cvm")).as("pd2"))
    val lut1 = ExactIvf.withBucketCol(lut0, buckets)
    val lut = if (dpp) lut1.filter(col(partCol) >= 0) else lut1
    // visibility AFTER the cell-pruned LUT join (the joins run on
    // pruned candidates, and the DPP plan shape upstream stays
    // byte-identical) and BEFORE the kShort cut — a deleted or
    // disallowed id never consumes a shortlist slot. Tombstones
    // EXCLUDE (anti); a caller filter RESTRICTS (semi) — round 15,
    // the planServe visibility contract on the approximate path.
    val cand0 = codes.join(broadcast(lut), joinKeys)
      .filter(col("vec_id") =!= col("probe_id"))
    val cand1 = tombs.fold(cand0)(t => cand0.join(t, Seq("vec_id"),
      "left_anti"))
    val cand = allowed.fold(cand1)(a => cand1.join(a, Seq("vec_id"),
      "left_semi"))
    val scored = cand
      .groupBy(col("probe_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(col("pd2")).as("adc_d2"))
    graft.plans.TopK.perKey(scored, Seq(scored("probe_id")),
        Seq(scored("adc_d2"), scored("neighbor_id")), kShort)
      .select(col("probe_id"), col("neighbor_id"), col("adc_d2"))
  }

  private def ivfadcRerank(emb: DataFrame, shortl: DataFrame,
                           probeRows: DataFrame, k: Int,
                           vecCol: String): DataFrame = {
    val mv = microVectors(emb, vecCol)
    val probes = microVectors(probeRows, vecCol).toDF("probe_id", "pm")
    val sl = shortl.select("probe_id", "neighbor_id")
    val scored = mv.join(broadcast(sl), mv("vec_id") === sl("neighbor_id"))
      .join(broadcast(probes), Seq("probe_id"))
      .select(col("probe_id"), col("neighbor_id"),
        l2sq(col("pm"), col("vm")).as("d2"))
    val w = Window.partitionBy("probe_id").orderBy(col("d2"), col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** IVFADC recall panel from the store: the raw cell-restricted ADC
    * shortlist cut to k (measured floor) and the re-ranked production
    * path (user bound), both vs exact integer-L2 truth on the bounded
    * probes. Output: the x43-shaped panel rows. */
  def ivfadcRecallPanel(spark: org.apache.spark.sql.SparkSession,
                        path: String, emb: DataFrame, nProbes: Int,
                        nprobe: Int, kShort: Int, k: Int, m: Int, dim: Int,
                        rawBound: Double, rerankBound: Double,
                        vecCol: String = "embedding"): DataFrame = {
    val probeIds = Similarity.boundedProbeIds(emb, nProbes)
    val probeRows = graft.core.Caches.scoped(
      emb.filter(col("vec_id").isInCollection(probeIds)))
    val eff = graft.streaming.StoreFs.liveRoot(spark, path)
    val coarse = spark.read.parquet(s"$eff/coarse")
    val books = spark.read.parquet(s"$eff/books")
    val shortl = graft.core.Caches.scoped(ivfadcShortlist(spark, eff,
      probeRows, nprobe, kShort, m, dim, coarse, books, vecCol,
      graft.streaming.StoreFs.dataDir(spark, s"$eff/codes"),
      tombs = graft.streaming.StoreFs.liveTombsDir(spark, eff)
        .map(d => graft.streaming.StoreFs.readTombstones(spark, d,
          "vec_id"))))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("adc_d2"), col("neighbor_id"))
    val raw = shortl.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k).select("probe_id", "neighbor_id")
    val reranked = ivfadcRerank(emb, shortl, probeRows, k, vecCol)
      .select("probe_id", "neighbor_id")
    val exact = graft.core.Caches.scoped(
      l2TopK(emb, probeIds, k, vecCol).select("probe_id", "neighbor_id"))
    val nP = emb.filter(col("vec_id").isInCollection(probeIds))
      .select(count(lit(1)).as("n_probes"))
    Similarity.recallPanel(nP, k, Seq(
      ("ivfadc_rerank", reranked, exact, rerankBound),
      ("ivfadc_raw", raw, exact, rawBound)))
  }

  /** Recall panel of ADC paths against exact integer-L2 truth, in the
    * x43/x55 shape (one row per method: method, n_probes, total_hits,
    * recall, recall_ok). `variants` = (method, iters, kShort, bound):
    * kShort = 0 grades the raw ADC scan (measured floor — a training
    * regression flips it); kShort > 0 grades the re-ranked production
    * path at the user bound. */
  def adcRecallPanel(emb: DataFrame, m: Int, dim: Int, nCents: Int,
                     nProbes: Int, k: Int,
                     variants: Seq[(String, Int, Int, Double)]): DataFrame = {
    val probeIds = Similarity.boundedProbeIds(emb, nProbes)
    val exact = graft.core.Caches.scoped(
      l2TopK(emb, probeIds, k).select("probe_id", "neighbor_id"))
    val nP = emb.filter(col("vec_id").isInCollection(probeIds))
      .select(count(lit(1)).as("n_probes"))
    Similarity.recallPanel(nP, k,
      variants.map { case (name, iters, kShort, bound) =>
        val books = trainCodebooks(emb, m, dim, nCents, iters)
        val approx =
          if (kShort > 0) adcRerankTopK(emb, books, probeIds, kShort, k, m, dim)
          else adcTopK(emb, books, probeIds, k, m, dim)
        (name, approx, exact, bound)
      })
  }
}
