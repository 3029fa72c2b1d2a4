package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables._
import graft.operators.{Pq, Similarity}
import graft.functions.VectorFunctions

/** Similarity suite (SURVEY §2.13 Q17 + extensions): exact top-k cosine,
  * embedding near-dup pairs, and the LSH-bucketed approximate path.
  *
  * Oracles compute cosine as list_dot_product over DOUBLE[] casts; Spark
  * computes it with the native codegen'd CosineSimilarity expression. Both
  * round to 6 decimals in the output (accumulation-order differences live
  * around 1e-15).
  */
object SimilarityQueries {

  private val cosSql =
    """CASE WHEN list_dot_product(av, av) = 0 OR list_dot_product(pv, pv) = 0 THEN 0.0
      |     ELSE list_dot_product(pv, av)
      |          / (sqrt(list_dot_product(pv, pv)) * sqrt(list_dot_product(av, av))) END"""
      .stripMargin

  // --- Q17: exact brute-force top-5 cosine neighbors per probe
  val q17 = Query(
    "q17_similarity_topk",
    Some(s"""
      WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      probes AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id % 50 = 0),
      scored AS (
        SELECT probe_id, a.vec_id AS neighbor_id, a.label, a.v AS av, pv
        FROM e a CROSS JOIN probes WHERE a.vec_id <> probe_id),
      ranked AS (
        SELECT probe_id, neighbor_id, label,
               $cosSql AS cos_raw,
               CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
                 ORDER BY $cosSql DESC, neighbor_id) AS INT) AS rk
        FROM scored)
      SELECT probe_id, neighbor_id, label, ROUND(cos_raw, 6) AS cos, rk
      FROM ranked WHERE rk <= 5
      ORDER BY probe_id, rk""")
  ) { (s, d) =>
    Similarity.bruteForceTopK(embeddings(s, d), col("vec_id") % 50 === 0, k = 5)
      .orderBy("probe_id", "rk")
  }

  // --- X4/X5 shared LSH bucketing (4 sign-bit hyperplanes over dim 64)
  private val NBits = 4
  private[queries] val Dim = 64
  private[queries] def planeSql(j: Int): String =
    VectorFunctions.plane(j, Dim).map(_.toString).mkString("[", ",", "]::DOUBLE[]")
  private val bucketSql: String =
    (0 until NBits).map { j =>
      s"(CASE WHEN list_dot_product(v, ${planeSql(j)}) >= 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")

  // --- X4: embedding near-duplicate pairs (cos ≥ 0.4), LSH-bucketed —
  // candidates come from a per-bucket equi-join (Σ|bucket|² pairs, never
  // the all-pairs cross join); the exact cosine then filters. The
  // brute-force variant survives only as the recall oracle in
  // SimilaritySpec.
  val x04 = Query(
    "x04_neardup_embedding",
    Some(s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      bk AS (SELECT vec_id, v, CAST($bucketSql AS INT) AS bucket FROM e),
      pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.v AS pv, b.v AS av
        FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
      SELECT vec_a, vec_b, ROUND($cosSql, 6) AS cos
      FROM pairs
      WHERE $cosSql >= 0.4
      ORDER BY vec_a, vec_b""")
  ) { (s, d) =>
    Similarity.nearDupPairsBucketed(embeddings(s, d), threshold = 0.4,
        nBits = NBits, dim = Dim)
      .orderBy("vec_a", "vec_b")
  }
  // --- X5: LSH-bucketed approximate top-3 (the IVF-style scale path)
  val x05 = Query(
    "x05_similarity_lsh",
    Some(s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      b AS (SELECT vec_id, v, CAST($bucketSql AS INT) AS bucket FROM e),
      probes AS (SELECT vec_id AS probe_id, v AS pv, bucket FROM b WHERE vec_id % 25 = 0),
      cands AS (
        SELECT probe_id, a.vec_id AS neighbor_id, a.bucket, a.v AS av, pv
        FROM b a JOIN probes USING (bucket) WHERE a.vec_id <> probe_id),
      ranked AS (
        SELECT probe_id, neighbor_id, bucket,
               $cosSql AS cos_raw,
               CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
                 ORDER BY $cosSql DESC, neighbor_id) AS INT) AS rk
        FROM cands)
      SELECT probe_id, neighbor_id, bucket, ROUND(cos_raw, 6) AS cos, rk
      FROM ranked WHERE rk <= 3
      ORDER BY probe_id, rk""")
  ) { (s, d) =>
    Similarity.lshBucketed(embeddings(s, d), col("vec_id") % 25 === 0, k = 3,
        nBits = NBits, dim = Dim)
      .orderBy("probe_id", "rk")
  }

  // --- X34: IVF-style ANN — a coarse quantizer (nearest centroid by
  // cosine, computed as a broadcast join + TopKPerKey k=1) assigns every
  // vector to a cell; search joins probes to their cell only. Unlike x05's
  // fixed hyperplanes the codebook is data-derived (here: a deterministic
  // subsample standing in for trained k-means centroids; at 100 TB the
  // codebook is a fixed broadcast table, so assignment is linear — C cells,
  // |corpus|·C comparisons, never |corpus|²).
  val x34 = Query(
    "x34_similarity_ivf",
    Some(s"""
      WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      c AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id % 125 = 0),
      assign AS (
        SELECT vec_id, label, v, cent_id, $cosSql AS a_cos
        FROM (SELECT e.vec_id, e.label, e.v, c.cent_id, e.v AS av, c.cv AS pv
              FROM e CROSS JOIN c)),
      cells AS (
        SELECT vec_id, label, v, cent_id AS cell FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY a_cos DESC, cent_id) AS arn
          FROM assign) WHERE arn = 1),
      probes AS (SELECT vec_id AS probe_id, v AS pv, cell FROM cells WHERE vec_id % 50 = 0),
      cands AS (
        SELECT probe_id, a.vec_id AS neighbor_id, a.cell, a.v AS av, pv
        FROM cells a JOIN probes USING (cell) WHERE a.vec_id <> probe_id),
      ranked AS (
        SELECT probe_id, neighbor_id, cell,
               $cosSql AS cos_raw,
               CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
                 ORDER BY $cosSql DESC, neighbor_id) AS INT) AS rk
        FROM cands)
      SELECT probe_id, neighbor_id, cell, ROUND(cos_raw, 6) AS cos, rk
      FROM ranked WHERE rk <= 3
      ORDER BY probe_id, rk""")
  ) { (s, d) =>
    Similarity.ivfTopK(embeddings(s, d),
        centPred = col("vec_id") % 125 === 0,
        probePred = col("vec_id") % 50 === 0, k = 3)
      .orderBy("probe_id", "rk")
  }

  // --- X43: graded ANN recall — the quality dimension x05/x34 can't see:
  // their oracles replay the same bucketing, so a recall regression (too
  // many hyperplanes, degenerate codebook) still hash-matches. Here
  // recall@k of each approximate path against the exact brute-force top-k
  // is itself the result, with a self-graded bound flag (the q08b/x35
  // sketch pattern): `recall_ok` flips if the bucketing stops finding the
  // true neighbors. Same probe set (vec_id % 50) across all three paths;
  // recall = one integer hit count / one integer denominator — a single
  // double division, no float aggregation order.
  private val RecallBound = 0.3
  /** Re-benchmarked regression FLOORS for the WEAK baselines on the
    * unbiased hash-ordered probe set (x43's single-probe LSH at
    * nBits = 4 honestly finds ~0.06-0.24 of true top-3 across the graded
    * SFs; single-cell untrained IVF ~0.18-0.35): the floors pin the
    * baselines so a bucketing collapse (recall -> 0) still flips the
    * flag, while the production paths (x55 multiprobe/trained) carry the
    * >= 0.6 grade. The old %50 probe ids overlapped the %125 centroid
    * lattice (ids % 250 were probes AND centroids), inflating every
    * panel's recall — the bounded probe rework re-based all bounds on
    * unbiased probes. */
  private val LshFloor = 0.05
  private val IvfFloor = 0.15
  /** Bounded deterministic probe set for the recall panels (x43/x55 here,
    * x88/y06 in their suites): the NProbesBound smallest (md5(id), id)
    * members — fixed-size truth side at any corpus scale, replayed
    * identically by Spark (`Similarity.withBoundedProbeFlag`). */
  private[queries] val NProbesBound = 32
  private[queries] def pidsCteSql(src: String, idCol: String = "vec_id"): String =
    s"pids AS (SELECT $idCol FROM $src " +
      s"ORDER BY md5(CAST($idCol AS VARCHAR)), $idCol LIMIT $NProbesBound)"
  val x43 = Query(
    "x43_ann_recall",
    Some(s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      ${pidsCteSql("e")},
      probes AS (SELECT vec_id AS probe_id, v AS pv FROM e JOIN pids USING (vec_id)),
      np AS (SELECT CAST(count(*) AS BIGINT) AS n_probes FROM probes),
      ex_scored AS (
        SELECT probe_id, a.vec_id AS neighbor_id, a.v AS av, pv
        FROM e a CROSS JOIN probes WHERE a.vec_id <> probe_id),
      ex_ranked AS (
        SELECT probe_id, neighbor_id, ROW_NUMBER() OVER (PARTITION BY probe_id
          ORDER BY $cosSql DESC, neighbor_id) AS rk
        FROM ex_scored),
      exact AS (SELECT probe_id, neighbor_id FROM ex_ranked WHERE rk <= 3),
      b AS (SELECT vec_id, v, CAST($bucketSql AS INT) AS bucket FROM e),
      lp AS (SELECT vec_id AS probe_id, v AS pv, bucket FROM b JOIN pids USING (vec_id)),
      lc AS (
        SELECT probe_id, a.vec_id AS neighbor_id, a.v AS av, pv
        FROM b a JOIN lp USING (bucket) WHERE a.vec_id <> probe_id),
      lr AS (
        SELECT probe_id, neighbor_id, ROW_NUMBER() OVER (PARTITION BY probe_id
          ORDER BY $cosSql DESC, neighbor_id) AS rk
        FROM lc),
      lsh AS (SELECT probe_id, neighbor_id FROM lr WHERE rk <= 3),
      c AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id % 125 = 0),
      assign AS (
        SELECT vec_id, v, cent_id, $cosSql AS a_cos
        FROM (SELECT e.vec_id, e.v, c.cent_id, e.v AS av, c.cv AS pv
              FROM e CROSS JOIN c)),
      cells AS (
        SELECT vec_id, v, cent_id AS cell FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY a_cos DESC, cent_id) AS arn
          FROM assign) WHERE arn = 1),
      ip AS (SELECT vec_id AS probe_id, v AS pv, cell FROM cells JOIN pids USING (vec_id)),
      ic AS (
        SELECT probe_id, a.vec_id AS neighbor_id, a.v AS av, pv
        FROM cells a JOIN ip USING (cell) WHERE a.vec_id <> probe_id),
      ir AS (
        SELECT probe_id, neighbor_id, ROW_NUMBER() OVER (PARTITION BY probe_id
          ORDER BY $cosSql DESC, neighbor_id) AS rk
        FROM ic),
      ivf AS (SELECT probe_id, neighbor_id FROM ir WHERE rk <= 3),
      hits AS (
        SELECT 'lsh' AS method, CAST(count(*) AS BIGINT) AS total_hits,
               $LshFloor AS bound
        FROM lsh SEMI JOIN exact USING (probe_id, neighbor_id)
        UNION ALL
        SELECT 'ivf' AS method, CAST(count(*) AS BIGINT) AS total_hits,
               $IvfFloor AS bound
        FROM ivf SEMI JOIN exact USING (probe_id, neighbor_id))
      SELECT method, n_probes, total_hits,
             CAST(total_hits AS DOUBLE) / (n_probes * 3) AS recall,
             CASE WHEN CAST(total_hits AS DOUBLE) / (n_probes * 3) >= bound
                  THEN 1 ELSE 0 END AS recall_ok
      FROM hits, np
      ORDER BY method""")
  ) { (s, d) =>
    val emb = embeddings(s, d)
    val probePred = col("vec_id").isInCollection(
      Similarity.boundedProbeIds(emb, NProbesBound))
    Similarity.recallForMethods(emb, probePred, k = 3, Seq(
        ("lsh", Similarity.lshBucketed(emb, probePred, k = 3,
          nBits = NBits, dim = Dim), LshFloor),
        ("ivf", Similarity.ivfTopK(emb,
          centPred = col("vec_id") % 125 === 0, probePred, k = 3), IvfFloor)))
      .orderBy("method")
  }

  // --- X46: embedding near-dup with the hyperplane count derived from
  // corpus size (targetOcc=16, maxBits=12) — the scale fix for x04's
  // measured fixed-bucket growth (SCALE.md: 5.2× wall at 10× data because
  // Σ|bucket|² is quadratic at constant bucket count). nBits is a count
  // of integer comparisons (n > 16·2^(j-1)) — deliberately NOT
  // ceil(log2(...)), which differs cross-engine in the last ulp exactly
  // at power-of-two boundaries. The oracle replays the mask bit-for-bit.
  private[queries] val TargetOcc = 16
  private[queries] val MaxBits = 12
  /** Corpus-adaptive bit count + masked bucket as SQL (shared by the
    * x46/x61 oracles and, at a wider maxBits, by the semantic-dedup
    * suite — integer comparisons, never ceil(log2(...))). */
  private[queries] def nbitsSqlFor(targetOcc: Int, maxBits: Int): String =
    (1 to maxBits)
      .map(j => s"CASE WHEN cnt > ${targetOcc.toLong * (1L << (j - 1))} THEN 1 ELSE 0 END")
      .mkString(" + ")
  private[queries] def maskedBucketSqlFor(maxBits: Int): String =
    maskedBucketSqlVar(maxBits, "nbits")
  /** [[maskedBucketSqlFor]] with the bit-count variable name explicit —
    * the x90 refinement buckets the same vector under `nbits` AND the
    * wider `nbits2` in one CTE. */
  private[queries] def maskedBucketSqlVar(maxBits: Int, bitsVar: String): String =
    (0 until maxBits)
      .map(j => s"(CASE WHEN $j < $bitsVar AND list_dot_product(v, ${planeSql(j)}) >= 0" +
        s" THEN ${1 << j} ELSE 0 END)")
      .mkString(" + ")
  private[queries] val nbitsSql = nbitsSqlFor(TargetOcc, MaxBits)
  private[queries] val maskedBucketSql = maskedBucketSqlFor(MaxBits)
  /** The semantic-dedup suite's wider mask (x79/x80/x81): every vector
    * is in exactly ONE bucket there (no multi-probe expansion), so the
    * bucket-count ceiling 2^maxBits is the only thing standing between
    * the pair join and quadratic growth once n > targetOcc·2^maxBits —
    * the 100× probe measured exactly that at maxBits=12 (4096-bucket
    * saturation ⇒ 68× wall for 100× data). 20 bits defers saturation to
    * a ~17M-vector partition at occupancy 16; below saturation the extra
    * masked hyperplane dots are per-row noise and the graded sf-scale
    * outputs are bit-identical (nbits depends only on the corpus count). */
  private[queries] val DedupMaxBits = 20
  val x46 = Query(
    "x46_neardup_autolsh",
    Some {
      s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      nc AS (SELECT count(*) AS cnt FROM embeddings),
      nb AS (SELECT CAST($nbitsSql AS INT) AS nbits FROM nc),
      bk AS (SELECT vec_id, v, CAST($maskedBucketSql AS INT) AS bucket FROM e, nb),
      pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.v AS pv, b.v AS av
        FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
      SELECT vec_a, vec_b, ROUND($cosSql, 6) AS cos
      FROM pairs
      WHERE $cosSql >= 0.4
      ORDER BY vec_a, vec_b"""
    }
  ) { (s, d) =>
    Similarity.nearDupPairsAutoBucketed(embeddings(s, d), threshold = 0.4,
        targetOcc = TargetOcc, maxBits = MaxBits, dim = Dim)
      .orderBy("vec_a", "vec_b")
  }

  // --- X48: multi-probe LSH — the recall lever at constant nBits: each
  // probe also searches the nBits Hamming-distance-1 buckets (one sign
  // flipped). Corpus vectors stay in exactly one bucket, so candidates
  // are never duplicated; the probe side explodes (nBits+1)×. The oracle
  // replays the probe-bucket expansion with xor().
  val x48 = Query(
    "x48_similarity_multiprobe",
    Some {
      val probeList = ("bucket" +: (0 until NBits).map(j => s"xor(bucket, ${1 << j})"))
        .mkString("[", ", ", "]")
      s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      b AS (SELECT vec_id, v, CAST($bucketSql AS INT) AS bucket FROM e),
      probes AS (
        SELECT vec_id AS probe_id, v AS pv,
               CAST(unnest($probeList) AS INT) AS bucket
        FROM b WHERE vec_id % 25 = 0),
      cands AS (
        SELECT probe_id, a.vec_id AS neighbor_id, a.bucket, a.v AS av, pv
        FROM b a JOIN probes USING (bucket) WHERE a.vec_id <> probe_id),
      ranked AS (
        SELECT probe_id, neighbor_id, bucket,
               $cosSql AS cos_raw,
               CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
                 ORDER BY $cosSql DESC, neighbor_id) AS INT) AS rk
        FROM cands)
      SELECT probe_id, neighbor_id, bucket, ROUND(cos_raw, 6) AS cos, rk
      FROM ranked WHERE rk <= 3
      ORDER BY probe_id, rk"""
    }
  ) { (s, d) =>
    Similarity.lshBucketedMultiProbe(embeddings(s, d),
        col("vec_id") % 25 === 0, k = 3, nBits = NBits, dim = Dim)
      .orderBy("probe_id", "rk")
  }

  // --- X47: TRAINED IVF codebook — k-means (Lloyd, 2 iterations) on
  // 6-decimal-quantized vectors, closing x34's "sampled rows stand in
  // for trained centroids" caveat. Every iteration is replayed by the
  // oracle bit-for-bit: quantized inputs cast exactly to DECIMAL(18,8),
  // centroid means are exact decimal sums / integer counts re-quantized
  // to 6 decimals, assignment is argmax cosine with cent_id tie-break.
  // Output: per final cell — size, centroid norm, mean assignment cosine.
  /** Shared k-means CTE chain (no leading WITH): eq (quantized vectors) →
    * c0 (deterministic bounded init) → two Lloyd iterations (a1,c1,a2,c2)
    * → a3 (final assignment: vec_id, vq, cell, a_cos). x47 appends the
    * codebook-stats tail, x54 the trained cell-restricted search, x55 the
    * trained recall row. */
  private[queries] val kmeansCtes: String = {
    def assignCte(i: Int, centTable: String) = s"""
      a$i AS (
        SELECT vec_id, vq, cell, a_cos FROM (
          SELECT vec_id, vq, cent_id AS cell, $cosSql AS a_cos,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY $cosSql DESC, cent_id) AS rn
          FROM (SELECT e.vec_id, e.vq, c.cent_id, e.vq AS pv, c.cv AS av
                FROM eq e CROSS JOIN $centTable c))
        WHERE rn = 1)"""
    def updateCtes(i: Int) = s"""
      s$i AS (
        SELECT cell, d, CAST(SUM(CAST(vq[d] AS DECIMAL(18,8))) AS DOUBLE)
               / COUNT(*) AS m
        FROM a$i, UNNEST(range(1, ${Dim + 1})) t(d)
        GROUP BY cell, d),
      c$i AS (
        SELECT cell AS cent_id,
               list_transform(list(m ORDER BY d), x -> round(x, 6)) AS cv
        FROM s$i GROUP BY cell)"""
    s"""eq AS (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]), x -> round(x, 6)) AS vq
        FROM embeddings),
      c0 AS (SELECT vec_id AS cent_id, vq AS cv FROM eq
             WHERE vec_id % 125 = 0 ORDER BY vec_id LIMIT 32),
      ${assignCte(1, "c0")},
      ${updateCtes(1)},
      ${assignCte(2, "c1")},
      ${updateCtes(2)},
      ${assignCte(3, "c2")}"""
  }

  private val kmeansOracle: String = s"""
      WITH $kmeansCtes,
      norms AS (
        SELECT cent_id AS cell,
               round(sqrt(list_dot_product(cv, cv)), 6) AS centroid_norm
        FROM c2),
      stats AS (
        SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(SUM(CAST(round(a_cos, 6) AS DECIMAL(18,8))) AS DOUBLE)
               / COUNT(*) AS avg_cos
        FROM a3 GROUP BY cell)
      SELECT s.cell, s.n_vecs, n.centroid_norm, s.avg_cos
      FROM stats s JOIN norms n USING (cell)
      ORDER BY cell"""

  val x47 = Query("x47_kmeans_codebook", Some(kmeansOracle)) { (s, d) =>
    import org.apache.spark.sql.types.DecimalType
    val emb = embeddings(s, d)
    val e = emb.select(col("vec_id"), Similarity.quantize(col("embedding")).as("vq"))
    // the trained codebook feeds the final assignment AND the norm table
    val cb = graft.core.Caches.scoped(
      Similarity.kmeansCodebook(emb, col("vec_id") % 125 === 0, iters = 2))
    val assigned = Similarity.assignCells(e, cb)
    val stats = assigned.groupBy("cell").agg(
      count(lit(1)).as("n_vecs"),
      (sum(round(col("a_cos"), 6).cast(DecimalType(18, 8))).cast("double")
        / count(lit(1))).as("avg_cos"))
    val norms = cb.select(col("cent_id").as("cell"),
      round(sqrt(aggregate(zip_with(col("cv"), col("cv"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v)), 6).as("centroid_norm"))
    stats.join(norms, "cell")
      .select("cell", "n_vecs", "centroid_norm", "avg_cos")
      .orderBy("cell")
  }

  // --- Y02: CLUSTER-BALANCED SELECTION — per-centroid quotas over the
  // trained k-means cells (the diversity lever of cluster-based data
  // selection: giant near-duplicate clusters cap at Q representatives,
  // small clusters keep everything, so the selected set covers the
  // embedding space instead of echoing its densest mode). Keeps the Q
  // MOST CENTRAL members per cell (assignment cosine DESC — prototype
  // selection) through the two-phase TopKPerKey, so hot cells cap at Q
  // per map partition and no corpus-wide window exists; the residual
  // row_number runs over ≤ Q·cells survivor rows. Per-row output carries
  // the cell's total population — the selected-vs-population ratio is
  // the balance evidence.
  private val CellQuota = 5
  val y02 = Query(
    "y02_cluster_quota",
    Some(s"""
      WITH $kmeansCtes,
      r AS (SELECT cell, vec_id, a_cos,
              CAST(row_number() OVER (PARTITION BY cell
                ORDER BY a_cos DESC, vec_id) AS INT) AS rk
            FROM a3),
      cnt AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_cell
              FROM a3 GROUP BY cell)
      SELECT r.cell, r.vec_id, r.rk, ROUND(r.a_cos, 6) AS cos, c.n_cell
      FROM r JOIN cnt c USING (cell) WHERE r.rk <= $CellQuota
      ORDER BY r.cell, r.rk""")
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val emb = embeddings(s, d)
    val e = emb.select(col("vec_id"), Similarity.quantize(col("embedding")).as("vq"))
    val cb = graft.core.Caches.scoped(
      Similarity.kmeansCodebook(emb, col("vec_id") % 125 === 0, iters = 2))
    val assigned = graft.core.Caches.scoped(Similarity.assignCells(e, cb))
    val kept = graft.plans.TopK.perKey(assigned, Seq(assigned("cell")),
      Seq(assigned("a_cos").desc, assigned("vec_id")), k = CellQuota)
    // bounded residual window: ≤ Q rows per cell survive TopKPerKey
    val w = Window.partitionBy("cell").orderBy(col("a_cos").desc, col("vec_id"))
    val counts = assigned.groupBy("cell").agg(count(lit(1)).as("n_cell"))
    kept.withColumn("rk", row_number().over(w))
      .join(broadcast(counts), "cell")
      .select(col("cell"), col("vec_id"), col("rk"),
        round(col("a_cos"), 6).as("cos"), col("n_cell"))
      .orderBy("cell", "rk")
  }

  // --- X54: TRAINED IVF search END-TO-END — the composition x47 trains
  // for: kmeansCodebook → assignCells → cell-restricted search, all on
  // the 6-decimal-quantized vectors, graded as one flow, with
  // nprobe = NProbeCells (each probe searches its NProbeCells nearest
  // cells — the IVF recall lever; the corpus stays single-cell so no
  // candidate duplicates). The oracle replays the two Lloyd iterations
  // (shared kmeansCtes — identical text to x47's), the probe-side
  // top-NProbeCells cell ranking against the final
  // codebook c2, and the search over the final assignment a3. This is
  // the flow an ANN user actually runs; x34 remains the untrained
  // skeleton.
  private val NProbeCells = 3
  private def trainedSearchCtesFor(probeCond: String,
                                   nprobe: Int = NProbeCells): String = s"""
      pa AS (
        SELECT vec_id, vq, cell FROM (
          SELECT vec_id, vq, cent_id AS cell,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY $cosSql DESC, cent_id) AS rn
          FROM (SELECT e.vec_id, e.vq, c.cent_id, e.vq AS pv, c.cv AS av
                FROM eq e CROSS JOIN c2 c
                WHERE $probeCond))
        WHERE rn <= $nprobe),
      tprobes AS (SELECT vec_id AS probe_id, vq AS pv, cell FROM pa),
      tcands AS (
        SELECT probe_id, a.vec_id AS neighbor_id, a.cell, a.vq AS av, pv
        FROM a3 a JOIN tprobes USING (cell) WHERE a.vec_id <> probe_id)"""
  private val trainedSearchCtes: String =
    trainedSearchCtesFor("e.vec_id % 50 = 0")
  val x54 = Query(
    "x54_ivf_trained",
    Some(s"""
      WITH $kmeansCtes,
      $trainedSearchCtes,
      ranked AS (
        SELECT probe_id, neighbor_id, cell,
               $cosSql AS cos_raw,
               CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
                 ORDER BY $cosSql DESC, neighbor_id) AS INT) AS rk
        FROM tcands)
      SELECT probe_id, neighbor_id, cell, ROUND(cos_raw, 6) AS cos, rk
      FROM ranked WHERE rk <= 3
      ORDER BY probe_id, rk""")
  ) { (s, d) =>
    Similarity.ivfTrainedTopK(embeddings(s, d),
        initPred = col("vec_id") % 125 === 0, iters = 2,
        probePred = col("vec_id") % 50 === 0, k = 3, nProbeCells = NProbeCells)
      .orderBy("probe_id", "rk")
  }

  // --- X55: recall grading of ALL FOUR ANN paths — the two baselines x43
  // already grades (single-probe LSH, untrained IVF, weak bound) plus the
  // two production paths built to raise recall: multi-probe LSH and the
  // TRAINED IVF. The good paths carry the user-grade bound (≥ 0.6): a
  // recall regression in the path a user would actually run now flips a
  // graded flag, not just a weak-baseline one.
  private val TrainedBound = 0.6
  private val MultiProbeBound = 0.6
  /** Production-path dials retuned for the unbiased probe set: the
    * trained IVF searches 6 nearest cells (3 was tuned on the correlated
    * probes and reads 0.50 at sf0.1 on unbiased ones) and the
    * multi-probe LSH flips up to 2 of the 4 hyperplane signs. */
  private val PanelNProbeCells = 6
  private val PanelRadius = 2
  val x55 = Query(
    "x55_ann_recall_trained",
    Some {
      val masks = (for (i <- 0 until NBits) yield 1 << i) ++
        (for (i <- 0 until NBits; j <- i + 1 until NBits) yield (1 << i) | (1 << j))
      val probeList = ("bucket" +: masks.map(m => s"xor(bucket, $m)"))
        .mkString("[", ", ", "]")
      s"""
      WITH $kmeansCtes,
      e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      ${pidsCteSql("e")},
      probes AS (SELECT vec_id AS probe_id, v AS pv FROM e JOIN pids USING (vec_id)),
      np AS (SELECT CAST(count(*) AS BIGINT) AS n_probes FROM probes),
      ex_scored AS (
        SELECT probe_id, a.vec_id AS neighbor_id, a.v AS av, pv
        FROM e a CROSS JOIN probes WHERE a.vec_id <> probe_id),
      ex_ranked AS (
        SELECT probe_id, neighbor_id, ROW_NUMBER() OVER (PARTITION BY probe_id
          ORDER BY $cosSql DESC, neighbor_id) AS rk
        FROM ex_scored),
      exact AS (SELECT probe_id, neighbor_id FROM ex_ranked WHERE rk <= 3),
      b AS (SELECT vec_id, v, CAST($bucketSql AS INT) AS bucket FROM e),
      lp AS (SELECT vec_id AS probe_id, v AS pv, bucket FROM b JOIN pids USING (vec_id)),
      lc AS (
        SELECT probe_id, a.vec_id AS neighbor_id, a.v AS av, pv
        FROM b a JOIN lp USING (bucket) WHERE a.vec_id <> probe_id),
      lr AS (
        SELECT probe_id, neighbor_id, ROW_NUMBER() OVER (PARTITION BY probe_id
          ORDER BY $cosSql DESC, neighbor_id) AS rk
        FROM lc),
      lsh AS (SELECT probe_id, neighbor_id FROM lr WHERE rk <= 3),
      mp AS (
        SELECT vec_id AS probe_id, v AS pv,
               CAST(unnest($probeList) AS INT) AS bucket
        FROM b JOIN pids USING (vec_id)),
      mc AS (
        SELECT probe_id, a.vec_id AS neighbor_id, a.v AS av, pv
        FROM b a JOIN mp USING (bucket) WHERE a.vec_id <> probe_id),
      mr AS (
        SELECT probe_id, neighbor_id, ROW_NUMBER() OVER (PARTITION BY probe_id
          ORDER BY $cosSql DESC, neighbor_id) AS rk
        FROM mc),
      mpr AS (SELECT probe_id, neighbor_id FROM mr WHERE rk <= 3),
      c AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id % 125 = 0),
      assign AS (
        SELECT vec_id, v, cent_id, $cosSql AS a_cos
        FROM (SELECT e.vec_id, e.v, c.cent_id, e.v AS av, c.cv AS pv
              FROM e CROSS JOIN c)),
      cells AS (
        SELECT vec_id, v, cent_id AS cell FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY a_cos DESC, cent_id) AS arn
          FROM assign) WHERE arn = 1),
      ip AS (SELECT vec_id AS probe_id, v AS pv, cell FROM cells JOIN pids USING (vec_id)),
      ic AS (
        SELECT probe_id, a.vec_id AS neighbor_id, a.v AS av, pv
        FROM cells a JOIN ip USING (cell) WHERE a.vec_id <> probe_id),
      ir AS (
        SELECT probe_id, neighbor_id, ROW_NUMBER() OVER (PARTITION BY probe_id
          ORDER BY $cosSql DESC, neighbor_id) AS rk
        FROM ic),
      ivf AS (SELECT probe_id, neighbor_id FROM ir WHERE rk <= 3),
      ${trainedSearchCtesFor("e.vec_id IN (SELECT vec_id FROM pids)",
        PanelNProbeCells)},
      tr AS (
        SELECT probe_id, neighbor_id, ROW_NUMBER() OVER (PARTITION BY probe_id
          ORDER BY $cosSql DESC, neighbor_id) AS rk
        FROM tcands),
      tivf AS (SELECT probe_id, neighbor_id FROM tr WHERE rk <= 3),
      hits AS (
        SELECT 'ivf' AS method, CAST(count(*) AS BIGINT) AS total_hits,
               $IvfFloor AS bound
        FROM ivf SEMI JOIN exact USING (probe_id, neighbor_id)
        UNION ALL
        SELECT 'ivf_trained', CAST(count(*) AS BIGINT), $TrainedBound
        FROM tivf SEMI JOIN exact USING (probe_id, neighbor_id)
        UNION ALL
        SELECT 'lsh', CAST(count(*) AS BIGINT), $LshFloor
        FROM lsh SEMI JOIN exact USING (probe_id, neighbor_id)
        UNION ALL
        SELECT 'lsh_multiprobe', CAST(count(*) AS BIGINT), $MultiProbeBound
        FROM mpr SEMI JOIN exact USING (probe_id, neighbor_id))
      SELECT method, n_probes, total_hits,
             CAST(total_hits AS DOUBLE) / (n_probes * 3) AS recall,
             CASE WHEN CAST(total_hits AS DOUBLE) / (n_probes * 3) >= bound
                  THEN 1 ELSE 0 END AS recall_ok
      FROM hits, np
      ORDER BY method"""
    }
  ) { (s, d) =>
    val emb = embeddings(s, d)
    val probePred = col("vec_id").isInCollection(
      Similarity.boundedProbeIds(emb, NProbesBound))
    Similarity.recallForMethods(emb, probePred, k = 3, Seq(
      ("ivf", Similarity.ivfTopK(emb,
        centPred = col("vec_id") % 125 === 0, probePred, k = 3), IvfFloor),
      ("ivf_trained", Similarity.ivfTrainedTopK(emb,
        initPred = col("vec_id") % 125 === 0, iters = 2, probePred, k = 3,
        nProbeCells = PanelNProbeCells), TrainedBound),
      ("lsh", Similarity.lshBucketed(emb, probePred, k = 3,
        nBits = NBits, dim = Dim), LshFloor),
      ("lsh_multiprobe", Similarity.lshBucketedMultiProbe(emb, probePred, k = 3,
        nBits = NBits, dim = Dim, radius = PanelRadius), MultiProbeBound)))
      .orderBy("method")
  }

  // --- X61: multi-probe LSH with CORPUS-ADAPTIVE bits — the fix for the
  // third corpus-proportional parameter the 100× probe caught: x48's
  // fixed nBits makes multi-probe candidate volume quadratic in the
  // corpus (measured 46× wall at 100× data); occupancy-bounded bits
  // (the x46 lever) hold per-bucket population constant. The probe list
  // XORs only the first nbits planes (sentinel −1 filtered), replayed
  // identically by the oracle.
  val x61 = Query(
    "x61_multiprobe_auto",
    Some {
      val probeList = ("bucket" +: (0 until MaxBits).map(j =>
        s"CASE WHEN $j < nbits THEN xor(bucket, ${1 << j}) ELSE -1 END"))
        .mkString("[", ", ", "]")
      s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      nc AS (SELECT count(*) AS cnt FROM embeddings),
      nb AS (SELECT CAST($nbitsSql AS INT) AS nbits FROM nc),
      bk AS (SELECT vec_id, v, CAST($maskedBucketSql AS INT) AS bucket FROM e, nb),
      probes AS (
        SELECT vec_id AS probe_id, v AS pv,
               CAST(unnest(list_filter($probeList, x -> x >= 0)) AS INT) AS bucket
        FROM bk, nb WHERE vec_id % 25 = 0),
      cands AS (
        SELECT probe_id, a.vec_id AS neighbor_id, a.bucket, a.v AS av, pv
        FROM bk a JOIN probes USING (bucket) WHERE a.vec_id <> probe_id),
      ranked AS (
        SELECT probe_id, neighbor_id, bucket,
               $cosSql AS cos_raw,
               CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
                 ORDER BY $cosSql DESC, neighbor_id) AS INT) AS rk
        FROM cands)
      SELECT probe_id, neighbor_id, bucket, ROUND(cos_raw, 6) AS cos, rk
      FROM ranked WHERE rk <= 3
      ORDER BY probe_id, rk"""
    }
  ) { (s, d) =>
    Similarity.lshBucketedMultiProbeAuto(embeddings(s, d),
        col("vec_id") % 25 === 0, k = 3,
        targetOcc = TargetOcc, maxBits = MaxBits, dim = Dim)
      .orderBy("probe_id", "rk")
  }

  // --- Y21/Y22: PRODUCT QUANTIZATION (Jégou et al. 2011) — the vector
  // compression tier of the ANN family (operators/Pq.scala): m=8
  // contiguous subspaces of the 64-dim embedding, a C=PqC=64 codebook
  // per subspace (hash-bounded sample init + 1 integer-exact Lloyd round),
  // codes of m small ids per vector, and asymmetric-distance search
  // that scans CODES with integer LUT sums — the corpus embeddings are
  // never touched by a probe batch. All arithmetic is integer
  // micro-units (the x67 lift), so every assignment, centroid update,
  // and ADC distance is bit-identical cross-engine.
  private[queries] val PqM = 8
  private[queries] val PqSubDim = Dim / PqM
  private[queries] val PqC = 64
  private[queries] val PqK = 10
  /** ADC shortlist size for the exact re-rank stage (IVFADC-R). */
  private[queries] val PqShort = 100
  private val PqSampleFloor = 0.15
  private val PqTrainedFloor = 0.25
  private val PqRerankBound = 0.6
  private def pqD2(a: String, b: String, n: Int): String =
    s"CAST(list_aggregate(list_transform(range(1, ${n + 1}), " +
      s"j -> ($a[j] - $b[j]) * ($a[j] - $b[j])), 'sum') AS BIGINT)"

  /** Shared PQ oracle CTEs: micro lift → subvector split → sample
    * codebooks b0 → assignment pa1 (the iters=0 encoding) → integer-mean
    * update b1 → assignment pa2 (the trained encoding). */
  private[queries] val pqCtes: String = {
    def assignPq(name: String, book: String) = s"""
      $name AS (
        SELECT vec_id, sub, svm, cell, d2 FROM (
          SELECT sv.vec_id, sv.sub, sv.svm, b.cent_id AS cell,
                 ${pqD2("sv.svm", "b.cvm", PqSubDim)} AS d2,
                 row_number() OVER (PARTITION BY sv.vec_id, sv.sub
                   ORDER BY ${pqD2("sv.svm", "b.cvm", PqSubDim)}, b.cent_id) AS rn
          FROM sv JOIN $book b ON sv.sub = b.sub)
        WHERE rn = 1)"""
    s"""em AS (SELECT vec_id,
            list_transform(CAST(embedding AS DOUBLE[]),
              x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS vm
          FROM embeddings),
      sv AS (SELECT vec_id, CAST(s AS INT) AS sub,
                    list_slice(vm, s * $PqSubDim + 1,
                               s * $PqSubDim + $PqSubDim) AS svm
             FROM em, UNNEST(range(0, $PqM)) t(s)),
      smp AS (SELECT vec_id FROM em
              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $PqC),
      b0 AS (SELECT sub, sv.vec_id AS cent_id, svm AS cvm
             FROM sv JOIN smp USING (vec_id)),
      ${assignPq("pa1", "b0")},
      pu1 AS (SELECT sub, cell, d,
                     CAST(floor(CAST(SUM(svm[d]) AS DOUBLE) / COUNT(*) + 0.5)
                       AS BIGINT) AS cm
              FROM pa1, UNNEST(range(1, ${PqSubDim + 1})) t(d)
              GROUP BY sub, cell, d),
      b1 AS (SELECT sub, cell AS cent_id, list(cm ORDER BY d) AS cvm
             FROM pu1 GROUP BY sub, cell),
      ${assignPq("pa2", "b1")}"""
  }

  // --- Y21: the trained PQ encoding itself — one row per (vector,
  // subspace) with the chosen cell and exact integer residual. This is
  // the table a PQ code store persists (≈ m ids/vector; 3 orders
  // smaller than the float embeddings it replaces on the scan path).
  val y21 = Query(
    "y21_pq_encode",
    Some(s"""
      WITH $pqCtes
      SELECT vec_id, sub, cell, d2 FROM pa2 ORDER BY vec_id, sub""")
  ) { (s, d) =>
    val emb = embeddings(s, d)
    val books = Pq.trainCodebooks(emb, PqM, Dim, PqC, iters = 1)
    Pq.encode(emb, books, PqM, Dim).orderBy("vec_id", "sub")
  }

  // --- Y22: ADC recall panel vs exact integer-L2 truth on the bounded
  // probe set. Three graded rows: the sample-init and Lloyd-trained raw
  // ADC scans at measured floors (a training regression flips the
  // trained row), and the PRODUCTION path — exact re-rank of the
  // kShort-deep ADC shortlist (IVFADC-R; only |probes|·kShort vectors
  // are ever exactly re-scored) — at the family's ≥ 0.6 user bound.
  val y22 = Query(
    "y22_pq_adc_recall",
    Some {
      def adcCtes(tag: String, enc: String, book: String) = s"""
      lut$tag AS (SELECT p.probe_id, b.sub, b.cent_id AS cell,
                         ${pqD2("p.svm", "b.cvm", PqSubDim)} AS pd2
                  FROM psv p JOIN $book b ON p.sub = b.sub),
      adc$tag AS (SELECT l.probe_id, c.vec_id AS neighbor_id,
                         SUM(l.pd2) AS adc
                  FROM $enc c JOIN lut$tag l
                    ON c.sub = l.sub AND c.cell = l.cell
                  WHERE c.vec_id <> l.probe_id
                  GROUP BY l.probe_id, c.vec_id),
      r$tag AS (SELECT probe_id, neighbor_id,
                       row_number() OVER (PARTITION BY probe_id
                         ORDER BY adc, neighbor_id) AS rk
                FROM adc$tag),
      ap$tag AS (SELECT probe_id, neighbor_id FROM r$tag WHERE rk <= $PqK)"""
      s"""
      WITH $pqCtes,
      ${pidsCteSql("em")},
      probes AS (SELECT vec_id AS probe_id, vm AS pm
                 FROM em JOIN pids USING (vec_id)),
      np AS (SELECT CAST(count(*) AS BIGINT) AS n_probes FROM probes),
      exsc AS (SELECT probe_id, a.vec_id AS neighbor_id,
                      ${pqD2("a.vm", "p.pm", Dim)} AS d2
               FROM em a CROSS JOIN probes p WHERE a.vec_id <> p.probe_id),
      exact AS (SELECT probe_id, neighbor_id FROM (
                  SELECT probe_id, neighbor_id,
                         row_number() OVER (PARTITION BY probe_id
                           ORDER BY d2, neighbor_id) AS rk
                  FROM exsc) WHERE rk <= $PqK),
      psv AS (SELECT vec_id AS probe_id, sub, svm
              FROM sv JOIN pids USING (vec_id)),
      ${adcCtes("0", "pa1", "b0")},
      ${adcCtes("2", "pa2", "b1")},
      shortl AS (SELECT probe_id, neighbor_id FROM r2 WHERE rk <= $PqShort),
      rr AS (SELECT s.probe_id, s.neighbor_id,
                    ${pqD2("a.vm", "p.pm", Dim)} AS d2
             FROM shortl s
             JOIN em a ON a.vec_id = s.neighbor_id
             JOIN probes p ON p.probe_id = s.probe_id),
      apr AS (SELECT probe_id, neighbor_id FROM (
                SELECT probe_id, neighbor_id,
                       row_number() OVER (PARTITION BY probe_id
                         ORDER BY d2, neighbor_id) AS rk
                FROM rr) WHERE rk <= $PqK),
      hits AS (
        SELECT 'pq_rerank' AS method, CAST(count(*) AS BIGINT) AS total_hits,
               $PqRerankBound AS bound
        FROM apr SEMI JOIN exact USING (probe_id, neighbor_id)
        UNION ALL
        SELECT 'pq_sample', CAST(count(*) AS BIGINT), $PqSampleFloor
        FROM ap0 SEMI JOIN exact USING (probe_id, neighbor_id)
        UNION ALL
        SELECT 'pq_trained', CAST(count(*) AS BIGINT), $PqTrainedFloor
        FROM ap2 SEMI JOIN exact USING (probe_id, neighbor_id))
      SELECT method, n_probes, total_hits,
             CAST(total_hits AS DOUBLE) / (n_probes * $PqK) AS recall,
             CASE WHEN CAST(total_hits AS DOUBLE) / (n_probes * $PqK) >= bound
                  THEN 1 ELSE 0 END AS recall_ok
      FROM hits, np
      ORDER BY method"""
    }
  ) { (s, d) =>
    Pq.adcRecallPanel(embeddings(s, d), PqM, Dim, PqC, NProbesBound, PqK,
      Seq(("pq_rerank", 1, PqShort, PqRerankBound),
        ("pq_sample", 0, 0, PqSampleFloor),
        ("pq_trained", 1, 0, PqTrainedFloor)))
      .orderBy("method")
  }

  // --- Y25: the PQ STORE's incremental lifecycle — books trained and
  // codes written from 80% of the corpus, the remaining 20% APPENDED
  // under the FROZEN codebooks (only the batch is split/assigned — old
  // embeddings and old codes never recomputed, the x81 cadence), then
  // ADC top-k answered entirely from the two-generation store: the
  // embeddings table is touched only for the bounded probe rows
  // (id filter pushed into the scan, plan-pinned).
  val y25 = Query(
    "y25_pq_store_incr",
    Some(s"""
      WITH em AS (SELECT vec_id,
              list_transform(CAST(embedding AS DOUBLE[]),
                x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS vm
            FROM embeddings),
      sv AS (SELECT vec_id, CAST(s AS INT) AS sub,
                    list_slice(vm, s * $PqSubDim + 1,
                               s * $PqSubDim + $PqSubDim) AS svm
             FROM em, UNNEST(range(0, $PqM)) t(s)),
      sv80 AS (SELECT * FROM sv WHERE vec_id % 10 < 8),
      smp AS (SELECT vec_id FROM em WHERE vec_id % 10 < 8
              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $PqC),
      b0 AS (SELECT sub, sv80.vec_id AS cent_id, svm AS cvm
             FROM sv80 JOIN smp USING (vec_id)),
      pa1 AS (
        SELECT vec_id, sub, svm, cell FROM (
          SELECT a.vec_id, a.sub, a.svm, b.cent_id AS cell,
                 row_number() OVER (PARTITION BY a.vec_id, a.sub
                   ORDER BY ${pqD2("a.svm", "b.cvm", PqSubDim)}, b.cent_id) AS rn
          FROM sv80 a JOIN b0 b ON a.sub = b.sub)
        WHERE rn = 1),
      pu1 AS (SELECT sub, cell, d,
                     CAST(floor(CAST(SUM(svm[d]) AS DOUBLE) / COUNT(*) + 0.5)
                       AS BIGINT) AS cm
              FROM pa1, UNNEST(range(1, ${PqSubDim + 1})) t(d)
              GROUP BY sub, cell, d),
      b1 AS (SELECT sub, cell AS cent_id, list(cm ORDER BY d) AS cvm
             FROM pu1 GROUP BY sub, cell),
      enc AS (
        SELECT vec_id, sub, cell FROM (
          SELECT a.vec_id, a.sub, b.cent_id AS cell,
                 row_number() OVER (PARTITION BY a.vec_id, a.sub
                   ORDER BY ${pqD2("a.svm", "b.cvm", PqSubDim)}, b.cent_id) AS rn
          FROM sv a JOIN b1 b ON a.sub = b.sub)
        WHERE rn = 1),
      ${pidsCteSql("em")},
      psv AS (SELECT vec_id AS probe_id, sub, svm
              FROM sv JOIN pids USING (vec_id)),
      lut AS (SELECT p.probe_id, b.sub, b.cent_id AS cell,
                     ${pqD2("p.svm", "b.cvm", PqSubDim)} AS pd2
              FROM psv p JOIN b1 b ON p.sub = b.sub),
      adc AS (SELECT l.probe_id, c.vec_id AS neighbor_id,
                     CAST(SUM(l.pd2) AS BIGINT) AS adc_d2
              FROM enc c JOIN lut l ON c.sub = l.sub AND c.cell = l.cell
              WHERE c.vec_id <> l.probe_id
              GROUP BY l.probe_id, c.vec_id)
      SELECT probe_id, neighbor_id, adc_d2,
             CAST(row_number() OVER (PARTITION BY probe_id
               ORDER BY adc_d2, neighbor_id) AS INT) AS rk
      FROM adc QUALIFY rk <= $PqK
      ORDER BY probe_id, rk""")
  ) { (s, d) =>
    val emb = embeddings(s, d)
    val probeIds = Similarity.boundedProbeIds(emb, NProbesBound)
    Pq.adcTopKFromStore(s, ensurePqStore(s, d), emb, probeIds,
        k = PqK, PqM, Dim)
      .orderBy("probe_id", "rk")
  }

  private def ensurePqStore(s: org.apache.spark.sql.SparkSession,
                            d: String): String = {
    val path = StoreFixtures.path("graft-pqstore", d, "embeddings.parquet",
      "pqstore1")
    StoreFixtures.onceByMarker(path, "_graft_appended") {
      Pq.writePqStore(embeddings(s, d).filter(col("vec_id") % 10 < 8),
        path, PqM, Dim, PqC, iters = 1)
      Pq.appendToPqStore(s, embeddings(s, d).filter(col("vec_id") % 10 >= 8),
        path, PqM, Dim)
    }
  }

  // --- Y30: HADAMARD-ROTATED PQ — the structured pre-rotation of the
  // OPQ family, exactly integer: rm = H·vm with H the Sylvester matrix
  // ((−1)^popcount(i AND j)), so ‖Ha−Hb‖² = 64·‖a−b‖² and the L2
  // ranking is provably unchanged while per-dimension energy spreads
  // across all m subspaces (the fix when contiguous dims are
  // correlated). Full trained-ADC + exact-re-rank pipeline on the
  // rotated vectors, graded against rotated exact-L2 truth.
  private val PqRotRawFloor = 0.2
  private val PqRotRerankBound = 0.6
  val y30 = Query(
    "y30_pq_rotated_recall",
    Some {
      val rotSql =
        s"""list_transform(range(0, $Dim), i ->
             CAST(list_aggregate(list_transform(range(0, $Dim), j ->
               CASE WHEN bit_count(i & j) % 2 = 0 THEN mv[j + 1]
                    ELSE -mv[j + 1] END), 'sum') AS BIGINT))"""
      s"""
      WITH e0 AS (SELECT vec_id,
              list_transform(CAST(embedding AS DOUBLE[]),
                x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS mv
            FROM embeddings),
      em AS (SELECT vec_id, $rotSql AS vm FROM e0),
      sv AS (SELECT vec_id, CAST(s AS INT) AS sub,
                    list_slice(vm, s * $PqSubDim + 1,
                               s * $PqSubDim + $PqSubDim) AS svm
             FROM em, UNNEST(range(0, $PqM)) t(s)),
      smp AS (SELECT vec_id FROM em
              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $PqC),
      b0 AS (SELECT sub, sv.vec_id AS cent_id, svm AS cvm
             FROM sv JOIN smp USING (vec_id)),
      pa1 AS (
        SELECT vec_id, sub, svm, cell FROM (
          SELECT a.vec_id, a.sub, a.svm, b.cent_id AS cell,
                 row_number() OVER (PARTITION BY a.vec_id, a.sub
                   ORDER BY ${pqD2("a.svm", "b.cvm", PqSubDim)}, b.cent_id) AS rn
          FROM sv a JOIN b0 b ON a.sub = b.sub)
        WHERE rn = 1),
      pu1 AS (SELECT sub, cell, d,
                     CAST(floor(CAST(SUM(svm[d]) AS DOUBLE) / COUNT(*) + 0.5)
                       AS BIGINT) AS cm
              FROM pa1, UNNEST(range(1, ${PqSubDim + 1})) t(d)
              GROUP BY sub, cell, d),
      b1 AS (SELECT sub, cell AS cent_id, list(cm ORDER BY d) AS cvm
             FROM pu1 GROUP BY sub, cell),
      enc AS (
        SELECT vec_id, sub, cell FROM (
          SELECT a.vec_id, a.sub, b.cent_id AS cell,
                 row_number() OVER (PARTITION BY a.vec_id, a.sub
                   ORDER BY ${pqD2("a.svm", "b.cvm", PqSubDim)}, b.cent_id) AS rn
          FROM sv a JOIN b1 b ON a.sub = b.sub)
        WHERE rn = 1),
      ${pidsCteSql("em")},
      probes AS (SELECT vec_id AS probe_id, vm AS pm
                 FROM em JOIN pids USING (vec_id)),
      np AS (SELECT CAST(count(*) AS BIGINT) AS n_probes FROM probes),
      exsc AS (SELECT probe_id, a.vec_id AS neighbor_id,
                      ${pqD2("a.vm", "p.pm", Dim)} AS d2
               FROM em a CROSS JOIN probes p WHERE a.vec_id <> p.probe_id),
      exact AS (SELECT probe_id, neighbor_id FROM (
                  SELECT probe_id, neighbor_id,
                         row_number() OVER (PARTITION BY probe_id
                           ORDER BY d2, neighbor_id) AS rk
                  FROM exsc) WHERE rk <= $PqK),
      psv AS (SELECT vec_id AS probe_id, sub, svm
              FROM sv JOIN pids USING (vec_id)),
      lut AS (SELECT p.probe_id, b.sub, b.cent_id AS cell,
                     ${pqD2("p.svm", "b.cvm", PqSubDim)} AS pd2
              FROM psv p JOIN b1 b ON p.sub = b.sub),
      adc AS (SELECT l.probe_id, c.vec_id AS neighbor_id, SUM(l.pd2) AS adc
              FROM enc c JOIN lut l ON c.sub = l.sub AND c.cell = l.cell
              WHERE c.vec_id <> l.probe_id
              GROUP BY l.probe_id, c.vec_id),
      r2 AS (SELECT probe_id, neighbor_id,
                    row_number() OVER (PARTITION BY probe_id
                      ORDER BY adc, neighbor_id) AS rk
             FROM adc),
      ap2 AS (SELECT probe_id, neighbor_id FROM r2 WHERE rk <= $PqK),
      shortl AS (SELECT probe_id, neighbor_id FROM r2 WHERE rk <= $PqShort),
      rr AS (SELECT s.probe_id, s.neighbor_id,
                    ${pqD2("a.vm", "p.pm", Dim)} AS d2
             FROM shortl s
             JOIN em a ON a.vec_id = s.neighbor_id
             JOIN probes p ON p.probe_id = s.probe_id),
      apr AS (SELECT probe_id, neighbor_id FROM (
                SELECT probe_id, neighbor_id,
                       row_number() OVER (PARTITION BY probe_id
                         ORDER BY d2, neighbor_id) AS rk
                FROM rr) WHERE rk <= $PqK),
      hits AS (
        SELECT 'pq_rot_rerank' AS method, CAST(count(*) AS BIGINT) AS total_hits,
               $PqRotRerankBound AS bound
        FROM apr SEMI JOIN exact USING (probe_id, neighbor_id)
        UNION ALL
        SELECT 'pq_rot_trained', CAST(count(*) AS BIGINT), $PqRotRawFloor
        FROM ap2 SEMI JOIN exact USING (probe_id, neighbor_id))
      SELECT method, n_probes, total_hits,
             CAST(total_hits AS DOUBLE) / (n_probes * $PqK) AS recall,
             CASE WHEN CAST(total_hits AS DOUBLE) / (n_probes * $PqK) >= bound
                  THEN 1 ELSE 0 END AS recall_ok
      FROM hits, np
      ORDER BY method"""
    }
  ) { (s, d) =>
    Pq.rotatedAdcRecallPanel(embeddings(s, d), PqM, Dim, PqC, NProbesBound,
        k = PqK, kShort = PqShort,
        rawBound = PqRotRawFloor, rerankBound = PqRotRerankBound)
      .orderBy("method")
  }

  // --- Y36: TRUE IVFADC (Jégou et al. 2011 §IV) — the composition the
  // family was missing: coarse integer k-means cells + PQ over the
  // RESIDUAL x − c(x), served from a store whose codes are PARTITIONED
  // BY coarse cell, so a probe batch's nprobe cell list PRUNES the
  // codes scan to its partitions (plan-pinned in PlanShapeSpec) instead
  // of y22's all-codes scan. The LUT is per-(probe, cell) — the same
  // probe's residual differs per probed cell — and the kShort shortlist
  // is exactly re-ranked (IVFADC-R). Integer micro-units end to end.
  private val IvfCells = 16
  private val IvfNprobe = 6
  private val IvfadcRawFloor = 0.2
  private val IvfadcRerankBound = 0.6

  private def ensureIvfadcStore(s: org.apache.spark.sql.SparkSession,
                                d: String): String = {
    val path = StoreFixtures.path("graft-ivfadc", d, "embeddings.parquet",
      "ivfadc2")
    StoreFixtures.onceBySuccess(path, "codes") {
      Pq.writeIvfadcStore(embeddings(s, d), path, IvfCells, PqM, Dim,
        PqC, iters = 1)
    }
  }

  // coarse assignment: argmin integer L2² over the FULL vector,
  // tie → smaller cent_id (the assign/TopKPerKey contract)
  private def assignFull(name: String, src: String, vcol: String,
                         book: String) = s"""
      $name AS (
        SELECT vec_id, $vcol AS vm, cell, ccvm FROM (
          SELECT a.vec_id, a.$vcol, b.cent_id AS cell, b.cvm AS ccvm,
                 row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY ${pqD2(s"a.$vcol", "b.cvm", Dim)}, b.cent_id) AS rn
          FROM $src a JOIN $book b ON true)
        WHERE rn = 1)"""

  /** The IVFADC oracle replay up THROUGH the served search: store
    * training (coarse cells + residual codebooks), encode, per-probe
    * cell probing, ADC shortlist (`radc`), and the exact re-rank
    * distances (`rr`). Shared by y36 (which appends the recall-panel
    * tail: exact truth + hits) and y51 (which grades the served rows
    * themselves — no brute-force term anywhere in its plan).
    * Parameterized (round 15) for the lifecycle-graded serves:
    * `nCells` re-derives the replay at a retrain's new geometry (y66 —
    * a retrain is a deterministic fresh build over the visible
    * corpus), and `candPred` restricts the ADC CANDIDATES only —
    * books/cells stay trained on the full corpus — which is exactly
    * what a tombstone exclusion (y65) or an `allowed` restriction
    * (y67) does on the serve: visibility applies after the LUT join
    * and before the kShort cut, never to the quantizers. */
  private def ivfadcCtePrefix(nCells: Int = IvfCells,
                              candPred: String = ""): String =
    ivfadcHeaderCtes + ivfadcReplayCtes("", nCells, candPred)

  /** The replay's tag-independent header: micro-lifted corpus, bounded
    * probe ids, probe vectors, probe count — shared by every store
    * replay in the same WITH (y70 instantiates the body twice over one
    * corpus/probe frame). */
  private def ivfadcHeaderCtes: String = s"""
      WITH em AS (SELECT vec_id,
              list_transform(CAST(embedding AS DOUBLE[]),
                x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS vm
            FROM embeddings),
      ${pidsCteSql("em")},
      probes AS (SELECT vec_id AS probe_id, vm AS pm
                 FROM em JOIN pids USING (vec_id)),
      np AS (SELECT CAST(count(*) AS BIGINT) AS n_probes FROM probes)"""

  /** One store replay's CTE body, every name suffixed with `tag` so
    * several stores coexist in one WITH (round 16 — the y70 drifted +
    * retrained panel). `trainPred` restricts the TRAINING corpus only
    * (the build input — coarse sample/Lloyd and residual-codebook
    * sample/Lloyd run over those rows); the ENCODE pass still covers
    * every row, because encoding is per-row deterministic under frozen
    * quantizers, so full-corpus encode ≡ build encode ∪ frozen-books
    * append — exactly the drifted-store state writeIvfadcStore +
    * appendToIvfadcStore leave behind. */
  private def ivfadcReplayCtes(tag: String, nCells: Int,
                               candPred: String = "",
                               trainPred: String = "true"): String = s""",
      tr$tag AS (SELECT vec_id, vm FROM em WHERE $trainPred),
      -- coarse quantizer: $nCells-cell integer k-means on the full
      -- vector (sample init by md5 order over the TRAINING corpus +
      -- one Lloyd round assigning the training rows)
      csmp$tag AS (SELECT vec_id FROM tr$tag
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $nCells),
      cb0$tag AS (SELECT em.vec_id AS cent_id, vm AS cvm
              FROM em JOIN csmp$tag USING (vec_id)),
      ${assignFull(s"ca1$tag", s"tr$tag", "vm", s"cb0$tag")},
      cu1$tag AS (SELECT cell, d,
                     CAST(floor(CAST(SUM(vm[d]) AS DOUBLE) / COUNT(*) + 0.5)
                       AS BIGINT) AS cm
              FROM ca1$tag, UNNEST(range(1, ${Dim + 1})) t(d)
              GROUP BY cell, d),
      cb1$tag AS (SELECT cell AS cent_id, list(cm ORDER BY d) AS cvm
              FROM cu1$tag GROUP BY cell),
      ${assignFull(s"ca2$tag", "em", "vm", s"cb1$tag")},
      -- exact integer residuals in the assigned cell (FULL corpus:
      -- build rows encoded at build, later rows under the same frozen
      -- quantizers at append — per-row deterministic, so identical)
      res$tag AS (SELECT vec_id, cell AS ivf_cell,
                     list_transform(range(1, ${Dim + 1}),
                       j -> vm[j] - ccvm[j]) AS rm
              FROM ca2$tag),
      rsv$tag AS (SELECT vec_id, ivf_cell, CAST(s AS INT) AS sub,
                     list_slice(rm, s * $PqSubDim + 1,
                                s * $PqSubDim + $PqSubDim) AS svm
              FROM res$tag, UNNEST(range(0, $PqM)) t(s)),
      -- residual-PQ codebooks: $PqC sample init + one Lloyd round,
      -- both over the TRAINING rows' residuals
      smp$tag AS (SELECT vec_id FROM tr$tag
              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $PqC),
      rb0$tag AS (SELECT sub, r.vec_id AS cent_id, svm AS cvm
              FROM rsv$tag r JOIN smp$tag USING (vec_id)),
      rtr$tag AS (SELECT r.* FROM rsv$tag r
              SEMI JOIN tr$tag USING (vec_id)),
      rpa1$tag AS (
        SELECT vec_id, sub, svm, cell FROM (
          SELECT a.vec_id, a.sub, a.svm, b.cent_id AS cell,
                 row_number() OVER (PARTITION BY a.vec_id, a.sub
                   ORDER BY ${pqD2("a.svm", "b.cvm", PqSubDim)}, b.cent_id) AS rn
          FROM rtr$tag a JOIN rb0$tag b ON a.sub = b.sub)
        WHERE rn = 1),
      ru1$tag AS (SELECT sub, cell, d,
                     CAST(floor(CAST(SUM(svm[d]) AS DOUBLE) / COUNT(*) + 0.5)
                       AS BIGINT) AS cm
              FROM rpa1$tag, UNNEST(range(1, ${PqSubDim + 1})) t(d)
              GROUP BY sub, cell, d),
      rb1$tag AS (SELECT sub, cell AS cent_id, list(cm ORDER BY d) AS cvm
              FROM ru1$tag GROUP BY sub, cell),
      enc$tag AS (
        SELECT e.vec_id, e.sub, e.cell, r.ivf_cell FROM (
          SELECT a.vec_id, a.sub, b.cent_id AS cell,
                 row_number() OVER (PARTITION BY a.vec_id, a.sub
                   ORDER BY ${pqD2("a.svm", "b.cvm", PqSubDim)}, b.cent_id) AS rn
          FROM rsv$tag a JOIN rb1$tag b ON a.sub = b.sub) e
        JOIN res$tag r USING (vec_id)
        WHERE e.rn = 1),
      -- each probe's $IvfNprobe nearest coarse cells + its PER-CELL
      -- residual (the IVFADC detail: one probe, nprobe residuals)
      pcs$tag AS (SELECT probe_id, ivf_cell, prm FROM (
                SELECT p.probe_id, b.cent_id AS ivf_cell,
                       list_transform(range(1, ${Dim + 1}),
                         j -> p.pm[j] - b.cvm[j]) AS prm,
                       row_number() OVER (PARTITION BY p.probe_id
                         ORDER BY ${pqD2("p.pm", "b.cvm", Dim)}, b.cent_id) AS rn
                FROM probes p JOIN cb1$tag b ON true)
              WHERE rn <= $IvfNprobe),
      psv$tag AS (SELECT probe_id, ivf_cell, CAST(s AS INT) AS sub,
                     list_slice(prm, s * $PqSubDim + 1,
                                s * $PqSubDim + $PqSubDim) AS psvm
              FROM pcs$tag, UNNEST(range(0, $PqM)) t(s)),
      lut$tag AS (SELECT p.probe_id, p.ivf_cell, b.sub, b.cent_id AS cell,
                     ${pqD2("p.psvm", "b.cvm", PqSubDim)} AS pd2
              FROM psv$tag p JOIN rb1$tag b ON p.sub = b.sub),
      adc$tag AS (SELECT l.probe_id, c.vec_id AS neighbor_id,
                     SUM(l.pd2) AS adc
              FROM enc$tag c JOIN lut$tag l
                ON c.ivf_cell = l.ivf_cell AND c.sub = l.sub
               AND c.cell = l.cell
              WHERE c.vec_id <> l.probe_id$candPred
              GROUP BY l.probe_id, c.vec_id),
      radc$tag AS (SELECT probe_id, neighbor_id,
                      row_number() OVER (PARTITION BY probe_id
                        ORDER BY adc, neighbor_id) AS rk
               FROM adc$tag),
      shortl$tag AS (SELECT probe_id, neighbor_id FROM radc$tag
               WHERE rk <= $PqShort),
      rr$tag AS (SELECT s.probe_id, s.neighbor_id,
                    ${pqD2("a.vm", "p.pm", Dim)} AS d2
             FROM shortl$tag s
             JOIN em a ON a.vec_id = s.neighbor_id
             JOIN probes p ON p.probe_id = s.probe_id)"""

  val y36 = Query(
    "y36_ivfadc_recall",
    Some(ivfadcCtePrefix() + s""",
      rawk AS (SELECT probe_id, neighbor_id FROM radc WHERE rk <= $PqK),
      apr AS (SELECT probe_id, neighbor_id FROM (
                SELECT probe_id, neighbor_id,
                       row_number() OVER (PARTITION BY probe_id
                         ORDER BY d2, neighbor_id) AS rk
                FROM rr) WHERE rk <= $PqK),
      exsc AS (SELECT probe_id, a.vec_id AS neighbor_id,
                      ${pqD2("a.vm", "p.pm", Dim)} AS d2
               FROM em a CROSS JOIN probes p WHERE a.vec_id <> p.probe_id),
      exact AS (SELECT probe_id, neighbor_id FROM (
                  SELECT probe_id, neighbor_id,
                         row_number() OVER (PARTITION BY probe_id
                           ORDER BY d2, neighbor_id) AS rk
                  FROM exsc) WHERE rk <= $PqK),
      hits AS (
        SELECT 'ivfadc_raw' AS method, CAST(count(*) AS BIGINT) AS total_hits,
               $IvfadcRawFloor AS bound
        FROM rawk SEMI JOIN exact USING (probe_id, neighbor_id)
        UNION ALL
        SELECT 'ivfadc_rerank', CAST(count(*) AS BIGINT), $IvfadcRerankBound
        FROM apr SEMI JOIN exact USING (probe_id, neighbor_id))
      SELECT method, n_probes, total_hits,
             CAST(total_hits AS DOUBLE) / (n_probes * $PqK) AS recall,
             CASE WHEN CAST(total_hits AS DOUBLE) / (n_probes * $PqK) >= bound
                  THEN 1 ELSE 0 END AS recall_ok
      FROM hits, np
      ORDER BY method""")
  ) { (s, d) =>
    Pq.ivfadcRecallPanel(s, ensureIvfadcStore(s, d), embeddings(s, d),
        NProbesBound, IvfNprobe, PqShort, PqK, PqM, Dim,
        IvfadcRawFloor, IvfadcRerankBound)
      .orderBy("method")
  }

  // --- Y51: the IVFADC SERVED PATH alone, graded row-for-row — the
  // VERDICT-r9 split of serving from grading: y36's recall panel pays a
  // brute-force exact-truth term (32 probes × corpus) that swamps the
  // served path's own cost at scale, so this query grades EXACTLY what
  // production runs — probe the nprobe nearest cells, ADC-shortlist
  // from the cell-partition-pruned codes store, re-rank kShort
  // candidates exactly — with no exact-truth scan anywhere in the plan.
  // Its ScaleProbe row is the served path's own curve (SCALE.md r10).
  private def ivfadcServeOracle(nCells: Int = IvfCells,
                                candPred: String = ""): String =
    ivfadcCtePrefix(nCells, candPred) + s"""
      SELECT probe_id, neighbor_id, d2,
             CAST(row_number() OVER (PARTITION BY probe_id
               ORDER BY d2, neighbor_id) AS INT) AS rk
      FROM rr QUALIFY rk <= $PqK ORDER BY probe_id, rk"""

  val y51 = Query(
    "y51_ivfadc_serve",
    Some(ivfadcServeOracle())
  ) { (s, d) =>
    val probeIds = Similarity.boundedProbeIds(embeddings(s, d), NProbesBound)
    Pq.ivfadcTopKFromStore(s, ensureIvfadcStore(s, d), embeddings(s, d),
        probeIds, IvfNprobe, PqShort, PqK, PqM, Dim)
      .orderBy("probe_id", "rk")
  }

  // --- Y56: y51 through the probe-TABLE serve API — the ExactIvf/
  // Retrieval query-table discipline applied to the approximate serving
  // path: probes arrive as a DataFrame and enter the plan as a join
  // against the embeddings relation; driver-side state stays the
  // |probes|·nprobe cell-id list partition pruning needs. Same oracle
  // as y51 — row-identity through the table input is the contract.
  val y56 = Query(
    "y56_ivfadc_serve_df",
    Some(ivfadcServeOracle())
  ) { (s, d) =>
    import s.implicits._
    val probes = Similarity.boundedProbeIds(embeddings(s, d), NProbesBound)
      .toDF("probe_id")
    Pq.ivfadcTopKFromStore(s, ensureIvfadcStore(s, d), embeddings(s, d),
        probes, IvfNprobe, PqShort, PqK, PqM, Dim, "embedding")
      .orderBy("probe_id", "rk")
  }

  // --- Y65: IVFADC DELETION graded (round 15 — VERDICT r14 #1: the
  // approximate family's tombstone exclusion was spec-pinned only, and
  // the approximate path is exactly where silent wrongness hides best,
  // with no brute-force tie to catch a bad exclusion). A dedicated
  // store is built over the FULL corpus, then every vec with
  // vec_id % 7 == 3 (~14%, including live shortlist members) is
  // tombstoned through deleteFromCodesStore — rows still physically
  // present, no purge. The graded serve must hash-match the replay
  // whose quantizers stay FULL-corpus-trained (deletion never retrains
  // books) but whose ADC CANDIDATES exclude the deleted ids BEFORE the
  // kShort cut — a serve that post-filtered the shortlist instead
  // would surface rank holes and lose true survivors, and one that
  // dropped deleted rows from training would mismatch every centroid.
  // Probes are NOT gated: a deleted id may still ask (the y62
  // contract), it just can never be answered.
  private def ensureIvfadcDeletedStore(s: org.apache.spark.sql.SparkSession,
                                       d: String): String = {
    val path = StoreFixtures.path("graft-ivfadcdel", d,
      "embeddings.parquet", "ivfadcdel1")
    StoreFixtures.onceByMarker(path, "_graft_del_done") {
      val emb = embeddings(s, d)
      Pq.writeIvfadcStore(emb, path, IvfCells, PqM, Dim, PqC, iters = 1)
      Pq.deleteFromCodesStore(s,
        emb.select("vec_id").filter(col("vec_id") % 7 === 3), path)
    }
  }

  val y65 = Query(
    "y65_ivfadc_deleted_serve",
    Some(ivfadcServeOracle(candPred = " AND c.vec_id % 7 <> 3"))
  ) { (s, d) =>
    val probeIds = Similarity.boundedProbeIds(embeddings(s, d), NProbesBound)
    Pq.ivfadcTopKFromStore(s, ensureIvfadcDeletedStore(s, d),
        embeddings(s, d), probeIds, IvfNprobe, PqShort, PqK, PqM, Dim)
      .orderBy("probe_id", "rk")
  }

  // --- Y66: IVFADC ONLINE RETRAIN graded (round 15 — the second half
  // of VERDICT r14 #1, the y63 pattern on the approximate path): the
  // store is built over 80% of the corpus, grown by an
  // appendToIvfadcStore batch encoding under the FROZEN original books
  // (the recall-drift regime the retrain lever exists for), then
  // RETRAINED online to a DIFFERENT coarse geometry (16 → 24 cells;
  // new coarse centroids, new residual codebooks, new groups) through
  // the atomic epoch cutover. The graded serve runs entirely in the
  // new epoch and must hash-match the replay of a DETERMINISTIC FRESH
  // BUILD at nCells=24 over the full corpus — the ReclusterSpec
  // retrain≡fresh-build contract under the DuckDB oracle: a lost
  // append, a stale-geometry read, a torn coarse/books/codes triple,
  // or an epoch misresolution would each flip the hash.
  private val IvfRetrainCells = 24

  private def ensureIvfadcRetrainedStore(
      s: org.apache.spark.sql.SparkSession, d: String): String = {
    val path = StoreFixtures.path("graft-ivfadcret", d,
      "embeddings.parquet", "ivfadcret1")
    StoreFixtures.onceByMarker(path, "_graft_ret_done") {
      val emb = embeddings(s, d)
      Pq.writeIvfadcStore(emb.filter(col("vec_id") % 10 < 8), path,
        IvfCells, PqM, Dim, PqC, iters = 1)
      Pq.appendToIvfadcStore(s, emb.filter(col("vec_id") % 10 >= 8),
        path, PqM, Dim, batchId = Some(1L))
      Pq.retrainIvfadcStore(s, emb, path, IvfRetrainCells, PqM, Dim,
        PqC, iters = 1)
    }
  }

  val y66 = Query(
    "y66_ivfadc_retrain_serve",
    Some(ivfadcServeOracle(nCells = IvfRetrainCells))
  ) { (s, d) =>
    val probeIds = Similarity.boundedProbeIds(embeddings(s, d), NProbesBound)
    Pq.ivfadcTopKFromStore(s, ensureIvfadcRetrainedStore(s, d),
        embeddings(s, d), probeIds, IvfNprobe, PqShort, PqK, PqM, Dim)
      .orderBy("probe_id", "rk")
  }

  // --- Y70: RECALL-UNDER-DRIFT panel graded (round 16 — VERDICT r15
  // #1, the engine analogue of the reference's continuous output-
  // quality scoring loop, neurons/validator.py:134-146): the r15 drift
  // stats gauge QUANTIZATION error, but a store can quantize well and
  // still RANK poorly once the corpus drifts away from its frozen
  // quantizers — the one silent-erosion channel with no standing
  // gauge. This grades Pq.servedRecallPanel — the maintenance-cadence
  // panel that serves from LIVE stores and RECORDS its result where
  // the fsck's `recall` check reads it — on both sides of the retrain
  // lever: a DRIFTED store (built over 80% of the corpus, the other
  // 20% appended under the frozen original quantizers — y66's
  // pre-retrain state) and the RETRAINED store (y66's fixture: the
  // same corpus re-trained online to nCells=24 through the epoch
  // cutover). One exact integer-L2 truth arm grades both. The oracle
  // replays each store deterministically (training restricted to the
  // build corpus, encode over everything — per-row deterministic
  // under frozen quantizers) and computes the same recalls; the
  // recall_ok flags pin the floors pre/post retrain (the q08b
  // self-grading pattern), so a recall regression in EITHER state
  // flips the hash.
  private val Y70DriftedFloor = 0.55
  private val Y70RetrainedFloor = 0.70

  private def ensureIvfadcDriftStore(
      s: org.apache.spark.sql.SparkSession, d: String): String = {
    val path = StoreFixtures.path("graft-ivfadcdrift", d,
      "embeddings.parquet", "ivfadcdrift1")
    StoreFixtures.onceByMarker(path, "_graft_drift_done") {
      val emb = embeddings(s, d)
      Pq.writeIvfadcStore(emb.filter(col("vec_id") % 10 < 8), path,
        IvfCells, PqM, Dim, PqC, iters = 1)
      Pq.appendToIvfadcStore(s, emb.filter(col("vec_id") % 10 >= 8),
        path, PqM, Dim, batchId = Some(1L))
    }
  }

  val y70 = Query(
    "y70_recall_drift_panel",
    Some(ivfadcHeaderCtes
      + ivfadcReplayCtes("_d", IvfCells, trainPred = "vec_id % 10 < 8")
      + ivfadcReplayCtes("_r", IvfRetrainCells)
      + s""",
      srv_d AS (SELECT probe_id, neighbor_id FROM (
                  SELECT probe_id, neighbor_id,
                         row_number() OVER (PARTITION BY probe_id
                           ORDER BY d2, neighbor_id) AS rk
                  FROM rr_d) WHERE rk <= $PqK),
      srv_r AS (SELECT probe_id, neighbor_id FROM (
                  SELECT probe_id, neighbor_id,
                         row_number() OVER (PARTITION BY probe_id
                           ORDER BY d2, neighbor_id) AS rk
                  FROM rr_r) WHERE rk <= $PqK),
      exsc AS (SELECT probe_id, a.vec_id AS neighbor_id,
                      ${pqD2("a.vm", "p.pm", Dim)} AS d2
               FROM em a CROSS JOIN probes p WHERE a.vec_id <> p.probe_id),
      exact AS (SELECT probe_id, neighbor_id FROM (
                  SELECT probe_id, neighbor_id,
                         row_number() OVER (PARTITION BY probe_id
                           ORDER BY d2, neighbor_id) AS rk
                  FROM exsc) WHERE rk <= $PqK),
      hits AS (
        SELECT 'ivfadc_drifted' AS method,
               CAST(count(*) AS BIGINT) AS total_hits,
               $Y70DriftedFloor AS bound
        FROM srv_d SEMI JOIN exact USING (probe_id, neighbor_id)
        UNION ALL
        SELECT 'ivfadc_retrained', CAST(count(*) AS BIGINT),
               $Y70RetrainedFloor
        FROM srv_r SEMI JOIN exact USING (probe_id, neighbor_id))
      SELECT method, n_probes, total_hits,
             CAST(total_hits AS DOUBLE) / (n_probes * $PqK) AS recall,
             CASE WHEN CAST(total_hits AS DOUBLE) / (n_probes * $PqK)
                    >= bound THEN 1 ELSE 0 END AS recall_ok
      FROM hits, np
      ORDER BY method""")
  ) { (s, d) =>
    val emb = embeddings(s, d)
    val probeIds = Similarity.boundedProbeIds(emb, NProbesBound)
    Pq.servedRecallPanel(s, Seq(
        ("ivfadc_drifted", ensureIvfadcDriftStore(s, d), Y70DriftedFloor),
        ("ivfadc_retrained", ensureIvfadcRetrainedStore(s, d),
          Y70RetrainedFloor)),
      emb, probeIds, IvfNprobe, PqShort, PqK, PqM, Dim)
      .orderBy("method")
  }

  // --- Y71: the FLAT-PQ recall panel (round 17 — VERDICT r16 #1, the
  // y70 treatment for the family it skipped): servedRecallPanel now
  // dispatches by store family, so a flat-PQ store is graded through
  // ITS production serve — the ADC shortlist over the stored codes +
  // exact re-rank (adcRerankTopKFromStore; no coarse cells, nprobe
  // does not apply) — on both sides of the retrain lever: the DRIFTED
  // store (y25's fixture: books trained on 80% of the corpus, the rest
  // appended under the frozen codebooks) and the RETRAINED store (the
  // same corpus re-fit by Pq.retrainPqStore through the epoch
  // cutover). One exact integer-L2 truth arm grades both; the
  // recall_ok floors pin both states (the q08b self-grading pattern),
  // so a ranking regression in either serve flips the hash.
  private val Y71DriftedFloor = 0.80
  private val Y71RetrainedFloor = 0.85

  private def ensurePqRetrainedStore(
      s: org.apache.spark.sql.SparkSession, d: String): String = {
    val path = StoreFixtures.path("graft-pqret", d, "embeddings.parquet",
      "pqret1")
    StoreFixtures.onceByMarker(path, "_graft_ret_done") {
      val emb = embeddings(s, d)
      Pq.writePqStore(emb.filter(col("vec_id") % 10 < 8), path,
        PqM, Dim, PqC, iters = 1)
      Pq.appendToPqStore(s, emb.filter(col("vec_id") % 10 >= 8),
        path, PqM, Dim, batchId = Some(1L))
      Pq.retrainPqStore(s, emb, path, PqM, Dim, PqC, iters = 1)
    }
  }

  /** One flat-PQ store replay's CTE body, every name suffixed with
    * `tag` (the ivfadcReplayCtes discipline, minus the coarse level):
    * sample + one-Lloyd codebooks over the TRAINING rows, encode over
    * everything (per-row deterministic under frozen books, so
    * full-corpus encode ≡ build ∪ frozen-books append — the y25
    * equivalence), ADC shortlist, exact re-rank, top-k. Expects the
    * shared header plus `sv` (full-corpus subvectors) and `psv`
    * (probe subvectors). */
  private def pqReplayCtes(tag: String,
                           trainPred: String = "true"): String = s""",
      trn$tag AS (SELECT vec_id FROM em WHERE $trainPred),
      svt$tag AS (SELECT sv.* FROM sv SEMI JOIN trn$tag USING (vec_id)),
      smp$tag AS (SELECT vec_id FROM em WHERE $trainPred
              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $PqC),
      b0$tag AS (SELECT sub, s.vec_id AS cent_id, svm AS cvm
             FROM svt$tag s JOIN smp$tag USING (vec_id)),
      pa1$tag AS (
        SELECT vec_id, sub, svm, cell FROM (
          SELECT a.vec_id, a.sub, a.svm, b.cent_id AS cell,
                 row_number() OVER (PARTITION BY a.vec_id, a.sub
                   ORDER BY ${pqD2("a.svm", "b.cvm", PqSubDim)}, b.cent_id) AS rn
          FROM svt$tag a JOIN b0$tag b ON a.sub = b.sub)
        WHERE rn = 1),
      pu1$tag AS (SELECT sub, cell, d,
                     CAST(floor(CAST(SUM(svm[d]) AS DOUBLE) / COUNT(*) + 0.5)
                       AS BIGINT) AS cm
              FROM pa1$tag, UNNEST(range(1, ${PqSubDim + 1})) t(d)
              GROUP BY sub, cell, d),
      b1$tag AS (SELECT sub, cell AS cent_id, list(cm ORDER BY d) AS cvm
             FROM pu1$tag GROUP BY sub, cell),
      enc$tag AS (
        SELECT vec_id, sub, cell FROM (
          SELECT a.vec_id, a.sub, b.cent_id AS cell,
                 row_number() OVER (PARTITION BY a.vec_id, a.sub
                   ORDER BY ${pqD2("a.svm", "b.cvm", PqSubDim)}, b.cent_id) AS rn
          FROM sv a JOIN b1$tag b ON a.sub = b.sub)
        WHERE rn = 1),
      lut$tag AS (SELECT p.probe_id, b.sub, b.cent_id AS cell,
                     ${pqD2("p.svm", "b.cvm", PqSubDim)} AS pd2
              FROM psv p JOIN b1$tag b ON p.sub = b.sub),
      adc$tag AS (SELECT l.probe_id, c.vec_id AS neighbor_id,
                     SUM(l.pd2) AS adc
              FROM enc$tag c JOIN lut$tag l
                ON c.sub = l.sub AND c.cell = l.cell
              WHERE c.vec_id <> l.probe_id
              GROUP BY l.probe_id, c.vec_id),
      shortl$tag AS (SELECT probe_id, neighbor_id FROM (
               SELECT probe_id, neighbor_id,
                      row_number() OVER (PARTITION BY probe_id
                        ORDER BY adc, neighbor_id) AS rk
               FROM adc$tag) WHERE rk <= $PqShort),
      rr$tag AS (SELECT s.probe_id, s.neighbor_id,
                    ${pqD2("a.vm", "p.pm", Dim)} AS d2
             FROM shortl$tag s
             JOIN em a ON a.vec_id = s.neighbor_id
             JOIN probes p ON p.probe_id = s.probe_id),
      srv$tag AS (SELECT probe_id, neighbor_id FROM (
                  SELECT probe_id, neighbor_id,
                         row_number() OVER (PARTITION BY probe_id
                           ORDER BY d2, neighbor_id) AS rk
                  FROM rr$tag) WHERE rk <= $PqK)"""

  val y71 = Query(
    "y71_pq_recall_panel",
    Some(ivfadcHeaderCtes + s""",
      sv AS (SELECT vec_id, CAST(s AS INT) AS sub,
                    list_slice(vm, s * $PqSubDim + 1,
                               s * $PqSubDim + $PqSubDim) AS svm
             FROM em, UNNEST(range(0, $PqM)) t(s)),
      psv AS (SELECT vec_id AS probe_id, sub, svm
              FROM sv JOIN pids USING (vec_id))"""
      + pqReplayCtes("_d", trainPred = "vec_id % 10 < 8")
      + pqReplayCtes("_r")
      + s""",
      exsc AS (SELECT probe_id, a.vec_id AS neighbor_id,
                      ${pqD2("a.vm", "p.pm", Dim)} AS d2
               FROM em a CROSS JOIN probes p WHERE a.vec_id <> p.probe_id),
      exact AS (SELECT probe_id, neighbor_id FROM (
                  SELECT probe_id, neighbor_id,
                         row_number() OVER (PARTITION BY probe_id
                           ORDER BY d2, neighbor_id) AS rk
                  FROM exsc) WHERE rk <= $PqK),
      hits AS (
        SELECT 'pq_drifted' AS method,
               CAST(count(*) AS BIGINT) AS total_hits,
               $Y71DriftedFloor AS bound
        FROM srv_d SEMI JOIN exact USING (probe_id, neighbor_id)
        UNION ALL
        SELECT 'pq_retrained', CAST(count(*) AS BIGINT),
               $Y71RetrainedFloor
        FROM srv_r SEMI JOIN exact USING (probe_id, neighbor_id))
      SELECT method, n_probes, total_hits,
             CAST(total_hits AS DOUBLE) / (n_probes * $PqK) AS recall,
             CASE WHEN CAST(total_hits AS DOUBLE) / (n_probes * $PqK)
                    >= bound THEN 1 ELSE 0 END AS recall_ok
      FROM hits, np
      ORDER BY method""")
  ) { (s, d) =>
    val emb = embeddings(s, d)
    val probeIds = Similarity.boundedProbeIds(emb, NProbesBound)
    Pq.servedRecallPanel(s, Seq(
        ("pq_drifted", ensurePqStore(s, d), Y71DriftedFloor),
        ("pq_retrained", ensurePqRetrainedStore(s, d),
          Y71RetrainedFloor)),
      emb, probeIds, IvfNprobe, PqShort, PqK, PqM, Dim)
      .orderBy("method")
  }

  // --- Y67: PREDICATE-FILTERED IVFADC serving graded (round 15 —
  // VERDICT r14 #3's graded row): the filtered-RAG shape on the
  // APPROXIMATE path, through the pure-SQL graft_ivfadc_topk_filtered
  // TVF (7-argument form — m/dim/vecCol resolve from the geometry
  // manifest). The allowed set (vec_id % 3 == 0) applies after the
  // cell-pruned LUT join and BEFORE the kShort cut, so the shortlist
  // is kShort candidates OVER THE ALLOWED SET — the filtered-ANN
  // recall trap (post-filter an unfiltered shortlist → holes) done
  // right; quantizers and probed-cell selection stay whole-corpus
  // (filtering candidates ≠ retraining), which is exactly what the
  // oracle's candidate-only predicate replays. Probes are not gated.
  val y67 = Query(
    "y67_ivfadc_filtered_serve",
    Some(ivfadcServeOracle(candPred = " AND c.vec_id % 3 = 0"))
  ) { (s, d) =>
    import s.implicits._
    val emb = embeddings(s, d)
    emb.createOrReplaceTempView("y67_emb")
    Similarity.boundedProbeIds(emb, NProbesBound).toDF("probe_id")
      .createOrReplaceTempView("y67_probes")
    emb.select("vec_id").filter(col("vec_id") % 3 === 0)
      .createOrReplaceTempView("y67_allowed")
    s.sql(s"""SELECT * FROM graft_ivfadc_topk_filtered(
         '${ensureIvfadcStore(s, d)}', 'y67_emb', 'y67_probes',
         'y67_allowed', $IvfNprobe, $PqShort, $PqK)""")
      .orderBy("probe_id", "rk")
  }

  // --- Y45: MMR DIVERSE RE-RANKING (Carbonell & Goldstein 1998) — the
  // result-diversification finisher production retrieval ships: from
  // the top-20 integer-dot candidates of one probe, greedily pick 5 by
  // `rel(c) − max_{s∈picked} sim(c, s)` (λ = ½, scaled ×2 so the score
  // stays one BIGINT subtraction; ties → smaller vec_id). Everything is
  // micro-unit integer dots, so the greedy is bit-exact cross-engine;
  // the oracle UNROLLS the 5 steps as chained 1-row CTEs (no recursion
  // needed at fixed k). Spark side: the 20-row candidate set + its
  // 64-long vectors are the sanctioned bounded collect; the corpus
  // contributes one broadcast-probe dot scan + TakeOrdered(20).
  private val MmrPool = 20
  private val MmrK = 5
  private def dotSql(a: String, b: String) =
    s"CAST(list_aggregate(list_transform(range(1, ${Dim + 1}), " +
      s"j -> $a[j] * $b[j]), 'sum') AS BIGINT)"
  val y45 = Query(
    "y45_mmr_rerank",
    Some {
      // step i: the argmax of rel − max(sim to p1..p_{i-1}) among
      // candidates not yet picked
      def pick(i: Int): String = {
        val prev = (1 until i).map(j => s"p$j")
        val simExpr =
          if (prev.isEmpty) "CAST(0 AS BIGINT)"
          else prev.map(p => dotSql("c.vm", s"$p.vm"))
            .reduce((x, y) => s"greatest($x, $y)")
        val notPicked =
          if (prev.isEmpty) "true"
          else prev.map(p => s"c.vec_id <> $p.vec_id").mkString(" AND ")
        val fromPrev = if (prev.isEmpty) "" else prev.mkString(", ", ", ", "")
        s"""p$i AS (SELECT c.vec_id, c.rel, c.vm FROM cand c$fromPrev
             WHERE $notPicked
             ORDER BY c.rel - ($simExpr) DESC, c.vec_id LIMIT 1)"""
      }
      s"""
      WITH em AS (SELECT vec_id,
              list_transform(CAST(embedding AS DOUBLE[]),
                x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS vm
            FROM embeddings),
      probe AS (SELECT vec_id, vm FROM em
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1),
      cand AS (SELECT e.vec_id, ${dotSql("e.vm", "p.vm")} AS rel, e.vm
               FROM em e CROSS JOIN probe p
               WHERE e.vec_id <> p.vec_id
               ORDER BY rel DESC, e.vec_id LIMIT $MmrPool),
      ${(1 to MmrK).map(pick).mkString(",\n      ")}
      ${(1 to MmrK).map(i =>
          s"SELECT CAST($i AS INT) AS rank, vec_id, rel FROM p$i")
          .mkString("\n      UNION ALL\n      ")}
      ORDER BY rank"""
    }
  ) { (s, d) =>
    import s.implicits._
    val emb = embeddings(s, d)
    val probeId = Similarity.boundedProbeIds(emb, 1).head
    val mv = Pq.microVectors(emb)
    val probe = mv.filter(col("vec_id") === probeId).toDF("probe_id", "pm")
    val cand = mv.filter(col("vec_id") =!= probeId)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        graft.functions.VectorFunctions.dotLong(col("vm"), col("pm"))
          .as("rel"),
        col("vm"))
      .orderBy(col("rel").desc, col("vec_id")).limit(MmrPool)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[scala.collection.Seq[Long]](2).toArray))
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val picked = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Array[Long])]
    for (_ <- 1 to MmrK) {
      val best = cand
        .filter(c => !picked.exists(_._1 == c._1))
        .map(c => (c, c._2 -
          (if (picked.isEmpty) 0L
           else picked.map(p => dot(c._3, p._3)).max)))
        .minBy { case (c, score) => (-score, c._1) }._1
      picked += best
    }
    picked.zipWithIndex
      .map { case ((id, rel, _), i) => (i + 1, id, rel) }.toSeq
      .toDF("rank", "vec_id", "rel")
      .orderBy("rank")
  }

  val all: Seq[Query] = Seq(q17, x04, x05, x34, x43, x46, x47, x48, x54, x55,
    x61, y02, y21, y22, y25, y30, y36, y45, y51, y56, y65, y66, y67, y70,
    y71)
}
