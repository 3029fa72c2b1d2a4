package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables._
import graft.operators.Dedup
import graft.functions.TextFunctions

/** Dedup suite (SURVEY §2.12 + Q16): exact, MinHash-LSH, SimHash, n-gram
  * Jaccard. Every oracle recomputes the same algorithm in DuckDB SQL —
  * portable because the only hash primitive is md5 (identical hex in both
  * engines) and every double→int conversion floors first.
  */
object DedupQueries {

  private val normSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

  // --- Q16: exact dedup on normalized text
  val q16 = Query(
    "q16_dedup_exact",
    Some(s"""
      SELECT md5($normSql) AS text_hash,
             CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
             CAST(count(*) AS BIGINT) AS n_dupes
      FROM documents
      GROUP BY 1
      ORDER BY keep_doc_id""")
  ) { (s, d) =>
    Dedup.exact(documents(s, d))
      .select("text_hash", "keep_doc_id", "n_dupes")
      .orderBy("keep_doc_id")
  }

  // --- X1: MinHash + LSH near-dup candidates (8 hashes, 4 bands × 2)
  /** Candidate-pair CTE chain shared by the MinHash-family oracles (x01,
    * x21, x25, x31, x36, x41, x42, x53). `recursive = true` emits WITH
    * RECURSIVE so callers can append recursive CTEs (x42's
    * connected-components closure); `prelude` CTEs are inserted right
    * after WITH and `src` names the table the chain reads (x53 feeds it
    * the quality+exact-dedup survivors instead of raw documents). */
  private[queries] def minhashCandidateCtes(recursive: Boolean = false,
                                            prelude: String = "",
                                            src: String = "documents"): String = {
    // Hash contract (mirrors TextFunctions.minhashHex/minhash and
    // MinHashAgg): hexcat = md5(s) || md5('1|' || s), hash i = hex chars
    // [8i, 8i+8), lexicographic min.
    val mins = (0 until Dedup.NumHashes)
      .map(i => s"min(substr(md5(s) || md5('1|' || s), ${8 * i + 1}, 8)) AS mh$i")
      .mkString(",\n               ")
    val bandSelects = (0 until Dedup.Bands).map { b =>
      val r0 = b * 2; val r1 = r0 + 1
      s"SELECT doc_id, $b AS band, md5(mh$r0 || mh$r1) AS bh FROM sigs"
    }.mkString("\n        UNION ALL ")
    val matchSum = (0 until Dedup.NumHashes)
      .map(i => s"CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""
      WITH ${if (recursive) "RECURSIVE " else ""}$prelude n AS (
        SELECT doc_id, $normSql AS norm FROM $src),
      w AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM n),
      sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(ws) - 1),
                 j -> array_to_string(ws[j:j+2], ' '))) AS s
        FROM w WHERE len(ws) >= 3),
      sigs AS (
        SELECT doc_id,
               $mins
        FROM sh GROUP BY doc_id),
      bands AS (
        $bandSelects),
      pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
      cand AS (
        SELECT p.doc_a, p.doc_b,
               CAST(($matchSum) AS DOUBLE) / ${Dedup.NumHashes} AS est_jaccard
        FROM pairs p
        JOIN sigs sa ON p.doc_a = sa.doc_id
        JOIN sigs sb ON p.doc_b = sb.doc_id)"""
  }

  val x01 = Query("x01_dedup_minhash_lsh", Some(
    minhashCandidateCtes() + "\n      SELECT doc_a, doc_b, est_jaccard FROM cand ORDER BY doc_a, doc_b"
  )) { (s, d) =>
    Dedup.minhashLshCandidates(documents(s, d)).orderBy("doc_a", "doc_b")
  }

  // --- X21: dedup decisions — LSH candidates → greedy drop policy
  val x21 = Query("x21_dedup_pipeline", Some(
    minhashCandidateCtes() + """
      SELECT d.doc_id,
             CASE WHEN dr.doc_id IS NOT NULL THEN 1 ELSE 0 END AS dropped
      FROM documents d
      LEFT JOIN (SELECT DISTINCT doc_b AS doc_id FROM cand
                 WHERE est_jaccard >= 0.5) dr ON d.doc_id = dr.doc_id
      ORDER BY d.doc_id"""
  )) { (s, d) =>
    Dedup.minhashDedupDecisions(documents(s, d), estThreshold = 0.5)
      .orderBy("doc_id")
  }

  // --- X2: 16-bit SimHash signatures + collision buckets
  private val simhashOracle: String = {
    val bit = TextFunctions.md5BitSql("w", "j")
    s"""
      WITH n AS (
        SELECT doc_id, $normSql AS norm FROM documents),
      tok AS (
        SELECT doc_id, unnest(string_split(norm, ' ')) AS w FROM n),
      bits AS (
        SELECT doc_id, w, j,
               $bit AS bit
        FROM tok, UNNEST(range(0, 16)) AS t(j)),
      bsums AS (
        SELECT doc_id, j, SUM(bit * 2 - 1) AS bsum
        FROM bits GROUP BY doc_id, j),
      hashes AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN bsum >= 0
                 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
        FROM bsums GROUP BY doc_id)
      SELECT doc_id, simhash,
             CAST(COUNT(*) OVER (PARTITION BY simhash) AS BIGINT) AS n_same_hash
      FROM hashes
      ORDER BY doc_id"""
  }

  val x02 = Query("x02_dedup_simhash", Some(simhashOracle)) { (s, d) =>
    Dedup.simhash(documents(s, d))
      .select("doc_id", "simhash", "n_same_hash")
      .orderBy("doc_id")
  }

  // --- X3: exact n-gram Jaccard within lang blocks, over the df-capped
  // shingle universe (df ≤ MaxDf): a boilerplate shingle in d docs joins
  // quadratically (d² pair rows), so the cap bounds per-shingle fan-out —
  // the standard inverted-index guard. Oracle replays the identical cap.
  private val MaxDf = 50
  private val jaccardOracle: String = s"""
      WITH n AS (
        SELECT doc_id, lang, $normSql AS norm FROM documents),
      w AS (SELECT doc_id, lang, string_split(norm, ' ') AS ws FROM n),
      sh0 AS (
        SELECT DISTINCT doc_id, lang,
               unnest(list_transform(range(1, len(ws) - 1),
                 j -> array_to_string(ws[j:j+2], ' '))) AS s
        FROM w WHERE len(ws) >= 3),
      hot AS (SELECT lang, s FROM sh0 GROUP BY lang, s HAVING count(*) > $MaxDf),
      sh AS (SELECT sh0.* FROM sh0 ANTI JOIN hot USING (lang, s)),
      counts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM sh a JOIN sh b
          ON a.lang = b.lang AND a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT doc_a, doc_b, n_shared,
             CAST(n_shared AS DOUBLE) / (ca.n_sh + cb.n_sh - n_shared) AS jaccard
      FROM inter
      JOIN counts ca ON doc_a = ca.doc_id
      JOIN counts cb ON doc_b = cb.doc_id
      WHERE CAST(n_shared AS DOUBLE) / (ca.n_sh + cb.n_sh - n_shared) >= 0.1
      ORDER BY doc_a, doc_b"""

  val x03 = Query("x03_dedup_ngram_jaccard", Some(jaccardOracle)) { (s, d) =>
    Dedup.ngramJaccard(documents(s, d), threshold = 0.1, maxDf = MaxDf)
      .orderBy("doc_a", "doc_b")
  }

  // --- X25: MinHash signatures via the TypedImperativeAggregate — one
  // binary-buffer agg pass instead of 8 independent min() buffers; oracle
  // replays the identical md5-slice mins in SQL.
  val x25 = Query("x25_minhash_agg", Some(
    minhashCandidateCtes() +
      "\n      SELECT doc_id, mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7 FROM sigs ORDER BY doc_id"
  )) { (s, d) =>
    import graft.functions.MinHashAgg
    val sig = Dedup.explodedShingles(documents(s, d)).groupBy("doc_id")
      .agg(MinHashAgg.minhash(s, col("s")).as("mh"))
    sig.select(col("doc_id") +:
        (0 until Dedup.NumHashes).map(i => element_at(col("mh"), i + 1).as(s"mh$i")): _*)
      .orderBy("doc_id")
  }

  // --- X31: edit-distance refinement of LSH candidates — the standard
  // fuzzy-dedup composition at scale: the O(n²) Levenshtein DP runs ONLY
  // on band-colliding pairs (data-driven candidate volume), never on the
  // full pair space. sim = 1 - lev / max(len_a, len_b), both engines'
  // levenshtein is the same codepoint-counting DP.
  val x31 = Query("x31_dedup_editdistance", Some(
    minhashCandidateCtes() + s"""
      SELECT c.doc_a, c.doc_b,
             CAST(levenshtein(na.norm, nb.norm) AS BIGINT) AS lev,
             round(1.0 - CAST(levenshtein(na.norm, nb.norm) AS DOUBLE)
               / greatest(length(na.norm), length(nb.norm)), 6) AS edit_sim
      FROM cand c
      JOIN n na ON c.doc_a = na.doc_id
      JOIN n nb ON c.doc_b = nb.doc_id
      ORDER BY doc_a, doc_b"""
  )) { (s, d) =>
    val docs = documents(s, d)
    val cands = Dedup.minhashLshCandidates(docs).select("doc_a", "doc_b")
    val norms = docs.select(col("doc_id"),
      graft.functions.TextFunctions.normText(col("text")).as("norm"))
    val lev = levenshtein(col("norm_a"), col("norm_b"))
    cands
      .join(norms.toDF("doc_a", "norm_a"), "doc_a")
      .join(norms.toDF("doc_b", "norm_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        lev.cast("long").as("lev"),
        round(lit(1.0) - lev.cast("double")
          / greatest(length(col("norm_a")), length(col("norm_b"))), 6).as("edit_sim"))
      .orderBy("doc_a", "doc_b")
  }

  // --- X36/X41 shared oracle: a new doc (doc_id % 10 >= 8 stands in for
  // "today's crawl") drops iff it band-collides with an OLD doc at
  // est ≥ 0.5. New-vs-new pairs are out of scope (that's x21's in-batch
  // decision flow). The oracle derives all signatures from text — HOW the
  // engine gets the old side (recompute vs persisted store) is invisible
  // in the result, which is exactly what makes x41 a fair store test.
  private val incrementalOracleTail = """
      , newdrops AS (
        SELECT DISTINCT CASE WHEN doc_a % 10 >= 8 THEN doc_a ELSE doc_b END AS doc_id
        FROM cand
        WHERE est_jaccard >= 0.5
          AND ((doc_a % 10 >= 8) <> (doc_b % 10 >= 8)))
      SELECT d.doc_id,
             CASE WHEN nd.doc_id IS NOT NULL THEN 1 ELSE 0 END AS dropped
      FROM documents d LEFT JOIN newdrops nd ON d.doc_id = nd.doc_id
      WHERE d.doc_id % 10 >= 8
      ORDER BY d.doc_id"""

  // --- X36: incremental dedup WITHOUT a store (first-run bootstrap path:
  // every signature derived from text in the same job).
  val x36 = Query("x36_dedup_incremental", Some(
    minhashCandidateCtes() + incrementalOracleTail
  )) { (s, d) =>
    Dedup.incrementalDropDecisions(documents(s, d),
        isNew = id => id % 10 >= 8, estThreshold = 0.5)
      .orderBy("doc_id")
  }

  // --- X41: incremental dedup THROUGH the persisted signature store — the
  // production cadence. The old corpus's signatures are written to a
  // parquet store once (memoized per fixture dir; at 100 TB this is the
  // standing table each day's batch appends to), and the query reads OLD
  // signatures from the store: only the new batch is normalized, shingled
  // and hashed — old documents' text is never scanned (PlanShapeSpec pins
  // exactly one documents scan in the plan).
  val x41 = Query("x41_dedup_sigstore", Some(
    minhashCandidateCtes() + incrementalOracleTail
  )) { (s, d) =>
    val store = ensureSigStore(s, d)
    Dedup.incrementalDropDecisionsFromStore(
        documents(s, d).filter(col("doc_id") % 10 >= 8),
        Dedup.readSignatureStore(s, store), estThreshold = 0.5)
      .orderBy("doc_id")
  }

  /** Signature-store bootstrap for x41/x56: old-corpus (doc_id % 10 < 8)
    * signatures written once per fixture under java.io.tmpdir, keyed by
    * the dir name AND a content fingerprint of documents.parquet
    * (size + mtime) — regenerating the fixture at the same path, or two
    * datasets sharing a dir name, gets a fresh store instead of silently
    * reusing stale signatures. The `_SUCCESS` marker makes the write
    * idempotent across Verify/Bench passes in one harness run — matching
    * production, where the store is standing state, not per-query work. */
  private def sigStorePath(sfDir: String): String = {
    val f = new java.io.File(sfDir, "documents.parquet")
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${f.length}:${f.lastModified}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    s"${sys.props("java.io.tmpdir")}/graft-sigstore-" +
      s"${sfDir.replaceAll("[^A-Za-z0-9._-]", "_")}-$fp"
  }

  private def ensureSigStore(s: org.apache.spark.sql.SparkSession, d: String): String = {
    val path = sigStorePath(d)
    if (!new java.io.File(path, "_SUCCESS").exists())
      Dedup.writeSignatureStore(
        documents(s, d).filter(col("doc_id") % 10 < 8), path)
    path
  }

  // --- X42: cluster-closure dedup — smallest-id connected components over
  // the candidate graph (est ≥ 0.5), one survivor per duplicate cluster.
  // Spark side: iterated min-label propagation to fixpoint; oracle side:
  // the same closure as a recursive CTE (min reachable id per node).
  val x42 = Query("x42_dedup_cluster", Some(
    minhashCandidateCtes(recursive = true) + """
      , edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM cand WHERE est_jaccard >= 0.5
        UNION ALL
        SELECT doc_b, doc_a FROM cand WHERE est_jaccard >= 0.5),
      reach(node, lbl) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.node),
      comp AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node)
      SELECT d.doc_id,
             COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
             CASE WHEN COALESCE(c.cluster_id, d.doc_id) = d.doc_id
                  THEN 1 ELSE 0 END AS kept
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
      ORDER BY d.doc_id"""
  )) { (s, d) =>
    Dedup.clusterClosureDecisions(documents(s, d), estThreshold = 0.5)
      .orderBy("doc_id")
  }

  // --- X56: INCREMENTAL cluster-closure from the signature store — x42's
  // global closure composed with x41's store cadence: the edge set is
  // new–new ∪ new–old(store) ∪ old–old-within-the-frontier, so old
  // candidates are never recomputed and old TEXT is never scanned
  // (PlanShapeSpec pins the new-batch filter on every documents scan).
  // Decisions for NEW docs only: kept iff the cluster has no old member
  // (old docs are already in the corpus and always win) and the doc is
  // the cluster's smallest id. The oracle replays the same bounded edge
  // set — including the frontier restriction — as a recursive CTE.
  val x56 = Query("x56_dedup_incr_cluster", Some(
    minhashCandidateCtes(recursive = true) + """
      , nn AS (
        SELECT doc_a, doc_b FROM cand
        WHERE est_jaccard >= 0.5 AND doc_a % 10 >= 8 AND doc_b % 10 >= 8),
      no_ AS (
        SELECT CASE WHEN doc_a % 10 >= 8 THEN doc_a ELSE doc_b END AS doc_a,
               CASE WHEN doc_a % 10 >= 8 THEN doc_b ELSE doc_a END AS doc_b
        FROM cand
        WHERE est_jaccard >= 0.5 AND ((doc_a % 10 >= 8) <> (doc_b % 10 >= 8))),
      frontier AS (SELECT DISTINCT doc_b AS doc_id FROM no_),
      oo AS (
        SELECT doc_a, doc_b FROM cand
        WHERE est_jaccard >= 0.5 AND doc_a % 10 < 8 AND doc_b % 10 < 8
          AND doc_a IN (SELECT doc_id FROM frontier)
          AND doc_b IN (SELECT doc_id FROM frontier)),
      alledges AS (
        SELECT doc_a, doc_b FROM nn UNION ALL
        SELECT doc_a, doc_b FROM no_ UNION ALL
        SELECT doc_a, doc_b FROM oo),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM alledges
        UNION ALL
        SELECT doc_b, doc_a FROM alledges),
      reach(node, lbl) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.src, r.lbl FROM edges e JOIN reach r ON e.dst = r.node),
      comp AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node),
      oldclusters AS (
        SELECT DISTINCT cluster_id FROM comp WHERE node % 10 < 8)
      SELECT d.doc_id,
             COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
             CASE WHEN COALESCE(c.cluster_id, d.doc_id) = d.doc_id
                   AND COALESCE(c.cluster_id, d.doc_id) NOT IN
                       (SELECT cluster_id FROM oldclusters)
                  THEN 1 ELSE 0 END AS kept
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
      WHERE d.doc_id % 10 >= 8
      ORDER BY d.doc_id"""
  )) { (s, d) =>
    val store = ensureSigStore(s, d)
    Dedup.incrementalClusterClosure(
        documents(s, d).filter(col("doc_id") % 10 >= 8),
        s.read.parquet(graft.streaming.StoreFs.dataDir(s, store)), estThreshold = 0.5)
      .orderBy("doc_id")
  }

  // --- X49: LSH bucket-size observability — the band join costs
  // Σ|bucket|², so the top buckets ARE the skew monitor (boilerplate
  // families share a band hash). TakeOrderedAndProject keeps the top-N
  // selection shuffle-light.
  val x49 = Query("x49_lsh_bucket_stats", Some(
    minhashCandidateCtes() + """
      SELECT band, bh, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(min(doc_id) AS BIGINT) AS min_doc
      FROM bands GROUP BY band, bh
      ORDER BY n_docs DESC, band, bh
      LIMIT 5"""
  )) { (s, d) =>
    Dedup.lshBucketStats(documents(s, d), topN = 5)
  }

  // --- X58: the hot-bucket cap x49 observes, ENFORCED as dedup policy —
  // over-cap LSH buckets (templated/boilerplate families, where the band
  // join would pay m² pairs) are decided wholesale (keep min doc_id,
  // drop the rest, flagged via_cap); the pairwise est-Jaccard flow runs
  // only over sub-cap buckets. Cap = 2 at the graded SF so the fixture's
  // 3-member family actually exercises the cap path while 2-member
  // buckets stay pairwise. The oracle replays the identical split.
  private val BucketCap = 2
  val x58 = Query("x58_dedup_bucket_cap", Some {
    val matchSum = (0 until Dedup.NumHashes)
      .map(i => s"CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    minhashCandidateCtes() + s"""
      , bsize AS (
        SELECT band, bh, count(*) AS nb, min(doc_id) AS mindoc
        FROM bands GROUP BY band, bh),
      hot AS (SELECT band, bh, mindoc FROM bsize WHERE nb > $BucketCap),
      cold AS (SELECT b.* FROM bands b ANTI JOIN hot USING (band, bh)),
      cpairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM cold a JOIN cold b
          ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
      pairdrops AS (
        SELECT DISTINCT p.doc_b AS doc_id
        FROM cpairs p
        JOIN sigs sa ON p.doc_a = sa.doc_id
        JOIN sigs sb ON p.doc_b = sb.doc_id
        WHERE CAST(($matchSum) AS DOUBLE) / ${Dedup.NumHashes} >= 0.5),
      capdrops AS (
        SELECT DISTINCT b.doc_id
        FROM bands b JOIN hot h USING (band, bh)
        WHERE b.doc_id <> h.mindoc)
      SELECT d.doc_id,
             CASE WHEN pd.doc_id IS NOT NULL OR cd.doc_id IS NOT NULL
                  THEN 1 ELSE 0 END AS dropped,
             CASE WHEN cd.doc_id IS NOT NULL THEN 1 ELSE 0 END AS via_cap
      FROM documents d
      LEFT JOIN pairdrops pd ON d.doc_id = pd.doc_id
      LEFT JOIN capdrops cd ON d.doc_id = cd.doc_id
      ORDER BY d.doc_id"""
  }) { (s, d) =>
    Dedup.minhashDedupDecisionsCapped(documents(s, d),
        estThreshold = 0.5, bucketCap = BucketCap)
      .orderBy("doc_id")
  }

  // --- X59: benchmark DECONTAMINATION — eval-set hygiene as a graded
  // query: doc_id % 17 = 0 stands in for the benchmark/eval set; a
  // training doc is contaminated iff it shares any distinct 5-gram with
  // a benchmark doc. Catches verbatim eval leakage document-level dedup
  // misses. One inverted-index semi join; never doc×doc.
  val x59 = Query(
    "x59_decontamination",
    Some(s"""
      WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
      w AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM n),
      g AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(ws) - 3),
                 j -> array_to_string(ws[j:j+4], ' '))) AS s
        FROM w WHERE len(ws) >= 5),
      bg AS (SELECT DISTINCT s FROM g WHERE doc_id % 17 = 0),
      hits AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared_grams
        FROM g SEMI JOIN bg USING (s)
        WHERE doc_id % 17 <> 0 GROUP BY doc_id)
      SELECT d.doc_id,
             COALESCE(h.n_shared_grams, 0) AS n_shared_grams,
             CASE WHEN COALESCE(h.n_shared_grams, 0) > 0 THEN 1 ELSE 0 END
               AS contaminated
      FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
      WHERE d.doc_id % 17 <> 0
      ORDER BY d.doc_id""")
  ) { (s, d) =>
    Dedup.benchmarkContamination(documents(s, d),
        isBench = id => id % 17 === 0, k = 5)
      .orderBy("doc_id")
  }

  // --- X53: the END-TO-END training-data pipeline as ONE DAG — the flow
  // a corpus-curation user actually runs: quality gate (≥20 words) →
  // exact dedup (keep min doc per normalized hash) → MinHash-LSH
  // near-dup dedup over the SURVIVORS → per-language corpus stats.
  // Every stage is an existing graded operator; what this grades is the
  // COMPOSITION (filters feed the shingle pipeline, anti joins chain,
  // one plan end to end). Oracle replays the same staged CTEs with the
  // candidate chain re-pointed at the survivor set.
  val x53 = Query("x53_pipeline_e2e", Some(
    minhashCandidateCtes(
      prelude = s"""q AS (
        SELECT doc_id, text, lang FROM documents
        WHERE len(string_split($normSql, ' ')) >= 20),
      eh AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5($normSql)),
      kept AS (SELECT q.doc_id, q.text, q.lang FROM q JOIN eh USING (doc_id)),""",
      src = "kept") + s"""
      , drops AS (
        SELECT DISTINCT doc_b AS doc_id FROM cand WHERE est_jaccard >= 0.5),
      fin AS (SELECT kept.* FROM kept ANTI JOIN drops USING (doc_id))
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split($normSql, ' '))) AS BIGINT) AS n_tokens
      FROM fin GROUP BY lang
      ORDER BY lang"""
  )) { (s, d) =>
    import graft.functions.TextFunctions._
    val docs = documents(s, d)
    val quality = docs.filter(size(words(normText(col("text")))) >= 20)
      .select("doc_id", "text", "lang")
    val kept = quality.join(
      Dedup.exact(quality).select(col("keep_doc_id").as("doc_id")), "doc_id")
    val drops = Dedup.minhashLshCandidates(kept)
      .filter(col("est_jaccard") >= 0.5)
      .select(col("doc_b").as("doc_id")).distinct()
    kept.join(drops, Seq("doc_id"), "left_anti")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(words(normText(col("text")))).cast("long")).as("n_tokens"))
      .orderBy("lang")
  }

  // --- X86: EXACT-SUBSTRING dedup (Lee et al. 2022) — the span-level
  // primitive document-MinHash (x01) and line dedup (x77) both miss:
  // per doc, the merged spans of ≥ K tokens repeated anywhere in the
  // corpus. Suffix-array semantics via the equivalent k-gram inverted
  // index: a position is duplicated iff some K-window covering it occurs
  // ≥ 2× corpus-wide; overlapping/adjacent windows merge by
  // gaps-and-islands (positions ascending ⇒ previous end = lag(pos)+K).
  // One gram-count shuffle + one semi join + per-doc windows; never
  // doc×doc (PlanShapeSpec pins zero CartesianProduct).
  private val EsK = 8
  val x86 = Query(
    "x86_exact_substring",
    Some(s"""
      WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
      w AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM n),
      g AS (SELECT doc_id,
              unnest(range(1, greatest(len(ws) - $EsK + 2, 1))) AS j, ws
            FROM w),
      gh AS (SELECT doc_id, CAST(j - 1 AS BIGINT) AS pos,
                    md5(array_to_string(ws[j:j+$EsK-1], ' ')) AS gh
             FROM g),
      dup AS (SELECT gh FROM gh GROUP BY gh HAVING count(*) > 1),
      hit AS (SELECT doc_id, pos FROM gh SEMI JOIN dup USING (gh)),
      fl AS (SELECT doc_id, pos,
               CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                      IS NULL
                    OR pos > lag(pos) OVER (PARTITION BY doc_id
                                            ORDER BY pos) + $EsK
                    THEN 1 ELSE 0 END AS f
             FROM hit),
      isl AS (SELECT doc_id, pos, SUM(f) OVER (PARTITION BY doc_id
                ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
              FROM fl),
      sp AS (SELECT doc_id, island, MIN(pos) AS s0, MAX(pos) + $EsK AS e0
             FROM isl GROUP BY doc_id, island),
      pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
                    CAST(SUM(e0 - s0) AS BIGINT) AS n_dup_toks
             FROM sp GROUP BY doc_id)
      SELECT w.doc_id, CAST(len(w.ws) AS BIGINT) AS n_toks,
             COALESCE(pd.n_dup_toks, CAST(0 AS BIGINT)) AS n_dup_toks,
             COALESCE(pd.n_spans, CAST(0 AS BIGINT)) AS n_spans,
             CAST(COALESCE(pd.n_dup_toks, 0) AS DOUBLE) / len(w.ws)
               AS dup_frac
      FROM w LEFT JOIN pd ON pd.doc_id = w.doc_id
      ORDER BY w.doc_id""")
  ) { (s, d) =>
    Dedup.exactSubstringSpans(documents(s, d), k = EsK).orderBy("doc_id")
  }

  // --- X91: exact-substring REMOVAL — the corpus edit x86's report
  // implies (Lee et al. drop the repeated spans): every token covered by
  // a duplicated ≥ K-window is removed (all occurrences) and each doc's
  // surviving token stream is graded as an md5 over the in-order kept
  // tokens. Coverage = hit positions exploded to their K offsets (bounded
  // K× blowup of HIT rows only) anti-joined against position-indexed
  // tokens; reassembly is a per-doc sort_array fold — no window.
  val x91 = Query(
    "x91_exact_substring_clean",
    Some(s"""
      WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
      w AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM n),
      g AS (SELECT doc_id,
              unnest(range(1, greatest(len(ws) - $EsK + 2, 1))) AS j, ws
            FROM w),
      gh AS (SELECT doc_id, CAST(j - 1 AS BIGINT) AS pos,
                    md5(array_to_string(ws[j:j+$EsK-1], ' ')) AS gh
             FROM g),
      dup AS (SELECT gh FROM gh GROUP BY gh HAVING count(*) > 1),
      hit AS (SELECT doc_id, pos FROM gh SEMI JOIN dup USING (gh)),
      cov AS (SELECT DISTINCT doc_id, CAST(unnest(range(pos, pos + $EsK))
                AS BIGINT) AS p
              FROM hit),
      ti AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS j, ws FROM w),
      tk AS (SELECT doc_id, CAST(j - 1 AS BIGINT) AS p, ws[j] AS w FROM ti),
      kept AS (SELECT doc_id, p, w FROM tk ANTI JOIN cov USING (doc_id, p)),
      pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept_toks,
               md5(string_agg(w, ' ' ORDER BY p)) AS clean_hash
             FROM kept GROUP BY doc_id)
      SELECT w.doc_id, CAST(len(w.ws) AS BIGINT) AS n_toks,
             COALESCE(pd.n_kept_toks, CAST(0 AS BIGINT)) AS n_kept_toks,
             COALESCE(pd.clean_hash, md5('')) AS clean_hash
      FROM w LEFT JOIN pd ON pd.doc_id = w.doc_id
      ORDER BY w.doc_id""")
  ) { (s, d) =>
    Dedup.exactSubstringClean(documents(s, d), k = EsK).orderBy("doc_id")
  }

  // --- X93: INCREMENTAL exact-substring dedup — the x41/x81 store
  // cadence applied to spans: the old corpus (doc_id % 10 < 8) lives
  // only as its per-gram COUNT store (md5 + count, ~40 B/gram); a new
  // doc's window is duplicated iff batch + stored occurrences ≥ 2. Old
  // text is never rescanned (PlanShapeSpec pins the only documents scan
  // carries the new-batch filter); the span merge runs over new-batch
  // hits only. The oracle replays the combined counts from the raw
  // tables.
  private def gramStorePath(sfDir: String): String = {
    val f = new java.io.File(sfDir, "documents.parquet")
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${f.length}:${f.lastModified}:$EsK".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    s"${sys.props("java.io.tmpdir")}/graft-gramstore-" +
      s"${sfDir.replaceAll("[^A-Za-z0-9._-]", "_")}-$fp"
  }

  private def ensureGramStore(s: org.apache.spark.sql.SparkSession,
                              d: String): String = {
    val path = gramStorePath(d)
    if (!new java.io.File(path, "_SUCCESS").exists())
      Dedup.writeGramStore(
        documents(s, d).filter(col("doc_id") % 10 < 8), path, k = EsK)
    path
  }

  val x93 = Query(
    "x93_exact_substring_incr",
    Some(s"""
      WITH n AS (SELECT doc_id, $normSql AS norm FROM documents),
      w AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM n),
      g AS (SELECT doc_id,
              unnest(range(1, greatest(len(ws) - $EsK + 2, 1))) AS j, ws
            FROM w),
      gh AS (SELECT doc_id, CAST(j - 1 AS BIGINT) AS pos,
                    md5(array_to_string(ws[j:j+$EsK-1], ' ')) AS gh
             FROM g),
      cnt AS (SELECT gh,
                CAST(SUM(CASE WHEN doc_id % 10 < 8 THEN 1 ELSE 0 END)
                  AS BIGINT) AS old_cnt,
                CAST(SUM(CASE WHEN doc_id % 10 >= 8 THEN 1 ELSE 0 END)
                  AS BIGINT) AS new_cnt
              FROM gh GROUP BY gh),
      dup AS (SELECT gh FROM cnt WHERE new_cnt >= 1
                AND new_cnt + old_cnt >= 2),
      hit AS (SELECT doc_id, pos FROM gh SEMI JOIN dup USING (gh)
              WHERE doc_id % 10 >= 8),
      fl AS (SELECT doc_id, pos,
               CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                      IS NULL
                    OR pos > lag(pos) OVER (PARTITION BY doc_id
                                            ORDER BY pos) + $EsK
                    THEN 1 ELSE 0 END AS f
             FROM hit),
      isl AS (SELECT doc_id, pos, SUM(f) OVER (PARTITION BY doc_id
                ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
              FROM fl),
      sp AS (SELECT doc_id, island, MIN(pos) AS s0, MAX(pos) + $EsK AS e0
             FROM isl GROUP BY doc_id, island),
      pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
                    CAST(SUM(e0 - s0) AS BIGINT) AS n_dup_toks
             FROM sp GROUP BY doc_id)
      SELECT w.doc_id, CAST(len(w.ws) AS BIGINT) AS n_toks,
             COALESCE(pd.n_dup_toks, CAST(0 AS BIGINT)) AS n_dup_toks,
             COALESCE(pd.n_spans, CAST(0 AS BIGINT)) AS n_spans,
             CAST(COALESCE(pd.n_dup_toks, 0) AS DOUBLE) / len(w.ws)
               AS dup_frac
      FROM w LEFT JOIN pd ON pd.doc_id = w.doc_id
      WHERE w.doc_id % 10 >= 8
      ORDER BY w.doc_id""")
  ) { (s, d) =>
    val store = s.read.parquet(graft.streaming.StoreFs.dataDir(s, ensureGramStore(s, d)))
    Dedup.exactSubstringSpansIncremental(
        documents(s, d).filter(col("doc_id") % 10 >= 8), store, k = EsK)
      .orderBy("doc_id")
  }

  val all: Seq[Query] =
    Seq(q16, x01, x02, x03, x21, x25, x31, x36, x41, x42, x49, x53, x56,
      x58, x59, x86, x91, x93)
}
