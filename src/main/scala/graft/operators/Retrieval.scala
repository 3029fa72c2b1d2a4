package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.functions.TextFunctions._

/** Lexical retrieval over the document corpus: BM25 scoring + top-k —
  * the classic quality-weighted keyword search a data pipeline uses for
  * targeted corpus queries (eval-set mining, topic probes).
  *
  * Scale shape: one explode pass computes term frequencies for the
  * query terms only (the `isin` filter prunes before the shuffle, so
  * the aggregated state is |terms|·|matching docs|, not the corpus
  * vocabulary); document frequencies and the global (N, avgdl) scalars
  * are broadcast back. Final per-term top-k goes through the two-phase
  * TopKPerKey plan — no global sort.
  *
  * Cross-engine float discipline: avgdl comes from an exact DECIMAL sum
  * (aggregation-order-proof); idf (the one libm `ln`) is rounded to 6
  * before use; everything after is IEEE-deterministic row arithmetic,
  * and the final score is rounded to 6 on both sides. */
object Retrieval {

  /** All (term, doc) BM25 scores for the query terms — the shared scoring
    * pass behind [[bm25TopK]] and [[hybridRrf]]. Output: term, doc_id,
    * tf, score (rounded-6 double). */
  private[operators] def bm25Scores(docs: DataFrame, terms: Seq[String],
                                    k1: Double, b: Double): DataFrame = {
    val p = docs
      .withColumn("ws", words(normText(col("text"))))
      .select(col("doc_id"), col("ws"), size(col("ws")).cast("long").as("dl"))
    // global corpus scalars: one row, broadcast back (the L1-normalize
    // pattern — no global window)
    val stats = p.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl").cast(DecimalType(18, 0))).cast("double").as("sum_dl"))
      .select(col("n_docs"), (col("sum_dl") / col("n_docs")).as("avgdl"))
    val tf = p.select(col("doc_id"), col("dl"), explode(col("ws")).as("term"))
      .filter(col("term").isInCollection(terms))
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))
    scoreTf(tf, stats, k1, b)
  }

  /** BM25 scoring given a term-frequency table (term, doc_id, dl, tf)
    * and the 1-row (n_docs, avgdl) scalars — the tail shared by the
    * scan path ([[bm25Scores]]) and the store path
    * ([[bm25TopKFromStore]]). */
  private def scoreTf(tf: DataFrame, stats: DataFrame,
                      k1: Double, b: Double): DataFrame = {
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf
      .join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", round(
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0), 6))
      // constants pre-computed in Scala (k1+1, 1-b) are interpolated into
      // the oracle SQL from the same doubles, so both engines see
      // bit-identical literals; the rest is IEEE row arithmetic
      .withColumn("score", round(
        col("idf") * (col("tf") * lit(k1 + 1.0))
          / (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))), 6))
      .select(col("term"), col("doc_id"), col("tf"), col("score"))
  }

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val topk = graft.plans.TopK.perKey(scored, Seq(scored("term")),
      Seq(scored("score").desc, scored("doc_id")), k)
    val w = Window.partitionBy("term").orderBy(col("score").desc, col("doc_id"))
    topk.withColumn("rk", row_number().over(w))
      .select("term", "doc_id", "tf", "score", "rk")
  }

  /** BM25 top-k docs per query term. Output: term, doc_id, tf, score, rk. */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    rankTopK(bm25Scores(docs, terms, k1, b), k)

  /** Persist the inverted index: `postings/` = (term, doc_id, dl, tf)
    * range-partitioned and sorted by term (row-group min/max stats →
    * a query's term IN-filter prunes to its terms' row groups), plus
    * `doclen/` = (doc_id, dl) for the corpus scalars. One tokenize pass
    * over the corpus, ~one row per distinct (term, doc) — the exact
    * trade the ScaleProbe x66 row measures: the 5× growth there is the
    * per-query tokenize, which this store pays ONCE. The same
    * append/compact lifecycle as the signature/gram stores applies
    * (gram-store pattern, `Dedup.exactSubstringIncremental`). */
  def writeIndexStore(docs: DataFrame, path: String): Unit = {
    val p = docs
      .withColumn("ws", words(normText(col("text"))))
      .select(col("doc_id"), col("ws"), size(col("ws")).cast("long").as("dl"))
    p.select(col("doc_id"), col("dl"))
      .write.mode("overwrite").parquet(s"$path/doclen")
    p.select(col("doc_id"), col("dl"), explode(col("ws")).as("term"))
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))
      .repartitionByRange(col("term"))
      .sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$path/postings")
    // geometry manifests per SUB-TABLE (VERDICT r13 #4): an index root
    // can also carry a positional sub, so family is a property of each
    // sub. Written AFTER the data — parquet overwrite deletes the
    // target dir, manifest included; a crash before this line leaves a
    // manifest-less store, which reads under the pre-manifest
    // trust-the-caller contract (safe), unlike the vec store where the
    // manifest names a partition LAYOUT and must precede data.
    val spark = docs.sparkSession
    graft.streaming.StoreFs.writeGeometry(spark, s"$path/doclen", Seq(
      "family" -> "index_doclen", "key_columns" -> "doc_id"))
    graft.streaming.StoreFs.writeGeometry(spark, s"$path/postings", Seq(
      "family" -> "index_postings", "layout" -> "term_sorted",
      "key_columns" -> "term,doc_id"))
  }

  /** Append a NEW batch of documents to an existing index store — the
    * incremental ingest cadence (the x41/x93 store move): only the batch
    * is tokenized; old text is never rescanned. Appended files carry
    * their own row-group term stats, so term-pruned reads stay pruned
    * across generations; [[graft.streaming.StoreFs]]-style compaction
    * can re-sort generations when file sprawl warrants it. */
  def appendIndexStore(newDocs: DataFrame, path: String): Unit = {
    // family guard (VERDICT r13 #4): an append aimed at the wrong store
    // family would interleave foreign rows into plausible parquet
    graft.streaming.StoreFs.requireFamily(newDocs.sparkSession,
      s"$path/postings", "index_postings", "appendIndexStore")
    val p = newDocs
      .withColumn("ws", words(normText(col("text"))))
      .select(col("doc_id"), col("ws"), size(col("ws")).cast("long").as("dl"))
    p.select(col("doc_id"), col("dl"))
      .write.mode("append")
      .parquet(graft.streaming.StoreFs.dataDir(newDocs.sparkSession, s"$path/doclen"))
    p.select(col("doc_id"), col("dl"), explode(col("ws")).as("term"))
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))
      .repartitionByRange(col("term"))
      .sortWithinPartitions("term")
      .write.mode("append")
      .parquet(graft.streaming.StoreFs.dataDir(newDocs.sparkSession, s"$path/postings"))
  }

  /** [[bm25TopK]] served ENTIRELY from the index store — the query plan
    * never touches document text: tf comes from the postings' pruned
    * term filter (O(query-term postings) rows read), the corpus scalars
    * from the compact doclen table. Byte-identical output to the scan
    * path by construction (same scoring tail). */
  def bm25TopKFromStore(spark: org.apache.spark.sql.SparkSession, path: String,
                        terms: Seq[String], k: Int,
                        k1: Double = 1.2, b: Double = 0.75): DataFrame =
    rankTopK(storeScores(spark, path, terms, k1, b), k)

  /** An index serve's RESOLVED store directories — live or
    * snapshot-pinned — plus the tombstone generation when the store
    * carries deletions (`tombs = None` = no exclusions; the
    * [[ExactIvf.VecDirs]] contract). */
  private[operators] final case class IndexDirs(doclen: String,
                                                postings: String,
                                                tombs: Option[String])

  private def liveIndexDirs(spark: org.apache.spark.sql.SparkSession,
                            path: String): IndexDirs =
    IndexDirs(
      graft.streaming.StoreFs.dataDir(spark, s"$path/doclen"),
      graft.streaming.StoreFs.dataDir(spark, s"$path/postings"),
      graft.streaming.StoreFs.liveTombsDir(spark, path))

  /** DELETE documents from the index store by id (round 14 — deletion
    * propagation): tombstones at `$path/tombs` exclude the docs from
    * every store serve EXACTLY — the pruned postings drop their rows
    * (so per-term df shrinks) and the corpus scalars (N, avgdl)
    * recompute over the surviving doclen rows, as if the docs were
    * never indexed. The same tombstones gate the positional serves
    * (phrase/prefix) at the same root. Physical purge + tombstone
    * clearing happen at the next [[compactIndexStore]]; semantics per
    * [[graft.streaming.StoreFs.appendTombstones]]. */
  def deleteFromIndexStore(spark: org.apache.spark.sql.SparkSession,
                           ids: DataFrame, path: String,
                           batchId: Option[Long] = None,
                           idCol: String = "doc_id"): Unit =
    graft.streaming.StoreFs.appendTombstones(spark, s"$path/tombs",
      ids.select(col(idCol).as("doc_id")), "doc_id", "index_tombs",
      batchId)

  private def tombsOf(spark: org.apache.spark.sql.SparkSession,
                      tombsDir: Option[String]): Option[DataFrame] =
    tombsDir.map(d => graft.core.Caches.scoped(
      graft.streaming.StoreFs.readTombstones(spark, d, "doc_id")))

  /** The store-served scoring pass shared by [[bm25TopKFromStore]] and
    * [[hybridRrfBatchFromStores]]: term-pruned postings + compact
    * doclen scalars → the same (term, doc_id, tf, score) rows the scan
    * path produces, with document text nowhere in the plan. */
  private def storeScores(spark: org.apache.spark.sql.SparkSession,
                          path: String, terms: Seq[String],
                          k1: Double, b: Double): DataFrame = {
    // family guard (VERDICT r13 #4): BM25 over a positional/gram store
    // read plausible parquet and scored silently wrong numbers
    graft.streaming.StoreFs.requireFamily(spark, s"$path/postings",
      "index_postings", "BM25 serve")
    storeScoresResolved(spark, liveIndexDirs(spark, path), terms, k1, b)
  }

  private def storeScoresResolved(spark: org.apache.spark.sql.SparkSession,
                                  dirs: IndexDirs,
                                  terms: Seq[String],
                                  k1: Double, b: Double): DataFrame = {
    val tombs = tombsOf(spark, dirs.tombs)
    val tf0 = spark.read.parquet(dirs.postings)
      .filter(col("term").isInCollection(terms))
    // tombstones shift BM25 exactly: the anti-join drops the deleted
    // docs' tf rows BEFORE scoreTf computes df, and the corpus scalars
    // exclude them below — scores match a scan of the corpus minus the
    // deleted docs, not just a post-filtered ranking
    val tf = tombs.fold(tf0)(t => tf0.join(t, Seq("doc_id"), "left_anti"))
    scoreTf(tf, statsFromDir(spark, dirs.doclen, tombs), k1, b)
  }

  /** The (n_docs, avgdl) corpus scalars from the compact doclen table,
    * minus any tombstoned docs. */
  private def statsFromDir(spark: org.apache.spark.sql.SparkSession,
                           doclenDir: String,
                           tombs: Option[DataFrame]): DataFrame = {
    val dl0 = spark.read.parquet(doclenDir)
    val dl = tombs.fold(dl0)(t => dl0.join(t, Seq("doc_id"), "left_anti"))
    dl.agg(count(lit(1)).as("n_docs"),
        sum(col("dl").cast(DecimalType(18, 0))).cast("double").as("sum_dl"))
      .select(col("n_docs"), (col("sum_dl") / col("n_docs")).as("avgdl"))
  }

  /** The pushdown ceiling for the query-TABLE BM25 form: up to this
    * many DISTINCT terms are collected and pushed as the postings
    * scan's literal IN filter — row-group min/max pruning on the
    * term-sorted store genuinely NEEDS analysis-time literals (the
    * postings table is sorted, not directory-partitioned, so the DPP
    * lever has nothing to prune), and the collect is bounded by the
    * REQUEST's own vocabulary — the same sanctioned bound as the
    * hybrid form's term list. Above it, the terms stay a broadcast
    * JOIN: one unpruned postings pass, no driver literal — at that
    * vocabulary a request reads a corpus-scale slice regardless, and
    * an unbounded literal list would blow the plan instead. */
  val MaxTermPushdown = 4096

  /** The query-TABLE form of [[bm25TopKFromStore]] (VERDICT r12 #3):
    * `terms` is a relation with a `term` column — the shape a real
    * serving user (or the `graft_bm25_topk_table` SQL surface) has.
    * Duplicates collapse; a term absent from the store simply scores
    * nothing. Row-identical to the Seq form for the same distinct
    * term set by construction (same scoring tail); the pruning
    * contract is [[MaxTermPushdown]]'s two-regime shape. */
  def bm25TopKFromStore(spark: org.apache.spark.sql.SparkSession,
                        path: String, terms: DataFrame, k: Int,
                        k1: Double, b: Double,
                        maxTermPushdown: Int): DataFrame =
    rankTopK(storeScoresTable(spark, path, terms, k1, b,
      maxTermPushdown), k)

  /** The two-regime scoring pass shared by the query-TABLE BM25 forms:
    * pinned distinct terms, literal pushdown under the ceiling /
    * broadcast join above it, tombstones excluded before df. */
  private def storeScoresTable(spark: org.apache.spark.sql.SparkSession,
                               path: String, terms: DataFrame,
                               k1: Double, b: Double,
                               maxTermPushdown: Int): DataFrame = {
    // pinned: the count and the downstream fan-out must see the same
    // rows from a nondeterministic source (the ExactIvf rationale)
    val t = graft.core.Caches.scoped(
      terms.select(col("term").cast("string").as("term")).distinct())
    if (t.count() <= maxTermPushdown)
      storeScores(spark, path,
        t.collect().map(_.getString(0)).toSeq, k1, b)
    else {
      val dirs = liveIndexDirs(spark, path)
      val tombs = tombsOf(spark, dirs.tombs)
      val tf0 = spark.read.parquet(dirs.postings)
        .join(broadcast(t), Seq("term"))
      val tf = tombs.fold(tf0)(x =>
        tf0.join(x, Seq("doc_id"), "left_anti"))
      scoreTf(tf, statsFromDir(spark, dirs.doclen, tombs), k1, b)
    }
  }

  /** [[bm25TopKFromStore]] (query-TABLE form) with the default
    * pushdown ceiling. */
  def bm25TopKFromStore(spark: org.apache.spark.sql.SparkSession,
                        path: String, terms: DataFrame, k: Int,
                        k1: Double, b: Double): DataFrame =
    bm25TopKFromStore(spark, path, terms, k, k1, b, MaxTermPushdown)

  /** PREDICATE-FILTERED lexical-only serving (round 15 — VERDICT r14
    * #8: the hybrid had `hybridRrfBatchFromStoresFiltered` but a
    * BM25-only user had no filtered form): `allowed` is a relation of
    * permitted `doc_id`s restricting the CANDIDATES while the corpus
    * statistics (N, avgdl, df) stay whole — filtered-SEARCH semantics
    * (the docs still exist, this request just may not see them;
    * deletion is the other contract, [[deleteFromIndexStore]], which
    * shifts the stats). The semi-join runs AFTER scoring and BEFORE
    * the top-k cut, so every returned rank is dense over the allowed
    * set — no holes from post-filtering a full-corpus list. Composes
    * with tombstones (deleted docs leave the stats AND candidates). */
  def bm25TopKFromStoreFiltered(spark: org.apache.spark.sql.SparkSession,
                                path: String, terms: DataFrame,
                                allowed: DataFrame, k: Int,
                                k1: Double = 1.2, b: Double = 0.75,
                                maxTermPushdown: Int = MaxTermPushdown)
      : DataFrame = {
    val a = graft.core.Caches.scoped(
      allowed.select(col("doc_id").cast("long").as("doc_id")).distinct())
    rankTopK(storeScoresTable(spark, path, terms, k1, b, maxTermPushdown)
      .join(a, Seq("doc_id"), "left_semi"), k)
  }

  /** Hybrid lexical+semantic retrieval fused by Reciprocal Rank Fusion:
    * RRF(d) = Σ_lists 1/(C + rank_list(d)) over the doc's ranks in the
    * BM25 list and the embedding-dot list (C = 60, the Cormack/Clarke/
    * Buettcher constant).
    *
    * Determinism discipline: per-doc lexical mass is the INTEGER sum of
    * micro-unit term scores (⌊score·10⁶ + ½⌋ — aggregation-order-proof,
    * the imp_mu pattern); the semantic score is the exact BIGINT dot of
    * hashed embeddings ([[graft.operators.TextAnalysis.hashedEmbedding]])
    * against the probe doc's vector via the codegen'd `graft_dot_long`;
    * ranks are integers, and the final score is two IEEE divisions added
    * in fixed order — bit-identical cross-engine.
    *
    * Scale shape: both scoring passes are corpus-linear (term-pruned
    * explode; 1-row probe-vector broadcast); each list is cut to
    * `kList` by distributed TakeOrdered (never a global sort of the
    * corpus) and ranked by a window over those kList rows; the fusion
    * join touches ≤ 2·kList rows. Per-query cost is two scans + two
    * bounded top-ks — the many-query generalization keys every step by
    * query_id and swaps TakeOrdered for TopKPerKey.
    *
    * Output: doc_id, lex_rk, sem_rk (null = absent from that list),
    * rrf (rounded-6 double), rk — top `kOut` fused docs. */
  def hybridRrf(docs: DataFrame, terms: Seq[String], probeDocId: Long,
                kList: Int = 50, kOut: Int = 20,
                k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val lex = bm25Scores(docs, terms, k1, b)
      .groupBy("doc_id")
      .agg(sum(floor(col("score") * 1e6 + 0.5).cast("long")).as("lex_int"))
      .orderBy(col("lex_int").desc, col("doc_id")).limit(kList)
      .withColumn("lex_rk", row_number().over(
        Window.orderBy(col("lex_int").desc, col("doc_id"))))
      .select("doc_id", "lex_rk")
    val vecs = graft.operators.TextAnalysis.hashedEmbedding(docs)
      .select(col("doc_id"), col("vec"))
    val probe = vecs.filter(col("doc_id") === probeDocId)
      .select(col("vec").as("qvec"))
    val sem = vecs.filter(col("doc_id") =!= probeDocId)
      .crossJoin(broadcast(probe))
      .select(col("doc_id"),
        graft.functions.VectorFunctions.dotLong(col("vec"), col("qvec")).as("dot"))
      .orderBy(col("dot").desc, col("doc_id")).limit(kList)
      .withColumn("sem_rk", row_number().over(
        Window.orderBy(col("dot").desc, col("doc_id"))))
      .select("doc_id", "sem_rk")
    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(60) + col("lex_rk")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("sem_rk")), lit(0.0)), 6))
      .orderBy(col("rrf").desc, col("doc_id")).limit(kOut)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rrf").desc, col("doc_id"))))
      .select(col("doc_id"), col("lex_rk"), col("sem_rk"), col("rrf"), col("rk"))
  }

  /** The many-query form of [[hybridRrf]]: a BATCH of (query_id, terms,
    * probe doc) triples resolved in one pass each over the corpus —
    * exactly the swap the single-query scaladoc promises: every step
    * keys by query_id and the bounded list cuts go through the two-phase
    * [[graft.plans.TopK]] operator instead of a driver-side TakeOrdered,
    * so adding queries adds broadcast rows and per-key heap state, never
    * another corpus scan.
    *
    * Scale shape: ONE term-pruned BM25 pass over the union of all
    * queries' terms (scores depend only on the term, so they're shared),
    * fanned out to queries by a broadcast (query_id, term) join; ONE
    * embedding pass dotted against the ≤|queries| broadcast probe
    * vectors. Rank windows run per query over ≤ kList rows.
    *
    * Output: query_id, doc_id, lex_rk, sem_rk, rrf, rk. */
  def hybridRrfBatch(docs: DataFrame,
                     queries: Seq[(Long, Seq[String], Long)],
                     kList: Int = 50, kOut: Int = 20,
                     k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val unionTerms = queries.flatMap(_._2).distinct
    val qt = queries.flatMap { case (qid, ts, _) => ts.map(qid -> _) }
      .toDF("query_id", "term")
    val qp = queries.map { case (qid, _, p) => (qid, p) }
      .toDF("query_id", "probe_id")

    val lexAll = bm25Scores(docs, unionTerms, k1, b)
      .join(broadcast(qt), Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(sum(floor(col("score") * 1e6 + 0.5).cast("long")).as("lex_int"))
    val lexTop = graft.plans.TopK.perKey(lexAll, Seq(lexAll("query_id")),
      Seq(lexAll("lex_int").desc, lexAll("doc_id")), kList)
    val lex = lexTop.withColumn("lex_rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("lex_int").desc, col("doc_id"))))
      .select("query_id", "doc_id", "lex_rk")

    val vecs = graft.operators.TextAnalysis.hashedEmbedding(docs)
      .select(col("doc_id"), col("vec"))
    val probes = vecs.join(broadcast(qp), col("doc_id") === col("probe_id"))
      .select(col("query_id"), col("probe_id"), col("vec").as("qvec"))
    val semAll = vecs.crossJoin(broadcast(probes))
      .filter(col("doc_id") =!= col("probe_id"))
      .select(col("query_id"), col("doc_id"),
        graft.functions.VectorFunctions.dotLong(col("vec"), col("qvec")).as("dot"))
    val semTop = graft.plans.TopK.perKey(semAll, Seq(semAll("query_id")),
      Seq(semAll("dot").desc, semAll("doc_id")), kList)
    val sem = semTop.withColumn("sem_rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("dot").desc, col("doc_id"))))
      .select("query_id", "doc_id", "sem_rk")
    rrfFuse(lex, sem, kOut)
  }

  /** The per-query RRF fusion tail shared byte-for-byte by the scan
    * form ([[hybridRrfBatch]]) and the store form
    * ([[hybridRrfBatchFromStores]]) — sharing it is part of the two
    * forms' row-identity argument. */
  private def rrfFuse(lex: DataFrame, sem: DataFrame, kOut: Int): DataFrame = {
    val fused = lex.join(sem, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(60) + col("lex_rk")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("sem_rk")), lit(0.0)), 6))
    val out = graft.plans.TopK.perKey(fused, Seq(fused("query_id")),
      Seq(fused("rrf").desc, fused("doc_id")), kOut)
    out.withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id"))))
      .select(col("query_id"), col("doc_id"), col("lex_rk"), col("sem_rk"),
        col("rrf"), col("rk"))
  }

  /** [[hybridRrfBatch]] served ENTIRELY from persisted stores — the
    * serving plan a 100 TB RAG user actually runs all day, and the fix
    * for the last corpus-scan-per-batch shape in the repo (VERDICT r9:
    * y18 measured 27.6× at 100× because every batch re-tokenized AND
    * re-embedded the corpus). The lexical arm reads the y19 inverted
    * index (term-pruned postings + compact doclen — O(query-term
    * postings) rows, no text); the semantic arm reads the
    * [[ExactIvf]] vector store (cell-partition-pruned, EXACT top-k via
    * the Cauchy–Schwarz cell bound — an approximate shortlist could not
    * match the exact oracle). The RRF fusion tail is byte-identical to
    * [[hybridRrfBatch]]'s, so the two forms agree row-for-row by
    * construction: same integer lexical mass from the same stored
    * tf/dl/df, same exact BIGINT dots, same rank windows.
    *
    * Output: query_id, doc_id, lex_rk, sem_rk, rrf, rk. */
  def hybridRrfBatchFromStores(spark: org.apache.spark.sql.SparkSession,
                               indexPath: String, vecPath: String,
                               queries: Seq[(Long, Seq[String], Long)],
                               kList: Int = 50, kOut: Int = 20,
                               k1: Double = 1.2, b: Double = 0.75,
                               nprobe0: Int = 4,
                               maxBatch: Int = ExactIvf.MaxServeBatch)
      : DataFrame =
    hybridSeqResolved(spark, indexPath, vecPath, queries, kList, kOut,
      k1, b, nprobe0, maxBatch, idxDirs = None, vecDirs = None)

  /** Record the index store's current generation tuple (doclen +
    * postings + positions where present) as one consistent snapshot
    * (VERDICT r12 #4); returns the id for
    * [[hybridRrfBatchFromStoresSnapshot]]. `freeze` (default true)
    * compacts the store right after the manifest lands so the pinned
    * generations are superseded — index appends write INTO the live
    * generation, so an unfrozen pin would keep tracking ingest (the
    * [[graft.operators.ExactIvf.snapshotVecStore]] rationale). The
    * freeze compaction runs under the CALLER's retention
    * (`keepGens`/`keepAgeMs`): a hardcoded default would GC the
    * generations OLDER snapshots still pin (review r13). */
  def snapshotIndexStore(spark: org.apache.spark.sql.SparkSession,
                         path: String, freeze: Boolean = true,
                         keepGens: Int = 1,
                         keepAgeMs: Long = 0L): Long = {
    // tombs rides the manifest only when it exists (the VecDirs
    // contract: a pre-first-delete snapshot serves with no exclusions)
    val subs = Seq("doclen", "postings", "positions", "tombs")
      .map(s => s"$path/$s")
      .filter(d => graft.streaming.StoreFs.storeExists(spark, d))
    val id = graft.streaming.StoreFs.createSnapshot(spark, path, subs)
    if (freeze) compactIndexStore(spark, path, keepGens, keepAgeMs)
    id
  }

  /** [[hybridRrfBatchFromStores]] AT pinned snapshots of BOTH stores
    * (VERDICT r12 #4): the lexical arm reads the index snapshot's
    * (doclen, postings) generation pair and the semantic arm the vec
    * snapshot's (cells, vecs) pair — each tuple recorded by ONE
    * manifest and resolved all-or-nothing, so time travel across a
    * sub-table compaction can never fuse one arm's past with the
    * other's present (the torn cross-table state dataDirAt alone
    * permitted). A GC'd generation errors with the dataDirAt
    * diagnosis. */
  def hybridRrfBatchFromStoresSnapshot(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String, indexSnapshotId: Long,
      vecPath: String, vecSnapshotId: Long,
      queries: Seq[(Long, Seq[String], Long)],
      kList: Int = 50, kOut: Int = 20,
      k1: Double = 1.2, b: Double = 0.75,
      nprobe0: Int = 4): DataFrame =
    hybridSeqResolved(spark, indexPath, vecPath, queries, kList, kOut,
      k1, b, nprobe0, ExactIvf.MaxServeBatch,
      idxDirs = Some(snapshotIndexDirs(spark, indexPath, indexSnapshotId)),
      vecDirs = Some(ExactIvf.snapshotVecDirs(spark, vecPath,
        vecSnapshotId)))

  /** Resolve an index-store snapshot manifest to its [[IndexDirs]]:
    * doclen and postings are REQUIRED subs; tombs resolves only when
    * the manifest recorded it. */
  private[operators] def snapshotIndexDirs(
      spark: org.apache.spark.sql.SparkSession,
      path: String, snapshotId: Long): IndexDirs = {
    val dirs = graft.streaming.StoreFs.snapshotDataDirs(spark, path,
      snapshotId)
    def need(sub: String): String = dirs.getOrElse(s"$path/$sub",
      throw new IllegalArgumentException(
        s"snapshot $snapshotId of $path does not record $path/$sub; " +
          s"recorded: ${dirs.keys.mkString(", ")}"))
    IndexDirs(need("doclen"), need("postings"), dirs.get(s"$path/tombs"))
  }

  private def hybridSeqResolved(spark: org.apache.spark.sql.SparkSession,
                                indexPath: String, vecPath: String,
                                queries: Seq[(Long, Seq[String], Long)],
                                kList: Int, kOut: Int,
                                k1: Double, b: Double,
                                nprobe0: Int, maxBatch: Int,
                                idxDirs: Option[IndexDirs],
                                vecDirs: Option[ExactIvf.VecDirs])
      : DataFrame = {
    import spark.implicits._
    require(maxBatch >= 1, s"maxBatch must be >= 1, got $maxBatch")
    // the ExactIvf.MaxServeBatch broadcast contract (VERDICT r11 #2):
    // both arms broadcast per-query frames (the (query, term) fan-out
    // and the probe vectors), so an oversized batch chunks by query and
    // the chunk answers union — every step keys by query_id, so the
    // union is row-identical to the unchunked form by construction
    // chunk by QUERY, never positionally (a duplicated query_id must
    // land whole in one chunk — the ExactIvf rationale); an empty
    // batch serves once (empty result) — grouped() of an empty Seq
    // yields NO chunks, and reduce over none would throw
    val byQuery = queries.distinct.groupBy(_._1).toSeq
      .sortBy(_._1).map(_._2)
    val chunks = byQuery.grouped(maxBatch).toSeq match {
      case Seq() => Seq(Seq.empty[(Long, Seq[String], Long)])
      case cs    => cs.map(_.flatten)
    }
    chunks.map { qs =>
      val unionTerms = qs.flatMap(_._2).distinct
      val qt = qs.flatMap { case (qid, ts, _) => ts.map(qid -> _) }
        .toDF("query_id", "term")

      val scored = idxDirs match {
        case Some(dirs) =>
          storeScoresResolved(spark, dirs, unionTerms, k1, b)
        case None => storeScores(spark, indexPath, unionTerms, k1, b)
      }
      val lex = lexRank(scored.join(broadcast(qt), Seq("term")), kList)

      // the exact store-served dot already ranks by (dot DESC, doc_id)
      // — precisely hybridRrfBatch's sem_rk ordering
      val sem = ExactIvf.topDotSeqResolved(spark, vecPath,
          qs.map { case (qid, _, p) => (qid, p) }, kList, nprobe0,
          maxBatch, vecDirs)
        .select(col("query_id"), col("vec_id").as("doc_id"),
          col("rk").as("sem_rk"))
      rrfFuse(lex, sem, kOut)
    }.reduce(_ unionAll _)
  }

  /** The query-TABLE form of [[hybridRrfBatchFromStores]]: `queries` is
    * a DataFrame with (query_id, terms ARRAY&lt;STRING&gt;, probe_id)
    * columns — a real serving user's query table, not a driver Seq.
    * The query side enters BOTH arms as a JOIN: the lexical fan-out
    * joins the exploded (query_id, term) frame against the shared
    * term-scored postings (no hint — AQE broadcasts a small query side),
    * and the semantic arm goes through [[ExactIvf]]'s DataFrame serve.
    * Driver-side state is only what pushdown pruning genuinely needs as
    * literals: the DISTINCT term list (≤ the index vocabulary); the
    * semantic arm's cell pruning is dynamic partition pruning with no
    * driver cell state. Row-identical to the Seq form by
    * construction (same scoring and fusion tail). */
  def hybridRrfBatchFromStores(spark: org.apache.spark.sql.SparkSession,
                               indexPath: String, vecPath: String,
                               queries: DataFrame,
                               kList: Int, kOut: Int,
                               k1: Double, b: Double,
                               nprobe0: Int): DataFrame =
    hybridRrfBatchFromStores(spark, indexPath, vecPath, queries, kList,
      kOut, k1, b, nprobe0, ExactIvf.MaxServeBatch)

  /** [[hybridRrfBatchFromStores]] (query-TABLE form) with an explicit
    * serve-chunk bound. */
  def hybridRrfBatchFromStores(spark: org.apache.spark.sql.SparkSession,
                               indexPath: String, vecPath: String,
                               queries: DataFrame,
                               kList: Int, kOut: Int,
                               k1: Double, b: Double,
                               nprobe0: Int,
                               maxBatch: Int)
      : DataFrame =
    hybridTableResolved(spark, indexPath, vecPath, queries, kList, kOut,
      k1, b, nprobe0, maxBatch, None, None)

  /** [[hybridRrfBatchFromStoresSnapshot]] in the query-TABLE form — the
    * shape the `graft_hybrid_rrf_at` SQL surface drives (VERDICT
    * r13 #2). Both stores pin through their own createSnapshot
    * manifests, resolved all-or-nothing. */
  def hybridRrfBatchFromStoresSnapshot(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String, indexSnapshotId: Long,
      vecPath: String, vecSnapshotId: Long,
      queries: DataFrame, kList: Int, kOut: Int,
      k1: Double, b: Double, nprobe0: Int,
      maxBatch: Int): DataFrame =
    hybridTableResolved(spark, indexPath, vecPath, queries, kList, kOut,
      k1, b, nprobe0, maxBatch,
      Some(snapshotIndexDirs(spark, indexPath, indexSnapshotId)),
      Some(ExactIvf.snapshotVecDirs(spark, vecPath, vecSnapshotId)))

  /** PREDICATE-FILTERED hybrid retrieval (round 14): the metadata-
    * filtered RAG serving shape — `allowed` is a relation of permitted
    * `doc_id`s (derived from any attribute predicate) and BOTH arms
    * restrict their CANDIDATES to it while the corpus statistics stay
    * whole: BM25's N/avgdl/df are the full corpus's (filtered SEARCH
    * semantics — the docs still exist, the request just may not see
    * them; deletion is the other contract, [[deleteFromIndexStore]]),
    * and the semantic arm is [[ExactIvf.topDotBatchFromStoreFiltered]]'s
    * exact-over-the-subset serve. Fusion ranks are computed over the
    * filtered lists, so rrf is exactly what an allowed-only corpus of
    * the same statistics would produce. Composes with tombstones (a
    * deleted doc is excluded from stats AND candidates). */
  def hybridRrfBatchFromStoresFiltered(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String, vecPath: String,
      queries: DataFrame, allowed: DataFrame,
      kList: Int, kOut: Int,
      k1: Double = 1.2, b: Double = 0.75, nprobe0: Int = 4,
      maxBatch: Int = ExactIvf.MaxServeBatch): DataFrame =
    hybridTableResolved(spark, indexPath, vecPath, queries, kList, kOut,
      k1, b, nprobe0, maxBatch, None, None, Some(allowed))

  private def hybridTableResolved(spark: org.apache.spark.sql.SparkSession,
                                  indexPath: String, vecPath: String,
                                  queries: DataFrame,
                                  kList: Int, kOut: Int,
                                  k1: Double, b: Double,
                                  nprobe0: Int, maxBatch: Int,
                                  idxDirs: Option[IndexDirs],
                                  vecDirs: Option[ExactIvf.VecDirs],
                                  allowedIn: Option[DataFrame] = None)
      : DataFrame = {
    require(maxBatch >= 1, s"maxBatch must be >= 1, got $maxBatch")
    // broadcast-contract chunking (VERDICT r11 #2), DataFrame form: a
    // deterministic query_id hash keeps each query whole in one chunk.
    // The query table is pinned before the count + fan-out (the
    // ExactIvf rationale: a nondeterministic source must not
    // re-execute per chunk).
    val qAll = graft.core.Caches.scoped(queries.select(
      col("query_id"), col("terms"), col("probe_id")))
    // the caller's visibility predicate, normalized + pinned once for
    // every chunk; restricts CANDIDATES only (stats stay whole)
    val allowed = allowedIn.map(a => graft.core.Caches.scoped(
      a.select(col("doc_id").cast("long").as("doc_id")).distinct()))
    val n = qAll.select("query_id").distinct().count()
    val nChunks = math.max(1L, (n + maxBatch - 1) / maxBatch).toInt
    (0 until nChunks).map { i =>
      val qs =
        if (nChunks == 1) qAll
        else qAll.filter(
          pmod(hash(col("query_id")), lit(nChunks)) === i)
      val qt = graft.core.Caches.scoped(qs.select(
        col("query_id").cast("long").as("query_id"),
        explode(col("terms")).as("term")))
      val unionTerms = qt.select("term").distinct()
        .collect().map(_.getString(0)).toSeq
      val scored = idxDirs match {
        case Some(dirs) =>
          storeScoresResolved(spark, dirs, unionTerms, k1, b)
        case None => storeScores(spark, indexPath, unionTerms, k1, b)
      }
      val lexCand = scored.join(qt, Seq("term"))
      val lex = lexRank(allowed.fold(lexCand)(a =>
        lexCand.join(a, Seq("doc_id"), "left_semi")), kList)
      val semQ = qs.select(col("query_id"), col("probe_id"))
      val semAllowed = allowed.map(_.select(col("doc_id").as("vec_id")))
      val sem = (vecDirs match {
        case Some(vd) =>
          // re-resolve through the pinned tuple — same dirs every chunk
          ExactIvf.topDotTableResolvedDirs(spark, vecPath, semQ, kList,
            nprobe0, Some(vd), semAllowed)
        case None =>
          ExactIvf.topDotTableResolvedDirs(spark, vecPath, semQ, kList,
            nprobe0, None, semAllowed)
      }).select(col("query_id"), col("vec_id").as("doc_id"),
          col("rk").as("sem_rk"))
      rrfFuse(lex, sem, kOut)
    }.reduce(_ unionAll _)
  }

  /** Shared lexical tail of the two store-served hybrid forms: integer
    * per-(query, doc) mass → two-phase top-kList → rank window. */
  private def lexRank(scoredByQuery: DataFrame, kList: Int): DataFrame = {
    val lexAll = scoredByQuery
      .groupBy("query_id", "doc_id")
      .agg(sum(floor(col("score") * 1e6 + 0.5).cast("long")).as("lex_int"))
    val lexTop = graft.plans.TopK.perKey(lexAll, Seq(lexAll("query_id")),
      Seq(lexAll("lex_int").desc, lexAll("doc_id")), kList)
    lexTop.withColumn("lex_rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("lex_int").desc, col("doc_id"))))
      .select("query_id", "doc_id", "lex_rk")
  }

  /** Overlapping fixed-size token chunks — the RAG/embedding ingestion
    * splitter: chunk i covers tokens [i·stride, i·stride + chunkSize) of
    * the normalized word stream; the chunk count is 1 for docs at or
    * under one chunk, else 1 + ⌈(n − chunkSize)/stride⌉, so the final
    * chunk always reaches the last token and interior chunks overlap by
    * chunkSize − stride tokens.
    *
    * Scale shape: a pure per-row column program — sequence + transform +
    * posexplode, ZERO shuffles (PlanShapeSpec pins no exchange). This is
    * the op that runs over all 100 TB before embedding; everything is
    * integer arithmetic plus md5, both engines bit-identical.
    * Output: doc_id, chunk_id, start_tok, n_toks, chunk_hash. */
  def chunkDocs(docs: DataFrame, chunkSize: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkSize >= stride,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val n = col("n")
    val nChunks = when(n <= chunkSize, lit(1L))
      .otherwise(floor((n - chunkSize + (stride - 1)) / lit(stride.toDouble)) + 1L)
    docs
      .select(col("doc_id"), words(normText(col("text"))).as("ws"))
      .withColumn("n", size(col("ws")).cast("long"))
      .withColumn("nch", nChunks)
      .select(col("doc_id"), col("ws"), n,
        posexplode(transform(sequence(lit(0L), col("nch") - 1),
          i => i * stride)))
      .select(col("doc_id"), col("pos").cast("int").as("chunk_id"),
        col("col").as("start_tok"), col("ws"), n)
      .withColumn("n_toks", least(lit(chunkSize.toLong), n - col("start_tok")))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"), col("n_toks"),
        md5(array_join(slice(col("ws"), (col("start_tok") + 1).cast("int"),
          col("n_toks").cast("int")), " ")).as("chunk_hash"))
  }

  /** Term-pruned POSITIONAL postings: (doc_id, term, pos) with pos the
    * 0-based token offset in the normalized word stream — the index a
    * phrase query intersects. One tokenize pass; only rows for `terms`
    * survive, so downstream joins never see the corpus vocabulary. */
  def positionalPostings(docs: DataFrame, terms: Seq[String]): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(words(normText(col("text")))).as(Seq("pos", "term")))
      .filter(col("term").isInCollection(terms))
      .select(col("doc_id"), col("term"), col("pos").cast("long").as("pos"))

  /** Persist the positional index: `positions/` = (term, doc_id, pos)
    * range-partitioned and sorted by term, the same row-group-pruned
    * layout as [[writeIndexStore]]'s postings (~1 row per token
    * occurrence vs the BM25 store's 1 per (term, doc) — positions are
    * what phrase/proximity queries pay for). The append/compact
    * lifecycle of the other stores applies unchanged. */
  def writePositionalStore(docs: DataFrame, path: String): Unit = {
    docs
      .select(col("doc_id"),
        posexplode(words(normText(col("text")))).as(Seq("pos", "term")))
      .select(col("term"), col("doc_id"), col("pos").cast("long").as("pos"))
      .repartitionByRange(col("term"))
      .sortWithinPartitions("term", "doc_id", "pos")
      .write.mode("overwrite").parquet(s"$path/positions")
    // after the data — the overwrite would delete an earlier manifest
    // (the writeIndexStore rationale)
    graft.streaming.StoreFs.writeGeometry(docs.sparkSession,
      s"$path/positions", Seq(
        "family" -> "positional", "layout" -> "term_sorted",
        "key_columns" -> "term,doc_id,pos"))
  }

  /** Shared phrase-match tail over a positional-postings frame: for each
    * phrase t₀…tₙ₋₁, occurrence starts are the classical positional
    * intersect — t₀'s postings equi-joined with each tᵢ's postings
    * shifted by −i on (doc_id, pos). Every join is keyed and touches
    * only the PHRASE terms' postings (term-pruned source), so candidate
    * volume is Σᵢ df(tᵢ) rows — never the corpus; per-doc totals come
    * from one partial→final count and the per-phrase top-k from the
    * two-phase TopKPerKey (hot phrases cap at k per partition).
    * Output: phrase, doc_id, n_occ, first_pos, rk. */
  def phraseMatchTail(pos: DataFrame, phrases: Seq[Seq[String]],
                      k: Int): DataFrame = {
    require(phrases.nonEmpty && phrases.forall(_.nonEmpty))
    val perPhrase = phrases.map { terms =>
      var m = pos.filter(col("term") === terms.head)
        .select(col("doc_id"), col("pos"))
      for ((t, i) <- terms.zipWithIndex.drop(1)) {
        val pi = pos.filter(col("term") === t)
          .select(col("doc_id"), (col("pos") - i).as("pos"))
        m = m.join(pi, Seq("doc_id", "pos"))
      }
      m.groupBy("doc_id")
        .agg(count(lit(1)).as("n_occ"), min(col("pos")).as("first_pos"))
        .select(lit(terms.mkString(" ")).as("phrase"), col("doc_id"),
          col("n_occ"), col("first_pos"))
    }
    val all = perPhrase.reduce(_.unionAll(_))
    val topk = graft.plans.TopK.perKey(all, Seq(all("phrase")),
      Seq(all("n_occ").desc, all("doc_id")), k)
    val w = Window.partitionBy("phrase")
      .orderBy(col("n_occ").desc, col("doc_id"))
    topk.withColumn("rk", row_number().over(w))
      .select(col("phrase"), col("doc_id"), col("n_occ"), col("first_pos"),
        col("rk"))
  }

  /** Exact phrase search over the corpus (scan path): tokenize once,
    * prune to the union of all phrases' terms, intersect positions.
    * Output: phrase, doc_id, n_occ, first_pos, rk — top `k` docs per
    * phrase by occurrence count. */
  def phraseSearch(docs: DataFrame, phrases: Seq[Seq[String]],
                   k: Int): DataFrame = {
    val pos = graft.core.Caches.scoped(
      positionalPostings(docs, phrases.flatten.distinct))
    phraseMatchTail(pos, phrases, k)
  }

  /** [[phraseSearch]] served ENTIRELY from the positional store — the
    * plan never touches document text: the term IN-filter prunes the
    * positions table to the phrases' row groups. Byte-identical to the
    * scan path by construction (same tail). */
  def phraseSearchFromStore(spark: org.apache.spark.sql.SparkSession,
                            path: String, phrases: Seq[Seq[String]],
                            k: Int): DataFrame = {
    graft.streaming.StoreFs.requireFamily(spark, s"$path/positions",
      "positional", "phrase serve")
    val pos0 = spark.read.parquet(graft.streaming.StoreFs.dataDir(spark, s"$path/positions"))
      .filter(col("term").isInCollection(phrases.flatten.distinct))
    // the root's tombstones gate the positional serve too: a deleted
    // doc loses its phrase hits; other docs' counts are untouched (the
    // intersect is per-doc, so the anti-join is exact, not a re-rank)
    val pos = tombsOf(spark,
      graft.streaming.StoreFs.liveTombsDir(spark, path))
      .fold(pos0)(t => pos0.join(t, Seq("doc_id"), "left_anti"))
    phraseMatchTail(pos, phrases, k)
  }

  /** Subword-hashed TOKEN embedding — the model-free analogue of a
    * learned token vector (fastText's subword trick on a feature-hash
    * basis): a token's vector is the ±1 md5-hash sum of its character
    * trigrams (whole token if shorter) into `dim` buckets, so
    * morphological variants ("stream"/"streaming") share most
    * components. All integers. Output: token, tv array<long>. */
  def tokenVectors(tokens: DataFrame, dim: Int): DataFrame = {
    val feats = tokens.select(col("token"),
        explode(transform(
          sequence(lit(1), greatest(length(col("token")) - 2, lit(1))),
          j => col("token").substr(j, lit(3)))).as("g"))
    val signed = feats.select(col("token"),
      (conv(substring(md5(col("g")), 1, 3), 16, 10).cast("long") % dim).as("b"),
      when(conv(substring(md5(col("g")), 4, 1), 16, 10).cast("long") >= 8L, 1L)
        .otherwise(-1L).as("s"))
    signed.groupBy("token", "b").agg(sum("s").as("v"))
      .groupBy("token")
      .agg(map_from_entries(collect_list(struct(col("b"), col("v")))).as("m"))
      .select(col("token"),
        transform(sequence(lit(0), lit(dim - 1)),
          j => coalesce(element_at(col("m"), j.cast("long")), lit(0L))).as("tv"))
  }

  /** Late-interaction (MaxSim) retrieval — the ColBERT scoring shape
    * with no model: score(doc) = Σ_q max over the doc's tokens of the
    * integer dot between the query term's and the token's subword
    * vectors, so a query for "streaming" ranks docs containing
    * "stream" high without an exact match.
    *
    * Scale shape: token vectors are built once per DISTINCT token (the
    * x02 dictionary trick — the vocabulary is the small side by
    * construction) and dotted against the broadcast |terms| query
    * vectors (|vocab|·m integer dots, linear); the corpus-side cost is
    * the distinct (doc, token) table joined to that (token, term, dot)
    * dictionary — m× token volume with map-side max partial agg keyed
    * (doc, term), then an m-row-per-doc sum. Everything integer; ranks
    * break ties by doc_id. Output: doc_id, score, rk. */
  def maxSimTopK(docs: DataFrame, terms: Seq[String], k: Int,
                 dim: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val docToks = docs
      .select(col("doc_id"), explode(words(normText(col("text")))).as("token"))
      .distinct()
    val vocabVecs = tokenVectors(docToks.select("token").distinct(), dim)
    val qVecs = tokenVectors(terms.toDF("token"), dim)
      .toDF("q_term", "qv")
    val dots = vocabVecs.crossJoin(broadcast(qVecs))
      .select(col("token"), col("q_term"),
        graft.functions.VectorFunctions.dotLong(col("qv"), col("tv")).as("dot"))
    val perTerm = docToks.join(dots, Seq("token"))
      .groupBy("doc_id", "q_term")
      .agg(max(col("dot")).as("max_dot"))
    val scored = perTerm.groupBy("doc_id")
      .agg(sum(col("max_dot")).as("score"))
    // global cut by distributed TakeOrdered (the hybridRrf discipline);
    // the rank window then runs over ≤ k rows
    val topk = scored.orderBy(col("score").desc, col("doc_id")).limit(k)
    val w = Window.partitionBy(lit(1))
      .orderBy(col("score").desc, col("doc_id"))
    topk.withColumn("rk", row_number().over(w))
      .select(col("doc_id"), col("score"), col("rk"))
  }

  /** COMPACT a (batch- or stream-grown) index store: per-batch appends
    * leave one small file set per generation and lose the global term
    * sort; compaction deduplicates by natural key within each sealed
    * generation (tags at or below the multi-table seal collapse to the
    * −1 sentinel; a torn frontier batch's tags are PRESERVED so its
    * replay heals — ADVICE r10), re-range-partitions and re-sorts each
    * table by term so row-group pruning is restored across what used
    * to be generation boundaries, and swaps the new generation in
    * ATOMICALLY (`StoreFs.swapInCompacted` — a crash never leaves an
    * empty store). Serving answers are provably unchanged
    * (spec-pinned). */
  def compactIndexStore(spark: org.apache.spark.sql.SparkSession,
                        path: String, keepGens: Int = 1,
                        keepAgeMs: Long = 0L): Unit = {
    val subs = Seq("doclen", "postings", "positions")
    // torn-append replay safety for a MULTI-TABLE store (ADVICE r10,
    // medium): the seal is computed ONCE for the whole store, BEFORE
    // any sub compacts, and covers only batch ids fully landed in ALL
    // three tables (min across subs of each sub's max tag). A torn
    // frontier batch — doclen landed, crash before postings/positions —
    // stays ABOVE the seal: its tags are preserved through the fold
    // below, so the restart's replay anti-join heals each table
    // independently instead of hitting the seal and silently losing
    // the unlanded rows. Markers live at the store ROOT, where
    // IndexIngest's fast path looks (root markers also naturally
    // survive the sub-dir swaps).
    val sealId = graft.streaming.StoreFs
      .sealTagMarkersMulti(spark, path, subs.map(s => s"$path/$s"))
      .getOrElse(-1L)
    // PURGE (round 14): tombstoned docs drop from every sub's rewrite
    // and exactly the applied tombstones are cleared after — the
    // compactVecStore crash-order argument applies unchanged (purged
    // subs + uncleared tombstones just re-exclude already-absent docs;
    // a crash between SUB swaps leaves some subs purged and some not,
    // which the still-standing tombstones make invisible to serves)
    val applied = graft.streaming.StoreFs.liveTombsDir(spark, path)
      .map(d => graft.core.Caches.scoped(
        graft.streaming.StoreFs.readTombstones(spark, d, "doc_id")))
    def compact(sub: String, keys: Seq[String], sortCols: Seq[String]): Unit = {
      val dir = s"$path/$sub"
      if (!graft.streaming.StoreFs.storeExists(spark, dir)) return
      // mergeSchema: the dir can mix a tagless base generation with
      // tagged appended files (the IndexIngest ADVICE-r8 lesson)
      val src = spark.read.option("mergeSchema", "true")
        .parquet(graft.streaming.StoreFs.dataDir(spark, dir))
      val tagged0 =
        if (src.columns.contains("batch_id")) src
        else src.withColumn("batch_id", lit(-1L))
      // fold ONLY the tags the seal covers into the −1 sentinel (a
      // literal column, so the store schema stays UNIFORM across
      // compacted + appended files — ADVICE r8); frontier tags above
      // the seal ride through untouched for the replay anti-join.
      // Rows sharing (natural key, generation) are content-identical
      // by the ingest contract, so the dedup is deterministic.
      val merged0 = tagged0
        .withColumn("batch_id",
          when(coalesce(col("batch_id"), lit(-1L)) <= sealId, lit(-1L))
            .otherwise(col("batch_id")))
        .dropDuplicates(keys :+ "batch_id")
      val merged = applied.fold(merged0)(t =>
        merged0.join(t, Seq("doc_id"), "left_anti"))
      graft.streaming.StoreFs.swapInCompacted(spark, dir,
          keepGens = keepGens, keepAgeMs = keepAgeMs) { tmp =>
        (if (sortCols.nonEmpty)
           merged.repartitionByRange(col(sortCols.head))
             .sortWithinPartitions(sortCols.map(col): _*)
         else merged)
          .write.parquet(tmp)
      }
    }
    compact("doclen", Seq("doc_id"), Seq.empty)
    compact("postings", Seq("term", "doc_id"), Seq("term", "doc_id"))
    compact("positions", Seq("term", "doc_id", "pos"),
      Seq("term", "doc_id", "pos"))
    applied.foreach { t =>
      // caller's retention on the tombs swap too (ADVICE r14, low —
      // the compactVecStore rationale)
      val tombsSub = s"$path/tombs"
      graft.streaming.StoreFs.swapInCompacted(spark, tombsSub,
          keepGens = keepGens, keepAgeMs = keepAgeMs) { tmp =>
        spark.read.schema("doc_id LONG, batch_id LONG")
          .parquet(graft.streaming.StoreFs.dataDir(spark, tombsSub))
          .join(t, Seq("doc_id"), "left_anti")
          .write.parquet(tmp)
      }
      spark.catalog.refreshByPath(tombsSub)
    }
  }

  /** [[phraseSearch]] with COST-BASED intersect ordering — the skew
    * lever the phrase family's SCALE row names: a stop-word-grade term
    * in a phrase makes the seed side df(t₀)-sized, so the chain is
    * reordered to start from the RAREST term (ascending df, original
    * index as the tie-break) and every later join is bounded by the
    * rare side. The df probe is one bounded aggregation (|terms| rows,
    * the sanctioned bounded collect); positions are normalized to the
    * phrase START (pos − term index) regardless of seed, so the result
    * is EXACTLY [[phraseSearch]]'s (intersection is commutative) —
    * spec-pinned. */
  def phraseSearchRarestFirst(docs: DataFrame, phrases: Seq[Seq[String]],
                              k: Int): DataFrame = {
    val pos = graft.core.Caches.scoped(
      positionalPostings(docs, phrases.flatten.distinct))
    val dfMap = pos.groupBy("term").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      .withDefaultValue(0L)
    val perPhrase = phrases.map { terms =>
      val ordered = terms.zipWithIndex
        .sortBy { case (t, i) => (dfMap(t), i) }
      val (t0, i0) = ordered.head
      var m = pos.filter(col("term") === t0)
        .select(col("doc_id"), (col("pos") - i0).as("pos"))
      for ((t, i) <- ordered.tail) {
        val pi = pos.filter(col("term") === t)
          .select(col("doc_id"), (col("pos") - i).as("pos"))
        m = m.join(pi, Seq("doc_id", "pos"))
      }
      m.groupBy("doc_id")
        .agg(count(lit(1)).as("n_occ"), min(col("pos")).as("first_pos"))
        .select(lit(terms.mkString(" ")).as("phrase"), col("doc_id"),
          col("n_occ"), col("first_pos"))
    }
    val all = perPhrase.reduce(_.unionAll(_))
    val topk = graft.plans.TopK.perKey(all, Seq(all("phrase")),
      Seq(all("n_occ").desc, all("doc_id")), k)
    val w = Window.partitionBy("phrase")
      .orderBy(col("n_occ").desc, col("doc_id"))
    topk.withColumn("rk", row_number().over(w))
      .select(col("phrase"), col("doc_id"), col("n_occ"), col("first_pos"),
        col("rk"))
  }

  /** Keyword-in-context SNIPPETS for the top phrase hits: the ≤
    * k·|phrases| hit rows broadcast back into ONE documents scan, and
    * the snippet is the token window [first_pos − context,
    * first_pos + |phrase| + context) re-joined with spaces — a pure
    * column program after the bounded join; no per-hit corpus work.
    * Output: phrase, doc_id, rk, snippet. */
  def phraseSnippets(docs: DataFrame, phrases: Seq[Seq[String]], k: Int,
                     context: Int): DataFrame = {
    val phraseLen = typedLit(phrases.map(p => p.mkString(" ") -> p.length).toMap)
    val hits = phraseSearch(docs, phrases, k)
      .select(col("phrase"), col("doc_id"), col("rk"), col("first_pos"))
    docs.select(col("doc_id"), words(normText(col("text"))).as("ws"))
      .join(broadcast(hits), Seq("doc_id"))
      .withColumn("from1",
        greatest(col("first_pos") - context, lit(0L)) + 1)
      .withColumn("until1",
        col("first_pos") + element_at(phraseLen, col("phrase")) + context)
      .select(col("phrase"), col("doc_id"), col("rk"),
        array_join(slice(col("ws"), col("from1").cast("int"),
          (col("until1") - col("from1") + 1).cast("int")), " ").as("snippet"))
  }

  /** Proximity (NEAR/w) search: for each (term_a, term_b) pair, per-doc
    * count of position pairs with |pos_a − pos_b| ≤ `window` — the
    * unordered co-occurrence relaxation of [[phraseSearch]].
    *
    * Scale shape: the naive form equi-joins the two terms' postings on
    * doc_id alone and post-filters the range — df_doc(a)·df_doc(b)
    * candidate pairs per doc, quadratic for boilerplate terms in long
    * docs. Here the y16 interval-banding trick bounds it: side b keeps
    * its coarse band ⌊pos/w⌋, side a explodes to its ≤3 reachable bands
    * (⌊pos/w⌋−1 … +1), and the join runs on (doc_id, band) — every
    * qualifying pair lands in EXACTLY one joined row (b's band is
    * unique and a probes each band once), so no dedup shuffle, and
    * candidate volume is Σ_band df_band(a)·df_band(b) — window-local,
    * never df×df. Per-pair top-k docs via TopKPerKey.
    * Output: term_a, term_b, doc_id, n_pairs, rk. */
  def proximitySearch(docs: DataFrame, pairs: Seq[(String, String)],
                      window: Int, k: Int): DataFrame = {
    require(window >= 1)
    val pos = graft.core.Caches.scoped(positionalPostings(docs,
      pairs.flatMap(p => Seq(p._1, p._2)).distinct))
    val perPair = pairs.map { case (ta, tb) =>
      val a = pos.filter(col("term") === ta)
        .select(col("doc_id"), col("pos").as("pos_a"),
          explode(sequence(floor(col("pos") / window) - 1,
            floor(col("pos") / window) + 1)).as("band"))
      val b = pos.filter(col("term") === tb)
        .select(col("doc_id"), col("pos").as("pos_b"),
          floor(col("pos") / window).as("band"))
      a.join(b, Seq("doc_id", "band"))
        .filter(abs(col("pos_a") - col("pos_b")) <= window &&
          col("pos_a") =!= col("pos_b"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_pairs"))
        .select(lit(ta).as("term_a"), lit(tb).as("term_b"), col("doc_id"),
          col("n_pairs"))
    }
    val all = perPair.reduce(_.unionAll(_))
    val topk = graft.plans.TopK.perKey(all,
      Seq(all("term_a"), all("term_b")),
      Seq(all("n_pairs").desc, all("doc_id")), k)
    val w = Window.partitionBy("term_a", "term_b")
      .orderBy(col("n_pairs").desc, col("doc_id"))
    topk.withColumn("rk", row_number().over(w))
      .select(col("term_a"), col("term_b"), col("doc_id"), col("n_pairs"),
        col("rk"))
  }
}
