package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** Deletion propagation (round 14): tombstones written by
  * `deleteFromVecStore` / `deleteFromIndexStore` must make every store
  * serve behave EXACTLY as if the deleted rows were never ingested —
  * BM25's df/N/avgdl shift, the exact-IVF phase-1 d_k is computed over
  * visible rows only — until a compaction purges the rows physically,
  * re-tightens the vec-store bounds, and clears the applied tombstones.
  * The filtered-serve rows pin the same visibility machinery under the
  * caller's `allowed` predicate. */
class DeletionSpec extends AnyFunSuite with SparkTest
    with org.scalatest.BeforeAndAfterEach {

  // sweep the serve-scoped caches between tests (the ReclusterSpec
  // rationale: 16 store-serving tests otherwise pin frames for the
  // whole shared-JVM suite run)
  override def afterEach(): Unit = {
    graft.core.Caches.releaseAll()
    spark.catalog.clearCache()
  }

  private val Dim = 8

  // the ExactIvfSpec fixture: ids 0..9 byte-identical (one hot cell of
  // exact ties), the rest spread out
  private def vecFixture(n: Int) = {
    import spark.implicits._
    (0L until n).map { i =>
      val v = (0 until Dim).map { j =>
        if (i < 10) (j + 1).toLong * 100L
        else ((i * 31 + j * 17) % 201) - 100L
      }.toArray
      (i, v)
    }.toDF("doc_id", "vec")
  }

  private def docsFixture(n: Int) = {
    import spark.implicits._
    val vocab = Vector("spark", "window", "stream", "vector", "customer",
      "join", "filter", "agg")
    (0L until n).map { i =>
      val ws = (0 until 12).map(j => vocab(((i * 7 + j * 3) % vocab.size).toInt))
      (i, ws.mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def brute(vecs: org.apache.spark.sql.DataFrame,
                    queries: Seq[(Long, Long)], k: Int,
                    probeSrc: Option[org.apache.spark.sql.DataFrame] = None)
      : Seq[String] = {
    import spark.implicits._
    val qp = queries.toDF("query_id", "probe_id")
    val probes = probeSrc.getOrElse(vecs)
      .join(qp, col("doc_id") === col("probe_id"))
      .select(col("query_id"), col("probe_id"), col("vec").as("qvec"))
    vecs.crossJoin(broadcast(probes))
      .filter(col("doc_id") =!= col("probe_id"))
      .select(col("query_id"), col("doc_id"),
        graft.functions.VectorFunctions.dotLong(col("vec"), col("qvec"))
          .as("dot"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("dot").desc, col("doc_id"))))
      .filter(col("rk") <= k)
      .select("query_id", "doc_id", "dot", "rk")
      .collect().map(_.toString).sorted.toSeq
  }

  private def served(path: String, queries: Seq[(Long, Long)], k: Int,
                     nprobe0: Int = 2): Seq[String] =
    ExactIvf.topDotBatchFromStore(spark, path, queries, k, nprobe0)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("dot"),
        col("rk"))
      .collect().map(_.toString).sorted.toSeq

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val Queries = Seq((1L, 3L), (2L, 137L), (3L, 250L))

  test("vec serve after delete == brute force over the remaining rows (ties included)") {
    val vecs = vecFixture(300)
    val path = tmp("graft-del-vec-")
    ExactIvf.writeVecStore(vecs, path, nCells = 8, iters = 1)
    // delete a slice that includes hot-cell ties (1, 6) and spread ids;
    // probes 3/137/250 stay alive
    val deleted = vecs.filter(col("doc_id") % 5 === 1).select("doc_id")
    ExactIvf.deleteFromVecStore(spark, deleted, path, idCol = "doc_id")
    val remaining = vecs.filter(col("doc_id") % 5 =!= 1)
    assert(served(path, Queries, k = 20) == brute(remaining, Queries, 20))
  }

  test("a deleted probe id errors like an absent one") {
    val vecs = vecFixture(100)
    val path = tmp("graft-del-probe-")
    ExactIvf.writeVecStore(vecs, path, nCells = 4, iters = 1)
    import spark.implicits._
    ExactIvf.deleteFromVecStore(spark, Seq(42L).toDF("vec_id"), path)
    val e = intercept[IllegalArgumentException] {
      served(path, Seq((1L, 42L)), k = 5)
    }
    assert(e.getMessage.contains("deleted"))
  }

  test("purge: compaction drops the rows physically, re-tightens r2max, clears applied tombstones, answers unchanged") {
    val vecs = vecFixture(300)
    val path = tmp("graft-del-purge-")
    ExactIvf.writeVecStore(vecs, path, nCells = 8, iters = 1)
    val deleted = vecs.filter(col("doc_id") % 5 === 1).select("doc_id")
    ExactIvf.deleteFromVecStore(spark, deleted, path, idCol = "doc_id")
    val before = served(path, Queries, k = 20)
    val r2Before = spark.read.parquet(
        graft.streaming.StoreFs.dataDir(spark, s"$path/cells"))
      .agg(sum("r2max")).head.getLong(0)
    ExactIvf.compactVecStore(spark, path)
    // answers identical (the serve was already excluding via tombstones)
    assert(served(path, Queries, k = 20) == before)
    // rows physically gone
    val live = spark.read.option("mergeSchema", "true").parquet(
      graft.streaming.StoreFs.dataDir(spark, s"$path/vecs"))
    assert(live.filter(col("vec_id") % 5 === 1).count() == 0)
    // bounds re-tightened (deletion can only shrink a cell's radius)
    val r2After = spark.read.parquet(
        graft.streaming.StoreFs.dataDir(spark, s"$path/cells"))
      .agg(sum("r2max")).head.getLong(0)
    assert(r2After <= r2Before)
    // applied tombstones cleared
    val tombs = graft.streaming.StoreFs.liveTombsDir(spark, path)
      .map(d => graft.streaming.StoreFs.readTombstones(spark, d, "vec_id")
        .count()).getOrElse(0L)
    assert(tombs == 0L)
  }

  test("delete wins until purge: a re-appended tombstoned id stays excluded; after purge a re-append revives it") {
    import spark.implicits._
    val vecs = vecFixture(100)
    val path = tmp("graft-del-reappend-")
    ExactIvf.writeVecStore(vecs, path, nCells = 4, iters = 1)
    val qs = Seq((1L, 3L), (2L, 77L))
    val victim = vecs.filter(col("doc_id") === 55L)
    ExactIvf.deleteFromVecStore(spark, Seq(55L).toDF("vec_id"), path)
    // re-append while the row is still physically present: dropped by
    // the append anti-join, tombstone keeps excluding
    ExactIvf.appendToVecStore(spark, victim, path)
    val remaining = vecs.filter(col("doc_id") =!= 55L)
    assert(served(path, qs, k = 10) == brute(remaining, qs, 10))
    // purge, then re-append: revived
    ExactIvf.compactVecStore(spark, path)
    ExactIvf.appendToVecStore(spark, victim, path)
    assert(served(path, qs, k = 10) == brute(vecs, qs, 10))
  }

  test("filtered serve == brute force over the allowed subset; composes with tombstones") {
    import spark.implicits._
    val vecs = vecFixture(300)
    val path = tmp("graft-del-filter-")
    ExactIvf.writeVecStore(vecs, path, nCells = 8, iters = 1)
    val q = Queries.toDF("query_id", "probe_id")
    val allowed = vecs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").as("vec_id"))
    def filteredServe(): Seq[String] =
      ExactIvf.topDotBatchFromStoreFiltered(spark, path, q, allowed,
          k = 15, nprobe0 = 2)
        .select(col("query_id"), col("vec_id").as("doc_id"), col("dot"),
          col("rk"))
        .collect().map(_.toString).sorted.toSeq
    // probe 137 (137 % 3 = 2) is NOT in the allowed set — the probe
    // gate and the candidate filter are different contracts, so the
    // serve must still answer it; probes come from the full store
    assert(filteredServe() ==
      brute(vecs.filter(col("doc_id") % 3 === 0), Queries, 15,
        probeSrc = Some(vecs)))
    // now tombstone part of the allowed subset: both joins apply
    ExactIvf.deleteFromVecStore(spark,
      Seq(30L, 60L, 90L).toDF("vec_id"), path)
    val visible = vecs.filter(col("doc_id") % 3 === 0)
      .filter(!col("doc_id").isInCollection(Seq(30L, 60L, 90L)))
    assert(filteredServe() == brute(visible, Queries, 15,
      probeSrc = Some(vecs)))
  }

  test("snapshot taken BEFORE a delete keeps serving the undeleted corpus; the live serve excludes") {
    import spark.implicits._
    val vecs = vecFixture(200)
    val path = tmp("graft-del-snap-")
    ExactIvf.writeVecStore(vecs, path, nCells = 4, iters = 1)
    val snap = ExactIvf.snapshotVecStore(spark, path, keepGens = 3)
    ExactIvf.deleteFromVecStore(spark, Seq(3L, 7L, 150L).toDF("vec_id"),
      path)
    val qs = Seq((1L, 42L), (2L, 137L))
    def snapServe(): Seq[String] =
      ExactIvf.topDotBatchFromStoreSnapshot(spark, path, snap, qs, 10)
        .select(col("query_id"), col("vec_id").as("doc_id"), col("dot"),
          col("rk"))
        .collect().map(_.toString).sorted.toSeq
    assert(snapServe() == brute(vecs, qs, 10))
    assert(served(path, qs, k = 10) ==
      brute(vecs.filter(!col("doc_id").isInCollection(Seq(3L, 7L, 150L))),
        qs, 10))
    // a snapshot taken AFTER the delete pins the tombstones too: it
    // keeps excluding even after a purge clears the live tombstones
    val snap2 = ExactIvf.snapshotVecStore(spark, path, freeze = false)
    ExactIvf.compactVecStore(spark, path, keepGens = 5)
    val post = ExactIvf.topDotBatchFromStoreSnapshot(spark, path, snap2,
        qs, 10)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("dot"),
        col("rk"))
      .collect().map(_.toString).sorted.toSeq
    assert(post ==
      brute(vecs.filter(!col("doc_id").isInCollection(Seq(3L, 7L, 150L))),
        qs, 10))
  }

  test("BM25 store serve after delete == scan-path BM25 over the corpus minus deleted (df/N/avgdl shift exactly)") {
    val docs = docsFixture(80)
    val path = tmp("graft-del-idx-")
    Retrieval.writeIndexStore(docs, path)
    val deleted = docs.filter(col("doc_id") % 4 === 2).select("doc_id")
    Retrieval.deleteFromIndexStore(spark, deleted, path)
    val terms = Seq("spark", "vector", "join")
    val expected = Retrieval.bm25TopK(
        docs.filter(col("doc_id") % 4 =!= 2), terms, k = 10)
      .collect().map(_.toString).sorted.toSeq
    val got = Retrieval.bm25TopKFromStore(spark, path, terms, k = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(got == expected)
    // purge parity: physical rewrite changes nothing the serve can see
    Retrieval.compactIndexStore(spark, path)
    val afterPurge = Retrieval.bm25TopKFromStore(spark, path, terms, k = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(afterPurge == expected)
    assert(spark.read.option("mergeSchema", "true").parquet(
        graft.streaming.StoreFs.dataDir(spark, s"$path/doclen"))
      .filter(col("doc_id") % 4 === 2).count() == 0)
    val tombs = graft.streaming.StoreFs.liveTombsDir(spark, path)
      .map(d => graft.streaming.StoreFs.readTombstones(spark, d, "doc_id")
        .count()).getOrElse(0L)
    assert(tombs == 0L)
  }

  test("positional store: phrase serve drops deleted docs' hits, leaves others untouched") {
    val docs = docsFixture(60)
    val path = tmp("graft-del-pos-")
    Retrieval.writePositionalStore(docs, path)
    val deleted = docs.filter(col("doc_id") % 3 === 1).select("doc_id")
    Retrieval.deleteFromIndexStore(spark, deleted, path)
    val phrases = Seq(Seq("spark", "customer"), Seq("vector", "join"))
    val expected = Retrieval.phraseSearch(
        docs.filter(col("doc_id") % 3 =!= 1), phrases, k = 8)
      .collect().map(_.toString).sorted.toSeq
    val got = Retrieval.phraseSearchFromStore(spark, path, phrases, k = 8)
      .collect().map(_.toString).sorted.toSeq
    assert(got == expected)
  }

  test("hybrid store serve with deletes in BOTH stores == scan-path hybrid over the corpus minus deleted") {
    val docs = docsFixture(120)
    val root = tmp("graft-del-hybrid-")
    Retrieval.writeIndexStore(docs, s"$root/idx")
    ExactIvf.writeVecStore(
      graft.operators.TextAnalysis.hashedEmbedding(docs)
        .select("doc_id", "vec"),
      s"$root/vec", nCells = 8, iters = 1)
    val deleted = docs.filter(col("doc_id") % 6 === 5).select("doc_id")
    Retrieval.deleteFromIndexStore(spark, deleted, s"$root/idx")
    ExactIvf.deleteFromVecStore(spark, deleted, s"$root/vec",
      idCol = "doc_id")
    val queries = Seq((1L, Seq("spark", "window"), 42L),
      (2L, Seq("customer", "vector"), 84L))
    val expected = Retrieval.hybridRrfBatch(
        docs.filter(col("doc_id") % 6 =!= 5), queries,
        kList = 20, kOut = 10)
      .collect().map(_.toString).sorted.toSeq
    val got = Retrieval.hybridRrfBatchFromStores(spark, s"$root/idx",
        s"$root/vec", queries, kList = 20, kOut = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(got == expected)
  }

  test("IVFADC: tombstoned ids leave the shortlist; purge is serve-identical; a pre-delete snapshot still returns them") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val path = tmp("graft-del-ivfadc-")
    val (m, dim) = (8, 64)
    Pq.writeIvfadcStore(emb, path, nCells = 4, m = m, dim = dim,
      nCents = 8, iters = 1)
    val probes = emb.select("vec_id").orderBy("vec_id").limit(2)
      .collect().map(_.getLong(0)).toSeq
    def serve(): Seq[org.apache.spark.sql.Row] =
      Pq.ivfadcTopKFromStore(spark, path, emb, probes, nprobe = 2,
          kShort = 30, k = 10, m = m, dim = dim)
        .collect().sortBy(_.toString).toSeq
    val before = serve()
    val snap = Pq.snapshotIvfadcStore(spark, path, freeze = false,
      keepGens = 3)
    // delete ids that ARE current neighbors — the serve must change
    val victims = before.map(_.getAs[Long]("neighbor_id")).distinct.take(3)
    import spark.implicits._
    Pq.deleteFromCodesStore(spark, victims.toDF("vec_id"), path)
    val after = serve()
    assert(after != before)
    assert(!after.exists(r => victims.contains(r.getAs[Long]("neighbor_id"))))
    // purge parity: physical removal serves identically to the anti-join
    Pq.compactCodesStore(spark, path, keepGens = 3)
    assert(serve() == after)
    assert(graft.streaming.StoreFs.liveTombsDir(spark, path)
      .map(d => graft.streaming.StoreFs.readTombstones(spark, d, "vec_id")
        .count()).getOrElse(0L) == 0L)
    // the pre-delete snapshot still answers with the victims present
    val pinned = Pq.ivfadcTopKFromStoreSnapshot(spark, path, snap, emb,
        probes.toDF("probe_id"), nprobe = 2, kShort = 30, k = 10,
        m = m, dim = dim)
      .collect().sortBy(_.toString).toSeq
    assert(pinned == before)
  }

  test("flat PQ: tombstoned ids never enter the ADC sums") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val path = tmp("graft-del-pq-")
    val (m, dim) = (8, 64)
    Pq.writePqStore(emb, path, m = m, dim = dim, nCents = 8, iters = 1)
    val probe = emb.select("vec_id").orderBy("vec_id").limit(1)
      .collect().map(_.getLong(0)).toSeq
    def serve(): Seq[org.apache.spark.sql.Row] =
      Pq.adcTopKFromStore(spark, path, emb, probe, k = 10, m = m,
          dim = dim)
        .collect().sortBy(_.toString).toSeq
    val before = serve()
    val victims = before.map(_.getAs[Long]("neighbor_id")).distinct.take(2)
    import spark.implicits._
    Pq.deleteFromCodesStore(spark, victims.toDF("vec_id"), path)
    val after = serve()
    assert(after != before)
    assert(!after.exists(r => victims.contains(r.getAs[Long]("neighbor_id"))))
    Pq.compactCodesStore(spark, path)
    assert(serve() == after)
  }

  test("graft_exact_topk_filtered TVF == the DataFrame filtered serve") {
    import spark.implicits._
    val vecs = vecFixture(200)
    val path = tmp("graft-del-tvf-")
    ExactIvf.writeVecStore(vecs, path, nCells = 4, iters = 1)
    val q = Seq((1L, 42L), (2L, 137L)).toDF("query_id", "probe_id")
    q.createOrReplaceTempView("del_tvf_queries")
    vecs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id").as("vec_id"))
      .createOrReplaceTempView("del_tvf_allowed")
    val sql = spark.sql(
      s"""SELECT * FROM graft_exact_topk_filtered('$path',
         'del_tvf_queries', 'del_tvf_allowed', 10, 2)""")
      .collect().map(_.toString).sorted.toSeq
    val df = ExactIvf.topDotBatchFromStoreFiltered(spark, path, q,
        spark.table("del_tvf_allowed"), k = 10, nprobe0 = 2)
      .collect().map(_.toString).sorted.toSeq
    assert(sql == df)
    assert(sql.nonEmpty)
  }

  // dedup needs DISJOINT shingle spaces across classes (docsFixture's
  // rotating shared vocabulary makes every doc the same shingle SET —
  // everything near-dups everything): class c = its own token universe,
  // docs i and i+8 byte-identical
  private def dedupDocsFixture(n: Int) = {
    import spark.implicits._
    (0L until n).map { i =>
      val c = i % 8
      (i, (0 until 12).map(j => s"w${c}x${j % 6}").mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("signature store: a deleted doc stops matching future batches; purge clears the sibling tombs") {
    import spark.implicits._
    // texts repeat with period 8, so docs 8..15 are exact duplicates of
    // stored docs 0..7 (one per disjoint text class)
    val all = dedupDocsFixture(16)
    val old = all.filter(col("doc_id") < 8)
    val batch = all.filter(col("doc_id") >= 8)
    val path = tmp("graft-del-sig-") + "/sigs"
    Dedup.writeSignatureStore(old, path)
    def decisions(): Map[Long, Int] =
      Dedup.incrementalDropDecisionsFromStore(batch,
          Dedup.readSignatureStore(spark, path), estThreshold = 0.5)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val before = decisions()
    assert(before.values.forall(_ == 1), s"expected all dropped: $before")
    // forget doc 3: its duplicate (doc 11) must stop being dropped,
    // every other decision unchanged
    Dedup.deleteFromSignatureStore(spark, Seq(3L).toDF("doc_id"), path)
    val after = decisions()
    assert(after(11L) == 0)
    assert((after - 11L) == (before - 11L))
    // tombs live in the SIBLING dir (an in-root sub-table would be
    // swept into the flat parquet read)
    assert(new java.io.File(
      graft.streaming.StoreFs.flatTombsDir(path)).exists())
    // purge: row physically gone, tombstones cleared, decisions stable
    Dedup.compactSignatureStore(spark, path)
    assert(spark.read.parquet(
        graft.streaming.StoreFs.dataDir(spark, path))
      .filter(col("doc_id") === 3L).count() == 0)
    assert(graft.streaming.StoreFs.liveTombsDir(spark, path)
      .map(d => graft.streaming.StoreFs.readTombstones(spark, d, "doc_id")
        .count()).getOrElse(0L) == 0L)
    assert(decisions() == after)
  }

  test("streaming dedup honors a delete between micro-batches (IncrementalDedup visible read)") {
    import spark.implicits._
    val all = dedupDocsFixture(16)
    val path = tmp("graft-del-sigstream-") + "/sigs"
    var seen = Map.empty[Long, Int]
    def run(b: org.apache.spark.sql.DataFrame, id: Long): Unit =
      graft.streaming.IncrementalDedup.processBatch(b, id, path,
        estThreshold = 0.5,
        onBatch = (dec, _) => seen = dec.collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap)
    run(all.filter(col("doc_id") < 8), 0L)
    assert(seen.values.forall(_ == 0)) // 8 distinct texts, none dropped
    // a takedown lands between batches
    Dedup.deleteFromSignatureStore(spark, Seq(5L).toDF("doc_id"), path)
    run(all.filter(col("doc_id") >= 8), 1L)
    // doc 13 duplicates the deleted doc 5 → kept; every other batch-2
    // doc duplicates a live stored doc → dropped
    assert(seen(13L) == 0, s"got $seen")
    assert((seen - 13L).values.forall(_ == 1), s"got $seen")
  }

  test("filtered hybrid: candidates restricted, stats whole; composes with tombstones; TVF == DataFrame form") {
    import spark.implicits._
    val docs = docsFixture(120)
    val root = tmp("graft-del-fhybrid-")
    Retrieval.writeIndexStore(docs, s"$root/idx")
    ExactIvf.writeVecStore(
      graft.operators.TextAnalysis.hashedEmbedding(docs)
        .select("doc_id", "vec"),
      s"$root/vec", nCells = 8, iters = 1)
    val queries = Seq((1L, Seq("spark", "window"), 42L),
      (2L, Seq("customer", "vector"), 84L)).toDF(
      "query_id", "terms", "probe_id")
    val allowed = docs.select("doc_id").filter(col("doc_id") % 2 === 0)
    def dfServe(): Seq[org.apache.spark.sql.Row] =
      Retrieval.hybridRrfBatchFromStoresFiltered(spark, s"$root/idx",
          s"$root/vec", queries, allowed, kList = 20, kOut = 10)
        .collect().sortBy(_.toString).toSeq
    val out = dfServe()
    // candidates restricted...
    assert(out.nonEmpty &&
      out.forall(_.getAs[Long]("doc_id") % 2 == 0))
    // ...and RANKED within the filtered lists: lexical/semantic ranks
    // are dense from 1, not an unfiltered ranking with holes
    val lexRks = out.filter(!_.isNullAt(2)).map(_.getAs[Int]("lex_rk"))
    assert(lexRks.nonEmpty && lexRks.min == 1)
    // TVF parity (shared implementation)
    queries.createOrReplaceTempView("fh_queries")
    allowed.createOrReplaceTempView("fh_allowed")
    val sql = spark.sql(
      s"""SELECT * FROM graft_hybrid_rrf_filtered('$root/idx',
         '$root/vec', 'fh_queries', 'fh_allowed', 20, 10)""")
      .collect().sortBy(_.toString).toSeq
    assert(sql == out)
    // tombstones compose: delete an allowed doc that appears in the
    // results — it must vanish from the filtered serve too
    val victim = out.map(_.getAs[Long]("doc_id")).distinct.head
    Retrieval.deleteFromIndexStore(spark,
      Seq(victim).toDF("doc_id"), s"$root/idx")
    ExactIvf.deleteFromVecStore(spark, Seq(victim).toDF("vec_id"),
      s"$root/vec")
    val after = dfServe()
    assert(after != out)
    assert(!after.exists(_.getAs[Long]("doc_id") == victim))
  }

  // 12 DISTINCT words per class (no within-doc gram repeats), docs i
  // and i+8 byte-identical — the exact-substring deletion fixture
  private def gramDocsFixture(n: Int) = {
    import spark.implicits._
    (0L until n).map { i =>
      val c = i % 8
      (i, (0 until 12).map(j => s"g${c}w$j").mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("gram store: negative-delta deletion un-counts a doc's windows exactly; compaction purges zeroed grams") {
    val all = gramDocsFixture(16)
    val old = all.filter(col("doc_id") < 8)
    val batch = all.filter(col("doc_id") >= 8)
    val path = tmp("graft-del-gram-") + "/grams"
    Dedup.writeGramStore(old, path, k = 3)
    def decisions(): Map[Long, Long] =
      Dedup.exactSubstringSpansIncremental(batch,
          spark.read.parquet(
            graft.streaming.StoreFs.dataDir(spark, path)), k = 3)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Long]("n_dup_toks")).toMap
    val before = decisions()
    assert(before.values.forall(_ > 0L), s"expected all dup: $before")
    // forget old doc 3 (class 3): its duplicate batch doc 11 stops
    // being flagged; every other decision unchanged
    Dedup.deleteFromGramStore(all.filter(col("doc_id") === 3L), path,
      k = 3)
    val after = decisions()
    assert(after(11L) == 0L, s"got $after")
    assert((after - 11L) == (before - 11L))
    // compaction nets the deltas and PURGES the zeroed grams
    val rowsBefore = spark.read.parquet(
      graft.streaming.StoreFs.dataDir(spark, path)).count()
    Dedup.compactGramStore(spark, path)
    val store = spark.read.parquet(
      graft.streaming.StoreFs.dataDir(spark, path))
    assert(store.count() < rowsBefore)
    assert(store.agg(min("cnt")).head.getLong(0) > 0L)
    assert(decisions() == after)
    // wrong-k deltas are refused (the writeGramStore guard)
    val e = intercept[IllegalArgumentException] {
      Dedup.deleteFromGramStore(all.limit(1), path, k = 5)
    }
    assert(e.getMessage.contains("k=3"))
  }

  test("DSIR store: negative-delta deletion == a store never holding the docs") {
    import spark.implicits._
    val docs = docsFixture(30)
    val isTarget = col("doc_id") % 2 === 0
    val old = docs.filter(col("doc_id") < 20)
    val batch = docs.filter(col("doc_id") >= 20)
    val path = tmp("graft-del-dsir-") + "/dsir"
    Curation.writeDsirStore(old, isTarget, path)
    def select(p: String): Seq[String] =
      Curation.dsirSelectIncremental(batch, isTarget,
          spark.read.parquet(graft.streaming.StoreFs.dataDir(spark, p)))
        .collect().map(_.toString).sorted.toSeq
    val before = select(path)
    Curation.deleteFromDsirStore(docs.filter(col("doc_id") < 5),
      isTarget, path)
    // the estimator must now equal one whose store never saw docs 0..4
    val ref = tmp("graft-del-dsirref-") + "/dsir"
    Curation.writeDsirStore(
      old.filter(col("doc_id") >= 5), isTarget, ref)
    val after = select(path)
    assert(after == select(ref))
    assert(after != before)
    // compaction nets the deltas; the estimator is unchanged
    Curation.compactDsirStore(spark, path)
    assert(select(path) == after)
  }

  test("deleting an id the store never held is a harmless no-op") {
    import spark.implicits._
    val vecs = vecFixture(50)
    val path = tmp("graft-del-noop-")
    ExactIvf.writeVecStore(vecs, path, nCells = 4, iters = 1)
    ExactIvf.deleteFromVecStore(spark, Seq(999999L).toDF("vec_id"), path)
    assert(served(path, Seq((1L, 7L)), k = 5) ==
      brute(vecs, Seq((1L, 7L)), 5))
    ExactIvf.compactVecStore(spark, path)
    assert(served(path, Seq((1L, 7L)), k = 5) ==
      brute(vecs, Seq((1L, 7L)), 5))
  }

  test("IVFADC filtered serve: a disallowed id never consumes a shortlist slot; composes with tombstones; TVF == DataFrame form") {
    import spark.implicits._
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val path = tmp("graft-del-ivfflt-")
    val (m, dim) = (8, 64)
    Pq.writeIvfadcStore(emb, path, nCells = 4, m = m, dim = dim,
      nCents = 8, iters = 1)
    val probes = emb.select("vec_id").orderBy("vec_id").limit(2)
      .collect().map(_.getLong(0)).toSeq
    val allowed = emb.select("vec_id").filter(col("vec_id") % 3 === 0)
    def filtered(kShort: Int, k: Int) =
      Pq.ivfadcTopKFromStoreFiltered(spark, path, emb,
        probes.toDF("probe_id"), allowed, nprobe = 2, kShort = kShort,
        k = k, m = m, dim = dim)
    val f = filtered(kShort = 12, k = 10).collect()
    assert(f.forall(_.getAs[Long]("neighbor_id") % 3 == 0))
    // the before-the-cut discipline: post-filtering the UNFILTERED
    // shortlist at the same kShort leaves rank holes — disallowed ids
    // consumed most of the 12 slots — while the filtered serve fills
    // all k from the allowed set
    val post = Pq.ivfadcTopKFromStore(spark, path, emb, probes,
        nprobe = 2, kShort = 12, k = 12, m = m, dim = dim)
      .filter(col("neighbor_id") % 3 === 0).collect()
    assert(post.length < f.length)
    assert(f.groupBy(_.getAs[Long]("probe_id")).values
      .forall(_.length == 10))
    // tombstones compose: delete a currently-served allowed neighbor
    val victim = f.head.getAs[Long]("neighbor_id")
    Pq.deleteFromCodesStore(spark, Seq(victim).toDF("vec_id"), path)
    val after = filtered(kShort = 12, k = 10).collect()
    assert(!after.exists(_.getAs[Long]("neighbor_id") == victim))
    assert(after.groupBy(_.getAs[Long]("probe_id")).values
      .forall(rs => rs.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to 10)))
    // the SQL surface drives the same serve
    emb.createOrReplaceTempView("delivf_emb")
    probes.toDF("probe_id").createOrReplaceTempView("delivf_probes")
    allowed.createOrReplaceTempView("delivf_allowed")
    val tvf = spark.sql(
      s"""SELECT * FROM graft_ivfadc_topk_filtered('$path',
         'delivf_emb', 'delivf_probes', 'delivf_allowed', 2, 12, 10,
         $m, $dim)""").collect()
    assert(tvf.map(_.toString).sorted.toSeq ==
      after.map(_.toString).sorted.toSeq)
  }

  test("BM25 filtered serve: stats whole, candidates restricted, dense ranks; TVF == DataFrame form") {
    import spark.implicits._
    val docs = docsFixture(120)
    val path = tmp("graft-del-bmflt-")
    Retrieval.writeIndexStore(docs, path)
    val terms = Seq("spark", "vector").toDF("term")
    val allowed = docs.select("doc_id").filter(col("doc_id") % 4 === 0)
    val f = Retrieval.bm25TopKFromStoreFiltered(spark, path, terms,
      allowed, k = 10).collect()
    assert(f.nonEmpty)
    assert(f.forall(_.getAs[Long]("doc_id") % 4 == 0))
    // stats whole: scores equal the UNFILTERED serve's scores for the
    // same (term, doc) — the filter restricts candidates, never df/N
    val unf = Retrieval.bm25TopKFromStore(spark, path, terms, 120,
        1.2, 0.75)
      .filter(col("doc_id") % 4 === 0)
      .select("term", "doc_id", "score").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(f.forall(r =>
      unf((r.getString(0), r.getAs[Long]("doc_id"))) ==
        r.getAs[Double]("score")))
    // dense in-filter ranks
    assert(f.groupBy(_.getString(0)).values.forall(rs =>
      rs.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to rs.length)))
    // the SQL surface drives the same serve
    terms.createOrReplaceTempView("delbm_terms")
    allowed.createOrReplaceTempView("delbm_allowed")
    val tvf = spark.sql(
      s"""SELECT * FROM graft_bm25_topk_filtered('$path',
         'delbm_terms', 'delbm_allowed', 10)""").collect()
    assert(tvf.map(_.toString).sorted.toSeq ==
      f.map(_.toString).sorted.toSeq)
  }

  // ---- all-deleted purge (ADVICE r14, medium): compacting a store
  // whose EVERY row is tombstoned used to swap in a zero-part-file
  // generation — the vec compactor's r2max re-tighten then threw on
  // schema inference AFTER the committed swap (tombstones uncleared),
  // and every later serve of the store failed the same way. The fix
  // lands one schema-bearing empty file; these rows pin the full
  // lifecycle: purge completes, tombstones clear, bounds zero, reads
  // stay alive, and a post-purge re-append REVIVES the store.

  test("all-deleted purge: vec store compacts to a readable empty generation and revives on re-append") {
    val vecs = vecFixture(60)
    val path = tmp("graft-del-allvec-")
    ExactIvf.writeVecStore(vecs, path, nCells = 4, iters = 1)
    ExactIvf.deleteFromVecStore(spark, vecs.select("doc_id"), path,
      idCol = "doc_id")
    ExactIvf.compactVecStore(spark, path)
    // generation readable and empty; tombstones cleared; bounds zeroed
    val live = spark.read.option("mergeSchema", "true")
      .parquet(graft.streaming.StoreFs.dataDir(spark, s"$path/vecs"))
    assert(live.count() == 0L)
    assert(spark.read.parquet(
        graft.streaming.StoreFs.dataDir(spark, s"$path/cells"))
      .agg(max("r2max")).head.getLong(0) == 0L)
    assert(graft.streaming.StoreFs.liveTombsDir(spark, path)
      .map(d => graft.streaming.StoreFs.readTombstones(spark, d, "vec_id")
        .count()).getOrElse(0L) == 0L)
    // a probe against the emptied store errors as absent, not a crash
    intercept[IllegalArgumentException] { served(path, Queries, k = 5) }
    // revive: the purge cleared the tombstones, so a re-append re-admits
    val subset = vecs.filter(col("doc_id") < 30L)
    ExactIvf.appendToVecStore(spark, subset, path)
    val qs = Seq((1L, 3L), (2L, 17L))
    assert(served(path, qs, k = 10) == brute(subset, qs, 10))
    // and the NEXT compaction (non-empty) still works over the mixed
    // root-file + partition-dir layout the empty generation left
    ExactIvf.compactVecStore(spark, path)
    assert(served(path, qs, k = 10) == brute(subset, qs, 10))
  }

  test("all-deleted purge: IVFADC codes store compacts to a readable empty generation and revives on re-append") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val path = tmp("graft-del-allcodes-")
    val (m, dim) = (8, 64)
    Pq.writeIvfadcStore(emb, path, nCells = 4, m = m, dim = dim,
      nCents = 8, iters = 1)
    val probes = emb.select("vec_id").orderBy("vec_id").limit(2)
      .collect().map(_.getLong(0)).toSeq
    def serve(): Seq[org.apache.spark.sql.Row] =
      Pq.ivfadcTopKFromStore(spark, path, emb, probes, nprobe = 2,
          kShort = 30, k = 10, m = m, dim = dim)
        .collect().sortBy(_.toString).toSeq
    val before = serve()
    assert(before.nonEmpty)
    Pq.deleteFromCodesStore(spark, emb.select("vec_id"), path)
    Pq.compactCodesStore(spark, path)
    // the emptied codes generation reads (zero rows) and serves empty
    assert(spark.read.option("mergeSchema", "true")
      .parquet(graft.streaming.StoreFs.dataDir(spark, s"$path/codes"))
      .count() == 0L)
    assert(serve().isEmpty)
    // revive: re-append the corpus under the frozen quantizers
    Pq.appendToIvfadcStore(spark, emb, path, m = m, dim = dim)
    assert(serve() == before)
  }

  test("all-deleted purge: gram and signature count/decision stores compact to readable empty state") {
    import spark.implicits._
    val docs = docsFixture(20)
    // gram store: every ingested doc's counts negated → all net <= 0
    val gram = tmp("graft-del-allgram-") + "/gram"
    Dedup.writeGramStore(docs, gram, k = 3)
    Dedup.deleteFromGramStore(docs, gram, k = 3)
    // the estimator reads as a fresh corpus at BOTH stages: with the
    // negative deltas standing (per-gram sums net to <= 0, floored),
    // and after the purge drops the zeroed rows physically. The batch
    // doc still self-duplicates internally (docsFixture's vocab period
    // is shorter than the doc), so the pin is stage parity, not zero.
    val batch = docs.filter(col("doc_id") === 0L)
      .select((col("doc_id") + 100L).as("doc_id"), col("text"))
    def spans(): Seq[String] =
      Dedup.exactSubstringSpansIncremental(batch, spark.read.parquet(
          graft.streaming.StoreFs.dataDir(spark, gram)), k = 3)
        .collect().map(_.toString).sorted.toSeq
    val netted = spans()
    Dedup.compactGramStore(spark, gram)
    assert(spark.read.parquet(
      graft.streaming.StoreFs.dataDir(spark, gram)).count() == 0L)
    assert(spans() == netted)
    // signature store: all ids tombstoned → purge leaves a readable
    // empty store (the visible read is what every decision path uses)
    val sig = tmp("graft-del-allsig-") + "/sig"
    Dedup.writeSignatureStore(docs, sig)
    Dedup.deleteFromSignatureStore(spark, docs.select("doc_id"), sig)
    Dedup.compactSignatureStore(spark, sig)
    assert(Dedup.readSignatureStore(spark, sig).count() == 0L)
  }
}
