package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** Laws of the product-quantization family (operators/Pq.scala). */
class PqSpec extends AnyFunSuite with SparkTest {

  private val M = 8
  private val Dim = 64
  private def emb = graft.sources.Tables.embeddings(spark, sfDir)

  test("subvector split concatenates back to the full micro vector") {
    val row = emb.orderBy("vec_id").first()
    val full = row.getAs[scala.collection.Seq[Float]]("embedding")
      .map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong)
    val subs = Pq.subvectors(emb, M, Dim)
      .filter(col("vec_id") === row.getAs[Long]("vec_id"))
      .orderBy("sub").collect()
      .flatMap(_.getAs[scala.collection.Seq[Long]]("svm"))
    assert(subs.toSeq == full.toSeq)
    assert(subs.length == Dim)
  }

  test("one Lloyd round does not increase total quantization distortion") {
    def distortion(iters: Int): Long = {
      val books = Pq.trainCodebooks(emb, M, Dim, nCents = 8, iters)
      Pq.encode(emb, books, M, Dim).agg(sum("d2")).first().getLong(0)
    }
    val sample = distortion(0)
    val trained = distortion(1)
    assert(trained <= sample,
      s"training increased distortion: $sample -> $trained")
    assert(trained < sample,
      s"training left distortion unchanged ($sample) — update step inert?")
  }

  test("ADC distance is EXACT for vectors that are codebook members") {
    // iters=0 keeps the sample's own subvectors as centroids, so a sample
    // member's code reconstructs it exactly (per-sub residual 0) and the
    // ADC sum telescopes to the true full-vector integer L2².
    val books = Pq.trainCodebooks(emb, M, Dim, nCents = 8, iters = 0)
    val sampleIds = books.select("cent_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val probeId = emb.select("vec_id").collect().map(_.getLong(0))
      .filterNot(sampleIds).min
    val n = emb.count().toInt
    val adc = Pq.adcTopK(emb, books, Seq(probeId), k = n, M, Dim)
      .filter(col("neighbor_id").isInCollection(sampleIds))
      .collect().map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Long]("adc_d2"))
      .toMap
    val exact = Pq.l2TopK(emb, Seq(probeId), k = n)
      .filter(col("neighbor_id").isInCollection(sampleIds))
      .collect().map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Long]("d2"))
      .toMap
    assert(adc.keySet == sampleIds, s"missing sample members: $adc")
    sampleIds.foreach { id =>
      assert(adc(id) == exact(id),
        s"ADC not exact for codebook member $id: ${adc(id)} vs ${exact(id)}")
    }
  }

  test("sample-member codes point at themselves with zero residual") {
    val books = Pq.trainCodebooks(emb, M, Dim, nCents = 8, iters = 0)
    val sampleIds = books.select("cent_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val own = Pq.encode(emb, books, M, Dim)
      .filter(col("vec_id").isInCollection(sampleIds))
      .collect()
    assert(own.length == sampleIds.size * M)
    own.foreach { r =>
      assert(r.getAs[Long]("d2") == 0L, s"nonzero residual: $r")
    }
  }

  test("store-served ADC answers identically to the recompute path") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-pqstore-test-").toString
    Pq.writePqStore(emb, path, M, Dim, nCents = 8, iters = 1)
    val books = Pq.trainCodebooks(emb, M, Dim, nCents = 8, iters = 1)
    val probeIds = Similarity.boundedProbeIds(emb, 4)
    val direct = Pq.adcTopK(emb, books, probeIds, k = 5, M, Dim)
      .collect().map(_.toString).sorted.toSeq
    val stored = Pq.adcTopKFromStore(spark, path, emb, probeIds, k = 5, M, Dim)
      .collect().map(_.toString).sorted.toSeq
    assert(direct.nonEmpty && direct == stored)
  }

  test("incremental append under frozen books == encode-all under the same books") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-pqstore-incr-test-").toString
    val base = emb.filter(col("vec_id") % 10 < 8)
    val batch = emb.filter(col("vec_id") % 10 >= 8)
    Pq.writePqStore(base, path, M, Dim, nCents = 8, iters = 1)
    Pq.appendToPqStore(spark, batch, path, M, Dim)
    val books = spark.read.parquet(s"$path/books")
    def stored = spark.read.option("mergeSchema", "true")
      .parquet(s"$path/codes").select("vec_id", "sub", "cell")
      .collect().map(_.toString).sorted.toSeq
    val recomputed = Pq.encode(emb, books, M, Dim)
      .select("vec_id", "sub", "cell")
      .collect().map(_.toString).sorted.toSeq
    assert(stored == recomputed,
      "two-generation codes must equal a full encode under the frozen books")
    // SAFE TO RETRY (ADVICE r8): the same batch again — marker fast
    // path — then a crash-before-marker replay; neither may duplicate
    // a single (vec_id, sub) row (a duplicate would double-count that
    // subspace in every ADC sum)
    Pq.appendToPqStore(spark, batch, path, M, Dim)
    assert(stored == recomputed, "same-batch retry must append nothing")
    new java.io.File(s"$path/codes").listFiles()
      .filter(_.getName.startsWith("_graft_batch_")).foreach(_.delete())
    Pq.appendToPqStore(spark, batch, path, M, Dim)
    assert(stored == recomputed,
      "crash-before-marker replay must heal, not duplicate")
  }

  test("IVFADC store: append under frozen quantizers == full encode; retry heals") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivfadc-incr-test-").toString
    val base = emb.filter(col("vec_id") % 10 < 8)
    val batch = emb.filter(col("vec_id") % 10 >= 8)
    Pq.writeIvfadcStore(base, path, nCells = 4, M, Dim, nCents = 8, iters = 1)
    Pq.appendToIvfadcStore(spark, batch, path, M, Dim)
    val coarse = spark.read.parquet(s"$path/coarse")
    val books = spark.read.parquet(s"$path/books")
    def stored = spark.read.option("mergeSchema", "true")
      .parquet(s"$path/codes")
      .select("vec_id", "ivf_cell", "sub", "cell")
      .collect().map(_.toString).sorted.toSeq
    // full encode of EVERYTHING under the same frozen quantizers
    val mv = Pq.microVectors(emb)
    val res = Pq.coarseResiduals(mv, coarse)
    val recomputed = Pq.assign(
        Pq.residualSubvectors(res, M, Dim).drop("ivf_cell"), books)
      .select(col("vec_id"), col("sub"), col("cell"))
      .join(res.select("vec_id", "ivf_cell"), Seq("vec_id"))
      .select("vec_id", "ivf_cell", "sub", "cell")
      .collect().map(_.toString).sorted.toSeq
    assert(stored == recomputed,
      "two-generation IVFADC codes must equal a full frozen-quantizer encode")
    // retry + crash-before-marker replay: no duplicates either way
    Pq.appendToIvfadcStore(spark, batch, path, M, Dim)
    assert(stored == recomputed, "same-batch retry must append nothing")
    new java.io.File(s"$path/codes").listFiles()
      .filter(_.getName.startsWith("_graft_batch_")).foreach(_.delete())
    Pq.appendToIvfadcStore(spark, batch, path, M, Dim)
    assert(stored == recomputed,
      "crash-before-marker replay must heal, not duplicate")
  }

  test("a vec_id re-ingested in a LATER batch drops — PQ and IVFADC (ADVICE r10)") {
    // cross-batch unique ids: encode is deterministic under the frozen
    // quantizers, so a re-ingest would land duplicate (vec_id, sub)
    // rows and double-count those subspaces in every ADC sum
    val pqPath = java.nio.file.Files
      .createTempDirectory("graft-pq-xbatch-test-").toString
    Pq.writePqStore(emb.filter(col("vec_id") % 10 < 6), pqPath,
      M, Dim, nCents = 8, iters = 1)
    Pq.appendToPqStore(spark,
      emb.filter(col("vec_id") % 10 >= 6), pqPath, M, Dim,
      batchId = Some(1L))
    Pq.appendToPqStore(spark,
      emb.filter(col("vec_id") % 10 >= 8), pqPath, M, Dim,
      batchId = Some(2L)) // overlaps batch 1 entirely
    val pqCodes = spark.read.option("mergeSchema", "true")
      .parquet(s"$pqPath/codes").select("vec_id", "sub")
    assert(pqCodes.count() == pqCodes.distinct().count(),
      "PQ store must hold exactly one row per (vec_id, sub)")
    val ivfPath = java.nio.file.Files
      .createTempDirectory("graft-ivfadc-xbatch-test-").toString
    Pq.writeIvfadcStore(emb.filter(col("vec_id") % 10 < 6), ivfPath,
      nCells = 4, M, Dim, nCents = 8, iters = 1)
    Pq.appendToIvfadcStore(spark,
      emb.filter(col("vec_id") % 10 >= 6), ivfPath, M, Dim,
      batchId = Some(1L))
    Pq.appendToIvfadcStore(spark,
      emb.filter(col("vec_id") % 10 >= 8), ivfPath, M, Dim,
      batchId = Some(2L))
    val ivfCodes = spark.read.option("mergeSchema", "true")
      .parquet(s"$ivfPath/codes").select("vec_id", "sub")
    assert(ivfCodes.count() == ivfCodes.distinct().count(),
      "IVFADC store must hold exactly one row per (vec_id, sub)")
  }

  test("codes-store compaction preserves answers and survives further appends") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-pq-compact-test-").toString
    val base = emb.filter(col("vec_id") % 10 < 6)
    val mid = emb.filter(col("vec_id") % 10 >= 6 && col("vec_id") % 10 < 8)
    val late = emb.filter(col("vec_id") % 10 >= 8)
    Pq.writePqStore(base, path, M, Dim, nCents = 8, iters = 1)
    Pq.appendToPqStore(spark, mid, path, M, Dim, batchId = Some(1L))
    val probeIds = Similarity.boundedProbeIds(emb, 4)
    def served = Pq.adcTopKFromStore(spark, path, emb, probeIds,
      k = 5, M, Dim).collect().map(_.toString).sorted.toSeq
    val before = served
    Pq.compactCodesStore(spark, path)
    assert(served == before, "compaction must not change a single answer")
    // one generation, sentinel-tagged — later tagged appends stay safe
    val compacted = spark.read
      .parquet(graft.streaming.StoreFs.dataDir(spark, s"$path/codes"))
    assert(compacted.select("batch_id").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(-1L))
    Pq.appendToPqStore(spark, late, path, M, Dim, batchId = Some(2L))
    val books = spark.read.parquet(s"$path/books")
    val full = Pq.encode(emb, books, M, Dim).select("vec_id", "sub", "cell")
      .collect().map(_.toString).sorted.toSeq
    val stored = spark.read.option("mergeSchema", "true")
      .parquet(graft.streaming.StoreFs.dataDir(spark, s"$path/codes"))
      .select("vec_id", "sub", "cell")
      .collect().map(_.toString).sorted.toSeq
    assert(stored == full,
      "appends onto the compacted generation must keep full-encode parity")
  }

  test("successive UNTAGGED appends of different batches all land (ADVICE r9)") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-pq-untagged-test-").toString
    val base = emb.filter(col("vec_id") % 10 < 6)
    val batchA = emb.filter(col("vec_id") % 10 >= 6 && col("vec_id") % 10 < 8)
    val batchB = emb.filter(col("vec_id") % 10 >= 8)
    Pq.writePqStore(base, path, M, Dim, nCents = 8, iters = 1)
    // neither append passes a batchId — the r9 hazard was a shared
    // default id whose marker made the SECOND append a silent no-op
    Pq.appendToPqStore(spark, batchA, path, M, Dim)
    Pq.appendToPqStore(spark, batchB, path, M, Dim)
    val books = spark.read.parquet(s"$path/books")
    val stored = spark.read.option("mergeSchema", "true")
      .parquet(s"$path/codes").select("vec_id", "sub", "cell")
      .collect().map(_.toString).sorted.toSeq
    val full = Pq.encode(emb, books, M, Dim).select("vec_id", "sub", "cell")
      .collect().map(_.toString).sorted.toSeq
    assert(stored == full,
      "both untagged batches must land (no marker short-circuit without an id)")
    // and a retry of an untagged batch still appends nothing (anti-join)
    Pq.appendToPqStore(spark, batchB, path, M, Dim)
    val retried = spark.read.option("mergeSchema", "true")
      .parquet(s"$path/codes").select("vec_id", "sub", "cell")
      .collect().map(_.toString).sorted.toSeq
    assert(retried == full, "untagged retry must append nothing")
  }

  test("TORN append (rows landed, marker lost) compacted away still replays as a no-op") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-pq-torn-test-").toString
    val base = emb.filter(col("vec_id") % 10 < 8)
    val batch = emb.filter(col("vec_id") % 10 >= 8)
    Pq.writePqStore(base, path, M, Dim, nCents = 8, iters = 1)
    Pq.appendToPqStore(spark, batch, path, M, Dim, batchId = Some(3L))
    // the one crash window the anti-join (not the marker) covers: rows
    // committed, marker write lost
    new java.io.File(s"$path/codes", "_graft_batch_3").delete()
    // compaction folds the tag into the -1 sentinel — it must SEAL the
    // folded tags under the _graft_sealed watermark first
    // (ADVICE r10), or the replay below re-appends the whole batch
    // onto the compacted generation
    Pq.compactCodesStore(spark, path)
    val liveDir = graft.streaming.StoreFs.dataDir(spark, s"$path/codes")
    assert(java.nio.file.Files.readString(
        new java.io.File(liveDir, "_graft_sealed").toPath).trim == "3",
      "compaction must seal folded batch tags under the watermark marker")
    // marker state stays O(1): the seal subsumes per-batch markers
    assert(!new java.io.File(liveDir).listFiles()
      .exists(_.getName.startsWith("_graft_batch_")),
      "per-batch markers must be reclaimed once sealed")
    val before = spark.read.parquet(liveDir)
      .select("vec_id", "sub", "cell")
      .collect().map(_.toString).sorted.toSeq
    Pq.appendToPqStore(spark, batch, path, M, Dim, batchId = Some(3L))
    val after = spark.read
      .parquet(graft.streaming.StoreFs.dataDir(spark, s"$path/codes"))
      .select("vec_id", "sub", "cell")
      .collect().map(_.toString).sorted.toSeq
    assert(after == before,
      "a torn pre-compaction batch must replay as a no-op")
  }

  test("compaction preserves replay markers: a lagged checkpoint replay appends nothing") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-pq-marker-test-").toString
    val base = emb.filter(col("vec_id") % 10 < 8)
    val batch = emb.filter(col("vec_id") % 10 >= 8)
    Pq.writePqStore(base, path, M, Dim, nCents = 8, iters = 1)
    Pq.appendToPqStore(spark, batch, path, M, Dim, batchId = Some(7L))
    Pq.compactCodesStore(spark, path)
    // the per-batch marker is subsumed by the O(1) sealed watermark,
    // which must ride across the generational flip
    assert(java.nio.file.Files.readString(
        new java.io.File(
          graft.streaming.StoreFs.dataDir(spark, s"$path/codes"),
          "_graft_sealed").toPath).trim == "7",
      "the sealed watermark (with its id) must ride across the compaction flip")
    val before = spark.read
      .parquet(graft.streaming.StoreFs.dataDir(spark, s"$path/codes"))
      .select("vec_id", "sub", "cell")
      .collect().map(_.toString).sorted.toSeq
    // the ADVICE-r9 scenario: batch 7's append landed but its streaming
    // checkpoint had not committed when compaction ran — the restart
    // replays batch 7; the preserved marker must short-circuit it
    Pq.appendToPqStore(spark, batch, path, M, Dim, batchId = Some(7L))
    val after = spark.read.parquet(s"$path/codes")
      .select("vec_id", "sub", "cell")
      .collect().map(_.toString).sorted.toSeq
    assert(after == before,
      "a replay of a pre-compaction batch must hit the marker fast path")
  }

  test("Hadamard rotation scales L2 by exactly dim and preserves the ranking") {
    val mv = graft.core.Caches.scoped(Pq.microVectors(emb))
    val rv = mv.select(col("vec_id"), Pq.hadamardRotate(col("vm"), Dim).as("vm"))
    val probeIds = Similarity.boundedProbeIds(emb, 4)
    val plain = Pq.l2TopKMicro(mv, probeIds, k = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("d2")).toMap
    val rot = Pq.l2TopKMicro(rv, probeIds, k = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("d2")).toMap
    assert(plain.keySet == rot.keySet,
      "rotation must not change the exact top-k ranking")
    plain.foreach { case (k0, d2) =>
      assert(rot(k0) == Dim.toLong * d2,
        s"‖Ha−Hb‖² must equal dim·‖a−b‖² exactly at $k0: ${rot(k0)} vs $d2")
    }
  }

  test("recall panel grades both variants on the bounded probe set") {
    val panel = Pq.adcRecallPanel(emb, M, Dim, nCents = 8, nProbes = 8,
        k = 5, Seq(("pq_rerank", 1, 25, 0.0), ("pq_sample", 0, 0, 0.0),
          ("pq_trained", 1, 0, 0.0)))
      .orderBy("method").collect()
    assert(panel.map(_.getAs[String]("method")).toSeq ==
      Seq("pq_rerank", "pq_sample", "pq_trained"))
    panel.foreach { r =>
      val recall = r.getAs[Double]("recall")
      assert(recall >= 0.0 && recall <= 1.0, s"recall out of range: $r")
      assert(recall > 0.0, s"ADC found no true neighbors at all: $r")
      assert(r.getAs[Int]("recall_ok") == 1)
    }
    // Exact re-rank dominates the raw ADC cut by construction: any true
    // neighbor in ADC top-k is in the (⊇) shortlist, and true top-k
    // members always survive an exact re-ranking of any subset.
    val byMethod = panel.map(r =>
      r.getAs[String]("method") -> r.getAs[Double]("recall")).toMap
    assert(byMethod("pq_rerank") >= byMethod("pq_trained"),
      s"re-rank lost recall vs its own shortlist source: $byMethod")
  }
}
