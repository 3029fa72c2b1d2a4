package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest
import graft.operators.{Curation, Dedup, Quantization, Retrieval}

/** Geometry manifests for the lexical/curation store families (VERDICT
  * r13 #4): the index/positional/signature/gram/DSIR/code stores now
  * record (family, key columns, family-specific parameters) at build,
  * and serves/appends validate the caller against the record instead
  * of trusting the path — a BM25 serve aimed at a positional store, or
  * a gram append under a different k, read plausible parquet and
  * answered silently wrong before. Pre-manifest stores (no record)
  * keep the trust-the-caller contract. The store fsck cross-checks
  * manifest vs data and surfaces disagreement as an error finding. */
class GeometryGuardSpec extends AnyFunSuite with SparkTest {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def docs(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).map { i =>
      (i, s"alpha term${i % 5} document $i about topic${i % 3} body")
    }.toDF("doc_id", "text")
  }

  test("index family: wrong-family serve and append fail fast naming the recorded geometry") {
    val root = tmp("graft-geo-idx-")
    val idx = s"$root/idx"
    Retrieval.writeIndexStore(docs(30), idx)
    // healthy: the recorded family admits the matching serve
    assert(Retrieval.bm25TopKFromStore(spark, idx, Seq("alpha"), 3)
      .count() > 0)
    // an operator restores the WRONG manifest (or aims the serve at a
    // foreign store): the serve refuses instead of scoring junk
    StoreFs.writeGeometry(spark, s"$idx/postings", Seq(
      "family" -> "positional"))
    val e1 = intercept[IllegalArgumentException](
      Retrieval.bm25TopKFromStore(spark, idx, Seq("alpha"), 3))
    assert(e1.getMessage.contains("family='positional'") &&
      e1.getMessage.contains("index_postings"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Retrieval.appendIndexStore(docs(5), idx))
    assert(e2.getMessage.contains("family='positional'"), e2.getMessage)
    // restoring the right manifest restores service
    StoreFs.writeGeometry(spark, s"$idx/postings", Seq(
      "family" -> "index_postings", "layout" -> "term_sorted",
      "key_columns" -> "term,doc_id"))
    assert(Retrieval.bm25TopKFromStore(spark, idx, Seq("alpha"), 3)
      .count() > 0)
  }

  test("positional family: the phrase serve refuses an index-postings manifest") {
    val root = tmp("graft-geo-pos-")
    Retrieval.writePositionalStore(docs(30), root)
    assert(Retrieval.phraseSearchFromStore(spark, root,
      Seq(Seq("alpha", "term1")), 3).collect() != null)
    StoreFs.writeGeometry(spark, s"$root/positions", Seq(
      "family" -> "index_postings"))
    val e = intercept[IllegalArgumentException](
      Retrieval.phraseSearchFromStore(spark, root,
        Seq(Seq("alpha", "term1")), 3))
    assert(e.getMessage.contains("family='index_postings'") &&
      e.getMessage.contains("positional"), e.getMessage)
  }

  test("gram family: k is part of the store identity — a different-k append is refused") {
    val path = tmp("graft-geo-gram-") + "/grams"
    Dedup.writeGramStore(docs(20), path, k = 5)
    // same k appends fine (the incremental cadence)
    Dedup.writeGramStore(docs(20), path, k = 5)
    val e = intercept[IllegalArgumentException](
      Dedup.writeGramStore(docs(20), path, k = 7))
    assert(e.getMessage.contains("k=5") && e.getMessage.contains("k=7"),
      e.getMessage)
    // and a gram append aimed at a foreign store family is refused
    val sig = tmp("graft-geo-gram2-") + "/sigs"
    Dedup.writeSignatureStore(docs(20), sig)
    val e2 = intercept[IllegalArgumentException](
      Dedup.writeGramStore(docs(20), sig, k = 5))
    assert(e2.getMessage.contains("family='signature'"), e2.getMessage)
  }

  test("code family: append validates (maxBits, dim) against the build") {
    import spark.implicits._
    val emb = (0L until 40L).map { i =>
      (i, (0 until 8).map(j => (((i * 31 + j * 17) % 201) - 100) / 100.0f))
    }.toDF("vec_id", "embedding")
    val path = tmp("graft-geo-code-") + "/codes"
    Quantization.writeCodeStore(emb, path, targetOcc = 16, maxBits = 6,
      dim = 8)
    val store = spark.read.parquet(StoreFs.dataDir(spark, path))
    val e1 = intercept[IllegalArgumentException](
      Quantization.appendToCodeStore(emb, store, path, maxBits = 8,
        dim = 8))
    assert(e1.getMessage.contains("max_bits=6"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Quantization.appendToCodeStore(emb, store, path, maxBits = 6,
        dim = 16))
    assert(e2.getMessage.contains("dim=8"), e2.getMessage)
    // the matching contract still appends
    Quantization.appendToCodeStore(emb.select(
        (col("vec_id") + 100L).as("vec_id"), col("embedding")),
      store, path, maxBits = 6, dim = 8)
  }

  test("signature/DSIR streams: the first batch records the family; a wrong-store path fails fast") {
    val sig = tmp("graft-geo-sig-") + "/sigs"
    IncrementalDedup.processBatch(docs(20), 0L, sig, 0.5,
      (_, _) => ())
    assert(StoreFs.readGeometry(spark, sig).get("family")
      .contains("signature"))
    // a DSIR stream pointed at the signature store refuses before
    // mutating anything
    val e = intercept[IllegalArgumentException](
      DsirStream.processBatch(docs(20), 99L, col("doc_id") % 3 === 0,
        sig, 0.0, (_, _) => ()))
    assert(e.getMessage.contains("family='signature'") &&
      e.getMessage.contains("dsir"), e.getMessage)
    // and the right family bootstraps its own record
    val dsir = tmp("graft-geo-dsir-") + "/counts"
    Curation.writeDsirStore(docs(20), col("doc_id") % 3 === 0, dsir)
    assert(StoreFs.readGeometry(spark, dsir).get("family")
      .contains("dsir"))
    val e2 = intercept[IllegalArgumentException](
      IncrementalDedup.processBatch(docs(20), 0L, dsir, 0.5,
        (_, _) => ()))
    assert(e2.getMessage.contains("family='dsir'"), e2.getMessage)
  }

  test("PQ/IVFADC family guards: residual vs flat codes never cross-serve; PQ append validates (m, dim)") {
    import spark.implicits._
    val emb = (0L until 60L).map { i =>
      (i, (0 until 8).map(j => (((i * 31 + j * 17) % 201) - 100) / 100.0f))
    }.toDF("vec_id", "embedding")
    val root = tmp("graft-geo-pq-")
    val pq = s"$root/pq"; val adc = s"$root/adc"
    graft.operators.Pq.writePqStore(emb, pq, m = 2, dim = 8, nCents = 8,
      iters = 1)
    graft.operators.Pq.writeIvfadcStore(emb, adc, nCells = 4, m = 2,
      dim = 8, nCents = 8, iters = 1)
    // flat-ADC serve at an IVFADC root: the codes are residual-coded —
    // summing a flat LUT over them is silently wrong, so it refuses
    val e1 = intercept[IllegalArgumentException](
      graft.operators.Pq.adcTopKFromStore(spark, adc, emb, Seq(3L),
        k = 5, m = 2, dim = 8))
    assert(e1.getMessage.contains("family='ivfadc'"), e1.getMessage)
    // IVFADC serve at a flat-PQ root refuses the same way
    val e2 = intercept[IllegalArgumentException](
      graft.operators.Pq.ivfadcTopKFromStore(spark, pq, emb, Seq(3L),
        nprobe = 2, kShort = 10, k = 5, m = 2, dim = 8))
    assert(e2.getMessage.contains("family='pq'"), e2.getMessage)
    // the PQ append validates (m, dim) against the build
    val e3 = intercept[IllegalArgumentException](
      graft.operators.Pq.appendToPqStore(spark, emb, pq, m = 4, dim = 8))
    assert(e3.getMessage.contains("m=2"), e3.getMessage)
    // matching contracts still serve and append
    assert(graft.operators.Pq.adcTopKFromStore(spark, pq, emb, Seq(3L),
      k = 5, m = 2, dim = 8).count() > 0)
    graft.operators.Pq.appendToPqStore(spark,
      emb.select((col("vec_id") + 100L).as("vec_id"), col("embedding")),
      pq, m = 2, dim = 8)
  }

  test("store fsck: manifest/data disagreement is an error finding; healthy stores are quiet") {
    import spark.implicits._
    // healthy index store → no geometry findings on any sub
    val root = tmp("graft-geo-audit-")
    val idx = s"$root/idx"
    Retrieval.writeIndexStore(docs(20), idx)
    val healthy = StoreAudit.auditFindings(spark, idx,
      Seq(s"$idx/doclen", s"$idx/postings"))
    assert(!healthy.exists(_.check == "geometry"), s"got $healthy")
    // key-column mismatch: a manifest restored onto the wrong data
    StoreFs.writeGeometry(spark, s"$idx/postings", Seq(
      "family" -> "gram", "key_columns" -> "gh"))
    val broken = StoreAudit.auditFindings(spark, idx,
      Seq(s"$idx/doclen", s"$idx/postings"))
    assert(broken.exists(f => f.check == "geometry" &&
      f.level == "error" && f.detail.contains("gh")), s"got $broken")
    // vec-store layout mismatch: bucketed data under a legacy manifest
    val vec = s"$root/vec"
    graft.operators.ExactIvf.writeVecStore(
      (0L until 60L).map { i =>
        (i, (0 until 8).map(j => ((i * 31 + j * 17) % 201) - 100L).toArray)
      }.toDF("doc_id", "vec"), vec, nCells = 4, iters = 1)
    assert(!StoreAudit.auditFindings(spark, vec)
      .exists(_.check == "geometry"))
    StoreFs.writeGeometry(spark, vec, Seq(
      "family" -> "exact_ivf", "n_cells" -> "4", "n_buckets" -> "0"))
    val vbroken = StoreAudit.auditFindings(spark, vec)
    assert(vbroken.exists(f => f.check == "geometry" &&
      f.level == "error" && f.detail.contains("n_buckets=0")),
      s"got $vbroken")
  }
}
