package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** Operator-law tests over the dedup / scoring / text suites. */
class OperatorsSpec extends AnyFunSuite with SparkTest {

  private def docs(texts: (Long, String)*) = {
    import spark.implicits._
    texts.toSeq.toDF("doc_id", "text")
  }

  test("identical documents collapse to one exact-dedup group") {
    val d = docs(1L -> "Hello  World", 2L -> "hello world", 3L -> "other text")
    val g = Dedup.exact(d).orderBy("keep_doc_id").collect()
    assert(g.length == 2)
    assert(g(0).getAs[Long]("keep_doc_id") == 1L && g(0).getAs[Long]("n_dupes") == 2L)
  }

  test("identical documents share the full MinHash signature (est=1.0)") {
    val d = docs(1L -> ("spark rocks " * 10), 2L -> ("spark rocks " * 10),
      3L -> "completely different words here now ok yes")
    val cands = Dedup.minhashLshCandidates(d).collect()
    assert(cands.length == 1)
    assert(cands.head.getAs[Long]("doc_a") == 1L)
    assert(cands.head.getAs[Double]("est_jaccard") == 1.0)
  }

  test("identical documents share a SimHash; different docs mostly differ") {
    val d = docs(1L -> "alpha beta gamma delta", 2L -> "alpha beta gamma delta",
      3L -> "zx qy wv ut")
    val h = Dedup.simhash(d).collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(h(1L) == h(2L))
    assert(h(1L) != h(3L))
  }

  test("bucketed near-dup == brute force restricted to same-bucket pairs") {
    import graft.functions.VectorFunctions
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val bucketed = Similarity.nearDupPairsBucketed(emb, 0.3, nBits = 4, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val buckets = emb.select(col("vec_id"),
        VectorFunctions.lshBucket(col("embedding"), 4, 64).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val brute = Similarity.nearDupPairs(emb, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // approximation is exactly "same bucket": nothing else dropped or added
    assert(bucketed == brute.filter { case (a, b) => buckets(a) == buckets(b) })
    assert(bucketed.subsetOf(brute))
  }

  test("NGramGenerator matches shingles()+explode row-for-row") {
    import graft.functions.{NGramGenerator, TextFunctions}
    val d = docs(1L -> "a b c d", 2L -> "x y", 3L -> "solo", 4L -> "p p p p")
    val viaGen = d.select(col("doc_id"),
        NGramGenerator.ngrams(spark, TextFunctions.words(
          TextFunctions.normText(col("text"))), 3).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    // the INDEPENDENT array formulation (shingles()+explode) — NOT
    // explodedShingles, which itself runs the generator now
    val viaArr = graft.operators.Dedup.prepared(d)
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(viaGen == viaArr)
    // duplicates preserved; < n tokens → zero rows
    assert(viaGen.count(_._1 == 4L) == 2)
    assert(!viaGen.exists(t => t._1 == 2L || t._1 == 3L))
    // null TOKEN nulls its n-grams (concat-style propagation), no crash
    val nullToks = spark.range(1).select(
      NGramGenerator.ngrams(spark,
        array(lit("a"), lit(null).cast("string"), lit("b")), 2).as("g"))
    assert(nullToks.collect().map(r => Option(r.getString(0))).toSeq == Seq(None, None))
  }

  test("large unrelated docs do not band-collide (32-bit slice floor)") {
    // Regression for the 16-bit-slice degeneracy: with ~40k distinct
    // shingles per doc, the min of n draws from a 2^16 space is ~0 for
    // every doc, so ANY two large docs matched on every hash. The 32-bit
    // slices keep P(shared min | disjoint shingles) ≈ n/2^32 per hash.
    def bigDoc(prefix: String, n: Int): String =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    val d = docs(1L -> bigDoc("a", 40000), 2L -> bigDoc("b", 40000))
    assert(Dedup.minhashLshCandidates(d).count() == 0)
  }

  test("incremental dedup drops a new doc only against the old corpus") {
    // old: ids 1,2 (id % 10 <= 7) — new: 18, 19, 28. 18 duplicates old#1
    // (dropped); 19 duplicates fellow-new 28 ONLY (kept — in-batch dedup
    // is a separate stage); 28 kept.
    val d = docs(
      1L -> ("spark rocks " * 10), 2L -> "totally unrelated old words here",
      18L -> ("spark rocks " * 10), 19L -> ("novel duplicate pair " * 8),
      28L -> ("novel duplicate pair " * 8))
    val out = Dedup.incrementalDropDecisions(d, id => id % 10 >= 8, 0.5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(18L -> 1, 19L -> 0, 28L -> 0))
  }

  test("ngram jaccard is 1.0 for identical docs and finds them only") {
    import spark.implicits._
    val d = Seq((1L, "a b c d e f g", "en"), (2L, "a b c d e f g", "en"),
      (3L, "h i j k l m n", "en")).toDF("doc_id", "text", "lang")
    val j = Dedup.ngramJaccard(d, 0.9).collect()
    assert(j.length == 1 && j.head.getAs[Double]("jaccard") == 1.0)
  }

  test("L1 weights sum to 1 over the scoring pipeline") {
    val weights = graft.queries.PipelineQueries.q15.run(spark, sfDir)
    val s = weights.agg(sum("weight")).first().getDouble(0)
    assert(math.abs(s - 1.0) < 1e-9)
    // corruption predicate actually fires at this SF
    val imperfect = weights.filter(col("score_rate") < 1.0).count()
    assert(imperfect > 0)
  }

  test("language ID picks the lexicon-dominant language") {
    import spark.implicits._
    val d = Seq(
      (1L, "the cat and the dog of the house", "en"),
      (2L, "el gato y la casa de que en un", "es"),
      (3L, "der hund und das ist ein nicht", "de")).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langId(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted_lang")).toMap
    assert(out == Map(1L -> "en", 2L -> "es", 3L -> "de"))
  }

  test("quality metrics are bounded and exact for a known doc") {
    val q = TextAnalysis.quality(docs(1L -> "the the unique")).collect().head
    assert(q.getAs[Long]("n_words") == 3L)
    assert(q.getAs[Double]("stopword_ratio") == 2.0 / 3)
    assert(q.getAs[Double]("type_token_ratio") == 2.0 / 3)
    assert(q.getAs[Double]("quality_score") <= 1.0)
  }

  test("signature-store incremental path matches the recompute path") {
    val d = docs(
      1L -> ("spark rocks " * 10), 2L -> "totally unrelated old words here",
      18L -> ("spark rocks " * 10), 19L -> ("novel duplicate pair " * 8),
      28L -> ("novel duplicate pair " * 8))
    val store = java.nio.file.Files.createTempDirectory("graft-sigstore-test").toString
    Dedup.writeSignatureStore(d.filter(col("doc_id") % 10 < 8), store)
    val viaStore = Dedup.incrementalDropDecisionsFromStore(
        d.filter(col("doc_id") % 10 >= 8), spark.read.parquet(store), 0.5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // identical decisions to the from-text path (18 dups old#1 → dropped;
    // 19/28 are new-vs-new only → kept), with the old side fed purely
    // from persisted signatures
    assert(viaStore == Map(18L -> 1, 19L -> 0, 28L -> 0))
    assert(viaStore == Dedup.incrementalDropDecisions(d, id => id % 10 >= 8, 0.5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap)
  }

  test("connected components label every node with its component minimum") {
    import spark.implicits._
    // (1,3),(2,3) is the shape where greedy and closure DIFFER: greedy
    // drops only doc_b of each pair ({3} — doc 2 survives), while the
    // closure puts {1,2,3} in one cluster with the single survivor 1.
    // Chain (10,11),(11,12) collapses to 10; (20,21) to 20.
    val edges = Seq((1L, 3L), (2L, 3L), (10L, 11L), (11L, 12L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val lbl = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("cluster closure keeps exactly one survivor per duplicate cluster") {
    val d = docs(
      1L -> ("spark rocks " * 10), 2L -> ("spark rocks " * 10),
      3L -> ("spark rocks " * 10), 4L -> "unrelated standalone words here")
    val out = Dedup.clusterClosureDecisions(d, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSet == Set((1L, 1L, 1), (2L, 1L, 0), (3L, 1L, 0), (4L, 4L, 1)))
  }

  test("df cap bounds exact-jaccard fan-out on a boilerplate shingle") {
    import spark.implicits._
    // 30 docs share one header sentence (its shingles have df=30 — a
    // quadratic 435-pair join without the cap); tails are unique.
    val d = (1 to 30).map(i =>
        (i.toLong, s"common header words here now tail$i unique$i end$i", "en"))
      .toDF("doc_id", "text", "lang")
    val uncapped = Dedup.ngramJaccard(d, threshold = 0.01)
    assert(uncapped.count() == 435L) // every pair shares the header
    // cap at df ≤ 5: header shingles leave the universe → no shared
    // shingles remain → zero candidate pairs reach the join output
    assert(Dedup.ngramJaccard(d, threshold = 0.01, maxDf = 5).count() == 0L)
  }

  test("png codec round-trips real dimensions and pixel sums") {
    import spark.implicits._
    val ids = Seq(0L, 7L, 123L).toDF("doc_id")
    val out = Multimodal.decodePng(Multimodal.encodePng(ids)).collect()
    for (m <- out) {
      val id = m.doc_id
      val (w, h) = ((1 + id % 16).toInt, (1 + id % 8).toInt)
      assert(m.width == w && m.height == h && m.ok_sig == 1)
      val expected = (for (y <- 0 until h; x <- 0 until w)
        yield (id * 31 + x * 7 + y) % 256).sum
      assert(m.px_sum == expected, s"doc $id")
    }
  }

  test("auto-bucketed near-dup == fixed-bits at the derived bit count") {
    import spark.implicits._
    import graft.functions.VectorFunctions
    // the bit choice: smallest count keeping expected occupancy ≤ 16
    val bits = Seq(10L, 100L, 1000L, 100000L).toDF("n")
      .select(VectorFunctions.autoBits(col("n"), 16, 12).as("b"))
      .collect().map(_.getInt(0)).toSeq
    assert(bits == Seq(0, 3, 6, 12))
    // 500 fixture vectors → 5 bits; the auto variant must equal the fixed
    // variant evaluated at exactly that count
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(
      pairs(Similarity.nearDupPairsAutoBucketed(emb, 0.3, targetOcc = 16, maxBits = 12, dim = 64))
        == pairs(Similarity.nearDupPairsBucketed(emb, 0.3, nBits = 5, dim = 64)))
  }

  test("png resize decodes, downsamples and re-encodes a real raster") {
    import spark.implicits._
    val ids = Seq(5L, 15L, 123L).toDF("doc_id")
    val out = Multimodal.resizePng(Multimodal.encodePng(ids), tw = 8, th = 4).collect()
    for (m <- out) {
      val id = m.doc_id
      val (sw, sh) = ((1 + id % 16).toInt, (1 + id % 8).toInt)
      assert(m.src_w == sw && m.src_h == sh && m.width == 8 && m.height == 4)
      assert(m.ok_reencode == 1)
      val expected = (for (y <- 0 until 4; x <- 0 until 8)
        yield (id * 31 + (x * sw / 8) * 7 + (y * sh / 4)) % 256).sum
      assert(m.px_sum == expected, s"doc $id")
    }
  }

  test("wav codec round-trips real RIFF containers and PCM sums") {
    import spark.implicits._
    val ids = Seq(0L, 20L, 140L).toDF("doc_id")
    val out = Multimodal.decodeWav(Multimodal.encodeWav(ids)).collect()
    for (m <- out) {
      val id = m.doc_id
      val n = (64 + id % 128).toInt
      assert(m.sample_rate == 8000 && m.channels == 1 && m.ok_riff == 1)
      assert(m.n_samples == n)
      val expected = (0 until n).map(i => (id * 7 + i * 13) % 2003 - 1001).sum
      assert(m.sample_sum == expected, s"doc $id")
    }
  }

  test("multi-probe LSH recall >= single-probe at the same bit count") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val exact = Similarity.bruteForceTopK(emb, col("vec_id") % 50 === 0, 3)
      .select("probe_id", "neighbor_id")
    def hits(df: org.apache.spark.sql.DataFrame): Long =
      df.select("probe_id", "neighbor_id")
        .join(exact, Seq("probe_id", "neighbor_id"), "left_semi").count()
    val single = hits(Similarity.lshBucketed(emb, col("vec_id") % 50 === 0, 3, 4, 64))
    val multi = hits(Similarity.lshBucketedMultiProbe(emb, col("vec_id") % 50 === 0, 3, 4, 64))
    assert(multi >= single)
    assert(multi > single, s"multi-probe found no extra true neighbors ($single)")
  }

  test("k-means codebook training improves mean assignment cosine") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val e = emb.select(col("vec_id"), Similarity.quantize(col("embedding")).as("vq"))
    def avgCos(iters: Int): Double = {
      val cb = Similarity.kmeansCodebook(emb, col("vec_id") % 125 === 0, iters)
      Similarity.assignCells(e, cb).agg(avg("a_cos")).first().getDouble(0)
    }
    val untrained = avgCos(0) // init = sampled corpus rows (the x34 skeleton)
    val trained = avgCos(2)
    assert(trained > untrained,
      s"training did not improve assignment: $untrained -> $trained")
    // every vector lands in exactly one cell
    val cb = Similarity.kmeansCodebook(emb, col("vec_id") % 125 === 0, 2)
    assert(Similarity.assignCells(e, cb).count() == emb.count())
  }

  test("auto-bits multi-probe equals fixed multi-probe at the matching bit count") {
    // At this fixture size autoBits(occupancy 16) resolves to 2, so the
    // corpus-adaptive variant must produce EXACTLY the fixed nBits=2
    // result — pins the bucket masking and the probe-list truncation.
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val expectedBits = (1 to 12).count(j => n > 16L * (1L << (j - 1)))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "neighbor_id", "bucket", "cos", "rk")
        .collect().map(_.toString).toSet
    val auto = rows(Similarity.lshBucketedMultiProbeAuto(emb,
      col("vec_id") % 25 === 0, k = 3, targetOcc = 16, maxBits = 12, dim = 64))
    val fixed = rows(Similarity.lshBucketedMultiProbe(emb,
      col("vec_id") % 25 === 0, k = 3, nBits = expectedBits, dim = 64))
    assert(auto == fixed, s"auto (bits=$expectedBits) diverged from fixed")
  }

  test("trained IVF search (x54 composition) recall >= untrained IVF") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val probePred = col("vec_id") % 50 === 0
    val exact = Similarity.bruteForceTopK(emb, probePred, 3)
      .select("probe_id", "neighbor_id")
    def hits(df: org.apache.spark.sql.DataFrame): Long =
      df.select("probe_id", "neighbor_id")
        .join(exact, Seq("probe_id", "neighbor_id"), "left_semi").count()
    val untrained = hits(Similarity.ivfTopK(emb,
      centPred = col("vec_id") % 125 === 0, probePred, 3))
    val trained = hits(Similarity.ivfTrainedTopK(emb,
      initPred = col("vec_id") % 125 === 0, iters = 2, probePred, 3,
      nProbeCells = 3))
    assert(trained >= untrained,
      s"trained IVF recall regressed vs untrained: $trained < $untrained")
  }

  test("ANN recall flag flips when the bucketing degenerates") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    // bound 0.15: LSH recall at this tiny SF is 0.2 (fewer co-bucketed
    // true neighbors than at the graded sf0.01, where it's 0.4 vs bound
    // 0.3) — the spec tests the FLAG MECHANICS, so the bound just has to
    // sit between healthy and degenerate.
    def recall(nBits: Int) = Similarity.recallAtK(emb,
        centPred = col("vec_id") % 125 === 0, probePred = col("vec_id") % 50 === 0,
        k = 3, nBits = nBits, dim = 64, bound = 0.15)
      .collect().map(r => r.getString(0) -> (r.getAs[Double]("recall"), r.getAs[Int]("recall_ok")))
      .toMap
    val good = recall(4)
    // 24 hyperplanes → 2^24 buckets over 500 vectors: every probe is
    // alone in its bucket, recall collapses, the bound flag must flip.
    val bad = recall(24)
    assert(good("lsh")._2 == 1, s"baseline recall unexpectedly low: $good")
    assert(bad("lsh")._1 < good("lsh")._1)
    assert(bad("lsh")._2 == 0, s"degenerate bucketing kept the flag green: $bad")
  }

  test("property: connected components match a union-find reference on random graphs") {
    // Guards the iterative closure (localCheckpoint rounds, convergence
    // cadence) against a driver-side reference. Shapes cover dense
    // clusters, sparse pairs, and a long chain (deep diameter — the
    // cadence's worst case).
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(77)
    for (case_ <- 1 to 4) {
      val n = 30 + rnd.nextInt(40)
      val edges = (case_ match {
        case 1 => (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)) // one chain
        case _ => (1 to n * 2).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
          .filter { case (a, b) => a != b }
      }).distinct
      // union-find reference
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> find(v.toInt).toLong).toMap
      val got = Dedup.connectedComponents(
          edges.toDF("doc_a", "doc_b"), maxIters = 200)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"case $case_ (n=$n, ${edges.size} edges)")
      // pointer doubling must keep the round count LOGARITHMIC in the
      // diameter: the n-node chain (case 1, diameter n−1 ≥ 29) needs
      // ~log₂(n) + slack rounds, where plain min-propagation needs ~n —
      // each round is a driver sync, so this IS the deep-graph scale fix
      if (case_ == 1)
        assert(Dedup.lastClosureRounds <= 12,
          s"chain of $n nodes took ${Dedup.lastClosureRounds} rounds — " +
            "pointer doubling regressed to linear propagation")
    }
  }

  test("pii scrub counts and removes every injected email and phone") {
    val d = docs(3L -> "some plain words here", 4L -> "other text body")
    val dirty = TextAnalysis.injectPii(d)
    val out = TextAnalysis.redactPii(dirty)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(3L) == ((1L, 1L)) && out(4L) == ((1L, 0L)), s"$out")
    // scrubbing the already-scrubbed text finds nothing — the
    // placeholders don't re-match and no PII survives
    val scrubbed = dirty.select(col("doc_id"),
      regexp_replace(regexp_replace(col("t"), TextAnalysis.EmailRe, "[EMAIL]"),
        TextAnalysis.PhoneRe, "[PHONE]").as("t"))
    val again = TextAnalysis.redactPii(scrubbed)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(again.forall(_ == ((0L, 0L))), s"PII survived the scrub: ${again.toSeq}")
  }

  test("hashed classifier score equals the md5-weight sum of unigram+bigram features") {
    // reference weight: integer value of the first 3 hex nibbles of
    // md5(feature) minus 2048 — recomputed here with java.security.MessageDigest
    def w(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(3), 16) - 2048L
    }
    val t1 = "The  Quick brown fox"
    val t2 = "hello"
    val d = docs(1L -> t1, 2L -> t2)
    val out = TextAnalysis.hashedClassifier(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    val f1 = Seq("the", "quick", "brown", "fox") ++
      Seq("the quick", "quick brown", "brown fox")
    val s1 = f1.map(w).sum
    assert(out(1L) == ((7L, s1, s1 * 1000L >= -50L * 7L)), s"${out(1L)} vs $s1")
    assert(out(2L) == ((1L, w("hello"), w("hello") * 1000L >= -50L)))
  }

  test("classifierGate column form ≡ hashedClassifier verdict on the corpus") {
    val d = graft.sources.Tables.documents(spark, sfDir)
    val viaOp = TextAnalysis.hashedClassifier(d)
      .select("doc_id", "kept").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val viaGate = d.select(col("doc_id"),
        TextAnalysis.classifierGate(col("text")).as("kept")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(viaOp == viaGate)
    assert(viaGate.values.exists(identity) && viaGate.values.exists(!_),
      "fixture should exercise both verdicts")
  }

  test("benchmark contamination flags verbatim eval leakage only") {
    val d = docs(
      0L -> "what is the capital of atlantis answer carefully now please",
      1L -> ("intro text first and then what is the capital of atlantis " +
        "answer carefully now please copied verbatim into training data"),
      2L -> "entirely unrelated words nothing shared with the benchmark at all")
    val out = Dedup.benchmarkContamination(d, isBench = id => id === 0L, k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(!out.contains(0L), "benchmark docs must not appear in the output")
    assert(out(1L)._2 == 1 && out(1L)._1 >= 1, s"leak not flagged: $out")
    assert(out(2L) == ((0L, 0)), s"clean doc falsely flagged: $out")
  }

  test("hot-bucket cap bounds candidate volume on a templated family") {
    // 40 byte-identical boilerplate docs: identical signatures, so every
    // band is one 40-member bucket — the uncapped join pays C(40,2) = 780
    // pairs; the capped flow must emit ZERO pairs for the family and
    // decide it wholesale (keep min id, drop rest via the cap).
    val template = "quarterly report boilerplate header the same every time " * 3
    val family = (0L until 40L).map(i => i -> template)
    val extras = Seq(
      100L -> ("genuinely unique first payload body words " * 3),
      101L -> ("another unrelated document text entirely here " * 3))
    val d = docs((family ++ extras): _*)
    val uncapped = Dedup.minhashLshCandidates(d).count()
    assert(uncapped >= 780, s"family should produce >=780 uncapped pairs, got $uncapped")
    val capped = Dedup.minhashLshCandidatesCapped(d, bucketCap = 5).count()
    assert(capped <= uncapped - 780,
      s"cap did not remove the family's m^2 pairs: $capped vs $uncapped")
    val dec = Dedup.minhashDedupDecisionsCapped(d, estThreshold = 0.5, bucketCap = 5)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(dec(0L) == ((0, 0)), "family minimum must be kept")
    for (i <- 1L until 40L)
      assert(dec(i) == ((1, 1)), s"family member $i should drop via the cap")
    assert(dec(100L) == ((0, 0)) && dec(101L) == ((0, 0)))
    // with the cap above every bucket size, decisions match the uncapped policy
    val base = Dedup.minhashDedupDecisions(d, estThreshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val wide = Dedup.minhashDedupDecisionsCapped(d, estThreshold = 0.5, bucketCap = 1000)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(wide == base, "cap above all bucket sizes must reduce to the pairwise policy")
  }

  test("multimodal decode dispatches real codecs per modality") {
    val meta = Multimodal.decode(Multimodal.mediaTable(
      docs(0L -> "abc", 1L -> "defghij", 2L -> "xy"))).collect()
    assert(meta.map(_.mime).sorted.toSeq == Seq("audio/wav", "image/png", "video/mp4"))
    val img = meta.find(_.doc_id == 0L).get   // PNG: 1×1 fixture, 1 frame
    assert(img.width == 1 && img.height == 1 && img.n_frames == 1)
    val aud = meta.find(_.doc_id == 1L).get   // WAV: 64 + 1%128 PCM frames
    assert(aud.width == 0 && aud.height == 0 && aud.n_frames == 65)
    val vid = meta.find(_.doc_id == 2L).get   // MP4: tkhd dims, mvhd duration
    assert(vid.width == 18 && vid.height == 18 && vid.n_frames == 10)
  }

  test("mp4 box walk parses real ISO-BMFF bytes") {
    val spark2 = spark
    import spark2.implicits._
    val ids = Seq(0L, 20L, 140L).toDF("doc_id")
    val out = Multimodal.decodeMp4(Multimodal.encodeMp4(ids)).collect()
    for (m <- out) {
      val id = m.doc_id
      assert(m.brand == "isom" && m.ok_ftyp == 1)
      assert(m.timescale == 24)
      assert(m.duration_units == 8 + id % 24, s"doc $id duration")
      assert(m.n_tracks == 1 + id % 3, s"doc $id tracks")
      assert(m.width == 16 + id % 112 && m.height == 16 + id % 64, s"doc $id dims")
    }
  }

  test("exactSubstringSpans: planted spans, within-doc repeats, island merge/split") {
    // k = 3. Docs 1/2 share the 4-token span "a b c d" (cross-doc);
    // doc 3 is one periodic repeat (every window duplicated ⇒ full-doc
    // span); doc 4 has no repeats; doc 5 contains "a b c" twice with a
    // gap ⇒ two separate islands (the merge must NOT bridge them).
    val d = docs(
      1L -> "a b c d e f g h",
      2L -> "x y z a b c d q r s",
      3L -> "u v w u v w u v w",
      4L -> "pp qq rr ss tt",
      5L -> "a b c mm nn oo pp2 a b c")
    val out = Dedup.exactSubstringSpans(d, k = 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(1L) == ((8L, 4L, 1L, 0.5)))     // span [0,4) = "a b c d"
    assert(out(2L) == ((10L, 4L, 1L, 0.4)))    // span [3,7) = "a b c d"
    assert(out(3L) == ((9L, 9L, 1L, 1.0)))     // whole doc one merged span
    assert(out(4L) == ((5L, 0L, 0L, 0.0)))     // untouched
    assert(out(5L) == ((10L, 6L, 2L, 0.6)))    // [0,3) and [7,10), unbridged

    // the removal half: kept streams are exactly the uncovered tokens,
    // in order; a fully-covered doc cleans to the empty stream
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val clean = Dedup.exactSubstringClean(d, k = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(clean(1L) == ((8L, 4L, h("e f g h"))))
    assert(clean(2L) == ((10L, 6L, h("x y z q r s"))))
    assert(clean(3L) == ((9L, 0L, h(""))))
    assert(clean(4L) == ((5L, 5L, h("pp qq rr ss tt"))))
    assert(clean(5L) == ((10L, 4L, h("mm nn oo pp2"))))
  }

  test("zorderKey matches a driver bit-interleave replay; zones nest ranges") {
    val spark2 = spark
    import spark2.implicits._
    val rows = for (a <- 0L until 16L; b <- 0L until 16L) yield (a * 100, b * 7)
    val df = rows.toDF("ca", "cb")
    val out = Layout.zorderKey(df, "ca", "cb", bits = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    val (mn1, mx1) = (0L, 1500L); val (mn2, mx2) = (0L, 105L)
    def bucket(x: Long, mn: Long, mx: Long) =
      math.floor((x - mn).toDouble * 16 / (mx - mn + 1)).toLong
    def interleave(b1: Long, b2: Long) =
      (0 until 4).map(j => (((b1 >> j) & 1) << (2 * j))
        | (((b2 >> j) & 1) << (2 * j + 1))).sum
    rows.foreach { case (a, b) =>
      val expect = interleave(bucket(a, mn1, mx1), bucket(b, mn2, mx2))
      assert(out((a, b)) == expect, s"($a, $b)")
    }
    // zone stats cover every row exactly once
    val zs = Layout.zorderZoneStats(df, "ca", "cb", bits = 4, zoneShift = 4)
      .collect()
    assert(zs.map(_.getAs[Long]("n_rows")).sum == rows.size)
  }

  test("incremental exact-substring: store spans, batch spans, immutable old side") {
    // old corpus: docs 1–2 share nothing internally repeated at k=3
    val old = docs(1L -> "a b c d e f", 2L -> "p q r s t u")
    val store = java.nio.file.Files.createTempDirectory("graft-gramstore-spec-")
      .toString + "/grams"
    Dedup.writeGramStore(old, store, k = 3)
    // new batch: 10 repeats old doc 1's "a b c d" (dup VS STORE);
    // 11 + 12 share "x1 x2 x3 x4" (dup WITHIN BATCH); 13 is fresh
    val batch = docs(
      10L -> "zz1 a b c d zz2 zz3",
      11L -> "x1 x2 x3 x4 m1 m2 m3",
      12L -> "n1 n2 n3 x1 x2 x3 x4",
      13L -> "f1 f2 f3 f4 f5")
    val out = Dedup.exactSubstringSpansIncremental(
        batch, spark.read.parquet(store), k = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet == Set(10L, 11L, 12L, 13L), "new docs only")
    assert(out(10L) == ((7L, 4L, 1L)))  // span [1,5) = "a b c d", via store
    assert(out(11L) == ((7L, 4L, 1L)))  // span [0,4), via batch-mate 12
    assert(out(12L) == ((7L, 4L, 1L)))  // span [3,7)
    assert(out(13L) == ((5L, 0L, 0L)))  // untouched
    // the store grows by append without rewriting old rows, and readers
    // SUM per gram (one row per appended batch)
    val n0 = spark.read.parquet(store).count()
    Dedup.writeGramStore(batch, store, k = 3)
    assert(spark.read.parquet(store).count() > n0)
    // compaction sum-merges to one row per gram and preserves totals —
    // decisions against the compacted store are unchanged
    val preTotals = spark.read.parquet(store).groupBy("gh")
      .agg(sum("cnt").as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Dedup.compactGramStore(spark, store)
    val post = spark.read.parquet(graft.streaming.StoreFs.dataDir(spark, store)).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(post.length == preTotals.size, "one row per gram after compaction")
    assert(post.toMap == preTotals, "compaction must preserve totals")
  }

  test("dHash is exactly invariant under 2x NN upscale + re-encode") {
    import spark.implicits._
    val ids = Seq(10L, 20L, 30L, 40L).toDF("doc_id")
    val hashes = Multimodal.dHashPng(Multimodal.imageCorpus(ids)).collect()
    val byId = hashes.map(h => h.img_id -> h).toMap
    Seq(10L, 20L, 30L, 40L).foreach { id =>
      val o = byId(id)
      val r = byId(id + Multimodal.ResizedOffset)
      assert(o.hash_hi == r.hash_hi && o.hash_lo == r.hash_lo,
        s"upscaled copy of $id must dHash identically")
    }
  }

  test("banded image near-dup equals brute-force Hamming<=3 on all pairs") {
    import spark.implicits._
    val ids = (0L until 200L by 5L).toDF("doc_id")
    val hashes = Multimodal.dHashPng(Multimodal.imageCorpus(ids)).toDF()
    val rows = hashes.collect().map(r =>
      (r.getAs[Long]("img_id"), r.getAs[Long]("hash_hi"), r.getAs[Long]("hash_lo")))
    val brute = for {
      (ai, ahi, alo) <- rows; (bi, bhi, blo) <- rows
      if ai < bi &&
        java.lang.Long.bitCount(ahi ^ bhi) + java.lang.Long.bitCount(alo ^ blo) <= 3
    } yield (ai, bi)
    val nDup = brute.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val shadowed = brute.map(_._2).toSet
    val out = Multimodal.imageNearDup(hashes).collect()
    assert(out.length == rows.length, "one verdict row per image")
    out.foreach { r =>
      val id = r.getAs[Long]("img_id")
      assert(r.getAs[Long]("n_dup") == nDup.getOrElse(id, 0L),
        s"n_dup mismatch for $id")
      assert(r.getAs[Boolean]("kept") == !shadowed.contains(id),
        s"kept mismatch for $id")
    }
    assert(brute.nonEmpty, "fixture must plant at least one duplicate pair")
  }

  test("audio band fingerprint is exactly invariant under x2 gain re-encode") {
    import spark.implicits._
    val ids = Seq(10L, 20L, 30L, 40L).toDF("doc_id")
    val hashes = Multimodal.audioFingerprint(Multimodal.audioCorpus(ids)).collect()
    val byId = hashes.map(h => h.aud_id -> h).toMap
    Seq(10L, 20L, 30L, 40L).foreach { id =>
      val o = byId(id)
      val g = byId(id + Multimodal.GainOffset)
      assert(o.hash_hi == g.hash_hi && o.hash_lo == g.hash_lo,
        s"gain-shifted re-encode of $id must fingerprint identically")
    }
  }

  test("audio near-dup: DC-shifted copies move few bits; banded = brute force") {
    import spark.implicits._
    val ids = (0L until 200L by 5L).toDF("doc_id")
    val hashes = Multimodal.audioFingerprint(Multimodal.audioCorpus(ids)).toDF()
    val rows = hashes.collect().map(r =>
      (r.getAs[Long]("aud_id"), r.getAs[Long]("hash_hi"), r.getAs[Long]("hash_lo")))
    val brute = for {
      (ai, ahi, alo) <- rows; (bi, bhi, blo) <- rows
      if ai < bi &&
        java.lang.Long.bitCount(ahi ^ bhi) + java.lang.Long.bitCount(alo ^ blo) <= 3
    } yield (ai, bi)
    val nDup = brute.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val shadowed = brute.map(_._2).toSet
    val out = Multimodal.audioNearDup(hashes).collect()
    assert(out.length == rows.length, "one verdict row per clip")
    out.foreach { r =>
      val id = r.getAs[Long]("aud_id")
      assert(r.getAs[Long]("n_dup") == nDup.getOrElse(id, 0L),
        s"n_dup mismatch for $id")
      assert(r.getAs[Boolean]("kept") == !shadowed.contains(id),
        s"kept mismatch for $id")
    }
    // most DC-shifted plants must land within the banded radius — the
    // near-dup family is the point of the fixture
    val dcPaired = brute.count { case (a, b) =>
      b >= Multimodal.DcShiftOffset && a == b - Multimodal.DcShiftOffset }
    assert(dcPaired > 10, s"DC-shift family must mostly pair (got $dcPaired)")
  }

  test("video keyframe hashes are identical across a container repack") {
    import spark.implicits._
    val ids = Seq(10L, 20L, 30L, 40L).toDF("doc_id")
    val hashes = Multimodal.videoKeyframeHashes(Multimodal.videoCorpus(ids))
      .collect()
    val byKey = hashes.map(h => (h.vid_id, h.j) -> ((h.hash_hi, h.hash_lo))).toMap
    for (id <- Seq(10L, 20L, 30L, 40L); j <- 0 until 4)
      assert(byKey((id, j)) == byKey((id + Multimodal.RepackOffset, j)),
        s"repacked container of $id frame $j must hash identically " +
          "(the demux must find mdat behind the moved offset)")
  }

  test("video near-dup: banded rollup equals brute-force >=2-frame rule") {
    import spark.implicits._
    val ids = (0L until 200L by 5L).toDF("doc_id")
    val hashes = Multimodal.videoKeyframeHashes(Multimodal.videoCorpus(ids)).toDF()
    val rows = hashes.collect().map(r =>
      (r.getAs[Long]("vid_id"), r.getAs[Int]("j"),
        r.getAs[Long]("hash_hi"), r.getAs[Long]("hash_lo")))
    val framePairs = for {
      (ai, aj, ahi, alo) <- rows; (bi, bj, bhi, blo) <- rows
      if ai < bi && aj == bj &&
        java.lang.Long.bitCount(ahi ^ bhi) + java.lang.Long.bitCount(alo ^ blo) <= 3
    } yield (ai, bi)
    // .toSeq BEFORE collect: Map.collect yielding tuples rebuilds a Map
    // keyed by a_id, silently collapsing a video's partner set to one
    val vidPairs = framePairs.groupBy(identity).toSeq
      .collect { case (p, hits) if hits.size >= 2 => p }
    val nDup = vidPairs.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val shadowed = vidPairs.map(_._2).toSet
    val out = Multimodal.videoNearDup(hashes).collect()
    assert(out.length == rows.map(_._1).distinct.length, "one verdict per video")
    out.foreach { r =>
      val id = r.getAs[Long]("vid_id")
      assert(r.getAs[Long]("n_dup") == nDup.getOrElse(id, 0L),
        s"n_dup mismatch for $id")
      assert(r.getAs[Boolean]("kept") == !shadowed.contains(id),
        s"kept mismatch for $id")
    }
    val repackPaired = vidPairs.count { case (a, b) =>
      b >= Multimodal.RepackOffset && b < Multimodal.VShiftOffset &&
        a == b - Multimodal.RepackOffset }
    assert(repackPaired == 20, s"every repack must pair (got $repackPaired)")
  }
}
