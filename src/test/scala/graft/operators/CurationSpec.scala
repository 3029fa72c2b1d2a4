package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** Laws for the curation suite: reflow reconstruction, repetition-filter
  * behavior on clean vs boilerplate-injected docs, C4 rules, URL
  * canonicalization, deterministic splits/sampling, packing invariants,
  * BM25 ordering, and int8 quantization error bounds. */
class CurationSpec extends AnyFunSuite with SparkTest {

  private def docs(texts: (Long, String)*) = {
    import spark.implicits._
    texts.toSeq.toDF("doc_id", "text")
  }

  test("reflowLines · join(lines) reconstructs the normalized text") {
    val d = docs(1L -> "The  Quick brown fox jumps over the lazy dog again and again",
      2L -> "one two three", 3L -> ("w " * 17).trim)
    val rebuilt = Curation.reflowLines(d)
      .groupBy("doc_id")
      .agg(array_join(array_sort(collect_list(struct(col("line_id"), col("line"))))
        .getField("line"), " ").as("re"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = d.select(col("doc_id"),
        graft.functions.TextFunctions.normText(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rebuilt == expect)
  }

  test("repetitionStats: unique lines pass, repeated boilerplate fails the gate") {
    import spark.implicits._
    val clean = (0 until 6).map(i => (1L, i, s"unique line number $i"))
    val dirty = clean.map { case (_, i, l) => (2L, i, l) } ++
      (10 until 16).map(i => (2L, i, "subscribe now"))
    val lines = (clean ++ dirty).toDF("doc_id", "line_id", "line")
      .select("doc_id", "line")
    val st = Curation.repetitionStats(lines).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(st(1L).getAs[Boolean]("rep_ok"))
    assert(st(1L).getAs[Double]("dup_line_frac") == 0.0)
    // doc 2: 12 lines, 6 of them the same boilerplate → frac 0.5
    assert(st(2L).getAs[Double]("dup_line_frac") == 0.5)
    assert(!st(2L).getAs[Boolean]("rep_ok"))
  }

  test("topNgramStats matches a hand-computed argmax") {
    val d = docs(1L -> "a b a b a b")
    val r = Curation.topNgramStats(d, 2, 0.20).collect().head
    assert(r.getAs[String]("top_gram") == "a b")
    assert(r.getAs[Long]("top_cnt") == 3L)
    // norm "a b a b a b" = 11 chars; 3 hits × 3 chars / 11
    assert(r.getAs[Double]("top_frac") == 9.0 / 11.0)
    assert(!r.getAs[Boolean]("gram_ok"))
  }

  test("c4Stats: punctuation/min-words line rule and page marker rule") {
    import spark.implicits._
    val lines = Seq(
      (1L, 0, "this line has enough words to survive."),
      (1L, 1, "short line."),                       // < 5 words → dropped
      (1L, 2, "no terminal punctuation here at all"), // no '.' → dropped
      (1L, 3, "another line with plenty of words."),
      (1L, 4, "a third fine line right here."),
      (2L, 0, "lorem ipsum dolor sit amet consectetur."),
      (2L, 1, "this page would otherwise be fine here."),
      (2L, 2, "more good sentences follow this one."),
      (2L, 3, "and another one right after that."))
      .toDF("doc_id", "line_id", "line")
    val st = Curation.c4Stats(lines).collect().map(r => r.getLong(0) -> r).toMap
    assert(st(1L).getAs[Long]("n_kept") == 3L)
    assert(st(1L).getAs[Boolean]("page_kept"))
    assert(st(2L).getAs[Boolean]("has_bad") && !st(2L).getAs[Boolean]("page_kept"))
  }

  test("normalizeUrl strips tracking/fragment/case/trailing-slash, keeps real params") {
    import spark.implicits._
    val cases = Seq(
      "HTTP://WWW.Site1.COM/p/3/" -> "http://www.site1.com/p/3",
      "https://a.org/x?utm_source=f&utm_campaign=c1&id=7" -> "https://a.org/x?id=7",
      "https://a.org/x?utm_source=f&utm_campaign=c1" -> "https://a.org/x",
      "https://b.co.uk/y#frag" -> "https://b.co.uk/y",
      "https://b.co.uk/y?id=2#frag" -> "https://b.co.uk/y?id=2")
    val out = cases.map(_._1).toDF("url")
      .select(WebCuration.normalizeUrl(col("url"))).as[String].collect()
    assert(out.toSeq == cases.map(_._2))
  }

  test("registeredDomain handles multi-part public suffixes") {
    import spark.implicits._
    val cases = Seq(
      "https://www.blog.site3.com/p" -> "site3.com",
      "https://cdn.site9.co.uk/p" -> "site9.co.uk",
      "https://site0.org/p" -> "site0.org")
    val out = cases.map(_._1).toDF("u")
      .select(WebCuration.registeredDomain(col("u"))).as[String].collect()
    assert(out.toSeq == cases.map(_._2))
  }

  test("datasetSplit partitions every doc into exactly one split, stably") {
    val d = graft.sources.Tables.documents(spark, sfDir)
    val s1 = Curation.datasetSplit(d).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1.values.sum == d.count())
    assert(s1.keySet.subsetOf(Set("train", "val", "test")))
    val s2 = Curation.datasetSplit(d).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 == s2)
    // the 80/10/10 cuts should be roughly respected even on a small corpus
    assert(s1("train") > s1.values.sum / 2)
  }

  test("packSequences: bins respect the budget and doc order, cover all docs") {
    val d = graft.sources.Tables.documents(spark, sfDir)
    val budget = 256L
    val packed = Curation.packSequences(d, budget = 256, shardSize = 64).collect()
    assert(packed.length == d.count())
    // per-(shard,bin) sums fit the budget unless a single doc overflows it
    val byBin = packed.groupBy(r => (r.getAs[Long]("shard"), r.getAs[Int]("bin")))
    byBin.foreach { case (_, rs) =>
      val tot = rs.map(_.getAs[Long]("ntok")).sum
      assert(tot <= budget || rs.length == 1)
    }
    // within a shard, bin ids are non-decreasing in doc order and contiguous
    packed.groupBy(_.getAs[Long]("shard")).foreach { case (_, rs) =>
      val bins = rs.sortBy(_.getAs[Long]("doc_id")).map(_.getAs[Int]("bin"))
      assert(bins.head == 0)
      bins.sliding(2).foreach {
        case Array(a, b) => assert(b == a || b == a + 1); case _ => ()
      }
    }
    // greedy: a doc goes to a NEW bin only because it would not have fit
    packed.groupBy(_.getAs[Long]("shard")).foreach { case (_, rs) =>
      val inOrder = rs.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      var bin = 0
      inOrder.foreach { r =>
        val t = r.getAs[Long]("ntok")
        if (r.getAs[Int]("bin") > bin) { assert(cum + t > budget); bin += 1; cum = 0L }
        cum += t
      }
    }
  }

  test("bm25TopK: rarer terms score higher at equal tf; ranking is by score") {
    val d = docs(
      1L -> "apple banana apple banana apple",
      2L -> "apple cherry plum grape melon",
      3L -> "banana kiwi plum grape melon lime fig date pear peach")
    val r = Retrieval.bm25TopK(d, Seq("apple", "banana", "cherry"), k = 3)
      .collect()
    val byTerm = r.groupBy(_.getAs[String]("term"))
    // cherry appears once in the corpus → its idf (and top score) beats
    // apple's top score at the same tf=1 and a shorter doc wins nothing here
    val topApple = byTerm("apple").minBy(_.getAs[Int]("rk"))
    val topCherry = byTerm("cherry").minBy(_.getAs[Int]("rk"))
    assert(topCherry.getAs[Double]("score") > 0)
    // doc 1 has tf=3 for apple → ranks first for apple
    assert(topApple.getAs[Long]("doc_id") == 1L)
    // rk follows (score desc, doc_id) exactly
    byTerm.values.foreach { rows =>
      val sorted = rows.sortBy(r => (-r.getAs[Double]("score"), r.getAs[Long]("doc_id")))
      assert(sorted.map(_.getAs[Int]("rk")).toSeq == (1 to rows.length).toSeq)
    }
  }

  test("phraseSearch: overlapping occurrences count, boundaries hold, ranking by n_occ") {
    val d = docs(
      1L -> "table table table scan",   // "table table" at pos 0 AND 1
      2L -> "fast table table scan",    // once, at pos 1
      3L -> "table fast table scan",    // zero ("table table" never adjacent)
      4L -> "scan fast table")          // "fast table" at the doc tail
    val r = Retrieval.phraseSearch(d,
      Seq(Seq("table", "table"), Seq("fast", "table")), k = 10).collect()
    val tt = r.filter(_.getAs[String]("phrase") == "table table")
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_occ"), x.getAs[Long]("first_pos"), x.getAs[Int]("rk")))
      .toMap
    assert(tt.keySet == Set(1L, 2L))
    assert(tt(1L) == ((2L, 0L, 1)), s"overlap must count twice: $tt")
    assert(tt(2L) == ((1L, 1L, 2)))
    val ft = r.filter(_.getAs[String]("phrase") == "fast table")
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("first_pos")).toMap
    assert(ft == Map(2L -> 0L, 3L -> 1L, 4L -> 1L),
      s"tail occurrence must match: $ft")
  }

  test("banded proximity search == brute-force window count, boundaries inclusive") {
    val d = docs(
      1L -> "fast a b c d table",        // |0-5| = 5 > 4 → no pair
      2L -> "fast a b c table",          // |0-4| = 4 → exactly at the bound
      3L -> "table fast x table",        // both orders count: |1-0|, |1-3|
      4L -> "fast x fast table")         // two a-positions near one b
    val r = Retrieval.proximitySearch(d, Seq(("fast", "table")),
      window = 4, k = 10).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("n_pairs")).toMap
    assert(r == Map(2L -> 1L, 3L -> 2L, 4L -> 2L), s"got $r")
    // brute-force cross-check on the same docs (reference semantics)
    val toks = Map(
      1L -> "fast a b c d table", 2L -> "fast a b c table",
      3L -> "table fast x table", 4L -> "fast x fast table")
      .map { case (id, t) => id -> t.split(" ").toSeq }
    val brute = toks.flatMap { case (id, ws) =>
      val n = (for {
        (a, pa) <- ws.zipWithIndex if a == "fast"
        (b, pb) <- ws.zipWithIndex if b == "table"
        if math.abs(pa - pb) <= 4 && pa != pb
      } yield 1).size
      if (n > 0) Some(id -> n.toLong) else None
    }
    assert(r == brute)
  }

  test("rarest-first phrase planning returns exactly the naive chain's rows") {
    val d = graft.sources.Tables.documents(spark, sfDir)
    val phrases = Seq(Seq("fast", "table"), Seq("value", "table", "part"),
      Seq("table", "table"))
    val naive = Retrieval.phraseSearch(d, phrases, k = 10)
      .collect().map(_.toString).sorted.toSeq
    val planned = Retrieval.phraseSearchRarestFirst(d, phrases, k = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(naive.nonEmpty && naive == planned)
  }

  test("snippets window the normalized tokens around the first hit") {
    val d = docs(
      1L -> "aa bb cc fast table dd ee ff",  // interior hit
      2L -> "fast table xx yy")              // hit at the doc start
    val r = Retrieval.phraseSnippets(d, Seq(Seq("fast", "table")), k = 10,
        context = 2)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        x.getAs[String]("snippet")).toMap
    assert(r(1L) == "bb cc fast table dd ee")
    assert(r(2L) == "fast table xx yy", "window must clamp at both ends")
  }

  test("maxSim ranks subword-similar tokens above unrelated ones") {
    val d = docs(
      1L -> "stream processing node",
      2L -> "quick brown fox jumps",
      3L -> "streaming data here")       // exact-variant match
    val r = Retrieval.maxSimTopK(d, Seq("streaming"), k = 3).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("score"), x.getAs[Int]("rk"))).toMap
    // the exact token maxes out (dot = its own norm²), the stem shares
    // its 4 trigrams, the unrelated doc shares none
    assert(r(3L)._2 == 1, s"exact variant must rank first: $r")
    assert(r(1L)._1 > r(2L)._1,
      s"subword overlap must beat unrelated text: $r")
    assert(r(1L)._2 == 2 && r(2L)._2 == 3)
  }

  test("phraseSearchFromStore answers identically to the scan path") {
    val d = graft.sources.Tables.documents(spark, sfDir)
    val phrases = Seq(Seq("fast", "table"), Seq("table", "part"))
    val path = java.nio.file.Files
      .createTempDirectory("graft-posidx-test-").toString
    Retrieval.writePositionalStore(d, path)
    val scan = Retrieval.phraseSearch(d, phrases, k = 10)
      .collect().map(_.toString).sorted.toSeq
    val store = Retrieval.phraseSearchFromStore(spark, path, phrases, k = 10)
      .collect().map(_.toString).sorted.toSeq
    assert(scan.nonEmpty && scan == store)
  }

  test("int8 quantization: codes bounded, saturation attained, error bounded") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val st = Quantization.int8Stats(emb).collect()
    assert(st.length == emb.count())
    st.foreach { r =>
      val scale = r.getAs[Long]("scale_int")
      val dim = 64L
      // the max-|x| element codes to exactly ±127 → at least one saturated
      assert(r.getAs[Int]("n_sat") >= 1)
      // per-element reconstruction error ≤ scale/254 + 1 µ-units (half a
      // code step + the two half-up roundings)
      val perElem = scale.toDouble / 254.0 + 1.0
      assert(r.getAs[Long]("sse").toDouble <= dim * perElem * perElem)
    }
  }

  test("c4PageGate column form ≡ c4Stats over exploded newline lines") {
    val texts = Seq(
      1L -> (1 to 4).map(i => s"a perfectly fine sentence number $i right here.").mkString("\n"),
      2L -> ("lorem ipsum dolor sit amet consectetur elit.\n" + "good sentence with words aplenty here.\n" * 4),
      3L -> "no punctuation at all\nshort.\nstill nothing",
      4L -> "one good sentence with enough words here.\nsecond good sentence with enough words too.\nthird fine sentence closing the page now.")
    val d = docs(texts: _*)
    val viaCol = d.select(col("doc_id"), Curation.c4PageGate(col("text")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val lines = d.select(col("doc_id"), posexplode(split(col("text"), "\n")))
      .toDF("doc_id", "line_id", "line")
    val viaOp = Curation.c4Stats(lines)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("page_kept")).toMap
    assert(viaCol == viaOp)
    assert(viaCol == Map(1L -> true, 2L -> false, 3L -> false, 4L -> true))
  }

  test("bpeTrain: hand-computed merges — overlap-counted selection, non-overlap merge") {
    // t0: " a b a b c ", " a b x ". Overlapping bigram counts: "a b"×3 →
    // winner. Non-overlapping replace merges ONE "a b" per doc (the
    // second occurrence in doc 1 lost its leading space to the first
    // match) → n_merges=2. Round 2: all pairs tie at 1; "a b" is the
    // lexicographic tie-break winner (' ' < '_') and merges the now
    // re-spaced second occurrence in doc 1 → n_merges=1.
    val d = docs(1L -> "a b a b c", 2L -> "a b x")
    val r = Tokenizer.bpeTrain(d, rounds = 2).orderBy("round").collect()
    assert(r.map(x => (x.getAs[Int]("round"), x.getAs[String]("pair"),
      x.getAs[Long]("n_merges"))).toSeq ==
      Seq((1, "a b", 2L), (2, "a b", 1L)))
  }

  test("quantizedIvfTopK equals brute-force integer top-k restricted to the cell") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val ivf = Quantization.quantizedIvfTopK(emb, col("vec_id") % 64 === 0,
      maxCents = 8, probePred = col("vec_id") % 100 === 0, k = 3).collect()
    // recompute cells + dots in the driver from the same codes
    val codes = Quantization.int8Codes(emb)
      .select(col("vec_id"), col("q")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val cents = codes.keys.filter(_ % 64 == 0).toSeq.sorted.take(8)
    def dot(a: Seq[Long], b: Seq[Long]) = a.zip(b).map { case (x, y) => x * y }.sum
    val cell = codes.map { case (id, q) =>
      id -> cents.map(c => (dot(q, codes(c)), c)).maxBy { case (d, c) => (d, -c) }._2
    }
    ivf.groupBy(_.getAs[Long]("probe_id")).foreach { case (p, rows) =>
      val expect = codes.collect {
        case (id, q) if id != p && cell(id) == cell(p) => (dot(codes(p), q), id)
      }.toSeq.sortBy { case (d, id) => (-d, id) }.take(3)
      val got = rows.sortBy(_.getAs[Int]("rk"))
        .map(r => (r.getAs[Long]("dot"), r.getAs[Long]("neighbor_id"))).toSeq
      assert(got == expect, s"probe $p")
    }
  }

  test("crossDocLineDedup keeps only the first corpus-wide occurrence of a line") {
    import spark.implicits._
    // doc 1 owns A and B; doc 2 repeats B and adds C twice; doc 3 is
    // pure repetition of doc 1 — nothing in it survives.
    val lines = Seq(
      (1L, 0, "line a"), (1L, 1, "line b"),
      (2L, 0, "line b"), (2L, 1, "line c"), (2L, 2, "line c"),
      (3L, 0, "line a"), (3L, 1, "line b"))
      .toDF("doc_id", "line_id", "line")
    val out = Curation.crossDocLineDedup(lines).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((2L, 2L)))           // both lines novel
    assert(out(2L) == ((3L, 1L)))           // only the first "line c" wins
    assert(out(3L) == ((2L, 0L)))           // fully deduplicated away
    val fr = Curation.crossDocLineDedup(lines)
      .filter(col("doc_id") === 3L).select("kept_line_frac", "kept_char_frac")
      .head()
    assert(fr.getDouble(0) == 0.0 && fr.getDouble(1) == 0.0)
  }

  test("semanticDedup verdicts match a driver replay of the integer-cosine rule") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val out = Quantization.semanticDedup(emb, col("vec_id") % 32 === 0, maxCents = 16)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val codes = Quantization.int8Codes(emb)
      .select(col("vec_id"), col("q")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val cents = codes.keys.filter(_ % 32 == 0).toSeq.sorted.take(16)
    def dot(a: Seq[Long], b: Seq[Long]) = a.zip(b).map { case (x, y) => x * y }.sum
    val cell = codes.map { case (id, q) =>
      id -> cents.map(c => (dot(q, codes(c)), c)).maxBy { case (d, c) => (d, -c) }._2
    }
    val expectKept = codes.map { case (id, q) =>
      val n = dot(q, q)
      id -> !codes.exists { case (oid, oq) =>
        oid < id && cell(oid) == cell(id) && {
          val d = dot(q, oq)
          d > 0 && d * d * 10000L >= 2025L * n * dot(oq, oq)
        }
      }
    }
    assert(out == expectKept)
    assert(out.values.count(_ == false) > 0, "fixture should contain semantic dups")
  }

  test("semanticDedupAuto verdicts satisfy the within-cell keep-lowest-id law") {
    // sf0.01: the auto cells are finer than x76's 16 (that is the point),
    // so the smaller sf0.001 fixture has no same-cell close pair to drop
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val out = Quantization.semanticDedupAuto(emb, targetOcc = 16, maxBits = 20,
        dim = 64).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    val codes = Quantization.int8Codes(emb)
      .select(col("vec_id"), col("q")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def dot(a: Seq[Long], b: Seq[Long]) = a.zip(b).map { case (x, y) => x * y }.sum
    // cell derivation is pinned by the x46 specs + the x79 oracle; here
    // verify the VERDICT law against the emitted cells: dropped ⇔ some
    // lower-id same-cell vector passes the integer-cosine τ test
    out.foreach { case (id, (cell, nClose, kept)) =>
      val q = codes(id); val n = dot(q, q)
      val lowerClose = out.count { case (oid, (ocell, _, _)) =>
        oid < id && ocell == cell && {
          val d = dot(q, codes(oid))
          d > 0 && d * d * 10000L >= 2025L * n * dot(codes(oid), codes(oid))
        }
      }
      assert(nClose == lowerClose && kept == (lowerClose == 0), s"vec $id")
    }
    assert(out.values.exists(!_._3), "fixture should contain semantic dups")
  }

  test("incremental semantic dedup equals a frozen-mask full replay") {
    val sf01 = "/root/testdata/sf0.01"
    val emb = graft.sources.Tables.embeddings(spark, sf01)
    val out = graft.queries.Inventory.byName("x81_semantic_dedup_incr")
      .run(spark, sf01).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getBoolean(3)))).toMap
    // driver replay of the WHOLE contract: frozen mask from the OLD
    // corpus count (autoBits), cells from hyperplane sign bits, τ test on
    // int8 codes; old vectors always count, batch-mates only below the id
    val vecs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    val codes = Quantization.int8Codes(emb)
      .select(col("vec_id"), col("q")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val oldCnt = vecs.keys.count(_ % 10 < 8)
    val nbits = (1 to 20).count(j => oldCnt > 16L * (1L << (j - 1)))
    def cellOf(v: Seq[Double]): Int = (0 until nbits).map { j =>
      val p = graft.functions.VectorFunctions.plane(j, 64)
      val d = v.zip(p).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      if (d >= 0) 1 << j else 0
    }.sum
    val cells = vecs.map { case (id, v) => id -> cellOf(v) }
    def dot(a: Seq[Long], b: Seq[Long]) = a.zip(b).map { case (x, y) => x * y }.sum
    val expect = vecs.keys.filter(_ % 10 >= 8).map { id =>
      val q = codes(id); val n = dot(q, q)
      val nClose = vecs.keys.count { oid =>
        (oid % 10 < 8 || (oid % 10 >= 8 && oid < id)) && oid != id &&
          cells(oid) == cells(id) && {
            val d = dot(q, codes(oid))
            d > 0 && d * d * 10000L >= 2025L * n * dot(codes(oid), codes(oid))
          }
      }.toLong
      id -> ((cells(id), nClose, nClose == 0L))
    }.toMap
    assert(out == expect)
    assert(out.values.exists(!_._3), "fixture should drop at least one new vector")
  }

  test("capped semantic dedup folds a byte-identical hot family wholesale") {
    import spark.implicits._
    val dim = 64
    // 40 identical vectors (one boilerplate embedding family) + 30 spread
    val fam = (0 until 40).map(i => (100L + i, Array.fill(dim)(0.5f)))
    val normals = (0 until 30).map(i =>
      (200L + i, Array.tabulate(dim)(d => (((i * 7 + d * 13) % 17) - 8).toFloat / 8f)))
    val emb = (fam ++ normals).toDF("vec_id", "embedding")
    val capped = Quantization.semanticDedupCapped(emb, targetOcc = 16,
        maxBits = 20, dim = dim, cap = 8).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getBoolean(3)))).toMap
    val uncapped = Quantization.semanticDedupAuto(emb, targetOcc = 16,
        maxBits = 20, dim = dim).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    // the family cell is over the cap: exactly one survivor (the min id),
    // every other member folded with n_close = |cell| - 1
    val famCell = capped(100L)._1
    val cellSize = capped.values.count(_._1 == famCell).toLong
    assert(cellSize >= 40L)
    assert(capped(100L)._2 == 0L && capped(100L)._3)
    (101L until 140L).foreach { id =>
      assert(capped(id) == ((famCell, cellSize - 1L, false)), s"vec $id")
    }
    // outside hot cells the capped flow IS the exact pairwise verdict
    val hotCells = capped.values.groupBy(_._1).collect {
      case (c, vs) if vs.size > 8 => c
    }.toSet
    capped.foreach { case (id, (c, _, kept)) =>
      if (!hotCells.contains(c)) assert(kept == uncapped(id), s"vec $id")
    }
  }

  test("quantizedTopK top-1 equals the argmax of the integer dot product") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val codes = Quantization.int8Codes(emb)
      .select(col("vec_id"), col("q")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val top = Quantization.quantizedTopK(emb, col("vec_id") % 200 === 0, k = 1)
      .collect()
    top.foreach { r =>
      val p = r.getAs[Long]("probe_id")
      val qp = codes(p)
      val best = codes.view.filterKeys(_ != p)
        .map { case (id, q) => (q.zip(qp).map { case (a, b) => a * b }.sum, id) }
        .maxBy { case (dot, id) => (dot, -id) }
      assert(r.getAs[Long]("neighbor_id") == best._2
        && r.getAs[Long]("dot") == best._1)
    }
  }

  test("bpeEncodeStats: token conservation vs the trainer's merge counts") {
    // every merge round replaces n_merges pairs by single symbols, so
    // over the corpus: Σ n_words − Σ n_tokens = Σ n_merges (all rounds)
    val d = docs(1L -> "a b a b c d e", 2L -> "a b x a b", 3L -> "c d c d c d")
    val rounds = 3
    val trained = Tokenizer.bpeTrain(d, rounds).collect()
      .map(_.getAs[Long]("n_merges")).sum
    val enc = Tokenizer.bpeEncodeStats(d, rounds).collect()
    val words = enc.map(_.getAs[Long]("n_words")).sum
    val toks = enc.map(_.getAs[Long]("n_tokens")).sum
    assert(words - toks == trained)
    enc.foreach { r =>
      assert(r.getAs[Long]("n_merged") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Double]("compression")
        == r.getAs[Long]("n_tokens").toDouble / r.getAs[Long]("n_words"))
    }
    // some round merged something on this fixture
    assert(trained > 0 && enc.exists(_.getAs[Long]("n_merged") > 0))
  }

  test("chunkDocs: stride grid, overlap, final-chunk anchoring, one-chunk docs") {
    val size = 6
    val stride = 4
    val d = docs(
      1L -> (1 to 17).map(i => s"w$i").mkString(" "), // 17 toks → 4 chunks
      2L -> "a b c",                                  // under one chunk
      3L -> (1 to 6).map(i => s"t$i").mkString(" "),  // exactly one chunk
      4L -> (1 to 7).map(i => s"u$i").mkString(" "))  // size+1 → 2 chunks
    val r = Retrieval.chunkDocs(d, size, stride).collect()
      .groupBy(_.getAs[Long]("doc_id")).view.mapValues(
        _.sortBy(_.getAs[Int]("chunk_id"))).toMap
    def starts(id: Long) = r(id).map(_.getAs[Long]("start_tok")).toSeq
    def ntoks(id: Long) = r(id).map(_.getAs[Long]("n_toks")).toSeq
    // chunk_id i starts at i·stride; interior chunks are full-size;
    // the final chunk always reaches the last token
    assert(starts(1L) == Seq(0L, 4L, 8L, 12L) && ntoks(1L) == Seq(6L, 6L, 6L, 5L))
    assert(starts(2L) == Seq(0L) && ntoks(2L) == Seq(3L))
    assert(starts(3L) == Seq(0L) && ntoks(3L) == Seq(6L))
    assert(starts(4L) == Seq(0L, 4L) && ntoks(4L) == Seq(6L, 3L))
    // hashes: deterministic md5 of the joined token slice
    val h1 = r(1L).head.getAs[String]("chunk_hash")
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest((1 to 6).map(i => s"w$i").mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(h1 == expect)
  }

  test("bigramLmScore: predictable text beats word soup; verdict splits on the mean") {
    // doc 1 repeats one bigram (high P(b|a) everywhere); doc 2 is all
    // first-occurrence bigrams (probability floor). Trained on both.
    val d = docs(1L -> ("a b " * 12).trim, 2L -> (1 to 25).map(i => s"z$i").mkString(" "))
    val r = Curation.bigramLmScore(d, d).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Double]("avg_logp") > r(2L).getAs[Double]("avg_logp"))
    assert(r(1L).getAs[Double]("avg_logp") <= 0.0)
    assert(r(1L).getAs[Boolean]("lm_ok") && !r(2L).getAs[Boolean]("lm_ok"))
  }

  test("budgetSelect: kept buckets are a best-first prefix within budget") {
    val spark2 = spark
    import spark2.implicits._
    // scores spread over many buckets; ntok varies
    val rows = (1L to 200L).map(i => (i, (i % 37).toDouble / 100.0, 10L + i % 13))
    val df = rows.toDF("doc_id", "sc", "nt")
    val out = Curation.budgetSelect(df, "sc", "nt").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    val budget = rows.map(_._3).sum / 2
    val keptBuckets = out.values.filter(_._3).map(_._1).toSet
    val dropBuckets = out.values.filterNot(_._3).map(_._1).toSet
    // prefix property: every kept bucket outranks every dropped bucket
    if (keptBuckets.nonEmpty && dropBuckets.nonEmpty)
      assert(keptBuckets.min > dropBuckets.max)
    // budget property: kept tokens fit; adding the next bucket would not
    val keptTok = out.values.filter(_._3).map(_._2).sum
    assert(keptTok <= budget)
    if (dropBuckets.nonEmpty) {
      val nextTok = out.values.filter(v => v._1 == dropBuckets.max).map(_._2).sum
      assert(keptTok + nextTok > budget, "boundary bucket should not have fit")
    }
  }

  test("bpeApplyMerges applies the TRAINED merges, not self-derived ones") {
    // trainer sees only the sample (docs 1–2, dominated by "a b"); the
    // encode corpus (doc 10) is dominated by "x y" — a self-training
    // encoder would merge x_y, the trained encoder must merge a_b only
    val sample = docs(1L -> ("a b c " * 6), 2L -> ("a b d " * 4))
    val corpus = docs(10L -> ("x y a b x y " * 3))
    val merges = Tokenizer.bpeTrain(sample, rounds = 2)
    val mergeList = merges.orderBy("round").collect()
      .map(r => r.getInt(0) -> r.getString(1))
    val out = Tokenizer.bpeApplyMerges(corpus, merges, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // driver replay: sequentially apply each trained pair's leftmost-
    // non-overlapping merge to the padded corpus text
    var expect = " " + ("x y a b x y " * 3).trim.replaceAll("\\s+", " ") + " "
    mergeList.foreach { case (_, pair) =>
      expect = expect.replace(s" $pair ", s" ${pair.replace(' ', '_')} ")
    }
    assert(out(10L) == expect)
    assert(out(10L).contains(" a_b "), "trained pair must be applied")
    assert(!out(10L).contains("x_y"),
      "self-derived pair applied — encoder is not using the trained table")
    // and on the shared corpus the trained-table encoder reproduces the
    // self-training form exactly
    val self = Tokenizer.bpeApply(sample, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaTable = Tokenizer.bpeApplyMerges(sample, merges, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(self == viaTable)
  }

  test("bpeDecodeMerges inverts bpeApplyMerges, including nested merges") {
    // corpus engineered so round 2's winning pair CONTAINS round 1's
    // merged symbol ("a b" -> a_b, then "a_b c" -> a_b_c): reverse-order
    // undo must re-expose the inner symbol to its own round's undo
    val d = docs(1L -> ("a b c " * 8), 2L -> ("a b c d " * 3),
      3L -> "e f g h")
    val merges = Tokenizer.bpeTrain(d, rounds = 2)
    val trained = merges.orderBy("round").collect().map(_.getString(1))
    assert(trained(0) == "a b" && trained(1) == "a_b c",
      s"fixture must produce a nested merge, got ${trained.toSeq}")
    val enc = Tokenizer.bpeApplyMerges(d, merges, rounds = 2)
    assert(enc.collect().map(_.getString(1)).exists(_.contains("a_b_c")),
      "round-2 symbol must appear in the encoded text")
    val dec = Tokenizer.bpeDecodeMerges(enc, merges, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1).trim).toMap
    val orig = Seq(1L -> ("a b c " * 8), 2L -> ("a b c d " * 3),
      3L -> "e f g h")
      .map { case (id, t) => id -> t.trim.replaceAll("\\s+", " ") }.toMap
    assert(dec == orig, "decode(encode(x)) must equal normalized x")
  }

  test("bpeDecodeMerges is an identity pass for rounds beyond the table") {
    val d = docs(1L -> ("p q " * 5))
    val merges = Tokenizer.bpeTrain(d, rounds = 1)
    val enc = Tokenizer.bpeApplyMerges(d, merges, rounds = 1)
    // ask for 3 undo rounds against a 1-round table: rounds 3 and 2 must
    // be no-ops (NUL fallback), round 1 undoes the real merge
    val dec = Tokenizer.bpeDecodeMerges(enc, merges, rounds = 3)
      .collect().map(_.getString(1).trim)
    assert(dec.head == ("p q " * 5).trim)
  }

  test("bigramLmScore: OOV bigrams get the smoothed floor under a held-out ref") {
    // ref vocabulary {the, quick, brown, fox}: V = 4, every c1 = 1, only
    // "the quick" / "quick brown" / "brown fox" have c12 = 1. A doc whose
    // bigrams are ALL unseen must still be scored (at the add-one floor),
    // not silently dropped — the held-out-ref deployment depends on it.
    val ref = docs(10L -> "the quick brown fox")
    val d = docs(
      1L -> "zz yy",                  // fully OOV: lp = ln(1/(0+4))
      2L -> "the quick quick the")    // seen + unseen-bigram + unseen-bigram
    val r = Curation.bigramLmScore(d, ref).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r.keySet == Set(1L, 2L), "all-OOV docs must stay in the output")
    assert(math.abs(r(1L).getAs[Double]("avg_logp") - math.log(0.25)) < 1e-5)
    // "the quick": ln(2/5); "quick quick"/"quick the": unseen ⇒ ln(1/5)
    val exp2 = (math.log(0.4) + 2 * math.log(0.2)) / 3
    assert(math.abs(r(2L).getAs[Double]("avg_logp") - exp2) < 1e-5)
    assert(r(1L).getAs[Long]("n_bigrams") == 1L
      && r(2L).getAs[Long]("n_bigrams") == 3L)
  }

  test("dsirSelect: target-vocabulary docs outscore off-target docs; keep rate honors the percentile") {
    // target slice (doc_id ≤ 7) speaks vocabulary A, the rest vocabulary
    // B. A doc written in A must carry a higher mean importance
    // ln p̂_t/p̂_r than a doc written in B — the DSIR law.
    val a = "alpha beta gamma delta epsilon zeta"
    val b = "north south east west upper lower"
    val d = docs((0L to 15L).map { i =>
      i -> (if (i <= 7) a else b)
    }: _*)
    val r = Curation.dsirSelect(d, isTarget = col("doc_id") <= 7)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r.size == 16, "every doc is scored")
    val impA = r(0L).getAs[Long]("imp_mu")
    val impB = r(15L).getAs[Long]("imp_mu")
    assert(impA > impB, s"target-vocab importance $impA must beat off-target $impB")
    // identical texts → identical imp_mu within each group
    assert((0L to 7L).map(r(_).getAs[Long]("imp_mu")).distinct.size == 1)
    // ≥-percentile keep at 0.75 over 16 keys: exactly the top quartile
    // unless ties straddle the threshold (keys are distinct here — the
    // Gumbel draw is injective over these doc_ids)
    val kept = r.values.count(_.getAs[Boolean]("selected"))
    assert(kept >= 4 && kept <= 5, s"expected ~4/16 kept, got $kept")
  }

  test("dsirSelect is append-stable: a doc's importance key ignores corpus growth ordering") {
    // the Gumbel key is a pure function of doc_id — growing the corpus
    // must not reshuffle old docs' draws (the no-RNG policy)
    val d1 = docs(1L -> "alpha beta", 2L -> "north south")
    val d2 = docs(1L -> "alpha beta", 2L -> "north south", 3L -> "alpha gamma")
    def keys(df: org.apache.spark.sql.DataFrame) =
      Curation.dsirSelect(df, isTarget = col("doc_id") === 1L)
        .collect().map(x => x.getAs[Long]("doc_id") ->
          (x.getAs[Double]("gkey") - x.getAs[Long]("imp_mu").toDouble / 1e6 /
            x.getAs[Long]("n_feats"))).toMap
    val g1 = keys(d1); val g2 = keys(d2)
    // the Gumbel component (key − mean importance) is identical per doc
    // up to the round-6 slop of the key itself
    assert(math.abs(g1(1L) - g2(1L)) < 2e-6 && math.abs(g1(2L) - g2(2L)) < 2e-6)
  }

  test("incremental DSIR recovers the full-corpus importance exactly from the count store") {
    // the bucket counts are the estimator's sufficient statistic: store
    // (old slice) + batch counts must give every batch doc the SAME
    // imp_mu as a full-corpus run — bit-exact, not approximate
    val all = (0L to 11L).map(i =>
      i -> (if (i % 2 == 0) "alpha beta gamma" else "north south east west"))
    val d = docs(all: _*)
    val old = docs(all.filter(_._1 < 8): _*)
    val batch = docs(all.filter(_._1 >= 8): _*)
    val path = java.nio.file.Files.createTempDirectory("dsirstore").toString
    Curation.writeDsirStore(old, isTarget = col("doc_id") % 2 === 0, path)
    val full = Curation.dsirSelect(d, isTarget = col("doc_id") % 2 === 0)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("imp_mu")).toMap
    val incr = Curation.dsirSelectIncremental(batch,
        isTarget = col("doc_id") % 2 === 0, spark.read.parquet(path))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("imp_mu")).toMap
    assert(incr.keySet == Set(8L, 9L, 10L, 11L), "only batch docs scored")
    assert(incr.forall { case (id, imp) => full(id) == imp },
      s"incremental imp_mu must equal full-corpus: $incr vs ${full.view.filterKeys(_ >= 8L).toMap}")
  }

  test("DSIR store compaction preserves the statistic in both layouts") {
    import spark.implicits._
    val d1 = docs(1L -> "alpha beta", 2L -> "north south")
    val d2 = docs(3L -> "alpha gamma")
    // batch layout: two generations appended, then compacted
    val p1 = java.nio.file.Files.createTempDirectory("dsircompact").toString
    Curation.writeDsirStore(d1, isTarget = col("doc_id") === 1L, p1)
    Curation.dsirCounts(d2, isTarget = lit(false))
      .write.mode("append").parquet(p1)
    val pre = spark.read.parquet(p1).groupBy("b")
      .agg(sum("ct").as("ct"), sum("cr").as("cr")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    Curation.compactDsirStore(spark, p1)
    val live1 = graft.streaming.StoreFs.dataDir(spark, p1)
    val post = spark.read.parquet(live1).collect()
      .map(r => r.getAs[Long]("b") ->
        ((r.getAs[Long]("ct"), r.getAs[Long]("cr")))).toMap
    assert(post == pre, "compaction must preserve per-bucket totals")
    assert(spark.read.parquet(live1).count() == pre.size, "one row per bucket")
    // streaming layout: batch tags collapse to the -1 sentinel
    val p2 = java.nio.file.Files.createTempDirectory("dsircompact2").toString
    Curation.dsirCounts(d1, isTarget = col("doc_id") === 1L)
      .withColumn("batch_id", lit(0L)).select("batch_id", "b", "ct", "cr")
      .write.mode("overwrite").parquet(p2)
    Curation.dsirCounts(d2, isTarget = lit(false))
      .withColumn("batch_id", lit(1L)).select("batch_id", "b", "ct", "cr")
      .write.mode("append").parquet(p2)
    Curation.compactDsirStore(spark, p2)
    val tags = spark.read
      .parquet(graft.streaming.StoreFs.dataDir(spark, p2))
      .select("batch_id").distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(tags == Seq(-1L), s"compacted stream store must carry the sentinel, got $tags")
  }

  test("hashedEmbedding: exact integer vectors, identical texts collide at cos = 1") {
    val d = docs(1L -> "alpha beta gamma", 2L -> "alpha  BETA gamma",
      3L -> "wholly different words here")
    val r = TextAnalysis.hashedEmbedding(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getSeq[Long](x.fieldIndex("vec")).toList,
          x.getAs[Long]("norm_sq"))).toMap
    // normalization makes 1 and 2 the same feature multiset → same vector
    assert(r(1L)._1 == r(2L)._1 && r(1L)._2 == r(2L)._2)
    assert(r(1L)._1 != r(3L)._1)
    // norm_sq is exactly Σ v²; nnz ≤ feature count
    assert(r(1L)._2 == r(1L)._1.map(v => v * v).sum)
    assert(r(1L)._1.size == TextAnalysis.EmbedDim)
  }

  test("hashedNearDup: duplicate text drops against the lower id, dissimilar text survives") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta epsilon",   // exact dup of 1
      3L -> "qq ww ee rr tt yy uu ii oo pp")    // disjoint vocabulary
    val r = TextAnalysis.hashedNearDup(d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_close"), x.getAs[Boolean]("kept"))).toMap
    assert(r(1L) == ((0L, true)), s"lowest id must survive: $r")
    assert(r(2L)._1 >= 1L && !r(2L)._2, s"exact dup must drop: $r")
    assert(r.size == 3, "every doc gets a verdict")
  }

  test("multi-probe near-dup dominates single-probe: wider neighborhood, same test") {
    import spark.implicits._
    val d = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().take(80)
      .toSeq.toDF("doc_id", "text")
    val sp = TextAnalysis.hashedNearDup(d).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_close")).toMap
    val mp = TextAnalysis.hashedNearDup(d, probeHamming = 3).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_close")).toMap
    assert(sp.keySet == mp.keySet)
    // every single-probe witness is also a Hamming<=3 witness — found
    // sets are monotone in the probe radius, verdicts can only tighten
    assert(sp.forall { case (id, n) => mp(id) >= n },
      "multi-probe must witness at least the single-probe partners")
    assert(mp.values.sum > sp.values.sum,
      "the fixture has cross-cell tau-close pairs the wider probe must find")
  }

  test("auto-radius near-dup: rule picks clamp(round(nbits/3),3,5) and matches fixed radius") {
    import spark.implicits._
    val d = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().take(80)
      .toSeq.toDF("doc_id", "text")
    val auto = TextAnalysis.hashedNearDupAutoRadius(d).collect()
    // 80 docs, targetOcc 8 → nbits = #{j : 80 > 8·2^(j−1)} = 4 →
    // radius = clamp(round(4/3), 3, 5) = 3 on every row
    assert(auto.forall(r => r.getAs[Int]("nbits") == 4 &&
      r.getAs[Int]("radius") == 3), "rule must pick nbits 4 → radius 3")
    // and the verdicts under the chosen radius are EXACTLY the fixed
    // radius-3 operator's — the 6-band runtime-radius plan changes the
    // candidate decomposition, never the pair set
    val fixed = TextAnalysis.hashedNearDup(d, probeHamming = 3).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_close"),
        r.getAs[Boolean]("kept"))).toMap
    assert(auto.map(r => r.getLong(0) -> (r.getAs[Long]("n_close"),
      r.getAs[Boolean]("kept"))).toMap == fixed,
      "auto at radius 3 must equal fixed radius 3")
    // the integer rounding form (2·nbits+3) div 6 IS round(nbits/3):
    // spot-pin the ladder the measurement used
    for ((nb, want) <- Seq(6 -> 3, 9 -> 3, 12 -> 4, 13 -> 4, 14 -> 5, 16 -> 5))
      assert(math.min(5, math.max(3, (2 * nb + 3) / 6)) == want,
        s"rule at nbits $nb must be $want")
  }

  test("auto-cap near-dup: notch promotion fires on the count rule, both regimes exact") {
    import spark.implicits._
    val d = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().take(80)
      .toSeq.toDF("doc_id", "text")
    // 80 docs with scaled-down dials (targetOcc 1, lowCap 3, highCap 5):
    // the notch threshold is 1·2^3 = 8 < 80, so the cap PROMOTES to 5 and
    // nbits = min(#{j ≤ 5 : 80 > 2^(j−1)}, 5) = 5; the radius rule gives
    // clamp((2·5+3) div 6, 3, 5) = 3
    val promoted = TextAnalysis.hashedNearDupAutoCap(d,
      targetOcc = 1, lowCap = 3, highCap = 5).collect()
    assert(promoted.forall(r => r.getAs[Int]("cap") == 5 &&
      r.getAs[Int]("nbits") == 5 && r.getAs[Int]("radius") == 3),
      "80 docs past the scaled notch must promote to cap 5, nbits 5")
    // below the notch (targetOcc 8, lowCap 12: threshold 32768) the same
    // corpus keeps the standing cap and the verdicts coincide with the
    // y10 auto-radius operator's — the promotion dial is a no-op there
    val below = TextAnalysis.hashedNearDupAutoCap(d).collect()
    assert(below.forall(r => r.getAs[Int]("cap") == 12 &&
      r.getAs[Int]("nbits") == 4 && r.getAs[Int]("radius") == 3),
      "below the notch the cap must stay 12, nbits 4")
    val auto = TextAnalysis.hashedNearDupAutoRadius(d).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_close"),
        r.getAs[Boolean]("kept"))).toMap
    assert(below.map(r => r.getLong(0) -> (r.getAs[Long]("n_close"),
      r.getAs[Boolean]("kept"))).toMap == auto,
      "below the notch auto-cap verdicts must equal auto-radius verdicts")
    // promoted-regime verdicts equal brute force over the 5-bit cells:
    // the banded runtime-radius plan changes decomposition, never pairs
    val cells = promoted.map(r => (r.getLong(0), r.getAs[Int]("cell"))).toMap
    val embNorm = TextAnalysis.hashedEmbedding(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getSeq[Long](1).toArray, r.getAs[Long]("norm_sq")))).toMap
    def tauClose(a: Long, b: Long): Boolean = {
      val (va, na) = embNorm(a); val (vb, nb) = embNorm(b)
      val dot = va.zip(vb).map { case (x, y) => x * y }.sum
      dot > 0 && BigInt(dot) * BigInt(dot) * 10000 >= BigInt(2025) * BigInt(na) * BigInt(nb)
    }
    val ids = cells.keys.toSeq.sorted
    val bruteClose = (for {
      a <- ids; b <- ids
      if a < b && java.lang.Integer.bitCount(cells(a) ^ cells(b)) <= 3 &&
        tauClose(a, b)
    } yield b).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    promoted.foreach { r =>
      assert(r.getAs[Long]("n_close") == bruteClose.getOrElse(r.getLong(0), 0L),
        s"promoted-regime n_close mismatch for ${r.getLong(0)}")
    }
  }

  test("perplexityBuckets: fluent docs land in head, word-soup in tail, all docs bucketed") {
    val ref = docs(10L -> "the quick brown fox jumps over the lazy dog")
    val d = docs(
      1L -> "the quick brown fox jumps",   // bigrams all seen in ref
      2L -> "fox the over lazy quick",     // seen words, unseen bigrams
      3L -> "zz yy xx ww vv")              // fully OOV
    val r = Curation.perplexityBuckets(d, ref).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("ppl_bucket")).toMap
    assert(r.keySet == Set(1L, 2L, 3L), "every doc gets a bucket")
    // the add-one model ranks: seen bigrams ln(2/(c1+V)) > OOV-word floor
    // ln(1/V) > seen-word unseen-bigram ln(1/(c1+V)) — in-vocab word soup
    // is the WORST case (the model knows those words appear in other
    // contexts), fully-OOV sits at the smoothing floor in between
    assert(r(1L) == "head" && r(2L) == "tail" && r(3L) == "middle",
      s"expected fluent=head / in-vocab soup=tail / OOV=middle, got $r")
  }
}
