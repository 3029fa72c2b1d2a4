package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deletion-backlog cost probe for the LEXICAL and HYBRID serves at the
  * scale regime (SCALE.md round 16 — VERDICT r15 #3): the r15
  * `DeletionScaleProbe` measured the exact-vec serve's tombstone
  * anti-join through 10⁶–10⁷ backlogs, but the BM25 and hybrid serves —
  * which share the anti-join SHAPE (exclusion on the already-pruned
  * candidate side, never the corpus) — had their curves extrapolated,
  * not measured. This probe measures them: a 10⁷-class document corpus
  * indexed into a BM25 store (plus a same-ids clustered vec store for
  * the hybrid arm), backlogs by fraction, serve medians with the
  * anti-join's physical strategy read off the EXECUTED plan (post-run,
  * so AQE's final choice — the r15 ADVICE discipline), the forced
  * shuffled-anti regime, and purge + post-purge serve.
  *
  * Claims under test: (1) lexical serve overhead tracks the BACKLOG
  * FRACTION — the anti-join runs on the term-pruned candidate rows
  * (|terms|·df), never the postings corpus; (2) the hybrid pays the two
  * arms' exclusions independently and its RRF merge is
  * backlog-invariant; (3) both regimes (broadcast / shuffled anti)
  * track the fraction; (4) purge restores the zero-tombstone serve.
  *
  * Usage: LexicalDeletionScaleProbe [nDocs] [vocab] [termsPerDoc]
  *   [nQueries] [k] [pctsCsv] [reps] [skipHybrid]
  */
object LexicalDeletionScaleProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(16777216L)
    val vocab = args.lift(1).map(_.toInt).getOrElse(65536)
    val termsPerDoc = args.lift(2).map(_.toInt).getOrElse(12)
    val nQueries = args.lift(3).map(_.toInt).getOrElse(64)
    val k = args.lift(4).map(_.toInt).getOrElse(50)
    val pcts = args.lift(5).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(10, 50))
    val reps = args.lift(6).map(_.toInt).getOrElse(3)
    val skipHybrid = args.lift(7).exists(_.toBoolean)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Engine.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-lexical-deletion-scale-probe"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def h(a: Long, b: Long, m: Long): Long =
      ((a * 2654435761L + b * 40503L + 2166136261L) & 0x7fffffffL) % m

    // synthetic corpus: termsPerDoc hashed terms per doc → every term
    // lands in ~nDocs·tpd/vocab docs (the mid-frequency regime where a
    // query's candidate set is thousands of rows, not the corpus)
    val docs = spark.range(nDocs).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until termsPerDoc).map(t =>
        concat(lit("t"), pmod(col("id") * 2654435761L + lit(t * 40503L) +
          lit(2166136261L), lit(vocab.toLong)))): _*).as("text"))

    val idxPath = java.nio.file.Files
      .createTempDirectory("graft-lexdel-idx-").toString
    var t0 = System.nanoTime()
    graft.operators.Retrieval.writeIndexStore(docs, idxPath)
    println(f"""{"index_build_sec":${(System.nanoTime() - t0) / 1e9}%.1f,"n_docs":$nDocs,"vocab":$vocab,"terms_per_doc":$termsPerDoc}""")

    // vec store over the same ids for the hybrid arm (the
    // DeletionScaleProbe clustered geometry; dim 32, 256 members/cell)
    val dim = 32
    val vecPath = java.nio.file.Files
      .createTempDirectory("graft-lexdel-vec-").toString
    if (!skipHybrid) {
      val vecsPerCell = 256
      val nCells = (nDocs / vecsPerCell).toInt
      val nSuper = 64
      val centroids = spark.range(nCells.toLong).select(
        col("id").as("ivf_cell"),
        transform(sequence(lit(0), lit(dim - 1)), j => {
          val s = pmod(col("id"), lit(nSuper.toLong))
          val base = ((s * 2654435761L + j.cast("long") * 40503L +
            lit(2166136261L)).bitwiseAND(lit(0x7fffffffL)) % 200001L) -
            100000L
          val jit = ((col("id") * 97L + j.cast("long") * 31L + 7L)
            .bitwiseAND(lit(0x7fffffffL)) % 4001L) - 2000L
          base + jit
        }).as("ccvm"))
      val cents = graft.core.Caches.scoped(centroids)
      val assigned = cents.select(col("ivf_cell"), col("ccvm"),
          explode(sequence(lit(0), lit(vecsPerCell - 1))).as("j"))
        .select(
          (col("ivf_cell") * vecsPerCell + col("j")).as("vec_id"),
          zip_with(col("ccvm"),
            sequence(lit(0), lit(dim - 1)).cast("array<long>"),
            (c, jj) => c + pmod(col("ivf_cell") * 13L + col("j") * 53L +
              jj * 17L, lit(101L)) - 50L).as("vm"),
          col("ivf_cell"))
      t0 = System.nanoTime()
      graft.operators.ExactIvf.writeVecStoreAssigned(spark, assigned,
        cents, vecPath, iters = 2)
      println(f"""{"vec_build_sec":${(System.nanoTime() - t0) / 1e9}%.1f,"n_cells":$nCells}""")
    }

    // probes live in the doc_id % 100 >= 50 stripe (deletes key on
    // doc_id % 100 < pct, so no pct <= 50 tombstones a probe); each
    // query carries 3 hashed terms + one probe doc for the hybrid arm
    val queries = (0 until nQueries).map { q =>
      val terms = (0 until 3).map(t => s"t${h(q.toLong, 17L + t, vocab.toLong)}")
      var pid = h(q.toLong, 23L, nDocs) / 100 * 100 + 50 + (q % 50)
      if (pid >= nDocs) pid = nDocs - 50
      (q.toLong, terms, pid)
    }

    def planAnti(df: org.apache.spark.sql.DataFrame): String = {
      df.count() // AQE-final plan only exists post-execution (ADVICE r15)
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("LeftAnti"))
        .map(_.trim.dropWhile(!_.isLetter).takeWhile(_ != ' '))
        .toSeq.distinct.mkString("+")
    }

    def serveLex(label: String, backlog: Long): Unit = {
      val anti = planAnti(graft.operators.Retrieval.bm25TopKFromStore(
        spark, idxPath, queries.head._2, k))
      val times = (0 to reps).map { _ =>
        spark.catalog.clearCache()
        graft.core.Caches.releaseAll()
        val t = System.nanoTime()
        queries.take(8).foreach { case (_, terms, _) =>
          require(graft.operators.Retrieval.bm25TopKFromStore(
            spark, idxPath, terms, k).count() > 0)
        }
        (System.nanoTime() - t) / 1e9
      }.drop(1).sorted
      println(f"""{"mode":"bm25_$label","tombs":$backlog,"serve8_sec_median":${times(times.size / 2)}%.2f,"anti_join":"$anti","reps":$reps}""")
    }

    def serveHybrid(label: String, backlog: Long): Unit = {
      if (skipHybrid) return
      val qs = queries.take(8)
      val anti = planAnti(graft.operators.Retrieval
        .hybridRrfBatchFromStores(spark, idxPath, vecPath, qs.take(1),
          kList = k, kOut = 20))
      val times = (0 to reps).map { _ =>
        spark.catalog.clearCache()
        graft.core.Caches.releaseAll()
        val t = System.nanoTime()
        require(graft.operators.Retrieval.hybridRrfBatchFromStores(
          spark, idxPath, vecPath, qs, kList = k, kOut = 20)
          .count() > 0)
        (System.nanoTime() - t) / 1e9
      }.drop(1).sorted
      println(f"""{"mode":"hybrid_$label","tombs":$backlog,"serve8_sec_median":${times(times.size / 2)}%.2f,"anti_join":"$anti","reps":$reps}""")
    }

    serveLex("no_tombstones", 0L)
    serveHybrid("no_tombstones", 0L)
    var prevPct = 0
    for (pct <- pcts.sorted) {
      val del = spark.range(nDocs)
        .filter(pmod(col("id"), lit(100L)) >= prevPct &&
          pmod(col("id"), lit(100L)) < pct)
        .select(col("id").as("doc_id"))
      val td = System.nanoTime()
      graft.operators.Retrieval.deleteFromIndexStore(spark, del, idxPath)
      if (!skipHybrid)
        graft.operators.ExactIvf.deleteFromVecStore(spark,
          del.select(col("doc_id").as("vec_id")), vecPath,
          idCol = "vec_id")
      val backlog = nDocs * pct / 100
      println(f"""{"delete_sec":${(System.nanoTime() - td) / 1e9}%.1f,"backlog":$backlog}""")
      serveLex(s"backlog_${pct}pct", backlog)
      serveHybrid(s"backlog_${pct}pct", backlog)
      prevPct = pct
    }
    // the over-threshold regime, forced (the r15 discipline): at 10⁷⁺
    // tombstones the build side stops broadcasting; AQE re-conversion
    // uses the same threshold, so -1 disables both
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      serveLex(s"backlog_${prevPct}pct_shuffled", nDocs * prevPct / 100)
      serveHybrid(s"backlog_${prevPct}pct_shuffled",
        nDocs * prevPct / 100)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    var tp = System.nanoTime()
    graft.operators.Retrieval.compactIndexStore(spark, idxPath)
    println(f"""{"index_purge_sec":${(System.nanoTime() - tp) / 1e9}%.1f}""")
    if (!skipHybrid) {
      tp = System.nanoTime()
      graft.operators.ExactIvf.compactVecStore(spark, vecPath)
      println(f"""{"vec_purge_sec":${(System.nanoTime() - tp) / 1e9}%.1f}""")
    }
    serveLex("purged", 0L)
    serveHybrid("purged", 0L)
    spark.stop()
  }
}
