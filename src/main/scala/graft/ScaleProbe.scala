package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-evidence probe (SCALE.md): measure the dedup/ANN family at
  * sf0.1 and at a synthetic 10× of sf0.1 (~sf1), and print per-query
  * scaling ratios.
  *
  * The 10× corpus is NOT naive replication — copying rows verbatim would
  * give every document 10 exact duplicates and inflate candidate volume
  * ~100× in a way no real corpus does. Instead each replica is an
  * ISOMORPHIC copy in a disjoint similarity space:
  *  - documents: every word is prefixed with a replica tag
  *    (`regexp_replace(text, "(\\S+)", "r<i>_$1")`), so within-replica
  *    shingle structure (and thus dup/near-dup density) is exactly the
  *    original's, while cross-replica shingle sets are disjoint;
  *  - embeddings: a per-replica sign-flip pattern on dimensions — an
  *    isometry, so within-replica cosines are unchanged; cross-replica
  *    vectors decorrelate instead of duplicating.
  *  - doc_id/vec_id offset by r·10⁴ (divisible by every %-predicate
  *    modulus the queries use: 10, 20, 50, 125), so probe/batch/centroid
  *    densities are preserved.
  */
object ScaleProbe {

  private val Family = Seq(
    "q16_dedup_exact", "x01_dedup_minhash_lsh", "x02_dedup_simhash",
    "x03_dedup_ngram_jaccard", "x21_dedup_pipeline", "x25_minhash_agg",
    "x31_dedup_editdistance", "x36_dedup_incremental", "x41_dedup_sigstore",
    "x42_dedup_cluster", "x04_neardup_embedding", "x46_neardup_autolsh",
    "x05_similarity_lsh", "x34_similarity_ivf", "x47_kmeans_codebook",
    "x48_similarity_multiprobe", "x49_lsh_bucket_stats", "x53_pipeline_e2e",
    "x54_ivf_trained", "x56_dedup_incr_cluster", "x58_dedup_bucket_cap",
    "x75_quantized_ivf", "x76_semantic_dedup", "x77_line_dedup",
    "x79_semantic_dedup_auto", "x81_semantic_dedup_incr",
    "x82_semantic_dedup_capped", "x86_exact_substring",
    "x90_semantic_dedup_refined")

  private val Offset = 10000L

  private[graft] def synthesize(spark: SparkSession, base: String,
                                out: String, factor: Int): Unit = {
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val docReps = (0 until factor).map { r =>
      docs.select(
        (col("doc_id") + lit(r * Offset)).as("doc_id"),
        (if (r == 0) col("text")
         else regexp_replace(col("text"), "(\\S+)", s"r${r}_$$1")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    docReps.reduce(_ unionAll _).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")
    val embReps = (0 until factor).map { r =>
      emb.select(
        (col("vec_id") + lit(r * Offset)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(floor(lit(r) / pow(lit(2.0), (i % 4).cast("double"))).cast("int") % 2 === 1,
            -x).otherwise(x)).as("embedding"),
        col("label"))
    }
    embReps.reduce(_ unionAll _).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")
    // events: per-replica user/event id offsets — every replica user owns
    // the ORIGINAL user's exact event series (same ts, same type mix), so
    // per-key as-of/session structure is preserved while the key space
    // grows ×factor (which is how real event stores grow: more users, not
    // longer per-user histories).
    val ev = graft.sources.Tables.events(spark, base)
    val evReps = (0 until factor).map { r =>
      ev.select(
        (col("event_id") + lit(r * 100000000L)).as("event_id"),
        (col("user_id") + lit(r * 1000000L)).as("user_id"),
        col("event_type"), col("ts"), col("value"), col("props"))
    }
    evReps.reduce(_ unionAll _).write.mode("overwrite")
      .parquet(s"$out/events.parquet")
  }

  /** Synthesize the isomorphic ×factor corpus at `out` unless an
    * identical-params corpus is already there (marker file). Shared with
    * [[NotchProbe]] so every probe measures the same synthetic corpus. */
  private[graft] def ensureSynth(spark: SparkSession, base: String,
                                 out: String, factor: Int): Unit = {
    val params = s"factor=$factor base=$base tables=docs,emb,events"
    val marker = new java.io.File(out, "_graft_params")
    if (!marker.exists() ||
        new String(java.nio.file.Files.readAllBytes(marker.toPath)) != params) {
      synthesize(spark, base, out, factor)
      java.nio.file.Files.write(marker.toPath, params.getBytes)
    }
  }

  private def time(spark: SparkSession, name: String, dir: String,
                   reps: Int): Double = {
    val times = (1 to reps).map { _ =>
      graft.core.Caches.releaseAll()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    times.sorted.apply(reps / 2)
  }

  /** Usage: ScaleProbe [factor] [synthDir] [q1,q2,...]
    * The synth corpus is keyed by a params marker (factor + base dir):
    * re-running with different params at the same synthDir resynthesizes
    * instead of silently reusing the previous corpus. Large factors time
    * one rep per query (a 100× run is minutes per query; the signal is
    * the ratio's ORDER, not its third decimal). */
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val synthDir = args.lift(1).getOrElse(s"/tmp/graft-scale-x$factor")
    val queries = args.lift(2).map(_.split(",").toSeq).getOrElse(Family)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.Engine.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-scale"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensureSynth(spark, base, synthDir, factor)
    val reps = if (factor >= 100) 1 else 3
    // one untimed warmup pass per dir (JIT at representative volume)
    queries.foreach { n =>
      SparkEntry.queries(n)(spark, base).write.format("noop").mode("overwrite").save()
      graft.core.Caches.releaseAll(); spark.catalog.clearCache()
    }
    val rows = queries.map { n =>
      val t1 = time(spark, n, base, reps = 3)
      val t10 = time(spark, n, synthDir, reps)
      println(f"""{"query":"$n","base_sec":$t1%.3f,"x${factor}_sec":$t10%.3f,"ratio":${t10 / t1}%.2f}""")
      (n, t1, t10)
    }
    val (tb, ts) = (rows.map(_._2).sum, rows.map(_._3).sum)
    println(f"""{"family_total_base":$tb%.2f,"family_total_x$factor":$ts%.2f,"ratio":${ts / tb}%.2f}""")
    spark.stop()
  }
}
