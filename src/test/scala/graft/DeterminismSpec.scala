package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's correctness gate hashes result values — every graded query
  * must therefore be bit-deterministic across runs AND across parallelism
  * settings (shuffle partition count changes aggregation/accumulation
  * order; the Hygiene rules exist precisely to make that invisible). */
class DeterminismSpec extends AnyFunSuite with SparkTest {

  private def snapshot(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sfDir).collect().map(_.toString).toSeq

  test("every graded query is run-to-run deterministic at sf0.001") {
    val flaky = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      if (snapshot(name) != snapshot(name)) Some(name) else None
    }
    assert(flaky.isEmpty, s"nondeterministic queries: $flaky")
  }

  test("order-sensitive queries survive a shuffle-partition change") {
    val risky = Seq("q02_group_agg", "q13_ema_replay", "q15_scoring_weights",
      "q17_similarity_topk", "x01_dedup_minhash_lsh", "x02_dedup_simhash",
      "x14_ema_aggregator", "x19_percentiles", "x29_ema_seeded",
      "x31_dedup_editdistance", "x32_top_tokens", "x34_similarity_ivf",
      "x35_approx_percentile", "x37_salted_agg", "x39_ngram_generator",
      // round-3: fixpoint label propagation, recall division, adaptive
      // buckets, Lloyd iterations on exact decimal means (the
      // quantization discipline is exactly what this test stresses),
      // salted join, and the composed pipeline
      "x42_dedup_cluster", "x43_ann_recall", "x46_neardup_autolsh",
      "x47_kmeans_codebook", "x52_salted_join", "x53_pipeline_e2e",
      // round-4: trained search (Lloyd + nprobe cell ranking), 4-method
      // recall division, incremental closure (bounded edge set + label
      // propagation over checkpointed rounds), capped band join
      "x54_ivf_trained", "x55_ann_recall_trained", "x56_dedup_incr_cluster",
      "x58_dedup_bucket_cap",
      // round-5: integer-exact quantized flows (assignment argmax,
      // within-cell pair counts) and the winner-regroup line dedup
      "x75_quantized_ivf", "x76_semantic_dedup", "x77_line_dedup",
      "x79_semantic_dedup_auto", "x80_curation_pipeline_v3",
      "x81_semantic_dedup_incr", "x82_semantic_dedup_capped",
      // round-6: span windows + gram counts, packing folds
      // (sort_array collect_list), NB weight training (argmax LIMIT +
      // decimal sums), recall divisions, refined pair counts, store
      // sums, min/max interleave, exact percentiles, bucket windows
      "x86_exact_substring", "x87_export_pipeline",
      "x88_ann_recall_quantized", "x89_classifier_trained",
      "x90_semantic_dedup_refined", "x91_exact_substring_clean",
      "x92_mixture_weights", "x93_exact_substring_incr",
      "x94_zorder_layout", "x95_lm_score_heldout",
      "x96_classifier_select", "x97_budget_select",
      // round-6b: bucket-count λ table + Gumbel percentile; tercile
      // thresholds over decimal-summed means
      "x98_dsir_select", "x99_ppl_buckets", "y01_curation_v4",
      "y02_cluster_quota", "y03_dsir_incr", "y04_hash_embedding",
      "y05_hash_neardup", "y06_hash_recall", "y07_hash_neardup_mp",
      // round-8b: PQ — integer Lloyd rounds (sum/count divisions),
      // argmin assignment ties, LUT partial-agg sums, recall division
      "y21_pq_encode", "y22_pq_adc_recall",
      "y23_phrase_search", "y24_phrase_store", "y25_pq_store_incr",
      "y26_proximity_search", "y27_maxsim_retrieval",
      "y28_phrase_rarest_first", "y29_phrase_snippets",
      "y30_pq_rotated_recall", "y31_funnel", "y32_retention_cohorts",
      "y33_event_transitions", "y34_ab_test",
      // round-9: bucket-salted as-of (carried winners must be invisible
      // at any partitioning), IVFADC (coarse+residual Lloyd, per-cell
      // LUT sums, recall division), the greedy MMR over a collected
      // top-k, forward-fill as-of, exact-stat corr, CMS estimates
      "y36_ivfadc_recall", "y37_asof_salted", "y39_cms_heavy_hitters",
      "y44_resample_ffill", "y45_mmr_rerank", "y47_corr_stats",
      // round-10: store-served hybrid (TopKPerKey tie cuts + integer
      // lexical mass + exact-IVF bound pruning — the survivor cell set
      // may differ per partitioning, the ANSWER must not), stream-built
      // SCD2 store windows, IVFADC served path (per-cell LUT sums),
      // two-generation hybrid stores, stream-served mart (windowed
      // denominators over the reach stores)
      "y49_hybrid_store", "y50_scd2_stream_store", "y51_ivfadc_serve",
      "y52_hybrid_store_incr", "y53_mart_stream_store")
    val before = risky.map(n => n -> snapshot(n)).toMap
    val orig = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      risky.foreach { n =>
        assert(snapshot(n) == before(n), s"$n changed under 7 shuffle partitions")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", orig)
  }
}
