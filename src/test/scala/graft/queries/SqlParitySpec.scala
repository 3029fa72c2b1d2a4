package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** SQL-string entry-path parity (SURVEY §2 "API surface"): the inventory
  * is DataFrame-built, but a user of the engine's SQL surface must get
  * identical results from `spark.sql(...)` text. For queries whose oracle
  * SQL is portable ANSI (no DuckDB-only functions), the oracle text itself
  * doubles as the Spark SQL formulation — so this spec runs THE SAME
  * string the DuckDB oracle runs, through Spark's parser/analyzer, and
  * asserts row-identity with the DataFrame build. Covers the portable
  * subset of the core inventory — scans, joins (equi/anti/semi/outer),
  * aggregation, rollup, set ops, windows, top-k, subqueries, GROUPING
  * SETS; x45 covers the extension-function SQL path as a driver-graded
  * query.
  */
class SqlParitySpec extends AnyFunSuite with SparkTest {

  private def parity(name: String): Unit = {
    import graft.sources.Tables
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings"))
      Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
    val q = Inventory.byName(name)
    val viaDf = q.run(spark, sfDir).collect().toSeq
    val viaSql = spark.sql(q.sql.get).collect().toSeq
    assert(viaDf.size == viaSql.size, s"$name: row counts differ")
    assert(viaDf == viaSql, s"$name: SQL text and DataFrame build diverge")
  }

  test("q01 scan/filter/project: SQL text == DataFrame build") { parity("q01_scan_filter_project") }
  test("q02 aggregation: SQL text == DataFrame build") { parity("q02_group_agg") }
  test("q03 join+agg: SQL text == DataFrame build") { parity("q03_join_agg") }
  test("q04 anti join: SQL text == DataFrame build") { parity("q04_anti_join") }
  test("q05 semi join: SQL text == DataFrame build") { parity("q05_semi_join") }
  test("q06 top-k: SQL text == DataFrame build") { parity("q06_topk_customers") }
  test("q07 window rank: SQL text == DataFrame build") { parity("q07_window_rank") }
  test("q08 count distinct: SQL text == DataFrame build") { parity("q08_count_distinct") }
  test("q09 rollup: SQL text == DataFrame build") { parity("q09_rollup") }
  test("q10 set ops: SQL text == DataFrame build") { parity("q10_set_ops") }
  // q16/q12/x19/x20 are covered below via batch-4's lexical dialect
  // shims; still excluded as NOT portable even with a rename: x11/x13
  // (date_diff/epoch micro arithmetic differs structurally), x35
  // (sketch syntax), x40 ([...] array literals), and the
  // dedup/similarity family (md5-slice + list_* functions).
  test("x18 subqueries: SQL text == DataFrame build") { parity("x18_subqueries") }
  test("x23 outer joins: SQL text == DataFrame build") { parity("x23_outer_joins") }
  test("x26 window functions: SQL text == DataFrame build") { parity("x26_window_funcs") }
  test("x28 grouping sets: SQL text == DataFrame build") { parity("x28_grouping_sets") }

  /** [[parity]] with a dialect shim for oracles portable up to one
    * lexical function mapping: DuckDB spells epoch-µs extraction
    * `epoch_us(ts)`, Spark `unix_micros(ts)` — same semantics, so the
    * SAME oracle string modulo that rename exercises the SQL entry
    * path on the newer behavioral-analytics queries too. */
  private def parityMapped(name: String): Unit = {
    import graft.sources.Tables
    for (t <- Seq("events"))
      Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
    val q = Inventory.byName(name)
    val viaDf = q.run(spark, sfDir).collect().toSeq
    // the fixture view registers ts as TIMESTAMP_NTZ; Spark's
    // unix_micros wants TIMESTAMP, so the bare-column form also gains
    // the cast y16's oracle already writes inline
    val viaSql = spark.sql(
      q.sql.get
        .replace("epoch_us(ts)", "epoch_us(CAST(ts AS TIMESTAMP))")
        .replace("epoch_us(", "unix_micros(")).collect().toSeq
    assert(viaDf.size == viaSql.size, s"$name: row counts differ")
    assert(viaDf == viaSql, s"$name: SQL text and DataFrame build diverge")
  }

  test("y16 interval join: oracle text (epoch_us mapped) == DataFrame build") {
    parityMapped("y16_interval_join")
  }
  test("y31 funnel: oracle text (epoch_us mapped) == DataFrame build") {
    parityMapped("y31_funnel")
  }
  test("y33 transitions: oracle text (epoch_us mapped) == DataFrame build") {
    parityMapped("y33_event_transitions")
  }

  // ---- batch 3 (VERDICT r9 item 2): the y38–y48 oracle texts through
  // the SQL entry. parityXform generalizes the shim to the few purely
  // LEXICAL dialect renames these need — every mapping is a 1:1 spelling
  // of the same semantics, so the oracle text still defines the query.
  private def parityXform(name: String)(xform: String => String): Unit = {
    import graft.sources.Tables
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings"))
      Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
    val q = Inventory.byName(name)
    val viaDf = q.run(spark, sfDir).collect().toSeq
    val viaSql = spark.sql(xform(q.sql.get)).collect().toSeq
    assert(viaDf.size == viaSql.size, s"$name: row counts differ")
    assert(viaDf == viaSql, s"$name: SQL text and DataFrame build diverge")
  }

  /** DuckDB `epoch_us` → Spark `unix_micros` (+ the NTZ cast). */
  private val epochUs = (s: String) =>
    s.replace("epoch_us(ts)", "epoch_us(CAST(ts AS TIMESTAMP))")
      .replace("epoch_us(", "unix_micros(")
  /** DuckDB `//` (integer division) → Spark `div`. */
  private val intDiv = (s: String) => s.replace(" // ", " div ")
  /** DuckDB bare `VARCHAR` cast → Spark `STRING`. */
  private val varcharCast = (s: String) => s.replace("AS VARCHAR)", "AS STRING)")

  test("y42 pivot: SQL text == DataFrame build") { parity("y42_pivot") }
  test("y43 unpivot: SQL text == DataFrame build") { parity("y43_unpivot") }
  test("y47 corr/covar: SQL text == DataFrame build") { parity("y47_corr_stats") }
  test("y41 SCD2 dimension: oracle text (epoch_us mapped) == DataFrame build") {
    parityXform("y41_scd2_dimension")(epochUs)
  }
  test("y32 retention cohorts: oracle text (epoch_us, // mapped) == DataFrame build") {
    parityXform("y32_retention_cohorts")(epochUs andThen intDiv)
  }
  test("y34 A/B readout: oracle text (epoch_us, varchar mapped) == DataFrame build") {
    parityXform("y34_ab_test")(epochUs andThen varcharCast)
  }
  test("y46 sliding windows: oracle text (epoch_us, //, unnest mapped) == DataFrame build") {
    parityXform("y46_sliding_window")(epochUs andThen intDiv andThen
      // the two-offset window fan-out: DuckDB's table-function UNNEST
      // over range(0,2) is Spark's lateral explode over sequence(0,1)
      (_.replace(", UNNEST(range(0, 2)) t(k)",
        " LATERAL VIEW explode(sequence(0, 1)) t AS k")))
  }
  test("y48 behavior mart: oracle text (epoch_us, //, varchar mapped) == DataFrame build") {
    parityXform("y48_behavior_mart")(epochUs andThen intDiv andThen varcharCast)
  }
  test("y39 CMS heavy hitters: oracle text (split/explode mapped) == DataFrame build") {
    parityXform("y39_cms_heavy_hitters") { s =>
      s.replace("unnest(string_split(", "explode(split(")
        // Spark regexp string literals escape the backslash; DuckDB's
        // don't — same regex, doubled spelling
        .replace("\\s+", "\\\\s+")
        // Spark's regexp_replace replaces ALL matches by default; its
        // 4th argument is a position, not the 'g' flag
        .replace(", 'g')", ")")
    }
  }

  // ---- batch 4: the remaining portable core queries, each one lexical
  // rename away from the oracle text
  test("x19 percentiles: oracle text (quantile_cont mapped) == DataFrame build") {
    // the x19 'percentile ≡ quantile_cont' contract, exercised through
    // the SQL entry: same continuous-interpolation definition
    parityXform("x19_percentiles")(_.replace("quantile_cont(", "percentile("))
  }
  test("x20 string agg: oracle text (string_agg mapped) == DataFrame build") {
    // Spark 4.1's listagg(DISTINCT …) WITHIN GROUP throws a
    // ClassCastException at analysis; the ordered-distinct semantics
    // map exactly onto the sorted-set spelling instead
    parityXform("x20_string_agg")(_.replace(
      "string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus)",
      "array_join(array_sort(collect_set(l_linestatus)), ',')"))
  }
  test("q16 exact dedup: oracle text (regexp flag mapped) == DataFrame build") {
    parityXform("q16_dedup_exact")(
      _.replace("\\s+", "\\\\s+").replace(", 'g')", ")"))
  }
  test("q12 time buckets: oracle text (strftime mapped) == DataFrame build") {
    parityXform("q12_time_buckets")(_.replace(
      "strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')",
      "date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm:ss')"))
  }
  test("q13 EMA replay closed form: SQL text == DataFrame build") {
    parity("q13_ema_replay")
  }

  // ---- batch 5 (VERDICT r10 #2): the remaining portable stragglers.
  // (The store-served tier y49–y53 runs in SqlParityStoreSpec against
  // store-backed views.) Still excluded as structurally non-portable:
  // y44 (ASOF JOIN syntax), x65/x73 (1-based array-literal indexing +
  // regex flag soup), and the md5/list_* families as before.
  test("q14 chunk roundtrip invariants: SQL text == DataFrame build") {
    parity("q14_chunk_roundtrip")
  }
  test("q15 scoring weights: SQL text == DataFrame build") {
    parity("q15_scoring_weights")
  }
  test("x16 cube: SQL text == DataFrame build") { parity("x16_cube") }
  test("x17 manual pivot: SQL text == DataFrame build") { parity("x17_pivot") }
  test("x30 window frames (ntile/percent_rank/cume_dist/nth_value): SQL text == DataFrame build") {
    parity("x30_window_frames")
  }
  test("x37 salted agg: SQL text == DataFrame build") { parity("x37_salted_agg") }
  test("x69 dataset split: SQL text == DataFrame build") {
    parity("x69_dataset_split")
  }
  test("x24 part predicates: oracle text (regexp_matches mapped) == DataFrame build") {
    // DuckDB spells boolean regex match regexp_matches; Spark
    // regexp_like — same semantics, 1:1 rename
    parityXform("x24_part_predicates")(
      _.replace("regexp_matches(", "regexp_like("))
  }

  // ---- batch 6 (round 11): the rest of the portable tier, including
  // the two stream-store oracles (their texts replay the event log in
  // SQL — so this row proves text ≡ the STORE-SERVED DataFrame path,
  // the strongest parity shape) and the recursive-CTE packer through
  // Spark 4's WITH RECURSIVE. The only remaining exclusions are
  // x11/y14/y15/y37 (DuckDB ASOF JOIN syntax — that operator exists
  // here as the custom exec, not SQL), x35 (the DataFrame side is a
  // t-digest sketch, deliberately NOT equal to the oracle's exact
  // quantile — its error bound is the graded contract), and the very
  // long multi-stage pipeline oracles (x21/x36/x41/x42/x46/x79…):
  // their dialect is the SAME set of renames proven here — shingle
  // slice, explode/split, md5-slice minhash (x01/x02/x03), BM25
  // (x66 + its three store twins) — applied per-text; each additional
  // page-long shim re-proves nothing new.
  test("q08b HLL approx: SQL text == DataFrame build") {
    parity("q08b_hll_approx")
  }
  test("x10 multimodal meta: SQL text == DataFrame build") {
    parity("x10_multimodal_meta")
  }
  test("x14 EMA aggregator closed form: SQL text == DataFrame build") {
    parity("x14_ema_aggregator")
  }
  test("x29 seeded EMA closed form: SQL text == DataFrame build") {
    parity("x29_ema_seeded")
  }
  test("x57 multimodal video meta: SQL text == DataFrame build") {
    parity("x57_multimodal_video")
  }
  test("x70 mixture sampling: SQL text == DataFrame build") {
    parity("x70_mixture_sample")
  }
  test("x12 range join: SQL text == DataFrame build (CTE column aliases + VALUES)") {
    parity("x12_range_join")
  }
  test("x52 salted join: SQL text == DataFrame build (CTE column aliases + VALUES)") {
    parity("x52_salted_join")
  }
  test("x94 z-order layout: SQL text == DataFrame build (bit-shift operators)") {
    parity("x94_zorder_layout")
  }
  test("x38 variant: oracle text (json_extract_string mapped) == DataFrame build") {
    parityXform("x38_variant")(
      _.replace("json_extract_string(", "get_json_object("))
  }
  test("x22 quality sample: oracle text (len/split/regex-flag mapped) == DataFrame build") {
    parityXform("x22_quality_sample") { s =>
      s.replace("len(string_split(", "size(split(")
        .replace("\\s+", "\\\\s+").replace(", 'g')", ")")
    }
  }
  test("x92 mixture weights: oracle text (len/split/regex-flag mapped) == DataFrame build") {
    parityXform("x92_mixture_weights") { s =>
      s.replace("string_split(", "split(")
        .replace("len(ws)", "size(ws)")
        .replace("\\s+", "\\\\s+").replace(", 'g')", ")")
    }
  }
  test("x71 sequence packing: oracle text through Spark WITH RECURSIVE") {
    parityXform("x71_sequence_packing") { s =>
      s.replace("len(string_split(", "size(split(")
        .replace("\\s+", "\\\\s+").replace(", 'g')", ")")
    }
  }
  test("x60 PII redact: oracle text (backslash/len/flag/varchar mapped) == DataFrame build") {
    // the regexes are shared verbatim; Spark's SQL string literals
    // consume backslash escapes that DuckDB's leave alone, so the ONE
    // uniform transform is doubling every backslash — semantics-neutral
    // because every backslash in this text lives inside a regex literal
    parityXform("x60_text_redact") { s =>
      s.replace("\\", "\\\\")
        .replace("len(", "size(")
        .replace(", 'g')", ")")
        .replace("AS VARCHAR)", "AS STRING)")
        // DuckDB regexp_extract_all defaults to the full match; Spark
        // defaults to group 1 (and errors on group-less patterns) —
        // same semantics spelled with the explicit group 0. Both
        // extract_all patterns (and only they) end in a bounded
        // quantifier, so the brace-paren suffix targets exactly them.
        .replace("}')", "}', 0)")
    }
  }

  /** DuckDB 1-based array-literal indexing `[a,b,c][i]` → Spark
    * `element_at(array(a,b,c), i)` (also 1-based — same semantics).
    * The two URL-fixture literals are shared by x65 and x73. */
  private val arrayIndex = (s: String) => s
    .replace("['www.','cdn.','blog.',''][CAST(doc_id % 4 + 1 AS INT)]",
      "element_at(array('www.','cdn.','blog.',''), CAST(doc_id % 4 + 1 AS INT))")
    .replace("['.com','.org','.co.uk'][CAST(doc_id % 3 + 1 AS INT)]",
      "element_at(array('.com','.org','.co.uk'), CAST(doc_id % 3 + 1 AS INT))")

  test("x65 url domains: oracle text (array-index/backslash/flag mapped) == DataFrame build") {
    parityXform("x65_url_domains") { s =>
      arrayIndex(s.replace("\\", "\\\\"))
        .replace(", 'g')", ")")
        .replace("regexp_matches(", "regexp_like(")
        .replace("AS VARCHAR)", "AS STRING)")
    }
  }
  test("x73 domain quota: oracle text (array-index/backslash mapped) == DataFrame build") {
    parityXform("x73_domain_quota") { s =>
      arrayIndex(s.replace("\\", "\\\\"))
        .replace("regexp_matches(", "regexp_like(")
        .replace("AS VARCHAR)", "AS STRING)")
    }
  }

  test("q17 similarity top-k: oracle text (list_dot_product expanded) == DataFrame build") {
    // DuckDB list_dot_product ≡ Spark AGGREGATE(ZIP_WITH(·,·,*), 0.0, +)
    // — both sum strictly left-to-right, so the expansion is
    // bit-identical, not just mathematically equal (the rank order
    // depends on the UNROUNDED cosine)
    def dot(a: String, b: String) =
      s"AGGREGATE(ZIP_WITH($a, $b, (x, y) -> x * y), " +
        "CAST(0 AS DOUBLE), (acc, z) -> acc + z)"
    parityXform("q17_similarity_topk") { s =>
      s.replace("CAST(embedding AS DOUBLE[])", "CAST(embedding AS ARRAY<DOUBLE>)")
        .replace("list_dot_product(av, av)", dot("av", "av"))
        .replace("list_dot_product(pv, pv)", dot("pv", "pv"))
        .replace("list_dot_product(pv, av)", dot("pv", "av"))
    }
  }

  test("x08 tokenization: oracle text (split/len/list_distinct mapped) == DataFrame build") {
    parityXform("x08_text_tokens") { s =>
      s.replace("\\", "\\\\")
        .replace("regexp_split_to_array(", "split(")
        .replace("list_distinct(", "array_distinct(")
        .replace("len(", "size(")
        .replace("')) AS INT) AS rx_tokens", "', 0)) AS INT) AS rx_tokens")
        .replace("'))) AS INT) AS rx_distinct", "', 0))) AS INT) AS rx_distinct")
    }
  }
  test("x07 text quality: oracle text (split/len/list_filter mapped) == DataFrame build") {
    parityXform("x07_text_quality") { s =>
      s.replace("\\", "\\\\")
        .replace(", 'g')", ")")
        .replace("string_split(", "split(")
        .replace("list_filter(", "filter(")
        .replace("list_distinct(", "array_distinct(")
        .replace("len(", "size(")
    }
  }
  test("x40 scalar battery 2: oracle text (date/array dialect mapped) == DataFrame build") {
    parityXform("x40_scalar_battery2") { s =>
      s.replace("date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))",
          "datediff(CAST(ts AS DATE), DATE '2024-01-01')")
        // DuckDB dayofweek: Sunday = 0; Spark dayofweek: Sunday = 1 —
        // the oracle's +1 is exactly the offset between them
        .replace("dayofweek(ts) + 1", "dayofweek(CAST(ts AS TIMESTAMP))")
        .replace("list_contains([value, 2 * value, -value], round(value, 1))",
          "array_contains(array(value, 2 * value, -value), round(value, 1))")
        .replace("list_sort([value, 2 * value, -value])[1]",
          "element_at(sort_array(array(value, 2 * value, -value)), 1)")
        .replace("list_filter([value, 2 * value, -value], x -> x > 0)",
          "filter(array(value, 2 * value, -value), x -> x > 0)")
        .replace("len(", "size(")
    }
  }

  test("x15 json map: oracle text (json_extract_string mapped) == DataFrame build") {
    parityXform("x15_json_map")(
      _.replace("json_extract_string(", "get_json_object("))
  }
  test("x13 sessionize: oracle text (date_diff expanded) == DataFrame build") {
    parityXform("x13_sessionize")(_.replace(
      "date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000",
      "(unix_micros(ts) - unix_micros(lag(ts) OVER w)) > 1800000000"))
  }
  test("x27 sink cadence: oracle text (epoch/strftime mapped) == DataFrame build") {
    parityXform("x27_sink_cadence") { s =>
      s.replace("epoch(rt)", "unix_seconds(CAST(rt AS TIMESTAMP))")
        .replace("epoch(rt0)", "unix_seconds(CAST(rt0 AS TIMESTAMP))")
        .replace("strftime(rt, '%Y-%m-%d %H:%M:%S')",
          "date_format(rt, 'yyyy-MM-dd HH:mm:ss')")
    }
  }
  test("x06 language id: oracle text (explode/split mapped) == DataFrame build") {
    parityXform("x06_text_langid") { s =>
      s.replace("unnest(string_split(", "explode(split(")
        .replace("\\s+", "\\\\s+").replace(", 'g')", ")")
    }
  }
  test("x32 top tokens: oracle text (explode/split mapped) == DataFrame build") {
    parityXform("x32_top_tokens") { s =>
      s.replace("unnest(string_split(", "explode(split(")
        .replace("\\s+", "\\\\s+").replace(", 'g')", ")")
    }
  }
  test("x09 fingerprint: oracle text (slice/array dialect mapped) == DataFrame build") {
    parityXform("x09_text_fingerprint") { s =>
      s.replace("\\s+", "\\\\s+").replace(", 'g')", ")")
        .replace("string_split(", "split(")
        // DuckDB range(1, n) is [1, n); ws[j:j+4] is 1-based INCLUSIVE
        // (5 elements) — Spark sequence is inclusive, slice takes a length
        .replace("range(1, len(ws) - 3)", "sequence(1, size(ws) - 4)")
        .replace("array_to_string(ws[j:j+4], ' ')",
          "array_join(slice(ws, j, 5), ' ')")
        .replace("list_transform(", "transform(")
        .replace("list_distinct(", "array_distinct(")
        .replace("list_aggregate(hs, 'min')", "array_min(hs)")
        .replace("list_aggregate(hs, 'max')", "array_max(hs)")
        .replace("ELSE [] END", "ELSE CAST(array() AS ARRAY<STRING>) END")
        .replace("len(ws)", "size(ws)")
    }
  }

  test("x02 simhash dedup: oracle text (explode/lateral mapped) == DataFrame build") {
    // instr/substr/md5/pow/conv spell identically in both engines; only
    // the tokenizer explode and the table-function lateral need renames
    parityXform("x02_dedup_simhash") { s =>
      s.replace("unnest(string_split(", "explode(split(")
        .replace("\\s+", "\\\\s+").replace(", 'g')", ")")
        .replace("FROM tok, UNNEST(range(0, 16)) AS t(j)",
          "FROM tok LATERAL VIEW explode(sequence(0, 15)) t AS j")
    }
  }

  test("x01 minhash LSH dedup: oracle text (shingle dialect mapped) == DataFrame build") {
    // the md5-slice minhash arithmetic (md5 || md5, substr hex slices,
    // lexicographic MIN) spells identically in Spark; the renames are
    // the tokenizer split, the shingle slice (ws[j:j+2] is 1-based
    // INCLUSIVE = 3 elements = slice(ws, j, 3)), and the
    // DISTINCT-over-generator, which Spark wants as a subquery
    parityXform("x01_dedup_minhash_lsh") { s =>
      s.replace("\\s+", "\\\\s+").replace(", 'g')", ")")
        .replace("string_split(", "split(")
        .replace(
          """sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(ws) - 1),
                 j -> array_to_string(ws[j:j+2], ' '))) AS s
        FROM w WHERE len(ws) >= 3)""",
          """sh AS (
        SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id,
                 explode(transform(sequence(1, size(ws) - 2),
                   j -> array_join(slice(ws, j, 3), ' '))) AS s
          FROM w WHERE size(ws) >= 3))""")
    }
  }

  test("x03 n-gram jaccard dedup: oracle text (shingle dialect mapped) == DataFrame build") {
    parityXform("x03_dedup_ngram_jaccard") { s =>
      s.replace("\\s+", "\\\\s+").replace(", 'g')", ")")
        .replace("string_split(", "split(")
        .replace(
          """sh0 AS (
        SELECT DISTINCT doc_id, lang,
               unnest(list_transform(range(1, len(ws) - 1),
                 j -> array_to_string(ws[j:j+2], ' '))) AS s
        FROM w WHERE len(ws) >= 3)""",
          """sh0 AS (
        SELECT DISTINCT doc_id, lang, s FROM (
          SELECT doc_id, lang,
                 explode(transform(sequence(1, size(ws) - 2),
                   j -> array_join(slice(ws, j, 3), ' '))) AS s
          FROM w WHERE size(ws) >= 3))""")
    }
  }

  /** The BM25 oracle's dialect shim (shared by x66 and its three
    * store-served twins — the same text grades all four). */
  private val bm25Shim = (s: String) =>
    s.replace("\\s+", "\\\\s+").replace(", 'g')", ")")
      .replace("string_split(", "split(")
      .replace("len(ws)", "size(ws)")
      .replace("unnest(ws) AS term", "explode(ws) AS term")

  test("x66 BM25 top-k: oracle text (split/explode mapped) == DataFrame build") {
    parityXform("x66_bm25_topk")(bm25Shim)
  }
  test("y19 BM25 store: oracle text over the corpus == the STORE-SERVED build") {
    parityXform("y19_bm25_store")(bm25Shim)
  }
  test("y20 incremental BM25 store: oracle text == the two-generation STORE-SERVED build") {
    parityXform("y20_bm25_store_incr")(bm25Shim)
  }
  test("y35 stream-built BM25 store: oracle text == the STREAM-STORE-SERVED build") {
    parityXform("y35_bm25_stream_store")(bm25Shim)
  }

  test("y50 SCD2 stream store: oracle text (epoch_us mapped) == the STORE-SERVED build") {
    parityXform("y50_scd2_stream_store")(epochUs)
  }
  test("y53 mart stream store: oracle text (epoch_us, //, varchar mapped) == the STORE-SERVED build") {
    parityXform("y53_mart_stream_store")(
      epochUs andThen intDiv andThen varcharCast)
  }
}
