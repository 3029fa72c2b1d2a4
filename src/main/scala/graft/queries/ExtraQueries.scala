package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables._
import Hygiene._

/** Additional built-in-surface coverage: structured JSON parsing + map
  * functions, and CUBE grouping sets. */
object ExtraQueries {

  // --- X15: from_json → struct field + map construction/access (§2.9)
  val x15 = Query(
    "x15_json_map",
    Some("""
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS INT) AS k_struct,
             CAST(json_extract_string(props, '$.k') AS INT) AS k_map,
             'k' AS map_keys_str,
             CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket
      FROM events
      ORDER BY event_id""")
  ) { (s, d) =>
    val parsed = events(s, d).select(
      col("event_id"),
      from_json(col("props"), lit("k INT")).getField("k").as("k_struct"))
    parsed.select(
        col("event_id"),
        col("k_struct"),
        element_at(map(lit("k"), col("k_struct")), "k").as("k_map"),
        array_join(map_keys(map(lit("k"), col("k_struct"))), ",").as("map_keys_str"),
        (col("k_struct") % 10).as("k_bucket"))
      .orderBy("event_id")
  }

  // --- X16: CUBE over two dimensions (full grouping-set lattice, §2.5)
  val x16 = Query(
    "x16_cube",
    Some("""
      SELECT COALESCE(l_returnflag, '_ALL_') AS rf,
             COALESCE(l_linestatus, '_ALL_') AS ls,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem
      GROUP BY CUBE(l_returnflag, l_linestatus)
      ORDER BY rf, ls""")
  ) { (s, d) =>
    lineitem(s, d).createOrReplaceTempView("x16_lineitem")
    s.sql("""
      SELECT COALESCE(l_returnflag, '_ALL_') AS rf,
             COALESCE(l_linestatus, '_ALL_') AS ls,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             COUNT(*) AS n_rows
      FROM x16_lineitem
      GROUP BY CUBE(l_returnflag, l_linestatus)
      ORDER BY rf, ls""")
  }

  // --- X38: VariantType (Spark 4 semi-structured type): parse_json →
  // typed variant_get extraction, missing-path null semantics
  // (try_variant_get), and the inferred variant schema. The oracle
  // recovers the same values via plain JSON extraction — the variant
  // encoding itself is engine-internal, but every extracted value is
  // portable.
  val x38 = Query(
    "x38_variant",
    Some("""
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS INT) AS k_typed,
             CAST(NULL AS INT) AS k_missing,
             'OBJECT<k: BIGINT>' AS v_schema
      FROM events
      ORDER BY event_id""")
  ) { (s, d) =>
    val v = parse_json(col("props"))
    events(s, d).select(
        col("event_id"),
        variant_get(v, "$.k", "int").as("k_typed"),
        try_variant_get(v, "$.missing", "int").as("k_missing"),
        schema_of_variant(v).as("v_schema"))
      .orderBy("event_id")
  }

  // --- X45: the SQL-STRING entry path — the whole query is analyzer-
  // parsed `spark.sql(...)` text over a registered temp view, exercising
  // the surface a SQL user hits first: parser → analyzer → the
  // session-extension function registry (`graft_cosine`, injected by
  // GraftExtensions) → the `SelfCosineRewrite` optimizer rule (the
  // `graft_cosine(a.embedding, a.embedding)` column is rewritten to the
  // O(n) zero-scan — SqlEntrySpec pins that). Semantics: cosine between
  // each probe vector and its successor, plus the self-cosine sanity
  // column.
  val x45 = Query(
    "x45_sql_entry",
    Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      pairs AS (
        SELECT a.vec_id AS vec_id, a.v AS pv, b.v AS av
        FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
        WHERE a.vec_id % 10 = 0)
      SELECT vec_id,
             ROUND(CASE WHEN list_dot_product(av, av) = 0
                          OR list_dot_product(pv, pv) = 0 THEN 0.0
                        ELSE list_dot_product(pv, av)
                             / (sqrt(list_dot_product(pv, pv))
                                * sqrt(list_dot_product(av, av))) END, 6) AS cos_next,
             ROUND(CASE WHEN list_dot_product(pv, pv) = 0 THEN 0.0
                        ELSE list_dot_product(pv, pv)
                             / (sqrt(list_dot_product(pv, pv))
                                * sqrt(list_dot_product(pv, pv))) END, 6) AS self_cos
      FROM pairs
      ORDER BY vec_id""")
  ) { (s, d) =>
    embeddings(s, d).createOrReplaceTempView("x45_embeddings")
    s.sql("""
      SELECT a.vec_id AS vec_id,
             ROUND(graft_cosine(a.embedding, b.embedding), 6) AS cos_next,
             ROUND(graft_cosine(a.embedding, a.embedding), 6) AS self_cos
      FROM x45_embeddings a JOIN x45_embeddings b ON b.vec_id = a.vec_id + 1
      WHERE a.vec_id % 10 = 0
      ORDER BY vec_id""")
  }

  // --- X94: Z-ORDER layout key — the multi-column clustering lever for
  // 100 TB pruning: interleave the bits of per-column range buckets
  // (8 bits each from the 1-row broadcast min/max — no collect) so every
  // contiguous zkey ZONE has tight min/max rectangles on BOTH columns,
  // which is exactly what parquet row-group skipping prunes on. Graded:
  // per-zone stats (the file-footer evidence a z-ordered write yields).
  // All arithmetic is BIGINT-exact differences, one IEEE division, and
  // shift/mask interleave — no rounding contract.
  private val ZBits = 8
  private val ZShift = 8
  val x94 = Query(
    "x94_zorder_layout",
    Some {
      def bucketSql(c: String, mn: String, mx: String) =
        s"CAST(floor(CAST(($c - $mn) AS DOUBLE) * ${1 << ZBits} / ($mx - $mn + 1)) AS BIGINT)"
      val inter = (0 until ZBits).map(j =>
        s"(((b1 >> $j) & 1) << ${2 * j}) + (((b2 >> $j) & 1) << ${2 * j + 1})")
        .mkString(" + ")
      s"""
      WITH mm AS (SELECT CAST(min(o_custkey) AS BIGINT) AS mn1,
                         CAST(max(o_custkey) AS BIGINT) AS mx1,
                         CAST(min(o_orderkey) AS BIGINT) AS mn2,
                         CAST(max(o_orderkey) AS BIGINT) AS mx2
                  FROM orders),
      b AS (SELECT o_custkey, o_orderkey,
              ${bucketSql("o_custkey", "mn1", "mx1")} AS b1,
              ${bucketSql("o_orderkey", "mn2", "mx2")} AS b2
            FROM orders, mm),
      z AS (SELECT o_custkey, o_orderkey, CAST($inter AS BIGINT) AS zkey
            FROM b)
      SELECT CAST(zkey >> $ZShift AS BIGINT) AS zone,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(min(o_custkey) AS BIGINT) AS c1_min,
             CAST(max(o_custkey) AS BIGINT) AS c1_max,
             CAST(min(o_orderkey) AS BIGINT) AS c2_min,
             CAST(max(o_orderkey) AS BIGINT) AS c2_max
      FROM z GROUP BY 1 ORDER BY zone"""
    }
  ) { (s, d) =>
    graft.operators.Layout.zorderZoneStats(
        orders(s, d).select("o_custkey", "o_orderkey"),
        "o_custkey", "o_orderkey", bits = ZBits, zoneShift = ZShift)
      .orderBy("zone")
  }

  val all: Seq[Query] = Seq(x15, x16, x38, x45, x94)
}
