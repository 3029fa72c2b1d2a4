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

  val all: Seq[Query] = Seq(x15, x16, x38, x45)
}
