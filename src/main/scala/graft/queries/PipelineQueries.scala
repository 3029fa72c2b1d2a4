package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.sources.Tables._
import graft.operators.{ChunkOps, Scoring}

/** SURVEY §2.13 Q14–Q15: the reference's map-reduce data plane
  * (scatter → redundancy → dedup → gather, R1/R13/R14) and its incentive
  * scoring loop (predicate → fold → L1-normalize, R7–R9).
  *
  * The oracles exploit invariants: the chunk round trip is an identity, so
  * DuckDB verifies the *consequence* (byte-identity count + checksum sums)
  * while Spark actually executes the shuffle pipeline.
  */
object PipelineQueries {

  // --- Q14: chunk split → redundant scatter → dedup → reassemble →
  // byte-identity check (R1/R13/R14; /root/reference/README.md:18-20)
  val q14 = Query(
    "q14_chunk_roundtrip",
    Some("""
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_identical,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             CAST(SUM(length(text)) AS BIGINT) AS total_reassembled_chars
      FROM documents""")
  ) { (s, d) =>
    val docs = documents(s, d).select("doc_id", "text", "n_chars")
    val rt = ChunkOps.roundTrip(docs, "doc_id", "text", k = 8, r = 3, nDest = 32)
    docs.join(rt, "doc_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("reassembled") === col("text"), 1L).otherwise(0L)).as("n_identical"),
        sum(col("n_chars")).as("total_chars"),
        sum(length(col("reassembled")).cast("long")).as("total_reassembled_chars"))
  }

  // --- Q15: scoring pipeline — responses 2*value with deterministic
  // corruption, predicate-score, per-key fold, L1 weights (R7–R9;
  // /root/reference/neurons/validator.py:134-151)
  val q15 = Query(
    "q15_scoring_weights",
    Some("""
      WITH scored AS (
        SELECT user_id,
               CASE WHEN event_id % 97 = 0 THEN 2 * value + 1
                    ELSE 2 * value END AS resp,
               2 * value AS expected
        FROM events),
      per_user AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN resp = expected THEN CAST(1 AS DECIMAL(18,1))
                             ELSE CAST(0 AS DECIMAL(18,1)) END) AS DOUBLE) AS score_sum
        FROM scored GROUP BY user_id)
      SELECT user_id, n_events, score_sum,
             score_sum / n_events AS score_rate,
             score_sum / SUM(score_sum) OVER () AS weight
      FROM per_user
      ORDER BY user_id""")
  ) { (s, d) =>
    // Simulated miner responses: the reference transform is x*2
    // (/root/reference/neurons/miner.py:146); corruption injected on a
    // deterministic key predicate to exercise the scoring filter.
    val responses = events(s, d).select(
      col("user_id"),
      when(col("event_id") % 97 === 0, lit(2) * col("value") + 1)
        .otherwise(lit(2) * col("value")).as("resp"),
      (lit(2) * col("value")).as("expected"))
    val perUser = responses
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(Scoring.scoreCol(col("resp"), col("expected"))).cast(DoubleType).as("score_sum"))
    Scoring.withL1Weight(perUser, col("score_sum"), "weight")
      .select(
        col("user_id"), col("n_events"), col("score_sum"),
        (col("score_sum") / col("n_events")).as("score_rate"),
        col("weight"))
      .orderBy("user_id")
  }

  val all: Seq[Query] = Seq(q14, q15)
}
