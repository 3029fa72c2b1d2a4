package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chunk split / scatter / redundancy / dedup / reassembly — the reference's
  * map-reduce broadcast data plane re-expressed on Spark.
  *
  * Reference semantics (cited):
  *  - map: file D split into N chunks, distributed with redundancy, fanned
  *    out N×B — /root/reference/README.md:18-20 (SURVEY R1, R14).
  *  - reduce: chunks gathered and summed/reassembled at the root —
  *    /root/reference/README.md:20 (SURVEY R13).
  *
  * Spark mapping: the scatter is a hash-partitioned Exchange (`repartition`
  * on the destination key) — at 1000 executors that IS the N×B bipartite
  * transfer, executed by the shuffle service. Redundancy is an exploded
  * replica index; replica-dedup picks a deterministic winner (min payload,
  * SURVEY §7.5); reassembly is a sort-within-group concat. Everything is
  * codegen'd built-ins — no UDFs in the row path.
  */
object ChunkOps {

  /** Split `textCol` into `k` contiguous substrings per row.
    * Output: idCol, chunk_id INT, payload STRING. */
  def split(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(
      col(idCol),
      posexplode(expr(
        s"""transform(sequence(0, ${k - 1}),
           |  i -> substring($textCol,
           |         CAST((i * length($textCol)) DIV $k AS INT) + 1,
           |         CAST(((i + 1) * length($textCol)) DIV $k AS INT)
           |           - CAST((i * length($textCol)) DIV $k AS INT)))""".stripMargin))
        .as(Seq("chunk_id", "payload")))

  /** Replicate each chunk `r` times and assign a destination partition by
    * hash — the redundant scatter (R1). The `repartition` is the explicit
    * exchange; on a cluster this is the cross-node broadcast step. */
  def scatter(chunks: DataFrame, idCol: String, r: Int, nDest: Int): DataFrame =
    chunks
      .withColumn("replica", explode(expr(s"sequence(0, ${r - 1})")))
      .withColumn("dest", pmod(hash(col(idCol), col("chunk_id"), col("replica")), lit(nDest)))
      .repartition(col("dest"))

  /** Drop redundant replicas with a deterministic winner per
    * (id, chunk_id): min(payload) — stable even under corrupted replicas. */
  def dedupReplicas(scattered: DataFrame, idCol: String): DataFrame =
    scattered.groupBy(col(idCol), col("chunk_id"))
      .agg(min(col("payload")).as("payload"))

  /** Reassemble chunk payloads in chunk order (R14 inverse). */
  def reassemble(deduped: DataFrame, idCol: String): DataFrame =
    deduped.groupBy(col(idCol))
      .agg(array_join(
        expr("transform(array_sort(collect_list(struct(chunk_id, payload))), x -> x.payload)"),
        "").as("reassembled"))

  /** Full round trip: split → redundant scatter → dedup → reassemble. */
  def roundTrip(df: DataFrame, idCol: String, textCol: String,
                k: Int, r: Int, nDest: Int): DataFrame =
    reassemble(dedupReplicas(scatter(split(df, idCol, textCol, k), idCol, r, nDest), idCol), idCol)
}
