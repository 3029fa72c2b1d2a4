package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** BPE-style tokenizer training over the corpus: each round counts
  * adjacent word pairs, picks the globally most frequent pair
  * (deterministic tie-break), and merges its non-overlapping
  * occurrences corpus-wide (`a b` → `a_b`), exactly the
  * count-select-merge loop a byte-pair/word-pair tokenizer trainer
  * runs. Word-level symbols keep the fixture meaningful; the operator
  * shape is identical at byte level.
  *
  * Scale shape per round: one shuffle (pair counts), one
  * TakeOrderedAndProject(1) for the argmax, the 1-row winner broadcast
  * back into a codegen'd `regexp_replace` map pass — the corpus never
  * reaches the driver (the merge pattern is a COLUMN, not a collected
  * scalar). Each round's text is pinned via a scoped cache and
  * materialized before fan-out (two consumers per level — the
  * multiplicative-recompute lesson from the k-means/closure loops); at
  * 100 TB a trainer runs on a corpus sample, which is one `filter`
  * upstream of this operator.
  *
  * Merge semantics are leftmost non-overlapping (both engines' regex
  * replace), and pair SELECTION counts overlapping adjacencies (both
  * engines' shingle lists) — the oracle replays both choices exactly.
  * Output: round, pair, n_merges (one row per round). */
object Tokenizer {

  def bpeTrain(docs: DataFrame, rounds: Int): DataFrame = {
    var t = docs.select(col("doc_id"),
      concat(lit(" "), normText(col("text")), lit(" ")).as("t"))
    var out: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      t = graft.core.Caches.scoped(t)
      t.count() // materialize before the two consumers below fan out
      val grams = t.select(explode(shingles(split(trim(col("t")), " "), 2)).as("g"))
      val top1 = grams.groupBy("g").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("g")).limit(1)
        .select(col("g").as("pair"))
      val withPair = t.crossJoin(broadcast(top1))
      val pat = concat(lit(" "), col("pair"), lit(" "))
      val stat = withPair
        .select(lit(r).as("round"), col("pair"),
          regexp_count(col("t"), pat).cast("long").as("m"))
        .groupBy("round", "pair").agg(sum(col("m")).as("n_merges"))
      out = Some(out.fold(stat)(_.unionAll(stat)))
      t = withPair.select(col("doc_id"),
        regexp_replace(col("t"), pat,
          concat(lit(" "), translate(col("pair"), " ", "_"), lit(" "))).as("t"))
    }
    out.get
  }
}
