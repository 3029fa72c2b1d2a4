package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Sentinel-padded normalized text — the working representation of the
    * merge loop (leading/trailing blank lets ` pair ` match at the ends). */
  private def padded(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat(lit(" "), normText(col("text")), lit(" ")).as("t"))

  /** One training round over the cached text `t`: global argmax pair
    * (count DESC, pair ASC over overlapping adjacencies) broadcast back as
    * a 1-row join. Returns the text extended with the `pair` column and
    * the ` pair ` match pattern. */
  private def withTopPair(t: DataFrame): (DataFrame, Column) = {
    val grams = t.select(explode(shingles(split(trim(col("t")), " "), 2)).as("g"))
    val top1 = grams.groupBy("g").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("g")).limit(1)
      .select(col("g").as("pair"))
    (t.crossJoin(broadcast(top1)), concat(lit(" "), col("pair"), lit(" ")))
  }

  /** Leftmost-non-overlapping merge of the round's winning pair
    * (`a b` → `a_b`) as a codegen'd column map pass. */
  private def merged(withPair: DataFrame, pat: Column): DataFrame =
    withPair.select(col("doc_id"),
      regexp_replace(col("t"), pat,
        concat(lit(" "), translate(col("pair"), " ", "_"), lit(" "))).as("t"))

  def bpeTrain(docs: DataFrame, rounds: Int): DataFrame = {
    var t = padded(docs)
    var out: Option[DataFrame] = None
    for (r <- 1 to rounds) {
      t = graft.core.Caches.scoped(t)
      t.count() // materialize before the two consumers below fan out
      val (withPair, pat) = withTopPair(t)
      val stat = withPair
        .select(lit(r).as("round"), col("pair"),
          regexp_count(col("t"), pat).cast("long").as("m"))
        .groupBy("round", "pair").agg(sum(col("m")).as("n_merges"))
      out = Some(out.fold(stat)(_.unionAll(stat)))
      t = merged(withPair, pat)
    }
    out.get
  }

  /** The ENCODE side of the tokenizer: run the same `rounds` merge rounds
    * the trainer runs (same argmax, same leftmost-non-overlapping merge)
    * and return each document's final token stream as text. At 100 TB the
    * trainer runs on a sample but the encoder runs on the full corpus —
    * per round it is one pair-count exchange (sample-sized if `t` is
    * pre-sampled, corpus-sized here because train and encode share the
    * fixture) plus a broadcast-1-row codegen'd map pass over the corpus;
    * the corpus never reaches the driver. */
  def bpeApply(docs: DataFrame, rounds: Int): DataFrame = {
    var t = padded(docs)
    for (_ <- 1 to rounds) {
      t = graft.core.Caches.scoped(t)
      t.count() // materialize before the two consumers (argmax + merge)
      val (withPair, pat) = withTopPair(t)
      t = merged(withPair, pat)
    }
    t
  }

  /** Per-document token accounting after `rounds` of BPE merges: word
    * count before, token count after, how many final tokens are merged
    * symbols, and the compression ratio (int/int — IEEE-exact). Invariant
    * pinned by TokenizerSpec: `n_words − n_tokens` summed over the corpus
    * equals the trainer's total `n_merges` for the same rounds.
    * Output: doc_id, n_words, n_tokens, n_merged, compression. */
  def bpeEncodeStats(docs: DataFrame, rounds: Int): DataFrame = {
    val base = docs.select(col("doc_id"),
      size(words(normText(col("text")))).cast("long").as("n_words"))
    val post = bpeApply(docs, rounds)
      .select(col("doc_id"), split(trim(col("t")), " ").as("ts"))
      .select(col("doc_id"), size(col("ts")).cast("long").as("n_tokens"),
        size(filter(col("ts"), tk => tk.contains("_"))).cast("long").as("n_merged"))
    base.join(post, Seq("doc_id"))
      .withColumn("compression",
        col("n_tokens").cast("double") / col("n_words"))
  }
}
