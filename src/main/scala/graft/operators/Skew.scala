package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation primitives (100 TB posture, SURVEY §7.5): salting for
  * hot keys where AQE's runtime skew-split isn't available (e.g. a
  * pre-AQE aggregation stage, or a key so hot a single partition spills).
  *
  * Both operators are semantics-preserving rewrites, property-tested
  * against their unsalted forms in SkewSpec.
  */
object Skew {

  /** Two-phase salted sum: groupBy(key, salt) partial → groupBy(key)
    * final. Decimal-exact so the rewrite is bit-equal to the direct sum.
    * The salt must vary per ROW, not per value — a hot key whose rows
    * share one value would otherwise collapse into a single salt bucket;
    * a row-id hash spreads it regardless of the data. */
  def saltedSum(df: DataFrame, key: String, value: Column, outName: String,
                salts: Int): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    df.withColumn("_salt", pmod(hash(monotonically_increasing_id()), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(value.cast(DecimalType(18, 6))).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).cast(DoubleType).as(outName))
  }

  /** Skew-safe broadcast-style join for a hot-keyed fact side: the small
    * side is replicated `salts`× (explode), the fact side gets a random-
    * but-deterministic salt, and the join key becomes (key, salt) — so one
    * hot key spreads over `salts` reducers. Returns fact ⋈ small on
    * `key`. */
  def saltedJoin(fact: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val saltedSmall = small
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    val saltedFact = fact
      .withColumn("_salt", pmod(hash(monotonically_increasing_id()), lit(salts)))
    saltedFact.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
