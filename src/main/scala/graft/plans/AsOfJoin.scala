package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, NumericType, TimestampNTZType, TimestampType}

/** Whole-operator Catalyst extension (SURVEY §4 item 3, path (c)): as-of
  * join as a first-class plan node with a sorted-merge physical strategy.
  *
  * Semantics: for every LEFT row, attach the single RIGHT row with equal
  * keys and the greatest `rightTime` that is `<` (or `<=` when
  * `allowExact`) the row's `leftTime`, optionally within
  * `leftTime - rightTime <= toleranceUs`; unmatched left rows are dropped
  * (inner) or null-padded (`isOuter`). This is the reference's
  * "latest state snapshot visible at event time" lookup
  * (`/root/reference/neurons/validator.py:110,146` reads the latest
  * in-place state vector as of each scoring round).
  *
  * The composable formulation (`x11_asof_join`) unions both sides into one
  * null-padded frame and runs `last(..., ignoreNulls) over (partition by
  * key order by time rows unbounded preceding)`. That is scale-correct —
  * one shuffle — but every shuffled row carries the union schema (left
  * columns + right columns, half of them null), the window buffers and
  * re-scans frames, and a tolerance bound cannot prune anything. This
  * operator instead plans
  *
  *   Exchange hash(lKeys) → Sort (lKeys, lTime)  ┐
  *                                               ├ AsOfJoinExec (streaming
  *   Exchange hash(rKeys) → Sort (rKeys, rTime)  ┘  per-partition merge)
  *
  * — the SortMergeJoin shape: each side shuffles ONLY its own columns,
  * the merge is a single forward pass holding one buffered right row
  * (O(1) state, no window frame), and both Exchanges disappear entirely
  * when the inputs are already bucketed/sorted by key (the 100 TB layout
  * for an event store). Time values are normalized to epoch-micros longs
  * by the `AsOf.join` API so the merge compares primitives.
  */
final case class AsOfJoinPlan(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    allowExact: Boolean, toleranceUs: Option[Long], isOuter: Boolean,
    rightTieBreak: Seq[SortOrder],
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ (if (isOuter) right.output.map(_.withNullability(true))
                    else right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

final case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    allowExact: Boolean, toleranceUs: Option[Long], isOuter: Boolean,
    rightTieBreak: Seq[SortOrder],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (isOuter) right.output.map(_.withNullability(true))
                    else right.output)

  /** Co-partition both sides on their keys (EnsureRequirements inserts
    * compatible hash Exchanges, or none when bucketing already provides
    * them). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Each partition sorted by (keys, time) — (keys, time, tiebreak) on the
    * right so equal-time candidates resolve deterministically (last in
    * tiebreak order wins, i.e. the MAX tiebreak among equal times). */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTime, Ascending) +: rightTieBreak))

  /** The merge streams left rows through unchanged → left's partitioning
    * and ordering survive for downstream reuse (no re-shuffle when the
    * next operator groups by the same keys). */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output; val rOut = right.output
    val lKeyExprs = leftKeys; val rKeyExprs = rightKeys
    val lTimeExpr = leftTime; val rTimeExpr = rightTime
    val exact = allowExact; val tol = toleranceUs; val outer = isOuter
    val keyTypes: Seq[DataType] = lKeyExprs.map(_.dataType)
    val nRightFields = rOut.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val lTimeB = BindReferences.bindReference(lTimeExpr, lOut)
      val rTimeB = BindReferences.bindReference(rTimeExpr, rOut)
      val nullRight = new GenericInternalRow(nRightFields)
      val joined = new JoinedRow

      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
      def advanceRight(): Unit = { rRow = if (rIter.hasNext) rIter.next() else null }

      // Latest admissible right row for the CURRENT left key. Right rows
      // only ever move forward, so each is copied at most once (when it
      // becomes the candidate) — O(n) copies total, O(1) live state.
      var matched: InternalRow = null
      var matchedKey: UnsafeRow = null
      var matchedTime: Long = 0L

      lIter.flatMap { l =>
        val lKey = lKeyProj(l)
        val lt = lTimeB.eval(l)
        if (lKey.anyNull || lt == null) {
          // SQL key semantics: null keys/times never match.
          if (outer) Iterator.single(joined(l, nullRight).asInstanceOf[InternalRow])
          else Iterator.empty
        } else {
          val lTime = lt.asInstanceOf[Long]
          if (matched != null && keyOrd.compare(matchedKey, lKey) != 0) matched = null
          var continue = true
          while (continue && rRow != null) {
            val c = keyOrd.compare(rKeyProj(rRow), lKey)
            if (c < 0) advanceRight()
            else if (c == 0) {
              val rt = rTimeB.eval(rRow)
              if (rt == null) advanceRight() // API pre-filters; belt and braces
              else {
                val rTime = rt.asInstanceOf[Long]
                if (if (exact) rTime <= lTime else rTime < lTime) {
                  matched = rRow.copy()
                  if (matchedKey == null || keyOrd.compare(matchedKey, lKey) != 0)
                    matchedKey = lKey.copy()
                  matchedTime = rTime
                  advanceRight()
                } else continue = false // right sorted by time: later rows only worse
              }
            } else continue = false
          }
          // Tolerance is monotone in the candidate: the LATEST admissible
          // right row has the smallest gap, so if it fails the bound every
          // earlier one does too — no look-back needed.
          val hit = matched != null && tol.forall(t => lTime - matchedTime <= t)
          if (hit) Iterator.single(joined(l, matched).asInstanceOf[InternalRow])
          else if (outer) Iterator.single(joined(l, nullRight).asInstanceOf[InternalRow])
          else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(lk, rk, lt, rt, exact, tol, outer, tie, l, r) =>
      AsOfJoinExec(lk, rk, lt, rt, exact, tol, outer, tie,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

object AsOf {
  /** DataFrame API over [[AsOfJoinPlan]]. Requires `GraftExtensions`.
    *
    *  - `on`: equi-key column names present on BOTH frames.
    *  - `leftTimeCol`/`rightTimeCol`: timestamp (µs precision) or integer
    *    columns; normalized here to epoch-micros longs.
    *  - Right columns whose names collide with left ones are suffixed
    *    `_r` in the output (and re-aliased regardless, so self-joins get
    *    fresh expression ids — the analyzer never sees a duplicate
    *    attribute across the two sides).
    *  - `rightTieBreak`: extra right columns ordering equal-(key, time)
    *    candidates; the greatest wins. Without it, ties resolve
    *    arbitrarily (exactly like DuckDB's ASOF JOIN).
    *  - Right rows with null keys or time are dropped up front (they can
    *    never match); left nulls yield no match (inner) or null padding
    *    (`outer`).
    */
  def join(left: DataFrame, right: DataFrame, on: Seq[String],
           leftTimeCol: String, rightTimeCol: String,
           allowExact: Boolean = false, toleranceUs: Option[Long] = None,
           outer: Boolean = false, rightTieBreak: Seq[String] = Nil,
           suffix: String = "_r"): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one equi-key")
    val spark = left.sparkSession
    val taken = left.columns.toSet
    def rName(c: String): String = if (taken(c)) c + suffix else c
    val r0 = right.toDF(right.columns.map(rName): _*)
    val onR = on.map(rName)
    val rTimeName = rName(rightTimeCol)
    val r1 = r0.filter(
      (onR.map(col(_).isNotNull) :+ col(rTimeName).isNotNull).reduce(_ && _))

    def asMicros(df: DataFrame, name: String): Column =
      df.schema(name).dataType match {
        case TimestampType => unix_micros(col(name))
        case TimestampNTZType => unix_micros(col(name).cast(TimestampType))
        case _: NumericType => col(name).cast(LongType)
        case dt => throw new IllegalArgumentException(
          s"as-of time column $name: unsupported type $dt")
      }

    // Align right key types to the left's so the merge compares one
    // physical key layout.
    val lKeyTypes = on.map(left.schema(_).dataType)
    def ex(c: Column): Expression = ColumnBridge.expression(spark, c)
    val lKeys = on.map(n => ex(col(n)))
    val rKeys = onR.zip(lKeyTypes).map { case (n, dt) =>
      if (r1.schema(n).dataType == dt) ex(col(n)) else ex(col(n).cast(dt))
    }
    val plan = AsOfJoinPlan(
      lKeys, rKeys,
      ex(asMicros(left, leftTimeCol)), ex(asMicros(r1, rTimeName)),
      allowExact, toleranceUs, outer,
      rightTieBreak.map(n => SortOrder(ex(col(rName(n))), Ascending)),
      left.queryExecution.analyzed, r1.queryExecution.analyzed)
    ColumnBridge.ofRows(spark, plan)
  }

  /** [[join]] with TIME-RANGE SALTING — the hot-key skew mitigation.
    *
    * [[AsOfJoinExec]] clusters each side by its keys, so ONE
    * pathological key's entire history lands on one task (the same
    * property the window formulation has). Here the effective join key
    * becomes (keys, ⌊time/bucketUs⌋): a hot key's rows spread across
    * its time buckets, so parallelism scales with the key's time span
    * instead of pinning at 1.
    *
    * Correctness — the boundary handoff: a left row in bucket b may
    * need the latest right row from an EARLIER bucket. Per (key,
    * bucket) the latest right row (the "winner") is computed with one
    * bucket-keyed window (each window partition holds one bucket's
    * rows — bounded by the bucket width, never the key's history), and
    * each left bucket receives the latest winner from any strictly
    * earlier bucket via a bucket-index as-of join over the winners —
    * a table with ≤ one row per (key, bucket), so that inner join is
    * small and unskewed by construction. The carried row is replicated
    * into the left bucket; in-bucket rights are all later than it, so
    * the final per-bucket merge picks exactly the row the unsalted
    * merge would. Tolerance/exact/outer compose unchanged (the carried
    * candidate still passes through the merge's bound check).
    *
    * `bucketUs` is the skew/replication lever (the y16 banding trade):
    * smaller buckets → more parallelism and more carried replicas
    * (≤ one per populated left bucket). Equal-(key, time) right ties
    * resolve arbitrarily, exactly like [[join]] without a tie-break.
    * Spec-pinned equal to [[join]] on a 10⁶-row single-key history
    * (AsOfJoinSpec). */
  def joinSalted(left: DataFrame, right: DataFrame, on: Seq[String],
                 leftTimeCol: String, rightTimeCol: String, bucketUs: Long,
                 allowExact: Boolean = false,
                 toleranceUs: Option[Long] = None,
                 outer: Boolean = false,
                 suffix: String = "_r"): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val lb = "__graft_asof_bucket"
    def micros(df: DataFrame, name: String): Column =
      df.schema(name).dataType match {
        case TimestampType => unix_micros(col(name))
        case TimestampNTZType => unix_micros(col(name).cast(TimestampType))
        case _: NumericType => col(name).cast(LongType)
        case dt => throw new IllegalArgumentException(
          s"as-of time column $name: unsupported type $dt")
      }
    import org.apache.spark.sql.functions.{expr, row_number}
    // exact integer division (µs longs stay longs — a double division
    // would shave precision near 2^53). `div` truncates toward zero,
    // so pre-epoch times make bucket 0 span (−bucketUs, bucketUs) —
    // still MONOTONE non-decreasing in time, which is all correctness
    // needs; only the widths differ around zero.
    def withBucket(df: DataFrame, t: String): DataFrame =
      df.withColumn("__graft_t_us", micros(df, t))
        .withColumn(lb, expr(s"__graft_t_us div ${bucketUs}L"))
        .drop("__graft_t_us")

    val r0 = withBucket(right.filter(col(rightTimeCol).isNotNull),
      rightTimeCol)
    // latest right per (key, bucket): one window whose partitions hold
    // one BUCKET of one key — the hot key is already split here
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy((on :+ lb).map(col): _*)
      .orderBy(micros(r0, rightTimeCol).desc)
    val winners = r0.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1).drop("__graft_rn")
    // each populated LEFT bucket pulls the latest winner from any
    // strictly earlier bucket (bucket-index as-of over ≤ 1 row per
    // (key, bucket) — bounded, unskewed). Both sides of this inner
    // as-of compare BUCKET indices (the winner's bucket under a
    // non-colliding name).
    val wb = "__graft_winner_bucket"
    val lWithB = withBucket(left, leftTimeCol)
    val leftBuckets = lWithB.select((on :+ lb).map(col): _*).distinct()
    val carriedRaw = join(leftBuckets, winners.withColumnRenamed(lb, wb), on,
      leftTimeCol = lb, rightTimeCol = wb,
      allowExact = false, suffix = "__w")
    // re-assemble carried rows in the RIGHT's own schema, placed into
    // the left bucket they serve
    val carried = carriedRaw.select(
      right.columns.map { c =>
        val n = if (leftBuckets.columns.contains(c)) c + "__w" else c
        col(n).as(c)
      } :+ col(lb): _*)
    val salted = r0.select(right.columns.map(col) :+ col(lb): _*)
      .unionByName(carried)
    join(lWithB, salted, on :+ lb, leftTimeCol, rightTimeCol,
        allowExact, toleranceUs, outer, rightTieBreak = Nil, suffix)
      .drop(lb).drop(lb + suffix)
  }
}
