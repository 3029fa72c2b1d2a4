package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Whole-operator Catalyst extension (SURVEY §2.4/§4 path (c)): per-key
  * top-k as a first-class plan node with a two-phase physical strategy.
  *
  * The composable formulation — `row_number().over(Window.partitionBy(key)
  * .orderBy(ord)) <= k` — shuffles EVERY row to its key's partition and
  * fully sorts each partition, then discards all but k rows per key. At
  * 10⁹ candidate rows per probe that sort dominates the stage. This
  * operator instead keeps a bounded heap per key:
  *
  *   partial TopKPerKeyExec (map side, no distribution requirement)
  *     → Exchange hash(key)            [≤ k rows per key per map partition]
  *       → final TopKPerKeyExec        [≤ k rows per key total]
  *
  * — the exact shape of partial→final aggregation, applied to top-k. The
  * shuffle moves at most `k · keys · mapPartitions` rows instead of all
  * rows, and nothing is ever globally sorted.
  */
final case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder],
                                k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

final case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
                                k: Int, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val rowOrd = new LazilyGeneratedOrdering(sortOrder, childOutput)
      // per key: max-heap of the WORST retained row → O(log k) insert
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      while (it.hasNext) {
        val row = it.next() match {
          case u: UnsafeRow => u
          case other => toUnsafe(other)
        }
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](limit + 1, rowOrd.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) heap.add(row.copy())
        else if (rowOrd.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { h =>
        val arr = h.toArray(new Array[UnsafeRow](h.size()))
        java.util.Arrays.sort(arr, rowOrd)
        arr.iterator
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans the logical node as partial → (exchange via EnsureRequirements)
  * → final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** DataFrame API: top `k` rows per `keys`, ordered by `order`. Requires
    * the `graft.plans.GraftExtensions` strategy to be installed. */
  def perKey(df: DataFrame, keys: Seq[Column], orders: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    val sortOrders = orders.map(o => ColumnBridge.expression(spark, o) match {
      case s: SortOrder => s
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    })
    val plan = TopKPerKeyPlan(
      keys.map(ColumnBridge.expression(spark, _)),
      sortOrders, k, df.queryExecution.analyzed)
    ColumnBridge.ofRows(spark, plan)
  }
}
