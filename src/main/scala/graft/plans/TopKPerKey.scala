package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode, UnsafeExternalRowSorter}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.util.collection.unsafe.sort.PrefixComparator

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
                                k: Int, child: LogicalPlan,
                                maxKeysInFlight: Int = TopKPerKeyExec.DefaultMaxKeysInFlight)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

final case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
                                k: Int, partial: Boolean, child: SparkPlan,
                                maxKeysInFlight: Int = TopKPerKeyExec.DefaultMaxKeysInFlight)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val maxKeys = maxKeysInFlight
    val isPartial = partial
    val childOutput = child.output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val rowOrd = new LazilyGeneratedOrdering(sortOrder, childOutput)
      // per key: max-heap of the WORST retained row → O(log k) insert.
      // Memory is O(keysInMap · k) rows. The PARTIAL phase bounds keysInMap
      // at `maxKeysInFlight` by flushing: when a new key would exceed the
      // cap, every current heap is emitted and the map cleared. Correct
      // because partial output only needs to be a SUPERSET of each key's
      // per-partition top-k that still contains it — any row in the
      // partition's true top-k for its key is also in the top-k of
      // whichever flush-segment it fell into — and the final phase
      // re-aggregates. Each flush emits ≤ k·maxKeys rows, so memory stays
      // bounded at arbitrary key cardinality (the degradation is extra
      // shuffled rows, not OOM). The FINAL phase cannot evict (it must see
      // a key's whole input to be exact), so past the same key cap it
      // SPILLS instead: every retained heap row plus all remaining input
      // goes into an UnsafeExternalRowSorter ordered by (key, order) —
      // disk-backed, the same machinery SortExec uses — and the output is
      // a streaming first-k-per-key scan of the sorted run. Rows already
      // evicted by a heap before the switch are safe to forget: they were
      // beaten by k better rows of their key, which the sorter inherits.
      // So the operator degrades exactly like hash aggregation: heap mode
      // at moderate cardinality, sort-spill past it — never OOM.
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      var sorter: UnsafeExternalRowSorter = null

      def startSpill(): Unit = {
        val schema = StructType(childOutput.map(a =>
          StructField(a.name, a.dataType, a.nullable)))
        val fullOrder = keyExprs.map(e => SortOrder(e, Ascending)) ++ sortOrder
        sorter = UnsafeExternalRowSorter.create(
          schema,
          new LazilyGeneratedOrdering(fullOrder, childOutput),
          new PrefixComparator { override def compare(a: Long, b: Long): Int = 0 },
          new UnsafeExternalRowSorter.PrefixComputer {
            private val p = new UnsafeExternalRowSorter.PrefixComputer.Prefix
            override def computePrefix(row: InternalRow)
                : UnsafeExternalRowSorter.PrefixComputer.Prefix = {
              p.value = 0L; p.isNull = false; p
            }
          },
          org.apache.spark.SparkEnv.get.memoryManager.pageSizeBytes,
          false)
        heaps.values().forEach { h =>
          h.forEach(r => sorter.insertRow(r))
        }
        heaps.clear()
      }

      /** Streaming first-k-per-key over the externally sorted run. */
      def drainSorted(): Iterator[InternalRow] = {
        var prevKey: UnsafeRow = null
        var cnt = 0
        sorter.sort().filter { r =>
          val key = keyProj(r)
          if (prevKey == null || key != prevKey) {
            prevKey = key.copy(); cnt = 1
          } else cnt += 1
          cnt <= limit
        }
      }

      def insert(row: UnsafeRow, key: UnsafeRow): Unit = {
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

      def drain(): Iterator[InternalRow] = {
        import scala.jdk.CollectionConverters._
        val out = heaps.values().asScala.toVector.iterator.flatMap { h =>
          val arr = h.toArray(new Array[UnsafeRow](h.size()))
          java.util.Arrays.sort(arr, rowOrd)
          arr.iterator
        }
        heaps.clear()
        out
      }

      new Iterator[InternalRow] {
        private var out: Iterator[InternalRow] = Iterator.empty
        private var inputDone = false
        private def advance(): Unit = {
          while (!out.hasNext && !inputDone) {
            var flushed = false
            while (!flushed && it.hasNext) {
              val row = it.next() match {
                case u: UnsafeRow => u
                case other => toUnsafe(other)
              }
              if (sorter != null) sorter.insertRow(row)
              else {
                val key = keyProj(row)
                if (!heaps.containsKey(key) && heaps.size() >= maxKeys) {
                  if (isPartial) {
                    out = drain()
                    flushed = true
                    insert(row, key)
                  } else {
                    startSpill()
                    sorter.insertRow(row)
                  }
                } else insert(row, key)
              }
            }
            if (!flushed) {
              out = if (sorter != null) drainSorted() else drain()
              inputDone = true
            }
          }
        }
        override def hasNext: Boolean = { advance(); out.hasNext }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty iterator")
          out.next()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyExec {
  /** In-flight key cap per partition: 64k keys · k rows each. Past it the
    * partial phase flushes (extra shuffled rows) and the final phase
    * switches to disk-backed sort (extra I/O) — bounded memory either
    * way. */
  val DefaultMaxKeysInFlight: Int = 1 << 16
}

/** Plans the logical node as partial → (exchange via EnsureRequirements)
  * → final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child, maxKeys) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child), maxKeys),
        maxKeys) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** DataFrame API: top `k` rows per `keys`, ordered by `order`. Requires
    * the `graft.plans.GraftExtensions` strategy to be installed.
    * `maxKeysInFlight` bounds the partial phase's per-partition key map
    * (flush-on-overflow; see `TopKPerKeyExec`).
    *
    * Floating-point KEY expressions are canonicalized here (NaN bit
    * patterns, -0.0 vs 0.0) exactly as the optimizer does for built-in
    * grouping operators — the operator detects key groups by binary row
    * equality (hash map in heap mode, adjacent-row compare in the spill
    * scan) and hash-partitions on the raw key bytes, so distinct
    * encodings of the same semantic key must never reach it. */
  def perKey(df: DataFrame, keys: Seq[Column], orders: Seq[Column], k: Int,
             maxKeysInFlight: Int = TopKPerKeyExec.DefaultMaxKeysInFlight): DataFrame = {
    val spark = df.sparkSession
    val sortOrders = orders.map(o => ColumnBridge.expression(spark, o) match {
      case s: SortOrder => s
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    })
    val plan = TopKPerKeyPlan(
      keys.map(c => ColumnBridge.normalizeFloatingNumbers(
        ColumnBridge.expression(spark, c))),
      sortOrders, k, df.queryExecution.analyzed, maxKeysInFlight)
    ColumnBridge.ofRows(spark, plan)
  }
}
