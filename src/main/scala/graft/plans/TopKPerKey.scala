package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Per-key top-k as a WHOLE-OPERATOR plan node — design-rule tier (c):
  * custom `LogicalPlan` + `Strategy` + `SparkPlan`, registered through
  * `SparkSessionExtensions` ([[graft.functions.GraftExtensions]]).
  *
  * Why not compose it (tier a)? The composed form —
  * `row_number().over(Window.partitionBy(keys).orderBy(ord)) <= k` —
  * must SORT every key's full row set after the shuffle, and ships every
  * input row through the exchange. This operator keeps a bounded k-row
  * heap per key instead and runs in TWO stages like an aggregate:
  *
  *  - partial (map side, before the exchange): each input partition keeps
  *    its own per-key heaps and emits ≤ k rows per (key, partition) — the
  *    shuffle then moves at most `k × keys × partitions` rows instead of
  *    ALL rows (top-k is algebraic: topk(topk(A) ∪ topk(B)) = topk(A∪B));
  *  - final (after a `ClusteredDistribution(keys)` exchange that
  *    `EnsureRequirements` inserts automatically): merge the partial
  *    heaps, emit each key's k rows in sort order.
  *
  * At 100 TB the difference is shuffling k rows per key per map task vs
  * the whole fact table, and O(n log k) heap maintenance vs a full
  * per-key sort. This is what `TakeOrderedAndProject` does for GLOBAL
  * top-k, generalized to per-key.
  */
case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          child: LogicalPlan) extends UnaryNode {
  require(k >= 1, "k must be >= 1")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Physical per-key bounded-heap top-k; `partial` mirrors the two-phase
  * hash-aggregate shape (see [[TopKPerKeyPlan]]). */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val n = k
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // ord sorts "best first"; the heap is a max-heap under ord, so its
      // head is the WORST retained row — the eviction candidate.
      val ord = RowOrdering.create(sortOrder, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < n) heap.enqueue(row.copy())
        else if (ord.lt(row, heap.head)) { heap.dequeue(); heap.enqueue(row.copy()) }
      }
      val entries = heaps.values().iterator()
      new Iterator[InternalRow] {
        private var current: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!current.hasNext && entries.hasNext) {
            // dequeueAll drains the max-heap head-first = WORST-first
            // under ord; reverse to honor the best-first emission contract
            current = entries.next().dequeueAll.reverseIterator
          }
          current.hasNext
        }
        override def next(): InternalRow = current.next()
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans [[TopKPerKeyPlan]] as partial → (exchange) → final
  * [[TopKPerKeyExec]]; injected via
  * `SparkSessionExtensions.injectPlannerStrategy`. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Column-API front door. */
object TopK {
  /** Top `k` rows of `df` per distinct value of `keys`, best-first by
    * `orderBy` ((column, ascending) pairs — include a tiebreaker for
    * determinism). Requires the session to carry
    * [[graft.functions.GraftExtensions]] (which injects the planner
    * strategy). */
  def perKey(df: DataFrame, keyCols: Seq[String],
             orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    // resolve against the analyzed child so the custom node carries only
    // resolved attribute references (no analyzer work needed on it)
    val keys = keyCols.map(c => GraftColumnBridge.expression(df.col(c)))
    val order = orderBy.map { case (c, asc) =>
      val e = GraftColumnBridge.expression(df.col(c))
      if (asc) SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      else SortOrder(e, org.apache.spark.sql.catalyst.expressions.Descending)
    }
    GraftColumnBridge.ofRows(df.sparkSession,
      TopKPerKeyPlan(keys, order, k, df.queryExecution.analyzed))
  }
}
