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
  * hash-aggregate shape (see [[TopKPerKeyPlan]]).
  *
  * The PARTIAL phase's key→heap map is memory-BOUNDED: when admitting a
  * row whose key would push the map past `flushKeys` distinct keys, the
  * phase emits every heap's current contents and starts a fresh epoch
  * (the analogue of a partial hash aggregate degrading gracefully on
  * high-cardinality keys — correctness is unaffected because the FINAL
  * phase re-merges all epochs per key; the shuffle just carries up to
  * k × epochs rows per key instead of k). The final phase never flushes:
  * its input is clustered by key, so an early emission would split a
  * key's result — its footprint is bounded at k rows × keys-in-partition,
  * the same residency as any final hash aggregate. */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          partial: Boolean, flushKeys: Int, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Output-row metric: for the PARTIAL phase this is exactly the number
    * of rows entering the exchange — the operator's core scale claim
    * (≤ k × keys × partitions, + flush epochs) is observable per query and
    * pinned by TopKSpec rather than argued in prose. */
  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val n = k
    val childOutput = child.output
    val flushLimit = if (partial) flushKeys else Int.MaxValue
    val numOutputRows = longMetric("numOutputRows")
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // ord sorts "best first"; the heap is a max-heap under ord, so its
      // head is the WORST retained row — the eviction candidate.
      val ord = RowOrdering.create(sortOrder, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      def insert(row: InternalRow): Unit = {
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < n) heap.enqueue(row.copy())
        else if (ord.lt(row, heap.head)) { heap.dequeue(); heap.enqueue(row.copy()) }
      }
      // Drains a SNAPSHOT of the heaps and clears the map, so the caller
      // can keep inserting into a fresh epoch while emission proceeds.
      def drainAll(): Iterator[InternalRow] = {
        val vals = new java.util.ArrayList[scala.collection.mutable.PriorityQueue[InternalRow]](heaps.values())
        heaps.clear()
        val entries = vals.iterator()
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
      new Iterator[InternalRow] {
        private var emitting: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!emitting.hasNext && (iter.hasNext || !heaps.isEmpty)) {
            var flushed = false
            while (!flushed && iter.hasNext) {
              val row = iter.next()
              // flush BEFORE admitting a row that would create a key past
              // the budget — the map never exceeds flushLimit keys
              if (heaps.size() >= flushLimit && heaps.get(keyProj(row)) == null) {
                emitting = drainAll()
                flushed = true
              }
              insert(row)
            }
            if (!flushed && !iter.hasNext && !heaps.isEmpty) emitting = drainAll()
          }
          emitting.hasNext
        }
        override def next(): InternalRow = {
          numOutputRows += 1
          emitting.next()
        }
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
  /** Session conf bounding the partial phase's distinct-key residency;
    * worst-case partial memory is this many keys × k retained rows. */
  val FlushKeysConf = "spark.graft.topk.partialFlushKeys"
  val DefaultFlushKeys: Int = 1 << 17

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      val flushKeys = org.apache.spark.sql.internal.SQLConf.get
        .getConfString(FlushKeysConf, DefaultFlushKeys.toString).toInt
      require(flushKeys >= 1, s"$FlushKeysConf must be >= 1")
      TopKPerKeyExec(keys, order, k, partial = false, flushKeys,
        TopKPerKeyExec(keys, order, k, partial = true, flushKeys,
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
