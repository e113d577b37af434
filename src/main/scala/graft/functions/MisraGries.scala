package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native
  * `TypedImperativeAggregate` — the engine's bounded-memory frequent-items
  * aggregate (`mg_sketch(item, capacity)` in SQL).
  *
  * Semantics: maintains at most `capacity` counters. The classic
  * guarantee holds under both per-row update and pairwise merge (errors
  * add): for every item `x` with true count `f(x)`, the sketch's count
  * `c(x)` satisfies `f(x) - N/(capacity+1) <= c(x) <= f(x)` where `N` is
  * the total number of updates — so **any item with
  * `f(x) > N/(capacity+1)` is guaranteed present**. That superset
  * guarantee is what makes the two-phase exact heavy-hitters query
  * (sketch → candidate-restricted exact recount) correct.
  *
  * Why this shape at 100 TB: a plain `groupBy(word).count()` shuffles the
  * FULL vocabulary (billions of distinct keys for web-scale text) to find
  * the top 20. The sketch is a map-side-combinable partial aggregate of
  * fixed size: each partition reduces to `<= capacity` counters, merges
  * are `O(capacity)`, and only the tiny candidate set reaches phase 2.
  * Contents depend on partitioning/merge order (the GUARANTEE does not),
  * which is why queries must only consume it as a candidate generator.
  *
  * The reference has no sketch surface at all; this extends the engine's
  * aggregation tier the same way HLL does for distinct counting
  * (SURVEY.md §2.0 "cardinality sketches").
  */
case class MisraGries(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(capacity >= 1 && capacity <= (1 << 20),
    s"mg_sketch capacity must be in [1, ${1 << 20}], got $capacity")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val key = v.asInstanceOf[UTF8String].toString
    buf.get(key) match {
      case Some(c) => buf.update(key, c + 1)
      case None if buf.size < capacity => buf.update(key, 1L)
      case None =>
        // Decrement-all step: O(capacity), but it fires at most
        // N/(capacity+1) times total, so the whole pass stays O(N).
        buf.mapValuesInPlace((_, c) => c - 1)
        buf.filterInPlace((_, c) => c > 0)
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    if (buf.size > capacity) {
      // Subtract the (capacity+1)-th largest count from everything and
      // drop the non-positives — the standard MG merge, which keeps the
      // additive error bound (Agarwal et al., "Mergeable Summaries").
      val cut = buf.values.toArray.sortInPlaceWith(_ > _).apply(capacity)
      buf.mapValuesInPlace((_, c) => c - cut)
      buf.filterInPlace((_, c) => c > 0)
    }
    buf
  }

  /** map<string,bigint> of surviving items → count LOWER BOUNDS, keys
    * sorted for a deterministic map layout. */
  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val entries = buf.toArray.sortBy(_._1)
    val keys: Array[Any] = entries.map(e => UTF8String.fromString(e._1): Any).toArray
    val values: Array[Any] = entries.map(e => e._2: Any).toArray
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(values))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storage: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf.update(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}
