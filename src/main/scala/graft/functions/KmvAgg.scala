package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV hash runtime. The item hash is the repo's standard cross-engine
  * md5→long contract (first 8 md5 hex chars of "kmv:item" read as an
  * unsigned 32-bit value — the same idiom [[CmsUtil.bucket]] and the
  * shard hashes use), so the DuckDB oracle can REPLAY the sketch
  * exactly: the k minimum distinct hash values are a plain
  * `ORDER BY hash LIMIT k` over the same md5 derivation, and the
  * estimates hash-match bit-for-bit. An engine-private 64-bit hash
  * would estimate better per bucket but could never leave the engine.
  */
object KmvUtil {
  /** Hash range: hashes are uniform in [0, 2^32). */
  val HashSpan: Double = 4294967296.0

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Unsigned-32-bit hash of `item` under the cross-engine md5 contract. */
  def hash(item: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val h = d.digest(("kmv:" + item.toString).getBytes("UTF-8"))
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }
}

/** `kmv_agg(item, k)` — k-minimum-values distinct-cardinality sketch over
  * a string column as a native `TypedImperativeAggregate`: each partition
  * keeps the k smallest DISTINCT item hashes (map-side partial), merge is
  * set-union-then-trim — the classic mergeable distinct summary
  * (Bar-Yossef et al., "Counting distinct elements in a data stream").
  * Returns the ascending hash array (size ≤ k), so everything downstream
  * is a projection over a tiny broadcastable value:
  *
  *  - cardinality: exact `size(arr)` while `size < k` (the sketch IS the
  *    distinct hash set), else `(k-1) * 2^32 / arr[k]` — one IEEE
  *    division of identical integers on both engines;
  *  - set union: sketches COMPOSE in plain SQL —
  *    `slice(array_sort(array_distinct(concat(a, b))), 1, k)` is exactly
  *    the sketch of the unioned inputs (spec-pinned), so per-stratum
  *    sketches roll up to corpus grain without rescanning anything.
  *
  * Complements the package's other sketches: Bloom answers "have I seen
  * THIS key" (membership), Misra-Gries "which keys are heavy", Count-Min
  * "how often is this key", KMV "how many DISTINCT keys" — with an
  * algebra (union) the built-in HLL buffers don't expose in a
  * cross-engine-checkable form. At 100 TB the buffer is k longs per
  * group regardless of key cardinality, and update cost is O(log k) only
  * while the current hash beats the k-th minimum — almost always a
  * single compare after warm-up. */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2 && k <= (1 << 16), s"kmv_agg k must be in [2, ${1 << 16}], got $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = KmvUtil.hash(v.asInstanceOf[UTF8String])
      if (buf.size < k) buf.add(h)
      else if (h < buf.last()) { if (buf.add(h)) buf.remove(buf.last()) }
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    buf.addAll(other)
    while (buf.size > k) buf.remove(buf.last())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    BloomUtil.pack(arr)
  }

  override def deserialize(storage: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val set = new java.util.TreeSet[java.lang.Long]()
    BloomUtil.unpack(storage).foreach(set.add(_))
    set
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}
