package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min runtime. The bucket function is the repo's standard
  * cross-engine md5→long contract (first 8 md5 hex chars of "j:item" as
  * an unsigned 32-bit value, mod width — the same idiom `docs_rebalance`
  * and the shard hashes use), so the estimation projection on the Spark
  * side (`conv(substring(md5(...),1,8),16,10) % width`) and the DuckDB
  * oracle replay of the sketch land in EXACTLY the same cells as the
  * native update loop: the whole sketch is deterministic cross-engine,
  * unlike the engine-private Bloom hash (which never leaves the engine).
  */
object CmsUtil {
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Row-`j` bucket of `item` in a width-`width` sketch row. */
  def bucket(j: Int, item: UTF8String, width: Int): Int = {
    val d = md5.get()
    d.reset()
    val h = d.digest((j.toString + ":" + item.toString).getBytes("UTF-8"))
    // First 8 hex chars == first 4 bytes, read big-endian unsigned.
    val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    (v % width).toInt
  }
}

/** `cms_agg(item, depth, width)` — Count-Min frequency sketch over a
  * string column as a native `TypedImperativeAggregate`: each partition
  * fills a local depth×width counter grid (map-side partial), merges
  * element-wise ADD — the mergeable one-pass frequency summary. Returns
  * the row-major counter grid as ARRAY<BIGINT>, so point estimates are a
  * plain `least(element_at(...)...)` projection over the (tiny,
  * broadcastable) sketch — no second scan of the data.
  *
  * Complements the package's other sketches: Misra-Gries answers "which
  * keys are heavy" (candidate set), Count-Min answers "how often is THIS
  * key" for any key, with the one-sided guarantee
  * `exact ≤ estimate ≤ exact + ε·N` (ε = e/width, w.h.p. in depth) —
  * estimates NEVER undercount, because every occurrence increments all
  * `depth` of its cells and collisions only ever add. At 100 TB the grid
  * is a few KB per group regardless of key cardinality — the point of a
  * sketch: frequency audits without a per-key shuffle. */
case class CmsAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16,
    s"cms_agg depth must be in [1, 16], got $depth")
  require(width >= 2 && width <= (1 << 20),
    s"cms_agg width must be in [2, ${1 << 20}], got $width")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var j = 0
      while (j < depth) {
        buf(j * width + CmsUtil.bucket(j, s, width)) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = BloomUtil.pack(buf)
  override def deserialize(storage: Array[Byte]): Array[Long] = BloomUtil.unpack(storage)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsAgg =
    copy(child = newChild)
}
