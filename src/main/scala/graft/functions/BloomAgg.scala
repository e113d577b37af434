package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter runtime shared by the aggregate and the probe expression
  * (static so generated code calls it directly, like the other native
  * expressions in this package).
  *
  * Double hashing (Kirsch–Mitzenmacher): k index positions derived from
  * two 64-bit halves of one FNV-1a pass — the standard construction, k
  * probes for one hash computation. The bit array is packed longs. The
  * hash only has to be stable WITHIN the engine (the filter is an
  * internal pre-filter; correctness comes from exact re-checks of the
  * positives), so no cross-engine hash contract exists to break.
  */
object BloomUtil {
  /** FNV-1a over the UTF-8 bytes, folded into two halves. */
  private def hash2(s: UTF8String): (Long, Long) = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    // Second independent stream: re-fold with a different offset basis.
    var g = 0x6c62272e07bb0142L
    i = 0
    while (i < bytes.length) { g ^= bytes(i) & 0xffL; g *= 0x3f4a9fe9c1b2d473L; i += 1 }
    (h, g | 1L) // odd step so all positions are reachable
  }

  def add(bits: Array[Long], s: UTF8String, numHashes: Int): Unit = {
    val (h1, h2) = hash2(s)
    val m = bits.length.toLong * 64L
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Math.floorMod(h1 + i * h2, m)
      bits((pos >>> 6).toInt) |= (1L << (pos & 63))
      i += 1
    }
  }

  def mightContain(packed: Array[Byte], s: UTF8String, numHashes: Int): Boolean = {
    val (h1, h2) = hash2(s)
    val m = packed.length.toLong * 8L
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Math.floorMod(h1 + i * h2, m)
      if ((packed((pos >>> 3).toInt) & (1 << (pos & 7))) == 0) return false
      i += 1
    }
    true
  }

  def pack(bits: Array[Long]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(bits.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bits.foreach(out.putLong)
    out.array()
  }

  def unpack(bytes: Array[Byte]): Array[Long] = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(bytes.length / 8)(buf.getLong)
  }
}

/** `bloom_agg(item, numBits, numHashes)` — builds a Bloom filter over a
  * string column as a native `TypedImperativeAggregate`: each partition
  * fills a local bit array (map-side partial), merges OR them — the
  * distributed filter build, no driver-side collect (the built-in
  * `DataFrameStatFunctions.bloomFilter` collects rows to the driver).
  * Returns the packed bit array as BINARY, probed by [[MightContain]].
  *
  * No false negatives by construction (set bits only accumulate under
  * OR-merge); the false-positive rate follows the standard (1-e^{-kn/m})^k
  * — callers must re-check positives exactly when exactness matters.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(numBits >= 64 && numBits % 64 == 0 && numBits <= (1 << 28),
    s"bloom_agg numBits must be a positive multiple of 64 (≤ ${1 << 28}), got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"bloom_agg numHashes must be in [1, 16], got $numHashes")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.add(buf, v.asInstanceOf[UTF8String], numHashes)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = BloomUtil.pack(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = BloomUtil.pack(buf)
  override def deserialize(storage: Array[Byte]): Array[Long] = BloomUtil.unpack(storage)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** `bloom_might_contain(bloom, item, numHashes)` — the probe. False on a
  * miss is DEFINITIVE (no false negatives); true must be re-checked
  * exactly when exactness matters. Codegen'd via the static runtime like
  * the package's other expressions.
  */
case class MightContain(left: Expression, right: Expression, numHashes: Int)
  extends BinaryExpression with BinaryLike[Expression] {

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(bloom: Any, item: Any): Any =
    BloomUtil.mightContain(bloom.asInstanceOf[Array[Byte]],
      item.asInstanceOf[UTF8String], numHashes)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (b, i) =>
      s"graft.functions.BloomUtil.mightContain($b, $i, $numHashes)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MightContain =
    copy(left = newLeft, right = newRight)
}
