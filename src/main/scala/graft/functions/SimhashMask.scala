package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime for [[SimhashMask]] — static so generated code calls it
  * directly. */
object SimhashMaskUtil {
  private val digestTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val Prefix = "1:".getBytes("UTF-8")

  /** 64-bit mask whose bit j (0 = lowest) is set iff hex char j of
    * md5(s) ‖ md5("1:" ‖ s) is >= '8'.
    *
    * A hex char is >= '8' exactly when its nibble's top bit is set, so
    * the mask reads the nibble top-bits of the two digests directly —
    * no hex string is ever built. Bit j of the mask == the `substring(h,
    * j+1, 1) >= '8'` predicate of the DuckDB oracle mirror on
    * `md5(sh) || md5('1:' || sh)` by construction. */
  def mask(s: UTF8String): Long = {
    val md = digestTL.get()
    val bytes = s.getBytes
    md.reset()
    val d1 = md.digest(bytes)
    md.reset()
    md.update(Prefix)
    val d2 = md.digest(bytes)
    var m = 0L
    var i = 0
    while (i < 16) {
      val b1 = d1(i)
      // hex char 2i = high nibble of byte i, char 2i+1 = low nibble
      if ((b1 & 0x80) != 0) m |= 1L << (2 * i)
      if ((b1 & 0x08) != 0) m |= 1L << (2 * i + 1)
      val b2 = d2(i)
      if ((b2 & 0x80) != 0) m |= 1L << (32 + 2 * i)
      if ((b2 & 0x08) != 0) m |= 1L << (32 + 2 * i + 1)
      i += 1
    }
    m
  }
}

/** Native Catalyst expression for the per-shingle SimHash bit mask:
  * replaces `concat(md5(sh), md5(concat('1:', sh)))` plus 64 codegen'd
  * `substring(h, j, 1) >= '8'` slices per row (each allocating a
  * UTF8String) with two digests and 32 bit tests — the hot inner loop of
  * the [[graft.dedup.Dedup.simhash]] aggregation. Values are identical:
  * downstream tests bit j of the mask where the SQL mirror tests hex
  * char j. */
case class SimhashMask(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimhashMaskUtil.mask(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashMaskUtil.mask($c)")

  override protected def withNewChildInternal(newChild: Expression): SimhashMask =
    copy(child = newChild)

  override def prettyName: String = "simhash_mask"
}
