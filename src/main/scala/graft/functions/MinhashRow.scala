package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime for [[MinhashRow]]. */
object MinhashRowUtil {
  private val digestTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val Hex = "0123456789abcdef".getBytes("US-ASCII")
  val MaxHashes = 64
  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(MaxHashes)(j => s"$j:".getBytes("UTF-8"))

  /** Element j (0-based) = lowercase hex md5 of the BYTES of "$j:" ‖ s —
    * identical to `md5(concat(lit("j:"), sh))` (UTF-8 string concat is
    * byte concat) and to DuckDB `md5('j:' || sh)`. */
  def hashes(s: UTF8String, n: Int): ArrayData = {
    val md = digestTL.get()
    val bytes = s.getBytes
    val out = new Array[Any](n)
    var j = 0
    while (j < n) {
      md.reset()
      md.update(prefixes(j))
      md.update(bytes)
      val d = md.digest()
      val hex = new Array[Byte](32)
      var i = 0
      while (i < 16) {
        hex(2 * i) = Hex((d(i) >> 4) & 0xf)
        hex(2 * i + 1) = Hex(d(i) & 0xf)
        i += 1
      }
      out(j) = UTF8String.fromBytes(hex)
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression producing the [[graft.dedup.Dedup]] minhash
  * hash family for one shingle in a single call: one reused digest
  * instance, byte-level prefixes, no per-hash string concat — replaces
  * `n` separate `md5(concat(lit("j:"), sh))` expression chains (each
  * allocating the concatenated UTF8String and a fresh digest) in the
  * signature aggregation, the hottest stage of the LSH pipeline. */
case class MinhashRow(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1 && n <= MinhashRowUtil.MaxHashes,
    s"hash count must be in [1, ${MinhashRowUtil.MaxHashes}]")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    MinhashRowUtil.hashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinhashRowUtil.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): MinhashRow =
    copy(child = newChild)

  override def prettyName: String = "minhash_row"
}
