package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime for [[SignSketch]] — static so generated code calls it directly.
  *
  * The hyperplane constants are Rademacher ±1 signs derived from md5 at
  * CLASS-INIT time with the same rule the generated DuckDB SQL embeds as
  * literals (sign(j,d) = +1 iff the high bit of md5("j:d")'s first byte is
  * set), so both engines sketch with identical planes by construction.
  */
object SketchUtil {
  /** Maximum sketch width — enough for the 64-bit near-dup candidate key;
    * top-k banding uses a prefix. */
  val MaxBits = 64

  /** Embedding dimensionality the planes are generated for. */
  val VecDim = 64

  /** planes(j)(d) ∈ {-1.0, +1.0}. */
  val planes: Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(MaxBits) { j =>
      Array.tabulate(VecDim) { d =>
        val hex = md.digest(s"$j:$d".getBytes("UTF-8"))
        if ((hex(0) & 0x80) != 0) 1.0 else -1.0
      }
    }
  }

  /** '0'/'1' sign sketch of the first `bits` hyperplane projections.
    *
    * Each projection is a SEQUENTIAL IN-ORDER left fold
    * (acc = acc + v(d) * plane(d), acc starts at 0.0) — the exact IEEE
    * operation sequence of DuckDB's
    * `list_reduce(list_transform(list_zip(v, plane), p -> p[1]*p[2]),
    * (acc, x) -> acc + x)`, so the sign (and thus the sketch) is
    * bit-identical across engines even when a projection lands near 0.
    */
  def signSketch(v: ArrayData, bits: Int): UTF8String = {
    require(v.numElements() == VecDim,
      s"embedding must have $VecDim dims to match the sketch hyperplanes, got ${v.numElements()}")
    // null elements → null sketch (toDoubleArray would NPE on generic
    // arrays and silently zero unsafe ones)
    var k = 0
    while (k < VecDim) { if (v.isNullAt(k)) return null; k += 1 }
    val arr = v.toDoubleArray()
    val out = new Array[Byte](bits)
    var j = 0
    while (j < bits) {
      val p = planes(j)
      var acc = 0.0
      var d = 0
      while (d < arr.length) { acc += arr(d) * p(d); d += 1 }
      out(j) = if (acc > 0) '1' else '0'
      j += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** Native Catalyst expression computing a random-hyperplane sign sketch of
  * a double-array column in ONE codegen'd pass.
  *
  * Replaces a chain of `bits` interpreted higher-order expressions
  * (`aggregate(zip_with(...))` per bit — Spark evaluates higher-order
  * array functions interpreted, per row), which profiling showed dominating
  * the sketch stage; the native loop is two orders of magnitude cheaper
  * per row and stays inside whole-stage codegen. Preference order per the
  * engine's design rules: builtin composition > native Expression > UDF.
  */
case class SignSketch(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= SketchUtil.MaxBits,
    s"sketch width must be in [1, ${SketchUtil.MaxBits}]")

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    SketchUtil.signSketch(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchUtil.signSketch($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SignSketch =
    copy(child = newChild)

  override def prettyName: String = "sign_sketch"
}
