package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Runtime for [[VecDot]] — static so generated code calls it directly. */
object VecMathUtil {
  /** Sequential in-order dot product: acc = acc + a(i)*b(i), acc starts
    * 0.0 — the exact IEEE operation sequence of DuckDB's
    * `list_reduce(list_transform(list_zip(a, b), p -> p[1]*p[2]),
    * (acc, x) -> acc + x)` AND of Spark's interpreted
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)`, so swapping either for
    * this is bit-for-bit neutral. Mismatched lengths fail fast (zip_with
    * would null-pad and silently null the product); a NULL ELEMENT yields
    * a null result, matching the interpreted fold it replaced (a raw
    * toDoubleArray would NPE on generic arrays and silently read unsafe
    * null slots as 0.0).
    *
    * Boxed return: `java.lang.Double`, or null on null elements. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"dot product over mismatched lengths: $n vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

/** Native Catalyst expression for the in-order dot product of two
  * double-array columns. The cosine re-rank paths (brute-force top-k, LSH
  * and IVF candidate scoring, near-dup verification) call this per
  * (query, candidate) pair; the interpreted
  * `aggregate(zip_with(...))` chain it replaces was the hot loop of every
  * similarity query. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMathUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecMathUtil.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}
