package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime for [[WordShingles]] — static so generated code can call it
  * directly (one virtual-free call per row, no UDF encoder round-trip). */
object ShingleUtil {
  /** Distinct word n-grams of a space-normalized string, first-occurrence
    * order. Matches the documented shingle semantics of
    * [[graft.dedup.Dedup.shingles]] exactly. */
  def shingles(s: UTF8String, n: Int): ArrayData = {
    val words = s.toString.split(" ")
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]
    var i = 0
    while (i <= words.length - n) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression for word-n-gram shingling: stays inside
  * whole-stage codegen (the generated Java calls [[ShingleUtil.shingles]]
  * on the raw `UTF8String`), unlike a Scala UDF which pays a
  * catalyst↔external encoder round-trip per row, or higher-order array
  * functions which are interpreted. Preference order per the engine's
  * design rules: builtin composition > native Expression > UDF. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtil.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}
