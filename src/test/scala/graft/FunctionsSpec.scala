package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import functions.{SignSketch, SimhashMask, SimhashMaskUtil, SketchUtil, VecDot, VecMathUtil}

/** Direct coverage of the native Catalyst expressions beyond their
  * query-level use: interpreted eval ≡ the documented semantics, null
  * propagation, and the cross-engine bit/fold contracts. */
class FunctionsSpec extends SparkSpec {

  private def arr(xs: Double*) = new GenericArrayData(xs.toArray)

  test("VecDot: in-order IEEE fold, null propagation, mismatch fails fast") {
    // reference fold: ((0 + 1*4) + 2*5) + 3*6 = 32
    assert(VecMathUtil.dot(arr(1, 2, 3), arr(4, 5, 6)) === 32.0)
    // order sensitivity is REAL for doubles — the native loop must match
    // the left-fold exactly; spot-check against an explicit fold
    val xs = Array(1e16, 1.0, -1e16, 1.0)
    val ys = Array(1.0, 1.0, 1.0, 1.0)
    val expected = xs.zip(ys).foldLeft(0.0) { case (acc, (a, b)) => acc + a * b }
    assert(VecMathUtil.dot(arr(xs: _*), arr(ys: _*)) === expected)
    val e = intercept[IllegalArgumentException] {
      VecMathUtil.dot(arr(1, 2), arr(1, 2, 3))
    }
    assert(e.getMessage.contains("mismatched"))
    // expression-level: nulls propagate instead of throwing
    val vd = VecDot(Literal(null, ArrayType(DoubleType)), Literal(null, ArrayType(DoubleType)))
    assert(vd.eval(InternalRow.empty) === null)
    // a NULL ELEMENT nulls the product (matches the interpreted
    // aggregate(zip_with) fold this replaces), never NPEs or reads 0.0
    val withNull = new GenericArrayData(Array[Any](1.0, null, 3.0))
    assert(VecMathUtil.dot(withNull, arr(1, 1, 1)) === null)
    assert(VecMathUtil.dot(arr(1, 1, 1), withNull) === null)
  }

  test("SignSketch: null element yields null sketch") {
    val vals = new Array[Any](SketchUtil.VecDim)
    (0 until SketchUtil.VecDim).foreach(i => vals(i) = 1.0)
    vals(7) = null
    assert(SketchUtil.signSketch(new GenericArrayData(vals), 16) === null)
  }

  test("SignSketch: prefix property, plane constants, null propagation") {
    val v = arr((0 until SketchUtil.VecDim).map(d => math.sin(d + 1)): _*)
    val full = SketchUtil.signSketch(v, 64).toString
    val prefix = SketchUtil.signSketch(v, 16).toString
    assert(full.length === 64 && prefix.length === 16)
    assert(full.startsWith(prefix), "narrow sketch must be a prefix of the wide one")
    assert(full.forall(c => c == '0' || c == '1'))
    // bit j is the sign of the in-order fold against plane j
    (0 until 64).foreach { j =>
      val acc = (0 until SketchUtil.VecDim)
        .foldLeft(0.0)((a, d) => a + math.sin(d + 1) * SketchUtil.planes(j)(d))
      assert((full(j) == '1') === (acc > 0), s"bit $j disagrees with its projection")
    }
    val ss = SignSketch(Literal(null, ArrayType(DoubleType)), 16)
    assert(ss.eval(InternalRow.empty) === null)
  }

  test("SimhashMask: bit j equals the hex-char-j >= '8' predicate of the oracle") {
    val samples = Seq("alpha beta gamma", "x", "", "the quick brown fox")
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    samples.foreach { s =>
      val m = SimhashMaskUtil.mask(UTF8String.fromString(s))
      val h = hex(s) + hex("1:" + s)
      (0 until 64).foreach { j =>
        val bit = ((m >> j) & 1L) == 1L
        assert(bit === (h(j) >= '8'),
          s"bit $j of mask('$s') disagrees with hex char '${h(j)}'")
      }
    }
    assert(SimhashMask(Literal(null, StringType)).eval(InternalRow.empty) === null)
  }

  test("native expressions evaluate identically via codegen (column API) and interpreted") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((Seq.tabulate(64)(d => (d % 7 - 3).toDouble), "some text here"))
      .toDF("v", "s")
    val viaCodegen = df.select(
      org.apache.spark.sql.GraftColumnBridge.column(
        VecDot(org.apache.spark.sql.GraftColumnBridge.expression(col("v")),
          org.apache.spark.sql.GraftColumnBridge.expression(col("v")))).as("d"),
      org.apache.spark.sql.GraftColumnBridge.column(
        SignSketch(org.apache.spark.sql.GraftColumnBridge.expression(col("v")), 16)).as("sk"),
      org.apache.spark.sql.GraftColumnBridge.column(
        SimhashMask(org.apache.spark.sql.GraftColumnBridge.expression(col("s")))).as("m"))
      .head
    val v = new GenericArrayData(Seq.tabulate(64)(d => (d % 7 - 3).toDouble).toArray)
    assert(viaCodegen.getDouble(0) === VecMathUtil.dot(v, v))
    assert(viaCodegen.getString(1) === SketchUtil.signSketch(v, 16).toString)
    assert(viaCodegen.getLong(2) === SimhashMaskUtil.mask(UTF8String.fromString("some text here")))
  }
}
