package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.unsafe.types.UTF8String

/** Property-based invariants for the text/dedup kernels — pure-JVM checks
  * of the same code the Catalyst expressions call, so hundreds of random
  * inputs run without Spark job overhead. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val textGen = Gen.listOf(wordGen).map(_.mkString(" "))

  test("shingles: count bounded by words-n+1, every shingle has exactly n words") {
    check(Prop.forAll(textGen) { text =>
      val arr = graft.functions.ShingleUtil.shingles(UTF8String.fromString(text), 3)
      val words = text.split(" ").filter(_.nonEmpty)
      val n = arr.numElements()
      n <= math.max(0, words.length - 2) &&
        (0 until n).forall(i => arr.getUTF8String(i).toString.split(" ").length == 3)
    })
  }

  test("shingles are distinct and preserve first-occurrence order") {
    check(Prop.forAll(textGen) { text =>
      val arr = graft.functions.ShingleUtil.shingles(UTF8String.fromString(text), 2)
      val s = (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
      s.distinct == s
    })
  }

  test("hyperplane sketch constants are balanced (md5-derived ~50/50 signs)") {
    val h = sim.Similarity.hyperplanes
    assert(h.flatten.count(_ == 1) > 0 && h.flatten.count(_ == -1) > 0)
    val ones = h.flatten.count(_ == 1).toDouble / h.flatten.length
    assert(ones > 0.35 && ones < 0.65)
  }
}
