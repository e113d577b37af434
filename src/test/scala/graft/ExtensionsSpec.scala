package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.scalatest.funsuite.AnyFunSuite

/** The SQL registration surface: a session built with GraftExtensions can
  * call the native expressions from plain SQL.
  *
  * Extensions are applied only when `getOrCreate` BUILDS a session (a
  * reused session silently drops them; the `spark.sql.extensions` config
  * form additionally binds at SparkContext creation, which the shared
  * test context predates), so this spec clears the default-session slot,
  * builds a sibling session over the same SparkContext via
  * `builder.withExtensions` — the same injection the config string does
  * in production — and restores the shared session for the other
  * suites. */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val shared = TestSession.spark // force shared session first
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    SparkSession.setDefaultSession(shared)
    SparkSession.setActiveSession(shared)
    s
  }

  test("native functions callable from SQL after extension registration") {
    val sh = spark.sql("SELECT word_shingles('a b c d', 3) AS sh")
      .head.getSeq[String](0)
    assert(sh === Seq("a b c", "b c d"))
    val mask = spark.sql("SELECT simhash_mask('a b c') AS m").head.getLong(0)
    assert(mask === graft.functions.SimhashMaskUtil.mask(
      org.apache.spark.unsafe.types.UTF8String.fromString("a b c")))
    val dot = spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head.getDouble(0)
    assert(dot === 11.0)
    val sk = spark.sql(
      "SELECT sign_sketch(transform(sequence(1, 64), x -> cast(x AS double)), 16) AS s")
      .head.getString(0)
    assert(sk.length === 16 && sk.forall(c => c == '0' || c == '1'))
  }

  test("a vanilla session does NOT see the functions (extension isolation)") {
    val shared = TestSession.spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val vanilla = SparkSession.builder().master("local[4]").getOrCreate()
    SparkSession.setDefaultSession(shared)
    SparkSession.setActiveSession(shared)
    val e = intercept[Exception] {
      vanilla.sql("SELECT word_shingles('a b c', 3)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("word_shingles"))
  }

  test("width arguments must be literals") {
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles('a b c', length('xx') + 1)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
