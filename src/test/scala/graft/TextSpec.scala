package graft

import org.apache.spark.sql.functions._
import text.TextAnalysis

class TextSpec extends SparkSpec {

  import spark.implicits._

  test("langId scores stopword-rich text correctly with deterministic argmax") {
    val df = Seq(
      (1L, "the cat sat of the mat and it is a good day for it"),
      (2L, "der hund ist nicht mit der katze und das ist gut"),
      (3L, "xyzzy qwerty asdf"),
      (4L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.langId(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).getAs[String]("lang_id") === "en")
    assert(r(1).getAs[String]("lang_id") === "de")
    assert(r(2).getAs[String]("lang_id") === "und")
    assert(r(3).getAs[String]("lang_id") === "und")
  }

  test("tokenStats: BPE-ish tokens split punctuation, whitespace tokens don't") {
    val df = Seq((1L, "hello, world! x2")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenStats(df, "doc_id", "text").head
    assert(r.getAs[Long]("n_ws_tokens") === 3)
    // hello , world ! x 2 → 6
    assert(r.getAs[Long]("n_bpe_tokens") === 6)
  }

  test("qualityScore penalizes punctuation soup and rewards stopword-bearing prose") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and it is fine"),
      (2L, "!!!! .... ;;;; ????")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(df, "doc_id", "text").orderBy("doc_id").collect()
    assert(r(0).getAs[Double]("quality_score") > r(1).getAs[Double]("quality_score"))
    assert(r(1).getAs[Double]("punct_ratio") > 0.5)
  }

  test("fingerprints: md5 is whitespace/case-normalized, rolling hash is order-sensitive") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "  ALPHA   beta GAMMA "),
      (3L, "gamma beta alpha")).toDF("doc_id", "text")
    val r = TextAnalysis.fingerprints(df, "doc_id", "text").orderBy("doc_id").collect()
    assert(r(0).getAs[String]("md5_fingerprint") === r(1).getAs[String]("md5_fingerprint"))
    assert(r(0).getAs[Long]("rolling_hash") === r(1).getAs[Long]("rolling_hash"))
    assert(r(0).getAs[Long]("rolling_hash") !== r(2).getAs[Long]("rolling_hash"))
    assert(r(0).getAs[Long]("rolling_hash") < TextAnalysis.HashMod)
  }

  test("full corpus: every doc gets a lang and ratios stay in range") {
    val out = TextAnalysis.qualityScore(Sources.documents(spark, sfDir), "doc_id", "text")
    assert(out.filter(col("punct_ratio") < 0 || col("punct_ratio") > 1).count() === 0)
    assert(out.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1).count() === 0)
    val langs = TextAnalysis.langId(Sources.documents(spark, sfDir), "doc_id", "text")
    assert(langs.filter(col("lang_id").isNull).count() === 0)
  }
}
