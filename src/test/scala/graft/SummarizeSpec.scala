package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import news.Summarize

class SummarizeSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val wordGen = Gen.oneOf("the", "market", "stock", "rose", "sharply",
    "today", "analysts", "said", "profit", "beat", "estimates", "bank")
  private val sentenceGen = Gen.chooseNum(3, 12).flatMap(n => Gen.listOfN(n, wordGen))
    .map(_.mkString(" ") + ".")
  private val textGen = Gen.chooseNum(1, 60).flatMap(n => Gen.listOfN(n, sentenceGen))
    .map(_.mkString(" "))

  test("chunking is lossless: concat of chunks == sentence-normalized input") {
    check(Prop.forAll(textGen) { text =>
      val chunks = Summarize.splitText(text)
      chunks.mkString(" ").nonEmpty == false ||
        chunks.mkString(" ") == Summarize.sentences(text).mkString(" ")
    })
  }

  test("every chunk respects the token budget unless it is a single long sentence") {
    check(Prop.forAll(textGen) { text =>
      Summarize.splitText(text, maxTokens = 40).forall(c =>
        Summarize.tokenCount(c) <= 40 || Summarize.sentences(c).size == 1)
    })
  }

  test("greedy packing flush quirk: over-budget first sentence emits an empty chunk") {
    // The reference flushes the current (possibly empty) chunk before an
    // over-budget sentence (iqplus_market_transform.py:36-40).
    val long = (1 to 50).map(_ => "word").mkString(" ") + "."
    val chunks = Summarize.splitText(long, maxTokens = 10)
    assert(chunks === Seq("", long))
  }

  test("boundary: a sentence landing exactly on the budget stays in the chunk") {
    val s = "a b c d."                      // 5 tokens (4 words + '.')
    val chunks = Summarize.splitText(s + " " + s, maxTokens = 10)
    assert(chunks === Seq(s + " " + s))
  }

  test("summary token count stays within budget slack") {
    check(Prop.forAll(textGen) { text =>
      val s = Summarize.extractiveSummarize(text, maxLength = 250, minLength = 50)
      // may exceed max only while under min, plus at most one sentence overshoot
      Summarize.tokenCount(s) <= 250 + 60 || Summarize.sentences(text).size <= 2
    })
  }

  test("summarizer is deterministic and pure") {
    check(Prop.forAll(textGen) { text =>
      Summarize.summarizeLongText(text) == Summarize.summarizeLongText(text)
    })
  }

  test("summary sentences come from the source text, in original order") {
    val text = "alpha beta gamma. delta epsilon zeta. alpha beta again. eta theta iota."
    val out = Summarize.extractiveSummarize(text, 12, 3)
    val srcSents = Summarize.sentences(text)
    val outSents = Summarize.sentences(out)
    assert(outSents.forall(srcSents.contains))
    assert(outSents.map(srcSents.indexOf) === outSents.map(srcSents.indexOf).sorted)
  }

  test("summaryStats agrees with the summarizer it instruments") {
    check(Prop.forAll(textGen) { text =>
      val st = Summarize.summaryStats(text, 250, 50)
      val summary = Summarize.extractiveSummarize(text, 250, 50)
      val srcSents = Summarize.sentences(text)
      // n_summary_sentences == sentences actually emitted (each picked
      // sentence carries exactly one '.'), n_sentences == source count,
      // and the top-ranked sentence is always in the summary (the greedy
      // pick never rejects the first ranked sentence).
      st.n_sentences == srcSents.size &&
        st.n_summary_sentences == Summarize.sentences(summary).size &&
        (srcSents.isEmpty ||
          Summarize.sentences(summary).contains(srcSents(st.top_sentence_idx.toInt - 1)))
    })
  }

  test("summaryStats on empty input is all-zero") {
    assert(Summarize.summaryStats("") === Summarize.SummaryStats(0L, 0L, 0L))
  }

  test("null / empty / error inputs produce empty string like the reference") {
    assert(Summarize.summarizeLongText(null) === "")
    assert(Summarize.extractiveSummarize("", 250, 50) === "")
  }

  test("long text takes the split-merge path and still summarizes") {
    val long = (1 to 300).map(i => s"sentence number $i talks about markets and profit.").mkString(" ")
    assert(Summarize.tokenCount(long) > Summarize.MaxTokens)
    val s = Summarize.summarizeLongText(long)
    assert(s.nonEmpty && Summarize.tokenCount(s) < Summarize.tokenCount(long))
  }
}
