package graft

import org.apache.spark.sql.functions._

/** Driver-side brute replay of the full BPE training loop
  * (`text.Bpe.trainTrajectory`): collect the tiny vocabulary, run the
  * classic sequential algorithm — count adjacent pairs weighted by word
  * frequency, pick (freq DESC, pair ASC), apply the merge leftmost-greedy
  * non-overlapping — in plain Scala, and demand the distributed
  * relational formulation (windows + islands parity + anti-join) lands on
  * the identical merge table AND trajectory. Also pins the islands rule
  * itself on the adversarial run case ("aaaa" under (a,a) → [aa, aa];
  * "aaa" → [aa, a]). */
class BpeSpec extends SparkSpec {

  private def bruteStep(vocab: Map[List[String], Long])
  : ((String, String, Long), Map[List[String], Long]) = {
    val pairCounts = vocab.toSeq
      .flatMap { case (syms, tf) =>
        syms.zip(syms.drop(1)).map(p => (p, tf))
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val best = pairCounts.toSeq
      .sortBy { case ((a, b), f) => (-f, a, b) }.head
    val ((a, b), freq) = best
    def applyMerge(syms: List[String]): List[String] = syms match {
      case x :: y :: rest if x == a && y == b =>
        (a + b) :: applyMerge(rest) // consumed pair — leftmost-greedy
      case x :: rest => x :: applyMerge(rest)
      case Nil => Nil
    }
    ((a, b, freq),
      vocab.toSeq.map { case (s, tf) => (applyMerge(s), tf) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap)
  }

  test("trainTrajectory matches the sequential brute replay over sf0.001") {
    val docs = Sources.documents(spark, sfDir)
    val got = text.Bpe.trainTrajectory(docs, 6)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))

    var vocab: Map[List[String], Long] = docs
      .select(explode(split(util.Norm.normalize(col("text")), " ")).as("w"))
      .filter(col("w") =!= "").groupBy("w").agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getString(0).map(_.toString).toList, r.getLong(1)))
      .toMap
    val want = (1 to 6).map { step =>
      val ((a, b, freq), next) = bruteStep(vocab)
      vocab = next
      val corpusTokens = vocab.map { case (s, tf) => s.length * tf }.sum
      val vocabTokens = vocab.keys.flatten.toSet.size.toLong
      (step, a, b, freq, corpusTokens, vocabTokens)
    }
    assert(got.toSeq === want, "distributed BPE diverged from brute replay")
  }

  test("leftmost-greedy islands parity on adversarial runs") {
    import spark.implicits._
    // One word "aaaa" (run of 3 candidate positions) and one "aaa":
    // (a,a) must merge positions {1,3} and {1} respectively.
    val docs = Seq((1L, "aaaa", "en", "s", 4L), (2L, "aaa", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val t = text.Bpe.trainTrajectory(docs, 1).collect().head
    // pairs: aaaa→3, aaa→2 ⇒ freq 5; after merge: [aa,aa] + [aa,a]
    // ⇒ corpus_tokens 2+2 = 4... per-word tf both 1 ⇒ 2 + 2 = 4? aaaa→2
    // tokens, aaa→2 tokens ⇒ 4; vocab {aa, a} ⇒ 2.
    assert((t.getString(1), t.getString(2), t.getLong(3)) === ("a", "a", 5L))
    assert(t.getLong(4) === 4L, "corpus tokens after [aa,aa]+[aa,a]")
    assert(t.getLong(5) === 2L, "vocab {aa, a}")
  }
}
