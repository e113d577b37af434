package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-5g per-source curation operators. Each
  * test rebuilds the injected-copy view and the rule arithmetic
  * independently (driver-side Scala over the collected fixture) and
  * compares against the query output, so a drift in either the injection
  * or a threshold fails loudly here before the oracle gate sees it.
  */
class Round5gOpsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  /** (doc_id, text, lang, source) of the injected view, recomputed. */
  private def sourcedRows(): Seq[(Long, String, String, String)] = {
    val base = Sources.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSeq
    base ++
      base.filter(_._1 % 9 == 0).map { case (id, t, l, _) =>
        (id + EntryOps.SourceCrossDupOffset, t, l, "src" + ((id + 3) % 20)) } ++
      base.filter(_._1 % 13 == 0).map { case (id, t, l, s) =>
        (id + EntryOps.SourceSelfDupOffset, t, l, s) }
  }

  private def nTokens(t: String): Long =
    t.trim.split("[ \t\n\f\r]+").length.toLong

  test("docs_source_audit: stats and blocklist verdict match a driver-side recount") {
    val got = q("docs_source_audit").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6))).toMap
    val view = sourcedRows()
    val expected = view.groupBy(_._4).map { case (src, rows) =>
      val nDocs = rows.length.toLong
      val toks = rows.map(r => nTokens(r._2))
      val nDup = nDocs - rows.map(_._2).distinct.length
      val nShort = toks.count(_ < text.TextAnalysis.GateMinWords).toLong
      val blocked = nDup * 20 > nDocs || nShort * 8 > nDocs
      src -> ((nDocs, toks.sum, rows.map(_._3).distinct.length.toLong,
        nDup, nShort, if (blocked) 1 else 0))
    }
    assert(got.keySet == expected.keySet)
    expected.foreach { case (src, e) => assert(got(src) == e, s"source $src") }
    // The injection must produce real dup signal somewhere.
    assert(got.values.exists(_._4 > 0), "no within-source dups injected")
  }

  test("docs_source_cap: kept set is exactly the hash-rank prefix inside the budget") {
    val got = q("docs_source_cap").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val docs = Sources.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"),
        md5(col("doc_id").cast("string").cast("binary")).as("rk"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    docs.groupBy(_._2).foreach { case (src, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._1)).map(r => nTokens(r._3))
      val cums = ordered.scanLeft(0L)(_ + _)
      val kept = ordered.indices.filter(i => cums(i) < 800L)
      // Greedy prefix: the kept set is a prefix of the rank order, never
      // a subsequence with holes, and the first doc always lands.
      assert(kept == kept.indices, s"$src kept set is not a prefix")
      assert(kept.nonEmpty == rows.nonEmpty)
      val e = (rows.length.toLong, ordered.sum,
        kept.length.toLong, kept.map(ordered).sum)
      assert(got(src) == e, s"source $src")
    }
  }

  test("yf_weekly_ohlc: argmin/argmax pick the week's first/last day; invariants hold") {
    val rows = q("yf_weekly_ohlc").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (h, l, nd) = (r.getDouble(3), r.getDouble(4), r.getLong(7))
      assert(h >= l, s"high < low at ${r.getLong(0)}/${r.getLong(1)}")
      assert(nd >= 1 && nd <= 7)
    }
    // Recompute one symbol brute-force from the daily consolidation.
    val daily = Sources.ohlcv(spark, sfDir)
      .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
      .withColumn("day_idx", datediff(col("Date"), lit("1970-01-01")).cast("long"))
      .groupBy("symbol", "day_idx")
      .agg(sum(floor(col("Open") * 1e8 + 0.5).cast("long")).as("os"),
        sum(floor(col("Close") * 1e8 + 0.5).cast("long")).as("cs"),
        count(lit(1)).as("nb"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val sym = daily.head._1
    val weeks = daily.filter(_._1 == sym).groupBy(t => (t._2 + 3) / 7)
    val bySymWeek = rows.filter(_.getLong(0) == sym)
      .map(r => r.getLong(1) -> (r.getDouble(2), r.getDouble(5))).toMap
    weeks.foreach { case (wk, ds) =>
      val first = ds.minBy(_._2)
      val last = ds.maxBy(_._2)
      val (gotOpen, gotClose) = bySymWeek(wk)
      assert(gotOpen == (first._3 / 1e8) / first._5, s"week $wk open")
      assert(gotClose == (last._4 / 1e8) / last._5, s"week $wk close")
    }
  }

  test("text_dup_ngrams: row-local recount matches; plan is shuffle-free") {
    val df = SparkEntry.queries("text_dup_ngrams")(spark, sfDir)
    // Strip the verify-payload orderBy before the plan pin.
    val core = Sources.documents(spark, sfDir).select(
      col("doc_id"),
      greatest(size(split(util.Norm.normalize(col("text")), " ")).cast("long") - 2,
        lit(0L)).as("n_grams"))
    assert(!core.queryExecution.executedPlan.toString.contains("Exchange"))
    val got = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    Sources.documents(spark, sfDir).select("doc_id", "text").collect().foreach { r =>
      val words = r.getString(1).trim.toLowerCase.split("\\s+").toSeq
      val grams = words.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
      val e = (grams.length.toLong, grams.distinct.length.toLong,
        (grams.length - grams.distinct.length).toLong)
      assert(got(r.getLong(0)) == e, s"doc ${r.getLong(0)}")
    }
    assert(got.values.exists(_._3 > 0), "fixture has no repeated 3-grams")
  }

  test("docs_cross_source_dup: pair matrix matches brute force; no cartesian product") {
    val df = q("docs_cross_source_dup")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"pair join must be keyed:\n$plan")
    val got = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val hs = sourcedRows().map(r => (r._2, r._4)).distinct
    val bySrcCount = hs.groupBy(_._1).view.mapValues(_.length).toMap
    val good = hs.filter(r => {
      val n = bySrcCount(r._1); n >= 2 && n <= 10
    })
    val expected = (for {
      (h1, s1) <- good; (h2, s2) <- good
      if h1 == h2 && s1 < s2
    } yield (s1, s2)).groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got == expected)
    assert(got.nonEmpty, "no cross-source syndication pairs injected")
  }
}
