package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-5c operators (cross-engine equality is
  * the driver gate's job; these assert the properties that make the
  * answers RIGHT, not just reproducible). */
class Round5cOpsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("docs_table_diff: statuses partition both snapshots consistently") {
    val d = Sources.documents(spark, sfDir)
    val nOld = d.filter(col("doc_id") % 5 =!= 1).count()
    val nNew = d.filter(col("doc_id") % 7 =!= 2).count()
    val m = q("docs_table_diff").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // added ∪ changed ∪ same = new snapshot; removed ∪ changed ∪ same = old.
    assert(m.getOrElse("added", 0L) + m.getOrElse("changed", 0L) +
      m.getOrElse("same", 0L) === nNew)
    assert(m.getOrElse("removed", 0L) + m.getOrElse("changed", 0L) +
      m.getOrElse("same", 0L) === nOld)
    // The %11=3 revision guarantees changed rows exist in any non-tiny SF.
    assert(m.getOrElse("changed", 0L) > 0)
    graft.util.Views.unpersistAll()
  }

  test("events_winsorize: cuts ordered, clamped sum inside the band, minority clamped") {
    q("events_winsorize").collect().foreach { r =>
      val (n, p05, p95, nClamped, sum) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(p05 <= p95)
      assert(sum >= n * p05 && sum <= n * p95)
      // ceil-rank cuts clamp at most ~5% on each side (+1 for the cut row).
      assert(nClamped <= (n / 10) + 2)
    }
    graft.util.Views.unpersistAll()
  }

  test("text_inverted_index: df equals posting length, postings strictly ascending") {
    val rows = q("text_inverted_index").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getLong(1)
      val ids = r.getString(2).split('|').map(_.toLong)
      assert(ids.length === df)
      assert(ids.sameElements(ids.sorted.distinct), s"postings not ascending for ${r.getString(0)}")
      assert(df >= 2 && df <= 50)
    }
    graft.util.Views.unpersistAll()
  }

  test("docs_zscore_outliers: flagged docs deviate from their language mean") {
    val stats = Sources.documents(spark, sfDir)
      .groupBy("lang").agg(avg("n_chars").as("mean"), stddev_samp("n_chars").as("sd"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val rows = q("docs_zscore_outliers").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lang, nChars, zs) = (r.getString(1), r.getLong(2), r.getString(3))
      val (mean, sd) = stats(lang)
      assert(math.abs(nChars - mean) > 1.4 * sd, s"doc ${r.getLong(0)} barely deviates")
      assert(!zs.contains("nan") && !zs.contains("inf"))
    }
    graft.util.Views.unpersistAll()
  }

  test("graph_pagerank: supplier hubs outrank parts; plan has no cartesian product") {
    val df = q("graph_pagerank")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "pagerank plan must never go cartesian")
    val rows = df.collect()
    assert(rows.length === 100)
    // lineitem has ~20x more parts than suppliers, so every supplier's
    // degree (and rank) dwarfs every part's: the suppliers must occupy
    // an unbroken PREFIX of the ranking.
    val nSupp = rows.count(_.getLong(1) == 1L)
    assert(nSupp > 0)
    assert(rows.takeWhile(_.getLong(1) == 1L).length === nSupp,
      "a part outranked a supplier — degree asymmetry should forbid this")
    // Ranks are sorted descending with the node tiebreak.
    val prs = rows.map(_.getLong(2))
    assert(prs.zip(prs.tail).forall { case (a, b) => a >= b })
    graft.util.Views.unpersistAll()
  }
}
