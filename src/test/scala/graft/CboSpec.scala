package graft

import org.apache.spark.sql.functions._

/** Cost-based optimization — the catalog-statistics surface. At 100 TB
  * the difference between a broadcast and a shuffle join is decided by
  * CARDINALITY ESTIMATES, and file-size-based guesses lie whenever a
  * selective filter sits between the scan and the join. ANALYZE TABLE
  * (+ FOR COLUMNS) is what replaces those guesses with real row counts
  * and per-column min/max/NDV; this spec pins that the engine's session
  * actually ingests and USES them:
  *   1. table-level stats land in the catalog and flow into plan.stats,
  *   2. column stats let the optimizer shrink a filtered plan's
  *      row-count estimate (the input a join-strategy pick runs on),
  *   3. with CBO off, the same filtered plan keeps the unfiltered
  *      row count — proving the improvement came from CBO, not luck.
  */
class CboSpec extends SparkSpec {

  private def withConfs[A](confs: (String, String)*)(body: => A): A = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def withTable[A](name: String)(body: => A): A =
    try body finally spark.sql(s"DROP TABLE IF EXISTS $name")

  test("ANALYZE TABLE stats reach the optimized plan's row count") {
    withTable("cbo_events") {
      Sources.events(spark, sfDir).write.mode("overwrite")
        .saveAsTable("cbo_events")
      val n = spark.table("cbo_events").count()
      spark.sql("ANALYZE TABLE cbo_events COMPUTE STATISTICS")
      withConfs("spark.sql.cbo.enabled" -> "true") {
        val stats = spark.table("cbo_events").queryExecution
          .optimizedPlan.stats
        assert(stats.rowCount.contains(BigInt(n)),
          s"catalog row count must reach plan stats: ${stats.rowCount} vs $n")
      }
    }
  }

  test("column stats shrink a filtered plan's estimate; CBO off keeps the raw guess") {
    withTable("cbo_events_cols") {
      Sources.events(spark, sfDir).write.mode("overwrite")
        .saveAsTable("cbo_events_cols")
      val n = spark.table("cbo_events_cols").count()
      spark.sql(
        "ANALYZE TABLE cbo_events_cols COMPUTE STATISTICS FOR COLUMNS user_id")
      // A ~10%-selective predicate on the analyzed column: with CBO +
      // column min/max/NDV the estimator must price it well below the
      // table's total row count — this estimate is what decides
      // broadcast-vs-shuffle for everything joined downstream.
      def filteredEstimate(): Option[BigInt] = spark.table("cbo_events_cols")
        .filter(col("user_id") < 2).queryExecution.optimizedPlan.stats.rowCount
      withConfs("spark.sql.cbo.enabled" -> "true") {
        val est = filteredEstimate()
        assert(est.isDefined, "CBO should produce a row-count estimate")
        assert(est.get < BigInt(n) / 2,
          s"column stats should price the selective filter: $est of $n rows")
      }
      withConfs("spark.sql.cbo.enabled" -> "false") {
        // Without CBO the size-in-bytes path carries no row count at all
        // (or the unfiltered one) — either way, no selectivity pricing.
        val est = filteredEstimate()
        assert(est.isEmpty || est.get >= BigInt(n) / 2,
          s"without CBO the estimate should not be selectivity-priced: $est")
      }
    }
  }
}
