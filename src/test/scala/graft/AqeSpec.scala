package graft

import org.apache.spark.sql.functions._

/** Adaptive Query Execution — the runtime re-planning SCALE.md leans on
  * (partition coalescing for shuffle tails, skew-join splitting). This
  * pins that AQE is actually active in the engine's sessions and that
  * its coalescing collapses near-empty post-shuffle partitions, so the
  * "size shuffle.partitions for the big queries, let AQE fix the small
  * ones" guidance holds.
  */
class AqeSpec extends SparkSpec {

  test("AQE is on and coalesces a tiny aggregation's post-shuffle partitions") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
      "Spark 4 defaults AQE on; the engine's sessions must not disable it")
    val df = Sources.events(spark, sfDir)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    val rows = df.collect()
    assert(rows.length == 5)
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("AQEShuffleRead") && finalPlan.contains("coalesced"),
      s"expected AQE to coalesce the 5-group shuffle below " +
        s"${spark.conf.get("spark.sql.shuffle.partitions")} partitions:\n$finalPlan")
  }
}
