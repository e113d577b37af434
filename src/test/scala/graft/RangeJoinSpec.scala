package graft

import org.apache.spark.sql.functions._
import events.RangeJoin

class RangeJoinSpec extends SparkSpec {

  private lazy val ev = Sources.events(spark, sfDir)

  test("range join plans as an equi-join, never a nested loop") {
    val plan = RangeJoin.windowedMatches(ev, "error", "purchase")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"binned range join must not plan a nested loop:\n$plan")
  }

  test("binned candidates + BETWEEN equal a direct inequality join") {
    val binned = RangeJoin.windowedMatches(ev, "error", "purchase")
    val us = ev.withColumn("ts_us", expr("ts div 1000"))
    val iv = us.filter(col("event_type") === "error")
      .select(col("event_id").as("l_id"), col("user_id"),
        col("ts_us").as("t0"), (col("ts_us") + RangeJoin.DefaultWindowUs).as("t1"))
    val pt = us.filter(col("event_type") === "purchase")
      .select(col("event_id").as("r_id"), col("user_id").as("p_user"), col("ts_us").as("tp"))
    // direct (nested-loop) reference computation of the match counts
    val direct = iv.join(pt,
        col("user_id") === col("p_user") && col("tp") >= col("t0") && col("tp") <= col("t1"),
        "left")
      .groupBy("l_id").agg(count(col("r_id")).as("n_matches"))
    val got = binned.select("l_id", "n_matches")
    assert(got.exceptAll(direct).isEmpty && direct.exceptAll(got).isEmpty)
  }

  test("an interval never explodes to more than 2 bins") {
    // bin width == interval length ⇒ sequence(t0 div W, t1 div W) has
    // exactly 2 elements for every row
    val us = ev.withColumn("ts_us", expr("ts div 1000"))
    val w = RangeJoin.DefaultWindowUs
    val nBins = us.filter(col("event_type") === "error")
      .select(size(sequence(expr(s"(ts div 1000) div $w"),
        expr(s"((ts div 1000) + $w) div $w"))).as("n"))
    assert(nBins.filter(col("n") =!= 2).count() === 0)
  }
}
