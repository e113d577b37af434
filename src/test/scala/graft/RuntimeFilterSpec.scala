package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter semi-join reduction — the optimizer feature a
  * 100 TB shuffle join leans on: when one join side carries a selective
  * filter, Catalyst injects `bloom_filter_agg` on that side and a
  * `might_contain` predicate on the OTHER side's scan, so most of the
  * big side's rows drop BEFORE the exchange instead of after it. The
  * default thresholds are cluster-sized (10 GB application side); this
  * spec lowers them to observe the mechanism at fixture scale and pins
  * (a) that injection happens, (b) that results are unchanged by it.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def selectiveJoin() = {
    // Selective side: one order priority slice of orders; big side:
    // lineitem. The runtime filter should reach lineitem's scan.
    val o = Sources.orders(spark, sfDir)
      .filter(col("o_totalprice") > 400000.0)
      .select("o_orderkey")
    Sources.lineitem(spark, sfDir)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
  }

  test("a selective join side injects might_contain on the big side's scan") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // keep the join a shuffle join so the filter has an exchange to save
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = selectiveJoin().queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter"),
        s"expected a runtime bloom filter in the optimized plan:\n$plan")
    }
  }

  test("the runtime filter never changes results") {
    val withFilter = withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      selectiveJoin().orderBy("l_returnflag").collect().toSeq
    }
    val without = withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
      selectiveJoin().orderBy("l_returnflag").collect().toSeq
    }
    assert(withFilter === without)
    assert(withFilter.nonEmpty)
  }
}
