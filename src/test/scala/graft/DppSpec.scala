package graft

import org.apache.spark.sql.functions._

/** Dynamic partition pruning: the runtime scan optimization for
  * disk-partitioned facts (the 100 TB lake layout — yf_sink_pruned pins
  * the STATIC case; this pins the join-driven case). When a partitioned
  * fact joins a filtered dim on the partition column, Spark plants the
  * dim's build-side values as a runtime partition filter on the fact
  * scan, so only the matching directories are read — at lake scale the
  * difference between scanning 3 days and scanning 10 years. */
class DppSpec extends SparkSpec {

  test("partitioned-fact join to a filtered dim plants a dynamic partition filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toFile.getAbsolutePath
    val fact = Sources.events(spark, sfDir)
      .withColumn("day", expr("ts DIV 86400000000000"))
    fact.write.mode("overwrite").partitionBy("day").parquet(dir)
    val factP = spark.read.parquet(dir)

    // A small dim keyed by day, filtered selectively — the classic
    // date-dimension slice.
    val dim = fact.select("day").distinct()
      .withColumn("is_hot", pmod(col("day"), lit(7)) === 0)
    val joined = factP.join(broadcast(dim.filter(col("is_hot"))), "day")

    val n = joined.count()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n$plan")

    // Results match the filter applied directly to the unpartitioned fact.
    val expected = fact.filter(pmod(col("day"), lit(7)) === 0).count()
    assert(n == expected, s"got $n, expected $expected")
    assert(n > 0 && n < fact.count(), "slice must be selective but non-empty")
  }
}
