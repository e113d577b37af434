package graft

import org.apache.spark.sql.functions._

/** Bucketing — the co-located-join capability SCALE.md names as the next
  * step at 100 TB: two tables bucketed+sorted on the join key join with
  * NO exchange on either side (the shuffle happened once, at write time,
  * for every future join to reuse). */
class BucketSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without any Exchange") {
    // (managed tables land in the session's default warehouse; DROP TABLE
    // below removes their files)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      Sources.orders(spark, sfDir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      Sources.lineitem(spark, sfDir)
        .select("l_orderkey", "l_extendedprice")
        .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"bucketed join must not shuffle, got:\n$physical")
      // and it still computes the right thing
      val expected = Sources.lineitem(spark, sfDir).join(
        Sources.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
