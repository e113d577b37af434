package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The transparent window→top-k optimizer rewrite
  * ([[graft.plans.WindowTopKRewrite]]): positive cases re-plan through
  * TopKPerKeyExec with results identical to the un-rewritten window;
  * negative cases must keep the sort-based window.
  */
class WindowTopKRewriteSpec extends SparkSpec {

  private def orders = Sources.orders(spark, sfDir)
    .select("o_orderkey", "o_custkey", "o_totalprice")

  private def w = org.apache.spark.sql.expressions.Window
    .partitionBy("o_custkey")
    .orderBy(col("o_totalprice").desc, col("o_orderkey"))

  private def hasTopK(df: DataFrame): Boolean = {
    df.collect() // materialize so AQE settles the final plan
    df.queryExecution.executedPlan.toString.contains("TopKPerKey")
  }

  private def runWithRuleOff[A](body: => A): A = {
    spark.conf.set(graft.plans.WindowTopKRewrite.EnabledConf, "false")
    try body finally spark.conf.unset(graft.plans.WindowTopKRewrite.EnabledConf)
  }

  test("rn <= k rewrites to the bounded-heap operator, results identical to the plain window") {
    val q = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
    assert(hasTopK(q), "expected the rewrite to fire")
    val got = q.collect().map(_.toString).toSeq
    val want = runWithRuleOff {
      val p = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
      assert(!hasTopK(p), "kill-switch must disable the rewrite")
      p.collect().map(_.toString).toSeq
    }
    assert(got == want)
    // The surviving rows' recomputed ranks are exactly 1..k per key.
    val q2 = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    assert(q2.groupBy("o_custkey").agg(max("rn"), count(lit(1))).collect()
      .forall(r => r.getInt(1) == r.getLong(2).toInt))
  }

  test("rn = 1 (latest-state shape) and a compound conjunct both rewrite; rank values survive") {
    val one = orders.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(hasTopK(one))
    assert(one.count() == orders.select("o_custkey").distinct().count())
    val compound = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2 && col("o_totalprice") > 0.0)
    assert(hasTopK(compound))
    val direct = runWithRuleOff {
      orders.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2 && col("o_totalprice") > 0.0).count()
    }
    assert(compound.count() == direct)
  }

  test("SQL QUALIFY-style subquery form rewrites too") {
    orders.createOrReplaceTempView("wtk_orders")
    try {
      val q = spark.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice FROM (
          |  SELECT *, row_number() OVER (
          |    PARTITION BY o_custkey
          |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          |  FROM wtk_orders) WHERE rn <= 3""".stripMargin)
      assert(hasTopK(q))
      assert(q.count() == runWithRuleOff {
        SparkEntry.queries("top_orders_per_customer")(spark, sfDir).count()
      })
    } finally spark.catalog.dropTempView("wtk_orders")
  }

  test("negative: OR-predicates, rank(), multi-expression windows, global windows stay sort-based") {
    // Disjunction: rows past k can still pass — must not prune.
    val disj = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3 || col("o_totalprice") > 100.0)
    assert(!hasTopK(disj))
    // rank() keeps boundary ties — a row_number heap would drop them.
    val rk = orders.withColumn("r", rank().over(w)).filter(col("r") <= 3)
    assert(!hasTopK(rk))
    // A second window expression must keep the full input.
    val multi = orders
      .withColumn("rn", row_number().over(w))
      .withColumn("mx", max("o_totalprice").over(
        org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")))
      .filter(col("rn") <= 3)
    val multiPlan = { multi.collect(); multi.queryExecution.optimizedPlan.toString }
    // the rn window may still rewrite independently of the mx window —
    // what must NOT happen is the mx window seeing a pruned input; pin
    // by comparing against the rule-off result instead of the plan.
    val multiGot = multi.orderBy("o_orderkey", "rn").collect().map(_.toString).toSeq
    val multiWant = runWithRuleOff {
      orders.withColumn("rn", row_number().over(w))
        .withColumn("mx", max("o_totalprice").over(
          org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")))
        .filter(col("rn") <= 3).orderBy("o_orderkey", "rn")
        .collect().map(_.toString).toSeq
    }
    assert(multiGot == multiWant, multiPlan)
    // Unpartitioned window (global top-k): not this operator's job.
    val global = orders.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rn") <= 3)
    assert(!hasTopK(global))
  }

  test("k above rewriteMaxK keeps the sort-based window") {
    spark.conf.set(graft.plans.WindowTopKRewrite.MaxKConf, "2")
    try {
      val q = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      assert(!hasTopK(q))
      val q2 = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      assert(hasTopK(q2))
    } finally spark.conf.unset(graft.plans.WindowTopKRewrite.MaxKConf)
  }
}
