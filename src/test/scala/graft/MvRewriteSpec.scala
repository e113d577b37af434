package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

/** Pins the rollup-MV rewrite's BOTH directions: eligible aggregates
  * re-plan onto the MV scan (the oracle can't see this — a silently
  * dead rule still returns correct rows off the fact), and every
  * ineligibility condition leaves the fact scan in place (a rewrite
  * that over-fires returns fast wrong answers). */
class MvRewriteSpec extends SparkSpec with BeforeAndAfterAll {

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toUri.getPath)
        case _ => Seq.empty
      }
    }.flatten

  private def hitsMv(df: DataFrame): Boolean = {
    val paths = scanPaths(df)
    paths.exists(_.contains("graft_mv_lineitem")) &&
      !paths.exists(_.endsWith("lineitem.parquet"))
  }
  private def hitsFact(df: DataFrame): Boolean = {
    val paths = scanPaths(df)
    paths.exists(_.endsWith("lineitem.parquet")) &&
      !paths.exists(_.contains("graft_mv_lineitem"))
  }

  private def fact = Sources.lineitem(spark, sfDir)

  override def beforeAll(): Unit = plans.Mv.ensureLineitemMv(spark, sfDir)
  override def afterAll(): Unit = plans.MvRegistry.clear()

  private def withRuleDisabled[T](body: => T): T = {
    spark.conf.set(plans.MvRewrite.EnabledConf, "false")
    try body finally spark.conf.set(plans.MvRewrite.EnabledConf, "true")
  }

  private def rollup: DataFrame = fact
    .groupBy("l_returnflag")
    .agg(
      sum(util.Stable.dec2(col("l_quantity"))).cast("double").as("sum_qty"),
      count(lit(1)).as("n_rows"))
    .orderBy("l_returnflag")

  test("grain-subset rollup re-plans onto the MV and matches the fact-scan result") {
    assert(hitsMv(rollup), s"expected MV scan, got ${scanPaths(rollup)}")
    val viaMv = rollup.collect().map(_.toSeq).toSeq
    val viaFact = withRuleDisabled {
      assert(hitsFact(rollup), "disabled rule must leave the fact scan")
      rollup.collect().map(_.toSeq).toSeq
    }
    assert(viaMv == viaFact)
  }

  test("empty grouping (global rollup) re-plans and count survives via coalesce(sum)") {
    val global = fact.agg(count(lit(1)).as("n"),
      sum(util.Stable.dec2(col("l_quantity"))).cast("double").as("q"))
    assert(hitsMv(global))
    val Array(row) = global.collect()
    val Array(exp) = withRuleDisabled(global.collect())
    assert(row.toSeq == exp.toSeq)
  }

  test("grain predicate transplants onto the MV; min/max re-aggregate under an outer expression") {
    val filtered = fact.filter(col("l_linestatus") === "F")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        unix_micros(min(col("l_shipdate")).cast("timestamp")).as("lo"),
        unix_micros(max(col("l_shipdate")).cast("timestamp")).as("hi"))
      .orderBy("l_returnflag")
    assert(hitsMv(filtered))
    val got = filtered.collect().map(_.toSeq).toSeq
    val exp = withRuleDisabled(filtered.collect().map(_.toSeq).toSeq)
    assert(got == exp)
  }

  test("every ineligibility blocks the rewrite") {
    // Non-grain predicate: selects PARTIAL groups — must stay on the fact.
    assert(hitsFact(fact
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))))
    // Unregistered sum column.
    assert(hitsFact(fact.groupBy("l_returnflag")
      .agg(sum(util.Stable.dec2(col("l_tax"))).as("t"))))
    // Non-grain grouping column.
    assert(hitsFact(fact.groupBy("l_suppkey").agg(count(lit(1)).as("n"))))
    // DISTINCT aggregate: not derivable from sum/count partials.
    assert(hitsFact(fact.groupBy("l_returnflag")
      .agg(countDistinct(col("l_suppkey")).as("d"))))
    // count(col) counts non-nulls — not the stored count(*) partial.
    assert(hitsFact(fact.groupBy("l_returnflag")
      .agg(count(col("l_suppkey")).as("c"))))
    // Expression sum (not a bare/cast column): no registered state.
    assert(hitsFact(fact.groupBy("l_returnflag")
      .agg(sum(col("l_quantity") * col("l_tax")).as("x"))))
  }

  test("conf kill-switch disables the rewrite end-to-end") {
    withRuleDisabled(assert(hitsFact(rollup)))
  }
}
