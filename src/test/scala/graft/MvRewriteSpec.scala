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
    // Hermetic registry: the star-schema MV (grain incl. l_suppkey) may
    // have been registered by another suite's query run in the shared
    // session — under it, groupBy(l_suppkey) is LEGITIMATELY eligible.
    // This test pins the (l_returnflag, l_linestatus) MV's negatives.
    plans.MvRegistry.clear()
    plans.Mv.ensureLineitemMv(spark, sfDir)
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

  // ----------------------------------------------------- star schema

  private def dimAll = Sources.supplier(spark, sfDir)
  private def dim = dimAll.filter(col("s_nationkey") < 5)

  private def starQuery: DataFrame = fact
    .join(dim, col("l_suppkey") === col("s_suppkey"))
    .groupBy("l_returnflag")
    .agg(
      sum(util.Stable.dec2(col("l_quantity"))).cast("double").as("sum_qty"),
      count(lit(1)).as("n_rows"))
    .orderBy("l_returnflag")

  private def hitsSuppMv(df: DataFrame): Boolean = {
    val paths = scanPaths(df)
    paths.exists(_.contains("graft_mv_lineitem_supp")) &&
      !paths.exists(_.endsWith("lineitem.parquet"))
  }
  private def hitsFactJoin(df: DataFrame): Boolean = {
    val paths = scanPaths(df)
    paths.exists(_.endsWith("lineitem.parquet")) &&
      !paths.exists(_.contains("graft_mv_lineitem_supp"))
  }

  test("star-schema aggregate over a key-preserving dim join re-plans onto MV ⋈ dim") {
    plans.Mv.ensureLineitemSuppMv(spark, sfDir)
    assert(hitsSuppMv(starQuery), s"expected MV scan, got ${scanPaths(starQuery)}")
    val viaMv = starQuery.collect().map(_.toSeq).toSeq
    val viaFact = withRuleDisabled {
      assert(hitsFactJoin(starQuery), "disabled rule must leave the fact join")
      starQuery.collect().map(_.toSeq).toSeq
    }
    assert(viaMv == viaFact)
    assert(viaMv.nonEmpty)
  }

  test("star-schema: dim predicate ABOVE the join transplants too") {
    plans.Mv.ensureLineitemSuppMv(spark, sfDir)
    val q = fact
      .join(dimAll, col("l_suppkey") === col("s_suppkey"))
      .filter(col("s_nationkey") < 5) // above-join dim predicate
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
    assert(hitsSuppMv(q), s"expected MV scan, got ${scanPaths(q)}")
    val got = q.collect().map(_.toSeq).toSeq
    val exp = withRuleDisabled(q.collect().map(_.toSeq).toSeq)
    assert(got == exp)
  }

  test("star-schema ineligibilities all block the rewrite") {
    plans.Mv.ensureLineitemSuppMv(spark, sfDir)
    // Non-key-preserving join: the condition is NOT the declared
    // (l_suppkey = s_suppkey) pair — joining on the part key against the
    // supplier key can drop/duplicate fact groups arbitrarily.
    assert(hitsFactJoin(fact
      .join(dim, col("l_partkey") === col("s_suppkey"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))))
    // Dim-column grouping: s_nationkey is not in the MV grain.
    assert(hitsFactJoin(fact
      .join(dim, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_nationkey").agg(count(lit(1)).as("n"))))
    // Dim column inside the aggregate list.
    assert(hitsFactJoin(fact
      .join(dim, col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_returnflag")
      .agg(sum(util.Stable.dec2(col("s_acctbal"))).as("b"))))
    // Non-grain FACT predicate above the join still selects partial groups.
    assert(hitsFactJoin(fact
      .join(dim, col("l_suppkey") === col("s_suppkey"))
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))))
    // Outer join: null-extended rows are not the key-preserving contract.
    assert(hitsFactJoin(fact
      .join(dim, col("l_suppkey") === col("s_suppkey"), "left")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))))
    // Unregistered dimension (nation is not a declared MvDim of this MV).
    assert(hitsFactJoin(fact
      .join(Sources.nation(spark, sfDir), col("l_suppkey") === col("n_nationkey"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))))
  }

  // ------------------------------------------- multi-dim star chains

  private def partDim = Sources.part(spark, sfDir).filter(col("p_size") < 25)

  private def twoDimQuery: DataFrame = fact
    .join(dim, col("l_suppkey") === col("s_suppkey"))
    .join(partDim, col("l_partkey") === col("p_partkey"))
    .groupBy("l_returnflag")
    .agg(
      sum(util.Stable.dec2(col("l_quantity"))).cast("double").as("sum_qty"),
      count(lit(1)).as("n_rows"))
    .orderBy("l_returnflag")

  private def hitsSuppPartMv(df: DataFrame): Boolean = {
    val paths = scanPaths(df)
    paths.exists(_.contains("graft_mv_lineitem_supp_part")) &&
      !paths.exists(_.endsWith("lineitem.parquet"))
  }
  private def hitsFact2(df: DataFrame): Boolean = {
    val paths = scanPaths(df)
    paths.exists(_.endsWith("lineitem.parquet")) &&
      !paths.exists(_.contains("graft_mv_lineitem_supp_part"))
  }

  test("two-dim star chain re-plans onto MV ⋈ supplier ⋈ part") {
    plans.Mv.ensureLineitemSuppPartMv(spark, sfDir)
    assert(hitsSuppPartMv(twoDimQuery),
      s"expected 2-dim MV scan, got ${scanPaths(twoDimQuery)}")
    val viaMv = twoDimQuery.collect().map(_.toSeq).toSeq
    val viaFact = withRuleDisabled {
      assert(hitsFact2(twoDimQuery), "disabled rule must leave the fact join")
      twoDimQuery.collect().map(_.toSeq).toSeq
    }
    assert(viaMv == viaFact)
    assert(viaMv.nonEmpty)
    // A dim predicate BETWEEN the joins (above supplier, below part)
    // transplants at its level — it may reference the already-joined dim.
    val q2 = fact
      .join(dimAll, col("l_suppkey") === col("s_suppkey"))
      .filter(col("s_nationkey") < 10)
      .join(partDim, col("l_partkey") === col("p_partkey"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
    assert(hitsSuppPartMv(q2), s"expected 2-dim MV scan, got ${scanPaths(q2)}")
    assert(q2.collect().map(_.toSeq).toSeq ===
      withRuleDisabled(q2.collect().map(_.toSeq).toSeq))
  }

  test("a mixed eligible/ineligible chain blocks the WHOLE rewrite") {
    plans.Mv.ensureLineitemSuppPartMv(spark, sfDir)
    // Supplier leg eligible, part leg joined on a NON-declared key pair.
    assert(hitsFact2(fact
      .join(dim, col("l_suppkey") === col("s_suppkey"))
      .join(partDim, col("l_suppkey") === col("p_partkey"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))))
    // An unregistered dimension INSIDE the chain (nation) poisons it even
    // though the outer part leg is declared.
    assert(hitsFact2(fact
      .join(Sources.nation(spark, sfDir), col("l_suppkey") === col("n_nationkey"))
      .join(partDim, col("l_partkey") === col("p_partkey"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))))
    // Grouping by an outer dim's column blocks the chain like the
    // single-dim case.
    assert(hitsFact2(fact
      .join(dim, col("l_suppkey") === col("s_suppkey"))
      .join(partDim, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").agg(count(lit(1)).as("n"))))
    // An outer join anywhere in the chain blocks it.
    assert(hitsFact2(fact
      .join(dim, col("l_suppkey") === col("s_suppkey"))
      .join(partDim, col("l_partkey") === col("p_partkey"), "left")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))))
  }
}
