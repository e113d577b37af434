package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** [[graft.util.Ranks]] — the distributed two-phase rank/ntile/prefix-sum
  * must equal its global-window counterparts BIT-FOR-BIT (that identity
  * is what lets the `_scaled` twins share their originals' oracles), and
  * its plans must never contain an unpartitioned window. */
class RanksSpec extends SparkSpec {
  import graft.util.Ranks

  // deterministic pseudo-random frame with TIES in the value column (the
  // tiebreaker column must adjudicate them identically on both paths)
  private lazy val df = {
    import spark.implicits._
    (1L to 257L).map(i => (i, (i * 37 % 19).toInt, (i * 13 % 100).toInt))
      .toDF("id", "v", "w").cache()
  }

  test("withGlobalRank equals the global row_number window, ties included") {
    val win = df.withColumn("rank",
      row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Ranks.withGlobalRank(df, "rank", col("v"), col("id"))
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === win)
    graft.util.Views.unpersistAll()
  }

  test("ntileExact equals ntile for several k, asc and desc") {
    for (k <- Seq(2, 5, 10, 300)) { // 300 > n exercises the base=0 edge
      val win = df.withColumn("b",
        ntile(k).over(Window.orderBy(col("v").desc, col("id"))))
        .select("id", "b").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = Ranks.ntileExact(df, "b", k, col("v").desc, col("id"))
        .select("id", "b").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === win, s"k=$k")
      graft.util.Views.unpersistAll()
    }
  }

  test("withGlobalPrefixSum equals the global running-sum window") {
    val win = df.withColumn("cum",
      sum(col("w")).over(Window.orderBy(col("v"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Ranks.withGlobalPrefixSum(df, "cum", col("w"), col("v"), col("id"))
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === win)
    graft.util.Views.unpersistAll()
  }

  test("no Ranks plan contains an unpartitioned window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val plans = Seq(
      Ranks.withGlobalRank(df, "r", col("v"), col("id")),
      Ranks.ntileExact(df, "b", 5, col("v"), col("id")),
      Ranks.withGlobalPrefixSum(df, "c", col("w"), col("v"), col("id")))
    plans.foreach { p =>
      val bad = p.queryExecution.optimizedPlan.collectWithSubqueries {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty, "Ranks must never plan a global window")
    }
    graft.util.Views.unpersistAll()
  }
}
