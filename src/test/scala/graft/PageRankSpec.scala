package graft

import org.apache.spark.sql.functions._

/** [[graft.graph.PageRank]] — integer power iteration over an edge list.
  * Hand-computed star fixture pins the exact integer arithmetic (the
  * same numbers the DuckDB oracle must reproduce); structural cases pin
  * symmetry, mass conservation, and the dangling-node guard. */
class PageRankSpec extends SparkSpec {
  import graft.graph.PageRank

  private def edgesOf(pairs: (Long, Long)*) = {
    import spark.implicits._
    val und = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    und.toDF("src", "dst")
  }

  test("star graph: one round matches the hand-computed integer update") {
    // a(0) — b(1), c(2), d(3). deg(a)=3, deg(b,c,d)=1.
    // r1(a)   = 0.15e9 + (85 * 3*(1e9 div 1)) div 100 = 2_700_000_000
    // r1(b..) = 0.15e9 + (85 * (1e9 div 3))   div 100 =   433_333_333
    val r = PageRank.ranks(edgesOf((0L, 1L), (0L, 2L), (0L, 3L)), iters = 1)
      .orderBy("node").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(r === Array(
      (0L, 2700000000L), (1L, 433333333L), (2L, 433333333L), (3L, 433333333L)))
    graft.util.Views.unpersistAll()
  }

  test("symmetric nodes get identical ranks; hub outranks leaves over rounds") {
    val r = PageRank.ranks(
      edgesOf((0L, 1L), (0L, 2L), (0L, 3L), (3L, 4L)), iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) === r(2L)) // symmetric leaves
    assert(r(0L) > r(3L) && r(3L) > r(1L) && r(3L) > r(4L))
    graft.util.Views.unpersistAll()
  }

  test("rank mass is conserved up to integral-divide truncation") {
    val edges = edgesOf((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L))
    val n = 4L
    val total = PageRank.ranks(edges, iters = 3)
      .agg(sum("pr")).collect()(0).getLong(0)
    // Exact mass is n*1e9; each div truncates < 1 unit per edge per
    // round, damped by 0.85 — the loss bound is tiny and one-sided.
    assert(total <= n * PageRank.UnitRank)
    assert(total > n * PageRank.UnitRank - 1000L)
    graft.util.Views.unpersistAll()
  }

  test("dangling destination fails loudly") {
    import spark.implicits._
    val directed = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst") // 2 never a src
    val ex = intercept[IllegalArgumentException] {
      PageRank.ranks(directed, iters = 1)
    }
    assert(ex.getMessage.contains("dangling"))
    graft.util.Views.unpersistAll()
  }

  test("ranksSql replay matches the Spark loop on the star fixture") {
    // The generated SQL is DuckDB-dialect; here we only pin that the
    // generator wires the same constants/iteration count the Spark loop
    // uses (full cross-engine equality is the driver gate's job via the
    // graph_pagerank query).
    val sql = PageRank.ranksSql("SELECT 1 AS src, 2 AS dst", iters = 3)
    assert(sql.contains("r3 AS") && !sql.contains("r4 AS"))
    assert(sql.contains(PageRank.UnitRank.toString))
    assert(sql.contains(PageRank.TeleportQ.toString))
    assert(sql.contains("// 100") && sql.contains("pr // e.outdeg"))
  }
}
