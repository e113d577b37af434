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

  test("ranksDirected redistributes dangling mass (hand-computed 3-node chain)") {
    import spark.implicits._
    // 1→2, 1→3, 2→3: node 3 is dangling (dst, never src). N = 3.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val got = PageRank.ranksDirected(edges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Round 1: inflow 2←5e8, 3←1.5e9; dmass = 1e9, dshare = 333333333.
    //   pr(1)=433333333, pr(2)=858333333, pr(3)=1708333333.
    // Round 2: inflow 2←216666666, 3←216666666+858333333=1074999999;
    //   dmass = 1708333333, dshare = 569444444.
    //   pr(1)=634027777, pr(2)=818194443, pr(3)=1547777776.
    assert(got == Map(1L -> 634027777L, 2L -> 818194443L, 3L -> 1547777776L),
      s"got $got")
    graft.util.Views.unpersistAll()
  }

  test("ranksDirected with no dangling nodes: teleport pool stays zero") {
    import spark.implicits._
    // 2-cycle: both directions, no dangling — one round must equal the
    // undirected loop's update (inflow-only, dshare 0).
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val dir = PageRank.ranksDirected(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val und = PageRank.ranks(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dir == und, s"directed $dir != undirected $und on a dangling-free graph")
    graft.util.Views.unpersistAll()
  }

  test("stored tiers equal the in-query loops; per-round edge side is exchange-free") {
    import spark.implicits._
    // Reuse the sf fixture's bipartite co-purchase shape at tiny scale:
    // directed part→supplier edges (suppliers dangle), undirected union.
    val raw = Sources.lineitem(spark, sfDir)
      .select((col("l_partkey").cast("long") * 2).as("src"),
        (col("l_suppkey").cast("long") * 2 + 1).as("dst"))
      .distinct()
    val und = raw.union(raw.select(col("dst").as("src"), col("src").as("dst")))
    val inQ = PageRank.ranks(und, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val et = graph.EdgeStore.ensureDegreeEdges(spark, sfDir, "copurch_und", {
      val e0 = Sources.lineitem(spark, sfDir)
        .select((col("l_partkey").cast("long") * 2).as("src"),
          (col("l_suppkey").cast("long") * 2 + 1).as("dst"))
        .distinct()
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    }, requireNoDangling = true)
    val st = PageRank.ranksStored(spark, et, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(st === inQ)
    // write-once: re-ensure probes the marker, never rebuilds
    val builds0 = util.Artifacts.builds.get
    graph.EdgeStore.ensureDegreeEdges(spark, sfDir, "copurch_und",
      sys.error("must not be evaluated on a marker hit"))
    assert(util.Artifacts.builds.get === builds0)
    // THE layout property: one round's rank⋈edges join plans NO exchange
    // on the bucketed edge scan — only the (node-sized) rank side moves.
    val eDeg = spark.table(et)
    val cur = inQ.toSeq.toDF("node", "pr")
    val j = eDeg.join(cur, col("src") === col("node"))
      .select(col("dst"), expr("pr div outdeg").as("c"))
      .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(src"),
      s"edge scan must not be re-shuffled on src:\n$plan")
    assert(plan.contains("SelectedBucketsCount"),
      s"edge side must read the bucketed layout:\n$plan")
    // directed twin
    val inQd = PageRank.ranksDirected(raw, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def raw2 = Sources.lineitem(spark, sfDir)
      .select((col("l_partkey").cast("long") * 2).as("src"),
        (col("l_suppkey").cast("long") * 2 + 1).as("dst"))
      .distinct()
    val etd = graph.EdgeStore.ensureDegreeEdges(spark, sfDir, "copurch_dir", raw2)
    val ntd = graph.EdgeStore.ensureNodeTable(spark, sfDir, "copurch_dir", raw2)
    val std = PageRank.ranksDirectedStored(spark, etd, ntd, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(std === inQd)
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
