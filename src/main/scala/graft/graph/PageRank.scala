package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list — the second iterative
  * graph primitive beside connected components ([[graft.dedup.Dedup
  * .clusters]]'s min-label propagation). Where components answer "which
  * docs are the same", PageRank answers "which nodes matter" —
  * centrality over a citation/link/co-occurrence graph is a standard
  * training-data curation signal (rank-weighted sampling of a crawl
  * graph).
  *
  * ALL ARITHMETIC IS INTEGER. Ranks live in 1e-9 units (rank 1.0 ==
  * 1_000_000_000L); a contribution is `pr div outdeg` (integral
  * divide), the damped update is `0.15e9 + (85 * inflow) div 100`.
  * Floating-point PageRank is summation-order dependent — a parallel
  * engine cannot reproduce it run-to-run, let alone cross-engine; the
  * integer form is exactly reproducible on any engine and the oracle
  * replays it in DuckDB with `//` to the last unit. Truncation loses
  * < 1 unit (1e-9) per edge per round — immaterial for ranking, decisive
  * for verifiability.
  *
  * Scale shape (the loop mirrors the clusters() discipline):
  *  - The degree-annotated edge list is computed ONCE, repartitioned on
  *    `src` at the loop's width, and materialized — every round's join
  *    probes it co-partitioned, so the static side never re-shuffles.
  *  - Each round is one co-partitioned join (ranks repartitioned on the
  *    same key/width) + one keyed aggregation — shuffle volume scales
  *    with |E| per round, never |E|·rounds accumulated lineage:
  *    rounds materialize (persist + lineage-truncate via the shared
  *    [[graft.util.Views]] registry) and the retired round is unpersisted
  *    in-loop, exactly one live rank table at any time.
  *  - Iteration count is FIXED (power iteration with damping 0.85
  *    converges geometrically; curation needs stable ordering, not
  *    1e-12 residuals), so no driver-side convergence probe is needed.
  *  - No node list is collected; [[ranks]] serves undirected
  *    (both-directions) edge lists, which cannot have dangling nodes —
  *    a `require` fails loudly if any `dst` never appears as `src`.
  *    Directed graphs (crawl/link/citation) go through
  *    [[ranksDirected]], which redistributes dangling mass via the
  *    teleport pool instead of rejecting it.
  */
object PageRank {

  val UnitRank = 1000000000L // 1.0 in 1e-9 units
  val TeleportQ = 150000000L // 0.15 in 1e-9 units

  /** Persist + lineage-truncate one round's rank table (register in the
    * shared Views registry so suite hygiene can reclaim it; the caller
    * unpersists the retired round in-loop). */
  private def materializeRound(df: DataFrame): (DataFrame, DataFrame) = {
    val p = graft.util.Views.register(
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    (org.apache.spark.sql.GraftColumnBridge.lineageTruncated(p), p)
  }

  /** PageRank over a PUBLISHED degree-annotated edge table
    * ([[EdgeStore.ensureDegreeEdges]] — `(src, dst, outdeg)` bucketed by
    * src, dangling-checked at build time): the serving tier of the
    * stored-artifact discipline. Every round's rank⋈edges join reads the
    * edge side EXCHANGE-FREE from the bucketed scan (the in-query tier
    * reshuffles the frame it derived), and the contribution aggregate
    * map-side combines before its one exchange of per-partition partials
    * — so per-round shuffle is O(nodes), never O(edges), at any corpus
    * size. Identical recurrence and constants to [[ranks]] — same oracle.
    */
  def ranksStored(spark: SparkSession, edgeTable: String,
                  iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val eDeg = spark.table(edgeTable)
    // Seed from the bucketed scan: distinct over src is exchange-free.
    val seed = eDeg.select(col("src").as("node")).distinct()
      .withColumn("pr", lit(UnitRank))
    var (cur, cached) = materializeRound(seed)
    cached.count()
    for (_ <- 1 to iters) {
      // No explicit repartitions: EnsureRequirements shuffles ONLY the
      // (node-sized) rank side to the edge scan's bucket partitioning,
      // and groupBy's partial aggregation combines contributions
      // map-side (the in-query tier's pre-aggregate repartition would
      // ship one RAW row per edge).
      val contribs = eDeg
        .join(cur, col("src") === col("node"))
        .select(col("dst"), expr("pr div outdeg").as("c"))
      val next = contribs
        .groupBy(col("dst").as("node"))
        .agg((lit(TeleportQ) + expr("(85 * sum(c)) div 100")).as("pr"))
      val (nRanks, nCached) = materializeRound(next)
      nCached.count()
      cached.unpersist()
      cur = nRanks
      cached = nCached
    }
    cur
  }

  /** Directed PageRank over PUBLISHED edge + node tables
    * ([[EdgeStore.ensureDegreeEdges]] / [[EdgeStore.ensureNodeTable]]) —
    * the stored twin of [[ranksDirected]], identical recurrence
    * including the per-round dangling-mass scalar. The teleport join's
    * node side reads exchange-free from the node-bucketed scan; N is a
    * one-time count over it. */
  def ranksDirectedStored(spark: SparkSession, edgeTable: String,
                          nodeTable: String, iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val eDeg = spark.table(edgeTable)
    val nodes = spark.table(nodeTable)
    val nNodes = nodes.count()
    val seed = nodes.select(col("node"), col("odeg"))
      .withColumn("pr", lit(UnitRank))
    var (cur, cached) = materializeRound(seed)
    cached.count()
    for (_ <- 1 to iters) {
      val inflow = eDeg
        .join(cur, col("src") === col("node"))
        .select(col("dst"), expr("pr div outdeg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("inflow"))
      val dShare = cur.agg(
        expr(s"coalesce(sum(CASE WHEN odeg = 0 THEN pr END), 0L) div $nNodes")
          .as("dshare"))
      val next = nodes
        .join(inflow, col("node") === col("dst"), "left")
        .crossJoin(broadcast(dShare))
        .select(col("node"), col("odeg"),
          (lit(TeleportQ) +
            expr("(85 * (coalesce(inflow, 0L) + dshare)) div 100")).as("pr"))
      val (nRanks, nCached) = materializeRound(next)
      nCached.count()
      cached.unpersist()
      cur = nRanks
      cached = nCached
    }
    cur.select("node", "pr")
  }

  /** Rank nodes of the graph given by `edges` (cols `src`, `dst`, both
    * directions present for an undirected graph). Returns (node, pr)
    * with pr in 1e-9 units after `iters` damped power-iteration rounds
    * from a uniform start. */
  def ranks(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val spark = edges.sparkSession
    val sessionWidth = spark.conf.get("spark.sql.shuffle.partitions").toInt

    // Materialize the raw edge list once (the caller's derivation —
    // often a distinct over a fact table — must not recompute per round),
    // sizing the loop width off its measured cardinality (same rationale
    // as the cluster loop: the graph is usually far smaller than the
    // corpus that produced it; session-width rounds would be
    // scheduling-bound). One partition per ~512k edges, capped at the
    // session width — the sf1 rehearsal (SCALE.md) measured the earlier
    // 4M-edge budget leaving a 2M-edge graph's whole 3-round loop on ONE
    // partition (single-thread joins, 33 s); edge rows are two longs, so
    // a 512k budget keeps partitions comfortably small while the cap
    // still prevents scheduling-bound tiny rounds.
    val (eMat, nEdges) = graft.util.Views.materializeCounted(
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")))
    val loopWidth =
      math.max(1L, math.min(sessionWidth.toLong, nEdges / 524288L + 1)).toInt
    // The degree-annotated static side is cached ALREADY at the loop's
    // key and width — every round's join probes it with no new exchange.
    // ONE edge-set exchange builds it (round 13): repartition FIRST,
    // then both the degree aggregate and the annotate join run
    // exchange-free on the src-clustered frame (join-then-repartition
    // exchanged the full edge set three times — both join inputs at
    // session width, then the width move).
    val eW = eMat.repartition(loopWidth, col("src"))
    val eDegLoop = graft.util.Views.materialize(
      eW.join(eW.groupBy("src").agg(count(lit(1)).as("outdeg")), "src"))

    // Dangling probe: every dst must emit in some round, i.e. appear as
    // a src. An anti-join that survives means rank mass drains. The src
    // side reads the loop-cached frame exchange-free (already clustered
    // by src); only the dst side pays its distinct's exchange.
    val srcs = eDegLoop.select("src").distinct()
    val dangling = eMat.select(col("dst").as("src")).distinct()
      .join(srcs, Seq("src"), "left_anti")
    require(dangling.isEmpty,
      "PageRank.ranks: graph has dangling nodes (dst never a src) — " +
        "pass both edge directions for an undirected graph, or add " +
        "self-loops/teleport handling for a directed one")

    val seed = srcs.select(col("src").as("node"))
      .withColumn("pr", lit(UnitRank))
    var (cur, cached) = materializeRound(seed)
    cached.count() // fill the seed cache before the loop fans out over it

    for (_ <- 1 to iters) {
      val contribs = eDegLoop
        .join(cur.repartition(loopWidth, col("node")),
          col("src") === col("node"))
        .select(col("dst"), expr("pr div outdeg").as("c"))
      // No pre-aggregate repartition (round 13): repartitioning contribs
      // before the groupBy shipped one RAW row per EDGE per round —
      // measured 73 MB over 3 rounds at sf0.1 vs the stored tier's 12 MB
      // on the same graph — because the explicit exchange sits below the
      // aggregate and defeats map-side partial aggregation. A plain
      // groupBy combines per map partition first, so the exchange
      // carries per-partition PARTIALS (O(nodes) per round, the
      // ranksStored shape). The narrow loop width still holds where it
      // matters — the join's inputs — via the cur/eDegLoop repartitions.
      val next = contribs
        .groupBy(col("dst").as("node"))
        .agg((lit(TeleportQ) + expr("(85 * sum(c)) div 100")).as("pr"))
      val (nRanks, nCached) = materializeRound(next)
      nCached.count() // materialize THIS round before retiring the last
      cached.unpersist()
      cur = nRanks
      cached = nCached
    }
    cur
  }

  /** Directed PageRank with DANGLING-MASS redistribution — the real
    * crawl/link-graph form ([[ranks]] serves undirected graphs, where
    * dangling nodes cannot exist and are `require`-rejected). A dangling
    * node (outdeg 0) emits its whole rank to the teleport pool each
    * round; the pool is split evenly across ALL nodes (integer div —
    * same 1e-9-unit discipline, exactly reproducible cross-engine):
    *
    *   pr'(v) = 0.15e9 + (85 · (inflow(v) + dmass div N)) div 100
    *
    * Scale shape mirrors [[ranks]]: static degree-annotated edges
    * materialized once at loop key/width; per round ONE co-partitioned
    * join + keyed agg for inflow, ONE map-side scalar agg for the
    * dangling mass (a 1-row broadcast — never a driver collect), one
    * left join to give inflow-less nodes their teleport row. The node
    * list (src ∪ dst) is materialized once; N is a build-time count. */
  def ranksDirected(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val spark = edges.sparkSession
    val sessionWidth = spark.conf.get("spark.sql.shuffle.partitions").toInt

    val (eMat, nEdges) = graft.util.Views.materializeCounted(
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")))
    val loopWidth =
      math.max(1L, math.min(sessionWidth.toLong, nEdges / 524288L + 1)).toInt
    // Same one-exchange build as [[ranks]] (round 13): cluster the edge
    // set by src once; the degree aggregate and the annotate join then
    // run exchange-free on it.
    val eW = eMat.repartition(loopWidth, col("src"))
    val outdeg = eW.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val eDegLoop = graft.util.Views.materialize(eW.join(outdeg, "src"))
    // Node universe (src ∪ dst) with each node's outdeg (0 = dangling),
    // already at the loop's key/width — the static left side of every
    // round's teleport join. Distinct FIRST (its partial aggregate is
    // the byte reducer — an A/B repartitioning the raw union before the
    // distinct shipped +4 MB), then one NODE-SIZED repartition so the
    // outdeg join and every loop consumer read it co-partitioned.
    // `odeg`, not `outdeg`: the rank rows carry it through the loop and
    // must not collide with the edge side's `outdeg` in the inflow join.
    val (nodesMat, nNodes) = graft.util.Views.materializeCounted(
      eMat.select(col("src").as("node"))
        .unionAll(eMat.select(col("dst").as("node"))).distinct()
        .repartition(loopWidth, col("node"))
        .join(outdeg.withColumnRenamed("src", "node"), Seq("node"), "left")
        .select(col("node"), coalesce(col("outdeg"), lit(0L)).as("odeg")))

    val seed = nodesMat.select(col("node"), col("odeg"))
      .withColumn("pr", lit(UnitRank))
    var (cur, cached) = materializeRound(seed)
    cached.count()

    for (_ <- 1 to iters) {
      val curW = cur.repartition(loopWidth, col("node"))
      // Same no-pre-aggregate-repartition rule as [[ranks]] (round 13):
      // let groupBy partial-aggregate map-side instead of shipping one
      // raw row per edge into an explicit exchange. The POST-aggregate
      // repartition is node-sized and keeps the teleport join below
      // co-partitioned with the cached node table at the loop's width
      // (without it the join re-exchanged nodesMat every round and the
      // A/B read +1.1 s despite 12 MB less shuffle).
      val inflow = eDegLoop
        .join(curW, col("src") === col("node"))
        .select(col("dst"), expr("pr div outdeg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("inflow"))
        .repartition(loopWidth, col("dst"))
      // Dangling mass: one partial-aggregated scalar over the rank table
      // (odeg rides IN the rank rows, so no join here), broadcast as a
      // 1-row frame. Empty-safe: coalesce to 0 when nothing dangles.
      // Integer div — `/` would be IEEE division on longs.
      val dShare = cur.agg(
        expr(s"coalesce(sum(CASE WHEN odeg = 0 THEN pr END), 0L) div $nNodes")
          .as("dshare"))
      val next = nodesMat
        .join(inflow, col("node") === col("dst"), "left")
        .crossJoin(broadcast(dShare))
        .select(col("node"), col("odeg"),
          (lit(TeleportQ) +
            expr("(85 * (coalesce(inflow, 0L) + dshare)) div 100")).as("pr"))
      val (nRanks, nCached) = materializeRound(next)
      nCached.count()
      cached.unpersist()
      cur = nRanks
      cached = nCached
    }
    cur.select("node", "pr")
  }

  /** The DuckDB replay of [[ranksDirected]]: chained CTEs, same integer
    * arithmetic including the per-round dangling-mass scalar (`//` ≡
    * `div`/long-division on the all-positive rank domain). */
  def ranksDirectedSql(edgesSql: String, iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""dm$i AS MATERIALIZED (
         |  SELECT CAST(coalesce(sum(CASE WHEN outdeg = 0 THEN pr END), 0)
         |    // (SELECT cnt FROM n) AS BIGINT) AS dshare
         |  FROM r${i - 1}),
         |r$i AS MATERIALIZED (
         |  SELECT nd.node, nd.outdeg,
         |    CAST($TeleportQ + (85 * (coalesce(i.inflow, 0) + dm.dshare)) // 100
         |      AS BIGINT) AS pr
         |  FROM nodes nd CROSS JOIN dm$i dm
         |  LEFT JOIN (
         |    SELECT e.dst, sum(r.pr // e.outdeg) AS inflow
         |    FROM e JOIN r${i - 1} r ON r.node = e.src GROUP BY 1) i
         |    ON i.dst = nd.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS MATERIALIZED ($edgesSql),
       |deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM e0 GROUP BY 1),
       |e AS MATERIALIZED (SELECT e0.src, e0.dst, d.outdeg FROM e0 JOIN deg d USING (src)),
       |nodes AS MATERIALIZED (
       |  SELECT u.node, CAST(coalesce(d.outdeg, 0) AS BIGINT) AS outdeg
       |  FROM (SELECT src AS node FROM e0 UNION SELECT dst FROM e0) u
       |  LEFT JOIN deg d ON d.src = u.node),
       |n AS MATERIALIZED (SELECT count(*) AS cnt FROM nodes),
       |r0 AS MATERIALIZED (SELECT node, outdeg, CAST($UnitRank AS BIGINT) AS pr FROM nodes),
       |$rounds""".stripMargin
  }

  /** The DuckDB replay of [[ranks]]: chained CTEs r0..r{iters}, same
    * integer arithmetic (`//` ≡ `div` for the all-positive rank domain).
    * `edgesSql` must yield (src, dst) with both directions. Generated
    * next to the Spark loop so iteration count and constants can never
    * drift apart. */
  def ranksSql(edgesSql: String, iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT e.dst AS node,
         |    CAST($TeleportQ + (85 * sum(r.pr // e.outdeg)) // 100 AS BIGINT) AS pr
         |  FROM e JOIN r${i - 1} r ON r.node = e.src GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS ($edgesSql),
       |e AS (
       |  SELECT e0.src, e0.dst, d.outdeg FROM e0
       |  JOIN (SELECT src, count(*) AS outdeg FROM e0 GROUP BY 1) d USING (src)),
       |r0 AS (SELECT DISTINCT src AS node, CAST($UnitRank AS BIGINT) AS pr FROM e0),
       |$rounds""".stripMargin
  }
}
