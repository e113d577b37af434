package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-CORE DECOMPOSITION loop over an undirected `(u, v)` edge set —
  * repeatedly drop nodes whose degree in the SURVIVING subgraph is < k
  * until stable; what remains is the maximal subgraph of minimum degree
  * k (the standard "dense nucleus" cut before community detection).
  * Extracted from the `graph_kcore` registry entry (round 10) so the
  * in-query tier and the stored-edge tier ([[EdgeStore.ensurePlainEdges]])
  * share one loop: a FIXED `rounds` peel on both engines (the
  * fixed-unroll pagerank discipline — identical recurrence ⇒ identical
  * state, converged or not), each round one semi-join restriction + one
  * keyed degree aggregate, lineage truncated per round via materialized
  * views exactly like the cluster-propagation loop. */
object KCore {

  /** Nodes of the k-core with their in-core degrees after `rounds`
    * fixed peel rounds. */
  def coreDegrees(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    def degreesIn(nodes: DataFrame): DataFrame = {
      val live = edges
        .join(nodes.select(col("node").as("u")), "u", "left_semi")
        .join(nodes.select(col("node").as("v")), "v", "left_semi")
      live.select(col("u").as("node"))
        .unionAll(live.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("dg"))
    }
    // Lineage-truncate each round: persist caches the DATA, but the
    // logical plan still nests round over round and Catalyst
    // re-optimization grows EXPONENTIALLY (measured in the registry
    // entry: 0.9 → 3.2 → 18.6 → 217 s by round 5 without truncation).
    def round(df: DataFrame): (DataFrame, Long) = {
      val (p, n) = graft.util.Views.materializeCounted(df)
      (org.apache.spark.sql.GraftColumnBridge.lineageTruncated(p), n)
    }
    var (nodes, nNodes) = round(
      edges.select(col("u").as("node"))
        .unionAll(edges.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("dg"))
        .filter(col("dg") >= k).select("node"))
    // EARLY EXIT at the provable fixpoint (round 13): peeling is
    // MONOTONE — every round's survivors are a subset of its input — so
    // an unchanged row COUNT means an unchanged SET, and a fixpoint maps
    // to itself on every remaining round. Skipping them produces the
    // bit-identical result the fixed unroll would (the oracle's full
    // unroll lands on the same state), and the count is free: the
    // per-round materialization already pays it. At corpus scale each
    // skipped round is a full pass over the surviving subgraph.
    var it = 0
    var converged = false
    while (it < rounds && !converged) {
      val (next, nNext) =
        round(degreesIn(nodes).filter(col("dg") >= k).select("node"))
      if (nNext == nNodes) converged = true
      else { nodes = next; nNodes = nNext }
      it += 1
    }
    degreesIn(nodes)
      .select(col("node"), col("dg").as("core_degree"))
  }
}
