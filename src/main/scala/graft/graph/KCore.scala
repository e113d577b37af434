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
    def round(df: DataFrame): DataFrame =
      org.apache.spark.sql.GraftColumnBridge.lineageTruncated(
        graft.util.Views.materialize(df))
    var nodes = round(
      edges.select(col("u").as("node"))
        .unionAll(edges.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("dg"))
        .filter(col("dg") >= k).select("node"))
    for (_ <- 1 to rounds)
      nodes = round(degreesIn(nodes).filter(col("dg") >= k).select("node"))
    degreesIn(nodes)
      .select(col("node"), col("dg").as("core_degree"))
  }
}
