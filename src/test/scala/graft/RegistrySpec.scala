package graft

/** The registry-shard assembly contract: SparkEntry.queries/oracleSql are
  * `++`-merged from per-family shards, where a duplicated key would
  * silently drop the earlier definition — assert disjointness, and that
  * every query has its oracle (round 11: zero rows-only queries). */
class RegistrySpec extends org.scalatest.funsuite.AnyFunSuite {

  private val shards = Seq(
    "Yf" -> (YfRegistry.queries, YfRegistry.oracles),
    "YfIndicator" -> (YfIndicatorRegistry.queries, YfIndicatorRegistry.oracles),
    "EventsA" -> (EventsARegistry.queries, EventsARegistry.oracles),
    "EventsStats" -> (EventsStatsRegistry.queries, EventsStatsRegistry.oracles),
    "EventsB" -> (EventsBRegistry.queries, EventsBRegistry.oracles),
    "Docs" -> (DocsRegistry.queries, DocsRegistry.oracles),
    "Text" -> (TextRegistry.queries, TextRegistry.oracles),
    "DedupSim" -> (DedupSimRegistry.queries, DedupSimRegistry.oracles),
    "Sim" -> (SimRegistry.queries, SimRegistry.oracles),
    "GraphMm" -> (GraphMmRegistry.queries, GraphMmRegistry.oracles),
    "Tpch" -> (TpchRegistry.queries, TpchRegistry.oracles),
    "TpchDeepJoin" -> (TpchDeepJoinRegistry.queries, TpchDeepJoinRegistry.oracles))

  test("shard keys are pairwise disjoint (merge drops nothing)") {
    assert(SparkEntry.queries.size == shards.map(_._2._1.size).sum)
    assert(SparkEntry.oracleSql.size == shards.map(_._2._2.size).sum)
  }

  test("every query has an oracle and vice versa") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
  }

  test("within each shard, queries and oracles carry the same keys") {
    shards.foreach { case (name, (q, o)) =>
      assert(q.keySet == o.keySet,
        s"shard $name: ${(q.keySet diff o.keySet) ++ (o.keySet diff q.keySet)}")
    }
  }

  test("the full surface is present") {
    // round 11: +2 (mv_rollup_2dim_stored,
    // dedup_incremental_lsh_appended_stored); round 12: +2
    // (mv_rollup_live_stored, mv_rollup_live_asof)
    assert(SparkEntry.queries.size == 362, s"got ${SparkEntry.queries.size}")
  }
}
