package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 (plus the training-data-pipeline
  * extensions) is exposed as a named query over the driver-generated
  * parquet tables, with a DuckDB-runnable oracle where the semantics are
  * ANSI-SQL-expressible. Column names are aliased identically on both
  * sides; every pair imposes a total ORDER BY.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's most operator-dense pipeline stage: scan → timestamp
    * bucket → 36 aggregates → global ranking window → literal tag
    * (`Tugas 2/Yfinance API/yfinance_transform.py:48-95`). */
  def entry(spark: SparkSession): DataFrame =
    queries("yf_month_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 — assembled
    * from the per-family registry shards (round 11 split: identical keys,
    * zero behavior change; disjointness is spec-asserted). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    YfRegistry.queries ++
    YfIndicatorRegistry.queries ++
    EventsARegistry.queries ++
    EventsStatsRegistry.queries ++
    EventsBRegistry.queries ++
    DocsRegistry.queries ++
    TextRegistry.queries ++
    DedupSimRegistry.queries ++
    SimRegistry.queries ++
    GraphMmRegistry.queries ++
    TpchRegistry.queries ++
    TpchDeepJoinRegistry.queries

  /** DuckDB oracle SQL, one entry per query — same shard assembly. */
  def oracleSql: Map[String, String] =
    YfRegistry.oracles ++
    YfIndicatorRegistry.oracles ++
    EventsARegistry.oracles ++
    EventsStatsRegistry.oracles ++
    EventsBRegistry.oracles ++
    DocsRegistry.oracles ++
    TextRegistry.oracles ++
    DedupSimRegistry.oracles ++
    SimRegistry.oracles ++
    GraphMmRegistry.oracles ++
    TpchRegistry.oracles ++
    TpchDeepJoinRegistry.oracles
}
