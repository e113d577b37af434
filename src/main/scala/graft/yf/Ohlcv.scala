package graft.yf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OHLCV period aggregation — the Yahoo-Finance pipeline's query surface
  * (`Tugas 2/Yfinance API/yfinance_transform.py:48-95,117-141`),
  * re-expressed as pure `DataFrame => DataFrame` transforms.
  *
  * Reference semantics preserved:
  *  - day   = raw rows + `period_key` (unaggregated, `yfinance_transform.py:122-128`)
  *  - month = groupBy(period_key yyyy-MM) with 5 stats × 7 columns + count
  *  - year  = same with yyyy (`yfinance_transform.py:121,132`)
  *  - a 1-based `{label}_number` via `row_number` over period_key order
  *    (`yfinance_transform.py:92-93`) and a literal `agg_type` column
  *    (`yfinance_transform.py:94`).
  *
  * Scale note: the reference's global `Window.orderBy` forces a
  * single-partition exchange — fine for one company's bars, fatal at
  * 100 TB. [[aggregatePeriodBySymbol]] is the scale path: the window is
  * partitioned by `symbol`, so shuffle parallelism is preserved and the
  * per-company numbering semantics (what the reference actually computes,
  * one collection at a time) are kept exactly.
  */
object Ohlcv {

  /** The 7 bar columns the reference aggregates
    * (`yfinance_transform.py:53-90`); `Stock Splits` keeps its space. */
  val barColumns: Seq[(String, String)] = Seq(
    "Open" -> "open", "High" -> "high", "Low" -> "low", "Close" -> "close",
    "Volume" -> "volume", "Dividends" -> "dividends",
    "Stock Splits" -> "stock_splits")

  /** mean/sum/max/min/stddev per bar column + row_count = 36 aggregates.
    * Sums/means use [[graft.util.Stable]] exact-decimal accumulation —
    * order-independent (reproducible on any partitioning, and exact for
    * money at scale); max/min/stddev are plain doubles.
    * Spark `stddev` = stddev_samp (NULL on 1-row groups) — kept as-is. */
  private def aggExprs: Seq[Column] =
    barColumns.flatMap { case (src, out) =>
      val c = col(s"`$src`")
      Seq(
        graft.util.Stable.exactAvg(c).as(s"avg_$out"),
        graft.util.Stable.exactSum(c).as(s"sum_$out"),
        max(c).as(s"max_$out"),
        min(c).as(s"min_$out"),
        stddev(c).as(s"stddev_$out"))
    } :+ count(lit(1)).as("row_count")

  /** `withColumn("period_key", date_format(Date, fmt))` — the calendar
    * bucketing shared by all three branches (`yfinance_transform.py:50,121-123`). */
  def withPeriodKey(bars: DataFrame, fmt: String): DataFrame =
    bars.withColumn("period_key", date_format(col("Date"), fmt))

  /** Month/year aggregation branch (`yfinance_transform.py:48-95`): bucket,
    * 36 aggregates, global 1-based ranking, agg_type literal.
    * Faithful to the reference including its unpartitioned window. */
  def aggregatePeriod(bars: DataFrame, fmt: String, label: String): DataFrame = {
    val agg = withPeriodKey(bars, fmt).groupBy(col("period_key")).agg(aggExprs.head, aggExprs.tail: _*)
    agg
      .withColumn(s"${label}_number", row_number().over(Window.orderBy(col("period_key"))))
      .withColumn("agg_type", lit(label))
  }

  /** Scale-path variant: identical stats, window partitioned by `symbol`.
    * This is what the reference actually computes (it runs one collection =
    * one company at a time); at cluster scale it keeps the shuffle keyed by
    * (symbol) and never collapses to one partition. */
  def aggregatePeriodBySymbol(bars: DataFrame, fmt: String, label: String): DataFrame = {
    val agg = withPeriodKey(bars, fmt)
      .groupBy(col("symbol"), col("period_key"))
      .agg(aggExprs.head, aggExprs.tail: _*)
    agg
      .withColumn(s"${label}_number",
        row_number().over(Window.partitionBy(col("symbol")).orderBy(col("period_key"))))
      .withColumn("agg_type", lit(label))
  }

  /** Reference-fidelity aggregate: the EXACT output schema of
    * `yfinance_transform.py:53-90` — stat-major column blocks (avg ×7,
    * sum ×7, max ×7, min ×7, std ×7) with the reference's `std_*` aliases,
    * then row_count, {label}_number, agg_type. [[aggregatePeriod]] keeps
    * the engine's per-column interleaved `stddev_*` form (documented
    * deviation); this variant is drop-in schema-compatible with the
    * reference's output collection. Values still use the
    * [[graft.util.Stable]] exact-decimal accumulation (the fidelity point
    * is names + order, not resurrecting FP drift). */
  def aggregatePeriodRef(bars: DataFrame, fmt: String, label: String): DataFrame = {
    val stats: Seq[(String, Column => Column)] = Seq(
      "avg" -> (c => graft.util.Stable.exactAvg(c)),
      "sum" -> (c => graft.util.Stable.exactSum(c)),
      "max" -> (c => max(c)),
      "min" -> (c => min(c)),
      "std" -> (c => stddev(c)))
    val aggs = stats.flatMap { case (st, f) =>
      barColumns.map { case (src, out) => f(col(s"`$src`")).as(s"${st}_$out") }
    } :+ count(lit(1)).as("row_count")
    withPeriodKey(bars, fmt).groupBy(col("period_key")).agg(aggs.head, aggs.tail: _*)
      .withColumn(s"${label}_number", row_number().over(Window.orderBy(col("period_key"))))
      .withColumn("agg_type", lit(label))
  }

  /** Day branch (`yfinance_transform.py:122-128`): raw rows + period_key +
    * agg_type, no aggregation. */
  def dayBranch(bars: DataFrame): DataFrame =
    withPeriodKey(bars, "yyyy-MM-dd").withColumn("agg_type", lit("day"))

  /** Broadcast catalog join (SURVEY.md §2.5): replaces the reference's
    * collection-name-as-company-identity scheme (`yfinance_transform.py:104-107`
    * + Daftar_Saham.csv) with an explicit broadcast equi-join against the
    * small catalog dimension. The catalog is ~1k rows — always broadcast,
    * never shuffled, at any fact-side scale. */
  def joinCatalog(bars: DataFrame, catalog: DataFrame, barsKey: String, catKey: String): DataFrame =
    bars.join(broadcast(catalog), bars(barsKey) === catalog(catKey))

  /** The reference's multi-sink (K2, `yfinance_transform.py:125-137`):
    * day raw + month/year rollups appended into ONE target collection,
    * rows discriminated by `agg_type`. Idiomatic parquet form: one
    * partitioned dataset, `partitionBy("agg_type")` — each branch lands
    * in its own partition directory (readable per-branch with full
    * partition pruning, or together with `mergeSchema` since day rows
    * and rollup rows are schema-heterogeneous, exactly like the
    * reference's mixed Mongo documents). */
  def writeAll(bars: DataFrame, outDir: String): Unit =
    Seq(
      dayBranch(bars),
      aggregatePeriod(bars, "yyyy-MM", "month"),
      aggregatePeriod(bars, "yyyy", "year"))
      .foreach(_.write.mode("append").partitionBy("agg_type").parquet(outDir))

  /** Pruned SINGLE-branch read of a [[writeAll]] dataset — the
    * per-collection read-back face of the multi-sink (the reference reads
    * one collection at a time, `yfinance_transform.py:131-137`). The
    * branch schema is passed EXPLICITLY: the branches are
    * schema-heterogeneous, so a schema-inferring whole-directory read
    * would either need mergeSchema (a footer read of every file in every
    * branch) or pick an arbitrary file's schema. With the schema pinned,
    * the `agg_type` equality lands in the scan's PartitionFilters and
    * only that branch's files are listed and read — SinkSpec asserts the
    * pruned plan, `yf_sink_pruned` oracle-checks the result. */
  def readBranch(spark: org.apache.spark.sql.SparkSession, outDir: String,
                 branchSchema: org.apache.spark.sql.types.StructType,
                 aggType: String): DataFrame =
    spark.read.schema(branchSchema).parquet(outDir)
      .filter(col("agg_type") === lit(aggType))
}
