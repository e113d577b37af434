package graft

import org.apache.spark.sql.functions._

class OhlcvSpec extends SparkSpec {

  private lazy val bars = Sources.ohlcv(spark, sfDir).cache()

  test("month aggregation: stats are internally consistent per group") {
    val agg = yf.Ohlcv.aggregatePeriod(bars, "yyyy-MM", "month").cache()
    val bad = agg.filter(
      col("min_open") > col("avg_open") || col("avg_open") > col("max_open") ||
        col("min_volume") > col("avg_volume") || col("avg_volume") > col("max_volume") ||
        col("row_count") <= 0)
    assert(bad.count() === 0)
    // row_count must partition the input exactly
    assert(agg.agg(sum("row_count")).head.getLong(0) === bars.count())
  }

  test("month numbering is a dense 1-based sequence in period order") {
    val rows = yf.Ohlcv.aggregatePeriod(bars, "yyyy-MM", "month")
      .orderBy("period_key")
      .select("month_number").collect().map(_.getInt(0))
    assert(rows.toSeq === (1 to rows.length))
  }

  test("stddev is sample stddev: NULL on 1-row groups, defined on 2+") {
    import spark.implicits._
    val two = Seq(("2024-01-01", 1.0), ("2024-01-02", 3.0), ("2024-02-01", 5.0))
      .toDF("Date", "Open")
      .select(to_timestamp(col("Date")).as("Date"), col("Open"),
        col("Open").as("High"), col("Open").as("Low"), col("Open").as("Close"),
        col("Open").as("Volume"), col("Open").as("Dividends"),
        col("Open").as("Stock Splits"), lit(1L).as("symbol"))
    val agg = yf.Ohlcv.aggregatePeriod(two, "yyyy-MM", "month")
      .orderBy("period_key").collect()
    assert(agg.length === 2)
    assert(math.abs(agg(0).getAs[Double]("stddev_open") - math.sqrt(2.0)) < 1e-12)
    assert(agg(1).isNullAt(agg(1).fieldIndex("stddev_open")))
  }

  test("day branch keeps raw rows unaggregated with key + tag") {
    val day = yf.Ohlcv.dayBranch(bars)
    assert(day.count() === bars.count())
    assert(day.columns.contains("period_key") && day.columns.contains("agg_type"))
    assert(day.select("agg_type").distinct().head.getString(0) === "day")
  }

  test("symbol-partitioned variant numbers per symbol, not globally") {
    val agg = yf.Ohlcv.aggregatePeriodBySymbol(bars, "yyyy", "year")
    val perSymbolStarts = agg.groupBy("symbol").agg(min("year_number").as("m"))
      .filter(col("m") =!= 1)
    assert(perSymbolStarts.count() === 0)
  }

  test("catalog join broadcasts the small side") {
    val joined = yf.Ohlcv.joinCatalog(bars, Sources.supplier(spark, sfDir), "symbol", "s_suppkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join, got:\n$plan")
  }
}
