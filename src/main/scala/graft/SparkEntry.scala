package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "yf_month_agg" -> ((s, dir) =>
      yf.Ohlcv.aggregatePeriod(Sources.ohlcv(s, dir), "yyyy-MM", "month")
        .orderBy("period_key")),

    // IDX 32-column financial report: nested-struct projection, string→
    // double casts, fillna, coalesce, nullif ratios, pinned column order
    // (idx_transform.py:107-273).
    "idx_financials" -> ((s, dir) =>
      idx.FinancialReport.transform(
        idx.FinancialReport.fixtureFromOrders(Sources.orders(s, dir)))
        .orderBy("company_code")),

    // Genuine null-handling semantics (the reference's coalesce is
    // degenerate — fillna runs first): coalesce over actually-null
    // numeric + string columns, and na.fill (idx_transform.py:160-183,
    // iqplus defensive defaults :121-124).
    "idx_null_handling" -> ((s, dir) => {
      val c = Sources.customer(s, dir)
      c.select(
        col("c_custkey"),
        when(col("c_custkey") % 5 === 0, lit(null)).otherwise(col("c_acctbal")).as("bal_null"),
        when(col("c_custkey") % 3 === 0, lit(null)).otherwise(col("c_name")).as("name_null"))
        .withColumn("bal_coalesced", coalesce(col("bal_null"), lit(0.0)))
        .withColumn("name_defaulted", coalesce(col("name_null"), lit("")))
        .na.fill(-1.0, Seq("bal_null"))
        .withColumnRenamed("bal_null", "bal_filled")
        .drop("name_null")
        .orderBy("c_custkey")
    }),
  )

  // ---------------------------------------------------------------- oracle

  /** DuckDB view of the OHLCV bars (mirrors [[Sources.ohlcv]]). */
  private val barsCte: String =
    """bars AS (
      |  SELECT l_shipdate AS "Date", l_quantity AS "Open",
      |         l_extendedprice AS "High", l_discount AS "Low",
      |         l_tax AS "Close", CAST(l_orderkey AS DOUBLE) AS "Volume",
      |         l_discount * l_tax AS "Dividends",
      |         l_quantity % 2.0 AS "Stock Splits"
      |  FROM lineitem)""".stripMargin

  /** The 36-aggregate list, generated from the same column list the Spark
    * side uses so names can never drift. */
  private def aggSelectList: String =
    yf.Ohlcv.barColumns.map { case (src, out) =>
      s"""ROUND(avg("$src"),6) AS avg_$out, ROUND(sum("$src"),6) AS sum_$out,
         |    max("$src") AS max_$out, min("$src") AS min_$out,
         |    ROUND(stddev_samp("$src"),6) AS stddev_$out""".stripMargin
    }.mkString(",\n    ") + ",\n    count(*) AS row_count"

  private def yfAggOracle(fmt: String, label: String): String =
    s"""WITH $barsCte,
       |agg AS (
       |  SELECT strftime("Date", '$fmt') AS period_key,
       |    $aggSelectList
       |  FROM bars GROUP BY period_key)
       |SELECT *,
       |  CAST(row_number() OVER (ORDER BY period_key) AS INTEGER) AS ${label}_number,
       |  '$label' AS agg_type
       |FROM agg ORDER BY period_key""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "yf_month_agg" -> yfAggOracle("%Y-%m", "month"),
    "idx_financials" -> idx.FinancialReport.oracleSql,
    "idx_null_handling" ->
      """SELECT c_custkey,
        |  COALESCE(CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_acctbal END, -1.0) AS bal_filled,
        |  COALESCE(CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_acctbal END, 0.0) AS bal_coalesced,
        |  COALESCE(CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_name END, '') AS name_defaulted
        |FROM customer ORDER BY c_custkey""".stripMargin,
  )
}
