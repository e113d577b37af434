package graft.idx

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The IDX financial-report transform — the reference's 32-attribute
  * pipeline (`Tugas 2/IDX Financial Report/idx_transform.py:107-273`),
  * re-expressed as one composable `DataFrame => DataFrame`.
  *
  * Semantics preserved exactly:
  *  - nested `data.*` struct projection with renames (`idx_transform.py:113-157`)
  *  - string→double casts on all 20 metrics (same lines)
  *  - null→0 fill on the 20 metric columns (`idx_transform.py:160-169`;
  *    the reference loops `fillna` per column — one `na.fill` call is
  *    semantically identical)
  *  - derived columns operating_profit / short_term_borrowing (coalesce) /
  *    ebitda / operating_expenses (`idx_transform.py:174-195`). Note the
  *    reference fills nulls BEFORE the coalesce, so the coalesce only ever
  *    sees non-null values — we keep that (degenerate) ordering; genuine
  *    coalesce semantics are exercised by the separate null-handling query.
  *  - six nullif-guarded ratios (`idx_transform.py:198-231`)
  *  - final fixed 32-column order (`idx_transform.py:234-267`);
  *    profit_before_tax / finance_costs / short_term_loans /
  *    current_maturities are intermediates and are dropped.
  *
  * Everything here is deterministic scalar compute — no aggregation, so the
  * plan is a single `Project` over the scan: embarrassingly parallel,
  * whole-stage-codegen'd, no shuffle at any scale.
  */
object FinancialReport {

  /** (struct field, output alias) for the 3 company-info strings
    * (`idx_transform.py:120-122`). */
  val companyFields: Seq[(String, String)] = Seq(
    "EntityName" -> "company_name",
    "Sector" -> "sector",
    "Subsector" -> "subsector")

  /** (struct field, output alias) for the 20 string-typed metrics cast to
    * double (`idx_transform.py:125-156`), in reference order. */
  val metricFields: Seq[(String, String)] = Seq(
    "SalesAndRevenue" -> "revenue",
    "GrossProfit" -> "gross_profit",
    "ProfitLossBeforeIncomeTax" -> "profit_before_tax",
    "FinanceCosts" -> "finance_costs",
    "ProfitLoss" -> "net_profit",
    "CashAndCashEquivalents" -> "cash",
    "Assets" -> "total_assets",
    "ShortTermLoans" -> "short_term_loans",
    "CurrentMaturitiesOfBankLoans" -> "current_maturities",
    "LongTermBankLoans" -> "long_term_borrowing",
    "Equity" -> "total_equity",
    "NetCashFlowsReceivedFromUsedInOperatingActivities" -> "cash_from_operations",
    "NetCashFlowsReceivedFromUsedInInvestingActivities" -> "cash_from_investing",
    "NetCashFlowsReceivedFromUsedInFinancingActivities" -> "cash_from_financing",
    "Liabilities" -> "total_liabilities",
    "BasicEarningsLossPerShareFromContinuingOperations" -> "basic_eps",
    "SellingExpenses" -> "selling_expenses",
    "GeneralAndAdministrativeExpenses" -> "g_and_a_expenses",
    "CurrentAssets" -> "current_assets",
    "CurrentLiabilities" -> "current_liabilities")

  /** Final pinned 32-column order (`idx_transform.py:234-267`). */
  val finalColumns: Seq[String] = Seq(
    "company_code", "year", "period",
    "company_name", "sector", "subsector",
    "revenue", "gross_profit", "operating_profit", "net_profit",
    "cash", "total_assets", "short_term_borrowing", "long_term_borrowing",
    "total_equity", "cash_from_operations", "cash_from_investing",
    "cash_from_financing", "total_liabilities", "ebitda", "basic_eps",
    "selling_expenses", "g_and_a_expenses", "operating_expenses",
    "current_assets", "current_liabilities", "current_ratio",
    "asset_to_equity_ratio", "debt_to_equity_ratio", "gross_margin_pct",
    "operating_margin_pct", "net_margin_pct")

  /** Input: `company_code`, `year`, `period` + nested struct `data` with the
    * fields above (all strings). Output: the 32-column report. */
  def transform(src: DataFrame): DataFrame = {
    val base = src.select(
      Seq(col("company_code"), col("year"), col("period")) ++
        companyFields.map { case (f, a) => col(s"data.$f").as(a) } ++
        metricFields.map { case (f, a) => col(s"data.$f").cast("double").as(a) }: _*)

    val filled = base.na.fill(0.0, metricFields.map(_._2))

    filled
      .withColumn("operating_profit", expr("profit_before_tax - finance_costs"))
      .withColumn("short_term_borrowing",
        coalesce(col("short_term_loans"), col("current_maturities"), lit(0)))
      .withColumn("ebitda", expr("profit_before_tax + finance_costs"))
      .withColumn("operating_expenses", expr("selling_expenses + g_and_a_expenses"))
      .withColumn("current_ratio", expr("current_assets / nullif(current_liabilities, 0)"))
      .withColumn("asset_to_equity_ratio", expr("total_assets / nullif(total_equity, 0)"))
      .withColumn("debt_to_equity_ratio", expr("total_liabilities / nullif(total_equity, 0)"))
      .withColumn("gross_margin_pct", expr("gross_profit / nullif(revenue, 0) * 100"))
      .withColumn("operating_margin_pct", expr("operating_profit / nullif(revenue, 0) * 100"))
      .withColumn("net_margin_pct", expr("net_profit / nullif(revenue, 0) * 100"))
      .select(finalColumns.map(col): _*)
  }

  // ------------------------------------------------------------- fixture

  /** Deterministic metric generators over `orders` columns: SQL expression
    * producing a double + optional "NULL every Nth key" injection. Shared
    * by the Spark fixture and the DuckDB oracle so they cannot drift.
    * NULL injections are placed to exercise: fillna (all), the 0-divisor →
    * NULL ratio path (Equity, CurrentLiabilities, SalesAndRevenue), and
    * the coalesce chain (ShortTermLoans, CurrentMaturitiesOfBankLoans). */
  val metricGen: Seq[(String, String, Option[Int])] = Seq(
    ("SalesAndRevenue", "o_totalprice", Some(17)),
    ("GrossProfit", "o_totalprice * 0.4", None),
    ("ProfitLossBeforeIncomeTax", "o_totalprice * 0.2", None),
    ("FinanceCosts", "o_totalprice * 0.05", Some(9)),
    ("ProfitLoss", "o_totalprice * 0.15", None),
    ("CashAndCashEquivalents", "o_totalprice * 0.1", None),
    ("Assets", "o_totalprice * 3.0", None),
    ("ShortTermLoans", "o_totalprice * 0.2", Some(7)),
    ("CurrentMaturitiesOfBankLoans", "o_totalprice * 0.1", Some(3)),
    ("LongTermBankLoans", "o_totalprice * 0.5", None),
    ("Equity", "o_totalprice * 1.5", Some(11)),
    ("NetCashFlowsReceivedFromUsedInOperatingActivities", "o_totalprice * 0.12", None),
    ("NetCashFlowsReceivedFromUsedInInvestingActivities", "o_totalprice * -0.08", None),
    ("NetCashFlowsReceivedFromUsedInFinancingActivities", "o_totalprice * 0.03", None),
    ("Liabilities", "o_totalprice * 1.5", None),
    ("BasicEarningsLossPerShareFromContinuingOperations", "o_totalprice / 1000.0", None),
    ("SellingExpenses", "o_totalprice * 0.07", Some(5)),
    ("GeneralAndAdministrativeExpenses", "o_totalprice * 0.06", None),
    ("CurrentAssets", "o_totalprice * 1.2", None),
    ("CurrentLiabilities", "o_totalprice * 0.8", Some(13)))

  /** SQL for one struct field's string value; `strTy` is STRING for Spark,
    * VARCHAR for DuckDB. The double→string→double round trip mirrors the
    * reference's string-typed XBRL fields (`idx_transform.py:125-156`). */
  def metricSql(gen: (String, String, Option[Int]), strTy: String): String = gen match {
    case (_, e, Some(m)) => s"CASE WHEN o_orderkey % $m = 0 THEN NULL ELSE CAST(($e) AS $strTy) END"
    case (_, e, None)    => s"CAST(($e) AS $strTy)"
  }

  /** Builds the nested-struct input the reference reads (FIXTURES.md §1):
    * `orders` → (company_code, year, period, data: struct<…20 string
    * metrics + 3 company strings>). Exercises the genuine nested-projection
    * path since no testdata table has a struct column. */
  def fixtureFromOrders(orders: DataFrame): DataFrame = {
    val structFields =
      Seq(
        expr("'Company_' || CAST(o_custkey AS STRING)").as("EntityName"),
        col("o_orderstatus").as("Sector"),
        col("o_orderpriority").as("Subsector")) ++
        metricGen.map(g => expr(metricSql(g, "STRING")).as(g._1))
    orders.select(
      col("o_orderkey").as("company_code"),
      year(col("o_orderdate")).as("year"),
      col("o_orderpriority").as("period"),
      struct(structFields: _*).as("data"))
  }

  /** DuckDB oracle for `transform(fixtureFromOrders(orders))` — generated
    * from the same [[metricGen]] spec. All compute is deterministic scalar
    * IEEE arithmetic, so no rounding is needed on either side. */
  def oracleSql: String = {
    val metricCols = metricGen.zip(metricFields).map { case (g, (_, alias)) =>
      s"""COALESCE(CAST((${metricSql(g, "VARCHAR")}) AS DOUBLE), 0) AS $alias"""
    }.mkString(",\n    ")
    s"""WITH src AS (
       |  SELECT o_orderkey AS company_code,
       |    CAST(year(o_orderdate) AS INTEGER) AS "year",
       |    o_orderpriority AS period,
       |    'Company_' || CAST(o_custkey AS VARCHAR) AS company_name,
       |    o_orderstatus AS sector, o_orderpriority AS subsector,
       |    $metricCols
       |  FROM orders),
       |calc AS (
       |  SELECT *,
       |    profit_before_tax - finance_costs AS operating_profit,
       |    COALESCE(short_term_loans, current_maturities, 0) AS short_term_borrowing,
       |    profit_before_tax + finance_costs AS ebitda,
       |    selling_expenses + g_and_a_expenses AS operating_expenses,
       |    current_assets / nullif(current_liabilities, 0) AS current_ratio,
       |    total_assets / nullif(total_equity, 0) AS asset_to_equity_ratio,
       |    total_liabilities / nullif(total_equity, 0) AS debt_to_equity_ratio,
       |    gross_profit / nullif(revenue, 0) * 100 AS gross_margin_pct,
       |    operating_profit / nullif(revenue, 0) * 100 AS operating_margin_pct,
       |    net_profit / nullif(revenue, 0) * 100 AS net_margin_pct
       |  FROM src)
       |SELECT ${finalColumns.map(c => if (c == "year") "\"year\"" else c).mkString(", ")}
       |FROM calc ORDER BY company_code""".stripMargin
  }
}
