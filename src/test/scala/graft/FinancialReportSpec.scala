package graft

import org.apache.spark.sql.functions._

class FinancialReportSpec extends SparkSpec {

  private lazy val out =
    idx.FinancialReport.transform(
      idx.FinancialReport.fixtureFromOrders(Sources.orders(spark, sfDir))).cache()

  test("output is exactly the pinned 32-column order") {
    assert(out.columns.toSeq === idx.FinancialReport.finalColumns)
  }

  test("metric nulls are filled to 0 before derivation") {
    // FinanceCosts is nulled every 9th key and filled to 0 → ebitda ==
    // profit_before_tax == operating_profit there (pbt ± 0).
    val nulled = idx.FinancialReport.fixtureFromOrders(Sources.orders(spark, sfDir))
      .filter(col("data.FinanceCosts").isNull)
      .select(col("company_code")).collect().map(_.getLong(0)).toSet
    assert(nulled.nonEmpty)
    val rows = out.filter(col("company_code").isin(nulled.toSeq: _*))
      .select("operating_profit", "ebitda").collect()
    assert(rows.nonEmpty && rows.forall(r => r.getDouble(0) === r.getDouble(1)))
  }

  test("zero/NULL divisor yields NULL ratio, not an error or infinity") {
    // Equity nulled every 11th key → filled to 0 → asset_to_equity NULL.
    val r = out.filter(col("company_code") % 11 === 0)
    assert(r.count() > 0)
    assert(r.filter(col("asset_to_equity_ratio").isNotNull).count() === 0)
    // And no Infinity/NaN anywhere in the ratios.
    val ratios = Seq("current_ratio", "asset_to_equity_ratio", "debt_to_equity_ratio",
      "gross_margin_pct", "operating_margin_pct", "net_margin_pct")
    val bad = out.filter(ratios.map(c => isnan(col(c)) || col(c) === Double.PositiveInfinity)
      .reduce(_ || _))
    assert(bad.count() === 0)
  }

  test("coalesce chain: short_term_borrowing falls back across the filled columns") {
    // Reference ordering: fillna runs FIRST, so coalesce always sees
    // non-null → short_term_borrowing == short_term_loans-after-fill.
    val check = out
      .withColumn("expected",
        when(col("company_code") % 7 === 0, lit(0.0)).otherwise(col("short_term_borrowing")))
      .filter(col("company_code") % 7 === 0 && col("short_term_borrowing") =!= 0.0)
    assert(check.count() === 0)
  }

  test("plan is a single shuffle-free projection over the scan") {
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
