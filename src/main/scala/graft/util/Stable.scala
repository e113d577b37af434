package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-reproducible aggregation building blocks.
  *
  * Plain double `sum`/`avg` are summation-order dependent, and rounding the
  * result cannot fix it: the financial testdata is decimal-"nice", so
  * results land exactly on round-half boundaries where JVM decimal-string
  * HALF_UP rounding and C binary rounding legitimately disagree (observed:
  * 15/8261 groups off by exactly 1e-6 at 6 dp).
  *
  * Scheme:
  *  - [[exactSum]]: sum in DECIMAL(38,8). The raw inputs are low-digit
  *    decimals (prices 2 dp, rates ≤4 dp, products ≤8 dp, keys integral)
  *    whose double→decimal(38,8) conversion is unambiguous for |x| < 4e9
  *    (half-ulp ≪ 5e-9), so the decimal sum is EXACT and order-independent
  *    on any engine. Also the right call for money at 100 TB: no
  *    accumulated FP drift across billions of rows.
  *  - [[exactAvg]]: exact sum cast to double, divided by count — one IEEE
  *    division of identical inputs, bit-identical everywhere.
  *  - [[sig]]: 5-significant-digit scientific formatting for genuinely
  *    irrational aggregates (stddev): the value never terminates on a
  *    decimal midpoint, so correctly-rounded %.4e is stable across engines
  *    (DuckDB equivalent: `printf('%.4e', x)`). 5 digits (not 7) because
  *    the two engines' stddev accumulations can differ by an ulp AND Java
  *    format_string rounds HALF_UP while C printf rounds half-even: a
  *    group landing within an ulp of a 7th-significant-digit boundary
  *    could format differently. Fewer digits widen that safety margin
  *    ~100x; the full-precision double is still in the parquet dump.
  */
object Stable {
  val MoneyDec: DecimalType = DecimalType(38, 8)

  def exactSum(c: Column): Column = sum(c.cast(MoneyDec)).cast("double")

  def exactAvg(c: Column): Column = exactSum(c) / count(c)

  def sig(c: Column): Column =
    when(c.isNull, lit(null).cast("string")).otherwise(format_string("%.4e", c))

  /** DuckDB SQL mirrors. */
  def exactSumSql(x: String): String = s"CAST(sum(CAST(($x) AS DECIMAL(38,8))) AS DOUBLE)"
  def exactAvgSql(x: String): String = s"${exactSumSql(x)} / count($x)"
  def sigSql(x: String): String = s"printf('%.4e', $x)"
}
