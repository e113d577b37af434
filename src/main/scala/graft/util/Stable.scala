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

  /** A 2-dp money column as an exact decimal, cast BEFORE arithmetic.
    *
    * `1.0 - discount` in DOUBLE is already wrong (1 - 0.07 =
    * 0.9299999999999999…): the product with a price then has no short
    * decimal form, its DECIMAL(38,8) cast carries 8 junk digits that the
    * two engines round differently, and the group sum's true scale
    * becomes 8 — which defeats [[exactSumAt]]'s downcast. Casting each
    * 2-dp operand to decimal first keeps every intermediate exact:
    * (12,2) × (1 − (4,2)) → DECIMAL(18,4), bit-identical on any engine.
    */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** A small 2-dp rate (discount/tax, |x| < 100) as an exact decimal. */
  def rate2(c: Column): Column = c.cast(DecimalType(4, 2))

  /** Exact decimal sum emitted as double via the value's TRUE scale.
    *
    * A (38,8) sum of a ~3e9-magnitude total carries 18 significant
    * digits — more than a double holds — and the two engines convert
    * that decimal to double differently (JVM: correctly rounded;
    * DuckDB: int128 → double, then ÷10^scale — two roundings), which
    * can land on ADJACENT doubles (observed: tpch_q1 sum_disc_price at
    * sf0.1, …434132 vs …4341316). Casting the sum down to its true
    * scale first is exact (the addends have ≤ that scale) and keeps the
    * scaled significand inside 2^53, where both conversions are exact.
    * Only valid when `c`'s true decimal scale ≤ `scale` — pair with
    * [[dec2]]/[[rate2]] products so that's true by construction.
    */
  def exactSumAt(c: Column, scale: Int): Column =
    sum(c.cast(MoneyDec)).cast(DecimalType(38, scale)).cast("double")

  def exactAvgAt(c: Column, scale: Int): Column = exactSumAt(c, scale) / count(c)

  def sig(c: Column): Column =
    when(c.isNull, lit(null).cast("string")).otherwise(format_string("%.4e", c))

  /** DuckDB SQL mirrors. */
  def exactSumSql(x: String): String = s"CAST(sum(CAST(($x) AS DECIMAL(38,8))) AS DOUBLE)"
  def exactAvgSql(x: String): String = s"${exactSumSql(x)} / count($x)"
  def dec2Sql(x: String): String = s"CAST(($x) AS DECIMAL(12,2))"
  def rate2Sql(x: String): String = s"CAST(($x) AS DECIMAL(4,2))"
  def exactSumAtSql(x: String, scale: Int): String =
    s"CAST(CAST(sum(CAST(($x) AS DECIMAL(38,8))) AS DECIMAL(38,$scale)) AS DOUBLE)"
  def exactAvgAtSql(x: String, scale: Int): String =
    s"${exactSumAtSql(x, scale)} / count($x)"
  def sigSql(x: String): String = s"printf('%.4e', $x)"
}
