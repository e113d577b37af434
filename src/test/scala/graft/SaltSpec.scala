package graft

import org.apache.spark.sql.functions._
import util.{Salt, Stable}

class SaltSpec extends SparkSpec {

  test("salted two-phase aggregation equals the direct groupBy exactly") {
    val bars = yf.Ohlcv.withPeriodKey(Sources.ohlcv(spark, sfDir), "yyyy-MM")
    val direct = bars.groupBy("period_key").agg(
      count(lit(1)).as("n_bars"),
      Stable.exactSum(col("Volume")).as("sum_volume"),
      max(col("High")).as("max_high"))
    val salted = Salt.saltedAgg(bars, Seq("period_key"), col("symbol"), 16, Seq(
      (count(lit(1)).as("n_bars"), sum(col("n_bars")).as("n_bars")),
      (sum(col("Volume").cast(Stable.MoneyDec)).as("sum_volume"),
        sum(col("sum_volume")).cast("double").as("sum_volume")),
      (max(col("High")).as("max_high"), max(col("max_high")).as("max_high"))))
    // decimal partial sums make the salted result EXACTLY equal, not
    // approximately — that's the point of Stable.exactSum at scale
    assert(salted.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(salted).count() === 0)
  }

  test("salt spreads a hot key over the requested bucket count") {
    val bars = yf.Ohlcv.withPeriodKey(Sources.ohlcv(spark, sfDir), "yyyy-MM")
    val salts = bars
      .withColumn("_salt", pmod(hash(col("symbol")), lit(16)))
      .select("_salt").distinct().collect().map(_.getInt(0))
    // small SFs have few distinct symbols, so not all 16 buckets need be
    // hit — but the salt must be in range and genuinely spread the key
    assert(salts.forall(s => s >= 0 && s < 16))
    assert(salts.length > 4)
  }
}
