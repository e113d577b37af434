package graft

import org.apache.spark.sql.functions._

class StableSpec extends SparkSpec {

  test("exactSum is partitioning/order independent") {
    import spark.implicits._
    // Values chosen to expose double summation-order sensitivity.
    val xs = (1 to 10000).map(i => i * 0.01 + (if (i % 3 == 0) 1e9 else 0.0))
    val a = xs.toDF("x").repartition(1)
      .agg(util.Stable.exactSum(col("x"))).head.getDouble(0)
    val b = xs.reverse.toDF("x").repartition(13)
      .agg(util.Stable.exactSum(col("x"))).head.getDouble(0)
    assert(a === b)
  }

  test("sig formats to 5 significant digits and passes NULL through") {
    import spark.implicits._
    val r = Seq(Some(math.sqrt(2.0)), None).toDF("x")
      .select(util.Stable.sig(col("x"))).collect()
    assert(r(0).getString(0) === "1.4142e+00")
    assert(r(1).isNullAt(0))
  }
}
