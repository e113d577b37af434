package graft

import org.apache.spark.sql.functions._

/** Spark-native Datasketches HLL (`hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate`) — the mergeability contract behind
  * `events_hll_sketch_rollup`: per-stratum partial sketches merged by
  * union must answer the global distinct question without rescanning raw
  * data. Pins (1) union-of-parts ≡ direct global build (same lgK — the
  * property that makes stored daily sketches a rollup substrate), (2) the
  * estimate's published error band on a known cardinality, (3) exactness
  * at small cardinalities (HLL is exact in sparse mode), and (4)
  * duplicate insensitivity — a sketch is a SET summary. */
class HllSpec extends SparkSpec {

  private def ids(n: Int, parts: Int, mul: Long = 1L) = {
    import spark.implicits._
    (1 to n).map(i => i.toLong * mul).toDF("user_id").repartition(parts)
  }

  test("union of per-stratum sketches equals the direct global build") {
    import spark.implicits._
    val df = ids(5000, 8).withColumn("stratum", pmod(col("user_id"), lit(13)))
    val direct = df.agg(
      expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("est"))
      .as[Long].head()
    val merged = df.groupBy("stratum")
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))").as("est"))
      .as[Long].head()
    assert(direct === merged,
      s"union-of-parts ($merged) must equal direct build ($direct)")
  }

  test("estimate lands inside the lgK=12 error band at 50k distinct") {
    import spark.implicits._
    val n = 50000
    val est = ids(n, 16)
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("e"))
      .as[Long].head()
    // rsd = 1.04/sqrt(2^12) ~ 1.6%; 5 sigma ~ 8%.
    assert(math.abs(est - n) <= n * 0.08, s"est $est vs true $n")
  }

  test("exact in sparse mode and duplicate-insensitive") {
    import spark.implicits._
    val small = ids(100, 4)
    val withDups = small.union(small).union(small)
    val e1 = small.agg(
      expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("e"))
      .as[Long].head()
    val e2 = withDups.agg(
      expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("e"))
      .as[Long].head()
    assert(e1 === 100L, s"sparse-mode estimate must be exact, got $e1")
    assert(e2 === e1, "duplicates must not move the estimate")
  }
}
