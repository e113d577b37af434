package graft

import org.apache.spark.sql.functions._

/** KMV distinct-cardinality sketch ([[graft.functions.KmvAgg]]): the
  * sketch must be EXACT below capacity (it IS the distinct hash set),
  * partition merges must equal a single-partition build (union-then-trim
  * is order-insensitive), duplicates must not consume capacity, the trim
  * must keep exactly the k smallest hashes, and the SQL-side union
  * algebra (slice∘sort∘distinct∘concat) must reproduce the sketch of the
  * unioned input — the property that lets stored per-stratum sketches
  * roll up without rescanning. Also pins the SQL registration via
  * GraftExtensions and the cross-engine hash contract. */
class KmvSpec extends SparkSpec {

  private def items(n: Int, parts: Int, prefix: String = "u") = {
    import spark.implicits._
    (1 to n).map(i => s"$prefix$i").toDF("x").repartition(parts)
  }

  /** The sketch's own hash, derived via the SQL md5 contract — must
    * equal what the native update loop computes. */
  private def sqlHashes(df: org.apache.spark.sql.DataFrame) =
    df.select(conv(substring(md5(
      concat(lit("kmv:"), col("x")).cast("binary")), 1, 8), 16, 10)
      .cast("long").as("h"))
      .distinct().orderBy("h")

  test("kmv_agg is exact below capacity and matches the md5 contract") {
    val df = items(50, 7)
    val sketch = df.agg(expr("kmv_agg(x, 256)").as("kmv")).head.getSeq[Long](0)
    val expected = sqlHashes(df).collect().map(_.getLong(0)).toSeq
    assert(sketch == expected,
      "below-capacity sketch must be the full ascending distinct hash set")
  }

  test("kmv_agg merge across partitions equals a single-partition build, and trims to the k smallest") {
    val many = items(2000, 13)
    val merged = many.agg(expr("kmv_agg(x, 64)").as("kmv")).head.getSeq[Long](0)
    val single = items(2000, 1).agg(expr("kmv_agg(x, 64)").as("kmv")).head.getSeq[Long](0)
    assert(merged == single, "partition-merged sketch differs from 1-partition build")
    assert(merged.size == 64)
    val smallest = sqlHashes(many).limit(64).collect().map(_.getLong(0)).toSeq
    assert(merged == smallest, "sketch must hold exactly the 64 smallest distinct hashes")
  }

  test("duplicates do not consume capacity") {
    import spark.implicits._
    val dups = (1 to 30).flatMap(i => Seq.fill(10)(s"u$i")).toDF("x").repartition(5)
    val sketch = dups.agg(expr("kmv_agg(x, 256)").as("kmv")).head.getSeq[Long](0)
    assert(sketch.size == 30, s"30 distinct items must yield size 30, got ${sketch.size}")
    assert(sketch == sketch.sorted && sketch.distinct.size == sketch.size)
  }

  test("SQL union algebra reproduces the sketch of the unioned input") {
    val a = items(500, 3, "a")
    val b = items(700, 5, "b")
    val k = 32
    val sa = a.agg(expr(s"kmv_agg(x, $k)").as("kmv"))
    val sb = b.agg(expr(s"kmv_agg(x, $k)").as("kmv"))
    val viaAlgebra = sa.crossJoin(sb.withColumnRenamed("kmv", "kmv2"))
      .select(slice(array_sort(array_distinct(concat(col("kmv"), col("kmv2")))),
        1, k).as("kmv"))
      .head.getSeq[Long](0)
    val direct = a.union(b).agg(expr(s"kmv_agg(x, $k)").as("kmv")).head.getSeq[Long](0)
    assert(viaAlgebra == direct,
      "slice(sort(distinct(concat))) must equal the directly-built union sketch")
  }

  test("estimate lands within the k=256 error envelope on 5000 distinct keys") {
    val n = 5000
    val k = 256
    val arr = items(n, 11).agg(expr(s"kmv_agg(x, $k)").as("kmv"))
      .select(element_at(col("kmv"), k).as("hk")).head.getLong(0)
    val est = (k - 1).toDouble * graft.functions.KmvUtil.HashSpan / arr.toDouble
    // std error ~ 1/sqrt(k-2) ≈ 6.3%; 25% is a loud-failure band.
    assert(math.abs(est - n) / n < 0.25, s"estimate $est too far from $n")
  }
}
