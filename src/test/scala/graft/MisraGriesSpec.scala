package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Misra–Gries sketch aggregate (graft/functions/MisraGries.scala):
  * the fixture corpus never evicts (31 words < any sane capacity), so the
  * decrement and merge-trim paths are exercised here on an adversarial
  * skewed stream instead. */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  /** 3 heavy items + `nUnique` singletons, shuffled deterministically. */
  private def skewed(nUnique: Int): Seq[String] = {
    val heavy = Seq.fill(400)("alpha") ++ Seq.fill(250)("beta") ++ Seq.fill(150)("gamma")
    val tail = (1 to nUnique).map(i => s"u$i")
    // Deterministic interleave (no RNG): sort by a hash of (item, position).
    (heavy ++ tail).zipWithIndex
      .sortBy { case (w, i) => (w.hashCode * 31 + i) ^ (i << 7) }
      .map(_._1)
  }

  private def sketchOf(items: Seq[String], cap: Int, parts: Int): Map[String, Long] = {
    val df = spark.createDataset(items).toDF("w").repartition(parts)
    val sk = df.agg(
      org.apache.spark.sql.GraftColumnBridge.column(
        functions.MisraGries(
          org.apache.spark.sql.GraftColumnBridge.expression(col("w")),
          capacity = cap).toAggregateExpression()).as("sk"))
      .collect()(0).getMap[String, Long](0)
    sk.toMap
  }

  test("guarantee: every item with count > N/(cap+1) survives eviction, single partition") {
    val items = skewed(600)            // N = 1400, cap 8 -> threshold ~155
    val sk = sketchOf(items, cap = 8, parts = 1)
    assert(sk.size <= 8)
    assert(sk.contains("alpha") && sk.contains("beta"))       // 400, 250 > 155
    // Counts are lower bounds, never overcounts.
    assert(sk("alpha") <= 400 && sk("beta") <= 250)
    assert(sk("alpha") >= 400 - items.size / 9)
  }

  test("guarantee holds under partitioned merge (errors add, superset kept)") {
    val items = skewed(600)
    for (parts <- Seq(2, 5, 8)) {
      val sk = sketchOf(items, cap = 8, parts = parts)
      assert(sk.size <= 8, s"merge must trim to capacity (parts=$parts)")
      assert(sk.contains("alpha") && sk.contains("beta"),
        s"heavy items lost in merge at parts=$parts: ${sk.keys.toSeq.sorted}")
      assert(sk("alpha") <= 400 && sk("beta") <= 250)
    }
  }

  test("exact when the vocabulary fits: counts equal true frequencies") {
    val items = Seq.fill(7)("x") ++ Seq.fill(5)("y") ++ Seq.fill(2)("z")
    val sk = sketchOf(items, cap = 16, parts = 3)
    assert(sk === Map("x" -> 7L, "y" -> 5L, "z" -> 2L))
  }

  test("SQL registration: mg_sketch works from spark.sql") {
    spark.createDataset(Seq("a", "a", "b")).toDF("w").createOrReplaceTempView("mg_in")
    val m = spark.sql("SELECT mg_sketch(w, 4) AS sk FROM mg_in")
      .collect()(0).getMap[String, Long](0).toMap
    assert(m === Map("a" -> 2L, "b" -> 1L))
    spark.catalog.dropTempView("mg_in")
  }

  test("nulls are ignored; empty input yields an empty map") {
    val withNulls = spark.createDataset(Seq(Some("a"), None, Some("a"), None))
      .toDF("w")
    val m = withNulls.agg(
      org.apache.spark.sql.GraftColumnBridge.column(
        functions.MisraGries(
          org.apache.spark.sql.GraftColumnBridge.expression(col("w")),
          capacity = 4).toAggregateExpression()).as("sk"))
      .collect()(0).getMap[String, Long](0).toMap
    assert(m === Map("a" -> 2L))
    val empty = spark.emptyDataset[String].toDF("w")
    val e = empty.agg(
      org.apache.spark.sql.GraftColumnBridge.column(
        functions.MisraGries(
          org.apache.spark.sql.GraftColumnBridge.expression(col("w")),
          capacity = 4).toAggregateExpression()).as("sk"))
      .collect()(0).getMap[String, Long](0).toMap
    assert(e === Map.empty[String, Long])
  }

  test("two-phase heavy-hitters query: sketch candidates cover the exact top-20") {
    val out = SparkEntry.queries("text_heavy_hitters")(spark, sfDir).collect()
    assert(out.length == 20)
    // Exact recount cross-check against a plain full groupBy.
    val full = Sources.documents(spark, sfDir)
      .select(explode(split(util.Norm.normalize(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word")).limit(20)
      .collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      full.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }
}
