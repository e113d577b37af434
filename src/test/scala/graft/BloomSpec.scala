package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The distributed Bloom filter (graft/functions/BloomAgg.scala): no
  * false negatives under partitioned build + OR-merge, sane
  * false-positive rate, and exactness of the bloom-accelerated dedup
  * query (the filter is an accelerator, never the contract). */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def buildBloom(items: Seq[String], bits: Int, hashes: Int,
                         parts: Int): Array[Byte] = {
    import org.apache.spark.sql.GraftColumnBridge.{column => cexpr, expression => eexpr}
    spark.createDataset(items).toDF("s").repartition(parts)
      .agg(cexpr(functions.BloomAgg(eexpr(col("s")), bits, hashes)
        .toAggregateExpression()).as("b"))
      .collect()(0).getAs[Array[Byte]](0)
  }

  test("no false negatives across partitioned build and merge") {
    val items = (1 to 2000).map(i => s"item-$i")
    for (parts <- Seq(1, 4, 8)) {
      val bloom = buildBloom(items, bits = 1 << 15, hashes = 7, parts = parts)
      val missed = items.filterNot(i =>
        functions.BloomUtil.mightContain(bloom, UTF8String.fromString(i), 7))
      assert(missed.isEmpty,
        s"bloom false negatives at parts=$parts: ${missed.take(5)}")
    }
  }

  test("false-positive rate is near the theoretical bound") {
    // n=2000 into m=2^15 bits, k=7: (1-e^{-kn/m})^k ~ 0.8%.
    val items = (1 to 2000).map(i => s"item-$i")
    val bloom = buildBloom(items, bits = 1 << 15, hashes = 7, parts = 4)
    val probes = (1 to 10000).map(i => s"absent-$i")
    val fp = probes.count(p =>
      functions.BloomUtil.mightContain(bloom, UTF8String.fromString(p), 7))
    assert(fp < 300, s"fpp ${fp / 10000.0} far above the ~0.8% bound")
  }

  test("SQL registration: bloom_agg + bloom_might_contain round-trip") {
    spark.createDataset(Seq("a", "b", "c")).toDF("s").createOrReplaceTempView("bl_in")
    val rows = spark.sql(
      """SELECT bloom_might_contain(b, 'a', 7) AS hit,
        |       bloom_might_contain(b, 'zzz-not-there', 7) AS miss_maybe
        |FROM (SELECT bloom_agg(s, 4096, 7) AS b FROM bl_in)""".stripMargin)
      .collect()(0)
    assert(rows.getBoolean(0), "inserted item must probe true")
    spark.catalog.dropTempView("bl_in")
  }

  test("bloom-accelerated incremental dedup equals the plain anti-join result") {
    val bloomed = SparkEntry.queries("dedup_incremental_bloom")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val plain = SparkEntry.queries("dedup_incremental")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(bloomed === plain)
    assert(bloomed.nonEmpty)
  }

  test("the pre-filter actually filters: most new docs skip the re-check") {
    import org.apache.spark.sql.GraftColumnBridge.{column => cexpr, expression => eexpr}
    val docs = dedup.Dedup.augmented(Sources.documents(spark, sfDir))
      .withColumn("h", md5(util.Norm.normalize(col("text")).cast("binary")))
    val incoming = docs.filter(col("doc_id") % 10 === 0).select("doc_id", "h")
    val existing = docs.filter(col("doc_id") % 10 =!= 0).select("h").distinct()
    val bloomDf = existing.agg(cexpr(functions.BloomAgg(
      eexpr(col("h")), 1 << 20, 7).toAggregateExpression()).as("bloom"))
    val probed = incoming.crossJoin(broadcast(bloomDf))
      .withColumn("maybe",
        cexpr(functions.MightContain(eexpr(col("bloom")), eexpr(col("h")), 7)))
      .cache()
    val maybes = probed.filter(col("maybe")).count()
    val trueDups = incoming.join(existing, Seq("h"), "left_semi").count()
    probed.unpersist()
    // positives = true dups + fp; at m/n >> 10 the fp margin is tiny.
    assert(maybes >= trueDups)
    assert(maybes <= trueDups + math.max(5L, incoming.count() / 100),
      s"bloom passed $maybes positives for $trueDups true dups — not filtering")
  }
}
