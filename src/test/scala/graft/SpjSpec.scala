package graft

import org.apache.spark.sql.functions._

/** Storage-partitioned joins (SPJ) through the V2 catalog plugin — the
  * connector-world generalization of bucketed tables (BucketSpec pins
  * the warehouse-table case). The bucketed table's scan reports
  * KeyGroupedPartitioning over bucket(N, Kode) with each input
  * partition carrying its bucket id; the CATALOG (GraftCatalog, also a
  * FunctionCatalog) serves the bucket function the analyzer needs to
  * resolve that partitioning — a pathless format().load() relation has
  * no function catalog, which is precisely why SPJ requires the catalog
  * route (pinned below). When both join sides resolve compatible
  * partitioning on the join key, Spark matches partition values side to
  * side and plans the join with NO exchange — at 100 TB the difference
  * between a co-located merge and shuffling both tables.
  */
class SpjSpec extends SparkSpec {

  private def withConfs[A](confs: (String, String)*)(body: => A): A = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def ensureCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")

  test("catalog tables are SQL-addressable and match the format() read") {
    ensureCatalog()
    val viaCatalog = spark.sql("SELECT * FROM graft_cat.stock_catalog")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    val viaFormat = Sources.stockCatalogV2(spark).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(viaCatalog == viaFormat && viaCatalog.nonEmpty)
    val bucketed = spark.sql("SELECT * FROM graft_cat.stock_catalog_bucketed")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(bucketed == viaFormat)
  }

  test("two bucketed catalog tables join on Kode with ZERO exchanges") {
    ensureCatalog()
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      // force a non-broadcast join so the exchange (or its absence) is
      // the thing under test
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val a = spark.table("graft_cat.stock_catalog_bucketed")
        .select(col("Kode").as("k1"), col("Nama Perusahaan").as("name1"))
      val b = spark.table("graft_cat.stock_catalog_bucketed")
        .select(col("Kode").as("k2"))
      val joined = a.join(b, col("k1") === col("k2"))
      val n = joined.collect().length
      // Unique keys: the self-join is exactly the catalog.
      assert(n == Sources.stockCatalogV2(spark).count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected a storage-partitioned join with no exchange:\n$plan")
    }
  }

  test("the format() route cannot resolve the partitioning — SPJ needs the catalog") {
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val a = Sources.stockCatalogV2Bucketed(spark).select(col("Kode").as("k1"))
      val b = Sources.stockCatalogV2Bucketed(spark).select(col("Kode").as("k2"))
      val joined = a.join(b, col("k1") === col("k2"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"),
        s"a relation without a function catalog must fall back to a shuffle:\n$plan")
    }
  }

  test("without the bucketing conf the same catalog join falls back to a shuffle") {
    ensureCatalog()
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val a = spark.table("graft_cat.stock_catalog_bucketed")
        .select(col("Kode").as("k1"))
      val b = spark.table("graft_cat.stock_catalog_bucketed")
        .select(col("Kode").as("k2"))
      val joined = a.join(b, col("k1") === col("k2"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"),
        s"reported partitioning must only be consumed under the conf:\n$plan")
    }
  }
}
