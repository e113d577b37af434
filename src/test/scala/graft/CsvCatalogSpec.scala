package graft

import org.apache.spark.sql.functions._

/** The DataSource V2 connector contract: content parity with the plain
  * CSV read, filter pushdown INTO the partition readers, column pruning,
  * multi-partition scan, and graceful retention of predicates the
  * connector can't evaluate. */
class CsvCatalogSpec extends SparkSpec {

  private def v2 = Sources.stockCatalogV2(spark)

  test("content parity: V2 connector rows == spark.read.csv rows") {
    val a = v2.collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    val b = Sources.stockCatalog(spark).collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    assert(a.length == b.length && a.sameElements(b))
  }

  test("comparison filter pushes into the scan and rows are correct") {
    val df = v2.filter(col("Kode") < 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [LessThan(Kode,10)") ||
      plan.contains("LessThan(Kode,10)"),
      s"filter not pushed:\n$plan")
    assert(df.count() == 10)
    assert(df.agg(max("Kode")).head().getInt(0) == 9)
  }

  test("column pruning reaches the reader's schema") {
    val df = v2.filter(col("Kode") >= 1990).select("Nama Perusahaan")
    val plan = df.queryExecution.executedPlan.toString
    // The scan's description carries its pruned ReadSchema — Kode is
    // needed only for the pushed predicate, not in the output schema.
    assert(plan.contains("ReadSchema: struct<Nama Perusahaan:string>") ||
      plan.contains("ReadSchema: struct<Nama Perusahaan: string>"),
      s"columns not pruned:\n$plan")
    assert(df.count() == 10)
  }

  test("scan splits into multiple input partitions") {
    assert(v2.rdd.getNumPartitions == sources.CsvCatalog.NumPartitions)
  }

  test("unsupported predicates stay in Spark's Filter and still apply") {
    // Kode % 2 = 0 is not a connector-evaluable shape: it must be
    // REJECTED by pushFilters and applied by Spark's own Filter node.
    val df = v2.filter(col("Kode") < 100 && pmod(col("Kode"), lit(2)) === 0)
    assert(df.count() == 50)
    val rows = df.collect().map(_.getInt(0))
    assert(rows.forall(k => k < 100 && k % 2 == 0))
  }

  test("ungrouped count/min/max push into the scan as partial aggregates") {
    val truth = Sources.stockCatalog(spark)
      .agg(count(lit(1)), min("Kode"), max("Kode")).head()
    val df = v2.agg(count(lit(1)).as("n"), min("Kode").as("mn"), max("Kode").as("mx"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"),
      s"aggregation not pushed into the scan:\n$plan")
    val r = df.head()
    assert(r.getLong(0) == truth.getLong(0) &&
      r.getInt(1) == truth.getInt(1) && r.getInt(2) == truth.getInt(2))
  }

  test("pushed aggregation composes with pushed filters") {
    val df = v2.filter(col("Kode") < 50).agg(count(lit(1)), min("Kode"), max("Kode"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates") && plan.contains("LessThan(Kode,50)"),
      s"filter+agg not both pushed:\n$plan")
    val r = df.head()
    assert(r.getLong(0) == 50L && r.getInt(1) == 0 && r.getInt(2) == 49)
  }

  test("empty-result pushed aggregation: count 0, null min/max") {
    val df = v2.filter(col("Kode") < 0).agg(count(lit(1)), min("Kode"), max("Kode"))
    val r = df.head()
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2))
  }

  test("count() over a pushed-agg frame plans (empty aggregation refused)") {
    // df.count() prunes the inner ungrouped aggregate's expression list
    // to NOTHING; the builder must refuse the empty aggregation (accepting
    // it vacuously trips Spark's column-count assertion in
    // V2ScanRelationPushDown — the bench's count() protocol found this).
    val df = SparkEntry.queries("yf_dsv2_agg_pushdown")(spark, sfDir)
    assert(df.count() == 1L)
  }

  test("grouped aggregation is refused and still computes correctly") {
    // groupBy is not pushable here: the builder must refuse and Spark
    // runs its own aggregate over the plain scan.
    val df = v2.filter(col("Kode") < 20)
      .groupBy(pmod(col("Kode"), lit(2)).as("parity"))
      .agg(count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedAggregates"),
      s"grouped aggregation must not claim pushdown:\n$plan")
    val m = df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(m == Map(0 -> 10L, 1 -> 10L))
  }

  test("GROUP BY a plain column pushes as a grouped partial aggregate") {
    val df = v2.filter(col("Kode") < 40)
      .groupBy(col("Kode")).agg(count(lit(1)).as("n"), max(col("Kode")).as("mx"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates") && plan.contains("PushedGroupBy: [Kode]"),
      s"expected a grouped pushed aggregate:\n$plan")
    val rows = df.collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2)))
    // The catalog's keys are unique → every group counts exactly 1 and
    // max(Kode) echoes the key; the merge aggregate summed the per-
    // partition partials correctly.
    assert(rows.length == 40)
    assert(rows.forall { case (k, n, mx) => n == 1L && mx == k && k < 40 })
  }

  test("grouped pushdown by a string column carries UTF8 keys intact") {
    val df = v2.filter(col("Kode") < 10)
      .groupBy(col("Nama Perusahaan")).agg(count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedGroupBy: [Nama Perusahaan]"),
      s"expected the string group key pushed:\n$plan")
    val direct = Sources.stockCatalog(spark).filter(col("Kode") < 10)
      .groupBy(col("Nama Perusahaan")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == direct && got.nonEmpty)
  }

  test("reported statistics reach plan stats and enable UNHINTED auto-broadcast") {
    // The scan reports its true ~30 KB size (SupportsReportStatistics);
    // without it a DSv2 relation defaults to "huge" and can never
    // auto-broadcast. Stats must flow into the optimized plan…
    val stats = v2.queryExecution.optimizedPlan.stats
    val fileLen = new java.io.File(Sources.CatalogCsvPath).length()
    assert(stats.sizeInBytes.toLong == fileLen,
      s"expected the reported file length $fileLen, got ${stats.sizeInBytes}")
    assert(stats.rowCount.forall(_.toLong > 0))
    // …and the join side must broadcast with NO broadcast() hint.
    val fact = Sources.ohlcv(spark, sfDir).select(col("symbol"))
    val dim = Sources.stockCatalogV2(spark)
    val joined = fact.join(dim, col("symbol") === col("Kode"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected stats-driven auto-broadcast of the catalog side:\n$plan")
  }
}
