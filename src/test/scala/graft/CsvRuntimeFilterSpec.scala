package graft

import org.apache.spark.sql.functions._
import graft.sources.CsvCatalog

/** DSv2 runtime filtering ([[graft.sources.CsvCatalog]] +
  * `SupportsRuntimeFiltering`): when the connector scan's key joins a
  * broadcast-able dimension carrying a selective filter, Spark plants a
  * DynamicPruning subquery on the scan and delivers the build side's
  * actual key set to `Scan.filter` at execution time — the DSv2 twin of
  * dynamic partition pruning (DppSpec pins the parquet-layout case).
  * The JVM-shared `rowsEmitted` counter proves the filter reached the
  * stride READERS (rows skipped at the parse loop), not a post-scan
  * Filter node. */
class CsvRuntimeFilterSpec extends SparkSpec {

  private def v2 = Sources.stockCatalogV2(spark)
  private def v1 = Sources.stockCatalog(spark)

  test("broadcast dim join plants a runtime filter that reaches the readers") {
    // A selective dim: catalog keys ending in 7, via the V1 CSV read so
    // the dim plan carries a real (likely-selective) Filter node.
    val dim = v1.select(col("Kode").as("k")).filter(pmod(col("k"), lit(10)) === 7)

    val joined = v2.join(broadcast(dim), col("Kode") === col("k"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no runtime filter planted on the V2 scan:\n$plan")

    CsvCatalog.rowsEmitted.set(0L)
    CsvCatalog.runtimeFilterCalls.set(0L)
    val got = joined.select("Kode", "Nama Perusahaan").collect()
    val emittedFiltered = CsvCatalog.rowsEmitted.get()
    assert(CsvCatalog.runtimeFilterCalls.get() >= 1L,
      "Scan.filter was never invoked at runtime")
    assert(CsvCatalog.lastRuntimeFilters.exists(
      _.isInstanceOf[org.apache.spark.sql.sources.In]),
      s"expected an In runtime filter, got " +
        s"[${CsvCatalog.lastRuntimeFilters.mkString(", ").take(200)}]")

    CsvCatalog.rowsEmitted.set(0L)
    val all = v2.collect()
    val emittedFull = CsvCatalog.rowsEmitted.get()

    assert(emittedFull == all.length.toLong)
    assert(emittedFiltered < emittedFull,
      s"readers emitted $emittedFiltered rows with the runtime filter vs " +
        s"$emittedFull unfiltered — the In set never reached the readers")
    assert(emittedFiltered == got.length.toLong,
      "readers emitted more rows than the join result — runtime filter " +
        "was not exact on the key set")

    // Results identical to the plain V1 join.
    val expect = v1.join(dim, col("Kode") === col("k"))
      .select("Kode", "Nama Perusahaan").collect()
    assert(got.map(_.toString).sorted.toSeq == expect.map(_.toString).sorted.toSeq)
  }

  test("unsupported runtime predicates are dropped without breaking the scan") {
    // filter() keeps only evaluable predicates; an empty runtime set must
    // leave the static behavior untouched.
    val scan = new graft.sources.CsvCatalogScanProbe().scanFor(Sources.CatalogCsvPath)
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.StringContains("Nama Perusahaan", "x")))
    assert(scan.planInputPartitions().length == CsvCatalog.NumPartitions)
    // The dropped predicate must not have leaked into the reader path:
    // a fresh factory still emits every row.
    CsvCatalog.rowsEmitted.set(0L)
    val factory = scan.createReaderFactory()
    scan.planInputPartitions().foreach { p =>
      val r = factory.createReader(p)
      while (r.next()) r.get()
      r.close()
    }
    val expected = scala.io.Source.fromFile(Sources.CatalogCsvPath)
      .getLines().drop(1).length
    assert(CsvCatalog.rowsEmitted.get() == expected.toLong)
  }
}
