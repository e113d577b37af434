package graft.sources

import org.apache.spark.sql.connector.read.{Batch, Scan, SupportsRuntimeFiltering}

/** Test-side access to the package-private scan, for exercising the
  * runtime-filter drop path directly (CsvRuntimeFilterSpec). */
class CsvCatalogScanProbe {
  def scanFor(path: String): Scan with Batch with SupportsRuntimeFiltering =
    new CsvCatalogScan(path, Array.empty, CsvCatalog.Schema)
}
