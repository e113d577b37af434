package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** V2 CATALOG PLUGIN — the namespace the engine's connector tables live
  * in, registered via
  * `spark.sql.catalog.<name> = graft.sources.GraftCatalog` (+ optional
  * `spark.sql.catalog.<name>.path`). Two things make this more than
  * sugar over `format(...).load()`:
  *
  *  1. Tables become SQL-addressable (`SELECT ... FROM
  *     <name>.stock_catalog`) — the multi-catalog surface every
  *     lakehouse deployment uses (one catalog per store, resolved by
  *     Spark's analyzer, no DataFrame plumbing).
  *  2. The catalog is ALSO a [[FunctionCatalog]] serving the `bucket`
  *     transform function — which is what lets Spark RESOLVE the
  *     KeyGroupedPartitioning a bucketed scan reports. A pathless
  *     `format().load()` relation has no function catalog, so its
  *     reported partitioning silently degrades to unknown and every
  *     join shuffles; through the catalog, two bucketed tables joined
  *     on Kode plan as a STORAGE-PARTITIONED JOIN with zero exchanges
  *     (SpjSpec) — the Iceberg/Delta SPJ architecture in miniature.
  *
  * Read-only by design: the data plane is the driver's parquet + the
  * committed CSV fixture; mutating DDL throws (a real deployment would
  * forward these to the store's control plane).
  */
class GraftCatalog extends TableCatalog with FunctionCatalog {
  private var catalogName: String = _
  private var csvPath: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    csvPath = Option(options.get("path")).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_CATALOG_CSV", "/root/repo/data/daftar_saham.csv"))
  }
  override def name(): String = catalogName

  private def id(n: String) = Identifier.of(Array.empty[String], n)

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array(id("stock_catalog"), id("stock_catalog_bucketed"))

  override def loadTable(ident: Identifier): Table = ident.name match {
    case "stock_catalog" => new CsvCatalogTable(csvPath)
    case "stock_catalog_bucketed" =>
      new CsvCatalogTable(csvPath, bucketedByDefault = true)
    case other =>
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catalogName, other))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("GraftCatalog is read-only")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("GraftCatalog is read-only")
  override def dropTable(ident: Identifier): Boolean = false
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("GraftCatalog is read-only")

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(id("bucket"))

  override def loadFunction(ident: Identifier): UnboundFunction = ident.name match {
    case "bucket" => GraftCatalog.BucketFunction
    case other =>
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(
        catalogName, other)
  }
}

object GraftCatalog {

  /** The `bucket(n, key)` transform's function binding — what the
    * analyzer loads to resolve a scan-reported
    * KeyGroupedPartitioning(bucket(N, Kode)). For SPJ the load matters
    * more than the math: both sides bind the SAME canonical function,
    * so their partitionings compare compatible and the exchange is
    * elided. The math still must AGREE with the reader's bucket
    * assignment (floorMod of the key) — Spark may evaluate it when
    * one side's partition values need recomputing (partially-clustered
    * distribution). */
  object BucketFunction extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, key): floorMod(key, n) hash bucketing"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 2,
        s"bucket expects (numBuckets, key), got ${inputType.simpleString}")
      BoundBucket
    }
  }

  object BoundBucket extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, IntegerType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket(int,int)"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer =
      Math.floorMod(input.getInt(1), input.getInt(0))
  }
}
