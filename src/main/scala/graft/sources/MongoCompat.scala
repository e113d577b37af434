package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** `format("mongo")` COMPATIBILITY SHIM — the one reference API surface
  * that had no counterpart here (`Tugas 2/Yfinance API/
  * yfinance_transform.py:113-115,125-128`: `spark.read.format("mongo")
  * .option("uri", s"$MONGO_URI/$DB.$collection").load()` and the
  * matching `df.write.format("mongo").option("uri", …).mode("append")
  * .save()`). A reference user's read/write lines now run UNMODIFIED:
  * the legacy connector's short name resolves to this source via the
  * `DataSourceRegister` service file, and each `db.collection` maps onto
  * the engine's parquet data plane at `<root>/<db>/<collection>` —
  * strictly better storage than BSON sampling (columnar, typed footers,
  * min/max stats) behind the exact same call shape.
  *
  * Scope, honestly stated: this is an API shim over the lake, not a wire
  * client — there is no mongod in this environment (and the whole point
  * of the engine is that collections LIVE in the lake). The host part of
  * the URI is accepted and ignored, like a connection string to a
  * metastore that has moved.
  *
  * Read path: column pruning + the six comparison filters are honored
  * inside the shim (they re-apply onto the parquet scan, so pushdown
  * still reaches the footers); anything else Spark re-evaluates above,
  * per the DSv1 advisory-filter contract.
  */
class MongoCompat extends RelationProvider with CreatableRelationProvider
    with DataSourceRegister {

  override def shortName(): String = "mongo"

  override def createRelation(ctx: SQLContext,
                              parameters: Map[String, String]): BaseRelation =
    new MongoCompatRelation(ctx, MongoCompat.resolvePath(ctx, parameters))

  override def createRelation(ctx: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val path = MongoCompat.resolvePath(ctx, parameters)
    data.write.mode(mode).parquet(path)
    new MongoCompatRelation(ctx, path)
  }
}

object MongoCompat {
  /** `mongodb://host[:port]/DB.collection` → `<root>/DB/collection`.
    * Root comes from option `root`, conf `spark.graft.mongo.root`, or
    * `<warehouse>/mongo_compat`. */
  def resolvePath(ctx: SQLContext, parameters: Map[String, String]): String = {
    val uri = parameters.getOrElse("uri",
      throw new IllegalArgumentException(
        "format(\"mongo\"): option 'uri' is required (mongodb://host/DB.collection)"))
    // mongodb+srv:// is accepted as an alias (same namespace syntax);
    // anything else must carry the plain scheme, loudly.
    val stripped =
      if (uri.startsWith("mongodb+srv://")) uri.stripPrefix("mongodb+srv://")
      else if (uri.startsWith("mongodb://")) uri.stripPrefix("mongodb://")
      else throw new IllegalArgumentException(
        s"format(\"mongo\"): unsupported scheme in '$uri' — " +
          "expected mongodb:// or mongodb+srv://")
    val tail = stripped.split("/", 2) match {
      case Array(_, dbColl) if dbColl.nonEmpty => dbColl
      case _ => throw new IllegalArgumentException(
        s"format(\"mongo\"): cannot parse '$uri' — expected mongodb://host/DB.collection")
    }
    val (db, coll) = tail.split("\\.", 2) match {
      case Array(d, c) if c.nonEmpty => (d, c)
      case _ => throw new IllegalArgumentException(
        s"format(\"mongo\"): uri names no collection: '$uri'")
    }
    // The pair must map to EXACTLY one <root>/<db>/<coll> directory: a
    // '/' would silently nest (mongodb://h/a/b.c → root/a/b/c), '..'
    // or an empty segment would escape/stray outside the compat root.
    Seq("database" -> db, "collection" -> coll).foreach { case (what, seg) =>
      if (seg.isEmpty || seg == "." || seg == ".." ||
          seg.contains("/") || seg.contains("\\"))
        throw new IllegalArgumentException(
          s"format(\"mongo\"): invalid $what segment '$seg' in '$uri' — " +
            "must be a single path-safe name")
    }
    val root = parameters.get("root")
      .orElse(ctx.sparkSession.conf.getOption("spark.graft.mongo.root"))
      .getOrElse(ctx.sparkSession.conf.get("spark.sql.warehouse.dir")
        .stripSuffix("/") + "/mongo_compat")
    s"$root/$db/$coll"
  }
}

/** Parquet-backed relation behind the shim: schema from the footers (the
  * typed upgrade of the connector's BSON sampling), scans pruned and
  * filter-forwarded onto the inner parquet read. */
class MongoCompatRelation(ctx: SQLContext, path: String)
    extends BaseRelation with PrunedFilteredScan {

  override def sqlContext: SQLContext = ctx

  private def df: DataFrame = ctx.sparkSession.read.parquet(path)

  override val schema: StructType = df.schema

  /** DSv1 filters are advisory — translate the common comparisons onto
    * the parquet scan (where they push to footer stats) and let Spark
    * re-check everything above. */
  private def toColumn(f: Filter): Option[org.apache.spark.sql.Column] = f match {
    case EqualTo(a, v) => Some(col(a) === v)
    case GreaterThan(a, v) => Some(col(a) > v)
    case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
    case LessThan(a, v) => Some(col(a) < v)
    case LessThanOrEqual(a, v) => Some(col(a) <= v)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case IsNull(a) => Some(col(a).isNull)
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case And(l, r) =>
      (toColumn(l), toColumn(r)) match {
        case (Some(a), Some(b)) => Some(a && b)
        case _ => None
      }
    case _ => None
  }

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val filtered = filters.flatMap(toColumn).foldLeft(df)(_.filter(_))
    // Empty requiredColumns is the count() shape: project to ZERO
    // columns (row count only) so the inner parquet scan reads no data
    // pages — returning full-width rows here would pay whole-table I/O
    // for a count.
    filtered.select(requiredColumns.toIndexedSeq.map(col): _*).rdd
  }
}
