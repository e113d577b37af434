package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsRowLevelOperations, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the stock-catalog CSV — the engine's
  * stand-in for the reference's external-collection connector surface
  * (`yfinance_transform.py:113-115` reads the catalog through the
  * mongo-spark connector; S2 in SURVEY.md §2.1). The parquet tables stay
  * the data plane by driver contract; THIS demonstrates the Spark-native
  * boundary any real external system binds through:
  *
  *  - column PRUNING reaches the reader ([[SupportsPushDownRequiredColumns]]
  *    — a pruned scan never materializes the dropped columns),
  *  - comparison filters on the key PUSH DOWN ([[SupportsPushDownFilters]]
  *    — pushed predicates evaluate inside the partition reader, before
  *    rows ever reach Spark; unsupported predicates stay in the plan's
  *    Filter, so correctness never depends on connector coverage),
  *  - the scan SPLITS into input partitions each executor reads
  *    independently (here: round-robin line strides of one small file;
  *    against a real store: one partition per shard/chunk range).
  *
  * Usage: `spark.read.format("graft.sources.CsvCatalog")
  * .option("path", ...).load()`. Schema is fixed (Kode INT,
  * "Nama Perusahaan" STRING) like any catalog-backed connector table.
  */
class CsvCatalog extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CsvCatalog.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CsvCatalogTable(properties.get("path"))
}

object CsvCatalog {
  val Schema: StructType = new StructType()
    .add("Kode", IntegerType, nullable = false)
    .add("Nama Perusahaan", StringType, nullable = false)

  val NumPartitions = 4

  /** The V1 Filter predicates the reader evaluates itself; everything
    * else is reported back as unsupported and Spark keeps its Filter. */
  def evaluable(f: Filter): Boolean = f match {
    case EqualTo("Kode", _: Int) => true
    case LessThan("Kode", _: Int) => true
    case LessThanOrEqual("Kode", _: Int) => true
    case GreaterThan("Kode", _: Int) => true
    case GreaterThanOrEqual("Kode", _: Int) => true
    case In("Kode", vs) => vs.forall(_.isInstanceOf[Int])
    case IsNotNull(_) => true // schema is non-nullable: always true
    case _ => false
  }

  def eval(f: Filter, kode: Int): Boolean = f match {
    case EqualTo("Kode", v: Int) => kode == v
    case LessThan("Kode", v: Int) => kode < v
    case LessThanOrEqual("Kode", v: Int) => kode <= v
    case GreaterThan("Kode", v: Int) => kode > v
    case GreaterThanOrEqual("Kode", v: Int) => kode >= v
    case In("Kode", vs) => vs.contains(kode)
    case IsNotNull(_) => true
    case _ => true
  }

  /** Rows that survived reader-side predicate evaluation, across all
    * partitions of the most recent scans in this JVM. Spec-only
    * observability: in local mode every reader shares the JVM, so this
    * counter proves a runtime filter actually reached the readers
    * (fewer rows emitted) rather than being applied post-scan. */
  val rowsEmitted = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Runtime-filter callbacks observed (spec-only observability). */
  val runtimeFilterCalls = new java.util.concurrent.atomic.AtomicLong(0L)
  @volatile var lastRuntimeFilters: Array[Filter] = Array.empty

  /** Data-line count (header excluded) for reported statistics; cached
    * per path — planning may ask repeatedly and the answer is stable for
    * the session (a real connector would read this from its catalog). */
  private val lineCounts = new java.util.concurrent.ConcurrentHashMap[String, Long]()
  /** Drop cached statistics after a mutation (row-level DELETE). */
  def invalidateStats(path: String): Unit = lineCounts.remove(path)
  def dataLineCount(path: String): Long =
    lineCounts.computeIfAbsent(path, p => {
      val src = scala.io.Source.fromFile(p)
      try math.max(0L, src.getLines().size - 1L) finally src.close()
    })
}

private[sources] class CsvCatalogTable(path: String,
    bucketedByDefault: Boolean = false) extends Table with SupportsRead
    with SupportsRowLevelOperations {
  require(path != null, "CsvCatalog requires option(\"path\", ...)")
  override def name(): String = s"csv_catalog($path)"
  override def schema(): StructType = CsvCatalog.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
  /** Row-level DELETE via the group-based copy-on-write rewrite —
    * see [[CsvDeleteOperation]]. */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo):
      org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    () => new CsvDeleteOperation(path, info)
  /** The bucketed table advertises its layout at the TABLE level too —
    * what `DESCRIBE` and catalog tooling read. */
  override def partitioning(): Array[Transform] =
    if (bucketedByDefault)
      Array(org.apache.spark.sql.connector.expressions.Expressions.bucket(
        CsvCatalog.NumPartitions, "Kode"))
    else Array.empty
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CsvCatalogScanBuilder(path,
      options.getOrDefault("layout",
        if (bucketedByDefault) "bucketed" else "stride") == "bucketed")
}

/** The aggregate shapes the connector computes reader-side. */
private[sources] sealed trait PushedAgg
private[sources] case object AggCountStar extends PushedAgg
private[sources] case object AggMinKode extends PushedAgg
private[sources] case object AggMaxKode extends PushedAgg

private[sources] class CsvCatalogScanBuilder(path: String, bucketed: Boolean,
    runtimeFilterable: Boolean = true)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = CsvCatalog.Schema
  private var aggs: Seq[PushedAgg] = Nil

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition(CsvCatalog.evaluable)
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private var groupBy: Seq[String] = Nil

  /** PARTIAL aggregate pushdown (`supportCompletePushDown` stays false —
    * the scale-correct contract): each input partition emits its local
    * (count / min / max) rows and Spark's final aggregate merges them,
    * so the exchange carries one row per (group ×) partition instead of
    * the table. Against a real store this is "server-side aggregation
    * per shard". GROUP BY plain catalog COLUMNS is pushed too (round 7):
    * the scan then emits group-key columns FIRST, one partial row per
    * group per partition — Spark's merge aggregate re-groups on those
    * keys, which is exactly the map-side-combine contract. Grouping by
    * an EXPRESSION (or any unsupported aggregate) is still REFUSED and
    * Spark keeps its own plan — like filter pushdown, connector
    * coverage is a performance property, never a correctness
    * dependency. */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    def colRef(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case r: NamedReference if r.fieldNames().length == 1 &&
          CsvCatalog.Schema.fieldNames.contains(r.fieldNames()(0)) =>
          Some(r.fieldNames()(0))
        case _ => None
      }
    def kodeRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      colRef(e).contains("Kode")
    val groups = aggregation.groupByExpressions().map(colRef)
    if (groups.exists(_.isEmpty)) return false // expression grouping: refuse
    val specs = aggregation.aggregateExpressions().map {
      case _: CountStar => Option[PushedAgg](AggCountStar)
      case m: Min if kodeRef(m.column) => Option[PushedAgg](AggMinKode)
      case m: Max if kodeRef(m.column) => Option[PushedAgg](AggMaxKode)
      case _ => Option.empty[PushedAgg]
    }
    // Refuse EMPTY aggregations too (not just unsupported ones): a
    // `df.count()` over an ungrouped aggregate prunes the inner agg's
    // expression list to nothing, and accepting it vacuously while
    // build() falls back to the plain scan trips Spark's
    // "unexpected number of columns" assertion in
    // V2ScanRelationPushDown (found by the bench's count() protocol).
    if (specs.isEmpty || specs.exists(_.isEmpty)) false
    else {
      aggs = specs.flatten.toSeq
      groupBy = groups.flatten.toSeq
      true
    }
  }

  override def build(): Scan =
    if (aggs.nonEmpty) new CsvCatalogAggScan(path, pushed, aggs, groupBy)
    else new CsvCatalogScan(path, pushed, required, bucketed, runtimeFilterable)
}

/** RUNTIME filtering ([[SupportsRuntimeFiltering]]): when this scan's
  * `Kode` joins a dimension that Spark can evaluate first (a broadcast
  * build side), the planner plants a DynamicPruning subquery on the scan
  * and, at execution time, calls [[filter]] with the build side's actual
  * key set (an `In` filter). The readers then evaluate it alongside the
  * statically-pushed predicates — the DSv2 twin of dynamic partition
  * pruning (DppSpec pins the parquet case). Against a real sharded
  * store, the same callback prunes whole shards/chunk ranges before any
  * request is issued; here each stride reader skips non-matching rows at
  * the parse loop. Unsupported runtime predicates are simply dropped —
  * Spark re-applies the join predicate anyway, so (like static pushdown)
  * connector coverage is a performance property, never correctness. */
private[sources] class CsvCatalogScan(path: String, pushed: Array[Filter],
    required: StructType, bucketed: Boolean = false,
    runtimeFilterable: Boolean = true)
    extends Scan with Batch with SupportsRuntimeFiltering
    with SupportsReportStatistics with SupportsReportPartitioning {

  /** Reported PARTITIONING — the storage-partitioned-join surface. With
    * `option("layout", "bucketed")` each input partition holds exactly
    * the rows with Kode % NumPartitions == idx and announces that fact:
    * the scan reports KeyGroupedPartitioning over bucket(N, Kode) and
    * every partition carries its bucket id as a partition key. Two such
    * scans joined on Kode then need NO exchange at all (Spark matches
    * the partition values side to side) — the DSv2 generalization of
    * the engine's bucketed_join: the table's LAYOUT carries the join's
    * co-location, so the cluster never pays a shuffle for it. The
    * default stride layout reports UnknownPartitioning (a round-robin
    * stride admits no key-based co-location). */
  override def outputPartitioning():
      org.apache.spark.sql.connector.read.partitioning.Partitioning =
    if (bucketed)
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions.bucket(
          CsvCatalog.NumPartitions, "Kode")),
        CsvCatalog.NumPartitions)
    else new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(
      CsvCatalog.NumPartitions)
  import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
  private var runtime: Array[Filter] = Array.empty

  /** Reported STATISTICS — what makes the connector a first-class
    * citizen of join planning. Without this, a DSv2 relation falls back
    * to `spark.sql.defaultSizeInBytes` (effectively "huge"), so the
    * catalog can NEVER auto-broadcast and every join against it pays a
    * shuffle unless the user hand-hints; with it, Spark sees the true
    * ~30 KB and broadcasts on its own (CsvCatalogSpec pins exactly that
    * flip). Size = the real file length; row count = data lines. Pushed
    * filters make both UPPER bounds — safe for planning (over-estimating
    * never picks a wrong-side broadcast); a server-backed connector
    * would serve the same numbers from its catalog, not a stat() call. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val len = new java.io.File(path).length()
    private val rows = CsvCatalog.dataLineCount(path)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(len)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }

  // A row-level operation's REPLACEMENT scan must refuse runtime
  // filtering on the data column: Spark's group-filtering rule would
  // deliver the MATCHING (to-delete) keys as the dynamic filter, and a
  // scan honoring it would read exactly the rows being deleted — the
  // survivors the write needs would never be scanned. (Real file-group
  // stores runtime-filter on FILE identity metadata instead.)
  override def filterAttributes(): Array[NamedReference] =
    if (runtimeFilterable) Array(Expressions.column("Kode"))
    else Array.empty
  override def filter(filters: Array[Filter]): Unit = {
    CsvCatalog.runtimeFilterCalls.incrementAndGet()
    CsvCatalog.lastRuntimeFilters = filters
    runtime = filters.filter(CsvCatalog.evaluable)
  }

  override def readSchema(): StructType = required
  override def description(): String =
    s"CsvCatalogScan path=$path, PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"
  override def toBatch: Batch = this
  // The effective predicate set rides IN the partitions: Spark's runtime-
  // filtering contract re-plans input partitions after the filter()
  // callback, but may have created the reader factory BEFORE it (observed
  // in 4.1) — a factory-captured filter array would silently miss the
  // runtime predicates. Each partition is self-describing, exactly like a
  // shard descriptor that carries its server-side query.
  override def planInputPartitions(): Array[InputPartition] =
    Array.tabulate(CsvCatalog.NumPartitions)(i =>
      CsvCatalogPartition(path, i, CsvCatalog.NumPartitions,
        pushed ++ runtime, bucketed))
  override def createReaderFactory(): PartitionReaderFactory =
    new CsvCatalogReaderFactory(required)
}

private[sources] case class CsvCatalogPartition(path: String, idx: Int,
    numParts: Int, filters: Array[Filter] = Array.empty,
    bucketed: Boolean = false)
    extends InputPartition with HasPartitionKey {
  /** The bucket id, consumed only when the scan reports
    * KeyGroupedPartitioning (stride partitions never surface it). */
  override def partitionKey(): InternalRow = InternalRow(idx)
}

/** Scan for a pushed aggregation: each partition reads its stride,
  * applies the pushed filters, and emits its partial rows — the group-
  * key columns FIRST (when grouped), then (count / min / max) in the
  * pushed order — that Spark's final aggregate merges. Ungrouped: ONE
  * row per partition; grouped: one row per group per partition (the
  * map-side-combine contract — the exchange carries partials, never
  * table rows). Output schema follows the aggregation positionally:
  * LongType for COUNT(*), the column type (nullable — an empty stride
  * has no min/max) for MIN/MAX. */
private[sources] class CsvCatalogAggScan(path: String, pushed: Array[Filter],
    aggs: Seq[PushedAgg], groupBy: Seq[String]) extends Scan with Batch {
  override def readSchema(): StructType = {
    val withGroups = groupBy.foldLeft(new StructType()) { (st, g) =>
      st.add(CsvCatalog.Schema(g))
    }
    aggs.zipWithIndex.foldLeft(withGroups) {
      case (st, (AggCountStar, i)) => st.add(s"count_$i", LongType, nullable = false)
      case (st, (AggMinKode, i)) => st.add(s"min_$i", IntegerType, nullable = true)
      case (st, (AggMaxKode, i)) => st.add(s"max_$i", IntegerType, nullable = true)
    }
  }
  override def description(): String =
    s"CsvCatalogAggScan path=$path, PushedFilters: [${pushed.mkString(", ")}], " +
      s"PushedAggregates: [${aggs.mkString(", ")}], " +
      s"PushedGroupBy: [${groupBy.mkString(", ")}]"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array.tabulate(CsvCatalog.NumPartitions)(i =>
      CsvCatalogPartition(path, i, CsvCatalog.NumPartitions))
  override def createReaderFactory(): PartitionReaderFactory =
    new CsvCatalogAggReaderFactory(pushed, aggs, groupBy)
}

private[sources] class CsvCatalogAggReaderFactory(pushed: Array[Filter],
    aggs: Seq[PushedAgg], groupBy: Seq[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new CsvCatalogAggReader(
      partition.asInstanceOf[CsvCatalogPartition], pushed, aggs, groupBy)
}

/** Computes the partition-local partials in one stride pass. Grouped:
  * an insertion-ordered map keyed by the group values accumulates
  * (count, min, max) per group — bounded by the stride's distinct group
  * count, the same bound a hash-aggregate's map has. */
private[sources] class CsvCatalogAggReader(p: CsvCatalogPartition,
    pushed: Array[Filter], aggs: Seq[PushedAgg], groupBy: Seq[String])
    extends PartitionReader[InternalRow] {
  private final class Acc { var n = 0L; var mn = Int.MaxValue; var mx = Int.MinValue }
  private var rows: Iterator[InternalRow] = _
  private var row: InternalRow = _

  private def computed(): Iterator[InternalRow] = {
    val accs = new scala.collection.mutable.LinkedHashMap[Seq[Any], Acc]()
    val src = scala.io.Source.fromFile(p.path)
    try src.getLines().drop(1).zipWithIndex.foreach { case (line, i) =>
      if (i % p.numParts == p.idx) {
        val cut = line.indexOf(',')
        val kode = line.substring(0, cut).trim.toInt
        if (pushed.forall(CsvCatalog.eval(_, kode))) {
          val key: Seq[Any] = groupBy.map {
            case "Kode" => kode.asInstanceOf[Any]
            case _ => UTF8String.fromString(line.substring(cut + 1))
          }
          val a = accs.getOrElseUpdate(key, new Acc)
          a.n += 1
          if (kode < a.mn) a.mn = kode
          if (kode > a.mx) a.mx = kode
        }
      }
    } finally src.close()
    // Ungrouped contract: exactly one partial row even for an empty
    // stride (count 0, null min/max); grouped: empty stride → no rows.
    val groups: Iterator[(Seq[Any], Acc)] =
      if (groupBy.isEmpty && accs.isEmpty) Iterator((Nil, new Acc))
      else accs.iterator
    groups.map { case (key, a) =>
      InternalRow.fromSeq(key.toIndexedSeq ++ aggs.map {
        case AggCountStar => a.n.asInstanceOf[Any]
        case AggMinKode => if (a.n == 0) null else a.mn.asInstanceOf[Any]
        case AggMaxKode => if (a.n == 0) null else a.mx.asInstanceOf[Any]
      })
    }
  }

  override def next(): Boolean = {
    if (rows == null) rows = computed()
    if (rows.hasNext) { row = rows.next(); true } else false
  }
  override def get(): InternalRow = row
  override def close(): Unit = ()
}

private[sources] class CsvCatalogReaderFactory(
    required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CsvCatalogPartition]
    new CsvCatalogReader(p, p.filters, required)
  }
}

/** Reads this partition's round-robin stride of data lines, evaluates
  * the pushed predicates reader-side, and emits only the pruned columns
  * — the same shape a sharded-store reader has (its stride is the shard
  * scan, its predicate evaluation is the server-side query). */
private[sources] class CsvCatalogReader(p: CsvCatalogPartition,
    pushed: Array[Filter], required: StructType)
    extends PartitionReader[InternalRow] {
  private val lines = {
    val src = scala.io.Source.fromFile(p.path)
    // Stride layout: every numParts-th line. Bucketed layout: the rows
    // whose KEY hashes to this partition (Kode % numParts) — the
    // selection the reported KeyGroupedPartitioning promises.
    try src.getLines().drop(1).zipWithIndex.collect {
      case (ln, i) if !p.bucketed && i % p.numParts == p.idx => ln
      case (ln, _) if p.bucketed &&
        ln.substring(0, ln.indexOf(',')).trim.toInt % p.numParts == p.idx => ln
    }.toArray
    finally src.close()
  }
  private var pos = 0
  private var row: InternalRow = _

  override def next(): Boolean = {
    while (pos < lines.length) {
      val line = lines(pos); pos += 1
      val cut = line.indexOf(',')
      val kode = line.substring(0, cut).trim.toInt
      if (pushed.forall(CsvCatalog.eval(_, kode))) {
        CsvCatalog.rowsEmitted.incrementAndGet()
        val vals = required.fieldNames.map {
          case "Kode" => kode.asInstanceOf[Any]
          case "Nama Perusahaan" => UTF8String.fromString(line.substring(cut + 1))
        }
        row = InternalRow.fromSeq(vals.toIndexedSeq)
        return true
      }
    }
    false
  }
  override def get(): InternalRow = row
  override def close(): Unit = ()
}
