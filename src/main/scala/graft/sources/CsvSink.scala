package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE connector — the K-sink surface done with the V2
  * two-phase commit protocol (the reference writes through its connector,
  * `yfinance_transform.py:131-137`; this is that boundary Spark-native):
  *
  *  - each TASK writes its partition's rows to a private temp file and
  *    returns the name in its [[WriterCommitMessage]] — speculative or
  *    failed attempts write distinct temp files that are simply never
  *    committed (Spark's task-commit coordinator picks one winner);
  *  - the DRIVER's [[BatchWrite.commit]] renames exactly the winning
  *    attempts' files into place and then writes a `_GRAFT_COMMITTED`
  *    marker LAST — readers trust the marker, so a job that dies
  *    mid-rename leaves garbage files but never a half-visible commit
  *    (the same manifest-last discipline as [[SnapshotStore]]);
  *  - [[BatchWrite.abort]] deletes the temp directory — no partial
  *    output survives a failed job.
  *
  * Append adds files alongside existing ones; overwrite (truncate)
  * clears committed files first. At cluster scale this is exactly the
  * shape of every object-store committer: task-local writes, driver-side
  * atomic publication, marker-gated visibility.
  *
  * Usage: `df.write.format("graft.sources.CsvSink")
  * .option("path", dir).mode("append"|"overwrite").save()` with rows
  * matching [[CsvCatalog.Schema]]; files are plain headerless
  * `kode,name` CSV lines readable by `spark.read.csv` (and by
  * [[CsvCatalog]] once concatenated).
  */
class CsvSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CsvCatalog.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CsvSinkTable(properties.get("path"))
}

private[sources] class CsvSinkTable(path: String)
    extends Table with SupportsWrite {
  require(path != null, "CsvSink requires option(\"path\", ...)")
  override def name(): String = s"csv_sink($path)"
  override def schema(): StructType = CsvCatalog.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new CsvSinkWriteBuilder(path, info.schema())
}

private[sources] class CsvSinkWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  require(schema.fieldNames.sameElements(CsvCatalog.Schema.fieldNames),
    s"CsvSink expects schema ${CsvCatalog.Schema.simpleString}, got ${schema.simpleString}")
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new CsvSinkBatchWrite(path, doTruncate)
  }
}

private[sources] case class CsvSinkCommit(tmpFile: String)
  extends WriterCommitMessage

private[sources] class CsvSinkBatchWrite(path: String, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = new CsvSinkWriterFactory(path)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val marker = new Path(dir, "_GRAFT_COMMITTED")
    if (truncate && fs.exists(dir)) {
      // Truncate = clear previously COMMITTED data files (and the old
      // marker) before publishing this batch.
      fs.listStatus(dir).filter(s => s.getPath.getName.startsWith("part-"))
        .foreach(s => fs.delete(s.getPath, false))
      fs.delete(marker, false)
    }
    // Publish exactly the winning attempts' files.
    messages.collect { case CsvSinkCommit(tmp) =>
      val src = new Path(tmp)
      fs.rename(src, new Path(dir, src.getName.stripPrefix("_tmp_")))
    }
    fs.delete(new Path(dir, "_tmp"), true)
    // Marker LAST: the commit point.
    fs.create(marker, true).close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(new org.apache.hadoop.conf.Configuration())
    fs.delete(new Path(dir, "_tmp"), true)
  }
}

private[sources] class CsvSinkWriterFactory(path: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new CsvSinkWriter(path, partitionId, taskId)
}

/** Task-side writer: rows stream to a private temp file named by
  * (partition, task attempt) — concurrent attempts never collide, and
  * only the attempt whose commit message reaches the driver is ever
  * renamed into the output. */
private[sources] class CsvSinkWriter(path: String, partitionId: Int,
    taskId: Long) extends DataWriter[InternalRow] {
  private val tmp = new Path(
    s"$path/_tmp/_tmp_part-$partitionId-$taskId.csv")
  private val fs = tmp.getFileSystem(new org.apache.hadoop.conf.Configuration())
  private val out = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(fs.create(tmp, true), "UTF-8"))

  override def write(row: InternalRow): Unit = {
    out.write(s"${row.getInt(0)},${row.getUTF8String(1)}")
    out.newLine()
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    CsvSinkCommit(tmp.toString)
  }
  override def abort(): Unit = {
    out.close()
    fs.delete(tmp, false)
  }
  override def close(): Unit = ()
}
