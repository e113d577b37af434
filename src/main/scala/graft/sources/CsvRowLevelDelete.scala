package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** GROUP-BASED row-level operations for the catalog table — `DELETE
  * FROM` / `UPDATE` / `MERGE INTO graft_cat.stock_catalog ...`
  * end-to-end through Spark's row-level-operation framework (the
  * copy-on-write architecture Iceberg/Delta use):
  *
  *  1. Spark rewrites the DELETE into a ReplaceData plan: it SCANS the
  *     table through the operation's own scan builder, keeps the rows
  *     that do NOT match the condition (arbitrary predicates — SQL the
  *     connector could never evaluate itself — run in Spark), and
  *  2. writes the survivors back through the operation's WriteBuilder.
  *     Here the whole single-file table is one "group"; a sharded store
  *     would scope the rewrite to the files whose row-group stats can
  *     match (exactly [[SnapshotStore.purgeIds]]'s detection discipline).
  *
  * The physical commit is the engine's standard two-phase shape
  * (CsvSink's protocol): task-private temp files, driver-side merge,
  * atomic REPLACE of the live file last. Writer output order is made
  * deterministic by sorting the merged lines on the integer key — the
  * file is a catalog, and catalog files diff cleanly when sorted. */
private[sources] class CsvDeleteOperation(path: String,
    info: RowLevelOperationInfo) extends RowLevelOperation {
  // DELETE, UPDATE, and MERGE all ride the SAME group-based rewrite: the
  // connector only ever sees "scan the affected groups, write back the
  // replacement rows" — Spark computes what those rows ARE (survivors,
  // updated images, merge results). That one connector surface covering
  // all three commands is the point of the group-based architecture.

  override def command(): RowLevelOperation.Command = info.command
  override def description(): String = s"CsvDeleteOperation($path)"

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CsvCatalogScanBuilder(path, bucketed = false, runtimeFilterable = false)

  override def newWriteBuilder(lwi: LogicalWriteInfo): WriteBuilder = {
    // Bind the column positions from the DECLARED write schema — the
    // replacement plan's row layout is the contract, not an assumption
    // (writing by fixed ordinal produced garbage interleavings when the
    // incoming layout differed).
    val schema = lwi.schema()
    // Physical rows may carry LEADING framework columns beyond the
    // declared schema (observed: one extra int column in the group-based
    // replace); the payload occupies the TRAILING positions in declared
    // order, so bind from the end.
    val kodeOff = schema.size - schema.fieldIndex("Kode")
    val nameOff = schema.size - schema.fieldIndex("Nama Perusahaan")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new CsvReplaceDataWrite(path, kodeOff, nameOff)
      }
    }
  }
}

private[sources] case class CsvTempFileMsg(tmpPath: String)
  extends WriterCommitMessage

/** Two-phase replace: tasks spill surviving rows to private temp files;
  * the driver merges, sorts by key, and atomically moves the result over
  * the live file. An abort (or a losing speculative attempt) leaves only
  * temp files, removed on cleanup — the live file is untouched until the
  * final ATOMIC_MOVE. */
private[sources] class CsvReplaceDataWrite(path: String, kodeOff: Int,
    nameOff: Int) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    CsvReplaceWriterFactory(path, kodeOff, nameOff)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val header = {
      val src = scala.io.Source.fromFile(path)
      try src.getLines().next() finally src.close()
    }
    val kept = messages.toSeq.collect { case CsvTempFileMsg(t) =>
      Files.readAllLines(Paths.get(t), StandardCharsets.UTF_8)
        .toArray(Array.empty[String]).toSeq
    }.flatten
    val keptSorted = kept.sortBy(l => l.substring(0, l.indexOf(',')).trim.toInt)
    val merged = Paths.get(path + ".replace_tmp")
    Files.write(merged, (header +: keptSorted).mkString("\n").concat("\n")
      .getBytes(StandardCharsets.UTF_8))
    Files.move(merged, Paths.get(path), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    cleanup(messages)
    CsvCatalog.invalidateStats(path)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    cleanup(messages)

  private def cleanup(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case CsvTempFileMsg(t) =>
      Files.deleteIfExists(Paths.get(t))
    }
}

/** Ships to executors — a case class of just the path, nothing captured. */
private[sources] case class CsvReplaceWriterFactory(path: String,
    kodeOff: Int, nameOff: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new CsvReplaceWriter(path, partitionId, taskId, kodeOff, nameOff)
}

private[sources] class CsvReplaceWriter(path: String, partitionId: Int,
    taskId: Long, kodeOff: Int, nameOff: Int) extends DataWriter[InternalRow] {
  private val tmp = Paths.get(f"$path%s.task_${partitionId}%05d_$taskId%d.tmp")
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    Files.newOutputStream(tmp), StandardCharsets.UTF_8))

  override def write(record: InternalRow): Unit = {
    out.write(s"${record.getInt(record.numFields - kodeOff)}," +
      s"${record.getUTF8String(record.numFields - nameOff)}")
    out.newLine()
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    CsvTempFileMsg(tmp.toString)
  }
  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(tmp)
  }
  override def close(): Unit = ()
}
