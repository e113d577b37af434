package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file COMPACTION — the lakehouse maintenance primitive. A
  * streaming or frequently-appending sink accumulates many small part
  * files; every later scan then pays per-file open/footer costs and the
  * scheduler pays per-split overhead (at 100 TB, millions of tiny files
  * is a cluster-killer long before data volume is). Compaction rewrites
  * the table at a target file size: file count = ceil(bytes / target),
  * one round-robin repartition (no key semantics to preserve — this is
  * layout, not content), one write.
  *
  * Deliberately writes to a NEW directory: atomic in-place swap is a
  * table-format concern (transaction logs); a plain-parquet engine
  * compacts aside and flips readers, which is also the safe pattern for
  * a live table. Content equality is the spec's job (row counts and an
  * order-insensitive digest are asserted in MaintenanceSpec).
  */
object Maintenance {

  final case class FileStats(nFiles: Int, totalBytes: Long, maxBytes: Long)

  /** Part-file statistics of a parquet directory (data files only). */
  def fileStats(spark: SparkSession, dir: String): FileStats = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(p).filter { st =>
      val n = st.getPath.getName
      st.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
    }
    FileStats(parts.length, parts.map(_.getLen).sum,
      if (parts.isEmpty) 0L else parts.map(_.getLen).max)
  }

  /** Compact `srcDir` into `dstDir` at ~`targetBytes` per file. Returns
    * (before, after) stats. */
  def compactTo(spark: SparkSession, srcDir: String, dstDir: String,
                targetBytes: Long): (FileStats, FileStats) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val before = fileStats(spark, srcDir)
    val nOut = math.max(1, math.ceil(before.totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(srcDir)
      .repartition(nOut)
      .write.mode("overwrite").parquet(dstDir)
    (before, fileStats(spark, dstDir))
  }

  /** Compact `dir` IN PLACE: rewrite aside to `<dir>.__compact__`, then
    * swap (delete originals, rename aside into place). The swap is not
    * atomic on a plain filesystem — callers own quiescence (the
    * streamed-artifact compaction runs on the foreachBatch thread, which
    * serializes micro-batches, so no reader/writer races; a table format
    * with a transaction log would make the flip atomic). A crash between
    * delete and rename loses no DATA (the aside copy is complete and
    * durable before the delete starts) but needs a manual rename to
    * recover — the aside dir is the recovery artifact. Returns (before,
    * after) stats. */
  def compactInPlace(spark: SparkSession, dir: String,
                     targetBytes: Long): (FileStats, FileStats) = {
    val aside = s"$dir.__compact__"
    val stats = compactTo(spark, dir, aside, targetBytes)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    require(fs.rename(new Path(aside), p),
      s"compactInPlace: rename $aside -> $dir failed; data is intact in $aside")
    (stats._1, fileStats(spark, dir))
  }

  /** Order-insensitive content digest for equality checks: xor of
    * per-row md5 prefixes — associative/commutative, so layout changes
    * never move it. */
  def contentDigest(df: DataFrame): Long = {
    import org.apache.spark.sql.functions._
    val cols = df.columns.sorted.map(c => col(s"`$c`").cast("string"))
    df.select(
        conv(substring(md5(concat_ws("", cols: _*).cast("binary")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .agg(expr("bit_xor(h)")).collect()(0).getLong(0)
  }
}
