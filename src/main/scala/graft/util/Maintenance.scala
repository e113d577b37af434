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

  private def compactTmp(p: Path) =
    new Path(p.getParent, s".${p.getName}.compact_tmp")
  private def compactBak(p: Path) =
    new Path(p.getParent, s".${p.getName}.compact_bak")

  /** Compact `dir` IN PLACE under the bak protocol (the
    * [[graft.sources.SnapshotStore.purgeIds]] swap discipline, round 11 —
    * the old delete-then-rename left a crash window where the live dir
    * was simply GONE until a human renamed the aside copy back): write
    * the compacted copy to a dot-prefixed tmp dir, rename live → bak,
    * rename tmp → live, drop bak. A crash at ANY step leaves either the
    * old or the new directory restorable, and
    * [[recoverInterruptedCompact]] — run automatically on entry —
    * finishes the job: stale tmp dropped, orphaned bak renamed back into
    * place. Dot-prefixed tmp/bak are invisible to any concurrent parquet
    * reader. Callers still own quiescence for the CONTENT flip itself
    * (the streamed-artifact compaction runs on the foreachBatch thread,
    * which serializes micro-batches). Returns (before, after) stats. */
  def compactInPlace(spark: SparkSession, dir: String,
                     targetBytes: Long): (FileStats, FileStats) = {
    recoverInterruptedCompact(spark, dir)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = compactTmp(p)
    val bak = compactBak(p)
    val stats = compactTo(spark, dir, tmp.toString, targetBytes)
    require(fs.rename(p, bak), s"compactInPlace: could not stage $dir")
    require(fs.rename(tmp, p), s"compactInPlace: could not publish $tmp")
    require(fs.delete(bak, true),
      s"compactInPlace: could not drop $bak — remove it before the next pass")
    (stats._1, fileStats(spark, dir))
  }

  /** Finish a compaction interrupted mid-swap (idempotent; called on
    * every [[compactInPlace]] entry, callable on restart): a bak dir
    * whose live sibling vanished is restored (the crash hit between the
    * two renames); a bak WITH a live sibling means the publish succeeded
    * and only the cleanup was lost — drop the bak. A stale tmp is always
    * dropped: its content was never published and the next pass rewrites
    * it from the (restored) live data. */
  def recoverInterruptedCompact(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = compactTmp(p)
    val bak = compactBak(p)
    if (fs.exists(bak)) {
      if (fs.exists(p)) fs.delete(bak, true)
      else require(fs.rename(bak, p),
        s"recoverInterruptedCompact: could not restore $dir from $bak")
    }
    if (fs.exists(tmp)) fs.delete(tmp, true)
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
