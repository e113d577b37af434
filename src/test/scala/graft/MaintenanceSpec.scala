package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import util.Maintenance

/** Compaction (graft/util/Maintenance.scala): file count lands at the
  * target, content is untouched. */
class MaintenanceSpec extends SparkSpec {

  test("compaction collapses a fragmented table without changing its content") {
    val base = Files.createTempDirectory("graft_compact_").toString
    val src = s"$base/src"
    val dst = s"$base/dst"
    // Fragment: 32 tiny part files.
    val ev = Sources.events(spark, sfDir)
    ev.repartition(32).write.parquet(src)
    val before = Maintenance.fileStats(spark, src)
    assert(before.nFiles === 32)
    val (_, after) = Maintenance.compactTo(spark, src, dst,
      targetBytes = before.totalBytes / 4 + 1)
    // ceil(total / (total/4 + 1)) = 4 files (maybe 3 on rounding).
    assert(after.nFiles <= 4 && after.nFiles >= 3,
      s"expected ~4 compacted files, got ${after.nFiles}")
    assert(after.totalBytes > 0)
    // Content identical: row count and order-insensitive digest.
    val a = spark.read.parquet(src)
    val b = spark.read.parquet(dst)
    assert(a.count() === b.count())
    assert(Maintenance.contentDigest(a) === Maintenance.contentDigest(b))
  }

  test("compacting an already-compact table is a near-no-op") {
    val base = Files.createTempDirectory("graft_compact2_").toString
    val src = s"$base/src"
    val dst = s"$base/dst"
    Sources.events(spark, sfDir).repartition(1).write.parquet(src)
    val before = Maintenance.fileStats(spark, src)
    assert(before.nFiles === 1)
    val (_, after) = Maintenance.compactTo(spark, src, dst,
      targetBytes = before.totalBytes * 2)
    assert(after.nFiles === 1)
    assert(Maintenance.contentDigest(spark.read.parquet(src)) ===
      Maintenance.contentDigest(spark.read.parquet(dst)))
  }
}
