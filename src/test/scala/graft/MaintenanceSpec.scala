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

  test("compactInPlace swaps under the bak protocol and leaves no residue") {
    val base = Files.createTempDirectory("graft_compact3_").toString
    val live = s"$base/t"
    Sources.events(spark, sfDir).repartition(16).write.parquet(live)
    val digest0 = Maintenance.contentDigest(spark.read.parquet(live))
    val before = Maintenance.fileStats(spark, live)
    assert(before.nFiles === 16)
    val (_, after) = Maintenance.compactInPlace(spark, live,
      targetBytes = before.totalBytes * 2)
    assert(after.nFiles === 1)
    assert(Maintenance.contentDigest(spark.read.parquet(live)) === digest0)
    // No tmp/bak left behind after a clean pass.
    val names = new java.io.File(base).list().toSeq
    assert(names === Seq("t"), s"unexpected residue: $names")
  }

  // The worst interleaving (round 11, VERDICT r10 task #6): the crash
  // lands BETWEEN the two renames — live is gone, the original sits in
  // bak, the compacted copy in tmp. The old delete-then-rename protocol
  // wedged the table here until a human renamed the aside dir; the bak
  // protocol's recovery (run automatically on the next compactInPlace
  // entry) must restore the ORIGINAL and drop the unpublished tmp.
  test("crash between stage and publish: recovery restores the original") {
    val base = Files.createTempDirectory("graft_compact4_").toString
    val live = s"$base/t"
    Sources.events(spark, sfDir).repartition(8).write.parquet(live)
    val digest0 = Maintenance.contentDigest(spark.read.parquet(live))
    val total = Maintenance.fileStats(spark, live).totalBytes
    // Simulate the crash state: tmp fully written, live renamed to bak,
    // publish rename never ran.
    val f = new java.io.File(live)
    spark.read.parquet(live).coalesce(1).write.parquet(s"$base/.t.compact_tmp")
    assert(f.renameTo(new java.io.File(s"$base/.t.compact_bak")))
    assert(!f.exists())
    // A reader would fail here; the next maintenance pass self-heals and
    // completes a fresh compaction end-to-end.
    val (_, after) = Maintenance.compactInPlace(spark, live, total * 2)
    assert(after.nFiles === 1)
    assert(Maintenance.contentDigest(spark.read.parquet(live)) === digest0)
    val names = new java.io.File(base).list().toSeq
    assert(names === Seq("t"), s"unexpected residue: $names")
  }

  test("crash after publish: recovery drops the bak, keeps the new copy") {
    val base = Files.createTempDirectory("graft_compact5_").toString
    val live = s"$base/t"
    Sources.events(spark, sfDir).repartition(4).write.parquet(live)
    val digest0 = Maintenance.contentDigest(spark.read.parquet(live))
    // Simulate: publish succeeded (live = compacted copy), bak cleanup
    // lost.
    spark.read.parquet(live).coalesce(1).write.parquet(s"$base/tmp_stage")
    assert(new java.io.File(live).renameTo(new java.io.File(s"$base/.t.compact_bak")))
    assert(new java.io.File(s"$base/tmp_stage").renameTo(new java.io.File(live)))
    Maintenance.recoverInterruptedCompact(spark, live)
    assert(Maintenance.fileStats(spark, live).nFiles === 1)
    assert(Maintenance.contentDigest(spark.read.parquet(live)) === digest0)
    val names = new java.io.File(base).list().toSeq
    assert(names === Seq("t"), s"unexpected residue: $names")
  }
}
