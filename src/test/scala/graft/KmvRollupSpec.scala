package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** Streaming KMV rollup ([[graft.streaming.Streams.kmvRollup]]): the
  * stored per-day sketch table after N micro-batches must equal the
  * one-shot batch sketch over the union of all the data (stream ≡
  * batch), versions must advance per non-empty batch with each AS-OF
  * readable, and re-merging an already-merged batch must leave the
  * sketch state unchanged (the CRDT idempotence that makes replay
  * markers unnecessary). */
class KmvRollupSpec extends SparkSpec {

  import spark.implicits._

  private val k = 64
  private val DayNs = 86400000000000L

  private def row(day: Long, user: Long): (Long, Long) =
    (day * DayNs + user * 1000L, user)

  private def batchSketch(rows: Seq[(Long, Long)]) =
    rows.toDF("ts", "user_id")
      .select(expr("ts div 86400000000000").as("day"),
        col("user_id").cast("string").as("u"))
      .groupBy("day").agg(expr(s"kmv_agg(u, $k)").as("kmv"))
      .orderBy("day")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq

  test("stream of micro-batches folds to the exact batch sketch, versioned and idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_kmv_store")
      .toFile.getAbsolutePath
    val b1 = (1 to 300).map(u => row(100, u.toLong))
    val b2 = (200 to 500).map(u => row(100, u.toLong)) ++
      (1 to 50).map(u => row(101, u.toLong))
    val b3 = (400 to 450).map(u => row(102, u.toLong))

    val stream = MemoryStream[(Long, Long)]
    val q = Streams.kmvRollup(stream.toDF().toDF("ts", "user_id"), dir, k)
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      stream.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    val versions = graft.sources.SnapshotStore.committedVersions(spark, dir)
    assert(versions.size == 3, s"expected 3 store versions, got $versions")

    def storeAt(v: Int) = graft.sources.SnapshotStore
      .readAsOf(spark, dir, "day", v)
      .orderBy("day")
      .collect().map(r => (r.getAs[Long]("day"), r.getAs[Seq[Long]]("kmv"))).toSeq

    assert(storeAt(versions.last) == batchSketch(b1 ++ b2 ++ b3),
      "stored fold differs from the one-shot batch sketch")
    assert(storeAt(versions.head) == batchSketch(b1),
      "as-of the first version must be the first batch's sketch")

    // CRDT idempotence: re-merging an already-folded batch changes the
    // version history but NOT the sketch state.
    val fresh = b2.toDF("ts", "user_id")
      .select(expr("ts div 86400000000000").as("day"),
        col("user_id").cast("string").as("u"))
      .groupBy("day").agg(expr(s"kmv_agg(u, $k)").as("kmv"))
    Streams.mergeKmvStore(fresh, dir, k)
    val after = graft.sources.SnapshotStore.committedVersions(spark, dir)
    assert(after.size == 4)
    assert(storeAt(after.last) == batchSketch(b1 ++ b2 ++ b3),
      "re-merging a replayed batch must be a state no-op")
  }

  test("kmvRollup with retention: bounded log, unchanged answers, loud past the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_kmv_ret")
      .toFile.getAbsolutePath
    // 5 micro-batches over two alternating days, overlapping user ranges.
    val batches = (0 until 5).map(i =>
      ((i * 60 + 1) to (i * 60 + 90)).map(u => row(100 + i % 2, u.toLong)))
    val stream = MemoryStream[(Long, Long)]
    val q = Streams.kmvRollup(stream.toDF().toDF("ts", "user_id"), dir, k,
      retainVersions = 2)
    try batches.foreach { b =>
      stream.addData(b: _*); q.processAllAvailable()
    } finally q.stop()
    // Last K=2 versions + the compacted base survive; older bytes gone.
    assert(graft.sources.SnapshotStore.committedVersions(spark, dir)
      === Seq(3, 4, 5))
    assert(graft.sources.SnapshotStore.compactedVersions(spark, dir)
      === Seq(3))
    Seq(1, 2, 3).foreach(v => assert(
      !new java.io.File(s"$dir/upserts/v=$v").exists,
      s"upserts v=$v must be physically removed"))
    def storeAt(v: Int) = graft.sources.SnapshotStore
      .readAsOf(spark, dir, "day", v).orderBy("day")
      .collect().map(r => (r.getAs[Long]("day"), r.getAs[Seq[Long]]("kmv"))).toSeq
    // Inside retention: every surviving version equals the one-shot
    // batch sketch of its prefix — the vacuum changed no answer.
    Seq(3, 4, 5).foreach(v => assert(
      storeAt(v) == batchSketch(batches.take(v).flatten),
      s"retained version $v diverged from the prefix sketch"))
    // Past the horizon: loud on the manifest guard.
    val ex = intercept[IllegalArgumentException] {
      graft.sources.SnapshotStore.readAsOf(spark, dir, "day", 2)
    }
    assert(ex.getMessage.contains("no committed version"))
  }
}
