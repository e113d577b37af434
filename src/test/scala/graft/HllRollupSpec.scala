package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** Streaming native-HLL rollup ([[graft.streaming.Streams.hllRollup]]):
  * after N micro-batches the stored per-day sketches must ESTIMATE
  * EXACTLY what the one-shot batch sketch over the unioned data
  * estimates (stream ≡ batch — mode-independent: day 100 deliberately
  * crosses out of sparse mode at 500 distinct, where the estimate is
  * ~0.2% off exact but must still match the direct build bit-for-bit),
  * versions advance per non-empty batch, and re-merging an
  * already-folded batch leaves every estimate unchanged — the
  * register-max CRDT idempotence that makes replay markers unnecessary
  * (the discipline split pinned against [[Streams.mgRollup]]'s
  * marker-guarded counter sums). */
class HllRollupSpec extends SparkSpec {

  import spark.implicits._

  private val DayNs = 86400000000000L

  private def row(day: Long, user: Long): (Long, Long) =
    (day * DayNs + user * 1000L, user)

  /** One-shot direct sketch estimates over the full data — what the
    * streamed fold must reproduce exactly. */
  private def batchEstimates(rows: Seq[(Long, Long)]) =
    rows.toDF("ts", "user_id")
      .select(expr("ts div 86400000000000").as("day"), col("user_id"))
      .groupBy("day")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("n"))
      .orderBy("day")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  private def estimates(dir: String, v: Int) =
    graft.sources.SnapshotStore.readAsOf(spark, dir, "day", v)
      .select(col("day"), expr("hll_sketch_estimate(sk)").as("n"))
      .orderBy("day")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("stream folds to exact per-day distincts; replay is a state no-op") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_hll_store")
      .toFile.getAbsolutePath
    val b1 = (1 to 300).map(u => row(100, u.toLong))
    val b2 = (200 to 500).map(u => row(100, u.toLong)) ++
      (1 to 50).map(u => row(101, u.toLong))
    val b3 = (400 to 450).map(u => row(102, u.toLong))

    val stream = MemoryStream[(Long, Long)]
    val q = Streams.hllRollup(stream.toDF().toDF("ts", "user_id"), dir)
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      stream.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    val versions = graft.sources.SnapshotStore.committedVersions(spark, dir)
    assert(versions.size == 3, s"expected 3 store versions, got $versions")
    // Stream ≡ batch: the incrementally-merged store estimates exactly
    // what the one-shot direct sketch estimates (incl. dense-mode day
    // 100; the low-cardinality days are additionally sparse-exact).
    assert(estimates(dir, versions.last) == batchEstimates(b1 ++ b2 ++ b3),
      "stored HLL fold differs from the one-shot batch sketch")
    assert(estimates(dir, versions.head) == batchEstimates(b1),
      "as-of the first version must reflect the first batch alone")
    assert(estimates(dir, versions.last).find(_._1 == 101L).map(_._2)
      .contains(50L), "low-cardinality day must stay sparse-exact")

    // CRDT idempotence: re-merging an already-folded batch advances the
    // version history but changes no estimate.
    val fresh = b2.toDF("ts", "user_id")
      .select(expr("ts div 86400000000000").as("day"), col("user_id"))
      .groupBy("day").agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
    Streams.mergeHllStore(fresh, dir)
    val after = graft.sources.SnapshotStore.committedVersions(spark, dir)
    assert(after.size == 4)
    assert(estimates(dir, after.last) == batchEstimates(b1 ++ b2 ++ b3),
      "re-merging a replayed batch must be a state no-op")
  }
}
