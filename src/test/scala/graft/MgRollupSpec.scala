package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** Streaming Misra–Gries heavy-hitters rollup
  * ([[graft.streaming.Streams.mgRollup]]): the stored per-day candidate
  * maps after N micro-batches must satisfy the mergeable-summaries
  * bounds against the exact counts of ALL streamed data (count lower
  * bounds never exceed truth; anything above the N/(capacity+1)
  * threshold is guaranteed present), the SQL merge must equal the native
  * aggregate's sum-then-trim rule, and — because counter sums are NOT
  * idempotent — a replayed micro-batch must be suppressed by its batch
  * marker, the discipline [[graft.streaming.Streams.cdcApply]]
  * established. */
class MgRollupSpec extends SparkSpec {

  import spark.implicits._

  private val cap = 4
  private val DayNs = 86400000000000L

  /** user u on day d, n times. */
  private def rows(day: Long, user: Long, n: Int): Seq[(Long, Long)] =
    (1 to n).map(i => (day * DayNs + i * 1000L, user))

  /** The documented merge rule (MisraGries.merge / mergeMgStore): key-wise
    * sum, then subtract the (capacity+1)-th largest and drop <= 0. */
  private def ruleMerge(a: Map[String, Long], b: Map[String, Long])
      : Map[String, Long] = {
    val sum = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    if (sum.size <= cap) sum
    else {
      val cut = sum.values.toArray.sorted(Ordering[Long].reverse).apply(cap)
      sum.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }
  }

  test("stream folds to bounded-error heavy hitters; replay is marker-suppressed") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_mg").toString
    val dir = base + "/store"
    val ckpt = base + "/ckpt"

    // Day 100: one dominant user (50×), two mid (12×, 9×), noise users
    // once each — more distinct keys than capacity, split across batches
    // so the store path must MERGE, not just overwrite.
    val b1 = rows(100, 1, 30) ++ rows(100, 2, 12) ++
      (10L to 15L).flatMap(u => rows(100, u, 1))
    val b2 = rows(100, 1, 20) ++ rows(100, 3, 9) ++
      (16L to 21L).flatMap(u => rows(100, u, 1)) ++ rows(101, 7, 5)

    val stream = MemoryStream[(Long, Long)]
    val q = Streams.mgRollup(stream.toDF().toDF("ts", "user_id"), dir, cap,
      checkpointLocation = Some(ckpt))
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()

      // Replay guard: a batch whose marker already exists must be a
      // store no-op. Markers are keyed by (checkpoint-derived lineage,
      // batchId) — plant the marker for the NEXT batch id, then feed it.
      val lineage = java.util.UUID
        .nameUUIDFromBytes(ckpt.getBytes("UTF-8")).toString
      val marker = new org.apache.hadoop.fs.Path(s"$dir/_batches/$lineage-2")
      val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(marker.getParent)
      fs.create(marker, true).close()
      val before = graft.sources.SnapshotStore.committedVersions(spark, dir)
      stream.addData(rows(100, 99, 40): _*); q.processAllAvailable()
      assert(graft.sources.SnapshotStore.committedVersions(spark, dir) == before,
        "a marker-suppressed replay must not commit a store version")
    } finally q.stop()

    assert(graft.sources.SnapshotStore.committedVersions(spark, dir).size == 2)
    val stored = graft.sources.SnapshotStore
      .readAsOf(spark, dir, "day",
        graft.sources.SnapshotStore.committedVersions(spark, dir).last)
      .collect()
      .map(r => r.getAs[Long]("day") -> r.getAs[Map[String, Long]]("mg")).toMap

    // Exact truth over everything that was MERGED (the suppressed batch
    // never entered the store).
    val all = b1 ++ b2
    val truth = all.groupBy(t => (t._1 / DayNs, t._2.toString))
      .view.mapValues(_.size.toLong).toMap
    for (day <- Seq(100L, 101L)) {
      val sketch = stored(day)
      assert(sketch.size <= cap)
      val dayTruth = truth.collect { case ((d, u), n) if d == day => u -> n }
      val n = dayTruth.values.sum
      val bound = n.toDouble / (cap + 1)
      for ((u, c) <- sketch) {
        val f = dayTruth.getOrElse(u, 0L)
        assert(c <= f, s"day $day user $u: stored count $c exceeds truth $f")
        assert(f - c <= bound * 2 + 1e-9,
          s"day $day user $u: error ${f - c} above the additive merge bound")
      }
      for ((u, f) <- dayTruth if f > 2 * bound)
        assert(sketch.contains(u),
          s"day $day: user $u with f=$f > 2N/(cap+1) must survive the merges")
    }
    // The dominant key's count is meaningfully preserved, not just present.
    assert(stored(100L).keySet.contains("1"))
    assert(stored(101L) == Map("7" -> 5L), "a below-capacity day is exact")
  }

  test("the SQL store merge equals the documented sum-then-trim rule") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mg_merge").toString + "/store"
    // Single partition: MG sketch CONTENTS depend on update/merge order
    // (the guarantee doesn't) — pin the order so the collected sketch
    // and the re-evaluated one inside mergeMgStore are the same map.
    def sketchOf(rs: Seq[(Long, Long)]) = rs.toDF("ts", "user_id")
      .repartition(1)
      .select(expr("ts div 86400000000000").as("day"),
        col("user_id").cast("string").as("u"))
      .groupBy("day").agg(expr(s"mg_sketch(u, $cap)").as("mg"))
    val a = rows(7, 1, 10) ++ rows(7, 2, 6) ++ rows(7, 3, 3) ++
      rows(7, 4, 2) ++ rows(7, 5, 1)
    val b = rows(7, 2, 8) ++ rows(7, 6, 7) ++ rows(7, 7, 2) ++ rows(7, 8, 1)
    val sa = sketchOf(a).collect().head.getAs[Map[String, Long]]("mg")
    val sb = sketchOf(b).collect().head.getAs[Map[String, Long]]("mg")
    Streams.mergeMgStore(sketchOf(a), dir, cap)
    Streams.mergeMgStore(sketchOf(b), dir, cap)
    val stored = graft.sources.SnapshotStore
      .readAsOf(spark, dir, "day",
        graft.sources.SnapshotStore.committedVersions(spark, dir).last)
      .collect().head.getAs[Map[String, Long]]("mg")
    assert(stored == ruleMerge(sa, sb),
      "mergeMgStore must implement exactly the native merge's rule")
  }
}
