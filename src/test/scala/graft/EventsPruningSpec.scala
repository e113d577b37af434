package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the time-sliced events read path ([[Sources.eventsTsRange]]):
  * the range predicate must reach the parquet scan as PushedFilters on
  * the RAW `ts` column (row-group pruning off footer min/max — the thing
  * that makes a "last week" query read the week, not the corpus, at
  * 100 TB), and the surviving rows must be exactly what filtering AFTER
  * the nanos normalization would have produced. */
class EventsPruningSpec extends SparkSpec {

  private val lo = 1704672000000000000L // 2024-01-08T00:00:00Z nanos
  private val hi = 1705276800000000000L // 2024-01-15T00:00:00Z nanos

  test("eventsTsRange pushes the range predicate to the parquet scan") {
    val df = Sources.eventsTsRange(spark, sfDir, lo, hi)
    val plan = df.queryExecution.executedPlan.toString
    // Both bounds must appear as pushed scan filters on ts, whatever the
    // physical encoding (long comparisons or timestamp comparisons).
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,") ||
      plan.contains("PushedFilters: [GreaterThanOrEqual(ts,"),
      s"ts range must reach the scan as PushedFilters:\n$plan")
    assert(plan.contains("LessThan(ts,"),
      s"upper bound must reach the scan too:\n$plan")
  }

  test("eventsTsRange ≡ events().filter(...) — same rows, same nanos") {
    val pruned = Sources.eventsTsRange(spark, sfDir, lo, hi)
      .select("event_id", "ts").orderBy("event_id").collect()
    val post = Sources.events(spark, sfDir)
      .filter(col("ts") >= lit(lo) && col("ts") < lit(hi))
      .select("event_id", "ts").orderBy("event_id").collect()
    assert(pruned.length == post.length && pruned.nonEmpty)
    assert(pruned.zip(post).forall { case (a, b) =>
      a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1) })
  }

  test("eventsTsRange bounds are exact at non-aligned nanos edges") {
    // A row at exactly lo must be included by the 1-nano window [lo, lo+1)
    // whatever the physical encoding.
    val all = Sources.events(spark, sfDir)
    val someTs = all.select(min(col("ts"))).head.getLong(0)
    val inc = Sources.eventsTsRange(spark, sfDir, someTs, someTs + 1L).count()
    assert(inc >= 1L, "row at lo must be included")
    // The nano-above-lo exclusion is only decidable for micros-sourced
    // data (values end in 000, so ts+1 provably names no row); on
    // INT64-nanos testdata — which this reader equally supports — skip it
    // rather than asserting a property of the fixture's encoding.
    if (someTs % 1000L == 0L) {
      val exc = Sources.eventsTsRange(spark, sfDir, someTs + 1L, someTs + 2L).count()
      assert(exc == 0L, "1-nano-above-lo window must exclude the row")
    }
    // Open-ended "everything since lo" must not overflow the micros
    // bound conversion (regression: additive ceil-div overflowed near
    // Long.MaxValue and returned an empty window).
    val allSince = Sources.eventsTsRange(spark, sfDir, someTs, Long.MaxValue).count()
    assert(allSince == all.count(), "open-ended range must cover every row")
  }

  test("events() post-normalization ts keeps LongType through the slice query") {
    val df = SparkEntry.queries("events_day_slice")(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // Day indices must land inside [day(lo), day(hi))
    val (dlo, dhi) = (lo / 86400000000000L, hi / 86400000000000L)
    assert(rows.forall { r =>
      r.getLong(4) >= dlo && r.getLong(5) < dhi })
  }
}
