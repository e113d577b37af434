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

  test("day-partitioned layout prunes at the DIRECTORY level") {
    import graft.sources.EventsLayout
    val events = Sources.events(spark, sfDir)
    val out = java.nio.file.Files.createTempDirectory("graft_events_day")
      .toString + "/events_day"
    EventsLayout.writeDayPartitioned(events, out)
    val schema = EventsLayout.daySchema(events)
    // One directory per day, Hive-style.
    val dayDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("day=")).map(_.getName)
    assert(dayDirs.length == 30, s"expected 30 day dirs, got ${dayDirs.length}")
    val (lo, hi) = (19723L, 19730L)
    val pruned = EventsLayout.readDays(spark, out, schema, lo, hi)
    // 1. The day predicate is a PARTITION filter in the plan (directory
    //    pruning), not a data filter.
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("day"),
      s"day range must be a PartitionFilter:\n$plan")
    // 2. Row parity with the unpartitioned post-filter.
    val expected = events
      .filter(expr(s"ts DIV ${EventsLayout.NanosPerDay}") >= lo &&
        expr(s"ts DIV ${EventsLayout.NanosPerDay}") < hi).count()
    assert(pruned.count() == expected && expected > 0)
    // 3. BEHAVIORAL proof of directory-level skip: poison an out-of-range
    //    day directory with a non-parquet file. The pruned read must still
    //    succeed (that directory is never listed into the scan); an
    //    unpruned full read over the same layout must fail on it.
    val poisonDir = new java.io.File(s"$out/day=19740")
    assert(poisonDir.isDirectory, "poison target day missing from fixture")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$out/day=19740/part-poison.parquet"),
      "not a parquet file".getBytes)
    assert(EventsLayout.readDays(spark, out, schema, lo, hi).count() == expected,
      "pruned read must never open files under non-matching day dirs")
    intercept[Exception] {
      spark.read.schema(schema).parquet(out).count()
    }
  }

  test("day layout floor-divides: pre-1970 nanos land in day=-1, not day=0") {
    import graft.sources.EventsLayout
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_events_neg")
      .toString + "/events_day"
    val two = Seq((1L, -1L), (2L, 1L)).toDF("event_id", "ts")
    EventsLayout.writeDayPartitioned(two, out)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("day=-1", "day=0"), s"got $dirs")
    val day0 = EventsLayout.readDays(spark, out, two.schema, 0L, 1L)
      .select("event_id").as[Long].collect().toSeq
    assert(day0 == Seq(2L), "day 0 must hold only the post-epoch row")
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
