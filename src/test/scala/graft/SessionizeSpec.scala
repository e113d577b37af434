package graft

import org.apache.spark.sql.functions._
import events.Sessionize

class SessionizeSpec extends SparkSpec {

  import spark.implicits._

  test("known gap pattern produces the expected session boundaries") {
    // ts in nanos (as Sources.events surfaces it); gap threshold 30 min
    val m = 60L * 1000000000L // one minute in ns
    val ev = Seq(
      (1L, 0L * m, 7L, "a", 1.0),
      (2L, 10L * m, 7L, "b", 2.0),   // 10 min gap → same session
      (3L, 50L * m, 7L, "a", 3.0),   // 40 min gap → new session
      (4L, 55L * m, 7L, "c", 4.0),
      (5L, 0L * m, 8L, "a", 5.0)     // other user → own session
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val stats = Sessionize.sessionStats(ev).orderBy("user_id", "session_idx").collect()
    assert(stats.length === 3)
    assert(stats(0).getAs[Long]("n_events") === 2)
    assert(stats(0).getAs[Long]("duration_us") === 10L * 60 * 1000000)
    assert(stats(1).getAs[Long]("n_events") === 2)
    assert(stats(1).getAs[Long]("session_idx") === 2)
    assert(stats(2).getAs[Long]("user_id") === 8L)
    assert(stats(2).getAs[Long]("n_events") === 1)
  }

  test("as-of join attaches the latest match at-or-before each probe, ties included") {
    val u = 1000000L // µs in ns
    val ev = Seq(
      (1L, 10L * 1000 * u, 7L, "error", 0.0),
      (2L, 20L * 1000 * u, 7L, "click", 0.0),  // after error 1 → 10s
      (3L, 30L * 1000 * u, 7L, "error", 0.0),
      (4L, 30L * 1000 * u, 7L, "click", 0.0),  // same ts as error 3 → tie includes it
      (5L, 5L * 1000 * u, 8L, "click", 0.0),   // user 8 has no prior error → null
      (6L, 40L * 1000 * u, 8L, "error", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = events.AsofJoin.lastEventBefore(ev, "click", "error")
      .orderBy("event_id").collect()
    assert(r.length === 3)
    assert(r(0).getAs[Long]("last_match_ts_us") === 10L * 1000 * 1000)
    assert(r(1).getAs[Long]("last_match_ts_us") === 30L * 1000 * 1000)
    assert(r(2).isNullAt(r(2).fieldIndex("last_match_ts_us")))
  }

  test("full events table: sessions partition all events and durations are sane") {
    val ev = Sources.events(spark, sfDir)
    val stats = Sessionize.sessionStats(ev).cache()
    assert(stats.agg(sum("n_events")).head.getLong(0) === ev.count())
    assert(stats.filter(col("duration_us") < 0).count() === 0)
    // session_idx is contiguous 1..k per user
    val perUser = stats.groupBy("user_id")
      .agg(max("session_idx").as("mx"), count(lit(1)).as("n"))
    assert(perUser.filter(col("mx") =!= col("n")).count() === 0)
  }
}
