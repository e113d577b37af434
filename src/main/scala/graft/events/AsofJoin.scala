package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the time-series operator Spark lacks natively (and the
  * canonical financial-data example: "attach the latest quote at or
  * before each trade"). Per the engine's design rules this is tier (a):
  * COMPOSED from built-in operators, no custom plan node needed —
  * union-tag the two sides, then a running `max(when(matchSide, ts))`
  * window per key gives each probe row the greatest match timestamp
  * ≤ its own.
  *
  * Scale shape: one shuffle on the join key (the window partition), state
  * is a single running scalar per key — strictly cheaper than the
  * range-join fallback (which explodes into inequality-join pairs). The
  * DuckDB oracle uses DuckDB's native `ASOF JOIN`, so the correctness
  * gate checks two completely independent implementations against each
  * other.
  */
object AsofJoin {

  /** For each `forType` event: the timestamp (µs) of the latest
    * `matchType` event for the same user at or before it (null if none).
    * Ties (match and probe at the same µs) include the match, like
    * DuckDB's `ASOF JOIN ... ON probe.ts >= match.ts`. */
  def lastEventBefore(events: DataFrame, forType: String, matchType: String): DataFrame = {
    val relevant = events
      .withColumn("ts_us", expr("ts div 1000"))
      .filter(col("event_type").isin(forType, matchType))
      .withColumn("is_match", when(col("event_type") === matchType, 1).otherwise(0))
    // at equal ts the match row must sort BEFORE the probe row so the
    // probe's running window includes it (ASOF >= semantics)
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("is_match").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    relevant
      .withColumn("last_match_ts_us",
        max(when(col("is_match") === 1, col("ts_us"))).over(w))
      .filter(col("event_type") === forType)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("last_match_ts_us"))
  }

  /** FORWARD as-of: for each `forType` event, the timestamp (µs) of the
    * EARLIEST `matchType` event for the same user at or after it (null
    * if none) — "time to next purchase after this click". The exact
    * mirror of [[lastEventBefore]]: a running `min(when(match, ts))`
    * over a current-row→unbounded-FOLLOWING frame; at equal ts the
    * match sorts AFTER the probe so the probe's following frame
    * includes it (ASOF <= semantics). Same scale shape — one shuffle on
    * the key, one scalar of window state per row. */
  def nextEventAfter(events: DataFrame, forType: String, matchType: String): DataFrame = {
    val relevant = events
      .withColumn("ts_us", expr("ts div 1000"))
      .filter(col("event_type").isin(forType, matchType))
      .withColumn("is_match", when(col("event_type") === matchType, 1).otherwise(0))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("is_match"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    relevant
      .withColumn("next_match_ts_us",
        min(when(col("is_match") === 1, col("ts_us"))).over(w))
      .filter(col("event_type") === forType)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("next_match_ts_us"))
  }

  /** DuckDB mirror via the native forward ASOF JOIN. */
  def nextEventAfterSql(eventsRel: String, forType: String, matchType: String): String =
    s"""WITH us AS (SELECT * REPLACE (epoch_us(ts) AS ts) FROM $eventsRel),
       |probe AS (SELECT * FROM us WHERE event_type = '$forType'),
       |matches AS (SELECT * FROM us WHERE event_type = '$matchType')
       |SELECT p.event_id, p.user_id, p.ts AS ts_us,
       |  m.ts AS next_match_ts_us
       |FROM probe p ASOF LEFT JOIN matches m
       |  ON p.user_id = m.user_id AND p.ts <= m.ts""".stripMargin

  /** DuckDB mirror via the native ASOF JOIN. */
  def lastEventBeforeSql(eventsRel: String, forType: String, matchType: String): String =
    s"""WITH us AS (SELECT * REPLACE (epoch_us(ts) AS ts) FROM $eventsRel),
       |probe AS (SELECT * FROM us WHERE event_type = '$forType'),
       |matches AS (SELECT * FROM us WHERE event_type = '$matchType')
       |SELECT p.event_id, p.user_id, p.ts AS ts_us,
       |  m.ts AS last_match_ts_us
       |FROM probe p ASOF LEFT JOIN matches m
       |  ON p.user_id = m.user_id AND p.ts >= m.ts""".stripMargin
}
