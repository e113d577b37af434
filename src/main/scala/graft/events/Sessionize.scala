package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Stable

/** Gap-based sessionization over the `events` table — the batch form of
  * the canonical streaming-state computation (SURVEY.md §2.10: the
  * reference has no streaming; its "windows" are calendar buckets via
  * `date_format`, `Tugas 2/Yfinance API/yfinance_transform.py:50`). This
  * module adds the window-function surface the reference lacks: `lag`,
  * conditional flags, and running `sum` frames — all partitioned by
  * `user_id`, so there is no global window and the plan scales by key.
  *
  * The events parquet stores `ts` as TIMESTAMP(NANOS), which
  * [[graft.Sources.events]] surfaces as BIGINT nanoseconds and DuckDB
  * truncates to microseconds on read — so all time math here runs on
  * exact integer microseconds (`ts div 1000` ⇔ `epoch_us`).
  */
object Sessionize {

  val DefaultGapUs: Long = 30L * 60 * 1000000L // 30 minutes

  /** Events + session_idx (1-based per user): a new session starts at the
    * first event or when the gap to the previous event exceeds `gapUs`
    * (microseconds). */
  def assignSessions(events: DataFrame, gapUs: Long = DefaultGapUs): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("ts_us"), 1).over(byUser)
    events
      // DuckDB truncates parquet TIMESTAMP(NANOS) to microseconds on read,
      // so the comparable integer timeline is µs: exact floor division of
      // the nanos long (`div`, never FP division at 1e18 magnitudes)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("new_session",
        when(prev.isNull || col("ts_us") - prev > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_session")).over(running))
      .drop("new_session")
  }

  /** Per-session rollup: bounds, duration, event count, value sum. */
  def sessionStats(events: DataFrame, gapUs: Long = DefaultGapUs): DataFrame =
    assignSessions(events, gapUs)
      .groupBy("user_id", "session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("t_start_us"),
        max(col("ts_us")).as("t_end_us"),
        (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"),
        Stable.exactSum(col("value")).as("sum_value"),
        countDistinct(col("event_type")).as("n_event_types"))

  // --------------------------------------------------------------- oracle

  def sessionStatsSql(eventsRel: String, gapUs: Long = DefaultGapUs): String =
    s"""WITH us AS (
       |  SELECT * REPLACE (epoch_us(ts) AS ts) FROM $eventsRel),
       |flagged AS (
       |  SELECT *,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR ts - lag(ts) OVER w > $gapUs
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM us
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sessions AS (
       |  SELECT *,
       |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
       |  FROM flagged)
       |SELECT user_id, session_idx,
       |  count(*) AS n_events,
       |  min(ts) AS t_start_us,
       |  max(ts) AS t_end_us,
       |  max(ts) - min(ts) AS duration_us,
       |  ${Stable.exactSumSql("value")} AS sum_value,
       |  count(DISTINCT event_type) AS n_event_types
       |FROM sessions GROUP BY user_id, session_idx""".stripMargin
}
