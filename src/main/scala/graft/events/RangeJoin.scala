package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.Stable

/** Interval/range join — an operator Spark lacks natively (a plain
  * inequality join plans as BroadcastNestedLoop/cartesian), composed from
  * built-ins per design-rule tier (a) with the standard BINNING trick:
  *
  *  - each interval [t0, t1] is exploded to the time bins it overlaps
  *    (bin width == window length ⇒ exactly 2 bins per interval),
  *  - each point lands in its single bin,
  *  - candidates come from an EQUI-join on (key, bin) — shuffle-hash/SMJ,
  *    never a nested loop — and the exact `BETWEEN` predicate filters
  *    within candidates.
  *
  * At 100 TB this is the difference between a keyed hash join whose cost
  * follows bin occupancy and a quadratic nested loop; the same shape
  * serves IP-range lookups, ad attribution windows, and sensor alignment.
  * (DuckDB's oracle runs the plain inequality join natively, so two
  * independent implementations check each other — like the as-of join.)
  */
object RangeJoin {

  val DefaultWindowUs: Long = 2L * 60 * 1000000L // 2 minutes

  /** Per `left`-type event: how many `right`-type events of the same user
    * fall in [t, t + windowUs], and their value sum (NULL when none —
    * left join semantics). Output: (<left>_id, n_matches, sum_value). */
  def windowedMatches(events: DataFrame, leftType: String, rightType: String,
                      windowUs: Long = DefaultWindowUs): DataFrame = {
    val us = events.withColumn("ts_us", expr("ts div 1000"))
    val intervals = us.filter(col("event_type") === leftType)
      .select(col("event_id").as("l_id"), col("user_id"),
        col("ts_us").as("t0"), (col("ts_us") + windowUs).as("t1"))
    val points = us.filter(col("event_type") === rightType)
      .select(col("event_id").as("r_id"), col("user_id").as("p_user"),
        col("ts_us").as("tp"), col("value"))
    // interval length == bin width ⇒ sequence spans exactly 2 bins
    val binned = intervals.withColumn("bin",
      explode(sequence(expr(s"t0 div $windowUs"), expr(s"t1 div $windowUs"))))
    val pointsBinned = points.withColumn("p_bin", expr(s"tp div $windowUs"))
    binned
      .join(pointsBinned,
        col("user_id") === col("p_user") && col("bin") === col("p_bin") &&
          col("tp") >= col("t0") && col("tp") <= col("t1"),
        "left")
      .groupBy(col("l_id"))
      .agg(
        count(col("r_id")).as("n_matches"),
        Stable.exactSum(col("value")).as("sum_value"))
  }

  // --------------------------------------------------------------- oracle

  /** DuckDB mirror: the NATIVE inequality join (no binning) — an
    * independent implementation of the same semantics. */
  def windowedMatchesSql(eventsRel: String, leftType: String, rightType: String,
                         windowUs: Long = DefaultWindowUs): String =
    s"""WITH us AS (SELECT * REPLACE (epoch_us(ts) AS ts) FROM $eventsRel),
       |iv AS (SELECT event_id AS l_id, user_id, ts AS t0, ts + $windowUs AS t1
       |       FROM us WHERE event_type = '$leftType'),
       |pt AS (SELECT event_id AS r_id, user_id, ts AS tp, value
       |       FROM us WHERE event_type = '$rightType')
       |SELECT iv.l_id, count(pt.r_id) AS n_matches,
       |  ${Stable.exactSumSql("pt.value")} AS sum_value
       |FROM iv LEFT JOIN pt
       |  ON pt.user_id = iv.user_id AND pt.tp BETWEEN iv.t0 AND iv.t1
       |GROUP BY iv.l_id""".stripMargin
}
