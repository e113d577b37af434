package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** INTERVAL×INTERVAL overlap join — the join class that has no equi key
  * at all (as-of and range joins at least bin one point side; here BOTH
  * sides are intervals). The naive plan is a nested loop over the full
  * cross product; the scale shape is the standard bin trick:
  *
  *  1. explode every interval into the fixed-width time bins it spans
  *     (executor-side `sequence`, never a driver loop);
  *  2. equi-join on the bin — co-partitioned hash join, shuffle bounded
  *     by Σ interval-span/bin-width;
  *  3. keep the single match where the bin equals the OVERLAP START's
  *     bin — the overlap start lies inside both intervals, so exactly
  *     one bin survives per genuinely-overlapping pair and no `distinct`
  *     pass is needed (dedup by arithmetic, not by shuffle);
  *  4. apply the closed-interval overlap predicate as the join residual.
  *
  * Bin width tunes fan-out vs join width: it should be of the order of
  * the typical interval length (sessions here are gap-bounded, so the
  * hour bin covers them in ≤2 bins each). A pathological interval much
  * longer than the bin — a bot session spanning weeks — multiplies rows
  * by its span; at 100 TB that calls for a two-tier split (long
  * intervals into a small side handled by broadcast), the same hot-key
  * discipline as the dedup df-caps. */
object IntervalOverlap {

  val BinUs: Long = 3600L * 1000000L // 1 hour — of the order of a session

  /** Overlapping cross-user pairs of `[t0, t1]` closed intervals.
    * Input: one row per interval with (user_id, session_idx, t0, t1).
    * Output: one row per unordered pair (a.user < b.user), with the
    * overlap interval [ov_start, ov_end] (ov_end ≥ ov_start). */
  def overlapPairs(sess: DataFrame, binUs: Long = BinUs): DataFrame = {
    def binned(alias: String) = sess
      .withColumn("bin",
        explode(sequence(expr(s"t0 div $binUs"), expr(s"t1 div $binUs"))))
      .select(col("bin").as(s"${alias}_bin"), col("user_id").as(s"${alias}_user"),
        col("session_idx").as(s"${alias}_sid"),
        col("t0").as(s"${alias}_t0"), col("t1").as(s"${alias}_t1"))
    binned("a").join(binned("b"),
      col("a_bin") === col("b_bin") &&
        col("a_user") < col("b_user") &&
        col("a_t0") <= col("b_t1") && col("b_t0") <= col("a_t1"))
      .withColumn("ov_start", greatest(col("a_t0"), col("b_t0")))
      .withColumn("ov_end", least(col("a_t1"), col("b_t1")))
      // arithmetic dedup: only the overlap-start bin's match survives
      .filter(col("a_bin") === expr(s"ov_start div $binUs"))
      .select("a_user", "a_sid", "b_user", "b_sid", "ov_start", "ov_end")
  }
}
