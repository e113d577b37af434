package graft

import org.apache.spark.sql.functions._
import graft.events.IntervalOverlap

/** Interval×interval overlap join ([[graft.events.IntervalOverlap]]):
  * the bin-equi-join must find exactly the pairs a brute-force cross
  * join finds (including intervals spanning MANY bins, where the
  * arithmetic dedup must keep exactly one match), and the plan must
  * contain no nested-loop/cartesian node. */
class IntervalOverlapSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    // (user, sid, t0, t1) in µs with a 10s bin: point intervals,
    // touching endpoints, containment, disjoint, and one interval
    // spanning 40 bins.
    Seq(
      (1L, 1L, 0L, 5000000L),           // [0, 5s]
      (1L, 2L, 100000000L, 500000000L), // [100s, 500s] — spans 40 bins
      (2L, 1L, 5000000L, 6000000L),     // touches user 1 sid 1 at 5s
      (2L, 2L, 150000000L, 160000000L), // inside user 1 sid 2
      (3L, 1L, 499000000L, 520000000L), // overlaps tail of user 1 sid 2
      (3L, 2L, 700000000L, 700000000L), // disjoint point
      (4L, 1L, 150000000L, 155000000L)  // inside user 1 sid 2, overlaps 2/2
    ).toDF("user_id", "session_idx", "t0", "t1")
  }

  private val binUs = 10000000L // 10 s

  test("bin-join pairs equal the brute-force inequality join, once each") {
    val got = IntervalOverlap.overlapPairs(fixture, binUs)
      .select("a_user", "a_sid", "b_user", "b_sid", "ov_start", "ov_end")
      .collect().map(_.toSeq).toSeq
    val f2 = fixture.select(col("user_id").as("bu"), col("session_idx").as("bs"),
      col("t0").as("bt0"), col("t1").as("bt1"))
    val brute = fixture.crossJoin(f2)
      .filter(col("user_id") < col("bu") &&
        col("t0") <= col("bt1") && col("bt0") <= col("t1"))
      .select(col("user_id"), col("session_idx"), col("bu"), col("bs"),
        greatest(col("t0"), col("bt0")), least(col("t1"), col("bt1")))
      .collect().map(_.toSeq).toSeq
    assert(got.sortBy(_.toString) == brute.sortBy(_.toString),
      s"bin join produced\n${got.mkString("\n")}\nbrute force:\n${brute.mkString("\n")}")
    // No duplicates despite the 40-bin interval participating in 3 pairs.
    assert(got.size == got.distinct.size)
    // (1/1,2/1) touch, (1/2,{2/2,3/1,4/1}) contain/overlap, (2/2,4/1).
    assert(got.size == 5, s"expected 5 overlapping pairs, got ${got.size}")
  }

  test("plan is an equi hash/merge join on the bin — no nested loop") {
    val plan = IntervalOverlap.overlapPairs(fixture, binUs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"interval overlap fell back to a nested loop:\n$plan")
  }
}
