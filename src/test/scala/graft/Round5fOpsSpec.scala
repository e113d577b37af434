package graft

import org.apache.spark.sql.functions._

/** Semantic + plan pins for the round-5f operators. */
class Round5fOpsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("mm_frame_sample: shuffle-free plan, ladder arithmetic exact per asset") {
    import spark.implicits._
    val df = q("mm_frame_sample")
    // The work list is a per-row explode: no exchange anywhere (the
    // orderBy is the verify-payload canonicalization, not the operator;
    // strip it before the plan assertion).
    val op = multimodal.Multimodal.frameSamplePlan(
      multimodal.Multimodal.synthesize(Sources.documents(spark, sfDir)), 250)
    val plan = op.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"frame plan must not shuffle:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // Per-asset: frame count = ceil(duration/step); idx/offset laddered.
    val byAsset = rows.groupBy(_.getLong(0))
    byAsset.foreach { case (_, rs) =>
      val dur = rs.head.getLong(3)
      assert(rs.length == ((dur + 249) / 250).toInt)
      rs.foreach { r =>
        val (fps, ms, idx, off) =
          (r.getInt(2), r.getLong(4), r.getLong(5), r.getLong(6))
        assert(idx == ms * fps / 1000 && off == ms && ms < dur)
      }
    }
  }

  test("mm_audio_windows: window accounting matches a direct fold; hop-coverage invariants") {
    val rows = q("mm_audio_windows").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(2); val nw = r.getLong(4)
      val expected = if (n < 400) 0L else (n - 400) / 160 + 1
      assert(nw == expected, s"asset ${r.getLong(0)}")
      if (nw > 0) {
        val last = r.getLong(5); val covered = r.getLong(6); val tail = r.getLong(7)
        assert(last == (nw - 1) * 160 && covered == last + 400 &&
          tail == n - covered && tail >= 0 && tail < 160)
      }
    }
  }

  test("events_k_anonymity: exposure stats agree with a direct per-class recount") {
    import spark.implicits._
    val rows = q("events_k_anonymity").collect()
    assert(rows.map(_.getString(0)).length == 5)
    // Recount one type end-to-end the brute way.
    val classes = Sources.events(spark, sfDir)
      .select(col("event_type"),
        expr("(ts DIV 86400000000000) % 7").as("dow"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT) DIV 5000").as("vband"),
        col("user_id"))
      .filter($"event_type" === "click")
      .groupBy("dow", "vband")
      .agg(countDistinct($"user_id").as("nu"), count(lit(1)).as("nr"))
      .collect()
    val r = rows.find(_.getString(0) == "click").get
    assert(r.getLong(1) == classes.length)
    assert(r.getLong(2) == classes.count(_.getLong(2) < 5))
    assert(r.getLong(3) == classes.filter(_.getLong(2) < 5).map(_.getLong(2)).sum)
    assert(r.getLong(4) == classes.filter(_.getLong(2) < 5).map(_.getLong(3)).sum)
    assert(r.getLong(5) == classes.map(_.getLong(2)).min)
  }

  test("part_revenue_share: the global total is broadcast, the share set is exact") {
    import spark.implicits._
    val df = q("part_revenue_share")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    // The one-row global total must arrive by broadcast, never by
    // shuffling the fact side a second time.
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected the 1-row total to broadcast:\n$plan")
    // Exactly the parts whose revenue share exceeds 1/10000, recomputed
    // in exact decimal off the same source.
    val perPart = Sources.lineitem(spark, sfDir)
      .select(col("l_partkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(util.Stable.MoneyDec).as("rev"))
      .groupBy("l_partkey").agg(sum($"rev").as("pr"))
      .collect()
    val total = perPart.map(_.getDecimal(1)).reduce(_.add(_))
    val nParts = java.math.BigDecimal.valueOf(perPart.length.toLong)
    val expect = perPart.filter { r =>
      r.getDecimal(1).multiply(nParts).multiply(java.math.BigDecimal.TEN)
        .compareTo(total.multiply(java.math.BigDecimal.valueOf(12))) > 0
    }.map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet == expect)
    assert(rows.length < perPart.length, "the cut must be selective")
    // Ordered by revenue desc.
    val revs = rows.map(_.getDouble(2)).toSeq
    assert(revs == revs.sorted.reverse)
  }
}
