package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-5d operators. */
class Round5dOpsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("events_grouping_sets: three grains, each summing to the same total") {
    val rows = q("events_grouping_sets").collect()
    val byGid = rows.groupBy(_.getLong(2))
    assert(byGid.keySet === Set(0L, 1L, 2L))
    val totals = byGid.map { case (gid, rs) => gid -> rs.map(_.getLong(3)).sum }
    // Every grain partitions the same event set.
    assert(totals(0L) === totals(1L) && totals(1L) === totals(2L))
    // gid encodes which columns are grouped: (type) rows null out dow, etc.
    assert(byGid(1L).forall(r => r.isNullAt(1) && !r.isNullAt(0)))
    assert(byGid(2L).forall(r => r.isNullAt(0) && !r.isNullAt(1)))
  }

  test("events_users_except: no result pair has a same-day purchase; all are click-days") {
    import spark.implicits._
    val res = q("events_users_except")
    val ev = Sources.events(spark, sfDir)
      .select(col("event_type"), col("user_id"),
        expr("ts DIV 86400000000000").as("day_idx"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select("user_id", "day_idx").distinct()
    val clicks = ev.filter($"event_type" === "click")
      .select("user_id", "day_idx").distinct()
    assert(res.join(purchases, Seq("user_id", "day_idx"), "inner").isEmpty)
    assert(res.join(clicks, Seq("user_id", "day_idx"), "left_anti").isEmpty)
    assert(res.count() === clicks.count() -
      clicks.join(purchases, Seq("user_id", "day_idx"), "inner").count())
  }

  test("events_value_deciles: 10 near-equal buckets per type, non-overlapping ranges") {
    val rows = q("events_value_deciles").collect()
    rows.groupBy(_.getString(0)).foreach { case (tpe, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to 10), s"$tpe missing deciles")
      val sizes = sorted.map(_.getLong(2))
      assert(sizes.max - sizes.min <= 1, s"$tpe decile sizes off by >1: ${sizes.toSeq}")
      // Ranges ordered: decile d's max <= decile d+1's min (ties may touch).
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a.getLong(4) <= b.getLong(3), s"$tpe deciles overlap")
      }
    }
  }

  test("yf_ewma: matches a driver-side recompute of the integer Horner fold") {
    import spark.implicits._
    val sym = Sources.ohlcv(spark, sfDir)
      .select(col("symbol").cast("long")).as[Long].head()
    val daily = Sources.ohlcv(spark, sfDir)
      .filter($"symbol" === sym &&
        $"Date" >= "1995-01-01" && $"Date" < "1996-01-01")
      .groupBy("Date")
      .agg(sum(floor($"Close" * 1e8 + 0.5).cast("long")).as("cs"),
        count(lit(1)).as("nb"))
      .orderBy("Date")
      .collect().map(r => (r.get(0).toString, r.getLong(1) / r.getLong(2)))
    assert(daily.nonEmpty)
    val expected = daily.indices.map { i =>
      val win = daily.slice(math.max(0, i - 7), i + 1).map(_._2)
      // newest-first Horner: weight 2^(n-1) on the newest element
      val num = win.reverse.foldLeft(0L)((acc, x) => acc * 2 + x)
      daily(i)._1 -> num.toDouble / ((1L << win.length) - 1) / 1e8
    }.toMap
    val got = q("yf_ewma").filter($"symbol" === sym).collect()
      .map(r => r.get(1).toString -> r.getDouble(2)).toMap
    assert(got.size === expected.size)
    expected.foreach { case (d, e) =>
      assert(got(d) === e, s"ewma mismatch on $d")
    }
  }
}
