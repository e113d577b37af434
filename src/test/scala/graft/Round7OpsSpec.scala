package graft

import org.apache.spark.sql.functions._

/** Round-7 additions: RFM segmentation, market-basket pair mining, and
  * MAD-based robust anomaly detection. Each test re-derives the query's
  * core contract independently (driver-side brute force over the tiny
  * sf0.001 fixture) so the oracle gate is not the only line of defense.
  */
class Round7OpsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("customer_rfm: segments partition the customer base exactly") {
    val out = q("customer_rfm").collect()
    val nCustomers = Sources.orders(spark, sfDir)
      .select("o_custkey").distinct().count()
    assert(out.map(_.getAs[Long]("n_customers")).sum == nCustomers)
    // Segment codes are three digits, each 1..5.
    for (r <- out) {
      val seg = r.getAs[Int]("segment")
      for (d <- Seq(seg / 100, seg / 10 % 10, seg % 10))
        assert(d >= 1 && d <= 5, s"segment $seg out of range")
    }
    // Revenue is conserved: segment revenues sum to the exact corpus total.
    val total = Sources.orders(spark, sfDir)
      .agg(sum(util.Stable.dec2(col("o_totalprice")))
        .cast(org.apache.spark.sql.types.DecimalType(38, 2)).cast("double"))
      .head().getDouble(0)
    val segTotal = out.map(_.getAs[Double]("revenue")).sum
    assert(math.abs(segTotal - total) < 1e-6 * math.abs(total))
  }

  test("customer_rfm: m=5 segments out-spend m=1 segments per customer") {
    // Every m_score=5 customer's revenue >= every m_score=1 customer's
    // (ntile buckets are ordered), so the per-customer averages must be
    // ordered too.
    val out = q("customer_rfm").collect()
    def avgRev(m: Int): Option[Double] = {
      val rs = out.filter(_.getAs[Int]("segment") % 10 == m)
      if (rs.isEmpty) None
      else Some(rs.map(_.getAs[Double]("revenue")).sum /
        rs.map(_.getAs[Long]("n_customers")).sum)
    }
    (avgRev(5), avgRev(1)) match {
      case (Some(hi), Some(lo)) => assert(hi >= lo)
      case _ => fail("expected both m=1 and m=5 segments to exist")
    }
  }

  test("orders_basket_lift: metrics are internally consistent and ordered") {
    val rows = q("orders_basket_lift").collect()
    assert(rows.nonEmpty, "fixture produced no pairs at min-support 3")
    assert(rows.length <= 20)
    for (r <- rows) {
      val (nAb, nA, nB) = (r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"))
      assert(r.getAs[Long]("part_a") < r.getAs[Long]("part_b"))
      assert(nAb >= 3 && nAb <= math.min(nA, nB))
      assert(math.abs(r.getAs[Double]("confidence") - nAb.toDouble / nA) < 1e-12)
      assert(r.getAs[Double]("support") > 0.0 && r.getAs[Double]("support") <= 1.0)
    }
    val lifts = rows.map(_.getAs[Double]("lift"))
    assert(lifts.zip(lifts.tail).forall { case (x, y) => x >= y },
      "rows not ordered by lift desc")
  }

  test("orders_basket_lift: top pair's count matches a direct recount") {
    val rows = q("orders_basket_lift").collect()
    assert(rows.nonEmpty)
    val top = rows.head
    val (pa, pb) = (top.getAs[Long]("part_a"), top.getAs[Long]("part_b"))
    // Direct recount: orders (within the 2..20 basket band) containing
    // BOTH parts.
    val items = Sources.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").distinct()
    val band = items.groupBy("l_orderkey").count()
      .filter(col("count").between(2, 20)).select("l_orderkey")
    val kept = items.join(band, "l_orderkey")
    val n = kept.filter(col("l_partkey") === pa).select("l_orderkey")
      .intersect(kept.filter(col("l_partkey") === pb).select("l_orderkey"))
      .count()
    assert(n == top.getAs[Long]("n_ab"))
  }

  test("events_anomaly_mad: medians, MAD, and outlier counts match brute force") {
    val out = q("events_anomaly_mad").collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val byType = Sources.events(spark, sfDir)
      .select(col("event_type"),
        floor(col("value") * 1e6 + 0.5).cast("long").as("vq"))
      .collect()
      .groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.map(_.getAs[Long]("vq")).sorted).toMap
    assert(out.keySet == byType.keySet)
    // Exact doubled median of a sorted integer array.
    def med2(xs: Array[Long]): Long =
      if (xs.length % 2 == 1) 2 * xs(xs.length / 2)
      else xs(xs.length / 2 - 1) + xs(xs.length / 2)
    for ((t, xs) <- byType) {
      val m2 = med2(xs)
      val dev2 = xs.map(x => math.abs(2 * x - m2)).sorted
      val m4 = med2(dev2)
      val r = out(t)
      assert(r.getAs[Long]("n_events") == xs.length)
      assert(r.getAs[Double]("median_value") == m2 / 2e6, s"median for $t")
      assert(r.getAs[Double]("mad_value") == m4 / 4e6, s"mad for $t")
      val nOut = dev2.count(d => d * 10000L > m4 * 22239L)
      assert(r.getAs[Long]("n_outliers") == nOut, s"outliers for $t")
      assert(r.getAs[Double]("max_abs_dev") == dev2.max / 2e6)
    }
  }

  test("yf_acf: correlations bounded and lag-1 matches brute force") {
    val out = q("yf_acf").collect()
    assert(out.nonEmpty)
    for (r <- out; a = r.getAs[Double]("acf") if !r.isNullAt(r.fieldIndex("acf")))
      assert(a >= -1.0 - 1e-12 && a <= 1.0 + 1e-12, s"acf $a out of range")
    // Brute-force lag-1 ACF for one symbol from the consolidated dailies.
    val daily = Sources.ohlcv(spark, sfDir)
      .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
      .groupBy("symbol", "Date")
      .agg(sum(floor(col("Close") * 1e6 + 0.5).cast("long")).as("cs"),
        count(lit(1)).as("nb"))
      .withColumn("xq", expr("cs div nb"))
      .orderBy("symbol", "Date").collect()
    val sym = daily.head.getAs[Long]("symbol")
    val xs = daily.filter(_.getAs[Long]("symbol") == sym).map(_.getAs[Long]("xq"))
    if (xs.length >= 2) {
      val pairsXY = xs.tail.zip(xs.dropRight(1)) // (x_t, x_{t-1})
      val n = pairsXY.length.toLong
      val sx = pairsXY.map(_._1).sum; val sy = pairsXY.map(_._2).sum
      val sxx = pairsXY.map(p => p._1 * p._1).sum
      val syy = pairsXY.map(p => p._2 * p._2).sum
      val sxy = pairsXY.map(p => p._1 * p._2).sum
      val den = math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy))
      val expected = (n * sxy - sx * sy).toDouble / den
      val got = out.find(r => r.getAs[Long]("symbol") == sym &&
        r.getAs[Int]("lag") == 1).get
      assert(got.getAs[Long]("n") == n)
      if (den != 0.0) assert(got.getAs[Double]("acf") == expected)
    }
  }

  test("events_chi2_independence: statistic matches a driver-side recount") {
    val r = q("events_chi2_independence").collect().head
    val cells = Sources.events(spark, sfDir)
      .groupBy(col("event_type"), expr("(ts DIV 86400000000000) % 7").as("dow"))
      .agg(count(lit(1)).as("o")).collect()
      .map(x => (x.getAs[String]("event_type"), x.getAs[Long]("dow"),
        x.getAs[Long]("o")))
    val n = cells.map(_._3).sum
    val rowT = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val colT = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val chi2q = cells.map { case (t, d, o) =>
      val e = (rowT(t) * colT(d)).toDouble / n
      math.floor((o - e) * (o - e) / e * 1e6 + 0.5).toLong
    }.sum
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("dof") == (rowT.size - 1).toLong * (colT.size - 1))
    assert(r.getAs[Double]("chi2") == chi2q / 1e6)
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0 + 1e-12)
  }

  test("events_cusum_shift: max scaled CUSUM and its day match brute force") {
    val out = q("events_cusum_shift").collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val dayCnt = Sources.events(spark, sfDir)
      .groupBy(col("event_type"), expr("ts DIV 86400000000000").as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.map(r => (r.getAs[Long]("day"), r.getAs[Long]("c")))
        .sortBy(_._1)).toMap
    assert(out.keySet == dayCnt.keySet)
    for ((t, days) <- dayCnt) {
      val d = days.length.toLong
      val tot = days.map(_._2).sum
      var prefix = 0L
      val stats = days.zipWithIndex.map { case ((day, c), i) =>
        prefix += c
        (day, math.abs(d * prefix - (i + 1) * tot))
      }
      val maxStat = stats.map(_._2).max
      val shiftDay = stats.filter(_._2 == maxStat).map(_._1).min
      val r = out(t)
      assert(r.getAs[Long]("n_days") == d)
      assert(r.getAs[Long]("total_events") == tot)
      assert(r.getAs[Long]("shift_day") == shiftDay, s"shift day for $t")
      assert(r.getAs[Double]("max_abs_cusum") == maxStat / d.toDouble)
    }
  }

  test("docs_bm25_topk: scores rank correctly and match a direct recompute") {
    val out = q("docs_bm25_topk").collect()
    assert(out.nonEmpty)
    // Per term: ranks are 1..k, scores non-increasing, doc_id tiebreak.
    for ((_, rows) <- out.groupBy(_.getAs[String]("word"))) {
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to sorted.length))
      for (Array(a, b) <- sorted.sliding(2)) {
        val (sa, sb) = (a.getAs[Double]("score"), b.getAs[Double]("score"))
        assert(sa > sb ||
          (sa == sb && a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
      }
    }
    // Recompute one row's score from its own emitted ingredients.
    val r = out.head
    val corpus = Sources.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(split(util.Norm.normalize(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("doc_id").agg(count(lit(1)).as("dl"))
      .agg(count(lit(1)).as("n"), sum("dl").as("sumdl")).head()
    val (n, sumdl) = (corpus.getAs[Long]("n"), corpus.getAs[Long]("sumdl"))
    val df = r.getAs[Long]("df"); val tf = r.getAs[Long]("tf")
    val dl = r.getAs[Long]("dl")
    val idfq = math.floor(
      math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1e4 + 0.5).toLong
    val expected = (idfq / 1e4) * (tf * 2.2) /
      (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl * n / sumdl.toDouble))
    assert(math.abs(r.getAs[Double]("score") - expected) < 1e-12)
  }

  test("yf_beta: per-symbol betas match an independent brute force") {
    val out = q("yf_beta").collect()
    assert(out.nonEmpty)
    // Brute force per symbol from consolidated dailies.
    val daily = Sources.ohlcv(spark, sfDir)
      .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
      .groupBy("symbol", "Date")
      .agg(sum(floor(col("Close") * 1e6 + 0.5).cast("long")).as("cs"),
        count(lit(1)).as("nb"))
      .withColumn("xq", expr("cs div nb"))
      .orderBy("symbol", "Date").collect()
      .groupBy(_.getAs[Long]("symbol"))
      .view.mapValues(_.map(r =>
        (String.valueOf(r.get(r.fieldIndex("Date"))), r.getAs[Long]("xq")))).toMap
    val rets = daily.toSeq.flatMap { case (sym, rows) =>
      rows.zip(rows.tail).collect { case ((_, p), (d, x)) if p != 0L =>
        (sym, d, math.floor((x.toDouble / p - 1.0) * 1e4 + 0.5).toLong)
      }
    }
    val mkt = rets.groupBy(_._2).view.mapValues { rs =>
      val s = rs.map(_._3).sum; val n = rs.length
      // Scala / on negative longs truncates like SQL div.
      s / n
    }.toMap
    for (r <- out.take(10)) {
      val sym = r.getAs[Long]("symbol")
      val mine = rets.filter(_._1 == sym).map(t => (t._3, mkt(t._2)))
      val n = mine.length.toLong
      val sx = mine.map(_._1).sum; val sm = mine.map(_._2).sum
      val sxm = mine.map(t => t._1 * t._2).sum
      val smm = mine.map(t => t._2 * t._2).sum
      assert(r.getAs[Long]("n") == n, s"n for $sym")
      val den = (n * smm - sm * sm).toDouble
      if (den != 0.0)
        assert(r.getAs[Double]("beta") == (n * sxm - sx * sm).toDouble / den,
          s"beta for $sym")
    }
  }

  test("events_top_paths: top paths match a driver-side recount") {
    val out = q("events_top_paths").collect()
    assert(out.nonEmpty && out.length <= 10)
    for (r <- out)
      assert(r.getAs[String]("path").split(">").length <= 3)
    // Brute force: first 3 event types per (user, day) by (ts, event_id).
    val byKey = Sources.events(spark, sfDir)
      .select(col("user_id"), expr("ts DIV 86400000000000").as("day"),
        col("ts"), col("event_id"), col("event_type"))
      .collect()
      .groupBy(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day")))
      .view.mapValues(_.sortBy(r => (r.getAs[Long]("ts"), r.getAs[Long]("event_id")))
        .take(3).map(_.getAs[String]("event_type")).mkString(">")).toMap
    val freq = byKey.groupBy(_._2).map { case (p, m) =>
      p -> (m.size.toLong, m.keys.map(_._1).toSet.size.toLong)
    }
    val expected = freq.toSeq.sortBy { case (p, (n, _)) => (-n, p) }.take(10)
    val got = out.map(r => (r.getAs[String]("path"),
      (r.getAs[Long]("n_user_days"), r.getAs[Long]("n_users")))).toSeq
    assert(got == expected)
  }

  test("docs_schema_evolution: both writer generations survive the merged read") {
    val out = q("docs_schema_evolution").collect()
      .map(r => r.getAs[Boolean]("legacy_schema") -> r).toMap
    assert(out.keySet == Set(true, false),
      "expected one legacy and one evolved group")
    val docs = Sources.documents(spark, sfDir)
      .select("doc_id", "n_chars").collect()
    val (legacy, evolved) = docs.partition(_.getAs[Long]("doc_id") % 2 == 0)
    assert(out(true).getAs[Long]("n_docs") == legacy.length)
    assert(out(false).getAs[Long]("n_docs") == evolved.length)
    // The column absent from gen-1 files reads back as null there (sum of
    // an all-null group is null), and as the true values for gen-2.
    assert(out(true).isNullAt(out(true).fieldIndex("sum_n_chars")))
    assert(out(false).getAs[Long]("sum_n_chars") ==
      evolved.map(_.getAs[Number]("n_chars").longValue).sum)
  }

  test("dedup_lsh_recall: counts intersect correctly and F1 is the harmonic mean") {
    val r = q("dedup_lsh_recall").collect().head
    val (nT, nC, nH) = (r.getAs[Long]("n_truth"), r.getAs[Long]("n_candidates"),
      r.getAs[Long]("n_hits"))
    assert(nT > 0, "fixture must contain true near-dup pairs")
    assert(nH <= math.min(nT, nC))
    // Independent driver-side intersection of the two pair sets.
    val docs = dedup.Dedup.augmented(Sources.documents(spark, sfDir))
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.select("id_a", "id_b")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val truth = pairSet(dedup.Dedup.jaccardPairs(docs, "doc_id", "text", 0.6, None))
    val cand = pairSet(dedup.Dedup.lshCandidates(docs, "doc_id", "text"))
    graft.util.Views.unpersistAll()
    assert(nT == truth.size && nC == cand.size)
    assert(nH == (truth intersect cand).size)
    val (p, rec, f1) = (r.getAs[Double]("precision"), r.getAs[Double]("recall"),
      r.getAs[Double]("f1"))
    assert(p == nH.toDouble / nC && rec == nH.toDouble / nT)
    assert(math.abs(f1 - 2.0 * p * rec / (p + rec)) < 1e-15)
    assert(f1 >= math.min(p, rec) - 1e-15 && f1 <= math.max(p, rec) + 1e-15,
      "harmonic mean must lie between the two rates")
  }

  test("orders_promo_share: promo decomposes the monthly total") {
    val out = q("orders_promo_share").collect()
    assert(out.length == 12, "one row per 1995 month")
    for (r <- out) {
      val (p, t) = (r.getAs[Double]("promo_revenue"), r.getAs[Double]("total_revenue"))
      assert(p >= 0.0 && p <= t)
      val share = r.getAs[Double]("promo_share_pct")
      assert(share >= 0.0 && share <= 100.0)
      assert(share == p / t * 100.0)
    }
    val nJoined = Sources.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1995-01-01") &&
        col("l_shipdate") < lit("1996-01-01"))
      .join(Sources.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .count()
    assert(out.map(_.getAs[Long]("n_items")).sum == nJoined)
  }

  test("orders_lateral_topk: the decorrelated lateral equals the window form") {
    val lateral = q("orders_lateral_topk").collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[Long]("o_orderkey"),
        r.getAs[Double]("o_totalprice"))).toSet
    val window = q("top_orders_per_customer").collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey"),
        r.getAs[Double]("o_totalprice"))).toSet
    assert(lateral == window,
      "LATERAL ... LIMIT 3 must select exactly the window top-3 per customer")
    // And the lateral really was decorrelated: no per-row subquery shape
    // survives — the plan is joins/windows, nothing iterative.
    val plan = q("orders_lateral_topk").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("events_kmv_intersect: inclusion-exclusion identity and exact twin") {
    val r = q("events_kmv_intersect").collect().head
    val ev = Sources.events(spark, sfDir)
    val exact = ev.filter(col("event_type") === "click").select("user_id")
      .intersect(ev.filter(col("event_type") === "purchase").select("user_id"))
      .count()
    assert(r.getAs[Long]("n_exact_intersect") == exact)
    val (a, b, u, i) = (r.getAs[Double]("est_clicks"),
      r.getAs[Double]("est_purchases"), r.getAs[Double]("est_union"),
      r.getAs[Double]("est_intersect"))
    assert(Seq(a, b, u, i).forall(_ >= 0.0))
    assert(i == math.max(0.0, a + b - u), "inclusion-exclusion identity")
    // Below sketch capacity every estimate is exact — the fixture's tier.
    val nClick = ev.filter(col("event_type") === "click")
      .select("user_id").distinct().count()
    if (nClick < 256) assert(a == nClick.toDouble)
  }

  test("events_orc_roundtrip: predicate pushdown reaches the ORC scan") {
    assert(q("events_orc_roundtrip").collect().nonEmpty) // writes the ORC dir
    val orcDir = spark.conf.get("spark.sql.warehouse.dir") + "/graft_events_orc"
    val plan = spark.read.orc(orcDir).filter(col("user_id") === 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(user_id,7)"),
      s"expected the user_id predicate in the ORC scan's PushedFilters:\n$plan")
  }

  test("events_gap_fill: per-user span is dense and counts are conserved") {
    val rows = q("events_gap_fill").collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    for ((_, rs) <- byUser) {
      val days = rs.map(_.getAs[Long]("day")).sorted
      // Dense coverage: exactly one row per day in [min, max].
      assert(days.length == (days.last - days.head + 1).toInt)
      assert(days.zip(days.tail).forall { case (a, b) => b == a + 1 })
      // Synthesized rows carry zero events and only they carry `filled`.
      for (r <- rs)
        assert((r.getAs[Int]("filled") == 1) == (r.getAs[Long]("n_events") == 0L))
    }
    // Conservation: filled rows add nothing; totals equal the corpus count.
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total == Sources.events(spark, sfDir).count())
  }

  test("yf_obv: per-symbol start is 0 and steps are bounded by daily volume") {
    val rows = q("yf_obv").collect()
    val bySym = rows.groupBy(_.getAs[Long]("symbol"))
    for ((_, rs) <- bySym) {
      val sorted = rs.sortBy(_.getAs[AnyRef]("Date").toString)
      assert(sorted.head.getAs[Long]("obv") == 0L,
        "first day has no prior close — flat by definition")
    }
  }

  test("orders_backlog: deltas conserve and the backlog is never negative") {
    val rows = q("orders_backlog").collect()
    val totalDelta = rows.map(_.getAs[Long]("day_delta")).sum
    val nOrders = Sources.orders(spark, sfDir).count()
    val nClosed = Sources.lineitem(spark, sfDir)
      .select("l_orderkey").distinct().count()
    // Every +1 has a matching −1 iff the order has lineitems.
    assert(totalDelta == nOrders - nClosed)
    // An order closes only after it opened → the running count can
    // never dip below zero.
    assert(rows.forall(_.getAs[Long]("backlog") >= 0L))
    // Final backlog = orders whose last ship day extends past the data.
    assert(rows.last.getAs[Long]("backlog") == totalDelta ||
      rows.map(_.getAs[Long]("backlog")).last >= 0)
  }

  test("yf_macd: first bar per symbol is zero and hist identity holds") {
    val rows = q("yf_macd").collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(r.getAs[Long]("hist_q") ==
        r.getAs[Long]("macd_q") * r.getAs[Long]("sig_cnt") -
          r.getAs[Long]("sig_num"))
    // A symbol's first bar has equal fast/slow windows (both see one
    // element) → macd exactly 0, and the 1-element SMA equals macd_q.
    val firsts = rows.groupBy(_.getAs[Long]("symbol"))
      .map { case (_, rs) => rs.minBy(_.getAs[AnyRef]("Date").toString) }
    for (r <- firsts) {
      assert(r.getAs[Long]("macd_q") == 0L)
      assert(r.getAs[Long]("sig_cnt") == 1L)
      assert(r.getAs[Long]("sig_num") == r.getAs[Long]("macd_q"))
    }
  }
}
