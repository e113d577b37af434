package graft

import org.apache.spark.sql.functions._

/** Round-8 additions: OLS trend, l-diversity, sequence-pattern match,
  * conversion lag, Jaccard link prediction, and RAKE keyword extraction.
  * Each test re-derives the query's core contract independently over the
  * tiny sf0.001 fixture so the oracle gate is not the only line of defense.
  */
class Round8OpsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("yf_trend_ols: moments reproduce slope/intercept/r2 and r2 is bounded") {
    val out = q("yf_trend_ols").collect()
    assert(out.nonEmpty)
    for (r <- out; r2 = r.getAs[Double]("r2") if !r.isNullAt(r.fieldIndex("r2")))
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9, s"r2 $r2 outside [0,1]")
    // Brute-force one symbol's regression from the same quantized series.
    val sym = out.head.getAs[Long]("symbol")
    val daily = Sources.ohlcv(spark, sfDir)
      .filter(col("symbol") === sym &&
        col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
      .groupBy("Date")
      .agg(sum(floor(col("Close") * 1e6 + 0.5).cast("long")).as("cs"),
        count(lit(1)).as("nb"))
      .select(datediff(col("Date"), lit("1995-01-01")).cast("long").as("x"),
        expr("cs div nb").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = daily.length.toLong
    val (sx, sy) = (daily.map(_._1).sum, daily.map(_._2).sum)
    val sxx = daily.map(p => p._1 * p._1).sum
    val sxy = daily.map(p => p._1 * p._2).sum
    val expSlope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val got = out.find(_.getAs[Long]("symbol") == sym).get
    assert(got.getAs[Long]("n") == n)
    assert(math.abs(got.getAs[Double]("slope") - expSlope) <= 1e-12 * math.abs(expSlope))
  }

  test("events_l_diversity: class accounting is conserved per event type") {
    val out = q("events_l_diversity").collect()
    val classes = Sources.events(spark, sfDir)
      .select(col("event_type"),
        expr("(ts DIV 86400000000000) % 7").as("dow"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT) DIV 5000").as("vband"))
      .groupBy("event_type", "dow")
      .agg(countDistinct(col("vband")).as("ns"), count(lit(1)).as("nr"))
      .collect()
    for (r <- out) {
      val mine = classes.filter(_.getAs[String]("event_type") == r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_classes") == mine.length)
      assert(r.getAs[Long]("min_l") == mine.map(_.getAs[Long]("ns")).min)
      assert(r.getAs[Long]("n_low_div") == mine.count(_.getAs[Long]("ns") < 3))
      assert(r.getAs[Long]("rows_at_risk") ==
        mine.filter(_.getAs[Long]("ns") < 3).map(_.getAs[Long]("nr")).sum)
    }
  }

  test("events_seq_pattern: matches equal a driver-side regex replay") {
    val out = q("events_seq_pattern").collect()
      .map(r => r.getAs[String]("pattern") ->
        (r.getAs[Long]("n_matched"), r.getAs[Long]("n_users"))).toMap
    val seqs = Sources.events(spark, sfDir)
      .select(col("user_id"), expr("ts DIV 1000").as("ts_us"), col("event_id"),
        substring(col("event_type"), 1, 1).as("i"))
      .collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (_, rows) =>
        rows.sortBy(r => (r.getAs[Long]("ts_us"), r.getAs[Long]("event_id")))
          .map(_.getAs[String]("i")).mkString
      }.toSeq
    val nUsers = seqs.length.toLong
    def m(re: String) = seqs.count(s => re.r.findFirstIn(s).isDefined).toLong
    assert(out("signup>click>purchase") == (m("s.*c.*p"), nUsers))
    assert(out("view>purchase") == (m("v.*p"), nUsers))
    assert(out("error_free") == (m("^[^e]*$"), nUsers))
  }

  test("events_conversion_lag: converted <= signups and lags are ordered") {
    val r = q("events_conversion_lag").head()
    assert(r.getAs[Long]("n_converted") <= r.getAs[Long]("n_signup"))
    val (lo, hi) = (r.getAs[Long]("min_lag_us"), r.getAs[Long]("max_lag_us"))
    assert(lo > 0 && lo <= hi)
    val avgUs = r.getAs[Double]("avg_lag_s") * 1e6
    assert(avgUs >= lo - 1 && avgUs <= hi + 1)
  }

  test("graph_link_prediction: jaccard is the exact ratio and pairs are non-adjacent") {
    val rows = q("graph_link_prediction").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    for (r <- rows) {
      val (nc, du, dv) = (r.getAs[Long]("n_common"), r.getAs[Long]("du"), r.getAs[Long]("dv"))
      assert(r.getAs[Long]("u") < r.getAs[Long]("v"))
      assert(nc >= 1 && nc <= math.min(du, dv))
      assert(r.getAs[Long]("jaccard_q") == nc * 1000000L / (du + dv - nc))
      assert(r.getAs[Long]("jaccard_q") <= 1000000L)
    }
    // Scores arrive ranked.
    val js = rows.map(_.getAs[Long]("jaccard_q"))
    assert(js.zip(js.tail).forall { case (a, b) => a >= b })
  }

  test("text_rake_keywords: phrases are stopword-free multiword runs with positive scores") {
    val stops = text.TextAnalysis.stopwords.head._2.toSet
    val rows = q("text_rake_keywords").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    for (r <- rows) {
      val words = r.getAs[String]("phrase").split(" ").toSeq
      assert(words.length == r.getAs[Long]("n_words") && words.length >= 2)
      for (w <- words) {
        assert(w.nonEmpty && w.forall(c => c >= 'a' && c <= 'z'))
        assert(!stops.contains(w), s"stopword '$w' inside a candidate phrase")
      }
      assert(r.getAs[Long]("n_occ") >= 1)
      // Each member word contributes degree/freq >= 1 (a word's degree
      // counts at least its own phrase's length >= its frequency of 1...
      // actually degree >= freq always, so score >= n_words).
      assert(r.getAs[Double]("score") >= words.length - 1e-9)
    }
  }

  test("events_lateness_audit: late counts bounded and totals conserve the corpus") {
    val out = q("events_lateness_audit").collect()
    val total = Sources.events(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n_events")).sum == total)
    for (r <- out) {
      val (n, late) = (r.getAs[Long]("n_events"), r.getAs[Long]("n_late"))
      assert(late >= 0 && late <= n)
      if (late == 0) {
        assert(r.getAs[Long]("max_late_us") == 0L)
        assert(r.isNullAt(r.fieldIndex("avg_late_s")))
      } else {
        assert(r.getAs[Long]("max_late_us") > 0L)
        assert(r.getAs[Double]("avg_late_s") * 1e6 <= r.getAs[Long]("max_late_us") + 1)
      }
    }
  }

  test("docs_ngram_coverage: coverage is monotone in the cutoff and bounded by 1") {
    val rows = q("docs_ngram_coverage").collect().sortBy(_.getAs[Long]("cutoff"))
    assert(rows.length == 3)
    val shares = rows.map(_.getAs[Double]("share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b + 1e-12 })
    for (r <- rows) {
      assert(r.getAs[Long]("covered_tokens") <= r.getAs[Long]("total_tokens"))
      assert(r.getAs[Double]("share") > 0.0 && r.getAs[Double]("share") <= 1.0)
      // A cutoff at or above the type count must cover everything.
      if (r.getAs[Long]("cutoff") >= r.getAs[Long]("n_types"))
        assert(r.getAs[Long]("covered_tokens") == r.getAs[Long]("total_tokens"))
    }
  }

  test("emb_norm_audit: per-label counts conserve and norm ordering holds") {
    val out = q("emb_norm_audit").collect()
    val total = Sources.embeddings(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n_vecs")).sum == total)
    for (r <- out) {
      assert(r.getAs[Int]("min_dim") == 64 && r.getAs[Int]("max_dim") == 64)
      assert(r.getAs[Long]("n_zero") == 0L)
      val (lo, hi) = (r.getAs[Long]("min_norm2_q"), r.getAs[Long]("max_norm2_q"))
      assert(lo > 0 && lo <= hi)
      val avg = r.getAs[Double]("avg_norm2")
      assert(avg * 1e16 >= lo - 1 && avg * 1e16 <= hi + 1)
    }
  }

  test("yf_var_cvar: k is the 5% ceiling and CVaR lower-bounds VaR") {
    val out = q("yf_var_cvar").collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val (n, k) = (r.getAs[Long]("n_days"), r.getAs[Long]("k"))
      assert(k == (n + 19) / 20 && k >= 1)
      // CVaR averages the k WORST changes, so it cannot exceed VaR
      // (the best of them).
      assert(r.getAs[Double]("cvar") <= r.getAs[Double]("var") + 1e-12)
    }
  }

  test("events_impact_did: cells partition the corpus and did recomposes from means") {
    val r = q("events_impact_did").head()
    val total = Sources.events(spark, sfDir).count()
    val cells = Seq("n_tp", "n_tr", "n_cp", "n_cr").map(r.getAs[Long])
    assert(cells.sum == total && cells.forall(_ > 0))
    val did = (r.getAs[Double]("mean_tp") - r.getAs[Double]("mean_tr")) -
      (r.getAs[Double]("mean_cp") - r.getAs[Double]("mean_cr"))
    assert(r.getAs[Double]("did") == did)
  }

  test("yf_seasonality: weekday cells partition each symbol's days and ratios recompose") {
    val rows = q("yf_seasonality").collect()
    val bySym = rows.groupBy(_.getAs[Long]("symbol"))
    for ((_, rs) <- bySym.take(5)) {
      // Overall mean is constant within a symbol, and the day-weighted
      // average of the weekday means equals it.
      assert(rs.map(_.getAs[Double]("overall_mean")).distinct.length == 1)
      val weighted = rs.map(r => r.getAs[Double]("dow_mean") * r.getAs[Long]("n_days")).sum /
        rs.map(_.getAs[Long]("n_days")).sum
      assert(math.abs(weighted - rs.head.getAs[Double]("overall_mean")) < 1e-9)
      for (r <- rs) {
        assert(r.getAs[Long]("dow") >= 0 && r.getAs[Long]("dow") <= 6)
        assert(math.abs(r.getAs[Double]("seasonal_ratio") -
          r.getAs[Double]("dow_mean") / r.getAs[Double]("overall_mean")) == 0.0)
      }
    }
  }

  test("events_burstiness: fano equals the brute-force dispersion per type") {
    val out = q("events_burstiness").collect()
    val counts = Sources.events(spark, sfDir)
      .groupBy(col("event_type"), expr("ts DIV 86400000000000").as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .groupBy(_.getAs[String]("event_type"))
    for (r <- out) {
      val cs = counts(r.getAs[String]("event_type")).map(_.getAs[Long]("c"))
      val n = cs.length.toDouble
      val mean = cs.sum / n
      val varPop = cs.map(c => (c - mean) * (c - mean)).sum / n
      assert(r.getAs[Long]("n_days") == cs.length)
      assert(r.getAs[Long]("peak_day") == cs.max)
      assert(math.abs(r.getAs[Double]("fano") - varPop / mean) < 1e-9)
    }
  }

  test("yf_hhi_concentration: hhi is bounded by [1/n, 1]") {
    val rows = q("yf_hhi_concentration").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, hhi) = (r.getAs[Long]("n_symbols"), r.getAs[Double]("hhi"))
      assert(n >= 1 && r.getAs[Long]("sv") > 0)
      assert(hhi >= 1.0 / n - 1e-12 && hhi <= 1.0 + 1e-12)
    }
  }

  test("events_markov_chain: rows are distributions and entropy is bounded") {
    val out = q("events_markov_chain").collect()
    assert(out.nonEmpty)
    val byFrom = out.groupBy(_.getAs[String]("from_type"))
    for ((_, rs) <- byFrom) {
      // p sums to 1 within each from-state and n_from is its cell total.
      assert(math.abs(rs.map(_.getAs[Double]("p")).sum - 1.0) < 1e-9)
      assert(rs.map(_.getAs[Long]("n")).sum == rs.head.getAs[Long]("n_from"))
      // 0 <= H <= ln(#targets), constant within the state.
      val h = rs.map(_.getAs[Double]("entropy_from")).distinct
      assert(h.length == 1)
      assert(h.head >= -1e-9 && h.head <= math.log(rs.length.toDouble) + 1e-3)
    }
  }

  test("text_tokenizer_fertility: per-lang sums conserve and fertility >= 1") {
    val out = q("text_tokenizer_fertility").collect()
    val total = Sources.documents(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == total)
    for (r <- out) {
      // The BPE-ish regex splits words further but never merges across
      // whitespace, so it cannot undercount vs whitespace words.
      assert(r.getAs[Long]("bpe_tokens") >= r.getAs[Long]("ws_tokens"))
      assert(r.getAs[Double]("fertility") >= 1.0 - 1e-12)
    }
  }

  test("yf_pairs_correlation: r in [-1,1], ranked, and exact for one pair") {
    // sf0.001 has <30 shared trading days per pair (the floor correctly
    // empties the result), so this spec exercises the sf0.01 fixture.
    val sf01 = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("yf_pairs_correlation")(spark, sf01).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val rs = rows.map(_.getAs[Double]("r"))
    assert(rs.forall(r => r >= -1.0 - 1e-12 && r <= 1.0 + 1e-12))
    assert(rs.zip(rs.tail).forall { case (a, b) => a >= b })
    // Brute-force the top pair's r from the same quantized daily series.
    val top = rows.head
    val daily = Sources.ohlcv(spark, sf01)
      .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
      .filter(col("symbol").isin(top.getAs[Long]("s1"), top.getAs[Long]("s2")))
      .groupBy("symbol", "Date")
      .agg(sum(floor(col("Close") * 1e6 + 0.5).cast("long")).as("cs"),
        count(lit(1)).as("nb"))
      .select(col("symbol"), col("Date"), expr("cs div nb").as("xq"))
      .collect().map(r => (r.getAs[Long]("symbol"), r.getAs[java.sql.Timestamp]("Date"), r.getAs[Long]("xq")))
    val bySym = daily.groupBy(_._1).map { case (k, v) => k -> v.map(t => t._2 -> t._3).toMap }
    val (m1, m2) = (bySym(top.getAs[Long]("s1")), bySym(top.getAs[Long]("s2")))
    val shared = m1.keySet.intersect(m2.keySet).toSeq
    val (xs, ys) = (shared.map(m1), shared.map(m2))
    val n = shared.size.toLong
    val (sx, sy) = (xs.sum, ys.sum)
    val (sxx, syy) = (xs.map(v => v * v).sum, ys.map(v => v * v).sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val expR = (n * sxy - sx * sy).toDouble /
      math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
    assert(top.getAs[Long]("n") == n)
    assert(math.abs(top.getAs[Double]("r") - expR) < 1e-12)
  }

  test("sim_ann_ndcg: bounded by 1, idcg constant per k, dcg <= idcg") {
    val out = q("sim_ann_ndcg").collect()
    assert(out.nonEmpty)
    // IDCG@10 is the same constant for every query (all have 10 ideal hits).
    assert(out.map(_.getAs[Long]("idcg_q")).distinct.length == 1)
    for (r <- out) {
      assert(r.getAs[Long]("dcg_q") <= r.getAs[Long]("idcg_q"))
      val ndcg = r.getAs[Double]("ndcg")
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-12)
    }
  }

  test("text_lang_confusion: cells conserve the corpus and shares sum to 1") {
    val out = q("text_lang_confusion").collect()
    val total = Sources.documents(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n")).sum == total)
    for ((_, rs) <- out.groupBy(_.getAs[String]("truth"))) {
      assert(rs.map(_.getAs[Long]("n")).sum == rs.head.getAs[Long]("n_truth"))
      assert(math.abs(rs.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    }
  }

  test("docs_split_leakage: the injected exact dups that straddle splits are caught") {
    val out = q("docs_split_leakage").collect()
    // The augmented corpus injects exact dups for doc_id % 11 = 0; the
    // md5 split scatters originals and copies independently, so at least
    // one pair must straddle a boundary on any non-trivial fixture.
    assert(out.nonEmpty)
    for (r <- out) {
      assert(r.getAs[String]("split_lo") < r.getAs[String]("split_hi"))
      assert(r.getAs[Long]("n_leaked_fingerprints") <= r.getAs[Long]("n_leaked_pairs"))
    }
  }

  test("events_slo_burn: shares bounded, 7-day window smooths the 1-day spikes") {
    val rows = q("events_slo_burn").collect().sortBy(_.getAs[Long]("day"))
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("n_err") <= r.getAs[Long]("n_total"))
      // burn = share/0.25 with share in [0,1] ⇒ burn in [0,4].
      for (c <- Seq("burn_1d", "burn_7d")) {
        val b = r.getAs[Double](c)
        assert(b >= 0.0 && b <= 4.0)
      }
    }
    val v1 = rows.map(_.getAs[Double]("burn_1d"))
    val v7 = rows.map(_.getAs[Double]("burn_7d"))
    def spread(v: Seq[Double]) = v.max - v.min
    assert(spread(v7) <= spread(v1) + 1e-12)
  }

  test("events_ab_cuped: arm counts conserve and cuped recomposes from theta") {
    val r = q("events_ab_cuped").head()
    assert(r.getAs[Long]("n_t") + r.getAs[Long]("n_c") == r.getAs[Long]("n"))
    val expected = r.getAs[Double]("raw_effect") -
      r.getAs[Double]("theta") * r.getAs[Double]("pre_diff")
    assert(r.getAs[Double]("cuped_effect") == expected)
  }

  test("text_lang_kappa: po/pe/kappa are consistent and bounded") {
    val r = q("text_lang_kappa").head()
    val (po, pe, k) = (r.getAs[Double]("po"), r.getAs[Double]("pe"),
      r.getAs[Double]("kappa"))
    assert(po >= 0.0 && po <= 1.0 && pe > 0.0 && pe < 1.0)
    assert(math.abs(k - (po - pe) / (1.0 - pe)) < 1e-12)
    assert(r.getAs[Long]("n_agree") <= r.getAs[Long]("n_total"))
  }

  test("events_forecast_naive_eval: mae >= |bias| and bounded by the peak error") {
    val out = q("events_forecast_naive_eval").collect()
    assert(out.nonEmpty)
    for (r <- out) {
      assert(r.getAs[Double]("mae") >= math.abs(r.getAs[Double]("bias")) - 1e-12)
      assert(r.getAs[Double]("mae") <= r.getAs[Long]("max_abs_err") + 1e-12)
      assert(r.getAs[Long]("n_eval") > 0)
    }
  }

  test("orders_benford_audit: digits partition the orders and chi2 recomposes") {
    val rows = q("orders_benford_audit").collect()
    assert(rows.map(_.getAs[String]("digit")).forall(d => d >= "1" && d <= "9"))
    assert(rows.map(_.getAs[Long]("n_obs")).sum == rows.head.getAs[Long]("n_total"))
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_.getAs[Double]("expected")).sum - 1.0) < 1e-12)
    assert(rows.map(_.getAs[Double]("chi2")).distinct.length == 1)
    assert(rows.head.getAs[Double]("chi2") >= 0.0)
  }

  test("data_profile_summary: per-column stats are consistent with the table") {
    val rows = q("data_profile_summary").collect()
    assert(rows.length == 5)
    val total = Sources.orders(spark, sfDir).count()
    for (r <- rows) {
      assert(r.getAs[Long]("n_rows") == total)
      assert(r.getAs[Long]("n_null") == 0L)
      assert(r.getAs[Long]("n_distinct") >= 1 && r.getAs[Long]("n_distinct") <= total)
    }
    val dist = rows.map(r => r.getAs[String]("column_name") -> r.getAs[Long]("n_distinct")).toMap
    assert(dist("o_orderkey") == total)
    assert(dist("o_orderpriority") <= 10)
  }

  test("orders_open_aging: buckets respect their age ranges and openness") {
    val rows = q("orders_open_aging").collect()
    assert(rows.nonEmpty)
    val ranges = Map("a_0_30" -> (0, 30), "b_31_60" -> (31, 60),
      "c_61_90" -> (61, 90), "d_90_plus" -> (91, Int.MaxValue))
    for (r <- rows) {
      val (lo, hi) = ranges(r.getAs[String]("bucket"))
      assert(r.getAs[Int]("min_age") >= lo && r.getAs[Int]("max_age") <= hi)
      assert(r.getAs[Long]("n_orders") > 0)
    }
  }

  test("supplier_latency_scorecard: mean <= p90 <= max and counts cover the facts") {
    val rows = q("supplier_latency_scorecard").collect()
    assert(rows.nonEmpty)
    val totalFacts = Sources.lineitem(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_shipments")).sum == totalFacts)
    for (r <- rows) {
      // p90 is the k-th of n with k = ceil(0.9 n): at least the mean's
      // neighborhood; always <= max, and mean <= max.
      assert(r.getAs[Long]("p90_days") <= r.getAs[Long]("max_days"))
      assert(r.getAs[Double]("mean_days") <= r.getAs[Long]("max_days") + 1e-9)
      assert(r.getAs[Long]("n_shipments") > 0)
    }
  }

  test("nation_trade_matrix: ranked flows with consistent cross-border flag") {
    val rows = q("nation_trade_matrix").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    for (r <- rows) {
      val same = r.getAs[String]("cust_nation") == r.getAs[String]("supp_nation")
      assert(r.getAs[Int]("cross_border") == (if (same) 0 else 1))
      assert(r.getAs[Long]("n_lineitems") > 0)
    }
  }

  test("events_ks_test: exact statistic matches a driver-side replay") {
    val r = q("events_ks_test").head()
    val vals = Sources.events(spark, sfDir)
      .select(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("vq"),
        (col("user_id") % 2 === 1).cast("int").as("t")).collect()
      .map(x => (x.getLong(0), x.getInt(1)))
    val treat = vals.filter(_._2 == 1).map(_._1).sorted
    val ctrl = vals.filter(_._2 == 0).map(_._1).sorted
    val (n1, n2) = (treat.length.toLong, ctrl.length.toLong)
    val cuts = (treat ++ ctrl).distinct.sorted
    val dNum = cuts.map { v =>
      math.abs(treat.count(_ <= v) * n2 - ctrl.count(_ <= v) * n1)
    }.max
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
    assert(r.getAs[Double]("d_stat") == dNum.toDouble / (n1.toDouble * n2.toDouble))
    assert(r.getAs[Double]("d_crit") > 0.0)
  }

  test("yf_underwater_duration: spells bounded by day counts") {
    val out = q("yf_underwater_duration").collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val (n, u, m) = (r.getAs[Long]("n_days"), r.getAs[Long]("n_underwater"),
        r.getAs[Long]("max_spell"))
      // The first day is never underwater (the peak includes it).
      assert(u < n && m <= u)
      assert((u == 0) == (m == 0))
    }
  }

  test("orders_gini_monthly: gini bounded in [0,1) and zero for 1-order months") {
    val out = q("orders_gini_monthly").collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val g = r.getAs[Double]("gini")
      assert(g >= -1e-12 && g < 1.0)
      if (r.getAs[Long]("n_orders") == 1) assert(math.abs(g) < 1e-12)
    }
  }

  test("events_mannwhitney_u: doubled-unit U matches a driver-side pair count") {
    val r = q("events_mannwhitney_u").head()
    val vals = Sources.events(spark, sfDir)
      .select(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("vq"),
        (col("user_id") % 2 === 1).cast("int").as("t")).collect()
      .map(x => (x.getLong(0), x.getInt(1)))
    val treat = vals.filter(_._2 == 1).map(_._1)
    val ctrl = vals.filter(_._2 == 0).map(_._1)
    // U1 = #(treat > ctrl pairs) + 0.5 #(ties) — doubled: 2 wins + ties.
    var u2 = 0L
    for (t <- treat; c <- ctrl)
      u2 += (if (t > c) 2L else if (t == c) 1L else 0L)
    assert(r.getAs[Long]("n1") == treat.length.toLong)
    assert(r.getAs[Long]("n2") == ctrl.length.toLong)
    assert(r.getAs[Long]("u1_x2") == u2)
    assert(r.getAs[Double]("effect_size") ==
      u2.toDouble / (2.0 * treat.length.toDouble * ctrl.length.toDouble))
  }

  test("yf_sharpe_sortino: sortino magnifies sharpe when downside is the minority") {
    val out = q("yf_sharpe_sortino").collect()
    assert(out.nonEmpty)
    for (r <- out) {
      assert(r.getAs[Long]("n_down") <= r.getAs[Long]("n"))
      // Downside-only dispersion <= total dispersion, so |sortino| >= |sharpe|
      // whenever both exist and the mean is nonzero... only guaranteed in
      // sign-consistency; check finiteness and sign agreement instead.
      val (sh, so) = (r.getAs[Double]("sharpe"), r.getAs[Double]("sortino"))
      if (!r.isNullAt(r.fieldIndex("sharpe")) && !r.isNullAt(r.fieldIndex("sortino")))
        assert(sh == 0.0 || so == 0.0 || (sh > 0) == (so > 0))
    }
  }

  test("events_entropy_drift: entropies bounded by ln(#types), drift consistent") {
    val out = q("events_entropy_drift").collect()
    assert(out.nonEmpty)
    val maxH = math.log(5.0) + 1e-3
    assert(out.map(_.getAs[Double]("h_ref")).distinct.length == 1)
    for (r <- out) {
      assert(r.getAs[Double]("h_day") >= -1e-9 && r.getAs[Double]("h_day") <= maxH)
      assert(math.abs(r.getAs[Double]("drift") -
        math.abs(r.getAs[Double]("h_day") - r.getAs[Double]("h_ref"))) == 0.0)
    }
  }

  test("docs_js_divergence: bounded by ln 2 and halves cover the corpus") {
    val r = q("docs_js_divergence").head()
    val js = r.getAs[Double]("js_nats")
    assert(js >= -1e-6 && js <= math.log(2.0) + 1e-3)
    val totalTokens = r.getAs[Long]("n1") + r.getAs[Long]("n2")
    assert(totalTokens > 0 && r.getAs[Long]("n_words") > 0)
  }

  test("text_zipf_slope: slope is negative and r2 bounded") {
    val r = q("text_zipf_slope").head()
    assert(r.getAs[Long]("n") >= 2)
    // Frequencies are rank-sorted descending, so the log-log slope must
    // be non-positive; r2 lives in [0,1].
    assert(r.getAs[Double]("slope") <= 0.0)
    val r2 = r.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0 + 1e-12)
  }

  test("customer_repeat_rate: cohorts partition the customer base") {
    val out = q("customer_repeat_rate").collect()
    val nCust = Sources.orders(spark, sfDir).select("o_custkey").distinct().count()
    assert(out.map(_.getAs[Long]("n_customers")).sum == nCust)
    for (r <- out) {
      assert(r.getAs[Long]("n_repeat") <= r.getAs[Long]("n_customers"))
      val rate = r.getAs[Double]("repeat_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("events_peak_hours: peak/trough hours carry their counts' extremes") {
    val out = q("events_peak_hours").collect()
    assert(out.nonEmpty)
    for (r <- out) {
      assert(r.getAs[Long]("peak_count") >= r.getAs[Long]("trough_count"))
      for (c <- Seq("peak_hour", "trough_hour")) {
        val h = r.getAs[Long](c)
        assert(h >= 0 && h <= 23)
      }
      assert(r.getAs[Double]("peak_to_mean") >= 1.0 - 1e-12)
    }
  }

  test("events_interarrival_cv: gap accounting is consistent per type") {
    val out = q("events_interarrival_cv").collect()
    val typeCounts = Sources.events(spark, sfDir)
      .groupBy("event_type").count().collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count")).toMap
    for (r <- out) {
      assert(r.getAs[Long]("n_gaps") == typeCounts(r.getAs[String]("event_type")) - 1)
      assert(r.getAs[Double]("mean_gap_s") >= 0.0)
      assert(r.getAs[Double]("cv2") >= 0.0)
      assert(r.getAs[Double]("mean_gap_s") <= r.getAs[Long]("max_gap_s") + 1)
    }
  }

  test("customer_anova_f: sums of squares decompose and F is non-negative") {
    val r = q("customer_anova_f").head()
    val (ssb, ssw) = (r.getAs[Double]("ssb"), r.getAs[Double]("ssw"))
    assert(ssb >= -1e-6 && ssw >= 0.0)
    assert(r.getAs[Long]("n_segments") >= 2)
    assert(r.getAs[Long]("n_customers") ==
      Sources.customer(spark, sfDir).count())
    assert(r.getAs[Double]("f_stat") >= 0.0)
  }

  test("mm_dedup_exact: per-format accounting is conserved") {
    val out = q("mm_dedup_exact").collect()
    val total = Sources.documents(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n_assets")).sum == total)
    assert(out.map(_.getAs[String]("format")).toSet.subsetOf(Set("jpeg", "png", "wav")))
    for (r <- out) {
      assert(r.getAs[Long]("n_unique_payloads") <= r.getAs[Long]("n_assets"))
      assert(r.getAs[Long]("n_dup_assets") ==
        r.getAs[Long]("n_assets") - r.getAs[Long]("n_unique_payloads"))
      assert(r.getAs[Long]("bytes_reclaimed") >= 0)
    }
  }
}
