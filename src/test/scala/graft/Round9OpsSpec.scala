package graft

import org.apache.spark.sql.functions._

/** Brute-force replays of the round-9 contracts over sf0.001 — each test
  * recomputes the query's claim from first principles (collected rows,
  * driver-side arithmetic) and pins the distributed result to it. */
class Round9OpsSpec extends SparkSpec {

  test("roc auc equals brute-force pair counting with half-credit ties") {
    val rows = Sources.events(spark, sfDir)
      .select(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("sc"),
        (col("event_type") === "purchase").cast("int").as("pos"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val posS = rows.filter(_._2 == 1).map(_._1)
    val negS = rows.filter(_._2 == 0).map(_._1)
    var wins = 0L; var ties = 0L
    for (p <- posS; q <- negS) {
      if (p > q) wins += 1 else if (p == q) ties += 1
    }
    val expected = (wins + 0.5 * ties) / (posS.length.toDouble * negS.length)
    val got = SparkEntry.queries("events_roc_auc")(spark, sfDir).collect()(0)
    assert(got.getAs[Long]("n_pos") == posS.length.toLong)
    assert(got.getAs[Long]("n_neg") == negS.length.toLong)
    assert(math.abs(got.getAs[Double]("auc") - expected) < 1e-12,
      s"auc ${got.getAs[Double]("auc")} vs brute $expected")
  }

  test("target encoding shrinks every segment toward the global mean, never past it") {
    val rows = SparkEntry.queries("customer_target_encoding")(spark, sfDir).collect()
    val joined = Sources.orders(spark, sfDir)
      .select(col("o_custkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .join(Sources.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
    val (gn, gs) = {
      val r = joined.agg(count(lit(1)), sum("cents")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val globalMean = gs.toDouble / gn / 100.0
    assert(rows.map(_.getAs[Long]("n_orders")).sum == gn)
    rows.foreach { r =>
      val raw = r.getAs[Double]("raw_mean"); val enc = r.getAs[Double]("enc")
      // enc is a convex combination of raw and the prior: strictly between
      // them (or equal when raw == prior).
      assert((enc - raw) * (enc - globalMean) <= 1e-9,
        s"seg ${r.getString(0)}: enc $enc not between raw $raw and prior $globalMean")
      // Exact replay of the fixed IEEE tree.
      val n = r.getAs[Long]("n_orders")
      val sumCents = raw * n * 100.0
      val expected = (math.rint(sumCents) + 20.0 * (gs.toDouble / gn)) / (n + 20).toDouble / 100.0
      assert(math.abs(enc - expected) < 1e-9)
    }
  }

  test("correlation matrix: bounds, symmetry of the moment formula, brute replay") {
    val rows = SparkEntry.queries("lineitem_corr_matrix")(spark, sfDir).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val c = r.getAs[Double]("corr")
      assert(!c.isNaN && c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12)
    }
    // Brute replay of one cell from the raw quantized columns.
    val data = Sources.lineitem(spark, sfDir)
      .select(col("l_quantity").cast("long").as("q"),
        expr("CAST(floor(l_extendedprice) AS BIGINT)").as("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = BigInt(data.length)
    val sq = data.map(x => BigInt(x._1)).sum; val sp = data.map(x => BigInt(x._2)).sum
    val sqq = data.map(x => BigInt(x._1) * x._1).sum
    val spp = data.map(x => BigInt(x._2) * x._2).sum
    val sqp = data.map(x => BigInt(x._1) * x._2).sum
    val expected = (n * sqp - sq * sp).toDouble /
      math.sqrt((n * sqq - sq * sq).toDouble * (n * spp - sp * sp).toDouble)
    val got = rows.find(r => r.getString(0) == "quantity" && r.getString(1) == "price").get
      .getAs[Double]("corr")
    assert(math.abs(got - expected) < 1e-12, s"corr $got vs brute $expected")
  }

  test("naive bayes: full brute-force confusion replay, coverage, and train-lang closure") {
    val rows = SparkEntry.queries("text_naive_bayes")(spark, sfDir).collect()
    val nScored = rows.map(_.getAs[Long]("n_docs")).sum
    val nTestWithTokens = Sources.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 0)
      .filter(util.Norm.normalize(col("text")) =!= "")
      .count()
    assert(nScored == nTestWithTokens,
      s"confusion covers $nScored docs, expected $nTestWithTokens")
    // Predictions must come from languages seen in training.
    val trainLangs = Sources.documents(spark, sfDir)
      .filter(col("doc_id") % 10 =!= 0).select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    rows.foreach(r => assert(trainLangs.contains(r.getAs[String]("pred"))))
    // No accuracy assertion: the synthetic corpus draws every lang's text
    // from ONE shared vocabulary, so the label carries (almost) no signal
    // — the right invariant is the MECHANISM, replayed from first
    // principles for one doc below.
    val docs = Sources.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), util.Norm.normalize(col("text")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").filter(_.nonEmpty).toSeq))
    val train = docs.filter(_._1 % 10 != 0)
    val counts = scala.collection.mutable.Map[(String, String), Long]()
    train.foreach { case (_, l, ws) =>
      ws.foreach(w => counts((l, w)) = counts.getOrElse((l, w), 0L) + 1) }
    val nTokL = train.groupBy(_._2).view.mapValues(_.map(_._3.size.toLong).sum).toMap
    val nDocsL = train.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val v = train.flatMap(_._3).distinct.size.toLong
    def qln(k: Long) = math.floor(math.log(k.toDouble) * 1e4 + 0.5).toLong
    val langsSorted = trainLangs.toSeq.sorted
    val expectedConfusion = docs
      .filter(d => d._1 % 10 == 0 && d._3.nonEmpty)
      .map { case (_, truth, ws) =>
        val pred = langsSorted.map { l =>
          val s = ws.map(w => qln(counts.getOrElse((l, w), 0L) + 1)).sum -
            ws.size * qln(nTokL(l) + v) + qln(nDocsL(l))
          (l, s)
        }.sortBy { case (l, s) => (-s, l) }.head._1
        (truth, pred)
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val gotConfusion = rows.map(r => (r.getAs[String]("truth"),
      r.getAs[String]("pred")) -> r.getAs[Long]("n_docs")).toMap
    assert(gotConfusion == expectedConfusion,
      s"confusion $gotConfusion != brute replay $expectedConfusion")
  }

  test("multi-feature ols reproduces the normal equations: X'X beta = X'y within fp tolerance") {
    val rows = SparkEntry.queries("yf_ols_multi")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // Brute replay for one symbol: rebuild the daily design matrix and
    // check the fitted plane satisfies the normal equations.
    val sym = rows.head.getAs[Long]("symbol")
    val daily = Sources.ohlcv(spark, sfDir)
      .filter(col("symbol") === sym)
      .groupBy("symbol", "Date")
      .agg(sum(floor(col("Close") * 1e6 + 0.5).cast("long")).as("cs"),
        sum(floor(col("Volume")).cast("long")).as("vs"),
        count(lit(1)).as("nb"))
      .select(datediff(col("Date"), lit("1992-01-01")).cast("long").as("x1"),
        expr("(vs div nb) div 1000").as("x2"), expr("cs div nb").as("y"))
      .collect().map(r => (r.getLong(0).toDouble, r.getLong(1).toDouble, r.getLong(2).toDouble))
    val r0 = rows.head
    val (b0, b1, b2) = (r0.getAs[Double]("intercept") * 1e6,
      r0.getAs[Double]("beta_day") * 1e6, r0.getAs[Double]("beta_vol") * 1e6)
    // Normal equations: sum of residuals and residual·x_j all ~ 0.
    val res = daily.map { case (x1, x2, y) => (y - b0 - b1 * x1 - b2 * x2, x1, x2) }
    val scale = daily.map(_._3).map(math.abs).max * daily.length
    assert(math.abs(res.map(_._1).sum) / scale < 1e-9)
    assert(math.abs(res.map(t => t._1 * t._2).sum) / (scale * 3000) < 1e-9)
    assert(math.abs(res.map(t => t._1 * t._3).sum) / (scale * 3000) < 1e-9)
    // R² within [0, 1] for every non-degenerate symbol.
    rows.foreach { r =>
      val r2 = r.getAs[Double]("r2")
      if (!r.isNullAt(r.fieldIndex("r2")))
        assert(r2 >= -1e-9 && r2 <= 1.0 + 1e-9, s"r2 $r2 out of range")
    }
  }

  private def labeledCents: Array[(Long, Boolean)] =
    Sources.events(spark, sfDir)
      .select(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("sc"),
        (col("event_type") === "purchase").as("pos"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))

  test("decision stump: exhaustive driver-side split search agrees on threshold and gini") {
    val data = labeledCents
    val n = data.length.toLong; val p = data.count(_._2).toLong
    val thresholds = data.map(_._1).distinct.sorted
    val best = thresholds.flatMap { t =>
      val nl = data.count(_._1 <= t).toLong
      if (nl == n) None else {
        val pl = data.count(d => d._1 <= t && d._2).toLong
        val (nr, pr) = (n - nl, p - pl)
        val num = BigInt(2) * (BigInt(pl) * (nl - pl) * nr + BigInt(pr) * (nr - pr) * nl)
        Some((t, (num * 1000000 / (BigInt(nl) * nr)).toLong))
      }
    }.minBy { case (t, q) => (q, t) }
    val got = SparkEntry.queries("events_decision_stump")(spark, sfDir).collect()(0)
    assert(math.abs(got.getAs[Double]("threshold") - best._1 / 100.0) < 1e-9)
    assert(math.abs(got.getAs[Double]("weighted_gini") - best._2 / 1e6) < 1e-12)
    assert(got.getAs[Long]("n_left") + got.getAs[Long]("n_right") == n)
  }

  test("calibration: bins partition the corpus and mean predicted prob is monotone in bin") {
    val rows = SparkEntry.queries("events_calibration")(spark, sfDir).collect()
    val n = labeledCents.length.toLong
    assert(rows.map(_.getAs[Long]("n_rows")).sum == n)
    rows.foreach { r =>
      val b = r.getAs[Long]("bin")
      assert(b >= 0 && b <= 9)
      assert(r.getAs[Double]("avg_pred") > 0.0 && r.getAs[Double]("avg_pred") <= 1.0)
      val o = r.getAs[Double]("obs_rate"); assert(o >= 0.0 && o <= 1.0)
    }
    val preds = rows.sortBy(_.getAs[Long]("bin")).map(_.getAs[Double]("avg_pred"))
    assert(preds.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
      "avg_pred must increase with bin")
  }

  test("bpe merge step: brute pair counting over the collected vocabulary agrees") {
    val vocab = Sources.documents(spark, sfDir)
      .select(explode(split(util.Norm.normalize(col("text")), " ")).as("word"))
      .filter(col("word") =!= "").groupBy("word").agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val pairs = scala.collection.mutable.Map[String, Long]()
    vocab.foreach { case (w, tf) =>
      (0 until w.length - 1).foreach { i =>
        val p = w.substring(i, i + 2)
        pairs(p) = pairs.getOrElse(p, 0L) + tf
      }
    }
    val expected = pairs.toSeq.sortBy { case (p, f) => (-f, p) }.take(20)
    val got = SparkEntry.queries("text_bpe_merge_step")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected, s"top pairs $got != brute $expected")
  }

  test("poisson bootstrap: full driver-side replica replay reproduces the rank-selected CI") {
    def u32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val t = (0 to 5).map(k => EntryOps.poissonCdfU32(k))
    def kOf(u: Long): Long = t.indexWhere(u < _) match {
      case -1 => 6L; case i => i.toLong
    }
    val rows = Sources.events(spark, sfDir)
      .select(col("event_id"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val means = (0 until 32).map { b =>
      var skc = 0L; var sk = 0L
      rows.foreach { case (id, cents) =>
        val k = kOf(u32(s"$id:$b")); skc += k * cents; sk += k
      }
      (b, skc.toDouble / sk.toDouble / 100.0)
    }.sortBy { case (b, m) => (m, b) }
    val got = SparkEntry.queries("events_bootstrap_ci")(spark, sfDir).collect()(0)
    assert(got.getAs[Long]("n_replicas") == 32L)
    assert(got.getAs[Double]("ci_lo") == means(1)._2)
    assert(got.getAs[Double]("ci_hi") == means(30)._2)
    assert(got.getAs[Double]("ci_lo") <= got.getAs[Double]("ci_hi"))
  }

  test("kaplan-meier: risk set conserves users, survival is monotone non-increasing") {
    val rows = SparkEntry.queries("events_survival_km")(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("dur"))
    val nUsers = Sources.events(spark, sfDir).select("user_id").distinct().count()
    assert(rows.head.getAs[Long]("at_risk") == nUsers)
    assert(rows.map(r => r.getAs[Long]("events") + r.getAs[Long]("censored")).sum
      == nUsers)
    // at_risk(t+1) = at_risk(t) − events(t) − censored(t).
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("at_risk") ==
          a.getAs[Long]("at_risk") - a.getAs[Long]("events") - a.getAs[Long]("censored"))
      case _ =>
    }
    // qlog_surv (log-space survival) is non-increasing until an absorbing
    // null; the formatted survival stays in (0, 1].
    val qs = rows.map(r =>
      if (r.isNullAt(r.fieldIndex("qlog_surv"))) None
      else Some(r.getAs[Long]("qlog_surv")))
    qs.collect { case Some(v) => v }.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a); case _ =>
    }
    rows.foreach { r =>
      val s = r.getAs[String]("surv").toDouble
      assert(s >= 0.0 && s <= 1.0 + 1e-9)
    }
  }

  test("pca power iteration: driver-side BigInt replay reproduces every loading exactly") {
    val vecs = Sources.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect().map(_.getSeq[Float](1).map(x =>
        math.floor(x.toDouble * 1e4 + 0.5).toLong).toArray)
    val d = 64; val n = vecs.length
    val si = Array.tabulate(d)(i => vecs.map(v => BigInt(v(i))).sum)
    val cov = Array.tabulate(d, d) { (i, j) =>
      BigInt(n) * vecs.map(v => BigInt(v(i)) * v(j)).sum - si(i) * si(j)
    }
    var v = Array.fill(d)(BigInt(1))
    for (_ <- 1 to 3) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val m = w.map(_.abs).max
      v = w.map(x => if (x < 0) -((x.abs * 1000000) / m) else (x.abs * 1000000) / m)
    }
    val got = SparkEntry.queries("emb_pca_power")(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("dim"))
    assert(got.length == d)
    got.foreach { r =>
      val dim = r.getAs[Int]("dim")
      assert(r.getAs[Double]("loading") == v(dim).toDouble / 1e6,
        s"dim $dim loading mismatch")
    }
    // Rayleigh quotient of the iterate must dominate the start vector's —
    // power iteration only climbs.
    def rq(u: Array[BigInt]): Double = {
      val num = (for (i <- 0 until d; j <- 0 until d) yield u(i) * cov(i)(j) * u(j)).sum
      val den = u.map(x => x * x).sum
      num.toDouble / den.toDouble
    }
    assert(rq(v) >= rq(Array.fill(d)(BigInt(1))))
    val lambda = got.head.getAs[Double]("eigenvalue_q8")
    assert(lambda > 0.0)
  }

  test("linear attribution conserves credit up to declared integer-division remainders") {
    val rows = SparkEntry.queries("events_attribution_linear")(spark, sfDir).collect()
    val ev = Sources.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val touches = ev.filter(e => Set("click", "view", "signup")(e._3))
    val purchases = ev.filter(_._3 == "purchase")
    val day = 86400000000000L
    var expected = Map[String, (Long, Long)]() // touch -> (n, cq)
    purchases.foreach { case (u, tp, _) =>
      val w = touches.filter(t => t._1 == u && t._2 < tp && t._2 >= tp - day)
      if (w.isEmpty)
        expected = expected.updated("(direct)",
          (expected.getOrElse("(direct)", (0L, 0L))._1 + 1,
            expected.getOrElse("(direct)", (0L, 0L))._2 + 1000000L))
      else {
        val share = 1000000L / w.length
        w.groupBy(_._3).foreach { case (ty, ts) =>
          val (pn, pc) = expected.getOrElse(ty, (0L, 0L))
          expected = expected.updated(ty, (pn + ts.length, pc + ts.length * share))
        }
      }
    }
    val got = rows.map(r => r.getAs[String]("touch") ->
      (r.getAs[Long]("n_touches"), r.getAs[Double]("credit"))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (ty, (n, cq)) =>
      assert(got(ty)._1 == n, s"$ty n_touches")
      assert(math.abs(got(ty)._2 - cq / 1e6) < 1e-9, s"$ty credit")
    }
    // Total credit within n_purchases of the exact unit-per-purchase mass
    // (each purchase loses < 1e-6·k ≤ 1 unit-millionth per touch).
    val total = rows.map(_.getAs[Double]("credit")).sum
    assert(total <= purchases.length + 1e-9)
    assert(total > purchases.length * 0.99)
  }

  test("modularity: driver-side replay of the brand partition score; Q within [-0.5, 1]") {
    val got = SparkEntry.queries("graph_modularity")(spark, sfDir).collect()(0)
    val op = Sources.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = op.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val brand = Sources.part(spark, sfDir).select("p_partkey", "p_brand")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val m = edges.size.toLong
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val ec: Map[String, Long] = edges.filter(e => brand(e._1) == brand(e._2))
      .groupBy(e => brand(e._1)).map { case (k, v) => k -> v.size.toLong }
    val dcM: Map[String, Long] = deg.toSeq.groupBy(e => brand(e._1))
      .map { case (k, v) => k -> v.map(_._2).sum }
    val qnum = dcM.map { case (c, dc) =>
      BigInt(4) * BigInt(m) * BigInt(ec.getOrElse(c, 0L)) -
        BigInt(dc) * BigInt(dc)
    }.sum
    val expected = qnum.toDouble / (4.0 * m * m)
    assert(got.getAs[Long]("n_edges") == m)
    assert(got.getAs[Long]("n_nodes") == deg.size.toLong)
    assert(math.abs(got.getAs[Double]("modularity") - expected) < 1e-12)
    assert(got.getAs[Double]("modularity") >= -0.5 &&
      got.getAs[Double]("modularity") <= 1.0)
  }

  test("importance sampling: inclusion and HT estimate replay exactly from the hash contract") {
    val got = SparkEntry.queries("docs_importance_sampling")(spark, sfDir).collect()(0)
    def u32(sIn: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(sIn.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val docs = Sources.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"),
        size(split(util.Norm.normalize(col("text")), " ")).cast("long").as("nw"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    var nSampled = 0L; var htQ = 0L; var trueTokens = 0L
    docs.foreach { case (id, nc, nw) =>
      trueTokens += nw
      val p = math.min(1000L, 50L + nc / 20)
      if (u32(id.toString) % 1000 < p) { nSampled += 1; htQ += nw * 1000000L / p }
    }
    assert(got.getAs[Long]("n_sampled") == nSampled)
    assert(got.getAs[Long]("true_tokens") == trueTokens)
    assert(got.getAs[Double]("est_tokens") == htQ.toDouble / 1000.0)
  }

  test("welch t-test and power analysis replay from driver-side moments") {
    val xs = Sources.events(spark, sfDir)
      .select((col("user_id") % 2 === 1).as("t"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("x"))
      .collect().map(r => (r.getBoolean(0), r.getLong(1)))
    val g1 = xs.filter(_._1).map(_._2); val g2 = xs.filterNot(_._1).map(_._2)
    def mom(g: Array[Long]): (Long, BigInt, BigInt) =
      (g.length.toLong, g.map(BigInt(_)).sum, g.map(x => BigInt(x) * x).sum)
    val (n1, s1, ss1) = mom(g1); val (n2, s2, ss2) = mom(g2)
    def variance(n: Long, s: BigInt, ss: BigInt): Double =
      (BigInt(n) * ss - s * s).toDouble / (n.toDouble * (n - 1).toDouble)
    val (m1, m2) = (s1.toDouble / n1, s2.toDouble / n2)
    val (v1, v2) = (variance(n1, s1, ss1) / n1, variance(n2, s2, ss2) / n2)
    val tGot = SparkEntry.queries("events_ttest_welch")(spark, sfDir).collect()(0)
    assert(tGot.getAs[Long]("n1") == n1 && tGot.getAs[Long]("n2") == n2)
    assert(math.abs(tGot.getAs[Double]("t_stat") -
      (m1 - m2) / math.sqrt(v1 + v2)) < 1e-9)
    val dfExp = (v1 + v2) * (v1 + v2) /
      (v1 * v1 / (n1 - 1).toDouble + v2 * v2 / (n2 - 1).toDouble)
    assert(math.abs(tGot.getAs[Double]("df_welch") - dfExp) < 1e-6)
    // df_welch lies between min(n)−1 and n1+n2−2 — the Welch bounds.
    assert(dfExp >= math.min(n1, n2) - 1 && dfExp <= (n1 + n2 - 2).toDouble)
    val pGot = SparkEntry.queries("events_power_analysis")(spark, sfDir).collect()(0)
    val sp2 = ((n1 - 1).toDouble * variance(n1, s1, ss1) +
      (n2 - 1).toDouble * variance(n2, s2, ss2)) / (n1 + n2 - 2).toDouble
    val mde = 0.02 * (s2.toDouble / n2)
    val z = EntryOps.PowerZSum
    val nExp = math.ceil(2.0 * (z * z) * sp2 / (mde * mde)).toLong
    assert(pGot.getAs[Long]("n_per_arm") == nExp,
      s"n_per_arm ${pGot.getAs[Long]("n_per_arm")} vs $nExp")
  }

  test("knn classifier: confusion covers the test split, preds from train labels, votes replay") {
    val rows = SparkEntry.queries("emb_knn_classifier")(spark, sfDir).collect()
    val emb = Sources.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val nTest = emb.count(_._1 % 10 == 0).toLong
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == nTest)
    val trainLabels = emb.filter(_._1 % 10 != 0).map(_._2).toSet
    rows.foreach(r => assert(trainLabels.contains(r.getAs[Int]("pred"))))
    // Vote/argmax replay from the top-k frame the query itself consumes.
    val e = Sources.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val topk = sim.Similarity.bruteTopK(
      e.filter(col("id") % 10 === 0), e.filter(col("id") % 10 =!= 0), 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val labelOf = emb.toMap
    val expected = topk.groupBy(_._1).toSeq.map { case (q, nbrs) =>
      val votes = nbrs.map(n => labelOf(n._2)).groupBy(identity)
        .map { case (l, v) => (l, v.size) }
      val pred = votes.toSeq.sortBy { case (l, v) => (-v, l) }.head._1
      (labelOf(q), pred)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = rows.map(r => (r.getAs[Int]("truth"), r.getAs[Int]("pred")) ->
      r.getAs[Long]("n_vecs")).toMap
    assert(got == expected)
  }

  test("silhouette: full integer replay per label; scores within [-1, 1]") {
    val rows = SparkEntry.queries("emb_silhouette")(spark, sfDir).collect()
    val vecs = Sources.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getInt(1), r.getSeq[Float](2).map(x =>
        math.floor(x.toDouble * 1e4 + 0.5).toLong).toArray))
    val d = 64
    val cents: Map[Int, Array[Long]] = vecs.groupBy(_._1).map { case (l, vs) =>
      l -> Array.tabulate(d) { i =>
        val sx = vs.map(_._2(i)).sum; val cn = vs.length
        if (sx < 0) -((-sx) / cn) else sx / cn
      }
    }
    val perLabel = vecs.map { case (l, v) =>
      def dist(c: Array[Long]): Double =
        math.sqrt(v.indices.map(i => (v(i) - c(i)) * (v(i) - c(i))).sum.toDouble)
      val a = dist(cents(l))
      val b = cents.collect { case (cl, c) if cl != l => dist(c) }.min
      (l, math.floor((b - a) / math.max(a, b) * 1e6 + 0.5).toLong)
    }.groupBy(_._1).map { case (l, ss) =>
      l -> (ss.length.toLong, ss.map(_._2).sum.toDouble / 1e6 / ss.length)
    }
    assert(rows.length == perLabel.size)
    rows.foreach { r =>
      val l = r.getAs[Int]("label")
      assert(r.getAs[Long]("n_vecs") == perLabel(l)._1)
      assert(math.abs(r.getAs[Double]("mean_silhouette") - perLabel(l)._2) < 1e-12,
        s"label $l silhouette")
      assert(r.getAs[Double]("mean_silhouette") >= -1.0 - 1e-9 &&
        r.getAs[Double]("mean_silhouette") <= 1.0 + 1e-9)
    }
  }

  test("textrank: integer pagerank replay over the driver-built word graph matches top-20") {
    val docs = Sources.documents(spark, sfDir)
      .select(util.Norm.normalize(col("text"))).collect()
      .map(_.getString(0).split(" ").filter(_.nonEmpty).toSeq)
    val vocab = docs.flatten.distinct.sorted
    val wid = vocab.zipWithIndex.map { case (w, i) => w -> (i + 1).toLong }.toMap
    val und = docs.flatMap(ws => ws.zip(ws.drop(1))).filter(p => p._1 != p._2)
      .map { case (a, b) =>
        (math.min(wid(a), wid(b)), math.max(wid(a), wid(b))) }.distinct
    val edges = und ++ und.map(e => (e._2, e._1))
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var pr: Map[Long, Long] = edges.map(_._1).distinct.map(_ -> 1000000000L).toMap
    for (_ <- 1 to 6) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => pr(e._1) / outdeg(e._1)).sum
      }
      pr = pr.keys.map(n => n -> (150000000L + 85L * in.getOrElse(n, 0L) / 100L)).toMap
    }
    val idOf = wid.map(_.swap)
    val expected = pr.toSeq.map { case (n, p) => (idOf(n), p) }
      .sortBy { case (w, p) => (-p, w) }.take(20)
    val got = SparkEntry.queries("text_textrank_keywords")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected, s"textrank top-20 mismatch: $got vs $expected")
  }

  test("tail dependence: lambda in (0,1], joint bounded by k_min") {
    val rows = SparkEntry.queries("yf_tail_dependence")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val l = r.getAs[Double]("lambda_u")
      assert(l > 0.0 && l <= 1.0 + 1e-12)
      assert(r.getAs[Long]("joint") <= r.getAs[Long]("k_min"))
      assert(r.getAs[Long]("sym_a") < r.getAs[Long]("sym_b"))
    }
    // Descending order by lambda with deterministic tiebreaks.
    val ls = rows.map(_.getAs[Double]("lambda_u"))
    assert(ls.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("markowitz: weights sum to one and the min-variance portfolio beats both assets") {
    val r = SparkEntry.queries("yf_markowitz_minvar")(spark, sfDir).collect()(0)
    val (w1, w2) = (r.getAs[Double]("w_sym1"), r.getAs[Double]("w_sym2"))
    assert(math.abs(w1 + w2 - 1.0) < 1e-12)
    val pv = r.getAs[Double]("port_var_q")
    assert(pv >= 0.0)
    // Min-variance property: portfolio variance ≤ either asset alone
    // (w=1 and w=0 are feasible points of the minimized quadratic).
    val daily = Sources.ohlcv(spark, sfDir).filter(col("symbol").isin(1, 2))
      .groupBy("symbol", "Date")
      .agg(sum(floor(col("Close") * 1e8 + 0.5).cast("long")).as("cs"),
        count(lit(1)).as("nb"))
      .select(col("symbol"), col("Date"), expr("cs div nb").as("c"))
    import org.apache.spark.sql.expressions.Window
    val rets = daily.withColumn("ret",
        col("c") - lag(col("c"), 1).over(
          Window.partitionBy("symbol").orderBy("Date")))
      .filter(col("ret").isNotNull)
      .collect().map(x => (x.getAs[Long]("symbol"),
        x.getAs[java.time.LocalDateTime]("Date"), x.getAs[Long]("ret")))
    val m1 = rets.filter(_._1 == 1).map(x => x._2 -> x._3).toMap
    val m2 = rets.filter(_._1 == 2).map(x => x._2 -> x._3).toMap
    val shared = m1.keySet.intersect(m2.keySet).toSeq
    val n = shared.size
    def varOf(m: Map[java.time.LocalDateTime, Long]): Double = {
      val xs = shared.map(m); val s = xs.map(BigInt(_)).sum
      (BigInt(n) * xs.map(x => BigInt(x) * x).sum - s * s).toDouble / 1e16
    }
    assert(pv <= varOf(m1) + 1e-6 && pv <= varOf(m2) + 1e-6)
  }

  test("held-out perplexity: token coverage, smoothing floor, brute nll replay for one lang") {
    val rows = SparkEntry.queries("docs_perplexity_heldout")(spark, sfDir).collect()
    val docs = Sources.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), util.Norm.normalize(col("text")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").filter(_.nonEmpty).toSeq))
    val train = docs.filter(_._1 % 10 != 0).flatMap(_._3)
    val counts = train.groupBy(identity).map { case (w, v) => w -> v.size.toLong }
    val nv = train.size.toLong + counts.size
    def qln(k: Long) = math.floor(math.log(k.toDouble) * 1e4 + 0.5).toLong
    val testTok = docs.filter(_._1 % 10 == 0)
      .flatMap { case (_, l, ws) => ws.map(l -> _) }
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == testTok.size.toLong)
    val byLang = testTok.groupBy(_._1)
    rows.foreach { r =>
      val l = r.getAs[String]("lang")
      val nll = byLang(l).map { case (_, w) =>
        qln(nv) - qln(counts.getOrElse(w, 0L) + 1) }.sum
      val expected = nll.toDouble / 1e4 / byLang(l).size
      assert(math.abs(r.getAs[Double]("avg_nll") - expected) < 1e-12, s"lang $l")
      // NLL can never beat the model's own floor ln(N+V) − ln(1+max c).
      assert(r.getAs[Double]("avg_nll") > 0.0)
      assert(r.getAs[String]("perplexity").toDouble > 1.0)
    }
  }

  test("skyline: brute-force all-pairs dominance agrees; more price buys more size on the frontier") {
    val got = SparkEntry.queries("part_skyline")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Double]("price"),
        r.getAs[Long]("size")))
    val parts = Sources.part(spark, sfDir)
      .select(col("p_partkey"),
        expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)").as("c"),
        col("p_size").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = parts.filter { case (_, c, s) =>
      !parts.exists { case (_, c2, s2) =>
        (c2 < c && s2 >= s) || (c2 <= c && s2 > s) }
    }.map(p => (p._1, p._2.toDouble / 100.0, p._3))
      .sortBy(p => (p._2, p._3, p._1)).toSeq
    assert(got.toSeq == expected, s"skyline ${got.toSeq} != brute $expected")
    // Frontier shape: paying strictly more must buy strictly more size —
    // otherwise the cheaper point would dominate (ties co-exist).
    got.toSeq.sliding(2).foreach {
      case Seq(a, b) =>
        if (b._2 > a._2) assert(b._3 > a._3)
      case _ =>
    }
  }

  test("srm check: arm counts partition the user set and chi2 replays") {
    val r = SparkEntry.queries("events_srm_check")(spark, sfDir).collect()(0)
    val users = Sources.events(spark, sfDir).select("user_id").distinct()
      .collect().map(_.getLong(0))
    val n1 = users.count(_ % 2 == 1).toLong; val n2 = users.length - n1
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
    val chi2 = ((n1 - n2) * (n1 - n2)).toDouble / (n1 + n2).toDouble
    assert(r.getAs[Double]("chi2") == chi2)
    assert(r.getAs[Int]("srm_flag") == (if (chi2 > 3.84) 1 else 0))
  }

  test("fifo allocation: sequential driver replay matches; matched = min(issued, received)") {
    val rows = SparkEntry.queries("part_fifo_allocation")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("p_partkey") ->
        (r.getAs[Long]("issued"), r.getAs[Long]("matched"), r.getAs[Long]("cogs_cents")))
      .toMap
    val li = Sources.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"),
        expr("CAST(floor(l_quantity) AS BIGINT)").as("q"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("pc"))
      .collect().map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1), r.getLong(2), r.getInt(3),
        r.getAs[Long]("q"), r.getAs[Long]("pc")))
    val byPart = li.groupBy(_._1)
    byPart.foreach { case (p, ls) =>
      val ordered = ls.sortBy(l => (l._2.toString, l._3, l._4))
      val rec = ordered.filter(_._3 % 2 == 0).map(l => (l._5, l._6)).toBuffer
      val iss = ordered.filter(_._3 % 2 == 1).map(_._5)
      if (iss.nonEmpty) {
        // Sequential FIFO: walk issues against the lot queue.
        var ri = 0; var takenFromLot = 0L
        var matched = 0L; var cogs = 0L
        iss.foreach { want =>
          var need = want
          while (need > 0 && ri < rec.length) {
            val (lq, lpc) = rec(ri)
            val avail = lq - takenFromLot
            val take = math.min(need, avail)
            matched += take; cogs += lpc * take / lq
            need -= take; takenFromLot += take
            if (takenFromLot == lq) { ri += 1; takenFromLot = 0L }
          }
        }
        val (gi, gm, _) = rows(p)
        assert(gi == iss.sum, s"part $p issued")
        assert(gm == matched && gm == math.min(iss.sum, rec.map(_._1).sum),
          s"part $p matched $gm vs replay $matched")
        // COGS replay is NOT asserted cent-for-cent: the sequential walk
        // floors per (lot, take) step while the interval form floors per
        // (lot, issue) overlap — same partition of units, different
        // rounding boundaries. Bound the drift by the match count.
        assert(math.abs(rows(p)._3 - cogs) <= matched + rec.length + 1,
          s"part $p cogs ${rows(p)._3} vs replay $cogs")
      }
    }
  }

  test("scd2 lookup: purchase counts conserve and each maps to the run active at its time") {
    val rows = SparkEntry.queries("events_scd2_lookup")(spark, sfDir).collect()
    val ev = Sources.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), expr("ts DIV 1000").as("us"),
        col("event_id"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val purchases = ev.filter(_._2 == "purchase")
    assert(rows.map(_.getAs[Long]("n_purchases")).sum == purchases.length.toLong)
    // Brute: rebuild per-user non-purchase runs, locate each purchase.
    val runsByUser = ev.filter(_._2 != "purchase").groupBy(_._1).map {
      case (u, es) =>
        val ordered = es.sortBy(e => (e._3, e._4))
        val runs = ordered.foldLeft(List.empty[(String, Long)]) {
          case (acc, e) =>
            if (acc.nonEmpty && acc.head._1 == e._2) acc
            else (e._2, e._3) :: acc
        }.reverse
        u -> runs
    }
    val expected = purchases.map { case (u, _, us, _, cents) =>
      val state = runsByUser.get(u)
        .flatMap(rs => rs.takeWhile(_._2 <= us).lastOption.map(_._1))
        .getOrElse("(none)")
      (state, cents)
    }.groupBy(_._1).map { case (s, xs) =>
      s -> (xs.length.toLong, xs.map(_._2).sum)
    }
    rows.foreach { r =>
      val s = r.getAs[String]("state_at_purchase")
      assert(expected(s)._1 == r.getAs[Long]("n_purchases"), s"state $s count")
      assert(expected(s)._2 == r.getAs[Long]("cents"), s"state $s cents")
    }
  }

  test("dupe invoices: banded join finds exactly the brute-force all-pairs matches") {
    val got = SparkEntry.queries("orders_dupe_invoice_detect")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("cust"), r.getAs[Long]("okey_a"),
        r.getAs[Long]("okey_b"))).toSet
    val orders = Sources.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"),
        expr("CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT)").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = (for {
      a <- orders; b <- orders
      if a._1 == b._1 && a._2 < b._2 &&
        math.abs(a._3 - b._3) <= 10000 && math.abs(a._4 - b._4) <= 90
    } yield (a._1, a._2, b._2)).toSet
    assert(got == expected, s"banded ${got.size} pairs != brute ${expected.size}")
  }

  test("mmr rerank: greedy driver replay over in-order-fold cosines matches the trajectory") {
    val vecs = Sources.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val q = vecs(0L)
    val top20 = vecs.toSeq.map { case (id, v) => (id, cos(q, v)) }
      .sortBy { case (id, s) => (-s, id) }.take(20)
    var selected = List(top20.head)
    for (_ <- 2 to 5) {
      val next = top20.filterNot(c => selected.exists(_._1 == c._1))
        .map { case (id, s) =>
          val maxSel = selected.map(sel => cos(vecs(id), vecs(sel._1))).max
          (id, 0.7 * s - 0.3 * maxSel)
        }.sortBy { case (id, sc) => (-sc, id) }.head
      selected = selected :+ next
    }
    val got = SparkEntry.queries("emb_mmr_rerank")(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(got.length == 5)
    got.zip(selected).foreach { case (r, (id, score)) =>
      assert(r.getAs[Long]("vec_id") == id,
        s"rank ${r.getAs[Int]("rank")}: ${r.getAs[Long]("vec_id")} vs $id")
      assert(math.abs(r.getAs[Double]("mmr_score") - score) < 1e-12)
    }
  }

  test("revenue decomposition: contributions partition the delta; driver replay of the moments") {
    val r = SparkEntry.queries("events_revenue_decomp")(spark, sfDir).collect()(0)
    // The two contributions are an algebraic partition of the total
    // change (identical up to double rounding of the shared terms).
    assert(math.abs(r.getAs[Double]("contrib_users") +
      r.getAs[Double]("contrib_arpu") - r.getAs[Double]("delta_total")) < 1e-6)
    val p = Sources.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 86400000000000").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val maxd = p.map(_._2).max
    val curr = p.filter(_._2 > maxd - 7)
    val prev = p.filter(x => x._2 > maxd - 14 && x._2 <= maxd - 7)
    assert(r.getAs[Long]("u_curr") == curr.map(_._1).distinct.length.toLong)
    assert(r.getAs[Long]("u_prev") == prev.map(_._1).distinct.length.toLong)
    assert(r.getAs[Double]("rev_curr") == curr.map(_._3).sum.toDouble / 100.0)
    assert(r.getAs[Double]("rev_prev") == prev.map(_._3).sum.toDouble / 100.0)
  }

  test("feature hashing: histogram accounts for every bucket, word, and token") {
    val rows = SparkEntry.queries("text_feature_hashing")(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_buckets")).sum == 512L)
    val vocabAndTokens = Sources.documents(spark, sfDir)
      .select(explode(split(util.Norm.normalize(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .agg(countDistinct(col("word")), count(lit(1))).collect()(0)
    assert(rows.map(r => r.getAs[Long]("n_words") * r.getAs[Long]("n_buckets")).sum
      == vocabAndTokens.getLong(0), "sum k·buckets_k must equal vocabulary size")
    assert(rows.map(_.getAs[Long]("tokens")).sum == vocabAndTokens.getLong(1))
  }
}
