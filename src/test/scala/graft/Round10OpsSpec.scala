package graft

import org.apache.spark.sql.functions._

/** Brute-force replays of the round-10 contracts over sf0.001 — each test
  * recomputes the query's claim from first principles (collected rows,
  * driver-side arithmetic) and pins the distributed result to it. */
class Round10OpsSpec extends SparkSpec {

  test("hopping window: every event lands in exactly 2 windows, counts replay") {
    val evs = Sources.events(spark, sfDir)
      .select(expr("ts div 1000").as("us"), col("event_type"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val rows = SparkEntry.queries("events_hopping_window")(spark, sfDir).collect()
    // Fan-out conservation: duration/hop = 2 windows per event.
    assert(rows.map(_.getAs[Long]("n_events")).sum == 2L * evs.length)
    // Brute replay of the assignment rule for every (window, type) cell.
    val h = 3600000000L
    val brute = evs.flatMap { case (us, tpe, uid) =>
      Seq(((us / h) * h, tpe, uid), ((us / h - 1) * h, tpe, uid))
    }
    val bruteCells = brute.groupBy(x => (x._1, x._2))
      .map { case (k, xs) => k -> (xs.length.toLong, xs.map(_._3).distinct.length.toLong) }
    assert(rows.length == bruteCells.size)
    rows.foreach { r =>
      val k = (r.getAs[Long]("w_start_us"), r.getAs[String]("event_type"))
      val (n, u) = bruteCells(k)
      assert(r.getAs[Long]("n_events") == n, s"cell $k count")
      assert(r.getAs[Long]("n_users") == u, s"cell $k users")
    }
  }

  test("mann-kendall: S, n, tau replay from brute pair enumeration") {
    val daily = Sources.ohlcv(spark, sfDir)
      .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
      .groupBy("symbol", "Date")
      .agg(sum(floor(col("Close") * 1e6 + 0.5).cast("long")).as("cs"),
        count(lit(1)).as("nb"))
      .select(col("symbol"), col("Date").cast("string").as("d"),
        expr("cs div nb").as("y"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySym = daily.groupBy(_._1).map { case (s, xs) =>
      s -> xs.sortBy(_._2).take(60).map(_._3)
    }
    val rows = SparkEntry.queries("yf_mann_kendall")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ys = bySym(r.getAs[Long]("symbol"))
      val n = ys.length
      var s = 0L
      for (i <- 0 until n; j <- i + 1 until n)
        s += (if (ys(j) > ys(i)) 1L else if (ys(j) < ys(i)) -1L else 0L)
      assert(r.getAs[Long]("n") == n.toLong)
      assert(r.getAs[Long]("s_stat") == s, s"symbol ${r.getAs[Long]("symbol")}")
      val tau = (s * 2L).toDouble / (n.toLong * (n - 1L)).toDouble
      assert(r.getAs[Double]("tau") == tau)
      assert(math.abs(r.getAs[Double]("tau")) <= 1.0)
    }
    // Symbols with >= 2 trading days all appear.
    assert(rows.length == bySym.count(_._2.length >= 2))
  }

  test("psi drift: nonnegative up to quantization, exact driver replay") {
    val evs = Sources.events(spark, sfDir)
      .select(col("event_type"), expr("ts DIV 86400000000000").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT) DIV 2500").as("vband"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val cutd = (evs.map(_._2).min + evs.map(_._2).max + 1) / 2
    def lnQ(c: Long): Long = math.floor(math.log(c.toDouble) * 1e4 + 0.5).toLong
    val rows = SparkEntry.queries("events_psi_drift")(spark, sfDir).collect()
    rows.foreach { r =>
      val tpe = r.getAs[String]("event_type")
      val cells = evs.filter(_._1 == tpe).groupBy(_._3).toSeq.map { case (_, xs) =>
        (xs.count(_._2 < cutd).toLong, xs.count(_._2 >= cutd).toLong)
      }
      val nRef = cells.map(_._1).sum; val nCur = cells.map(_._2).sum
      val nB = cells.length.toLong
      assert(r.getAs[Long]("n_ref") == nRef)
      assert(r.getAs[Long]("n_cur") == nCur)
      assert(r.getAs[Long]("n_bands") == nB)
      val psiQ = cells.map { case (cr, cc) =>
        val p = (cr + 1).toDouble / (nRef + nB).toDouble
        val q = (cc + 1).toDouble / (nCur + nB).toDouble
        val lnr = lnQ(cr + 1) - lnQ(nRef + nB) - lnQ(cc + 1) + lnQ(nCur + nB)
        math.floor((p - q) * lnr.toDouble / 1e4 * 1e9 + 0.5).toLong
      }.sum
      assert(r.getAs[Double]("psi") == psiQ.toDouble / 1e9, s"type $tpe")
      // Analytic PSI terms are each >= 0; quantization can only dent that
      // by the ln-rounding epsilon per band.
      assert(r.getAs[Double]("psi") >= -1e-4 * nB)
    }
  }

  test("theil-sen: doubled median of brute pairwise slopes, exact") {
    val daily = Sources.ohlcv(spark, sfDir)
      .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
      .groupBy("symbol", "Date")
      .agg(sum(floor(col("Close") * 1e6 + 0.5).cast("long")).as("cs"),
        count(lit(1)).as("nb"))
      .select(col("symbol"), col("Date").cast("string").as("d"),
        expr("cs div nb").as("y"),
        datediff(col("Date"), lit("1995-01-01")).cast("long").as("x"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val rows = SparkEntry.queries("yf_theilsen")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sym = r.getAs[Long]("symbol")
      val pts = daily.filter(_._1 == sym).sortBy(_._2).take(25)
        .map(p => (p._4, p._3))
      val slopes = (for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield {
        val num = pts(j)._2 - pts(i)._2; val den = pts(j)._1 - pts(i)._1
        val sgn = if (num >= 0) 1L else -1L
        sgn * ((math.abs(num) * 1000000L) / den)
      }).sorted
      val n = slopes.length
      assert(r.getAs[Long]("n_pairs") == n.toLong)
      val med2 = slopes((n + 1) / 2 - 1) + slopes((n + 2) / 2 - 1)
      assert(r.getAs[Long]("slope_med2_q12") == med2, s"symbol $sym")
      assert(r.getAs[Double]("slope") == med2.toDouble / 2e12)
    }
  }

  test("windowed funnel: stage counts replay the chained deadline rule") {
    val evs = Sources.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val hourNs = 3600L * 1000000000L
    val su = evs.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._3).min }
    val ck = evs.filter(_._2 == "click").flatMap { case (u, _, t) =>
      su.get(u).filter(s => t > s && t <= s + hourNs).map(_ => (u, t))
    }.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).min }
    val pu = evs.filter(_._2 == "purchase").flatMap { case (u, _, t) =>
      ck.get(u).filter(c => t > c && t <= c + 24L * hourNs).map(_ => (u, t))
    }.groupBy(_._1).keySet
    val r = SparkEntry.queries("events_funnel_windowed")(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_signup") == su.size.toLong)
    assert(r.getAs[Long]("n_click_1h") == ck.size.toLong)
    assert(r.getAs[Long]("n_purchase_24h") == pu.size.toLong)
    // The funnel narrows monotonically.
    assert(su.size >= ck.size && ck.size >= pu.size)
  }

  test("skew/kurtosis: BigInt central-moment replay, exact") {
    val daily = Sources.ohlcv(spark, sfDir)
      .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
      .groupBy("symbol", "Date")
      .agg(sum(floor(col("Close") * 1e4 + 0.5).cast("long")).as("cs"),
        count(lit(1)).as("nb"))
      .select(col("symbol"), col("Date").cast("string").as("d"),
        expr("cs div nb").as("xq"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val rows = SparkEntry.queries("yf_kurtosis_skew")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sym = r.getAs[Long]("symbol")
      val xs = daily.filter(_._1 == sym).sortBy(_._2).map(_._3)
      val diffs = xs.sliding(2).map(p => BigInt(p(1) - p(0))).toSeq
      val n = BigInt(diffs.length)
      assert(r.getAs[Long]("n") == diffs.length.toLong)
      val s1 = diffs.sum
      val s2 = diffs.map(x => x * x).sum
      val s3 = diffs.map(x => x * x * x).sum
      val s4 = diffs.map(x => x * x * x * x).sum
      val a = (n * s2 - s1 * s1).toDouble
      val b = (n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1).toDouble
      val c = (n * n * n * s4 - 4 * n * n * s1 * s3 +
        6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1).toDouble
      if (a != 0.0) {
        assert(r.getAs[Double]("skew") == b / (a * math.sqrt(a)), s"symbol $sym")
        assert(r.getAs[Double]("kurtosis_excess") == c / (a * a) - 3.0)
        // Sample excess kurtosis is bounded below by the constraint
        // kurtosis >= skew^2 + 1 (in the n-scaled sample form, >= -2... -3).
        assert(r.getAs[Double]("kurtosis_excess") >= -3.0)
      }
    }
  }

  test("abc classes partition parts, conserve revenue, respect the 80/95 cuts") {
    val rows = SparkEntry.queries("orders_abc_class")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("abc_class"), r.getAs[Long]("n_parts"),
        r.getAs[Double]("revenue"), r.getAs[Double]("share")))
    val byCls = rows.map(x => x._1 -> x).toMap
    assert(rows.map(_._1).sorted.sameElements(rows.map(_._1)))
    val nParts = Sources.lineitem(spark, sfDir)
      .select(countDistinct(col("l_partkey"))).collect()(0).getLong(0)
    assert(rows.map(_._2).sum == nParts, "classes partition the parts")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9, "shares sum to 1")
    // A's cumulative share can overshoot 80% only by its boundary part;
    // A+B likewise for 95%. With a class present, its share is positive.
    byCls.get("A").foreach { a => assert(a._4 > 0 && a._4 <= 1.0) }
    if (byCls.contains("B"))
      assert(byCls("A")._4 <= 0.8 + 1e-9 ||
        byCls("A")._2 >= 1, "A stops at the first part crossing 80%")
    rows.foreach(x => assert(x._3 > 0.0))
  }

  test("assortativity: brute-force degree Pearson over the oriented edge list") {
    val op = Sources.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = op.groupBy(_._1).values.flatMap { xs =>
      val ps = xs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keySet.toSeq
    val dir2 = edges ++ edges.map(e => (e._2, e._1))
    val deg = dir2.groupBy(_._1).map { case (k, xs) => k -> xs.size.toLong }
    val ds = dir2.map { case (x, y) => (deg(x), deg(y)) }
    val m2 = ds.size.toLong
    val sx = ds.map(_._1).sum; val sy = ds.map(_._2).sum
    val sxx = ds.map(d => d._1 * d._1).sum
    val syy = ds.map(d => d._2 * d._2).sum
    val sxy = ds.map(d => d._1 * d._2).sum
    val expected = (m2 * sxy - sx * sy).toDouble /
      math.sqrt((m2 * sxx - sx * sx).toDouble * (m2 * syy - sy * sy).toDouble)
    val r = SparkEntry.queries("graph_assortativity")(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("m2") == m2)
    assert(r.getAs[Double]("assortativity") == expected)
    assert(math.abs(expected) <= 1.0)
  }

  test("source similarity: exact jaccard replays, estimates well-formed") {
    val ws = Sources.documents(spark, sfDir)
      .select(col("source"),
        explode(split(util.Norm.normalize(col("text")), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
    val vocab = ws.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
    val rows = SparkEntry.queries("docs_source_similarity")(spark, sfDir).collect()
    val nSrc = vocab.size
    assert(rows.length == nSrc * (nSrc - 1) / 2, "one row per unordered pair")
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      assert(a < b)
      val (va, vb) = (vocab(a), vocab(b))
      assert(r.getAs[Long]("n_vocab_a") == va.size.toLong)
      assert(r.getAs[Long]("n_vocab_b") == vb.size.toLong)
      val inter = (va & vb).size.toLong
      assert(r.getAs[Long]("n_inter") == inter)
      val jx = inter.toDouble / (va.size + vb.size - inter).toDouble
      assert(r.getAs[Double]("j_exact") == jx)
      val je = r.getAs[Double]("j_est")
      assert(je >= 0.0 && je <= 1.0 + 1e-9)
      assert(r.getAs[Double]("est_union") > 0.0)
    }
  }

  test("typed aggregator agrees exactly with the untyped codegen'd twin") {
    val typedRows = SparkEntry.queries("yf_typed_agg")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("symbol"), r.getAs[Long]("n_bars"),
        r.getAs[Long]("sum_close_q4"), r.getAs[Double]("avg_close")))
    val untyped = Sources.ohlcv(spark, sfDir)
      .groupBy("symbol")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("Close") * 1e4 + 0.5).cast("long")).as("s"))
      .orderBy("symbol")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(typedRows.length == untyped.length)
    typedRows.zip(untyped).foreach { case ((ts, tn, tsum, tavg), (us, un, usum)) =>
      assert(ts == us && tn == un && tsum == usum)
      assert(tavg == tsum.toDouble / tn.toDouble / 1e4)
    }
  }

  test("donchian: channel bounds contain the close; warm-up rows are null") {
    val rows = SparkEntry.queries("yf_donchian")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val bySym = rows.groupBy(_.getAs[Long]("symbol"))
    bySym.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[String]("d"))
      sorted.zipWithIndex.foreach { case (r, i) =>
        if (i < 19) {
          assert(r.isNullAt(r.fieldIndex("ch_hi_q4")))
          assert(r.isNullAt(r.fieldIndex("ch_lo_q4")))
        } else {
          val win = sorted.slice(i - 19, i + 1).map(_.getAs[Long]("cq"))
          assert(r.getAs[Long]("ch_hi_q4") == win.max)
          assert(r.getAs[Long]("ch_lo_q4") == win.min)
          val cq = r.getAs[Long]("cq")
          assert(win.min <= cq && cq <= win.max)
          if (!r.isNullAt(r.fieldIndex("pos"))) {
            val pos = r.getAs[Double]("pos")
            assert(pos >= 0.0 && pos <= 1.0)
          }
        }
      }
    }
  }

  test("readability: per-language counts replay the three regex signals") {
    val docs = Sources.documents(spark, sfDir)
      .select(col("lang"), col("text"), util.Norm.normalize(col("text")).as("norm"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val rows = SparkEntry.queries("text_readability")(spark, sfDir).collect()
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val ds = docs.filter(_._1 == lang)
      val words = ds.map(_._3.split(" ").count(_.nonEmpty).toLong).sum
      val sents = ds.map(_._2.split("[.!?]+").count(_.trim.nonEmpty).toLong).sum
      val sylls = ds.map(d =>
        "[aeiou]+".r.findAllIn(d._3).length.toLong).sum
      assert(r.getAs[Long]("n_docs") == ds.length.toLong)
      assert(r.getAs[Long]("words") == words)
      assert(r.getAs[Long]("sentences") == sents)
      assert(r.getAs[Long]("syllables") == sylls, s"lang $lang")
      val wps = words.toDouble / sents.toDouble
      val spw = sylls.toDouble / words.toDouble
      assert(r.getAs[Double]("flesch") == 206.835 - 1.015 * wps - 84.6 * spw)
    }
  }

  test("stickiness: avgDAU never exceeds MAU, counts replay") {
    val evs = Sources.events(spark, sfDir)
      .select(expr("ts DIV 86400000000000").as("day"), col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val rows = SparkEntry.queries("events_stickiness")(spark, sfDir).collect()
    rows.foreach { r =>
      val w = r.getAs[Long]("w30")
      val in = evs.filter(_._1 / 30 == w)
      val mau = in.map(_._2).distinct.length.toLong
      val byDay = in.groupBy(_._1).map { case (_, xs) => xs.map(_._2).distinct.length.toLong }
      assert(r.getAs[Long]("mau") == mau)
      assert(r.getAs[Long]("n_days") == byDay.size.toLong)
      assert(r.getAs[Long]("sum_dau") == byDay.sum)
      assert(r.getAs[Double]("avg_dau") <= mau.toDouble + 1e-9)
      assert(r.getAs[Double]("stickiness") > 0.0 &&
        r.getAs[Double]("stickiness") <= 1.0 + 1e-9)
    }
    assert(rows.map(_.getAs[Long]("n_days")).sum ==
      evs.map(_._1).distinct.length.toLong, "windows partition the days")
  }

  /** Standard ntile: with n rows and k tiles, the first (n mod k) tiles
    * hold ceil(n/k) rows, the rest floor(n/k). */
  private def ntileSizes(n: Int, k: Int): Seq[Int] = {
    val base = n / k; val extra = n % k
    (1 to k).map(t => if (t <= extra) base + 1 else base)
  }

  test("pr curve: decile thresholds replay cumulative TP/FP on the score grain") {
    val evs = Sources.events(spark, sfDir)
      .select(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("sc"),
        (col("event_type") === "purchase").cast("long").as("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val grain = evs.groupBy(_._1).toSeq.map { case (sc, xs) =>
      (sc, xs.map(_._2).sum, xs.length.toLong - xs.map(_._2).sum)
    }.sortBy(-_._1)
    val totP = grain.map(_._2).sum
    val cums = grain.scanLeft((0L, 0L)) { case ((tp, fp), (_, np, nn)) =>
      (tp + np, fp + nn)
    }.tail
    val sizes = ntileSizes(grain.length, 10)
    val boundaries = sizes.scanLeft(0)(_ + _).tail // last rn of each tile
    val rows = SparkEntry.queries("events_pr_curve")(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.zipWithIndex.foreach { case (r, i) =>
      val brn = boundaries(i)
      assert(r.getAs[Long]("threshold_cents") == grain(brn - 1)._1)
      val (tp, fp) = cums(brn - 1)
      assert(r.getAs[Long]("cum_tp") == tp && r.getAs[Long]("cum_fp") == fp)
      assert(r.getAs[Double]("precision") == tp.toDouble / (tp + fp).toDouble)
      assert(r.getAs[Double]("recall") == tp.toDouble / totP.toDouble)
    }
    // Recall is monotone in the threshold sweep; the last tile covers all.
    val recalls = rows.map(_.getAs[Double]("recall"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b })
    assert(recalls.last == 1.0)
  }

  test("lift/gain: decile table replays; the full book has gain = lift = 1") {
    val users = Sources.events(spark, sfDir)
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ranked = users.sortBy(u => (-u._2, u._1))
    val sizes = ntileSizes(ranked.length, 10)
    val rows = SparkEntry.queries("events_lift_gain")(spark, sfDir).collect()
    assert(rows.length == 10)
    var off = 0
    val totB = users.map(_._3).sum
    var cumB = 0L
    var cumU = 0L
    rows.zipWithIndex.foreach { case (r, i) =>
      val tile = ranked.slice(off, off + sizes(i)); off += sizes(i)
      cumU += tile.length; cumB += tile.map(_._3).sum
      assert(r.getAs[Long]("n_users") == tile.length.toLong)
      assert(r.getAs[Long]("n_buyers") == tile.map(_._3).sum)
      assert(r.getAs[Long]("cum_buyers") == cumB)
      assert(r.getAs[Double]("gain") == cumB.toDouble / totB.toDouble)
    }
    assert(rows.last.getAs[Double]("gain") == 1.0)
    assert(rows.last.getAs[Double]("lift") == 1.0)
  }

  test("asof nearest: brute per-probe scan, backward wins ties, horizon binds") {
    val evs = Sources.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val clicksByUser: Map[Long, Seq[Long]] =
      evs.filter(_._3 == "click").groupBy(_._2)
        .map { case (u, xs) => u -> xs.map(_._4).toSeq.sorted }
    val h = 3600000000L
    val rows = SparkEntry.queries("events_asof_nearest")(spark, sfDir).collect()
    val probes = evs.filter(_._3 == "error")
    assert(rows.length == probes.length)
    val byId = rows.map(r => r.getAs[Long]("event_id") -> r).toMap
    probes.foreach { case (id, u, _, t) =>
      val cs = clicksByUser.getOrElse(u, Seq.empty)
      val bgap = cs.filter(_ <= t).lastOption.map(t - _).filter(_ <= h)
      val fgap = cs.find(_ >= t).map(_ - t).filter(_ <= h)
      val r = byId(id)
      (bgap, fgap) match {
        case (Some(bg), fg) if fg.forall(bg <= _) =>
          assert(r.getAs[String]("dir") == "back", s"event $id")
          assert(r.getAs[Long]("gap_us") == bg)
          assert(r.getAs[Long]("nearest_match_ts_us") == t - bg)
        case (_, Some(fg)) =>
          assert(r.getAs[String]("dir") == "fwd", s"event $id")
          assert(r.getAs[Long]("gap_us") == fg)
          assert(r.getAs[Long]("nearest_match_ts_us") == t + fg)
        case _ =>
          assert(r.getAs[String]("dir") == "none", s"event $id")
          assert(r.isNullAt(r.fieldIndex("gap_us")))
      }
    }
  }

  test("kmv rolling: merged daily sketches estimate == directly-built window sketch") {
    import org.apache.spark.sql.functions.{col, expr, explode, sequence, max => smax}
    val ev = Sources.events(spark, sfDir)
      .select(expr("ts DIV 86400000000000").as("day"),
        col("user_id").cast("string").as("u"))
    val maxd = ev.agg(smax(col("day"))).collect()(0).getLong(0)
    // Direct per-window sketch: one kmv_agg over the exploded window rows.
    val direct = ev
      .select(explode(sequence(col("day"), col("day") + 6)).as("t"), col("u"))
      .filter(col("t") <= maxd)
      .groupBy("t").agg(expr("kmv_agg(u, 256)").as("kmv"))
      .select(col("t"),
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.size(col("kmv")) < 256,
          org.apache.spark.sql.functions.size(col("kmv")).cast("double"))
          .otherwise(org.apache.spark.sql.functions.lit(
            255.0 * graft.functions.KmvUtil.HashSpan) /
            org.apache.spark.sql.functions.element_at(col("kmv"), 256)
              .cast("double")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = SparkEntry.queries("events_kmv_rolling")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Long]("day")
      assert(r.getAs[Double]("n_est") == direct(d), s"day $d")
      assert(r.getAs[Long]("n_exact") > 0)
    }
  }

  test("quality ablation: sole-fails bound fails; keep + any-fail partitions docs") {
    val rows = SparkEntry.queries("docs_quality_ablation")(spark, sfDir).collect()
    assert(rows.length == 4)
    val nDocs = rows.head.getAs[Long]("n_docs")
    val nKeep = rows.head.getAs[Long]("n_keep")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sole_fail") <= r.getAs[Long]("n_fail"))
      assert(r.getAs[Long]("n_docs") == nDocs)
      assert(r.getAs[Long]("n_keep") == nKeep)
    }
    // Driver replay of the signal booleans over the public gate signals.
    import text.TextAnalysis.{GateMinWords, GateMaxTopWordRatio, GateMinQuality}
    val g = text.TextAnalysis
      .withGateSignals(Sources.documents(spark, sfDir).select("doc_id", "text"), "text")
      .withColumn("twr", text.TextAnalysis.topWordRatio(col("text")))
      .select(col("n_words").cast("long"), col("lang_id"),
        col("twr").cast("double"), col("quality_score").cast("double"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(nDocs == g.length.toLong)
    val fails = g.map { case (w, l, t, q) =>
      (w < GateMinWords, l == "und", t > GateMaxTopWordRatio, q < GateMinQuality)
    }
    def cnt(pick: ((Boolean, Boolean, Boolean, Boolean)) => Boolean): Long =
      fails.count(pick).toLong
    def sole(pick: ((Boolean, Boolean, Boolean, Boolean)) => Boolean): Long =
      fails.count(f => pick(f) &&
        Seq(f._1, f._2, f._3, f._4).count(identity) == 1).toLong
    val byName = rows.map(r => r.getAs[String]("signal") ->
      (r.getAs[Long]("n_fail"), r.getAs[Long]("n_sole_fail"))).toMap
    assert(byName("too_short") == ((cnt(_._1), sole(_._1))))
    assert(byName("lang_unknown") == ((cnt(_._2), sole(_._2))))
    assert(byName("repetitive") == ((cnt(_._3), sole(_._3))))
    assert(byName("low_quality") == ((cnt(_._4), sole(_._4))))
    assert(nKeep == fails.count(f => !f._1 && !f._2 && !f._3 && !f._4).toLong)
  }

  test("phash near-dup: every injected near-copy pair is found") {
    val injected = Sources.documents(spark, sfDir)
      .filter(col("doc_id") % 37 === 5 && length(col("text")) >= 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rows = SparkEntry.queries("mm_phash_near_dup")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("hamming")))
    rows.foreach { case (a, b, h) =>
      assert(a < b && h >= 0 && h <= 8)
    }
    // The injected (id, id+1e6) pair must survive banding + the hamming
    // cut: only 1-2 chunk nibbles differ (<= 8 bits) and at least one
    // of the four 15-bit bands is untouched.
    injected.foreach { id =>
      assert(rows.exists(p => p._1 == id && p._2 == id + 1000000L),
        s"injected near-copy pair for doc $id missing")
    }
  }

  test("dim variance: brute per-dimension moments, rank consistent") {
    val vecs = Sources.embeddings(spark, sfDir)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x.toDouble * 1e4 + 0.5).toLong))
    val rows = SparkEntry.queries("emb_dim_variance")(spark, sfDir).collect()
    assert(rows.length == vecs.head.length)
    rows.foreach { r =>
      val d = r.getAs[Long]("dim_idx").toInt
      val qs = vecs.map(_(d))
      val n = qs.length.toLong
      val s1 = qs.sum; val s2 = qs.map(q => q * q).sum
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Double]("mean") == s1.toDouble / n.toDouble / 1e4)
      assert(r.getAs[Double]("variance") ==
        (n * s2 - s1 * s1).toDouble / (n.toDouble * n.toDouble) / 1e8)
      assert(r.getAs[Double]("variance") >= 0.0)
    }
    val ranks = rows.sortBy(_.getAs[Int]("var_rank"))
      .map(_.getAs[Double]("variance"))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b },
      "rank order matches descending variance")
  }

  test("golden cross: every emitted day is a genuine state flip") {
    val daily = Sources.ohlcv(spark, sfDir)
      .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
      .groupBy("symbol", "Date")
      .agg(sum(floor(col("Close") * 1e4 + 0.5).cast("long")).as("cs"),
        count(lit(1)).as("nb"))
      .select(col("symbol"), col("Date").cast("date").cast("string").as("d"),
        expr("cs div nb").as("cq"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val rows = SparkEntry.queries("yf_golden_cross")(spark, sfDir).collect()
    val bySym = daily.groupBy(_._1)
    // Brute state series per symbol; collect expected flips.
    val expected = bySym.flatMap { case (sym, xs) =>
      val cq = xs.sortBy(_._2).map(x => (x._2, x._3))
      val states = cq.indices.map { i =>
        if (i < 19) None
        else {
          val s5 = cq.slice(i - 4, i + 1).map(_._2).sum
          val s20 = cq.slice(i - 19, i + 1).map(_._2).sum
          Some(s5 * 4 > s20)
        }
      }
      cq.indices.flatMap { i =>
        (states(i), if (i > 0) states(i - 1) else None) match {
          case (Some(cur), Some(prev)) if cur != prev =>
            Some((sym, cq(i)._1, if (cur) "golden" else "death"))
          case _ => None
        }
      }
    }.toSet
    assert(rows.map(r => (r.getAs[Long]("symbol"), r.getAs[String]("d"),
      r.getAs[String]("direction"))).toSet == expected)
    assert(rows.nonEmpty)
  }

  test("jarque-bera: agrees with the skew/kurtosis query's own moments") {
    val ks = SparkEntry.queries("yf_kurtosis_skew")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("symbol") ->
        (r.getAs[Long]("n"), r.getAs[Double]("skew"),
          r.getAs[Double]("kurtosis_excess"))).toMap
    val rows = SparkEntry.queries("yf_jarque_bera")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sym = r.getAs[Long]("symbol")
      val (n, g1, g2) = ks(sym)
      assert(r.getAs[Long]("n") == n)
      val jb = n.toDouble * (g1 * g1 / 6.0 + g2 * g2 / 24.0)
      assert(r.getAs[Double]("jb") == jb, s"symbol $sym")
      assert(jb >= 0.0)
      assert(r.getAs[Int]("reject_normal") == (if (jb > 5.991) 1 else 0))
    }
  }

  test("hapax ratio: brute word-count replay per language") {
    val words = Sources.documents(spark, sfDir)
      .select(col("lang"),
        explode(split(util.Norm.normalize(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val rows = SparkEntry.queries("text_hapax_ratio")(spark, sfDir).collect()
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      val wc = words.filter(_._1 == lang).groupBy(_._2)
        .map { case (_, xs) => xs.length.toLong }
      assert(r.getAs[Long]("vocab") == wc.size.toLong)
      assert(r.getAs[Long]("tokens") == wc.sum)
      val hapax = wc.count(_ == 1L).toLong
      assert(r.getAs[Long]("hapax") == hapax)
      assert(r.getAs[Double]("hapax_vocab_share") ==
        hapax.toDouble / wc.size.toDouble)
    }
  }

  test("clustering coefficient: consistent with graph_triangles' counts") {
    val t = SparkEntry.queries("graph_triangles")(spark, sfDir).collect()(0)
    val r = SparkEntry.queries("graph_clustering_coeff")(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_nodes") == t.getAs[Long]("n_nodes"))
    assert(r.getAs[Long]("n_edges") == t.getAs[Long]("n_edges"))
    assert(r.getAs[Long]("n_triangles") == t.getAs[Long]("n_triangles"))
    // Unoriented wedges >= oriented wedges (orientation only drops).
    assert(r.getAs[Long]("n_wedges") >= t.getAs[Long]("n_wedges"))
    val cc = r.getAs[Double]("global_cc")
    assert(cc >= 0.0 && cc <= 1.0)
    assert(cc == r.getAs[Long]("n_triangles").toDouble * 3.0 /
      r.getAs[Long]("n_wedges").toDouble)
  }

  test("value migration: matrix conserves customers; tier sizes are ntile sizes") {
    val o = Sources.orders(spark, sfDir)
      .select(col("o_custkey"),
        datediff(col("o_orderdate"), lit("1990-01-01")).cast("long").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cutd = (o.map(_._2).min + o.map(_._2).max + 1) / 2
    val h1 = o.filter(_._2 < cutd).map(_._1).distinct.toSet
    val h2 = o.filter(_._2 >= cutd).map(_._1).distinct.toSet
    val rows = SparkEntry.queries("customer_value_migration")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("from_tier"), r.getAs[String]("to_tier"),
        r.getAs[Long]("n_customers")))
    assert(rows.map(_._3).sum == (h1 ++ h2).size.toLong,
      "matrix covers every customer exactly once")
    // Row marginals: each h1 tier's size matches the ntile partition.
    val h1Sizes = ntileSizes(h1.size, 5)
    (1 to 5).foreach { q =>
      assert(rows.filter(_._1 == s"q$q").map(_._3).sum == h1Sizes(q - 1).toLong)
    }
    assert(rows.filter(_._1 == "none").map(_._3).sum ==
      (h2 -- h1).size.toLong, "'none' row = customers new in h2")
    assert(rows.filter(_._2 == "none").map(_._3).sum ==
      (h1 -- h2).size.toLong, "'none' column = churned customers")
  }

  test("mutual info: nonnegative up to quantization, exact driver replay") {
    val evs = Sources.events(spark, sfDir)
      .select(col("event_type"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT) DIV 2500").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def lnQ(c: Long): Long = math.floor(math.log(c.toDouble) * 1e4 + 0.5).toLong
    val cells = evs.groupBy(identity).map { case ((y, x), xs) =>
      (x, y, xs.length.toLong)
    }.toSeq
    val nn = cells.map(_._3).sum
    val nx = cells.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val ny = cells.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).sum }
    val miQ = cells.map { case (x, y, nxy) =>
      val lnr = lnQ(nxy) + lnQ(nn) - lnQ(nx(x)) - lnQ(ny(y))
      math.floor(nxy.toDouble / nn.toDouble * (lnr.toDouble / 1e4) * 1e9 + 0.5)
        .toLong
    }.sum
    val r = SparkEntry.queries("events_mutual_info")(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n") == nn)
    assert(r.getAs[Long]("n_cells") == cells.length.toLong)
    assert(r.getAs[Double]("mi_nats") == miQ.toDouble / 1e9)
    assert(r.getAs[Double]("mi_nats") >= -1e-4)
  }

  test("negative samples: never purchased, at most 3 per customer, rank dense") {
    val purchased = Sources.lineitem(spark, sfDir)
      .join(Sources.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = SparkEntry.queries("orders_negative_samples")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("rank"),
        r.getAs[Long]("p_partkey")))
    assert(rows.nonEmpty)
    rows.foreach { case (c, _, p) =>
      assert(!purchased.contains((c, p)), s"sampled a purchased pair ($c,$p)")
    }
    rows.groupBy(_._1).values.foreach { xs =>
      assert(xs.length <= 3)
      assert(xs.map(_._2).sorted.sameElements(1L to xs.length.toLong),
        "ranks are dense from 1")
      assert(xs.map(_._3).distinct.length == xs.length, "parts distinct")
    }
  }

  test("triplet mining: brute argmax/argmin replay with the in-order fold") {
    val emb = Sources.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < x.length) { s += x(i) * y(i); i += 1 }
        s
      }
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val rows = SparkEntry.queries("emb_triplet_mining")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byId = emb.map(e => e._1 -> e).toMap
    rows.foreach { r =>
      val aId = r.getAs[Long]("a_id")
      val (_, av, aLabel) = byId(aId)
      assert(aId % 29 == 0 && r.getAs[Int]("a_label") == aLabel)
      val scored = emb.filter(_._1 != aId).map { case (id, v, l) =>
        (id, l, math.floor(cos(av, v) * 1e6 + 0.5).toLong + 2000000L)
      }
      val nk = scored.filter(_._2 != aLabel)
        .map(x => x._3 * 10000000000L + (9999999999L - x._1)).max
      val pk = scored.filter(_._2 == aLabel)
        .map(x => x._3 * 10000000000L + x._1).min
      assert(r.getAs[Long]("neg_id") == 9999999999L - nk % 10000000000L)
      assert(r.getAs[Long]("pos_id") == pk % 10000000000L)
      assert(r.getAs[Double]("margin") ==
        r.getAs[Double]("pos_sim") - r.getAs[Double]("neg_sim"))
      // The mined ids carry the promised labels.
      assert(byId(r.getAs[Long]("neg_id"))._3 != aLabel)
      assert(byId(r.getAs[Long]("pos_id"))._3 == aLabel)
    }
  }

  test("data contract: clean fixture passes every constraint, counts replay") {
    val rows = SparkEntry.queries("data_contract_check")(spark, sfDir).collect()
    assert(rows.length == 6)
    val n = rows.head.getAs[Long]("n_checked")
    val evN = Sources.events(spark, sfDir).count()
    assert(n == evN)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_checked") == evN)
      assert(r.getAs[Long]("n_violations") >= 0)
      assert(r.getAs[Int]("pass") ==
        (if (r.getAs[Long]("n_violations") == 0) 1 else 0))
    }
    // The driver-generated fixture is clean: every contract holds.
    assert(rows.forall(_.getAs[Int]("pass") == 1),
      "driver testdata violates a declared contract")
  }

  test("code detect: symbol counts replay via the same regex") {
    val docs = Sources.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val rows = SparkEntry.queries("docs_code_detect")(spark, sfDir).collect()
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val ds = docs.filter(_._1 == src)
      val stats = ds.map { case (_, t) =>
        val sym = t.length - t.replaceAll("[{}()\\[\\];=<>]", "").length
        (t.length.toLong, sym.toLong, if (sym * 100L > t.length * 3L) 1L else 0L)
      }
      assert(r.getAs[Long]("n_docs") == ds.length.toLong)
      assert(r.getAs[Long]("sym_chars") == stats.map(_._2).sum)
      assert(r.getAs[Long]("total_chars") == stats.map(_._1).sum)
      assert(r.getAs[Long]("n_code_like") == stats.map(_._3).sum)
    }
  }

  test("boilerplate lines: both injected footers detected with exact df") {
    val nFooterDocs = Sources.documents(spark, sfDir)
      .filter(col("doc_id") % 3 === 0).count()
    val rows = SparkEntry.queries("docs_boilerplate_lines")(spark, sfDir).collect()
      .map(r => r.getAs[String]("sent") ->
        (r.getAs[Long]("df"), r.getAs[Long]("n_occurrences"))).toMap
    assert(rows.contains("FOOTER ALPHA"))
    assert(rows.contains("ALL RIGHTS RESERVED"))
    assert(rows("FOOTER ALPHA")._1 == nFooterDocs)
    assert(rows("ALL RIGHTS RESERVED")._1 == nFooterDocs)
    rows.values.foreach { case (df, occ) => assert(df >= 20 && occ >= df) }
  }

  test("time-decay attribution: same pairing as linear, credit conserved") {
    val lin = SparkEntry.queries("events_attribution_linear")(spark, sfDir)
      .collect().map(r => r.getAs[String]("touch") -> r.getAs[Long]("n_touches"))
      .toMap
    val rows = SparkEntry.queries("events_attribution_timedecay")(spark, sfDir)
      .collect()
    // n_touches per channel must match the linear twin exactly — the
    // pairing is shared, only the credit model differs.
    rows.foreach { r =>
      assert(lin(r.getAs[String]("touch")) == r.getAs[Long]("n_touches"))
    }
    val nPurch = Sources.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    val total = rows.map(_.getAs[Double]("credit")).sum
    // Each conversion hands out at most 1 unit; truncating division can
    // only lose < (touch types per conversion) millionths.
    assert(total <= nPurch.toDouble + 1e-9)
    assert(total >= nPurch.toDouble - nPurch * 3e-6 - 1e-9)
  }

  test("atr: true range replays; atr is the trailing-14 integer mean") {
    val rows = SparkEntry.queries("yf_atr")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val bySym = rows.groupBy(_.getAs[Long]("symbol"))
    bySym.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[String]("d"))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("tr") >= 0)
        if (i < 13) assert(r.isNullAt(r.fieldIndex("atr_q4")))
        else {
          val win = sorted.slice(i - 13, i + 1).map(_.getAs[Long]("tr"))
          assert(r.getAs[Long]("atr_q4") == win.sum / 14)
          assert(r.getAs[Double]("atr") ==
            r.getAs[Long]("atr_q4").toDouble / 1e4)
        }
      }
    }
  }

  test("entity extract: counts replay via the same java regexes") {
    val docs = Sources.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val rows = SparkEntry.queries("text_entity_extract")(spark, sfDir).collect()
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val ds = docs.filter(_._1 == src)
      def cnt(pat: String): Long =
        ds.map(d => pat.r.findAllIn(d._2).length.toLong).sum
      assert(r.getAs[Long]("n_docs") == ds.length.toLong)
      assert(r.getAs[Long]("n_numbers") == cnt("[0-9]+"))
      assert(r.getAs[Long]("n_capitalized") == cnt("[A-Z][a-z]+"))
      assert(r.getAs[Long]("n_urls") == cnt("https?://[^ ]+"))
      assert(r.getAs[Long]("n_emails") == cnt("[a-z0-9._%+-]+@[a-z0-9.-]+"))
    }
  }

  test("degree histogram: buckets partition nodes, mass is twice the edges") {
    val rows = SparkEntry.queries("graph_degree_histogram")(spark, sfDir).collect()
    val cc = SparkEntry.queries("graph_clustering_coeff")(spark, sfDir).collect()(0)
    assert(rows.map(_.getAs[Long]("n_nodes")).sum == cc.getAs[Long]("n_nodes"))
    assert(rows.map(_.getAs[Long]("degree_mass")).sum ==
      2L * cc.getAs[Long]("n_edges"))
    rows.foreach { r =>
      val lo = r.getAs[Long]("bucket_lo")
      assert(r.getAs[Long]("min_degree") >= lo)
      assert(r.getAs[Long]("max_degree") < 2 * lo)
    }
  }

  test("ulcer index: brute running-peak drawdown replay") {
    val daily = Sources.ohlcv(spark, sfDir)
      .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
      .groupBy("symbol", "Date")
      .agg(sum(floor(col("Close") * 1e4 + 0.5).cast("long")).as("cs"),
        count(lit(1)).as("nb"))
      .select(col("symbol"), col("Date").cast("string").as("d"),
        expr("cs div nb").as("cq"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .filter(_._3 > 0)
    val rows = SparkEntry.queries("yf_ulcer_index")(spark, sfDir).collect()
    rows.foreach { r =>
      val sym = r.getAs[Long]("symbol")
      val cq = daily.filter(_._1 == sym).sortBy(_._2).map(_._3)
      var peak = Long.MinValue
      val dds = cq.map { c => peak = math.max(peak, c); ((peak - c) * 10000L) / peak }
      assert(r.getAs[Long]("n") == cq.length.toLong)
      assert(r.getAs[Long]("max_dd_bp") == dds.max)
      assert(r.getAs[Double]("ulcer") ==
        math.sqrt(dds.map(d => d * d).sum.toDouble / cq.length.toDouble) / 100.0)
    }
  }

  test("centroid drift: cosine near 1 for split halves, exact centroid replay") {
    val rows = SparkEntry.queries("emb_centroid_drift")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val emb = Sources.embeddings(spark, sfDir)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(x =>
        math.floor(x.toDouble * 1e8 + 0.5).toLong).toArray, r.getInt(2)))
    rows.foreach { r =>
      val label = r.getAs[Int]("label")
      def centroid(half: Long): Array[Long] = {
        val vs = emb.filter(e => e._3 == label && e._1 % 2 == half).map(_._2)
        val n = vs.length.toLong
        (0 until vs.head.length).map { d =>
          val s = vs.map(_(d)).sum
          if (s >= 0) s / n else -((-s) / n)
        }.toArray
      }
      val (a, b) = (centroid(0), centroid(1))
      val sxy = a.zip(b).map { case (x, y) => x * y }.sum
      val sxx = a.map(x => x * x).sum
      val syy = b.map(y => y * y).sum
      val expected = sxy.toDouble / (math.sqrt(sxx.toDouble) * math.sqrt(syy.toDouble))
      assert(r.getAs[Double]("cos_drift") == expected, s"label $label")
      // Cosine is bounded (the fixture's embeddings are near-zero-mean,
      // so half-centroids are noise-dominated — no alignment promise).
      assert(math.abs(r.getAs[Double]("cos_drift")) <= 1.0 + 1e-9)
    }
  }

  test("calendar heatmap: cells conserve orders and revenue") {
    val rows = SparkEntry.queries("orders_calendar_heatmap")(spark, sfDir).collect()
    val o = Sources.orders(spark, sfDir)
      .agg(count(lit(1)),
        sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")))
      .collect()(0)
    assert(rows.map(_.getAs[Long]("n_orders")).sum == o.getLong(0))
    assert(math.abs(rows.map(_.getAs[Double]("revenue")).sum -
      o.getLong(1).toDouble / 100.0) < 1e-4)
    rows.foreach { r =>
      assert(r.getAs[Long]("mth") >= 1 && r.getAs[Long]("mth") <= 12)
      assert(r.getAs[Long]("dow") >= 0 && r.getAs[Long]("dow") <= 6)
    }
  }

  test("ood flags: flags are the strict-beyond-p99 tail, cut is the rank rule") {
    val rows = SparkEntry.queries("emb_ood_flags")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val flagged = r.getAs[Long]("n_flagged")
      // At most 1% can lie strictly beyond the ceil(0.99 n) order statistic.
      assert(flagged <= n - (n * 99 + 99) / 100)
      assert(r.getAs[Long]("max_dist2") >= r.getAs[Long]("p99_dist2"))
      assert(r.getAs[Long]("p99_dist2") >= 0)
    }
  }

  test("gap days: every emitted day clears the 5% integer cut; direction correct") {
    val rows = SparkEntry.queries("yf_gap_days")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val oq = r.getAs[Long]("oq"); val cp = r.getAs[Long]("cprev")
      val bp = (math.abs(oq - cp) * 10000L) / cp
      assert(r.getAs[Long]("gap_bp") == bp && bp >= 500)
      assert(r.getAs[String]("direction") == (if (oq > cp) "up" else "down"))
    }
  }

  test("freshness audit: as-of is the corpus max day; counts conserve") {
    val rows = SparkEntry.queries("events_freshness_audit")(spark, sfDir).collect()
    val evs = Sources.events(spark, sfDir)
      .select(col("event_type"), expr("ts DIV 86400000000000").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val asOf = evs.map(_._2).max
    assert(rows.map(_.getAs[Long]("n_events")).sum == evs.length.toLong)
    rows.foreach { r =>
      val tpe = r.getAs[String]("event_type")
      val ds = evs.filter(_._1 == tpe).map(_._2)
      assert(r.getAs[Long]("as_of_day") == asOf)
      assert(r.getAs[Long]("last_day") == ds.max)
      assert(r.getAs[Long]("staleness_days") == asOf - ds.max)
      assert(r.getAs[Long]("n_last_7d") == ds.count(_ > asOf - 7).toLong)
      assert(r.getAs[Int]("stale") == (if (asOf - ds.max > 1) 1 else 0))
    }
  }

  test("reorder interval: doubled median of brute per-customer gaps") {
    val o = Sources.orders(spark, sfDir)
      .select(col("o_custkey"),
        datediff(col("o_orderdate"), lit("1990-01-01")).cast("long").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val seg = Sources.customer(spark, sfDir)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val gaps = o.groupBy(_._1).toSeq.flatMap { case (c, xs) =>
      val ds = xs.map(_._2).sorted
      ds.zip(ds.tail).map { case (a, b) => (seg(c), b - a) }
    }
    val rows = SparkEntry.queries("orders_reorder_interval")(spark, sfDir).collect()
    rows.foreach { r =>
      val sg = r.getAs[String]("c_mktsegment")
      val gs = gaps.filter(_._1 == sg).map(_._2).sorted
      val n = gs.length
      assert(r.getAs[Long]("n_gaps") == n.toLong)
      val med2 = gs((n + 1) / 2 - 1) + gs((n + 2) / 2 - 1)
      assert(r.getAs[Long]("med2_days") == med2, s"segment $sg")
      assert(r.getAs[Double]("median_days") == med2.toDouble / 2.0)
    }
  }

  test("ttr curve: prefix cut and type counts replay; budgets nest") {
    val docs = Sources.documents(spark, sfDir)
      .select(col("doc_id"), util.Norm.normalize(col("text")).as("norm"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
    val toks = docs.map { case (id, n) => (id, n.split(" ").filter(_.nonEmpty)) }
    val cums = toks.scanLeft(0L)((acc, d) => acc + d._2.length).tail
    val rows = SparkEntry.queries("text_ttr_curve")(spark, sfDir).collect()
    var prevDocs = -1L
    rows.foreach { r =>
      val budget = r.getAs[Long]("budget")
      val kept = toks.zip(cums).takeWhile(_._2 <= budget).map(_._1)
      assert(r.getAs[Long]("n_docs") == kept.length.toLong)
      assert(r.getAs[Long]("n_tokens") == kept.map(_._2.length.toLong).sum)
      val types = kept.flatMap(_._2).distinct.length.toLong
      assert(r.getAs[Long]("n_types") == types)
      assert(r.getAs[Double]("ttr") ==
        types.toDouble / kept.map(_._2.length.toLong).sum.toDouble)
      // Larger budgets keep supersets of smaller budgets' docs.
      assert(kept.length.toLong >= prevDocs)
      prevDocs = kept.length.toLong
    }
  }

  test("calmar: consistent with the ulcer query's drawdowns and endpoints") {
    val ulcer = SparkEntry.queries("yf_ulcer_index")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("symbol") -> r.getAs[Long]("max_dd_bp")).toMap
    val rows = SparkEntry.queries("yf_calmar")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sym = r.getAs[Long]("symbol")
      assert(r.getAs[Long]("max_dd_bp") == ulcer(sym),
        s"max drawdown disagrees with ulcer for $sym")
      val ret = r.getAs[Long]("ret_bp")
      if (r.getAs[Long]("max_dd_bp") > 0)
        assert(r.getAs[Double]("calmar") ==
          ret.toDouble / r.getAs[Long]("max_dd_bp").toDouble)
      // A positive return cannot coexist with a 100% drawdown floor.
      assert(r.getAs[Long]("max_dd_bp") <= 10000)
    }
  }

  test("label geometry: symmetric-pair matrix over exact centroids") {
    val rows = SparkEntry.queries("emb_label_geometry")(spark, sfDir).collect()
    val labels = Sources.embeddings(spark, sfDir)
      .select("label").distinct().collect().map(_.getInt(0)).sorted
    assert(rows.length == labels.length * (labels.length - 1) / 2)
    rows.foreach { r =>
      assert(r.getAs[Int]("label_a") < r.getAs[Int]("label_b"))
      assert(math.abs(r.getAs[Double]("cos_centroid")) <= 1.0 + 1e-9)
    }
    // n_a for a given label is the same in every pair it appears in.
    val nByLabel = rows.flatMap(r => Seq(
      r.getAs[Int]("label_a") -> r.getAs[Long]("n_a"),
      r.getAs[Int]("label_b") -> r.getAs[Long]("n_b"))).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_a") == nByLabel(r.getAs[Int]("label_a")))
      assert(r.getAs[Long]("n_b") == nByLabel(r.getAs[Int]("label_b")))
    }
  }

  test("csv roundtrip: quoted props survive byte-exact; counts match source") {
    val rows = SparkEntry.queries("events_csv_roundtrip")(spark, sfDir).collect()
    val direct = Sources.events(spark, sfDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(conv(substring(md5(cast(props as binary)), 1, 10), " +
          "16, 10) AS BIGINT)")).as("ps"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // Some props strings must actually contain quote characters — the
    // case that forces the writer through quote+escape handling
    // (embedded quotes are the harder half; a bare comma only forces
    // quoting). Otherwise this test would not exercise escaping at all.
    val nWithQuote = Sources.events(spark, sfDir)
      .filter(col("props").contains("\"")).count()
    assert(nWithQuote > 0, "fixture props carry no quotes; escaping untested")
    rows.foreach { r =>
      val (n, ps) = direct(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_events") == n)
      assert(r.getAs[Long]("props_sum40") == ps,
        s"props bytes changed through the CSV wire for ${r.getString(0)}")
    }
  }
}
