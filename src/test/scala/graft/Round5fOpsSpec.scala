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

  test("tpch_q6: every predicate reaches the parquet scan; q1/q3 shapes return expected grains") {
    val q6 = SparkEntry.queries("tpch_q6")(spark, sfDir)
    q6.collect()
    val scanLine = q6.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(scanLine.contains(c), s"$c filter not pushed: $scanLine")
    val q1 = SparkEntry.queries("tpch_q1")(spark, sfDir).collect()
    assert(q1.nonEmpty && q1.length <= 6, "returnflag x linestatus grains")
    val q3 = SparkEntry.queries("tpch_q3")(spark, sfDir).collect()
    assert(q3.length <= 10)
    val revs = q3.map(_.getDouble(3)).toSeq
    assert(revs == revs.sorted.reverse)
  }

  test("yf_unpivot: one Expand over one scan — never a four-scan union") {
    val df = SparkEntry.queries("yf_unpivot")(spark, sfDir)
    val rows = df.collect()
    // An executed AdaptiveSparkPlan stringifies BOTH the final and the
    // initial plan — count scans in the final section only.
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("Expand"), s"unpivot should plan as Expand:\n$plan")
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected exactly 1 lineitem scan, got $scans:\n$plan")
    // 4 metrics per symbol, equal bar counts across metrics.
    val bySymbol = rows.groupBy(_.getLong(0))
    bySymbol.foreach { case (_, rs) =>
      assert(rs.map(_.getString(1)).sorted.toSeq ==
        Seq("close", "high", "low", "open"))
      assert(rs.map(_.getLong(2)).distinct.length == 1)
    }
  }

  test("events_null_safe_join: the NULL key class matches as ONE fully-populated row") {
    val rows = SparkEntry.queries("events_null_safe_join")(spark, sfDir).collect()
    val nullRows = rows.filter(_.isNullAt(0))
    assert(nullRows.length == 1, "exactly one NULL-class row under <=>")
    assert(!nullRows.head.isNullAt(1) && !nullRows.head.isNullAt(2),
      "both sides' counts populated — the null keys MATCHED")
    // A plain `=` full outer on the same inputs splits the class into
    // two half-rows; pin the contrast so the operator can't silently
    // regress to `=` semantics.
    import spark.implicits._
    val k = from_json(col("props"),
      org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k")
    def side(t: String, n: String) = Sources.events(spark, sfDir)
      .filter(col("event_type") === t)
      .select(nullif(k % 7, lit(0)).as("knull"))
      .groupBy("knull").agg(count(lit(1)).as(n))
    val l = side("click", "n_click"); val r = side("view", "n_view")
    val plain = l.join(r, l("knull") === r("knull"), "full_outer").collect()
    assert(plain.count(x => x.isNullAt(0) || x.isNullAt(1)) == 2,
      "plain = emits two half-rows for the NULL class")
  }

  test("graph_triangles: oriented count equals the brute-force unoriented count / invariants") {
    import spark.implicits._
    val r = q("graph_triangles").collect().head
    val (nNodes, nEdges, nWedges, nTri) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nNodes > 0 && nEdges > 0 && nWedges >= nTri)
    // Brute force: count each triangle 3 times via undirected adjacency,
    // then divide — small fixture only.
    val op = Sources.lineitem(spark, sfDir)
      .select($"l_orderkey".as("o"), $"l_partkey".as("p")).distinct()
    val e = op.as("a").join(op.as("b"),
        $"a.o" === $"b.o" && $"a.p" < $"b.p")
      .groupBy($"a.p".as("u"), $"b.p".as("v"))
      .agg(count(lit(1)).as("support")).filter($"support" >= 2)
      .select("u", "v")
    val und = e.unionByName(e.select($"v".as("u"), $"u".as("v")))
    val brute = und.as("e1")
      .join(und.as("e2"), col("e1.v") === col("e2.u"))
      .join(und.as("e3"),
        col("e2.v") === col("e3.u") && col("e3.v") === col("e1.u"))
      .filter(col("e1.u") < col("e1.v") && col("e1.v") < col("e2.v"))
      .count()
    assert(nTri == brute, s"oriented $nTri != brute $brute")
  }

  test("docs_lexical_score: per-doc feature accounting is internally consistent") {
    val rows = q("docs_lexical_score").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nf, nm, sum) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nm <= nf)
      if (nm == 0) { assert(sum == 0L && r.isNullAt(4)) }
      else assert(math.abs(r.getDouble(4) - sum.toDouble / nm) < 1e-9)
    }
  }

  test("sim_ann_ivf_stored: identical to the in-query trained twin; artifact is reused") {
    val trained = SparkEntry.queries("sim_ann_ivf_trained")(spark, sfDir).collect()
    graft.util.Views.unpersistAll()
    val stored1 = SparkEntry.queries("sim_ann_ivf_stored")(spark, sfDir).collect()
    assert(stored1.map(_.toString).toSeq == trained.map(_.toString).toSeq)
    // Second invocation must probe the SAME artifact (marker short-circuit)
    // and agree exactly.
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val sfTag = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val raw = s"$warehouse/graft_ivf_cents_$sfTag/_GRAFT_MARKER"
    val marker = new java.io.File(
      if (raw.startsWith("file:")) new java.net.URI(raw).getPath else raw)
    assert(marker.exists, "centroid artifact marker must exist after first run")
    val before = marker.lastModified
    val stored2 = SparkEntry.queries("sim_ann_ivf_stored")(spark, sfDir).collect()
    assert(stored2.map(_.toString).toSeq == stored1.map(_.toString).toSeq)
    assert(marker.lastModified == before, "second run must not rebuild the artifact")
  }
}
