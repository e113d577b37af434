package graft

import org.apache.spark.sql.functions._

/** Specs for the second round-5 batch: Q17-shaped subquery decorrelation,
  * weighted sampling, CUBE grouping sets, skew diagnostics, and the
  * Z-order layout key. Structural invariants beyond the DuckDB hash gate.
  */
class Round5bOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("small-qty revenue: window rewrite equals the correlated-subquery join form") {
    val out = run("part_small_qty_revenue").collect()
    // Independent recompute in the naive shape: aggregate per part, join
    // back, filter with the division-free predicate, re-aggregate.
    val li = Sources.lineitem(spark, sfDir)
    val qDec = col("l_quantity").cast(util.Stable.MoneyDec)
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(qDec).as("sum_q"), count(lit(1)).as("cnt"))
    val expected = li
      .join(perPart, col("l_partkey") === col("pk"))
      .filter(qDec * 5 * col("cnt") < col("sum_q"))
      .join(Sources.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_small"),
        util.Stable.exactSum(col("l_extendedprice")).as("revenue"))
      .orderBy("p_brand").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ===
      expected.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq)
  }

  test("small-qty revenue: the fact table shuffles on l_partkey exactly once") {
    val plan = run("part_small_qty_revenue").queryExecution.executedPlan.toString
    val factExchanges = "hashpartitioning\\(l_partkey".r.findAllIn(plan).size
    assert(factExchanges <= 1,
      s"window partitioning must be reused by the part join, got $factExchanges " +
        s"l_partkey exchanges in:\n$plan")
  }

  test("weighted sample: deterministic, and weights bias the sample toward long docs") {
    val out = run("docs_weighted_sample").collect()
    assert(out.length === 100)
    val keys = out.map(_.getDouble(3))
    assert(keys.sameElements(keys.sorted), "sample keys must be ascending")
    assert(out.map(_.getLong(0)).distinct.length === 100, "no doc sampled twice")
    // Expected sample size of doc i is ∝ n_chars: the sampled docs' mean
    // length must sit clearly above the corpus mean.
    val sampleMean = out.map(_.getLong(2).toDouble).sum / out.length
    val corpusMean = Sources.documents(spark, sfDir)
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean not above corpus mean $corpusMean")
    // Re-run is identical (hash-derived keys, no rand()).
    val again = run("docs_weighted_sample").collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("cube: all four grains are consistent with the grand total") {
    val out = run("events_cube").cache()
    val total = Sources.events(spark, sfDir).count()
    def grain(gType: Int, gDow: Int) =
      out.filter(col("g_type") === gType && col("g_dow") === gDow)
    // Grand total row.
    val grand = grain(1, 1).collect()
    assert(grand.length === 1 && grand(0).getAs[Long]("n_events") === total)
    // Every grain's n_events sums back to the grand total.
    for ((gt, gd) <- Seq((0, 0), (0, 1), (1, 0))) {
      val s = grain(gt, gd).agg(sum("n_events")).collect()(0).getLong(0)
      assert(s === total, s"grain ($gt,$gd) sums to $s, want $total")
    }
    // One pass through Expand — the input is scanned once, not 4x.
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"cube must plan through Expand:\n$plan")
    out.unpersist()
  }

  test("key skew: diagnostics agree with direct recomputation") {
    val r = run("events_key_skew").collect()(0)
    val ev = Sources.events(spark, sfDir)
    val perKey = ev.groupBy("user_id").count()
    assert(r.getAs[Long]("n_rows") === ev.count())
    assert(r.getAs[Long]("n_keys") === perKey.count())
    assert(r.getAs[Long]("max_key_rows") ===
      perKey.agg(max("count")).collect()(0).getLong(0))
    assert(r.getAs[Double]("skew_ratio") >= 1.0)
    assert(r.getAs[Double]("avg_key_rows") > 0.0)
  }

  test("rank-ties composition: boundary ties survive where row_number would cut") {
    import spark.implicits._
    // customer 1: values 10,10,9,9,8 — rank()<=3 keeps {10,10,9,9} (the
    // 9s tie at the boundary); row_number()<=3 would keep only 3 rows.
    // customer 2: no ties, plain top-3.
    val o = Seq(
      (101L, 1L, 10.0), (102L, 1L, 10.0), (103L, 1L, 9.0), (104L, 1L, 9.0),
      (105L, 1L, 8.0),
      (201L, 2L, 5.0), (202L, 2L, 4.0), (203L, 2L, 3.0), (204L, 2L, 2.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val thresholds = plans.TopK.perKey(
      o.select("o_custkey", "o_totalprice"),
      keyCols = Seq("o_custkey"),
      orderBy = Seq("o_totalprice" -> false), k = 3)
      .groupBy("o_custkey").agg(min(col("o_totalprice")).as("th"))
    val kept = o.join(thresholds, "o_custkey")
      .filter(col("o_totalprice") >= col("th"))
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept === Set((1L, 101L), (1L, 102L), (1L, 103L), (1L, 104L),
      (2L, 201L), (2L, 202L), (2L, 203L)))
    // And the full query agrees with a rank() window recompute.
    val out = run("top_orders_per_customer_ties")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_totalprice").desc)
    val viaWindow = Sources.orders(spark, sfDir)
      .withColumn("rk", rank().over(w)).filter(col("rk") <= 3)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(out === viaWindow)
  }

  test("gap islands: streak segmentation agrees with a brute-force per-user scan") {
    val out = run("events_user_streaks").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val days = Sources.events(spark, sfDir)
      .select(col("user_id"), expr("ts DIV 86400000000000").as("d")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    for ((u, ds) <- days) {
      val streaks = ds.foldLeft(Vector.empty[Long]) { (acc, d) =>
        if (acc.isEmpty || dPrev(ds, d) != d - 1) acc :+ 1L
        else acc.init :+ (acc.last + 1)
      }
      assert(out(u) === ((streaks.length.toLong, streaks.max, ds.length.toLong)),
        s"user $u: engine ${out(u)} vs brute ${(streaks.length, streaks.max, ds.length)}")
    }
  }

  private def dPrev(ds: Vector[Long], d: Long): Long = {
    val i = ds.indexOf(d)
    if (i <= 0) Long.MinValue else ds(i - 1)
  }

  test("histogram: buckets partition all values and respect bucket boundaries") {
    val out = run("events_value_histogram").collect()
    val total = Sources.events(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n_values")).sum === total)
    assert(out.map(_.getAs[Long]("bucket")).forall(b => b >= 0 && b <= 15))
    // bucket_min/max nest inside each bucket's neighbors' ranges.
    val sorted = out.sortBy(_.getAs[Long]("bucket"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("bucket_max") <= b.getAs[Double]("bucket_min"))
      case _ =>
    }
  }

  test("correlation: exact-moment corr lies in [-1,1] and tracks the built-in") {
    val out = run("events_type_value_corr").collect()
    assert(out.length === 5)
    for (r <- out) {
      val c = r.getAs[Double]("corr_xy")
      assert(!c.isNaN && math.abs(c) <= 1.0 + 1e-12)
    }
    // The built-in double-summing corr agrees up to the 1e-2 value
    // quantization (scale-invariance makes the quantized corr the same
    // statistic; the residual is the rounding jitter on x).
    val builtin = Sources.events(spark, sfDir)
      .select(col("event_type"), col("value").as("x"),
        expr("(ts DIV 3600000000000) % 24").cast("double").as("y"))
      .groupBy("event_type").agg(corr(col("x"), col("y")).as("c"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("c")).toMap
    for (r <- out)
      assert(math.abs(r.getAs[Double]("corr_xy") - builtin(r.getString(0))) < 1e-4)
  }

  test("intersect equals the distinct semi-join recompute") {
    val out = run("events_users_intersect").collect().map(_.getLong(0)).toSeq
    val ev = Sources.events(spark, sfDir)
    val expected = ev.filter(col("event_type") === "click").select("user_id").distinct()
      .join(ev.filter(col("event_type") === "purchase").select("user_id").distinct(),
        Seq("user_id"), "left_semi")
      .orderBy("user_id").collect().map(_.getLong(0)).toSeq
    assert(out === expected)
  }

  test("z-order: every coarse tile bounds a <=16x16 rectangle and partitions the data") {
    val out = run("events_zorder").cache()
    val spans = out.select(
      max(col("max_x") - col("min_x")).as("xspan"),
      max(col("max_y") - col("min_y")).as("yspan"),
      sum(col("n_rows")).as("n")).collect()(0)
    assert(spans.getAs[Long]("xspan") < 16, "a z>>8 tile spans 16 x-values at most")
    assert(spans.getAs[Long]("yspan") < 16, "a z>>8 tile spans 16 y-values at most")
    assert(spans.getAs[Long]("n") === Sources.events(spark, sfDir).count())
    assert(out.count() > 1, "the tiling must actually split the plane")
    out.unpersist()
  }
}
