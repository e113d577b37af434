package graft

import org.apache.spark.sql.functions._

/** Adaptive Query Execution — the runtime re-planning SCALE.md leans on
  * (partition coalescing for shuffle tails, skew-join splitting). This
  * pins that AQE is actually active in the engine's sessions and that
  * its coalescing collapses near-empty post-shuffle partitions, so the
  * "size shuffle.partitions for the big queries, let AQE fix the small
  * ones" guidance holds.
  */
class AqeSpec extends SparkSpec {

  test("AQE is on and coalesces a tiny aggregation's post-shuffle partitions") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
      "Spark 4 defaults AQE on; the engine's sessions must not disable it")
    val df = Sources.events(spark, sfDir)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    val rows = df.collect()
    assert(rows.length == 5)
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("AQEShuffleRead") && finalPlan.contains("coalesced"),
      s"expected AQE to coalesce the 5-group shuffle below " +
        s"${spark.conf.get("spark.sql.shuffle.partitions")} partitions:\n$finalPlan")
  }

  test("AQE splits a skewed sort-merge join partition at runtime, results unchanged") {
    import spark.implicits._
    // One viral key (0) carrying ~50k padded rows vs 100 cold keys: the
    // hash partition holding key 0 dwarfs the median. This is the skew
    // shape salting guards against — here we pin that AQE's runtime
    // skew-join split ALSO handles it when no salt was applied (the
    // lastline defense SCALE.md's skew section leans on at 100 TB).
    val fact = spark.range(0, 50000)
      .select(
        when($"id" < 45000, lit(0L)).otherwise($"id" % 100 + 1).as("k"),
        concat(lit("x"), lpad($"id".cast("string"), 200, "0")).as("pad"))
    val dim = spark.range(0, 101).select($"id".as("k"), ($"id" * 7).as("v"))
    val confs = Seq(
      // force a shuffle join (never broadcast), make skew detection
      // fire at fixture scale
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // collect() (not count()) so THIS queryExecution runs and carries
      // the final adaptive plan — and the padded column must survive to
      // the output, or column pruning would shrink the shuffle and
      // dissolve the skew being tested.
      val joined = fact.join(dim, "k")
      val n = joined.collect().length
      assert(n == 50000, "every fact row matches exactly one dim row")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join split:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("join strategy hints are honored and all strategies agree") {
    val ev = Sources.events(spark, sfDir)
      .select(col("user_id"), col("event_id"))
    val dim = Sources.events(spark, sfDir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    def run(hint: String) = {
      val j = ev.join(dim.hint(hint), "user_id")
      val c = j.count()
      (c, j.queryExecution.executedPlan.toString)
    }
    val (cB, pB) = run("BROADCAST")
    val (cH, pH) = run("SHUFFLE_HASH")
    val (cM, pM) = run("MERGE")
    assert(pB.contains("BroadcastHashJoin"), pB)
    assert(pH.contains("ShuffledHashJoin"), pH)
    assert(pM.contains("SortMergeJoin"), pM)
    assert(cB == cH && cH == cM)
  }
}
