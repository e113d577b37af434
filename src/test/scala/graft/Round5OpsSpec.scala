package graft

import org.apache.spark.sql.functions._

/** Specs for the round-5 additions: span-level chunk dedup, the multi-way
  * revenue join, word-distribution entropy, and incremental aggregation
  * against stored partial state. Each is exercised through its public
  * `SparkEntry.queries` entry against structural invariants a DuckDB
  * hash-match alone would not explain.
  */
class Round5OpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("chunk dedup: exact-dup docs lose every chunk; unique docs keep full text") {
    val out = run("docs_chunk_dedup").cache()
    val base = dedup.Dedup.augmented(Sources.documents(spark, sfDir))
    assert(out.count() === base.count())
    // An injected exact dup (+ExactOffset) normalizes to the same word
    // stream as its base, so EVERY chunk of both docs has df >= 2.
    val exactIds = base.filter(col("doc_id") >= dedup.Dedup.ExactOffset)
      .select((col("doc_id") - dedup.Dedup.ExactOffset).as("doc_id"))
    val fullStrip = out.join(exactIds, "doc_id")
    assert(fullStrip.count() > 0)
    assert(fullStrip.filter(col("n_dup_chunks") =!= col("n_chunks")).count() === 0)
    // All-dup docs reassemble to the empty string — md5('') on both sides.
    val emptyMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(Array.emptyByteArray).map("%02x".format(_)).mkString
    assert(fullStrip.filter(col("kept_md5") =!= emptyMd5).count() === 0)
    // A doc with zero dup chunks reassembles to its full normalized text.
    val clean = out.filter(col("n_dup_chunks") === 0)
      .join(base.select(col("doc_id"),
        md5(util.Norm.normalize(col("text")).cast("binary")).as("full_md5")), "doc_id")
    assert(clean.count() > 0)
    assert(clean.filter(col("kept_md5") =!= col("full_md5")).count() === 0)
    out.unpersist()
  }

  test("chunk dedup: chunk count is ceil(words/10)") {
    val out = run("docs_chunk_dedup")
    val expected = dedup.Dedup.augmented(Sources.documents(spark, sfDir))
      .select(col("doc_id"),
        size(filter(split(util.Norm.normalize(col("text")), " "),
          w => w =!= "")).as("nw"))
      .withColumn("exp_chunks", greatest(ceil(col("nw") / 10.0).cast("long"), lit(1L)))
    assert(out.join(expected, "doc_id")
      .filter(col("n_chunks") =!= col("exp_chunks")).count() === 0)
  }

  test("customer revenue: top-50 is revenue-descending and matches a windowless recompute") {
    val out = run("orders_customer_revenue").cache()
    assert(out.count() === 50)
    val revs = out.orderBy(col("revenue").desc, col("c_custkey"))
      .select("revenue").collect().map(_.getDouble(0))
    assert(revs.sameElements(revs.sortBy(-_)), "not sorted by revenue desc")
    // Independent recompute without the pre-aggregation-before-dimension
    // structure: join everything first, aggregate once.
    val l = Sources.lineitem(spark, sfDir)
    val o = Sources.orders(spark, sfDir)
    val c = Sources.customer(spark, sfDir)
    val n = Sources.nation(spark, sfDir)
    val direct = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .groupBy(c("c_custkey"), c("c_name"), n("n_name"))
      .agg(countDistinct(o("o_orderkey")).as("n_orders"),
        util.Stable.exactSum(l("l_extendedprice") * (lit(1.0) - l("l_discount")))
          .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey")).limit(50)
    assert(out.except(direct).count() === 0)
    assert(direct.except(out).count() === 0)
    out.unpersist()
  }

  test("word entropy: zero for constant docs, ln(n) for all-distinct docs, bounded by ln(n_distinct)") {
    val out = run("text_word_entropy").cache()
    assert(out.filter(col("entropy") < -1e-9).count() === 0)
    // H <= ln(n_distinct) + quantization slack.
    assert(out.filter(
      col("entropy") > log(col("n_distinct_words").cast("double")) + 1e-3)
      .count() === 0)
    // All-distinct docs: every count is 1, so H collapses to exactly
    // floor(ln(n)*1e4+0.5)/1e4 — check bit-exact against the formula.
    val allDistinct = out.filter(col("n_distinct_words") === col("n_words"))
      .select("n_words", "entropy").collect()
    allDistinct.foreach { r =>
      val n = r.getLong(0)
      val expected = math.floor(math.log(n.toDouble) * 1e4 + 0.5) / (n * 1e4) * n
      assert(r.getDouble(1) === expected)
    }
    out.unpersist()
  }

  test("incremental agg: merge(state, batch) equals the full recompute exactly") {
    val out = run("events_incremental_agg").cache()
    val direct = Sources.events(spark, sfDir)
      .select(expr("ts DIV 86400000000000").as("day_idx"), col("event_type"), col("value"))
      .groupBy("day_idx", "event_type").agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(util.Stable.MoneyDec)).cast("double").as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
    assert(out.count() === direct.count())
    assert(out.except(direct).count() === 0)
    assert(direct.except(out).count() === 0)
    // The stored state is a genuine parquet artifact with DECIMAL sums
    // (re-mergeable without precision loss).
    val statePath = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "graft_agg_state").toString
    val state = spark.read.parquet(statePath)
    assert(state.schema("sum_dec").dataType === util.Stable.MoneyDec)
    assert(state.count() > 0)
    out.unpersist()
  }
}
