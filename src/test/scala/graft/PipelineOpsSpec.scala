package graft

import org.apache.spark.sql.functions._

/** Specs for the round-4 training-data pipeline additions: unigram-LM
  * scoring, incremental dedup, deterministic split, top n-grams. Each is
  * exercised through its public `SparkEntry.queries` entry (the product
  * surface the driver verifies) against structural invariants a DuckDB
  * hash-match alone would not explain.
  */
class PipelineOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("unigram logprob: scores are positive, bounded by ln(corpus), and rare-heavy docs score higher") {
    val docs = Sources.documents(spark, sfDir)
    val nTotal = docs
      .select(explode(split(util.Norm.normalize(col("text")), " ")).as("w"))
      .filter(col("w") =!= "").count()
    val out = run("text_unigram_logprob")
    assert(out.count() === docs.filter(trim(col("text")) =!= "").count())
    // -ln(p) per word lies in (0, ln(n_total)]; the quantized per-doc
    // average inherits the bound (+1 ulp of quantization slack).
    val bound = math.log(nTotal.toDouble) + 1e-3
    assert(out.filter(col("avg_neg_logprob") <= 0 ||
      col("avg_neg_logprob") > bound).count() === 0)
    // A doc of singleton words must out-score a doc of the corpus's most
    // common word: check the extremes exist and order sensibly.
    val mm = out.agg(min("avg_neg_logprob"), max("avg_neg_logprob")).head
    assert(mm.getDouble(0) < mm.getDouble(1))
  }

  test("incremental dedup: survivors are batch-side, index-unseen, and hash-unique") {
    val out = run("dedup_incremental").cache()
    // Every survivor is from the incoming batch slice.
    assert(out.filter(col("doc_id") % 10 =!= 0).count() === 0)
    // One survivor per content hash.
    assert(out.groupBy("h").count().filter(col("count") > 1).count() === 0)
    // No survivor's hash exists in the already-ingested side — the
    // defining property of the ingest path.
    val docs = dedup.Dedup.augmented(Sources.documents(spark, sfDir))
      .withColumn("h", md5(util.Norm.normalize(col("text")).cast("binary")))
    val leaked = out.select("h")
      .join(docs.filter(col("doc_id") % 10 =!= 0).select("h"), "h")
    assert(leaked.count() === 0)
    // The augmented corpus plants exact copies across the % 10 boundary,
    // so the anti-join must actually drop something.
    val incoming = docs.filter(col("doc_id") % 10 === 0)
    assert(out.count() < incoming.count())
    out.unpersist()
  }

  test("docs split: partitions the corpus, is deterministic, and lands near 75/12.5/12.5") {
    val out = run("docs_split").cache()
    val total = Sources.documents(spark, sfDir).count()
    assert(out.agg(sum("n_docs")).head.getLong(0) === total)
    val bySplit = out.groupBy("split").agg(sum("n_docs").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    // 12/2/2 hex nibbles ≈ 75/12.5/12.5; allow wide slack at tiny SF.
    val train = bySplit("train").toDouble / total
    assert(train > 0.6 && train < 0.9, s"train fraction $train")
    // Pure function of doc_id: a re-run yields identical rows.
    val again = run("docs_split")
    assert(out.except(again).count() === 0 && again.except(out).count() === 0)
    out.unpersist()
  }

  test("survivors: one per cluster, cluster member, max quality (doc_id tiebreak)") {
    val out = run("dedup_survivors").cache()
    // Recompute clusters + quality independently of the query wiring.
    val docs = dedup.Dedup.augmented(Sources.documents(spark, sfDir))
    val pairs = dedup.Dedup.jaccardPairs(docs, "doc_id", "text", 0.6,
      maxDocFreq = Some(10L))
    val clusters = dedup.Dedup.clusters(docs, "doc_id", pairs).cache()
    val quality = text.TextAnalysis.qualityScore(docs, "doc_id", "text")
    // Exactly one survivor per cluster.
    assert(out.count() === clusters.select("cluster_id").distinct().count())
    // The survivor belongs to its cluster.
    assert(out.join(clusters, Seq("doc_id", "cluster_id"), "left_anti").count() === 0)
    // No cluster member strictly beats its survivor on (quality, -id).
    val better = clusters.join(quality.select(col("doc_id"), col("quality_score")), "doc_id")
      .as("m")
      .join(out.as("s"), col("m.cluster_id") === col("s.cluster_id"))
      .filter(col("m.quality_score") > col("s.quality_score") ||
        (col("m.quality_score") === col("s.quality_score") &&
          col("m.doc_id") < col("s.doc_id")))
    assert(better.count() === 0)
    clusters.unpersist(); out.unpersist()
  }

  test("quality gate: keep agrees with signals, fail_reason is the first failing rule") {
    val out = run("docs_quality_gate").cache()
    assert(out.count() === Sources.documents(spark, sfDir).count())
    // keep=1 ⇔ no fail_reason; keep=0 ⇔ some reason.
    assert(out.filter(col("keep") === 1 && col("fail_reason").isNotNull).count() === 0)
    assert(out.filter(col("keep") === 0 && col("fail_reason").isNull).count() === 0)
    // Every reason is consistent with the signal it names.
    assert(out.filter(col("fail_reason") === "too_short" && col("n_words") >= 20)
      .count() === 0)
    assert(out.filter(col("fail_reason") === "lang_unknown" && col("lang_id") =!= "und")
      .count() === 0)
    assert(out.filter(col("fail_reason") === "repetitive" && col("top_word_ratio") <= 0.2)
      .count() === 0)
    assert(out.filter(col("fail_reason") === "low_quality" && col("quality_score") >= 0.55)
      .count() === 0)
    // The gate must actually gate on this corpus: both verdicts present.
    assert(out.filter(col("keep") === 1).count() > 0)
    assert(out.filter(col("keep") === 0).count() > 0)
    out.unpersist()
  }

  test("gateSignals equals the joined langId × qualityScore outputs") {
    val docs = Sources.documents(spark, sfDir)
    val fused = text.TextAnalysis.gateSignals(docs, "doc_id", "text")
    val joined = text.TextAnalysis.qualityScore(docs, "doc_id", "text")
      .select(col("doc_id"), col("n_words"), col("quality_score"))
      .join(text.TextAnalysis.langId(docs, "doc_id", "text")
        .select(col("doc_id"), col("lang_id")), "doc_id")
      .select("doc_id", "n_words", "quality_score", "lang_id")
    assert(fused.except(joined).count() === 0 && joined.except(fused).count() === 0)
  }

  test("rebalance: every stratum lands near the smallest stratum's size, deterministically") {
    val out = run("docs_rebalance").cache()
    val rows = out.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val target = rows.map(_._2).min
    // n_after never exceeds n_before, and expectation-tracks the target:
    // binomial(n_before, ~target/n_before) stays within 5 sigma of target.
    rows.foreach { case (lang, before, after) =>
      assert(after <= before, s"$lang kept more than it had")
      val sd = math.sqrt(target.toDouble) // p small → sd ≈ sqrt(target)
      assert(math.abs(after - target) <= math.max(5 * sd, 5.0),
        s"$lang: kept $after, target $target")
    }
    // The smallest stratum keeps (nearly) everything: threshold = 1e6.
    val smallest = rows.minBy(_._2)
    assert(smallest._3 === smallest._2)
    // Pure function of ids: re-run identical.
    val again = run("docs_rebalance")
    assert(out.except(again).count() === 0 && again.except(out).count() === 0)
    out.unpersist()
  }

  test("label centroids: one row per (label, dim), mean within quantization of a direct average") {
    val emb = Sources.embeddings(spark, sfDir)
    val out = run("emb_label_centroids").cache()
    val nLabels = emb.select("label").distinct().count()
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    assert(out.count() === nLabels * dim)
    // Spot-check one cell against a driver-side exact mean.
    val r0 = out.filter(col("label") === out.head.getAs[Int]("label") &&
      col("dim_idx") === 0).head
    val vals = emb.filter(col("label") === r0.getAs[Int]("label"))
      .select(col("embedding").getItem(0)).collect().map(_.getFloat(0).toDouble)
    val direct = vals.sum / vals.length
    assert(math.abs(r0.getAs[Double]("centroid") - direct) < 1e-7,
      s"centroid ${r0.getAs[Double]("centroid")} vs direct $direct")
    out.unpersist()
  }

  test("retention: offset-0 equals cohort size and the triangle sums to all user-days") {
    val out = run("events_retention").cache()
    assert(out.filter(col("day_offset") < 0).count() === 0)
    // Sum over the triangle = |distinct (user, day)| pairs.
    val userDays = Sources.events(spark, sfDir)
      .select(col("user_id"), expr("ts DIV 86400000000000")).distinct().count()
    assert(out.agg(sum("n_users")).head.getLong(0) === userDays)
    // Every user appears in their cohort's offset-0 cell.
    val nUsers = Sources.events(spark, sfDir).select("user_id").distinct().count()
    assert(out.filter(col("day_offset") === 0).agg(sum("n_users")).head.getLong(0) === nUsers)
    out.unpersist()
  }

  test("rolling 7-day actives: bounded by total users, at least the daily actives, exact on a window") {
    val out = run("events_rolling_active").cache()
    val events = Sources.events(spark, sfDir)
      .select(col("user_id"), expr("ts DIV 86400000000000").as("day_idx")).cache()
    val nUsers = events.select("user_id").distinct().count()
    assert(out.filter(col("n_active_7d") > nUsers).count() === 0)
    // Rolling-7 ≥ the single-day distinct count for every day.
    val daily = events.distinct().groupBy("day_idx").agg(count(lit(1)).as("d"))
    assert(out.join(daily, col("w_day") === col("day_idx"))
      .filter(col("n_active_7d") < col("d")).count() === 0)
    // Exact check on one day: users with activity in [day-6, day].
    val someDay = out.orderBy(col("w_day").desc).head.getAs[Long]("w_day")
    val direct = events.filter(col("day_idx") >= someDay - 6 && col("day_idx") <= someDay)
      .select("user_id").distinct().count()
    assert(out.filter(col("w_day") === someDay).head.getAs[Long]("n_active_7d") === direct)
    events.unpersist(); out.unpersist()
  }

  test("latest-state compaction: one row per key, the true max, via the bounded-heap operator") {
    val out = SparkEntry.queries("events_latest_state")(spark, sfDir).cache()
    assert(out.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count() === 0)
    val maxes = Sources.events(spark, sfDir)
      .groupBy("user_id", "event_type")
      .agg(max(expr("ts DIV 1000")).as("m"))
    assert(out.join(maxes, Seq("user_id", "event_type"))
      .filter(col("ts_us") =!= col("m")).count() === 0)
    assert(out.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    out.unpersist()
  }

  test("salted join equals the plain join and salts on the join key") {
    val out = run("events_salted_join")
    val ev = Sources.events(spark, sfDir)
    val dim = ev.groupBy("user_id").agg(countDistinct(col("event_type")).as("n_types"))
    val plain = ev.select("user_id", "value").join(dim, "user_id")
      .groupBy("user_id", "n_types")
      .agg(util.Stable.exactSum(col("value")).as("sum_value"),
        count(lit(1)).as("n_events"))
    assert(out.except(plain).count() === 0 && plain.except(out).count() === 0)
    // The physical join really carries the salt: both join sides expose it.
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("salt"), "salt column eliminated from the join")
  }

  test("funnel: stage counts are monotone and stage 1 matches the signup cohort") {
    val r = run("events_funnel").head
    val (n1, n2, n3) = (r.getAs[Long]("n_signup"),
      r.getAs[Long]("n_click_after"), r.getAs[Long]("n_purchase_after"))
    assert(n1 >= n2 && n2 >= n3 && n3 >= 0)
    val signups = Sources.events(spark, sfDir)
      .filter(col("event_type") === "signup").select("user_id").distinct().count()
    assert(n1 === signups)
    // The fixture's 30-day stream must actually convert someone.
    assert(n3 > 0)
  }

  test("pack assemble: shard set and token totals agree with the assignment view") {
    val shards = run("docs_pack_shards").cache()
    val out = run("docs_pack_assemble").cache()
    assert(out.count() ===
      shards.select("bucket", "shard_idx").distinct().count())
    assert(out.agg(sum("sum_tokens")).head.getLong(0) ===
      shards.agg(sum("n_tokens")).head.getLong(0))
    // Payloads are real and distinct (md5 of distinct doc sequences).
    assert(out.select("payload_md5").distinct().count() === out.count())
    shards.unpersist(); out.unpersist()
  }

  test("e2e pipeline: stage counts contract monotonically and every stage bites") {
    val r = run("docs_pipeline_e2e").head
    val (raw, kept, unique, tokens, shards) = (r.getAs[Long]("n_raw"),
      r.getAs[Long]("n_kept"), r.getAs[Long]("n_unique"),
      r.getAs[Long]("sum_tokens"), r.getAs[Long]("n_shards"))
    assert(raw > kept, "gate dropped nothing")
    assert(kept > unique, "dedup dropped nothing (augmented copies should collapse)")
    assert(unique > 0 && tokens > 0 && shards > 0)
    // The augmented corpus strictly grows the raw one (selective 1/11,
    // 1/5, 1/7 dup-injection slices).
    assert(raw > Sources.documents(spark, sfDir).count())
    // Shards hold about budget tokens each: count is near sum/budget + one
    // open shard per bucket (32 buckets).
    assert(shards <= tokens / 2000 + 32 + 1)
  }

  test("pmi bigrams: 20 rows, count floor respected, descending and positive at the top") {
    val out = run("text_pmi_bigrams").collect()
    assert(out.length === 20)
    assert(out.forall(_.getAs[Long]("c12") >= 5))
    val pmis = out.map(_.getAs[Double]("pmi"))
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b })
    // Top collocations co-occur far above independence.
    assert(pmis.head > 0)
  }

  test("sma signals: first day equals its own average and the signal matches the comparison") {
    val out = run("yf_sma_signals").cache()
    import org.apache.spark.sql.expressions.Window
    val first = out.withColumn("rn",
      row_number().over(Window.partitionBy("symbol").orderBy("Date")))
      .filter(col("rn") === 1)
    // A 1-row trailing window IS the day's average → signal must be 0.
    assert(first.filter(col("sma20") =!= col("close_avg")).count() === 0)
    assert(first.filter(col("above_sma") =!= 0).count() === 0)
    // The emitted signal is exactly the comparison, everywhere.
    assert(out.filter((col("close_avg") > col("sma20")).cast("int") =!= col("above_sma"))
      .count() === 0)
    // Both signal states occur on real price data.
    assert(out.filter(col("above_sma") === 1).count() > 0)
    out.unpersist()
  }

  test("row-local topWordRatio equals the batch explode/aggregate form on the corpus") {
    val docs = Sources.documents(spark, sfDir)
    val rowLocal = docs.select(col("doc_id"),
      text.TextAnalysis.topWordRatio(col("text")).as("r"))
    val agg = docs
      .select(col("doc_id"),
        explode(split(util.Norm.normalize(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("doc_id", "word").agg(count(lit(1)).as("n"))
      .groupBy("doc_id").agg((max("n") / sum("n")).as("r"))
    assert(rowLocal.except(agg).count() === 0 && agg.except(rowLocal).count() === 0)
    // Degenerate text: empty → 0.0; single repeated word → 1.0.
    import spark.implicits._
    val edge = Seq((1L, ""), (2L, "spam spam spam"), (3L, "a b"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), text.TextAnalysis.topWordRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(edge(1L) === 0.0 && edge(2L) === 1.0 && edge(3L) === 0.5)
    // Seeded random texts (heavy repeats, case/whitespace noise) vs a
    // driver-side brute force over the SAME normalization.
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "ccc", "the", "data", "x9")
    val cases = (0L until 200L).map { i =>
      val n = rnd.nextInt(12)
      val t = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
        .map(w => if (rnd.nextBoolean()) w.toUpperCase else w)
        .mkString(sep = if (rnd.nextBoolean()) " " else "  ")
      (i, t)
    }
    val got = cases.toDF("doc_id", "text")
      .select(col("doc_id"), text.TextAnalysis.topWordRatio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    cases.foreach { case (i, t) =>
      val ws = t.toLowerCase.trim.split("[ \t\n\f\r]+").filter(_.nonEmpty)
      val expect = if (ws.isEmpty) 0.0
        else ws.groupBy(identity).values.map(_.length).max.toDouble / ws.length
      assert(got(i) === expect, s"doc $i: '$t'")
    }
  }

  test("top ngrams: equals the direct df computation and is ordered") {
    val direct = Sources.documents(spark, sfDir)
      .select(col("doc_id"), explode(dedup.Dedup.shingles(col("text"))).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("ngram")).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val out = run("text_top_ngrams").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === direct.toSeq)
    assert(out.map(-_._2).toSeq === out.map(-_._2).sorted.toSeq)
  }
}
