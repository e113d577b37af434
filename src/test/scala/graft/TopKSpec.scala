package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import plans.TopK

/** The tier-(c) whole-operator extension: logical node → strategy →
  * two-phase physical exec. Equivalence against the window composition,
  * plan shape, and the map-side shuffle bound. */
class TopKSpec extends SparkSpec {

  private lazy val orders = Sources.orders(spark, sfDir)
    .select("o_orderkey", "o_custkey", "o_totalprice")

  private def viaOperator(k: Int) = TopK.perKey(orders,
    Seq("o_custkey"), Seq("o_totalprice" -> false, "o_orderkey" -> true), k)

  test("plans as partial + final TopKPerKeyExec with one Exchange between") {
    val plan = viaOperator(3).queryExecution.executedPlan.toString
    assert("TopKPerKey".r.findAllIn(plan).size >= 2, s"expected 2 execs in:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"),
      s"expected a key exchange in:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Sort "),
      s"must not fall back to window/sort:\n$plan")
  }

  test("equals the window row_number composition, ties broken identically") {
    val k = 3
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
    val got = viaOperator(k)
    assert(got.count() === viaWindow.count())
    assert(got.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(got).isEmpty)
  }

  test("emits each key's rows best-first (no re-sort needed within a key)") {
    val got = viaOperator(3).withColumn("pos", monotonically_increasing_id())
    val w = Window.partitionBy("o_custkey").orderBy(col("pos"))
    // within a key, emission order must be non-increasing by price (the
    // declared sort); an increase means the heap drained worst-first
    val violations = got
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .filter(col("prev_price") < col("o_totalprice"))
    assert(violations.count() === 0)
  }

  test("never emits more than k rows per key; emits all rows for small keys") {
    val got = viaOperator(2).groupBy("o_custkey").count()
    assert(got.filter(col("count") > 2).count() === 0)
    val singletons = orders.groupBy("o_custkey").count().filter(col("count") === 1).count()
    assert(singletons === 0 ||
      viaOperator(2).groupBy("o_custkey").count().filter(col("count") === 1).count() >= singletons)
  }

  test("a low partial flush budget over a high-cardinality key still matches the window oracle") {
    // Force the partial phase to flush constantly: a 2-key budget over
    // o_custkey (hundreds of distinct customers per partition) makes the
    // map-side emit many epochs per key. Correctness must be unaffected —
    // the final phase re-merges all epochs — and emission must stay
    // best-first within each key (the final phase never flushes).
    val k = 3
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
    val conf = plans.TopKPerKeyStrategy.FlushKeysConf
    for (budget <- Seq(1, 2)) {
      spark.conf.set(conf, budget.toString)
      try {
        val got = viaOperator(k)
        assert(got.count() === viaWindow.count(), s"budget=$budget row count")
        assert(got.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(got).isEmpty,
          s"budget=$budget content")
        val pos = viaOperator(k).withColumn("pos", monotonically_increasing_id())
        val wp = Window.partitionBy("o_custkey").orderBy(col("pos"))
        assert(pos.withColumn("prev_price", lag(col("o_totalprice"), 1).over(wp))
          .filter(col("prev_price") < col("o_totalprice")).count() === 0,
          s"budget=$budget emission order")
      } finally spark.conf.unset(conf)
    }
  }

  test("partial-phase metric: measured rows entering the exchange <= k x keys x partitions") {
    // The operator's core scale property, pinned by MEASUREMENT (the
    // numOutputRows SQL metric) rather than indirection: 10 keys spread
    // over 4 partitions, 10k input rows — the partial phase may emit at
    // most k*keys*partitions = 80 rows into the shuffle.
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (p, k, keys, n) = (4, 2, 10, 10000L)
      val df = spark.range(n)
        .select((col("id") % keys).as("key"), col("id").as("v"))
        .repartition(p)
      val top = TopK.perKey(df, Seq("key"), Seq("v" -> false), k)
      assert(top.collect().length === keys * k) // executes THIS plan instance
      val execs = top.queryExecution.executedPlan.collect {
        case t: plans.TopKPerKeyExec => t
      }
      assert(execs.size === 2)
      val partialRows = execs.find(_.partial).get.metrics("numOutputRows").value
      val finalRows = execs.find(!_.partial).get.metrics("numOutputRows").value
      assert(finalRows === keys.toLong * k)
      assert(partialRows <= k.toLong * keys * p,
        s"partial emitted $partialRows > bound ${k * keys * p}")
      assert(partialRows < n,
        s"partial must shrink the shuffle: $partialRows vs $n input rows")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("randomized equivalence: operator == window oracle across shapes (seeded)") {
    // Hash-derived synthetic data (no rand(): retries must see identical
    // values) across cardinality shapes: few hot keys, many sparse keys,
    // ties in the order column, k larger than some groups.
    import spark.implicits._
    val rows = (1 to 3000).map { i =>
      val key = (i * 2654435761L % 97) % (if (i % 2 == 0) 7 else 211)
      val v = (i * 40503L % 1009) % 50 // forces ties on v → tiebreaker matters
      (key, v.toDouble, i.toLong)
    }
    val df = rows.toDF("key", "v", "id").repartition(5)
    for (k <- Seq(1, 4, 40)) {
      val w = Window.partitionBy("key").orderBy(col("v").desc, col("id"))
      val viaWindow = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
      val got = TopK.perKey(df, Seq("key"), Seq("v" -> false, "id" -> true), k)
      assert(got.count() === viaWindow.count(), s"k=$k count")
      assert(got.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(got).isEmpty,
        s"k=$k content")
    }
  }

  test("partial stage bounds the shuffle: k rows per key per input partition") {
    // With the input forced into p partitions, the exchange input is at
    // most k * keys * p rows — verified indirectly: the partial exec's
    // output (= rows entering the exchange) equals the final result when
    // the input is a single partition (partial == final on 1 partition).
    val one = TopK.perKey(orders.coalesce(1),
      Seq("o_custkey"), Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
    assert(one.count() === viaOperator(3).count())
  }
}
