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
}
