package graft

import org.apache.spark.sql.functions._

/** Count-Min sketch aggregate ([[graft.functions.CmsAgg]]): the
  * partition-merged grid must equal a single-partition build (merge =
  * element-wise add), estimates must NEVER undercount (the one-sided CMS
  * guarantee that survives any collision pattern), and with width far
  * above the key cardinality the estimates are exactly the true counts
  * (singleton buckets). Also pins the SQL registration via
  * GraftExtensions. */
class CmsSpec extends SparkSpec {

  private val depth = 4

  /** (word, n) fixture with known skewed counts: w1×1, w2×2, … wk×k. */
  private def fixture(k: Int, parts: Int) = {
    import spark.implicits._
    (1 to k).flatMap(i => Seq.fill(i)(s"w$i")).toDF("w").repartition(parts)
  }

  private def estimates(cmsDf: org.apache.spark.sql.DataFrame, width: Int,
                        words: org.apache.spark.sql.DataFrame) = {
    val ests = (0 until depth).map { j =>
      val bkt = conv(substring(md5(
        concat(lit(s"$j:"), col("w")).cast("binary")), 1, 8), 16, 10)
        .cast("long") % width
      element_at(col("cms"), ((lit(j * width) + bkt).cast("int")) + 1)
    }
    words.crossJoin(broadcast(cmsDf)).withColumn("est", least(ests: _*))
  }

  test("cms_agg merges across partitions and never undercounts") {
    val k = 40
    val exact = fixture(k, 7).groupBy("w").agg(count(lit(1)).as("n"))
    // Narrow sketch (width 16 << 40 keys): collisions guaranteed, the
    // one-sided bound is what must hold.
    val cms16 = fixture(k, 7).agg(expr("cms_agg(w, 4, 16)").as("cms"))
    val rows = estimates(cms16, 16, exact).collect()
    assert(rows.length == k)
    assert(rows.forall(r => r.getAs[Long]("est") >= r.getAs[Long]("n")),
      "CMS estimate undercounted a key")
    // Total mass per sketch row = total item count (every occurrence
    // increments exactly one cell per row).
    val grid = cms16.head.getSeq[Long](0)
    val total = (1 to k).map(_.toLong).sum
    (0 until depth).foreach { j =>
      assert(grid.slice(j * 16, (j + 1) * 16).sum == total,
        s"row $j mass != item count")
    }
  }

  test("cms_agg is exact when width clears the key cardinality (and matches a 1-partition build)") {
    val k = 20
    val exact = fixture(k, 5).groupBy("w").agg(count(lit(1)).as("n"))
    val wide = fixture(k, 5).agg(expr("cms_agg(w, 4, 4096)").as("cms"))
    val one = fixture(k, 1).agg(expr("cms_agg(w, 4, 4096)").as("cms"))
    assert(wide.head.getSeq[Long](0) == one.head.getSeq[Long](0),
      "partition-merged grid differs from the single-partition build")
    // 20 keys into 4096 buckets: overwhelmingly singleton cells; with 4
    // independent rows the min-of-rows estimate is exact for every key.
    val rows = estimates(wide, 4096, exact).collect()
    assert(rows.forall(r => r.getAs[Long]("est") == r.getAs[Long]("n")),
      "wide-sketch estimate drifted from the exact count")
  }

  test("sketch algebra: per-language sketches sum element-wise to the corpus sketch") {
    // The property that makes STORED sketch rollups valid: a sketch per
    // stratum (here: language), element-wise added, IS the corpus sketch
    // — so a pipeline can keep per-source/per-day CMS artifacts and
    // answer corpus-wide frequency questions by merging grids, never
    // rescanning text. (Counter grids are linear; same algebra as the
    // bitmap rollup's OR and HLL's max.)
    val words = Sources.documents(spark, sfDir)
      .select(col("lang"),
        explode(split(util.Norm.normalize(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
    val perLang = words.groupBy("lang").agg(expr("cms_agg(w, 4, 64)").as("cms"))
      .collect().map(_.getSeq[Long](1))
    assert(perLang.length > 1, "fixture must have multiple languages")
    val summed = perLang.reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
    val global = words.agg(expr("cms_agg(w, 4, 64)").as("cms"))
      .head.getSeq[Long](0)
    assert(summed == global, "per-stratum grids must sum to the corpus grid")
  }

  test("text_cms_freq: top-20 exact words with in-bound estimates") {
    val df = SparkEntry.queries("text_cms_freq")(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 20)
    // assert_true inside the query already enforces est >= exact; re-check
    // the relation made it to the output.
    assert(rows.forall(r => r.getAs[Long]("n_est") >= r.getAs[Long]("n_exact")))
  }
}
