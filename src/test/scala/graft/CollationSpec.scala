package graft

import org.apache.spark.sql.functions._

/** String COLLATIONS (Spark 4) — comparison semantics as a column
  * property instead of expression-level lower() wrapping. The classic
  * trap they fix: `lower(a) = lower(b)` defeats predicate pushdown and
  * file skipping on the raw column, while a collated column keeps the
  * value bytes intact (display unchanged) and moves the comparison rule
  * into the type. These pin equality, grouping, and join semantics
  * under UTF8_LCASE against their lower()-rewrite equivalents.
  */
class CollationSpec extends SparkSpec {
  import spark.implicits._

  private val mixed = Seq("Click", "CLICK", "click", "View", "view", "scroll")

  test("collated equality ignores case; binary equality does not") {
    val df = mixed.toDF("s")
    val ci = df.filter(col("s").cast("string collate UTF8_LCASE") === "click")
    assert(ci.count() == 3)
    assert(df.filter(col("s") === "click").count() == 1)
  }

  test("groupBy under UTF8_LCASE merges case variants, keeps bytes intact") {
    val df = mixed.toDF("s")
      .select(col("s").cast("string collate UTF8_LCASE").as("s"))
    val groups = df.groupBy("s").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0).toLowerCase -> r.getLong(1)).toMap
    assert(groups == Map("click" -> 3L, "view" -> 2L, "scroll" -> 1L))
    // The stored values are untouched — only comparison changed.
    val kept = df.collect().map(_.getString(0)).toSet
    assert(kept == mixed.toSet)
  }

  test("a collated join matches across case without lower() rewrites") {
    val dim = Seq(("CLICK", 1), ("VIEW", 2)).toDF("t", "weight")
      .select(col("t").cast("string collate UTF8_LCASE").as("t"), col("weight"))
    val fact = Sources.events(spark, sfDir)
      .select(col("event_id"),
        col("event_type").cast("string collate UTF8_LCASE").as("event_type"))
    val joined = fact.join(broadcast(dim), col("event_type") === col("t"))
    val direct = Sources.events(spark, sfDir)
      .filter(lower(col("event_type")).isin("click", "view")).count()
    assert(joined.count() == direct && direct > 0)
  }
}
