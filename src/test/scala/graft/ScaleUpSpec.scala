package graft

import org.apache.spark.sql.functions._

/** [[graft.util.ScaleUp]] replication invariants — the fixture builder
  * must grow the corpus without changing its character. */
class ScaleUpSpec extends SparkSpec {
  import graft.util.ScaleUp

  test("documentsScaled: ids disjoint, vocabulary preserved, shingles changed") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven")).toDF("doc_id", "text")
    val scaled = ScaleUp.documentsScaled(docs, 3).cache()
    assert(scaled.count() == 6)
    assert(scaled.select("doc_id").distinct().count() == 6)
    // Replica 0 verbatim; replicas >0 same word MULTISET, different order.
    val byBase = scaled
      .withColumn("base", col("doc_id") % ScaleUp.DocOffset)
      .withColumn("words", array_sort(split(col("text"), " ")))
      .groupBy("base")
      .agg(countDistinct(col("words")).as("n_word_sets"),
        countDistinct(col("text")).as("n_texts"))
      .collect()
    byBase.foreach { r =>
      assert(r.getLong(1) == 1L, "word multiset must be preserved")
      assert(r.getLong(2) == 3L, "every replica's word ORDER must differ")
    }
    scaled.unpersist()
  }

  test("id-space guards fail loudly when a source id would collide replica spaces") {
    import spark.implicits._
    val tooBig = Seq((ScaleUp.DocOffset + 5L, "a b c")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      ScaleUp.documentsScaled(tooBig, 2).count()
    }
    assert(e.getMessage.contains("collide"), e.getMessage)
    val vecBig = Seq((ScaleUp.VecOffset, Array(1.0f), "x"))
      .toDF("vec_id", "embedding", "label")
    val e2 = intercept[Exception] { ScaleUp.embeddingsScaled(vecBig, 2).count() }
    assert(e2.getMessage.contains("collide"), e2.getMessage)
  }

  test("embeddingsScaled: rotation never degenerates to identity, any factor") {
    import spark.implicits._
    val emb = Seq((1L, Seq(1.0f, 2.0f, 3.0f), 0)).toDF("vec_id", "embedding", "label")
    // factor 5 > dim 3: raw rotation r=3 would be the identity and r=4
    // a negative-length slice.
    val scaled = ScaleUp.embeddingsScaled(emb, 5).cache()
    val vecs = scaled.orderBy("vec_id")
      .select("embedding").as[Seq[Float]].collect()
    assert(vecs.length == 5)
    assert(vecs.forall(_.sorted.toSeq == Seq(1.0f, 2.0f, 3.0f)),
      "rotation must preserve the element multiset")
    assert(vecs.tail.forall(_ != vecs.head),
      s"replica vector equals the original: ${vecs.mkString(";")}")
    scaled.unpersist()
  }

  test("embeddingsScaled: 1-dim vectors survive (identity, never NULL)") {
    import spark.implicits._
    val emb = Seq((1L, Seq(7.0f), 0)).toDF("vec_id", "embedding", "label")
    val vecs = ScaleUp.embeddingsScaled(emb, 3)
      .select("embedding").as[Seq[Float]].collect()
    assert(vecs.length == 3 && vecs.forall(_ == Seq(7.0f)),
      s"1-dim rotation must be the identity, got ${vecs.mkString(";")}")
  }

  test("eventsScaled: user spaces disjoint, timestamps verbatim, guard fires") {
    import spark.implicits._
    val ev = Seq((0L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
      5L, "click", 1.5, "{}"),
      (1L, java.sql.Timestamp.valueOf("2024-01-02 11:00:00"),
        7L, "view", 2.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val scaled = ScaleUp.eventsScaled(ev, 3).cache()
    assert(scaled.count() == 6)
    assert(scaled.select("event_id").distinct().count() == 6)
    assert(scaled.select("user_id").distinct().count() == 6,
      "per-replica user spaces must be disjoint")
    // Same time span: timestamps replicate verbatim (K× volume/day).
    assert(scaled.select("ts").distinct().count() == 2)
    assert(scaled.groupBy("ts").count().select("count")
      .as[Long].collect().forall(_ == 3L))
    scaled.unpersist()
    val bad = Seq((ScaleUp.EventOffset, java.sql.Timestamp.valueOf(
      "2024-01-01 10:00:00"), 5L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val e = intercept[Exception] { ScaleUp.eventsScaled(bad, 2).count() }
    assert(e.getMessage.contains("collide"), e.getMessage)
  }

  test("SQL band-key generator rejects non-dividing banding like the Spark twin") {
    intercept[IllegalArgumentException] {
      graft.dedup.Dedup.bandKeysSql("sig", numHashes = 32, numBands = 5)
    }
  }
}
