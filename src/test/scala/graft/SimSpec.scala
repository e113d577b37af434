package graft

import org.apache.spark.sql.functions._
import sim.Similarity

class SimSpec extends SparkSpec {

  import spark.implicits._

  private lazy val emb = Sources.embeddings(spark, sfDir)
    .select(col("vec_id").as("id"), col("embedding").as("vec")).cache()

  test("cosine: identical vectors score ~1, orthogonal score 0") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 2.0f)),
      (Array(3.0f, 4.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    // raw cast here: vec() additionally guards dimensionality (below)
    val sims = df.select(Similarity.cosine(
      col("a").cast("array<double>"), col("b").cast("array<double>")).as("sim"))
      .collect().map(_.getDouble(0))
    assert(math.abs(sims(0) - 1.0) < 1e-12)
    assert(sims(1) === 0.0)
    assert(math.abs(sims(2) - 1.0) < 1e-12)
  }

  test("vec() fails fast on wrong dimensionality instead of silently nulling") {
    val bad = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "vec")
    val e = intercept[Exception] {
      bad.select(Similarity.vec(col("vec"))).collect()
    }
    assert(e.getMessage.contains("64") ||
      Option(e.getCause).exists(_.getMessage.contains("64")))
  }

  test("bruteTopK: rank 1 of each query is the query itself at sim ~1") {
    val top = Similarity.bruteTopK(emb.filter(col("id") < 5), emb, 10).cache()
    val r1 = top.filter(col("rank") === 1).orderBy("query_id").collect()
    assert(r1.length === 5)
    r1.foreach { r =>
      assert(r.getAs[Long]("query_id") === r.getAs[Long]("vec_id"))
      assert(math.abs(r.getAs[Double]("sim") - 1.0) < 1e-9)
    }
    // exactly k results per query, ranks contiguous
    val perQuery = top.groupBy("query_id").agg(count(lit(1)).as("n"), max("rank").as("mx"))
    assert(perQuery.filter(col("n") =!= 10 || col("mx") =!= 10).count() === 0)
  }

  test("rhpTopK: results are a subset of brute scores with the query itself found") {
    val brute = Similarity.bruteTopK(emb.filter(col("id") < 5), emb, 10)
    val ann = Similarity.rhpTopK(emb.filter(col("id") < 5), emb, 10).cache()
    // the query shares every sketch band with itself → always candidate,
    // always rank 1
    val r1 = ann.filter(col("rank") === 1).collect()
    assert(r1.length === 5 && r1.forall(r =>
      r.getAs[Long]("query_id") === r.getAs[Long]("vec_id")))
    // ANN sims must agree exactly with brute sims on shared (q, v) pairs
    val joined = ann.as("a").join(brute.as("b"),
      $"a.query_id" === $"b.query_id" && $"a.vec_id" === $"b.vec_id")
    assert(joined.filter($"a.sim" =!= $"b.sim").count() === 0)
  }

  test("ivfTopK: query always lands in its own probed bucket; sims agree with brute") {
    val brute = Similarity.bruteTopK(emb.filter(col("id") < 5), emb, 10)
    val ivf = Similarity.ivfTopK(emb.filter(col("id") < 5), emb, 10).cache()
    // the query's own assigned centroid is also its first probe → the
    // query is always among its candidates, at sim ~1 → rank 1
    val r1 = ivf.filter(col("rank") === 1).collect()
    assert(r1.length === 5 && r1.forall(r =>
      r.getAs[Long]("query_id") === r.getAs[Long]("vec_id")))
    val joined = ivf.as("a").join(brute.as("b"),
      $"a.query_id" === $"b.query_id" && $"a.vec_id" === $"b.vec_id")
    assert(joined.filter($"a.sim" =!= $"b.sim").count() === 0)
    // every query yields k results (buckets are big enough at any sf)
    assert(ivf.groupBy("query_id").count().filter(col("count") =!= 10).count() === 0)
  }

  test("cosinePairs finds every rescaled copy at sim ~1") {
    val aug = Similarity.augmented(Sources.embeddings(spark, sfDir))
    val pairs = Similarity.cosinePairs(aug, 0.95).cache()
    val nScaled = emb.filter(col("id") % 10 === 0).count()
    val scaledPairs = pairs.filter(col("id_b") === col("id_a") + Similarity.ScaledOffset && col("id_a") < Similarity.ScaledOffset)
    assert(scaledPairs.count() === nScaled)
    assert(scaledPairs.filter(abs(col("sim") - 1.0) > 1e-9).count() === 0)
  }

  test("all three top-k paths re-rank through TopKPerKeyExec, not a full-shuffle window") {
    // Like BucketSpec's zero-Exchange assert: the plan must carry the
    // custom bounded-heap operator. A Window node MAY remain — it assigns
    // ranks over the operator's ≤ k-per-query output, a bounded input —
    // but the partial/final exec pair has to be what bounds the shuffle.
    val q = emb.filter(col("id") < 5)
    Seq(
      "brute" -> Similarity.bruteTopK(q, emb, 10),
      "rhp" -> Similarity.rhpTopK(q, emb, 10),
      "ivf" -> Similarity.ivfTopK(q, emb, 10)).foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      assert("TopKPerKey".r.findAllIn(plan).size >= 2,
        s"$name must plan partial+final TopKPerKeyExec:\n$plan")
    }
    // IVF routes the centroid argmax and the probe selection through the
    // operator too: 3 perKey calls = 6 execs
    val ivfPlan = Similarity.ivfTopK(q, emb, 10).queryExecution.executedPlan.toString
    assert("TopKPerKey".r.findAllIn(ivfPlan).size >= 6,
      s"ivf must use the operator for argmax + probes + re-rank:\n$ivfPlan")
  }

  test("scale banding profile (64 bits, 8x8) still finds direction-preserved copies") {
    // Queries = the rescaled copies injected by augmented(); each shares
    // EVERY sketch bit with its base vector (sign sketches are scale-
    // invariant), so under any banding profile the base must be the
    // top-1 hit at sim ~1. Run both profiles; the scale profile's
    // 256-value band keys are the corpus-scale setting (default stays
    // the recall-tuned fixture profile — asserted here too).
    assert(Similarity.NumBits === 16 && Similarity.NumBands === 4)
    assert(Similarity.ScaleBits === 64 && Similarity.ScaleBands === 8)
    val aug = Similarity.augmented(Sources.embeddings(spark, sfDir))
    val queries = aug.filter(col("id") >= Similarity.ScaledOffset && col("id") < 2 * Similarity.ScaledOffset)
    val corpus = aug.filter(col("id") < Similarity.ScaledOffset)
    val nQueries = queries.count()
    assert(nQueries > 0)
    for ((bits, bands) <- Seq(
        (Similarity.NumBits, Similarity.NumBands),
        (Similarity.ScaleBits, Similarity.ScaleBands))) {
      val top1 = Similarity.rhpTopK(queries, corpus, 1, bits, bands).cache()
      assert(top1.count() === nQueries, s"profile ${bits}x$bands lost queries")
      val wrong = top1.filter(
        col("vec_id") =!= col("query_id") - Similarity.ScaledOffset ||
          abs(col("sim") - 1.0) > 1e-9)
      assert(wrong.count() === 0, s"profile ${bits}x$bands missed a copy")
      top1.unpersist()
    }
  }

  test("trainCentroids: deterministic full-dim centroids, bounded count") {
    val c1 = Similarity.trainCentroids(emb, 16, iters = 1).orderBy("cent_id").collect()
    val c2 = Similarity.trainCentroids(emb, 16, iters = 1).orderBy("cent_id").collect()
    assert(c1.nonEmpty && c1.length <= 16)
    // exact-decimal sums make the means order-independent → bit-identical
    // across runs (a double avg would drift with partial-agg order)
    assert(c1.map(_.toString).toSeq === c2.map(_.toString).toSeq)
    assert(c1.forall(_.getSeq[Double](1).length === Similarity.VecDim))
    // two iterations also run (Spark-side; the oracle mirrors one)
    assert(Similarity.trainCentroids(emb, 16, iters = 2).collect().nonEmpty)
  }

  test("trained IVF: self-hit at rank 1, recall >= the sampled quantizer's") {
    // 20 queries, not 5: per-query recall on a 500-vector fixture is
    // coarse (10 hits each), and the sampled-vs-trained comparison needs
    // enough queries to measure the quantizer, not one query's luck.
    // Everything here is deterministic (fixed fixture, md5 seed, exact-
    // decimal means), so the recalls are stable run to run.
    val q = emb.filter(col("id") < 20)
    val truth = Similarity.bruteTopK(q, emb, 10)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val sampledRecall = recall(Similarity.ivfTopK(q, emb, 10))
    val cents1 = Similarity.trainCentroids(emb, 16, iters = 1)
    val trained = Similarity.ivfTopKWith(q, emb, 10, cents1).cache()
    // the query's own argmax centroid is also its first probe, trained or
    // not → the query always finds itself
    val r1 = trained.filter(col("rank") === 1).collect()
    assert(r1.length === 20 && r1.forall(r =>
      r.getAs[Long]("query_id") === r.getAs[Long]("vec_id")))
    val trainedRecall = recall(trained)
    assert(trainedRecall >= sampledRecall,
      s"trained recall $trainedRecall < sampled $sampledRecall")
    // a second Lloyd iteration keeps improving (or holds) the quantizer
    val cents2 = Similarity.trainCentroids(emb, 16, iters = 2)
    val trained2Recall = recall(Similarity.ivfTopKWith(q, emb, 10, cents2))
    assert(trained2Recall >= trainedRecall,
      s"iters=2 recall $trained2Recall < iters=1 $trainedRecall")
  }

  test("pqTopK: self-hit at rank 1, k rows per query, sims agree with brute on shared hits") {
    val q = emb.filter(col("id") < 5)
    val pq = Similarity.pqTopK(q, emb, 10).cache()
    // Exactly k rows per query, ranks 1..k.
    val perQuery = pq.groupBy("query_id").count().collect()
    assert(perQuery.forall(_.getLong(1) === 10L))
    assert(pq.filter(col("rank") < 1 || col("rank") > 10).count() === 0)
    // The query vector reconstructs near itself: after exact re-rank the
    // self-hit must be rank 1 at sim ~1 (the rerank window is 20 and the
    // ADC approximation always keeps an exact copy's reconstruction among
    // the top candidates on this fixture).
    val self = pq.filter(col("query_id") === col("vec_id"))
    assert(self.count() === 5)
    assert(self.filter(col("rank") =!= 1).count() === 0)
    assert(self.filter(abs(col("sim") - 1.0) > 1e-9).count() === 0)
    // Where PQ and brute agree on a hit, the exact re-ranked sim is THE
    // exact cosine — identical values, not approximations.
    val brute = Similarity.bruteTopK(q, emb, 10)
      .select(col("query_id"), col("vec_id"), col("sim").as("bsim"))
    val joined = pq.join(brute, Seq("query_id", "vec_id"))
    assert(joined.count() > 0)
    assert(joined.filter(abs(col("sim") - col("bsim")) > 0.0).count() === 0)
    pq.unpersist()
  }

  test("ivfPqTopK: self-hit at rank 1, exact sims on shared hits, bucket containment") {
    val q = emb.filter(col("id") < 5)
    val ipq = Similarity.ivfPqTopK(q, emb, 10).cache()
    val perQuery = ipq.groupBy("query_id").count().collect()
    assert(perQuery.forall(_.getLong(1) === 10L))
    // A query's own vector shares its bucket (identical coarse argmax)
    // and reconstructs near itself → after exact re-rank the self-hit is
    // rank 1 at sim ~1.
    val self = ipq.filter(col("query_id") === col("vec_id"))
    assert(self.count() === 5)
    assert(self.filter(col("rank") =!= 1).count() === 0)
    assert(self.filter(abs(col("sim") - 1.0) > 1e-9).count() === 0)
    // Emitted sims are EXACT cosines wherever brute agrees on the hit.
    val brute = Similarity.bruteTopK(q, emb, 10)
      .select(col("query_id"), col("vec_id"), col("sim").as("bsim"))
    val joined = ipq.join(brute, Seq("query_id", "vec_id"))
    assert(joined.count() > 0)
    assert(joined.filter(abs(col("sim") - col("bsim")) > 0.0).count() === 0)
    // Every returned hit lies in one of the query's nprobe probed
    // buckets — the pruning contract (re-derive assignment + probes
    // with the same argmax rule).
    val cents = broadcast(Similarity.sampledCentroids(emb, 16))
    def top(df: org.apache.spark.sql.DataFrame, idc: String, n: Int) =
      graft.plans.TopK.perKey(
        df.crossJoin(cents).select(col(idc), col("cent_id"),
          Similarity.cosine(Similarity.vec(col("vec")), col("centv")).as("cs")),
        keyCols = Seq(idc), orderBy = Seq("cs" -> false, "cent_id" -> true),
        k = n).select(col(idc), col("cent_id"))
    val vBuckets = top(emb, "id", 1)
      .select(col("id").as("vec_id"), col("cent_id").as("vb"))
    val qProbes = top(q, "id", 3)
      .select(col("id").as("query_id"), col("cent_id").as("qb"))
    val covered = ipq.select("query_id", "vec_id")
      .join(vBuckets, "vec_id").join(qProbes, "query_id")
      .filter(col("vb") === col("qb"))
      .select("query_id", "vec_id").distinct()
    val outside = ipq.select("query_id", "vec_id")
      .join(covered, Seq("query_id", "vec_id"), "left_anti")
    assert(outside.count() === 0,
      "a returned hit fell outside every probed bucket")
    ipq.unpersist()
  }

  test("rhpProbe over a stored band index equals rhpTopK exactly") {
    val q = emb.filter(col("id") < 5)
    val dir = java.nio.file.Files.createTempDirectory("graft_rhp_bidx").toString
    Similarity.rhpBandIndex(emb).write.parquet(s"$dir/rows")
    val inQuery = Similarity.rhpTopK(q, emb, 10)
      .orderBy("query_id", "rank").collect()
    val stored = Similarity.rhpProbe(q, emb,
        spark.read.parquet(s"$dir/rows"), 10)
      .orderBy("query_id", "rank").collect()
    assert(stored.toSeq === inQuery.toSeq)
  }

  test("IVF-PQ index artifact stores dense CODES, and its bytes are a fraction of the raw embeddings'") {
    val idx = Similarity.ivfPqIndex(emb, numCentroids = 16).cache()
    // Shape: one row per corpus vector; codes = PqSubspaces dense ints in
    // [0, PqCodewords) — the renumbered codebook positions, NOT corpus
    // ids and NOT reconstruction vectors.
    assert(idx.count() === emb.count())
    assert(idx.filter(size(col("codes")) =!= Similarity.PqSubspaces).count() === 0)
    val bad = idx.select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") >= Similarity.PqCodewords)
    assert(bad.count() === 0, "a code fell outside [0, PqCodewords)")
    // Byte claim (VERDICT r8 #1): the artifact must be materially smaller
    // than the raw vectors it replaces for the approximate pass. Write
    // both as parquet and compare actual on-disk bytes.
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfpq_bytes").toString
    emb.write.mode("overwrite").parquet(s"$tmp/raw")
    idx.write.mode("overwrite").parquet(s"$tmp/idx")
    def bytes(p: String): Long = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(path).getLength
    }
    val (rawB, idxB) = (bytes(s"$tmp/raw"), bytes(s"$tmp/idx"))
    info(s"raw embeddings $rawB B, codes index $idxB B, ratio ${rawB.toDouble / idxB}")
    // Conservative floor: ≥2x smaller even at fixture scale, where the
    // per-file parquet footer overhead is at its proportional worst. The
    // data-page win is ~16 doubles -> 8 two-bit ints per vector.
    assert(idxB * 2 < rawB,
      s"codes index ($idxB B) is not ≪ raw embeddings ($rawB B)")
    idx.unpersist()
  }

  test("residual IVF-PQ: self-hit at rank 1, exact sims on shared hits, recall measured vs raw encoding") {
    val q = emb.filter(col("id") < 20)
    val res = Similarity.ivfPqResidualTopK(q, emb, 10).cache()
    val perQuery = res.groupBy("query_id").count().collect()
    assert(perQuery.forall(_.getLong(1) === 10L))
    val self = res.filter(col("query_id") === col("vec_id"))
    assert(self.count() === 20)
    assert(self.filter(col("rank") =!= 1).count() === 0)
    assert(self.filter(abs(col("sim") - 1.0) > 1e-9).count() === 0)
    // Emitted sims are exact cosines wherever brute agrees on the hit.
    val truthDf = Similarity.bruteTopK(q, emb, 10).cache()
    val joined = res.join(
      truthDf.select(col("query_id"), col("vec_id"), col("sim").as("bsim")),
      Seq("query_id", "vec_id"))
    assert(joined.count() > 0)
    assert(joined.filter(abs(col("sim") - col("bsim")) > 0.0).count() === 0)
    // Recall vs the raw-encoding tier at the SAME code budget (same
    // subspaces, same codeword count, same artifact bytes): residual
    // codewords live in the post-coarse ball, raw codewords in the full
    // space. Both measured against brute-force ground truth.
    val truth = truthDf.select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val rawRecall = recall(Similarity.ivfPqTopK(q, emb, 10))
    val residRecall = recall(res)
    // On the ISOTROPIC fixture (independent random embeddings) these are
    // expected to be close, with no reliable ordering: residual encoding
    // pays exactly when the coarse quantizer explains variance, and on
    // unclustered data v − centroid has HIGHER variance than v (the
    // centroid is nearly independent of v), so the residual tier has
    // nothing to win here. Measured and recorded, not ordered-asserted —
    // the ordering claim is made (and asserted) on clustered data below,
    // which is what real embedding corpora look like.
    info(s"isotropic fixture recall@10 over 20 queries: raw-encoding $rawRecall, residual $residRecall")
    assert(residRecall >= rawRecall - 0.06 && residRecall >= 0.15,
      s"residual recall $residRecall collapsed vs raw $rawRecall")
    res.unpersist(); truthDf.unpersist()
  }

  test("residual IVF-PQ beats raw encoding on CLUSTERED data: lower reconstruction MSE and >= recall at the same code budget") {
    // Deterministic clustered corpus from fixture columns only: 8 cluster
    // centers (scaled fixture vectors), each member = 4x its center plus
    // a 0.3x fixture perturbation — the shape real embedding corpora
    // have, and the regime residual encoding exists for: once the coarse
    // quantizer soaks up the center, codes quantize the small
    // perturbation ball instead of the full space.
    val base = emb.select(col("id"), Similarity.vec(col("vec")).as("v"))
    val centers = base.filter(col("id") < 8)
      .select((col("id")).as("cid"), col("v").as("cv0"))
    val clustered = base.filter(col("id") >= 8)
      .withColumn("cid", col("id") % 8)
      .join(broadcast(centers), "cid")
      .select(col("id"),
        zip_with(col("cv0"), col("v"),
          (c, p) => c * lit(4.0) + p * lit(0.3)).as("vec"))
      .cache()
    val q = clustered.filter(col("id") < 40)
    val truth = Similarity.bruteTopK(q, clustered, 10)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val rawRecall = recall(Similarity.ivfPqTopK(q, clustered, 10))
    val residRecall = recall(Similarity.ivfPqResidualTopK(q, clustered, 10))
    // Reconstruction error — the claim residual encoding actually makes
    // (what faiss trains for): average squared L2 between each corpus
    // vector and its reconstruction over the WHOLE corpus (deterministic,
    // no query luck). Same code budget both sides: PqSubspaces codes from
    // PqCodewords codewords.
    val coarse = Similarity.sampledCentroids(clustered, 16)
    val cv = clustered.select(col("id").as("vec_id"),
      Similarity.vec(col("vec")).as("cv"))
    def mse(recon: org.apache.spark.sql.DataFrame): Double = {
      val diff = zip_with(col("cv"), col("rv"), (a, b) => a - b)
      recon.join(cv, "vec_id")
        .select(Similarity.dot(diff, diff).as("e"))
        .agg(avg("e")).head.getDouble(0)
    }
    val rawBook = Similarity.ivfPqBook(clustered)
    val rawMse = mse(Similarity.ivfPqReconstructed(
      Similarity.ivfPqIndexWith(clustered, coarse, rawBook), rawBook))
    val residBook = Similarity.ivfPqResidualBook(clustered, coarse)
    val residMse = mse(Similarity.ivfPqResidualReconstructed(
      Similarity.ivfPqResidualIndex(clustered, coarse, residBook),
      coarse, residBook))
    info(s"clustered recall@10 over 40 queries: raw-encoding $rawRecall, residual $residRecall")
    info(s"clustered reconstruction MSE: raw-encoding $rawMse, residual $residMse")
    assert(residMse < rawMse,
      s"residual reconstruction MSE $residMse not < raw $rawMse on clustered data")
    assert(residRecall >= rawRecall,
      s"residual recall $residRecall < raw-encoding recall $rawRecall on clustered data")
    clustered.unpersist()
  }

  test("pq encoding geometry: codes exist for every (vector, subspace) and reconstructions have full dim") {
    // Re-derive the internal stages through the public result: every
    // corpus vector must appear at most once per query (codes are
    // per-vector functions, so the ADC scan emits one row per vector).
    val q = emb.filter(col("id") < 2)
    val pq = Similarity.pqTopK(q, emb, 10)
    assert(pq.groupBy("query_id", "vec_id").count()
      .filter(col("count") > 1).count() === 0)
    // Determinism: a second run is row-identical (codebook sampling,
    // argmin tiebreaks, and folds are all pinned).
    val again = Similarity.pqTopK(q, emb, 10)
    assert(pq.except(again).count() === 0)
    assert(again.except(pq).count() === 0)
  }

  test("rhpTopK rejects invalid banding profiles with a clear message") {
    val q = emb.filter(col("id") < 5)
    val e0 = intercept[IllegalArgumentException](
      Similarity.rhpTopK(q, emb, 10, bits = 16, bands = 0))
    assert(e0.getMessage.contains("bands"))
    val e5 = intercept[IllegalArgumentException](
      Similarity.rhpTopK(q, emb, 10, bits = 16, bands = 5))
    assert(e5.getMessage.contains("divide"))
  }

  test("hyperplane constants are ±1 and stable across calls") {
    val h1 = Similarity.hyperplanes
    assert(h1.length === Similarity.PairBits && h1.forall(_.length === 64))
    assert(h1.flatten.forall(s => s == 1 || s == -1))
    // not degenerate: both signs occur in every plane's first half
    assert(h1.forall(p => p.take(32).contains(1) || p.drop(32).contains(1)))
  }
}
