package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.EntryOps._

/** Similarity-search family: exact brute-force top-k and the ANN
  * serving tiers (RHP-LSH, IVF, PQ-ADC, IVF-PQ raw + residual, each
  * in-query and stored), plus the retrieval-quality audits (recall@k,
  * NDCG@10) — split out of [[DedupSimRegistry]] round 13 (VERDICT r12
  * #8) before that shard breached the repo's 2000-LoC rule.
  *
  * Registry shard of [[SparkEntry]] (split for maintainability; keys are
  * merged — and spec-checked disjoint — in SparkEntry.queries/oracleSql).
  */
private[graft] object SimRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact cosine top-k over the embeddings table: broadcast query set ×
    // in-place corpus scan — the ANN correctness baseline.
    "sim_brute_topk" -> ((s, dir) => {
      val emb = Sources.embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      sim.Similarity.bruteTopK(emb.filter(col("id") < 5), emb, 10)
        .orderBy("query_id", "rank")
    }),


    // Random-hyperplane LSH approximate top-k: sketch bands → candidate
    // equi-join → exact cosine re-rank of candidates only. The sub-linear
    // scale path for similarity search.
    "sim_ann_rhp" -> ((s, dir) => {
      val emb = Sources.embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      sim.Similarity.rhpTopK(emb.filter(col("id") < 5), emb, 10)
        .orderBy("query_id", "rank")
    }),


    // STORED RHP band index (the banding tier's serving shape — the
    // embedding-side analogue of the stored LSH text band index): the
    // (vec_id, band_idx, band_key) table is written once per (corpus,
    // banding profile), marker-gated; probes sketch only the query side
    // and equi-join the artifact, touching raw vectors for the candidate
    // re-rank only. Same oracle as the in-query twin — the index is a
    // deterministic projection, so the round-trip changes nothing.
    "sim_ann_rhp_stored" -> ((s, dir) => {
      val emb = Sources.embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val sfTag = dir.replaceAll("[^A-Za-z0-9.]", "_")
      val out = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), s"graft_rhp_bidx_$sfTag")
      val fs = out.getFileSystem(s.sparkContext.hadoopConfiguration)
      val marker = new org.apache.hadoop.fs.Path(out, "_GRAFT_MARKER")
      val tag = s"$dir|bits=${sim.Similarity.NumBits}|bands=${sim.Similarity.NumBands}|v=2"
      val fresh = fs.exists(marker) && {
        val in = fs.open(marker)
        try new String(in.readAllBytes(), "UTF-8") == tag finally in.close()
      }
      if (!fresh) {
        util.Artifacts.recordBuild(s"rhp_bidx $tag")
        if (fs.exists(out)) fs.delete(out, true)
        sim.Similarity.rhpBandIndex(emb)
          .write.mode("overwrite").parquet(s"$out/rows")
        // The sketch table rides along (v=2): probes don't read it, but
        // Streams.rhpIngest adjudicates near-dups from it — the full
        // serving artifact is (band rows, sketches).
        sim.Similarity.rhpSketches(emb)
          .write.mode("overwrite").parquet(s"$out/sketches")
        val os = fs.create(marker, true)
        try os.write(tag.getBytes("UTF-8")) finally os.close()
      }
      sim.Similarity.rhpProbe(emb.filter(col("id") < 5), emb,
        s.read.parquet(s"$out/rows"), 10)
        .orderBy("query_id", "rank")
    }),


    // IVF-style ANN: deterministic coarse quantizer → nearest-centroid
    // assignment (write-once index at scale) → nprobe bucket probe →
    // exact re-rank of bucket members only.
    "sim_ann_ivf" -> ((s, dir) => {
      val emb = Sources.embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      sim.Similarity.ivfTopK(emb.filter(col("id") < 5), emb, 10)
        .orderBy("query_id", "rank")
    }),


    // IVF with a TRAINED quantizer: one deterministic Lloyd iteration
    // (exact-decimal means — DuckDB-replayable) refines the sampled
    // centroids, then the identical probe path. Demonstrates the
    // "a trained k-means table drops in unchanged" seam as fact.
    "sim_ann_ivf_trained" -> ((s, dir) => {
      val emb = Sources.embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      // The trained table feeds both the assignment and the probe side —
      // materialize so the training pass (a full assignment scan) runs
      // once, exactly as a written-once index would at cluster scale.
      val cents = util.Views.materialize(
        sim.Similarity.trainCentroids(emb, numCentroids = 16, iters = 1))
      sim.Similarity.ivfTopKWith(emb.filter(col("id") < 5), emb, 10, cents)
        .orderBy("query_id", "rank")
    }),


    // STORED coarse quantizer (the true serving shape): the trained
    // centroid table is WRITTEN ONCE per (corpus, params) — marker-
    // gated exactly like the stored LSH band index — and every probe
    // reads the artifact, so training cost amortizes to zero across
    // runs. At cluster scale this is how ANN serving actually works:
    // the quantizer is a published table, not an in-query derivation.
    // Same oracle as the in-query twin: the parquet round-trip of the
    // double[] centroids must change nothing.
    "sim_ann_ivf_stored" -> ((s, dir) => {
      val emb = Sources.embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val sfTag = dir.replaceAll("[^A-Za-z0-9.]", "_")
      val out = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), s"graft_ivf_cents_$sfTag")
      val fs = out.getFileSystem(s.sparkContext.hadoopConfiguration)
      val marker = new org.apache.hadoop.fs.Path(out, "_GRAFT_MARKER")
      val tag = s"$dir|k=16|iters=1"
      val fresh = fs.exists(marker) && {
        val in = fs.open(marker)
        try new String(in.readAllBytes(), "UTF-8") == tag finally in.close()
      }
      if (!fresh) {
        util.Artifacts.recordBuild(s"ivf_centroids $tag")
        if (fs.exists(out)) fs.delete(out, true)
        sim.Similarity.trainCentroids(emb, numCentroids = 16, iters = 1)
          .write.mode("overwrite").parquet(out.toString)
        val os = fs.create(marker, true)
        try os.write(tag.getBytes("UTF-8")) finally os.close()
      }
      val cents = s.read.parquet(out.toString)
      sim.Similarity.ivfTopKWith(emb.filter(col("id") < 5), emb, 10, cents)
        .orderBy("query_id", "rank")
    }),


    // PQ-ADC approximate top-k (the COMPRESSION scale path alongside
    // banding and pruning): corpus encoded as per-subspace nearest
    // codewords, approximate scoring over reconstructions (at scale:
    // bytes per vector, not KBs), exact cosine re-rank of the top-20
    // approximate candidates only.
    "sim_ann_pq" -> ((s, dir) => {
      val emb = Sources.embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      sim.Similarity.pqTopK(emb.filter(col("id") < 5), emb, 10)
        .orderBy("query_id", "rank")
    }),


    // IVF-PQ (the faiss-default COMPOUND index): IVF coarse pruning AND
    // PQ compression composed — the stored index is (bucket, codes) per
    // vector; a query ADC-scores only its nprobe probed buckets' codes,
    // then exact-cosine re-ranks the top-20 survivors. The double win
    // (read nprobe/16 of the corpus, as bytes) neither tier delivers
    // alone; raw-vector encoding declared, residual encoding named at
    // the seam (Similarity.ivfPqTopK).
    "sim_ann_ivfpq" -> ((s, dir) => {
      val emb = Sources.embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      sim.Similarity.ivfPqTopK(emb.filter(col("id") < 5), emb, 10)
        .orderBy("query_id", "rank")
    }),


    // STORED IVF-PQ index (the serving shape): THREE published tables
    // written once per (corpus, params) — rows/ (vec_id, bucket,
    // codes: array<int> — CODES, a fraction of the corpus bytes, never
    // reconstructions), coarse/ (the quantizer) and book/ (the dense
    // codebook) — marker-gated like the stored LSH band index and the
    // stored IVF quantizer. Every probe reads the artifacts only: index
    // build amortizes to zero across runs, reconstruction happens at
    // probe time behind the broadcast codebook LUT, and the corpus is
    // touched only for the rerank survivors' raw vectors. Same oracle as
    // the in-query twin — the codes round-trip must change nothing.
    "sim_ann_ivfpq_stored" -> ((s, dir) => {
      val emb = Sources.embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val sfTag = dir.replaceAll("[^A-Za-z0-9.]", "_")
      val out = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), s"graft_ivfpq_idx_$sfTag")
      val fs = out.getFileSystem(s.sparkContext.hadoopConfiguration)
      val marker = new org.apache.hadoop.fs.Path(out, "_GRAFT_MARKER")
      val tag = s"$dir|c=16|m=${sim.Similarity.PqSubspaces}|k=${sim.Similarity.PqCodewords}|v=codes"
      val fresh = fs.exists(marker) && {
        val in = fs.open(marker)
        try new String(in.readAllBytes(), "UTF-8") == tag finally in.close()
      }
      if (!fresh) {
        util.Artifacts.recordBuild(s"ivfpq_index $tag")
        if (fs.exists(out)) fs.delete(out, true)
        val coarse = sim.Similarity.sampledCentroids(emb, 16)
        val book = sim.Similarity.ivfPqBook(emb)
        coarse.write.mode("overwrite").parquet(s"$out/coarse")
        book.write.mode("overwrite").parquet(s"$out/book")
        sim.Similarity.ivfPqIndexWith(emb, coarse, book)
          .write.mode("overwrite").parquet(s"$out/rows")
        val os = fs.create(marker, true)
        try os.write(tag.getBytes("UTF-8")) finally os.close()
      }
      sim.Similarity.ivfPqProbe(emb.filter(col("id") < 5), emb,
        s.read.parquet(s"$out/rows"), s.read.parquet(s"$out/coarse"),
        s.read.parquet(s"$out/book"), 10)
        .orderBy("query_id", "rank")
    }),


    // RESIDUAL IVF-PQ (the faiss default): PQ encodes v − centroid
    // [bucket] against a residual-space codebook; the probe reconstructs
    // centroid + codeword-concat. Residuals concentrate near the origin
    // once the coarse quantizer soaks up between-cluster variance, so
    // the same code budget (same artifact bytes) buys materially better
    // reconstruction — SimSpec measures recall of both encodings against
    // the brute-force ground truth on the shared fixture.
    "sim_ann_ivfpq_residual" -> ((s, dir) => {
      val emb = Sources.embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      sim.Similarity.ivfPqResidualTopK(emb.filter(col("id") < 5), emb, 10)
        .orderBy("query_id", "rank")
    }),


    // STORED residual IVF-PQ (the residual tier's serving shape): the
    // codebook TRAINING (a corpus pass) and the encode both happen once
    // at publish time; probes read rows/ + coarse/ + book/ only. Same
    // oracle as the in-query residual twin — training determinism plus
    // the codes round-trip must change nothing.
    "sim_ann_ivfpq_residual_stored" -> ((s, dir) => {
      val emb = Sources.embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val sfTag = dir.replaceAll("[^A-Za-z0-9.]", "_")
      val out = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), s"graft_ivfpqr_idx_$sfTag")
      val fs = out.getFileSystem(s.sparkContext.hadoopConfiguration)
      val marker = new org.apache.hadoop.fs.Path(out, "_GRAFT_MARKER")
      val tag = s"$dir|c=16|m=${sim.Similarity.PqSubspaces}|k=${sim.Similarity.PqCodewords}|enc=residual"
      val fresh = fs.exists(marker) && {
        val in = fs.open(marker)
        try new String(in.readAllBytes(), "UTF-8") == tag finally in.close()
      }
      if (!fresh) {
        util.Artifacts.recordBuild(s"ivfpqr_index $tag")
        if (fs.exists(out)) fs.delete(out, true)
        val coarse = sim.Similarity.sampledCentroids(emb, 16)
        val book = sim.Similarity.ivfPqResidualBook(emb, coarse)
        coarse.write.mode("overwrite").parquet(s"$out/coarse")
        book.write.mode("overwrite").parquet(s"$out/book")
        sim.Similarity.ivfPqResidualIndex(emb, coarse, book)
          .write.mode("overwrite").parquet(s"$out/rows")
        val os = fs.create(marker, true)
        try os.write(tag.getBytes("UTF-8")) finally os.close()
      }
      sim.Similarity.ivfPqResidualProbe(emb.filter(col("id") < 5), emb,
        s.read.parquet(s"$out/rows"), s.read.parquet(s"$out/coarse"),
        s.read.parquet(s"$out/book"), 10)
        .orderBy("query_id", "rank")
    }),
    // ANN quality AUDIT in-query: recall@k of the RHP-LSH path against
    // the exact brute-force top-k, per query vector — the measurement a
    // production ANN deployment ships alongside the index (recall is a
    // JOIN of two engine paths, so the oracle re-derives BOTH sides in
    // SQL and must agree on every per-query hit count). Exact integer
    // division → identical doubles.
    "sim_ann_recall" -> ((s, dir) => {
      val emb = Sources.embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val q = emb.filter(col("id") < 5)
      val brute = sim.Similarity.bruteTopK(q, emb, 10).select("query_id", "vec_id")
      val ann = sim.Similarity.rhpTopK(q, emb, 10).select("query_id", "vec_id")
      val hits = brute.join(ann, Seq("query_id", "vec_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
      brute.groupBy("query_id").agg(count(lit(1)).as("n_ref"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"), col("n_ref"),
          (coalesce(col("n_hit"), lit(0L)) / col("n_ref")).as("recall"))
        .orderBy("query_id")
    }),
    // NDCG@10 of the RHP-LSH retrieval against exact brute force — the
    // GRADED ranking-quality metric completing the retrieval-eval triad
    // (precision/recall in dedup_lsh_recall, set recall in
    // sim_ann_recall): relevance of a hit = 11 − its ideal rank, DCG
    // terms rel/log2(rank+1) quantize per item to 1e-6 longs (the lnQ
    // discipline — per-item IEEE then exact integer sums, so cross-
    // partition summation order can't perturb the hash) and NDCG divides
    // the two quantized sums once. Both ranked lists come from the
    // bounded-heap per-key operator; the eval join is keyed on
    // (query_id, vec_id) — k rows per query per side at any scale.
    "sim_ann_ndcg" -> ((s, dir) => {
      val emb = Sources.embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val q = emb.filter(col("id") < 5)
      val brute = sim.Similarity.bruteTopK(q, emb, 10)
        .select(col("query_id"), col("vec_id"), col("rank").as("ideal_rank"))
      val ann = sim.Similarity.rhpTopK(q, emb, 10)
        .select(col("query_id"), col("vec_id"), col("rank").as("ann_rank"))
      def termQ(rel: Column, rank: Column): Column =
        floor(rel.cast("double") * lit(1e6) / log2(rank.cast("double") + 1.0) + 0.5)
          .cast("long")
      val dcg = ann.join(brute, Seq("query_id", "vec_id"), "left")
        .withColumn("rel", when(col("ideal_rank").isNotNull,
          lit(11) - col("ideal_rank")).otherwise(lit(0)))
        .groupBy("query_id")
        .agg(sum(termQ(col("rel"), col("ann_rank"))).as("dcg_q"))
      val idcg = brute
        .groupBy("query_id")
        .agg(sum(termQ(lit(11) - col("ideal_rank"), col("ideal_rank"))).as("idcg_q"))
      idcg.join(dcg, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("dcg_q"), lit(0L)).as("dcg_q"), col("idcg_q"),
          (coalesce(col("dcg_q"), lit(0L)).cast("double") /
            col("idcg_q").cast("double")).as("ndcg"))
        .orderBy("query_id")
    }),

  )

  def oracles: Map[String, String] = Map(

    "sim_brute_topk" ->
      s"""WITH vecs AS ${sim.Similarity.vecsSql},
         |${sim.Similarity.bruteTopKSql("(SELECT * FROM vecs WHERE id < 5)", "vecs", 10)}
         |SELECT query_id, vec_id, sim, rank FROM topk
         |ORDER BY query_id, rank""".stripMargin,

    "sim_ann_rhp" ->
      s"""WITH vecs AS ${sim.Similarity.vecsSql},
         |${sim.Similarity.rhpTopKSql("(SELECT * FROM vecs WHERE id < 5)", "vecs", 10)}
         |SELECT query_id, vec_id, sim, rank FROM topk
         |ORDER BY query_id, rank""".stripMargin,

    // The stored path probes the SAME deterministic band projection the
    // in-query twin derives — one oracle, proof the parquet round-trip
    // changes nothing.
    "sim_ann_rhp_stored" ->
      s"""WITH vecs AS ${sim.Similarity.vecsSql},
         |${sim.Similarity.rhpTopKSql("(SELECT * FROM vecs WHERE id < 5)", "vecs", 10)}
         |SELECT query_id, vec_id, sim, rank FROM topk
         |ORDER BY query_id, rank""".stripMargin,

    "sim_ann_ivf" ->
      s"""WITH vecs AS ${sim.Similarity.vecsSql},
         |${sim.Similarity.ivfTopKSql("(SELECT * FROM vecs WHERE id < 5)", "vecs", 10)}
         |SELECT query_id, vec_id, sim, rank FROM topk
         |ORDER BY query_id, rank""".stripMargin,

    "sim_ann_ivf_trained" -> ivfTrainedOracle,

    // The stored path computes the SAME probe over the same trained
    // quantizer — one oracle, proof the centroid parquet round-trip
    // changes nothing.
    "sim_ann_ivf_stored" -> ivfTrainedOracle,

    "sim_ann_pq" ->
      s"""WITH vecs AS ${sim.Similarity.vecsSql},
         |${sim.Similarity.pqTopKSql("(SELECT * FROM vecs WHERE id < 5)", "vecs", 10)}
         |SELECT query_id, vec_id, sim, rank FROM topk
         |ORDER BY query_id, rank""".stripMargin,

    "sim_ann_ivfpq" -> ivfPqOracle,

    // The stored path probes the SAME index the in-query twin derives —
    // one oracle, proof the codes parquet round-trip changes nothing.
    "sim_ann_ivfpq_stored" -> ivfPqOracle,

    "sim_ann_ivfpq_residual" -> ivfPqResidualOracle,

    // The stored path trains/encodes once and probes the artifacts —
    // one oracle, proof the training determinism + codes round-trip
    // change nothing.
    "sim_ann_ivfpq_residual_stored" -> ivfPqResidualOracle,
    "sim_ann_recall" ->
      s"""WITH vecs AS ${sim.Similarity.vecsSql},
         |b AS (
         |  WITH ${sim.Similarity.bruteTopKSql("(SELECT * FROM vecs WHERE id < 5)", "vecs", 10)}
         |  SELECT query_id, vec_id FROM topk),
         |a AS (
         |  WITH ${sim.Similarity.rhpTopKSql("(SELECT * FROM vecs WHERE id < 5)", "vecs", 10)}
         |  SELECT query_id, vec_id FROM topk),
         |hits AS (
         |  SELECT b.query_id, count(*) AS n_hit FROM b
         |  WHERE EXISTS (SELECT 1 FROM a
         |                WHERE a.query_id = b.query_id AND a.vec_id = b.vec_id)
         |  GROUP BY 1),
         |refs AS (SELECT query_id, count(*) AS n_ref FROM b GROUP BY 1)
         |SELECT r.query_id, coalesce(h.n_hit, 0) AS n_hit, r.n_ref,
         |  coalesce(h.n_hit, 0) / r.n_ref AS recall
         |FROM refs r LEFT JOIN hits h USING (query_id)
         |ORDER BY r.query_id""".stripMargin,
    "sim_ann_ndcg" ->
      s"""WITH vecs AS ${sim.Similarity.vecsSql},
         |b AS (
         |  WITH ${sim.Similarity.bruteTopKSql("(SELECT * FROM vecs WHERE id < 5)", "vecs", 10)}
         |  SELECT query_id, vec_id, rank AS ideal_rank FROM topk),
         |a AS (
         |  WITH ${sim.Similarity.rhpTopKSql("(SELECT * FROM vecs WHERE id < 5)", "vecs", 10)}
         |  SELECT query_id, vec_id, rank AS ann_rank FROM topk),
         |d AS (
         |  SELECT a.query_id,
         |    CAST(sum(CAST(floor(
         |      CAST(CASE WHEN b.ideal_rank IS NOT NULL THEN 11 - b.ideal_rank
         |                ELSE 0 END AS DOUBLE) * 1e6
         |        / log2(CAST(a.ann_rank AS DOUBLE) + 1.0) + 0.5) AS BIGINT))
         |      AS BIGINT) AS dcg_q
         |  FROM a LEFT JOIN b USING (query_id, vec_id) GROUP BY 1),
         |i AS (
         |  SELECT query_id,
         |    CAST(sum(CAST(floor(CAST(11 - ideal_rank AS DOUBLE) * 1e6
         |        / log2(CAST(ideal_rank AS DOUBLE) + 1.0) + 0.5) AS BIGINT))
         |      AS BIGINT) AS idcg_q
         |  FROM b GROUP BY 1)
         |SELECT i.query_id, coalesce(d.dcg_q, 0) AS dcg_q, i.idcg_q,
         |  CAST(coalesce(d.dcg_q, 0) AS DOUBLE) / CAST(i.idcg_q AS DOUBLE) AS ndcg
         |FROM i LEFT JOIN d USING (query_id)
         |ORDER BY query_id""".stripMargin,
  )
}
