package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor similarity search over an embedding column
  * (`Array[Float]`) — the training-data-pipeline extension surface beyond
  * the reference (which has no vector data at all; its only "similarity"
  * notion is the BART summarizer's relevance ranking,
  * `Tugas 2/IQPLUS News/iqplus_market_transform.py:49-89`).
  *
  * Two tiers:
  *  1. [[bruteTopK]] — exact cosine top-k: broadcast the (small) query set
  *     against the corpus, one pass, no shuffle beyond the per-query top-k.
  *     The correctness baseline, and the right plan whenever
  *     |queries| × |corpus| work fits the cluster (it parallelizes
  *     perfectly: the corpus never moves).
  *  2. [[rhpTopK]] — random-hyperplane (SimHash-for-cosine) LSH: each
  *     vector gets a [[NumBits]]-bit sign sketch; sketches are split into
  *     [[NumBands]] bands; a corpus vector is a candidate for a query iff
  *     some band matches exactly (equi-join on band key — never a cross
  *     join); exact cosine re-ranks candidates only. At corpus scale this
  *     is the standard sub-linear path: sketching is a per-row projection,
  *     candidate generation one shuffle on (band, key).
  *
  * Cross-engine determinism (the DuckDB oracle must hash-match): every
  * dot product is a *sequential left fold over doubles in array order* —
  * Spark `aggregate(zip_with(...))` ⇔ DuckDB `list_reduce(list_transform
  * (list_zip(...)))` produce bit-identical IEEE sums — and the hyperplane
  * signs are ±1 constants derived from md5 *at plan-build time* in Scala,
  * embedded as literals into both the Spark plan and the generated SQL.
  */
object Similarity {

  /** Top-k banding DEFAULT profile: 16 sketch bits in 4 bands of 4 —
    * recall-oriented (a 4-bit band key is deliberately permissive so every
    * query finds candidates at fixture scale; re-ranking is exact). This
    * is the sf0.01 default; it is NOT the corpus-scale setting — see
    * [[ScaleBits]]/[[ScaleBands]]. */
  val NumBits = 16
  val NumBands = 4 // 4 bands x 4 bits
  val BitsPerBand: Int = NumBits / NumBands

  /** Corpus-SCALE banding profile: 64 bits in 8 bands of 8. A 4-bit band
    * key has only 16 values — at corpus scale every band bucket holds
    * N/16 vectors and the candidate join degenerates toward all-pairs.
    * 8-bit bands give 256 keys/band (bucket occupancy N/256 per band) and
    * the 8-band OR keeps recall: a near-neighbor at angle θ matches some
    * band with prob 1-(1-(1-θ/π)^8)^8 — ~0.98 at cos 0.95. Pass these to
    * [[rhpTopK]] explicitly; both profiles are spec-tested
    * (SimSpec "scale banding profile"). */
  val ScaleBits = 64
  val ScaleBands = 8 // 8 bands x 8 bits

  /** Near-dup candidate key width ([[cosinePairs]]): 64 bits, NOT 16.
    * The candidate join buckets on full-sketch equality, so the keyspace
    * bounds bucket occupancy: 2^16 = 65 536 buckets caps out at corpus
    * scale (every bucket holds N/65536 docs and the self-join goes
    * quadratic within them); 2^64 keyspace means only genuinely
    * same-direction vectors share a bucket. Direction-preserving copies
    * still collide on every bit by construction. */
  val PairBits: Int = graft.functions.SketchUtil.MaxBits

  /** Embedding dimensionality the hyperplanes are generated for. */
  val VecDim: Int = graft.functions.SketchUtil.VecDim

  /** Rademacher hyperplanes: sign(j,d) = +1 iff the first hex char of
    * md5("j:d") is >= '8'. Pure class-init constants shared with the
    * native [[graft.functions.SignSketch]] runtime — identical in the
    * generated SQL by construction. Rows 0..15 serve the top-k banding;
    * the full 64 serve the near-dup sketch. */
  val hyperplanes: Array[Array[Int]] =
    graft.functions.SketchUtil.planes.map(_.map(_.toInt))

  /** Native single-pass sign sketch of the first `bits` hyperplanes
    * (codegen'd; replaces `bits` interpreted higher-order dot products
    * per row — measured 4x faster on the near-dup path at sf0.1). */
  private def sketchCol(v: Column, bits: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.SignSketch(
        org.apache.spark.sql.GraftColumnBridge.expression(v), bits))

  /** Sequential in-order dot product of two double-array columns, via the
    * native [[graft.functions.VecDot]] expression (codegen'd single pass;
    * bit-identical to the interpreted `aggregate(zip_with(...))` fold it
    * replaces AND to the DuckDB `list_reduce` mirror — same IEEE op
    * order). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.VecDot(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** The embedding column as doubles (floats widen exactly), guarded on
    * dimensionality: `zip_with` pads mismatched arrays with nulls, which
    * would silently null every dot product and zero every sketch —
    * degenerating the "sub-linear" LSH paths into all-pairs scans. Fail
    * fast instead (`assert_true` throws per-row on violation). */
  def vec(c: Column): Column =
    when(assert_true(size(c) === VecDim,
      lit(s"embedding must have $VecDim dims to match the sketch hyperplanes")).isNull,
      c.cast("array<double>"))

  /** Band keys of a materialized sketch column: `bands` substrings of
    * `bitsPerBand` '0'/'1' sketch bits each. */
  private def bandKeysOf(sketch: Column, bitsPerBand: Int, bands: Int): Seq[Column] =
    (0 until bands).map(b =>
      substring(sketch, b * bitsPerBand + 1, bitsPerBand))

  /** Per-query top-k of a scored (query_id, vec_id, sim) frame through the
    * engine's own [[graft.plans.TopKPerKeyExec]] (bounded k-row heaps,
    * two-phase like an aggregate) — NOT a `row_number` window, which would
    * ship every scored row through one exchange and sort per key. The
    * rank column is assigned by a window AFTER the operator, over at most
    * k rows per query — a bounded input at any corpus scale. */
  private def rankPerKey(scored: DataFrame, k: Int): DataFrame = {
    val top = graft.plans.TopK.perKey(scored,
      keyCols = Seq("query_id"),
      orderBy = Seq("sim" -> false, "vec_id" -> true), k = k)
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    top.withColumn("rank", row_number().over(w).cast("int"))
  }

  /** Exact cosine top-k of `corpus` for each row of `queries` (both must
    * have (id, vec) where vec is float/double array). The query set is
    * broadcast — the corpus is scanned once in place, never shuffled; the
    * per-query top-k is the custom bounded-heap operator, so only ≤ k
    * rows per (query, map task) ever reach an exchange (NOT all N×Q
    * scored rows, which is what the row_number form shipped). */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("id").as("query_id"), vec(col("vec")).as("qv")))
    val c = corpus.select(col("id").as("vec_id"), vec(col("vec")).as("cv"))
    val scored = c.crossJoin(q)
      .select(col("query_id"), col("vec_id"), cosine(col("qv"), col("cv")).as("sim"))
    rankPerKey(scored, k)
  }

  /** (idAs, band_idx, band_key) exploded view of a sketched frame
    * (id, sk). */
  private def explodeBands(sk: DataFrame, idCol: String, idAs: String,
                           bitsPerBand: Int, bands: Int): DataFrame =
    sk.select(col(idCol).as(idAs),
        posexplode(array(bandKeysOf(col("sk"), bitsPerBand, bands): _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_key")

  /** RHP-LSH approximate top-k: candidates share >= 1 sketch band with the
    * query; exact cosine re-ranks candidates only (through the bounded-
    * heap per-key operator, never a full-shuffle window).
    *
    * The corpus is scanned ONCE: the sketched (vec_id, cv, sk) view is
    * materialized and feeds BOTH the band explosion and the re-rank join
    * (mirroring [[cosinePairs]]). `bits`/`bands` select the banding
    * profile — [[NumBits]]/[[NumBands]] (fixture default) or
    * [[ScaleBits]]/[[ScaleBands]] (corpus scale).
    *
    * SIDE EFFECT: the sketched-corpus view is materialized (an eager
    * count job runs at DataFrame-construction time) and stays cached —
    * like [[cosinePairs]]'s sketch view, it is the operator's reusable
    * index and is deliberately not unpersisted here (the result would be
    * consumed lazily after this method returns). Every materialized view
    * is registered with [[graft.util.Views]]; callers reclaim them after
    * the consuming action with `Views.unpersistAll()` — Bench and Verify
    * do, per query (ViewLifecycleSpec asserts nothing stays persisted). */
  def rhpTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              bits: Int = NumBits, bands: Int = NumBands): DataFrame = {
    // bands is validated BEFORE the modulo so bands=0 reports this message,
    // not an ArithmeticException.
    require(bands >= 1 && bits >= bands && bits % bands == 0 &&
      bits <= graft.functions.SketchUtil.MaxBits,
      s"bands must be in [1, bits] and divide bits; bits must fit the " +
        s"${graft.functions.SketchUtil.MaxBits} hyperplanes")
    val bitsPerBand = bits / bands
    val csk = graft.util.Views.materialize(
      corpus.select(col("id").as("vec_id"), vec(col("vec")).as("cv"))
        .withColumn("sk", sketchCol(col("cv"), bits)))
    val qsk = queries.select(col("id").as("query_id"), vec(col("vec")).as("qv"))
      .withColumn("sk", sketchCol(col("qv"), bits))
    val qb = broadcast(explodeBands(qsk, "query_id", "query_id", bitsPerBand, bands))
    val cand = explodeBands(csk, "vec_id", "vec_id", bitsPerBand, bands)
      .join(qb, Seq("band_idx", "band_key"))
      .select("query_id", "vec_id").distinct()
    val q = broadcast(qsk.select("query_id", "qv"))
    val scored = cand.join(csk.select("vec_id", "cv"), "vec_id").join(q, "query_id")
      .select(col("query_id"), col("vec_id"), cosine(col("qv"), col("cv")).as("sim"))
    rankPerKey(scored, k)
  }

  /** [[rhpTopK]] for a BULK query side — a corpus split (kNN
    * classification's test set), not a handful of probes. Same banding,
    * same candidate semantics, same bounded-heap re-rank, but NO
    * broadcast assumption anywhere: both sides are sketched once
    * (materialized — each feeds its band explosion and its re-rank
    * join), and candidates come from a keyed equi-join on
    * (band_idx, band_key), so the plan holds when queries number
    * millions. Queries sharing no band with any corpus vector yield no
    * rows — the declared ANN coverage contract, mirrored by the oracle.
    */
  def rhpTopKBulk(queries: DataFrame, corpus: DataFrame, k: Int,
                  bits: Int = NumBits, bands: Int = NumBands): DataFrame = {
    require(bands >= 1 && bits >= bands && bits % bands == 0 &&
      bits <= graft.functions.SketchUtil.MaxBits,
      s"bands must be in [1, bits] and divide bits; bits must fit the " +
        s"${graft.functions.SketchUtil.MaxBits} hyperplanes")
    val bitsPerBand = bits / bands
    val csk = graft.util.Views.materialize(
      corpus.select(col("id").as("vec_id"), vec(col("vec")).as("cv"))
        .withColumn("sk", sketchCol(col("cv"), bits)))
    val qsk = graft.util.Views.materialize(
      queries.select(col("id").as("query_id"), vec(col("vec")).as("qv"))
        .withColumn("sk", sketchCol(col("qv"), bits)))
    val cand = explodeBands(csk, "vec_id", "vec_id", bitsPerBand, bands)
      .join(explodeBands(qsk, "query_id", "query_id", bitsPerBand, bands),
        Seq("band_idx", "band_key"))
      .select("query_id", "vec_id").distinct()
    val scored = cand.join(csk.select("vec_id", "cv"), "vec_id")
      .join(qsk.select("query_id", "qv"), "query_id")
      .select(col("query_id"), col("vec_id"), cosine(col("qv"), col("cv")).as("sim"))
    rankPerKey(scored, k)
  }

  /** IVF-style approximate top-k (the other standard ANN scale path,
    * alongside [[rhpTopK]]): a FIXED-`numCentroids` coarse quantizer —
    * the centroid set is a deterministic pseudo-random sample of exactly
    * `numCentroids` corpus vectors (ranked by md5 of the id; a trained
    * k-means table would slot in here unchanged), each corpus vector
    * assigned to its nearest centroid once (broadcast centroids, argmax
    * by cosine), each query probing its `nprobe` nearest centroid
    * buckets, exact cosine re-ranking bucket members only.
    *
    * `numCentroids` is a PARAMETER, never derived from corpus size: the
    * broadcast is bounded at `numCentroids x VecDim` doubles and the
    * assignment cost at O(numCentroids x N) regardless of corpus scale
    * (a corpus-proportional centroid set would make the broadcast OOM
    * and the assignment quadratic). The sample itself is scale-safe:
    * orderBy+limit plans as TakeOrderedAndProject — per-partition top-k,
    * then a k-row merge on the driver. At corpus scale the assignment is
    * a write-once index; probing reads `nprobe/numCentroids` of the
    * data. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              numCentroids: Int = 16, nprobe: Int = 3): DataFrame =
    ivfTopKWith(queries, corpus, k, sampledCentroids(corpus, numCentroids), nprobe)

  /** Deterministic pseudo-random centroid sample: exactly `numCentroids`
    * corpus vectors ranked by md5 of the id (TakeOrderedAndProject —
    * per-partition top-k then a k-row driver merge, scale-safe). */
  def sampledCentroids(corpus: DataFrame, numCentroids: Int): DataFrame =
    corpus.select(col("id").as("cent_id"), vec(col("vec")).as("centv"))
      .orderBy(md5(col("cent_id").cast("string").cast("binary")), col("cent_id"))
      .limit(numCentroids)

  /** [[ivfTopK]] with a caller-supplied centroid table `(cent_id, centv)`
    * — the seam where a TRAINED quantizer ([[trainCentroids]], or any
    * k-means table computed offline) drops in unchanged. */
  def ivfTopKWith(queries: DataFrame, corpus: DataFrame, k: Int,
                  centroids: DataFrame, nprobe: Int = 3): DataFrame = {
    val c = corpus.select(col("id").as("vec_id"), vec(col("vec")).as("cv"))
    val cents = broadcast(centroids.select("cent_id", "centv"))
    // Nearest-centroid argmax = per-vector top-1 through the bounded-heap
    // operator: the map side collapses the N×numCentroids scored rows to
    // one row per vector per partition BEFORE any exchange (the window
    // form shuffled and sorted all N×numCentroids assignment rows).
    val assigned = graft.plans.TopK.perKey(
      c.crossJoin(cents)
        .select(col("vec_id"), col("cv"), col("cent_id"),
          cosine(col("cv"), col("centv")).as("csim")),
      keyCols = Seq("vec_id"),
      orderBy = Seq("csim" -> false, "cent_id" -> true), k = 1)
      .select("vec_id", "cv", "cent_id")
    val q = queries.select(col("id").as("query_id"), vec(col("vec")).as("qv"))
    val probes = broadcast(graft.plans.TopK.perKey(
      q.crossJoin(cents)
        .select(col("query_id"), col("qv"), col("cent_id"),
          cosine(col("qv"), col("centv")).as("csim")),
      keyCols = Seq("query_id"),
      orderBy = Seq("csim" -> false, "cent_id" -> true), k = nprobe)
      .select("query_id", "qv", "cent_id"))
    val scored = assigned.join(probes, "cent_id")
      .select(col("query_id"), col("vec_id"), cosine(col("qv"), col("cv")).as("sim"))
    rankPerKey(scored, k)
  }

  /** Deterministic Lloyd-refined coarse quantizer for [[ivfTopKWith]]:
    * `iters` rounds of assign-to-nearest (cosine argmax via the
    * bounded-heap top-1 — map-side collapse before any exchange) followed
    * by per-centroid element-wise means, seeded from
    * [[sampledCentroids]]. Turns the "a trained k-means table drops in
    * unchanged" claim into demonstrated fact.
    *
    * Cross-engine determinism: each dimension's sum accumulates as
    * DECIMAL(38,18) — exact, ORDER-INDEPENDENT addition (a plain double
    * `avg` would vary with Spark's partial-aggregation order run to run)
    * — then divides as doubles, so the DuckDB mirror
    * ([[trainedCentsSql]]) reproduces the centroid table. A residual
    * last-decimal-digit difference (the engines' half-up vs half-even
    * rounding of the double→decimal cast) perturbs a centroid by ~1e-18
    * — far below any realistic argmax margin, so bucket assignments, and
    * hence the exact-cosine final output, are unaffected. Centroids that
    * lose every member drop out (both engines group over assigned
    * members).
    *
    * At corpus scale each iteration is one broadcast-assignment pass
    * (O(numCentroids × N) dot products; the only shuffle is the
    * numCentroids-key mean aggregate, partial+final). `iters` stays
    * small (1-2): the coarse quantizer needs rough balance, not k-means
    * convergence. */
  def trainCentroids(corpus: DataFrame, numCentroids: Int = 16,
                     iters: Int = 1): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    val c = corpus.select(col("id").as("vec_id"), vec(col("vec")).as("cv"))
    var cents = sampledCentroids(corpus, numCentroids)
    for (_ <- 0 until iters) {
      val assigned = graft.plans.TopK.perKey(
        c.crossJoin(broadcast(cents))
          .select(col("vec_id"), col("cv"), col("cent_id"),
            cosine(col("cv"), col("centv")).as("csim")),
        keyCols = Seq("vec_id"),
        orderBy = Seq("csim" -> false, "cent_id" -> true), k = 1)
      val sums = (0 until VecDim).map(d =>
        sum(element_at(col("cv"), d + 1).cast(dec)).as(s"s$d"))
      cents = assigned.groupBy("cent_id")
        .agg(count(lit(1)).as("n"), sums: _*)
        .select(col("cent_id"),
          array((0 until VecDim).map(d =>
            col(s"s$d").cast("double") / col("n")): _*).as("centv"))
    }
    cents
  }

  /** Product-quantization geometry: [[VecDim]]-dim vectors split into
    * [[PqSubspaces]] contiguous subspaces of [[PqSubDim]] dims; each
    * subspace quantizes independently against [[PqCodewords]] codewords.
    * Small fixture-sized codebook — at corpus scale the SAME shapes hold
    * with 256 codewords/subspace (a byte per code), and the codebook is
    * a trained table that drops in exactly like [[trainCentroids]] does
    * for IVF. */
  val PqSubspaces = 8
  val PqCodewords = 4
  val PqSubDim: Int = VecDim / PqSubspaces

  /** Squared L2 via the dot identity |a-b|² = a·a − 2·a·b + b·b — three
    * in-order [[dot]] folds combined in a fixed operand order, so the
    * DuckDB mirror reproduces it bit-for-bit (a subtraction fold would
    * be equally deterministic; the identity reuses the already-mirrored
    * dot). */
  private def l2sq(a: Column, b: Column): Column =
    dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b)

  /** PQ-ADC approximate top-k — the third standard ANN scale path
    * (alongside banding [[rhpTopK]] and pruning [[ivfTopK]]):
    * COMPRESSION. Every corpus vector is encoded as [[PqSubspaces]]
    * small codes (nearest codeword per subspace by squared L2, the PQ
    * training objective); scoring scans reconstructions — at cluster
    * scale the scan reads codes (bytes) instead of raw vectors (KBs),
    * which is the point: the approximate pass is memory-bandwidth-bound,
    * not compute-bound. The top `rerank` approximate candidates per
    * query are re-ranked by exact cosine against the raw vectors (the
    * standard ADC + re-rank pipeline), so only `rerank` rows per query
    * ever touch full-precision data.
    *
    * Every argmin/top-k goes through the bounded-heap per-key operator
    * (map-side collapse before any exchange); the codebook is a
    * [[PqCodewords]]-row broadcast; nothing in the plan is quadratic in
    * the corpus. Encoding is a write-once index job at scale, exactly
    * like the IVF assignment. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
             rerank: Int = 20): DataFrame = {
    val c = corpus.select(col("id").as("vec_id"), vec(col("vec")).as("cv"))
    val cents = broadcast(sampledCentroids(corpus, PqCodewords))
    // Per (vector, codeword): all PqSubspaces subspace distances in one
    // row-local explode (struct carries the codeword's subvector so the
    // reconstruction below needs no second codebook join).
    val enc0 = c.crossJoin(cents)
      .select(col("vec_id"), col("cent_id"), posexplode(array(
        (0 until PqSubspaces).map { j =>
          val a = slice(col("cv"), j * PqSubDim + 1, PqSubDim)
          val b = slice(col("centv"), j * PqSubDim + 1, PqSubDim)
          struct(l2sq(a, b).as("d"), b.as("subv"))
        }: _*)))
      .select(col("vec_id"), col("cent_id"), col("pos").as("j"),
        col("col.d").as("d"), col("col.subv").as("subv"))
    // Nearest codeword per (vector, subspace) — the PQ code assignment.
    val assigned = graft.plans.TopK.perKey(enc0,
      keyCols = Seq("vec_id", "j"),
      orderBy = Seq("d" -> true, "cent_id" -> true), k = 1)
    // Reconstruction: codeword subvectors concatenated in subspace order
    // (collect_list is order-free; the sort key j restores it).
    val recon = assigned
      .groupBy("vec_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("j").as("j"), col("subv").as("v")))),
        x => x.getField("v"))).as("rv"))
    val q = broadcast(queries.select(col("id").as("query_id"), vec(col("vec")).as("qv")))
    // ADC pass: approximate cosine against reconstructions, corpus-wide.
    val approx = graft.plans.TopK.perKey(
      recon.crossJoin(q)
        .select(col("query_id"), col("vec_id"), cosine(col("qv"), col("rv")).as("asim")),
      keyCols = Seq("query_id"),
      orderBy = Seq("asim" -> false, "vec_id" -> true), k = rerank)
    // Exact re-rank of the survivors only.
    val scored = approx.select("query_id", "vec_id")
      .join(c, "vec_id").join(q, "query_id")
      .select(col("query_id"), col("vec_id"), cosine(col("qv"), col("cv")).as("sim"))
    rankPerKey(scored, k)
  }

  /** IVF-PQ — the COMPOUND production ANN index (the faiss-default
    * shape): IVF coarse pruning AND PQ compression composed. The stored
    * index is one row per corpus vector: (bucket, reconstruction) — the
    * bucket from the nearest coarse centroid (the write-once IVF
    * assignment), the reconstruction from per-subspace nearest-codeword
    * encoding (the write-once PQ encode). A query probes its `nprobe`
    * nearest coarse buckets and ADC-scores ONLY those buckets' codes —
    * at cluster scale the approximate pass reads nprobe/numCentroids of
    * the corpus as BYTES (codes), the double win neither tier delivers
    * alone — then the top `rerank` survivors re-rank by exact cosine
    * against raw vectors. Every argmax/argmin/top-k goes through the
    * bounded-heap per-key operator (map-side collapse before any
    * exchange). This variant encodes RAW vectors; faiss's residual
    * encoding (encode v − centroid, reconstruct centroid + codeword) is
    * one subtraction at the encode seam and one addition at the
    * reconstruction seam. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                numCentroids: Int = 16, nprobe: Int = 3,
                rerank: Int = 20): DataFrame =
    ivfPqProbe(queries, corpus, ivfPqIndex(corpus, numCentroids),
      k, numCentroids, nprobe, rerank)

  /** The index half of [[ivfPqTopK]] — one row per corpus vector:
    * (vec_id, bucket, rv). This is what a serving system WRITES ONCE
    * per (corpus, params): the coarse assignment and the PQ
    * reconstruction are both corpus-scan jobs whose output replaces the
    * raw vectors for the approximate pass. */
  def ivfPqIndex(corpus: DataFrame, numCentroids: Int = 16): DataFrame = {
    val c = corpus.select(col("id").as("vec_id"), vec(col("vec")).as("cv"))
    val coarse = broadcast(sampledCentroids(corpus, numCentroids))
    val assigned = graft.plans.TopK.perKey(
      c.crossJoin(coarse)
        .select(col("vec_id"), col("cv"), col("cent_id"),
          cosine(col("cv"), col("centv")).as("csim")),
      keyCols = Seq("vec_id"),
      orderBy = Seq("csim" -> false, "cent_id" -> true), k = 1)
      .select(col("vec_id"), col("cent_id").as("bucket"))
    val book = broadcast(sampledCentroids(corpus, PqCodewords)
      .select(col("cent_id").as("code_id"), col("centv").as("codev")))
    val enc0 = c.crossJoin(book)
      .select(col("vec_id"), col("code_id"), posexplode(array(
        (0 until PqSubspaces).map { j =>
          val a = slice(col("cv"), j * PqSubDim + 1, PqSubDim)
          val b = slice(col("codev"), j * PqSubDim + 1, PqSubDim)
          struct(l2sq(a, b).as("d"), b.as("subv"))
        }: _*)))
      .select(col("vec_id"), col("code_id"), col("pos").as("j"),
        col("col.d").as("d"), col("col.subv").as("subv"))
    val codes = graft.plans.TopK.perKey(enc0,
      keyCols = Seq("vec_id", "j"),
      orderBy = Seq("d" -> true, "code_id" -> true), k = 1)
    val recon = codes.groupBy("vec_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("j").as("j"), col("subv").as("v")))),
        x => x.getField("v"))).as("rv"))
    assigned.join(recon, "vec_id")
  }

  /** The probe half of [[ivfPqTopK]] against a PREBUILT
    * `(vec_id, bucket, rv)` index (from [[ivfPqIndex]], usually read
    * back from parquet): only the query side computes anything fresh —
    * the corpus contributes index scans plus the raw-vector lookup for
    * the `rerank` survivors. */
  def ivfPqProbe(queries: DataFrame, corpus: DataFrame, index: DataFrame,
                 k: Int, numCentroids: Int = 16, nprobe: Int = 3,
                 rerank: Int = 20): DataFrame = {
    val c = corpus.select(col("id").as("vec_id"), vec(col("vec")).as("cv"))
    val coarse = broadcast(sampledCentroids(corpus, numCentroids))
    val q = queries.select(col("id").as("query_id"), vec(col("vec")).as("qv"))
    val probes = broadcast(graft.plans.TopK.perKey(
      q.crossJoin(coarse)
        .select(col("query_id"), col("qv"), col("cent_id"),
          cosine(col("qv"), col("centv")).as("csim")),
      keyCols = Seq("query_id"),
      orderBy = Seq("csim" -> false, "cent_id" -> true), k = nprobe)
      .select(col("query_id"), col("qv"), col("cent_id").as("bucket")))
    val approx = graft.plans.TopK.perKey(
      index.join(probes, "bucket")
        .select(col("query_id"), col("vec_id"),
          cosine(col("qv"), col("rv")).as("asim")),
      keyCols = Seq("query_id"),
      orderBy = Seq("asim" -> false, "vec_id" -> true), k = rerank)
    val scored = approx.select("query_id", "vec_id")
      .join(c, "vec_id").join(broadcast(q), "query_id")
      .select(col("query_id"), col("vec_id"),
        cosine(col("qv"), col("cv")).as("sim"))
    rankPerKey(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs: candidates = identical full
    * [[PairBits]]-bit sketch (direction-preserving copies always collide;
    * one equi-join on the sketch key, no pairwise scan), verified by exact
    * cosine >= `threshold`. */
  def cosinePairs(vectors: DataFrame, threshold: Double): DataFrame = {
    val sk = graft.util.Views.materialize(vectors
      .select(col("id"), vec(col("vec")).as("v"))
      .withColumn("sketch", sketchCol(col("v"), PairBits)))
    sk.as("a").join(sk.as("b"),
        col("a.sketch") === col("b.sketch") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.v"), col("b.v")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Injected-near-dup id offsets: 1e12 apart like
    * [[graft.dedup.Dedup.NearOffset]] (disjoint from any plausible real
    * vec_id space, guarded per row rather than assumed). */
  val ScaledOffset = 1000000000000L
  val PerturbedOffset = 2000000000000L

  /** Deterministic near-dup injection over `embeddings` (the synthetic
    * vectors are random ⇒ no true near-dups exist): +[[ScaledOffset]] =
    * the same direction rescaled (cosine exactly 1 up to FP),
    * +[[PerturbedOffset]] = first component zeroed (small angular
    * perturbation). Mirrored in [[augmentedSql]]. */
  def augmented(embeddings: DataFrame): DataFrame = {
    val guardedId = when(
      assert_true(col("vec_id") >= 0 && col("vec_id") < ScaledOffset,
        lit(s"vec_id must be in [0, $ScaledOffset) for disjoint near-dup injection")).isNull,
      col("vec_id"))
    val base = embeddings.select(guardedId.as("id"),
      vec(col("embedding")).as("vec"))
    base
      .unionByName(base.filter(col("id") % 10 === 0)
        .select((col("id") + ScaledOffset).as("id"),
          transform(col("vec"), x => x * 1.5).as("vec")))
      .unionByName(base.filter(col("id") % 7 === 0)
        .select((col("id") + PerturbedOffset).as("id"),
          // Spark transform index is 0-based (DuckDB's is 1-based)
          transform(col("vec"), (x, i) => when(i === 0, 0.0).otherwise(x)).as("vec")))
  }

  // --------------------------------------------------------------- oracle

  /** In-order double fold dot product (bit-identical to [[dot]]). */
  def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), p -> p[1] * p[2]), (acc, x) -> acc + x)"

  def cosineSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  /** ±1 hyperplane literal for plane `j` (same constants as
    * [[hyperplanes]]). */
  private def planeSql(j: Int): String =
    hyperplanes(j).map(s => s"$s.0").mkString("[", ",", "]")

  def bandKeySql(v: String, b: Int): String =
    (b * BitsPerBand until (b + 1) * BitsPerBand).map { j =>
      s"(CASE WHEN ${dotSql(v, planeSql(j))} > 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")

  /** `bits`-wide sign sketch — the SQL mirror of the native
    * [[graft.functions.SignSketch]] (identical planes, identical in-order
    * fold per projection). */
  def sketchSql(v: String, bits: Int = NumBits): String =
    (0 until bits).map { j =>
      s"(CASE WHEN ${dotSql(v, planeSql(j))} > 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")

  /** `vecs(id, vec DOUBLE[])` view of the embeddings table. */
  val vecsSql: String =
    "(SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings)"

  val augmentedSql: String =
    s"""(SELECT id, vec FROM $vecsSql v
       | UNION ALL SELECT id + $ScaledOffset, list_transform(vec, x -> x * 1.5)
       |   FROM $vecsSql v WHERE id % 10 = 0
       | UNION ALL SELECT id + $PerturbedOffset,
       |   list_transform(vec, (x, i) -> CASE WHEN i = 1 THEN 0.0 ELSE x END)
       |   FROM $vecsSql v WHERE id % 7 = 0)""".stripMargin

  def bruteTopKSql(queriesRel: String, corpusRel: String, k: Int): String =
    s"""scored AS (
       |  SELECT q.id AS query_id, c.id AS vec_id,
       |    ${cosineSql("q.vec", "c.vec")} AS sim
       |  FROM $corpusRel c CROSS JOIN $queriesRel q),
       |ranked AS (
       |  SELECT query_id, vec_id, sim,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS INTEGER) AS rank
       |  FROM scored),
       |topk AS (SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= $k)""".stripMargin

  def rhpTopKSql(queriesRel: String, corpusRel: String, k: Int): String = {
    val bandRows = (0 until NumBands)
      .map(b => s"SELECT id, $b AS band_idx, ${bandKeySql("vec", b)} AS band_key FROM src")
      .mkString("\nUNION ALL ")
    s"""qb AS (WITH src AS (SELECT * FROM $queriesRel q) $bandRows),
       |cb AS (WITH src AS (SELECT * FROM $corpusRel c) $bandRows),
       |cand AS (
       |  SELECT DISTINCT qb.id AS query_id, cb.id AS vec_id
       |  FROM cb JOIN qb ON cb.band_idx = qb.band_idx AND cb.band_key = qb.band_key),
       |scored AS (
       |  SELECT cand.query_id, cand.vec_id,
       |    ${cosineSql("q.vec", "c.vec")} AS sim
       |  FROM cand
       |  JOIN $corpusRel c ON c.id = cand.vec_id
       |  JOIN $queriesRel q ON q.id = cand.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, sim,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS INTEGER) AS rank
       |  FROM scored),
       |topk AS (SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= $k)""".stripMargin
  }

  def ivfTopKSql(queriesRel: String, corpusRel: String, k: Int,
                 numCentroids: Int = 16, nprobe: Int = 3): String =
    s"""cents AS (SELECT id AS cent_id, vec AS centv FROM $corpusRel c
       |  ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT $numCentroids),
       |${ivfProbeSql(queriesRel, corpusRel, k, nprobe)}""".stripMargin

  /** CTE chain ending in `cents(cent_id, centv)`: the [[trainCentroids]]
    * mirror for ONE Lloyd iteration over the md5-sampled seed — exact
    * DECIMAL(38,18) per-dimension sums, double division (same operand
    * order as the Spark side). */
  def trainedCentsSql(corpusRel: String, numCentroids: Int = 16): String = {
    val means = (0 until VecDim).map(d =>
      s"CAST(sum(CAST(cv[${d + 1}] AS DECIMAL(38,18))) AS DOUBLE) / count(*)")
      .mkString("[", ",\n      ", "]")
    s"""cents0 AS (SELECT id AS cent_id, vec AS centv FROM $corpusRel c
       |  ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT $numCentroids),
       |assigned0 AS (
       |  SELECT vec_id, cv, cent_id FROM (
       |    SELECT v.id AS vec_id, v.vec AS cv, cents0.cent_id,
       |      row_number() OVER (PARTITION BY v.id
       |        ORDER BY ${cosineSql("v.vec", "cents0.centv")} DESC, cents0.cent_id) AS r
       |    FROM $corpusRel v CROSS JOIN cents0)
       |  WHERE r = 1),
       |cents AS (
       |  SELECT cent_id, $means AS centv
       |  FROM assigned0 GROUP BY cent_id)""".stripMargin
  }

  /** Probe/re-rank CTE chain of the IVF path — assumes a
    * `cents(cent_id, centv)` CTE is already in scope; ends in `topk`. */
  def ivfProbeSql(queriesRel: String, corpusRel: String, k: Int,
                  nprobe: Int = 3): String =
    s"""assigned AS (
       |  SELECT vec_id, cv, cent_id FROM (
       |    SELECT v.id AS vec_id, v.vec AS cv, cents.cent_id,
       |      row_number() OVER (PARTITION BY v.id
       |        ORDER BY ${cosineSql("v.vec", "cents.centv")} DESC, cents.cent_id) AS r
       |    FROM $corpusRel v CROSS JOIN cents)
       |  WHERE r = 1),
       |probes AS (
       |  SELECT query_id, qv, cent_id FROM (
       |    SELECT q.id AS query_id, q.vec AS qv, cents.cent_id,
       |      row_number() OVER (PARTITION BY q.id
       |        ORDER BY ${cosineSql("q.vec", "cents.centv")} DESC, cents.cent_id) AS r
       |    FROM $queriesRel q CROSS JOIN cents)
       |  WHERE r <= $nprobe),
       |scored AS (
       |  SELECT p.query_id, a.vec_id, ${cosineSql("p.qv", "a.cv")} AS sim
       |  FROM assigned a JOIN probes p ON a.cent_id = p.cent_id),
       |ranked AS (
       |  SELECT query_id, vec_id, sim,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS INTEGER) AS rank
       |  FROM scored),
       |topk AS (SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= $k)""".stripMargin

  /** CTE chain ending in `topk` — the [[pqTopK]] mirror: same codebook
    * sample, same dot-identity subspace distances (in-order folds), same
    * (d, cent_id) argmin tiebreak, same j-sorted reconstruction, same
    * rerank-then-exact pipeline. */
  def pqTopKSql(queriesRel: String, corpusRel: String, k: Int,
                rerank: Int = 20): String = {
    def sub(v: String, j: Int) =
      s"$v[${j * PqSubDim + 1}:${(j + 1) * PqSubDim}]"
    def l2(a: String, b: String) =
      s"(${dotSql(a, a)} - 2.0 * ${dotSql(a, b)} + ${dotSql(b, b)})"
    val encRows = (0 until PqSubspaces).map { j =>
      s"""SELECT vec_id, cent_id, $j AS j,
         |    ${l2(sub("cv", j), sub("centv", j))} AS d,
         |    ${sub("centv", j)} AS subv FROM vc""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""cents AS (SELECT id AS cent_id, vec AS centv FROM $corpusRel c
       |  ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT $PqCodewords),
       |vc AS (SELECT v.id AS vec_id, v.vec AS cv, cents.cent_id, cents.centv
       |       FROM $corpusRel v CROSS JOIN cents),
       |enc0 AS ($encRows),
       |assigned AS (
       |  SELECT vec_id, j, subv FROM (
       |    SELECT vec_id, j, subv,
       |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d ASC, cent_id) AS r
       |    FROM enc0)
       |  WHERE r = 1),
       |recon AS (
       |  SELECT vec_id,
       |    flatten(list_transform(list_sort(list(struct_pack(j := j, v := subv))),
       |                           x -> x.v)) AS rv
       |  FROM assigned GROUP BY vec_id),
       |approx AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT q.id AS query_id, r.vec_id,
       |      row_number() OVER (PARTITION BY q.id
       |        ORDER BY ${cosineSql("q.vec", "r.rv")} DESC, r.vec_id) AS ar
       |    FROM recon r CROSS JOIN $queriesRel q)
       |  WHERE ar <= $rerank),
       |scored AS (
       |  SELECT a.query_id, a.vec_id, ${cosineSql("q.vec", "c.vec")} AS sim
       |  FROM approx a
       |  JOIN $corpusRel c ON c.id = a.vec_id
       |  JOIN $queriesRel q ON q.id = a.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, sim,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS INTEGER) AS rank
       |  FROM scored),
       |topk AS (SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= $k)""".stripMargin
  }

  /** CTE chain ending in `topk` — the [[ivfPqTopK]] mirror: coarse
    * sample/probe per the IVF mirror, codebook/encode/reconstruct per
    * the PQ mirror, ADC restricted to probed buckets, exact re-rank. */
  def ivfPqTopKSql(queriesRel: String, corpusRel: String, k: Int,
                   numCentroids: Int = 16, nprobe: Int = 3,
                   rerank: Int = 20): String = {
    def sub(v: String, j: Int) =
      s"$v[${j * PqSubDim + 1}:${(j + 1) * PqSubDim}]"
    def l2(a: String, b: String) =
      s"(${dotSql(a, a)} - 2.0 * ${dotSql(a, b)} + ${dotSql(b, b)})"
    val encRows = (0 until PqSubspaces).map { j =>
      s"""SELECT vec_id, code_id, $j AS j,
         |    ${l2(sub("cv", j), sub("codev", j))} AS d,
         |    ${sub("codev", j)} AS subv FROM vb""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""coarse AS (SELECT id AS cent_id, vec AS centv FROM $corpusRel c
       |  ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT $numCentroids),
       |book AS (SELECT id AS code_id, vec AS codev FROM $corpusRel c
       |  ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT $PqCodewords),
       |assigned AS (
       |  SELECT vec_id, bucket FROM (
       |    SELECT v.id AS vec_id, coarse.cent_id AS bucket,
       |      row_number() OVER (PARTITION BY v.id
       |        ORDER BY ${cosineSql("v.vec", "coarse.centv")} DESC, coarse.cent_id) AS r
       |    FROM $corpusRel v CROSS JOIN coarse)
       |  WHERE r = 1),
       |vb AS (SELECT v.id AS vec_id, v.vec AS cv, book.code_id, book.codev
       |       FROM $corpusRel v CROSS JOIN book),
       |enc0 AS ($encRows),
       |codes AS (
       |  SELECT vec_id, j, subv FROM (
       |    SELECT vec_id, j, subv,
       |      row_number() OVER (PARTITION BY vec_id, j ORDER BY d ASC, code_id) AS r
       |    FROM enc0)
       |  WHERE r = 1),
       |recon AS (
       |  SELECT vec_id,
       |    flatten(list_transform(list_sort(list(struct_pack(j := j, v := subv))),
       |                           x -> x.v)) AS rv
       |  FROM codes GROUP BY vec_id),
       |idx AS (SELECT a.vec_id, a.bucket, r.rv
       |        FROM assigned a JOIN recon r USING (vec_id)),
       |probes AS (
       |  SELECT query_id, qv, bucket FROM (
       |    SELECT q.id AS query_id, q.vec AS qv, coarse.cent_id AS bucket,
       |      row_number() OVER (PARTITION BY q.id
       |        ORDER BY ${cosineSql("q.vec", "coarse.centv")} DESC, coarse.cent_id) AS r
       |    FROM $queriesRel q CROSS JOIN coarse)
       |  WHERE r <= $nprobe),
       |approx AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT p.query_id, i.vec_id,
       |      row_number() OVER (PARTITION BY p.query_id
       |        ORDER BY ${cosineSql("p.qv", "i.rv")} DESC, i.vec_id) AS ar
       |    FROM idx i JOIN probes p USING (bucket))
       |  WHERE ar <= $rerank),
       |scored AS (
       |  SELECT a.query_id, a.vec_id, ${cosineSql("q.vec", "c.vec")} AS sim
       |  FROM approx a
       |  JOIN $corpusRel c ON c.id = a.vec_id
       |  JOIN $queriesRel q ON q.id = a.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, sim,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS INTEGER) AS rank
       |  FROM scored),
       |topk AS (SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= $k)""".stripMargin
  }

  def cosinePairsSql(vectorsRel: String, threshold: Double): String =
    s"""sk AS (SELECT id, vec, ${sketchSql("vec", PairBits)} AS sketch FROM $vectorsRel v),
       |pairs AS (
       |  SELECT * FROM (
       |    SELECT a.id AS id_a, b.id AS id_b, ${cosineSql("a.vec", "b.vec")} AS sim
       |    FROM sk a JOIN sk b ON a.sketch = b.sketch AND a.id < b.id)
       |  WHERE sim >= $threshold)""".stripMargin
}
