package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines — the
  * north-star extension surface beyond the reference's own operators
  * (SURVEY.md §7.3-5). Three tiers, each the standard shape used at
  * web-corpus scale:
  *
  *  1. [[exactGroups]]: normalize → md5 fingerprint → hash group-by.
  *     One shuffle on a 32-byte key; the canonical "exact dedup" of every
  *     corpus pipeline. At 100 TB the fingerprint group-by is the only
  *     shuffle and AQE handles the (rare) viral-duplicate skew.
  *  2. [[jaccardPairs]]: n-gram shingle Jaccard via the explode→join→count
  *     MapReduce pattern — no array intersection on pairs, no cartesian
  *     product: docs that share zero shingles never meet. Shuffle key =
  *     shingle string.
  *  3. [[lshVerifiedPairs]]: MinHash + banded LSH. Signatures and band
  *     keys are pure per-row projections (no shuffle); candidate
  *     generation is an equi-join on band key; Jaccard verification runs
  *     only over docs that appear in some candidate pair (semi-join
  *     restriction) — this is what makes near-dedup sub-quadratic at
  *     corpus scale.
  *
  * Every hash is md5-derived so the DuckDB oracle reproduces results
  * bit-for-bit: minhash_j(doc) = lexicographic min over shingles of
  * md5(j ':' shingle) — deterministic on any engine, any partitioning.
  */
object Dedup {

  val ShingleN = 3
  val NumHashes = 12
  val NumBands = 4 // 4 bands x 3 rows

  /** Case/whitespace-insensitive canonical text form (shared contract:
    * [[graft.util.Norm]]). */
  def normalize(c: Column): Column = graft.util.Norm.normalize(c)

  /** Exact-duplicate groups: fingerprint, canonical (min) id, copy count.
    * (Spark: md5 of UTF-8 bytes; identical in DuckDB.) */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("fingerprint", md5(normalize(col(textCol)).cast("binary")))
      .groupBy("fingerprint")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Distinct word-`n`-gram shingles of the normalized text, as a column.
    * Docs shorter than `n` words yield an empty array.
    *
    * Backed by the native [[graft.functions.WordShingles]] Catalyst
    * expression (codegen'd; one static call per row) rather than
    * `transform(sequence(...))`+`array_distinct` — Spark's higher-order
    * array functions are evaluated interpreted per row, and profiling at
    * sf0.1 showed that chain dominating the whole dedup pipeline (9 s of
    * a 22 s query) — or a Scala UDF, which pays an encoder round-trip.
    */
  def shingles(textCol: Column, n: Int = ShingleN): Column = {
    val normalized = normalize(textCol)
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.WordShingles(
        org.apache.spark.sql.GraftColumnBridge.expression(normalized), n))
  }

  /** (doc id, shingle) exploded view — the unit of the explode→join
    * pattern. */
  private def shingleRows(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), explode(shingles(col(textCol))).as("sh"))

  /** [[shingleRows]] over a doc frame first CLUSTERED BY ID — the
    * writeLshIndexBucketed/probe-side discipline (SCALE.md "sf1.0
    * rehearsal") applied to the in-query tiers (round 13): one linear
    * shuffle of DOC rows (~3× narrower than their shingles) buys
    * (a) id-clustered shingle partitions, so the signature aggregate and
    * every id-keyed count/join downstream combines map-side instead of
    * shipping scattered partials, and (b) scan-width independence — a
    * small-file corpus scan is a SINGLE task (sf0.1: every table is one
    * <128 MB parquet file), and without the repartition the whole
    * normalize→shingle→minhash derivation runs on one core of the
    * session (measured round 13: the md5 family per shingle row is the
    * dedup tiers' dominant CPU, serialized on 1 of 32 cores). */
  private def shingleRowsClustered(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    shingleRows(docs.repartition(col(idCol)), idCol, textCol)

  /** All pairs with n-gram Jaccard ≥ `threshold`, via shingle-join
    * counting: |A∩B| from the join, |A| and |B| from per-doc counts.
    * `candidates` (optional) restricts the join to ids occurring in the
    * candidate pair set — the LSH verification path.
    *
    * At corpus scale pass `maxDocFreq` (skew guard) or `candidates`
    * (bounded join): the unrestricted uncapped form is the exact-recall
    * DIAGNOSTIC baseline only — quadratic on any hot shingle (see
    * SCALE.md "Deduplication"). */
  /** `maxDocFreq`: drop shingles occurring in more than that many docs
    * before pairing — the standard skew guard against boilerplate n-grams
    * (a shingle shared by k docs contributes k(k-1)/2 join rows; at corpus
    * scale an unguarded hot shingle is a quadratic blowup on one key).
    * Jaccard is then defined over the surviving "discriminative" shingle
    * space on BOTH the intersection and union side, so it remains a true
    * Jaccard of (filtered) sets.
    *
    * PRECONDITION on `candidates`: the (id_a, id_b) pair set must be
    * DISTINCT (ADVICE r10). The pair-keyed verification intersects
    * shingle sets THROUGH the pair list, so a duplicated pair row
    * multiplies its n_common by the duplicate count and overstates
    * Jaccard. Every candidate producer in this engine ends in
    * `.distinct()` (band self-joins must dedup multi-band collisions
    * anyway); a caller synthesizing pairs elsewhere owns the same
    * dedup — re-distincting here would tax every internal caller with a
    * redundant shuffle of the pair set. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double,
                   candidates: Option[DataFrame] = None,
                   maxDocFreq: Option[Long] = None): DataFrame = {
    val shAll = shingleRowsClustered(docs, idCol, textCol)
    // The shingle view feeds three consumers (per-doc counts + both self-
    // join sides); materialize (eager persist — see [[graft.util.Views]])
    // so the normalize→split→n-gram derivation runs once, not once per
    // concurrent consumer stage. Lineage-TRUNCATED so downstream join
    // plans stop embedding the derivation tree (round 13).
    candidates match {
      case Some(cand) =>
        // PAIR-KEYED verification (round 10 — the sf10 finding): with a
        // candidate list in hand, intersect shingle sets THROUGH it
        // instead of self-joining the restricted shingle view and
        // semi-joining candidates afterwards. The shingle self-join's
        // output is Σ_sh occ² over candidate-doc occupancies — on a
        // corpus whose self-dedup candidates cover half the docs
        // (sf10: 407 k of 717 k), a frequent trigram makes that
        // quadratic regardless of the candidate restriction (measured:
        // 1 059 s at sf10, all CPU in the verify join). The pair-keyed
        // plan is linear in |pairs| × shingles-per-doc.
        val sh = graft.util.Views.materializeTruncated(
          capByDocFreq(shAll.join(candidateIds(cand), "id"), maxDocFreq))
        jaccardForPairs(cand, sh, threshold)
      case None =>
        val sh = graft.util.Views.materializeTruncated(shAll)
        jaccardFromShingles(sh, threshold, maxDocFreq)
    }
  }

  /** Apply the [[pairStats]] doc-frequency cap to an (id, sh) view
    * up-front (the candidate-path needs it BEFORE pair-keyed
    * verification so Jaccard stays defined over the same filtered
    * shingle space on both the intersection and count side). */
  private def capByDocFreq(sh0: DataFrame, maxDocFreq: Option[Long]): DataFrame =
    maxDocFreq match {
      case Some(cap) =>
        val keep = sh0.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select("sh")
        sh0.join(keep, "sh")
      case None => sh0
    }

  /** Exact Jaccard for EXACTLY the given (id_a, id_b) pairs, from an
    * (id, sh) shingle view covering both sides: per-pair intersection
    * via two keyed joins THROUGH the pair list — |A∩B| rows appear only
    * for listed pairs, so cost is |pairs| × shingles-per-doc, never
    * Σ_sh occ² (see [[jaccardPairs]]). Pairs sharing zero surviving
    * shingles drop out of the inner join — they cannot pass any
    * threshold > 0, and at threshold 0 the old shingle-self-join shape
    * dropped them identically. */
  private def jaccardForPairs(pairs: DataFrame, sh: DataFrame,
                              threshold: Double): DataFrame = {
    val counts = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val common = pairs
      .join(sh.select(col("id").as("id_a"), col("sh")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh")), Seq("id_b", "sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    common
      .join(counts.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(counts.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard", col("n_common") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Distinct doc ids occurring in a candidate pair set. */
  private def candidateIds(cand: DataFrame): DataFrame =
    cand.select(col("id_a").as("id"))
      .union(cand.select(col("id_b").as("id"))).distinct()

  /** Pair statistics from an (id, sh) shingle view the caller has already
    * restricted/persisted: (id_a, id_b, n_common, n_a, n_b) for every pair
    * sharing at least one surviving shingle. The shared core of both
    * set-similarity metrics ([[jaccardPairs]], [[overlapPairs]]). */
  private def pairStats(sh0: DataFrame,
                        maxDocFreq: Option[Long] = None): DataFrame = {
    // (id, sh) rows are distinct per doc, so doc frequency = row count.
    val sh = maxDocFreq match {
      case Some(cap) =>
        val keep = sh0.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select("sh")
        graft.util.Views.materializeTruncated(sh0.join(keep, "sh"))
      case None => sh0
    }
    val counts = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val common = sh.as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(counts.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(counts.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
  }

  /** ONE materialized clustered shingle view for callers that feed
    * SEVERAL Dedup stages from the same corpus (round 13 — the LSH
    * retrieval audit derives both its exact-truth and candidate sides
    * from it, one normalize→shingle pass instead of two). */
  private[graft] def shingleView(docs: DataFrame, idCol: String,
                                 textCol: String): DataFrame =
    graft.util.Views.materializeTruncated(
      shingleRowsClustered(docs, idCol, textCol))

  /** Jaccard pairs from an (id, sh) shingle view the caller has already
    * restricted/persisted. */
  private[graft] def jaccardFromShingles(sh0: DataFrame, threshold: Double,
                                  maxDocFreq: Option[Long] = None): DataFrame =
    pairStats(sh0, maxDocFreq)
      .withColumn("jaccard", col("n_common") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")

  /** All pairs with shingle OVERLAP COEFFICIENT ≥ `threshold`:
    * |A∩B| / min(|A|, |B|). The subset-duplication detector Jaccard
    * structurally misses: a short doc fully quoted inside a much longer
    * one has overlap 1.0 but Jaccard ≈ |A|/|B| → 0 as the length ratio
    * grows. Standard third tier of web-corpus dedup (exact → Jaccard →
    * containment). Same explode→join→count plan as [[jaccardPairs]] —
    * docs sharing zero shingles never meet, `maxDocFreq` is the same
    * mandatory skew guard at corpus scale. */
  def overlapPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double,
                   maxDocFreq: Option[Long] = None): DataFrame =
    pairStats(shingleRowsClustered(docs, idCol, textCol), maxDocFreq)
      .withColumn("overlap", col("n_common") / least(col("n_a"), col("n_b")))
      .filter(col("overlap") >= threshold)
      .select("id_a", "id_b", "overlap")

  /** MinHash signature: element j = min over shingles of md5(j ':' sh).
    * Lexicographic min over fixed-width hex = uniform min-hash; identical
    * in any engine. NULL (empty shingle set) docs are dropped upstream. */
  def minhashSignature(shCol: Column): Column = {
    val mins = (0 until NumHashes).map(j =>
      array_min(transform(shCol, x => md5(concat(lit(s"$j:"), x)))))
    array(mins: _*)
  }

  /** Per-doc minhash SIGNATURES as a [[NumHashes]]-element array, via the
    * FLAT codegen path (round 13): explode shingles (id-clustered), one
    * native [[graft.functions.MinhashRow]] call per shingle row, then a
    * partial+final min-per-component aggregate — the
    * [[bandRowsFromShingles]] signature stage without the banding.
    * Bit-identical to [[minhashSignature]]'s higher-order array form
    * (lexicographic min over the same md5 strings) but codegen
    * end-to-end, parallel across the clustered shingle partitions, and
    * map-side-combining where the array form is interpreted per row
    * inside the scan task. Docs with no shingles emit no row (the array
    * form yields an all-NULL signature for them — callers here join
    * signatures through candidate pairs, which shingle-less docs cannot
    * enter, so the surfaces agree). */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = NumHashes): DataFrame = {
    val sh = shingleRowsClustered(docs, idCol, textCol)
    val hs = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.MinhashRow(
        org.apache.spark.sql.GraftColumnBridge.expression(col("sh")), numHashes))
    sh.select(col("id"), hs.as("hs")).groupBy("id").agg(
        min(element_at(col("hs"), 1)).as("h0"),
        (1 until numHashes).map(j =>
          min(element_at(col("hs"), j + 1)).as(s"h$j")): _*)
      .select(col("id"),
        array((0 until numHashes).map(j => col(s"h$j")): _*).as("sig"))
  }

  /** Candidate pairs: docs sharing any (band index, band key).
    *
    * The signature is computed in flat form — explode shingles, project the
    * [[NumHashes]] md5 columns in one whole-stage-codegen pass, then
    * `min(h_j)` per doc in a partial+final hash aggregate — rather than via
    * [[minhashSignature]]'s array expression: higher-order array functions
    * are interpreted per row, while the flat plan is codegen end-to-end and
    * map-side combines before the one shuffle on doc id. Values are
    * identical (lexicographic min over the same md5 strings; docs with no
    * shingles drop out of the explode, matching the `size > 0` filter).
    */
  def lshCandidates(docs: DataFrame, idCol: String, textCol: String,
                    bucketCap: Option[Long] = None,
                    numHashes: Int = NumHashes,
                    numBands: Int = NumBands): DataFrame =
    lshCandidatesFromShingles(shingleRowsClustered(docs, idCol, textCol),
      bucketCap, numHashes, numBands)

  /** (id, band_idx, band_key) band rows from an (id, sh) shingle view —
    * the LSH band INDEX, materialized (at cluster scale this is computed
    * once and stored; incremental ingest probes it). One native
    * MinhashRow call per shingle row computes the whole hash family
    * (reused digest, byte-level prefixes); the aggregate then takes
    * [[NumHashes]] mins over cheap array reads instead of that many
    * md5(concat) chains per row. */
  private def bandRowsFromShingles(sh: DataFrame,
                                   numHashes: Int = NumHashes,
                                   numBands: Int = NumBands): DataFrame = {
    require(numHashes % numBands == 0, "numBands must divide numHashes")
    val rows = numHashes / numBands
    val hs = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.MinhashRow(
        org.apache.spark.sql.GraftColumnBridge.expression(col("sh")), numHashes))
    val sig = sh.select(col("id"), hs.as("hs")).groupBy("id").agg(
      min(element_at(col("hs"), 1)).as("h0"),
      (1 until numHashes).map(j =>
        min(element_at(col("hs"), j + 1)).as(s"h$j")): _*)
    val bandKeyCols = (0 until numBands).map { b =>
      md5(concat_ws("|", (b * rows until (b + 1) * rows).map(r => col(s"h$r")): _*))
    }
    // Materialize before any join so the minhash plan runs once, not
    // once per concurrently-scheduled join side; lineage-truncated so
    // downstream self-join plans stop embedding the [[NumHashes]]
    // min-of-md5 aggregate columns (round 13 — the expression text alone
    // made every consumer plan ~0.5 MB and its re-analysis measurable).
    graft.util.Views.materializeTruncated(sig
      .select(col("id"), posexplode(array(bandKeyCols: _*)))
      .toDF("id", "band_idx", "band_key"))
  }

  /** LSH candidates from an (id, sh) shingle view. `bucketCap` is the
    * HOT-BUCKET guard the sf1 scale rehearsal motivated (SCALE.md): the
    * band self-join's output grows with Σ occ² over bucket occupancies,
    * so a low-entropy corpus region (boilerplate, templated text) can
    * turn one bucket into a quadratic candidate bomb. Buckets larger
    * than the cap are dropped BEFORE the self-join (one keyed count +
    * semi-join — the maxDocFreq discipline applied at the band tier);
    * their members still meet in their other [[NumBands]]−1 bands unless
    * hot everywhere, which is exactly the boilerplate case a curation
    * pipeline WANTS suppressed. */
  private[graft] def lshCandidatesFromShingles(sh: DataFrame,
                                        bucketCap: Option[Long] = None,
                                        numHashes: Int = NumHashes,
                                        numBands: Int = NumBands): DataFrame =
    lshCandidatesFromBands(
      bandRowsFromShingles(sh, numHashes, numBands), bucketCap)

  /** Candidate pairs from an (id, band_idx, band_key) band view — the
    * band self-join shared by the in-query tier (bands derived from
    * shingles above) and the STORED tier (bands scanned from the
    * published index; see [[lshVerifiedPairsStored]]). `bucketCap` is
    * the hot-bucket guard documented on [[lshCandidatesFromShingles]]. */
  private def lshCandidatesFromBands(withBands0: DataFrame,
                                     bucketCap: Option[Long] = None): DataFrame = {
    val withBands = bucketCap.fold(withBands0) { cap =>
      val ok = withBands0.groupBy("band_idx", "band_key")
        .agg(count(lit(1)).as("occ")).filter(col("occ") <= cap)
        .select("band_idx", "band_key")
      withBands0.join(ok, Seq("band_idx", "band_key"), "left_semi")
    }
    withBands.as("a")
      .join(withBands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** INCREMENTAL near-dedup — the LSH twin of the exact-hash ingest path:
    * the `batch` docs with NO verified near-duplicate (Jaccard ≥
    * `threshold` over word shingles) in the `existing` corpus nor among
    * EARLIER batch docs (smaller id = arrived first). Scale shape: only
    * the batch's band rows PROBE the band index — the corpus never
    * self-joins, so candidate fan-in is |batch bands| × bucket occupancy
    * (at 100 TB the index is precomputed and stored; here it is derived
    * in-query by the same [[bandRowsFromShingles]] that would build it).
    * Verification joins batch shingles against candidate-partner shingles
    * only. Batch docs with no shingles trivially survive. */
  def lshNewDocs(batch: DataFrame, existing: DataFrame, idCol: String,
                 textCol: String, threshold: Double): DataFrame = {
    // PRECONDITION (enforced): batch and existing id spaces are DISJOINT.
    // shPartner in the probe unions both sides keyed only by id, so a doc
    // id present on both sides would double-count its shingles in n_b and
    // corrupt the Jaccard verdict. One id-projected semi-join probe up
    // front (batch ids broadcast; the corpus side is a single-column
    // scan — negligible next to the shingle joins that follow) fails
    // loudly instead of silently mis-verifying.
    require(existing.select(col(idCol))
        .join(broadcast(batch.select(col(idCol))), Seq(idCol), "left_semi")
        .isEmpty,
      "lshNewDocs: batch and existing share doc ids — the id spaces must be disjoint")
    // Materialized: feeds BOTH the index banding and the partner-shingle
    // verification side — without it the normalize→shingle derivation of
    // the (large) existing corpus runs twice.
    val shE = graft.util.Views.materializeTruncated(
      shingleRowsClustered(existing, idCol, textCol))
    lshNewDocsAgainstIndex(batch, bandRowsFromShingles(shE), shE,
      idCol, textCol, threshold, guardDisjoint = false)
  }

  /** The probe half of [[lshNewDocs]], against a PREBUILT existing-side
    * index: `bandE` = the (id, band_idx, band_key) band index, `shE` =
    * the (id, sh) exploded shingle store — the two write-once artifacts
    * a 100 TB ingest pipeline keeps on durable storage ([[writeLshIndex]]
    * / [[readLshIndex]]; at that scale the index is appended per ingested
    * batch, never rebuilt). Only the batch side is shingled/banded
    * in-query; the corpus contributes index scans. `guardDisjoint`
    * repeats the id-disjointness probe against the shingle store (set
    * false when the caller already guarded the full frames). */
  def lshNewDocsAgainstIndex(batch: DataFrame, bandE: DataFrame, shE: DataFrame,
                             idCol: String, textCol: String, threshold: Double,
                             guardDisjoint: Boolean = true): DataFrame = {
    if (guardDisjoint)
      require(shE.select("id")
          .join(broadcast(batch.select(col(idCol).as("id"))), Seq("id"), "left_semi")
          .isEmpty,
        "lshNewDocsAgainstIndex: batch ids collide with the stored index — " +
          "the id spaces must be disjoint")
    // Cluster the BATCH by doc id before shingling — the writeLshIndex
    // discipline applied to the probe side (round 10, VERDICT r9 task
    // #6): the explode preserves the hash partitioning, so the batch's
    // signature aggregate and every id-keyed probe stage downstream run
    // without shuffling shingle rows; the one exchange paid here is on
    // doc rows, ~3× smaller than their shingles (sf10 measured the
    // un-clustered probe shipping 863 MB — mostly this stage).
    val shB = graft.util.Views.materializeTruncated(
      shingleRows(batch.repartition(col(idCol)), idCol, textCol))
    probeVerify(batch.select(col(idCol).as("doc_id")),
      bandRowsFromShingles(shB), bandE, shB, shE, threshold)
  }

  /** The candidate-generation + pair-keyed-verification core of the
    * incremental probe, GENERIC over the shingle key type: `shB` / `shE`
    * are (id, sh) views of batch and corpus in the SAME key space — raw
    * trigram strings on the legacy path ([[lshNewDocsAgainstIndex]]),
    * 8-byte dictionary ids on the encoded path
    * ([[lshNewDocsAgainstIndexEncoded]]). The verification joins key on
    * `sh`, so the key's byte width IS the probe's dominant shuffle
    * width — the whole point of the dictionary. */
  private def probeVerify(batchIds: DataFrame, bB: DataFrame, bandE: DataFrame,
                          shB: DataFrame, shE: DataFrame,
                          threshold: Double): DataFrame = {
    def bandMatch = col("a.band_idx") === col("b.band_idx") &&
      col("a.band_key") === col("b.band_key")
    val candE = bB.as("a").join(bandE.as("b"), bandMatch)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val candB = bB.as("a").join(bB.as("b"), bandMatch && col("b.id") < col("a.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val cand = graft.util.Views.materializeTruncated(candE.union(candB).distinct())
    val shProbe = shB.join(cand.select(col("id_a").as("id")).distinct(), "id")
    val shPartner = shB.unionByName(shE)
      .join(cand.select(col("id_b").as("id")).distinct(), "id")
    val nA = shProbe.groupBy("id").agg(count(lit(1)).as("n_a"))
      .withColumnRenamed("id", "id_a")
    val nB = shPartner.groupBy("id").agg(count(lit(1)).as("n_b"))
      .withColumnRenamed("id", "id_b")
    // Pair-keyed intersection through the candidate list (round 10 —
    // the jaccardForPairs shape): the probe-side shingle frame joins
    // candidate pairs first, so the common-shingle join emits rows for
    // LISTED pairs only — never the Σ_sh occ² of a raw shingle
    // self-join (a hot shingle shared by many partner docs made the old
    // shape quadratic at corpus scale).
    val rejected = cand
      .join(shProbe.select(col("id").as("id_a"), col("sh")), "id_a")
      .join(shPartner.select(col("id").as("id_b"), col("sh")), Seq("id_b", "sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
      .join(nA, "id_a").join(nB, "id_b")
      .filter(col("n_common") / (col("n_a") + col("n_b") - col("n_common")) >= threshold)
      .select(col("id_a").as("doc_id")).distinct()
    batchIds.join(rejected, Seq("doc_id"), "left_anti")
  }

  /** The DICTIONARY-ENCODED incremental probe against a
    * [[writeLshIndexBucketed]] index (round 11, VERDICT r10 task #1):
    * identical verdicts to [[lshNewDocsAgainstIndex]], but verification
    * against CORPUS partners joins on the stored 8-byte `sid` instead
    * of the raw trigram text (~25 bytes average) -- the strings riding
    * the (id_b, sh) join were the single largest measured byte-mover at
    * sf10 (1 108 MB probe shuffle).
    *
    * The verification is SPLIT by partner side, which is what keeps the
    * probe O(batch)-shaped:
    *  - batch-vs-CORPUS pairs intersect on sids. The batch side is
    *    encoded by ONE keyed join against the sh-bucketed dict scan
    *    (only batch rows shuffle); batch-NEW shingles -- absent from the
    *    corpus dictionary BY DEFINITION -- cannot intersect any corpus
    *    doc, so dropping them from this side is exact (they still count
    *    in n_a, which needs no shingle-keyed join at all).
    *  - batch-vs-BATCH pairs intersect on raw strings, batch-sized by
    *    construction. Deliberate: a first cut assigned probe-time dense
    *    ids to new shingles (sort + zipWithIndex per probe), and at
    *    sf10 the assignment cost MORE than the narrow keys saved
    *    (60.9 s vs the all-string 33.9 s, same host) -- new-shingle ids
    *    bought nothing the batch-local string join didn't already have.
    * Same |A intersect B|/|A|/|B| by bijection on the corpus side and
    * identity on the batch side; same oracle as the in-query twin.
    *
    * Measured same-host sf10 A/B (SCALE.md round 11): this shape
    * 29.6 s median, FLAT samples [29.6, 29.6, 30.2], 1 283 MB shuffle;
    * the all-string probe 33.9 s, swinging [28.9, 33.9, 38.0],
    * 1 108 MB. The split trades ~16% more bytes (the one-time batch
    * dict-encode shuffle) for ~13% less wall and flat reps -- and the
    * byte trade inverts in production, where a batch is ~0.1% of the
    * corpus (not the fixture's 10%): the encode shuffle scales with
    * |batch| while the partner-side string savings scale with
    * |candidate partners| * shingles/doc, which dominates. */
  def lshNewDocsAgainstIndexEncoded(batch: DataFrame, base: String,
                                    idCol: String, textCol: String,
                                    threshold: Double,
                                    guardDisjoint: Boolean = true): DataFrame = {
    val spark = batch.sparkSession
    val (bandE, _) = readLshIndexBucketed(spark, base)
    val dict = spark.table(s"${base}_dict")
    val shE = spark.table(s"${base}_shids")
    if (guardDisjoint) require(shE.select("id")
        .join(broadcast(batch.select(col(idCol).as("id"))), Seq("id"), "left_semi")
        .isEmpty,
      "lshNewDocsAgainstIndexEncoded: batch ids collide with the stored " +
        "index -- the id spaces must be disjoint")
    val shB = graft.util.Views.materializeTruncated(
      shingleRows(batch.repartition(col(idCol)), idCol, textCol))
    val bB = bandRowsFromShingles(shB)
    def bandMatch = col("a.band_idx") === col("b.band_idx") &&
      col("a.band_key") === col("b.band_key")
    // Corpus-partner and batch-partner candidates stay SEPARATE frames --
    // each feeds its own verification key space (id spaces are disjoint
    // by the guard, so the final union never conflates them).
    val candE = graft.util.Views.materializeTruncated(
      bB.as("a").join(bandE.as("b"), bandMatch)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct())
    val candB = graft.util.Views.materializeTruncated(
      bB.as("a").join(bB.as("b"), bandMatch && col("b.id") < col("a.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct())
    // Per-doc set sizes: plain row counts -- no shingle-keyed join.
    val nBatch = graft.util.Views.materializeTruncated(
      shB.groupBy("id").agg(count(lit(1)).as("n_sh")))
    val nCorpus = shE
      .join(candE.select(col("id_b").as("id")).distinct(), "id")
      .groupBy("id").agg(count(lit(1)).as("n_sh"))
    // Batch-vs-corpus intersection THROUGH the candidate list, on sids:
    // restrict batch shingles to probing docs, encode via the bucketed
    // dict (dict side exchange-free), intersect against the stored sid
    // rows of listed partners only (the pair-keyed round-10 shape).
    val shBhits = shB
      .join(candE.select(col("id_a").as("id")).distinct(), "id")
      .join(dict, "sh").select(col("id"), col("sid"))
    val shEpart = shE.join(candE.select(col("id_b").as("id")).distinct(), "id")
    val commonE = candE
      .join(shBhits.select(col("id").as("id_a"), col("sid")), "id_a")
      .join(shEpart.select(col("id").as("id_b"), col("sid")), Seq("id_b", "sid"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    // Batch-vs-batch intersection on raw strings -- batch-sized.
    val commonB = candB
      .join(shB.select(col("id").as("id_a"), col("sh")), "id_a")
      .join(shB.select(col("id").as("id_b"), col("sh")), Seq("id_b", "sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    val nA = nBatch.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a")
    val nB = nCorpus.unionByName(nBatch)
      .withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b")
    val rejected = commonE.unionByName(commonB)
      .join(nA, "id_a").join(nB, "id_b")
      .filter(col("n_common") / (col("n_a") + col("n_b") - col("n_common")) >= threshold)
      .select(col("id_a").as("doc_id")).distinct()
    batch.select(col(idCol).as("doc_id"))
      .join(rejected, Seq("doc_id"), "left_anti")
  }

  /** Materialize the existing-corpus LSH artifacts to durable storage:
    * `dir/bands` = the (id, band_idx, band_key) band index (candidate
    * generation), `dir/shingles` = the (id, sh) exploded shingle store
    * (Jaccard verification input). This is the write-once index the
    * stored-ingest path ([[lshNewDocsAgainstIndex]]) probes — the shape
    * that makes incremental near-dedup O(batch) instead of O(corpus)
    * per ingest. One shingle-derivation pass feeds both files. */
  def writeLshIndex(docs: DataFrame, idCol: String, textCol: String,
                    dir: String): Unit = {
    // Cluster the corpus by doc id BEFORE shingling (one linear shuffle of
    // doc rows — ~3x smaller than their shingle rows): the explode
    // preserves the hash partitioning, so the signature aggregate's
    // groupBy(id) is satisfied without a second exchange AND the stored
    // files come out doc-clustered — the layout the sf1 rehearsal showed
    // restores map-side collapse at any corpus size (SCALE.md "sf1.0
    // rehearsal": scattered doc ids grew the signature-stage shuffle ~45x
    // for 10x docs).
    val sh = graft.util.Views.materialize(
      shingleRows(docs.repartition(col(idCol)), idCol, textCol))
    bandRowsFromShingles(sh).write.mode("overwrite").parquet(s"$dir/bands")
    sh.write.mode("overwrite").parquet(s"$dir/shingles")
  }

  /** APPEND a batch's artifacts to an existing [[writeLshIndex]] index —
    * the steady-state index evolution of an ingest pipeline: each
    * accepted batch's bands/shingles join the index so LATER batches
    * near-dedup against it; the index is never rebuilt. (Parquet append
    * = new files alongside old; at 100 TB this is the same
    * partition-append every warehouse sink does.) */
  def appendLshIndex(docs: DataFrame, idCol: String, textCol: String,
                     dir: String): Unit = {
    val sh = graft.util.Views.materialize(shingleRows(docs, idCol, textCol))
    bandRowsFromShingles(sh).write.mode("append").parquet(s"$dir/bands")
    sh.write.mode("append").parquet(s"$dir/shingles")
  }

  /** (band index, shingle store) readers for a [[writeLshIndex]] dir. */
  def readLshIndex(spark: org.apache.spark.sql.SparkSession,
                   dir: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$dir/bands"), spark.read.parquet(s"$dir/shingles"))

  /** Bucket count of the BUCKETED index tier — matches the local[32]
    * harness; on a real cluster size it to corpus/bucket targets. */
  val IndexBuckets = 32

  /** BUCKETED stored-index tier — the doc-id-clustered layout the sf1
    * rehearsal called for (SCALE.md "sf1.0 rehearsal": the signature
    * stage's shuffle grew ~45x for 10x docs because source files scatter
    * doc ids and the explode→min-per-doc aggregate ships poorly-combined
    * partials; the fix is to WRITE the shingle view clustered by doc id
    * and feed the signature aggregate from that layout).
    *
    * Both artifacts become warehouse tables `bucketBy(numBuckets, id)`,
    * sorted by id:
    *  1. the shingle store is written first, after ONE linear
    *     doc-clustering shuffle — paid on doc rows (~3x smaller than
    *     their shingle rows), aligned with the bucket spec so each write
    *     task owns whole buckets (file count == bucket count, not
    *     tasks × buckets);
    *  2. the signature aggregate is then fed FROM the bucketed scan:
    *     `groupBy(id)` over data bucketed by id needs NO exchange, so the
    *     signature stage ships ZERO shuffle bytes at any corpus size
    *     (LshIndexSpec pins the plan; SCALE.md records the sf0.1/sf1 A/B);
    *  3. the band index inherits the scan's partitioning through the
    *     aggregate, so its bucketed write is exchange-free too.
    * Probe-time id-keyed consumers (per-doc counts, candidate-id
    * semi-joins) cluster on the stored side's distribution for free. */
  def writeLshIndexBucketed(docs: DataFrame, idCol: String, textCol: String,
                            base: String,
                            numBuckets: Int = IndexBuckets): Unit = {
    writeShingleStore(docs, idCol, textCol, base, numBuckets, bucketed = true)
    writeBandIndex(docs.sparkSession, base, numBuckets, bucketed = true)
    writeShingleDict(docs.sparkSession, base, numBuckets)
  }

  /** Deterministic DENSE ids for the distinct values in `df`'s column
    * `c`: sid = the value's 0-based rank in global binary sort order —
    * replayable on any engine (DuckDB:
    * `row_number() OVER (ORDER BY c) - 1`), exactly like the md5
    * minhash contract, and COLLISION-FREE by construction (a bijection,
    * where a hashed key would trade the string-exact oracle for a
    * 2^-64 corruption lottery — the round-10 objection to hashing).
    * Scalable shape: a range-partitioned distributed sort plus the
    * two-pass per-partition offset zip (`zipWithIndex` runs one count
    * job over the sorted partitions, then assigns offsets locally) —
    * never a single-partition window. Build-time only. */
  private[graft] def denseIds(df: DataFrame, c: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(c).cast("string").as(c)).distinct().sort(c)
      .rdd.zipWithIndex.map { case (r, i) => (r.getString(0), i) }
      .toDF(c, "sid")
  }

  /** Build steps 3-4 — the SHINGLE DICTIONARY tier (round 11, VERDICT
    * r10 task #1):
    *  3. `<base>_dict` (sh, sid): deterministic dense ids over the
    *     store's distinct shingles ([[denseIds]]), bucketed by `sh` so
    *     probe-time batch encoding joins it exchange-free on the dict
    *     side;
    *  4. `<base>_shids` (id, sid): the shingle store re-keyed through
    *     the dictionary, bucketed by `id` — the VERIFICATION input.
    *     Jaccard verification never touches shingle text again: every
    *     (id_b, sh)-keyed join ships 8-byte sids where the raw trigram
    *     averages ~25 bytes (sf10 measured the strings as the dominant
    *     probe shuffle — 1 074/1 108 MB).
    * The string store (`<base>_shingles`) remains the minhash BUILD
    * input (band keys hash the text) and stays exchange-free to write;
    * the dictionary pays one distinct + sort + one by-sh join of the
    * store — linear one-time build cost, amortized over every probe. */
  private[graft] def writeShingleDict(spark: org.apache.spark.sql.SparkSession,
                                      base: String, numBuckets: Int): Unit = {
    val sh = spark.table(s"${base}_shingles")
    denseIds(sh.select("sh"), "sh")
      .repartition(numBuckets, col("sh"))
      .write.mode("overwrite").bucketBy(numBuckets, "sh").sortBy("sh")
      .format("parquet").saveAsTable(s"${base}_dict")
    sh.join(spark.table(s"${base}_dict"), "sh")
      .select(col("id"), col("sid"))
      .repartition(numBuckets, col("id"))
      .write.mode("overwrite").bucketBy(numBuckets, "id").sortBy("id")
      .format("parquet").saveAsTable(s"${base}_shids")
    // Seed the max-sid counter: sids are dense 0..n-1, so n-1 comes from
    // a footer-only count-star of the freshly written dict.
    writeMaxSid(spark, base, spark.table(s"${base}_dict").count() - 1)
  }

  /** APPEND a batch to a [[writeLshIndexBucketed]] index — the bucketed
    * tier's evolution path (round 11), completing what [[appendLshIndex]]
    * does for the plain-dir tier: each accepted batch's shingles, bands,
    * dictionary EXTENSION, and encoded rows join the four tables so
    * later batches probe everything accepted so far; the index is never
    * rebuilt. Appending to a bucketed `saveAsTable` adds one file set
    * per (batch, bucket) carrying the bucket ids in the file names, so
    * every exchange-free property of the scans survives (spec-pinned);
    * small-file growth is bounded by periodic re-bucketing rebuild —
    * [[graft.util.Maintenance.compactInPlace]] must NOT touch bucketed
    * tables (a plain rewrite would strip the bucket-id file naming).
    *
    * Dictionary extension: batch-NEW shingles get sids
    * `maxSid + 1 + rank-in-sorted-order` ([[denseIds]]) — the dict stays
    * a dense collision-free bijection after any append sequence (its
    * exact assignment now depends on ingest order, which is fine: the
    * dict is an internal key space, never an oracle surface; within one
    * append it remains deterministic). The max-sid lookup reads the
    * `_GRAFT_MAXSID` counter file — a metadata read, not a dict scan —
    * and re-reserves it past the extension before appending (see the
    * ordering note at the reservation site).
    *
    * NOT crash-atomic across the four appends — the caller owns replay
    * protection (the streaming wrapper marker-gates per batch and
    * adjudicates the crash window exactly like [[appendLshIndex]]'s
    * wrapper). */
  def appendLshIndexBucketed(docs: DataFrame, base: String,
                             idCol: String, textCol: String,
                             numBuckets: Int = IndexBuckets): Unit = {
    val spark = docs.sparkSession
    val shB = graft.util.Views.materialize(
      shingleRows(docs.repartition(numBuckets, col(idCol)), idCol, textCol))
    def appendBucketed(df: DataFrame, part: String, key: String): Unit =
      df.repartition(numBuckets, col(key))
        .write.mode("append").bucketBy(numBuckets, key).sortBy(key)
        .format("parquet").saveAsTable(s"${base}_$part")
    appendBucketed(shB, "shingles", "id")
    appendBucketed(bandRowsFromShingles(shB), "bands", "id")
    // IMMUTABLE SNAPSHOT of the pre-append dictionary, by explicit file
    // list: a `spark.table` read is a live view, not a snapshot — a
    // cache-evicted recompute after the dict append below would re-list
    // the extended table and double-encode the new shingles (observed as
    // duplicated sids in the spec). Appends only ever ADD files, so the
    // file list captured now is the pre-state forever, under any
    // eviction or retry.
    val dictPre = parquetSnapshot(spark, s"${base}_dict")
    // Next-sid reservation from the counter file (round 12, VERDICT r11
    // #5 — the per-append `agg(max(sid))` was one full-dict column scan
    // per micro-batch). Pre-counter indexes fall back to the scan once
    // and self-heal the file below.
    val maxSid = readMaxSid(spark, base).getOrElse(
      dictPre.agg(coalesce(max("sid"), lit(-1L))).head().getLong(0))
    // Lineage severed (eager localCheckpoint): the extension must stay
    // immutable bytes across its two consumers even if shB's cache
    // evicts mid-call.
    val newDict = denseIds(
        shB.select("sh").join(dictPre.select("sh"), Seq("sh"), "left_anti"), "sh")
      .select(col("sh"), (col("sid") + lit(maxSid + 1)).as("sid"))
      .localCheckpoint(true)
    // Append ORDER is the crash-window contract (the rhpIngest two-table
    // discipline, adjudicated by the streaming wrapper against shingles
    // AND shids): shingles first, encoded rows LAST, so a batch present
    // in BOTH tables is provably fully applied (bands + dict commit in
    // between) and any other mix is loud — parquet commits are
    // all-or-nothing per table, so no silent partial file set exists.
    // Counter BEFORE the dict append — a reservation. The crash window
    // between the two degrades to a GAP in the sid space (the next
    // append skips the reserved range): injectivity — the correctness
    // invariant verification rests on — survives any crash; density
    // holds for every COMPLETED append. The reverse order would let a
    // crash-then-retry hand the same sids to two shingle sets — silent
    // false Jaccard matches. (Any crash inside this call already lands
    // on the wrapper's loud partial-presence path; the ordering matters
    // for direct batch callers.) newDict is localCheckpointed, so the
    // count is a driver-side sum over batch-sized bytes.
    val nNew = newDict.count()
    writeMaxSid(spark, base, maxSid + nNew)
    appendBucketed(newDict, "dict", "sh")
    appendBucketed(
      shB.join(dictPre, "sh").select(col("id"), col("sid"))
        .unionByName(shB.join(newDict, "sh").select(col("id"), col("sid"))),
      "shids", "id")
  }

  /** A point-in-time parquet view of a managed table by EXPLICIT file
    * list (appends only add files, so the listed set is immutable —
    * the snapshot survives cache eviction and recomputation, which a
    * live `spark.table` read does not). Bucket metadata is not carried;
    * snapshot consumers are batch-sized joins where that is immaterial. */
  private def parquetSnapshot(spark: org.apache.spark.sql.SparkSession,
                              table: String): DataFrame = {
    val loc = tableLocation(spark, table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(loc).filter { st =>
      val n = st.getPath.getName
      st.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
    }.map(_.getPath.toString)
    if (files.isEmpty) spark.table(table).limit(0)
    else spark.read.parquet(files.toIndexedSeq: _*)
  }

  /** A table's resolved storage location via CATALOG METADATA (ADVICE
    * r11: deriving `<warehouse>/<table>` by hand silently reads nothing
    * for tables in a non-default database or with a custom LOCATION). */
  private def tableLocation(spark: org.apache.spark.sql.SparkSession,
                            table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table)).location)

  /** The dict tier's MAX-SID COUNTER file (round 12, VERDICT r11 #5):
    * `_GRAFT_MAXSID` inside the dict table dir holds the largest
    * assigned sid, so [[appendLshIndexBucketed]] reserves the next sid
    * range from one metadata read instead of a full-dictionary column
    * scan per micro-batch. Absent on pre-round-12 indexes — the append
    * path falls back to the scan and self-heals the file. */
  private def maxSidFile(spark: org.apache.spark.sql.SparkSession,
                         base: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      tableLocation(spark, s"${base}_dict"), "_GRAFT_MAXSID")

  private[graft] def readMaxSid(spark: org.apache.spark.sql.SparkSession,
                                base: String): Option[Long] = {
    val p = maxSidFile(spark, base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  private[graft] def writeMaxSid(spark: org.apache.spark.sql.SparkSession,
                                 base: String, v: Long): Unit = {
    val p = maxSidFile(spark, base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    try os.write(v.toString.getBytes("UTF-8")) finally os.close()
  }

  /** Build step 1: the shingle store table. `bucketed = true` pays the one
    * linear doc-clustering shuffle and writes `bucketBy(id)`;
    * `bucketed = false` reproduces the legacy scattered layout (kept for
    * the scale A/B — graft.IndexBench). */
  private[graft] def writeShingleStore(docs: DataFrame, idCol: String,
                                       textCol: String, base: String,
                                       numBuckets: Int,
                                       bucketed: Boolean): Unit = {
    val in = if (bucketed) docs.repartition(numBuckets, col(idCol)) else docs
    val w = shingleRows(in, idCol, textCol).write.mode("overwrite")
    (if (bucketed) w.bucketBy(numBuckets, "id").sortBy("id") else w)
      .format("parquet").saveAsTable(s"${base}_shingles")
  }

  /** Build step 2 — THE SIGNATURE STAGE: minhash signatures + band keys
    * aggregated per doc from the stored shingle layout. Over a bucketed
    * store this plans no exchange; over a scattered store it ships the
    * per-doc partials the sf1 rehearsal measured growing ~45x for 10x
    * docs. */
  private[graft] def writeBandIndex(spark: org.apache.spark.sql.SparkSession,
                                    base: String, numBuckets: Int,
                                    bucketed: Boolean): Unit = {
    val w = bandRowsFromShingles(spark.table(s"${base}_shingles"))
      .write.mode("overwrite")
    (if (bucketed) w.bucketBy(numBuckets, "id").sortBy("id") else w)
      .format("parquet").saveAsTable(s"${base}_bands")
  }

  /** (band index, shingle store) readers for a [[writeLshIndexBucketed]]
    * table base — catalog reads, so the scans carry the bucket spec and
    * downstream id-keyed stages skip their exchanges. */
  def readLshIndexBucketed(spark: org.apache.spark.sql.SparkSession,
                           base: String): (DataFrame, DataFrame) =
    (spark.table(s"${base}_bands"), spark.table(s"${base}_shingles"))

  /** Re-register a bucketed index table after a session restart,
    * METADATA-ONLY: the in-memory catalog forgets tables across JVMs but
    * the files (and the bucket ids encoded in their names) survive, so a
    * `CREATE TABLE … CLUSTERED BY … LOCATION` restores exchange-free
    * scans without rewriting a byte — the production analogue is a
    * catalog entry outliving any single Spark application. */
  private[graft] def registerBucketedTable(
      spark: org.apache.spark.sql.SparkSession,
      table: String, location: String,
      numBuckets: Int, key: String = "id"): Unit =
    if (!spark.catalog.tableExists(table)) {
      val ddl = spark.read.parquet(location).schema.toDDL
      spark.sql(
        s"""CREATE TABLE $table ($ddl) USING PARQUET
           |CLUSTERED BY ($key) SORTED BY ($key) INTO $numBuckets BUCKETS
           |LOCATION '$location'""".stripMargin)
    }

  /** Ensure the WRITE-ONCE bucketed LSH index for (`dir`-identified
    * corpus, current LSH params) exists, building only when the marker
    * says the artifact was built from a different corpus or parameters
    * (testdata is immutable by driver contract, so (sfDir, params)
    * identifies the content — the marker discipline shared with the MV /
    * IVF artifacts). Returns the table base name for
    * [[readLshIndexBucketed]].
    *
    * `variant` namespaces DIFFERENT corpora over the same sfDir (e.g.
    * the incremental tier indexes the existing-side subset while the
    * self-dedup tier indexes the full corpus) — it is mixed into both
    * the table base and the marker tag, so the two artifacts can never
    * clobber or impersonate each other. */
  def ensureLshIndexBucketed(spark: org.apache.spark.sql.SparkSession,
                             dir: String, corpus: => DataFrame,
                             idCol: String, textCol: String,
                             variant: String = ""): String =
    ensureLshTablesImpl(spark, dir, variant, tagExtra = "",
      base => writeLshIndexBucketed(corpus, idCol, textCol, base))

  /** Ensure a bucketed index whose content was produced by BUILD then
    * APPEND (round 11): `corpus0` is indexed by [[writeLshIndexBucketed]]
    * and `corpusAppend` is then folded in by [[appendLshIndexBucketed]] —
    * the artifact a steady-state ingest pipeline actually has on disk
    * (history indexed once, batches appended forever), marker-gated
    * write-once like every stored artifact so bench reps probe, never
    * rebuild. The registered query probing it shares the one-shot
    * build's oracle: append-equals-rebuild is the contract under test. */
  def ensureLshIndexBucketedAppended(spark: org.apache.spark.sql.SparkSession,
                                     dir: String, corpus0: => DataFrame,
                                     corpusAppend: => DataFrame,
                                     idCol: String, textCol: String,
                                     variant: String): String =
    ensureLshTablesImpl(spark, dir, variant, tagExtra = "|apnd=v1", base => {
      writeLshIndexBucketed(corpus0, idCol, textCol, base)
      appendLshIndexBucketed(corpusAppend, base, idCol, textCol)
    })

  private def ensureLshTablesImpl(spark: org.apache.spark.sql.SparkSession,
                                  dir: String, variant: String,
                                  tagExtra: String,
                                  build: String => Unit): String = {
    // Lowercased: Spark lowercases catalog identifiers, so a
    // case-preserved base would put the managed table at a lowercased
    // warehouse path while the marker and the re-registration LOCATION
    // point at the original casing — perpetual rebuilds (or a broken
    // cross-session re-registration) for any sfDir with uppercase chars.
    //
    // The variant is LENGTH-PREFIXED into the base (ADVICE r10): plain
    // concatenation collides — variant "full" + dir "x" and variant ""
    // + dir "full_x" would share a table base while carrying different
    // marker tags, so the two callers would perpetually rebuild and
    // clobber each other's artifact. `v<len>_<variant>` is an
    // unambiguous encoding over the sanitized alphabet (the length pins
    // where the variant ends, so no (variant, dir) split can alias
    // another).
    val vtag = s"v${variant.length}_${variant.replaceAll("[^A-Za-z0-9]", "_")}"
    val base =
      s"graft_lsh_bidx_${vtag}_${dir.replaceAll("[^A-Za-z0-9]", "_")}".toLowerCase
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    def loc(part: String) =
      new org.apache.hadoop.fs.Path(warehouse, s"${base}_$part")
    val fs = loc("shingles")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(loc("bands"), "_GRAFT_MARKER")
    val tag =
      s"$dir|v=$variant|n=$ShingleN|h=$NumHashes|b=$NumBands|bk=$IndexBuckets|dict=v1$tagExtra"
    val fresh = fs.exists(marker) && {
      val in = fs.open(marker)
      try new String(in.readAllBytes(), "UTF-8") == tag finally in.close()
    }
    // dict is bucketed by sh (probe-time encoding key); the other three
    // by doc id.
    val parts = Seq("shingles" -> "id", "bands" -> "id",
      "dict" -> "sh", "shids" -> "id")
    if (!fresh) {
      graft.util.Artifacts.recordBuild(s"lsh_bidx $tag")
      parts.foreach { case (p, _) =>
        graft.EntryOps.dropManagedTable(spark, s"${base}_$p") }
      build(base)
      val os = fs.create(marker, true)
      try os.write(tag.getBytes("UTF-8")) finally os.close()
    } else parts.foreach { case (p, k) =>
      registerBucketedTable(spark, s"${base}_$p", loc(p).toString,
        IndexBuckets, k) }
    base
  }

  /** Full near-dedup: LSH candidates, then exact Jaccard verification over
    * candidate docs only. */
  def lshVerifiedPairs(docs: DataFrame, idCol: String, textCol: String,
                       threshold: Double,
                       bucketCap: Option[Long] = None,
                       numHashes: Int = NumHashes,
                       numBands: Int = NumBands): DataFrame = {
    // One shingle-derivation pass feeds BOTH the minhash banding and the
    // Jaccard verification (at cluster scale: materialize the exploded
    // shingle view once, reuse it across the LSH stages). Candidates feed
    // the id restriction AND the final semi-join; materialize both so no
    // concurrent stage recomputes them (see [[graft.util.Views]]).
    val shAll = graft.util.Views.materializeTruncated(
      shingleRowsClustered(docs, idCol, textCol))
    val cand = graft.util.Views.materializeTruncated(
      lshCandidatesFromShingles(shAll, bucketCap, numHashes, numBands))
    val sh = graft.util.Views.materializeTruncated(
      shAll.join(candidateIds(cand), "id"))
    jaccardForPairs(cand, sh, threshold)
  }

  /** CORPUS SELF-DEDUP through the PUBLISHED index — the production
    * twin of [[lshVerifiedPairs]] and the 100 TB shape for the corpus-
    * wide near-dup question (the sf10 rehearsal's finding, SCALE.md):
    * the in-query tier re-derives the exploded shingle frame (~200
    * shingle rows per doc) and its minhash signatures EVERY run, and at
    * 100× that materialized frame is what exceeds storage memory — while
    * the band index and shingle store already exist as write-once
    * bucketed tables ([[writeLshIndexBucketed]], maintained by append at
    * ingest). This tier computes the SAME verified pair set from the
    * artifacts alone:
    *
    *  1. candidates = the band index self-joined on (band_idx, band_key)
    *     — a scan of |corpus|·bands rows (4 per doc), not a derivation
    *     over |corpus|·shingles rows;
    *  2. verification = exact Jaccard over the stored shingle rows of
    *     candidate docs only — the id-keyed restriction and per-doc
    *     counts run exchange-free over the id-bucketed scan.
    *
    * Same pair set as the in-query tier by construction (identical md5
    * minhash contract, identical banding — LshStoredSpec asserts it;
    * the registered query shares the in-query tier's DuckDB oracle). */
  def lshVerifiedPairsStored(spark: org.apache.spark.sql.SparkSession,
                             base: String, threshold: Double,
                             bucketCap: Option[Long] = None): DataFrame = {
    val (bandE, _) = readLshIndexBucketed(spark, base)
    // Verification reads the DICTIONARY-ENCODED shingle table (round 11,
    // VERDICT r10 task #1): the pair-keyed joins key on the stored
    // 8-byte sid, not the ~25-byte trigram text — same |A∩B|/|A|/|B| by
    // bijection, an order-of-magnitude narrower dominant shuffle column.
    val shE = spark.table(s"${base}_shids").select(col("id"), col("sid").as("sh"))
    val cand = graft.util.Views.materializeTruncated(
      lshCandidatesFromBands(bandE, bucketCap))
    val sh = graft.util.Views.materializeTruncated(
      shE.join(candidateIds(cand), "id"))
    jaccardForPairs(cand, sh, threshold)
  }

  /** Benchmark DECONTAMINATION scan — the train/eval overlap check every
    * LLM training pipeline runs before shipping a corpus: for each
    * (train doc, eval doc) pair sharing shingles, eval-side containment
    * = |train ∩ eval| / |eval| over distinct word n-grams; pairs at or
    * above `threshold` are contamination hits (the train doc contains
    * most of the eval doc's n-grams).
    *
    * Scale shape: the eval/benchmark set is SMALL by nature (thousands
    * of docs, not billions) — its exploded shingle view is broadcast, so
    * the train corpus is scanned once in place and never shuffles; docs
    * sharing zero shingles never meet. Cost is one broadcast join + one
    * (train_id, eval_id) aggregate. */
  def contaminationPairs(train: DataFrame, eval: DataFrame,
                         idCol: String, textCol: String,
                         threshold: Double): DataFrame = {
    val trainSh = shingleRows(train, idCol, textCol)
      .withColumnRenamed("id", "train_id")
    val evalSh = graft.util.Views.materialize(
      shingleRows(eval, idCol, textCol).withColumnRenamed("id", "eval_id"))
    val evalCounts = evalSh.groupBy("eval_id").agg(count(lit(1)).as("n_eval_sh"))
    trainSh.join(broadcast(evalSh), "sh")
      .groupBy("train_id", "eval_id").agg(count(lit(1)).as("n_common"))
      .join(broadcast(evalCounts), "eval_id")
      // long/long division → double; exact small integers divide to the
      // same double in any engine (correctly-rounded IEEE), no sig needed
      .withColumn("containment", col("n_common") / col("n_eval_sh"))
      .filter(col("containment") >= threshold)
      .select("train_id", "eval_id", "n_common", "containment")
  }

  /** CTE chain ending in `contam(train_id, eval_id, n_common,
    * containment)` — the [[contaminationPairs]] mirror; `evalPred` is the
    * SQL predicate selecting the eval slice of `docsRel`. */
  def contaminationSql(docsRel: String, evalPred: String, threshold: Double): String =
    s"""sh AS (${shingleRowsSql(docsRel)}),
       |ev AS (SELECT id AS eval_id, sh FROM sh WHERE $evalPred),
       |tr AS (SELECT id AS train_id, sh FROM sh WHERE NOT ($evalPred)),
       |ec AS (SELECT eval_id, count(*) AS n_eval_sh FROM ev GROUP BY 1),
       |common AS (
       |  SELECT t.train_id, e.eval_id, count(*) AS n_common
       |  FROM tr t JOIN ev e USING (sh) GROUP BY 1, 2),
       |contam AS (
       |  SELECT c.train_id, c.eval_id, c.n_common,
       |    c.n_common / ec.n_eval_sh AS containment
       |  FROM common c JOIN ec USING (eval_id)
       |  WHERE c.n_common / ec.n_eval_sh >= $threshold)""".stripMargin

  // ------------------------------------------------------------- clusters

  /** Duplicate CLUSTERS from a near-dup pair set: connected components of
    * the pair graph, labeled by each component's minimum doc id (the
    * canonical survivor a dedup pipeline keeps). Docs in no pair form
    * singleton clusters of themselves.
    *
    * Iterative min-label propagation: every round each vertex takes the
    * min of its own label and its neighbors' labels; at fixpoint every
    * member of a component carries the component min. The driver loop
    * controls ITERATION only (a `changed` count per round — no row data
    * ever moves through the driver); each round is one join + one
    * aggregate, i.e. two key-partitioned shuffles, and the round count is
    * the graph DIAMETER — for dedup graphs (small star/chain clusters)
    * that is 2-4, independent of corpus size, so the 100 TB cost is ~6-8
    * bounded shuffles. Labels are materialized per round and the previous
    * round unpersisted, so cache footprint stays one label table.
    *
    * (The oracle runs a DuckDB RECURSIVE CTE transitive closure — an
    * independent algorithm arriving at the same unique fixpoint.) */
  /** Session conf: when set to a directory, each label-propagation round
    * materializes via a RELIABLE `checkpoint()` into it (survives executor
    * loss — the cluster-scale durability SCALE.md's cluster story needs)
    * instead of the local persist+lineage-truncation default. Same
    * fixpoint either way (ClustersSpec proves it both ways). */
  val CheckpointDirConf = "spark.graft.clusters.checkpointDir"

  def clusters(docs: DataFrame, idCol: String, pairs: DataFrame,
               maxIters: Int = 50): DataFrame = {
    val verts = docs.select(col(idCol).as("id"))
    // Symmetrize via explode, NOT union(pairs, pairs.swapped): the union
    // form scans the pair plan twice, and a pair set fed by the LSH
    // pipeline is expensive to produce (measured: the union form cost
    // dedup_clusters_lsh an extra ~4 s at sf0.1 — one whole redundant
    // verification-join pass). One scan, two rows per pair.
    val edges = pairs.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val (e, nEdgeRows) = graft.util.Views.materializeCounted(edges)
    // Iterate over EDGE vertices only: a vertex in no pair never changes
    // its label, so singletons — the overwhelming majority of any real
    // corpus — never enter a round's join/aggregate. Per-round cost
    // scales with the DUPLICATE-GRAPH size, not the corpus: at 100 TB
    // with ~1% near-dups the loop moves ~1% of the vertex set per round.
    // Singletons rejoin as self-labeled clusters after the fixpoint.
    //
    // The seed is ROUND 1 FUSED: from identity labels, round 1 computes
    // min(id, min of neighbor ids) — a plain aggregate over the edge
    // list, no join needed (a neighbor's identity label IS its id). This
    // skips both the identity-label materialization and round 1's join.
    // The loop runs at its OWN shuffle width, derived from the measured
    // edge count, not the session's corpus-scale width: the duplicate
    // graph is a tiny fraction of the corpus (~1% of vertices at real
    // dup rates), and inheriting the session width makes every round a
    // swarm of near-empty tasks whose scheduling dominates the round
    // (measured at sf0.1: the same fixpoint cost 7.5 s at width 32 and
    // 3.9 s at width 8 — the loop's data is ~600 edges). One partition
    // per ~4 M edge rows, floored at 1, capped at the session width so
    // a genuinely huge duplicate graph keeps full parallelism. The width
    // is scoped by EXPLICIT repartition on the loop's aggregate/join
    // inputs — never by mutating spark.sql.shuffle.partitions, which
    // would leak the narrowed width into any concurrently-planned query
    // on the shared session (and into recomputes of evicted blocks after
    // restore). Repartition on the grouping/join key satisfies the
    // downstream distribution requirement, so no second exchange is
    // added, and AQE leaves user-specified widths alone.
    val sessionWidth =
      docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val loopWidth =
      math.max(1L, math.min(sessionWidth.toLong, nEdgeRows / 4000000L + 1)).toInt
    val seed = e.select(col("src").as("id"), col("src").as("label"))
      .union(e.select(col("dst").as("id"), col("src").as("label")))
      .repartition(loopWidth, col("id"))
      .groupBy("id").agg(min("label").as("label"))
    // Convergence probe: per-vertex labels only ever DECREASE, so the
    // label-sum strictly decreases every round until fixpoint.
    // DECIMAL(38,0) so a 10^12-scale id space never overflows the sum at
    // corpus cardinality.
    //
    // Each round materializes into a cache and continues from a
    // LINEAGE-TRUNCATED view of it: iterative DataFrames otherwise nest
    // the previous round's plan inside the next, and Catalyst re-analyzes
    // the deepening tree every round (measured: per-round cost GREW
    // 0.9 → 1.5 → 2.8 s over three rounds of constant-size data).
    // persist + truncate (not localCheckpoint) so each round's single
    // cached copy is freed DETERMINISTICALLY by unpersist — checkpoint
    // blocks only die on GC, accumulating one full label table per round.
    // At cluster scale, set [[CheckpointDirConf]]: each round then runs a
    // reliable `checkpoint()` to durable storage, which both truncates
    // lineage and survives executor loss (a lost cached block under the
    // persist path would otherwise recompute through a TRUNCATED lineage
    // that no longer exists on a restarted executor).
    val ckptDir = docs.sparkSession.conf.getOption(CheckpointDirConf)
    ckptDir.foreach(docs.sparkSession.sparkContext.setCheckpointDir)
    // Materialize one round: returns (the view the next round builds on,
    // the handle whose storage the round-retirement frees). Checkpoint is
    // EAGER — the returned frame reads from durable files, lineage
    // already truncated; unpersist on it is a harmless no-op (checkpoint
    // files are retired by the context cleaner, not per-round).
    def materializeRound(df: DataFrame): (DataFrame, DataFrame) = ckptDir match {
      case Some(_) =>
        val c = df.checkpoint()
        (c, c)
      case None =>
        // Registered with Views so the CONVERGED round — still live when
        // this method returns, because the result is consumed lazily —
        // is reclaimed by the harness's end-of-query Views.unpersistAll
        // (retired intermediate rounds are unpersisted in-loop; the
        // registry's second unpersist on them is a no-op).
        val p = graft.util.Views.register(
          df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        (org.apache.spark.sql.GraftColumnBridge.lineageTruncated(p), p)
    }
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      // A NULL sum is only trusted as "empty input" when the input really
      // is empty: NULL also arises when the label→decimal cast nulls out
      // (non-numeric ids) or the DECIMAL(38,0) sum overflows with ANSI
      // off — silently treating those as 0 would make every round's sum
      // equal and declare convergence after one round, returning WRONG
      // clusters for any diameter>2 graph. Count both sides of the cast
      // and fail loudly on either corruption instead.
      val r = df.agg(
        sum(col("label").cast(dec)),
        count(col("label")),
        count(col("label").cast(dec))).head
      val (s, n, nCast) = (r.getDecimal(0), r.getLong(1), r.getLong(2))
      require(n == nCast,
        s"convergence probe: ${n - nCast} labels nulled by the DECIMAL(38,0) " +
          "cast — doc ids must be numeric for min-label propagation")
      if (s == null) {
        require(n == 0,
          "convergence probe: NULL label sum over a non-empty vertex set — " +
            "DECIMAL(38,0) overflow; the probe cannot adjudicate convergence")
        java.math.BigDecimal.ZERO // genuinely empty: all-singleton corpus
      } else s
    }
    var converged = false
    var labels: DataFrame = null
    val r1 = materializeRound(seed)
    labels = r1._1
    var cached = r1._2
    var prevSum = labelSum(cached) // fills the seed's cache + probes
    converged = prevSum.signum() == 0 && cached.isEmpty // no pairs at all
    var iter = 1 // the fused seed IS round 1
    while (!converged && iter < maxIters) {
      // Both join inputs repartitioned on the join key at the loop's own
      // width: co-partitioned at equal numPartitions, so the join plans
      // no further exchange and the whole round runs loopWidth-wide
      // without touching session conf.
      val neighborLabels = e.repartition(loopWidth, col("src"))
        .join(labels.repartition(loopWidth, col("id")),
          col("src") === col("id"))
        .select(col("dst").as("id"), col("label"))
      val next = labels.union(neighborLabels)
        .repartition(loopWidth, col("id"))
        .groupBy("id").agg(min("label").as("label"))
      val (nLabels, nCached) = materializeRound(next)
      val nextSum = labelSum(nCached) // fills the cache + probes convergence
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      cached.unpersist()
      cached = nCached
      labels = nLabels
      iter += 1
    }
    // Fail LOUDLY on non-convergence: returning partial labels would be
    // silently wrong (and diverge from the oracle's true closure). The
    // round count is the graph diameter, so hitting maxIters means the
    // pair graph is pathologically chained — raise maxIters deliberately.
    require(converged,
      s"label propagation did not converge within $maxIters rounds — " +
        "pair-graph diameter exceeds maxIters; raise it explicitly")
    // Singletons re-enter here: one left join of the corpus against the
    // (small) converged edge-vertex labels; a missing label means the
    // vertex was in no pair and is its own cluster.
    verts.join(labels.select(col("id"), col("label")), Seq("id"), "left_outer")
      .select(col("id").as("doc_id"),
        coalesce(col("label"), col("id")).as("cluster_id"))
  }

  /** Connected components by ALTERNATING STAR CONTRACTION (the
    * large-star/small-star algorithm of Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14) — same unique output
    * as [[clusters]] (every vertex labeled by its component minimum;
    * ClustersStarSpec proves equivalence), different iteration geometry:
    *
    *  - large-star(u): every neighbor v > u re-wires to m(u) =
    *    min(Γ(u) ∪ {u}) — long tails collapse toward small ids;
    *  - small-star(u): every neighbor v ≤ u (and u itself) re-wires to
    *    m(u) — stars canonicalize onto their minimum.
    *
    * Where min-label propagation needs DIAMETER rounds, each reshuffling
    * the FULL edge set plus a label table, star contraction converges in
    * O(log n) rounds on chains and — the dedup-graph reality — in 1-2
    * rounds on hub/star clusters, and the edge set it shuffles SHRINKS
    * between rounds as components contract (duplicates collapse in each
    * small-star distinct). Each round is: one shuffle of the current
    * edges on src (large-star agg+join, co-partitioned), one on hi
    * (small-star agg+join), one distinct on the canonical pair — all at
    * the loop's own width (see [[clusters]] for why the width is derived
    * from the measured edge count, not the session conf).
    *
    * Fixpoint: stars are the unique fixed point of both steps, so the
    * loop stops when the round leaves the edge SET unchanged — checked
    * EXACTLY (equal counts + equal-count inner join on both columns; the
    * per-round frames are duplicate-graph-sized, not corpus-sized).
    * Labels fall out of the final stars: every edge is (root=lo,
    * member=hi) with lo the component min; singletons rejoin by the same
    * left join as [[clusters]]. Honors [[CheckpointDirConf]]. */
  def clustersStar(docs: DataFrame, idCol: String, pairs: DataFrame,
                   maxIters: Int = 50): DataFrame = {
    val spark = docs.sparkSession
    val verts = docs.select(col(idCol).as("id"))
    val canon = pairs.select(
        least(col("id_a"), col("id_b")).as("lo"),
        greatest(col("id_a"), col("id_b")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
    val ckptDir = spark.conf.getOption(CheckpointDirConf)
    ckptDir.foreach(spark.sparkContext.setCheckpointDir)
    def materializeRound(df: DataFrame): (DataFrame, DataFrame) = ckptDir match {
      case Some(_) =>
        val c = df.checkpoint()
        (c, c)
      case None =>
        val p = graft.util.Views.register(
          df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        (org.apache.spark.sql.GraftColumnBridge.lineageTruncated(p), p)
    }
    val sessionWidth =
      spark.conf.get("spark.sql.shuffle.partitions").toInt
    val r0 = materializeRound(canon)
    var e = r0._1
    var cached = r0._2
    var n = cached.count()
    val loopWidth =
      math.max(1L, math.min(sessionWidth.toLong, n / 4000000L + 1)).toInt
    var converged = n == 0
    var iter = 0
    while (!converged && iter < maxIters) {
      // Large-star. Symmetrize by explode (one scan, two rows per edge),
      // then ONE shuffle on src feeds both the per-src min aggregate and
      // the re-wiring join (co-partitioned at equal width — no second
      // exchange). Emits exactly one row per input edge (from its
      // smaller endpoint's group); duplicates are left for small-star's
      // distinct — they cannot inflate the frame (|out| = |in|).
      val sym = e.select(explode(array(
          struct(col("lo").as("src"), col("hi").as("dst")),
          struct(col("hi").as("src"), col("lo").as("dst")))).as("p"))
        .select(col("p.src").as("src"), col("p.dst").as("dst"))
        .repartition(loopWidth, col("src"))
      val lsMins = sym.groupBy("src")
        .agg(least(min("dst"), col("src")).as("m"))
      // Fixpoint detection rides the round's OWN materialization via
      // observe() (zero extra jobs): a round that re-wires nothing in
      // either step emitted its input set verbatim — large-star's output
      // row for edge (src,dst) differs iff m != src, small-star's iff
      // lo != m — so rewires == 0 in both IS exact set equality (stars
      // are the unique fixed point of both steps).
      val lsObs = org.apache.spark.sql.Observation()
      val ssObs = org.apache.spark.sql.Observation()
      val ls = sym.join(lsMins, "src")
        .filter(col("dst") > col("src"))
        .observe(lsObs,
          coalesce(sum((col("m") =!= col("src")).cast("long")), lit(0L))
            .as("rewired"))
        .select(col("m").as("lo"), col("dst").as("hi"))
      // Small-star on the (lo < hi by construction: m <= src < dst)
      // large-star output: per hi-group, re-wire every lo (and hi
      // itself) to the group minimum. One shuffle on hi (agg + join
      // co-partitioned), one distinct.
      val inss = ls.repartition(loopWidth, col("hi"))
      val ssMins = inss.groupBy("hi").agg(min("lo").as("m"))
      val next = inss.join(ssMins, "hi")
        .observe(ssObs,
          coalesce(sum((col("lo") =!= col("m")).cast("long")), lit(0L))
            .as("rewired"))
        .filter(col("lo") =!= col("m"))
        .select(col("m").as("lo"), col("lo").as("hi"))
        .union(ssMins.select(col("m").as("lo"), col("hi")))
        .distinct()
      val (nE, nCached) = materializeRound(next)
      n = nCached.count() // fills the cache, completes the observe metrics
      converged = lsObs.get("rewired").asInstanceOf[Long] == 0L &&
        ssObs.get("rewired").asInstanceOf[Long] == 0L
      cached.unpersist()
      cached = nCached
      e = nE
      iter += 1
    }
    require(converged,
      s"star contraction did not converge within $maxIters rounds — " +
        "raise maxIters explicitly")
    // Structural guard: the converged edge set must BE stars — every
    // member exactly one root edge, no root also a member. (Contraction
    // preserves components, a star's root is its minimum, so stars ⇒
    // correct labels; a round-identity fixpoint that was NOT stars would
    // silently mislabel — fail loudly instead. One bounded check, paid
    // once.)
    // (One aggregate job: member-side multiplicity and root∩member
    // overlap checked together over a role-tagged vertex union.)
    val isStars = e.select(col("hi").as("v"), lit(1).as("m"))
      .union(e.select(col("lo").as("v"), lit(0).as("m")))
      .groupBy("v").agg(sum("m").as("nm"), min("m").as("mn"))
      .filter(col("nm") > 1 || (col("nm") >= 1 && col("mn") === 0))
      .isEmpty
    require(n == 0 || isStars,
      "star contraction reached a non-star fixpoint — cannot label safely")
    // At fixpoint every edge is (component-min, member): the label table.
    verts.join(e.select(col("hi").as("id"), col("lo").as("label")),
        Seq("id"), "left_outer")
      .select(col("id").as("doc_id"),
        coalesce(col("label"), col("id")).as("cluster_id"))
  }

  /** DuckDB mirror of [[clusters]]: recursive-CTE transitive closure from
    * each vertex, then min over reached vertices. `pairsCte` must expose
    * (id_a, id_b); ends in `clusters(doc_id, cluster_id)`. */
  def clustersSql(docsRel: String, pairsCte: String): String =
    s"""edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM $pairsCte
       |  UNION ALL SELECT id_b, id_a FROM $pairsCte),
       |reach AS (
       |  WITH RECURSIVE r(a, b) AS (
       |    SELECT doc_id, doc_id FROM $docsRel
       |    UNION
       |    SELECT r.a, e.dst FROM r JOIN edges e ON r.b = e.src)
       |  SELECT * FROM r),
       |clusters AS (
       |  SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a)""".stripMargin

  // -------------------------------------------------------------- simhash

  val SimhashBits = 64
  val SimhashBands = 4 // 4 bands x 16 bits → catches hamming ≤ 3 for sure
  val SimhashMaxHamming = 3

  /** 64-bit SimHash per doc: the bit source is the 64 hex chars of
    * md5(shingle) ‖ md5('1:' ‖ shingle); weight_j(shingle) = +1 iff hex
    * char j >= '8' (the char's high bit — 64 independent bits per
    * shingle); bit_j = (Σ weights > 0). Flat codegen shape — two md5s per
    * shingle row, 64 conditional sums in a partial+final hash aggregate;
    * one shuffle on doc id.
    *
    * 64 bits (not 16) is the scale requirement, not a nicety: band-key
    * space is 2^bitsPerBand per band, and with 8-bit bands every band
    * bucket holds N/256 docs at corpus scale, making the candidate
    * self-join quadratic per bucket. 16-bit bands give 65 536 keys per
    * band — bucket occupancy stays O(N/65536) and only genuinely similar
    * docs collide. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Per-shingle bit source via the native SimhashMask expression (two
    // digests + bit tests, one call per row) instead of concat(md5, md5)
    // plus 64 substring slices per row; bit j of the mask == the oracle
    // mirror's hex-char-j test on md5(sh) || md5('1:' || sh).
    val mask = org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.SimhashMask(
        org.apache.spark.sql.GraftColumnBridge.expression(col("sh"))))
    val sh = shingleRowsClustered(docs, idCol, textCol).withColumn("m", mask)
    val sums = (0 until SimhashBits).map(j =>
      sum(when(shiftright(col("m"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$j"))
    sh.groupBy("id").agg(sums.head, sums.tail: _*)
      .select(col("id"), concat((0 until SimhashBits).map(j =>
        when(col(s"s$j") > 0, lit("1")).otherwise(lit("0"))): _*).as("simhash"))
  }

  /** Near-dup pairs by SimHash: candidates share one of the
    * [[SimhashBands]] bands (equi-join, no pairwise scan), verified by
    * full-width hamming distance <= [[SimhashMaxHamming]]. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bitsPerBand = SimhashBits / SimhashBands
    val sk = graft.util.Views.materializeTruncated(simhash(docs, idCol, textCol))
    val bands = sk.select(col("id"), col("simhash"), posexplode(array(
      (0 until SimhashBands).map(b =>
        substring(col("simhash"), b * bitsPerBand + 1, bitsPerBand)): _*)))
      .toDF("id", "simhash", "band_idx", "band_key")
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .distinct()
    val hamming = (0 until SimhashBits).map(j =>
      when(substring(col("sh_a"), j + 1, 1) =!= substring(col("sh_b"), j + 1, 1), 1)
        .otherwise(0)).reduce(_ + _)
    cand.withColumn("hamming", hamming.cast("long"))
      .filter(col("hamming") <= SimhashMaxHamming)
      .select("id_a", "id_b", "hamming")
  }

  // --------------------------------------------------------------- oracle

  /** DuckDB mirrors, generated from the same constants. `docsRel` must
    * expose (doc_id, text). */

  def normalizeSql(x: String): String = graft.util.Norm.normalizeSql(x)

  def exactGroupsSql(docsRel: String): String =
    s"""SELECT md5(${normalizeSql("text")}) AS fingerprint,
       |  min(doc_id) AS canonical_id, count(*) AS n_copies
       |FROM $docsRel GROUP BY 1""".stripMargin

  /** words → distinct n-gram shingle list (empty if < n words). */
  def shinglesSql(x: String): String = {
    val w = s"string_split(${normalizeSql(x)}, ' ')"
    s"""(CASE WHEN len($w) >= $ShingleN
       | THEN list_distinct([array_to_string(($w)[i:i+${ShingleN - 1}], ' ')
       |                     for i in range(1, len($w) - ${ShingleN - 2})])
       | ELSE [] END)""".stripMargin
  }

  def shingleRowsSql(docsRel: String): String =
    s"""SELECT doc_id AS id, unnest(${shinglesSql("text")}) AS sh FROM $docsRel"""

  /** CTE chain ending in `pairs(id_a, id_b, jaccard)`. With a candidate
    * CTE name, the shingle set is restricted to candidate ids; the final
    * SELECT must still semi-join `pairs` against the candidates. */
  def jaccardPairsCtes(docsRel: String, threshold: Double, candidatesCte: Option[String],
                       maxDocFreq: Option[Long] = None): String =
    pairStatsCtes(docsRel, candidatesCte, maxDocFreq) + ",\n" +
      s"""pairs AS (
         |  SELECT id_a, id_b,
         |    n_common / (ca.n_sh + cb.n_sh - n_common) AS jaccard
         |  FROM common
         |  JOIN counts ca ON ca.id = id_a
         |  JOIN counts cb ON cb.id = id_b
         |  WHERE n_common / (ca.n_sh + cb.n_sh - n_common) >= $threshold)""".stripMargin

  /** DuckDB mirror of [[overlapPairs]] — shared CTE core, overlap-coefficient
    * finalizer. */
  def overlapPairsCtes(docsRel: String, threshold: Double,
                       maxDocFreq: Option[Long] = None): String =
    pairStatsCtes(docsRel, None, maxDocFreq) + ",\n" +
      s"""pairs AS (
         |  SELECT id_a, id_b,
         |    n_common / least(ca.n_sh, cb.n_sh) AS overlap
         |  FROM common
         |  JOIN counts ca ON ca.id = id_a
         |  JOIN counts cb ON cb.id = id_b
         |  WHERE n_common / least(ca.n_sh, cb.n_sh) >= $threshold)""".stripMargin

  private def pairStatsCtes(docsRel: String, candidatesCte: Option[String],
                            maxDocFreq: Option[Long]): String = {
    val shSrc = candidatesCte match {
      case Some(c) =>
        s"""sh0 AS (SELECT * FROM sh_all WHERE id IN
           |  (SELECT id_a FROM $c UNION SELECT id_b FROM $c))""".stripMargin
      case None => "sh0 AS (SELECT * FROM sh_all)"
    }
    val shFiltered = maxDocFreq match {
      case Some(cap) =>
        s"""sh AS (SELECT s.* FROM sh0 s JOIN
           |  (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= $cap) k USING (sh))""".stripMargin
      case None => "sh AS (SELECT * FROM sh0)"
    }
    s"""sh_all AS (${shingleRowsSql(docsRel)}),
       |$shSrc,
       |$shFiltered,
       |counts AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
       |common AS (
       |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
       |  GROUP BY 1, 2)""".stripMargin
  }

  def minhashSignatureSql(shList: String, numHashes: Int = NumHashes): String = {
    val mins = (0 until numHashes).map(j =>
      s"list_aggregate(list_transform($shList, x -> md5('$j:' || x)), 'min')")
    s"[${mins.mkString(",\n    ")}]"
  }

  def bandKeysSql(sig: String, numHashes: Int = NumHashes,
                  numBands: Int = NumBands): String = {
    // Same loud guard as the Spark twin (bandRowsFromShingles): a
    // truncating rows-per-band would silently band over a hash PREFIX
    // and break Spark/DuckDB parity.
    require(numHashes % numBands == 0, "numBands must divide numHashes")
    val rows = numHashes / numBands
    val keys = (0 until numBands).map { b =>
      val parts = (0 until rows).map(r => s"($sig)[${b * rows + r + 1}]")
      s"md5(${parts.mkString(" || '|' || ")})"
    }
    s"[${keys.mkString(",\n    ")}]"
  }

  // ------------------------------------------------------------- fixture

  /** Injected-duplicate id offsets. 1e12 apart so they are disjoint from
    * any plausible real doc_id space (5 × 10^12 docs ≈ 5 000 PB of text;
    * the old +100000 offsets collided with real ids past sf≈2) — and the
    * disjointness is not assumed but ENFORCED per row by [[augmented]]'s
    * guard, so a corpus that does violate it fails loudly instead of
    * silently corrupting fixture semantics. Note (base, edit+1e12=exact)
    * style cross-variant id arithmetic still collides by construction:
    * tests filtering on id differences need an `id_a < NearOffset`
    * guard exactly as before. */
  val NearOffset = 1000000000000L
  val EditOffset = 2000000000000L
  val ExactOffset = 3000000000000L

  /** Deterministic duplicate injection over `documents` — the driver
    * testdata has no duplicate pairs at sf0.01, so the dedup queries
    * operate on this augmented corpus (mirrored exactly in
    * [[augmentedSql]] so both engines see identical input):
    *  - +[[ExactOffset]]: byte-different exact dup (upper case + trailing
    *    blanks — caught only through normalization)
    *  - +[[NearOffset]]: near dup (5 appended junk tokens, Jaccard ≈ 0.9)
    *  - +[[EditOffset]]: moderate edit (every 'data' token rewritten) */
  def augmented(docs: DataFrame): DataFrame = {
    // Fail fast if a real id would collide with the injected id space
    // (assert_true throws per-row on violation, null otherwise).
    val guardedId = when(
      assert_true(col("doc_id") >= 0 && col("doc_id") < NearOffset,
        lit(s"doc_id must be in [0, $NearOffset) for disjoint dup injection")).isNull,
      col("doc_id"))
    val base = docs.select(guardedId.as("doc_id"), col("text"))
    // Junk tokens carry the doc id so no two injected docs share them:
    // appending *identical* junk to 1000 docs makes each junk shingle a
    // 1000-doc hot key and the pair join quadratic in it (measured: 2.7 M
    // pre-threshold pairs at sf0.1, ~1.5 M from three junk shingles alone).
    val idStr = col("doc_id").cast("string")
    val junk = concat(
      lit(" zz"), idStr, lit(" yy"), idStr, lit(" xx"), idStr,
      lit(" qq"), idStr, lit(" vv"), idStr)
    base
      .unionByName(base.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + ExactOffset).as("doc_id"),
          concat(upper(col("text")), lit("  ")).as("text")))
      .unionByName(base.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + NearOffset).as("doc_id"),
          concat(col("text"), junk).as("text")))
      .unionByName(base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + EditOffset).as("doc_id"),
          expr("replace(text, 'data', 'datum')").as("text")))
  }

  val augmentedSql: String =
    s"""(SELECT doc_id, text FROM documents
       | UNION ALL SELECT doc_id + $ExactOffset, upper(text) || '  ' FROM documents WHERE doc_id % 11 = 0
       | UNION ALL SELECT doc_id + $NearOffset,
       |   text || ' zz' || doc_id || ' yy' || doc_id || ' xx' || doc_id ||
       |   ' qq' || doc_id || ' vv' || doc_id
       |   FROM documents WHERE doc_id % 5 = 0
       | UNION ALL SELECT doc_id + $EditOffset, replace(text, 'data', 'datum') FROM documents WHERE doc_id % 7 = 0)""".stripMargin

  /** CTE chain ending in `shpairs(id_a, id_b, hamming)`. */
  def simhashPairsCtes(docsRel: String): String = {
    val bitsPerBand = SimhashBits / SimhashBands
    val sums = (0 until SimhashBits).map(j =>
      s"sum(CASE WHEN substring(h, ${j + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS s$j")
      .mkString(",\n    ")
    val bits = (0 until SimhashBits).map(j =>
      s"(CASE WHEN s$j > 0 THEN '1' ELSE '0' END)").mkString(" || ")
    val bandRows = (0 until SimhashBands).map(b =>
      s"SELECT id, simhash, $b AS band_idx, substring(simhash, ${b * bitsPerBand + 1}, $bitsPerBand) AS band_key FROM sk")
      .mkString("\nUNION ALL ")
    val hamming = (0 until SimhashBits).map(j =>
      s"(CASE WHEN substring(sh_a, ${j + 1}, 1) <> substring(sh_b, ${j + 1}, 1) THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""shr AS (SELECT id, sh, md5(sh) || md5('1:' || sh) AS h FROM (${shingleRowsSql(docsRel)})),
       |sums AS (SELECT id, $sums FROM shr GROUP BY id),
       |sk AS (SELECT id, $bits AS simhash FROM sums),
       |skbands AS ($bandRows),
       |shcand AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       |    a.simhash AS sh_a, b.simhash AS sh_b
       |  FROM skbands a JOIN skbands b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.id < b.id),
       |shpairs AS (
       |  SELECT id_a, id_b, CAST($hamming AS BIGINT) AS hamming
       |  FROM shcand WHERE $hamming <= $SimhashMaxHamming)""".stripMargin
  }

  def lshCandidatesCtes(docsRel: String, bucketCap: Option[Long] = None,
                        numHashes: Int = NumHashes,
                        numBands: Int = NumBands): String = {
    val (capCte, bandsRel) = bucketCap match {
      case Some(cap) => (
        s"""|bands_ok AS (
            |  SELECT b.id, b.band_idx, b.band_key FROM bands b
            |  JOIN (SELECT band_idx, band_key FROM bands
            |        GROUP BY 1, 2 HAVING count(*) <= $cap) g
            |    USING (band_idx, band_key)),
            |""".stripMargin.stripPrefix("|"), "bands_ok")
      case None => ("", "bands")
    }
    s"""sig AS (
       |  SELECT doc_id AS id, ${minhashSignatureSql("sh", numHashes)} AS sig
       |  FROM (SELECT doc_id, ${shinglesSql("text")} AS sh FROM $docsRel)
       |  WHERE len(sh) > 0),
       |bands AS (
       |  SELECT id, i AS band_idx, (${bandKeysSql("sig", numHashes, numBands)})[i] AS band_key
       |  FROM sig, range(1, ${numBands + 1}) t(i)),
       |${capCte}cand AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM $bandsRel a JOIN $bandsRel b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.id < b.id)""".stripMargin
  }
}
