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

  /** Case/whitespace-insensitive canonical text form. */
  def normalize(c: Column): Column = regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Exact-duplicate groups: fingerprint, canonical (min) id, copy count.
    * (Spark: md5 of UTF-8 bytes; identical in DuckDB.) */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("fingerprint", md5(normalize(col(textCol)).cast("binary")))
      .groupBy("fingerprint")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Distinct word-`n`-gram shingles of the normalized text, as a column.
    * Docs shorter than `n` words yield an empty array. */
  def shingles(textCol: Column, n: Int = ShingleN): Column = {
    val words = split(normalize(textCol), " ")
    array_distinct(
      when(size(words) >= n,
        transform(sequence(lit(1), size(words) - (n - 1)),
          i => array_join(slice(words, i, lit(n)), " ")))
        .otherwise(array().cast("array<string>")))
  }

  /** (doc id, shingle) exploded view — the unit of the explode→join
    * pattern. */
  private def shingleRows(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), explode(shingles(col(textCol))).as("sh"))

  /** All pairs with n-gram Jaccard ≥ `threshold`, via shingle-join
    * counting: |A∩B| from the join, |A| and |B| from per-doc counts.
    * `candidates` (optional) restricts the join to ids occurring in the
    * candidate pair set — the LSH verification path. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double,
                   candidates: Option[DataFrame] = None): DataFrame = {
    val shAll = shingleRows(docs, idCol, textCol)
    val sh = candidates match {
      case Some(cand) =>
        val ids = cand.select(col("id_a").as("id"))
          .union(cand.select(col("id_b").as("id"))).distinct()
        shAll.join(ids, "id")
      case None => shAll
    }
    val counts = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val common = sh.as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    val withSizes = common
      .join(counts.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
      .join(counts.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
      .withColumn("jaccard", col("n_common") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
    candidates match {
      case Some(cand) => withSizes.join(cand, Seq("id_a", "id_b"), "left_semi")
      case None => withSizes
    }
  }

  /** MinHash signature: element j = min over shingles of md5(j ':' sh).
    * Lexicographic min over fixed-width hex = uniform min-hash; identical
    * in any engine. NULL (empty shingle set) docs are dropped upstream. */
  def minhashSignature(shCol: Column): Column = {
    val mins = (0 until NumHashes).map(j =>
      array_min(transform(shCol, x => md5(concat(lit(s"$j:"), x)))))
    array(mins: _*)
  }

  /** Band keys: md5 of the '|'-joined signature rows of each band. */
  def bandKeys(sigCol: Column): Column = {
    val rows = NumHashes / NumBands
    array((0 until NumBands).map { b =>
      md5(concat_ws("|", (0 until rows).map(r => sigCol.getItem(b * rows + r)): _*))
    }: _*)
  }

  /** Candidate pairs: docs sharing any (band index, band key). */
  def lshCandidates(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withBands = docs
      .withColumn("sh", shingles(col(textCol)))
      .filter(size(col("sh")) > 0)
      .select(col(idCol).as("id"), posexplode(bandKeys(minhashSignature(col("sh")))))
      .toDF("id", "band_idx", "band_key")
    withBands.as("a")
      .join(withBands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Full near-dedup: LSH candidates, then exact Jaccard verification over
    * candidate docs only. */
  def lshVerifiedPairs(docs: DataFrame, idCol: String, textCol: String,
                       threshold: Double): DataFrame =
    jaccardPairs(docs, idCol, textCol, threshold,
      candidates = Some(lshCandidates(docs, idCol, textCol)))

  // --------------------------------------------------------------- oracle

  /** DuckDB mirrors, generated from the same constants. `docsRel` must
    * expose (doc_id, text). */

  def normalizeSql(x: String): String = s"regexp_replace(lower(trim($x)), '\\s+', ' ', 'g')"

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
  def jaccardPairsCtes(docsRel: String, threshold: Double, candidatesCte: Option[String]): String = {
    val shSrc = candidatesCte match {
      case Some(c) =>
        s"""sh AS (SELECT * FROM sh_all WHERE id IN
           |  (SELECT id_a FROM $c UNION SELECT id_b FROM $c))""".stripMargin
      case None => "sh AS (SELECT * FROM sh_all)"
    }
    s"""sh_all AS (${shingleRowsSql(docsRel)}),
       |$shSrc,
       |counts AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
       |common AS (
       |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT id_a, id_b,
       |    n_common / (ca.n_sh + cb.n_sh - n_common) AS jaccard
       |  FROM common
       |  JOIN counts ca ON ca.id = id_a
       |  JOIN counts cb ON cb.id = id_b
       |  WHERE n_common / (ca.n_sh + cb.n_sh - n_common) >= $threshold)""".stripMargin
  }

  def minhashSignatureSql(shList: String): String = {
    val mins = (0 until NumHashes).map(j =>
      s"list_aggregate(list_transform($shList, x -> md5('$j:' || x)), 'min')")
    s"[${mins.mkString(",\n    ")}]"
  }

  def bandKeysSql(sig: String): String = {
    val rows = NumHashes / NumBands
    val keys = (0 until NumBands).map { b =>
      val parts = (0 until rows).map(r => s"($sig)[${b * rows + r + 1}]")
      s"md5(${parts.mkString(" || '|' || ")})"
    }
    s"[${keys.mkString(",\n    ")}]"
  }

  // ------------------------------------------------------------- fixture

  /** Deterministic duplicate injection over `documents` — the driver
    * testdata has no duplicate pairs at sf0.01, so the dedup queries
    * operate on this augmented corpus (mirrored exactly in
    * [[augmentedSql]] so both engines see identical input):
    *  - +300000: byte-different exact dup (upper case + trailing blanks —
    *    caught only through normalization)
    *  - +100000: near dup (5 appended junk tokens, Jaccard ≈ 0.9)
    *  - +200000: moderate edit (every 'data' token rewritten) */
  def augmented(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    base
      .unionByName(base.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 300000).as("doc_id"),
          concat(upper(col("text")), lit("  ")).as("text")))
      .unionByName(base.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" zz yy xx qq vv")).as("text")))
      .unionByName(base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          expr("replace(text, 'data', 'datum')").as("text")))
  }

  val augmentedSql: String =
    """(SELECT doc_id, text FROM documents
      | UNION ALL SELECT doc_id + 300000, upper(text) || '  ' FROM documents WHERE doc_id % 11 = 0
      | UNION ALL SELECT doc_id + 100000, text || ' zz yy xx qq vv' FROM documents WHERE doc_id % 5 = 0
      | UNION ALL SELECT doc_id + 200000, replace(text, 'data', 'datum') FROM documents WHERE doc_id % 7 = 0)""".stripMargin

  def lshCandidatesCtes(docsRel: String): String =
    s"""sig AS (
       |  SELECT doc_id AS id, ${minhashSignatureSql("sh")} AS sig
       |  FROM (SELECT doc_id, ${shinglesSql("text")} AS sh FROM $docsRel)
       |  WHERE len(sh) > 0),
       |bands AS (
       |  SELECT id, i AS band_idx, (${bandKeysSql("sig")})[i] AS band_key
       |  FROM sig, range(1, ${NumBands + 1}) t(i)),
       |cand AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.id < b.id)""".stripMargin
}
