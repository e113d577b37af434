package graft.news

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The IQPLUS news summarization pipeline
  * (`Tugas 2/IQPLUS News/iqplus_market_transform.py:28-150`, byte-identical
  * twin `iqplus_stock_transform.py`), lifted from a single-threaded Python
  * cursor loop to executor-parallel Spark UDF evaluation.
  *
  * The reference's split→map→merge→reduce skeleton is preserved exactly:
  *  - `split_text` (`:28-47`): split on '.', re-append '.', greedy-pack
  *    sentences into chunks of ≤1024 tokens — including the reference's
  *    quirk that a single over-budget sentence flushes the (possibly
  *    empty) current chunk first.
  *  - `summarize_long_text` (`:49-89`): ≤1024 tokens → one-shot summary
  *    (250/50); longer → summarize each chunk (512/30), join with ' ',
  *    re-summarize the merge (250/50); any error → "".
  *  - per-doc assembly + 1-based index (`:112-127`) — the cursor order is
  *    nondeterministic, so we pin an explicit `row_number` over doc id.
  *
  * The BART model call (`:25-26`, facebook/bart-large-cnn on CPU) is not
  * available offline; it is replaced by a deterministic extractive
  * summarizer (term-frequency sentence scoring under the same
  * max/min-token budgets) whose output STRING is fully oracle-checked:
  * [[extractiveSummaryCtes]]/[[summarizeLongTextCtes]] replay the whole
  * split-merge pipeline — scoring, ranking, greedy pick, reassembly —
  * as independent DuckDB recursive CTEs.
  *
  * Scale: one scalar UDF in a narrow `Project` — no shuffle, fully
  * parallel. The only shuffle in the pipeline is the global index window;
  * [[withIndex]] documents the partitioned alternative for cluster scale.
  */
object Summarize {

  val MaxTokens = 1024

  /** BPE-ish deterministic token counter — stand-in for the BART
    * tokenizer: letter runs, digit runs, and single non-space symbols. */
  private val tokenRe = "[\\p{L}\\p{M}]+|\\p{N}+|[^\\p{L}\\p{M}\\p{N}\\s]".r

  def tokenize(text: String): Seq[String] = tokenRe.findAllIn(text).toSeq

  def tokenCount(text: String): Int = tokenize(text).size

  /** Sentence split exactly as the reference: split on '.', drop blanks,
    * re-append '.' (`iqplus_market_transform.py:30`). */
  def sentences(text: String): Seq[String] =
    text.split('.').toSeq.map(_.trim).filter(_.nonEmpty).map(_ + ".")

  /** Greedy token-budget chunking (`iqplus_market_transform.py:28-47`). */
  def splitText(text: String, maxTokens: Int = MaxTokens): Seq[String] = {
    val out = Seq.newBuilder[String]
    var current = List.empty[String]
    var currentCount = 0
    sentences(text).foreach { s =>
      val n = tokenCount(s)
      if (currentCount + n > maxTokens) {
        out += current.reverse.mkString(" ") // reference flushes even an empty chunk
        current = List(s)
        currentCount = n
      } else {
        current ::= s
        currentCount += n
      }
    }
    if (current.nonEmpty) out += current.reverse.mkString(" ")
    out.result()
  }

  /** Sentence ranking shared by [[extractiveSummarize]] and
    * [[summaryStats]]: (sentence, 0-based original index, token count,
    * term-frequency score), sorted by (score desc, original index) —
    * score = summed doc-level frequency of the sentence's lowercased
    * letter-bearing tokens / (token count + 1). */
  private def rankedSentences(text: String): Seq[(String, Int, Int, Double)] = {
    val freq = tokenize(text.toLowerCase).filter(_.exists(_.isLetter))
      .groupBy(identity).map { case (w, ws) => (w, ws.size) }
    sentences(text).zipWithIndex.map { case (s, i) =>
      val words = tokenize(s.toLowerCase).filter(_.exists(_.isLetter))
      val score = words.map(freq.getOrElse(_, 0)).sum.toDouble / (words.size + 1)
      (s, i, tokenCount(s), score)
    }.sortBy { case (_, i, _, score) => (-score, i) }
  }

  /** The greedy budget pick over a ranked sentence list: take while it
    * fits the max budget; always take at least one; keep taking (even
    * past max) while still under the min budget. Returns picked
    * (sentence, original index) in RANKED order. */
  private def greedyPick(ranked: Seq[(String, Int, Int, Double)],
                         maxLength: Int, minLength: Int): Seq[(String, Int)] = {
    var used = 0
    val picked = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    ranked.foreach { case (s, i, n, _) =>
      if (picked.isEmpty || used + n <= maxLength || used < minLength) {
        picked += ((s, i)); used += n
      }
    }
    picked.toSeq
  }

  /** Deterministic extractive summary under the reference's token budgets:
    * [[rankedSentences]] scoring, [[greedyPick]] selection, emitted in
    * original order. Pure function — no randomness, no model. */
  def extractiveSummarize(text: String, maxLength: Int, minLength: Int): String = {
    val ranked = rankedSentences(text)
    if (ranked.isEmpty) return ""
    greedyPick(ranked, maxLength, minLength).sortBy(_._2).map(_._1).mkString(" ")
  }

  /** The SQL-expressible ENVELOPE of the extractive summarizer: total
    * sentence count, how many sentences the greedy pick keeps under the
    * one-shot (250, 50) budgets, and the 1-BASED original index of the
    * top-ranked sentence. Driven by the exact same [[rankedSentences]] /
    * [[greedyPick]] the summarizer runs, and replayed independently in
    * DuckDB by [[summaryStatsSql]] (scoring joins + a recursive-CTE
    * greedy fold). Since round 11 the summary STRING itself is also
    * oracle-checked ([[extractiveSummaryCtes]]/[[summarizeLongTextCtes]]);
    * this envelope remains as the cheap independent cross-check of the
    * ranking math. */
  case class SummaryStats(n_sentences: Long, n_summary_sentences: Long,
                          top_sentence_idx: Long)

  def summaryStats(text: String, maxLength: Int = 250, minLength: Int = 50): SummaryStats = {
    val ranked = rankedSentences(text)
    if (ranked.isEmpty) SummaryStats(0L, 0L, 0L)
    else SummaryStats(ranked.size.toLong,
      greedyPick(ranked, maxLength, minLength).size.toLong,
      ranked.head._2 + 1L)
  }

  /** Split-merge summarization (`iqplus_market_transform.py:49-89`). */
  def summarizeLongText(text: String, maxLength: Int = 250, minLength: Int = 50): String =
    try {
      if (text == null) ""
      else if (tokenCount(text) <= MaxTokens) extractiveSummarize(text, maxLength, minLength)
      else {
        val chunkSummaries = splitText(text).map(extractiveSummarize(_, 512, 30))
        extractiveSummarize(chunkSummaries.mkString(" "), maxLength, minLength)
      }
    } catch { case _: Exception => "" } // reference returns "" on error (:88-89)

  // ------------------------------------------------------------ DataFrame

  val summarizeUdf = udf((text: String) =>
    if (text == null || text.trim.isEmpty) "" else summarizeLongText(text.trim))

  val chunkCountUdf = udf((text: String) =>
    if (text == null) 0 else splitText(text).size)

  val tokenCountUdf = udf((text: String) => if (text == null) 0 else tokenCount(text))

  val summaryStatsUdf = udf((text: String) =>
    if (text == null) SummaryStats(0L, 0L, 0L) else summaryStats(text))

  /** 1-based dense index over an explicit order — the deterministic form
    * of the reference's cursor counter (`iqplus_market_transform.py:95,119,131`).
    * Global window = single-partition exchange; acceptable for parity. At
    * cluster scale use partitioned windows or zipWithIndex-style ranges. */
  def withIndex(df: DataFrame, orderCol: String): DataFrame =
    df.withColumn("index", row_number().over(Window.orderBy(col(orderCol))))

  /** Full pipeline over the news-shaped view (U1-U3 + W2): summary column
    * + index + the reference's output field set, in its order. */
  def transform(news: DataFrame): DataFrame =
    withIndex(news, "doc_id")
      .withColumn("rangkuman", summarizeUdf(col("konten")))
      .select(col("index"), col("judul"), col("konten"), col("rangkuman"),
        col("waktu"), col("tanggal_artikel"))

  // --------------------------------------------------------------- oracle

  /** The [[tokenRe]] pattern as a DuckDB (RE2) literal — same Unicode
    * classes, same alternation. */
  val tokenReSql: String = """[\p{L}\p{M}]+|\p{N}+|[^\p{L}\p{M}\p{N}\s]"""

  /** DuckDB mirror of [[tokenCount]] + [[splitText]]'s CHUNK COUNT: the
    * greedy token-budget fold replayed as a RECURSIVE CTE — one state row
    * per (doc, sentences-consumed) advancing `(cnt, flushed)` exactly like
    * the Scala loop, including the flush-even-an-empty-chunk quirk
    * (`cnt + n > budget` increments `flushed` regardless of `cnt`) and
    * the trailing non-empty chunk (+1 iff any sentence was consumed).
    * `textExpr` must be a SQL expression over `$docsRel` columns
    * producing the text. Ends in a SELECT of
    * (doc_id, n_tokens, n_chunks). */
  def chunkCountsSql(docsRel: String, textExpr: String,
                     maxTokens: Int = MaxTokens): String =
    s"""WITH RECURSIVE
       |base AS MATERIALIZED (SELECT doc_id, $textExpr AS t FROM $docsRel),
       |toks AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(len(regexp_extract_all(t, '$tokenReSql')) AS BIGINT) AS n_tokens
       |  FROM base),
       |sl AS MATERIALIZED (
       |  SELECT doc_id,
       |    list_filter(list_transform(string_split(t, '.'), x -> trim(x)),
       |                x -> x <> '') AS ss
       |  FROM base),
       |sents AS MATERIALIZED (
       |  SELECT doc_id, generate_subscripts(ss, 1) AS i,
       |    len(regexp_extract_all(unnest(ss) || '.', '$tokenReSql')) AS ntok
       |  FROM sl),
       |state AS (
       |  SELECT doc_id, 0 AS idx, 0 AS cnt, 0 AS flushed FROM base
       |  UNION ALL
       |  SELECT st.doc_id, st.idx + 1,
       |    CASE WHEN st.cnt + s.ntok > $maxTokens THEN s.ntok
       |         ELSE st.cnt + s.ntok END,
       |    st.flushed + CASE WHEN st.cnt + s.ntok > $maxTokens THEN 1 ELSE 0 END
       |  FROM state st JOIN sents s ON s.doc_id = st.doc_id AND s.i = st.idx + 1),
       |last AS (
       |  SELECT doc_id, idx, flushed,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY idx DESC) AS rn
       |  FROM state),
       |chunks AS (
       |  SELECT doc_id,
       |    CAST(flushed + CASE WHEN idx > 0 THEN 1 ELSE 0 END AS BIGINT) AS n_chunks
       |  FROM last WHERE rn = 1)
       |SELECT t.doc_id, t.n_tokens, c.n_chunks
       |FROM toks t JOIN chunks c USING (doc_id)""".stripMargin

  // ---- generic CTE generators: the summary STRING itself, per key group

  /** CTE block reconstructing [[extractiveSummarize]]'s output STRING per
    * key group — the full pipeline (sentence split, doc-frequency scoring,
    * (score desc, index) ranking, recursive-CTE greedy pick, original-order
    * reassembly joined by ' ') as DuckDB SQL. `inRel` must be a prior CTE
    * with columns `keyCols :+ t`; emits CTE definitions (comma-terminated
    * fragment for embedding in one outer WITH RECURSIVE) culminating in
    * `${p}_sum(keyCols..., summary)` — one row per `inRel` row, summary ''
    * when the text has no sentences (exactly [[extractiveSummarize]] on
    * empty ranked). */
  def extractiveSummaryCtes(p: String, inRel: String, keyCols: Seq[String],
                            maxLength: Int, minLength: Int): String = {
    val keys = keyCols.mkString(", ")
    def on(a: String, b: String) =
      keyCols.map(k => s"$a.$k = $b.$k").mkString(" AND ")
    def q(a: String) = keyCols.map(k => s"$a.$k").mkString(", ")
    val take = s"(p.npicked = 0 OR p.used + r.ntok <= $maxLength OR p.used < $minLength)"
    s"""${p}_sl AS MATERIALIZED (
       |  SELECT $keys,
       |    list_filter(list_transform(string_split(t, '.'), x -> trim(x)),
       |                x -> x <> '') AS ss
       |  FROM $inRel),
       |${p}_sents AS MATERIALIZED (
       |  SELECT $keys, generate_subscripts(ss, 1) AS i, unnest(ss) || '.' AS s
       |  FROM ${p}_sl),
       |${p}_stok AS MATERIALIZED (
       |  SELECT $keys, i, s,
       |    CAST(len(regexp_extract_all(s, '$tokenReSql')) AS INTEGER) AS ntok,
       |    list_filter(regexp_extract_all(lower(s), '$tokenReSql'),
       |                x -> regexp_matches(x, '\\p{L}')) AS words
       |  FROM ${p}_sents),
       |${p}_dw AS MATERIALIZED (
       |  SELECT $keys,
       |    unnest(list_filter(regexp_extract_all(lower(t), '$tokenReSql'),
       |                       x -> regexp_matches(x, '\\p{L}'))) AS w
       |  FROM $inRel),
       |${p}_freq AS MATERIALIZED (SELECT $keys, w, count(*) AS f FROM ${p}_dw GROUP BY ALL),
       |${p}_sw AS MATERIALIZED (SELECT $keys, i, unnest(words) AS w FROM ${p}_stok),
       |${p}_sscore AS MATERIALIZED (
       |  SELECT ${q("sw")}, sw.i, count(*) AS nw,
       |    CAST(sum(coalesce(f.f, 0)) AS BIGINT) AS sf
       |  FROM ${p}_sw sw LEFT JOIN ${p}_freq f
       |    ON ${on("f", "sw")} AND f.w = sw.w
       |  GROUP BY ALL),
       |${p}_ranked AS MATERIALIZED (
       |  SELECT ${q("st")}, st.i, st.s, st.ntok,
       |    row_number() OVER (PARTITION BY ${q("st")}
       |      ORDER BY coalesce(CAST(sc.sf AS DOUBLE) / (sc.nw + 1), 0.0) DESC,
       |               st.i) AS rn
       |  FROM ${p}_stok st LEFT JOIN ${p}_sscore sc
       |    ON ${on("sc", "st")} AND sc.i = st.i),
       |${p}_pick AS (
       |  SELECT $keys, 0 AS rn, 0 AS used, 0 AS npicked, FALSE AS took
       |  FROM $inRel
       |  UNION ALL
       |  SELECT ${q("p")}, p.rn + 1,
       |    p.used + CASE WHEN $take THEN r.ntok ELSE 0 END,
       |    p.npicked + CASE WHEN $take THEN 1 ELSE 0 END,
       |    $take
       |  FROM ${p}_pick p JOIN ${p}_ranked r
       |    ON ${on("r", "p")} AND r.rn = p.rn + 1),
       |${p}_sum AS (
       |  SELECT ${q("b")}, coalesce(sel.summary, '') AS summary
       |  FROM $inRel b LEFT JOIN (
       |    SELECT $keys, string_agg(s, ' ' ORDER BY i) AS summary
       |    FROM (SELECT ${q("p")}, r.s, r.i
       |          FROM ${p}_pick p JOIN ${p}_ranked r
       |            ON ${on("r", "p")} AND r.rn = p.rn
       |          WHERE p.took)
       |    GROUP BY ALL) sel
       |  ON ${on("sel", "b")}),""".stripMargin
  }

  /** CTE block reconstructing [[summarizeLongText]]'s output STRING per
    * key group: token-budget dispatch (≤ maxTokens → one-shot 250/50;
    * longer → greedy chunking via the [[splitText]] state machine, chunk
    * summaries at 512/30, ' '-join — empty chunks included, the mkString
    * contract — then a re-summarize of the merge at 250/50). `inRel`:
    * CTE with `keyCols :+ t`; emits a fragment culminating in
    * `${p}_final(keyCols..., summary)`. */
  def summarizeLongTextCtes(p: String, inRel: String, keyCols: Seq[String],
                            maxTokens: Int = MaxTokens,
                            maxLength: Int = 250, minLength: Int = 50): String = {
    val keys = keyCols.mkString(", ")
    def on(a: String, b: String) =
      keyCols.map(k => s"$a.$k = $b.$k").mkString(" AND ")
    def q(a: String) = keyCols.map(k => s"$a.$k").mkString(", ")
    s"""${p}_tok AS MATERIALIZED (
       |  SELECT $keys, t,
       |    CAST(len(regexp_extract_all(t, '$tokenReSql')) AS BIGINT) AS n_tokens
       |  FROM $inRel),
       |${p}_one AS MATERIALIZED (SELECT $keys, t FROM ${p}_tok WHERE n_tokens <= $maxTokens),
       |${extractiveSummaryCtes(s"${p}_os", s"${p}_one", keyCols, maxLength, minLength)}
       |${p}_long AS MATERIALIZED (SELECT $keys, t FROM ${p}_tok WHERE n_tokens > $maxTokens),
       |${p}_lsl AS MATERIALIZED (
       |  SELECT $keys,
       |    list_filter(list_transform(string_split(t, '.'), x -> trim(x)),
       |                x -> x <> '') AS ss
       |  FROM ${p}_long),
       |${p}_lsents AS MATERIALIZED (
       |  SELECT $keys, generate_subscripts(ss, 1) AS i, unnest(ss) || '.' AS s
       |  FROM ${p}_lsl),
       |${p}_lntok AS MATERIALIZED (
       |  SELECT $keys, i, s,
       |    CAST(len(regexp_extract_all(s, '$tokenReSql')) AS INTEGER) AS ntok
       |  FROM ${p}_lsents),
       |${p}_cstate AS (
       |  SELECT $keys, 0 AS idx, 0 AS cnt, 0 AS flushed FROM ${p}_long
       |  UNION ALL
       |  SELECT ${q("st")}, st.idx + 1,
       |    CASE WHEN st.cnt + s.ntok > $maxTokens THEN s.ntok
       |         ELSE st.cnt + s.ntok END,
       |    st.flushed + CASE WHEN st.cnt + s.ntok > $maxTokens THEN 1 ELSE 0 END
       |  FROM ${p}_cstate st JOIN ${p}_lntok s
       |    ON ${on("s", "st")} AND s.i = st.idx + 1),
       |${p}_assign AS (
       |  SELECT $keys, idx AS i, flushed + 1 AS cid
       |  FROM ${p}_cstate WHERE idx > 0),
       |${p}_nchunks AS MATERIALIZED (
       |  SELECT $keys, flushed + CASE WHEN idx > 0 THEN 1 ELSE 0 END AS n_chunks
       |  FROM (SELECT $keys, idx, flushed,
       |          row_number() OVER (PARTITION BY $keys ORDER BY idx DESC) AS rr
       |        FROM ${p}_cstate)
       |  WHERE rr = 1),
       |${p}_ctext AS MATERIALIZED (
       |  SELECT ${q("ci")}, ci.cid, coalesce(tx.t, '') AS t
       |  FROM (SELECT $keys,
       |          unnest(generate_series(1, CAST(n_chunks AS INTEGER))) AS cid
       |        FROM ${p}_nchunks) ci
       |  LEFT JOIN (SELECT ${q("a")}, a.cid, string_agg(se.s, ' ' ORDER BY se.i) AS t
       |             FROM ${p}_assign a JOIN ${p}_lsents se
       |               ON ${on("se", "a")} AND se.i = a.i
       |             GROUP BY ALL) tx
       |    ON ${on("tx", "ci")} AND tx.cid = ci.cid),
       |${extractiveSummaryCtes(s"${p}_cs", s"${p}_ctext", keyCols :+ "cid", 512, 30)}
       |${p}_merged AS MATERIALIZED (
       |  SELECT $keys, string_agg(summary, ' ' ORDER BY cid) AS t
       |  FROM ${p}_cs_sum GROUP BY ALL),
       |${extractiveSummaryCtes(s"${p}_rs", s"${p}_merged", keyCols, maxLength, minLength)}
       |${p}_final AS (
       |  SELECT $keys, summary FROM ${p}_os_sum
       |  UNION ALL
       |  SELECT ${q("l")}, coalesce(r.summary, '') AS summary
       |  FROM ${p}_long l LEFT JOIN ${p}_rs_sum r ON ${on("r", "l")}),""".stripMargin
  }

  /** DuckDB mirror of [[summaryStats]]: the term-frequency sentence
    * scoring rebuilt from scratch (doc-level letter-token frequencies
    * joined back onto each sentence's tokens), the (score desc, index)
    * ranking as a window, and the greedy budget pick replayed as a
    * RECURSIVE CTE advancing `(used, npicked)` over rank order — exactly
    * the [[greedyPick]] state machine, including always-take-first and
    * keep-taking-under-min. Score division is int/int → double in both
    * engines (exact operands ⇒ identical IEEE result ⇒ identical
    * ranking). Ends in a SELECT of (doc_id, n_sentences,
    * n_summary_sentences, top_sentence_idx). */
  def summaryStatsSql(docsRel: String, textExpr: String,
                      maxLength: Int = 250, minLength: Int = 50): String =
    s"""WITH RECURSIVE
       |base AS MATERIALIZED (SELECT doc_id, $textExpr AS t FROM $docsRel),
       |sl AS MATERIALIZED (
       |  SELECT doc_id,
       |    list_filter(list_transform(string_split(t, '.'), x -> trim(x)),
       |                x -> x <> '') AS ss
       |  FROM base),
       |sents AS MATERIALIZED (
       |  SELECT doc_id, generate_subscripts(ss, 1) AS i, unnest(ss) AS s
       |  FROM sl),
       |stok AS MATERIALIZED (
       |  SELECT doc_id, i,
       |    CAST(len(regexp_extract_all(s || '.', '$tokenReSql')) AS INTEGER) AS ntok,
       |    list_filter(regexp_extract_all(lower(s) || '.', '$tokenReSql'),
       |                x -> regexp_matches(x, '\\p{L}')) AS words
       |  FROM sents),
       |dw AS MATERIALIZED (
       |  SELECT doc_id,
       |    unnest(list_filter(regexp_extract_all(lower(t), '$tokenReSql'),
       |                       x -> regexp_matches(x, '\\p{L}'))) AS w
       |  FROM base),
       |freq AS MATERIALIZED (SELECT doc_id, w, count(*) AS f FROM dw GROUP BY 1, 2),
       |sw AS MATERIALIZED (SELECT doc_id, i, unnest(words) AS w FROM stok),
       |sscore AS MATERIALIZED (
       |  SELECT sw.doc_id, sw.i, count(*) AS nw,
       |    CAST(sum(coalesce(f.f, 0)) AS BIGINT) AS sf
       |  FROM sw LEFT JOIN freq f ON f.doc_id = sw.doc_id AND f.w = sw.w
       |  GROUP BY 1, 2),
       |ranked AS MATERIALIZED (
       |  SELECT st.doc_id, st.i, st.ntok,
       |    row_number() OVER (PARTITION BY st.doc_id
       |      ORDER BY coalesce(CAST(sc.sf AS DOUBLE) / (sc.nw + 1), 0.0) DESC,
       |               st.i) AS rn
       |  FROM stok st LEFT JOIN sscore sc
       |    ON sc.doc_id = st.doc_id AND sc.i = st.i),
       |pick AS (
       |  SELECT doc_id, 0 AS rn, 0 AS used, 0 AS npicked FROM base
       |  UNION ALL
       |  SELECT p.doc_id, p.rn + 1,
       |    p.used + CASE WHEN (p.npicked = 0 OR p.used + r.ntok <= $maxLength
       |                        OR p.used < $minLength) THEN r.ntok ELSE 0 END,
       |    p.npicked + CASE WHEN (p.npicked = 0 OR p.used + r.ntok <= $maxLength
       |                           OR p.used < $minLength) THEN 1 ELSE 0 END
       |  FROM pick p JOIN ranked r ON r.doc_id = p.doc_id AND r.rn = p.rn + 1),
       |lastpick AS (
       |  SELECT doc_id, npicked,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY rn DESC) AS rr
       |  FROM pick)
       |SELECT b.doc_id,
       |  CAST(coalesce(ns.n, 0) AS BIGINT) AS n_sentences,
       |  CAST(lp.npicked AS BIGINT) AS n_summary_sentences,
       |  CAST(coalesce(tp.i, 0) AS BIGINT) AS top_sentence_idx
       |FROM base b
       |LEFT JOIN (SELECT doc_id, count(*) AS n FROM sents GROUP BY 1) ns USING (doc_id)
       |JOIN (SELECT doc_id, npicked FROM lastpick WHERE rr = 1) lp USING (doc_id)
       |LEFT JOIN (SELECT doc_id, i FROM ranked WHERE rn = 1) tp USING (doc_id)""".stripMargin
}
