package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: language ID,
  * quality scoring, token counting, and document fingerprinting — the
  * corpus-hygiene surface the reference lacks entirely (its only text
  * compute is the BART summarizer,
  * `Tugas 2/IQPLUS News/iqplus_market_transform.py:49-89`).
  *
  * All four are single-pass per-row projections — no shuffle at any
  * scale — and every expression is mirrored exactly in generated DuckDB
  * SQL so the driver's oracle hash-matches.
  */
object TextAnalysis {

  /** Stopword profiles for the n-gram language-ID heuristic. Tiny on
    * purpose: the operator's shape (token-set scoring + deterministic
    * argmax) is what matters at scale, where the profile would be the
    * standard 100-word lists. Order = tie-break priority. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "es" -> Seq("el", "los", "y", "es", "un", "una", "de", "que", "por", "como"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "des", "pour", "dans", "sur"))

  val HashMod = 1000000007L

  private def norm(c: Column): Column = graft.util.Norm.normalize(c)
  private def words(c: Column): Column = split(norm(c), " ")

  /** Tokens from `textCol` matching one stopword profile, as a count. */
  private def stopHits(textCol: Column, stops: Seq[String]): Column =
    size(filter(words(textCol), w => w.isInCollection(stops)))

  /** Adds one `score_<lang>` column per stopword profile. */
  private def withLangScores(docs: DataFrame, textCol: String): DataFrame =
    stopwords.foldLeft(docs) { case (df, (lang, stops)) =>
      df.withColumn(s"score_$lang",
        stopHits(col(textCol), stops).cast("double") / size(words(col(textCol))))
    }

  /** Deterministic argmax over the `score_<lang>` columns ('und' when
    * nothing matches; ties break in [[stopwords]] order). */
  private def langArgmax: Column =
    stopwords.zipWithIndex.foldRight(lit("und")) {
      case (((lang, _), i), elseExpr) =>
        val beats = stopwords.drop(i + 1).map { case (other, _) =>
          col(s"score_$lang") >= col(s"score_$other")
        }.foldLeft(col(s"score_$lang") > 0.0)(_ && _)
        when(beats, lit(lang)).otherwise(elseExpr)
    }

  /** Language ID: per-profile hit ratios + deterministic argmax. */
  def langId(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    withLangScores(docs, textCol).select(
      (col(idCol) +: stopwords.map { case (l, _) => col(s"score_$l") }) :+
        langArgmax.as("lang_id"): _*)

  /** Whitespace tokens + a BPE-ish regex tokenization (letter runs, digit
    * runs, single punctuation marks — the GPT-2 pre-tokenizer shape). */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      size(split(trim(col(textCol)), "[ \\t\\n\\x0B\\f\\r]+")).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col(textCol),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0))).cast("long").as("n_bpe_tokens"))

  /** The quality-signal expressions over a text column, by name. */
  private def qualitySignals(t: Column): Seq[(String, Column)] = {
    val nWords = size(words(t)).cast("double")
    val nChars = length(t).cast("double")
    val nPunct = (length(t) - length(regexp_replace(t, "[.,!?;:]", ""))).cast("double")
    val nDigit = (length(t) - length(regexp_replace(t, "[0-9]", ""))).cast("double")
    val stopRatio = stopHits(t, stopwords.head._2).cast("double") / nWords
    val avgWordLen = (length(regexp_replace(norm(t), " ", "")).cast("double")) / nWords
    Seq(
      "n_words" -> nWords,
      "avg_word_len" -> avgWordLen,
      "stopword_ratio" -> stopRatio,
      "punct_ratio" -> (nPunct / nChars),
      "digit_ratio" -> (nDigit / nChars),
      // plausible-document heuristic: stopword presence up-weights, heavy
      // punctuation/digits down-weight, degenerate word lengths penalized
      "quality_score" -> (stopRatio * 2.0 +
        when(avgWordLen >= 3.0 && avgWordLen <= 10.0, 0.5).otherwise(0.0)
        - (nPunct / nChars) - (nDigit / nChars)))
  }

  /** Length/stopword/punctuation/digit signals + a composite quality
    * score in [0, ~1]. Pure arithmetic over counts — FP-identical across
    * engines. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol) +:
      qualitySignals(col(textCol)).map { case (n, c) => c.as(n) }: _*)

  /** Gate thresholds shared by the batch gate (`SparkEntry.qualityGate`)
    * and the streaming ingest gate ([[graft.streaming.Streams]]). */
  val GateMinWords = 20
  val GateMaxTopWordRatio = 0.2
  val GateMinQuality = 0.55

  /** ROW-LOCAL most-common-word ratio: sort the word array, fold once
    * tracking the longest equal-run — no explode, no aggregation, no
    * shuffle, which is what makes the full quality gate usable as a
    * STATELESS streaming projection. Equals the batch explode→count
    * computation exactly (PipelineOpsSpec proves it on the corpus);
    * per-row cost is O(words log words), bounded by document length. */
  def topWordRatio(textCol: Column): Column = {
    val ws = sort_array(filter(words(textCol), w => w =!= ""))
    val folded = aggregate(
      ws,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("mx")),
      (acc, w) => {
        val run = when(w === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(w.as("prev"), run.as("run"),
          greatest(acc.getField("mx"), run).as("mx"))
      })
    when(size(ws) > 0,
      folded.getField("mx").cast("double") / size(ws)).otherwise(lit(0.0))
  }

  /** The gate verdict over already-computed signal columns. */
  def gateKeep(nWords: Column, langId: Column, topWordRatio: Column,
               quality: Column): Column =
    nWords >= GateMinWords && langId =!= "und" &&
      topWordRatio <= GateMaxTopWordRatio && quality >= GateMinQuality

  /** APPENDS the gate-signal columns (n_words, quality_score, lang_id)
    * to `docs`, keeping every existing column — one projection, row
    * local, usable as a stateless streaming stage. */
  def withGateSignals(docs: DataFrame, textCol: String): DataFrame = {
    val sig = qualitySignals(col(textCol)).toMap
    val scored = withLangScores(docs, textCol)
    scored.select(
      (docs.columns.map(c => col(s"`$c`")) ++ Seq(
        sig("n_words").as("n_words"),
        sig("quality_score").as("quality_score"),
        langArgmax.as("lang_id"))): _*)
  }

  /** The per-row inputs of a composite quality GATE — word count,
    * composite quality, language — fused into ONE projection over one
    * scan (joining [[qualityScore]] and [[langId]] outputs would scan
    * the corpus twice for what is row-local arithmetic). */
  def gateSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    withGateSignals(docs.select(col(idCol), col(textCol)), textCol)
      .select(col(idCol), col("n_words"), col("quality_score"), col("lang_id"))

  /** Content-addressed md5 fingerprint + an order-sensitive word-level
    * polynomial rolling hash (Rabin–Karp shape: h = (h*31 + wordval) mod
    * [[HashMod]], wordval = 131*codepoint(first char) + length). The md5
    * catches exact bytes; the rolling hash is the cheap shift-sensitive
    * signature used for fast prefilter/fingerprint tables. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val wordVals = transform(words(col(textCol)),
      w => (ascii(w) * 131 + length(w)).cast("long"))
    docs.select(
      col(idCol),
      md5(norm(col(textCol)).cast("binary")).as("md5_fingerprint"),
      aggregate(wordVals, lit(0L),
        (acc, x) => (acc * 31 + x) % HashMod).as("rolling_hash"))
  }

  // --------------------------------------------------------------- oracle

  private def normSql(x: String): String = graft.util.Norm.normalizeSql(x)
  private def wordsSql(x: String): String = s"string_split(${normSql(x)}, ' ')"

  private def stopHitsSql(x: String, stops: Seq[String]): String = {
    val set = stops.map(s => s"'$s'").mkString(", ")
    s"len(list_filter(${wordsSql(x)}, w -> w IN ($set)))"
  }

  private def langScoresSql(textCol: String): String =
    stopwords.map { case (l, stops) =>
      s"CAST(${stopHitsSql(textCol, stops)} AS DOUBLE) / len(${wordsSql(textCol)}) AS score_$l"
    }.mkString(",\n    ")

  private def langCaseSql: String =
    stopwords.zipWithIndex.foldRight("'und'") {
      case (((lang, _), i), elseExpr) =>
        val beats = (s"score_$lang > 0.0" +:
          stopwords.drop(i + 1).map { case (other, _) => s"score_$lang >= score_$other" })
          .mkString(" AND ")
        s"CASE WHEN $beats THEN '$lang' ELSE $elseExpr END"
    }

  def langIdSql(docsRel: String, idCol: String, textCol: String): String =
    s"""SELECT $idCol, ${stopwords.map { case (l, _) => s"score_$l" }.mkString(", ")},
       |  $langCaseSql AS lang_id
       |FROM (SELECT $idCol, ${langScoresSql(textCol)} FROM $docsRel)""".stripMargin

  def tokenStatsSql(docsRel: String, idCol: String, textCol: String): String =
    s"""SELECT $idCol,
       |  CAST(len(string_split_regex(trim($textCol), '[ \\t\\n\\x0B\\f\\r]+')) AS BIGINT) AS n_ws_tokens,
       |  CAST(len(regexp_extract_all($textCol, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_bpe_tokens
       |FROM $docsRel""".stripMargin

  def qualityScoreSql(docsRel: String, idCol: String, textCol: String): String = {
    val t = textCol
    val nWords = s"CAST(len(${wordsSql(t)}) AS DOUBLE)"
    val nChars = s"CAST(length($t) AS DOUBLE)"
    val nPunct = s"CAST(length($t) - length(regexp_replace($t, '[.,!?;:]', '', 'g')) AS DOUBLE)"
    val nDigit = s"CAST(length($t) - length(regexp_replace($t, '[0-9]', '', 'g')) AS DOUBLE)"
    val stopRatio = s"CAST(${stopHitsSql(t, stopwords.head._2)} AS DOUBLE) / $nWords"
    val avgWordLen = s"CAST(length(regexp_replace(${normSql(t)}, ' ', '', 'g')) AS DOUBLE) / $nWords"
    s"""SELECT $idCol,
       |  $nWords AS n_words,
       |  $avgWordLen AS avg_word_len,
       |  $stopRatio AS stopword_ratio,
       |  $nPunct / $nChars AS punct_ratio,
       |  $nDigit / $nChars AS digit_ratio,
       |  ($stopRatio) * 2.0
       |    + (CASE WHEN $avgWordLen >= 3.0 AND $avgWordLen <= 10.0 THEN 0.5 ELSE 0.0 END)
       |    - $nPunct / $nChars - $nDigit / $nChars AS quality_score
       |FROM $docsRel""".stripMargin
  }

  /** SQL twin of [[gateSignals]]: one scan, score subquery + outer CASE. */
  def gateSignalsSql(docsRel: String, idCol: String, textCol: String): String = {
    val t = textCol
    val nWords = s"CAST(len(${wordsSql(t)}) AS DOUBLE)"
    val nChars = s"CAST(length($t) AS DOUBLE)"
    val nPunct = s"CAST(length($t) - length(regexp_replace($t, '[.,!?;:]', '', 'g')) AS DOUBLE)"
    val nDigit = s"CAST(length($t) - length(regexp_replace($t, '[0-9]', '', 'g')) AS DOUBLE)"
    val stopRatio = s"CAST(${stopHitsSql(t, stopwords.head._2)} AS DOUBLE) / $nWords"
    val avgWordLen = s"CAST(length(regexp_replace(${normSql(t)}, ' ', '', 'g')) AS DOUBLE) / $nWords"
    s"""SELECT $idCol, n_words, quality_score, $langCaseSql AS lang_id
       |FROM (SELECT $idCol,
       |  $nWords AS n_words,
       |  ($stopRatio) * 2.0
       |    + (CASE WHEN $avgWordLen >= 3.0 AND $avgWordLen <= 10.0 THEN 0.5 ELSE 0.0 END)
       |    - $nPunct / $nChars - $nDigit / $nChars AS quality_score,
       |  ${langScoresSql(t)}
       |FROM $docsRel)""".stripMargin
  }

  def fingerprintsSql(docsRel: String, idCol: String, textCol: String): String =
    s"""SELECT $idCol,
       |  md5(${normSql(textCol)}) AS md5_fingerprint,
       |  list_reduce(
       |    list_prepend(CAST(0 AS BIGINT),
       |      list_transform(${wordsSql(textCol)},
       |        w -> CAST(ascii(w) * 131 + length(w) AS BIGINT))),
       |    (acc, x) -> (acc * 31 + x) % ${HashMod}) AS rolling_hash
       |FROM $docsRel""".stripMargin
}
