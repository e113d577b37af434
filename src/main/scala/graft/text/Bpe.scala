package graft.text

import org.apache.spark.sql.{Column, DataFrame}

import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING — the full loop, not just one
  * step (`text_bpe_merge_step` is the single-iteration pair count): k
  * rounds of (count pairs → pick best → apply the merge), emitting the
  * merge-table trajectory a tokenizer ships.
  *
  * Scale shape (why BPE is tractable on web corpora at all): the corpus
  * pass happens ONCE — the (word, frequency) vocabulary aggregate. Every
  * round after that touches only the VOCABULARY-grain symbol table
  * (Σ|word| rows), never the corpus. All windows are partitioned by
  * `word` (a word is ≤ tens of symbols — no skew), the best pair is a
  * 1-row broadcast, and each round materializes + lineage-truncates
  * (the PageRank/kcore loop discipline — without truncation Catalyst
  * re-analyzes a per-round-deepening plan).
  *
  * Merge application is the classic simultaneous LEFTMOST-GREEDY
  * non-overlapping rule — "aaa" under (a,a) → [aa, a], never [a, aa] —
  * and the two engines reach it through INDEPENDENT formulations, which
  * is exactly what makes the hash match evidence: the Spark side is a
  * row-local array fold (`aggregate`: append, or merge with the
  * accumulator tail when (tail, x) = (a, b) — a merged token is strictly
  * longer than `a`, so it can never re-trigger within the round), while
  * the DuckDB oracle ([[trajectorySql]]) expresses the same rule
  * relationally on the position grain: candidate positions group into
  * runs of consecutive positions (gaps-and-islands) and exactly the even
  * offsets merge, consumed successors dropping by an anti-join. Same
  * tie-break both sides (freq DESC, a ASC, b ASC; pure ASCII-binary
  * string order). The k-round SQL unroll is chained MATERIALIZED CTEs
  * (the kcore discipline: without MATERIALIZED, DuckDB re-inlines each
  * round's CTE once per reference and the unroll explodes
  * combinatorially).
  *
  * Reference anchor: the reference tokenizes with a pretrained BART
  * tokenizer (iqplus_market_transform.py:49–57 via transformers); this is
  * the TRAINING side of that artifact, built from the corpus itself.
  */
object Bpe {

  /** Trailing stats per round: (step, tok_a, tok_b, pair_freq,
    * corpus_tokens, vocab_tokens) — the merge table plus the compression
    * trajectory (corpus_tokens = Σ tf·|syms(w)| after the merge lands;
    * vocab_tokens = distinct symbol strings in play). */
  def trainTrajectory(docs: DataFrame, steps: Int): DataFrame =
    train(docs, steps)._1.reduce(_ unionByName _).orderBy("step")

  /** Per-language FERTILITY under the corpus's own trained tokenizer
    * (steps merges): bpe_tokens/word by language slice — the readout
    * `text_tokenizer_fertility` approximates with a regex proxy, here
    * computed from the REAL trained merge table. The per-(lang, word)
    * occurrence table joins the final per-word token counts on the
    * word grain (vocabulary-sized — broadcastable at any corpus scale),
    * so the corpus is scanned once and the loop stays vocab-grain. */
  def fertilityByLang(docs: DataFrame, steps: Int): DataFrame =
    fertilityByLangWith(docs, trainedWordTokens(docs, steps))

  /** The artifact a trained tokenizer publishes for the fertility
    * readout: the final per-word token counts (vocabulary grain). Stored
    * once per (corpus, steps), this is all [[fertilityByLang]]'s join
    * needs — training amortizes to zero across every downstream
    * application, exactly how production pipelines ship tokenizers. */
  def trainedWordTokens(docs: DataFrame, steps: Int): DataFrame =
    train(docs, steps)._2
      .select(col("word"), size(col("syms")).cast("long").as("n_tok"))

  /** [[fertilityByLang]] against a prebuilt `(word, n_tok)` table. */
  def fertilityByLangWith(docs: DataFrame, tok: DataFrame): DataFrame = {
    val lw = docs
      .select(col("lang"),
        explode(split(graft.util.Norm.normalize(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("lang", "word").agg(count(lit(1)).as("tf_lw"))
    lw.join(broadcast(tok), "word")
      .groupBy("lang")
      .agg(sum(col("tf_lw")).as("words"),
        sum(col("tf_lw") * col("n_tok")).as("bpe_tokens"),
        countDistinct(col("word")).as("vocab_words"))
      .withColumn("fertility",
        col("bpe_tokens").cast("double") / col("words").cast("double"))
      .orderBy("lang")
  }

  private def train(docs: DataFrame, steps: Int)
  : (Seq[DataFrame], DataFrame) = {
    val spark = docs.sparkSession

    val vocab = docs
      .select(explode(split(graft.util.Norm.normalize(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("tf"))

    def mat(df: DataFrame): DataFrame =
      org.apache.spark.sql.GraftColumnBridge.lineageTruncated(
        graft.util.Views.materialize(df))

    // WORD-grain state: one row per vocabulary word, symbols as an array
    // (seeded one character per symbol — substring, the shared convention
    // with text_bpe_merge_step, not split-on-empty-regex whose
    // trailing-empty behaviour differs between engines). Loop width by
    // the PageRank budget discipline: vocabulary rows per partition,
    // never session-width scheduling noise.
    val (vocabM, nWords) = graft.util.Views.materializeCounted(vocab)
    val loopWidth = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, nWords / 524288L + 1)).toInt
    var syms = mat(vocabM
      .select(col("word"), col("tf"),
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
          .as("syms"))
      .repartition(loopWidth, col("word")))

    var stats = Seq.empty[DataFrame]
    for (step <- 1 to steps) {
      // Pair counts: one explode + one keyed aggregate per round — the
      // ONLY shuffle in the loop body.
      val best = syms
        .select(col("tf"), explode(expr(
          "arrays_zip(slice(syms, 1, size(syms) - 1), " +
            "slice(syms, 2, size(syms) - 1))")).as("p"))
        .select(col("tf"), col("p.0").as("a"), col("p.1").as("b"))
        .groupBy("a", "b").agg(sum(col("tf")).as("freq"))
        .orderBy(col("freq").desc, col("a").asc, col("b").asc)
        .limit(1)

      // Apply: ROW-LOCAL leftmost-greedy fold. A merged token is
      // strictly longer than `a`, so it can never equal `a` and
      // re-trigger inside the same round — the fold IS the classic
      // simultaneous non-overlapping rule ("aaa" under (a,a) → [aa, a];
      // BpeSpec pins the adversarial runs). LEFT broadcast join so an
      // exhausted pair table (no pairs left) passes words through
      // unchanged instead of dropping them.
      val applied = syms
        .join(broadcast(best.select(col("a").as("m_a"), col("b").as("m_b"))),
          lit(true), "left")
        .select(col("word"), col("tf"), expr(
          """aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, x) ->
            |  CASE WHEN size(acc) > 0 AND element_at(acc, -1) = m_a
            |            AND x = m_b
            |       THEN concat(slice(acc, 1, size(acc) - 1),
            |                   array(concat(m_a, m_b)))
            |       ELSE concat(acc, array(x)) END)""".stripMargin).as("syms"))
      syms = mat(applied)

      stats = stats :+ best
        .select(lit(step).as("step"), col("a").as("tok_a"),
          col("b").as("tok_b"), col("freq").as("pair_freq"))
        .crossJoin(broadcast(syms.agg(
          sum(col("tf") * size(col("syms"))).as("corpus_tokens"))))
        .crossJoin(broadcast(syms.select(explode(col("syms")).as("tok"))
          .agg(countDistinct(col("tok")).as("vocab_tokens"))))
    }
    (stats, syms)
  }

  /** The identical k-round unroll in DuckDB SQL. Every round-referenced
    * CTE is MATERIALIZED (each is read 2–4 times; plain CTEs re-inline
    * per reference and the unroll explodes). Integer outputs are CAST
    * AS BIGINT (HUGEINT breaks the driver's hash compare). */
  def trajectorySql(docsRel: String, steps: Int): String = {
    val (ctes, _) = unrollCtes(docsRel, steps)
    val union = (1 to steps).map(r => s"SELECT * FROM st$r")
      .mkString("\nUNION ALL ")
    s"WITH $ctes\n$union\nORDER BY step"
  }

  /** Fertility oracle: the same unroll, finalized by joining the
    * per-(lang, word) occurrence table against the final symbol table's
    * per-word token counts. */
  def fertilitySql(docsRel: String, steps: Int): String = {
    val (ctes, fin) = unrollCtes(docsRel, steps)
    s"""WITH $ctes,
       |tok AS (SELECT word, CAST(count(*) AS BIGINT) AS n_tok
       |        FROM $fin GROUP BY 1),
       |lw AS (
       |  SELECT lang, word, CAST(count(*) AS BIGINT) AS tf_lw
       |  FROM (SELECT lang, unnest(string_split(
       |          ${graft.util.Norm.normalizeSql("text")}, ' ')) AS word
       |        FROM $docsRel)
       |  WHERE word <> '' GROUP BY 1, 2)
       |SELECT lang, CAST(sum(tf_lw) AS BIGINT) AS words,
       |  CAST(sum(tf_lw * n_tok) AS BIGINT) AS bpe_tokens,
       |  count(DISTINCT word) AS vocab_words,
       |  CAST(sum(tf_lw * n_tok) AS DOUBLE) / CAST(sum(tf_lw) AS DOUBLE)
       |    AS fertility
       |FROM lw JOIN tok USING (word)
       |GROUP BY 1 ORDER BY lang""".stripMargin
  }

  /** The shared WITH-body: seed + k rounds; returns (ctes, final symbol
    * relation name). */
  private def unrollCtes(docsRel: String, steps: Int): (String, String) = {
    val seed =
      s"""v AS MATERIALIZED (
         |  SELECT word, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT unnest(string_split(
         |          ${graft.util.Norm.normalizeSql("text")}, ' ')) AS word
         |        FROM $docsRel)
         |  WHERE word <> '' GROUP BY 1),
         |s0 AS MATERIALIZED (
         |  SELECT word, tf, CAST(i AS BIGINT) AS pos,
         |    substring(word, CAST(i AS INTEGER), 1) AS sym
         |  FROM (SELECT word, tf, unnest(range(1, length(word) + 1)) AS i
         |        FROM v))""".stripMargin
    val rounds = (1 to steps).map { r =>
      val p = s"p$r"; val b = s"b$r"; val c = s"c$r"
      val prev = s"s${r - 1}"; val cur = s"s$r"
      s"""$p AS MATERIALIZED (
         |  SELECT word, tf, pos, sym,
         |    lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
         |  FROM $prev),
         |$b AS MATERIALIZED (
         |  SELECT sym AS a, nxt AS b, CAST(sum(tf) AS BIGINT) AS freq
         |  FROM $p WHERE nxt IS NOT NULL
         |  GROUP BY 1, 2 ORDER BY freq DESC, a, b LIMIT 1),
         |$c AS MATERIALIZED (
         |  SELECT word, pos FROM (
         |    SELECT word, pos,
         |      (pos - min(pos) OVER (PARTITION BY word, grp)) % 2 AS par
         |    FROM (SELECT p.word, p.pos,
         |            p.pos - row_number() OVER (PARTITION BY p.word
         |                                       ORDER BY p.pos) AS grp
         |          FROM $p p, $b b
         |          WHERE p.sym = b.a AND p.nxt = b.b))
         |  WHERE par = 0),
         |$cur AS MATERIALIZED (
         |  SELECT word, tf,
         |    row_number() OVER (PARTITION BY word ORDER BY pos) AS pos, sym
         |  FROM (SELECT p.word, p.tf, p.pos,
         |          CASE WHEN h.pos IS NOT NULL THEN p.sym || p.nxt
         |               ELSE p.sym END AS sym
         |        FROM $p p
         |        LEFT JOIN $c h ON p.word = h.word AND p.pos = h.pos
         |        LEFT JOIN $c t ON p.word = t.word AND p.pos = t.pos + 1
         |        WHERE t.pos IS NULL)),
         |st$r AS (
         |  SELECT $r AS step, b.a AS tok_a, b.b AS tok_b,
         |    b.freq AS pair_freq,
         |    (SELECT CAST(sum(tf) AS BIGINT) FROM s$r) AS corpus_tokens,
         |    (SELECT CAST(count(DISTINCT sym) AS BIGINT) FROM s$r)
         |      AS vocab_tokens
         |  FROM $b b)""".stripMargin
    }
    (s"$seed,\n${rounds.mkString(",\n")}", s"s$steps")
  }
}
