package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.EntryOps._

/** YF QUANT-ANALYTICS family: the indicator/statistics extensions over the
  * OHLCV bars (EWMA/MACD/RSI-class trend indicators, risk measures,
  * regression/rank statistics, portfolio math) — split out of
  * [[YfRegistry]] (round 13, registry size hygiene: no shard >2000 LoC).
  *
  * Registry shard of [[SparkEntry]] (keys are merged — and spec-checked
  * disjoint — in SparkEntry.queries/oracleSql).
  */
private[graft] object YfIndicatorRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // EXACT-INTEGER EWMA (trend indicator): exponentially weighted
    // moving average with decay ½ over an 8-day window. The decay
    // choice is the determinism trick: halving weights make the
    // numerator a HORNER FOLD in integer arithmetic — acc·2 + x over
    // the window oldest→newest puts weight 2^(n-1-i) on element i
    // (newest highest after the reverse), EXACT in BIGINT on both
    // engines, with one IEEE division chain at the end. A general decay
    // λ needs pow(λ, j), which is NOT correctly rounded and diverges
    // cross-engine. collect_list/list() over an ordered row frame
    // yields frame order on both engines; the fold replays in DuckDB
    // via list_reduce (whose first-element seed equals the 0-seed
    // Horner). Per-symbol windows — no global ordering at any scale.
    "yf_ewma" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Close") * 1e8 + 0.5).cast("long")).as("close_sum"),
          count(lit(1)).as("n_bars"))
        .withColumn("xq", expr("close_sum div n_bars"))
      val w = Window.partitionBy("symbol").orderBy("Date").rowsBetween(-7, 0)
      daily
        .withColumn("arr", collect_list(col("xq")).over(w))
        .select(col("symbol"), col("Date"),
          (expr("aggregate(reverse(arr), CAST(0 AS BIGINT), (acc, x) -> acc * 2 + x)")
            .cast("double") /
            (expr("shiftleft(CAST(1 AS BIGINT), size(arr))") - 1) / 1e8).as("ewma"))
        .orderBy("symbol", "Date")
    }),


    // AUTOCORRELATION (lag-1..3 ACF of each symbol's daily close — the
    // time-series diagnostic behind every mean-reversion/momentum
    // screen). Daily bars consolidate to an integer q6 close (2-dp
    // source values — q6 is exact); each lag pairs x_t with x_{t-k} via
    // a per-symbol lag window, and Pearson r comes from PURE-BIGINT
    // moment sums (n ≤ trading days, xq ≤ 1e5 ⇒ every product and sum
    // ≤ ~4e14, far inside BIGINT — unlike the double-promoted moment
    // arithmetic of events_type_value_corr, nothing here rounds before
    // the final expression): numerator n·Σxy − Σx·Σy and both variance
    // terms stay exact integers, cast once into a single IEEE
    // sqrt+divide tree, so r is bit-identical cross-engine. Zero-
    // variance pairs null out via nullif. Lag windows and the moment
    // aggregation are per-symbol — no global ordering at any scale.
    "yf_acf" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Close") * 1e6 + 0.5).cast("long")).as("close_sum"),
          count(lit(1)).as("n_bars"))
        .withColumn("xq", expr("close_sum div n_bars"))
      val w = Window.partitionBy("symbol").orderBy("Date")
      val lagged = daily.select(
        col("symbol"), col("xq"),
        lag(col("xq"), 1).over(w).as("l1"),
        lag(col("xq"), 2).over(w).as("l2"),
        lag(col("xq"), 3).over(w).as("l3"))
      val byLag = (1 to 3).map { k =>
        lagged.filter(col(s"l$k").isNotNull)
          .select(col("symbol"), lit(k).as("lag"),
            col("xq").as("x"), col(s"l$k").as("y"))
      }.reduce(_ unionAll _)
      val mom = byLag.groupBy("symbol", "lag").agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      mom
        .withColumn("vx", col("n") * col("sxx") - col("sx") * col("sx"))
        .withColumn("vy", col("n") * col("syy") - col("sy") * col("sy"))
        .withColumn("acf",
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt(nullif((col("vx").cast("double") * col("vy")), lit(0.0))))
        .select("symbol", "lag", "n", "acf")
        .orderBy("symbol", "lag")
    }),


    // MARKET BETA (each symbol's return sensitivity to the equal-weight
    // market — the cross-sectional regression slope every risk model
    // starts from). Daily returns derive from integer q6 closes by ONE
    // IEEE division then QUANTIZE to 1e-4 longs (bit-identical per row
    // cross-engine ⇒ the quantized longs are identical, and every moment
    // sum after that is exact BIGINT — the summation-order discipline
    // applied to derived FP values); the market return is the integer
    // mean (div) of the day's symbol returns, joined back broadcast (one
    // row per trading day). β = (n·Σxm − Σx·Σm)/(n·Σmm − Σm²) — all four
    // terms exact integers cast once into a single division. Lag windows
    // per symbol; moments per symbol; nothing global. Degenerate (zero
    // market variance) symbols null via nullif.
    "yf_beta" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Close") * 1e6 + 0.5).cast("long")).as("close_sum"),
          count(lit(1)).as("n_bars"))
        .withColumn("xq", expr("close_sum div n_bars"))
      val w = Window.partitionBy("symbol").orderBy("Date")
      val rets = daily
        .withColumn("prev", lag(col("xq"), 1).over(w))
        .filter(col("prev").isNotNull && col("prev") =!= 0L)
        .withColumn("rq",
          floor((col("xq").cast("double") / col("prev") - 1.0) * 1e4 + 0.5)
            .cast("long"))
      val mkt = rets.groupBy("Date")
        .agg(expr("sum(rq) div count(1)").as("mq"))
      val mom = rets.join(broadcast(mkt), "Date")
        .groupBy("symbol").agg(
          count(lit(1)).as("n"),
          sum(col("rq")).as("sx"), sum(col("mq")).as("sm"),
          sum(col("rq") * col("mq")).as("sxm"),
          sum(col("mq") * col("mq")).as("smm"))
      mom
        .withColumn("beta",
          (col("n") * col("sxm") - col("sx") * col("sm")).cast("double") /
            nullif((col("n") * col("smm") - col("sm") * col("sm"))
              .cast("double"), lit(0.0)))
        .select("symbol", "n", "beta")
        .orderBy("symbol")
    }),


    // MACD (moving-average convergence/divergence) — completes the
    // indicator family (SMA/EWMA/RSI/Bollinger/VWAP). Deterministic
    // variant: both EWMAs use the yf_ewma half-decay Horner fold (decay
    // ½ is what keeps the numerator EXACT in BIGINT — a standard 12/26
    // smoothing needs pow(λ,j), which is not correctly rounded and
    // diverges cross-engine) at fast=4-day / slow=8-day windows, and the
    // signal line is Cutler-style SMA-3 of the QUANTIZED macd (the
    // yf_rsi precedent: SMA over exact integers instead of a recursive
    // EWMA of doubles). macd = fast − slow of bit-identical doubles;
    // histogram = macd − signal. Per-symbol windows — no global order.
    "yf_macd" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Close") * 1e8 + 0.5).cast("long")).as("close_sum"),
          count(lit(1)).as("n_bars"))
        .withColumn("xq", expr("close_sum div n_bars"))
      def win(n: Int) = Window.partitionBy("symbol").orderBy("Date")
        .rowsBetween(-(n - 1), 0)
      def horner(arr: String): Column =
        expr(s"aggregate(reverse($arr), CAST(0 AS BIGINT), " +
          "(acc, x) -> acc * 2 + x)").cast("double") /
          (expr(s"shiftleft(CAST(1 AS BIGINT), size($arr))") - 1) / 1e8
      val wSig = Window.partitionBy("symbol").orderBy("Date").rowsBetween(-2, 0)
      // The signal line and histogram are emitted as EXACT integers —
      // signal = sig_num/sig_cnt/1e8 and hist·cnt·1e8 = hist_q — rather
      // than %.4e strings: SMA-of-quantized values terminates in few
      // decimal digits, which lands exactly on 5th-significant-digit
      // midpoints where JVM HALF_UP and C half-even formatting disagree
      // (the one case Stable.sig's margin cannot absorb; observed on
      // this very query's hist column). Integers sidestep formatting
      // entirely. macd keeps the sig form — a difference of two
      // 15-digit-dividend quotients never terminates on a midpoint.
      daily
        .withColumn("arr_f", collect_list(col("xq")).over(win(4)))
        .withColumn("arr_s", collect_list(col("xq")).over(win(8)))
        .withColumn("macd", horner("arr_f") - horner("arr_s"))
        .withColumn("macd_q", floor(col("macd") * 1e8 + 0.5).cast("long"))
        .withColumn("sig_num", sum(col("macd_q")).over(wSig))
        .withColumn("sig_cnt", count(lit(1)).over(wSig))
        .select(col("symbol"), col("Date"),
          util.Stable.sig(col("macd")).as("macd_sig"),
          col("macd_q"), col("sig_num"), col("sig_cnt"),
          (col("macd_q") * col("sig_cnt") - col("sig_num")).as("hist_q"))
        .orderBy("symbol", "Date")
    }),


    // ON-BALANCE VOLUME (OBV) — the cumulative member of the indicator
    // family (MACD/RSI/Bollinger are windowed; OBV is an unbounded
    // running sum): volume flows with the close's direction — added on
    // up-days, subtracted on down-days, flat otherwise. INTEGER-exact
    // end to end: daily close consolidates to the same 1e-8-quantized
    // mean as yf_ewma, volume is integral by construction, and the
    // signed cumulative sum is pure BIGINT — no FP anywhere, so the
    // hash match is trivial. Per-symbol lag + running-sum windows (the
    // events_sessionize shape) — no global ordering at any scale.
    "yf_obv" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Close") * 1e8 + 0.5).cast("long")).as("close_sum"),
          count(lit(1)).as("n_bars"),
          sum(col("Volume").cast("long")).as("vol"))
        .withColumn("xq", expr("close_sum div n_bars"))
      val wo = Window.partitionBy("symbol").orderBy("Date")
      daily
        .withColumn("prev", lag(col("xq"), 1).over(wo))
        .withColumn("signed", when(col("prev").isNull, lit(0L))
          .when(col("xq") > col("prev"), col("vol"))
          .when(col("xq") < col("prev"), -col("vol"))
          .otherwise(lit(0L)))
        .withColumn("obv",
          sum(col("signed")).over(wo.rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("symbol"), col("Date"), col("obv"))
        .orderBy("symbol", "Date")
    }),


    // PER-SYMBOL OLS TREND — closed-form simple linear regression of the
    // (1e-6-quantized) daily close on the trading-day index: slope,
    // intercept, and R² from the five moment sums, the regression sibling
    // of yf_acf's correlation readout. Everything before the final
    // per-row expression is exact integer arithmetic (x = days since the
    // window start ≤ 365, y ≤ 1e5 quantized ⇒ every moment sum and both
    // variance terms stay far inside BIGINT), so the one IEEE
    // divide/multiply tree per symbol is bit-identical cross-engine.
    // One keyed aggregate with map-side combine — no window, no global
    // ordering; at 100 TB this is a single shuffle keyed by symbol.
    "yf_trend_ols" -> ((s, dir) => {
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Close") * 1e6 + 0.5).cast("long")).as("close_sum"),
          count(lit(1)).as("n_bars"))
        .withColumn("y", expr("close_sum div n_bars"))
        .withColumn("x", datediff(col("Date"), lit("1995-01-01")).cast("long"))
      val mom = daily.groupBy("symbol").agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      mom
        .withColumn("vx", col("n") * col("sxx") - col("sx") * col("sx"))
        .withColumn("vy", col("n") * col("syy") - col("sy") * col("sy"))
        .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
        .withColumn("slope",
          col("num").cast("double") / nullif(col("vx").cast("double"), lit(0.0)))
        .withColumn("intercept",
          (col("sy").cast("double") - col("slope") * col("sx").cast("double"))
            / col("n").cast("double"))
        .withColumn("r2",
          (col("num").cast("double") * col("num").cast("double")) /
            nullif(col("vx").cast("double") * col("vy").cast("double"), lit(0.0)))
        .select("symbol", "n", "slope", "intercept", "r2")
        .orderBy("symbol")
    }),


    // VALUE-AT-RISK / CVaR — the tail-risk member of the indicator
    // family: per symbol, the k-th worst daily change (k = ⌈5%·n⌉,
    // computed as the exact integer (n+19) div 20) and the mean of the
    // k worst (CVaR / expected shortfall). Daily changes are differences
    // of 1e-8-quantized closes — exact BIGINT end to end; the only FP is
    // the final sum/k divide. Selection is rank-based ((dq, Date)
    // row_number = a total order, so ties are deterministic) rather than
    // value-threshold-based, which is also what makes it scale: per-
    // symbol windows, no global ordering anywhere.
    "yf_var_cvar" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Close") * 1e8 + 0.5).cast("long")).as("close_sum"),
          count(lit(1)).as("n_bars"))
        .withColumn("xq", expr("close_sum div n_bars"))
      val wo = Window.partitionBy("symbol").orderBy("Date")
      val dq = daily
        .withColumn("dq", col("xq") - lag(col("xq"), 1).over(wo))
        .filter(col("dq").isNotNull)
      val ranked = dq
        .withColumn("rn", row_number().over(
          Window.partitionBy("symbol").orderBy(col("dq"), col("Date"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("symbol")))
        .withColumn("k", expr("(n + 19) div 20"))
      ranked.filter(col("rn") <= col("k"))
        .groupBy("symbol", "n", "k")
        .agg(max(col("dq")).as("var_q"), sum(col("dq")).as("tail_sum_q"))
        .withColumn("cvar",
          col("tail_sum_q").cast("double") / col("k").cast("double") / 1e8)
        .select(col("symbol"), col("n").as("n_days"), col("k"),
          (col("var_q") / 1e8).as("var"), col("cvar"))
        .orderBy("symbol")
    }),


    // DAY-OF-WEEK SEASONALITY — the decomposition-lite readout: per
    // (symbol, weekday), the mean 1e-6-quantized close against the
    // symbol's overall mean, as an absolute deviation and a ratio. Both
    // means divide exact integer sums once; the per-symbol totals
    // re-aggregate the 7-row-per-symbol cell table (never a second
    // corpus pass) and join back co-keyed — the marginals pattern of
    // events_chi2_independence applied to a seasonal profile. Two keyed
    // aggregates + one broadcast-size join; no windows.
    "yf_seasonality" -> ((s, dir) => {
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Close") * 1e6 + 0.5).cast("long")).as("close_sum"),
          count(lit(1)).as("n_bars"))
        .withColumn("xq", expr("close_sum div n_bars"))
        // Weekday bucket as epoch-day arithmetic (0..6 anchored at the
        // window start), NOT dayofweek(): Spark numbers Sunday=1..7 while
        // DuckDB's dow is 0-based — integer day math is the contract both
        // engines share (same rule as the events dow buckets).
        .withColumn("dow",
          (datediff(col("Date"), lit("1995-01-01")) % 7).cast("long"))
      val cells = daily.groupBy("symbol", "dow")
        .agg(count(lit(1)).as("n_days"), sum(col("xq")).as("sum_q"))
      val totals = cells.groupBy("symbol")
        .agg(sum(col("n_days")).as("n_total"), sum(col("sum_q")).as("sum_total"))
      cells.join(totals, "symbol")
        .withColumn("dow_mean",
          col("sum_q").cast("double") / col("n_days").cast("double") / 1e6)
        .withColumn("overall_mean",
          col("sum_total").cast("double") / col("n_total").cast("double") / 1e6)
        .withColumn("seasonal_ratio", col("dow_mean") / col("overall_mean"))
        .select("symbol", "dow", "n_days", "dow_mean", "overall_mean",
          "seasonal_ratio")
        .orderBy("symbol", "dow")
    }),


    // HERFINDAHL–HIRSCHMAN CONCENTRATION — how concentrated is monthly
    // trading volume across symbols? HHI = Σ share² per month, shares
    // from exact integer volume sums: numerator Σv² and denominator
    // (Σv)² stay in BIGINT through the aggregates and divide ONCE —
    // never a per-symbol double share summed across the group (that sum
    // would be partitioning-order-dependent). Two keyed aggregates, the
    // second over the per-(month,symbol) table; the anti-trust readout
    // reused here as a corpus-source concentration audit shape. Volume
    // aggregates in units of 1000 (integer-divided BEFORE summing, same
    // rule both engines) so Σv² keeps BIGINT headroom at 100× the
    // fixture volume — shares are scale-free, so the unit cancels.
    "yf_hhi_concentration" -> ((s, dir) => {
      val monthly = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .withColumn("month", date_format(col("Date"), "yyyy-MM"))
        .groupBy("month", "symbol")
        .agg(sum(expr("CAST(Volume AS BIGINT) div 1000")).as("v"))
      monthly.groupBy("month")
        .agg(count(lit(1)).as("n_symbols"),
          sum(col("v")).as("sv"), sum(col("v") * col("v")).as("svv"))
        .withColumn("hhi",
          col("svv").cast("double") / (col("sv").cast("double") * col("sv").cast("double")))
        .select("month", "n_symbols", "sv", "hhi")
        .orderBy("month")
    }),


    // CROSS-SYMBOL CORRELATION SCREEN — the pairs-trading / risk-model
    // input: Pearson r between every symbol pair's daily closes over the
    // shared calendar, top-20 most-correlated pairs. The self-join is
    // CO-KEYED ON Date (each day's cross-section pairs locally — never
    // an all-days cross product), the moment sums per pair are exact
    // BIGINT over 1e-6-quantized closes, and r is one IEEE tree per
    // pair — so ordering by r is deterministic cross-engine and the
    // top-20 lands in TakeOrderedAndProject. Pairs scale as symbols²:
    // at thousands of symbols you block by sector/liquidity tier first
    // (the dedup-LSH banding argument applied to finance); the
    // ≥30-shared-days floor keeps spurious short-overlap pairs out.
    "yf_pairs_correlation" -> ((s, dir) => {
      // MATERIALIZE the daily consolidation: both sides of the self-join
      // reference it, and without caching each side re-runs the 600k-row
      // fact scan + aggregate (measured 6.1 s → ~3 s at sf0.1 cached —
      // the graph_reachability edge-list discipline).
      val daily = util.Views.materialize(Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Close") * 1e6 + 0.5).cast("long")).as("cs"),
          count(lit(1)).as("nb"))
        .select(col("symbol"), col("Date"), expr("cs div nb").as("xq")))
      val pairs = daily.as("a").join(daily.as("b"),
          col("a.Date") === col("b.Date") && col("a.symbol") < col("b.symbol"))
        .select(col("a.symbol").as("s1"), col("b.symbol").as("s2"),
          col("a.xq").as("x"), col("b.xq").as("y"))
      // Repartition RAW pair rows before the moment aggregate (round 13):
      // group cardinality here is C(symbols, 2) — at sf0.1 ~500 k pairs
      // against ~10 M join rows scattered by Date, so the partial
      // aggregate reduced almost nothing per partition while WIDENING
      // every shipped row from 4 columns to its 8-column partial state
      // (measured: this exchange was the suite's largest byte mover,
      // 158 MB/rep). Pair-keying the exchange ships the narrow raw rows
      // and the aggregate then runs exchange-free — the inverse of the
      // PageRank-loop rule, decided the same way: by the measured
      // reduction ratio (guide §2.3 "aggregate before you shuffle" pays
      // only when the partial map actually reduces).
      pairs.repartition(col("s1"), col("s2")).groupBy("s1", "s2")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .filter(col("n") >= 30)
        .withColumn("r",
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt(nullif(
              (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
                (col("n") * col("syy") - col("sy") * col("sy")).cast("double"),
              lit(0.0))))
        .filter(col("r").isNotNull)
        .select("s1", "s2", "n", "r")
        .orderBy(col("r").desc, col("s1"), col("s2"))
        .limit(20)
    }),


    // UNDERWATER-SPELL DURATION — the drawdown readout yf_returns_drawdown
    // omits: the LONGEST consecutive run of days below the running peak
    // per symbol (how long investors waited for a new high). Running max
    // + gaps-and-islands segmentation (new-high days increment the run
    // id, underwater runs group under it) — all per-symbol windows on
    // exact integer quantized closes; the rollup counts the longest
    // island. The sessionize shape applied to a derived predicate.
    "yf_underwater_duration" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Close") * 1e8 + 0.5).cast("long")).as("cs"),
          count(lit(1)).as("nb"))
        .withColumn("xq", expr("cs div nb"))
      val wo = Window.partitionBy("symbol").orderBy("Date")
        .rowsBetween(Window.unboundedPreceding, 0)
      val marked = daily
        .withColumn("peak", max(col("xq")).over(wo))
        .withColumn("under", (col("xq") < col("peak")).cast("long"))
        .withColumn("run_id", sum(lit(1L) - col("under")).over(wo))
      val spells = marked.filter(col("under") === 1L)
        .groupBy("symbol", "run_id").agg(count(lit(1)).as("spell_len"))
      daily.groupBy("symbol").agg(count(lit(1)).as("n_days"))
        .join(spells.groupBy("symbol")
            .agg(sum(col("spell_len")).as("n_underwater"),
              max(col("spell_len")).as("max_spell")),
          Seq("symbol"), "left")
        .select(col("symbol"), col("n_days"),
          coalesce(col("n_underwater"), lit(0L)).as("n_underwater"),
          coalesce(col("max_spell"), lit(0L)).as("max_spell"))
        .orderBy("symbol")
    }),


    // SHARPE & SORTINO RATIOS — risk-adjusted return per symbol over the
    // 1995 window: mean daily change over total vs DOWNSIDE-ONLY
    // dispersion. Both second moments are exact BIGINT over 1e-8-
    // quantized close diffs (the yf_var_cvar series); population
    // stddev and the two ratios are one IEEE tree per symbol. Sortino's
    // downside moment conditions inside the SAME aggregate (CASE, not a
    // second scan). One keyed aggregate, no windows beyond the lag.
    "yf_sharpe_sortino" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Close") * 1e8 + 0.5).cast("long")).as("cs"),
          count(lit(1)).as("nb"))
        .withColumn("xq", expr("cs div nb"))
      val wo = Window.partitionBy("symbol").orderBy("Date")
      val dq = daily.withColumn("dq", col("xq") - lag(col("xq"), 1).over(wo))
        .filter(col("dq").isNotNull)
      dq.groupBy("symbol").agg(
          count(lit(1)).as("n"),
          sum(col("dq")).as("sd"),
          sum(col("dq") * col("dq")).as("sdd"),
          sum(when(col("dq") < 0, col("dq") * col("dq")).otherwise(0L)).as("sdd_down"),
          sum(when(col("dq") < 0, 1L).otherwise(0L)).as("n_down"))
        .withColumn("mean_chg", col("sd").cast("double") / col("n").cast("double"))
        .withColumn("sd_all",
          sqrt((col("n") * col("sdd") - col("sd") * col("sd")).cast("double")) /
            col("n").cast("double"))
        .withColumn("sd_down",
          sqrt(col("sdd_down").cast("double") / col("n").cast("double")))
        .withColumn("sharpe",
          col("mean_chg") / nullif(col("sd_all"), lit(0.0)))
        .withColumn("sortino",
          col("mean_chg") / nullif(col("sd_down"), lit(0.0)))
        .select("symbol", "n", "n_down", "sharpe", "sortino")
        .orderBy("symbol")
    }),


    // TWO-FEATURE OLS via the closed-form NORMAL EQUATIONS — per symbol,
    // regress the daily close on (trading-day index, thousand-share
    // volume): the multi-feature extension of yf_trend_ols's single
    // regressor. The 3×3 system solves by CRAMER'S RULE over the exact
    // integer moment matrix; determinant products overflow BIGINT at
    // 100× the fixture, so the det algebra runs in DECIMAL(38,0) ⇔
    // DuckDB HUGEINT (≤ ~1e28 here against 38-digit headroom) and only
    // the closing divisions are IEEE. Everything is ONE keyed aggregate
    // — no matrix library, no gradient loop, no driver: the normal-
    // equation moments are just ten sums, which is why closed-form OLS
    // belongs in a distributed engine while iterative fits need epochs.
    "yf_ols_multi" -> ((s, dir) => {
      val d38 = DecimalType(38, 0)
      val daily = Sources.ohlcv(s, dir)
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Close") * 1e6 + 0.5).cast("long")).as("close_sum"),
          sum(floor(col("Volume")).cast("long")).as("vol_sum"),
          count(lit(1)).as("n_bars"))
        .select(col("symbol"),
          datediff(col("Date"), lit("1992-01-01")).cast("long").as("x1"),
          expr("(vol_sum div n_bars) div 1000").as("x2"),
          expr("close_sum div n_bars").as("y"))
      val m = daily.groupBy("symbol").agg(
        count(lit(1)).as("n"),
        sum("x1").as("s1"), sum("x2").as("s2"), sum("y").as("sy"),
        sum(col("x1") * col("x1")).as("s11"),
        sum(col("x2") * col("x2")).as("s22"),
        sum(col("x1") * col("x2")).as("s12"),
        sum(col("x1") * col("y")).as("s1y"),
        sum(col("x2") * col("y")).as("s2y"),
        sum(col("y") * col("y")).as("syy"))
      def D(c: Column) = c.cast(d38)
      def det3(a: Column, b: Column, c: Column, d: Column, e: Column,
          f: Column, g: Column, h: Column, i: Column): Column =
        D(a) * (D(e) * D(i) - D(f) * D(h)) -
          D(b) * (D(d) * D(i) - D(f) * D(g)) +
          D(c) * (D(d) * D(h) - D(e) * D(g))
      m
        .withColumn("det", det3(col("n"), col("s1"), col("s2"),
          col("s1"), col("s11"), col("s12"),
          col("s2"), col("s12"), col("s22")))
        .withColumn("det0", det3(col("sy"), col("s1"), col("s2"),
          col("s1y"), col("s11"), col("s12"),
          col("s2y"), col("s12"), col("s22")))
        .withColumn("det1", det3(col("n"), col("sy"), col("s2"),
          col("s1"), col("s1y"), col("s12"),
          col("s2"), col("s2y"), col("s22")))
        .withColumn("det2", det3(col("n"), col("s1"), col("sy"),
          col("s1"), col("s11"), col("s1y"),
          col("s2"), col("s12"), col("s2y")))
        .withColumn("b0q",
          col("det0").cast("double") / nullif(col("det").cast("double"), lit(0.0)))
        .withColumn("b1q",
          col("det1").cast("double") / nullif(col("det").cast("double"), lit(0.0)))
        .withColumn("b2q",
          col("det2").cast("double") / nullif(col("det").cast("double"), lit(0.0)))
        .withColumn("sse",
          col("syy").cast("double") -
            (col("b0q") * col("sy").cast("double") +
              col("b1q") * col("s1y").cast("double") +
              col("b2q") * col("s2y").cast("double")))
        .withColumn("sst",
          col("syy").cast("double") -
            col("sy").cast("double") * col("sy").cast("double") /
              col("n").cast("double"))
        .select(col("symbol"), col("n"),
          (col("b0q") / 1e6).as("intercept"),
          (col("b1q") / 1e6).as("beta_day"),
          (col("b2q") / 1e6).as("beta_vol"),
          (lit(1.0) - col("sse") / nullif(col("sst"), lit(0.0))).as("r2"))
        .orderBy("symbol")
    }),


    // UPPER-TAIL DEPENDENCE for symbol pairs — the risk question linear
    // correlation can't answer: do two series CRASH (here: spike)
    // TOGETHER? λ̂ = |days both in their own top-20% daily-move rank| /
    // min(k_a, k_b), fully RANK-BASED (row_number on exact 1e-8-quantized
    // close diffs, date tiebreak), so the statistic is integer counts +
    // one division — no distributional assumption, no FP in the
    // selection. Scale shape: only the top-k day sets enter the co-keyed
    // Date self-join (≈ 20% of days per symbol, bounded by the
    // calendar); top-20 pairs via TakeOrderedAndProject.
    "yf_tail_dependence" -> ((s, dir) => {
      val wSym = org.apache.spark.sql.expressions.Window
        .partitionBy("symbol").orderBy("Date")
      val daily = Sources.ohlcv(s, dir)
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Close") * 1e8 + 0.5).cast("long")).as("cs"),
          count(lit(1)).as("nb"))
        .select(col("symbol"), col("Date"), expr("cs div nb").as("c"))
        .withColumn("ret", col("c") - lag(col("c"), 1).over(wSym))
        .filter(col("ret").isNotNull)
      val ranked = daily
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("symbol").orderBy(col("ret"), col("Date"))))
        .withColumn("n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("symbol")))
        .withColumn("k", expr("n div 5"))
        .filter(col("rk") > col("n") - col("k"))
        .select(col("symbol"), col("Date"), col("k"))
      val joint = ranked.as("a").join(ranked.as("b"),
          col("a.Date") === col("b.Date") && col("a.symbol") < col("b.symbol"))
        .groupBy(col("a.symbol").as("sym_a"), col("b.symbol").as("sym_b"))
        .agg(count(lit(1)).as("joint"),
          max(col("a.k")).as("ka"), max(col("b.k")).as("kb"))
      joint
        .select(col("sym_a"), col("sym_b"), col("joint"),
          least(col("ka"), col("kb")).as("k_min"),
          (col("joint").cast("double") /
            least(col("ka"), col("kb")).cast("double")).as("lambda_u"))
        .orderBy(col("lambda_u").desc, col("sym_a"), col("sym_b"))
        .limit(20)
    }),


    // MINIMUM-VARIANCE two-asset PORTFOLIO (Markowitz closed form) for
    // symbols 1 and 2 over their SHARED trading days: w* = (σ₂²−σ₁₂) /
    // (σ₁²+σ₂²−2σ₁₂) from exact-BIGINT centered moments of
    // 1e-8-quantized daily moves (n·Σxy − ΣxΣy — day counts are
    // calendar-bounded, so these fit BIGINT at ANY corpus scale), then
    // the portfolio variance identity w²σ₁²+(1−w)²σ₂²+2w(1−w)σ₁₂ as one
    // fixed IEEE tree. The optimization is CLOSED-FORM for the same
    // reason OLS is — which is why it belongs in a distributed engine.
    "yf_markowitz_minvar" -> ((s, dir) => {
      val wSym = org.apache.spark.sql.expressions.Window
        .partitionBy("symbol").orderBy("Date")
      val daily = Sources.ohlcv(s, dir)
        .filter(col("symbol").isin(1, 2))
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Close") * 1e8 + 0.5).cast("long")).as("cs"),
          count(lit(1)).as("nb"))
        .select(col("symbol"), col("Date"), expr("cs div nb").as("c"))
        .withColumn("ret", col("c") - lag(col("c"), 1).over(wSym))
        .filter(col("ret").isNotNull)
      val m = daily.filter(col("symbol") === 1)
        .select(col("Date"), col("ret").as("ra"))
        .join(daily.filter(col("symbol") === 2)
          .select(col("Date"), col("ret").as("rb")), "Date")
        .agg(count(lit(1)).as("n"),
          sum(col("ra")).as("sa"), sum(col("rb")).as("sb"),
          sum(col("ra") * col("ra")).as("saa"),
          sum(col("rb") * col("rb")).as("sbb"),
          sum(col("ra") * col("rb")).as("sab"))
      m
        .withColumn("va", (col("n") * col("saa") - col("sa") * col("sa"))
          .cast("double"))
        .withColumn("vb", (col("n") * col("sbb") - col("sb") * col("sb"))
          .cast("double"))
        .withColumn("cab", (col("n") * col("sab") - col("sa") * col("sb"))
          .cast("double"))
        .withColumn("w",
          (col("vb") - col("cab")) /
            (col("va") + col("vb") - lit(2.0) * col("cab")))
        .select(col("n").as("n_days"), col("w").as("w_sym1"),
          (lit(1.0) - col("w")).as("w_sym2"),
          ((col("w") * col("w") * col("va") +
            (lit(1.0) - col("w")) * (lit(1.0) - col("w")) * col("vb") +
            lit(2.0) * col("w") * (lit(1.0) - col("w")) * col("cab")) /
            lit(1e16)).as("port_var_q"))
    }),


    // MANN–KENDALL trend test — the NONPARAMETRIC member of the trend
    // family (yf_trend_ols is the parametric twin): S = Σ_{i<j}
    // sign(y_j − y_i) over each symbol's first 60 trading days of 1995,
    // tau-a = 2S/(n(n−1)). Rank-based ⇒ PURE INTEGERS end-to-end (the
    // sign comparisons never leave BIGINT; the only IEEE op is the final
    // tau division) — immune to the summation-order hazards a parametric
    // slope carries. The pairwise self-join is CO-KEYED on symbol and the
    // 60-day rank cut bounds it at C(60,2)=1770 pairs per symbol however
    // long the history — the same bounded-window discipline as
    // yf_pairs_correlation's tier blocking.
    "yf_mann_kendall" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Close") * 1e6 + 0.5).cast("long")).as("cs"),
          count(lit(1)).as("nb"))
        .withColumn("y", expr("cs div nb"))
        .withColumn("x", datediff(col("Date"), lit("1995-01-01")).cast("long"))
      val d60 = daily
        .withColumn("rn",
          row_number().over(Window.partitionBy("symbol").orderBy("Date")))
        .filter(col("rn") <= 60)
        .select("symbol", "x", "y")
      val pairs = d60.as("a").join(d60.as("b"),
          col("a.symbol") === col("b.symbol") && col("a.x") < col("b.x"))
        .select(col("a.symbol").as("symbol"),
          when(col("b.y") > col("a.y"), 1L)
            .when(col("b.y") < col("a.y"), -1L).otherwise(0L).as("sgn"))
      val nn = d60.groupBy("symbol").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2)
      pairs.groupBy("symbol").agg(sum(col("sgn")).as("s_stat"))
        .join(nn, "symbol")
        .withColumn("tau",
          (col("s_stat") * 2L).cast("double") /
            (col("n") * (col("n") - 1L)).cast("double"))
        .select("symbol", "n", "s_stat", "tau")
        .orderBy("symbol")
    }),


    // THEIL–SEN robust slope — the rank family's regression member
    // (yf_trend_ols = parametric, yf_mann_kendall = trend direction, this
    // = trend MAGNITUDE robust to outliers): median of all pairwise
    // slopes over each symbol's first 25 trading days (C(25,2)=300 pairs
    // per symbol — the bounded-window cap). Each slope quantizes exactly:
    // sign-split truncating division (|Δy|·1e6 DIV Δx, sign reapplied —
    // Spark div truncates, DuckDB // floors; magnitudes divide so both
    // truncate identically) and the median adjudicates on the DOUBLED
    // order statistic (odd → 2·mid, even → mid₁+mid₂ — always integral,
    // the Mann–Whitney midrank discipline). Only the final unit
    // conversion is IEEE.
    "yf_theilsen" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Close") * 1e6 + 0.5).cast("long")).as("cs"),
          count(lit(1)).as("nb"))
        .withColumn("y", expr("cs div nb"))
        .withColumn("x", datediff(col("Date"), lit("1995-01-01")).cast("long"))
      val d25 = daily
        .withColumn("rn",
          row_number().over(Window.partitionBy("symbol").orderBy("Date")))
        .filter(col("rn") <= 25)
        .select("symbol", "x", "y")
      val slopes = d25.as("a").join(d25.as("b"),
          col("a.symbol") === col("b.symbol") && col("a.x") < col("b.x"))
        .select(col("a.symbol").as("symbol"),
          (when(col("b.y") >= col("a.y"), 1L).otherwise(-1L) *
            expr("(abs(b.y - a.y) * 1000000) div (b.x - a.x)")).as("sq"))
      val nn = slopes.groupBy("symbol").agg(count(lit(1)).as("n_pairs"))
      val ranked = slopes
        .withColumn("rn",
          row_number().over(Window.partitionBy("symbol").orderBy("sq")))
      // The k-th order statistic is deterministic under ties (equal
      // values permute among equal values), so row_number's tie order
      // never changes the selected VALUE.
      ranked.join(nn, "symbol")
        .groupBy("symbol")
        .agg(max(col("n_pairs")).as("n_pairs"),
          (sum(when(col("rn") === expr("(n_pairs + 1) div 2"), col("sq"))
            .otherwise(0L)) +
           sum(when(col("rn") === expr("(n_pairs + 2) div 2"), col("sq"))
            .otherwise(0L))).as("slope_med2_q12"))
        .withColumn("slope",
          col("slope_med2_q12").cast("double") / 2e12)
        .select("symbol", "n_pairs", "slope_med2_q12", "slope")
        .orderBy("symbol")
    }),


    // SKEWNESS + EXCESS KURTOSIS of daily close changes per symbol — the
    // higher-moment completion of the moment family (mean/variance =
    // trend/bollinger, correlation = corr_matrix; tail asymmetry and
    // fatness are what a risk desk reads next). The central-moment sums
    // expand to pure integer algebra on the raw power sums: A = nΣx²−S²,
    // B = n²Σx³−3nSΣx²+2S³, C = n³Σx⁴−4n²SΣx³+6nS²Σx²−3S⁴, with
    // g1 = B/A^1.5 and g2 = C/A²−3 — closes are 1e-4-quantized and the
    // powers AND their cross-row sums ride in DECIMAL(38,0) ⇔ HUGEINT
    // end-to-end (a BIGINT x⁴ accumulation would wrap on realistic
    // moves). One keyed aggregate after a
    // per-symbol lag window; the only FP steps are one sqrt and two
    // divisions per symbol.
    "yf_kurtosis_skew" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d38 = DecimalType(38, 0)
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Close") * 1e4 + 0.5).cast("long")).as("cs"),
          count(lit(1)).as("nb"))
        .withColumn("xq", expr("cs div nb"))
      val wo = Window.partitionBy("symbol").orderBy("Date")
      val d = daily.withColumn("x", col("xq") - lag(col("xq"), 1).over(wo))
        .filter(col("x").isNotNull)
      // Widen x to DECIMAL(38,0) BEFORE the power products so the per-row
      // x³/x⁴ and the cross-row sums are exact decimal — a LongType
      // accumulation wraps silently (non-ANSI) for ~1.5-unit daily moves
      // (15000⁴·250 rows ≈ 1.3e19 > Int64) while the DuckDB oracle sums
      // into HUGEINT exactly.
      val m = d.select(col("symbol"), col("x").cast(d38).as("xd"))
        .groupBy("symbol").agg(
          count(lit(1)).as("n"),
          sum(col("xd")).as("s1"),
          sum(col("xd") * col("xd")).as("s2"),
          sum(col("xd") * col("xd") * col("xd")).as("s3"),
          sum(col("xd") * col("xd") * col("xd") * col("xd")).as("s4"))
        .filter(col("n") >= 3)
      val n = col("n").cast(d38)
      val (s1, s2, s3, s4) = (col("s1").cast(d38), col("s2").cast(d38),
        col("s3").cast(d38), col("s4").cast(d38))
      m.withColumn("a", (n * s2 - s1 * s1).cast("double"))
        .withColumn("b", (n * n * s3 - lit(3).cast(d38) * n * s1 * s2 +
          lit(2).cast(d38) * s1 * s1 * s1).cast("double"))
        .withColumn("c", (n * n * n * s4 -
          lit(4).cast(d38) * n * n * s1 * s3 +
          lit(6).cast(d38) * n * s1 * s1 * s2 -
          lit(3).cast(d38) * s1 * s1 * s1 * s1).cast("double"))
        .withColumn("skew",
          col("b") / nullif(col("a") * sqrt(col("a")), lit(0.0)))
        .withColumn("kurtosis_excess",
          col("c") / nullif(col("a") * col("a"), lit(0.0)) - lit(3.0))
        .select("symbol", "n", "skew", "kurtosis_excess")
        .orderBy("symbol")
    }),


    // TYPED Dataset aggregation (graft.typed.TypedOps): the compile-
    // time-checked API tier — case-class rows through
    // KeyValueGroupedDataset.agg with a typed Aggregator whose state is
    // exact integer sums, so the typed and untyped faces of the engine
    // provably agree (same oracle an untyped twin would hash against).
    // The close is 1e-4-quantized BEFORE entering the aggregate; the
    // only IEEE op is the final average division.
    "yf_typed_agg" -> ((s, dir) => {
      import s.implicits._
      val ds = Sources.ohlcv(s, dir)
        .select(col("symbol"),
          floor(col("Close") * 1e4 + 0.5).cast("long").as("closeQ4"))
        .as[typed.TypedOps.BarQ]
      ds.groupByKey(_.symbol)
        .agg(typed.TypedOps.ExactCloseStats.toColumn.name("st"))
        .toDF("symbol", "st")
        .select(col("symbol"), col("st.n").as("n_bars"),
          col("st.sumQ4").as("sum_close_q4"),
          (col("st.sumQ4").cast("double") / col("st.n").cast("double") / 1e4)
            .as("avg_close"))
        .orderBy("symbol")
    }),


    // DONCHIAN CHANNEL — the trailing-extremum indicator member (the
    // min/max window frame beside bollinger's variance frame and sma's
    // mean frame): 20-day rolling high/low of the daily close per
    // symbol, channel position = (c−lo)/(hi−lo). All channel math is
    // exact integers on the 1e-4-quantized daily close (rolling min/max
    // of integers — no FP at all until the final position division);
    // rows before a full 20-day window emit NULL channels, exactly like
    // the SMA warm-up convention. Per-symbol ROWS frames only.
    "yf_donchian" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Close") * 1e4 + 0.5).cast("long")).as("cs"),
          count(lit(1)).as("nb"))
        .withColumn("cq", expr("cs div nb"))
      val w20 = Window.partitionBy("symbol").orderBy("Date")
        .rowsBetween(-19, Window.currentRow)
      val wn = Window.partitionBy("symbol").orderBy("Date")
      daily
        .withColumn("rn", row_number().over(wn))
        .withColumn("ch_hi_q4",
          when(col("rn") >= 20, max(col("cq")).over(w20)))
        .withColumn("ch_lo_q4",
          when(col("rn") >= 20, min(col("cq")).over(w20)))
        .withColumn("pos", (col("cq") - col("ch_lo_q4")).cast("double") /
          nullif((col("ch_hi_q4") - col("ch_lo_q4")).cast("double"), lit(0.0)))
        .select(col("symbol"), col("Date").cast("date").cast("string").as("d"),
          col("cq"), col("ch_hi_q4"), col("ch_lo_q4"), col("pos"))
        .orderBy("symbol", "d")
    }),


    // GOLDEN/DEATH CROSS detection — the crossover-event member of the
    // indicator family (sma gives the level, this the state CHANGE):
    // SMA(5) vs SMA(20) adjudicated as the PURE-INTEGER comparison
    // 4·sum5 > sum20 (scale both sides by 20 — no division before the
    // comparison), crossings = days where the state flips vs lag. Emits
    // only the crossing days; per-symbol ROWS frames throughout.
    "yf_golden_cross" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Close") * 1e4 + 0.5).cast("long")).as("cs"),
          count(lit(1)).as("nb"))
        .withColumn("cq", expr("cs div nb"))
      val wo = Window.partitionBy("symbol").orderBy("Date")
      val st = daily
        .withColumn("rn", row_number().over(wo))
        .withColumn("sum5", sum(col("cq")).over(wo.rowsBetween(-4, 0)))
        .withColumn("sum20", sum(col("cq")).over(wo.rowsBetween(-19, 0)))
        .withColumn("fast_above",
          when(col("rn") >= 20, (col("sum5") * 4L > col("sum20")).cast("int")))
        .withColumn("prev_above", lag(col("fast_above"), 1).over(wo))
      st.filter(col("fast_above").isNotNull && col("prev_above").isNotNull &&
          col("fast_above") =!= col("prev_above"))
        .select(col("symbol"), col("Date").cast("date").cast("string").as("d"),
          when(col("fast_above") === 1, "golden").otherwise("death")
            .as("direction"))
        .orderBy("symbol", "d")
    }),


    // JARQUE–BERA normality test — closes the classical-test family's
    // normality gap (z, χ², KS, U, F, t so far): JB = n·(g1²/6 + g2²/24)
    // from the SAME pure-integer central-moment expansions as
    // yf_kurtosis_skew (A/B/C in DECIMAL(38,0) ⇔ HUGEINT, VARCHAR
    // crossing), verdict against the build-time χ²₂ 95% critical value
    // 5.991. Per-symbol daily q4 changes; one keyed aggregate.
    "yf_jarque_bera" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d38 = DecimalType(38, 0)
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Close") * 1e4 + 0.5).cast("long")).as("cs"),
          count(lit(1)).as("nb"))
        .withColumn("xq", expr("cs div nb"))
      val wo = Window.partitionBy("symbol").orderBy("Date")
      val d = daily.withColumn("x", col("xq") - lag(col("xq"), 1).over(wo))
        .filter(col("x").isNotNull)
      // Decimal-wide accumulation — same rationale as yf_kurtosis_skew:
      // the x³/x⁴ powers and their sums must ride in DECIMAL(38,0), not
      // LongType, to match the oracle's exact HUGEINT sums on realistic
      // price moves.
      val m = d.select(col("symbol"), col("x").cast(d38).as("xd"))
        .groupBy("symbol").agg(
          count(lit(1)).as("n"),
          sum(col("xd")).as("s1"), sum(col("xd") * col("xd")).as("s2"),
          sum(col("xd") * col("xd") * col("xd")).as("s3"),
          sum(col("xd") * col("xd") * col("xd") * col("xd")).as("s4"))
        .filter(col("n") >= 3)
      val n = col("n").cast(d38)
      val (s1, s2, s3, s4) = (col("s1").cast(d38), col("s2").cast(d38),
        col("s3").cast(d38), col("s4").cast(d38))
      m.withColumn("a", (n * s2 - s1 * s1).cast("double"))
        .withColumn("b", (n * n * s3 - lit(3).cast(d38) * n * s1 * s2 +
          lit(2).cast(d38) * s1 * s1 * s1).cast("double"))
        .withColumn("c", (n * n * n * s4 -
          lit(4).cast(d38) * n * n * s1 * s3 +
          lit(6).cast(d38) * n * s1 * s1 * s2 -
          lit(3).cast(d38) * s1 * s1 * s1 * s1).cast("double"))
        .withColumn("g1", col("b") / nullif(col("a") * sqrt(col("a")), lit(0.0)))
        .withColumn("g2",
          col("c") / nullif(col("a") * col("a"), lit(0.0)) - lit(3.0))
        .withColumn("jb", col("n").cast("double") *
          (col("g1") * col("g1") / lit(6.0) +
            col("g2") * col("g2") / lit(24.0)))
        .withColumn("reject_normal", (col("jb") > lit(5.991)).cast("int"))
        .select("symbol", "n", "jb", "reject_normal")
        .orderBy("symbol")
    }),


    // AVERAGE TRUE RANGE — the volatility indicator that sees gaps
    // (bollinger's σ only sees closes): TR = max(H−L, |H−C₋₁|, |L−C₋₁|)
    // per day in PURE q4 integers (greatest/abs of exact longs), ATR =
    // the trailing-14 exact sum DIV 14 (truncating division, identical
    // both engines; null until a full window). Daily OHLC consolidation
    // + per-symbol lag + one trailing-sum frame.
    "yf_atr" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .groupBy("symbol", "Date")
        .agg(max(floor(col("High") * 1e4 + 0.5).cast("long")).as("hq"),
          min(floor(col("Low") * 1e4 + 0.5).cast("long")).as("lq"),
          sum(floor(col("Close") * 1e4 + 0.5).cast("long")).as("cs"),
          count(lit(1)).as("nb"))
        .withColumn("cq", expr("cs div nb"))
      val wo = Window.partitionBy("symbol").orderBy("Date")
      val tr = daily
        .withColumn("cprev", lag(col("cq"), 1).over(wo))
        .withColumn("tr",
          when(col("cprev").isNull, col("hq") - col("lq"))
            .otherwise(greatest(col("hq") - col("lq"),
              abs(col("hq") - col("cprev")), abs(col("lq") - col("cprev")))))
        .withColumn("rn", row_number().over(wo))
        .withColumn("tr14", sum(col("tr")).over(wo.rowsBetween(-13, 0)))
        .withColumn("atr_q4",
          when(col("rn") >= 14, expr("tr14 div 14")))
      tr.select(col("symbol"), col("Date").cast("date").cast("string").as("d"),
          col("tr"), col("atr_q4"),
          (col("atr_q4").cast("double") / 1e4).as("atr"))
        .orderBy("symbol", "d")
    }),


    // ULCER INDEX — drawdown-depth risk (sharpe's σ penalizes upside;
    // the ulcer index penalizes only being underwater): per-row
    // drawdown in INTEGER basis points ((peak−c)·1e4 DIV peak —
    // truncating division, positive operands), squared and exact-sum'd;
    // UI = sqrt(Σdd²/n)/100. Per-symbol running-max window + one keyed
    // aggregate; the only FP is the closing sqrt + divisions.
    "yf_ulcer_index" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Close") * 1e4 + 0.5).cast("long")).as("cs"),
          count(lit(1)).as("nb"))
        .withColumn("cq", expr("cs div nb"))
        .filter(col("cq") > 0)
      val wo = Window.partitionBy("symbol").orderBy("Date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("peak", max(col("cq")).over(wo))
        .withColumn("dd_bp", expr("((peak - cq) * 10000) div peak"))
        .groupBy("symbol")
        .agg(count(lit(1)).as("n"), max(col("dd_bp")).as("max_dd_bp"),
          sum(col("dd_bp") * col("dd_bp")).as("sdd2"))
        .withColumn("ulcer",
          sqrt(col("sdd2").cast("double") / col("n").cast("double")) / 100.0)
        .select("symbol", "n", "max_dd_bp", "ulcer")
        .orderBy("symbol")
    }),


    // OVERNIGHT GAP DETECTION — the discontinuity event the close-only
    // indicators can't see: |day open − previous close| ≥ 5% of the
    // previous close, adjudicated ENTIRELY in integers (gap_bp =
    // |Δ|·1e4 DIV cprev on q4 quanta — no ratio before the cut). Emits
    // only the gap days with direction; per-symbol lag window.
    "yf_gap_days" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Open") * 1e4 + 0.5).cast("long")).as("os"),
          sum(floor(col("Close") * 1e4 + 0.5).cast("long")).as("cs"),
          count(lit(1)).as("nb"))
        .withColumn("oq", expr("os div nb"))
        .withColumn("cq", expr("cs div nb"))
      val wo = Window.partitionBy("symbol").orderBy("Date")
      daily
        .withColumn("cprev", lag(col("cq"), 1).over(wo))
        .filter(col("cprev").isNotNull && col("cprev") > 0)
        .withColumn("gap_bp",
          expr("(abs(oq - cprev) * 10000) div cprev"))
        .filter(col("gap_bp") >= 500)
        .select(col("symbol"), col("Date").cast("date").cast("string").as("d"),
          col("oq"), col("cprev"), col("gap_bp"),
          when(col("oq") > col("cprev"), "up").otherwise("down").as("direction"))
        .orderBy("symbol", "d")
    }),


    // CALMAR RATIO — return per unit of worst drawdown (the risk lens
    // completing sharpe/sortino/ulcer: σ, downside-σ, drawdown depth,
    // and now drawdown-NORMALIZED return): period return and max
    // drawdown both in INTEGER basis points (sign-split truncating
    // division for the possibly-negative return — magnitudes divide,
    // signs reapply), endpoints via min_by/max_by on the tie-free
    // per-symbol date order (the yf_weekly_ohlc argmin discipline).
    // One keyed aggregate after the running-peak window.
    "yf_calmar" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Close") * 1e4 + 0.5).cast("long")).as("cs"),
          count(lit(1)).as("nb"))
        .withColumn("cq", expr("cs div nb"))
        .filter(col("cq") > 0)
      val wo = Window.partitionBy("symbol").orderBy("Date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("peak", max(col("cq")).over(wo))
        .withColumn("dd_bp", expr("((peak - cq) * 10000) div peak"))
        .groupBy("symbol")
        .agg(count(lit(1)).as("n"),
          min_by(col("cq"), col("Date")).as("first_cq"),
          max_by(col("cq"), col("Date")).as("last_cq"),
          max(col("dd_bp")).as("max_dd_bp"))
        .withColumn("ret_bp",
          expr("CASE WHEN last_cq >= first_cq " +
            "THEN ((last_cq - first_cq) * 10000) div first_cq " +
            "ELSE -(((first_cq - last_cq) * 10000) div first_cq) END"))
        .withColumn("calmar", col("ret_bp").cast("double") /
          nullif(col("max_dd_bp").cast("double"), lit(0.0)))
        .select("symbol", "n", "ret_bp", "max_dd_bp", "calmar")
        .orderBy("symbol")
    }),
  )

  def oracles: Map[String, String] = Map(
    "yf_ewma" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol, "Date",
         |    CAST(sum(CAST(floor("Close" * 1e8 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS xq
         |  FROM bars
         |  WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY 1, 2),
         |wins AS (
         |  SELECT symbol, "Date",
         |    list(xq) OVER (PARTITION BY symbol ORDER BY "Date"
         |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS arr
         |  FROM daily)
         |SELECT symbol, "Date",
         |  CAST(list_reduce(list_reverse(arr), (acc, x) -> acc * 2 + x) AS DOUBLE)
         |    / ((CAST(1 AS BIGINT) << len(arr)) - 1) / 1e8 AS ewma
         |FROM wins ORDER BY symbol, "Date"""".stripMargin,

    "yf_acf" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol, "Date" AS d,
         |    CAST(sum(CAST(floor("Close" * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS xq
         |  FROM bars WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY 1, 2),
         |lagged AS (
         |  SELECT symbol, xq,
         |    lag(xq, 1) OVER w AS l1, lag(xq, 2) OVER w AS l2,
         |    lag(xq, 3) OVER w AS l3
         |  FROM daily WINDOW w AS (PARTITION BY symbol ORDER BY d)),
         |pairs AS (
         |  SELECT symbol, 1 AS lag, xq AS x, l1 AS y FROM lagged WHERE l1 IS NOT NULL
         |  UNION ALL
         |  SELECT symbol, 2, xq, l2 FROM lagged WHERE l2 IS NOT NULL
         |  UNION ALL
         |  SELECT symbol, 3, xq, l3 FROM lagged WHERE l3 IS NOT NULL),
         |m AS (
         |  SELECT symbol, lag, count(*) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(y * y) AS BIGINT) AS syy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy
         |  FROM pairs GROUP BY 1, 2)
         |SELECT symbol, CAST(lag AS INTEGER) AS lag, n,
         |  CAST(n * sxy - sx * sy AS DOUBLE) /
         |    sqrt(nullif(CAST(n * sxx - sx * sx AS DOUBLE)
         |                * CAST(n * syy - sy * sy AS DOUBLE), 0.0)) AS acf
         |FROM m ORDER BY symbol, lag""".stripMargin,

    "yf_beta" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol, "Date" AS d,
         |    CAST(sum(CAST(floor("Close" * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS xq
         |  FROM bars WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY 1, 2),
         |rets AS (
         |  SELECT symbol, d,
         |    CAST(floor((CAST(xq AS DOUBLE) / prev - 1.0) * 1e4 + 0.5) AS BIGINT)
         |      AS rq
         |  FROM (SELECT symbol, d, xq,
         |          lag(xq, 1) OVER (PARTITION BY symbol ORDER BY d) AS prev
         |        FROM daily)
         |  WHERE prev IS NOT NULL AND prev <> 0),
         |mkt AS (SELECT d, CAST(sum(rq) AS BIGINT) // count(*) AS mq
         |        FROM rets GROUP BY 1),
         |m AS (
         |  SELECT symbol, count(*) AS n,
         |    CAST(sum(rq) AS BIGINT) AS sx, CAST(sum(mq) AS BIGINT) AS sm,
         |    CAST(sum(rq * mq) AS BIGINT) AS sxm,
         |    CAST(sum(mq * mq) AS BIGINT) AS smm
         |  FROM rets JOIN mkt USING (d) GROUP BY 1)
         |SELECT symbol, n,
         |  CAST(n * sxm - sx * sm AS DOUBLE) /
         |    nullif(CAST(n * smm - sm * sm AS DOUBLE), 0.0) AS beta
         |FROM m ORDER BY symbol""".stripMargin,

    "yf_macd" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol, "Date",
         |    CAST(sum(CAST(floor("Close" * 1e8 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS xq
         |  FROM bars
         |  WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY 1, 2),
         |wins AS (
         |  SELECT symbol, "Date",
         |    list(xq) OVER (PARTITION BY symbol ORDER BY "Date"
         |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS arr_f,
         |    list(xq) OVER (PARTITION BY symbol ORDER BY "Date"
         |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS arr_s
         |  FROM daily),
         |m AS (
         |  SELECT symbol, "Date",
         |    CAST(list_reduce(list_reverse(arr_f), (acc, x) -> acc * 2 + x)
         |        AS DOUBLE)
         |      / ((CAST(1 AS BIGINT) << len(arr_f)) - 1) / 1e8
         |    - CAST(list_reduce(list_reverse(arr_s), (acc, x) -> acc * 2 + x)
         |        AS DOUBLE)
         |      / ((CAST(1 AS BIGINT) << len(arr_s)) - 1) / 1e8 AS macd
         |  FROM wins),
         |q AS (
         |  SELECT symbol, "Date", macd,
         |    CAST(floor(macd * 1e8 + 0.5) AS BIGINT) AS macd_q
         |  FROM m),
         |sig AS (
         |  SELECT symbol, "Date", macd, macd_q,
         |    CAST(sum(macd_q) OVER w AS BIGINT) AS sig_num,
         |    count(*) OVER w AS sig_cnt
         |  FROM q
         |  WINDOW w AS (PARTITION BY symbol ORDER BY "Date"
         |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
         |SELECT symbol, "Date",
         |  printf('%.4e', macd) AS macd_sig,
         |  macd_q, sig_num, sig_cnt,
         |  CAST(macd_q * sig_cnt - sig_num AS BIGINT) AS hist_q
         |FROM sig ORDER BY symbol, "Date"""".stripMargin,

    "yf_obv" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol, "Date",
         |    CAST(sum(CAST(floor("Close" * 1e8 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS xq,
         |    CAST(sum(CAST("Volume" AS BIGINT)) AS BIGINT) AS vol
         |  FROM bars
         |  WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY 1, 2),
         |d2 AS (
         |  SELECT symbol, "Date", vol, xq,
         |    lag(xq) OVER (PARTITION BY symbol ORDER BY "Date") AS prev
         |  FROM daily)
         |SELECT symbol, "Date",
         |  CAST(sum(CASE WHEN prev IS NULL THEN 0
         |                WHEN xq > prev THEN vol
         |                WHEN xq < prev THEN -vol ELSE 0 END)
         |    OVER (PARTITION BY symbol ORDER BY "Date"
         |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS obv
         |FROM d2 ORDER BY symbol, "Date"""".stripMargin,

    "yf_trend_ols" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol,
         |    CAST(sum(CAST(floor("Close" * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS y,
         |    date_diff('day', DATE '1995-01-01', CAST("Date" AS DATE)) AS x
         |  FROM bars WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY symbol, "Date"),
         |m AS (
         |  SELECT symbol, count(*) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(y * y) AS BIGINT) AS syy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy
         |  FROM daily GROUP BY 1)
         |SELECT symbol, n,
         |  CAST(n * sxy - sx * sy AS DOUBLE)
         |    / nullif(CAST(n * sxx - sx * sx AS DOUBLE), 0.0) AS slope,
         |  (CAST(sy AS DOUBLE)
         |   - (CAST(n * sxy - sx * sy AS DOUBLE)
         |      / nullif(CAST(n * sxx - sx * sx AS DOUBLE), 0.0))
         |     * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
         |  (CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE))
         |    / nullif(CAST(n * sxx - sx * sx AS DOUBLE)
         |             * CAST(n * syy - sy * sy AS DOUBLE), 0.0) AS r2
         |FROM m ORDER BY symbol""".stripMargin,

    "yf_var_cvar" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol, "Date",
         |    CAST(sum(CAST(floor("Close" * 1e8 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS xq
         |  FROM bars WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY 1, 2),
         |d AS (
         |  SELECT symbol, "Date",
         |    xq - lag(xq) OVER (PARTITION BY symbol ORDER BY "Date") AS dq
         |  FROM daily),
         |r AS (
         |  SELECT symbol, dq,
         |    row_number() OVER (PARTITION BY symbol ORDER BY dq, "Date") AS rn,
         |    count(*) OVER (PARTITION BY symbol) AS n
         |  FROM d WHERE dq IS NOT NULL)
         |SELECT symbol, n AS n_days, (n + 19) // 20 AS k,
         |  max(dq) / 1e8 AS "var",
         |  CAST(CAST(sum(dq) AS BIGINT) AS DOUBLE)
         |    / CAST((n + 19) // 20 AS DOUBLE) / 1e8 AS cvar
         |FROM r WHERE rn <= (n + 19) // 20
         |GROUP BY symbol, n ORDER BY symbol""".stripMargin,

    "yf_seasonality" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol, "Date",
         |    CAST(sum(CAST(floor("Close" * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS xq,
         |    date_diff('day', DATE '1995-01-01', CAST("Date" AS DATE)) % 7 AS dow
         |  FROM bars WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY symbol, "Date"),
         |cells AS (
         |  SELECT symbol, dow, count(*) AS n_days,
         |    CAST(sum(xq) AS BIGINT) AS sum_q
         |  FROM daily GROUP BY 1, 2),
         |tot AS (
         |  SELECT symbol, CAST(sum(n_days) AS BIGINT) AS n_total,
         |    CAST(sum(sum_q) AS BIGINT) AS sum_total
         |  FROM cells GROUP BY 1)
         |SELECT symbol, dow, n_days,
         |  CAST(sum_q AS DOUBLE) / CAST(n_days AS DOUBLE) / 1e6 AS dow_mean,
         |  CAST(sum_total AS DOUBLE) / CAST(n_total AS DOUBLE) / 1e6
         |    AS overall_mean,
         |  dow_mean / overall_mean AS seasonal_ratio
         |FROM cells JOIN tot USING (symbol)
         |ORDER BY symbol, dow""".stripMargin,

    "yf_hhi_concentration" ->
      s"""WITH $barsCte,
         |monthly AS (
         |  SELECT strftime(CAST("Date" AS DATE), '%Y-%m') AS month, symbol,
         |    CAST(sum(CAST("Volume" AS BIGINT) // 1000) AS BIGINT) AS v
         |  FROM bars WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY 1, 2)
         |SELECT month, count(*) AS n_symbols, CAST(sum(v) AS BIGINT) AS sv,
         |  CAST(CAST(sum(v * v) AS BIGINT) AS DOUBLE)
         |    / (CAST(CAST(sum(v) AS BIGINT) AS DOUBLE)
         |       * CAST(CAST(sum(v) AS BIGINT) AS DOUBLE)) AS hhi
         |FROM monthly GROUP BY 1 ORDER BY 1""".stripMargin,

    "yf_pairs_correlation" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol, "Date",
         |    CAST(sum(CAST(floor("Close" * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS xq
         |  FROM bars WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY 1, 2),
         |m AS (
         |  SELECT a.symbol AS s1, b.symbol AS s2, count(*) AS n,
         |    CAST(sum(a.xq) AS BIGINT) AS sx, CAST(sum(b.xq) AS BIGINT) AS sy,
         |    CAST(sum(a.xq * a.xq) AS BIGINT) AS sxx,
         |    CAST(sum(b.xq * b.xq) AS BIGINT) AS syy,
         |    CAST(sum(a.xq * b.xq) AS BIGINT) AS sxy
         |  FROM daily a JOIN daily b
         |    ON a."Date" = b."Date" AND a.symbol < b.symbol
         |  GROUP BY 1, 2
         |  HAVING count(*) >= 30)
         |SELECT s1, s2, n, r FROM (
         |  SELECT s1, s2, n,
         |    CAST(n * sxy - sx * sy AS DOUBLE)
         |      / sqrt(nullif(CAST(n * sxx - sx * sx AS DOUBLE)
         |                    * CAST(n * syy - sy * sy AS DOUBLE), 0.0)) AS r
         |  FROM m)
         |WHERE r IS NOT NULL
         |ORDER BY r DESC, s1, s2 LIMIT 20""".stripMargin,

    "yf_underwater_duration" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol, "Date",
         |    CAST(sum(CAST(floor("Close" * 1e8 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS xq
         |  FROM bars WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY 1, 2),
         |flagged AS (
         |  SELECT symbol, "Date", xq,
         |    CASE WHEN xq < max(xq) OVER (PARTITION BY symbol ORDER BY "Date"
         |      ROWS UNBOUNDED PRECEDING) THEN 1 ELSE 0 END AS under
         |  FROM daily),
         |marked AS (
         |  SELECT symbol, "Date", xq, under,
         |    CAST(sum(1 - under) OVER (PARTITION BY symbol ORDER BY "Date"
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
         |  FROM flagged),
         |spells AS (
         |  SELECT symbol, run_id, count(*) AS spell_len
         |  FROM marked WHERE under = 1 GROUP BY 1, 2),
         |per_sym AS (
         |  SELECT symbol,
         |    CAST(coalesce(sum(spell_len), 0) AS BIGINT) AS n_underwater,
         |    CAST(coalesce(max(spell_len), 0) AS BIGINT) AS max_spell
         |  FROM spells GROUP BY 1),
         |nd AS (SELECT symbol, count(*) AS n_days FROM daily GROUP BY 1)
         |SELECT nd.symbol, n_days,
         |  coalesce(n_underwater, 0) AS n_underwater,
         |  coalesce(max_spell, 0) AS max_spell
         |FROM nd LEFT JOIN per_sym USING (symbol)
         |ORDER BY nd.symbol""".stripMargin,

    "yf_sharpe_sortino" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol, "Date",
         |    CAST(sum(CAST(floor("Close" * 1e8 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS xq
         |  FROM bars WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY 1, 2),
         |d AS (
         |  SELECT symbol,
         |    xq - lag(xq) OVER (PARTITION BY symbol ORDER BY "Date") AS dq
         |  FROM daily),
         |m AS (
         |  SELECT symbol, count(*) AS n,
         |    CAST(sum(dq) AS BIGINT) AS sd,
         |    CAST(sum(dq * dq) AS BIGINT) AS sdd,
         |    CAST(sum(CASE WHEN dq < 0 THEN dq * dq ELSE 0 END) AS BIGINT)
         |      AS sdd_down,
         |    CAST(sum(CASE WHEN dq < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_down
         |  FROM d WHERE dq IS NOT NULL GROUP BY 1)
         |SELECT symbol, n, n_down,
         |  (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
         |    / nullif(sqrt(CAST(n * sdd - sd * sd AS DOUBLE))
         |             / CAST(n AS DOUBLE), 0.0) AS sharpe,
         |  (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
         |    / nullif(sqrt(CAST(sdd_down AS DOUBLE) / CAST(n AS DOUBLE)), 0.0)
         |    AS sortino
         |FROM m ORDER BY symbol""".stripMargin,


    "yf_ols_multi" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol,
         |    date_diff('day', DATE '1992-01-01', CAST("Date" AS DATE)) AS x1,
         |    (CAST(sum(CAST(floor("Volume") AS BIGINT)) AS BIGINT) // count(*))
         |      // 1000 AS x2,
         |    CAST(sum(CAST(floor("Close" * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS y
         |  FROM bars GROUP BY symbol, "Date"),
         |m AS (
         |  SELECT symbol, count(*) AS n,
         |    sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
         |    sum(x1*x1) AS s11, sum(x2*x2) AS s22, sum(x1*x2) AS s12,
         |    sum(x1*y) AS s1y, sum(x2*y) AS s2y, sum(y*y) AS syy
         |  FROM daily GROUP BY 1),
         |d AS (
         |  SELECT *,
         |    n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
         |      + s2*(s1*s12 - s11*s2) AS det,
         |    sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)
         |      + s2*(s1y*s12 - s11*s2y) AS det0,
         |    n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)
         |      + s2*(s1*s2y - s1y*s2) AS det1,
         |    n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)
         |      + sy*(s1*s12 - s11*s2) AS det2
         |  FROM m),
         |d2 AS (
         |  -- HUGEINT→DOUBLE via VARCHAR: DuckDB's direct cast TRUNCATES
         |  -- above 2^53; the string round-trip rounds to nearest like
         |  -- Spark's Decimal→Double (measured 1-ulp intercept drift).
         |  SELECT *,
         |    CAST(CAST(det0 AS VARCHAR) AS DOUBLE)
         |      / nullif(CAST(CAST(det AS VARCHAR) AS DOUBLE), 0e0) AS b0q,
         |    CAST(CAST(det1 AS VARCHAR) AS DOUBLE)
         |      / nullif(CAST(CAST(det AS VARCHAR) AS DOUBLE), 0e0) AS b1q,
         |    CAST(CAST(det2 AS VARCHAR) AS DOUBLE)
         |      / nullif(CAST(CAST(det AS VARCHAR) AS DOUBLE), 0e0) AS b2q
         |  FROM d),
         |d3 AS (
         |  SELECT *,
         |    CAST(syy AS DOUBLE)
         |      - (b0q * CAST(sy AS DOUBLE) + b1q * CAST(s1y AS DOUBLE)
         |         + b2q * CAST(s2y AS DOUBLE)) AS sse,
         |    CAST(syy AS DOUBLE)
         |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
         |      AS sst
         |  FROM d2)
         |SELECT symbol, CAST(n AS BIGINT) AS n,
         |  b0q / 1e6 AS intercept, b1q / 1e6 AS beta_day,
         |  b2q / 1e6 AS beta_vol,
         |  1e0 - sse / nullif(sst, 0e0) AS r2
         |FROM d3 ORDER BY symbol""".stripMargin,


    "yf_tail_dependence" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol, "Date",
         |    CAST(sum(CAST(floor("Close" * 1e8 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS c
         |  FROM bars GROUP BY symbol, "Date"),
         |rr AS (SELECT symbol, "Date",
         |         c - lag(c) OVER (PARTITION BY symbol ORDER BY "Date")
         |           AS ret
         |       FROM daily),
         |rk AS (SELECT symbol, "Date", k FROM (
         |         SELECT symbol, "Date", ret,
         |           row_number() OVER (PARTITION BY symbol
         |             ORDER BY ret, "Date") AS rk,
         |           count(*) OVER (PARTITION BY symbol) AS n,
         |           count(*) OVER (PARTITION BY symbol) // 5 AS k
         |         FROM rr WHERE ret IS NOT NULL)
         |       WHERE rk > n - k),
         |j AS (SELECT a.symbol AS sym_a, b.symbol AS sym_b,
         |        count(*) AS joint, max(a.k) AS ka, max(b.k) AS kb
         |      FROM rk a JOIN rk b
         |        ON a."Date" = b."Date" AND a.symbol < b.symbol
         |      GROUP BY 1, 2)
         |SELECT sym_a, sym_b, joint, least(ka, kb) AS k_min,
         |  CAST(joint AS DOUBLE) / CAST(least(ka, kb) AS DOUBLE) AS lambda_u
         |FROM j ORDER BY lambda_u DESC, sym_a, sym_b LIMIT 20""".stripMargin,


    "yf_markowitz_minvar" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol, "Date",
         |    CAST(sum(CAST(floor("Close" * 1e8 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS c
         |  FROM bars WHERE symbol IN (1, 2) GROUP BY symbol, "Date"),
         |rr AS (SELECT symbol, "Date",
         |         c - lag(c) OVER (PARTITION BY symbol ORDER BY "Date")
         |           AS ret
         |       FROM daily),
         |aa AS (SELECT "Date", ret AS ra FROM rr
         |       WHERE symbol = 1 AND ret IS NOT NULL),
         |bb AS (SELECT "Date", ret AS rb FROM rr
         |       WHERE symbol = 2 AND ret IS NOT NULL),
         |m AS (SELECT count(*) AS n,
         |        sum(ra) AS sa, sum(rb) AS sb,
         |        sum(ra*ra) AS saa, sum(rb*rb) AS sbb, sum(ra*rb) AS sab
         |      FROM aa JOIN bb USING ("Date")),
         |d AS (SELECT *,
         |        CAST(CAST(n*saa - sa*sa AS VARCHAR) AS DOUBLE) AS va,
         |        CAST(CAST(n*sbb - sb*sb AS VARCHAR) AS DOUBLE) AS vb,
         |        CAST(CAST(n*sab - sa*sb AS VARCHAR) AS DOUBLE) AS cab
         |      FROM m),
         |d2 AS (SELECT *,
         |         (vb - cab) / (va + vb - 2e0 * cab) AS w
         |       FROM d)
         |SELECT CAST(n AS BIGINT) AS n_days, w AS w_sym1,
         |  1e0 - w AS w_sym2,
         |  (w * w * va + (1e0 - w) * (1e0 - w) * vb
         |   + 2e0 * w * (1e0 - w) * cab) / 1e16 AS port_var_q
         |FROM d2""".stripMargin,


    "yf_mann_kendall" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol,
         |    CAST(sum(CAST(floor("Close" * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS y,
         |    date_diff('day', DATE '1995-01-01', CAST("Date" AS DATE)) AS x,
         |    "Date" AS d
         |  FROM bars WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY symbol, "Date"),
         |d60 AS (
         |  SELECT symbol, x, y FROM (
         |    SELECT symbol, x, y,
         |      row_number() OVER (PARTITION BY symbol ORDER BY d) AS rn
         |    FROM daily) WHERE rn <= 60),
         |s AS (
         |  SELECT a.symbol,
         |    CAST(sum(CASE WHEN b.y > a.y THEN 1
         |                  WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT)
         |      AS s_stat
         |  FROM d60 a JOIN d60 b ON a.symbol = b.symbol AND a.x < b.x
         |  GROUP BY 1),
         |nn AS (SELECT symbol, count(*) AS n FROM d60
         |       GROUP BY 1 HAVING count(*) >= 2)
         |SELECT s.symbol, n, s_stat,
         |  CAST(s_stat * 2 AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE) AS tau
         |FROM s JOIN nn ON s.symbol = nn.symbol
         |ORDER BY s.symbol""".stripMargin,


    "yf_theilsen" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol,
         |    CAST(sum(CAST(floor("Close" * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS y,
         |    date_diff('day', DATE '1995-01-01', CAST("Date" AS DATE)) AS x,
         |    "Date" AS d
         |  FROM bars WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY symbol, "Date"),
         |d25 AS (
         |  SELECT symbol, x, y FROM (
         |    SELECT symbol, x, y,
         |      row_number() OVER (PARTITION BY symbol ORDER BY d) AS rn
         |    FROM daily) WHERE rn <= 25),
         |slopes AS (
         |  SELECT a.symbol,
         |    (CASE WHEN b.y >= a.y THEN 1 ELSE -1 END) *
         |      ((abs(b.y - a.y) * 1000000) // (b.x - a.x)) AS sq
         |  FROM d25 a JOIN d25 b ON a.symbol = b.symbol AND a.x < b.x),
         |nn AS (SELECT symbol, count(*) AS n_pairs FROM slopes GROUP BY 1),
         |ranked AS (
         |  SELECT symbol, sq,
         |    row_number() OVER (PARTITION BY symbol ORDER BY sq) AS rn
         |  FROM slopes)
         |SELECT r.symbol, max(n_pairs) AS n_pairs,
         |  CAST(sum(CASE WHEN rn = (n_pairs + 1) // 2 THEN sq ELSE 0 END)
         |     + sum(CASE WHEN rn = (n_pairs + 2) // 2 THEN sq ELSE 0 END)
         |    AS BIGINT) AS slope_med2_q12,
         |  CAST(CAST(sum(CASE WHEN rn = (n_pairs + 1) // 2 THEN sq ELSE 0 END)
         |     + sum(CASE WHEN rn = (n_pairs + 2) // 2 THEN sq ELSE 0 END)
         |    AS BIGINT) AS DOUBLE) / 2e12 AS slope
         |FROM ranked r JOIN nn USING (symbol)
         |GROUP BY r.symbol ORDER BY r.symbol""".stripMargin,


    "yf_kurtosis_skew" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol, "Date",
         |    CAST(sum(CAST(floor("Close" * 1e4 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS xq
         |  FROM bars WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY 1, 2),
         |d AS (
         |  SELECT symbol,
         |    xq - lag(xq) OVER (PARTITION BY symbol ORDER BY "Date") AS x
         |  FROM daily),
         |m AS (
         |  SELECT symbol, count(*) AS n,
         |    sum(x) AS s1, sum(x*x) AS s2, sum(x*x*x) AS s3,
         |    sum(x*x*x*x) AS s4
         |  FROM d WHERE x IS NOT NULL GROUP BY 1 HAVING count(*) >= 3),
         |abc AS (
         |  SELECT symbol, n,
         |    n*s2 - s1*s1 AS a,
         |    n*n*s3 - 3*n*s1*s2 + 2*s1*s1*s1 AS b,
         |    n*n*n*s4 - 4*n*n*s1*s3 + 6*n*s1*s1*s2 - 3*s1*s1*s1*s1 AS c
         |  FROM m),
         |-- HUGEINT→DOUBLE via VARCHAR: DuckDB's direct cast TRUNCATES
         |-- above 2^53 while Spark's Decimal→Double rounds to nearest.
         |dd AS (
         |  SELECT symbol, n,
         |    CAST(CAST(a AS VARCHAR) AS DOUBLE) AS ad,
         |    CAST(CAST(b AS VARCHAR) AS DOUBLE) AS bd,
         |    CAST(CAST(c AS VARCHAR) AS DOUBLE) AS cd
         |  FROM abc)
         |SELECT symbol, CAST(n AS BIGINT) AS n,
         |  bd / nullif(ad * sqrt(ad), 0.0) AS skew,
         |  cd / nullif(ad * ad, 0.0) - 3.0 AS kurtosis_excess
         |FROM dd ORDER BY symbol""".stripMargin,


    "yf_typed_agg" ->
      s"""WITH $barsCte
         |SELECT symbol, count(*) AS n_bars,
         |  CAST(sum(CAST(floor("Close" * 1e4 + 0.5) AS BIGINT)) AS BIGINT)
         |    AS sum_close_q4,
         |  CAST(CAST(sum(CAST(floor("Close" * 1e4 + 0.5) AS BIGINT)) AS BIGINT)
         |      AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) / 1e4 AS avg_close
         |FROM bars GROUP BY 1 ORDER BY symbol""".stripMargin,


    "yf_donchian" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol, "Date",
         |    CAST(sum(CAST(floor("Close" * 1e4 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS cq
         |  FROM bars WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY 1, 2),
         |r AS (
         |  SELECT symbol, "Date", cq,
         |    row_number() OVER (PARTITION BY symbol ORDER BY "Date") AS rn,
         |    max(cq) OVER (PARTITION BY symbol ORDER BY "Date"
         |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS mx,
         |    min(cq) OVER (PARTITION BY symbol ORDER BY "Date"
         |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS mn
         |  FROM daily)
         |SELECT symbol, CAST(CAST("Date" AS DATE) AS VARCHAR) AS d, cq,
         |  CASE WHEN rn >= 20 THEN mx END AS ch_hi_q4,
         |  CASE WHEN rn >= 20 THEN mn END AS ch_lo_q4,
         |  CAST(cq - CASE WHEN rn >= 20 THEN mn END AS DOUBLE)
         |    / nullif(CAST(CASE WHEN rn >= 20 THEN mx END
         |             - CASE WHEN rn >= 20 THEN mn END AS DOUBLE), 0.0) AS pos
         |FROM r ORDER BY symbol, d""".stripMargin,


    "yf_golden_cross" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol, "Date",
         |    CAST(sum(CAST(floor("Close" * 1e4 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS cq
         |  FROM bars WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY 1, 2),
         |st AS (
         |  SELECT symbol, "Date", cq,
         |    row_number() OVER (PARTITION BY symbol ORDER BY "Date") AS rn,
         |    CAST(sum(cq) OVER (PARTITION BY symbol ORDER BY "Date"
         |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum5,
         |    CAST(sum(cq) OVER (PARTITION BY symbol ORDER BY "Date"
         |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum20
         |  FROM daily),
         |fa AS (
         |  SELECT symbol, "Date",
         |    CASE WHEN rn >= 20 THEN
         |      CAST(sum5 * 4 > sum20 AS INTEGER) END AS fast_above
         |  FROM st),
         |lg AS (
         |  SELECT symbol, "Date", fast_above,
         |    lag(fast_above) OVER (PARTITION BY symbol ORDER BY "Date")
         |      AS prev_above
         |  FROM fa)
         |SELECT symbol, CAST(CAST("Date" AS DATE) AS VARCHAR) AS d,
         |  CASE WHEN fast_above = 1 THEN 'golden' ELSE 'death' END AS direction
         |FROM lg
         |WHERE fast_above IS NOT NULL AND prev_above IS NOT NULL
         |  AND fast_above <> prev_above
         |ORDER BY symbol, d""".stripMargin,


    "yf_jarque_bera" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol, "Date",
         |    CAST(sum(CAST(floor("Close" * 1e4 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS xq
         |  FROM bars WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY 1, 2),
         |d AS (
         |  SELECT symbol,
         |    xq - lag(xq) OVER (PARTITION BY symbol ORDER BY "Date") AS x
         |  FROM daily),
         |m AS (
         |  SELECT symbol, count(*) AS n,
         |    sum(x) AS s1, sum(x*x) AS s2, sum(x*x*x) AS s3,
         |    sum(x*x*x*x) AS s4
         |  FROM d WHERE x IS NOT NULL GROUP BY 1 HAVING count(*) >= 3),
         |abc AS (
         |  SELECT symbol, n,
         |    n*s2 - s1*s1 AS a,
         |    n*n*s3 - 3*n*s1*s2 + 2*s1*s1*s1 AS b,
         |    n*n*n*s4 - 4*n*n*s1*s3 + 6*n*s1*s1*s2 - 3*s1*s1*s1*s1 AS c
         |  FROM m),
         |dd AS (
         |  SELECT symbol, n,
         |    CAST(CAST(a AS VARCHAR) AS DOUBLE) AS ad,
         |    CAST(CAST(b AS VARCHAR) AS DOUBLE) AS bd,
         |    CAST(CAST(c AS VARCHAR) AS DOUBLE) AS cd
         |  FROM abc),
         |g AS (
         |  SELECT symbol, n,
         |    bd / nullif(ad * sqrt(ad), 0.0) AS g1,
         |    cd / nullif(ad * ad, 0.0) - 3.0 AS g2
         |  FROM dd)
         |SELECT symbol, CAST(n AS BIGINT) AS n,
         |  CAST(n AS DOUBLE) * (g1 * g1 / 6.0e0 + g2 * g2 / 24.0e0) AS jb,
         |  CAST(CAST(n AS DOUBLE) * (g1 * g1 / 6.0e0 + g2 * g2 / 24.0e0)
         |    > 5.991e0 AS INTEGER) AS reject_normal
         |FROM g ORDER BY symbol""".stripMargin,


    "yf_atr" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol, "Date",
         |    max(CAST(floor("High" * 1e4 + 0.5) AS BIGINT)) AS hq,
         |    min(CAST(floor("Low" * 1e4 + 0.5) AS BIGINT)) AS lq,
         |    CAST(sum(CAST(floor("Close" * 1e4 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS cq
         |  FROM bars WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY 1, 2),
         |t1 AS (
         |  SELECT symbol, "Date", hq, lq, cq,
         |    lag(cq) OVER (PARTITION BY symbol ORDER BY "Date") AS cprev,
         |    row_number() OVER (PARTITION BY symbol ORDER BY "Date") AS rn
         |  FROM daily),
         |t2 AS (
         |  SELECT symbol, "Date", rn,
         |    CASE WHEN cprev IS NULL THEN hq - lq
         |         ELSE greatest(hq - lq, abs(hq - cprev), abs(lq - cprev))
         |    END AS tr
         |  FROM t1),
         |w AS (
         |  SELECT symbol, "Date", tr, rn,
         |    CAST(sum(tr) OVER (PARTITION BY symbol ORDER BY "Date"
         |      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT) AS tr14
         |  FROM t2)
         |SELECT symbol, CAST(CAST("Date" AS DATE) AS VARCHAR) AS d, tr,
         |  CASE WHEN rn >= 14 THEN tr14 // 14 END AS atr_q4,
         |  CAST(CASE WHEN rn >= 14 THEN tr14 // 14 END AS DOUBLE) / 1e4 AS atr
         |FROM w ORDER BY symbol, d""".stripMargin,


    "yf_ulcer_index" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol, "Date",
         |    CAST(sum(CAST(floor("Close" * 1e4 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS cq
         |  FROM bars WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY 1, 2),
         |d2 AS (SELECT * FROM daily WHERE cq > 0),
         |p AS (
         |  SELECT symbol, cq,
         |    max(cq) OVER (PARTITION BY symbol ORDER BY "Date"
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
         |  FROM d2),
         |dd AS (SELECT symbol, ((peak - cq) * 10000) // peak AS dd_bp FROM p)
         |SELECT symbol, count(*) AS n, max(dd_bp) AS max_dd_bp,
         |  sqrt(CAST(CAST(sum(dd_bp * dd_bp) AS BIGINT) AS DOUBLE)
         |       / CAST(count(*) AS DOUBLE)) / 100.0e0 AS ulcer
         |FROM dd GROUP BY 1 ORDER BY symbol""".stripMargin,


    "yf_gap_days" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol, "Date",
         |    CAST(sum(CAST(floor("Open" * 1e4 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS oq,
         |    CAST(sum(CAST(floor("Close" * 1e4 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS cq
         |  FROM bars WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY 1, 2),
         |lg AS (
         |  SELECT symbol, "Date", oq,
         |    lag(cq) OVER (PARTITION BY symbol ORDER BY "Date") AS cprev
         |  FROM daily),
         |g AS (
         |  SELECT symbol, "Date", oq, cprev,
         |    (abs(oq - cprev) * 10000) // cprev AS gap_bp
         |  FROM lg WHERE cprev IS NOT NULL AND cprev > 0)
         |SELECT symbol, CAST(CAST("Date" AS DATE) AS VARCHAR) AS d,
         |  oq, cprev, gap_bp,
         |  CASE WHEN oq > cprev THEN 'up' ELSE 'down' END AS direction
         |FROM g WHERE gap_bp >= 500
         |ORDER BY symbol, d""".stripMargin,


    "yf_calmar" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol, "Date",
         |    CAST(sum(CAST(floor("Close" * 1e4 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS cq
         |  FROM bars WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY 1, 2),
         |d2 AS (SELECT * FROM daily WHERE cq > 0),
         |p AS (
         |  SELECT symbol, "Date", cq,
         |    max(cq) OVER (PARTITION BY symbol ORDER BY "Date"
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
         |  FROM d2),
         |m AS (
         |  SELECT symbol, count(*) AS n,
         |    arg_min(cq, "Date") AS first_cq,
         |    arg_max(cq, "Date") AS last_cq,
         |    max(((peak - cq) * 10000) // peak) AS max_dd_bp
         |  FROM p GROUP BY 1),
         |r AS (
         |  SELECT symbol, n, max_dd_bp,
         |    CASE WHEN last_cq >= first_cq
         |         THEN ((last_cq - first_cq) * 10000) // first_cq
         |         ELSE -(((first_cq - last_cq) * 10000) // first_cq)
         |    END AS ret_bp
         |  FROM m)
         |SELECT symbol, n, ret_bp, max_dd_bp,
         |  CAST(ret_bp AS DOUBLE) / nullif(CAST(max_dd_bp AS DOUBLE), 0.0)
         |    AS calmar
         |FROM r ORDER BY symbol""".stripMargin,
  )
}
