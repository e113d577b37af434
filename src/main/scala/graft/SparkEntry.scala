package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 (plus the training-data-pipeline
  * extensions) is exposed as a named query over the driver-generated
  * parquet tables, with a DuckDB-runnable oracle where the semantics are
  * ANSI-SQL-expressible. Column names are aliased identically on both
  * sides; every pair imposes a total ORDER BY.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's most operator-dense pipeline stage: scan → timestamp
    * bucket → 36 aggregates → global ranking window → literal tag
    * (`Tugas 2/Yfinance API/yfinance_transform.py:48-95`). */
  def entry(spark: SparkSession): DataFrame =
    queries("yf_month_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "yf_month_agg" -> ((s, dir) =>
      stabilized(yf.Ohlcv.aggregatePeriod(Sources.ohlcv(s, dir), "yyyy-MM", "month"))
        .orderBy("period_key")),

    // IDX 32-column financial report: nested-struct projection, string→
    // double casts, fillna, coalesce, nullif ratios, pinned column order
    // (idx_transform.py:107-273).
    "idx_financials" -> ((s, dir) =>
      idx.FinancialReport.transform(
        idx.FinancialReport.fixtureFromOrders(Sources.orders(s, dir)))
        .orderBy("company_code")),

    // YF year rollup (yfinance_transform.py:121,132 label="year").
    "yf_year_agg" -> ((s, dir) =>
      stabilized(yf.Ohlcv.aggregatePeriod(Sources.ohlcv(s, dir), "yyyy", "year"))
        .orderBy("period_key")),

    // YF day branch: raw rows + period_key + agg_type, no aggregation
    // (yfinance_transform.py:122-128).
    "yf_day_raw" -> ((s, dir) => {
      val d = yf.Ohlcv.dayBranch(Sources.ohlcv(s, dir))
      d.orderBy(d.columns.map(c => col(s"`$c`")): _*)
    }),

    // Scale-path variant of the month rollup: window partitioned by symbol
    // so no single-partition exchange exists at cluster scale.
    "yf_symbol_month_agg" -> ((s, dir) =>
      stabilized(yf.Ohlcv.aggregatePeriodBySymbol(Sources.ohlcv(s, dir), "yyyy-MM", "month"))
        .orderBy("symbol", "period_key")),

    // Technical-indicator WINDOW over the reference's own stock domain:
    // consolidate to daily bars (unique (symbol, Date) keys — windows
    // over raw bars would order ties nondeterministically), then a
    // trailing-20-day moving average + above/below signal. Close is
    // QUANTIZED to 1e-8 longs (floor(v*1e8+0.5) — pure IEEE arithmetic,
    // engine-identical; a decimal CAST is not: Spark rounds the double's
    // shortest string form, DuckDB the exact binary value) so every sum —
    // including the sliding-window sum — is exact integer arithmetic,
    // divided back once at the end. Window partitioned by symbol — no
    // global ordering at any scale. One year's slice: the window
    // mechanics are identical, the verified payload stays bounded as the
    // suite grows (both engines slice BEFORE consolidation).
    "yf_sma_signals" -> ((s, dir) => {
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Close") * 1e8 + 0.5).cast("long")).as("close_sum"),
          count(lit(1)).as("n_bars"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("symbol").orderBy("Date").rowsBetween(-19, 0)
      daily
        .withColumn("close_avg", (col("close_sum") / 1e8) / col("n_bars"))
        .withColumn("sma20",
          (sum(col("close_sum")).over(w) / 1e8) / sum(col("n_bars")).over(w))
        .withColumn("above_sma", (col("close_avg") > col("sma20")).cast("int"))
        .select(col("symbol"), col("Date"), col("close_avg"), col("sma20"),
          col("above_sma"))
        .orderBy("symbol", "Date")
    }),

    // Per-symbol RETURNS + DRAWDOWN (window coverage: lag + running max —
    // the two window shapes the suite lacked; sma covers sliding sums).
    // Daily return = close/lag(close) - 1; drawdown = 1 - close/peak with
    // peak a running max. All windows partitioned by symbol (no global
    // ordering at any scale). Close is consolidated on 1e-8-quantized
    // integer sums like yf_sma_signals; every downstream double is then
    // derived from bit-identical inputs by IEEE division, so both engines
    // compute byte-identical results with no rounding-rule dependency.
    "yf_returns_drawdown" -> ((s, dir) => {
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Close") * 1e8 + 0.5).cast("long")).as("close_sum"),
          count(lit(1)).as("n_bars"))
        .withColumn("close_avg", (col("close_sum") / 1e8) / col("n_bars"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("symbol").orderBy("Date")
      val wPeak = w.rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
      // The synthetic Close (l_tax) can be 0 — nullif-guard the divisors
      // (ANSI mode, P6's safe-ratio discipline).
      def nz(c: org.apache.spark.sql.Column) = when(c === 0.0, lit(null)).otherwise(c)
      daily
        .withColumn("ret",
          col("close_avg") / nz(lag(col("close_avg"), 1).over(w)) - 1.0)
        .withColumn("peak", max(col("close_avg")).over(wPeak))
        .withColumn("drawdown", lit(1.0) - col("close_avg") / nz(col("peak")))
        .select(col("symbol"), col("Date"), col("close_avg"), col("ret"),
          col("peak"), col("drawdown"))
        .orderBy("symbol", "Date")
    }),

    // FORWARD-FILL gap filling (time-series resampling): every symbol
    // gets a DENSE day spine (explode(sequence) between its own min and
    // max trading day — rows generated executor-side, never a driver
    // loop), observed closes left-join onto it, and gaps carry the last
    // observation forward via last(ignoreNulls) over a per-symbol
    // running frame. The spine join is co-keyed on (symbol, day); the
    // fill window is partitioned by symbol — no global ordering. Close
    // is 1e-8-quantized (the house consolidation); the filled value is
    // an IEEE division of identical integers on both engines.
    "yf_forward_fill" -> ((s, dir) => {
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1995-04-01"))
        .withColumn("day_idx", datediff(col("Date"), lit("1970-01-01")).cast("long"))
        .groupBy("symbol", "day_idx")
        .agg(sum(floor(col("Close") * 1e8 + 0.5).cast("long")).as("close_sum"),
          count(lit(1)).as("n_bars"))
      val spine = daily.groupBy("symbol")
        .agg(min(col("day_idx")).as("d0"), max(col("day_idx")).as("d1"))
        .select(col("symbol"), explode(sequence(col("d0"), col("d1"))).as("day_idx"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("symbol").orderBy("day_idx")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      spine.join(daily, Seq("symbol", "day_idx"), "left")
        .withColumn("is_observed", col("close_sum").isNotNull.cast("int"))
        .withColumn("close_filled",
          (last(col("close_sum"), ignoreNulls = true).over(w) / 1e8)
            / last(col("n_bars"), ignoreNulls = true).over(w))
        .select("symbol", "day_idx", "is_observed", "close_filled")
        .orderBy("symbol", "day_idx")
    }),

    // RSI (Cutler's SMA variant): 100 − 100/(1 + ΣgainΣ/Σloss) over a
    // trailing 14-day window. Wilder's original uses exponential
    // smoothing with factor 1/14 — pow() smoothing is not correctly
    // rounded and can't be a cross-engine contract (the yf_ewma lesson;
    // its decay-½ trick doesn't apply to 13/14) — Cutler's SMA form is
    // the standard deterministic substitute: gains/losses are integer
    // q8 diffs, the window sums are exact, and the RSI is three ordered
    // IEEE ops. All-gain windows pin RSI = 100 explicitly (the Σloss=0
    // pole); windows before any diff exists stay NULL.
    "yf_rsi" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Close") * 1e8 + 0.5).cast("long")).as("close_sum"),
          count(lit(1)).as("n_bars"))
        .withColumn("xq", expr("close_sum div n_bars"))
      val wOrd = Window.partitionBy("symbol").orderBy("Date")
      val w14 = wOrd.rowsBetween(-13, 0)
      daily
        .withColumn("diff", col("xq") - lag(col("xq"), 1).over(wOrd))
        // explicit NULL propagation: greatest() IGNORES nulls (in both
        // engines, but with different histories) — the first row's
        // missing diff must stay NULL, not clamp to 0
        .withColumn("gain",
          when(col("diff").isNull, lit(null).cast("long"))
            .otherwise(greatest(col("diff"), lit(0L))))
        .withColumn("loss",
          when(col("diff").isNull, lit(null).cast("long"))
            .otherwise(greatest(-col("diff"), lit(0L))))
        .withColumn("gsum", sum(col("gain")).over(w14))
        .withColumn("lsum", sum(col("loss")).over(w14))
        .withColumn("rsi",
          when(col("lsum") === 0L, lit(100.0))
            .otherwise(lit(100.0) -
              lit(100.0) / (lit(1.0) + col("gsum").cast("double") / col("lsum"))))
        .select("symbol", "Date", "xq", "gsum", "lsum", "rsi")
        .orderBy("symbol", "Date")
    }),

    // LINEAR INTERPOLATION gap filling — the two-sided complement of
    // yf_forward_fill's last-observation carry: each missing day on the
    // dense per-symbol spine gets prev + (next−prev)·(d−pd)/(nd−pd),
    // computed as ONE exact integer numerator (q8 closes × day spans)
    // over two IEEE divisions in identical order both engines. Boundary
    // days with no observation on one side stay NULL (interpolation
    // never extrapolates). Windows: last(ignoreNulls) backward +
    // first(ignoreNulls) forward, both per-symbol — no global ordering.
    "yf_interpolate" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1995-04-01"))
        .withColumn("day_idx", datediff(col("Date"), lit("1970-01-01")).cast("long"))
        .groupBy("symbol", "day_idx")
        .agg(sum(floor(col("Close") * 1e8 + 0.5).cast("long")).as("close_sum"),
          count(lit(1)).as("n_bars"))
        .withColumn("xq", expr("close_sum div n_bars"))
        .select("symbol", "day_idx", "xq")
      val spine = daily.groupBy("symbol")
        .agg(min(col("day_idx")).as("d0"), max(col("day_idx")).as("d1"))
        .select(col("symbol"), explode(sequence(col("d0"), col("d1"))).as("day_idx"))
      val joined = spine.join(daily, Seq("symbol", "day_idx"), "left")
        .withColumn("obs_day", when(col("xq").isNotNull, col("day_idx")))
      val wBack = Window.partitionBy("symbol").orderBy("day_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wFwd = Window.partitionBy("symbol").orderBy("day_idx")
        .rowsBetween(0, Window.unboundedFollowing)
      joined
        .withColumn("prev_xq", last(col("xq"), ignoreNulls = true).over(wBack))
        .withColumn("prev_day", last(col("obs_day"), ignoreNulls = true).over(wBack))
        .withColumn("next_xq", first(col("xq"), ignoreNulls = true).over(wFwd))
        .withColumn("next_day", first(col("obs_day"), ignoreNulls = true).over(wFwd))
        .withColumn("is_observed", col("xq").isNotNull.cast("int"))
        .withColumn("close_interp",
          when(col("xq").isNotNull, col("xq").cast("double") / 1e8)
            .otherwise(
              (col("prev_xq") * (col("next_day") - col("day_idx")) +
                col("next_xq") * (col("day_idx") - col("prev_day"))).cast("double")
                / (col("next_day") - col("prev_day")) / 1e8))
        .select("symbol", "day_idx", "is_observed", "close_interp")
        .orderBy("symbol", "day_idx")
    }),

    // DATASET CARD — the one-row corpus fact sheet every published
    // training set ships (docs, token mass, language/source spread,
    // duplicate and degenerate shares): one pass, all map-side
    // combinable aggregates composed from the suite's own signal
    // definitions (house tokenizer, normalized-md5 fingerprint). The
    // detailed per-language/per-source breakdowns are the existing
    // docs_source_audit / docs_lm_buckets queries — this is the
    // headline row above them.
    "docs_dataset_card" -> ((s, dir) => {
      val base = Sources.documents(s, dir).select(
        col("doc_id"), col("lang"), col("source"),
        size(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+"))
          .cast("long").as("n_tokens"),
        md5(util.Norm.normalize(col("text")).cast("binary")).as("fp"))
      base.agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        (count(lit(1)) - countDistinct(col("fp"))).as("n_dup_docs"),
        count_if(col("n_tokens") < 5).as("n_short_docs"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))
    }),

    // COHORT LTV triangle — the dollar-weighted twin of
    // events_retention's user-count triangle: customers cohort by
    // FIRST-order month, and each (cohort, months-since-first) cell
    // accumulates exact-decimal revenue. Month arithmetic is pure
    // integers (year·12+month); the cohort assignment is one per-
    // customer min aggregate joined back co-keyed on custkey — the
    // orders fact shuffles once.
    "customer_cohort_ltv" -> ((s, dir) => {
      val o = Sources.orders(s, dir).select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .cast("long").as("m"),
        util.Stable.dec2(col("o_totalprice")).as("rev"))
      val firstM = o.groupBy("o_custkey").agg(min(col("m")).as("m0"))
      o.join(firstM, "o_custkey")
        .groupBy(col("m0").as("cohort_month"), (col("m") - col("m0")).as("k"))
        .agg(countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"),
          sum(col("rev")).cast(DecimalType(38, 2)).cast("double").as("revenue"))
        .orderBy("cohort_month", "k")
    }),

    // RANGE-frame windows (value-based frames — every other window in
    // the suite is ROWS-based): for each event, how many same-type
    // events sit within 100 value-quanta BELOW it, and their sum. A
    // RANGE frame's contents depend only on VALUES, so ties need no
    // tiebreak for determinism — the frame semantics themselves are
    // what's pinned here.
    "events_range_frame" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy("vq").rangeBetween(-100L, 0L)
      Sources.events(s, dir)
        .select(col("event_id"), col("event_type"),
          floor(col("value") * 100.0 + 0.5).cast("long").as("vq"))
        .withColumn("n_near_below", count(lit(1)).over(w))
        .withColumn("sum_near_below", sum(col("vq")).over(w))
        .orderBy("event_type", "vq", "event_id")
    }),

    // PARETO concentration (the "top 10% of customers drive X% of
    // revenue" table): customers rank into revenue deciles and each
    // decile reports its exact-decimal revenue and IEEE share. The
    // ntile window's INPUT is one row per customer (post-aggregate
    // grain) — at billions of customers the rank-free path is the GK
    // quantile cut (events_quantiles_approx), same output contract.
    "customer_pareto" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cust = Sources.orders(s, dir)
        .groupBy("o_custkey")
        .agg(sum(util.Stable.dec2(col("o_totalprice"))).as("rev"))
      val total = cust.agg(
        sum(col("rev")).cast(DecimalType(38, 2)).cast("double").as("total_rev"))
      cust
        .withColumn("decile", ntile(10).over(
          Window.orderBy(col("rev").desc, col("o_custkey"))))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_customers"),
          sum(col("rev")).cast(DecimalType(38, 2)).cast("double").as("revenue"))
        .crossJoin(broadcast(total))
        .withColumn("rev_share_pct", col("revenue") / col("total_rev") * 100.0)
        .select("decile", "n_customers", "revenue", "rev_share_pct")
        .orderBy("decile")
    }),

    // Weekly OHLC RESAMPLING — the canonical financial downsample (daily
    // bars → weekly candles) and the suite's argmin/argmax aggregate
    // coverage: open = the FIRST day's value, close = the LAST day's
    // (min_by/max_by ⇔ DuckDB arg_min/arg_max — codegen'd built-ins, not
    // a window + filter over the whole frame). Days consolidate to
    // integer-exact quantized sums first (the sma discipline), so every
    // daily avg is one IEEE division of identical longs on both engines
    // and the weekly max/min/argmax adjudicate on bit-identical doubles;
    // day_idx is unique per (symbol, week), so the argmin/argmax are
    // tie-free by construction. Week key = (epoch_day + 3) DIV 7
    // (Monday-aligned), pure integer. Two keyed aggregations with
    // map-side partials, both at (symbol, ·) grain — no window, no
    // global order at any scale.
    "yf_weekly_ohlc" -> ((s, dir) => {
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .withColumn("day_idx", datediff(col("Date"), lit("1970-01-01")).cast("long"))
        .groupBy("symbol", "day_idx")
        .agg(
          sum(floor(col("Open") * 1e8 + 0.5).cast("long")).as("open_sum"),
          sum(floor(col("High") * 1e8 + 0.5).cast("long")).as("high_sum"),
          sum(floor(col("Low") * 1e8 + 0.5).cast("long")).as("low_sum"),
          sum(floor(col("Close") * 1e8 + 0.5).cast("long")).as("close_sum"),
          sum(floor(col("Volume") + 0.5).cast("long")).as("vol_sum"),
          count(lit(1)).as("n_bars"))
      daily
        .withColumn("week_idx", expr("(day_idx + 3) DIV 7"))
        .withColumn("open_avg", (col("open_sum") / 1e8) / col("n_bars"))
        .withColumn("high_avg", (col("high_sum") / 1e8) / col("n_bars"))
        .withColumn("low_avg", (col("low_sum") / 1e8) / col("n_bars"))
        .withColumn("close_avg", (col("close_sum") / 1e8) / col("n_bars"))
        .groupBy("symbol", "week_idx")
        .agg(
          min_by(col("open_avg"), col("day_idx")).as("open"),
          max(col("high_avg")).as("high"),
          min(col("low_avg")).as("low"),
          max_by(col("close_avg"), col("day_idx")).as("close"),
          sum(col("vol_sum")).as("volume"),
          count(lit(1)).as("n_days"))
        .orderBy("symbol", "week_idx")
    }),

    // VWAP (volume-weighted average price) per symbol-week: the
    // execution-quality benchmark every trading pipeline computes. Both
    // the price·volume numerator and the volume denominator are EXACT
    // integer sums (1e-8-quantized close × integral volume — products
    // and sums stay far inside BIGINT), divided back once at the end, so
    // both engines emit bit-identical doubles. One keyed aggregation
    // with map-side partials at (symbol, week) grain — no window.
    "yf_vwap" -> ((s, dir) =>
      Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .withColumn("week_idx", expr(
          "(CAST(datediff(Date, DATE '1970-01-01') AS BIGINT) + 3) DIV 7"))
        .withColumn("close_q8", floor(col("Close") * 1e8 + 0.5).cast("long"))
        .withColumn("vol", floor(col("Volume") + 0.5).cast("long"))
        .groupBy("symbol", "week_idx")
        .agg(sum(col("close_q8") * col("vol")).as("pv_sum"),
          sum(col("vol")).as("vol_sum"),
          count(lit(1)).as("n_bars"))
        .withColumn("vwap", (col("pv_sum") / 1e8) / col("vol_sum"))
        .select("symbol", "week_idx", "n_bars", "vol_sum", "vwap")
        .orderBy("symbol", "week_idx")),

    // BOLLINGER BANDS: trailing-20-day mean ± 2 sample stddevs — the
    // windowed-VARIANCE coverage the indicator family lacked (sma =
    // sliding sum, ewma = ordered fold; this adds second moments). The
    // window sums run over 1e-6-quantized daily closes, so (n·Σx² − Σx²)
    // is EXACT integer arithmetic; the only FP steps are one division,
    // one sqrt (correctly rounded by IEEE — a cross-engine contract,
    // unlike pow), and the band adds, applied in identical order on both
    // engines. Windows partitioned by symbol — no global ordering.
    "yf_bollinger" -> ((s, dir) => {
      val daily = Sources.ohlcv(s, dir)
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .groupBy("symbol", "Date")
        .agg(sum(floor(col("Close") * 1e8 + 0.5).cast("long")).as("close_sum"),
          count(lit(1)).as("n_bars"))
        .withColumn("close_avg", (col("close_sum") / 1e8) / col("n_bars"))
        .withColumn("cq", floor(col("close_avg") * 1e6 + 0.5).cast("long"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("symbol").orderBy("Date").rowsBetween(-19, 0)
      daily
        .withColumn("n_w", count(lit(1)).over(w))
        .withColumn("s1", sum(col("cq")).over(w))
        .withColumn("s2", sum(col("cq") * col("cq")).over(w))
        .withColumn("sma20", (col("s1") / 1e6) / col("n_w"))
        .withColumn("sd20", when(col("n_w") < 2, lit(null).cast("double"))
          .otherwise(sqrt((col("n_w") * col("s2") - col("s1") * col("s1"))
            .cast("double") / (col("n_w") * (col("n_w") - 1))) / 1e6))
        .withColumn("upper", col("sma20") + lit(2.0) * col("sd20"))
        .withColumn("lower", col("sma20") - lit(2.0) * col("sd20"))
        .withColumn("squeeze", (col("upper") - col("lower") < 0.02).cast("int"))
        .select("symbol", "Date", "close_avg", "sma20", "sd20",
          "upper", "lower", "squeeze")
        .orderBy("symbol", "Date")
    }),

    // Broadcast catalog join (SURVEY.md §2.5): company identity via an
    // explicit equi-join against the small dimension instead of the
    // reference's 951 collection names; rolled up per company.
    "yf_catalog_join" -> ((s, dir) => {
      val bars = Sources.ohlcv(s, dir)
      yf.Ohlcv.joinCatalog(bars, Sources.supplier(s, dir), "symbol", "s_suppkey")
        .groupBy(col("symbol"), col("s_name").as("company_name"))
        .agg(
          count(lit(1)).as("n_bars"),
          util.Stable.exactSum(col("Volume")).as("sum_volume"),
          max(col("High")).as("max_high"))
        .orderBy("symbol")
    }),

    // Reference-fidelity month aggregate (yfinance_transform.py:53-90):
    // the reference's EXACT output schema — stat-major column blocks with
    // std_* aliases — alongside the engine-native interleaved form above.
    "yf_month_agg_ref" -> ((s, dir) =>
      stabilized(yf.Ohlcv.aggregatePeriodRef(Sources.ohlcv(s, dir), "yyyy-MM", "month"))
        .orderBy("period_key")),

    // Real CSV catalog read (S3, yfinance_transform.py:23-30 +
    // Daftar_Saham.csv): header CSV -> explicit casts -> broadcast join
    // against the fact table, rolled up per symbol.
    "yf_csv_catalog_join" -> ((s, dir) => {
      val bars = Sources.ohlcv(s, dir)
      yf.Ohlcv.joinCatalog(bars, Sources.stockCatalog(s), "symbol", "Kode")
        .groupBy(col("symbol"), col("Nama Perusahaan").as("company_name"))
        .agg(
          count(lit(1)).as("n_bars"),
          util.Stable.exactSum(col("Volume")).as("sum_volume"),
          max(col("High")).as("max_high"))
        .orderBy("symbol")
    }),

    // The catalog join through the engine's OWN DataSource V2 connector
    // (S2's connector-scan surface made real — see
    // graft.sources.CsvCatalog): the Kode < 500 slice pushes INTO the
    // connector's partition readers (rows outside the slice never reach
    // Spark — the connector analogue of parquet PushedFilters, spec-
    // asserted in CsvCatalogSpec), the two-column projection prunes the
    // reader's output, and the pruned slice broadcasts into the join.
    // Same aggregate shape as yf_csv_catalog_join; oracle applies the
    // identical slice to the raw CSV.
    "yf_dsv2_catalog_join" -> ((s, dir) => {
      val bars = Sources.ohlcv(s, dir)
      val cat = Sources.stockCatalogV2(s).filter(col("Kode") < 500)
      yf.Ohlcv.joinCatalog(bars, cat, "symbol", "Kode")
        .groupBy(col("symbol"), col("Nama Perusahaan").as("company_name"))
        .agg(
          count(lit(1)).as("n_bars"),
          util.Stable.exactSum(col("Volume")).as("sum_volume"),
          max(col("High")).as("max_high"))
        .orderBy("symbol")
    }),

    // DSv2 AGGREGATE pushdown (round 6): the ungrouped count/min/max
    // computes INSIDE the connector's partition readers — each partition
    // emits one partial row and Spark merges them, so the exchange
    // carries one row per partition instead of the table (the connector
    // analogue of "server-side aggregation per shard"; CsvCatalogSpec
    // asserts PushedAggregates in the plan, the refusal path for grouped
    // aggs, and null partials on empty strides). Composed with a pushed
    // filter here so both pushdowns are exercised together.
    "yf_dsv2_agg_pushdown" -> ((s, dir) =>
      Sources.stockCatalogV2(s).filter(col("Kode") < 500)
        .agg(count(lit(1)).as("n_rows"), min(col("Kode")).as("min_kode"),
          max(col("Kode")).as("max_kode"))),

    // STORAGE-PARTITIONED JOIN through the V2 catalog plugin (round 7):
    // both sides are the connector's BUCKETED layout — each scan
    // partition holds one Kode-hash bucket and reports
    // KeyGroupedPartitioning, the catalog's function catalog resolves
    // the bucket transform, and the self-join plans with ZERO exchanges
    // (SpjSpec pins the plan; this query makes the result part of the
    // driver's DuckDB gate). The aggregate keeps the verified payload
    // at one row while still consuming every joined pair.
    "yf_spj_catalog_join" -> ((s, dir) => {
      // Register the catalog plugin lazily + idempotently: catalog confs
      // resolve on first use, so the query is self-contained in any fresh
      // session (driver Verify/Bench JVMs don't pre-register it).
      if (s.conf.getOption("spark.sql.catalog.graft_cat").isEmpty)
        s.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
      val a = s.table("graft_cat.stock_catalog_bucketed")
        .select(col("Kode").as("k1"), col("Nama Perusahaan").as("name1"))
      val b = s.table("graft_cat.stock_catalog_bucketed")
        .select(col("Kode").as("k2"))
      a.join(b, col("k1") === col("k2"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("k1").cast("long")).as("kode_sum"),
          min(length(col("name1"))).as("min_name_len"),
          max(length(col("name1"))).as("max_name_len"))
    }),

    // GROUPED partial-aggregate pushdown through the engine's own DSv2
    // connector (round 7): the per-group (count, max) partials compute
    // INSIDE the stride readers — group keys lead the scan output, one
    // partial row per group per partition crosses the exchange, Spark's
    // merge aggregate re-groups (CsvCatalogSpec pins PushedGroupBy and
    // the UTF8-string-key variant). The mod-100 bucket rollup keeps the
    // verified payload small while exercising real multi-row groups.
    "yf_dsv2_grouped_agg" -> ((s, dir) =>
      Sources.stockCatalogV2(s).filter(col("Kode") < 400)
        .groupBy(col("Kode")).agg(count(lit(1)).as("n"),
          max(col("Kode")).as("mx"))
        // A second, ENGINE-side rollup over the pushed partials: buckets
        // of 100 codes — proves the pushed grouped scan composes with
        // ordinary downstream aggregation.
        .groupBy((col("Kode") % 100).as("bucket"))
        .agg(count(lit(1)).as("n_codes"), sum(col("n")).as("n_rows"),
          max(col("mx")).as("max_kode"))
        .orderBy("bucket")),

    // DSv2 SINK round-trip (round 6): the V2 two-phase write commit —
    // task-private temp files, driver-side rename of the winning
    // attempts, marker-last visibility (sources/CsvSink.scala; CsvSinkSpec
    // pins append/truncate/temp-hygiene) — exercised end-to-end: the
    // pushed-filter V2 READ feeds the V2 WRITE, the committed files are
    // read back, and the aggregate must match the oracle's direct view
    // of the same slice. Proves the engine's connector boundary works in
    // BOTH directions.
    "yf_dsv2_sink_roundtrip" -> ((s, dir) => {
      val out = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), "graft_csv_sink")
      Sources.stockCatalogV2(s).filter(col("Kode") < 300)
        .write.format("graft.sources.CsvSink")
        .option("path", out.toString).mode("overwrite").save()
      s.read.schema("Kode INT, `Nama Perusahaan` STRING").csv(out.toString)
        .agg(count(lit(1)).as("n_rows"), min(col("Kode")).as("min_kode"),
          max(col("Kode")).as("max_kode"), sum(col("Kode")).as("kode_sum"))
    }),

    // Bucketed co-located join (the 100 TB join strategy SCALE.md names):
    // both sides bucketed+sorted on the join key at WRITE time, so the
    // join itself needs no exchange on either side — the shuffle is paid
    // once and amortized over every future join. BucketSpec asserts the
    // exchange-free plan; this entry proves the results correct against
    // a plain-join oracle.
    "bucketed_join" -> ((s, dir) => {
      // The warehouse directory outlives the in-memory catalog across
      // sessions: a fresh session sees no table but the location still
      // exists (LOCATION_ALREADY_EXISTS). Drop both halves explicitly.
      dropManagedTable(s, "graft_orders_bucketed")
      dropManagedTable(s, "graft_lineitem_bucketed")
      // One year's slice: the bucketing mechanics (write-time shuffle,
      // exchange-free join) are identical, the per-call write cost stays
      // bounded at bench SF. Oracle applies the same filters.
      // repartition ON THE BUCKET KEY before writing: without it every
      // input partition writes a file per bucket (tasks x buckets small
      // files — the classic bucketed-write file explosion); aligned, each
      // task owns whole buckets and file count == bucket count.
      Sources.orders(s, dir)
        .filter(year(col("o_orderdate")) === 1995)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .repartition(8, col("o_orderkey"))
        .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_orders_bucketed")
      Sources.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01") && col("l_shipdate") < lit("1996-01-01"))
        .select("l_orderkey", "l_extendedprice")
        .repartition(8, col("l_orderkey"))
        .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_lineitem_bucketed")
      s.table("graft_lineitem_bucketed")
        .join(s.table("graft_orders_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
          count(lit(1)).as("n_items"),
          util.Stable.exactSum(col("l_extendedprice")).as("sum_price"))
        .orderBy("o_custkey")
    }),

    // K2 multi-sink round trip (yfinance_transform.py:125-137): day raw +
    // month/year rollups APPENDED into one partitioned dataset
    // discriminated by agg_type, then read back (mergeSchema — the
    // branches are schema-heterogeneous like the reference's mixed Mongo
    // documents) and summarized per branch. Restricted to symbol < 100 so
    // the sink exercise stays write-bounded at bench SF.
    "yf_multi_sink" -> ((s, dir) => {
      val out = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), "graft_multi_sink")
      val fs = out.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(out)) fs.delete(out, true) // append sink: start clean
      // coalesce: 60k rows don't need 32 writer tasks x 3 branches worth
      // of files (small-file hygiene; at 100 TB you'd size writer tasks to
      // target file size the same way).
      yf.Ohlcv.writeAll(
        Sources.ohlcv(s, dir).filter(col("symbol") < 100).coalesce(8),
        out.toString)
      s.read.option("mergeSchema", "true").parquet(out.toString)
        .groupBy("agg_type")
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("period_key")).as("n_periods"))
        .orderBy("agg_type")
    }),

    // JSONL SOURCE round-trip (engine surface): write the events table
    // as JSON-lines (the interchange format every scraped-corpus drop
    // arrives in — and the closest analog of the reference's
    // Mongo-document shape), then read it back with an EXPLICIT schema
    // (schema-on-read discipline: no inference pass over 100 TB) and
    // aggregate. The oracle computes the same aggregate straight from
    // parquet, so a hash match proves the JSON encode→decode preserved
    // every row and type exactly. All values are integer-typed before
    // the trip (ts already nanos; value quantized to 1e-8 longs) so no
    // float rendering is on the wire.
    "events_jsonl_roundtrip" -> ((s, dir) => {
      val out = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), "graft_events_jsonl")
      Sources.events(s, dir)
        // The wire contract is BIGINT nanos: Sources.events already
        // guarantees it, but the cast makes the JSONL schema explicit on
        // the write side too — a future ts-type drift fails HERE, loudly,
        // instead of surfacing as nulls on the schema'd read-back.
        .select(col("event_id"), col("ts").cast("long").as("ts"),
          col("user_id"), col("event_type"),
          floor(col("value") * 1e8 + 0.5).cast("long").as("value_q8"))
        .coalesce(8)
        .write.mode("overwrite").json(out.toString)
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value_q8", LongType)))
      s.read.schema(schema).json(out.toString)
        .groupBy("event_type")
        // The wire carries full nanos (lossless long round-trip); the
        // VERIFIED aggregate truncates to µs because DuckDB timestamps
        // are µs-resolution — same ts ⇔ epoch_us convention as every
        // other events oracle.
        .agg(count(lit(1)).as("n_events"), sum(col("value_q8")).as("sum_value_q8"),
          min(expr("ts DIV 1000")).as("min_ts_us"), max(expr("ts DIV 1000")).as("max_ts_us"),
          sum(col("user_id")).as("user_id_sum"))
        .orderBy("event_type")
    }),

    // DEAD-LETTER ingest (round 6, the robustness half of schema-on-read):
    // real corpus drops arrive with malformed lines, and at 100 TB the
    // contract is ROUTE, never crash and never silently drop — good rows
    // flow on, bad raw lines land in a quarantine output with full
    // accounting. PERMISSIVE parse captures failed lines in
    // _corrupt_record; ten deterministic corrupt lines are injected
    // alongside the JSONL events so the oracle knows exactly what the
    // quarantine must hold. (The parsed frame is materialized first:
    // Spark disallows filtering raw file reads on the corrupt column
    // alone — SPARK-21610's documented cache workaround, which is also
    // the right plan shape: one parse pass feeding both routes.)
    "events_jsonl_badrows" -> ((s, dir) => {
      val out = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), "graft_jsonl_badrows")
      val fsys = out.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(out)) fsys.delete(out, true)
      Sources.events(s, dir)
        .select(col("event_id"), col("ts").cast("long").as("ts"), col("user_id"),
          col("event_type"), floor(col("value") * 1e8 + 0.5).cast("long").as("value_q8"))
        .coalesce(4)
        .write.json(out.toString)
      import s.implicits._
      (0 until 10).map(k => s"""{"event_id": not-json-$k""").toDF("value")
        .coalesce(1).write.mode("append").text(out.toString)
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value_q8", LongType),
        StructField("_corrupt_record", StringType)))
      val parsed = graft.util.Views.materialize(
        s.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(out.toString))
      val good = parsed.filter(col("_corrupt_record").isNull)
      val bad = parsed.filter(col("_corrupt_record").isNotNull)
      good.agg(
          count(lit(1)).as("n_good"),
          sum(col("value_q8")).as("sum_value_q8"),
          sum(col("user_id")).as("user_id_sum"))
        .crossJoin(bad.agg(
          count(lit(1)).as("n_bad"),
          // The quarantine keeps the RAW lines: checksum them so silent
          // truncation of the dead-letter payload would hash-mismatch.
          sum(conv(substring(md5(col("_corrupt_record").cast("binary")), 1, 10),
            16, 10).cast("long")).as("bad_sum40")))
    }),

    // Partition-pruned read-back of ONE branch of the multi-sink (the
    // reference's per-collection read, yfinance_transform.py:131-137):
    // explicit branch schema + agg_type filter → the scan lists and reads
    // ONLY the month branch's files (PartitionFilters, no mergeSchema
    // full scan — SinkSpec asserts the plan; SCALE.md "Sinks").
    "yf_sink_pruned" -> ((s, dir) => {
      val out = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), "graft_sink_pruned")
      val fs = out.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(out)) fs.delete(out, true) // append sink: start clean
      val bars = Sources.ohlcv(s, dir).filter(col("symbol") < 100).coalesce(8)
      yf.Ohlcv.writeAll(bars, out.toString)
      val monthSchema = yf.Ohlcv.aggregatePeriod(bars, "yyyy-MM", "month").schema
      yf.Ohlcv.readBranch(s, out.toString, monthSchema, "month")
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("period_key")).as("n_periods"),
          sum(col("row_count")).as("sum_bars"))
    }),

    // Count action as a 1-row DataFrame (idx_transform.py:314,
    // yfinance_transform.py:141).
    "yf_count" -> ((s, dir) =>
      Sources.ohlcv(s, dir).agg(count(lit(1)).as("n_rows"))),

    // Distinct aggregation (engine surface beyond the reference):
    // per-month distinct symbol count — plans as a two-phase distinct
    // aggregate (partial dedup before the shuffle).
    "yf_distinct_symbols" -> ((s, dir) =>
      yf.Ohlcv.withPeriodKey(Sources.ohlcv(s, dir), "yyyy-MM")
        .groupBy("period_key")
        .agg(
          countDistinct(col("symbol")).as("n_symbols"),
          count(lit(1)).as("n_bars"))
        .orderBy("period_key")),

    // Salted two-phase aggregation (hot-key skew guard): the month key is
    // genuinely hot (~83 groups for the whole table), so phase 1 spreads
    // each month over 16 salt buckets, phase 2 merges 16 partials per
    // month. Results are identical to the direct groupBy — the oracle is
    // the plain unsalted SQL.
    "yf_salted_month_agg" -> ((s, dir) => {
      val bars = yf.Ohlcv.withPeriodKey(Sources.ohlcv(s, dir), "yyyy-MM")
      util.Salt.saltedAgg(bars, Seq("period_key"), col("symbol"), 16, Seq(
        (count(lit(1)).as("n_bars"),
          sum(col("n_bars")).as("n_bars")),
        (sum(col("Volume").cast(util.Stable.MoneyDec)).as("sum_volume"),
          sum(col("sum_volume")).cast("double").as("sum_volume")),
        (max(col("High")).as("max_high"),
          max(col("max_high")).as("max_high")),
        (min(col("Low")).as("min_low"),
          min(col("min_low")).as("min_low"))))
        .orderBy("period_key")
    }),

    // ROLLUP (engine surface): year → (year, month) → grand-total in one
    // pass via Catalyst's Expand operator, with grouping() flags
    // disambiguating real NULLs from subtotal rows.
    "yf_rollup" -> ((s, dir) => {
      val bars = Sources.ohlcv(s, dir)
        .withColumn("y", year(col("Date")))
        .withColumn("m", month(col("Date")))
      bars.rollup("y", "m")
        .agg(
          count(lit(1)).as("n_bars"),
          util.Stable.exactSum(col("Volume")).as("sum_volume"),
          grouping(col("y")).cast("int").as("g_y"),
          grouping(col("m")).cast("int").as("g_m"))
        .orderBy(col("g_y"), col("g_m"), col("y"), col("m"))
    }),

    // UNPIVOT / melt (engine surface): wide OHLC columns → long
    // (metric, value) rows via the native `unpivot` (an Expand node —
    // row-local, no shuffle, no four-scan union), then one keyed
    // aggregate. The wide→long reshape every feature store and plotting
    // layer runs; the oracle replays it as an explicit UNION ALL, so
    // the hash match proves Expand's 4-way fanout loses nothing.
    "yf_unpivot" -> ((s, dir) =>
      Sources.ohlcv(s, dir)
        .select(col("symbol"), col("Open"), col("High"), col("Low"), col("Close"))
        .unpivot(
          ids = Array(col("symbol")),
          values = Array(col("Open"), col("High"), col("Low"), col("Close")),
          variableColumnName = "metric",
          valueColumnName = "value")
        .withColumn("metric", lower(col("metric")))
        .groupBy("symbol", "metric")
        .agg(count(lit(1)).as("n_bars"),
          util.Stable.exactSum(col("value")).as("sum_value"))
        .orderBy("symbol", "metric")),

    // PER-KEY top-k via the engine's own whole-operator plan node
    // (design-rule tier c: custom LogicalPlan + Strategy + SparkPlan,
    // registered through GraftExtensions): bounded k-row heaps per key,
    // two-phase like an aggregate — the shuffle moves at most k rows per
    // (key, map task) instead of every row, and no per-key sort ever
    // materializes. The window row_number form is the oracle.
    "top_orders_per_customer" -> ((s, dir) =>
      plans.TopK.perKey(
        Sources.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice"),
        keyCols = Seq("o_custkey"),
        orderBy = Seq("o_totalprice" -> false, "o_orderkey" -> true),
        k = 3)
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))),

    // The SAME per-key top-k written the way every user writes it — a
    // row_number window + rank filter — executed through the bounded-
    // heap operator by the WindowTopKRewrite optimizer rule (tier c
    // extension, now TRANSPARENT: nobody has to know the operator
    // exists). Identical oracle as the explicit form; the spec asserts
    // TopKPerKeyExec is in this plan.
    "top_orders_per_customer_auto" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Sources.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .drop("rn")
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
    }),

    // RANK-WITH-TIES top-k per key (rank() <= k keeps boundary ties),
    // COMPOSED from the custom operator instead of a new exec: rank <= k
    // iff value >= the k-th best ROW's value, so the per-key threshold is
    // min(top-k rows' value) from TopKPerKey (k rows per key cross the
    // exchange), and the fact side joins the tiny threshold table on the
    // same key and filters. No window ever ships the full table; ties at
    // the boundary survive exactly as rank() defines. Oracle = the
    // QUALIFY rank() window form.
    "top_orders_per_customer_ties" -> ((s, dir) => {
      val o = Sources.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val thresholds = plans.TopK.perKey(
        o.select("o_custkey", "o_totalprice"),
        keyCols = Seq("o_custkey"),
        orderBy = Seq("o_totalprice" -> false), k = 3)
        .groupBy("o_custkey").agg(min(col("o_totalprice")).as("th"))
      o.join(thresholds, "o_custkey")
        .filter(col("o_totalprice") >= col("th"))
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
    }),

    // GAPS-AND-ISLANDS (engine surface): per-user consecutive-day
    // activity streaks — the classic lag + running-sum segmentation. All
    // windows partitioned by user (no global ordering), day math on
    // exact integer nanos. Output is the per-user streak audit
    // (n_streaks, longest streak, active days).
    "events_user_streaks" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("day_idx")
      val days = Sources.events(s, dir)
        .select(col("user_id"), expr("ts DIV 86400000000000").as("day_idx"))
        .distinct()
      days
        .withColumn("is_new",
          when(col("day_idx") - lag(col("day_idx"), 1).over(w) === 1L, 0L)
            .otherwise(1L))
        .withColumn("streak_id",
          sum(col("is_new")).over(w.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy("user_id", "streak_id")
        .agg(count(lit(1)).as("streak_days"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_streaks"),
          max(col("streak_days")).as("longest_streak"),
          sum(col("streak_days")).as("active_days"))
        .orderBy("user_id")
    }),

    // Sort + limit (engine surface, SURVEY.md §2.8): top-k by price —
    // plans as TakeOrderedAndProject (per-partition top-k, then merge;
    // no global sort materialization). Tie-broken for determinism.
    "top_orders" -> ((s, dir) =>
      Sources.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)),

    // Engine surface beyond the reference (SURVEY.md §2.4): filter +
    // projection — both must reach the parquet scan (pushdown/pruning).
    "filter_project" -> ((s, dir) =>
      Sources.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01") && col("l_shipdate") < lit("1996-01-01"))
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy("l_orderkey", "l_linenumber")),

    // Referential-integrity audit across every declared FK relationship —
    // the pre-publish data-quality gate. Each relationship is one anti
    // join on the child's projected FK column (8 bytes/row shuffled, not
    // the row); bounded catalogs (nation, region) broadcast so their
    // children shuffle nothing. The union is of 7 one-row aggregates,
    // never of raw tables (graft.util.Audit).
    "data_ri_audit" -> ((s, dir) => {
      import util.Audit.orphanCount
      val li = Sources.lineitem(s, dir); val o = Sources.orders(s, dir)
      val c = Sources.customer(s, dir); val su = Sources.supplier(s, dir)
      val p = Sources.part(s, dir); val n = Sources.nation(s, dir)
      val r = Sources.region(s, dir)
      Seq(
        orphanCount("customer->nation", c, "c_nationkey", n, "n_nationkey",
          broadcastParent = true),
        orphanCount("lineitem->orders", li, "l_orderkey", o, "o_orderkey"),
        orphanCount("lineitem->part", li, "l_partkey", p, "p_partkey"),
        orphanCount("lineitem->supplier", li, "l_suppkey", su, "s_suppkey"),
        orphanCount("nation->region", n, "n_regionkey", r, "r_regionkey",
          broadcastParent = true),
        orphanCount("orders->customer", o, "o_custkey", c, "c_custkey"),
        orphanCount("supplier->nation", su, "s_nationkey", n, "n_nationkey",
          broadcastParent = true)
      ).reduce(_.unionByName(_)).orderBy("rel")
    }),

    // Union multiplex (SURVEY.md §2.8): the reference's 4-collection IDX
    // loop read as one unioned frame, rolled up per year.
    "idx_union_years" -> ((s, dir) => {
      val o = Sources.orders(s, dir).withColumn("year", year(col("o_orderdate")))
      val years = Seq(1995, 1996, 1997)
      years.map(y => o.filter(col("year") === y))
        .reduce(_.unionByName(_))
        .groupBy("year")
        .agg(count(lit(1)).as("n_orders"), util.Stable.exactSum(col("o_totalprice")).as("sum_price"))
        .orderBy("year")
    }),

    // IQPLUS pipeline (U1-U3 + W2): deterministic extractive split-merge
    // summarizer UDF + pinned 1-based index. The summary STRING itself is
    // oracle-checked: the DuckDB mirror replays sentence scoring, greedy
    // pick and original-order reassembly as recursive CTEs
    // (Summarize.summarizeLongTextCtes) — an independent implementation
    // of the same state machines.
    "news_summarize" -> ((s, dir) =>
      news.Summarize.transform(Sources.news(s, dir)).orderBy("index")),

    // Chunking surface (U1) on synthesized long sentence-structured text
    // (testdata docs are short and dot-free): ~20x repetition pushes docs
    // past the 1024-token budget so the split-merge path really runs —
    // and the oracle replays the FULL long path (chunk assignment,
    // per-chunk 512/30 summaries, merge, 250/50 re-summarize) in DuckDB.
    "news_chunking" -> ((s, dir) => {
      val docs = Sources.documents(s, dir)
        .withColumn("long_text",
          regexp_replace(concat_ws(". ", (0 until 20).map(_ => col("text")): _*),
            " the ", ". "))
      docs.select(
        col("doc_id"),
        news.Summarize.tokenCountUdf(col("long_text")).as("n_tokens"),
        news.Summarize.chunkCountUdf(col("long_text")).as("n_chunks"),
        news.Summarize.tokenCountUdf(news.Summarize.summarizeUdf(col("long_text")))
          .as("n_summary_tokens"))
        .orderBy("doc_id")
    }),

    // Oracle-checked half of the U1 chunking surface: token count +
    // greedy-packing chunk count per doc (the summarizer itself stays
    // rows-only — not SQL-expressible). The DuckDB oracle REPLAYS the
    // greedy fold as a recursive CTE, an independent implementation of
    // the same state machine (quirks included).
    "news_chunk_counts" -> ((s, dir) => {
      val docs = Sources.documents(s, dir)
        .withColumn("long_text",
          regexp_replace(concat_ws(". ", (0 until 20).map(_ => col("text")): _*),
            " the ", ". "))
      docs.select(
        col("doc_id"),
        news.Summarize.tokenCountUdf(col("long_text")).cast("long").as("n_tokens"),
        news.Summarize.chunkCountUdf(col("long_text")).cast("long").as("n_chunks"))
        .orderBy("doc_id")
    }),

    // The SQL-expressible ENVELOPE of the U2 summarizer (the prose-
    // emitting core stays rows-only by contract): sentence count, greedy-
    // pick size under the one-shot (250, 50) budgets, and the top-ranked
    // sentence's index — driven by the summarizer's own ranking/pick
    // functions, replayed independently in DuckDB (scoring joins + a
    // recursive-CTE greedy fold). Shrinks the rows-only set to the
    // BART-shaped core.
    "news_summary_stats" -> ((s, dir) =>
      Sources.documents(s, dir)
        .withColumn("dotted", expr("replace(text, ' the ', '. ')"))
        .select(col("doc_id"),
          news.Summarize.summaryStatsUdf(col("dotted")).as("st"))
        .select(col("doc_id"),
          col("st.n_sentences").as("n_sentences"),
          col("st.n_summary_sentences").as("n_summary_sentences"),
          col("st.top_sentence_idx").as("top_sentence_idx"))
        .orderBy("doc_id")),

    // SQL-expressible text stats (SURVEY.md §5.1): char/word/sentence
    // counts via higher-order functions, checked against DuckDB.
    "news_text_stats" -> ((s, dir) =>
      Sources.documents(s, dir)
        .withColumn("dotted", expr("replace(text, ' the ', '. ')"))
        .select(
          col("doc_id"),
          length(col("text")).cast("long").as("len_text"),
          size(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+")).cast("long").as("n_words"),
          size(filter(split(col("dotted"), "\\."),
            x => trim(x) =!= "")).cast("long").as("n_sentences"))
        .orderBy("doc_id")),

    // Corpus vocabulary (training-data extension): per-word document
    // frequency + occurrence count, top-k by df. One shuffle on the word
    // key with partial aggregation; the top-k is TakeOrderedAndProject
    // (per-partition heads, k-row driver merge) — never a global sort.
    "text_vocab" -> ((s, dir) => {
      val words = Sources.documents(s, dir)
        .select(col("doc_id"),
          explode(split(util.Norm.normalize(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
      words.groupBy("word")
        .agg(
          count(lit(1)).as("n_occurrences"),
          countDistinct(col("doc_id")).as("df"))
        .orderBy(col("df").desc, col("word"))
        .limit(100)
    }),

    // Anti-join (engine surface): users who clicked but never made a
    // high-value purchase — plans as a broadcast/shuffled ANTI join (the
    // excluded side never materializes beyond its keys). The value
    // threshold keeps the right side selective so the anti-join survives
    // rows (every user has every event type in the synthetic data).
    "events_anti_join" -> ((s, dir) => {
      val ev = Sources.events(s, dir)
      val clickers = ev.filter(col("event_type") === "click")
        .groupBy("user_id").agg(count(lit(1)).as("n_clicks"))
      val bigSpenders = ev
        .filter(col("event_type") === "purchase" && col("value") > 95.0)
        .select("user_id").distinct()
      clickers.join(bigSpenders, Seq("user_id"), "left_anti")
        .orderBy("user_id")
    }),

    // Exact quantiles (engine surface): per-type p50/p95 of value.
    // Spark `percentile` is the exact sort-based aggregate (the
    // approx_percentile sketch is the at-scale alternative when a full
    // sort per group is too dear); DuckDB mirrors with quantile_cont.
    // Interpolated values are sig-formatted — the two engines' linear
    // interpolation can differ in the last ulp.
    "events_quantiles" -> ((s, dir) =>
      Sources.events(s, dir)
        .groupBy("event_type")
        .agg(
          util.Stable.sig(expr("percentile(value, 0.5D)")).as("p50"),
          util.Stable.sig(expr("percentile(value, 0.95D)")).as("p95"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")),

    // Approximate quantiles — the at-scale alternative to the exact
    // sort-per-group percentile above. The GK sketch's rank-error
    // guarantee (ε = 1/accuracy) is ENFORCED in the query itself: the
    // approx result's true rank is counted against the corpus and
    // assert_true fails the query if it falls outside the bound, so every
    // verified run re-proves the error bound; the emitted columns are the
    // exact percentiles, oracle-checked as usual (the sketch value itself
    // is engine-specific — not comparable cross-engine).
    "events_quantiles_approx" -> ((s, dir) => {
      val acc = 1000
      val ev = Sources.events(s, dir)
      val stats = ev.groupBy("event_type").agg(
        expr(s"approx_percentile(value, 0.5D, $acc)").as("ap50"),
        expr(s"approx_percentile(value, 0.95D, $acc)").as("ap95"),
        expr("percentile(value, 0.5D)").as("p50x"),
        expr("percentile(value, 0.95D)").as("p95x"),
        count(lit(1)).as("n_events"))
      val ranks = ev
        .join(broadcast(stats.select("event_type", "ap50", "ap95")), "event_type")
        .groupBy("event_type").agg(
          sum(when(col("value") <= col("ap50"), 1L).otherwise(0L)).as("r50"),
          sum(when(col("value") <= col("ap95"), 1L).otherwise(0L)).as("r95"))
      def guarded(r: org.apache.spark.sql.Column, q: Double,
                  out: org.apache.spark.sql.Column) =
        when(assert_true(
          abs(r - lit(q) * col("n_events")) <= col("n_events") * 2.0 / acc + 2,
          lit(s"approx_percentile($q) outside the GK rank-error bound")).isNull,
          out)
      stats.join(ranks, "event_type")
        .select(col("event_type"),
          guarded(col("r50"), 0.5, util.Stable.sig(col("p50x"))).as("p50"),
          guarded(col("r95"), 0.95, util.Stable.sig(col("p95x"))).as("p95"),
          col("n_events"))
        .orderBy("event_type")
    }),

    // Exact dedup (training-data extension): normalize → md5 fingerprint
    // → hash group-by. One shuffle on a fixed-width key at any scale.
    "dedup_exact" -> ((s, dir) =>
      dedup.Dedup.exactGroups(
        dedup.Dedup.augmented(Sources.documents(s, dir)), "doc_id", "text")
        .orderBy("fingerprint")),

    // n-gram Jaccard near-dedup via the explode→join→count pattern —
    // docs sharing zero shingles never meet (no cartesian product).
    // DIAGNOSTIC FORM, not the scale path: with no df cap and no
    // candidate restriction, one boilerplate shingle shared by k docs
    // contributes k(k-1)/2 join rows. At corpus scale use
    // `dedup_jaccard_capped` (mandatory skew guard) or the LSH pipeline;
    // this entry exists as the exact-recall baseline those are judged
    // against (SCALE.md "Deduplication").
    "dedup_jaccard_pairs" -> ((s, dir) =>
      dedup.Dedup.jaccardPairs(
        dedup.Dedup.augmented(Sources.documents(s, dir)), "doc_id", "text", 0.6)
        .orderBy("id_a", "id_b")),

    // Jaccard with a shingle document-frequency cap — the skew guard that
    // keeps a boilerplate n-gram shared by k docs from contributing
    // k(k-1)/2 join rows; at corpus scale this is what makes the shingle
    // join survive hot keys.
    "dedup_jaccard_capped" -> ((s, dir) =>
      dedup.Dedup.jaccardPairs(
        dedup.Dedup.augmented(Sources.documents(s, dir)), "doc_id", "text", 0.5,
        maxDocFreq = Some(10L))
        .orderBy("id_a", "id_b")),

    // Overlap-coefficient (containment) near-dedup: |A∩B|/min(|A|,|B|) —
    // the subset-duplication detector Jaccard structurally misses (a doc
    // quoted whole inside a much longer one has overlap 1.0 but Jaccard
    // → 0 as the length ratio grows; the augmented fixture's junk-tail
    // variants are exactly this shape). Same explode→join→count plan and
    // df-cap skew guard as the Jaccard tier; only the finalizer differs.
    "dedup_overlap_pairs" -> ((s, dir) =>
      dedup.Dedup.overlapPairs(
        dedup.Dedup.augmented(Sources.documents(s, dir)), "doc_id", "text", 0.9,
        maxDocFreq = Some(10L))
        .orderBy("id_a", "id_b")),

    // Duplicate clusters: connected components of the (df-capped) Jaccard
    // pair graph via iterative min-label propagation — diameter-bounded
    // rounds of join+aggregate, driver controls iteration only. Completes
    // the dedup pipeline: pairs -> clusters -> canonical survivor
    // (is_canonical = doc is its cluster's min id). Oracle = DuckDB
    // RECURSIVE CTE transitive closure (independent algorithm, same
    // unique fixpoint).
    "dedup_clusters" -> ((s, dir) => {
      val docs = dedup.Dedup.augmented(Sources.documents(s, dir))
      val pairs = dedup.Dedup.jaccardPairs(docs, "doc_id", "text", 0.6,
        maxDocFreq = Some(10L))
      dedup.Dedup.clusters(docs, "doc_id", pairs)
        .withColumn("is_canonical",
          (col("doc_id") === col("cluster_id")).cast("int"))
        .orderBy("doc_id")
    }),

    // MinHash + banded LSH with exact-Jaccard verification restricted to
    // candidate docs — the sub-quadratic scale path for near-dedup.
    "dedup_minhash_lsh" -> ((s, dir) =>
      dedup.Dedup.lshVerifiedPairs(
        dedup.Dedup.augmented(Sources.documents(s, dir)), "doc_id", "text", 0.6)
        .orderBy("id_a", "id_b")),

    // MinHash ESTIMATE-vs-EXACT audit (the sketch-quality measurement for
    // the dedup tier, like sim_ann_recall for the ANN tier): for every
    // LSH candidate pair, the signature-agreement estimate
    // (matching components / 12 — the unbiased MinHash Jaccard
    // estimator) next to the exact shingle Jaccard. This is the number
    // that justifies the band thresholds in production: est-vs-exact
    // drift says re-tune bands, not "trust the sketch". Signatures ride
    // the same md5 contract, so DuckDB recomputes them component-for-
    // component; comparisons stay on the candidate set only (never
    // all pairs).
    "dedup_minhash_estimate" -> ((s, dir) => {
      val docs = dedup.Dedup.augmented(Sources.documents(s, dir))
      val cand = graft.util.Views.materialize(
        dedup.Dedup.lshCandidates(docs, "doc_id", "text"))
      val sigs = docs.select(col("doc_id").as("id"),
        dedup.Dedup.minhashSignature(dedup.Dedup.shingles(col("text"))).as("sig"))
      val est = cand
        .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
        .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
        .withColumn("n_match",
          expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), b -> b))"))
      val exact = dedup.Dedup.jaccardPairs(docs, "doc_id", "text", 0.0, Some(cand))
      est.join(exact, Seq("id_a", "id_b"))
        .select(col("id_a"), col("id_b"), col("n_match"),
          (col("n_match") / lit(12.0)).as("est_jaccard"), col("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // FUZZY matching by EDIT DISTANCE, candidate-restricted: levenshtein
    // is O(len²) PER PAIR, so it must never see all pairs — the LSH
    // bands generate the candidates (sub-quadratic) and the distance
    // scores only those, on an 80-char normalized prefix that bounds the
    // per-pair cost. The alternative verification metric to Jaccard for
    // near-identical prose (char-level edits that barely move shingle
    // sets). Both engines implement standard unit-cost levenshtein.
    "dedup_fuzzy_editdist" -> ((s, dir) => {
      val docs = dedup.Dedup.augmented(Sources.documents(s, dir))
      val cand = dedup.Dedup.lshCandidates(docs, "doc_id", "text")
      val t = docs.select(col("doc_id"),
        substring(util.Norm.normalize(col("text")), 1, 80).as("prefix"))
      cand
        .join(t.select(col("doc_id").as("id_a"), col("prefix").as("pa")), "id_a")
        .join(t.select(col("doc_id").as("id_b"), col("prefix").as("pb")), "id_b")
        .withColumn("editdist", levenshtein(col("pa"), col("pb")))
        .filter(col("editdist") <= 20)
        .select("id_a", "id_b", "editdist")
        .orderBy("id_a", "id_b")
    }),

    // The CLOSED 100 TB dedup pipeline (SCALE.md "Deduplication"): LSH
    // candidates → exact-Jaccard-verified pairs → connected-component
    // clusters — every stage sub-quadratic (banded candidate equi-join,
    // candidate-restricted verification, label propagation over the
    // duplicate graph only). `dedup_clusters` above builds from
    // capped-Jaccard pairs; this entry is the advertised end-to-end LSH
    // path, against the same RECURSIVE-CTE closure oracle.
    "dedup_clusters_lsh" -> ((s, dir) => {
      val docs = dedup.Dedup.augmented(Sources.documents(s, dir))
      val pairs = dedup.Dedup.lshVerifiedPairs(docs, "doc_id", "text", 0.6)
      dedup.Dedup.clusters(docs, "doc_id", pairs)
        .withColumn("is_canonical",
          (col("doc_id") === col("cluster_id")).cast("int"))
        .orderBy("doc_id")
    }),

    // Cluster CANONICALIZATION — the step that actually shrinks the
    // corpus: per duplicate cluster keep the best doc, best = highest
    // composite quality score (doc_id tiebreak), not min-id. Quality is
    // a per-row projection over the same scan; selection runs through
    // the bounded-heap per-key operator (≤ 1 row per cluster per map
    // task reaches the exchange). Oracle = the QUALIFY window form over
    // the RECURSIVE-CTE closure.
    "dedup_survivors" -> ((s, dir) => {
      val docs = dedup.Dedup.augmented(Sources.documents(s, dir))
      val pairs = dedup.Dedup.jaccardPairs(docs, "doc_id", "text", 0.6,
        maxDocFreq = Some(10L))
      val clusters = dedup.Dedup.clusters(docs, "doc_id", pairs)
      val quality = text.TextAnalysis.qualityScore(docs, "doc_id", "text")
        .select(col("doc_id"), col("quality_score"))
      plans.TopK.perKey(clusters.join(quality, "doc_id"),
        keyCols = Seq("cluster_id"),
        orderBy = Seq("quality_score" -> false, "doc_id" -> true), k = 1)
        .select("cluster_id", "doc_id", "quality_score")
        .orderBy("cluster_id")
    }),

    // Semi-structured extraction: the events props column is a JSON
    // string; from_json with an explicit schema parses it executor-side
    // (codegen'd Jackson, no UDF), the standard shape for metadata-bearing
    // training-data rows.
    "events_json_extract" -> ((s, dir) =>
      Sources.events(s, dir)
        .withColumn("k",
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          util.Stable.exactSum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"))
        .orderBy("event_type")),

    // VARIANT semi-structured extraction (Spark 4's open-schema type —
    // the schema-on-DEMAND complement of from_json's schema-on-read
    // above): props parses ONCE into a binary variant value, and each
    // path extraction is a typed variant_get — no per-path reparse, no
    // up-front StructType, exactly how heterogeneous metadata columns
    // are handled at lake scale (fields can come and go per row without
    // schema migration). try_variant_get on an absent path must yield
    // NULL (pinned by n_missing_nonnull = 0, a count over those nulls).
    // Oracle = DuckDB's independent JSON path extraction.
    "events_variant_extract" -> ((s, dir) =>
      Sources.events(s, dir)
        .withColumn("v", parse_json(col("props")))
        .withColumn("k", expr("variant_get(v, '$.k', 'int')"))
        .withColumn("miss", expr("try_variant_get(v, '$.missing', 'int')"))
        .groupBy(expr("CAST(k div 10 AS BIGINT)").as("k_bucket"))
        .agg(count(lit(1)).as("n_events"),
          util.Stable.exactSum(col("value")).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"),
          count(col("miss")).as("n_missing_nonnull"))
        .orderBy("k_bucket")),

    // NULL-SAFE equi-join (engine surface): `<=>` ⇔ DuckDB's
    // IS NOT DISTINCT FROM. The key deliberately manufactures NULLs
    // (k % 7 = 0 → NULL) so the null-key class must MATCH across sides
    // — the semantics a plain `=` join silently drops. Still a hash-
    // partitionable equi-join (NULL hashes to one reducer like any
    // other key value); both sides pre-aggregate to key grain first so
    // the join carries one row per class, not the fact table.
    "events_null_safe_join" -> ((s, dir) => {
      val k = from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k")
      def side(t: String) = Sources.events(s, dir)
        .filter(col("event_type") === t)
        .select(nullif(k % 7, lit(0)).as("knull"))
        .groupBy("knull").agg(count(lit(1)).as(s"n_$t"))
      val l = side("click"); val r = side("view")
      // Under `<=>` the NULL class lands as ONE row with BOTH counts
      // populated (a plain `=` full outer would emit two half-rows);
      // NullSafeJoinSpec pins exactly that difference.
      l.join(r, l("knull") <=> r("knull"), "full_outer")
        .select(coalesce(l("knull"), r("knull")).as("k_class"),
          col("n_click"), col("n_view"))
        .orderBy(col("k_class"))
    }),

    // PIVOT (engine surface): per-user event-type counts as columns, with
    // the pivot value list pinned explicitly so the output schema is
    // deterministic (no extra distinct pass, stable column order).
    "events_pivot" -> ((s, dir) =>
      Sources.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy("user_id")),

    // CUBE grouping sets (engine surface): all four aggregation grains of
    // (event_type, day-of-week) in ONE pass through Catalyst's Expand —
    // the input scans once and each row fans into its 4 grouping sets as
    // map-side partials; a naive UNION of 4 groupBys would scan 4×.
    // Day-of-week is pure integer nano math (never a locale-dependent
    // date_format), grouping() flags disambiguate subtotal rows, and the
    // flag-major ORDER BY keeps NULL subtotal keys out of any mixed sort
    // group (Spark sorts NULLS FIRST, DuckDB NULLS LAST — flags make the
    // difference unobservable).
    "events_cube" -> ((s, dir) =>
      Sources.events(s, dir)
        .select(col("event_type"),
          expr("(ts DIV 86400000000000) % 7").as("dow"), col("value"))
        .cube("event_type", "dow")
        .agg(
          count(lit(1)).as("n_events"),
          util.Stable.exactSum(col("value")).as("sum_value"),
          grouping(col("event_type")).cast("int").as("g_type"),
          grouping(col("dow")).cast("int").as("g_dow"))
        .orderBy(col("g_type"), col("g_dow"), col("event_type"), col("dow"))),

    // Key-distribution SKEW diagnostics (operational surface): the
    // pre-flight a 100 TB job runs before choosing join/agg strategy —
    // per-key cardinalities reduced to one row of shuffle-planning
    // signals (max/avg partition pressure, heavy-key share). Two keyed
    // aggregates with map-side partials; nothing driver-side. The skew
    // ratio max/avg is what decides salting (util/Salt.scala) vs a plain
    // hash partition; the top-1 share is the broadcast-threshold signal.
    "events_key_skew" -> ((s, dir) => {
      val perKey = Sources.events(s, dir)
        .groupBy("user_id").agg(count(lit(1)).as("cnt"))
      perKey.agg(
        count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("n_rows"),
        max(col("cnt")).as("max_key_rows"),
        min(col("cnt")).as("min_key_rows"))
        .withColumn("avg_key_rows",
          col("n_rows").cast("double") / col("n_keys"))
        .withColumn("skew_ratio",
          col("max_key_rows").cast("double") / col("avg_key_rows"))
    }),

    // Z-ORDER data layout (write-path surface): the multi-dimensional
    // clustering key for parquet data-skipping. Interleaving the bits of
    // (user_id, day) makes rows close in EITHER dimension land in the
    // same z-range, so a layout of repartitionByRange(z) +
    // sortWithinPartitions(z) gives every file a tight min/max envelope
    // on BOTH columns — a filter on either one prunes row groups, where
    // a single-column sort only prunes its own. The query materializes
    // the proof: per coarse z-tile (z >> 8, i.e. dropping 4 low bits of
    // each dimension), the 2-D bounding box — every tile covers at most
    // a 16×16 rectangle of the (user, day) plane, not the whole plane. A
    // bit-spread is pure integer arithmetic (the classic mask ladder),
    // identical in both engines.
    "events_zorder" -> ((s, dir) => {
      def spread(c: org.apache.spark.sql.Column) = {
        val a0 = c.bitwiseAND(lit(65535L))
        val a1 = a0.bitwiseOR(shiftleft(a0, 8)).bitwiseAND(lit(0x00FF00FFL))
        val a2 = a1.bitwiseOR(shiftleft(a1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
        val a3 = a2.bitwiseOR(shiftleft(a2, 2)).bitwiseAND(lit(0x33333333L))
        a3.bitwiseOR(shiftleft(a3, 1)).bitwiseAND(lit(0x55555555L))
      }
      val ev = Sources.events(s, dir)
        .select(col("user_id").as("x"),
          expr("ts DIV 86400000000000").as("y"))
      ev.withColumn("z", spread(col("x")).bitwiseOR(shiftleft(spread(col("y")), 1)))
        .groupBy(shiftright(col("z"), 8).as("z_tile"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .orderBy("z_tile")
    }),

    // Equi-width HISTOGRAM (engine surface): the value-distribution
    // profile. Global min/max is a broadcast 1-row aggregate (no driver
    // round-trip), bucket = floor((v-min)/width) clamped to the last
    // bucket — every arithmetic step is an IEEE op on identical doubles,
    // so bucket membership is adjudicated identically cross-engine. One
    // scan + one keyed aggregate at any scale.
    "events_value_histogram" -> ((s, dir) => {
      val ev = Sources.events(s, dir).select("value")
      val stats = ev.agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"))
      ev.crossJoin(broadcast(stats))
        .withColumn("bucket",
          least(floor((col("value") - col("vmin"))
            / ((col("vmax") - col("vmin")) / 16.0)), lit(15.0)).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_values"),
          min(col("value")).as("bucket_min"),
          max(col("value")).as("bucket_max"))
        .orderBy("bucket")
    }),

    // Pearson CORRELATION per group, on EXACT integer moment sums (the
    // built-in corr aggregates doubles in partition order — not a
    // cross-engine contract; and DECIMAL products round their scale
    // differently in Spark vs DuckDB — measured 1-ulp divergence at
    // sf0.1). Correlation is scale-invariant, so x is the value
    // QUANTIZED to 1e-2 longs (floor(v*100+0.5) — pure IEEE) and y the
    // integer hour-of-day: all five moments are exact long sums (far
    // below 2^53, so their double conversions are exact), and the final
    // formula is a handful of IEEE ops on identical inputs. One
    // partial+final aggregate — five moments ride one shuffle.
    "events_type_value_corr" -> ((s, dir) => {
      val ev = Sources.events(s, dir)
        .select(col("event_type"),
          floor(col("value") * 100.0 + 0.5).cast("long").as("x"),
          expr("(ts DIV 3600000000000) % 24").as("y"))
      ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y")).as("sy"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .withColumn("corr_xy",
          (col("n").cast("double") * col("sxy") - col("sx").cast("double") * col("sy"))
            / sqrt((col("n").cast("double") * col("sxx")
                - col("sx").cast("double") * col("sx"))
              * (col("n").cast("double") * col("syy")
                - col("sy").cast("double") * col("sy"))))
        .select("event_type", "n", "corr_xy")
        .orderBy("event_type")
    }),

    // INTERSECT set op (engine surface, completing §2.8's family beside
    // union and the anti-join): users present in BOTH behavior sets.
    // Plans as a distinct-aggregated semi-join — key-restricted, never a
    // cross product.
    "events_users_intersect" -> ((s, dir) => {
      val ev = Sources.events(s, dir)
      ev.filter(col("event_type") === "click").select("user_id")
        .intersect(ev.filter(col("event_type") === "purchase").select("user_id"))
        .orderBy("user_id")
    }),

    // As-of join (operator Spark lacks natively, composed from windows —
    // design-rule tier (a)): each click gets the latest error at or
    // before it per user. The oracle runs DuckDB's NATIVE ASOF JOIN, so
    // two independent implementations check each other.
    "events_asof_join" -> ((s, dir) =>
      events.AsofJoin.lastEventBefore(Sources.events(s, dir), "click", "error")
        .orderBy("event_id")),

    // FORWARD as-of (round 7): the mirror direction — each click gets
    // the EARLIEST purchase at or after it per user ("time to next
    // conversion"). Same composed-window shape; the oracle again runs
    // DuckDB's native ASOF (with <=), so both directions are checked by
    // an independent implementation.
    "events_asof_forward" -> ((s, dir) =>
      events.AsofJoin.nextEventAfter(Sources.events(s, dir), "click", "purchase")
        .orderBy("event_id")),

    // Range join via binning (operator Spark lacks natively — composed
    // per design-rule tier (a)): purchases within 2 minutes after each
    // error, per user, as an EQUI-join on (user, time-bin) + exact BETWEEN
    // filter — never a nested loop. Oracle = DuckDB's native inequality
    // join, so two independent implementations check each other.
    "events_range_join" -> ((s, dir) =>
      events.RangeJoin.windowedMatches(Sources.events(s, dir), "error", "purchase")
        .orderBy("l_id")),

    // INTERVAL×INTERVAL overlap join (the join class with no equi key on
    // EITHER side — as-of/range joins still bin a point side): which
    // cross-user session pairs were concurrently active, rolled up to a
    // per-day concurrency audit. Plan = the bin trick (explode both
    // interval sets into hour bins → equi-join on bin → arithmetic dedup
    // at the overlap-start bin → exact closed-interval residual), never
    // a nested loop; see graft.events.IntervalOverlap for the scale
    // notes. Oracle = DuckDB's native inequality self-join over the
    // SAME sessionization, so two independent join strategies check
    // each other pair-for-pair.
    "events_interval_overlap" -> ((s, dir) => {
      val sess = events.Sessionize.sessionStats(Sources.events(s, dir))
        .select(col("user_id"), col("session_idx"),
          col("t_start_us").as("t0"), col("t_end_us").as("t1"))
      events.IntervalOverlap.overlapPairs(sess)
        .withColumn("day_idx", expr("ov_start div 86400000000"))
        .groupBy("day_idx")
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("ov_end") - col("ov_start")).as("sum_overlap_us"),
          max(col("ov_end") - col("ov_start")).as("max_overlap_us"))
        .orderBy("day_idx")
    }),

    // MARKOV transition matrix over per-user event sequences: how often
    // does type A follow type B (lag over (user, time) windows — one
    // per-user window, no global ordering), with the row-normalized
    // transition probability as one IEEE division of exact counts. The
    // n-gram-over-behavior profile every session-modeling pipeline
    // starts from; 25 output rows regardless of event volume.
    "events_type_transitions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val tr = Sources.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
      val totals = tr.groupBy("prev_type").agg(count(lit(1)).as("n_from"))
      tr.groupBy("prev_type", "event_type")
        .agg(count(lit(1)).as("n_trans"))
        .join(totals, "prev_type")
        .withColumn("p_trans", col("n_trans").cast("double") / col("n_from"))
        .orderBy("prev_type", "event_type")
    }),

    // Aggregate-function breadth: count_if / bool_and / bool_or — the
    // predicate-aggregate family (SQL:2023 names), each one map-side
    // combinable. Booleans adjudicate on raw parquet doubles (identical
    // bytes both engines); the mean is the house exact-decimal average.
    "events_agg_breadth" -> ((s, dir) =>
      Sources.events(s, dir)
        .groupBy("event_type")
        .agg(count_if(col("value") > 50.0).as("n_high"),
          bool_and(col("value") >= 0.0).as("all_nonneg"),
          bool_or(col("value") > 99.0).as("any_extreme"),
          util.Stable.exactAvg(col("value")).as("avg_value"))
        .orderBy("event_type")),

    // A/B-TEST readout (two-proportion z): deterministic hash-bucket
    // arms (user parity — production uses a salted md5, same plan),
    // conversion = purchased in the first experiment week. Exposure and
    // conversion counts are exact keyed aggregates pivoted to one row
    // by conditional sums; the z statistic is IEEE arithmetic over
    // those exact integers, with the expression tree written
    // IDENTICALLY in the oracle (each step correctly rounded ⇒
    // bit-identical). The whole readout shuffles counts, never users.
    "events_ab_test" -> ((s, dir) => {
      val ev = Sources.events(s, dir)
      val arms = ev.select(col("user_id")).distinct()
        .withColumn("arm", pmod(col("user_id"), lit(2)))
      val conv = ev
        .filter(col("event_type") === "purchase" &&
          expr("ts DIV 86400000000000").between(19723, 19729))
        .select("user_id").distinct().withColumn("converted", lit(1L))
      val wide = arms.join(conv, Seq("user_id"), "left")
        .groupBy("arm").agg(count(lit(1)).as("n_users"),
          sum(coalesce(col("converted"), lit(0L))).as("n_conv"))
        .agg(
          sum(when(col("arm") === 0, col("n_users"))).as("n0"),
          sum(when(col("arm") === 0, col("n_conv"))).as("c0"),
          sum(when(col("arm") === 1, col("n_users"))).as("n1"),
          sum(when(col("arm") === 1, col("n_conv"))).as("c1"))
      wide.select(col("n0"), col("c0"), col("n1"), col("c1"),
        (col("c0").cast("double") / col("n0")).as("p0"),
        (col("c1").cast("double") / col("n1")).as("p1"),
        ((col("c0").cast("double") / col("n0") -
          col("c1").cast("double") / col("n1")) /
          sqrt(((col("c0") + col("c1")).cast("double") / (col("n0") + col("n1")) *
            (lit(1.0) - (col("c0") + col("c1")).cast("double") / (col("n0") + col("n1")))) *
            (lit(1.0) / col("n0") + lit(1.0) / col("n1")))).as("z_score"))
    }),

    // Month-over-month GROWTH: lag over the AGGREGATED month table —
    // the window is global but its input is one row per month (the
    // reference-parity global-window caveat does not apply: a century
    // is 1 200 rows). Revenue in exact decimal; the growth ratio is
    // ((r − prev) / prev) · 100 in identical IEEE order both engines.
    "orders_monthly_growth" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val m = Sources.orders(s, dir)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n_orders"),
          util.Stable.exactSumAt(util.Stable.dec2(col("o_totalprice")), 2)
            .as("revenue"))
      val w = Window.orderBy("month")
      m.withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
        .withColumn("mom_pct",
          (col("revenue") - col("prev_revenue")) / col("prev_revenue") * 100.0)
        .orderBy("month")
    }),

    // NATIVE session_window — Spark's built-in gap-session operator
    // next to the engine's hand-built lag+running-sum sessionization
    // (events_sessionize): same 30-minute gap, aggregated to per-user
    // session counts and event totals. Semantics note pinned by the
    // oracle: session_window closes a session when the NEXT event is
    // ≥ gap after the previous (boundary-equal events merge into the
    // window [ts, ts+gap)), whereas the hand-built rule splits on
    // strictly-greater — the oracle replays the ≥ rule, so the two
    // queries also document the off-by-boundary difference between
    // the conventions. Plans as a single keyed aggregate with session
    // merging — no window function at all.
    "events_session_window_native" -> ((s, dir) => {
      val ev = Sources.events(s, dir)
        .withColumn("t", timestamp_micros(expr("ts div 1000")))
      ev.groupBy(col("user_id"), session_window(col("t"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          util.Stable.exactSum(col("value")).as("sum_value"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("n_events"),
          util.Stable.exactSum(col("sum_value")).as("sum_value"),
          max(col("n_events")).as("max_session_events"))
        .orderBy("user_id")
    }),

    // BITMAP ROLLUP (round 6, the exact-distinct acceleration pattern):
    // per-(day, bucket) user bitmaps are built ONCE from the raw events
    // (Spark's native bitmap aggregates — 32k bits per bucket row), and
    // every "distinct users in day range [a,b)" question is then
    // answered by OR-merging the tiny per-day bitmaps — the raw events
    // are never rescanned per question. At 100 TB this is the
    // materialized-rollup complement of HLL: EXACT distincts over
    // arbitrary composable slices, rollup size O(days × users/32k), and
    // the OR-merge is associative so it parallelizes like any aggregate.
    // user_id is offset by +1 on the internal path (bit positions are
    // 1-based); the emitted counts are offset-free. Oracle = direct
    // COUNT(DISTINCT) per range — the bitmap path must reproduce it
    // exactly.
    "events_bitmap_rollup" -> ((s, dir) => {
      val ev = Sources.events(s, dir).select(
        expr("ts DIV 86400000000000").as("day"),
        (col("user_id") + 1).as("uid1"))
      val daily = graft.util.Views.materialize(
        ev.groupBy(col("day"), expr("bitmap_bucket_number(uid1)").as("bucket"))
          .agg(expr("bitmap_construct_agg(bitmap_bit_position(uid1))").as("bm")))
      val ranges = Seq(("week1", 19723L, 19730L), ("week2", 19730L, 19737L),
        ("month", 19723L, 19753L))
      ranges.map { case (label, lo, hi) =>
        daily.filter(col("day") >= lo && col("day") < hi)
          .groupBy("bucket")
          .agg(expr("bitmap_or_agg(bm)").as("bm_merged"))
          // coalesce: an EMPTY range sums zero groups → NULL, but the
          // direct COUNT(DISTINCT) oracle says 0 for an empty slice.
          .agg(coalesce(sum(expr("bitmap_count(bm_merged)")), lit(0L)).as("n_users"))
          .select(lit(label).as("range_label"), col("n_users"))
      }.reduce(_ unionByName _).orderBy("range_label")
    }),

    // STORED twin of the bitmap rollup (the production shape: the
    // per-(day, bucket) bitmap table is a WRITE-ONCE artifact — built
    // from raw events one time, marker-gated per (sfDir), and every
    // range question reads the tiny stored rollup and OR-merges; raw
    // events are never touched at question time). Same oracle as the
    // in-query twin: serving distinct counts from the stored artifact
    // must change nothing.
    "events_bitmap_rollup_stored" -> ((s, dir) => {
      val sfTag = dir.replaceAll("[^A-Za-z0-9.]", "_")
      val out = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), s"graft_bitmap_rollup_$sfTag")
      val fs = out.getFileSystem(s.sparkContext.hadoopConfiguration)
      val marker = new org.apache.hadoop.fs.Path(out, "_GRAFT_MARKER")
      val tag = s"$dir|bitmap_rollup|v1"
      val fresh = fs.exists(marker) && {
        val in = fs.open(marker)
        try new String(in.readAllBytes(), "UTF-8") == tag finally in.close()
      }
      if (!fresh) {
        util.Artifacts.recordBuild(s"bitmap_rollup $tag")
        if (fs.exists(out)) fs.delete(out, true)
        Sources.events(s, dir)
          .select(expr("ts DIV 86400000000000").as("day"),
            (col("user_id") + 1).as("uid1"))
          .groupBy(col("day"), expr("bitmap_bucket_number(uid1)").as("bucket"))
          .agg(expr("bitmap_construct_agg(bitmap_bit_position(uid1))").as("bm"))
          .write.parquet(new org.apache.hadoop.fs.Path(out, "daily").toString)
        val os = fs.create(marker, true)
        try os.write(tag.getBytes("UTF-8")) finally os.close()
      }
      val daily = s.read.parquet(new org.apache.hadoop.fs.Path(out, "daily").toString)
      val ranges = Seq(("week1", 19723L, 19730L), ("week2", 19730L, 19737L),
        ("month", 19723L, 19753L))
      ranges.map { case (label, lo, hi) =>
        daily.filter(col("day") >= lo && col("day") < hi)
          .groupBy("bucket")
          .agg(expr("bitmap_or_agg(bm)").as("bm_merged"))
          .agg(coalesce(sum(expr("bitmap_count(bm_merged)")), lit(0L)).as("n_users"))
          .select(lit(label).as("range_label"), col("n_users"))
      }.reduce(_ unionByName _).orderBy("range_label")
    }),

    // TIME-SLICED scan (the dominant events access pattern at scale:
    // "last week's events", not the full history): the day-range
    // predicate is applied to the RAW parquet column inside
    // Sources.eventsTsRange, BEFORE the nanos normalization, so it
    // reaches the scan as PushedFilters and prunes row groups off
    // footer min/max stats — at 100 TB the scan reads the slice, not
    // the corpus (EventsPruningSpec pins the pushdown AND equivalence
    // with the filter-after-normalize form). Downstream is ordinary
    // nanos math on the normalized column.
    "events_day_slice" -> ((s, dir) => {
      val lo = 1704672000000000000L // 2024-01-08T00:00:00Z nanos
      val hi = 1705276800000000000L // 2024-01-15T00:00:00Z nanos
      Sources.eventsTsRange(s, dir, lo, hi)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          util.Stable.exactSum(col("value")).as("sum_value"),
          min(expr("ts DIV 86400000000000")).as("min_day"),
          max(expr("ts DIV 86400000000000")).as("max_day"))
        .orderBy("event_type")
    }),

    // Tumbling event-time window aggregate — the batch face of the
    // Structured Streaming surface (the same transform runs watermarked on
    // a stream; StreamingSpec asserts stream ≡ batch).
    "events_hourly_window" -> ((s, dir) =>
      streaming.Streams.hourlyTypeCounts(
        Sources.events(s, dir)
          .withColumn("ts", timestamp_micros(expr("ts div 1000"))))
        .orderBy("w_start", "event_type")),

    // Gap-based sessionization over events: lag + conditional flag +
    // running-sum window, all partitioned by user_id (no global window),
    // then per-session rollup. The batch form of streaming session state.
    "events_sessionize" -> ((s, dir) =>
      events.Sessionize.sessionStats(Sources.events(s, dir))
        .orderBy("user_id", "session_idx")),

    // Cohort RETENTION (event analytics): users bucketed by first-active
    // day; per (cohort, day-offset) active-user counts — the classic
    // retention triangle. Day index = integer division of the exact
    // BIGINT-nanos timestamp (DIV, engine-identical). One (user, day)
    // distinct + one user-keyed aggregate + a co-partitioned self-join;
    // every shuffle is user- or day-keyed, nothing global.
    // K-ANONYMITY audit (data-governance surface): before a table ships,
    // every quasi-identifier class — here (event_type, day-of-week,
    // value band) — must contain ≥ k distinct individuals, or those rows
    // re-identify. Two keyed aggregations: QI-class sizes, then per-type
    // exposure stats (classes under k, users and rows inside them). The
    // value band is derived on 1e-2-quantized longs so both engines cut
    // identically. Scales as two map-side-combinable shuffles.
    "events_k_anonymity" -> ((s, dir) => {
      val k = 5
      val classes = Sources.events(s, dir)
        .select(col("event_type"),
          expr("(ts DIV 86400000000000) % 7").as("dow"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT) DIV 5000").as("vband"),
          col("user_id"))
        .groupBy("event_type", "dow", "vband")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_rows"))
      classes.groupBy("event_type")
        .agg(count(lit(1)).as("n_classes"),
          sum(when(col("n_users") < k, 1L).otherwise(0L)).as("n_small_classes"),
          sum(when(col("n_users") < k, col("n_users")).otherwise(0L)).as("users_at_risk"),
          sum(when(col("n_users") < k, col("n_rows")).otherwise(0L)).as("rows_at_risk"),
          min(col("n_users")).as("min_class_users"))
        .orderBy("event_type")
    }),

    "events_retention" -> ((s, dir) => {
      val days = Sources.events(s, dir)
        .select(col("user_id"), expr("ts DIV 86400000000000").as("day_idx"))
        .distinct()
      val first = days.groupBy("user_id").agg(min("day_idx").as("cohort_day"))
      days.join(first, "user_id")
        .groupBy(col("cohort_day"), (col("day_idx") - col("cohort_day")).as("day_offset"))
        // (user, day) is distinct above, so each user counts once per cell
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    }),

    // CDC-style LATEST-STATE compaction: the newest event per
    // (user, event_type) — the "current snapshot from a changelog" shape
    // every warehouse compaction job runs. Selection through the
    // bounded-heap per-key operator: ≤ 1 row per key per map task
    // reaches the exchange (a row_number window would shuffle the whole
    // changelog). event_id is the total tiebreak for same-nanosecond
    // writes.
    "events_latest_state" -> ((s, dir) =>
      plans.TopK.perKey(
        Sources.events(s, dir)
          // micros, not nanos: DuckDB timestamps carry micro precision,
          // so the cross-engine contract ranks at micros (event_id is
          // the total tiebreak within a microsecond either way).
          .select(col("user_id"), col("event_type"),
            expr("ts DIV 1000").as("ts_us"), col("event_id"), col("value")),
        keyCols = Seq("user_id", "event_type"),
        orderBy = Seq("ts_us" -> false, "event_id" -> false), k = 1)
        .select("user_id", "event_type", "ts_us", "event_id", "value")
        .orderBy("user_id", "event_type")),

    // SCD-TYPE-2 dimension build from a changelog (warehouse surface):
    // collapse consecutive equal states per user into validity intervals
    // [valid_from, valid_to) — lag() marks run starts, lead() over the
    // surviving run anchors closes each interval (NULL = current). Both
    // windows are partitioned by user_id — per-key parallelism, no
    // global ordering; (ts_us, event_id) is the total within-user order
    // so same-microsecond writes collapse deterministically. This is the
    // standard "changelog → slowly-changing dimension" compaction.
    "events_scd2" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      val ev = Sources.events(s, dir)
        .select(col("user_id"), col("event_type").as("state"),
          expr("ts DIV 1000").as("ts_us"), col("event_id"))
      ev.withColumn("prev_state", lag(col("state"), 1).over(w))
        .filter(col("prev_state").isNull || col("prev_state") =!= col("state"))
        .withColumn("valid_to_us", lead(col("ts_us"), 1).over(w))
        .select(col("user_id"), col("state"), col("ts_us").as("valid_from_us"),
          col("valid_to_us"), col("event_id"))
        .orderBy("user_id", "valid_from_us", "event_id")
    }),

    // Skew-JOIN salting (the join-side twin of yf_salted_month_agg's
    // aggregation salting): a viral key would pile one reducer high in a
    // plain shuffle join, so the fact side salts its key deterministically
    // (event_id % R — never rand(): retries agree) and the dim side
    // replicates R ways; joining on (key, salt) spreads a hot key over R
    // reducers. The oracle is the PLAIN join — hash-equality proves the
    // salted plan computes identical results.
    "events_salted_join" -> ((s, dir) => {
      val r = 8
      val ev = Sources.events(s, dir)
        .select(col("user_id"), col("event_id"), col("value"))
        .withColumn("salt", pmod(col("event_id"), lit(r)))
      val dim = Sources.events(s, dir)
        .groupBy("user_id").agg(countDistinct(col("event_type")).as("n_types"))
      val dimR = dim.withColumn("salt",
        explode(sequence(lit(0L), lit((r - 1).toLong))))
      ev.join(dimR, Seq("user_id", "salt"))
        .groupBy("user_id", "n_types")
        .agg(util.Stable.exactSum(col("value")).as("sum_value"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // Rolling 7-day ACTIVE USERS (event analytics): per observed day,
    // distinct users active in the trailing week. COUNT DISTINCT over a
    // sliding window doesn't compose as a window aggregate at scale; the
    // scale-right shape is a BOUNDED explode — each (user, day) pair
    // contributes to ≤ 7 window days — then distinct + count, all keyed
    // shuffles. Reported only for days that exist in the stream.
    "events_rolling_active" -> ((s, dir) => {
      val days = Sources.events(s, dir)
        .select(col("user_id"), expr("ts DIV 86400000000000").as("day_idx"))
        .distinct()
      val observed = days.select("day_idx").distinct()
      days
        .select(col("user_id"),
          explode(sequence(col("day_idx"), col("day_idx") + 6)).as("w_day"))
        .distinct()
        .join(observed.withColumnRenamed("day_idx", "w_day"), "w_day")
        .groupBy("w_day").agg(count(lit(1)).as("n_active_7d"))
        .orderBy("w_day")
    }),

    // Conversion FUNNEL (event analytics): signup → later click → later
    // purchase, strictly ordered per user by the exact nanos timestamp.
    // Each stage is a filtered user-keyed min + a co-partitioned join
    // against the previous stage — no window over the full event stream,
    // no per-user event collection; event_type filters push to the scan.
    "events_funnel" -> ((s, dir) => {
      val ev = Sources.events(s, dir).select("user_id", "event_type", "ts")
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val s2 = ev.filter(col("event_type") === "click").join(s1, "user_id")
        .filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min("ts").as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase").join(s2, "user_id")
        .filter(col("ts") > col("t2"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      s1.agg(count(lit(1)).as("n_signup"))
        .crossJoin(s2.agg(count(lit(1)).as("n_click_after")))
        .crossJoin(s3.agg(count(lit(1)).as("n_purchase_after")))
    }),

    // Multimodal catalog + resize/frame-sample planning over opaque binary
    // payloads with typed metadata — the queryable half of a media
    // pipeline (payload untouched, metadata pushdown-friendly).
    "mm_catalog" -> ((s, dir) =>
      multimodal.Multimodal.resizePlan(
        multimodal.Multimodal.synthesize(Sources.documents(s, dir)), 128)
        .orderBy("media_id")),

    // Decode + feature extraction via per-partition batch mapPartitions —
    // the real codec boundary (decoder stubbed deterministically; the
    // Dataset encoders, binary schema, and batch shape are the product).
    // Not SQL-expressible per the contract → rows-only check.
    "mm_decode_features" -> ((s, dir) =>
      multimodal.Multimodal.decodeFeatures(
        multimodal.Multimodal.mediaDataset(s, Sources.documents(s, dir)))
        .toDF().orderBy("media_id")),

    // REAL image codec at the mapPartitions boundary: genuine PNG
    // payloads (deterministic formula-patterned grayscale, ImageIO-
    // encoded on the executors) decoded back by javax.imageio into exact
    // pixel statistics. The oracle computes the same statistics from the
    // generating formula — a hash match proves the encode→decode
    // round-trip preserved every pixel. No shuffle; executor-parallel.
    "mm_decode_png" -> ((s, dir) =>
      multimodal.Multimodal.decodeImageFeatures(
        multimodal.Multimodal.synthesizeImages(Sources.documents(s, dir)))
        .toDF().orderBy("media_id")),

    // Video frame-SAMPLING plan (multimodal plumbing): the per-frame work
    // list a decode stage consumes — one row per sampled instant, pure
    // per-row explode of an integer ladder (shuffle-free at any corpus
    // size). The decode itself stays at the mapPartitions codec boundary
    // (mm_decode_features); THIS is the fan-out that feeds it.
    "mm_frame_sample" -> ((s, dir) =>
      multimodal.Multimodal.frameSamplePlan(
        multimodal.Multimodal.synthesize(Sources.documents(s, dir)), 250)
        .orderBy("media_id", "sample_ms")),

    // Audio sliding-WINDOW accounting (multimodal plumbing): per-asset
    // (win, hop) frame arithmetic — window counts, coverage, tail — the
    // work-list sizing for a feature-extraction front end. Row-local,
    // no shuffle.
    "mm_audio_windows" -> ((s, dir) =>
      multimodal.Multimodal.audioWindowPlan(
        multimodal.Multimodal.synthesize(Sources.documents(s, dir)), 400, 160)
        .orderBy("media_id")),

    // BINARY shard-manifest packing (WebDataset-style): every media asset
    // is assigned a (bucket, shard) under a byte budget AND its exact
    // byte offset inside the shard — the manifest a tar-shard writer and
    // a random-access reader both consume. Packing is per-bucket
    // independent (md5-rank order, docs_pack_shards' first-byte rule, one
    // window over hash(bucket)); the offset is a second running sum
    // partitioned by (bucket, shard) — hash(bucket) already clusters
    // that superset key, so Spark adds only a sort, NOT a second
    // exchange. 512 bytes/record models the tar header. The whole
    // manifest is id + 4 longs per asset — payloads never move.
    "mm_pack_shards" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val budget = 16384L
      val m = multimodal.Multimodal.synthesize(Sources.documents(s, dir))
        .select(col("media_id"), (col("meta.n_bytes") + lit(512L)).as("rec_bytes"))
        .withColumn("bucket", pmod(col("media_id"), lit(16)))
        .withColumn("rk", md5(col("media_id").cast("string").cast("binary")))
      val w = Window.partitionBy("bucket").orderBy("rk", "media_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val w2 = Window.partitionBy("bucket", "shard_idx").orderBy("rk", "media_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      m.withColumn("cum", sum(col("rec_bytes")).over(w))
        .withColumn("shard_idx", expr(s"(cum - rec_bytes) DIV $budget"))
        .withColumn("byte_offset", coalesce(sum(col("rec_bytes")).over(w2), lit(0L)))
        .select("media_id", "bucket", "shard_idx", "rec_bytes", "byte_offset")
        .orderBy("media_id")
    }),

    // SimHash near-dedup: 64-bit sign sketch per doc (two md5s per shingle,
    // flat partial+final aggregate), 4x16-bit banded candidate equi-join
    // (65 536 keys per band — sub-quadratic at corpus scale), full-width
    // hamming verification.
    "dedup_simhash" -> ((s, dir) =>
      dedup.Dedup.simhashPairs(
        dedup.Dedup.augmented(Sources.documents(s, dir)), "doc_id", "text")
        .orderBy("id_a", "id_b")),

    // Benchmark DECONTAMINATION (training-data extension): eval-side
    // n-gram containment between the train corpus and a (small,
    // broadcast) benchmark set — the pre-ship overlap scan of every LLM
    // data pipeline. The fixture's eval set is a deterministic slice of
    // documents; at scale it is a separate table, same plan.
    "dedup_contamination" -> ((s, dir) => {
      // Eval set = the base docs whose injected copies (exact, junk-
      // appended, edited) live in the train side — so real contamination
      // exists to find: a copy contains every shingle of its base doc →
      // containment 1.0 (threshold 0.8 admits the edit variants too).
      val docs = dedup.Dedup.augmented(Sources.documents(s, dir))
      val isEval = col("doc_id") % 5 === 0 && col("doc_id") < dedup.Dedup.NearOffset
      dedup.Dedup.contaminationPairs(
        docs.filter(!isEval), docs.filter(isEval),
        "doc_id", "text", threshold = 0.8)
        .orderBy("train_id", "eval_id")
    }),

    // Training-SHARD packing: assign docs to token-budget shards, packed
    // independently within deterministic hash buckets (bucket = parallel
    // packer; at scale each bucket's running sum is a partitioned window,
    // never a global order). A doc lands in the shard its start offset
    // falls in — offset = the running token sum BEFORE the doc.
    "docs_pack_shards" -> ((s, dir) =>
      packShards(Sources.documents(s, dir))
        .select("bucket", "doc_id", "n_tokens", "shard_idx")
        .orderBy("doc_id")),

    // Shard payload ASSEMBLY — the step after packing: concatenate each
    // shard's docs (in packing order) into the training-sequence payload.
    // Emitted as the ordered-assembly md5 + sizes, not the payload string
    // (rows stay audit-sized; the md5 proves BOTH engines assemble the
    // byte-identical sequence). collect_list + struct-sort is per-shard
    // bounded: a shard holds ~budget tokens by construction, so the
    // in-memory assembly unit is ~one training sequence, independent of
    // corpus size; one (bucket, shard) keyed shuffle.
    "docs_pack_assemble" -> ((s, dir) =>
      packShards(Sources.documents(s, dir))
        .groupBy("bucket", "shard_idx")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          md5(array_join(
            transform(
              sort_array(collect_list(struct(col("rk"), col("doc_id"), col("text")))),
              x => x.getField("text")),
            "\n").cast("binary")).as("payload_md5"))
        .orderBy("bucket", "shard_idx")),

    // Deterministic STRATIFIED sampling — "k docs per language" is the
    // standard corpus-balancing step of a training-data pipeline, done
    // scale-right: rank key = md5(doc_id) (hash-derived, so retries and
    // speculative tasks see identical samples — never rand()), selection
    // through the bounded-heap per-key operator (≤ k rows per (stratum,
    // map task) reach the exchange; a row_number window would shuffle the
    // whole corpus). Oracle = the QUALIFY window form.
    "docs_sample_stratified" -> ((s, dir) =>
      plans.TopK.perKey(
        Sources.documents(s, dir).select(col("doc_id"), col("lang"))
          .withColumn("rk", md5(col("doc_id").cast("string").cast("binary"))),
        keyCols = Seq("lang"),
        orderBy = Seq("rk" -> true, "doc_id" -> true), k = 20)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")),

    // Deterministic WEIGHTED sampling without replacement (Efraimidis–
    // Spirakis exponential race): doc i wins with probability
    // proportional to its weight (n_chars here — longer docs are worth
    // more tokens). key_i = -ln(u_i)/w_i with u_i hash-derived from
    // doc_id (never rand() — retries and speculative tasks see the same
    // sample), smallest 100 win via TakeOrderedAndProject (per-partition
    // heaps, k rows to the driver — no global sort at any scale). ln is
    // quantized to 1e-6 longs; the final key is ONE IEEE division of
    // identical integers, so the cut is adjudicated identically on both
    // engines.
    "docs_weighted_sample" -> ((s, dir) => {
      val h32 = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8),
        16, 10).cast("long")
      val u = (h32.cast("double") + 0.5) / 4294967296.0
      val lnq = floor(log(u) * 1e6 + 0.5).cast("long")
      Sources.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          (-lnq.cast("double") / col("n_chars")).as("sample_key"))
        .orderBy(col("sample_key"), col("doc_id"))
        .limit(100)
    }),

    // TF-IDF term weighting (training-data relevance scoring): term
    // frequency per (doc, word), document frequency over the FULL corpus
    // (one shuffle each, partial aggregation), idf = ln((N+1)/(df+1))
    // smoothed. The corpus size joins in as a broadcast 1-row aggregate —
    // no driver-side count. Scores are sig-stabilized (ln's last ulp is
    // not a cross-engine contract); the doc_id slice bounds output rows,
    // not the computation.
    "text_tfidf" -> ((s, dir) => {
      val docs = Sources.documents(s, dir)
      val words = docs.select(col("doc_id"),
          explode(split(util.Norm.normalize(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
      val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val dfreq = words.groupBy("word").agg(countDistinct(col("doc_id")).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      tf.filter(col("doc_id") < 50)
        .join(dfreq, "word")
        .crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("word"), col("tf"), col("df"),
          util.Stable.sig(col("tf") *
            log((col("n_docs") + 1).cast("double") / (col("df") + 1))).as("tfidf"))
        .orderBy("doc_id", "word")
    }),

    // Language ID via stopword-profile scoring with deterministic argmax —
    // single-pass projection, no shuffle at any scale.
    "text_lang_id" -> ((s, dir) =>
      text.TextAnalysis.langId(Sources.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),

    // PII redaction (training-data extension): regex scrub of emails and
    // phone numbers — per-row projection, no shuffle at any scale. The
    // fixture text contains no PII, so deterministic PII is INJECTED
    // in-query (mirrored exactly in the oracle) and the redaction is
    // verified by occurrence counts + an md5 of the scrubbed text (both
    // engines must scrub to the identical byte string).
    "text_pii_redact" -> ((s, dir) => {
      val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
      val phoneRe = "\\+[0-9]{2} [0-9]{3} [0-9]+"
      val docs = Sources.documents(s, dir).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
            .otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            concat(lit(" call +62 812 "), col("doc_id"))).otherwise(lit("")))
          .as("text"))
      docs.select(
        col("doc_id"),
        regexp_count(col("text"), lit(emailRe)).cast("long").as("n_emails"),
        regexp_count(col("text"), lit(phoneRe)).cast("long").as("n_phones"),
        md5(regexp_replace(regexp_replace(col("text"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>").cast("binary")).as("redacted_md5"))
        .orderBy("doc_id")
    }),

    // Repetition scoring (a Gopher-style quality rule): most-common-word
    // ratio per doc — high ratio = degenerate/repetitive text. One
    // keyed shuffle with partial aggregation; ratio of exact longs
    // divides to the same double in any engine.
    "text_repetition" -> ((s, dir) => {
      val words = Sources.documents(s, dir)
        .select(col("doc_id"),
          explode(split(util.Norm.normalize(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
      words.groupBy("doc_id", "word").agg(count(lit(1)).as("n"))
        .groupBy("doc_id").agg(
          sum(col("n")).as("n_words"),
          max(col("n")).as("max_word_count"),
          count(lit(1)).as("n_distinct_words"))
        .withColumn("top_word_ratio", col("max_word_count") / col("n_words"))
        .orderBy("doc_id")
    }),

    // Duplicate word-3-gram fraction — the Gopher-class repetition
    // signal text_repetition's top-word ratio misses (a doc that cycles
    // two phrases has a low top-word ratio but a high dup-n-gram
    // fraction). ENTIRELY row-local and shuffle-free: the total 3-gram
    // count is arithmetic on the word count, the distinct count reuses
    // the codegen'd WordShingles expression (first-occurrence-distinct by
    // contract), and the fraction is one IEEE division of identical
    // integers per engine. At 100 TB this is a free column on any scan.
    "text_dup_ngrams" -> ((s, dir) => {
      val nWords = size(split(util.Norm.normalize(col("text")), " "))
        .cast("long")
      val total = greatest(nWords - 2, lit(0L))
      val dist = size(dedup.Dedup.shingles(col("text"))).cast("long")
      Sources.documents(s, dir)
        .select(col("doc_id"), total.as("n_grams"), dist.as("n_distinct"),
          (total - dist).as("n_dup"))
        .withColumn("dup_frac",
          when(col("n_grams") > 0,
            col("n_dup").cast("double") / col("n_grams")))
        .orderBy("doc_id")
    }),

    // Unigram-LM quality scoring (training-data extension): avg negative
    // log-probability per doc under the corpus's own unigram model — the
    // cheap statistical fluency filter (the KenLM-score shape without
    // model weights). Two keyed shuffles (word freq, per-doc rollup) +
    // one word-keyed join, all with partial aggregation; the corpus
    // total joins in as a broadcast 1-row aggregate. Per-word -ln(p) is
    // QUANTIZED to 1e-4 longs before summing so the per-doc sum is exact
    // integer arithmetic — order-independent across engines (a raw
    // double sum would be partitioning-dependent).
    "text_unigram_logprob" -> ((s, dir) => {
      val words = Sources.documents(s, dir)
        .select(col("doc_id"),
          explode(split(util.Norm.normalize(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
      val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val freq = words.groupBy("word").agg(count(lit(1)).as("wf"))
      val total = words.agg(count(lit(1)).as("n_total"))
      val negLogQ = floor(-log(col("wf").cast("double") / col("n_total")) * 1e4 + 0.5)
        .cast("long")
      tf.join(freq, "word")
        .crossJoin(broadcast(total))
        .groupBy("doc_id").agg(
          sum(col("tf")).as("n_words"),
          ((sum(col("tf") * negLogQ) / 1e4) / sum(col("tf"))).as("avg_neg_logprob"))
        .orderBy("doc_id")
    }),

    // CCNet-style LM-PERPLEXITY BUCKETING (training-data extension): the
    // curation decision the unigram scorer feeds — per LANGUAGE, rank
    // docs by average negative logprob under the corpus's own LM and
    // cut into terciles (head = most fluent, tail = least). Per-language
    // windows (no global ordering); the rank key is an IEEE division of
    // identical integers so both engines order identically, doc_id
    // breaks ties. Output is per-(lang, bucket) integer-exact stats —
    // the mixture table a curation run publishes.
    "docs_lm_buckets" -> ((s, dir) => {
      val docs = Sources.documents(s, dir)
      val words = docs
        .select(col("doc_id"),
          explode(split(util.Norm.normalize(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
      val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val freq = words.groupBy("word").agg(count(lit(1)).as("wf"))
      val total = words.agg(count(lit(1)).as("n_total"))
      val negLogQ = floor(-log(col("wf").cast("double") / col("n_total")) * 1e4 + 0.5)
        .cast("long")
      val perDoc = tf.join(freq, "word")
        .crossJoin(broadcast(total))
        .groupBy("doc_id").agg(
          sum(col("tf")).as("n_words"),
          sum(col("tf") * negLogQ).as("nll_q4"))
        .join(docs.select("doc_id", "lang"), "doc_id")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang")
        .orderBy((col("nll_q4") / col("n_words")).asc, col("doc_id").asc)
      perDoc
        .withColumn("bucket", ntile(3).over(w))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("sum_words"),
          sum(col("nll_q4")).as("sum_nll_q4"))
        .orderBy("lang", "bucket")
    }),

    // Sequence-LENGTH HISTOGRAM (training-data extension): power-of-two
    // token-count buckets — the planning table for context-window
    // packing (how much of the corpus fits 2^k windows). The bucket
    // index is INTEGER-derived (length of the binary rendering of
    // n_tokens, no floor(log2()) float boundary risk at exact powers of
    // two); everything downstream is exact longs. Row-local bucket
    // assignment + one map-side-combinable aggregate — scan-bound at
    // any scale.
    "docs_length_histogram" -> ((s, dir) =>
      Sources.documents(s, dir)
        .select(col("doc_id"),
          size(filter(split(util.Norm.normalize(col("text")), " "),
            w => w =!= "")).cast("long").as("n_tokens"))
        .withColumn("bucket",
          when(col("n_tokens") === 0, lit(-1))
            .otherwise(length(bin(col("n_tokens"))) - 1))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
          min(col("n_tokens")).as("min_tokens"), max(col("n_tokens")).as("max_tokens"))
        .withColumn("bucket_lo",
          when(col("bucket") < 0, lit(0L))
            .otherwise(expr("shiftleft(CAST(1 AS BIGINT), bucket)")))
        .select(col("bucket").cast("long").as("bucket"), col("bucket_lo"),
          col("n_docs"), col("sum_tokens"), col("min_tokens"), col("max_tokens"))
        .orderBy("bucket")
    ),

    // Bigram-LM fluency scoring — the conditional twin of
    // text_unigram_logprob: avg -ln p(w2|w1) per doc under the corpus's
    // own MLE bigram model (c12/c1; every in-doc bigram occurs in the
    // corpus, so no zero-probability smoothing is needed). Bigram
    // instances from one array transform per row (no self-join); joint +
    // predecessor counts are keyed aggregates with partial aggregation.
    // Per-instance -ln is QUANTIZED to 1e-4 longs before summing — exact
    // order-independent integer arithmetic, like the unigram scorer.
    // Docs with < 2 words have no bigrams and drop out (both engines).
    "text_bigram_logprob" -> ((s, dir) => {
      val inst = Sources.documents(s, dir)
        .select(col("doc_id"), split(util.Norm.normalize(col("text")), " ").as("ws"))
        .select(col("doc_id"), explode(expr(
          """CASE WHEN size(ws) >= 2
            |     THEN transform(sequence(1, size(ws) - 1),
            |                    i -> struct(ws[i-1] AS w1, ws[i] AS w2))
            |     ELSE array() END""".stripMargin)).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        .filter(col("w1") =!= "" && col("w2") =!= "")
      val tf = inst.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("tf"))
      val cj = inst.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val c1 = inst.groupBy("w1").agg(count(lit(1)).as("c1"))
      val negLogQ = floor(-log(col("c12") / col("c1")) * 1e4 + 0.5).cast("long")
      tf.join(cj, Seq("w1", "w2")).join(c1, "w1")
        .groupBy("doc_id").agg(
          sum(col("tf")).as("n_bigrams"),
          ((sum(col("tf") * negLogQ) / 1e4) / sum(col("tf"))).as("avg_neg_logprob"))
        .orderBy("doc_id")
    }),

    // INCREMENTAL dedup (training-data extension): an incoming batch is
    // deduped against the already-ingested corpus index — the steady-state
    // ingest path (dedup_exact is the from-scratch backfill). Batch side
    // anti-joins the existing content-hash index (one shuffle each side;
    // at scale the index is a written-once hash table scanned from
    // parquet), then collapses within-batch copies by min doc id. The
    // augmented corpus guarantees real cross- and intra-batch hits exist.
    "dedup_incremental" -> ((s, dir) => {
      val docs = dedup.Dedup.augmented(Sources.documents(s, dir))
        .withColumn("h", md5(util.Norm.normalize(col("text")).cast("binary")))
      val incoming = docs.filter(col("doc_id") % 10 === 0).select("doc_id", "h")
      val existing = docs.filter(col("doc_id") % 10 =!= 0).select("h").distinct()
      incoming.join(existing, Seq("h"), "left_anti")
        .groupBy("h").agg(
          min(col("doc_id")).as("doc_id"),
          count(lit(1)).as("n_batch_copies"))
        .select("doc_id", "h", "n_batch_copies")
        .orderBy("doc_id")
    }),

    // Bloom-ACCELERATED incremental exact dedup: the same semantics as
    // dedup_incremental, with a distributed Bloom filter
    // (graft/functions/BloomAgg.scala — partition-local bit arrays,
    // OR-merged; never the driver-collecting built-in) broadcast as the
    // pre-filter. A bloom MISS is definitive (no false negatives), so
    // misses skip the index join entirely; only the ~fpp fraction of
    // positives pays the exact anti-join re-check — output is EXACTLY
    // the anti-join's (the oracle is the same SQL). At 100 TB the 1M-bit
    // filter (128 KB broadcast) replaces a full batch×index shuffle with
    // a map-side probe for almost every genuinely-new document.
    "dedup_incremental_bloom" -> ((s, dir) => {
      import org.apache.spark.sql.GraftColumnBridge.{column => cexpr, expression => eexpr}
      val docs = dedup.Dedup.augmented(Sources.documents(s, dir))
        .withColumn("h", md5(util.Norm.normalize(col("text")).cast("binary")))
      val incoming = docs.filter(col("doc_id") % 10 === 0).select("doc_id", "h")
      val existing = docs.filter(col("doc_id") % 10 =!= 0).select("h").distinct()
      val bloomDf = existing.agg(cexpr(functions.BloomAgg(
        eexpr(col("h")), numBits = 1 << 20, numHashes = 7)
        .toAggregateExpression()).as("bloom"))
      val probed = incoming.crossJoin(broadcast(bloomDf))
        .withColumn("maybe",
          cexpr(functions.MightContain(eexpr(col("bloom")), eexpr(col("h")), 7)))
      val definitelyNew = probed.filter(!col("maybe")).select("doc_id", "h")
      val rechecked = probed.filter(col("maybe")).select("doc_id", "h")
        .join(existing, Seq("h"), "left_anti")
      definitelyNew.unionByName(rechecked)
        .groupBy("h").agg(
          min(col("doc_id")).as("doc_id"),
          count(lit(1)).as("n_batch_copies"))
        .select("doc_id", "h", "n_batch_copies")
        .orderBy("doc_id")
    }),

    // INCREMENTAL near-dedup (the LSH twin of dedup_incremental's exact
    // path): batch docs with no verified near-dup in the existing corpus
    // or among earlier batch docs. Probe-side banding — the corpus never
    // self-joins (SCALE.md "Deduplication").
    "dedup_incremental_lsh" -> ((s, dir) => {
      val docs = dedup.Dedup.augmented(Sources.documents(s, dir))
      val isBatch = col("doc_id") % 10 === 0
      dedup.Dedup.lshNewDocs(docs.filter(isBatch), docs.filter(!isBatch),
        "doc_id", "text", 0.6)
        .orderBy("doc_id")
    }),

    // INCREMENTAL near-dedup against a STORED index — the true 100 TB
    // ingest shape dedup_incremental_lsh documents but derives in-query:
    // the existing corpus's band index + shingle store are WRITTEN to
    // parquet once (the write-once artifacts an ingest pipeline keeps),
    // read back, and only the batch is shingled/banded at probe time.
    // Same oracle as the in-query twin — identical survivors prove the
    // stored path computes the same verdicts.
    "dedup_incremental_lsh_stored" -> ((s, dir) => {
      val docs = dedup.Dedup.augmented(Sources.documents(s, dir))
      val isBatch = col("doc_id") % 10 === 0
      // Per-SF directory: the warm-up pass (sf0.001) and the timed pass
      // (bench SF) must not clobber each other's artifact — with one
      // shared dir the tag mismatch forced a rebuild INSIDE timed rep 1
      // of every bench run (measured: 16.8 s rep 1 vs the 6.9 s probe
      // floor). Per-SF dirs make the artifact genuinely write-once
      // across invocations, which is the whole point of the shape.
      val sfTag = dir.replaceAll("[^A-Za-z0-9.]", "_")
      val out = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), s"graft_lsh_index_$sfTag")
      val fs = out.getFileSystem(s.sparkContext.hadoopConfiguration)
      // WRITE-ONCE, like production: the index is rebuilt only when the
      // marker says it was built from a different corpus or different
      // LSH parameters (the testdata is immutable by driver contract, so
      // (sfDir, params) identifies the content). Re-invocations — bench
      // reps above all — probe the existing artifact, which is the
      // entire point of the stored-index ingest shape.
      val marker = new org.apache.hadoop.fs.Path(out, "_GRAFT_MARKER")
      val tag = s"$dir|n=${dedup.Dedup.ShingleN}|h=${dedup.Dedup.NumHashes}" +
        s"|b=${dedup.Dedup.NumBands}"
      val fresh = fs.exists(marker) && {
        val in = fs.open(marker)
        try new String(in.readAllBytes(), "UTF-8") == tag finally in.close()
      }
      if (!fresh) {
        util.Artifacts.recordBuild(s"lsh_index $tag")
        if (fs.exists(out)) fs.delete(out, true)
        dedup.Dedup.writeLshIndex(docs.filter(!isBatch), "doc_id", "text", out.toString)
        val os = fs.create(marker, true)
        try os.write(tag.getBytes("UTF-8")) finally os.close()
      }
      val (bandE, shE) = dedup.Dedup.readLshIndex(s, out.toString)
      dedup.Dedup.lshNewDocsAgainstIndex(docs.filter(isBatch), bandE, shE,
        "doc_id", "text", 0.6)
        .orderBy("doc_id")
    }),

    // Deterministic train/val/test SPLIT (training-data extension):
    // assignment by the first hex nibble of md5(doc_id) — 12/2/2
    // sixteenths ≈ 75/12.5/12.5 — so membership is a pure function of
    // the id (retries, speculative tasks, and re-runs agree; no rand(),
    // no global sort, no shuffle before the rollup). Reported as
    // per-(split, lang) counts — the mixture audit a pipeline ships.
    "docs_split" -> ((s, dir) => {
      val nibble = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1)
      Sources.documents(s, dir)
        .withColumn("split",
          when(nibble.isin("e", "f"), lit("test"))
            .when(nibble.isin("c", "d"), lit("val"))
            .otherwise(lit("train")))
        .groupBy("split", "lang").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy("split", "lang")
    }),

    // Corpus REBALANCING (training-data extension): downsample every
    // language stratum to the smallest stratum's size in expectation —
    // the mixture-control step before training. Membership is an exact
    // integer predicate on a hash of the id (md5 prefix → long), so it
    // is a pure function of (doc_id, stratum sizes): no rand(), retries
    // and speculative tasks agree, and both engines compute the identical
    // kept set. Stratum counts and the target broadcast (tiny dims); the
    // corpus is scanned once and only the audit rollup shuffles.
    "docs_rebalance" -> ((s, dir) => {
      val docs = Sources.documents(s, dir)
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_before"))
      val target = counts.agg(min(col("n_before")).as("target_n"))
      // Uniform hash in [0, 1e6): first 8 md5 hex chars as a long. The
      // acceptance test is integer-exact: hm < (target_n * 1e6) DIV
      // n_before (DIV, not /: long division matches DuckDB's // exactly;
      // a double divide could round across an integer boundary).
      val hm = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8),
        16, 10).cast("long") % 1000000L
      val kept = docs
        .join(broadcast(counts), "lang")
        .crossJoin(broadcast(target))
        .filter(hm < expr("(target_n * 1000000) DIV n_before"))
        .groupBy("lang").agg(count(lit(1)).as("n_after"))
      counts.join(kept, Seq("lang"), "left")
        .select(col("lang"), col("n_before"),
          coalesce(col("n_after"), lit(0L)).as("n_after"))
        .orderBy("lang")
    }),

    // Per-label embedding CENTROIDS (training-data extension): the mean
    // vector per class — the write-once coarse index IVF probes, and the
    // per-cluster summary of any embedding-space audit. posexplode keeps
    // it dimension-agnostic. Components are QUANTIZED to 1e-8 longs
    // before summing (floor(v*1e8+0.5) is pure IEEE arithmetic —
    // engine-identical; a decimal CAST is not: Spark converts a float
    // through its shortest string form while DuckDB rounds the exact
    // binary value, and the two disagree a half-quantum on ~1 in 1e3
    // values). The long sum is exact and order-independent; one keyed
    // shuffle with partial aggregation.
    "emb_label_centroids" -> ((s, dir) =>
      Sources.embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim_idx", "v")))
        .groupBy("label", "dim_idx")
        .agg(((sum(floor(col("v") * 1e8 + 0.5).cast("long")) / 1e8) / count(lit(1)))
          .as("centroid"))
        .select(col("label"), col("dim_idx").cast("long").as("dim_idx"), col("centroid"))
        .orderBy("label", "dim_idx")),

    // INT8 embedding QUANTIZATION audit (training-data extension): the
    // compression step before shipping an ANN index — per-dimension
    // min/max scaling to 8-bit codes, reported as per-(label, dim) code
    // statistics (n, Σcode, Σcode²) so drift between quantized shards is
    // detectable. Everything is integer-exact end-to-end: components
    // quantize to 1e-8 longs first (pure IEEE floor — engine-identical),
    // the code rounds via integer arithmetic ((Δ·510 + range) DIV
    // 2·range = round-half-up without any double), and code sums are
    // long. The per-dim range frame is |dims| rows — broadcast back; one
    // keyed shuffle for the final rollup.
    "emb_quantize_int8" -> ((s, dir) => {
      val ex = Sources.embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim_idx", "v")))
        .withColumn("q", floor(col("v") * 1e8 + 0.5).cast("long"))
      val rng = ex.groupBy("dim_idx")
        .agg(min("q").as("min_q"), max("q").as("max_q"))
      ex.join(broadcast(rng), "dim_idx")
        .withColumn("code", when(col("max_q") === col("min_q"), lit(0L))
          .otherwise(expr("((q - min_q) * 510 + (max_q - min_q)) DIV (2 * (max_q - min_q))")))
        .groupBy("label", "dim_idx")
        .agg(count(lit(1)).as("n"), sum("code").as("sum_code"),
          sum(col("code") * col("code")).as("sum_code_sq"))
        .select(col("label"), col("dim_idx").cast("long").as("dim_idx"),
          col("n"), col("sum_code"), col("sum_code_sq"))
        .orderBy("label", "dim_idx")
    }),

    // Composite QUALITY GATE (training-data extension): the C4-style
    // keep/drop verdict — length, language, repetition, and composite
    // quality thresholds with a first-failing-rule diagnostic. All
    // row-local signals (n_words, quality, lang) are FUSED into one
    // projection over one scan (TextAnalysis.gateSignals); only the
    // repetition ratio needs an aggregate (one keyed shuffle) and joins
    // back on doc_id. Thresholds chosen to exercise every rule on the
    // fixture.
    "docs_quality_gate" -> ((s, dir) =>
      qualityGate(Sources.documents(s, dir)).orderBy("doc_id")),

    // Per-SOURCE curation audit (training-data extension): the domain
    // scorecard every web-corpus pipeline maintains — per source: doc
    // volume, token mass, language spread, exact-duplicate share,
    // too-short share, and the blocklist verdict. Runs over sourcedDocs
    // (the raw fixture has no duplicate texts; at scale the dup signal
    // comes from the dedup pass at this same grain). Everything is ONE
    // source-grain keyed aggregation with map-side partials (the two
    // DISTINCT aggregates Expand the input ×2 — at domain grain, cheap);
    // verdicts adjudicate integer-exactly (n_dup·X > n_docs, never a
    // double share), and the blocked list is O(sources) — it becomes the
    // broadcast side of the corpus gate join, so the corpus itself never
    // shuffles to apply a blocklist.
    "docs_source_audit" -> ((s, dir) =>
      sourcedDocs(Sources.documents(s, dir))
        .select(col("source"), col("lang"),
          size(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+"))
            .cast("long").as("n_tokens"),
          md5(col("text").cast("binary")).as("h"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_tokens").as("sum_tokens"),
          countDistinct("lang").as("n_langs"),
          (count(lit(1)) - countDistinct("h")).as("n_dup_docs"),
          sum(when(col("n_tokens") < text.TextAnalysis.GateMinWords, 1L)
            .otherwise(0L)).as("n_short"))
        .withColumn("blocked",
          ((col("n_dup_docs") * SourceDupBlockX > col("n_docs")) ||
            (col("n_short") * SourceShortBlockX > col("n_docs"))).cast("int"))
        .orderBy("source")),

    // Per-SOURCE token-budget CAP (training-data extension): "no single
    // domain exceeds its token budget" — the mixture-control twin of
    // docs_rebalance (which equalizes LANGUAGE doc counts; this caps
    // SOURCE token mass). Priority is the hash rank (never rand() —
    // retries and speculative tasks select identically); a doc is kept
    // iff its START offset in the per-source running token sum is inside
    // the budget (the packing rule — the first doc always lands, so no
    // source is emptied). One per-source window, partitioned — no global
    // order; a viral source makes its window the skew point at lake
    // scale, where the production variant first estimates the cut rank
    // with the GK sketch (events_quantiles_approx's path) and runs the
    // window only on the margin. Output at source grain stays bounded as
    // the corpus grows.
    "docs_source_cap" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("rk", "doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      Sources.documents(s, dir)
        .select(col("doc_id"), col("source"),
          size(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+"))
            .cast("long").as("n_tokens"))
        .withColumn("rk", md5(col("doc_id").cast("string").cast("binary")))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .withColumn("kept",
          (col("cum") - col("n_tokens") < SourceCapTokens).cast("int"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_before"),
          sum("n_tokens").as("tokens_before"),
          sum("kept").as("n_kept"),
          sum(when(col("kept") === 1, col("n_tokens")).otherwise(0L))
            .as("tokens_kept"))
        .orderBy("source")
    }),

    // Cross-source SYNDICATION matrix (training-data extension): which
    // source pairs carry the same exact content — the wire-service /
    // mirror-site detection a web corpus runs before trusting per-source
    // statistics. Shape is scale-right: reduce to DISTINCT (content-hash,
    // source) FIRST — ~36 bytes a row no matter how wide the docs — then
    // keep hashes seen in 2..SourceMaxSyndication sources; the upper cap
    // is the hot-key guard (universal boilerplate would fan out C(n,2)
    // pairs per hash — past the cap it is boilerplate-removal's finding,
    // not syndication), so the pair self-join fans out ≤ C(cap,2) rows
    // per hash. The (hash, source) view materializes once for the count
    // pass and both join sides.
    "docs_cross_source_dup" -> ((s, dir) => {
      val hs = util.Views.materialize(
        sourcedDocs(Sources.documents(s, dir))
          .select(md5(col("text").cast("binary")).as("h"), col("source"))
          .distinct())
      val banded = hs.join(
        hs.groupBy("h").agg(count(lit(1)).as("ns"))
          .filter(col("ns").between(2, SourceMaxSyndication))
          .select("h"),
        "h")
      banded.as("a")
        .join(banded.as("b"),
          col("a.h") === col("b.h") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
        .agg(count(lit(1)).as("n_shared"))
        .orderBy("source_a", "source_b")
    }),

    // The END-TO-END corpus pipeline in ONE DAG — quality gate → exact
    // dedup (canonical survivor) → token-budget shard packing — the
    // composition a real training-data build runs, proving the stages
    // compose without materialization boundaries. Runs over the
    // AUGMENTED corpus so the dedup stage has real work. Output is the
    // pipeline's audit row: raw → kept → unique counts, packed tokens,
    // shard count (all exact longs).
    "docs_pipeline_e2e" -> ((s, dir) => {
      val docs = dedup.Dedup.augmented(Sources.documents(s, dir))
      val kept = docs.join(
        qualityGate(docs).filter(col("keep") === 1).select("doc_id"), "doc_id")
      val canon = kept
        .withColumn("h", md5(util.Norm.normalize(col("text")).cast("binary")))
        .groupBy("h").agg(min("doc_id").as("doc_id"))
      val clean = kept.join(canon.select("doc_id"), "doc_id")
      val packed = packShards(clean)
      docs.agg(count(lit(1)).as("n_raw"))
        .crossJoin(kept.agg(count(lit(1)).as("n_kept")))
        .crossJoin(packed.agg(
          count(lit(1)).as("n_unique"),
          sum("n_tokens").as("sum_tokens"),
          countDistinct(col("bucket"), col("shard_idx")).as("n_shards")))
    }),

    // Corpus-level top n-grams (training-data extension): the highest-
    // document-frequency word 3-grams — the boilerplate/contamination
    // audit table. Reuses the dedup shingle derivation (distinct shingles
    // per doc, so count = document frequency); one keyed shuffle with
    // partial aggregation, then a global bounded top-k that plans as
    // TakeOrderedAndProject (per-partition heaps; only 20 rows per
    // partition reach the driver-side merge — no full sort at any scale).
    "text_top_ngrams" -> ((s, dir) =>
      Sources.documents(s, dir)
        .select(col("doc_id"), explode(dedup.Dedup.shingles(col("text"))).as("ngram"))
        .groupBy("ngram").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("ngram"))
        .limit(20)),

    // Heavy hitters via the native Misra–Gries sketch (mg_sketch, a
    // TypedImperativeAggregate — graft/functions/MisraGries.scala): the
    // bounded-memory frequent-items path. Phase 1 reduces every partition
    // to a fixed-size mergeable sketch whose survivors are a GUARANTEED
    // superset of all items with count > N/(capacity+1); phase 2 exactly
    // recounts ONLY the candidates (broadcast semi-join — the full
    // vocabulary never shuffles) and takes the exact top-20 via
    // TakeOrderedAndProject. At 100 TB this replaces a full-vocabulary
    // groupBy with an O(capacity)-per-partition sketch + a recount
    // restricted to <= capacity keys. Capacity 64 makes the guarantee
    // threshold N/65 sit far below the fixture's 20th-ranked count
    // (~888 vs ~418 at sf0.01), so the sketch provably cannot miss a
    // top-20 word and the output equals DuckDB's exact top-20.
    "text_heavy_hitters" -> ((s, dir) => {
      val words = Sources.documents(s, dir)
        .select(explode(split(util.Norm.normalize(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
      val sketch = words.agg(
        org.apache.spark.sql.GraftColumnBridge.column(
          functions.MisraGries(
            org.apache.spark.sql.GraftColumnBridge.expression(col("word")),
            capacity = 64).toAggregateExpression()).as("sk"))
      val candidates = sketch.select(explode(map_keys(col("sk"))).as("word"))
      words.join(broadcast(candidates), Seq("word"), "left_semi")
        .groupBy("word").agg(count(lit(1)).as("n_occurrences"))
        .orderBy(col("n_occurrences").desc, col("word"))
        .limit(20)
    }),

    // COUNT-MIN frequency estimation (round 6, completing the sketch
    // family: HLL = cardinality, Misra-Gries = heavy-hitter candidates,
    // Bloom = membership, GK = quantiles, CMS = point frequencies): one
    // pass builds the native mergeable `cms_agg` counter grid — a few KB
    // regardless of key cardinality, the whole point at 100 TB — and the
    // top-20 exact words are then estimated from the broadcast sketch by
    // a pure projection (no second corpus scan for the estimates). The
    // bucket hash is the repo's cross-engine md5→long contract, so the
    // DuckDB oracle REPLAYS the sketch cell-for-cell and hash-matches the
    // estimates — and the CMS one-sided guarantee (estimate never
    // undercounts) is enforced in-query via assert_true, GK-style.
    "text_cms_freq" -> ((s, dir) => {
      import org.apache.spark.sql.GraftColumnBridge.{column => cexpr, expression => eexpr}
      val (depth, width) = (4, 64)
      val words = Sources.documents(s, dir)
        .select(explode(split(util.Norm.normalize(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
      val sketch = words.agg(cexpr(functions.CmsAgg(
        eexpr(col("word")), depth, width).toAggregateExpression()).as("cms"))
      val exact = words.groupBy("word").agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("word")).limit(20)
      // Per-row point lookup: bucket_j(word) via the same md5 contract the
      // native update loop uses; estimate = least over the depth rows.
      val ests = (0 until depth).map { j =>
        val bkt = conv(substring(md5(
          concat(lit(s"$j:"), col("word")).cast("binary")), 1, 8), 16, 10)
          .cast("long") % width
        element_at(col("cms"), ((lit(j * width) + bkt).cast("int")) + 1)
      }
      exact.crossJoin(broadcast(sketch))
        .withColumn("n_est", least(ests: _*))
        .select(col("word"), col("n_exact"),
          when(assert_true(col("n_est") >= col("n_exact"),
            lit("CMS undercount — one-sided guarantee violated")).isNull,
            col("n_est")).as("n_est"))
        .orderBy(col("n_exact").desc, col("word"))
    }),

    // KMV DISTINCT-CARDINALITY sketch (native `kmv_agg`, the package's
    // fourth sketch family): per-event-type distinct-user estimates from
    // k-minimum-values summaries, PLUS the union-grain estimate computed
    // by merging the per-type sketches in plain SQL (slice∘sort∘distinct
    // ∘flatten — the KMV union algebra; the k smallest global hashes are
    // always among each part's k smallest). The hash is the cross-engine
    // md5→long contract, so DuckDB replays the sketch as `ORDER BY hash
    // LIMIT k` and the estimates match bit-for-bit. At 100 TB: the
    // buffer is k longs per group regardless of user cardinality — a
    // distinct-user audit with NO per-key shuffle, and stored per-day
    // sketches answer any date-range distinct question by array algebra
    // (the approximate complement of events_bitmap_rollup's exact OR).
    // The exact column is the fixture-scale audit; a 2x sanity band is
    // enforced in-query (k=256 ⇒ ~6% std error, so 2x is a loud alarm).
    "events_kmv_distinct" -> ((s, dir) => {
      import org.apache.spark.sql.GraftColumnBridge.{column => cexpr, expression => eexpr}
      val k = 256
      val kc = lit((k - 1).toDouble * functions.KmvUtil.HashSpan)
      def estOf(kmv: org.apache.spark.sql.Column) =
        when(size(kmv) < k, size(kmv).cast("double"))
          .otherwise(kc / element_at(kmv, k).cast("double"))
      val ev = Sources.events(s, dir)
        .select(col("event_type"), col("user_id").cast("string").as("u"))
      val perType = ev.groupBy("event_type")
        .agg(cexpr(functions.KmvAgg(eexpr(col("u")), k).toAggregateExpression()).as("kmv"),
          countDistinct(col("u")).as("n_exact"))
      val typed = perType.select(
        concat(lit("type:"), col("event_type")).as("grain"),
        col("n_exact"), size(col("kmv")).cast("long").as("kmv_size"),
        estOf(col("kmv")).as("n_est"))
      val exactAll = ev.agg(countDistinct(col("u")).as("n_exact"))
      val unioned = perType
        .agg(slice(array_sort(array_distinct(flatten(collect_list(col("kmv"))))),
          1, k).as("kmv"))
        .crossJoin(broadcast(exactAll)) // 1-row × 1-row
        .select(lit("__union__").as("grain"), col("n_exact"),
          size(col("kmv")).cast("long").as("kmv_size"), estOf(col("kmv")).as("n_est"))
      typed.unionByName(unioned)
        .withColumn("n_est", when(assert_true(
          col("n_est") >= col("n_exact") * 0.5 && col("n_est") <= col("n_exact") * 2.0,
          lit("KMV estimate outside the 2x sanity band")).isNull, col("n_est")))
        .orderBy("grain")
    }),

    // KMV SET-ALGEBRA: INTERSECTION estimate (completing the sketch
    // algebra beside events_kmv_distinct's union — the "how many users
    // did BOTH" question answered from two stored sketches without
    // touching raw data): est(A∩B) = est(A) + est(B) − est(A∪B) by
    // inclusion–exclusion, with the union sketch built by the same
    // plain-SQL merge algebra (slice∘sort∘distinct∘concat) KmvSpec
    // proves ≡ the directly-built sketch. Clamped at 0 (sampling noise
    // can push a small intersection negative — the clamp is part of the
    // estimator's contract, not a fudge); no sanity band because
    // intersection error is ABSOLUTE in the union's scale, not relative
    // to the (possibly tiny) intersection — the exact twin
    // (events_users_intersect) is the audit. Everything after the two
    // keyed sketch aggregates is 1-row broadcast arithmetic; the
    // estimates hash-match DuckDB's replay of the identical md5 sketch.
    "events_kmv_intersect" -> ((s, dir) => {
      import org.apache.spark.sql.GraftColumnBridge.{column => cexpr, expression => eexpr}
      val k = 256
      val kc = lit((k - 1).toDouble * functions.KmvUtil.HashSpan)
      def estOf(kmv: org.apache.spark.sql.Column) =
        when(size(kmv) < k, size(kmv).cast("double"))
          .otherwise(kc / element_at(kmv, k).cast("double"))
      val ev = Sources.events(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type"), col("user_id").cast("string").as("u"))
      val sk = ev.groupBy("event_type")
        .agg(cexpr(functions.KmvAgg(eexpr(col("u")), k).toAggregateExpression())
          .as("kmv"))
      val a = sk.filter(col("event_type") === "click").select(col("kmv").as("kmv_a"))
      val b = sk.filter(col("event_type") === "purchase").select(col("kmv").as("kmv_b"))
      val exact = ev.filter(col("event_type") === "click").select("u")
        .intersect(ev.filter(col("event_type") === "purchase").select("u"))
        .agg(count(lit(1)).as("n_exact_intersect"))
      a.crossJoin(broadcast(b)) // 1-row × 1-row
        .withColumn("kmv_u",
          slice(array_sort(array_distinct(concat(col("kmv_a"), col("kmv_b")))),
            1, k))
        .crossJoin(broadcast(exact)) // 1-row × 1-row
        .select(col("n_exact_intersect"),
          estOf(col("kmv_a")).as("est_clicks"),
          estOf(col("kmv_b")).as("est_purchases"),
          estOf(col("kmv_u")).as("est_union"),
          greatest(lit(0.0), estOf(col("kmv_a")) + estOf(col("kmv_b"))
            - estOf(col("kmv_u"))).as("est_intersect"))
    }),

    // BROADCAST-MODEL scoring (training-data extension): the fasttext-
    // style quality-filter shape — a (word → weight) model table small
    // enough to broadcast scores every document in one shuffle-free-ish
    // pass (one doc-grain aggregate). The "model" here is corpus-derived
    // idf weights quantized to 1e-6 longs (any externally-trained linear
    // model drops into the same plan); score = mean idf of the doc's
    // matched DISTINCT words — integer sums, one final IEEE division.
    // At 100 TB: the weight table is a published artifact, the corpus
    // side is scan + broadcast-join + per-doc partial aggregate.
    "docs_lexical_score" -> ((s, dir) => {
      val words = Sources.documents(s, dir)
        .select(col("doc_id"),
          explode(split(util.Norm.normalize(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
        .distinct() // distinct (doc, word): presence features, not counts
      val nDocs = Sources.documents(s, dir).agg(count(lit(1)).as("n_docs"))
      val model = words.groupBy("word")
        .agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2) // singleton words carry no signal
        .crossJoin(broadcast(nDocs))
        .select(col("word"),
          floor(log(col("n_docs").cast("double") / col("df")) * 1e6 + 0.5)
            .cast("long").as("w_q6"))
      words.join(broadcast(model), Seq("word"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_features"),
          count(col("w_q6")).as("n_matched"),
          sum(coalesce(col("w_q6"), lit(0L))).as("score_q6_sum"))
        .withColumn("mean_score_q6",
          when(col("n_matched") === 0, lit(null).cast("double"))
            .otherwise(col("score_q6_sum").cast("double") / col("n_matched")))
        .orderBy("doc_id")
    }),

    // PMI bigram COLLOCATIONS (corpus statistics): pointwise mutual
    // information over adjacent word pairs — the classic collocation /
    // tokenizer-merge-candidate table. Bigram instances from one array
    // transform per row (no self-join); joint + both marginal counts are
    // keyed aggregates with partial aggregation; the corpus total is a
    // broadcast 1-row aggregate. ln is quantized to 1e-6 longs so the
    // top-20 cut is adjudicated on exact integers in both engines.
    "text_pmi_bigrams" -> ((s, dir) => {
      val inst = Sources.documents(s, dir)
        .select(split(util.Norm.normalize(col("text")), " ").as("ws"))
        .select(explode(expr(
          """CASE WHEN size(ws) >= 2
            |     THEN transform(sequence(1, size(ws) - 1),
            |                    i -> struct(ws[i-1] AS w1, ws[i] AS w2))
            |     ELSE array() END""".stripMargin)).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .filter(col("w1") =!= "" && col("w2") =!= "")
      val n = inst.agg(count(lit(1)).as("n_bigrams"))
      val c1 = inst.groupBy("w1").agg(count(lit(1)).as("c1"))
      val c2 = inst.groupBy("w2").agg(count(lit(1)).as("c2"))
      val cj = inst.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        .filter(col("c12") >= 5)
      cj.join(c1, "w1").join(c2, "w2").crossJoin(broadcast(n))
        .withColumn("pmi",
          floor(log((col("c12").cast("double") * col("n_bigrams")) /
            (col("c1").cast("double") * col("c2"))) * 1e6 + 0.5).cast("long") / 1e6)
        .select("w1", "w2", "c12", "pmi")
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(20)
    }),

    // Token counting: whitespace tokens + BPE-ish regex pre-tokenization.
    "text_tokens" -> ((s, dir) =>
      text.TextAnalysis.tokenStats(Sources.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),

    // Quality scoring: length/stopword/punct/digit signals + composite.
    "text_quality" -> ((s, dir) =>
      text.TextAnalysis.qualityScore(Sources.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),

    // Document fingerprinting: content md5 + word-level polynomial
    // rolling hash (Rabin-Karp shape).
    "text_fingerprint" -> ((s, dir) =>
      text.TextAnalysis.fingerprints(Sources.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),

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

    // Embedding-cosine near-dup pairs: full-sketch equality candidates +
    // exact cosine verification (no pairwise scan).
    "dedup_embedding_cosine" -> ((s, dir) =>
      sim.Similarity.cosinePairs(
        sim.Similarity.augmented(Sources.embeddings(s, dir)), 0.95)
        .orderBy("id_a", "id_b")),

    // Embedding-space duplicate CLUSTERS: the cluster machinery over a
    // SECOND pair-graph domain — cosine near-dup pairs instead of shingle
    // Jaccard. Same min-label propagation (rounds scale with the dup
    // graph, not the corpus), same RECURSIVE-CTE closure oracle; an
    // embedding pipeline dedups semantic copies exactly like a text
    // pipeline dedups lexical ones.
    "dedup_embedding_clusters" -> ((s, dir) => {
      val vecs = sim.Similarity.augmented(Sources.embeddings(s, dir))
      val pairs = sim.Similarity.cosinePairs(vecs, 0.95)
        .select(col("id_a"), col("id_b"))
      dedup.Dedup.clusters(vecs.select(col("id")), "id", pairs)
        .withColumn("is_canonical",
          (col("doc_id") === col("cluster_id")).cast("int"))
        .orderBy("doc_id")
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

    // Genuine null-handling semantics (the reference's coalesce is
    // degenerate — fillna runs first): coalesce over actually-null
    // numeric + string columns, and na.fill (idx_transform.py:160-183,
    // iqplus defensive defaults :121-124).
    "idx_null_handling" -> ((s, dir) => {
      val c = Sources.customer(s, dir)
      c.select(
        col("c_custkey"),
        when(col("c_custkey") % 5 === 0, lit(null)).otherwise(col("c_acctbal")).as("bal_null"),
        when(col("c_custkey") % 3 === 0, lit(null)).otherwise(col("c_name")).as("name_null"))
        .withColumn("bal_coalesced", coalesce(col("bal_null"), lit(0.0)))
        .withColumn("name_defaulted", coalesce(col("name_null"), lit("")))
        .na.fill(-1.0, Seq("bal_null"))
        .withColumnRenamed("bal_null", "bal_filled")
        .drop("name_null")
        .orderBy("c_custkey")
    }),

    // SPAN-LEVEL exact dedup (training-data extension): the "remove
    // duplicated substrings" pass a web-corpus pipeline runs after
    // doc-level dedup. Unit = non-overlapping 10-word chunks of the
    // normalized word stream (the standard fallback when line boundaries
    // are absent); a chunk occurring in >= 2 DISTINCT docs is boilerplate
    // and is stripped. Chunks are keyed by md5 — at 100 TB the
    // doc-frequency aggregate and the chunk join shuffle 16-byte keys,
    // never chunk text. One explode + one hash-keyed aggregate + one
    // hash-keyed join; the cleaned text is reassembled per doc in chunk
    // order and md5'd so the oracle compares a digest, not a blob.
    "docs_chunk_dedup" -> ((s, dir) => {
      val chunks = dedup.Dedup.augmented(Sources.documents(s, dir))
        .select(col("doc_id"),
          filter(split(util.Norm.normalize(col("text")), " "),
            w => w =!= "").as("ws"))
        // greatest(…, 1): an empty/whitespace-only doc still emits one
        // (empty) chunk so it stays present in the per-doc rollup.
        .select(col("doc_id"), posexplode(expr(
          """transform(sequence(0, greatest(cast(ceil(size(ws) / 10.0) as int), 1) - 1),
            |          i -> array_join(slice(ws, i*10 + 1, 10), ' '))""".stripMargin)))
        .withColumnsRenamed(Map("pos" -> "chunk_idx", "col" -> "chunk"))
        .withColumn("h", md5(col("chunk").cast("binary")))
      val freq = chunks.groupBy("h")
        .agg(countDistinct(col("doc_id")).as("df"))
      chunks.join(freq, "h")
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_chunks"),
          sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"),
          md5(array_join(
            transform(
              array_sort(collect_list(when(col("df") < 2,
                struct(col("chunk_idx"), col("chunk"))))),
              x => x.getField("chunk")),
            " ").cast("binary")).as("kept_md5"))
        .orderBy("doc_id")
    }),

    // SLIDING-WINDOW token chunker (training-data extension): the
    // context-window shape an LLM pretraining pipeline actually emits —
    // overlapping windows of W=12 tokens at stride S=6 (each token seen
    // twice, window boundaries never split context), vs docs_chunk_dedup's
    // disjoint spans. Pure per-row explode (no shuffle until the ORDER BY
    // display sort); chunk count = 1 + ceil(max(n-W,0)/S) so short docs
    // still emit one chunk. md5 per chunk makes the output
    // position-auditable without shipping the text.
    "docs_chunk_sliding" -> ((s, dir) =>
      Sources.documents(s, dir)
        .select(col("doc_id"),
          filter(split(util.Norm.normalize(col("text")), " "),
            w => w =!= "").as("ws"))
        .select(col("doc_id"), posexplode(expr(
          """transform(
            |  sequence(0, cast(ceil(greatest(size(ws) - 12, 0) / 6.0) as int)),
            |  i -> slice(ws, i*6 + 1, 12))""".stripMargin)))
        .withColumnsRenamed(Map("pos" -> "chunk_idx", "col" -> "chunk_ws"))
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          size(col("chunk_ws")).cast("long").as("n_tokens"),
          md5(array_join(col("chunk_ws"), " ").cast("binary")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_idx")),

    // Multi-way analytical JOIN (engine surface): lineitem ⋈ orders on
    // the co-keyed orderkey shuffle, aggregated to customer grain BEFORE
    // touching the customer dimension (the shuffle carries per-customer
    // partials, not line items), then customer equi-join + broadcast
    // nation, global top-50 via TakeOrderedAndProject (k rows per
    // partition reach the driver, never a global sort). Revenue is the
    // exact 4-dp decimal product (dec2 × (1 − rate2)) summed at its true
    // scale, so the result is order-independent on any engine.
    "orders_customer_revenue" -> ((s, dir) => {
      val rev = Sources.lineitem(s, dir)
        .select(col("l_orderkey"),
          (util.Stable.dec2(col("l_extendedprice")) *
            (util.Stable.rate2(lit(1.0)) - util.Stable.rate2(col("l_discount"))))
            .as("rev"))
      val perCust = rev
        .join(Sources.orders(s, dir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(countDistinct(col("o_orderkey")).as("n_orders"),
          util.Stable.exactSumAt(col("rev"), 4).as("revenue"))
      perCust
        .join(Sources.customer(s, dir).select("c_custkey", "c_name", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Sources.nation(s, dir).select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          col("n_orders"), col("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(50)
    }),

    // Correlated-aggregate-subquery DECORRELATION (engine surface, TPC-H
    // Q17 shape): "line items ordered at under 1/5 of their part's
    // average quantity". The naive form is a per-row correlated subquery
    // (re-aggregate the part's lineitems for every row); the scale-right
    // rewrite is ONE window over the l_partkey hash partitioning — the
    // fact table shuffles once, and the subsequent part join reuses that
    // exact partitioning (no second fact-side exchange; the part side is
    // the only additional shuffle). The predicate q < sum/(5·cnt) is
    // evaluated as 5·q·cnt < sum in DECIMAL — exact integer-grade
    // arithmetic, no division, no engine rounding-rule dependency at the
    // boundary. Revenue sums in DECIMAL(38,8) like every money aggregate.
    "part_small_qty_revenue" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
      val qDec = col("l_quantity").cast(util.Stable.MoneyDec)
      val small = Sources.lineitem(s, dir)
        .select(col("l_partkey"), qDec.as("q"),
          col("l_extendedprice").as("px"))
        .withColumn("sum_q", sum(col("q")).over(w))
        .withColumn("cnt", count(lit(1)).over(w))
        .filter(col("q") * 5 * col("cnt") < col("sum_q"))
      small.join(Sources.part(s, dir).select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_small"),
          util.Stable.exactSum(col("px")).as("revenue"))
        .orderBy("p_brand")
    }),

    // TPC-H Q1 — the canonical pricing-summary scan-aggregate: one
    // filtered pass over the fact table into a 4-group rollup with 8
    // aggregates. Scan-bound at any scale (predicate + pruning reach
    // parquet; partial aggregation collapses everything map-side).
    // Money sums in exact DECIMAL, averages as exact-sum / count — one
    // IEEE division of identical inputs per engine.
    "tpch_q1" -> ((s, dir) => {
      // Decimal-exact end to end: 1-discount in DOUBLE is already wrong
      // (1 - 0.07 = 0.9299999999999999…), and a (38,8) sum of a ~3e9
      // total carries 18 significant digits whose decimal→double cast
      // lands on ADJACENT doubles across engines. dec2/rate2 products +
      // true-scale sums (Stable.exactSumAt) kill both divergences.
      val one = util.Stable.rate2(lit(1.0))
      val px = util.Stable.dec2(col("l_extendedprice"))
      val discPrice = px * (one - util.Stable.rate2(col("l_discount")))
      val charge = discPrice * (one + util.Stable.rate2(col("l_tax")))
      Sources.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          util.Stable.exactSumAt(col("l_quantity"), 0).as("sum_qty"),
          util.Stable.exactSumAt(px, 2).as("sum_base_price"),
          util.Stable.exactSumAt(discPrice, 4).as("sum_disc_price"),
          util.Stable.exactSumAt(charge, 6).as("sum_charge"),
          util.Stable.exactAvgAt(col("l_quantity"), 0).as("avg_qty"),
          util.Stable.exactAvgAt(px, 2).as("avg_price"),
          util.Stable.exactAvgAt(col("l_discount"), 2).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // TPC-H Q3 — shipping-priority: selective dimension slice joins a
    // date-filtered fact, aggregate to order grain, top 10. The segment
    // slice of customer broadcasts (smallest side after its filter); the
    // fact⋈orders join co-keys on orderkey; TakeOrderedAndProject caps
    // the result without a global sort.
    "tpch_q3" -> ((s, dir) => {
      val cut = lit("1998-06-01").cast("timestamp")
      val c = Sources.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = Sources.orders(s, dir).filter(col("o_orderdate") < cut)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val l = Sources.lineitem(s, dir).filter(col("l_shipdate") > cut)
        .select(col("l_orderkey"),
          (util.Stable.dec2(col("l_extendedprice")) *
            (util.Stable.rate2(lit(1.0)) - util.Stable.rate2(col("l_discount"))))
            .as("rev"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(util.Stable.exactSumAt(col("rev"), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q6 — forecasting-revenue-change: a pure filter-aggregate
    // whose entire cost is the scan, so it is THE predicate-pushdown
    // benchmark (spec asserts the shipdate/quantity bounds reach the
    // parquet reader as PushedFilters). One row out; no shuffle beyond
    // the final 1-row merge.
    "tpch_q6" -> ((s, dir) =>
      Sources.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.02, 0.04) &&
          col("l_quantity") < 24)
        .agg(
          util.Stable.exactSumAt(
            util.Stable.dec2(col("l_extendedprice")) *
              util.Stable.rate2(col("l_discount")), 4)
            .as("revenue"),
          count(lit(1)).as("n_rows"))),

    // TPC-H Q13 shape — customer order-count DISTRIBUTION: the outer-
    // join-then-histogram classic, including the customers with ZERO
    // qualifying orders (the rows an inner join silently drops). The
    // scale-right plan aggregates orders to customer grain FIRST (one
    // map-side-combinable keyed agg — the shuffle carries one row per
    // customer, never raw orders), LEFT-joins the slim customer key
    // column to the partials, and histograms the coalesced counts. At
    // 100 TB the orders fact is reduced before any join, and the final
    // histogram grain is O(max orders per customer) — tiny.
    "orders_per_customer_distribution" -> ((s, dir) => {
      val perCust = Sources.orders(s, dir)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy("o_custkey").agg(count(lit(1)).as("c_count"))
      Sources.customer(s, dir).select("c_custkey")
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("c_count"), lit(0L)).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("n_custs"))
        .orderBy(col("n_custs").desc, col("c_count").desc)
    }),

    // TPC-H Q4 shape — EXISTS turned into a LEFT-SEMI join: orders with
    // at least one line shipped >60 days after the order date, counted
    // per priority. The correlated EXISTS is exactly Spark's left_semi
    // join (equi key + residual date predicate): the probe side keeps at
    // most one match per order and carries only (orderkey, shipdate) —
    // never a fact×fact blowup. Semi/anti are the two halves of the
    // existence-join family (events_anti_join pins the NOT EXISTS side).
    "orders_priority_semijoin" -> ((s, dir) => {
      val o = Sources.orders(s, dir)
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val l = Sources.lineitem(s, dir).select("l_orderkey", "l_shipdate")
      o.join(l,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q18 shape — HAVING-filtered aggregate joined back to its
    // dimensions (large-basket orders): sum quantities per order in
    // EXACT decimal, keep the >250 tail (~1% of orders), and only THEN
    // join orders + customer — the post-HAVING key set is tiny, so the
    // dimension joins are effectively broadcast-scale no matter how big
    // the fact was. Top-20 by total price lands in TakeOrderedAndProject.
    "orders_large_baskets" -> ((s, dir) => {
      val big = Sources.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(sum(util.Stable.dec2(col("l_quantity"))).as("total_qty"))
        .filter(col("total_qty") > 250)
      big
        .join(Sources.orders(s, dir)
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Sources.customer(s, dir).select("c_custkey", "c_name")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          col("total_qty").cast(DecimalType(38, 2)).cast("double").as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    }),

    // GLOBAL-total scalar-subquery decorrelation (engine surface, TPC-H
    // Q11 shape): "parts whose revenue share is ≥20% above the mean
    // part share" — a scale-invariant cut (a fixed fraction would be
    // vacuous at small SF and over-selective at large). The naive form
    // re-evaluates a global-aggregate scalar subquery per group; the
    // scale-right rewrite computes the one-row (total, n_parts) once
    // and BROADCASTS it (crossJoin of a 1-row aggregate — free at any
    // scale), so the fact table is scanned once and shuffled once on
    // l_partkey. The predicate rev·n·10 > total·12 runs in DECIMAL —
    // exact, division-free, no engine rounding dependency.
    "part_revenue_share" -> ((s, dir) => {
      val revDec = (util.Stable.dec2(col("l_extendedprice")) *
        (util.Stable.rate2(lit(1.0)) - util.Stable.rate2(col("l_discount"))))
        .cast(util.Stable.MoneyDec)
      val perPart = Sources.lineitem(s, dir)
        .select(col("l_partkey"), revDec.as("rev"))
        .groupBy("l_partkey")
        .agg(sum(col("rev")).as("part_rev"))
      val total = perPart.agg(sum(col("part_rev")).as("total_rev"),
        count(lit(1)).as("n_parts"))
      perPart.crossJoin(broadcast(total))
        .filter(col("part_rev") * col("n_parts") * 10 > col("total_rev") * 12)
        .join(Sources.part(s, dir).select("p_partkey", "p_name"),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("p_name"),
          col("part_rev").cast(DecimalType(38, 4)).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("p_partkey"))
    }),

    // Multi-EXISTS decorrelation (engine surface, TPC-H Q21 shape):
    // "suppliers who were the SOLE late shipper in a multi-supplier
    // order" — late = shipped >60 days after the order date. The naive
    // form is two correlated subqueries per row (EXISTS another supplier
    // in the order; NOT EXISTS another LATE supplier); the scale-right
    // rewrite decorrelates BOTH into one per-order aggregate (count of
    // distinct suppliers, count + min of late suppliers), so the fact
    // table shuffles once on l_orderkey instead of self-joining twice.
    // The supplier dimension joins after the per-supplier rollup — the
    // shuffle carries per-supplier partials, not line items.
    "orders_sole_late_supplier" -> ((s, dir) => {
      val li = Sources.lineitem(s, dir)
        .join(Sources.orders(s, dir).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
            .cast("int").as("late"))
      val perOrder = li
        .groupBy("l_orderkey")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(when(col("late") === 1, col("l_suppkey"))).as("n_late_supp"),
          min(when(col("late") === 1, col("l_suppkey"))).as("sole_late_supp"))
        .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
      perOrder
        .groupBy("sole_late_supp")
        .agg(count(lit(1)).as("n_orders"))
        .join(Sources.supplier(s, dir).select("s_suppkey", "s_name"),
          col("sole_late_supp") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_orders"))
        .orderBy(col("n_orders").desc, col("s_suppkey"))
        .limit(50)
    }),

    // Word-distribution ENTROPY per doc (training-data extension): the
    // vocabulary-diversity quality signal (low entropy = repetitive spam,
    // keyword stuffing). H = ln(N) - Σ n·ln(n) / N over per-doc word
    // counts; each ln is QUANTIZED to 1e-4 longs so the sum is exact
    // integer arithmetic (order-independent across engines), and the
    // final value is ONE IEEE division of identical integers. One
    // (doc, word) aggregate + one doc rollup, both with map-side partials.
    "text_word_entropy" -> ((s, dir) => {
      val words = Sources.documents(s, dir)
        .select(col("doc_id"),
          explode(split(util.Norm.normalize(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
      def lnQ(c: org.apache.spark.sql.Column) =
        floor(log(c.cast("double")) * 1e4 + 0.5).cast("long")
      words.groupBy("doc_id", "word").agg(count(lit(1)).as("n"))
        .groupBy("doc_id").agg(
          sum(col("n")).as("n_words"),
          count(lit(1)).as("n_distinct_words"),
          sum(col("n") * lnQ(col("n"))).as("sum_n_ln_n_q4"))
        .withColumn("entropy",
          (col("n_words") * lnQ(col("n_words")) - col("sum_n_ln_n_q4"))
            / (col("n_words") * lit(1e4)))
        .orderBy("doc_id")
    }),

    // Deterministic MIXTURE-WEIGHTED interleave (training-data extension):
    // the data-ORDER half of mixture control (docs_rebalance fixes the
    // composition; this fixes the schedule). Each language stream is
    // ranked independently (per-lang window — partitioned, never global),
    // and the r-th doc of a weight-w stream is scheduled at virtual time
    // r/w — the classic weighted-fair-queueing interleave, so a weight-4
    // stream appears 4× as often as a weight-1 stream at every prefix.
    // The audited head of the schedule goes through TakeOrderedAndProject
    // (k rows per partition to the driver); the full schedule at corpus
    // scale is a range-partitioned sort-write, never a single window.
    // r/w is ONE IEEE division of exact integers — engine-identical.
    "docs_mix_schedule" -> ((s, dir) => {
      val w = expr("CASE lang WHEN 'en' THEN 4 WHEN 'de' THEN 2 " +
        "WHEN 'fr' THEN 2 ELSE 1 END")
      val ranked = Sources.documents(s, dir)
        .select(col("doc_id"), col("lang"))
        .withColumn("lang_rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("lang").orderBy("doc_id")).cast("long"))
        .withColumn("virtual", col("lang_rank").cast("double") / w)
        .orderBy("virtual", "lang", "doc_id").limit(200)
      ranked.withColumn("position", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy("virtual", "lang", "doc_id")).cast("int"))
        .select("position", "doc_id", "lang", "lang_rank", "virtual")
        .orderBy("position")
    }),

    // INCREMENTAL aggregation against STORED partial state (the ingest
    // twin of the dedup_*_stored family, for rollups): the warehouse
    // keeps per-(day, event_type) PARTIAL aggregates — counts and exact
    // DECIMAL sums, never averages (sums merge; averages don't) — and a
    // new batch merges in one keyed aggregate over state ∪ batch-partials.
    // History is never rescanned: the batch side is O(batch), the state
    // side is a scan of pre-aggregated rows (≪ raw events). min/max ride
    // along as they are re-mergeable; the oracle is the FULL recompute
    // over all events — hash-equality proves merge(state, batch) ≡
    // aggregate(everything).
    "events_incremental_agg" -> ((s, dir) => {
      val ev = Sources.events(s, dir)
        .select(col("event_id"), col("event_type"),
          expr("ts DIV 86400000000000").as("day_idx"), col("value"))
      def partial(df: DataFrame): DataFrame =
        df.groupBy("day_idx", "event_type").agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast(util.Stable.MoneyDec)).as("sum_dec"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
      val out = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), "graft_agg_state")
      val fs = out.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(out)) fs.delete(out, true) // rebuild per invocation
      // "Already ingested" state, written once (decimal sums preserved
      // by parquet's DECIMAL(38,8) physical type, so the re-merge stays
      // exact); the 1-in-10 remainder is the incoming batch.
      partial(ev.filter(col("event_id") % 10 =!= 0))
        .write.mode("overwrite").parquet(out.toString)
      val state = s.read.parquet(out.toString)
      state.unionByName(partial(ev.filter(col("event_id") % 10 === 0)))
        .groupBy("day_idx", "event_type").agg(
          sum(col("n_events")).as("n_events"),
          sum(col("sum_dec")).cast("double").as("sum_value"),
          min(col("min_value")).as("min_value"),
          max(col("max_value")).as("max_value"))
        .orderBy("day_idx", "event_type")
    }),

    // PAGERANK over the part↔supplier bipartite graph (both directions
    // of every distinct lineitem (partkey, suppkey) edge — node ids
    // 2·partkey / 2·suppkey+1 share one key space). The SECOND iterative
    // graph primitive beside connected components: centrality over a
    // link/co-occurrence graph is a standard curation signal
    // (rank-weighted sampling of a crawl). All-integer damped power
    // iteration in 1e-9 rank units (see [[graph.PageRank]]) — FP
    // PageRank is summation-order dependent and irreproducible on any
    // parallel engine; the integer form replays exactly in DuckDB via
    // `//`-chained CTEs generated from the SAME constants. Per round:
    // one co-partitioned join against the cached degree-annotated edges
    // + one keyed aggregation; rounds persist + lineage-truncate with
    // exactly one live rank table (the clusters() discipline). Top-100
    // via sort-limit (TakeOrderedAndProject — k rows to the driver).
    "graph_pagerank" -> ((s, dir) => {
      val e0 = Sources.lineitem(s, dir)
        .select((col("l_partkey").cast("long") * 2).as("src"),
          (col("l_suppkey").cast("long") * 2 + 1).as("dst"))
        .distinct()
      val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      graph.PageRank.ranks(edges, iters = 3)
        .select(col("node"), (col("node") % 2).as("is_supplier"), col("pr"))
        .orderBy(col("pr").desc, col("node"))
        .limit(100)
    }),

    // DIRECTED PageRank with dangling-mass redistribution — the real
    // crawl/link-graph form: the part→supplier edge set is kept ONE-WAY,
    // so every supplier is a dangling node (dst, never src) and its rank
    // re-enters through the teleport pool each round instead of draining.
    // Same integer 1e-9-unit discipline; the oracle replays the loop
    // INCLUDING the per-round dangling-mass scalar as chained CTEs.
    "graph_pagerank_directed" -> ((s, dir) => {
      val edges = Sources.lineitem(s, dir)
        .select((col("l_partkey").cast("long") * 2).as("src"),
          (col("l_suppkey").cast("long") * 2 + 1).as("dst"))
        .distinct()
      graph.PageRank.ranksDirected(edges, iters = 3)
        .select(col("node"), (col("node") % 2).as("is_supplier"), col("pr"))
        .orderBy(col("pr").desc, col("node"))
        .limit(100)
    }),

    // TRIANGLE COUNTING over the part co-purchase graph (parts sharing
    // an order), by DEGREE-ORDERED edge orientation — the standard
    // distributed algorithm: orient every edge toward the (degree, id)-
    // larger endpoint, enumerate wedges only over OUT-neighbors (out-
    // degree is bounded by ~√(2m) under this orientation, so the wedge
    // join never explodes on hub nodes — the skew guard that makes
    // triangle counting feasible at web scale), close wedges against
    // the oriented edge list. Every triangle is counted exactly once,
    // at its π-smallest vertex. The π key packs (degree, id) into one
    // long — no global rank, no window. All counts integer-exact.
    "graph_triangles" -> ((s, dir) => {
      val op = Sources.lineitem(s, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      // Support threshold: an edge needs ≥2 shared orders. A single
      // shared basket is co-incidence, not co-purchase — and pruning it
      // collapses the graph's noise floor (at sf0.1: most pairs share
      // exactly one order; the support cut removes them and with them
      // ~90% of the wedge volume). Every real co-occurrence graph
      // thresholds support for exactly this reason.
      val edges = util.Views.materialize(
        op.as("a").join(op.as("b"),
            col("a.o") === col("b.o") && col("a.p") < col("b.p"))
          .groupBy(col("a.p").as("u"), col("b.p").as("v"))
          .agg(count(lit(1)).as("support"))
          .filter(col("support") >= 2)
          .select("u", "v"))
      val deg = edges.select(col("u").as("n"))
        .unionAll(edges.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("dg"))
      // π(n) = dg·10^10 + n: a single-long total order by (degree, id) —
      // ids stay far below 10^10 in this key space.
      val pi = deg.select(col("n"), (col("dg") * lit(10000000000L) + col("n")).as("pi"))
      val oriented = util.Views.materialize(edges
        .join(pi.select(col("n").as("u"), col("pi").as("pi_u")), "u")
        .join(pi.select(col("n").as("v"), col("pi").as("pi_v")), "v")
        .select(
          when(col("pi_u") < col("pi_v"), col("u")).otherwise(col("v")).as("src"),
          when(col("pi_u") < col("pi_v"), col("v")).otherwise(col("u")).as("dst"),
          greatest(col("pi_u"), col("pi_v")).as("pi_dst")))
      val wedges = oriented.as("e1").join(oriented.as("e2"),
          col("e1.src") === col("e2.src") && col("e1.pi_dst") < col("e2.pi_dst"))
        .select(col("e1.dst").as("b"), col("e2.dst").as("c"))
      // each wedge closes against at most one oriented edge (edge set is
      // distinct), so an inner-join count IS the triangle count
      val triangles = wedges.join(oriented,
        col("b") === col("src") && col("c") === col("dst"))
      val summary = edges.agg(count(lit(1)).as("n_edges"))
        .crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
        .crossJoin(wedges.agg(count(lit(1)).as("n_wedges")))
        .crossJoin(triangles.agg(count(lit(1)).as("n_triangles")))
      summary.select("n_nodes", "n_edges", "n_wedges", "n_triangles")
    }),

    // K-CORE DECOMPOSITION (round 7): the iterative PEELING member of
    // the graph family — repeatedly drop nodes whose degree in the
    // SURVIVING subgraph is < k until stable; what remains is the
    // maximal subgraph of minimum degree k (the standard "dense nucleus"
    // cut before community detection). Runs a FIXED 6 peel rounds on
    // both engines (the fixed-unroll pagerank discipline — identical
    // recurrence ⇒ identical state, converged or not; the fixture
    // converges in 3), each round one semi-join restriction + one keyed
    // degree aggregate — co-keyed shuffles only, lineage truncated per
    // round via materialized views exactly like the cluster propagation
    // loop. Output: the k-core's nodes with their in-core degrees.
    "graph_kcore" -> ((s, dir) => {
      val k = 3
      val op = Sources.lineitem(s, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val edges = util.Views.materialize(
        op.as("a").join(op.as("b"),
            col("a.o") === col("b.o") && col("a.p") < col("b.p"))
          .groupBy(col("a.p").as("u"), col("b.p").as("v"))
          .agg(count(lit(1)).as("support"))
          .filter(col("support") >= 2)
          .select("u", "v"))
      def degreesIn(nodes: DataFrame): DataFrame = {
        val live = edges
          .join(nodes.select(col("node").as("u")), "u", "left_semi")
          .join(nodes.select(col("node").as("v")), "v", "left_semi")
        live.select(col("u").as("node"))
          .unionAll(live.select(col("v").as("node")))
          .groupBy("node").agg(count(lit(1)).as("dg"))
      }
      // Lineage-truncate each round (the cluster-propagation loop's
      // discipline): persist caches the DATA, but the logical plan still
      // nests round over round and Catalyst re-optimization grows
      // EXPONENTIALLY (measured here: 0.9 → 3.2 → 18.6 → 217 s by round
      // 5 without truncation).
      def round(df: DataFrame): DataFrame =
        org.apache.spark.sql.GraftColumnBridge.lineageTruncated(
          util.Views.materialize(df))
      var nodes = round(
        edges.select(col("u").as("node"))
          .unionAll(edges.select(col("v").as("node")))
          .groupBy("node").agg(count(lit(1)).as("dg"))
          .filter(col("dg") >= k).select("node"))
      for (_ <- 1 to 6)
        nodes = round(degreesIn(nodes).filter(col("dg") >= k).select("node"))
      // Degrees of the round-6 node set, no extra filter: the oracle
      // unrolls the SAME 10 rounds, so both report identical state even
      // in the (impossible-here) unconverged case.
      degreesIn(nodes)
        .select(col("node"), col("dg").as("core_degree"))
        .orderBy("node")
    }),

    // LINK PREDICTION by common neighbors — the graph-analytics read
    // side: over the same thresholded co-purchase graph as
    // graph_triangles, score NON-adjacent part pairs by how many
    // neighbors they share (the classic common-neighbours baseline) and
    // emit the top-20 candidate edges. Wedge enumeration here needs
    // EVERY center (unlike triangle counting, where the degree
    // orientation picks one canonical wedge per triangle), so the hub
    // guard is explicit instead: centers above the degree cap are
    // excluded (fixture max degree 13 — the cap only bites at scale,
    // where a hub center's D² pair fan-out adds noise-floor signal at
    // quadratic cost; hub-removal is the standard link-prediction
    // practice). Non-adjacency = left_anti against the canonical u<v
    // edge set; candidate ranking lands in TakeOrderedAndProject.
    "graph_common_neighbors" -> ((s, dir) => {
      val op = Sources.lineitem(s, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val edges = util.Views.materialize(
        op.as("a").join(op.as("b"),
            col("a.o") === col("b.o") && col("a.p") < col("b.p"))
          .groupBy(col("a.p").as("u"), col("b.p").as("v"))
          .agg(count(lit(1)).as("support"))
          .filter(col("support") >= 2)
          .select("u", "v"))
      val adj = edges.select(col("u").as("c"), col("v").as("nb"))
        .unionAll(edges.select(col("v").as("c"), col("u").as("nb")))
      val centerDeg = adj.groupBy("c").agg(count(lit(1)).as("dg"))
      val small = util.Views.materialize(
        adj.join(centerDeg.filter(col("dg") <= 64), "c").select("c", "nb"))
      val cn = small.as("x").join(small.as("y"),
          col("x.c") === col("y.c") && col("x.nb") < col("y.nb"))
        .groupBy(col("x.nb").as("u"), col("y.nb").as("v"))
        .agg(count(lit(1)).as("n_common"))
      cn.join(edges, Seq("u", "v"), "left_anti")
        .orderBy(col("n_common").desc, col("u"), col("v"))
        .limit(20)
    }),

    // SNAPSHOT DIFF (data reconciliation): which rows were added,
    // removed, changed, or kept between two versions of a table —
    // the audit primitive behind incremental syncs, CDC validation, and
    // "did the backfill change anything it shouldn't". ROW-HASH compare:
    // each side reduces to (id, md5(payload)) at the scan, so the join
    // carries 2 columns regardless of table width and the comparison is
    // one equality — never N column-wise compares through the shuffle.
    // One hash-join on the id (bucket both snapshots on id at 100 TB and
    // it is shuffle-free); per-status aggregate is map-side combinable.
    // Snapshots are derived deterministically from the fixture (old
    // drops doc_id%5=1, new drops %7=2 and revises %11=3) and mirrored
    // exactly in the oracle.
    "docs_table_diff" -> ((s, dir) => {
      val d = Sources.documents(s, dir)
      val oldSnap = d.filter(col("doc_id") % 5 =!= 1)
        .select(col("doc_id"), md5(col("text").cast("binary")).as("h_old"))
      val newSnap = d.filter(col("doc_id") % 7 =!= 2)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 11 === 3, concat(col("text"), lit(" [rev2]")))
            .otherwise(col("text")).cast("binary")).as("h_new"))
      oldSnap.join(newSnap, Seq("doc_id"), "full_outer")
        .withColumn("status",
          when(col("h_old").isNull, lit("added"))
            .when(col("h_new").isNull, lit("removed"))
            .when(col("h_old") =!= col("h_new"), lit("changed"))
            .otherwise(lit("same")))
        .groupBy("status")
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("status")
    }),

    // MERGE / UPSERT semantics (lakehouse surface): apply a change batch
    // (update / delete / insert, derived deterministically from the base
    // so the oracle replays it) to a snapshot in ONE full-outer join on
    // the key — matched+update rewrites, matched+delete drops,
    // unmatched-source inserts, unmatched-target carries over. This is
    // the relational core of Delta/Iceberg MERGE INTO: one co-keyed
    // shuffle of (id, payload-hash)-width rows, never a per-row lookup.
    // Output audits the merged snapshot per action: counts + an
    // order-independent integer content checksum (sum of 40-bit md5
    // prefixes — safe in a long at any realistic row count).
    "docs_merge_upsert" -> ((s, dir) => {
      val base = Sources.documents(s, dir).select(col("doc_id"), col("text"))
      val src = base.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), upper(col("text")).as("new_text"), lit("u").as("op"))
        .unionByName(base.filter(col("doc_id") % 10 === 1)
          .select(col("doc_id"), lit(null).cast("string").as("new_text"),
            lit("d").as("op")))
        .unionByName(base.filter(col("doc_id") % 10 === 2)
          .select((col("doc_id") + 5000000000000L).as("doc_id"),
            concat(col("text"), lit(" v2")).as("new_text"), lit("i").as("op")))
      val merged = base.join(src, Seq("doc_id"), "full_outer")
        .withColumn("action",
          when(col("op") === "d", lit("deleted"))
            .when(col("op") === "u", lit("updated"))
            .when(col("op") === "i", lit("inserted"))
            .otherwise(lit("kept")))
        .withColumn("out_text",
          when(col("action") === "updated" || col("action") === "inserted",
            col("new_text")).otherwise(col("text")))
      merged
        .withColumn("h40",
          when(col("action") === "deleted", lit(0L)).otherwise(
            conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
              col("out_text")).cast("binary")), 1, 10), 16, 10).cast("long")))
        .groupBy("action")
        .agg(count(lit(1)).as("n_rows"), sum(col("h40")).as("content_sum"))
        .orderBy("action")
    }),

    // TIME-TRAVEL / versioned snapshot reads (round 6, lakehouse
    // surface): three commits land in a SnapshotStore (v1 full base,
    // v2 updates+deletes, v3 resurrecting re-inserts) and each version
    // is read back AS OF — latest-wins per id via the bounded-heap
    // top-1 operator, max-version tombstone join, manifest-gated
    // visibility (sources/SnapshotStore.scala documents the commit
    // protocol). The oracle replays the same deterministic commit
    // definitions as plain SQL state algebra, so matching counts +
    // content checksums prove the store's fold reconstructs every
    // version exactly. Complements docs_merge_upsert (one-shot MERGE)
    // and events_scd2 (validity intervals): this is the STORED,
    // multi-version, read-path half.
    "docs_snapshot_asof" -> ((s, dir) => {
      val out = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), "graft_snap_store")
      val fs = out.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(out)) fs.delete(out, true) // rebuild: commits are the demo
      val d = Sources.documents(s, dir)
      val store = out.toString
      sources.SnapshotStore.commit(
        d.select(col("doc_id"), col("text"), col("lang")), None, store, "doc_id")
      sources.SnapshotStore.commit(
        d.filter(col("doc_id") % 5 === 0)
          .select(col("doc_id"), concat(col("text"), lit(" [rev2]")).as("text"),
            col("lang")),
        Some(d.filter(col("doc_id") % 11 === 0 && col("doc_id") % 5 =!= 0)
          .select("doc_id")),
        store, "doc_id")
      sources.SnapshotStore.commit(
        d.filter(col("doc_id") % 11 === 0 && col("doc_id") % 5 =!= 0 &&
            col("doc_id") % 2 === 0)
          .select(col("doc_id"), concat(col("text"), lit(" [rev3]")).as("text"),
            col("lang")),
        None, store, "doc_id")
      (1 to 3).map { v =>
        sources.SnapshotStore.readAsOf(s, store, "doc_id", v)
          .withColumn("h40", conv(substring(md5(
            concat(col("doc_id").cast("string"), lit(":"), col("text"))
              .cast("binary")), 1, 10), 16, 10).cast("long"))
          .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"),
            sum(col("h40")).as("content_sum"))
          .select(lit(v).as("version"), col("n_docs"), col("id_sum"),
            col("content_sum"))
      }.reduce(_ unionByName _).orderBy("version")
    }),

    // WINSORIZATION (outlier clamping for training-feature hygiene):
    // clamp value into its per-type exact [p05, p95] band. Exact ranks,
    // not interpolated percentiles: the cut value is the row at
    // row_number ceil(q·n) under the total order (vq, event_id) — an
    // integer adjudication both engines replay bit-identically (values
    // pre-quantized to 1e-6 longs). Two shuffles (the per-type window +
    // the final aggregate); the cut table is tiny → broadcast back. At
    // 100 TB a per-type window with few types is skew-bound — the
    // at-scale twin is events_quantiles_approx's GK sketch (rank error
    // ε bounds the clamp drift); this exact form is the oracle-grade
    // reference for it.
    "events_winsorize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Sources.events(s, dir).select(col("event_type"), col("event_id"),
        floor(col("value") * 1e6 + 0.5).cast("long").as("vq"))
      val ranked = ev
        .withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy("vq", "event_id")))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      val cuts = ranked
        .groupBy("event_type")
        .agg(min(when(col("rn") === expr("(n * 5 + 99) div 100"), col("vq"))).as("p05"),
          min(when(col("rn") === expr("(n * 95 + 99) div 100"), col("vq"))).as("p95"))
      ranked.join(broadcast(cuts), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), min("p05").as("p05"), min("p95").as("p95"),
          sum(when(col("vq") < col("p05") || col("vq") > col("p95"), 1L)
            .otherwise(0L)).as("n_clamped"),
          sum(least(greatest(col("vq"), col("p05")), col("p95")))
            .as("sum_winsorized_q6"))
        .orderBy("event_type")
    }),

    // INVERTED PHRASE INDEX (retrieval primitive): bigram term → ordered
    // posting list of the documents containing it (bigram terms, not
    // unigrams, because a phrase index is what brute regex search can't
    // do — and the fixture's 31-word unigram vocab is all heavy
    // hitters). Build order is the scale contract: document frequency
    // FIRST, band the terms (df 2..50 — drop hapaxes and stopword-grade
    // heavy hitters), and only collect postings for SURVIVING terms —
    // collecting before filtering would materialize a billion-element
    // list under every hot term before HAVING could drop it. The
    // exploded (term, doc) view is materialized once and read by both
    // passes. Posting lists are df-capped → bounded per key; emitted as
    // a '|'-joined string in ascending doc order (one canonical byte
    // form on both engines).
    "text_inverted_index" -> ((s, dir) => {
      val terms = util.Views.materialize(
        Sources.documents(s, dir)
          .select(col("doc_id"),
            split(util.Norm.normalize(col("text")), " ").as("ws"))
          .select(col("doc_id"), explode(expr(
            """CASE WHEN size(ws) >= 2
              |     THEN transform(sequence(1, size(ws) - 1),
              |                    i -> struct(ws[i-1] AS w1, ws[i] AS w2))
              |     ELSE array() END""".stripMargin)).as("b"))
          .filter(col("b.w1") =!= "" && col("b.w2") =!= "")
          .select(col("doc_id"),
            concat(col("b.w1"), lit(" "), col("b.w2")).as("term"))
          .distinct())
      val surviving = terms.groupBy("term")
        .agg(count(lit(1)).as("df"))
        .filter(col("df").between(2, 50))
      terms.join(surviving, "term")
        .groupBy("term")
        .agg(min("df").as("df"),
          expr("array_join(transform(sort_array(collect_list(doc_id)), " +
            "x -> cast(x AS string)), '|')").as("postings"))
        .orderBy("term")
    }),

    // ARBITRARY GROUPING SETS (engine surface): rollup and cube are the
    // hierarchical/full lattices (yf_rollup, events_cube); this is the
    // general form — three hand-picked grains in ONE Expand pass over
    // the scan, where three separate GROUP BYs would scan three times.
    // Exposed through the SQL surface (GROUP BY GROUPING SETS is
    // SQL-only in Spark); grouping_id() ⇔ DuckDB GROUPING() share the
    // same first-arg-most-significant bitmask. gid-major ordering keeps
    // NULL grouping placeholders out of mixed sort groups (engines
    // disagree on NULL order).
    "events_grouping_sets" -> ((s, dir) => {
      Sources.events(s, dir)
        .select(col("event_type"),
          expr("(ts DIV 86400000000000) % 7").as("dow"),
          col("value"))
        .createOrReplaceTempView("graft_events_gs")
      s.sql("""
        SELECT event_type, dow,
          CAST(grouping_id(event_type, dow) AS BIGINT) AS gid,
          count(1) AS n_events,
          CAST(sum(CAST(value AS DECIMAL(38,8))) AS DOUBLE) AS sum_value
        FROM graft_events_gs
        GROUP BY GROUPING SETS ((event_type, dow), (event_type), (dow))
        ORDER BY gid, event_type, dow""")
    }),

    // RECURSIVE CTE (Spark 4's WITH RECURSIVE) — iterative graph
    // traversal expressed DECLARATIVELY: multi-hop reachability over the
    // thresholded co-purchase graph from a sparse seed set, reporting
    // how many parts are first reached at each hop (the BFS frontier
    // profile). The engine's hand-built iterative twin is
    // dedup_clusters' driver loop; the recursive form keeps the whole
    // iteration inside one SQL plan. Hop cap 3 bounds path enumeration
    // (UNION ALL recursion enumerates PATHS — on a denser graph the cap
    // and the support threshold are the fan-out guards, the same role
    // the LSH df-cap plays); first-reach dedup is a min-hop aggregate
    // at the end. DuckDB runs the identical recursion.
    "graph_reachability" -> ((s, dir) => {
      val op = Sources.lineitem(s, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      // MATERIALIZE the edge list before the recursion: each recursive
      // step re-evaluates the plan under the anchor CTEs, so an
      // unmaterialized edge derivation (distinct + self-join + groupBy
      // over the fact table) would run once per hop — measured 7.2 s at
      // sf0.1 vs ~1.5 s materialized. At cluster scale the edge list is
      // a stored artifact anyway (the graph_pagerank discipline).
      graft.util.Views.materialize(
        op.as("a").join(op.as("b"),
            col("a.o") === col("b.o") && col("a.p") < col("b.p"))
          .groupBy(col("a.p").as("u"), col("b.p").as("v"))
          .agg(count(lit(1)).as("support"))
          .filter(col("support") >= 2)
          .select("u", "v"))
        .createOrReplaceTempView("graft_reach_edges")
      s.sql("""
        WITH RECURSIVE adj AS (
          SELECT u AS src, v AS dst FROM graft_reach_edges
          UNION ALL SELECT v, u FROM graft_reach_edges),
        r(n, hop) AS (
          SELECT DISTINCT src AS n, 0 AS hop FROM adj WHERE src % 97 = 0
          UNION ALL
          SELECT adj.dst, r.hop + 1 FROM r JOIN adj ON r.n = adj.src
          WHERE r.hop < 3)
        SELECT hop, count(*) AS n_first_reached
        FROM (SELECT n, min(hop) AS hop FROM r GROUP BY n)
        GROUP BY hop ORDER BY hop""")
    }),

    // LISTAGG (SQL:2016 ordered string aggregation, Spark 4 surface):
    // the canonical-roster shape — per nation, the '|'-joined supplier
    // names in a DECLARED order (WITHIN GROUP makes the concatenation
    // deterministic; an unordered listagg is a nondeterminism bug, the
    // same trap collect_list has). Broadcast dimension join, one keyed
    // aggregate; roster payloads stay bounded by the dimension size.
    "nation_supplier_roster" -> ((s, dir) => {
      Sources.supplier(s, dir)
        .join(broadcast(Sources.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .createOrReplaceTempView("graft_roster")
      s.sql("""
        SELECT n_name,
          count(1) AS n_suppliers,
          listagg(s_name, '|') WITHIN GROUP (ORDER BY s_name) AS roster
        FROM graft_roster
        GROUP BY n_name ORDER BY n_name""")
    }),

    // EXCEPT — the set-op family's last member (union multiplex =
    // idx_union_years, INTERSECT = events_users_intersect), at (user,
    // day) granularity: click-days with no same-day purchase — the
    // unconverted-session signal (plain user-level EXCEPT is empty on
    // this fixture: every user eventually does everything). Exercises
    // MULTI-column EXCEPT; Spark lowers EXCEPT DISTINCT to distinct +
    // anti hash join — one shuffle per side at any scale, day math on
    // exact BIGINT nanos.
    "events_users_except" -> ((s, dir) => {
      val ev = Sources.events(s, dir)
        .select(col("event_type"), col("user_id"),
          expr("ts DIV 86400000000000").as("day_idx"))
      ev.filter(col("event_type") === "click").select("user_id", "day_idx")
        .except(ev.filter(col("event_type") === "purchase")
          .select("user_id", "day_idx"))
        .orderBy("user_id", "day_idx")
    }),

    // BAG-semantics set operations (EXCEPT ALL / INTERSECT ALL): the
    // multiplicity-preserving halves the DISTINCT-semantics set family
    // (events_users_intersect/_except) can't express — "how many click
    // rows survive after cancelling one-for-one against purchase rows"
    // is a per-key count SUBTRACTION, not a membership test. Spark plans
    // both as keyed count aggregates + a generate (no sort, map-side
    // partials), which is exactly how one would hand-write it at scale.
    // Both ops emit under one label column; per-user rollup keeps the
    // verified payload bounded.
    "events_bag_setops" -> ((s, dir) => {
      val ev = Sources.events(s, dir)
        .select(col("event_type"), col("user_id"),
          expr("ts DIV 86400000000000").as("day_idx"))
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "day_idx")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "day_idx")
      def rollup(df: org.apache.spark.sql.DataFrame, label: String) =
        df.groupBy("user_id")
          .agg(count(lit(1)).as("n_rows"), countDistinct(col("day_idx")).as("n_days"))
          .select(lit(label).as("op"), col("user_id"), col("n_rows"), col("n_days"))
      rollup(clicks.exceptAll(purchases), "except_all")
        .unionByName(rollup(clicks.intersectAll(purchases), "intersect_all"))
        .orderBy("op", "user_id")
    }),

    // Min-per-group JOIN-BACK (TPC-H Q2's correlated scalar subquery,
    // decorrelated): "the suppliers charging each part's minimum price"
    // — WHERE price = (SELECT min(price) ... WHERE partkey = outer)
    // becomes one per-part min aggregate joined back on (partkey, price)
    // EQUALITY, preserving tie multiplicity (the semantics min_by/argmax
    // flattens away — yf_weekly_ohlc pins that tier; this pins the
    // all-ties tier). Prices compare in EXACT decimal so the equality
    // join is well-defined cross-engine; the fact shuffles once on
    // partkey for the aggregate and the join reuses that partitioning.
    "part_cheapest_suppliers" -> ((s, dir) => {
      val li = Sources.lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey"),
          util.Stable.dec2(col("l_extendedprice")).as("price"))
      val mins = li.groupBy(col("l_partkey").as("mk"))
        .agg(min(col("price")).as("min_price"))
      li.join(mins,
          col("l_partkey") === col("mk") && col("price") === col("min_price"))
        .groupBy("l_partkey")
        .agg(countDistinct(col("l_suppkey")).as("n_cheapest"),
          min(col("l_suppkey")).as("best_supp"),
          min(col("min_price")).cast("double").as("min_price"))
        .orderBy("l_partkey")
    }),

    // NTILE DECILES (distribution profiling): equal-count value buckets
    // per type — the rank-based complement of the equi-WIDTH
    // events_value_histogram. ntile's remainder rule (first buckets get
    // the extra row) is SQL-standard and identical cross-engine GIVEN a
    // total order, so the quantized value ties break on event_id. The
    // per-type window is the same skew caveat as events_winsorize — the
    // at-scale path pre-aggregates by value or goes through the GK
    // sketch; this is the exact reference.
    "events_value_deciles" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      Sources.events(s, dir)
        .select(col("event_type"), col("event_id"),
          floor(col("value") * 1e6 + 0.5).cast("long").as("vq"))
        .withColumn("decile", ntile(10).over(
          Window.partitionBy("event_type").orderBy("vq", "event_id")))
        .groupBy("event_type", "decile")
        .agg(count(lit(1)).as("n_events"), min("vq").as("min_vq"),
          max("vq").as("max_vq"), sum("vq").as("sum_vq"))
        .orderBy("event_type", "decile")
    }),

    // WINDOW-FUNCTION completeness suite: the ranking family the rest of
    // the surface doesn't cover — rank / dense_rank (gap vs gapless
    // under TIES, so the order key is the 1e-2-quantized value alone and
    // ties are REAL), percent_rank ((rank−1)/(n−1)) and cume_dist (both
    // IEEE divisions of identical integers), plus the frame-navigation
    // trio first/nth/last_value over an explicit unbounded ROWS frame
    // with a TOTAL (vq, event_id) order so the navigated values are
    // deterministic. All windows partitioned by event_type — no global
    // ordering at any scale.
    "events_window_suite" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Sources.events(s, dir)
        .select(col("event_id"), col("event_type"),
          floor(col("value") * 100.0 + 0.5).cast("long").as("vq"))
      val wTies = Window.partitionBy("event_type").orderBy("vq")
      val wFull = Window.partitionBy("event_type").orderBy("vq", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      ev.withColumn("rnk", rank().over(wTies))
        .withColumn("drnk", dense_rank().over(wTies))
        .withColumn("prnk", percent_rank().over(wTies))
        .withColumn("cdist", cume_dist().over(wTies))
        .withColumn("first_vq", first(col("vq")).over(wFull))
        .withColumn("second_vq", nth_value(col("vq"), 2).over(wFull))
        .withColumn("last_vq", last(col("vq")).over(wFull))
        .orderBy("event_type", "vq", "event_id")
    }),

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

    // PER-GROUP Z-SCORE OUTLIERS (feature normalization + anomaly
    // flagging): standardize n_chars within its language and keep
    // |z| > 1.5 (the fixture's length distribution is near-uniform,
    // whose |z| tops out at √3 — a 2.0 cut would leave only the
    // handful of genuine tail docs). One grouped aggregate over exact
    // integer sums (sum,
    // sum-of-squares on BIGINT — n_chars² sums stay far below 2⁵³ at any
    // plausible corpus; quantize or go DECIMAL beyond that) broadcast
    // back over the corpus — z is then derived from bit-identical
    // integers by one fixed IEEE expression tree, so the |z| > 2 cut
    // adjudicates identically on both engines. Groups with n < 2 or
    // zero variance are EXCLUDED in-stats (z would be NaN — and NaN
    // comparison semantics differ across engines, so NaN must never
    // reach the filter).
    "docs_zscore_outliers" -> ((s, dir) => {
      val d = Sources.documents(s, dir).select(col("doc_id"), col("lang"), col("n_chars"))
      val stats = d.groupBy("lang").agg(
          count(lit(1)).as("n"), sum("n_chars").as("s"),
          sum(col("n_chars") * col("n_chars")).as("ss"))
        .filter(col("n") >= 2 &&
          (col("ss") - col("s").cast("double") * col("s") / col("n")) > 0.0)
      val z = (col("n_chars") - col("s").cast("double") / col("n")) /
        sqrt((col("ss") - col("s").cast("double") * col("s") / col("n")) /
          (col("n") - 1))
      d.join(broadcast(stats), "lang")
        .withColumn("z", z)
        .filter(abs(col("z")) > 1.5)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          util.Stable.sig(col("z")).as("z_sig"))
        .orderBy("doc_id")
    }),

    // RFM SEGMENTATION (recency / frequency / monetary — the classic
    // customer-base triage): per customer, days since last order (anchor
    // = the corpus's own max order day, so the query is data-derived and
    // reproducible forever), order count, and exact-decimal revenue;
    // each dimension quintiles via ntile(5) with o_custkey tiebreak
    // (score 5 = best: most recent / most frequent / highest spend) and
    // the output aggregates to SEGMENT grain (r·100+f·10+m), so the
    // verified payload is ≤125 rows however many customers exist. The
    // three ntile windows run over the POST-AGGREGATE one-row-per-
    // customer grain (the customer_pareto precedent); at billions of
    // customers the rank-free path is the GK quantile cut
    // (events_quantiles_approx) producing the same score boundaries.
    // Revenue decimal ordering and integer day/count ordering make every
    // quintile boundary adjudicate identically on both engines.
    "customer_rfm" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cust = Sources.orders(s, dir)
        .groupBy("o_custkey")
        .agg(
          max(datediff(col("o_orderdate").cast("date"), lit("1970-01-01"))
            .cast("long")).as("last_day"),
          count(lit(1)).as("freq"),
          sum(util.Stable.dec2(col("o_totalprice"))).as("rev"))
      val anchor = cust.agg(max(col("last_day")).as("ref_day"))
      cust.crossJoin(broadcast(anchor))
        .withColumn("recency_days", col("ref_day") - col("last_day"))
        .withColumn("r_score",
          ntile(5).over(Window.orderBy(col("last_day"), col("o_custkey"))))
        .withColumn("f_score",
          ntile(5).over(Window.orderBy(col("freq"), col("o_custkey"))))
        .withColumn("m_score",
          ntile(5).over(Window.orderBy(col("rev"), col("o_custkey"))))
        .withColumn("segment",
          col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
        .groupBy("segment")
        .agg(count(lit(1)).as("n_customers"),
          (sum(col("recency_days")).cast("double") / count(lit(1)))
            .as("avg_recency_days"),
          sum(col("freq")).as("n_orders"),
          sum(col("rev")).cast(DecimalType(38, 2)).cast("double").as("revenue"))
        .orderBy("segment")
    }),

    // MARKET-BASKET PAIR MINING (association rules: support / confidence
    // / lift over co-purchased parts). The at-scale shape end to end:
    // DISTINCT (order, part) FIRST so line-level duplicates never inflate
    // the pair join; a basket-size cap (2..20 — the boilerplate-hot-key
    // guard of docs_cross_source_dup applied to baskets) bounds the
    // self-join fan-out at C(20,2)=190 rows per order; pair counts and
    // item counts are keyed aggregates with map-side partials; a minimum
    // support of 3 cuts the long tail BEFORE the metric joins; and the
    // top-20-by-lift emission is a TakeOrderedAndProject, never a global
    // sort. Lift = n_ab·n_orders / (n_a·n_b) — ONE IEEE division of
    // exact BIGINT products (counts < 2^31 keep the products far inside
    // BIGINT at any SF), so the ranking and the cut adjudicate
    // identically on both engines; (lift desc, part_a, part_b) is total.
    "orders_basket_lift" -> ((s, dir) => {
      val items = Sources.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val sizes = items.groupBy("l_orderkey")
        .agg(count(lit(1)).as("basket_size"))
        .filter(col("basket_size").between(2, 20))
        .select("l_orderkey")
      // `kept` feeds FOUR consumers (both self-join sides, item counts,
      // the order count) — materialize once so the distinct + size-band
      // subtree isn't recomputed per consumer (the lshVerifiedPairs
      // discipline; at cluster scale this is a cached/checkpointed
      // intermediate table).
      val kept = graft.util.Views.materialize(items.join(sizes, "l_orderkey"))
      val nOrders = kept.agg(countDistinct(col("l_orderkey")).as("n_orders"))
      val itemCnt = kept.groupBy("l_partkey").agg(count(lit(1)).as("n_item"))
      val pairs = kept.as("a")
        .join(kept.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 3)
      pairs
        .join(itemCnt.select(col("l_partkey").as("part_a"), col("n_item").as("n_a")),
          "part_a")
        .join(itemCnt.select(col("l_partkey").as("part_b"), col("n_item").as("n_b")),
          "part_b")
        .crossJoin(broadcast(nOrders))
        .withColumn("support", col("n_ab").cast("double") / col("n_orders"))
        .withColumn("confidence", col("n_ab").cast("double") / col("n_a"))
        .withColumn("lift",
          (col("n_ab") * col("n_orders")).cast("double") / (col("n_a") * col("n_b")))
        .select("part_a", "part_b", "n_ab", "n_a", "n_b",
          "support", "confidence", "lift")
        .orderBy(col("lift").desc, col("part_a"), col("part_b"))
        .limit(20)
    }),

    // MAD-BASED ANOMALY DETECTION (median absolute deviation — the
    // robust-stats complement of docs_zscore_outliers: medians don't
    // move when the outliers themselves do). Values quantize to 1e-6
    // longs; both medians are then EXACT in half-units (an even-n median
    // of integers is (a+b)/2 — doubling it recovers the integer a+b, and
    // integer sums ≤2^53 are exact in the double percentile returns), so
    // med2 is half-quanta, the per-row deviation dev2 = |2·vq − med2| is
    // pure BIGINT, and mad4 (the median of dev2, doubled again) is
    // quarter-quanta. The standard 3σ-equivalent cut |dev| > 3·1.4826·mad
    // becomes the INTEGER comparison dev2·10000 > 22239·mad4 (both sides
    // ≤ ~1e13 here; ≪ 2^63 at any plausible value scale) — zero FP
    // adjudication anywhere. Two keyed aggregations plus two broadcast
    // joins of the per-type stat tables; at a billion rows per type the
    // exact in-group sort behind percentile() is the cost, and the
    // rank-free path is GK (events_quantiles_approx) with the same
    // integer adjudication downstream.
    "events_anomaly_mad" -> ((s, dir) => {
      val ev = Sources.events(s, dir)
        .select(col("event_type"), floor(col("value") * 1e6 + 0.5).cast("long").as("vq"))
      val med = ev.groupBy("event_type").agg(
        expr("CAST(round(percentile(vq, 0.5D) * 2) AS BIGINT)").as("med2"),
        count(lit(1)).as("n_events"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("dev2", abs(col("vq") * 2 - col("med2")))
      val mad = dev.groupBy("event_type").agg(
        expr("CAST(round(percentile(dev2, 0.5D) * 2) AS BIGINT)").as("mad4"))
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type", "n_events", "med2", "mad4")
        .agg(
          sum((col("dev2") * 10000L > col("mad4") * 22239L).cast("long"))
            .as("n_outliers"),
          max(col("dev2")).as("max_dev2"))
        .select(col("event_type"), col("n_events"),
          (col("med2") / 2e6).as("median_value"),
          (col("mad4") / 4e6).as("mad_value"),
          col("n_outliers"),
          (col("max_dev2") / 2e6).as("max_abs_dev"))
        .orderBy("event_type")
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

    // CHI-SQUARE INDEPENDENCE TEST (event_type × day-of-week contingency
    // — the categorical sibling of events_ab_test's z readout: "does
    // event mix depend on weekday?"). Observed counts are one keyed
    // aggregate; marginals re-aggregate the CELL table (≤ types×7 rows —
    // never a second corpus pass) and broadcast back. Each cell's
    // (o−e)²/e is one IEEE tree over exact integers (e = r·c/n with r·c
    // in BIGINT), bit-identical per cell — but a cross-partition SUM of
    // doubles is order-dependent, so each term QUANTIZES to 1e-6 longs
    // first and the statistic is an exact integer sum divided back once
    // (the suite's summation-order discipline applied to a test
    // statistic). Cramér's V derives from the quantized χ² in one more
    // IEEE tree. Output: one row (n, dof, chi2, cramers_v).
    "events_chi2_independence" -> ((s, dir) => {
      val cells = Sources.events(s, dir)
        .groupBy(col("event_type"),
          expr("(ts DIV 86400000000000) % 7").as("dow"))
        .agg(count(lit(1)).as("o"))
      val rowTot = cells.groupBy("event_type").agg(sum(col("o")).as("r"))
      val colTot = cells.groupBy("dow").agg(sum(col("o")).as("c"))
      val n = cells.agg(sum(col("o")).as("n"),
        countDistinct(col("event_type")).as("nr"),
        countDistinct(col("dow")).as("nc"))
      val terms = cells
        .join(broadcast(rowTot), "event_type")
        .join(broadcast(colTot), "dow")
        .crossJoin(broadcast(n))
        .withColumn("e", (col("r") * col("c")).cast("double") / col("n"))
        .withColumn("term_q",
          floor((col("o") - col("e")) * (col("o") - col("e")) / col("e") * 1e6
            + 0.5).cast("long"))
      terms
        .groupBy("n", "nr", "nc")
        .agg(sum(col("term_q")).as("chi2_q"))
        .select(col("n"),
          ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
          (col("chi2_q") / 1e6).as("chi2"),
          sqrt(col("chi2_q") / 1e6 /
            (col("n") * least(col("nr") - 1, col("nc") - 1))).as("cramers_v"))
    }),

    // CUSUM CHANGE-POINT DETECTION (where did a type's daily volume
    // shift?): the classic cumulative-sum statistic S_k = Σ_{i≤k}(c_i −
    // mean) maximized over k — computed ENTIRELY in integers by scaling
    // through the mean's denominator: D·prefix_k − k·T (D = days with
    // events for the type, T = total events) is BIGINT-exact, so the
    // argmax needs no FP adjudication; ties break to the earliest day.
    // Per-type daily counts are one keyed aggregate; the prefix sum and
    // row index are per-type windows; the argmax is a second keyed
    // aggregate joined back co-keyed (never a sort of the day table).
    // At 100 TB this is the shape you'd run per metric series after an
    // incremental per-day rollup (events_incremental_agg feeds it).
    "events_cusum_shift" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dayCnt = Sources.events(s, dir)
        .groupBy(col("event_type"), expr("ts DIV 86400000000000").as("day"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val tot = dayCnt.groupBy("event_type")
        .agg(sum(col("c")).as("t"), count(lit(1)).as("d"))
      val scored = dayCnt
        .withColumn("prefix", sum(col("c")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("k", row_number().over(w))
        .join(broadcast(tot), "event_type")
        .withColumn("stat", abs(col("d") * col("prefix") - col("k") * col("t")))
      val best = scored.groupBy("event_type").agg(max(col("stat")).as("stat"))
      scored.join(broadcast(best), Seq("event_type", "stat"))
        .groupBy(col("event_type"), col("stat"), col("t"), col("d"))
        .agg(min(col("day")).as("shift_day"))
        .select(col("event_type"), col("d").as("n_days"),
          col("t").as("total_events"), col("shift_day"),
          (col("stat") / col("d").cast("double")).as("max_abs_cusum"))
        .orderBy("event_type")
    }),

    // BM25 RANKED RETRIEVAL (the scoring function behind every lexical
    // search/dedup-candidate/decontamination retriever; text_tfidf stops
    // at the weight, this ranks). Query terms are DATA-DERIVED — the 5
    // rarest corpus words (df asc, ties broken by word — deterministic
    // at any SF) stand in for a query workload; each term scores ONLY
    // the docs containing it (posting-restricted via broadcast semi-join
    // on the tiny term table — the inverted-index discipline, never a
    // corpus × query cross). Score = idf · tf·(k1+1)/(tf + k1·(1−b +
    // b·dl·N/Σdl)) with k1=1.2, b=0.75: idf QUANTIZES ln to 1e-4 longs
    // (the text_word_entropy contract), and the rest is one fixed IEEE
    // tree over exact integers (tf, dl, N, Σdl), so scores are
    // bit-identical cross-engine and the top-10-per-term window
    // (score desc, doc_id) adjudicates identically. Per-term windows —
    // no global ordering; tf/df/dl are the same keyed aggregates the
    // tfidf/inverted-index queries already scale.
    "docs_bm25_topk" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val words = Sources.documents(s, dir)
        .select(col("doc_id"),
          explode(split(util.Norm.normalize(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
      val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val dl = words.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val dfreq = words.groupBy("word").agg(countDistinct(col("doc_id")).as("df"))
      val qterms = dfreq
        .orderBy(col("df"), col("word")).limit(5)
      val corpus = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      val idfQ = floor(
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) * 1e4
          + 0.5).cast("long")
      val w = Window.partitionBy("word").orderBy(col("score").desc, col("doc_id"))
      tf.join(broadcast(qterms), "word")
        .join(dl, "doc_id")
        .crossJoin(broadcast(corpus))
        .withColumn("score",
          (idfQ / 1e4) * (col("tf") * lit(2.2)) /
            (col("tf") + lit(1.2) * (lit(1.0) - 0.75 +
              lit(0.75) * col("dl") * col("n_docs") / col("sum_dl"))))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select("word", "rank", "doc_id", "tf", "df", "dl", "score")
        .orderBy("word", "rank")
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

    // SEQUENCE / PATH MINING (which 3-step journeys dominate? — the
    // product-analytics question MATCH_RECOGNIZE answers on engines that
    // have it, composed here from bounded windows): each (user, day)
    // contributes its FIRST three event types in (ts, event_id) order —
    // the rank cut happens BEFORE any aggregation, so per-key state is
    // bounded at 3 rows however hot the user (the TopK discipline; a
    // collect-then-slice would materialize unbounded arrays). Paths
    // assemble via sort_array(collect_list(struct(rn, type))) — ≤3
    // entries, deterministic order — and the top-10 paths emit through
    // TakeOrderedAndProject with (count desc, path) total order. One
    // window + two keyed aggregates, all user/day/path-keyed.
    "events_top_paths" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window
        .partitionBy(col("user_id"), expr("ts DIV 86400000000000"))
        .orderBy(col("ts"), col("event_id"))
      Sources.events(s, dir)
        .select(col("user_id"), expr("ts DIV 86400000000000").as("day"),
          col("ts"), col("event_id"), col("event_type"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .groupBy("user_id", "day")
        .agg(expr("array_join(transform(array_sort(collect_list(" +
          "struct(rn, event_type))), e -> e.event_type), '>')").as("path"))
        .groupBy("path")
        .agg(count(lit(1)).as("n_user_days"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("n_user_days").desc, col("path"))
        .limit(10)
    }),

    // SCHEMA EVOLUTION ON READ (the 100 TB reality the round-5 ts-drift
    // incident made concrete: a long-lived table's files were written by
    // MANY writer generations). Two parquet generations land under the
    // warehouse — v1 with the original (doc_id, text) schema, v2 adding
    // a n_chars column — and ONE mergeSchema read reconstructs the union
    // schema, filling the missing column with nulls instead of failing
    // or silently dropping files (schema-on-read's widening half;
    // events_jsonl_badrows covers the malformed-row half). The audit
    // aggregates by writer generation (n_chars IS NULL ⇔ legacy file)
    // with the house 40-bit-md5 content checksum proving every row of
    // both generations survived the merged scan byte-intact. At scale
    // mergeSchema's footer reconciliation is a one-time planning cost;
    // the per-file projection adapts at the reader, row-group pruning
    // intact.
    "docs_schema_evolution" -> ((s, dir) => {
      val base = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), "graft_docs_schema_evo")
      val docs = Sources.documents(s, dir)
      docs.filter(col("doc_id") % 2 === 0).select("doc_id", "text")
        .write.mode("overwrite").parquet(s"$base/gen=1")
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("text"), col("n_chars").cast("long").as("n_chars"))
        .write.mode("overwrite").parquet(s"$base/gen=2")
      s.read.option("mergeSchema", "true")
        .parquet(s"$base/gen=1", s"$base/gen=2")
        .withColumn("legacy_schema", col("n_chars").isNull)
        .withColumn("h40", conv(substring(md5(concat(
          col("doc_id").cast("string"), lit(":"), col("text")).cast("binary")),
          1, 10), 16, 10).cast("long"))
        .groupBy("legacy_schema")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("sum_doc_id"),
          sum(col("n_chars")).as("sum_n_chars"),
          sum(col("h40")).as("content_sum"))
        .orderBy("legacy_schema")
    }),

    // LSH RETRIEVAL QUALITY AUDIT (precision/recall of the banding
    // itself — completing the quality-audit symmetry: sim_ann_recall
    // audits the ANN tier, dedup_minhash_estimate audits the similarity
    // ESTIMATOR, this audits the candidate RETRIEVAL): ground truth =
    // the exact all-pairs Jaccard≥0.6 set (the declared exact tier —
    // fixture-feasible here; at corpus scale the truth set comes from a
    // SAMPLE, the standard continuous-audit protocol), retrieved = the
    // banded LSH candidate pairs. Precision/recall/F1 derive from three
    // exact pair counts in one fixed IEEE tree. A recall drop says the
    // band/row split no longer matches the dedup threshold — re-tune
    // bands, don't trust the index (the dedup_minhash_estimate rule,
    // applied to the retrieval stage).
    "dedup_lsh_recall" -> ((s, dir) => {
      val docs = dedup.Dedup.augmented(Sources.documents(s, dir))
      val truth = graft.util.Views.materialize(
        dedup.Dedup.jaccardPairs(docs, "doc_id", "text", 0.6, None)
          .select("id_a", "id_b"))
      val cand = graft.util.Views.materialize(
        dedup.Dedup.lshCandidates(docs, "doc_id", "text"))
      val hit = truth.join(cand, Seq("id_a", "id_b"), "left_semi")
      truth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(broadcast(cand.agg(count(lit(1)).as("n_candidates"))))
        .crossJoin(broadcast(hit.agg(count(lit(1)).as("n_hits"))))
        .withColumn("precision",
          col("n_hits").cast("double") / nullif(col("n_candidates"), lit(0L)))
        .withColumn("recall",
          col("n_hits").cast("double") / nullif(col("n_truth"), lit(0L)))
        .withColumn("f1",
          lit(2.0) * col("precision") * col("recall") /
            nullif(col("precision") + col("recall"), lit(0.0)))
    }),

    // PROMO REVENUE SHARE (TPC-H Q14 shape — the conditional-aggregate
    // join: what fraction of each month's discounted revenue came from
    // promo parts?). Revenue terms follow the dec2/rate2 exact-decimal
    // discipline (price and discount cast to decimal BEFORE arithmetic,
    // so every product and both sums are exact and order-free); the
    // share is one IEEE division of two exact decimals ×100. The
    // fact-dim join is key-equi on partkey — co-partitioned at scale
    // (the dim projection is 2 columns; broadcast if it fits, shuffle
    // join if not — either plan is correct, the aggregate is downstream
    // of the join in both). One keyed aggregate at month grain.
    "orders_promo_share" -> ((s, dir) => {
      val rev = (util.Stable.dec2(col("l_extendedprice")) *
        (util.Stable.rate2(lit(1.0)) - util.Stable.rate2(col("l_discount"))))
      Sources.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1996-01-01"))
        .join(Sources.part(s, dir).select("p_partkey", "p_type"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
        .agg(
          util.Stable.exactSumAt(when(col("p_type") === "PROMO", rev), 4)
            .as("promo_revenue"),
          util.Stable.exactSumAt(rev, 4).as("total_revenue"),
          count(lit(1)).as("n_items"))
        .withColumn("promo_share_pct",
          col("promo_revenue") / col("total_revenue") * 100.0)
        .orderBy("month")
    }),

    // ORC INTERCHANGE ROUNDTRIP (the second columnar format, completing
    // the format matrix: parquet native, CSV catalog + DSv2, JSONL wire
    // + dead-letter, now ORC — a user migrating an ORC lake runs this
    // path): events write to ORC on the long-nanos wire contract (the
    // jsonl_roundtrip discipline — a ts-type drift fails at the cast,
    // loudly) and read back through ORC's own reader, aggregate
    // hash-matched against the parquet-direct oracle, proving the
    // encode/decode preserves every row and type. ORC carries its own
    // footer statistics — the spec pins that predicate pushdown reaches
    // the ORC scan just like parquet's (the at-scale reason to care
    // which columnar format: both must prune, and do).
    "events_orc_roundtrip" -> ((s, dir) => {
      val out = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), "graft_events_orc")
      Sources.events(s, dir)
        .select(col("event_id"), col("ts").cast("long").as("ts"),
          col("user_id"), col("event_type"),
          floor(col("value") * 1e8 + 0.5).cast("long").as("value_q8"))
        .coalesce(8)
        .write.mode("overwrite").orc(out.toString)
      s.read.orc(out.toString)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value_q8")).as("sum_value_q8"),
          min(col("ts")).as("min_ts_ns"), max(col("ts")).as("max_ts_ns"),
          sum(col("user_id")).as("user_id_sum"))
        .orderBy("event_type")
    }),

    // CORRELATED LATERAL JOIN (SQL:1999 LATERAL — the "for each outer
    // row, run this parameterized subquery" operator users reach for
    // before they know window functions): top-3 orders per customer
    // written as JOIN LATERAL (... ORDER BY ... LIMIT 3). Catalyst
    // DECORRELATES it (DecorrelateInnerQuery): the per-row subquery
    // becomes a window/partitioned-limit over one co-keyed join — the
    // plan a 1000-executor cluster can run, not N outer-row subquery
    // executions. Same result contract as top_orders_per_customer
    // (window form) and _auto (bounded-heap operator form) — three
    // formulations of one operator, all hash-matching; the oracle runs
    // DuckDB's OWN lateral implementation, so two independent
    // decorrelations check each other.
    "orders_lateral_topk" -> ((s, dir) => {
      Sources.customer(s, dir).select("c_custkey")
        .createOrReplaceTempView("g_lat_customer")
      Sources.orders(s, dir).createOrReplaceTempView("g_lat_orders")
      s.sql("""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM g_lat_customer c
        JOIN LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM g_lat_orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 3) t
        ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""")
    }),

    // ——— TPC-H completion family (round 7): the 11 published queries
    // not yet covered by a shape twin, adapted where this testdata lacks
    // partsupp / l_shipmode / l_commitdate / c_phone / p_container (each
    // adaptation noted on its query). With these, every one of the 22
    // TPC-H queries has a running oracle-checked representative:
    // Q1/Q3/Q6 verbatim; Q2≈part_cheapest_suppliers,
    // Q4≈orders_priority_semijoin, Q11≈part_revenue_share,
    // Q13≈orders_per_customer_distribution, Q14≈orders_promo_share,
    // Q17≈part_small_qty_revenue, Q18≈orders_large_baskets,
    // Q21≈orders_sole_late_supplier; Q5/7/8/9/10/12/15/16/19/20/22 here.
    // All money math follows the dec2/rate2 + exactSumAt discipline
    // (Stable.scala) so sums are order-independent and engine-exact.

    // TPC-H Q5 — local-supplier volume: revenue by supplier nation for
    // one region-year where the CUSTOMER's nation equals the SUPPLIER's
    // nation. The facts co-key on orderkey once; the nation⋈region slice
    // broadcasts (25×5 rows); supplier broadcasts here (1/10 of
    // customer — at 100 TB it would shuffle on suppkey exactly like
    // customer does on custkey: the hint changes, the shape doesn't).
    // The c_nationkey=s_nationkey equality is a post-join RESIDUAL — it
    // cannot be a join key without first losing the region cut, and
    // filtering suppliers to the region BEFORE the customer join keeps
    // the biggest intermediate as small as the region allows.
    "tpch_q5" -> ((s, dir) => {
      val asiaNations = Sources.nation(s, dir)
        .join(Sources.region(s, dir).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val rev = util.Stable.dec2(col("l_extendedprice")) *
        (util.Stable.rate2(lit(1.0)) - util.Stable.rate2(col("l_discount")))
      Sources.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"), rev.as("rev"))
        .join(Sources.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Sources.supplier(s, dir)
          .select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(asiaNations),
          col("s_nationkey") === col("n_nationkey"))
        .join(Sources.customer(s, dir).select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(util.Stable.exactSumAt(col("rev"), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // TPC-H Q7 — volume shipping between two nations, both directions,
    // by ship year. Each dimension is cut to the two nations BEFORE its
    // join (2/25 of suppliers/customers survive), the pair constraint
    // reduces to supp_nation ≠ cust_nation once both sides are
    // restricted to the pair, and the year comes off l_shipdate — so
    // the fact is filtered to the two ship-years at the scan.
    "tpch_q7" -> ((s, dir) => {
      val n = Sources.nation(s, dir)
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select("n_nationkey", "n_name")
      val sup = Sources.supplier(s, dir).select("s_suppkey", "s_nationkey")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Sources.customer(s, dir).select("c_custkey", "c_nationkey")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val rev = util.Stable.dec2(col("l_extendedprice")) *
        (util.Stable.rate2(lit(1.0)) - util.Stable.rate2(col("l_discount")))
      Sources.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).as("l_year"), rev.as("rev"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(Sources.orders(s, dir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(util.Stable.exactSumAt(col("rev"), 4).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q8 — national market share: NATION_3 suppliers' share of
    // AMERICA-region customers' STANDARD-part revenue, by order year.
    // The share is a conditional-sum ratio (orders_promo_share
    // discipline): both sums land exact-decimal at their true scale,
    // then ONE IEEE division of bit-identical operands per year.
    // Unlike Q5, the supplier nation is NOT filtered — every supplier
    // contributes to the denominator; only the numerator is cut.
    "tpch_q8" -> ((s, dir) => {
      val americaCust = Sources.customer(s, dir)
        .select("c_custkey", "c_nationkey")
        .join(broadcast(Sources.nation(s, dir)
          .join(Sources.region(s, dir).filter(col("r_name") === "AMERICA"),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey")),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey")
      val suppNation = Sources.supplier(s, dir)
        .select("s_suppkey", "s_nationkey")
        .join(broadcast(Sources.nation(s, dir)
          .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val rev = util.Stable.dec2(col("l_extendedprice")) *
        (util.Stable.rate2(lit(1.0)) - util.Stable.rate2(col("l_discount")))
      Sources.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          rev.as("rev"))
        .join(Sources.part(s, dir).filter(col("p_type") === "STANDARD")
          .select("p_partkey"),
          col("l_partkey") === col("p_partkey"))
        .join(Sources.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .join(americaCust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .groupBy("o_year")
        .agg(
          coalesce(util.Stable.exactSumAt(
            when(col("supp_nation") === "NATION_3", col("rev")), 4), lit(0.0))
            .as("nation_revenue"),
          util.Stable.exactSumAt(col("rev"), 4).as("total_revenue"))
        .withColumn("mkt_share", col("nation_revenue") / col("total_revenue"))
        .orderBy("o_year")
    }),

    // TPC-H Q9 — product-type profit by nation and year. ADAPTED: the
    // testdata has no partsupp, so supply cost is modeled as 60% of
    // retail (cost = 0.60 · p_retailprice · l_quantity) — the plan shape
    // (LIKE-filtered part cut, 5-way join, profit aggregate) is intact.
    // All three profit terms are exact decimal; the difference's true
    // scale is 6, so the sum emits at 6.
    "tpch_q9" -> ((s, dir) => {
      val rev = util.Stable.dec2(col("l_extendedprice")) *
        (util.Stable.rate2(lit(1.0)) - util.Stable.rate2(col("l_discount")))
      val cost = util.Stable.rate2(lit(0.6)) *
        util.Stable.dec2(col("p_retailprice")) *
        util.Stable.dec2(col("l_quantity"))
      Sources.lineitem(s, dir)
        .join(Sources.part(s, dir).filter(col("p_name").like("%red%"))
          .select("p_partkey", "p_retailprice"),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Sources.supplier(s, dir)
          .select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Sources.nation(s, dir)
          .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .join(Sources.orders(s, dir)
          .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("nation", col("n_name"))
        .groupBy("nation", "o_year")
        .agg(util.Stable.exactSumAt(rev - cost, 6).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // TPC-H Q10 — returned-item reporting: top 20 customers by revenue
    // of 'R'-flagged lineitems in one quarter. The fact aggregates to
    // customer grain BEFORE any dimension join (Q13 discipline — the
    // shuffle carries one row per customer, never raw lineitems), then
    // the post-aggregate key set joins customer + broadcast nation and
    // TakeOrderedAndProject caps the answer without a global sort.
    "tpch_q10" -> ((s, dir) => {
      val rev = util.Stable.dec2(col("l_extendedprice")) *
        (util.Stable.rate2(lit(1.0)) - util.Stable.rate2(col("l_discount")))
      Sources.lineitem(s, dir).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), rev.as("rev"))
        .join(Sources.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(util.Stable.exactSumAt(col("rev"), 4).as("revenue"))
        .join(Sources.customer(s, dir)
          .select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Sources.nation(s, dir)
          .select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q12 — shipping-priority split. ADAPTED: no l_shipmode /
    // l_commitdate / l_receiptdate in the testdata, so l_linestatus
    // stands in for the mode grouping and "late" = shipped >30 days
    // after the order date, within one ship-year. The CASE-sum pivot of
    // order priorities into high/low counts is the query's signature
    // shape and survives the adaptation verbatim.
    "tpch_q12" -> ((s, dir) => {
      val highPrio = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Sources.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linestatus", "l_shipdate")
        .join(Sources.orders(s, dir)
          .select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy("l_linestatus")
        .agg(
          sum(when(highPrio, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(highPrio, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_linestatus")
    }),

    // TPC-H Q15 — top supplier: per-supplier revenue over one quarter,
    // keep the supplier(s) achieving the MAX. The scalar max subquery
    // decorrelates to a 1-row broadcast crossJoin (part_revenue_share
    // discipline); the equality runs on the exact DECIMAL revenue, so
    // ties are exact — no double-compare hazard — and only the final
    // projection downcasts to double for the dump.
    "tpch_q15" -> ((s, dir) => {
      val rev = (util.Stable.dec2(col("l_extendedprice")) *
        (util.Stable.rate2(lit(1.0)) - util.Stable.rate2(col("l_discount"))))
        .cast(util.Stable.MoneyDec)
      val perSupp = Sources.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .select(col("l_suppkey"), rev.as("rev"))
        .groupBy("l_suppkey").agg(sum(col("rev")).as("total_rev"))
      val mx = perSupp.agg(max(col("total_rev")).as("max_rev"))
      perSupp.crossJoin(broadcast(mx))
        .filter(col("total_rev") === col("max_rev"))
        .join(broadcast(Sources.supplier(s, dir).select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast(DecimalType(38, 4)).cast("double")
            .as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q16 — parts/supplier relationship counts. ADAPTED: no
    // partsupp, so the supplier-part relation is the DISTINCT
    // (l_partkey, l_suppkey) pairs observed in lineitem, and the
    // "complaints" supplier exclusion becomes negative-acctbal
    // suppliers. The anti join replaces NOT IN (broadcast — the
    // excluded set is a filtered dimension), and the distinct count
    // rides the same shuffle as the group keys.
    "tpch_q16" -> ((s, dir) => {
      val badSupp = Sources.supplier(s, dir).filter(col("s_acctbal") < 0)
        .select("s_suppkey")
      Sources.lineitem(s, dir).select("l_partkey", "l_suppkey")
        .join(broadcast(badSupp),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(Sources.part(s, dir)
          .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45))
          .select("p_partkey", "p_brand", "p_type", "p_size"),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // TPC-H Q19 — discounted revenue under an OR-of-ANDs predicate (no
    // p_container/l_shipmode in the testdata, so the disjuncts run on
    // brand × size × quantity only — the disjunctive-pushdown shape is
    // the point). Catalyst factors the common conjuncts out of the OR:
    // the part scan receives brand-IN and size-range pushed filters,
    // the lineitem scan a quantity range, and only the residual
    // cross-term OR evaluates post-join.
    "tpch_q19" -> ((s, dir) => {
      val rev = util.Stable.dec2(col("l_extendedprice")) *
        (util.Stable.rate2(lit(1.0)) - util.Stable.rate2(col("l_discount")))
      Sources.lineitem(s, dir)
        .select(col("l_partkey"), col("l_quantity"), rev.as("rev"))
        .join(Sources.part(s, dir).select("p_partkey", "p_brand", "p_size"),
          col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#21" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(util.Stable.exactSumAt(col("rev"), 4).as("revenue"),
          count(lit(1)).as("n_rows"))
    }),

    // TPC-H Q20 — excess-inventory suppliers. ADAPTED: no
    // partsupp.ps_availqty, so the predicate becomes "dominant
    // supplier": shipped more than HALF a red%-part's 1997 total across
    // all suppliers. The correlated half-of-total subquery decorrelates
    // to a window over the (supplier, part) aggregate's own l_partkey
    // partitioning (part_small_qty_revenue discipline — the window
    // reuses the groupBy shuffle, no second pass over the fact), the
    // comparison is division-free decimal, and the supplier dimension
    // joins only the tiny qualifying key set.
    "tpch_q20" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
      Sources.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(Sources.part(s, dir).filter(col("p_name").like("red%"))
          .select("p_partkey"),
          col("l_partkey") === col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(sum(util.Stable.dec2(col("l_quantity"))).as("qty"))
        .withColumn("tot", sum(col("qty")).over(w))
        .filter(col("qty") * 2 > col("tot"))
        .select("l_suppkey").distinct()
        .join(broadcast(Sources.supplier(s, dir).select("s_suppkey", "s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    }),

    // TIME-SERIES DENSIFICATION (gap fill): per-user daily event counts
    // with every MISSING day inside the user's own [first, last] activity
    // span materialized as an explicit zero row (`filled` = 1). The
    // sparse→dense step is the prerequisite for any window/forecast math
    // that assumes regular spacing (yf_interpolate fills VALUES at known
    // rows; this fills the ROWS themselves). Scale shape: the calendar
    // explode is per-key `sequence(min_day, max_day)` — bounded by the
    // observation window (30 days in this corpus), NEVER by corpus size;
    // the fill-in join is co-keyed on (user_id, day) against the already-
    // aggregated daily grain, so nothing about it grows faster than
    // users × window-days. A global calendar crossJoin would be the
    // anti-pattern: it couples every user to the corpus-wide span.
    "events_gap_fill" -> ((s, dir) => {
      val daily = Sources.events(s, dir)
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
        .groupBy("user_id", "day").agg(count(lit(1)).as("n_events"))
      val cal = daily.groupBy("user_id")
        .agg(min("day").as("lo"), max("day").as("hi"))
        .select(col("user_id").as("u"),
          explode(sequence(col("lo"), col("hi"))).as("d"))
      cal.join(daily,
          cal("u") === daily("user_id") && cal("d") === daily("day"), "left")
        .select(col("u").as("user_id"), col("d").as("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          col("n_events").isNull.cast("int").as("filled"))
        .orderBy("user_id", "day")
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

    // DIFFERENTIALLY-PRIVATE RELEASE (training-data governance): per-type
    // event counts published with Laplace(1/ε) noise — the mechanism a
    // pipeline applies before sharing corpus statistics externally. The
    // engine's no-rand rule holds: the uniform draw is HASH-DERIVED
    // (md5(type) first 48 bits / 2^48 — exact integer → IEEE division on
    // both engines), then one inverse-CDF transform. In production the
    // draw would be a secure RNG; the MECHANISM (sensitivity-1 count,
    // ε-scaled noise, post-processed non-negativity) is what's under
    // test, and determinism is what makes it testable. ln() is not
    // correctly-rounded cross-engine, so the noised value is compared at
    // 5 significant digits (Stable.sig — noise is irrational, never on a
    // format midpoint); the exact count and the exact uniform ride
    // alongside so the oracle replays every step.
    "events_dp_counts" -> ((s, dir) => {
      val eps = lit(0.5)
      val u = (conv(substring(md5(col("event_type")), 1, 12), 16, 10)
        .cast("double") / lit(281474976710656.0)).as("u") // 2^48
      Sources.events(s, dir)
        .groupBy("event_type").agg(count(lit(1)).as("true_count"))
        .withColumn("u", u)
        .withColumn("noise",
          (-signum(col("u") - 0.5)) / eps *
            log(lit(1.0) - lit(2.0) * abs(col("u") - 0.5)))
        .select(col("event_type"), col("true_count"),
          util.Stable.sig(col("u")).as("u_sig"),
          util.Stable.sig(col("noise")).as("noise_sig"),
          util.Stable.sig(
            greatest(col("true_count") + col("noise"), lit(0.0)))
            .as("dp_count_sig"))
        .orderBy("event_type")
    }),

    // SQL PIPE SYNTAX (Spark 4 / SQL:2023-trajectory `|>` operators —
    // the linear "FROM → WHERE → AGGREGATE → ORDER BY" form that reads
    // in execution order): the same declarative plan as the classic
    // nested form — Catalyst sees identical logical operators, so
    // pushdown/pruning/codegen are untouched; this pins that the
    // engine's SQL surface accepts the modern syntax and that it
    // hash-matches a classically-written DuckDB oracle. Value sums ride
    // the 1e-8-quantized BIGINT contract like every events aggregate.
    "events_pipe_syntax" -> ((s, dir) => {
      Sources.events(s, dir).createOrReplaceTempView("g_pipe_events")
      s.sql("""
        FROM g_pipe_events
        |> WHERE value >= 0.5
        |> AGGREGATE count(*) AS n_events,
             sum(CAST(floor(value * 1e8 + 0.5) AS BIGINT)) AS sum_value_q8,
             count(DISTINCT user_id) AS n_users
           GROUP BY event_type
        |> ORDER BY event_type""")
    }),

    // IN-FLIGHT INTERVAL COUNTING (sweep line): how many orders were
    // OPEN on each day — open from o_orderdate until the order's last
    // line ships. The naive form joins every day against every interval
    // (days × orders); the sweep-line rewrite converts each interval to
    // a +1 open / −1 close delta, aggregates deltas to DAY grain (one
    // keyed agg — the shuffle carries ≤ 2 rows per order), and runs one
    // cumulative sum over the day spine. The only ordered window is over
    // the POST-AGGREGATE day grain, whose cardinality is the calendar
    // (~2.5k rows here, bounded at any corpus size) — never the fact.
    // Orders with no lineitems never close; the fixture has none, and
    // the inner max-ship join makes the choice explicit.
    "orders_backlog" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val openEv = Sources.orders(s, dir)
        .select(to_date(col("o_orderdate")).as("day"), lit(1L).as("delta"))
      val closeEv = Sources.lineitem(s, dir)
        .groupBy("l_orderkey").agg(max(col("l_shipdate")).as("last_ship"))
        // Still open ON the ship day: the −1 lands the day after.
        .select(date_add(to_date(col("last_ship")), 1).as("day"),
          lit(-1L).as("delta"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      openEv.unionByName(closeEv)
        .groupBy("day").agg(sum(col("delta")).as("day_delta"))
        .withColumn("backlog", sum(col("day_delta")).over(w))
        .select(col("day").cast("string").as("day"), col("day_delta"),
          col("backlog"))
        .orderBy("day")
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

    // TPC-H Q22 — global sales opportunity. ADAPTED: no c_phone, so a
    // nationkey set stands in for the phone-prefix country codes, and
    // "never ordered" is relaxed to "no orders since 1999-01-01" (every
    // customer in this testdata has some order). The two correlated
    // subqueries decorrelate exactly as the published plan wants: the
    // positive-balance average becomes a 1-row broadcast (computed with
    // exactAvg so both engines divide bit-identical operands), and NOT
    // EXISTS becomes a left_anti against the recent-orderer key set.
    "tpch_q22" -> ((s, dir) => {
      val eligible = Sources.customer(s, dir)
        .filter(col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
        .select("c_custkey", "c_nationkey", "c_acctbal")
      val avgPos = eligible.filter(col("c_acctbal") > 0)
        .agg(util.Stable.exactAvg(col("c_acctbal")).as("avg_bal"))
      val recent = Sources.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
      eligible.crossJoin(broadcast(avgPos))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"),
          util.Stable.exactSumAt(col("c_acctbal"), 2).as("totacctbal"))
        .orderBy("c_nationkey")
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

    // L-DIVERSITY audit — the companion readout to events_k_anonymity:
    // a class can satisfy k-anonymity (many users) while every row in it
    // shares ONE sensitive value, so an attacker who locates the class
    // learns the attribute anyway. Quasi-identifiers here are
    // (event_type, day-of-week); the sensitive attribute is the value
    // band. Two keyed aggregates (classes, then per-type rollup of the
    // tiny class table) — map-side combinable, no window, scale-free.
    "events_l_diversity" -> ((s, dir) => {
      val l = 3
      val classes = Sources.events(s, dir)
        .select(col("event_type"),
          expr("(ts DIV 86400000000000) % 7").as("dow"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT) DIV 5000").as("vband"))
        .groupBy("event_type", "dow")
        .agg(countDistinct(col("vband")).as("n_sensitive"),
          count(lit(1)).as("n_rows"))
      classes.groupBy("event_type")
        .agg(count(lit(1)).as("n_classes"),
          sum(when(col("n_sensitive") < l, 1L).otherwise(0L)).as("n_low_div"),
          sum(when(col("n_sensitive") < l, col("n_rows")).otherwise(0L)).as("rows_at_risk"),
          min(col("n_sensitive")).as("min_l"))
        .orderBy("event_type")
    }),

    // SEQUENCE-PATTERN MATCH (MATCH_RECOGNIZE stand-in): each user's
    // event history collapses to an ordered initial-letter string
    // (c/e/p/s/v), and funnel-style regexes run over it — subsequence
    // funnels ('s.*c.*p'), direct pairs, and negative patterns
    // ('^[^e]*$' = never errored) that per-step min-timestamp funnels
    // (events_funnel) cannot express. ONE keyed aggregate builds every
    // sequence (array_sort over (ts_us, event_id, initial) structs is a
    // total order, so the string is deterministic on any partitioning;
    // per-user state is bounded by that user's history); all three
    // regexes then evaluate in a single pass over the per-user table and
    // stack() unpivots the counts — the corpus is scanned exactly once.
    "events_seq_pattern" -> ((s, dir) => {
      val seqs = Sources.events(s, dir)
        .select(col("user_id"), expr("ts DIV 1000").as("ts_us"),
          col("event_id"), substring(col("event_type"), 1, 1).as("init"))
        .groupBy("user_id")
        .agg(array_sort(collect_list(
          struct(col("ts_us"), col("event_id"), col("init")))).as("evs"))
        .select(array_join(transform(col("evs"), e => e("init")), "").as("seq"))
      seqs.agg(
          count(lit(1)).as("n_users"),
          sum(when(col("seq").rlike("s.*c.*p"), 1L).otherwise(0L)).as("m1"),
          sum(when(col("seq").rlike("v.*p"), 1L).otherwise(0L)).as("m2"),
          sum(when(col("seq").rlike("^[^e]*$"), 1L).otherwise(0L)).as("m3"))
        .selectExpr(
          "stack(3, 'signup>click>purchase', m1, 'view>purchase', m2, " +
            "'error_free', m3) AS (pattern, n_matched)",
          "n_users")
        .orderBy("pattern")
    }),

    // CONVERSION LAG — the time-to-convert readout events_funnel omits:
    // for each user, first signup → first SUBSEQUENT purchase, then the
    // population's lag distribution (count, min/max, exact mean). The
    // mean divides two exact integers (sum of micro-lags, count) once at
    // the end — no FP accumulation. Two keyed min-aggregates + one
    // co-keyed join on user_id; at 100 TB both sides shuffle once on the
    // same key (or are bucket-co-located) and the final rollup is one row.
    "events_conversion_lag" -> ((s, dir) => {
      val ev = Sources.events(s, dir)
        .select(col("user_id"), col("event_type"), expr("ts DIV 1000").as("ts_us"))
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts_us").as("t1"))
      val s2 = ev.filter(col("event_type") === "purchase").join(s1, "user_id")
        .filter(col("ts_us") > col("t1"))
        .groupBy("user_id").agg(min(col("ts_us") - col("t1")).as("lag_us"))
      s1.agg(count(lit(1)).as("n_signup"))
        .crossJoin(broadcast(s2.agg(
          count(lit(1)).as("n_converted"),
          min(col("lag_us")).as("min_lag_us"),
          max(col("lag_us")).as("max_lag_us"),
          sum(col("lag_us")).as("sum_lag_us"))))
        .withColumn("avg_lag_s",
          col("sum_lag_us").cast("double") / col("n_converted") / 1e6)
        .select("n_signup", "n_converted", "min_lag_us", "max_lag_us", "avg_lag_s")
    }),

    // LINK PREDICTION, Jaccard variant — common-neighbours normalized by
    // the neighbourhood union: |Γ(u)∩Γ(v)| / |Γ(u)∪Γ(v)|, which demotes
    // hub-adjacent pairs that the raw count over-ranks. Reuses the
    // graph_common_neighbors wedge machinery (same thresholded
    // co-purchase graph, same ≤64-degree center cap) plus one broadcast
    // degree join; the score is an exact integer ratio (×1e6 div) so the
    // ranking hashes identically cross-engine. Top-20 lands in
    // TakeOrderedAndProject — no global sort materializes.
    "graph_link_prediction" -> ((s, dir) => {
      val op = Sources.lineitem(s, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val edges = util.Views.materialize(
        op.as("a").join(op.as("b"),
            col("a.o") === col("b.o") && col("a.p") < col("b.p"))
          .groupBy(col("a.p").as("u"), col("b.p").as("v"))
          .agg(count(lit(1)).as("support"))
          .filter(col("support") >= 2)
          .select("u", "v"))
      val adj = edges.select(col("u").as("c"), col("v").as("nb"))
        .unionAll(edges.select(col("v").as("c"), col("u").as("nb")))
      val deg = adj.groupBy(col("nb")).agg(count(lit(1)).as("dg"))
      val centerDeg = adj.groupBy("c").agg(count(lit(1)).as("dg"))
      val small = util.Views.materialize(
        adj.join(centerDeg.filter(col("dg") <= 64), "c").select("c", "nb"))
      val cn = small.as("x").join(small.as("y"),
          col("x.c") === col("y.c") && col("x.nb") < col("y.nb"))
        .groupBy(col("x.nb").as("u"), col("y.nb").as("v"))
        .agg(count(lit(1)).as("n_common"))
      cn.join(edges, Seq("u", "v"), "left_anti")
        .join(broadcast(deg.select(col("nb").as("u"), col("dg").as("du"))), "u")
        .join(broadcast(deg.select(col("nb").as("v"), col("dg").as("dv"))), "v")
        .withColumn("jaccard_q",
          expr("n_common * 1000000 div (du + dv - n_common)"))
        .select("u", "v", "n_common", "du", "dv", "jaccard_q")
        .orderBy(col("jaccard_q").desc, col("u"), col("v"))
        .limit(20)
    }),

    // RAKE KEYWORD EXTRACTION (Rose et al. 2010) — unsupervised
    // keyphrase mining, the corpus-curation primitive behind topic
    // audits and dataset cards. Candidate phrases are maximal stopword-
    // free token runs (split on non-alpha; breaks = empties + the en
    // stopword profile); each word scores degree/frequency (degree =
    // Σ length of phrases containing it), each phrase the sum of its
    // word scores. Word scores quantize to ×1e6 integer division and
    // phrase scores are exact integer sums — no FP summation order
    // anywhere. Shapes at scale: tokenization + break marking are
    // row-local; phrase numbering is a per-doc window (bounded by doc
    // length); word stats are one keyed aggregate whose output (the
    // vocabulary) broadcasts back onto phrase members; the global top-20
    // is TakeOrderedAndProject, never a full sort.
    "text_rake_keywords" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val stops = text.TextAnalysis.stopwords.head._2
      val toks = Sources.documents(s, dir)
        .select(col("doc_id"), posexplode(split(lower(col("text")), "[^a-z]+")))
        .withColumnRenamed("col", "w")
        .withColumn("is_break",
          (col("w") === "" || col("w").isInCollection(stops)).cast("long"))
      val wDoc = Window.partitionBy("doc_id").orderBy("pos")
      val members = toks
        .withColumn("phrase_id", sum(col("is_break")).over(wDoc))
        .filter(col("is_break") === 0)
        .withColumn("plen",
          count(lit(1)).over(Window.partitionBy("doc_id", "phrase_id")))
      val wordStats = members.groupBy("w")
        .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
        .withColumn("wscore_q", expr("deg * 1000000 div freq"))
      val phraseText = members.groupBy("doc_id", "phrase_id")
        .agg(array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("w")))),
            e => e("w")), " ").as("phrase"),
          count(lit(1)).as("n_words"))
      val phraseScore = members
        .join(broadcast(wordStats.select("w", "wscore_q")), "w")
        .groupBy("doc_id", "phrase_id").agg(sum(col("wscore_q")).as("score_q"))
      phraseText.join(phraseScore, Seq("doc_id", "phrase_id"))
        .filter(col("n_words") >= 2)
        .groupBy("phrase", "n_words")
        .agg(count(lit(1)).as("n_occ"), max(col("score_q")).as("score_q"))
        .withColumn("score", col("score_q") / 1e6)
        .select("phrase", "n_words", "n_occ", "score")
        .orderBy(col("score").desc, col("phrase"))
        .limit(20)
    }),

    // OUT-OF-ORDER ARRIVAL AUDIT — the batch measurement that sizes a
    // streaming watermark: treating event_id as the arrival (ingest)
    // order, an event is LATE when some earlier-arrived event of the
    // same user already carried a newer timestamp; its lateness is the
    // gap to that running maximum. Exactly the statistic
    // withWatermark(delay) needs before anyone picks `delay`. One
    // per-user window (arrival-ordered running max, rows-frame excludes
    // self) + one keyed rollup — per-key parallel at any scale, and the
    // lateness sums stay in exact integer micros until the single final
    // divide.
    "events_lateness_audit" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Sources.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("ts DIV 1000").as("ts_us"))
        .withColumn("prior_max_us", max(col("ts_us")).over(w))
        .withColumn("late_us",
          when(col("prior_max_us") > col("ts_us"),
            col("prior_max_us") - col("ts_us")).otherwise(lit(0L)))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("late_us") > 0, 1L).otherwise(0L)).as("n_late"),
          max(col("late_us")).as("max_late_us"),
          sum(col("late_us")).as("sum_late_us"))
        .withColumn("avg_late_s",
          col("sum_late_us").cast("double") /
            nullif(col("n_late").cast("double"), lit(0.0)) / 1e6)
        .select("event_type", "n_events", "n_late", "max_late_us", "avg_late_s")
        .orderBy("event_type")
    }),

    // VOCABULARY COVERAGE CURVE — the tokenizer-budget readout every
    // BPE/vocab decision starts from: what fraction of corpus token mass
    // do the top-N word types cover? Token counting is one keyed
    // aggregate over the corpus; the curve itself runs on the VOCABULARY
    // table (types ≪ tokens — the global rank window is over word types
    // only, and at 100 TB the vocab that matters is prunable to the
    // top cutoff with a TakeOrdered before ranking). Coverage sums are
    // exact integer token counts; the share divides once per cutoff row.
    "docs_ngram_coverage" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val vocab = Sources.documents(s, dir)
        .select(explode(split(util.Norm.normalize(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("freq"))
      val ranked = vocab.withColumn("rk",
        row_number().over(Window.orderBy(col("freq").desc, col("word"))))
      val totals = vocab.agg(sum(col("freq")).as("total_tokens"),
        count(lit(1)).as("n_types"))
      // Fixture vocabulary is ~31 synthetic types, so the fixture curve
      // uses small cutoffs; at corpus scale these would be 1e4..1e5.
      val cutoffs = Seq(5, 10, 20)
      cutoffs.map { c =>
        ranked.filter(col("rk") <= c)
          .agg(sum(col("freq")).as("covered_tokens"))
          .withColumn("cutoff", lit(c.toLong))
      }.reduce(_ unionAll _)
        .crossJoin(broadcast(totals))
        .withColumn("share",
          col("covered_tokens").cast("double") / col("total_tokens").cast("double"))
        .select("cutoff", "n_types", "covered_tokens", "total_tokens", "share")
        .orderBy("cutoff")
    }),

    // EMBEDDING HYGIENE AUDIT — the pre-flight check before any ANN /
    // clustering run: per label, vector counts, dimensionality drift,
    // zero vectors, and the norm² distribution. Each component quantizes
    // to 1e-8 longs and norm² is a ROW-LOCAL exact-integer fold
    // (dim=64, |v|<1 ⇒ Σq² ≤ ~2e17, inside BIGINT) — no explode, no
    // per-dimension shuffle, and integer sums are order-independent so
    // the rollup hashes identically on any partitioning. One keyed
    // aggregate over row-local projections: scales linearly, zero skew
    // exposure.
    "emb_norm_audit" -> ((s, dir) => {
      val q = transform(col("embedding"),
        v => floor(v.cast("double") * 1e8 + 0.5).cast("long"))
      Sources.embeddings(s, dir)
        .select(col("label"), size(col("embedding")).as("dim"),
          aggregate(q, lit(0L), (acc, x) => acc + x * x).as("norm2_q"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          min(col("dim")).as("min_dim"), max(col("dim")).as("max_dim"),
          sum(when(col("norm2_q") === 0L, 1L).otherwise(0L)).as("n_zero"),
          min(col("norm2_q")).as("min_norm2_q"),
          max(col("norm2_q")).as("max_norm2_q"),
          sum(col("norm2_q")).as("sum_norm2_q"))
        .withColumn("avg_norm2",
          col("sum_norm2_q").cast("double") / col("n_vecs").cast("double") / 1e16)
        .select("label", "n_vecs", "min_dim", "max_dim", "n_zero",
          "min_norm2_q", "max_norm2_q", "avg_norm2")
        .orderBy("label")
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

    // DIFFERENCE-IN-DIFFERENCES — the causal-analysis readout over the
    // event log: a deterministic treatment split (odd user_id) crossed
    // with a pre/post cutoff at the corpus's midpoint day, cell means of
    // the 1e-6-quantized value, and the DiD estimate
    // (treat_post−treat_pre)−(ctrl_post−ctrl_pre). All four cell sums
    // are exact integers from ONE conditional aggregate over one scan
    // (the min/max day probe is a 1-row broadcast); each mean divides
    // once, and the estimate is a fixed 4-leaf IEEE tree — bit-identical
    // cross-engine. Map-side combinable, no window, no skew exposure.
    "events_impact_did" -> ((s, dir) => {
      val days = Sources.events(s, dir)
        .select(col("user_id"), col("value"),
          expr("ts DIV 86400000000000").as("day_idx"))
      val cutoff = days.agg(
        expr("(min(day_idx) + max(day_idx)) div 2").as("cutoff_day"))
      def cell(t: Column, p: Column, nm: String): Seq[Column] = Seq(
        sum(when(t && p, 1L).otherwise(0L)).as(s"n_$nm"),
        sum(when(t && p, expr("CAST(floor(value * 1e6 + 0.5) AS BIGINT)"))
          .otherwise(0L)).as(s"sum_$nm"))
      val treat = col("user_id") % 2 === 1
      val post = col("day_idx") >= col("cutoff_day")
      val aggCols = cell(treat, post, "tp") ++ cell(treat, !post, "tr") ++
        cell(!treat, post, "cp") ++ cell(!treat, !post, "cr") :+
        first(col("cutoff_day")).as("cutoff_day")
      val cells = days.crossJoin(broadcast(cutoff))
        .agg(aggCols.head, aggCols.tail: _*)
      def mean(nm: String): Column =
        col(s"sum_$nm").cast("double") / col(s"n_$nm").cast("double") / 1e6
      cells
        .withColumn("mean_tp", mean("tp")).withColumn("mean_tr", mean("tr"))
        .withColumn("mean_cp", mean("cp")).withColumn("mean_cr", mean("cr"))
        .withColumn("did",
          (col("mean_tp") - col("mean_tr")) - (col("mean_cp") - col("mean_cr")))
        .select("cutoff_day", "n_tp", "n_tr", "n_cp", "n_cr",
          "mean_tp", "mean_tr", "mean_cp", "mean_cr", "did")
    }),

    // EXACT MEDIA DEDUP — the multimodal twin of dedup_exact: identical
    // binary payloads collapse by md5 over the raw bytes (the standard
    // content-addressed-store key), per format: asset count, distinct
    // payloads, duplicate assets, and the bytes a dedup pass reclaims
    // (every byte beyond each group's min-media_id survivor). Payload
    // hashing is row-local; the group-and-rollup is one keyed aggregate
    // on (format, md5) then one tiny per-format rollup — the same
    // two-level shape dedup_exact scales with.
    "mm_dedup_exact" -> ((s, dir) => {
      val media = multimodal.Multimodal.synthesize(Sources.documents(s, dir))
        .select(col("media_id"), col("meta.format").as("format"),
          md5(col("payload")).as("h"),
          length(col("payload")).cast("long").as("n_bytes"))
      val groups = media.groupBy("format", "h")
        .agg(count(lit(1)).as("n_assets"), min(col("media_id")).as("survivor_id"),
          sum(col("n_bytes")).as("group_bytes"), max(col("n_bytes")).as("one_size"))
      groups.groupBy("format")
        .agg(sum(col("n_assets")).as("n_assets"),
          count(lit(1)).as("n_unique_payloads"),
          sum(col("n_assets") - 1).as("n_dup_assets"),
          sum(col("group_bytes") - col("one_size")).as("bytes_reclaimed"))
        .orderBy("format")
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

    // BURSTINESS / OVERDISPERSION — the Fano factor (variance/mean) of
    // daily event counts per type: 1 ⇒ Poisson-like arrivals, ≫1 ⇒
    // bursty. Day counts are one keyed aggregate; the moment sums over
    // the per-day table are exact BIGINT (counts are integers — no
    // quantization needed at all), so variance n·Σc²−(Σc)² is exact and
    // the factor is one IEEE tree per type. The statistic that decides
    // whether a rate limiter / capacity plan can assume smooth traffic.
    "events_burstiness" -> ((s, dir) => {
      val dayCounts = Sources.events(s, dir)
        .groupBy(col("event_type"), expr("ts DIV 86400000000000").as("day"))
        .agg(count(lit(1)).as("c"))
      dayCounts.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum(col("c")).as("sc"), sum(col("c") * col("c")).as("scc"),
          max(col("c")).as("peak_day"))
        .withColumn("mean_per_day",
          col("sc").cast("double") / col("n_days").cast("double"))
        .withColumn("fano",
          ((col("n_days") * col("scc") - col("sc") * col("sc")).cast("double") /
            (col("n_days") * col("n_days")).cast("double")) / col("mean_per_day"))
        .select("event_type", "n_days", "peak_day", "mean_per_day", "fano")
        .orderBy("event_type")
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

    // FIRST-ORDER MARKOV CHAIN over the event stream — transition
    // probabilities AND per-state entropy rate (how predictable is the
    // next event given the current one; the sequence-compressibility
    // readout behind session modeling). Adjacent pairs come from one
    // per-user lag window on the (ts_us, event_id) total order;
    // transition counts and state totals are exact integers; p divides
    // once per cell, and the entropy uses text_word_entropy's ln
    // discipline — quantize ln(count) of INTEGER inputs to 1e-4 longs,
    // sum exactly, one final divide: H(s) = (n·lnQ(n) − Σc·lnQ(c))/(n·1e4).
    // State-count cells (≤ types² rows) re-aggregate and broadcast back.
    "events_markov_chain" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      def lnQ(c: Column) = floor(log(c.cast("double")) * 1e4 + 0.5).cast("long")
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      val pairs = Sources.events(s, dir)
        .select(col("user_id"), expr("ts DIV 1000").as("ts_us"),
          col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
      val cells = pairs.groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val fromStats = cells.groupBy("from_type")
        .agg(sum(col("n")).as("n_from"),
          sum(col("n") * lnQ(col("n"))).as("sum_n_ln_n_q4"))
        .withColumn("entropy_from",
          (col("n_from") * lnQ(col("n_from")) - col("sum_n_ln_n_q4"))
            / (col("n_from") * lit(1e4)))
      cells.join(broadcast(fromStats.select("from_type", "n_from", "entropy_from")),
          "from_type")
        .withColumn("p", col("n").cast("double") / col("n_from").cast("double"))
        .select("from_type", "to_type", "n", "n_from", "p", "entropy_from")
        .orderBy("from_type", "to_type")
    }),

    // TOKENIZER FERTILITY — BPE-ish tokens per whitespace word, by
    // language: the readout that decides whether a tokenizer is
    // efficient on each language slice of a corpus (fertility ≫ 1 means
    // the vocab fragments that language). Reuses tokenStats' row-local
    // token counters (both engines share the regex contract); the
    // rollup is one lang-keyed aggregate of exact integer counts, and
    // fertility divides the two corpus sums once.
    "text_tokenizer_fertility" -> ((s, dir) => {
      val d = Sources.documents(s, dir)
      text.TextAnalysis.tokenStats(d, "doc_id", "text")
        .join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_ws_tokens")).as("ws_tokens"),
          sum(col("n_bpe_tokens")).as("bpe_tokens"))
        .withColumn("fertility",
          col("bpe_tokens").cast("double") / col("ws_tokens").cast("double"))
        .select("lang", "n_docs", "ws_tokens", "bpe_tokens", "fertility")
        .orderBy("lang")
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
      pairs.groupBy("s1", "s2")
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

    // LANGUAGE-ID CONFUSION MATRIX — the classifier-eval readout over
    // the heuristic language tagger: truth (the corpus lang column) ×
    // prediction cells with per-truth share. Prediction is the row-local
    // langId projection; the matrix is one keyed aggregate over ≤
    // langs² cells, marginals re-aggregate the cell table (the
    // chi2/seasonality pattern) — the corpus is scanned once.
    "text_lang_confusion" -> ((s, dir) => {
      val pred = text.TextAnalysis.langId(Sources.documents(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("lang_id").as("pred"))
      val cells = Sources.documents(s, dir)
        .select(col("doc_id"), col("lang").as("truth"))
        .join(pred, "doc_id")
        .groupBy("truth", "pred").agg(count(lit(1)).as("n"))
      val totals = cells.groupBy("truth").agg(sum(col("n")).as("n_truth"))
      cells.join(broadcast(totals), "truth")
        .withColumn("share",
          col("n").cast("double") / col("n_truth").cast("double"))
        .select("truth", "pred", "n", "n_truth", "share")
        .orderBy("truth", "pred")
    }),

    // TRAIN/TEST LEAKAGE AUDIT — does any (normalized-content) duplicate
    // straddle a split boundary? Run over the dup-injected corpus (the
    // dedup fixture) with docs_split's exact hash rule: content
    // fingerprints join only within fingerprint groups (dup groups are
    // tiny — the join is keyed on the md5, never quadratic in the
    // corpus), cross-split pairs aggregate per boundary. The check every
    // eval pipeline must run BEFORE trusting its test numbers; at 100 TB
    // this is the same keyed-aggregate shape as dedup_exact plus one
    // ordered-pair rollup.
    "docs_split_leakage" -> ((s, dir) => {
      val nibble = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1)
      val d = dedup.Dedup.augmented(Sources.documents(s, dir))
        .withColumn("split",
          when(nibble.isin("e", "f"), lit("test"))
            .when(nibble.isin("c", "d"), lit("val"))
            .otherwise(lit("train")))
        .select(col("doc_id"), col("split"),
          md5(util.Norm.normalize(col("text")).cast("binary")).as("fp"))
      d.as("a").join(d.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id") &&
            col("a.split") =!= col("b.split"))
        .select(least(col("a.split"), col("b.split")).as("split_lo"),
          greatest(col("a.split"), col("b.split")).as("split_hi"),
          col("a.fp").as("fp"))
        .groupBy("split_lo", "split_hi")
        .agg(count(lit(1)).as("n_leaked_pairs"),
          countDistinct(col("fp")).as("n_leaked_fingerprints"))
        .orderBy("split_lo", "split_hi")
    }),

    // SLO ERROR-BUDGET BURN RATE — the SRE readout over the event log:
    // per day, the error share against a declared 25% budget, at 1-day
    // and trailing-7-day horizons (the multiwindow alert rule). Shares
    // quantize to ×1e6 integer division; the only windows run over the
    // DAY-GRAIN table (≤ a few thousand rows at any corpus size — the
    // orders_backlog argument: aggregate first, window over the tiny
    // spine), so the global ordering is bounded and the corpus itself
    // is touched by one keyed aggregate.
    "events_slo_burn" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dayStats = Sources.events(s, dir)
        .groupBy(expr("ts DIV 86400000000000").as("day"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_err"))
      val w7 = Window.orderBy("day").rowsBetween(-6, 0)
      dayStats
        .withColumn("err7", sum(col("n_err")).over(w7))
        .withColumn("tot7", sum(col("n_total")).over(w7))
        .withColumn("share_1d_q", expr("n_err * 1000000 div n_total"))
        .withColumn("share_7d_q", expr("err7 * 1000000 div tot7"))
        // budget 25% ⇒ burn = share / 0.25 = share_q / 250000.
        .withColumn("burn_1d", col("share_1d_q").cast("double") / 250000.0)
        .withColumn("burn_7d", col("share_7d_q").cast("double") / 250000.0)
        .select("day", "n_total", "n_err", "burn_1d", "burn_7d")
        .orderBy("day")
    }),

    // CUPED VARIANCE-REDUCED A/B READOUT — the experimentation-platform
    // estimator: θ = cov(pre, post)/var(pre) over per-user period sums,
    // and the adjusted effect (ȳt − ȳc) − θ(x̄t − x̄c). Per-user pre/post
    // sums are exact cent-quantized integers (value·100 keeps every
    // moment inside BIGINT at 1000× the fixture); the pooled moments and
    // the four arm sums are exact, θ and both effects are single IEEE
    // trees. Two keyed aggregates (user grain, then arm cells) — the
    // same one-scan discipline as events_impact_did.
    "events_ab_cuped" -> ((s, dir) => {
      val days = Sources.events(s, dir)
        .select(col("user_id"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("vq"),
          expr("ts DIV 86400000000000").as("day_idx"))
      val cutoff = days.agg(
        expr("(min(day_idx) + max(day_idx)) div 2").as("cutoff_day"))
      val users = days.crossJoin(broadcast(cutoff))
        .groupBy("user_id")
        .agg(sum(when(col("day_idx") < col("cutoff_day"), col("vq"))
            .otherwise(0L)).as("x"),
          sum(when(col("day_idx") >= col("cutoff_day"), col("vq"))
            .otherwise(0L)).as("y"))
        .withColumn("treat", (col("user_id") % 2 === 1).cast("int"))
      val m = users.agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(when(col("treat") === 1, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("treat") === 1, col("x")).otherwise(0L)).as("sx_t"),
        sum(when(col("treat") === 1, col("y")).otherwise(0L)).as("sy_t"))
      m.withColumn("theta",
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            nullif((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"),
              lit(0.0)))
        .withColumn("n_c", col("n") - col("n_t"))
        .withColumn("raw_effect",
          (col("sy_t").cast("double") / col("n_t").cast("double") -
            (col("sy") - col("sy_t")).cast("double") / col("n_c").cast("double"))
            / 100.0)
        .withColumn("pre_diff",
          (col("sx_t").cast("double") / col("n_t").cast("double") -
            (col("sx") - col("sx_t")).cast("double") / col("n_c").cast("double"))
            / 100.0)
        .withColumn("cuped_effect",
          col("raw_effect") - col("theta") * col("pre_diff"))
        .select("n", "n_t", "n_c", "theta", "raw_effect", "pre_diff",
          "cuped_effect")
    }),

    // COHEN'S KAPPA — chance-corrected agreement between the heuristic
    // language tagger and the corpus labels: κ = (p_o − p_e)/(1 − p_e)
    // from the same confusion cells as text_lang_confusion. Diagonal and
    // marginal sums are exact integers; p_o, p_e, and κ are one IEEE
    // tree over them in a single output row — the annotation-QA number
    // every labeling pipeline tracks, at aggregate cost O(langs²).
    "text_lang_kappa" -> ((s, dir) => {
      val cells = text.TextAnalysis.langId(Sources.documents(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("lang_id").as("pred"))
        .join(Sources.documents(s, dir).select(col("doc_id"), col("lang").as("truth")),
          "doc_id")
        .groupBy("truth", "pred").agg(count(lit(1)).as("n"))
      val rowT = cells.groupBy("truth").agg(sum(col("n")).as("rt"))
      val colT = cells.groupBy("pred").agg(sum(col("n")).as("ct"))
      val agree = cells.filter(col("truth") === col("pred"))
        .agg(coalesce(sum(col("n")), lit(0L)).as("n_agree"))
      val chance = rowT.join(colT, col("truth") === col("pred"))
        .agg(coalesce(sum(col("rt") * col("ct")), lit(0L)).as("sum_rc"))
      val total = cells.agg(sum(col("n")).as("n_total"))
      total.crossJoin(broadcast(agree)).crossJoin(broadcast(chance))
        .withColumn("po",
          col("n_agree").cast("double") / col("n_total").cast("double"))
        .withColumn("pe",
          col("sum_rc").cast("double") /
            (col("n_total").cast("double") * col("n_total").cast("double")))
        .withColumn("kappa",
          (col("po") - col("pe")) / nullif(lit(1.0) - col("pe"), lit(0.0)))
        .select("n_total", "n_agree", "po", "pe", "kappa")
    }),

    // FORECAST BACKTEST (seasonal-naive baseline) — the eval loop every
    // forecasting pipeline starts from: predict each day's per-type
    // count with the count 7 days earlier (same-weekday naive), score
    // MAE and mean bias on the days where the lag exists. Daily counts
    // are one keyed aggregate; the lag is a per-type window over the
    // day-grain table; errors are exact integers summed exactly, each
    // metric divides once. The baseline that any real model must beat —
    // and the harness that would score that model is this same query
    // with `pred` swapped.
    "events_forecast_naive_eval" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Sources.events(s, dir)
        .groupBy(col("event_type"), expr("ts DIV 86400000000000").as("day"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("event_type").orderBy("day")
      daily
        .withColumn("pred", lag(col("c"), 7).over(w))
        .filter(col("pred").isNotNull)
        .withColumn("err", col("c") - col("pred"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_eval"),
          sum(abs(col("err"))).as("sum_abs_err"),
          sum(col("err")).as("sum_err"),
          max(abs(col("err"))).as("max_abs_err"))
        .withColumn("mae",
          col("sum_abs_err").cast("double") / col("n_eval").cast("double"))
        .withColumn("bias",
          col("sum_err").cast("double") / col("n_eval").cast("double"))
        .select("event_type", "n_eval", "mae", "bias", "max_abs_err")
        .orderBy("event_type")
    }),

    // BENFORD FIRST-DIGIT AUDIT — the fraud/synthetic-data screen: the
    // leading digit of every order total against Benford's log10(1+1/d)
    // law. The digit comes from the BIGINT cent amount's decimal string
    // (integer→string is engine-identical; a double→string render is
    // NOT), the expected shares are BUILD-TIME Scala constants
    // interpolated into both engines' plans (so no runtime log10 ulp
    // can split them), and the chi²-style distance quantizes each
    // digit's term to 1e-6 before the exact 9-term sum — the
    // events_chi2_independence discipline. One keyed aggregate at digit
    // grain + a 1-row broadcast; the corpus never shuffles.
    "orders_benford_audit" -> ((s, dir) => {
      val expected: Map[Int, Double] =
        (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d)).toMap
      val expCol = (1 to 9).foldRight(lit(Double.NaN): Column) {
        case (d, e) => when(col("digit") === d.toString, lit(expected(d))).otherwise(e)
      }
      val digits = Sources.orders(s, dir)
        .filter(col("o_totalprice") > 0)
        .select(substring(
          expr("CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS STRING)"),
          1, 1).as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n_obs"))
      val total = digits.agg(sum(col("n_obs")).as("n_total"))
      val scored = digits.crossJoin(broadcast(total))
        .withColumn("share",
          col("n_obs").cast("double") / col("n_total").cast("double"))
        .withColumn("expected", expCol)
        .withColumn("term_q",
          floor((col("n_obs") - col("expected") * col("n_total")) *
            (col("n_obs") - col("expected") * col("n_total")) /
            (col("expected") * col("n_total")) * 1e6 + 0.5).cast("long"))
      val chi2 = scored.agg(sum(col("term_q")).as("chi2_q"))
      scored.crossJoin(broadcast(chi2))
        .withColumn("chi2", col("chi2_q") / 1e6)
        .select("digit", "n_obs", "n_total", "share", "expected", "chi2")
        .orderBy("digit")
    }),

    // DATA PROFILING SUMMARY — the first query any warehouse runs on an
    // unknown table: per column, row/null/distinct counts in ONE pass
    // (the distinct aggregates Expand the scan ×columns — at 100 TB you
    // trade that for approx_count_distinct; the exact twin is the
    // correctness tier here, same pattern as the sketch families). The
    // stack() unpivot emits one row per column from the single
    // aggregate row — no per-column scans, no driver loops.
    "data_profile_summary" -> ((s, dir) => {
      val o = Sources.orders(s, dir)
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderpriority")
      val aggs = count(lit(1)).as("n_rows") +:
        cols.flatMap { c =>
          Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
            countDistinct(col(c)).as(s"dist_$c"))
        }
      val one = o.agg(aggs.head, aggs.tail: _*)
      val stackArgs = cols.map(c => s"'$c', null_$c, dist_$c").mkString(", ")
      one.selectExpr(
          s"stack(${cols.length}, $stackArgs) AS (column_name, n_null, n_distinct)",
          "n_rows")
        .orderBy("column_name")
    }),

    // ACCOUNTS-RECEIVABLE AGING — open liability bucketed by age at a
    // fixed as-of date: orders still unshipped (no lineitem ship at or
    // before the as-of day) age from their order date into the classic
    // 0-30/31-60/61-90/90+ buckets with exact-decimal money totals.
    // Openness = one left_anti against the shipped-order key set (keys
    // only cross the shuffle); aging is row-local date math; the rollup
    // is one tiny keyed aggregate. The finance-ops close-process query.
    "orders_open_aging" -> ((s, dir) => {
      val asOf = "1998-06-01"
      val shipped = Sources.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit(asOf))
        .select(col("l_orderkey")).distinct()
      Sources.orders(s, dir)
        .filter(col("o_orderdate") <= lit(asOf))
        .join(shipped, col("o_orderkey") === col("l_orderkey"), "left_anti")
        .withColumn("age_days", datediff(lit(asOf), col("o_orderdate")))
        .withColumn("bucket",
          when(col("age_days") <= 30, "a_0_30")
            .when(col("age_days") <= 60, "b_31_60")
            .when(col("age_days") <= 90, "c_61_90")
            .otherwise("d_90_plus"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_orders"),
          util.Stable.exactSumAt(col("o_totalprice"), 2).as("open_value"),
          min(col("age_days")).as("min_age"), max(col("age_days")).as("max_age"))
        .orderBy("bucket")
    }),

    // SUPPLIER LATENCY SCORECARD — order-to-ship lead time per supplier:
    // mean (exact integer day sums ÷ once), p90 by RANK SELECTION (the
    // yf_var_cvar discipline — k = ⌈0.9·n⌉-th smallest on a
    // (latency, orderkey, linenumber) total order, never a value
    // threshold), and the max. One co-keyed fact⋈orders join at order
    // grain, then per-supplier windows — the ops scorecard every
    // procurement team runs, shaped to stay per-key parallel at any
    // supplier count.
    "supplier_latency_scorecard" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val lat = Sources.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_linenumber"),
          col("l_shipdate"))
        .join(Sources.orders(s, dir).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("lat"),
          col("l_orderkey"), col("l_linenumber"))
      val ranked = lat
        .withColumn("rn", row_number().over(Window.partitionBy("l_suppkey")
          .orderBy(col("lat"), col("l_orderkey"), col("l_linenumber"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("l_suppkey")))
        .withColumn("k90", expr("(9 * n + 9) div 10"))
      val p90 = ranked.filter(col("rn") === col("k90"))
        .select(col("l_suppkey"), col("lat").as("p90_days"))
      lat.groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_shipments"),
          sum(col("lat")).as("sum_days"), max(col("lat")).as("max_days"))
        .join(p90, "l_suppkey")
        .withColumn("mean_days",
          col("sum_days").cast("double") / col("n_shipments").cast("double"))
        .select("l_suppkey", "n_shipments", "mean_days", "p90_days", "max_days")
        .orderBy("l_suppkey")
    }),

    // NATION TRADE MATRIX — cross-border revenue flows: customer nation
    // × supplier nation with exact-decimal revenue and an
    // intra/cross-border flag, top-20 flows. The generalization of
    // TPC-H Q7's two-nation slice to the full matrix: facts join
    // co-keyed at order grain, both nation dimensions BROADCAST, and
    // the aggregate lands at nation² grain before TakeOrderedAndProject
    // ranks the flows — the corpus shuffles once regardless of how many
    // nation pairs exist.
    "nation_trade_matrix" -> ((s, dir) => {
      val rev = util.Stable.dec2(col("l_extendedprice")) *
        (util.Stable.rate2(lit(1.0)) - util.Stable.rate2(col("l_discount")))
      Sources.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"), rev.as("rev"))
        .join(Sources.orders(s, dir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Sources.supplier(s, dir).select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(Sources.customer(s, dir).select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Sources.nation(s, dir)
          .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sk"))
        .join(broadcast(Sources.nation(s, dir)
          .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("ck"))
        .groupBy("cust_nation", "supp_nation")
        .agg(count(lit(1)).as("n_lineitems"),
          util.Stable.exactSumAt(col("rev"), 4).as("revenue"))
        .withColumn("cross_border",
          (col("cust_nation") =!= col("supp_nation")).cast("int"))
        .orderBy(col("revenue").desc, col("cust_nation"), col("supp_nation"))
        .limit(20)
    }),

    // TWO-SAMPLE KOLMOGOROV–SMIRNOV TEST, EXACT-INTEGER FORM — does the
    // value distribution differ between the A/B arms? The supremum
    // |F₁−F₂| is computed WITHOUT any FP accumulation: per distinct
    // cent-quantized value, arm counts; cumulative counts c₁,c₂ over the
    // value order; and the statistic's numerator max|c₁·N₂ − c₂·N₁| is
    // pure BIGINT cross-multiplication — D divides once at the end. The
    // only window runs over the DISTINCT-VALUE grain (bounded by value
    // resolution, not corpus size). The z/χ² tests' nonparametric
    // sibling; the 5% critical value is a build-time constant.
    "events_ks_test" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val vals = Sources.events(s, dir)
        .select(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("vq"),
          (col("user_id") % 2 === 1).cast("int").as("treat"))
      val grain = vals.groupBy("vq")
        .agg(sum(when(col("treat") === 1, 1L).otherwise(0L)).as("a1"),
          sum(when(col("treat") === 0, 1L).otherwise(0L)).as("a2"))
      val w = Window.orderBy("vq").rowsBetween(Window.unboundedPreceding, 0)
      val cum = grain
        .withColumn("c1", sum(col("a1")).over(w))
        .withColumn("c2", sum(col("a2")).over(w))
      val tot = grain.agg(sum(col("a1")).as("n1"), sum(col("a2")).as("n2"),
        count(lit(1)).as("n_values"))
      cum.crossJoin(broadcast(tot))
        .withColumn("dn", abs(col("c1") * col("n2") - col("c2") * col("n1")))
        .groupBy("n1", "n2", "n_values")
        .agg(max(col("dn")).as("d_num"))
        .withColumn("d_stat",
          col("d_num").cast("double") /
            (col("n1").cast("double") * col("n2").cast("double")))
        // 5% two-sample critical value c(α)=1.358.
        .withColumn("d_crit",
          lit(1.358) * sqrt((col("n1") + col("n2")).cast("double") /
            (col("n1").cast("double") * col("n2").cast("double"))))
        .withColumn("reject_5pct", (col("d_stat") > col("d_crit")).cast("int"))
        .select("n1", "n2", "n_values", "d_stat", "d_crit", "reject_5pct")
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

    // GINI COEFFICIENT of monthly order values — the inequality readout
    // behind customer_pareto's deciles, in closed rank-weighted form:
    // G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over cent-quantized totals
    // ranked within each month. Ranks come from a PER-MONTH window
    // (never global), every sum is exact BIGINT, and G is one IEEE
    // division per month row. The same shape audits corpus-source or
    // shard-size inequality at 100 TB.
    "orders_gini_monthly" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = Sources.orders(s, dir)
        .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"),
          col("o_orderkey"))
      val ranked = o.withColumn("i",
        row_number().over(Window.partitionBy("month")
          .orderBy(col("cents"), col("o_orderkey"))).cast("long"))
      ranked.groupBy("month")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("cents")).as("sum_cents"),
          sum(col("i") * col("cents")).as("sum_rank_cents"))
        .withColumn("gini",
          (lit(2L) * col("sum_rank_cents") -
            (col("n_orders") + 1L) * col("sum_cents")).cast("double") /
            (col("n_orders") * col("sum_cents")).cast("double"))
        .select("month", "n_orders", "sum_cents", "gini")
        .orderBy("month")
    }),

    // MANN–WHITNEY U (rank-sum) — the KS test's location-shift sibling:
    // does one A/B arm stochastically dominate? Exact-integer via
    // DOUBLED midranks (2·rank keeps tie midpoints integral): per
    // distinct value, the doubled midrank is 2·(count below) + (count
    // at) + 1; R₁ sums arm-1 counts × midranks in BIGINT; U₁ derives by
    // identity; the common-language effect size U₁/(n₁n₂) divides once.
    // Value-grain window only (the KS discipline) — corpus scanned once.
    "events_mannwhitney_u" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val grain = Sources.events(s, dir)
        .select(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("vq"),
          (col("user_id") % 2 === 1).cast("int").as("treat"))
        .groupBy("vq")
        .agg(sum(when(col("treat") === 1, 1L).otherwise(0L)).as("a1"),
          sum(when(col("treat") === 0, 1L).otherwise(0L)).as("a2"))
      val w = Window.orderBy("vq").rowsBetween(Window.unboundedPreceding, -1)
      val ranked = grain
        .withColumn("below", coalesce(sum(col("a1") + col("a2")).over(w), lit(0L)))
        .withColumn("midrank2", lit(2L) * col("below") + col("a1") + col("a2") + 1L)
      ranked.agg(
          sum(col("a1")).as("n1"), sum(col("a2")).as("n2"),
          sum(col("a1") * col("midrank2")).as("r1_2"))
        // U₁ stays in DOUBLED units (ties make real U half-integral):
        // u1_x2 = 2·R₁ − n₁(n₁+1); effect = u1_x2 / (2·n₁·n₂).
        .withColumn("u1_x2", col("r1_2") - col("n1") * (col("n1") + 1L))
        .withColumn("effect_size",
          col("u1_x2").cast("double") /
            (lit(2.0) * col("n1").cast("double") * col("n2").cast("double")))
        .select("n1", "n2", "u1_x2", "effect_size")
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

    // TYPE-MIX ENTROPY DRIFT — the distribution-shift monitor: per day,
    // the entropy of the event-type mix (quantized-ln identity over
    // exact counts, the text_word_entropy discipline) next to the
    // corpus-wide reference entropy, with the absolute drift. Day cells
    // are one keyed aggregate; the reference re-aggregates the tiny
    // cell table and broadcasts back. The alert input for "did
    // yesterday's traffic mix change shape" at any scale.
    "events_entropy_drift" -> ((s, dir) => {
      def lnQ(c: Column) = floor(log(c.cast("double")) * 1e4 + 0.5).cast("long")
      val cells = Sources.events(s, dir)
        .groupBy(expr("ts DIV 86400000000000").as("day"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val daily = cells.groupBy("day")
        .agg(sum(col("c")).as("n"),
          sum(col("c") * lnQ(col("c"))).as("s_clnc"))
        .withColumn("h_day",
          (col("n") * lnQ(col("n")) - col("s_clnc")) / (col("n") * lit(1e4)))
      val overall = cells.groupBy("event_type").agg(sum(col("c")).as("c"))
        .agg(sum(col("c")).as("n_all"),
          sum(col("c") * lnQ(col("c"))).as("s_all"))
        .withColumn("h_ref",
          (col("n_all") * lnQ(col("n_all")) - col("s_all")) /
            (col("n_all") * lit(1e4)))
        .select("h_ref")
      daily.crossJoin(broadcast(overall))
        .withColumn("drift", abs(col("h_day") - col("h_ref")))
        .select("day", "n", "h_day", "h_ref", "drift")
        .orderBy("day")
    }),

    // JENSEN–SHANNON DIVERGENCE between two source slices' vocabulary
    // distributions — the corpus-drift number behind "did source B's
    // language shift vs source A". Word-grain counts for both slices
    // full-outer-join on the word; each word's two KL terms
    // c·ln(2c·N_other-side-aware mixture ratio) quantize to 1e-4 longs
    // (the bigram-logprob ln discipline: identical integer inputs →
    // identical IEEE ln → identical quantized term) and sum exactly;
    // JS = (KL₁+KL₂)/(2·ln2-free nats) divides once. Vocabulary-grain
    // everything — corpus scanned once per slice.
    "docs_js_divergence" -> ((s, dir) => {
      // Slices = the even/odd doc_id halves — a pure predicate (no
      // driver-side source picking), standing in for any two corpus
      // shards/snapshots whose language drift is in question.
      val words = Sources.documents(s, dir)
        .select((col("doc_id") % 2).as("half"),
          explode(split(util.Norm.normalize(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
      val ca = words.filter(col("half") === 0)
        .groupBy("word").agg(count(lit(1)).as("c1"))
      val cb = words.filter(col("half") === 1)
        .groupBy("word").agg(count(lit(1)).as("c2"))
      val joined = ca.join(cb, Seq("word"), "full_outer")
        .select(col("word"),
          coalesce(col("c1"), lit(0L)).as("c1"),
          coalesce(col("c2"), lit(0L)).as("c2"))
      val tot = joined.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
      // Per-word KL terms vs the mixture m = (p+q)/2, in 1e-4-quantized
      // nats: term1 = c1·lnQ(2·c1·n2 / (c1·n2 + c2·n1)) etc — the ratio
      // is exact-integer-derived so both engines feed ln identical doubles.
      def lnQratio(num: Column, den: Column) =
        floor(log(num.cast("double") / den.cast("double")) * 1e4 + 0.5).cast("long")
      val terms = joined.crossJoin(broadcast(tot))
        .withColumn("mden", col("c1") * col("n2") + col("c2") * col("n1"))
        .withColumn("t1", when(col("c1") > 0,
          col("c1") * lnQratio(lit(2L) * col("c1") * col("n2"), col("mden")))
          .otherwise(0L))
        .withColumn("t2", when(col("c2") > 0,
          col("c2") * lnQratio(lit(2L) * col("c2") * col("n1"), col("mden")))
          .otherwise(0L))
      terms.groupBy("n1", "n2")
        .agg(count(lit(1)).as("n_words"),
          sum(col("t1")).as("kl1_q"), sum(col("t2")).as("kl2_q"))
        .withColumn("js_nats",
          (col("kl1_q").cast("double") / col("n1").cast("double") +
            col("kl2_q").cast("double") / col("n2").cast("double")) / 2e4)
        .select("n1", "n2", "n_words", "js_nats")
    }),

    // ZIPF SLOPE — does the vocabulary follow a power law, and how
    // steep? OLS of lnQ(freq) on lnQ(rank) over the frequency-ranked
    // vocabulary, with BOTH log coordinates quantized to 1e-4 longs
    // BEFORE the moment sums (identical integer ln inputs → identical
    // quantized coordinates cross-engine), so the closed-form slope/R²
    // is one IEEE tree over exact BIGINT moments. The rank window runs
    // over vocabulary types only (the docs_ngram_coverage argument); a
    // natural corpus lands near slope −1 — drifting far from it flags
    // synthetic or templated text.
    "text_zipf_slope" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      def lnQ(c: Column) = floor(log(c.cast("double")) * 1e4 + 0.5).cast("long")
      val vocab = Sources.documents(s, dir)
        .select(explode(split(util.Norm.normalize(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("freq"))
      val pts = vocab
        .withColumn("rk", row_number().over(
          Window.orderBy(col("freq").desc, col("word"))).cast("long"))
        .select(lnQ(col("rk")).as("x"), lnQ(col("freq")).as("y"))
      pts.agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .withColumn("slope",
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            nullif((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"),
              lit(0.0)))
        .withColumn("r2",
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") *
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")) /
            nullif((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
              (col("n") * col("syy") - col("sy") * col("sy")).cast("double"),
              lit(0.0)))
        .select("n", "slope", "r2")
    }),

    // COHORT REPEAT-PURCHASE RATE — the orders-side loyalty readout (the
    // LTV triangle's headline number): per first-order-month cohort, how
    // many customers ever ordered again. Customer grain first (one keyed
    // aggregate; the cohort month comes from min(o_orderdate) — tie-free
    // by construction since only the month survives), then a tiny cohort
    // rollup; the repeat share divides two exact counts once.
    "customer_repeat_rate" -> ((s, dir) => {
      val perCust = Sources.orders(s, dir)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_orderdate")).as("first_date"))
        .select(col("o_custkey"), col("n_orders"),
          date_format(col("first_date"), "yyyy-MM").as("cohort"))
      perCust.groupBy("cohort")
        .agg(count(lit(1)).as("n_customers"),
          sum(when(col("n_orders") >= 2, 1L).otherwise(0L)).as("n_repeat"))
        .withColumn("repeat_rate",
          col("n_repeat").cast("double") / col("n_customers").cast("double"))
        .select("cohort", "n_customers", "n_repeat", "repeat_rate")
        .orderBy("cohort")
    }),

    // HOURLY TRAFFIC PROFILE — per event type: the 24-hour histogram's
    // peak and trough hours plus a peak-to-mean ratio (the capacity-
    // planning shape: how spiky is each stream within the day). Hour
    // cells are one keyed aggregate; argmax/argmin use max_by/min_by on
    // a (count, hour) total order (deterministic ties — the weekly-OHLC
    // discipline); the ratio multiplies exact integers before its one
    // division.
    "events_peak_hours" -> ((s, dir) => {
      val cells = Sources.events(s, dir)
        .groupBy(col("event_type"),
          expr("(ts DIV 3600000000000) % 24").as("hour"))
        .agg(count(lit(1)).as("c"))
      cells.groupBy("event_type")
        .agg(count(lit(1)).as("n_hours"),
          sum(col("c")).as("n_events"),
          // (count, hour) total orders encoded as one BIGINT (hour < 100)
          // so max_by/arg_max agree cross-engine without struct compares:
          // peak = max count, ties to the EARLIEST hour; trough = min
          // count, ties likewise.
          expr("max_by(hour, c * 100 - hour)").as("peak_hour"),
          max(col("c")).as("peak_count"),
          expr("min_by(hour, c * 100 + hour)").as("trough_hour"),
          min(col("c")).as("trough_count"))
        .withColumn("peak_to_mean",
          (col("peak_count") * col("n_hours")).cast("double") /
            col("n_events").cast("double"))
        .select("event_type", "n_events", "peak_hour", "peak_count",
          "trough_hour", "trough_count", "peak_to_mean")
        .orderBy("event_type")
    }),

    // INTER-ARRIVAL COEFFICIENT OF VARIATION — the arrival-process test
    // complementing events_burstiness's count view: for a Poisson
    // process CV = 1; CV ≫ 1 means clumped arrivals. Gaps come from one
    // per-type lag over the (ts_us, event_id) total order; gap moments
    // are exact BIGINT (micros ≤ ~1e13, squares ≤ 1e26? NO — gaps here
    // are ≤ ~1e11 µs and n ≤ 1e4, so Σgap² ≤ 1e26 would overflow —
    // gaps therefore quantize to SECONDS (÷1e6) before squaring, which
    // keeps Σgap² ≤ ~1e14 with 1000× headroom); CV² is one IEEE tree
    // per type.
    "events_interarrival_cv" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy(col("ts_us"), col("event_id"))
      val gaps = Sources.events(s, dir)
        .select(col("event_type"), expr("ts DIV 1000").as("ts_us"), col("event_id"))
        .withColumn("prev", lag(col("ts_us"), 1).over(w))
        .filter(col("prev").isNotNull)
        // Seconds-granularity gaps: integer-divide BEFORE the moments so
        // the squares stay deep inside BIGINT at 1000× the fixture.
        .withColumn("gap_s", expr("(ts_us - prev) div 1000000"))
      gaps.groupBy("event_type")
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("gap_s")).as("sg"),
          sum(col("gap_s") * col("gap_s")).as("sgg"),
          max(col("gap_s")).as("max_gap_s"))
        .withColumn("mean_gap_s",
          col("sg").cast("double") / col("n_gaps").cast("double"))
        .withColumn("cv2",
          ((col("n_gaps") * col("sgg") - col("sg") * col("sg")).cast("double") /
            (col("n_gaps") * col("n_gaps")).cast("double")) /
            nullif(col("mean_gap_s") * col("mean_gap_s"), lit(0.0)))
        .select("event_type", "n_gaps", "mean_gap_s", "cv2", "max_gap_s")
        .orderBy("event_type")
    }),

    // ONE-WAY ANOVA F — does account balance differ across market
    // segments? Completes the classical-test family (z, χ², KS, U):
    // between/within sums of squares assemble from per-segment exact
    // cent sums and counts — SSB = Σ nⱼ(x̄ⱼ−x̄)² and SSW = SST−SSB both
    // derive from the SAME three BIGINT moments via the identity
    // SST = Σx²−(Σx)²/n, evaluated in one fixed IEEE tree; F divides
    // once. One keyed aggregate + a 1-row rollup of the k-row cell
    // table. At any scale the corpus is scanned exactly once.
    "customer_anova_f" -> ((s, dir) => {
      val cells = Sources.customer(s, dir)
        .select(col("c_mktsegment").as("seg"),
          expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("xq"))
        .groupBy("seg")
        .agg(count(lit(1)).as("nj"), sum(col("xq")).as("sj"),
          sum(col("xq") * col("xq")).as("ssj"))
      val tot = cells.agg(
        count(lit(1)).as("k"),
        sum(col("nj")).as("n"), sum(col("sj")).as("s"),
        sum(col("ssj")).as("ss"),
        // Σ sj²/nj with each segment's term QUANTIZED to integer cents²
        // before the sum (floor(x+0.5) of one IEEE tree over exact
        // inputs) — a raw double sum would be partition-order-dependent;
        // the ≤1 cent² per-term rounding is noise against SSB ~ 1e13.
        sum(floor(col("sj").cast("double") * col("sj").cast("double") /
          col("nj").cast("double") + 0.5).cast("long")).as("sum_sj2_over_nj_q"))
      tot
        .withColumn("sst",
          col("ss").cast("double") -
            col("s").cast("double") * col("s").cast("double") /
              col("n").cast("double"))
        .withColumn("ssb",
          col("sum_sj2_over_nj_q").cast("double") -
            col("s").cast("double") * col("s").cast("double") /
              col("n").cast("double"))
        .withColumn("ssw", col("sst") - col("ssb"))
        .withColumn("f_stat",
          (col("ssb") / (col("k") - 1).cast("double")) /
            nullif(col("ssw") / (col("n") - col("k")).cast("double"), lit(0.0)))
        .select(col("k").as("n_segments"), col("n").as("n_customers"),
          (col("ssb") / 1e4).as("ssb"), (col("ssw") / 1e4).as("ssw"),
          col("f_stat"))
    }),

    // ROLLUP-MV REWRITE (engine feature — plans/MvRewrite.scala +
    // plans/Mv.scala): the query is written against the FACT table, and
    // the injected optimizer rule re-plans it as a RE-aggregation of the
    // (l_returnflag, l_linestatus) materialized view — associative state
    // (sum/count/min/max) folds onto any grain subset, so the steady-
    // state read touches |MV| rows (≤ ~6 here) instead of |lineitem|.
    // The MV itself is a write-once stored artifact (built in warm-up,
    // probed in timed reps — the `_stored` protocol); the ORACLE
    // recomputes from the raw fact, so a rewrite that ever changed
    // semantics would hash-mismatch, and MvRewriteSpec pins that the
    // rewritten plan scans the MV path and not the fact. At 100 TB this
    // is the warehouse dashboard shape: ingest maintains the rollup,
    // queries never rescan history.
    "mv_rollup_stored" -> ((s, dir) => {
      plans.Mv.ensureLineitemMv(s, dir)
      Sources.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          sum(util.Stable.dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(util.Stable.dec2(col("l_extendedprice"))).cast("double").as("sum_price"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    // The GRAIN-PREDICATE variant: a filter on an MV grain column
    // selects whole MV groups, so it transplants onto the MV scan and
    // the rewrite still fires (a non-grain predicate — l_shipdate, say —
    // correctly blocks it; MvRewriteSpec pins both directions). Also
    // exercises the min/max re-aggregation path (min of per-group
    // minima) under an expression tree around the aggregate
    // (unix_micros(min(...)) — the rewrite maps the AGGREGATE node and
    // carries the surrounding tree verbatim).
    "mv_rollup_filtered_stored" -> ((s, dir) => {
      plans.Mv.ensureLineitemMv(s, dir)
      Sources.lineitem(s, dir)
        .filter(col("l_linestatus") === "F")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n_rows"),
          // l_shipdate is TIMESTAMP_NTZ in the testdata; the UTC-pinned
          // session makes the NTZ→TZ cast a wall-clock no-op, so
          // unix_micros is exact (the Sources.events discipline).
          unix_micros(min(col("l_shipdate")).cast("timestamp")).as("min_ship_us"),
          unix_micros(max(col("l_shipdate")).cast("timestamp")).as("max_ship_us"))
        .orderBy("l_returnflag")
    }),

    // INCREMENTAL MV REFRESH (plans/Mv.scala): the day-grain events
    // rollup is maintained warehouse-style — history partials live in a
    // write-once store whose marker carries the refresh cutoff (a
    // catalog watermark, read back driver-side with no corpus scan), and
    // each invocation aggregates ONLY the `[cutoff, ∞)` delta through
    // the footer-pruned `eventsTsRange` scan, then merges by
    // re-aggregating the associative partials. The oracle recomputes the
    // full-corpus aggregate from scratch — refresh-equals-recompute is
    // exactly the incremental-view-maintenance contract. At 100 TB the
    // delta scan reads a week of row groups, not two years.
    "mv_refresh_incremental_stored" -> ((s, dir) =>
      plans.Mv.refreshedEventsDay(s, dir).orderBy("day", "event_type")),

    // ROC-AUC of a scorer (score = value, positive = purchase events) via
    // the RANK identity AUC = (2·R₁ − n₁(n₁+1)) / (2·n₁·n₀) — the
    // classifier-eval capstone over the z/χ²/KS/U/F family, and the same
    // DOUBLED-midrank discipline as events_mannwhitney_u (tie midpoints
    // stay integral at 2×, so every accumulation is BIGINT; ONE division
    // at the end). Scale shape: ranks come from a window over the
    // DISTINCT-SCORE grain (cents-quantized — bounded by the value range,
    // not the corpus), never a per-row global sort; the per-row pass is
    // one keyed aggregate. Sweeping thresholds row-by-row (the textbook
    // ROC construction) would be a per-row window over the corpus.
    "events_roc_auc" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.orderBy("sc")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      Sources.events(s, dir)
        .select(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("sc"),
          (col("event_type") === "purchase").cast("long").as("pos"))
        .groupBy("sc")
        .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("npos"))
        .withColumn("cb", coalesce(sum(col("cnt")).over(w), lit(0L)))
        .agg(sum(col("cnt")).as("n"), sum(col("npos")).as("n1"),
          sum(col("npos") * (lit(2L) * col("cb") + col("cnt") + lit(1L)))
            .as("u2s"))
        .select(col("n1").as("n_pos"), (col("n") - col("n1")).as("n_neg"),
          ((col("u2s") - col("n1") * (col("n1") + lit(1L))).cast("double") /
            (lit(2L) * col("n1") * (col("n") - col("n1"))).cast("double"))
            .as("auc"))
    }),

    // Smoothed MEAN-TARGET ENCODING of a categorical feature — the
    // leakage-safe replacement for one-hot at high cardinality in a
    // training pipeline: each market segment encodes as
    // (Σ target + m·global_mean) / (n + m), m=20 pseudo-observations
    // shrinking small segments toward the prior. Target = order value in
    // exact cents; the only IEEE steps are the one fixed tree per
    // segment (global mean, one multiply, one add, two divides —
    // identical order both engines). Scale shape: one fact⋈dimension
    // key join, one keyed aggregate, one 1-row broadcast of the global
    // moments; the encode table is |categories| rows, broadcast back to
    // training rows at apply time.
    "customer_target_encoding" -> ((s, dir) => {
      val joined = Sources.orders(s, dir)
        .select(col("o_custkey"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
        .join(Sources.customer(s, dir).select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
      val seg = joined.groupBy(col("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sum_cents"))
      val glob = joined.agg(count(lit(1)).as("gn"), sum(col("cents")).as("gs"))
      seg.crossJoin(broadcast(glob))
        .select(col("seg"), col("n_orders"),
          (col("sum_cents").cast("double") / col("n_orders").cast("double") /
            lit(100.0)).as("raw_mean"),
          ((col("sum_cents").cast("double") +
            lit(20.0) * (col("gs").cast("double") / col("gn").cast("double"))) /
            (col("n_orders") + lit(20L)).cast("double") / lit(100.0)).as("enc"))
        .orderBy("seg")
    }),

    // Pairwise PEARSON CORRELATION MATRIX over the fact's numeric
    // columns — the feature-redundancy screen run before any model
    // training. ONE aggregate computes every moment (4 sums, 4 sums of
    // squares, 6 cross-products) over per-column integer quantizations
    // (qty/whole-dollar price/cents discount+tax — quantization IS the
    // contract, and keeps n·Σxy exact); the final per-pair algebra runs
    // in DECIMAL(38,0) — n·Σx² at 100× the fixture overflows BIGINT but
    // sits comfortably in 38 digits ⇔ DuckDB's HUGEINT — and casts to
    // double only for the closing sqrt/divide. The matrix unpivots via
    // stack(); nothing after the single scan touches more than one row.
    "lineitem_corr_matrix" -> ((s, dir) => {
      val d38 = DecimalType(38, 0)
      val m = Sources.lineitem(s, dir)
        .select(col("l_quantity").cast("long").as("q"),
          expr("CAST(floor(l_extendedprice) AS BIGINT)").as("p"),
          expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").as("d"),
          expr("CAST(floor(l_tax * 100 + 0.5) AS BIGINT)").as("t"))
        .agg(count(lit(1)).as("n"),
          sum("q").as("sq"), sum("p").as("sp"), sum("d").as("sd"), sum("t").as("st"),
          sum(col("q") * col("q")).as("sqq"), sum(col("p") * col("p")).as("spp"),
          sum(col("d") * col("d")).as("sdd"), sum(col("t") * col("t")).as("stt"),
          sum(col("q") * col("p")).as("sqp"), sum(col("q") * col("d")).as("sqd"),
          sum(col("q") * col("t")).as("sqt"), sum(col("p") * col("d")).as("spd"),
          sum(col("p") * col("t")).as("spt"), sum(col("d") * col("t")).as("sdt"))
      def corr(sx: String, sy: String, sxx: String, syy: String, sxy: String): Column = {
        val n = col("n").cast(d38)
        val num = (n * col(sxy).cast(d38) - col(sx).cast(d38) * col(sy).cast(d38))
          .cast("double")
        val vx = (n * col(sxx).cast(d38) - col(sx).cast(d38) * col(sx).cast(d38))
          .cast("double")
        val vy = (n * col(syy).cast(d38) - col(sy).cast(d38) * col(sy).cast(d38))
          .cast("double")
        num / sqrt(vx * vy)
      }
      m.select(col("n"),
          corr("sq", "sp", "sqq", "spp", "sqp").as("c_qp"),
          corr("sq", "sd", "sqq", "sdd", "sqd").as("c_qd"),
          corr("sq", "st", "sqq", "stt", "sqt").as("c_qt"),
          corr("sp", "sd", "spp", "sdd", "spd").as("c_pd"),
          corr("sp", "st", "spp", "stt", "spt").as("c_pt"),
          corr("sd", "st", "sdd", "stt", "sdt").as("c_dt"))
        .select(col("n"), expr(
          """stack(6,
             |'quantity', 'price', c_qp,
             |'quantity', 'discount', c_qd,
             |'quantity', 'tax', c_qt,
             |'price', 'discount', c_pd,
             |'price', 'tax', c_pt,
             |'discount', 'tax', c_dt) AS (x, y, corr)""".stripMargin))
        .select("x", "y", "n", "corr")
        .orderBy("x", "y")
    }),

    // Multinomial NAIVE BAYES language classifier — TRAINED AND EVALUATED
    // in one distributed query: fit Laplace-smoothed per-(lang, word)
    // token counts on the 90% doc_id-hash train split, score the 10%
    // test split, report the truth×prediction confusion matrix. Every
    // log-likelihood term follows the quantized-ln discipline (ln of
    // INTEGER counts, floor(·1e4+0.5) per term BEFORE summing), so doc
    // scores are exact BIGINTs and the argmax (score desc, lang asc) is
    // bit-deterministic in both engines; unseen words contribute
    // qln(0+1) = 0 via the left join's coalesce, which is exactly the
    // smoothing's intent. Scale shape: the model IS a keyed aggregate
    // (lang × vocab); scoring explodes test tokens by the |langs|-row
    // broadcast lang table and joins the model co-keyed on (word, lang)
    // — no per-doc loops, no driver round-trips, model size bounded by
    // vocabulary, not corpus.
    "text_naive_bayes" -> ((s, dir) => {
      val words = Sources.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          explode(split(util.Norm.normalize(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
      val isTest = col("doc_id") % 10 === 0
      def qln(c: Column): Column =
        floor(log(c.cast("double")) * 1e4 + 0.5).cast("long")
      val trainW = words.filter(!isTest)
      val model = trainW.groupBy(col("lang").as("mlang"), col("word"))
        .agg(count(lit(1)).as("c"))
        .select(col("mlang"), col("word"), qln(col("c") + 1).as("qc"))
      val nTok = trainW.groupBy(col("lang").as("mlang"))
        .agg(count(lit(1)).as("ntok"))
      val nDocs = trainW.select("doc_id", "lang").distinct()
        .groupBy(col("lang").as("mlang")).agg(count(lit(1)).as("ndocs"))
      val vocab = trainW.agg(countDistinct(col("word")).as("v"))
      val langTable = nTok.join(nDocs, "mlang").crossJoin(broadcast(vocab))
        .select(col("mlang"), qln(col("ntok") + col("v")).as("qdenom"),
          qln(col("ndocs")).as("qprior"))
      val testW = words.filter(isTest)
      val docLen = testW.groupBy("doc_id").agg(count(lit(1)).as("dn"))
      val perLang = testW
        .crossJoin(broadcast(langTable))
        .join(model, Seq("word", "mlang"), "left")
        .groupBy(col("doc_id"), col("lang").as("truth"), col("mlang"))
        .agg(sum(coalesce(col("qc"), lit(0L))).as("sqc"),
          max(col("qdenom")).as("qdenom"), max(col("qprior")).as("qprior"))
        .join(docLen, "doc_id")
        .select(col("doc_id"), col("truth"), col("mlang"),
          (col("sqc") - col("dn") * col("qdenom") + col("qprior")).as("score"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("score").desc, col("mlang").asc)
      perLang.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .groupBy(col("truth"), col("mlang").as("pred"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("truth", "pred")
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

    // DECISION-STUMP training (1-level CART): the best value threshold
    // for predicting `purchase`, chosen by minimum weighted Gini
    // impurity over EVERY candidate split — and the whole search is
    // EXACT INTEGER arithmetic: weighted Gini 2·(pLnL·nR + pRnR·nL)
    // compares as the quantized rational (2·num·1e6) DIV (nL·nR)
    // (integer floor division — no IEEE anywhere in the argmin), with
    // products in DECIMAL(38,0) ⇔ HUGEINT because pos·neg·n overflows
    // BIGINT at 100× the fixture. Scale shape: candidates live on the
    // DISTINCT-CENTS grain (bounded by the value range, not the corpus)
    // with one cumulative window — the same trick that makes roc_auc
    // scale; a per-row threshold scan would be quadratic.
    "events_decision_stump" -> ((s, dir) => {
      val d38 = DecimalType(38, 0)
      val w = org.apache.spark.sql.expressions.Window.orderBy("sc")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val g = Sources.events(s, dir)
        .select(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("sc"),
          (col("event_type") === "purchase").cast("long").as("pos"))
        .groupBy("sc")
        .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("npos"))
        .withColumn("nl", sum(col("cnt")).over(w))
        .withColumn("pl", sum(col("npos")).over(w))
      val tot = g.agg(max(col("nl")).as("n"), max(col("pl")).as("p"))
      val scored = g.crossJoin(broadcast(tot))
        .filter(col("nl") < col("n")) // right side must be non-empty
        .select(col("sc"), col("nl"), col("pl"),
          (col("n") - col("nl")).as("nr"), (col("p") - col("pl")).as("pr"))
        .withColumn("gini_q", expr(
          """CAST((2 * (CAST(pl AS DECIMAL(38,0)) * (nl - pl) * nr
             |          + CAST(pr AS DECIMAL(38,0)) * (nr - pr) * nl)
             |        * 1000000) div (CAST(nl AS DECIMAL(38,0)) * nr)
             |     AS BIGINT)""".stripMargin))
      val best = org.apache.spark.sql.expressions.Window
        .orderBy(col("gini_q").asc, col("sc").asc)
      scored.withColumn("rn", row_number().over(best)).filter(col("rn") === 1)
        .select((col("sc").cast("double") / 100.0).as("threshold"),
          (col("gini_q").cast("double") / 1e6).as("weighted_gini"),
          col("nl").as("n_left"), col("nr").as("n_right"),
          (col("pl").cast("double") / col("nl").cast("double")).as("pos_rate_left"),
          (col("pr").cast("double") / col("nr").cast("double")).as("pos_rate_right"))
    }),

    // CALIBRATION CURVE (reliability diagram) of the empirical-CDF
    // scorer: predicted probability = value's doubled midrank over 2N
    // (exact integers — the events_mannwhitney_u discipline), binned
    // into deciles by INTEGER arithmetic (bin = (10·dm − 1) DIV 2N), and
    // per bin the mean predicted probability vs the observed purchase
    // rate — the gap IS the calibration error a probability-emitting
    // model gets audited on before its scores feed a sampler or a
    // filter threshold. Everything until the two closing divisions is
    // BIGINT on the distinct-value grain.
    "events_calibration" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.orderBy("sc")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val g = Sources.events(s, dir)
        .select(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("sc"),
          (col("event_type") === "purchase").cast("long").as("pos"))
        .groupBy("sc")
        .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("npos"))
        .withColumn("cb", coalesce(sum(col("cnt")).over(w), lit(0L)))
        .withColumn("dm", lit(2L) * col("cb") + col("cnt") + lit(1L))
      val tot = g.agg(sum(col("cnt")).as("n"))
      g.crossJoin(broadcast(tot))
        .withColumn("bin",
          expr("(10 * dm - 1) div (2 * n)"))
        .groupBy("bin")
        .agg(sum(col("cnt")).as("n_rows"), sum(col("npos")).as("n_pos"),
          sum(col("cnt") * col("dm")).as("sum_dm"), max(col("n")).as("n"))
        .select(col("bin"), col("n_rows"),
          (col("sum_dm").cast("double") /
            (lit(2.0) * col("n").cast("double") * col("n_rows").cast("double")))
            .as("avg_pred"),
          (col("n_pos").cast("double") / col("n_rows").cast("double"))
            .as("obs_rate"))
        .orderBy("bin")
    }),

    // FEATURE HASHING (the hashing trick) audit: words hash into 512
    // buckets via the engine's md5 contract; the readout is the bucket
    // OCCUPANCY HISTOGRAM (how many buckets hold k distinct words, with
    // the k=0 empty-bucket row) plus each occupancy class's token mass —
    // what you consult before freezing the hashed dimensionality of a
    // text model: collisions are the accuracy tax, empties are wasted
    // parameters. Vocabulary-grain throughout (the corpus pass is one
    // keyed aggregate); the histogram is at most 512 rows.
    "text_feature_hashing" -> ((s, dir) => {
      val words = Sources.documents(s, dir)
        .select(explode(split(util.Norm.normalize(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
      val byWord = words.groupBy("word").agg(count(lit(1)).as("tf"))
        .withColumn("bucket",
          conv(substring(md5(col("word").cast("binary")), 1, 8), 16, 10)
            .cast("long") % 512)
      val byBucket = byWord.groupBy("bucket")
        .agg(count(lit(1)).as("n_words"), sum(col("tf")).as("tokens"))
      val hist = byBucket.groupBy("n_words")
        .agg(count(lit(1)).as("n_buckets"), sum(col("tokens")).as("tokens"))
      val empty = byBucket.agg(
        (lit(512L) - count(lit(1))).as("n_buckets")).filter(col("n_buckets") > 0)
        .select(lit(0L).as("n_words"), col("n_buckets"), lit(0L).as("tokens"))
      hist.unionByName(empty).orderBy("n_words")
    }),

    // ONE BPE MERGE STEP — the inner loop of byte-pair-encoding tokenizer
    // TRAINING: over the deduplicated (word, frequency) vocabulary, count
    // every adjacent symbol pair weighted by word frequency and rank the
    // merge candidates. At 100 TB the corpus pass already happened (the
    // vocab aggregate); each merge iteration then touches only the
    // VOCABULARY grain — which is why BPE training is tractable on web-
    // scale corpora at all, and why this is a distributed-aggregate
    // problem, not a driver loop. The pair explode is bounded by word
    // LENGTH (sequence over 1..len−1 — words shorter than 2 symbols are
    // filtered BEFORE sequence(), whose descending-step behaviour on
    // start>stop would otherwise fabricate pairs); top-20 adjudicates by
    // (freq DESC, pair ASC) in TakeOrderedAndProject.
    "text_bpe_merge_step" -> ((s, dir) => {
      val vocab = Sources.documents(s, dir)
        .select(explode(split(util.Norm.normalize(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("tf"))
      vocab.filter(length(col("word")) >= 2)
        .select(col("tf"),
          explode(sequence(lit(1), length(col("word")) - 1)).as("i"),
          col("word"))
        .select(col("tf"), expr("substring(word, i, 2)").as("pair"))
        .groupBy("pair").agg(sum(col("tf")).as("freq"))
        .orderBy(col("freq").desc, col("pair").asc)
        .limit(20)
    }),

    // POISSON BOOTSTRAP confidence interval for the mean event value —
    // THE distributed bootstrap (Chamandy et al., "Estimating Uncertainty
    // for Massive Data Streams"): instead of resampling n rows with
    // replacement (which needs a global index), every row independently
    // contributes K ~ Poisson(1) copies to each replica. K is DERIVED,
    // not drawn: a 32-bit md5 hash of (event_id, replica) compared
    // against the Poisson(1) CDF thresholds — BUILD-TIME Scala constants
    // interpolated into BOTH plans (the Benford discipline), tail
    // clamped at k=6 (P ≈ 1e-4, declared) — so replicas are exactly
    // reproducible across engines, retries, and partitionings. One scan
    // does all 32 replicas; the CI is rank-selected from the replica
    // means (2nd smallest / 2nd largest of 32 ≈ a 94% interval).
    "events_bootstrap_ci" -> ((s, dir) => {
      val ks = (0 to 5).map(k => poissonCdfU32(k))
      val u = conv(substring(md5(concat(col("event_id").cast("string"),
        lit(":"), col("b").cast("string")).cast("binary")), 1, 8), 16, 10)
        .cast("long")
      val k = when(u < ks(0), 0L).when(u < ks(1), 1L).when(u < ks(2), 2L)
        .when(u < ks(3), 3L).when(u < ks(4), 4L).when(u < ks(5), 5L)
        .otherwise(6L)
      val reps = Sources.events(s, dir)
        .select(col("event_id"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
        .select(col("event_id"), col("cents"),
          explode(sequence(lit(0), lit(31))).as("b"))
        .select(col("b"), (k * col("cents")).as("kc"), k.as("k"))
        .groupBy("b")
        .agg(sum(col("kc")).as("skc"), sum(col("k")).as("sk"))
        .select(col("b"),
          (col("skc").cast("double") / col("sk").cast("double") / 100.0)
            .as("mean_b"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("mean_b").asc, col("b").asc)
      val ranked = reps.withColumn("rn", row_number().over(w))
      val full = Sources.events(s, dir)
        .agg((sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
          .cast("double") / count(lit(1)).cast("double") / 100.0).as("mean"))
      full
        .crossJoin(broadcast(ranked.filter(col("rn") === 2)
          .select(col("mean_b").as("ci_lo"))))
        .crossJoin(broadcast(ranked.filter(col("rn") === 31)
          .select(col("mean_b").as("ci_hi"))))
        .select(col("mean"), col("ci_lo"), col("ci_hi"),
          lit(32L).as("n_replicas"))
    }),

    // KAPLAN–MEIER survival curve for time-to-first-purchase — survival
    // analysis with RIGHT CENSORING, the churn/conversion-modeling
    // primitive plain retention counts can't express: users who never
    // purchase are censored at their last observed day and still inform
    // the risk set up to it. The product-limit estimator runs in LOG
    // space under the quantized-ln discipline — each factor
    // ln(nᵢ−dᵢ)−ln(nᵢ) of INTEGER risk-set counts quantizes to a 1e-6
    // BIGINT before the cumulative sum, so the curve is exact integers;
    // the survival probability itself is emitted %.4e-formatted (the
    // stddev contract) since exp() is not cross-engine bit-stable. Day-
    // grain windows only; per-user reduction is one keyed aggregate.
    "events_survival_km" -> ((s, dir) => {
      val perUser = Sources.events(s, dir)
        .select(col("user_id"), expr("ts div 86400000000000").as("day"),
          (col("event_type") === "purchase").as("isp"))
        .groupBy("user_id")
        .agg(min(col("day")).as("d0"),
          min(when(col("isp"), col("day"))).as("dp"),
          max(col("day")).as("dl"))
        .select(
          when(col("dp").isNotNull, col("dp") - col("d0"))
            .otherwise(col("dl") - col("d0")).as("dur"),
          col("dp").isNotNull.cast("long").as("ev"))
      val g = perUser.groupBy("dur")
        .agg(sum(col("ev")).as("d"), sum(lit(1L) - col("ev")).as("c"))
      val tot = g.agg(sum(col("d") + col("c")).as("nn"))
      val wPrev = org.apache.spark.sql.expressions.Window.orderBy("dur")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val wCum = org.apache.spark.sql.expressions.Window.orderBy("dur")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      def qln6(c: Column): Column =
        floor(log(c.cast("double")) * 1e6 + 0.5).cast("long")
      g.crossJoin(broadcast(tot))
        .withColumn("at_risk",
          col("nn") - coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
        .withColumn("qterm",
          when(col("d") === 0, lit(0L))
            .when(col("at_risk") > col("d"),
              qln6(col("at_risk") - col("d")) - qln6(col("at_risk")))
            .otherwise(lit(0L)))
        .withColumn("qlog_surv",
          when(col("at_risk") === col("d") && col("d") > 0, lit(null))
            .otherwise(sum(col("qterm")).over(wCum)))
        .select(col("dur"), col("at_risk"), col("d").as("events"),
          col("c").as("censored"), col("qlog_surv").cast("long").as("qlog_surv"),
          when(col("qlog_surv").isNull, lit("0.0000e+00"))
            .otherwise(util.Stable.sig(
              exp(col("qlog_surv").cast("double") / 1e6))).as("surv"))
        .orderBy("dur")
    }),

    // TOP PRINCIPAL COMPONENT of the embedding corpus by POWER ITERATION
    // — and the entire iteration is EXACT INTEGER arithmetic, which is
    // what makes a cross-engine (and cross-retry) deterministic PCA
    // possible at all: the centered covariance C = n·Σxᵢxⱼ − Σxᵢ·Σxⱼ is
    // built from 1e-4-quantized components in DECIMAL(38,0) ⇔ HUGEINT
    // (n·Σxᵢxⱼ overflows BIGINT at 100×), and each of the three unrolled
    // steps renormalizes v ← (C·v)·1e6 / max|C·v| with SIGN-SPLIT integer
    // floor division (Spark `div` truncates toward zero, DuckDB `//`
    // floors — identical on magnitudes, so divide |w| and reapply the
    // sign). Scale shape: one corpus pass builds the d² = 4096-cell
    // moment table (pair-exploded, keyed aggregate); the iteration then
    // touches only d²-sized state — corpus size is out of the loop, the
    // graph_kcore fixed-unroll discipline. Output: 64 loadings + the
    // Rayleigh-quotient eigenvalue from one exact rational.
    "emb_pca_power" -> ((s, dir) => {
      val d38 = DecimalType(38, 0)
      val comps = Sources.embeddings(s, dir)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
        .select(col("vec_id"), col("i"),
          floor(col("x").cast("double") * 1e4 + 0.5).cast("long").as("xq"))
      val sums = comps.groupBy("i").agg(sum(col("xq")).as("si"))
      val cross = comps.as("a").join(comps.as("b"), "vec_id")
        .groupBy(col("a.i").as("i"), col("b.i").as("j"))
        .agg(sum(col("a.xq") * col("b.xq")).as("sij"))
      val n = comps.agg((count(lit(1)) / lit(64)).cast("long").as("n"))
      val cov = cross
        .join(sums.select(col("i"), col("si")), "i")
        .join(sums.select(col("i").as("j"), col("si").as("sj")), "j")
        .crossJoin(broadcast(n))
        .select(col("i"), col("j"),
          (col("n").cast(d38) * col("sij").cast(d38) -
            col("si").cast(d38) * col("sj").cast(d38)).as("c"))
      // v₀ = all-ones; three unrolled C·v steps with integer rescale.
      var v = sums.select(col("i").as("dim"), lit(1L).cast(d38).as("v"))
      for (_ <- 1 to 3) {
        val w = cov.join(v, cov("j") === v("dim"))
          .groupBy(col("i").as("dim")).agg(sum(col("c") * col("v")).as("w"))
        val m = w.agg(max(abs(col("w"))).as("m"))
        v = w.crossJoin(broadcast(m))
          .select(col("dim"),
            (when(col("w") < 0, -lit(1)).otherwise(lit(1)).cast(d38) *
              expr("CAST((abs(w) * 1000000) div m AS DECIMAL(38,0))")).as("v"))
      }
      val vc = util.Views.materialize(v)
      // Rayleigh quotient λ = vᵀCv / vᵀv, exact until the one division.
      val num = cov.join(vc.select(col("dim").as("i"), col("v").as("vi")), "i")
        .join(vc.select(col("dim").as("j"), col("v").as("vj")), "j")
        .agg(sum(col("vi") * col("c") * col("vj")).as("num"))
      val den = vc.agg(sum(col("v") * col("v")).as("den"))
      vc.crossJoin(broadcast(num)).crossJoin(broadcast(den))
        .select(col("dim"),
          (col("v").cast("double") / 1e6).as("loading"),
          (col("num").cast("double") / col("den").cast("double") /
            lit(1e8)).as("eigenvalue_q8"))
        .orderBy("dim")
    }),

    // LINEAR MULTI-TOUCH ATTRIBUTION: every purchase splits one unit of
    // credit equally across the user's touchpoints (click/view/signup)
    // in the 24h lookback window; purchases with no touches credit
    // '(direct)'. Credit quantizes as 1e6 DIV k per touch (integer floor
    // division — deterministic, remainder declared lost), so the rollup
    // is exact BIGINTs and one closing division. Scale shape: the
    // purchase⋈touch pairing is co-keyed on user_id with the time window
    // as a join residual (the events_range_join discipline — never a
    // time-unbounded self-join); per-purchase fan-in is bounded by the
    // lookback window, not the corpus.
    "events_attribution_linear" -> ((s, dir) => {
      val dayNs = 86400000000000L
      val ev = Sources.events(s, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("ts").as("tp"),
          col("event_id").as("pid"))
      val t = ev.filter(col("event_type").isin("click", "view", "signup"))
        .select(col("user_id").as("tu"), col("ts").as("tt"),
          col("event_type").as("touch"))
      val pairs = p.join(t,
        col("pu") === col("tu") && col("tt") < col("tp") &&
          col("tt") >= col("tp") - lit(dayNs), "left")
      val perType = pairs.filter(col("touch").isNotNull)
        .groupBy("pid", "touch").agg(count(lit(1)).as("cnt"))
      val k = perType.groupBy("pid").agg(sum(col("cnt")).as("k"))
      val credited = perType.join(k, "pid")
        .select(col("touch"), col("cnt"),
          (col("cnt") * expr("1000000 div k")).as("cq"))
        .groupBy("touch")
        .agg(sum(col("cnt")).as("n_touches"), sum(col("cq")).as("cq"))
      val direct = pairs.filter(col("touch").isNull)
        .groupBy(lit("(direct)").as("touch"))
        .agg(count(lit(1)).as("n_touches"),
          (count(lit(1)) * lit(1000000L)).as("cq"))
      credited.unionByName(direct)
        .select(col("touch"), col("n_touches"),
          (col("cq").cast("double") / 1e6).as("credit"))
        .orderBy("touch")
    }),

    // Newman MODULARITY of the BRAND partition over the co-purchase
    // graph — "do same-brand parts co-purchase more than a random graph
    // with these degrees would?", the partition-quality score every
    // community-detection pipeline optimizes, computed EXACTLY:
    // Q = Σ_c(4m·e_c − d_c²)/(4m²) keeps the numerator in BIGINT (e_c =
    // intra-community edges, d_c = community degree mass) with ONE
    // closing division. Attribute-derived communities (label = p_brand,
    // a broadcast dimension join) keep the whole thing two keyed
    // aggregates over the edge list — evaluating a CANDIDATE partition
    // is the cheap inner step that iterative community detection
    // (Louvain et al.) repeats; this is that step, distributed, with the
    // graph_triangles support-thresholded edge construction.
    "graph_modularity" -> ((s, dir) => {
      val op = Sources.lineitem(s, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val edges = util.Views.materialize(
        op.as("a").join(op.as("b"),
            col("a.o") === col("b.o") && col("a.p") < col("b.p"))
          .groupBy(col("a.p").as("u"), col("b.p").as("v"))
          .agg(count(lit(1)).as("support"))
          .filter(col("support") >= 2)
          .select("u", "v"))
      val nb = edges.select(col("u").as("n"), col("v").as("m"))
        .unionAll(edges.select(col("v").as("n"), col("u").as("m")))
      // Labels come ONLY from the part dimension (no edge lineage), so
      // joining them against edges/degrees can never trip the
      // ambiguous-self-join analyzer check.
      val partLabels = Sources.part(s, dir)
        .select(col("p_partkey").as("n"), col("p_brand").as("l"))
      val m = edges.agg(count(lit(1)).as("m"))
      val deg = nb.groupBy("n").agg(count(lit(1)).as("dg"))
      val nodesL = deg.join(broadcast(partLabels), "n")
      val ec = edges
        .join(broadcast(partLabels.select(col("n").as("u"), col("l").as("lu"))), "u")
        .join(broadcast(partLabels.select(col("n").as("v"), col("l").as("lv"))), "v")
        .filter(col("lu") === col("lv"))
        .groupBy(col("lu").as("c")).agg(count(lit(1)).as("e_c"))
      val dc = nodesL.groupBy(col("l").as("c")).agg(sum(col("dg")).as("d_c"))
      val perC = dc.join(ec, Seq("c"), "left")
        .select(col("c"), coalesce(col("e_c"), lit(0L)).as("e_c"), col("d_c"))
        .crossJoin(broadcast(m))
        .select((lit(4L) * col("m") * col("e_c") -
          col("d_c") * col("d_c")).as("term"))
      val sizes = nodesL.groupBy("l").agg(count(lit(1)).as("sz"))
      nodesL.agg(count(lit(1)).as("n_nodes"),
          countDistinct(col("l")).as("n_communities"))
        .crossJoin(broadcast(m.select(col("m").as("n_edges"))))
        .crossJoin(broadcast(sizes.agg(max(col("sz")).as("largest"))))
        .crossJoin(broadcast(perC.agg(sum(col("term")).as("qnum"))))
        .select(col("n_nodes"), col("n_edges"), col("n_communities"),
          col("largest"),
          (col("qnum").cast("double") /
            (lit(4.0) * col("n_edges").cast("double") *
              col("n_edges").cast("double"))).as("modularity"))
    }),

    // IMPORTANCE SAMPLING with a HORVITZ–THOMPSON estimator — the
    // unbiased-survey machinery for auditing a corpus you can't afford
    // to scan in full: docs enter the sample with length-proportional
    // probability p (per-mille grid, membership = md5 hash < p, so the
    // sample is a pure function of the doc id — retries and re-runs
    // agree), and each sampled doc reports its token count UPWEIGHTED by
    // 1/p (quantized as (n·10⁶) DIV p_mille, exact integers). The query
    // outputs the estimate NEXT TO the true total and the relative
    // error — the audit that justifies trusting samples at 100 TB, where
    // the full scan happens once and every later question hits the
    // sample. All sums BIGINT; two closing divisions.
    "docs_importance_sampling" -> ((s, dir) => {
      val base = Sources.documents(s, dir)
        .select(col("doc_id"), col("n_chars"),
          size(split(util.Norm.normalize(col("text")), " ")).cast("long")
            .as("n_words"))
        .withColumn("p_mille",
          least(lit(1000L), lit(50L) + expr("n_chars div 20")))
        .withColumn("u_mille",
          conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8),
            16, 10).cast("long") % 1000)
      val sampled = base.filter(col("u_mille") < col("p_mille"))
        .agg(count(lit(1)).as("n_sampled"),
          sum(expr("(n_words * 1000000) div p_mille")).as("ht_q"))
      val truth = base.agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("true_tokens"))
      truth.crossJoin(broadcast(sampled))
        .select(col("n_docs"), col("n_sampled"), col("true_tokens"),
          (col("ht_q").cast("double") / 1000.0).as("est_tokens"),
          ((col("ht_q").cast("double") / 1000.0 -
            col("true_tokens").cast("double")) /
            col("true_tokens").cast("double")).as("rel_error"))
    }),

    // WELCH'S t-TEST (unequal variances) between the deterministic
    // odd/even-user arms — the missing member of the classical-test
    // family (z, χ², KS, U, F, and now t): sample variances come from
    // the exact-BIGINT moment identity n·Σx²−(Σx)² computed in
    // DECIMAL(38,0) ⇔ HUGEINT (overflows BIGINT at 100×) and enter ONE
    // fixed IEEE tree for the t statistic and the Welch–Satterthwaite
    // effective df. One conditional keyed aggregate over the corpus;
    // the >2^53 exact integers cross to double through the VARCHAR
    // round-trip contract on the DuckDB side.
    "events_ttest_welch" -> ((s, dir) => {
      val d38 = DecimalType(38, 0)
      val m = Sources.events(s, dir)
        .select((col("user_id") % 2 === 1).as("t"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("x"))
        .agg(
          sum(when(col("t"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("t"), col("x")).otherwise(0L)).as("s1"),
          sum(when(col("t"), col("x") * col("x")).otherwise(0L)).as("ss1"),
          sum(when(!col("t"), 1L).otherwise(0L)).as("n2"),
          sum(when(!col("t"), col("x")).otherwise(0L)).as("s2"),
          sum(when(!col("t"), col("x") * col("x")).otherwise(0L)).as("ss2"))
      def v(n: String, sx: String, ssx: String): Column =
        (col(n).cast(d38) * col(ssx).cast(d38) -
          col(sx).cast(d38) * col(sx).cast(d38)).cast("double") /
          (col(n).cast("double") * (col(n) - 1).cast("double"))
      m
        .withColumn("m1", col("s1").cast("double") / col("n1").cast("double"))
        .withColumn("m2", col("s2").cast("double") / col("n2").cast("double"))
        .withColumn("v1", v("n1", "s1", "ss1") / col("n1").cast("double"))
        .withColumn("v2", v("n2", "s2", "ss2") / col("n2").cast("double"))
        .select(col("n1"), col("n2"),
          ((col("m1") - col("m2")) / 100.0).as("mean_diff"),
          ((col("m1") - col("m2")) / sqrt(col("v1") + col("v2"))).as("t_stat"),
          ((col("v1") + col("v2")) * (col("v1") + col("v2")) /
            (col("v1") * col("v1") / (col("n1") - 1).cast("double") +
              col("v2") * col("v2") / (col("n2") - 1).cast("double")))
            .as("df_welch"))
    }),

    // A/B SAMPLE-SIZE (power) CALCULATOR from measured variance: the
    // n-per-arm needed to detect a 2% lift on the control mean at
    // α=.05 / power=.80 — the experiment-design readout that consumes
    // the engine's variance estimates. n = 2(z_{.975}+z_{.8})²σ²/δ²
    // with the z quantiles as BUILD-TIME constants interpolated into
    // both plans (the Benford discipline), pooled σ² from the exact
    // DECIMAL(38,0) moment identity, and one ceil() at the end. The
    // measurement is one conditional aggregate; everything after is
    // 1-row algebra.
    "events_power_analysis" -> ((s, dir) => {
      val d38 = DecimalType(38, 0)
      val z = PowerZSum // z_{.975} + z_{.8}, build-time constant
      val m = Sources.events(s, dir)
        .select((col("user_id") % 2 === 1).as("t"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("x"))
        .agg(
          sum(when(col("t"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("t"), col("x")).otherwise(0L)).as("s1"),
          sum(when(col("t"), col("x") * col("x")).otherwise(0L)).as("ss1"),
          sum(when(!col("t"), 1L).otherwise(0L)).as("n2"),
          sum(when(!col("t"), col("x")).otherwise(0L)).as("s2"),
          sum(when(!col("t"), col("x") * col("x")).otherwise(0L)).as("ss2"))
      def ssq(n: String, sx: String, ssx: String): Column =
        (col(n).cast(d38) * col(ssx).cast(d38) -
          col(sx).cast(d38) * col(sx).cast(d38)).cast("double") /
          (col(n).cast("double") * (col(n) - 1).cast("double"))
      m
        .withColumn("sp2",
          ((col("n1") - 1).cast("double") * ssq("n1", "s1", "ss1") +
            (col("n2") - 1).cast("double") * ssq("n2", "s2", "ss2")) /
            (col("n1") + col("n2") - 2).cast("double"))
        .withColumn("mde",
          lit(0.02) * (col("s2").cast("double") / col("n2").cast("double")))
        .select(col("n1"), col("n2"),
          (col("mde") / 100.0).as("mde_abs"),
          (col("sp2") / 1e4).as("sigma2_pooled"),
          ceil(lit(2.0) * lit(z * z) * col("sp2") /
            (col("mde") * col("mde"))).cast("long").as("n_per_arm"))
    }),

    // k-NN CLASSIFIER over the embedding corpus — the non-parametric
    // model you get for free once similarity search exists: each test
    // vector (10% id-hash split) takes the MAJORITY LABEL of its 5
    // nearest train vectors under the exact cosine tier
    // (sim.Similarity.bruteTopK — broadcast queries, bounded-heap top-k,
    // deterministic (sim DESC, vec_id) tie order), votes adjudicate by
    // (count DESC, label ASC), and the readout is the truth×prediction
    // confusion matrix. The all-pairs scoring is the DECLARED exact tier
    // exactly as in sim_brute_topk; at corpus scale the same vote/argmax
    // pipeline runs unchanged over the ANN candidates (sim_ann_rhp/_ivf)
    // instead. One more distributed "trained" model whose inference is
    // pure dataflow.
    "emb_knn_classifier" -> ((s, dir) => {
      val emb = Sources.embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))
      val isTest = col("id") % 10 === 0
      val topk = sim.Similarity.bruteTopK(
        emb.filter(isTest).select("id", "vec"),
        emb.filter(!isTest).select("id", "vec"), 5)
      val votes = topk
        .join(emb.filter(!isTest).select(col("id").as("vec_id"),
          col("label").as("nlabel")), "vec_id")
        .groupBy("query_id", "nlabel").agg(count(lit(1)).as("votes"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("votes").desc, col("nlabel").asc)
      votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .join(emb.filter(isTest).select(col("id").as("query_id"),
          col("label").as("truth")), "query_id")
        .groupBy(col("truth"), col("nlabel").as("pred"))
        .agg(count(lit(1)).as("n_vecs"))
        .orderBy("truth", "pred")
    }),

    // SIMPLIFIED SILHOUETTE of the label partition over the embeddings —
    // the cluster-quality score consulted before trusting any clustering
    // (or, here, auditing how geometrically coherent the labels are):
    // per vector, a = distance to its OWN label centroid, b = distance
    // to the nearest OTHER centroid, s = (b−a)/max(a,b). Centroids are
    // integer-exact (1e-4-quantized component sums, floor-divided by the
    // class count), squared distances are pure BIGINT, and each row's s
    // — the only IEEE steps are one sqrt pair and one division —
    // QUANTIZES to a 1e-6 integer BEFORE the per-label mean (the
    // summation-order discipline: raw double sums are partition-order-
    // dependent). Scale shape: one broadcast of the |labels|×dims
    // centroid table, explode bounded by dims×|labels| per row, two
    // keyed aggregates. The centroid-simplified form EXISTS because the
    // classic all-pairs silhouette is quadratic — this is the one that
    // runs at 100 TB.
    "emb_silhouette" -> ((s, dir) => {
      val comps = Sources.embeddings(s, dir)
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("i", "x")))
        .select(col("vec_id"), col("label"), col("i"),
          floor(col("x").cast("double") * 1e4 + 0.5).cast("long").as("xq"))
      // Sign-split floor division for the centroid mean: component sums
      // can be negative, where Spark `div` truncates toward zero but
      // DuckDB `//` floors — divide magnitudes, reapply the sign.
      val cents = comps.groupBy(col("label").as("cl"), col("i"))
        .agg(sum(col("xq")).as("sx"), count(lit(1)).as("cn"))
        .select(col("cl"), col("i"),
          when(col("sx") < 0, -expr("(-sx) div cn"))
            .otherwise(expr("sx div cn")).as("cq"))
      val d2 = comps
        .join(broadcast(cents), "i")
        .groupBy(col("vec_id"), col("label"), col("cl"))
        .agg(sum((col("xq") - col("cq")) * (col("xq") - col("cq"))).as("d2"))
      val perVec = d2.groupBy("vec_id", "label")
        .agg(
          sqrt(max(when(col("cl") === col("label"), col("d2"))).cast("double"))
            .as("a"),
          sqrt(min(when(col("cl") =!= col("label"), col("d2"))).cast("double"))
            .as("b"))
        .select(col("label"),
          floor((col("b") - col("a")) /
            greatest(col("a"), col("b")) * 1e6 + 0.5).cast("long").as("sq6"))
      perVec.groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          (sum(col("sq6")).cast("double") / lit(1e6) /
            count(lit(1)).cast("double")).as("mean_silhouette"))
        .orderBy("label")
    }),

    // TEXTRANK keyword extraction — PageRank over the word co-occurrence
    // graph, reusing the engine's ALL-INTEGER power iteration
    // (graph/PageRank.scala): adjacent-word pairs become the undirected
    // edge set, words get DENSE integer ids via one vocabulary-grain
    // window (deterministic: row_number over the sorted vocab — never a
    // hash, whose collisions would silently merge words), and six damped
    // rounds rank the graph in exact 1e-9 units. The corpus pass is one
    // lead() window per doc; every iteration thereafter costs |word
    // graph|, not |corpus| — same property that makes text_bpe_merge_step
    // feasible. Top-20 by (pr DESC, word).
    "text_textrank_keywords" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      val words = Sources.documents(s, dir)
        .select(col("doc_id"),
          posexplode(split(util.Norm.normalize(col("text")), " "))
            .as(Seq("pos", "word")))
        .filter(col("word") =!= "")
      val pairs = words
        .withColumn("nxt", lead(col("word"), 1).over(w))
        .filter(col("nxt").isNotNull && col("word") =!= col("nxt"))
        .select(col("word").as("wa"), col("nxt").as("wb"))
      val ids = words.select("word").distinct()
        .withColumn("wid", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("word")).cast("long"))
      val und = pairs
        .join(broadcast(ids.select(col("word").as("wa"), col("wid").as("ia"))), "wa")
        .join(broadcast(ids.select(col("word").as("wb"), col("wid").as("ib"))), "wb")
        .select(least(col("ia"), col("ib")).as("u"),
          greatest(col("ia"), col("ib")).as("v"))
        .distinct()
      val edges = und.select(col("u").as("src"), col("v").as("dst"))
        .union(und.select(col("v").as("src"), col("u").as("dst")))
      graph.PageRank.ranks(edges, iters = 6)
        .join(broadcast(ids.select(col("wid").as("node"), col("word"))), "node")
        .select(col("word"), col("pr"))
        .orderBy(col("pr").desc, col("word"))
        .limit(20)
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

    // HELD-OUT language-model evaluation — the honest LM quality number
    // (text_unigram_logprob scores the corpus under ITSELF, which
    // rewards memorization): an add-1-smoothed unigram model fits on the
    // 90% split and the 10% held-out split reports per-language token
    // count, average negative log-likelihood, and perplexity — OOV
    // words cost the full smoothing penalty through the left join's
    // coalesce, exactly as the estimator defines. NLL terms follow the
    // quantized-ln discipline (integers end to end, one division);
    // perplexity = exp(nll) is emitted %.4e-formatted (the stddev
    // contract — exp is not cross-engine bit-stable). Model size is
    // vocabulary-bounded; scoring is one co-keyed join.
    "docs_perplexity_heldout" -> ((s, dir) => {
      val words = Sources.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          explode(split(util.Norm.normalize(col("text")), " ")).as("word"))
        .filter(col("word") =!= "")
      val isTest = col("doc_id") % 10 === 0
      def qln(c: Column): Column =
        floor(log(c.cast("double")) * 1e4 + 0.5).cast("long")
      val trainW = words.filter(!isTest)
      val model = trainW.groupBy("word").agg(count(lit(1)).as("c"))
        .select(col("word"), qln(col("c") + 1).as("qc"))
      val denom = trainW.agg(
        qln(count(lit(1)) + countDistinct(col("word"))).as("qd"))
      words.filter(isTest)
        .join(model, Seq("word"), "left")
        .crossJoin(broadcast(denom))
        .select(col("lang"),
          (col("qd") - coalesce(col("qc"), lit(0L))).as("nll_q"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_tokens"), sum(col("nll_q")).as("snll"))
        .select(col("lang"), col("n_tokens"),
          (col("snll").cast("double") / 1e4 / col("n_tokens").cast("double"))
            .as("avg_nll"),
          util.Stable.sig(exp(col("snll").cast("double") / 1e4 /
            col("n_tokens").cast("double"))).as("perplexity"))
        .orderBy("lang")
    }),

    // SKYLINE (Pareto front) — the preference-query operator class: the
    // parts no other part dominates on (price LOW, size HIGH). The naive
    // definition is an all-pairs dominance test; the distributed form
    // reduces to the PRICE GRAIN + two cumulative-max windows: a part is
    // dominated iff the best size at a STRICTLY lower price ≥ its size,
    // or the best size at price ≤ its own is STRICTLY greater — both
    // read off one price-ordered running max (ROWS frames over the
    // distinct-price table, bounded by the price domain, never the
    // corpus). Equal (price, size) twins co-exist on the frontier, the
    // standard skyline tie rule. All arithmetic on exact cents/integers.
    "part_skyline" -> ((s, dir) => {
      val parts = Sources.part(s, dir)
        .select(col("p_partkey"),
          expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)").as("cents"),
          col("p_size").cast("long").as("size"))
      val wPrev = org.apache.spark.sql.expressions.Window.orderBy("cents")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val wIncl = org.apache.spark.sql.expressions.Window.orderBy("cents")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val grain = parts.groupBy("cents").agg(max(col("size")).as("bs"))
        .withColumn("cm_prev", max(col("bs")).over(wPrev))
        .withColumn("cm_incl", max(col("bs")).over(wIncl))
      parts.join(grain.select("cents", "cm_prev", "cm_incl"), "cents")
        .filter(!(coalesce(col("cm_prev"), lit(Long.MinValue)) >= col("size") ||
          col("cm_incl") > col("size")))
        .select(col("p_partkey"), (col("cents").cast("double") / 100.0).as("price"),
          col("size"))
        .orderBy("price", "size", "p_partkey")
    }),

    // SAMPLE-RATIO-MISMATCH check — the first guardrail any experiment
    // platform runs before reading an A/B result: is the observed arm
    // split consistent with the intended 50/50? χ² = (n₁−n₂)²/(n₁+n₂)
    // over exact DISTINCT-USER counts (assignment is per user, so the
    // unit of the test is the user, never the event), flagged at the
    // 3.84 (α=.05, df=1) critical value. One distinct + one aggregate.
    "events_srm_check" -> ((s, dir) => {
      val arms = Sources.events(s, dir)
        .select(col("user_id")).distinct()
        .select((col("user_id") % 2 === 1).as("t"))
        .agg(sum(when(col("t"), 1L).otherwise(0L)).as("n1"),
          sum(when(!col("t"), 1L).otherwise(0L)).as("n2"))
      arms.select(col("n1"), col("n2"),
        (((col("n1") - col("n2")) * (col("n1") - col("n2"))).cast("double") /
          (col("n1") + col("n2")).cast("double")).as("chi2"),
        ((((col("n1") - col("n2")) * (col("n1") - col("n2"))).cast("double") /
          (col("n1") + col("n2")).cast("double")) > 3.84).cast("int")
          .as("srm_flag"))
    }),

    // FIFO COST ALLOCATION — the inventory-ledger computation (match
    // issues against receipt lots in arrival order) WITHOUT the
    // sequential loop every naive implementation uses: both streams
    // become CUMULATIVE-UNIT intervals (receipt lot r covers units
    // [Σqty_before, Σqty_incl); issue i likewise), and FIFO matching IS
    // the interval overlap — matched units = least(ends) − greatest
    // (starts). Per part the match count is bounded by nR + nI − 1 (each
    // match closes a lot or an issue), so the co-keyed range join can
    // never blow up — the sweep-line discipline of orders_backlog
    // applied to two streams. Lot cost allocates proportionally as
    // (lot_price_cents · matched) DIV lot_qty — integer floor division,
    // deterministic. Receipts = even-orderkey lineitems, issues = odd
    // (the declared fixture split); all windows per-part.
    "part_fifo_allocation" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("p").orderBy("d", "ok", "ln")
      def stream(parity: Int) = Sources.lineitem(s, dir)
        .filter(col("l_orderkey") % 2 === parity)
        .select(col("l_partkey").as("p"), col("l_shipdate").as("d"),
          col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
          expr("CAST(floor(l_quantity) AS BIGINT)").as("q"),
          expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("pc"))
        .withColumn("hi", sum(col("q")).over(w))
        .withColumn("lo", col("hi") - col("q"))
      val receipts = stream(0)
        .select(col("p"), col("lo").as("rb"), col("hi").as("re"),
          col("q").as("rq"), col("pc"))
      val issues = stream(1)
        .select(col("p"), col("lo").as("ib"), col("hi").as("ie"))
      val matches = issues.join(receipts, Seq("p"))
        .filter(col("rb") < col("ie") && col("ib") < col("re"))
        .select(col("p"),
          (least(col("re"), col("ie")) - greatest(col("rb"), col("ib")))
            .as("m"),
          col("rq"), col("pc"))
        .groupBy("p")
        .agg(sum(col("m")).as("matched"),
          sum(expr("(pc * m) div rq")).as("cogs_cents"))
      val issued = issues.groupBy("p").agg(max(col("ie")).as("issued"))
      issued.join(matches, Seq("p"), "left")
        .select(col("p").as("p_partkey"), col("issued"),
          coalesce(col("matched"), lit(0L)).as("matched"),
          coalesce(col("cogs_cents"), lit(0L)).as("cogs_cents"))
        .orderBy("p_partkey")
    }),

    // Fact-to-SCD2-dimension TEMPORAL JOIN — the warehouse pattern the
    // events_scd2 table exists FOR: each purchase joins the user's state
    // version valid AT ITS TIMESTAMP (valid_from ≤ ts < valid_to, open
    // tail null-guarded). The state intervals partition each user's
    // observed timeline, so every purchase matches exactly one version
    // — a co-keyed join with a range residual (the events_range_join
    // class), never a per-fact subquery. Readout: purchase count and
    // exact cents by the state the user was in when buying.
    "events_scd2_lookup" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      // The dimension tracks the NON-purchase activity state (browsing
      // context) — built from purchases too, every purchase would
      // trivially sit in its own 'purchase' run and the lookup would be
      // degenerate. Purchases before any non-purchase activity map to
      // '(none)' via the left join, so counts conserve.
      val dim = Sources.events(s, dir)
        .filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("event_type").as("state"),
          expr("ts DIV 1000").as("ts_us"), col("event_id"))
        .withColumn("prev_state", lag(col("state"), 1).over(w))
        .filter(col("prev_state").isNull || col("prev_state") =!= col("state"))
        .withColumn("vt", lead(col("ts_us"), 1).over(w))
        .select(col("user_id").as("du"), col("state"),
          col("ts_us").as("vf"), col("vt"))
      val facts = Sources.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), expr("ts DIV 1000").as("fts"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      facts.join(dim,
          col("user_id") === col("du") && col("fts") >= col("vf") &&
            (col("vt").isNull || col("fts") < col("vt")), "left")
        .groupBy(coalesce(col("state"), lit("(none)")).as("state_at_purchase"))
        .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("cents"))
        .orderBy("state_at_purchase")
    }),

    // DUPLICATE-INVOICE detection — the accounts-payable fraud/error
    // audit: same customer, near-identical amount (≤ $100), close dates
    // (≤ 90 days), different orders. The all-pairs-per-customer form is
    // quadratic on big accounts; the scale shape is the LSH-style
    // BANDED self-join — each order sits in its $100 amount band, the
    // probe side explodes to the ±1 neighborhood, so every true pair
    // meets in EXACTLY one (customer, band) bucket (probe band =
    // candidate's own band, no dedup pass) and bucket width bounds the
    // fan-out. Residuals (exact cent diff, day gap, key order) evaluate
    // post-join. Exact integers throughout.
    "orders_dupe_invoice_detect" -> ((s, dir) => {
      val base = Sources.orders(s, dir)
        .select(col("o_custkey").as("cust"), col("o_orderkey").as("okey"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"),
          expr("CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT)")
            .as("day"))
      val left = base.withColumn("band", expr("cents div 10000"))
      val right = base
        .select(col("cust").as("cust_b"), col("okey").as("okey_b"),
          col("cents").as("cents_b"), col("day").as("day_b"),
          explode(array(expr("cents div 10000 - 1"), expr("cents div 10000"),
            expr("cents div 10000 + 1"))).as("band"))
      left.join(right,
          col("cust") === col("cust_b") && left("band") === right("band") &&
            col("okey") < col("okey_b") &&
            abs(col("cents") - col("cents_b")) <= 10000 &&
            abs(col("day") - col("day_b")) <= 90)
        .select(col("cust"), col("okey").as("okey_a"), col("okey_b"),
          abs(col("cents") - col("cents_b")).as("diff_cents"),
          abs(col("day") - col("day_b")).as("day_gap"))
        .orderBy("cust", "okey_a", "okey_b")
    }),

    // MAXIMAL MARGINAL RELEVANCE re-rank — retrieval DIVERSIFICATION:
    // from the query's top-20 exact-cosine candidates, greedily select 5
    // maximizing λ·sim(query) − (1−λ)·max-sim-to-already-selected
    // (λ=0.7) — the standard fix for near-duplicate result lists, run as
    // a FIXED 5-step unroll (each step: candidates × the ≤4-row selected
    // set, one argmax with vec_id tiebreak — bounded work however large
    // the corpus, because only the top-20 candidate set enters).
    // Cosine doubles are the engine's in-order fold (bit-identical in
    // DuckDB via list_reduce), so the greedy trajectory is reproducible.
    "emb_mmr_rerank" -> ((s, dir) => {
      val emb = Sources.embeddings(s, dir)
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      // Candidates materialize ONCE: the greedy unroll references them in
      // every step, and without the cache each step's plan would embed —
      // and re-execute — the whole top-k scan.
      val cands = util.Views.materialize(
        sim.Similarity.bruteTopK(emb.filter(col("id") === 0), emb, 20)
          .join(emb.select(col("id").as("vec_id"), col("vec")), "vec_id")
          .select(col("vec_id"), col("vec"), col("sim")))
      var selected = cands
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(1)
        .select(col("vec_id"), col("vec"), col("sim"), lit(1).as("rank"),
          col("sim").as("mmr_score"))
      for (step <- 2 to 5) {
        selected = util.Views.materialize(selected)
        val selVecs = broadcast(selected
          .select(col("vec_id").as("sid"), col("vec").as("svec")))
        val next = cands
          .join(selected.select(col("vec_id").as("done")),
            col("vec_id") === col("done"), "left_anti")
          .crossJoin(selVecs)
          .groupBy(col("vec_id"), col("sim"))
          .agg(max(sim.Similarity.cosine(
              sim.Similarity.vec(col("vec")),
              sim.Similarity.vec(col("svec")))).as("maxsel"),
            first(col("vec")).as("vec"))
          .select(col("vec_id"), col("vec"), col("sim"),
            (lit(0.7) * col("sim") - lit(0.3) * col("maxsel")).as("mmr_score"))
          .orderBy(col("mmr_score").desc, col("vec_id"))
          .limit(1)
          .select(col("vec_id"), col("vec"), col("sim"),
            lit(step).as("rank"), col("mmr_score"))
        selected = selected.unionByName(next)
      }
      selected.select(col("rank"), col("vec_id"), col("sim"), col("mmr_score"))
        .orderBy("rank")
    }),

    // METRIC DECOMPOSITION (driver analysis) — the root-cause readout a
    // BI layer runs when a topline moves: week-over-week purchase
    // revenue change split into the USER-COUNT contribution
    // (ΔU·ARPU_prev) and the ARPU contribution (U_curr·ΔARPU), an exact
    // algebraic partition of ΔR = R_c − R_p. Periods anchor on the
    // corpus max day (derived in-plan, 1-row broadcast — no driver
    // round-trip); revenue is exact cents, distinct purchasers exact
    // counts, and the decomposition is one fixed IEEE tree mirrored in
    // the oracle. One conditional aggregate over the purchase slice.
    "events_revenue_decomp" -> ((s, dir) => {
      val p = Sources.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), expr("ts div 86400000000000").as("day"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
      val maxd = p.agg(max(col("day")).as("maxd"))
      val m = p.crossJoin(broadcast(maxd))
        .withColumn("period",
          when(col("day") > col("maxd") - 7, lit("curr"))
            .when(col("day") > col("maxd") - 14, lit("prev")))
        .filter(col("period").isNotNull)
        .groupBy("period")
        .agg(countDistinct(col("user_id")).as("u"), sum(col("cents")).as("r"))
      val wide = m.groupBy()
        .agg(max(when(col("period") === "prev", col("u"))).as("u_prev"),
          max(when(col("period") === "curr", col("u"))).as("u_curr"),
          max(when(col("period") === "prev", col("r"))).as("r_prev"),
          max(when(col("period") === "curr", col("r"))).as("r_curr"))
      wide
        .withColumn("rpu_prev",
          col("r_prev").cast("double") / col("u_prev").cast("double"))
        .withColumn("rpu_curr",
          col("r_curr").cast("double") / col("u_curr").cast("double"))
        .select(col("u_prev"), col("u_curr"),
          (col("r_prev").cast("double") / 100.0).as("rev_prev"),
          (col("r_curr").cast("double") / 100.0).as("rev_curr"),
          ((col("r_curr") - col("r_prev")).cast("double") / 100.0)
            .as("delta_total"),
          ((col("u_curr") - col("u_prev")).cast("double") * col("rpu_prev") /
            100.0).as("contrib_users"),
          (col("u_curr").cast("double") *
            (col("rpu_curr") - col("rpu_prev")) / 100.0).as("contrib_arpu"))
    }),

    // HOPPING (sliding) event-time windows — the third member of the
    // window-shape family (tumbling = events_hourly_window, session =
    // events_session_window_native): Spark's native window(ts, 2h, 1h)
    // assigns each event to duration/hop = 2 overlapping windows, the
    // smoothing shape dashboards ask for ("2-hour trailing volume, updated
    // hourly"). Plans as ONE Expand (factor 2, bounded by the window
    // ratio, never per-row state) + a keyed aggregate — map-side
    // combinable, scales like any groupBy. The oracle replays the window
    // assignment arithmetically: starts (us DIV 3600e6 − i)·3600e6 for
    // i ∈ {0,1}, exactly Spark's assignment rule.
    "events_hopping_window" -> ((s, dir) => {
      val ev = Sources.events(s, dir)
        .withColumn("tsm", timestamp_micros(expr("ts div 1000")))
      ev.groupBy(window(col("tsm"), "2 hours", "1 hour").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(expr("CAST(floor(value * 1e8 + 0.5) AS BIGINT)"))
            .as("sum_value_q8"))
        .select(unix_micros(col("w.start")).as("w_start_us"),
          col("event_type"), col("n_events"), col("n_users"),
          col("sum_value_q8"))
        .orderBy("w_start_us", "event_type")
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

    // POPULATION STABILITY INDEX — the banded drift monitor model-risk
    // teams run between a reference window and live traffic (the third
    // drift lens beside events_entropy_drift's mix entropy and
    // docs_js_divergence's vocabulary JS): per event type, PSI =
    // Σ_b (p_b − q_b)·ln(p_b/q_b) over 1e-2-quantized value bands, with
    // add-one smoothing so empty bands stay finite. Periods split on the
    // corpus midpoint day (1-row broadcast, no driver round-trip). The
    // quantized-ln discipline makes the sum order-free: every ln argument
    // is an exact integer count, each lnQ quantizes to 1e-4 longs, the
    // per-band term (two exact-integer IEEE divisions × the integer ln
    // combination) quantizes to 1e-9 longs BEFORE the cross-partition
    // sum. Two keyed aggregates over the tiny band table — scale-free.
    "events_psi_drift" -> ((s, dir) => {
      def lnQ(c: Column) = floor(log(c.cast("double")) * 1e4 + 0.5).cast("long")
      val ev = Sources.events(s, dir)
        .select(col("event_type"), expr("ts DIV 86400000000000").as("day"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT) DIV 2500").as("vband"))
      val cut = ev.agg(((min(col("day")) + max(col("day")) + 1L) / 2L)
        .cast("long").as("cutd"))
      val cells = ev.crossJoin(broadcast(cut))
        .groupBy("event_type", "vband")
        .agg(sum(when(col("day") < col("cutd"), 1L).otherwise(0L)).as("c_ref"),
          sum(when(col("day") >= col("cutd"), 1L).otherwise(0L)).as("c_cur"))
      val totals = cells.groupBy("event_type")
        .agg(sum(col("c_ref")).as("n_ref"), sum(col("c_cur")).as("n_cur"),
          count(lit(1)).as("n_bands"))
      cells.join(totals, "event_type")
        .withColumn("p", (col("c_ref") + 1L).cast("double") /
          (col("n_ref") + col("n_bands")).cast("double"))
        .withColumn("q", (col("c_cur") + 1L).cast("double") /
          (col("n_cur") + col("n_bands")).cast("double"))
        .withColumn("lnr_q4",
          lnQ(col("c_ref") + 1L) - lnQ(col("n_ref") + col("n_bands")) -
            lnQ(col("c_cur") + 1L) + lnQ(col("n_cur") + col("n_bands")))
        .withColumn("term_q9", floor((col("p") - col("q")) *
          col("lnr_q4").cast("double") / 1e4 * 1e9 + 0.5).cast("long"))
        .groupBy("event_type")
        .agg(max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
          max(col("n_bands")).as("n_bands"),
          (sum(col("term_q9")).cast("double") / 1e9).as("psi"))
        .orderBy("event_type")
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

    // TIME-CONSTRAINED funnel — events_funnel counts unordered-deadline
    // stage reach; real activation funnels bound the INTER-STEP gap
    // ("clicked within 1h of signing up, purchased within 24h of that
    // click"). Three stages chain as per-user keyed min-aggregates with
    // the previous stage's timestamp joined back co-keyed on user —
    // every join is user-keyed (the sessionize shuffle shape), the
    // deadline residual is exact BIGINT-nanos arithmetic, and the final
    // rollup is three 1-row broadcasts. Conversion rates are single IEEE
    // divisions of exact counts.
    "events_funnel_windowed" -> ((s, dir) => {
      val hourNs = 3600L * 1000000000L
      val ev = Sources.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
      val su = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("su_ts"))
      val ck = ev.filter(col("event_type") === "click").join(su, "user_id")
        .filter(col("ts") > col("su_ts") &&
          col("ts") <= col("su_ts") + lit(hourNs))
        .groupBy("user_id").agg(min("ts").as("ck_ts"))
      val pu = ev.filter(col("event_type") === "purchase").join(ck, "user_id")
        .filter(col("ts") > col("ck_ts") &&
          col("ts") <= col("ck_ts") + lit(24L * hourNs))
        .groupBy("user_id").agg(min("ts").as("pu_ts"))
      su.agg(count(lit(1)).as("n_signup"))
        .crossJoin(broadcast(ck.agg(count(lit(1)).as("n_click_1h"))))
        .crossJoin(broadcast(pu.agg(count(lit(1)).as("n_purchase_24h"))))
        .withColumn("cvr_click",
          col("n_click_1h").cast("double") / col("n_signup").cast("double"))
        .withColumn("cvr_purchase", col("n_purchase_24h").cast("double") /
          nullif(col("n_click_1h"), lit(0L)).cast("double"))
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

    // ABC (80/95) INVENTORY CLASSIFICATION — the thresholded sibling of
    // customer_pareto's deciles: parts ranked by exact-decimal revenue,
    // class A = the head up to 80% of cumulative revenue, B to 95%, C
    // the tail. The running sum is a window over the AGGREGATED part
    // grain (bounded by catalog size, not fact volume — the pareto
    // scale note applies), the class cut adjudicates as exact decimal
    // comparisons (cum·100 ≤ total·80 — no share division before the
    // cut), and revenue itself is the house dec2·rate2 exact product.
    "orders_abc_class" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val rev = Sources.lineitem(s, dir)
        .groupBy("l_partkey")
        .agg(sum(util.Stable.dec2(col("l_extendedprice")) *
          (util.Stable.rate2(lit(1.0)) - util.Stable.rate2(col("l_discount"))))
          .as("rev"))
      val tot = rev.agg(sum(col("rev")).as("total"))
      val cum = rev
        .withColumn("cum", sum(col("rev")).over(
          Window.orderBy(col("rev").desc, col("l_partkey"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(tot))
        .withColumn("abc_class",
          when(col("cum") * 100 <= col("total") * 80, "A")
            .when(col("cum") * 100 <= col("total") * 95, "B")
            .otherwise("C"))
      cum.groupBy("abc_class")
        .agg(count(lit(1)).as("n_parts"),
          sum(col("rev")).cast("double").as("revenue"),
          (sum(col("rev")).cast("double") /
            max(col("total")).cast("double")).as("share"))
        .orderBy("abc_class")
    }),

    // DEGREE ASSORTATIVITY of the part co-purchase graph — "do hubs
    // link to hubs?": the Pearson correlation of endpoint degrees over
    // the edge list (each undirected edge contributes both
    // orientations, the standard convention). Completes the graph-
    // analytics suite's structural readouts (triangles = clustering,
    // modularity = partition quality, this = degree mixing). Degrees
    // are one keyed aggregate broadcast-joined back to the edges; the
    // moments are PURE BIGINT (the corr_matrix discipline) with one
    // final sqrt+divide tree. Edge derivation = the thresholded
    // distinct-pair graph shared with graph_triangles/common_neighbors.
    "graph_assortativity" -> ((s, dir) => {
      val op = Sources.lineitem(s, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val edges = op.as("a").join(op.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("u"), col("b.p").as("v"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
        .select("u", "v")
      val dir2 = edges.select(col("u").as("x"), col("v").as("y"))
        .unionAll(edges.select(col("v").as("x"), col("u").as("y")))
      val deg = dir2.groupBy("x").agg(count(lit(1)).as("d"))
      val ed = dir2
        .join(deg.select(col("x"), col("d").as("dx")), "x")
        .join(deg.select(col("x").as("y"), col("d").as("dy")), "y")
      ed.agg(count(lit(1)).as("m2"),
          sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
          sum(col("dx") * col("dx")).as("sxx"),
          sum(col("dy") * col("dy")).as("syy"),
          sum(col("dx") * col("dy")).as("sxy"))
        .withColumn("num",
          (col("m2") * col("sxy") - col("sx") * col("sy")).cast("double"))
        .withColumn("vx",
          (col("m2") * col("sxx") - col("sx") * col("sx")).cast("double"))
        .withColumn("vy",
          (col("m2") * col("syy") - col("sy") * col("sy")).cast("double"))
        .select(col("m2"),
          (col("num") / nullif(sqrt(col("vx") * col("vy")), lit(0.0)))
            .as("assortativity"))
    }),

    // SOURCE-PAIR VOCABULARY SIMILARITY MATRIX — "which corpus sources
    // speak the same language": per-source KMV sketches over the
    // normalized vocabulary, pairwise Jaccard ESTIMATED from pure
    // sketch algebra (est(A∩B) = estA+estB−est(A∪B), union sketch =
    // the k smallest of the merged top-k sets — KmvSpec's proven merge)
    // beside the EXACT Jaccard audit (word-grain co-keyed self-join).
    // The sketch path is the 100 TB shape: one corpus pass builds
    // O(sources·k) state, every pairwise question answers from sketches
    // alone; the exact twin is fixture-feasible and bounded by
    // |vocab|·C(sources-per-word, 2). C(20,2)=190 output rows.
    "docs_source_similarity" -> ((s, dir) => {
      val k = 256
      val kc = lit((k - 1).toDouble * functions.KmvUtil.HashSpan)
      def estOf(kmv: Column) =
        when(size(kmv) < k, size(kmv).cast("double"))
          .otherwise(kc / element_at(kmv, k).cast("double"))
      val ws = Sources.documents(s, dir)
        .select(col("source"),
          explode(split(util.Norm.normalize(col("text")), " ")).as("w"))
        .filter(col("w") =!= "").distinct()
      val sk = ws.groupBy("source")
        .agg(expr(s"kmv_agg(w, $k)").as("kmv"),
          count(lit(1)).as("n_vocab"))
      val pairs = sk.as("a").join(sk.as("b"), col("a.source") < col("b.source"))
        .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
          col("a.n_vocab").as("n_vocab_a"), col("b.n_vocab").as("n_vocab_b"),
          col("a.kmv").as("kmv_a"), col("b.kmv").as("kmv_b"))
        .withColumn("kmv_u",
          slice(array_sort(array_distinct(concat(col("kmv_a"), col("kmv_b")))),
            1, k))
      val inter = ws.as("x").join(ws.as("y"),
          col("x.w") === col("y.w") && col("x.source") < col("y.source"))
        .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
        .agg(count(lit(1)).as("n_inter"))
      pairs.join(inter, Seq("src_a", "src_b"), "left")
        .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
        .withColumn("j_exact", col("n_inter").cast("double") /
          (col("n_vocab_a") + col("n_vocab_b") - col("n_inter")).cast("double"))
        .withColumn("est_union", estOf(col("kmv_u")))
        .withColumn("j_est",
          greatest(lit(0.0), estOf(col("kmv_a")) + estOf(col("kmv_b"))
            - col("est_union")) / col("est_union"))
        .select("src_a", "src_b", "n_vocab_a", "n_vocab_b", "n_inter",
          "j_exact", "est_union", "j_est")
        .orderBy("src_a", "src_b")
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

    // READABILITY (Flesch reading ease, vowel-group syllable proxy) —
    // the fourth text-quality lens beside length/repetition/entropy:
    // per-language 206.835 − 1.015·(W/S) − 84.6·(Y/W) computed at the
    // LANGUAGE grain from exact per-doc integer counts (words from the
    // normalized text, sentences from raw-punctuation [.!?]+ splits,
    // "syllables" = vowel groups — declared proxy, no per-word floor).
    // Every per-doc signal is row-local (shuffle-free until the one
    // keyed aggregate); the formula is one fixed IEEE tree over exact
    // sums with the classic constants as build-time literals.
    "text_readability" -> ((s, dir) => {
      val norm = util.Norm.normalize(col("text"))
      val d = Sources.documents(s, dir).select(col("lang"),
        size(filter(split(norm, " "), x => x =!= "")).cast("long").as("w"),
        size(filter(split(col("text"), "[.!?]+"), x => trim(x) =!= ""))
          .cast("long").as("sen"),
        length(regexp_replace(regexp_replace(norm, "[aeiou]+", "V"),
          "[^V]", "")).cast("long").as("y"))
      d.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("w")).as("words"), sum(col("sen")).as("sentences"),
          sum(col("y")).as("syllables"))
        // nullif-guarded divisors (the house convention): a language with
        // 0 sentences/words would yield NULL here but ±inf/NaN under
        // DuckDB's IEEE double division — guard BOTH sides identically.
        .withColumn("wps",
          col("words").cast("double") /
            nullif(col("sentences"), lit(0L)).cast("double"))
        .withColumn("spw",
          col("syllables").cast("double") /
            nullif(col("words"), lit(0L)).cast("double"))
        .withColumn("flesch",
          lit(206.835) - lit(1.015) * col("wps") - lit(84.6) * col("spw"))
        .orderBy("lang")
    }),

    // DAU/MAU STICKINESS — the engagement-depth ratio product teams
    // track: per 30-epoch-day window, monthly active users (distinct),
    // average daily actives, and stickiness = avgDAU/MAU. Integer
    // window keys (epoch-day DIV 30 — the Monday-aligned-week-key
    // discipline: never engine-specific calendar functions), exact
    // distinct counts at both grains, one IEEE division chain at the
    // end. Two keyed aggregates over the (window, day, user) distinct
    // — both map-side combinable; the 30-day rolling twin of this
    // readout is events_rolling_active's bounded explode.
    "events_stickiness" -> ((s, dir) => {
      val d1 = Sources.events(s, dir)
        .select(expr("ts DIV 86400000000000").as("day"), col("user_id"))
        .withColumn("w30", expr("day DIV 30"))
        .distinct()
      val dau = d1.groupBy("w30", "day")
        .agg(countDistinct(col("user_id")).as("dau"))
      val mau = d1.groupBy("w30")
        .agg(countDistinct(col("user_id")).as("mau"))
      dau.groupBy("w30")
        .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("sum_dau"))
        .join(mau, "w30")
        .withColumn("avg_dau",
          col("sum_dau").cast("double") / col("n_days").cast("double"))
        .withColumn("stickiness", col("avg_dau") / col("mau").cast("double"))
        .select("w30", "n_days", "mau", "sum_dau", "avg_dau", "stickiness")
        .orderBy("w30")
    }),

    // PRECISION–RECALL CURVE at decile thresholds — the threshold-sweep
    // companion to events_roc_auc's single rank number: cumulative
    // TP/FP from the DISTINCT-SCORE grain (never a per-row sort — the
    // roc_auc discipline), ntile(10) over the score grain picks ten
    // thresholds, each reporting P/R/F1 from exact cumulative counts.
    // Windows run over the score-grain table only (bounded by distinct
    // values, the value_deciles scale note); all ratios are final IEEE
    // divisions of exact BIGINTs.
    "events_pr_curve" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val grain = Sources.events(s, dir)
        .select(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("sc"),
          (col("event_type") === "purchase").cast("long").as("pos"))
        .groupBy("sc")
        .agg(sum(col("pos")).as("np"), sum(lit(1L) - col("pos")).as("nn"))
      val wd = Window.orderBy(col("sc").desc)
      val ranked = grain
        .withColumn("rn", row_number().over(wd))
        .withColumn("cum_tp", sum(col("np")).over(
          wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("cum_fp", sum(col("nn")).over(
          wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tile", ntile(10).over(wd))
        .withColumn("tot_p", sum(col("np")).over(
          wd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      val bounds = ranked.groupBy("tile")
        .agg(max(col("rn")).as("brn"))
        .select(col("tile").as("btile"), col("brn"))
      ranked.join(bounds,
          col("tile") === col("btile") && col("rn") === col("brn"))
        .select(col("tile"), col("sc").as("threshold_cents"),
          col("cum_tp"), col("cum_fp"),
          (col("cum_tp").cast("double") /
            (col("cum_tp") + col("cum_fp")).cast("double")).as("precision"),
          (col("cum_tp").cast("double") / col("tot_p").cast("double"))
            .as("recall"))
        .withColumn("f1", lit(2.0) * col("precision") * col("recall") /
          nullif(col("precision") + col("recall"), lit(0.0)))
        .orderBy("tile")
    }),

    // CUMULATIVE GAINS / LIFT chart — the campaign-targeting readout
    // ("contact the top 30% most engaged; what share of buyers do we
    // capture, and how much better than random?"): users ranked by
    // click count into deciles (user_id tiebreak — total order), per
    // decile exact user/buyer counts, cumulative gain = captured buyer
    // share, lift = gain over the random baseline. The per-user
    // aggregate is one keyed pass; every window after it runs on the
    // 10-row decile table.
    "events_lift_gain" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val users = Sources.events(s, dir)
        .groupBy("user_id")
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("clicks"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("buyer"))
      val tiled = users.withColumn("decile",
        ntile(10).over(Window.orderBy(col("clicks").desc, col("user_id"))))
      val dec = tiled.groupBy("decile")
        .agg(count(lit(1)).as("n_users"), sum(col("buyer")).as("n_buyers"))
      val wd = Window.orderBy("decile")
      dec
        .withColumn("cum_users", sum(col("n_users")).over(
          wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("cum_buyers", sum(col("n_buyers")).over(
          wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tot_users", sum(col("n_users")).over(
          wd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("tot_buyers", sum(col("n_buyers")).over(
          wd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .withColumn("gain",
          col("cum_buyers").cast("double") / col("tot_buyers").cast("double"))
        .withColumn("lift", col("gain") /
          (col("cum_users").cast("double") / col("tot_users").cast("double")))
        .select("decile", "n_users", "n_buyers", "cum_buyers", "gain", "lift")
        .orderBy("decile")
    }),

    // NEAREST as-of (either direction, bounded horizon) — completes the
    // as-of family's third member beside backward (events_asof_join)
    // and forward (events_asof_forward): for each error event, the
    // nearest click by the same user within ±1h, backward winning ties
    // (the conventional "state at the time" preference). Composed from
    // BOTH direction primitives — two per-key running-scalar windows
    // joined co-keyed on the probe — so the oracle's two native DuckDB
    // ASOF JOINs check the same composition independently.
    "events_asof_nearest" -> ((s, dir) => {
      val hUs = 3600000000L
      val ev = Sources.events(s, dir)
      val b = events.AsofJoin.lastEventBefore(ev, "error", "click")
      val f = events.AsofJoin.nextEventAfter(ev, "error", "click")
        .select(col("event_id"), col("next_match_ts_us"))
      b.join(f, "event_id")
        .withColumn("bgap", when(col("last_match_ts_us").isNotNull &&
          col("ts_us") - col("last_match_ts_us") <= hUs,
          col("ts_us") - col("last_match_ts_us")))
        .withColumn("fgap", when(col("next_match_ts_us").isNotNull &&
          col("next_match_ts_us") - col("ts_us") <= hUs,
          col("next_match_ts_us") - col("ts_us")))
        .withColumn("dir",
          when(col("bgap").isNotNull &&
            (col("fgap").isNull || col("bgap") <= col("fgap")), "back")
            .when(col("fgap").isNotNull, "fwd")
            .otherwise("none"))
        .withColumn("gap_us",
          when(col("dir") === "back", col("bgap"))
            .when(col("dir") === "fwd", col("fgap")))
        .withColumn("nearest_match_ts_us",
          when(col("dir") === "back", col("last_match_ts_us"))
            .when(col("dir") === "fwd", col("next_match_ts_us")))
        .select("event_id", "user_id", "ts_us", "nearest_match_ts_us",
          "gap_us", "dir")
        .orderBy("event_id")
    }),

    // ROLLING 7-DAY DISTINCT USERS FROM DAILY KMV SKETCHES — the
    // approximate sibling of events_rolling_active's exact bounded
    // explode and events_bitmap_rollup's exact bitmaps, for the scale
    // where per-day user bitmaps are too big: one corpus pass builds a
    // 256-hash sketch per day, every trailing window answers by the
    // plain-SQL KMV merge algebra (slice∘sort∘distinct∘flatten — the
    // KmvSpec-proven union), so the rolling question costs O(days·k)
    // however many users exist. The exact count rides beside the
    // estimate as the in-query audit with the 2× sanity band enforced;
    // the oracle re-derives the merged sketch as top-k of the full
    // distinct hash union (provably identical).
    "events_kmv_rolling" -> ((s, dir) => {
      val k = 256
      val kc = lit((k - 1).toDouble * functions.KmvUtil.HashSpan)
      def estOf(kmv: Column) =
        when(size(kmv) < k, size(kmv).cast("double"))
          .otherwise(kc / element_at(kmv, k).cast("double"))
      val ev = Sources.events(s, dir)
        .select(expr("ts DIV 86400000000000").as("day"),
          col("user_id").cast("string").as("u"))
      val maxd = ev.agg(max(col("day")).as("maxd"))
      val daily = ev.groupBy("day").agg(expr(s"kmv_agg(u, $k)").as("kmv"))
      val est = daily
        .select(explode(sequence(col("day"), col("day") + 6)).as("t"),
          col("kmv"))
        .crossJoin(broadcast(maxd)).filter(col("t") <= col("maxd"))
        .groupBy("t")
        .agg(slice(array_sort(array_distinct(flatten(collect_list(col("kmv"))))),
          1, k).as("kmv"))
      val exact = ev.distinct()
        .select(explode(sequence(col("day"), col("day") + 6)).as("t"), col("u"))
        .crossJoin(broadcast(maxd)).filter(col("t") <= col("maxd"))
        .groupBy("t").agg(countDistinct(col("u")).as("n_exact"))
      est.join(exact, "t")
        .select(col("t").as("day"), col("n_exact"),
          size(col("kmv")).cast("long").as("kmv_size"),
          estOf(col("kmv")).as("n_est"))
        .withColumn("n_est", when(assert_true(
          col("n_est") >= col("n_exact") * 0.5 &&
            col("n_est") <= col("n_exact") * 2.0,
          lit("KMV rolling estimate outside the 2x sanity band")).isNull,
          col("n_est")))
        .orderBy("day")
    }),

    // QUALITY-GATE ABLATION — which signal does the work: per gate
    // signal, how many docs violate it at all vs violate ONLY it (=
    // exactly the docs waiving that signal would rescue). The signal
    // definitions and thresholds are the SAME TextAnalysis constants
    // the gate itself runs on (interpolated into both engines — the
    // qualityGateSql lesson), so this audit can never drift from the
    // gate it audits. One shuffle-free signal pass + one conditional
    // aggregate + stack() — the corpus is scanned once.
    "docs_quality_ablation" -> ((s, dir) => {
      import text.TextAnalysis.{GateMinWords, GateMaxTopWordRatio, GateMinQuality}
      val g = qualityGate(Sources.documents(s, dir))
        .withColumn("f_short", (col("n_words") < GateMinWords).cast("long"))
        .withColumn("f_lang", (col("lang_id") === "und").cast("long"))
        .withColumn("f_rep",
          (col("top_word_ratio") > GateMaxTopWordRatio).cast("long"))
        .withColumn("f_qual",
          (col("quality_score") < GateMinQuality).cast("long"))
        .withColumn("nf",
          col("f_short") + col("f_lang") + col("f_rep") + col("f_qual"))
      g.agg(count(lit(1)).as("n_docs"),
          sum(col("keep").cast("long")).as("n_keep"),
          sum(col("f_short")).as("a1"),
          sum(when(col("f_short") === 1 && col("nf") === 1, 1L).otherwise(0L))
            .as("s1"),
          sum(col("f_lang")).as("a2"),
          sum(when(col("f_lang") === 1 && col("nf") === 1, 1L).otherwise(0L))
            .as("s2"),
          sum(col("f_rep")).as("a3"),
          sum(when(col("f_rep") === 1 && col("nf") === 1, 1L).otherwise(0L))
            .as("s3"),
          sum(col("f_qual")).as("a4"),
          sum(when(col("f_qual") === 1 && col("nf") === 1, 1L).otherwise(0L))
            .as("s4"))
        .selectExpr("n_docs", "n_keep",
          "stack(4, 'too_short', a1, s1, 'lang_unknown', a2, s2, " +
            "'repetitive', a3, s3, 'low_quality', a4, s4) " +
            "AS (signal, n_fail, n_sole_fail)")
        .select("signal", "n_fail", "n_sole_fail", "n_docs", "n_keep")
        .orderBy("signal")
    }),

    // MULTIMODAL NEAR-DUP (perceptual-hash shape) — the near-duplicate
    // tier for binary assets beside mm_dedup_exact's content addressing:
    // a 60-bit chunk-hash signature (15 payload chunks × 4 md5 bits —
    // where a real pipeline computes pHash/aHash from decoded pixels,
    // the banding/verify plumbing is identical and the chunk hash is the
    // deterministic offline stand-in), banded 4×15 bits — banding
    // guarantees a shared bucket only for pairs whose differing bits
    // miss at least one band entirely (hamming ≤ 8 spread as ≤2 bits
    // per band across all 4 bands yields zero shared buckets and is
    // missed — an accepted-recall trade, mirrored exactly by the
    // oracle), candidates verified by bit_count(xor) ≤ 8.
    // Near-copies are injected in-query (one mutated middle chunk,
    // disjoint id space — the docs_cross_source_dup discipline) since
    // the fixture has no natural near-dups. Never all-pairs: candidates
    // come only from band buckets.
    "mm_phash_near_dup" -> ((s, dir) => {
      val base = Sources.documents(s, dir)
        .select(col("doc_id").as("media_id"), col("text").as("txt"))
      val copies = base.filter(col("media_id") % 37 === 5)
        .select((col("media_id") + 1000000L).as("media_id"),
          concat(expr("substring(txt, 1, length(txt) div 2)"), lit("XX"),
            expr("substring(txt, length(txt) div 2 + 3, length(txt))"))
            .as("txt"))
      val assets = base.unionByName(copies)
      val clen = "((length(txt) + 14) div 15)"
      val phashExpr = (0 until 15).map { i =>
        s"(conv(substring(md5(cast(concat('ph:', substring(txt, $i * $clen + 1, $clen)) as binary)), 1, 1), 16, 10) * cast(${1L << (4 * i)} as bigint))"
      }.mkString("(", " + ", ")")
      val ph = util.Views.materialize(
        assets.select(col("media_id"), expr(phashExpr).cast("long").as("phash")))
      val bands = ph.select(col("media_id"), col("phash"),
          explode(expr("array(0, 1, 2, 3)")).as("b"))
        .withColumn("bv", expr("shiftright(phash, b * 15) % 32768"))
      bands.as("x").join(bands.as("y"),
          col("x.b") === col("y.b") && col("x.bv") === col("y.bv") &&
            col("x.media_id") < col("y.media_id"))
        .select(col("x.media_id").as("id_a"), col("y.media_id").as("id_b"),
          expr("bit_count(x.phash ^ y.phash)").cast("long").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 8)
        .orderBy("id_a", "id_b")
    }),

    // PER-DIMENSION EMBEDDING VARIANCE — the feature-selection audit
    // beside emb_norm_audit's per-vector hygiene: which dimensions
    // carry signal (variance) and which are near-constant (candidates
    // for pruning before an index build). One posexplode + one keyed
    // aggregate on 1e-4-quantized components (q² sums stay BIGINT at
    // 100× data); mean and variance close with two IEEE divisions;
    // variance rank over the |dims|-row aggregate only.
    "emb_dim_variance" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ex = Sources.embeddings(s, dir)
        .select(posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(col("pos").cast("long").as("dim_idx"),
          floor(col("x").cast("double") * 1e4 + 0.5).cast("long").as("q"))
      ex.groupBy("dim_idx")
        .agg(count(lit(1)).as("n"), sum(col("q")).as("s1"),
          sum(col("q") * col("q")).as("s2"))
        .withColumn("mean",
          col("s1").cast("double") / col("n").cast("double") / 1e4)
        .withColumn("variance",
          (col("n") * col("s2") - col("s1") * col("s1")).cast("double") /
            (col("n").cast("double") * col("n").cast("double")) / 1e8)
        .withColumn("var_rank", row_number().over(
          Window.orderBy(col("variance").desc, col("dim_idx"))))
        .select("dim_idx", "n", "mean", "variance", "var_rank")
        .orderBy("dim_idx")
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

    // HAPAX RATIO — vocabulary-richness profile per language: the share
    // of the vocabulary seen exactly once (hapax legomena) and its
    // token-mass share, the lexical-diversity readout beside
    // word-entropy and Zipf slope (a high hapax share predicts a long
    // vocabulary tail — tokenizer-budget planning input). Two keyed
    // aggregates on the (lang, word) grain; ratios are final IEEE
    // divisions of exact counts.
    "text_hapax_ratio" -> ((s, dir) => {
      val wc = Sources.documents(s, dir)
        .select(col("lang"),
          explode(split(util.Norm.normalize(col("text")), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy("lang", "w").agg(count(lit(1)).as("c"))
      wc.groupBy("lang")
        .agg(count(lit(1)).as("vocab"),
          sum(col("c")).as("tokens"),
          sum(when(col("c") === 1L, 1L).otherwise(0L)).as("hapax"))
        .withColumn("hapax_vocab_share",
          col("hapax").cast("double") / col("vocab").cast("double"))
        .withColumn("hapax_token_share",
          col("hapax").cast("double") / col("tokens").cast("double"))
        .orderBy("lang")
    }),

    // GLOBAL CLUSTERING COEFFICIENT — 3·triangles / open-wedge count
    // Σ C(d,2): the transitivity number completing the structural
    // readouts (triangles = count, assortativity = degree mixing, this
    // = closure probability). Reuses the degree-ordered orientation
    // (wedges enumerated over out-neighbors only — the √(2m) hub
    // guard); the denominator needs no join at all, it re-aggregates
    // the degree table. One row out.
    "graph_clustering_coeff" -> ((s, dir) => {
      val op = Sources.lineitem(s, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val edges = util.Views.materialize(
        op.as("a").join(op.as("b"),
            col("a.o") === col("b.o") && col("a.p") < col("b.p"))
          .groupBy(col("a.p").as("u"), col("b.p").as("v"))
          .agg(count(lit(1)).as("support"))
          .filter(col("support") >= 2)
          .select("u", "v"))
      val deg = edges.select(col("u").as("n"))
        .unionAll(edges.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("dg"))
      val pi = deg.select(col("n"),
        (col("dg") * lit(10000000000L) + col("n")).as("pi"))
      val oriented = util.Views.materialize(edges
        .join(pi.select(col("n").as("u"), col("pi").as("pi_u")), "u")
        .join(pi.select(col("n").as("v"), col("pi").as("pi_v")), "v")
        .select(
          when(col("pi_u") < col("pi_v"), col("u")).otherwise(col("v")).as("src"),
          when(col("pi_u") < col("pi_v"), col("v")).otherwise(col("u")).as("dst"),
          greatest(col("pi_u"), col("pi_v")).as("pi_dst")))
      val owedges = oriented.as("e1").join(oriented.as("e2"),
          col("e1.src") === col("e2.src") && col("e1.pi_dst") < col("e2.pi_dst"))
        .select(col("e1.dst").as("b"), col("e2.dst").as("c"))
      val triangles = owedges.join(oriented,
        col("b") === col("src") && col("c") === col("dst"))
      deg.agg(count(lit(1)).as("n_nodes"),
          sum(expr("dg * (dg - 1) div 2")).as("n_wedges"))
        .crossJoin(broadcast(edges.agg(count(lit(1)).as("n_edges"))))
        .crossJoin(broadcast(triangles.agg(count(lit(1)).as("n_triangles"))))
        .withColumn("global_cc", (col("n_triangles") * 3L).cast("double") /
          nullif(col("n_wedges").cast("double"), lit(0.0)))
        .select("n_nodes", "n_edges", "n_wedges", "n_triangles", "global_cc")
    }),

    // CUSTOMER VALUE-MIGRATION MATRIX — the period-over-period BI
    // readout ("which value tier did last period's top customers land
    // in"): revenue quintiles per half (midpoint-day split, 1-row
    // broadcast cut — the PSI discipline), full-outer join per
    // customer, transition matrix including the churn/new 'none'
    // states. Quintiles use ntile(5) with custkey tiebreak over the
    // POST-AGGREGATE customer grain (the customer_rfm scale note);
    // revenue is exact cents; the matrix is ≤36 rows at any scale.
    "customer_value_migration" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = Sources.orders(s, dir)
        .select(col("o_custkey"),
          datediff(col("o_orderdate"), lit("1990-01-01")).cast("long").as("day"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      val cut = o.agg(((min(col("day")) + max(col("day")) + 1L) / 2L)
        .cast("long").as("cutd"))
      val halves = o.crossJoin(broadcast(cut))
        .withColumn("half", when(col("day") < col("cutd"), "h1").otherwise("h2"))
        .groupBy("half", "o_custkey").agg(sum(col("cents")).as("rev"))
      def tier(h: String) = halves.filter(col("half") === h)
        .withColumn("q", ntile(5).over(
          Window.orderBy(col("rev").desc, col("o_custkey"))))
        .select(col("o_custkey"), concat(lit("q"), col("q")).as(s"tier_$h"))
      tier("h1").join(tier("h2"), Seq("o_custkey"), "full_outer")
        .select(coalesce(col("tier_h1"), lit("none")).as("from_tier"),
          coalesce(col("tier_h2"), lit("none")).as("to_tier"))
        .groupBy("from_tier", "to_tier")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("from_tier", "to_tier")
    }),

    // MUTUAL INFORMATION between the value band and the event type —
    // the feature-relevance number a feature-selection pass ranks
    // columns by (correlation only sees linear signal; MI sees any):
    // MI = Σ (n_xy/N)·ln(N·n_xy/(n_x·n_y)) over the banded contingency
    // table, with every ln an integer-count lnQ (1e-4) and every term
    // quantized to 1e-9 BEFORE the cross-partition sum — the PSI/
    // entropy summation-order discipline. One cell aggregate; the
    // marginals re-aggregate the tiny cell table and broadcast back.
    "events_mutual_info" -> ((s, dir) => {
      def lnQ(c: Column) = floor(log(c.cast("double")) * 1e4 + 0.5).cast("long")
      val ev = Sources.events(s, dir)
        .select(col("event_type").as("y"),
          expr("CAST(floor(value * 100 + 0.5) AS BIGINT) DIV 2500").as("x"))
      val cells = ev.groupBy("x", "y").agg(count(lit(1)).as("nxy"))
      val mx = cells.groupBy("x").agg(sum(col("nxy")).as("nx"))
      val my = cells.groupBy("y").agg(sum(col("nxy")).as("ny"))
      val tot = cells.agg(sum(col("nxy")).as("nn"),
        count(lit(1)).as("n_cells"))
      cells.join(mx, "x").join(broadcast(my), "y")
        .crossJoin(broadcast(tot))
        .withColumn("lnr_q4",
          lnQ(col("nxy")) + lnQ(col("nn")) - lnQ(col("nx")) - lnQ(col("ny")))
        .withColumn("term_q9",
          floor(col("nxy").cast("double") / col("nn").cast("double") *
            (col("lnr_q4").cast("double") / 1e4) * 1e9 + 0.5).cast("long"))
        .groupBy()
        .agg(max(col("nn")).as("n"), max(col("n_cells")).as("n_cells"),
          (sum(col("term_q9")).cast("double") / 1e9).as("mi_nats"))
    }),

    // NEGATIVE SAMPLING for recommender training data — every
    // implicit-feedback trainer needs (user, item) pairs the user did
    // NOT interact with: 6 deterministic hash-derived candidate parts
    // per customer (md5 contract — reproducible across runs and
    // engines), actual purchases removed by a co-keyed anti-join,
    // first 3 survivors kept per customer. O(|customers|·6) candidate
    // rows — never a customers×parts cross join; the part index is a
    // one-time window over the bounded catalog.
    "orders_negative_samples" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val parts = Sources.part(s, dir)
        .select(col("p_partkey"),
          row_number().over(Window.orderBy("p_partkey")).cast("long").as("pidx"))
      val np = parts.agg(count(lit(1)).as("np"))
      val custs = Sources.orders(s, dir).select("o_custkey").distinct()
      val cands = custs
        .select(col("o_custkey"), explode(expr("array(0,1,2,3,4,5)")).as("i"))
        .crossJoin(broadcast(np))
        .withColumn("pidx",
          expr("CAST(conv(substring(md5(cast(concat('neg:', o_custkey, ':', i) " +
            "as binary)), 1, 8), 16, 10) AS BIGINT) % np + 1").cast("long"))
        .join(broadcast(parts), "pidx")
      val purchased = Sources.lineitem(s, dir)
        .join(Sources.orders(s, dir),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("l_partkey").as("p_partkey")).distinct()
      cands
        .join(purchased, Seq("o_custkey", "p_partkey"), "left_anti")
        .groupBy("o_custkey", "p_partkey").agg(min(col("i")).as("i"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("o_custkey").orderBy("i")))
        .filter(col("rank") <= 3)
        .select(col("o_custkey"), col("rank").cast("long").as("rank"),
          col("p_partkey"))
        .orderBy("o_custkey", "rank")
    }),

    // TRIPLET MINING for metric learning — the training-data op behind
    // every contrastive/triplet-loss embedding run: per anchor (a
    // deterministic id sample, broadcast), the HARDEST NEGATIVE (most
    // similar vector with a different label) and the HARDEST POSITIVE
    // (least similar with the same label), margin = pos_sim − neg_sim
    // (negative margin ⇒ the triplet violates and carries gradient).
    // Argmax/argmin adjudicate on a single-BIGINT-encoded
    // (q6-sim, id) total order (the events_peak_hours discipline — no
    // cross-engine double-tie ambiguity); cosine is the engine's
    // in-order VecDot fold ⇔ DuckDB list_reduce. Corpus scanned once
    // against the broadcast anchor set; swap the exact scan for the
    // ANN candidate tier at scale (the emb_knn_classifier note).
    "emb_triplet_mining" -> ((s, dir) => {
      val emb = Sources.embeddings(s, dir)
      val anchors = broadcast(emb.filter(col("vec_id") % 29 === 0)
        .select(col("vec_id").as("a_id"),
          sim.Similarity.vec(col("embedding")).as("av"),
          col("label").as("a_label")))
      val scored = emb
        .select(col("vec_id").as("c_id"),
          sim.Similarity.vec(col("embedding")).as("cv"),
          col("label").as("c_label"))
        .crossJoin(anchors)
        .filter(col("c_id") =!= col("a_id"))
        .withColumn("simq",
          floor(sim.Similarity.cosine(col("av"), col("cv")) * 1e6 + 0.5)
            .cast("long") + 2000000L)
      scored.groupBy("a_id", "a_label")
        .agg(
          max(when(col("c_label") =!= col("a_label"),
            col("simq") * 10000000000L + (lit(9999999999L) - col("c_id"))))
            .as("nk"),
          min(when(col("c_label") === col("a_label"),
            col("simq") * 10000000000L + col("c_id"))).as("pk"))
        .filter(col("nk").isNotNull && col("pk").isNotNull)
        .select(col("a_id"), col("a_label"),
          (col("pk") % 10000000000L).as("pos_id"),
          ((expr("pk div 10000000000") - 2000000L).cast("double") / 1e6)
            .as("pos_sim"),
          (lit(9999999999L) - col("nk") % 10000000000L).as("neg_id"),
          ((expr("nk div 10000000000") - 2000000L).cast("double") / 1e6)
            .as("neg_sim"))
        .withColumn("margin", col("pos_sim") - col("neg_sim"))
        .orderBy("a_id")
    }),

    // DATA-CONTRACT VALIDATION — the expectations audit every ingest
    // runs before publishing a table: per declared constraint
    // (uniqueness, null rate, enum membership, range, parseability),
    // exact violation counts and a pass verdict, in ONE shuffle-free
    // corpus pass (a single conditional aggregate + stack — never one
    // scan per rule). Constraint thresholds are build-time literals
    // shared with the oracle.
    "data_contract_check" -> ((s, dir) => {
      val ev = Sources.events(s, dir)
      ev.agg(
          count(lit(1)).as("n"),
          (count(lit(1)) - countDistinct(col("event_id"))).as("v_unique"),
          sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("v_null_user"),
          sum(when(!col("event_type").isin(
            "click", "purchase", "signup", "view", "error"), 1L)
            .otherwise(0L)).as("v_enum"),
          sum(when(col("value") < 0.0, 1L).otherwise(0L)).as("v_negval"),
          sum(when(expr("ts DIV 86400000000000") < 19000L ||
            expr("ts DIV 86400000000000") > 20500L, 1L).otherwise(0L))
            .as("v_tsrange"),
          // NULL props is an explicit violation on BOTH sides (a bare
          // try_parse_json(NULL) IS NULL counts it here but DuckDB's
          // NOT json_valid(NULL) yields NULL → 0 — silent divergence).
          sum(when(col("props").isNull ||
            expr("try_parse_json(props)").isNull, 1L).otherwise(0L))
            .as("v_json"))
        .selectExpr("n",
          "stack(6, 'event_id_unique', v_unique, 'user_id_not_null', " +
            "v_null_user, 'event_type_in_enum', v_enum, " +
            "'value_non_negative', v_negval, 'ts_in_range', v_tsrange, " +
            "'props_valid_json', v_json) AS (constraint, n_violations)")
        .select(col("constraint"), col("n").as("n_checked"),
          col("n_violations"),
          (col("n_violations") === 0L).cast("int").as("pass"))
        .orderBy("constraint")
    }),

    // CODE-VS-PROSE DETECTION — the corpus-curation signal behind
    // "route code to the code pipeline, prose to the text pipeline"
    // (every LLM data mix needs it): symbol density ({}()[];=<>) per
    // doc, verdict adjudicated as the INTEGER comparison
    // sym·100 > chars·3 (3% threshold — a build-time constant shared
    // with the oracle, never a pre-comparison ratio). Entirely
    // row-local until the per-source rollup; the mean density closes
    // with one IEEE division of exact sums.
    "docs_code_detect" -> ((s, dir) => {
      val d = Sources.documents(s, dir)
        .select(col("source"), length(col("text")).cast("long").as("n_chars"),
          (length(col("text")) -
            length(regexp_replace(col("text"), "[{}()\\[\\];=<>]", "")))
            .cast("long").as("sym"))
        .withColumn("code_like",
          (col("sym") * 100L > col("n_chars") * 3L).cast("long"))
      d.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("code_like")).as("n_code_like"),
          sum(col("sym")).as("sym_chars"),
          sum(col("n_chars")).as("total_chars"))
        .withColumn("sym_density",
          col("sym_chars").cast("double") / col("total_chars").cast("double"))
        .orderBy("source")
    }),

    // BOILERPLATE-LINE DETECTION — the header/footer removal pass every
    // web-corpus pipeline runs (docs_chunk_dedup strips repeated SPANS
    // within a doc; this strips sentences repeated ACROSS docs): split
    // to sentence grain, document frequency per sentence, df ≥ 20 ⇒
    // boilerplate, reporting affected docs and reclaimable characters.
    // The fixture has no natural boilerplate, so two footer sentences
    // are injected in-query on doc_id%3==0 (deterministic, mirrored in
    // the oracle — the cross_source_dup discipline). Sentence-grain
    // keyed aggregate; never a doc×doc comparison.
    "docs_boilerplate_lines" -> ((s, dir) => {
      val withFooter = Sources.documents(s, dir)
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0,
            concat(col("text"), lit(". FOOTER ALPHA. ALL RIGHTS RESERVED")))
            .otherwise(col("text")).as("text"))
      val sentences = withFooter
        .select(col("doc_id"), explode(split(col("text"), "\\. ")).as("sent"))
        .select(col("doc_id"), trim(col("sent")).as("sent"))
        .filter(col("sent") =!= "")
      sentences.groupBy("sent")
        .agg(countDistinct(col("doc_id")).as("df"),
          count(lit(1)).as("n_occurrences"),
          sum(length(col("sent")).cast("long")).as("reclaim_chars"))
        .filter(col("df") >= 20)
        .orderBy("sent")
    }),

    // TIME-DECAY ATTRIBUTION — the recency-weighted sibling of
    // events_attribution_linear (same 24h-lookback co-keyed pairing,
    // different credit model): touch weight halves every 6h, kept
    // EXACT by integer weights 16 >> (gap DIV 6h) ∈ {16,8,4,2} and
    // credit = w·1e6 DIV Σw truncating division (both engines truncate
    // on positives). '(direct)' conversions keep their full unit.
    "events_attribution_timedecay" -> ((s, dir) => {
      val dayNs = 86400000000000L
      val ev = Sources.events(s, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("ts").as("tp"),
          col("event_id").as("pid"))
      val t = ev.filter(col("event_type").isin("click", "view", "signup"))
        .select(col("user_id").as("tu"), col("ts").as("tt"),
          col("event_type").as("touch"))
      val pairs = p.join(t,
        col("pu") === col("tu") && col("tt") < col("tp") &&
          col("tt") >= col("tp") - lit(dayNs), "left")
      val weighted = pairs.filter(col("touch").isNotNull)
        .withColumn("w",
          expr("shiftright(16, cast((tp - tt) div 21600000000000 as int))")
            .cast("long"))
      val perType = weighted.groupBy("pid", "touch")
        .agg(count(lit(1)).as("cnt"), sum(col("w")).as("sw"))
      val tw = perType.groupBy("pid").agg(sum(col("sw")).as("tw"))
      val credited = perType.join(tw, "pid")
        .select(col("touch"), col("cnt"),
          expr("(sw * 1000000) div tw").as("cq"))
        .groupBy("touch")
        .agg(sum(col("cnt")).as("n_touches"), sum(col("cq")).as("cq"))
      val direct = pairs.filter(col("touch").isNull)
        .groupBy(lit("(direct)").as("touch"))
        .agg(count(lit(1)).as("n_touches"),
          (count(lit(1)) * lit(1000000L)).as("cq"))
      credited.unionByName(direct)
        .select(col("touch"), col("n_touches"),
          (col("cq").cast("double") / 1e6).as("credit"))
        .orderBy("touch")
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

    // ENTITY-EXTRACTION PROFILE — the regexp_extract_all surface as a
    // curation signal: per source, how many number tokens, capitalized
    // words, URL-like and email-like spans the raw text carries (the
    // inputs to PII budgeting and structured-content routing). All
    // counts are row-local exact integers; one keyed rollup.
    "text_entity_extract" -> ((s, dir) => {
      val d = Sources.documents(s, dir).select(col("source"),
        size(expr("regexp_extract_all(text, '[0-9]+', 0)")).cast("long")
          .as("n_numbers"),
        size(expr("regexp_extract_all(text, '[A-Z][a-z]+', 0)")).cast("long")
          .as("n_capitalized"),
        size(expr("regexp_extract_all(text, 'https?://[^ ]+', 0)")).cast("long")
          .as("n_urls"),
        size(expr(
          "regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+', 0)"))
          .cast("long").as("n_emails"))
      d.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_numbers")).as("n_numbers"),
          sum(col("n_capitalized")).as("n_capitalized"),
          sum(col("n_urls")).as("n_urls"),
          sum(col("n_emails")).as("n_emails"))
        .orderBy("source")
    }),

    // DEGREE DISTRIBUTION of the co-purchase graph — the first plot any
    // graph analysis draws (is this power-law?): power-of-two degree
    // buckets via the binary-rendering length (the docs_length_histogram
    // discipline — no float log2 boundary), node/edge-mass per bucket.
    // Degree table re-aggregate only; no join.
    "graph_degree_histogram" -> ((s, dir) => {
      val op = Sources.lineitem(s, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val edges = op.as("a").join(op.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("u"), col("b.p").as("v"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
        .select("u", "v")
      val deg = edges.select(col("u").as("n"))
        .unionAll(edges.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("dg"))
      deg.withColumn("bucket", length(bin(col("dg"))) - 1)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_nodes"), sum(col("dg")).as("degree_mass"),
          min(col("dg")).as("min_degree"), max(col("dg")).as("max_degree"))
        .withColumn("bucket_lo", expr("shiftleft(CAST(1 AS BIGINT), bucket)"))
        .select(col("bucket").cast("long").as("bucket"), col("bucket_lo"),
          col("n_nodes"), col("degree_mass"), col("min_degree"),
          col("max_degree"))
        .orderBy("bucket")
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

    // EMBEDDING CENTROID DRIFT — the model-monitoring readout for a
    // vector store ("did this class's embedding distribution move
    // between snapshots"): per label, the cosine between the two
    // halves' INTEGER-EXACT centroids (sign-split floor division of q8
    // component sums — the emb_silhouette discipline; Spark div
    // truncates, DuckDB // floors, so magnitudes divide and signs
    // reapply). Dim-grain moment products stay in BIGINT (64 dims ×
    // (2e8)² per term); cosine closes with one sqrt·sqrt division.
    "emb_centroid_drift" -> ((s, dir) => {
      val ex = Sources.embeddings(s, dir)
        .select(col("label"), (col("vec_id") % 2).as("half"),
          posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("label"), col("half"), col("dim"),
          floor(col("x").cast("double") * 1e8 + 0.5).cast("long").as("q"))
      val cent = ex.groupBy("label", "half", "dim")
        .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
        .withColumn("cq",
          expr("CASE WHEN sq >= 0 THEN sq div n ELSE -((-sq) div n) END"))
      val c1 = cent.filter(col("half") === 0)
        .select(col("label"), col("dim"), col("cq").as("c1"), col("n").as("n1"))
      val c2 = cent.filter(col("half") === 1)
        .select(col("label"), col("dim"), col("cq").as("c2"), col("n").as("n2"))
      c1.join(c2, Seq("label", "dim"))
        .groupBy("label")
        .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
          sum(col("c1") * col("c2")).as("sxy"),
          sum(col("c1") * col("c1")).as("sxx"),
          sum(col("c2") * col("c2")).as("syy"))
        .withColumn("cos_drift", col("sxy").cast("double") /
          (sqrt(col("sxx").cast("double")) * sqrt(col("syy").cast("double"))))
        .select("label", "n1", "n2", "cos_drift")
        .orderBy("label")
    }),

    // CALENDAR HEATMAP — the month × day-of-week revenue matrix (the
    // 2D seasonal profile BI dashboards open with): calendar month from
    // the date (identical extraction both engines), day-of-week as
    // epoch-day % 7 (NEVER engine-specific dayofweek numbering — the
    // yf_seasonality rule), exact-decimal revenue per cell. ≤84 rows
    // at any scale; one map-side-combinable aggregate.
    "orders_calendar_heatmap" -> ((s, dir) => {
      val o = Sources.orders(s, dir)
        .select(month(col("o_orderdate")).cast("long").as("mth"),
          expr("datediff(o_orderdate, DATE '1970-01-01') % 7").cast("long")
            .as("dow"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      o.groupBy("mth", "dow")
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("cents"))
        .withColumn("revenue", col("cents").cast("double") / 100.0)
        .withColumn("avg_order",
          col("cents").cast("double") / col("n_orders").cast("double") / 100.0)
        .select("mth", "dow", "n_orders", "revenue", "avg_order")
        .orderBy("mth", "dow")
    }),

    // OUT-OF-DISTRIBUTION FLAGS — the embedding-hygiene gate before
    // vectors enter an index ("is this embedding even from the right
    // distribution"): per-label squared distance to the INTEGER-EXACT
    // label centroid (q6 components keep Σdiff² in BIGINT across 64
    // dims), p99 cut by the exact-rank rule (⌈0.99n⌉-th order statistic
    // — the winsorize integer adjudication, zero interpolation), flags
    // = rows strictly beyond it. Centroids broadcast back; the rank
    // window partitions by label.
    "emb_ood_flags" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ex = Sources.embeddings(s, dir)
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("vec_id"), col("label"), col("dim"),
          floor(col("x").cast("double") * 1e6 + 0.5).cast("long").as("q"))
      val cent = ex.groupBy("label", "dim")
        .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
        .withColumn("cq",
          expr("CASE WHEN sq >= 0 THEN sq div n ELSE -((-sq) div n) END"))
        .select("label", "dim", "cq")
      val dist = ex.join(broadcast(cent), Seq("label", "dim"))
        .groupBy("label", "vec_id")
        .agg(sum((col("q") - col("cq")) * (col("q") - col("cq"))).as("dist2"))
      val ranked = dist
        .withColumn("rn", row_number().over(
          Window.partitionBy("label").orderBy("dist2", "vec_id")))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("label")))
      val cuts = ranked
        .filter(col("rn") === expr("(n * 99 + 99) div 100"))
        .select(col("label"), col("dist2").as("p99_dist2"))
      dist.join(broadcast(cuts), "label")
        .groupBy("label")
        .agg(count(lit(1)).as("n"), max(col("p99_dist2")).as("p99_dist2"),
          sum(when(col("dist2") > col("p99_dist2"), 1L).otherwise(0L))
            .as("n_flagged"),
          max(col("dist2")).as("max_dist2"))
        .orderBy("label")
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

    // FRESHNESS AUDIT — the data-ops staleness readout every pipeline
    // dashboard carries ("when did each stream last deliver"): per
    // event type, last-seen day, staleness vs the corpus as-of (the
    // max day — derived in-plan, deterministic; never wall-clock),
    // trailing-7-day volume, and a stale verdict. One keyed aggregate
    // + a 1-row broadcast.
    "events_freshness_audit" -> ((s, dir) => {
      val ev = Sources.events(s, dir)
        .select(col("event_type"), expr("ts DIV 86400000000000").as("day"))
      val asOf = ev.agg(max(col("day")).as("as_of_day"))
      ev.crossJoin(broadcast(asOf))
        .groupBy("event_type")
        .agg(max(col("as_of_day")).as("as_of_day"),
          max(col("day")).as("last_day"),
          count(lit(1)).as("n_events"),
          sum(when(col("day") > col("as_of_day") - 7L, 1L).otherwise(0L))
            .as("n_last_7d"))
        .withColumn("staleness_days", col("as_of_day") - col("last_day"))
        .withColumn("stale", (col("staleness_days") > 1L).cast("int"))
        .select("event_type", "as_of_day", "last_day", "staleness_days",
          "n_events", "n_last_7d", "stale")
        .orderBy("event_type")
    }),

    // REORDER-INTERVAL MEDIAN — the purchase-cycle readout ("how often
    // does this segment come back") replenishment planning runs on:
    // per-customer consecutive-order gaps in exact integer days, the
    // per-segment median on the DOUBLED order statistic (odd → 2·mid,
    // even → mid₁+mid₂ — the Mann–Whitney/Theil–Sen integral-median
    // discipline). Per-customer lag windows + one segment-partitioned
    // rank window; the dim join is broadcast.
    "orders_reorder_interval" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = Sources.orders(s, dir)
        .select(col("o_custkey"),
          datediff(col("o_orderdate"), lit("1990-01-01")).cast("long").as("day"))
      val gaps = o
        .withColumn("prev", lag(col("day"), 1).over(
          Window.partitionBy("o_custkey").orderBy("day", "o_custkey")))
        .filter(col("prev").isNotNull)
        .withColumn("gap", col("day") - col("prev"))
        .join(broadcast(Sources.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
      val nn = gaps.groupBy("c_mktsegment").agg(count(lit(1)).as("n_gaps"))
      val ranked = gaps
        .withColumn("rn", row_number().over(
          Window.partitionBy("c_mktsegment")
            .orderBy("gap", "o_custkey", "day")))
      ranked.join(nn, "c_mktsegment")
        .groupBy("c_mktsegment")
        .agg(max(col("n_gaps")).as("n_gaps"),
          (sum(when(col("rn") === expr("(n_gaps + 1) div 2"), col("gap"))
            .otherwise(0L)) +
           sum(when(col("rn") === expr("(n_gaps + 2) div 2"), col("gap"))
            .otherwise(0L))).as("med2_days"))
        .withColumn("median_days", col("med2_days").cast("double") / 2.0)
        .select("c_mktsegment", "n_gaps", "med2_days", "median_days")
        .orderBy("c_mktsegment")
    }),

    // TYPE-TOKEN RATIO CURVE — vocabulary growth at increasing corpus
    // budgets (the Heaps'-law companion to text_zipf_slope and
    // text_hapax_ratio; the tokenizer-sizing question "how fast does
    // the vocabulary still grow"): doc-granular prefixes by doc_id
    // order (the prefix cut runs on the DOC-grain cumulative-token
    // table — bounded by document count, never a token-grain global
    // window), distinct types counted per budget via one words⋈kept
    // join. Four budgets in one pass.
    "text_ttr_curve" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val norm = util.Norm.normalize(col("text"))
      val docs = Sources.documents(s, dir)
        .select(col("doc_id"),
          size(filter(split(norm, " "), x => x =!= "")).cast("long").as("ntok"))
      val cum = docs.withColumn("cum",
        sum(col("ntok")).over(Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val kept = cum
        .select(col("doc_id"), col("ntok"), col("cum"),
          explode(expr("array(1000, 4000, 16000, 64000)")).as("budget"))
        .filter(col("cum") <= col("budget"))
      val stats = kept.groupBy("budget")
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"))
      val words = Sources.documents(s, dir)
        .select(col("doc_id"), explode(split(norm, " ")).as("w"))
        .filter(col("w") =!= "")
      val types = words.join(kept.select("budget", "doc_id"), "doc_id")
        .groupBy("budget").agg(countDistinct(col("w")).as("n_types"))
      stats.join(types, "budget")
        .withColumn("ttr",
          col("n_types").cast("double") / col("n_tokens").cast("double"))
        .select(col("budget").cast("long").as("budget"), col("n_docs"),
          col("n_tokens"), col("n_types"), col("ttr"))
        .orderBy("budget")
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

    // LABEL GEOMETRY MATRIX — the class-separation readout before
    // training on labeled embeddings ("which classes are entangled"):
    // pairwise cosine between INTEGER-EXACT label centroids (q6
    // sign-split floor division — the ood/silhouette discipline),
    // C(labels,2) rows from dim-grain BIGINT moments. Centroid table
    // is O(labels·dims); the pair join never touches raw vectors.
    "emb_label_geometry" -> ((s, dir) => {
      val ex = Sources.embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("label"), col("dim"),
          floor(col("x").cast("double") * 1e6 + 0.5).cast("long").as("q"))
      val cent = ex.groupBy("label", "dim")
        .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
        .withColumn("cq",
          expr("CASE WHEN sq >= 0 THEN sq div n ELSE -((-sq) div n) END"))
        .select(col("label"), col("dim"), col("cq"), col("n"))
      cent.as("a").join(cent.as("b"),
          col("a.label") < col("b.label") && col("a.dim") === col("b.dim"))
        .groupBy(col("a.label").as("label_a"), col("b.label").as("label_b"))
        .agg(max(col("a.n")).as("n_a"), max(col("b.n")).as("n_b"),
          sum(col("a.cq") * col("b.cq")).as("sxy"),
          sum(col("a.cq") * col("a.cq")).as("sxx"),
          sum(col("b.cq") * col("b.cq")).as("syy"))
        .withColumn("cos_centroid", col("sxy").cast("double") /
          (sqrt(col("sxx").cast("double")) * sqrt(col("syy").cast("double"))))
        .select("label_a", "label_b", "n_a", "n_b", "cos_centroid")
        .orderBy("label_a", "label_b")
    }),

    // CSV WIRE round-trip — the QUOTING half of the interchange matrix
    // (JSONL covers nesting, this covers delimiter collisions): events
    // written as header-CSV INCLUDING the props JSON column — whose
    // embedded commas, quotes and braces force the writer through
    // quoted-field + escape handling — then read back with an explicit
    // schema (schema-on-read, no inference pass) and aggregated with a
    // 40-bit-md5 content checksum over props. The oracle computes the
    // same checksum straight from parquet, so a hash match proves the
    // quote/escape round-trip preserved every byte of every field.
    "events_csv_roundtrip" -> ((s, dir) => {
      val out = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), "graft_events_csv")
      Sources.events(s, dir)
        .select(col("event_id"), col("ts").cast("long").as("ts"),
          col("user_id"), col("event_type"),
          floor(col("value") * 1e8 + 0.5).cast("long").as("value_q8"),
          col("props"))
        .coalesce(8)
        .write.mode("overwrite").option("header", "true").csv(out.toString)
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("ts", LongType),
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("value_q8", LongType), StructField("props", StringType)))
      // multiLine + explicit escape/quote: a props JSON value with an
      // embedded newline is written quoted — without multiLine the read
      // would split that record mid-field and silently corrupt rows.
      s.read.schema(schema).option("header", "true")
        .option("multiLine", "true")
        .option("quote", "\"").option("escape", "\\")
        .csv(out.toString)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value_q8")).as("sum_value_q8"),
          sum(col("user_id")).as("user_id_sum"),
          min(expr("ts DIV 1000")).as("min_ts_us"),
          max(expr("ts DIV 1000")).as("max_ts_us"),
          sum(expr("CAST(conv(substring(md5(cast(props as binary)), 1, 10), " +
            "16, 10) AS BIGINT)")).as("props_sum40"))
        .orderBy("event_type")
    }),
  )

  /** Poisson(1) CDF P(K ≤ k) scaled to 2^32 and floored — the bootstrap
    * replica weights' inverse-CDF thresholds. BUILD-TIME constants
    * interpolated into BOTH the Spark plan and the DuckDB oracle (the
    * Benford discipline: one definition, two engines, zero drift). */
  private[graft] def poissonCdfU32(k: Int): Long = {
    var fact = 1.0; var cdf = 0.0
    for (j <- 0 to k) { if (j > 0) fact *= j; cdf += 1.0 / fact }
    math.floor(cdf * math.exp(-1.0) * 4294967296.0).toLong
  }

  /** z₀.₉₇₅ + z₀.₈₀ (standard normal quantiles, two-sided α=.05 and
    * power .80) — the textbook sample-size constants, build-time so both
    * engines see the identical double. */
  private[graft] val PowerZSum: Double = 1.959963984540054 + 0.8416212335729143

  /** DROP TABLE IF EXISTS + remove any orphaned warehouse location (a
    * managed table's files survive the in-memory catalog across JVMs). */
  /** The composite quality gate over any (doc_id, text) frame — shared
    * by `docs_quality_gate` (standalone, over raw documents) and
    * `docs_pipeline_e2e` (over the augmented corpus). ENTIRELY
    * shuffle-free: every signal including the repetition ratio is
    * row-local (`TextAnalysis.topWordRatio`'s sorted-run fold — proven
    * equal to the explode→aggregate form, which the DuckDB oracle still
    * uses as the independent computation). Same projection the streaming
    * ingest gate runs. */
  private def qualityGate(docs: DataFrame): DataFrame = {
    import text.TextAnalysis.{GateMinWords, GateMaxTopWordRatio, GateMinQuality}
    text.TextAnalysis.withGateSignals(docs.select("doc_id", "text"), "text")
      .withColumn("top_word_ratio", text.TextAnalysis.topWordRatio(col("text")))
      .select(
        col("doc_id"), col("lang_id"), col("n_words"),
        col("top_word_ratio"), col("quality_score"),
        text.TextAnalysis.gateKeep(col("n_words"), col("lang_id"),
          col("top_word_ratio"), col("quality_score")).cast("int").as("keep"),
        when(col("n_words") < GateMinWords, "too_short")
          .when(col("lang_id") === "und", "lang_unknown")
          .when(col("top_word_ratio") > GateMaxTopWordRatio, "repetitive")
          .when(col("quality_score") < GateMinQuality, "low_quality")
          .as("fail_reason"))
  }

  /** SQL twin of [[qualityGate]]: CTEs ending in `gate` (all gate output
    * columns) over `docsRel(doc_id, text)`. The thresholds are
    * INTERPOLATED from the TextAnalysis constants — one definition for
    * both engines, so a constant change can never silently diverge the
    * oracle from the engine. */
  private def qualityGateSql(docsRel: String): String = {
    import text.TextAnalysis.{GateMinWords, GateMaxTopWordRatio, GateMinQuality}
    s"""gsig AS (${text.TextAnalysis.gateSignalsSql(docsRel, "doc_id", "text")}),
       |gw AS (
       |  SELECT doc_id, unnest(string_split(${util.Norm.normalizeSql("text")}, ' ')) AS word
       |  FROM $docsRel),
       |gpw AS (SELECT doc_id, word, count(*) AS n FROM gw WHERE word <> '' GROUP BY 1, 2),
       |grep AS (SELECT doc_id, max(n) / CAST(sum(n) AS BIGINT) AS top_word_ratio
       |         FROM gpw GROUP BY 1),
       |gate AS (
       |  SELECT s.doc_id, lang_id, n_words,
       |    coalesce(top_word_ratio, 0.0) AS top_word_ratio, quality_score,
       |    CAST((n_words >= $GateMinWords AND lang_id <> 'und'
       |          AND coalesce(top_word_ratio, 0.0) <= $GateMaxTopWordRatio
       |          AND quality_score >= $GateMinQuality) AS INTEGER) AS keep,
       |    (CASE WHEN n_words < $GateMinWords THEN 'too_short'
       |          WHEN lang_id = 'und' THEN 'lang_unknown'
       |          WHEN coalesce(top_word_ratio, 0.0) > $GateMaxTopWordRatio THEN 'repetitive'
       |          WHEN quality_score < $GateMinQuality THEN 'low_quality' END) AS fail_reason
       |  FROM gsig s LEFT JOIN grep USING (doc_id))""".stripMargin
  }

  /** Source-analysis constants, interpolated into BOTH engines' SQL so
    * the gate rules have exactly one definition (the qualityGateSql
    * lesson: a literal duplicated into the oracle silently diverges). */
  private val SourceDupBlockX = 20L   // blocked if n_dup_docs * X > n_docs
  private val SourceShortBlockX = 8L  // blocked if n_short * X > n_docs
  private val SourceCapTokens = 800L  // per-source token budget
  private val SourceMaxSyndication = 10L // content in > this many sources = boilerplate

  /** The source-analysis fixture view: raw documents plus injected exact
    * copies (the raw fixture has zero duplicate and zero multi-source
    * texts). Cross-source copies (doc_id % 9) model wire-service
    * syndication — the copy lands in a deterministically rotated source;
    * within-source copies (doc_id % 13) model re-posts. Injected ids live
    * in disjoint spaces, guarded per-row like Dedup.augmented. */
  private def sourcedDocs(docs: DataFrame): DataFrame = {
    val guardedId = when(
      assert_true(col("doc_id") >= 0 && col("doc_id") < 8000000L,
        lit("doc_id must be in [0, 8000000) for disjoint source-dup injection")).isNull,
      col("doc_id"))
    val base = docs.select(guardedId.as("doc_id"), col("text"), col("lang"), col("source"))
    base
      .unionByName(base.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 8000000L).as("doc_id"), col("text"), col("lang"),
          concat(lit("src"), ((col("doc_id") + 3) % 20).cast("string")).as("source")))
      .unionByName(base.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 9000000L).as("doc_id"), col("text"), col("lang"),
          col("source")))
  }

  private val sourcedDocsSql: String =
    """(SELECT doc_id, text, lang, source FROM documents
      | UNION ALL
      | SELECT doc_id + 8000000, text, lang,
      |        'src' || CAST((doc_id + 3) % 20 AS VARCHAR)
      | FROM documents WHERE doc_id % 9 = 0
      | UNION ALL
      | SELECT doc_id + 9000000, text, lang, source
      | FROM documents WHERE doc_id % 13 = 0)""".stripMargin

  /** Token-budget shard assignment shared by `docs_pack_shards` /
    * `docs_pack_assemble`: deterministic hash bucket = independent
    * parallel packer, shard = the token-budget window the doc's start
    * offset (running sum BEFORE the doc) falls in. Keeps doc_id, text,
    * n_tokens, bucket, rk, cum, shard_idx. */
  private def packShards(docs: DataFrame): DataFrame = {
    val buckets = 32
    val budget = 2000L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy("rk", "doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs.select(col("doc_id"), col("text"),
        size(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+"))
          .cast("long").as("n_tokens"))
      .withColumn("bucket", pmod(col("doc_id"), lit(buckets)))
      .withColumn("rk", md5(col("doc_id").cast("string").cast("binary")))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("shard_idx",
        floor((col("cum") - col("n_tokens")) / budget).cast("long"))
  }

  private def dropManagedTable(s: SparkSession, name: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $name")
    val path = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), name)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
  }

  // ---------------------------------------------------------------- oracle

  /** DuckDB view of the OHLCV bars (mirrors [[Sources.ohlcv]]). */
  private val barsCte: String =
    """bars AS (
      |  SELECT l_shipdate AS "Date", l_quantity AS "Open",
      |         l_extendedprice AS "High", l_discount AS "Low",
      |         l_tax AS "Close", CAST(l_orderkey AS DOUBLE) AS "Volume",
      |         l_discount * l_tax AS "Dividends",
      |         l_quantity % 2.0 AS "Stock Splits",
      |         l_suppkey AS symbol
      |  FROM lineitem)""".stripMargin

  /** Replaces stddev_* doubles with their 7-sig-digit string form so the
    * hash compare is stable (see [[util.Stable.sig]]); all other columns
    * pass through untouched. */
  private def stabilized(df: DataFrame): DataFrame =
    df.select(df.columns.map { c =>
      if (c.startsWith("stddev_") || c.startsWith("std_"))
        util.Stable.sig(col(c)).as(c)
      else col(c)
    }: _*)

  /** The 36-aggregate list, generated from the same column list the Spark
    * side uses so names can never drift. */
  private def aggSelectList: String =
    yf.Ohlcv.barColumns.map { case (src, out) =>
      val x = s""""$src""""
      s"""${util.Stable.exactAvgSql(x)} AS avg_$out, ${util.Stable.exactSumSql(x)} AS sum_$out,
         |    max($x) AS max_$out, min($x) AS min_$out,
         |    ${util.Stable.sigSql(s"stddev_samp($x)")} AS stddev_$out""".stripMargin
    }.mkString(",\n    ") + ",\n    count(*) AS row_count"

  /** Stat-major `std_*` select list matching the reference's exact output
    * schema ([[yf.Ohlcv.aggregatePeriodRef]]). */
  private def aggSelectListRef: String = {
    val blocks: Seq[(String, String => String)] = Seq(
      "avg" -> (x => util.Stable.exactAvgSql(x)),
      "sum" -> (x => util.Stable.exactSumSql(x)),
      "max" -> (x => s"max($x)"),
      "min" -> (x => s"min($x)"),
      "std" -> (x => util.Stable.sigSql(s"stddev_samp($x)")))
    blocks.flatMap { case (st, f) =>
      yf.Ohlcv.barColumns.map { case (src, out) => s"""${f(s""""$src"""")} AS ${st}_$out""" }
    }.mkString(",\n    ") + ",\n    count(*) AS row_count"
  }

  /** Shared by `dedup_incremental_lsh` (in-query index) and
    * `dedup_incremental_lsh_stored` (parquet round-trip) — both engines
    * and both paths must produce the identical survivor set. */
  /** Shared by `top_orders_per_customer` (explicit operator call) and
    * `top_orders_per_customer_auto` (window form, rewritten by
    * [[graft.plans.WindowTopKRewrite]]) — both must hash-match it. */
  private lazy val topOrdersPerCustomerOracle: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |QUALIFY row_number() OVER (
      |  PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) <= 3
      |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin

  /** Shared by `sim_ann_ivf_trained` and `sim_ann_ivf_stored` — the
    * stored path must be indistinguishable from the in-query one. */
  private lazy val ivfTrainedOracle: String =
    s"""WITH vecs AS ${sim.Similarity.vecsSql},
       |${sim.Similarity.trainedCentsSql("vecs")},
       |${sim.Similarity.ivfProbeSql("(SELECT * FROM vecs WHERE id < 5)", "vecs", 10)}
       |SELECT query_id, vec_id, sim, rank FROM topk
       |ORDER BY query_id, rank""".stripMargin

  private lazy val incrementalLshOracle: String = {
    import dedup.Dedup.{NumBands, shinglesSql, minhashSignatureSql, bandKeysSql}
    s"""WITH docs AS ${dedup.Dedup.augmentedSql},
       |batch AS (SELECT doc_id, text FROM docs WHERE doc_id % 10 = 0),
       |exist AS (SELECT doc_id, text FROM docs WHERE doc_id % 10 <> 0),
       |shb AS (SELECT doc_id AS id, unnest(${shinglesSql("text")}) AS sh FROM batch),
       |she AS (SELECT doc_id AS id, unnest(${shinglesSql("text")}) AS sh FROM exist),
       |sigb AS (
       |  SELECT doc_id AS id, ${minhashSignatureSql("sh")} AS sig
       |  FROM (SELECT doc_id, ${shinglesSql("text")} AS sh FROM batch)
       |  WHERE len(sh) > 0),
       |sige AS (
       |  SELECT doc_id AS id, ${minhashSignatureSql("sh")} AS sig
       |  FROM (SELECT doc_id, ${shinglesSql("text")} AS sh FROM exist)
       |  WHERE len(sh) > 0),
       |bb AS (SELECT id, i AS band_idx, (${bandKeysSql("sig")})[i] AS band_key
       |       FROM sigb, range(1, ${NumBands + 1}) t(i)),
       |be AS (SELECT id, i AS band_idx, (${bandKeysSql("sig")})[i] AS band_key
       |       FROM sige, range(1, ${NumBands + 1}) t(i)),
       |cand AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM bb a JOIN be b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |  UNION
       |  SELECT DISTINCT a.id, b.id
       |  FROM bb a JOIN bb b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |    AND b.id < a.id),
       |shall AS (SELECT * FROM shb UNION ALL SELECT * FROM she),
       |na AS (SELECT id AS id_a, count(*) AS n_a FROM shb GROUP BY 1),
       |nb AS (SELECT id AS id_b, count(*) AS n_b FROM shall GROUP BY 1),
       |common AS (
       |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
       |  FROM shb a JOIN shall b ON a.sh = b.sh
       |  JOIN cand c ON c.id_a = a.id AND c.id_b = b.id
       |  GROUP BY 1, 2),
       |rejected AS (
       |  SELECT DISTINCT id_a FROM common JOIN na USING (id_a) JOIN nb USING (id_b)
       |  WHERE n_common / (n_a + n_b - n_common) >= 0.6)
       |SELECT doc_id FROM batch
       |WHERE doc_id NOT IN (SELECT id_a FROM rejected)
       |ORDER BY doc_id""".stripMargin
  }

  private def yfAggOracle(fmt: String, label: String, bySymbol: Boolean = false): String = {
    val groupCols = if (bySymbol) "symbol, period_key" else "period_key"
    val part = if (bySymbol) "PARTITION BY symbol " else ""
    s"""WITH $barsCte,
       |agg AS (
       |  SELECT ${if (bySymbol) "symbol, " else ""}strftime("Date", '$fmt') AS period_key,
       |    $aggSelectList
       |  FROM bars GROUP BY $groupCols)
       |SELECT *,
       |  CAST(row_number() OVER (${part}ORDER BY period_key) AS INTEGER) AS ${label}_number,
       |  '$label' AS agg_type
       |FROM agg ORDER BY $groupCols""".stripMargin
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * RULE: every integer aggregate output (sum/count arithmetic) must be
    * `CAST(... AS BIGINT)`. DuckDB's `sum(BIGINT)` returns HUGEINT
    * (INT128), which the driver's canonicalizer renders differently from
    * Spark's BIGINT even when the values are equal — `rows_match` and
    * `schema_match` pass but `hash_match` fails (exactly how `docs_split`
    * broke in round 4). `tools/verify_local.py` audits oracle result
    * types and fails on any HUGEINT column so the rule is mechanical. */
  def oracleSql: Map[String, String] = Map(
    "yf_month_agg" -> yfAggOracle("%Y-%m", "month"),
    "yf_month_agg_ref" ->
      s"""WITH $barsCte,
         |agg AS (
         |  SELECT strftime("Date", '%Y-%m') AS period_key,
         |    $aggSelectListRef
         |  FROM bars GROUP BY period_key)
         |SELECT *,
         |  CAST(row_number() OVER (ORDER BY period_key) AS INTEGER) AS month_number,
         |  'month' AS agg_type
         |FROM agg ORDER BY period_key""".stripMargin,
    "yf_csv_catalog_join" ->
      s"""WITH $barsCte,
         |cat AS (SELECT CAST(Kode AS INTEGER) AS Kode, "Nama Perusahaan"
         |        FROM read_csv('${Sources.CatalogCsvPath}', header=true))
         |SELECT b.symbol, c."Nama Perusahaan" AS company_name, count(*) AS n_bars,
         |  ${util.Stable.exactSumSql(""""Volume"""")} AS sum_volume, max(b."High") AS max_high
         |FROM bars b JOIN cat c ON b.symbol = c.Kode
         |GROUP BY b.symbol, c."Nama Perusahaan" ORDER BY b.symbol""".stripMargin,
    "yf_dsv2_catalog_join" ->
      s"""WITH $barsCte,
         |cat AS (SELECT CAST(Kode AS INTEGER) AS Kode, "Nama Perusahaan"
         |        FROM read_csv('${Sources.CatalogCsvPath}', header=true)
         |        WHERE CAST(Kode AS INTEGER) < 500)
         |SELECT b.symbol, c."Nama Perusahaan" AS company_name, count(*) AS n_bars,
         |  ${util.Stable.exactSumSql(""""Volume"""")} AS sum_volume, max(b."High") AS max_high
         |FROM bars b JOIN cat c ON b.symbol = c.Kode
         |GROUP BY b.symbol, c."Nama Perusahaan" ORDER BY b.symbol""".stripMargin,
    "yf_dsv2_agg_pushdown" ->
      s"""SELECT count(*) AS n_rows,
         |  min(CAST(Kode AS INTEGER)) AS min_kode,
         |  max(CAST(Kode AS INTEGER)) AS max_kode
         |FROM read_csv('${Sources.CatalogCsvPath}', header=true)
         |WHERE CAST(Kode AS INTEGER) < 500""".stripMargin,
    "yf_spj_catalog_join" ->
      s"""WITH cat AS (
         |  SELECT CAST(Kode AS INTEGER) AS Kode, "Nama Perusahaan" AS name1
         |  FROM read_csv('${Sources.CatalogCsvPath}', header=true))
         |SELECT count(*) AS n_pairs,
         |  CAST(sum(a.Kode) AS BIGINT) AS kode_sum,
         |  CAST(min(length(a.name1)) AS INTEGER) AS min_name_len,
         |  CAST(max(length(a.name1)) AS INTEGER) AS max_name_len
         |FROM cat a JOIN cat b ON a.Kode = b.Kode""".stripMargin,
    "yf_dsv2_grouped_agg" ->
      s"""WITH per_code AS (
         |  SELECT CAST(Kode AS INTEGER) AS Kode, count(*) AS n,
         |    max(CAST(Kode AS INTEGER)) AS mx
         |  FROM read_csv('${Sources.CatalogCsvPath}', header=true)
         |  WHERE CAST(Kode AS INTEGER) < 400 GROUP BY 1)
         |SELECT Kode % 100 AS bucket, count(*) AS n_codes,
         |  CAST(sum(n) AS BIGINT) AS n_rows, max(mx) AS max_kode
         |FROM per_code GROUP BY 1 ORDER BY 1""".stripMargin,
    "yf_dsv2_sink_roundtrip" ->
      s"""SELECT count(*) AS n_rows,
         |  min(CAST(Kode AS INTEGER)) AS min_kode,
         |  max(CAST(Kode AS INTEGER)) AS max_kode,
         |  CAST(sum(CAST(Kode AS INTEGER)) AS BIGINT) AS kode_sum
         |FROM read_csv('${Sources.CatalogCsvPath}', header=true)
         |WHERE CAST(Kode AS INTEGER) < 300""".stripMargin,
    "bucketed_join" ->
      s"""SELECT o_custkey, count(*) AS n_items,
         |  ${util.Stable.exactSumSql("l_extendedprice")} AS sum_price
         |FROM (SELECT * FROM lineitem
         |      WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01') l
         |JOIN (SELECT * FROM orders WHERE year(o_orderdate) = 1995) o
         |  ON l.l_orderkey = o.o_orderkey
         |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "yf_multi_sink" ->
      s"""WITH $barsCte,
         |b AS (SELECT * FROM bars WHERE symbol < 100)
         |SELECT 'day' AS agg_type, count(*) AS n_rows,
         |  count(DISTINCT strftime("Date", '%Y-%m-%d')) AS n_periods FROM b
         |UNION ALL SELECT 'month', count(DISTINCT strftime("Date", '%Y-%m')),
         |  count(DISTINCT strftime("Date", '%Y-%m')) FROM b
         |UNION ALL SELECT 'year', count(DISTINCT strftime("Date", '%Y')),
         |  count(DISTINCT strftime("Date", '%Y')) FROM b
         |ORDER BY agg_type""".stripMargin,
    "yf_sink_pruned" ->
      s"""WITH $barsCte,
         |b AS (SELECT * FROM bars WHERE symbol < 100),
         |m AS (SELECT strftime("Date", '%Y-%m') AS period_key,
         |        count(*) AS row_count FROM b GROUP BY 1)
         |SELECT count(*) AS n_rows, count(DISTINCT period_key) AS n_periods,
         |  CAST(sum(row_count) AS BIGINT) AS sum_bars
         |FROM m""".stripMargin,
    "yf_year_agg" -> yfAggOracle("%Y", "year"),
    "yf_symbol_month_agg" -> yfAggOracle("%Y-%m", "month", bySymbol = true),
    "yf_day_raw" ->
      s"""WITH $barsCte
         |SELECT *, strftime("Date", '%Y-%m-%d') AS period_key, 'day' AS agg_type
         |FROM bars
         |ORDER BY "Date", "Open", "High", "Low", "Close", "Volume",
         |  "Dividends", "Stock Splits", symbol""".stripMargin,
    "yf_sma_signals" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol, "Date",
         |    CAST(sum(CAST(floor("Close" * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS close_sum,
         |    count(*) AS n_bars
         |  FROM bars
         |  WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY 1, 2),
         |sma AS (
         |  SELECT symbol, "Date",
         |    (close_sum / 1e8) / n_bars AS close_avg,
         |    (sum(close_sum) OVER w / 1e8) / sum(n_bars) OVER w AS sma20
         |  FROM daily
         |  WINDOW w AS (PARTITION BY symbol ORDER BY "Date"
         |               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
         |SELECT symbol, "Date", close_avg, sma20,
         |  CAST(close_avg > sma20 AS INTEGER) AS above_sma
         |FROM sma ORDER BY symbol, "Date"""".stripMargin,
    "yf_forward_fill" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol,
         |    CAST(CAST("Date" AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_idx,
         |    CAST(sum(CAST(floor("Close" * 1e8 + 0.5) AS BIGINT)) AS BIGINT)
         |      AS close_sum,
         |    count(*) AS n_bars
         |  FROM bars
         |  WHERE "Date" >= '1995-01-01' AND "Date" < '1995-04-01'
         |  GROUP BY 1, 2),
         |spine AS (
         |  SELECT symbol, unnest(range(min(day_idx), max(day_idx) + 1)) AS day_idx
         |  FROM daily GROUP BY symbol),
         |j AS (
         |  SELECT s.symbol, s.day_idx, d.close_sum, d.n_bars
         |  FROM spine s LEFT JOIN daily d USING (symbol, day_idx))
         |SELECT symbol, day_idx,
         |  CAST(close_sum IS NOT NULL AS INTEGER) AS is_observed,
         |  (last_value(close_sum IGNORE NULLS) OVER w / 1e8)
         |    / last_value(n_bars IGNORE NULLS) OVER w AS close_filled
         |FROM j
         |WINDOW w AS (PARTITION BY symbol ORDER BY day_idx
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |ORDER BY symbol, day_idx""".stripMargin,
    "yf_rsi" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol, "Date",
         |    CAST(sum(CAST(floor("Close" * 1e8 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS xq
         |  FROM bars
         |  WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY 1, 2),
         |d2 AS (
         |  SELECT symbol, "Date", xq,
         |    xq - lag(xq) OVER (PARTITION BY symbol ORDER BY "Date") AS diff
         |  FROM daily),
         |d3 AS (
         |  SELECT symbol, "Date", xq,
         |    CASE WHEN diff IS NULL THEN NULL ELSE greatest(diff, 0) END AS gain,
         |    CASE WHEN diff IS NULL THEN NULL ELSE greatest(-diff, 0) END AS loss
         |  FROM d2),
         |w AS (
         |  SELECT symbol, "Date", xq,
         |    CAST(sum(gain) OVER w14 AS BIGINT) AS gsum,
         |    CAST(sum(loss) OVER w14 AS BIGINT) AS lsum
         |  FROM d3
         |  WINDOW w14 AS (PARTITION BY symbol ORDER BY "Date"
         |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
         |SELECT symbol, "Date", xq, gsum, lsum,
         |  CASE WHEN lsum = 0 THEN 100.0
         |       ELSE 100.0 - 100.0 / (1.0 + CAST(gsum AS DOUBLE) / lsum) END AS rsi
         |FROM w ORDER BY symbol, "Date"""".stripMargin,
    "yf_interpolate" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol,
         |    CAST(CAST("Date" AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_idx,
         |    CAST(sum(CAST(floor("Close" * 1e8 + 0.5) AS BIGINT)) AS BIGINT)
         |      // count(*) AS xq
         |  FROM bars
         |  WHERE "Date" >= '1995-01-01' AND "Date" < '1995-04-01'
         |  GROUP BY 1, 2),
         |spine AS (
         |  SELECT symbol, unnest(range(mn, mx + 1)) AS day_idx
         |  FROM (SELECT symbol, min(day_idx) AS mn, max(day_idx) AS mx
         |        FROM daily GROUP BY 1)),
         |j AS (
         |  SELECT s.symbol, s.day_idx, d.xq,
         |    CASE WHEN d.xq IS NOT NULL THEN s.day_idx END AS obs_day
         |  FROM spine s LEFT JOIN daily d USING (symbol, day_idx)),
         |w AS (
         |  SELECT symbol, day_idx, xq,
         |    last_value(xq IGNORE NULLS) OVER wb AS prev_xq,
         |    last_value(obs_day IGNORE NULLS) OVER wb AS prev_day,
         |    first_value(xq IGNORE NULLS) OVER wf AS next_xq,
         |    first_value(obs_day IGNORE NULLS) OVER wf AS next_day
         |  FROM j
         |  WINDOW wb AS (PARTITION BY symbol ORDER BY day_idx
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |  wf AS (PARTITION BY symbol ORDER BY day_idx
         |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT symbol, day_idx,
         |  CAST(xq IS NOT NULL AS INTEGER) AS is_observed,
         |  CASE WHEN xq IS NOT NULL THEN CAST(xq AS DOUBLE) / 1e8
         |       ELSE CAST(prev_xq * (next_day - day_idx)
         |                 + next_xq * (day_idx - prev_day) AS DOUBLE)
         |            / (next_day - prev_day) / 1e8 END AS close_interp
         |FROM w ORDER BY symbol, day_idx""".stripMargin,
    "customer_pareto" ->
      """WITH cust AS (
        |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(CAST(sum(rev) AS DECIMAL(38,2)) AS DOUBLE)
        |        AS total_rev FROM cust),
        |d AS (SELECT o_custkey, rev,
        |        ntile(10) OVER (ORDER BY rev DESC, o_custkey) AS decile
        |      FROM cust)
        |SELECT CAST(decile AS INTEGER) AS decile, count(*) AS n_customers,
        |  CAST(CAST(sum(rev) AS DECIMAL(38,2)) AS DOUBLE) AS revenue,
        |  CAST(CAST(sum(rev) AS DECIMAL(38,2)) AS DOUBLE) / total_rev * 100.0
        |    AS rev_share_pct
        |FROM d CROSS JOIN t GROUP BY 1, total_rev ORDER BY 1""".stripMargin,
    "customer_cohort_ltv" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m,
        |    CAST(o_totalprice AS DECIMAL(12,2)) AS rev
        |  FROM orders),
        |f AS (SELECT o_custkey, min(m) AS m0 FROM o GROUP BY 1)
        |SELECT CAST(f.m0 AS BIGINT) AS cohort_month,
        |  CAST(o.m - f.m0 AS BIGINT) AS k,
        |  count(DISTINCT o.o_custkey) AS n_customers,
        |  count(*) AS n_orders,
        |  CAST(CAST(sum(rev) AS DECIMAL(38,2)) AS DOUBLE) AS revenue
        |FROM o JOIN f USING (o_custkey)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_range_frame" ->
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vq
        |  FROM events)
        |SELECT event_id, event_type, vq,
        |  count(*) OVER w AS n_near_below,
        |  CAST(sum(vq) OVER w AS BIGINT) AS sum_near_below
        |FROM ev
        |WINDOW w AS (PARTITION BY event_type ORDER BY vq
        |  RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, vq, event_id""".stripMargin,
    "docs_dataset_card" ->
      s"""WITH b AS (
         |  SELECT doc_id, lang, source,
         |    CAST(len(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+'))
         |      AS BIGINT) AS n_tokens,
         |    md5(${util.Norm.normalizeSql("text")}) AS fp
         |  FROM documents)
         |SELECT count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  count(DISTINCT lang) AS n_langs,
         |  count(DISTINCT source) AS n_sources,
         |  count(*) - count(DISTINCT fp) AS n_dup_docs,
         |  CAST(count(*) FILTER (WHERE n_tokens < 5) AS BIGINT) AS n_short_docs,
         |  min(n_tokens) AS min_tokens,
         |  max(n_tokens) AS max_tokens
         |FROM b""".stripMargin,
    "yf_weekly_ohlc" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol,
         |    CAST(CAST("Date" AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_idx,
         |    CAST(sum(CAST(floor("Open" * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS open_sum,
         |    CAST(sum(CAST(floor("High" * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS high_sum,
         |    CAST(sum(CAST(floor("Low" * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS low_sum,
         |    CAST(sum(CAST(floor("Close" * 1e8 + 0.5) AS BIGINT)) AS BIGINT) AS close_sum,
         |    CAST(sum(CAST(floor("Volume" + 0.5) AS BIGINT)) AS BIGINT) AS vol_sum,
         |    count(*) AS n_bars
         |  FROM bars
         |  WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY 1, 2),
         |a AS (
         |  SELECT symbol, day_idx, (day_idx + 3) // 7 AS week_idx,
         |    (open_sum / 1e8) / n_bars AS open_avg,
         |    (high_sum / 1e8) / n_bars AS high_avg,
         |    (low_sum / 1e8) / n_bars AS low_avg,
         |    (close_sum / 1e8) / n_bars AS close_avg,
         |    vol_sum
         |  FROM daily)
         |SELECT symbol, week_idx,
         |  arg_min(open_avg, day_idx) AS "open",
         |  max(high_avg) AS high,
         |  min(low_avg) AS low,
         |  arg_max(close_avg, day_idx) AS "close",
         |  CAST(sum(vol_sum) AS BIGINT) AS volume,
         |  count(*) AS n_days
         |FROM a GROUP BY 1, 2 ORDER BY symbol, week_idx""".stripMargin,
    "yf_vwap" ->
      s"""WITH $barsCte,
         |b AS (
         |  SELECT symbol,
         |    (CAST(CAST("Date" AS DATE) - DATE '1970-01-01' AS BIGINT) + 3) // 7
         |      AS week_idx,
         |    CAST(floor("Close" * 1e8 + 0.5) AS BIGINT) AS close_q8,
         |    CAST(floor("Volume" + 0.5) AS BIGINT) AS vol
         |  FROM bars WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01')
         |SELECT symbol, week_idx, count(*) AS n_bars,
         |  CAST(sum(vol) AS BIGINT) AS vol_sum,
         |  (CAST(sum(close_q8 * vol) AS BIGINT) / 1e8)
         |    / CAST(sum(vol) AS BIGINT) AS vwap
         |FROM b GROUP BY 1, 2 ORDER BY symbol, week_idx""".stripMargin,
    "yf_bollinger" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol, "Date",
         |    (CAST(sum(CAST(floor("Close" * 1e8 + 0.5) AS BIGINT)) AS BIGINT) / 1e8)
         |      / count(*) AS close_avg
         |  FROM bars
         |  WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY 1, 2),
         |q AS (SELECT symbol, "Date", close_avg,
         |        CAST(floor(close_avg * 1e6 + 0.5) AS BIGINT) AS cq FROM daily),
         |w AS (
         |  SELECT symbol, "Date", close_avg,
         |    count(*) OVER win AS n_w,
         |    CAST(sum(cq) OVER win AS BIGINT) AS s1,
         |    CAST(sum(cq * cq) OVER win AS BIGINT) AS s2
         |  FROM q WINDOW win AS (PARTITION BY symbol ORDER BY "Date"
         |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
         |bands AS (
         |  SELECT symbol, "Date", close_avg,
         |    (s1 / 1e6) / n_w AS sma20,
         |    CASE WHEN n_w < 2 THEN NULL
         |         ELSE sqrt(CAST(n_w * s2 - s1 * s1 AS DOUBLE)
         |                   / (n_w * (n_w - 1))) / 1e6 END AS sd20
         |  FROM w)
         |SELECT symbol, "Date", close_avg, sma20, sd20,
         |  sma20 + 2.0 * sd20 AS upper,
         |  sma20 - 2.0 * sd20 AS lower,
         |  CAST(((sma20 + 2.0 * sd20) - (sma20 - 2.0 * sd20)) < 0.02 AS INTEGER)
         |    AS squeeze
         |FROM bands ORDER BY symbol, "Date"""".stripMargin,
    "yf_returns_drawdown" ->
      s"""WITH $barsCte,
         |daily AS (
         |  SELECT symbol, "Date",
         |    (CAST(sum(CAST(floor("Close" * 1e8 + 0.5) AS BIGINT)) AS BIGINT) / 1e8)
         |      / count(*) AS close_avg
         |  FROM bars
         |  WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |  GROUP BY 1, 2)
         |SELECT symbol, "Date", close_avg,
         |  close_avg / nullif(lag(close_avg, 1) OVER w, 0) - 1.0 AS ret,
         |  max(close_avg) OVER (PARTITION BY symbol ORDER BY "Date"
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak,
         |  1.0 - close_avg / nullif(max(close_avg) OVER (PARTITION BY symbol
         |    ORDER BY "Date" ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
         |    AS drawdown
         |FROM daily
         |WINDOW w AS (PARTITION BY symbol ORDER BY "Date")
         |ORDER BY symbol, "Date"""".stripMargin,
    "yf_catalog_join" ->
      s"""WITH $barsCte
         |SELECT b.symbol, s.s_name AS company_name, count(*) AS n_bars,
         |  CAST(sum(CAST(b."Volume" AS DECIMAL(38,8))) AS DOUBLE) AS sum_volume, max(b."High") AS max_high
         |FROM bars b JOIN supplier s ON b.symbol = s.s_suppkey
         |GROUP BY b.symbol, s.s_name ORDER BY b.symbol""".stripMargin,
    "yf_count" -> "SELECT count(*) AS n_rows FROM lineitem",
    "yf_distinct_symbols" ->
      s"""WITH $barsCte
         |SELECT strftime("Date", '%Y-%m') AS period_key,
         |  count(DISTINCT symbol) AS n_symbols, count(*) AS n_bars
         |FROM bars GROUP BY 1 ORDER BY 1""".stripMargin,
    "yf_salted_month_agg" ->
      s"""WITH $barsCte
         |SELECT strftime("Date", '%Y-%m') AS period_key,
         |  count(*) AS n_bars,
         |  ${util.Stable.exactSumSql(""""Volume"""")} AS sum_volume,
         |  max("High") AS max_high, min("Low") AS min_low
         |FROM bars GROUP BY 1 ORDER BY 1""".stripMargin,
    "yf_rollup" ->
      s"""WITH $barsCte,
         |ym AS (SELECT CAST(year("Date") AS INTEGER) AS y,
         |              CAST(month("Date") AS INTEGER) AS m, "Volume" FROM bars)
         |SELECT y, m, count(*) AS n_bars,
         |  ${util.Stable.exactSumSql(""""Volume"""")} AS sum_volume,
         |  CAST(CASE WHEN GROUPING(y) THEN 1 ELSE 0 END AS INTEGER) AS g_y,
         |  CAST(CASE WHEN GROUPING(m) THEN 1 ELSE 0 END AS INTEGER) AS g_m
         |FROM ym GROUP BY ROLLUP(y, m)
         |ORDER BY g_y, g_m, y, m""".stripMargin,
    "yf_unpivot" ->
      s"""WITH $barsCte,
         |long AS (
         |  SELECT symbol, 'open' AS metric, "Open" AS value FROM bars
         |  UNION ALL SELECT symbol, 'high', "High" FROM bars
         |  UNION ALL SELECT symbol, 'low', "Low" FROM bars
         |  UNION ALL SELECT symbol, 'close', "Close" FROM bars)
         |SELECT symbol, metric, count(*) AS n_bars,
         |  ${util.Stable.exactSumSql("value")} AS sum_value
         |FROM long GROUP BY 1, 2 ORDER BY symbol, metric""".stripMargin,
    "top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "top_orders_per_customer" -> topOrdersPerCustomerOracle,
    // The window-form twin runs through the SAME plan after the
    // optimizer rewrite — one oracle for both.
    "top_orders_per_customer_auto" -> topOrdersPerCustomerOracle,
    "top_orders_per_customer_ties" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |QUALIFY rank() OVER (
        |  PARTITION BY o_custkey ORDER BY o_totalprice DESC) <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
    "events_user_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day_idx
        |  FROM events),
        |seg AS (
        |  SELECT user_id, day_idx,
        |    CASE WHEN day_idx - lag(day_idx, 1) OVER w = 1 THEN 0 ELSE 1 END
        |      AS is_new
        |  FROM days
        |  WINDOW w AS (PARTITION BY user_id ORDER BY day_idx)),
        |streaks AS (
        |  SELECT user_id,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY day_idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS streak_id
        |  FROM seg),
        |per AS (SELECT user_id, streak_id, count(*) AS streak_days
        |        FROM streaks GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_streaks,
        |  CAST(max(streak_days) AS BIGINT) AS longest_streak,
        |  CAST(sum(streak_days) AS BIGINT) AS active_days
        |FROM per GROUP BY 1 ORDER BY user_id""".stripMargin,
    "filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'
        |  AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "idx_union_years" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS "year",
        |  count(*) AS n_orders, CAST(sum(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE year(o_orderdate) IN (1995, 1996, 1997)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "news_chunk_counts" -> {
      val longText = "regexp_replace(" +
        (0 until 20).map(_ => "text").mkString("concat_ws('. ', ", ", ", ")") +
        ", ' the ', '. ', 'g')"
      s"""${news.Summarize.chunkCountsSql("documents", longText)}
         |ORDER BY doc_id""".stripMargin
    },
    "news_summary_stats" ->
      s"""${news.Summarize.summaryStatsSql("documents", "replace(text, ' the ', '. ')")}
         |ORDER BY doc_id""".stripMargin,
    // The summary STRING itself, reconstructed: trim(text) through the
    // full summarizeLongText dispatch (one-shot here — news konten is
    // short — but the long path is generated too and exercised by
    // news_chunking below), then the reference's output field set with
    // the pinned 1-based index.
    "news_summarize" ->
      s"""WITH RECURSIVE
         |base AS (SELECT doc_id, trim(text) AS t FROM documents),
         |${news.Summarize.summarizeLongTextCtes("sm", "base", Seq("doc_id"))
             .stripSuffix(",")}
         |SELECT CAST(row_number() OVER (ORDER BY d.doc_id) AS INTEGER)
         |    AS "index",
         |  d.source AS judul, d.text AS konten,
         |  coalesce(f.summary, '') AS rangkuman,
         |  CAST(d.doc_id AS VARCHAR) AS waktu, d.lang AS tanggal_artikel
         |FROM documents d LEFT JOIN sm_final f USING (doc_id)
         |ORDER BY "index"""".stripMargin,
    // Full split-merge replay on the synthesized >1024-token texts:
    // n_chunks from the greedy-fold state machine (chunkCountsSql as a
    // derived table), n_summary_tokens by re-tokenizing the reconstructed
    // summary string.
    "news_chunking" -> {
      val longText = "regexp_replace(" +
        (0 until 20).map(_ => "text").mkString("concat_ws('. ', ", ", ", ")") +
        ", ' the ', '. ', 'g')"
      s"""WITH RECURSIVE
         |base AS (SELECT doc_id, $longText AS t FROM documents),
         |${news.Summarize.summarizeLongTextCtes("sm", "base", Seq("doc_id"))
             .stripSuffix(",")}
         |SELECT b.doc_id,
         |  CAST(len(regexp_extract_all(b.t, '${news.Summarize.tokenReSql}'))
         |    AS INTEGER) AS n_tokens,
         |  CAST(c.n_chunks AS INTEGER) AS n_chunks,
         |  CAST(len(regexp_extract_all(coalesce(f.summary, ''),
         |    '${news.Summarize.tokenReSql}')) AS INTEGER) AS n_summary_tokens
         |FROM base b
         |JOIN (${news.Summarize.chunkCountsSql("documents", longText)}) c
         |  USING (doc_id)
         |LEFT JOIN sm_final f USING (doc_id)
         |ORDER BY b.doc_id""".stripMargin
    },
    "news_text_stats" ->
      """WITH d AS (SELECT *, replace(text, ' the ', '. ') AS dotted FROM documents)
        |SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS len_text,
        |  CAST(len(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS BIGINT) AS n_words,
        |  CAST(len(list_filter(string_split(dotted, '.'), x -> trim(x) <> '')) AS BIGINT) AS n_sentences
        |FROM d ORDER BY doc_id""".stripMargin,
    "idx_financials" -> idx.FinancialReport.oracleSql,
    "events_quantiles" ->
      s"""SELECT event_type,
         |  ${util.Stable.sigSql("quantile_cont(value, 0.5)")} AS p50,
         |  ${util.Stable.sigSql("quantile_cont(value, 0.95)")} AS p95,
         |  count(*) AS n_events
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // Same oracle as events_quantiles: the query emits the EXACT
    // percentiles (the GK rank-bound check on the approx values runs
    // inside the query via assert_true — a failed bound fails the row
    // count, not just a spec).
    "events_quantiles_approx" ->
      s"""SELECT event_type,
         |  ${util.Stable.sigSql("quantile_cont(value, 0.5)")} AS p50,
         |  ${util.Stable.sigSql("quantile_cont(value, 0.95)")} AS p95,
         |  count(*) AS n_events
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_vocab" ->
      s"""WITH w AS (
         |  SELECT doc_id, unnest(string_split(${util.Norm.normalizeSql("text")}, ' ')) AS word
         |  FROM documents)
         |SELECT word, count(*) AS n_occurrences, count(DISTINCT doc_id) AS df
         |FROM w WHERE word <> ''
         |GROUP BY word ORDER BY df DESC, word LIMIT 100""".stripMargin,
    "events_anti_join" ->
      """WITH clickers AS (
        |  SELECT user_id, count(*) AS n_clicks FROM events
        |  WHERE event_type = 'click' GROUP BY user_id)
        |SELECT c.user_id, c.n_clicks FROM clickers c
        |WHERE c.user_id NOT IN
        |  (SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 95.0)
        |ORDER BY c.user_id""".stripMargin,
    "data_ri_audit" -> {
      def rel(name: String, child: String, fk: String, parent: String, pk: String) =
        s"""SELECT '$name' AS rel,
           |  (SELECT count(*) FROM $child) AS n_rows,
           |  (SELECT count(*) FROM $child ch
           |   WHERE NOT EXISTS (SELECT 1 FROM $parent pa WHERE pa.$pk = ch.$fk))
           |  AS n_orphans""".stripMargin
      Seq(
        rel("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        rel("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        rel("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        rel("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        rel("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
        rel("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        rel("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey")
      ).mkString("", "\nUNION ALL\n", "\nORDER BY rel")
    },
    "dedup_exact" ->
      s"""WITH docs AS ${dedup.Dedup.augmentedSql}
         |${dedup.Dedup.exactGroupsSql("docs")}
         |ORDER BY fingerprint""".stripMargin,
    "dedup_jaccard_pairs" ->
      s"""WITH docs AS ${dedup.Dedup.augmentedSql},
         |${dedup.Dedup.jaccardPairsCtes("docs", 0.6, None)}
         |SELECT * FROM pairs ORDER BY id_a, id_b""".stripMargin,
    "dedup_jaccard_capped" ->
      s"""WITH docs AS ${dedup.Dedup.augmentedSql},
         |${dedup.Dedup.jaccardPairsCtes("docs", 0.5, None, maxDocFreq = Some(10L))}
         |SELECT * FROM pairs ORDER BY id_a, id_b""".stripMargin,
    "dedup_overlap_pairs" ->
      s"""WITH docs AS ${dedup.Dedup.augmentedSql},
         |${dedup.Dedup.overlapPairsCtes("docs", 0.9, maxDocFreq = Some(10L))}
         |SELECT * FROM pairs ORDER BY id_a, id_b""".stripMargin,
    "dedup_clusters" ->
      s"""WITH docs AS ${dedup.Dedup.augmentedSql},
         |${dedup.Dedup.jaccardPairsCtes("docs", 0.6, None, maxDocFreq = Some(10L))},
         |${dedup.Dedup.clustersSql("docs", "pairs")}
         |SELECT doc_id, cluster_id,
         |  CAST(doc_id = cluster_id AS INTEGER) AS is_canonical
         |FROM clusters ORDER BY doc_id""".stripMargin,
    "dedup_clusters_lsh" ->
      s"""WITH docs AS ${dedup.Dedup.augmentedSql},
         |${dedup.Dedup.lshCandidatesCtes("docs")},
         |${dedup.Dedup.jaccardPairsCtes("docs", 0.6, Some("cand"))},
         |vpairs AS (
         |  SELECT p.id_a, p.id_b FROM pairs p
         |  JOIN cand c ON c.id_a = p.id_a AND c.id_b = p.id_b),
         |${dedup.Dedup.clustersSql("docs", "vpairs")}
         |SELECT doc_id, cluster_id,
         |  CAST(doc_id = cluster_id AS INTEGER) AS is_canonical
         |FROM clusters ORDER BY doc_id""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH docs AS ${dedup.Dedup.augmentedSql},
         |${dedup.Dedup.lshCandidatesCtes("docs")},
         |${dedup.Dedup.jaccardPairsCtes("docs", 0.6, Some("cand"))}
         |SELECT p.id_a, p.id_b, p.jaccard FROM pairs p
         |JOIN cand c ON c.id_a = p.id_a AND c.id_b = p.id_b
         |ORDER BY p.id_a, p.id_b""".stripMargin,
    "dedup_minhash_estimate" ->
      s"""WITH docs AS ${dedup.Dedup.augmentedSql},
         |${dedup.Dedup.lshCandidatesCtes("docs")},
         |${dedup.Dedup.jaccardPairsCtes("docs", 0.0, Some("cand"))},
         |sigs AS (
         |  SELECT doc_id AS id,
         |    ${dedup.Dedup.minhashSignatureSql(dedup.Dedup.shinglesSql("text"))} AS sig
         |  FROM docs),
         |m AS (
         |  SELECT c.id_a, c.id_b,
         |    CAST(len([i FOR i IN range(1, ${dedup.Dedup.NumHashes + 1})
         |              IF sa.sig[i] = sb.sig[i]]) AS INTEGER) AS n_match
         |  FROM cand c
         |  JOIN sigs sa ON sa.id = c.id_a
         |  JOIN sigs sb ON sb.id = c.id_b)
         |SELECT m.id_a, m.id_b, m.n_match,
         |  m.n_match / 12.0 AS est_jaccard, p.jaccard
         |FROM m JOIN pairs p ON p.id_a = m.id_a AND p.id_b = m.id_b
         |ORDER BY m.id_a, m.id_b""".stripMargin,
    "dedup_fuzzy_editdist" ->
      s"""WITH docs AS ${dedup.Dedup.augmentedSql},
         |${dedup.Dedup.lshCandidatesCtes("docs")},
         |t AS (SELECT doc_id,
         |        substring(${util.Norm.normalizeSql("text")}, 1, 80) AS prefix
         |      FROM docs)
         |SELECT c.id_a, c.id_b, levenshtein(a.prefix, b.prefix) AS editdist
         |FROM cand c
         |JOIN t a ON a.doc_id = c.id_a
         |JOIN t b ON b.doc_id = c.id_b
         |WHERE levenshtein(a.prefix, b.prefix) <= 20
         |ORDER BY c.id_a, c.id_b""".stripMargin,
    "dedup_simhash" ->
      s"""WITH docs AS ${dedup.Dedup.augmentedSql},
         |${dedup.Dedup.simhashPairsCtes("docs")}
         |SELECT * FROM shpairs ORDER BY id_a, id_b""".stripMargin,
    "events_sessionize" ->
      s"""${events.Sessionize.sessionStatsSql("events")}
         |ORDER BY user_id, session_idx""".stripMargin,
    "events_k_anonymity" ->
      """WITH classes AS (
        |  SELECT event_type,
        |    (epoch_ns(ts) // 86400000000000) % 7 AS dow,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) // 5000 AS vband,
        |    count(DISTINCT user_id) AS n_users, count(*) AS n_rows
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT event_type, count(*) AS n_classes,
        |  CAST(sum(CASE WHEN n_users < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_small_classes,
        |  CAST(sum(CASE WHEN n_users < 5 THEN n_users ELSE 0 END) AS BIGINT) AS users_at_risk,
        |  CAST(sum(CASE WHEN n_users < 5 THEN n_rows ELSE 0 END) AS BIGINT) AS rows_at_risk,
        |  min(n_users) AS min_class_users
        |FROM classes GROUP BY 1 ORDER BY event_type""".stripMargin,
    "events_null_safe_join" ->
      """WITH l AS (
        |  SELECT nullif(CAST(props->>'k' AS INTEGER) % 7, 0) AS knull,
        |    count(*) AS n_click
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |r AS (
        |  SELECT nullif(CAST(props->>'k' AS INTEGER) % 7, 0) AS knull,
        |    count(*) AS n_view
        |  FROM events WHERE event_type = 'view' GROUP BY 1)
        |SELECT coalesce(l.knull, r.knull) AS k_class, n_click, n_view
        |FROM l FULL JOIN r ON l.knull IS NOT DISTINCT FROM r.knull
        |ORDER BY k_class""".stripMargin,
    "events_retention" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day_idx
        |  FROM events),
        |first AS (SELECT user_id, min(day_idx) AS cohort_day FROM days GROUP BY 1)
        |SELECT cohort_day, day_idx - cohort_day AS day_offset, count(*) AS n_users
        |FROM days JOIN first USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,
    "events_latest_state" ->
      """SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value FROM events
        |QUALIFY row_number() OVER (
        |  PARTITION BY user_id, event_type
        |  ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
        |ORDER BY user_id, event_type""".stripMargin,
    "events_scd2" ->
      """WITH ev AS (
        |  SELECT user_id, event_type AS state, epoch_us(ts) AS ts_us, event_id
        |  FROM events),
        |runs AS (
        |  SELECT user_id, state, ts_us, event_id
        |  FROM (SELECT *, lag(state) OVER (
        |          PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_state
        |        FROM ev)
        |  WHERE prev_state IS NULL OR prev_state <> state)
        |SELECT user_id, state, ts_us AS valid_from_us,
        |  lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
        |    AS valid_to_us,
        |  event_id
        |FROM runs ORDER BY user_id, valid_from_us, event_id""".stripMargin,
    "events_salted_join" ->
      s"""WITH dim AS (
         |  SELECT user_id, count(DISTINCT event_type) AS n_types
         |  FROM events GROUP BY 1)
         |SELECT e.user_id, n_types,
         |  ${util.Stable.exactSumSql("e.value")} AS sum_value,
         |  count(*) AS n_events
         |FROM events e JOIN dim USING (user_id)
         |GROUP BY 1, 2 ORDER BY e.user_id""".stripMargin,
    "events_rolling_active" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day_idx
        |  FROM events),
        |observed AS (SELECT DISTINCT day_idx AS w_day FROM days),
        |contrib AS (
        |  SELECT DISTINCT user_id, day_idx + o.i AS w_day
        |  FROM days CROSS JOIN range(0, 7) o(i))
        |SELECT w_day, count(*) AS n_active_7d
        |FROM contrib JOIN observed USING (w_day)
        |GROUP BY 1 ORDER BY w_day""".stripMargin,
    "events_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS ts FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM ev WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2
        |       FROM ev e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts > t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3
        |       FROM ev e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > t2 GROUP BY 1)
        |SELECT (SELECT count(*) FROM s1) AS n_signup,
        |       (SELECT count(*) FROM s2) AS n_click_after,
        |       (SELECT count(*) FROM s3) AS n_purchase_after""".stripMargin,
    "events_json_extract" ->
      s"""SELECT event_type, count(*) AS n_events,
         |  ${util.Stable.exactSumSql("CAST(props->>'k' AS INTEGER)")} AS sum_k,
         |  max(CAST(props->>'k' AS INTEGER)) AS max_k
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_variant_extract" ->
      s"""SELECT CAST(CAST(props->>'k' AS INTEGER) // 10 AS BIGINT) AS k_bucket,
         |  count(*) AS n_events,
         |  ${util.Stable.exactSumSql("value")} AS sum_value,
         |  count(DISTINCT user_id) AS n_users,
         |  CAST(0 AS BIGINT) AS n_missing_nonnull
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_pivot" ->
      """SELECT user_id,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS "view"
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "events_value_histogram" ->
      """WITH s AS (SELECT min(value) AS vmin, max(value) AS vmax FROM events)
        |SELECT CAST(least(floor((value - vmin) / ((vmax - vmin) / 16.0)), 15.0)
        |    AS BIGINT) AS bucket,
        |  count(*) AS n_values, min(value) AS bucket_min, max(value) AS bucket_max
        |FROM events CROSS JOIN s
        |GROUP BY 1 ORDER BY bucket""".stripMargin,
    "events_type_value_corr" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS x,
        |    epoch_ns(ts) // 3600000000000 % 24 AS y
        |  FROM events),
        |m AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM ev GROUP BY 1)
        |SELECT event_type, n,
        |  (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |    / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |         * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
        |    AS corr_xy
        |FROM m ORDER BY event_type""".stripMargin,
    "events_users_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin,
    "events_cube" ->
      s"""WITH ev AS (
         |  SELECT event_type, epoch_ns(ts) // 86400000000000 % 7 AS dow, value
         |  FROM events)
         |SELECT event_type, dow, count(*) AS n_events,
         |  ${util.Stable.exactSumSql("value")} AS sum_value,
         |  CAST(CASE WHEN GROUPING(event_type) THEN 1 ELSE 0 END AS INTEGER) AS g_type,
         |  CAST(CASE WHEN GROUPING(dow) THEN 1 ELSE 0 END AS INTEGER) AS g_dow
         |FROM ev GROUP BY CUBE(event_type, dow)
         |ORDER BY g_type, g_dow, event_type, dow""".stripMargin,
    "events_key_skew" ->
      """WITH pk AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
        |a AS (SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows,
        |        max(cnt) AS max_key_rows, min(cnt) AS min_key_rows
        |      FROM pk)
        |SELECT n_keys, n_rows, max_key_rows, min_key_rows,
        |  CAST(n_rows AS DOUBLE) / n_keys AS avg_key_rows,
        |  CAST(max_key_rows AS DOUBLE) / (CAST(n_rows AS DOUBLE) / n_keys)
        |    AS skew_ratio
        |FROM a""".stripMargin,
    // The same mask-ladder bit spread, written with DuckDB's native
    // bitwise operators; all-integer, so the tiles agree exactly.
    "events_zorder" ->
      """WITH xy AS (
        |  SELECT user_id AS x, epoch_ns(ts) // 86400000000000 AS y FROM events),
        |sx AS (SELECT x, y, x & 65535 AS a FROM xy),
        |sx1 AS (SELECT x, y, ((a | (a << 8)) & 16711935) AS a FROM sx),
        |sx2 AS (SELECT x, y, ((a | (a << 4)) & 252645135) AS a FROM sx1),
        |sx3 AS (SELECT x, y, ((a | (a << 2)) & 858993459) AS a FROM sx2),
        |sx4 AS (SELECT x, y, ((a | (a << 1)) & 1431655765) AS a FROM sx3),
        |sy AS (SELECT x, y, a AS ax, y & 65535 AS b FROM sx4),
        |sy1 AS (SELECT x, y, ax, ((b | (b << 8)) & 16711935) AS b FROM sy),
        |sy2 AS (SELECT x, y, ax, ((b | (b << 4)) & 252645135) AS b FROM sy1),
        |sy3 AS (SELECT x, y, ax, ((b | (b << 2)) & 858993459) AS b FROM sy2),
        |sy4 AS (SELECT x, y, ax, ((b | (b << 1)) & 1431655765) AS b FROM sy3),
        |z AS (SELECT x, y, (ax | (b << 1)) AS z FROM sy4)
        |SELECT z >> 8 AS z_tile, count(*) AS n_rows,
        |  min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
        |FROM z GROUP BY 1 ORDER BY z_tile""".stripMargin,
    "events_asof_join" ->
      s"""${events.AsofJoin.lastEventBeforeSql("events", "click", "error")}
         |ORDER BY 1""".stripMargin,
    "events_asof_forward" ->
      s"""${events.AsofJoin.nextEventAfterSql("events", "click", "purchase")}
         |ORDER BY 1""".stripMargin,
    "events_range_join" ->
      s"""${events.RangeJoin.windowedMatchesSql("events", "error", "purchase")}
         |ORDER BY l_id""".stripMargin,
    "events_interval_overlap" ->
      s"""WITH stats AS (${events.Sessionize.sessionStatsSql("events")}),
         |sess AS (SELECT user_id, session_idx,
         |           t_start_us AS t0, t_end_us AS t1 FROM stats),
         |pairs AS (
         |  SELECT greatest(a.t0, b.t0) AS ov_start, least(a.t1, b.t1) AS ov_end
         |  FROM sess a JOIN sess b
         |    ON a.user_id < b.user_id AND a.t0 <= b.t1 AND b.t0 <= a.t1)
         |SELECT ov_start // 86400000000 AS day_idx, count(*) AS n_pairs,
         |  CAST(sum(ov_end - ov_start) AS BIGINT) AS sum_overlap_us,
         |  max(ov_end - ov_start) AS max_overlap_us
         |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_hourly_window" ->
      s"""${streaming.Streams.hourlyTypeCountsSql("events")}
         |ORDER BY w_start, event_type""".stripMargin,
    // The good route must carry exactly the events table; the quarantine
    // must hold exactly the ten injected raw lines (40-bit md5 sum of the
    // literal strings — recomputed here from the same constants).
    "events_jsonl_badrows" ->
      """SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM events) AS n_good,
        |  (SELECT CAST(sum(CAST(floor(value * 1e8 + 0.5) AS BIGINT)) AS BIGINT)
        |   FROM events) AS sum_value_q8,
        |  (SELECT CAST(sum(user_id) AS BIGINT) FROM events) AS user_id_sum,
        |  CAST(10 AS BIGINT) AS n_bad,
        |  (SELECT CAST(sum(CAST(concat('0x',
        |       substring(md5(concat('{"event_id": not-json-', CAST(k AS VARCHAR))), 1, 10))
        |     AS BIGINT)) AS BIGINT)
        |   FROM (SELECT unnest(range(0, 10)) AS k)) AS bad_sum40""".stripMargin,
    "events_session_window_native" ->
      s"""WITH us AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events),
         |f AS (
         |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
         |                   OR ts_us - lag(ts_us) OVER w >= 1800000000
         |                 THEN 1 ELSE 0 END AS ns
         |  FROM us WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         |s AS (
         |  SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id
         |    ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
         |  FROM f),
         |sess AS (
         |  SELECT user_id, sid, count(*) AS n_events,
         |    ${util.Stable.exactSumSql("value")} AS sum_value
         |  FROM s GROUP BY 1, 2)
         |SELECT user_id, count(*) AS n_sessions,
         |  CAST(sum(n_events) AS BIGINT) AS n_events,
         |  ${util.Stable.exactSumSql("sum_value")} AS sum_value,
         |  max(n_events) AS max_session_events
         |FROM sess GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_type_transitions" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS tsn, event_id, event_type
        |  FROM events),
        |tr AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY tsn, event_id) AS prev_type,
        |    event_type
        |  FROM e),
        |t2 AS (SELECT * FROM tr WHERE prev_type IS NOT NULL),
        |tot AS (SELECT prev_type, count(*) AS n_from FROM t2 GROUP BY 1)
        |SELECT t.prev_type, t.event_type, count(*) AS n_trans, tot.n_from,
        |  CAST(count(*) AS DOUBLE) / tot.n_from AS p_trans
        |FROM t2 t JOIN tot USING (prev_type)
        |GROUP BY 1, 2, tot.n_from ORDER BY 1, 2""".stripMargin,
    "events_ab_test" ->
      """WITH arms AS (
        |  SELECT DISTINCT user_id, user_id % 2 AS arm FROM events),
        |conv AS (
        |  SELECT DISTINCT user_id, 1 AS converted FROM events
        |  WHERE event_type = 'purchase'
        |    AND epoch_ns(ts) // 86400000000000 BETWEEN 19723 AND 19729),
        |s AS (
        |  SELECT arm, count(*) AS n_users,
        |    CAST(sum(coalesce(converted, 0)) AS BIGINT) AS n_conv
        |  FROM arms LEFT JOIN conv USING (user_id) GROUP BY 1),
        |w AS (
        |  SELECT
        |    CAST(sum(CASE WHEN arm = 0 THEN n_users END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN arm = 0 THEN n_conv END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN arm = 1 THEN n_users END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN arm = 1 THEN n_conv END) AS BIGINT) AS c1
        |  FROM s)
        |SELECT n0, c0, n1, c1,
        |  CAST(c0 AS DOUBLE) / n0 AS p0,
        |  CAST(c1 AS DOUBLE) / n1 AS p1,
        |  (CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)
        |    / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1)
        |            * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1)))
        |           * (1.0 / n0 + 1.0 / n1)) AS z_score
        |FROM w""".stripMargin,
    "orders_monthly_growth" ->
      s"""WITH m AS (
         |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         |    count(*) AS n_orders,
         |    ${util.Stable.exactSumAtSql(util.Stable.dec2Sql("o_totalprice"), 2)}
         |      AS revenue
         |  FROM orders GROUP BY 1),
         |g AS (
         |  SELECT month, n_orders, revenue,
         |    lag(revenue) OVER (ORDER BY month) AS prev_revenue
         |  FROM m)
         |SELECT month, n_orders, revenue, prev_revenue,
         |  (revenue - prev_revenue) / prev_revenue * 100.0 AS mom_pct
         |FROM g ORDER BY month""".stripMargin,
    "events_agg_breadth" ->
      s"""SELECT event_type,
         |  CAST(count(*) FILTER (WHERE value > 50.0) AS BIGINT) AS n_high,
         |  bool_and(value >= 0.0) AS all_nonneg,
         |  bool_or(value > 99.0) AS any_extreme,
         |  ${util.Stable.exactAvgSql("value")} AS avg_value
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // Direct distinct counts per range — the bitmap OR-merge must land on
    // exactly these numbers.
    "events_bitmap_rollup" ->
      """WITH ed AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS day, user_id FROM events)
        |SELECT 'month' AS range_label,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM ed WHERE day >= 19723 AND day < 19753
        |UNION ALL
        |SELECT 'week1', CAST(count(DISTINCT user_id) AS BIGINT)
        |FROM ed WHERE day >= 19723 AND day < 19730
        |UNION ALL
        |SELECT 'week2', CAST(count(DISTINCT user_id) AS BIGINT)
        |FROM ed WHERE day >= 19730 AND day < 19737
        |ORDER BY range_label""".stripMargin,
    // Same truth as the in-query twin: serving from the stored rollup
    // must change nothing.
    "events_bitmap_rollup_stored" ->
      """WITH ed AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS day, user_id FROM events)
        |SELECT 'month' AS range_label,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM ed WHERE day >= 19723 AND day < 19753
        |UNION ALL
        |SELECT 'week1', CAST(count(DISTINCT user_id) AS BIGINT)
        |FROM ed WHERE day >= 19723 AND day < 19730
        |UNION ALL
        |SELECT 'week2', CAST(count(DISTINCT user_id) AS BIGINT)
        |FROM ed WHERE day >= 19730 AND day < 19737
        |ORDER BY range_label""".stripMargin,
    "events_day_slice" ->
      s"""SELECT event_type, count(*) AS n_events,
         |  count(DISTINCT user_id) AS n_users,
         |  ${util.Stable.exactSumSql("value")} AS sum_value,
         |  min(epoch_ns(ts) // 86400000000000) AS min_day,
         |  max(epoch_ns(ts) // 86400000000000) AS max_day
         |FROM events
         |WHERE epoch_ns(ts) >= 1704672000000000000
         |  AND epoch_ns(ts) < 1705276800000000000
         |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "mm_catalog" ->
      s"""${multimodal.Multimodal.catalogSql("documents", 128)}
         |ORDER BY media_id""".stripMargin,
    "mm_frame_sample" ->
      s"""${multimodal.Multimodal.frameSampleSql("documents", 250)}
         |ORDER BY media_id, sample_ms""".stripMargin,
    "mm_audio_windows" ->
      s"""${multimodal.Multimodal.audioWindowSql("documents", 400, 160)}
         |ORDER BY media_id""".stripMargin,
    "mm_pack_shards" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) + 512 AS rec_bytes,
        |    doc_id % 16 AS bucket,
        |    md5(CAST(doc_id AS VARCHAR)) AS rk
        |  FROM documents),
        |c AS (
        |  SELECT *, CAST(sum(rec_bytes) OVER (PARTITION BY bucket
        |      ORDER BY rk, media_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM m),
        |d AS (SELECT *, (cum - rec_bytes) // 16384 AS shard_idx FROM c)
        |SELECT media_id, bucket, shard_idx, rec_bytes,
        |  CAST(coalesce(sum(rec_bytes) OVER (PARTITION BY bucket, shard_idx
        |      ORDER BY rk, media_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS byte_offset
        |FROM d ORDER BY media_id""".stripMargin,
    // The stubbed decode is deterministic byte statistics over the UTF-8
    // payload, and the fixture text is pure ASCII (verified: octet_length
    // == length for every doc), so char code points == payload bytes and
    // the whole mapPartitions pass is mirrorable in SQL. A REAL codec
    // would be rows-only — this pins the plumbing (schema, encoders,
    // batch shape) cross-engine while the stub stands in.
    "mm_decode_features" ->
      """SELECT doc_id AS media_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(CASE WHEN length(text) = 0 THEN -1
        |            ELSE ascii(substring(text, 1, 1)) END AS INTEGER) AS first_byte,
        |  CAST(coalesce(list_sum([ascii(text[i]) FOR i IN range(1, length(text) + 1)]), 0)
        |       AS BIGINT) AS byte_sum,
        |  CAST(octet_length(encode(text)) // 256 + 1 AS INTEGER) AS n_frames,
        |  CASE WHEN length(text) = 0 THEN 0.0
        |       ELSE CAST(coalesce(list_sum([ascii(text[i]) FOR i IN range(1, length(text) + 1)]), 0) AS DOUBLE)
        |            / octet_length(encode(text)) END AS mean_byte
        |FROM documents ORDER BY media_id""".stripMargin,
    "mm_decode_png" ->
      s"""${multimodal.Multimodal.decodePngSql("documents")}
         |ORDER BY media_id""".stripMargin,
    "dedup_contamination" ->
      s"""WITH docs AS ${dedup.Dedup.augmentedSql},
         |${dedup.Dedup.contaminationSql("docs",
             s"id % 5 = 0 AND id < ${dedup.Dedup.NearOffset}", 0.8)}
         |SELECT * FROM contam ORDER BY train_id, eval_id""".stripMargin,
    "docs_pack_shards" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS BIGINT) AS n_tokens,
        |    doc_id % 32 AS bucket,
        |    md5(CAST(doc_id AS VARCHAR)) AS rk
        |  FROM documents),
        |c AS (
        |  SELECT *, sum(n_tokens) OVER (PARTITION BY bucket ORDER BY rk, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d)
        |SELECT bucket, doc_id, n_tokens,
        |  CAST(floor((cum - n_tokens) / 2000) AS BIGINT) AS shard_idx
        |FROM c ORDER BY doc_id""".stripMargin,
    "docs_pack_assemble" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    CAST(len(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS BIGINT) AS n_tokens,
        |    doc_id % 32 AS bucket,
        |    md5(CAST(doc_id AS VARCHAR)) AS rk
        |  FROM documents),
        |c AS (
        |  SELECT *, sum(n_tokens) OVER (PARTITION BY bucket ORDER BY rk, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d),
        |p AS (SELECT *, CAST(floor((cum - n_tokens) / 2000) AS BIGINT) AS shard_idx FROM c)
        |SELECT bucket, shard_idx, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |  md5(string_agg(text, chr(10) ORDER BY rk, doc_id)) AS payload_md5
        |FROM p GROUP BY 1, 2 ORDER BY bucket, shard_idx""".stripMargin,
    "docs_sample_stratified" ->
      """SELECT lang, doc_id FROM documents
        |QUALIFY row_number() OVER (
        |  PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 20
        |ORDER BY lang, doc_id""".stripMargin,
    "docs_weighted_sample" ->
      """WITH d AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      AS h32
        |  FROM documents)
        |SELECT doc_id, lang, n_chars,
        |  -CAST(floor(ln((h32 + 0.5) / 4294967296.0) * 1e6 + 0.5) AS BIGINT)
        |    / CAST(n_chars AS DOUBLE) AS sample_key
        |FROM d ORDER BY sample_key, doc_id LIMIT 100""".stripMargin,
    "text_tfidf" ->
      s"""WITH w AS (
         |  SELECT doc_id, unnest(string_split(${util.Norm.normalizeSql("text")}, ' ')) AS word
         |  FROM documents),
         |w2 AS (SELECT * FROM w WHERE word <> ''),
         |tf AS (SELECT doc_id, word, count(*) AS tf FROM w2 GROUP BY 1, 2),
         |dfreq AS (SELECT word, count(DISTINCT doc_id) AS df FROM w2 GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents)
         |SELECT t.doc_id, t.word, t.tf, d.df,
         |  ${util.Stable.sigSql("t.tf * ln(CAST(n_docs + 1 AS DOUBLE) / (d.df + 1))")} AS tfidf
         |FROM tf t JOIN dfreq d USING (word) CROSS JOIN n
         |WHERE t.doc_id < 50
         |ORDER BY t.doc_id, t.word""".stripMargin,
    "text_lang_id" ->
      s"""${text.TextAnalysis.langIdSql("documents", "doc_id", "text")}
         |ORDER BY doc_id""".stripMargin,
    "text_pii_redact" -> {
      val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
      val phoneRe = "\\+[0-9]{2} [0-9]{3} [0-9]+"
      s"""WITH d AS (
         |  SELECT doc_id, text ||
         |    (CASE WHEN doc_id % 7 = 0
         |          THEN ' contact user' || doc_id || '@example.com' ELSE '' END) ||
         |    (CASE WHEN doc_id % 11 = 0
         |          THEN ' call +62 812 ' || doc_id ELSE '' END) AS text
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$emailRe')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '$phoneRe')) AS BIGINT) AS n_phones,
         |  md5(regexp_replace(regexp_replace(text, '$emailRe', '<EMAIL>', 'g'),
         |    '$phoneRe', '<PHONE>', 'g')) AS redacted_md5
         |FROM d ORDER BY doc_id""".stripMargin
    },
    "text_repetition" ->
      s"""WITH w AS (
         |  SELECT doc_id, unnest(string_split(${util.Norm.normalizeSql("text")}, ' ')) AS word
         |  FROM documents),
         |pw AS (
         |  SELECT doc_id, word, count(*) AS n FROM w WHERE word <> '' GROUP BY 1, 2)
         |SELECT doc_id,
         |  CAST(sum(n) AS BIGINT) AS n_words,
         |  max(n) AS max_word_count,
         |  count(*) AS n_distinct_words,
         |  max(n) / CAST(sum(n) AS BIGINT) AS top_word_ratio
         |FROM pw GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_dup_ngrams" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    greatest(CAST(len(string_split(${util.Norm.normalizeSql("text")}, ' '))
         |      AS BIGINT) - 2, 0) AS n_grams,
         |    CAST(len(${dedup.Dedup.shinglesSql("text")}) AS BIGINT) AS n_distinct
         |  FROM documents)
         |SELECT doc_id, n_grams, n_distinct,
         |  n_grams - n_distinct AS n_dup,
         |  CASE WHEN n_grams > 0
         |       THEN CAST(n_grams - n_distinct AS DOUBLE) / n_grams END AS dup_frac
         |FROM d ORDER BY doc_id""".stripMargin,
    "text_unigram_logprob" ->
      s"""WITH w AS (
         |  SELECT doc_id, unnest(string_split(${util.Norm.normalizeSql("text")}, ' ')) AS word
         |  FROM documents),
         |w2 AS (SELECT * FROM w WHERE word <> ''),
         |tf AS (SELECT doc_id, word, count(*) AS tf FROM w2 GROUP BY 1, 2),
         |freq AS (SELECT word, count(*) AS wf FROM w2 GROUP BY 1),
         |n AS (SELECT count(*) AS n_total FROM w2)
         |SELECT t.doc_id,
         |  CAST(sum(t.tf) AS BIGINT) AS n_words,
         |  (CAST(sum(t.tf * CAST(floor(-ln(CAST(f.wf AS DOUBLE) / n_total) * 1e4 + 0.5) AS BIGINT)) AS BIGINT) / 1e4)
         |    / CAST(sum(t.tf) AS BIGINT) AS avg_neg_logprob
         |FROM tf t JOIN freq f USING (word) CROSS JOIN n
         |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    "docs_lm_buckets" ->
      s"""WITH w AS (
         |  SELECT doc_id, unnest(string_split(${util.Norm.normalizeSql("text")}, ' ')) AS word
         |  FROM documents),
         |w2 AS (SELECT * FROM w WHERE word <> ''),
         |tf AS (SELECT doc_id, word, count(*) AS tf FROM w2 GROUP BY 1, 2),
         |freq AS (SELECT word, count(*) AS wf FROM w2 GROUP BY 1),
         |n AS (SELECT count(*) AS n_total FROM w2),
         |per_doc AS (
         |  SELECT t.doc_id,
         |    CAST(sum(t.tf) AS BIGINT) AS n_words,
         |    CAST(sum(t.tf * CAST(floor(-ln(CAST(f.wf AS DOUBLE) / n_total) * 1e4 + 0.5) AS BIGINT)) AS BIGINT) AS nll_q4
         |  FROM tf t JOIN freq f USING (word) CROSS JOIN n
         |  GROUP BY t.doc_id),
         |ranked AS (
         |  SELECT d.lang, p.n_words, p.nll_q4,
         |    ntile(3) OVER (PARTITION BY d.lang
         |      ORDER BY p.nll_q4 / p.n_words ASC, p.doc_id ASC) AS bucket
         |  FROM per_doc p JOIN documents d USING (doc_id))
         |SELECT lang, bucket, count(*) AS n_docs,
         |  CAST(sum(n_words) AS BIGINT) AS sum_words,
         |  CAST(sum(nll_q4) AS BIGINT) AS sum_nll_q4
         |FROM ranked GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin,
    "docs_length_histogram" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(string_split(${util.Norm.normalizeSql("text")}, ' '),
         |                         x -> x <> '')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |b AS (
         |  SELECT n_tokens,
         |    CASE WHEN n_tokens = 0 THEN -1
         |         ELSE length(bin(n_tokens)) - 1 END AS bucket
         |  FROM t)
         |SELECT CAST(bucket AS BIGINT) AS bucket,
         |  CASE WHEN bucket < 0 THEN 0
         |       ELSE CAST(1 AS BIGINT) << bucket END AS bucket_lo,
         |  count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
         |FROM b GROUP BY 1, 2 ORDER BY bucket""".stripMargin,
    "dedup_incremental" ->
      s"""WITH docs AS ${dedup.Dedup.augmentedSql},
         |hashed AS (
         |  SELECT doc_id, md5(${util.Norm.normalizeSql("text")}) AS h FROM docs),
         |incoming AS (SELECT * FROM hashed WHERE doc_id % 10 = 0),
         |existing AS (SELECT DISTINCT h FROM hashed WHERE doc_id % 10 <> 0)
         |SELECT min(doc_id) AS doc_id, h, count(*) AS n_batch_copies
         |FROM incoming i
         |WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.h = i.h)
         |GROUP BY h ORDER BY doc_id""".stripMargin,
    // The bloom path is an internal accelerator; the CONTRACT is the
    // exact anti-join — identical oracle to dedup_incremental.
    "dedup_incremental_bloom" ->
      s"""WITH docs AS ${dedup.Dedup.augmentedSql},
         |hashed AS (
         |  SELECT doc_id, md5(${util.Norm.normalizeSql("text")}) AS h FROM docs),
         |incoming AS (SELECT * FROM hashed WHERE doc_id % 10 = 0),
         |existing AS (SELECT DISTINCT h FROM hashed WHERE doc_id % 10 <> 0)
         |SELECT min(doc_id) AS doc_id, h, count(*) AS n_batch_copies
         |FROM incoming i
         |WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.h = i.h)
         |GROUP BY h ORDER BY doc_id""".stripMargin,
    "dedup_incremental_lsh" -> incrementalLshOracle,
    // The stored-index path computes the SAME survivors — one oracle,
    // two engines' worth of proof that the parquet round-trip of the
    // band index + shingle store changes nothing.
    "dedup_incremental_lsh_stored" -> incrementalLshOracle,
    "docs_split" ->
      """SELECT
        |  (CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e', 'f') THEN 'test'
        |        WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c', 'd') THEN 'val'
        |        ELSE 'train' END) AS split,
        |  lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,
    "docs_rebalance" ->
      """WITH counts AS (SELECT lang, count(*) AS n_before FROM documents GROUP BY 1),
        |target AS (SELECT min(n_before) AS target_n FROM counts),
        |kept AS (
        |  SELECT d.lang, count(*) AS n_after
        |  FROM documents d JOIN counts USING (lang) CROSS JOIN target
        |  WHERE CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |          % 1000000
        |        < (target_n * 1000000) // n_before
        |  GROUP BY 1)
        |SELECT c.lang, c.n_before, coalesce(k.n_after, 0) AS n_after
        |FROM counts c LEFT JOIN kept k USING (lang)
        |ORDER BY c.lang""".stripMargin,
    "emb_label_centroids" ->
      // Dimension-agnostic like the Spark side: the unnest bound derives
      // from len(embedding) PER ROW (no hardcoded dim — a fixture dim
      // change can no longer silently count past-the-end NULL positions
      // into the centroid denominator).
      """SELECT label, CAST(i AS BIGINT) - 1 AS dim_idx,
        |  (CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT))
        |        AS BIGINT) / 1e8) / count(*) AS centroid
        |FROM (SELECT label, embedding,
        |        unnest(range(1, len(embedding) + 1)) AS i
        |      FROM embeddings)
        |GROUP BY 1, 2 ORDER BY label, dim_idx""".stripMargin,
    "emb_quantize_int8" ->
      """WITH ex AS (
        |  SELECT label, CAST(i AS BIGINT) - 1 AS dim_idx,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT) AS q
        |  FROM (SELECT label, embedding,
        |          unnest(range(1, len(embedding) + 1)) AS i
        |        FROM embeddings)),
        |rng AS (SELECT dim_idx, min(q) AS min_q, max(q) AS max_q FROM ex GROUP BY 1),
        |codes AS (
        |  SELECT label, ex.dim_idx,
        |    CASE WHEN max_q = min_q THEN 0
        |         ELSE ((q - min_q) * 510 + (max_q - min_q)) // (2 * (max_q - min_q))
        |    END AS code
        |  FROM ex JOIN rng ON ex.dim_idx = rng.dim_idx)
        |SELECT label, dim_idx, count(*) AS n,
        |  CAST(sum(code) AS BIGINT) AS sum_code,
        |  CAST(sum(code * code) AS BIGINT) AS sum_code_sq
        |FROM codes GROUP BY 1, 2 ORDER BY label, dim_idx""".stripMargin,
    "dedup_survivors" ->
      s"""WITH docs AS ${dedup.Dedup.augmentedSql},
         |${dedup.Dedup.jaccardPairsCtes("docs", 0.6, None, maxDocFreq = Some(10L))},
         |${dedup.Dedup.clustersSql("docs", "pairs")},
         |q AS (${text.TextAnalysis.qualityScoreSql("docs", "doc_id", "text")})
         |SELECT cluster_id, doc_id, quality_score
         |FROM (SELECT c.cluster_id, c.doc_id, q.quality_score
         |      FROM clusters c JOIN q USING (doc_id)
         |      QUALIFY row_number() OVER (
         |        PARTITION BY cluster_id
         |        ORDER BY quality_score DESC, doc_id) = 1)
         |ORDER BY cluster_id""".stripMargin,
    "docs_quality_gate" ->
      s"""WITH ${qualityGateSql("documents")}
         |SELECT * FROM gate ORDER BY doc_id""".stripMargin,
    "docs_source_audit" ->
      s"""WITH syn AS $sourcedDocsSql,
         |d AS (
         |  SELECT source, lang,
         |    CAST(len(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS BIGINT)
         |      AS n_tokens,
         |    md5(text) AS h
         |  FROM syn)
         |SELECT source,
         |  count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  count(DISTINCT lang) AS n_langs,
         |  count(*) - count(DISTINCT h) AS n_dup_docs,
         |  count(*) FILTER (n_tokens < ${text.TextAnalysis.GateMinWords}) AS n_short,
         |  CAST((count(*) - count(DISTINCT h)) * $SourceDupBlockX > count(*)
         |       OR count(*) FILTER (n_tokens < ${text.TextAnalysis.GateMinWords})
         |            * $SourceShortBlockX > count(*) AS INTEGER) AS blocked
         |FROM d GROUP BY 1 ORDER BY source""".stripMargin,
    "docs_source_cap" ->
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS BIGINT)
         |      AS n_tokens,
         |    md5(CAST(doc_id AS VARCHAR)) AS rk
         |  FROM documents),
         |c AS (
         |  SELECT *, sum(n_tokens) OVER (PARTITION BY source ORDER BY rk, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM d),
         |k AS (SELECT *,
         |        CASE WHEN cum - n_tokens < $SourceCapTokens THEN 1 ELSE 0 END AS kept
         |      FROM c)
         |SELECT source,
         |  count(*) AS n_before,
         |  CAST(sum(n_tokens) AS BIGINT) AS tokens_before,
         |  CAST(sum(kept) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN kept = 1 THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept
         |FROM k GROUP BY 1 ORDER BY source""".stripMargin,
    "docs_cross_source_dup" ->
      s"""WITH syn AS $sourcedDocsSql,
         |hs AS (SELECT DISTINCT md5(text) AS h, source FROM syn),
         |good AS (SELECT h FROM hs GROUP BY h
         |         HAVING count(*) BETWEEN 2 AND $SourceMaxSyndication)
         |SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
         |FROM hs a
         |JOIN good g ON a.h = g.h
         |JOIN hs b ON a.h = b.h AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin,
    "docs_pipeline_e2e" ->
      s"""WITH docs AS ${dedup.Dedup.augmentedSql},
         |${qualityGateSql("docs")},
         |kept AS (
         |  SELECT d.doc_id, d.text FROM docs d JOIN gate USING (doc_id) WHERE keep = 1),
         |canon AS (
         |  SELECT min(doc_id) AS doc_id
         |  FROM (SELECT doc_id, md5(${util.Norm.normalizeSql("text")}) AS h FROM kept)
         |  GROUP BY h),
         |clean AS (SELECT k.doc_id, k.text FROM kept k JOIN canon USING (doc_id)),
         |pd AS (
         |  SELECT doc_id,
         |    CAST(len(string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+')) AS BIGINT) AS n_tokens,
         |    doc_id % 32 AS bucket,
         |    md5(CAST(doc_id AS VARCHAR)) AS rk
         |  FROM clean),
         |pc AS (
         |  SELECT *, sum(n_tokens) OVER (PARTITION BY bucket ORDER BY rk, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM pd),
         |p AS (SELECT *, CAST(floor((cum - n_tokens) / 2000) AS BIGINT) AS shard_idx FROM pc)
         |SELECT (SELECT count(*) FROM docs) AS n_raw,
         |       (SELECT count(*) FROM kept) AS n_kept,
         |       (SELECT count(*) FROM p) AS n_unique,
         |       (SELECT CAST(sum(n_tokens) AS BIGINT) FROM p) AS sum_tokens,
         |       (SELECT count(*) FROM (SELECT DISTINCT bucket, shard_idx FROM p)) AS n_shards""".stripMargin,
    "text_top_ngrams" ->
      s"""SELECT ngram, count(*) AS df FROM (
         |  SELECT doc_id, unnest(${dedup.Dedup.shinglesSql("text")}) AS ngram
         |  FROM documents)
         |GROUP BY ngram ORDER BY df DESC, ngram LIMIT 20""".stripMargin,
    // The sketch is a candidate GENERATOR; the verified output is the
    // exact top-20, so the oracle is the plain exact recount — any
    // candidate the sketch missed would surface as a hash mismatch here.
    "text_heavy_hitters" ->
      s"""WITH w AS (
         |  SELECT unnest(string_split(${util.Norm.normalizeSql("text")}, ' ')) AS word
         |  FROM documents)
         |SELECT word, count(*) AS n_occurrences FROM w WHERE word <> ''
         |GROUP BY word ORDER BY n_occurrences DESC, word LIMIT 20""".stripMargin,
    // Replays the Count-Min sketch CELL-FOR-CELL: every word's counts
    // land in the same md5-derived buckets the native update loop fills,
    // per-cell totals are summed, and each top word's estimate is the min
    // over its depth cells — the sketch semantics as SQL. Deterministic
    // because the bucket hash is the shared md5→long contract.
    "text_cms_freq" ->
      s"""WITH w AS (
         |  SELECT unnest(string_split(${util.Norm.normalizeSql("text")}, ' ')) AS word
         |  FROM documents),
         |wf AS (SELECT word, count(*) AS n FROM w WHERE word <> '' GROUP BY 1),
         |jj AS (SELECT unnest(range(0, 4)) AS j),
         |b AS (SELECT word, n, j,
         |        CAST(concat('0x', substring(md5(concat(CAST(j AS VARCHAR), ':', word)), 1, 8))
         |             AS BIGINT) % 64 AS bkt
         |      FROM wf CROSS JOIN jj),
         |cells AS (SELECT j, bkt, CAST(sum(n) AS BIGINT) AS cnt FROM b GROUP BY 1, 2),
         |top AS (SELECT word, n FROM wf ORDER BY n DESC, word LIMIT 20)
         |SELECT t.word, t.n AS n_exact, min(c.cnt) AS n_est
         |FROM top t JOIN b ON b.word = t.word JOIN cells c ON c.j = b.j AND c.bkt = b.bkt
         |GROUP BY t.word, t.n
         |ORDER BY n_exact DESC, t.word""".stripMargin,
    "events_kmv_distinct" ->
      s"""WITH e AS (SELECT event_type, CAST(user_id AS VARCHAR) AS u FROM events),
         |hh AS (SELECT DISTINCT event_type,
         |         CAST(concat('0x', substring(md5(concat('kmv:', u)), 1, 8)) AS BIGINT) AS h
         |       FROM e),
         |r AS (SELECT event_type, h,
         |        row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         |        count(*) OVER (PARTITION BY event_type) AS n_dh
         |      FROM hh),
         |ex AS (SELECT event_type, count(DISTINCT u) AS n_exact FROM e GROUP BY 1),
         |kt AS (SELECT event_type,
         |         max(CASE WHEN rn = 256 THEN h END) AS h_k,
         |         CAST(least(max(n_dh), 256) AS BIGINT) AS kmv_size
         |       FROM r WHERE rn <= 256 GROUP BY 1),
         |typed AS (
         |  SELECT concat('type:', kt.event_type) AS grain, ex.n_exact, kt.kmv_size,
         |    CASE WHEN kt.kmv_size < 256 THEN CAST(kt.kmv_size AS DOUBLE)
         |         ELSE (255 * 4294967296.0) / h_k END AS n_est
         |  FROM kt JOIN ex ON kt.event_type = ex.event_type),
         |uh AS (SELECT DISTINCT h FROM hh),
         |ur AS (SELECT h, row_number() OVER (ORDER BY h) AS rn,
         |         count(*) OVER () AS n_dh FROM uh),
         |ua AS (SELECT max(CASE WHEN rn = 256 THEN h END) AS h_k,
         |         CAST(least(max(n_dh), 256) AS BIGINT) AS kmv_size
         |       FROM ur WHERE rn <= 256),
         |uex AS (SELECT count(DISTINCT u) AS n_exact FROM e)
         |SELECT * FROM (
         |  SELECT grain, n_exact, kmv_size, n_est FROM typed
         |  UNION ALL
         |  SELECT '__union__' AS grain, uex.n_exact, ua.kmv_size,
         |    CASE WHEN ua.kmv_size < 256 THEN CAST(ua.kmv_size AS DOUBLE)
         |         ELSE (255 * 4294967296.0) / ua.h_k END AS n_est
         |  FROM ua CROSS JOIN uex)
         |ORDER BY grain""".stripMargin,
    "events_kmv_intersect" ->
      s"""WITH e AS (SELECT event_type, CAST(user_id AS VARCHAR) AS u FROM events
         |           WHERE event_type IN ('click', 'purchase')),
         |hh AS (SELECT DISTINCT event_type,
         |         CAST(concat('0x', substring(md5(concat('kmv:', u)), 1, 8)) AS BIGINT) AS h
         |       FROM e),
         |r AS (SELECT event_type, h,
         |        row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         |        count(*) OVER (PARTITION BY event_type) AS n_dh
         |      FROM hh),
         |kt AS (SELECT event_type,
         |         max(CASE WHEN rn = 256 THEN h END) AS h_k,
         |         CAST(least(max(n_dh), 256) AS BIGINT) AS kmv_size
         |       FROM r WHERE rn <= 256 GROUP BY 1),
         |est AS (SELECT event_type,
         |          CASE WHEN kmv_size < 256 THEN CAST(kmv_size AS DOUBLE)
         |               ELSE (255 * 4294967296.0) / h_k END AS n_est
         |        FROM kt),
         |uh AS (SELECT DISTINCT h FROM hh),
         |ur AS (SELECT h, row_number() OVER (ORDER BY h) AS rn,
         |         count(*) OVER () AS n_dh FROM uh),
         |ua AS (SELECT max(CASE WHEN rn = 256 THEN h END) AS h_k,
         |         CAST(least(max(n_dh), 256) AS BIGINT) AS kmv_size
         |       FROM ur WHERE rn <= 256),
         |ue AS (SELECT CASE WHEN kmv_size < 256 THEN CAST(kmv_size AS DOUBLE)
         |              ELSE (255 * 4294967296.0) / h_k END AS est_union FROM ua),
         |ex AS (SELECT count(*) AS n_exact_intersect FROM (
         |         SELECT u FROM e WHERE event_type = 'click'
         |         INTERSECT
         |         SELECT u FROM e WHERE event_type = 'purchase'))
         |SELECT ex.n_exact_intersect,
         |  a.n_est AS est_clicks, b.n_est AS est_purchases, ue.est_union,
         |  greatest(0.0, a.n_est + b.n_est - ue.est_union) AS est_intersect
         |FROM (SELECT n_est FROM est WHERE event_type = 'click') a
         |CROSS JOIN (SELECT n_est FROM est WHERE event_type = 'purchase') b
         |CROSS JOIN ue CROSS JOIN ex""".stripMargin,
    "docs_lexical_score" ->
      s"""WITH w AS (
         |  SELECT doc_id,
         |    unnest(string_split(${util.Norm.normalizeSql("text")}, ' ')) AS word
         |  FROM documents),
         |w2 AS (SELECT DISTINCT doc_id, word FROM w WHERE word <> ''),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |model AS (
         |  SELECT word,
         |    CAST(floor(ln(CAST(n_docs AS DOUBLE) / df) * 1e6 + 0.5) AS BIGINT) AS w_q6
         |  FROM (SELECT word, count(*) AS df FROM w2 GROUP BY 1) CROSS JOIN n
         |  WHERE df >= 2)
         |SELECT doc_id, count(*) AS n_features,
         |  count(m.w_q6) AS n_matched,
         |  CAST(sum(coalesce(m.w_q6, 0)) AS BIGINT) AS score_q6_sum,
         |  CASE WHEN count(m.w_q6) = 0 THEN NULL
         |       ELSE CAST(CAST(sum(coalesce(m.w_q6, 0)) AS BIGINT) AS DOUBLE)
         |            / count(m.w_q6) END AS mean_score_q6
         |FROM w2 LEFT JOIN model m USING (word)
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "text_pmi_bigrams" ->
      s"""WITH ws AS (
         |  SELECT string_split(${util.Norm.normalizeSql("text")}, ' ') AS w FROM documents),
         |inst AS (
         |  SELECT w[i] AS w1, w[i + 1] AS w2
         |  FROM (SELECT w, unnest(CASE WHEN len(w) >= 2 THEN range(1, len(w))
         |                              ELSE [] END) AS i
         |        FROM ws)
         |  WHERE w[i] <> '' AND w[i + 1] <> ''),
         |n AS (SELECT count(*) AS n_bigrams FROM inst),
         |c1 AS (SELECT w1, count(*) AS c1 FROM inst GROUP BY 1),
         |c2 AS (SELECT w2, count(*) AS c2 FROM inst GROUP BY 1),
         |cj AS (SELECT w1, w2, count(*) AS c12 FROM inst GROUP BY 1, 2 HAVING count(*) >= 5)
         |SELECT w1, w2, c12,
         |  CAST(floor(ln((CAST(c12 AS DOUBLE) * n_bigrams) /
         |    (CAST(c1 AS DOUBLE) * c2)) * 1e6 + 0.5) AS BIGINT) / 1e6 AS pmi
         |FROM cj JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN n
         |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin,
    "text_tokens" ->
      s"""${text.TextAnalysis.tokenStatsSql("documents", "doc_id", "text")}
         |ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      s"""${text.TextAnalysis.qualityScoreSql("documents", "doc_id", "text")}
         |ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      s"""${text.TextAnalysis.fingerprintsSql("documents", "doc_id", "text")}
         |ORDER BY doc_id""".stripMargin,
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
    "dedup_embedding_cosine" ->
      s"""WITH aug AS ${sim.Similarity.augmentedSql},
         |${sim.Similarity.cosinePairsSql("aug", 0.95)}
         |SELECT id_a, id_b, sim FROM pairs
         |ORDER BY id_a, id_b""".stripMargin,
    "dedup_embedding_clusters" ->
      s"""WITH aug AS ${sim.Similarity.augmentedSql},
         |${sim.Similarity.cosinePairsSql("aug", 0.95)},
         |${dedup.Dedup.clustersSql("(SELECT id AS doc_id FROM aug)", "pairs")}
         |SELECT doc_id, cluster_id,
         |  CAST(doc_id = cluster_id AS INTEGER) AS is_canonical
         |FROM clusters ORDER BY doc_id""".stripMargin,
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
    "text_bigram_logprob" ->
      s"""WITH ws AS (
         |  SELECT doc_id, string_split(${util.Norm.normalizeSql("text")}, ' ') AS w
         |  FROM documents),
         |inst AS (
         |  SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
         |  FROM (SELECT doc_id, w, unnest(CASE WHEN len(w) >= 2 THEN range(1, len(w))
         |                                      ELSE [] END) AS i
         |        FROM ws)
         |  WHERE w[i] <> '' AND w[i + 1] <> ''),
         |tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM inst GROUP BY 1, 2, 3),
         |cj AS (SELECT w1, w2, count(*) AS c12 FROM inst GROUP BY 1, 2),
         |c1 AS (SELECT w1, count(*) AS c1 FROM inst GROUP BY 1)
         |SELECT t.doc_id,
         |  CAST(sum(t.tf) AS BIGINT) AS n_bigrams,
         |  (CAST(sum(t.tf * CAST(floor(-ln(CAST(j.c12 AS DOUBLE) / p.c1) * 1e4 + 0.5) AS BIGINT)) AS BIGINT) / 1e4)
         |    / CAST(sum(t.tf) AS BIGINT) AS avg_neg_logprob
         |FROM tf t JOIN cj j USING (w1, w2) JOIN c1 p USING (w1)
         |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    "idx_null_handling" ->
      """SELECT c_custkey,
        |  COALESCE(CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_acctbal END, -1.0) AS bal_filled,
        |  COALESCE(CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_acctbal END, 0.0) AS bal_coalesced,
        |  COALESCE(CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_name END, '') AS name_defaulted
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "docs_chunk_dedup" ->
      s"""WITH docs AS ${dedup.Dedup.augmentedSql},
         |w AS (SELECT doc_id,
         |        list_filter(string_split(${util.Norm.normalizeSql("text")}, ' '),
         |                    x -> x <> '') AS ws
         |      FROM docs),
         |ch0 AS (
         |  SELECT doc_id, ws,
         |    unnest(range(0, greatest(CAST(ceil(len(ws) / 10.0) AS BIGINT), 1))) AS i
         |  FROM w),
         |ch AS (
         |  SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
         |    array_to_string(ws[i*10 + 1 : i*10 + 10], ' ') AS chunk
         |  FROM ch0),
         |chh AS (SELECT doc_id, chunk_idx, chunk, md5(chunk) AS h FROM ch),
         |freq AS (SELECT h, count(DISTINCT doc_id) AS df FROM chh GROUP BY h)
         |SELECT c.doc_id, count(*) AS n_chunks,
         |  CAST(sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
         |  md5(coalesce(
         |    string_agg(CASE WHEN f.df < 2 THEN c.chunk END, ' ' ORDER BY c.chunk_idx),
         |    '')) AS kept_md5
         |FROM chh c JOIN freq f USING (h)
         |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
    "docs_chunk_sliding" ->
      s"""WITH w AS (SELECT doc_id,
         |        list_filter(string_split(${util.Norm.normalizeSql("text")}, ' '),
         |                    x -> x <> '') AS ws
         |      FROM documents),
         |ch0 AS (
         |  SELECT doc_id, ws,
         |    unnest(range(0,
         |      1 + CAST(ceil(greatest(len(ws) - 12, 0) / 6.0) AS BIGINT))) AS i
         |  FROM w)
         |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
         |  CAST(len(ws[i*6 + 1 : i*6 + 12]) AS BIGINT) AS n_tokens,
         |  md5(array_to_string(ws[i*6 + 1 : i*6 + 12], ' ')) AS chunk_md5
         |FROM ch0 ORDER BY doc_id, chunk_idx""".stripMargin,
    "orders_customer_revenue" ->
      s"""SELECT c.c_custkey, c.c_name, n.n_name,
         |  count(DISTINCT o.o_orderkey) AS n_orders,
         |  ${util.Stable.exactSumAtSql(
               s"${util.Stable.dec2Sql("l.l_extendedprice")} * (1 - ${util.Stable.rate2Sql("l.l_discount")})", 4)} AS revenue
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, c.c_custkey
         |LIMIT 50""".stripMargin,
    // The oracle keeps the window form too: the same one-pass per-part
    // partials, and the 5·q·cnt < sum predicate is exact decimal on both
    // engines (no division anywhere near the boundary).
    "part_small_qty_revenue" ->
      s"""WITH li AS (
         |  SELECT l_partkey, CAST(l_quantity AS DECIMAL(38,8)) AS q,
         |    l_extendedprice AS px,
         |    sum(CAST(l_quantity AS DECIMAL(38,8)))
         |      OVER (PARTITION BY l_partkey) AS sum_q,
         |    count(*) OVER (PARTITION BY l_partkey) AS cnt
         |  FROM lineitem),
         |small AS (SELECT * FROM li WHERE q * 5 * cnt < sum_q)
         |SELECT p.p_brand, count(*) AS n_small,
         |  ${util.Stable.exactSumSql("s.px")} AS revenue
         |FROM small s JOIN part p ON s.l_partkey = p.p_partkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Decimal-exact mirror of the Spark side: dec2/rate2 operand casts
    // BEFORE any arithmetic, sums emitted at their TRUE scale (see
    // Stable.exactSumAt — a (38,8) sum of a ~3e9 total has 18
    // significant digits and the two engines' decimal→double casts can
    // land on adjacent doubles).
    "tpch_q1" ->
      s"""WITH t AS (
         |  SELECT l_returnflag, l_linestatus, l_quantity, l_discount,
         |    ${util.Stable.dec2Sql("l_extendedprice")} AS px,
         |    ${util.Stable.rate2Sql("l_discount")} AS disc,
         |    ${util.Stable.rate2Sql("l_tax")} AS tax
         |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00')
         |SELECT l_returnflag, l_linestatus,
         |  ${util.Stable.exactSumAtSql("l_quantity", 0)} AS sum_qty,
         |  ${util.Stable.exactSumAtSql("px", 2)} AS sum_base_price,
         |  ${util.Stable.exactSumAtSql("px * (1 - disc)", 4)} AS sum_disc_price,
         |  ${util.Stable.exactSumAtSql("px * (1 - disc) * (1 + tax)", 6)} AS sum_charge,
         |  ${util.Stable.exactAvgAtSql("l_quantity", 0)} AS avg_qty,
         |  ${util.Stable.exactAvgAtSql("px", 2)} AS avg_price,
         |  ${util.Stable.exactAvgAtSql("l_discount", 2)} AS avg_disc,
         |  count(*) AS count_order
         |FROM t
         |GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "tpch_q3" ->
      s"""SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
         |  ${util.Stable.exactSumAtSql(
               s"${util.Stable.dec2Sql("l.l_extendedprice")} * (1 - ${util.Stable.rate2Sql("l.l_discount")})", 4)} AS revenue
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |WHERE c.c_mktsegment = 'BUILDING'
         |  AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
         |  AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,
    "tpch_q6" ->
      s"""SELECT
         |  ${util.Stable.exactSumAtSql(
               s"${util.Stable.dec2Sql("l_extendedprice")} * ${util.Stable.rate2Sql("l_discount")}", 4)} AS revenue,
         |  count(*) AS n_rows
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.02 AND 0.04
         |  AND l_quantity < 24""".stripMargin,
    "orders_per_customer_distribution" ->
      """WITH pc AS (
        |  SELECT o_custkey, count(*) AS c_count FROM orders
        |  WHERE o_orderpriority <> '1-URGENT' GROUP BY 1)
        |SELECT c_count, count(*) AS n_custs
        |FROM (SELECT coalesce(pc.c_count, 0) AS c_count
        |      FROM customer c LEFT JOIN pc ON c.c_custkey = pc.o_custkey)
        |GROUP BY 1 ORDER BY n_custs DESC, c_count DESC""".stripMargin,
    "orders_priority_semijoin" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "orders_large_baskets" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    sum(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 250)
        |SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
        |  o.o_totalprice, CAST(total_qty AS DOUBLE) AS total_qty
        |FROM big JOIN orders o ON big.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 20""".stripMargin,
    "part_revenue_share" ->
      s"""WITH per_part AS (
         |  SELECT l_partkey,
         |    sum(CAST(${util.Stable.dec2Sql("l_extendedprice")} * (1 - ${util.Stable.rate2Sql("l_discount")})
         |      AS DECIMAL(38,8))) AS part_rev
         |  FROM lineitem GROUP BY 1),
         |tot AS (SELECT sum(part_rev) AS total_rev, count(*) AS n_parts FROM per_part)
         |SELECT p.p_partkey, p.p_name,
         |  CAST(CAST(part_rev AS DECIMAL(38,4)) AS DOUBLE) AS revenue
         |FROM per_part JOIN part p ON l_partkey = p.p_partkey CROSS JOIN tot
         |WHERE part_rev * n_parts * 10 > total_rev * 12
         |ORDER BY revenue DESC, p.p_partkey""".stripMargin,
    "orders_sole_late_supplier" ->
      """WITH li AS (
        |  SELECT l.l_orderkey, l.l_suppkey,
        |    CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        |         THEN 1 ELSE 0 END AS late
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |per_order AS (
        |  SELECT l_orderkey,
        |    min(CASE WHEN late = 1 THEN l_suppkey END) AS sole_late_supp
        |  FROM li GROUP BY 1
        |  HAVING count(DISTINCT l_suppkey) >= 2
        |     AND count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) = 1)
        |SELECT s.s_suppkey, s.s_name, count(*) AS n_orders
        |FROM per_order p JOIN supplier s ON p.sole_late_supp = s.s_suppkey
        |GROUP BY 1, 2
        |ORDER BY n_orders DESC, s_suppkey LIMIT 50""".stripMargin,
    "text_word_entropy" ->
      s"""WITH w AS (
         |  SELECT doc_id, unnest(string_split(${util.Norm.normalizeSql("text")}, ' ')) AS word
         |  FROM documents),
         |w2 AS (SELECT * FROM w WHERE word <> ''),
         |c AS (SELECT doc_id, word, count(*) AS n FROM w2 GROUP BY 1, 2),
         |d AS (SELECT doc_id,
         |        CAST(sum(n) AS BIGINT) AS n_words,
         |        count(*) AS n_distinct_words,
         |        CAST(sum(n * CAST(floor(ln(n) * 1e4 + 0.5) AS BIGINT)) AS BIGINT)
         |          AS sum_n_ln_n_q4
         |      FROM c GROUP BY doc_id)
         |SELECT doc_id, n_words, n_distinct_words, sum_n_ln_n_q4,
         |  (n_words * CAST(floor(ln(n_words) * 1e4 + 0.5) AS BIGINT) - sum_n_ln_n_q4)
         |    / (n_words * 1e4) AS entropy
         |FROM d ORDER BY doc_id""".stripMargin,
    "docs_mix_schedule" ->
      """WITH ranked AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS lang_rank,
        |    CASE lang WHEN 'en' THEN 4 WHEN 'de' THEN 2
        |              WHEN 'fr' THEN 2 ELSE 1 END AS w
        |  FROM documents),
        |v AS (SELECT doc_id, lang, CAST(lang_rank AS BIGINT) AS lang_rank,
        |        CAST(lang_rank AS DOUBLE) / w AS virtual
        |      FROM ranked)
        |SELECT CAST(row_number() OVER (ORDER BY virtual, lang, doc_id) AS INTEGER)
        |    AS position,
        |  doc_id, lang, lang_rank, virtual
        |FROM v ORDER BY position LIMIT 200""".stripMargin,
    "events_incremental_agg" ->
      s"""WITH ev AS (
         |  SELECT epoch_ns(ts) // 86400000000000 AS day_idx, event_type, value
         |  FROM events)
         |SELECT day_idx, event_type, count(*) AS n_events,
         |  ${util.Stable.exactSumSql("value")} AS sum_value,
         |  min(value) AS min_value, max(value) AS max_value
         |FROM ev GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "graph_pagerank" -> {
      // Both directions of the distinct bipartite edge set; the
      // iteration CTEs come from the same generator (constants shared
      // with the Spark loop by construction).
      val und =
        """SELECT DISTINCT CAST(l_partkey AS BIGINT) * 2 AS src,
          |                CAST(l_suppkey AS BIGINT) * 2 + 1 AS dst FROM lineitem""".stripMargin
      val edgesSql =
        s"""SELECT src, dst FROM ($und) fwd
           |UNION ALL
           |SELECT dst AS src, src AS dst FROM ($und) rev""".stripMargin
      s"""${graph.PageRank.ranksSql(edgesSql, iters = 3)}
         |SELECT node, node % 2 AS is_supplier, pr
         |FROM r3 ORDER BY pr DESC, node LIMIT 100""".stripMargin
    },
    "graph_pagerank_directed" -> {
      val edgesSql =
        """SELECT DISTINCT CAST(l_partkey AS BIGINT) * 2 AS src,
          |                CAST(l_suppkey AS BIGINT) * 2 + 1 AS dst FROM lineitem""".stripMargin
      s"""${graph.PageRank.ranksDirectedSql(edgesSql, iters = 3)}
         |SELECT node, node % 2 AS is_supplier, pr
         |FROM r3 ORDER BY pr DESC, node LIMIT 100""".stripMargin
    },
    "graph_triangles" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |edges AS (
        |  SELECT a.p AS u, b.p AS v
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (
        |  SELECT n, count(*) AS dg
        |  FROM (SELECT u AS n FROM edges UNION ALL SELECT v FROM edges)
        |  GROUP BY 1),
        |pi AS (SELECT n, dg * 10000000000 + n AS pi FROM deg),
        |o AS (
        |  SELECT CASE WHEN pu.pi < pv.pi THEN e.u ELSE e.v END AS src,
        |         CASE WHEN pu.pi < pv.pi THEN e.v ELSE e.u END AS dst,
        |         greatest(pu.pi, pv.pi) AS pi_dst
        |  FROM edges e JOIN pi pu ON pu.n = e.u JOIN pi pv ON pv.n = e.v),
        |w AS (
        |  SELECT e1.dst AS b, e2.dst AS c
        |  FROM o e1 JOIN o e2 ON e1.src = e2.src AND e1.pi_dst < e2.pi_dst),
        |t AS (SELECT count(*) AS n_triangles
        |      FROM w JOIN o ON o.src = w.b AND o.dst = w.c)
        |SELECT (SELECT count(*) FROM deg) AS n_nodes,
        |  (SELECT count(*) FROM edges) AS n_edges,
        |  (SELECT count(*) FROM w) AS n_wedges,
        |  (SELECT n_triangles FROM t) AS n_triangles""".stripMargin,
    "graph_kcore" -> {
      // Fixed 10-round unroll mirroring the Spark loop (the pagerank
      // oracle discipline — iteration count generated next to the loop
      // so they cannot drift).
      // MATERIALIZED is load-bearing: DuckDB inlines plain CTEs per
      // reference, and each round references its predecessor four times
      // — 10 inlined rounds would expand 4^10-fold and never finish.
      val rounds = (1 to 6).map { i =>
        s"""n$i AS MATERIALIZED (
           |  SELECT node FROM (
           |    SELECT e.u AS node FROM edges e
           |    WHERE e.u IN (SELECT node FROM n${i - 1})
           |      AND e.v IN (SELECT node FROM n${i - 1})
           |    UNION ALL
           |    SELECT e.v FROM edges e
           |    WHERE e.u IN (SELECT node FROM n${i - 1})
           |      AND e.v IN (SELECT node FROM n${i - 1}))
           |  GROUP BY 1 HAVING count(*) >= 3)""".stripMargin
      }.mkString(",\n")
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         |edges AS (
         |  SELECT a.p AS u, b.p AS v
         |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |n0 AS (
         |  SELECT n AS node
         |  FROM (SELECT u AS n FROM edges UNION ALL SELECT v FROM edges)
         |  GROUP BY 1 HAVING count(*) >= 3),
         |$rounds
         |SELECT node, count(*) AS core_degree FROM (
         |  SELECT e.u AS node FROM edges e
         |  WHERE e.u IN (SELECT node FROM n6) AND e.v IN (SELECT node FROM n6)
         |  UNION ALL
         |  SELECT e.v FROM edges e
         |  WHERE e.u IN (SELECT node FROM n6) AND e.v IN (SELECT node FROM n6))
         |GROUP BY 1 ORDER BY node""".stripMargin
    },
    "graph_common_neighbors" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |edges AS (
        |  SELECT a.p AS u, b.p AS v
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |adj AS (SELECT u AS c, v AS nb FROM edges
        |        UNION ALL SELECT v, u FROM edges),
        |cd AS (SELECT c, count(*) AS dg FROM adj GROUP BY 1),
        |sm AS (SELECT adj.c, adj.nb FROM adj JOIN cd USING (c) WHERE dg <= 64),
        |cn AS (
        |  SELECT x.nb AS u, y.nb AS v, count(*) AS n_common
        |  FROM sm x JOIN sm y ON x.c = y.c AND x.nb < y.nb
        |  GROUP BY 1, 2)
        |SELECT cn.u, cn.v, cn.n_common
        |FROM cn LEFT JOIN edges e ON cn.u = e.u AND cn.v = e.v
        |WHERE e.u IS NULL
        |ORDER BY cn.n_common DESC, cn.u, cn.v LIMIT 20""".stripMargin,
    "docs_table_diff" ->
      """WITH snap_a AS (
        |  SELECT doc_id, md5(text) AS h_old FROM documents WHERE doc_id % 5 <> 1),
        |snap_b AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 11 = 3 THEN text || ' [rev2]' ELSE text END)
        |      AS h_new
        |  FROM documents WHERE doc_id % 7 <> 2),
        |j AS (
        |  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
        |    CASE WHEN a.h_old IS NULL THEN 'added'
        |         WHEN b.h_new IS NULL THEN 'removed'
        |         WHEN a.h_old <> b.h_new THEN 'changed'
        |         ELSE 'same' END AS status
        |  FROM snap_a a FULL JOIN snap_b b ON a.doc_id = b.doc_id)
        |SELECT status, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // State algebra replay of the three commits: as-of-2 = base minus
    // tombstoned ids with %5 rows rewritten; as-of-3 resurrects the even
    // tombstoned ids. Matching checksums prove the store's
    // latest-wins/tombstone fold reconstructs each version exactly.
    "docs_snapshot_asof" ->
      """WITH d AS (SELECT doc_id, text FROM documents),
        |v1 AS (SELECT doc_id, text FROM d),
        |v2 AS (SELECT doc_id,
        |         CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]' ELSE text END AS text
        |       FROM d WHERE NOT (doc_id % 11 = 0 AND doc_id % 5 <> 0)),
        |v3 AS (SELECT * FROM v2
        |       UNION ALL
        |       SELECT doc_id, text || ' [rev3]' AS text FROM d
        |       WHERE doc_id % 11 = 0 AND doc_id % 5 <> 0 AND doc_id % 2 = 0),
        |snaps AS (
        |  SELECT 1 AS version, * FROM v1
        |  UNION ALL SELECT 2, * FROM v2
        |  UNION ALL SELECT 3, * FROM v3)
        |SELECT version, count(*) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |  CAST(sum(CAST(concat('0x',
        |        substring(md5(concat(CAST(doc_id AS VARCHAR), ':', text)), 1, 10))
        |      AS BIGINT)) AS BIGINT) AS content_sum
        |FROM snaps GROUP BY version ORDER BY version""".stripMargin,
    "docs_merge_upsert" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |src AS (
        |  SELECT doc_id, upper(text) AS new_text, 'u' AS op
        |  FROM base WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id, NULL AS new_text, 'd' AS op
        |  FROM base WHERE doc_id % 10 = 1
        |  UNION ALL
        |  SELECT doc_id + 5000000000000 AS doc_id, text || ' v2' AS new_text,
        |    'i' AS op
        |  FROM base WHERE doc_id % 10 = 2),
        |merged AS (
        |  SELECT COALESCE(b.doc_id, s.doc_id) AS doc_id,
        |    CASE WHEN s.op = 'd' THEN 'deleted'
        |         WHEN s.op = 'u' THEN 'updated'
        |         WHEN s.op = 'i' THEN 'inserted'
        |         ELSE 'kept' END AS action,
        |    CASE WHEN s.op IN ('u', 'i') THEN s.new_text ELSE b.text END AS out_text
        |  FROM base b FULL JOIN src s ON b.doc_id = s.doc_id)
        |SELECT action, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN action = 'deleted' THEN 0
        |    ELSE CAST(concat('0x',
        |      substring(md5(CAST(doc_id AS VARCHAR) || ':' || out_text), 1, 10))
        |      AS BIGINT) END) AS BIGINT) AS content_sum
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_jsonl_roundtrip" ->
      s"""SELECT event_type, count(*) AS n_events,
         |  CAST(sum(CAST(floor(value * 1e8 + 0.5) AS BIGINT)) AS BIGINT)
         |    AS sum_value_q8,
         |  min(epoch_us(ts)) AS min_ts_us, max(epoch_us(ts)) AS max_ts_us,
         |  CAST(sum(user_id) AS BIGINT) AS user_id_sum
         |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    "events_winsorize" ->
      """WITH ev AS (
        |  SELECT event_type, event_id,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |ranked AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY event_type ORDER BY vq, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM ev),
        |cuts AS (
        |  SELECT event_type,
        |    min(CASE WHEN rn = (n * 5 + 99) // 100 THEN vq END) AS p05,
        |    min(CASE WHEN rn = (n * 95 + 99) // 100 THEN vq END) AS p95
        |  FROM ranked GROUP BY 1)
        |SELECT r.event_type, count(*) AS n_events, c.p05, c.p95,
        |  CAST(sum(CASE WHEN r.vq < c.p05 OR r.vq > c.p95 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_clamped,
        |  CAST(sum(least(greatest(r.vq, c.p05), c.p95)) AS BIGINT)
        |    AS sum_winsorized_q6
        |FROM ranked r JOIN cuts c USING (event_type)
        |GROUP BY r.event_type, c.p05, c.p95 ORDER BY r.event_type""".stripMargin,
    "text_inverted_index" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(${util.Norm.normalizeSql("text")}, ' ') AS ws
         |  FROM documents),
         |ix AS (
         |  SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
         |  FROM t WHERE len(ws) >= 2),
         |b AS (
         |  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i + 1] AS term
         |  FROM ix WHERE ws[i] <> '' AND ws[i + 1] <> ''),
         |surviving AS (
         |  SELECT term, count(*) AS df FROM b GROUP BY 1
         |  HAVING count(*) BETWEEN 2 AND 50)
         |SELECT b.term, CAST(s.df AS BIGINT) AS df,
         |  string_agg(CAST(b.doc_id AS VARCHAR), '|' ORDER BY b.doc_id) AS postings
         |FROM b JOIN surviving s USING (term)
         |GROUP BY b.term, s.df ORDER BY b.term""".stripMargin,
    "events_grouping_sets" ->
      """WITH ev AS (
        |  SELECT event_type, (epoch_ns(ts) // 86400000000000) % 7 AS dow, value
        |  FROM events)
        |SELECT event_type, dow,
        |  CAST(GROUPING(event_type, dow) AS BIGINT) AS gid,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(38,8))) AS DOUBLE) AS sum_value
        |FROM ev GROUP BY GROUPING SETS ((event_type, dow), (event_type), (dow))
        |ORDER BY gid, event_type, dow""".stripMargin,
    "graph_reachability" ->
      """WITH RECURSIVE op AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |edges AS (
        |  SELECT a.p AS u, b.p AS v
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |adj AS (SELECT u AS src, v AS dst FROM edges
        |        UNION ALL SELECT v, u FROM edges),
        |r(n, hop) AS (
        |  SELECT DISTINCT src AS n, 0 AS hop FROM adj WHERE src % 97 = 0
        |  UNION ALL
        |  SELECT adj.dst, r.hop + 1 FROM r JOIN adj ON r.n = adj.src
        |  WHERE r.hop < 3)
        |SELECT hop, count(*) AS n_first_reached
        |FROM (SELECT n, min(hop) AS hop FROM r GROUP BY n)
        |GROUP BY hop ORDER BY hop""".stripMargin,
    "nation_supplier_roster" ->
      """SELECT n_name, count(*) AS n_suppliers,
        |  string_agg(s_name, '|' ORDER BY s_name) AS roster
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_users_except" ->
      """SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day_idx
        |FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT user_id, epoch_ns(ts) // 86400000000000
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id, day_idx""".stripMargin,
    "events_bag_setops" ->
      """WITH c AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day_idx
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day_idx
        |      FROM events WHERE event_type = 'purchase'),
        |ea AS (SELECT * FROM c EXCEPT ALL SELECT * FROM p),
        |ia AS (SELECT * FROM c INTERSECT ALL SELECT * FROM p)
        |SELECT * FROM (
        |  SELECT 'except_all' AS op, user_id, count(*) AS n_rows,
        |    count(DISTINCT day_idx) AS n_days FROM ea GROUP BY 2
        |  UNION ALL
        |  SELECT 'intersect_all', user_id, count(*),
        |    count(DISTINCT day_idx) FROM ia GROUP BY 2)
        |ORDER BY op, user_id""".stripMargin,
    "part_cheapest_suppliers" ->
      """WITH li AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(l_extendedprice AS DECIMAL(12,2)) AS price
        |  FROM lineitem),
        |mins AS (SELECT l_partkey AS mk, min(price) AS min_price
        |         FROM li GROUP BY 1)
        |SELECT l_partkey,
        |  count(DISTINCT l_suppkey) AS n_cheapest,
        |  min(l_suppkey) AS best_supp,
        |  CAST(min(min_price) AS DOUBLE) AS min_price
        |FROM li JOIN mins ON l_partkey = mk AND price = min_price
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_value_deciles" ->
      """WITH ev AS (
        |  SELECT event_type, event_id,
        |    CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |ranked AS (
        |  SELECT event_type, vq,
        |    ntile(10) OVER (PARTITION BY event_type ORDER BY vq, event_id) AS decile
        |  FROM ev)
        |SELECT event_type, CAST(decile AS INTEGER) AS decile,
        |  count(*) AS n_events, min(vq) AS min_vq, max(vq) AS max_vq,
        |  CAST(sum(vq) AS BIGINT) AS sum_vq
        |FROM ranked GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_window_suite" ->
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vq
        |  FROM events)
        |SELECT event_id, event_type, vq,
        |  CAST(rank() OVER ties AS INTEGER) AS rnk,
        |  CAST(dense_rank() OVER ties AS INTEGER) AS drnk,
        |  percent_rank() OVER ties AS prnk,
        |  cume_dist() OVER ties AS cdist,
        |  first_value(vq) OVER fullw AS first_vq,
        |  nth_value(vq, 2) OVER fullw AS second_vq,
        |  last_value(vq) OVER fullw AS last_vq
        |FROM ev
        |WINDOW ties AS (PARTITION BY event_type ORDER BY vq),
        |  fullw AS (PARTITION BY event_type ORDER BY vq, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_type, vq, event_id""".stripMargin,
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
    "docs_zscore_outliers" ->
      """WITH stats AS (
        |  SELECT lang, count(*) AS n,
        |    CAST(sum(n_chars) AS BIGINT) AS s,
        |    CAST(sum(n_chars * n_chars) AS BIGINT) AS ss
        |  FROM documents GROUP BY 1
        |  HAVING count(*) >= 2
        |    AND (CAST(sum(n_chars * n_chars) AS DOUBLE)
        |         - CAST(sum(n_chars) AS DOUBLE) * CAST(sum(n_chars) AS BIGINT)
        |           / count(*)) > 0.0),
        |z AS (
        |  SELECT d.doc_id, d.lang, d.n_chars,
        |    (d.n_chars - CAST(t.s AS DOUBLE) / t.n) /
        |      sqrt((t.ss - CAST(t.s AS DOUBLE) * t.s / t.n) / (t.n - 1)) AS z
        |  FROM documents d JOIN stats t USING (lang))
        |SELECT doc_id, lang, n_chars, printf('%.4e', z) AS z_sig
        |FROM z WHERE abs(z) > 1.5 ORDER BY doc_id""".stripMargin,
    "customer_rfm" ->
      """WITH cust AS (
        |  SELECT o_custkey,
        |    max(CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT))
        |      AS last_day,
        |    count(*) AS freq,
        |    sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
        |  FROM orders GROUP BY 1),
        |a AS (SELECT max(last_day) AS ref_day FROM cust),
        |sc AS (
        |  SELECT o_custkey, ref_day - last_day AS recency_days, freq, rev,
        |    ntile(5) OVER (ORDER BY last_day, o_custkey) AS r_score,
        |    ntile(5) OVER (ORDER BY freq, o_custkey) AS f_score,
        |    ntile(5) OVER (ORDER BY rev, o_custkey) AS m_score
        |  FROM cust CROSS JOIN a)
        |SELECT CAST(r_score * 100 + f_score * 10 + m_score AS INTEGER) AS segment,
        |  count(*) AS n_customers,
        |  CAST(CAST(sum(recency_days) AS BIGINT) AS DOUBLE) / count(*)
        |    AS avg_recency_days,
        |  CAST(sum(freq) AS BIGINT) AS n_orders,
        |  CAST(CAST(sum(rev) AS DECIMAL(38,2)) AS DOUBLE) AS revenue
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,
    "orders_basket_lift" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |sizes AS (
        |  SELECT l_orderkey FROM items GROUP BY 1
        |  HAVING count(*) BETWEEN 2 AND 20),
        |kept AS (SELECT i.l_orderkey, i.l_partkey
        |         FROM items i JOIN sizes s USING (l_orderkey)),
        |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM kept),
        |ic AS (SELECT l_partkey, count(*) AS n_item FROM kept GROUP BY 1),
        |p AS (
        |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_ab
        |  FROM kept a JOIN kept b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT part_a, part_b, n_ab, ia.n_item AS n_a, ib.n_item AS n_b,
        |  CAST(n_ab AS DOUBLE) / n_orders AS support,
        |  CAST(n_ab AS DOUBLE) / ia.n_item AS confidence,
        |  CAST(n_ab * n_orders AS DOUBLE) / (ia.n_item * ib.n_item) AS lift
        |FROM p
        |JOIN ic ia ON p.part_a = ia.l_partkey
        |JOIN ic ib ON p.part_b = ib.l_partkey
        |CROSS JOIN n
        |ORDER BY lift DESC, part_a, part_b LIMIT 20""".stripMargin,
    "events_anomaly_mad" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |med AS (
        |  SELECT event_type,
        |    CAST(round(quantile_cont(vq, 0.5) * 2) AS BIGINT) AS med2,
        |    count(*) AS n_events
        |  FROM ev GROUP BY 1),
        |dev AS (
        |  SELECT e.event_type, med2, n_events, abs(e.vq * 2 - med2) AS dev2
        |  FROM ev e JOIN med USING (event_type)),
        |mad AS (
        |  SELECT event_type,
        |    CAST(round(quantile_cont(dev2, 0.5) * 2) AS BIGINT) AS mad4
        |  FROM dev GROUP BY 1)
        |SELECT d.event_type, n_events,
        |  med2 / 2e6 AS median_value,
        |  mad4 / 4e6 AS mad_value,
        |  CAST(count(*) FILTER (WHERE dev2 * 10000 > mad4 * 22239) AS BIGINT)
        |    AS n_outliers,
        |  max(dev2) / 2e6 AS max_abs_dev
        |FROM dev d JOIN mad m USING (event_type)
        |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin,
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
    "events_chi2_independence" ->
      """WITH cells AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 % 7 AS dow,
        |    count(*) AS o
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
        |ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
        |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |         count(DISTINCT event_type) AS nr, count(DISTINCT dow) AS nc
        |       FROM cells),
        |t AS (
        |  SELECT n, nr, nc,
        |    CAST(floor((o - e) * (o - e) / e * 1e6 + 0.5) AS BIGINT) AS term_q
        |  FROM (SELECT cells.o, CAST(r * c AS DOUBLE) / n AS e, n, nr, nc
        |        FROM cells JOIN rt USING (event_type) JOIN ct USING (dow)
        |        CROSS JOIN nn))
        |SELECT n, CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
        |  CAST(sum(term_q) AS BIGINT) / 1e6 AS chi2,
        |  sqrt(CAST(sum(term_q) AS BIGINT) / 1e6
        |       / (n * least(nr - 1, nc - 1))) AS cramers_v
        |FROM t GROUP BY 1, nr, nc""".stripMargin,
    "events_cusum_shift" ->
      """WITH dc AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS t, count(*) AS d
        |        FROM dc GROUP BY 1),
        |sc AS (
        |  SELECT dc.event_type, day, t, d,
        |    abs(d * CAST(sum(c) OVER w AS BIGINT)
        |        - CAST(row_number() OVER w AS BIGINT) * t) AS stat
        |  FROM dc JOIN tot USING (event_type)
        |  WINDOW w AS (PARTITION BY dc.event_type ORDER BY day)),
        |b AS (SELECT event_type, max(stat) AS stat FROM sc GROUP BY 1)
        |SELECT s.event_type, d AS n_days, t AS total_events,
        |  min(day) AS shift_day, stat / CAST(d AS DOUBLE) AS max_abs_cusum
        |FROM sc s JOIN b USING (event_type, stat)
        |GROUP BY 1, 2, 3, stat ORDER BY 1""".stripMargin,
    "docs_bm25_topk" ->
      s"""WITH w AS (
         |  SELECT doc_id,
         |    unnest(string_split(${util.Norm.normalizeSql("text")}, ' ')) AS word
         |  FROM documents),
         |w2 AS (SELECT * FROM w WHERE word <> ''),
         |tf AS (SELECT doc_id, word, count(*) AS tf FROM w2 GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*) AS dl FROM w2 GROUP BY 1),
         |dfreq AS (SELECT word, count(DISTINCT doc_id) AS df FROM w2 GROUP BY 1),
         |qterms AS (SELECT word, df FROM dfreq ORDER BY df, word LIMIT 5),
         |corpus AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
         |           FROM dl),
         |scored AS (
         |  SELECT t.word, t.doc_id, t.tf, q.df, d.dl,
         |    (CAST(floor(ln((n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0) * 1e4
         |                + 0.5) AS BIGINT) / 1e4)
         |      * (t.tf * CAST(2.2 AS DOUBLE))
         |      / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl * n_docs / sum_dl))
         |      AS score
         |  FROM tf t JOIN qterms q USING (word) JOIN dl d USING (doc_id)
         |  CROSS JOIN corpus)
         |SELECT word, CAST(rank AS INTEGER) AS rank, doc_id, tf, df, dl, score
         |FROM (SELECT *, row_number() OVER (PARTITION BY word
         |        ORDER BY score DESC, doc_id) AS rank FROM scored)
         |WHERE rank <= 10 ORDER BY word, rank""".stripMargin,
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
    "events_top_paths" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |    epoch_ns(ts) AS tsn, event_id, event_type
        |  FROM events),
        |r AS (
        |  SELECT user_id, day, event_type,
        |    row_number() OVER (PARTITION BY user_id, day
        |      ORDER BY tsn, event_id) AS rn
        |  FROM ev),
        |p AS (
        |  SELECT user_id, day, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 3 GROUP BY 1, 2)
        |SELECT path, count(*) AS n_user_days, count(DISTINCT user_id) AS n_users
        |FROM p GROUP BY 1
        |ORDER BY n_user_days DESC, path LIMIT 10""".stripMargin,
    "dedup_lsh_recall" ->
      s"""WITH docs AS ${dedup.Dedup.augmentedSql},
         |${dedup.Dedup.lshCandidatesCtes("docs")},
         |${dedup.Dedup.jaccardPairsCtes("docs", 0.6, None)},
         |t AS (SELECT count(*) AS n_truth FROM pairs),
         |c AS (SELECT count(*) AS n_candidates FROM cand),
         |h AS (SELECT count(*) AS n_hits
         |      FROM pairs p JOIN cand x ON p.id_a = x.id_a AND p.id_b = x.id_b)
         |SELECT n_truth, n_candidates, n_hits,
         |  CAST(n_hits AS DOUBLE) / nullif(n_candidates, 0) AS precision,
         |  CAST(n_hits AS DOUBLE) / nullif(n_truth, 0) AS recall,
         |  2.0 * (CAST(n_hits AS DOUBLE) / nullif(n_candidates, 0))
         |      * (CAST(n_hits AS DOUBLE) / nullif(n_truth, 0))
         |    / nullif(CAST(n_hits AS DOUBLE) / nullif(n_candidates, 0)
         |             + CAST(n_hits AS DOUBLE) / nullif(n_truth, 0), 0.0) AS f1
         |FROM t CROSS JOIN c CROSS JOIN h""".stripMargin,
    "orders_promo_share" ->
      s"""WITH t AS (
         |  SELECT strftime(l_shipdate, '%Y-%m') AS month, p_type,
         |    ${util.Stable.dec2Sql("l_extendedprice")}
         |      * (${util.Stable.rate2Sql("1.0")}
         |         - ${util.Stable.rate2Sql("l_discount")}) AS rev
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'),
         |m AS (
         |  SELECT month,
         |    ${util.Stable.exactSumAtSql("CASE WHEN p_type = 'PROMO' THEN rev END", 4)}
         |      AS promo_revenue,
         |    ${util.Stable.exactSumAtSql("rev", 4)} AS total_revenue,
         |    count(*) AS n_items
         |  FROM t GROUP BY 1)
         |SELECT month, promo_revenue, total_revenue, n_items,
         |  promo_revenue / total_revenue * 100.0 AS promo_share_pct
         |FROM m ORDER BY month""".stripMargin,
    "events_orc_roundtrip" ->
      s"""SELECT event_type, count(*) AS n_events,
         |  CAST(sum(CAST(floor(value * 1e8 + 0.5) AS BIGINT)) AS BIGINT)
         |    AS sum_value_q8,
         |  min(epoch_ns(ts)) AS min_ts_ns, max(epoch_ns(ts)) AS max_ts_ns,
         |  CAST(sum(user_id) AS BIGINT) AS user_id_sum
         |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    "orders_lateral_topk" ->
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c
        |JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice
        |  FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey
        |  LIMIT 3) t ON true
        |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin,
    "docs_schema_evolution" ->
      """SELECT doc_id % 2 = 0 AS legacy_schema, count(*) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
        |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN CAST(n_chars AS BIGINT) END)
        |    AS BIGINT) AS sum_n_chars,
        |  CAST(sum(CAST(concat('0x',
        |      substring(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 10))
        |    AS BIGINT)) AS BIGINT) AS content_sum
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    // ——— TPC-H completion family. Oracles mirror the Spark side's
    // decimal discipline term for term (dec2/rate2 casts BEFORE
    // arithmetic, sums emitted at true scale) so every revenue figure is
    // bit-identical, not merely close.
    "tpch_q5" ->
      s"""SELECT n.n_name,
         |  ${util.Stable.exactSumAtSql(
               s"${util.Stable.dec2Sql("l.l_extendedprice")} * (1 - ${util.Stable.rate2Sql("l.l_discount")})", 4)} AS revenue
         |FROM customer c
         |JOIN orders o ON c.c_custkey = o.o_custkey
         |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |JOIN region r ON n.n_regionkey = r.r_regionkey
         |WHERE c.c_nationkey = s.s_nationkey
         |  AND r.r_name = 'ASIA'
         |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    "tpch_q7" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
         |  ${util.Stable.exactSumAtSql(
               s"${util.Stable.dec2Sql("l.l_extendedprice")} * (1 - ${util.Stable.rate2Sql("l.l_discount")})", 4)} AS revenue
         |FROM supplier s
         |JOIN lineitem l ON s.s_suppkey = l.l_suppkey
         |JOIN orders o ON o.o_orderkey = l.l_orderkey
         |JOIN customer c ON c.c_custkey = o.o_custkey
         |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
         |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "tpch_q8" ->
      s"""WITH t AS (
         |  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         |    ${util.Stable.dec2Sql("l.l_extendedprice")} * (1 - ${util.Stable.rate2Sql("l.l_discount")}) AS rev,
         |    n1.n_name AS supp_nation
         |  FROM lineitem l
         |  JOIN part p ON p.p_partkey = l.l_partkey
         |  JOIN orders o ON o.o_orderkey = l.l_orderkey
         |  JOIN customer c ON c.c_custkey = o.o_custkey
         |  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
         |  JOIN region r ON n2.n_regionkey = r.r_regionkey
         |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
         |  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
         |  WHERE r.r_name = 'AMERICA' AND p.p_type = 'STANDARD')
         |SELECT o_year,
         |  coalesce(${util.Stable.exactSumAtSql(
               "CASE WHEN supp_nation = 'NATION_3' THEN rev END", 4)}, 0.0)
         |    AS nation_revenue,
         |  ${util.Stable.exactSumAtSql("rev", 4)} AS total_revenue,
         |  coalesce(${util.Stable.exactSumAtSql(
               "CASE WHEN supp_nation = 'NATION_3' THEN rev END", 4)}, 0.0)
         |    / ${util.Stable.exactSumAtSql("rev", 4)} AS mkt_share
         |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "tpch_q9" ->
      s"""SELECT n.n_name AS nation,
         |  CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         |  ${util.Stable.exactSumAtSql(
               s"${util.Stable.dec2Sql("l.l_extendedprice")} * (1 - ${util.Stable.rate2Sql("l.l_discount")})" +
               s" - ${util.Stable.rate2Sql("0.6")} * ${util.Stable.dec2Sql("p.p_retailprice")} * ${util.Stable.dec2Sql("l.l_quantity")}", 6)} AS sum_profit
         |FROM lineitem l
         |JOIN part p ON p.p_partkey = l.l_partkey
         |JOIN supplier s ON s.s_suppkey = l.l_suppkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |JOIN orders o ON o.o_orderkey = l.l_orderkey
         |WHERE p.p_name LIKE '%red%'
         |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "tpch_q10" ->
      s"""SELECT c.c_custkey, c.c_name,
         |  ${util.Stable.exactSumAtSql(
               s"${util.Stable.dec2Sql("l.l_extendedprice")} * (1 - ${util.Stable.rate2Sql("l.l_discount")})", 4)} AS revenue,
         |  c.c_acctbal, n.n_name
         |FROM customer c
         |JOIN orders o ON c.c_custkey = o.o_custkey
         |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
         |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l.l_returnflag = 'R'
         |GROUP BY 1, 2, 4, 5
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "tpch_q12" ->
      """SELECT l.l_linestatus,
        |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem l
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "tpch_q15" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey,
         |    sum(CAST(${util.Stable.dec2Sql("l_extendedprice")} * (1 - ${util.Stable.rate2Sql("l_discount")})
         |      AS DECIMAL(38,8))) AS total_rev
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
         |  GROUP BY 1)
         |SELECT s.s_suppkey, s.s_name,
         |  CAST(CAST(total_rev AS DECIMAL(38,4)) AS DOUBLE) AS total_revenue
         |FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
         |WHERE total_rev = (SELECT max(total_rev) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,
    "tpch_q16" ->
      """SELECT p.p_brand, p.p_type, p.p_size,
        |  count(DISTINCT l.l_suppkey) AS supplier_cnt
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
        |  AND p.p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
        |  AND l.l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "tpch_q19" ->
      s"""SELECT
         |  ${util.Stable.exactSumAtSql(
               s"${util.Stable.dec2Sql("l.l_extendedprice")} * (1 - ${util.Stable.rate2Sql("l.l_discount")})", 4)} AS revenue,
         |  count(*) AS n_rows
         |FROM lineitem l
         |JOIN part p ON p.p_partkey = l.l_partkey
         |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
         |       AND l.l_quantity BETWEEN 1 AND 11)
         |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
         |       AND l.l_quantity BETWEEN 10 AND 20)
         |   OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 1 AND 15
         |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "tpch_q20" ->
      s"""WITH sq AS (
         |  SELECT l_suppkey, l_partkey,
         |    sum(${util.Stable.dec2Sql("l_quantity")}) AS qty,
         |    sum(sum(${util.Stable.dec2Sql("l_quantity")}))
         |      OVER (PARTITION BY l_partkey) AS tot
         |  FROM lineitem JOIN part ON p_partkey = l_partkey
         |  WHERE p_name LIKE 'red%'
         |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         |  GROUP BY 1, 2)
         |SELECT DISTINCT s.s_suppkey, s.s_name
         |FROM sq JOIN supplier s ON sq.l_suppkey = s.s_suppkey
         |WHERE qty * 2 > tot
         |ORDER BY s_suppkey""".stripMargin,
    "events_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |    count(*) AS n FROM events GROUP BY 1, 2),
        |spans AS (SELECT user_id, min(day) AS lo, max(day) AS hi
        |          FROM daily GROUP BY 1),
        |cal AS (SELECT user_id, unnest(generate_series(lo, hi)) AS day
        |        FROM spans)
        |SELECT cal.user_id, cal.day,
        |  CAST(coalesce(daily.n, 0) AS BIGINT) AS n_events,
        |  CAST(daily.n IS NULL AS INTEGER) AS filled
        |FROM cal LEFT JOIN daily
        |  ON cal.user_id = daily.user_id AND cal.day = daily.day
        |ORDER BY 1, 2""".stripMargin,
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
    "events_dp_counts" ->
      """WITH c AS (
        |  SELECT event_type, count(*) AS true_count FROM events GROUP BY 1),
        |d AS (
        |  SELECT event_type, true_count,
        |    CAST(concat('0x', substring(md5(event_type), 1, 12)) AS BIGINT)
        |      / 281474976710656.0 AS u
        |  FROM c),
        |n AS (
        |  SELECT event_type, true_count, u,
        |    (-sign(u - 0.5)) / 0.5 * ln(1.0 - 2.0 * abs(u - 0.5)) AS noise
        |  FROM d)
        |SELECT event_type, true_count,
        |  printf('%.4e', u) AS u_sig,
        |  printf('%.4e', noise) AS noise_sig,
        |  printf('%.4e', greatest(true_count + noise, 0.0)) AS dp_count_sig
        |FROM n ORDER BY event_type""".stripMargin,
    "events_pipe_syntax" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 1e8 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS sum_value_q8,
        |  count(DISTINCT user_id) AS n_users
        |FROM events WHERE value >= 0.5
        |GROUP BY 1 ORDER BY event_type""".stripMargin,
    "orders_backlog" ->
      """WITH ev AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, 1 AS delta FROM orders
        |  UNION ALL
        |  SELECT CAST(max(l_shipdate) AS DATE) + 1 AS day, -1 AS delta
        |  FROM lineitem GROUP BY l_orderkey),
        |daily AS (
        |  SELECT day, CAST(sum(delta) AS BIGINT) AS day_delta
        |  FROM ev GROUP BY 1)
        |SELECT CAST(day AS VARCHAR) AS day, day_delta,
        |  CAST(sum(day_delta) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS backlog
        |FROM daily ORDER BY day""".stripMargin,
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
    "tpch_q22" ->
      s"""WITH eligible AS (
         |  SELECT c_custkey, c_nationkey, c_acctbal FROM customer
         |  WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
         |a AS (SELECT ${util.Stable.exactAvgSql("c_acctbal")} AS avg_bal
         |      FROM eligible WHERE c_acctbal > 0)
         |SELECT c_nationkey, count(*) AS numcust,
         |  ${util.Stable.exactSumAtSql("c_acctbal", 2)} AS totacctbal
         |FROM eligible, a
         |WHERE c_acctbal > a.avg_bal
         |  AND NOT EXISTS (SELECT 1 FROM orders o
         |                  WHERE o.o_custkey = eligible.c_custkey
         |                    AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
         |GROUP BY 1 ORDER BY 1""".stripMargin,
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
    "events_l_diversity" ->
      """WITH classes AS (
        |  SELECT event_type,
        |    (epoch_ns(ts) // 86400000000000) % 7 AS dow,
        |    count(DISTINCT CAST(floor(value * 100 + 0.5) AS BIGINT) // 5000)
        |      AS n_sensitive,
        |    count(*) AS n_rows
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, count(*) AS n_classes,
        |  CAST(sum(CASE WHEN n_sensitive < 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_low_div,
        |  CAST(sum(CASE WHEN n_sensitive < 3 THEN n_rows ELSE 0 END) AS BIGINT)
        |    AS rows_at_risk,
        |  min(n_sensitive) AS min_l
        |FROM classes GROUP BY 1 ORDER BY event_type""".stripMargin,
    "events_seq_pattern" ->
      """WITH seqs AS (
        |  SELECT user_id,
        |    string_agg(substr(event_type, 1, 1), ''
        |               ORDER BY epoch_ns(ts) // 1000, event_id) AS seq
        |  FROM events GROUP BY 1),
        |f AS (
        |  SELECT count(*) AS n_users,
        |    CAST(sum(CASE WHEN regexp_matches(seq, 's.*c.*p') THEN 1 ELSE 0 END)
        |      AS BIGINT) AS m1,
        |    CAST(sum(CASE WHEN regexp_matches(seq, 'v.*p') THEN 1 ELSE 0 END)
        |      AS BIGINT) AS m2,
        |    CAST(sum(CASE WHEN regexp_matches(seq, '^[^e]*$') THEN 1 ELSE 0 END)
        |      AS BIGINT) AS m3
        |  FROM seqs)
        |SELECT * FROM (
        |  SELECT 'signup>click>purchase' AS pattern, m1 AS n_matched, n_users FROM f
        |  UNION ALL SELECT 'view>purchase', m2, n_users FROM f
        |  UNION ALL SELECT 'error_free', m3, n_users FROM f)
        |ORDER BY pattern""".stripMargin,
    "events_conversion_lag" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us FROM events),
        |s1 AS (SELECT user_id, min(ts_us) AS t1 FROM ev
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (
        |  SELECT ev.user_id, min(ts_us - t1) AS lag_us
        |  FROM ev JOIN s1 USING (user_id)
        |  WHERE event_type = 'purchase' AND ts_us > t1
        |  GROUP BY 1)
        |SELECT (SELECT count(*) FROM s1) AS n_signup,
        |  count(*) AS n_converted,
        |  min(lag_us) AS min_lag_us, max(lag_us) AS max_lag_us,
        |  CAST(sum(lag_us) AS DOUBLE) / count(*) / 1e6 AS avg_lag_s
        |FROM s2""".stripMargin,
    "graph_link_prediction" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |edges AS (
        |  SELECT a.p AS u, b.p AS v
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |adj AS (SELECT u AS c, v AS nb FROM edges
        |        UNION ALL SELECT v, u FROM edges),
        |deg AS (SELECT nb, count(*) AS dg FROM adj GROUP BY 1),
        |cd AS (SELECT c, count(*) AS dg FROM adj GROUP BY 1),
        |sm AS (SELECT adj.c, adj.nb FROM adj JOIN cd USING (c) WHERE dg <= 64),
        |cn AS (
        |  SELECT x.nb AS u, y.nb AS v, count(*) AS n_common
        |  FROM sm x JOIN sm y ON x.c = y.c AND x.nb < y.nb
        |  GROUP BY 1, 2),
        |nonadj AS (
        |  SELECT cn.u, cn.v, cn.n_common
        |  FROM cn LEFT JOIN edges e ON cn.u = e.u AND cn.v = e.v
        |  WHERE e.u IS NULL)
        |SELECT nonadj.u, nonadj.v, n_common, du.dg AS du, dv.dg AS dv,
        |  n_common * 1000000 // (du.dg + dv.dg - n_common) AS jaccard_q
        |FROM nonadj
        |  JOIN deg du ON du.nb = nonadj.u
        |  JOIN deg dv ON dv.nb = nonadj.v
        |ORDER BY jaccard_q DESC, nonadj.u, nonadj.v LIMIT 20""".stripMargin,
    "text_rake_keywords" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(range(1, len(t) + 1)) - 1 AS pos, unnest(t) AS w
        |  FROM (SELECT doc_id,
        |          regexp_split_to_array(lower(text), '[^a-z]+') AS t
        |        FROM documents)),
        |marked AS (
        |  SELECT doc_id, pos, w,
        |    CASE WHEN w = '' OR w IN ('the', 'a', 'of', 'and', 'to', 'in',
        |                              'is', 'that', 'it', 'for')
        |         THEN 1 ELSE 0 END AS is_break
        |  FROM toks),
        |members AS (
        |  SELECT doc_id, pos, w, phrase_id,
        |    count(*) OVER (PARTITION BY doc_id, phrase_id) AS plen
        |  FROM (
        |    SELECT doc_id, pos, w, is_break,
        |      CAST(sum(is_break) OVER (PARTITION BY doc_id ORDER BY pos
        |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS phrase_id
        |    FROM marked)
        |  WHERE is_break = 0),
        |ws AS (
        |  SELECT w, CAST(sum(plen) AS BIGINT) * 1000000 // count(*) AS wscore_q
        |  FROM members GROUP BY 1),
        |pt AS (
        |  SELECT doc_id, phrase_id,
        |    string_agg(w, ' ' ORDER BY pos) AS phrase, count(*) AS n_words
        |  FROM members GROUP BY 1, 2),
        |ps AS (
        |  SELECT doc_id, phrase_id, CAST(sum(wscore_q) AS BIGINT) AS score_q
        |  FROM members JOIN ws USING (w) GROUP BY 1, 2)
        |SELECT phrase, n_words, count(*) AS n_occ, max(score_q) / 1e6 AS score
        |FROM pt JOIN ps USING (doc_id, phrase_id)
        |WHERE n_words >= 2
        |GROUP BY 1, 2
        |ORDER BY score DESC, phrase LIMIT 20""".stripMargin,
    "events_lateness_audit" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS ts_us
        |  FROM events),
        |lat AS (
        |  SELECT event_type,
        |    CASE WHEN prior_max_us > ts_us THEN prior_max_us - ts_us
        |         ELSE 0 END AS late_us
        |  FROM (
        |    SELECT event_type, ts_us,
        |      max(ts_us) OVER (PARTITION BY user_id ORDER BY event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max_us
        |    FROM ev))
        |SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
        |  max(late_us) AS max_late_us,
        |  CAST(CAST(sum(late_us) AS BIGINT) AS DOUBLE)
        |    / nullif(CAST(CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END)
        |                   AS BIGINT) AS DOUBLE), 0.0)
        |    / 1e6 AS avg_late_s
        |FROM lat GROUP BY 1 ORDER BY event_type""".stripMargin,
    "docs_ngram_coverage" ->
      s"""WITH words AS (
         |  SELECT w FROM (
         |    SELECT unnest(string_split(${graft.util.Norm.normalizeSql("text")}, ' ')) AS w
         |    FROM documents) WHERE w <> ''),
         |vocab AS (SELECT w AS word, count(*) AS freq FROM words GROUP BY 1),
         |ranked AS (
         |  SELECT word, freq,
         |    row_number() OVER (ORDER BY freq DESC, word) AS rk
         |  FROM vocab),
         |tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total_tokens,
         |               count(*) AS n_types FROM vocab)
         |SELECT CAST(cutoff AS BIGINT) AS cutoff, n_types, covered_tokens,
         |  total_tokens,
         |  CAST(covered_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE) AS share
         |FROM (
         |  SELECT c.cutoff, CAST(sum(freq) AS BIGINT) AS covered_tokens
         |  FROM (VALUES (5), (10), (20)) c(cutoff)
         |  JOIN ranked ON rk <= c.cutoff
         |  GROUP BY 1) cov, tot
         |ORDER BY cutoff""".stripMargin,
    "emb_norm_audit" ->
      """WITH e AS (
        |  SELECT label, CAST(len(embedding) AS INTEGER) AS dim,
        |    CAST(list_aggregate(list_transform(embedding,
        |      v -> CAST(floor(CAST(v AS DOUBLE) * 1e8 + 0.5) AS BIGINT)
        |           * CAST(floor(CAST(v AS DOUBLE) * 1e8 + 0.5) AS BIGINT)),
        |      'sum') AS BIGINT) AS norm2_q
        |  FROM embeddings)
        |SELECT label, count(*) AS n_vecs, min(dim) AS min_dim,
        |  max(dim) AS max_dim,
        |  CAST(sum(CASE WHEN norm2_q = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |  min(norm2_q) AS min_norm2_q, max(norm2_q) AS max_norm2_q,
        |  CAST(CAST(sum(norm2_q) AS BIGINT) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) / 1e16 AS avg_norm2
        |FROM e GROUP BY 1 ORDER BY label""".stripMargin,
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
    "events_impact_did" ->
      """WITH days AS (
        |  SELECT user_id, value, epoch_ns(ts) // 86400000000000 AS day_idx
        |  FROM events),
        |c AS (SELECT (min(day_idx) + max(day_idx)) // 2 AS cutoff_day FROM days),
        |cells AS (
        |  SELECT cutoff_day,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 AND day_idx >= cutoff_day
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 AND day_idx >= cutoff_day
        |                  THEN CAST(floor(value * 1e6 + 0.5) AS BIGINT)
        |                  ELSE 0 END) AS BIGINT) AS sum_tp,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 AND NOT day_idx >= cutoff_day
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_tr,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 AND NOT day_idx >= cutoff_day
        |                  THEN CAST(floor(value * 1e6 + 0.5) AS BIGINT)
        |                  ELSE 0 END) AS BIGINT) AS sum_tr,
        |    CAST(sum(CASE WHEN user_id % 2 <> 1 AND day_idx >= cutoff_day
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_cp,
        |    CAST(sum(CASE WHEN user_id % 2 <> 1 AND day_idx >= cutoff_day
        |                  THEN CAST(floor(value * 1e6 + 0.5) AS BIGINT)
        |                  ELSE 0 END) AS BIGINT) AS sum_cp,
        |    CAST(sum(CASE WHEN user_id % 2 <> 1 AND NOT day_idx >= cutoff_day
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_cr,
        |    CAST(sum(CASE WHEN user_id % 2 <> 1 AND NOT day_idx >= cutoff_day
        |                  THEN CAST(floor(value * 1e6 + 0.5) AS BIGINT)
        |                  ELSE 0 END) AS BIGINT) AS sum_cr
        |  FROM days, c GROUP BY cutoff_day)
        |SELECT cutoff_day, n_tp, n_tr, n_cp, n_cr,
        |  CAST(sum_tp AS DOUBLE) / CAST(n_tp AS DOUBLE) / 1e6 AS mean_tp,
        |  CAST(sum_tr AS DOUBLE) / CAST(n_tr AS DOUBLE) / 1e6 AS mean_tr,
        |  CAST(sum_cp AS DOUBLE) / CAST(n_cp AS DOUBLE) / 1e6 AS mean_cp,
        |  CAST(sum_cr AS DOUBLE) / CAST(n_cr AS DOUBLE) / 1e6 AS mean_cr,
        |  (mean_tp - mean_tr) - (mean_cp - mean_cr) AS did
        |FROM cells""".stripMargin,
    "mm_dedup_exact" ->
      """WITH media AS (
        |  SELECT doc_id AS media_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
        |         ELSE 'wav' END AS format,
        |    md5(text) AS h,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |g AS (
        |  SELECT format, h, count(*) AS n_assets,
        |    CAST(sum(n_bytes) AS BIGINT) AS group_bytes,
        |    max(n_bytes) AS one_size
        |  FROM media GROUP BY 1, 2)
        |SELECT format, CAST(sum(n_assets) AS BIGINT) AS n_assets,
        |  count(*) AS n_unique_payloads,
        |  CAST(sum(n_assets - 1) AS BIGINT) AS n_dup_assets,
        |  CAST(sum(group_bytes - one_size) AS BIGINT) AS bytes_reclaimed
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
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
    "events_burstiness" ->
      """WITH dc AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, count(*) AS n_days,
        |    CAST(sum(c) AS BIGINT) AS sc, CAST(sum(c * c) AS BIGINT) AS scc,
        |    max(c) AS peak_day
        |  FROM dc GROUP BY 1)
        |SELECT event_type, n_days, peak_day,
        |  CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean_per_day,
        |  (CAST(n_days * scc - sc * sc AS DOUBLE)
        |     / CAST(n_days * n_days AS DOUBLE)) / mean_per_day AS fano
        |FROM m ORDER BY event_type""".stripMargin,
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
    "events_markov_chain" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id, event_type
        |  FROM events),
        |pairs AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id) AS to_type
        |  FROM ev),
        |cells AS (
        |  SELECT from_type, to_type, count(*) AS n
        |  FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |fs AS (
        |  SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from,
        |    CAST(sum(n * CAST(floor(ln(CAST(n AS DOUBLE)) * 1e4 + 0.5)
        |                      AS BIGINT)) AS BIGINT) AS sum_n_ln_n_q4
        |  FROM cells GROUP BY 1)
        |SELECT from_type, to_type, n, n_from,
        |  CAST(n AS DOUBLE) / CAST(n_from AS DOUBLE) AS p,
        |  (n_from * CAST(floor(ln(CAST(n_from AS DOUBLE)) * 1e4 + 0.5) AS BIGINT)
        |     - sum_n_ln_n_q4) / (n_from * 1e4) AS entropy_from
        |FROM cells JOIN fs USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,
    "text_tokenizer_fertility" ->
      s"""WITH ts AS (
         |${text.TextAnalysis.tokenStatsSql("documents", "doc_id", "text")})
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(n_ws_tokens) AS BIGINT) AS ws_tokens,
         |  CAST(sum(n_bpe_tokens) AS BIGINT) AS bpe_tokens,
         |  CAST(CAST(sum(n_bpe_tokens) AS BIGINT) AS DOUBLE)
         |    / CAST(CAST(sum(n_ws_tokens) AS BIGINT) AS DOUBLE) AS fertility
         |FROM ts JOIN documents USING (doc_id)
         |GROUP BY 1 ORDER BY lang""".stripMargin,
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
    "text_lang_confusion" ->
      s"""WITH pred AS (
         |${text.TextAnalysis.langIdSql("documents", "doc_id", "text")}),
         |cells AS (
         |  SELECT d.lang AS truth, p.lang_id AS pred, count(*) AS n
         |  FROM documents d JOIN pred p USING (doc_id)
         |  GROUP BY 1, 2),
         |tot AS (SELECT truth, CAST(sum(n) AS BIGINT) AS n_truth
         |        FROM cells GROUP BY 1)
         |SELECT truth, pred, n, n_truth,
         |  CAST(n AS DOUBLE) / CAST(n_truth AS DOUBLE) AS share
         |FROM cells JOIN tot USING (truth)
         |ORDER BY truth, pred""".stripMargin,
    "docs_split_leakage" ->
      s"""WITH docs AS ${dedup.Dedup.augmentedSql},
         |d AS (
         |  SELECT doc_id,
         |    (CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
         |            IN ('e', 'f') THEN 'test'
         |          WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
         |            IN ('c', 'd') THEN 'val'
         |          ELSE 'train' END) AS split,
         |    md5(${util.Norm.normalizeSql("text")}) AS fp
         |  FROM docs)
         |SELECT least(a.split, b.split) AS split_lo,
         |  greatest(a.split, b.split) AS split_hi,
         |  count(*) AS n_leaked_pairs,
         |  count(DISTINCT a.fp) AS n_leaked_fingerprints
         |FROM d a JOIN d b
         |  ON a.fp = b.fp AND a.doc_id < b.doc_id AND a.split <> b.split
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_slo_burn" ->
      """WITH ds AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS day, count(*) AS n_total,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_err
        |  FROM events GROUP BY 1),
        |w AS (
        |  SELECT day, n_total, n_err,
        |    CAST(sum(n_err) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS err7,
        |    CAST(sum(n_total) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS tot7
        |  FROM ds)
        |SELECT day, n_total, n_err,
        |  CAST(n_err * 1000000 // n_total AS DOUBLE) / 250000.0 AS burn_1d,
        |  CAST(err7 * 1000000 // tot7 AS DOUBLE) / 250000.0 AS burn_7d
        |FROM w ORDER BY day""".stripMargin,
    "events_ab_cuped" ->
      """WITH days AS (
        |  SELECT user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vq,
        |    epoch_ns(ts) // 86400000000000 AS day_idx
        |  FROM events),
        |c AS (SELECT (min(day_idx) + max(day_idx)) // 2 AS cutoff_day FROM days),
        |u AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN day_idx < cutoff_day THEN vq ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN day_idx >= cutoff_day THEN vq ELSE 0 END)
        |      AS BIGINT) AS y,
        |    CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS treat
        |  FROM days, c GROUP BY user_id),
        |m AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
        |    CAST(sum(CASE WHEN treat = 1 THEN x ELSE 0 END) AS BIGINT) AS sx_t,
        |    CAST(sum(CASE WHEN treat = 1 THEN y ELSE 0 END) AS BIGINT) AS sy_t
        |  FROM u)
        |SELECT n, n_t, n - n_t AS n_c,
        |  CAST(n * sxy - sx * sy AS DOUBLE)
        |    / nullif(CAST(n * sxx - sx * sx AS DOUBLE), 0.0) AS theta,
        |  (CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE)
        |   - CAST(sy - sy_t AS DOUBLE) / CAST(n - n_t AS DOUBLE)) / 100.0
        |    AS raw_effect,
        |  (CAST(sx_t AS DOUBLE) / CAST(n_t AS DOUBLE)
        |   - CAST(sx - sx_t AS DOUBLE) / CAST(n - n_t AS DOUBLE)) / 100.0
        |    AS pre_diff,
        |  raw_effect - theta * pre_diff AS cuped_effect
        |FROM m""".stripMargin,
    "text_lang_kappa" ->
      s"""WITH pred AS (
         |${text.TextAnalysis.langIdSql("documents", "doc_id", "text")}),
         |cells AS (
         |  SELECT d.lang AS truth, p.lang_id AS pred, count(*) AS n
         |  FROM documents d JOIN pred p USING (doc_id)
         |  GROUP BY 1, 2),
         |rt AS (SELECT truth, CAST(sum(n) AS BIGINT) AS rt FROM cells GROUP BY 1),
         |ct AS (SELECT pred, CAST(sum(n) AS BIGINT) AS ct FROM cells GROUP BY 1),
         |ag AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_agree
         |       FROM cells WHERE truth = pred),
         |ch AS (SELECT CAST(coalesce(sum(rt.rt * ct.ct), 0) AS BIGINT) AS sum_rc
         |       FROM rt JOIN ct ON rt.truth = ct.pred),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM cells)
         |SELECT n_total, n_agree,
         |  CAST(n_agree AS DOUBLE) / CAST(n_total AS DOUBLE) AS po,
         |  CAST(sum_rc AS DOUBLE)
         |    / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)) AS pe,
         |  (po - pe) / nullif(1.0 - pe, 0.0) AS kappa
         |FROM t, ag, ch""".stripMargin,
    "events_forecast_naive_eval" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT event_type, c,
        |    lag(c, 7) OVER (PARTITION BY event_type ORDER BY day) AS pred
        |  FROM daily),
        |e AS (SELECT event_type, c - pred AS err FROM p WHERE pred IS NOT NULL)
        |SELECT event_type, count(*) AS n_eval,
        |  CAST(CAST(sum(abs(err)) AS BIGINT) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS mae,
        |  CAST(CAST(sum(err) AS BIGINT) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS bias,
        |  max(abs(err)) AS max_abs_err
        |FROM e GROUP BY 1 ORDER BY event_type""".stripMargin,
    "orders_benford_audit" -> {
      // NB: a bare decimal literal is DECIMAL in DuckDB (not DOUBLE) —
      // the e0 exponent forces DOUBLE so the arithmetic tree matches
      // Spark's and the rendered `expected` column hashes identically.
      val expectedCase = (1 to 9).map { d =>
        s"WHEN '$d' THEN ${math.log10(1.0 + 1.0 / d)}e0"
      }.mkString(" ")
      s"""WITH digits AS (
         |  SELECT substring(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
         |    AS VARCHAR), 1, 1) AS digit, count(*) AS n_obs
         |  FROM orders WHERE o_totalprice > 0 GROUP BY 1),
         |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM digits),
         |scored AS (
         |  SELECT digit, n_obs, n_total,
         |    CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE) AS share,
         |    (CASE digit $expectedCase END) AS expected,
         |    CAST(floor((n_obs - (CASE digit $expectedCase END) * n_total)
         |      * (n_obs - (CASE digit $expectedCase END) * n_total)
         |      / ((CASE digit $expectedCase END) * n_total) * 1e6 + 0.5)
         |      AS BIGINT) AS term_q
         |  FROM digits, t),
         |c AS (SELECT CAST(sum(term_q) AS BIGINT) AS chi2_q FROM scored)
         |SELECT digit, n_obs, n_total, share, expected, chi2_q / 1e6 AS chi2
         |FROM scored, c ORDER BY digit""".stripMargin
    },
    "data_profile_summary" ->
      """SELECT * FROM (
        |  SELECT 'o_orderkey' AS column_name,
        |    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_null,
        |    count(DISTINCT o_orderkey) AS n_distinct, count(*) AS n_rows
        |  FROM orders
        |  UNION ALL SELECT 'o_custkey',
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT o_custkey), count(*) FROM orders
        |  UNION ALL SELECT 'o_orderstatus',
        |    CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT o_orderstatus), count(*) FROM orders
        |  UNION ALL SELECT 'o_totalprice',
        |    CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT o_totalprice), count(*) FROM orders
        |  UNION ALL SELECT 'o_orderpriority',
        |    CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT o_orderpriority), count(*) FROM orders)
        |ORDER BY column_name""".stripMargin,
    "orders_open_aging" ->
      s"""WITH shipped AS (
         |  SELECT DISTINCT l_orderkey FROM lineitem
         |  WHERE l_shipdate <= TIMESTAMP '1998-06-01 00:00:00'),
         |open_orders AS (
         |  SELECT o_orderkey, o_totalprice,
         |    date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-06-01')
         |      AS age_days
         |  FROM orders
         |  WHERE o_orderdate <= TIMESTAMP '1998-06-01 00:00:00'
         |    AND NOT EXISTS (SELECT 1 FROM shipped s
         |                    WHERE s.l_orderkey = orders.o_orderkey))
         |SELECT (CASE WHEN age_days <= 30 THEN 'a_0_30'
         |             WHEN age_days <= 60 THEN 'b_31_60'
         |             WHEN age_days <= 90 THEN 'c_61_90'
         |             ELSE 'd_90_plus' END) AS bucket,
         |  count(*) AS n_orders,
         |  ${util.Stable.exactSumAtSql("o_totalprice", 2)} AS open_value,
         |  min(age_days) AS min_age, max(age_days) AS max_age
         |FROM open_orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "supplier_latency_scorecard" ->
      """WITH lat AS (
        |  SELECT l_suppkey,
        |    date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
        |      AS lat, l_orderkey, l_linenumber
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |r AS (
        |  SELECT l_suppkey, lat,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY lat, l_orderkey, l_linenumber) AS rn,
        |    count(*) OVER (PARTITION BY l_suppkey) AS n
        |  FROM lat),
        |p90 AS (
        |  SELECT l_suppkey, lat AS p90_days FROM r
        |  WHERE rn = (9 * n + 9) // 10),
        |agg AS (
        |  SELECT l_suppkey, count(*) AS n_shipments,
        |    CAST(sum(lat) AS BIGINT) AS sum_days, max(lat) AS max_days
        |  FROM lat GROUP BY 1)
        |SELECT a.l_suppkey, n_shipments,
        |  CAST(sum_days AS DOUBLE) / CAST(n_shipments AS DOUBLE) AS mean_days,
        |  p90_days, max_days
        |FROM agg a JOIN p90 USING (l_suppkey)
        |ORDER BY a.l_suppkey""".stripMargin,
    "nation_trade_matrix" ->
      s"""SELECT c_nat.n_name AS cust_nation, s_nat.n_name AS supp_nation,
         |  count(*) AS n_lineitems,
         |  ${util.Stable.exactSumAtSql(
               s"${util.Stable.dec2Sql("l.l_extendedprice")} * (1 - ${util.Stable.rate2Sql("l.l_discount")})", 4)} AS revenue,
         |  CAST(CASE WHEN c_nat.n_name <> s_nat.n_name THEN 1 ELSE 0 END
         |    AS INTEGER) AS cross_border
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation s_nat ON s.s_nationkey = s_nat.n_nationkey
         |JOIN nation c_nat ON c.c_nationkey = c_nat.n_nationkey
         |GROUP BY 1, 2
         |ORDER BY revenue DESC, cust_nation, supp_nation LIMIT 20""".stripMargin,
    "events_ks_test" ->
      """WITH vals AS (
        |  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS vq,
        |    CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS treat
        |  FROM events),
        |grain AS (
        |  SELECT vq,
        |    CAST(sum(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a1,
        |    CAST(sum(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a2
        |  FROM vals GROUP BY 1),
        |cum AS (
        |  SELECT vq,
        |    CAST(sum(a1) OVER (ORDER BY vq ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS c1,
        |    CAST(sum(a2) OVER (ORDER BY vq ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS c2
        |  FROM grain),
        |t AS (SELECT CAST(sum(a1) AS BIGINT) AS n1,
        |        CAST(sum(a2) AS BIGINT) AS n2, count(*) AS n_values
        |      FROM grain)
        |SELECT n1, n2, n_values,
        |  CAST(max(abs(c1 * n2 - c2 * n1)) AS DOUBLE)
        |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS d_stat,
        |  1.358e0 * sqrt(CAST(n1 + n2 AS DOUBLE)
        |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))) AS d_crit,
        |  CAST(CASE WHEN CAST(max(abs(c1 * n2 - c2 * n1)) AS DOUBLE)
        |      / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
        |      > 1.358e0 * sqrt(CAST(n1 + n2 AS DOUBLE)
        |        / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))
        |    THEN 1 ELSE 0 END AS INTEGER) AS reject_5pct
        |FROM cum, t GROUP BY 1, 2, 3""".stripMargin,
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
    "orders_gini_monthly" ->
      """WITH o AS (
        |  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |    o_orderkey
        |  FROM orders),
        |r AS (
        |  SELECT month, cents,
        |    CAST(row_number() OVER (PARTITION BY month
        |      ORDER BY cents, o_orderkey) AS BIGINT) AS i
        |  FROM o)
        |SELECT month, count(*) AS n_orders,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(2 * CAST(sum(i * cents) AS BIGINT)
        |       - (count(*) + 1) * CAST(sum(cents) AS BIGINT) AS DOUBLE)
        |    / CAST(count(*) * CAST(sum(cents) AS BIGINT) AS DOUBLE) AS gini
        |FROM r GROUP BY 1 ORDER BY month""".stripMargin,
    "events_mannwhitney_u" ->
      """WITH grain AS (
        |  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS vq,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS a1,
        |    CAST(sum(CASE WHEN user_id % 2 <> 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS a2
        |  FROM events GROUP BY 1),
        |ranked AS (
        |  SELECT vq, a1, a2,
        |    2 * CAST(coalesce(sum(a1 + a2) OVER (ORDER BY vq
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      + a1 + a2 + 1 AS midrank2
        |  FROM grain)
        |SELECT CAST(sum(a1) AS BIGINT) AS n1, CAST(sum(a2) AS BIGINT) AS n2,
        |  CAST(sum(a1 * midrank2) AS BIGINT)
        |    - CAST(sum(a1) AS BIGINT) * (CAST(sum(a1) AS BIGINT) + 1) AS u1_x2,
        |  CAST(CAST(sum(a1 * midrank2) AS BIGINT)
        |       - CAST(sum(a1) AS BIGINT) * (CAST(sum(a1) AS BIGINT) + 1)
        |    AS DOUBLE)
        |    / (2.0e0 * CAST(CAST(sum(a1) AS BIGINT) AS DOUBLE)
        |       * CAST(CAST(sum(a2) AS BIGINT) AS DOUBLE)) AS effect_size
        |FROM ranked""".stripMargin,
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
    "events_entropy_drift" ->
      """WITH cells AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS day, event_type,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |daily AS (
        |  SELECT day, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(sum(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1e4 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS s_clnc
        |  FROM cells GROUP BY 1),
        |tc AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS c
        |       FROM cells GROUP BY 1),
        |ov AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n_all,
        |    CAST(sum(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1e4 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS s_all
        |  FROM tc),
        |r AS (SELECT (n_all * CAST(floor(ln(CAST(n_all AS DOUBLE)) * 1e4 + 0.5)
        |        AS BIGINT) - s_all) / (n_all * 1e4) AS h_ref FROM ov)
        |SELECT day, n,
        |  (n * CAST(floor(ln(CAST(n AS DOUBLE)) * 1e4 + 0.5) AS BIGINT)
        |     - s_clnc) / (n * 1e4) AS h_day,
        |  h_ref, abs((n * CAST(floor(ln(CAST(n AS DOUBLE)) * 1e4 + 0.5)
        |     AS BIGINT) - s_clnc) / (n * 1e4) - h_ref) AS drift
        |FROM daily, r ORDER BY day""".stripMargin,
    "docs_js_divergence" ->
      s"""WITH words AS (
         |  SELECT doc_id % 2 AS half, w FROM (
         |    SELECT doc_id,
         |      unnest(string_split(${util.Norm.normalizeSql("text")}, ' ')) AS w
         |    FROM documents) WHERE w <> ''),
         |ca AS (SELECT w AS word, count(*) AS c1 FROM words
         |       WHERE half = 0 GROUP BY 1),
         |cb AS (SELECT w AS word, count(*) AS c2 FROM words
         |       WHERE half = 1 GROUP BY 1),
         |j AS (
         |  SELECT coalesce(ca.word, cb.word) AS word,
         |    CAST(coalesce(c1, 0) AS BIGINT) AS c1,
         |    CAST(coalesce(c2, 0) AS BIGINT) AS c2
         |  FROM ca FULL JOIN cb ON ca.word = cb.word),
         |t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
         |        CAST(sum(c2) AS BIGINT) AS n2 FROM j),
         |terms AS (
         |  SELECT c1, c2, n1, n2,
         |    c1 * n2 + c2 * n1 AS mden,
         |    CASE WHEN c1 > 0 THEN c1 * CAST(floor(ln(
         |      CAST(2 * c1 * n2 AS DOUBLE) / CAST(c1 * n2 + c2 * n1 AS DOUBLE))
         |      * 1e4 + 0.5) AS BIGINT) ELSE 0 END AS t1,
         |    CASE WHEN c2 > 0 THEN c2 * CAST(floor(ln(
         |      CAST(2 * c2 * n1 AS DOUBLE) / CAST(c1 * n2 + c2 * n1 AS DOUBLE))
         |      * 1e4 + 0.5) AS BIGINT) ELSE 0 END AS t2
         |  FROM j, t)
         |SELECT n1, n2, count(*) AS n_words,
         |  (CAST(CAST(sum(t1) AS BIGINT) AS DOUBLE) / CAST(n1 AS DOUBLE)
         |   + CAST(CAST(sum(t2) AS BIGINT) AS DOUBLE) / CAST(n2 AS DOUBLE))
         |    / 2e4 AS js_nats
         |FROM terms GROUP BY 1, 2""".stripMargin,
    "text_zipf_slope" ->
      s"""WITH words AS (
         |  SELECT w FROM (
         |    SELECT unnest(string_split(${util.Norm.normalizeSql("text")}, ' ')) AS w
         |    FROM documents) WHERE w <> ''),
         |vocab AS (SELECT w AS word, count(*) AS freq FROM words GROUP BY 1),
         |pts AS (
         |  SELECT
         |    CAST(floor(ln(CAST(row_number() OVER (ORDER BY freq DESC, word)
         |      AS DOUBLE)) * 1e4 + 0.5) AS BIGINT) AS x,
         |    CAST(floor(ln(CAST(freq AS DOUBLE)) * 1e4 + 0.5) AS BIGINT) AS y
         |  FROM vocab),
         |m AS (
         |  SELECT count(*) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(y * y) AS BIGINT) AS syy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy
         |  FROM pts)
         |SELECT n,
         |  CAST(n * sxy - sx * sy AS DOUBLE)
         |    / nullif(CAST(n * sxx - sx * sx AS DOUBLE), 0.0) AS slope,
         |  (CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE))
         |    / nullif(CAST(n * sxx - sx * sx AS DOUBLE)
         |             * CAST(n * syy - sy * sy AS DOUBLE), 0.0) AS r2
         |FROM m""".stripMargin,
    "customer_repeat_rate" ->
      """WITH pc AS (
        |  SELECT o_custkey, count(*) AS n_orders,
        |    strftime(CAST(min(o_orderdate) AS DATE), '%Y-%m') AS cohort
        |  FROM orders GROUP BY 1)
        |SELECT cohort, count(*) AS n_customers,
        |  CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_repeat,
        |  CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    / CAST(count(*) AS DOUBLE) AS repeat_rate
        |FROM pc GROUP BY 1 ORDER BY cohort""".stripMargin,
    "events_peak_hours" ->
      """WITH cells AS (
        |  SELECT event_type, (epoch_ns(ts) // 3600000000000) % 24 AS hour,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(sum(c) AS BIGINT) AS n_events,
        |  arg_max(hour, c * 100 - hour) AS peak_hour,
        |  max(c) AS peak_count,
        |  arg_min(hour, c * 100 + hour) AS trough_hour,
        |  min(c) AS trough_count,
        |  CAST(max(c) * count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE)
        |    AS peak_to_mean
        |FROM cells GROUP BY 1 ORDER BY event_type""".stripMargin,
    "events_interarrival_cv" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_ns(ts) // 1000 AS ts_us, event_id
        |  FROM events),
        |g AS (
        |  SELECT event_type,
        |    (ts_us - lag(ts_us) OVER (PARTITION BY event_type
        |      ORDER BY ts_us, event_id)) // 1000000 AS gap_s
        |  FROM ev),
        |m AS (
        |  SELECT event_type, count(*) AS n_gaps,
        |    CAST(sum(gap_s) AS BIGINT) AS sg,
        |    CAST(sum(gap_s * gap_s) AS BIGINT) AS sgg,
        |    max(gap_s) AS max_gap_s
        |  FROM g WHERE gap_s IS NOT NULL GROUP BY 1)
        |SELECT event_type, n_gaps,
        |  CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_s,
        |  (CAST(n_gaps * sgg - sg * sg AS DOUBLE)
        |     / CAST(n_gaps * n_gaps AS DOUBLE))
        |    / nullif((CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
        |             * (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)), 0.0)
        |    AS cv2,
        |  max_gap_s
        |FROM m ORDER BY event_type""".stripMargin,
    "customer_anova_f" ->
      """WITH cells AS (
        |  SELECT c_mktsegment AS seg, count(*) AS nj,
        |    CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS sj,
        |    CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
        |             * CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS ssj
        |  FROM customer GROUP BY 1),
        |t AS (
        |  SELECT count(*) AS k, CAST(sum(nj) AS BIGINT) AS n,
        |    CAST(sum(sj) AS BIGINT) AS s, CAST(sum(ssj) AS BIGINT) AS ss,
        |    CAST(sum(CAST(floor(CAST(sj AS DOUBLE) * CAST(sj AS DOUBLE)
        |      / CAST(nj AS DOUBLE) + 0.5) AS BIGINT)) AS BIGINT) AS sq
        |  FROM cells)
        |SELECT k AS n_segments, n AS n_customers,
        |  (CAST(sq AS DOUBLE)
        |   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / 1e4
        |    AS ssb,
        |  ((CAST(ss AS DOUBLE)
        |    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |   - (CAST(sq AS DOUBLE)
        |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
        |    / 1e4 AS ssw,
        |  ((CAST(sq AS DOUBLE)
        |    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |   / CAST(k - 1 AS DOUBLE))
        |  / nullif((((CAST(ss AS DOUBLE)
        |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |     - (CAST(sq AS DOUBLE)
        |        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
        |    / CAST(n - k AS DOUBLE)), 0.0) AS f_stat
        |FROM t""".stripMargin,

    // The MV-rewrite oracles recompute from the RAW fact — the whole
    // point: if the optimizer's MV fold ever diverged from first
    // principles, the hash would catch it.
    "mv_rollup_stored" ->
      s"""SELECT l_returnflag,
         |  CAST(sum(${util.Stable.dec2Sql("l_quantity")}) AS DOUBLE) AS sum_qty,
         |  CAST(sum(${util.Stable.dec2Sql("l_extendedprice")}) AS DOUBLE) AS sum_price,
         |  CAST(count(*) AS BIGINT) AS n_rows
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "mv_rollup_filtered_stored" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
        |  epoch_us(min(l_shipdate)) AS min_ship_us,
        |  epoch_us(max(l_shipdate)) AS max_ship_us
        |FROM lineitem WHERE l_linestatus = 'F'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "mv_refresh_incremental_stored" ->
      """SELECT epoch_ns(ts) // 86400000000000 AS day, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(floor(value * 100e0 + 0.5e0) AS BIGINT)) AS BIGINT)
        |    AS value_cents
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "events_roc_auc" ->
      """WITH s AS (
        |  SELECT CAST(floor(value * 100e0 + 0.5e0) AS BIGINT) AS sc,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM events),
        |g AS (SELECT sc, count(*) AS cnt, CAST(sum(pos) AS BIGINT) AS npos
        |      FROM s GROUP BY 1),
        |r AS (SELECT cnt, npos,
        |        COALESCE(CAST(sum(cnt) OVER (ORDER BY sc
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |          0) AS cb
        |      FROM g),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
        |        CAST(sum(npos) AS BIGINT) AS n1,
        |        CAST(sum(npos * (2*cb + cnt + 1)) AS BIGINT) AS u2s
        |      FROM r)
        |SELECT n1 AS n_pos, n - n1 AS n_neg,
        |  CAST(u2s - n1*(n1+1) AS DOUBLE) / CAST(2*n1*(n - n1) AS DOUBLE) AS auc
        |FROM t""".stripMargin,

    "customer_target_encoding" ->
      """WITH j AS (
        |  SELECT c_mktsegment AS seg,
        |         CAST(floor(o_totalprice * 100e0 + 0.5e0) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |seg AS (SELECT seg, count(*) AS n_orders,
        |          CAST(sum(cents) AS BIGINT) AS sum_cents
        |        FROM j GROUP BY 1),
        |g AS (SELECT count(*) AS gn, CAST(sum(cents) AS BIGINT) AS gs FROM j)
        |SELECT seg, n_orders,
        |  CAST(sum_cents AS DOUBLE) / CAST(n_orders AS DOUBLE) / 100e0
        |    AS raw_mean,
        |  (CAST(sum_cents AS DOUBLE)
        |     + 20e0 * (CAST(gs AS DOUBLE) / CAST(gn AS DOUBLE)))
        |    / CAST(n_orders + 20 AS DOUBLE) / 100e0 AS enc
        |FROM seg, g ORDER BY seg""".stripMargin,

    "lineitem_corr_matrix" ->
      """WITH m AS (
        |  SELECT count(*) AS n,
        |    sum(q) AS sq, sum(p) AS sp, sum(d) AS sd, sum(t) AS st,
        |    sum(q*q) AS sqq, sum(p*p) AS spp, sum(d*d) AS sdd,
        |    sum(t*t) AS stt,
        |    sum(q*p) AS sqp, sum(q*d) AS sqd, sum(q*t) AS sqt,
        |    sum(p*d) AS spd, sum(p*t) AS spt, sum(d*t) AS sdt
        |  FROM (SELECT CAST(l_quantity AS BIGINT) AS q,
        |               CAST(floor(l_extendedprice) AS BIGINT) AS p,
        |               CAST(floor(l_discount * 100e0 + 0.5e0) AS BIGINT) AS d,
        |               CAST(floor(l_tax * 100e0 + 0.5e0) AS BIGINT) AS t
        |        FROM lineitem))
        |SELECT x, y, CAST(n AS BIGINT) AS n,
        |  -- HUGEINT→DOUBLE via VARCHAR: DuckDB's direct cast TRUNCATES
        |  -- above 2^53 while Spark's Decimal→Double (and strtod) round to
        |  -- nearest — the string round-trip restores the shared contract.
        |  CAST(CAST(num AS VARCHAR) AS DOUBLE)
        |    / sqrt(CAST(CAST(vx AS VARCHAR) AS DOUBLE)
        |           * CAST(CAST(vy AS VARCHAR) AS DOUBLE))
        |    AS corr
        |FROM (
        |  SELECT 'quantity' AS x, 'price' AS y, n,
        |    n*sqp - sq*sp AS num, n*sqq - sq*sq AS vx, n*spp - sp*sp AS vy
        |  FROM m
        |  UNION ALL SELECT 'quantity', 'discount', n,
        |    n*sqd - sq*sd, n*sqq - sq*sq, n*sdd - sd*sd FROM m
        |  UNION ALL SELECT 'quantity', 'tax', n,
        |    n*sqt - sq*st, n*sqq - sq*sq, n*stt - st*st FROM m
        |  UNION ALL SELECT 'price', 'discount', n,
        |    n*spd - sp*sd, n*spp - sp*sp, n*sdd - sd*sd FROM m
        |  UNION ALL SELECT 'price', 'tax', n,
        |    n*spt - sp*st, n*spp - sp*sp, n*stt - st*st FROM m
        |  UNION ALL SELECT 'discount', 'tax', n,
        |    n*sdt - sd*st, n*sdd - sd*sd, n*stt - st*st FROM m)
        |ORDER BY x, y""".stripMargin,

    "text_naive_bayes" ->
      s"""WITH w AS (
         |  SELECT doc_id, lang,
         |    unnest(string_split(${util.Norm.normalizeSql("text")}, ' ')) AS word
         |  FROM documents),
         |w2 AS (SELECT * FROM w WHERE word <> ''),
         |tr AS (SELECT * FROM w2 WHERE doc_id % 10 <> 0),
         |te AS (SELECT * FROM w2 WHERE doc_id % 10 = 0),
         |model AS (
         |  SELECT lang AS mlang, word,
         |    CAST(floor(ln(count(*) + 1) * 1e4 + 0.5) AS BIGINT) AS qc
         |  FROM tr GROUP BY 1, 2),
         |lt AS (
         |  SELECT t.mlang,
         |    CAST(floor(ln(t.ntok + v.v) * 1e4 + 0.5) AS BIGINT) AS qdenom,
         |    CAST(floor(ln(d.ndocs) * 1e4 + 0.5) AS BIGINT) AS qprior
         |  FROM (SELECT lang AS mlang, count(*) AS ntok FROM tr GROUP BY 1) t
         |  JOIN (SELECT lang AS mlang, count(DISTINCT doc_id) AS ndocs
         |        FROM tr GROUP BY 1) d USING (mlang)
         |  CROSS JOIN (SELECT count(DISTINCT word) AS v FROM tr) v),
         |dl AS (SELECT doc_id, count(*) AS dn FROM te GROUP BY 1),
         |sc AS (
         |  SELECT te.doc_id, te.lang AS truth, lt.mlang,
         |    CAST(sum(COALESCE(m.qc, 0)) AS BIGINT) AS sqc,
         |    max(lt.qdenom) AS qdenom, max(lt.qprior) AS qprior
         |  FROM te CROSS JOIN lt
         |  LEFT JOIN model m ON m.word = te.word AND m.mlang = lt.mlang
         |  GROUP BY 1, 2, 3),
         |scored AS (
         |  SELECT sc.doc_id, truth, mlang, sqc - dl.dn * qdenom + qprior AS score
         |  FROM sc JOIN dl USING (doc_id)),
         |pred AS (
         |  SELECT truth, mlang AS pred,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, mlang) AS rn
         |  FROM scored)
         |SELECT truth, pred, count(*) AS n_docs
         |FROM pred WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

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

    "events_decision_stump" ->
      """WITH s AS (
        |  SELECT CAST(floor(value * 100e0 + 0.5e0) AS BIGINT) AS sc,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM events),
        |g AS (SELECT sc, count(*) AS cnt, CAST(sum(pos) AS BIGINT) AS npos
        |      FROM s GROUP BY 1),
        |c AS (SELECT sc,
        |        CAST(sum(cnt) OVER (ORDER BY sc
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |          AS nl,
        |        CAST(sum(npos) OVER (ORDER BY sc
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |          AS pl
        |      FROM g),
        |t AS (SELECT max(nl) AS n, max(pl) AS p FROM c),
        |sc2 AS (SELECT sc, nl, pl, n - nl AS nr, p - pl AS pr
        |        FROM c, t WHERE nl < n),
        |q AS (SELECT *,
        |        CAST((2 * (CAST(pl AS HUGEINT) * (nl - pl) * nr
        |                   + CAST(pr AS HUGEINT) * (nr - pr) * nl) * 1000000)
        |             // (CAST(nl AS HUGEINT) * nr) AS BIGINT) AS gini_q
        |      FROM sc2),
        |b AS (SELECT *, row_number() OVER (ORDER BY gini_q, sc) AS rn FROM q)
        |SELECT CAST(sc AS DOUBLE) / 100e0 AS threshold,
        |  CAST(gini_q AS DOUBLE) / 1e6 AS weighted_gini,
        |  nl AS n_left, nr AS n_right,
        |  CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE) AS pos_rate_left,
        |  CAST(pr AS DOUBLE) / CAST(nr AS DOUBLE) AS pos_rate_right
        |FROM b WHERE rn = 1""".stripMargin,

    "events_calibration" ->
      """WITH s AS (
        |  SELECT CAST(floor(value * 100e0 + 0.5e0) AS BIGINT) AS sc,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        |  FROM events),
        |g AS (SELECT sc, count(*) AS cnt, CAST(sum(pos) AS BIGINT) AS npos
        |      FROM s GROUP BY 1),
        |r AS (SELECT sc, cnt, npos,
        |        COALESCE(CAST(sum(cnt) OVER (ORDER BY sc
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |          0) AS cb
        |      FROM g),
        |d AS (SELECT *, 2*cb + cnt + 1 AS dm FROM r),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM g),
        |bb AS (SELECT (10*dm - 1) // (2*n) AS bin, cnt, npos, dm, n
        |       FROM d, t)
        |SELECT bin, CAST(sum(cnt) AS BIGINT) AS n_rows,
        |  CAST(CAST(sum(cnt*dm) AS BIGINT) AS DOUBLE)
        |    / (2e0 * CAST(max(n) AS DOUBLE)
        |       * CAST(CAST(sum(cnt) AS BIGINT) AS DOUBLE)) AS avg_pred,
        |  CAST(CAST(sum(npos) AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(sum(cnt) AS BIGINT) AS DOUBLE) AS obs_rate
        |FROM bb GROUP BY bin ORDER BY bin""".stripMargin,

    "text_feature_hashing" ->
      s"""WITH w AS (
         |  SELECT unnest(string_split(${util.Norm.normalizeSql("text")}, ' '))
         |    AS word
         |  FROM documents),
         |w2 AS (SELECT * FROM w WHERE word <> ''),
         |bw AS (SELECT word, count(*) AS tf FROM w2 GROUP BY 1),
         |bk AS (
         |  SELECT CAST(concat('0x', substring(md5(word), 1, 8)) AS BIGINT)
         |           % 512 AS bucket,
         |         count(*) AS n_words, CAST(sum(tf) AS BIGINT) AS tokens
         |  FROM bw GROUP BY 1),
         |hist AS (SELECT n_words, count(*) AS n_buckets,
         |           CAST(sum(tokens) AS BIGINT) AS tokens
         |         FROM bk GROUP BY 1),
         |e AS (SELECT CAST(0 AS BIGINT) AS n_words,
         |        512 - count(*) AS n_buckets, CAST(0 AS BIGINT) AS tokens
         |      FROM bk HAVING 512 - count(*) > 0)
         |SELECT * FROM hist UNION ALL SELECT * FROM e ORDER BY n_words""".stripMargin,

    "text_bpe_merge_step" ->
      s"""WITH w AS (
         |  SELECT unnest(string_split(${util.Norm.normalizeSql("text")}, ' '))
         |    AS word
         |  FROM documents),
         |w2 AS (SELECT * FROM w WHERE word <> ''),
         |bw AS (SELECT word, count(*) AS tf FROM w2 GROUP BY 1),
         |p AS (SELECT substring(word, CAST(i AS INTEGER), 2) AS pair, tf
         |      FROM (SELECT word, tf, unnest(range(1, length(word))) AS i
         |            FROM bw WHERE length(word) >= 2))
         |SELECT pair, CAST(sum(tf) AS BIGINT) AS freq
         |FROM p GROUP BY 1 ORDER BY freq DESC, pair LIMIT 20""".stripMargin,

    "events_bootstrap_ci" -> {
      val t = (0 to 5).map(poissonCdfU32)
      s"""WITH e AS (
         |  SELECT event_id,
         |    CAST(floor(value * 100e0 + 0.5e0) AS BIGINT) AS cents
         |  FROM events),
         |x AS (SELECT event_id, cents, unnest(range(0, 32)) AS b FROM e),
         |kk AS (
         |  SELECT b, cents,
         |    CASE WHEN u < ${t(0)} THEN 0 WHEN u < ${t(1)} THEN 1
         |         WHEN u < ${t(2)} THEN 2 WHEN u < ${t(3)} THEN 3
         |         WHEN u < ${t(4)} THEN 4 WHEN u < ${t(5)} THEN 5
         |         ELSE 6 END AS k
         |  FROM (SELECT b, cents,
         |      CAST(concat('0x', substring(md5(concat(
         |        CAST(event_id AS VARCHAR), ':', CAST(b AS VARCHAR))), 1, 8))
         |        AS BIGINT) AS u
         |    FROM x)),
         |r AS (SELECT b, CAST(sum(k * cents) AS BIGINT) AS skc,
         |        CAST(sum(k) AS BIGINT) AS sk
         |      FROM kk GROUP BY 1),
         |m AS (SELECT b,
         |        CAST(skc AS DOUBLE) / CAST(sk AS DOUBLE) / 100e0 AS mean_b,
         |        row_number() OVER (ORDER BY
         |          CAST(skc AS DOUBLE) / CAST(sk AS DOUBLE) / 100e0, b) AS rn
         |      FROM r),
         |f AS (SELECT CAST(sum(cents) AS BIGINT) AS s, count(*) AS n FROM e)
         |SELECT CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100e0 AS mean,
         |  (SELECT mean_b FROM m WHERE rn = 2) AS ci_lo,
         |  (SELECT mean_b FROM m WHERE rn = 31) AS ci_hi,
         |  CAST(32 AS BIGINT) AS n_replicas
         |FROM f""".stripMargin
    },

    "events_survival_km" ->
      """WITH pu AS (
        |  SELECT user_id, min(day) AS d0,
        |    min(CASE WHEN isp THEN day END) AS dp, max(day) AS dl
        |  FROM (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |          event_type = 'purchase' AS isp FROM events)
        |  GROUP BY 1),
        |du AS (SELECT
        |    CASE WHEN dp IS NOT NULL THEN dp - d0 ELSE dl - d0 END AS dur,
        |    CASE WHEN dp IS NOT NULL THEN 1 ELSE 0 END AS ev
        |  FROM pu),
        |g AS (SELECT dur, CAST(sum(ev) AS BIGINT) AS d,
        |        CAST(sum(1 - ev) AS BIGINT) AS c
        |      FROM du GROUP BY 1),
        |t AS (SELECT CAST(sum(d + c) AS BIGINT) AS nn FROM g),
        |a AS (SELECT g.*,
        |        nn - COALESCE(CAST(sum(d + c) OVER (ORDER BY dur
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |          0) AS at_risk
        |      FROM g, t),
        |q AS (SELECT *,
        |        CASE WHEN d = 0 THEN 0
        |             WHEN at_risk > d THEN
        |               CAST(floor(ln(at_risk - d) * 1e6 + 0.5) AS BIGINT)
        |               - CAST(floor(ln(at_risk) * 1e6 + 0.5) AS BIGINT)
        |             ELSE 0 END AS qterm
        |      FROM a),
        |q2 AS (SELECT *,
        |        CASE WHEN at_risk = d AND d > 0 THEN NULL
        |             ELSE CAST(sum(qterm) OVER (ORDER BY dur
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |               AS BIGINT) END AS qlog_surv
        |      FROM q)
        |SELECT dur, at_risk, d AS events, c AS censored, qlog_surv,
        |  CASE WHEN qlog_surv IS NULL THEN '0.0000e+00'
        |       ELSE printf('%.4e', exp(CAST(qlog_surv AS DOUBLE) / 1e6))
        |  END AS surv
        |FROM q2 ORDER BY dur""".stripMargin,

    "emb_pca_power" ->
      """WITH comps AS MATERIALIZED (
        |  SELECT vec_id, i,
        |    CAST(floor(CAST(x AS DOUBLE) * 1e4 + 0.5) AS BIGINT) AS xq
        |  FROM (SELECT vec_id, unnest(embedding) AS x,
        |          unnest(range(0, len(embedding))) AS i
        |        FROM embeddings)),
        |sums AS (SELECT i, CAST(sum(xq) AS BIGINT) AS si
        |         FROM comps GROUP BY 1),
        |nn AS (SELECT count(*) // 64 AS n FROM comps),
        |cx AS (SELECT a.i AS i, b.i AS j,
        |         CAST(sum(a.xq * b.xq) AS BIGINT) AS sij
        |       FROM comps a JOIN comps b USING (vec_id) GROUP BY 1, 2),
        |cov AS MATERIALIZED (
        |  SELECT c.i, c.j,
        |    CAST(n.n AS HUGEINT) * sij
        |      - CAST(si.si AS HUGEINT) * sj.si AS c
        |  FROM cx c JOIN sums si ON si.i = c.i
        |  JOIN sums sj ON sj.i = c.j CROSS JOIN nn n),
        |v0 AS (SELECT i AS dim, CAST(1 AS HUGEINT) AS v FROM sums),
        |w1 AS (SELECT cov.i AS dim, sum(cov.c * v.v) AS w
        |       FROM cov JOIN v0 v ON cov.j = v.dim GROUP BY 1),
        |m1 AS (SELECT max(abs(w)) AS m FROM w1),
        |v1 AS MATERIALIZED (SELECT dim,
        |        CASE WHEN w < 0 THEN -((abs(w) * 1000000) // m)
        |             ELSE (abs(w) * 1000000) // m END AS v
        |      FROM w1, m1),
        |w2 AS (SELECT cov.i AS dim, sum(cov.c * v.v) AS w
        |       FROM cov JOIN v1 v ON cov.j = v.dim GROUP BY 1),
        |m2 AS (SELECT max(abs(w)) AS m FROM w2),
        |v2 AS MATERIALIZED (SELECT dim,
        |        CASE WHEN w < 0 THEN -((abs(w) * 1000000) // m)
        |             ELSE (abs(w) * 1000000) // m END AS v
        |      FROM w2, m2),
        |w3 AS (SELECT cov.i AS dim, sum(cov.c * v.v) AS w
        |       FROM cov JOIN v2 v ON cov.j = v.dim GROUP BY 1),
        |m3 AS (SELECT max(abs(w)) AS m FROM w3),
        |v3 AS MATERIALIZED (SELECT dim,
        |        CASE WHEN w < 0 THEN -((abs(w) * 1000000) // m)
        |             ELSE (abs(w) * 1000000) // m END AS v
        |      FROM w3, m3),
        |num AS (SELECT sum(vi.v * cov.c * vj.v) AS num
        |        FROM cov JOIN v3 vi ON cov.i = vi.dim
        |        JOIN v3 vj ON cov.j = vj.dim),
        |den AS (SELECT sum(v * v) AS den FROM v3)
        |SELECT dim, CAST(v AS DOUBLE) / 1e6 AS loading,
        |  CAST(CAST(num AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(den AS VARCHAR) AS DOUBLE) / 1e8 AS eigenvalue_q8
        |FROM v3, num, den ORDER BY dim""".stripMargin,

    "events_attribution_linear" ->
      """WITH p AS (SELECT user_id AS pu, epoch_ns(ts) AS tp, event_id AS pid
        |           FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT user_id AS tu, epoch_ns(ts) AS tt, event_type AS touch
        |      FROM events WHERE event_type IN ('click', 'view', 'signup')),
        |pairs AS (
        |  SELECT pid, touch
        |  FROM p LEFT JOIN t ON pu = tu AND tt < tp
        |    AND tt >= tp - 86400000000000),
        |pt AS (SELECT pid, touch, count(*) AS cnt
        |       FROM pairs WHERE touch IS NOT NULL GROUP BY 1, 2),
        |k AS (SELECT pid, CAST(sum(cnt) AS BIGINT) AS k FROM pt GROUP BY 1),
        |cr AS (SELECT touch, CAST(sum(cnt) AS BIGINT) AS n_touches,
        |         CAST(sum(cnt * (1000000 // k)) AS BIGINT) AS cq
        |       FROM pt JOIN k USING (pid) GROUP BY 1),
        |di AS (SELECT '(direct)' AS touch, count(*) AS n_touches,
        |         CAST(count(*) * 1000000 AS BIGINT) AS cq
        |       FROM pairs WHERE touch IS NULL HAVING count(*) > 0)
        |SELECT touch, n_touches, CAST(cq AS DOUBLE) / 1e6 AS credit
        |FROM (SELECT * FROM cr UNION ALL SELECT * FROM di)
        |ORDER BY touch""".stripMargin,

    "graph_modularity" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem),
        |e AS MATERIALIZED (
        |  SELECT a.p AS u, b.p AS v
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |nb AS (SELECT u AS n, v AS m FROM e UNION ALL SELECT v, u FROM e),
        |pl AS (SELECT p_partkey AS n, p_brand AS l FROM part),
        |deg AS (SELECT n, count(*) AS dg FROM nb GROUP BY 1),
        |nl AS MATERIALIZED (
        |  SELECT deg.n, deg.dg, pl.l FROM deg JOIN pl USING (n)),
        |mm AS (SELECT count(*) AS m FROM e),
        |ec AS (SELECT lu.l AS c, count(*) AS e_c
        |       FROM e JOIN pl lu ON lu.n = e.u JOIN pl lv ON lv.n = e.v
        |       WHERE lu.l = lv.l GROUP BY 1),
        |dc AS (SELECT l AS c, CAST(sum(dg) AS BIGINT) AS d_c
        |       FROM nl GROUP BY 1),
        |terms AS (SELECT CAST(4 * mm.m * COALESCE(ec.e_c, 0)
        |            - dc.d_c * dc.d_c AS BIGINT) AS term
        |          FROM dc LEFT JOIN ec USING (c) CROSS JOIN mm),
        |sz AS (SELECT l, count(*) AS sz FROM nl GROUP BY 1)
        |SELECT (SELECT count(*) FROM nl) AS n_nodes,
        |  (SELECT m FROM mm) AS n_edges,
        |  (SELECT count(DISTINCT l) FROM nl) AS n_communities,
        |  (SELECT max(sz) FROM sz) AS largest,
        |  CAST((SELECT CAST(sum(term) AS BIGINT) FROM terms) AS DOUBLE)
        |    / (4e0 * (SELECT m FROM mm) * (SELECT m FROM mm))
        |    AS modularity""".stripMargin,

    "docs_importance_sampling" ->
      s"""WITH base AS (
         |  SELECT doc_id, n_chars,
         |    CAST(len(string_split(${util.Norm.normalizeSql("text")}, ' '))
         |      AS BIGINT) AS n_words,
         |    least(1000, 50 + n_chars // 20) AS p_mille,
         |    CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
         |      AS BIGINT) % 1000 AS u_mille
         |  FROM documents),
         |s AS (SELECT count(*) AS n_sampled,
         |        CAST(sum((n_words * 1000000) // p_mille) AS BIGINT) AS ht_q
         |      FROM base WHERE u_mille < p_mille),
         |t AS (SELECT count(*) AS n_docs,
         |        CAST(sum(n_words) AS BIGINT) AS true_tokens
         |      FROM base)
         |SELECT n_docs, n_sampled, true_tokens,
         |  CAST(ht_q AS DOUBLE) / 1000e0 AS est_tokens,
         |  (CAST(ht_q AS DOUBLE) / 1000e0 - CAST(true_tokens AS DOUBLE))
         |    / CAST(true_tokens AS DOUBLE) AS rel_error
         |FROM t, s""".stripMargin,

    "events_ttest_welch" ->
      """WITH e AS (
        |  SELECT (user_id % 2 = 1) AS t,
        |    CAST(floor(value * 100e0 + 0.5e0) AS BIGINT) AS x
        |  FROM events),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN t THEN x ELSE 0 END) AS BIGINT) AS s1,
        |    CAST(sum(CASE WHEN t THEN x*x ELSE 0 END) AS BIGINT) AS ss1,
        |    CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN NOT t THEN x ELSE 0 END) AS BIGINT) AS s2,
        |    CAST(sum(CASE WHEN NOT t THEN x*x ELSE 0 END) AS BIGINT) AS ss2
        |  FROM e),
        |d AS (SELECT *,
        |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
        |    CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
        |    CAST(CAST(CAST(n1 AS HUGEINT)*ss1 - CAST(s1 AS HUGEINT)*s1
        |        AS VARCHAR) AS DOUBLE)
        |      / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE))
        |      / CAST(n1 AS DOUBLE) AS v1,
        |    CAST(CAST(CAST(n2 AS HUGEINT)*ss2 - CAST(s2 AS HUGEINT)*s2
        |        AS VARCHAR) AS DOUBLE)
        |      / (CAST(n2 AS DOUBLE) * CAST(n2 - 1 AS DOUBLE))
        |      / CAST(n2 AS DOUBLE) AS v2
        |  FROM m)
        |SELECT n1, n2, (m1 - m2) / 100e0 AS mean_diff,
        |  (m1 - m2) / sqrt(v1 + v2) AS t_stat,
        |  ((v1 + v2) * (v1 + v2))
        |    / (v1*v1 / CAST(n1 - 1 AS DOUBLE)
        |       + v2*v2 / CAST(n2 - 1 AS DOUBLE)) AS df_welch
        |FROM d""".stripMargin,

    "events_power_analysis" -> {
      val zz = PowerZSum * PowerZSum
      s"""WITH e AS (
         |  SELECT (user_id % 2 = 1) AS t,
         |    CAST(floor(value * 100e0 + 0.5e0) AS BIGINT) AS x
         |  FROM events),
         |m AS (SELECT
         |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |    CAST(sum(CASE WHEN t THEN x ELSE 0 END) AS BIGINT) AS s1,
         |    CAST(sum(CASE WHEN t THEN x*x ELSE 0 END) AS BIGINT) AS ss1,
         |    CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         |    CAST(sum(CASE WHEN NOT t THEN x ELSE 0 END) AS BIGINT) AS s2,
         |    CAST(sum(CASE WHEN NOT t THEN x*x ELSE 0 END) AS BIGINT) AS ss2
         |  FROM e),
         |d AS (SELECT *,
         |    (CAST(n1 - 1 AS DOUBLE)
         |       * (CAST(CAST(CAST(n1 AS HUGEINT)*ss1 - CAST(s1 AS HUGEINT)*s1
         |            AS VARCHAR) AS DOUBLE)
         |          / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE)))
         |     + CAST(n2 - 1 AS DOUBLE)
         |       * (CAST(CAST(CAST(n2 AS HUGEINT)*ss2 - CAST(s2 AS HUGEINT)*s2
         |            AS VARCHAR) AS DOUBLE)
         |          / (CAST(n2 AS DOUBLE) * CAST(n2 - 1 AS DOUBLE))))
         |    / CAST(n1 + n2 - 2 AS DOUBLE) AS sp2,
         |    0.02e0 * (CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) AS mde
         |  FROM m)
         |SELECT n1, n2, mde / 100e0 AS mde_abs, sp2 / 1e4 AS sigma2_pooled,
         |  CAST(ceil((2e0 * $zz * sp2) / (mde * mde)) AS BIGINT) AS n_per_arm
         |FROM d""".stripMargin
    },

    "emb_knn_classifier" ->
      s"""WITH vecs AS ${sim.Similarity.vecsSql},
         |${sim.Similarity.bruteTopKSql(
              "(SELECT * FROM vecs WHERE id % 10 = 0)",
              "(SELECT * FROM vecs WHERE id % 10 <> 0)", 5)},
         |lab AS (SELECT vec_id AS id, label FROM embeddings),
         |votes AS (SELECT t.query_id, l.label AS nlabel, count(*) AS votes
         |          FROM topk t JOIN lab l ON l.id = t.vec_id GROUP BY 1, 2),
         |pred AS (SELECT query_id, nlabel,
         |           row_number() OVER (PARTITION BY query_id
         |             ORDER BY votes DESC, nlabel) AS rn
         |         FROM votes)
         |SELECT lt.label AS truth, p.nlabel AS pred, count(*) AS n_vecs
         |FROM pred p JOIN lab lt ON lt.id = p.query_id
         |WHERE p.rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "emb_silhouette" ->
      """WITH comps AS MATERIALIZED (
        |  SELECT vec_id, label, i,
        |    CAST(floor(CAST(x AS DOUBLE) * 1e4 + 0.5) AS BIGINT) AS xq
        |  FROM (SELECT vec_id, label, unnest(embedding) AS x,
        |          unnest(range(0, len(embedding))) AS i
        |        FROM embeddings)),
        |cs AS (SELECT label AS cl, i, CAST(sum(xq) AS BIGINT) AS sx,
        |         count(*) AS cn
        |       FROM comps GROUP BY 1, 2),
        |cents AS (SELECT cl, i,
        |            CASE WHEN sx < 0 THEN -((-sx) // cn) ELSE sx // cn END
        |              AS cq
        |          FROM cs),
        |d2 AS (SELECT c.vec_id, c.label, ce.cl,
        |         CAST(sum((c.xq - ce.cq) * (c.xq - ce.cq)) AS BIGINT) AS d2
        |       FROM comps c JOIN cents ce USING (i) GROUP BY 1, 2, 3),
        |pv AS (SELECT vec_id, label,
        |         sqrt(CAST(max(CASE WHEN cl = label THEN d2 END) AS DOUBLE))
        |           AS a,
        |         sqrt(CAST(min(CASE WHEN cl <> label THEN d2 END) AS DOUBLE))
        |           AS b
        |       FROM d2 GROUP BY 1, 2),
        |sq AS (SELECT label,
        |         CAST(floor((b - a) / greatest(a, b) * 1e6 + 0.5) AS BIGINT)
        |           AS sq6
        |       FROM pv)
        |SELECT label, count(*) AS n_vecs,
        |  CAST(CAST(sum(sq6) AS BIGINT) AS DOUBLE) / 1e6
        |    / CAST(count(*) AS DOUBLE) AS mean_silhouette
        |FROM sq GROUP BY label ORDER BY label""".stripMargin,

    "text_textrank_keywords" -> {
      val edgesSql =
        s"""WITH w AS (
           |  SELECT doc_id, word, pos FROM (
           |    SELECT doc_id,
           |      unnest(string_split(${util.Norm.normalizeSql("text")}, ' '))
           |        AS word,
           |      unnest(range(1,
           |        len(string_split(${util.Norm.normalizeSql("text")}, ' '))
           |          + 1)) AS pos
           |    FROM documents)
           |  WHERE word <> ''),
           |p AS (SELECT word AS wa,
           |        lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS wb
           |      FROM w),
           |p2 AS (SELECT wa, wb FROM p WHERE wb IS NOT NULL AND wa <> wb),
           |ids AS (SELECT word,
           |          CAST(row_number() OVER (ORDER BY word) AS BIGINT) AS wid
           |        FROM (SELECT DISTINCT word FROM w)),
           |und AS (SELECT DISTINCT least(ia.wid, ib.wid) AS u,
           |          greatest(ia.wid, ib.wid) AS v
           |        FROM p2 JOIN ids ia ON ia.word = p2.wa
           |        JOIN ids ib ON ib.word = p2.wb)
           |SELECT u AS src, v AS dst FROM und
           |UNION ALL SELECT v, u FROM und""".stripMargin
      s"""${graph.PageRank.ranksSql(edgesSql, 6)},
         |idmap AS (
         |  SELECT word, CAST(row_number() OVER (ORDER BY word) AS BIGINT)
         |    AS wid
         |  FROM (SELECT DISTINCT word FROM (
         |    SELECT unnest(string_split(${util.Norm.normalizeSql("text")}, ' '))
         |      AS word
         |    FROM documents) WHERE word <> ''))
         |SELECT i.word, r.pr FROM r6 r JOIN idmap i ON i.wid = r.node
         |ORDER BY r.pr DESC, i.word LIMIT 20""".stripMargin
    },

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

    "docs_perplexity_heldout" ->
      s"""WITH w AS (
         |  SELECT doc_id, lang,
         |    unnest(string_split(${util.Norm.normalizeSql("text")}, ' '))
         |      AS word
         |  FROM documents),
         |w2 AS (SELECT * FROM w WHERE word <> ''),
         |tr AS (SELECT * FROM w2 WHERE doc_id % 10 <> 0),
         |model AS (SELECT word,
         |            CAST(floor(ln(count(*) + 1) * 1e4 + 0.5) AS BIGINT)
         |              AS qc
         |          FROM tr GROUP BY 1),
         |denom AS (SELECT CAST(floor(ln(count(*) + count(DISTINCT word))
         |            * 1e4 + 0.5) AS BIGINT) AS qd
         |          FROM tr),
         |te AS (SELECT t.lang, d.qd - COALESCE(m.qc, 0) AS nll_q
         |       FROM w2 t LEFT JOIN model m USING (word) CROSS JOIN denom d
         |       WHERE t.doc_id % 10 = 0)
         |SELECT lang, count(*) AS n_tokens,
         |  CAST(CAST(sum(nll_q) AS BIGINT) AS DOUBLE) / 1e4
         |    / CAST(count(*) AS DOUBLE) AS avg_nll,
         |  printf('%.4e', exp(CAST(CAST(sum(nll_q) AS BIGINT) AS DOUBLE)
         |    / 1e4 / CAST(count(*) AS DOUBLE))) AS perplexity
         |FROM te GROUP BY lang ORDER BY lang""".stripMargin,

    "part_skyline" ->
      """WITH parts AS (
        |  SELECT p_partkey,
        |    CAST(floor(p_retailprice * 100e0 + 0.5e0) AS BIGINT) AS cents,
        |    CAST(p_size AS BIGINT) AS size
        |  FROM part),
        |grain AS (
        |  SELECT cents,
        |    max(bs) OVER (ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cm_prev,
        |    max(bs) OVER (ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm_incl
        |  FROM (SELECT cents, max(size) AS bs FROM parts GROUP BY 1)),
        |j AS (SELECT p.p_partkey, p.cents, p.size, g.cm_prev, g.cm_incl
        |      FROM parts p JOIN grain g USING (cents))
        |SELECT p_partkey, CAST(cents AS DOUBLE) / 100e0 AS price, size
        |FROM j
        |WHERE NOT (COALESCE(cm_prev, -9223372036854775808) >= size
        |           OR cm_incl > size)
        |ORDER BY price, size, p_partkey""".stripMargin,

    "events_srm_check" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1,
        |    CAST(sum(CASE WHEN user_id % 2 <> 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n2
        |  FROM u)
        |SELECT n1, n2,
        |  CAST((n1 - n2) * (n1 - n2) AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)
        |    AS chi2,
        |  CAST(CAST((n1 - n2) * (n1 - n2) AS DOUBLE)
        |    / CAST(n1 + n2 AS DOUBLE) > 3.84 AS INTEGER) AS srm_flag
        |FROM m""".stripMargin,

    "part_fifo_allocation" ->
      """WITH li AS (
        |  SELECT l_partkey AS p, l_shipdate AS d, l_orderkey AS ok,
        |    l_linenumber AS ln,
        |    CAST(floor(l_quantity) AS BIGINT) AS q,
        |    CAST(floor(l_extendedprice * 100e0 + 0.5e0) AS BIGINT) AS pc
        |  FROM lineitem),
        |r0 AS (SELECT *, CAST(sum(q) OVER (PARTITION BY p
        |         ORDER BY d, ok, ln
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS hi
        |       FROM li WHERE ok % 2 = 0),
        |rc AS (SELECT p, hi - q AS rb, hi AS re, q AS rq, pc FROM r0),
        |i0 AS (SELECT *, CAST(sum(q) OVER (PARTITION BY p
        |         ORDER BY d, ok, ln
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS hi
        |       FROM li WHERE ok % 2 = 1),
        |iss AS (SELECT p, hi - q AS ib, hi AS ie FROM i0),
        |m AS (SELECT iss.p,
        |        least(rc.re, iss.ie) - greatest(rc.rb, iss.ib) AS mm,
        |        rc.rq, rc.pc
        |      FROM iss JOIN rc ON iss.p = rc.p
        |        AND rc.rb < iss.ie AND iss.ib < rc.re),
        |ma AS (SELECT p, CAST(sum(mm) AS BIGINT) AS matched,
        |         CAST(sum((pc * mm) // rq) AS BIGINT) AS cogs_cents
        |       FROM m GROUP BY 1),
        |it AS (SELECT p, max(ie) AS issued FROM iss GROUP BY 1)
        |SELECT it.p AS p_partkey, it.issued,
        |  COALESCE(ma.matched, 0) AS matched,
        |  COALESCE(ma.cogs_cents, 0) AS cogs_cents
        |FROM it LEFT JOIN ma USING (p) ORDER BY p_partkey""".stripMargin,

    "events_scd2_lookup" ->
      """WITH ev AS (
        |  SELECT user_id, event_type AS state, epoch_us(ts) AS ts_us,
        |    event_id
        |  FROM events WHERE event_type <> 'purchase'),
        |runs AS (
        |  SELECT user_id, state, ts_us, event_id
        |  FROM (SELECT *, lag(state) OVER (
        |          PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_state
        |        FROM ev)
        |  WHERE prev_state IS NULL OR prev_state <> state),
        |dim AS (
        |  SELECT user_id AS du, state, ts_us AS vf,
        |    lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
        |      AS vt
        |  FROM runs),
        |f AS (SELECT user_id, epoch_us(ts) AS fts,
        |        CAST(floor(value * 100e0 + 0.5e0) AS BIGINT) AS cents
        |      FROM events WHERE event_type = 'purchase')
        |SELECT COALESCE(d.state, '(none)') AS state_at_purchase,
        |  count(*) AS n_purchases,
        |  CAST(sum(f.cents) AS BIGINT) AS cents
        |FROM f LEFT JOIN dim d ON d.du = f.user_id AND f.fts >= d.vf
        |  AND (d.vt IS NULL OR f.fts < d.vt)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "orders_dupe_invoice_detect" ->
      """WITH base AS (
        |  SELECT o_custkey AS cust, o_orderkey AS okey,
        |    CAST(floor(o_totalprice * 100e0 + 0.5e0) AS BIGINT) AS cents,
        |    CAST(date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS day
        |  FROM orders),
        |lhs AS (SELECT *, cents // 10000 AS band FROM base),
        |rhs AS (SELECT cust AS cust_b, okey AS okey_b, cents AS cents_b,
        |          day AS day_b, cents // 10000 + d.i AS band
        |        FROM base CROSS JOIN (SELECT unnest(range(-1, 2)) AS i) d)
        |SELECT l.cust, l.okey AS okey_a, r.okey_b,
        |  abs(l.cents - r.cents_b) AS diff_cents,
        |  abs(l.day - r.day_b) AS day_gap
        |FROM lhs l JOIN rhs r
        |  ON l.cust = r.cust_b AND l.band = r.band AND l.okey < r.okey_b
        |  AND abs(l.cents - r.cents_b) <= 10000 AND abs(l.day - r.day_b) <= 90
        |ORDER BY cust, okey_a, okey_b""".stripMargin,

    "emb_mmr_rerank" -> {
      def cos(a: String, b: String) = sim.Similarity.cosineSql(a, b)
      val steps = (2 to 5).map { k =>
        s"""cand$k AS (
           |  SELECT c.vec_id, any_value(c.vec) AS vec, c.sim,
           |    max(${cos("c.vec", "s.vec")}) AS maxsel
           |  FROM cands c CROSS JOIN acc${k - 1} s
           |  WHERE c.vec_id NOT IN (SELECT vec_id FROM acc${k - 1})
           |  GROUP BY c.vec_id, c.sim),
           |sel$k AS (
           |  SELECT vec_id, vec, sim, $k AS rank,
           |    0.7e0 * sim - 0.3e0 * maxsel AS mmr_score
           |  FROM cand$k ORDER BY mmr_score DESC, vec_id LIMIT 1),
           |acc$k AS (SELECT * FROM acc${k - 1}
           |          UNION ALL SELECT * FROM sel$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH vecs AS ${sim.Similarity.vecsSql},
         |${sim.Similarity.bruteTopKSql("(SELECT * FROM vecs WHERE id = 0)", "vecs", 20)},
         |cands AS (
         |  SELECT t.vec_id, v.vec, t.sim
         |  FROM topk t JOIN vecs v ON v.id = t.vec_id),
         |sel1 AS (SELECT vec_id, vec, sim, 1 AS rank, sim AS mmr_score
         |         FROM cands ORDER BY sim DESC, vec_id LIMIT 1),
         |acc1 AS (SELECT * FROM sel1),
         |$steps
         |SELECT rank, vec_id, sim, mmr_score FROM acc5 ORDER BY rank""".stripMargin
    },

    "events_revenue_decomp" ->
      """WITH p AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(floor(value * 100e0 + 0.5e0) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |t AS (SELECT max(day) AS maxd FROM p),
        |m AS (
        |  SELECT CASE WHEN day > maxd - 7 THEN 'curr'
        |              WHEN day > maxd - 14 THEN 'prev' END AS period,
        |    count(DISTINCT user_id) AS u, CAST(sum(cents) AS BIGINT) AS r
        |  FROM p, t
        |  WHERE day > maxd - 14
        |  GROUP BY 1),
        |wide AS (
        |  SELECT max(CASE WHEN period = 'prev' THEN u END) AS u_prev,
        |    max(CASE WHEN period = 'curr' THEN u END) AS u_curr,
        |    max(CASE WHEN period = 'prev' THEN r END) AS r_prev,
        |    max(CASE WHEN period = 'curr' THEN r END) AS r_curr
        |  FROM m),
        |d AS (SELECT *,
        |    CAST(r_prev AS DOUBLE) / CAST(u_prev AS DOUBLE) AS rpu_prev,
        |    CAST(r_curr AS DOUBLE) / CAST(u_curr AS DOUBLE) AS rpu_curr
        |  FROM wide)
        |SELECT u_prev, u_curr,
        |  CAST(r_prev AS DOUBLE) / 100e0 AS rev_prev,
        |  CAST(r_curr AS DOUBLE) / 100e0 AS rev_curr,
        |  CAST(r_curr - r_prev AS DOUBLE) / 100e0 AS delta_total,
        |  CAST(u_curr - u_prev AS DOUBLE) * rpu_prev / 100e0 AS contrib_users,
        |  CAST(u_curr AS DOUBLE) * (rpu_curr - rpu_prev) / 100e0
        |    AS contrib_arpu
        |FROM d""".stripMargin,

    // Spark's window(ts, 2h, 1h) assigns each event to the two hourly
    // starts h and h−1 (start ≤ t < start+2h ⇔ start ∈ {⌊t/1h⌋, ⌊t/1h⌋−1}
    // hours) — replayed here as the explicit ×2 fan-out.
    "events_hopping_window" ->
      """WITH e AS (
        |  SELECT epoch_ns(ts) // 1000 AS us, event_type, user_id,
        |    CAST(floor(value * 1e8 + 0.5) AS BIGINT) AS vq
        |  FROM events),
        |w AS (
        |  SELECT ((us // 3600000000) - i.i) * 3600000000 AS w_start_us,
        |    event_type, user_id, vq
        |  FROM e CROSS JOIN (SELECT unnest(range(0, 2)) AS i) i)
        |SELECT w_start_us, event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(sum(vq) AS BIGINT) AS sum_value_q8
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

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

    "events_psi_drift" ->
      """WITH e AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(floor(value * 100e0 + 0.5e0) AS BIGINT) // 2500 AS vband
        |  FROM events),
        |t AS (SELECT (min(day) + max(day) + 1) // 2 AS cutd FROM e),
        |cells AS (
        |  SELECT event_type, vband,
        |    CAST(sum(CASE WHEN day < cutd THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c_ref,
        |    CAST(sum(CASE WHEN day >= cutd THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c_cur
        |  FROM e, t GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, CAST(sum(c_ref) AS BIGINT) AS n_ref,
        |    CAST(sum(c_cur) AS BIGINT) AS n_cur, count(*) AS n_bands
        |  FROM cells GROUP BY 1),
        |terms AS (
        |  SELECT c.event_type, n_ref, n_cur, n_bands,
        |    CAST(c_ref + 1 AS DOUBLE) / CAST(n_ref + n_bands AS DOUBLE) AS p,
        |    CAST(c_cur + 1 AS DOUBLE) / CAST(n_cur + n_bands AS DOUBLE) AS q,
        |    CAST(floor(ln(CAST(c_ref + 1 AS DOUBLE)) * 1e4 + 0.5) AS BIGINT)
        |      - CAST(floor(ln(CAST(n_ref + n_bands AS DOUBLE)) * 1e4 + 0.5)
        |          AS BIGINT)
        |      - CAST(floor(ln(CAST(c_cur + 1 AS DOUBLE)) * 1e4 + 0.5)
        |          AS BIGINT)
        |      + CAST(floor(ln(CAST(n_cur + n_bands AS DOUBLE)) * 1e4 + 0.5)
        |          AS BIGINT) AS lnr_q4
        |  FROM cells c JOIN tot USING (event_type))
        |SELECT event_type, max(n_ref) AS n_ref, max(n_cur) AS n_cur,
        |  max(n_bands) AS n_bands,
        |  CAST(sum(CAST(floor((p - q) * CAST(lnr_q4 AS DOUBLE) / 1e4 * 1e9
        |    + 0.5) AS BIGINT)) AS DOUBLE) / 1e9 AS psi
        |FROM terms GROUP BY 1 ORDER BY event_type""".stripMargin,

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

    "events_funnel_windowed" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_ns(ts) AS tns FROM events),
        |su AS (SELECT user_id, min(tns) AS su_ts FROM ev
        |       WHERE event_type = 'signup' GROUP BY 1),
        |ck AS (SELECT e.user_id, min(tns) AS ck_ts
        |       FROM ev e JOIN su USING (user_id)
        |       WHERE event_type = 'click' AND tns > su_ts
        |         AND tns <= su_ts + 3600000000000
        |       GROUP BY 1),
        |pu AS (SELECT e.user_id, min(tns) AS pu_ts
        |       FROM ev e JOIN ck USING (user_id)
        |       WHERE event_type = 'purchase' AND tns > ck_ts
        |         AND tns <= ck_ts + 86400000000000
        |       GROUP BY 1)
        |SELECT (SELECT count(*) FROM su) AS n_signup,
        |  (SELECT count(*) FROM ck) AS n_click_1h,
        |  (SELECT count(*) FROM pu) AS n_purchase_24h,
        |  CAST((SELECT count(*) FROM ck) AS DOUBLE)
        |    / CAST((SELECT count(*) FROM su) AS DOUBLE) AS cvr_click,
        |  CAST((SELECT count(*) FROM pu) AS DOUBLE)
        |    / CAST(nullif((SELECT count(*) FROM ck), 0) AS DOUBLE)
        |    AS cvr_purchase""".stripMargin,

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

    "orders_abc_class" ->
      s"""WITH rev AS (
         |  SELECT l_partkey,
         |    sum(${util.Stable.dec2Sql("l_extendedprice")} *
         |        (${util.Stable.rate2Sql("1.0")} -
         |         ${util.Stable.rate2Sql("l_discount")})) AS rev
         |  FROM lineitem GROUP BY 1),
         |tot AS (SELECT sum(rev) AS total FROM rev),
         |cum AS (
         |  SELECT l_partkey, rev,
         |    sum(rev) OVER (ORDER BY rev DESC, l_partkey
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM rev),
         |cls AS (
         |  SELECT CASE WHEN cum * 100 <= total * 80 THEN 'A'
         |              WHEN cum * 100 <= total * 95 THEN 'B'
         |              ELSE 'C' END AS abc_class, rev, total
         |  FROM cum, tot)
         |SELECT abc_class, count(*) AS n_parts,
         |  CAST(sum(rev) AS DOUBLE) AS revenue,
         |  CAST(sum(rev) AS DOUBLE) / CAST(max(total) AS DOUBLE) AS share
         |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin,

    "graph_assortativity" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |edges AS (
        |  SELECT a.p AS u, b.p AS v
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |d2 AS (SELECT u AS x, v AS y FROM edges
        |       UNION ALL SELECT v, u FROM edges),
        |deg AS (SELECT x, count(*) AS d FROM d2 GROUP BY 1),
        |ed AS (
        |  SELECT gx.d AS dx, gy.d AS dy
        |  FROM d2 JOIN deg gx ON d2.x = gx.x JOIN deg gy ON d2.y = gy.x),
        |m AS (
        |  SELECT count(*) AS m2,
        |    CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
        |    CAST(sum(dx*dx) AS BIGINT) AS sxx,
        |    CAST(sum(dy*dy) AS BIGINT) AS syy,
        |    CAST(sum(dx*dy) AS BIGINT) AS sxy
        |  FROM ed)
        |SELECT CAST(m2 AS BIGINT) AS m2,
        |  CAST(m2*sxy - sx*sy AS DOUBLE)
        |    / nullif(sqrt(CAST(m2*sxx - sx*sx AS DOUBLE)
        |                  * CAST(m2*syy - sy*sy AS DOUBLE)), 0.0)
        |    AS assortativity
        |FROM m""".stripMargin,

    "docs_source_similarity" ->
      s"""WITH ws AS (
         |  SELECT DISTINCT source, word FROM (
         |    SELECT source,
         |      unnest(string_split(${util.Norm.normalizeSql("text")}, ' ')) AS word
         |    FROM documents) WHERE word <> ''),
         |vocab AS (SELECT source, count(*) AS n_vocab FROM ws GROUP BY 1),
         |hh AS (SELECT DISTINCT source,
         |         CAST(concat('0x', substring(md5(concat('kmv:', word)), 1, 8))
         |           AS BIGINT) AS h
         |       FROM ws),
         |r AS (SELECT source, h,
         |        row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
         |        count(*) OVER (PARTITION BY source) AS nd
         |      FROM hh),
         |kt AS (SELECT source, max(CASE WHEN rn = 256 THEN h END) AS h_k,
         |         CAST(least(max(nd), 256) AS BIGINT) AS ks
         |       FROM r WHERE rn <= 256 GROUP BY 1),
         |est AS (SELECT source,
         |          CASE WHEN ks < 256 THEN CAST(ks AS DOUBLE)
         |               ELSE (255 * 4294967296.0) / h_k END AS e
         |        FROM kt),
         |pairs AS (SELECT a.source AS sa, b.source AS sb
         |          FROM vocab a JOIN vocab b ON a.source < b.source),
         |-- Union sketch ≡ top-k of the full distinct hash union (any
         |-- hash outside its source's top-k has ≥k smaller hashes in the
         |-- union, so it can never enter the union's top-k).
         |ph AS (SELECT DISTINCT p.sa, p.sb, hh.h
         |       FROM pairs p JOIN hh ON hh.source = p.sa OR hh.source = p.sb),
         |pr AS (SELECT sa, sb, h,
         |         row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn,
         |         count(*) OVER (PARTITION BY sa, sb) AS nd
         |       FROM ph),
         |pu AS (SELECT sa, sb, max(CASE WHEN rn = 256 THEN h END) AS h_k,
         |         CAST(least(max(nd), 256) AS BIGINT) AS ks
         |       FROM pr WHERE rn <= 256 GROUP BY 1, 2),
         |eu AS (SELECT sa, sb,
         |         CASE WHEN ks < 256 THEN CAST(ks AS DOUBLE)
         |              ELSE (255 * 4294967296.0) / h_k END AS e_u
         |       FROM pu),
         |it AS (SELECT x.source AS sa, y.source AS sb, count(*) AS n_inter
         |       FROM ws x JOIN ws y ON x.word = y.word AND x.source < y.source
         |       GROUP BY 1, 2)
         |SELECT p.sa AS src_a, p.sb AS src_b,
         |  va.n_vocab AS n_vocab_a, vb.n_vocab AS n_vocab_b,
         |  CAST(coalesce(it.n_inter, 0) AS BIGINT) AS n_inter,
         |  CAST(coalesce(it.n_inter, 0) AS DOUBLE)
         |    / CAST(va.n_vocab + vb.n_vocab - coalesce(it.n_inter, 0) AS DOUBLE)
         |    AS j_exact,
         |  eu.e_u AS est_union,
         |  greatest(0.0, ea.e + eb.e - eu.e_u) / eu.e_u AS j_est
         |FROM pairs p
         |JOIN vocab va ON va.source = p.sa
         |JOIN vocab vb ON vb.source = p.sb
         |JOIN est ea ON ea.source = p.sa
         |JOIN est eb ON eb.source = p.sb
         |JOIN eu ON eu.sa = p.sa AND eu.sb = p.sb
         |LEFT JOIN it ON it.sa = p.sa AND it.sb = p.sb
         |ORDER BY 1, 2""".stripMargin,

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

    "text_readability" ->
      s"""WITH d AS (
         |  SELECT lang,
         |    len(list_filter(string_split(${util.Norm.normalizeSql("text")}, ' '),
         |      x -> x <> '')) AS w,
         |    len(list_filter(string_split_regex(text, '[.!?]+'),
         |      x -> trim(x) <> '')) AS sen,
         |    length(regexp_replace(regexp_replace(
         |      ${util.Norm.normalizeSql("text")}, '[aeiou]+', 'V', 'g'),
         |      '[^V]', '', 'g')) AS y
         |  FROM documents),
         |agg AS (
         |  SELECT lang, count(*) AS n_docs,
         |    CAST(sum(w) AS BIGINT) AS words,
         |    CAST(sum(sen) AS BIGINT) AS sentences,
         |    CAST(sum(y) AS BIGINT) AS syllables
         |  FROM d GROUP BY 1)
         |SELECT lang, n_docs, words, sentences, syllables,
         |  CAST(words AS DOUBLE) / CAST(nullif(sentences, 0) AS DOUBLE) AS wps,
         |  CAST(syllables AS DOUBLE) / CAST(nullif(words, 0) AS DOUBLE) AS spw,
         |  206.835e0
         |    - 1.015e0 * (CAST(words AS DOUBLE) / CAST(nullif(sentences, 0) AS DOUBLE))
         |    - 84.6e0 * (CAST(syllables AS DOUBLE) / CAST(nullif(words, 0) AS DOUBLE))
         |    AS flesch
         |FROM agg ORDER BY lang""".stripMargin,

    "events_stickiness" ->
      """WITH d1 AS (
        |  SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS day, user_id
        |  FROM events),
        |d2 AS (SELECT day // 30 AS w30, day, user_id FROM d1),
        |dau AS (SELECT w30, day, count(DISTINCT user_id) AS dau
        |        FROM d2 GROUP BY 1, 2),
        |mau AS (SELECT w30, count(DISTINCT user_id) AS mau FROM d2 GROUP BY 1),
        |agg AS (SELECT w30, count(*) AS n_days,
        |          CAST(sum(dau) AS BIGINT) AS sum_dau
        |        FROM dau GROUP BY 1)
        |SELECT a.w30, n_days, mau, sum_dau,
        |  CAST(sum_dau AS DOUBLE) / CAST(n_days AS DOUBLE) AS avg_dau,
        |  CAST(sum_dau AS DOUBLE) / CAST(n_days AS DOUBLE) / CAST(mau AS DOUBLE)
        |    AS stickiness
        |FROM agg a JOIN mau USING (w30) ORDER BY w30""".stripMargin,

    "events_pr_curve" ->
      """WITH grain AS (
        |  SELECT CAST(floor(value * 100e0 + 0.5e0) AS BIGINT) AS sc,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS np,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END)
        |      AS BIGINT) AS nn
        |  FROM events GROUP BY 1),
        |r AS (
        |  SELECT sc, row_number() OVER (ORDER BY sc DESC) AS rn,
        |    CAST(sum(np) OVER (ORDER BY sc DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_tp,
        |    CAST(sum(nn) OVER (ORDER BY sc DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_fp,
        |    ntile(10) OVER (ORDER BY sc DESC) AS tile,
        |    CAST(sum(np) OVER () AS BIGINT) AS tot_p
        |  FROM grain),
        |b AS (SELECT tile, max(rn) AS brn FROM r GROUP BY 1)
        |SELECT r.tile, r.sc AS threshold_cents, cum_tp, cum_fp,
        |  CAST(cum_tp AS DOUBLE) / CAST(cum_tp + cum_fp AS DOUBLE)
        |    AS "precision",
        |  CAST(cum_tp AS DOUBLE) / CAST(tot_p AS DOUBLE) AS recall,
        |  2.0e0 * (CAST(cum_tp AS DOUBLE) / CAST(cum_tp + cum_fp AS DOUBLE))
        |    * (CAST(cum_tp AS DOUBLE) / CAST(tot_p AS DOUBLE))
        |    / nullif((CAST(cum_tp AS DOUBLE) / CAST(cum_tp + cum_fp AS DOUBLE))
        |             + (CAST(cum_tp AS DOUBLE) / CAST(tot_p AS DOUBLE)), 0.0)
        |    AS f1
        |FROM r JOIN b ON r.tile = b.tile AND r.rn = b.brn
        |ORDER BY r.tile""".stripMargin,

    "events_lift_gain" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS clicks,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS buyer
        |  FROM events GROUP BY 1),
        |t AS (SELECT *, ntile(10) OVER (ORDER BY clicks DESC, user_id)
        |        AS decile FROM u),
        |d AS (SELECT decile, count(*) AS n_users,
        |        CAST(sum(buyer) AS BIGINT) AS n_buyers
        |      FROM t GROUP BY 1),
        |c AS (SELECT *,
        |    CAST(sum(n_users) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_users,
        |    CAST(sum(n_buyers) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_buyers,
        |    CAST(sum(n_users) OVER () AS BIGINT) AS tot_users,
        |    CAST(sum(n_buyers) OVER () AS BIGINT) AS tot_buyers
        |  FROM d)
        |SELECT decile, n_users, n_buyers, cum_buyers,
        |  CAST(cum_buyers AS DOUBLE) / CAST(tot_buyers AS DOUBLE) AS gain,
        |  (CAST(cum_buyers AS DOUBLE) / CAST(tot_buyers AS DOUBLE))
        |    / (CAST(cum_users AS DOUBLE) / CAST(tot_users AS DOUBLE)) AS lift
        |FROM c ORDER BY decile""".stripMargin,

    "events_asof_nearest" ->
      """WITH us AS (SELECT * REPLACE (epoch_us(ts) AS ts) FROM events),
        |probe AS (SELECT * FROM us WHERE event_type = 'error'),
        |matches AS (SELECT * FROM us WHERE event_type = 'click'),
        |bk AS (SELECT p.event_id, p.user_id, p.ts AS ts_us, m.ts AS bts
        |       FROM probe p ASOF LEFT JOIN matches m
        |         ON p.user_id = m.user_id AND p.ts >= m.ts),
        |fw AS (SELECT p.event_id, m.ts AS fts
        |       FROM probe p ASOF LEFT JOIN matches m
        |         ON p.user_id = m.user_id AND p.ts <= m.ts),
        |g AS (
        |  SELECT bk.event_id, bk.user_id, bk.ts_us,
        |    CASE WHEN bts IS NOT NULL AND ts_us - bts <= 3600000000
        |         THEN ts_us - bts END AS bgap,
        |    CASE WHEN fts IS NOT NULL AND fts - ts_us <= 3600000000
        |         THEN fts - ts_us END AS fgap,
        |    bts, fts
        |  FROM bk JOIN fw USING (event_id)),
        |dd AS (
        |  SELECT *,
        |    CASE WHEN bgap IS NOT NULL AND (fgap IS NULL OR bgap <= fgap)
        |           THEN 'back'
        |         WHEN fgap IS NOT NULL THEN 'fwd'
        |         ELSE 'none' END AS dir
        |  FROM g)
        |SELECT event_id, user_id, ts_us,
        |  CASE WHEN dir = 'back' THEN bts
        |       WHEN dir = 'fwd' THEN fts END AS nearest_match_ts_us,
        |  CASE WHEN dir = 'back' THEN bgap
        |       WHEN dir = 'fwd' THEN fgap END AS gap_us,
        |  dir
        |FROM dd ORDER BY event_id""".stripMargin,

    "events_kmv_rolling" ->
      """WITH e AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(user_id AS VARCHAR) AS u
        |  FROM events),
        |mx AS (SELECT max(day) AS maxd FROM e),
        |hh AS (SELECT DISTINCT day,
        |         CAST(concat('0x', substring(md5(concat('kmv:', u)), 1, 8))
        |           AS BIGINT) AS h
        |       FROM e),
        |tg AS (SELECT day + i.i AS t, h
        |       FROM hh CROSS JOIN (SELECT unnest(range(0, 7)) AS i) i),
        |tgd AS (SELECT DISTINCT t, h FROM tg CROSS JOIN mx WHERE t <= maxd),
        |r AS (SELECT t, h,
        |        row_number() OVER (PARTITION BY t ORDER BY h) AS rn,
        |        count(*) OVER (PARTITION BY t) AS nd
        |      FROM tgd),
        |kt AS (SELECT t, max(CASE WHEN rn = 256 THEN h END) AS h_k,
        |         CAST(least(max(nd), 256) AS BIGINT) AS ks
        |       FROM r WHERE rn <= 256 GROUP BY 1),
        |uex AS (SELECT t, count(DISTINCT u) AS n_exact
        |        FROM (SELECT day + i.i AS t, u
        |              FROM e CROSS JOIN (SELECT unnest(range(0, 7)) AS i) i) s
        |        CROSS JOIN mx WHERE t <= maxd GROUP BY 1)
        |SELECT kt.t AS day, n_exact, ks AS kmv_size,
        |  CASE WHEN ks < 256 THEN CAST(ks AS DOUBLE)
        |       ELSE (255 * 4294967296.0) / h_k END AS n_est
        |FROM kt JOIN uex ON kt.t = uex.t
        |ORDER BY 1""".stripMargin,

    "docs_quality_ablation" -> {
      import text.TextAnalysis.{GateMinWords, GateMaxTopWordRatio, GateMinQuality}
      s"""WITH ${qualityGateSql("documents")},
         |f AS (
         |  SELECT *,
         |    CAST(n_words < $GateMinWords AS BIGINT) AS f1,
         |    CAST(lang_id = 'und' AS BIGINT) AS f2,
         |    CAST(top_word_ratio > $GateMaxTopWordRatio AS BIGINT) AS f3,
         |    CAST(quality_score < $GateMinQuality AS BIGINT) AS f4
         |  FROM gate),
         |a AS (
         |  SELECT count(*) AS n_docs, CAST(sum(keep) AS BIGINT) AS n_keep,
         |    CAST(sum(f1) AS BIGINT) AS a1,
         |    CAST(sum(CASE WHEN f1 = 1 AND f1+f2+f3+f4 = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS s1,
         |    CAST(sum(f2) AS BIGINT) AS a2,
         |    CAST(sum(CASE WHEN f2 = 1 AND f1+f2+f3+f4 = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS s2,
         |    CAST(sum(f3) AS BIGINT) AS a3,
         |    CAST(sum(CASE WHEN f3 = 1 AND f1+f2+f3+f4 = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS s3,
         |    CAST(sum(f4) AS BIGINT) AS a4,
         |    CAST(sum(CASE WHEN f4 = 1 AND f1+f2+f3+f4 = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS s4
         |  FROM f)
         |SELECT signal, n_fail, n_sole_fail, n_docs, n_keep FROM (
         |  SELECT 'too_short' AS signal, a1 AS n_fail, s1 AS n_sole_fail,
         |    n_docs, n_keep FROM a
         |  UNION ALL SELECT 'lang_unknown', a2, s2, n_docs, n_keep FROM a
         |  UNION ALL SELECT 'repetitive', a3, s3, n_docs, n_keep FROM a
         |  UNION ALL SELECT 'low_quality', a4, s4, n_docs, n_keep FROM a)
         |ORDER BY signal""".stripMargin
    },

    "mm_phash_near_dup" -> {
      val clen = "((length(txt) + 14) // 15)"
      val phash = (0 until 15).map { i =>
        s"(CAST(concat('0x', substr(md5(concat('ph:', substring(txt, $i * $clen + 1, $clen))), 1, 1)) AS BIGINT) * ${1L << (4 * i)})"
      }.mkString("(", " + ", ")")
      s"""WITH base AS (
         |  SELECT doc_id AS media_id, text AS txt FROM documents),
         |copies AS (
         |  SELECT media_id + 1000000 AS media_id,
         |    substring(txt, 1, length(txt) // 2) || 'XX' ||
         |      substring(txt, length(txt) // 2 + 3, length(txt)) AS txt
         |  FROM base WHERE media_id % 37 = 5),
         |assets AS (SELECT * FROM base UNION ALL SELECT * FROM copies),
         |ph AS (SELECT media_id, $phash AS phash FROM assets),
         |bands AS (
         |  SELECT media_id, phash, b.b AS b,
         |    (phash >> (b.b * 15)) % 32768 AS bv
         |  FROM ph CROSS JOIN (SELECT unnest(range(0, 4)) AS b) b),
         |pairs AS (
         |  SELECT DISTINCT x.media_id AS id_a, y.media_id AS id_b,
         |    CAST(bit_count(xor(x.phash, y.phash)) AS BIGINT) AS hamming
         |  FROM bands x JOIN bands y
         |    ON x.b = y.b AND x.bv = y.bv AND x.media_id < y.media_id)
         |SELECT id_a, id_b, hamming FROM pairs
         |WHERE hamming <= 8 ORDER BY id_a, id_b""".stripMargin
    },

    "emb_dim_variance" ->
      """WITH ex AS (
        |  SELECT CAST(i AS BIGINT) - 1 AS dim_idx,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e4 + 0.5) AS BIGINT)
        |      AS q
        |  FROM (SELECT embedding, unnest(range(1, len(embedding) + 1)) AS i
        |        FROM embeddings)),
        |m AS (
        |  SELECT dim_idx, count(*) AS n, CAST(sum(q) AS BIGINT) AS s1,
        |    CAST(sum(q * q) AS BIGINT) AS s2
        |  FROM ex GROUP BY 1)
        |SELECT dim_idx, n,
        |  CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 1e4 AS mean,
        |  CAST(n * s2 - s1 * s1 AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 1e8 AS variance,
        |  row_number() OVER (ORDER BY
        |    CAST(n * s2 - s1 * s1 AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 1e8 DESC, dim_idx)
        |    AS var_rank
        |FROM m ORDER BY dim_idx""".stripMargin,

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

    "text_hapax_ratio" ->
      s"""WITH wc AS (
         |  SELECT lang, word, count(*) AS c FROM (
         |    SELECT lang,
         |      unnest(string_split(${util.Norm.normalizeSql("text")}, ' ')) AS word
         |    FROM documents) WHERE word <> '' GROUP BY 1, 2)
         |SELECT lang, count(*) AS vocab,
         |  CAST(sum(c) AS BIGINT) AS tokens,
         |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
         |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS hapax_vocab_share,
         |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) AS hapax_token_share
         |FROM wc GROUP BY 1 ORDER BY lang""".stripMargin,

    "graph_clustering_coeff" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |edges AS (
        |  SELECT a.p AS u, b.p AS v
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (
        |  SELECT n, count(*) AS dg
        |  FROM (SELECT u AS n FROM edges UNION ALL SELECT v FROM edges)
        |  GROUP BY 1),
        |pi AS (SELECT n, dg * 10000000000 + n AS pi FROM deg),
        |o AS (
        |  SELECT CASE WHEN pu.pi < pv.pi THEN e.u ELSE e.v END AS src,
        |         CASE WHEN pu.pi < pv.pi THEN e.v ELSE e.u END AS dst,
        |         greatest(pu.pi, pv.pi) AS pi_dst
        |  FROM edges e JOIN pi pu ON pu.n = e.u JOIN pi pv ON pv.n = e.v),
        |w AS (
        |  SELECT e1.dst AS b, e2.dst AS c
        |  FROM o e1 JOIN o e2 ON e1.src = e2.src AND e1.pi_dst < e2.pi_dst),
        |t AS (SELECT count(*) AS n_triangles
        |      FROM w JOIN o ON o.src = w.b AND o.dst = w.c)
        |SELECT (SELECT count(*) FROM deg) AS n_nodes,
        |  (SELECT count(*) FROM edges) AS n_edges,
        |  (SELECT CAST(sum(dg * (dg - 1) // 2) AS BIGINT) FROM deg)
        |    AS n_wedges,
        |  (SELECT n_triangles FROM t) AS n_triangles,
        |  CAST((SELECT n_triangles FROM t) * 3 AS DOUBLE)
        |    / nullif(CAST((SELECT CAST(sum(dg * (dg - 1) // 2) AS BIGINT)
        |                   FROM deg) AS DOUBLE), 0.0) AS global_cc""".stripMargin,

    "customer_value_migration" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
        |      AS day,
        |    CAST(floor(o_totalprice * 100e0 + 0.5e0) AS BIGINT) AS cents
        |  FROM orders),
        |t AS (SELECT (min(day) + max(day) + 1) // 2 AS cutd FROM o),
        |halves AS (
        |  SELECT CASE WHEN day < cutd THEN 'h1' ELSE 'h2' END AS half,
        |    o_custkey, CAST(sum(cents) AS BIGINT) AS rev
        |  FROM o CROSS JOIN t GROUP BY 1, 2),
        |t1 AS (SELECT o_custkey,
        |         concat('q', ntile(5) OVER (ORDER BY rev DESC, o_custkey))
        |           AS tier_h1
        |       FROM halves WHERE half = 'h1'),
        |t2 AS (SELECT o_custkey,
        |         concat('q', ntile(5) OVER (ORDER BY rev DESC, o_custkey))
        |           AS tier_h2
        |       FROM halves WHERE half = 'h2')
        |SELECT coalesce(tier_h1, 'none') AS from_tier,
        |  coalesce(tier_h2, 'none') AS to_tier,
        |  count(*) AS n_customers
        |FROM t1 FULL JOIN t2 USING (o_custkey)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "events_mutual_info" ->
      """WITH ev AS (
        |  SELECT event_type AS y,
        |    CAST(floor(value * 100e0 + 0.5e0) AS BIGINT) // 2500 AS x
        |  FROM events),
        |cells AS (SELECT x, y, count(*) AS nxy FROM ev GROUP BY 1, 2),
        |mx AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM cells GROUP BY 1),
        |my AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(nxy) AS BIGINT) AS nn, count(*) AS n_cells
        |        FROM cells),
        |terms AS (
        |  SELECT nxy, nn, n_cells,
        |    CAST(floor(ln(CAST(nxy AS DOUBLE)) * 1e4 + 0.5) AS BIGINT)
        |      + CAST(floor(ln(CAST(nn AS DOUBLE)) * 1e4 + 0.5) AS BIGINT)
        |      - CAST(floor(ln(CAST(nx AS DOUBLE)) * 1e4 + 0.5) AS BIGINT)
        |      - CAST(floor(ln(CAST(ny AS DOUBLE)) * 1e4 + 0.5) AS BIGINT)
        |      AS lnr_q4
        |  FROM cells JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot)
        |SELECT max(nn) AS n, max(n_cells) AS n_cells,
        |  CAST(sum(CAST(floor(CAST(nxy AS DOUBLE) / CAST(nn AS DOUBLE)
        |    * (CAST(lnr_q4 AS DOUBLE) / 1e4) * 1e9 + 0.5) AS BIGINT))
        |    AS DOUBLE) / 1e9 AS mi_nats
        |FROM terms""".stripMargin,

    "orders_negative_samples" ->
      """WITH parts AS (
        |  SELECT p_partkey,
        |    row_number() OVER (ORDER BY p_partkey) AS pidx
        |  FROM part),
        |np AS (SELECT count(*) AS np FROM parts),
        |custs AS (SELECT DISTINCT o_custkey FROM orders),
        |cands AS (
        |  SELECT c.o_custkey, i.i,
        |    CAST(concat('0x', substring(
        |      md5(concat('neg:', CAST(c.o_custkey AS VARCHAR), ':',
        |                 CAST(i.i AS VARCHAR))), 1, 8)) AS BIGINT)
        |      % np.np + 1 AS pidx
        |  FROM custs c CROSS JOIN (SELECT unnest(range(0, 6)) AS i) i
        |  CROSS JOIN np),
        |cp AS (SELECT cands.o_custkey, cands.i, parts.p_partkey
        |       FROM cands JOIN parts USING (pidx)),
        |purchased AS (
        |  SELECT DISTINCT o.o_custkey, l.l_partkey AS p_partkey
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |surv AS (
        |  SELECT cp.o_custkey, cp.p_partkey, min(cp.i) AS i
        |  FROM cp LEFT JOIN purchased pu
        |    ON cp.o_custkey = pu.o_custkey AND cp.p_partkey = pu.p_partkey
        |  WHERE pu.o_custkey IS NULL
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT o_custkey, p_partkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY i) AS rank
        |  FROM surv)
        |SELECT o_custkey, CAST(rank AS BIGINT) AS rank, p_partkey
        |FROM ranked WHERE rank <= 3
        |ORDER BY o_custkey, rank""".stripMargin,

    "emb_triplet_mining" ->
      s"""WITH emb AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
         |    AS v, label
         |  FROM embeddings),
         |anchors AS (SELECT vec_id AS a_id, v AS av, label AS a_label
         |            FROM emb WHERE vec_id % 29 = 0),
         |scored AS (
         |  SELECT a.a_id, a.a_label, c.vec_id AS c_id, c.label AS c_label,
         |    CAST(floor(${sim.Similarity.cosineSql("a.av", "c.v")} * 1e6 + 0.5)
         |      AS BIGINT) + 2000000 AS simq
         |  FROM emb c CROSS JOIN anchors a WHERE c.vec_id <> a.a_id),
         |agg AS (
         |  SELECT a_id, a_label,
         |    max(CASE WHEN c_label <> a_label
         |        THEN simq * 10000000000 + (9999999999 - c_id) END) AS nk,
         |    min(CASE WHEN c_label = a_label
         |        THEN simq * 10000000000 + c_id END) AS pk
         |  FROM scored GROUP BY 1, 2)
         |SELECT a_id, a_label,
         |  pk % 10000000000 AS pos_id,
         |  CAST(pk // 10000000000 - 2000000 AS DOUBLE) / 1e6 AS pos_sim,
         |  9999999999 - (nk % 10000000000) AS neg_id,
         |  CAST(nk // 10000000000 - 2000000 AS DOUBLE) / 1e6 AS neg_sim,
         |  CAST(pk // 10000000000 - 2000000 AS DOUBLE) / 1e6
         |    - CAST(nk // 10000000000 - 2000000 AS DOUBLE) / 1e6 AS margin
         |FROM agg WHERE nk IS NOT NULL AND pk IS NOT NULL
         |ORDER BY a_id""".stripMargin,

    "data_contract_check" ->
      """WITH a AS (
        |  SELECT count(*) AS n,
        |    count(*) - count(DISTINCT event_id) AS v_unique,
        |    CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS v_null_user,
        |    CAST(sum(CASE WHEN event_type NOT IN
        |      ('click', 'purchase', 'signup', 'view', 'error')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v_enum,
        |    CAST(sum(CASE WHEN value < 0.0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS v_negval,
        |    CAST(sum(CASE WHEN epoch_ns(ts) // 86400000000000 < 19000
        |      OR epoch_ns(ts) // 86400000000000 > 20500
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v_tsrange,
        |    CAST(sum(CASE WHEN props IS NULL OR NOT json_valid(props)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v_json
        |  FROM events)
        |SELECT "constraint", n AS n_checked, n_violations,
        |  CAST(n_violations = 0 AS INTEGER) AS pass
        |FROM (
        |  SELECT 'event_id_unique' AS "constraint", n,
        |    v_unique AS n_violations FROM a
        |  UNION ALL SELECT 'user_id_not_null', n, v_null_user FROM a
        |  UNION ALL SELECT 'event_type_in_enum', n, v_enum FROM a
        |  UNION ALL SELECT 'value_non_negative', n, v_negval FROM a
        |  UNION ALL SELECT 'ts_in_range', n, v_tsrange FROM a
        |  UNION ALL SELECT 'props_valid_json', n, v_json FROM a)
        |ORDER BY "constraint"""".stripMargin,

    "docs_code_detect" ->
      """WITH d AS (
        |  SELECT source, length(text) AS n_chars,
        |    length(text)
        |      - length(regexp_replace(text, '[{}()\[\];=<>]', '', 'g')) AS sym
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN sym * 100 > n_chars * 3 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_code_like,
        |  CAST(sum(sym) AS BIGINT) AS sym_chars,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(CAST(sum(sym) AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE) AS sym_density
        |FROM d GROUP BY 1 ORDER BY source""".stripMargin,

    "docs_boilerplate_lines" ->
      """WITH wf AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0
        |         THEN text || '. FOOTER ALPHA. ALL RIGHTS RESERVED'
        |         ELSE text END AS text
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, trim(sent) AS sent FROM (
        |    SELECT doc_id, unnest(string_split_regex(text, '\. ')) AS sent
        |    FROM wf)
        |  WHERE trim(sent) <> '')
        |SELECT sent, count(DISTINCT doc_id) AS df, count(*) AS n_occurrences,
        |  CAST(sum(length(sent)) AS BIGINT) AS reclaim_chars
        |FROM s GROUP BY 1 HAVING count(DISTINCT doc_id) >= 20
        |ORDER BY sent""".stripMargin,

    "events_attribution_timedecay" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_ns(ts) AS tns, event_id
        |  FROM events),
        |p AS (SELECT user_id AS pu, tns AS tp, event_id AS pid
        |      FROM ev WHERE event_type = 'purchase'),
        |t AS (SELECT user_id AS tu, tns AS tt, event_type AS touch
        |      FROM ev WHERE event_type IN ('click', 'view', 'signup')),
        |pairs AS (
        |  SELECT p.pid, p.tp, t.tt, t.touch
        |  FROM p LEFT JOIN t ON pu = tu AND tt < tp
        |    AND tt >= tp - 86400000000000),
        |w AS (SELECT pid, touch,
        |        16 >> CAST((tp - tt) // 21600000000000 AS INTEGER) AS w
        |      FROM pairs WHERE touch IS NOT NULL),
        |pt AS (SELECT pid, touch, count(*) AS cnt,
        |         CAST(sum(w) AS BIGINT) AS sw
        |       FROM w GROUP BY 1, 2),
        |tws AS (SELECT pid, CAST(sum(sw) AS BIGINT) AS twv FROM pt GROUP BY 1),
        |cr AS (SELECT touch, CAST(sum(cnt) AS BIGINT) AS n_touches,
        |         CAST(sum((sw * 1000000) // twv) AS BIGINT) AS cq
        |       FROM pt JOIN tws USING (pid) GROUP BY 1),
        |dr AS (SELECT '(direct)' AS touch, count(*) AS n_touches,
        |         CAST(count(*) * 1000000 AS BIGINT) AS cq
        |       FROM pairs WHERE touch IS NULL)
        |SELECT touch, n_touches, CAST(cq AS DOUBLE) / 1e6 AS credit
        |FROM (SELECT * FROM cr UNION ALL SELECT * FROM dr)
        |ORDER BY touch""".stripMargin,

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

    "text_entity_extract" ->
      """WITH d AS (
        |  SELECT source,
        |    len(regexp_extract_all(text, '[0-9]+')) AS n_numbers,
        |    len(regexp_extract_all(text, '[A-Z][a-z]+')) AS n_capitalized,
        |    len(regexp_extract_all(text, 'https?://[^ ]+')) AS n_urls,
        |    len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+'))
        |      AS n_emails
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_numbers) AS BIGINT) AS n_numbers,
        |  CAST(sum(n_capitalized) AS BIGINT) AS n_capitalized,
        |  CAST(sum(n_urls) AS BIGINT) AS n_urls,
        |  CAST(sum(n_emails) AS BIGINT) AS n_emails
        |FROM d GROUP BY 1 ORDER BY source""".stripMargin,

    "graph_degree_histogram" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |edges AS (
        |  SELECT a.p AS u, b.p AS v
        |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (
        |  SELECT n, count(*) AS dg
        |  FROM (SELECT u AS n FROM edges UNION ALL SELECT v FROM edges)
        |  GROUP BY 1),
        |b AS (SELECT dg, length(bin(dg)) - 1 AS bucket FROM deg)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  CAST(1 AS BIGINT) << bucket AS bucket_lo,
        |  count(*) AS n_nodes, CAST(sum(dg) AS BIGINT) AS degree_mass,
        |  min(dg) AS min_degree, max(dg) AS max_degree
        |FROM b GROUP BY 1, 2 ORDER BY bucket""".stripMargin,

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

    "emb_centroid_drift" ->
      """WITH ex AS (
        |  SELECT label, vec_id % 2 AS half, CAST(i AS BIGINT) - 1 AS dim,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e8 + 0.5) AS BIGINT)
        |      AS q
        |  FROM (SELECT label, vec_id, embedding,
        |          unnest(range(1, len(embedding) + 1)) AS i
        |        FROM embeddings)),
        |cent AS (
        |  SELECT label, half, dim, CAST(sum(q) AS BIGINT) AS sq,
        |    count(*) AS n
        |  FROM ex GROUP BY 1, 2, 3),
        |cq AS (
        |  SELECT label, half, dim, n,
        |    CASE WHEN sq >= 0 THEN sq // n ELSE -((-sq) // n) END AS cq
        |  FROM cent),
        |j AS (
        |  SELECT a.label, a.cq AS c1, b.cq AS c2, a.n AS n1, b.n AS n2
        |  FROM cq a JOIN cq b
        |    ON a.label = b.label AND a.dim = b.dim
        |   AND a.half = 0 AND b.half = 1)
        |SELECT label, max(n1) AS n1, max(n2) AS n2,
        |  CAST(CAST(sum(c1 * c2) AS BIGINT) AS DOUBLE)
        |    / (sqrt(CAST(CAST(sum(c1 * c1) AS BIGINT) AS DOUBLE))
        |       * sqrt(CAST(CAST(sum(c2 * c2) AS BIGINT) AS DOUBLE)))
        |    AS cos_drift
        |FROM j GROUP BY 1 ORDER BY label""".stripMargin,

    "orders_calendar_heatmap" ->
      """WITH o AS (
        |  SELECT month(CAST(o_orderdate AS DATE)) AS mth,
        |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) % 7
        |      AS dow,
        |    CAST(floor(o_totalprice * 100e0 + 0.5e0) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT CAST(mth AS BIGINT) AS mth, CAST(dow AS BIGINT) AS dow,
        |  count(*) AS n_orders,
        |  CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / 100.0e0 AS revenue,
        |  CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) / 100.0e0 AS avg_order
        |FROM o GROUP BY 1, 2 ORDER BY mth, dow""".stripMargin,

    "emb_ood_flags" ->
      """WITH ex AS (
        |  SELECT vec_id, label, CAST(i AS BIGINT) - 1 AS dim,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
        |      AS q
        |  FROM (SELECT label, vec_id, embedding,
        |          unnest(range(1, len(embedding) + 1)) AS i
        |        FROM embeddings)),
        |cent AS (
        |  SELECT label, dim,
        |    CASE WHEN CAST(sum(q) AS BIGINT) >= 0
        |         THEN CAST(sum(q) AS BIGINT) // count(*)
        |         ELSE -((-CAST(sum(q) AS BIGINT)) // count(*)) END AS cq
        |  FROM ex GROUP BY 1, 2),
        |dist AS (
        |  SELECT ex.label, vec_id,
        |    CAST(sum((q - cq) * (q - cq)) AS BIGINT) AS dist2
        |  FROM ex JOIN cent ON ex.label = cent.label AND ex.dim = cent.dim
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT label, dist2,
        |    row_number() OVER (PARTITION BY label ORDER BY dist2, vec_id)
        |      AS rn,
        |    count(*) OVER (PARTITION BY label) AS n
        |  FROM dist),
        |cuts AS (
        |  SELECT label, dist2 AS p99_dist2 FROM ranked
        |  WHERE rn = (n * 99 + 99) // 100)
        |SELECT d.label, count(*) AS n, max(p99_dist2) AS p99_dist2,
        |  CAST(sum(CASE WHEN d.dist2 > c.p99_dist2 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_flagged,
        |  max(d.dist2) AS max_dist2
        |FROM dist d JOIN cuts c ON d.label = c.label
        |GROUP BY 1 ORDER BY d.label""".stripMargin,

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

    "events_freshness_audit" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day
        |  FROM events),
        |t AS (SELECT max(day) AS as_of_day FROM ev)
        |SELECT event_type, max(as_of_day) AS as_of_day,
        |  max(day) AS last_day,
        |  max(as_of_day) - max(day) AS staleness_days,
        |  count(*) AS n_events,
        |  CAST(sum(CASE WHEN day > as_of_day - 7 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_last_7d,
        |  CAST(max(as_of_day) - max(day) > 1 AS INTEGER) AS stale
        |FROM ev CROSS JOIN t
        |GROUP BY 1 ORDER BY event_type""".stripMargin,

    "orders_reorder_interval" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
        |      AS day
        |  FROM orders),
        |g AS (
        |  SELECT o_custkey, day,
        |    day - lag(day) OVER (PARTITION BY o_custkey
        |      ORDER BY day, o_custkey) AS gap
        |  FROM o),
        |gs AS (
        |  SELECT c_mktsegment, o_custkey, day, gap
        |  FROM g JOIN customer ON o_custkey = c_custkey
        |  WHERE gap IS NOT NULL),
        |nn AS (SELECT c_mktsegment, count(*) AS n_gaps FROM gs GROUP BY 1),
        |ranked AS (
        |  SELECT c_mktsegment, gap,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY gap, o_custkey, day) AS rn
        |  FROM gs)
        |SELECT r.c_mktsegment, max(n_gaps) AS n_gaps,
        |  CAST(sum(CASE WHEN rn = (n_gaps + 1) // 2 THEN gap ELSE 0 END)
        |     + sum(CASE WHEN rn = (n_gaps + 2) // 2 THEN gap ELSE 0 END)
        |    AS BIGINT) AS med2_days,
        |  CAST(CAST(sum(CASE WHEN rn = (n_gaps + 1) // 2 THEN gap ELSE 0 END)
        |     + sum(CASE WHEN rn = (n_gaps + 2) // 2 THEN gap ELSE 0 END)
        |    AS BIGINT) AS DOUBLE) / 2.0e0 AS median_days
        |FROM ranked r JOIN nn USING (c_mktsegment)
        |GROUP BY r.c_mktsegment ORDER BY r.c_mktsegment""".stripMargin,

    "text_ttr_curve" ->
      s"""WITH docs AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(string_split(${util.Norm.normalizeSql("text")},
         |      ' '), x -> x <> '')) AS BIGINT) AS ntok
         |  FROM documents),
         |cum AS (
         |  SELECT doc_id, ntok,
         |    CAST(sum(ntok) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum
         |  FROM docs),
         |kept AS (
         |  SELECT doc_id, ntok, b.budget
         |  FROM cum CROSS JOIN (SELECT unnest([1000, 4000, 16000, 64000])
         |                       AS budget) b
         |  WHERE cum <= b.budget),
         |stats AS (
         |  SELECT budget, count(*) AS n_docs,
         |    CAST(sum(ntok) AS BIGINT) AS n_tokens
         |  FROM kept GROUP BY 1),
         |w AS (
         |  SELECT doc_id,
         |    unnest(string_split(${util.Norm.normalizeSql("text")}, ' ')) AS w
         |  FROM documents),
         |types AS (
         |  SELECT budget, count(DISTINCT w.w) AS n_types
         |  FROM w JOIN kept USING (doc_id) WHERE w.w <> ''
         |  GROUP BY 1)
         |SELECT CAST(s.budget AS BIGINT) AS budget, n_docs, n_tokens,
         |  n_types,
         |  CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr
         |FROM stats s JOIN types USING (budget)
         |ORDER BY budget""".stripMargin,

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

    "emb_label_geometry" ->
      """WITH ex AS (
        |  SELECT label, CAST(i AS BIGINT) - 1 AS dim,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
        |      AS q
        |  FROM (SELECT label, embedding,
        |          unnest(range(1, len(embedding) + 1)) AS i
        |        FROM embeddings)),
        |cent AS (
        |  SELECT label, dim, count(*) AS n,
        |    CASE WHEN CAST(sum(q) AS BIGINT) >= 0
        |         THEN CAST(sum(q) AS BIGINT) // count(*)
        |         ELSE -((-CAST(sum(q) AS BIGINT)) // count(*)) END AS cq
        |  FROM ex GROUP BY 1, 2)
        |SELECT a.label AS label_a, b.label AS label_b,
        |  max(a.n) AS n_a, max(b.n) AS n_b,
        |  CAST(CAST(sum(a.cq * b.cq) AS BIGINT) AS DOUBLE)
        |    / (sqrt(CAST(CAST(sum(a.cq * a.cq) AS BIGINT) AS DOUBLE))
        |       * sqrt(CAST(CAST(sum(b.cq * b.cq) AS BIGINT) AS DOUBLE)))
        |    AS cos_centroid
        |FROM cent a JOIN cent b
        |  ON a.label < b.label AND a.dim = b.dim
        |GROUP BY 1, 2 ORDER BY label_a, label_b""".stripMargin,

    "events_csv_roundtrip" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 1e8 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS sum_value_q8,
        |  CAST(sum(user_id) AS BIGINT) AS user_id_sum,
        |  min(epoch_us(ts)) AS min_ts_us, max(epoch_us(ts)) AS max_ts_us,
        |  CAST(sum(CAST(concat('0x', substring(md5(props), 1, 10)) AS BIGINT))
        |    AS BIGINT) AS props_sum40
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
  )
}
