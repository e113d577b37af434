package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.EntryOps._

/** YF OHLCV pipeline family (SURVEY.md §2: scans, the 36-agg rollups, windows, and the quant-analytics extensions).
  *
  * Registry shard of [[SparkEntry]] (split for maintainability; keys are
  * merged — and spec-checked disjoint — in SparkEntry.queries/oracleSql).
  */
private[graft] object YfRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // `format("mongo")` COMPATIBILITY SHIM round-trip — the reference's
    // exact connector call shape (`yfinance_transform.py:113-115,
    // 125-128`) running UNMODIFIED against this engine: OHLCV bars
    // written through `df.write.format("mongo").option("uri",
    // mongodb://…/DB.collection)`, read back through
    // `spark.read.format("mongo")`, then the reference's period-key
    // aggregation — hash-matched against an oracle computed straight
    // from the lineitem parquet, so the shim's write→read round-trip is
    // proven lossless. mode("overwrite") (not the reference's append)
    // keeps warm-up + timed reps idempotent. See sources/MongoCompat.
    "yf_mongo_shim_roundtrip" -> ((s, dir) => {
      val root = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), "graft_mongo_compat").toString
      val uri = "mongodb://localhost:27017/Yfinance_db.OHLCV"
      Sources.ohlcv(s, dir)
        .select(col("Date"), col("Open"), col("Close"), col("Volume"),
          col("symbol"))
        .write.format("mongo").option("uri", uri).option("root", root)
        .mode("overwrite").save()
      s.read.format("mongo").option("uri", uri).option("root", root).load()
        .filter(col("Date") >= lit("1995-01-01") && col("Date") < lit("1996-01-01"))
        .withColumn("period_key", date_format(col("Date"), "yyyy-MM"))
        .groupBy("period_key")
        .agg(count(lit(1)).as("n_bars"),
          util.Stable.exactSum(col("Open")).as("sum_open"),
          util.Stable.exactSum(col("Close")).as("sum_close"),
          sum(col("Volume").cast("long")).as("sum_volume"),
          countDistinct(col("symbol")).as("n_symbols"))
        .orderBy("period_key")
    }),

    "yf_month_agg" -> ((s, dir) =>
      stabilized(yf.Ohlcv.aggregatePeriod(Sources.ohlcv(s, dir), "yyyy-MM", "month"))
        .orderBy("period_key")),


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

  )

  def oracles: Map[String, String] = Map(
    // Straight from the parquet fact — if the shim's write→read path
    // dropped or mangled anything, the hash diverges.
    "yf_mongo_shim_roundtrip" ->
      s"""WITH $barsCte
         |SELECT strftime("Date", '%Y-%m') AS period_key,
         |  count(*) AS n_bars,
         |  ${util.Stable.exactSumSql("\"Open\"")} AS sum_open,
         |  ${util.Stable.exactSumSql("\"Close\"")} AS sum_close,
         |  CAST(sum(CAST("Volume" AS BIGINT)) AS BIGINT) AS sum_volume,
         |  count(DISTINCT symbol) AS n_symbols
         |FROM bars
         |WHERE "Date" >= '1995-01-01' AND "Date" < '1996-01-01'
         |GROUP BY 1 ORDER BY 1""".stripMargin,

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

  )
}
