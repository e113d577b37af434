package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.EntryOps._

/** Events family B (alphabetical second half).
  *
  * Registry shard of [[SparkEntry]] (split for maintainability; keys are
  * merged — and spec-checked disjoint — in SparkEntry.queries/oracleSql).
  */
private[graft] object EventsBRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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


    // Range join via binning (operator Spark lacks natively — composed
    // per design-rule tier (a)): purchases within 2 minutes after each
    // error, per user, as an EQUI-join on (user, time-bin) + exact BETWEEN
    // filter — never a nested loop. Oracle = DuckDB's native inequality
    // join, so two independent implementations check each other.
    "events_range_join" -> ((s, dir) =>
      events.RangeJoin.windowedMatches(Sources.events(s, dir), "error", "purchase")
        .orderBy("l_id")),


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


    // Gap-based sessionization over events: lag + conditional flag +
    // running-sum window, all partitioned by user_id (no global window),
    // then per-session rollup. The batch form of streaming session state.
    "events_sessionize" -> ((s, dir) =>
      events.Sessionize.sessionStats(Sources.events(s, dir))
        .orderBy("user_id", "session_idx")),


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
      // Deciles via the distributed two-phase rank (round 12): the USER
      // grain grows with the corpus, so this was an unpartitioned ntile
      // window — util.Ranks.ntileExact emits identical buckets. The
      // cumulative windows below stay: their input is the 10-row decile
      // table (allowlisted bounded grain).
      val tiled = util.Ranks.ntileExact(users, "decile", 10,
        col("clicks").desc, col("user_id"))
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
  )

  def oracles: Map[String, String] = Map(
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

    "events_sessionize" ->
      s"""${events.Sessionize.sessionStatsSql("events")}
         |ORDER BY user_id, session_idx""".stripMargin,

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

    "events_range_join" ->
      s"""${events.RangeJoin.windowedMatchesSql("events", "error", "purchase")}
         |ORDER BY l_id""".stripMargin,

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

    "events_users_except" ->
      """SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day_idx
        |FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT user_id, epoch_ns(ts) // 86400000000000
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id, day_idx""".stripMargin,

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

    "events_orc_roundtrip" ->
      s"""SELECT event_type, count(*) AS n_events,
         |  CAST(sum(CAST(floor(value * 1e8 + 0.5) AS BIGINT)) AS BIGINT)
         |    AS sum_value_q8,
         |  min(epoch_ns(ts)) AS min_ts_ns, max(epoch_ns(ts)) AS max_ts_ns,
         |  CAST(sum(user_id) AS BIGINT) AS user_id_sum
         |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    "events_pipe_syntax" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(floor(value * 1e8 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS sum_value_q8,
        |  count(DISTINCT user_id) AS n_users
        |FROM events WHERE value >= 0.5
        |GROUP BY 1 ORDER BY event_type""".stripMargin,

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
  )
}
