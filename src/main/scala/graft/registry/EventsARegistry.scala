package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.EntryOps._

/** Events family A (alphabetical first half): sessions, windows, funnels, experiment statistics.
  *
  * Registry shard of [[SparkEntry]] (split for maintainability; keys are
  * merged — and spec-checked disjoint — in SparkEntry.queries/oracleSql).
  */
private[graft] object EventsARegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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


    // SPARK-NATIVE DATASKETCHES HLL (the industry-standard MERGEABLE
    // distinct sketch, beside the package's own KMV family): per-day
    // partial sketches are built ONCE (hll_sketch_agg, lgK=12), and the
    // per-type rollup is answered by MERGING the ≤|days| stored sketch
    // rows (hll_union_agg → hll_sketch_estimate) — never a raw re-scan.
    // That mergeability is the 100-TB contract: stored daily sketches
    // answer any date-range distinct question at sketch cost, the
    // HLL complement of events_bitmap_rollup's exact OR and
    // events_kmv_rolling's KMV algebra. The sketch binary is
    // engine-specific (not a cross-engine value), so the
    // events_quantiles_approx discipline applies: emitted columns are
    // the EXACT counts, and the union estimate is adjudicated
    // in-dataflow — assert_true fails the run if it drifts past the
    // alarm band (lgK=12 ⇒ rsd ≈ 1.04/√4096 ≈ 1.6%; 5σ ≈ 8% + small-
    // count slack — a loud alarm, not a tight bound). sum_daily_distinct
    // ≥ n_users is the rollup inequality the sketch exists to avoid
    // paying exactly.
    "events_hll_sketch_rollup" -> ((s, dir) => {
      val ev = Sources.events(s, dir)
        .select(col("event_type"), expr("ts DIV 86400000000000").as("day"),
          col("user_id"))
      val daily = ev.groupBy("event_type", "day")
        .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"),
          countDistinct(col("user_id")).as("n_exact_day"))
      val rolled = daily.groupBy("event_type")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))")
          .cast("double").as("est_users"),
          count(lit(1)).as("n_days"),
          sum(col("n_exact_day")).as("sum_daily_distinct"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
      rolled.join(exact, "event_type")
        .select(col("event_type"), col("n_days"),
          when(assert_true(
            abs(col("est_users") - col("n_users").cast("double")) <=
              col("n_users").cast("double") * 0.08 + 8.0,
            concat(lit("HLL union estimate outside the 8% alarm band for "),
              col("event_type"))).isNull,
            col("n_users")).as("n_users"),
          col("sum_daily_distinct"), col("n_events"))
        .orderBy("event_type")
    }),


    // STORED HLL RANGE QUERY (the claim events_hll_sketch_rollup makes,
    // exercised through the serving protocol): the per-(type, day)
    // sketch table is WRITTEN ONCE per corpus (marker-gated like every
    // stored artifact), and a date-range distinct question — "distinct
    // users per type in the LATER half of the corpus" (midpoint-day cut,
    // the psi-drift discipline: in-plan, never wall-clock) — is answered
    // by unioning ONLY that range's stored sketches. The raw scan in
    // this query exists solely for the audit columns (exact counts, the
    // quantiles_approx discipline); at 100 TB the store alone answers,
    // at sketch cost, any of the 2^days range questions the bitmap/KMV
    // tiers answer by their own algebras.
    "events_hll_range_stored" -> ((s, dir) => {
      val ev = Sources.events(s, dir)
        .select(col("event_type"), expr("ts DIV 86400000000000").as("day"),
          col("user_id"))
      val sfTag = dir.replaceAll("[^A-Za-z0-9.]", "_")
      val out = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), s"graft_hll_daily_$sfTag")
      val fs = out.getFileSystem(s.sparkContext.hadoopConfiguration)
      val marker = new org.apache.hadoop.fs.Path(out, "_GRAFT_MARKER")
      val tag = s"$dir|lgK=12"
      val fresh = fs.exists(marker) && {
        val in = fs.open(marker)
        try new String(in.readAllBytes(), "UTF-8") == tag finally in.close()
      }
      if (!fresh) {
        util.Artifacts.recordBuild(s"hll_daily $tag")
        if (fs.exists(out)) fs.delete(out, true)
        ev.groupBy("event_type", "day")
          .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
          .write.mode("overwrite").parquet(out.toString)
        val os = fs.create(marker, true)
        try os.write(tag.getBytes("UTF-8")) finally os.close()
      }
      val cut = ev.agg(((min(col("day")) + max(col("day")) + 1L) / 2L)
        .cast("long").as("cutd"))
      val est = s.read.parquet(out.toString)
        .crossJoin(broadcast(cut)).filter(col("day") >= col("cutd"))
        .groupBy("event_type")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))")
          .cast("double").as("est_users"),
          count(lit(1)).as("n_days"))
      val exact = ev.crossJoin(broadcast(cut)).filter(col("day") >= col("cutd"))
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
      est.join(exact, "event_type")
        .select(col("event_type"), col("n_days"),
          when(assert_true(
            abs(col("est_users") - col("n_users").cast("double")) <=
              col("n_users").cast("double") * 0.08 + 8.0,
            concat(lit("stored-HLL range estimate outside the alarm band for "),
              col("event_type"))).isNull,
            col("n_users")).as("n_users"),
          col("n_events"))
        .orderBy("event_type")
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

  def oracles: Map[String, String] = Map(
    "events_anti_join" ->
      """WITH clickers AS (
        |  SELECT user_id, count(*) AS n_clicks FROM events
        |  WHERE event_type = 'click' GROUP BY user_id)
        |SELECT c.user_id, c.n_clicks FROM clickers c
        |WHERE c.user_id NOT IN
        |  (SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 95.0)
        |ORDER BY c.user_id""".stripMargin,

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

    "events_asof_join" ->
      s"""${events.AsofJoin.lastEventBeforeSql("events", "click", "error")}
         |ORDER BY 1""".stripMargin,

    "events_asof_forward" ->
      s"""${events.AsofJoin.nextEventAfterSql("events", "click", "purchase")}
         |ORDER BY 1""".stripMargin,

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

    "events_hll_sketch_rollup" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day, user_id
        |  FROM events),
        |d AS (SELECT event_type, day, count(DISTINCT user_id) AS nd
        |      FROM ev GROUP BY 1, 2),
        |t AS (SELECT event_type, count(*) AS n_days,
        |        CAST(sum(nd) AS BIGINT) AS sum_daily_distinct
        |      FROM d GROUP BY 1),
        |x AS (SELECT event_type, count(DISTINCT user_id) AS n_users,
        |        count(*) AS n_events
        |      FROM ev GROUP BY 1)
        |SELECT event_type, n_days, n_users, sum_daily_distinct, n_events
        |FROM t JOIN x USING (event_type) ORDER BY event_type""".stripMargin,

    "events_hll_range_stored" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day, user_id
        |  FROM events),
        |t AS (SELECT (min(day) + max(day) + 1) // 2 AS cutd FROM ev),
        |r AS (SELECT * FROM ev, t WHERE day >= cutd),
        |d AS (SELECT event_type, count(DISTINCT day) AS n_days
        |      FROM r GROUP BY 1),
        |x AS (SELECT event_type, count(DISTINCT user_id) AS n_users,
        |        count(*) AS n_events
        |      FROM r GROUP BY 1)
        |SELECT event_type, n_days, n_users, n_events
        |FROM d JOIN x USING (event_type) ORDER BY event_type""".stripMargin,

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

    "events_incremental_agg" ->
      s"""WITH ev AS (
         |  SELECT epoch_ns(ts) // 86400000000000 AS day_idx, event_type, value
         |  FROM events)
         |SELECT day_idx, event_type, count(*) AS n_events,
         |  ${util.Stable.exactSumSql("value")} AS sum_value,
         |  min(value) AS min_value, max(value) AS max_value
         |FROM ev GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "events_jsonl_roundtrip" ->
      s"""SELECT event_type, count(*) AS n_events,
         |  CAST(sum(CAST(floor(value * 1e8 + 0.5) AS BIGINT)) AS BIGINT)
         |    AS sum_value_q8,
         |  min(epoch_us(ts)) AS min_ts_us, max(epoch_us(ts)) AS max_ts_us,
         |  CAST(sum(user_id) AS BIGINT) AS user_id_sum
         |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

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
