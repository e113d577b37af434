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
