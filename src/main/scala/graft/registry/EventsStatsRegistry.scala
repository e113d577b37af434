package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.EntryOps._

/** Events STATISTICS family: experimentation and statistical monitoring
  * over the event stream (anomaly/drift detectors, A/B machinery,
  * attribution, calibration, bootstrap) — split out of
  * [[EventsARegistry]] (round 13, registry size hygiene: no shard
  * >2000 LoC).
  *
  * Registry shard of [[SparkEntry]] (keys are merged — and spec-checked
  * disjoint — in SparkEntry.queries/oracleSql).
  */
private[graft] object EventsStatsRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
      // The md5-per-(row, replica) derivation is the query's whole CPU;
      // widen the (projected, narrow) scan across cores before the ×32
      // explode — scale-guarded no-op once the scan has real splits
      // (round 13, util.Par scaladoc; sum(kc)/sum(k) are order-free longs
      // so the repartition cannot move the result).
      val reps = util.Par.widen(Sources.events(s, dir)
          .select(col("event_id"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents")),
          col("event_id"))
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


  )

  def oracles: Map[String, String] = Map(
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


  )
}
