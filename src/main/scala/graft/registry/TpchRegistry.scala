package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.EntryOps._

/** TPC-H-shaped relational analytics: orders/customer/part/supplier rollups, join shapes, set ops.
  *
  * Registry shard of [[SparkEntry]] (split for maintainability; keys are
  * merged — and spec-checked disjoint — in SparkEntry.queries/oracleSql).
  */
private[graft] object TpchRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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


    // The RANK-FREE twin (round 12): deciles from util.Ranks.ntileExact —
    // a range-repartitioned distributed sort plus per-partition offsets
    // (the RDD.zipWithIndex decomposition), no unpartitioned WindowExec
    // anywhere in the plan (PlanLintSpec's allowlist proves it). Output
    // is bit-identical to ntile's bucketing, so the oracle is SHARED
    // with customer_pareto — same hash, scale-safe plan.
    "customer_pareto_scaled" -> ((s, dir) => {
      val cust = Sources.orders(s, dir)
        .groupBy("o_custkey")
        .agg(sum(util.Stable.dec2(col("o_totalprice"))).as("rev"))
      val total = cust.agg(
        sum(col("rev")).cast(DecimalType(38, 2)).cast("double").as("total_rev"))
      util.Ranks.ntileExact(cust, "decile", 10, col("rev").desc, col("o_custkey"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_customers"),
          sum(col("rev")).cast(DecimalType(38, 2)).cast("double").as("revenue"))
        .crossJoin(broadcast(total))
        .withColumn("rev_share_pct", col("revenue") / col("total_rev") * 100.0)
        .select("decile", "n_customers", "revenue", "rev_share_pct")
        .orderBy("decile")
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


    // The RANK-FREE RFM twin (round 12): all three quintile scores come
    // from util.Ranks.ntileExact (range-repartitioned distributed sort +
    // per-partition offsets) instead of three unpartitioned ntile
    // windows — at billions of customers those were three single-
    // partition sorts. Same total orders, Spark's exact ntile bucket
    // arithmetic, bit-identical output → the oracle is SHARED with
    // customer_rfm.
    "customer_rfm_scaled" -> ((s, dir) => {
      val cust = Sources.orders(s, dir)
        .groupBy("o_custkey")
        .agg(
          max(datediff(col("o_orderdate").cast("date"), lit("1970-01-01"))
            .cast("long")).as("last_day"),
          count(lit(1)).as("freq"),
          sum(util.Stable.dec2(col("o_totalprice"))).as("rev"))
      val anchor = cust.agg(max(col("last_day")).as("ref_day"))
      val base = cust.crossJoin(broadcast(anchor))
        .withColumn("recency_days", col("ref_day") - col("last_day"))
      val scored = Seq(
        ("r_score", Seq(col("last_day"), col("o_custkey"))),
        ("f_score", Seq(col("freq"), col("o_custkey"))),
        ("m_score", Seq(col("rev"), col("o_custkey"))))
        .foldLeft(base) { case (df, (name, cols)) =>
          util.Ranks.ntileExact(df, name, 5, cols: _*)
        }
      scored
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
      // (Round 13: an A/B moving this aggregate to the raw-pair-keyed
      // exchange shape of yf_pairs_correlation measured byte-neutral —
      // 31.5 vs 30.9 MB — so the canonical partial-aggregate form stays;
      // its reduction ratio here is real, unlike the correlation screen's.)
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


    // The RANK-FREE ABC twin (round 12): the cumulative revenue share
    // comes from util.Ranks.withGlobalPrefixSum — range repartition +
    // within-partition PARTITIONED running sum + broadcast per-partition
    // base offsets (exact decimal addition is associative, so the cut
    // boundaries adjudicate identically) — instead of an unpartitioned
    // window over the part grain, which grows with SF. Same oracle as
    // orders_abc_class.
    "orders_abc_class_scaled" -> ((s, dir) => {
      val rev = Sources.lineitem(s, dir)
        .groupBy("l_partkey")
        .agg(sum(util.Stable.dec2(col("l_extendedprice")) *
          (util.Stable.rate2(lit(1.0)) - util.Stable.rate2(col("l_discount"))))
          .as("rev"))
      val tot = rev.agg(sum(col("rev")).as("total"))
      val cum = util.Ranks.withGlobalPrefixSum(rev, "cum", col("rev"),
          col("rev").desc, col("l_partkey"))
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


    // CUSTOMER VALUE-MIGRATION MATRIX — the period-over-period BI
    // readout ("which value tier did last period's top customers land
    // in"): revenue quintiles per half (midpoint-day split, 1-row
    // broadcast cut — the PSI discipline), full-outer join per
    // customer, transition matrix including the churn/new 'none'
    // states. Quintiles come from util.Ranks.ntileExact over the
    // POST-AGGREGATE customer grain — that grain grows with the corpus,
    // so the distributed two-phase rank replaces what was an
    // unpartitioned ntile window (round 12, same cut values, same
    // oracle); revenue is exact cents; the matrix is ≤36 rows at any
    // scale.
    "customer_value_migration" -> ((s, dir) => {
      val o = Sources.orders(s, dir)
        .select(col("o_custkey"),
          datediff(col("o_orderdate"), lit("1990-01-01")).cast("long").as("day"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      val cut = o.agg(((min(col("day")) + max(col("day")) + 1L) / 2L)
        .cast("long").as("cutd"))
      val halves = o.crossJoin(broadcast(cut))
        .withColumn("half", when(col("day") < col("cutd"), "h1").otherwise("h2"))
        .groupBy("half", "o_custkey").agg(sum(col("cents")).as("rev"))
      def tier(h: String) = util.Ranks.ntileExact(
          halves.filter(col("half") === h), "q", 5,
          col("rev").desc, col("o_custkey"))
        .select(col("o_custkey"), concat(lit("q"), col("q")).as(s"tier_$h"))
      tier("h1").join(tier("h2"), Seq("o_custkey"), "full_outer")
        .select(coalesce(col("tier_h1"), lit("none")).as("from_tier"),
          coalesce(col("tier_h2"), lit("none")).as("to_tier"))
        .groupBy("from_tier", "to_tier")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("from_tier", "to_tier")
    }),


    // NEGATIVE SAMPLING for recommender training data — every
    // implicit-feedback trainer needs (user, item) pairs the user did
    // NOT interact with: 6 deterministic hash-derived candidate parts
    // per customer (md5 contract — reproducible across runs and
    // engines), actual purchases removed by a co-keyed anti-join,
    // first 3 survivors kept per customer. O(|customers|·6) candidate
    // rows — never a customers×parts cross join. The md5→part index is
    // a DISTRIBUTED two-phase rank (util.Ranks: range repartition +
    // per-partition offsets) — the part table grows with SF, so the
    // round-7 global row_number over it was a single-partition sort of
    // the whole catalog at 100 TB (VERDICT r7 #2); same dense 1..np
    // values, same oracle hash, no unpartitioned window.
    "orders_negative_samples" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val parts = util.Ranks.withGlobalRank(
          Sources.part(s, dir).select("p_partkey"), "pidx", col("p_partkey"))
        .select(col("p_partkey"), col("pidx"))
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
  )

  private lazy val ordersAbcOracle: String =
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
       |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin

  private lazy val customerParetoOracle: String =
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
      |FROM d CROSS JOIN t GROUP BY 1, total_rev ORDER BY 1""".stripMargin

  private lazy val customerRfmOracle: String =
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
      |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin

  def oracles: Map[String, String] = Map(
    "bucketed_join" ->
      s"""SELECT o_custkey, count(*) AS n_items,
         |  ${util.Stable.exactSumSql("l_extendedprice")} AS sum_price
         |FROM (SELECT * FROM lineitem
         |      WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01') l
         |JOIN (SELECT * FROM orders WHERE year(o_orderdate) = 1995) o
         |  ON l.l_orderkey = o.o_orderkey
         |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "customer_pareto" -> customerParetoOracle,

    // The rank-free twin emits bit-identical buckets — one oracle for both.
    "customer_pareto_scaled" -> customerParetoOracle,

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

    "filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01'
        |  AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

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

    "nation_supplier_roster" ->
      """SELECT n_name, count(*) AS n_suppliers,
        |  string_agg(s_name, '|' ORDER BY s_name) AS roster
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

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

    "customer_rfm" -> customerRfmOracle,

    // The rank-free twin emits bit-identical buckets — one oracle for both.
    "customer_rfm_scaled" -> customerRfmOracle,

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


    "orders_abc_class" -> ordersAbcOracle,

    // The rank-free twin emits bit-identical classes — one oracle for both.
    "orders_abc_class_scaled" -> ordersAbcOracle,


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
  )
}
