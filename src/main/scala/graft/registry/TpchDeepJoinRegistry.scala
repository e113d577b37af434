package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.EntryOps._

/** TPC-H SUITE family (Q1/Q3/Q6 plus the Q5-Q22 completion set and
  * the backlog scan): the deep multi-join suite — split out of
  * [[TpchRegistry]] (round 13, registry size hygiene: no shard
  * >2000 LoC). Oracles mirror the Spark side's decimal discipline term
  * for term.
  *
  * Registry shard of [[SparkEntry]] (keys are merged — and spec-checked
  * disjoint — in SparkEntry.queries/oracleSql).
  */
private[graft] object TpchDeepJoinRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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


  )

  def oracles: Map[String, String] = Map(
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

  )
}
