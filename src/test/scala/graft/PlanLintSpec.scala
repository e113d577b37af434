package graft

/** Whole-surface plan lint: every named query's physical plan is built at
  * sf0.001 and scanned for the one shape that must NEVER appear —
  * `CartesianProduct`. Every intentional cross join in the engine is a
  * broadcast (1-row aggregates, centroid/codebook tables, query sets), so
  * a CartesianProduct anywhere means a broadcast hint was lost in a
  * refactor — at fixture scale it still passes correctness, at 100 TB it
  * is a corpus×corpus shuffle. This automates the per-round anti-pattern
  * audit so the regression is caught at commit time, not round review.
  *
  * Building a plan invokes the query lambda, which for some entries also
  * performs their (small, sf0.001) eager setup actions — acceptable cost:
  * the whole sweep is the same work as one bench warm-up pass. */
class PlanLintSpec extends SparkSpec {

  test("no query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try fn(spark, sfDir).queryExecution.executedPlan.toString
          catch { case e: Throwable =>
            fail(s"$name failed to plan at sf0.001: ${e.getMessage}")
          }
        graft.util.Views.unpersistAll()
        spark.catalog.clearCache()
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"CartesianProduct found in: ${offenders.mkString(", ")} — a broadcast hint was lost")
  }

  /** Queries ALLOWED to plan an unpartitioned Window, each for a declared
    * reason: either the window's input grain is BOUNDED (a ≤k-row
    * candidate set, a catalog, a per-partition histogram) or the global
    * numbering is REFERENCE-PINNED behavior (SURVEY §2: W1/W2). Anything
    * not listed that plans one fails — the rank-free alternatives
    * (util.Ranks.ntileExact, the GK cut, TopKPerKey) exist for every
    * corpus-growing grain. */
  private val globalWindowAllowed: Set[String] = Set(
    // REFERENCE-PINNED global numbering (SURVEY §2 W1/W2): the reference
    // computes a corpus-global row_number / monotonic index; parity
    // requires reproducing it. Flagged as reference-faithful, not scale-
    // endorsed.
    "yf_month_agg", "yf_month_agg_ref", "yf_year_agg", "news_summarize",
    // BI-PATTERN ORIGINALS whose rank-free twins shipped (round 12):
    // customer_rfm_scaled / customer_pareto_scaled produce bit-identical
    // output via util.Ranks.ntileExact with no global window. The
    // originals stay as the documented ntile pattern.
    "customer_rfm", "customer_pareto",
    // DISTINCT-VALUE / SCORE grain — bounded by the cents-quantized value
    // DOMAIN, not the corpus (the roc_auc discipline: aggregate to
    // distinct values first, window over that).
    "events_roc_auc", "events_pr_curve", "events_calibration",
    "events_ks_test", "events_mannwhitney_u", "events_decision_stump",
    "part_skyline",
    // CALENDAR grain (days/months — the clock bounds it, not the data).
    "events_survival_km", "events_slo_burn", "orders_backlog",
    "orders_monthly_growth",
    // CATALOG / VOCABULARY grain — aggregated far below fact volume;
    // vocabulary saturates (measured 1.1x at 10x corpus on the textrank
    // vocab before its round-13 move to util.Ranks wids — VERDICT r12
    // #3 — which took it off this list entirely).
    // orders_abc_class keeps the BI-pattern cumulative window; its
    // rank-free twin (orders_abc_class_scaled, util.Ranks
    // .withGlobalPrefixSum) shipped round 12 for corpus-scale catalogs.
    "orders_abc_class", "text_zipf_slope", "docs_ngram_coverage",
    "docs_mix_schedule",
    // FIXED-CARDINALITY tables: 32 bootstrap replicas, 10 deciles,
    // |dims| variance rows, doc-count TTR prefix spine (a per-corpus
    // diagnostic readout).
    "events_bootstrap_ci", "events_lift_gain", "emb_dim_variance",
    "text_ttr_curve")

  test("no query outside the allowlist plans an unpartitioned Window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.optimizedPlan
        val hasGlobal = plan.collectWithSubqueries {
          case w: LWindow if w.partitionSpec.isEmpty => w
        }.nonEmpty
        graft.util.Views.unpersistAll()
        spark.catalog.clearCache()
        if (hasGlobal) Some(name) else None
    }.toSet
    assert((offenders -- globalWindowAllowed).isEmpty,
      s"NEW unpartitioned Window in: ${(offenders -- globalWindowAllowed).toSeq.sorted.mkString(", ")} — " +
        "use util.Ranks / GK cuts / TopKPerKey, or add to the allowlist with a bounded-grain justification")
    assert((globalWindowAllowed -- offenders).isEmpty,
      s"stale allowlist entries (no longer plan a global window): ${(globalWindowAllowed -- offenders).toSeq.sorted.mkString(", ")}")
  }
}
