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
}
