package graft

/** Round-6 plan pins: the ANN centroid joins must BROADCAST their small
  * side. Every crossJoin in the IVF/PQ paths pairs a corpus-scale frame
  * with a numCentroids/numCodewords-row table — at fixture scale
  * auto-broadcast would cover it, but at 100× the only acceptable plan is
  * an explicit-hint BroadcastNestedLoopJoin; a CartesianProduct means the
  * hint got lost and the corpus would shuffle against itself. */
class Round6OpsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("IVF/PQ/brute ANN plans broadcast every small side — no CartesianProduct") {
    for (name <- Seq("sim_ann_ivf", "sim_ann_ivf_trained", "sim_ann_pq",
        "sim_brute_topk")) {
      val df = q(name)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("BroadcastExchange"),
        s"$name: expected the centroid/query table to broadcast:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$name: a centroid crossJoin planned as CartesianProduct " +
          s"(broadcast hint lost):\n$plan")
      graft.util.Views.unpersistAll()
    }
  }
}
