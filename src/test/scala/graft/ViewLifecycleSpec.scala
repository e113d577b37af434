package graft

/** The leaked-view lifecycle contract (VERDICT r4 item 3): every view an
  * operator materializes — including the ones deliberately still live
  * when the operator returns (LSH band indexes, sketched-corpus views,
  * the cluster loop's converged round, the trained-centroid table) — is
  * registered with [[graft.util.Views]], and one `Views.unpersistAll()`
  * after the consuming action reclaims ALL of them. Bench (per rep) and
  * Verify (per query) call it; this spec proves it leaves nothing
  * persisted.
  *
  * The assertion is set-difference, not emptiness: other suites share
  * the test session and legitimately hold `.cache()`d fixtures.
  */
class ViewLifecycleSpec extends SparkSpec {

  // The queries whose operators materialize views that outlive the
  // operator call — the exact set the round-4 verdict flagged.
  private val viewHeavy = Seq(
    "dedup_clusters_lsh",    // shingle view + band index + candidates + converged round
    "dedup_incremental_lsh", // batch/existing shingle views + band indexes + candidates
    "dedup_minhash_lsh",     // shingle view + band index + candidate set
    "sim_ann_rhp",           // sketched-corpus view
    "sim_ann_ivf_trained",   // trained-centroid table
    "dedup_embedding_cosine", // sketch view
    "docs_cross_source_dup"   // (content-hash, source) distinct view
  )

  for (name <- viewHeavy)
    test(s"$name: no persisted storage survives Views.unpersistAll") {
      graft.util.Views.unpersistAll() // drain any earlier suite's registry
      val before = spark.sparkContext.getPersistentRDDs.keySet
      SparkEntry.queries(name)(spark, sfDir).count()
      assert(spark.sparkContext.getPersistentRDDs.keySet.size > before.size,
        s"$name no longer materializes any view — update this spec's list")
      graft.util.Views.unpersistAll()
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(leaked.isEmpty, s"$name leaked persisted RDDs: $leaked")
    }
}
