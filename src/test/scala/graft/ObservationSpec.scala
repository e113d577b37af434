package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Single-pass pipeline metrics via `Dataset.observe` — the Spark-native
  * form of the reference's per-run accounting (M1–M3,
  * `idx_transform.py:29-74` docs/sec report, `iqplus_market_transform
  * .py:92-95,128-144` per-doc success tally). The reference re-counts
  * with extra actions (`processed_df.count()` then `toPandas()` — the
  * scan runs twice); `observe` attaches aggregate metrics to the ONE
  * existing action, so the audit is free at any scale. */
class ObservationSpec extends SparkSpec {

  test("observe collects gate metrics in the same single action as the write") {
    val obs = Observation("gate")
    val docs = Sources.documents(spark, sfDir)
    val gated = docs
      .withColumn("n_tokens",
        size(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+")).cast("long"))
      .filter(col("n_tokens") >= 5)
      .observe(obs,
        count(lit(1)).as("n_kept"),
        sum(col("n_tokens")).as("tokens_kept"),
        min(col("n_tokens")).as("min_tokens"))
    val collected = gated.count() // the ONE action
    val m = obs.get
    assert(m("n_kept") == collected,
      s"observed n_kept=${m("n_kept")} != action count $collected")
    assert(m("min_tokens").asInstanceOf[Long] >= 5L)
    // Cross-check against an independent recompute.
    val expectTokens = docs
      .select(size(split(trim(col("text")), "[ \\t\\n\\x0B\\f\\r]+"))
        .cast("long").as("n"))
      .filter(col("n") >= 5).agg(sum("n")).head.getLong(0)
    assert(m("tokens_kept") == expectTokens)
  }

  test("observed metrics see pre-limit rows only when the limit is downstream") {
    val obs = Observation()
    val df = Sources.orders(spark, sfDir)
      .observe(obs, count(lit(1)).as("n_scanned"))
      .limit(10)
    assert(df.collect().length == 10)
    // The observation point sits above the scan: it must have seen at
    // least the emitted rows (limits may stop the scan early, so the
    // exact number is plan-dependent — the contract is ≥ emitted).
    assert(obs.get("n_scanned").asInstanceOf[Long] >= 10L)
  }
}
