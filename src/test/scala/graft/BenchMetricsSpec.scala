package graft

import org.apache.spark.sql.functions._

/** The bench's shuffle/spill accounting listener: counters move when a
  * shuffle runs, don't when one doesn't, and stable() drains the async
  * listener bus before snapshotting. */
class BenchMetricsSpec extends SparkSpec {

  test("listener counts shuffle-write bytes for a shuffling query, none for a scan") {
    val m = new TaskMetricsListener
    spark.sparkContext.addSparkListener(m)
    try {
      val (sw0, _) = m.stable
      Sources.documents(spark, sfDir)
        .groupBy("lang").agg(count(lit(1))).count()
      val (sw1, _) = m.stable
      assert(sw1 > sw0, "groupBy must register shuffle-write bytes")

      val (sw2, _) = m.stable
      Sources.documents(spark, sfDir).select("doc_id").count()
      val (sw3, _) = m.stable
      // Even a bare count() shuffles its per-partition partials to the
      // final single-partition aggregate (measured: tens of bytes) — the
      // listener must see that as noise-level, far below a real keyed
      // shuffle's volume.
      assert(sw3 - sw2 < 1000, s"scan-only count shuffled ${sw3 - sw2} bytes")
      assert(sw1 - sw0 > sw3 - sw2, "keyed shuffle must outweigh count partials")
    } finally spark.sparkContext.removeSparkListener(m)
  }
}
