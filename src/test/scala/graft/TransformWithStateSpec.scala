package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{StreamEvent, Streams}

/** `transformWithState` running totals
  * ([[graft.streaming.Streams.runningUserTotals]]): the Spark 4
  * arbitrary-state API on the RocksDB store. The final per-user state
  * after N micro-batches must equal the batch cumulative totals over
  * the union of all the data (exact — the value sum is quantized
  * integer arithmetic), and Update mode must emit one refreshed row per
  * (touched user, batch). */
class TransformWithStateSpec extends SparkSpec {

  private def ev(id: Long, u: Long, v: Double) =
    StreamEvent(id, new java.sql.Timestamp(1000L * id), u, "click", v)

  test("running totals: stream state equals batch cumulative totals") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[StreamEvent]
      val q = Streams.runningUserTotals(stream.toDS())
        .writeStream.format("memory").queryName("g_tws")
        .outputMode("update").start()
      val b1 = Seq(ev(1, 1, 1.25), ev(2, 1, 2.50), ev(3, 2, 0.75))
      val b2 = Seq(ev(4, 1, 0.25), ev(5, 3, 10.0))
      val b3 = Seq(ev(6, 2, 1.00), ev(7, 1, 0.50))
      try {
        stream.addData(b1: _*); q.processAllAvailable()
        stream.addData(b2: _*); q.processAllAvailable()
        stream.addData(b3: _*); q.processAllAvailable()
      } finally q.stop()

      val rows = spark.table("g_tws").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
          r.getAs[Long]("sum_value_q8")))
      // Update mode: one refreshed row per touched user per batch.
      assert(rows.count(_._1 == 1L) == 3, "user 1 was touched in all 3 batches")
      assert(rows.count(_._1 == 3L) == 1, "user 3 was touched once")
      // Final state (n_events is monotone, so max picks the last emit)
      // equals the batch cumulative totals over everything streamed.
      val finalByUser = rows.groupBy(_._1)
        .map { case (u, rs) => u -> rs.maxBy(_._2) }
      val expected = (b1 ++ b2 ++ b3).groupBy(_.user_id).map { case (u, es) =>
        u -> ((u, es.size.toLong,
          es.map(e => math.floor(e.value * 1e8 + 0.5).toLong).sum))
      }
      assert(finalByUser == expected,
        "transformWithState totals must equal the batch cumulative state")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(confKey, v)
        case None => spark.conf.unset(confKey)
      }
    }
  }
}
