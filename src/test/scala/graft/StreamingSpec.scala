package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import streaming.{StreamEvent, Streams}

class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private def ev(id: Long, minute: Long, user: Long, typ: String, v: Double) =
    StreamEvent(id, new Timestamp(minute * 60000L), user, typ, v)

  test("windowed aggregate: streaming result equals the batch result on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      ev(1, 5, 1, "click", 1.0), ev(2, 20, 1, "click", 2.0),
      ev(3, 61, 2, "error", 3.0), ev(4, 70, 1, "click", 4.0),
      ev(5, 125, 2, "view", 5.0))
    val stream = MemoryStream[StreamEvent]
    stream.addData(data: _*)
    val q = Streams.withWatermarked(stream.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("hourly")
      .orderBy("w_start", "event_type").collect().toSeq
    val batch = Streams.hourlyTypeCounts(data.toDF())
      .orderBy("w_start", "event_type").collect().toSeq
    assert(streamed === batch)
    assert(batch.length === 4) // (h0 click), (h1 click), (h1 error), (h2 view)
  }

  test("streaming sessionization emits a closed session when the gap passes") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamEvent]
    // user 1: two events 10 min apart, then a 40-min gap → first session
    // closes when the post-gap event arrives in a later batch
    stream.addData(ev(1, 0, 1, "a", 1.0), ev(2, 10, 1, "a", 2.0))
    val q = Streams.sessionize(stream.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("sessions").count() === 0) // still open
      stream.addData(ev(3, 50, 1, "a", 3.0))
      q.processAllAvailable()
      val closed = spark.table("sessions").collect()
      assert(closed.length === 1)
      val s = closed.head
      assert(s.getAs[Long]("user_id") === 1L)
      assert(s.getAs[Long]("n_events") === 2L)
      assert(s.getAs[Long]("session_end_ms") - s.getAs[Long]("session_start_ms")
        === 10L * 60000)
      assert(s.getAs[Double]("sum_value") === 3.0)
    } finally q.stop()
  }

  test("event-time timeout flushes a quiet user's session once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamEvent]
    // user 1 goes quiet after minute 15; no later user-1 event ever
    // arrives. (Times start at minute 5, off the initial watermark=0
    // boundary — a row AT the watermark is dropped as late.)
    stream.addData(ev(1, 5, 1, "a", 1.0), ev(2, 15, 1, "a", 2.0))
    val q = Streams.sessionizeWithTimeout(stream.toDS(),
        gapMs = 30L * 60000, watermark = "10 minutes")
      .writeStream.format("memory").queryName("timeout_sessions")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("timeout_sessions").count() === 0) // still open
      // OTHER-user event at minute 120 drives the watermark to 110 min,
      // past user 1's deadline (15 + 30 = 45 min) → user 1's session is
      // flushed by TIMEOUT, not by any user-1 event.
      stream.addData(ev(3, 120, 2, "b", 9.0))
      q.processAllAvailable()
      val rows = spark.table("timeout_sessions").filter(col("user_id") === 1).collect()
      assert(rows.length === 1)
      val s = rows.head
      assert(s.getAs[Long]("n_events") === 2L)
      assert(s.getAs[Double]("sum_value") === 3.0)
      assert(s.getAs[Long]("session_end_ms") === 15L * 60000)
    } finally q.stop()
  }

  test("an out-of-order but on-time event from a later batch never regresses the session end") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamEvent]
    stream.addData(ev(1, 5, 7, "a", 1.0), ev(2, 15, 7, "a", 2.0))
    val q = Streams.sessionize(stream.toDS())
      .writeStream.format("memory").queryName("ooo_sessions")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 2: minute-12 event arrives AFTER the minute-15 one was
      // processed — it must extend the counted set without moving the
      // session end (or any timeout deadline) backwards
      stream.addData(ev(3, 12, 7, "a", 4.0))
      q.processAllAvailable()
      stream.addData(ev(4, 120, 7, "a", 0.5)) // gap closes the session
      q.processAllAvailable()
      val s = spark.table("ooo_sessions").collect().head
      assert(s.getAs[Long]("n_events") === 3L)
      assert(s.getAs[Double]("sum_value") === 7.0)
      assert(s.getAs[Long]("session_end_ms") === 15L * 60000)
    } finally q.stop()
  }

  test("out-of-order events within a batch still form one ordered session") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamEvent]
    stream.addData(ev(2, 10, 9, "b", 2.0), ev(1, 0, 9, "b", 1.0), ev(3, 15, 9, "b", 4.0))
    val q = Streams.sessionize(stream.toDS())
      .writeStream.format("memory").queryName("sessions2")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // session still open (no gap) → nothing emitted, no crash on disorder
      assert(spark.table("sessions2").count() === 0)
      stream.addData(ev(4, 120, 9, "b", 1.0)) // 105-min gap closes it
      q.processAllAvailable()
      val s = spark.table("sessions2").collect().head
      assert(s.getAs[Long]("n_events") === 3L && s.getAs[Double]("sum_value") === 7.0)
    } finally q.stop()
  }
}
