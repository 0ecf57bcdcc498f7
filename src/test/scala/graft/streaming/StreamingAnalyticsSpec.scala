package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)

/** The §2.7 streaming-analytics gap surface: event-time windows with
  * watermarks and late-data handling — the capabilities the reference
  * delegates to its out-of-repo batch server, supplied natively by
  * Structured Streaming.
  */
class StreamingAnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  // base aligned to a 5-minute epoch boundary so ts(1), ts(2) share a window
  private def ts(min: Int) = new java.sql.Timestamp(1700000400000L + min * 60000L)

  test("event-time tumbling window with watermark drops too-late data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = mem.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"), $"user_id")
      .agg(count(lit(1)).as("n"), sum($"value").as("total"))
    val q = agg.writeStream.format("memory").queryName("winagg")
      .outputMode("append").start()
    try {
      // window [0,5): two events for user 1
      mem.addData(Ev(1, ts(1), 1.0), Ev(1, ts(2), 2.0))
      q.processAllAvailable()
      // advance event time far past the watermark → closes [0,5)
      mem.addData(Ev(1, ts(30), 5.0))
      q.processAllAvailable()
      // this event is 30 min late, watermark is 10 min → DROPPED
      mem.addData(Ev(1, ts(0), 100.0))
      q.processAllAvailable()
      // close everything by advancing again
      mem.addData(Ev(1, ts(60), 7.0))
      q.processAllAvailable()
      val rows = spark.table("winagg")
        .select($"user_id", $"n", $"total").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains((1L, 2L, 3.0)))    // [0,5) emitted with 2 events
      assert(!rows.exists(_._3 == 103.0))     // late event did not reopen it
      assert(rows.contains((1L, 1L, 5.0)))    // [30,35) emitted
    } finally q.stop()
  }

  test("sliding window + session-style distinct users per window") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = mem.toDF()
      .withWatermark("ts", "5 minutes")
      .groupBy(window($"ts", "10 minutes", "5 minutes"))
      .agg(approx_count_distinct($"user_id").as("users"))
    val q = agg.writeStream.format("memory").queryName("sliding")
      .outputMode("append").start()
    try {
      mem.addData(Ev(1, ts(1), 1.0), Ev(2, ts(3), 1.0), Ev(1, ts(6), 1.0))
      q.processAllAvailable()
      mem.addData(Ev(9, ts(40), 1.0))   // advance watermark, close windows
      q.processAllAvailable()
      val n = spark.table("sliding").count()
      assert(n >= 2)  // overlapping 10m/5m windows emitted
    } finally q.stop()
  }

  test("native session_window: sessions close after the gap, per user") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = mem.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window($"ts", "5 minutes"), $"user_id")
      .agg(count(lit(1)).as("n"), sum($"value").as("total"))
    val q = agg.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // burst of 3 events within 5-min gaps, then silence
      mem.addData(Ev(1, ts(0), 1.0), Ev(1, ts(3), 2.0), Ev(1, ts(6), 4.0))
      q.processAllAvailable()
      mem.addData(Ev(1, ts(60), 8.0))   // closes the first session
      q.processAllAvailable()
      mem.addData(Ev(1, ts(120), 16.0)) // closes the second
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .select($"n", $"total").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(rows.contains((3L, 7.0)))  // one merged session of the burst
      assert(rows.contains((1L, 8.0)))
    } finally q.stop()
  }

  test("streaming exact dedup: dropDuplicatesWithinWatermark on event ids") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val dedup = mem.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "ts")
    val q = dedup.writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      mem.addData(Ev(1, ts(1), 1.0), Ev(1, ts(1), 1.0), Ev(2, ts(1), 2.0))
      q.processAllAvailable()
      mem.addData(Ev(1, ts(1), 1.0))  // duplicate arriving again, in-watermark
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2)  // (1,ts1) once + (2,ts1)
    } finally q.stop()
  }
}
