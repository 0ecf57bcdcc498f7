package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch/stream parity for the events-tier twins: the streaming
  * operators run in BATCH execution against the real testdata and must
  * reproduce the registered batch queries' arithmetic exactly; then a
  * MemoryStream run proves the same code works as a genuine stream
  * (state across micro-batches, watermark-closed sessions).
  */
class EventStreamsSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("AsOfStream in batch execution == AsOfJoin on real events") {
    import spark.implicits._
    val e = graft.Tables.t(spark, sf, "events")
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id")
    val errors = e.filter($"event_type" === "error")
      .select($"user_id", $"ts")
    val batch = graft.operators.AsOfJoin
      .lastEventAtOrBefore(clicks, errors, "user_id", "ts")
      .select($"event_id", $"asof_ts").collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    val streamed = AsOfStream
      .lastAtOrBefore(clicks, errors, "user_id", "ts")
      .select($"event_id", $"asof_ts").collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    assert(streamed.size == batch.size)
    assert(streamed == batch, {
      val diff = (batch.keySet ++ streamed.keySet)
        .filter(k => batch.get(k) != streamed.get(k)).take(5)
      s"as-of mismatch on ${diff.map(k => (k, batch.get(k), streamed.get(k)))}"
    })
  }

  test("sessionize in batch execution == q24 session rollup on real events") {
    import spark.implicits._
    val e = graft.Tables.t(spark, sf, "events")
    // q24 keyed by (user, session_start): session ids are ordinal, the
    // window twin identifies sessions by their start instant instead
    val q24 = graft.SparkEntry.queries("q24_sessionize")(spark, sf)
      .select($"user_id", $"session_start", $"n_events", $"session_value")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val tw = EventStreams.sessionize(e.select($"user_id", $"ts", $"value"))
      .select($"user_id",
        date_format($"session_start", "yyyy-MM-dd HH:mm:ss").as("session_start"),
        $"n_events", $"session_value")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(tw.size == q24.size, s"${tw.size} sessions vs q24's ${q24.size}")
    assert(tw == q24)
  }

  test("AsOfStream keeps per-key state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // rows: (user_id, ts, event_id, tag source) — tag derived by type col
    val left = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val right = MemoryStream[(Long, java.sql.Timestamp)]
    val out = AsOfStream.lastAtOrBefore(
      left.toDF().toDF("user_id", "ts", "event_id"),
      right.toDF().toDF("user_id", "ts"),
      "user_id", "ts")
    val q = out.writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()
    try {
      // batch 1: an error at 10:01, a click at 10:05
      right.addData((1L, ts(1)))
      left.addData((1L, ts(5), 100L))
      q.processAllAvailable()
      // batch 2: a click at 10:09 — must see batch 1's error from STATE
      left.addData((1L, ts(9), 101L))
      q.processAllAvailable()
      val got = spark.table("asof_out")
        .select($"event_id", $"asof_ts").collect()
        .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
      assert(got == Map(100L -> ts(1), 101L -> ts(1)), s"got $got")
    } finally q.stop()
  }

  test("session stream survives stop/restart from checkpoint without loss or dup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sess-ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-sess-out").toString
    // the memory sink cannot recover from a checkpoint; the parquet
    // sink (the production shape) can — its commit log also dedups a
    // replayed batch, which is half of what this test pins
    def start() = EventStreams.sessionize(
        mem.toDF().toDF("user_id", "ts", "value"),
        gap = "30 minutes", watermark = "10 minutes")
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    try {
      // session A for user 1, still OPEN (watermark hasn't passed it)
      mem.addData((1L, ts(9, 0), 1.0), (1L, ts(9, 5), 2.0))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart from the checkpoint: the open session's window state must
    // be restored, extended by a pre-gap event, then closed by a late
    // watermark advance — emitted exactly once with ALL three events
    val q2 = start()
    try {
      mem.addData((1L, ts(9, 20), 4.0))
      q2.processAllAvailable()
      mem.addData((2L, ts(13, 0), 9.0))
      q2.processAllAvailable()
      val rows = spark.read.parquet(outDir)
        .filter($"user_id" === 1L)
        .select($"n_events", $"session_value").collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      assert(rows.toSeq == Seq((3L, 7.0)),
        s"restored session wrong: ${rows.mkString(", ")}")
    } finally q2.stop()
  }

  test("streamed session_window closes sessions at the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val out = EventStreams.sessionize(
      mem.toDF().toDF("user_id", "ts", "value"),
      gap = "30 minutes", watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // one session: 10:00, 10:10 (same 30-min gap), then silence;
      // a 13:00 event advances the watermark far past its close
      mem.addData((1L, ts(10, 0), 1.0), (1L, ts(10, 10), 2.0))
      q.processAllAvailable()
      mem.addData((2L, ts(13, 0), 9.0))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select($"user_id", $"n_events", $"session_value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows.contains((1L, 2L, 3.0)),
        s"closed session not emitted: ${rows.mkString(", ")}")
    } finally q.stop()
  }
}
