package graft

import org.apache.spark.sql.types.TimestampType

/** Guard against the testdata vintage moving under the repo (the round-7
  * regression): the driver has shipped `events.parquet` with `ts` as both
  * parquet TIMESTAMP(NANOS) and plain timestamp[us], and [[Tables.t]] must
  * load EITHER into the same session-UTC TimestampType the oracle compare
  * was greened against. These specs read the REAL driver testdata — not a
  * synthetic fixture — so a future schema shift fails here, in `sbt test`,
  * before it fails nine queries in the correctness gate.
  */
class TestdataEventsSpec extends SparkTestBase {

  for (sf <- Seq("0.001", "0.01")) {
    test(s"real testdata sf$sf events loads with session-UTC TimestampType ts") {
      val ev = Tables.t(spark, s"/root/testdata/sf$sf", "events")
      assert(ev.schema("ts").dataType == TimestampType,
        s"events.ts must load as TimestampType, got ${ev.schema("ts").dataType}")
      assert(ev.columns.toSet ==
        Set("event_id", "ts", "user_id", "event_type", "value", "props"))
      assert(ev.count() > 0)
    }
  }

  test("every events-reading registry query analyzes against real testdata") {
    // analysis (not execution) is where the round-7 vintage break surfaced
    // (DATATYPE_MISMATCH at plan time); resolving the full plan of every
    // events consumer is cheap and catches the whole slice at once
    val dir = "/root/testdata/sf0.001"
    val eventsQs = Seq("q16_json_events", "q17_events_hourly", "q19_asof_join",
      "q20_range_join_followups", "q24_sessionize", "q25_pivot_daily",
      "q26_approx_sketches", "q29_kmv_distinct", "q71_count_window_pack")
    for (name <- eventsQs) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.queryExecution.assertAnalyzed()
    }
  }

  test("events ts values match DuckDB-style micros truncation endpoints") {
    // value-level pin, not just type-level: min/max micros must be stable
    // across reader paths (nanos-div-1000 vs native micros both truncate)
    val ev = Tables.t(spark, "/root/testdata/sf0.001", "events")
    val row = ev.selectExpr(
      "min(unix_micros(ts)) as lo", "max(unix_micros(ts)) as hi").head()
    val (lo, hi) = (row.getLong(0), row.getLong(1))
    assert(lo > 0 && hi >= lo)
    // the generator writes 2024-era event times; a timezone-shifted or
    // seconds-vs-micros misread lands far outside this window
    val y2020 = 1577836800000000L
    val y2030 = 1893456000000000L
    assert(lo >= y2020 && hi <= y2030,
      s"events ts window [$lo,$hi] outside 2020..2030 — reader misdecoded")
  }
}
