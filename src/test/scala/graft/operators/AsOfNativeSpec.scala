package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The planner-native as-of formulation (Catalyst `AsOfJoin` node via
  * [[AsOfJoin.lastEventAtOrBeforeNative]]) must agree byte-for-byte
  * with the production union+window formulation — on the real events
  * table and on hand-built edges (ties, keyless rows, no-match rows) —
  * and must plan through `RewriteAsOfJoin` into an equi-join, never a
  * nested-loop.
  */
class AsOfNativeSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("native formulation == window formulation on real events") {
    import spark.implicits._
    val e = graft.Tables.t(spark, sf, "events")
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id")
    val errors = e.filter($"event_type" === "error")
      .select($"user_id", $"ts")
    def toMap(df: org.apache.spark.sql.DataFrame) = df
      .select($"event_id", $"asof_ts").collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    val window = toMap(AsOfJoin
      .lastEventAtOrBefore(clicks, errors, "user_id", "ts"))
    val native = toMap(AsOfJoin
      .lastEventAtOrBeforeNative(clicks, errors, "user_id", "ts"))
    assert(native.size == window.size)
    assert(native == window, {
      val diff = (window.keySet ++ native.keySet)
        .filter(k => window.get(k) != native.get(k)).take(5)
      s"mismatch on ${diff.map(k => (k, window.get(k), native.get(k)))}"
    })
  }

  test("edge semantics: exact-match ties, no-match rows, self-derived sides") {
    import spark.implicits._
    // left and right both derive from ONE DataFrame (the q19/q76 shape)
    // so the fresh-alias dedup in the native path is actually exercised
    val ev = Seq(
      // (user, t, kind, id): user 1 has an exact-tie error at t=10
      (1L, 10L, "c", 100L), (1L, 10L, "e", 0L), (1L, 5L, "e", 0L),
      // user 2's clicks precede every error — no match
      (2L, 3L, "c", 200L), (2L, 9L, "e", 0L),
      // user 3 has no errors at all
      (3L, 7L, "c", 300L),
      // user 4: two errors straddle the click
      (4L, 6L, "e", 0L), (4L, 8L, "c", 400L), (4L, 9L, "e", 0L)
    ).toDF("user_id", "t", "kind", "event_id")
      .withColumn("ts", timestamp_seconds($"t")).drop("t")
    val clicks = ev.filter($"kind" === "c")
      .select($"user_id", $"ts", $"event_id")
    val errors = ev.filter($"kind" === "e").select($"user_id", $"ts")
    val got = AsOfJoin
      .lastEventAtOrBeforeNative(clicks, errors, "user_id", "ts")
      .select($"event_id", unix_timestamp($"asof_ts").as("m"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(
      100L -> Some(10L), // inclusive: the t=10 error matches the t=10 click
      200L -> None,      // all errors later than the click
      300L -> None,      // key absent on the right
      400L -> Some(6L))) // greatest error <= click, not the later one
  }

  test("plan lock: Spark lowers the native node through a nested-loop — the reason q19 stays default") {
    import spark.implicits._
    val e = graft.Tables.t(spark, sf, "events")
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id")
    val errors = e.filter($"event_type" === "error")
      .select($"user_id", $"ts")
    // RewriteAsOfJoin's measured shape on Spark 4.1: distinct left ts ×
    // the whole right side through BroadcastNestedLoopJoin on the bare
    // inequality, THEN the equi-key via sort-merge — O(|distinct ts|·|right|)
    // no matter how selective the key. If a Spark upgrade makes this
    // assertion fail, the native path became linear: re-evaluate which
    // formulation is the production default.
    val native = planOf(AsOfJoin
      .lastEventAtOrBeforeNative(clicks, errors, "user_id", "ts"))
    assert(native.contains("BroadcastNestedLoopJoin"), native.take(2000))
    // the production window formulation has no join operator at all
    val window = planOf(AsOfJoin
      .lastEventAtOrBefore(clicks, errors, "user_id", "ts"))
    assert(!window.contains("Join"), window.take(2000))
  }
}
