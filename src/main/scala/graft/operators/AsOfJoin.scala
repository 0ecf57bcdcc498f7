package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal alignment) join — the operator Spark SQL lacks natively
  * and sensor pipelines need constantly ("value of the other series at or
  * just before this timestamp", cf. SURVEY.md §2.7).
  *
  * Implemented Spark-first as union + ordered window rather than an
  * inequality join: an `l.key = r.key AND l.ts >= r.ts` theta-join would
  * either build an O(n·m) BroadcastNestedLoop plan or multiply rows and
  * re-aggregate; the union-tag formulation is one hash shuffle on the key
  * plus one sort — linear in input, scales to 100 TB with no skew beyond
  * the key distribution itself.
  */
object AsOfJoin {

  /** Left rows keep all their columns and gain `asof_ts`: the greatest
    * `right.time` ≤ the row's own `time` within the same `key`
    * (null when no such right row exists — i.e. a LEFT as-of join).
    *
    * `right` must have exactly the columns (`key`, `time`).
    * Ties at equal timestamps resolve right-before-left (the join is
    * inclusive, matching `ON l.ts >= r.ts` semantics).
    */
  def lastEventAtOrBefore(left: DataFrame, right: DataFrame,
      key: String, time: String): DataFrame = {
    val extraCols = left.schema.fields
      .filter(f => f.name != key && f.name != time)
    val leftTagged = left
      .withColumn("_tag", lit(1))
      .withColumn("_r_ts", lit(null).cast(left.schema(time).dataType))
    val rightTagged = extraCols.foldLeft(
        right.select(col(key), col(time))
          .withColumn("_tag", lit(0))
          .withColumn("_r_ts", col(time))) {
      (df, f) => df.withColumn(f.name, lit(null).cast(f.dataType))
    }.select(leftTagged.columns.map(col).toIndexedSeq: _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightTagged.union(leftTagged)
      .withColumn("asof_ts", last(col("_r_ts"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .drop("_tag", "_r_ts")
  }

  /** The PLANNER-NATIVE formulation of [[lastEventAtOrBefore]] — same
    * contract, same output surface — built on the Catalyst `AsOfJoin`
    * logical node Spark ships for pandas-on-Spark's `merge_asof`
    * (backward direction, exact matches allowed, LEFT OUTER), which
    * the built-in `RewriteAsOfJoin` optimizer rule lowers to an
    * equi-key join + per-left-row `min_by` aggregate.
    *
    * This exists as a PIN, not the production path. The rewrite's
    * physical shape (AsOfNativeSpec locks it): DISTINCT left
    * timestamps × the ENTIRE right side through a
    * BroadcastNestedLoopJoin on the bare inequality — the equi-key
    * only joins after a two-level min_by aggregate — i.e. Spark's own
    * native as-of is O(|distinct left ts| · |right|) regardless of key
    * selectivity. The union+window form above is one hash shuffle +
    * one sort, linear in input; it remains the default at any scale.
    * Registering both against the same oracle (q19/q76) keeps the
    * engine honest about the equivalence and tracks the upstream
    * lowering: if a future Spark version plans this node linearly,
    * AsOfNativeSpec's plan lock fails loudly and the default gets
    * re-evaluated.
    *
    * `right` must have exactly the columns (`key`, `time`); `left`
    * must not already contain a `_r_key`/`_r_ts` column.
    */
  def lastEventAtOrBeforeNative(left: DataFrame, right: DataFrame,
      key: String, time: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.EqualTo
    import org.apache.spark.sql.catalyst.plans.Backward
    import org.apache.spark.sql.catalyst.plans.logical.{AsOfJoin => CatalystAsOfJoin}
    import org.apache.spark.sql.graft.PlanBridge

    // fresh aliases give the right side attribute ids disjoint from the
    // left even when both derive from the same scan (the node's
    // duplicateResolved invariant — the DSL's self-join dedup doesn't
    // run for hand-built nodes)
    val rAliased = right.select(col(key).as("_r_key"), col(time).as("_r_ts"))
    val lPlan = PlanBridge.analyzed(left)
    val rPlan = PlanBridge.analyzed(rAliased)
    def out(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"column $n missing"))
    val node = CatalystAsOfJoin(
      lPlan, rPlan,
      leftAsOf = out(lPlan, time), rightAsOf = out(rPlan, "_r_ts"),
      condition = Some(EqualTo(out(lPlan, key), out(rPlan, "_r_key"))),
      joinType = org.apache.spark.sql.catalyst.plans.LeftOuter,
      tolerance = None, allowExactMatches = true, direction = Backward)
    PlanBridge.ofRows(left.sparkSession, node)
      .drop("_r_key")
      .withColumnRenamed("_r_ts", "asof_ts")
  }
}
