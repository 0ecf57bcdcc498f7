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
}
