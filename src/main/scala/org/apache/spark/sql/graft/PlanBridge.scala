package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` access point the engine uses: building a
  * DataFrame from a raw Catalyst [[LogicalPlan]]. Spark exposes every
  * relational operator through the DataFrame DSL except a few plan
  * nodes it reserves for its own API bridges (the `AsOfJoin` node
  * behind pandas-on-Spark's `merge_asof` is the one we want) — the
  * standard ecosystem pattern for reaching those is a tiny shim
  * compiled into the `org.apache.spark.sql` package, which is what
  * this is. Nothing else in the codebase lives outside the `graft`
  * package; keep it that way so the unsupported-API surface stays one
  * file.
  */
object PlanBridge {

  /** `Dataset.ofRows` — analyze `plan` in the session and wrap it. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan under a DataFrame — the children fed to
    * a hand-built binary node must be ANALYZED (resolved attributes)
    * for the node's own `resolved` to hold.
    */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed
}
