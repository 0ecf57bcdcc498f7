package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the LLM-pipeline
  * extensions) registers one [[Q]] in a module under `graft.operators`;
  * this object is just the union of those registries.
  */
object SparkEntry {

  /** All operator registries, in presentation order — the default-knob
    * [[QRegistry]]; build a `new QRegistry(tuning)` for another knob set.
    */
  def allQ: Seq[Q] = QRegistry.default.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allQ.head.spark(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QRegistry.default.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * `round(x, n)` is rewritten to the portable floor form so DuckDB
    * computes bit-identical doubles to [[Cols.r2]]/r4/r6 — see the
    * rationale on [[Cols]].
    */
  def oracleSql: Map[String, String] = QRegistry.default.oracleSql

  /** Rewrite every `round(expr, n)` in an oracle SQL string to
    * `(floor((expr) * 10^n + 0.5) / 10^n)`, respecting nested parens
    * and single-quoted strings.
    */
  private[graft] def portableRoundSql(sql: String): String = {
    val lower = sql.toLowerCase
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val idx = lower.indexOf("round(", i)
      val isCall = idx >= 0 &&
        (idx == 0 || !Character.isLetterOrDigit(sql.charAt(idx - 1)) && sql.charAt(idx - 1) != '_')
      if (idx < 0) { out.append(sql.substring(i)); i = sql.length }
      else if (!isCall) { out.append(sql.substring(i, idx + 6)); i = idx + 6 }
      else {
        out.append(sql.substring(i, idx))
        var j = idx + 6
        var depth = 1
        var comma = -1
        var inStr = false
        while (depth > 0) {
          sql.charAt(j) match {
            case '\'' => inStr = !inStr
            case '(' if !inStr => depth += 1
            case ')' if !inStr => depth -= 1
            case ',' if !inStr && depth == 1 => comma = j
            case _ =>
          }
          j += 1
        }
        val close = j - 1
        if (comma < 0) {
          // single-arg round(x): integer rounding, no scale ambiguity —
          // leave it as-is (still recurse for nested two-arg rounds)
          val arg = portableRoundSql(sql.substring(idx + 6, close))
          out.append(s"round($arg)")
        } else {
          val arg = portableRoundSql(sql.substring(idx + 6, comma))
          val n = sql.substring(comma + 1, close).trim.toInt
          val scale = "1" + "0" * n + ".0"
          out.append(s"(floor(($arg) * $scale + 0.5) / $scale)")
        }
        i = close + 1
      }
    }
    out.toString
  }
}
