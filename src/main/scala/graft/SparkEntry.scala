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

  /** All operator registries, in presentation order. */
  def allQ: Seq[Q] = Relational.all ++ Stats.all ++ Dedup.all ++
    Similarity.all ++ TextOps.all ++ Multimodal.all ++ ParseOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.all.head.spark(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQ.map(q => q.name -> q.spark).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQ.collect { case Q(n, _, Some(sql)) => n -> sql.trim }.toMap
}
