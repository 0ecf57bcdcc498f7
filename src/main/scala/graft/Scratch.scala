package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad for ad-hoc profiling/drives — contents change freely
  * between sessions; not part of the library surface.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"[scratch] ${SparkEntry.queries.size} queries registered; " +
      s"${SparkEntry.oracleSql.size} with oracles")
    spark.stop()
  }
}
