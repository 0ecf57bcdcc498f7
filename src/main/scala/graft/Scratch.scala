package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad — currently: echo-mode drive (K2). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.streaming.Runner.echo(spark, "127.0.0.1", 14004)
    Thread.sleep(8000)
    q.processAllAvailable()
    q.stop()
    spark.stop()
  }
}
