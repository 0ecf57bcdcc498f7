package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad — currently: end-to-end streaming drive. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = graft.config.DeviceConfig.load("""
      |[device]
      |station = MSU
      |name = M
      |host = 127.0.0.1
      |port = 14004
      |timeout = 30
      |[parser]
      |regex = ^NOMATCH(?P<level>\S+) RH= *(?P<rh>\S+) %RH T= *(?P<temp>\S+) .C\s*$
      |group_by = level:int
      |pack_length = 3
      |destination = /tmp/graft_e2e_out
      |""".stripMargin)
    println("[drive] vars=" + cfg.variables + " schema=" + cfg.schema.simpleString)
    val q = graft.streaming.IngestPipeline.start(spark, cfg,
      "/tmp/graft_e2e_out", "/tmp/graft_e2e_ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
    val deadline = System.currentTimeMillis() + 15000
    var n = 0L
    while (System.currentTimeMillis() < deadline && n < 9 && false) {
      Thread.sleep(1000)
      n = try spark.read.parquet("/tmp/graft_e2e_out").count() catch { case _: Exception => 0L }
    }
    q.stop()
    val out = spark.read.parquet("/tmp/graft_e2e_out")
    println("[drive] rows=" + out.count())
    out.orderBy("level", "pack_seq", "pack_pos").show(20, false)
    spark.stop()
  }
}
