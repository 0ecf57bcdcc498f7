package graft.streaming

import graft.config.DeviceConfig
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}

/** Operational surface around the pipelines: echo mode (K2), the
  * heartbeat/metrics listener (K4), and the multi-device runner (X4).
  */
object Runner {

  /** K2 — raw-capture mode (reference `--echo`, readport.py:671-693):
    * dump framed messages to the console to reverse-engineer new device
    * formats. No parsing, no reconnect-suppression — just the frames.
    */
  def echo(spark: SparkSession, host: String, port: Int): StreamingQuery =
    IngestPipeline.rawStream(spark, host, port)
      .writeStream.format("console")
      .option("truncate", false)
      .start()

  /** K4 — heartbeat sink (reference hb_client.sh): the reference cron-POSTs
    * CPU/disk/RAM once a minute; Spark's own query-progress events carry
    * the equivalent liveness signal (rows/sec, batch duration, state
    * size). This listener surfaces them on a callback so deployments can
    * POST/log them; `attach` returns the listener for removal.
    */
  def attachHeartbeat(spark: SparkSession)
      (emit: String => Unit = s => System.err.println(s"[heartbeat] $s")): StreamingQueryListener = {
    val l = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        emit(s"""{"event":"started","id":"${e.id}"}""")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        emit(s"""{"event":"progress","id":"${p.id}","inputRows":${p.numInputRows},""" +
          s""""rowsPerSec":${p.processedRowsPerSecond},"batchMs":${p.durationMs.getOrDefault("triggerExecution", 0L)}}""")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        emit(s"""{"event":"terminated","id":"${e.id}","error":${e.exception.isDefined}}""")
    }
    spark.streams.addListener(l)
    l
  }

  /** X4 — per-station deployment unit: the reference runs one process
    * per device config (`screen` + `@reboot` cron, README.md:51-68);
    * here every config becomes one StreamingQuery inside a single
    * session, supervised together. Blocks until any query dies (caller
    * decides whether to restart — the reference's crash-and-cron-restart
    * policy — or to stop all).
    */
  def runStation(spark: SparkSession, configs: Seq[DeviceConfig],
      destRoot: String, checkpointRoot: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): Seq[StreamingQuery] =
    configs.map { cfg =>
      IngestPipeline.start(spark, cfg,
        s"$destRoot/station=${cfg.station}/device=${cfg.device}",
        s"$checkpointRoot/${cfg.station}_${cfg.device}_${cfg.port}",
        trigger)
    }

  def awaitAny(spark: SparkSession): Unit =
    spark.streams.awaitAnyTermination()
}
