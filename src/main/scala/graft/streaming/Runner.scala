package graft.streaming

import java.io.OutputStream
import java.net.{InetSocketAddress, Socket}

import graft.config.DeviceConfig
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}

/** Operational surface around the pipelines: echo mode (K2), the
  * heartbeat/metrics listener (K4), and the multi-device runner (X4).
  */
object Runner {

  /** K2 — raw-capture mode (reference `--echo`, readport.py:671-693):
    * pipe the device's raw bytes to `out` to reverse-engineer new
    * formats (the user redirects stdout to a file). Reference parity on
    * the error path: connect ONCE, and ANY error — including EOF and
    * read timeout — ends the run with no reconnect (readport.py:685-688
    * returns on the first exception), unlike the resilient ingest
    * source. Deliberately NOT a Spark query: this is a debugging
    * netcat, and raw bytes (no framing, no schema) have nothing for
    * the engine to do.
    *
    * @return bytes copied before EOF/error
    */
  def echo(host: String, port: Int, out: OutputStream = System.out,
      timeoutSec: Option[Double] = None): Long = {
    var total = 0L
    val socket = new Socket()
    try {
      socket.connect(new InetSocketAddress(host, port), 5000)
      timeoutSec.foreach(t => socket.setSoTimeout((t * 1000).toInt))
      val in = socket.getInputStream
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n != -1) {
        out.write(buf, 0, n); out.flush()
        total += n
        n = in.read(buf)
      }
    } catch {
      case e: java.io.IOException => System.err.println(s"echo: $e")
    } finally {
      try socket.close() catch { case _: Exception => }
    }
    total
  }

  /** Host-health snapshot (reference hb_client.sh:3-17, which POSTs CPU
    * temp / disk% / RAM% / net counters from the station): disk usage of
    * the given path, RAM usage from /proc/meminfo, and 1-min loadavg
    * from /proc/loadavg, as a JSON object fragment. Emitted beside the
    * query-progress metrics so the heartbeat carries BOTH liveness (the
    * query is making progress) and host health (the box it runs on is
    * not filling up / thrashing). Non-Linux or unreadable /proc fields
    * render as null rather than failing the heartbeat.
    */
  def hostMetrics(diskPath: String = "/"): String = {
    // Locale.ROOT: the f-interpolator uses the JVM default locale and a
    // comma-decimal locale would render invalid JSON
    def pct(used: Double, total: Double): String =
      if (total > 0)
        String.format(java.util.Locale.ROOT, "%.1f", Double.box(used / total * 100))
      else "null"
    // Source.fromFile holds a file descriptor until closed — this runs
    // once per progress event per query, so a leak here exhausts the
    // driver's FD table over a long run
    def readFile(path: String): String = {
      val src = scala.io.Source.fromFile(path)
      try src.mkString finally src.close()
    }
    val disk = try {
      val f = new java.io.File(diskPath)
      pct((f.getTotalSpace - f.getUsableSpace).toDouble, f.getTotalSpace.toDouble)
    } catch { case _: Exception => "null" }
    val ram = try {
      val kv = readFile("/proc/meminfo").linesIterator
        .map(_.split(":\\s+")).collect {
          case Array(k, v) => k -> v.trim.split("\\s+")(0).toLong
        }.toMap
      pct((kv("MemTotal") - kv("MemAvailable")).toDouble, kv("MemTotal").toDouble)
    } catch { case _: Exception => "null" }
    val load1 = try {
      readFile("/proc/loadavg").trim.split("\\s+")(0).toDouble.toString
    } catch { case _: Exception => "null" }
    // CPU temperature (hb_client.sh reads the thermal zone): absent in
    // VMs/containers → null, present on station hardware
    val temp = try {
      (readFile("/sys/class/thermal/thermal_zone0/temp").trim.toLong / 1000.0).toString
    } catch { case _: Exception => "null" }
    // cumulative rx/tx bytes across real interfaces (loopback excluded),
    // the reference's net counters — consumers diff successive beats
    val (rx, tx) = try {
      val rows = readFile("/proc/net/dev").linesIterator.drop(2)
        .map(_.trim.split("[:\\s]+")).filter(c => c.length > 9 && c(0) != "lo")
        .toSeq
      (rows.map(_(1).toLong).sum.toString, rows.map(_(9).toLong).sum.toString)
    } catch { case _: Exception => ("null", "null") }
    s"""{"disk_used_pct":$disk,"ram_used_pct":$ram,"load1":$load1,""" +
      s""""cpu_temp_c":$temp,"net_rx_bytes":$rx,"net_tx_bytes":$tx}"""
  }

  /** K4 — heartbeat sink (reference hb_client.sh): the reference cron-POSTs
    * CPU/disk/RAM once a minute; Spark's own query-progress events carry
    * the equivalent liveness signal (rows/sec, batch duration, state
    * size), and [[hostMetrics]] adds the host-health fields the reference
    * ships. This listener surfaces them on a callback so deployments can
    * POST/log them; `attach` returns the listener for removal.
    */
  def attachHeartbeat(spark: SparkSession)
      (emit: String => Unit = s => System.err.println(s"[heartbeat] $s")): StreamingQueryListener = {
    val l = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        emit(s"""{"event":"started","id":"${e.id}"}""")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        // F1 → K4: surface the parse stage's drop counters (graft_parse
        // observe node) in the liveness payload, the Spark twin of the
        // reference's per-failure ERROR/DEBUG log lines
        val dropped = Option(p.observedMetrics.get("graft_parse")).map { m =>
          s""","dropped":{"regex_drop":${m.getAs[Long]("regex_drop")},""" +
            s""""regex_drop_fresh":${m.getAs[Long]("regex_drop_fresh")},""" +
            s""""cast_kill":${m.getAs[Long]("cast_kill")}}"""
        }.getOrElse("")
        // NaN/Infinity (zero-duration or empty triggers) are not legal
        // JSON — render as null, as Spark's own progress.json does
        val rps = p.processedRowsPerSecond
        val rpsJson = if (java.lang.Double.isFinite(rps)) rps.toString else "null"
        emit(s"""{"event":"progress","id":"${p.id}","inputRows":${p.numInputRows},""" +
          s""""rowsPerSec":$rpsJson,"batchMs":${p.durationMs.getOrDefault("triggerExecution", 0L)}""" +
          s"""$dropped,"host":${hostMetrics()}}""")
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
