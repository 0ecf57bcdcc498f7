package graft.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream}
import java.net.{InetSocketAddress, Socket, SocketTimeoutException}
import java.util
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 micro-batch TCP source — the Spark-native rebuild of the
  * reference's resilient ingest client (S1-S5, readport.py:64-163,
  * 422-464):
  *
  *  - newline framing with partial/coalesced message handling
  *    (readport.py:122-149): one row per `\n`-terminated message
  *  - infinite reconnect at 1 s intervals (readport.py:95-118); data
  *    during an outage is lost at the device, as in the reference
  *  - read timeout → descriptive error → reconnect (readport.py:140-143)
  *  - `fresh` column: first message after (re)connect, so the parse
  *    stage can demote torn-first-message errors (readport.py:88-93)
  *  - arrival timestamp stamped at read (readport.py:449-453)
  *
  * Bytes are decoded ISO-8859-1 (bijective byte↔char) so regex
  * extraction stays byte-exact against binary device payloads
  * (SURVEY.md §7 hard part (c)).
  *
  * Scale posture: one stream per device, accumulated on the driver —
  * identical to the reference's one-process-per-device envelope
  * (~60 msg/s/station). A thousand devices are a thousand independent
  * queries (or a Kafka front-end); this source is the edge adapter,
  * not the fan-in.
  *
  * Usage: `spark.readStream.format("graft-socket")
  *   .option("host", h).option("port", p).option("timeoutSec", 120)`
  * → schema `value: string, time: timestamp, fresh: boolean`.
  */
class TcpLineSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-socket"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TcpLineSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TcpLineTable(properties)
}

object TcpLineSource {
  val Schema: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("time", TimestampType, nullable = false),
    StructField("fresh", BooleanType, nullable = false)))
}

class TcpLineTable(properties: util.Map[String, String])
    extends Table with SupportsRead {
  override def name(): String =
    s"graft-socket(${properties.get("host")}:${properties.get("port")})"
  override def schema(): StructType = TcpLineSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = TcpLineSource.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new TcpLineMicroBatchStream(
            options.get("host"),
            options.getInt("port", 0),
            Option(options.get("timeoutSec")).map(_.toDouble),
            Option(options.get("maxMessagesPerTrigger")).map(_.toLong),
            Option(checkpointLocation))
      }
    }
}

/** Offset = count of messages read since stream start. */
case class TcpOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

object TcpLineMicroBatchStream
    extends org.apache.spark.internal.Logging {

  /** The stream's checkpointed high-water mark: the newest entry of the
    * query's offset log (last line of `<ckptRoot>/offsets/<maxBatch>` —
    * this source serializes its offset as a bare number). Spark hands
    * the source `<ckptRoot>/sources/<id>`, so the query root is two
    * levels up. 0 when there is no checkpoint yet (fresh query) or the
    * layout is unreadable.
    *
    * Read at CONSTRUCTION so a restarted incarnation numbers its buffer
    * from the previous incarnation's watermark from the very first
    * engine call — recovery does NOT reliably pass checkpointed offsets
    * through `deserializeOffset` before the first `latestOffset`, and a
    * fresh buffer numbered from 0 under a committed watermark w would
    * have its first w new messages silently swallowed as already
    * committed.
    */
  def checkpointedWatermark(sourceCheckpointLocation: String): Long = try {
    val src = new org.apache.hadoop.fs.Path(sourceCheckpointLocation)
    val root =
      if (src.getParent != null && src.getParent.getName == "sources")
        src.getParent.getParent
      else src
    val offsets = new org.apache.hadoop.fs.Path(root, "offsets")
    // the SESSION's hadoop conf: a bare Configuration() lacks the
    // spark.hadoop.* filesystem settings/credentials, so on s3a/hdfs
    // checkpoints the read would throw, be swallowed, and return 0 —
    // silently re-enabling the restart message-swallowing bug
    val hadoopConf = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val fs = offsets.getFileSystem(hadoopConf)
    if (!fs.exists(offsets)) 0L
    else {
      val batches = fs.listStatus(offsets).map(_.getPath.getName)
        .flatMap(_.toLongOption)
      if (batches.isEmpty) 0L
      else {
        val latest = new org.apache.hadoop.fs.Path(offsets, batches.max.toString)
        val in = fs.open(latest)
        val txt =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        val w = txt.linesIterator.map(_.trim).filter(_.nonEmpty)
          .toSeq.lastOption.flatMap(_.toLongOption).getOrElse(0L)
        if (w > 0)
          logWarning(s"graft-socket: resuming from checkpointed offset $w " +
            "(in-memory source is not replayable; the restart gap is lost, " +
            "at-most-once — matching the reference's process restart)")
        w
      }
    }
  } catch { case _: Exception => 0L }
}

/** @param maxPerTrigger X2 admission cap: at most this many messages per
  *   micro-batch, the Spark twin of the reference's bounded queue that
  *   screams-and-dies on overflow (readport.py:457-464). Here overflow
  *   cannot drop data — `latestOffset` simply meters the backlog out
  *   across triggers, so a post-stall burst can't produce one giant
  *   batch that blows executor memory.
  *
  * NOT REPLAYABLE across restarts: the buffer is in-memory (the
  * reference's process-local queue, readport.py:445-455). On restart
  * from a checkpoint the previous incarnation's messages are gone;
  * offsets re-align to the checkpointed high-water mark (see
  * [[alignTo]]) and any uncommitted range is served as an empty batch
  * with a logged warning — the same at-most-once outage gap the
  * reference has when its process restarts.
  */
class TcpLineMicroBatchStream(host: String, port: Int,
    timeoutSec: Option[Double], maxPerTrigger: Option[Long] = None,
    checkpointLocation: Option[String] = None)
    extends MicroBatchStream with org.apache.spark.internal.Logging {

  private val lock = new Object
  // (message, arrival micros, fresh) — indexed from `trimmed`
  private val messages = ArrayBuffer[(String, Long, Boolean)]()
  // buffer base starts at the previous incarnation's checkpointed
  // watermark (0 on a fresh query) — see checkpointedWatermark
  private var trimmed = checkpointLocation
    .map(TcpLineMicroBatchStream.checkpointedWatermark).getOrElse(0L)
  private val stopped = new AtomicBoolean(false)
  @volatile private var readerThread: Thread = _
  @volatile private var activeSocket: Socket = _
  // hoisted: a per-message sys.props lookup would sit on the hot path
  private val traceEnabled = sys.props.contains("graft.socket.trace")

  private def ensureReader(): Unit = lock.synchronized {
    if (readerThread == null) {
      readerThread = new Thread(() => readLoop(), s"graft-socket-$host:$port")
      readerThread.setDaemon(true)
      readerThread.start()
    }
  }

  /** Connect-retry + read-frame loop (reference listen_device,
    * readport.py:422-464).
    */
  private def readLoop(): Unit = {
    while (!stopped.get()) {
      var socket: Socket = null
      try {
        socket = new Socket()
        activeSocket = socket  // stop() closes it to unblock a read
        socket.connect(new InetSocketAddress(host, port), 5000)
        timeoutSec.foreach(t => socket.setSoTimeout((t * 1000).toInt))
        val in = new BufferedInputStream(socket.getInputStream)
        var fresh = true  // S4: first message after (re)connect
        val buf = new ByteArrayOutputStream()
        var b = in.read()
        while (!stopped.get() && b != -1) {
          if (b == '\n') {
            val msg = new String(buf.toByteArray, java.nio.charset.StandardCharsets.ISO_8859_1)
            buf.reset()
            val now = System.currentTimeMillis() * 1000L  // micros
            lock.synchronized { messages += ((msg, now, fresh)) }
            if (traceEnabled)
              logWarning(s"TRACE recv inst=${System.identityHashCode(this)} " +
                s"stopped=${stopped.get} msg=${msg.take(80)}")
            fresh = false
          } else buf.write(b)
          b = in.read()
        }
        // -1: peer closed → reconnect (readport.py:134-139)
      } catch {
        case _: SocketTimeoutException => // S3: idle timeout → reconnect
        case _: java.io.IOException    => // connect refused / reset → retry
      } finally {
        if (socket != null) try socket.close() catch { case _: Exception => }
      }
      if (!stopped.get())
        try Thread.sleep(1000)  // S2: 1 s retry interval
        catch { case _: InterruptedException => return }  // stop() requested
    }
  }

  override def initialOffset(): Offset = TcpOffset(0L)

  override def deserializeOffset(json: String): Offset = {
    val o = json.toLong
    alignTo(o)  // checkpointed offsets surface here first on restart
    TcpOffset(o)
  }

  // true once this incarnation has exposed an offset of its own (first
  // latestOffset). Before that, any external offset can only be a
  // checkpointed high-water mark from a PREVIOUS incarnation.
  private var minted = false

  /** Re-seat offset arithmetic after a restart from checkpoint: an
    * external offset arriving before this incarnation has minted any
    * offset was counted by a previous incarnation whose buffer is gone.
    * Renumber the (new) buffer to start at the checkpointed offset so
    * offsets stay monotone and `commit` can never be asked to drop rows
    * we don't hold. Guarding on `minted` (not on buffer size) closes
    * the race where the new incarnation has already buffered >= o new
    * messages at recovery time — those would otherwise be silently
    * swallowed as "already committed".
    */
  private def alignTo(o: Long): Unit = lock.synchronized {
    if (!minted && o > trimmed) {
      logWarning(s"graft-socket $host:$port: checkpointed offset $o " +
        s"predates this incarnation (buffer base $trimmed, " +
        s"${messages.size} new rows buffered); source is not replayable " +
        "— the checkpoint gap is lost (at-most-once), re-aligning the " +
        "buffer base to the checkpointed offset")
      trimmed = o
      lastEnd = math.max(lastEnd, o)
    }
  }

  // highest end offset exposed to the engine; the admission cap advances
  // from here (not from `trimmed` — Spark may plan the next trigger
  // before the previous commit lands)
  private var lastEnd = 0L

  override def latestOffset(): Offset = {
    ensureReader()
    lock.synchronized {
      minted = true
      val avail = trimmed + messages.size
      // X2: meter a backlog out across triggers instead of one huge batch
      val base = math.max(trimmed, lastEnd)
      val end = maxPerTrigger.fold(avail)(cap => math.min(avail, base + cap))
      lastEnd = math.max(lastEnd, end)
      TcpOffset(end)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TcpOffset].n
    val e = end.asInstanceOf[TcpOffset].n
    alignTo(e)
    val slice = lock.synchronized {
      // clamp: a replayed range that predates the buffer yields an empty
      // batch (non-replayable source) rather than a negative slice
      val lo = math.max(0L, math.min(s - trimmed, messages.size.toLong)).toInt
      val hi = math.max(lo.toLong, math.min(e - trimmed, messages.size.toLong)).toInt
      if (s < trimmed)
        logWarning(s"graft-socket $host:$port: replayed range [$s, $e) " +
          s"predates the in-memory buffer (base $trimmed) — serving " +
          s"${hi - lo} of ${e - s} rows; the rest were lost at restart")
      messages.slice(lo, hi).toArray
    }
    Array(TcpLinePartition(slice))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => new PartitionReader[InternalRow] {
      private val rows = partition.asInstanceOf[TcpLinePartition].rows
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val (msg, ts, fresh) = rows(i)
        InternalRow(UTF8String.fromString(msg), ts, fresh)
      }
      override def close(): Unit = ()
    }

  override def commit(end: Offset): Unit = lock.synchronized {
    val e = end.asInstanceOf[TcpOffset].n
    // clamp to the buffer: a checkpoint-replayed commit beyond the
    // in-memory range must not index past what we hold
    val drop = math.max(0L, math.min(e - trimmed, messages.size.toLong)).toInt
    if (drop > 0) messages.remove(0, drop)
    if (e > trimmed) trimmed = e
  }

  /** Graceful drain (X3): interrupt doesn't unblock a socket read, so
    * close the active connection too, then give the reader a moment to
    * exit — a zombie reader would keep consuming the device's bytes
    * into a dead buffer and fight a restarted query for the connection.
    */
  override def stop(): Unit = {
    stopped.set(true)
    // retry close+join: the reader may have just passed its loop-top
    // stopped check and opened a NEW socket after our close — each
    // round closes the latest one until the thread is provably gone
    var attempts = 0
    while (readerThread != null && readerThread.isAlive && attempts < 5) {
      val s = activeSocket
      if (s != null) try s.close() catch { case _: Exception => }
      readerThread.interrupt()
      try readerThread.join(600) catch { case _: InterruptedException => }
      attempts += 1
    }
  }
}

case class TcpLinePartition(rows: Array[(String, Long, Boolean)])
    extends InputPartition
