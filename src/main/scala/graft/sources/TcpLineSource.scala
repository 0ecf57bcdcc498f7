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
            Option(options.get("timeoutSec")).map(_.toDouble))
      }
    }
}

/** Offset = count of messages read since stream start. */
case class TcpOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

class TcpLineMicroBatchStream(host: String, port: Int,
    timeoutSec: Option[Double]) extends MicroBatchStream {

  private val lock = new Object
  // (message, arrival micros, fresh) — indexed from `trimmed`
  private val messages = ArrayBuffer[(String, Long, Boolean)]()
  private var trimmed = 0L
  private val stopped = new AtomicBoolean(false)
  @volatile private var readerThread: Thread = _

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
      if (!stopped.get()) Thread.sleep(1000)  // S2: 1 s retry interval
    }
  }

  override def initialOffset(): Offset = TcpOffset(0L)
  override def deserializeOffset(json: String): Offset = TcpOffset(json.toLong)

  override def latestOffset(): Offset = {
    ensureReader()
    lock.synchronized { TcpOffset(trimmed + messages.size) }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TcpOffset].n
    val e = end.asInstanceOf[TcpOffset].n
    val slice = lock.synchronized {
      messages.slice((s - trimmed).toInt, (e - trimmed).toInt).toArray
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
    val drop = (e - trimmed).toInt
    if (drop > 0) { messages.remove(0, drop); trimmed = e }
  }

  override def stop(): Unit = {
    stopped.set(true)
    if (readerThread != null) readerThread.interrupt()
  }
}

case class TcpLinePartition(rows: Array[(String, Long, Boolean)])
    extends InputPartition
