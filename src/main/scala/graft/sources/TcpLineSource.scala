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
            Option(checkpointLocation),
            options.getInt("walMaxSegments", 8))
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
    val fs = offsets.getFileSystem(sessionHadoopConf())
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
        txt.linesIterator.map(_.trim).filter(_.nonEmpty)
          .toSeq.lastOption.flatMap(_.toLongOption).getOrElse(0L)
      }
    }
  } catch { case _: Exception => 0L }

  /** The SESSION's hadoop conf: a bare Configuration() lacks the
    * spark.hadoop.* filesystem settings/credentials, so on s3a/hdfs
    * checkpoints reads would throw, be swallowed, and silently
    * re-enable the restart message-swallowing bug.
    */
  def sessionHadoopConf(): org.apache.hadoop.conf.Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
}

/** @param maxPerTrigger X2 admission cap: at most this many messages per
  *   micro-batch, the Spark twin of the reference's bounded queue that
  *   screams-and-dies on overflow (readport.py:457-464). Here overflow
  *   cannot drop data — `latestOffset` simply meters the backlog out
  *   across triggers, so a post-stall burst can't produce one giant
  *   batch that blows executor memory.
  *
  * REPLAYABLE across restarts via a write-ahead log (round 3): framed
  * messages are persisted as WAL segments under the source checkpoint
  * BEFORE their offsets are exposed to the engine, so any range the
  * engine can have planned is durable. On restart the new incarnation
  * numbers its buffer from the WAL high-water mark and serves replayed
  * (planned-but-uncommitted) ranges out of the WAL — at-least-once
  * end-to-end, upgraded to exactly-once by the offset-tracked parquet
  * sink. Committed segments are deleted on commit, so the WAL holds
  * only in-flight batches. The one remaining gap matches the
  * reference's process-local queue (readport.py:445-455): messages
  * buffered but never yet exposed in ANY offset die with the process,
  * exactly as the reference loses its queue on a crash. Without a
  * checkpoint location the source degrades to the legacy in-memory
  * at-most-once behavior.
  */
class TcpLineMicroBatchStream(host: String, port: Int,
    timeoutSec: Option[Double], maxPerTrigger: Option[Long] = None,
    checkpointLocation: Option[String] = None,
    walMaxSegments: Int = 8)
    extends MicroBatchStream with org.apache.spark.internal.Logging {
  import TcpLineMicroBatchStream.sessionHadoopConf

  private val lock = new Object
  // (message, arrival micros, fresh) — indexed from `trimmed`
  private val messages = ArrayBuffer[(String, Long, Boolean)]()

  // --- WAL state (absent checkpointLocation ⇒ legacy in-memory mode)
  private val walDir: Option[org.apache.hadoop.fs.Path] =
    checkpointLocation.map(l => new org.apache.hadoop.fs.Path(l, "wal"))
  private lazy val walFs: org.apache.hadoop.fs.FileSystem =
    walDir.get.getFileSystem(sessionHadoopConf())
  private val SegName = """^(\d+)-(\d+)$""".r

  /** All WAL segments as (startOffset, endOffset, path), sorted;
    * segments are non-overlapping by construction.
    */
  private def listSegments(): Seq[(Long, Long, org.apache.hadoop.fs.Path)] =
    walDir.toSeq.flatMap { dir =>
      if (!walFs.exists(dir)) Seq.empty
      else walFs.listStatus(dir).toSeq.flatMap { st =>
        st.getPath.getName match {
          case SegName(a, b) => Some((a.toLong, b.toLong, st.getPath))
          case _ => None
        }
      }.sortBy(_._1)
    }

  // Resume point, computed at CONSTRUCTION so a restarted incarnation
  // numbers its buffer correctly from the very first engine call
  // (recovery does NOT reliably pass checkpointed offsets through
  // deserializeOffset before the first latestOffset). WAL end >= the
  // offset-log watermark whenever the WAL is intact (persist happens
  // before expose); the max() also covers a manually-deleted WAL.
  private val resumeAt: Long = {
    val w = checkpointLocation
      .map(TcpLineMicroBatchStream.checkpointedWatermark).getOrElse(0L)
    // sweep crash-torn segment writes (never listed as segments, but
    // they'd otherwise accumulate one per crash)
    try walDir.foreach { dir =>
      if (walFs.exists(dir))
        walFs.listStatus(dir).filter(_.getPath.getName.startsWith(".tmp-"))
          .foreach(st => walFs.delete(st.getPath, false))
    } catch { case _: Exception => () }
    val walEnd = (try listSegments() catch { case _: Exception => Seq.empty })
      .map(_._2).maxOption.getOrElse(0L)
    if (math.max(w, walEnd) > 0) {
      if (walDir.isDefined && walEnd >= w)
        logInfo(s"graft-socket $host:$port: resuming at offset " +
          s"${math.max(w, walEnd)}; uncommitted ranges replay from the " +
          "WAL (at-least-once)")
      else
        logWarning(s"graft-socket $host:$port: resuming at offset " +
          s"${math.max(w, walEnd)} with no covering WAL — the restart " +
          "gap is lost (at-most-once, the reference's process-restart " +
          "semantics)")
    }
    math.max(w, walEnd)
  }

  // buffer base: messages(0) sits at global offset `trimmed`
  private var trimmed = resumeAt
  // highest offset durable in the WAL; only durable offsets are exposed
  private var persisted = resumeAt
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

  /** Legacy-mode (no WAL) restart re-seat: an external offset arriving
    * before this incarnation has minted any offset was counted by a
    * previous incarnation whose buffer is gone. Renumber the (new)
    * buffer to start at the checkpointed offset so offsets stay
    * monotone and `commit` can never be asked to drop rows we don't
    * hold. Guarding on `minted` (not on buffer size) closes the race
    * where the new incarnation has already buffered >= o new messages
    * at recovery time. With a WAL this is a no-op: construction already
    * seated `trimmed` at the WAL high-water mark, which bounds every
    * checkpointed offset (persist-before-expose).
    */
  private def alignTo(o: Long): Unit = lock.synchronized {
    if (walDir.isEmpty && !minted && o > trimmed) {
      logWarning(s"graft-socket $host:$port: checkpointed offset $o " +
        s"predates this incarnation (buffer base $trimmed, " +
        s"${messages.size} new rows buffered); source has no WAL " +
        "— the checkpoint gap is lost (at-most-once), re-aligning the " +
        "buffer base to the checkpointed offset")
      trimmed = o
      persisted = math.max(persisted, o)
      lastEnd = math.max(lastEnd, o)
    }
  }

  /** Write rows as the WAL segment `<start>-<start+rows.length>`, via a
    * dotfile + rename so a torn write is never listed as a segment.
    * Shared by [[persistPending]] (append path) and [[compactSegments]]
    * (rewrite path).
    */
  private def writeSegment(start: Long,
      rows: Array[(String, Long, Boolean)],
      allowReplace: Boolean = false): Unit = {
    val dir = walDir.get
    if (!walFs.exists(dir)) walFs.mkdirs(dir)
    val end = start + rows.length
    val tmp = new org.apache.hadoop.fs.Path(dir, s".tmp-$start-$end")
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(walFs.create(tmp, true)))
    try rows.foreach { case (msg, ts, fresh) =>
      val bytes = msg.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      out.writeLong(ts); out.writeBoolean(fresh)
      out.writeInt(bytes.length); out.write(bytes)
    } finally out.close()
    val seg = new org.apache.hadoop.fs.Path(dir, s"$start-$end")
    // only the COMPACTION caller may replace a same-named segment (a
    // crashed compaction's output for the identical [start, end) range —
    // same deterministic content). The append path keeps rename-refusal
    // fatal: a colliding name there means a bookkeeping bug, and a
    // silent replace would swallow the evidence.
    if (allowReplace && walFs.exists(seg)) walFs.delete(seg, false)
    if (!walFs.rename(tmp, seg))
      throw new java.io.IOException(
        s"graft-socket WAL: rename failed for segment [$start, $end)")
  }

  // live-segment estimate, maintained on the trigger thread (persist /
  // commit / compact all run there) so the per-trigger hygiene check
  // costs no FS listing; re-synced from the real listing at each commit
  private var segCount = 0

  /** Append the not-yet-durable buffer suffix as one WAL segment.
    * Called on the engine's trigger thread; file IO runs OUTSIDE the
    * buffer lock so the reader thread keeps ingesting during the write.
    */
  private def persistPending(): Unit = {
    val (segStart, slice) = lock.synchronized {
      val avail = trimmed + messages.size
      if (avail > persisted)
        (persisted,
          messages.slice((persisted - trimmed).toInt, messages.size).toArray)
      else (persisted, Array.empty[(String, Long, Boolean)])
    }
    if (slice.nonEmpty) {
      writeSegment(segStart, slice)
      lock.synchronized { persisted = math.max(persisted, segStart + slice.length) }
      segCount += 1
      // hygiene even when the sink never commits (a long-running batch
      // or a stalled downstream): without this, one segment per trigger
      // accumulates thousands of small files under the checkpoint
      if (segCount > walMaxSegments)
        compactSegments(lock.synchronized(trimmed))
    }
  }

  /** Merge every live (not fully committed) segment into ONE when their
    * count exceeds `walMaxSegments`: a slow or stalled sink otherwise
    * accumulates one small file per trigger, unbounded. The merged
    * segment covers [max(committed, first live start), last live end)
    * and is renamed into place BEFORE the old segments are deleted, so
    * a crash anywhere in between leaves overlapping-but-consistent
    * segments that [[readWal]]'s cursor dedupes on replay. Cost is one
    * rewrite of the uncommitted backlog per `walMaxSegments` triggers —
    * zero in the steady state where the sink commits every trigger (the
    * commit-path delete keeps the count at 1-2).
    */
  private def compactSegments(committed: Long): Unit = try {
    val live = listSegments().filter(_._2 > committed)
    segCount = live.length
    if (live.length > walMaxSegments) {
      val start = math.max(committed, live.map(_._1).min)
      val end = live.map(_._2).max
      // a crash between a previous compaction's rename and its deletes
      // leaves the merged segment beside its stale sources; every row
      // still needed is inside the spanning segment, so finish the
      // deletes instead of rewriting the whole backlog again
      val spanning = live.filter { case (a, b, _) => a <= start && b >= end }
      if (spanning.nonEmpty) {
        val keep = spanning.map(_._3.getName).toSet
        live.foreach { case (_, _, p) =>
          if (!keep.contains(p.getName)) walFs.delete(p, false)
        }
        segCount = spanning.length
        logInfo(s"graft-socket $host:$port: pruned ${live.length - spanning.length} " +
          s"stale WAL segments overlapped by [$start, $end)")
        return
      }
      val rows = readWal(start, end)
      // only compact a gapless backlog: a hole (manually deleted
      // segment) must not be papered over with a mislabeled range
      if (rows.length == (end - start).toInt) {
        writeSegment(start, rows, allowReplace = true)
        val merged = s"$start-$end"
        live.foreach { case (_, _, p) =>
          if (p.getName != merged) walFs.delete(p, false)
        }
        segCount = 1
        logInfo(s"graft-socket $host:$port: compacted ${live.length} WAL " +
          s"segments into [$start, $end)")
      }
    }
  } catch { case ex: Exception =>
    // non-fatal: compaction failure costs disk, never data
    logWarning(s"graft-socket WAL: compaction failed: $ex")
  }

  /** Read rows [s, e) back out of the WAL (restart replay path). The
    * cursor tracks the next offset still needed, which both skips
    * already-served prefixes and DEDUPES overlapping segments — the
    * legal state a crash between compaction's rename and its deletes
    * leaves behind.
    */
  private def readWal(s: Long, e: Long): Array[(String, Long, Boolean)] = {
    val out = ArrayBuffer[(String, Long, Boolean)]()
    var cursor = s
    listSegments().foreach { case (a, b, p) =>
      if (b > cursor && a < e) {
        val in = new java.io.DataInputStream(
          new BufferedInputStream(walFs.open(p)))
        try {
          var off = a
          val hi = math.min(b, e)
          while (off < hi) {
            val ts = in.readLong(); val fresh = in.readBoolean()
            val bytes = new Array[Byte](in.readInt()); in.readFully(bytes)
            if (off >= cursor)
              out += ((new String(bytes,
                java.nio.charset.StandardCharsets.ISO_8859_1), ts, fresh))
            off += 1
          }
          cursor = math.max(cursor, hi)
        } finally in.close()
      }
    }
    out.toArray
  }

  // highest end offset exposed to the engine; the admission cap advances
  // from here (not from `trimmed` — Spark may plan the next trigger
  // before the previous commit lands)
  private var lastEnd = 0L

  override def latestOffset(): Offset = {
    ensureReader()
    // durability BEFORE visibility: every offset the engine can plan
    // against is already on disk, so a crash between planning and
    // commit can always be replayed
    if (walDir.isDefined) persistPending()
    lock.synchronized {
      minted = true
      val avail = trimmed + messages.size
      // only expose what is durable (== avail unless the reader
      // appended during the segment write; the tail goes next trigger)
      val exposable = if (walDir.isDefined) math.min(avail, persisted) else avail
      // X2: meter a backlog out across triggers instead of one huge batch
      val base = math.max(trimmed, lastEnd)
      val end = maxPerTrigger.fold(exposable)(cap => math.min(exposable, base + cap))
      lastEnd = math.max(lastEnd, end)
      TcpOffset(end)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TcpOffset].n
    val e = end.asInstanceOf[TcpOffset].n
    alignTo(e)
    val (base, mem) = lock.synchronized {
      // in-memory part: clamp to the buffer range
      val lo = math.max(0L, math.min(s - trimmed, messages.size.toLong)).toInt
      val hi = math.max(lo.toLong, math.min(e - trimmed, messages.size.toLong)).toInt
      (trimmed, messages.slice(lo, hi).toArray)
    }
    val rows =
      if (s >= base) mem
      else if (walDir.isDefined) {
        // restart replay: the range head predates this incarnation's
        // buffer — serve it from the WAL, then any in-memory tail
        readWal(s, math.min(e, base)) ++ mem
      } else mem
    if (rows.length < e - s)
      logWarning(s"graft-socket $host:$port: range [$s, $e) served " +
        s"${rows.length} of ${e - s} rows — the rest " +
        (if (walDir.isDefined) "are missing from the WAL (segments deleted?)"
         else "were lost at restart (no WAL)"))
    Array(TcpLinePartition(rows))
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

  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[TcpOffset].n
    lock.synchronized {
      // clamp to the buffer: a checkpoint-replayed commit beyond the
      // in-memory range must not index past what we hold
      val drop = math.max(0L, math.min(e - trimmed, messages.size.toLong)).toInt
      if (drop > 0) messages.remove(0, drop)
      if (e > trimmed) trimmed = e
      if (e > persisted) persisted = e
    }
    // fully-committed segments are no longer needed for replay; a
    // partially-committed segment (batch boundary inside it) stays.
    // Cleanup failure is non-fatal — it only costs disk, not data.
    if (walDir.isDefined) {
      try {
        val segs = listSegments()
        segs.foreach { case (_, b, p) => if (b <= e) walFs.delete(p, false) }
        segCount = segs.count(_._2 > e)  // re-sync the estimate
        if (segCount > walMaxSegments) compactSegments(e)
      } catch { case ex: Exception =>
        logWarning(s"graft-socket WAL: segment cleanup failed: $ex")
      }
    }
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
