package graft.sources

import java.io.OutputStream
import java.net.ServerSocket
import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Loopback TCP fixture — the Spark twin of the reference's test server
  * with its instruction DSL (tests/test_socket.py:22-112): scripted
  * writes, fragmentation, coalescing, disconnects.
  */
class TcpFixtureServer {
  private val server = new ServerSocket(0)
  val port: Int = server.getLocalPort
  // each script entry: Seq of raw chunks to write, then close connection
  private val scripts = new LinkedBlockingQueue[Seq[Array[Byte]]]()
  @volatile private var running = true

  private val thread = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        val script = scripts.poll(10, TimeUnit.SECONDS)
        val out: OutputStream = sock.getOutputStream
        if (script != null) script.foreach { chunk =>
          out.write(chunk); out.flush(); Thread.sleep(30)
        }
        sock.close()
      } catch { case _: Exception => }
    }
  })
  thread.setDaemon(true)
  thread.start()

  def enqueue(chunks: Array[Byte]*): Unit = scripts.put(chunks.toSeq)
  def close(): Unit = { running = false; server.close() }
}

class TcpLineSourceSpec extends SparkTestBase {
  import spark.implicits._

  test("framing: fragmented and coalesced writes yield whole messages (fixture A6)") {
    val srv = new TcpFixtureServer
    // fragmentation: "mess" + "age 2\n"; coalescing: two messages in one write
    srv.enqueue(
      "message 1\n".getBytes,
      "mess".getBytes, "age 2\n".getBytes,
      "message 5\nmessage 6\n".getBytes)
    val df = spark.readStream.format("graft-socket")
      .option("host", "localhost").option("port", srv.port).load()
    val q = df.writeStream.format("memory").queryName("frames")
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("frames").count() < 4 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable(); Thread.sleep(100)
      }
      val rows = spark.table("frames").orderBy("time").collect()
      assert(rows.map(_.getString(0)).toSeq ==
        Seq("message 1", "message 2", "message 5", "message 6"))
      // S4: first message after connect is fresh, rest are not
      assert(rows.head.getBoolean(2))
      assert(!rows(1).getBoolean(2))
      // S5: arrival timestamps are monotone non-decreasing
      val ts = rows.map(_.getTimestamp(1).getTime)
      assert(ts.zip(ts.tail).forall { case (a, b) => a <= b })
    } finally { q.stop(); srv.close() }
  }

  test("reconnect after peer disconnect; first post-reconnect message fresh (S2/S4)") {
    val srv = new TcpFixtureServer
    srv.enqueue("before drop\n".getBytes)      // connection 1, then closed
    srv.enqueue("after reconnect\n".getBytes)  // connection 2
    val df = spark.readStream.format("graft-socket")
      .option("host", "localhost").option("port", srv.port).load()
    val q = df.writeStream.format("memory").queryName("reconn")
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("reconn").count() < 2 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable(); Thread.sleep(100)
      }
      val rows = spark.table("reconn").orderBy("time").collect()
      assert(rows.map(_.getString(0)).toSeq == Seq("before drop", "after reconnect"))
      assert(rows.forall(_.getBoolean(2)))  // both are first-after-(re)connect
    } finally { q.stop(); srv.close() }
  }
}
