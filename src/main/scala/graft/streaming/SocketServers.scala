package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generic listening socket servers — the transport under the `syslog`
  * and `statsd` YAML source types (and any future line-oriented server
  * source).
  *
  * Reference: src/sources/syslog.rs (tcp/udp/unix listener modes,
  * octet-counting or newline framing per RFC6587) and
  * src/sources/statsd/mod.rs (udp default, tcp option). The reference
  * builds these from a shared `SocketListenAddr` + framing stack; here
  * the shared piece is one TCP accept-loop server and one UDP datagram
  * server, both feeding a MemoryStream — the same driver-side listener
  * shape as the other push sources (single listener per instance, load
  * balancer in front at fleet scale).
  *
  * TLS: `tls` carries a ready [[javax.net.ssl.SSLContext]] (built by
  * [[graft.streaming.Tls]] from the reference's `tls:` config shape —
  * crt_file/key_file/ca_file PEM), turning the accept loop into an
  * SSLServerSocket accept loop. Framing/decoding are unchanged above
  * the transport, exactly like the reference's tls wrapping.
  */
object SocketServers {

  /** TCP line server: accept loop, per-connection reader thread, frames
    * split per `framing` ("newline_delimited" default, "octet_counting"
    * per RFC6587, "character_delimited:<d>").
    */
  final class TcpLineServer(spark: SparkSession, port: Int,
                            framing: String = "newline_delimited",
                            tls: Option[javax.net.ssl.SSLContext] = None,
                            maxLength: Int = 102400) {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    private val mem = MemoryStream[String]
    private val server: java.net.ServerSocket = tls match {
      case Some(ctx) =>
        val s = ctx.getServerSocketFactory.createServerSocket(port)
        s
      case None => new java.net.ServerSocket(port)
    }
    @volatile private var running = true

    /** RFC6587 octet-counting: `N <N bytes>` repeated; a parse failure
      * falls back to newline framing for the remainder (the reference's
      * auto-detection accepts either on one listener).
      */
    private def octetFrames(in: java.io.InputStream)
        (emit: String => Unit): Unit = {
      val pb = new java.io.PushbackInputStream(
        new java.io.BufferedInputStream(in), 16)
      var ok = true
      while (ok) {
        val digits = new StringBuilder
        var c = pb.read()
        while (c >= '0' && c <= '9' && digits.length < 10) {
          digits.append(c.toChar); c = pb.read()
        }
        if (c == ' ' && digits.nonEmpty) {
          // Cap the declared length (reference default_max_length =
          // 100 KiB, serde.rs:24) — an attacker-controlled length must
          // not drive the allocation. Parse as Long so 10 digits can't
          // throw on toInt overflow; oversized frames are drained and
          // discarded, the connection stays up (reference discards
          // over-limit input).
          val declared = digits.toString.toLong
          if (declared > maxLength) {
            var toSkip = declared
            while (toSkip > 0 && ok) {
              val skipped = pb.skip(toSkip)
              if (skipped <= 0) {
                if (pb.read() < 0) ok = false else toSkip -= 1
              } else toSkip -= skipped
            }
          } else {
            val n = declared.toInt
            val buf = new Array[Byte](n)
            var got = 0
            var r = 0
            while (got < n && r >= 0) {
              r = pb.read(buf, got, n - got)
              if (r > 0) got += r
            }
            if (got == n) emit(new String(buf, "UTF-8")) else ok = false
          }
        } else if (c < 0) ok = false
        else {
          // not octet-counted — treat as newline-framed line
          val sb = new StringBuilder(digits.toString)
          if (c != '\n') sb.append(c.toChar)
          var d = if (c == '\n') -2 else pb.read()
          while (d >= 0 && d != '\n') { sb.append(d.toChar); d = pb.read() }
          if (sb.nonEmpty) emit(sb.toString)
          if (d == -1) ok = false
        }
      }
    }

    private def handle(sock: java.net.Socket): Unit = {
      try {
        framing match {
          case "octet_counting" =>
            octetFrames(sock.getInputStream)(l =>
              mem.synchronized { mem.addData(l) })
          case f =>
            val delim = if (f.startsWith("character_delimited:"))
              f.substring("character_delimited:".length) else "\n"
            val reader = new java.io.BufferedReader(
              new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
            if (delim == "\n") {
              var line = reader.readLine()
              while (line != null) {
                if (line.nonEmpty) mem.synchronized { mem.addData(line) }
                line = reader.readLine()
              }
            } else {
              val all = new StringBuilder
              val buf = new Array[Char](4096)
              var n = reader.read(buf)
              while (n >= 0) { all.appendAll(buf, 0, n); n = reader.read(buf) }
              all.toString.split(java.util.regex.Pattern.quote(delim))
                .filter(_.nonEmpty)
                .foreach(l => mem.synchronized { mem.addData(l) })
            }
        }
      } catch {
        case _: java.io.IOException => ()
        case _: NumberFormatException => () // malformed frame length
      }
      finally sock.close()
    }

    private val acceptThread = new Thread(() => {
      try while (running) {
        val sock = server.accept()
        val t = new Thread(() => handle(sock), "tcp-line-conn")
        t.setDaemon(true); t.start()
      } catch { case _: java.io.IOException => () }
    }, "tcp-line-accept")
    acceptThread.setDaemon(true)
    acceptThread.start()

    def boundPort: Int = server.getLocalPort
    def df: DataFrame = mem.toDF().withColumnRenamed("value", "message")
    def stop(): Unit = { running = false; server.close() }
  }

  /** UDP datagram server: each datagram is newline-split into messages
    * (statsd clients batch many lines per packet).
    */
  final class UdpLineServer(spark: SparkSession, port: Int) {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    private val mem = MemoryStream[String]
    private val sock = new java.net.DatagramSocket(port)
    @volatile private var running = true

    private val recvThread = new Thread(() => {
      val buf = new Array[Byte](65536)
      try while (running) {
        val pkt = new java.net.DatagramPacket(buf, buf.length)
        sock.receive(pkt)
        val body = new String(pkt.getData, pkt.getOffset, pkt.getLength, "UTF-8")
        val lines = body.split("\n").filter(_.nonEmpty)
        if (lines.nonEmpty) mem.addData(lines.toIndexedSeq)
      } catch { case _: java.io.IOException => () }
    }, "udp-line-recv")
    recvThread.setDaemon(true)
    recvThread.start()

    def boundPort: Int = sock.getLocalPort
    def df: DataFrame = mem.toDF().withColumnRenamed("value", "message")
    def stop(): Unit = { running = false; sock.close() }
  }

  /** TCP line CLIENT: connects OUT to host:port (the Spark socket
    * source's shape) but through an arbitrary socket factory — the TLS
    * path for `type: socket` sources, which Spark's built-in socket
    * format cannot wrap.
    */
  final class TcpLineClient(spark: SparkSession, host: String, port: Int,
                            tls: Option[javax.net.ssl.SSLContext]) {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    private val mem = MemoryStream[String]
    private val sock = tls match {
      case Some(ctx) => ctx.getSocketFactory.createSocket(host, port)
      case None => new java.net.Socket(host, port)
    }
    private val readThread = new Thread(() => {
      try {
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
        var line = reader.readLine()
        while (line != null) {
          if (line.nonEmpty) mem.synchronized { mem.addData(line) }
          line = reader.readLine()
        }
      } catch { case _: java.io.IOException => () }
    }, s"tcp-line-client-$host:$port")
    readThread.setDaemon(true)
    readThread.start()

    def df: DataFrame = mem.toDF().withColumnRenamed("value", "message")
    def stop(): Unit = try sock.close() catch { case _: Exception => () }
  }

  def tcp(spark: SparkSession, port: Int,
          framing: String = "newline_delimited",
          tls: Option[javax.net.ssl.SSLContext] = None,
          maxLength: Int = 102400): TcpLineServer =
    new TcpLineServer(spark, port, framing, tls, maxLength)

  def udp(spark: SparkSession, port: Int): UdpLineServer =
    new UdpLineServer(spark, port)

  def tcpClient(spark: SparkSession, host: String, port: Int,
                tls: Option[javax.net.ssl.SSLContext] = None): TcpLineClient =
    new TcpLineClient(spark, host, port, tls)
}
