package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** `dnstap` source (src/sources/dnstap/) and `mongodb_metrics` source
  * (src/sources/mongodb_metrics/).
  *
  * dnstap: hosts a frame-streams (fstrm) receiver — the bi-directional
  * handshake (READY → ACCEPT → START, STOP → FINISH control frames,
  * content-type `protobuf:dnstap.Dnstap`) over TCP; data frames are
  * dnstap protobufs decoded by the SAME column expression `parse_dnstap`
  * uses (functions/Vrl.parseDnstap: dnstap envelope + full RFC 1035 DNS
  * wire parse), so the source is one MemoryStream of binary + one
  * codegen'd projection.
  *
  * mongodb_metrics: runs `serverStatus` over the MongoDB wire protocol
  * (codecs/Bson.scala OP_MSG) on an interval and emits the reference's
  * metric names (asserts_total, connections, extra_info_*, opcounters_
  * total, memory, uptime_seconds…).
  */
object DnstapMongo {

  val ContentType = "protobuf:dnstap.Dnstap"

  // fstrm control frame types
  private val ACCEPT = 0x01; private val START = 0x02; private val STOP = 0x03
  private val READY = 0x04; private val FINISH = 0x05

  final class DnstapSource(spark: SparkSession, port: Int = 0) {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    private val mem = MemoryStream[Array[Byte]]
    private val server = new java.net.ServerSocket(port)
    @volatile private var running = true

    private def controlFrame(ctype: Int, contentType: Option[String]):
        Array[Byte] = {
      val body = new java.io.ByteArrayOutputStream()
      val d = new java.io.DataOutputStream(body)
      d.writeInt(ctype)
      contentType.foreach { ct =>
        d.writeInt(0x01) // FSTRM_CONTROL_FIELD_CONTENT_TYPE
        d.writeInt(ct.length)
        d.write(ct.getBytes("UTF-8"))
      }
      val out = new java.io.ByteArrayOutputStream()
      val od = new java.io.DataOutputStream(out)
      od.writeInt(0) // escape: control frame follows
      od.writeInt(body.size)
      body.writeTo(out)
      out.toByteArray
    }

    private val acceptThread = new Thread(() => {
      try while (running) {
        val sock = server.accept()
        val conn = new Thread(() => {
          val in = new java.io.DataInputStream(
            new java.io.BufferedInputStream(sock.getInputStream))
          val out = new java.io.BufferedOutputStream(sock.getOutputStream)
          try while (true) {
            val len = in.readInt()
            if (len == 0) { // control frame
              val clen = in.readInt()
              val cbody = new Array[Byte](clen); in.readFully(cbody)
              val ctype = java.nio.ByteBuffer.wrap(cbody).getInt
              ctype match {
                case READY =>
                  out.write(controlFrame(ACCEPT, Some(ContentType)))
                  out.flush()
                case STOP =>
                  out.write(controlFrame(FINISH, None)); out.flush()
                  throw new java.io.EOFException()
                case _ => () // START and others need no reply
              }
            } else {
              val data = new Array[Byte](len); in.readFully(data)
              mem.synchronized { mem.addData(data) }
            }
          } catch { case _: Exception => () }
          finally sock.close()
        })
        conn.setDaemon(true); conn.start()
      } catch { case _: Exception => () }
    }, "dnstap-server")
    acceptThread.setDaemon(true)
    acceptThread.start()

    def boundPort: Int = server.getLocalPort

    /** Raw frames + the parsed dnstap struct (null on malformed). */
    def df: DataFrame = {
      val d = mem.toDF()
      d.select(d("value").as("frame"),
        graft.functions.Vrl.parseDnstap(d("value")).as("dnstap"))
    }
    def stop(): Unit = { running = false; server.close() }
  }

  final class MongodbMetricsSource(spark: SparkSession, endpoint: String,
                                   namespace: String = "mongodb",
                                   intervalSecs: Int = 15)
      extends PollerSources.MetricPoller(spark, namespace, intervalSecs) {
    private val (host, port) = {
      val u = new java.net.URI(endpoint)
      (Option(u.getHost).getOrElse("127.0.0.1"),
        if (u.getPort > 0) u.getPort else 27017)
    }

    def scrapeOnce(): Int = {
      import graft.codecs.Bson
      val sock = new java.net.Socket(host, port)
      try {
        val out = new java.io.BufferedOutputStream(sock.getOutputStream)
        val in = new java.io.DataInputStream(
          new java.io.BufferedInputStream(sock.getInputStream))
        out.write(Bson.opMsg(1, Seq("serverStatus" -> 1, "$db" -> "admin")))
        out.flush()
        val status = Bson.readOpMsg(in)
        var n = 1
        emit("up", "gauge", 1.0)
        def num(m: java.util.Map[String, Any], k: String): Option[Double] =
          Option(m.get(k)).collect { case x: Number => x.doubleValue }
        def sub(m: java.util.Map[String, Any], k: String):
            Option[java.util.Map[String, Any]] =
          Option(m.get(k)).collect {
            case d: java.util.Map[_, _] =>
              d.asInstanceOf[java.util.Map[String, Any]] }
        num(status, "uptime").foreach { u =>
          emit("uptime_seconds", "counter", u); n += 1 }
        sub(status, "asserts").foreach { a =>
          a.forEach { (k, v) => v match {
            case x: Number =>
              emit("asserts_total", "counter", x.doubleValue,
                Map("type" -> k)); n += 1
            case _ => ()
          } }
        }
        sub(status, "connections").foreach { c =>
          c.forEach { (k, v) => v match {
            case x: Number =>
              emit("connections", "counter", x.doubleValue,
                Map("state" -> k)); n += 1
            case _ => ()
          } }
        }
        sub(status, "opcounters").foreach { o =>
          o.forEach { (k, v) => v match {
            case x: Number =>
              emit("opcounters_total", "counter", x.doubleValue,
                Map("type" -> k)); n += 1
            case _ => ()
          } }
        }
        sub(status, "mem").foreach { m =>
          num(m, "resident").foreach { x =>
            emit("memory", "gauge", x, Map("type" -> "resident")); n += 1 }
          num(m, "virtual").foreach { x =>
            emit("memory", "gauge", x, Map("type" -> "virtual")); n += 1 }
        }
        n
      } catch {
        case e: Exception => emit("up", "gauge", 0.0); throw e
      } finally sock.close()
    }
  }

  def dnstap(spark: SparkSession, port: Int = 0): DnstapSource =
    new DnstapSource(spark, port)
  def mongodbMetrics(spark: SparkSession, endpoint: String,
                     intervalSecs: Int = 15): MongodbMetricsSource =
    new MongodbMetricsSource(spark, endpoint, intervalSecs = intervalSecs)
}
