package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.codecs.Resp

/** Queue-consumer sources: `redis` (src/sources/redis/ — BLPOP/BRPOP a
  * list or SUBSCRIBE a channel) and `nats` (src/sources/nats/ — SUB
  * with an optional queue group). Driver-side consumer connection
  * feeding a MemoryStream, like the reference's single consumer; the
  * queue itself provides the fan-out across instances (redis lists and
  * NATS queue groups both load-balance competing consumers).
  */
object QueueSources {

  final class RedisSource(spark: SparkSession, url: String, key: String,
                          dataType: String = "list",
                          method: String = "blpop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    private val mem = MemoryStream[String]
    @volatile private var running = true
    private val (host, port) = Resp.hostPort(url)

    private val thread = new Thread(() => {
      while (running) {
        try {
          val sock = new java.net.Socket(host, port)
          val out = new java.io.BufferedOutputStream(sock.getOutputStream)
          val in = new java.io.DataInputStream(
            new java.io.BufferedInputStream(sock.getInputStream))
          try {
            if (dataType == "channel") {
              Resp.writeCommand(out, Seq("SUBSCRIBE", key)); out.flush()
              while (running) Resp.readReply(in) match {
                // push frame: ["message", channel, payload]
                case Resp.ArrayReply(Vector(Resp.BulkString("message"), _,
                    Resp.BulkString(payload))) => mem.addData(payload)
                case _ => () // subscribe ack etc.
              }
            } else {
              val cmd = if (method == "brpop") "BRPOP" else "BLPOP"
              while (running) {
                Resp.writeCommand(out, Seq(cmd, key, "1")); out.flush()
                Resp.readReply(in) match {
                  // [key, value] on success; nil on timeout
                  case Resp.ArrayReply(Vector(_, Resp.BulkString(v))) =>
                    mem.addData(v)
                  case _ => ()
                }
              }
            }
          } finally sock.close()
        } catch {
          case _: Exception => if (running) Thread.sleep(200) // reconnect
        }
      }
    }, s"redis-source-$key")
    thread.setDaemon(true)
    thread.start()

    def df: DataFrame = mem.toDF().withColumnRenamed("value", "message")
    def stop(): Unit = running = false
  }

  final class NatsSource(spark: SparkSession, url: String, subject: String,
                         queue: Option[String] = None) {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    private val mem = MemoryStream[(String, String)]
    @volatile private var running = true
    private val (host, port) = {
      val u = new java.net.URI(url)
      (Option(u.getHost).getOrElse("127.0.0.1"),
        if (u.getPort > 0) u.getPort else 4222)
    }

    private val thread = new Thread(() => {
      while (running) {
        try {
          val sock = new java.net.Socket(host, port)
          val out = new java.io.BufferedOutputStream(sock.getOutputStream)
          val in = new java.io.DataInputStream(
            new java.io.BufferedInputStream(sock.getInputStream))
          def line(): String = {
            val sb = new StringBuilder
            var c = in.read()
            while (c != '\r') {
              if (c < 0) throw new java.io.EOFException("nats: eof")
              sb.append(c.toChar); c = in.read()
            }
            in.read(); sb.toString
          }
          try {
            val greeting = line()
            if (!greeting.startsWith("INFO"))
              throw new java.io.IOException(s"nats: bad greeting: $greeting")
            out.write("CONNECT {\"verbose\":false}\r\n".getBytes("UTF-8"))
            val sub = queue match {
              case Some(q) => s"SUB $subject $q 1\r\n"
              case None => s"SUB $subject 1\r\n"
            }
            out.write(sub.getBytes("UTF-8")); out.flush()
            while (running) {
              val l = line()
              if (l.startsWith("MSG")) {
                // MSG <subject> <sid> [reply-to] <#bytes>
                val parts = l.split(" ")
                val n = parts.last.toInt
                val payload = new Array[Byte](n); in.readFully(payload)
                in.read(); in.read() // CRLF
                mem.addData((parts(1), new String(payload, "UTF-8")))
              } else if (l == "PING") {
                out.write("PONG\r\n".getBytes("UTF-8")); out.flush()
              }
            }
          } finally sock.close()
        } catch {
          case _: Exception => if (running) Thread.sleep(200) // reconnect
        }
      }
    }, s"nats-source-$subject")
    thread.setDaemon(true)
    thread.start()

    def df: DataFrame = {
      val d = mem.toDF()
      d.select(d("_1").as("subject"), d("_2").as("message"))
    }
    def stop(): Unit = running = false
  }

  def redis(spark: SparkSession, url: String, key: String,
            dataType: String = "list", method: String = "blpop"): RedisSource =
    new RedisSource(spark, url, key, dataType, method)
  def nats(spark: SparkSession, url: String, subject: String,
           queue: Option[String] = None): NatsSource =
    new NatsSource(spark, url, subject, queue)
}
