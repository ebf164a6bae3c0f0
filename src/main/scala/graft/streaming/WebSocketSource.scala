package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.codecs.Ws

/** `websocket` source (reference src/sources/websocket/): a CLIENT that
  * connects out to `uri`, optionally sends an initial subscription
  * message, answers protocol pings, and streams received text frames as
  * events. Reconnects on drop (the reference's backoff loop).
  */
final class WebSocketSource(spark: SparkSession, uri: String,
                            initialMessage: Option[String] = None) {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  private val mem = MemoryStream[String]
  @volatile private var running = true

  private val thread = new Thread(() => {
    while (running) {
      try {
        val (host, port, path) = Ws.parseUri(uri)
        val sock = new java.net.Socket(host, port)
        try {
          Ws.clientHandshake(sock, s"$host:$port", path)
          val out = new java.io.BufferedOutputStream(sock.getOutputStream)
          val in = new java.io.DataInputStream(
            new java.io.BufferedInputStream(sock.getInputStream))
          initialMessage.foreach(m =>
            Ws.writeFrame(out, Ws.OpText, m.getBytes("UTF-8"), mask = true))
          var open = true
          while (running && open) {
            val (opcode, payload) = Ws.readFrame(in)
            opcode match {
              case Ws.OpText | Ws.OpBinary =>
                mem.addData(new String(payload, "UTF-8"))
              case Ws.OpPing =>
                Ws.writeFrame(out, Ws.OpPong, payload, mask = true)
              case Ws.OpClose => open = false
              case _ => ()
            }
          }
        } finally sock.close()
      } catch {
        case _: Exception => if (running) Thread.sleep(200) // reconnect
      }
    }
  }, s"ws-source-$uri")
  thread.setDaemon(true)
  thread.start()

  def df: DataFrame = mem.toDF().withColumnRenamed("value", "message")
  def stop(): Unit = running = false
}

object WebSocketSource {
  def apply(spark: SparkSession, uri: String,
            initialMessage: Option[String] = None): WebSocketSource =
    new WebSocketSource(spark, uri, initialMessage)
}
