package graft.sinks

import org.apache.spark.sql.DataFrame

import graft.codecs.Ws

/** `websocket` sink (client — reference src/sinks/websocket/: connect
  * to `uri`, stream each event as a text frame) and `websocket_server`
  * sink (src/sinks/websocket_server/: host an endpoint, broadcast every
  * event to all connected clients).
  *
  * The client sink fans out like the socket sink: each task opens its
  * own connection and pushes its partition. The server sink is a
  * driver-side broadcaster (the reference's is likewise one listener).
  */
object WebSocketSinks {

  def writeWebSocket(df: DataFrame, uri: String, codec: String = "json"): Unit = {
    val lines = df.select(LineCodec.encode(df, codec).as("__line"))
    val u = uri
    lines.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val (host, port, path) = Ws.parseUri(u)
      val sock = new java.net.Socket(host, port)
      try {
        Ws.clientHandshake(sock, s"$host:$port", path)
        val out = new java.io.BufferedOutputStream(sock.getOutputStream)
        rows.foreach { r =>
          val s = r.getString(0)
          if (s != null)
            Ws.writeFrame(out, Ws.OpText, s.getBytes("UTF-8"), mask = true)
        }
        Ws.writeFrame(out, Ws.OpClose, Array.emptyByteArray, mask = true)
      } finally sock.close()
    }
  }

  /** The hosted endpoint: clients connect and receive every event
    * written through `broadcast`. One instance per configured sink,
    * shared across micro-batches.
    */
  final class WebSocketServer(port: Int) {
    private val server = new java.net.ServerSocket(port)
    private val clients =
      java.util.Collections.synchronizedList(
        new java.util.ArrayList[java.net.Socket]())
    @volatile private var running = true

    private val acceptThread = new Thread(() => {
      try while (running) {
        val sock = server.accept()
        try {
          Ws.serverHandshake(sock)
          clients.add(sock)
        } catch { case _: Exception => sock.close() }
      } catch { case _: Exception => () }
    }, "ws-server-accept")
    acceptThread.setDaemon(true)
    acceptThread.start()

    def boundPort: Int = server.getLocalPort
    def clientCount: Int = clients.size()

    /** Broadcast one batch's encoded lines to every connected client;
      * dead connections drop out (the reference's buffering/lagging
      * client policy reduces to drop-on-error here).
      */
    def broadcast(df: DataFrame, codec: String): Unit = {
      val lines = df.select(LineCodec.encode(df, codec).as("__line"))
        .collect().map(_.getString(0)).filter(_ != null)
      val it = clients.iterator()
      while (it.hasNext) {
        val sock = it.next()
        try {
          val out = sock.getOutputStream
          lines.foreach(l =>
            Ws.writeFrame(out, Ws.OpText, l.getBytes("UTF-8"), mask = false))
        } catch { case _: Exception => try sock.close() finally it.remove() }
      }
    }

    def stop(): Unit = {
      running = false
      server.close()
      clients.forEach(s => try s.close() catch { case _: Exception => () })
      clients.clear()
    }
  }
}
