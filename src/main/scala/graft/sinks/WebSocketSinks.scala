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
      // A single bound server socket makes a driver funnel inherent to
      // this sink, but materializing the whole batch is not:
      // toLocalIterator streams one partition at a time, so driver
      // memory stays bounded by the largest partition (not the batch)
      // when a large topology drains through a debug websocket.
      val rows = df.select(LineCodec.encode(df, codec).as("__line"))
        .toLocalIterator()
      while (rows.hasNext) {
        val l = rows.next().getString(0)
        if (l != null) {
          val bytes = l.getBytes("UTF-8")
          val it = clients.iterator()
          while (it.hasNext) {
            val sock = it.next()
            try Ws.writeFrame(sock.getOutputStream, Ws.OpText, bytes,
              mask = false)
            catch {
              case _: Exception => try sock.close() finally it.remove()
            }
          }
        }
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
