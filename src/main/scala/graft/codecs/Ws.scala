package graft.codecs

import java.io.{DataInputStream, OutputStream}

/** Minimal RFC 6455 WebSocket framing + handshake — shared by the
  * `websocket` sink (client, reference src/sinks/websocket/),
  * `websocket_server` sink (src/sinks/websocket_server/) and the
  * `websocket` source (src/sources/websocket/).
  */
object Ws {

  val Guid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  final val OpText = 0x1
  final val OpBinary = 0x2
  final val OpClose = 0x8
  final val OpPing = 0x9
  final val OpPong = 0xa

  def acceptKeyOf(key: String): String =
    java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("SHA-1")
        .digest((key + Guid).getBytes("UTF-8")))

  /** Client side: send the HTTP upgrade and validate the 101 reply.
    * Returns after the handshake completes; throws on refusal.
    */
  def clientHandshake(sock: java.net.Socket, host: String, path: String): Unit = {
    val keyBytes = new Array[Byte](16)
    new java.security.SecureRandom().nextBytes(keyBytes)
    val key = java.util.Base64.getEncoder.encodeToString(keyBytes)
    val out = sock.getOutputStream
    out.write(
      (s"GET $path HTTP/1.1\r\n" +
        s"Host: $host\r\n" +
        "Upgrade: websocket\r\n" +
        "Connection: Upgrade\r\n" +
        s"Sec-WebSocket-Key: $key\r\n" +
        "Sec-WebSocket-Version: 13\r\n\r\n").getBytes("UTF-8"))
    out.flush()
    val in = sock.getInputStream
    val headers = readHttpHead(in)
    if (!headers.head.contains("101"))
      throw new java.io.IOException(s"ws: upgrade refused: ${headers.head}")
    val accept = headers.collectFirst {
      case h if h.toLowerCase.startsWith("sec-websocket-accept:") =>
        h.substring(h.indexOf(':') + 1).trim
    }
    if (!accept.contains(acceptKeyOf(key)))
      throw new java.io.IOException("ws: bad Sec-WebSocket-Accept")
  }

  /** Server side: read the upgrade request, reply 101. */
  def serverHandshake(sock: java.net.Socket): Unit = {
    val headers = readHttpHead(sock.getInputStream)
    val key = headers.collectFirst {
      case h if h.toLowerCase.startsWith("sec-websocket-key:") =>
        h.substring(h.indexOf(':') + 1).trim
    }.getOrElse(throw new java.io.IOException("ws: no Sec-WebSocket-Key"))
    val out = sock.getOutputStream
    out.write(
      ("HTTP/1.1 101 Switching Protocols\r\n" +
        "Upgrade: websocket\r\n" +
        "Connection: Upgrade\r\n" +
        s"Sec-WebSocket-Accept: ${acceptKeyOf(key)}\r\n\r\n").getBytes("UTF-8"))
    out.flush()
  }

  private def readHttpHead(in: java.io.InputStream): Seq[String] = {
    val lines = Vector.newBuilder[String]
    val sb = new StringBuilder
    var prev = 0
    var blank = false
    while (!blank) {
      val c = in.read()
      if (c < 0) throw new java.io.EOFException("ws: eof in handshake")
      if (c == '\n' && prev == '\r') {
        val line = sb.toString.dropRight(1)
        if (line.isEmpty) blank = true else lines += line
        sb.clear()
      } else sb.append(c.toChar)
      prev = c
    }
    lines.result()
  }

  /** Write one frame. Clients MUST mask (RFC 6455 §5.3); servers must
    * not.
    */
  def writeFrame(out: OutputStream, opcode: Int, payload: Array[Byte],
                 mask: Boolean): Unit = {
    out.write(0x80 | opcode) // FIN + opcode
    val maskBit = if (mask) 0x80 else 0
    if (payload.length <= 125) out.write(maskBit | payload.length)
    else if (payload.length <= 0xffff) {
      out.write(maskBit | 126)
      out.write(payload.length >> 8); out.write(payload.length & 0xff)
    } else {
      out.write(maskBit | 127)
      val bb = java.nio.ByteBuffer.allocate(8).putLong(payload.length.toLong)
      out.write(bb.array())
    }
    if (mask) {
      val key = new Array[Byte](4)
      new java.security.SecureRandom().nextBytes(key)
      out.write(key)
      val masked = new Array[Byte](payload.length)
      var i = 0
      while (i < payload.length) {
        masked(i) = (payload(i) ^ key(i % 4)).toByte; i += 1
      }
      out.write(masked)
    } else out.write(payload)
    out.flush()
  }

  /** Read one frame → (opcode, payload); unmasks when masked. */
  def readFrame(in: DataInputStream): (Int, Array[Byte]) = {
    val b0 = in.read()
    if (b0 < 0) throw new java.io.EOFException("ws: eof")
    val opcode = b0 & 0x0f
    val b1 = in.read()
    val masked = (b1 & 0x80) != 0
    val len7 = b1 & 0x7f
    val len =
      if (len7 == 126) in.readUnsignedShort().toLong
      else if (len7 == 127) in.readLong()
      else len7.toLong
    val key = if (masked) { val k = new Array[Byte](4); in.readFully(k); k }
      else null
    val payload = new Array[Byte](len.toInt)
    in.readFully(payload)
    if (masked) {
      var i = 0
      while (i < payload.length) {
        payload(i) = (payload(i) ^ key(i % 4)).toByte; i += 1
      }
    }
    (opcode, payload)
  }

  /** `ws://host:port/path` → (host, port, path). */
  def parseUri(uri: String): (String, Int, String) = {
    val u = new java.net.URI(uri)
    val port = if (u.getPort > 0) u.getPort
      else if (u.getScheme == "wss") 443 else 80
    val path = if (u.getPath == null || u.getPath.isEmpty) "/" else u.getPath
    (u.getHost, port, path)
  }
}
