package graft.codecs

import java.io.{DataInputStream, OutputStream}

/** Minimal MQTT 3.1.1 packet codec (OASIS spec, public) — enough of the
  * wire protocol for the `mqtt` source (src/sources/mqtt/) and sink
  * (src/sinks/mqtt/): CONNECT/CONNACK, PUBLISH (+PUBACK at QoS 1),
  * SUBSCRIBE/SUBACK, PINGREQ/PINGRESP, DISCONNECT. The reference uses
  * the rumqttc client; here the packets are assembled directly.
  */
object Mqtt {

  // Packet types (spec §2.2.1), as the high nibble of the first byte.
  val CONNECT = 1; val CONNACK = 2; val PUBLISH = 3; val PUBACK = 4
  val SUBSCRIBE = 8; val SUBACK = 9; val PINGREQ = 12; val PINGRESP = 13
  val DISCONNECT = 14

  final case class Packet(typeAndFlags: Int, body: Array[Byte]) {
    def ptype: Int = (typeAndFlags >> 4) & 0x0f
    def flags: Int = typeAndFlags & 0x0f
  }

  /** Remaining-length varint (spec §2.2.3: 7 bits per byte, LSB first). */
  private def writeVarint(out: OutputStream, n0: Int): Unit = {
    var n = n0
    do {
      var b = n % 128; n /= 128
      if (n > 0) b |= 0x80
      out.write(b)
    } while (n > 0)
  }

  private def readVarint(in: DataInputStream): Int = {
    var mult = 1; var value = 0; var b = 0
    do {
      b = in.readUnsignedByte()
      value += (b & 0x7f) * mult
      mult *= 128
      if (mult > 128 * 128 * 128 * 128)
        throw new java.io.IOException("mqtt: malformed remaining length")
    } while ((b & 0x80) != 0)
    value
  }

  def writePacket(out: OutputStream, typeAndFlags: Int,
                  body: Array[Byte]): Unit = {
    out.write(typeAndFlags)
    writeVarint(out, body.length)
    out.write(body)
  }

  def readPacket(in: DataInputStream): Packet = {
    val tf = in.readUnsignedByte()
    val len = readVarint(in)
    val body = new Array[Byte](len)
    in.readFully(body)
    Packet(tf, body)
  }

  /** UTF-8 string with u16 big-endian length prefix (spec §1.5.3). */
  def str(s: String): Array[Byte] = {
    val b = s.getBytes("UTF-8")
    val out = new Array[Byte](b.length + 2)
    out(0) = ((b.length >> 8) & 0xff).toByte
    out(1) = (b.length & 0xff).toByte
    System.arraycopy(b, 0, out, 2, b.length)
    out
  }

  def u16(n: Int): Array[Byte] =
    Array(((n >> 8) & 0xff).toByte, (n & 0xff).toByte)

  def connect(clientId: String, user: Option[String] = None,
              password: Option[String] = None, keepAlive: Int = 60,
              cleanSession: Boolean = true): Array[Byte] = {
    var flags = 0
    if (cleanSession) flags |= 0x02
    if (user.isDefined) flags |= 0x80
    if (password.isDefined) flags |= 0x40
    val bb = new java.io.ByteArrayOutputStream()
    bb.write(str("MQTT")); bb.write(4) // protocol level 4 = 3.1.1
    bb.write(flags); bb.write(u16(keepAlive))
    bb.write(str(clientId))
    user.foreach(u => bb.write(str(u)))
    password.foreach(p => bb.write(str(p)))
    bb.toByteArray
  }

  def publish(topic: String, payload: Array[Byte], qos: Int = 0,
              retain: Boolean = false, packetId: Int = 0):
      (Int, Array[Byte]) = {
    val bb = new java.io.ByteArrayOutputStream()
    bb.write(str(topic))
    if (qos > 0) bb.write(u16(packetId))
    bb.write(payload)
    val tf = (PUBLISH << 4) | (qos << 1) | (if (retain) 1 else 0)
    (tf, bb.toByteArray)
  }

  def subscribe(packetId: Int, topics: Seq[(String, Int)]): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    bb.write(u16(packetId))
    topics.foreach { case (t, qos) => bb.write(str(t)); bb.write(qos) }
    bb.toByteArray
  }

  /** Parse a PUBLISH body given its fixed-header flags →
    * (topic, packetId (0 when QoS 0), payload).
    */
  def parsePublish(p: Packet): (String, Int, Array[Byte]) = {
    require(p.ptype == PUBLISH, s"not a PUBLISH: ${p.ptype}")
    val qos = (p.flags >> 1) & 0x03
    val b = p.body
    val tlen = ((b(0) & 0xff) << 8) | (b(1) & 0xff)
    val topic = new String(b, 2, tlen, "UTF-8")
    var off = 2 + tlen
    var pid = 0
    if (qos > 0) { pid = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff); off += 2 }
    (topic, pid, java.util.Arrays.copyOfRange(b, off, b.length))
  }

  /** CONNECT body → (clientId, cleanSession). */
  def parseConnect(p: Packet): (String, Boolean) = {
    val b = p.body
    val nameLen = ((b(0) & 0xff) << 8) | (b(1) & 0xff)
    var off = 2 + nameLen + 1 // proto name + level
    val flags = b(off) & 0xff; off += 1 + 2 // flags + keepalive
    val idLen = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
    (new String(b, off + 2, idLen, "UTF-8"), (flags & 0x02) != 0)
  }

  /** SUBSCRIBE body → (packetId, topic filters). */
  def parseSubscribe(p: Packet): (Int, Seq[String]) = {
    val b = p.body
    val pid = ((b(0) & 0xff) << 8) | (b(1) & 0xff)
    var off = 2
    val topics = scala.collection.mutable.ArrayBuffer[String]()
    while (off < b.length) {
      val tlen = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
      topics += new String(b, off + 2, tlen, "UTF-8")
      off += 2 + tlen + 1 // + requested qos byte
    }
    (pid, topics.toSeq)
  }

  /** Expect CONNACK with return code 0 right after sending CONNECT. */
  def expectConnack(in: DataInputStream): Unit = {
    val p = readPacket(in)
    if (p.ptype != CONNACK)
      throw new java.io.IOException(s"mqtt: expected CONNACK, got ${p.ptype}")
    if (p.body(1) != 0)
      throw new java.io.IOException(s"mqtt: connection refused rc=${p.body(1)}")
  }

  /** Topic-filter match with + and # wildcards (spec §4.7). */
  def topicMatches(filter: String, topic: String): Boolean = {
    val f = filter.split("/", -1); val t = topic.split("/", -1)
    var i = 0
    while (i < f.length) {
      if (f(i) == "#") return true
      if (i >= t.length) return false
      if (f(i) != "+" && f(i) != t(i)) return false
      i += 1
    }
    f.length == t.length
  }
}
