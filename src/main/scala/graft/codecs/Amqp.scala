package graft.codecs

import java.io.{DataInputStream, OutputStream}

/** Minimal AMQP 0.9.1 wire codec (the published OASIS/RabbitMQ spec) —
  * the subset the `amqp` source (src/sources/amqp.rs) and sink
  * (src/sinks/amqp/) exercise: connection handshake (Start/Tune/Open
  * with PLAIN auth), channel open, queue declare, Basic.Publish with
  * content header+body frames, Basic.Consume/Deliver.
  *
  * Framing: type(1) channel(2) size(4) payload frame-end(0xCE);
  * method payloads are class-id(2) method-id(2) + typed arguments.
  */
object Amqp {

  val FrameMethod = 1; val FrameHeader = 2; val FrameBody = 3
  val FrameHeartbeat = 8
  val FrameEnd = 0xce

  // class ids
  val ClassConnection = 10; val ClassChannel = 20; val ClassQueue = 50
  val ClassBasic = 60

  final case class Frame(ftype: Int, channel: Int, payload: Array[Byte])

  final case class Method(classId: Int, methodId: Int, args: Array[Byte])

  val ProtocolHeader: Array[Byte] =
    Array('A', 'M', 'Q', 'P', 0, 0, 9, 1).map(_.toByte)

  def writeFrame(out: OutputStream, f: Frame): Unit = {
    out.write(f.ftype)
    out.write((f.channel >> 8) & 0xff); out.write(f.channel & 0xff)
    val n = f.payload.length
    out.write((n >> 24) & 0xff); out.write((n >> 16) & 0xff)
    out.write((n >> 8) & 0xff); out.write(n & 0xff)
    out.write(f.payload)
    out.write(FrameEnd)
  }

  def readFrame(in: DataInputStream): Frame = {
    val t = in.readUnsignedByte()
    val ch = in.readUnsignedShort()
    val n = in.readInt()
    val payload = new Array[Byte](n)
    in.readFully(payload)
    if (in.readUnsignedByte() != FrameEnd)
      throw new java.io.IOException("amqp: missing frame-end octet")
    Frame(t, ch, payload)
  }

  def method(f: Frame): Method = {
    val b = f.payload
    Method(((b(0) & 0xff) << 8) | (b(1) & 0xff),
      ((b(2) & 0xff) << 8) | (b(3) & 0xff),
      java.util.Arrays.copyOfRange(b, 4, b.length))
  }

  /** Argument writer for method/header payloads. */
  final class W {
    private val bb = new java.io.ByteArrayOutputStream()
    def u8(n: Int): W = { bb.write(n & 0xff); this }
    def u16(n: Int): W = { bb.write((n >> 8) & 0xff); bb.write(n & 0xff); this }
    def u32(n: Long): W = {
      bb.write(((n >> 24) & 0xff).toInt); bb.write(((n >> 16) & 0xff).toInt)
      bb.write(((n >> 8) & 0xff).toInt); bb.write((n & 0xff).toInt); this
    }
    def u64(n: Long): W = { u32(n >>> 32); u32(n & 0xffffffffL); this }
    def shortstr(s: String): W = {
      val b = s.getBytes("UTF-8")
      require(b.length < 256, "amqp shortstr too long")
      bb.write(b.length); bb.write(b); this
    }
    def longstr(b: Array[Byte]): W = { u32(b.length.toLong); bb.write(b); this }
    def longstr(s: String): W = longstr(s.getBytes("UTF-8"))
    def emptyTable(): W = u32(0L)
    def bytes(b: Array[Byte]): W = { bb.write(b); this }
    def toBytes: Array[Byte] = bb.toByteArray
  }

  /** Argument reader. */
  final class R(b: Array[Byte]) {
    private var off = 0
    def u8(): Int = { val v = b(off) & 0xff; off += 1; v }
    def u16(): Int = { (u8() << 8) | u8() }
    def u32(): Long = { (u16().toLong << 16) | u16().toLong }
    def u64(): Long = { (u32() << 32) | u32() }
    def shortstr(): String = {
      val n = u8(); val s = new String(b, off, n, "UTF-8"); off += n; s
    }
    def longstr(): Array[Byte] = {
      val n = u32().toInt
      val out = java.util.Arrays.copyOfRange(b, off, off + n); off += n; out
    }
    def skipTable(): Unit = { val n = u32().toInt; off += n }
    def remaining(): Array[Byte] = java.util.Arrays.copyOfRange(b, off, b.length)
  }

  def methodFrame(channel: Int, classId: Int, methodId: Int,
                  args: Array[Byte]): Frame =
    Frame(FrameMethod, channel,
      new W().u16(classId).u16(methodId).bytes(args).toBytes)

  // ---- connection-level client handshake ----

  /** Run the client side of the connection handshake on a fresh socket:
    * protocol header → Start/Start-Ok (PLAIN) → Tune/Tune-Ok →
    * Open/Open-Ok. Returns the negotiated frame-max.
    */
  def clientHandshake(in: DataInputStream, out: OutputStream,
                      user: String = "guest", pass: String = "guest",
                      vhost: String = "/"): Int = {
    out.write(ProtocolHeader); out.flush()
    val start = method(readFrame(in))
    require(start.classId == ClassConnection && start.methodId == 10,
      s"amqp: expected Connection.Start, got ${start.classId}.${start.methodId}")
    // SASL PLAIN response: NUL authcid NUL passwd (RFC 4616)
    val plain = ("\u0000" + user + "\u0000" + pass).getBytes("UTF-8")
    writeFrame(out, methodFrame(0, ClassConnection, 11, new W()
      .emptyTable() // client-properties
      .shortstr("PLAIN").longstr(plain).shortstr("en_US").toBytes))
    out.flush()
    val tune = method(readFrame(in))
    require(tune.classId == ClassConnection && tune.methodId == 30,
      "amqp: expected Connection.Tune")
    val r = new R(tune.args)
    val chMax = r.u16(); val frameMax0 = r.u32()
    val frameMax = if (frameMax0 == 0) 131072 else frameMax0.toInt
    writeFrame(out, methodFrame(0, ClassConnection, 31, new W()
      .u16(chMax).u32(frameMax.toLong).u16(0).toBytes)) // heartbeat 0
    writeFrame(out, methodFrame(0, ClassConnection, 40, new W()
      .shortstr(vhost).shortstr("").u8(0).toBytes))
    out.flush()
    val openOk = method(readFrame(in))
    require(openOk.classId == ClassConnection && openOk.methodId == 41,
      "amqp: expected Connection.Open-Ok")
    frameMax
  }

  def channelOpen(in: DataInputStream, out: OutputStream, ch: Int): Unit = {
    writeFrame(out, methodFrame(ch, ClassChannel, 10, new W()
      .shortstr("").toBytes))
    out.flush()
    val ok = method(readFrame(in))
    require(ok.classId == ClassChannel && ok.methodId == 11,
      "amqp: expected Channel.Open-Ok")
  }

  def queueDeclare(in: DataInputStream, out: OutputStream, ch: Int,
                   queue: String): Unit = {
    writeFrame(out, methodFrame(ch, ClassQueue, 10, new W()
      .u16(0).shortstr(queue).u8(0).emptyTable().toBytes))
    out.flush()
    val ok = method(readFrame(in))
    require(ok.classId == ClassQueue && ok.methodId == 11,
      "amqp: expected Queue.Declare-Ok")
  }

  /** Basic.Publish + content header + body frames (split at frameMax). */
  def publish(out: OutputStream, ch: Int, exchange: String,
              routingKey: String, body: Array[Byte],
              frameMax: Int = 131072): Unit = {
    writeFrame(out, methodFrame(ch, ClassBasic, 40, new W()
      .u16(0).shortstr(exchange).shortstr(routingKey).u8(0).toBytes))
    writeFrame(out, Frame(FrameHeader, ch, new W()
      .u16(ClassBasic).u16(0).u64(body.length.toLong).u16(0).toBytes))
    val chunk = frameMax - 8
    var off = 0
    while (off < body.length || (body.length == 0 && off == 0)) {
      val n = math.min(chunk, body.length - off)
      if (n > 0)
        writeFrame(out, Frame(FrameBody, ch,
          java.util.Arrays.copyOfRange(body, off, off + n)))
      off += math.max(n, 1)
    }
  }

  def consume(in: DataInputStream, out: OutputStream, ch: Int,
              queue: String, consumerTag: String): Unit = {
    writeFrame(out, methodFrame(ch, ClassBasic, 20, new W()
      .u16(0).shortstr(queue).shortstr(consumerTag)
      .u8(0x02) // no-ack
      .emptyTable().toBytes))
    out.flush()
    val ok = method(readFrame(in))
    require(ok.classId == ClassBasic && ok.methodId == 21,
      "amqp: expected Basic.Consume-Ok")
  }

  final case class Delivery(exchange: String, routingKey: String,
                            deliveryTag: Long, body: Array[Byte])

  /** Read one Basic.Deliver + its content header and body frames.
    * Returns None for heartbeats / other methods.
    */
  def readDelivery(in: DataInputStream): Option[Delivery] = {
    val f = readFrame(in)
    if (f.ftype != FrameMethod) return None
    val m = method(f)
    if (m.classId != ClassBasic || m.methodId != 60) return None
    val r = new R(m.args)
    r.shortstr() // consumer-tag
    val tag = r.u64()
    r.u8() // redelivered
    val exchange = r.shortstr(); val rk = r.shortstr()
    val hdr = readFrame(in)
    require(hdr.ftype == FrameHeader, "amqp: expected content header")
    val hr = new R(hdr.payload)
    hr.u16(); hr.u16() // class, weight
    val size = hr.u64()
    val body = new java.io.ByteArrayOutputStream()
    while (body.size < size) {
      val bf = readFrame(in)
      require(bf.ftype == FrameBody, "amqp: expected content body")
      body.write(bf.payload)
    }
    Some(Delivery(exchange, rk, tag, body.toByteArray))
  }
}
