package graft.codecs

import java.io.{DataInputStream, OutputStream}

/** Minimal Apache Pulsar binary protocol (the published PulsarApi.proto
  * + framing spec) — the subset the `pulsar` source
  * (src/sources/pulsar.rs) and sink (src/sinks/pulsar/) exercise:
  * CONNECT/CONNECTED, PRODUCER/PRODUCER_SUCCESS, SEND/SEND_RECEIPT
  * (payload frames with crc32c + MessageMetadata), SUBSCRIBE/SUCCESS,
  * FLOW, MESSAGE delivery, PING/PONG.
  *
  * Simple frame: [totalSize u32][commandSize u32][BaseCommand].
  * Payload frame appends: [0x0e01][crc32c u32][metaSize u32]
  * [MessageMetadata][payload], checksum over everything after it.
  */
object Pulsar {

  // BaseCommand.Type enum values == their field numbers in BaseCommand
  val CONNECT = 2; val CONNECTED = 3; val SUBSCRIBE = 4; val PRODUCER = 5
  val SEND = 6; val SEND_RECEIPT = 7; val MESSAGE = 9; val ACK = 10
  val FLOW = 11; val SUCCESS = 12; val PRODUCER_SUCCESS = 17
  val PING = 18; val PONG = 19

  /** Imperative protobuf writer (wire format is public). */
  final class PW {
    private val bb = new java.io.ByteArrayOutputStream()
    def varint(v0: Long): PW = {
      var v = v0
      while ((v & ~0x7fL) != 0) { bb.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      bb.write(v.toInt); this
    }
    def field(no: Int, v: Long): PW = { varint((no << 3) | 0); varint(v) }
    def field(no: Int, s: String): PW = field(no, s.getBytes("UTF-8"))
    def field(no: Int, b: Array[Byte]): PW = {
      varint((no << 3) | 2); varint(b.length.toLong)
      bb.write(b, 0, b.length); this
    }
    def toBytes: Array[Byte] = bb.toByteArray
  }

  /** Imperative reader: walks top-level fields into a map
    * (last-wins; enough for command dispatch).
    */
  def fields(b: Array[Byte]): Map[Int, Any] = {
    var off = 0
    def varint(): Long = {
      var shift = 0; var v = 0L; var x = 0
      do {
        x = b(off) & 0xff; off += 1
        v |= (x & 0x7fL) << shift; shift += 7
      } while ((x & 0x80) != 0)
      v
    }
    var out = Map.empty[Int, Any]
    while (off < b.length) {
      val tag = varint(); val no = (tag >> 3).toInt; val wt = (tag & 7).toInt
      wt match {
        case 0 => out += no -> varint()
        case 2 =>
          val n = varint().toInt
          out += no -> java.util.Arrays.copyOfRange(b, off, off + n); off += n
        case 5 => off += 4
        case 1 => off += 8
        case other => throw new java.io.IOException(s"pulsar: wire type $other")
      }
    }
    out
  }

  def str(v: Any): String = new String(v.asInstanceOf[Array[Byte]], "UTF-8")
  def sub(v: Any): Map[Int, Any] = fields(v.asInstanceOf[Array[Byte]])

  def command(ctype: Int, body: Array[Byte]): Array[Byte] =
    new PW().field(1, ctype.toLong).field(ctype, body).toBytes

  def writeSimple(out: OutputStream, cmd: Array[Byte]): Unit = {
    val d = new java.io.DataOutputStream(out)
    d.writeInt(4 + cmd.length); d.writeInt(cmd.length); d.write(cmd)
  }

  def writePayload(out: OutputStream, cmd: Array[Byte],
                   metadata: Array[Byte], payload: Array[Byte]): Unit = {
    val checked = new java.io.ByteArrayOutputStream()
    val cd = new java.io.DataOutputStream(checked)
    cd.writeInt(metadata.length); cd.write(metadata); cd.write(payload)
    val crc = new java.util.zip.CRC32C()
    crc.update(checked.toByteArray)
    val d = new java.io.DataOutputStream(out)
    d.writeInt(4 + cmd.length + 2 + 4 + checked.size)
    d.writeInt(cmd.length); d.write(cmd)
    d.writeShort(0x0e01)
    d.writeInt(crc.getValue.toInt)
    d.write(checked.toByteArray)
  }

  final case class PFrame(cmd: Map[Int, Any], metadata: Option[Map[Int, Any]],
                          payload: Option[Array[Byte]]) {
    def ctype: Int = cmd(1).asInstanceOf[Long].toInt
  }

  def readFrame(in: DataInputStream): PFrame = {
    val total = in.readInt()
    val cmdSize = in.readInt()
    val cmdBytes = new Array[Byte](cmdSize); in.readFully(cmdBytes)
    val cmd = fields(cmdBytes)
    var rest = total - 4 - cmdSize
    if (rest <= 0) return PFrame(cmd, None, None)
    // payload frame: magic + checksum + metaSize + metadata + payload
    val magic = in.readUnsignedShort()
    require(magic == 0x0e01, f"pulsar: bad magic $magic%04x")
    in.readInt() // checksum (trusted on loopback)
    val metaSize = in.readInt()
    val meta = new Array[Byte](metaSize); in.readFully(meta)
    rest -= 2 + 4 + 4 + metaSize
    val payload = new Array[Byte](rest); in.readFully(payload)
    PFrame(cmd, Some(fields(meta)), Some(payload))
  }

  // ---- client handshake helpers ----

  def connect(in: DataInputStream, out: OutputStream): Unit = {
    writeSimple(out, command(CONNECT, new PW()
      .field(1, "graft").field(4, 21L).toBytes)) // client_version, proto v21
    out.flush()
    val f = readFrame(in)
    require(f.ctype == CONNECTED, s"pulsar: expected CONNECTED, got ${f.ctype}")
  }

  def messageMetadata(producerName: String, seq: Long,
                      publishTime: Long): Array[Byte] =
    new PW().field(1, producerName).field(2, seq).field(3, publishTime).toBytes
}
