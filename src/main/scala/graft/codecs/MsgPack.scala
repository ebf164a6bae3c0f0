package graft.codecs

import java.io.{DataInputStream, DataOutputStream, EOFException}

/** Minimal MessagePack reader/writer (the published msgpack.org spec) —
  * the wire format of fluentd's forward protocol (reference
  * src/sources/fluent/, which decodes with the rmpv crate). Self-
  * contained on purpose: no msgpack jar ships with Spark, and the
  * format is ~20 marker families.
  */
object MsgPack {

  sealed trait Value
  case object MpNil extends Value
  final case class MpBool(v: Boolean) extends Value
  final case class MpLong(v: Long) extends Value
  final case class MpDouble(v: Double) extends Value
  final case class MpString(v: String) extends Value
  final case class MpBytes(v: Array[Byte]) extends Value
  final case class MpArray(v: Vector[Value]) extends Value
  final case class MpMap(v: Vector[(Value, Value)]) extends Value
  final case class MpExt(tpe: Byte, data: Array[Byte]) extends Value

  /** Read one value; throws EOFException cleanly at stream end (the
    * server loop's stop signal).
    */
  def read(in: DataInputStream): Value = {
    val b = in.read()
    if (b < 0) throw new EOFException("msgpack: end of stream")
    val m = b & 0xff
    m match {
      case x if x <= 0x7f => MpLong(x) // positive fixint
      case x if x >= 0xe0 => MpLong(x.toByte.toLong) // negative fixint
      case x if (x & 0xf0) == 0x80 => readMap(in, x & 0x0f)
      case x if (x & 0xf0) == 0x90 => readArray(in, x & 0x0f)
      case x if (x & 0xe0) == 0xa0 => readStr(in, x & 0x1f)
      case 0xc0 => MpNil
      case 0xc2 => MpBool(false)
      case 0xc3 => MpBool(true)
      case 0xc4 => MpBytes(readN(in, in.readUnsignedByte()))
      case 0xc5 => MpBytes(readN(in, in.readUnsignedShort()))
      case 0xc6 => MpBytes(readN(in, in.readInt()))
      case 0xc7 => val n = in.readUnsignedByte(); MpExt(in.readByte(), readN(in, n))
      case 0xc8 => val n = in.readUnsignedShort(); MpExt(in.readByte(), readN(in, n))
      case 0xc9 => val n = in.readInt(); MpExt(in.readByte(), readN(in, n))
      case 0xca => MpDouble(in.readFloat().toDouble)
      case 0xcb => MpDouble(in.readDouble())
      case 0xcc => MpLong(in.readUnsignedByte().toLong)
      case 0xcd => MpLong(in.readUnsignedShort().toLong)
      case 0xce => MpLong(in.readInt().toLong & 0xffffffffL)
      case 0xcf => MpLong(in.readLong()) // u64 (wraps; fluent times fit)
      case 0xd0 => MpLong(in.readByte().toLong)
      case 0xd1 => MpLong(in.readShort().toLong)
      case 0xd2 => MpLong(in.readInt().toLong)
      case 0xd3 => MpLong(in.readLong())
      case 0xd4 => MpExt(in.readByte(), readN(in, 1))
      case 0xd5 => MpExt(in.readByte(), readN(in, 2))
      case 0xd6 => MpExt(in.readByte(), readN(in, 4))
      case 0xd7 => MpExt(in.readByte(), readN(in, 8))
      case 0xd8 => MpExt(in.readByte(), readN(in, 16))
      case 0xd9 => readStr(in, in.readUnsignedByte())
      case 0xda => readStr(in, in.readUnsignedShort())
      case 0xdb => readStr(in, in.readInt())
      case 0xdc => readArray(in, in.readUnsignedShort())
      case 0xdd => readArray(in, in.readInt())
      case 0xde => readMap(in, in.readUnsignedShort())
      case 0xdf => readMap(in, in.readInt())
      case other =>
        throw new java.io.IOException(f"msgpack: bad marker 0x$other%02x")
    }
  }

  private def readN(in: DataInputStream, n: Int): Array[Byte] = {
    val a = new Array[Byte](n); in.readFully(a); a
  }
  private def readStr(in: DataInputStream, n: Int): MpString =
    MpString(new String(readN(in, n), "UTF-8"))
  private def readArray(in: DataInputStream, n: Int): MpArray =
    MpArray(Vector.fill(n)(read(in)))
  private def readMap(in: DataInputStream, n: Int): MpMap =
    MpMap(Vector.fill(n)((read(in), read(in))))

  def write(out: DataOutputStream, v: Value): Unit = v match {
    case MpNil => out.write(0xc0)
    case MpBool(b) => out.write(if (b) 0xc3 else 0xc2)
    case MpLong(x) =>
      if (x >= 0 && x <= 0x7f) out.write(x.toInt)
      else if (x < 0 && x >= -32) out.write(0xe0 | (x.toInt & 0x1f))
      else if (x >= Byte.MinValue && x <= Byte.MaxValue) { out.write(0xd0); out.writeByte(x.toInt) }
      else if (x >= Short.MinValue && x <= Short.MaxValue) { out.write(0xd1); out.writeShort(x.toInt) }
      else if (x >= Int.MinValue && x <= Int.MaxValue) { out.write(0xd2); out.writeInt(x.toInt) }
      else { out.write(0xd3); out.writeLong(x) }
    case MpDouble(d) => out.write(0xcb); out.writeDouble(d)
    case MpString(s) =>
      val b = s.getBytes("UTF-8")
      if (b.length <= 31) out.write(0xa0 | b.length)
      else if (b.length <= 0xff) { out.write(0xd9); out.writeByte(b.length) }
      else if (b.length <= 0xffff) { out.write(0xda); out.writeShort(b.length) }
      else { out.write(0xdb); out.writeInt(b.length) }
      out.write(b)
    case MpBytes(b) =>
      if (b.length <= 0xff) { out.write(0xc4); out.writeByte(b.length) }
      else if (b.length <= 0xffff) { out.write(0xc5); out.writeShort(b.length) }
      else { out.write(0xc6); out.writeInt(b.length) }
      out.write(b)
    case MpArray(xs) =>
      if (xs.length <= 15) out.write(0x90 | xs.length)
      else if (xs.length <= 0xffff) { out.write(0xdc); out.writeShort(xs.length) }
      else { out.write(0xdd); out.writeInt(xs.length) }
      xs.foreach(write(out, _))
    case MpMap(kvs) =>
      if (kvs.length <= 15) out.write(0x80 | kvs.length)
      else if (kvs.length <= 0xffff) { out.write(0xde); out.writeShort(kvs.length) }
      else { out.write(0xdf); out.writeInt(kvs.length) }
      kvs.foreach { case (k, v2) => write(out, k); write(out, v2) }
    case MpExt(t, d) =>
      d.length match {
        case 1 => out.write(0xd4)
        case 2 => out.write(0xd5)
        case 4 => out.write(0xd6)
        case 8 => out.write(0xd7)
        case 16 => out.write(0xd8)
        case n if n <= 0xff => out.write(0xc7); out.writeByte(n)
        case n if n <= 0xffff => out.write(0xc8); out.writeShort(n)
        case n => out.write(0xc9); out.writeInt(n)
      }
      out.writeByte(t.toInt)
      out.write(d)
  }

  def toBytes(v: Value): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    write(new DataOutputStream(bos), v)
    bos.toByteArray
  }

  /** Render a value as JSON text (records → the engine's JSON event
    * line). Bytes render as latin-1-preserved strings (fluentd records
    * are maps of strings in practice); ext values render as
    * `{"__ext":type,"data":"hex"}` like the reference surfaces unknown
    * extensions (src/sources/fluent/message.rs:194
    * `msgpack_extension_code`).
    */
  def toJson(v: Value): String = v match {
    case MpNil => "null"
    case MpBool(b) => b.toString
    case MpLong(x) => x.toString
    case MpDouble(d) =>
      if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15)
        d.toLong.toString + ".0"
      else d.toString
    case MpString(s) => jsonString(s)
    case MpBytes(b) => jsonString(new String(b, "ISO-8859-1"))
    case MpArray(xs) => xs.map(toJson).mkString("[", ",", "]")
    case MpMap(kvs) => kvs.map { case (k, v2) =>
      val key = k match {
        case MpString(s) => jsonString(s)
        case other => jsonString(toJson(other))
      }
      key + ":" + toJson(v2)
    }.mkString("{", ",", "}")
    case MpExt(t, d) =>
      s"""{"__ext":$t,"data":"${d.map(b => f"$b%02x").mkString}"}"""
  }

  private def jsonString(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }
}
