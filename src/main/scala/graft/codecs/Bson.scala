package graft.codecs

/** Minimal BSON codec (the published bsonspec.org format) + MongoDB
  * OP_MSG framing — enough for the `mongodb_metrics` source
  * (src/sources/mongodb_metrics/) to run `serverStatus` against a
  * server: doc encode/decode for double/string/document/array/bool/
  * int32/int64/null, little-endian wire header with opCode 2013.
  */
object Bson {

  def encodeDoc(doc: Seq[(String, Any)]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    doc.foreach { case (k, v) => writeElement(body, k, v) }
    val out = new java.io.ByteArrayOutputStream()
    val total = 4 + body.size + 1
    writeI32(out, total)
    body.writeTo(out)
    out.write(0)
    out.toByteArray
  }

  private def writeI32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
    o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
  }

  private def writeI64(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    writeI32(o, (v & 0xffffffffL).toInt); writeI32(o, (v >>> 32).toInt)
  }

  private def writeElement(o: java.io.ByteArrayOutputStream, k: String,
                           v: Any): Unit = {
    def key(): Unit = { o.write(k.getBytes("UTF-8")); o.write(0) }
    v match {
      case d: Double =>
        o.write(0x01); key(); writeI64(o, java.lang.Double.doubleToLongBits(d))
      case s: String =>
        o.write(0x02); key()
        val b = s.getBytes("UTF-8")
        writeI32(o, b.length + 1); o.write(b); o.write(0)
      case m: Seq[(String, Any)] @unchecked =>
        o.write(0x03); key()
        val b = encodeDoc(m); o.write(b, 0, b.length)
      case b: Boolean =>
        o.write(0x08); key(); o.write(if (b) 1 else 0)
      case i: Int => o.write(0x10); key(); writeI32(o, i)
      case l: Long => o.write(0x12); key(); writeI64(o, l)
      case null => o.write(0x0a); key()
      case other =>
        throw new IllegalArgumentException(s"bson encode: $other")
    }
  }

  /** Decode into a LinkedHashMap tree (ints/longs as Long, doubles as
    * Double, docs as maps, arrays as lists).
    */
  def decodeDoc(b: Array[Byte], off0: Int = 0): java.util.LinkedHashMap[String, Any] = {
    val bb = java.nio.ByteBuffer.wrap(b)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.position(off0)
    readDoc(bb)
  }

  private def readDoc(bb: java.nio.ByteBuffer): java.util.LinkedHashMap[String, Any] = {
    val out = new java.util.LinkedHashMap[String, Any]()
    val start = bb.position()
    val len = bb.getInt
    while (bb.position() < start + len - 1) {
      val t = bb.get() & 0xff
      val ksb = new StringBuilder
      var c = bb.get()
      while (c != 0) { ksb.append(c.toChar); c = bb.get() }
      val k = ksb.toString
      val v: Any = t match {
        case 0x01 => java.lang.Double.longBitsToDouble(bb.getLong)
        case 0x02 =>
          val n = bb.getInt
          val s = new Array[Byte](n - 1); bb.get(s); bb.get()
          new String(s, "UTF-8")
        case 0x03 => readDoc(bb)
        case 0x04 =>
          val doc = readDoc(bb)
          val list = new java.util.ArrayList[Any](doc.size())
          doc.values().forEach(x => list.add(x))
          list
        case 0x08 => bb.get() != 0
        case 0x09 => bb.getLong // UTC datetime millis
        case 0x0a => null
        case 0x10 => bb.getInt.toLong
        case 0x11 | 0x12 => bb.getLong
        case other =>
          throw new java.io.IOException(f"bson: unsupported type 0x$other%02x")
      }
      out.put(k, v)
    }
    bb.get() // trailing 0
    out
  }

  // ---- OP_MSG (MongoDB wire protocol, opCode 2013) ----

  def opMsg(requestId: Int, doc: Seq[(String, Any)]): Array[Byte] = {
    val body = encodeDoc(doc)
    val out = new java.io.ByteArrayOutputStream()
    writeI32(out, 16 + 4 + 1 + body.length) // header + flags + kind + doc
    writeI32(out, requestId)
    writeI32(out, 0) // responseTo
    writeI32(out, 2013) // OP_MSG
    writeI32(out, 0) // flagBits
    out.write(0) // section kind 0: body
    out.write(body)
    out.toByteArray
  }

  /** Read one OP_MSG reply → its body document. */
  def readOpMsg(in: java.io.DataInputStream): java.util.LinkedHashMap[String, Any] = {
    val hdr = new Array[Byte](16); in.readFully(hdr)
    val bb = java.nio.ByteBuffer.wrap(hdr)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val len = bb.getInt
    bb.getInt; bb.getInt
    val op = bb.getInt
    require(op == 2013, s"mongo: expected OP_MSG, got $op")
    val body = new Array[Byte](len - 16); in.readFully(body)
    // skip flagBits (4) + section kind (1)
    decodeDoc(body, 5)
  }
}
