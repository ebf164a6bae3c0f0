package graft.codecs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.JsonLite

/** Vector's `native` codec — the protobuf event format
  * (lib/vector-core/proto/event.proto: EventWrapper{ oneof log=1 /
  * metric=2 / trace=3 }, Log.fields = map<string, Value>, Value = oneof
  * raw_bytes=1 / timestamp=2 / integer=4 / float=5 / boolean=6 / map=7 /
  * array=8 / null=9). The Value tree is recursive, so this is a
  * dedicated walker (the ProtoSchema machinery is for non-recursive
  * descriptors); events bridge through JSON text, the engine's
  * heterogeneous-value representation.
  *
  * Documented representation choices: timestamps render as RFC3339
  * strings on decode and re-encode as raw_bytes (the JSON bridge has no
  * separate timestamp type); metric/trace wrappers decode their field
  * map the same way logs do, with `__event_kind` carrying which arm was
  * set.
  */
object NativeCodec {

  // ---- wire helpers (same primitives as ProtobufCodec, local so the
  // recursive walker stays self-contained) ------------------------------

  private final class R(b: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var out = 0L; var x = 0
      do {
        if (pos >= end) throw new RuntimeException("truncated varint")
        x = b(pos) & 0xFF; pos += 1
        out |= (x & 0x7FL) << shift; shift += 7
      } while ((x & 0x80) != 0 && shift < 70)
      out
    }
    def bytes(n: Int): Array[Byte] = {
      if (n < 0 || pos + n > end) throw new RuntimeException("truncated bytes")
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n)
      pos += n
      out
    }
    def sub(): R = {
      val n = varint().toInt
      if (n < 0 || pos + n > end) throw new RuntimeException("truncated len")
      val r = new R(b, pos, pos + n); pos += n; r
    }
    def fixed(n: Int): Long = {
      val raw = bytes(n)
      var v = 0L; var i = n - 1
      while (i >= 0) { v = (v << 8) | (raw(i) & 0xFFL); i -= 1 }
      v
    }
    def skip(wt: Int): Unit = wt match {
      case 0 => varint()
      case 1 => bytes(8)
      case 2 => bytes(varint().toInt)
      case 5 => bytes(4)
      case o => throw new RuntimeException(s"bad wire type $o")
    }
  }

  private def fields(r: R)(f: (Int, Int) => Boolean): Unit =
    while (r.hasMore) {
      val tag = r.varint()
      val no = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      if (!f(no, wt)) r.skip(wt)
    }

  // ---- decode ---------------------------------------------------------

  private def decodeValue(r: R): Any = {
    var out: Any = null
    fields(r) {
      // raw_bytes → string (binary-transparent boundary)
      case (1, 2) => out = new String(r.sub().bytesAll(), "UTF-8"); true
      case (2, 2) => // google.protobuf.Timestamp {seconds=1, nanos=2}
        val tr = r.sub()
        var secs = 0L; var nanos = 0L
        fields(tr) {
          case (1, 0) => secs = tr.varint(); true
          case (2, 0) => nanos = tr.varint(); true
          case _ => false
        }
        out = java.time.format.DateTimeFormatter.ISO_INSTANT.format(
          java.time.Instant.ofEpochSecond(secs, nanos)); true
      case (4, 0) => out = java.lang.Long.valueOf(r.varint()); true
      case (5, 1) => out = java.lang.Double.valueOf(
        java.lang.Double.longBitsToDouble(r.fixed(8))); true
      case (6, 0) => out = java.lang.Boolean.valueOf(r.varint() != 0); true
      case (7, 2) => out = decodeValueMap(r.sub()); true
      case (8, 2) => // ValueArray{ repeated Value items = 1 }
        val items = new java.util.ArrayList[Any]()
        val ar = r.sub()
        fields(ar) {
          case (1, 2) => items.add(decodeValue(ar.sub())); true
          case _ => false
        }
        out = items; true
      case (9, 0) => r.varint(); out = null; true
      case _ => false
    }
    out
  }

  private def decodeValueMap(r: R): java.util.LinkedHashMap[String, Any] = {
    val out = new java.util.LinkedHashMap[String, Any]()
    fields(r) {
      case (1, 2) => // map entry {key=1, value=2}
        val er = r.sub()
        var k: String = null
        var v: Any = null
        fields(er) {
          case (1, 2) => k = new String(er.sub().bytesAll(), "UTF-8"); true
          case (2, 2) => v = decodeValue(er.sub()); true
          case _ => false
        }
        if (k != null) out.put(k, v)
        true
      case _ => false
    }
    out
  }

  private implicit class RAll(r: R) {
    def bytesAll(): Array[Byte] = r.bytes(r.end - r.pos)
  }

  /** EventWrapper bytes → (kind, fields-JSON); null on malformed. */
  def decodeWrapper(b: Array[Byte]): (String, String) = {
    var kind: String = null
    var json: String = null
    val r = new R(b, 0, b.length)
    fields(r) {
      case (no, 2) if no >= 1 && no <= 3 =>
        kind = no match { case 1 => "log"; case 2 => "metric"; case _ => "trace" }
        val lr = r.sub()
        // Log/Trace: fields map at 1, whole-event Value at 2
        var m: Any = null
        fields(lr) {
          case (1, 2) => // map<string, Value> entry
            if (m == null) m = new java.util.LinkedHashMap[String, Any]()
            val er = lr.sub()
            var k: String = null; var v: Any = null
            fields(er) {
              case (1, 2) => k = new String(er.sub().bytesAll(), "UTF-8"); true
              case (2, 2) => v = decodeValue(er.sub()); true
              case _ => false
            }
            if (k != null)
              m.asInstanceOf[java.util.Map[String, Any]].put(k, v)
            true
          case (2, 2) => m = decodeValue(lr.sub()); true
          case _ => false
        }
        json = JsonLite.render(
          if (m == null) new java.util.LinkedHashMap[String, Any]() else m)
        true
      case _ => false
    }
    if (kind == null) null else (kind, json)
  }

  // ---- encode ---------------------------------------------------------

  private def vint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def ld(out: java.io.ByteArrayOutputStream, no: Int,
                 payload: Array[Byte]): Unit = {
    vint(out, (no.toLong << 3) | 2)
    vint(out, payload.length.toLong)
    out.write(payload)
  }

  private def encodeValue(v: Any): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    v match {
      case null => vint(out, (9L << 3) | 0); vint(out, 0L)
      case s: String => ld(out, 1, s.getBytes("UTF-8"))
      case b: java.lang.Boolean =>
        vint(out, (6L << 3) | 0); vint(out, if (b) 1L else 0L)
      case n: java.lang.Long =>
        vint(out, (4L << 3) | 0)
        // negative int64 varints are 10 bytes (two's complement)
        var x = n.longValue()
        var i = 0
        while ((x & ~0x7FL) != 0 && i < 9) {
          out.write(((x & 0x7F) | 0x80).toInt); x >>>= 7; i += 1 }
        out.write(x.toInt)
      case d: java.lang.Double =>
        vint(out, (5L << 3) | 1)
        var x = java.lang.Double.doubleToLongBits(d)
        (0 until 8).foreach { _ => out.write((x & 0xFF).toInt); x >>>= 8 }
      case m: java.util.Map[_, _] =>
        val inner = new java.io.ByteArrayOutputStream()
        m.asInstanceOf[java.util.Map[String, Any]].forEach { (k, x) =>
          val e = new java.io.ByteArrayOutputStream()
          ld(e, 1, k.getBytes("UTF-8"))
          ld(e, 2, encodeValue(x))
          ld(inner, 1, e.toByteArray)
        }
        ld(out, 7, inner.toByteArray)
      case l: java.util.List[_] =>
        val inner = new java.io.ByteArrayOutputStream()
        l.forEach(x => ld(inner, 1, encodeValue(x)))
        ld(out, 8, inner.toByteArray)
      case other => ld(out, 1, other.toString.getBytes("UTF-8"))
    }
    out.toByteArray
  }

  /** fields-JSON (an object) → EventWrapper{log} bytes. */
  def encodeWrapper(json: String): Array[Byte] = {
    val m = JsonLite.parse(json).asInstanceOf[java.util.Map[String, Any]]
    val log = new java.io.ByteArrayOutputStream()
    m.forEach { (k, v) =>
      val e = new java.io.ByteArrayOutputStream()
      ld(e, 1, k.getBytes("UTF-8"))
      ld(e, 2, encodeValue(v))
      ld(log, 1, e.toByteArray)
    }
    val out = new java.io.ByteArrayOutputStream()
    ld(out, 1, log.toByteArray)
    out.toByteArray
  }

  // ---- Column surface -------------------------------------------------

  /** binary EventWrapper → struct(kind, fields-json); null on garbage. */
  def decode(data: Column): Column = {
    val st = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("kind",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("json",
        org.apache.spark.sql.types.StringType)))
    udf(new org.apache.spark.sql.api.java.UDF1[Array[Byte],
        org.apache.spark.sql.Row] {
      override def call(b: Array[Byte]): org.apache.spark.sql.Row =
        if (b == null) null
        else try decodeWrapper(b) match {
          case null => null
          case (k, j) => org.apache.spark.sql.Row(k, j)
        } catch { case _: Exception => null }
    }, st).apply(data)
  }

  /** JSON event text → binary EventWrapper{log}. */
  def encode(json: Column): Column = {
    val f = udf { (s: String) =>
      if (s == null) null
      else try encodeWrapper(s) catch { case _: Exception => null }
    }
    f(json)
  }
}
