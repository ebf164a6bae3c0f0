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

  /** google.protobuf.Timestamp submessage → RFC3339 string. */
  private def decodeProtoTimestamp(r: R): String = {
    var secs = 0L; var nanos = 0L
    fields(r) {
      case (1, 0) => secs = r.varint(); true
      case (2, 0) => nanos = r.varint(); true
      case _ => false
    }
    val inst = java.time.Instant.ofEpochSecond(secs, nanos)
    java.time.format.DateTimeFormatter.ISO_INSTANT.format(inst)
  }

  /** Metric message (event.proto `message Metric`: name=1 string,
    * timestamp=2, tags_v1=3 / tags_v2=20, kind=4 enum, value oneof
    * 5-17, namespace=11, interval_ms=18) → the native_json metric
    * object shape (`{"name":…,"kind":…,"counter":{"value":…},…}`).
    * This is the REAL schema walk — the name bytes are a plain string,
    * not a map entry (a real vector agent's metric would otherwise
    * fail to parse).
    */
  private def decodeMetric(mr: R): java.util.Map[String, Any] = {
    val out = new java.util.LinkedHashMap[String, Any]()
    val tags = new java.util.LinkedHashMap[String, Any]()
    def doubles1(r: R, no: Int): Double = {
      var v = 0.0
      fields(r) {
        case (`no`, 1) => v = java.lang.Double.longBitsToDouble(r.fixed(8)); true
        case _ => false
      }
      v
    }
    fields(mr) {
      case (1, 2) => out.put("name", new String(mr.sub().bytesAll(), "UTF-8")); true
      case (2, 2) => out.put("timestamp", decodeProtoTimestamp(mr.sub())); true
      case (3, 2) => // tags_v1: map<string, string>
        val er = mr.sub(); var k: String = null; var v: String = null
        fields(er) {
          case (1, 2) => k = new String(er.sub().bytesAll(), "UTF-8"); true
          case (2, 2) => v = new String(er.sub().bytesAll(), "UTF-8"); true
          case _ => false
        }
        if (k != null) tags.put(k, v); true
      case (20, 2) => // tags_v2: map<string, TagValues{repeated TagValue}>
        val er = mr.sub(); var k: String = null; var v: String = null
        fields(er) {
          case (1, 2) => k = new String(er.sub().bytesAll(), "UTF-8"); true
          case (2, 2) =>
            val tv = er.sub()
            fields(tv) {
              case (1, 2) => // TagValue { optional string value = 1 }
                val one = tv.sub()
                fields(one) {
                  case (1, 2) => v = new String(one.sub().bytesAll(), "UTF-8"); true
                  case _ => false
                }
                true
              case _ => false
            }
            true
          case _ => false
        }
        if (k != null) tags.put(k, v); true
      case (4, 0) =>
        out.put("kind",
          if (mr.varint() == 1L) "absolute" else "incremental"); true
      case (11, 2) =>
        out.put("namespace", new String(mr.sub().bytesAll(), "UTF-8")); true
      case (18, 0) =>
        out.put("interval_ms", java.lang.Long.valueOf(mr.varint())); true
      case (5, 2) => // Counter { double value = 1 }
        val m = new java.util.LinkedHashMap[String, Any]()
        m.put("value", java.lang.Double.valueOf(doubles1(mr.sub(), 1)))
        out.put("counter", m); true
      case (6, 2) => // Gauge { double value = 1 }
        val m = new java.util.LinkedHashMap[String, Any]()
        m.put("value", java.lang.Double.valueOf(doubles1(mr.sub(), 1)))
        out.put("gauge", m); true
      case (7, 2) => // Set { repeated string values = 1 }
        val sr = mr.sub()
        val vs = new java.util.ArrayList[Any]()
        fields(sr) {
          case (1, 2) => vs.add(new String(sr.sub().bytesAll(), "UTF-8")); true
          case _ => false
        }
        val m = new java.util.LinkedHashMap[String, Any]()
        m.put("values", vs); out.put("set", m); true
      case (12, 2) => // Distribution2 { samples=1, statistic=2 }
        val dr = mr.sub()
        val samples = new java.util.ArrayList[Any]()
        var stat = "histogram"
        fields(dr) {
          case (1, 2) =>
            val s = dr.sub(); var v = 0.0; var rate = 0L
            fields(s) {
              case (1, 1) => v = java.lang.Double.longBitsToDouble(s.fixed(8)); true
              case (2, 0) => rate = s.varint(); true
              case _ => false
            }
            val sm = new java.util.LinkedHashMap[String, Any]()
            sm.put("value", java.lang.Double.valueOf(v))
            sm.put("rate", java.lang.Long.valueOf(rate))
            samples.add(sm); true
          case (2, 0) =>
            stat = if (dr.varint() == 1L) "summary" else "histogram"; true
          case _ => false
        }
        val m = new java.util.LinkedHashMap[String, Any]()
        m.put("samples", samples); m.put("statistic", stat)
        out.put("distribution", m); true
      case (no, 2) if no == 13 || no == 16 =>
        // AggregatedHistogram2/3 { buckets=1{upper_limit=1,count=2},
        // count=2, sum=3 }
        val hr = mr.sub()
        val buckets = new java.util.ArrayList[Any]()
        var cnt = 0L; var sum = 0.0
        fields(hr) {
          case (1, 2) =>
            val b2 = hr.sub(); var ul = 0.0; var c = 0L
            fields(b2) {
              case (1, 1) => ul = java.lang.Double.longBitsToDouble(b2.fixed(8)); true
              case (2, 0) => c = b2.varint(); true
              case _ => false
            }
            val bm = new java.util.LinkedHashMap[String, Any]()
            bm.put("upper_limit", java.lang.Double.valueOf(ul))
            bm.put("count", java.lang.Long.valueOf(c))
            buckets.add(bm); true
          case (2, 0) => cnt = hr.varint(); true
          case (3, 1) => sum = java.lang.Double.longBitsToDouble(hr.fixed(8)); true
          case _ => false
        }
        val m = new java.util.LinkedHashMap[String, Any]()
        m.put("buckets", buckets)
        m.put("count", java.lang.Long.valueOf(cnt))
        m.put("sum", java.lang.Double.valueOf(sum))
        out.put("aggregated_histogram", m); true
      case (no, 2) if no == 14 || no == 17 =>
        // AggregatedSummary2/3 { quantiles=1{quantile=1,value=2},
        // count=2, sum=3 }
        val sr = mr.sub()
        val quantiles = new java.util.ArrayList[Any]()
        var cnt = 0L; var sum = 0.0
        fields(sr) {
          case (1, 2) =>
            val q2 = sr.sub(); var q = 0.0; var v = 0.0
            fields(q2) {
              case (1, 1) => q = java.lang.Double.longBitsToDouble(q2.fixed(8)); true
              case (2, 1) => v = java.lang.Double.longBitsToDouble(q2.fixed(8)); true
              case _ => false
            }
            val qm = new java.util.LinkedHashMap[String, Any]()
            qm.put("quantile", java.lang.Double.valueOf(q))
            qm.put("value", java.lang.Double.valueOf(v))
            quantiles.add(qm); true
          case (2, 0) => cnt = sr.varint(); true
          case (3, 1) => sum = java.lang.Double.longBitsToDouble(sr.fixed(8)); true
          case _ => false
        }
        val m = new java.util.LinkedHashMap[String, Any]()
        m.put("quantiles", quantiles)
        m.put("count", java.lang.Long.valueOf(cnt))
        m.put("sum", java.lang.Double.valueOf(sum))
        out.put("aggregated_summary", m); true
      case (15, 2) => // Sketch { AgentDDSketch agent_dd_sketch = 1 }
        val kr = mr.sub()
        fields(kr) {
          case (1, 2) =>
            val ar = kr.sub()
            val m = new java.util.LinkedHashMap[String, Any]()
            val ks = new java.util.ArrayList[Any]()
            val ns = new java.util.ArrayList[Any]()
            fields(ar) {
              case (1, 0) => m.put("count", java.lang.Long.valueOf(ar.varint())); true
              case (2, 1) => m.put("min", java.lang.Double.valueOf(
                java.lang.Double.longBitsToDouble(ar.fixed(8)))); true
              case (3, 1) => m.put("max", java.lang.Double.valueOf(
                java.lang.Double.longBitsToDouble(ar.fixed(8)))); true
              case (4, 1) => m.put("sum", java.lang.Double.valueOf(
                java.lang.Double.longBitsToDouble(ar.fixed(8)))); true
              case (5, 1) => m.put("avg", java.lang.Double.valueOf(
                java.lang.Double.longBitsToDouble(ar.fixed(8)))); true
              case (6, 2) => // packed sint32 k (zigzag)
                val pr = ar.sub()
                while (pr.hasMore) {
                  val z = pr.varint()
                  ks.add(java.lang.Long.valueOf((z >>> 1) ^ -(z & 1)))
                }
                true
              case (6, 0) =>
                val z = ar.varint()
                ks.add(java.lang.Long.valueOf((z >>> 1) ^ -(z & 1))); true
              case (7, 2) => // packed uint32 n
                val pr = ar.sub()
                while (pr.hasMore) ns.add(java.lang.Long.valueOf(pr.varint()))
                true
              case (7, 0) => ns.add(java.lang.Long.valueOf(ar.varint())); true
              case _ => false
            }
            m.put("k", ks); m.put("n", ns)
            val wrap = new java.util.LinkedHashMap[String, Any]()
            wrap.put("AgentDDSketch", m)
            out.put("sketch", wrap); true
          case _ => false
        }
        true
      case _ => false
    }
    if (!tags.isEmpty) out.put("tags", tags)
    out
  }

  /** EventWrapper bytes → (kind, fields-JSON); null on malformed. */
  def decodeWrapper(b: Array[Byte]): (String, String) = {
    var kind: String = null
    var json: String = null
    val r = new R(b, 0, b.length)
    fields(r) {
      case (2, 2) => // Metric arm: structured schema, not a fields map
        kind = "metric"
        json = JsonLite.render(decodeMetric(r.sub()))
        true
      case (no, 2) if no == 1 || no == 3 =>
        kind = if (no == 1) "log" else "trace"
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
