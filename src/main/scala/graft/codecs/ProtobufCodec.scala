package graft.codecs

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.api.java.UDF1
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._

/** Protocol-buffers wire-format codec, hand-written against the public
  * proto3 encoding spec (no protobuf-java on this classpath).
  *
  * Reference: lib/codecs/src/decoding/format/protobuf.rs and
  * encoding/format/protobuf.rs decode/encode single messages against a
  * compiled descriptor; here the descriptor is a [[ProtoSchema]] — field
  * number → (name, type) — and the wire walker is implemented directly:
  * varint, zigzag, fixed64/32, and length-delimited records with
  * unknown-field skipping.
  *
  * [[Otlp]] carries the OpenTelemetry LogRecord subset
  * (lib/opentelemetry-proto/src/proto/.../logs/v1/logs.proto — field
  * numbers follow the published .proto).
  */
object ProtobufCodec {

  sealed trait PType
  case object PVarint extends PType // int32/int64/uint/bool/enum
  case object PSint extends PType // zigzag sint32/sint64
  case object PDouble extends PType // fixed64 double
  case object PFixed64 extends PType // fixed64 integral
  case object PFloat extends PType // fixed32 float
  case object PFixed32 extends PType // fixed32 unsigned integral
  case object PSfixed32 extends PType // fixed32 signed integral
  case object PString extends PType
  case object PBytes extends PType
  final case class PMessage(schema: ProtoSchema) extends PType
  /** `repeated T` — unpacked wire encoding (one tagged record per
    * element, the proto3 layout for length-delimited element types).
    */
  final case class PRepeated(elem: PType) extends PType

  final case class ProtoField(no: Int, name: String, ptype: PType)
  final case class ProtoSchema(fields: Seq[ProtoField]) {
    private def dataType(t: PType): DataType = t match {
      case PVarint | PSint | PFixed64 | PFixed32 | PSfixed32 => LongType
      case PDouble => DoubleType
      case PFloat => FloatType
      case PString => StringType
      case PBytes => BinaryType
      case PMessage(s) => s.sparkType
      case PRepeated(e) => ArrayType(dataType(e))
    }
    // cached: decodeRecord builds one Row per message per payload, and a
    // per-call StructType/Map rebuild dominated the row-UDF decode paths
    @transient lazy val sparkType: StructType = StructType(fields.map { f =>
      StructField(f.name, dataType(f.ptype))
    })
    @transient private[codecs] lazy val fieldArr: Array[ProtoField] =
      fields.toArray
    // field number -> slot in `fields` (-1 = unknown); dense array when
    // numbers are small (every schema here), Map fallback otherwise
    @transient private[codecs] lazy val slotByNo: Array[Int] = {
      val maxNo = fields.foldLeft(0)((m, f) => math.max(m, f.no))
      if (maxNo <= 1024) {
        val a = Array.fill(maxNo + 1)(-1)
        fields.zipWithIndex.foreach { case (f, i) => a(f.no) = i }
        a
      } else null
    }
    @transient private[codecs] lazy val slotByNoMap: Map[Int, Int] =
      fields.zipWithIndex.map { case (f, i) => f.no -> i }.toMap
    private[codecs] def slotOf(no: Int): Int = {
      val a = slotByNo
      if (a != null) { if (no >= 0 && no < a.length) a(no) else -1 }
      else slotByNoMap.getOrElse(no, -1)
    }
  }

  private[codecs] def wireType(t: PType): Int = t match {
    case PVarint | PSint => 0
    case PDouble | PFixed64 => 1
    case PFloat | PFixed32 | PSfixed32 => 5
    case PString | PBytes | _: PMessage => 2
    case PRepeated(e) => wireType(e)
  }

  // ---- primitives -----------------------------------------------------

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private[codecs] def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private[codecs] final class Reader(bytes: Array[Byte]) {
    var pos = 0
    def hasMore: Boolean = pos < bytes.length
    def readVarint(): Long = {
      var shift = 0; var result = 0L; var b = 0
      do {
        if (pos >= bytes.length) throw new RuntimeException("truncated varint")
        b = bytes(pos) & 0xFF; pos += 1
        result |= (b & 0x7FL) << shift; shift += 7
      } while ((b & 0x80) != 0 && shift < 70)
      result
    }
    def readFixed32(): Int = {
      if (pos + 4 > bytes.length) throw new RuntimeException("truncated fixed32")
      var v = 0
      var i = 3
      while (i >= 0) { v = (v << 8) | (bytes(pos + i) & 0xFF); i -= 1 }
      pos += 4
      v
    }
    def readFixed64(): Long = {
      if (pos + 8 > bytes.length) throw new RuntimeException("truncated fixed64")
      var v = 0L
      var i = 7
      while (i >= 0) { v = (v << 8) | (bytes(pos + i) & 0xFFL); i -= 1 }
      pos += 8
      v
    }
    def readBytes(n: Int): Array[Byte] = {
      if (n < 0 || pos + n > bytes.length) throw new RuntimeException("truncated bytes")
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
      out
    }
    def skip(wt: Int): Unit = wt match {
      case 0 => readVarint()
      case 1 => readBytes(8)
      case 2 => readBytes(readVarint().toInt)
      case 5 => readBytes(4)
      case other => throw new RuntimeException(s"bad wire type $other")
    }
  }

  // ---- encode / decode ------------------------------------------------

  private def encodeRecord(schema: ProtoSchema, r: Row): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def writeValue(no: Int, t: PType, v: Any): Unit = {
      writeVarint(out, (no.toLong << 3) | wireType(t))
      t match {
        case PVarint => writeVarint(out, v.asInstanceOf[Long])
        case PSint => writeVarint(out, zigzag(v.asInstanceOf[Long]))
        case PFixed64 =>
          var x = v.asInstanceOf[Long]
          (0 until 8).foreach { _ => out.write((x & 0xFF).toInt); x >>>= 8 }
        case PDouble =>
          var x = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
          (0 until 8).foreach { _ => out.write((x & 0xFF).toInt); x >>>= 8 }
        case PFloat =>
          var x = java.lang.Float.floatToIntBits(v match {
            case f: Float => f
            case d: Double => d.toFloat
            case other => other.asInstanceOf[Number].floatValue
          })
          (0 until 4).foreach { _ => out.write(x & 0xFF); x >>>= 8 }
        case PFixed32 | PSfixed32 =>
          var x = v.asInstanceOf[Long].toInt
          (0 until 4).foreach { _ => out.write(x & 0xFF); x >>>= 8 }
        case PString =>
          val b = v.asInstanceOf[String].getBytes("UTF-8")
          writeVarint(out, b.length.toLong); out.write(b)
        case PBytes =>
          val b = v.asInstanceOf[Array[Byte]]
          writeVarint(out, b.length.toLong); out.write(b)
        case PMessage(inner) =>
          val b = encodeRecord(inner, v.asInstanceOf[Row])
          writeVarint(out, b.length.toLong); out.write(b)
        case PRepeated(_) =>
          throw new IllegalStateException("nested repeated unsupported")
      }
    }
    schema.fields.foreach { f =>
      val idx = r.fieldIndex(f.name)
      if (!r.isNullAt(idx)) f.ptype match {
        case PRepeated(elem) =>
          r.getSeq[Any](idx).foreach(v => writeValue(f.no, elem, v))
        case t => writeValue(f.no, t, r.get(idx))
      }
    }
    out.toByteArray
  }

  // ---- compiled descriptor sets ---------------------------------------

  /** Build the ProtoSchema for `messageType` from a compiled
    * FileDescriptorSet (`protoc --descriptor_set_out`) — the reference's
    * `desc_file` + `message_type` decoder config
    * (lib/codecs/src/decoding/format/protobuf.rs). The descriptor file
    * is itself protobuf; this walks it with the same Reader using the
    * published descriptor.proto field numbers:
    * FileDescriptorSet.file=1; FileDescriptorProto{package=2,
    * message_type=4}; DescriptorProto{name=1, field=2, nested_type=3};
    * FieldDescriptorProto{name=1, number=3, label=4, type=5,
    * type_name=6}.
    */
  def fromDescriptorSet(bytes: Array[Byte], messageType: String): ProtoSchema = {
    final case class RawField(name: String, number: Int, label: Int,
                              tpe: Int, typeName: String)
    final case class RawMsg(name: String, fields: Seq[RawField],
                            nested: Seq[RawMsg])

    def walk(b: Array[Byte]): Seq[(Int, Int, Any)] = {
      val r = new Reader(b)
      val out = Seq.newBuilder[(Int, Int, Any)]
      while (r.hasMore) {
        val tag = r.readVarint()
        val no = (tag >>> 3).toInt
        val wt = (tag & 7).toInt
        val v: Any = wt match {
          case 0 => r.readVarint()
          case 1 => r.readFixed64()
          case 2 => r.readBytes(r.readVarint().toInt)
          case 5 => r.readBytes(4)
          case other => throw new RuntimeException(s"bad wire type $other")
        }
        out += ((no, wt, v))
      }
      out.result()
    }
    def str(v: Any): String = new String(v.asInstanceOf[Array[Byte]], "UTF-8")

    def parseField(b: Array[Byte]): RawField = {
      var (name, number, label, tpe, tn) = ("", 0, 1, 0, "")
      walk(b).foreach {
        case (1, 2, v) => name = str(v)
        case (3, 0, v) => number = v.asInstanceOf[Long].toInt
        case (4, 0, v) => label = v.asInstanceOf[Long].toInt
        case (5, 0, v) => tpe = v.asInstanceOf[Long].toInt
        case (6, 2, v) => tn = str(v)
        case _ => ()
      }
      RawField(name, number, label, tpe, tn)
    }
    def parseMsg(b: Array[Byte]): RawMsg = {
      var name = ""
      val fs = Seq.newBuilder[RawField]
      val ns = Seq.newBuilder[RawMsg]
      walk(b).foreach {
        case (1, 2, v) => name = str(v)
        case (2, 2, v) => fs += parseField(v.asInstanceOf[Array[Byte]])
        case (3, 2, v) => ns += parseMsg(v.asInstanceOf[Array[Byte]])
        case _ => ()
      }
      RawMsg(name, fs.result(), ns.result())
    }

    // index every message under its fully-qualified ".pkg.Outer.Nested"
    val byFqn = scala.collection.mutable.Map[String, RawMsg]()
    walk(bytes).foreach {
      case (1, 2, fileB) =>
        var pkg = ""
        val msgs = Seq.newBuilder[RawMsg]
        walk(fileB.asInstanceOf[Array[Byte]]).foreach {
          case (2, 2, v) => pkg = str(v)
          case (4, 2, v) => msgs += parseMsg(v.asInstanceOf[Array[Byte]])
          case _ => ()
        }
        def index(prefix: String, m: RawMsg): Unit = {
          val fqn = s"$prefix.${m.name}"
          byFqn(fqn) = m
          m.nested.foreach(index(fqn, _))
        }
        msgs.result().foreach(index(if (pkg.isEmpty) "" else s".$pkg", _))
      case _ => ()
    }

    def schemaOf(m: RawMsg, seen: Set[String]): ProtoSchema =
      ProtoSchema(m.fields.map { f =>
        val base: PType = f.tpe match {
          case 1 => PDouble
          case 2 => PFloat
          case 3 | 4 | 5 | 8 | 13 | 14 => PVarint // int64/uint64/int32/bool/uint32/enum
          case 6 | 16 => PFixed64                 // fixed64/sfixed64
          case 7 => PFixed32
          case 15 => PSfixed32
          case 9 => PString
          case 12 => PBytes
          case 17 | 18 => PSint                   // sint32/sint64
          case 11 =>
            val target = byFqn.getOrElse(f.typeName, throw new IllegalArgumentException(
              s"descriptor: unresolved message type ${f.typeName}"))
            if (seen(f.typeName)) throw new IllegalArgumentException(
              s"descriptor: recursive message type ${f.typeName} unsupported")
            PMessage(schemaOf(target, seen + f.typeName))
          case other => throw new IllegalArgumentException(
            s"descriptor: unsupported field type $other for ${f.name}")
        }
        ProtoField(f.number, f.name,
          if (f.label == 3) PRepeated(base) else base)
      })

    val fqn = if (messageType.startsWith(".")) messageType else s".$messageType"
    val root = byFqn.getOrElse(fqn, throw new IllegalArgumentException(
      s"descriptor: message type $messageType not found " +
        s"(known: ${byFqn.keys.toSeq.sorted.mkString(", ")})"))
    schemaOf(root, Set(fqn))
  }

  private def decodeRecord(schema: ProtoSchema, bytes: Array[Byte]): Row = {
    // per-slot accumulators (slot = index in schema.fields): plain arrays —
    // the old per-call Map[Int, _] builds dominated decode-heavy UDFs
    val fieldArr = schema.fieldArr
    val n = fieldArr.length
    val values = new Array[Any](n) // singular scalars
    val repeated = new Array[scala.collection.mutable.ListBuffer[Any]](n)
    // proto3 merge semantics for a singular MESSAGE field seen more
    // than once: the instances MERGE (repeated subfields concatenate).
    // Merging serialized protos = concatenating their bytes, so buffer
    // the bytes and decode once at the end.
    val msgBytes = new Array[java.io.ByteArrayOutputStream](n)
    val rd = new Reader(bytes)
    def readValue(t: PType): Any = t match {
      case PVarint => rd.readVarint()
      case PSint => unzigzag(rd.readVarint())
      case PFixed64 => rd.readFixed64()
      case PDouble => java.lang.Double.longBitsToDouble(rd.readFixed64())
      case PFloat => java.lang.Float.intBitsToFloat(rd.readFixed32())
      case PFixed32 => rd.readFixed32() & 0xFFFFFFFFL
      case PSfixed32 => rd.readFixed32().toLong
      case PString => new String(rd.readBytes(rd.readVarint().toInt),
        java.nio.charset.StandardCharsets.UTF_8)
      case PBytes => rd.readBytes(rd.readVarint().toInt)
      case PMessage(inner) =>
        decodeRecord(inner, rd.readBytes(rd.readVarint().toInt))
      case PRepeated(_) =>
        throw new IllegalStateException("nested repeated unsupported")
    }
    while (rd.hasMore) {
      val tag = rd.readVarint()
      val no = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      val slot = schema.slotOf(no)
      val f = if (slot >= 0) fieldArr(slot) else null
      if (f != null && wireType(f.ptype) == wt) {
        f.ptype match {
          case PRepeated(elem) =>
            if (repeated(slot) == null)
              repeated(slot) = scala.collection.mutable.ListBuffer.empty
            repeated(slot) += readValue(elem)
          case PMessage(_) =>
            if (msgBytes(slot) == null)
              msgBytes(slot) = new java.io.ByteArrayOutputStream()
            msgBytes(slot).write(rd.readBytes(rd.readVarint().toInt))
          case t => values(slot) = readValue(t)
        }
      } else f match {
        // PACKED repeated scalars (proto3 default for numeric repeated
        // fields): one length-delimited blob of back-to-back values
        case ProtoField(_, _, PRepeated(elem))
            if wt == 2 && wireType(elem) != 2 =>
          val blob = rd.readBytes(rd.readVarint().toInt)
          val sub = new Reader(blob)
          if (repeated(slot) == null)
            repeated(slot) = scala.collection.mutable.ListBuffer.empty
          val buf = repeated(slot)
          while (sub.hasMore) buf += (elem match {
            case PVarint => sub.readVarint()
            case PSint => unzigzag(sub.readVarint())
            case PFixed64 => sub.readFixed64()
            case PDouble => java.lang.Double.longBitsToDouble(sub.readFixed64())
            case PFloat => java.lang.Float.intBitsToFloat(sub.readFixed32())
            case PFixed32 => sub.readFixed32() & 0xFFFFFFFFL
            case PSfixed32 => sub.readFixed32().toLong
            case other => throw new IllegalStateException(s"packed $other")
          })
        case _ => rd.skip(wt) // unknown or mistyped field: skip
      }
    }
    // carry the schema so callers can access fields by NAME (nested
    // message rows included)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = fieldArr(i).ptype match {
        case PRepeated(_) =>
          if (repeated(i) == null) null else repeated(i).toSeq
        case PMessage(inner) =>
          if (msgBytes(i) == null) null
          else decodeRecord(inner, msgBytes(i).toByteArray)
        case _ => values(i)
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      out, schema.sparkType)
  }

  /** Row-level decode for callers that post-process the struct in the
    * same UDF pass (e.g. Vrl.parseDnstap); throws on malformed input.
    */
  def decodeTo(schema: ProtoSchema, bytes: Array[Byte]): Row =
    decodeRecord(schema, bytes)

  /** Row-level encode (the inverse of [[decodeTo]]) — also how the spec
    * self-hosts descriptor-set fixtures without protoc.
    */
  def encodeTo(schema: ProtoSchema, r: Row): Array[Byte] =
    encodeRecord(schema, r)

  /** struct column → proto3 message bytes (null row → null).
    *
    * A native expression, not a UDF: the egress payload structs are
    * deeply nested (repeated messages holding k/n lanes, label arrays),
    * and the Scala-UDF form paid a full Catalyst→external-Row
    * conversion of that tree per row — the egress_udfs A/B probe put
    * the UDF lanes on the dd/remote-write paths at 10-18× the codegen
    * ceiling. [[ProtoEncodeExpression]] walks the `InternalRow` in
    * place (UTF8String bytes are already UTF-8 — no re-encode) and its
    * generated code is one kernel call, so the enclosing projection
    * stays inside whole-stage codegen.
    */
  def encode(schema: ProtoSchema, record: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(ProtoEncodeExpression(schema,
      ColumnBridge.expression(record)))
  }

  /** proto3 message bytes → struct column; null on malformed input.
    *
    * Like [[encode]], a native expression ([[ProtoDecodeExpression]]):
    * the Row-UDF form built an external Row tree per payload and then
    * paid Catalyst's external→internal converter on the whole nested
    * envelope; the expression materializes `InternalRow`/`UTF8String`
    * directly. Same wire semantics: unknown/mistyped fields skipped,
    * packed repeated scalars, proto3 merge for repeated singular
    * message fields.
    */
  def decode(schema: ProtoSchema, data: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(ProtoDecodeExpression(schema,
      ColumnBridge.expression(data)))
  }

  /** OTLP logs/v1 LogRecord subset — field numbers from the published
    * opentelemetry-proto logs.proto (body is AnyValue whose field 1 is
    * string_value).
    */
  object Otlp {
    val AnyValue: ProtoSchema = ProtoSchema(Seq(
      ProtoField(1, "string_value", PString)))
    val LogRecord: ProtoSchema = ProtoSchema(Seq(
      ProtoField(1, "time_unix_nano", PFixed64),
      ProtoField(2, "severity_number", PVarint),
      ProtoField(3, "severity_text", PString),
      ProtoField(5, "body", PMessage(AnyValue)),
      ProtoField(7, "dropped_attributes_count", PVarint),
      ProtoField(9, "trace_id", PBytes),
      ProtoField(10, "span_id", PBytes),
      ProtoField(11, "observed_time_unix_nano", PFixed64)))

    // full export envelope: ExportLogsServiceRequest → ResourceLogs →
    // ScopeLogs → LogRecord (collector.proto + logs.proto numbering)
    val ScopeLogs: ProtoSchema = ProtoSchema(Seq(
      ProtoField(2, "log_records", PRepeated(PMessage(LogRecord))),
      ProtoField(3, "schema_url", PString)))
    val ResourceLogs: ProtoSchema = ProtoSchema(Seq(
      ProtoField(2, "scope_logs", PRepeated(PMessage(ScopeLogs))),
      ProtoField(3, "schema_url", PString)))
    val ExportLogsServiceRequest: ProtoSchema = ProtoSchema(Seq(
      ProtoField(1, "resource_logs", PRepeated(PMessage(ResourceLogs)))))

    // metrics.proto subset: gauge + sum over NumberDataPoints with
    // string-valued attributes (the oneof value arrives as whichever of
    // as_double/as_int was written; the other decodes null)
    val KeyValue: ProtoSchema = ProtoSchema(Seq(
      ProtoField(1, "key", PString),
      ProtoField(2, "value", PMessage(AnyValue))))
    val NumberDataPoint: ProtoSchema = ProtoSchema(Seq(
      ProtoField(2, "start_time_unix_nano", PFixed64),
      ProtoField(3, "time_unix_nano", PFixed64),
      ProtoField(4, "as_double", PDouble),
      ProtoField(6, "as_int", PFixed64),
      ProtoField(7, "attributes", PRepeated(PMessage(KeyValue)))))
    val OtlpGauge: ProtoSchema = ProtoSchema(Seq(
      ProtoField(1, "data_points", PRepeated(PMessage(NumberDataPoint)))))
    val OtlpSum: ProtoSchema = ProtoSchema(Seq(
      ProtoField(1, "data_points", PRepeated(PMessage(NumberDataPoint))),
      ProtoField(2, "aggregation_temporality", PVarint), // 1=delta 2=cumulative
      ProtoField(3, "is_monotonic", PVarint)))
    val OtlpMetric: ProtoSchema = ProtoSchema(Seq(
      ProtoField(1, "name", PString),
      ProtoField(2, "description", PString),
      ProtoField(3, "unit", PString),
      ProtoField(5, "gauge", PMessage(OtlpGauge)),
      ProtoField(7, "sum", PMessage(OtlpSum))))
    val ScopeMetrics: ProtoSchema = ProtoSchema(Seq(
      ProtoField(2, "metrics", PRepeated(PMessage(OtlpMetric))),
      ProtoField(3, "schema_url", PString)))
    val ResourceMetrics: ProtoSchema = ProtoSchema(Seq(
      ProtoField(2, "scope_metrics", PRepeated(PMessage(ScopeMetrics))),
      ProtoField(3, "schema_url", PString)))
    val ExportMetricsServiceRequest: ProtoSchema = ProtoSchema(Seq(
      ProtoField(1, "resource_metrics", PRepeated(PMessage(ResourceMetrics)))))

    // trace.proto subset: Span identity + timing + string attributes
    val Span: ProtoSchema = ProtoSchema(Seq(
      ProtoField(1, "trace_id", PBytes),
      ProtoField(2, "span_id", PBytes),
      ProtoField(3, "trace_state", PString),
      ProtoField(4, "parent_span_id", PBytes),
      ProtoField(5, "name", PString),
      ProtoField(6, "kind", PVarint),
      ProtoField(7, "start_time_unix_nano", PFixed64),
      ProtoField(8, "end_time_unix_nano", PFixed64),
      ProtoField(9, "attributes", PRepeated(PMessage(KeyValue)))))
    val ScopeSpans: ProtoSchema = ProtoSchema(Seq(
      ProtoField(2, "spans", PRepeated(PMessage(Span))),
      ProtoField(3, "schema_url", PString)))
    val ResourceSpans: ProtoSchema = ProtoSchema(Seq(
      ProtoField(2, "scope_spans", PRepeated(PMessage(ScopeSpans))),
      ProtoField(3, "schema_url", PString)))
    val ExportTraceServiceRequest: ProtoSchema = ProtoSchema(Seq(
      ProtoField(1, "resource_spans", PRepeated(PMessage(ResourceSpans)))))
  }
}
