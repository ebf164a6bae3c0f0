package graft.codecs

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.SpecializedGetters
import org.apache.spark.sql.types._

import ProtobufCodec._

/** proto3 struct→bytes encode as a native expression (see
  * [[ProtobufCodec.encode]]). The wire walker is byte-identical to
  * `encodeRecord` — same field order, same varint/fixed/length-delimited
  * layout, null fields skipped — but reads the Catalyst `InternalRow`
  * directly through a schema-compiled plan (field index + accessor per
  * proto field, resolved once) instead of converting the nested payload
  * tree to external Rows per row.
  */
case class ProtoEncodeExpression(schema: ProtoSchema, child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "proto_encode"

  @transient private lazy val kernel =
    new ProtoEncodeKernel(schema, child.dataType.asInstanceOf[StructType])

  override protected def nullSafeEval(input: Any): Any =
    kernel.encode(input.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ker = ctx.addReferenceObj("protoEncKernel", kernel,
      classOf[ProtoEncodeKernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ker.encode($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ProtoEncodeExpression = copy(child = newChild)
}

/** The compiled encoder: per proto field its struct ordinal, Spark type
  * and (for messages) the nested compiled plan. Serializable — shipped
  * to executors inside the generated code's references array.
  */
final class ProtoEncodeKernel(schema: ProtoSchema, structType: StructType)
    extends Serializable {

  private final case class CField(no: Int, ptype: PType, idx: Int,
      dt: DataType, nested: Array[CField], nStructFields: Int)

  private def compile(s: ProtoSchema, st: StructType): Array[CField] =
    s.fields.map { f =>
      val idx = st.fieldIndex(f.name)
      val dt0 = st.fields(idx).dataType
      // the value type (array element type for repeated fields)
      val dt = dt0 match {
        case ArrayType(et, _) => et
        case other => other
      }
      def inner(t: PType): Array[CField] = t match {
        case PMessage(ms) => compile(ms, dt.asInstanceOf[StructType])
        case PRepeated(e) => inner(e)
        case _ => null
      }
      CField(f.no, f.ptype, idx, dt, inner(f.ptype), dt match {
        case s: StructType => s.size
        case _ => 0
      })
    }.toArray

  private val plan: Array[CField] = compile(schema, structType)

  def encode(row: InternalRow): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeRecord(out, plan, row)
    out.toByteArray
  }

  private def writeVarint(out: java.io.ByteArrayOutputStream,
                          v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) {
      out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7
    }
    out.write(v.toInt)
  }

  private def wt(t: PType): Int = t match {
    case PVarint | PSint => 0
    case PDouble | PFixed64 => 1
    case PFloat | PFixed32 | PSfixed32 => 5
    case _ => 2
  }

  private def longOf(g: SpecializedGetters, i: Int, dt: DataType): Long =
    dt match {
      case LongType => g.getLong(i)
      case IntegerType => g.getInt(i).toLong
      case ShortType => g.getShort(i).toLong
      case BooleanType => if (g.getBoolean(i)) 1L else 0L
      case _ => throw new IllegalStateException(
        s"proto integral field over $dt")
    }

  private def writeRecord(out: java.io.ByteArrayOutputStream,
                          fields: Array[CField],
                          row: InternalRow): Unit = {
    var fi = 0
    while (fi < fields.length) {
      val f = fields(fi)
      if (!row.isNullAt(f.idx)) f.ptype match {
        case PRepeated(elem) =>
          val arr = row.getArray(f.idx)
          val n = arr.numElements()
          var i = 0
          while (i < n) {
            if (!arr.isNullAt(i)) writeValue(out, f, elem, arr, i)
            i += 1
          }
        case t => writeValue(out, f, t, row, f.idx)
      }
      fi += 1
    }
  }

  private def writeValue(out: java.io.ByteArrayOutputStream, f: CField,
                         t: PType, g: SpecializedGetters, i: Int): Unit = {
    writeVarint(out, (f.no.toLong << 3) | wt(t))
    t match {
      case PVarint => writeVarint(out, longOf(g, i, f.dt))
      case PSint =>
        val v = longOf(g, i, f.dt)
        writeVarint(out, (v << 1) ^ (v >> 63))
      case PFixed64 =>
        var x = longOf(g, i, f.dt)
        var k = 0
        while (k < 8) { out.write((x & 0xFF).toInt); x >>>= 8; k += 1 }
      case PDouble =>
        var x = java.lang.Double.doubleToLongBits(f.dt match {
          case DoubleType => g.getDouble(i)
          case FloatType => g.getFloat(i).toDouble
          case other => longOf(g, i, other).toDouble
        })
        var k = 0
        while (k < 8) { out.write((x & 0xFF).toInt); x >>>= 8; k += 1 }
      case PFloat =>
        var x = java.lang.Float.floatToIntBits(f.dt match {
          case FloatType => g.getFloat(i)
          case DoubleType => g.getDouble(i).toFloat
          case other => longOf(g, i, other).toFloat
        })
        var k = 0
        while (k < 4) { out.write(x & 0xFF); x >>>= 8; k += 1 }
      case PFixed32 | PSfixed32 =>
        var x = longOf(g, i, f.dt).toInt
        var k = 0
        while (k < 4) { out.write(x & 0xFF); x >>>= 8; k += 1 }
      case PString =>
        val b = g.getUTF8String(i).getBytes // already UTF-8
        writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
      case PBytes =>
        val b = g.getBinary(i)
        writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
      case PMessage(_) =>
        val sub = new java.io.ByteArrayOutputStream()
        writeRecord(sub, f.nested, g.getStruct(i, f.nStructFields))
        writeVarint(out, sub.size().toLong)
        sub.writeTo(out)
      case PRepeated(_) =>
        throw new IllegalStateException("nested repeated unsupported")
    }
  }
}

/** proto3 bytes→struct decode as a native expression (see
  * [[ProtobufCodec.decode]]). The wire walker mirrors `decodeRecord` —
  * unknown/mistyped fields skipped, packed repeated scalars, proto3
  * MERGE of repeated singular message fields (byte-concat, decode
  * once) — but materializes Catalyst values (`UTF8String`,
  * `GenericArrayData`, nested `InternalRow`) directly instead of an
  * external Row tree that the converter then re-walks. Malformed input
  * decodes to null, matching the UDF form.
  */
case class ProtoDecodeExpression(schema: ProtoSchema, child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = schema.sparkType
  override def nullable: Boolean = true
  override def prettyName: String = "proto_decode"

  @transient private lazy val kernel = new ProtoDecodeKernel(schema)

  override protected def nullSafeEval(input: Any): Any =
    try kernel.decode(input.asInstanceOf[Array[Byte]])
    catch { case _: Exception => null }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val ker = ctx.addReferenceObj("protoDecKernel", kernel,
      classOf[ProtoDecodeKernel].getName)
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.InternalRow ${ev.value} = null;
      if (!${childGen.isNull}) {
        try {
          ${ev.value} = $ker.decode(${childGen.value});
          ${ev.isNull} = ${ev.value} == null;
        } catch (java.lang.Exception e) { /* malformed -> null */ }
      }""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ProtoDecodeExpression = copy(child = newChild)
}

/** The compiled decoder — field-number dispatch tables per message
  * level, shipped to executors via the generated code's references.
  */
final class ProtoDecodeKernel(schema: ProtoSchema) extends Serializable {
  import ProtobufCodec.{Reader, unzigzag, wireType}

  def decode(bytes: Array[Byte]): InternalRow = decodeMsg(schema, bytes)

  private def readValue(rd: Reader, t: PType): Any = t match {
    case PVarint => rd.readVarint()
    case PSint => unzigzag(rd.readVarint())
    case PFixed64 => rd.readFixed64()
    case PDouble => java.lang.Double.longBitsToDouble(rd.readFixed64())
    case PFloat => java.lang.Float.intBitsToFloat(rd.readFixed32())
    case PFixed32 => rd.readFixed32() & 0xFFFFFFFFL
    case PSfixed32 => rd.readFixed32().toLong
    case PString => org.apache.spark.unsafe.types.UTF8String
      .fromBytes(rd.readBytes(rd.readVarint().toInt))
    case PBytes => rd.readBytes(rd.readVarint().toInt)
    case PMessage(inner) =>
      decodeMsg(inner, rd.readBytes(rd.readVarint().toInt))
    case PRepeated(_) =>
      throw new IllegalStateException("nested repeated unsupported")
  }

  private def decodeMsg(s: ProtoSchema, bytes: Array[Byte]): InternalRow = {
    val byNo = s.fields.map(f => f.no -> f).toMap
    val values = scala.collection.mutable.Map[Int, Any]()
    val repeated = scala.collection.mutable
      .Map[Int, scala.collection.mutable.ArrayBuffer[Any]]()
    val msgBytes = scala.collection.mutable
      .Map[Int, java.io.ByteArrayOutputStream]()
    val rd = new Reader(bytes)
    while (rd.hasMore) {
      val tag = rd.readVarint()
      val no = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      byNo.get(no) match {
        case Some(f) if wireType(f.ptype) == wt =>
          f.ptype match {
            case PRepeated(elem) =>
              repeated.getOrElseUpdate(no,
                scala.collection.mutable.ArrayBuffer.empty) +=
                readValue(rd, elem)
            case PMessage(_) =>
              msgBytes.getOrElseUpdate(no,
                new java.io.ByteArrayOutputStream())
                .write(rd.readBytes(rd.readVarint().toInt))
            case t => values(no) = readValue(rd, t)
          }
        case Some(ProtoField(_, _, PRepeated(elem)))
            if wt == 2 && wireType(elem) != 2 =>
          // packed repeated scalars
          val blob = rd.readBytes(rd.readVarint().toInt)
          val sub = new Reader(blob)
          val buf = repeated.getOrElseUpdate(no,
            scala.collection.mutable.ArrayBuffer.empty)
          while (sub.hasMore) buf += readValue(sub, elem)
        case _ => rd.skip(wt)
      }
    }
    new GenericInternalRow(s.fields.map { f =>
      f.ptype match {
        case PRepeated(_) =>
          repeated.get(f.no)
            .map(b => new org.apache.spark.sql.catalyst.util
              .GenericArrayData(b.toArray): Any).orNull
        case PMessage(inner) =>
          msgBytes.get(f.no)
            .map(b => decodeMsg(inner, b.toByteArray): Any).orNull
        case _ => values.get(f.no).orNull
      }
    }.toArray)
  }
}
