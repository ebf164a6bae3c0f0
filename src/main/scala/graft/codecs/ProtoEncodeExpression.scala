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

/** The compiled decoder. Like the encode kernel, the dispatch is
  * resolved ONCE per schema — each message level compiles a
  * field-number-indexed array of `CField` slots (output position, value
  * wire type, nested compiled message) — and each `decodeMsg` call works
  * over one flat `Array[Any]` of value slots instead of three mutable
  * Maps rebuilt per message per row. Semantics are pinned to
  * [[ProtobufCodec.decodeRecord]] by ProtoExprSpec: unknown/mistyped
  * fields skipped, packed repeated scalars, proto3 MERGE of repeated
  * singular message fields (byte-concat, decode once). Strings with
  * invalid UTF-8 are normalized through `new String(bytes, UTF_8)`
  * (U+FFFD substitution) exactly like the Row walker — valid input
  * (the overwhelmingly common case) takes the zero-copy
  * `UTF8String.fromBytes` path after a validity scan.
  */
final class ProtoDecodeKernel(schema: ProtoSchema) extends Serializable {
  import ProtobufCodec.{Reader, unzigzag, wireType}

  // field kinds, resolved at compile time so the per-row loop is a flat
  // int dispatch instead of PType pattern matches
  private val K_SCALAR = 0 // singular scalar (incl. string/bytes)
  private val K_MSG = 1 // singular message: byte-MERGE, decode at end
  private val K_REP_SCALAR = 2 // repeated scalar (packed or not)
  private val K_REP_MSG = 3 // repeated message: decode per element

  private final class CField(val no: Int, val slot: Int, val kind: Int,
      val t: PType, val wt: Int, val nested: CMsg) extends Serializable

  private final class CMsg(s: ProtoSchema) extends Serializable {
    val n: Int = s.fields.length
    val fields: Array[CField] = s.fields.zipWithIndex.map {
      case (f, slot) => f.ptype match {
        case PRepeated(PMessage(inner)) =>
          new CField(f.no, slot, K_REP_MSG, null, 2, new CMsg(inner))
        case PRepeated(elem) =>
          new CField(f.no, slot, K_REP_SCALAR, elem, wireType(elem), null)
        case PMessage(inner) =>
          new CField(f.no, slot, K_MSG, null, 2, new CMsg(inner))
        case t =>
          new CField(f.no, slot, K_SCALAR, t, wireType(t), null)
      }
    }.toArray
    // field numbers are small in every schema we compile (OTLP, dd
    // agent, descriptor sets); keep a linear-scan fallback so a sparse
    // schema can't blow up the table
    private val dispatch: Array[CField] = {
      val maxNo = fields.iterator.map(_.no).max
      if (maxNo <= 4096) {
        val d = new Array[CField](maxNo + 1)
        fields.foreach(f => d(f.no) = f)
        d
      } else null
    }
    def lookup(no: Int): CField =
      if (dispatch != null) {
        if (no >= 0 && no < dispatch.length) dispatch(no) else null
      } else {
        var i = 0
        while (i < fields.length) {
          if (fields(i).no == no) return fields(i)
          i += 1
        }
        null
      }
  }

  @transient private lazy val root = new CMsg(schema)

  def decode(bytes: Array[Byte]): InternalRow = decodeMsg(root, bytes)

  private def readScalar(rd: Reader, t: PType): Any = t match {
    case PVarint => rd.readVarint()
    case PSint => unzigzag(rd.readVarint())
    case PFixed64 => rd.readFixed64()
    case PDouble => java.lang.Double.longBitsToDouble(rd.readFixed64())
    case PFloat => java.lang.Float.intBitsToFloat(rd.readFixed32())
    case PFixed32 => rd.readFixed32() & 0xFFFFFFFFL
    case PSfixed32 => rd.readFixed32().toLong
    case PString =>
      val b = rd.readBytes(rd.readVarint().toInt)
      val u = org.apache.spark.unsafe.types.UTF8String.fromBytes(b)
      if (u.isValid) u
      else org.apache.spark.unsafe.types.UTF8String.fromString(
        new String(b, java.nio.charset.StandardCharsets.UTF_8))
    case PBytes => rd.readBytes(rd.readVarint().toInt)
    case other => throw new IllegalStateException(s"scalar $other")
  }

  private def repBuf(slots: Array[Any],
      slot: Int): scala.collection.mutable.ArrayBuffer[Any] = {
    val b = slots(slot)
    if (b == null) {
      val nb = new scala.collection.mutable.ArrayBuffer[Any]()
      slots(slot) = nb
      nb
    } else b.asInstanceOf[scala.collection.mutable.ArrayBuffer[Any]]
  }

  private def decodeMsg(c: CMsg, bytes: Array[Byte]): InternalRow = {
    val slots = new Array[Any](c.n)
    val rd = new Reader(bytes)
    while (rd.hasMore) {
      val tag = rd.readVarint()
      val no = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      val f = c.lookup(no)
      if (f == null) rd.skip(wt)
      else f.kind match {
        case K_SCALAR =>
          if (wt == f.wt) slots(f.slot) = readScalar(rd, f.t)
          else rd.skip(wt)
        case K_MSG =>
          if (wt == 2) {
            val b = rd.readBytes(rd.readVarint().toInt)
            slots(f.slot) match {
              case null => slots(f.slot) = b
              case prev: Array[Byte] =>
                val bos = new java.io.ByteArrayOutputStream(
                  prev.length + b.length)
                bos.write(prev, 0, prev.length)
                bos.write(b, 0, b.length)
                slots(f.slot) = bos
              case bos: java.io.ByteArrayOutputStream =>
                bos.write(b, 0, b.length)
            }
          } else rd.skip(wt)
        case K_REP_MSG =>
          if (wt == 2) repBuf(slots, f.slot) +=
            decodeMsg(f.nested, rd.readBytes(rd.readVarint().toInt))
          else rd.skip(wt)
        case K_REP_SCALAR =>
          if (wt == f.wt) repBuf(slots, f.slot) += readScalar(rd, f.t)
          else if (wt == 2) {
            // packed repeated scalars (f.wt != 2 here, so no ambiguity)
            val sub = new Reader(rd.readBytes(rd.readVarint().toInt))
            val buf = repBuf(slots, f.slot)
            while (sub.hasMore) buf += readScalar(sub, f.t)
          } else rd.skip(wt)
      }
    }
    // finalize in place: merged message bytes -> nested rows, repeated
    // buffers -> array data; absent fields stay null
    var i = 0
    while (i < c.n) {
      val f = c.fields(i)
      f.kind match {
        case K_MSG => slots(i) = slots(i) match {
          case null => null
          case b: Array[Byte] => decodeMsg(f.nested, b)
          case bos: java.io.ByteArrayOutputStream =>
            decodeMsg(f.nested, bos.toByteArray)
        }
        case K_REP_SCALAR | K_REP_MSG => slots(i) = slots(i) match {
          case null => null
          case ab: scala.collection.mutable.ArrayBuffer[_] =>
            new org.apache.spark.sql.catalyst.util
              .GenericArrayData(ab.toArray[Any](
                scala.reflect.ClassTag.Any))
        }
        case _ => ()
      }
      i += 1
    }
    new GenericInternalRow(slots)
  }
}
