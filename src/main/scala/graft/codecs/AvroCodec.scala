package graft.codecs

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.api.java.UDF1
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}

/** Avro datum codec (reference lib/codecs/src/decoding/format/avro.rs,
  * encoding/format/avro.rs: raw binary-encoded datums against a known
  * writer schema — no container file, no single-object header, exactly
  * the shape Vector's `avro` decoder consumes from transport frames).
  *
  * The spark-avro connector module is not on this classpath, so the
  * codec drives the avro-java runtime (ships with Spark core) directly
  * from UDFs. The schema travels as JSON text and is parsed once per
  * executor via a cache — Schema itself is not serializable.
  *
  * Supported field types: long/int, double/float, string, boolean,
  * bytes/fixed, enum (as string), arrays, string-keyed maps, nested
  * records, and `["null", T]` unions — recursive, so real-world writer
  * schemas decode without flattening.
  */
object AvroCodec {

  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, Schema]()
  private def schemaOf(json: String): Schema =
    schemaCache.computeIfAbsent(json, j => new Schema.Parser().parse(j))

  /** Avro record schema JSON → Spark StructType (driver side, for the
    * decoder's declared return type).
    */
  def sparkSchema(schemaJson: String): StructType = {
    val schema = schemaOf(schemaJson)
    require(schema.getType == Schema.Type.RECORD, "record schema required")
    StructType(schema.getFields.toArray.map { f0 =>
      val f = f0.asInstanceOf[Schema.Field]
      val (ft, nullable) = unwrap(f.schema())
      StructField(f.name(), sparkType(ft), nullable)
    })
  }

  private def unwrap(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val branches = s.getTypes.toArray.map(_.asInstanceOf[Schema])
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.length == 1, "only [null, T] unions supported")
      (nonNull.head, branches.length != nonNull.length)
    } else (s, false)

  private def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.LONG => LongType
    case Schema.Type.INT => IntegerType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.STRING => StringType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.ENUM => StringType
    case Schema.Type.ARRAY =>
      val (et, _) = unwrap(s.getElementType)
      ArrayType(sparkType(et))
    case Schema.Type.MAP =>
      val (vt, _) = unwrap(s.getValueType)
      MapType(StringType, sparkType(vt))
    case Schema.Type.RECORD =>
      StructType(s.getFields.toArray.map { f0 =>
        val f = f0.asInstanceOf[Schema.Field]
        val (ft, nullable) = unwrap(f.schema())
        StructField(f.name(), sparkType(ft), nullable)
      })
    case other => throw new IllegalArgumentException(s"unsupported avro type $other")
  }

  /** Avro runtime value → Spark row value (recursive). */
  private def avroToSpark(v: Any, s: Schema): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case bb: java.nio.ByteBuffer =>
      val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
    case fx: org.apache.avro.generic.GenericFixed => fx.bytes()
    case e: org.apache.avro.generic.GenericEnumSymbol[_] => e.toString
    case rec: GenericRecord =>
      val (rs, _) = unwrap(s)
      Row.fromSeq(rs.getFields.toArray.map { f0 =>
        val f = f0.asInstanceOf[Schema.Field]
        avroToSpark(rec.get(f.name()), f.schema())
      }.toSeq)
    case arr: java.util.Collection[_] =>
      val (as, _) = unwrap(s)
      val et = as.getElementType
      arr.toArray.map(avroToSpark(_, et)).toSeq
    case m: java.util.Map[_, _] =>
      val (ms, _) = unwrap(s)
      val vt = ms.getValueType
      val b = Map.newBuilder[String, Any]
      m.forEach((k, x) => b += (k.toString -> avroToSpark(x, vt)))
      b.result()
    case other => other
  }

  /** Spark row value → Avro runtime value (inverse of [[avroToSpark]]). */
  private def sparkToAvro(v: Any, s0: Schema): Any = {
    val (s, _) = unwrap(s0)
    v match {
      case null => null
      case str: String => s.getType match {
        case Schema.Type.ENUM => new GenericData.EnumSymbol(s, str)
        case _ => new org.apache.avro.util.Utf8(str)
      }
      case b: Array[Byte] => s.getType match {
        case Schema.Type.FIXED => new GenericData.Fixed(s, b)
        case _ => java.nio.ByteBuffer.wrap(b)
      }
      case r: Row =>
        val rec = new GenericData.Record(s)
        s.getFields.forEach { f =>
          rec.put(f.name(), sparkToAvro(r.get(r.fieldIndex(f.name())), f.schema()))
        }
        rec
      case seq: scala.collection.Seq[_] =>
        val out = new java.util.ArrayList[Any](seq.length)
        seq.foreach(e => out.add(sparkToAvro(e, s.getElementType)))
        out
      case m: scala.collection.Map[_, _] =>
        val out = new java.util.HashMap[Any, Any]()
        m.foreach { case (k, x) =>
          out.put(new org.apache.avro.util.Utf8(k.toString),
            sparkToAvro(x, s.getValueType)) }
        out
      case other => other
    }
  }

  /** struct column → Avro binary datum. */
  def encode(schemaJson: String, record: Column): Column = {
    val enc = udf { (r: Row) =>
      if (r == null) null
      else {
        val schema = schemaOf(schemaJson)
        val rec = sparkToAvro(r, schema).asInstanceOf[GenericRecord]
        val out = new java.io.ByteArrayOutputStream()
        val e = EncoderFactory.get().binaryEncoder(out, null)
        new GenericDatumWriter[GenericRecord](schema).write(rec, e)
        e.flush()
        out.toByteArray
      }
    }
    enc(record)
  }

  /** Avro binary datum → struct column (null on malformed input —
    * decoder parity with the reference's fallible decode).
    */
  def decode(schemaJson: String, data: Column): Column = {
    val st = sparkSchema(schemaJson)
    val dec = new UDF1[Array[Byte], Row] {
      override def call(bytes: Array[Byte]): Row = {
        if (bytes == null) null
        else try {
          val schema = schemaOf(schemaJson)
          val d = DecoderFactory.get().binaryDecoder(bytes, null)
          val rec = new GenericDatumReader[GenericRecord](schema).read(null, d)
          avroToSpark(rec, schema).asInstanceOf[Row]
        } catch { case _: Exception => null }
      }
    }
    udf(dec, st).apply(data)
  }
}
