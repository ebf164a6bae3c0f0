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
  * Supported field types: long/int, double/float, string, boolean, and
  * their `["null", T]` unions — the flat-record subset the reference's
  * transport codecs exercise.
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
    case Schema.Type.BYTES => BinaryType
    case other => throw new IllegalArgumentException(s"unsupported avro type $other")
  }

  /** struct column → Avro binary datum. */
  def encode(schemaJson: String, record: Column): Column = {
    val enc = udf { (r: Row) =>
      if (r == null) null
      else {
        val schema = schemaOf(schemaJson)
        val rec = new GenericData.Record(schema)
        schema.getFields.forEach { f =>
          val v = r.get(r.fieldIndex(f.name())) match {
            case null => null
            case s: String => new org.apache.avro.util.Utf8(s)
            case other => other
          }
          rec.put(f.name(), v)
        }
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
          Row.fromSeq(schema.getFields.toArray.map { f0 =>
            val f = f0.asInstanceOf[Schema.Field]
            rec.get(f.name()) match {
              case u: org.apache.avro.util.Utf8 => u.toString
              case other => other
            }
          }.toSeq)
        } catch { case _: Exception => null }
      }
    }
    udf(dec, st).apply(data)
  }
}
