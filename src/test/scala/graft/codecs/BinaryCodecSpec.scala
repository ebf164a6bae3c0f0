package graft.codecs

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Avro + protobuf wire-format edge cases the oracle queries don't
  * reach: negative varints, zigzag sints, unknown-field skipping,
  * truncated input, multi-frame varint framing with large frames.
  */
class BinaryCodecSpec extends SparkSpec {
  import spark.implicits._
  import ProtobufCodec._

  test("proto roundtrip: negatives, zigzag, doubles") {
    val schema = ProtoSchema(Seq(
      ProtoField(1, "a", PVarint),
      ProtoField(2, "b", PSint),
      ProtoField(3, "c", PDouble),
      ProtoField(4, "d", PString)))
    val df = Seq((-5L, -12345L, -2.75, "héllo"))
      .toDF("a", "b", "c", "d")
      .select(struct(col("a"), col("b"), col("c"), col("d")).as("r"))
    val rt = df.select(
      ProtobufCodec.decode(schema,
        ProtobufCodec.encode(schema, col("r"))).as("p"))
      .select(col("p.a"), col("p.b"), col("p.c"), col("p.d"))
      .collect().head
    assert(rt == Row(-5L, -12345L, -2.75, "héllo"))
  }

  test("proto decoder skips unknown fields") {
    val writer = ProtoSchema(Seq(
      ProtoField(1, "a", PVarint),
      ProtoField(2, "x", PString), // unknown to the reader
      ProtoField(3, "b", PString)))
    val reader = ProtoSchema(Seq(
      ProtoField(1, "a", PVarint),
      ProtoField(3, "b", PString)))
    val df = Seq((7L, "junk", "keep")).toDF("a", "x", "b")
      .select(struct(col("a"), col("x"), col("b")).as("r"))
    val rt = df.select(ProtobufCodec.decode(reader,
        ProtobufCodec.encode(writer, col("r"))).as("p"))
      .select(col("p.a"), col("p.b")).collect().head
    assert(rt == Row(7L, "keep"))
  }

  test("proto decoder nulls on truncated input") {
    val schema = ProtoSchema(Seq(ProtoField(1, "s", PString)))
    val df = Seq(Array[Byte](0x0a, 0x7f, 0x41)).toDF("b") // claims 127 bytes
    assert(df.select(ProtobufCodec.decode(schema, col("b"))).collect()
      .head.isNullAt(0))
  }

  test("OTLP export envelope: repeated nested messages roundtrip") {
    import org.apache.spark.sql.types._
    // two log records inside one scope inside one resource
    val lr = (tns: Long, txt: String) =>
      Row(tns, 9L, txt, Row(s"body of $txt"), null, null, null, null)
    val envelope = Row(Seq(Row(Seq(Row(Seq(lr(111L, "first"), lr(222L, "second")),
      "s-url")), "r-url")))
    val st = Otlp.ExportLogsServiceRequest.sparkType
    val df = spark.createDataFrame(
      java.util.List.of(Row(envelope)), StructType(Seq(StructField("r", st))))
    val rt = df.select(ProtobufCodec.decode(Otlp.ExportLogsServiceRequest,
        ProtobufCodec.encode(Otlp.ExportLogsServiceRequest, col("r"))).as("p"))
      .select(explode(col("p.resource_logs")).as("rl"))
      .select(explode(col("rl.scope_logs")).as("sl"))
      .select(col("sl.schema_url"), explode(col("sl.log_records")).as("lr"))
      .select(col("schema_url"), col("lr.time_unix_nano"),
        col("lr.severity_text"), col("lr.body.string_value"))
      .collect()
    assert(rt.toSeq == Seq(
      Row("s-url", 111L, "first", "body of first"),
      Row("s-url", 222L, "second", "body of second")))
  }

  test("avro roundtrip: nullable union and negative long") {
    val schemaJson =
      """{"type":"record","name":"R","fields":[
        |{"name":"a","type":"long"},
        |{"name":"b","type":["null","string"],"default":null}]}""".stripMargin
    val df = Seq((-9876543210L, Option.empty[String])).toDF("a", "b")
      .select(struct(col("a"), col("b")).as("r"))
    val rt = df.select(AvroCodec.decode(schemaJson,
        AvroCodec.encode(schemaJson, col("r"))).as("p"))
      .select(col("p.a"), col("p.b")).collect().head
    assert(rt.getLong(0) == -9876543210L && rt.isNullAt(1))
  }

  test("avro roundtrip: nested record, array, map, enum, bytes") {
    val schemaJson =
      """{"type":"record","name":"Doc","fields":[
        |{"name":"id","type":"long"},
        |{"name":"tags","type":{"type":"array","items":"string"}},
        |{"name":"scores","type":{"type":"map","values":"double"}},
        |{"name":"kind","type":{"type":"enum","name":"K","symbols":["A","B"]}},
        |{"name":"blob","type":"bytes"},
        |{"name":"inner","type":["null",{"type":"record","name":"I","fields":[
        |  {"name":"x","type":"long"},
        |  {"name":"ys","type":{"type":"array","items":"double"}}]}]}
        |]}""".stripMargin
    val inner = Row(7L, Seq(1.5, 2.5))
    val row = Row(42L, Seq("a", "b"), Map("p" -> 0.25), "B",
      Array[Byte](1, 2, 3), inner)
    val st = AvroCodec.sparkSchema(schemaJson)
    val df = spark.createDataFrame(
      java.util.List.of(Row(row)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("r", st))))
    val rt = df.select(AvroCodec.decode(schemaJson,
        AvroCodec.encode(schemaJson, col("r"))).as("p"))
      .select(col("p.id"), col("p.tags"), col("p.scores"), col("p.kind"),
        col("p.blob"), col("p.inner.x"), col("p.inner.ys"))
      .collect().head
    assert(rt.getLong(0) == 42L)
    assert(rt.getSeq[String](1) == Seq("a", "b"))
    assert(rt.getMap[String, Double](2) == Map("p" -> 0.25))
    assert(rt.getString(3) == "B")
    assert(rt.getAs[Array[Byte]](4).toSeq == Seq[Byte](1, 2, 3))
    assert(rt.getLong(5) == 7L && rt.getSeq[Double](6) == Seq(1.5, 2.5))
  }

  test("varint framing handles frames >127 bytes and drops truncated tail") {
    val big = "x" * 300
    val packed = Seq(Seq("small", big)).toDF("parts")
      .select(Framing.varintPack(col("parts")).as("b"))
    val frames = packed
      .select(explode(Framing.varintLengthDelimited(col("b"))).as("f"))
      .select(col("f").cast("string")).as[String].collect()
    assert(frames.toSeq == Seq("small", big))
    // chop the last 10 bytes: second frame incomplete -> only first kept
    val chopped = packed.select(expr("substring(b, 1, length(b) - 10)").as("b"))
      .select(explode(Framing.varintLengthDelimited(col("b"))).as("f"))
      .select(col("f").cast("string")).as[String].collect()
    assert(chopped.toSeq == Seq("small"))
  }

  test("chunked gelf drops incomplete messages") {
    val chunks = Seq((1L, "complete message", 3)).toDF("id", "msg", "n")
      .select(explode(Framing.gelfChunksOf(col("id"), col("msg"), col("n"))).as("chunk"))
    // full set reassembles
    val ok = Framing.chunkedGelf(chunks, col("chunk")).collect()
    assert(ok.length == 1 && ok.head.getAs[String]("message") == "complete message")
    // drop one chunk -> message discarded
    val partial = chunks.limit(2)
    assert(Framing.chunkedGelf(partial, col("chunk")).isEmpty)
  }
}
