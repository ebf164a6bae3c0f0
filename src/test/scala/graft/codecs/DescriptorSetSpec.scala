package graft.codecs

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import ProtobufCodec._

/** `desc_file` + `message_type` protobuf decoding: a compiled
  * FileDescriptorSet is itself protobuf, so the fixture is SELF-HOSTED —
  * encoded with this repo's own encoder against descriptor.proto's
  * published field numbers, then walked back by fromDescriptorSet.
  */
class DescriptorSetSpec extends SparkSpec {
  import spark.implicits._

  // descriptor.proto meta-schemas (subset used by the walker)
  private val FieldDesc = ProtoSchema(Seq(
    ProtoField(1, "name", PString),
    ProtoField(3, "number", PVarint),
    ProtoField(4, "label", PVarint),
    ProtoField(5, "type", PVarint),
    ProtoField(6, "type_name", PString)))
  private val MsgDesc = ProtoSchema(Seq(
    ProtoField(1, "name", PString),
    ProtoField(2, "field", PRepeated(PMessage(FieldDesc)))))
  private val FileDesc = ProtoSchema(Seq(
    ProtoField(2, "package", PString),
    ProtoField(4, "message_type", PRepeated(PMessage(MsgDesc)))))
  private val FileSet = ProtoSchema(Seq(
    ProtoField(1, "file", PRepeated(PMessage(FileDesc)))))

  private def sRow(schema: ProtoSchema, vals: Any*): Row =
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      vals.toArray, schema.sparkType)

  private def fld(name: String, no: Long, label: Long, tpe: Long,
                  tn: String = null): Row =
    sRow(FieldDesc, name, no, label, tpe, tn)

  // message test.Inner { sint64 x = 1; }
  // message test.Event { int64 id=1; string name=2; double score=3;
  //                      repeated string tags=4; Inner inner=5; }
  private lazy val descBytes: Array[Byte] = encodeTo(FileSet,
    sRow(FileSet, Seq(
      sRow(FileDesc, "test", Seq(
        sRow(MsgDesc, "Inner", Seq(fld("x", 1L, 1L, 18L))),
        sRow(MsgDesc, "Event", Seq(
          fld("id", 1L, 1L, 3L),
          fld("name", 2L, 1L, 9L),
          fld("score", 3L, 1L, 1L),
          fld("tags", 4L, 3L, 9L),
          fld("inner", 5L, 1L, 11L, ".test.Inner"))))))))

  test("fromDescriptorSet reconstructs the message schema") {
    val schema = fromDescriptorSet(descBytes, "test.Event")
    assert(schema.fields.map(f => (f.no, f.name)) ==
      Seq((1, "id"), (2, "name"), (3, "score"), (4, "tags"), (5, "inner")))
    assert(schema.fields(0).ptype == PVarint)
    assert(schema.fields(2).ptype == PDouble)
    assert(schema.fields(3).ptype == PRepeated(PString))
    schema.fields(4).ptype match {
      case PMessage(inner) => assert(inner.fields == Seq(
        ProtoField(1, "x", PSint)))
      case other => fail(s"inner should be a message, got $other")
    }
    val e = intercept[IllegalArgumentException] {
      fromDescriptorSet(descBytes, "test.NoSuch")
    }
    assert(e.getMessage.contains("not found"))
  }

  test("desc_file decoding roundtrips through the YAML loader") {
    val schema = fromDescriptorSet(descBytes, "test.Event")
    val innerSchema = schema.fields(4).ptype
      .asInstanceOf[PMessage].schema
    val payload = encodeTo(schema, sRow(schema,
      42L, "hello", 2.5, Seq("a", "b"), sRow(innerSchema, -7L)))
    val descPath = java.nio.file.Files.createTempFile("evt", ".desc")
    java.nio.file.Files.write(descPath, descBytes)

    val df = Seq((java.util.Base64.getEncoder.encodeToString(payload)))
      .toDF("message")
    val out = graft.plans.ConfigLoader.applyDecoding(df, Map(
      "decoding" -> java.util.Map.of(
        "codec", "protobuf",
        "protobuf", java.util.Map.of(
          "desc_file", descPath.toString,
          "message_type", "test.Event"))))
    val r = out.head()
    assert(r.getAs[Long]("id") == 42L)
    assert(r.getAs[String]("name") == "hello")
    assert(r.getAs[Double]("score") == 2.5)
    assert(r.getAs[scala.collection.Seq[String]]("tags") == Seq("a", "b"))
    assert(r.getAs[Row]("inner").getLong(0) == -7L)
    java.nio.file.Files.delete(descPath)
  }

  test("varint framing + desc_file protobuf = the ClickHouse stream shape") {
    val schema = fromDescriptorSet(descBytes, "test.Event")
    val frames = Seq(
      encodeTo(schema, sRow(schema, 1L, "one", 1.0, Seq(), null)),
      encodeTo(schema, sRow(schema, 2L, "two", 2.0, Seq("t"), null)))
    val chunk = {
      val out = new java.io.ByteArrayOutputStream()
      frames.foreach { f =>
        var v = f.length.toLong
        while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
        out.write(v.toInt)
        out.write(f)
      }
      out.toByteArray
    }
    val descPath = java.nio.file.Files.createTempFile("evt2", ".desc")
    java.nio.file.Files.write(descPath, descBytes)
    val df = Seq(java.util.Base64.getEncoder.encodeToString(chunk))
      .toDF("message")
    val out = graft.plans.ConfigLoader.applyDecoding(df, Map(
      "framing" -> java.util.Map.of("method", "varint_length_delimited"),
      "decoding" -> java.util.Map.of(
        "codec", "protobuf",
        "protobuf", java.util.Map.of(
          "desc_file", descPath.toString,
          "message_type", "test.Event"))))
    val rows = out.orderBy("id").collect()
    assert(rows.map(_.getAs[String]("name")).toSeq == Seq("one", "two"))
    java.nio.file.Files.delete(descPath)
  }

  test("packed repeated scalars and fixed32 family decode (proto3 wire)") {
    // message with float score=1, repeated int64 vals=2, sfixed32 off=3
    val schema = ProtoSchema(Seq(
      ProtoField(1, "score", PFloat),
      ProtoField(2, "vals", PRepeated(PVarint)),
      ProtoField(3, "off", PSfixed32)))
    // hand-build the PACKED proto3 layout other emitters produce:
    // field 2 as ONE length-delimited blob of varints
    val out = new java.io.ByteArrayOutputStream()
    def vint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7FL) != 0) { out.write(((x & 0x7F) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt)
    }
    vint((1L << 3) | 5) // score, wire 5
    var fb = java.lang.Float.floatToIntBits(2.5f)
    (0 until 4).foreach { _ => out.write(fb & 0xFF); fb >>>= 8 }
    vint((2L << 3) | 2) // vals, PACKED: wire 2
    val packed = new java.io.ByteArrayOutputStream()
    Seq(3L, 270L, 86942L).foreach { v =>
      var x = v
      while ((x & ~0x7FL) != 0) { packed.write(((x & 0x7F) | 0x80).toInt); x >>>= 7 }
      packed.write(x.toInt)
    }
    vint(packed.size().toLong); out.write(packed.toByteArray)
    vint((3L << 3) | 5) // off, sfixed32 = -7
    var ob = -7
    (0 until 4).foreach { _ => out.write(ob & 0xFF); ob >>>= 8 }

    val r = decodeTo(schema, out.toByteArray)
    assert(r.getFloat(0) == 2.5f)
    assert(r.getSeq[Long](1) == Seq(3L, 270L, 86942L))
    assert(r.getLong(2) == -7L)
    // our own (unpacked) encode of the same row decodes identically
    val r2 = decodeTo(schema, encodeTo(schema, sRow(schema,
      2.5f, Seq(3L, 270L, 86942L), -7L)))
    assert(r2 == r)
  }

  test("sink-side protobuf + varint framing roundtrips through a file") {
    val descPath = java.nio.file.Files.createTempFile("evt3", ".desc")
    java.nio.file.Files.write(descPath, descBytes)
    val outFile = java.nio.file.Files.createTempDirectory("pbout")
      .resolve("events.pb")
    val df = Seq((10L, "alpha", 0.5), (11L, "beta", 1.5))
      .toDF("id", "name", "score")
    graft.sinks.FileSink.writeBatch(df, graft.sinks.FileSink.Config(
      outFile.toString, codec = "protobuf",
      framing = "varint_length_delimited",
      encConf = Map("protobuf" -> java.util.Map.of(
        "desc_file", descPath.toString, "message_type", "test.Event"))))
    // decode the produced stream with the source-side framing + decoder
    val chunk = java.nio.file.Files.readAllBytes(outFile)
    val back = graft.plans.ConfigLoader.applyDecoding(
      Seq(java.util.Base64.getEncoder.encodeToString(chunk)).toDF("message"),
      Map(
        "framing" -> java.util.Map.of("method", "varint_length_delimited"),
        "decoding" -> java.util.Map.of(
          "codec", "protobuf",
          "protobuf", java.util.Map.of(
            "desc_file", descPath.toString,
            "message_type", "test.Event"))))
      .orderBy("id").collect()
    assert(back.map(r => (r.getAs[Long]("id"), r.getAs[String]("name"),
      r.getAs[Double]("score"))).toSeq ==
      Seq((10L, "alpha", 0.5), (11L, "beta", 1.5)))
    java.nio.file.Files.delete(descPath)
  }
}
