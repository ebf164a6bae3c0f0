package graft.codecs

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema

/** Differential pins for the native proto expressions against the
  * retained Row-path walkers (`encodeTo`/`decodeTo`): the expression
  * forms must stay BYTE-identical (encode) and value-identical (decode)
  * to the reference implementation for nested envelopes, packed
  * repeated scalars, proto3 message merge and unknown-field skipping —
  * the edge legs a round-trip alone can miss (a matched encode/decode
  * bug cancels out in a round-trip).
  */
class ProtoExprSpec extends SparkSpec {
  import spark.implicits._
  import ProtobufCodec._

  private def sRow(schema: ProtoSchema, vals: Any*): Row =
    new GenericRowWithSchema(vals.toArray, schema.sparkType)

  /** Canonical value tree: Seq concrete classes and byte-array identity
    * don't matter, values do.
    */
  private def norm(v: Any): Any = v match {
    case r: Row => r.toSeq.map(norm).toList
    case s: scala.collection.Seq[_] => s.map(norm).toList
    case b: Array[Byte] => b.toList
    case a: Array[_] => a.map(norm).toList
    case other => other
  }

  private val lr = Otlp.LogRecord
  private def record(i: Int): Row =
    sRow(lr, 1700000000000000000L + i, 9L, s"INFO$i",
      sRow(Otlp.AnyValue, s"msg $i with ünïcode"),
      i.toLong, Array[Byte](1, 2, 3, i.toByte), Array[Byte](9, 8),
      1700000000000000100L + i)
  private val envelope: Row =
    sRow(Otlp.ExportLogsServiceRequest,
      Seq(sRow(Otlp.ResourceLogs,
        Seq(sRow(Otlp.ScopeLogs, (0 until 5).map(record), "s-url")),
        "r-url")))

  test("expression encode is byte-identical to the Row walker") {
    val expected = encodeTo(Otlp.ExportLogsServiceRequest, envelope)
    val df = spark.createDataFrame(
      java.util.List.of(Row(envelope)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("r",
          Otlp.ExportLogsServiceRequest.sparkType))))
    val got = df.select(
      ProtobufCodec.encode(Otlp.ExportLogsServiceRequest, col("r")))
      .collect().head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(got, expected))
  }

  test("expression decode matches the Row walker on the envelope") {
    val bytes = encodeTo(Otlp.ExportLogsServiceRequest, envelope)
    val viaRow = decodeTo(Otlp.ExportLogsServiceRequest, bytes)
    val viaExpr = Seq(Tuple1(bytes)).toDF("b")
      .select(ProtobufCodec.decode(Otlp.ExportLogsServiceRequest,
        col("b")).as("p"))
      .collect().head.getStruct(0)
    assert(norm(viaExpr) == norm(viaRow))
  }

  test("expression decode: packed repeated scalars + proto3 merge") {
    // writer emits two singular-message instances of the same field
    // (they must MERGE: repeated subfields concatenate) and a packed
    // blob for a repeated varint field
    val inner = ProtoSchema(Seq(ProtoField(1, "xs", PRepeated(PVarint))))
    val outer = ProtoSchema(Seq(ProtoField(1, "m", PMessage(inner)),
      ProtoField(2, "tail", PVarint)))
    val m1 = encodeTo(inner, sRow(inner, Seq(1L, 2L)))
    val m2 = encodeTo(inner, sRow(inner, Seq(3L)))
    val out = new java.io.ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    // field 1 (message) twice -> merge
    varint((1L << 3) | 2); varint(m1.length.toLong); out.write(m1)
    varint((1L << 3) | 2); varint(m2.length.toLong); out.write(m2)
    // an unknown field 9 (varint) the reader must skip
    varint((9L << 3) | 0); varint(42)
    varint((2L << 3) | 0); varint(7)
    val bytes = out.toByteArray
    val viaRow = decodeTo(outer, bytes)
    val viaExpr = Seq(Tuple1(bytes)).toDF("b")
      .select(ProtobufCodec.decode(outer, col("b")).as("p"))
      .collect().head.getStruct(0)
    assert(norm(viaExpr) == norm(viaRow))
    assert(viaExpr.getStruct(0).getSeq[Long](0) == Seq(1L, 2L, 3L))
    assert(viaExpr.getLong(1) == 7L)
    // packed form of the same repeated field: one length-delimited blob
    val packed = new java.io.ByteArrayOutputStream()
    def pv(o: java.io.ByteArrayOutputStream, v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { o.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      o.write(v.toInt)
    }
    val blob = new java.io.ByteArrayOutputStream()
    Seq(5L, 6L, 300L).foreach(pv(blob, _))
    pv(packed, (1L << 3) | 2); pv(packed, blob.size().toLong)
    blob.writeTo(packed)
    val packedRow = Seq(Tuple1(packed.toByteArray)).toDF("b")
      .select(ProtobufCodec.decode(inner, col("b")).as("p"))
      .collect().head.getStruct(0)
    assert(packedRow.getSeq[Long](0) == Seq(5L, 6L, 300L))
  }

  test("expression decode normalizes invalid UTF-8 like the Row walker") {
    // a PString whose payload is NOT valid UTF-8: the Row walker runs
    // it through `new String(bytes, UTF_8)` (U+FFFD substitution); the
    // expression must produce the SAME normalized string, not keep the
    // raw bytes verbatim (which would diverge on equality/grouping)
    val schema = ProtoSchema(Seq(ProtoField(1, "s", PString),
      ProtoField(2, "t", PVarint)))
    val out = new java.io.ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    // 0xC3 starts a 2-byte sequence but 0x28 can't continue it; a lone
    // 0xFF is never valid; trailing valid ASCII must survive
    val raw = Array[Byte]('a', 0xC3.toByte, 0x28, 0xFF.toByte, 'z')
    varint((1L << 3) | 2); varint(raw.length.toLong); out.write(raw)
    varint((2L << 3) | 0); varint(11)
    val bytes = out.toByteArray
    val viaRow = decodeTo(schema, bytes)
    val viaExpr = Seq(Tuple1(bytes)).toDF("b")
      .select(ProtobufCodec.decode(schema, col("b")).as("p"))
      .collect().head.getStruct(0)
    assert(viaExpr.getString(0) == viaRow.getString(0))
    assert(viaExpr.getString(0) ==
      new String(raw, java.nio.charset.StandardCharsets.UTF_8))
    assert(viaExpr.getLong(1) == 11L)
  }

  test("expression decode: sparse field numbers take the scan fallback") {
    // field number past the dense-dispatch cap (4096) — the compiled
    // kernel must fall back to the linear scan, same values out
    val schema = ProtoSchema(Seq(ProtoField(1, "a", PVarint),
      ProtoField(5000, "z", PString)))
    val row = sRow(schema, 3L, "far")
    val bytes = encodeTo(schema, row)
    val viaRow = decodeTo(schema, bytes)
    val viaExpr = Seq(Tuple1(bytes)).toDF("b")
      .select(ProtobufCodec.decode(schema, col("b")).as("p"))
      .collect().head.getStruct(0)
    assert(norm(viaExpr) == norm(viaRow))
    assert(viaExpr.getString(1) == "far")
  }

  test("expression decode nulls on malformed, expression encode skips null fields") {
    val schema = ProtoSchema(Seq(ProtoField(1, "a", PVarint),
      ProtoField(2, "s", PString)))
    val bad = Array[Byte](0x0A, 0x7F, 1) // length 127 bytes, only 1 present
    assert(Seq(Tuple1(bad)).toDF("b")
      .select(ProtobufCodec.decode(schema, col("b"))).collect().head.isNullAt(0))
    // null field skipped on the wire: encode {a: null, s: "x"}
    val df = Seq(Tuple1("x")).toDF("s")
      .select(struct(lit(null).cast("long").as("a"), col("s")).as("r"))
    val got = df.select(ProtobufCodec.encode(schema, col("r")))
      .collect().head.getAs[Array[Byte]](0)
    val expected = encodeTo(schema, sRow(schema, null, "x"))
    assert(java.util.Arrays.equals(got, expected))
  }
}
