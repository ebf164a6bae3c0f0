package graft.codecs

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The `native` codec (lib/vector-core/proto/event.proto): EventWrapper
  * log arm with the recursive Value tree — scalar kinds, nested
  * maps/arrays, negative int64 varints, timestamps, both map-at-1 and
  * value-at-2 Log layouts, and the encode→decode roundtrip through the
  * YAML surface.
  */
class NativeCodecSpec extends SparkSpec {
  import spark.implicits._

  test("encode/decode roundtrip over a nested heterogeneous event") {
    val json =
      """{"msg":"hello","n":-42,"pi":3.25,"ok":true,"none":null,""" +
        """"tags":["a","b",7],"inner":{"deep":{"x":1}}}"""
    val bytes = NativeCodec.encodeWrapper(json)
    val (kind, back) = NativeCodec.decodeWrapper(bytes)
    assert(kind == "log")
    val m = graft.functions.JsonLite.parse(back)
      .asInstanceOf[java.util.Map[String, Any]]
    assert(m.get("msg") == "hello")
    assert(m.get("n") == java.lang.Long.valueOf(-42L))
    assert(m.get("pi") == java.lang.Double.valueOf(3.25))
    assert(m.get("ok") == java.lang.Boolean.TRUE)
    assert(m.containsKey("none") && m.get("none") == null)
    assert(m.get("tags").asInstanceOf[java.util.List[Any]].get(2) == 7L)
    assert(m.get("inner").asInstanceOf[java.util.Map[String, Any]]
      .get("deep").asInstanceOf[java.util.Map[String, Any]].get("x") == 1L)
  }

  test("timestamp Values decode to RFC3339 strings") {
    // hand-build EventWrapper{ log { fields { "ts": Value{timestamp} }}}
    val out = new java.io.ByteArrayOutputStream()
    def vint(o: java.io.ByteArrayOutputStream, v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { o.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      o.write(v.toInt)
    }
    def ld(o: java.io.ByteArrayOutputStream, no: Int, p: Array[Byte]): Unit = {
      vint(o, (no.toLong << 3) | 2); vint(o, p.length.toLong); o.write(p)
    }
    val ts = new java.io.ByteArrayOutputStream() // Timestamp{seconds, nanos}
    vint(ts, (1L << 3) | 0); vint(ts, 1700000000L)
    vint(ts, (2L << 3) | 0); vint(ts, 500000000L)
    val value = new java.io.ByteArrayOutputStream()
    ld(value, 2, ts.toByteArray)
    val entry = new java.io.ByteArrayOutputStream()
    ld(entry, 1, "ts".getBytes("UTF-8")); ld(entry, 2, value.toByteArray)
    val log = new java.io.ByteArrayOutputStream()
    ld(log, 1, entry.toByteArray)
    ld(out, 1, log.toByteArray)
    val (kind, json) = NativeCodec.decodeWrapper(out.toByteArray)
    assert(kind == "log")
    assert(json.contains("\"ts\":\"2023-11-14T22:13:20.500Z\""), json)
  }

  test("length_delimited framing roundtrips native frames") {
    val df = Seq((1L, "one"), (2L, "two")).toDF("id", "name")
    // encode two native frames, length_delimited-pack them into a chunk
    val frames = df.collect().map { r =>
      NativeCodec.encodeWrapper(
        s"""{"id": ${r.getLong(0)}, "name": "${r.getString(1)}"}""")
    }
    val chunk = frames.flatMap(f =>
      graft.sinks.LineCodec.frameBytes(f, "length_delimited",
        Array.emptyByteArray)).toArray
    val back = graft.plans.ConfigLoader.applyDecoding(
      Seq(java.util.Base64.getEncoder.encodeToString(chunk)).toDF("message"),
      Map("framing" -> java.util.Map.of("method", "length_delimited"),
        "decoding" -> java.util.Map.of("codec", "native")))
      .select(get_json_object(col("message"), "$.name").as("n"))
      .orderBy("n").as[String].collect()
    assert(back.toSeq == Seq("one", "two"))
  }

  test("chunked_gelf framing reassembles through the YAML dispatch") {
    // two GELF messages, 3 and 2 chunks, shuffled arrival order
    val payloads = Seq((77L, """{"short_message":"first","host":"a"}""", 3),
      (88L, """{"short_message":"second","host":"b"}""", 2))
    val chunks = payloads.toDF("id", "payload", "n")
      .select(explode(Framing.gelfChunksOf(col("id"), col("payload"),
        col("n"))).as("c"))
      .select(base64(col("c")).as("message"))
      .orderBy(rand(7))
    val out = graft.plans.ConfigLoader.applyDecoding(chunks,
      Map("framing" -> java.util.Map.of("method", "chunked_gelf"),
        "decoding" -> java.util.Map.of("codec", "gelf")))
      .select(col("short_message")).orderBy("short_message")
      .as[String].collect()
    assert(out.toSeq == Seq("first", "second"))
  }

  test("otlp decoder: LogRecords explode through the YAML dispatch") {
    import org.apache.spark.sql.Row
    import ProtobufCodec.Otlp
    def lr(ns: Long, sev: String, body: String) = Row(ns, 9L, sev,
      Row(body), 0L, Array.emptyByteArray, Array.emptyByteArray, ns)
    val envelope = Row(Seq(Row(Seq(Row(Seq(
      lr(1700000000000000000L, "INFO", "hello"),
      lr(1700000001000000000L, "WARN", "there")), "s")), "r")))
    val st = Otlp.ExportLogsServiceRequest.sparkType
    val df = spark.createDataFrame(
      java.util.List.of(Row(envelope)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("r", st))))
      .select(ProtobufCodec.encode(Otlp.ExportLogsServiceRequest, col("r"))
        .as("value"))
    val out = graft.plans.ConfigLoader.applyDecoding(df,
      Map("decoding" -> java.util.Map.of("codec", "otlp")))
      .select(col("message"), col("severity_text")).orderBy("message")
      .collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("hello", "INFO"), ("there", "WARN")))
  }

  test("otlp encoder -> otlp decoder closes the loop") {
    val df = Seq(("hello otlp", "warn")).toDF("message", "level")
      .withColumn("timestamp", lit("2024-03-05T10:00:00Z").cast("timestamp"))
    val encoded = df.select(graft.sinks.LineCodec
      .encodeLine(df, "otlp", Map.empty).as("value"))
    val back = graft.plans.ConfigLoader.applyDecoding(encoded,
      Map("decoding" -> java.util.Map.of("codec", "otlp"))).head()
    assert(back.getAs[String]("message") == "hello otlp")
    assert(back.getAs[String]("severity_text") == "warn")
    assert(back.getAs[java.sql.Timestamp]("timestamp").toInstant
      == java.time.Instant.parse("2024-03-05T10:00:00Z"))
  }

  test("otlp decoder: metrics and traces signals flatten too") {
    import org.apache.spark.sql.Row
    import ProtobufCodec.Otlp
    // metrics: a gauge with one data point (rows follow sparkType order)
    val point = Row(1700000000000000000L, 1700000000000000000L, 2.5, null,
      Seq(Row("az", Row("a"))))
    val metric = Row("cpu", "", "pct", Row(Seq(point)), null)
    val mEnv = Row(Seq(Row(Seq(Row(Seq(metric), "")), "")))
    val mdf = spark.createDataFrame(
      java.util.List.of(Row(mEnv)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("r",
          Otlp.ExportMetricsServiceRequest.sparkType))))
      .select(ProtobufCodec.encode(Otlp.ExportMetricsServiceRequest,
        col("r")).as("value"))
    val mOut = graft.plans.ConfigLoader.applyDecoding(mdf,
      Map("decoding" -> java.util.Map.of("codec", "otlp",
        "otlp", java.util.Map.of("signal", "metrics")))).head()
    assert(mOut.getAs[String]("name") == "cpu")
    assert(mOut.getAs[Double]("gauge_value") == 2.5)
    assert(mOut.getAs[Map[String, String]]("tags") == Map("az" -> "a"))
  }

  test("yaml surface: sink-side native encode feeds source-side decode") {
    val df = Seq((1L, "alpha", 0.5), (2L, "beta", 1.5))
      .toDF("id", "name", "score")
    val encoded = df.select(
      graft.sinks.LineCodec.encodeLine(df, "native", Map.empty).as("value"))
    val back = graft.plans.ConfigLoader.applyDecoding(encoded,
      Map("decoding" -> java.util.Map.of("codec", "native")))
    val rows = back.select(
        get_json_object(col("message"), "$.id").cast("long").as("id"),
        get_json_object(col("message"), "$.name").as("name"),
        col("__event_kind"))
      .orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq == Seq((1L, "alpha", "log"), (2L, "beta", "log")))
  }
}
