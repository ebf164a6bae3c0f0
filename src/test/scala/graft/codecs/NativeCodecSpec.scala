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

  test("metric arm decodes the REAL Metric schema (event.proto Metric)") {
    // A real vector agent's metric: name=1 is a plain string (NOT a
    // map entry) — hand-build EventWrapper{ metric { name, timestamp,
    // tags_v1, kind=Absolute, counter, namespace } } and decode.
    def vint(o: java.io.ByteArrayOutputStream, v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { o.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      o.write(v.toInt)
    }
    def ld(o: java.io.ByteArrayOutputStream, no: Int, p: Array[Byte]): Unit = {
      vint(o, (no.toLong << 3) | 2); vint(o, p.length.toLong); o.write(p)
    }
    def dbl(o: java.io.ByteArrayOutputStream, no: Int, d: Double): Unit = {
      vint(o, (no.toLong << 3) | 1)
      var x = java.lang.Double.doubleToLongBits(d)
      (0 until 8).foreach { _ => o.write((x & 0xFF).toInt); x >>>= 8 }
    }
    val metric = new java.io.ByteArrayOutputStream()
    ld(metric, 1, "requests_total".getBytes("UTF-8"))
    val ts = new java.io.ByteArrayOutputStream()
    vint(ts, (1L << 3) | 0); vint(ts, 1700000000L)
    ld(metric, 2, ts.toByteArray)
    val tag = new java.io.ByteArrayOutputStream()
    ld(tag, 1, "host".getBytes("UTF-8"))
    ld(tag, 2, "web-1".getBytes("UTF-8"))
    ld(metric, 3, tag.toByteArray)
    vint(metric, (4L << 3) | 0); vint(metric, 1L) // kind = Absolute
    val counter = new java.io.ByteArrayOutputStream()
    dbl(counter, 1, 42.5)
    ld(metric, 5, counter.toByteArray)
    ld(metric, 11, "app".getBytes("UTF-8"))
    val wrapper = new java.io.ByteArrayOutputStream()
    ld(wrapper, 2, metric.toByteArray)
    val (kind, json) = NativeCodec.decodeWrapper(wrapper.toByteArray)
    assert(kind == "metric")
    val m = graft.functions.JsonLite.parse(json)
      .asInstanceOf[java.util.Map[String, Any]]
    assert(m.get("name") == "requests_total", json)
    assert(m.get("kind") == "absolute", json)
    assert(m.get("namespace") == "app", json)
    assert(m.get("timestamp") == "2023-11-14T22:13:20Z", json)
    assert(m.get("counter").asInstanceOf[java.util.Map[String, Any]]
      .get("value") == java.lang.Double.valueOf(42.5), json)
    assert(m.get("tags").asInstanceOf[java.util.Map[String, Any]]
      .get("host") == "web-1", json)
  }

  test("metric arm: distribution, histogram, summary, set, sketch") {
    def vint(o: java.io.ByteArrayOutputStream, v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { o.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      o.write(v.toInt)
    }
    def ld(o: java.io.ByteArrayOutputStream, no: Int, p: Array[Byte]): Unit = {
      vint(o, (no.toLong << 3) | 2); vint(o, p.length.toLong); o.write(p)
    }
    def dbl(o: java.io.ByteArrayOutputStream, no: Int, d: Double): Unit = {
      vint(o, (no.toLong << 3) | 1)
      var x = java.lang.Double.doubleToLongBits(d)
      (0 until 8).foreach { _ => o.write((x & 0xFF).toInt); x >>>= 8 }
    }
    def metricWrapper(body: java.io.ByteArrayOutputStream => Unit): String = {
      val metric = new java.io.ByteArrayOutputStream()
      ld(metric, 1, "m".getBytes("UTF-8"))
      body(metric)
      val w = new java.io.ByteArrayOutputStream()
      ld(w, 2, metric.toByteArray)
      val (kind, json) = NativeCodec.decodeWrapper(w.toByteArray)
      assert(kind == "metric"); json
    }
    // Distribution2 { samples { value=1.5 rate=3 }, statistic=summary }
    val dist = metricWrapper { m =>
      val sample = new java.io.ByteArrayOutputStream()
      dbl(sample, 1, 1.5); vint(sample, (2L << 3) | 0); vint(sample, 3L)
      val d = new java.io.ByteArrayOutputStream()
      ld(d, 1, sample.toByteArray)
      vint(d, (2L << 3) | 0); vint(d, 1L)
      ld(m, 12, d.toByteArray)
    }
    assert(dist.contains("\"distribution\""), dist)
    assert(dist.contains("\"value\":1.5") && dist.contains("\"rate\":3"), dist)
    assert(dist.contains("\"statistic\":\"summary\""), dist)
    // AggregatedHistogram3 { buckets { upper_limit=0.5 count=7 },
    // count=7, sum=2.25 }
    val hist = metricWrapper { m =>
      val bucket = new java.io.ByteArrayOutputStream()
      dbl(bucket, 1, 0.5); vint(bucket, (2L << 3) | 0); vint(bucket, 7L)
      val h = new java.io.ByteArrayOutputStream()
      ld(h, 1, bucket.toByteArray)
      vint(h, (2L << 3) | 0); vint(h, 7L)
      dbl(h, 3, 2.25)
      ld(m, 16, h.toByteArray)
    }
    assert(hist.contains("\"aggregated_histogram\""), hist)
    assert(hist.contains("\"upper_limit\":0.5") &&
      hist.contains("\"count\":7") && hist.contains("\"sum\":2.25"), hist)
    // AggregatedSummary3 { quantiles { quantile=0.99 value=9.5 } }
    val summ = metricWrapper { m =>
      val q = new java.io.ByteArrayOutputStream()
      dbl(q, 1, 0.99); dbl(q, 2, 9.5)
      val s = new java.io.ByteArrayOutputStream()
      ld(s, 1, q.toByteArray)
      vint(s, (2L << 3) | 0); vint(s, 1L)
      dbl(s, 3, 9.5)
      ld(m, 17, s.toByteArray)
    }
    assert(summ.contains("\"aggregated_summary\""), summ)
    assert(summ.contains("\"quantile\":0.99") &&
      summ.contains("\"value\":9.5"), summ)
    // Set { values = ["a", "b"] }
    val set = metricWrapper { m =>
      val s = new java.io.ByteArrayOutputStream()
      ld(s, 1, "a".getBytes("UTF-8")); ld(s, 1, "b".getBytes("UTF-8"))
      ld(m, 7, s.toByteArray)
    }
    assert(set.contains("\"set\":{\"values\":[\"a\",\"b\"]}"), set)
    // Sketch { AgentDDSketch { count=2, k=[-1,1] zigzag packed, n=[1,1] } }
    val sk = metricWrapper { m =>
      val a = new java.io.ByteArrayOutputStream()
      vint(a, (1L << 3) | 0); vint(a, 2L)
      val ks = new java.io.ByteArrayOutputStream()
      vint(ks, 1L); vint(ks, 2L) // zigzag(-1)=1, zigzag(1)=2
      ld(a, 6, ks.toByteArray)
      val ns = new java.io.ByteArrayOutputStream()
      vint(ns, 1L); vint(ns, 1L)
      ld(a, 7, ns.toByteArray)
      val s = new java.io.ByteArrayOutputStream()
      ld(s, 1, a.toByteArray)
      ld(m, 15, s.toByteArray)
    }
    assert(sk.contains("\"AgentDDSketch\""), sk)
    assert(sk.contains("\"k\":[-1,1]") && sk.contains("\"n\":[1,1]"), sk)
  }

  test("one malformed wrapper does not poison a PushEvents batch") {
    // truncated metric bytes decode to an exception inside
    // decodeWrapper; VectorPushSource guards per-wrapper, so the valid
    // log in the same request survives (ADVICE r9)
    val bad = Array[Byte](0x12, 0x05, 0x0A, 0x7F, 0x7F) // metric, garbage
    intercept[Exception] { NativeCodec.decodeWrapper(bad) }
  }
}
