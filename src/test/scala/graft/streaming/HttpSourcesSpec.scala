package graft.streaming

import graft.SparkSpec

/** http_server / http_client / prometheus-scrape source shapes: real
  * JDK HTTP endpoints on ephemeral ports, streamed through
  * MemoryStream-backed sources.
  */
class HttpSourcesSpec extends SparkSpec {

  test("http_server source ingests posted newline-framed bodies") {
    val src = StreamRunner.httpServer(spark)
    try {
      val q = src.df.writeStream.format("memory")
        .queryName("http_in").start()
      val url = new java.net.URL(
        s"http://127.0.0.1:${src.boundPort}/")
      def post(body: String): Unit = {
        val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        conn.getOutputStream.write(body.getBytes("UTF-8"))
        assert(conn.getResponseCode == 200)
        conn.disconnect()
      }
      post("line one\nline two\n")
      post("line three")
      q.processAllAvailable()
      val rows = spark.sql("SELECT message FROM http_in")
        .collect().map(_.getString(0)).toSet
      assert(rows == Set("line one", "line two", "line three"))
      q.stop()
    } finally src.stop()
  }

  test("http_client poll + prometheus scrape decode") {
    // tiny exposition endpoint
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    server.createContext("/metrics", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = ("# HELP up is up\n" +
        "up{job=\"graft\"} 1\n" +
        "req_total{job=\"graft\",code=\"200\"} 42 1700000000000\n" +
        "temp_c -2.5e-3\n").getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    try {
      val src = StreamRunner.httpClient(spark,
        s"http://127.0.0.1:${server.getAddress.getPort}/metrics")
      val q = StreamRunner.prometheusScrape(src).writeStream
        .format("memory").queryName("prom_in").start()
      src.pollOnce()
      q.processAllAvailable()
      val rows = spark.sql("SELECT name, value FROM prom_in").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(rows == Map("up" -> 1.0, "req_total" -> 42.0, "temp_c" -> -0.0025))
      q.stop()
    } finally server.stop(0)
  }

  test("opentelemetry OTLP/HTTP source decodes posted export envelopes") {
    import org.apache.spark.sql.functions._
    import graft.codecs.ProtobufCodec
    import graft.codecs.ProtobufCodec.Otlp
    import spark.implicits._
    val src = StreamRunner.otlpHttp(spark)
    try {
      val q = src.df.writeStream.format("memory")
        .queryName("otlp_in").start()
      // one envelope, two LogRecords, built through the same proto
      // writer the codec roundtrip query uses
      val rec1 = struct(
        lit(1700000000000000000L).as("time_unix_nano"),
        lit(9L).as("severity_number"),
        lit("INFO").as("severity_text"),
        struct(lit("hello otlp").as("string_value")).as("body"),
        lit(null).cast("long").as("dropped_attributes_count"),
        unhex(lit("0a0b0c")).as("trace_id"),
        unhex(lit("ff01")).as("span_id"),
        lit(1700000000500000000L).as("observed_time_unix_nano"))
      val rec2 = struct(
        lit(1700000001000000000L).as("time_unix_nano"),
        lit(17L).as("severity_number"),
        lit("ERROR").as("severity_text"),
        struct(lit("boom").as("string_value")).as("body"),
        lit(3L).as("dropped_attributes_count"),
        lit(null).cast("binary").as("trace_id"),
        lit(null).cast("binary").as("span_id"),
        lit(null).cast("long").as("observed_time_unix_nano"))
      val envelope = struct(array(struct(
        array(struct(
          array(rec1, rec2).as("log_records"),
          lit("scope-url").as("schema_url"))).as("scope_logs"),
        lit("res-url").as("schema_url"))).as("resource_logs"))
      val bytes = Seq(1).toDF("x")
        .select(ProtobufCodec.encode(
          Otlp.ExportLogsServiceRequest, envelope).as("b"))
        .head().getAs[Array[Byte]]("b")

      val conn = new java.net.URL(
        s"http://127.0.0.1:${src.boundPort}/v1/logs")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setRequestProperty("Content-Type", "application/x-protobuf")
      conn.setDoOutput(true)
      conn.getOutputStream.write(bytes)
      assert(conn.getResponseCode == 200)
      conn.disconnect()

      q.processAllAvailable()
      val rows = spark.table("otlp_in").orderBy("severity_number").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[String]("message") == "hello otlp")
      assert(rows(0).getAs[String]("trace_id") == "0a0b0c")
      assert(rows(0).getAs[String]("span_id") == "ff01")
      assert(rows(0).getAs[java.sql.Timestamp]("timestamp").toInstant
        .toString == "2023-11-14T22:13:20Z")
      assert(rows(0).getAs[java.sql.Timestamp]("observed_timestamp")
        .toInstant.toString == "2023-11-14T22:13:20.500Z")
      assert(rows(1).getAs[String]("severity_text") == "ERROR")
      assert(rows(1).getAs[Long]("dropped_attributes_count") == 3L)
      assert(rows(1).isNullAt(rows(1).fieldIndex("trace_id")))
      q.stop()
    } finally src.stop()
  }

  test("OTLP /v1/metrics: gauge and sum data points become metric rows") {
    import org.apache.spark.sql.functions._
    import graft.codecs.ProtobufCodec
    import graft.codecs.ProtobufCodec.Otlp
    import spark.implicits._
    val src = StreamRunner.otlpHttp(spark)
    try {
      val q = src.dfMetrics.writeStream.format("memory")
        .queryName("otlp_m").start()
      def kv(k: String, v: String) = struct(lit(k).as("key"),
        struct(lit(v).as("string_value")).as("value"))
      def point(tns: Long, d: java.lang.Double, i: java.lang.Long) = struct(
        lit(null).cast("long").as("start_time_unix_nano"),
        lit(tns).as("time_unix_nano"),
        (if (d == null) lit(null).cast("double") else lit(d.doubleValue()))
          .as("as_double"),
        (if (i == null) lit(null).cast("long") else lit(i.longValue()))
          .as("as_int"),
        array(kv("env", "prod")).as("attributes"))
      val gaugeMetric = struct(
        lit("cpu_temp").as("name"), lit("").as("description"),
        lit("C").as("unit"),
        struct(array(point(1700000000000000000L, 41.5, null))
          .as("data_points")).as("gauge"),
        lit(null).cast(Otlp.OtlpSum.sparkType).as("sum"))
      val sumMetric = struct(
        lit("requests").as("name"), lit("").as("description"),
        lit("1").as("unit"),
        lit(null).cast(Otlp.OtlpGauge.sparkType).as("gauge"),
        struct(array(point(1700000000000000000L, null, 7L))
            .as("data_points"),
          lit(1L).as("aggregation_temporality"), // DELTA
          lit(1L).as("is_monotonic")).as("sum"))
      val envelope = struct(array(struct(
        array(struct(array(gaugeMetric, sumMetric).as("metrics"),
          lit("").as("schema_url"))).as("scope_metrics"),
        lit("").as("schema_url"))).as("resource_metrics"))
      val bytes = Seq(1).toDF("x").select(ProtobufCodec.encode(
          Otlp.ExportMetricsServiceRequest, envelope).as("b"))
        .head().getAs[Array[Byte]]("b")
      val conn = new java.net.URL(
        s"http://127.0.0.1:${src.boundPort}/v1/metrics")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.getOutputStream.write(bytes)
      assert(conn.getResponseCode == 200)
      conn.disconnect()
      q.processAllAvailable()
      val rows = spark.table("otlp_m").collect()
        .map(r => r.getAs[String]("name") -> r).toMap
      assert(rows.size == 2)
      val g = rows("cpu_temp")
      assert(g.getAs[String]("value_type") == "gauge")
      assert(g.getAs[String]("kind") == "absolute")
      assert(g.getAs[Double]("gauge_value") == 41.5)
      assert(g.getAs[Map[String, String]]("tags")("env") == "prod")
      val c = rows("requests")
      assert(c.getAs[String]("value_type") == "counter")
      assert(c.getAs[String]("kind") == "incremental") // delta temporality
      assert(c.getAs[Double]("counter_value") == 7.0)  // as_int path
      q.stop()
    } finally src.stop()
  }

  test("OTLP /v1/traces: spans become trace events with duration") {
    import org.apache.spark.sql.functions._
    import graft.codecs.ProtobufCodec
    import graft.codecs.ProtobufCodec.Otlp
    import spark.implicits._
    val src = StreamRunner.otlpHttp(spark)
    try {
      val q = src.dfTraces.writeStream.format("memory")
        .queryName("otlp_t").start()
      val span = struct(
        unhex(lit("0102030405060708090a0b0c0d0e0f10")).as("trace_id"),
        unhex(lit("0102030405060708")).as("span_id"),
        lit("").as("trace_state"),
        lit(null).cast("binary").as("parent_span_id"),
        lit("GET /api").as("name"),
        lit(2L).as("kind"), // SERVER
        lit(1700000000000000000L).as("start_time_unix_nano"),
        lit(1700000000250000000L).as("end_time_unix_nano"),
        array(struct(lit("http.method").as("key"),
          struct(lit("GET").as("string_value")).as("value")))
          .as("attributes"))
      val envelope = struct(array(struct(
        array(struct(array(span).as("spans"),
          lit("").as("schema_url"))).as("scope_spans"),
        lit("").as("schema_url"))).as("resource_spans"))
      val bytes = Seq(1).toDF("x").select(ProtobufCodec.encode(
          Otlp.ExportTraceServiceRequest, envelope).as("b"))
        .head().getAs[Array[Byte]]("b")
      val conn = new java.net.URL(
        s"http://127.0.0.1:${src.boundPort}/v1/traces")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.getOutputStream.write(bytes)
      assert(conn.getResponseCode == 200)
      conn.disconnect()
      q.processAllAvailable()
      val rows = spark.table("otlp_t").collect()
      assert(rows.length == 1)
      val r = rows(0)
      assert(r.getAs[String]("trace_id") ==
        "0102030405060708090a0b0c0d0e0f10")
      assert(r.getAs[String]("name") == "GET /api")
      assert(r.getAs[Long]("duration_ms") == 250L)
      assert(r.getAs[Map[String, String]]("attributes")("http.method")
        == "GET")
      assert(r.isNullAt(r.fieldIndex("parent_span_id")))
      q.stop()
    } finally src.stop()
  }
}
