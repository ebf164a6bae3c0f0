package graft.streaming

import graft.SparkSpec

/** splunk_hec / heroku_logs / aws_kinesis_firehose / datadog_agent push
  * sources — each test speaks the service's real request/response
  * contract against the ephemeral-port endpoint.
  */
class HttpPushSourcesSpec extends SparkSpec {

  private def post(url: String, body: String,
                   headers: Map[String, String] = Map.empty)
      : (Int, String) = {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    conn.getOutputStream.write(body.getBytes("UTF-8"))
    val code = conn.getResponseCode
    val stream = if (code < 400) conn.getInputStream else conn.getErrorStream
    val resp = new String(Option(stream).map(_.readAllBytes())
      .getOrElse(Array.emptyByteArray), "UTF-8")
    conn.disconnect()
    (code, resp)
  }

  test("splunk_hec source: concatenated event JSON, token auth, raw path") {
    val src = HttpPushSources.splunkHec(spark, validTokens = Seq("tok1"))
    try {
      val q = src.df.writeStream.format("memory").queryName("hec_src").start()
      val base = s"http://127.0.0.1:${src.boundPort}/services/collector"
      // no token → 401 with splunk's error shape
      val (unauth, err) = post(s"$base/event", """{"event":"x"}""")
      assert(unauth == 401 && err.contains("\"code\":3"))
      // two concatenated objects in one body (HEC batching)
      val (ok, resp) = post(s"$base/event",
        """{"event":"first msg","time":1700000000.5,"host":"h1","sourcetype":"app"}""" +
          """{"event":{"k":1},"index":"main"}""",
        Map("Authorization" -> "Splunk tok1"))
      assert(ok == 200 && resp == """{"text":"Success","code":0}""")
      val (okRaw, _) = post(s"$base/raw?channel=chanQ", "raw one\nraw two",
        Map("Authorization" -> "Splunk tok1"))
      assert(okRaw == 200)
      // channel via the header takes precedence (splunk_hec docs field)
      val (okCh, _) = post(s"$base/event", """{"event":"with chan"}""",
        Map("Authorization" -> "Splunk tok1",
          "X-Splunk-Request-Channel" -> "chanH"))
      assert(okCh == 200)
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT message, host, sourcetype, index, CAST(timestamp AS STRING), splunk_channel FROM hec_src")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getString(3), r.getString(4), r.getString(5))).toSet
      assert(rows.exists(r => r._1 == "first msg" && r._2 == "h1" &&
        r._3 == "app" && r._5 == "2023-11-14 22:13:20.5"))
      assert(rows.exists(r => r._1 == """{"k":1}""" && r._4 == "main"))
      assert(rows.exists(r => r._1 == "raw one" && r._6 == "chanQ"))
      assert(rows.exists(r => r._1 == "with chan" && r._6 == "chanH"))
      q.stop()
    } finally src.stop()
  }

  test("heroku_logs source: logplex lines parse; count header checked") {
    val src = HttpPushSources.herokuLogs(spark)
    try {
      val q = src.df.writeStream.format("memory").queryName("hk_src").start()
      val url = s"http://127.0.0.1:${src.boundPort}/events"
      val body =
        "83 <40>1 2023-11-14T22:13:20+00:00 host app web.1 - State changed from starting to up\n" +
          "119 <40>1 2023-11-14T22:13:21+00:00 host heroku router - at=info method=GET path=\"/\"\n" +
          "not a logplex line"
      val (code, _) = post(url, body, Map("Logplex-Msg-Count" -> "3"))
      assert(code == 200)
      // wrong declared count → 400
      assert(post(url, body, Map("Logplex-Msg-Count" -> "7"))._1 == 400)
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT app_name, proc_id, message FROM hk_src").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      assert(rows == Set(
        ("app", "web.1", "State changed from starting to up"),
        ("heroku", "router", "at=info method=GET path=\"/\""),
        (null, null, "not a logplex line")))
      q.stop()
    } finally src.stop()
  }

  test("aws_kinesis_firehose source: base64 + gzip records, access key") {
    val src = HttpPushSources.firehose(spark, accessKey = Some("secret"))
    try {
      val q = src.df.writeStream.format("memory").queryName("fh_src").start()
      val url = s"http://127.0.0.1:${src.boundPort}/"
      val b64 = java.util.Base64.getEncoder
      val plain = b64.encodeToString("line a\nline b".getBytes("UTF-8"))
      val gz = {
        val bos = new java.io.ByteArrayOutputStream()
        val g = new java.util.zip.GZIPOutputStream(bos)
        g.write("gzline".getBytes("UTF-8")); g.close()
        b64.encodeToString(bos.toByteArray)
      }
      val body =
        s"""{"requestId":"req-1","timestamp":1700000000000,
           |"records":[{"data":"$plain"},{"data":"$gz"}]}""".stripMargin
      // wrong key → 401
      assert(post(url, body,
        Map("X-Amz-Firehose-Access-Key" -> "nope"))._1 == 401)
      val (code, resp) = post(url, body,
        Map("X-Amz-Firehose-Access-Key" -> "secret",
          "X-Amz-Firehose-Source-Arn" ->
            "arn:aws:firehose:us-east-1:1:deliverystream/t"))
      assert(code == 200)
      assert(resp == """{"requestId":"req-1","timestamp":1700000000000}""")
      q.processAllAvailable()
      val rows = spark.sql("SELECT request_id, source_arn, message FROM fh_src")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
        .toSet
      val arn = "arn:aws:firehose:us-east-1:1:deliverystream/t"
      assert(rows == Set(("req-1", arn, "line a"), ("req-1", arn, "line b"),
        ("req-1", arn, "gzline")))
      q.stop()
    } finally src.stop()
  }

  test("datadog_agent source: v2 log array becomes typed events") {
    val src = HttpPushSources.datadogAgent(spark)
    try {
      val q = src.df.writeStream.format("memory").queryName("dd_src").start()
      val (code, resp) = post(
        s"http://127.0.0.1:${src.boundPort}/api/v2/logs",
        """[{"message":"m1","status":"info","timestamp":1700000000000,
          |"hostname":"h1","service":"svc","ddsource":"nginx",
          |"ddtags":"env:prod,team:a"},
          |{"message":"m2"}]""".stripMargin)
      assert(code == 200 && resp == "{}")
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT message, ddsource, service, ddtags FROM dd_src").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getString(3))).toSet
      assert(rows == Set(
        ("m1", "nginx", "svc", "env:prod,team:a"),
        ("m2", null, null, null)))
      q.stop()
    } finally src.stop()
  }

  test("datadog_agent parse_ddtags: the tag string becomes an array") {
    val src = HttpPushSources.datadogAgent(spark, parseDdtags = true)
    try {
      val q = src.df.writeStream.format("memory").queryName("dd_pt").start()
      val (code, _) = post(
        s"http://127.0.0.1:${src.boundPort}/api/v2/logs",
        """[{"message":"m1","ddtags":"env:prod,,team:a,bare"},
          |{"message":"m2","ddtags":""},
          |{"message":"m3"}]""".stripMargin)
      assert(code == 200)
      q.processAllAvailable()
      val rows = spark.sql("SELECT message, ddtags FROM dd_pt").collect()
        .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      // empty segments drop; empty/absent string -> empty array
      assert(rows("m1") == Seq("env:prod", "team:a", "bare"))
      assert(rows("m2") == Seq.empty)
      assert(rows("m3") == Seq.empty)
      q.stop()
    } finally src.stop()
  }

  test("datadog_agent /api/v1/series feeds the metrics output port") {
    val src = HttpPushSources.datadogAgent(spark)
    try {
      val q = src.metricsDf.writeStream.format("memory")
        .queryName("dd_metrics").start()
      val (code, _) = post(
        s"http://127.0.0.1:${src.boundPort}/api/v1/series",
        """{"series":[
          |{"metric":"app.requests","points":[[1700000000,5]],
          | "type":"count","tags":["env:prod"],"host":"h1"},
          |{"metric":"app.temp","points":[[1700000000,21.5]],
          | "type":"gauge","host":"h1"},
          |{"metric":"app.rps","points":[[1700000000,2.5]],
          | "type":"rate","interval":10,"host":"h1"}]}""".stripMargin)
      assert(code == 202)
      q.processAllAvailable()
      // split_metric_namespace (default true): names split at the
      // first '.' into namespace + name (metrics.rs:537-545)
      val rows = spark.sql(
        "SELECT namespace, name, kind, value_type, counter_value, " +
          "gauge_value, tags['env'], interval_ms FROM dd_metrics")
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getString(3), Option(r.get(4)), Option(r.get(5)),
          r.getString(6), Option(r.get(7)))).toSet
      assert(rows == Set(
        ("app", "requests", "incremental", "counter", Some(5.0), None,
          "prod", None),
        ("app", "temp", "absolute", "gauge", None, Some(21.5), null, None),
        // rate scales by interval (2.5/s over 10s -> 25 counted)
        ("app", "rps", "incremental", "counter", Some(25.0), None, null,
          Some(10000L))))
      q.stop()
    } finally src.stop()
  }

  private def sRow(schema: graft.codecs.ProtobufCodec.ProtoSchema,
                   vals: Any*): org.apache.spark.sql.Row =
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      vals.toArray, schema.sparkType)

  private def postBytes(url: String, body: Array[Byte],
                        headers: Map[String, String] = Map.empty): Int = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    conn.setDoOutput(true)
    conn.getOutputStream.write(body)
    val code = conn.getResponseCode
    conn.disconnect()
    code
  }

  test("datadog_agent /api/v2/series decodes protobuf MetricPayload") {
    import graft.streaming.DdAgentIntake._
    import graft.codecs.ProtobufCodec
    val src = HttpPushSources.datadogAgent(spark)
    try {
      val q = src.metricsDf.writeStream.format("memory")
        .queryName("dd_v2").start()
      // COUNT + RATE series with host/device resources and
      // source_type_name, built by the repo's own proto encoder
      val payload = ProtobufCodec.encodeTo(metricPayloadSchema,
        sRow(metricPayloadSchema, Seq(
          sRow(metricSeriesSchema,
            Seq(sRow(resourceSchema, "host", "h9"),
              sRow(resourceSchema, "device", "sda"),
              sRow(resourceSchema, "pod", "p1")),
            "system.cpu.user", Seq("env:prod"),
            Seq(sRow(metricPointSchema, 5.0, 1700000000L)),
            1L, "", "agent_check", 0L),
          sRow(metricSeriesSchema, null, "app.rps", null,
            Seq(sRow(metricPointSchema, 2.5, 1700000000L)),
            2L, "", "", 10L),
          sRow(metricSeriesSchema, null, "app.temp", null,
            Seq(sRow(metricPointSchema, 21.5, 1700000000L)),
            3L, "", "", 10L))))
      // gzip leg exercises the content-encoding path (mod.rs decode)
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(payload); gz.close()
      assert(postBytes(
        s"http://127.0.0.1:${src.boundPort}/api/v2/series",
        bos.toByteArray, Map("Content-Encoding" -> "gzip")) == 202)
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT namespace, name, kind, value_type, counter_value, " +
          "gauge_value, host, tags['device'], tags['resource.pod'], " +
          "tags['source_type_name'], interval_ms FROM dd_v2").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getString(3), Option(r.get(4)), Option(r.get(5)),
          r.getString(6), r.getString(7), r.getString(8),
          r.getString(9), Option(r.get(10)))).toSet
      assert(rows == Set(
        ("system", "cpu.user", "incremental", "counter", Some(5.0),
          None, "h9", "sda", "p1", "agent_check", None),
        // RATE scales by interval and records interval_ms
        ("app", "rps", "incremental", "counter", Some(25.0), None, null,
          null, null, null, Some(10000L)),
        // GAUGE keeps a positive interval as the non-rate interval
        ("app", "temp", "absolute", "gauge", None, Some(21.5), null,
          null, null, null, Some(10000L))))
      q.stop()
    } finally src.stop()
  }

  test("datadog_agent /api/beta/sketches decodes SketchPayload") {
    import graft.streaming.DdAgentIntake._
    import graft.codecs.ProtobufCodec
    val src = HttpPushSources.datadogAgent(spark)
    try {
      val q = src.metricsDf.writeStream.format("memory")
        .queryName("dd_sk").start()
      val payload = ProtobufCodec.encodeTo(sketchPayloadSchema,
        sRow(sketchPayloadSchema, Seq(
          sRow(sketchSchema, "request.duration", "h3",
            Seq("env:prod"), Seq(
              sRow(dogsketchSchema, 1700000000L, 6L, 0.5, 9.0, 3.5,
                21.0, Seq(-3L, 0L, 1338L), Seq(1L, 2L, 3L)))))))
      assert(postBytes(
        s"http://127.0.0.1:${src.boundPort}/api/beta/sketches",
        payload) == 202)
      q.processAllAvailable()
      val r = spark.sql(
        "SELECT namespace, name, value_type, kind, host, sketch.cnt, " +
          "sketch.min, sketch.max, sketch.sum, sketch.avg, sketch.k, " +
          "sketch.n FROM dd_sk").collect().head
      assert(r.getString(0) == "request" && r.getString(1) == "duration")
      assert(r.getString(2) == "sketch" && r.getString(3) == "incremental")
      assert(r.getString(4) == "h3")
      assert(r.getLong(5) == 6L && r.getDouble(6) == 0.5 &&
        r.getDouble(7) == 9.0 && r.getDouble(8) == 21.0 &&
        r.getDouble(9) == 3.5)
      // k is zigzag sint32 (negative survives), n plain varint
      assert(r.getSeq[Long](10) == Seq(-3L, 0L, 1338L))
      assert(r.getSeq[Long](11) == Seq(1L, 2L, 3L))
      q.stop()
    } finally src.stop()
  }

  test("datadog_agent /api/v0.2/traces decodes both payload forms") {
    import graft.streaming.DdAgentIntake._
    import graft.codecs.ProtobufCodec
    val src = HttpPushSources.datadogAgent(spark)
    try {
      val q = src.tracesDf.writeStream.format("memory")
        .queryName("dd_tr").start()
      def mkSpan(svc: String, op: String, traceId: Long, spanId: Long) =
        sRow(spanSchema, svc, op, "GET /x", traceId, spanId, 0L,
          1700000000000000000L, 250000L, 0L,
          Seq(sRow(graft.codecs.ProtobufCodec.ProtoSchema(Seq(
            graft.codecs.ProtobufCodec.ProtoField(1, "key",
              graft.codecs.ProtobufCodec.PString),
            graft.codecs.ProtobufCodec.ProtoField(2, "value",
              graft.codecs.ProtobufCodec.PString))), "http.method", "GET")),
          null, "web")
      // older form: traces + transactions, no tracerPayloads
      val v0 = ProtobufCodec.encodeTo(tracePayloadSchema,
        sRow(tracePayloadSchema, "host0", "prod",
          Seq(sRow(apiTraceSchema, 11L,
            Seq(mkSpan("svc-a", "op-a", 11L, 21L)),
            1700000000000000000L, 1700000001000000000L)),
          Seq(mkSpan("svc-b", "apm-tx", 12L, 22L)),
          null, null, "", null, null))
      assert(postBytes(
        s"http://127.0.0.1:${src.boundPort}/api/v0.2/traces", v0,
        Map("X-Datadog-Reported-Languages" -> "go")) == 200)
      // newer form: one tracerPayload with one chunk
      val strE = graft.codecs.ProtobufCodec.ProtoSchema(Seq(
        graft.codecs.ProtobufCodec.ProtoField(1, "key",
          graft.codecs.ProtobufCodec.PString),
        graft.codecs.ProtobufCodec.ProtoField(2, "value",
          graft.codecs.ProtobufCodec.PString)))
      val v1 = ProtobufCodec.encodeTo(tracePayloadSchema,
        sRow(tracePayloadSchema, "host1", "stage", null, null,
          Seq(sRow(tracerPayloadSchema, "cid-1", "rust", "1.70",
            "0.4", "rt-1",
            Seq(sRow(traceChunkSchema, 2L, "rum",
              Seq(mkSpan("svc-c", "op-c", 13L, 23L)),
              Seq(sRow(strE, "chunk_tag", "cv")), 0L)),
            Seq(sRow(strE, "payload_tag", "pv")), "stage", "host1",
            "9.9")),
          Seq(sRow(strE, "top_tag", "tv")), "7.50.3", 10.0, 2.0))
      assert(postBytes(
        s"http://127.0.0.1:${src.boundPort}/api/v0.2/traces", v1) == 200)
      // stats endpoint: accepted and discarded
      assert(postBytes(
        s"http://127.0.0.1:${src.boundPort}/api/v0.2/stats",
        Array[Byte](1, 2, 3)) == 200)
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT payload_version, host, env, dropped, language_name, " +
          "origin, priority, tags, spans, source_type FROM dd_tr")
        .collect()
      assert(rows.forall(_.getString(9) == "datadog_agent"))
      val byVer = rows.groupBy(_.getString(0))
      // v1: one trace event + one dropped transaction event
      assert(byVer("v1").length == 2)
      val tx = byVer("v1").find(r => !r.isNullAt(3)).get
      assert(tx.getBoolean(3) && tx.getString(4) == "go")
      val tr = byVer("v1").find(_.isNullAt(3)).get
      val sp0 = tr.getSeq[org.apache.spark.sql.Row](8).head
      assert(sp0.getAs[String]("service") == "svc-a")
      assert(sp0.getAs[Map[String, String]]("meta")("http.method") == "GET")
      assert(sp0.getAs[String]("span_type") == "web")
      // v2: chunk ∪ tracer ∪ payload tags, chunk fields
      val v2r = byVer("v2").head
      assert(v2r.getString(5) == "rum" && v2r.getLong(6) == 2L)
      val tags = v2r.getAs[Map[String, String]](7)
      assert(tags == Map("chunk_tag" -> "cv", "payload_tag" -> "pv",
        "top_tag" -> "tv"))
      assert(v2r.getString(4) == "rust")
      q.stop()
    } finally src.stop()
  }

  test("splunk_hec indexer acks: ackId round-trip, read-once, channel gate") {
    val src = HttpPushSources.splunkHec(spark, acknowledgements = true)
    try {
      val url = s"http://127.0.0.1:${src.boundPort}/services/collector"
      // acks enabled: the data channel is REQUIRED
      assert(post(s"$url/event", """{"event":"no channel"}""")._1 == 400)
      val ch = Map("X-Splunk-Request-Channel" -> "chan-1")
      // per-channel ackIds count up from 0
      val (c0, b0) = post(s"$url/event", """{"event":"e0"}""", ch)
      val (c1, b1) = post(s"$url/event", """{"event":"e1"}""", ch)
      assert(c0 == 200 && b0 == """{"text":"Success","code":0,"ackId":0}""")
      assert(c1 == 200 && b1 == """{"text":"Success","code":0,"ackId":1}""")
      // a second channel starts its own counter
      val other = Map("X-Splunk-Request-Channel" -> "chan-2")
      assert(post(s"$url/raw", "raw line", other)._2.endsWith(""""ackId":0}"""))
      // status query: delivered ids true, unknown false
      val (ac, ab) = post(s"$url/ack", """{"acks":[0,1,7]}""", ch)
      assert(ac == 200)
      assert(ab == """{"acks":{"0":true,"1":true,"7":false}}""")
      // read-once (acknowledgements.rs get_acks_status removes on read)
      assert(post(s"$url/ack", """{"acks":[0,1]}""", ch)._2 ==
        """{"acks":{"0":false,"1":false}}""")
    } finally src.stop()
  }

  test("splunk_hec without acks: ack endpoint reports disabled") {
    val src = HttpPushSources.splunkHec(spark)
    try {
      val (code, body) = post(
        s"http://127.0.0.1:${src.boundPort}/services/collector/ack",
        """{"acks":[0]}""",
        Map("X-Splunk-Request-Channel" -> "c"))
      assert(code == 400)
      assert(body == """{"text":"Ack is disabled","code":14}""")
    } finally src.stop()
  }

  test("datadog_agent YAML: .metrics and .traces ports feed sinks") {
    import graft.streaming.DdAgentIntake._
    import graft.codecs.ProtobufCodec
    val work = java.nio.file.Files.createTempDirectory("ddw").toString
    val running = graft.plans.ConfigLoader.run(spark,
      """
        |sources:
        |  agent: {type: datadog_agent, address: "0.0.0.0:0",
        |          multiple_outputs: true}
        |sinks:
        |  m_out: {type: memory, inputs: [agent.metrics]}
        |  t_out: {type: memory, inputs: [agent.traces]}
        |""".stripMargin, "/root/testdata/sf0.001", work)
    try {
      val port = graft.plans.ConfigLoader.lastAgentPort
      val series = ProtobufCodec.encodeTo(metricPayloadSchema,
        sRow(metricPayloadSchema, Seq(
          sRow(metricSeriesSchema, null, "svc.reqs", null,
            Seq(sRow(metricPointSchema, 4.0, 1700000000L)), 1L, "", "",
            0L))))
      assert(postBytes(
        s"http://127.0.0.1:$port/api/v2/series", series) == 202)
      val traces = ProtobufCodec.encodeTo(tracePayloadSchema,
        sRow(tracePayloadSchema, "h1", "prod",
          Seq(sRow(apiTraceSchema, 5L,
            Seq(sRow(spanSchema, "s", "o", "r", 5L, 6L, 0L, 1L, 2L, 0L,
              null, null, "web")),
            1L, 2L)),
          null, null, null, "", null, null))
      assert(postBytes(
        s"http://127.0.0.1:$port/api/v0.2/traces", traces) == 200)
      running.processAllAvailable()
      val m = spark.sql(
        "SELECT namespace, name, counter_value FROM m_out").collect()
      assert(m.exists(r => r.getString(0) == "svc" &&
        r.getString(1) == "reqs" && r.getDouble(2) == 4.0))
      val t = spark.sql(
        "SELECT payload_version, host, spans[0].service FROM t_out")
        .collect()
      assert(t.exists(r => r.getString(0) == "v1" &&
        r.getString(1) == "h1" && r.getString(2) == "s"))
    } finally running.stopAll()
  }

  test("splunk_hec source wires up from YAML with a token") {
    val work = java.nio.file.Files.createTempDirectory("hecw").toString
    val running = graft.plans.ConfigLoader.run(spark,
      """
        |sources:
        |  hec: {type: splunk_hec, address: "0.0.0.0:0", token: t0k}
        |sinks:
        |  hec_out: {type: memory, inputs: [hec]}
        |""".stripMargin, "/root/testdata/sf0.001", work)
    try {
      val port = graft.plans.ConfigLoader.lastAgentPort
      val (code, _) = post(
        s"http://127.0.0.1:$port/services/collector/event",
        """{"event":"from yaml"}""", Map("Authorization" -> "Splunk t0k"))
      assert(code == 200)
      running.processAllAvailable()
      val got = spark.sql("SELECT message FROM hec_out").collect()
        .map(_.getString(0))
      assert(got.contains("from yaml"))
    } finally running.stopAll()
  }
}
