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
      val rows = spark.sql(
        "SELECT name, kind, value_type, counter_value, gauge_value, " +
          "tags['env'] FROM dd_metrics").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          Option(r.get(3)), Option(r.get(4)), r.getString(5))).toSet
      assert(rows == Set(
        ("app.requests", "incremental", "counter", Some(5.0), None, "prod"),
        ("app.temp", "absolute", "gauge", None, Some(21.5), null),
        // rate scales by interval (2.5/s over 10s -> 25 counted)
        ("app.rps", "incremental", "counter", Some(25.0), None, null)))
      q.stop()
    } finally src.stop()
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
