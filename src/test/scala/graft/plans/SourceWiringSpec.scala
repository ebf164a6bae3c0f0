package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** YAML wiring for the formerly code-only sources (http_server,
  * http_client, prometheus scrape, stdin, exec, syslog, statsd —
  * reference config types src/sources/http_server.rs, http_client/,
  * prometheus/scrape.rs, stdin.rs, exec/, syslog.rs, statsd/), the
  * generic `decoding:`/`framing:` source blocks
  * (lib/codecs/src/decoding/mod.rs), and the loader-registry parity
  * that keeps `vector list` honest.
  */
class SourceWiringSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def eventually[T](deadlineMs: Long = 30000)(f: => T): T = {
    val end = System.nanoTime + deadlineMs * 1000000L
    var last: Throwable = null
    while (System.nanoTime < end) {
      try return f
      catch { case t: Throwable => last = t; Thread.sleep(100) }
    }
    throw last
  }

  private def tmpWork(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  // ---- registry parity -------------------------------------------------

  test("registry: every listed source type reaches a loader dispatch arm") {
    // drive each type through `load`; the arm exists iff the loader does
    // NOT answer "unsupported source type" (missing args / unreachable
    // peers throw other errors — that's fine, the dispatch is proven).
    // Listener types get an ephemeral 127.0.0.1 bind; pollers get a
    // closed local port so nothing hangs on a real network.
    val extra: Map[String, String] = Map(
      "exec" -> "command: [echo, hi]",
      "stdin" -> "", "file_descriptor" -> "",
      "http_server" -> "address: 127.0.0.1:0",
      "http" -> "address: 127.0.0.1:0",
      "syslog" -> "address: 127.0.0.1:0",
      "statsd" -> "address: 127.0.0.1:0",
      "fluent" -> "address: 127.0.0.1:0",
      "logstash" -> "address: 127.0.0.1:0",
      "splunk_hec" -> "address: 127.0.0.1:0",
      "heroku_logs" -> "address: 127.0.0.1:0",
      "aws_kinesis_firehose" -> "address: 127.0.0.1:0",
      "datadog_agent" -> "address: 127.0.0.1:0",
      "dnstap" -> "address: 127.0.0.1:0",
      "prometheus_remote_write" -> "address: 127.0.0.1:0",
      "prometheus_pushgateway" -> "address: 127.0.0.1:0",
      "opentelemetry" -> "http:\n      address: 127.0.0.1:0",
      "http_client" -> "endpoint: http://127.0.0.1:9/x",
      "prometheus" -> "endpoint: http://127.0.0.1:9/metrics",
      "prometheus_scrape" -> "endpoint: http://127.0.0.1:9/metrics",
      "gcp_pubsub" -> "endpoint: http://127.0.0.1:9",
      "okta" -> "domain: 127.0.0.1:9",
      "aws_s3" -> "endpoint: http://127.0.0.1:9",
      "aws_sqs" -> "endpoint: http://127.0.0.1:9",
      "aws_ecs_metrics" -> "endpoint: http://127.0.0.1:9",
      "mongodb_metrics" -> "endpoint: mongodb://127.0.0.1:9",
      "apache_metrics" -> "endpoint: http://127.0.0.1:9",
      "nginx_metrics" -> "endpoint: http://127.0.0.1:9",
      "eventstoredb_metrics" -> "endpoint: http://127.0.0.1:9",
      "postgresql_metrics" -> "endpoint: http://127.0.0.1:9",
      "docker_logs" -> "docker_host: http://127.0.0.1:9",
      "parquet" -> "table: events",
      "file" -> "table: events")
    val savedIn = System.in
    System.setIn(new java.io.ByteArrayInputStream(Array.emptyByteArray))
    try ConfigLoader.sourceTypes.foreach { t =>
      val args = extra.get(t).filter(_.nonEmpty)
        .map(a => "\n    " + a.replace("\n", "\n")).getOrElse("")
      val yaml =
        s"""
          |sources:
          |  in:
          |    type: $t$args
          |sinks:
          |  out:
          |    type: blackhole
          |    inputs: [in]
          |""".stripMargin
      try ConfigLoader.load(spark, yaml, sf)
      catch {
        case e: Throwable =>
          assert(!String.valueOf(e.getMessage)
              .contains("unsupported source type"),
            s"source type '$t' is listed but has no dispatch arm")
      } finally ConfigLoader.closePendingSources()
    } finally System.setIn(savedIn)
  }

  test("registry: every listed transform type reaches a dispatch arm") {
    ConfigLoader.transformTypes.foreach { t =>
      val yaml =
        s"""
          |sources:
          |  in:
          |    type: parquet
          |    table: events
          |transforms:
          |  tr:
          |    type: $t
          |    inputs: [in]
          |sinks:
          |  out:
          |    type: blackhole
          |    inputs: [tr]
          |""".stripMargin
      try ConfigLoader.load(spark, yaml, sf)
      catch {
        case e: Throwable =>
          assert(!String.valueOf(e.getMessage)
              .contains("unsupported transform type"),
            s"transform type '$t' is listed but has no dispatch arm")
      }
    }
  }

  test("registry: every listed sink type reaches a dispatch arm") {
    val native = Set("console", "parquet", "kafka", "blackhole", "memory",
      "prometheus_exporter")
    val work = tmpWork("sinkreg")
    ConfigLoader.sinkTypes.foreach { t =>
      val arm = native(t) || {
        try ConfigLoader.connectorSink("out", t, Map.empty, work).isDefined
        catch { case _: Exception => true } // arm reached, args missing
      }
      assert(arm, s"sink type '$t' is listed but has no dispatch arm")
    }
    // and the reverse: an unlisted type resolves to no connector
    assert(ConfigLoader.connectorSink("out", "no_such_sink",
      Map.empty, work).isEmpty)
  }

  // ---- run-tests for the newly wired source types ----------------------

  test("run: http_server source ingests POSTed lines from YAML") {
    val running = ConfigLoader.run(spark,
      """
        |sources:
        |  in:
        |    type: http_server
        |    address: 127.0.0.1:0
        |sinks:
        |  http_tap:
        |    type: memory
        |    inputs: [in]
        |""".stripMargin, sf, tmpWork("httpsrv"))
    try {
      val port = ConfigLoader.lastAgentPort
      assert(port > 0)
      val conn = new java.net.URL(s"http://127.0.0.1:$port/")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.getOutputStream.write("alpha\nbeta\n".getBytes("UTF-8"))
      conn.getOutputStream.close()
      assert(conn.getResponseCode == 200)
      running.processAllAvailable()
      val got = spark.table("http_tap").collect()
        .map(_.getAs[String]("message")).toSet
      assert(got == Set("alpha", "beta"))
    } finally running.stopAll()
  }

  test("run: http_server headers/query_parameters/path_key/strict_path") {
    val running = ConfigLoader.run(spark,
      """
        |sources:
        |  in:
        |    type: http_server
        |    address: 127.0.0.1:0
        |    path: /ingest
        |    headers: [X-Trace-Id]
        |    query_parameters: [tenant]
        |    path_key: req_path
        |    response_code: 201
        |sinks:
        |  http_opts_tap:
        |    type: memory
        |    inputs: [in]
        |""".stripMargin, sf, tmpWork("httpopts"))
    try {
      val port = ConfigLoader.lastAgentPort
      def post(path: String, hdrs: Map[String, String] = Map.empty): Int = {
        val c = new java.net.URL(s"http://127.0.0.1:$port$path")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        c.setRequestMethod("POST"); c.setDoOutput(true)
        hdrs.foreach { case (k, v) => c.setRequestProperty(k, v) }
        c.getOutputStream.write("hello\n".getBytes("UTF-8"))
        c.getOutputStream.close()
        try c.getResponseCode finally c.disconnect()
      }
      // strict_path (default true): only the exact path ingests
      assert(post("/ingest/extra") == 404)
      // GET is not the configured method
      val g = new java.net.URL(s"http://127.0.0.1:$port/ingest")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      g.setRequestMethod("GET")
      assert(g.getResponseCode == 405)
      // success reply uses the configured response_code
      assert(post("/ingest?tenant=acme",
        Map("X-Trace-Id" -> "t-123")) == 201)
      eventually() {
        running.processAllAvailable()
        val rows = spark.table("http_opts_tap").collect()
        assert(rows.length == 1, rows.toSeq)
        val r = rows.head
        assert(r.getAs[String]("message") == "hello")
        assert(r.getAs[String]("req_path") == "/ingest")
        assert(r.getAs[Map[String, String]]("headers")("X-Trace-Id") == "t-123")
        assert(r.getAs[Map[String, String]]("query_parameters")("tenant")
          == "acme")
      }
    } finally running.stopAll()
  }

  test("run: http_server auth rejects bad credentials with 401") {
    val running = ConfigLoader.run(spark,
      """
        |sources:
        |  in:
        |    type: http_server
        |    address: 127.0.0.1:0
        |    auth:
        |      username: u1
        |      password: pw
        |sinks:
        |  http_auth_tap:
        |    type: memory
        |    inputs: [in]
        |""".stripMargin, sf, tmpWork("httpauth"))
    try {
      val port = ConfigLoader.lastAgentPort
      def post(body: String, auth: Option[String]): Int = {
        val c = new java.net.URL(s"http://127.0.0.1:$port/")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        c.setRequestMethod("POST")
        c.setDoOutput(true)
        auth.foreach(a => c.setRequestProperty("Authorization", a))
        c.getOutputStream.write(body.getBytes("UTF-8"))
        c.getOutputStream.close()
        try c.getResponseCode finally c.disconnect()
      }
      val good = "Basic " + java.util.Base64.getEncoder
        .encodeToString("u1:pw".getBytes("UTF-8"))
      assert(post("denied\n", None) == 401)
      assert(post("denied\n", Some("Basic d3Jvbmc=")) == 401)
      assert(post("granted\n", Some(good)) == 200)
      running.processAllAvailable()
      assert(spark.table("http_auth_tap").collect()
        .map(_.getAs[String]("message")).toSet == Set("granted"))
    } finally running.stopAll()
  }

  test("run: http_client source polls an endpoint from YAML") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/feed", ex => {
      val body = "one\ntwo\n".getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    val port = server.getAddress.getPort
    val running = ConfigLoader.run(spark,
      s"""
        |sources:
        |  in:
        |    type: http_client
        |    endpoint: http://127.0.0.1:$port/feed
        |    scrape_interval_secs: 0.2
        |sinks:
        |  hc_tap:
        |    type: memory
        |    inputs: [in]
        |""".stripMargin, sf, tmpWork("httpcli"))
    try eventually() {
      running.processAllAvailable()
      val got = spark.table("hc_tap").collect()
        .map(_.getAs[String]("message")).toSet
      assert(got == Set("one", "two"))
    } finally { running.stopAll(); server.stop(0) }
  }

  test("run: prometheus scrape source decodes exposition text from YAML") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/metrics", ex => {
      val body = ("# HELP up Up.\n# TYPE up gauge\n" +
        "up{job=\"api\"} 1\nrequests_total 42\n").getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    val port = server.getAddress.getPort
    val running = ConfigLoader.run(spark,
      s"""
        |sources:
        |  in:
        |    type: prometheus
        |    endpoints: [http://127.0.0.1:$port/metrics]
        |    scrape_interval_secs: 0.2
        |sinks:
        |  prom_tap:
        |    type: memory
        |    inputs: [in]
        |""".stripMargin, sf, tmpWork("promscrape"))
    try eventually() {
      running.processAllAvailable()
      val rows = spark.table("prom_tap").collect()
      val byName = rows.map(r =>
        r.getAs[String]("name") -> r.getAs[Double]("value")).toMap
      assert(byName.get("up").contains(1.0))
      assert(byName.get("requests_total").contains(42.0))
      val upTags = rows.find(_.getAs[String]("name") == "up").get
        .getAs[Map[String, String]]("tags")
      assert(upTags == Map("job" -> "api"))
    } finally { running.stopAll(); server.stop(0) }
  }

  test("run: stdin source reads driver stdin (batch) from YAML") {
    val savedIn = System.in
    System.setIn(new java.io.ByteArrayInputStream(
      "first line\nsecond line\n".getBytes("UTF-8")))
    try {
      val running = ConfigLoader.run(spark,
        """
          |sources:
          |  in:
          |    type: stdin
          |sinks:
          |  stdin_tap:
          |    type: memory
          |    inputs: [in]
          |""".stripMargin, sf, tmpWork("stdincfg"))
      try {
        val got = spark.table("stdin_tap").collect()
          .map(_.getAs[String]("message")).toSeq
        assert(got == Seq("first line", "second line"))
      } finally running.stopAll()
    } finally System.setIn(savedIn)
  }

  test("run: exec source captures the command's stdout from YAML") {
    val running = ConfigLoader.run(spark,
      """
        |sources:
        |  in:
        |    type: exec
        |    command: [printf, 'a\nb\n']
        |sinks:
        |  exec_tap:
        |    type: memory
        |    inputs: [in]
        |""".stripMargin, sf, tmpWork("execcfg"))
    try {
      val got = spark.table("exec_tap").collect()
        .map(_.getAs[String]("message")).toSeq
      assert(got == Seq("a", "b"))
    } finally running.stopAll()
  }

  test("run: exec scheduled mode re-invokes on an interval (streaming)") {
    val running = ConfigLoader.run(spark,
      """
        |sources:
        |  in:
        |    type: exec
        |    mode: scheduled
        |    command: [date, '+tick']
        |    scheduled:
        |      exec_interval_secs: 0.2
        |sinks:
        |  exec_sched_tap:
        |    type: memory
        |    inputs: [in]
        |""".stripMargin, sf, tmpWork("execsched"))
    try eventually() {
      running.processAllAvailable()
      // at least two invocations landed — the source is streaming and
      // re-running the command, not a one-shot batch
      val n = spark.table("exec_sched_tap")
        .filter(org.apache.spark.sql.functions.col("message") === "tick")
        .count()
      assert(n >= 2, s"only $n scheduled invocations")
    } finally running.stopAll()
  }

  test("run: syslog tcp source accepts octet-counted AND newline frames") {
    val running = ConfigLoader.run(spark,
      """
        |sources:
        |  in:
        |    type: syslog
        |    mode: tcp
        |    address: 127.0.0.1:0
        |sinks:
        |  syslog_tap:
        |    type: memory
        |    inputs: [in]
        |""".stripMargin, sf, tmpWork("syslogcfg"))
    try {
      val port = ConfigLoader.lastAgentPort
      val msg1 = "<165>1 2024-02-13T21:53:30.605Z host1 app - ID47 - counted"
      val msg2 = "<34>1 2024-02-13T21:53:31.000Z host2 su - - - plain line"
      val sock = new java.net.Socket("127.0.0.1", port)
      val out = sock.getOutputStream
      // RFC6587 octet-counting frame, then a newline frame — the
      // listener auto-detects per frame like the reference
      out.write(s"${msg1.length} $msg1".getBytes("UTF-8"))
      out.write((msg2 + "\n").getBytes("UTF-8"))
      out.flush()
      sock.close()
      eventually() {
        running.processAllAvailable()
        val rows = spark.table("syslog_tap").collect()
        assert(rows.length == 2)
        val byHost = rows.map(r => r.getAs[String]("hostname") -> r).toMap
        assert(byHost("host1").getAs[String]("appname") == "app")
        assert(byHost("host1").getAs[String]("message") == "counted")
        assert(byHost("host1").getAs[String]("facility") == "local4")
        // every reference log source stamps its type name
        assert(byHost("host1").getAs[String]("source_type") == "syslog")
        assert(byHost("host2").getAs[String]("message") == "plain line")
        assert(byHost("host2").getAs[String]("severity") == "crit")
      }
    } finally running.stopAll()
  }

  test("run: syslog octet frames over max_length are discarded, " +
      "connection survives") {
    val running = ConfigLoader.run(spark,
      """
        |sources:
        |  in:
        |    type: syslog
        |    mode: tcp
        |    address: 127.0.0.1:0
        |    max_length: 64
        |sinks:
        |  syslog_cap_tap:
        |    type: memory
        |    inputs: [in]
        |""".stripMargin, sf, tmpWork("syslogcap"))
    try {
      val port = ConfigLoader.lastAgentPort
      val big = "<165>1 2024-02-13T21:53:30.605Z host1 app - ID47 - " +
        ("x" * 100) // 151 bytes > max_length=64 → drained, discarded
      val ok = "<165>1 2024-02-13T21:53:30.605Z host2 app - ID48 - kept"
      val sock = new java.net.Socket("127.0.0.1", port)
      val out = sock.getOutputStream
      out.write(s"${big.length} $big".getBytes("UTF-8"))
      out.write(s"${ok.length} $ok".getBytes("UTF-8"))
      out.flush()
      sock.close()
      eventually() {
        running.processAllAvailable()
        val rows = spark.table("syslog_cap_tap").collect()
        assert(rows.length == 1, rows.toSeq)
        assert(rows(0).getAs[String]("hostname") == "host2")
        assert(rows(0).getAs[String]("message") == "kept")
      }
    } finally running.stopAll()
  }

  test("run: statsd udp source decodes lines to metric rows") {
    val running = ConfigLoader.run(spark,
      """
        |sources:
        |  in:
        |    type: statsd
        |    address: 127.0.0.1:0
        |sinks:
        |  statsd_tap:
        |    type: memory
        |    inputs: [in]
        |""".stripMargin, sf, tmpWork("statsdcfg"))
    try {
      val port = ConfigLoader.lastAgentPort
      val sock = new java.net.DatagramSocket()
      val payload =
        "gorets:2|c|@0.5\ntemp:21.5|g|#env:prod\n".getBytes("UTF-8")
      sock.send(new java.net.DatagramPacket(payload, payload.length,
        java.net.InetAddress.getByName("127.0.0.1"), port))
      sock.close()
      eventually() {
        running.processAllAvailable()
        val rows = spark.table("statsd_tap").collect()
        assert(rows.length == 2)
        val byName = rows.map(r => r.getAs[String]("name") -> r).toMap
        // counter at @0.5 sample rate represents 2/0.5 = 4 increments
        assert(byName("gorets").getAs[Double]("counter_value") == 4.0)
        assert(byName("gorets").getAs[String]("kind") == "incremental")
        assert(byName("temp").getAs[Double]("gauge_value") == 21.5)
        assert(byName("temp").getAs[String]("kind") == "absolute")
        assert(byName("temp").getAs[Map[String, String]]("tags") ==
          Map("env" -> "prod"))
      }
    } finally running.stopAll()
  }

  // ---- decoding:/framing: blocks ---------------------------------------

  test("run: socket source + decoding.codec syslog parses from YAML") {
    // the Spark socket source CONNECTS to a feed server — start one,
    // then point the YAML at it; the decoding block turns raw lines
    // into RFC5424 fields with no transform in between
    val server = new java.net.ServerSocket(0,
      1, java.net.InetAddress.getByName("127.0.0.1"))
    val feeder = new Thread(() => {
      try {
        val sock = server.accept()
        val out = sock.getOutputStream
        out.write(("<165>1 2024-02-13T21:53:30.605Z h1 nginx 77 ID1 - GET /\n" +
          "<165>1 2024-02-13T21:53:31.605Z h2 nginx 78 ID2 - POST /x\n")
          .getBytes("UTF-8"))
        out.flush()
        // keep the connection open until the test ends
        Thread.sleep(25000)
        sock.close()
      } catch { case _: Exception => () }
    }, "syslog-feeder")
    feeder.setDaemon(true)
    feeder.start()
    val running = ConfigLoader.run(spark,
      s"""
        |sources:
        |  in:
        |    type: socket
        |    address: 127.0.0.1:${server.getLocalPort}
        |    decoding:
        |      codec: syslog
        |sinks:
        |  sockdec_tap:
        |    type: memory
        |    inputs: [in]
        |""".stripMargin, sf, tmpWork("sockdec"))
    try eventually() {
      val rows = spark.table("sockdec_tap").collect()
      assert(rows.length == 2)
      val byHost = rows.map(r => r.getAs[String]("hostname") -> r).toMap
      assert(byHost("h1").getAs[String]("appname") == "nginx")
      assert(byHost("h1").getAs[String]("procid") == "77")
      assert(byHost("h2").getAs[String]("message") == "POST /x")
    } finally { running.stopAll(); server.close() }
  }

  test("run: http_server + framing octet_counting + gelf decoding") {
    // one POST body carries two octet-counted GELF frames (no newlines,
    // so the body arrives as ONE chunk that framing must split)
    val g1 = """{"version":"1.1","host":"a","short_message":"first"}"""
    val g2 = """{"version":"1.1","host":"b","short_message":"second"}"""
    val running = ConfigLoader.run(spark,
      """
        |sources:
        |  in:
        |    type: http_server
        |    address: 127.0.0.1:0
        |    framing:
        |      method: octet_counting
        |    decoding:
        |      codec: gelf
        |sinks:
        |  gelf_tap:
        |    type: memory
        |    inputs: [in]
        |""".stripMargin, sf, tmpWork("gelfdec"))
    try {
      val port = ConfigLoader.lastAgentPort
      val conn = new java.net.URL(s"http://127.0.0.1:$port/")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.getOutputStream.write(
        s"${g1.length} $g1${g2.length} $g2".getBytes("UTF-8"))
      conn.getOutputStream.close()
      assert(conn.getResponseCode == 200)
      eventually() {
        running.processAllAvailable()
        val rows = spark.table("gelf_tap").collect()
        assert(rows.length == 2)
        val byHost = rows.map(r => r.getAs[String]("host") -> r).toMap
        assert(byHost("a").getAs[String]("short_message") == "first")
        assert(byHost("b").getAs[String]("message") == "second")
      }
    } finally running.stopAll()
  }

  test("decoding: metric-shaped codecs flip the source's event kind") {
    def kindOf(codec: String) = ConfigLoader.decodedKind(
      Map("decoding" -> java.util.Map.of("codec", codec)),
      Topology.Log)
    assert(kindOf("statsd") == Topology.Metric)
    assert(kindOf("influxdb") == Topology.Metric)
    assert(kindOf("syslog") == Topology.Log)
    assert(kindOf("json") == Topology.Log)
  }

  test("decoding: csv, json-fields, and influxdb decode rendered lines") {
    import spark.implicits._
    val csv = ConfigLoader.applyDecoding(
      Seq("1,alice,ok", "2,bob,err").toDF("message"),
      Map("decoding" -> java.util.Map.of("codec", "csv", "csv",
        java.util.Map.of("fields", java.util.List.of("id", "user", "st")))))
    assert(csv.columns.toSeq == Seq("id", "user", "st"))
    assert(csv.collect().map(_.getAs[String]("user")).toSet ==
      Set("alice", "bob"))
    val json = ConfigLoader.applyDecoding(
      Seq("""{"a":"x","b":"2"}""").toDF("message"),
      Map("decoding" -> java.util.Map.of("codec", "json",
        "fields", java.util.List.of("a", "b"))))
    assert(json.select("a", "b").head ==
      org.apache.spark.sql.Row("x", "2"))
    val influx = ConfigLoader.applyDecoding(
      Seq("cpu,host=h1 usage=0.5 1700000000000000000").toDF("message"),
      Map("decoding" -> java.util.Map.of("codec", "influxdb")))
    val r = influx.head
    assert(r.getAs[String]("measurement") == "cpu")
    assert(r.getAs[Map[String, String]]("tags") == Map("host" -> "h1"))
    assert(r.getAs[Map[String, Double]]("fields") == Map("usage" -> 0.5))
  }

  test("decoding: the vrl codec runs a program per frame") {
    import spark.implicits._
    val out = ConfigLoader.applyDecoding(
      Seq("a=1 b=x", "a=2 b=y", "drop me").toDF("message"),
      Map("decoding" -> java.util.Map.of("codec", "vrl",
        "vrl", java.util.Map.of("source",
          """parsed = parse_key_value!(.message)
            |if parsed.a == null { abort }
            |.a = to_int!(parsed.a)
            |.b = parsed.b
            |""".stripMargin))))
    val rows = out.orderBy("a").collect()
    assert(rows.length == 2) // the abort dropped the unparseable frame
    assert(rows.map(r => (r.getAs[Long]("a"), r.getAs[String]("b")))
      .toSeq == Seq((1L, "x"), (2L, "y")))
  }

  test("decoding: avro and protobuf decode binary payloads from config") {
    import spark.implicits._
    // avro: encode with the writer schema, round-trip through the
    // decoding block over a kafka-shaped binary `value` column
    val schema =
      """{"type":"record","name":"E","fields":[
        |{"name":"id","type":"long"},{"name":"tag","type":"string"}]}"""
        .stripMargin
    val payloads = Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
      .select(graft.codecs.AvroCodec.encode(schema,
        struct(col("id"), col("tag"))).as("value"))
    val avro = ConfigLoader.applyDecoding(payloads,
      Map("decoding" -> java.util.Map.of("codec", "avro",
        "avro", java.util.Map.of("schema", schema))))
    assert(avro.orderBy("id").collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[String]("tag"))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // protobuf: inline field schema, same round trip
    import graft.codecs.ProtobufCodec._
    val ps = ProtoSchema(Seq(ProtoField(1, "n", PVarint),
      ProtoField(2, "s", PString)))
    val pbin = Seq((7L, "x"), (8L, "y")).toDF("n", "s")
      .select(graft.codecs.ProtobufCodec.encode(ps,
        struct(col("n"), col("s"))).as("value"))
    val pb = ConfigLoader.applyDecoding(pbin,
      Map("decoding" -> java.util.Map.of("codec", "protobuf",
        "protobuf", java.util.Map.of("fields", java.util.List.of(
          java.util.Map.of("no", "1", "name", "n", "type", "int64"),
          java.util.Map.of("no", "2", "name", "s", "type", "string"))))))
    assert(pb.orderBy("n").collect().map(r =>
      (r.getAs[Long]("n"), r.getAs[String]("s"))).toSeq ==
      Seq((7L, "x"), (8L, "y")))
  }
}
