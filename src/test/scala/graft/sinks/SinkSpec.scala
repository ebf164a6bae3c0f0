package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SinkSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    ("web", "alpha line", "2024-03-05T10:00:00Z", "h1"),
    ("web", "beta line", "2024-03-05T11:00:00Z", "h1"),
    ("api", "gamma line", "2024-03-06T09:00:00Z", "h2"))
    .toDF("app", "message", "tss", "host")
    .withColumn("timestamp", col("tss").cast("timestamp")).drop("tss")

  // ---- Template ----

  test("template renders field refs and strftime against event time") {
    val df = events.select(graft.functions.Template.render(events.schema,
      "/logs/{{ app }}-%Y-%m-%d.log").as("p"))
    assert(df.as[String].collect().toSet ==
      Set("/logs/web-2024-03-05.log", "/logs/api-2024-03-06.log"))
  }

  test("template: static strings are not dynamic; refs and strftime are") {
    import graft.functions.Template.isDynamic
    assert(!isDynamic("/tmp/plain.log"))
    assert(isDynamic("/tmp/{{ app }}.log"))
    assert(isDynamic("/tmp/%F.log"))
    assert(!isDynamic("/tmp/100%%.log")) // %% = literal percent
  }

  // ---- FileSink ----

  test("file sink: template path routes events to per-app dated files") {
    val dir = java.nio.file.Files.createTempDirectory("fsink")
    FileSink.writeBatch(events, FileSink.Config(
      s"$dir/{{ app }}-%Y-%m-%d.log", codec = "text"))
    def read(n: String) = new String(java.nio.file.Files.readAllBytes(
      dir.resolve(n)), "UTF-8")
    assert(read("web-2024-03-05.log").split("\n").toSet ==
      Set("alpha line", "beta line"))
    assert(read("api-2024-03-06.log").trim == "gamma line")
  }

  test("file sink: gzip compression, json codec, append across batches") {
    val dir = java.nio.file.Files.createTempDirectory("fsinkgz")
    val cfg = FileSink.Config(s"$dir/out.log.gz", codec = "json",
      compression = "gzip")
    FileSink.writeBatch(events.limit(1), cfg)
    FileSink.writeBatch(events.limit(1), cfg) // second append = 2nd member
    val in = new java.util.zip.GZIPInputStream(
      new java.io.FileInputStream(dir.resolve("out.log.gz").toFile))
    val lines = new String(in.readAllBytes(), "UTF-8").split("\n")
    assert(lines.length == 2)
    lines.foreach { l =>
      assert(get_json_object(lit(l), "$.app") != null)
      assert(l.contains("\"app\":\"web\""))
    }
  }

  test("file sink: zstd round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("fsinkzst")
    FileSink.writeBatch(events, FileSink.Config(
      s"$dir/out.log.zst", codec = "text", compression = "zstd"))
    val in = new com.github.luben.zstd.ZstdInputStream(
      new java.io.FileInputStream(dir.resolve("out.log.zst").toFile))
    val got = new String(in.readAllBytes(), "UTF-8").split("\n").toSet
    assert(got == Set("alpha line", "beta line", "gamma line"))
  }

  // ---- Socket sink ----

  test("socket sink: tcp sends newline-framed encoded lines") {
    val server = new java.net.ServerSocket(0)
    val received = new java.util.concurrent.LinkedBlockingQueue[String]()
    val t = new Thread(() => {
      try {
        // one connection per task/partition
        while (true) {
          val s = server.accept()
          val src = scala.io.Source.fromInputStream(s.getInputStream, "UTF-8")
          src.getLines().foreach(received.put)
          s.close()
        }
      } catch { case _: Throwable => () }
    })
    t.setDaemon(true); t.start()
    try {
      NetworkSinks.writeSocket(events.coalesce(1), NetworkSinks.SocketConfig(
        "tcp", s"localhost:${server.getLocalPort}", codec = "text"))
      val got = (1 to 3).map(_ =>
        received.poll(10, java.util.concurrent.TimeUnit.SECONDS)).toSet
      assert(got == Set("alpha line", "beta line", "gamma line"))
    } finally server.close()
  }

  test("vector sink: native_json envelope round-trips the event") {
    val server = new java.net.ServerSocket(0)
    val received = new java.util.concurrent.LinkedBlockingQueue[String]()
    val t = new Thread(() => {
      try while (true) {
        val s = server.accept()
        scala.io.Source.fromInputStream(s.getInputStream, "UTF-8")
          .getLines().foreach(received.put)
        s.close()
      } catch { case _: Throwable => () }
    })
    t.setDaemon(true); t.start()
    try {
      NetworkSinks.writeSocket(events.coalesce(1), NetworkSinks.SocketConfig(
        "tcp", s"localhost:${server.getLocalPort}", codec = "native_json"))
      val lines = (1 to 3).map(_ =>
        received.poll(10, java.util.concurrent.TimeUnit.SECONDS))
      val apps = lines.map(l => spark.range(1).select(
        get_json_object(lit(l), "$.log.app")).as[String].head)
      assert(apps.toSet == Set("web", "api"))
    } finally server.close()
  }

  test("vector source from YAML: native_json lines over tcp become events") {
    // the receive side of the vector-to-vector pair: a server speaking
    // the sink's wire format (native_json, newline-framed) feeds a
    // `type: vector` source; events carry the payload json + kind
    val server = new java.net.ServerSocket(0)
    val t = new Thread(() => {
      try while (true) {
        val s = server.accept()
        val out = new java.io.PrintWriter(s.getOutputStream, true)
        out.println("""{"log":{"app":"web","message":"hello"}}""")
        out.println("""{"metric":{"name":"cpu","value":0.5}}""")
        Thread.sleep(60000) // keep open; daemon thread dies with the JVM
      } catch { case _: Throwable => () }
    })
    t.setDaemon(true); t.start()
    val tmp = java.nio.file.Files.createTempDirectory("vecwork").toString
    val running = graft.plans.ConfigLoader.run(spark,
      s"""
        |sources:
        |  upstream:
        |    type: vector
        |    address: localhost:${server.getLocalPort}
        |sinks:
        |  tap:
        |    type: memory
        |    inputs: [upstream]
        |""".stripMargin,
      "/root/testdata/sf0.001", tmp)
    try {
      val end = System.nanoTime + 30L * 1000 * 1000 * 1000
      var ok = false
      while (!ok && System.nanoTime < end) {
        running.processAllAvailable()
        ok = spark.table("tap").count() >= 2
        if (!ok) Thread.sleep(200)
      }
      val rows = spark.table("tap")
        .select(col("__event_kind"),
          get_json_object(col("message"), "$.app").as("app"),
          get_json_object(col("message"), "$.name").as("name"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
        .toSet
      assert(rows.contains(("log", "web", null)))
      assert(rows.contains(("metric", null, "cpu")))
    } finally { running.stopAll(); server.close() }
  }

  // ---- HTTP sink + envelopes ----

  private class CapturingRawServer {
    val raw = new java.util.concurrent.CopyOnWriteArrayList[(String, Array[Byte], Map[String, String])]()
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    server.createContext("/", { ex =>
      val hdrs = Seq("Content-Encoding", "Content-Type",
        "X-Prometheus-Remote-Write-Version")
        .flatMap(h => Option(ex.getRequestHeaders.getFirst(h)).map(h -> _))
        .toMap
      raw.add((ex.getRequestURI.getPath, ex.getRequestBody.readAllBytes(),
        hdrs))
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    server.start()
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  private class CapturingServer {
    val bodies = new java.util.concurrent.CopyOnWriteArrayList[(String, String, Map[String, String])]()
    val queries = new java.util.concurrent.CopyOnWriteArrayList[String]()
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    server.createContext("/", { ex =>
      val raw = ex.getRequestBody.readAllBytes()
      val enc = Option(ex.getRequestHeaders.getFirst("Content-Encoding"))
      val body = enc match {
        case Some("gzip") => new String(new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(raw)).readAllBytes(), "UTF-8")
        case _ => new String(raw, "UTF-8")
      }
      val hdrs = Seq("Authorization", "DD-API-KEY", "Content-Type")
        .flatMap(h => Option(ex.getRequestHeaders.getFirst(h)).map(h -> _))
        .toMap
      bodies.add((ex.getRequestURI.getPath, body, hdrs))
      queries.add(Option(ex.getRequestURI.getRawQuery).getOrElse(""))
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    server.start()
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  test("http sink: ndjson batches with gzip compression") {
    val srv = new CapturingServer
    try {
      NetworkSinks.writeHttp(events.coalesce(1), NetworkSinks.HttpConfig(
        s"http://localhost:${srv.port}/ingest", codec = "json",
        compression = "gzip", maxEvents = 2))
      // 3 events, maxEvents=2 → 2 requests from the single task
      assert(srv.bodies.size == 2)
      val lines = srv.bodies.toArray.map(_.asInstanceOf[(String, String, Map[String, String])])
        .flatMap(_._2.split("\n"))
      assert(lines.length == 3)
      assert(lines.forall(_.contains("\"message\"")))
    } finally srv.stop()
  }

  test("elasticsearch sink: bulk action/doc pairs against the _bulk API") {
    val srv = new CapturingServer
    try {
      graft.plans.ConfigLoader.run(spark,
        s"""
          |sources:
          |  ev: {type: parquet, table: events}
          |sinks:
          |  es:
          |    type: elasticsearch
          |    inputs: [ev]
          |    endpoints: ["http://localhost:${srv.port}"]
          |    bulk: {index: "logs-%Y", action: create}
          |""".stripMargin,
        "/root/testdata/sf0.001",
        java.nio.file.Files.createTempDirectory("eswork").toString).stopAll()
      assert(srv.bodies.size >= 1)
      val (path, body, hdrs) = srv.bodies.get(0)
      assert(path == "/_bulk")
      assert(hdrs("Content-Type") == "application/x-ndjson")
      assert(body.endsWith("\n")) // _bulk requires the trailing newline
      val lines = body.trim.split("\n")
      assert(lines.length % 2 == 0)
      assert(lines.head.startsWith("{\"create\":{\"_index\":\"logs-20"))
      assert(lines(1).startsWith("{"))
    } finally srv.stop()
  }

  test("elasticsearch bulk: id_key with quotes/backslashes stays valid JSON") {
    val df = Seq(("""he said "hi" \ bye""", "m1")).toDF("doc_id", "msg")
    val pair = df.select(Envelopes.esBulkPair(df, index = "logs",
      idKey = Some("doc_id")).as("p")).as[String].head()
    val action = pair.split("\n").head
    // the action line must parse as JSON and round-trip the raw id
    val id = spark.range(1).select(
      get_json_object(lit(action), "$.index._id").as[String]).head()
    assert(id == """he said "hi" \ bye""")
  }

  test("splunk_hec sink: event envelope with token auth") {
    val srv = new CapturingServer
    try {
      NetworkSinks.writeHttpBody(
        events.select(Envelopes.hecEvent(events, host = "{{ host }}",
          sourcetype = "graft").as("__line")),
        NetworkSinks.HttpConfig(
          s"http://localhost:${srv.port}/services/collector/event",
          headers = Map("Authorization" -> "Splunk tok-123"),
          contentType = "application/json"))
      val (path, body, hdrs) = srv.bodies.get(0)
      assert(path == "/services/collector/event")
      assert(hdrs("Authorization") == "Splunk tok-123")
      val first = body.split("\n").head
      val t = spark.range(1).select(
        get_json_object(lit(first), "$.time").as[String],
        get_json_object(lit(first), "$.sourcetype").as[String],
        get_json_object(lit(first), "$.event.app").as[String]).head()
      assert(t._2 == "graft" && Set("web", "api").contains(t._3))
      assert(t._1.toDouble > 1.7e9)
    } finally srv.stop()
  }

  test("loki sink: events group into label streams with ns timestamps") {
    val streams = Envelopes.lokiStreams(events,
      Seq("app" -> "{{ app }}", "env" -> "prod"), codec = "text")
      .as[String].collect().sorted
    assert(streams.length == 2)
    val web = streams.find(_.contains("\"app\":\"web\"")).get
    assert(web.contains("\"stream\":{\"app\":\"web\",\"env\":\"prod\"}"))
    // two values, sorted by ns timestamp, ns = micros * 1000
    val ns1 = "1709632800000000000" // 2024-03-05T10:00:00Z
    val ns2 = "1709636400000000000" // 2024-03-05T11:00:00Z
    assert(web.contains(s"""["$ns1","alpha line"]"""))
    assert(web.contains(s"""["$ns2","beta line"]"""))
    assert(web.indexOf(ns1) < web.indexOf(ns2))
  }

  test("loki sink: remove_label_fields strips label sources from lines") {
    val streams = Envelopes.lokiStreams(events,
      Seq("app" -> "{{ app }}"), codec = "json",
      removeLabelFields = true)
      .as[String].collect()
    // the `app` field rode into the stream labels — json lines must not
    // repeat it (loki/config.rs remove_label_fields)
    assert(streams.forall(_.contains("\"stream\":{\"app\":")))
    val lines = streams.mkString
    assert(!lines.contains("\\\"app\\\""), lines)
    // without the flag the field stays in the line payload
    val keep = Envelopes.lokiStreams(events,
      Seq("app" -> "{{ app }}"), codec = "json").as[String].collect()
    assert(keep.mkString.contains("\\\"app\\\""))
  }

  test("datadog_logs sink: v2 array body with api key header") {
    val srv = new CapturingServer
    try {
      graft.plans.ConfigLoader.run(spark,
        s"""
          |sources:
          |  ev: {type: parquet, table: events}
          |sinks:
          |  dd:
          |    type: datadog_logs
          |    inputs: [ev]
          |    endpoint: "http://localhost:${srv.port}"
          |    default_api_key: key-9
          |    service: webapp
          |""".stripMargin,
        "/root/testdata/sf0.001",
        java.nio.file.Files.createTempDirectory("ddwork").toString).stopAll()
      val (path, body, hdrs) = srv.bodies.get(0)
      assert(path == "/api/v2/logs")
      assert(hdrs("DD-API-KEY") == "key-9")
      assert(body.startsWith("[{") && body.endsWith("}]"))
      val first = body.substring(1, body.indexOf("},{") match {
        case -1 => body.length - 1; case i => i + 1 })
      val t = spark.range(1).select(
        get_json_object(lit(first), "$.ddsource").as[String],
        get_json_object(lit(first), "$.service").as[String],
        get_json_object(lit(first), "$.timestamp").as[String]).head()
      assert(t._1 == "vector" && t._2 == "webapp" && t._3.toLong > 1.6e12)
    } finally srv.stop()
  }

  test("streaming file sink from YAML: tailed lines land in the template file") {
    // connector sinks run foreachBatch under streaming — drive the file
    // sink from a live tailed directory and check appended output
    val src = java.nio.file.Files.createTempDirectory("sfsrc")
    java.nio.file.Files.write(src.resolve("a.log"),
      "one\ntwo\n".getBytes("UTF-8"))
    val outDir = java.nio.file.Files.createTempDirectory("sfout")
    val tmp = java.nio.file.Files.createTempDirectory("sfwork").toString
    val running = graft.plans.ConfigLoader.run(spark,
      s"""
        |sources:
        |  logs:
        |    type: file
        |    path: $src
        |sinks:
        |  out:
        |    type: file
        |    inputs: [logs]
        |    path: "$outDir/tail-%Y.log"
        |    encoding: {codec: text}
        |""".stripMargin,
      "/root/testdata/sf0.001", tmp)
    try {
      val year = java.time.Year.now(java.time.ZoneOffset.UTC).toString
      val f = outDir.resolve(s"tail-$year.log")
      val end = System.nanoTime + 30L * 1000 * 1000 * 1000
      var lines = Set.empty[String]
      while (lines != Set("one", "two") && System.nanoTime < end) {
        running.processAllAvailable()
        if (java.nio.file.Files.exists(f))
          lines = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
            .split("\n").filter(_.nonEmpty).toSet
        if (lines != Set("one", "two")) Thread.sleep(200)
      }
      assert(lines == Set("one", "two"))
    } finally running.stopAll()
  }

  private def metricRows = Seq(
    ("cpu_total", Map("host" -> "h1"), 0.5, "2024-03-05T10:00:00Z"),
    ("cpu_total", Map("host" -> "h1"), 0.7, "2024-03-05T10:00:01Z"),
    ("cpu_total", Map("host" -> "h2"), 0.9, "2024-03-05T10:00:00Z"))
    .toDF("name", "tags", "gauge_value", "tss")
    .withColumn("timestamp", col("tss").cast("timestamp")).drop("tss")

  test("prometheus_remote_write: snappy prompb body decodes to sorted series") {
    val srv = new CapturingRawServer
    try {
      NetworkSinks.writeProtoSnappy(
        Envelopes.remoteWriteSeries(metricRows.coalesce(1)),
        NetworkSinks.HttpConfig(s"http://localhost:${srv.port}/api/v1/write",
          headers = Map("Content-Encoding" -> "snappy",
            "X-Prometheus-Remote-Write-Version" -> "0.1.0"),
          contentType = "application/x-protobuf"))
      assert(srv.raw.size == 1)
      val (_, bytes, hdrs) = srv.raw.get(0)
      assert(hdrs("Content-Encoding") == "snappy")
      val wr = graft.codecs.ProtobufCodec.decodeTo(
        Envelopes.PromWriteRequest,
        org.xerial.snappy.Snappy.uncompress(bytes))
      val series = wr.getSeq[org.apache.spark.sql.Row](0)
      assert(series.length == 2) // one per label set
      val h1 = series.find(_.getSeq[org.apache.spark.sql.Row](0)
        .exists(l => l.getString(1) == "h1")).get
      // labels sorted: __name__ before host
      assert(h1.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
        == Seq("__name__", "host"))
      // two samples, timestamp-ordered
      val samples = h1.getSeq[org.apache.spark.sql.Row](1)
      assert(samples.map(_.getDouble(0)) == Seq(0.5, 0.7))
      assert(samples.map(_.getLong(1)).sliding(2).forall(s => s(0) < s(1)))
    } finally srv.stop()
  }

  test("influx line protocol: escaped measurement, sorted tags, ns time") {
    val df = Seq(("disk usage", Map("pa th" -> "/,root", "dev" -> "sda"),
        42.0, "2024-03-05T10:00:00Z"))
      .toDF("name", "tags", "gauge_value", "tss")
      .withColumn("timestamp", col("tss").cast("timestamp")).drop("tss")
    val line = df.select(Envelopes.influxLine(df)).as[String].head()
    assert(line ==
      "disk\\ usage,dev=sda,pa\\ th=/\\,root value=42.0 1709632800000000000")
  }

  test("clickhouse sink: JSONEachRow insert with query param") {
    val srv = new CapturingServer
    try {
      graft.plans.ConfigLoader.run(spark,
        s"""
          |sources:
          |  ev: {type: parquet, table: events}
          |sinks:
          |  ch:
          |    type: clickhouse
          |    inputs: [ev]
          |    endpoint: "http://localhost:${srv.port}"
          |    database: logs
          |    table: raw_events
          |""".stripMargin,
        "/root/testdata/sf0.001",
        java.nio.file.Files.createTempDirectory("chwork").toString).stopAll()
      assert(srv.bodies.size >= 1)
      val (path, body, _) = srv.bodies.get(0)
      assert(path == "/")
      assert(srv.queries.get(0) ==
        "query=INSERT+INTO+logs.raw_events+FORMAT+JSONEachRow")
      assert(body.trim.split("\n").head.startsWith("{"))
    } finally srv.stop()
  }

  test("file sink from YAML config: template path + json codec + gzip") {
    val srv = java.nio.file.Files.createTempDirectory("yfsink")
    graft.plans.ConfigLoader.run(spark,
      s"""
        |sources:
        |  ev: {type: parquet, table: events}
        |sinks:
        |  out:
        |    type: file
        |    inputs: [ev]
        |    path: "$srv/ev-%Y.log.gz"
        |    compression: gzip
        |    encoding: {codec: json}
        |""".stripMargin,
      "/root/testdata/sf0.001",
      java.nio.file.Files.createTempDirectory("yfwork").toString).stopAll()
    val files = new java.io.File(srv.toString).listFiles()
    assert(files.nonEmpty)
    val in = new java.util.zip.GZIPInputStream(
      new java.io.FileInputStream(files.head))
    val lines = new String(in.readAllBytes(), "UTF-8").split("\n")
    assert(lines.nonEmpty && lines.head.startsWith("{"))
  }

  // ---- ObjectStoreSink (aws_s3 / gcp_cloud_storage / azure_blob /
  //      webhdfs family) ----

  test("object store: key_prefix template partitions, named ts-seq.log") {
    val dir = java.nio.file.Files.createTempDirectory("osink")
    ObjectStoreSink.writeBatch(events.coalesce(1), ObjectStoreSink.Config(
      baseUri = dir.toString, keyPrefix = "app={{ app }}/date=%F/",
      filenameAppendUuid = false, fixedClockMs = Some(1658176486000L)))
    val back = ObjectStoreSink.readBack(spark, dir.toString)
      .as[(String, String)].collect().toSet
    // filename = {epoch seconds}-{seq}.{compression extension}
    assert(back.map(_._1).forall(_.matches(
      "app=(web|api)/date=2024-03-0[56]/1658176486-p\\d+-\\d+\\.log")))
    assert(back.map(_._2) == Set("alpha line", "beta line", "gamma line"))
  }

  test("object store: max_bytes rolls objects without losing rows") {
    val dir = java.nio.file.Files.createTempDirectory("osinkroll")
    val big = (1 to 100).map(i => ("web", f"line-$i%03d")).toDF("app", "message")
    ObjectStoreSink.writeBatch(big.coalesce(1), ObjectStoreSink.Config(
      baseUri = dir.toString, keyPrefix = "p/",
      filenameAppendUuid = false, fixedClockMs = Some(0L),
      maxBytes = 200))
    val back = ObjectStoreSink.readBack(spark, dir.toString)
    assert(back.select("key").distinct().count() > 1) // really rolled
    assert(back.select("line").as[String].collect().toSet ==
      (1 to 100).map(i => f"line-$i%03d").toSet)
  }

  test("object store: gzip default extension log.gz and round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("osinkgz")
    ObjectStoreSink.writeBatch(events, ObjectStoreSink.Config(
      baseUri = dir.toString, keyPrefix = "date=%F/", codec = "json",
      compression = "gzip"))
    val back = ObjectStoreSink.readBack(spark, dir.toString)
      .as[(String, String)].collect()
    assert(back.forall(_._1.matches("date=2024-03-0[56]/\\d+-[0-9a-f-]{36}\\.log\\.gz")))
    assert(back.map(r => get_json_object(lit(r._2), "$.app")).nonEmpty)
    assert(back.map(_._2).count(_.contains("\"app\":\"web\"")) == 2)
  }

  test("aws_s3 sink from YAML config: bucket under endpoint, key_prefix") {
    val root = java.nio.file.Files.createTempDirectory("ys3")
    graft.plans.ConfigLoader.run(spark,
      s"""
        |sources:
        |  ev: {type: parquet, table: events}
        |sinks:
        |  out:
        |    type: aws_s3
        |    inputs: [ev]
        |    bucket: my-bucket
        |    endpoint: "$root"
        |    key_prefix: "type={{ event_type }}/"
        |    filename_append_uuid: false
        |    __fixed_clock_ms: 0
        |    encoding: {codec: json}
        |""".stripMargin,
      "/root/testdata/sf0.001",
      java.nio.file.Files.createTempDirectory("ys3work").toString).stopAll()
    val back = ObjectStoreSink.readBack(spark, s"$root/my-bucket")
    assert(back.count() ==
      spark.read.parquet("/root/testdata/sf0.001/events.parquet").count())
    assert(back.select("key").as[String].collect()
      .forall(_.startsWith("type=")))
  }
}
