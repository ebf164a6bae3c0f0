package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Observability-SaaS sinks against capturing local endpoints — each
  * asserts the service's documented body shape and auth header.
  */
class SaasSpec extends SparkSpec {
  import spark.implicits._

  private class JsonServer {
    val reqs = new java.util.concurrent.CopyOnWriteArrayList[
      (String, String, Map[String, String])]()
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    server.createContext("/", { ex =>
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val hdrs = Seq("Authorization", "DD-API-KEY", "Api-Key",
        "X-Honeycomb-Team", "x-api-key", "X-Axiom-Org-Id", "Content-Type")
        .flatMap(h => Option(ex.getRequestHeaders.getFirst(h)).map(h -> _))
        .toMap
      reqs.add((ex.getRequestURI.toString, body, hdrs))
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    server.start()
    def url: String = s"http://localhost:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
    def all: Seq[(String, String, Map[String, String])] =
      reqs.toArray.map(_.asInstanceOf[(String, String, Map[String, String])]).toSeq
  }

  private def metrics = Seq(
    ("requests_total", "incremental", 5.0, Map("az" -> "a")),
    ("cpu_pct", "absolute", 0.75, Map("az" -> "b")))
    .toDF("name", "kind", "value", "tags")
    .withColumn("ts", lit("2024-03-05T10:00:00Z").cast("timestamp"))

  private def logs = Seq(("web", "alpha", "info"), ("api", "beta", "warn"))
    .toDF("app", "message", "level")
    .withColumn("timestamp", lit("2024-03-05T10:00:00Z").cast("timestamp"))

  test("datadog_metrics v1 series: JSON tuple points, snake_case type") {
    val srv = new JsonServer
    try {
      SaasSinks.writeDatadogMetrics(metrics.coalesce(1),
        SaasSinks.DatadogMetricsConfig(srv.url, "dd-key-1"))
      val (path, body, hdrs) = srv.all.head
      assert(path == "/api/v1/series")
      assert(hdrs("DD-API-KEY") == "dd-key-1")
      // DatadogSeriesMetric (common/datadog.rs:44-67): snake_case type
      // strings, [ts, value] tuple points, kept-".0" f64 rendering
      assert(body.contains(
        """"metric":"requests_total","type":"count","interval":null"""))
      assert(body.contains(""""metric":"cpu_pct","type":"gauge""""))
      assert(body.contains(""""points":[[1709632800,5.0]]"""))
      assert(body.contains(""""points":[[1709632800,0.75]]"""))
      assert(body.contains(""""tags":["az:a"]"""))
    } finally srv.stop()
  }

  /** Captures binary (protobuf) POST bodies verbatim. */
  private class BytesServer {
    val reqs = new java.util.concurrent.CopyOnWriteArrayList[
      (String, Array[Byte], Map[String, String])]()
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    server.createContext("/", { ex =>
      val hdrs = Seq("DD-API-KEY", "Content-Type")
        .flatMap(h => Option(ex.getRequestHeaders.getFirst(h)).map(h -> _))
        .toMap
      reqs.add((ex.getRequestURI.toString,
        ex.getRequestBody.readAllBytes(), hdrs))
      ex.sendResponseHeaders(202, -1); ex.close()
    })
    server.start()
    def url: String = s"http://localhost:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
    def bodies(path: String): Seq[Array[Byte]] =
      reqs.toArray.map(_.asInstanceOf[(String, Array[Byte],
        Map[String, String])]).toSeq.filter(_._1 == path).map(_._2)
  }

  test("datadog_metrics v2: protobuf series round-trip the intake decoder") {
    import graft.streaming.DdAgentIntake
    val df = Seq(
      ("requests", "app", "incremental", "counter",
        Some(25.0), Option.empty[Double], Some(8000L),
        Map("env" -> "prod", "host" -> "h7", "device" -> "sda")),
      ("temp", null, "absolute", "gauge",
        Option.empty[Double], Some(21.5), Option.empty[Long],
        Map[String, String]()))
      .toDF("name", "namespace", "kind", "value_type",
        "counter_value", "gauge_value", "interval_ms", "tags")
      .withColumn("ts", lit("2024-03-05T10:00:00Z").cast("timestamp"))
    val srv = new BytesServer
    try {
      graft.sinks.DdMetrics.write(df.coalesce(1),
        graft.sinks.DdMetrics.Config(srv.url, "dd-key-2"))
      val bodies = srv.bodies("/api/v2/series")
      assert(bodies.nonEmpty)
      assert(srv.bodies("/api/beta/sketches").isEmpty) // no sketch rows
      val decoded = bodies.flatMap(DdAgentIntake.decodeSeriesV2(_))
      assert(decoded.size == 2)
      val counter = decoded.find(_.name == "requests").get
      // RATE on the wire (value÷interval), re-multiplied by the intake
      assert(counter.namespace == "app")
      assert(counter.kind == "incremental"
        && counter.value_type == "counter")
      assert(counter.counter_value == 25.0) // 25/8*8, exact (pow of 2)
      assert(counter.interval_ms == 8000L)
      assert(counter.host == "h7") // host tag → host resource
      assert(counter.tags.get("device").contains("sda"))
      assert(counter.tags.get("env").contains("prod"))
      assert(!counter.tags.contains("host"))
      val gauge = decoded.find(_.name == "temp").get
      assert(gauge.value_type == "gauge" && gauge.gauge_value == 21.5)
      assert(gauge.kind == "absolute" && gauge.interval_ms == null)
    } finally srv.stop()
  }

  test("datadog_metrics sketches: distribution converts via AgentSketch") {
    import graft.streaming.DdAgentIntake
    import graft.model.AgentSketch
    val df = Seq((1, "lat"))
      .toDF("id", "name")
      .withColumn("namespace", lit(null).cast("string"))
      .withColumn("kind", lit("incremental"))
      .withColumn("value_type", lit("distribution"))
      .withColumn("dist_samples", array(
        struct(lit(1.0).as("value"), lit(2L).as("rate")),
        struct(lit(3.0).as("value"), lit(3L).as("rate")),
        struct(lit(5.0).as("value"), lit(1L).as("rate"))))
      .withColumn("tags", map(lit("host"), lit("h1"),
        lit("env"), lit("prod")))
      .withColumn("ts", lit("2024-03-05T10:00:00Z").cast("timestamp"))
      .drop("id")
    val srv = new BytesServer
    try {
      graft.sinks.DdMetrics.write(df.coalesce(1),
        graft.sinks.DdMetrics.Config(srv.url, "dd-key-3"))
      assert(srv.bodies("/api/v2/series").isEmpty)
      val bodies = srv.bodies("/api/beta/sketches")
      assert(bodies.nonEmpty)
      val rows = bodies.flatMap(DdAgentIntake.decodeSketches(_))
      assert(rows.size == 1)
      val r = rows.head
      assert(r.name == "lat" && r.host == "h1")
      assert(r.tags == Map("env" -> "prod")) // host tag removed
      assert(r.sketch_cnt == 6L && r.sketch_min == 1.0
        && r.sketch_max == 5.0 && r.sketch_sum == 16.0)
      // transform_to_sketch inserts samples in order — the running
      // average accumulates like adjust_basic_stats
      val a1 = 0.0 + (1.0 - 0.0) * 2.0 / 2.0
      val a2 = a1 + (3.0 - a1) * 3.0 / 5.0
      val a3 = a2 + (5.0 - a2) * 1.0 / 6.0
      assert(r.sketch_avg == a3)
      assert(r.sketch_k == Seq(AgentSketch.key(1.0).toLong,
        AgentSketch.key(3.0).toLong, AgentSketch.key(5.0).toLong))
      assert(r.sketch_n == Seq(2L, 3L, 1L))
      assert(r.timestamp_s == 1709632800L)
    } finally srv.stop()
  }

  test("datadog_metrics sketches: histogram interpolates, sketch rows pass through") {
    import graft.streaming.DdAgentIntake
    import graft.model.AgentSketch
    val hist = Seq((1, "took"))
      .toDF("id", "name")
      .withColumn("kind", lit("incremental"))
      .withColumn("value_type", lit("histogram"))
      .withColumn("histo_buckets", array(
        struct(lit(1.0).as("upper_limit"), lit(4L).as("count")),
        struct(lit(2.0).as("upper_limit"), lit(2L).as("count")),
        struct(lit(Double.PositiveInfinity).as("upper_limit"),
          lit(1L).as("count"))))
      .withColumn("ts", lit("2024-03-05T10:00:00Z").cast("timestamp"))
      .drop("id")
    val srv = new BytesServer
    try {
      graft.sinks.DdMetrics.write(hist.coalesce(1),
        graft.sinks.DdMetrics.Config(srv.url, "k"))
      val rows = srv.bodies("/api/beta/sketches")
        .flatMap(DdAgentIntake.decodeSketches(_))
      assert(rows.size == 1)
      val r = rows.head
      assert(r.sketch_cnt == 7L && r.sketch_n.sum == 7L)
      assert(r.sketch_min ==
        AgentSketch.binLowerBound(AgentSketch.key(1.0).toLong))
      assert(r.sketch_max ==
        AgentSketch.binLowerBound(AgentSketch.key(2.0).toLong))
      // sketch-typed rows pass their lanes straight through
      val sk = Seq((1, "pass"))
        .toDF("id", "name")
        .withColumn("kind", lit("incremental"))
        .withColumn("value_type", lit("sketch"))
        .withColumn("sketch", struct(
          lit(4L).as("cnt"), lit(1.0).as("min"), lit(3.0).as("max"),
          lit(8.0).as("sum"), lit(2.0).as("avg"),
          typedLit(Seq(AgentSketch.key(1.0).toLong,
            AgentSketch.key(3.0).toLong)).as("k"),
          typedLit(Seq(2L, 2L)).as("n")))
        .withColumn("ts", lit("2024-03-05T10:00:00Z").cast("timestamp"))
        .drop("id")
      graft.sinks.DdMetrics.write(sk.coalesce(1),
        graft.sinks.DdMetrics.Config(srv.url, "k"))
      val passed = srv.bodies("/api/beta/sketches")
        .flatMap(DdAgentIntake.decodeSketches(_))
        .find(_.name == "pass").get
      assert(passed.sketch_cnt == 4L && passed.sketch_sum == 8.0)
      assert(passed.sketch_k.size == 2 && passed.sketch_n == Seq(2L, 2L))
    } finally srv.stop()
  }

  /** Sparse-union metric rows in the engine's Metrics shape. */
  private def typedMetrics = Seq(
    ("requests", "app", "incremental", "counter",
      Some(25.0), Option.empty[Double],
      Map("env" -> "prod", "host" -> "h7")),
    ("temp", null, "absolute", "gauge",
      Option.empty[Double], Some(21.5), Map[String, String]()))
    .toDF("name", "namespace", "kind", "value_type",
      "counter_value", "gauge_value", "tags")
    .withColumn("ts", lit("2024-03-05T10:00:00Z").cast("timestamp"))

  test("splunk_hec_metrics envelope: fields/_value/time/host/index") {
    val df = typedMetrics
    val lines = df.select(Envelopes.hecMetric(df, hostKey = "host",
      index = "{{ tags.env }}").as("l")).as[String].collect()
    val counter = lines.find(_.contains("requests")).get
    def j(l: String, p: String) =
      spark.range(1).select(get_json_object(lit(l), p)).as[String].head()
    assert(j(counter, "$.event") == "metric")
    assert(j(counter, "$.fields.metric_name") == "app.requests")
    assert(j(counter, "$.fields._value") == "25.0")
    // the env tag is consumed by the index template → not in fields
    assert(j(counter, "$.fields.env") == null)
    assert(j(counter, "$.fields.host") == "h7")
    assert(j(counter, "$.host") == "h7")
    assert(j(counter, "$.index") == "prod")
    // time renders as the serde f64 decimal, not scientific notation
    assert(counter.contains("\"time\":1709632800.000"))
    // _value rides as a bare JSON number, not a string
    assert(counter.contains("\"_value\":25.0"))
    val gauge = lines.find(_.contains("temp")).get
    assert(j(gauge, "$.fields.metric_name") == "temp") // no namespace
    assert(j(gauge, "$.fields._value") == "21.5")
    assert(j(gauge, "$.host") == null) // no host tag
  }

  test("sematext_metrics: influx v1 line with token/metric_type tags") {
    val df = typedMetrics
    val lines = df.select(
      Envelopes.sematextLine(df, "tok-1", "vector").as("l"))
      .as[String].collect().sorted
    assert(lines.contains(
      "app,env=prod,host=h7,metric_type=counter,token=tok-1 " +
        "requests=25.0 1709632800000000000"))
    // namespace absent → the configured default namespace
    assert(lines.contains(
      "vector,metric_type=gauge,token=tok-1 temp=21.5 " +
        "1709632800000000000"))
  }

  test("humio_metrics sink: metric_to_log shaping over HEC ingest") {
    val srv = new JsonServer
    try {
      SaasSinks.writeHumioMetrics(typedMetrics.coalesce(1), srv.url,
        "hum-tok")
      val (path, body, hdrs) = srv.all.head
      assert(path == "/api/v1/ingest/hec")
      assert(hdrs("Authorization") == "Bearer hum-tok")
      val counter = body.split("\n").find(_.contains("requests")).get
      def j(p: String) = spark.range(1)
        .select(get_json_object(lit(counter), p)).as[String].head()
      assert(j("$.event.name") == "requests")
      assert(j("$.event.namespace") == "app")
      assert(j("$.event.kind") == "incremental")
      assert(j("$.event.counter.value") == "25.0")
      assert(j("$.event.gauge") == null) // sparse union stays sparse
      assert(j("$.event.tags.env") == "prod")
      assert(j("$.host") == "h7") // host_key tag → HEC host
    } finally srv.stop()
  }

  test("greptimedb_metrics sink: RowInsertRequests over gRPC Handle") {
    import graft.codecs.ProtobufCodec
    val got = new java.util.concurrent.CopyOnWriteArrayList[
      (String, Array[Byte])]()
    val srv = new graft.streaming.Grpc.Server(0, (path, bytes) => {
      got.add((path, bytes)); Array.emptyByteArray
    })
    try {
      GreptimeMetrics.write(typedMetrics.coalesce(1),
        GreptimeMetrics.Config(s"127.0.0.1:${srv.boundPort}",
          dbname = "metricsdb"))
      assert(got.size() == 1)
      val (path, bytes) = got.get(0)
      assert(path == "/greptime.v1.GreptimeDatabase/Handle")
      val req = ProtobufCodec.decodeTo(
        GreptimeMetrics.greptimeRequestSchema, bytes)
      val header = req.getAs[org.apache.spark.sql.Row]("header")
      assert(header.getAs[String]("dbname") == "metricsdb")
      val inserts = req.getAs[org.apache.spark.sql.Row]("row_inserts")
        .getAs[Seq[org.apache.spark.sql.Row]]("inserts")
      assert(inserts.map(_.getAs[String]("table_name")).toSet ==
        Set("app_requests", "temp")) // ns_name | name
      val counterIns = inserts.find(
        _.getAs[String]("table_name") == "app_requests").get
      val rows = counterIns.getAs[org.apache.spark.sql.Row]("rows")
      val schema = rows.getAs[Seq[org.apache.spark.sql.Row]]("schema")
      // columns: greptime_timestamp(ms,TIMESTAMP) + sorted tags(TAG) +
      // greptime_value(FLOAT64,FIELD)
      assert(schema.map(r => (r.getAs[String]("column_name"),
        r.getAs[Long]("datatype"), r.getAs[Long]("semantic_type"))) ==
        Seq(("greptime_timestamp", 16L, 2L), ("env", 12L, 0L),
          ("host", 12L, 0L), ("greptime_value", 10L, 1L)))
      val vals = rows.getAs[Seq[org.apache.spark.sql.Row]]("rows").head
        .getAs[Seq[org.apache.spark.sql.Row]]("values")
      assert(vals(0).getAs[Long]("timestamp_millisecond_value") ==
        1709632800000L)
      assert(vals(1).getAs[String]("string_value") == "prod")
      assert(vals(2).getAs[String]("string_value") == "h7")
      assert(vals(3).getAs[Double]("f64_value") == 25.0)
    } finally srv.stop()
  }

  test("greptimedb_metrics: distribution encodes DistributionStatistic") {
    import graft.codecs.ProtobufCodec
    // samples 1.0×2, 5.0×1, 3.0×3 (rate-0 ignored) → sorted cum
    // [1.0:2, 3.0:5, 5.0:6]; count 6, sum 16, min 1, max 5;
    // R-3 ranks: p50→r3→3.0, p75→r5(round 4.5→5)→3.0, p90→r5→3.0,
    // p95→r6→5.0, p99→r6→5.0 (statistic.rs find_quantile)
    val df = Seq((1L, "lat", "incremental", "distribution",
        Seq((1.0, 2L), (5.0, 1L), (3.0, 3L), (9.0, 0L))))
      .toDF("id", "name", "kind", "value_type", "raw")
      .withColumn("dist_samples", transform(col("raw"), s => struct(
        s.getField("_1").as("value"), s.getField("_2").as("rate"))))
      .withColumn("ts", lit("2024-03-05T10:00:00Z").cast("timestamp"))
      .drop("raw", "id")
    val got = new java.util.concurrent.CopyOnWriteArrayList[Array[Byte]]()
    val srv = new graft.streaming.Grpc.Server(0, (_, bytes) => {
      got.add(bytes); Array.emptyByteArray
    })
    try {
      GreptimeMetrics.write(df.coalesce(1),
        GreptimeMetrics.Config(s"127.0.0.1:${srv.boundPort}"))
      val req = ProtobufCodec.decodeTo(
        GreptimeMetrics.greptimeRequestSchema, got.get(0))
      val ins = req.getAs[org.apache.spark.sql.Row]("row_inserts")
        .getAs[Seq[org.apache.spark.sql.Row]]("inserts").head
      val rows = ins.getAs[org.apache.spark.sql.Row]("rows")
      val names = rows.getAs[Seq[org.apache.spark.sql.Row]]("schema")
        .map(_.getAs[String]("column_name"))
      assert(names == Seq("greptime_timestamp", "min", "max", "avg",
        "sum", "count", "p50", "p75", "p90", "p95", "p99"))
      val vals = rows.getAs[Seq[org.apache.spark.sql.Row]]("rows").head
        .getAs[Seq[org.apache.spark.sql.Row]]("values")
        .drop(1).map(_.getAs[Double]("f64_value"))
      assert(vals == Seq(1.0, 5.0, 16.0 / 6.0, 16.0, 6.0,
        3.0, 3.0, 3.0, 5.0, 5.0))
    } finally srv.stop()
  }

  test("greptimedb_metrics: agent sketches encode stats + quantiles") {
    import graft.codecs.ProtobufCodec
    import graft.model.AgentSketch
    // two bins: 2 samples near 1.0 + 2 near 3.0 (the dd intake's
    // sketch struct shape)
    val df = Seq((1L, "lat")).toDF("id", "name")
      .withColumn("kind", lit("incremental"))
      .withColumn("value_type", lit("sketch"))
      .withColumn("sketch", struct(
        lit(4L).as("cnt"), lit(1.0).as("min"), lit(3.0).as("max"),
        lit(8.0).as("sum"), lit(2.0).as("avg"),
        typedLit(Seq(AgentSketch.key(1.0).toLong,
          AgentSketch.key(3.0).toLong)).as("k"),
        typedLit(Seq(2L, 2L)).as("n")))
      .withColumn("ts", lit("2024-03-05T10:00:00Z").cast("timestamp"))
      .drop("id")
    val got = new java.util.concurrent.CopyOnWriteArrayList[Array[Byte]]()
    val srv = new graft.streaming.Grpc.Server(0, (_, bytes) => {
      got.add(bytes); Array.emptyByteArray
    })
    try {
      GreptimeMetrics.write(df.coalesce(1),
        GreptimeMetrics.Config(s"127.0.0.1:${srv.boundPort}"))
      val req = ProtobufCodec.decodeTo(
        GreptimeMetrics.greptimeRequestSchema, got.get(0))
      val rows = req.getAs[org.apache.spark.sql.Row]("row_inserts")
        .getAs[Seq[org.apache.spark.sql.Row]]("inserts").head
        .getAs[org.apache.spark.sql.Row]("rows")
      val names = rows.getAs[Seq[org.apache.spark.sql.Row]]("schema")
        .map(_.getAs[String]("column_name"))
      assert(names == Seq("greptime_timestamp", "count", "min", "max",
        "sum", "avg", "p50", "p75", "p90", "p95", "p99"))
      val vals = rows.getAs[Seq[org.apache.spark.sql.Row]]("rows").head
        .getAs[Seq[org.apache.spark.sql.Row]]("values")
        .drop(1).map(_.getAs[Double]("f64_value"))
      assert(vals.take(5) == Seq(4.0, 1.0, 3.0, 8.0, 2.0))
      // quantiles match the AgentSketch math exactly and stay clamped
      val expected = Seq(0.5, 0.75, 0.90, 0.95, 0.99).map(p =>
        AgentSketch.quantile(Seq(AgentSketch.key(1.0).toLong,
          AgentSketch.key(3.0).toLong), Seq(2L, 2L), 4L, 1.0, 3.0, p).get)
      assert(vals.drop(5) == expected)
      assert(vals.drop(5).forall(v => v >= 1.0 && v <= 3.0))
    } finally srv.stop()
  }

  test("datadog_events sink: one v1 event per request") {
    val srv = new JsonServer
    try {
      SaasSinks.writeDatadogEvents(logs.coalesce(1),
        SaasSinks.DatadogEventsConfig(srv.url, "dd-key-2"))
      assert(srv.all.size == 2)
      assert(srv.all.forall(_._1 == "/api/v1/events"))
      assert(srv.all.exists(_._2.contains(""""title":"alpha"""")))
      assert(srv.all.head._2.contains(""""date_happened":1709632800"""))
    } finally srv.stop()
  }

  test("datadog_traces: protobuf TracerPayload round-trips the intake") {
    import graft.streaming.DdAgentIntake
    val spans = Seq(
      (10L, 1L, 0L, "root", "web", 12.5, 0L),
      (10L, 2L, 1L, "q1", "db", 3.0, 1L),
      (11L, 3L, 0L, "root", "web", 100.0, 0L))
      .toDF("trace_id", "span_id", "parent_id", "name", "service",
        "duration_ms", "error")
      .withColumn("resource", concat(lit("r-"), col("name")))
      .withColumn("timestamp",
        lit("2024-03-05T10:00:00Z").cast("timestamp"))
    val srv = new BytesServer
    try {
      graft.sinks.DdTraces.write(spans.coalesce(1),
        graft.sinks.DdTraces.Config(srv.url, "dd-key-3", env = "prod",
          agentVersion = "7.0", computeStats = false))
      val bodies = srv.bodies("/api/v0.2/traces")
      assert(bodies.nonEmpty)
      // decode with the datadog_agent source's own trace decode leg —
      // the tracerPayloads (v2) form
      val traces = bodies.flatMap(DdAgentIntake.decodeTraces(_))
      assert(traces.size == 2)
      assert(traces.forall(_.payload_version == "v2"))
      assert(traces.forall(_.env == "prod"))
      assert(traces.forall(_.agent_version == "7.0"))
      assert(traces.forall(_.priority == 1L)) // sampler default
      val t10 = traces.find(_.spans.exists(_.trace_id == 10L)).get
      assert(t10.spans.size == 2)
      val s1 = t10.spans.find(_.span_id == 1L).get
      assert(s1.service == "web" && s1.name == "root"
        && s1.resource == "r-root" && s1.parent_id == 0L)
      assert(s1.start_ns == 1709632800000000000L)
      assert(s1.duration == 12500000L) // 12.5 ms → ns
      assert(t10.spans.find(_.span_id == 2L).get.error == 1L)
    } finally srv.stop()
  }

  test("datadog_traces APM stats: bucket aggregation + msgpack StatsPayload") {
    import graft.codecs.MsgPack
    // two traces in one 10 s bucket: service web has 2 top-level spans
    // (one error), db has 1 measured span; weight 2 via _sample_rate .5
    val mk = (tid: Long, sid: Long, pid: Long, svc: String, err: Long,
              durMs: Double, rate: Option[Double]) =>
      (tid, sid, pid, svc, err, durMs,
        Map("_top_level" -> 1.0) ++ rate.map("_sample_rate" -> _))
    val spans = Seq(
      mk(1L, 1L, 0L, "web", 0L, 10.0, None),
      mk(2L, 2L, 0L, "web", 1L, 20.0, Some(0.5)),
      mk(2L, 3L, 2L, "db", 0L, 5.0, None))
      .toDF("trace_id", "span_id", "parent_id", "service", "error",
        "duration_ms", "metrics")
      .withColumn("name", concat(col("service"), lit("-op")))
      .withColumn("timestamp",
        lit("2024-03-05T10:00:03Z").cast("timestamp"))
    val traces = graft.sinks.DdTraces.asTraces(spans)
      .withColumn("host", lit("agent-host"))
    val cfg = graft.sinks.DdTraces.Config("http://x", "k", env = "prod")
    val out = graft.sinks.DdTraces.apmStats(traces, cfg).collect()
    // groups: (web, web-op) and (db, db-op); db span is NOT top-level?
    // it has _top_level=1.0 per mk → all three eligible
    val web = out.find(_.getAs[String]("service") == "web").get
    val webStats = web.getAs[org.apache.spark.sql.Row]("stats")
    // trace 2 has weight 2 (rate .5 on its root): hits = 1 + 2
    assert(webStats.getAs[Long]("hits") == 3L)
    assert(webStats.getAs[Long]("errors") == 2L)
    assert(webStats.getAs[Long]("top_level_hits") == 3L)
    // duration ns: 10ms×1 + 20ms×2 = 50ms
    assert(webStats.getAs[Long]("duration") == 50000000L)
    // ok sketch holds the non-error span only, err sketch the error one
    val okN = webStats.getSeq[org.apache.spark.sql.Row](
      webStats.fieldIndex("ok_bins")).map(_.getAs[Long]("n")).sum
    val errN = webStats.getSeq[org.apache.spark.sql.Row](
      webStats.fieldIndex("err_bins")).map(_.getAs[Long]("n")).sum
    assert(okN == 1L && errN == 1L)
    val db = out.find(_.getAs[String]("service") == "db").get
    assert(db.getAs[org.apache.spark.sql.Row]("stats")
      .getAs[Long]("hits") == 2L) // weight 2 from its trace's root
    // bucket aligned to 10 s from span END time
    assert(out.forall(_.getAs[Long]("bucket_start") % 10000000000L == 0L))

    // the full write path posts a decodable msgpack StatsPayload
    val srv = new BytesServer
    try {
      graft.sinks.DdTraces.write(spans.coalesce(1),
        graft.sinks.DdTraces.Config(srv.url, "k", env = "prod",
          agentVersion = "7.0"))
      val stats = srv.bodies("/api/v0.2/stats")
      assert(stats.size == 1)
      val v = MsgPack.read(new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(stats.head)))
      def field(m: MsgPack.Value, k: String): MsgPack.Value =
        m.asInstanceOf[MsgPack.MpMap].v
          .find(_._1 == MsgPack.MpString(k)).get._2
      assert(field(v, "AgentEnv") == MsgPack.MpString("prod"))
      assert(field(v, "AgentVersion") == MsgPack.MpString("7.0"))
      assert(field(v, "ClientComputed") == MsgPack.MpBool(false))
      val payloads = field(v, "Stats").asInstanceOf[MsgPack.MpArray].v
      assert(payloads.nonEmpty)
      val buckets = field(payloads.head, "Stats")
        .asInstanceOf[MsgPack.MpArray].v
      assert(field(buckets.head, "Duration") ==
        MsgPack.MpLong(10000000000L))
      val grouped = field(buckets.head, "Stats")
        .asInstanceOf[MsgPack.MpArray].v
      val webG = grouped.find(g =>
        field(g, "Service") == MsgPack.MpString("web")).get
      assert(field(webG, "Hits") == MsgPack.MpLong(3L))
      assert(field(webG, "Errors") == MsgPack.MpLong(2L))
      // OkSummary decodes as the public ddsketch_full proto with the
      // agent's gamma and one positive bin
      val okBytes = field(webG, "OkSummary")
        .asInstanceOf[MsgPack.MpBytes].v
      val sk = graft.codecs.ProtobufCodec.decodeTo(
        graft.sinks.DdTraces.ddSketchFullSchema, okBytes)
      val mapping = sk.getAs[org.apache.spark.sql.Row]("mapping")
      assert(mapping.getAs[Double]("gamma") ==
        graft.model.AgentSketch.GammaV)
      val posStore = sk.getAs[org.apache.spark.sql.Row]("positive_values")
      val pos = posStore.getSeq[org.apache.spark.sql.Row](
        posStore.fieldIndex("bin_counts"))
      assert(pos.map(_.getAs[Double]("value")).sum == 1.0)
    } finally srv.stop()
  }

  test("new_relic sink: logs api envelope") {
    val srv = new JsonServer
    try {
      SaasSinks.writeNewRelic(logs.coalesce(1), SaasSinks.NewRelicConfig(
        srv.url, "lic-1", api = "logs"))
      val (path, body, hdrs) = srv.all.head
      assert(path == "/log/v1")
      assert(hdrs("Api-Key") == "lic-1")
      assert(body.startsWith("""[{"logs":["""))
      assert(body.contains(""""message":"alpha""""))
      assert(body.contains(""""attributes":{"app":"web""""))
    } finally srv.stop()
  }

  test("new_relic sink: events api adds eventType") {
    val srv = new JsonServer
    try {
      SaasSinks.writeNewRelic(logs.coalesce(1), SaasSinks.NewRelicConfig(
        srv.url, "lic-2", accountId = "42", api = "events"))
      val (path, body, _) = srv.all.head
      assert(path == "/v1/accounts/42/events")
      assert(body.contains(""""eventType":"VectorEvent""""))
    } finally srv.stop()
  }

  test("honeycomb sink: /1/batch with time+data and team header") {
    val srv = new JsonServer
    try {
      SaasSinks.writeHoneycomb(logs.coalesce(1), SaasSinks.HoneycombConfig(
        srv.url, "hc-key", "my-ds"))
      val (path, body, hdrs) = srv.all.head
      assert(path == "/1/batch/my-ds")
      assert(hdrs("X-Honeycomb-Team") == "hc-key")
      assert(body.contains(""""time":"2024-03-05T10:00:00Z""""))
      assert(body.contains(""""data":{"app":"web""""))
    } finally srv.stop()
  }

  test("axiom sink: dataset ingest with bearer + org id") {
    val srv = new JsonServer
    try {
      SaasSinks.writeAxiom(logs.coalesce(1), SaasSinks.AxiomConfig(
        srv.url, "tok-9", "ds1", orgId = "org7"))
      val (path, body, hdrs) = srv.all.head
      assert(path == "/v1/datasets/ds1/ingest")
      assert(hdrs("Authorization") == "Bearer tok-9")
      assert(hdrs("X-Axiom-Org-Id") == "org7")
      assert(body.startsWith("[{"))
    } finally srv.stop()
  }

  test("mezmo sink: /logs/ingest lines with basic auth") {
    val srv = new JsonServer
    try {
      SaasSinks.writeMezmo(logs.coalesce(1), SaasSinks.MezmoConfig(
        srv.url, "mz-key", hostname = "h9"))
      val (path, body, hdrs) = srv.all.head
      assert(path == "/logs/ingest?hostname=h9")
      val basic = java.util.Base64.getEncoder.encodeToString(
        "mz-key:".getBytes("UTF-8"))
      assert(hdrs("Authorization") == s"Basic $basic")
      assert(body.startsWith("""{"lines":["""))
      assert(body.contains(""""line":"alpha""""))
      assert(body.contains(""""app":"web""""))
    } finally srv.stop()
  }

  test("humio + sematext + appsignal + keep envelopes") {
    val srv = new JsonServer
    try {
      SaasSinks.writeHumio(logs.coalesce(1), srv.url, "humio-tok")
      SaasSinks.writeSematext(logs.coalesce(1), srv.url, "sem-tok")
      SaasSinks.writeAppsignal(logs.coalesce(1),
        SaasSinks.AppsignalConfig(srv.url, "as-key"))
      SaasSinks.writeKeep(logs.coalesce(1),
        SaasSinks.KeepConfig(srv.url + "/alerts/event/vectordev", "keep-key"))
      val all = srv.all
      val humio = all.find(_._1 == "/api/v1/ingest/hec").get
      assert(humio._3("Authorization") == "Bearer humio-tok")
      assert(humio._2.contains("\"event\":{"))
      val sem = all.find(_._1 == "/_bulk").get
      assert(sem._2.contains("\"_index\":\"sem-tok\""))
      val as = all.find(_._1 == "/vector/events").get
      assert(as._3("Authorization") == "Bearer as-key")
      assert(as._2.contains("\"log\":{"))
      val keep = all.find(_._1 == "/alerts/event/vectordev").get
      assert(keep._3("x-api-key") == "keep-key")
    } finally srv.stop()
  }

  test("statsd sink: lines over udp with kind→type and tags") {
    val sock = new java.net.DatagramSocket(0)
    sock.setSoTimeout(5000)
    try {
      SaasSinks.writeStatsd(metrics.coalesce(1), SaasSinks.StatsdSinkConfig(
        s"127.0.0.1:${sock.getLocalPort}", "udp",
        defaultNamespace = Some("graft")))
      val got = scala.collection.mutable.Set.empty[String]
      while (got.size < 2) {
        val p = new java.net.DatagramPacket(new Array[Byte](65536), 65536)
        sock.receive(p)
        new String(p.getData, 0, p.getLength, "UTF-8").split("\n")
          .filter(_.nonEmpty).foreach(got += _)
      }
      assert(got == Set("graft.requests_total:5.0|c|#az:a",
        "graft.cpu_pct:0.75|g|#az:b"))
    } finally sock.close()
  }

  test("papertrail sink: syslog lines over tcp with process template") {
    val server = new java.net.ServerSocket(0)
    val lines = new java.util.concurrent.LinkedBlockingQueue[String]()
    val t = new Thread(() => {
      try {
        while (true) {
          val s = server.accept()
          val r = new java.io.BufferedReader(
            new java.io.InputStreamReader(s.getInputStream, "UTF-8"))
          var l = r.readLine()
          while (l != null) { lines.add(l); l = r.readLine() }
          s.close()
        }
      } catch { case _: Exception => () }
    })
    t.setDaemon(true); t.start()
    try {
      SaasSinks.writePapertrail(logs.coalesce(1),
        SaasSinks.PapertrailConfig(s"127.0.0.1:${server.getLocalPort}",
          process = "{{ app }}"))
      val got = (1 to 2).map(_ =>
        lines.poll(5, java.util.concurrent.TimeUnit.SECONDS)).toSet
      assert(got.exists(l => l != null && l.startsWith("<14>") &&
        l.contains(" web[0]: alpha")))
      assert(got.exists(l => l != null && l.contains(" api[0]: beta")))
    } finally server.close()
  }
}
