package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming runner: source and sink surface mirroring the
  * reference's topology edges (SURVEY §2.4-2.5).
  *
  * Reference: sources in /root/reference/src/sources/ (file tail, kafka,
  * socket, demo_logs, stdin, http), sinks in src/sinks/ (console, file,
  * kafka, blackhole, http, …). Spark-native mappings: `readStream`
  * format("kafka"/"socket"/"text"/"rate"), `writeStream`
  * format("kafka"/"parquet"/"console"/"noop"/"memory"), `foreachBatch`
  * for request-style sinks. Batching, retries, and acknowledgement are
  * checkpointing + the connector (stronger guarantees than the
  * reference's ack plumbing — see SURVEY §1.4).
  */
object StreamRunner {

  // ---- sources ---------------------------------------------------------

  /** Kafka source (reference src/sources/kafka.rs → native connector). */
  def kafka(spark: SparkSession, servers: String, topics: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topics)
      .load()

  /** TCP socket line source (reference src/sources/socket/). */
  def socket(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream.format("socket")
      .option("host", host).option("port", port).load()

  /** Directory-of-files source (reference src/sources/file.rs; Spark's
    * file source assumes immutable files — rotation-style tailing is the
    * documented difference).
    */
  def textDir(spark: SparkSession, path: String): DataFrame =
    spark.readStream.format("text").load(path)

  /** `demo_logs` — synthetic generator over the rate source.
    *
    * Reference: /root/reference/src/sources/demo_logs.rs:102-150 (formats
    * Shuffle, ApacheCommon, ApacheError, Syslog, BsdSyslog, Json). The
    * rate source provides (timestamp, value); deterministic expressions
    * derive the formatted line — same shape, engine-native.
    */
  def demoLogs(spark: SparkSession, rowsPerSecond: Int,
               format: String = "json",
               lines: Seq[String] = Nil,
               sequence: Boolean = false): DataFrame = {
    val base = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
    val host = concat(lit("host"), pmod(col("value"), lit(50)))
    val app = concat(lit("app"), pmod(col("value"), lit(5)))
    val status = element_at(
      array(lit(200), lit(200), lit(200), lit(404), lit(500)),
      (pmod(col("value"), lit(5)) + 1).cast("int"))
    val line = format match {
      case "shuffle" =>
        // OutputFormat::Shuffle (demo_logs.rs:104): draw from `lines`
        // (deterministic rotation here), `sequence: true` prefixes an
        // increasing number
        require(lines.nonEmpty, "demo_logs shuffle: lines must be non-empty")
        val pick = element_at(array(lines.map(lit): _*),
          (pmod(col("value"), lit(lines.length)) + 1).cast("int"))
        if (sequence)
          concat(col("value").cast("string"), lit(" "), pick)
        else pick
      case "syslog" | "bsd_syslog" =>
        format_string("<%d>%s %s %s[%d]: demo message %d",
          pmod(col("value"), lit(192)).cast("int"),
          date_format(col("timestamp"), "MMM dd HH:mm:ss"),
          host, app, pmod(col("value"), lit(9999)).cast("int") + 1,
          col("value"))
      case "apache_common" =>
        format_string("%s - - [%s] \"GET /path/%d HTTP/1.1\" %d %d",
          host, date_format(col("timestamp"), "dd/MMM/yyyy:HH:mm:ss Z"),
          pmod(col("value"), lit(100)), status,
          pmod(col("value") * 37, lit(9000)) + 100)
      case "apache_error" =>
        format_string("[%s] [error] [client %s] demo error %d",
          date_format(col("timestamp"), "EEE MMM dd HH:mm:ss yyyy"),
          host, col("value"))
      case _ =>
        to_json(struct(col("timestamp").as("ts"), host.as("host"),
          app.as("app"), status.as("status"), col("value").as("seq")))
    }
    base.select(col("timestamp"), col("value"), line.as("message"))
  }

  /** `exec` source, one-shot form (reference src/sources/exec/): run a
    * process on the driver, one row per stdout line.
    */
  def exec(spark: SparkSession, command: Seq[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val proc = new ProcessBuilder(command.asJava).redirectErrorStream(true).start()
    val lines = scala.io.Source.fromInputStream(proc.getInputStream).getLines().toSeq
    proc.waitFor()
    import spark.implicits._
    lines.toDF("message")
  }

  /** `exec` source, SCHEDULED mode (exec/config.rs Mode::Scheduled +
    * `scheduled.exec_interval_secs`): re-invoke the command on an
    * interval from a driver thread, each run's stdout lines becoming
    * events on a streaming DataFrame. (Mode::Streaming — one long-lived
    * process with respawn — is the same MemoryStream shape fed by a
    * single reader; the scheduled form covers the cron-style use.)
    */
  final class ExecScheduledSource(spark: SparkSession,
                                  command: Seq[String], intervalMs: Long) {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    private val mem = MemoryStream[String]
    @volatile private var running = false
    def runOnce(): Unit = {
      import scala.jdk.CollectionConverters._
      val proc = new ProcessBuilder(command.asJava)
        .redirectErrorStream(true).start()
      val lines = scala.io.Source.fromInputStream(proc.getInputStream)
        .getLines().toIndexedSeq
      proc.waitFor()
      if (lines.nonEmpty) mem.addData(lines)
    }
    private val thread = new Thread(() => {
      while (running) {
        try runOnce() catch { case _: Exception => () }
        Thread.sleep(intervalMs)
      }
    }, s"exec-scheduled")
    thread.setDaemon(true)
    def startPolling(): Unit = { running = true; thread.start() }
    def df: DataFrame = mem.toDF().withColumnRenamed("value", "message")
    def stop(): Unit = running = false
  }

  def execScheduled(spark: SparkSession, command: Seq[String],
                    intervalMs: Long): ExecScheduledSource =
    new ExecScheduledSource(spark, command, intervalMs)

  /** `stdin` / `file_descriptors` source: driver stdin, batch form. */
  def stdin(spark: SparkSession): DataFrame = {
    import spark.implicits._
    scala.io.Source.stdin.getLines().toSeq.toDF("message")
  }

  /** `http_server` source (reference src/sources/http_server.rs): a real
    * HTTP endpoint (JDK HttpServer, driver-side) whose request bodies
    * are newline-framed into a MemoryStream — the same accept→frame→
    * decode pipeline shape as the reference, with downstream decoding
    * done by the codec layer on the returned DataFrame. Driver-side
    * ingestion is the documented scale boundary (the reference's
    * http_server is likewise a single listener; at scale a load
    * balancer fans out over many single-listener instances).
    */
  final class HttpServerSource(spark: SparkSession, port: Int, path: String,
                               tls: Option[javax.net.ssl.SSLContext] = None,
                               // expected Authorization header value
                               // (src/sources/http_server.rs auth:
                               // username+password -> Basic); None = open
                               auth: Option[String] = None,
                               // http_server.rs option set: named
                               // request headers / query parameters ride
                               // as event map fields; `path_key` stamps
                               // the request path; `strict_path` rejects
                               // non-exact paths with 404; `method`
                               // restricts the verb (405 otherwise);
                               // `response_code` is the success reply
                               headerNames: Seq[String] = Nil,
                               queryParams: Seq[String] = Nil,
                               pathKey: Option[String] = Some("path"),
                               strictPath: Boolean = true,
                               method: String = "POST",
                               responseCode: Int = 200) {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    private val mem =
      MemoryStream[(String, String, Map[String, String], Map[String, String])]
    private val server = tls match {
      case Some(ctx) =>
        // `tls:` block → HTTPS listener (reference src/sources/util/http:
        // every HTTP-push source takes TlsEnableableConfig)
        val s = com.sun.net.httpserver.HttpsServer.create(
          new java.net.InetSocketAddress(port), 0)
        s.setHttpsConfigurator(
          new com.sun.net.httpserver.HttpsConfigurator(ctx))
        s
      case None => com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress(port), 0)
    }
    server.createContext(path, (ex: com.sun.net.httpserver.HttpExchange) => {
      try {
        val reqPath = ex.getRequestURI.getPath
        val authorized = auth.forall(expected =>
          expected == ex.getRequestHeaders.getFirst("Authorization"))
        if (!authorized) {
          ex.getRequestBody.readAllBytes() // drain
          ex.sendResponseHeaders(401, -1)
        } else if (strictPath && reqPath != path) {
          ex.getRequestBody.readAllBytes()
          ex.sendResponseHeaders(404, -1)
        } else if (!ex.getRequestMethod.equalsIgnoreCase(method)) {
          ex.getRequestBody.readAllBytes()
          ex.sendResponseHeaders(405, -1)
        } else {
          val hdrs = headerNames.map(h =>
            h -> Option(ex.getRequestHeaders.getFirst(h)).getOrElse("")).toMap
          val query = {
            val q = Option(ex.getRequestURI.getQuery).getOrElse("")
            val parsed = q.split("&").filter(_.contains("="))
              .map { kv =>
                val Array(k, v) = kv.split("=", 2); k -> v
              }.toMap
            queryParams.map(p => p -> parsed.getOrElse(p, "")).toMap
          }
          val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
          val lines = body.split("\n").filter(_.nonEmpty)
          if (lines.nonEmpty)
            mem.addData(lines.toIndexedSeq.map(l =>
              (l, reqPath, hdrs, query)))
          ex.sendResponseHeaders(responseCode, -1)
        }
      } finally ex.close()
    })
    server.setExecutor(null)
    server.start()
    def boundPort: Int = server.getAddress.getPort
    def df: DataFrame = {
      import org.apache.spark.sql.functions.col
      val d = mem.toDF()
      val base = Seq(d("_1").as("message")) ++
        pathKey.filter(_.nonEmpty).map(k => d("_2").as(k)) ++
        (if (headerNames.nonEmpty) Seq(d("_3").as("headers")) else Nil) ++
        (if (queryParams.nonEmpty)
          Seq(d("_4").as("query_parameters")) else Nil)
      d.select(base: _*)
    }
    def stop(): Unit = server.stop(0)
  }
  def httpServer(spark: SparkSession, port: Int = 0, path: String = "/",
                 tls: Option[javax.net.ssl.SSLContext] = None,
                 auth: Option[String] = None,
                 headerNames: Seq[String] = Nil,
                 queryParams: Seq[String] = Nil,
                 pathKey: Option[String] = Some("path"),
                 strictPath: Boolean = true,
                 method: String = "POST",
                 responseCode: Int = 200): HttpServerSource =
    new HttpServerSource(spark, port, path, tls, auth, headerNames,
      queryParams, pathKey, strictPath, method, responseCode)

  /** `http_client` source (reference src/sources/http_client/): poll a
    * URL on an interval from a driver thread, newline-frame each
    * response into a MemoryStream. `pollOnce()` is the deterministic
    * test/batch hook (one scrape).
    */
  final class HttpClientSource(spark: SparkSession, url: String,
                               intervalMs: Long) {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    private val mem = MemoryStream[String]
    @volatile private var running = false
    def pollOnce(): Unit = {
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(5000)
      conn.setReadTimeout(5000)
      try {
        val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
        val lines = body.split("\n").filter(_.nonEmpty)
        if (lines.nonEmpty) mem.addData(lines.toIndexedSeq)
      } finally conn.disconnect()
    }
    private val thread = new Thread(() => {
      while (running) {
        try pollOnce() catch { case _: Exception => () } // scrape errors skip the tick
        Thread.sleep(intervalMs)
      }
    }, s"http-client-$url")
    thread.setDaemon(true)
    def startPolling(): Unit = { running = true; thread.start() }
    def df: DataFrame = mem.toDF().withColumnRenamed("value", "message")
    def stop(): Unit = running = false
  }
  def httpClient(spark: SparkSession, url: String,
                 intervalMs: Long = 15000): HttpClientSource =
    new HttpClientSource(spark, url, intervalMs)

  /** `opentelemetry` source over OTLP/HTTP (reference
    * src/sources/opentelemetry/http.rs): POST `/v1/logs` carries a
    * binary ExportLogsServiceRequest; every LogRecord in the envelope
    * becomes one log event (resource_logs × scope_logs × log_records
    * exploded). The response is the empty ExportLogsServiceResponse.
    * The gRPC transport stays out of scope (no gRPC stack here) —
    * protocol coverage comes from the protobuf walker both transports
    * share.
    */
  final class OtlpHttpSource(spark: SparkSession, port: Int = 0,
                             grpcPort: Option[Int] = None,
                             grpcHost: String = "0.0.0.0") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    import graft.codecs.ProtobufCodec
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    private val mem = MemoryStream[Array[Byte]]
    private val memMetrics = MemoryStream[Array[Byte]]
    private val memTraces = MemoryStream[Array[Byte]]
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(port), 0)
    private def handler(sink: MemoryStream[Array[Byte]])
        : com.sun.net.httpserver.HttpHandler = ex => {
      try {
        val body = ex.getRequestBody.readAllBytes()
        if (body.nonEmpty) sink.addData(body)
        // success reply = the empty Export*ServiceResponse
        ex.getResponseHeaders.add("Content-Type", "application/x-protobuf")
        ex.sendResponseHeaders(200, -1)
      } finally ex.close()
    }
    server.createContext("/v1/logs", handler(mem))
    server.createContext("/v1/metrics", handler(memMetrics))
    server.createContext("/v1/traces", handler(memTraces))
    server.setExecutor(null)
    server.start()
    def boundPort: Int = server.getAddress.getPort

    // `grpc.address` (the reference's opentelemetry source accepts BOTH
    // protocols): the collector service paths route to the same streams
    private val grpcServer = grpcPort.map(gp =>
      new Grpc.Server(gp, (path, req) => {
        val sink =
          if (path.contains("LogsService")) mem
          else if (path.contains("MetricsService")) memMetrics
          else if (path.contains("TraceService")) memTraces
          else throw new IllegalArgumentException(s"unknown rpc $path")
        if (req.nonEmpty) sink.synchronized { sink.addData(req) }
        Array.emptyByteArray // empty Export*ServiceResponse
      }, grpcHost))
    def grpcBoundPort: Option[Int] = grpcServer.map(_.boundPort)

    /** `<id>.logs` output: one event per LogRecord. */
    def df: DataFrame = OtlpFlatten.logs(mem.toDF(), col("value"))

    /** `<id>.metrics` output: gauge/sum NumberDataPoints → metric rows. */
    def dfMetrics: DataFrame =
      OtlpFlatten.metrics(memMetrics.toDF(), col("value"))

    /** `<id>.traces` output: one event per Span. */
    def dfTraces: DataFrame =
      OtlpFlatten.traces(memTraces.toDF(), col("value"))
    def stop(): Unit = { server.stop(0); grpcServer.foreach(_.stop()) }
  }
  /** OTLP envelope flattening shared by the opentelemetry source and
    * the generic `decoding.codec: otlp` path — any DataFrame carrying
    * binary export payloads in `binCol` flattens to one row per
    * LogRecord / NumberDataPoint / Span.
    */
  object OtlpFlatten {
    import graft.codecs.ProtobufCodec

    def attrsToTags(attrs: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      map_from_entries(transform(coalesce(attrs, array()),
        kv => struct(kv.getField("key"),
          kv.getField("value").getField("string_value"))))

    def logs(in: DataFrame, binCol: org.apache.spark.sql.Column): DataFrame = {
      val env = ProtobufCodec.decode(
        ProtobufCodec.Otlp.ExportLogsServiceRequest, binCol)
      in.select(env.as("env"))
        .filter(col("env").isNotNull)
        .select(explode(col("env.resource_logs")).as("rl"))
        .select(explode(col("rl.scope_logs")).as("sl"))
        .select(explode(col("sl.log_records")).as("r"))
        .select(
          timestamp_micros((col("r.time_unix_nano") / 1000).cast("long"))
            .as("timestamp"),
          col("r.severity_number").as("severity_number"),
          col("r.severity_text").as("severity_text"),
          col("r.body.string_value").as("message"),
          lower(hex(col("r.trace_id"))).as("trace_id"),
          lower(hex(col("r.span_id"))).as("span_id"),
          col("r.dropped_attributes_count").as("dropped_attributes_count"),
          timestamp_micros((col("r.observed_time_unix_nano") / 1000)
            .cast("long")).as("observed_timestamp"))
    }

    def metrics(in: DataFrame, binCol: org.apache.spark.sql.Column): DataFrame = {
      val env = ProtobufCodec.decode(
        ProtobufCodec.Otlp.ExportMetricsServiceRequest, binCol)
      val base = in.select(env.as("env"))
        .filter(col("env").isNotNull)
        .select(explode(col("env.resource_metrics")).as("rm"))
        .select(explode(col("rm.scope_metrics")).as("sm"))
        .select(explode(col("sm.metrics")).as("m"))
      def points(kind: String) = {
        val isSum = kind == "sum"
        val src = if (isSum) col("m.sum") else col("m.gauge")
        base.filter(src.isNotNull)
          .select(col("m.name").as("name"), col("m.unit").as("unit"),
            (if (isSum) when(col("m.sum.aggregation_temporality") === 1,
                "incremental").otherwise("absolute")
             else lit("absolute")).as("kind"),
            lit(if (isSum) "counter" else "gauge").as("value_type"),
            explode(src.getField("data_points")).as("p"))
          .select(col("name"), col("unit"), col("kind"), col("value_type"),
            attrsToTags(col("p.attributes")).as("tags"),
            timestamp_micros((col("p.time_unix_nano") / 1000).cast("long"))
              .as("ts"),
            coalesce(col("p.as_double"), col("p.as_int").cast("double"))
              .as("value"))
      }
      points("gauge").unionByName(points("sum"))
        .select(col("name"), col("tags"), col("ts"), col("kind"),
          col("value_type"),
          when(col("value_type") === "counter", col("value"))
            .as("counter_value"),
          when(col("value_type") === "gauge", col("value"))
            .as("gauge_value"),
          col("unit"))
    }

    def traces(in: DataFrame, binCol: org.apache.spark.sql.Column): DataFrame = {
      val env = ProtobufCodec.decode(
        ProtobufCodec.Otlp.ExportTraceServiceRequest, binCol)
      in.select(env.as("env"))
        .filter(col("env").isNotNull)
        .select(explode(col("env.resource_spans")).as("rs"))
        .select(explode(col("rs.scope_spans")).as("ss"))
        .select(explode(col("ss.spans")).as("s"))
        .select(
          lower(hex(col("s.trace_id"))).as("trace_id"),
          lower(hex(col("s.span_id"))).as("span_id"),
          lower(hex(col("s.parent_span_id"))).as("parent_span_id"),
          col("s.name").as("name"),
          col("s.kind").as("kind"),
          timestamp_micros((col("s.start_time_unix_nano") / 1000)
            .cast("long")).as("start_timestamp"),
          timestamp_micros((col("s.end_time_unix_nano") / 1000)
            .cast("long")).as("end_timestamp"),
          ((col("s.end_time_unix_nano") - col("s.start_time_unix_nano"))
            / 1000000).cast("long").as("duration_ms"),
          attrsToTags(col("s.attributes")).as("attributes"))
    }
  }

  def otlpHttp(spark: SparkSession, port: Int = 0,
               grpcPort: Option[Int] = None,
               grpcHost: String = "0.0.0.0"): OtlpHttpSource =
    new OtlpHttpSource(spark, port, grpcPort, grpcHost)

  /** `prometheus` scrape source (reference src/sources/prometheus/
    * scrape.rs): http_client poll + exposition-text decode; comment and
    * TYPE/HELP lines are dropped by the decoder returning null.
    */
  def prometheusScrape(src: HttpClientSource): DataFrame = {
    val decoded = graft.codecs.Decode.prometheusLine(col("message"))
    src.df.select(decoded.as("m"))
      .filter(col("m.name").isNotNull)
      .select(col("m.name").as("name"), col("m.tags").as("tags"),
        col("m.value").as("value"), col("m.timestamp").as("timestamp"))
  }

  // ---- sinks -----------------------------------------------------------

  def toConsole(df: DataFrame, intervalMs: Long = 1000): DataStreamWriter[Row] =
    df.writeStream.format("console")
      .trigger(Trigger.ProcessingTime(intervalMs))

  /** File sink with template-style partitioning (reference: S3/file key
    * templates like `date=%F` → partitionBy on a derived column).
    */
  def toParquet(df: DataFrame, path: String, checkpoint: String,
                partitionCols: Seq[String] = Nil): DataStreamWriter[Row] = {
    val w = df.writeStream.format("parquet")
      .option("path", path).option("checkpointLocation", checkpoint)
    if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w
  }

  def toKafka(df: DataFrame, servers: String, topic: String,
              checkpoint: String, codec: String = "json",
              encConf: Map[String, Any] = Map.empty,
              keyField: Option[String] = None,
              headersKey: Option[String] = None): DataStreamWriter[Row] = {
    import org.apache.spark.sql.functions._
    // `key_field` picks the partition key, `headers_key` a map-valued
    // event field carried as kafka headers, and a templated `topic`
    // renders per event (kafka/config.rs) — all three map onto the
    // kafka writer's key/headers/topic columns
    val cols = Seq(graft.sinks.LineCodec.encodeLine(df, codec, encConf)
        .cast("binary").as("value")) ++
      keyField.filter(df.columns.contains).map(k =>
        col(k).cast("string").cast("binary").as("key")) ++
      headersKey.filter(df.columns.contains).map(h =>
        transform(map_entries(col(h).cast("map<string,string>")), e =>
          struct(e.getField("key").as("key"),
            e.getField("value").cast("binary").as("value")))
          .as("headers")) ++
      (if (graft.functions.Template.isDynamic(topic))
        Seq(graft.functions.Template.render(df.schema, topic).as("topic"))
      else Nil)
    val w = df.select(cols: _*).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("checkpointLocation", checkpoint)
      .option("includeHeaders", "true")
    if (graft.functions.Template.isDynamic(topic)) w
    else w.option("topic", topic)
  }

  /** `blackhole` sink (reference src/sinks/blackhole) — consume and drop;
    * used by benchmarks.
    */
  def toBlackhole(df: DataFrame): DataStreamWriter[Row] =
    df.writeStream.format("noop")

  /** HTTP-style sink shape: per-micro-batch callback (request building,
    * compression, and retry belong to the callback — reference
    * src/sinks/util/).
    */
  def toForeachBatch(df: DataFrame)(f: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    df.writeStream.foreachBatch(f)

  /** Start with a processing-time trigger — the reference's only timing
    * model (SURVEY §2.8: no event-time anywhere in the codebase).
    */
  def start(w: DataStreamWriter[Row], intervalMs: Long = 0): StreamingQuery =
    (if (intervalMs > 0) w.trigger(Trigger.ProcessingTime(intervalMs)) else w)
      .start()
}
