package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** The HTTP-push agent endpoints beyond the generic `http_server`:
  * `splunk_hec` (src/sources/splunk_hec/mod.rs), `heroku_logs`
  * (logplex drain, src/sources/heroku_logs.rs), `aws_kinesis_firehose`
  * (src/sources/aws_kinesis_firehose/) and `datadog_agent`
  * (src/sources/datadog_agent/). Each hosts the service's real request/
  * response contract on a JDK HttpServer feeding a MemoryStream —
  * the single-listener driver endpoint is the documented scale boundary
  * (same as the reference; fleets front it with a load balancer).
  */
object HttpPushSources {

  private val mapper = new ObjectMapper()

  private def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int,
                      body: String, contentType: String = "application/json")
      : Unit = {
    val b = body.getBytes("UTF-8")
    ex.getResponseHeaders.add("Content-Type", contentType)
    ex.sendResponseHeaders(code, b.length)
    ex.getResponseBody.write(b)
  }

  private def textOf(n: JsonNode, field: String): String = {
    val v = n.get(field)
    if (v == null || v.isNull) null
    else if (v.isTextual) v.asText() else v.toString
  }

  // ---- splunk_hec ----

  final case class HecEvent(timestamp_ms: java.lang.Long, host: String,
      source: String, sourcetype: String, index: String,
      splunk_channel: String, message: String)

  /** `/services/collector/event` accepts CONCATENATED JSON objects
    * (`{"event":…}{"event":…}`, how HEC clients batch); each carries
    * `event` (string or object), fractional epoch `time`, and the
    * host/source/sourcetype/index routing fields.
    * `/services/collector/raw` ingests newline-framed raw lines. A
    * configured token gates on `Authorization: Splunk <token>` → 401
    * with Splunk's own error JSON otherwise; success replies
    * `{"text":"Success","code":0}`.
    *
    * With `acknowledgements: true` the source runs Splunk's
    * indexer-acknowledgement protocol (splunk_hec/acknowledgements.rs):
    * event/raw requests REQUIRE a channel (else 400 code 10), each
    * successful intake returns `"ackId": <per-channel counter>`, and
    * `/services/collector/ack` answers `{"acks":{"<id>":bool}}` —
    * true once delivered, then REMOVED (a re-query reads false,
    * acknowledgements.rs get_acks_status).
    */
  final class HecSource(spark: SparkSession, port: Int = 0,
                        validTokens: Seq[String] = Nil,
                        acknowledgements: Boolean = false) {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    private val mem = MemoryStream[HecEvent]
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(port), 0)

    private def authorized(ex: com.sun.net.httpserver.HttpExchange): Boolean =
      validTokens.isEmpty || {
        val h = Option(ex.getRequestHeaders.getFirst("Authorization"))
        h.exists(v => validTokens.exists(t => v == s"Splunk $t"))
      }

    // per-channel indexer-ack state: next ackId + ids delivered but not
    // yet queried (intake is synchronous here, so delivered = acked).
    // Both dimensions are BOUNDED like the reference's
    // HecAcknowledgementsConfig (acknowledgements.rs:74-77 —
    // max_pending_acks_per_channel=1M, max_number_of_ack_channels=1M):
    // a channel over its pending cap drops its OLDEST ids, and a new
    // channel past the channel cap evicts the least-recently-created
    // one, so ack state can never grow without bound.
    private val maxPendingAcksPerChannel = 1000000
    private val maxAckChannels = 1000000
    private final class AckChannel {
      val next = new java.util.concurrent.atomic.AtomicLong(0L)
      val pending = new java.util.concurrent.ConcurrentSkipListSet[Long]()
    }
    private val ackChannels =
      new java.util.concurrent.ConcurrentHashMap[String, AckChannel]()
    private val ackChannelOrder =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    private def ackRegister(channel: String): Long = {
      val ch = ackChannels.computeIfAbsent(channel, c => {
        ackChannelOrder.add(c)
        while (ackChannels.size >= maxAckChannels) {
          val evict = ackChannelOrder.poll()
          if (evict != null) ackChannels.remove(evict) else ()
        }
        new AckChannel
      })
      val id = ch.next.getAndIncrement()
      ch.pending.add(id)
      while (ch.pending.size > maxPendingAcksPerChannel)
        ch.pending.pollFirst()
      id
    }

    /** Success response; with acks enabled appends the assigned ackId. */
    private def intakeOk(ex: com.sun.net.httpserver.HttpExchange,
                         channel: String): Unit =
      if (acknowledgements && channel != null)
        respond(ex, 200,
          s"""{"text":"Success","code":0,"ackId":${ackRegister(channel)}}""")
      else respond(ex, 200, """{"text":"Success","code":0}""")

    /** With acks enabled the data channel is REQUIRED (mod.rs
      * required_channel → ApiError::MissingChannel).
      */
    private def channelMissing(ex: com.sun.net.httpserver.HttpExchange,
                               channel: String): Boolean =
      if (acknowledgements && channel == null) {
        respond(ex, 400, """{"text":"Data channel is missing","code":10}""")
        true
      } else false

    // the Splunk channel: X-Splunk-Request-Channel header, falling back
    // to the `channel` query parameter (splunk_hec docs field order)
    def channelOf(ex: com.sun.net.httpserver.HttpExchange): String =
      Option(ex.getRequestHeaders.getFirst("X-Splunk-Request-Channel"))
        .orElse(Option(ex.getRequestURI.getQuery).flatMap(_
          .split("&").collectFirst {
            case q if q.startsWith("channel=") =>
              q.stripPrefix("channel=")
          }))
        .orNull

    server.createContext("/services/collector/event",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        try {
          if (!authorized(ex))
            respond(ex, 401, """{"text":"Invalid authorization","code":3}""")
          else {
            val channel = channelOf(ex)
            if (!channelMissing(ex, channel)) {
              val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
              val it = mapper.readerFor(classOf[JsonNode])
                .readValues[JsonNode](body)
              val events = Vector.newBuilder[HecEvent]
              while (it.hasNext) {
                val n = it.next()
                val ev = n.get("event")
                val msg =
                  if (ev == null) null
                  else if (ev.isTextual) ev.asText() else ev.toString
                val time: java.lang.Long =
                  if (n.hasNonNull("time"))
                    java.lang.Long.valueOf((n.get("time").asDouble() * 1000).toLong)
                  else null
                events += HecEvent(time, textOf(n, "host"),
                  textOf(n, "source"), textOf(n, "sourcetype"),
                  textOf(n, "index"), channel, msg)
              }
              val evs = events.result()
              if (evs.nonEmpty) mem.addData(evs)
              intakeOk(ex, channel)
            }
          }
        } catch { case _: Exception =>
          respond(ex, 400, """{"text":"Invalid data format","code":6}""")
        } finally ex.close()
      })
    server.createContext("/services/collector/raw",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        try {
          if (!authorized(ex))
            respond(ex, 401, """{"text":"Invalid authorization","code":3}""")
          else {
            val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
            val channel = channelOf(ex)
            if (!channelMissing(ex, channel)) {
              val evs = body.split("\n").filter(_.nonEmpty).toIndexedSeq
                .map(l => HecEvent(null, null, null, null, null, channel, l))
              if (evs.nonEmpty) mem.addData(evs)
              intakeOk(ex, channel)
            }
          }
        } finally ex.close()
      })
    // indexer-ack status queries (acknowledgements.rs; real HEC clients
    // poll this after intake): {"acks":[ids]} -> {"acks":{"id":bool}},
    // read-once semantics
    server.createContext("/services/collector/ack",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        try {
          if (!authorized(ex))
            respond(ex, 401, """{"text":"Invalid authorization","code":3}""")
          else if (!acknowledgements)
            respond(ex, 400, """{"text":"Ack is disabled","code":14}""")
          else {
            val channel = channelOf(ex)
            if (!channelMissing(ex, channel)) {
              val n = mapper.readTree(ex.getRequestBody.readAllBytes())
              val ids = Option(n.get("acks")).filter(_.isArray)
                .map { arr =>
                  val b = Vector.newBuilder[Long]
                  arr.forEach(v => b += v.asLong())
                  b.result()
                }.getOrElse(Vector.empty)
              // status queries do NOT create channel state (only intake
              // does) — an unknown channel just reads all-false, so a
              // scanner polling random channels can't grow the map
              val ch = ackChannels.get(channel)
              val statuses = ids.map(id =>
                id -> (ch != null && ch.pending.remove(id)))
              respond(ex, 200, statuses
                .map { case (id, ok) => s""""$id":$ok""" }
                .mkString("""{"acks":{""", ",", "}}"))
            }
          }
        } catch { case _: Exception =>
          respond(ex, 400, """{"text":"Invalid data format","code":6}""")
        } finally ex.close()
      })
    server.setExecutor(null)
    server.start()
    def boundPort: Int = server.getAddress.getPort
    def df: DataFrame = {
      import org.apache.spark.sql.functions._
      val d = mem.toDF()
      d.select(timestamp_millis(d("timestamp_ms")).as("timestamp"),
        d("host"), d("source"), d("sourcetype"), d("index"),
        d("splunk_channel"), d("message"))
    }
    def stop(): Unit = server.stop(0)
  }

  // ---- heroku_logs (logplex drain) ----

  final case class HerokuEvent(timestamp: String, host: String,
      app_name: String, proc_id: String, message: String)

  /** POST /events: newline-framed logplex lines, each
    * `<len> <pri>ver timestamp host app proc msgid message`
    * (heroku_logs.rs:352 `splitn(8, ' ')`); a line that doesn't split
    * into 8 parts forwards raw (heroku_logs.rs:422). The
    * `Logplex-Msg-Count` header is validated against the parsed count.
    */
  final class HerokuSource(spark: SparkSession, port: Int = 0) {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    private val mem = MemoryStream[HerokuEvent]
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(port), 0)
    server.createContext("/events", (ex: com.sun.net.httpserver.HttpExchange) => {
      try {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        val lines = body.split("\n").filter(_.nonEmpty).toIndexedSeq
        val evs = lines.map { line =>
          val parts = line.split(" ", 8)
          if (parts.length == 8)
            HerokuEvent(parts(2), parts(3), parts(4), parts(5), parts(7))
          else HerokuEvent(null, null, null, null, line)
        }
        val declared = Option(
          ex.getRequestHeaders.getFirst("Logplex-Msg-Count"))
          .map(_.toInt)
        if (declared.exists(_ != evs.length))
          respond(ex, 400, "Logplex-Msg-Count does not match", "text/plain")
        else {
          if (evs.nonEmpty) mem.addData(evs)
          ex.sendResponseHeaders(200, -1)
        }
      } finally ex.close()
    })
    server.setExecutor(null)
    server.start()
    def boundPort: Int = server.getAddress.getPort
    def df: DataFrame = {
      import org.apache.spark.sql.functions._
      val d = mem.toDF()
      d.select(d("timestamp").cast("timestamp").as("timestamp"),
        d("host"), d("app_name"), d("proc_id"), d("message"))
    }
    def stop(): Unit = server.stop(0)
  }

  // ---- aws_kinesis_firehose ----

  final case class FirehoseEvent(request_id: String, source_arn: String,
      timestamp_ms: Long, message: String)

  /** Firehose HTTP delivery protocol v1.0
    * (src/sources/aws_kinesis_firehose/models.rs): request JSON
    * `{requestId, timestamp(ms), records: [{data: base64[, gzipped]}]}`;
    * an optional `access_key` must match when configured; the reply
    * echoes `{"requestId": …, "timestamp": …}`. Gzipped record payloads
    * (CloudWatch Logs subscriptions) auto-detect by magic bytes, and
    * each decoded payload newline-frames into events.
    */
  final class FirehoseSource(spark: SparkSession, port: Int = 0,
                             accessKey: Option[String] = None) {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    private val mem = MemoryStream[FirehoseEvent]
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(port), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      try {
        val n = mapper.readTree(ex.getRequestBody.readAllBytes())
        val reqId = textOf(n, "requestId")
        val ts = if (n.hasNonNull("timestamp")) n.get("timestamp").asLong()
          else System.currentTimeMillis()
        val headerKey = Option(ex.getRequestHeaders.getFirst("X-Amz-Firehose-Access-Key"))
        // documented output field: the delivery stream ARN header
        val sourceArn = Option(
          ex.getRequestHeaders.getFirst("X-Amz-Firehose-Source-Arn")).orNull
        if (accessKey.exists(k => !headerKey.contains(k)))
          respond(ex, 401,
            s"""{"requestId":"$reqId","timestamp":$ts,"errorMessage":"Unauthorized"}""")
        else {
          val events = Vector.newBuilder[FirehoseEvent]
          val records = n.get("records")
          if (records != null && records.isArray) {
            records.forEach { r =>
              val raw = java.util.Base64.getDecoder.decode(r.get("data").asText())
              val bytes =
                if (raw.length >= 2 && raw(0) == 0x1f.toByte && raw(1) == 0x8b.toByte)
                  new java.util.zip.GZIPInputStream(
                    new java.io.ByteArrayInputStream(raw)).readAllBytes()
                else raw
              new String(bytes, "UTF-8").split("\n").filter(_.nonEmpty)
                .foreach(l => events += FirehoseEvent(reqId, sourceArn, ts, l))
            }
          }
          val evs = events.result()
          if (evs.nonEmpty) mem.addData(evs)
          respond(ex, 200, s"""{"requestId":"$reqId","timestamp":$ts}""")
        }
      } catch { case _: Exception =>
        respond(ex, 400, """{"errorMessage":"bad request"}""")
      } finally ex.close()
    })
    server.setExecutor(null)
    server.start()
    def boundPort: Int = server.getAddress.getPort
    def df: DataFrame = {
      import org.apache.spark.sql.functions._
      val d = mem.toDF()
      d.select(d("request_id"), d("source_arn"),
        timestamp_millis(d("timestamp_ms")).as("timestamp"), d("message"))
    }
    def stop(): Unit = server.stop(0)
  }

  // ---- datadog_agent ----

  final case class DdAgentEvent(ddsource: String, ddtags: String,
      hostname: String, service: String, status: String,
      timestamp_ms: java.lang.Long, message: String)

  /** Datadog agent intake (src/sources/datadog_agent/): log intake on
    * POST `/api/v2/logs` (and the legacy `/v1/input[/<key>]`, a JSON
    * ARRAY of log objects, reply `{}`); metrics intake on `/api/v1/
    * series` (JSON) + `/api/v2/series` (protobuf MetricPayload) +
    * `/api/beta/sketches` (protobuf SketchPayload) feeding the
    * `<id>.metrics` port; trace intake on `/api/v0.2/traces` (protobuf
    * TracePayload) feeding `<id>.traces`; `/api/v0.2/stats` accepted
    * and discarded (traces.rs build_stats_filter — APM stats are
    * recomputed sink-side).
    */
  final class DatadogAgentSource(spark: SparkSession, port: Int = 0,
                                 splitMetricNamespace: Boolean = true,
                                 parseDdtags: Boolean = false) {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    private val mem = MemoryStream[DdAgentEvent]
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(port), 0)
    private val handler: com.sun.net.httpserver.HttpHandler = ex => {
      try {
        val n = mapper.readTree(ex.getRequestBody.readAllBytes())
        val events = Vector.newBuilder[DdAgentEvent]
        val arr = if (n.isArray) n else mapper.createArrayNode().add(n)
        arr.forEach { o =>
          val ts: java.lang.Long =
            if (o.hasNonNull("timestamp"))
              java.lang.Long.valueOf(o.get("timestamp").asLong())
            else null
          events += DdAgentEvent(textOf(o, "ddsource"), textOf(o, "ddtags"),
            textOf(o, "hostname"), textOf(o, "service"),
            textOf(o, "status"), ts, textOf(o, "message"))
        }
        val evs = events.result()
        if (evs.nonEmpty) mem.addData(evs)
        respond(ex, 200, "{}")
      } catch { case _: Exception =>
        respond(ex, 400, """{"error":"bad request"}""")
      } finally ex.close()
    }
    server.createContext("/api/v2/logs", handler)
    server.createContext("/v1/input", handler)

    import DdAgentIntake.{DdMetricRow, DdTraceRow}
    private val memMetrics = MemoryStream[DdMetricRow]
    private val memTraces = MemoryStream[DdTraceRow]

    private def pushMetrics(evs: Seq[DdMetricRow]): Unit =
      if (evs.nonEmpty) memMetrics.synchronized { memMetrics.addData(evs) }

    /** content-encoding per the agent (mod.rs decode): gzip | deflate |
      * identity (snappy/zstd need codecs outside this runtime).
      */
    private def decodeBody(ex: com.sun.net.httpserver.HttpExchange): Array[Byte] = {
      val raw = ex.getRequestBody.readAllBytes()
      Option(ex.getRequestHeaders.getFirst("Content-Encoding"))
        .map(_.toLowerCase) match {
        case Some("gzip") =>
          new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(raw)).readAllBytes()
        case Some("deflate") =>
          new java.util.zip.InflaterInputStream(
            new java.io.ByteArrayInputStream(raw)).readAllBytes()
        case _ => raw
      }
    }

    // metrics intake (datadog_agent/metrics.rs `/api/v1/series`):
    // {"series":[{metric, points: [[epoch_s, value]], type:
    // count|gauge|rate, tags: ["k:v"], host, device, interval}]} —
    // count/rate are incremental counters, gauge absolute; rate values
    // scale by the interval; names split into namespace at the first
    // '.' (split_metric_namespace, default true)
    private val seriesV1Handler: com.sun.net.httpserver.HttpHandler = ex => {
      try {
        val n = mapper.readTree(decodeBody(ex))
        val out = Vector.newBuilder[DdMetricRow]
        val series = n.get("series")
        if (series != null && series.isArray) series.forEach { s =>
          val (ns, name) = DdAgentIntake.splitNamespace(
            Option(textOf(s, "metric")).getOrElse(""), splitMetricNamespace)
          val host = textOf(s, "host")
          val typ = Option(textOf(s, "type")).getOrElse("gauge")
          val interval =
            if (s.hasNonNull("interval")) s.get("interval").asLong() else 0L
          var tags = Map[String, String]()
          val tagsNode = s.get("tags")
          if (tagsNode != null && tagsNode.isArray) tagsNode.forEach { t =>
            t.asText().split(":", 2) match {
              case Array(k, v) => tags += (k -> v)
              case Array(k) => tags += (k -> "")
            }
          }
          // metrics.rs into_vector_metric: source_type_name and device
          // land as tags
          Option(textOf(s, "source_type_name"))
            .foreach(v => tags += ("source_type_name" -> v))
          Option(textOf(s, "device")).foreach(v => tags += ("device" -> v))
          val points = s.get("points")
          if (points != null && points.isArray) points.forEach { p =>
            val ts = java.lang.Long.valueOf(p.get(0).asLong())
            val v0 = p.get(1).asDouble()
            out += (typ match {
              case "count" => DdMetricRow(ns, name, tags, host, ts, null,
                "incremental", "counter", v0, null, null, null, null,
                null, null, null, null)
              case "rate" =>
                val i = if (interval != 0) interval else 1L
                DdMetricRow(ns, name, tags, host, ts, i * 1000,
                  "incremental", "counter", v0 * i, null, null, null,
                  null, null, null, null, null)
              case _ => DdMetricRow(ns, name, tags, host, ts, null,
                "absolute", "gauge", null, v0, null, null, null, null,
                null, null, null)
            })
          }
        }
        pushMetrics(out.result())
        respond(ex, 202, """{"status":"ok"}""")
      } catch { case _: Exception =>
        respond(ex, 400, """{"error":"bad request"}""")
      } finally ex.close()
    }
    server.createContext("/api/v1/series", seriesV1Handler)

    // `/api/v2/series`: protobuf MetricPayload — what current agents
    // send by default (metrics.rs series_v2_service); empty body = agent
    // keep-alive, accepted
    server.createContext("/api/v2/series", (ex: com.sun.net.httpserver.HttpExchange) => {
      try {
        val body = decodeBody(ex)
        if (body.nonEmpty) pushMetrics(DdAgentIntake.decodeSeriesV2(
          body, splitMetricNamespace))
        respond(ex, 202, """{"status":"ok"}""")
      } catch { case _: Exception =>
        respond(ex, 422, """{"error":"Error decoding Datadog sketch"}""")
      } finally ex.close()
    })

    // `/api/beta/sketches`: protobuf SketchPayload → sketch samples
    server.createContext("/api/beta/sketches", (ex: com.sun.net.httpserver.HttpExchange) => {
      try {
        val body = decodeBody(ex)
        if (body.nonEmpty) pushMetrics(DdAgentIntake.decodeSketches(
          body, splitMetricNamespace))
        respond(ex, 202, """{"status":"ok"}""")
      } catch { case _: Exception =>
        respond(ex, 422, """{"error":"Error decoding Datadog sketch"}""")
      } finally ex.close()
    })

    // `/api/v0.2/traces`: protobuf TracePayload → the `.traces` port;
    // `/api/v0.2/stats` accepted and discarded (traces.rs)
    server.createContext("/api/v0.2/traces", (ex: com.sun.net.httpserver.HttpExchange) => {
      try {
        val lang = Option(ex.getRequestHeaders
          .getFirst("X-Datadog-Reported-Languages"))
        val evs = DdAgentIntake.decodeTraces(decodeBody(ex), lang)
        if (evs.nonEmpty) memTraces.synchronized { memTraces.addData(evs) }
        respond(ex, 200, "{}")
      } catch { case _: Exception =>
        respond(ex, 422, """{"error":"Error decoding Datadog traces"}""")
      } finally ex.close()
    })
    server.createContext("/api/v0.2/stats", (ex: com.sun.net.httpserver.HttpExchange) => {
      try { ex.getRequestBody.readAllBytes(); respond(ex, 200, "") }
      finally ex.close()
    })

    server.setExecutor(null)
    server.start()
    def boundPort: Int = server.getAddress.getPort
    def df: DataFrame = {
      import org.apache.spark.sql.functions._
      val d = mem.toDF()
      // parse_ddtags (logs.rs:146-150, parse_ddtags:207-228): the
      // comma-separated agent tag string becomes an ARRAY (empty
      // segments dropped; empty/absent string -> empty array)
      val ddtags =
        if (!parseDdtags) d("ddtags")
        else filter(split(coalesce(d("ddtags"), lit("")), ","),
          t => t =!= "")
      d.select(d("ddsource"), ddtags.as("ddtags"), d("hostname"),
        d("service"), d("status"),
        timestamp_millis(d("timestamp_ms")).as("timestamp"),
        d("message"))
    }
    /** The `<id>.metrics` output port's stream — counter/gauge samples
      * from both series versions plus agent DDSketch samples, in the
      * sparse-union shape of model.Metrics.
      */
    def metricsDf: DataFrame = {
      import org.apache.spark.sql.functions._
      val d = memMetrics.toDF()
      d.select(d("namespace"), d("name"), d("tags"), d("host"),
        timestamp_seconds(d("timestamp_s")).as("ts"), d("interval_ms"),
        d("kind"), d("value_type"), d("counter_value"), d("gauge_value"),
        when(d("value_type") === "sketch", struct(
          d("sketch_cnt").as("cnt"), d("sketch_min").as("min"),
          d("sketch_max").as("max"), d("sketch_sum").as("sum"),
          d("sketch_avg").as("avg"), d("sketch_k").as("k"),
          d("sketch_n").as("n"))).as("sketch"))
    }
    /** The `<id>.traces` output port's stream: one row per trace event
      * with its spans nested (source_type stamped like the reference).
      */
    def tracesDf: DataFrame = {
      import org.apache.spark.sql.functions._
      val d = memTraces.toDF()
      d.withColumn("source_type", lit("datadog_agent"))
    }
    def stop(): Unit = server.stop(0)
  }

  def splunkHec(spark: SparkSession, port: Int = 0,
                validTokens: Seq[String] = Nil,
                acknowledgements: Boolean = false): HecSource =
    new HecSource(spark, port, validTokens, acknowledgements)
  def herokuLogs(spark: SparkSession, port: Int = 0): HerokuSource =
    new HerokuSource(spark, port)
  def firehose(spark: SparkSession, port: Int = 0,
               accessKey: Option[String] = None): FirehoseSource =
    new FirehoseSource(spark, port, accessKey)
  def datadogAgent(spark: SparkSession, port: Int = 0,
                   splitMetricNamespace: Boolean = true,
                   parseDdtags: Boolean = false): DatadogAgentSource =
    new DatadogAgentSource(spark, port, splitMetricNamespace, parseDdtags)
}
