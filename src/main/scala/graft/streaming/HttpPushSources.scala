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
    */
  final class HecSource(spark: SparkSession, port: Int = 0,
                        validTokens: Seq[String] = Nil) {
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
            respond(ex, 200, """{"text":"Success","code":0}""")
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
            val evs = body.split("\n").filter(_.nonEmpty).toIndexedSeq
              .map(l => HecEvent(null, null, null, null, null, channel, l))
            if (evs.nonEmpty) mem.addData(evs)
            respond(ex, 200, """{"text":"Success","code":0}""")
          }
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

  /** Datadog agent log intake (src/sources/datadog_agent/logs.rs):
    * POST `/api/v2/logs` (and the legacy `/v1/input[/<key>]`) carries a
    * JSON ARRAY of log objects with message/status/timestamp(ms)/
    * hostname/service/ddsource/ddtags; success replies `{}`.
    */
  final class DatadogAgentSource(spark: SparkSession, port: Int = 0) {
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

    // metrics intake (datadog_agent/metrics.rs `/api/v1/series`):
    // {"series":[{metric, points: [[epoch_s, value]], type:
    // count|gauge|rate, tags: ["k:v"], host, interval}]} — count/rate
    // are incremental counters, gauge absolute; rate values scale by
    // the interval like the reference
    private val memMetrics =
      MemoryStream[(String, Map[String, String], String, java.lang.Long,
        String, String, java.lang.Double, java.lang.Double)]
    private val seriesHandler: com.sun.net.httpserver.HttpHandler = ex => {
      try {
        val n = mapper.readTree(ex.getRequestBody.readAllBytes())
        val out = Vector.newBuilder[(String, Map[String, String], String,
          java.lang.Long, String, String, java.lang.Double,
          java.lang.Double)]
        val series = n.get("series")
        if (series != null && series.isArray) series.forEach { s =>
          val name = textOf(s, "metric")
          val host = textOf(s, "host")
          val typ = Option(textOf(s, "type")).getOrElse("gauge")
          val interval =
            if (s.hasNonNull("interval")) s.get("interval").asLong() else 1L
          val tags = scala.collection.mutable.Map[String, String]()
          val tagsNode = s.get("tags")
          if (tagsNode != null && tagsNode.isArray) tagsNode.forEach { t =>
            val kv = t.asText().split(":", 2)
            if (kv.length == 2) tags(kv(0)) = kv(1)
          }
          val points = s.get("points")
          if (points != null && points.isArray) points.forEach { p =>
            val ts = p.get(0).asLong()
            val v0 = p.get(1).asDouble()
            val (kind, vt, cv, gv) = typ match {
              case "count" => ("incremental", "counter",
                java.lang.Double.valueOf(v0), null: java.lang.Double)
              case "rate" => ("incremental", "counter",
                java.lang.Double.valueOf(v0 * interval),
                null: java.lang.Double)
              case _ => ("absolute", "gauge", null: java.lang.Double,
                java.lang.Double.valueOf(v0))
            }
            out += ((name, tags.toMap, host,
              java.lang.Long.valueOf(ts), kind, vt, cv, gv))
          }
        }
        val evs = out.result()
        if (evs.nonEmpty) memMetrics.synchronized { memMetrics.addData(evs) }
        respond(ex, 202, """{"status":"ok"}""")
      } catch { case _: Exception =>
        respond(ex, 400, """{"error":"bad request"}""")
      } finally ex.close()
    }
    server.createContext("/api/v1/series", seriesHandler)
    server.setExecutor(null)
    server.start()
    def boundPort: Int = server.getAddress.getPort
    def df: DataFrame = {
      import org.apache.spark.sql.functions._
      val d = mem.toDF()
      d.select(d("ddsource"), d("ddtags"), d("hostname"), d("service"),
        d("status"), timestamp_millis(d("timestamp_ms")).as("timestamp"),
        d("message"))
    }
    /** The `<id>.metrics` output port's stream. */
    def metricsDf: DataFrame = {
      import org.apache.spark.sql.functions._
      val d = memMetrics.toDF()
      d.select(d("_1").as("name"), d("_2").as("tags"),
        d("_3").as("host"), timestamp_seconds(d("_4")).as("ts"),
        d("_5").as("kind"), d("_6").as("value_type"),
        d("_7").as("counter_value"), d("_8").as("gauge_value"))
    }
    def stop(): Unit = server.stop(0)
  }

  def splunkHec(spark: SparkSession, port: Int = 0,
                validTokens: Seq[String] = Nil): HecSource =
    new HecSource(spark, port, validTokens)
  def herokuLogs(spark: SparkSession, port: Int = 0): HerokuSource =
    new HerokuSource(spark, port)
  def firehose(spark: SparkSession, port: Int = 0,
               accessKey: Option[String] = None): FirehoseSource =
    new FirehoseSource(spark, port, accessKey)
  def datadogAgent(spark: SparkSession, port: Int = 0): DatadogAgentSource =
    new DatadogAgentSource(spark, port)
}
