package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Template
import NetworkSinks.HttpConfig

/** The observability-SaaS sink family — each one is its service's
  * public HTTP body shape built as codegen'd Columns + the shared
  * batched transport (NetworkSinks.writeHttpBody):
  *
  *  - `datadog_metrics` (src/sinks/datadog/metrics/) — `/api/v2/series`.
  *  - `datadog_events` (src/sinks/datadog/events/) — `/api/v1/events`,
  *    one request per event (the API is single-event).
  *  - `datadog_traces` moved to [[DdTraces]] (protobuf TracePayload +
  *    APM stats), `datadog_metrics` v2 protobuf to [[DdMetrics]].
  *  - `new_relic` (src/sinks/new_relic/) — the Logs / Metrics / Events
  *    APIs, selected by `api`, each with its documented envelope.
  *  - `honeycomb` (src/sinks/honeycomb/) — `/1/batch/{dataset}`.
  *  - `axiom` (src/sinks/axiom/) — `/v1/datasets/{dataset}/ingest`.
  *  - `mezmo` (src/sinks/mezmo.rs) — `/logs/ingest` with hostname/now
  *    query params and basic auth.
  *  - `humio_logs` (src/sinks/humio/logs.rs) — Humio's HEC-compatible
  *    `/api/v1/ingest/hec` (reuses the splunk_hec envelope).
  *  - `sematext_logs` (src/sinks/sematext/logs.rs) — Elasticsearch bulk
  *    against the logsene receiver, index = the app token.
  *  - `appsignal` (src/sinks/appsignal/) — `/vector/events`, Bearer key.
  *  - `keep` (src/sinks/keep/) — alert-event POST with `x-api-key`.
  *  - `statsd` (src/sinks/statsd/) — classic statsd lines over UDP/TCP.
  *  - `papertrail` (src/sinks/papertrail.rs) — RFC5424-style syslog
  *    lines over TCP with the `process` template.
  */
object SaasSinks {

  private def userFields(df: DataFrame): Seq[String] =
    df.columns.filterNot(_.startsWith("__")).toSeq

  private def eventStruct(df: DataFrame): Column =
    struct(userFields(df).map(col): _*)

  private def tsOf(df: DataFrame): Column = Template.timestampCol(df.schema)

  /** The metric value of a metric-shaped frame — plain `value`, or the
    * internal model's counter_value/gauge_value split (LogToMetric
    * output), whichever columns exist.
    */
  private[sinks] def metricValue(df: DataFrame): Column = {
    val cols = df.columns.toSet
    val cands = Seq("counter_value", "gauge_value", "value").filter(cols)
    require(cands.nonEmpty, s"no metric value column in ${df.columns.toSeq}")
    coalesce(cands.map(c => col(c).cast("double")): _*)
  }

  // ---- datadog_metrics (legacy v1 JSON series; the default protobuf
  //      v2 + sketch egress lives in DdMetrics) ----

  case class DatadogMetricsConfig(
      endpoint: String, apiKey: String,
      defaultNamespace: Option[String] = None)
      extends Serializable

  /** serde_json-style f64 rendering for the v1 body: plain decimal
    * with a kept `.0` on integral values ("5.0", "10000000.0" — where
    * Java flips to scientific notation at 1e7).
    */
  private val jsonF64 = udf((v: Double) =>
    if (v.isNaN || v.isInfinite) "null"
    else {
      val s = new java.math.BigDecimal(java.lang.Double.toString(v))
        .stripTrailingZeros().toPlainString
      if (s.contains('.')) s else s + ".0"
    })

  /** One SeriesApiVersion::V1 JSON entry per metric row
    * (generate_series_metrics, encoder.rs:839-900 +
    * common/datadog.rs DatadogSeriesMetric): snake_case `type`
    * ("count"/"rate"/"gauge"), `points` as `[ts, value]` tuples,
    * counter÷interval → rate, host/device/source_type_name tags
    * promoted to top-level keys, remaining tags sorted `k:v`.
    */
  def datadogSeriesEntry(df: DataFrame,
                         defaultNamespace: Option[String] = None): Column = {
    val cols = df.columns.toSet
    val ns =
      if (cols("namespace"))
        coalesce(col("namespace").cast("string"),
          defaultNamespace.map(lit).getOrElse(lit(null).cast("string")))
      else defaultNamespace.map(lit).getOrElse(lit(null).cast("string"))
    val name = when(ns.isNotNull && ns =!= "",
      concat(ns, lit("."), col("name"))).otherwise(col("name").cast("string"))
    val vt =
      if (cols("value_type")) col("value_type")
      else if (cols("kind"))
        when(col("kind") === "incremental", lit("counter"))
          .otherwise(lit("gauge"))
      else lit("gauge")
    val intervalS =
      if (cols("interval_ms"))
        when(col("interval_ms").isNotNull,
          (col("interval_ms").cast("long") / 1000L).cast("long"))
      else lit(null).cast("long")
    val isRate = vt === "counter" && intervalS.isNotNull
    val dtype = when(isRate, lit("rate"))
      .when(vt === "counter", lit("count")).otherwise(lit("gauge"))
    val counterVal = coalesce(
      Seq("counter_value", "value").filter(cols).map(c =>
        col(c).cast("double")) :+ lit(null).cast("double"): _*)
    val gaugeVal = coalesce(
      Seq("gauge_value", "value", "counter_value").filter(cols).map(c =>
        col(c).cast("double")) :+ lit(null).cast("double"): _*)
    val value = {
      val base = when(isRate, counterVal / intervalS.cast("double"))
        .when(vt === "counter", counterVal)
      (if (cols("set_values"))
        base.when(vt === "set", size(col("set_values")).cast("double"))
      else base).otherwise(gaugeVal)
    }
    val ts = unix_seconds(Template.timestampCol(df.schema))
    val tags0 =
      if (cols("tags")) coalesce(col("tags"),
        map().cast("map<string,string>"))
      else map().cast("map<string,string>")
    val host =
      if (cols("host")) coalesce(col("host").cast("string"),
        element_at(tags0, "host"))
      else element_at(tags0, "host")
    val device = element_at(tags0, "device")
    val stn = element_at(tags0, "source_type_name")
    val tagStrs = array_sort(transform(map_entries(map_filter(tags0,
      (k, _) => !k.isin("host", "device", "source_type_name"))), e =>
      when(e.getField("value") === "", e.getField("key"))
        .otherwise(concat(e.getField("key"), lit(":"),
          e.getField("value")))))
    // points are JSON tuples ([ts, value]) so the entry is assembled
    // around a hand-built points splice; serde skips absent
    // host/device/source_type_name keys. Strings are JSON-escaped via
    // the to_json(array(…)) bracket-strip trick (see esBulkPair).
    def jstr(c: Column): Column = {
      val quoted = to_json(array(c.cast("string")))
      quoted.substr(lit(2), length(quoted) - 2)
    }
    concat(
      lit("""{"metric":"""), jstr(name),
      lit(""","type":""""), dtype, lit("\""),
      when(intervalS.isNotNull,
        concat(lit(""","interval":"""), intervalS.cast("string")))
        .otherwise(lit(""","interval":null""")),
      lit(""","points":[["""), ts.cast("string"), lit(","),
      jsonF64(value), lit("]]"),
      lit(""","tags":"""), to_json(tagStrs),
      when(host.isNotNull, concat(lit(""","host":"""), jstr(host)))
        .otherwise(lit("")),
      when(stn.isNotNull,
        concat(lit(""","source_type_name":"""), jstr(stn)))
        .otherwise(lit("")),
      when(device.isNotNull, concat(lit(""","device":"""), jstr(device)))
        .otherwise(lit("")),
      lit("}"))
  }

  /** Series v1 JSON to `/api/v1/series` (SeriesApiVersion::V1 —
    * encoder.rs:259-280 writes the same `{"series":[…]}` envelope
    * incrementally). The config-registered datadog_metrics sink ships
    * protobuf v2 via [[graft.sinks.DdMetrics]]; this leg covers the
    * reference's still-supported v1 opt-in.
    */
  def writeDatadogMetrics(df: DataFrame, cfg: DatadogMetricsConfig): Unit = {
    val entry = datadogSeriesEntry(df, cfg.defaultNamespace)
    NetworkSinks.writeHttpBody(df.select(entry.as("__line")),
      HttpConfig(uri = cfg.endpoint.stripSuffix("/") + "/api/v1/series",
        framing = "character_delimited", delimiter = ",", maxEvents = 1000,
        contentType = "application/json",
        headers = Map("DD-API-KEY" -> cfg.apiKey),
        payloadPrefix = """{"series":[""", payloadSuffix = "]}"))
  }

  // ---- datadog_events ----

  case class DatadogEventsConfig(endpoint: String, apiKey: String)
      extends Serializable

  def writeDatadogEvents(df: DataFrame, cfg: DatadogEventsConfig): Unit = {
    def optCol(n: String): Column =
      if (df.columns.contains(n)) col(n).cast("string") else lit(null)
    val title = coalesce(optCol("title"), optCol("message"), lit("event"))
    val entry = to_json(struct(title.as("title"),
      coalesce(optCol("text"), optCol("message"), lit("")).as("text"),
      unix_seconds(tsOf(df)).as("date_happened"),
      coalesce(optCol("host"), lit(null)).as("host")))
    NetworkSinks.writeHttpBody(df.select(entry.as("__line")),
      HttpConfig(uri = cfg.endpoint.stripSuffix("/") + "/api/v1/events",
        maxEvents = 1, contentType = "application/json",
        headers = Map("DD-API-KEY" -> cfg.apiKey)))
  }

  // datadog_traces lives in DdTraces (protobuf TracePayload + APM
  // stats — the reference sink has no JSON form)

  // ---- new_relic ----

  case class NewRelicConfig(
      endpoint: String, licenseKey: String, accountId: String = "",
      api: String = "logs") // logs | metrics | events
      extends Serializable

  /** One Logs-API entry per event: ms timestamp + message + the full
    * event under `attributes`.
    */
  def newRelicLogEntry(df: DataFrame): Column =
    to_json(struct(
      unix_millis(tsOf(df)).as("timestamp"),
      (if (df.columns.contains("message")) col("message").cast("string")
      else to_json(eventStruct(df))).as("message"),
      eventStruct(df).as("attributes")))

  def writeNewRelic(df: DataFrame, cfg: NewRelicConfig): Unit = {
    val base = cfg.endpoint.stripSuffix("/")
    val auth = Map("Api-Key" -> cfg.licenseKey)
    cfg.api match {
      case "logs" =>
        val entry = newRelicLogEntry(df)
        NetworkSinks.writeHttpBody(df.select(entry.as("__line")),
          HttpConfig(uri = base + "/log/v1",
            framing = "character_delimited", delimiter = ",",
            maxEvents = 1000, contentType = "application/json",
            headers = auth,
            payloadPrefix = """[{"logs":[""", payloadSuffix = "]}]"))
      case "metrics" =>
        val entry = to_json(struct(col("name").cast("string").as("name"),
          lit("gauge").as("type"),
          metricValue(df).as("value"),
          unix_millis(tsOf(df)).as("timestamp")))
        NetworkSinks.writeHttpBody(df.select(entry.as("__line")),
          HttpConfig(uri = base + "/metric/v1",
            framing = "character_delimited", delimiter = ",",
            maxEvents = 1000, contentType = "application/json",
            headers = auth,
            payloadPrefix = """[{"metrics":[""", payloadSuffix = "]}]"))
      case "events" =>
        val entry = to_json(struct(
          lit("VectorEvent").as("eventType") +:
            userFields(df).map(col): _*))
        NetworkSinks.writeHttpBody(df.select(entry.as("__line")),
          HttpConfig(uri = base + s"/v1/accounts/${cfg.accountId}/events",
            framing = "character_delimited", delimiter = ",",
            maxEvents = 1000, contentType = "application/json",
            headers = auth, payloadPrefix = "[", payloadSuffix = "]"))
      case other =>
        throw new IllegalArgumentException(s"new_relic api: $other")
    }
  }

  // ---- honeycomb ----

  case class HoneycombConfig(endpoint: String, apiKey: String,
                             dataset: String)
      extends Serializable

  def writeHoneycomb(df: DataFrame, cfg: HoneycombConfig): Unit = {
    val entry = to_json(struct(
      date_format(tsOf(df), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("time"),
      eventStruct(df).as("data")))
    NetworkSinks.writeHttpBody(df.select(entry.as("__line")),
      HttpConfig(
        uri = cfg.endpoint.stripSuffix("/") + s"/1/batch/${cfg.dataset}",
        framing = "character_delimited", delimiter = ",", maxEvents = 1000,
        contentType = "application/json",
        headers = Map("X-Honeycomb-Team" -> cfg.apiKey),
        payloadPrefix = "[", payloadSuffix = "]"))
  }

  // ---- axiom ----

  case class AxiomConfig(url: String, token: String, dataset: String,
                         orgId: String = "")
      extends Serializable

  def writeAxiom(df: DataFrame, cfg: AxiomConfig): Unit = {
    val entry = to_json(eventStruct(df))
    NetworkSinks.writeHttpBody(df.select(entry.as("__line")),
      HttpConfig(
        uri = cfg.url.stripSuffix("/") +
          s"/v1/datasets/${cfg.dataset}/ingest",
        framing = "character_delimited", delimiter = ",", maxEvents = 1000,
        contentType = "application/json",
        headers = Map("Authorization" -> s"Bearer ${cfg.token}") ++
          (if (cfg.orgId.nonEmpty) Map("X-Axiom-Org-Id" -> cfg.orgId)
          else Map.empty),
        payloadPrefix = "[", payloadSuffix = "]"))
  }

  // ---- mezmo (logdna) ----

  case class MezmoConfig(endpoint: String, apiKey: String,
                         hostname: String = "vector")
      extends Serializable

  def writeMezmo(df: DataFrame, cfg: MezmoConfig): Unit = {
    def optCol(n: String): Seq[Column] =
      if (df.columns.contains(n)) Seq(col(n).cast("string").as(n)) else Nil
    val entry = to_json(struct(
      Seq(unix_millis(tsOf(df)).as("timestamp"),
        (if (df.columns.contains("message")) col("message").cast("string")
        else to_json(eventStruct(df))).as("line")) ++
        optCol("app") ++ optCol("level") ++
        Seq(eventStruct(df).as("meta")): _*))
    val basic = java.util.Base64.getEncoder.encodeToString(
      (cfg.apiKey + ":").getBytes("UTF-8"))
    NetworkSinks.writeHttpBody(df.select(entry.as("__line")),
      HttpConfig(
        uri = cfg.endpoint.stripSuffix("/") +
          s"/logs/ingest?hostname=${cfg.hostname}",
        framing = "character_delimited", delimiter = ",", maxEvents = 1000,
        contentType = "application/json",
        headers = Map("Authorization" -> s"Basic $basic"),
        payloadPrefix = """{"lines":[""", payloadSuffix = "]}"))
  }

  // ---- humio_logs (HEC-compatible) ----

  def writeHumio(df: DataFrame, endpoint: String, token: String): Unit =
    NetworkSinks.writeHttpBody(
      df.select(Envelopes.hecEvent(df).as("__line")),
      HttpConfig(
        uri = endpoint.stripSuffix("/") + "/api/v1/ingest/hec",
        maxEvents = 1000, contentType = "application/json",
        headers = Map("Authorization" -> s"Bearer $token")))

  // ---- humio_metrics (metric_to_log + HEC ingest) ----

  /** src/sinks/humio/metrics.rs: the metric event passes through the
    * metric_to_log shaping, then rides the SAME HEC-compatible humio
    * ingest as humio_logs; the host comes from the host_key metric tag.
    */
  def writeHumioMetrics(df: DataFrame, endpoint: String, token: String,
                        hostKey: String = "host"): Unit = {
    val log = df.select(Envelopes.metricLogStruct(df).as("__e"))
      .select(org.apache.spark.sql.functions.col("__e.*"))
    NetworkSinks.writeHttpBody(
      log.select(Envelopes.hecEvent(log,
        host = s"{{ tags.$hostKey }}").as("__line")),
      HttpConfig(
        uri = endpoint.stripSuffix("/") + "/api/v1/ingest/hec",
        maxEvents = 1000, contentType = "application/json",
        headers = Map("Authorization" -> s"Bearer $token")))
  }

  // ---- sematext_logs (ES bulk) ----

  def writeSematext(df: DataFrame, endpoint: String, token: String): Unit =
    NetworkSinks.writeHttpBody(
      df.select(Envelopes.esBulkPair(df, index = token).as("__line")),
      HttpConfig(uri = endpoint.stripSuffix("/") + "/_bulk",
        maxEvents = 1000, contentType = "application/json",
        payloadSuffix = "\n"))

  // ---- appsignal ----

  case class AppsignalConfig(endpoint: String, pushApiKey: String)
      extends Serializable

  def writeAppsignal(df: DataFrame, cfg: AppsignalConfig): Unit = {
    val entry = to_json(struct(struct(
      unix_millis(tsOf(df)).as("timestamp"),
      eventStruct(df).as("fields")).as("log")))
    NetworkSinks.writeHttpBody(df.select(entry.as("__line")),
      HttpConfig(
        uri = cfg.endpoint.stripSuffix("/") + "/vector/events",
        framing = "character_delimited", delimiter = ",", maxEvents = 1000,
        contentType = "application/json",
        headers = Map("Authorization" -> s"Bearer ${cfg.pushApiKey}"),
        payloadPrefix = "[", payloadSuffix = "]"))
  }

  // ---- keep ----

  case class KeepConfig(endpoint: String, apiKey: String)
      extends Serializable

  def writeKeep(df: DataFrame, cfg: KeepConfig): Unit = {
    val entry = to_json(eventStruct(df))
    NetworkSinks.writeHttpBody(df.select(entry.as("__line")),
      HttpConfig(uri = cfg.endpoint,
        framing = "character_delimited", delimiter = ",", maxEvents = 1000,
        contentType = "application/json",
        headers = Map("x-api-key" -> cfg.apiKey),
        payloadPrefix = "[", payloadSuffix = "]"))
  }

  // ---- statsd ----

  case class StatsdSinkConfig(address: String, mode: String = "udp",
                              defaultNamespace: Option[String] = None)
      extends Serializable

  /** Classic statsd lines `name:value|type|#tags` — gauge `g`,
    * incremental counter `c` (src/sinks/statsd/encoder.rs). Expects
    * metric-shaped rows: name, value, optional kind + tags.
    */
  def statsdLine(df: DataFrame, defaultNamespace: Option[String]): Column = {
    val name = defaultNamespace
      .map(ns => concat(lit(ns + "."), col("name")))
      .getOrElse(col("name").cast("string"))
    val mtype =
      if (df.columns.contains("kind"))
        when(col("kind") === "incremental", lit("c")).otherwise(lit("g"))
      else lit("g")
    val tags =
      if (df.columns.contains("tags"))
        when(size(map_entries(col("tags"))) > 0,
          concat(lit("|#"), array_join(transform(map_entries(col("tags")),
            e => concat(e.getField("key"), lit(":"), e.getField("value"))),
            ","))).otherwise(lit(""))
      else lit("")
    concat(name, lit(":"), metricValue(df).cast("string"), lit("|"), mtype,
      tags)
  }

  def writeStatsd(df: DataFrame, cfg: StatsdSinkConfig): Unit = {
    val lines = df.select(statsdLine(df, cfg.defaultNamespace).as("message"))
    NetworkSinks.writeSocket(lines,
      NetworkSinks.SocketConfig(cfg.mode, cfg.address, codec = "text"))
  }

  // ---- papertrail ----

  case class PapertrailConfig(endpoint: String, // host:port, tcp
                              process: String = "vector") // template
      extends Serializable

  /** RFC3164-style syslog lines over TCP with the `process` template
    * (src/sinks/papertrail.rs renders `process` into the syslog tag).
    */
  def writePapertrail(df: DataFrame, cfg: PapertrailConfig): Unit = {
    def optCol(n: String, dflt: Column): Column =
      if (df.columns.contains(n)) col(n).cast("string") else dflt
    val proc =
      if (Template.isDynamic(cfg.process))
        Template.render(df.schema, cfg.process)
      else lit(cfg.process)
    val line = graft.codecs.Encode.syslog3164(
      lit(14), // facility user, severity info
      tsOf(df), optCol("host", lit("localhost")), proc, lit(0),
      optCol("message", to_json(eventStruct(df))))
    NetworkSinks.writeSocket(df.select(line.as("message")),
      NetworkSinks.SocketConfig("tcp", cfg.endpoint, codec = "text"))
  }
}
