package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Template
import NetworkSinks.HttpConfig

/** GCP and Azure service sinks over their public REST wire formats
  * against a configurable `endpoint` (tests point it at a local
  * server; deployments at the real service or a credentialing proxy —
  * OAuth token acquisition is the deploy environment's concern, as the
  * reference delegates it to its gcp auth layer):
  *
  *  - `gcp_pubsub` (src/sinks/gcp/pubsub.rs) — `POST
  *    {endpoint}/v1/projects/{p}/topics/{t}:publish` with base64 data.
  *  - `gcp_stackdriver_logs` (src/sinks/gcp/stackdriver/logs/) —
  *    `entries:write` with logName/resource/severity per entry.
  *  - `gcp_stackdriver_metrics` (src/sinks/gcp/stackdriver/metrics/) —
  *    `projects/{p}/timeSeries` with one point per series.
  *  - `gcp_chronicle` (src/sinks/gcp_chronicle/) — unstructured log
  *    entries batchCreate, grouped by rendered log_type template.
  *  - `azure_monitor_logs` (src/sinks/azure_monitor_logs/) — Log
  *    Analytics Data Collector API with the REAL SharedKey HMAC-SHA256
  *    signature over the canonical string.
  *  - `azure_logs_ingestion` (src/sinks/azure_logs_ingestion/) — DCR
  *    streams ingestion, JSON array body.
  */
object CloudSinks {

  private def userFields(df: DataFrame): Seq[String] =
    df.columns.filterNot(_.startsWith("__")).toSeq

  private def eventStruct(df: DataFrame): Column =
    struct(userFields(df).map(col): _*)

  // ---- gcp_pubsub ----

  case class PubsubConfig(
      project: String, topic: String, endpoint: String,
      codec: String = "json")
      extends Serializable

  def writePubsub(df: DataFrame, cfg: PubsubConfig): Unit = {
    val entry = to_json(struct(
      base64(LineCodec.encode(df, cfg.codec).cast("binary")).as("data")))
    NetworkSinks.writeHttpBody(df.select(entry.as("__line")),
      HttpConfig(
        uri = cfg.endpoint.stripSuffix("/") +
          s"/v1/projects/${cfg.project}/topics/${cfg.topic}:publish",
        framing = "character_delimited", delimiter = ",",
        maxEvents = 1000, contentType = "application/json",
        payloadPrefix = """{"messages":[""", payloadSuffix = "]}"))
  }

  // ---- gcp_stackdriver_logs ----

  case class StackdriverLogsConfig(
      projectId: String, logId: String, // log_id is a template
      endpoint: String,
      resourceType: String = "global",
      resourceLabels: Map[String, String] = Map.empty,
      severityKey: Option[String] = None)
      extends Serializable

  def writeStackdriverLogs(df: DataFrame,
                           cfg: StackdriverLogsConfig): Unit = {
    val sev = cfg.severityKey.filter(df.columns.contains)
      .map(k => upper(col(k).cast("string")))
      .getOrElse(lit("DEFAULT"))
    val logName = concat(lit(s"projects/${cfg.projectId}/logs/"),
      Template.render(df.schema, cfg.logId))
    val resource = struct(lit(cfg.resourceType).as("type"),
      map(cfg.resourceLabels.toSeq.sortBy(_._1)
        .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*).as("labels"))
    val entry = to_json(struct(logName.as("logName"),
      resource.as("resource"), sev.as("severity"),
      eventStruct(df).as("jsonPayload")))
    NetworkSinks.writeHttpBody(df.select(entry.as("__line")),
      HttpConfig(
        uri = cfg.endpoint.stripSuffix("/") + "/v2/entries:write",
        framing = "character_delimited", delimiter = ",",
        maxEvents = 1000, contentType = "application/json",
        payloadPrefix = """{"entries":[""", payloadSuffix = "]}"))
  }

  // ---- gcp_stackdriver_metrics ----

  case class StackdriverMetricsConfig(
      projectId: String, endpoint: String,
      defaultNamespace: String = "namespace",
      resourceType: String = "global")
      extends Serializable

  /** Expects a metric-shaped frame: `name`, `value`, optional `ts`. One
    * timeSeries entry per row, custom.googleapis.com metric types like
    * the reference.
    */
  def writeStackdriverMetrics(df: DataFrame,
                              cfg: StackdriverMetricsConfig): Unit = {
    val ts =
      if (df.columns.contains("ts"))
        date_format(col("ts").cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
      else lit("1970-01-01T00:00:00Z")
    val entry = to_json(struct(
      struct(concat(lit(s"custom.googleapis.com/${cfg.defaultNamespace}/"),
        col("name")).as("type")).as("metric"),
      struct(lit(cfg.resourceType).as("type")).as("resource"),
      array(struct(
        struct(ts.as("endTime")).as("interval"),
        struct(SaasSinks.metricValue(df).as("doubleValue")).as("value")))
        .as("points")))
    NetworkSinks.writeHttpBody(df.select(entry.as("__line")),
      HttpConfig(
        uri = cfg.endpoint.stripSuffix("/") +
          s"/v3/projects/${cfg.projectId}/timeSeries",
        framing = "character_delimited", delimiter = ",",
        maxEvents = 200, // the API's timeSeries-per-request cap
        contentType = "application/json",
        payloadPrefix = """{"timeSeries":[""", payloadSuffix = "]}"))
  }

  // ---- gcp_chronicle ----

  case class ChronicleConfig(
      customerId: String, logType: String, // template
      endpoint: String, codec: String = "json")
      extends Serializable

  /** Unstructured log entries batchCreate; one request per rendered
    * log_type (the reference partitions by the template the same way).
    */
  def writeChronicle(df: DataFrame, cfg: ChronicleConfig): Unit = {
    val grouped = df
      .groupBy(Template.render(df.schema, cfg.logType).as("__log_type"))
      .agg(collect_list(LineCodec.encode(df, cfg.codec)).as("__texts"))
    val body = to_json(struct(
      lit(cfg.customerId).as("customer_id"),
      col("__log_type").as("log_type"),
      transform(col("__texts"), t => struct(t.as("log_text"))).as("entries")))
    NetworkSinks.writeHttpBody(grouped.select(body.as("__line")),
      HttpConfig(
        uri = cfg.endpoint.stripSuffix("/") +
          "/v2/unstructuredlogentries:batchCreate",
        maxEvents = 1, contentType = "application/json"))
  }

  // ---- azure_monitor_logs ----

  case class AzureMonitorConfig(
      customerId: String, // workspace id
      sharedKey: String, // base64 primary/secondary key
      logType: String,
      endpoint: String = "", // default: the real ods.opinsights host
      azureResourceId: Option[String] = None)
      extends Serializable

  /** The Data Collector API's SharedKey authorization — HMAC-SHA256 of
    * `POST\n{len}\napplication/json\nx-ms-date:{rfc1123}\n/api/logs`
    * with the base64-decoded workspace key, exactly the published
    * scheme the reference implements.
    */
  private[sinks] def azureSignature(sharedKey: String, contentLength: Int,
                                    rfcDate: String): String = {
    val toSign = s"POST\n$contentLength\napplication/json\n" +
      s"x-ms-date:$rfcDate\n/api/logs"
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(
      java.util.Base64.getDecoder.decode(sharedKey), "HmacSHA256"))
    java.util.Base64.getEncoder.encodeToString(
      mac.doFinal(toSign.getBytes("UTF-8")))
  }

  def writeAzureMonitor(df: DataFrame, cfg: AzureMonitorConfig): Unit = {
    val entry = to_json(eventStruct(df))
    val c = cfg
    df.select(entry.as("__line")).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        val uri = (if (c.endpoint.nonEmpty) c.endpoint
          else s"https://${c.customerId}.ods.opinsights.azure.com")
          .stripSuffix("/") + "/api/logs?api-version=2016-04-01"
        rows.grouped(1000).foreach { batch =>
          val body = batch.flatMap(r => Option(r.getString(0)))
            .mkString("[", ",", "]").getBytes("UTF-8")
          val rfcDate = java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME
            .format(java.time.ZonedDateTime.now(java.time.ZoneOffset.UTC))
          val sig = azureSignature(c.sharedKey, body.length, rfcDate)
          val headers = Map(
            "Log-Type" -> c.logType,
            "x-ms-date" -> rfcDate,
            "Authorization" -> s"SharedKey ${c.customerId}:$sig") ++
            c.azureResourceId.map("x-ms-AzureResourceId" -> _)
          NetworkSinks.post(HttpConfig(uri = uri,
            contentType = "application/json", headers = headers), body)
        }
    }
  }

  // ---- azure_logs_ingestion ----

  case class AzureLogsIngestionConfig(
      endpoint: String, dcrImmutableId: String, streamName: String,
      token: String = "")
      extends Serializable

  def writeAzureLogsIngestion(df: DataFrame,
                              cfg: AzureLogsIngestionConfig): Unit = {
    val entry = to_json(eventStruct(df))
    NetworkSinks.writeHttpBody(df.select(entry.as("__line")),
      HttpConfig(
        uri = cfg.endpoint.stripSuffix("/") +
          s"/dataCollectionRules/${cfg.dcrImmutableId}/streams/" +
          s"${cfg.streamName}?api-version=2023-01-01",
        framing = "character_delimited", delimiter = ",",
        maxEvents = 1000, contentType = "application/json",
        headers = if (cfg.token.nonEmpty)
          Map("Authorization" -> s"Bearer ${cfg.token}") else Map.empty,
        payloadPrefix = "[", payloadSuffix = "]"))
  }
}
