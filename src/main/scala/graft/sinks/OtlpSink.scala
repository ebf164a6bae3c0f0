package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.codecs.ProtobufCodec
import graft.codecs.ProtobufCodec.Otlp
import graft.functions.Template
import NetworkSinks.HttpConfig

/** `opentelemetry` sink (src/sinks/opentelemetry/) — OTLP/HTTP export,
  * built with the engine's own proto wire encoder over the published
  * OTLP schemas (the same ones the opentelemetry SOURCE decodes). Each
  * event encodes as a one-record Export*ServiceRequest fragment; proto
  * concatenation merges the repeated resource field, so a batch POSTs
  * as one valid request body to /v1/{logs,metrics,traces}.
  */
object OtlpSink {

  case class Config(
      endpoint: String,
      mode: String = "logs", // logs | metrics | traces
      maxEvents: Int = 1000,
      // `protocol: grpc` — the collector-service Export RPC instead of
      // OTLP/HTTP, over the in-repo h2c gRPC transport
      grpc: Boolean = false)
      extends Serializable

  private def http(cfg: Config, path: String): HttpConfig =
    HttpConfig(uri = cfg.endpoint.stripSuffix("/") + path,
      maxEvents = cfg.maxEvents, contentType = "application/x-protobuf")

  /** Ship fragment batches: concatenated repeated-field fragments form
    * one Export*ServiceRequest per batch; gRPC calls the collector
    * service, HTTP posts to the /v1/<signal> path.
    */
  private def ship(fragments: DataFrame, cfg: Config, signal: String): Unit =
    if (!cfg.grpc)
      NetworkSinks.writeProtoConcat(fragments, http(cfg, s"/v1/$signal"))
    else {
      val uri = new java.net.URI(
        if (cfg.endpoint.contains("://")) cfg.endpoint
        else s"http://${cfg.endpoint}")
      val (host, port) = (uri.getHost, uri.getPort)
      val service = signal match {
        case "metrics" =>
          "/opentelemetry.proto.collector.metrics.v1.MetricsService/Export"
        case "traces" =>
          "/opentelemetry.proto.collector.trace.v1.TraceService/Export"
        case _ =>
          "/opentelemetry.proto.collector.logs.v1.LogsService/Export"
      }
      val max = cfg.maxEvents
      fragments.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.grouped(max).foreach { batch =>
          val raw = new java.io.ByteArrayOutputStream()
          batch.foreach { r =>
            val b = r.getAs[Array[Byte]](0)
            if (b != null) raw.write(b)
          }
          if (raw.size() > 0)
            graft.streaming.Grpc.call(host, port, service, raw.toByteArray)
        }
      }
    }

  def write(df: DataFrame, cfg: Config): Unit = cfg.mode match {
    case "metrics" => writeMetrics(df, cfg)
    case "traces" => writeTraces(df, cfg)
    case _ => writeLogs(df, cfg)
  }

  def writeLogs(df: DataFrame, cfg: Config): Unit = {
    val ts = Template.timestampCol(df.schema)
    val cols = df.columns.toSet
    val body =
      if (cols("message")) col("message").cast("string")
      else to_json(struct(df.columns.filterNot(_.startsWith("__"))
        .map(col).toSeq: _*))
    val sev =
      if (cols("severity_text")) col("severity_text").cast("string")
      else if (cols("level")) upper(col("level").cast("string"))
      else lit("INFO")
    val record = struct(
      (unix_micros(ts) * 1000L).as("time_unix_nano"),
      lit(0L).as("severity_number"),
      sev.as("severity_text"),
      struct(body.as("string_value")).as("body"),
      lit(0L).as("dropped_attributes_count"),
      lit(null).cast("binary").as("trace_id"),
      lit(null).cast("binary").as("span_id"),
      (unix_micros(ts) * 1000L).as("observed_time_unix_nano"))
    val fragment = ProtobufCodec.encode(Otlp.ExportLogsServiceRequest,
      struct(array(struct(array(struct(array(record).as("log_records"),
        lit(null).cast("string").as("schema_url"))).as("scope_logs"),
        lit(null).cast("string").as("schema_url"))).as("resource_logs")))
    ship(df.select(fragment.as("__bytes")), cfg, "logs")
  }

  def writeMetrics(df: DataFrame, cfg: Config): Unit = {
    val ts = Template.timestampCol(df.schema)
    val cols = df.columns.toSet
    val attrs =
      if (cols("tags"))
        transform(map_entries(coalesce(col("tags"),
          map().cast("map<string,string>"))),
          e => struct(e.getField("key").as("key"),
            struct(e.getField("value").as("string_value")).as("value")))
      else array().cast(
        "array<struct<key:string,value:struct<string_value:string>>>")
    val point = struct(
      (unix_micros(ts) * 1000L).as("start_time_unix_nano"),
      (unix_micros(ts) * 1000L).as("time_unix_nano"),
      SaasSinks.metricValue(df).as("as_double"),
      lit(null).cast("long").as("as_int"),
      attrs.as("attributes"))
    val isCounter =
      if (cols("kind")) col("kind") === "incremental" else lit(false)
    val metric = struct(
      col("name").cast("string").as("name"),
      lit(null).cast("string").as("description"),
      lit(null).cast("string").as("unit"),
      when(!isCounter, struct(array(point).as("data_points"))).as("gauge"),
      when(isCounter, struct(array(point).as("data_points"),
        lit(1L).as("aggregation_temporality"), // delta, like incremental
        lit(1L).as("is_monotonic"))).as("sum"))
    val fragment = ProtobufCodec.encode(Otlp.ExportMetricsServiceRequest,
      struct(array(struct(array(struct(array(metric).as("metrics"),
        lit(null).cast("string").as("schema_url"))).as("scope_metrics"),
        lit(null).cast("string").as("schema_url"))).as("resource_metrics")))
    ship(df.select(fragment.as("__bytes")), cfg, "metrics")
  }

  def writeTraces(df: DataFrame, cfg: Config): Unit = {
    val ts = Template.timestampCol(df.schema)
    val cols = df.columns.toSet
    def optBytes(n: String): Column =
      if (cols(n)) unhex(col(n).cast("string"))
      else lit(null).cast("binary")
    val startNs = unix_micros(ts) * 1000L
    val durNs =
      if (cols("duration_ms"))
        (col("duration_ms").cast("double") * 1e6).cast("long")
      else lit(0L)
    val span = struct(
      optBytes("trace_id").as("trace_id"),
      optBytes("span_id").as("span_id"),
      lit(null).cast("string").as("trace_state"),
      optBytes("parent_span_id").as("parent_span_id"),
      (if (cols("name")) col("name").cast("string") else lit("span"))
        .as("name"),
      lit(1L).as("kind"), // internal
      startNs.as("start_time_unix_nano"),
      (startNs + durNs).as("end_time_unix_nano"),
      array().cast(
        "array<struct<key:string,value:struct<string_value:string>>>")
        .as("attributes"))
    val fragment = ProtobufCodec.encode(Otlp.ExportTraceServiceRequest,
      struct(array(struct(array(struct(array(span).as("spans"),
        lit(null).cast("string").as("schema_url"))).as("scope_spans"),
        lit(null).cast("string").as("schema_url"))).as("resource_spans")))
    ship(df.select(fragment.as("__bytes")), cfg, "traces")
  }
}
