package graft

/** `vector list` equivalent: print every component type the YAML loader
  * accepts, grouped as sources / transforms / sinks / enrichment tables.
  *
  * Reference: /root/reference/src/list.rs (text and json formats; the
  * reference enumerates its inventory via component descriptions — here
  * the registry IS ConfigLoader's dispatch, so the lists are maintained
  * alongside it and spot-checked by ToolingSpec against the loader).
  *
  * Usage: graft.ListComponents [--format text|json]
  */
object ListComponents {

  val sources: Seq[String] = Seq(
    "amqp", "apache_metrics", "aws_ecs_metrics", "aws_kinesis_firehose",
    "aws_sqs", "datadog_agent", "demo_logs", "dnstap", "docker_logs",
    "eventstoredb_metrics", "exec", "file", "fluent", "gcp_pubsub",
    "heroku_logs", "host_metrics", "http_client", "http_server",
    "internal_logs", "internal_metrics", "journald", "kafka",
    "kubernetes_logs", "logstash", "mongodb_metrics", "mqtt", "nats",
    "nginx_metrics", "okta", "opentelemetry", "parquet",
    "postgresql_metrics", "prometheus", "prometheus_pushgateway",
    "prometheus_remote_write", "pulsar", "redis", "socket", "splunk_hec",
    "static_metrics", "stdin", "websocket")

  val transforms: Seq[String] = Seq(
    "aggregate", "aws_ec2_metadata", "dedupe", "delay", "exclusive_route",
    "filter", "incremental_to_absolute", "line_agg", "log_to_metric",
    "lua", "metric_to_log", "reduce", "remap", "route", "sample",
    "tag_cardinality_limit", "throttle", "trace_to_log", "window")

  val sinks: Seq[String] = Seq(
    "amqp", "appsignal", "aws_cloudwatch_logs", "aws_cloudwatch_metrics",
    "aws_kinesis_firehose", "aws_kinesis_streams", "aws_s3", "aws_sns",
    "aws_sqs", "axiom", "azure_blob", "azure_logs_ingestion",
    "azure_monitor_logs", "blackhole", "clickhouse", "console",
    "databend", "datadog_events", "datadog_logs", "datadog_metrics",
    "datadog_traces", "doris", "elasticsearch", "file", "gcp_chronicle",
    "gcp_cloud_storage", "gcp_pubsub", "gcp_stackdriver_logs",
    "gcp_stackdriver_metrics", "greptimedb_logs", "honeycomb", "http",
    "humio_logs", "influxdb", "kafka", "keep", "loki", "memory", "mezmo",
    "mqtt", "nats", "new_relic", "opentelemetry", "papertrail", "parquet",
    "postgres", "prometheus_exporter", "prometheus_remote_write",
    "pulsar", "redis", "sematext_logs", "socket", "splunk_hec", "statsd",
    "vector", "webhdfs", "websocket", "websocket_server")

  val enrichmentTables: Seq[String] = Seq("file", "geoip", "memory", "mmdb")

  def render(format: String): String = format match {
    case "json" =>
      def arr(xs: Seq[String]) =
        xs.map("\"" + _ + "\"").mkString("[", ",", "]")
      s"""{"sources":${arr(sources)},"transforms":${arr(transforms)},""" +
        s""""sinks":${arr(sinks)},"enrichment_tables":${arr(enrichmentTables)}}"""
    case _ =>
      val sb = new StringBuilder
      sb.append("Sources:\n")
      sources.foreach(s => sb.append(s"- $s\n"))
      sb.append("\nTransforms:\n")
      transforms.foreach(s => sb.append(s"- $s\n"))
      sb.append("\nSinks:\n")
      sinks.foreach(s => sb.append(s"- $s\n"))
      sb.append("\nEnrichment tables:\n")
      enrichmentTables.foreach(s => sb.append(s"- $s\n"))
      sb.toString
  }

  def main(args: Array[String]): Unit = {
    val format = args.sliding(2).collectFirst {
      case Array("--format", f) => f }.getOrElse("text")
    println(render(format))
  }
}
