package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Template
import NetworkSinks.HttpConfig

/** The AWS service sinks, expressed over the services' public wire
  * protocols against a configurable `endpoint` (on a real deployment the
  * regional AWS endpoint; in tests any HTTP server):
  *
  *  - `aws_sqs` / `aws_sns` (src/sinks/aws_s_s/) — SendMessageBatch in
  *    the `application/x-amz-json-1.0` protocol / PublishBatch in the
  *    form-encoded query protocol, 10 entries per request (the API cap).
  *  - `aws_kinesis_streams` / `aws_kinesis_firehose`
  *    (src/sinks/aws_kinesis/) — PutRecords / PutRecordBatch JSON with
  *    base64 `Data`, 500 records per request (the API cap).
  *  - `aws_cloudwatch_logs` (src/sinks/aws_cloudwatch_logs/) —
  *    PutLogEvents per rendered (group, stream) template pair, events
  *    time-ordered inside each request as the API requires.
  *  - `aws_cloudwatch_metrics` (src/sinks/aws_cloudwatch_metrics/) —
  *    PutMetricData in the form-encoded query protocol, 20 per request.
  *
  * Execution shape: envelopes are codegen'd Columns; each task batches
  * its own partition and posts directly (executor-parallel fan-out).
  * Signing (SigV4) is deliberately out of scope — the reference
  * delegates it to the AWS SDK credential chain, deployments here front
  * the endpoint with a signing proxy or IAM-less gateway.
  */
object AwsSinks {

  // ---- aws_sqs ----

  case class SqsConfig(
      queueUrl: String,
      endpoint: String = "", // default: derive from the queue URL host
      messageGroupId: Option[String] = None, // template (FIFO queues)
      messageDeduplicationId: Option[String] = None, // template
      codec: String = "json")
      extends Serializable

  private def amzJson(uri: String, target: String, prefix: String,
                      suffix: String, maxEvents: Int): HttpConfig =
    HttpConfig(uri = uri, codec = "json", framing = "character_delimited",
      delimiter = ",", maxEvents = maxEvents,
      headers = Map("X-Amz-Target" -> target),
      contentType = "application/x-amz-json-1.0",
      payloadPrefix = prefix, payloadSuffix = suffix)

  def writeSqs(df: DataFrame, cfg: SqsConfig): Unit = {
    def opt(name: String, tmpl: Option[String]): Seq[Column] =
      tmpl.toSeq.map(t => Template.render(df.schema, t).as(name))
    val entry = to_json(struct(
      Seq(uuid().as("Id"),
        LineCodec.encode(df, cfg.codec).as("MessageBody")) ++
        opt("MessageGroupId", cfg.messageGroupId) ++
        opt("MessageDeduplicationId", cfg.messageDeduplicationId): _*))
    val uri = if (cfg.endpoint.nonEmpty) cfg.endpoint else cfg.queueUrl
    NetworkSinks.writeHttpBody(df.select(entry.as("__line")),
      amzJson(uri, "AmazonSQS.SendMessageBatch",
        s"""{"QueueUrl":"${cfg.queueUrl}","Entries":[""", "]}", 10))
  }

  // ---- aws_sns ----

  case class SnsConfig(
      topicArn: String,
      endpoint: String,
      codec: String = "json")
      extends Serializable

  /** PublishBatch in the query protocol: `Action=PublishBatch&
    * TopicArn=…&PublishBatchRequestEntries.member.N.Id/.Message=…`.
    */
  def writeSns(df: DataFrame, cfg: SnsConfig): Unit = {
    val lines = df.select(LineCodec.encode(df, cfg.codec).as("__line"))
    val c = cfg
    lines.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
      rows.grouped(10).foreach { batch =>
        val sb = new StringBuilder
        sb.append("Action=PublishBatch&Version=2010-03-31&TopicArn=")
          .append(enc(c.topicArn))
        batch.zipWithIndex.foreach { case (r, i) =>
          val line = r.getString(0)
          if (line != null) {
            val p = s"PublishBatchRequestEntries.member.${i + 1}"
            sb.append(s"&$p.Id=${i + 1}&$p.Message=").append(enc(line))
          }
        }
        NetworkSinks.post(HttpConfig(uri = c.endpoint,
          contentType = "application/x-www-form-urlencoded"),
          sb.toString.getBytes("UTF-8"))
      }
    }
  }

  // ---- aws_kinesis streams / firehose ----

  case class KinesisConfig(
      streamName: String,
      endpoint: String,
      partitionKeyField: Option[String] = None,
      codec: String = "json")
      extends Serializable

  /** One PutRecords entry per event: base64 Data + partition key (no
    * key field → random uuid, the reference's shard round-robin,
    * aws_kinesis/record.rs).
    */
  def kinesisEntry(df: DataFrame, cfg: KinesisConfig): Column = {
    val key = cfg.partitionKeyField.filter(df.columns.contains)
      .map(f => col(f).cast("string")).getOrElse(uuid())
    to_json(struct(
      base64(LineCodec.encode(df, cfg.codec).cast("binary")).as("Data"),
      key.as("PartitionKey")))
  }

  def writeKinesisStreams(df: DataFrame, cfg: KinesisConfig): Unit = {
    val entry = kinesisEntry(df, cfg)
    NetworkSinks.writeHttpBody(df.select(entry.as("__line")),
      amzJson(cfg.endpoint, "Kinesis_20131202.PutRecords",
        s"""{"StreamName":"${cfg.streamName}","Records":[""", "]}", 500))
  }

  def writeKinesisFirehose(df: DataFrame, cfg: KinesisConfig): Unit = {
    // firehose concatenates records verbatim — the newline goes INSIDE
    // the base64 Data, as the reference's encoder does
    val entry = to_json(struct(
      base64(concat(LineCodec.encode(df, cfg.codec), lit("\n"))
        .cast("binary")).as("Data")))
    NetworkSinks.writeHttpBody(df.select(entry.as("__line")),
      amzJson(cfg.endpoint, "Firehose_20150804.PutRecordBatch",
        s"""{"DeliveryStreamName":"${cfg.streamName}","Records":[""",
        "]}", 500))
  }

  // ---- aws_cloudwatch_logs ----

  case class CloudwatchLogsConfig(
      groupName: String, // template
      streamName: String, // template
      endpoint: String,
      codec: String = "json")
      extends Serializable

  /** One PutLogEvents request per rendered (group, stream) pair; the
    * same single shuffle any per-stream batching needs, log events
    * sorted by timestamp inside each request (API requirement).
    */
  /** One PutLogEvents body per rendered (group, stream) pair. */
  def cloudwatchLogsBodies(df: DataFrame,
                           cfg: CloudwatchLogsConfig): DataFrame = {
    val ts = Template.timestampCol(df.schema)
    val grouped = df
      .groupBy(Template.render(df.schema, cfg.groupName).as("__group"),
        Template.render(df.schema, cfg.streamName).as("__stream"))
      .agg(array_sort(collect_list(struct(
        unix_millis(ts).as("timestamp"),
        LineCodec.encode(df, cfg.codec).as("message")))).as("__events"))
    val body = to_json(struct(col("__group").as("logGroupName"),
      col("__stream").as("logStreamName"), col("__events").as("logEvents")))
    grouped.select(body.as("__line"))
  }

  def writeCloudwatchLogs(df: DataFrame, cfg: CloudwatchLogsConfig): Unit = {
    NetworkSinks.writeHttpBody(cloudwatchLogsBodies(df, cfg),
      HttpConfig(uri = cfg.endpoint, maxEvents = 1,
        headers = Map("X-Amz-Target" -> "Logs_20140328.PutLogEvents"),
        contentType = "application/x-amz-json-1.1"))
  }

  // ---- aws_cloudwatch_metrics ----

  case class CloudwatchMetricsConfig(
      namespace: String,
      endpoint: String)
      extends Serializable

  /** PutMetricData (query protocol). Expects a metric-shaped frame:
    * `name` + `value` columns, optional `ts` timestamp and `tags`
    * map<string,string> (→ Dimensions).
    */
  def writeCloudwatchMetrics(df: DataFrame,
                             cfg: CloudwatchMetricsConfig): Unit = {
    val ts =
      if (df.columns.contains("ts"))
        date_format(col("ts").cast("timestamp"),
          "yyyy-MM-dd'T'HH:mm:ss'Z'").as("__ts")
      else lit(null).cast("string").as("__ts")
    val tags =
      if (df.columns.contains("tags")) to_json(col("tags")).as("__tags")
      else lit(null).cast("string").as("__tags")
    val rows = df.select(col("name").cast("string").as("__name"),
      SaasSinks.metricValue(df).as("__value"), ts, tags)
    val c = cfg
    rows.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
      it.grouped(20).foreach { batch =>
        val sb = new StringBuilder
        sb.append("Action=PutMetricData&Version=2010-08-01&Namespace=")
          .append(enc(c.namespace))
        batch.zipWithIndex.foreach { case (r, i) =>
          val p = s"MetricData.member.${i + 1}"
          sb.append(s"&$p.MetricName=").append(enc(r.getString(0)))
          sb.append(s"&$p.Value=").append(r.getDouble(1))
          if (!r.isNullAt(2))
            sb.append(s"&$p.Timestamp=").append(enc(r.getString(2)))
          if (!r.isNullAt(3)) {
            import scala.jdk.CollectionConverters._
            val dims = graft.functions.JsonLite.parse(r.getString(3))
              .asInstanceOf[java.util.Map[String, Any]].asScala
            dims.toSeq.sortBy(_._1).zipWithIndex.foreach {
              case ((k, v), j) =>
                sb.append(s"&$p.Dimensions.member.${j + 1}.Name=")
                  .append(enc(k))
                sb.append(s"&$p.Dimensions.member.${j + 1}.Value=")
                  .append(enc(v.toString))
            }
          }
        }
        NetworkSinks.post(HttpConfig(uri = c.endpoint,
          contentType = "application/x-www-form-urlencoded"),
          sb.toString.getBytes("UTF-8"))
      }
    }
  }
}
