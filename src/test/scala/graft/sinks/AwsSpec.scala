package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AWS-protocol sinks and sources against capturing/serving local HTTP
  * endpoints: SQS SendMessageBatch/ReceiveMessage amz-json, SNS
  * PublishBatch query protocol, Kinesis PutRecords / Firehose
  * PutRecordBatch with base64 Data, CloudWatch PutLogEvents per
  * template (group, stream), PutMetricData query protocol, and the ECS
  * task-metadata stats scrape.
  */
class AwsSpec extends SparkSpec {
  import spark.implicits._

  private class AmzServer {
    // (X-Amz-Target or "", body, content-type)
    val reqs = new java.util.concurrent.CopyOnWriteArrayList[
      (String, String, String)]()
    @volatile var reply: String = "{}"
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    server.createContext("/", { ex =>
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      reqs.add((Option(ex.getRequestHeaders.getFirst("X-Amz-Target"))
        .getOrElse(""), body,
        Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")))
      val out = reply.getBytes("UTF-8")
      ex.sendResponseHeaders(200, out.length)
      ex.getResponseBody.write(out); ex.close()
    })
    server.start()
    def url: String = s"http://localhost:${server.getAddress.getPort}/"
    def stop(): Unit = server.stop(0)
    def targets: Seq[String] =
      reqs.toArray.map(_.asInstanceOf[(String, String, String)]._1).toSeq
    def bodies: Seq[String] =
      reqs.toArray.map(_.asInstanceOf[(String, String, String)]._2).toSeq
  }

  private def events = Seq(
    ("web", "alpha", "2024-03-05T10:00:00Z"),
    ("api", "beta", "2024-03-05T11:00:00Z"))
    .toDF("app", "message", "tss")
    .withColumn("timestamp", col("tss").cast("timestamp")).drop("tss")

  test("aws_sqs sink sends SendMessageBatch with per-entry uuid ids") {
    val srv = new AmzServer
    try {
      AwsSinks.writeSqs(events.coalesce(1), AwsSinks.SqsConfig(
        "https://sqs.local/123/q1", endpoint = srv.url, codec = "text"))
      assert(srv.targets == Seq("AmazonSQS.SendMessageBatch"))
      val b = srv.bodies.head
      assert(b.contains("\"QueueUrl\":\"https://sqs.local/123/q1\""))
      assert(b.contains("\"MessageBody\":\"alpha\"") &&
        b.contains("\"MessageBody\":\"beta\""))
    } finally srv.stop()
  }

  test("aws_sns sink publishes form-encoded PublishBatch entries") {
    val srv = new AmzServer
    try {
      AwsSinks.writeSns(events.coalesce(1), AwsSinks.SnsConfig(
        "arn:aws:sns:us-east-1:1:t", srv.url, codec = "text"))
      val b = srv.bodies.head
      assert(b.startsWith("Action=PublishBatch"))
      assert(b.contains("TopicArn=arn%3Aaws%3Asns%3Aus-east-1%3A1%3At"))
      assert(b.contains("PublishBatchRequestEntries.member.1.Message=alpha"))
      assert(b.contains("PublishBatchRequestEntries.member.2.Message=beta"))
    } finally srv.stop()
  }

  test("aws_kinesis_streams sink PutRecords: base64 data + partition key") {
    val srv = new AmzServer
    try {
      AwsSinks.writeKinesisStreams(events.coalesce(1), AwsSinks.KinesisConfig(
        "mystream", srv.url, partitionKeyField = Some("app"), codec = "text"))
      assert(srv.targets == Seq("Kinesis_20131202.PutRecords"))
      val b = srv.bodies.head
      assert(b.contains("\"StreamName\":\"mystream\""))
      val alpha = java.util.Base64.getEncoder.encodeToString(
        "alpha".getBytes("UTF-8"))
      assert(b.contains(s""""Data":"$alpha","PartitionKey":"web""""))
    } finally srv.stop()
  }

  test("aws_kinesis_firehose sink PutRecordBatch: newline inside Data") {
    val srv = new AmzServer
    try {
      AwsSinks.writeKinesisFirehose(events.coalesce(1),
        AwsSinks.KinesisConfig("fh", srv.url, codec = "text"))
      assert(srv.targets == Seq("Firehose_20150804.PutRecordBatch"))
      val alphaNl = java.util.Base64.getEncoder.encodeToString(
        "alpha\n".getBytes("UTF-8"))
      assert(srv.bodies.head.contains(s""""Data":"$alphaNl""""))
      assert(srv.bodies.head.contains("\"DeliveryStreamName\":\"fh\""))
    } finally srv.stop()
  }

  test("aws_cloudwatch_logs sink: one PutLogEvents per rendered pair") {
    val srv = new AmzServer
    try {
      AwsSinks.writeCloudwatchLogs(events, AwsSinks.CloudwatchLogsConfig(
        "/app/{{ app }}", "stream-1", srv.url, codec = "text"))
      assert(srv.targets.toSet == Set("Logs_20140328.PutLogEvents"))
      assert(srv.bodies.size == 2) // one per rendered group
      val all = srv.bodies.mkString
      assert(all.contains("\"logGroupName\":\"/app/web\""))
      assert(all.contains("\"logGroupName\":\"/app/api\""))
      assert(all.contains(
        "\"timestamp\":1709632800000,\"message\":\"alpha\""))
    } finally srv.stop()
  }

  test("aws_cloudwatch_metrics sink: PutMetricData query protocol") {
    val srv = new AmzServer
    try {
      val metrics = Seq(("requests_total", 42.0, Map("az" -> "a")),
        ("latency_ms", 9.5, Map("az" -> "b")))
        .toDF("name", "value", "tags")
      AwsSinks.writeCloudwatchMetrics(metrics.coalesce(1),
        AwsSinks.CloudwatchMetricsConfig("myns", srv.url))
      val b = srv.bodies.head
      assert(b.contains("Action=PutMetricData"))
      assert(b.contains("Namespace=myns"))
      assert(b.contains("MetricData.member.1.MetricName=requests_total"))
      assert(b.contains("MetricData.member.1.Value=42.0"))
      assert(b.contains("MetricData.member.1.Dimensions.member.1.Name=az"))
      assert(b.contains("MetricData.member.2.MetricName=latency_ms"))
    } finally srv.stop()
  }

  test("aws_s3 source: SQS notifications drive object GETs, gzip + metadata") {
    // one server plays both roles: amz-json SQS on /, S3 objects under
    // /<bucket>/<key>
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    val deletes = new java.util.concurrent.CopyOnWriteArrayList[String]()
    @volatile var pending = true
    val notif =
      """{"Records":[
        |  {"eventName":"ObjectCreated:Put","awsRegion":"us-east-1",
        |   "s3":{"bucket":{"name":"logs"},"object":{"key":"app/a.log"}}},
        |  {"eventName":"ObjectCreated:Copy","awsRegion":"us-east-1",
        |   "s3":{"bucket":{"name":"logs"},"object":{"key":"app/b.log.gz"}}},
        |  {"eventName":"ObjectRemoved:Delete","awsRegion":"us-east-1",
        |   "s3":{"bucket":{"name":"logs"},"object":{"key":"app/gone.log"}}}
        |]}""".stripMargin.replace("\n", "")
    server.createContext("/", { ex =>
      val target = Option(ex.getRequestHeaders.getFirst("X-Amz-Target"))
        .getOrElse("")
      val path = ex.getRequestURI.getPath
      val out: Array[Byte] =
        if (target == "AmazonSQS.ReceiveMessage") {
          if (pending) {
            pending = false
            (s"""{"Messages":[{"Body":${jsonStr(notif)},"ReceiptHandle":"rh1"}]}""")
              .getBytes("UTF-8")
          } else "{}".getBytes("UTF-8")
        } else if (target == "AmazonSQS.DeleteMessageBatch") {
          deletes.add(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
          "{}".getBytes("UTF-8")
        } else if (path == "/logs/app/a.log") {
          "plain one\nplain two\n".getBytes("UTF-8")
        } else if (path == "/logs/app/b.log.gz") {
          val bos = new java.io.ByteArrayOutputStream()
          val gz = new java.util.zip.GZIPOutputStream(bos)
          gz.write("zipped line\n".getBytes("UTF-8")); gz.close()
          bos.toByteArray
        } else "missing".getBytes("UTF-8")
      ex.sendResponseHeaders(200, out.length)
      ex.getResponseBody.write(out); ex.close()
    })
    server.start()
    val base = s"http://localhost:${server.getAddress.getPort}"
    try {
      val src = graft.streaming.AwsSources.s3(spark,
        "https://sqs.local/123/notif", s"$base/", base, pollSecs = 1)
      try {
        val q = src.df.writeStream.format("memory").queryName("s3src").start()
        val deadline = System.currentTimeMillis() + 30000
        var rows = Array.empty[org.apache.spark.sql.Row]
        while (rows.length < 3 && System.currentTimeMillis() < deadline) {
          q.processAllAvailable()
          rows = spark.sql(
            "SELECT message, bucket, object, region FROM s3src").collect()
        }
        val got = rows.map(r => (r.getString(0), r.getString(1),
          r.getString(2), r.getString(3))).toSet
        // ObjectCreated:Put and :Copy ingest (plain + gzip); the
        // ObjectRemoved record must NOT trigger a fetch
        assert(got == Set(
          ("plain one", "logs", "app/a.log", "us-east-1"),
          ("plain two", "logs", "app/a.log", "us-east-1"),
          ("zipped line", "logs", "app/b.log.gz", "us-east-1")))
        // the notification deletes only after ingest
        val dl2 = System.currentTimeMillis() + 20000
        while (deletes.isEmpty && System.currentTimeMillis() < dl2)
          Thread.sleep(50)
        assert(deletes.toArray.exists(_.toString.contains("rh1")))
        q.stop()
      } finally src.stop()
    } finally server.stop(0)
  }

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  test("aws_sqs source polls ReceiveMessage and deletes consumed batches") {
    val srv = new AmzServer
    srv.reply =
      """{"Messages":[{"Body":"{\"n\":1}","ReceiptHandle":"rh1"},
        |{"Body":"{\"n\":2}","ReceiptHandle":"rh2"}]}""".stripMargin
    try {
      val src = graft.streaming.AwsSources.sqs(spark,
        "https://sqs.local/123/q1", srv.url, pollSecs = 1)
      try {
        val q = src.df.writeStream.format("memory").queryName("sqsq").start()
        val deadline = System.currentTimeMillis() + 25000
        var got = Set.empty[String]
        while (got.size < 2 && System.currentTimeMillis() < deadline) {
          q.processAllAvailable()
          got = spark.sql("SELECT message FROM sqsq").collect()
            .map(_.getString(0)).toSet
        }
        assert(got == Set("""{"n":1}""", """{"n":2}"""))
        // a delete for the received batch went back with both handles
        val deadline2 = System.currentTimeMillis() + 20000
        var deletes = Seq.empty[String]
        while (deletes.isEmpty && System.currentTimeMillis() < deadline2) {
          deletes = srv.reqs.toArray
            .map(_.asInstanceOf[(String, String, String)])
            .filter(_._1 == "AmazonSQS.DeleteMessageBatch").map(_._2).toSeq
        }
        assert(deletes.exists(d => d.contains("rh1") && d.contains("rh2")))
        q.stop()
      } finally src.stop()
    } finally srv.stop()
  }

  test("aws_ecs_metrics source converts /task/stats to metric rows") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    server.createContext("/task/stats", { ex =>
      val out =
        """{"c1":{"name":"web","cpu_stats":{"cpu_usage":{"total_usage":123456}},
          |"memory_stats":{"usage":1048576,"limit":2097152},
          |"networks":{"eth0":{"rx_bytes":1000,"tx_bytes":2000}}}}"""
          .stripMargin.replace("\n", "").getBytes("UTF-8")
      ex.sendResponseHeaders(200, out.length)
      ex.getResponseBody.write(out); ex.close()
    })
    server.start()
    try {
      val src = graft.streaming.AwsSources.ecsMetrics(spark,
        s"http://localhost:${server.getAddress.getPort}")
      try {
        val n = src.scrapeOnce()
        assert(n == 5)
        val q = src.df.writeStream.format("memory").queryName("ecsq").start()
        q.processAllAvailable()
        val rows = spark.sql(
          "SELECT namespace, name, kind, value, container_id, container_name FROM ecsq")
          .collect().map(r => (r.getString(1), r.getString(2), r.getDouble(3),
            r.getString(4), r.getString(5))).toSet
        assert(rows.contains(("cpu_total_usage", "counter", 123456.0, "c1", "web")))
        assert(rows.contains(("memory_usage_bytes", "gauge", 1048576.0, "c1", "web")))
        assert(rows.contains(("network_receive_bytes_total", "counter", 1000.0, "c1", "eth0")))
        q.stop()
      } finally src.stop()
    } finally server.stop(0)
  }
}
