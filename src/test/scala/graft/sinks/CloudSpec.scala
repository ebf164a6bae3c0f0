package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GCP + Azure sinks and the gcp_pubsub source against local capturing
  * HTTP endpoints speaking the services' public REST formats.
  */
class CloudSpec extends SparkSpec {
  import spark.implicits._

  private class JsonServer {
    val reqs = new java.util.concurrent.CopyOnWriteArrayList[
      (String, String, Map[String, String])]() // (path, body, headers)
    @volatile var reply: String = "{}"
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    server.createContext("/", { ex =>
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val hdrs = Seq("Authorization", "Log-Type", "x-ms-date",
        "Content-Type", "x-ms-AzureResourceId")
        .flatMap(h => Option(ex.getRequestHeaders.getFirst(h)).map(h -> _))
        .toMap
      reqs.add((ex.getRequestURI.toString, body, hdrs))
      val out = reply.getBytes("UTF-8")
      ex.sendResponseHeaders(200, out.length)
      ex.getResponseBody.write(out); ex.close()
    })
    server.start()
    def url: String = s"http://localhost:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
    def all: Seq[(String, String, Map[String, String])] =
      reqs.toArray.map(_.asInstanceOf[(String, String, Map[String, String])]).toSeq
  }

  private def events = Seq(("web", "alpha", "info"), ("api", "beta", "error"))
    .toDF("app", "message", "level")

  test("gcp_pubsub sink publishes base64 messages to the topic path") {
    val srv = new JsonServer
    try {
      CloudSinks.writePubsub(events.coalesce(1), CloudSinks.PubsubConfig(
        "proj1", "t1", srv.url, codec = "text"))
      val (path, body, _) = srv.all.head
      assert(path == "/v1/projects/proj1/topics/t1:publish")
      val alpha = java.util.Base64.getEncoder.encodeToString(
        "alpha".getBytes("UTF-8"))
      assert(body.contains(s""""data":"$alpha""""))
      assert(body.startsWith("""{"messages":["""))
    } finally srv.stop()
  }

  test("gcp_stackdriver_logs sink writes entries with severity key") {
    val srv = new JsonServer
    try {
      CloudSinks.writeStackdriverLogs(events.coalesce(1),
        CloudSinks.StackdriverLogsConfig("proj1", "app-{{ app }}", srv.url,
          resourceType = "gce_instance",
          resourceLabels = Map("zone" -> "us-east1-b"),
          severityKey = Some("level")))
      val (path, body, _) = srv.all.head
      assert(path == "/v2/entries:write")
      assert(body.contains("\"logName\":\"projects/proj1/logs/app-web\""))
      assert(body.contains("\"severity\":\"ERROR\""))
      assert(body.contains("\"type\":\"gce_instance\""))
      assert(body.contains("\"zone\":\"us-east1-b\""))
      assert(body.contains("\"jsonPayload\":{\"app\":\"web\""))
    } finally srv.stop()
  }

  test("gcp_stackdriver_metrics sink creates custom-metric timeSeries") {
    val srv = new JsonServer
    try {
      val metrics = Seq(("requests", 41.5)).toDF("name", "value")
      CloudSinks.writeStackdriverMetrics(metrics,
        CloudSinks.StackdriverMetricsConfig("proj1", srv.url, "graft"))
      val (path, body, _) = srv.all.head
      assert(path == "/v3/projects/proj1/timeSeries")
      assert(body.contains(
        "\"type\":\"custom.googleapis.com/graft/requests\""))
      assert(body.contains("\"doubleValue\":41.5"))
    } finally srv.stop()
  }

  test("gcp_chronicle sink groups unstructured entries by log_type") {
    val srv = new JsonServer
    try {
      CloudSinks.writeChronicle(events, CloudSinks.ChronicleConfig(
        "cust-9", "TYPE_{{ app }}", srv.url, codec = "text"))
      val bodies = srv.all.map(_._2)
      assert(bodies.size == 2)
      val joined = bodies.mkString
      assert(joined.contains("\"log_type\":\"TYPE_web\""))
      assert(joined.contains("\"log_type\":\"TYPE_api\""))
      assert(joined.contains("\"entries\":[{\"log_text\":\"alpha\"}]"))
      assert(bodies.forall(_.contains("\"customer_id\":\"cust-9\"")))
    } finally srv.stop()
  }

  test("azure_monitor_logs sink signs with the SharedKey scheme") {
    val srv = new JsonServer
    val key = java.util.Base64.getEncoder.encodeToString(
      "secret-key-bytes".getBytes("UTF-8"))
    try {
      CloudSinks.writeAzureMonitor(events.coalesce(1),
        CloudSinks.AzureMonitorConfig("ws-1", key, "GraftLogs",
          endpoint = srv.url))
      val (path, body, hdrs) = srv.all.head
      assert(path == "/api/logs?api-version=2016-04-01")
      assert(hdrs("Log-Type") == "GraftLogs")
      assert(body.startsWith("[") && body.endsWith("]"))
      // recompute the signature from the recorded request and match it
      val expected = CloudSinks.azureSignature(key,
        body.getBytes("UTF-8").length, hdrs("x-ms-date"))
      assert(hdrs("Authorization") == s"SharedKey ws-1:$expected")
    } finally srv.stop()
  }

  test("azure_logs_ingestion sink posts to the DCR stream path") {
    val srv = new JsonServer
    try {
      CloudSinks.writeAzureLogsIngestion(events.coalesce(1),
        CloudSinks.AzureLogsIngestionConfig(srv.url, "dcr-abc", "Custom-G",
          token = "tok1"))
      val (path, body, hdrs) = srv.all.head
      assert(path ==
        "/dataCollectionRules/dcr-abc/streams/Custom-G?api-version=2023-01-01")
      assert(hdrs("Authorization") == "Bearer tok1")
      assert(body.startsWith("[{") && body.contains("\"app\":\"web\""))
    } finally srv.stop()
  }

  test("gcp_pubsub source pulls, decodes base64, and acknowledges") {
    val srv = new JsonServer
    val data = java.util.Base64.getEncoder.encodeToString(
      """{"n":1}""".getBytes("UTF-8"))
    srv.reply =
      s"""{"receivedMessages":[{"ackId":"ack-1","message":
         |{"data":"$data","messageId":"m1",
         |"publishTime":"2024-03-05T10:00:00Z"}}]}"""
        .stripMargin.replace("\n", "")
    try {
      val src = graft.streaming.GcpSources.pubsub(spark, "proj1", "sub1",
        srv.url)
      try {
        val q = src.df.writeStream.format("memory").queryName("psq").start()
        val deadline = System.currentTimeMillis() + 25000
        var got = Set.empty[(String, String)]
        while (got.isEmpty && System.currentTimeMillis() < deadline) {
          q.processAllAvailable()
          got = spark.sql("SELECT message_id, message FROM psq").collect()
            .map(r => (r.getString(0), r.getString(1))).toSet
        }
        assert(got.contains(("m1", """{"n":1}""")))
        // the pull went to :pull and the ack carried the ackId
        val deadline2 = System.currentTimeMillis() + 20000
        var acks = Seq.empty[String]
        while (acks.isEmpty && System.currentTimeMillis() < deadline2)
          acks = srv.all.filter(_._1.endsWith(":acknowledge")).map(_._2)
        assert(srv.all.exists(_._1 ==
          "/v1/projects/proj1/subscriptions/sub1:pull"))
        assert(acks.exists(_.contains("\"ack-1\"")))
        q.stop()
      } finally src.stop()
    } finally srv.stop()
  }
}
