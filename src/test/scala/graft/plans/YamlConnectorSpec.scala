package graft.plans

import graft.SparkSpec

/** End-to-end YAML configs driving the round-8 HTTP connector families
  * against capturing local endpoints — proves the loader wiring (field
  * names, defaults, endpoint override) matches the sink/source specs.
  */
class YamlConnectorSpec extends SparkSpec {

  private class CapServer {
    val reqs = new java.util.concurrent.CopyOnWriteArrayList[
      (String, String, Map[String, String])]()
    // raw copies for binary (protobuf) bodies, same order as reqs
    val rawBodies = new java.util.concurrent.CopyOnWriteArrayList[
      Array[Byte]]()
    @volatile var reply = "{}"
    /** serve `reply` once for this X-Amz-Target, then "{}" — lets a
      * poll-loop source drain instead of re-receiving forever */
    @volatile var onceFor: Option[String] = None
    private val served = new java.util.concurrent.atomic.AtomicBoolean(false)
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    server.createContext("/", { ex =>
      val raw = ex.getRequestBody.readAllBytes()
      rawBodies.add(raw)
      val body = new String(raw, "UTF-8")
      val hdrs = Seq("DD-API-KEY", "X-Amz-Target", "Api-Key",
        "Authorization")
        .flatMap(h => Option(ex.getRequestHeaders.getFirst(h)).map(h -> _))
        .toMap
      reqs.add((ex.getRequestURI.toString, body, hdrs))
      val r = onceFor match {
        case Some(target) if hdrs.get("X-Amz-Target").contains(target) =>
          if (served.compareAndSet(false, true)) reply else "{}"
        case Some(_) => "{}"
        case None => reply
      }
      val out = r.getBytes("UTF-8")
      ex.sendResponseHeaders(200, out.length)
      ex.getResponseBody.write(out); ex.close()
    })
    server.start()
    def url: String = s"http://localhost:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
    def all: Seq[(String, String, Map[String, String])] =
      reqs.toArray.map(_.asInstanceOf[(String, String, Map[String, String])]).toSeq
  }

  test("yaml: log_to_metric → datadog_metrics sink posts v2 series") {
    val srv = new CapServer
    val tmp = java.nio.file.Files.createTempDirectory("ddmwork").toString
    try {
      ConfigLoader.run(spark,
        s"""
          |sources:
          |  in:
          |    type: parquet
          |    table: events
          |transforms:
          |  tometric:
          |    type: log_to_metric
          |    inputs: [in]
          |    metrics:
          |      - type: counter
          |        name: events_total
          |        tags:
          |          etype: "{{ event_type }}"
          |sinks:
          |  dd:
          |    type: datadog_metrics
          |    inputs: [tometric]
          |    endpoint: ${srv.url}
          |    default_api_key: key-yaml
          |""".stripMargin,
        "/root/testdata/sf0.001", tmp)
      val posts = srv.all
      assert(posts.nonEmpty)
      assert(posts.forall(_._1 == "/api/v2/series"))
      assert(posts.head._3("DD-API-KEY") == "key-yaml")
      // v2 series are protobuf MetricPayload now — decode the wire
      // bytes with the datadog_agent source's own decode leg
      val decoded = (0 until srv.rawBodies.size()).flatMap(i =>
        graft.streaming.DdAgentIntake.decodeSeriesV2(srv.rawBodies.get(i)))
      assert(decoded.nonEmpty)
      assert(decoded.forall(m =>
        m.namespace == null && m.name == "events_total"))
      assert(decoded.forall(m => m.value_type == "counter"
        && m.kind == "incremental")) // COUNT → incremental counter
      assert(decoded.flatMap(_.tags.keys).toSet.contains("etype"))
    } finally srv.stop()
  }

  test("yaml: aws_sqs source feeds an aws_cloudwatch_logs sink") {
    val srv = new CapServer
    srv.reply =
      """{"Messages":[{"Body":"from-sqs","ReceiptHandle":"r1"}]}"""
    srv.onceFor = Some("AmazonSQS.ReceiveMessage")
    val tmp = java.nio.file.Files.createTempDirectory("sqswork").toString
    val running = ConfigLoader.run(spark,
      s"""
        |sources:
        |  q:
        |    type: aws_sqs
        |    queue_url: https://sqs.local/1/q
        |    endpoint: ${srv.url}
        |    poll_secs: 1
        |sinks:
        |  cw:
        |    type: aws_cloudwatch_logs
        |    inputs: [q]
        |    endpoint: ${srv.url}
        |    group_name: g1
        |    stream_name: s1
        |    encoding:
        |      codec: text
        |""".stripMargin,
      "/root/testdata/sf0.001", tmp)
    try {
      // generous: under a fully loaded suite run the first microbatch of
      // a rate-limited poll source can take >8s to even schedule
      val deadline = System.currentTimeMillis() + 30000
      var hit = false
      while (!hit && System.currentTimeMillis() < deadline) {
        Thread.sleep(100)
        running.processAllAvailable()
        hit = srv.all.exists { case (_, body, hdrs) =>
          hdrs.get("X-Amz-Target").contains("Logs_20140328.PutLogEvents") &&
            body.contains("\"logGroupName\":\"g1\"") &&
            body.contains("from-sqs")
        }
      }
      assert(hit)
      // the source long-poll + delete also went through the same endpoint
      assert(srv.all.exists(_._3.get("X-Amz-Target")
        .contains("AmazonSQS.ReceiveMessage")))
    } finally running.stopAll()
  }
}
