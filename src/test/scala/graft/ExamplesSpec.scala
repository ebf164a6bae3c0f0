package graft

import graft.SparkSpec

/** Every config under examples/ must validate clean against the real
  * loader — placeholder endpoints stay (nothing connects at build), but
  * TLS cert paths and privileged/fixed ports are swapped for live test
  * fixtures so source construction succeeds.
  */
class ExamplesSpec extends SparkSpec {

  private def tlsRes(n: String): String =
    java.nio.file.Paths.get(getClass.getResource(s"/tls/$n").toURI).toString

  private def exampleText(name: String): String = {
    val p = java.nio.file.Paths.get("examples", name)
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .replace("/etc/graft/tls/server.crt", tlsRes("server.crt"))
      .replace("/etc/graft/tls/server.key", tlsRes("server.key"))
      .replace("0.0.0.0:6514", "127.0.0.1:0")
      .replace("0.0.0.0:9598", "127.0.0.1:0")
      .replace("127.0.0.1:8686", "127.0.0.1:0")
      .replace("path: /var/log/app",
        "path: " + java.nio.file.Files.createTempDirectory("exlogs"))
      .replace("/var/lib/graft/",
        java.nio.file.Files.createTempDirectory("exout").toString + "/")
      // the Spark-Kafka connector jar is not shipped in this sandbox's
      // /opt/spark/jars — validate the same topology (decoding block
      // included) over the socket byte-stream source instead
      .replace("type: kafka", "type: socket")
      .replace("bootstrap_servers: kafka.internal:9092",
        "address: 127.0.0.1:9")
      .replace("address: 0.0.0.0:8080", "address: 127.0.0.1:0")
      .replace("address: 0.0.0.0:6000", "address: 127.0.0.1:0")
  }

  private val examples = Seq("tail_to_loki.yaml",
    "syslog_tls_to_elasticsearch.yaml", "kafka_gelf_to_s3.yaml",
    "protobuf_varint_to_clickhouse.yaml", "llm_curation.yaml",
    "grpc_aggregator.yaml", "join_enrich_orders.yaml")

  examples.foreach { name =>
    test(s"examples/$name validates clean") {
      try {
        val results = Validate.check(spark, exampleText(name),
          "/root/testdata/sf0.001")
        assert(results.nonEmpty)
        assert(results.forall(_._2.isEmpty),
          results.filter(_._2.nonEmpty).toString)
      } finally plans.ConfigLoader.closePendingSources()
    }
  }

  test("examples/remote_config_bootstrap.yaml: provider fetch validates") {
    // the bootstrap file itself holds no topology — parse the provider
    // block, serve a minimal topology from an in-test endpoint, and
    // validate the FETCHED document like the Run path would
    val boot = exampleText("remote_config_bootstrap.yaml")
    val parsed = plans.HttpProvider.parse(boot).get
    assert(parsed.configFormat == "yaml" && parsed.interpolateEnv &&
      parsed.headers.keySet == Set("Authorization"))
    val served =
      """
        |sources:
        |  in:
        |    type: demo_logs
        |    count: 5
        |sinks:
        |  out:
        |    type: console
        |    inputs: [in]
        |""".stripMargin
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", ex => {
      val b = served.getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    })
    server.start()
    try {
      val cfg = parsed.copy(url =
        s"http://127.0.0.1:${server.getAddress.getPort}/topology.yaml")
      val fetched = plans.HttpProvider.fetch(cfg)
      val results = Validate.check(spark, fetched, "/root/testdata/sf0.001")
      assert(results.nonEmpty && results.forall(_._2.isEmpty), results)
    } finally {
      server.stop(0)
      plans.ConfigLoader.closePendingSources()
    }
  }

  test("examples index lists every file present") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("examples", "README.md")), "UTF-8")
    val yamls = java.nio.file.Files.list(
        java.nio.file.Paths.get("examples")).toArray
      .map(_.toString.split("/").last).filter(_.endsWith(".yaml"))
    yamls.foreach(y => assert(readme.contains(y), s"$y missing from README"))
    assert(yamls.toSet ==
      (examples :+ "remote_config_bootstrap.yaml").toSet)
  }
}
