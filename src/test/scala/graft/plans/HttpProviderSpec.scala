package graft.plans

import graft.SparkSpec

/** `provider: {type: http}` — fetch the topology from an HTTP endpoint
  * and re-poll it for changes (reference: src/providers/http.rs).
  */
class HttpProviderSpec extends SparkSpec {

  private def serve(body: () => (Int, String, String)) = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val seen = new java.util.concurrent.ConcurrentHashMap[String, String]()
    server.createContext("/config", ex => {
      ex.getRequestHeaders.forEach((k, v) =>
        seen.put(k.toLowerCase, v.get(0)))
      val (code, ct, text) = body()
      val bytes = text.getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type", ct)
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    (server, server.getAddress.getPort, seen)
  }

  test("parse: block fields, defaults, and reference error messages") {
    val cfg = HttpProvider.parse(
      """
        |provider:
        |  type: http
        |  url: http://127.0.0.1:9/config
        |  request:
        |    headers:
        |      Authorization: Bearer tok
        |  poll_interval_secs: 5
        |  config_format: yaml
        |  interpolate_env: true
        |""".stripMargin).get
    assert(cfg.url == "http://127.0.0.1:9/config")
    assert(cfg.headers == Map("Authorization" -> "Bearer tok"))
    assert(cfg.pollIntervalSecs == 5)
    assert(cfg.configFormat == "yaml")
    assert(cfg.interpolateEnv)

    // defaults: poll 30s, toml format (config/format.rs #[default]),
    // no env interpolation
    val d = HttpProvider.parse(
      "provider:\n  type: http\n  url: http://h/c\n").get
    assert(d.pollIntervalSecs == 30 && d.configFormat == "toml" &&
      !d.interpolateEnv && d.headers.isEmpty)

    assert(HttpProvider.parse("sources: {}\n").isEmpty)
    val noUrl = intercept[IllegalArgumentException] {
      HttpProvider.parse("provider:\n  type: http\n")
    }
    assert(noUrl.getMessage.contains(
      "URL is required for the `http` provider."))
    intercept[IllegalArgumentException] {
      HttpProvider.parse("provider:\n  type: s3\n  url: http://h/c\n")
    }
  }

  test("fetch: headers sent, toml default converts, env interpolation," +
      " non-2xx throws") {
    @volatile var payload = (200, "application/toml",
      "[sources.a]\ntype = \"demo_logs\"\ncount = 3\n")
    val (server, port, seen) = serve(() => payload)
    try {
      val cfg = HttpProvider.parse(
        s"""
          |provider:
          |  type: http
          |  url: http://127.0.0.1:$port/config
          |  request:
          |    headers:
          |      X-Auth: tok-77
          |""".stripMargin).get
      val yaml = HttpProvider.fetch(cfg)
      assert(seen.get("x-auth") == "tok-77")
      val conf = ConfigLoader.parseYaml(yaml)
      val src = conf("sources").asInstanceOf[java.util.Map[_, _]]
        .get("a").asInstanceOf[java.util.Map[_, _]]
      assert(src.get("type") == "demo_logs" && src.get("count") == 3)

      // interpolate_env defers to the loader's single unconditional
      // pass (fetch itself never substitutes — doing both would
      // interpolate twice and collapse $$ escapes):
      // flag on → body passes through, load's pass substitutes ONCE
      payload = (200, "application/yaml",
        "sources:\n  a:\n    type: ${GRAFT_NOPE_VAR:-demo_logs}\n")
      val envCfg = cfg.copy(configFormat = "yaml", interpolateEnv = true)
      val fetchedOn = HttpProvider.fetch(envCfg)
      assert(fetchedOn.contains("${GRAFT_NOPE_VAR:-demo_logs}"))
      assert(ConfigLoader.interpolateEnv(fetchedOn)
        .contains("type: demo_logs"))
      // flag off → fetch escapes $ → $$ so the loader's pass restores
      // the document byte-identically (a bare ${VAR} stays literal
      // instead of being substituted or fatal — providers/http.rs
      // hands config::load the untouched text)
      val fetchedOff = HttpProvider.fetch(envCfg.copy(interpolateEnv = false))
      assert(ConfigLoader.interpolateEnv(fetchedOff)
        .contains("${GRAFT_NOPE_VAR:-demo_logs}"))

      payload = (503, "text/plain", "down")
      intercept[java.io.IOException] { HttpProvider.fetch(cfg) }
    } finally server.stop(0)
  }

  test("end-to-end: fetched topology runs; a poll-tick change feeds the" +
      " graph-diff reload") {
    val dir = java.nio.file.Files.createTempDirectory("hpsrc")
    java.nio.file.Files.write(dir.resolve("a.log"),
      "one\n".getBytes("UTF-8"))
    def topo(vrl: String) =
      s"""
        |sources:
        |  hp_src:
        |    type: file
        |    include: ["$dir/*.log"]
        |transforms:
        |  hp_up:
        |    type: remap
        |    inputs: [hp_src]
        |    source: |
        |      .msg = $vrl
        |sinks:
        |  hp_out:
        |    type: memory
        |    inputs: [hp_up]
        |""".stripMargin
    @volatile var payload = (200, "application/yaml",
      topo("upcase!(.message)"))
    val (server, port, _) = serve(() => payload)
    val tmp = java.nio.file.Files.createTempDirectory("hpwork").toString
    try {
      val cfg = HttpProvider.parse(
        s"""
          |provider:
          |  type: http
          |  url: http://127.0.0.1:$port/config
          |  config_format: yaml
          |  poll_interval_secs: 1
          |""".stripMargin).get
      // initial build: fetch is mandatory (errors would abort startup)
      val yaml1 = HttpProvider.fetch(cfg)
      var running = ConfigLoader.run(spark, yaml1,
        "/root/testdata/sf0.001", tmp)
      try {
        running.processAllAvailable()
        assert(spark.table("hp_out").collect()
          .map(_.getAs[String]("msg")).toSet == Set("ONE"))
        // the endpoint now serves an edited topology; the next poll
        // tick fetches it and reloads only the changed subgraph
        payload = (200, "application/yaml",
          topo("\"polled-\" + .message"))
        val yaml2 = HttpProvider.fetch(cfg)
        assert(yaml2 != yaml1)
        running = ConfigLoader.reload(spark, running, yaml1, yaml2,
          "/root/testdata/sf0.001", tmp)
        running.processAllAvailable()
        assert(spark.table("hp_out").collect()
          .map(_.getAs[String]("msg")).toSet == Set("polled-one"))
        // a failed tick is skipped — the running topology is untouched
        payload = (500, "text/plain", "flaky")
        intercept[java.io.IOException] { HttpProvider.fetch(cfg) }
        assert(running.queries("hp_out").isActive)
      } finally running.stopAll()
    } finally server.stop(0)
  }
}
