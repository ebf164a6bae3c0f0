package graft

import graft.SparkSpec

/** `vector graph` / `vector validate` CLI surfaces (graph.rs,
  * validate.rs).
  */
class ToolingSpec extends SparkSpec {

  private val yaml =
    """
      |sources:
      |  in:
      |    type: parquet
      |    table: events
      |transforms:
      |  router:
      |    type: route
      |    inputs: [in]
      |    route:
      |      errors: .level == "error"
      |  up:
      |    type: remap
      |    inputs: [router.errors]
      |    source: |
      |      .msg = upcase!(.message)
      |sinks:
      |  out:
      |    type: memory
      |    inputs: [up]
      |""".stripMargin

  test("list: component inventory is sorted, distinct, and loader-backed") {
    import graft.ListComponents._
    Seq(sources, transforms, sinks, enrichmentTables).foreach { xs =>
      assert(xs == xs.sorted && xs.distinct == xs)
    }
    // spot-check membership against the YAML loader: a listed transform
    // type must NOT raise "unsupported transform type" (args may still
    // be required, but the dispatch arm exists), and an unlisted one must
    assert(transforms.contains("throttle") && sinks.contains("mqtt") &&
      sources.contains("pulsar") && enrichmentTables.contains("geoip"))
    val err = intercept[IllegalArgumentException] {
      graft.plans.ConfigLoader.load(spark,
        """
          |sources:
          |  in:
          |    type: no_such_source
          |sinks:
          |  out:
          |    type: console
          |    inputs: [in]
          |""".stripMargin, "/root/testdata/sf0.001")
    }
    assert(err.getMessage.contains("unsupported source type"))
    // the json format parses and carries all four groups
    val json = render("json")
    val parsed = graft.functions.JsonLite.parse(json)
      .asInstanceOf[java.util.Map[String, Any]]
    assert(parsed.containsKey("sources") && parsed.containsKey("sinks") &&
      parsed.containsKey("transforms") &&
      parsed.containsKey("enrichment_tables"))
  }

  test("graph: DOT output shapes components and labels port edges") {
    val dot = Graph.dot(yaml)
    assert(dot.startsWith("digraph {"))
    assert(dot.contains("""  "in" [shape="trapezium"]"""))
    assert(dot.contains("""  "router" [shape="diamond"]"""))
    assert(dot.contains("""  "out" [shape="invtrapezium"]"""))
    assert(dot.contains("""  "in" -> "router""""))
    // port-qualified input renders as an edge label (graph.rs:228-236)
    assert(dot.contains("""  "router" -> "up" [label="errors"]"""))
    assert(dot.contains("""  "up" -> "out""""))
  }

  test("graph: mermaid output uses the reference's node brackets") {
    val mm = Graph.mermaid(yaml)
    assert(mm.startsWith("flowchart TD;"))
    assert(mm.contains("  in[/in/]"))
    assert(mm.contains("  router{router}"))
    assert(mm.contains("  out[\\out\\]"))
    assert(mm.contains("  router -->|errors| up"))
  }

  test("validate: a well-formed config reports every component healthy") {
    val results = Validate.check(spark, yaml, "/root/testdata/sf0.001")
    assert(results.map(_._1) == Seq("in", "router", "up", "out"))
    assert(results.forall(_._2.isEmpty))
  }

  test("validate: a broken transform is caught at build time, not runtime") {
    // a missing FIELD is legal VRL (dynamic events: null at runtime);
    // an unknown FUNCTION is a compile error, which validate must
    // surface without executing anything
    val bad = yaml.replace("upcase!(.message)", "upcaze!(.message)")
    val results = Validate.check(spark, bad, "/root/testdata/sf0.001")
    assert(results.exists(_._2.nonEmpty))
  }

  test("validate: an unknown input edge fails") {
    val bad = yaml.replace("inputs: [up]", "inputs: [nope]")
    val results = Validate.check(spark, bad, "/root/testdata/sf0.001")
    assert(results.exists(_._2.nonEmpty))
  }

  test("tap: merged __tap sink materializes any component's output") {
    // tap the route's errors port mid-topology; the user's own sink
    // still runs untouched
    val merged = Tap.tapYaml(
      yaml.replace(""".level == "error"""", """.event_type == "error""""),
      "router.errors")
    val tmp = java.nio.file.Files.createTempDirectory("tapwork").toString
    val running = plans.ConfigLoader.run(spark, merged,
      "/root/testdata/sf0.001", tmp)
    try {
      running.processAllAvailable()
      val tapped = spark.table("__tap")
      assert(tapped.count() > 0)
      import org.apache.spark.sql.functions.col
      assert(tapped.filter(col("event_type") =!= "error").count() == 0)
      assert(spark.table("out").count() == tapped.count())
    } finally running.stopAll()
  }

  test("tap: glob patterns fan every matching component into one tap") {
    // 'rout*' matches the route transform; its default port feeds the
    // tap alongside nothing else — and a no-match pattern fails loudly
    val merged = Tap.tapYaml(yaml, "rou*")
    val tmp = java.nio.file.Files.createTempDirectory("tapglob").toString
    val running = plans.ConfigLoader.run(spark, merged,
      "/root/testdata/sf0.001", tmp)
    try {
      running.processAllAvailable()
      assert(spark.table("__tap").count() > 0)
    } finally running.stopAll()
    intercept[IllegalArgumentException] {
      Tap.tapYaml(yaml, "zz*")
    }
  }

  test("tap: duplicate-id protection still applies to the injected sink") {
    val clash = yaml.replace("  out:", "  __tap:")
    intercept[Exception] { Tap.tapYaml(clash, "up") }
  }

  test("generate: expression scaffolds a config that validates clean") {
    val cfg = Generate.generate("demo_logs/remap,filter/blackhole")
    val results = Validate.check(spark, cfg, "/root/testdata/sf0.001")
    assert(results.map(_._1) ==
      Seq("source1", "transform1", "transform2", "sink1"))
    assert(results.forall(_._2.isEmpty))
  }

  test("reload: graph-diff restarts only the changed pipeline") {
    // two independent file-tail pipelines; editing pipeline A's remap
    // must restart A's query only — B's StreamingQuery instance keeps
    // running untouched and still processes appended data
    val dirA = java.nio.file.Files.createTempDirectory("rlA")
    val dirB = java.nio.file.Files.createTempDirectory("rlB")
    java.nio.file.Files.write(dirA.resolve("a.log"), "one\n".getBytes("UTF-8"))
    java.nio.file.Files.write(dirB.resolve("b.log"), "x\n".getBytes("UTF-8"))
    def configWith(transformA: String) =
      s"""
        |sources:
        |  srcA:
        |    type: file
        |    path: $dirA
        |  srcB:
        |    type: file
        |    path: $dirB
        |transforms:
        |  upA:
        |    type: remap
        |    inputs: [srcA]
        |    source: |
        |      $transformA
        |  upB:
        |    type: remap
        |    inputs: [srcB]
        |    source: |
        |      .msg = downcase!(.message)
        |sinks:
        |  rl_outA:
        |    type: memory
        |    inputs: [upA]
        |  rl_outB:
        |    type: memory
        |    inputs: [upB]
        |""".stripMargin
    val yaml1 = configWith(".msg = upcase!(.message)")
    val yaml2 = configWith(""".msg = "edited-" + .message""")
    // the diff itself: only A's chain restarts, nothing is removed
    val (restart, removed) = plans.ConfigLoader.diffConfigs(yaml1, yaml2)
    assert(restart == Set("rl_outA"))
    assert(removed.isEmpty)
    val tmp = java.nio.file.Files.createTempDirectory("rlwork").toString
    var running = plans.ConfigLoader.run(spark, yaml1,
      "/root/testdata/sf0.001", tmp)
    try {
      running.processAllAvailable()
      assert(spark.table("rl_outA").collect()
        .map(_.getAs[String]("msg")).toSet == Set("ONE"))
      val qB = running.queries("rl_outB")
      running = plans.ConfigLoader.reload(spark, running, yaml1, yaml2,
        "/root/testdata/sf0.001", tmp)
      // B: the SAME query instance, never stopped
      assert(running.queries("rl_outB") eq qB)
      assert(qB.isActive)
      running.processAllAvailable()
      // A: new behavior (restarted subgraph re-tails the file)
      assert(spark.table("rl_outA").collect()
        .map(_.getAs[String]("msg")).toSet == Set("edited-one"))
      // B still ingests appended data through the untouched query
      java.nio.file.Files.write(dirB.resolve("b.log"),
        "y\n".getBytes("UTF-8"), java.nio.file.StandardOpenOption.APPEND)
      running.processAllAvailable()
      assert(spark.table("rl_outB").collect()
        .map(_.getAs[String]("msg")).toSet == Set("x", "y"))
    } finally running.stopAll()
  }

  test("reload: a bad config cannot kill the topology — dryValidate " +
      "rejects before stopping; a mid-swap build failure rolls back") {
    val dir = java.nio.file.Files.createTempDirectory("rlbad")
    java.nio.file.Files.write(dir.resolve("a.log"),
      "one\n".getBytes("UTF-8"))
    def cfg(remapSource: String) =
      s"""
        |sources:
        |  src:
        |    type: file
        |    path: $dir
        |transforms:
        |  up:
        |    type: remap
        |    inputs: [src]
        |    source: |
        |      .msg = $remapSource
        |sinks:
        |  rb_out:
        |    type: memory
        |    inputs: [up]
        |""".stripMargin
    val good = cfg("upcase!(.message)")
    val tmp = java.nio.file.Files.createTempDirectory("rlbadwork").toString
    var running = plans.ConfigLoader.run(spark, good,
      "/root/testdata/sf0.001", tmp)
    try {
      running.processAllAvailable()
      assert(spark.table("rb_out").collect()
        .map(_.getAs[String]("msg")).toSet == Set("ONE"))
      val q0 = running.queries("rb_out")

      // 1. VRL that doesn't PARSE: dryValidate rejects the reload
      //    before anything is stopped — the original query instance
      //    must still be the active one
      val unparsable = cfg("upcase!(.message") // unbalanced paren
      val e1 = intercept[Exception] {
        plans.ConfigLoader.reload(spark, running, good, unparsable,
          "/root/testdata/sf0.001", tmp)
      }
      assert(!e1.isInstanceOf[plans.ConfigLoader.ReloadFailedException],
        s"dryValidate should reject pre-stop, got rollback: $e1")
      assert(q0.isActive && (running.queries("rb_out") eq q0))

      // an unknown transform type is also a pre-stop rejection
      val e1b = intercept[IllegalArgumentException] {
        plans.ConfigLoader.reload(spark, running, good,
          good.replace("type: remap", "type: remop"),
          "/root/testdata/sf0.001", tmp)
      }
      assert(e1b.getMessage.contains("unknown type") && q0.isActive)

      // 2. VRL that parses but fails to COMPILE (unknown function):
      //    build fails after the old subgraph stopped → reload rolls
      //    the old subgraph back and reports the restored handles
      val uncompilable = cfg("definitely_not_a_function!(.message)")
      val e2 = intercept[plans.ConfigLoader.ReloadFailedException] {
        plans.ConfigLoader.reload(spark, running, good, uncompilable,
          "/root/testdata/sf0.001", tmp)
      }
      running = e2.restored
      assert(running.queries.contains("rb_out") &&
        running.queries("rb_out").isActive)
      // the restored subgraph still ingests with the OLD behavior
      java.nio.file.Files.write(dir.resolve("a.log"),
        "two\n".getBytes("UTF-8"), java.nio.file.StandardOpenOption.APPEND)
      running.processAllAvailable()
      assert(spark.table("rb_out").collect()
        .map(_.getAs[String]("msg")).toSet == Set("ONE", "TWO"))
    } finally running.stopAll()
  }

  test("reload: a mid-swap START failure stops the already-started " +
      "fresh queries — no orphans") {
    // the residual class AFTER dryValidate/load: everything builds, the
    // FIRST new sink's query starts, then the SECOND new sink fails at
    // start time (port already bound). The partially-started subgraph
    // must be torn down — a leaked untracked StreamingQuery is the bug.
    val blocker = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getByName("127.0.0.1"))
    val busyPort = blocker.getLocalPort
    val dir = java.nio.file.Files.createTempDirectory("rlleak")
    java.nio.file.Files.write(dir.resolve("a.log"),
      "one\n".getBytes("UTF-8"))
    val base =
      s"""
        |sources:
        |  src:
        |    type: file
        |    path: $dir
        |transforms:
        |  up:
        |    type: remap
        |    inputs: [src]
        |    source: |
        |      .msg = upcase!(.message)
        |sinks:
        |  rl_keep:
        |    type: memory
        |    inputs: [up]
        |""".stripMargin
    // two ADDED sinks: rl_aux (memory — starts fine, yaml-first) then
    // rl_exp (prometheus_exporter on the occupied port — bind fails)
    val withNew = base +
      s"""|  rl_aux:
          |    type: memory
          |    inputs: [up]
          |  rl_exp:
          |    type: prometheus_exporter
          |    inputs: [up]
          |    address: 127.0.0.1:$busyPort
          |""".stripMargin
    val tmp = java.nio.file.Files.createTempDirectory("rlleakwork").toString
    var running = plans.ConfigLoader.run(spark, base,
      "/root/testdata/sf0.001", tmp)
    try {
      running.processAllAvailable()
      val preActive = spark.streams.active.map(_.name).toSet
      val e = intercept[plans.ConfigLoader.ReloadFailedException] {
        plans.ConfigLoader.reload(spark, running, base, withNew,
          "/root/testdata/sf0.001", tmp)
      }
      running = e.restored
      val postActive = spark.streams.active.map(_.name).toSet
      assert(!postActive.contains("rl_aux"),
        "the started-then-abandoned fresh query leaked")
      assert(postActive == preActive,
        s"active set changed across failed reload: $preActive -> $postActive")
      // the untouched old sink is still live and ingesting
      assert(running.queries("rl_keep").isActive)
      java.nio.file.Files.write(dir.resolve("a.log"),
        "two\n".getBytes("UTF-8"), java.nio.file.StandardOpenOption.APPEND)
      running.processAllAvailable()
      assert(spark.table("rl_keep").collect()
        .map(_.getAs[String]("msg")).toSet == Set("ONE", "TWO"))
    } finally {
      running.stopAll()
      blocker.close()
    }
  }

  test("api: health + components endpoints serve the live topology") {
    val dir = java.nio.file.Files.createTempDirectory("apisrc")
    java.nio.file.Files.write(dir.resolve("a.log"),
      "one\ntwo\nthree\n".getBytes("UTF-8"))
    val tmp = java.nio.file.Files.createTempDirectory("apiwork").toString
    val running = plans.ConfigLoader.run(spark,
      s"""
        |api:
        |  enabled: true
        |  address: 127.0.0.1:0
        |sources:
        |  logs:
        |    type: file
        |    path: $dir
        |transforms:
        |  up:
        |    type: remap
        |    inputs: [logs]
        |    source: |
        |      .msg = upcase!(.message)
        |sinks:
        |  api_out:
        |    type: memory
        |    inputs: [up]
        |""".stripMargin, "/root/testdata/sf0.001", tmp)
    try {
      running.processAllAvailable()
      val port = plans.ConfigLoader.lastApiPort
      def get(path: String): String = {
        val c = new java.net.URL(s"http://127.0.0.1:$port$path")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        try new String(c.getInputStream.readAllBytes(), "UTF-8")
        finally c.disconnect()
      }
      assert(get("/health") == """{"ok":true}""")
      // the sink's sent counter reflects the processed rows; under a
      // loaded suite run the file source may need another discovery
      // cycle before the first batch lands, so poll up to 30s
      val sent = """"componentId":"api_out"[^}]*"sentEventsTotal":(\d+)""".r
      val deadline = System.currentTimeMillis() + 30000
      var comps = get("/api/components")
      var n = sent.findFirstMatchIn(comps).map(_.group(1).toLong)
      while (!n.exists(_ >= 3L) && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        running.processAllAvailable()
        comps = get("/api/components")
        n = sent.findFirstMatchIn(comps).map(_.group(1).toLong)
      }
      assert(comps.contains(""""componentId":"logs""""))
      assert(comps.contains(""""componentKind":"transform""""))
      assert(comps.contains(""""componentId":"api_out""""))
      assert(n.exists(_ >= 3L), s"api_out totals missing in $comps")
      // graphql-shaped health + components queries answer
      def post(body: String): String = {
        val c = new java.net.URL(s"http://127.0.0.1:$port/graphql")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        c.setRequestMethod("POST")
        c.setDoOutput(true)
        c.getOutputStream.write(body.getBytes("UTF-8"))
        c.getOutputStream.close()
        try new String(c.getInputStream.readAllBytes(), "UTF-8")
        finally c.disconnect()
      }
      assert(post("""{"query":"{ health }"}""") ==
        """{"data":{"health":true}}""")
      assert(post("""{"query":"{ components { nodes { componentId } } }"}""")
        .contains(""""componentId":"up""""))
      // `vector top --url` consumes the same endpoint
      val top = Top.fetchComponents(s"http://127.0.0.1:$port")
      assert(top.map(_._1).toSet == Set("logs", "up", "api_out"))
      assert(top.find(_._1 == "api_out").exists(_._5 >= 3L))
      // a reload with api: enabled must NOT try to bind a second API
      // server on the same port (renderPartial drops the api global) —
      // the original endpoint keeps serving
      val yamlApi =
        s"""
          |api:
          |  enabled: true
          |  address: 127.0.0.1:$port
          |sources:
          |  logs:
          |    type: file
          |    path: $dir
          |transforms:
          |  up:
          |    type: remap
          |    inputs: [logs]
          |    source: |
          |      .msg = upcase!(.message)
          |sinks:
          |  api_out:
          |    type: memory
          |    inputs: [up]
          |""".stripMargin
      val edited = yamlApi.replace("upcase!(.message)",
        "downcase!(.message)")
      val running2 = plans.ConfigLoader.reload(spark, running, yamlApi,
        edited, "/root/testdata/sf0.001", tmp)
      try {
        running2.processAllAvailable()
        assert(get("/health") == """{"ok":true}""")
        eventuallyMs() {
          running2.processAllAvailable()
          assert(spark.table("api_out").collect()
            .map(_.getAs[String]("msg")).toSet == Set("one", "two", "three"))
        }
      } finally running2.stopAll()
      // running2 superseded `running`; the outer stopAll is a harmless
      // double-stop on the already-stopped merged components
    } finally running.stopAll()
  }

  private def eventuallyMs[T](deadlineMs: Long = 30000)(f: => T): T = {
    val end = System.nanoTime + deadlineMs * 1000000L
    var last: Throwable = null
    while (System.nanoTime < end) {
      try return f
      catch { case t: Throwable => last = t; Thread.sleep(100) }
    }
    throw last
  }

  test("reload: a restarted subgraph's listener frees and rebinds its port") {
    // pick a fixed free port — the reload must stop the OLD syslog
    // listener (tagged closer) before the rebuilt source binds it again.
    // SO_REUSEADDR-style probe race under parallel suites: hold the
    // probe until just before use and retry if another suite grabs it
    def freePort(): Int = {
      val probe = new java.net.ServerSocket(0)
      try probe.getLocalPort finally probe.close()
    }
    var port = freePort()
    def cfg(suffix: String) =
      s"""
        |sources:
        |  sys:
        |    type: syslog
        |    mode: tcp
        |    address: 127.0.0.1:$port
        |transforms:
        |  up:
        |    type: remap
        |    inputs: [sys]
        |    source: |
        |      .tag = "$suffix"
        |sinks:
        |  rl_port_tap:
        |    type: memory
        |    inputs: [up]
        |""".stripMargin
    val tmp = java.nio.file.Files.createTempDirectory("rlport").toString
    var running: plans.ConfigLoader.RunningConfig = null
    var attempts = 0
    while (running == null) {
      attempts += 1
      try running = plans.ConfigLoader.run(spark, cfg("v1"),
        "/root/testdata/sf0.001", tmp)
      catch {
        // another parallel suite won the probe-close-bind race — pick
        // a fresh port and retry
        case _: java.net.BindException if attempts < 5 =>
          plans.ConfigLoader.closePendingSources()
          port = freePort()
      }
    }
    def send(msg: String): Unit = {
      val sock = new java.net.Socket("127.0.0.1", port)
      sock.getOutputStream.write(
        s"<34>1 2024-01-01T00:00:00Z h app - - - $msg\n".getBytes("UTF-8"))
      sock.getOutputStream.flush()
      sock.close()
    }
    def eventually[T](f: => T): T = {
      val end = System.nanoTime + 30000L * 1000000L
      var last: Throwable = null
      while (System.nanoTime < end) {
        try return f
        catch { case t: Throwable => last = t; Thread.sleep(100) }
      }
      throw last
    }
    try {
      send("first")
      eventually {
        running.processAllAvailable()
        assert(spark.table("rl_port_tap").collect()
          .map(r => r.getAs[String]("message") -> r.getAs[String]("tag"))
          .toSet == Set("first" -> "v1"))
      }
      running = plans.ConfigLoader.reload(spark, running, cfg("v1"),
        cfg("v2"), "/root/testdata/sf0.001", tmp)
      // the rebuilt listener owns the SAME port; new events carry the
      // edited transform's tag
      send("second")
      eventually {
        running.processAllAvailable()
        val got = spark.table("rl_port_tap").collect()
          .map(r => r.getAs[String]("message") -> r.getAs[String]("tag"))
          .toSet
        assert(got.contains("second" -> "v2"), got.toString)
      }
    } finally running.stopAll()
  }

  test("reload: removed sinks stop; global change restarts everything") {
    val y1 =
      """
        |timezone: UTC
        |sources:
        |  in: {type: parquet, table: events}
        |sinks:
        |  s1: {type: memory, inputs: [in]}
        |  s2: {type: memory, inputs: [in]}
        |""".stripMargin
    val yRemoved = y1.replace("  s2: {type: memory, inputs: [in]}\n", "")
    val (r1, gone) = plans.ConfigLoader.diffConfigs(y1, yRemoved)
    assert(gone == Set("s2") && r1.isEmpty)
    val yGlobal = y1.replace("timezone: UTC", "timezone: America/New_York")
    val (r2, _) = plans.ConfigLoader.diffConfigs(y1, yGlobal)
    assert(r2 == Set("s1", "s2"))
    // shared-upstream expansion: editing s1's private transform chain
    // does not touch s2 unless they share a component — here they share
    // the source, so a source edit restarts both
    val ySrc = y1.replace("table: events", "table: orders")
    val (r3, _) = plans.ConfigLoader.diffConfigs(y1, ySrc)
    assert(r3 == Set("s1", "s2"))
  }

  test("healthchecks: live endpoints pass, dead ones fail, opt-out skips") {
    val live = new java.net.ServerSocket(0,
      1, java.net.InetAddress.getByName("127.0.0.1"))
    val deadPort = { // a port with nothing listening
      val p = new java.net.ServerSocket(0)
      val n = p.getLocalPort; p.close(); n
    }
    try {
      val results = plans.ConfigLoader.healthchecks(
        s"""
          |sinks:
          |  ok_sock:
          |    type: socket
          |    inputs: [in]
          |    address: 127.0.0.1:${live.getLocalPort}
          |  dead_http:
          |    type: http
          |    inputs: [in]
          |    uri: http://127.0.0.1:$deadPort/ingest
          |  dead_but_skipped:
          |    type: socket
          |    inputs: [in]
          |    address: 127.0.0.1:$deadPort
          |    healthcheck: false
          |  no_endpoint:
          |    type: console
          |    inputs: [in]
          |""".stripMargin).toMap
      assert(results("ok_sock").isRight)
      assert(results("dead_http").isLeft)
      assert(results("dead_but_skipped").isRight)
      assert(results("no_endpoint").isRight)
    } finally live.close()
  }

  test("generate: named prefixes, omitted dividers, fan-in wiring") {
    val cfg = Generate.generate("foo:demo_logs,bar:socket//baz:console")
    assert(cfg.contains("  foo:"))
    assert(cfg.contains("  bar:"))
    // no transforms: the sink consumes every source
    assert(cfg.contains("inputs: [foo, bar]"))
    val frag = Generate.generate("/filter", fragment = true)
    assert(!frag.contains("data_dir"))
    assert(frag.contains("type: filter"))
  }
}
