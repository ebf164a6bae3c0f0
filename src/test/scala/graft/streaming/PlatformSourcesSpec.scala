package graft.streaming

import graft.SparkSpec

/** Platform log sources: journald via a stub journalctl script (json
  * output + cursor resume), docker_logs against a mini Engine-API
  * server with multiplexed log streams, kubernetes_logs over a CRI
  * pod-log tree, okta with SSWS auth + Link pagination.
  */
class PlatformSourcesSpec extends SparkSpec {

  private def drain[T: scala.reflect.ClassTag](
      q: org.apache.spark.sql.streaming.StreamingQuery,
      want: Int, sql: String)(
      row: org.apache.spark.sql.Row => T): Set[T] = {
    val deadline = System.currentTimeMillis() + 30000
    var got = Set.empty[T]
    while (got.size < want && System.currentTimeMillis() < deadline) {
      q.processAllAvailable()
      got = spark.sql(sql).collect().map(row).toSet
    }
    got
  }

  test("journald source: stub journalctl json lines, unit filter, cursor") {
    val dir = java.nio.file.Files.createTempDirectory("journald")
    val script = dir.resolve("journalctl")
    // the stub prints two entries then a trailing cursor line; a resumed
    // run (--after-cursor) prints a third entry only
    java.nio.file.Files.write(script,
      ("""#!/bin/bash
         |if [[ "$*" == *"--after-cursor=c2"* ]]; then
         |  echo '{"MESSAGE":"resumed","_SYSTEMD_UNIT":"app.service","__REALTIME_TIMESTAMP":"1709632802000000","__CURSOR":"c3"}'
         |else
         |  echo '{"MESSAGE":"hello","_SYSTEMD_UNIT":"app.service","__REALTIME_TIMESTAMP":"1709632800000000","__CURSOR":"c1"}'
         |  echo '{"MESSAGE":"noise","_SYSTEMD_UNIT":"spam.service","__REALTIME_TIMESTAMP":"1709632801000000","__CURSOR":"c2"}'
         |  echo '-- cursor: c2'
         |fi
         |sleep 600
         |""").stripMargin.getBytes("UTF-8"))
    script.toFile.setExecutable(true)
    val ckpt = dir.resolve("cursor").toString
    val src = PlatformSources.journald(spark, script.toString,
      excludeUnits = Set("spam.service"), checkpointPath = Some(ckpt))
    try {
      val q = src.df.writeStream.format("memory").queryName("jdq").start()
      val got = drain(q, 1, "SELECT message, unit, cursor FROM jdq")(r =>
        (r.getString(0), r.getString(1), r.getString(2)))
      assert(got == Set(("hello", "app.service", "c1")))
      q.stop()
    } finally src.stop()
    // cursor checkpoint persisted (the trailing "-- cursor:" line wins)
    val saved = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(ckpt)), "UTF-8").trim
    assert(saved == "c2")
    // resume: a fresh source must pass --after-cursor=c2 to the stub
    val src2 = PlatformSources.journald(spark, script.toString,
      checkpointPath = Some(ckpt))
    try {
      val q2 = src2.df.writeStream.format("memory").queryName("jdq2").start()
      val got2 = drain(q2, 1, "SELECT message FROM jdq2")(_.getString(0))
      assert(got2 == Set("resumed"))
      q2.stop()
    } finally src2.stop()
  }

  test("docker_logs source: discovery + multiplexed follow stream") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    server.createContext("/containers/json", { ex =>
      val out =
        """[{"Id":"abc123","Names":["/web-1"],"Image":"nginx:1"},
          |{"Id":"def456","Names":["/skip-me"],"Image":"redis:7"}]"""
          .stripMargin.replace("\n", "").getBytes("UTF-8")
      ex.sendResponseHeaders(200, out.length)
      ex.getResponseBody.write(out); ex.close()
    })
    server.createContext("/containers/abc123/logs", { ex =>
      // two multiplexed frames: stdout + stderr, timestamped payloads
      val f1 = "2024-03-05T10:00:00.000000000Z alpha line\n".getBytes("UTF-8")
      val f2 = "2024-03-05T10:00:01.000000000Z beta line\n".getBytes("UTF-8")
      val body = new java.io.ByteArrayOutputStream()
      val d = new java.io.DataOutputStream(body)
      d.writeByte(1); d.writeByte(0); d.writeByte(0); d.writeByte(0)
      d.writeInt(f1.length); d.write(f1)
      d.writeByte(2); d.writeByte(0); d.writeByte(0); d.writeByte(0)
      d.writeInt(f2.length); d.write(f2)
      ex.sendResponseHeaders(200, body.size())
      ex.getResponseBody.write(body.toByteArray)
      // keep the stream open (follow) briefly
      Thread.sleep(500); ex.close()
    })
    server.start()
    val src = PlatformSources.dockerLogs(spark,
      s"tcp://localhost:${server.getAddress.getPort}",
      includeContainers = Seq("web-"))
    try {
      val q = src.df.writeStream.format("memory").queryName("dkq").start()
      val got = drain(q, 2,
        "SELECT container_name, image, stream, message FROM dkq")(r =>
        (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      assert(got == Set(("web-1", "nginx:1", "stdout", "alpha line"),
        ("web-1", "nginx:1", "stderr", "beta line")))
      q.stop()
    } finally { src.stop(); server.stop(0) }
  }

  test("kubernetes_logs source: CRI parse, path metadata, partial lines") {
    val root = java.nio.file.Files.createTempDirectory("pods")
    val cdir = root.resolve("prod_api-7d9_uid-1/app")
    java.nio.file.Files.createDirectories(cdir)
    val log = cdir.resolve("0.log")
    java.nio.file.Files.write(log,
      ("2024-03-05T10:00:00.000000001Z stdout F complete line\n" +
        "2024-03-05T10:00:01.000000001Z stdout P part-one \n")
        .getBytes("UTF-8"))
    val src = PlatformSources.k8sLogs(spark, root.toString)
    val q = src.df.writeStream.format("memory").queryName("k8q").start()
    src.poll(); q.processAllAvailable()
    val first = spark.sql(
      "SELECT kubernetes.pod_namespace, kubernetes.pod_name, kubernetes.container_name, stream, message FROM k8q")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4))).toSet
    assert(first == Set(("prod", "api-7d9", "app", "stdout", "complete line")))
    // the P (partial) line completes on the next append with an F record
    java.nio.file.Files.write(log,
      "2024-03-05T10:00:01.000000002Z stdout F part-two\n".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    src.poll(); q.processAllAvailable()
    val second = spark.sql("SELECT message FROM k8q").collect()
      .map(_.getString(0)).toSet
    assert(second == Set("complete line", "part-one part-two"))
    q.stop()
  }

  test("okta source: SSWS auth and Link-header pagination") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    val auths = new java.util.concurrent.CopyOnWriteArrayList[String]()
    server.createContext("/api/v1/logs", { ex =>
      auths.add(ex.getRequestHeaders.getFirst("Authorization"))
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val (body, next) =
        if (q.contains("after=page2"))
          ("""[{"eventType":"user.session.end","uuid":"e2"}]""", None)
        else
          ("""[{"eventType":"user.session.start","uuid":"e1"}]""",
            Some(s"http://localhost:${server.getAddress.getPort}" +
              "/api/v1/logs?after=page2"))
      next.foreach(n => ex.getResponseHeaders.add("Link",
        s"""<$n>; rel="next""""))
      val out = body.getBytes("UTF-8")
      ex.sendResponseHeaders(200, out.length)
      ex.getResponseBody.write(out); ex.close()
    })
    server.start()
    val src = PlatformSources.okta(spark,
      s"http://localhost:${server.getAddress.getPort}", "tok-okta")
    try {
      val n = src.pollOnce()
      assert(n == 2)
      assert(auths.get(0) == "SSWS tok-okta")
      val q = src.df.writeStream.format("memory").queryName("okq").start()
      q.processAllAvailable()
      val got = spark.sql("SELECT message FROM okq").collect()
        .map(_.getString(0)).toSet
      assert(got.exists(_.contains("user.session.start")))
      assert(got.exists(_.contains("user.session.end")))
      q.stop()
    } finally { src.stop(); server.stop(0) }
  }
}
