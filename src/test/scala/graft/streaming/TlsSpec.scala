package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.NetworkSinks

/** The `tls:` config subset (reference src/tls/settings.rs:
  * enabled / crt_file / key_file / ca_file / verify_certificate) over
  * the socket and http transports, against a self-signed pair under
  * test resources (server.crt is signed by ca.crt with
  * SAN IP:127.0.0.1; other-ca.crt is an unrelated authority).
  */
class TlsSpec extends SparkSpec {
  import spark.implicits._

  private def res(n: String): String =
    java.nio.file.Paths.get(getClass.getResource(s"/tls/$n").toURI).toString

  private lazy val serverCfg = Tls.Config(enabled = true,
    crtFile = Some(res("server.crt")), keyFile = Some(res("server.key")))
  private def clientCfg(ca: String) = Tls.Config(enabled = true,
    caFile = Some(res(ca)))

  private def eventually[T](deadlineMs: Long = 20000)(f: => T): T = {
    val end = System.nanoTime + deadlineMs * 1000000L
    var last: Throwable = null
    while (System.nanoTime < end) {
      try return f
      catch { case t: Throwable => last = t; Thread.sleep(100) }
    }
    throw last
  }

  test("pem loading: cert chain and PKCS#8 key build a working pair") {
    val ctx = Tls.serverContext(serverCfg)
    assert(ctx != null)
    val cli = Tls.clientContext(clientCfg("ca.crt"))
    assert(cli != null)
  }

  test("socket sink speaks TLS to a TLS server; wrong CA is rejected") {
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = Tls.serverContext(serverCfg)
      .getServerSocketFactory.createServerSocket(0)
    val accept = new Thread(() => {
      try while (true) {
        val sock = server.accept()
        val t = new Thread(() => {
          try {
            val r = new java.io.BufferedReader(
              new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
            var line = r.readLine()
            while (line != null) { received.add(line); line = r.readLine() }
          } catch { case _: Exception => () } finally sock.close()
        })
        t.setDaemon(true); t.start()
      } catch { case _: Exception => () }
    })
    accept.setDaemon(true)
    accept.start()
    try {
      val df = Seq("alpha", "beta").toDF("message").coalesce(1)
      NetworkSinks.writeSocket(df, NetworkSinks.SocketConfig(
        "tcp", s"127.0.0.1:${server.getLocalPort}",
        tls = clientCfg("ca.crt")))
      eventually() {
        assert(received.toArray.map(_.toString).toSet ==
          Set("alpha", "beta"))
      }
      // a client trusting only the OTHER authority must refuse the
      // server's certificate — the write fails, nothing arrives
      received.clear()
      val err = intercept[Exception] {
        NetworkSinks.writeSocket(df, NetworkSinks.SocketConfig(
          "tcp", s"127.0.0.1:${server.getLocalPort}",
          tls = clientCfg("other-ca.crt")))
      }
      assert(err.getMessage != null)
      assert(received.isEmpty)
    } finally server.close()
  }

  test("http sink posts over https with a custom CA; wrong CA is rejected") {
    val bodies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = com.sun.net.httpserver.HttpsServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.setHttpsConfigurator(new com.sun.net.httpserver.HttpsConfigurator(
      Tls.serverContext(serverCfg)))
    server.createContext("/sink", ex => {
      bodies.add(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
      ex.sendResponseHeaders(200, -1)
      ex.close()
    })
    server.start()
    val uri = s"https://127.0.0.1:${server.getAddress.getPort}/sink"
    try {
      val df = Seq("one", "two").toDF("message").coalesce(1)
      NetworkSinks.writeHttp(df, NetworkSinks.HttpConfig(uri,
        codec = "text", tls = clientCfg("ca.crt")))
      eventually() {
        assert(bodies.toArray.mkString("\n").contains("one"))
      }
      intercept[Exception] {
        NetworkSinks.writeHttp(df, NetworkSinks.HttpConfig(uri,
          codec = "text", tls = clientCfg("other-ca.crt")))
      }
    } finally server.stop(0)
  }

  test("run: http_server source serves https from a YAML tls block") {
    val work = java.nio.file.Files.createTempDirectory("tlssrv").toString
    val running = graft.plans.ConfigLoader.run(spark,
      s"""
        |sources:
        |  in:
        |    type: http_server
        |    address: 127.0.0.1:0
        |    tls:
        |      enabled: true
        |      crt_file: ${res("server.crt")}
        |      key_file: ${res("server.key")}
        |sinks:
        |  tls_tap:
        |    type: memory
        |    inputs: [in]
        |""".stripMargin, "/root/testdata/sf0.001", work)
    try {
      val port = graft.plans.ConfigLoader.lastAgentPort
      val conn = new java.net.URL(s"https://127.0.0.1:$port/")
        .openConnection().asInstanceOf[javax.net.ssl.HttpsURLConnection]
      conn.setSSLSocketFactory(
        Tls.clientContext(clientCfg("ca.crt")).getSocketFactory)
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.getOutputStream.write("secure line\n".getBytes("UTF-8"))
      conn.getOutputStream.close()
      assert(conn.getResponseCode == 200)
      // and plaintext against the same port is refused
      intercept[Exception] {
        val plain = new java.net.URL(s"http://127.0.0.1:$port/")
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        plain.setConnectTimeout(2000); plain.setReadTimeout(2000)
        plain.setRequestMethod("POST")
        plain.setDoOutput(true)
        plain.getOutputStream.write("x\n".getBytes("UTF-8"))
        plain.getOutputStream.close()
        plain.getResponseCode
      }
      eventually() {
        running.processAllAvailable()
        val got = spark.table("tls_tap").collect()
          .map(_.getAs[String]("message")).toSet
        assert(got == Set("secure line"))
      }
    } finally running.stopAll()
  }

  test("run: socket source with tls connects through the trust settings") {
    // TLS feed server pushes lines; the YAML socket source (tls block)
    // reads them through the client-socket path
    val server = Tls.serverContext(serverCfg)
      .getServerSocketFactory.createServerSocket(0)
    val feeder = new Thread(() => {
      try {
        val sock = server.accept()
        val out = sock.getOutputStream
        out.write("tls one\ntls two\n".getBytes("UTF-8"))
        out.flush()
        Thread.sleep(15000)
        sock.close()
      } catch { case _: Exception => () }
    })
    feeder.setDaemon(true)
    feeder.start()
    val work = java.nio.file.Files.createTempDirectory("tlssock").toString
    val running = graft.plans.ConfigLoader.run(spark,
      s"""
        |sources:
        |  in:
        |    type: socket
        |    address: 127.0.0.1:${server.getLocalPort}
        |    tls:
        |      enabled: true
        |      ca_file: ${res("ca.crt")}
        |sinks:
        |  tls_sock_tap:
        |    type: memory
        |    inputs: [in]
        |""".stripMargin, "/root/testdata/sf0.001", work)
    try eventually() {
      running.processAllAvailable()
      val got = spark.table("tls_sock_tap").collect()
        .map(_.getAs[String]("message")).toSet
      assert(got == Set("tls one", "tls two"))
    } finally { running.stopAll(); server.close() }
  }

  test("run: syslog source over TLS decodes octet-counted frames") {
    val work = java.nio.file.Files.createTempDirectory("tlssyslog").toString
    val running = graft.plans.ConfigLoader.run(spark,
      s"""
        |sources:
        |  in:
        |    type: syslog
        |    mode: tcp
        |    address: 127.0.0.1:0
        |    tls:
        |      enabled: true
        |      crt_file: ${res("server.crt")}
        |      key_file: ${res("server.key")}
        |sinks:
        |  tls_syslog_tap:
        |    type: memory
        |    inputs: [in]
        |""".stripMargin, "/root/testdata/sf0.001", work)
    try {
      val port = graft.plans.ConfigLoader.lastAgentPort
      val sock = Tls.clientContext(clientCfg("ca.crt")).getSocketFactory
        .createSocket("127.0.0.1", port)
      val msg = "<165>1 2024-02-13T21:53:30.605Z tlshost app - ID9 - over tls"
      sock.getOutputStream.write(s"${msg.length} $msg".getBytes("UTF-8"))
      sock.getOutputStream.flush()
      sock.close()
      eventually() {
        running.processAllAvailable()
        val rows = spark.table("tls_syslog_tap").collect()
        assert(rows.length == 1)
        assert(rows.head.getAs[String]("hostname") == "tlshost")
        assert(rows.head.getAs[String]("message") == "over tls")
      }
    } finally running.stopAll()
  }

  test("verify_certificate: false accepts an untrusted server cert") {
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = Tls.serverContext(serverCfg)
      .getServerSocketFactory.createServerSocket(0)
    val accept = new Thread(() => {
      try {
        val sock = server.accept()
        val r = new java.io.BufferedReader(
          new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
        var line = r.readLine()
        while (line != null) { received.add(line); line = r.readLine() }
      } catch { case _: Exception => () }
    })
    accept.setDaemon(true)
    accept.start()
    try {
      val df = Seq("unverified").toDF("message").coalesce(1)
      NetworkSinks.writeSocket(df, NetworkSinks.SocketConfig(
        "tcp", s"127.0.0.1:${server.getLocalPort}",
        tls = Tls.Config(enabled = true,
          caFile = Some(res("other-ca.crt")), verifyCertificate = false)))
      eventually() {
        assert(received.toArray.map(_.toString).toSet == Set("unverified"))
      }
    } finally server.close()
  }
}
