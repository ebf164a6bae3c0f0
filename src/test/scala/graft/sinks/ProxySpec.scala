package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The `proxy:` global (reference src/config/proxy.rs): http sinks
  * route through the configured HTTP proxy; `no_proxy` hosts bypass it.
  */
class ProxySpec extends SparkSpec {
  import spark.implicits._

  test("http sink routes through the proxy; no_proxy bypasses") {
    // a recording "proxy": accepts the absolute-form request and 200s
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val proxy = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    proxy.createContext("/", ex => {
      seen.add(ex.getRequestURI.toString + "|" +
        new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
      ex.sendResponseHeaders(200, -1)
      ex.close()
    })
    proxy.start()
    // a direct target for the no_proxy leg
    val direct = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val target = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    target.createContext("/d", ex => {
      direct.add(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
      ex.sendResponseHeaders(200, -1)
      ex.close()
    })
    target.start()
    try {
      val df = Seq("hello-proxy").toDF("message").coalesce(1)
      val prox = NetworkSinks.ProxyConfig(enabled = true,
        http = Some(s"127.0.0.1:${proxy.getAddress.getPort}"),
        noProxy = Seq("127.0.0.1"))
      // proxied: the target host is unreachable on purpose — delivery
      // proves the request went to the proxy, not the target
      NetworkSinks.writeHttp(df, NetworkSinks.HttpConfig(
        "http://unreachable.invalid:1/ingest", codec = "text",
        proxy = prox.copy(noProxy = Nil)))
      assert(seen.size == 1)
      assert(seen.peek().contains("hello-proxy"))
      assert(seen.peek().contains("unreachable.invalid"))
      // no_proxy: 127.0.0.1 is excluded — goes straight to the target
      NetworkSinks.writeHttp(df, NetworkSinks.HttpConfig(
        s"http://127.0.0.1:${target.getAddress.getPort}/d",
        codec = "text", proxy = prox))
      assert(direct.size == 1 && seen.size == 1)
    } finally { proxy.stop(0); target.stop(0) }
  }

  test("proxy config comes from the yaml global at run time") {
    val conf = graft.plans.ConfigLoader
    val tmp = java.nio.file.Files.createTempDirectory("proxywork").toString
    val running = conf.run(spark,
      """
        |proxy:
        |  http: 127.0.0.1:3128
        |  no_proxy: [internal.example]
        |sources:
        |  in: {type: parquet, table: events}
        |sinks:
        |  out: {type: memory, inputs: [in]}
        |""".stripMargin, "/root/testdata/sf0.001", tmp)
    try {
      val g = NetworkSinks.globalProxy
      assert(g.enabled && g.http.contains("127.0.0.1:3128"))
      assert(g.noProxy == Seq("internal.example"))
      // forUri: proxied for a random host, skipped for no_proxy hosts
      assert(g.forUri(new java.net.URI("http://api.example.com/x")).nonEmpty)
      assert(g.forUri(new java.net.URI("http://internal.example/x")).isEmpty)
      assert(g.forUri(new java.net.URI("http://sub.internal.example/x")).isEmpty)
    } finally {
      running.stopAll()
      // the global is process-wide: leave it clean or every later spec's
      // direct-HTTP sink routes to this dead proxy
      NetworkSinks.globalProxy = NetworkSinks.ProxyConfig()
    }
  }
}
