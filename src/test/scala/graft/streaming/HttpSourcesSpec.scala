package graft.streaming

import graft.SparkSpec

/** http_server / http_client / prometheus-scrape source shapes: real
  * JDK HTTP endpoints on ephemeral ports, streamed through
  * MemoryStream-backed sources.
  */
class HttpSourcesSpec extends SparkSpec {

  test("http_server source ingests posted newline-framed bodies") {
    val src = StreamRunner.httpServer(spark)
    try {
      val q = src.df.writeStream.format("memory")
        .queryName("http_in").start()
      val url = new java.net.URL(
        s"http://127.0.0.1:${src.boundPort}/")
      def post(body: String): Unit = {
        val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        conn.getOutputStream.write(body.getBytes("UTF-8"))
        assert(conn.getResponseCode == 200)
        conn.disconnect()
      }
      post("line one\nline two\n")
      post("line three")
      q.processAllAvailable()
      val rows = spark.sql("SELECT message FROM http_in")
        .collect().map(_.getString(0)).toSet
      assert(rows == Set("line one", "line two", "line three"))
      q.stop()
    } finally src.stop()
  }

  test("http_client poll + prometheus scrape decode") {
    // tiny exposition endpoint
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    server.createContext("/metrics", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = ("# HELP up is up\n" +
        "up{job=\"graft\"} 1\n" +
        "req_total{job=\"graft\",code=\"200\"} 42 1700000000000\n" +
        "temp_c -2.5e-3\n").getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    try {
      val src = StreamRunner.httpClient(spark,
        s"http://127.0.0.1:${server.getAddress.getPort}/metrics")
      val q = StreamRunner.prometheusScrape(src).writeStream
        .format("memory").queryName("prom_in").start()
      src.pollOnce()
      q.processAllAvailable()
      val rows = spark.sql("SELECT name, value FROM prom_in").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(rows == Map("up" -> 1.0, "req_total" -> 42.0, "temp_c" -> -0.0025))
      q.stop()
    } finally server.stop(0)
  }
}
