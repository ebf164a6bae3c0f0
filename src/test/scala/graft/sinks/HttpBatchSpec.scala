package graft.sinks

import org.apache.spark.sql.{functions => F, Row}
import graft.SparkSpec

/** batch.max_bytes on the HTTP transport (src/sinks/util/batch.rs): a
  * request closes at whichever of max_events / max_bytes fills first.
  */
class HttpBatchSpec extends SparkSpec {
  import spark.implicits._

  test("chunked closes batches on the byte budget, count budget, or both") {
    def rows(ss: String*): Iterator[Row] = ss.iterator.map(Row(_))
    def sizes(batches: Iterator[Seq[Row]]): Seq[Seq[String]] =
      batches.map(_.map(_.getString(0))).toSeq
    // byte budget: "aaaa"(4)+"bb"(2) = 6 <= 7, "ccc" overflows to batch 2
    assert(sizes(NetworkSinks.chunked(rows("aaaa", "bb", "ccc", "d"),
      maxEvents = 100, maxBytes = 7)) ==
      Seq(Seq("aaaa", "bb"), Seq("ccc", "d")))
    // an over-budget single event still ships alone
    assert(sizes(NetworkSinks.chunked(rows("xxxxxxxxxx", "y"),
      maxEvents = 100, maxBytes = 4)) ==
      Seq(Seq("xxxxxxxxxx"), Seq("y")))
    // count budget still binds when bytes are roomy
    assert(sizes(NetworkSinks.chunked(rows("a", "b", "c"),
      maxEvents = 2, maxBytes = 1000)) == Seq(Seq("a", "b"), Seq("c")))
    // maxBytes=0 = unbounded bytes (the pre-existing behavior)
    assert(sizes(NetworkSinks.chunked(rows("a", "b", "c"),
      maxEvents = 10, maxBytes = 0)) == Seq(Seq("a", "b", "c")))
  }

  test("auth: strategy renders the Authorization header from YAML") {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/a", ex => {
      seen.add(ex.getRequestHeaders.getFirst("Authorization"))
      ex.sendResponseHeaders(200, -1)
      ex.close()
    })
    server.start()
    val work = java.nio.file.Files.createTempDirectory("authwork").toString
    try {
      val running = graft.plans.ConfigLoader.run(spark,
        s"""
          |sources:
          |  in: {type: parquet, table: region}
          |sinks:
          |  basic_out:
          |    type: http
          |    inputs: [in]
          |    uri: http://127.0.0.1:${server.getAddress.getPort}/a
          |    auth:
          |      strategy: basic
          |      user: bob
          |      password: hunter2
          |  bearer_out:
          |    type: http
          |    inputs: [in]
          |    uri: http://127.0.0.1:${server.getAddress.getPort}/a
          |    auth:
          |      strategy: bearer
          |      token: tok123
          |""".stripMargin, "/root/testdata/sf0.001", work)
      running.stopAll()
      val got = seen.toArray.map(_.toString).toSet
      val basic = "Basic " + java.util.Base64.getEncoder
        .encodeToString("bob:hunter2".getBytes("UTF-8"))
      assert(got == Set(basic, "Bearer tok123"), got.toString)
    } finally server.stop(0)
  }

  test("http sink splits requests when max_bytes fills first") {
    val bodies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/b", ex => {
      bodies.add(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
      ex.sendResponseHeaders(200, -1)
      ex.close()
    })
    server.start()
    try {
      val df = Seq("0123456789", "abcdefghij", "QRSTUVWXYZ")
        .toDF("message").coalesce(1)
      NetworkSinks.writeHttp(df, NetworkSinks.HttpConfig(
        s"http://127.0.0.1:${server.getAddress.getPort}/b",
        codec = "text", maxEvents = 100, maxBytes = 15))
      // 10+10 > 15 -> one event per request
      assert(bodies.size == 3, bodies.toString)
    } finally server.stop(0)
  }
}
