package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Database sinks + service-metric pollers: a mini PostgreSQL server
  * speaking the v3 wire protocol (startup, simple query, RowDescription
  * /DataRow), and status endpoints for doris/databend/greptime/apache/
  * nginx/eventstoredb.
  */
class DbSpec extends SparkSpec {
  import spark.implicits._

  /** Mini postgres: trust auth; records every Query; answers SELECTs
    * with a canned result set, everything else with CommandComplete.
    */
  private final class MiniPg {
    val server = new java.net.ServerSocket(0)
    val queries = new java.util.concurrent.LinkedBlockingQueue[String]()
    // canned result: (columns, rows)
    @volatile var result: (Seq[String], Seq[Seq[String]]) =
      (Seq.empty, Seq.empty)
    @volatile var running = true
    private def msg(out: java.io.DataOutputStream, t: Char,
                    body: Array[Byte]): Unit = {
      out.writeByte(t); out.writeInt(4 + body.length); out.write(body)
    }
    val t = new Thread(() => {
      try while (running) {
        val sock = server.accept()
        val conn = new Thread(() => {
          val in = new java.io.DataInputStream(
            new java.io.BufferedInputStream(sock.getInputStream))
          val out = new java.io.DataOutputStream(
            new java.io.BufferedOutputStream(sock.getOutputStream))
          try {
            val len = in.readInt()
            val body = new Array[Byte](len - 4); in.readFully(body)
            require(java.nio.ByteBuffer.wrap(body, 0, 4).getInt == 196608)
            msg(out, 'R', Array[Byte](0, 0, 0, 0)) // AuthenticationOk
            msg(out, 'Z', Array[Byte]('I')) // ReadyForQuery idle
            out.flush()
            while (true) {
              val t = in.readUnsignedByte().toChar
              val qlen = in.readInt()
              val qbody = new Array[Byte](qlen - 4); in.readFully(qbody)
              if (t == 'X') throw new java.io.EOFException()
              if (t == 'Q') {
                val sql = new String(qbody, 0, qbody.length - 1, "UTF-8")
                queries.add(sql)
                if (sql.trim.toUpperCase.startsWith("SELECT")) {
                  val (cols, rows) = result
                  val rd = new java.io.ByteArrayOutputStream()
                  val rdd = new java.io.DataOutputStream(rd)
                  rdd.writeShort(cols.size)
                  cols.foreach { c =>
                    rdd.write(c.getBytes("UTF-8")); rdd.writeByte(0)
                    rdd.writeInt(0); rdd.writeShort(0); rdd.writeInt(25)
                    rdd.writeShort(-1); rdd.writeInt(-1); rdd.writeShort(0)
                  }
                  msg(out, 'T', rd.toByteArray)
                  rows.foreach { r =>
                    val dr = new java.io.ByteArrayOutputStream()
                    val drd = new java.io.DataOutputStream(dr)
                    drd.writeShort(r.size)
                    r.foreach {
                      case null => drd.writeInt(-1)
                      case v =>
                        val b = v.getBytes("UTF-8")
                        drd.writeInt(b.length); drd.write(b)
                    }
                    msg(out, 'D', dr.toByteArray)
                  }
                  msg(out, 'C', s"SELECT ${rows.size}".getBytes("UTF-8") :+ 0.toByte)
                } else {
                  msg(out, 'C', "INSERT 0 1".getBytes("UTF-8") :+ 0.toByte)
                }
                msg(out, 'Z', Array[Byte]('I'))
                out.flush()
              }
            }
          } catch { case _: Exception => () }
          finally sock.close()
        })
        conn.setDaemon(true); conn.start()
      } catch { case _: Exception => () }
    })
    t.setDaemon(true); t.start()
    def port: Int = server.getLocalPort
    def stop(): Unit = { running = false; server.close() }
  }

  private class CapServer {
    val reqs = new java.util.concurrent.CopyOnWriteArrayList[
      (String, String, String, Map[String, String])]() // method, path, body, hdrs
    @volatile var reply = "{}"
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(0), 0)
    server.createContext("/", { ex =>
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val hdrs = Seq("Authorization", "label", "format",
        "read_json_by_line", "insert_sql")
        .flatMap(h => Option(ex.getRequestHeaders.getFirst(h)).map(h -> _))
        .toMap
      reqs.add((ex.getRequestMethod, ex.getRequestURI.toString, body, hdrs))
      val out = reply.getBytes("UTF-8")
      ex.sendResponseHeaders(200, out.length)
      ex.getResponseBody.write(out); ex.close()
    })
    server.start()
    def url: String = s"http://localhost:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
    def all: Seq[(String, String, String, Map[String, String])] =
      reqs.toArray.map(_.asInstanceOf[(String, String, String, Map[String, String])]).toSeq
  }

  private def logs = Seq(("web", "alpha"), ("api", "beta"))
    .toDF("app", "message")

  test("postgres sink: jsonb_populate_recordset insert over the wire") {
    val srv = new MiniPg
    try {
      DbSinks.writePostgres(logs.coalesce(1), DbSinks.PostgresConfig(
        s"postgres://vector@127.0.0.1:${srv.port}/metrics", "events"))
      val q = srv.queries.poll(5, java.util.concurrent.TimeUnit.SECONDS)
      assert(q != null)
      assert(q.startsWith("INSERT INTO events SELECT * FROM " +
        "jsonb_populate_recordset(NULL::events, '["))
      assert(q.contains("\"app\":\"web\"") && q.contains("\"app\":\"api\""))
    } finally srv.stop()
  }

  test("doris sink: stream load PUT with label, auth, ndjson") {
    val srv = new CapServer
    try {
      DbSinks.writeDoris(logs.coalesce(1), DbSinks.DorisConfig(
        srv.url, "d1", "t1", user = "u", password = "p",
        labelPrefix = "graft"))
      val (method, path, body, hdrs) = srv.all.head
      assert(method == "PUT")
      assert(path == "/api/d1/t1/_stream_load")
      assert(hdrs("label").startsWith("graft_d1_t1_"))
      assert(hdrs("format") == "json" && hdrs("read_json_by_line") == "true")
      val basic = java.util.Base64.getEncoder.encodeToString(
        "u:p".getBytes("UTF-8"))
      assert(hdrs("Authorization") == s"Basic $basic")
      assert(body.split("\n").length == 2)
    } finally srv.stop()
  }

  test("databend sink: streaming load with insert_sql header") {
    val srv = new CapServer
    try {
      DbSinks.writeDatabend(logs.coalesce(1), DbSinks.DatabendConfig(
        srv.url, "default", "t9"))
      val (method, path, body, hdrs) = srv.all.head
      assert(method == "PUT" && path == "/v1/streaming_load")
      assert(hdrs("insert_sql") == "INSERT INTO default.t9 FORMAT NDJSON")
      assert(body.contains("\"message\":\"alpha\""))
    } finally srv.stop()
  }

  test("greptimedb_logs sink: /v1/events/logs JSON array") {
    val srv = new CapServer
    try {
      DbSinks.writeGreptimeLogs(logs.coalesce(1), DbSinks.GreptimeLogsConfig(
        srv.url, "public", "app_logs"))
      val (_, path, body, _) = srv.all.head
      assert(path ==
        "/v1/events/logs?db=public&table=app_logs&pipeline_name=greptime_identity")
      assert(body.startsWith("[{") && body.contains("\"app\":\"web\""))
    } finally srv.stop()
  }

  test("apache_metrics poller parses mod_status ?auto") {
    val srv = new CapServer
    srv.reply = "Total Accesses: 85\nTotal kBytes: 76\nUptime: 9240\n" +
      "BusyWorkers: 1\nIdleWorkers: 74\nScoreboard: _W__\n"
    try {
      val src = graft.streaming.PollerSources.apache(spark, srv.url)
      try {
        assert(src.scrapeOnce() == 6)
        val q = src.df.writeStream.format("memory").queryName("apq").start()
        q.processAllAvailable()
        val rows = spark.sql("SELECT name, kind, value, tags FROM apq")
          .collect().map(r => (r.getString(0), r.getString(1),
            r.getDouble(2), r.getString(3))).toSet
        assert(rows.contains(("access_total", "counter", 85.0, "")))
        assert(rows.contains(("sent_bytes_total", "counter", 77824.0, "")))
        assert(rows.contains(("workers", "gauge", 1.0, "state=busy")))
        assert(rows.contains(("up", "gauge", 1.0, "")))
        q.stop()
      } finally src.stop()
    } finally srv.stop()
  }

  test("nginx_metrics poller parses stub_status") {
    val srv = new CapServer
    srv.reply = "Active connections: 291 \nserver accepts handled requests\n" +
      " 16630948 16630947 31070465 \nReading: 6 Writing: 179 Waiting: 106 \n"
    try {
      val src = graft.streaming.PollerSources.nginx(spark, srv.url)
      try {
        assert(src.scrapeOnce() == 8)
        val q = src.df.writeStream.format("memory").queryName("ngq").start()
        q.processAllAvailable()
        val rows = spark.sql("SELECT name, kind, value FROM ngq").collect()
          .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
        assert(rows.contains(("connections_active", "gauge", 291.0)))
        assert(rows.contains(("connections_accepted_total", "counter", 16630948.0)))
        assert(rows.contains(("connections_handled_total", "counter", 16630947.0)))
        assert(rows.contains(("http_requests_total", "counter", 31070465.0)))
        q.stop()
      } finally src.stop()
    } finally srv.stop()
  }

  test("eventstoredb_metrics poller reads /stats proc JSON") {
    val srv = new CapServer
    srv.reply =
      """{"proc":{"mem":1048576,"cpu":1.5,
        |"diskIo":{"readBytes":100,"writtenBytes":200,"readOps":3,"writeOps":4}}}"""
        .stripMargin.replace("\n", "")
    try {
      val src = graft.streaming.PollerSources.eventstore(spark, srv.url)
      try {
        assert(src.scrapeOnce() == 6)
        val q = src.df.writeStream.format("memory").queryName("esq").start()
        q.processAllAvailable()
        val rows = spark.sql("SELECT name, kind, value FROM esq").collect()
          .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
        assert(rows.contains(("process_memory_used_bytes", "gauge", 1048576.0)))
        assert(rows.contains(("disk_written_bytes_total", "counter", 200.0)))
        q.stop()
      } finally src.stop()
    } finally srv.stop()
  }

  test("postgresql_metrics poller SELECTs pg_stat_database over the wire") {
    val srv = new MiniPg
    srv.result = (Seq("datname", "numbackends", "xact_commit", "blks_read"),
      Seq(Seq("appdb", "3", "1000", "50"), Seq(null, "1", "7", "2")))
    try {
      val src = graft.streaming.PollerSources.postgres(spark,
        s"postgres://vector@127.0.0.1:${srv.port}/postgres")
      try {
        assert(src.scrapeOnce() == 7)
        assert(srv.queries.poll(1, java.util.concurrent.TimeUnit.SECONDS)
          == "SELECT * FROM pg_stat_database")
        val q = src.df.writeStream.format("memory").queryName("pgq").start()
        q.processAllAvailable()
        val rows = spark.sql("SELECT name, kind, value, tags FROM pgq")
          .collect().map(r => (r.getString(0), r.getString(1),
            r.getDouble(2), r.getString(3))).toSet
        assert(rows.contains(
          ("pg_stat_database_numbackends", "gauge", 3.0, "db=appdb")))
        assert(rows.contains(
          ("pg_stat_database_xact_commit", "counter", 1000.0, "db=appdb")))
        assert(rows.contains(
          ("pg_stat_database_xact_commit", "counter", 7.0, "db=")))
        q.stop()
      } finally src.stop()
    } finally srv.stop()
  }
}
