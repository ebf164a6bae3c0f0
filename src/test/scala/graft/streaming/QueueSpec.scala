package graft.streaming

import graft.SparkSpec
import graft.codecs.Resp

/** redis (RESP) and nats (text protocol) sinks + sources against
  * mini in-test servers speaking the real wire protocols.
  */
class QueueSpec extends SparkSpec {
  import spark.implicits._

  /** Mini redis: parses RESP command arrays, records them, replies :1
    * (push counts) — and serves BLPOP from the recorded pushes.
    */
  private final class MiniRedis {
    val server = new java.net.ServerSocket(0)
    val commands = new java.util.concurrent.LinkedBlockingQueue[Seq[String]]()
    val list = new java.util.concurrent.LinkedBlockingQueue[String]()
    @volatile var running = true
    val t = new Thread(() => {
      try while (running) {
        val sock = server.accept()
        val conn = new Thread(() => {
          val in = new java.io.DataInputStream(
            new java.io.BufferedInputStream(sock.getInputStream))
          val out = new java.io.BufferedOutputStream(sock.getOutputStream)
          try while (true) {
            Resp.readReply(in) match {
              case Resp.ArrayReply(parts) =>
                val cmd = parts.collect { case Resp.BulkString(s) => s }
                commands.add(cmd)
                cmd.head.toUpperCase match {
                  case "LPUSH" | "RPUSH" | "PUBLISH" =>
                    list.add(cmd(2))
                    out.write(":1\r\n".getBytes("UTF-8")); out.flush()
                  case "BLPOP" | "BRPOP" =>
                    Option(list.poll(200,
                      java.util.concurrent.TimeUnit.MILLISECONDS)) match {
                      case Some(v) =>
                        val k = cmd(1)
                        out.write((s"*2\r\n$$${k.length}\r\n$k\r\n" +
                          s"$$${v.getBytes("UTF-8").length}\r\n$v\r\n")
                          .getBytes("UTF-8"))
                      case None => out.write("*-1\r\n".getBytes("UTF-8"))
                    }
                    out.flush()
                  case "SUBSCRIBE" =>
                    val ch = cmd(1)
                    out.write((s"*3\r\n$$9\r\nsubscribe\r\n" +
                      s"$$${ch.length}\r\n$ch\r\n:1\r\n").getBytes("UTF-8"))
                    out.flush()
                    // push everything that arrives on `list` as messages
                    while (true) {
                      val v = list.take()
                      out.write((s"*3\r\n$$7\r\nmessage\r\n" +
                        s"$$${ch.length}\r\n$ch\r\n" +
                        s"$$${v.getBytes("UTF-8").length}\r\n$v\r\n")
                        .getBytes("UTF-8"))
                      out.flush()
                    }
                  case _ =>
                    out.write("+OK\r\n".getBytes("UTF-8")); out.flush()
                }
              case _ => ()
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

  test("redis sink pipelines LPUSH with template key; rpush + publish modes") {
    val srv = new MiniRedis
    try {
      val df = Seq(("web", "m1"), ("api", "m2")).toDF("app", "message")
      graft.sinks.QueueSinks.writeRedis(df, graft.sinks.QueueSinks.RedisConfig(
        s"redis://127.0.0.1:${srv.port}/0", "logs:{{ app }}", codec = "text"))
      Thread.sleep(100)
      val cmds = new java.util.ArrayList[Seq[String]]()
      srv.commands.drainTo(cmds)
      import scala.jdk.CollectionConverters._
      val got = cmds.asScala.toSet
      assert(got == Set(Seq("LPUSH", "logs:web", "m1"),
        Seq("LPUSH", "logs:api", "m2")))
    } finally srv.stop()
  }

  test("redis source BLPOPs a list into the stream") {
    val srv = new MiniRedis
    try {
      srv.list.add("""{"n":1}"""); srv.list.add("""{"n":2}""")
      val src = QueueSources.redis(spark,
        s"redis://127.0.0.1:${srv.port}/0", "mylist")
      try {
        val q = src.df.writeStream.format("memory").queryName("rq").start()
        val deadline = System.currentTimeMillis() + 25000
        var got = Set.empty[String]
        while (got.size < 2 && System.currentTimeMillis() < deadline) {
          q.processAllAvailable()
          got = spark.sql("SELECT message FROM rq").collect()
            .map(_.getString(0)).toSet
        }
        assert(got == Set("""{"n":1}""", """{"n":2}"""))
        q.stop()
      } finally src.stop()
    } finally srv.stop()
  }

  test("redis source SUBSCRIBEs a channel") {
    val srv = new MiniRedis
    try {
      val src = QueueSources.redis(spark,
        s"redis://127.0.0.1:${srv.port}/0", "chan", dataType = "channel")
      try {
        val q = src.df.writeStream.format("memory").queryName("rc").start()
        Thread.sleep(200) // let SUBSCRIBE land
        srv.list.add("pub1")
        val deadline = System.currentTimeMillis() + 25000
        var got = Set.empty[String]
        while (got.isEmpty && System.currentTimeMillis() < deadline) {
          q.processAllAvailable()
          got = spark.sql("SELECT message FROM rc").collect()
            .map(_.getString(0)).toSet
        }
        assert(got == Set("pub1"))
        q.stop()
      } finally src.stop()
    } finally srv.stop()
  }

  /** Mini NATS: greets INFO, answers PING, records PUB payloads, and
    * delivers them to SUB-scribers as MSG frames.
    */
  private final class MiniNats {
    val server = new java.net.ServerSocket(0)
    val published = new java.util.concurrent.LinkedBlockingQueue[(String, String)]()
    @volatile var running = true
    val t = new Thread(() => {
      try while (running) {
        val sock = server.accept()
        val conn = new Thread(() => {
          val in = new java.io.DataInputStream(
            new java.io.BufferedInputStream(sock.getInputStream))
          val out = new java.io.BufferedOutputStream(sock.getOutputStream)
          def line(): String = {
            val sb = new StringBuilder
            var c = in.read()
            while (c != '\r') {
              if (c < 0) throw new java.io.EOFException; sb.append(c.toChar)
              c = in.read()
            }
            in.read(); sb.toString
          }
          try {
            out.write("INFO {\"server_id\":\"mini\"}\r\n".getBytes("UTF-8"))
            out.flush()
            var subscribed: Option[(String, String)] = None // subject, sid
            while (true) {
              val l = line()
              if (l.startsWith("PUB")) {
                val parts = l.split(" ")
                val n = parts.last.toInt
                val payload = new Array[Byte](n); in.readFully(payload)
                in.read(); in.read()
                published.add((parts(1), new String(payload, "UTF-8")))
              } else if (l.startsWith("SUB")) {
                val parts = l.split(" ")
                subscribed = Some((parts(1), parts.last))
                // deliver everything published so far and onward
                val deliver = new Thread(() => {
                  try while (true) {
                    val (subj, payload) = published.take()
                    val (s, sid) = subscribed.get
                    if (subj == s || s == ">") {
                      val b = payload.getBytes("UTF-8")
                      out.write(s"MSG $subj $sid ${b.length}\r\n".getBytes("UTF-8"))
                      out.write(b); out.write("\r\n".getBytes("UTF-8"))
                      out.flush()
                    }
                  } catch { case _: Exception => () }
                })
                deliver.setDaemon(true); deliver.start()
              } else if (l == "PING") {
                out.write("PONG\r\n".getBytes("UTF-8")); out.flush()
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

  test("nats sink PUBs with template subject; nats source SUBs them back") {
    val srv = new MiniNats
    try {
      val df = Seq(("orders", "o1"), ("orders", "o2")).toDF("topic", "message")
      graft.sinks.QueueSinks.writeNats(df, graft.sinks.QueueSinks.NatsConfig(
        s"nats://127.0.0.1:${srv.port}", "events.{{ topic }}", codec = "text"))
      Thread.sleep(100)
      assert(srv.published.size() == 2)
      // now a source consuming the same mini server
      val src = QueueSources.nats(spark,
        s"nats://127.0.0.1:${srv.port}", "events.orders")
      try {
        val q = src.df.writeStream.format("memory").queryName("nq").start()
        Thread.sleep(200)
        // republish through the sink so the subscriber sees them
        graft.sinks.QueueSinks.writeNats(
          Seq(("orders", "o3")).toDF("topic", "message"),
          graft.sinks.QueueSinks.NatsConfig(
            s"nats://127.0.0.1:${srv.port}", "events.{{ topic }}",
            codec = "text"))
        val deadline = System.currentTimeMillis() + 25000
        var got = Set.empty[(String, String)]
        while (got.isEmpty && System.currentTimeMillis() < deadline) {
          q.processAllAvailable()
          got = spark.sql("SELECT subject, message FROM nq").collect()
            .map(r => (r.getString(0), r.getString(1))).toSet
        }
        assert(got.contains(("events.orders", "o3")))
        q.stop()
      } finally src.stop()
    } finally srv.stop()
  }

  test("redis sink + source wire up from YAML") {
    val srv = new MiniRedis
    try {
      val work = java.nio.file.Files.createTempDirectory("rqw").toString
      // batch path: parquet source → redis sink
      graft.plans.ConfigLoader.run(spark,
        s"""
          |sources:
          |  ev: {type: parquet, table: events}
          |sinks:
          |  rout:
          |    type: redis
          |    inputs: [ev]
          |    url: "redis://127.0.0.1:${srv.port}/0"
          |    key: evlist
          |    encoding: {codec: json}
          |""".stripMargin,
        "/root/testdata/sf0.001", work).stopAll()
      val n = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
      assert(srv.list.size() == n)
    } finally srv.stop()
  }
}
