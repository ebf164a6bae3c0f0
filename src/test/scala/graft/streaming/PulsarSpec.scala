package graft.streaming

import graft.SparkSpec
import graft.codecs.Pulsar

/** pulsar sink + source against a mini in-test broker speaking the real
  * binary protocol: CONNECT/CONNECTED, PRODUCER/PRODUCER_SUCCESS,
  * SEND payload frames (magic + crc32c + MessageMetadata) answered with
  * SEND_RECEIPT, SUBSCRIBE/SUCCESS, FLOW-gated MESSAGE delivery.
  */
class PulsarSpec extends SparkSpec {
  import spark.implicits._

  private final class MiniPulsar {
    val server = new java.net.ServerSocket(0)
    // (topic, producerName, partitionKey, payload) for every SEND
    val published = new java.util.concurrent.LinkedBlockingQueue[
      (String, String, String, String)]()
    // messages served to subscribers: (topic, producerName, payload)
    val queue = new java.util.concurrent.LinkedBlockingQueue[
      (String, String, String)]()
    @volatile var running = true
    val t = new Thread(() => {
      try while (running) {
        val sock = server.accept()
        val conn = new Thread(() => {
          val in = new java.io.DataInputStream(
            new java.io.BufferedInputStream(sock.getInputStream))
          val out = new java.io.BufferedOutputStream(sock.getOutputStream)
          var producers = Map.empty[Long, String] // producer id -> topic
          try while (true) {
            val f = Pulsar.readFrame(in)
            f.ctype match {
              case Pulsar.CONNECT =>
                Pulsar.writeSimple(out, Pulsar.command(Pulsar.CONNECTED,
                  new Pulsar.PW().field(1, "mini").field(2, 21L).toBytes))
                out.flush()
              case Pulsar.PRODUCER =>
                val p = Pulsar.sub(f.cmd(Pulsar.PRODUCER))
                val topic = Pulsar.str(p(1))
                val pid = p(2).asInstanceOf[Long]
                val rid = p(3).asInstanceOf[Long]
                producers += pid -> topic
                Pulsar.writeSimple(out, Pulsar.command(Pulsar.PRODUCER_SUCCESS,
                  new Pulsar.PW().field(1, rid).field(2, "mini-p").toBytes))
                out.flush()
              case Pulsar.SEND =>
                val s = Pulsar.sub(f.cmd(Pulsar.SEND))
                val pid = s(1).asInstanceOf[Long]
                val seq = s(2).asInstanceOf[Long]
                val meta = f.metadata.getOrElse(Map.empty)
                published.add((producers.getOrElse(pid, "?"),
                  meta.get(1).map(Pulsar.str).getOrElse(""),
                  meta.get(11).map(Pulsar.str).orNull,
                  new String(f.payload.get, "UTF-8")))
                Pulsar.writeSimple(out, Pulsar.command(Pulsar.SEND_RECEIPT,
                  new Pulsar.PW().field(1, pid).field(2, seq).toBytes))
                out.flush()
              case Pulsar.SUBSCRIBE =>
                val s = Pulsar.sub(f.cmd(Pulsar.SUBSCRIBE))
                val topic = Pulsar.str(s(1))
                val cid = s(4).asInstanceOf[Long]
                val rid = s(5).asInstanceOf[Long]
                Pulsar.writeSimple(out, Pulsar.command(Pulsar.SUCCESS,
                  new Pulsar.PW().field(1, rid).toBytes))
                out.flush()
                val dt = new Thread(() => {
                  var entry = 0L
                  try while (true) {
                    val (mt, pn, body) = queue.take()
                    if (mt == topic) out.synchronized {
                      entry += 1
                      val mid = new Pulsar.PW().field(1, 1L).field(2, entry)
                      Pulsar.writePayload(out,
                        Pulsar.command(Pulsar.MESSAGE, new Pulsar.PW()
                          .field(1, cid).field(2, mid.toBytes).toBytes),
                        Pulsar.messageMetadata(pn, entry, 123456789L),
                        body.getBytes("UTF-8"))
                      out.flush()
                    } else queue.add((mt, pn, body)) // not ours; recycle
                  } catch { case _: Exception => () }
                })
                dt.setDaemon(true); dt.start()
              case _ => () // FLOW / ACK / PONG
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

  test("pulsar sink opens one producer per rendered topic and pipelines SENDs") {
    val srv = new MiniPulsar
    try {
      val df = Seq(("web", "u1", "m1"), ("api", "u2", "m2"),
        ("web", "u3", "m3")).toDF("app", "user", "message")
      graft.sinks.QueueSinks.writePulsar(df.coalesce(1),
        graft.sinks.QueueSinks.PulsarConfig(
          s"pulsar://127.0.0.1:${srv.port}", "t-{{ app }}",
          partitionKeyField = Some("user"), codec = "text"))
      Thread.sleep(100)
      val got = new java.util.ArrayList[(String, String, String, String)]()
      srv.published.drainTo(got)
      import scala.jdk.CollectionConverters._
      assert(got.asScala.toSet == Set(
        ("t-web", "graft", "u1", "m1"), ("t-api", "graft", "u2", "m2"),
        ("t-web", "graft", "u3", "m3")))
    } finally srv.stop()
  }

  test("pulsar source subscribes and streams MESSAGE frames") {
    val srv = new MiniPulsar
    try {
      val src = QueueSources.pulsar(spark, s"pulsar://127.0.0.1:${srv.port}",
        Seq("jobs"), "sub1")
      try {
        val q = src.df.writeStream.format("memory").queryName("pq").start()
        Thread.sleep(300)
        srv.queue.add(("jobs", "prod-a", """{"n":1}"""))
        srv.queue.add(("jobs", "prod-a", """{"n":2}"""))
        val deadline = System.currentTimeMillis() + 25000
        var got = Set.empty[(String, String, Long, String)]
        while (got.size < 2 && System.currentTimeMillis() < deadline) {
          q.processAllAvailable()
          got = spark.sql(
            "SELECT topic, producer_name, publish_time, message FROM pq")
            .collect()
            .map(r => (r.getString(0), r.getString(1), r.getLong(2),
              r.getString(3))).toSet
        }
        assert(got == Set(("jobs", "prod-a", 123456789L, """{"n":1}"""),
          ("jobs", "prod-a", 123456789L, """{"n":2}""")))
        q.stop()
      } finally src.stop()
    } finally srv.stop()
  }

  test("pulsar end-to-end from YAML config") {
    val srv = new MiniPulsar
    try {
      val yaml =
        s"""sources:
           |  in:
           |    type: pulsar
           |    endpoint: pulsar://127.0.0.1:${srv.port}
           |    topics: [ingest]
           |    subscription_name: graft
           |sinks:
           |  out:
           |    type: pulsar
           |    inputs: [in]
           |    endpoint: pulsar://127.0.0.1:${srv.port}
           |    topic: "relay"
           |    encoding:
           |      codec: text
           |""".stripMargin
      val tmp = java.nio.file.Files.createTempDirectory("pulsarwork").toString
      val handle = graft.plans.ConfigLoader.run(spark, yaml,
        "/root/testdata/sf0.001", tmp)
      try {
        Thread.sleep(300)
        srv.queue.add(("ingest", "seed", "hello"))
        val deadline = System.currentTimeMillis() + 30000
        var hit = false
        while (!hit && System.currentTimeMillis() < deadline) {
          handle.processAllAvailable()
          val got = new java.util.ArrayList[(String, String, String, String)]()
          srv.published.drainTo(got)
          import scala.jdk.CollectionConverters._
          hit = got.asScala.exists { case (t, _, _, body) =>
            t == "relay" && body.contains("hello") }
        }
        assert(hit)
      } finally handle.stopAll()
    } finally srv.stop()
  }
}
