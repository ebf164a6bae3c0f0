package graft.streaming

import graft.SparkSpec
import graft.codecs.Mqtt

/** mqtt sink + source against a mini in-test broker speaking real
  * MQTT 3.1.1 packets (CONNECT/CONNACK, SUBSCRIBE/SUBACK, PUBLISH with
  * QoS-1 PUBACK, topic wildcard routing).
  */
class MqttSpec extends SparkSpec {
  import spark.implicits._

  private final class MiniBroker {
    val server = new java.net.ServerSocket(0)
    // (topic, payload, retainFlag) for every publish the broker receives
    val published =
      new java.util.concurrent.LinkedBlockingQueue[(String, String, Boolean)]()
    // subscriber connections: (filters, out-stream)
    private val subs = new java.util.concurrent.CopyOnWriteArrayList[
      (Seq[String], java.io.OutputStream)]()
    @volatile var running = true
    val t = new Thread(() => {
      try while (running) {
        val sock = server.accept()
        val conn = new Thread(() => {
          val in = new java.io.DataInputStream(
            new java.io.BufferedInputStream(sock.getInputStream))
          val out = new java.io.BufferedOutputStream(sock.getOutputStream)
          try while (true) {
            val p = Mqtt.readPacket(in)
            p.ptype match {
              case Mqtt.CONNECT =>
                Mqtt.parseConnect(p) // validates shape
                out.write(Array[Byte]((Mqtt.CONNACK << 4).toByte, 2, 0, 0))
                out.flush()
              case Mqtt.SUBSCRIBE =>
                val (pid, topics) = Mqtt.parseSubscribe(p)
                subs.add((topics, out))
                val body = Mqtt.u16(pid) ++ topics.map(_ => 1.toByte)
                Mqtt.writePacket(out, Mqtt.SUBACK << 4, body); out.flush()
              case Mqtt.PUBLISH =>
                val qos = (p.flags >> 1) & 0x03
                val (topic, pid, payload) = Mqtt.parsePublish(p)
                published.add((topic, new String(payload, "UTF-8"),
                  (p.flags & 1) == 1))
                if (qos > 0) {
                  Mqtt.writePacket(out, Mqtt.PUBACK << 4, Mqtt.u16(pid))
                  out.flush()
                }
                // route to matching subscribers at QoS 0
                subs.forEach { case (filters, sout) =>
                  if (filters.exists(Mqtt.topicMatches(_, topic)))
                    sout.synchronized {
                      val (tf, body) = Mqtt.publish(topic, payload)
                      Mqtt.writePacket(sout, tf, body); sout.flush()
                    }
                }
              case Mqtt.PINGREQ =>
                Mqtt.writePacket(out, Mqtt.PINGRESP << 4, Array.emptyByteArray)
                out.flush()
              case Mqtt.DISCONNECT => throw new java.io.EOFException()
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

  test("mqtt sink publishes QoS-1 with template topic and collects PUBACKs") {
    val srv = new MiniBroker
    try {
      val df = Seq(("web", "m1"), ("api", "m2")).toDF("app", "message")
      graft.sinks.QueueSinks.writeMqtt(df, graft.sinks.QueueSinks.MqttConfig(
        "127.0.0.1", srv.port, "logs/{{ app }}", qos = 1, codec = "text"))
      Thread.sleep(100)
      val got = new java.util.ArrayList[(String, String, Boolean)]()
      srv.published.drainTo(got)
      import scala.jdk.CollectionConverters._
      assert(got.asScala.toSet ==
        Set(("logs/web", "m1", false), ("logs/api", "m2", false)))
    } finally srv.stop()
  }

  test("mqtt sink QoS 0 + retain flag") {
    val srv = new MiniBroker
    try {
      val df = Seq(Tuple1("x")).toDF("message")
      graft.sinks.QueueSinks.writeMqtt(df, graft.sinks.QueueSinks.MqttConfig(
        "127.0.0.1", srv.port, "t", qos = 0, retain = true, codec = "text"))
      val p = srv.published.poll(3, java.util.concurrent.TimeUnit.SECONDS)
      assert(p == ("t", "x", true))
    } finally srv.stop()
  }

  test("mqtt source subscribes with wildcard and streams publishes") {
    val srv = new MiniBroker
    try {
      val src = QueueSources.mqtt(spark, "127.0.0.1", srv.port,
        Seq("sensors/+/temp"))
      try {
        val q = src.df.writeStream.format("memory").queryName("mq").start()
        // wait for the subscriber to register, then publish via the sink
        val deadline = System.currentTimeMillis() + 25000
        Thread.sleep(300)
        val df = Seq(("sensors/a/temp", "21"), ("sensors/b/temp", "22"),
          ("other/x", "no")).toDF("topic", "message")
        graft.sinks.QueueSinks.writeMqtt(df, graft.sinks.QueueSinks.MqttConfig(
          "127.0.0.1", srv.port, "{{ topic }}", qos = 1, codec = "text"))
        var got = Set.empty[(String, String)]
        while (got.size < 2 && System.currentTimeMillis() < deadline) {
          q.processAllAvailable()
          got = spark.sql("SELECT topic, message FROM mq").collect()
            .map(r => (r.getString(0), r.getString(1))).toSet
        }
        assert(got == Set(("sensors/a/temp", "21"), ("sensors/b/temp", "22")))
        q.stop()
      } finally src.stop()
    } finally srv.stop()
  }

  test("mqtt end-to-end from YAML config") {
    val srv = new MiniBroker
    try {
      val yaml =
        s"""sources:
           |  in:
           |    type: mqtt
           |    host: 127.0.0.1
           |    port: ${srv.port}
           |    topic: ["in/#"]
           |sinks:
           |  out:
           |    type: mqtt
           |    inputs: [in]
           |    host: 127.0.0.1
           |    port: ${srv.port}
           |    topic: "out/{{ topic }}"
           |    encoding:
           |      codec: text
           |""".stripMargin
      val tmp = java.nio.file.Files.createTempDirectory("mqttwork").toString
      val handle = graft.plans.ConfigLoader.run(spark, yaml,
        "/root/testdata/sf0.001", tmp)
      try {
        Thread.sleep(300)
        // publish into in/a; expect the pipeline to re-publish to out/in/a
        val seed = Seq(("in/a", "hello")).toDF("topic", "message")
        graft.sinks.QueueSinks.writeMqtt(seed, graft.sinks.QueueSinks.MqttConfig(
          "127.0.0.1", srv.port, "{{ topic }}", qos = 0, codec = "text"))
        val deadline = System.currentTimeMillis() + 30000
        var hit = false
        while (!hit && System.currentTimeMillis() < deadline) {
          handle.processAllAvailable()
          val got = new java.util.ArrayList[(String, String, Boolean)]()
          srv.published.drainTo(got)
          import scala.jdk.CollectionConverters._
          hit = got.asScala.exists { case (t, m, _) =>
            t == "out/in/a" && m.contains("hello") }
        }
        assert(hit)
      } finally handle.stopAll()
    } finally srv.stop()
  }
}
