package graft.streaming

import graft.SparkSpec
import graft.codecs.MsgPack
import graft.codecs.MsgPack._

/** fluent (fluentd forward protocol, msgpack over tcp) and logstash
  * (beats/lumberjack v2) agent-protocol sources — each test speaks the
  * real wire protocol as a client against the ephemeral-port server.
  */
class AgentSourcesSpec extends SparkSpec {

  // ---- msgpack codec itself ----

  test("msgpack round-trips the value families") {
    val v: Value = MpArray(Vector(
      MpLong(7), MpLong(-3), MpLong(300), MpLong(-300), MpLong(1L << 40),
      MpBool(true), MpNil, MpDouble(2.5),
      MpString("héllo"), MpString("x" * 40),
      MpBytes(Array[Byte](1, 2, 3)),
      MpMap(Vector(MpString("k") -> MpString("v"))),
      MpExt(0, Array.fill[Byte](8)(1))))
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(MsgPack.toBytes(v)))
    val back = MsgPack.read(in)
    def cmp(a: Value, b: Value): Boolean = (a, b) match {
      case (MpBytes(x), MpBytes(y)) => x.sameElements(y)
      case (MpExt(t1, d1), MpExt(t2, d2)) => t1 == t2 && d1.sameElements(d2)
      case (MpArray(x), MpArray(y)) =>
        x.length == y.length && x.zip(y).forall((cmp _).tupled)
      case (x, y) => x == y
    }
    assert(cmp(v, back))
  }

  test("msgpack toJson renders records") {
    val rec = MpMap(Vector(
      MpString("msg") -> MpString("a \"b\"\n"),
      MpString("n") -> MpLong(5),
      MpString("xs") -> MpArray(Vector(MpLong(1), MpNil, MpBool(false)))))
    assert(MsgPack.toJson(rec) ==
      """{"msg":"a \"b\"\n","n":5,"xs":[1,null,false]}""")
  }

  // ---- fluent ----

  private def fluentClient(port: Int): (java.net.Socket,
      java.io.DataOutputStream, java.io.DataInputStream) = {
    val sock = new java.net.Socket("127.0.0.1", port)
    (sock, new java.io.DataOutputStream(sock.getOutputStream),
      new java.io.DataInputStream(sock.getInputStream))
  }

  private def rec(kv: (String, String)*): Value =
    MpMap(kv.toVector.map { case (k, v) =>
      (MpString(k): Value) -> (MpString(v): Value) })

  test("fluent source: Message, Forward, PackedForward + EventTime + ack") {
    val src = AgentSources.fluent(spark)
    try {
      val q = src.df.writeStream.format("memory").queryName("fl_in").start()
      val (sock, out, in) = fluentClient(src.boundPort)
      // Message mode: [tag, time(int sec), record]
      MsgPack.write(out, MpArray(Vector(
        MpString("app.log"), MpLong(1700000000L), rec("message" -> "m1"))))
      // Forward mode with EventTime ext (sec=1700000001, ns=500000000)
      val evTime = {
        val bb = java.nio.ByteBuffer.allocate(8)
        bb.putInt(1700000001); bb.putInt(500000000)
        MpExt(0, bb.array())
      }
      MsgPack.write(out, MpArray(Vector(
        MpString("fwd.log"),
        MpArray(Vector(
          MpArray(Vector(evTime, rec("message" -> "m2"))),
          MpArray(Vector(MpLong(1700000002L), rec("message" -> "m3"))))))))
      // PackedForward with chunk option → expect the {"ack": chunk} reply
      val packed = new java.io.ByteArrayOutputStream()
      val pout = new java.io.DataOutputStream(packed)
      MsgPack.write(pout, MpArray(Vector(MpLong(1700000003L), rec("message" -> "m4"))))
      MsgPack.write(pout, MpArray(Vector(MpLong(1700000004L), rec("message" -> "m5"))))
      MsgPack.write(out, MpArray(Vector(
        MpString("packed.log"), MpBytes(packed.toByteArray),
        MpMap(Vector(MpString("chunk") -> MpString("abc123"))))))
      out.flush()
      val reply = MsgPack.read(in)
      assert(reply == MpMap(Vector(MpString("ack") -> MpString("abc123"))))
      q.processAllAvailable()
      val rows = spark.sql("SELECT tag, message FROM fl_in").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(rows == Set(
        ("app.log", """{"message":"m1"}"""),
        ("fwd.log", """{"message":"m2"}"""),
        ("fwd.log", """{"message":"m3"}"""),
        ("packed.log", """{"message":"m4"}"""),
        ("packed.log", """{"message":"m5"}""")))
      val ts = spark.sql(
        "SELECT CAST(timestamp AS STRING) FROM fl_in WHERE message LIKE '%m2%'")
        .collect().head.getString(0)
      assert(ts == "2023-11-14 22:13:21.5") // EventTime sec + ns honored
      sock.close(); q.stop()
    } finally src.stop()
  }

  test("fluent source: CompressedPackedForward (gzip) entries decode") {
    val src = AgentSources.fluent(spark)
    try {
      val q = src.df.writeStream.format("memory").queryName("fl_gz").start()
      val (sock, out, _) = fluentClient(src.boundPort)
      val packed = new java.io.ByteArrayOutputStream()
      val pout = new java.io.DataOutputStream(packed)
      (1 to 3).foreach(i => MsgPack.write(pout,
        MpArray(Vector(MpLong(1700000000L + i), rec("message" -> s"gz$i")))))
      val gz = new java.io.ByteArrayOutputStream()
      val gzo = new java.util.zip.GZIPOutputStream(gz)
      gzo.write(packed.toByteArray); gzo.close()
      MsgPack.write(out, MpArray(Vector(
        MpString("gz.log"), MpBytes(gz.toByteArray),
        MpMap(Vector(MpString("compressed") -> MpString("gzip"))))))
      out.flush()
      q.processAllAvailable()
      // one more trigger in case the add raced the first processAll
      Thread.sleep(100); q.processAllAvailable()
      val rows = spark.sql("SELECT message FROM fl_gz").collect()
        .map(_.getString(0)).toSet
      assert(rows == Set("""{"message":"gz1"}""", """{"message":"gz2"}""",
        """{"message":"gz3"}"""))
      sock.close(); q.stop()
    } finally src.stop()
  }

  // ---- logstash ----

  test("logstash source: window + json frames + zlib batch + ack") {
    val src = AgentSources.logstash(spark)
    try {
      val q = src.df.writeStream.format("memory").queryName("ls_in").start()
      val sock = new java.net.Socket("127.0.0.1", src.boundPort)
      val out = new java.io.DataOutputStream(sock.getOutputStream)
      val in = new java.io.DataInputStream(sock.getInputStream)
      // batch 1: window=2, two J frames → expect ack of seq 2
      out.writeByte('2'); out.writeByte('W'); out.writeInt(2)
      def jframe(seq: Int, json: String): Unit = {
        out.writeByte('2'); out.writeByte('J'); out.writeInt(seq)
        val b = json.getBytes("UTF-8")
        out.writeInt(b.length); out.write(b)
      }
      jframe(1, """{"message":"j1","host":"h1"}""")
      jframe(2, """{"message":"j2","host":"h1"}""")
      out.flush()
      assert(in.readByte() == '2' && in.readByte() == 'A' && in.readInt() == 2)
      // batch 2: compressed frame containing window=1 + one J frame
      val inner = new java.io.ByteArrayOutputStream()
      val innerOut = new java.io.DataOutputStream(inner)
      innerOut.writeByte('2'); innerOut.writeByte('W'); innerOut.writeInt(1)
      innerOut.writeByte('2'); innerOut.writeByte('J'); innerOut.writeInt(1)
      val jb = """{"message":"zlibbed"}""".getBytes("UTF-8")
      innerOut.writeInt(jb.length); innerOut.write(jb)
      val deflated = {
        val bos = new java.io.ByteArrayOutputStream()
        val dos = new java.util.zip.DeflaterOutputStream(bos)
        dos.write(inner.toByteArray); dos.close(); bos.toByteArray
      }
      out.writeByte('2'); out.writeByte('C'); out.writeInt(deflated.length)
      out.write(deflated); out.flush()
      assert(in.readByte() == '2' && in.readByte() == 'A' && in.readInt() == 1)
      q.processAllAvailable()
      val rows = spark.sql("SELECT message FROM ls_in").collect()
        .map(_.getString(0)).toSet
      assert(rows == Set("""{"message":"j1","host":"h1"}""",
        """{"message":"j2","host":"h1"}""", """{"message":"zlibbed"}"""))
      sock.close(); q.stop()
    } finally src.stop()
  }

  test("logstash source: v1 D (key/value) frames become json events") {
    val src = AgentSources.logstash(spark)
    try {
      val q = src.df.writeStream.format("memory").queryName("ls_v1").start()
      val sock = new java.net.Socket("127.0.0.1", src.boundPort)
      val out = new java.io.DataOutputStream(sock.getOutputStream)
      val in = new java.io.DataInputStream(sock.getInputStream)
      out.writeByte('1'); out.writeByte('W'); out.writeInt(1)
      out.writeByte('1'); out.writeByte('D'); out.writeInt(1)
      out.writeInt(2) // two pairs
      def pair(k: String, v: String): Unit = {
        val kb = k.getBytes("UTF-8"); val vb = v.getBytes("UTF-8")
        out.writeInt(kb.length); out.write(kb)
        out.writeInt(vb.length); out.write(vb)
      }
      pair("line", "beat line"); pair("source", "/var/log/x")
      out.flush()
      assert(in.readByte() == '1' && in.readByte() == 'A' && in.readInt() == 1)
      q.processAllAvailable()
      val rows = spark.sql("SELECT message FROM ls_v1").collect()
        .map(_.getString(0))
      assert(rows.toSet ==
        Set("""{"line":"beat line","source":"/var/log/x"}"""))
      sock.close(); q.stop()
    } finally src.stop()
  }

  test("fluent + logstash wire up from YAML configs") {
    val work = java.nio.file.Files.createTempDirectory("agw").toString
    val running = graft.plans.ConfigLoader.run(spark,
      """
        |sources:
        |  agents: {type: fluent, address: "0.0.0.0:0"}
        |sinks:
        |  out: {type: memory, inputs: [agents]}
        |""".stripMargin, "/root/testdata/sf0.001", work)
    try {
      val port = graft.plans.ConfigLoader.lastAgentPort
      val (sock, out, _) = fluentClient(port)
      MsgPack.write(out, MpArray(Vector(
        MpString("t"), MpLong(1700000000L), rec("message" -> "via yaml"))))
      out.flush(); sock.close()
      running.processAllAvailable()
      val got = spark.sql("SELECT message FROM out").collect()
        .map(_.getString(0))
      assert(got.contains("""{"message":"via yaml"}"""))
    } finally running.stopAll()
  }
}
