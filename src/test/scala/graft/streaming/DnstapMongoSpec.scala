package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Row

/** dnstap over a real frame-streams handshake and mongodb_metrics over
  * a mini OP_MSG server.
  */
class DnstapMongoSpec extends SparkSpec {

  test("dnstap source: fstrm handshake, data frame → parsed message") {
    val src = DnstapMongo.dnstap(spark)
    try {
      val q = src.df.writeStream.format("memory").queryName("dnq").start()
      // client side of the handshake
      val sock = new java.net.Socket("127.0.0.1", src.boundPort)
      val out = new java.io.DataOutputStream(
        new java.io.BufferedOutputStream(sock.getOutputStream))
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(sock.getInputStream))
      def control(ctype: Int, ct: Option[String]): Unit = {
        val body = new java.io.ByteArrayOutputStream()
        val d = new java.io.DataOutputStream(body)
        d.writeInt(ctype)
        ct.foreach { c =>
          d.writeInt(0x01); d.writeInt(c.length); d.write(c.getBytes("UTF-8"))
        }
        out.writeInt(0); out.writeInt(body.size); body.writeTo(out)
        out.flush()
      }
      control(0x04, Some(DnstapMongo.ContentType)) // READY
      // expect ACCEPT control frame back
      assert(in.readInt() == 0)
      val clen = in.readInt()
      val cbody = new Array[Byte](clen); in.readFully(cbody)
      assert(java.nio.ByteBuffer.wrap(cbody).getInt == 0x01)
      control(0x02, Some(DnstapMongo.ContentType)) // START
      // dnstap protobuf: Message{type=5 ClientQuery? (odd=query),
      // socket_family=1} wrapped in Dnstap{message(14), type(15)=1}
      val dnsHex = "123481800001000000000000" +
        "076578616d706c6503636f6d0000010001"
      val dns = dnsHex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      val inner = Array[Byte](0x08, 5, 0x10, 1, 0x52, dns.length.toByte) ++ dns
      val frame = Array[Byte](0x72, inner.length.toByte) ++ inner ++
        Array[Byte](0x78, 1)
      out.writeInt(frame.length); out.write(frame); out.flush()
      control(0x03, None) // STOP
      // expect FINISH back
      assert(in.readInt() == 0)
      val flen = in.readInt()
      val fbody = new Array[Byte](flen); in.readFully(fbody)
      assert(java.nio.ByteBuffer.wrap(fbody).getInt == 0x05)
      sock.close()
      val deadline = System.currentTimeMillis() + 25000
      var rows = Array.empty[Row]
      while (rows.isEmpty && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        rows = spark.sql("SELECT dnstap FROM dnq WHERE dnstap IS NOT NULL")
          .collect().map(_.getAs[Row]("dnstap"))
      }
      assert(rows.nonEmpty)
      val dt = rows.head
      assert(dt.getAs[String]("dataType") == "Message")
      assert(dt.getAs[String]("socketFamily") == "INET")
      assert(dt.getAs[Row]("requestData")
        .getSeq[Row](1).head.getAs[String]("domainName") == "example.com")
      q.stop()
    } finally src.stop()
  }

  test("mongodb_metrics source: serverStatus over OP_MSG") {
    import graft.codecs.Bson
    val server = new java.net.ServerSocket(0)
    val t = new Thread(() => {
      try while (true) {
        val sock = server.accept()
        val in = new java.io.DataInputStream(
          new java.io.BufferedInputStream(sock.getInputStream))
        val out = new java.io.BufferedOutputStream(sock.getOutputStream)
        val req = Bson.readOpMsg(in)
        assert(req.get("serverStatus") == 1L)
        assert(req.get("$db") == "admin")
        out.write(Bson.opMsg(2, Seq(
          "uptime" -> 3600.0,
          "asserts" -> Seq("regular" -> 1, "warning" -> 2),
          "connections" -> Seq("current" -> 5, "available" -> 95),
          "opcounters" -> Seq("insert" -> 10L, "query" -> 20L),
          "mem" -> Seq("resident" -> 128, "virtual" -> 512),
          "ok" -> 1.0)))
        out.flush()
        sock.close()
      } catch { case _: Exception => () }
    })
    t.setDaemon(true); t.start()
    try {
      val src = DnstapMongo.mongodbMetrics(spark,
        s"mongodb://127.0.0.1:${server.getLocalPort}")
      try {
        assert(src.scrapeOnce() == 10)
        val q = src.df.writeStream.format("memory").queryName("mgq").start()
        q.processAllAvailable()
        val rows = spark.sql("SELECT name, kind, value, tags FROM mgq")
          .collect().map(r => (r.getString(0), r.getString(1),
            r.getDouble(2), r.getString(3))).toSet
        assert(rows.contains(("uptime_seconds", "counter", 3600.0, "")))
        assert(rows.contains(("asserts_total", "counter", 2.0, "type=warning")))
        assert(rows.contains(("connections", "counter", 5.0, "state=current")))
        assert(rows.contains(("opcounters_total", "counter", 10.0, "type=insert")))
        assert(rows.contains(("memory", "gauge", 128.0, "type=resident")))
        assert(rows.contains(("up", "gauge", 1.0, "")))
        q.stop()
      } finally src.stop()
    } finally server.close()
  }
}
