package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** The from-scratch gRPC-over-h2c transport: unary echo, error status,
  * multi-call reuse — the wire mechanics under the vector gRPC pair.
  */
class GrpcSpec extends AnyFunSuite {

  test("vector gRPC pair: yaml sink pushes, yaml source receives") {
    val spark = graft.Graft.session(4)
    val tmp = java.nio.file.Files.createTempDirectory("grpcwork").toString
    // receive side: vector source in grpc mode
    val running = graft.plans.ConfigLoader.run(spark,
      """
        |sources:
        |  agg:
        |    type: vector
        |    transport: grpc
        |    address: 127.0.0.1:0
        |sinks:
        |  sink_mem:
        |    type: memory
        |    inputs: [agg]
        |""".stripMargin, "/root/testdata/sf0.001", tmp)
    try {
      val port = graft.plans.ConfigLoader.lastAgentPort
      // send side: a batch topology with a grpc vector sink
      val tmp2 = java.nio.file.Files.createTempDirectory("grpcwork2").toString
      graft.plans.ConfigLoader.run(spark,
        s"""
          |sources:
          |  in:
          |    type: parquet
          |    table: events
          |transforms:
          |  few:
          |    type: filter
          |    inputs: [in]
          |    condition: .event_id < 5
          |sinks:
          |  out:
          |    type: vector
          |    transport: grpc
          |    inputs: [few]
          |    address: 127.0.0.1:$port
          |""".stripMargin, "/root/testdata/sf0.001", tmp2)
      val deadline = System.currentTimeMillis() + 30000
      var rows = Array.empty[org.apache.spark.sql.Row]
      while (rows.length < 5 && System.currentTimeMillis() < deadline) {
        Thread.sleep(100)
        running.processAllAvailable()
        rows = spark.table("sink_mem").collect()
      }
      assert(rows.length == 5, rows.length)
      val r = rows.head
      assert(r.getAs[String]("__event_kind") == "log")
      val m = graft.functions.JsonLite.parse(r.getAs[String]("message"))
        .asInstanceOf[java.util.Map[String, Any]]
      assert(m.containsKey("event_type") && m.containsKey("event_id"))
    } finally running.stopAll()
  }

  test("OTLP/gRPC: LogsService Export lands in the opentelemetry source") {
    val spark = graft.Graft.session(4)
    val src = graft.streaming.StreamRunner.otlpHttp(spark, 0, Some(0))
    try {
      // build an ExportLogsServiceRequest with the repo's own encoder
      import org.apache.spark.sql.Row
      import graft.codecs.ProtobufCodec
      def sRow(schema: ProtobufCodec.ProtoSchema, vals: Any*): Row =
        new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
          vals.toArray, schema.sparkType)
      val lrS = ProtobufCodec.Otlp.LogRecord
      val lr = sRow(lrS, 1700000000000000000L, 9L, "ERROR",
        sRow(ProtobufCodec.Otlp.AnyValue, "grpc-hello"), 0L,
        Array.emptyByteArray, Array.emptyByteArray, 0L)
      val env = sRow(ProtobufCodec.Otlp.ExportLogsServiceRequest,
        Seq(sRow(ProtobufCodec.Otlp.ResourceLogs,
          Seq(sRow(ProtobufCodec.Otlp.ScopeLogs, Seq(lr), "")), "")))
      val req = ProtobufCodec.encodeTo(
        ProtobufCodec.Otlp.ExportLogsServiceRequest, env)
      val resp = Grpc.call("127.0.0.1", src.grpcBoundPort.get,
        "/opentelemetry.proto.collector.logs.v1.LogsService/Export", req)
      assert(resp.isEmpty) // empty ExportLogsServiceResponse
      val q = src.df.writeStream.format("memory").queryName("otlpg").start()
      q.processAllAvailable()
      val rows = spark.table("otlpg").collect()
      q.stop()
      assert(rows.length == 1)
      assert(rows.head.getAs[String]("message") == "grpc-hello")
      assert(rows.head.getAs[String]("severity_text") == "ERROR")
    } finally src.stop()
  }

  test("otlp sink protocol grpc exports into the otlp grpc source") {
    val spark = graft.Graft.session(4)
    val src = graft.streaming.StreamRunner.otlpHttp(spark, 0, Some(0))
    try {
      val df = {
        import spark.implicits._
        Seq(("one", "WARN"), ("two", "ERROR"))
          .toDF("message", "severity_text")
          .withColumn("timestamp",
            org.apache.spark.sql.functions.lit("2024-03-05T10:00:00Z")
              .cast("timestamp"))
      }
      graft.sinks.OtlpSink.write(df.coalesce(1), graft.sinks.OtlpSink.Config(
        s"http://127.0.0.1:${src.grpcBoundPort.get}", grpc = true))
      val q = src.df.writeStream.format("memory").queryName("otlpg2").start()
      q.processAllAvailable()
      val rows = spark.table("otlpg2")
        .orderBy("message").collect()
      q.stop()
      assert(rows.map(_.getAs[String]("message")).toSeq == Seq("one", "two"))
      assert(rows.head.getAs[String]("severity_text") == "WARN")
    } finally src.stop()
  }

  test("unary call roundtrips request bytes and surfaces the path") {
    val seen = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val srv = new Grpc.Server(0, (path, req) => {
      seen.add(path)
      ("echo:" + new String(req, "UTF-8")).getBytes("UTF-8")
    })
    try {
      val resp = Grpc.call("127.0.0.1", srv.boundPort,
        "/vector.Vector/PushEvents", "hello".getBytes("UTF-8"))
      assert(new String(resp, "UTF-8") == "echo:hello")
      assert(seen.size == 1 && seen.get(0) == "/vector.Vector/PushEvents")
    } finally srv.stop()
  }

  test("handler failure surfaces as a non-zero grpc-status") {
    val srv = new Grpc.Server(0,
      (_, _) => throw new RuntimeException("boom"))
    try {
      val e = intercept[Exception] {
        Grpc.call("127.0.0.1", srv.boundPort, "/x/Y", Array[Byte](1))
      }
      assert(e.getMessage.contains("grpc-status 2") ||
        e.getCause != null && e.getCause.getMessage.contains("grpc-status 2"),
        e.toString)
    } finally srv.stop()
  }

  test("large frames (>16 KiB h2 DATA) survive") {
    val srv = new Grpc.Server(0, (_, req) => req)
    try {
      val big = Array.tabulate[Byte](200000)(i => (i % 251).toByte)
      val resp = Grpc.call("127.0.0.1", srv.boundPort, "/big/Echo", big)
      assert(java.util.Arrays.equals(resp, big))
    } finally srv.stop()
  }
}
