package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The prometheus push-model sources and the OTLP sink, each verified
  * as a cross-component round trip through this engine's OWN opposite
  * end: remote_write sink → remote_write source, OTLP sink → the OTLP
  * HTTP source server, pushgateway via a raw exposition POST.
  */
class OtlpPromSpec extends SparkSpec {
  import spark.implicits._

  private def metrics = Seq(
    ("requests_total", 5.0, Map("az" -> "a")),
    ("cpu_pct", 0.75, Map("az" -> "b")))
    .toDF("name", "value", "tags")
    .withColumn("ts", lit("2024-03-05T10:00:00Z").cast("timestamp"))

  test("remote_write sink → remote_write source round trip") {
    val src = PromPushSources.remoteWrite(spark)
    try {
      val q = src.df.writeStream.format("memory").queryName("rwq").start()
      graft.sinks.NetworkSinks.writeProtoSnappy(
        graft.sinks.Envelopes.remoteWriteSeries(metrics),
        graft.sinks.NetworkSinks.HttpConfig(
          s"http://localhost:${src.boundPort}/api/v1/write",
          contentType = "application/x-protobuf"))
      val deadline = System.currentTimeMillis() + 25000
      var got = Set.empty[(String, String, Double, Long)]
      while (got.size < 2 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        got = spark.sql("SELECT name, tags, value, timestamp_ms FROM rwq")
          .collect().map(r => (r.getString(0), r.getString(1),
            r.getDouble(2), r.getLong(3))).toSet
      }
      assert(got == Set(
        ("requests_total", "az=a", 5.0, 1709632800000L),
        ("cpu_pct", "az=b", 0.75, 1709632800000L)))
      q.stop()
    } finally src.stop()
  }

  test("pushgateway source: grouping labels from the path win") {
    val src = PromPushSources.pushgateway(spark)
    try {
      val q = src.df.writeStream.format("memory").queryName("pgwq").start()
      val conn = new java.net.URI(
        s"http://localhost:${src.boundPort}/metrics/job/batch_a/instance/i1")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST"); conn.setDoOutput(true)
      conn.getOutputStream.write(
        ("# TYPE jobs_done counter\n" +
          "jobs_done{instance=\"ignored\",shard=\"s1\"} 42\n" +
          "queue_depth 7\n").getBytes("UTF-8"))
      conn.getOutputStream.close()
      assert(conn.getResponseCode == 200)
      val deadline = System.currentTimeMillis() + 25000
      var got = Set.empty[(String, String, Double)]
      while (got.size < 2 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        got = spark.sql("SELECT name, tags, value FROM pgwq").collect()
          .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
      }
      assert(got == Set(
        ("jobs_done", "instance=i1,job=batch_a,shard=s1", 42.0),
        ("queue_depth", "instance=i1,job=batch_a", 7.0)))
      q.stop()
    } finally src.stop()
  }

  test("opentelemetry sink → opentelemetry source: logs round trip") {
    val otlp = StreamRunner.otlpHttp(spark)
    try {
      val q = otlp.df.writeStream.format("memory").queryName("otq").start()
      val logs = Seq(("alpha", "info"), ("beta", "error"))
        .toDF("message", "level")
        .withColumn("timestamp", lit("2024-03-05T10:00:00Z").cast("timestamp"))
      graft.sinks.OtlpSink.write(logs.coalesce(1), graft.sinks.OtlpSink.Config(
        s"http://localhost:${otlp.boundPort}"))
      val deadline = System.currentTimeMillis() + 25000
      var got = Set.empty[(String, String)]
      while (got.size < 2 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        got = spark.sql("SELECT message, severity_text FROM otq").collect()
          .map(r => (r.getString(0), r.getString(1))).toSet
      }
      assert(got == Set(("alpha", "INFO"), ("beta", "ERROR")))
      q.stop()
    } finally otlp.stop()
  }

  test("opentelemetry sink → opentelemetry source: metrics round trip") {
    val otlp = StreamRunner.otlpHttp(spark)
    try {
      val q = otlp.dfMetrics.writeStream.format("memory")
        .queryName("otmq").start()
      val m = Seq(("reqs", "incremental", 5.0), ("cpu", "absolute", 0.5))
        .toDF("name", "kind", "value")
        .withColumn("ts", lit("2024-03-05T10:00:00Z").cast("timestamp"))
      graft.sinks.OtlpSink.write(m.coalesce(1), graft.sinks.OtlpSink.Config(
        s"http://localhost:${otlp.boundPort}", mode = "metrics"))
      val deadline = System.currentTimeMillis() + 25000
      var got = Set.empty[(String, Double)]
      while (got.size < 2 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        got = spark.sql(
          "SELECT name, coalesce(counter_value, gauge_value) FROM otmq")
          .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      }
      assert(got == Set(("reqs", 5.0), ("cpu", 0.5)))
      q.stop()
    } finally otlp.stop()
  }
}
