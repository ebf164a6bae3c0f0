package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec

class InternalObsSpec extends SparkSpec {
  import spark.implicits._

  test("ProgressListener turns micro-batch progress into component counters") {
    implicit val sq = spark.sqlContext
    val reg = new InternalObs.Registry
    val listener = new InternalObs.ProgressListener(reg)
    spark.streams.addListener(listener)
    try {
      val mem = MemoryStream[Long]
      mem.addData(1L to 25L: _*)
      val q = mem.toDS().map(_ * 2).writeStream
        .format("noop").queryName("obs_probe")
        .outputMode(OutputMode.Append)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      q.stop()
      // listener events are async; poll until processed
      val deadline = System.currentTimeMillis() + 20000
      def received(): Double = reg.snapshot("vector", Map.empty,
          new java.sql.Timestamp(0))
        .filter(r => r.name == "component_received_events_total" &&
          r.tags.get("component_id").contains("obs_probe"))
        .flatMap(_.counter_value).sum
      while (received() < 25.0 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(received() == 25.0)
      val sent = reg.snapshot("vector", Map.empty, new java.sql.Timestamp(0))
        .filter(r => r.name == "component_sent_events_total")
        .flatMap(_.counter_value).sum
      assert(sent == 25.0)
    } finally spark.streams.removeListener(listener)
  }

  test("internal_metrics source scrapes the registry into a metric stream") {
    val reg = new InternalObs.Registry
    reg.counter("component_errors_total", Map("component_id" -> "x"), 3.0)
    reg.gauge("buffer_events", Map("component_id" -> "x"), 7.0)
    val src = new InternalObs.InternalMetricsSource(spark,
      namespace = "vector", hostKey = "host", pidKey = Some("pid"), reg = reg)
    src.scrapeOnce()
    val q = src.df.writeStream.format("memory").queryName("im_out")
      .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    q.stop()
    val rows = spark.table("im_out").collect()
    val byName = rows.map(r => r.getAs[String]("name") -> r).toMap
    assert(byName.contains("uptime_seconds"))
    val errs = byName("component_errors_total")
    assert(errs.getAs[String]("namespace") == "vector")
    assert(errs.getAs[Double]("counter_value") == 3.0)
    assert(errs.getAs[String]("kind") == "absolute")
    val tags = errs.getAs[Map[String, String]]("tags")
    assert(tags("component_id") == "x")
    assert(tags.contains("host") && tags.contains("pid"))
    assert(byName("buffer_events").getAs[Double]("gauge_value") == 7.0)
  }

  test("internal_logs captures process log records with host and pid") {
    val src = InternalObs.internalLogs(spark)
    src.start()
    try {
      val log = org.apache.logging.log4j.LogManager
        .getLogger("graft.internal.probe")
      log.error("graft-internal-logs-probe-message")
      val q = src.df.writeStream.format("memory").queryName("il_out")
        .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      q.stop()
      val rows = spark.table("il_out")
        .filter($"message" === "graft-internal-logs-probe-message").collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[String]("level") == "ERROR")
      assert(rows(0).getAs[String]("target") == "graft.internal.probe")
      assert(rows(0).getAs[String]("host").nonEmpty)
      assert(rows(0).getAs[Long]("pid") > 0L)
    } finally src.stop()
  }

  test("prometheus exporter accumulates incremental counters and serves exposition") {
    val exp = new InternalObs.PrometheusExporter()
    try {
      val batch = Seq(
        ("requests_total", "vector", Map("c" -> "a"), "incremental", "counter",
          Some(2.0), Option.empty[Double], Option.empty[Seq[String]]),
        ("requests_total", "vector", Map("c" -> "a"), "incremental", "counter",
          Some(3.0), None, None),
        ("queue_depth", null, Map.empty[String, String], "absolute", "gauge",
          None, Some(42.0), None),
        ("users", null, Map.empty[String, String], "incremental", "set",
          None, None, Some(Seq("u1", "u2"))),
        ("users", null, Map.empty[String, String], "incremental", "set",
          None, None, Some(Seq("u2", "u3"))))
        .toDF("name", "namespace", "tags", "kind", "value_type",
          "counter_value", "gauge_value", "set_values")
      exp.update(batch)
      val url = s"http://127.0.0.1:${exp.boundPort}/metrics"
      val body = new String(new java.net.URL(url).openStream().readAllBytes())
      assert(body.contains("# TYPE vector_requests_total counter"))
      assert(body.contains("vector_requests_total{c=\"a\"} 5"))
      assert(body.contains("queue_depth 42"))
      assert(body.contains("users 3")) // set cardinality as gauge
      // absolute counter overwrites instead of accumulating
      exp.update(Seq(("requests_total", "vector", Map("c" -> "a"), "absolute",
        "counter", Some(10.0), Option.empty[Double], Option.empty[Seq[String]]))
        .toDF("name", "namespace", "tags", "kind", "value_type",
          "counter_value", "gauge_value", "set_values"))
      val body2 = new String(new java.net.URL(url).openStream().readAllBytes())
      assert(body2.contains("vector_requests_total{c=\"a\"} 10"))
    } finally exp.stop()
  }

  test("prometheus exporter serves distributions as histograms") {
    val exp = new InternalObs.PrometheusExporter(0, buckets = Seq(1.0, 5.0))
    try {
      import spark.implicits._
      val dist = Seq(
        ("lat", "vector", Map("c" -> "a"), "incremental", "distribution",
          Option.empty[Double], Option.empty[Double],
          Option.empty[Seq[String]],
          Some(Seq((0.5, 2L), (3.0, 1L), (9.0, 1L))))
      ).toDF("name", "namespace", "tags", "kind", "value_type",
        "counter_value", "gauge_value", "set_values", "dist_samples")
      exp.update(dist)
      val url = s"http://127.0.0.1:${exp.boundPort}/metrics"
      val body = new String(new java.net.URL(url).openStream().readAllBytes())
      assert(body.contains("# TYPE vector_lat histogram"), body)
      assert(body.contains("vector_lat_bucket{c=\"a\",le=\"1.0\"} 2"), body)
      assert(body.contains("vector_lat_bucket{c=\"a\",le=\"5.0\"} 3"), body)
      assert(body.contains("vector_lat_bucket{c=\"a\",le=\"+Inf\"} 4"), body)
      assert(body.contains("vector_lat_sum{c=\"a\"} 13.0"), body)
      assert(body.contains("vector_lat_count{c=\"a\"} 4"), body)
      // incremental accumulation across batches
      exp.update(dist)
      val body2 = new String(new java.net.URL(url).openStream().readAllBytes())
      assert(body2.contains("vector_lat_count{c=\"a\"} 8"), body2)
    } finally exp.stop()
  }

  test("prometheus exporter serves agent sketches as summaries") {
    import graft.model.AgentSketch
    val exp = new InternalObs.PrometheusExporter(0)
    try {
      import spark.implicits._
      // dd-intake-shaped flat sketch lanes: 2 samples at 1.0 + 2 at 3.0
      val sk = Seq(
        ("lat", "vector", Map("svc" -> "web"), "incremental", "sketch",
          4L, 1.0, 3.0, 8.0,
          Seq(AgentSketch.key(1.0).toLong, AgentSketch.key(3.0).toLong),
          Seq(2L, 2L))
      ).toDF("name", "namespace", "tags", "kind", "value_type",
        "sketch_cnt", "sketch_min", "sketch_max", "sketch_sum",
        "sketch_k", "sketch_n")
      exp.update(sk)
      val url = s"http://127.0.0.1:${exp.boundPort}/metrics"
      val body = new String(new java.net.URL(url).openStream().readAllBytes())
      assert(body.contains("# TYPE vector_lat summary"), body)
      // the served quantiles are the agent sketch's interpolating walk
      val ks = Seq(AgentSketch.key(1.0).toLong, AgentSketch.key(3.0).toLong)
      def f(v: Double): String =
        if (v == v.floor) v.toLong.toString else v.toString
      val q50 = AgentSketch.quantile(ks, Seq(2L, 2L), 4L, 1.0, 3.0, 0.5).get
      val q99 = AgentSketch.quantile(ks, Seq(2L, 2L), 4L, 1.0, 3.0, 0.99).get
      assert(body.contains(
        s"""vector_lat{svc="web",quantile="0.5"} ${f(q50)}"""), body)
      assert(body.contains(
        s"""vector_lat{svc="web",quantile="0.99"} ${f(q99)}"""), body)
      assert(body.contains("vector_lat_sum{svc=\"web\"} 8.0"), body)
      assert(body.contains("vector_lat_count{svc=\"web\"} 4"), body)
      // sketches merge implicitly-incrementally across scrapes
      exp.update(sk)
      val body2 = new String(new java.net.URL(url).openStream().readAllBytes())
      assert(body2.contains("vector_lat_count{svc=\"web\"} 8"), body2)
      assert(body2.contains("vector_lat_sum{svc=\"web\"} 16.0"), body2)
    } finally exp.stop()
  }

  test("prometheus exporter serves aggregated summaries with quantiles") {
    val exp = new InternalObs.PrometheusExporter(0)
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions.{col, struct, transform}
      val sm = Seq(
        ("rt", "vector", Map[String, String](), "absolute", "summary",
          Seq((0.5, 12.0), (0.99, 40.0)), 7L, 99.5)
      ).toDF("name", "namespace", "tags", "kind", "value_type",
        "raw_quantiles", "stat_count", "stat_sum")
        .withColumn("summary_quantiles", transform(col("raw_quantiles"),
          q => struct(q.getField("_1").as("quantile"),
            q.getField("_2").as("value"))))
        .drop("raw_quantiles")
      exp.update(sm)
      val url = s"http://127.0.0.1:${exp.boundPort}/metrics"
      val body = new String(new java.net.URL(url).openStream().readAllBytes())
      assert(body.contains("# TYPE vector_rt summary"), body)
      assert(body.contains("""vector_rt{quantile="0.5"} 12"""), body)
      assert(body.contains("""vector_rt{quantile="0.99"} 40"""), body)
      assert(body.contains("vector_rt_sum 99.5"), body)
      assert(body.contains("vector_rt_count 7"), body)
    } finally exp.stop()
  }

  test("expire_metrics_secs drops idle series from snapshots") {
    val reg = new InternalObs.Registry
    reg.expireSecs = Some(0.05)
    reg.counter("will_expire_total", Map("t" -> "1"), 1.0)
    reg.gauge("fresh_gauge", Map.empty, 2.0)
    Thread.sleep(120)
    reg.gauge("fresh_gauge", Map.empty, 3.0) // refreshed — survives
    val now = new java.sql.Timestamp(0L)
    val names = reg.snapshot("vector", Map.empty, now).map(_.name)
    assert(!names.contains("will_expire_total"), names)
    assert(names.contains("fresh_gauge"))
    // a later update resurrects the series (fresh state again)
    reg.counter("will_expire_total", Map("t" -> "1"), 1.0)
    assert(reg.snapshot("vector", Map.empty, now).map(_.name)
      .contains("will_expire_total"))
  }
}
