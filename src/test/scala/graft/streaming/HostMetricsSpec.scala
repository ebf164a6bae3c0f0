package graft.streaming

import graft.SparkSpec

class HostMetricsSpec extends SparkSpec {

  test("collectors read live system telemetry") {
    val rows = HostMetrics.collect(HostMetrics.AllCollectors, "host")
    val byName = rows.groupBy(_.name)
    assert(byName("memory_total_bytes").head.gauge_value.get > 0)
    assert(byName("load1").head.gauge_value.get >= 0)
    assert(byName("uptime").head.gauge_value.get > 0)
    // cpu: cumulative seconds per mode, mode tag present
    val cpu = byName("cpu_seconds_total")
    assert(cpu.map(_.tags("mode")).toSet.contains("user"))
    assert(cpu.forall(_.kind == "absolute"))
    assert(cpu.forall(_.counter_value.get >= 0))
    // network: per-device counters
    val net = byName.get("network_receive_bytes_total")
    assert(net.exists(_.forall(_.tags.contains("device"))))
    // filesystem: at least one real store with total >= used
    val fsT = byName("filesystem_total_bytes")
    assert(fsT.head.tags.contains("mountpoint"))
    assert(fsT.head.gauge_value.get > 0)
    assert(rows.forall(_.namespace == "host"))
  }

  test("unknown collector errors out") {
    intercept[IllegalArgumentException] {
      HostMetrics.collect(Seq("gpu"), "host")
    }
  }

  test("static_metrics emits the configured constants each scrape") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val src = HostMetrics.staticMetrics(spark, Seq(
      HostMetrics.StaticMetric("build_info", "gauge", 1.0,
        tags = Map("version" -> "1.0")),
      HostMetrics.StaticMetric("quota", "counter", 100.0)))
    src.scrapeOnce()
    src.scrapeOnce()
    val q = src.df.writeStream.format("memory").queryName("sm_out")
      .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    q.stop()
    val rows = spark.table("sm_out").collect()
    assert(rows.length == 4) // 2 metrics x 2 scrapes
    val bi = rows.filter(_.getAs[String]("name") == "build_info")
    assert(bi.forall(_.getAs[String]("namespace") == "static"))
    assert(bi.forall(_.getAs[Double]("gauge_value") == 1.0))
    assert(bi.forall(r =>
      r.getAs[Map[String, String]]("tags")("version") == "1.0"))
    val quota = rows.filter(_.getAs[String]("name") == "quota")
    assert(quota.forall(_.getAs[Double]("counter_value") == 100.0))
  }
}
