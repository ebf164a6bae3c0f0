package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

import InternalObs.MetricRow

/** `host_metrics` and `static_metrics` sources.
  *
  * Reference: src/sources/host_metrics/ (collect system metrics on an
  * interval — cpu/load/memory/filesystem/network/host collectors, each
  * a family of gauge/counter series with device/mode tags, namespace
  * "host") and src/sources/static_metrics.rs (emit a configured list of
  * constant metrics every interval, namespace "static").
  *
  * The collectors read /proc and java.nio FileStores — no native
  * dependency. On a cluster these run on the DRIVER host (like the
  * reference's single-process view); per-executor hardware telemetry is
  * Spark's own metrics system's job.
  */
object HostMetrics {

  /** A MemoryStream metric source fed by `collect()` on an interval —
    * the shared shape of the three registry-style sources
    * (internal_metrics has its own, carrying the Registry).
    */
  final class TickerMetricsSource(spark: SparkSession,
                                  intervalSecs: Double,
                                  collect: () => Seq[MetricRow])
      extends InternalObs.Scraper {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    private val mem = MemoryStream[MetricRow]
    @volatile private var running = false
    def scrapeOnce(): Unit = {
      val rows = collect()
      if (rows.nonEmpty) mem.addData(rows)
    }
    private val thread = new Thread(() => {
      while (running) {
        try scrapeOnce() catch { case _: Exception => () }
        Thread.sleep((intervalSecs * 1000).toLong.max(10L))
      }
    }, "metrics-ticker")
    thread.setDaemon(true)
    def startScraping(): Unit = { running = true; thread.start() }
    def df: DataFrame = mem.toDF()
    def stop(): Unit = running = false
  }

  private def now(): Timestamp = new Timestamp(System.currentTimeMillis())

  private def gauge(ns: String, name: String, v: Double,
                    tags: Map[String, String] = Map.empty): MetricRow =
    MetricRow(name, ns, tags, now(), "absolute", "gauge", None, Some(v))
  private def counter(ns: String, name: String, v: Double,
                      tags: Map[String, String] = Map.empty): MetricRow =
    MetricRow(name, ns, tags, now(), "absolute", "counter", Some(v), None)

  private def procLines(path: String): Seq[String] =
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(path)).asScala.toSeq
    } catch { case _: Exception => Nil }

  /** loadavg collector (host_metrics/mod.rs `loadavg`): load1/5/15. */
  def loadavg(ns: String): Seq[MetricRow] =
    procLines("/proc/loadavg").headOption.toSeq.flatMap { l =>
      val p = l.trim.split("\\s+")
      if (p.length < 3) Nil
      else Seq(gauge(ns, "load1", p(0).toDouble),
        gauge(ns, "load5", p(1).toDouble),
        gauge(ns, "load15", p(2).toDouble))
    }

  /** cpu collector (host_metrics/cpu.rs): cumulative cpu_seconds_total
    * per mode, summed over cpus (mode tag; USER_HZ=100 ticks).
    */
  def cpu(ns: String): Seq[MetricRow] =
    procLines("/proc/stat").filter(_.startsWith("cpu ")).flatMap { l =>
      val p = l.trim.split("\\s+")
      val modes = Seq("user", "nice", "system", "idle", "iowait", "irq",
        "softirq", "steal")
      modes.zipWithIndex.flatMap { case (mode, i) =>
        if (p.length > i + 1)
          Some(counter(ns, "cpu_seconds_total", p(i + 1).toDouble / 100.0,
            Map("mode" -> mode)))
        else None
      }
    } :+ gauge(ns, "logical_cpus",
      Runtime.getRuntime.availableProcessors().toDouble)

  /** memory collector (host_metrics/memory.rs): *_bytes gauges. */
  def memory(ns: String): Seq[MetricRow] = {
    val want = Map("MemTotal" -> "memory_total_bytes",
      "MemFree" -> "memory_free_bytes",
      "MemAvailable" -> "memory_available_bytes",
      "Buffers" -> "memory_buffers_bytes",
      "Cached" -> "memory_cached_bytes",
      "SwapTotal" -> "memory_swap_total_bytes",
      "SwapFree" -> "memory_swap_free_bytes")
    procLines("/proc/meminfo").flatMap { l =>
      val p = l.split(":\\s+")
      if (p.length < 2) None
      else want.get(p(0)).map { name =>
        val kb = p(1).trim.split("\\s+")(0).toDouble
        gauge(ns, name, kb * 1024)
      }
    }
  }

  /** filesystem collector (host_metrics/filesystem.rs): total/free/used
    * per mounted store, tagged with filesystem + mountpoint.
    */
  def filesystem(ns: String): Seq[MetricRow] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.FileSystems.getDefault.getFileStores.asScala.toSeq
      .flatMap { fs =>
        try {
          val total = fs.getTotalSpace.toDouble
          if (total <= 0) Nil
          else {
            val tags = Map("filesystem" -> fs.`type`(),
              "mountpoint" -> fs.toString.takeWhile(_ != '(').trim)
            Seq(gauge(ns, "filesystem_total_bytes", total, tags),
              gauge(ns, "filesystem_free_bytes",
                fs.getUnallocatedSpace.toDouble, tags),
              gauge(ns, "filesystem_used_bytes",
                total - fs.getUnallocatedSpace.toDouble, tags))
          }
        } catch { case _: Exception => Nil }
      }
  }

  /** network collector (host_metrics/network.rs): cumulative rx/tx
    * byte/packet/error counters per device.
    */
  def network(ns: String): Seq[MetricRow] =
    procLines("/proc/net/dev").drop(2).flatMap { l =>
      val p = l.trim.split("[:\\s]+")
      if (p.length < 12) Nil
      else {
        val tags = Map("device" -> p(0))
        Seq(
          counter(ns, "network_receive_bytes_total", p(1).toDouble, tags),
          counter(ns, "network_receive_packets_total", p(2).toDouble, tags),
          counter(ns, "network_receive_errs_total", p(3).toDouble, tags),
          counter(ns, "network_transmit_bytes_total", p(9).toDouble, tags),
          counter(ns, "network_transmit_packets_total", p(10).toDouble, tags),
          counter(ns, "network_transmit_errs_total", p(11).toDouble, tags))
      }
    }

  /** host collector (host_metrics/mod.rs `host`): uptime + boot_time. */
  def host(ns: String): Seq[MetricRow] =
    procLines("/proc/uptime").headOption.toSeq.flatMap { l =>
      val up = l.trim.split("\\s+")(0).toDouble
      Seq(gauge(ns, "uptime", up),
        gauge(ns, "boot_time", System.currentTimeMillis() / 1000.0 - up))
    }

  val AllCollectors: Seq[String] =
    Seq("cpu", "load", "memory", "filesystem", "network", "host")

  def collect(collectors: Seq[String], namespace: String): Seq[MetricRow] =
    collectors.flatMap {
      case "cpu" => cpu(namespace)
      case "load" => loadavg(namespace)
      case "memory" => memory(namespace)
      case "filesystem" => filesystem(namespace)
      case "network" => network(namespace)
      case "host" => host(namespace)
      case other =>
        throw new IllegalArgumentException(s"unknown collector: $other")
    }

  /** `host_metrics` source (default namespace "host",
    * scrape_interval_secs default 15 per the reference).
    */
  def hostMetrics(spark: SparkSession, intervalSecs: Double = 15.0,
                  collectors: Seq[String] = AllCollectors,
                  namespace: String = "host"): TickerMetricsSource =
    new TickerMetricsSource(spark, intervalSecs,
      () => collect(collectors, namespace))

  /** One configured static metric (static_metrics.rs
    * StaticMetricConfig: name, kind, gauge-or-counter value, tags).
    */
  final case class StaticMetric(name: String, valueType: String,
                                value: Double, kind: String = "absolute",
                                tags: Map[String, String] = Map.empty)

  /** `static_metrics` source (default namespace "static", interval 1s). */
  def staticMetrics(spark: SparkSession, metrics: Seq[StaticMetric],
                    intervalSecs: Double = 1.0,
                    namespace: String = "static"): TickerMetricsSource =
    new TickerMetricsSource(spark, intervalSecs, () => metrics.map { m =>
      MetricRow(m.name, namespace, m.tags, now(), m.kind, m.valueType,
        if (m.valueType == "counter") Some(m.value) else None,
        if (m.valueType == "gauge") Some(m.value) else None)
    })
}
