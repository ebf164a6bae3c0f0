package graft.streaming

import java.sql.Timestamp

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Self-observability: the reference's `internal_metrics` /
  * `internal_logs` sources and the instance metric registry behind them.
  *
  * Reference: src/sources/internal_metrics.rs (scrape the process metric
  * registry every `scrape_interval_secs`, emit Metric events with
  * namespace "vector" + host/pid tags), src/sources/internal_logs.rs
  * (subscribe to the process trace stream, emit LogEvents with
  * host/pid), and the component events those scrape
  * (`component_received_events_total`, `component_sent_events_total`, …).
  *
  * Spark-first shape: component counters come from the engine itself —
  * a [[StreamingQueryListener]] translates every micro-batch progress
  * into per-component received/sent counters on the DRIVER (listener
  * callbacks are driver-side), so the registry needs no distributed
  * state; the scrape emits through a MemoryStream, which Spark
  * distributes like any other source. That is exactly the reference's
  * topology (an in-process registry polled on an interval) with
  * Spark's progress events standing in for tokio internal events.
  */
object InternalObs {

  /** One scraped metric row (subset of model.Metrics.schema — the sparse
    * union families beyond counter/gauge are never self-emitted).
    */
  final case class MetricRow(name: String, namespace: String,
                             tags: Map[String, String], ts: Timestamp,
                             kind: String, value_type: String,
                             counter_value: Option[Double],
                             gauge_value: Option[Double])

  /** One captured internal log event (internal_logs.rs output shape:
    * message + metadata fields + host/pid).
    */
  final case class LogRow(message: String, level: String, target: String,
                          timestamp: Timestamp, host: String,
                          pid: Option[Long])

  /** Driver-side metric registry: cumulative counters + last-write
    * gauges, keyed by (name, sorted tags). The reference's
    * `metrics::Controller` equivalent.
    */
  final class Registry {
    private val counters = TrieMap.empty[(String, Seq[(String, String)]), Double]
    private val gauges = TrieMap.empty[(String, Seq[(String, String)]), Double]
    private val t0 = System.nanoTime()

    /** `expire_metrics_secs` global (global_options.rs:146 /
      * metrics/recorder.rs recency): series idle longer than this drop
      * from snapshots and from the store. None = never expire.
      */
    @volatile var expireSecs: Option[Double] = None
    private val lastUpdate =
      TrieMap.empty[(String, Seq[(String, String)]), Long]

    def counter(name: String, tags: Map[String, String], by: Double): Unit = {
      val k = (name, tags.toSeq.sortBy(_._1))
      counters.updateWith(k) { prev => Some(prev.getOrElse(0.0) + by) }
      lastUpdate(k) = System.nanoTime()
    }
    def gauge(name: String, tags: Map[String, String], v: Double): Unit = {
      val k = (name, tags.toSeq.sortBy(_._1))
      gauges(k) = v
      lastUpdate(k) = System.nanoTime()
    }

    private def fresh(k: (String, Seq[(String, String)])): Boolean =
      expireSecs match {
        case None => true
        case Some(limit) =>
          val last = lastUpdate.getOrElse(k, 0L)
          if ((System.nanoTime() - last) / 1e9 <= limit) true
          else {
            counters.remove(k); gauges.remove(k); lastUpdate.remove(k)
            false
          }
      }

    def uptimeSeconds: Double = (System.nanoTime() - t0) / 1e9

    /** Snapshot as metric rows. Counters are cumulative-absolute (the
      * reference emits registry counters with their cumulative value;
      * `incremental_to_absolute` downstream is then the identity).
      */
    def snapshot(namespace: String, extraTags: Map[String, String],
                 now: Timestamp): Seq[MetricRow] = {
      val c = counters.readOnlySnapshot().toSeq
        .filter { case (k, _) => fresh(k) }
        .map { case ((n, t), v) =>
          MetricRow(n, namespace, t.toMap ++ extraTags, now, "absolute",
            "counter", Some(v), None)
        }
      val g = gauges.readOnlySnapshot().toSeq
        .filter { case (k, _) => fresh(k) }
        .map { case ((n, t), v) =>
          MetricRow(n, namespace, t.toMap ++ extraTags, now, "absolute",
            "gauge", None, Some(v))
        }
      val up = MetricRow("uptime_seconds", namespace, extraTags, now,
        "absolute", "gauge", None, Some(uptimeSeconds))
      (c ++ g :+ up).sortBy(r => (r.name, r.tags.toSeq.sortBy(_._1).mkString))
    }
  }

  /** The default in-process registry (one per driver JVM, like the
    * reference's global `metrics::Controller`).
    */
  val registry: Registry = new Registry

  /** Translate micro-batch progress into the reference's component
    * events: per-source `component_received_events_total`, per-sink
    * `component_sent_events_total`, batch runtime into `utilization`-ish
    * gauges. Attach once per session: `spark.streams.addListener(...)`.
    */
  final class ProgressListener(reg: Registry = registry)
      extends StreamingQueryListener {
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val id = Option(p.name).getOrElse(p.id.toString)
      p.sources.foreach { s =>
        reg.counter("component_received_events_total",
          Map("component_id" -> id, "component_kind" -> "source",
            "component_type" -> s.description.takeWhile(_ != '[').trim),
          s.numInputRows.toDouble)
      }
      reg.counter("component_sent_events_total",
        Map("component_id" -> id, "component_kind" -> "sink",
          "component_type" -> p.sink.description.takeWhile(_ != '[').trim),
        p.sink.numOutputRows.max(0L).toDouble)
      Option(p.durationMs.get("triggerExecution")).foreach(ms =>
        reg.gauge("trigger_execution_ms", Map("component_id" -> id),
          ms.toDouble))
      reg.gauge("events_per_second", Map("component_id" -> id),
        p.processedRowsPerSecond match {
          case d if d.isNaN || d.isInfinite => 0.0
          case d => d
        })
    }
  }

  /** Interval-scraping metric sources (internal_metrics, host_metrics,
    * static_metrics) share this lifecycle; the config runner starts the
    * ticker and the deterministic test path calls scrapeOnce().
    */
  trait Scraper {
    def scrapeOnce(): Unit
    def startScraping(): Unit
    def stop(): Unit
  }

  /** `internal_metrics` source: scrape [[Registry]] every
    * `intervalSecs`, emit metric rows. `scrapeOnce()` is the
    * deterministic test/batch hook (internal_metrics.rs scrape loop).
    */
  final class InternalMetricsSource(spark: SparkSession,
                                    intervalSecs: Double = 1.0,
                                    namespace: String = "vector",
                                    hostKey: String = "host",
                                    pidKey: Option[String] = None,
                                    reg: Registry = registry)
      extends Scraper {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    private val mem = MemoryStream[MetricRow]
    @volatile private var running = false

    private def extraTags: Map[String, String] = {
      val host =
        if (hostKey.isEmpty) Map.empty[String, String]
        else Map(hostKey ->
          (try java.net.InetAddress.getLocalHost.getHostName
           catch { case _: Exception => "localhost" }))
      val pid = pidKey.map(k =>
        k -> ProcessHandle.current().pid().toString).toMap
      host ++ pid
    }

    def scrapeOnce(): Unit = {
      val rows = reg.snapshot(namespace, extraTags,
        new Timestamp(System.currentTimeMillis()))
      if (rows.nonEmpty) mem.addData(rows)
    }

    private val thread = new Thread(() => {
      while (running) {
        try scrapeOnce() catch { case _: Exception => () }
        Thread.sleep((intervalSecs * 1000).toLong.max(10L))
      }
    }, "internal-metrics-scrape")
    thread.setDaemon(true)
    def startScraping(): Unit = { running = true; thread.start() }
    def df: DataFrame = mem.toDF()
    def stop(): Unit = running = false
  }

  def internalMetrics(spark: SparkSession, intervalSecs: Double = 1.0,
                      namespace: String = "vector", hostKey: String = "host",
                      pidKey: Option[String] = None): InternalMetricsSource =
    new InternalMetricsSource(spark, intervalSecs, namespace, hostKey, pidKey)

  /** `internal_logs` source: a log4j2 appender on the root logger
    * captures every log record the process emits (Spark's and ours — the
    * reference taps its tracing subscriber the same way,
    * internal_logs.rs TraceSubscription) into a MemoryStream.
    */
  final class InternalLogsSource(spark: SparkSession,
                                 hostKey: String = "host",
                                 pidKey: String = "pid") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.Property
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    private val mem = MemoryStream[LogRow]
    private val host =
      try java.net.InetAddress.getLocalHost.getHostName
      catch { case _: Exception => "localhost" }

    private val appender = new AbstractAppender(
        s"graft-internal-logs-${System.identityHashCode(this)}", null, null,
        false, Property.EMPTY_ARRAY) {
      override def append(ev: org.apache.logging.log4j.core.LogEvent): Unit = {
        val row = LogRow(
          String.valueOf(ev.getMessage.getFormattedMessage),
          ev.getLevel.toString, ev.getLoggerName,
          new Timestamp(ev.getTimeMillis), host,
          if (pidKey.isEmpty) None else Some(ProcessHandle.current().pid()))
        try mem.addData(row) catch { case _: Exception => () }
      }
    }

    def start(): Unit = {
      appender.start()
      val ctx = org.apache.logging.log4j.LogManager.getContext(false)
        .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
      ctx.getConfiguration.getRootLogger.addAppender(appender, null, null)
      ctx.updateLoggers()
    }
    def stop(): Unit = {
      val ctx = org.apache.logging.log4j.LogManager.getContext(false)
        .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
      ctx.getConfiguration.getRootLogger.removeAppender(appender.getName)
      ctx.updateLoggers()
      appender.stop()
    }
    def df: DataFrame = {
      val base = mem.toDF()
      val withPid =
        if (pidKey.isEmpty) base.drop("pid")
        else if (pidKey == "pid") base
        else base.withColumnRenamed("pid", pidKey)
      if (hostKey.isEmpty) withPid.drop("host")
      else if (hostKey == "host") withPid
      else withPid.withColumnRenamed("host", hostKey)
    }
  }

  def internalLogs(spark: SparkSession, hostKey: String = "host",
                   pidKey: String = "pid"): InternalLogsSource =
    new InternalLogsSource(spark, hostKey, pidKey)

  /** `prometheus_exporter` sink (src/sinks/prometheus/exporter.rs):
    * aggregate incoming metrics into a normalized registry
    * (incremental counters accumulate, absolute overwrite; gauges last-
    * write; sets dedupe and export their cardinality as a gauge —
    * exporter.rs MetricValue::Set handling) and serve the exposition
    * text on GET `/metrics`. Entries untouched for `flushPeriodSecs`
    * expire (exporter.rs MetricMetadata expiry).
    *
    * Feed from a stream via `foreachBatch(exporter.update _)` — metric
    * streams at the exporter are post-aggregation and small, so the
    * per-batch collect is bounded (the reference holds the same map in
    * memory).
    */
  private final case class Entry(valueType: String, value: Double,
                                 set: Set[String], ts: Long,
                                 touched: Long,
                                 histBuckets: Map[Double, Long] = Map.empty,
                                 histSum: Double = 0.0,
                                 histCount: Long = 0L,
                                 // agent-sketch lanes (sketches merge
                                 // implicitly-incrementally) / summary
                                 // quantiles (absolute, last-write)
                                 skBins: Map[Long, Long] = Map.empty,
                                 skMin: Double = Double.MaxValue,
                                 skMax: Double = -Double.MaxValue,
                                 quantiles: Seq[(Double, Double)] = Nil)

  final class PrometheusExporter(port: Int = 0,
                                 suppressTimestamp: Boolean = true,
                                 flushPeriodSecs: Long = 60,
                                 // exporter.rs default_histogram_buckets
                                 buckets: Seq[Double] = Seq(0.005, 0.01,
                                   0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5,
                                   5.0, 10.0)) {
    private val entries =
      TrieMap.empty[(String, Seq[(String, String)]), Entry]

    private def sketchLane(batch: DataFrame, field: String)
        : org.apache.spark.sql.Column = {
      val structTyped = batch.schema.fields.exists(f =>
        f.name == "sketch" && f.dataType.isInstanceOf[
          org.apache.spark.sql.types.StructType])
      if (structTyped) col("sketch").getField(field)
      else if (batch.columns.contains(s"sketch_$field"))
        col(s"sketch_$field")
      else lit(null)
    }

    def update(batch: DataFrame, batchId: Long = 0L): Unit = {
      val cols = batch.columns.toSet
      def opt(n: String) =
        if (cols(n)) col(n) else lit(null).cast("string")
      val rows = batch.select(
        col("name"),
        opt("namespace").as("namespace"),
        (if (cols("tags")) col("tags")
         else lit(null).cast("map<string,string>")).as("tags"),
        (if (cols("kind")) col("kind") else lit("absolute")).as("kind"),
        (if (cols("value_type")) col("value_type")
         else lit("gauge")).as("value_type"),
        (if (cols("counter_value")) col("counter_value").cast("double")
         else lit(null).cast("double")).as("counter_value"),
        (if (cols("gauge_value")) col("gauge_value").cast("double")
         else lit(null).cast("double")).as("gauge_value"),
        (if (cols("set_values")) col("set_values")
         else lit(null).cast("array<string>")).as("set_values"),
        (if (cols("ts")) col("ts").cast("long")
         else lit(null).cast("long")).as("ts_s"),
        (if (cols("dist_samples")) col("dist_samples")
         else lit(null).cast("array<struct<value:double,rate:bigint>>"))
          .as("dist_samples"),
        // agent-sketch lanes: the dd intake's flat sketch_* columns or
        // a struct-typed `sketch` column
        sketchLane(batch, "cnt").cast("long").as("sk_cnt"),
        sketchLane(batch, "min").cast("double").as("sk_min"),
        sketchLane(batch, "max").cast("double").as("sk_max"),
        sketchLane(batch, "sum").cast("double").as("sk_sum"),
        sketchLane(batch, "k").cast("array<long>").as("sk_k"),
        sketchLane(batch, "n").cast("array<long>").as("sk_n"),
        (if (cols("summary_quantiles")) col("summary_quantiles")
         else lit(null)
           .cast("array<struct<quantile:double,value:double>>"))
          .as("summary_quantiles"),
        (if (cols("stat_count")) col("stat_count").cast("long")
         else lit(null).cast("long")).as("stat_count"),
        (if (cols("stat_sum")) col("stat_sum").cast("double")
         else lit(null).cast("double")).as("stat_sum")).collect()
      val now = System.currentTimeMillis()
      rows.foreach { r =>
        val name = (Option(r.getString(1)).filter(_.nonEmpty).map(_ + "_")
          .getOrElse("")) + r.getString(0)
        val tags = Option(r.getMap[String, String](2))
          .map(_.toSeq.sortBy(_._1)).getOrElse(Nil)
        val kind = r.getString(3)
        val vt = r.getString(4)
        val ts = if (r.isNullAt(8)) now else r.getLong(8) * 1000
        val k = (name, tags)
        vt match {
          case "counter" =>
            val v = if (r.isNullAt(5)) 0.0 else r.getDouble(5)
            entries.updateWith(k) {
              case Some(e) if kind == "incremental" =>
                Some(e.copy(value = e.value + v, ts = ts, touched = now))
              case _ => Some(Entry("counter", v, Set.empty, ts, now))
            }
          case "gauge" =>
            val v = if (r.isNullAt(6)) 0.0 else r.getDouble(6)
            entries.updateWith(k) {
              case Some(e) if kind == "incremental" =>
                Some(e.copy(value = e.value + v, ts = ts, touched = now))
              case _ => Some(Entry("gauge", v, Set.empty, ts, now))
            }
          case "set" =>
            val vs = if (r.isNullAt(7)) Set.empty[String]
              else r.getSeq[String](7).toSet
            entries.updateWith(k) {
              case Some(e) if kind == "incremental" =>
                Some(e.copy(set = e.set ++ vs, ts = ts, touched = now))
              case _ => Some(Entry("set", 0.0, vs, ts, now))
            }
          case "distribution" =>
            // bucket the samples into the configured histogram bounds
            // (exporter.rs distributions → histogram exposition)
            val samples =
              if (r.isNullAt(9)) Seq.empty
              else r.getSeq[org.apache.spark.sql.Row](9)
            val add = scala.collection.mutable.Map[Double, Long]()
              .withDefaultValue(0L)
            var addSum = 0.0
            var addCount = 0L
            samples.foreach { srow =>
              val v = srow.getDouble(0)
              val rate = srow.getLong(1)
              buckets.find(v <= _).foreach(b => add(b) += rate)
              addSum += v * rate
              addCount += rate
            }
            entries.updateWith(k) {
              case Some(e) if kind == "incremental" =>
                val merged = (e.histBuckets.keySet ++ add.keySet).map(b =>
                  b -> (e.histBuckets.getOrElse(b, 0L) + add(b))).toMap
                Some(e.copy(histBuckets = merged,
                  histSum = e.histSum + addSum,
                  histCount = e.histCount + addCount, ts = ts,
                  touched = now))
              case _ => Some(Entry("histogram", 0.0, Set.empty, ts, now,
                add.toMap, addSum, addCount))
            }
          case "sketch" =>
            // AgentDDSketch rows serve as a summary with interpolated
            // quantiles (collector.rs:184-216); sketches are
            // implicitly incremental so bins/count/sum merge and
            // min/max widen (normalizer: Sketch → into_incremental)
            if (!r.isNullAt(10)) {
              val cnt = r.getLong(10)
              val mn = if (r.isNullAt(11)) Double.MaxValue else r.getDouble(11)
              val mx = if (r.isNullAt(12)) -Double.MaxValue else r.getDouble(12)
              val sm = if (r.isNullAt(13)) 0.0 else r.getDouble(13)
              val ks = if (r.isNullAt(14)) Seq.empty[Long]
                else r.getSeq[Long](14)
              val ns = if (r.isNullAt(15)) Seq.empty[Long]
                else r.getSeq[Long](15)
              val add = ks.zip(ns).toMap
              entries.updateWith(k) {
                case Some(e) if e.valueType == "sketch" =>
                  Some(e.copy(
                    skBins = (e.skBins.keySet ++ add.keySet).map(b =>
                      b -> (e.skBins.getOrElse(b, 0L) +
                        add.getOrElse(b, 0L))).toMap,
                    skMin = math.min(e.skMin, mn),
                    skMax = math.max(e.skMax, mx),
                    histSum = e.histSum + sm,
                    histCount = e.histCount + cnt,
                    ts = ts, touched = now))
                case _ => Some(Entry("sketch", 0.0, Set.empty, ts, now,
                  histSum = sm, histCount = cnt, skBins = add,
                  skMin = mn, skMax = mx))
              }
            }
          case "summary" =>
            // AggregatedSummary quantile/sum/count exposition
            // (collector.rs:166-183); summaries can't merge —
            // last-write, like the reference's absolute normalization
            val qs =
              if (r.isNullAt(16)) Nil
              else r.getSeq[org.apache.spark.sql.Row](16).map(q =>
                (q.getDouble(0), q.getDouble(1))).toSeq
            val cnt = if (r.isNullAt(17)) 0L else r.getLong(17)
            val sm = if (r.isNullAt(18)) 0.0 else r.getDouble(18)
            entries.update(k, Entry("summary", 0.0, Set.empty, ts, now,
              histSum = sm, histCount = cnt, quantiles = qs))
          case _ =>
        }
      }
    }

    /** Exposition text (exporter.rs encode loop; `# TYPE` per family,
      * stable name/tag order so scrapes are deterministic).
      */
    def render(): String = {
      val now = System.currentTimeMillis()
      val dead = entries.readOnlySnapshot().collect {
        case (k, e) if now - e.touched > flushPeriodSecs * 1000 => k
      }
      dead.foreach(entries.remove)
      val sb = new StringBuilder
      val byName = entries.readOnlySnapshot().toSeq
        .groupBy(_._1._1).toSeq.sortBy(_._1)
      byName.foreach { case (name, es) =>
        val promType = es.head._2.valueType match {
          case "counter" => "counter"
          case "histogram" => "histogram"
          // Sketch serves as a summary (prometheus_metric_type,
          // collector.rs:425-440)
          case "sketch" | "summary" => "summary"
          case _ => "gauge"
        }
        sb.append(s"# TYPE $name $promType\n")
        es.sortBy(_._1._2.mkString).foreach { case ((_, tags), e) =>
          def lblOf(extra: Seq[(String, String)]): String = {
            val all = tags ++ extra
            if (all.isEmpty) ""
            else all.map { case (k, v) =>
              s"""$k="${v.replace("\\", "\\\\").replace("\"", "\\\"")}""""
            }.mkString("{", ",", "}")
          }
          val tsSuffix = if (suppressTimestamp) "" else s" ${e.ts}"
          def fmt(v: Double): String =
            if (v == v.floor && !v.isInfinite) v.toLong.toString
            else v.toString
          if (e.valueType == "histogram") {
            // cumulative le-buckets + _sum/_count (prometheus histogram
            // exposition)
            var cum = 0L
            buckets.foreach { b =>
              cum += e.histBuckets.getOrElse(b, 0L)
              sb.append(s"${name}_bucket${lblOf(Seq("le" -> b.toString))}" +
                s" $cum$tsSuffix\n")
            }
            sb.append(s"${name}_bucket${lblOf(Seq("le" -> "+Inf"))}" +
              s" ${e.histCount}$tsSuffix\n")
            sb.append(s"${name}_sum${lblOf(Nil)} ${e.histSum}$tsSuffix\n")
            sb.append(s"${name}_count${lblOf(Nil)} ${e.histCount}$tsSuffix\n")
          } else if (e.valueType == "sketch") {
            // default_summary_quantiles (prometheus/mod.rs:45-47) over
            // the agent sketch's interpolating quantile; 0.0 when the
            // sketch can't answer (collector.rs:186-190 unwrap_or)
            val ks = e.skBins.keys.toSeq.sorted
            val ns = ks.map(e.skBins)
            Seq(0.5, 0.75, 0.9, 0.95, 0.99).foreach { q =>
              val v = graft.model.AgentSketch
                .quantile(ks, ns, e.histCount, e.skMin, e.skMax, q)
                .getOrElse(0.0)
              sb.append(s"$name${lblOf(Seq("quantile" -> q.toString))}" +
                s" ${fmt(v)}$tsSuffix\n")
            }
            sb.append(s"${name}_sum${lblOf(Nil)} ${e.histSum}$tsSuffix\n")
            sb.append(s"${name}_count${lblOf(Nil)} ${e.histCount}$tsSuffix\n")
          } else if (e.valueType == "summary") {
            e.quantiles.foreach { case (q, v) =>
              sb.append(s"$name${lblOf(Seq("quantile" -> q.toString))}" +
                s" ${fmt(v)}$tsSuffix\n")
            }
            sb.append(s"${name}_sum${lblOf(Nil)} ${e.histSum}$tsSuffix\n")
            sb.append(s"${name}_count${lblOf(Nil)} ${e.histCount}$tsSuffix\n")
          } else {
            val v = e.valueType match {
              case "set" => e.set.size.toDouble
              case _ => e.value
            }
            val vs = if (v == v.floor && !v.isInfinite) v.toLong.toString
              else v.toString
            sb.append(s"$name${lblOf(Nil)} $vs$tsSuffix\n")
          }
        }
      }
      sb.toString
    }

    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(port), 0)
    server.createContext("/metrics", ex => {
      try {
        val body = render().getBytes("UTF-8")
        ex.getResponseHeaders.add("Content-Type",
          "text/plain; version=0.0.4")
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
      } finally ex.close()
    })
    server.setExecutor(null)
    server.start()
    def boundPort: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }
}
