package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.JsonLite

/** Service-metric poll sources — each scrapes a service's public status
  * surface on an interval and emits metric-shaped rows
  * (namespace, name, kind, value, tags…):
  *
  *  - `apache_metrics` (src/sources/apache_metrics/) — mod_status
  *    `?auto` text (parser.rs names: access_total, sent_bytes_total,
  *    uptime_seconds_total, workers busy/idle, up).
  *  - `nginx_metrics` (src/sources/nginx_metrics/) — stub_status text
  *    (mod.rs:203-242 names).
  *  - `eventstoredb_metrics` (src/sources/eventstoredb_metrics/) —
  *    `/stats` JSON (types.rs names: process_memory_used_bytes,
  *    disk_read_bytes_total, disk_written_bytes_total…).
  *  - `postgresql_metrics` (src/sources/postgresql_metrics.rs) —
  *    `SELECT * FROM pg_stat_database` over the v3 wire protocol
  *    (codecs/Pg.scala); numeric columns become
  *    `pg_stat_database_{col}` counters/gauges tagged with the db name.
  *
  * All share one shape: `scrapeOnce()` for deterministic tests, a
  * daemon interval thread for production, MemoryStream feed.
  */
object PollerSources {

  private def httpGet(url: String): String = {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    new String(conn.getInputStream.readAllBytes(), "UTF-8")
  }

  /** Common base: a (name, kind, value, tags-json) metric feed. */
  abstract class MetricPoller(spark: SparkSession, namespace: String,
                              intervalSecs: Int) {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    private val mem = MemoryStream[(String, String, Double, String)]
    @volatile private var running = true

    protected def emit(name: String, kind: String, value: Double,
                       tags: Map[String, String] = Map.empty): Unit =
      mem.addData((name, kind, value,
        tags.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
          .mkString(",")))

    /** One scrape; returns #metrics emitted. Emits `up` 0/1 itself. */
    def scrapeOnce(): Int

    private val thread = new Thread(() => {
      while (running) {
        try scrapeOnce()
        catch { case _: Exception => () }
        Thread.sleep(intervalSecs * 1000L)
      }
    }, s"$namespace-poller")
    thread.setDaemon(true)
    def startPolling(): Unit = thread.start()

    def df: DataFrame = {
      val d = mem.toDF()
      d.select(org.apache.spark.sql.functions.lit(namespace).as("namespace"),
        d("_1").as("name"), d("_2").as("kind"), d("_3").as("value"),
        d("_4").as("tags"))
    }
    def stop(): Unit = running = false
  }

  // ---- apache_metrics ----

  final class ApacheMetrics(spark: SparkSession, endpoint: String,
                            namespace: String = "apache",
                            intervalSecs: Int = 15)
      extends MetricPoller(spark, namespace, intervalSecs) {
    def scrapeOnce(): Int = {
      try {
        val text = httpGet(endpoint)
        var n = 1
        emit("up", "gauge", 1.0)
        text.split("\n").foreach { line =>
          val Array(k, v @ _*) = line.split(":", 2).map(_.trim): @unchecked
          val value = v.headOption.flatMap(_.toDoubleOption)
          (k, value) match {
            case ("Total Accesses", Some(x)) =>
              emit("access_total", "counter", x); n += 1
            case ("Total kBytes", Some(x)) =>
              emit("sent_bytes_total", "counter", x * 1024); n += 1
            case ("Uptime", Some(x)) =>
              emit("uptime_seconds_total", "counter", x); n += 1
            case ("Total Duration", Some(x)) =>
              emit("duration_seconds_total", "counter", x / 1000.0); n += 1
            case ("BusyWorkers", Some(x)) =>
              emit("workers", "gauge", x, Map("state" -> "busy")); n += 1
            case ("IdleWorkers", Some(x)) =>
              emit("workers", "gauge", x, Map("state" -> "idle")); n += 1
            case _ => ()
          }
        }
        n
      } catch {
        case e: Exception => emit("up", "gauge", 0.0); throw e
      }
    }
  }

  // ---- nginx_metrics ----

  final class NginxMetrics(spark: SparkSession, endpoint: String,
                           namespace: String = "nginx",
                           intervalSecs: Int = 15)
      extends MetricPoller(spark, namespace, intervalSecs) {
    // stub_status: "Active connections: N \nserver accepts handled
    // requests\n A H R \nReading: r Writing: w Waiting: q \n"
    private val Pat =
      ("""(?s)Active connections: (\d+) \nserver accepts handled""" +
        """ requests\n (\d+) (\d+) (\d+) \nReading: (\d+) Writing:""" +
        """ (\d+) Waiting: (\d+)""").r
    def scrapeOnce(): Int = {
      try {
        val text = httpGet(endpoint)
        Pat.findFirstMatchIn(text) match {
          case Some(g) =>
            emit("up", "gauge", 1.0)
            emit("connections_active", "gauge", g.group(1).toDouble)
            emit("connections_accepted_total", "counter", g.group(2).toDouble)
            emit("connections_handled_total", "counter", g.group(3).toDouble)
            emit("http_requests_total", "counter", g.group(4).toDouble)
            emit("connections_reading", "gauge", g.group(5).toDouble)
            emit("connections_writing", "gauge", g.group(6).toDouble)
            emit("connections_waiting", "gauge", g.group(7).toDouble)
            8
          case None =>
            emit("up", "gauge", 0.0); 1
        }
      } catch {
        case e: Exception => emit("up", "gauge", 0.0); throw e
      }
    }
  }

  // ---- eventstoredb_metrics ----

  final class EventstoreMetrics(spark: SparkSession, endpoint: String,
                                namespace: String = "eventstoredb",
                                intervalSecs: Int = 15)
      extends MetricPoller(spark, namespace, intervalSecs) {
    def scrapeOnce(): Int = {
      import scala.jdk.CollectionConverters._
      val body = httpGet(endpoint.stripSuffix("/") + "/stats")
      val root = JsonLite.parse(body)
        .asInstanceOf[java.util.Map[String, Any]].asScala
      val proc = root.getOrElse("proc", new java.util.HashMap[String, Any]())
        .asInstanceOf[java.util.Map[String, Any]].asScala
      var n = 0
      def num(m: scala.collection.Map[String, Any], k: String): Option[Double] =
        m.get(k).collect { case x: Number => x.doubleValue }
      def gauge(name: String, v: Option[Double]): Unit =
        v.foreach { x => emit(name, "gauge", x); n += 1 }
      def counter(name: String, v: Option[Double]): Unit =
        v.foreach { x => emit(name, "counter", x); n += 1 }
      gauge("process_memory_used_bytes", num(proc, "mem"))
      gauge("process_cpu", num(proc, "cpu"))
      proc.get("diskIo").collect { case d: java.util.Map[_, _] =>
        val io = d.asInstanceOf[java.util.Map[String, Any]].asScala
        counter("disk_read_bytes_total", num(io, "readBytes"))
        counter("disk_written_bytes_total", num(io, "writtenBytes"))
        counter("disk_read_ops_total", num(io, "readOps"))
        counter("disk_write_ops_total", num(io, "writeOps"))
      }
      n
    }
  }

  // ---- postgresql_metrics ----

  final class PostgresMetrics(spark: SparkSession, endpoint: String,
                              namespace: String = "postgresql",
                              intervalSecs: Int = 15)
      extends MetricPoller(spark, namespace, intervalSecs) {
    // the columns the reference counts vs gauges (postgresql_metrics.rs):
    // monotonic activity counts are counters, instantaneous are gauges
    private val counters = Set("xact_commit", "xact_rollback",
      "blks_read", "blks_hit", "tup_returned", "tup_fetched",
      "tup_inserted", "tup_updated", "tup_deleted", "conflicts",
      "temp_files", "temp_bytes", "deadlocks")
    def scrapeOnce(): Int = {
      val conn = graft.codecs.Pg.connect(endpoint)
      try {
        val r = conn.query("SELECT * FROM pg_stat_database")
        val datIdx = r.columns.indexOf("datname")
        var n = 0
        r.rows.foreach { row =>
          val db = if (datIdx >= 0 && row(datIdx) != null) row(datIdx) else ""
          r.columns.zip(row).foreach { case (c, v) =>
            if (c != "datname" && v != null) v.toDoubleOption.foreach { x =>
              emit(s"pg_stat_database_$c",
                if (counters.contains(c)) "counter" else "gauge",
                x, Map("db" -> db))
              n += 1
            }
          }
        }
        emit("up", "gauge", 1.0)
        n + 1
      } catch {
        case e: Exception => emit("up", "gauge", 0.0); throw e
      } finally conn.close()
    }
  }

  def apache(spark: SparkSession, endpoint: String,
             intervalSecs: Int = 15): ApacheMetrics =
    new ApacheMetrics(spark, endpoint, intervalSecs = intervalSecs)
  def nginx(spark: SparkSession, endpoint: String,
            intervalSecs: Int = 15): NginxMetrics =
    new NginxMetrics(spark, endpoint, intervalSecs = intervalSecs)
  def eventstore(spark: SparkSession, endpoint: String,
                 intervalSecs: Int = 15): EventstoreMetrics =
    new EventstoreMetrics(spark, endpoint, intervalSecs = intervalSecs)
  def postgres(spark: SparkSession, endpoint: String,
               intervalSecs: Int = 15): PostgresMetrics =
    new PostgresMetrics(spark, endpoint, intervalSecs = intervalSecs)
}
