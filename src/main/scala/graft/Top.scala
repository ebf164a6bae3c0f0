package graft

import org.apache.spark.sql.SparkSession

/** `vector top` equivalent: render a live per-component
  * event-throughput table on an interval.
  *
  * Two modes, matching the reference (src/top/ attaches to a RUNNING
  * instance over its API):
  *  - `--url http://host:port` — poll a running `graft.Run` instance's
  *    `api:` endpoint (/api/components) and render its totals/rates;
  *  - `--config pipeline.yaml` — run the topology in-process and read
  *    the registry directly (the standalone convenience mode).
  *
  * Usage: graft.Top --url http://127.0.0.1:8686 | --config pipeline.yaml
  *        [--sf-dir DIR] [--interval SECS] [--duration SECS]
  */
object Top {

  /** One /api/components poll → (id, kind, type, received, sent). */
  private[graft] def fetchComponents(url: String)
      : Seq[(String, String, String, Long, Long)] = {
    val conn = new java.net.URI(url.stripSuffix("/") + "/api/components")
      .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(5000)
    val body = try new String(conn.getInputStream.readAllBytes(), "UTF-8")
    finally conn.disconnect()
    val arr = graft.functions.JsonLite.parse(body)
      .asInstanceOf[java.util.List[Any]]
    import scala.jdk.CollectionConverters._
    arr.asScala.toSeq.map { o =>
      val m = o.asInstanceOf[java.util.Map[String, Any]]
      def s(k: String) = String.valueOf(m.get(k))
      def l(k: String) = Option(m.get(k))
        .map(_.asInstanceOf[Number].longValue).getOrElse(0L)
      (s("componentId"), s("componentKind"), s("componentType"),
        l("receivedEventsTotal"), l("sentEventsTotal"))
    }
  }

  def main(args: Array[String]): Unit = {
    def flag(name: String): Option[String] =
      args.sliding(2).collectFirst { case Array(k, v) if k == s"--$name" => v }
    flag("url").foreach { url =>
      val intervalSecs = flag("interval").map(_.toDouble).getOrElse(2.0)
      val duration = flag("duration").map(_.toDouble)
      var prev = Map.empty[(String, Boolean), Long]
      val t0 = System.nanoTime()
      while (duration.forall(d => (System.nanoTime() - t0) / 1e9 < d)) {
        Thread.sleep((intervalSecs * 1000).toLong)
        val comps = fetchComponents(url)
        println(f"${Console.BOLD}${"COMPONENT"}%-24s${"KIND"}%-10s" +
          f"${"TYPE"}%-24s${"IN"}%12s${"OUT"}%12s${"RATE/S"}%12s" +
          s"${Console.RESET}")
        comps.foreach { case (id, kind, tpe, recv, sent) =>
          val rate =
            (sent - prev.getOrElse((id, false), 0L)) / intervalSecs
          prev += (id, false) -> sent
          println(f"${id.take(23)}%-24s$kind%-10s${tpe.take(23)}%-24s" +
            f"$recv%12d$sent%12d$rate%12.1f")
        }
        println()
      }
      return
    }
    val config = flag("config").getOrElse(
      sys.error("usage: graft.Top --url <api-url> | --config <yaml> " +
        "[--sf-dir DIR] [--interval SECS] [--duration SECS]"))
    val sfDir = flag("sf-dir").getOrElse("/root/testdata/sf0.001")
    val workDir = java.nio.file.Files.createTempDirectory("graft-top").toString
    val intervalSecs = flag("interval").map(_.toDouble).getOrElse(2.0)
    val duration = flag("duration").map(_.toDouble)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val reg = new streaming.InternalObs.Registry
    spark.streams.addListener(new streaming.InternalObs.ProgressListener(reg))
    val yaml = plans.ConfigLoader.readConfigFile(config)
    val running = plans.ConfigLoader.run(spark, yaml, sfDir, workDir)

    // totals from the previous tick, for rate = delta / interval
    var prev = Map.empty[(String, String), Double]
    val t0 = System.nanoTime()
    def secondsLeft: Boolean =
      duration.forall(d => (System.nanoTime() - t0) / 1e9 < d)
    try {
      while (secondsLeft) {
        Thread.sleep((intervalSecs * 1000).toLong)
        running.pollTails()
        val counters = reg
          .snapshot("vector", Map.empty,
            new java.sql.Timestamp(System.currentTimeMillis()))
          .filter(r => r.name == "component_received_events_total" ||
            r.name == "component_sent_events_total")
        val rows = counters.map { r =>
          val id = r.tags.getOrElse("component_id", "?")
          val kind = r.tags.getOrElse("component_kind", "?")
          val tpe = r.tags.getOrElse("component_type", "")
          val total = r.counter_value.getOrElse(0.0)
          val key = (id, r.name)
          val rate = (total - prev.getOrElse(key, 0.0)) / intervalSecs
          prev += key -> total
          (id, kind, tpe, r.name.contains("received"), total, rate)
        }
        println(f"${Console.BOLD}%s${"COMPONENT"}%-24s${"KIND"}%-8s" +
          f"${"TYPE"}%-28s${"DIR"}%-6s${"EVENTS"}%12s${"RATE/S"}%12s" +
          s"${Console.RESET}")
        rows.sortBy(r => (r._1, !r._4)).foreach {
          case (id, kind, tpe, recv, total, rate) =>
            println(f"${id.take(23)}%-24s$kind%-8s${tpe.take(27)}%-28s" +
              f"${if (recv) "in" else "out"}%-6s${total.toLong}%12d$rate%12.1f")
        }
        println()
      }
    } finally {
      running.stopAll()
      spark.stop()
    }
  }
}
