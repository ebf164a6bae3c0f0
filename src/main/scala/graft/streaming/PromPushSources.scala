package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Prometheus push-model server sources:
  *
  *  - `prometheus_remote_write` (src/sources/prometheus/remote_write.rs)
  *    — hosts the remote-write endpoint: snappy-compressed prompb
  *    WriteRequest bodies decoded by the engine's own proto wire walker
  *    (the same prompb schemas the remote-write SINK builds), one metric
  *    row per sample with labels split into __name__ + tags.
  *  - `prometheus_pushgateway` (src/sources/prometheus/pushgateway.rs)
  *    — hosts `POST|PUT /metrics/job/<job>[/<label>/<value>]*` accepting
  *    exposition text; grouping labels from the path merge into each
  *    sample's labels (path wins, like the pushgateway).
  */
object PromPushSources {

  final class RemoteWriteSource(spark: SparkSession, port: Int = 0) {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // (name, tags sorted "k=v,...", value, timestamp_ms)
    private val mem = MemoryStream[(String, String, Double, Long)]
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(port), 0)

    server.createContext("/", { ex =>
      try {
        val raw = ex.getRequestBody.readAllBytes()
        val body = org.xerial.snappy.Snappy.uncompress(raw)
        // decodeTo returns schema-less Rows — access by field POSITION
        // in the prompb schemas (WriteRequest.timeseries /
        // TimeSeries.{labels,samples} / Label.{name,value} /
        // Sample.{value,timestamp})
        val req = graft.codecs.ProtobufCodec.decodeTo(
          graft.sinks.Envelopes.PromWriteRequest, body)
        type R = org.apache.spark.sql.Row
        val tsList = req.get(0).asInstanceOf[scala.collection.Seq[R]]
        if (tsList != null) tsList.foreach { series =>
          val labels = Option(series.get(0)
            .asInstanceOf[scala.collection.Seq[R]]).getOrElse(Nil)
            .map(l => String.valueOf(l.get(0)) -> String.valueOf(l.get(1)))
          val name = labels.collectFirst {
            case ("__name__", v) => v }.getOrElse("")
          val tags = labels.filterNot(_._1 == "__name__").sortBy(_._1)
            .map { case (k, v) => s"$k=$v" }.mkString(",")
          Option(series.get(1).asInstanceOf[scala.collection.Seq[R]])
            .getOrElse(Nil).foreach { s =>
              val v = Option(s.get(0).asInstanceOf[java.lang.Double])
                .map(_.doubleValue).getOrElse(0.0)
              val t = Option(s.get(1).asInstanceOf[java.lang.Long])
                .map(_.longValue).getOrElse(0L)
              mem.addData((name, tags, v, t))
            }
        }
        ex.sendResponseHeaders(200, -1)
      } catch {
        case e: Exception =>
          org.slf4j.LoggerFactory.getLogger(getClass)
            .warn(s"remote_write decode failed: $e")
          ex.sendResponseHeaders(400, -1)
      } finally ex.close()
    })
    server.setExecutor(null)
    server.start()

    def boundPort: Int = server.getAddress.getPort
    def df: DataFrame = {
      val d = mem.toDF()
      d.select(d("_1").as("name"), d("_2").as("tags"),
        d("_3").as("value"), d("_4").as("timestamp_ms"))
    }
    def stop(): Unit = server.stop(0)
  }

  final class PushgatewaySource(spark: SparkSession, port: Int = 0) {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // (name, tags sorted "k=v,...", value)
    private val mem = MemoryStream[(String, String, Double)]
    private val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(port), 0)

    // exposition line: name{l1="v1",...} value [ts]
    private val Line =
      """([a-zA-Z_:][a-zA-Z0-9_:]*)(\{[^}]*\})?\s+([^\s]+)(\s+\d+)?\s*""".r
    private val Label = """([a-zA-Z_][a-zA-Z0-9_]*)="([^"]*)"""".r

    server.createContext("/metrics/", { ex =>
      try {
        // /metrics/job/<job>[/<label>/<value>]* → grouping labels
        val segs = ex.getRequestURI.getPath.stripPrefix("/metrics/")
          .split("/").toSeq
        val grouping = segs.grouped(2).collect {
          case Seq(k, v) => k -> java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        body.split("\n").map(_.trim)
          .filter(l => l.nonEmpty && !l.startsWith("#")).foreach {
            case Line(name, labelsRaw, value, _) =>
              val sample = Option(labelsRaw).toSeq.flatMap(Label.findAllMatchIn)
                .map(m => m.group(1) -> m.group(2)).toMap
              // pushgateway semantics: grouping labels from the path win
              val merged = (sample ++ grouping).toSeq.sortBy(_._1)
                .map { case (k, v) => s"$k=$v" }.mkString(",")
              value.toDoubleOption.foreach(v => mem.addData((name, merged, v)))
            case _ => ()
          }
        ex.sendResponseHeaders(200, -1)
      } catch {
        case _: Exception => ex.sendResponseHeaders(400, -1)
      } finally ex.close()
    })
    server.setExecutor(null)
    server.start()

    def boundPort: Int = server.getAddress.getPort
    def df: DataFrame = {
      val d = mem.toDF()
      d.select(d("_1").as("name"), d("_2").as("tags"), d("_3").as("value"))
    }
    def stop(): Unit = server.stop(0)
  }

  def remoteWrite(spark: SparkSession, port: Int = 0): RemoteWriteSource =
    new RemoteWriteSource(spark, port)
  def pushgateway(spark: SparkSession, port: Int = 0): PushgatewaySource =
    new PushgatewaySource(spark, port)
}
