package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.JsonLite

/** AWS-protocol poll sources:
  *
  *  - `aws_sqs` (src/sources/aws_sqs/) — long-poll ReceiveMessage in the
  *    `application/x-amz-json-1.0` protocol, emit message bodies, then
  *    DeleteMessageBatch when `delete_message` (the reference's default).
  *  - `aws_ecs_metrics` (src/sources/aws_ecs_metrics/) — poll the ECS
  *    task-metadata endpoint's `/task/stats` (docker-stats JSON per
  *    container) and emit gauge/counter metric rows, namespace
  *    `awsecs` like the reference.
  *
  * Driver-side poll loop feeding a MemoryStream (single consumer, like
  * the reference's tokio task); SQS itself load-balances competing
  * consumers across instances.
  */
object AwsSources {

  private def httpJson(url: String, target: String,
                       body: String): Any = {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/x-amz-json-1.0")
    conn.setRequestProperty("X-Amz-Target", target)
    conn.getOutputStream.write(body.getBytes("UTF-8"))
    conn.getOutputStream.close()
    val resp = new String(conn.getInputStream.readAllBytes(), "UTF-8")
    if (resp.isEmpty) Map.empty[String, Any] else JsonLite.parse(resp)
  }

  final class SqsSource(spark: SparkSession, queueUrl: String,
                        endpoint: String = "", pollSecs: Int = 15,
                        deleteMessage: Boolean = true) {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    private val mem = MemoryStream[String]
    @volatile private var running = true
    private val url = if (endpoint.nonEmpty) endpoint else queueUrl

    private val thread = new Thread(() => {
      while (running) {
        try {
          import scala.jdk.CollectionConverters._
          val resp = httpJson(url, "AmazonSQS.ReceiveMessage",
            s"""{"QueueUrl":"$queueUrl","MaxNumberOfMessages":10,""" +
              s""""WaitTimeSeconds":${math.min(pollSecs, 20)}}""")
          val msgs = resp.asInstanceOf[java.util.Map[String, Any]].asScala
            .getOrElse("Messages", new java.util.ArrayList[Any]())
            .asInstanceOf[java.util.List[Any]].asScala
            .map(_.asInstanceOf[java.util.Map[String, Any]].asScala).toSeq
          msgs.foreach(m => mem.addData(m("Body").toString))
          if (deleteMessage && msgs.nonEmpty) {
            val entries = msgs.zipWithIndex.map { case (m, i) =>
              s"""{"Id":"$i","ReceiptHandle":"${m.getOrElse(
                "ReceiptHandle", "")}"}"""
            }.mkString(",")
            httpJson(url, "AmazonSQS.DeleteMessageBatch",
              s"""{"QueueUrl":"$queueUrl","Entries":[$entries]}""")
          }
          if (msgs.isEmpty) Thread.sleep(100)
        } catch {
          case _: Exception => if (running) Thread.sleep(500)
        }
      }
    }, s"sqs-source")
    thread.setDaemon(true)
    thread.start()

    def df: DataFrame = mem.toDF().withColumnRenamed("value", "message")
    def stop(): Unit = running = false
  }

  /** `aws_s3` source (src/sources/aws_s3/mod.rs + sqs.rs): S3
    * ObjectCreated event notifications arrive on an SQS queue; each
    * record triggers a GET of the named object, whose (optionally
    * gzipped) lines become events carrying bucket/object/region
    * metadata (sqs.rs:915-934 legacy keys). The SQS message is deleted
    * only AFTER its objects ingest — the reference gates the delete on
    * event acknowledgement the same way (at-least-once).
    */
  final class S3BucketSource(spark: SparkSession, queueUrl: String,
                             sqsEndpoint: String, s3Endpoint: String,
                             pollSecs: Int = 15, region: String = "",
                             deleteMessage: Boolean = true) {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    private val mem = MemoryStream[(String, String, String, String)]
    @volatile private var running = true

    private def fetchObject(bucket: String, key: String): Seq[String] = {
      val conn = new java.net.URI(
        s"${s3Endpoint.stripSuffix("/")}/$bucket/$key")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      val raw = conn.getInputStream.readAllBytes()
      val enc = Option(conn.getHeaderField("Content-Encoding")).getOrElse("")
      val bytes =
        if (key.endsWith(".gz") || enc == "gzip")
          new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(raw)).readAllBytes()
        else raw
      new String(bytes, "UTF-8").split("\n", -1).toSeq
        .filter(_.nonEmpty)
    }

    private val thread = new Thread(() => {
      import scala.jdk.CollectionConverters._
      while (running) {
        try {
          val resp = httpJson(sqsEndpoint, "AmazonSQS.ReceiveMessage",
            s"""{"QueueUrl":"$queueUrl","MaxNumberOfMessages":10,""" +
              s""""WaitTimeSeconds":${math.min(pollSecs, 20)}}""")
          val msgs = resp.asInstanceOf[java.util.Map[String, Any]].asScala
            .getOrElse("Messages", new java.util.ArrayList[Any]())
            .asInstanceOf[java.util.List[Any]].asScala
            .map(_.asInstanceOf[java.util.Map[String, Any]].asScala).toSeq
          val done = msgs.flatMap { m =>
            val body = m("Body").toString
            // s3:TestEvent is the bucket-notification handshake ping
            if (body.contains("s3:TestEvent")) Some(m)
            else try {
              val records = JsonLite.parse(body)
                .asInstanceOf[java.util.Map[String, Any]].asScala
                .getOrElse("Records", new java.util.ArrayList[Any]())
                .asInstanceOf[java.util.List[Any]].asScala
                .map(_.asInstanceOf[java.util.Map[String, Any]].asScala)
              records.foreach { r =>
                // only ObjectCreated:* kinds ingest (sqs.rs:641)
                if (r.getOrElse("eventName", "").toString
                    .startsWith("ObjectCreated")) {
                  val reg = r.getOrElse("awsRegion", region).toString
                  val s3 = r("s3").asInstanceOf[java.util.Map[String, Any]]
                    .asScala
                  val bucket = s3("bucket")
                    .asInstanceOf[java.util.Map[String, Any]]
                    .asScala("name").toString
                  // notification keys arrive url-encoded (+ for space)
                  val key = java.net.URLDecoder.decode(
                    s3("object").asInstanceOf[java.util.Map[String, Any]]
                      .asScala("key").toString, "UTF-8")
                  fetchObject(bucket, key)
                    .foreach(line => mem.addData((line, bucket, key, reg)))
                }
              }
              Some(m)
            } catch { case _: Exception => None } // keep msg for redelivery
          }
          if (deleteMessage && done.nonEmpty) {
            val entries = done.zipWithIndex.map { case (m, i) =>
              s"""{"Id":"$i","ReceiptHandle":"${m.getOrElse(
                "ReceiptHandle", "")}"}"""
            }.mkString(",")
            httpJson(sqsEndpoint, "AmazonSQS.DeleteMessageBatch",
              s"""{"QueueUrl":"$queueUrl","Entries":[$entries]}""")
          }
          if (msgs.isEmpty) Thread.sleep(100)
        } catch {
          case _: Exception => if (running) Thread.sleep(500)
        }
      }
    }, "s3-bucket-source")
    thread.setDaemon(true)
    thread.start()

    def df: DataFrame = mem.toDF().select(
      org.apache.spark.sql.functions.col("_1").as("message"),
      org.apache.spark.sql.functions.col("_2").as("bucket"),
      org.apache.spark.sql.functions.col("_3").as("object"),
      org.apache.spark.sql.functions.col("_4").as("region"))
    def stop(): Unit = running = false
  }

  def s3(spark: SparkSession, queueUrl: String, sqsEndpoint: String,
         s3Endpoint: String, pollSecs: Int = 15, region: String = "",
         deleteMessage: Boolean = true): S3BucketSource =
    new S3BucketSource(spark, queueUrl, sqsEndpoint, s3Endpoint, pollSecs,
      region, deleteMessage)

  def sqs(spark: SparkSession, queueUrl: String, endpoint: String = "",
          pollSecs: Int = 15, deleteMessage: Boolean = true): SqsSource =
    new SqsSource(spark, queueUrl, endpoint, pollSecs, deleteMessage)

  final class EcsMetricsSource(spark: SparkSession, endpoint: String,
                               namespace: String = "awsecs",
                               intervalSecs: Int = 15) {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // (name, kind, value, container_id, container_name)
    private val mem = MemoryStream[(String, String, Double, String, String)]
    @volatile private var running = true

    def scrapeOnce(): Int = {
      val conn = new java.net.URI(endpoint.stripSuffix("/") + "/task/stats")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
      import scala.jdk.CollectionConverters._
      val stats = JsonLite.parse(body)
        .asInstanceOf[java.util.Map[String, Any]].asScala
      var n = 0
      stats.foreach {
        case (containerId, sj: java.util.Map[_, _]) =>
          val s = sj.asInstanceOf[java.util.Map[String, Any]].asScala
          def path(keys: String*): Option[Double] = {
            var cur: Any = sj
            keys.foreach { k =>
              cur = cur match {
                case m: java.util.Map[_, _] =>
                  m.asInstanceOf[java.util.Map[String, Any]].get(k)
                case _ => null
              }
            }
            cur match {
              case x: Number => Some(x.doubleValue)
              case _ => None
            }
          }
          val name = s.getOrElse("name", "").toString
          def emit(metric: String, kind: String, v: Option[Double]): Unit =
            v.foreach { x =>
              mem.addData((metric, kind, x, containerId, name)); n += 1
            }
          // the reference's headline gauges/counters
          // (src/sources/aws_ecs_metrics/parser.rs)
          emit("cpu_total_usage", "counter",
            path("cpu_stats", "cpu_usage", "total_usage"))
          emit("memory_usage_bytes", "gauge", path("memory_stats", "usage"))
          emit("memory_limit_bytes", "gauge", path("memory_stats", "limit"))
          s.get("networks") match {
            case Some(nets: java.util.Map[_, _]) =>
              nets.asInstanceOf[java.util.Map[String, Any]].asScala.foreach {
                case (dev, dj: java.util.Map[_, _]) =>
                  val d = dj.asInstanceOf[java.util.Map[String, Any]].asScala
                  def net(metric: String, key: String): Unit =
                    d.get(key).collect { case x: Number =>
                      mem.addData((metric, "counter", x.doubleValue,
                        containerId, dev)); n += 1
                    }
                  net("network_receive_bytes_total", "rx_bytes")
                  net("network_transmit_bytes_total", "tx_bytes")
                case _ => ()
              }
            case _ => ()
          }
        case _ => ()
      }
      n
    }

    private val thread = new Thread(() => {
      while (running) {
        try scrapeOnce()
        catch { case _: Exception => () }
        Thread.sleep(intervalSecs * 1000L)
      }
    }, "ecs-metrics-source")
    thread.setDaemon(true)

    def startPolling(): Unit = thread.start()

    def df: DataFrame = {
      val d = mem.toDF()
      d.select(org.apache.spark.sql.functions.lit(namespace).as("namespace"),
        d("_1").as("name"), d("_2").as("kind"), d("_3").as("value"),
        d("_4").as("container_id"), d("_5").as("container_name"))
    }
    def stop(): Unit = running = false
  }

  def ecsMetrics(spark: SparkSession, endpoint: String,
                 namespace: String = "awsecs",
                 intervalSecs: Int = 15): EcsMetricsSource =
    new EcsMetricsSource(spark, endpoint, namespace, intervalSecs)
}
