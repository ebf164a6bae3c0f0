package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.JsonLite

/** `gcp_pubsub` source (src/sources/gcp_pubsub.rs — project +
  * subscription; the reference uses gRPC StreamingPull, here the
  * service's equivalent public REST pull/acknowledge pair). Driver-side
  * poll loop feeding a MemoryStream; Pub/Sub itself load-balances
  * competing subscribers on one subscription.
  */
object GcpSources {

  final class PubsubSource(spark: SparkSession, project: String,
                           subscription: String, endpoint: String) {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // (message_id, publish_time, payload)
    private val mem = MemoryStream[(String, String, String)]
    @volatile private var running = true
    private val base = endpoint.stripSuffix("/") +
      s"/v1/projects/$project/subscriptions/$subscription"

    private def post(url: String, body: String): String = {
      val conn = new java.net.URI(url).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      conn.getOutputStream.write(body.getBytes("UTF-8"))
      conn.getOutputStream.close()
      new String(conn.getInputStream.readAllBytes(), "UTF-8")
    }

    private val thread = new Thread(() => {
      import scala.jdk.CollectionConverters._
      while (running) {
        try {
          val resp = post(s"$base:pull", """{"maxMessages":100}""")
          val parsed = JsonLite.parse(resp)
            .asInstanceOf[java.util.Map[String, Any]].asScala
          val received = parsed
            .getOrElse("receivedMessages", new java.util.ArrayList[Any]())
            .asInstanceOf[java.util.List[Any]].asScala
            .map(_.asInstanceOf[java.util.Map[String, Any]].asScala).toSeq
          val ackIds = received.flatMap { rm =>
            val msg = rm.getOrElse("message", new java.util.HashMap[String, Any]())
              .asInstanceOf[java.util.Map[String, Any]].asScala
            val data = msg.get("data").map(_.toString).getOrElse("")
            mem.addData((
              msg.get("messageId").map(_.toString).getOrElse(""),
              msg.get("publishTime").map(_.toString).getOrElse(""),
              new String(java.util.Base64.getDecoder.decode(data), "UTF-8")))
            rm.get("ackId").map(_.toString)
          }
          if (ackIds.nonEmpty)
            post(s"$base:acknowledge",
              ackIds.map(a => "\"" + a + "\"")
                .mkString("""{"ackIds":[""", ",", "]}"))
          else Thread.sleep(100)
        } catch {
          case _: Exception => if (running) Thread.sleep(500)
        }
      }
    }, s"gcp-pubsub-source-$subscription")
    thread.setDaemon(true)
    thread.start()

    def df: DataFrame = {
      val d = mem.toDF()
      d.select(d("_1").as("message_id"), d("_2").as("publish_time"),
        d("_3").as("message"))
    }
    def stop(): Unit = running = false
  }

  def pubsub(spark: SparkSession, project: String, subscription: String,
             endpoint: String): PubsubSource =
    new PubsubSource(spark, project, subscription, endpoint)
}
