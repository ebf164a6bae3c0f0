package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming runner: source and sink surface mirroring the
  * reference's topology edges (SURVEY §2.4-2.5).
  *
  * Reference: sources in /root/reference/src/sources/ (file tail, kafka,
  * socket, demo_logs, stdin, http), sinks in src/sinks/ (console, file,
  * kafka, blackhole, http, …). Spark-native mappings: `readStream`
  * format("kafka"/"socket"/"text"/"rate"), `writeStream`
  * format("kafka"/"parquet"/"console"/"noop"/"memory"), `foreachBatch`
  * for request-style sinks. Batching, retries, and acknowledgement are
  * checkpointing + the connector (stronger guarantees than the
  * reference's ack plumbing — see SURVEY §1.4).
  */
object StreamRunner {

  // ---- sources ---------------------------------------------------------

  /** Kafka source (reference src/sources/kafka.rs → native connector). */
  def kafka(spark: SparkSession, servers: String, topics: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topics)
      .load()

  /** TCP socket line source (reference src/sources/socket/). */
  def socket(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream.format("socket")
      .option("host", host).option("port", port).load()

  /** Directory-of-files source (reference src/sources/file.rs; Spark's
    * file source assumes immutable files — rotation-style tailing is the
    * documented difference).
    */
  def textDir(spark: SparkSession, path: String): DataFrame =
    spark.readStream.format("text").load(path)

  /** `demo_logs` — synthetic generator over the rate source.
    *
    * Reference: /root/reference/src/sources/demo_logs.rs:102-150 (formats
    * Shuffle, ApacheCommon, ApacheError, Syslog, BsdSyslog, Json). The
    * rate source provides (timestamp, value); deterministic expressions
    * derive the formatted line — same shape, engine-native.
    */
  def demoLogs(spark: SparkSession, rowsPerSecond: Int,
               format: String = "json"): DataFrame = {
    val base = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
    val host = concat(lit("host"), pmod(col("value"), lit(50)))
    val app = concat(lit("app"), pmod(col("value"), lit(5)))
    val status = element_at(
      array(lit(200), lit(200), lit(200), lit(404), lit(500)),
      (pmod(col("value"), lit(5)) + 1).cast("int"))
    val line = format match {
      case "syslog" | "bsd_syslog" =>
        format_string("<%d>%s %s %s[%d]: demo message %d",
          pmod(col("value"), lit(192)).cast("int"),
          date_format(col("timestamp"), "MMM dd HH:mm:ss"),
          host, app, pmod(col("value"), lit(9999)).cast("int") + 1,
          col("value"))
      case "apache_common" =>
        format_string("%s - - [%s] \"GET /path/%d HTTP/1.1\" %d %d",
          host, date_format(col("timestamp"), "dd/MMM/yyyy:HH:mm:ss Z"),
          pmod(col("value"), lit(100)), status,
          pmod(col("value") * 37, lit(9000)) + 100)
      case "apache_error" =>
        format_string("[%s] [error] [client %s] demo error %d",
          date_format(col("timestamp"), "EEE MMM dd HH:mm:ss yyyy"),
          host, col("value"))
      case _ =>
        to_json(struct(col("timestamp").as("ts"), host.as("host"),
          app.as("app"), status.as("status"), col("value").as("seq")))
    }
    base.select(col("timestamp"), col("value"), line.as("message"))
  }

  /** `exec` source (reference src/sources/exec/): run a process on the
    * driver, one row per stdout line. Scheduled mode = re-invoke per
    * batch in foreachBatch; streaming mode is out of scope (single
    * process, inherently driver-side).
    */
  def exec(spark: SparkSession, command: Seq[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val proc = new ProcessBuilder(command.asJava).redirectErrorStream(true).start()
    val lines = scala.io.Source.fromInputStream(proc.getInputStream).getLines().toSeq
    proc.waitFor()
    import spark.implicits._
    lines.toDF("message")
  }

  /** `stdin` / `file_descriptors` source: driver stdin, batch form. */
  def stdin(spark: SparkSession): DataFrame = {
    import spark.implicits._
    scala.io.Source.stdin.getLines().toSeq.toDF("message")
  }

  // ---- sinks -----------------------------------------------------------

  def toConsole(df: DataFrame, intervalMs: Long = 1000): DataStreamWriter[Row] =
    df.writeStream.format("console")
      .trigger(Trigger.ProcessingTime(intervalMs))

  /** File sink with template-style partitioning (reference: S3/file key
    * templates like `date=%F` → partitionBy on a derived column).
    */
  def toParquet(df: DataFrame, path: String, checkpoint: String,
                partitionCols: Seq[String] = Nil): DataStreamWriter[Row] = {
    val w = df.writeStream.format("parquet")
      .option("path", path).option("checkpointLocation", checkpoint)
    if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w
  }

  def toKafka(df: DataFrame, servers: String, topic: String,
              checkpoint: String): DataStreamWriter[Row] =
    df.select(to_json(struct(col("*"))).as("value")).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)

  /** `blackhole` sink (reference src/sinks/blackhole) — consume and drop;
    * used by benchmarks.
    */
  def toBlackhole(df: DataFrame): DataStreamWriter[Row] =
    df.writeStream.format("noop")

  /** HTTP-style sink shape: per-micro-batch callback (request building,
    * compression, and retry belong to the callback — reference
    * src/sinks/util/).
    */
  def toForeachBatch(df: DataFrame)(f: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    df.writeStream.foreachBatch(f)

  /** Start with a processing-time trigger — the reference's only timing
    * model (SURVEY §2.8: no event-time anywhere in the codebase).
    */
  def start(w: DataStreamWriter[Row], intervalMs: Long = 0): StreamingQuery =
    (if (intervalMs > 0) w.trigger(Trigger.ProcessingTime(intervalMs)) else w)
      .start()
}
