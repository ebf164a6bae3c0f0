package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The object-storage sink family: `aws_s3` (src/sinks/aws_s3/),
  * `gcp_cloud_storage` (src/sinks/gcp/cloud_storage.rs), `azure_blob`
  * (src/sinks/azure_blob/) and `webhdfs` (src/sinks/webhdfs/) all share
  * one shape — a template `key_prefix` partitions events into objects
  * (`S3KeyPartitioner`, src/sinks/aws_s3/config.rs:63-87), each object is
  * named `{prefix}{strftime(filename_time_format)}[-uuid].{extension}`
  * (src/sinks/aws_s3/sink.rs:71-121), bodies are the encoded + framed +
  * compressed event batch, split on `batch.max_bytes`/`max_events`
  * (src/sinks/util/batch.rs:96-117). Extension defaults to the
  * compression's (`log`/`log.gz`/`log.zst`,
  * src/sinks/util/buffer/compression.rs:91-99).
  *
  * Spark-first execution, designed for the 1000-executor case:
  *  1. ONE narrow codegen'd projection computes (rendered prefix,
  *     encoded line) — no UDF, no driver involvement.
  *  2. NO shuffle: object names are collision-free (timestamp+uuid, the
  *     very reason the reference appends the uuid), so every task
  *     uploads its own objects in parallel — the same fan-out a fleet of
  *     reference instances produces. A `sortWithinPartitions` on the
  *     prefix (narrow, in-task) keeps one open object per task and
  *     minimizes object count.
  *  3. Writes go through the Hadoop `FileSystem` API, so the same code
  *     hits `file:`, `hdfs:`, `webhdfs:`, `s3a:`, `gs:`, `abfs:` —
  *     whichever connector jars the cluster ships. Locally, a directory
  *     stands in for the bucket.
  */
object ObjectStoreSink {

  case class Config(
      /** bucket/container root as a Hadoop-FS URI or local directory */
      baseUri: String,
      keyPrefix: String = "date=%F", // aws_s3/config.rs:192 default
      filenameTimeFormat: String = "%s", // config.rs:196 default
      filenameAppendUuid: Boolean = true,
      filenameExtension: Option[String] = None,
      codec: String = "text",
      framing: String = "newline_delimited",
      delimiter: String = "\n",
      compression: String = "none",
      // batch.max_bytes / max_events split objects (uncompressed bytes,
      // like the reference's encoded-batch accounting); 0 = unbounded
      maxBytes: Long = 10L * 1024 * 1024,
      maxEvents: Int = 0,
      /** Shuffle rows so each rendered prefix lands on ONE task before
        * writing. Off (default): zero-shuffle, every task uploads its
        * own objects — max parallel fan-out, but object count scales as
        * tasks × prefixes. On: one hash shuffle on the prefix, object
        * count scales as prefixes (the reference's per-instance
        * granularity) — the right trade when prefixes are few and many
        * tiny objects would hurt the downstream reader.
        */
      partitionByPrefix: Boolean = false,
      /** fixed clock (epoch ms) for deterministic tests; None = now() */
      fixedClockMs: Option[Long] = None)
      extends Serializable {

    def extension: String = filenameExtension.getOrElse(compression match {
      case "gzip" => "log.gz"
      case "zstd" => "log.zst"
      case _ => "log"
    })
  }

  /** Render `filename_time_format` (chrono strftime, `%s` = epoch
    * seconds) against the object build time, UTC — the reference formats
    * `Utc::now()` at request-build time (aws_s3/sink.rs:78-85).
    */
  private def formatTs(fmt: String, epochMs: Long): String =
    if (fmt == "%s") (epochMs / 1000L).toString
    else java.time.format.DateTimeFormatter
      .ofPattern(graft.functions.VrlFunctions.strftimeToJava(fmt))
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(epochMs))

  /** Write one (micro-)batch; shared by the batch sink and the streaming
    * foreachBatch wrapper.
    */
  def writeBatch(df: DataFrame, cfg: Config): Unit = {
    val rendered =
      if (graft.functions.Template.isDynamic(cfg.keyPrefix))
        graft.functions.Template.render(df.schema, cfg.keyPrefix)
      else lit(cfg.keyPrefix)
    val projected = df
      .select(rendered.as("__prefix"), LineCodec.encode(df, cfg.codec).as("__line"))
    val lines =
      (if (cfg.partitionByPrefix) projected.repartition(col("__prefix"))
      else projected)
        .sortWithinPartitions("__prefix")
    val delim = LineCodec.frameDelimiter(cfg.framing, cfg.delimiter)
    val c = cfg
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    lines.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val base = new org.apache.hadoop.fs.Path(c.baseUri)
      val fs = base.getFileSystem(hconf.value)
      var prefix: String = null
      var out: java.io.OutputStream = null
      var nBytes = 0L
      var nEvents = 0
      var seq = 0
      def objectName(pfx: String): org.apache.hadoop.fs.Path = {
        val now = c.fixedClockMs.getOrElse(System.currentTimeMillis())
        val ts = formatTs(c.filenameTimeFormat, now)
        // uuid off + fixed clock (tests): stay collision-free across
        // parallel tasks with a task-scoped deterministic suffix
        val uid =
          if (c.filenameAppendUuid) "-" + java.util.UUID.randomUUID().toString
          else if (c.fixedClockMs.isDefined) {
            seq += 1
            s"-p${org.apache.spark.TaskContext.getPartitionId()}-$seq"
          } else ""
        new org.apache.hadoop.fs.Path(base, s"$pfx$ts$uid.${c.extension}")
      }
      def open(pfx: String): Unit = {
        val p = objectName(pfx)
        fs.mkdirs(p.getParent)
        out = LineCodec.compress(fs.create(p, false), c.compression)
        prefix = pfx; nBytes = 0L; nEvents = 0
      }
      def close(): Unit = if (out != null) { out.close(); out = null }
      try {
        for (r <- rows) {
          val pfx = Option(r.getString(0)).getOrElse("")
          val line = r.getString(1)
          if (line != null) {
            val bytes = line.getBytes("UTF-8")
            val full =
              (c.maxBytes > 0 && nBytes + bytes.length + delim.length > c.maxBytes
                && nEvents > 0) ||
                (c.maxEvents > 0 && nEvents >= c.maxEvents)
            if (out == null || pfx != prefix || full) { close(); open(pfx) }
            out.write(bytes); out.write(delim)
            nBytes += bytes.length + delim.length; nEvents += 1
          }
        }
      } finally close()
    }
  }

  /** Read every object under the base back into (key, line) rows —
    * test/verification helper mirroring what a downstream consumer sees.
    * Decompresses by extension. Distributed: the listing becomes a
    * DataFrame of paths and each task reads its own objects.
    */
  def readBack(spark: org.apache.spark.sql.SparkSession, baseUri: String)
      : DataFrame = {
    import org.apache.hadoop.fs.Path
    val base = new Path(baseUri)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(base, true)
    val paths = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) paths += it.next().getPath.toString
    val baseStr = fs.makeQualified(base).toString
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    spark.createDataset(paths.toSeq).repartition(spark.sparkContext.defaultParallelism)
      .flatMap { p =>
        val path = new Path(p)
        val in0: java.io.InputStream = path.getFileSystem(hconf.value).open(path)
        val in =
          if (p.endsWith(".gz")) new java.util.zip.GZIPInputStream(in0)
          else if (p.endsWith(".zst")) new com.github.luben.zstd.ZstdInputStream(in0)
          else in0
        val key = p.stripPrefix(baseStr).stripPrefix("/")
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .map(l => (key, l)).toVector
        finally in.close()
      }.toDF("key", "line")
  }
}
