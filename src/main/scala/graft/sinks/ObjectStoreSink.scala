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

  // ---- parquet object encoding (encoding/format/parquet.rs: columnar
  // export at the encoder edge; objects carry real parquet files) ------

  private def parquetSchema(st: org.apache.spark.sql.types.StructType)
      : org.apache.parquet.schema.MessageType = {
    import org.apache.spark.sql.types._
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val b = Types.buildMessage()
    st.fields.foreach { f =>
      f.dataType match {
        case LongType => b.optional(INT64).named(f.name)
        case IntegerType => b.optional(INT32).named(f.name)
        case DoubleType => b.optional(DOUBLE).named(f.name)
        case FloatType => b.optional(FLOAT).named(f.name)
        case BooleanType => b.optional(BOOLEAN).named(f.name)
        case BinaryType => b.optional(BINARY).named(f.name)
        case TimestampType => b.optional(INT64)
          .as(LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS)).named(f.name)
        case _ => b.optional(BINARY)
          .as(LogicalTypeAnnotation.stringType()).named(f.name)
      }
    }
    b.named("event")
  }

  /** `encoding.codec: parquet`: each object is a real parquet file of
    * the batch's events (complex columns pre-rendered to JSON strings in
    * the projection; same key/filename/batch machinery as line codecs).
    */
  private def writeParquet(df: DataFrame, cfg: Config,
                           rendered: org.apache.spark.sql.Column): Unit = {
    import org.apache.spark.sql.types._
    val user = df.schema.fields.toSeq
      .filterNot(f => LineCodec.InternalCols.contains(f.name))
    val simplified = user.map { f =>
      f.dataType match {
        case LongType | IntegerType | DoubleType | FloatType | BooleanType |
             BinaryType | TimestampType | StringType => col(f.name)
        case _ => to_json(col(f.name)).as(f.name)
      }
    }
    val projected = df.select(rendered.as("__prefix"),
      struct(simplified: _*).as("__row"))
    val lines =
      (if (cfg.partitionByPrefix) projected.repartition(col("__prefix"))
       else projected).sortWithinPartitions("__prefix")
    val rowSchema = lines.schema("__row").dataType
      .asInstanceOf[StructType]
    val c = cfg
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    lines.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      import org.apache.parquet.example.data.simple.SimpleGroupFactory
      import org.apache.parquet.hadoop.example.ExampleParquetWriter
      val base = new org.apache.hadoop.fs.Path(c.baseUri)
      val fs = base.getFileSystem(hconf.value)
      val msgType = parquetSchema(rowSchema)
      val factory = new SimpleGroupFactory(msgType)
      var prefix: String = null
      var writer: org.apache.parquet.hadoop.ParquetWriter[
        org.apache.parquet.example.data.Group] = null
      var nEvents = 0
      var seq = 0
      def open(pfx: String): Unit = {
        val now = c.fixedClockMs.getOrElse(System.currentTimeMillis())
        val ts = formatTs(c.filenameTimeFormat, now)
        val uid =
          if (c.filenameAppendUuid) "-" + java.util.UUID.randomUUID().toString
          else {
            seq += 1
            s"-p${org.apache.spark.TaskContext.getPartitionId()}-$seq"
          }
        val p = new org.apache.hadoop.fs.Path(base, s"$pfx$ts$uid.parquet")
        fs.mkdirs(p.getParent)
        writer = ExampleParquetWriter.builder(p)
          .withConf(hconf.value).withType(msgType).build()
        prefix = pfx; nEvents = 0
      }
      def close(): Unit = if (writer != null) { writer.close(); writer = null }
      try {
        for (r <- rows) {
          val pfx = Option(r.getString(0)).getOrElse("")
          val row = r.getStruct(1)
          val full = c.maxEvents > 0 && nEvents >= c.maxEvents
          if (writer == null || pfx != prefix || full) { close(); open(pfx) }
          val g = factory.newGroup()
          rowSchema.fields.zipWithIndex.foreach { case (f, i) =>
            if (!row.isNullAt(i)) f.dataType match {
              case LongType => g.append(f.name, row.getLong(i))
              case IntegerType => g.append(f.name, row.getInt(i))
              case DoubleType => g.append(f.name, row.getDouble(i))
              case FloatType => g.append(f.name, row.getFloat(i))
              case BooleanType => g.append(f.name, row.getBoolean(i))
              case BinaryType => g.append(f.name,
                org.apache.parquet.io.api.Binary.fromConstantByteArray(
                  row.getAs[Array[Byte]](i)))
              case TimestampType => g.append(f.name,
                row.getAs[java.sql.Timestamp](i).getTime * 1000L +
                  (row.getAs[java.sql.Timestamp](i).getNanos / 1000L) % 1000L)
              case _ => g.append(f.name, String.valueOf(row.get(i)))
            }
          }
          writer.write(g)
          nEvents += 1
        }
      } finally close()
    }
  }

  // ---- arrow object encoding (encoding/format/arrow.rs) ---------------

  private def arrowField(f: org.apache.spark.sql.types.StructField)
      : org.apache.arrow.vector.types.pojo.Field = {
    import org.apache.spark.sql.types._
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType}
    import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit}
    val t: ArrowType = f.dataType match {
      case LongType => new ArrowType.Int(64, true)
      case IntegerType => new ArrowType.Int(32, true)
      case DoubleType =>
        new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case FloatType =>
        new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case BooleanType => ArrowType.Bool.INSTANCE
      case BinaryType => ArrowType.Binary.INSTANCE
      case TimestampType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
      case _ => ArrowType.Utf8.INSTANCE
    }
    new Field(f.name, FieldType.nullable(t), java.util.Collections.emptyList())
  }

  /** `encoding.codec: arrow`: each object is an Arrow IPC stream of the
    * batch's events (same projection/simplification as parquet).
    */
  private def writeArrow(df: DataFrame, cfg: Config,
                         rendered: org.apache.spark.sql.Column): Unit = {
    import org.apache.spark.sql.types._
    val user = df.schema.fields.toSeq
      .filterNot(f => LineCodec.InternalCols.contains(f.name))
    val simplified = user.map { f =>
      f.dataType match {
        case LongType | IntegerType | DoubleType | FloatType | BooleanType |
             BinaryType | TimestampType | StringType => col(f.name)
        case _ => to_json(col(f.name)).as(f.name)
      }
    }
    val projected = df.select(rendered.as("__prefix"),
      struct(simplified: _*).as("__row"))
    val lines =
      (if (cfg.partitionByPrefix) projected.repartition(col("__prefix"))
       else projected).sortWithinPartitions("__prefix")
    val rowSchema = lines.schema("__row").dataType.asInstanceOf[StructType]
    val c = cfg
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    lines.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      import org.apache.arrow.memory.RootAllocator
      import org.apache.arrow.vector._
      import org.apache.arrow.vector.ipc.ArrowStreamWriter
      val base = new org.apache.hadoop.fs.Path(c.baseUri)
      val fs = base.getFileSystem(hconf.value)
      val arrowSchema = new org.apache.arrow.vector.types.pojo.Schema(
        java.util.Arrays.asList(rowSchema.fields.map(arrowField): _*))
      var seq = 0
      def flush(pfx: String, buf: Seq[org.apache.spark.sql.Row]): Unit =
        if (buf.nonEmpty) {
          val now = c.fixedClockMs.getOrElse(System.currentTimeMillis())
          val ts = formatTs(c.filenameTimeFormat, now)
          val uid =
            if (c.filenameAppendUuid)
              "-" + java.util.UUID.randomUUID().toString
            else {
              seq += 1
              s"-p${org.apache.spark.TaskContext.getPartitionId()}-$seq"
            }
          val p = new org.apache.hadoop.fs.Path(base, s"$pfx$ts$uid.arrow")
          fs.mkdirs(p.getParent)
          val alloc = new RootAllocator()
          val root = VectorSchemaRoot.create(arrowSchema, alloc)
          try {
            root.allocateNew()
            buf.zipWithIndex.foreach { case (r, i) =>
              rowSchema.fields.zipWithIndex.foreach { case (f, j) =>
                val vec = root.getVector(f.name)
                if (r.isNullAt(j)) () // nullable by default
                else f.dataType match {
                  case LongType =>
                    vec.asInstanceOf[BigIntVector].setSafe(i, r.getLong(j))
                  case IntegerType =>
                    vec.asInstanceOf[IntVector].setSafe(i, r.getInt(j))
                  case DoubleType =>
                    vec.asInstanceOf[Float8Vector].setSafe(i, r.getDouble(j))
                  case FloatType =>
                    vec.asInstanceOf[Float4Vector].setSafe(i, r.getFloat(j))
                  case BooleanType =>
                    vec.asInstanceOf[BitVector]
                      .setSafe(i, if (r.getBoolean(j)) 1 else 0)
                  case BinaryType =>
                    vec.asInstanceOf[VarBinaryVector]
                      .setSafe(i, r.getAs[Array[Byte]](j))
                  case TimestampType =>
                    val t = r.getAs[java.sql.Timestamp](j)
                    vec.asInstanceOf[TimeStampMicroTZVector].setSafe(i,
                      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L)
                  case _ =>
                    vec.asInstanceOf[VarCharVector].setSafe(i,
                      String.valueOf(r.get(j)).getBytes("UTF-8"))
                }
              }
            }
            root.setRowCount(buf.length)
            val out = fs.create(p, false)
            try {
              val w = new ArrowStreamWriter(root, null,
                java.nio.channels.Channels.newChannel(out))
              w.start(); w.writeBatch(); w.end(); w.close()
            } finally out.close()
          } finally { root.close(); alloc.close() }
        }
      var prefix: String = null
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.sql.Row]
      for (r <- rows) {
        val pfx = Option(r.getString(0)).getOrElse("")
        val full = c.maxEvents > 0 && buf.length >= c.maxEvents
        if ((prefix != null && pfx != prefix) || full) {
          flush(prefix, buf.toSeq); buf.clear()
        }
        prefix = pfx
        buf += r.getStruct(1)
      }
      flush(prefix, buf.toSeq)
    }
  }

  /** Write one (micro-)batch; shared by the batch sink and the streaming
    * foreachBatch wrapper.
    */
  def writeBatch(df: DataFrame, cfg: Config): Unit = {
    val rendered =
      if (graft.functions.Template.isDynamic(cfg.keyPrefix))
        graft.functions.Template.render(df.schema, cfg.keyPrefix)
      else lit(cfg.keyPrefix)
    if (cfg.codec == "parquet") return writeParquet(df, cfg, rendered)
    if (cfg.codec == "arrow") return writeArrow(df, cfg, rendered)
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
