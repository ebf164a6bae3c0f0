package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's `file` sink (src/sinks/file/mod.rs): every event
  * renders the `path` template (`/tmp/logs/{{ app }}-%Y-%m-%d.log`,
  * mod.rs:69) to pick its output file, is serialized by
  * `encoding.codec` + framing (mod.rs:97), optionally compressed
  * (mod.rs:101 none|gzip|zstd), and appended.
  *
  * Spark execution shape, designed for the 1000-executor case:
  *  1. ONE narrow projection computes (rendered_path, encoded_line) —
  *     template + codec are codegen'd Column expressions.
  *  2. ONE hash shuffle on rendered_path co-locates each output file's
  *     rows (events >> files, so this is the same shape as a
  *     dynamic-partition insert; skew on a hot file is an append-ordering
  *     point anyway — a single writer per file is the CORRECT semantics,
  *     not a bottleneck we introduced).
  *  3. Each task sorts its partition by path and streams through it with
  *     at most ONE open file at a time — no per-task file-handle
  *     explosion, no driver involvement, no collect.
  * Static paths (no template) skip the shuffle: every task appends to its
  * own `path.part-<id>` the way a distributed text write must (a shared
  * posix append across executors is not coordinated-safe), unless
  * `single_file` asks for the strict one-file semantics.
  */
object FileSink {

  case class Config(
      path: String,
      codec: String = "text",
      framing: String = "newline_delimited",
      delimiter: String = "\n",
      compression: String = "none",
      // strict single-file append for a static path (single writer task);
      // false = one part file per task, reference-compatible contents
      singleFile: Boolean = true,
      // codec-specific encoding options (e.g. encoding.cef.*)
      encConf: Map[String, Any] = Map.empty)
      extends Serializable

  /** Write one (micro-)batch. Serializable helper shared by the batch
    * sink and the streaming foreachBatch sink.
    */
  /** The routing plan [[writeBatch]] executes — split out so the plan
    * audit can assert its shape: a dynamic template path gets exactly
    * ONE hash shuffle on the rendered path (co-locating each output
    * file's lines); a static path skips the shuffle entirely.
    */
  def routed(df: DataFrame, cfg: Config): DataFrame = {
    val dynamic = graft.functions.Template.isDynamic(cfg.path)
    val rendered =
      if (dynamic) graft.functions.Template.render(df.schema, cfg.path)
      else lit(cfg.path)
    val lines = df.select(rendered.as("__path"),
      LineCodec.encodeLine(df, cfg.codec, cfg.encConf).as("__line"))
    if (dynamic)
      lines.repartition(col("__path")).sortWithinPartitions("__path")
    else if (cfg.singleFile) lines.coalesce(1)
    else lines
  }

  def writeBatch(df: DataFrame, cfg: Config): Unit = {
    val dynamic = graft.functions.Template.isDynamic(cfg.path)
    val delim = LineCodec.frameDelimiter(cfg.framing, cfg.delimiter)
    val compression = cfg.compression
    val routed = this.routed(df, cfg)
    val suffixPerTask = !dynamic && !cfg.singleFile
    routed.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      var current: String = null
      var out: java.io.OutputStream = null
      def close(): Unit = if (out != null) { out.close(); out = null }
      try {
        for (r <- rows) {
          val path0 = r.getString(0)
          val path =
            if (suffixPerTask)
              path0 + ".part-" + org.apache.spark.TaskContext.getPartitionId()
            else path0
          if (path != current) {
            close()
            val f = new java.io.File(path)
            Option(f.getParentFile).foreach(_.mkdirs())
            out = LineCodec.compress(
              new java.io.BufferedOutputStream(
                new java.io.FileOutputStream(f, true)), compression)
            current = path
          }
          val line = LineCodec.rowBytes(r, 1)
          if (line != null)
            out.write(LineCodec.frameBytes(line, cfg.framing, delim))
        }
      } finally close()
    }
  }
}
