package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sink-side event serialization: `encoding.codec` + `framing` from the
  * reference's sink configs (lib/codecs/src/encoding/ — every sink takes
  * an `EncodingConfigWithFraming`, e.g. src/sinks/file/mod.rs:97,
  * src/sinks/http/config.rs:69). The codec turns one event into one
  * string; the framer joins them on the wire.
  *
  * Spark-first: the codec is a single Column expression over the event
  * row (codegen'd `to_json`/`concat`), so "encode everything" is one
  * narrow projection — the imperative part of a sink is only the final
  * byte-pushing loop.
  */
object LineCodec {

  /** Columns the engine adds for its own bookkeeping — never serialized. */
  val InternalCols: Set[String] =
    Set("__event_kind", "__path", "__route", "__seq")

  private def userFields(df: DataFrame): Seq[String] =
    df.schema.fieldNames.toSeq.filterNot(InternalCols.contains)

  /** One event → one serialized string, per the named codec
    * (lib/codecs/src/encoding/format/): json, text (message field or
    * whole-row json fallback), logfmt, csv (field order = schema order),
    * native_json (the `{"log": {...}}` transport envelope), raw_message.
    */
  def encode(df: DataFrame, codec: String,
             conf: Map[String, Any] = Map.empty): Column = codec match {
    case "json" =>
      to_json(struct(userFields(df).map(col): _*))
    case "text" | "raw_message" =>
      if (df.schema.fieldNames.contains("message")) col("message").cast("string")
      else to_json(struct(userFields(df).map(col): _*))
    case "logfmt" | "key_value" =>
      graft.codecs.Encode.logfmt(map_from_arrays(
        array(userFields(df).map(lit): _*),
        array(userFields(df).map(f => col(f).cast("string")): _*)))
    case "csv" =>
      // encoding.csv.fields pins the column order (encoding/format/
      // csv.rs CsvSerializerConfig); default = schema order
      val csvFields = anyMap(conf.getOrElse("csv", null))
        .get("fields") match {
        case Some(l: java.util.List[_]) =>
          l.toArray.map(_.toString).toSeq
        case Some(l: Seq[_]) => l.map(_.toString)
        case _ => userFields(df)
      }
      // coalesce to "" per cell: concat_ws SKIPS nulls, which would
      // shift every later column left and break alignment
      concat_ws(",", csvFields.map(f =>
        coalesce((if (df.columns.contains(f)) col(f) else lit(null))
          .cast("string"), lit(""))): _*)
    case "native_json" =>
      to_json(struct(struct(userFields(df).map(col): _*).as("log")))
    case "gelf" =>
      // encoding/format/gelf.rs: version/host/short_message/timestamp/
      // level from the event; remaining fields ride as _-prefixed extras
      def c(n: String, dflt: Column): Column =
        if (df.columns.contains(n)) col(n) else dflt
      val core = Set("host", "message", "short_message", "ts", "timestamp",
        "level", "severity")
      val extras = userFields(df).filterNot(core.contains)
      to_json(struct(
        (lit("1.1").as("version") +:
          c("host", lit("localhost")).cast("string").as("host") +:
          coalesce(c("short_message", lit(null)), c("message", lit(null)))
            .cast("string").as("short_message") +:
          unix_timestamp(c("ts", c("timestamp", current_timestamp())))
            .cast("double").as("timestamp") +:
          c("level", c("severity", lit(1))).cast("int").as("level") +:
          extras.map(f => col(f).as(s"_$f"))): _*))
    case "syslog" =>
      // encoding/format/syslog.rs: rfc 3164|5424, facility/severity/
      // app_name/proc_id/msg_id are PATHS into the event (fall back to
      // user/informational and dashes when absent)
      val sm = anyMap(conf.getOrElse("syslog", null))
      def pathCol(key: String): Option[Column] =
        sm.get(key).map(_.toString).filter(df.columns.contains).map(col)
      val fac = pathCol("facility")
        .map(c => coalesce(graft.functions.Vrl.toSyslogFacilityCode(c),
          c.cast("long"), lit(1L)))
        .getOrElse(lit(1L)) // user
      val sev = pathCol("severity")
        .map(c => coalesce(graft.functions.Vrl.toSyslogSeverity(c),
          c.cast("long"), lit(6L)))
        .getOrElse(lit(6L)) // informational
      val pri = fac * 8 + sev
      val host = Seq("hostname", "host").find(df.columns.contains)
        .map(col).getOrElse(lit("localhost")).cast("string")
      val app = pathCol("app_name").getOrElse(lit("graft")).cast("string")
      val procId = pathCol("proc_id")
      val msgId = pathCol("msg_id")
      val ts = Seq("timestamp", "ts").find(df.columns.contains)
        .map(col(_).cast("timestamp")).getOrElse(current_timestamp())
      val msg =
        if (df.columns.contains("message")) col("message").cast("string")
        else to_json(struct(userFields(df).map(col): _*))
      sm.getOrElse("rfc", "rfc5424").toString match {
        case "rfc3164" =>
          graft.codecs.Encode.syslog3164(pri, ts, host, app,
            procId.map(_.cast("long")).getOrElse(lit(0L)), msg)
        case _ =>
          concat(lit("<"), pri.cast("string"), lit(">1 "),
            date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"), lit(" "),
            host, lit(" "), app, lit(" "),
            coalesce(procId.map(_.cast("string")).getOrElse(lit(null))
              .cast("string"), lit("-")), lit(" "),
            coalesce(msgId.map(_.cast("string")).getOrElse(lit(null))
              .cast("string"), lit("-")),
            lit(" - "), msg)
      }
    case "cef" =>
      // encoding/format/cef.rs config shape: device_vendor /
      // device_product / device_version / device_event_class_id / name /
      // severity literals-or-fields + extensions {key: field}
      val cm = anyMap(conf.getOrElse("cef", null))
      def fieldOr(key: String, dflt: String): Column = {
        val v = cm.getOrElse(key, dflt).toString
        if (df.columns.contains(v)) col(v) else lit(v)
      }
      val extensions = anyMap(cm.getOrElse("extensions", null)).toSeq
        .map { case (k, v) => k -> v.toString }
        .sortBy(_._1).map { case (k, f) =>
          k -> (if (df.columns.contains(f)) col(f) else lit(f)) }
      graft.codecs.Encode.cef(
        cm.getOrElse("device_vendor", "Graft").toString,
        cm.getOrElse("device_product", "graft").toString,
        cm.getOrElse("device_version", "1.0").toString,
        fieldOr("device_event_class_id", "0"),
        fieldOr("name", "event"),
        fieldOr("severity", "5"),
        extensions)
    case other =>
      throw new IllegalArgumentException(s"unsupported sink codec: $other")
  }

  private def anyMap(v: Any): Map[String, Any] = v match {
    case m: java.util.Map[_, _] =>
      val b = Map.newBuilder[String, Any]
      m.asInstanceOf[java.util.Map[String, Any]]
        .forEach((k, x) => b += (k -> x))
      b.result()
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    case _ => Map.empty
  }

  /** Binary sink codecs — protobuf (the reference's desc_file +
    * message_type encoder config) and avro (writer schema JSON). Returns
    * None for string codecs so callers fall through to [[encode]].
    */
  def encodeBinaryOpt(df: DataFrame, codec: String,
                      conf: Map[String, Any]): Option[Column] = codec match {
    case "protobuf" =>
      val pm = anyMap(conf.getOrElse("protobuf", null))
      val schema = (pm.get("desc_file"), pm.get("message_type")) match {
        case (Some(d), Some(mt)) =>
          graft.codecs.ProtobufCodec.fromDescriptorSet(
            java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(d.toString)), mt.toString)
        case _ => throw new IllegalArgumentException(
          "encoding.protobuf needs desc_file and message_type")
      }
      // encode by the descriptor's field names; absent event fields ride
      // as nulls (proto3 unset)
      val cols = schema.sparkType.fields.toSeq.map(f =>
        (if (df.columns.contains(f.name)) col(f.name) else lit(null))
          .cast(f.dataType).as(f.name))
      Some(graft.codecs.ProtobufCodec.encode(schema, struct(cols: _*)))
    case "avro" =>
      val am = anyMap(conf.getOrElse("avro", null))
      val schemaJson = am.getOrElse("schema",
        throw new IllegalArgumentException(
          "encoding.avro.schema is required")).toString
      Some(graft.codecs.AvroCodec.encode(schemaJson,
        struct(userFields(df).map(col): _*)))
    case "native" =>
      // protobuf EventWrapper{log} of the event's field map
      Some(graft.codecs.NativeCodec.encode(
        to_json(struct(userFields(df).map(col): _*))))
    case "otlp" =>
      // encoding/format/otlp: a single-LogRecord export envelope per
      // event (batching happens at the transport layer)
      import graft.codecs.ProtobufCodec
      val ts = Seq("timestamp", "ts").find(df.columns.contains)
        .map(c => (unix_micros(col(c).cast("timestamp")) * 1000L))
        .getOrElse(lit(0L))
      val msg =
        if (df.columns.contains("message")) col("message").cast("string")
        else to_json(struct(userFields(df).map(col): _*))
      val sevText = Seq("severity_text", "level", "severity")
        .find(df.columns.contains).map(col(_).cast("string"))
        .getOrElse(lit(""))
      val rec = struct(
        ts.as("time_unix_nano"),
        lit(0L).as("severity_number"),
        sevText.as("severity_text"),
        struct(msg.as("string_value")).as("body"),
        lit(0L).as("dropped_attributes_count"),
        lit(Array.emptyByteArray).as("trace_id"),
        lit(Array.emptyByteArray).as("span_id"),
        ts.as("observed_time_unix_nano"))
      val envelope = struct(array(struct(
        array(struct(array(rec).as("log_records"),
          lit("").as("schema_url"))).as("scope_logs"),
        lit("").as("schema_url"))).as("resource_logs"))
      Some(ProtobufCodec.encode(ProtobufCodec.Otlp.ExportLogsServiceRequest,
        envelope))
    case _ => None
  }

  /** The serialized-line column for a sink: binary codecs when
    * configured, else the string codec (as binary UTF-8 never
    * round-trips wrong, callers write bytes either way).
    */
  def encodeLine(df: DataFrame, codec: String,
                 conf: Map[String, Any]): Column =
    encodeBinaryOpt(df, codec, conf)
      .getOrElse(encode(df, codec, conf))

  /** Extract a line cell written by [[encodeLine]] as bytes. */
  def rowBytes(r: org.apache.spark.sql.Row, i: Int): Array[Byte] =
    r.get(i) match {
      case null => null
      case b: Array[Byte] => b
      case s: String => s.getBytes("UTF-8")
      case other => other.toString.getBytes("UTF-8")
    }

  /** Apply framing to one serialized frame: varint_length_delimited
    * prefixes the uvarint byte length (the encoding side of the
    * ClickHouse protobuf stream); everything else appends the delimiter.
    */
  def frameBytes(payload: Array[Byte], method: String,
                 delim: Array[Byte]): Array[Byte] = method match {
    case "varint_length_delimited" =>
      val out = new java.io.ByteArrayOutputStream(payload.length + 5)
      var v = payload.length.toLong
      while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
      out.write(payload)
      out.toByteArray
    case "length_delimited" =>
      // 32-bit big-endian length prefix (tokio-util default)
      val n = payload.length
      Array[Byte]((n >>> 24).toByte, (n >>> 16).toByte,
        (n >>> 8).toByte, n.toByte) ++ payload
    case _ => payload ++ delim
  }

  /** A string Column → its JSON string literal (quoted + escaped), via
    * Jackson's own escaping: serialize a one-field struct and strip the
    * `{"v":` … `}` wrapper, so escaping can never drift from to_json's.
    */
  def jsonStringLit(c: Column): Column = {
    val j = to_json(struct(c.cast("string").as("v")))
    when(c.isNull, lit("\"\""))
      .otherwise(substring(j, lit(6), length(j) - 6))
  }

  /** Framing method → the delimiter bytes appended after each frame
    * (newline_delimited default for text sinks; character_delimited takes
    * the configured character; bytes = no delimiter —
    * lib/codecs/src/encoding/framing/).
    */
  def frameDelimiter(method: String, delimiter: String = "\n"): Array[Byte] =
    method match {
      case "newline_delimited" | "" => "\n".getBytes("UTF-8")
      case "character_delimited" => delimiter.getBytes("UTF-8")
      case "bytes" => Array.emptyByteArray
      // per-frame length prefixes; applied by frameBytes, no delimiter
      case "varint_length_delimited" | "length_delimited" =>
        Array.emptyByteArray
      case other =>
        throw new IllegalArgumentException(s"unsupported sink framing: $other")
    }

  /** Wrap an OutputStream per the sink `compression` option
    * (src/sinks/file/mod.rs:162-176: none | gzip | zstd). Appending
    * whole members to an existing file stays valid for both formats
    * (multi-member gzip/zstd streams decode as concatenation).
    */
  def compress(out: java.io.OutputStream, compression: String): java.io.OutputStream =
    compression match {
      case "none" | "" => out
      case "gzip" => new java.util.zip.GZIPOutputStream(out)
      case "zstd" => new com.github.luben.zstd.ZstdOutputStream(out)
      case other =>
        throw new IllegalArgumentException(s"unsupported compression: $other")
    }

  /** File-extension convention for compressed sink files (the reference
    * requires the extension be explicit in the path template; we expose
    * the mapping for tests/docs).
    */
  def extension(compression: String): String = compression match {
    case "gzip" => ".gz"
    case "zstd" => ".zst"
    case _ => ""
  }
}
