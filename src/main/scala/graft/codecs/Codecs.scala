package graft.codecs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.{RegexStruct, Vrl}

/** Codec surface — the reference's decoder/encoder/framing stack.
  *
  * Reference: /root/reference/lib/codecs/ — decoders `bytes, json,
  * native_json, gelf, syslog, influxdb, csv, …` (decoding/format/),
  * framing `newline_delimited, character_delimited, octet_counting,
  * length_delimited, …` (decoding/framing/), encoders `json, csv, logfmt,
  * text, gelf, cef, syslog, raw_message, …` (encoding/format/).
  *
  * Spark-first: every decoder is a Column expression over a string/binary
  * column (codegen; schema flows through Catalyst), so a source is
  * `frames -> explode -> decode` and a sink is `encode -> write`. Only
  * the byte-counting framings fall back to UDFs — they are inherently
  * sequential per chunk and sit at the source edge, not the hot path.
  */
object Framing {

  /** newline_delimited framing: one chunk -> array of lines. */
  def newlineDelimited(c: Column): Column =
    filter(split(c, "\n"), l => length(l) > 0)

  /** character_delimited framing. */
  def characterDelimited(c: Column, delim: String): Column =
    split(c, java.util.regex.Pattern.quote(delim))

  /** octet_counting framing (RFC6587 syslog): `N <N bytes>` repeated.
    * Sequential scan per chunk -> UDF at the source edge.
    */
  val octetCounting: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (chunk: String) =>
      if (chunk == null) null
      else {
        val out = scala.collection.mutable.ListBuffer[String]()
        var i = 0
        var ok = true
        while (ok && i < chunk.length) {
          val sp = chunk.indexOf(' ', i)
          ok = sp > i && chunk.substring(i, sp).forall(_.isDigit)
          if (ok) {
            val n = chunk.substring(i, sp).toInt
            ok = sp + 1 + n <= chunk.length
            if (ok) { out += chunk.substring(sp + 1, sp + 1 + n); i = sp + 1 + n }
          }
        }
        out.toSeq
      }
    }

  /** varint_length_delimited framing (reference decoding/framing/
    * varint_length_delimited.rs): repeated `[uvarint len][payload]`.
    * Truncated trailing frames are dropped, like the reference's
    * incomplete-frame handling.
    */
  val varintLengthDelimited: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (chunk: Array[Byte]) =>
      if (chunk == null) null
      else {
        val out = scala.collection.mutable.ListBuffer[Array[Byte]]()
        var i = 0
        var ok = true
        while (ok && i < chunk.length) {
          var len = 0L; var shift = 0; var b = 0
          do {
            ok = i < chunk.length && shift < 70
            if (ok) { b = chunk(i) & 0xFF; i += 1; len |= (b & 0x7FL) << shift; shift += 7 }
          } while (ok && (b & 0x80) != 0)
          if (ok) {
            ok = len >= 0 && i + len <= chunk.length
            if (ok) {
              out += java.util.Arrays.copyOfRange(chunk, i, i + len.toInt)
              i += len.toInt
            }
          }
        }
        out.toSeq
      }
    }

  /** varint frame packer (the encoding side of the same framing). */
  val varintPack: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (parts: Seq[String]) =>
      if (parts == null) null
      else {
        val out = new java.io.ByteArrayOutputStream()
        parts.foreach { p =>
          val b = p.getBytes("UTF-8")
          var v = b.length.toLong
          while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
          out.write(v.toInt)
          out.write(b)
        }
        out.toByteArray
      }
    }

  /** One GELF chunk header+payload (public GELF spec: 0x1e 0x0f magic,
    * 8-byte message id, sequence number, sequence count, payload) —
    * reference decoding/framing/chunked_gelf.rs.
    */
  final case class GelfChunk(msg_id: Long, seq: Int, total: Int,
                             payload: Array[Byte])

  val gelfChunkParse: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (chunk: Array[Byte]) =>
      if (chunk == null || chunk.length < 12 ||
          (chunk(0) & 0xFF) != 0x1e || (chunk(1) & 0xFF) != 0x0f) null
      else {
        var id = 0L
        (2 until 10).foreach(i => id = (id << 8) | (chunk(i) & 0xFFL))
        GelfChunk(id, chunk(10) & 0xFF, chunk(11) & 0xFF,
          java.util.Arrays.copyOfRange(chunk, 12, chunk.length))
      }
    }

  /** GELF chunk builder (test/sink side): split a payload into n chunks
    * with the given message id.
    */
  val gelfChunksOf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (msgId: Long, payload: String, n: Int) =>
      val bytes = payload.getBytes("UTF-8")
      val per = math.max(1, (bytes.length + n - 1) / n)
      val parts = bytes.grouped(per).toSeq.take(255)
      parts.zipWithIndex.map { case (p, i) =>
        val out = new java.io.ByteArrayOutputStream()
        out.write(0x1e); out.write(0x0f)
        (0 until 8).foreach(j => out.write(((msgId >>> ((7 - j) * 8)) & 0xFF).toInt))
        out.write(i); out.write(parts.length)
        out.write(p)
        out.toByteArray
      }
    }

  /** chunked_gelf reassembly: group chunk frames by message id, order by
    * sequence number, and concatenate payloads; messages missing chunks
    * are dropped (chunked_gelf.rs timeout/discard semantics). One
    * shuffle on msg_id — at scale this is the partition key a GELF
    * source would already be keyed by.
    */
  def chunkedGelf(df: org.apache.spark.sql.DataFrame,
                  chunkCol: Column): org.apache.spark.sql.DataFrame = {
    val glue = udf { (parts: Seq[Array[Byte]]) =>
      new String(parts.flatten.toArray, "UTF-8")
    }
    df.select(gelfChunkParse(chunkCol).as("c"))
      .filter(col("c").isNotNull)
      .groupBy(col("c.msg_id").as("msg_id"))
      .agg(
        max(col("c.total")).as("total"),
        count(lit(1)).cast("int").as("n_chunks"),
        array_sort(collect_list(struct(col("c.seq"), col("c.payload"))))
          .as("ordered"))
      .filter(col("n_chunks") === col("total"))
      .select(col("msg_id"), col("n_chunks"),
        glue(transform(col("ordered"), x => x.getField("payload")))
          .as("message"))
  }

  /** length_delimited framing: 4-byte big-endian length prefix. */
  val lengthDelimited: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (chunk: Array[Byte]) =>
      if (chunk == null) null
      else {
        val out = scala.collection.mutable.ListBuffer[Array[Byte]]()
        val bb = java.nio.ByteBuffer.wrap(chunk)
        while (bb.remaining() >= 4) {
          val n = bb.getInt
          if (n >= 0 && bb.remaining() >= n) {
            val frame = new Array[Byte](n)
            bb.get(frame)
            out += frame
          } else bb.position(bb.limit())
        }
        out.toSeq
      }
    }
}

object Decode {

  /** syslog RFC5424:
    * `<PRI>VERSION TIMESTAMP HOSTNAME APP-NAME PROCID MSGID SD MSG`.
    * One regex pass (RegexStruct); `-` nil values become null.
    */
  def syslog5424(c: Column): Column = syslog5424From(syslog5424Tokens(c))

  /** Raw scan of [[syslog5424]], exposed so callers can materialize it
    * (withColumn barrier) — the result struct extracts 11 fields, and
    * un-materialized the regex is inlined once per field.
    */
  def syslog5424Tokens(c: Column): Column = {
    val pat = "^<(\\d{1,3})>(\\d{1,2}) (\\S+) (\\S+) (\\S+) (\\S+) (\\S+) " +
      "(-|(?:\\[[^\\]]*\\])+)(?: (.*))?$"
    RegexStruct(c, pat, Seq("pri", "version", "ts", "hostname",
      "appname", "procid", "msgid", "sd", "message"))
  }

  def syslog5424From(g: Column): Column = {
    val pri = g.getField("pri").cast("int")
    def nil(f: String): Column = nullif(g.getField(f), lit("-"))
    struct(
      pri.as("priority"),
      // the reference's syslog decoder emits facility/severity as
      // KEYWORD strings, not codes (decoding/format/syslog.rs:342-358
      // `severity.as_str()` / `facility.as_str()`; the source docs list
      // them as type string with examples "notice")
      graft.functions.Vrl.toSyslogFacility((pri / 8).cast("int"))
        .as("facility"),
      graft.functions.Vrl.toSyslogLevel(pmod(pri, lit(8))).as("severity"),
      g.getField("version").cast("int").as("version"),
      nil("ts").cast("timestamp").as("timestamp"),
      nil("hostname").as("hostname"),
      nil("appname").as("appname"),
      nil("procid").as("procid"),
      nil("msgid").as("msgid"),
      nil("sd").as("structured_data"),
      coalesce(g.getField("message"), lit("")).as("message"))
  }

  /** GELF (Graylog extended log format) — a JSON envelope with fixed
    * fields; `_`-prefixed keys are additional fields
    * (reference lib/codecs/src/decoding/format/gelf.rs).
    */
  def gelf(c: Column): Column = gelfFrom(gelfTokens(c))

  /** The single JSON parse of [[gelf]] — materialize it: the struct
    * reads 7 fields from the map, each re-running the parse otherwise.
    */
  def gelfTokens(c: Column): Column =
    from_json(c, lit("MAP<STRING, STRING>"),
      new java.util.HashMap[String, String]())

  def gelfFrom(m: Column): Column = {
    struct(
      element_at(m, "version").as("version"),
      element_at(m, "host").as("host"),
      element_at(m, "short_message").as("short_message"),
      element_at(m, "full_message").as("full_message"),
      timestamp_seconds(element_at(m, "timestamp").cast("double"))
        .as("timestamp"),
      element_at(m, "level").cast("int").as("level"),
      map_filter(m, (k, _) => k.startsWith("_")).as("additional"))
  }

  /** statsd line protocol: `name:value|type[|@rate][|#tag:v,tag:v]`
    * (reference src/sources/statsd/parser).
    */
  def statsd(c: Column): Column = statsdFrom(statsdTokens(c))

  def statsdTokens(c: Column): Column = {
    val pat = "^([^:]+):([-+]?[0-9.]+)\\|(c|g|ms|s|h|d)(?:\\|@([0-9.]+))?" +
      "(?:\\|#(.*))?$"
    RegexStruct(c, pat, Seq("name", "value", "mtype", "rate", "tags"))
  }

  def statsdFrom(g: Column): Column = {
    struct(
      g.getField("name").as("name"),
      g.getField("value").cast("double").as("value"),
      g.getField("mtype").as("metric_type"),
      coalesce(g.getField("rate").cast("double"), lit(1.0)).as("sample_rate"),
      when(g.getField("tags").isNotNull,
        str_to_map(g.getField("tags"), lit(","), lit(":"))).as("tags"))
  }

  /** InfluxDB line protocol:
    * `measurement[,tag=v,...] field=v[,field=v] [ts]`
    * (reference lib/codecs decoding influxdb).
    */
  def influxLine(c: Column): Column = influxFrom(influxTokens(c))

  def influxTokens(c: Column): Column = {
    val pat = "^([^, ]+)(?:,([^ ]+))? ([^ ]+)(?: (\\d+))?$"
    RegexStruct(c, pat, Seq("measurement", "tags", "fields", "ts"))
  }

  def influxFrom(g: Column): Column = {
    // influx tags/fields never contain quoted separators -> the plain
    // codegen'd str_to_map split, not the quote-aware parser
    struct(
      g.getField("measurement").as("measurement"),
      when(g.getField("tags").isNotNull,
        str_to_map(g.getField("tags"), lit(","), lit("="))).as("tags"),
      transform_values(
        str_to_map(g.getField("fields"), lit(","), lit("=")),
        (_, v) => regexp_replace(v, "i$", "").cast("double")).as("fields"),
      // integer ns→µs: Column `/` is DOUBLE division and ns epochs
      // (~1.7e18) exceed double's 2^53 exact range — go through
      // decimal(20,0), whose division is exact, then truncate
      timestamp_micros(
        (g.getField("ts").cast("decimal(20,0)") / lit(1000)).cast("long"))
        .as("timestamp"))
  }

  /** Prometheus exposition text line: `name{tag="v",...} value [ts]` —
    * the scrape-source decoder (reference src/sources/prometheus/ +
    * lib/prometheus-parser). Inverse of [[Encode.prometheusLine]].
    */
  def prometheusLine(c: Column): Column =
    prometheusFrom(prometheusTokens(c))

  def prometheusTokens(c: Column): Column = {
    val pat = "^([a-zA-Z_:][a-zA-Z0-9_:]*)(?:\\{([^}]*)\\})? " +
      "([-+]?[0-9.eE+-]+|NaN|[-+]?Inf)(?: (\\d+))?$"
    RegexStruct(c, pat, Seq("name", "tags", "value", "ts"))
  }

  def prometheusFrom(g: Column): Column = {
    // label values may contain commas / equals / escaped quotes, so a
    // plain str_to_map split is wrong: extract whole `key="…"` pairs
    // with a backslash-escape-aware regex, then unescape \" and \\
    val pairPat = "([a-zA-Z_][a-zA-Z0-9_]*)=\"((?:[^\"\\\\]|\\\\.)*)\""
    val tags = map_from_entries(transform(
      regexp_extract_all(g.getField("tags"), lit(pairPat), lit(0)),
      p => struct(
        regexp_extract(p, "^([a-zA-Z_][a-zA-Z0-9_]*)=", 1),
        {
          // Prometheus label escapes are exactly \\ \" \n, and \n must
          // decode to a LINE FEED (not the letter n). A naive generic
          // `\\(.)` -> `$1` pass gets \n wrong, and replacing \n first
          // gets `\\n` (escaped backslash + n) wrong — so park `\\` in a
          // NUL sentinel, decode \n, strip the rest, restore backslashes.
          val raw = regexp_extract(p, "^[^=]*=\"((?:[^\"\\\\]|\\\\.)*)\"$", 1)
          val parkedBs = regexp_replace(raw, "\\\\\\\\", "\u0000")
          val withNl = regexp_replace(parkedBs, "\\\\n", "\n")
          val unescaped = regexp_replace(withNl, "\\\\(.)", "$1")
          regexp_replace(unescaped, "\u0000", "\\\\")
        })))
    val vRaw = g.getField("value")
    // Spark's string→double cast rejects the Prometheus "Inf" spelling
    val value = when(vRaw === "+Inf" || vRaw === "Inf",
        lit(Double.PositiveInfinity))
      .when(vRaw === "-Inf", lit(Double.NegativeInfinity))
      .otherwise(vRaw.cast("double"))
    struct(
      g.getField("name").as("name"),
      when(g.getField("tags").isNotNull, tags).as("tags"),
      value.as("value"),
      timestamp_millis(g.getField("ts").cast("long")).as("timestamp"))
  }

  /** Vector native_json envelope: `{"log": {...}}` / `{"metric": {...}}`
    * (reference lib/codecs/src/decoding/format/native_json.rs). Returns
    * (kind, payload-json) — downstream decodes payload with its schema.
    */
  def nativeJsonKind(c: Column): Column =
    when(get_json_object(c, "$.log").isNotNull, "log")
      .when(get_json_object(c, "$.metric").isNotNull, "metric")
      .when(get_json_object(c, "$.trace").isNotNull, "trace")
}

object Encode {

  /** CEF (common event format) encoder:
    * `CEF:0|vendor|product|version|signature|name|severity|extensions`
    * (reference lib/codecs/src/encoding/format/cef.rs). Header pipes are
    * escaped; extensions are space-joined key=value.
    */
  def cef(vendor: String, product: String, version: String,
          signatureId: Column, name: Column, severity: Column,
          extensions: Seq[(String, Column)]): Column = {
    def esc(c: Column): Column =
      regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "\\|", "\\\\|")
    val ext = concat_ws(" ",
      extensions.map { case (k, v) => concat(lit(k + "="), v.cast("string")) }: _*)
    concat_ws("|", lit("CEF:0"), lit(vendor), lit(product), lit(version),
      esc(signatureId.cast("string")), esc(name.cast("string")),
      severity.cast("string"), ext)
  }

  /** Prometheus exposition text format, one line per sample:
    * `name{tag="v",...} value` (reference src/sinks/prometheus/exporter
    * + collector). Tags render sorted by key for determinism.
    */
  def prometheusLine(name: Column, tags: Column, value: Column): Column = {
    val renderedTags = array_join(
      transform(array_sort(map_entries(tags)),
        e => concat(e.getField("key"), lit("=\""),
          e.getField("value"), lit("\""))), ",")
    concat(name,
      when(size(map_entries(tags)) > 0,
        concat(lit("{"), renderedTags, lit("}"))).otherwise(lit("")),
      lit(" "), value.cast("string"))
  }

  /** Syslog RFC3164 encoder (reference encoding syslog). */
  def syslog3164(pri: Column, ts: Column, host: Column, app: Column,
                 procid: Column, msg: Column): Column =
    format_string("<%d>%s %s %s[%d]: %s", pri.cast("int"),
      date_format(ts, "MMM dd HH:mm:ss"), host, app, procid.cast("long"), msg)

  /** logfmt encoder (map -> `k=v k2="v 2"`), delegates to Vrl. */
  def logfmt(m: Column): Column = Vrl.encodeLogfmt(m)

  /** GELF encoder. */
  def gelf(host: Column, shortMessage: Column, ts: Column,
           level: Column): Column =
    to_json(struct(
      lit("1.1").as("version"), host.as("host"),
      shortMessage.as("short_message"),
      unix_timestamp(ts).cast("double").as("timestamp"),
      level.as("level")))
}
