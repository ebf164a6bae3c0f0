package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.codecs.{Decode, Encode, Framing}

/** Oracle-checked queries for the codec surface (SURVEY §2.6). Decoders
  * are ROUND-TRIP checked: a line is synthesized from source columns,
  * decoded by the graft codec, and the oracle recomputes the expected
  * fields straight from the source columns — a parser defect breaks
  * equality. Encoders are checked against string-built oracles.
  */
object CodecQueries {

  import Queries.Q

  private def ev(s: SparkSession, dir: String): DataFrame =
    Graft.table(s, dir, "events")
      .withColumn("k", Graft.jsonLong(col("props"), "k"))

  val queries: Map[String, Q] = Map(
    "codec_syslog5424" -> { (s, dir) =>
      val line = format_string(
        "<%d>1 %s host%d app%d %d ID%d - %s happened",
        pmod(col("k"), lit(192)).cast("int"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        col("user_id"), pmod(col("user_id"), lit(5)), col("k") + 1,
        pmod(col("k"), lit(10)), col("event_type"))
      Queries.withParsed(ev(s, dir).withColumn("__t", Decode.syslog5424Tokens(line)),
        Decode.syslog5424From(col("__t"))) { p => Seq(
        col("event_id"),
        p.getField("facility").as("facility"),
        p.getField("severity").as("severity"),
        p.getField("version").as("version"),
        p.getField("timestamp").as("sl_ts"),
        p.getField("hostname").as("hostname"),
        p.getField("appname").as("appname"),
        p.getField("procid").cast("long").as("procid"),
        p.getField("msgid").as("msgid"),
        p.getField("structured_data").as("sd"),
        p.getField("message").as("message"))
      }.orderBy(col("event_id"))
    },

    "codec_statsd" -> { (s, dir) =>
      val line = concat(col("event_type"), lit(":"), col("k"),
        lit("|c|@0.5|#env:prod,team:t"), pmod(col("user_id"), lit(3)))
      Queries.withParsed(ev(s, dir).withColumn("__t", Decode.statsdTokens(line)),
        Decode.statsdFrom(col("__t"))) { p => Seq(
        col("event_id"),
        p.getField("name").as("name"),
        p.getField("value").as("value"),
        p.getField("metric_type").as("metric_type"),
        p.getField("sample_rate").as("sample_rate"),
        element_at(p.getField("tags"), "env").as("tag_env"),
        element_at(p.getField("tags"), "team").as("tag_team"))
      }.orderBy(col("event_id"))
    },

    "codec_influx" -> { (s, dir) =>
      val line = format_string(
        "cpu,host=h%d,region=r%d usage=%d,idle=%di %d000000000",
        col("user_id"), pmod(col("user_id"), lit(3)),
        col("k"), col("k") * 2, unix_timestamp(col("ts")))
      Queries.withParsed(ev(s, dir).withColumn("__t", Decode.influxTokens(line)),
        Decode.influxFrom(col("__t"))) { p => Seq(
        col("event_id"),
        p.getField("measurement").as("measurement"),
        element_at(p.getField("tags"), "host").as("tag_host"),
        element_at(p.getField("fields"), "usage").as("usage"),
        element_at(p.getField("fields"), "idle").as("idle"),
        p.getField("timestamp").as("il_ts"))
      }.orderBy(col("event_id"))
    },

    "codec_gelf" -> { (s, dir) =>
      val line = Encode.gelf(
        concat(lit("host"), col("user_id")), col("event_type"),
        col("ts"), pmod(col("k"), lit(8)).cast("int"))
      Queries.withParsed(ev(s, dir).withColumn("__t", Decode.gelfTokens(line)),
        Decode.gelfFrom(col("__t"))) { p => Seq(
        col("event_id"),
        p.getField("version").as("version"),
        p.getField("host").as("host"),
        p.getField("short_message").as("short_message"),
        p.getField("timestamp").as("g_ts"),
        p.getField("level").as("level"))
      }.orderBy(col("event_id"))
    },

    // native (event.proto) roundtrip: event fields -> EventWrapper
    // bytes -> decode -> extract — the oracle recomputes every field
    // from the source columns, so any Value-tree encode/decode defect
    // breaks equality
    "codec_native_rt" -> { (s, dir) =>
      import graft.codecs.NativeCodec
      val json = to_json(struct(
        col("event_id"), col("event_type"), col("user_id"),
        round(col("value"), 2).as("v2"), col("k")))
      val dec = NativeCodec.decode(NativeCodec.encode(json))
      ev(s, dir).withColumn("__d", dec).select(
        col("event_id"),
        col("__d").getField("kind").as("kind"),
        get_json_object(col("__d").getField("json"), "$.event_type")
          .as("etype"),
        get_json_object(col("__d").getField("json"), "$.user_id")
          .cast("long").as("uid"),
        get_json_object(col("__d").getField("json"), "$.v2")
          .cast("double").as("v2"),
        get_json_object(col("__d").getField("json"), "$.k")
          .cast("long").as("k2"))
        .orderBy(col("event_id"))
    },

    "codec_cef" -> { (s, dir) =>
      ev(s, dir).select(
        col("event_id"),
        Encode.cef("graft", "engine", "1.0",
          signatureId = col("k"), name = col("event_type"),
          severity = pmod(col("k"), lit(10)),
          extensions = Seq(
            "suser" -> concat(lit("u"), col("user_id")),
            "cnt" -> col("k"))).as("cef"))
        .orderBy(col("event_id"))
    },

    "codec_prometheus" -> { (s, dir) =>
      ev(s, dir).select(
        col("event_id"),
        Encode.prometheusLine(
          lit("events_total"),
          map(lit("type"), col("event_type"),
            lit("host"), concat(lit("h"), pmod(col("user_id"), lit(5)))),
          col("k").cast("long")).as("line"))
        .orderBy(col("event_id"))
    },

    // encoder -> decoder round trip; oracle recomputes from columns
    // datadog_agent /api/v2/series intake: each event becomes a
    // MetricPayload (the repo's own proto encoder), decoded by the
    // SAME decode leg the HTTP source runs (DdAgentIntake
    // .decodeSeriesV2) — COUNT/RATE/GAUGE mapping, rate×interval
    // scaling, host/device resources, source_type_name tag, and
    // namespace splitting are all oracle-recomputed from the source
    // columns
    "dd_agent_v2" -> { (s, dir) =>
      import graft.codecs.ProtobufCodec
      import graft.streaming.DdAgentIntake
      val e = ev(s, dir)
      val typ = when(pmod(col("k"), lit(3)) === 0, 1L)
        .when(pmod(col("k"), lit(3)) === 1, 2L).otherwise(3L)
      val series = struct(
        array(struct(lit("host").as("type"),
          concat(lit("h"), pmod(col("user_id"), lit(4))).as("name")))
          .as("resources"),
        concat(lit("app."), col("event_type")).as("metric"),
        array(lit("env:prod")).as("tags"),
        array(struct(round(col("value"), 2).as("value"),
          unix_timestamp(col("ts")).as("timestamp"))).as("points"),
        typ.as("type"), lit("").as("unit"),
        when(pmod(col("k"), lit(2)) === 0, "check").otherwise("")
          .as("source_type_name"),
        when(typ === 2L, 10L).otherwise(0L).as("interval"))
      val bytes = ProtobufCodec.encode(DdAgentIntake.metricPayloadSchema,
        struct(array(series).as("series")))
      val dec = udf((b: Array[Byte]) => DdAgentIntake.decodeSeriesV2(b))
      e.withColumn("__m", explode(dec(bytes)))
        .select(col("event_id"),
          col("__m.namespace").as("namespace"),
          col("__m.name").as("name"),
          col("__m.kind").as("kind"),
          col("__m.value_type").as("value_type"),
          col("__m.counter_value").as("counter_value"),
          col("__m.gauge_value").as("gauge_value"),
          col("__m.interval_ms").as("interval_ms"),
          col("__m.host").as("host"),
          element_at(col("__m.tags"), "env").as("tag_env"),
          element_at(col("__m.tags"), "source_type_name")
            .as("source_type_name"))
        .orderBy(col("event_id"))
    },

    // datadog_agent /api/v0.2/traces intake: each event becomes a
    // one-trace/one-span TracePayload (older form), decoded by the
    // SAME decode leg the HTTP source runs — trace/span field mapping,
    // ns timestamps, meta map, and the forced-i64 id convention are
    // all oracle-recomputed from the source columns
    "dd_agent_traces" -> { (s, dir) =>
      import graft.codecs.ProtobufCodec
      import graft.streaming.DdAgentIntake
      val e = ev(s, dir)
      val startNs = unix_micros(col("ts")) * 1000
      val span = struct(
        concat(lit("svc"), pmod(col("user_id"), lit(5))).as("service"),
        col("event_type").as("name"),
        concat(lit("GET /"), col("k")).as("resource"),
        col("event_id").as("trace_id"),
        (col("event_id") * 2 + 1).as("span_id"),
        lit(0L).as("parent_id"),
        startNs.as("start"),
        (col("k") * 1000).as("duration"),
        pmod(col("k"), lit(2)).as("error"),
        array(struct(lit("http.method").as("key"),
          lit("GET").as("value"))).as("meta"),
        lit(null).cast("array<struct<key:string,value:double>>")
          .as("metrics"),
        lit("web").as("type"))
      val payload = struct(
        concat(lit("h"), pmod(col("user_id"), lit(4))).as("host_name"),
        lit("prod").as("env"),
        array(struct(
          col("event_id").as("trace_id"),
          array(span).as("spans"),
          startNs.as("start_time"),
          (startNs + col("k") * 1000).as("end_time"))).as("traces"),
        lit(null).cast(DdAgentIntake.tracePayloadSchema.sparkType
          .apply("transactions").dataType).as("transactions"),
        lit(null).cast(DdAgentIntake.tracePayloadSchema.sparkType
          .apply("tracer_payloads").dataType).as("tracer_payloads"),
        lit(null).cast("array<struct<key:string,value:string>>")
          .as("tags"),
        lit(null).cast("string").as("agent_version"),
        lit(null).cast("double").as("target_tps"),
        lit(null).cast("double").as("error_tps"))
      val bytes = ProtobufCodec.encode(DdAgentIntake.tracePayloadSchema,
        payload)
      val dec = udf((b: Array[Byte]) => DdAgentIntake.decodeTraces(b))
      e.withColumn("__t", explode(dec(bytes)))
        .select(col("event_id"),
          col("__t.payload_version").as("payload_version"),
          col("__t.host").as("host"),
          col("__t.env").as("env"),
          col("__t.trace_id").as("trace_id"),
          col("__t.start_time_ns").as("start_ns"),
          col("__t.end_time_ns").as("end_ns"),
          element_at(col("__t.spans"), 1).getField("service")
            .as("service"),
          element_at(col("__t.spans"), 1).getField("name")
            .as("span_name"),
          element_at(col("__t.spans"), 1).getField("resource")
            .as("resource"),
          element_at(col("__t.spans"), 1).getField("span_id")
            .as("span_id"),
          element_at(col("__t.spans"), 1).getField("duration")
            .as("duration"),
          element_at(col("__t.spans"), 1).getField("error").as("error"),
          element_at(element_at(col("__t.spans"), 1).getField("meta"),
            "http.method").as("meta_method"))
        .orderBy(col("event_id"))
    },

    // datadog_agent /api/beta/sketches intake: each event becomes a
    // one-sample dogsketch (bucket idx = the DDSketch lane), encoded
    // through SketchPayload proto and decoded by the HTTP source's
    // decode leg; decoded buckets then MERGE per group and the
    // DDSketch quantile walk reads the result — the oracle rebuilds
    // the identical bucket layout and quantile ranks in SQL
    "dd_agent_sketch" -> { (s, dir) =>
      import graft.codecs.ProtobufCodec
      import graft.streaming.DdAgentIntake
      import graft.model.DDSketch
      val e = ev(s, dir).where(col("value") > 1e-9)
      val lane = ceil(log(col("value")) / log(lit(DDSketch.DefaultGamma)))
        .cast("long")
      val sketch = struct(array(struct(
        concat(lit("lat."), col("event_type")).as("metric"),
        concat(lit("h"), pmod(col("user_id"), lit(4))).as("host"),
        array(lit("env:prod")).as("tags"),
        array(struct(unix_timestamp(col("ts")).as("ts"),
          lit(1L).as("cnt"), round(col("value"), 2).as("min"),
          round(col("value"), 2).as("max"),
          round(col("value"), 2).as("avg"),
          round(col("value"), 2).as("sum"),
          array(lane).as("k"), array(lit(1L)).as("n")))
          .as("dogsketches"))).as("sketches"))
      val bytes = ProtobufCodec.encode(DdAgentIntake.sketchPayloadSchema,
        sketch)
      val dec = udf((b: Array[Byte]) => DdAgentIntake.decodeSketches(b))
      e.withColumn("__m", explode(dec(bytes)))
        .select(col("__m.name").as("event_type"),
          element_at(col("__m.sketch_k"), 1).cast("int").as("idx"),
          element_at(col("__m.sketch_n"), 1).as("cnt"))
        .groupBy(col("event_type"), col("idx"))
        .agg(sum(col("cnt")).as("c"))
        .groupBy(col("event_type"))
        .agg(sum(col("c")).as("n"),
          array_sort(collect_list(struct(col("idx").as("idx"),
            col("c").as("cnt")))).as("__buckets"))
        .select(col("event_type"), col("n"),
          DDSketch.quantileIdx(struct(col("n").as("total"),
            lit(0L).as("zero"), col("__buckets").as("buckets")), 0.5)
            .cast("int").as("q50_idx"),
          DDSketch.quantileIdx(struct(col("n").as("total"),
            lit(0L).as("zero"), col("__buckets").as("buckets")), 0.9)
            .cast("int").as("q90_idx"))
        .orderBy(col("event_type"))
    },

    "codec_prometheus_rt" -> { (s, dir) =>
      val line = Encode.prometheusLine(
        lit("events_total"),
        map(lit("type"), col("event_type"),
          lit("host"), concat(lit("h"), pmod(col("user_id"), lit(5)))),
        col("k").cast("long"))
      Queries.withParsed(ev(s, dir).withColumn("__t", Decode.prometheusTokens(line)),
        Decode.prometheusFrom(col("__t"))) { p => Seq(
        col("event_id"),
        p.getField("name").as("name"),
        element_at(p.getField("tags"), "type").as("tag_type"),
        element_at(p.getField("tags"), "host").as("tag_host"),
        p.getField("value").as("value"))
      }.orderBy(col("event_id"))
    },

    // encoder -> parse_cef roundtrip; the "msg" extension value contains
    // spaces (exercises the next-key-boundary extension parse)
    "codec_cef_rt" -> { (s, dir) =>
      val line = Encode.cef("graft", "engine", "1.0",
        signatureId = col("k"), name = col("event_type"),
        severity = pmod(col("k"), lit(10)),
        extensions = Seq(
          "suser" -> concat(lit("u"), col("user_id")),
          "msg" -> concat(col("event_type"), lit(" at "), col("k"))))
      Queries.withParsed(
        ev(s, dir).withColumn("__g", graft.functions.Vrl.cefTokens(line)),
        graft.functions.Vrl.parseCefFrom(col("__g"))) {
        p => Seq(
          col("event_id"),
          p.getField("cef_version").as("cef_version"),
          p.getField("device_vendor").as("device_vendor"),
          p.getField("event_class_id").cast("long").as("event_class_id"),
          p.getField("name").as("name"),
          p.getField("severity").cast("int").as("severity"),
          element_at(p.getField("extensions"), "suser").as("suser"),
          element_at(p.getField("extensions"), "msg").as("msg"))
      }.orderBy(col("event_id"))
    },

    "codec_framing" -> { (s, dir) =>
      val chunk = concat(
        lit("a"), col("event_id"), lit("\n"),
        lit("b"), col("k"), lit("\n\n"), // empty line dropped by framing
        lit("c"), col("user_id"))
      ev(s, dir).select(col("event_id"),
          posexplode(Framing.newlineDelimited(chunk)).as(Seq("frame_idx", "frame")))
        .orderBy(col("event_id"), col("frame_idx"))
    },

    // Protobuf wire-format roundtrip over the OTLP LogRecord schema.
    // Like codec_avro, the oracle pins the exact encoded byte length
    // (tag bytes + varints + fixed64s + length-delimited segments), so
    // the bytes must be real proto3 wire format.
    "codec_protobuf" -> { (s, dir) =>
      import graft.codecs.ProtobufCodec
      val rec = struct(
        (unix_micros(col("ts")) * 1000).as("time_unix_nano"),
        (pmod(col("k"), lit(24)) + 1).as("severity_number"),
        col("event_type").as("severity_text"),
        struct(col("props").as("string_value")).as("body"),
        lit(null).cast("long").as("dropped_attributes_count"),
        lit(null).cast("binary").as("trace_id"),
        lit(null).cast("binary").as("span_id"),
        lit(null).cast("long").as("observed_time_unix_nano"))
      val encoded = ProtobufCodec.encode(ProtobufCodec.Otlp.LogRecord, rec)
      Queries.withParsed(
        ev(s, dir).withColumn("pbytes", encoded),
        ProtobufCodec.decode(ProtobufCodec.Otlp.LogRecord, col("pbytes"))) {
        p => Seq(
          col("event_id"),
          p.getField("time_unix_nano").as("tns"),
          p.getField("severity_number").as("sev"),
          p.getField("severity_text").as("sev_text"),
          p.getField("body").getField("string_value").as("body_sv"),
          length(col("pbytes")).as("plen"))
      }.orderBy(col("event_id"))
    },

    // varint length-prefix framing + chunked-GELF reassembly
    "codec_framing2" -> { (s, dir) =>
      val packed = Framing.varintPack(array(
        col("event_type"), col("props"), concat(lit("u"), col("user_id"))))
      ev(s, dir).select(col("event_id"),
          posexplode(Framing.varintLengthDelimited(packed))
            .as(Seq("frame_idx", "frame")))
        .select(col("event_id"), col("frame_idx"),
          col("frame").cast("string").as("frame"))
        .orderBy(col("event_id"), col("frame_idx"))
    },

    "codec_gelf_chunked" -> { (s, dir) =>
      val chunks = Framing.gelfChunksOf(col("event_id"),
        concat(col("event_type"), lit(" "), col("props")), lit(3))
      val exploded = ev(s, dir)
        .select(explode(chunks).as("chunk"))
      Framing.chunkedGelf(exploded, col("chunk"))
        .orderBy(col("msg_id"))
    },

    // Avro binary datum roundtrip. The oracle recomputes the decoded
    // fields from the source columns AND the exact encoded byte length
    // from the Avro wire format (zigzag varints + length-prefixed utf8
    // + 8-byte double + 1-byte boolean) — a no-op codec cannot pass.
    "codec_avro" -> { (s, dir) =>
      val schema =
        """{"type":"record","name":"Event","fields":[
          |{"name":"event_id","type":"long"},
          |{"name":"event_type","type":"string"},
          |{"name":"value","type":"double"},
          |{"name":"flag","type":"boolean"}]}""".stripMargin
      val rec = struct(col("event_id"), col("event_type"), col("value"),
        (col("event_type") === "error").as("flag"))
      val encoded = graft.codecs.AvroCodec.encode(schema, rec)
      Queries.withParsed(
        ev(s, dir).withColumn("abytes", encoded),
        graft.codecs.AvroCodec.decode(schema, col("abytes"))) { p => Seq(
          col("event_id"),
          p.getField("event_type").as("a_type"),
          p.getField("value").as("a_value"),
          p.getField("flag").as("a_flag"),
          length(col("abytes")).as("alen"))
      }.orderBy(col("event_id"))
    },

    // The generic source `decoding:` block (ConfigLoader.applyDecoding —
    // the exact code path a YAML `decoding: {codec: syslog}` invokes):
    // rendered RFC5424 lines in, flattened event fields out.
    "decoding_block_syslog" -> { (s, dir) =>
      val line = format_string(
        "<%d>1 %s host%d app%d %d ID%d - %s happened",
        pmod(col("k"), lit(192)).cast("int"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        col("user_id"), pmod(col("user_id"), lit(5)), col("event_id"),
        pmod(col("k"), lit(10)), col("event_type"))
      val raw = ev(s, dir).select(line.as("message"))
      graft.plans.ConfigLoader.applyDecoding(raw,
        Map("decoding" -> java.util.Map.of("codec", "syslog")))
        .select(col("procid").cast("long").as("procid"),
          col("facility"), col("severity"), col("hostname"),
          col("appname"), col("msgid"), col("message"),
          col("timestamp").as("sl_ts"))
        .orderBy(col("procid"))
    },

    // The `framing: {method: octet_counting}` block: one chunk carrying
    // two counted frames explodes to two messages, keeping sibling
    // columns (event_id provenance survives the explode).
    "decoding_block_octet" -> { (s, dir) =>
      val m1 = col("event_type")
      val m2 = concat(lit("X"), col("event_type"))
      val chunk = concat(
        length(m1).cast("string"), lit(" "), m1,
        length(m2).cast("string"), lit(" "), m2)
      val raw = ev(s, dir).select(col("event_id"), chunk.as("message"))
      graft.plans.ConfigLoader.applyDecoding(raw,
        Map("framing" -> java.util.Map.of("method", "octet_counting")))
        .select(col("event_id"), col("message"))
        .orderBy(col("event_id"), col("message"))
    }
  )

  val oracles: Map[String, String] = Map(
    "codec_syslog5424" ->
      """SELECT event_id,
        |  (['kern','user','mail','daemon','auth','syslog','lpr','news','uucp','cron','authpriv','ftp','ntp','security','console','solaris-cron','local0','local1','local2','local3','local4','local5','local6','local7'])[CAST(k % 192 // 8 AS INT) + 1] AS facility,
        |  (['emerg','alert','crit','err','warning','notice','info','debug'])[CAST(k % 192 % 8 AS INT) + 1] AS severity,
        |  CAST(1 AS INT) AS version,
        |  date_trunc('second', CAST(ts AS TIMESTAMP)) AS sl_ts,
        |  'host' || CAST(user_id AS VARCHAR) AS hostname,
        |  'app' || CAST(user_id % 5 AS VARCHAR) AS appname,
        |  k + 1 AS procid,
        |  'ID' || CAST(k % 10 AS VARCHAR) AS msgid,
        |  CAST(NULL AS VARCHAR) AS sd,
        |  event_type || ' happened' AS message
        |FROM (SELECT *, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |      FROM events) ORDER BY event_id""".stripMargin,

    "codec_statsd" ->
      """SELECT event_id, event_type AS name,
        |  CAST(k AS DOUBLE) AS value, 'c' AS metric_type,
        |  CAST(0.5 AS DOUBLE) AS sample_rate,
        |  'prod' AS tag_env,
        |  't' || CAST(user_id % 3 AS VARCHAR) AS tag_team
        |FROM (SELECT *, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |      FROM events) ORDER BY event_id""".stripMargin,

    "codec_influx" ->
      """SELECT event_id, 'cpu' AS measurement,
        |  'h' || CAST(user_id AS VARCHAR) AS tag_host,
        |  CAST(k AS DOUBLE) AS usage, CAST(k * 2 AS DOUBLE) AS idle,
        |  date_trunc('second', CAST(ts AS TIMESTAMP)) AS il_ts
        |FROM (SELECT *, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |      FROM events) ORDER BY event_id""".stripMargin,

    "codec_native_rt" ->
      """SELECT event_id, 'log' AS kind, event_type AS etype,
        |  user_id AS uid, round(value, 2) AS v2, k AS k2
        |FROM (SELECT *, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |      FROM events) ORDER BY event_id""".stripMargin,

    "codec_gelf" ->
      """SELECT event_id, '1.1' AS version,
        |  'host' || CAST(user_id AS VARCHAR) AS host,
        |  event_type AS short_message,
        |  date_trunc('second', CAST(ts AS TIMESTAMP)) AS g_ts,
        |  CAST(k % 8 AS INT) AS level
        |FROM (SELECT *, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |      FROM events) ORDER BY event_id""".stripMargin,

    "codec_cef" ->
      """SELECT event_id,
        |  'CEF:0|graft|engine|1.0|' || CAST(k AS VARCHAR) || '|' || event_type
        |    || '|' || CAST(k % 10 AS VARCHAR)
        |    || '|suser=u' || CAST(user_id AS VARCHAR)
        |    || ' cnt=' || CAST(k AS VARCHAR) AS cef
        |FROM (SELECT *, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |      FROM events) ORDER BY event_id""".stripMargin,

    "codec_prometheus" ->
      """SELECT event_id,
        |  'events_total{host="h' || CAST(user_id % 5 AS VARCHAR)
        |    || '",type="' || event_type || '"} '
        |    || CAST(k AS VARCHAR) AS line
        |FROM (SELECT *, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |      FROM events) ORDER BY event_id""".stripMargin,

    "codec_prometheus_rt" ->
      """SELECT event_id, 'events_total' AS name,
        |  event_type AS tag_type,
        |  'h' || CAST(user_id % 5 AS VARCHAR) AS tag_host,
        |  CAST(k AS DOUBLE) AS value
        |FROM (SELECT *, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |      FROM events) ORDER BY event_id""".stripMargin,

    "codec_cef_rt" ->
      """SELECT event_id,
        |  CAST(0 AS INT) AS cef_version,
        |  'graft' AS device_vendor,
        |  k AS event_class_id,
        |  event_type AS name,
        |  CAST(k % 10 AS INT) AS severity,
        |  'u' || CAST(user_id AS VARCHAR) AS suser,
        |  event_type || ' at ' || CAST(k AS VARCHAR) AS msg
        |FROM (SELECT *, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |      FROM events) ORDER BY event_id""".stripMargin,

    "dd_agent_v2" ->
      """SELECT event_id, 'app' AS namespace, event_type AS name,
        |  CASE WHEN k % 3 = 2 THEN 'absolute' ELSE 'incremental' END AS kind,
        |  CASE WHEN k % 3 = 2 THEN 'gauge' ELSE 'counter' END AS value_type,
        |  CASE WHEN k % 3 = 0 THEN round(value, 2)
        |       WHEN k % 3 = 1 THEN round(value, 2) * 10 END AS counter_value,
        |  CASE WHEN k % 3 = 2 THEN round(value, 2) END AS gauge_value,
        |  CASE WHEN k % 3 = 1 THEN CAST(10000 AS BIGINT) END AS interval_ms,
        |  'h' || CAST(user_id % 4 AS VARCHAR) AS host,
        |  'prod' AS tag_env,
        |  CASE WHEN k % 2 = 0 THEN 'check' END AS source_type_name
        |FROM (SELECT *, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |      FROM events) ORDER BY event_id""".stripMargin,

    "dd_agent_traces" ->
      """SELECT event_id, 'v1' AS payload_version,
        |  'h' || CAST(user_id % 4 AS VARCHAR) AS host,
        |  'prod' AS env,
        |  event_id AS trace_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) * 1000 AS start_ns,
        |  epoch_us(CAST(ts AS TIMESTAMP)) * 1000 + k * 1000 AS end_ns,
        |  'svc' || CAST(user_id % 5 AS VARCHAR) AS service,
        |  event_type AS span_name,
        |  'GET /' || CAST(k AS VARCHAR) AS resource,
        |  event_id * 2 + 1 AS span_id,
        |  k * 1000 AS duration,
        |  k % 2 AS error,
        |  'GET' AS meta_method
        |FROM (SELECT *, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |      FROM events) ORDER BY event_id""".stripMargin,

    "dd_agent_sketch" ->
      """WITH v AS (SELECT event_type, value FROM events WHERE value > 1e-9),
        |nz AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |       FROM v GROUP BY 1),
        |bc AS (SELECT event_type, CAST(ceil(ln(value)/ln(1.02)) AS INT) AS i,
        |         count(*) AS c
        |       FROM v GROUP BY 1, 2),
        |cum AS (SELECT event_type, i,
        |          sum(c) OVER (PARTITION BY event_type ORDER BY i) AS cm
        |        FROM bc),
        |qs AS (SELECT unnest([0.5, 0.9]) AS qq),
        |ranks AS (SELECT nz.event_type, qq,
        |            greatest(1, ceil(qq * nz.n)) AS r
        |          FROM nz, qs),
        |sel AS (SELECT r.event_type, r.qq, min(c.i) AS idx
        |        FROM ranks r LEFT JOIN cum c
        |          ON c.event_type = r.event_type AND c.cm >= r.r
        |        GROUP BY 1, 2)
        |SELECT nz.event_type, nz.n,
        |  CAST(max(CASE WHEN qq = 0.5 THEN idx END) AS INT) AS q50_idx,
        |  CAST(max(CASE WHEN qq = 0.9 THEN idx END) AS INT) AS q90_idx
        |FROM nz LEFT JOIN sel ON sel.event_type = nz.event_type
        |GROUP BY 1, 2 ORDER BY nz.event_type""".stripMargin,

    "codec_framing" ->
      """WITH frames AS (
        |  SELECT event_id,
        |    ['a' || CAST(event_id AS VARCHAR),
        |     'b' || CAST(k AS VARCHAR),
        |     'c' || CAST(user_id AS VARCHAR)] AS fs
        |  FROM (SELECT *, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |        FROM events))
        |SELECT event_id, CAST(i - 1 AS INT) AS frame_idx, fs[i] AS frame
        |FROM frames, (SELECT unnest(range(1, 4)) AS i)
        |ORDER BY event_id, frame_idx""".stripMargin,

    // proto3 wire length: 9 (tag+fixed64) + 2 (tag+small varint) +
    // 2+len(severity_text) + [2 outer + 2 inner + len(body)] — valid
    // while the string lengths stay under one varint byte (<126)
    "codec_protobuf" ->
      """SELECT event_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) * 1000 AS tns,
        |  k % 24 + 1 AS sev,
        |  event_type AS sev_text,
        |  props AS body_sv,
        |  CAST(17 + length(event_type) + length(props) AS INT) AS plen
        |FROM (SELECT *, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |      FROM events) ORDER BY event_id""".stripMargin,

    "codec_framing2" ->
      """WITH frames AS (
        |  SELECT event_id,
        |    [event_type, props, 'u' || CAST(user_id AS VARCHAR)] AS fs
        |  FROM events)
        |SELECT event_id, CAST(i - 1 AS INT) AS frame_idx, fs[i] AS frame
        |FROM frames, (SELECT unnest(range(1, 4)) AS i)
        |ORDER BY event_id, frame_idx""".stripMargin,

    "codec_gelf_chunked" ->
      """SELECT event_id AS msg_id, CAST(3 AS INT) AS n_chunks,
        |  event_type || ' ' || props AS message
        |FROM events ORDER BY msg_id""".stripMargin,

    // wire-format byte length: zigzag-varint(event_id) + varint string
    // length prefix (1 byte for short names) + utf8 bytes + 8 (double)
    // + 1 (boolean)
    "codec_avro" ->
      """SELECT event_id,
        |  event_type AS a_type,
        |  value AS a_value,
        |  event_type = 'error' AS a_flag,
        |  CAST(CASE WHEN 2*event_id < 128 THEN 1
        |            WHEN 2*event_id < 16384 THEN 2
        |            WHEN 2*event_id < 2097152 THEN 3
        |            WHEN 2*event_id < 268435456 THEN 4
        |            ELSE 5 END
        |    + 1 + length(event_type) + 8 + 1 AS INT) AS alen
        |FROM events ORDER BY event_id""".stripMargin,

    "decoding_block_syslog" ->
      """SELECT event_id AS procid,
        |  (['kern','user','mail','daemon','auth','syslog','lpr','news','uucp','cron','authpriv','ftp','ntp','security','console','solaris-cron','local0','local1','local2','local3','local4','local5','local6','local7'])[CAST(k % 192 // 8 AS INT) + 1] AS facility,
        |  (['emerg','alert','crit','err','warning','notice','info','debug'])[CAST(k % 192 % 8 AS INT) + 1] AS severity,
        |  'host' || CAST(user_id AS VARCHAR) AS hostname,
        |  'app' || CAST(user_id % 5 AS VARCHAR) AS appname,
        |  'ID' || CAST(k % 10 AS VARCHAR) AS msgid,
        |  event_type || ' happened' AS message,
        |  date_trunc('second', CAST(ts AS TIMESTAMP)) AS sl_ts
        |FROM (SELECT *, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |      FROM events) ORDER BY procid""".stripMargin,

    "decoding_block_octet" ->
      """SELECT event_id, message FROM (
        |  SELECT event_id, event_type AS message FROM events
        |  UNION ALL
        |  SELECT event_id, 'X' || event_type AS message FROM events)
        |ORDER BY event_id, message""".stripMargin
  )
}
