package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Template

/** Request-body builders for the HTTP-family sinks: elasticsearch (bulk
  * NDJSON), splunk_hec (event JSON), loki (push JSON), datadog_logs
  * (v2 JSON array). Each builder is a pure Column/DataFrame transform
  * producing the per-event (or per-stream) body line; NetworkSinks
  * .writeHttpBody does the transport. Keeping the envelope layer
  * declarative means it is codegen'd, testable without a server, and
  * oracle-checkable.
  */
object Envelopes {

  private def userFields(df: DataFrame): Seq[String] =
    df.schema.fieldNames.toSeq.filterNot(LineCodec.InternalCols.contains)

  private def eventStruct(df: DataFrame): Column =
    struct(userFields(df).map(col): _*)

  /** Elasticsearch bulk mode (src/sinks/elasticsearch/config.rs:299
    * BulkConfig): per event, an action line
    * `{"index":{"_index":"<rendered index template>"}}` then the document
    * JSON — joined with a newline INSIDE the pair; pairs are
    * newline-framed and the request body ends with a newline (the _bulk
    * API requires it — use payloadSuffix="\n"). Defaults:
    * action `index`, index `vector-%Y.%m.%d` (config.rs:336-342).
    */
  def esBulkPair(df: DataFrame, index: String = "vector-%Y.%m.%d",
                 action: String = "index",
                 idKey: Option[String] = None): Column = {
    // `id_key` (config.rs IdKey): the named event field becomes the
    // document `_id` (idempotent writes); absent field → no _id.
    // JSON-escape via to_json so ids containing quotes/backslashes
    // can't break the _bulk action line: to_json(array(id)) = ["…"],
    // strip the brackets to keep the quoted, escaped literal.
    val idPart = idKey.filter(df.columns.contains) match {
      case Some(k) =>
        val quoted = to_json(array(col(k).cast("string")))
        when(col(k).isNotNull,
          concat(lit(",\"_id\":"),
            quoted.substr(lit(2), length(quoted) - 2)))
          .otherwise(lit(""))
      case None => lit("")
    }
    concat(
      lit("{\"" + action + "\":{\"_index\":\""),
      Template.render(df.schema, index),
      lit("\""), idPart, lit("}}\n"),
      to_json(eventStruct(df)))
  }

  /** Splunk HEC event endpoint (src/sinks/splunk_hec/logs/: POST
    * /services/collector/event, one JSON object per event): `time` =
    * epoch seconds (fractional), `host`/`source`/`sourcetype`/`index`
    * from templates, `event` = the event fields.
    */
  def hecEvent(df: DataFrame, host: String = "{{ host }}",
               source: String = "", sourcetype: String = "",
               index: String = ""): Column = {
    val ts = Template.timestampCol(df.schema)
    def opt(name: String, tmpl: String): Seq[Column] =
      if (tmpl.isEmpty) Nil
      else Seq(Template.render(df.schema, tmpl).as(name))
    to_json(struct(
      (unix_micros(ts).cast("double") / 1e6).as("time") +:
        (opt("host", host) ++ opt("source", source) ++
          opt("sourcetype", sourcetype) ++ opt("index", index) :+
          eventStruct(df).as("event")): _*))
  }

  /** Loki push API (src/sinks/loki/: POST /loki/api/v1/push,
    * `{"streams":[{"stream":{labels},"values":[["<ns>","line"],…]}]}`).
    * Labels are templates rendered per event; events sharing a rendered
    * label set form one stream, values sorted by timestamp (the API
    * requires in-order unless out_of_order_action allows). Returns ONE
    * row per stream — send with payloadPrefix `{"streams":[`, framing
    * character_delimited ",", payloadSuffix `]}`.
    *
    * Scale shape: one groupBy on the rendered label struct — the same
    * single shuffle any per-stream batching needs; values aggregate as
    * sorted arrays per stream within the micro-batch.
    */
  def lokiStreams(df: DataFrame, labels: Seq[(String, String)],
                  codec: String = "json",
                  removeLabelFields: Boolean = false,
                  removeTimestamp: Boolean = false): DataFrame = {
    val ts = Template.timestampCol(df.schema)
    val labelCols = labels.map { case (k, v) =>
      Template.render(df.schema, v).as(k) }
    // remove_label_fields / remove_timestamp (loki/config.rs): fields
    // consumed as labels (whole-field `{{ f }}` templates) and/or the
    // timestamp drop from the LINE payload — they ride in the stream
    // envelope instead
    val labelFieldNames =
      if (!removeLabelFields) Set.empty[String]
      else labels.map(_._2).collect {
        case v if v.matches("\\{\\{\\s*[\\w.]+\\s*\\}\\}") =>
          v.replaceAll("[{}\\s]", "")
      }.toSet
    val tsNames =
      if (removeTimestamp) Set("ts", "timestamp") else Set.empty[String]
    val lineDf = {
      val dropped = (labelFieldNames ++ tsNames)
        .filter(df.columns.contains).toSeq
      dropped.foldLeft(df)(_.drop(_))
    }
    val line = LineCodec.encode(lineDf, codec)
    df.select(struct(labelCols: _*).as("__labels"),
        struct((unix_micros(ts) * 1000).cast("string").as("ns"),
          line.as("line")).as("__v"))
      .groupBy(col("__labels"))
      .agg(array_sort(collect_list(col("__v"))).as("__vs"))
      .select(concat(
        lit("{\"stream\":"), to_json(col("__labels")),
        lit(",\"values\":["),
        array_join(transform(col("__vs"), v => concat(
          lit("[\""), v.getField("ns"), lit("\","),
          LineCodec.jsonStringLit(v.getField("line")), lit("]"))), ","),
        lit("]}")).as("__line"))
  }

  // ---- prometheus remote write (src/sinks/prometheus/remote_write/) ----

  import graft.codecs.ProtobufCodec
  import ProtobufCodec._

  /** prompb WriteRequest (prometheus/prompb/types.proto — field numbers
    * from the published proto): WriteRequest.timeseries=1;
    * TimeSeries.labels=1,.samples=2; Label.name=1,.value=2;
    * Sample.value=1,.timestamp=2 (ms).
    */
  val PromLabel: ProtoSchema = ProtoSchema(Seq(
    ProtoField(1, "name", PString), ProtoField(2, "value", PString)))
  val PromSample: ProtoSchema = ProtoSchema(Seq(
    ProtoField(1, "value", PDouble), ProtoField(2, "timestamp", PVarint)))
  val PromTimeSeries: ProtoSchema = ProtoSchema(Seq(
    ProtoField(1, "labels", PRepeated(PMessage(PromLabel))),
    ProtoField(2, "samples", PRepeated(PMessage(PromSample)))))
  val PromWriteRequest: ProtoSchema = ProtoSchema(Seq(
    ProtoField(1, "timeseries", PRepeated(PMessage(PromTimeSeries)))))

  /** Metric rows → one WriteRequest fragment per series: labels =
    * `__name__` + tags SORTED by label name (required by the remote-write
    * spec), samples = the series' batch values sorted by timestamp.
    * Because proto concatenation merges repeated fields, the transport
    * can concatenate per-series fragments into ONE request body —
    * NetworkSinks.writeProtoSnappy does exactly that, then
    * snappy-compresses. Grouping is one shuffle on the label struct (the
    * same shape the per-series batching requires).
    */
  def remoteWriteSeries(df: DataFrame): DataFrame = {
    val ts = Template.timestampCol(df.schema)
    val cols = df.schema.fieldNames.toSet
    val value = coalesce(
      (Seq("counter_value", "gauge_value", "value").filter(cols)
        .map(col) :+ lit(0.0)).map(_.cast("double")): _*)
    val tags =
      if (cols("tags")) coalesce(col("tags"),
        map().cast("map<string,string>"))
      else map().cast("map<string,string>")
    val labels = array_sort(concat(
      array(struct(lit("__name__").as("name"),
        col("name").cast("string").as("value"))),
      transform(map_entries(tags), e =>
        struct(e.getField("key").as("name"),
          e.getField("value").as("value")))))
    df.select(labels.as("__labels"),
        struct(unix_millis(ts).as("t"), value.as("v")).as("__s"))
      .groupBy(col("__labels"))
      .agg(array_sort(collect_list(col("__s"))).as("__ss"))
      .select(ProtobufCodec.encode(PromWriteRequest, struct(
        array(struct(
          col("__labels").as("labels"),
          transform(col("__ss"), s => struct(
            s.getField("v").as("value"),
            s.getField("t").as("timestamp"))).as("samples")))
          .as("timeseries"))).as("__bytes"))
  }

  /** InfluxDB line protocol encoder (src/sinks/influxdb/: POST /write,
    * `measurement,tag=v field=value ns`): measurement/tag escaping per
    * the protocol (`,`, `=`, space backslash-escaped), tags sorted by
    * key, value as the float field `value=`, ns-precision timestamp.
    */
  def influxLine(df: DataFrame): Column = {
    val ts = Template.timestampCol(df.schema)
    val cols = df.schema.fieldNames.toSet
    def esc(c: Column): Column =
      regexp_replace(regexp_replace(regexp_replace(
        c, "\\\\", "\\\\\\\\"), "([,= ])", "\\\\$1"), "\n", "\\\\n")
    val value = coalesce(
      (Seq("counter_value", "gauge_value", "value").filter(cols)
        .map(col) :+ lit(0.0)).map(_.cast("double")): _*)
    val tags =
      if (cols("tags")) coalesce(col("tags"),
        map().cast("map<string,string>"))
      else map().cast("map<string,string>")
    val tagPart = array_join(
      transform(array_sort(map_entries(tags)), e => concat(
        lit(","), esc(e.getField("key")), lit("="),
        esc(e.getField("value")))), "")
    concat(esc(col("name").cast("string")), tagPart,
      lit(" value="), value.cast("string"),
      lit(" "), (unix_micros(ts) * 1000).cast("string"))
  }

  /** Datadog logs v2 (src/sinks/datadog/logs/: POST /api/v2/logs, a JSON
    * array of log objects): ddsource/ddtags/hostname/service plus
    * message and timestamp (epoch ms). Send with payloadPrefix "[",
    * framing character_delimited ",", payloadSuffix "]".
    */
  def datadogLog(df: DataFrame, ddsource: String = "vector",
                 ddtags: String = "", service: String = ""): Column = {
    val ts = Template.timestampCol(df.schema)
    def opt(name: String, tmpl: String): Seq[Column] =
      if (tmpl.isEmpty) Nil
      else Seq(Template.render(df.schema, tmpl).as(name))
    val msg =
      if (df.schema.fieldNames.contains("message")) col("message").cast("string")
      else to_json(eventStruct(df))
    to_json(struct(
      (Seq(lit(ddsource).as("ddsource")) ++ opt("ddtags", ddtags) ++
        opt("service", service) ++ Seq(
          coalesce(Seq("host", "hostname").collectFirst {
            case n if df.schema.fieldNames.contains(n) => col(n).cast("string")
          }.getOrElse(lit(null).cast("string")), lit("")).as("hostname"),
          msg.as("message"),
          unix_millis(ts).as("timestamp"))): _*))
  }
}
