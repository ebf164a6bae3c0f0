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
                 action: String = "index"): Column =
    concat(
      lit("{\"" + action + "\":{\"_index\":\""),
      Template.render(df.schema, index),
      lit("\"}}\n"),
      to_json(eventStruct(df)))

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
                  codec: String = "json"): DataFrame = {
    val ts = Template.timestampCol(df.schema)
    val labelCols = labels.map { case (k, v) =>
      Template.render(df.schema, v).as(k) }
    val line = LineCodec.encode(df, codec)
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
