package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.codecs.ProtobufCodec
import graft.functions.Template
import graft.model.AgentSketch
import graft.streaming.DdAgentIntake
import NetworkSinks.HttpConfig

/** `datadog_metrics` protobuf egress — full intake parity with the
  * reference sink (src/sinks/datadog/metrics/encoder.rs):
  *
  *  - counter/gauge/set rows → one single-series `MetricPayload`
  *    protobuf fragment each, POSTed concatenated to `/api/v2/series`
  *    (encoder.rs:242-256: the incremental encoding works BECAUSE
  *    fragment concatenation of the repeated `series` field is a valid
  *    MetricPayload — the same proto3-merge trick greptimedb/OTLP use).
  *    Counter with an interval → RATE with value÷interval, counter
  *    without → COUNT, gauge/set → GAUGE (series_to_proto_message,
  *    encoder.rs:594-700). The host tag becomes the `host` resource,
  *    device/resource.device the `device` resource, source_type_name
  *    its own field; remaining tags render sorted `k:v` strings
  *    (encode_tags, :723).
  *  - distribution/histogram/sketch rows → one single-sketch
  *    `SketchPayload` fragment each to `/api/beta/sketches`
  *    (encoder.rs:307-330). Distributions and aggregated histograms
  *    are first converted to agent sketches exactly like
  *    `AgentDDSketch::transform_to_sketch` (normalizer.rs:22-29 →
  *    ddsketch.rs:796), via [[AgentSketch.Builder]]; empty sketches
  *    are skipped (encoder.rs:324).
  *
  * The proto schemas are shared with the datadog_agent SOURCE
  * (DdAgentIntake) — encode and decode walk the same hand-declared
  * public `dd_metric.proto` layout, so a sink-encoded payload decodes
  * byte-faithfully through the intake legs (the sink_dd_series /
  * sink_dd_sketch oracle queries round-trip exactly that).
  *
  * Both fragment builders are shuffle-free, fully codegen'd
  * projections; the sketch conversion is a native expression
  * ([[graft.functions.SketchExprs.toSketchLanes]] — the egress_udfs
  * A/B probe measured the former Scala-UDF form at ~12× the codegen
  * ceiling, all conversion overhead).
  */
object DdMetrics {

  case class Config(
      endpoint: String, apiKey: String,
      defaultNamespace: Option[String] = None,
      maxEvents: Int = 1000)
      extends Serializable

  private def tagsCol(df: DataFrame): Column =
    if (df.columns.contains("tags"))
      coalesce(col("tags"), map().cast("map<string,string>"))
    else map().cast("map<string,string>")

  /** The series host: an explicit `host` column, else the `host` tag
    * (log_schema host_key), else empty — the reference always pushes
    * the host resource, empty-valued when absent
    * (series_to_proto_message, encoder.rs:604-612).
    */
  private def hostCol(df: DataFrame): Column = {
    val fromTags = element_at(tagsCol(df), "host")
    if (df.columns.contains("host"))
      coalesce(col("host").cast("string"), fromTags, lit(""))
    else coalesce(fromTags, lit(""))
  }

  /** encode_namespace: `ns.name` when a namespace (row column or
    * config default) is present.
    */
  private def metricName(df: DataFrame, defaultNamespace: Option[String]): Column = {
    val ns =
      if (df.columns.contains("namespace"))
        coalesce(col("namespace").cast("string"),
          defaultNamespace.map(lit).getOrElse(lit(null).cast("string")))
      else defaultNamespace.map(lit).getOrElse(lit(null).cast("string"))
    when(ns.isNotNull && ns =!= "",
      concat(ns, lit("."), col("name"))).otherwise(col("name").cast("string"))
  }

  /** encode_tags (encoder.rs:723): `k:v` per entry, bare `k` when the
    * value is empty (MetricTags' bare-tag form — the intake's inverse),
    * sorted by the rendered string.
    */
  private def tagStrings(tags: Column): Column =
    array_sort(transform(map_entries(tags), e =>
      when(e.getField("value") === "", e.getField("key"))
        .otherwise(concat(e.getField("key"), lit(":"),
          e.getField("value")))))

  private val SeriesRemoved = Seq("host", "device", "resource.device",
    "source_type_name")

  private def valueTypeCol(df: DataFrame): Column =
    if (df.columns.contains("value_type")) col("value_type")
    else if (df.columns.contains("kind"))
      when(col("kind") === "incremental", lit("counter"))
        .otherwise(lit("gauge"))
    else lit("gauge")

  /** One single-series MetricPayload fragment per counter/gauge/set
    * row; null for other kinds (those ride the sketch endpoint).
    */
  def seriesFragment(df: DataFrame,
                     defaultNamespace: Option[String] = None): Column = {
    val cols = df.columns.toSet
    val tags = tagsCol(df)
    val vt = valueTypeCol(df)
    val host = hostCol(df)
    val device = coalesce(element_at(tags, "device"),
      element_at(tags, "resource.device"))
    val stn = coalesce(element_at(tags, "source_type_name"), lit(""))
    val remaining = map_filter(tags,
      (k, _) => !k.isin(SeriesRemoved.map(lit(_)): _*))
    val resources = concat(
      array(struct(lit("host").as("type"), host.as("name"))),
      when(device.isNotNull,
        array(struct(lit("device").as("type"), device.as("name"))))
        .otherwise(array().cast("array<struct<type:string,name:string>>")))

    // interval is carried in ms, the wire wants seconds
    // (series_to_proto_message "our internal representation is in
    // milliseconds")
    val intervalS =
      if (cols("interval_ms"))
        when(col("interval_ms").isNotNull,
          (col("interval_ms").cast("long") / 1000L).cast("long"))
      else lit(null).cast("long")
    val counterVal =
      if (cols("counter_value")) col("counter_value").cast("double")
      else if (cols("value")) col("value").cast("double")
      else lit(null).cast("double")
    val gaugeVal =
      if (cols("gauge_value")) col("gauge_value").cast("double")
      else if (cols("value")) col("value").cast("double")
      else lit(null).cast("double")
    val setVal =
      if (cols("set_values")) size(col("set_values")).cast("double")
      else lit(null).cast("double")

    val isRate = vt === "counter" && intervalS.isNotNull
    // MetricType: UNSPECIFIED=0 COUNT=1 RATE=2 GAUGE=3
    val dtype = when(isRate, lit(2L))
      .when(vt === "counter", lit(1L))
      .otherwise(lit(3L))
    val value = when(isRate, counterVal / intervalS.cast("double"))
      .when(vt === "counter", counterVal)
      .when(vt === "set", setVal)
      .otherwise(gaugeVal)

    val ts = unix_seconds(Template.timestampCol(df.schema))
    val series = struct(
      resources.as("resources"),
      metricName(df, defaultNamespace).as("metric"),
      tagStrings(remaining).as("tags"),
      array(struct(value.as("value"), ts.as("timestamp"))).as("points"),
      dtype.as("type"),
      lit("").as("unit"), // "unit is omitted"
      stn.as("source_type_name"),
      coalesce(intervalS, lit(0L)).as("interval"))
    when(vt.isin("counter", "gauge", "set"),
      ProtobufCodec.encode(DdAgentIntake.metricPayloadSchema,
        struct(array(series).as("series"))))
  }

  /** The agent-sketch lanes of one metric row: sketch rows pass their
    * raw lanes through (already agent-shaped from the dd intake),
    * distribution rows insert each sample (insert_n), histogram rows
    * interpolate their buckets — transform_to_sketch
    * (ddsketch.rs:796-822). Returns null for empty sketches, which the
    * encoder then skips like the reference (encoder.rs:324).
    */
  /** One single-sketch SketchPayload fragment per distribution/
    * histogram/sketch row; null otherwise (and for empty sketches).
    */
  def sketchFragment(df: DataFrame,
                     defaultNamespace: Option[String] = None): Column = {
    val cols = df.columns.toSet
    val vt = valueTypeCol(df)
    val tags = tagsCol(df)
    // sketch_to_proto_message removes ONLY the host tag (encoder.rs:543)
    val remaining = map_filter(tags, (k, _) => k =!= "host")
    def sk(field: String): Column = {
      val structTyped = df.schema.fields.exists(f => f.name == "sketch" &&
        f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
      if (structTyped) col("sketch").getField(field)
      else if (cols(s"sketch_$field")) col(s"sketch_$field")
      else lit(null)
    }
    val dist =
      if (cols("dist_samples")) col("dist_samples")
      else lit(null).cast("array<struct<value:double,rate:bigint>>")
    val histo =
      if (cols("histo_buckets")) col("histo_buckets")
      else lit(null).cast("array<struct<upper_limit:double,count:bigint>>")
    val lanes = graft.functions.SketchExprs.toSketchLanes(vt, dist, histo,
      sk("cnt").cast("long"), sk("min").cast("double"),
      sk("max").cast("double"), sk("sum").cast("double"),
      sk("avg").cast("double"), sk("k").cast("array<long>"),
      sk("n").cast("array<long>"))

    val ts = unix_seconds(Template.timestampCol(df.schema))
    val sketch = struct(
      metricName(df, defaultNamespace).as("metric"),
      hostCol(df).as("host"),
      tagStrings(remaining).as("tags"),
      array(struct(ts.as("ts"),
        lanes.getField("scnt").as("cnt"),
        lanes.getField("smin").as("min"),
        lanes.getField("smax").as("max"),
        lanes.getField("savg").as("avg"),
        lanes.getField("ssum").as("sum"),
        lanes.getField("sk").as("k"),
        lanes.getField("sn").as("n"))).as("dogsketches"))
    when(lanes.isNotNull,
      ProtobufCodec.encode(DdAgentIntake.sketchPayloadSchema,
        struct(array(sketch).as("sketches"))))
  }

  /** Ship both endpoints: series fragments concatenated per batch to
    * `/api/v2/series`, sketch fragments to `/api/beta/sketches`, both
    * `application/x-protobuf` with the DD-API-KEY header
    * (config.rs DatadogMetricsEndpoint).
    */
  def write(df: DataFrame, cfg: Config): Unit = {
    val base = cfg.endpoint.stripSuffix("/")
    def http(path: String) = HttpConfig(uri = base + path,
      maxEvents = cfg.maxEvents, contentType = "application/x-protobuf",
      headers = Map("DD-API-KEY" -> cfg.apiKey))
    val vt = valueTypeCol(df)
    // empty filtered frames just post nothing — no pre-count job
    val series = df.filter(vt.isin("counter", "gauge", "set"))
    NetworkSinks.writeProtoConcat(
      series.select(seriesFragment(series, cfg.defaultNamespace)
        .as("__bytes")),
      http("/api/v2/series"))
    val sketches = df.filter(vt.isin("distribution", "histogram", "sketch"))
    NetworkSinks.writeProtoConcat(
      sketches.select(sketchFragment(sketches, cfg.defaultNamespace)
        .as("__bytes")),
      http("/api/beta/sketches"))
  }
}
