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
  // Rust-Display rendering of the le / quantile label values
  // (collector.rs emit_value's to_string), rendered per array up front
  // because UDFs can't live inside higher-order-function lambdas
  private val f64NamesUdf = udf((vs: Seq[Double]) =>
    if (vs == null) null else vs.map(GreptimeMetrics.rustF64))

  def remoteWriteSeries(df: DataFrame): DataFrame =
    remoteWriteSeries(df, Seq(0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5,
      1.0, 2.5, 5.0, 10.0))

  /** Full collector parity (remote_write shares collector.rs
    * encode_metric with the exporter): counters/gauges/sets emit one
    * series; aggregated histograms emit cumulative `_bucket{le=…}` +
    * `_sum`/`_count`; distributions bucket their samples into
    * `histogramBuckets` first (samples_to_buckets); summaries emit
    * `{quantile=…}` + `_sum`/`_count`; agent sketches serve as
    * summaries with interpolated default quantiles
    * (collector.rs:184-216). One explode + the same single label-keyed
    * shuffle as before.
    */
  def remoteWriteSeries(df: DataFrame,
                        histogramBuckets: Seq[Double]): DataFrame = {
    val ts = Template.timestampCol(df.schema)
    val cols = df.schema.fieldNames.toSet
    val vt =
      if (cols("value_type")) col("value_type")
      else lit("__scalar__")
    val scalar = coalesce(
      (Seq("counter_value", "gauge_value", "value").filter(cols)
        .map(col) :+ lit(0.0)).map(_.cast("double")): _*)
    val tags =
      if (cols("tags")) coalesce(col("tags"),
        map().cast("map<string,string>"))
      else map().cast("map<string,string>")

    // every exposition line of one metric row: (name suffix, optional
    // extra label, sample value)
    def entry(suffix: Column, lk: Column, lv: Column, v: Column): Column =
      struct(suffix.as("suffix"), lk.cast("string").as("lk"),
        lv.cast("string").as("lv"), v.cast("double").as("v"))
    def plain(v: Column): Column = array(entry(lit(""),
      lit(null), lit(null), v))
    val nullE = lit(null).cast("string")

    val statCount =
      if (cols("stat_count")) col("stat_count").cast("double")
      else lit(null).cast("double")
    val statSum =
      if (cols("stat_sum")) col("stat_sum").cast("double")
      else lit(null).cast("double")

    val histo =
      if (cols("histo_buckets")) col("histo_buckets")
      else lit(null).cast("array<struct<upper_limit:double,count:bigint>>")
    val histCount = coalesce(statCount,
      aggregate(histo, lit(0L), (a, b) => a + b.getField("count"))
        .cast("double"))
    val les = f64NamesUdf(transform(histo, _.getField("upper_limit")))
    val cums = transform(histo, (_, i) =>
      aggregate(slice(histo, lit(1), i + 1), lit(0L),
        (a, b) => a + b.getField("count")).cast("double"))
    val histE = concat(
      zip_with(les, cums, (l, c) =>
        entry(lit("_bucket"), lit("le"), l, c)),
      array(
        entry(lit("_bucket"), lit("le"), lit("+Inf"), histCount),
        entry(lit("_sum"), nullE, nullE, statSum),
        entry(lit("_count"), nullE, nullE, histCount)))

    val rawSamples =
      if (cols("dist_samples")) col("dist_samples")
      else lit(null).cast("array<struct<value:double,rate:bigint>>")
    val distCount = aggregate(rawSamples, lit(0L),
      (a, s) => a + s.getField("rate")).cast("double")
    val distSum = aggregate(rawSamples, lit(0.0),
      (a, s) => a + s.getField("value") * s.getField("rate"))
    val distE = concat(
      array(histogramBuckets.map(b =>
        entry(lit("_bucket"), lit("le"), lit(GreptimeMetrics.rustF64(b)),
          aggregate(filter(rawSamples, s => s.getField("value") <= b),
            lit(0L), (a, s) => a + s.getField("rate")).cast("double"))): _*),
      array(
        entry(lit("_bucket"), lit("le"), lit("+Inf"), distCount),
        entry(lit("_sum"), nullE, nullE, distSum),
        entry(lit("_count"), nullE, nullE, distCount)))

    val quants =
      if (cols("summary_quantiles")) col("summary_quantiles")
      else lit(null).cast("array<struct<quantile:double,value:double>>")
    val qNames = f64NamesUdf(transform(quants, _.getField("quantile")))
    val summE = concat(
      zip_with(qNames, quants, (qn, q) =>
        entry(lit(""), lit("quantile"), qn, q.getField("value"))),
      array(entry(lit("_sum"), nullE, nullE, statSum),
        entry(lit("_count"), nullE, nullE, statCount)))

    def skLane(field: String): Column = {
      val structTyped = df.schema.fields.exists(f => f.name == "sketch" &&
        f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
      if (structTyped) col("sketch").getField(field)
      else if (cols(s"sketch_$field")) col(s"sketch_$field")
      else lit(null)
    }
    val skQs = graft.functions.SketchExprs.sketchQuantiles(
      skLane("k").cast("array<long>"),
      skLane("n").cast("array<long>"), skLane("cnt").cast("long"),
      skLane("min").cast("double"), skLane("max").cast("double"))
    val sketchE = concat(
      array(Seq(0.5, 0.75, 0.9, 0.95, 0.99).zipWithIndex.map {
        case (q, i) => entry(lit(""), lit("quantile"), lit(q.toString),
          element_at(skQs, i + 1))
      }: _*),
      array(entry(lit("_sum"), nullE, nullE, skLane("sum").cast("double")),
        entry(lit("_count"), nullE, nullE, skLane("cnt").cast("double"))))

    val setE =
      if (cols("set_values")) plain(size(col("set_values")).cast("double"))
      else plain(lit(null).cast("double"))

    val entries = when(vt === "histogram" && histo.isNotNull, histE)
      .when(vt === "distribution" && rawSamples.isNotNull, distE)
      .when(vt === "summary" && quants.isNotNull, summE)
      .when(vt === "sketch" && skQs.isNotNull, sketchE)
      .when(vt === "set", setE)
      .otherwise(plain(scalar))

    df.select(col("name").cast("string").as("__name"),
        transform(map_entries(tags), e =>
          struct(e.getField("key").as("name"),
            e.getField("value").as("value"))).as("__tagl"),
        unix_millis(ts).as("__t"),
        explode(filter(entries, e => e.getField("v").isNotNull))
          .as("__e"))
      .select(
        array_sort(concat(
          array(struct(lit("__name__").as("name"),
            concat(col("__name"), col("__e.suffix")).as("value"))),
          col("__tagl"),
          when(col("__e.lk").isNotNull,
            array(struct(col("__e.lk").as("name"),
              col("__e.lv").as("value"))))
            .otherwise(array().cast(
              "array<struct<name:string,value:string>>"))))
          .as("__labels"),
        struct(col("__t").as("t"), col("__e.v").as("v")).as("__s"))
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

  /** Splunk HEC metrics envelope (src/sinks/splunk_hec/metrics/
    * encoder.rs HecData): one JSON object per metric —
    * `{"event":"metric","fields":{<tags…>,"metric_name":"<ns.name>",
    * "_value":<f64>},"time":<epoch s float>[,host/index/source/
    * sourcetype]}`. Only counter/gauge values encode (sink.rs
    * extract_metric_value — other kinds drop); fields keys are sorted
    * (serde BTreeMap); `host` is the host_key TAG's value; templated
    * field keys are skipped from fields. Namespace prefixes the name
    * with '.' (encode_namespace).
    */
  def hecMetric(df: DataFrame, hostKey: String = "host",
                index: String = "", source: String = "",
                sourcetype: String = "",
                defaultNamespace: Option[String] = None): Column = {
    val cols = df.schema.fieldNames.toSet
    val tags =
      if (cols("tags")) coalesce(col("tags"),
        map().cast("map<string,string>"))
      else map().cast("map<string,string>")
    val ns =
      if (cols("namespace"))
        coalesce(col("namespace"),
          defaultNamespace.map(lit).getOrElse(lit(null)).cast("string"))
      else defaultNamespace.map(lit(_).cast("string"))
        .getOrElse(lit(null).cast("string"))
    val metricName = when(ns.isNotNull,
      concat(ns, lit("."), col("name"))).otherwise(col("name"))
    val value = coalesce(
      Seq("counter_value", "gauge_value").filter(cols).map(col(_)) :+
        lit(null).cast("double"): _*)
    // tag keys consumed by the routing templates are skipped from
    // fields (encoder.rs templated_field_keys)
    val templatedKeys = Seq(index, source, sourcetype)
      .flatMap(t => "\\{\\{\\s*([\\w.]+)\\s*\\}\\}".r
        .findAllMatchIn(t).map(_.group(1)).toSeq)
      .map(_.stripPrefix("tags."))
    val fieldTags =
      if (templatedKeys.isEmpty) tags
      else map_filter(tags, (k, _) =>
        !templatedKeys.map(t => k === lit(t))
          .reduce[Column](_ || _))
    // fields object: tags ∪ {metric_name, _value}, key-sorted; _value
    // staged as a string then unquoted (it is a bare double — the
    // rewrite regex cannot over-match)
    val fieldsMap = map_from_entries(array_sort(map_entries(map_concat(
      fieldTags, map(lit("metric_name"), metricName.cast("string"),
        lit("_value"), value.cast("string"))))))
    val fieldsJson = regexp_replace(to_json(fieldsMap),
      "\"_value\":\"([^\"]+)\"", "\"_value\":$1")
    val ts = Template.timestampCol(df.schema)
    val time = format_string("%.3f",
      unix_millis(ts).cast("double") / 1e3)
    def quoted(c: Column): Column = {
      val j = to_json(array(c.cast("string")))
      j.substr(lit(2), length(j) - 2)
    }
    def opt(name: String, c: Column): Column =
      when(c.isNotNull, concat(lit(s""","$name":"""), quoted(c)))
        .otherwise(lit(""))
    val host = element_at(tags, hostKey)
    def tmpl(t: String): Column =
      if (t.isEmpty) lit(null).cast("string")
      else Template.render(df.schema, t)
    concat(
      lit("""{"event":"metric","fields":"""), fieldsJson,
      lit(""","time":"""), time,
      opt("host", host), opt("index", tmpl(index)),
      opt("source", tmpl(source)), opt("sourcetype", tmpl(sourcetype)),
      lit("}"))
  }

  /** Sematext metrics line (src/sinks/sematext/metrics.rs
    * encode_events): influx v1 line protocol where the MEASUREMENT is
    * the metric namespace (or the configured default), the token and
    * metric_type ride as tags, and the field key is the metric NAME —
    * `<ns>,<tags…>,token=<t>,metric_type=<counter|gauge> <name>=<v> <ns-ts>`.
    * Only counter/gauge encode (SematextMetricNormalize drops others).
    */
  def sematextLine(df: DataFrame, token: String,
                   defaultNamespace: String): Column = {
    val cols = df.schema.fieldNames.toSet
    def esc(c: Column): Column =
      regexp_replace(regexp_replace(regexp_replace(
        c, "\\\\", "\\\\\\\\"), "([,= ])", "\\\\$1"), "\n", "\\\\n")
    val ns =
      if (cols("namespace")) coalesce(col("namespace"),
        lit(defaultNamespace))
      else lit(defaultNamespace)
    val metricType = when(col("value_type") === "counter", "counter")
      .when(col("value_type") === "gauge", "gauge")
    val value = coalesce(
      Seq("counter_value", "gauge_value").filter(cols).map(col(_)) :+
        lit(null).cast("double"): _*)
    val tags0 =
      if (cols("tags")) coalesce(col("tags"),
        map().cast("map<string,string>"))
      else map().cast("map<string,string>")
    val tags = map_concat(tags0,
      map(lit("token"), lit(token), lit("metric_type"), metricType))
    val tagPart = array_join(
      transform(array_sort(map_entries(tags)), e => concat(
        lit(","), esc(e.getField("key")), lit("="),
        esc(e.getField("value")))), "")
    val ts = Template.timestampCol(df.schema)
    concat(esc(ns), tagPart,
      lit(" "), esc(col("name").cast("string")), lit("="),
      value.cast("string"),
      lit(" "), (unix_micros(ts) * 1000).cast("string"))
  }

  /** metric_to_log shaping for humio_metrics (src/sinks/humio/
    * metrics.rs embeds the metric_to_log transform before the HEC log
    * sink): the metric serializes to the log's fields — name/
    * namespace/tags/kind/timestamp plus the value under its type key
    * (`counter: {value}`, `gauge: {value}`) — and rides the standard
    * HEC event envelope.
    */
  def metricLogStruct(df: DataFrame): Column = {
    val cols = df.schema.fieldNames.toSet
    val ts = Template.timestampCol(df.schema)
    val base = Seq(
      col("name").cast("string").as("name"),
      (if (cols("namespace")) col("namespace").cast("string")
       else lit(null).cast("string")).as("namespace"),
      (if (cols("tags")) col("tags")
       else map().cast("map<string,string>")).as("tags"),
      col("kind").cast("string").as("kind"),
      date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("timestamp"))
    val vt = col("value_type")
    val counter = when(vt === "counter",
      struct(col("counter_value").as("value"))).as("counter")
    val gauge = when(vt === "gauge",
      struct(col("gauge_value").as("value"))).as("gauge")
    // the remaining MetricValue families, serialized per the metric's
    // serde shape (metric_to_log.rs tests: set.values,
    // distribution.samples[]/statistic, aggregated_histogram
    // .buckets[]/count/sum, aggregated_summary.quantiles[]/count/sum);
    // to_json's default null-dropping removes the non-matching
    // families from the emitted log
    val statCount =
      if (cols("stat_count")) col("stat_count") else lit(null).cast("long")
    val statSum =
      if (cols("stat_sum")) col("stat_sum") else lit(null).cast("double")
    val rest = Seq(
      (if (cols("set_values"))
        when(vt === "set", struct(col("set_values").as("values")))
      else lit(null).cast("struct<values:array<string>>")).as("set"),
      (if (cols("dist_samples"))
        // the model carries no StatisticKind lane; "histogram" is the
        // reference's default statistic (value.rs StatisticKind)
        when(vt === "distribution",
          struct(col("dist_samples").as("samples"),
            lit("histogram").as("statistic")))
      else lit(null).cast("struct<samples:array<struct<value:double," +
        "rate:bigint>>,statistic:string>")).as("distribution"),
      (if (cols("histo_buckets"))
        when(vt === "histogram",
          struct(col("histo_buckets").as("buckets"),
            coalesce(statCount,
              aggregate(col("histo_buckets"), lit(0L),
                (a, b) => a + b.getField("count"))).as("count"),
            statSum.as("sum")))
      else lit(null).cast("struct<buckets:array<struct<upper_limit:" +
        "double,count:bigint>>,count:bigint,sum:double>"))
        .as("aggregated_histogram"),
      (if (cols("summary_quantiles"))
        when(vt === "summary",
          struct(col("summary_quantiles").as("quantiles"),
            statCount.as("count"), statSum.as("sum")))
      else lit(null).cast("struct<quantiles:array<struct<quantile:" +
        "double,value:double>>,count:bigint,sum:double>"))
        .as("aggregated_summary")) ++
      // agent-sketch rows (struct-typed `sketch` from the dd intake)
      // keep their raw lanes under `sketch`
      df.schema.fields.find(f => f.name == "sketch" &&
          f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
        .map(_ => when(vt === "sketch", col("sketch")).as("sketch"))
        .toSeq
    struct(base ++ Seq(counter, gauge) ++ rest: _*)
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
