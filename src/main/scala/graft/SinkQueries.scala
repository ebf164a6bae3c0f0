package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.{Envelopes, LineCodec}

/** Oracle-checked queries for the sink envelope layer (SURVEY §2.5 —
  * the HTTP-family sinks: elasticsearch bulk, splunk_hec, loki push,
  * datadog_logs v2). Each query builds the real request-body text with
  * the sink's own envelope builder, then parses the fields back out of
  * that text; the oracle recomputes the same fields straight from the
  * source columns — a malformed envelope (wrong nesting, bad template
  * rendering, broken escaping, missing field) breaks equality. The
  * transport itself (batching, compression, headers) is spec-tested in
  * SinkSpec against a live local server.
  */
object SinkQueries {

  import Queries.Q

  /** One decoded remote-write exposition line (sink_rw_families). */
  final case class RwLine(sid: Long, sname: String, lk: String,
                          lv: String, sval: Double)

  private def ev(s: SparkSession, dir: String): DataFrame =
    Graft.table(s, dir, "events")

  val queries: Map[String, Q] = Map(

    // elasticsearch bulk mode: action line + document line per event
    // (src/sinks/elasticsearch/config.rs BulkConfig; default index
    // template `vector-%Y.%m.%d` rendered per event timestamp)
    "sink_es_bulk" -> { (s, dir) =>
      val base = ev(s, dir).select("event_id", "ts", "user_id", "event_type")
      val pair = Envelopes.esBulkPair(base, index = "logs-%Y.%m.%d",
        action = "create", idKey = Some("event_id"))
      base.select(col("event_id"), pair.as("__p"))
        .select(
          col("event_id"),
          get_json_object(substring_index(col("__p"), "\n", 1),
            "$.create._index").as("idx"),
          get_json_object(substring_index(col("__p"), "\n", 1),
            "$.create._id").cast("long").as("doc_id"),
          get_json_object(substring_index(col("__p"), "\n", -1),
            "$.event_type").as("doc_event_type"),
          get_json_object(substring_index(col("__p"), "\n", -1),
            "$.user_id").cast("long").as("doc_user_id"))
        .orderBy("event_id")
    },

    // splunk HEC METRICS envelope (splunk_hec_metrics sink): the
    // complete line text vs a string-built oracle — sorted fields keys,
    // bare-number _value, %.3f time, host from the host_key tag
    "sink_hec_metrics" -> { (s, dir) =>
      val base = ev(s, dir).select(
        col("event_id"), col("ts"),
        col("event_type").as("name"),
        lit("app").as("namespace"),
        lit("incremental").as("kind"),
        lit("counter").as("value_type"),
        round(col("value"), 2).as("counter_value"),
        map(lit("env"), lit("prod"),
          lit("host"), concat(lit("h"), pmod(col("user_id"), lit(4))))
          .as("tags"))
      base.select(col("event_id"),
          Envelopes.hecMetric(base).as("line"))
        .orderBy("event_id")
    },

    // sematext_metrics line: measurement = namespace, token/metric_type
    // tags, field key = metric name, ns timestamp — full-line compare
    "sink_sematext_metrics" -> { (s, dir) =>
      val base = ev(s, dir).select(
        col("event_id"), col("ts"),
        col("event_type").as("name"),
        lit("app").as("namespace"),
        lit("counter").as("value_type"),
        round(col("value"), 2).as("counter_value"),
        map(lit("env"), lit("prod")).as("tags"))
      base.select(col("event_id"),
          Envelopes.sematextLine(base, "tok-1", "vector").as("line"))
        .orderBy("event_id")
    },

    // splunk HEC event envelope: fractional epoch `time`, template-
    // rendered host/sourcetype, event payload under `event`
    "sink_hec" -> { (s, dir) =>
      val base = ev(s, dir).select("event_id", "ts", "user_id", "event_type")
      val line = Envelopes.hecEvent(base, host = "h{{ user_id }}",
        sourcetype = "graft")
      base.select(col("event_id"), line.as("__l"))
        .select(
          col("event_id"),
          // whole seconds of the fractional epoch time (exact compare)
          get_json_object(col("__l"), "$.time").cast("double")
            .cast("long").as("time_s"),
          get_json_object(col("__l"), "$.host").as("host"),
          get_json_object(col("__l"), "$.sourcetype").as("sourcetype"),
          get_json_object(col("__l"), "$.event.event_type")
            .as("event_event_type"))
        .orderBy("event_id")
    },

    // loki push payload: one stream per rendered label set, values
    // sorted by ns timestamp — compare the COMPLETE per-stream body text
    "sink_loki" -> { (s, dir) =>
      val base = ev(s, dir)
        .select(col("event_id"), col("ts"), col("event_type"),
          concat(col("event_type"), lit(":"),
            col("event_id").cast("string")).as("message"))
      Envelopes.lokiStreams(base, Seq("app" -> "{{ event_type }}"),
        codec = "text")
        .select(col("__line").as("payload")).orderBy("payload")
    },

    // influx line protocol: full line text vs a string-built oracle
    "sink_influx" -> { (s, dir) =>
      val base = ev(s, dir).select(
        col("event_id"),
        lit("events_total").as("name"),
        map(lit("type"), col("event_type"),
          lit("host"), concat(lit("h"),
            pmod(col("user_id"), lit(5)).cast("string"))).as("tags"),
        Graft.jsonLong(col("props"), "k").cast("double").as("gauge_value"),
        col("ts").as("timestamp"))
      base.select(col("event_id"),
          Envelopes.influxLine(base).as("line"))
        .orderBy("event_id")
    },

    // datadog_metrics v2 protobuf egress: each row encodes through the
    // SINK's single-series MetricPayload fragment
    // (DdMetrics.seriesFragment — encoder.rs series_to_proto_message)
    // and decodes back through the datadog_agent SOURCE's decode leg;
    // the oracle recomputes COUNT/RATE÷interval/GAUGE, the host/device
    // resource promotion, and namespace joining from the raw columns.
    // RATE uses a power-of-two interval (8 s) so value÷8×8 is exact.
    "sink_dd_series" -> { (s, dir) =>
      import graft.streaming.DdAgentIntake
      val e = ev(s, dir).withColumn("k", Graft.jsonLong(col("props"), "k"))
      val mode = pmod(col("k"), lit(3))
      val base = e.select(
        col("event_id"), col("ts"),
        col("event_type").as("name"),
        lit("app").as("namespace"),
        when(mode < 2, "counter").otherwise("gauge").as("value_type"),
        when(mode < 2, round(col("value"), 2)).as("counter_value"),
        when(mode === 2, round(col("value"), 2)).as("gauge_value"),
        when(mode === 1, 8000L).cast("long").as("interval_ms"),
        map(lit("env"), lit("prod"),
          lit("host"), concat(lit("h"), pmod(col("user_id"), lit(4))),
          lit("device"), concat(lit("sda"), pmod(col("k"), lit(2))))
          .as("tags"))
      val frag = graft.sinks.DdMetrics.seriesFragment(base)
      val dec = udf((b: Array[Byte]) => DdAgentIntake.decodeSeriesV2(b))
      base.withColumn("__m", explode(dec(frag)))
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
          element_at(col("__m.tags"), "device").as("tag_device"))
        .orderBy("event_id")
    },

    // datadog_metrics sketch egress: single-sample distributions
    // convert through AgentSketch.Builder (transform_to_sketch),
    // encode as SketchPayload fragments, decode through the intake —
    // every lane (cnt/min/max/sum/avg) and the interpolated q50 are
    // EXACT for a one-value sketch, so the oracle recomputes them all
    "sink_dd_sketch" -> { (s, dir) =>
      import graft.streaming.DdAgentIntake
      import graft.model.AgentSketch
      val e = ev(s, dir).withColumn("k", Graft.jsonLong(col("props"), "k"))
        .where(col("value") > 1e-9)
      val n = (pmod(col("k"), lit(7)) + 1).cast("long")
      val base = e.select(
        col("event_id"), col("ts"),
        col("event_type").as("name"),
        lit("incremental").as("kind"),
        lit("distribution").as("value_type"),
        array(struct(round(col("value"), 2).as("value"), n.as("rate")))
          .as("dist_samples"),
        map(lit("env"), lit("prod"),
          lit("host"), concat(lit("h"), pmod(col("user_id"), lit(4))))
          .as("tags"))
      val frag = graft.sinks.DdMetrics.sketchFragment(base)
      val dec = udf((b: Array[Byte]) => DdAgentIntake.decodeSketches(b))
      val q50 = udf((ks: Seq[Long], ns: Seq[Long], cnt: Long,
                     mn: Double, mx: Double) =>
        AgentSketch.quantile(ks, ns, cnt, mn, mx, 0.5).get)
      base.withColumn("__m", explode(dec(frag)))
        .select(col("event_id"),
          col("__m.name").as("name"),
          col("__m.host").as("host"),
          element_at(col("__m.tags"), "env").as("tag_env"),
          col("__m.sketch_cnt").as("cnt"),
          col("__m.sketch_min").as("min_v"),
          col("__m.sketch_max").as("max_v"),
          col("__m.sketch_sum").as("sum_v"),
          col("__m.sketch_avg").as("avg_v"),
          size(col("__m.sketch_k")).as("bins"),
          element_at(col("__m.sketch_n"), 1).as("n1"),
          q50(col("__m.sketch_k"), col("__m.sketch_n"),
            col("__m.sketch_cnt"), col("__m.sketch_min"),
            col("__m.sketch_max")).as("q50"),
          col("__m.timestamp_s").as("ts_s"))
        .orderBy("event_id")
    },

    // prometheus_remote_write non-scalar families (collector.rs
    // encode_metric, shared with the exporter): aggregated histograms →
    // cumulative _bucket{le}/_sum/_count series, summaries →
    // {quantile}/_sum/_count, agent sketches → interpolated default
    // quantiles; every emitted series decodes back through the prompb
    // wire walker and every sample value is oracle-recomputed (sketch
    // quantiles are EXACT for one-value sketches: clamp to min==max)
    "sink_rw_families" -> { (s, dir) =>
      import graft.sinks.Envelopes
      import graft.codecs.ProtobufCodec
      val e = ev(s, dir).withColumn("k", Graft.jsonLong(col("props"), "k"))
      val mode = pmod(col("k"), lit(3))
      val v = round(col("value"), 2)
      val n7 = (pmod(col("k"), lit(7)) + 1).cast("long")
      val c1 = (pmod(col("k"), lit(4)) + 1).cast("long")
      val c2 = (pmod(col("user_id"), lit(3)) + 1).cast("long")
      val keyOf = udf((d: Double) =>
        graft.model.AgentSketch.key(d).toLong)
      val base = e.select(
        concat(lit("fam"), mode).as("name"),
        map(lit("id"), col("event_id").cast("string")).as("tags"),
        when(mode === 0, "histogram").when(mode === 1, "summary")
          .otherwise("sketch").as("value_type"),
        when(mode === 0, array(
          struct(lit(1.0).as("upper_limit"), c1.as("count")),
          struct(lit(2.0).as("upper_limit"), c2.as("count"))))
          .as("histo_buckets"),
        when(mode === 0, c1 + c2).when(mode === 1, n7).cast("long")
          .as("stat_count"),
        when(mode === 0, v).when(mode === 1, v * 3).as("stat_sum"),
        when(mode === 1, array(
          struct(lit(0.5).as("quantile"), v.as("value")),
          struct(lit(0.99).as("quantile"), (v + 1).as("value"))))
          .as("summary_quantiles"),
        when(mode === 2, n7).as("sketch_cnt"),
        when(mode === 2, v).as("sketch_min"),
        when(mode === 2, v).as("sketch_max"),
        when(mode === 2, v * n7.cast("double")).as("sketch_sum"),
        when(mode === 2, array(keyOf(v))).as("sketch_k"),
        when(mode === 2, array(n7)).as("sketch_n"),
        col("ts"))
      val dec = udf((b: Array[Byte]) => {
        val r = ProtobufCodec.decodeTo(Envelopes.PromWriteRequest, b)
        Option(r.getAs[Seq[org.apache.spark.sql.Row]]("timeseries"))
          .getOrElse(Nil).map { series =>
            val labels = Option(series
              .getAs[Seq[org.apache.spark.sql.Row]]("labels"))
              .getOrElse(Nil)
              .map(l => l.getAs[String]("name") -> l.getAs[String]("value"))
              .toMap
            val sample = series
              .getAs[Seq[org.apache.spark.sql.Row]]("samples").head
            val extra = (labels - "__name__" - "id").headOption
            RwLine(labels("id").toLong, labels("__name__"),
              extra.map(_._1).getOrElse(""),
              extra.map(_._2).getOrElse(""),
              sample.getAs[Double]("value"))
          }
      })
      Envelopes.remoteWriteSeries(base)
        .select(explode(dec(col("__bytes"))).as("__l"))
        .select(col("__l.sid").as("sid"), col("__l.sname").as("sname"),
          col("__l.lk").as("lk"), col("__l.lv").as("lv"),
          col("__l.sval").as("sval"))
        .orderBy("sid", "sname", "lk", "lv")
    },

    // datadog_traces protobuf egress: one TracerPayload per trace row
    // through the SINK's fragment (request_builder.rs encode_trace),
    // decoded by the datadog_agent SOURCE's v2 (tracerPayloads) leg —
    // chunk/tracer/payload tag union, priority, span fields, forced-ns
    // start, and the config-level agent_version all round-trip
    "sink_dd_traces" -> { (s, dir) =>
      import graft.streaming.DdAgentIntake
      val e = ev(s, dir).withColumn("k", Graft.jsonLong(col("props"), "k"))
      val startNs = unix_micros(col("ts")) * 1000
      val span = struct(
        concat(lit("svc"), pmod(col("user_id"), lit(5))).as("service"),
        col("event_type").as("name"),
        concat(lit("GET /"), col("k")).as("resource"),
        col("event_id").as("trace_id"),
        (col("event_id") * 2 + 1).as("span_id"),
        lit(0L).as("parent_id"),
        startNs.as("start_ns"),
        (col("k") * 1000000).as("duration"),
        pmod(col("k"), lit(2)).as("error"),
        map(lit("http.method"), lit("GET")).as("meta"),
        map().cast("map<string,double>").as("metrics"),
        lit("web").as("span_type"))
      val base = e.select(
        col("event_id"), col("ts"),
        concat(lit("h"), pmod(col("user_id"), lit(4))).as("host"),
        lit("prod").as("env"),
        map(lit("team"), lit("core")).as("tags"),
        pmod(col("k"), lit(3)).cast("long").as("priority"),
        when(pmod(col("k"), lit(5)) === 0, "synthetics-browser")
          .otherwise("rum").as("origin"),
        concat(lit("c"), pmod(col("k"), lit(3))).as("container_id"),
        lit("rust").as("language_name"),
        lit("1.2").as("app_version"),
        array(span).as("spans"))
      val cfg = graft.sinks.DdTraces.Config("http://unused", "k",
        agentVersion = "7.1")
      val frag = graft.sinks.DdTraces.traceFragment(base, cfg)
      val dec = udf((b: Array[Byte]) => DdAgentIntake.decodeTraces(b))
      base.withColumn("__t", explode(dec(frag)))
        .select(col("event_id"),
          col("__t.payload_version").as("payload_version"),
          col("__t.host").as("host"),
          col("__t.env").as("env"),
          col("__t.agent_version").as("agent_version"),
          col("__t.priority").as("priority"),
          col("__t.origin").as("origin"),
          col("__t.dropped").as("dropped"),
          col("__t.container_id").as("container_id"),
          col("__t.language_name").as("language_name"),
          col("__t.app_version").as("app_version"),
          element_at(col("__t.tags"), "team").as("tag_team"),
          element_at(col("__t.spans"), 1).getField("service")
            .as("service"),
          element_at(col("__t.spans"), 1).getField("name")
            .as("span_name"),
          element_at(col("__t.spans"), 1).getField("resource")
            .as("resource"),
          element_at(col("__t.spans"), 1).getField("span_id")
            .as("span_id"),
          element_at(col("__t.spans"), 1).getField("start_ns")
            .as("start_ns"),
          element_at(col("__t.spans"), 1).getField("duration")
            .as("duration"),
          element_at(col("__t.spans"), 1).getField("error").as("error"),
          element_at(element_at(col("__t.spans"), 1).getField("meta"),
            "http.method").as("meta_method"))
        .orderBy("event_id")
    },

    // datadog_traces APM stats: the sink's 10-second bucket aggregation
    // (apm_stats/bucket.rs Bucket::update) over top-level spans — the
    // oracle recomputes hits/errors/top-level-hits/duration and the
    // ok/error sketch totals per (host × service × name × bucket) group
    // straight from the raw columns (weight 1.0 here, so weighted sums
    // are exact counts)
    "sink_apm_stats" -> { (s, dir) =>
      val e = ev(s, dir).withColumn("k", Graft.jsonLong(col("props"), "k"))
      val startNs = unix_micros(col("ts")) * 1000
      val span = struct(
        concat(lit("svc"), pmod(col("user_id"), lit(5))).as("service"),
        col("event_type").as("name"),
        concat(lit("op-"), col("event_type")).as("resource"),
        col("event_id").as("trace_id"),
        (col("event_id") * 2 + 1).as("span_id"),
        lit(0L).as("parent_id"),
        startNs.as("start_ns"),
        (col("k") * 1000000).as("duration"),
        pmod(col("k"), lit(2)).as("error"),
        map(lit("http.status_code"),
          (lit(200) + pmod(col("k"), lit(3)) * 100).cast("string"))
          .as("meta"),
        map(lit("_top_level"), lit(1.0)).as("metrics"),
        lit("web").as("span_type"))
      val base = e.select(
        concat(lit("h"), pmod(col("user_id"), lit(4))).as("host"),
        lit("prod").as("env"),
        array(span).as("spans"))
      val cfg = graft.sinks.DdTraces.Config("http://unused", "k")
      graft.sinks.DdTraces.apmStats(base, cfg)
        .select(col("env"), col("hostname"), col("service"),
          col("name"), col("resource"), col("span_type"),
          col("status_code"), col("synthetics"), col("bucket_start"),
          col("stats.hits").as("hits"),
          col("stats.top_level_hits").as("top_hits"),
          col("stats.errors").as("errors"),
          col("stats.duration").as("duration_ns"),
          (col("stats.ok_zero") + aggregate(col("stats.ok_bins"),
            lit(0L), (a, b) => a + b.getField("n"))).as("ok_total"),
          (col("stats.err_zero") + aggregate(col("stats.err_bins"),
            lit(0L), (a, b) => a + b.getField("n"))).as("err_total"))
        .orderBy("hostname", "service", "name", "status_code",
          "bucket_start")
    },

    // datadog_metrics histogram egress: aggregated-histogram buckets
    // interpolate into agent sketch bins (insert_interpolate_buckets);
    // the total count survives the spread + encode + decode exactly
    "sink_dd_hist" -> { (s, dir) =>
      import graft.streaming.DdAgentIntake
      val e = ev(s, dir).withColumn("k", Graft.jsonLong(col("props"), "k"))
      val base = e.select(
        col("event_id"), col("ts"),
        col("event_type").as("name"),
        lit("incremental").as("kind"),
        lit("histogram").as("value_type"),
        array(
          struct(lit(1.0).as("upper_limit"),
            (pmod(col("k"), lit(5)) + 1).cast("long").as("count")),
          struct(lit(2.0).as("upper_limit"),
            (pmod(col("user_id"), lit(3)) + 1).cast("long").as("count")),
          struct(lit(Double.PositiveInfinity).as("upper_limit"),
            (pmod(col("k"), lit(2)) + 1).cast("long").as("count")))
          .as("histo_buckets"))
      val frag = graft.sinks.DdMetrics.sketchFragment(base)
      val dec = udf((b: Array[Byte]) => DdAgentIntake.decodeSketches(b))
      base.withColumn("__m", explode(dec(frag)))
        .select(col("event_id"),
          col("__m.name").as("name"),
          col("__m.sketch_cnt").as("cnt"),
          aggregate(col("__m.sketch_n"), lit(0L), (a, x) => a + x)
            .as("n_total"))
        .orderBy("event_id")
    },

    // prometheus remote write: encode the prompb WriteRequest fragments,
    // decode them back with the wire walker, and compare the recovered
    // series (sorted labels, per-series sample stats) to the oracle
    "sink_remote_write" -> { (s, dir) =>
      val base = ev(s, dir).select(
        concat(lit("ev_"), col("event_type")).as("name"),
        map(lit("host"), concat(lit("h"),
          pmod(col("user_id"), lit(5)).cast("string"))).as("tags"),
        Graft.jsonLong(col("props"), "k").cast("double").as("gauge_value"),
        col("ts").as("timestamp"))
      val decoded = Envelopes.remoteWriteSeries(base).select(
        explode(graft.codecs.ProtobufCodec.decode(
          Envelopes.PromWriteRequest, col("__bytes"))
          .getField("timeseries")).as("series"))
      decoded.select(
          array_join(transform(col("series.labels"), l => concat(
            l.getField("name"), lit("="), l.getField("value"))), ",")
            .as("labels"),
          size(col("series.samples")).cast("long").as("n_samples"),
          aggregate(col("series.samples"), lit(0.0),
            (acc, x) => acc + x.getField("value")).cast("long").as("sum_v"),
          element_at(col("series.samples"), 1).getField("timestamp")
            .as("first_ms"),
          element_at(col("series.samples"), -1).getField("timestamp")
            .as("last_ms"))
        .orderBy("labels")
    },

    // object-store family (aws_s3 / gcp_cloud_storage / azure_blob /
    // webhdfs): write real objects — template key_prefix partitioning,
    // gzip bodies, max_bytes object splits — into a local dir standing in
    // for the bucket, read every object back, and compare the per-prefix
    // contents to the oracle. Wrong prefix rendering, lost/duplicated
    // rows at object-roll boundaries, or broken compression all break it.
    "sink_s3_keys" -> { (s, dir) =>
      val base = ev(s, dir).select("event_id", "ts", "user_id", "event_type")
      val tmp = java.nio.file.Files.createTempDirectory("graft-s3-").toString
      graft.sinks.ObjectStoreSink.writeBatch(base,
        graft.sinks.ObjectStoreSink.Config(
          baseUri = tmp,
          keyPrefix = "type={{ event_type }}/date=%F/",
          filenameAppendUuid = false, fixedClockMs = Some(0L),
          codec = "json", compression = "gzip", maxBytes = 256 * 1024,
          // few prefixes, many tasks → co-locate each prefix on one
          // task; objects scale as prefixes, not tasks × prefixes
          partitionByPrefix = true))
      graft.sinks.ObjectStoreSink.readBack(s, tmp)
        .select(
          regexp_extract(col("key"), "^(type=[^/]+/date=[^/]+)/", 1)
            .as("prefix"),
          get_json_object(col("line"), "$.event_id").cast("long")
            .as("event_id"))
        .groupBy("prefix")
        .agg(count("*").as("n"), sum("event_id").as("sum_id"))
        .orderBy("prefix")
    },

    // datadog logs v2 object: ddsource/service, epoch-ms timestamp, the
    // full event nested as a JSON string under `message`
    "sink_datadog" -> { (s, dir) =>
      val base = ev(s, dir).select("event_id", "ts", "user_id", "event_type")
      val line = Envelopes.datadogLog(base, ddsource = "vector",
        service = "webapp")
      base.select(col("event_id"), line.as("__l"))
        .select(
          col("event_id"),
          get_json_object(col("__l"), "$.ddsource").as("ddsource"),
          get_json_object(col("__l"), "$.service").as("service"),
          get_json_object(col("__l"), "$.timestamp").cast("long")
            .as("ts_ms"),
          get_json_object(get_json_object(col("__l"), "$.message"),
            "$.event_type").as("msg_event_type"))
        .orderBy("event_id")
    },

    // datadog metrics v1 series entry (generate_series_metrics,
    // encoder.rs:839): snake_case type strings, [ts, value] tuple
    // points, the host tag promoted to the top-level `host` key
    "sink_datadog_metrics" -> { (s, dir) =>
      val base = ev(s, dir).select(
        col("event_id"),
        concat(lit("ev_"), col("event_type")).as("name"),
        when(pmod(col("event_id"), lit(2)) === 0, lit("incremental"))
          .otherwise(lit("absolute")).as("kind"),
        col("value"), col("ts"),
        map(lit("host"),
          concat(lit("h"), pmod(col("user_id"), lit(5))),
          lit("env"), lit("prod")).as("tags"))
      val entry = graft.sinks.SaasSinks.datadogSeriesEntry(base)
      base.select(col("event_id"), entry.as("__e"))
        .select(
          col("event_id"),
          get_json_object(col("__e"), "$.metric").as("metric"),
          get_json_object(col("__e"), "$.type").as("mtype"),
          get_json_object(col("__e"), "$.points[0][0]").cast("long")
            .as("ts_s"),
          round(get_json_object(col("__e"), "$.points[0][1]")
            .cast("double"), 2).as("v"),
          get_json_object(col("__e"), "$.tags[0]").as("tag0"),
          get_json_object(col("__e"), "$.host").as("host"))
        .orderBy("event_id")
    },

    // cloudwatch PutLogEvents: one body per rendered (group, stream)
    // template pair, events time-ordered inside each request
    "sink_cloudwatch_logs" -> { (s, dir) =>
      val base = ev(s, dir).select(
        col("event_id"), col("ts"), col("event_type"),
        concat(col("event_type"), lit("#"), col("event_id")).as("message"))
      val bodies = graft.sinks.AwsSinks.cloudwatchLogsBodies(base,
        graft.sinks.AwsSinks.CloudwatchLogsConfig(
          "lg-{{ event_type }}", "s0", "", codec = "text"))
      bodies.select(
        get_json_object(col("__line"), "$.logGroupName").as("group"),
        get_json_object(col("__line"), "$.logStreamName").as("stream"),
        size(from_json(get_json_object(col("__line"), "$.logEvents"),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("timestamp",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("message",
                org.apache.spark.sql.types.StringType)))))).as("n"),
        get_json_object(col("__line"), "$.logEvents[0].timestamp")
          .cast("long").as("first_ms"))
        .orderBy("group")
    },

    // kinesis PutRecords entry: base64 Data + explicit partition key
    "sink_kinesis" -> { (s, dir) =>
      val base = ev(s, dir).select(
        col("event_id"), col("event_type"), col("user_id"))
      val entry = graft.sinks.AwsSinks.kinesisEntry(base,
        graft.sinks.AwsSinks.KinesisConfig("st", "",
          partitionKeyField = Some("user_id"), codec = "csv"))
      base.select(col("event_id"), entry.as("__e"))
        .select(
          col("event_id"),
          get_json_object(col("__e"), "$.Data").as("data_b64"),
          get_json_object(col("__e"), "$.PartitionKey").cast("long")
            .as("pkey"))
        .orderBy("event_id")
    },

    // new_relic Logs-API entry: ms timestamp, message fallback to the
    // event JSON, full event under attributes
    "sink_newrelic" -> { (s, dir) =>
      val base = ev(s, dir).select("event_id", "ts", "user_id", "event_type")
      val entry = graft.sinks.SaasSinks.newRelicLogEntry(base)
      base.select(col("event_id"), entry.as("__e"))
        .select(
          col("event_id"),
          get_json_object(col("__e"), "$.timestamp").cast("long")
            .as("ts_ms"),
          get_json_object(col("__e"), "$.attributes.event_type")
            .as("attr_event_type"),
          get_json_object(col("__e"), "$.attributes.user_id").cast("long")
            .as("attr_user_id"))
        .orderBy("event_id")
    },

    // statsd line encode: `name:value|type|#tags` text vs a
    // string-built oracle (src/sinks/statsd/encoder.rs shape)
    "sink_statsd_line" -> { (s, dir) =>
      val base = ev(s, dir).select(
        col("event_id"),
        concat(lit("ev_"), col("event_type")).as("name"),
        when(pmod(col("event_id"), lit(2)) === 0, lit("incremental"))
          .otherwise(lit("absolute")).as("kind"),
        round(col("value"), 1).as("value"),
        map(lit("host"),
          concat(lit("h"), pmod(col("user_id"), lit(5)))).as("tags"))
      base.select(col("event_id"),
        graft.sinks.SaasSinks.statsdLine(base, Some("graft")).as("line"))
        .orderBy("event_id")
    })

  val oracles: Map[String, String] = Map(

    "sink_es_bulk" ->
      """SELECT event_id,
        |  'logs-' || strftime(CAST(ts AS TIMESTAMP), '%Y.%m.%d') AS idx,
        |  event_id AS doc_id,
        |  event_type AS doc_event_type,
        |  user_id AS doc_user_id
        |FROM events ORDER BY event_id""".stripMargin,

    "sink_dd_series" ->
      """SELECT event_id,
        |  'app' AS namespace,
        |  event_type AS name,
        |  CASE WHEN k % 3 < 2 THEN 'incremental' ELSE 'absolute' END
        |    AS kind,
        |  CASE WHEN k % 3 < 2 THEN 'counter' ELSE 'gauge' END
        |    AS value_type,
        |  CASE WHEN k % 3 < 2 THEN round(value, 2) END AS counter_value,
        |  CASE WHEN k % 3 = 2 THEN round(value, 2) END AS gauge_value,
        |  CASE WHEN k % 3 = 1 THEN CAST(8000 AS BIGINT) END
        |    AS interval_ms,
        |  'h' || CAST(user_id % 4 AS VARCHAR) AS host,
        |  'prod' AS tag_env,
        |  'sda' || CAST(k % 2 AS VARCHAR) AS tag_device
        |FROM (SELECT *, CAST(json_extract_string(props,'$.k') AS BIGINT)
        |      AS k FROM events) ORDER BY event_id""".stripMargin,

    "sink_dd_sketch" ->
      """SELECT event_id,
        |  event_type AS name,
        |  'h' || CAST(user_id % 4 AS VARCHAR) AS host,
        |  'prod' AS tag_env,
        |  CAST(k % 7 + 1 AS BIGINT) AS cnt,
        |  round(value, 2) AS min_v,
        |  round(value, 2) AS max_v,
        |  round(value, 2) * CAST(k % 7 + 1 AS DOUBLE) AS sum_v,
        |  (round(value, 2) * CAST(k % 7 + 1 AS DOUBLE))
        |    / CAST(k % 7 + 1 AS DOUBLE) AS avg_v,
        |  CAST(1 AS INTEGER) AS bins,
        |  CAST(k % 7 + 1 AS BIGINT) AS n1,
        |  round(value, 2) AS q50,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_s
        |FROM (SELECT *, CAST(json_extract_string(props,'$.k') AS BIGINT)
        |      AS k FROM events)
        |WHERE value > 1e-9 ORDER BY event_id""".stripMargin,

    "sink_rw_families" ->
      """WITH t AS (SELECT event_id AS sid, round(value, 2) AS v,
        |    user_id,
        |    CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT * FROM (
        |  SELECT sid, 'fam0_bucket' AS sname, 'le' AS lk, '1' AS lv,
        |    CAST(k % 4 + 1 AS DOUBLE) AS sval FROM t WHERE k % 3 = 0
        |  UNION ALL SELECT sid, 'fam0_bucket', 'le', '2',
        |    CAST(k % 4 + 1 + user_id % 3 + 1 AS DOUBLE)
        |    FROM t WHERE k % 3 = 0
        |  UNION ALL SELECT sid, 'fam0_bucket', 'le', '+Inf',
        |    CAST(k % 4 + 1 + user_id % 3 + 1 AS DOUBLE)
        |    FROM t WHERE k % 3 = 0
        |  UNION ALL SELECT sid, 'fam0_sum', '', '', v
        |    FROM t WHERE k % 3 = 0
        |  UNION ALL SELECT sid, 'fam0_count', '', '',
        |    CAST(k % 4 + 1 + user_id % 3 + 1 AS DOUBLE)
        |    FROM t WHERE k % 3 = 0
        |  UNION ALL SELECT sid, 'fam1', 'quantile', '0.5', v
        |    FROM t WHERE k % 3 = 1
        |  UNION ALL SELECT sid, 'fam1', 'quantile', '0.99', v + 1
        |    FROM t WHERE k % 3 = 1
        |  UNION ALL SELECT sid, 'fam1_sum', '', '', v * 3
        |    FROM t WHERE k % 3 = 1
        |  UNION ALL SELECT sid, 'fam1_count', '', '',
        |    CAST(k % 7 + 1 AS DOUBLE) FROM t WHERE k % 3 = 1
        |  UNION ALL SELECT sid, 'fam2', 'quantile', '0.5', v
        |    FROM t WHERE k % 3 = 2
        |  UNION ALL SELECT sid, 'fam2', 'quantile', '0.75', v
        |    FROM t WHERE k % 3 = 2
        |  UNION ALL SELECT sid, 'fam2', 'quantile', '0.9', v
        |    FROM t WHERE k % 3 = 2
        |  UNION ALL SELECT sid, 'fam2', 'quantile', '0.95', v
        |    FROM t WHERE k % 3 = 2
        |  UNION ALL SELECT sid, 'fam2', 'quantile', '0.99', v
        |    FROM t WHERE k % 3 = 2
        |  UNION ALL SELECT sid, 'fam2_sum', '', '',
        |    v * CAST(k % 7 + 1 AS DOUBLE) FROM t WHERE k % 3 = 2
        |  UNION ALL SELECT sid, 'fam2_count', '', '',
        |    CAST(k % 7 + 1 AS DOUBLE) FROM t WHERE k % 3 = 2
        |) ORDER BY sid, sname, lk, lv""".stripMargin,

    "sink_dd_traces" ->
      """SELECT event_id,
        |  'v2' AS payload_version,
        |  'h' || CAST(user_id % 4 AS VARCHAR) AS host,
        |  'prod' AS env,
        |  '7.1' AS agent_version,
        |  CAST(k % 3 AS BIGINT) AS priority,
        |  CASE WHEN k % 5 = 0 THEN 'synthetics-browser' ELSE 'rum' END
        |    AS origin,
        |  FALSE AS dropped,
        |  'c' || CAST(k % 3 AS VARCHAR) AS container_id,
        |  'rust' AS language_name,
        |  '1.2' AS app_version,
        |  'core' AS tag_team,
        |  'svc' || CAST(user_id % 5 AS VARCHAR) AS service,
        |  event_type AS span_name,
        |  'GET /' || CAST(k AS VARCHAR) AS resource,
        |  event_id * 2 + 1 AS span_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) * 1000 AS start_ns,
        |  k * 1000000 AS duration,
        |  k % 2 AS error,
        |  'GET' AS meta_method
        |FROM (SELECT *, CAST(json_extract_string(props,'$.k') AS BIGINT)
        |      AS k FROM events) ORDER BY event_id""".stripMargin,

    "sink_apm_stats" ->
      """SELECT 'prod' AS env,
        |  'h' || CAST(user_id % 4 AS VARCHAR) AS hostname,
        |  'svc' || CAST(user_id % 5 AS VARCHAR) AS service,
        |  event_type AS name,
        |  'op-' || event_type AS resource,
        |  'web' AS span_type,
        |  CAST(200 + (k % 3) * 100 AS BIGINT) AS status_code,
        |  FALSE AS synthetics,
        |  endns - (endns % 10000000000) AS bucket_start,
        |  CAST(count(*) AS BIGINT) AS hits,
        |  CAST(count(*) AS BIGINT) AS top_hits,
        |  CAST(sum(k % 2) AS BIGINT) AS errors,
        |  CAST(sum(k * 1000000) AS BIGINT) AS duration_ns,
        |  CAST(sum(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS ok_total,
        |  CAST(sum(k % 2) AS BIGINT) AS err_total
        |FROM (SELECT *,
        |        CAST(json_extract_string(props,'$.k') AS BIGINT) AS k,
        |        epoch_us(CAST(ts AS TIMESTAMP)) * 1000
        |          + CAST(json_extract_string(props,'$.k') AS BIGINT)
        |            * 1000000 AS endns
        |      FROM events)
        |GROUP BY user_id % 4, user_id % 5, event_type, k % 3,
        |  endns - (endns % 10000000000)
        |ORDER BY hostname, service, name, status_code,
        |  bucket_start""".stripMargin,

    "sink_dd_hist" ->
      """SELECT event_id,
        |  event_type AS name,
        |  CAST(3 + k % 5 + user_id % 3 + k % 2 AS BIGINT) AS cnt,
        |  CAST(3 + k % 5 + user_id % 3 + k % 2 AS BIGINT) AS n_total
        |FROM (SELECT *, CAST(json_extract_string(props,'$.k') AS BIGINT)
        |      AS k FROM events) ORDER BY event_id""".stripMargin,

    "sink_hec_metrics" ->
      """SELECT event_id,
        |  '{"event":"metric","fields":{"_value":'
        |    || CAST(round(value, 2) AS VARCHAR)
        |    || ',"env":"prod","host":"h' || CAST(user_id % 4 AS VARCHAR)
        |    || '","metric_name":"app.' || event_type
        |    || '"},"time":'
        |    || printf('%.3f', epoch_ms(CAST(ts AS TIMESTAMP)) / 1000.0)
        |    || ',"host":"h' || CAST(user_id % 4 AS VARCHAR) || '"}'
        |    AS line
        |FROM events ORDER BY event_id""".stripMargin,

    "sink_sematext_metrics" ->
      """SELECT event_id,
        |  'app,env=prod,metric_type=counter,token=tok-1 '
        |    || event_type || '=' || CAST(round(value, 2) AS VARCHAR)
        |    || ' ' || CAST(epoch_us(CAST(ts AS TIMESTAMP)) * 1000 AS VARCHAR)
        |    AS line
        |FROM events ORDER BY event_id""".stripMargin,

    "sink_hec" ->
      """SELECT event_id,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS time_s,
        |  'h' || CAST(user_id AS VARCHAR) AS host,
        |  'graft' AS sourcetype,
        |  event_type AS event_event_type
        |FROM events ORDER BY event_id""".stripMargin,

    "sink_loki" ->
      """SELECT '{"stream":{"app":"' || event_type || '"},"values":['
        |  || string_agg(
        |       '["' || CAST(epoch_us(CAST(ts AS TIMESTAMP)) * 1000 AS VARCHAR)
        |         || '","' || event_type || ':' || CAST(event_id AS VARCHAR)
        |         || '"]',
        |       ',' ORDER BY CAST(epoch_us(CAST(ts AS TIMESTAMP)) * 1000 AS VARCHAR),
        |                    event_type || ':' || CAST(event_id AS VARCHAR))
        |  || ']}' AS payload
        |FROM events GROUP BY event_type ORDER BY payload""".stripMargin,

    "sink_influx" ->
      """SELECT event_id,
        |  'events_total,host=h' || CAST(user_id % 5 AS VARCHAR)
        |    || ',type=' || event_type
        |    || ' value=' || CAST(CAST(json_extract_string(props,'$.k')
        |         AS DOUBLE) AS VARCHAR)
        |    || ' ' || CAST(epoch_us(CAST(ts AS TIMESTAMP)) * 1000 AS VARCHAR)
        |    AS line
        |FROM events ORDER BY event_id""".stripMargin,

    "sink_remote_write" ->
      """SELECT
        |  '__name__=ev_' || event_type || ',host=h'
        |    || CAST(user_id % 5 AS VARCHAR) AS labels,
        |  count(*) AS n_samples,
        |  CAST(SUM(CAST(json_extract_string(props,'$.k') AS BIGINT))
        |    AS BIGINT) AS sum_v,
        |  min(epoch_ms(CAST(ts AS TIMESTAMP))) AS first_ms,
        |  max(epoch_ms(CAST(ts AS TIMESTAMP))) AS last_ms
        |FROM events GROUP BY event_type, user_id % 5
        |ORDER BY labels""".stripMargin,

    "sink_s3_keys" ->
      """SELECT 'type=' || event_type || '/date='
        |    || strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS prefix,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS sum_id
        |FROM events GROUP BY 1 ORDER BY prefix""".stripMargin,

    "sink_datadog" ->
      """SELECT event_id,
        |  'vector' AS ddsource,
        |  'webapp' AS service,
        |  epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
        |  event_type AS msg_event_type
        |FROM events ORDER BY event_id""".stripMargin,

    "sink_datadog_metrics" ->
      """SELECT event_id,
        |  'ev_' || event_type AS metric,
        |  CASE WHEN event_id % 2 = 0 THEN 'count' ELSE 'gauge' END
        |    AS mtype,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_s,
        |  round(value, 2) AS v,
        |  'env:prod' AS tag0,
        |  'h' || CAST(user_id % 5 AS VARCHAR) AS host
        |FROM events ORDER BY event_id""".stripMargin,

    "sink_cloudwatch_logs" ->
      """SELECT 'lg-' || event_type AS "group", 's0' AS stream,
        |  CAST(count(*) AS INT) AS n,
        |  min(epoch_ms(CAST(ts AS TIMESTAMP))) AS first_ms
        |FROM events GROUP BY event_type ORDER BY "group"""".stripMargin,

    "sink_kinesis" ->
      """SELECT event_id,
        |  to_base64(CAST(CAST(event_id AS VARCHAR) || ',' || event_type
        |    || ',' || CAST(user_id AS VARCHAR) AS BLOB)) AS data_b64,
        |  user_id AS pkey
        |FROM events ORDER BY event_id""".stripMargin,

    "sink_newrelic" ->
      """SELECT event_id,
        |  epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
        |  event_type AS attr_event_type,
        |  user_id AS attr_user_id
        |FROM events ORDER BY event_id""".stripMargin,

    "sink_statsd_line" ->
      """SELECT event_id,
        |  'graft.ev_' || event_type || ':' || CAST(round(value,1) AS VARCHAR)
        |    || '|' || (CASE WHEN event_id % 2 = 0 THEN 'c' ELSE 'g' END)
        |    || '|#host:h' || CAST(user_id % 5 AS VARCHAR) AS line
        |FROM events ORDER BY event_id""".stripMargin)
}
