package graft.streaming

import org.apache.spark.sql.Row
import graft.codecs.ProtobufCodec
import graft.codecs.ProtobufCodec._

/** The datadog_agent source's protobuf intake legs — v2 series
  * (reference src/sources/datadog_agent/metrics.rs:149-390
  * `decode_ddseries_v2`, proto/vector/dd_metric.proto MetricPayload),
  * sketches (metrics.rs:552-613 `decode_ddsketch`, SketchPayload), and
  * traces (src/sources/datadog_agent/traces.rs, proto/vector/
  * dd_trace.proto TracePayload, both the older traces/transactions form
  * and the newer tracerPayloads form).
  *
  * Pure byte→row decoders over the repo's own proto wire walker
  * (ProtobufCodec schemas hand-declared from the public .proto) — the
  * HTTP surface in HttpPushSources routes bodies here; keeping decode
  * pure makes it testable without a server and reusable by any
  * transport.
  */
object DdAgentIntake {

  /** One metric sample on the `<id>.metrics` output port — the sparse
    * union shape of model.Metrics: counter/gauge carry a value, sketch
    * rows carry the agent DDSketch's raw (cnt,min,max,sum,avg,k,n).
    */
  final case class DdMetricRow(
      namespace: String, name: String, tags: Map[String, String],
      host: String, timestamp_s: java.lang.Long,
      interval_ms: java.lang.Long, kind: String, value_type: String,
      counter_value: java.lang.Double, gauge_value: java.lang.Double,
      sketch_cnt: java.lang.Long, sketch_min: java.lang.Double,
      sketch_max: java.lang.Double, sketch_sum: java.lang.Double,
      sketch_avg: java.lang.Double, sketch_k: Seq[Long],
      sketch_n: Seq[Long])

  /** One span of a trace event (traces.rs `convert_span`; trace_id/
    * span_id/parent_id are forced into i64 like the reference, start is
    * epoch NANOS kept as long to preserve the wire precision).
    */
  final case class DdSpanRow(
      service: String, name: String, resource: String, trace_id: Long,
      span_id: Long, parent_id: Long, start_ns: Long, duration: Long,
      error: Long, meta: Map[String, String],
      metrics: Map[String, Double], span_type: String)

  /** One trace event on the `<id>.traces` port. `payload_version` is
    * "v1" for the older traces/transactions form, "v2" for
    * tracerPayloads (traces.rs:144,175).
    */
  final case class DdTraceRow(
      payload_version: String, host: String, env: String,
      agent_version: String, target_tps: java.lang.Double,
      error_tps: java.lang.Double, tags: Map[String, String],
      trace_id: java.lang.Long, start_time_ns: java.lang.Long,
      end_time_ns: java.lang.Long, priority: java.lang.Long,
      origin: String, dropped: java.lang.Boolean, container_id: String,
      language_name: String, language_version: String,
      tracer_version: String, runtime_id: String, app_version: String,
      spans: Seq[DdSpanRow])

  // ---- proto schemas (proto/vector/dd_metric.proto) -------------------

  val metricPointSchema: ProtoSchema = ProtoSchema(Seq(
    ProtoField(1, "value", PDouble), ProtoField(2, "timestamp", PVarint)))
  val resourceSchema: ProtoSchema = ProtoSchema(Seq(
    ProtoField(1, "type", PString), ProtoField(2, "name", PString)))
  val metricSeriesSchema: ProtoSchema = ProtoSchema(Seq(
    ProtoField(1, "resources", PRepeated(PMessage(resourceSchema))),
    ProtoField(2, "metric", PString),
    ProtoField(3, "tags", PRepeated(PString)),
    ProtoField(4, "points", PRepeated(PMessage(metricPointSchema))),
    ProtoField(5, "type", PVarint),
    ProtoField(6, "unit", PString),
    ProtoField(7, "source_type_name", PString),
    ProtoField(8, "interval", PVarint)))
  val metricPayloadSchema: ProtoSchema = ProtoSchema(Seq(
    ProtoField(1, "series", PRepeated(PMessage(metricSeriesSchema)))))

  val dogsketchSchema: ProtoSchema = ProtoSchema(Seq(
    ProtoField(1, "ts", PVarint), ProtoField(2, "cnt", PVarint),
    ProtoField(3, "min", PDouble), ProtoField(4, "max", PDouble),
    ProtoField(5, "avg", PDouble), ProtoField(6, "sum", PDouble),
    ProtoField(7, "k", PRepeated(PSint)),
    ProtoField(8, "n", PRepeated(PVarint))))
  val sketchSchema: ProtoSchema = ProtoSchema(Seq(
    ProtoField(1, "metric", PString), ProtoField(2, "host", PString),
    ProtoField(4, "tags", PRepeated(PString)),
    ProtoField(7, "dogsketches", PRepeated(PMessage(dogsketchSchema)))))
  val sketchPayloadSchema: ProtoSchema = ProtoSchema(Seq(
    ProtoField(1, "sketches", PRepeated(PMessage(sketchSchema)))))

  // ---- proto schemas (proto/vector/dd_trace.proto) --------------------

  private val strEntry = ProtoSchema(Seq(
    ProtoField(1, "key", PString), ProtoField(2, "value", PString)))
  private val dblEntry = ProtoSchema(Seq(
    ProtoField(1, "key", PString), ProtoField(2, "value", PDouble)))
  val spanSchema: ProtoSchema = ProtoSchema(Seq(
    ProtoField(1, "service", PString), ProtoField(2, "name", PString),
    ProtoField(3, "resource", PString),
    ProtoField(4, "trace_id", PVarint),
    ProtoField(5, "span_id", PVarint),
    ProtoField(6, "parent_id", PVarint),
    ProtoField(7, "start", PVarint), ProtoField(8, "duration", PVarint),
    ProtoField(9, "error", PVarint),
    ProtoField(10, "meta", PRepeated(PMessage(strEntry))),
    ProtoField(11, "metrics", PRepeated(PMessage(dblEntry))),
    ProtoField(12, "type", PString)))
  val apiTraceSchema: ProtoSchema = ProtoSchema(Seq(
    ProtoField(1, "trace_id", PVarint),
    ProtoField(2, "spans", PRepeated(PMessage(spanSchema))),
    ProtoField(6, "start_time", PVarint),
    ProtoField(7, "end_time", PVarint)))
  val traceChunkSchema: ProtoSchema = ProtoSchema(Seq(
    ProtoField(1, "priority", PVarint), ProtoField(2, "origin", PString),
    ProtoField(3, "spans", PRepeated(PMessage(spanSchema))),
    ProtoField(4, "tags", PRepeated(PMessage(strEntry))),
    ProtoField(5, "dropped_trace", PVarint)))
  val tracerPayloadSchema: ProtoSchema = ProtoSchema(Seq(
    ProtoField(1, "container_id", PString),
    ProtoField(2, "language_name", PString),
    ProtoField(3, "language_version", PString),
    ProtoField(4, "tracer_version", PString),
    ProtoField(5, "runtime_id", PString),
    ProtoField(6, "chunks", PRepeated(PMessage(traceChunkSchema))),
    ProtoField(7, "tags", PRepeated(PMessage(strEntry))),
    ProtoField(8, "env", PString),
    ProtoField(9, "hostname", PString),
    ProtoField(10, "app_version", PString)))
  val tracePayloadSchema: ProtoSchema = ProtoSchema(Seq(
    ProtoField(1, "host_name", PString), ProtoField(2, "env", PString),
    ProtoField(3, "traces", PRepeated(PMessage(apiTraceSchema))),
    ProtoField(4, "transactions", PRepeated(PMessage(spanSchema))),
    ProtoField(5, "tracer_payloads",
      PRepeated(PMessage(tracerPayloadSchema))),
    ProtoField(6, "tags", PRepeated(PMessage(strEntry))),
    ProtoField(7, "agent_version", PString),
    ProtoField(8, "target_tps", PDouble),
    ProtoField(9, "error_tps", PDouble)))

  // ---- row helpers ----------------------------------------------------

  private def str(r: Row, f: String): String =
    Option(r.getAs[Any](f)).map(_.toString).orNull
  private def strOr(r: Row, f: String, dflt: String): String =
    Option(str(r, f)).getOrElse(dflt)
  private def lng(r: Row, f: String): Long =
    Option(r.getAs[Any](f)).map(_.asInstanceOf[Long]).getOrElse(0L)
  private def dbl(r: Row, f: String): Double =
    Option(r.getAs[Any](f)).map(_.asInstanceOf[Double]).getOrElse(0.0)
  private def rows(r: Row, f: String): Seq[Row] =
    Option(r.getAs[Seq[Row]](f)).getOrElse(Nil)
  private def longs(r: Row, f: String): Seq[Long] =
    Option(r.getAs[Seq[Long]](f)).getOrElse(Nil)
  private def strMap(entries: Seq[Row]): Map[String, String] =
    entries.map(e => strOr(e, "key", "") -> strOr(e, "value", "")).toMap

  /** extract_tag_key_and_value (sources/util/mod.rs:88): split on the
    * first ':'; a bare tag keeps an empty value (the `tag:` notation).
    */
  def tagMap(tags: Seq[String]): Map[String, String] =
    tags.map { t =>
      t.split(":", 2) match {
        case Array(k, v) => k -> v
        case Array(k) => k -> ""
      }
    }.toMap

  /** namespace_name_from_dd_metric (metrics.rs:537-545): split at the
    * first '.'; no delimiter → no namespace.
    */
  def splitNamespace(metric: String, split: Boolean): (String, String) =
    if (!split) (null, metric)
    else metric.split("\\.", 2) match {
      case Array(ns, rest) => (ns, rest)
      case _ => (null, metric)
    }

  // ---- decoders -------------------------------------------------------

  /** /api/v2/series (decode_ddseries_v2): COUNT(1) → incremental
    * counter; RATE(2) → incremental counter value×interval with
    * interval_ms set; GAUGE(3) → absolute gauge (+ non-rate interval
    * when positive, the DogStatsD `as_rate` affordance); UNSPECIFIED
    * dropped. Resources: `host` → the host field, `device` → a device
    * tag, others → `resource.<type>` tags (metrics.rs:290-305).
    */
  def decodeSeriesV2(body: Array[Byte],
                     split: Boolean = true): Seq[DdMetricRow] = {
    val payload = ProtobufCodec.decodeTo(metricPayloadSchema, body)
    rows(payload, "series").flatMap { serie =>
      val (ns, name) = splitNamespace(strOr(serie, "metric", ""), split)
      var tags = tagMap(Option(serie.getAs[Seq[String]]("tags"))
        .getOrElse(Nil))
      var host: String = null
      rows(serie, "resources").foreach { res =>
        (strOr(res, "type", ""), strOr(res, "name", "")) match {
          case ("host", n) => host = n
          case ("device", n) => tags += ("device" -> n)
          case (t, n) => tags += (s"resource.$t" -> n)
        }
      }
      val stn = strOr(serie, "source_type_name", "")
      if (stn.nonEmpty) tags += ("source_type_name" -> stn)
      val interval = lng(serie, "interval")
      val points = rows(serie, "points")
      lng(serie, "type") match {
        case 1 => // COUNT
          points.map(p => DdMetricRow(ns, name, tags, host,
            lng(p, "timestamp"), null, "incremental", "counter",
            dbl(p, "value"), null, null, null, null, null, null, null,
            null))
        case 2 => // RATE: value × interval, interval_ms recorded
          val i = if (interval != 0) interval else 1L
          points.map(p => DdMetricRow(ns, name, tags, host,
            lng(p, "timestamp"), i * 1000, "incremental", "counter",
            dbl(p, "value") * i, null, null, null, null, null, null,
            null, null))
        case 3 => // GAUGE (+ non-rate interval when positive)
          val nonRate: java.lang.Long =
            if (interval > 0) java.lang.Long.valueOf(interval * 1000)
            else null
          points.map(p => DdMetricRow(ns, name, tags, host,
            lng(p, "timestamp"), nonRate, "absolute", "gauge", null,
            dbl(p, "value"), null, null, null, null, null, null, null))
        case _ => Nil // UNSPECIFIED (metrics.rs:376-379)
      }
    }
  }

  /** /api/beta/sketches (decode_ddsketch): each dogsketch becomes one
    * incremental sketch sample carrying the agent sketch's raw state
    * (cnt,min,max,sum,avg,k,n — metrics.rs:571-586 AgentDDSketch::
    * from_raw); the series host lands on the host field.
    */
  def decodeSketches(body: Array[Byte],
                     split: Boolean = true): Seq[DdMetricRow] = {
    val payload = ProtobufCodec.decodeTo(sketchPayloadSchema, body)
    rows(payload, "sketches").flatMap { sk =>
      val (ns, name) = splitNamespace(strOr(sk, "metric", ""), split)
      val tags = tagMap(Option(sk.getAs[Seq[String]]("tags"))
        .getOrElse(Nil))
      val host = str(sk, "host")
      rows(sk, "dogsketches").map { d =>
        DdMetricRow(ns, name, tags, host, lng(d, "ts"), null,
          "incremental", "sketch", null, null, lng(d, "cnt"),
          dbl(d, "min"), dbl(d, "max"), dbl(d, "sum"), dbl(d, "avg"),
          longs(d, "k"), longs(d, "n"))
      }
    }
  }

  private def span(r: Row): DdSpanRow =
    DdSpanRow(strOr(r, "service", ""), strOr(r, "name", ""),
      strOr(r, "resource", ""), lng(r, "trace_id"), lng(r, "span_id"),
      lng(r, "parent_id"), lng(r, "start"), lng(r, "duration"),
      lng(r, "error"), strMap(rows(r, "meta")),
      rows(r, "metrics").map(e =>
        strOr(e, "key", "") -> dbl(e, "value")).toMap,
      strOr(r, "type", ""))

  /** /api/v0.2/traces (traces.rs handle_dd_trace_payload): empty
    * tracerPayloads → the older form (one event per trace + one
    * dropped=true event per transaction, payload_version "v1"); else
    * the newer form (one event per chunk with chunk ∪ tracer ∪ payload
    * tags, payload_version "v2").
    */
  def decodeTraces(body: Array[Byte],
                   lang: Option[String] = None): Seq[DdTraceRow] = {
    val p = ProtobufCodec.decodeTo(tracePayloadSchema, body)
    val host = str(p, "host_name")
    val env = str(p, "env")
    val tracerPayloads = rows(p, "tracer_payloads")
    if (tracerPayloads.isEmpty) {
      val traces = rows(p, "traces").map { t =>
        DdTraceRow("v1", host, env, null, null, null, null,
          lng(t, "trace_id"), lng(t, "start_time"), lng(t, "end_time"),
          null, null, null, null, lang.orNull, null, null, null, null,
          rows(t, "spans").map(span))
      }
      val transactions = rows(p, "transactions").map { s =>
        DdTraceRow("v1", host, env, null, null, null, null, null, null,
          null, null, null, java.lang.Boolean.TRUE, null, lang.orNull,
          null, null, null, null, Seq(span(s)))
      }
      traces ++ transactions
    } else {
      val topTags = strMap(rows(p, "tags"))
      val agentVersion = str(p, "agent_version")
      val targetTps = dbl(p, "target_tps")
      val errorTps = dbl(p, "error_tps")
      tracerPayloads.flatMap { tp =>
        val tpTags = strMap(rows(tp, "tags"))
        rows(tp, "chunks").map { ch =>
          // chunk tags extended by tracer tags extended by payload tags
          // (traces.rs:155-177)
          val tags = strMap(rows(ch, "tags")) ++ tpTags ++ topTags
          DdTraceRow("v2", host, env, agentVersion, targetTps, errorTps,
            tags, null, null, null, lng(ch, "priority"),
            strOr(ch, "origin", ""), lng(ch, "dropped_trace") != 0,
            strOr(tp, "container_id", ""),
            strOr(tp, "language_name", ""),
            strOr(tp, "language_version", ""),
            strOr(tp, "tracer_version", ""),
            strOr(tp, "runtime_id", ""), strOr(tp, "app_version", ""),
            rows(ch, "spans").map(span))
        }
      }
    }
  }
}
