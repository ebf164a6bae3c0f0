package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.codecs.{MsgPack, ProtobufCodec}
import graft.functions.Template
import graft.model.AgentSketch
import graft.streaming.DdAgentIntake
import NetworkSinks.HttpConfig

/** `datadog_traces` protobuf egress + APM stats — parity with the
  * reference sink (src/sinks/datadog/traces/):
  *
  *  - each trace event encodes as ONE `TracerPayload` inside a
  *    single-payload `TracePayload` fragment
  *    (request_builder.rs:256-344 encode_trace / convert_span);
  *    fragment concatenation of the repeated `tracer_payloads` field
  *    is a valid batched TracePayload (proto3 merge — the singular
  *    host_name/env resolve last-wins, uniform per batch like the
  *    reference's per-PartitionKey batching). POSTed to
  *    `/api/v0.2/traces` as application/x-protobuf.
  *  - APM stats (apm_stats/): spans flagged top-level / measured /
  *    partial-snapshot aggregate into 10-second buckets keyed by
  *    (env, hostname, version, container_id) × (service, name,
  *    resource, type, http status, synthetics), each group carrying
  *    weighted hits/errors/duration plus ok/error latency
  *    distributions as agent DDSketches (bucket.rs:147-190). The
  *    grouped result rides ONE keyed aggregation (a custom typed
  *    Aggregator mirroring Bucket::update), and the bounded output
  *    (#buckets × #services rows) exports driver-side as the
  *    msgpack `StatsPayload` (mod.rs:42-100, rmp_serde to_vec_named
  *    field order) with `ddsketch_full` proto summaries
  *    (bucket.rs:56-117) to `/api/v0.2/stats`.
  *
  * Proto schemas are shared with the datadog_agent SOURCE
  * (DdAgentIntake.tracePayloadSchema) so sink-encoded wire bytes decode
  * through the intake's own decode leg (the sink_dd_traces oracle
  * query round-trips exactly that).
  */
object DdTraces {

  case class Config(
      endpoint: String, apiKey: String,
      env: String = "", agentVersion: String = "",
      targetTps: Double = 0.0, errorTps: Double = 0.0,
      computeStats: Boolean = true,
      maxEvents: Int = 100)
      extends Serializable

  val BucketNs: Long = 10000000000L // BUCKET_DURATION_NANOSECONDS

  // ---- trace-shape normalization --------------------------------------

  private def sortedEntries(m: Column): Column = array_sort(map_entries(m))

  /** Accepts either trace events (a `spans` array column, the dd
    * intake's shape) or bare span rows (trace_id/span_id/... columns,
    * grouped here into one trace per trace_id — one keyed shuffle).
    */
  def asTraces(df: DataFrame): DataFrame =
    if (df.columns.contains("spans")) df
    else {
      val cols = df.columns.toSet
      def optCol(n: String, dflt: Column): Column =
        if (cols(n)) col(n) else dflt
      val startNs =
        if (cols("start_ns")) col("start_ns").cast("long")
        else unix_micros(Template.timestampCol(df.schema)) * 1000L
      val durationNs =
        if (cols("duration")) col("duration").cast("long")
        else (optCol("duration_ms", lit(0)).cast("double") * 1e6)
          .cast("long")
      val span = struct(
        optCol("service", lit("")).cast("string").as("service"),
        optCol("name", lit("")).cast("string").as("name"),
        optCol("resource", optCol("name", lit(""))).cast("string")
          .as("resource"),
        col("trace_id").cast("long").as("trace_id"),
        col("span_id").cast("long").as("span_id"),
        optCol("parent_id", lit(0L)).cast("long").as("parent_id"),
        startNs.as("start_ns"),
        durationNs.as("duration"),
        optCol("error", lit(0L)).cast("long").as("error"),
        optCol("meta", map().cast("map<string,string>")).as("meta"),
        optCol("metrics", map().cast("map<string,double>")).as("metrics"),
        optCol("span_type", lit("")).cast("string").as("span_type"))
      df.groupBy(col("trace_id").as("__tid"))
        .agg(collect_list(span).as("spans"))
        .drop("__tid")
    }

  // ---- TracePayload fragments ------------------------------------------

  /** One single-TracerPayload TracePayload fragment per trace row. */
  def traceFragment(df: DataFrame, cfg: Config): Column = {
    val cols = df.columns.toSet
    def optCol(n: String, dflt: Column): Column =
      if (cols(n)) coalesce(col(n).cast("string"), dflt) else dflt
    val protoSpan = (s: Column) => struct(
      s.getField("service").as("service"),
      s.getField("name").as("name"),
      s.getField("resource").as("resource"),
      s.getField("trace_id").as("trace_id"),
      s.getField("span_id").as("span_id"),
      s.getField("parent_id").as("parent_id"),
      s.getField("start_ns").as("start"),
      s.getField("duration").as("duration"),
      s.getField("error").as("error"),
      // BTreeMap iteration order = sorted by key (convert_span)
      transform(array_sort(map_entries(coalesce(s.getField("meta"),
        map().cast("map<string,string>")))), e => struct(
        e.getField("key").as("key"), e.getField("value").as("value")))
        .as("meta"),
      transform(array_sort(map_entries(coalesce(s.getField("metrics"),
        map().cast("map<string,double>")))), e => struct(
        e.getField("key").as("key"), e.getField("value").as("value")))
        .as("metrics"),
      s.getField("span_type").as("type"))
    val tags =
      if (cols("tags")) coalesce(col("tags"),
        map().cast("map<string,string>"))
      else map().cast("map<string,string>")
    val tagEntries = transform(sortedEntries(tags), e => struct(
      e.getField("key").as("key"), e.getField("value").as("value")))
    val priority =
      if (cols("priority")) coalesce(col("priority").cast("long"), lit(1L))
      else lit(1L) // sampler default (request_builder.rs:287-292)
    val dropped =
      if (cols("dropped"))
        coalesce(col("dropped").cast("boolean"), lit(false)).cast("long")
      else lit(0L)
    val chunk = struct(
      priority.as("priority"),
      optCol("origin", lit("")).as("origin"),
      transform(col("spans"), protoSpan).as("spans"),
      tagEntries.as("tags"),
      dropped.as("dropped_trace"))
    val tracerPayload = struct(
      optCol("container_id", lit("")).as("container_id"),
      optCol("language_name", lit("")).as("language_name"),
      optCol("language_version", lit("")).as("language_version"),
      optCol("tracer_version", lit("")).as("tracer_version"),
      optCol("runtime_id", lit("")).as("runtime_id"),
      array(chunk).as("chunks"),
      tagEntries.as("tags"), // tags ride at chunk AND tracer level
      optCol("env", lit(cfg.env)).as("env"),
      optCol("host", lit("")).as("hostname"),
      optCol("app_version", lit("")).as("app_version"))
    val payload = struct(
      optCol("host", lit("")).as("host_name"),
      optCol("env", lit(cfg.env)).as("env"),
      lit(null).cast(DdAgentIntake.tracePayloadSchema.sparkType
        .apply("traces").dataType).as("traces"),
      lit(null).cast(DdAgentIntake.tracePayloadSchema.sparkType
        .apply("transactions").dataType).as("transactions"),
      array(tracerPayload).as("tracer_payloads"),
      lit(null).cast("array<struct<key:string,value:string>>").as("tags"),
      lit(cfg.agentVersion).as("agent_version"),
      lit(cfg.targetTps).as("target_tps"),
      lit(cfg.errorTps).as("error_tps"))
    ProtobufCodec.encode(DdAgentIntake.tracePayloadSchema, payload)
  }

  // ---- APM stats --------------------------------------------------------

  final case class ApmSpanIn(duration: Long, error: Boolean,
      weight: Double, isTop: Boolean)
  final case class ApmBuf(hits: Double, topHits: Double, errors: Double,
      duration: Double, ok: Map[Int, Long], err: Map[Int, Long])
  final case class ApmBin(k: Int, n: Long)
  final case class ApmOut(hits: Long, top_level_hits: Long, errors: Long,
      duration: Long, ok_zero: Long, ok_bins: Seq[ApmBin],
      err_zero: Long, err_bins: Seq[ApmBin])

  /** GroupedStats accumulation (bucket.rs Bucket::update): weighted
    * hits/top-level-hits/errors/duration plus per-outcome duration
    * distributions bucketed by the agent sketch's key function. The
    * export rounds the weighted sums like ClientGroupedStats
    * (bucket.rs:36-52) and splits the k=0 bin out as the ddsketch_full
    * zero count (convert_stores, bucket.rs:95-117).
    */
  final class ApmStatsAgg extends Aggregator[ApmSpanIn, ApmBuf, ApmOut] {
    override def zero: ApmBuf =
      ApmBuf(0.0, 0.0, 0.0, 0.0, Map.empty, Map.empty)
    override def reduce(b: ApmBuf, s: ApmSpanIn): ApmBuf = {
      val k = AgentSketch.key(s.duration.toDouble)
      val (ok, err) =
        if (s.error) (b.ok, b.err + (k -> (b.err.getOrElse(k, 0L) + 1L)))
        else (b.ok + (k -> (b.ok.getOrElse(k, 0L) + 1L)), b.err)
      ApmBuf(b.hits + s.weight,
        b.topHits + (if (s.isTop) s.weight else 0.0),
        b.errors + (if (s.error) s.weight else 0.0),
        b.duration + s.duration.toDouble * s.weight, ok, err)
    }
    override def merge(a: ApmBuf, b: ApmBuf): ApmBuf = ApmBuf(
      a.hits + b.hits, a.topHits + b.topHits, a.errors + b.errors,
      a.duration + b.duration,
      (a.ok.keySet ++ b.ok.keySet).map(k =>
        k -> (a.ok.getOrElse(k, 0L) + b.ok.getOrElse(k, 0L))).toMap,
      (a.err.keySet ++ b.err.keySet).map(k =>
        k -> (a.err.getOrElse(k, 0L) + b.err.getOrElse(k, 0L))).toMap)
    override def finish(b: ApmBuf): ApmOut = {
      def split(m: Map[Int, Long]): (Long, Seq[ApmBin]) =
        (m.getOrElse(0, 0L),
          m.toSeq.filter(_._1 != 0).sortBy(_._1)
            .map { case (k, n) => ApmBin(k, n) })
      val (okZero, okBins) = split(b.ok)
      val (errZero, errBins) = split(b.err)
      ApmOut(math.round(b.hits), math.round(b.topHits),
        math.round(b.errors), math.round(b.duration),
        okZero, okBins, errZero, errBins)
    }
    override def bufferEncoder: Encoder[ApmBuf] = Encoders.product[ApmBuf]
    override def outputEncoder: Encoder[ApmOut] = Encoders.product[ApmOut]
  }

  /** The APM stats aggregation: one grouped-stats row per
    * (10 s bucket × payload key × bucket key) — the plan is a
    * projection + explode + ONE keyed aggregation; the result
    * cardinality is bounded by distinct keys, not event count.
    */
  def apmStats(traces: DataFrame, cfg: Config): DataFrame = {
    val cols = traces.columns.toSet
    def optCol(n: String, dflt: Column): Column =
      if (cols(n)) coalesce(col(n).cast("string"), dflt) else dflt
    // weight from the root span (weight.rs:17-63): parent_id == 0 →
    // 1/_sample_rate when 0 < rate ≤ 1; no identifiable root → 1.0
    // (the reference's own ambiguity default)
    val root = element_at(filter(col("spans"),
      s => s.getField("parent_id") === 0L), 1)
    val sr = element_at(root.getField("metrics"), "_sample_rate")
    val weight = when(sr.isNotNull && sr > 0.0 && sr <= 1.0,
      lit(1.0) / sr).otherwise(lit(1.0))
    val synthetics = optCol("origin", lit(""))
      .startsWith("synthetics")
    val base = traces.select(
      optCol("env", lit(cfg.env)).as("__env0"),
      optCol("host", lit("")).as("hostname"),
      optCol("app_version", lit("")).as("version"),
      optCol("container_id", lit("")).as("container_id"),
      synthetics.as("synthetics"),
      weight.as("__w"),
      explode(col("spans")).as("s"))
    val m = col("s.metrics")
    val eligible = base.withColumn("__top",
        element_at(m, "_top_level") === 1.0)
      .withColumn("__measured", element_at(m, "_dd.measured") === 1.0)
      .withColumn("__partial",
        element_at(m, "_dd.partial_version") >= 0.0)
      .where(coalesce(col("__top"), lit(false)) ||
        coalesce(col("__measured"), lit(false)) ||
        coalesce(col("__partial"), lit(false)))
    val statsAgg = udaf(new ApmStatsAgg)
    eligible.select(
        // span meta `env` overrides the payload env
        // (PayloadAggregationKey::with_span_context)
        coalesce(element_at(col("s.meta"), "env"), col("__env0"))
          .as("env"),
        col("hostname"), col("version"), col("container_id"),
        // bucket = 10 s window holding span END time (handle_span)
        ((col("s.start_ns") + col("s.duration"))
          - pmod(col("s.start_ns") + col("s.duration"), lit(BucketNs)))
          .as("bucket_start"),
        col("s.service").as("service"),
        col("s.name").as("name"),
        col("s.resource").as("resource"),
        col("s.span_type").as("span_type"),
        coalesce(element_at(col("s.meta"), "http.status_code")
          .cast("long"), lit(0L)).as("status_code"),
        col("synthetics"),
        col("s.duration").as("__dur"),
        (col("s.error") =!= 0L).as("__err"),
        col("__w"), coalesce(col("__top"), lit(false)).as("__top"))
      .groupBy("env", "hostname", "version", "container_id",
        "bucket_start", "service", "name", "resource", "span_type",
        "status_code", "synthetics")
      .agg(statsAgg(col("__dur"), col("__err"), col("__w"),
        col("__top")).as("stats"))
  }

  // ---- ddsketch_full + msgpack export -----------------------------------

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def writeKey(out: java.io.ByteArrayOutputStream, no: Int, wt: Int): Unit =
    writeVarint(out, (no.toLong << 3) | wt)
  private def writeDoubleField(out: java.io.ByteArrayOutputStream, no: Int, v: Double): Unit = {
    writeKey(out, no, 1)
    var x = java.lang.Double.doubleToLongBits(v)
    (0 until 8).foreach { _ => out.write((x & 0xff).toInt); x >>>= 8 }
  }
  private def writeMsgField(out: java.io.ByteArrayOutputStream, no: Int, b: Array[Byte]): Unit = {
    writeKey(out, no, 2); writeVarint(out, b.length.toLong); out.write(b)
  }

  // the PUBLIC DataDog ddsketch.proto layout (sketches-go/ddsketch/pb),
  // declared for the wire walker so specs can decode what the
  // hand-rolled encoder below emits
  import ProtobufCodec._
  val ddSketchMappingSchema: ProtoSchema = ProtoSchema(Seq(
    ProtoField(1, "gamma", PDouble),
    ProtoField(2, "index_offset", PDouble),
    ProtoField(3, "interpolation", PVarint)))
  val ddSketchStoreSchema: ProtoSchema = ProtoSchema(Seq(
    ProtoField(1, "bin_counts", PRepeated(PMessage(ProtoSchema(Seq(
      ProtoField(1, "key", PSint), ProtoField(2, "value", PDouble)))))),
    ProtoField(2, "contiguous_bin_counts", PRepeated(PDouble)),
    ProtoField(3, "contiguous_bin_index_offset", PSint)))
  val ddSketchFullSchema: ProtoSchema = ProtoSchema(Seq(
    ProtoField(1, "mapping", PMessage(ddSketchMappingSchema)),
    ProtoField(2, "positive_values", PMessage(ddSketchStoreSchema)),
    ProtoField(3, "negative_values", PMessage(ddSketchStoreSchema)),
    ProtoField(4, "zero_count", PDouble)))

  /** `ddsketch_full` DdSketch proto (the PUBLIC DataDog ddsketch.proto:
    * mapping{gamma=1,indexOffset=2,interpolation=3}=1,
    * positiveValues{binCounts map<sint32,double>=1}=2,
    * negativeValues=3, zeroCount=4) from agent-sketch bins — the
    * encoding convert_stores + encode_sketch perform (bucket.rs:56-117):
    * gamma/index_offset from the agent config, Interpolation::NONE,
    * k=0 bins as the zero count, negative keys flipped positive into
    * the negative store.
    */
  def ddSketchFullBytes(zero: Long, bins: Seq[(Int, Long)]): Array[Byte] = {
    def store(entries: Seq[(Int, Long)]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      entries.foreach { case (k, n) =>
        val e = new java.io.ByteArrayOutputStream()
        writeKey(e, 1, 0)
        writeVarint(e, (k.toLong << 1) ^ (k.toLong >> 63)) // zigzag
        writeDoubleField(e, 2, n.toDouble)
        writeMsgField(out, 1, e.toByteArray)
      }
      out.toByteArray
    }
    val mapping = {
      val out = new java.io.ByteArrayOutputStream()
      writeDoubleField(out, 1, AgentSketch.GammaV)
      writeDoubleField(out, 2, AgentSketch.NormBias.toDouble)
      // interpolation NONE = 0 → proto3 default, omitted
      out.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    writeMsgField(out, 1, mapping)
    writeMsgField(out, 2, store(bins.filter(_._1 > 0)))
    writeMsgField(out, 3,
      store(bins.filter(_._1 < 0).map { case (k, n) => (-k, n) }))
    writeDoubleField(out, 4, zero.toDouble)
    out.toByteArray
  }

  import MsgPack._
  private def mpStr(kvs: (String, Value)*): Value =
    MpMap(kvs.toVector.map { case (k, v) => (MpString(k), v) })

  /** One exported grouped-stats row (ClientGroupedStats + its keys). */
  final case class ApmGroup(env: String, hostname: String,
      version: String, containerId: String, bucketStart: Long,
      service: String, name: String, resource: String, spanType: String,
      statusCode: Long, synthetics: Boolean,
      hits: Long, topLevelHits: Long, errors: Long, duration: Long,
      okZero: Long, okBins: Seq[(Int, Long)],
      errZero: Long, errBins: Seq[(Int, Long)])

  /** rmp_serde to_vec_named of StatsPayload (mod.rs:42-100): maps with
    * PascalCase keys in struct declaration order; one
    * ClientStatsPayload per payload key, one ClientStatsBucket per
    * 10 s window inside it (aggregation.rs export_buckets).
    */
  def statsPayloadBytes(cfg: Config, agentHostname: String,
                        groups: Seq[ApmGroup]): Array[Byte] = {
    val stats = groups
      .groupBy(g => (g.env, g.hostname, g.version, g.containerId))
      .toSeq.sortBy(_._1.toString)
      .map { case ((env, hostname, version, containerId), gs) =>
        val buckets = gs.groupBy(_.bucketStart).toSeq.sortBy(_._1)
          .map { case (start, bgs) =>
            mpStr(
              "Start" -> MpLong(start),
              "Duration" -> MpLong(BucketNs),
              "Stats" -> MpArray(bgs.toVector.map { g =>
                mpStr(
                  "Service" -> MpString(g.service),
                  "Name" -> MpString(g.name),
                  "Resource" -> MpString(g.resource),
                  "HTTPStatusCode" -> MpLong(g.statusCode),
                  "Type" -> MpString(g.spanType),
                  "DBType" -> MpString(""),
                  "Hits" -> MpLong(g.hits),
                  "Errors" -> MpLong(g.errors),
                  "Duration" -> MpLong(g.duration),
                  "OkSummary" -> MpBytes(
                    ddSketchFullBytes(g.okZero, g.okBins)),
                  "ErrorSummary" -> MpBytes(
                    ddSketchFullBytes(g.errZero, g.errBins)),
                  "Synthetics" -> MpBool(g.synthetics),
                  "TopLevelHits" -> MpLong(g.topLevelHits))
              }),
              "AgentTimeShift" -> MpLong(0L))
          }
        mpStr(
          "Hostname" -> MpString(hostname),
          "Env" -> MpString(env),
          "Version" -> MpString(version),
          "Stats" -> MpArray(buckets.toVector),
          "Lang" -> MpString(""),
          "TracerVersion" -> MpString(""),
          "RuntimeID" -> MpString(""),
          "Sequence" -> MpLong(0L),
          "AgentAggregation" -> MpString(""),
          "Service" -> MpString(""),
          "ContainerID" -> MpString(containerId),
          "Tags" -> MpArray(Vector.empty))
      }
    val payload = mpStr(
      "AgentHostname" -> MpString(agentHostname),
      "AgentEnv" -> MpString(cfg.env),
      "Stats" -> MpArray(stats.toVector),
      "AgentVersion" -> MpString(cfg.agentVersion),
      "ClientComputed" -> MpBool(false))
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    MsgPack.write(dos, payload)
    dos.flush()
    bos.toByteArray
  }

  // ---- write --------------------------------------------------------------

  def write(df: DataFrame, cfg: Config): Unit = {
    val traces = asTraces(df)
    val base = cfg.endpoint.stripSuffix("/")
    NetworkSinks.writeProtoConcat(
      traces.select(traceFragment(traces, cfg).as("__bytes")),
      HttpConfig(uri = base + "/api/v0.2/traces",
        maxEvents = cfg.maxEvents,
        contentType = "application/x-protobuf",
        headers = Map("DD-API-KEY" -> cfg.apiKey)))
    if (cfg.computeStats) {
      // bounded collect: one row per (bucket × agg key), the same
      // cardinality the reference caches in its in-memory Aggregator
      val rows = apmStats(traces, cfg).collect()
      if (rows.nonEmpty) {
        val groups = rows.toSeq.map { r =>
          val st = r.getAs[org.apache.spark.sql.Row]("stats")
          def bins(field: String): Seq[(Int, Long)] =
            st.getSeq[org.apache.spark.sql.Row](st.fieldIndex(field))
              .map(b => (b.getAs[Int]("k"), b.getAs[Long]("n"))).toSeq
          ApmGroup(r.getAs[String]("env"), r.getAs[String]("hostname"),
            r.getAs[String]("version"), r.getAs[String]("container_id"),
            r.getAs[Long]("bucket_start"),
            r.getAs[String]("service"), r.getAs[String]("name"),
            r.getAs[String]("resource"), r.getAs[String]("span_type"),
            r.getAs[Long]("status_code"), r.getAs[Boolean]("synthetics"),
            st.getAs[Long]("hits"), st.getAs[Long]("top_level_hits"),
            st.getAs[Long]("errors"), st.getAs[Long]("duration"),
            st.getAs[Long]("ok_zero"), bins("ok_bins"),
            st.getAs[Long]("err_zero"), bins("err_bins"))
        }
        val hostname = groups.headOption.map(_.hostname).getOrElse("")
        NetworkSinks.post(
          HttpConfig(uri = base + "/api/v0.2/stats",
            contentType = "application/msgpack",
            headers = Map("DD-API-KEY" -> cfg.apiKey)),
          statsPayloadBytes(cfg, hostname, groups))
      }
    }
  }
}
