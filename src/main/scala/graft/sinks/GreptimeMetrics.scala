package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.codecs.ProtobufCodec
import graft.codecs.ProtobufCodec._
import graft.functions.Template

/** `greptimedb_metrics` sink (reference src/sinks/greptimedb/metrics/):
  * each metric becomes one RowInsertRequest whose table is
  * `<namespace>_<name>` (request_builder.rs:38-46), with a
  * millisecond-timestamp time-index column, one STRING tag column per
  * metric tag, and FLOAT64 field columns per metric kind — counter/
  * gauge/set → the value column (`greptime_value`, or legacy `val`
  * when `new_naming: false`), histogram → one `b<upper_limit>` column
  * per bucket then trailing count+sum columns, summary → one
  * `p<q*100>` column per quantile then count+sum
  * (request_builder.rs:119-129; count/sum come from the model's
  * stat_count/stat_sum lanes, histogram count falling back to the
  * bucket total, a missing sum encoding a null Value). Batches ride ONE
  * `greptime.v1.GreptimeDatabase/Handle` gRPC call as a
  * GreptimeRequest{header, row_inserts} (service.rs).
  *
  * Wire schemas are hand-declared from the PUBLIC greptime-proto v1
  * (github.com/GreptimeTeam/greptime-proto: greptime/v1/database.proto,
  * row.proto, common.proto) over the in-repo proto encoder. Each
  * metric encodes as a single-insert GreptimeRequest FRAGMENT;
  * proto3 merge semantics (singular message fields merge, repeated
  * fields concatenate) make the byte-concatenation of fragments one
  * valid batched request — the same trick OtlpSink uses.
  */
object GreptimeMetrics {

  case class Config(
      endpoint: String,
      dbname: String = "public",
      newNaming: Boolean = true,
      maxEvents: Int = 1000)
      extends Serializable

  // greptime/v1/common.proto Value (oneof value_data — only the lanes
  // this encoder emits), SemanticType { TAG=0 FIELD=1 TIMESTAMP=2 },
  // ColumnDataType { FLOAT64=10 STRING=12 TIMESTAMP_MILLISECOND=16 }
  val valueSchema: ProtoSchema = ProtoSchema(Seq(
    ProtoField(10, "f64_value", PDouble),
    ProtoField(13, "string_value", PString),
    ProtoField(17, "timestamp_millisecond_value", PVarint)))
  val columnSchemaSchema: ProtoSchema = ProtoSchema(Seq(
    ProtoField(1, "column_name", PString),
    ProtoField(2, "datatype", PVarint),
    ProtoField(3, "semantic_type", PVarint)))
  val rowValuesSchema: ProtoSchema = ProtoSchema(Seq(
    ProtoField(1, "values", PRepeated(PMessage(valueSchema)))))
  val rowsSchema: ProtoSchema = ProtoSchema(Seq(
    ProtoField(1, "schema", PRepeated(PMessage(columnSchemaSchema))),
    ProtoField(2, "rows", PRepeated(PMessage(rowValuesSchema)))))
  val rowInsertRequestSchema: ProtoSchema = ProtoSchema(Seq(
    ProtoField(1, "table_name", PString),
    ProtoField(2, "rows", PMessage(rowsSchema))))
  val rowInsertRequestsSchema: ProtoSchema = ProtoSchema(Seq(
    ProtoField(1, "inserts", PRepeated(PMessage(rowInsertRequestSchema)))))
  val requestHeaderSchema: ProtoSchema = ProtoSchema(Seq(
    ProtoField(1, "catalog", PString),
    ProtoField(2, "schema", PString),
    ProtoField(4, "dbname", PString)))
  val greptimeRequestSchema: ProtoSchema = ProtoSchema(Seq(
    ProtoField(1, "header", PMessage(requestHeaderSchema)),
    ProtoField(6, "row_inserts", PMessage(rowInsertRequestsSchema))))

  private val F64 = 10L
  private val STR = 12L
  private val TSMS = 16L
  private val TAG = 0L
  private val FIELD = 1L
  private val TSSEM = 2L

  /** Rust `format!("{v}")` for f64: shortest-roundtrip decimal, never
    * scientific notation ("0.0001" not "1.0E-4"), integral values
    * without the trailing `.0` ("b10", "p50"), infinities as
    * "inf"/"-inf" (the prometheus +Inf bucket → "binf").
    */
  private[sinks] def rustF64(v: Double): String =
    if (v.isNaN) "NaN"
    else if (v == Double.PositiveInfinity) "inf"
    else if (v == Double.NegativeInfinity) "-inf"
    else {
      val s = new java.math.BigDecimal(java.lang.Double.toString(v))
        .stripTrailingZeros().toPlainString
      if (s == "-0") "0" else s
    }

  // UDFs are not allowed inside higher-order-function lambdas, so the
  // per-bucket/per-quantile column NAMES are rendered as one
  // array<string> per row up front and zipped with the value lanes
  private val histoNamesUdf = udf((bs: Seq[org.apache.spark.sql.Row]) =>
    if (bs == null) null
    else bs.map(b => "b" + rustF64(b.getDouble(0))))
  private val quantNamesUdf = udf((qs: Seq[org.apache.spark.sql.Row]) =>
    if (qs == null) null
    else qs.map { q => // format!("p{:02}", quantile * 100f64)
      val s = rustF64(q.getDouble(0) * 100.0)
      "p" + (if (s.length < 2) "0" * (2 - s.length) + s else s)
    })

  private def colSchema(name: Column, dt: Long, sem: Long): Column =
    struct(name.as("column_name"), lit(dt).as("datatype"),
      lit(sem).as("semantic_type"))

  private def f64Value(v: Column): Column = struct(
    v.cast("double").as("f64_value"),
    lit(null).cast("string").as("string_value"),
    lit(null).cast("long").as("timestamp_millisecond_value"))
  private def strValue(v: Column): Column = struct(
    lit(null).cast("double").as("f64_value"),
    v.cast("string").as("string_value"),
    lit(null).cast("long").as("timestamp_millisecond_value"))
  private def tsValue(v: Column): Column = struct(
    lit(null).cast("double").as("f64_value"),
    lit(null).cast("string").as("string_value"),
    v.cast("long").as("timestamp_millisecond_value"))

  private def emptyCols = array().cast(
    "array<struct<column_name:string,datatype:bigint,semantic_type:bigint>>")
  private def emptyVals = array().cast(
    "array<struct<f64_value:double,string_value:string," +
      "timestamp_millisecond_value:bigint>>")

  /** Per-metric GreptimeRequest fragment bytes. */
  def fragment(df: DataFrame, cfg: Config): Column = {
    val cols = df.schema.fieldNames.toSet
    def optCol(n: String): Column =
      if (cols(n)) col(n) else lit(null).cast("string")
    val tsName = if (cfg.newNaming) "greptime_timestamp" else "ts"
    val valName = if (cfg.newNaming) "greptime_value" else "val"
    val table = when(optCol("namespace").isNotNull,
      concat(optCol("namespace"), lit("_"), col("name")))
      .otherwise(col("name"))
    val tags =
      if (cols("tags")) coalesce(col("tags"),
        map().cast("map<string,string>"))
      else map().cast("map<string,string>")
    val tagEntries = array_sort(map_entries(tags))
    val vt = if (cols("value_type")) col("value_type") else lit("gauge")

    // field columns by metric kind (request_builder.rs:72-137)
    val scalarValue = coalesce(
      Seq("counter_value", "gauge_value").filter(cols).map(col(_)) :+
        lit(null).cast("double"): _*)
    val setCount =
      if (cols("set_values")) size(col("set_values")).cast("double")
      else lit(null).cast("double")
    val histo =
      if (cols("histo_buckets")) col("histo_buckets")
      else lit(null).cast(
        "array<struct<upper_limit:double,count:bigint>>")
    val quants =
      if (cols("summary_quantiles")) col("summary_quantiles")
      else lit(null).cast("array<struct<quantile:double,value:double>>")

    // distribution → DistributionStatistic (sinks/util/statistic.rs):
    // sort samples by value, cumulative rates, quantile = the first
    // bin whose cumulative rate >= round(p × count) (R-3)
    val rawSamples =
      if (cols("dist_samples")) col("dist_samples")
      else lit(null).cast("array<struct<value:double,rate:bigint>>")
    val bins = array_sort(filter(rawSamples,
      s => s.getField("rate") > 0L))
    val distCnt = aggregate(bins, lit(0L),
      (a, s) => a + s.getField("rate"))
    val distSum = aggregate(bins, lit(0.0),
      (a, s) => a + s.getField("value") * s.getField("rate"))
    def distQuantile(p: Double): Column = {
      val rank = round(lit(p) * distCnt)
      aggregate(bins,
        struct(lit(0L).as("cum"), lit(null).cast("double").as("v")),
        (acc, s) => struct(
          (acc.getField("cum") + s.getField("rate")).as("cum"),
          coalesce(acc.getField("v"),
            when(acc.getField("cum") + s.getField("rate") >= rank,
              s.getField("value"))).as("v")),
        acc => coalesce(acc.getField("v"),
          element_at(bins, -1).getField("value")))
    }
    val distQs = Seq(0.5, 0.75, 0.90, 0.95, 0.99)
    val distSchemas = concat(
      array(Seq("min", "max", "avg", "sum", "count").map(n =>
        colSchema(lit(n), F64, FIELD)): _*),
      array(distQs.map(p =>
        colSchema(lit("p" + (p * 100).toInt), F64, FIELD)): _*))
    val distValues = concat(
      array(
        f64Value(element_at(bins, 1).getField("value")),
        f64Value(element_at(bins, -1).getField("value")),
        f64Value(distSum / distCnt),
        f64Value(distSum),
        f64Value(distCnt.cast("double"))),
      array(distQs.map(p => f64Value(distQuantile(p))): _*))

    // sketch → encode_sketch (request_builder.rs:188-215): count/min/
    // max/sum/avg plus the agent sketch's interpolated quantiles from
    // the raw (k, n) lanes (model.AgentSketch = the public
    // vector-core/src/metrics/ddsketch.rs math). The dd intake carries
    // the sketch as a struct{cnt,min,max,sum,avg,k,n} column.
    val sketchStruct = df.schema.fields.find(_.name == "sketch")
      .filter(_.dataType.isInstanceOf[
        org.apache.spark.sql.types.StructType])
      .map(_ => col("sketch"))
    val sketchQ = udf((ks: Seq[Long], ns: Seq[Long], cnt: java.lang.Long,
                       mn: java.lang.Double, mx: java.lang.Double,
                       q: Double) =>
      if (cnt == null || mn == null || mx == null) null
      else graft.model.AgentSketch
        .quantile(Option(ks).getOrElse(Nil), Option(ns).getOrElse(Nil),
          cnt, mn, mx, q)
        .map(java.lang.Double.valueOf).orNull)
    def sketchArrays(sk: org.apache.spark.sql.Column)
        : (Column, Column) = {
      val qs = Seq(0.5, 0.75, 0.90, 0.95, 0.99)
      val statNames = Seq("count", "min", "max", "sum", "avg")
      val schemas = concat(
        array(statNames.map(n => colSchema(lit(n), F64, FIELD)): _*),
        array(qs.map(p =>
          colSchema(lit("p" + (p * 100).toInt), F64, FIELD)): _*))
      val values = concat(
        array(
          f64Value(sk.getField("cnt").cast("double")),
          f64Value(sk.getField("min")), f64Value(sk.getField("max")),
          f64Value(sk.getField("sum")), f64Value(sk.getField("avg"))),
        array(qs.map(p => f64Value(sketchQ(sk.getField("k"),
          sk.getField("n"), sk.getField("cnt"), sk.getField("min"),
          sk.getField("max"), lit(p)))): _*))
      (schemas, values)
    }

    // histogram/summary always append trailing count and sum field
    // columns after the per-bucket/per-quantile ones
    // (request_builder.rs:119-129); count falls back to the bucket-
    // count total when the row lacks the explicit stat_count lane
    val statCount =
      if (cols("stat_count")) col("stat_count").cast("double")
      else lit(null).cast("double")
    val statSum =
      if (cols("stat_sum")) col("stat_sum").cast("double")
      else lit(null).cast("double")
    val histCount = coalesce(statCount,
      aggregate(histo, lit(0L), (a, b) => a + b.getField("count"))
        .cast("double"))
    val countSumSchemas = array(colSchema(lit("count"), F64, FIELD),
      colSchema(lit("sum"), F64, FIELD))

    val fieldSchemas = when(vt.isin("counter", "gauge"),
        array(colSchema(lit(valName), F64, FIELD)))
      .when(vt === "set", array(colSchema(lit(valName), F64, FIELD)))
      .when(vt === "histogram", concat(
        transform(histoNamesUdf(histo), n => colSchema(n, F64, FIELD)),
        countSumSchemas))
      .when(vt === "summary", concat(
        transform(quantNamesUdf(quants), n => colSchema(n, F64, FIELD)),
        countSumSchemas))
      // empty distributions (all rates 0) encode no field columns,
      // like from_samples -> None (statistic.rs)
      .when(vt === "distribution" && distCnt > 0, distSchemas)
      .when(lit(sketchStruct.isDefined) && vt === "sketch",
        sketchStruct.map(sketchArrays(_)._1).getOrElse(emptyCols))
      .otherwise(emptyCols)
    val fieldValues = when(vt.isin("counter", "gauge"),
        array(f64Value(scalarValue)))
      .when(vt === "set", array(f64Value(setCount)))
      .when(vt === "histogram", concat(
        transform(histo, b => f64Value(b.getField("count").cast("double"))),
        array(f64Value(histCount), f64Value(statSum))))
      .when(vt === "summary", concat(
        transform(quants, q => f64Value(q.getField("value"))),
        array(f64Value(statCount), f64Value(statSum))))
      .when(vt === "distribution" && distCnt > 0, distValues)
      .when(lit(sketchStruct.isDefined) && vt === "sketch",
        sketchStruct.map(sketchArrays(_)._2).getOrElse(emptyVals))
      .otherwise(emptyVals)

    val ts = Template.timestampCol(df.schema)
    val schemaArr = concat(
      array(colSchema(lit(tsName), TSMS, TSSEM)),
      transform(tagEntries, e =>
        colSchema(e.getField("key"), STR, TAG)),
      fieldSchemas)
    val valuesArr = concat(
      array(tsValue(unix_millis(ts))),
      transform(tagEntries, e => strValue(e.getField("value"))),
      fieldValues)

    val request = struct(
      struct(lit("greptime").as("catalog"),
        lit(cfg.dbname).as("schema"),
        lit(cfg.dbname).as("dbname")).as("header"),
      struct(array(struct(
        table.cast("string").as("table_name"),
        struct(schemaArr.as("schema"),
          array(struct(valuesArr.as("values"))).as("rows")).as("rows")))
        .as("inserts")).as("row_inserts"))
    val kinds = Seq("counter", "gauge", "set", "histogram", "summary",
      "distribution") ++ (if (sketchStruct.isDefined) Seq("sketch")
    else Nil)
    when(vt.isin(kinds: _*),
      ProtobufCodec.encode(greptimeRequestSchema, request))
  }

  /** Ship: concatenated fragments form one GreptimeRequest per batch,
    * sent as a unary `greptime.v1.GreptimeDatabase/Handle` call.
    */
  def write(df: DataFrame, cfg: Config): Unit = {
    val uri = new java.net.URI(
      if (cfg.endpoint.contains("://")) cfg.endpoint
      else s"grpc://${cfg.endpoint}")
    val (host, port) = (uri.getHost, uri.getPort)
    val max = cfg.maxEvents
    df.select(fragment(df, cfg).as("__bytes"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.grouped(max).foreach { batch =>
          val raw = new java.io.ByteArrayOutputStream()
          batch.foreach { r =>
            val b = r.getAs[Array[Byte]](0)
            if (b != null) raw.write(b)
          }
          if (raw.size() > 0)
            graft.streaming.Grpc.call(host, port,
              "/greptime.v1.GreptimeDatabase/Handle", raw.toByteArray)
        }
      }
  }
}
