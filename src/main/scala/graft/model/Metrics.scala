package graft.model

import org.apache.spark.sql.types._

/** Metric event model.
  *
  * Reference: /root/reference/lib/vector-core/src/event/metric/mod.rs:56-66
  * (series + data + metadata), data.rs:12-40 (MetricTime, MetricKind),
  * value.rs:20-87 (7-way MetricValue union).
  *
  * Columnar encoding: the 7-way union becomes a sparse struct — exactly
  * one family of fields non-null per row, discriminated by `value_type`.
  * `kind` is "incremental" | "absolute" (mod.rs:533-539).
  */
object Metrics {

  val ValueTypes: Seq[String] =
    Seq("counter", "gauge", "set", "distribution", "histogram", "summary", "sketch")

  val schema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("namespace", StringType),
    StructField("tags", MapType(StringType, StringType)),
    StructField("ts", TimestampType),
    StructField("interval_ms", LongType),
    StructField("kind", StringType, nullable = false),
    StructField("value_type", StringType, nullable = false),
    StructField("counter_value", DoubleType),
    StructField("gauge_value", DoubleType),
    StructField("set_values", ArrayType(StringType)),
    StructField("dist_samples", ArrayType(StructType(Seq(
      StructField("value", DoubleType), StructField("rate", LongType))))),
    StructField("histo_buckets", ArrayType(StructType(Seq(
      StructField("upper_limit", DoubleType), StructField("count", LongType))))),
    StructField("summary_quantiles", ArrayType(StructType(Seq(
      StructField("quantile", DoubleType), StructField("value", DoubleType))))),
    StructField("sketch", BinaryType)))
}
