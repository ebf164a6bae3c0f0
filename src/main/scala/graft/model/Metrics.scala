package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
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
    // AggregatedHistogram/AggregatedSummary carry an explicit total
    // count and sum alongside their buckets/quantiles
    // (value.rs:45-66) — shared lanes here, non-null only for those
    // two value_types
    StructField("stat_count", LongType),
    StructField("stat_sum", DoubleType),
    StructField("sketch", BinaryType)))

  /** AggregatedHistogram from raw values: cumulative `count <= upper`
    * per configured bound (prometheus-style le-buckets), as ONE
    * aggregation — each bucket is a conditional count riding the same
    * shuffle (value.rs AggregatedHistogram{buckets, count, sum}).
    */
  def histogramBuckets(value: Column, bounds: Seq[Double]): Column =
    array(bounds.map(b =>
      struct(lit(b).as("upper_limit"),
        sum(when(value <= b, 1L).otherwise(0L)).as("count"))): _*)

  /** Merge already-aggregated histograms (same bounds): element-wise
    * bucket-count sum. Used when fan-in unions carry histogram metrics.
    */
  def mergeHistograms(buckets: Column): Column =
    aggregate(
      buckets,
      lit(null).cast(
        "array<struct<upper_limit: double, count: bigint>>"),
      (acc, h) => when(acc.isNull, h).otherwise(
        zip_with(acc, h, (a, b) => struct(
          a.getField("upper_limit").as("upper_limit"),
          (a.getField("count") + b.getField("count")).as("count")))))

  /** MetricValue::Set union across events (value.rs Set{values}). */
  def setUnion(values: Column): Column =
    array_sort(array_distinct(flatten(collect_list(values))))
}
