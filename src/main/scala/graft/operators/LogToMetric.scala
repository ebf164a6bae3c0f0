package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `log_to_metric` and `metric_to_log` — bridges between event types.
  *
  * Reference: /root/reference/src/transforms/log_to_metric.rs (emit
  * Counter / Gauge / Set / Histogram / Summary per configured field with
  * templated name/tags, :143-157, :418-472; 1 log -> N metrics) and
  * src/transforms/metric_to_log.rs (serialize a Metric into a structured
  * LogEvent).
  *
  * 1 log -> N metrics is a projection per metric spec + union (no
  * shuffle); the actual math happens downstream in `aggregate`.
  */
object LogToMetric {

  sealed trait MetricSpec {
    def name: Column
    def tags: Seq[(String, Column)]
  }
  /** Counter: +1 per event, or `increment_by_value` of a field. */
  final case class Counter(name: Column, tags: Seq[(String, Column)],
                           incrementBy: Option[Column] = None) extends MetricSpec
  final case class Gauge(name: Column, tags: Seq[(String, Column)],
                         value: Column) extends MetricSpec
  final case class SetMetric(name: Column, tags: Seq[(String, Column)],
                             value: Column) extends MetricSpec

  /** Emit one metric row per spec per input log. Output columns: name,
    * tags (map), ts, kind, value_type, counter_value/gauge_value/
    * set_values — the Metrics.schema core.
    */
  def apply(df: DataFrame, ts: Column, specs: Seq[MetricSpec],
            carry: Seq[String] = Nil): DataFrame =
    specs.map { spec =>
      val (vtype, kind, counter, gauge, setv) = spec match {
        case Counter(_, _, inc) =>
          ("counter", "incremental", inc.getOrElse(lit(1.0)).cast("double"),
            lit(null).cast("double"), lit(null).cast("array<string>"))
        case Gauge(_, _, v) =>
          ("gauge", "absolute", lit(null).cast("double"), v.cast("double"),
            lit(null).cast("array<string>"))
        case SetMetric(_, _, v) =>
          ("set", "incremental", lit(null).cast("double"),
            lit(null).cast("double"), array(v.cast("string")))
      }
      df.select(carry.map(col) :+
        spec.name.as("name") :+
        map(spec.tags.flatMap { case (k, v) => Seq(lit(k), v.cast("string")) }: _*)
          .as("tags") :+
        ts.as("ts") :+
        lit(kind).as("kind") :+
        lit(vtype).as("value_type") :+
        counter.as("counter_value") :+
        gauge.as("gauge_value") :+
        setv.as("set_values"): _*)
    }.reduce(_.unionByName(_))

  /** `metric_to_log`: flatten a metric row into a log line + fields. */
  def metricToLog(metrics: DataFrame): DataFrame =
    metrics.withColumn(
      "message",
      format_string("%s %s %s=%s",
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"),
        col("kind"), col("name"),
        coalesce(
          col("counter_value").cast("string"),
          col("gauge_value").cast("string"),
          array_join(col("set_values"), ","))))
}
