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
    /** Row gate: the reference emits NO metric for an event missing the
      * configured `field` (log_to_metric.rs parse_log error path) — the
      * loader passes `field IS NOT NULL` (or false when the column
      * doesn't exist at all); direct API users default to all rows.
      */
    def gate: Column = lit(true)
  }
  /** Counter: +1 per event, or `increment_by_value` of a field. */
  final case class Counter(name: Column, tags: Seq[(String, Column)],
                           incrementBy: Option[Column] = None,
                           override val gate: Column = lit(true))
      extends MetricSpec
  final case class Gauge(name: Column, tags: Seq[(String, Column)],
                         value: Column,
                         override val gate: Column = lit(true))
      extends MetricSpec
  final case class SetMetric(name: Column, tags: Seq[(String, Column)],
                             value: Column,
                             override val gate: Column = lit(true))
      extends MetricSpec
  /** Histogram/Summary: one distribution sample (value, rate 1) per
    * event (log_to_metric.rs:418-472 — both configure a Distribution
    * metric; the statistic only picks the downstream aggregation).
    */
  final case class Histogram(name: Column, tags: Seq[(String, Column)],
                             value: Column,
                             override val gate: Column = lit(true))
      extends MetricSpec
  final case class Summary(name: Column, tags: Seq[(String, Column)],
                           value: Column,
                           override val gate: Column = lit(true))
      extends MetricSpec

  /** Emit one metric row per spec per input log. Output columns: name,
    * tags (map), ts, kind, value_type, counter_value/gauge_value/
    * set_values — the Metrics.schema core.
    *
    * Shape: ONE scan of the input — each row builds an array of
    * per-spec metric structs (a gated spec contributes null, filtered
    * before the explode) and `inline` flattens it, exactly the bench
    * metricsPipeline form. The previous one-projection-per-spec UNION
    * re-scanned the input once per spec, which at corpus scale made an
    * N-spec log_to_metric chain N full passes (guide §1.2/§2.4); same
    * rows out — per input row and spec whose gate passes, one metric
    * row with identical columns.
    */
  def apply(df: DataFrame, ts: Column, specs: Seq[MetricSpec],
            carry: Seq[String] = Nil): DataFrame = {
    require(specs.nonEmpty, "log_to_metric: at least one metric spec")
    val rows = specs.map { spec =>
      val nullDist = lit(null)
        .cast("array<struct<value:double,rate:bigint>>")
      def dist(v: Column) =
        array(struct(v.cast("double").as("value"), lit(1L).as("rate")))
      val (vtype, kind, counter, gauge, setv, distv) = spec match {
        case Counter(_, _, inc, _) =>
          ("counter", "incremental", inc.getOrElse(lit(1.0)).cast("double"),
            lit(null).cast("double"), lit(null).cast("array<string>"),
            nullDist)
        case Gauge(_, _, v, _) =>
          ("gauge", "absolute", lit(null).cast("double"), v.cast("double"),
            lit(null).cast("array<string>"), nullDist)
        case SetMetric(_, _, v, _) =>
          ("set", "incremental", lit(null).cast("double"),
            lit(null).cast("double"), array(v.cast("string")), nullDist)
        case Histogram(_, _, v, _) =>
          ("distribution", "incremental", lit(null).cast("double"),
            lit(null).cast("double"), lit(null).cast("array<string>"),
            dist(v))
        case Summary(_, _, v, _) =>
          ("distribution", "incremental", lit(null).cast("double"),
            lit(null).cast("double"), lit(null).cast("array<string>"),
            dist(v))
      }
      when(spec.gate, struct(
        spec.name.as("name"),
        map(spec.tags.flatMap { case (k, v) => Seq(lit(k), v.cast("string")) }: _*)
          .as("tags"),
        ts.as("ts"),
        lit(kind).as("kind"),
        lit(vtype).as("value_type"),
        counter.as("counter_value"),
        gauge.as("gauge_value"),
        setv.as("set_values"),
        distv.as("dist_samples")))
    }
    df.select(carry.map(col) :+
      inline(filter(array(rows: _*), m => m.isNotNull)): _*)
  }

  /** `all_metrics: true` mode (log_to_metric.rs `to_metrics`): each log
    * IS a metric description — `name` + `kind`
    * (absolute|incremental) + one of `counter.value` / `gauge.value` /
    * `set.values` / `distribution.samples`, with optional `tags` and
    * `namespace`. Events missing name/kind/value DROP (the reference's
    * per-event error path). The inverse of [[metricToLog]]'s shape.
    * Pure projection + filter — no shuffle.
    */
  def allMetrics(df: DataFrame, ts: Column): DataFrame = {
    def has(c: String) = df.columns.contains(c)
    val nullDist = lit(null).cast("array<struct<value:double,rate:bigint>>")
    val name = if (has("name")) col("name").cast("string")
               else lit(null).cast("string")
    val kind = if (has("kind")) col("kind").cast("string")
               else lit(null).cast("string")
    val counter = if (has("counter")) col("counter").getField("value")
      .cast("double") else lit(null).cast("double")
    val gauge = if (has("gauge")) col("gauge").getField("value")
      .cast("double") else lit(null).cast("double")
    val setv = if (has("set")) col("set").getField("values")
      .cast("array<string>") else lit(null).cast("array<string>")
    val distv = if (has("distribution"))
      col("distribution").getField("samples")
        .cast("array<struct<value:double,rate:bigint>>")
    else nullDist
    val vtype = when(gauge.isNotNull, "gauge")
      .when(distv.isNotNull, "distribution")
      .when(counter.isNotNull, "counter")
      .when(setv.isNotNull, "set")
    val tags =
      if (!has("tags")) map()
      else df.schema("tags").dataType match {
        case st: org.apache.spark.sql.types.StructType =>
          // object-literal tags arrive as a struct — flatten to the
          // metric row's map<string,string>
          map(st.fields.toSeq.flatMap(f => Seq(lit(f.name),
            col("tags").getField(f.name).cast("string"))): _*)
        case _ => col("tags").cast("map<string,string>")
      }
    val nsCols =
      if (has("namespace"))
        Seq(col("namespace").cast("string").as("namespace"))
      else Nil
    df.filter(name.isNotNull &&
        kind.isin("absolute", "incremental") && vtype.isNotNull)
      .select(Seq(
        name.as("name"),
        tags.as("tags"),
        ts.as("ts"),
        kind.as("kind"),
        vtype.as("value_type"),
        when(vtype === "counter", counter).as("counter_value"),
        when(vtype === "gauge", gauge).as("gauge_value"),
        when(vtype === "set", setv).as("set_values"),
        when(vtype === "distribution", distv).as("dist_samples")) ++
        nsCols: _*)
  }

  /** `metric_to_log`: flatten a metric row into a log line + fields. */
  def metricToLog(metrics: DataFrame): DataFrame = {
    val rendered = Seq(
      col("counter_value").cast("string"),
      col("gauge_value").cast("string"),
      array_join(col("set_values"), ",")) ++
      (if (metrics.columns.contains("dist_samples"))
        Seq(array_join(transform(col("dist_samples"),
          s => s.getField("value").cast("string")), ","))
      else Nil)
    metrics.withColumn(
      "message",
      format_string("%s %s %s=%s",
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"),
        col("kind"), col("name"),
        coalesce(rendered: _*)))
  }
}
