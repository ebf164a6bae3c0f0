package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `aggregate` — windowed aggregation of metrics.
  *
  * Reference: /root/reference/src/transforms/aggregate.rs — tumbling flush
  * every `interval_ms` per MetricSeries; modes `Auto` (sum incremental,
  * latest absolute), `Sum, Latest, Count, Diff, Max, Min, Mean, Stdev`
  * (:47-76, stateful inner modes :79-115).
  *
  * Batch/event-time form: `window(ts, interval)` + series keys → one
  * shuffle, all modes as native aggregates (map-side partial agg free).
  * The reference only has processing-time tumbling windows; event-time is
  * the extension Spark gives us (streaming variant adds a watermark).
  */
object Aggregate {

  sealed trait Mode
  case object Auto extends Mode
  case object SumMode extends Mode
  case object Latest extends Mode
  case object CountMode extends Mode
  /** last - first in window order (aggregate.rs Diff). */
  case object Diff extends Mode
  case object MaxMode extends Mode
  case object MinMode extends Mode
  case object Mean extends Mode
  case object Stdev extends Mode

  def modeAgg(mode: Mode, value: Column, orderCol: Column, kind: Column): Column =
    mode match {
      case Auto =>
        // sum incremental metrics, keep latest for absolute (aggregate.rs:47-58)
        when(max(kind) === "absolute", max_by(value, orderCol))
          .otherwise(sum(value))
      case SumMode   => sum(value)
      case Latest    => max_by(value, orderCol)
      case CountMode => count(value)
      case Diff      => max_by(value, orderCol) - min_by(value, orderCol)
      case MaxMode   => max(value)
      case MinMode   => min(value)
      case Mean      => avg(value)
      case Stdev     => stddev_samp(value)
    }

  /** Tumbling-window aggregate: one output row per (window, series). */
  def apply(
      df: DataFrame,
      ts: Column,
      interval: String,
      seriesKeys: Seq[String],
      value: Column,
      orderCol: Column,
      kind: Column,
      modes: Seq[(String, Mode)],
      extraAggs: Seq[Column] = Nil): DataFrame = {
    val aggs = modes.map { case (name, m) =>
      modeAgg(m, value, orderCol, kind).as(name)
    } ++ extraAggs
    df.groupBy(window(ts, interval) +: seriesKeys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .drop("window")
  }
}
