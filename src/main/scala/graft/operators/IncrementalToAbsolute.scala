package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `incremental_to_absolute` — running cumulative sum per metric series.
  *
  * Reference: /root/reference/src/transforms/incremental_to_absolute.rs:21-39
  * (per-series running total, 5-min TTL cache — a memory cap, not a
  * semantic).
  *
  * Batch form: prefix sum over (series, order) — one shuffle on the series
  * key, then a sort-based window per partition. Absolute metrics pass
  * through unchanged.
  */
object IncrementalToAbsolute {

  def apply(df: DataFrame, seriesKeys: Seq[String], value: Column,
            orderCol: Column, kind: Column = col("kind")): DataFrame = {
    val w = Window.partitionBy(seriesKeys.map(col): _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__abs", sum(when(kind === "incremental", value)).over(w))
      .withColumn("abs_value",
        when(kind === "incremental", col("__abs")).otherwise(value))
      .withColumn("kind", lit("absolute"))
      .drop("__abs")
  }

  /** The inverse normalizer (absolute -> incremental), used by sinks that
    * require delta metrics (reference src/sinks/util/buffer/metrics/
    * normalizer.rs). Delta = value - previous value per series; the first
    * point of a series has no delta (null), matching the reference's
    * "skip first absolute" behavior. Incremental inputs pass through.
    */
  def absoluteToIncremental(df: DataFrame, seriesKeys: Seq[String],
                            value: Column, orderCol: Column,
                            kind: Column = col("kind")): DataFrame = {
    val w = Window.partitionBy(seriesKeys.map(col): _*).orderBy(orderCol)
    df.withColumn("inc_value",
        when(kind === "absolute", value - lag(value, 1).over(w))
          .otherwise(value))
      .withColumn("kind", lit("incremental"))
  }
}
