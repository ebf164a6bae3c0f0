package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Row}
import org.apache.spark.sql.functions._

/** Small transforms + topology helpers.
  *
  * - `trace_to_log` (reference src/transforms/trace_to_log.rs): re-tag
  *   trace events as logs — a column projection / union.
  * - fan-in (reference src/topology/builder.rs:498-630: a component may
  *   list many `inputs`): `unionByName(allowMissingColumns=true)`.
  * - `aws_ec2_metadata` (src/transforms/aws_ec2_metadata.rs): enrich every
  *   event with environment metadata fetched once on the driver —
  *   literal columns, zero per-row cost.
  * - `lua` (src/transforms/lua/): arbitrary stateless UDTF hook — a typed
  *   `flatMap` (Scala lambda instead of an embedded interpreter). Kept off
  *   the hot path: anything expressible as Columns should be a Remap.
  * - `delay` (src/transforms/delay.rs): test/chaos utility; in a
  *   micro-batch engine the trigger interval plays this role — no-op.
  */
object Misc {

  /** Fan-in: union many inputs with schema alignment. */
  def fanIn(inputs: Seq[DataFrame]): DataFrame =
    inputs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** trace_to_log: traces are log-shaped (lib/vector-core/src/event/trace.rs);
    * tag and pass through.
    */
  def traceToLog(traces: DataFrame): DataFrame =
    traces.withColumn("source_type", lit("trace"))

  /** aws_ec2_metadata-style environment enrichment: constants fetched
    * driver-side, attached as literal columns (broadcast by construction).
    */
  def environmentEnrich(df: DataFrame, metadata: Map[String, String]): DataFrame =
    metadata.foldLeft(df) { case (d, (k, v)) => d.withColumn(k, lit(v)) }

  /** lua-style escape hatch: per-event arbitrary logic, 1 -> 0..N. */
  def flatMapEvents[T, U: Encoder](ds: Dataset[T])(f: T => IterableOnce[U]): Dataset[U] =
    ds.flatMap(f)(implicitly[Encoder[U]])
}
