package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `window` — condition-triggered lookback buffer.
  *
  * Reference: /root/reference/src/transforms/window/ (ring buffer of the
  * last `num_events_before` events, default 100; when `flush_when`
  * matches, flush buffer + event + next `num_events_after`;
  * `forward_when` bypasses; transform.rs:50-80).
  *
  * Batch analogue over a per-key ordered stream: keep a row iff any row
  * within `[-before, +after]` of it (in `orderCol` order, per key)
  * matches `flushWhen` — exactly the reference's "context around a
  * trigger" semantic, as a windowed max over a row frame (single shuffle
  * per key, no state).
  */
object WindowLookback {

  def apply(
      df: DataFrame,
      key: Column,
      orderCol: Column,
      flushWhen: Column,
      numEventsBefore: Int = 100,
      numEventsAfter: Int = 0,
      forwardWhen: Option[Column] = None): DataFrame = {
    // a row survives if a trigger occurs up to `before` rows AFTER it or
    // `after` rows BEFORE it (the trigger flushes its preceding buffer)
    val frame = Window.partitionBy(key).orderBy(orderCol)
      .rowsBetween(-numEventsAfter, numEventsBefore)
    val keep = max(flushWhen.cast("int")).over(frame) === 1
    val cond = forwardWhen.map(f => f || keep).getOrElse(keep)
    df.withColumn("__keep", cond).filter(col("__keep")).drop("__keep")
  }
}
