package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `throttle` — at most `threshold` events per key per window.
  *
  * Reference: /root/reference/src/transforms/throttle/ (GCRA rate limiter
  * per templated `key_field`, rate_limiter.rs:26-29; excess events are
  * dropped, never delayed; `exclude` condition bypasses).
  *
  * Batch form: rank events within (key, tumbling-window) and keep the
  * first `threshold` — the deterministic, order-defined analogue of the
  * token bucket. One shuffle on (key, window); the rank is computed
  * per-partition post-shuffle. Streaming GCRA state lives in
  * graft.streaming.
  */
object Throttle {

  def apply(
      df: DataFrame,
      key: Column,
      ts: Column,
      windowDuration: String,
      threshold: Int,
      orderCol: Column,
      exclude: Option[Column] = None): DataFrame = {
    val w = Window.partitionBy(key, window(ts, windowDuration)).orderBy(orderCol)
    exclude match {
      case None =>
        df.withColumn("__rank", row_number().over(w))
          .filter(col("__rank") <= threshold).drop("__rank")
      case Some(ex) =>
        // Excluded events bypass the limiter entirely and never consume
        // quota (reference: throttle/transform.rs:105-113) — rank counts
        // only non-excluded rows.
        val exc = coalesce(ex, lit(false))
        val ranked = df.withColumn("__rank",
          sum(when(exc, 0).otherwise(1))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        ranked.filter(exc || col("__rank") <= threshold).drop("__rank")
    }
  }
}
