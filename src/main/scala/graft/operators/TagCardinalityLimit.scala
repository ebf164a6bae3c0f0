package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `tag_cardinality_limit` — cap distinct values per tag key.
  *
  * Reference: /root/reference/src/transforms/tag_cardinality_limit/
  * (per tag key at most `value_limit` distinct values; `exact` HashSet or
  * `probabilistic` Bloom mode, config.rs:107-127; actions `drop_tag` /
  * `drop_event`).
  *
  * Batch form ("first N distinct values win", deterministic by first-seen
  * order): rank tag values by first appearance and drop/null beyond the
  * limit. Two shuffles: one narrow agg over (tag value) to find first-seen
  * — tiny output, broadcast back — then a broadcast-join filter on the
  * events, so the big side is never reshuffled. The streaming/probabilistic
  * variant (Bloom state) lives in graft.streaming.
  */
object TagCardinalityLimit {

  sealed trait Action
  case object DropEvent extends Action
  case object DropTag extends Action

  def apply(df: DataFrame, tag: String, valueLimit: Int,
            orderCol: Column, action: Action = DropEvent): DataFrame = {
    // first-seen rank per distinct tag value: agg output is <= #distinct
    // values — small; broadcast it so the event stream keeps its layout.
    // Events lacking the tag (NULL) pass through unaffected (the reference
    // only limits values that exist) and don't consume a rank slot.
    // global "first `valueLimit` by first-seen order" via orderBy+limit —
    // Spark plans this as TakeOrderedAndProject (a distributed top-K with
    // per-partition heaps), NOT a single-partition global window.
    val firstSeen = df.filter(col(tag).isNotNull)
      .groupBy(col(tag).as("__tv"))
      .agg(min(orderCol).as("__first_seen"))
      .orderBy(col("__first_seen"), col("__tv"))
      .limit(valueLimit)
      .select(col("__tv"))
    val joined = df.join(
      broadcast(firstSeen), df(tag) === firstSeen("__tv"), "left")
    action match {
      case DropEvent =>
        joined.filter(df(tag).isNull || col("__tv").isNotNull).drop("__tv")
      case DropTag =>
        joined.withColumn(tag, when(col("__tv").isNotNull, col(tag)))
          .drop("__tv")
    }
  }
}
