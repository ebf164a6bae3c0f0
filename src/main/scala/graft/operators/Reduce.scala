package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `reduce` — group-by + aggregation / session collapse of logs.
  *
  * Reference: /root/reference/src/transforms/reduce/ — 12 merge strategies
  * (merge_strategy.rs:18-56), type-based defaults (config.rs:82-90:
  * strings keep first, timestamps keep first + `_end` last, numbers sum),
  * state expiry on processing time (transform.rs:33-35).
  *
  * Batch form: one shuffle (`groupBy(keys)`) with every merge strategy as
  * a native aggregate — partial/map-side aggregation and codegen come from
  * Catalyst. Order-sensitive strategies (first/last/array/concat) are made
  * deterministic by `orderCol` (the reference relies on single-stream
  * arrival order, which does not exist on a cluster): values are collected
  * as (order, value) structs, sorted, then projected — an O(n log n)
  * per-group cost only for the strategies that need order.
  *
  * Session semantics (`expire_after_ms`, `max_events`,
  * `starts_when`/`ends_when`) live in graft.streaming.ReduceSessions.
  */
object Reduce {

  sealed trait MergeStrategy
  /** Keep first value (reference: Discard). */
  case object First extends MergeStrategy
  /** Keep last value (reference: Retain). */
  case object Last extends MergeStrategy
  case object Sum extends MergeStrategy
  case object Max extends MergeStrategy
  case object Min extends MergeStrategy
  /** Append each value into an array (reference: Array). */
  case object ToArray extends MergeStrategy
  /** Concatenate with a separator (Concat=" ", ConcatNewline="\n", ConcatRaw=""). */
  final case class Concat(sep: String = " ") extends MergeStrategy
  case object ShortestArray extends MergeStrategy
  case object LongestArray extends MergeStrategy
  /** Flatten arrays/values into one deduplicated array (FlatUnique). */
  case object FlatUnique extends MergeStrategy

  /** Aggregate `df` by `groupBy` with per-field strategies; fields not
    * listed get the reference's type-based defaults. Output column name =
    * field name (plus `<ts-field>_end` for timestamps, matching the
    * reference's `_end` convention).
    */
  def apply(
      df: DataFrame,
      groupBy: Seq[String],
      strategies: Map[String, MergeStrategy],
      orderCol: Column,
      exclude: Seq[String] = Nil,
      countField: String = "n_events"): DataFrame = {

    val valueFields = df.schema.fields
      .filterNot(f => groupBy.contains(f.name) || exclude.contains(f.name))
    val aggs: Seq[Column] = valueFields.flatMap { f =>
      val c = col(f.name)
      strategies.get(f.name) match {
        // Concat on an array-typed field appends the arrays (reference
        // merge_strategy.rs Concat on Value::Array), not a string join
        case Some(Concat(_)) if f.dataType.isInstanceOf[ArrayType] =>
          Seq(flatten(orderedList(c, orderCol)).as(f.name))
        case Some(st) => Seq(agg(st, c, orderCol).as(f.name))
        case None => // type-based defaults, config.rs:82-90
          f.dataType match {
            case _: NumericType => Seq(sum(c).as(f.name))
            case TimestampType | TimestampNTZType | DateType =>
              Seq(min(c).as(f.name), max(c).as(f.name + "_end"))
            case _ => Seq(agg(First, c, orderCol).as(f.name))
          }
      }
    }.toSeq :+ count(lit(1)).as(countField)

    df.groupBy(groupBy.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** One merge strategy as a deterministic native aggregate expression.
    * Null values are skipped everywhere: the reference merges only
    * events that HAVE the field (merge_strategy.rs operates on present
    * values), and a missing field is null in the relational model —
    * min_by/max_by skip null ordering keys, orderedList filters nulls
    * out of the collected pairs.
    */
  def agg(st: MergeStrategy, c: Column, orderCol: Column): Column = st match {
    case First => min_by(c, when(c.isNotNull, orderCol))
    case Last  => max_by(c, when(c.isNotNull, orderCol))
    case Sum   => sum(c)
    case Max   => max(c)
    case Min   => min(c)
    case ToArray      => orderedList(c, orderCol)
    case Concat(sep)  => concat_ws(sep, orderedList(c, orderCol))
    case ShortestArray => min_by(c, struct(size(c), orderCol))
    case LongestArray  => max_by(c, struct(size(c), negate(orderCol)))
    case FlatUnique    => array_distinct(flatten(orderedList(c, orderCol)))
  }

  /** collect_list is order-nondeterministic on a cluster; collect
    * (order, value) pairs and sort — deterministic everywhere.
    */
  private def orderedList(c: Column, orderCol: Column): Column =
    transform(
      // explicit comparator on the order key only: the default struct
      // comparison would demand ordering on the VALUE type too, which
      // dynamic (variant) values don't have
      array_sort(
        collect_list(
          when(c.isNotNull, struct(orderCol.as("o"), c.as("v")))),
        (l, r) => when(l.getField("o") < r.getField("o"), -1)
          .when(l.getField("o") > r.getField("o"), 1).otherwise(0)),
      x => x.getField("v"))
}
