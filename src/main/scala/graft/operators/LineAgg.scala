package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `line_agg` — multiline aggregation: combine physical lines into
  * logical events (stack traces, wrapped lines).
  *
  * Reference: /root/reference/src/line_agg.rs:24-47 — modes
  * `ContinueThrough` (matching lines attach to the previous event, e.g.
  * indented stack-trace frames), `ContinueWith` (a matching line says
  * "the NEXT line continues me", e.g. trailing backslash), `HaltBefore`
  * (a matching line starts a new event), `HaltWith` (a matching line is
  * the last of its event). The timeout flush is a streaming concern
  * (micro-batch boundary here).
  *
  * Batch form: each mode reduces to a per-line "starts a new group" flag
  * (for the *With modes, a function of the PREVIOUS line via lag), then
  * group id = running sum of starts within (file, order) — one shuffle
  * on the file key, then a sorted window; the concat is an ordered
  * aggregation per group.
  */
object LineAgg {

  sealed trait Mode
  case object ContinueThrough extends Mode
  case object ContinueWith extends Mode
  case object HaltBefore extends Mode
  case object HaltWith extends Mode

  def apply(
      df: DataFrame,
      fileCol: Column,
      orderCol: Column,
      lineCol: Column,
      mode: Mode,
      pattern: String,
      joinWith: String = "\n"): DataFrame = {
    val w = Window.partitionBy(fileCol).orderBy(orderCol)
    val matches = lineCol.rlike(pattern)
    val startsNew = mode match {
      case ContinueThrough => !matches
      case ContinueWith    => !coalesce(lag(matches, 1).over(w), lit(false))
      case HaltBefore      => matches
      case HaltWith        => coalesce(lag(matches, 1).over(w), lit(true))
    }
    val grouped = df
      .withColumn("__file", fileCol)
      .withColumn("__ord", orderCol)
      .withColumn("__line", lineCol)
      .withColumn("__grp",
        sum(startsNew.cast("long")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    grouped.groupBy(col("__file").as("file"), col("__grp").as("grp"))
      .agg(
        min(col("__ord")).as("first_order"),
        count(lit(1)).as("n_lines"),
        concat_ws(joinWith,
          transform(
            array_sort(collect_list(struct(col("__ord").as("o"),
              col("__line").as("l")))),
            x => x.getField("l"))).as("message"))
  }
}
