package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `route` / `exclusive_route` — multi-way stream split.
  *
  * Reference: /root/reference/src/transforms/route.rs (event goes to EVERY
  * matching route; `_unmatched` output at route.rs:17) and
  * src/transforms/exclusive_route/transform.rs:46-57 (first match wins).
  *
  * Each output is a sibling filtered DataFrame off the same parent — at
  * scale, the shared scan is read once per materialized sink (or cached);
  * Catalyst pushes each route predicate down to the parquet scan.
  */
object Route {

  val Unmatched = "_unmatched"

  /** `route`: every matching route receives the event. A predicate that
    * evaluates to SQL NULL (e.g. comparison on a null column) counts as
    * non-matching, so such events land in `_unmatched` exactly like the
    * reference (route.rs sends every non-matching event there).
    */
  def apply(df: DataFrame, routes: Seq[(String, Column)],
            rerouteUnmatched: Boolean = true): Map[String, DataFrame] = {
    val safe = routes.map { case (name, cond) => name -> coalesce(cond, lit(false)) }
    val named = safe.map { case (name, cond) => name -> df.filter(cond) }.toMap
    // `reroute_unmatched: false` (route.rs:22) drops non-matching
    // events instead of exposing the `_unmatched` port
    if (!rerouteUnmatched) named
    else named + (Unmatched -> df.filter(!safe.map(_._2).reduce(_ || _)))
  }

  /** Single-DataFrame view for batch verification: one row per
    * (event, matching-route) pair, plus `_unmatched` rows — the relational
    * encoding of the fan-out.
    */
  def tagged(df: DataFrame, routes: Seq[(String, Column)]): DataFrame = {
    val matches = array(
      routes.map { case (name, cond) => when(cond, lit(name)) }: _*)
    df.withColumn(
        "route",
        explode(
          when(size(filter_exprs(matches)) === 0, array(lit(Unmatched)))
            .otherwise(filter_exprs(matches))))
  }

  private def filter_exprs(arr: Column): Column =
    filter(arr, x => x.isNotNull)

  /** `exclusive_route`: first-match-wins tag column. NULL predicates are
    * non-matches (fall through), same as [[apply]].
    */
  def exclusiveTag(df: DataFrame, routes: Seq[(String, Column)]): DataFrame = {
    val tag = routes.foldRight(lit(Unmatched): Column) {
      case ((name, cond), rest) => when(coalesce(cond, lit(false)), lit(name)).otherwise(rest)
    }
    df.withColumn("route", tag)
  }

  /** `exclusive_route` as separate outputs. */
  def exclusive(df: DataFrame, routes: Seq[(String, Column)]): Map[String, DataFrame] = {
    val tagged = exclusiveTag(df, routes)
    (routes.map(_._1) :+ Unmatched)
      .map(name => name -> tagged.filter(col("route") === name).drop("route"))
      .toMap
  }
}
