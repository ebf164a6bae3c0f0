package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The `remap` transform — the workhorse projection/computation operator.
  *
  * Reference: /root/reference/src/transforms/remap.rs (drop_on_error :128,
  * drop_on_abort :142, reroute_dropped :155, DROPPED output :50). Instead
  * of interpreting a VRL AST per event, mappings are Catalyst `Column`
  * expressions, so the whole remap participates in whole-stage codegen and
  * Catalyst pushes filters through it.
  *
  * Error semantics: VRL programs are infallible-by-construction; runtime
  * errors either abort the event or (with `reroute_dropped`) send it to a
  * `dropped` output. Here an optional `errorWhen` predicate plays that
  * role (typically `try_`-style expressions yielding null on failure).
  */
object Remap {

  /** Primary output plus the rerouted `dropped` stream (empty when no
    * errorWhen is configured — matches reroute_dropped=false).
    */
  final case class Outputs(primary: DataFrame, dropped: DataFrame)

  def apply(
      df: DataFrame,
      sets: Seq[(String, Column)],
      removes: Seq[String] = Nil,
      errorWhen: Option[Column] = None): Outputs = {
    val mapped = removes
      .foldLeft(sets.foldLeft(df) { case (d, (name, c)) => d.withColumn(name, c) })(
        _.drop(_))
    errorWhen match {
      case None => Outputs(mapped, mapped.limit(0))
      // coalesce(cond, false): a null error-predicate must not drop the row
      case Some(cond) =>
        Outputs(
          mapped.filter(!coalesce(cond, lit(false))),
          mapped.filter(coalesce(cond, lit(false))))
    }
  }
}
