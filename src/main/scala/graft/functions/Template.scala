package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference's template strings (src/template/parsing.rs): a template
  * is literal text interleaved with `{{ field.path }}` event references,
  * and any literal chunk may itself contain chrono strftime specifiers
  * (`%Y-%m-%d`, `%F`, …) rendered against the event's timestamp
  * (parsing.rs:75-82 `parse_literal` → `Part::Strftime`). Used by sink
  * path/key templates (src/sinks/file/mod.rs:69 `path: UnconfinedTemplate`),
  * kafka topics, loki labels, log_to_metric tag values, throttle
  * key_field, and more.
  *
  * Spark-first: the whole template compiles to ONE Column expression
  * (concat of literals, `date_format` chunks and field refs), so it
  * participates in codegen and costs nothing beyond the projection.
  */
object Template {

  private val Ref = "\\{\\{\\s*([^}]+?)\\s*\\}\\}".r

  /** Does the string contain any `{{ … }}` reference or `%x` strftime
    * specifier (i.e. would rendering differ per event)?
    */
  def isDynamic(template: String): Boolean =
    Ref.findFirstIn(template).isDefined || hasStrftime(template)

  private def hasStrftime(s: String): Boolean = {
    var i = 0
    while (i < s.length - 1) {
      if (s(i) == '%') {
        if (s(i + 1) != '%') return true
        i += 2 // `%%` = literal percent, skip the pair
      } else i += 1
    }
    false
  }

  /** The event column a template's strftime chunks render against: the
    * reference formats with the event timestamp (template/mod.rs render
    * with `event.timestamp()`); fall back to now() for events without one
    * (matching the reference's TimeZone::now fallback for metrics).
    */
  def timestampCol(schema: StructType): Column =
    Seq("timestamp", "ts").find(n => schema.fieldNames.contains(n)) match {
      case Some(n) => coalesce(col(n).cast("timestamp"), current_timestamp())
      case None => current_timestamp()
    }

  /** Resolve one `{{ path }}` reference. Dotted paths descend structs
    * (Spark's `col` already does); `tags.x` additionally works for map
    * columns (metric tags are a map in our model —
    * template/parsing.rs:119-127 `render_metric_field`).
    */
  private def ref(schema: StructType, path: String): Column = {
    val head = path.takeWhile(_ != '.')
    val rest = path.drop(head.length + 1)
    schema.fields.find(_.name == head) match {
      case Some(f) if rest.nonEmpty && f.dataType.isInstanceOf[
          org.apache.spark.sql.types.MapType] =>
        col(head).getItem(rest).cast("string")
      case Some(_) if rest.isEmpty => col(head).cast("string")
      case Some(_) => col(path).cast("string")
      case None => lit(null).cast("string") // unknown field: render empty
    }
  }

  /** Compile a template string to a Column producing the rendered text
    * for each event.
    */
  def render(schema: StructType, template: String): Column = {
    val ts = timestampCol(schema)
    val parts = scala.collection.mutable.ArrayBuffer.empty[Column]
    var last = 0
    def literal(s: String): Unit = if (s.nonEmpty) {
      if (hasStrftime(s))
        parts += date_format(ts, VrlFunctions.strftimeToJava(s))
      else parts += lit(s)
    }
    for (m <- Ref.findAllMatchIn(template)) {
      literal(template.substring(last, m.start))
      parts += coalesce(ref(schema, m.group(1).trim), lit(""))
      last = m.end
    }
    literal(template.substring(last))
    if (parts.isEmpty) lit("") else concat(parts.toSeq: _*)
  }
}
