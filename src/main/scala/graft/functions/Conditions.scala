package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Condition layer.
  *
  * Reference: /root/reference/src/conditions/mod.rs:37-63 — `Condition` is
  * one of IsLog / IsMetric / IsTrace, a VRL boolean program, or a
  * DatadogSearch query. Used by filter, route, reduce starts_when /
  * ends_when, sample.exclude, throttle.exclude, window.flush_when.
  *
  * VRL boolean programs are ordinary boolean `Column`s here (built from
  * graft.functions.Vrl). [[DatadogSearch]] compiles the Datadog log-search
  * syntax (src/conditions/datadog_search.rs, facet/tag/wildcard/range
  * syntax) into a `Column` predicate, so it participates in pushdown.
  */
object Conditions {

  /** IsLog / IsMetric / IsTrace over a `kind` discriminator column. */
  def isLog(kind: Column): Column = kind === "log"
  def isMetric(kind: Column): Column = kind === "metric"
  def isTrace(kind: Column): Column = kind === "trace"
}

/** Datadog search syntax -> Column predicate compiler.
  *
  * Supported (the practically-used subset of
  * src/conditions/datadog_search.rs): bare terms (match the default
  * field), `field:value`, quoted phrases, `*` wildcards, numeric
  * comparisons `field:>n` `field:<=n`, ranges `field:[a TO b]`, boolean
  * operators `AND` / `OR` / `NOT` / `-term`, parentheses. Implicit
  * conjunction between adjacent terms.
  */
final class DatadogSearch(fields: Map[String, Column], default: Column) {

  private var tokens: List[String] = Nil

  def compile(query: String): Column = {
    tokens = DatadogSearch.tokenize(query)
    val c = orExpr()
    require(tokens.isEmpty, s"trailing tokens: $tokens")
    c
  }

  private def peek: Option[String] = tokens.headOption
  private def pop(): String = { val h = tokens.head; tokens = tokens.tail; h }

  private def orExpr(): Column = {
    var left = andExpr()
    while (peek.contains("OR")) { pop(); left = left || andExpr() }
    left
  }

  private def andExpr(): Column = {
    var left = unary()
    var go = true
    while (go) peek match {
      case Some("AND") => pop(); left = left && unary()
      case Some(t) if t != "OR" && t != ")" => left = left && unary() // implicit AND
      case _ => go = false
    }
    left
  }

  private def unary(): Column = peek match {
    case Some("NOT") => pop(); !unary()
    case Some(t) if t.startsWith("-") && t.length > 1 =>
      tokens = t.substring(1) :: tokens.tail; !unary()
    case _ => primary()
  }

  private def primary(): Column = pop() match {
    case "(" =>
      val c = orExpr()
      require(pop() == ")", "expected )")
      c
    case t if t.contains(":") =>
      val (field, value) = t.splitAt(t.indexOf(':'))
      facet(field, value.substring(1))
    case bare => termMatch(default, bare)
  }

  private def facet(field: String, value: String): Column = {
    val c = fields.getOrElse(field.stripPrefix("@"),
      throw new IllegalArgumentException(s"unknown facet: $field"))
    value match {
      case v if v.startsWith(">=") => c >= v.substring(2).toDouble
      case v if v.startsWith("<=") => c <= v.substring(2).toDouble
      case v if v.startsWith(">") => c > v.substring(1).toDouble
      case v if v.startsWith("<") => c < v.substring(1).toDouble
      case v if v.startsWith("[") && v.endsWith("]") =>
        val Array(lo, hi) = v.substring(1, v.length - 1).split(" TO ")
        if (lo.matches("-?[0-9.]+") && hi.matches("-?[0-9.]+"))
          c.between(lo.toDouble, hi.toDouble)
        else c.between(lo, hi)
      case v => termMatch(c, v)
    }
  }

  private def termMatch(c: Column, term: String): Column = {
    val t = term.stripPrefix("\"").stripSuffix("\"")
    if (t.contains("*"))
      c.like(t.replace("%", "\\%").replace("*", "%"))
    else if (term.startsWith("\"")) c.contains(t)
    else c === t
  }
}

object DatadogSearch {
  def apply(fields: Map[String, Column], default: Column): DatadogSearch =
    new DatadogSearch(fields, default)

  /** Tokenizer: quoted strings, ranges and parens are single tokens. */
  private[functions] def tokenize(q: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    val sb = new StringBuilder
    def flush(): Unit = if (sb.nonEmpty) { out += sb.toString; sb.clear() }
    while (i < q.length) {
      q.charAt(i) match {
        case '(' | ')' => flush(); out += q.charAt(i).toString; i += 1
        case ' ' => flush(); i += 1
        case '"' =>
          val end = q.indexOf('"', i + 1)
          sb.append(q.substring(i, end + 1)); i = end + 1
        case '[' =>
          val end = q.indexOf(']', i)
          sb.append(q.substring(i, end + 1)); i = end + 1
        case ch => sb.append(ch); i += 1
      }
    }
    flush()
    out.toList
  }
}
