package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** AWS ALB access-log tokenizer as a hand-rolled single-pass scanner —
  * the [[CefTokens]] treatment for the 29-group field regex
  * (`^(\S+) (\S+) … "([^"]*)"(?: "([^"]*)")?…​.*$`). The regex is
  * backtracking-free on this grammar, but a 29-group java.util.regex
  * match still pays per-group bookkeeping and a matcher allocation per
  * row; the scanner walks the line once.
  *
  * Exactly the regex's semantics (pinned by AlbTokensSpec against the
  * original pattern on well-formed AND malformed lines):
  *  - 23 required fields separated by SINGLE literal spaces: 12 bare
  *    (`\S+` — maximal run of non-whitespace, ≥1 char), `"quoted"`
  *    `"quoted"`, 3 bare, 3 quoted, 2 bare, 1 quoted;
  *  - then up to 6 OPTIONAL ` "quoted"` fields — the first position
  *    that does not start with space-quote-…-closing-quote stops the
  *    optional run (matching the regex: a failed optional group means
  *    every later identical group fails at the same spot);
  *  - then `.*$`: any trailing bytes WITHOUT a line terminator, plus at
  *    most one final terminator (`\n`, `\r\n`, `\r`, NEL, LS, PS) — a
  *    terminator followed by more content fails the match, like the
  *    non-DOTALL/non-MULTILINE original;
  *  - no match → null row; an unmatched optional group → null field;
  *    an empty quoted field → "".
  */
case class AlbLogTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(AlbTokens.FieldNames.map(n =>
    StructField(n, StringType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "alb_log_tokens"

  override protected def nullSafeEval(input: Any): Any =
    AlbTokens.scan(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.AlbTokens.scan($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): AlbLogTokens =
    copy(child = newChild)
}

object AlbTokens {

  val FieldNames: Seq[String] = Seq(
    "type", "timestamp", "elb", "client_host", "target_host",
    "request_processing_time", "target_processing_time",
    "response_processing_time", "elb_status_code", "target_status_code",
    "received_bytes", "sent_bytes", "request", "user_agent",
    "ssl_cipher", "ssl_protocol", "target_group_arn", "trace_id",
    "domain_name", "chosen_cert_arn", "matched_rule_priority",
    "request_creation_time", "actions_executed", "redirect_url",
    "error_reason", "target_port_list", "target_status_code_list",
    "classification", "classification_reason")

  // required-field kinds, in order: false = bare \S+, true = "quoted"
  private val Quoted: Array[Boolean] = {
    val q = new Array[Boolean](23)
    Seq(12, 13, 17, 18, 19, 22).foreach(q(_) = true)
    q
  }

  def apply(c: Column): Column =
    ColumnBridge.column(AlbLogTokens(ColumnBridge.expression(c)))

  // java.util.regex \s (no UNICODE_CHARACTER_CLASS): [ \t\n\x0B\f\r]
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  // '.' (no DOTALL) excludes \n \r NEL LS PS
  private def isLineTerm(c: Char): Boolean =
    c == '\n' || c == '\r' || c == '\u0085' || c == '\u2028' ||
      c == '\u2029'

  /** Runtime kernel shared by interpreted eval and generated code. */
  def scan(u: UTF8String): InternalRow = {
    val s = u.toString
    val n = s.length
    val out = new Array[Any](29)
    var i = 0
    var f = 0
    while (f < 23) {
      if (f > 0) {
        if (i >= n || s.charAt(i) != ' ') return null
        i += 1
      }
      if (Quoted(f)) {
        if (i >= n || s.charAt(i) != '"') return null
        i += 1
        val st = i
        while (i < n && s.charAt(i) != '"') i += 1
        if (i >= n) return null // unclosed quote: required group fails
        out(f) = UTF8String.fromString(s.substring(st, i))
        i += 1 // closing quote
      } else {
        val st = i
        while (i < n && !isWs(s.charAt(i))) i += 1
        if (i == st) return null // \S+ needs at least one char
        out(f) = UTF8String.fromString(s.substring(st, i))
      }
      f += 1
    }
    // up to six optional ` "quoted"` fields; first non-match stops all
    var k = 23
    var more = true
    while (k < 29 && more) {
      if (i + 1 < n && s.charAt(i) == ' ' && s.charAt(i + 1) == '"') {
        var j = i + 2
        while (j < n && s.charAt(j) != '"') j += 1
        if (j < n) {
          out(k) = UTF8String.fromString(s.substring(i + 2, j))
          i = j + 1
          k += 1
        } else more = false
      } else more = false
    }
    // `.*$`: consume non-terminator bytes, then allow at most one FINAL
    // line terminator (the $ of a non-MULTILINE pattern)
    var j = i
    while (j < n && !isLineTerm(s.charAt(j))) j += 1
    if (j == n) return new GenericInternalRow(out)
    val rest = n - j
    val ok =
      if (s.charAt(j) == '\r' && j + 1 < n && s.charAt(j + 1) == '\n')
        rest == 2
      else rest == 1
    if (ok) new GenericInternalRow(out) else null
  }
}
