package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** CEF header tokenizer as a hand-rolled single-pass scanner.
  *
  * Replaces the 6-escaped-group header regex
  * `^CEF:(\d+)\|((?:\\.|[^|\\])*)\|…\|(.*)$` — correct but
  * backtracking-prone (each field group re-explores escape-pair vs
  * plain-char alternatives on long fields). The scanner walks the
  * string once: `\<any>` consumes two chars, an unescaped `|` ends the
  * field. Exactly the regex's semantics, including its failure modes
  * (no `CEF:` prefix, non-digit version, a lone trailing backslash
  * inside a header field, or fewer than 7 pipes → null row).
  *
  * Reference: parse_cef (VRL stdlib; the header layout is the inverse
  * of lib/codecs/src/encoding/format/cef.rs).
  */
case class CefHeaderTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(CefTokens.FieldNames.map(n =>
    StructField(n, StringType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "cef_header_tokens"

  override protected def nullSafeEval(input: Any): Any =
    CefTokens.scan(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.CefTokens.scan($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): CefHeaderTokens =
    copy(child = newChild)
}

object CefTokens {

  val FieldNames: Seq[String] = Seq("cef_version", "device_vendor",
    "device_product", "device_version", "event_class_id", "name",
    "severity", "ext")

  def apply(c: Column): Column =
    ColumnBridge.column(CefHeaderTokens(ColumnBridge.expression(c)))

  /** Runtime kernel shared by interpreted eval and generated code. */
  def scan(u: UTF8String): InternalRow = {
    val s = u.toString
    val n = s.length
    if (!s.startsWith("CEF:")) return null
    var i = 4
    // (\d+) then a literal pipe
    val vStart = i
    while (i < n && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
    if (i == vStart || i >= n || s.charAt(i) != '|') return null
    val out = new Array[Any](8)
    out(0) = UTF8String.fromString(s.substring(vStart, i))
    i += 1 // consume the pipe
    // six escaped fields, each ended by an unescaped pipe
    var f = 1
    while (f <= 6) {
      val start = i
      var ok = true
      var done = false
      while (!done) {
        if (i >= n) { ok = false; done = true } // missing separator
        else s.charAt(i) match {
          case '|' => done = true
          case '\\' =>
            // escape pair consumes two; a lone trailing backslash can
            // match neither regex alternative -> overall failure
            if (i + 1 >= n) { ok = false; done = true } else i += 2
          case _ => i += 1
        }
      }
      if (!ok) return null
      out(f) = UTF8String.fromString(s.substring(start, i))
      i += 1 // the pipe
      f += 1
    }
    out(7) = UTF8String.fromString(s.substring(math.min(i, n)))
    new GenericInternalRow(out)
  }
}
