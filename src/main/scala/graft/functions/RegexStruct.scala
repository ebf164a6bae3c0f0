package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass multi-group regex extraction as a native Catalyst expression.
  *
  * The VRL parse family (`parse_common_log`, `parse_syslog`,
  * `parse_regex`, … — reference: the vrl crate's parse functions, surface
  * listed in /root/reference/website/cue/reference/remap/functions.cue)
  * needs N capture groups from one pattern. Composing N builtin
  * `regexp_extract` calls re-runs the SAME regex N times per row; this
  * expression matches once and returns a struct of all groups, with
  * `doGenCode` so it stays inside whole-stage codegen.
  *
  * Null semantics: no match → null struct; a group that did not
  * participate in the match → null field; a group matching the empty
  * string → "" (callers apply nullif where VRL treats empty as absent).
  */
case class RegexpExtractGroups(
    child: Expression,
    pattern: String,
    fieldNames: Seq[String])
  extends UnaryExpression {

  @transient private lazy val compiled: Pattern = Pattern.compile(pattern)

  override def dataType: DataType =
    StructType(fieldNames.map(n => StructField(n, StringType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "regexp_extract_groups"

  override protected def nullSafeEval(input: Any): Any =
    RegexStruct.extract(compiled, input.asInstanceOf[UTF8String],
      fieldNames.length)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef =
      ctx.addReferenceObj("pattern", compiled, classOf[Pattern].getName)
    val n = fieldNames.length
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.RegexStruct.extract($patRef, $c, $n);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): RegexpExtractGroups =
    copy(child = newChild)
}

object RegexStruct {

  /** `regexp_extract_groups(c, pattern)` as a Column of struct type. */
  def apply(c: Column, pattern: String, fieldNames: Seq[String]): Column =
    ColumnBridge.column(
      RegexpExtractGroups(ColumnBridge.expression(c), pattern, fieldNames))

  /** Runtime kernel shared by interpreted eval and generated code. */
  def extract(p: Pattern, s: UTF8String, n: Int): InternalRow = {
    val m = p.matcher(s.toString)
    if (!m.find()) null
    else {
      val arr = new Array[Any](n)
      var i = 0
      while (i < n) {
        val g = m.group(i + 1)
        arr(i) = if (g == null) null else UTF8String.fromString(g)
        i += 1
      }
      new GenericInternalRow(arr)
    }
  }
}
