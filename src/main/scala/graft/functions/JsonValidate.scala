package graft.functions

import com.fasterxml.jackson.core.JsonFactory

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** `is_json` as a streaming validity scan (reference: the remap
  * type-check fn — true iff the whole string is one well-formed JSON
  * document). The previous implementation was
  * `try_parse_json(c).isNotNull`: a full variant BUILD (tree
  * materialization + variant encoding) per row, thrown away after the
  * null check, and CodegenFallback besides. This expression runs the
  * Jackson streaming parser over the input without materializing
  * anything and participates in whole-stage codegen (same posture as
  * [[RegexStruct]]).
  *
  * Semantics match the null-check form on every input class the oracle
  * exercises: null → false, scalar/object/array docs → true, trailing
  * garbage or malformed → false. (Duplicate object keys validate as
  * true here — serde_json's reading of the reference — where the
  * variant builder rejected them; no declared input carries them.)
  */
case class IsValidJson(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "is_valid_json"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false
    else JsonValidate.isValid(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        boolean ${ev.value} = false;
        if (!${c.isNull}) {
          ${ev.value} = graft.functions.JsonValidate.isValid(${c.value});
        }
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): IsValidJson =
    copy(child = newChild)
}

object JsonValidate {

  def apply(c: Column): Column =
    ColumnBridge.column(IsValidJson(ColumnBridge.expression(c)))

  private val factory = new JsonFactory()

  /** True iff `s` is exactly one well-formed JSON document. */
  def isValid(s: UTF8String): Boolean = {
    val p = factory.createParser(s.toString)
    try {
      val first = p.nextToken()
      if (first == null) false
      else {
        p.skipChildren() // no-op on scalars; consumes+validates containers
        p.nextToken() == null // must hit end-of-input (no trailing bytes)
      }
    } catch {
      case _: com.fasterxml.jackson.core.JacksonException => false
    } finally p.close()
  }
}
