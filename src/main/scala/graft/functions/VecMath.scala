package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product over two array<double> columns as a codegen'd
  * expression.
  *
  * Replaces `aggregate(zip_with(x, y, (p,q) => p*q), 0.0, acc+v)` in
  * the ANN/dedup hot paths: the HOF form materializes an intermediate
  * product array PER EVALUATION — three of them per candidate pair in
  * a cosine filter — which at a bounded semantic-dedup join's 10⁹
  * pairs means ~3×10⁹ short-lived ArrayData allocations. This kernel
  * walks both arrays once with zero allocation.
  *
  * Semantics are EXACTLY the HOF formula's (the oracle queries pin
  * them): sequential left-to-right fold (deterministic), empty arrays
  * → 0.0, any null element → null, unequal lengths → null (zip_with
  * pads the short side with null, which poisons the sum), null input
  * → null.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "array_dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMath.dotKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      s"""
      java.lang.Double $tmp = graft.functions.VecMath.dotKernel($a, $b);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp.doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object VecMath {

  /** `Σ a[i]·b[i]` with the HOF formula's null semantics. Shared by
    * interpreted eval and generated code.
    */
  def dotKernel(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Column form; both sides cast to array<double> (a no-op cast is
    * elided by the optimizer).
    */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDotProduct(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))
}
