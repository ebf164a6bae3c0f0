package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column <-> catalyst Expression conversions
  * (Spark 4 moved them behind `org.apache.spark.sql.classic`). Lives in
  * the sql package namespace solely to satisfy the access modifier; this
  * is the one sanctioned hook for registering custom native expressions
  * without a full FunctionRegistry extension.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
