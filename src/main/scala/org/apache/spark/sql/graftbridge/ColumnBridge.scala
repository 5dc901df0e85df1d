package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters —
  * the supported extension point for registering custom Catalyst
  * expressions as user-facing Columns (Spark 4 moved Column onto
  * ColumnNode, so `new Column(expr)` no longer exists).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `DataType.sameType` (equality ignoring nullability) is
    * private[sql] — re-exported for schema-evolution checks outside the
    * sql package.
    */
  def sameType(a: org.apache.spark.sql.types.DataType,
               b: org.apache.spark.sql.types.DataType): Boolean = a.sameType(b)

  /** `StructType.asNullable` is private[sql] — re-exported for the
    * schema-sidecar writer (file-source reads force nullability, so
    * recorded schemas normalize the same way).
    */
  def asNullable(s: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType =
    s.asNullable
}
