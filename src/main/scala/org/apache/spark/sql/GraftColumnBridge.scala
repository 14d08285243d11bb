package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the private[sql] Column↔Expression converters (Spark 4
  * moved Column to a plan-agnostic representation; building a Column from
  * a custom Catalyst Expression goes through classic.ExpressionUtils,
  * which is sql-private). This is the only file outside the graft
  * namespace, and it exists solely to expose these two calls. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** types.AbstractDataType is private[sql]; custom expressions outside
    * this package need it to declare `inputTypes` (ImplicitCastInputTypes).
    * A public alias defined inside the package is the minimal exposure. */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
