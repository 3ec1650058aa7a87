package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column<->Expression converters in Spark 4's
  * classic API, so the engine can expose custom Catalyst expressions as
  * `Column`s. This is the only file outside the `graft` namespace; it
  * contains no logic.
  */
object ColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
