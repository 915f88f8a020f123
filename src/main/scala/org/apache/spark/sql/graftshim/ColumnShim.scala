package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the `private[sql]` Column↔Expression converters —
  * the supported classic-API conversion lives in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is visible only
  * inside the `org.apache.spark.sql` package tree. This subpackage
  * exists solely to re-export those two calls to graft code.
  */
object ColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
