package graft.catalyst

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 bridge between the public `Column` API and Catalyst
  * `Expression`s (Column is node-backed in 4.x; the 3.x `new Column(expr)` /
  * `col.expr` round-trip moved behind `classic.ExpressionUtils`, which is
  * `private[sql]` — see `org.apache.spark.sql.GraftBridge`). */
object Cols {
  def column(e: Expression): Column = GraftBridge.column(e)
  def expression(c: Column): Expression = GraftBridge.expression(c)
}
