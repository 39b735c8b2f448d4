package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge. `classic.ExpressionUtils` is
  * `private[sql]` at the Scala level in Spark 4.x (bytecode-public), so the
  * accessor has to live inside the `org.apache.spark.sql` package — this is
  * the one deliberate reach into Spark internals, required to expose custom
  * Catalyst expressions (e.g. `graft.catalyst.SimHash64`) as `Column`s.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
