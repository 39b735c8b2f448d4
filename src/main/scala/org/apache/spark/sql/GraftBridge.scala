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

  /** Eager node→Expression conversion. `expression` wraps node-backed
    * Columns in a LAZY `ColumnNodeExpression`, which the analyzer only
    * unwraps on the DataFrame path — an expression returned from a SQL
    * function builder (SparkSessionExtensions.injectFunction) must
    * already be a plain catalyst tree (UnresolvedFunction and friends),
    * or codegen hits the Unevaluable wrapper. */
  def expressionEager(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
}
