package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge. Spark 4 made `Column.expr` /
  * `ExpressionUtils` private[sql]; custom Catalyst expressions still need
  * the conversion to be exposed as user-facing Columns. Public-API pattern:
  * same access trick Spark's own extensions ecosystem uses.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eagerly CONVERT a Column's node tree to a Catalyst expression
    * (functions become UnresolvedFunction nodes the analyzer resolves).
    * [[expression]] merely wraps the node — fine inside Dataset plans,
    * which convert during analysis, but a wrapper returned from a SQL
    * function-registry builder is never converted and dies at codegen;
    * builders that re-expose Column-API operators as SQL functions must
    * use this.
    */
  def expressionConverted(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Drain the async listener bus so SparkListener-accumulated metrics are
    * complete before a bench snapshots them (`listenerBus` is
    * private[spark]).
    */
  def waitListenerBusEmpty(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
