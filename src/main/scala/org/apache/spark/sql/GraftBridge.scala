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

  /** Drain the async listener bus so SparkListener-accumulated metrics are
    * complete before a bench snapshots them (`listenerBus` is
    * private[spark]).
    */
  def waitListenerBusEmpty(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
