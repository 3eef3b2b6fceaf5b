package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal `private[sql]` bridge (the standard Spark-extension pattern):
  * most graft expressions reach Column-land through the function registry
  * (`RegisterOnce` + `call_function`), but an expression carrying a runtime
  * handle that SQL cannot express — e.g. a `Broadcast[Array[Byte]]` in
  * [[graft.functions.BloomMightContainBroadcast]] — needs direct
  * Expression↔Column conversion, which Spark 4 gates behind
  * `private[sql] classic.ExpressionUtils`.
  */
object GraftSqlShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
