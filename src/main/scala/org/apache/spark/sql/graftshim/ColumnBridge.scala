package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(Expression)` constructor;
  * the supported bridge (`classic.ExpressionUtils`) is private[sql].
  * This one-file shim lives in the org.apache.spark.sql namespace to
  * re-export exactly the two conversions a native-expression library
  * needs — the same pattern Spark connector/extension libraries use.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
