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

  /** Wrap a hand-built LogicalPlan as a DataFrame (Dataset.ofRows is
    * private[sql]) — needed to surface custom logical operators like
    * graft.plans.TopKPerKeyNode through the public Dataset API.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
