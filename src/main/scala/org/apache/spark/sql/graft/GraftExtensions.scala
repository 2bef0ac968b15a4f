package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * functions for pure-SQL users. Activate with
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArrayDotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("weighted_median"),
      new ExpressionInfo(classOf[WeightedMedianAgg].getName, "weighted_median"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WeightedMedianAgg(exprs(0), exprs(1)).toAggregateExpression()))
  }
}
