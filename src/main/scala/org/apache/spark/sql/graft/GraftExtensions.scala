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
    ext.injectFunction((
      new FunctionIdentifier("topk_by_score"),
      new ExpressionInfo(classOf[TopKByScoreAgg].getName, "topk_by_score"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TopKByScoreAgg(exprs(0), exprs(1), GraftExtensions.literalInt(exprs(2)))
          .toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignatureAgg].getName, "minhash_signature"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashSignatureAgg(exprs(0), GraftExtensions.literalInt(exprs(1)))
          .toAggregateExpression()))
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ShingleHashes(exprs(0), GraftExtensions.literalInt(exprs(1)))))
  }
}

object GraftExtensions {
  private[graft] def literalInt(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
      case other =>
        throw new IllegalArgumentException(s"expected an integer literal, got $other")
    }
}
