package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * functions for pure-SQL users. Activate with
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions` or
  * `.withExtensions(new GraftExtensions)`. The same builder table backs
  * [[GraftExpressions.register]] (temp functions on an existing session),
  * so the two registration paths cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, clazz, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        builder))
    }
}

object GraftExtensions {

  /** (SQL name, implementing class, builder). Scalar functions take any
    * expressions; parameters that configure codegen (hash counts, slice
    * bounds, seeds, k) must be integer LITERALS — same contract as the
    * Column API, which takes them as plain Scala values.
    */
  private[graft] val functions: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("array_dot", classOf[ArrayDotProduct],
      (exprs: Seq[Expression]) => ArrayDotProduct(exprs(0), exprs(1))),
    ("weighted_median", classOf[WeightedMedianAgg],
      (exprs: Seq[Expression]) =>
        WeightedMedianAgg(exprs(0), exprs(1)).toAggregateExpression()),
    ("topk_by_score", classOf[TopKByScoreAgg],
      (exprs: Seq[Expression]) =>
        TopKByScoreAgg(exprs(0), exprs(1), literalInt(exprs(2))).toAggregateExpression()),
    ("topk_rows", classOf[TopKRowsAgg],
      (exprs: Seq[Expression]) =>
        TopKRowsAgg(
          exprs(0),
          literalInt(exprs(1)),
          TopKRows.parseMask(literalString(exprs(2))),
          literalInt(exprs(3))).toAggregateExpression()),
    ("vec_sum", classOf[VectorSumAgg],
      (exprs: Seq[Expression]) => VectorSumAgg(exprs(0)).toAggregateExpression()),
    ("vec_moments", classOf[VectorMomentsAgg],
      (exprs: Seq[Expression]) =>
        VectorMomentsAgg(exprs(0), literalInt(exprs(1))).toAggregateExpression()),
    ("bloom_agg", classOf[BloomFilterAgg],
      (exprs: Seq[Expression]) =>
        BloomFilterAgg(exprs(0), literalInt(exprs(1)), literalInt(exprs(2)))
          .toAggregateExpression()),
    ("minhash_signature", classOf[MinHashSignatureAgg],
      (exprs: Seq[Expression]) =>
        MinHashSignatureAgg(exprs(0), literalInt(exprs(1))).toAggregateExpression()),
    ("shingle_hashes", classOf[ShingleHashes],
      (exprs: Seq[Expression]) => ShingleHashes(exprs(0), literalInt(exprs(1)))),
    ("positioned_shingle_hashes", classOf[PositionedShingleHashes],
      (exprs: Seq[Expression]) => PositionedShingleHashes(exprs(0), literalInt(exprs(1)))),
    ("ngram_repetition", classOf[NgramRepetition],
      (exprs: Seq[Expression]) => NgramRepetition(exprs(0), literalInt(exprs(1)))),
    ("simhash64", classOf[SimHash64],
      (exprs: Seq[Expression]) => SimHash64(exprs(0))),
    ("fnv1a_fingerprint", classOf[Fnv1aFingerprint],
      (exprs: Seq[Expression]) => Fnv1aFingerprint(exprs(0))),
    ("slice_hash", classOf[LongArraySliceHash],
      (exprs: Seq[Expression]) =>
        LongArraySliceHash(
          exprs(0), literalInt(exprs(1)), literalInt(exprs(2)), literalLong(exprs(3)))))

  private[graft] def literalInt(e: Expression): Int =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
      case other =>
        throw new IllegalArgumentException(s"expected an integer literal, got $other")
    }

  private[graft] def literalString(e: Expression): String =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null =>
        v.toString
      case other =>
        throw new IllegalArgumentException(s"expected a string literal, got $other")
    }

  private[graft] def literalLong(e: Expression): Long =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
      case other =>
        throw new IllegalArgumentException(s"expected an integer literal, got $other")
    }
}
