package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{
  AbstractDataType, ArrayType, DataType, DoubleType, StringType
}

/** `ngram_repetition(tokens, n)`: Gopher/C4-style repetition signals of a
  * token array in ONE pass — `array(top_fraction, dup_fraction)` where
  * `top_fraction` is the share of n-gram occurrences taken by the single
  * most frequent n-gram and `dup_fraction` is the share of occurrences
  * belonging to any n-gram that occurs more than once. Both are over
  * NON-distinct occurrence counts (total = len - n + 1), the quantities
  * the Gopher repetition filters threshold on (token- rather than
  * character-weighted). Docs shorter than n tokens count their full token
  * sequence as the one n-gram (top = dup-eligible total = 1), mirroring
  * [[ShingleHashes]]' short-doc fallback.
  *
  * The per-row n-gram counting needs a hash table, so like
  * [[ShingleHashes]] this is a `CodegenFallback` scalar: still a single
  * map-side pass with zero intermediate string allocation (n-grams are
  * keyed by the chained 64-bit token hashes, [[ShingleHashes.tokenHash]]),
  * and — the 100 TB point — per-document repetition scoring shuffles
  * NOTHING, where an explode + per-doc groupBy formulation would shuffle
  * one row per n-gram occurrence of the whole corpus.
  *
  * dup_fraction counts occurrences (a gram seen k>1 times contributes k),
  * matching Gopher's "fraction of characters in duplicated n-grams"
  * convention transposed to tokens.
  */
case class NgramRepetition(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(n > 0)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val th = new Array[Long](m)
    var i = 0
    while (i < m) { th(i) = ShingleHashes.tokenHash(arr.getUTF8String(i)); i += 1 }

    val total = if (m < n) 1 else m - n + 1
    val counts = new java.util.HashMap[java.lang.Long, Int](total * 2)
    if (m < n) {
      var c = 0x51ed270b9d4e3e41L
      var j = 0
      while (j < m) { c = MinHashSignatureAgg.mix(c ^ th(j)); j += 1 }
      counts.put(c, 1)
    } else {
      i = 0
      while (i < total) {
        var c = 0x51ed270b9d4e3e41L
        var j = 0
        while (j < n) { c = MinHashSignatureAgg.mix(c ^ th(i + j)); j += 1 }
        counts.merge(c, 1, (a: Int, b: Int) => a + b)
        i += 1
      }
    }
    var top = 0
    var dup = 0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > top) top = c
      if (c > 1) dup += c
    }
    new GenericArrayData(Array(top.toDouble / total, dup.toDouble / total))
  }

  override protected def withNewChildInternal(newChild: Expression): NgramRepetition =
    copy(child = newChild)
}

object NgramRepetitionFn {
  def ngram_repetition(tokens: Column, n: Int): Column =
    ExpressionUtils.column(NgramRepetition(ExpressionUtils.expression(tokens), n))
}
