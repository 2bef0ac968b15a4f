package org.apache.spark.sql.graft

import java.util.Arrays

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{
  AbstractDataType, ArrayType, DataType, LongType, StringType
}
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_hashes(tokens, n)`: the DISTINCT n-gram shingle hash set of a
  * token array as array<long>, in one pass with zero intermediate string
  * allocation. Replaces the concat_ws + array_distinct + explode +
  * xxhash64 chain, which materialized every shingle string (the dominant
  * cost of the MinHash/Jaccard pipelines at sf0.1). Token hash = 64-bit
  * polynomial over UTF-8 bytes with a splitmix finalizer; the n-gram hash
  * chains the token hashes order-sensitively. Docs shorter than n tokens
  * contribute their full token sequence as one shingle (same fallback as
  * TextFunctions.shingles).
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(n > 0)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def tokenHash(s: UTF8String): Long = ShingleHashes.tokenHash(s)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val th = new Array[Long](m)
    var i = 0
    while (i < m) { th(i) = tokenHash(arr.getUTF8String(i)); i += 1 }

    val count = if (m < n) 1 else m - n + 1
    val out = new Array[Long](count)
    if (m < n) {
      var c = 0x51ed270b9d4e3e41L
      var j = 0
      while (j < m) { c = MinHashSignatureAgg.mix(c ^ th(j)); j += 1 }
      out(0) = c
    } else {
      i = 0
      while (i < count) {
        var c = 0x51ed270b9d4e3e41L
        var j = 0
        while (j < n) { c = MinHashSignatureAgg.mix(c ^ th(i + j)); j += 1 }
        out(i) = c
        i += 1
      }
    }
    // distinct via sort + dedup (primitive, no boxing)
    Arrays.sort(out)
    var w = 0
    i = 0
    while (i < out.length) {
      if (i == 0 || out(i) != out(i - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(Arrays.copyOf(out, w))
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `positioned_shingle_hashes(tokens, n)`: the n-gram hash at EVERY
  * position as array<long> (index i = hash of tokens[i, i+n)), same
  * token/chain hash as [[ShingleHashes]] so the two key spaces agree.
  * Unlike the distinct-set variant this keeps order and multiplicity —
  * the input to positional operators (repeated-span detection), where
  * `posexplode` recovers (position, gram) pairs. Docs shorter than n
  * yield an EMPTY array: a positional n-gram doesn't exist, and the
  * short-doc whole-text fallback would fabricate a position.
  */
case class PositionedShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(n > 0)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](m)
    var i = 0
    while (i < m) { th(i) = ShingleHashes.tokenHash(arr.getUTF8String(i)); i += 1 }
    val count = m - n + 1
    val out = new Array[Long](count)
    i = 0
    while (i < count) {
      var c = 0x51ed270b9d4e3e41L
      var j = 0
      while (j < n) { c = MinHashSignatureAgg.mix(c ^ th(i + j)); j += 1 }
      out(i) = c
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): PositionedShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  /** 64-bit token hash shared by every shingle-keyed operator
    * ([[ShingleHashes]], [[NgramRepetition]]): FNV-1a over the UTF-8
    * bytes, finished with the splitmix mixer. One definition so the
    * n-gram key spaces of dedup and repetition scoring cannot drift.
    */
  private[graft] def tokenHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h = (h ^ bytes(i)) * 0x100000001b3L; i += 1 }
    MinHashSignatureAgg.mix(h)
  }
}

object ShingleHashesFn {
  def shingle_hashes(tokens: Column, n: Int): Column =
    ExpressionUtils.column(ShingleHashes(ExpressionUtils.expression(tokens), n))

  def positioned_shingle_hashes(tokens: Column, n: Int): Column =
    ExpressionUtils.column(PositionedShingleHashes(ExpressionUtils.expression(tokens), n))
}
