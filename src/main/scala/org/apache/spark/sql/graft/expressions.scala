package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Whole-stage-codegen'd dot product over two array<double> columns.
  *
  * The built-in route (`aggregate(zip_with(a, b, _*_), ...)`) allocates an
  * intermediate array and evaluates a lambda per element in the
  * interpreter; inside an O(n^2) similarity join that is the bottleneck.
  * This expression compiles to a tight primitive loop over the unsafe
  * array data — the "custom Catalyst Expression beats UDF beats anything
  * else" rung of the extension ladder.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd splitmix64 fold over a slice of an array<long> column —
  * the LSH band-bucket hash. Replaces
  * `xxhash64(slice(signature, start, len).cast("string"))`, which rendered
  * every band of every signature to UTF-8 per row (the hottest allocation
  * in the minhash dedup loop); this folds the longs in place: h = mix(seed)
  * then h = mix(h ^ elem) per element — no slice array, no string.
  */
case class LongArraySliceHash(child: Expression, start: Int, len: Int, seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.LongType))

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val end = math.min(start + len, a.numElements())
    var h = MinHashSignatureAgg.mix(seed)
    var i = start
    while (i < end) { h = MinHashSignatureAgg.mix(h ^ a.getLong(i)); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val end = ctx.freshName("end")
      val h = ctx.freshName("h")
      val z = ctx.freshName("z")
      // splitmix64 finalizer inlined (public-domain mixer, same constants
      // as MinHashSignatureAgg.mix)
      def mix(in: String, out: String): String =
        s"""
           |long $z = $in + 0x9E3779B97F4A7C15L;
           |$z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
           |$z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
           |$out = $z ^ ($z >>> 31);
         """.stripMargin
      s"""
         |int $end = java.lang.Math.min($start + $len, $a.numElements());
         |long $h;
         |{ ${mix(s"${seed}L", h)} }
         |for (int $i = $start; $i < $end; $i++) {
         |  long ${z}_in = $h ^ $a.getLong($i);
         |  { ${mix(s"${z}_in", h)} }
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LongArraySliceHash =
    copy(child = newChild)
}

object GraftExpressions {

  /** `dot(a, b)` as a Column — summation order is the plain left-to-right
    * loop, matching DuckDB's list_dot_product for oracle bit-equality.
    */
  def arrayDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      ArrayDotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** splitmix fold of `arr[start, start+len)` (0-based), salted by `seed`. */
  def longSliceHash(arr: Column, start: Int, len: Int, seed: Long): Column =
    ExpressionUtils.column(
      LongArraySliceHash(ExpressionUtils.expression(arr), start, len, seed))

  /** Register `array_dot` for SQL text queries on an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot", exprs => ArrayDotProduct(exprs(0), exprs(1)), "built-in")
}
