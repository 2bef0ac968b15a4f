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

/** 64-bit SimHash over a token array: FNV-1a per token, signed bit votes,
  * sign vector as the signature — identical values to the Scala UDF it
  * replaces, but evaluated on the unsafe array data with no Seq[String]
  * conversion per row (the hottest remaining UDF after round 2's
  * shingle/minhash promotions).
  */
case class SimHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.StringType))

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.SimHash64.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** FNV-1a over UTF-16 code units (matching String.charAt semantics of
    * the original UDF), +/-1 votes per bit, majority sign.
    */
  def compute(toks: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      if (!toks.isNullAt(t)) {
        val s = toks.getUTF8String(t).toString
        var h = 0xcbf29ce484222325L
        var i = 0
        while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
}

/** 64-bit FNV-1a fingerprint of normalized text (lowercase, trimmed,
  * whitespace collapsed) — the 8-byte dedup key. Beyond skipping the UDF
  * conversion layer, the whitespace regex is compiled once per JVM
  * instead of once per row (String.replaceAll recompiles every call).
  */
case class Fnv1aFingerprint(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(input: Any): Any =
    Fnv1aFingerprint.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.Fnv1aFingerprint.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Fnv1aFingerprint =
    copy(child = newChild)
}

object Fnv1aFingerprint {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  def compute(text: org.apache.spark.unsafe.types.UTF8String): Long = {
    val normalized = ws.matcher(text.toString.toLowerCase.trim).replaceAll(" ")
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < normalized.length) {
      h ^= normalized.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}

/** 32-bit FNV-1a over Unicode CODE POINTS (not UTF-8 bytes, not UTF-16
  * units) — the engine-portable token hash for the hashing-trick feature
  * spaces. Code points are the one string unit every engine agrees on:
  * DuckDB strings are codepoint-indexed (`length`/`substr`/`unicode`),
  * so a SQL oracle can fold the identical hash with plain BIGINT
  * arithmetic (32-bit state × 24-bit prime < 2⁵⁷ never overflows),
  * while byte-level FNV (see [[Fnv1aFingerprint]]) cannot be re-derived
  * in SQL for multi-byte text. Result is the unsigned 32-bit hash in a
  * long.
  */
case class CodePointFnv32(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(input: Any): Any =
    CodePointFnv32.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.CodePointFnv32.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): CodePointFnv32 =
    copy(child = newChild)
}

object CodePointFnv32 {
  def compute(text: org.apache.spark.unsafe.types.UTF8String): Long =
    computeString(text.toString)

  /** Scalar twin for driver/UDF callers (broadcast-model scoring). */
  def computeString(s: String): Long = {
    var h = 2166136261L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = ((h ^ cp) * 16777619L) & 0xFFFFFFFFL
      i += Character.charCount(cp)
    }
    h
  }
}

/** Random-hyperplane LSH bucket id for one table: sign bit per plane over
  * a dot product with the embedding. The plane matrix for the table is a
  * reference object embedded in the generated code, so the per-row loop
  * is a tight primitive nest with no closure or Seq boxing.
  */
case class LshHyperplaneBucket(child: Expression, planes: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullSafeEval(input: Any): Any =
    LshHyperplaneBucket.compute(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.LshHyperplaneBucket.compute($a, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshHyperplaneBucket =
    copy(child = newChild)
}

object LshHyperplaneBucket {
  def compute(v: ArrayData, planes: Array[Array[Double]]): Long = {
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(plane.length, v.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) { dot += plane(i) * v.getDouble(i); i += 1 }
      if (dot > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
}

/** Whitespace tokenizer: byte-identical to
  * `split(str, "\\s+")` (Java `Pattern.split(s, -1)`), evaluated as a
  * single byte scan over the UTF-8 payload. Java's `\s` is exactly the
  * six ASCII chars [ \t\n\x0B\f\r]; all are single-byte in UTF-8 and a
  * UTF-8 continuation byte is always >= 0x80, so byte positions ARE
  * char positions for the separator and every emitted slice is valid
  * UTF-8. The built-in `StringSplit` route pays, per row:
  * `UTF8String.toString` (UTF-8 -> UTF-16 copy), `Pattern.compile`
  * (String.split has no fast path for a 3-char regex), the regex
  * engine, a `String[]`, and a UTF-16 -> UTF-8 re-encode per token.
  * This expression pays one `getBytes` (usually a reference, a copy
  * only for offset-backed buffers) and offset-sliced `fromBytes` views.
  * Java split semantics preserved exactly: leading empty token when the
  * input starts with whitespace, trailing empty token when it ends with
  * whitespace (limit -1), `[""]` for the empty string, and `[input]`
  * when no separator occurs (pinned byte-for-byte vs the regex form by
  * TextKernelsSuite).
  */
case class WsSplit(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)

  // match StringSplit.dataType: ArrayType(str.dataType, containsNull = false)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WsSplit.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.WsSplit.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): WsSplit =
    copy(child = newChild)
}

object WsSplit {
  import org.apache.spark.unsafe.types.UTF8String

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    var i = 0
    while (i < n && !isWs(bytes(i))) i += 1
    // no separator anywhere (covers the empty string): Java returns [input]
    if (i == n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Any](s))
    val out = new java.util.ArrayList[AnyRef](8)
    out.add(UTF8String.fromBytes(bytes, 0, i)) // may be the leading empty token
    while (i < n) {
      // i sits on a separator byte: skip the run, then take the next token
      while (i < n && isWs(bytes(i))) i += 1
      val start = i
      while (i < n && !isWs(bytes(i))) i += 1
      out.add(UTF8String.fromBytes(bytes, start, i - start))
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** Whitespace token COUNT: integer-identical to
  * `size(split(s, "\\s+"))` — i.e. `1 + (number of \s runs)` under Java
  * split semantics (empty string → 1, no separator → 1) — without
  * allocating the token array, as one byte scan. Callers that only need
  * the count (corpus length stats, density signals) skip the array
  * construction AND the `lower()` pass entirely: Unicode lowercasing
  * never maps any codepoint to or from the six ASCII `\s` chars, so the
  * segment count of `lower(x)` equals that of `x` (pinned, with the
  * lower-invariance, by TextKernelsSuite). IntegerType to stay
  * schema-identical with `size(...)`.
  */
case class WsTokenCount(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullSafeEval(input: Any): Any =
    WsTokenCount.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.WsTokenCount.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): WsTokenCount =
    copy(child = newChild)
}

object WsTokenCount {
  import org.apache.spark.unsafe.types.UTF8String

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  def compute(s: UTF8String): Int = {
    val bytes = s.getBytes
    val n = bytes.length
    var count = 1
    var i = 0
    while (i < n) {
      if (isWs(bytes(i))) {
        count += 1
        i += 1
        while (i < n && isWs(bytes(i))) i += 1
      } else i += 1
    }
    count
  }
}

/** Whitespace collapse: byte-identical to
  * `regexp_replace(str, "\\s+", " ")` (each run of the six ASCII `\s`
  * chars replaced by one 0x20), as a single byte scan — no UTF-16 round
  * trip, no regex engine, no StringBuffer. Returns the input string
  * object unchanged when no run needs rewriting. Same UTF-8 safety
  * argument as [[WsSplit]]; pinned byte-for-byte vs the regex form by
  * TextKernelsSuite.
  */
case class CollapseWs(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.StringType)

  override def dataType: DataType = org.apache.spark.sql.types.StringType

  override def nullSafeEval(input: Any): Any =
    CollapseWs.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.CollapseWs.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): CollapseWs =
    copy(child = newChild)
}

object CollapseWs {
  import org.apache.spark.unsafe.types.UTF8String

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  def compute(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val n = bytes.length
    // change needed only where a run is longer than 1 or a non-space \s
    // char occurs; otherwise return the input unchanged (same object)
    var i = 0
    var changed = false
    while (i < n && !changed) {
      val b = bytes(i)
      if (b == 0x20) { if (i + 1 < n && isWs(bytes(i + 1))) changed = true }
      else if (isWs(b)) changed = true
      i += 1
    }
    if (!changed) return s
    val out = new Array[Byte](n)
    var o = 0
    i = 0
    while (i < n) {
      val b = bytes(i)
      if (isWs(b)) {
        out(o) = 0x20
        o += 1
        i += 1
        while (i < n && isWs(bytes(i))) i += 1
      } else {
        out(o) = b
        o += 1
        i += 1
      }
    }
    UTF8String.fromBytes(out, 0, o)
  }
}

/** Non-deterministic identity: evaluates to its child unchanged (both
  * interpreted and codegen paths delegate straight to the child, so the
  * hot path stays inside whole-stage codegen), but `deterministic =
  * false` stops the optimizer from duplicating the aliased child —
  * `PushDownPredicates` will not substitute the alias into predicates it
  * pushes through the projection, and `InferFiltersFromGenerate`'s
  * inferred `size(x) > 0` filter therefore evaluates on the materialized
  * attribute instead of re-deriving the expression (twice) per row.
  * Use to pin ONE evaluation of an expensive projection consumed by both
  * a Generate and sibling expressions — tokenization in the retrieval
  * stack is the motivating case: without the pin the regex split ran 3×
  * per doc (2× in the inferred filter, 1× in the projection).
  *
  * Side effect callers must design around: `deterministic = false` also
  * blocks ALL predicate pushdown through the projection — a caller's
  * `doc_id` filter placed ABOVE an opaque tokenize projection will no
  * longer reach the parquet scan, and Catalyst restricts where
  * non-deterministic expressions may appear (a future call site moving
  * the opaque column into a join key or aggregate would fail analysis).
  * Keep usage confined to Project nodes, and place user filters BELOW
  * the opaque projection (filter the docs DataFrame first, then
  * project) — every current call site (docTokens, scoreWithTable)
  * follows that order.
  */
case class Opaque(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): Opaque =
    copy(child = newChild)
}

object GraftExpressions {

  /** [[Opaque]] as a Column: a zero-cost evaluation barrier for an
    * expensive projection the optimizer would otherwise duplicate.
    */
  def opaque(c: Column): Column =
    ExpressionUtils.column(Opaque(ExpressionUtils.expression(c)))

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

  /** 64-bit SimHash of a token array (codegen'd). */
  def simhash64(tokens: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(tokens)))

  /** FNV-1a fingerprint of normalized text (codegen'd). */
  def fnv1aFingerprint(text: Column): Column =
    ExpressionUtils.column(Fnv1aFingerprint(ExpressionUtils.expression(text)))

  /** `split(s, "\\s+")` as a codegen'd byte scan (see [[WsSplit]]). */
  def wsSplit(text: Column): Column =
    ExpressionUtils.column(WsSplit(ExpressionUtils.expression(text)))

  /** `regexp_replace(s, "\\s+", " ")` as a codegen'd byte scan (see
    * [[CollapseWs]]).
    */
  def collapseWs(text: Column): Column =
    ExpressionUtils.column(CollapseWs(ExpressionUtils.expression(text)))

  /** `size(split(s, "\\s+"))` without the array (see [[WsTokenCount]]). */
  def wsTokenCount(text: Column): Column =
    ExpressionUtils.column(WsTokenCount(ExpressionUtils.expression(text)))

  /** 32-bit codepoint FNV-1a token hash (codegen'd, SQL-re-derivable). */
  def codePointFnv32(token: Column): Column =
    ExpressionUtils.column(CodePointFnv32(ExpressionUtils.expression(token)))

  /** LSH hyperplane sign-bucket for one table's plane matrix (codegen'd). */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    ExpressionUtils.column(
      LshHyperplaneBucket(ExpressionUtils.expression(vec), planes))

  /** Register every graft SQL function as a temp function on an existing
    * session — the same builder table `GraftExtensions` injects at
    * session build, for callers who cannot rebuild their session with
    * `.withExtensions`.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftExtensions.functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
