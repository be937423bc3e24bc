package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function, XXH64}
import org.apache.spark.unsafe.Platform
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the sketch/vector hot paths.
  *
  * The pure-`functions` versions of minhash/simhash/cosine are correct but
  * evaluate higher-order lambdas element-at-a-time in the expression
  * interpreter — O(numHashes × |set|) interpreted calls per row. These
  * expressions compute the same values in one tight JVM loop per row
  * (hundreds of times faster at sf0.1), while staying ordinary Catalyst
  * expressions: null-safe, usable in any DataFrame plan, partition-parallel.
  *
  * Codegen: each expression generates a call to its own `compute` method
  * (via `ctx.addReferenceObj`), so children evaluate inside whole-stage
  * codegen and only the tight loop is a virtual call — no
  * CodegenFallback row materialization anywhere in these paths.
  */
object SketchExpressions {

  /** Same 31-bit universal hash family as the MinHash seeds
    * (SplitMix64 mixing). */
  private[graft] def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def minhashSignature(setCol: Column, numHashes: Int): Column =
    GraftColumnBridge.column(
      MinHashSignature(GraftColumnBridge.expression(setCol), numHashes))

  def simhash64(tokensCol: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(tokensCol)))

  def srpCode64(nanosCol: Column): Column =
    GraftColumnBridge.column(SrpCode64(GraftColumnBridge.expression(nanosCol)))

  def jlProjectMicros(nanosCol: Column, k: Int): Column =
    GraftColumnBridge.column(
      JlProjectMicros(GraftColumnBridge.expression(nanosCol), k))

  def srpCodeWide(vecCol: Column, width: Int): Column =
    GraftColumnBridge.column(
      SrpCodeWide(GraftColumnBridge.expression(vecCol), width))

  def bitChunks(wordsCol: Column, width: Int, nChunks: Int): Column =
    GraftColumnBridge.column(
      BitChunks(GraftColumnBridge.expression(wordsCol), width, nChunks))

  def hammingWords(a: Column, b: Column): Column =
    GraftColumnBridge.column(HammingWords(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def firstAgreeChunk(a: Column, b: Column, width: Int, nChunks: Int): Column =
    GraftColumnBridge.column(FirstAgreeChunk(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b),
      width, nChunks))

  def weightedNanoSum(tokensCol: Column, weights: Map[String, Double]): Column =
    GraftColumnBridge.column(WeightedNanoSum(
      GraftColumnBridge.expression(tokensCol), weights))

  def tokenNanoLookupSum(tokensCol: Column, nanos: Map[String, Long],
      defaultNanos: Long): Column =
    GraftColumnBridge.column(TokenNanoLookupSum(
      GraftColumnBridge.expression(tokensCol), nanos, defaultNanos))

  def bigramNanoSum(tokensCol: Column, uniCounts: Map[String, Long],
      biCounts: Map[(String, String), Long], lambda: Double,
      nTokens: Double, vocab: Double): Column =
    GraftColumnBridge.column(BigramNanoSum(
      GraftColumnBridge.expression(tokensCol), uniCounts, biCounts,
      lambda, nTokens, vocab))

  def scaledLongToDouble(v: Column, scale: Int): Column =
    GraftColumnBridge.column(
      ScaledLongToDouble(GraftColumnBridge.expression(v), scale))

  /** Exact 9-dp HALF_UP (away-from-zero) rounding of a double to
    * nano-unit longs, value-identical to Spark's `round(v, 9) * 1e9`
    * and a DECIMAL(27,9) oracle. Float-origin doubles (parquet `float`
    * columns cast up — every embedding element) take a pure-arithmetic
    * path: v·1e9 is EXACT for float-width mantissas (24 + 21 = 45 bits
    * < 53), so boundary ties are exact and HALF_UP is a plain
    * comparison. Full-width doubles (derived values) fall back to the
    * BigDecimal semantics `round` itself uses — the fast product can
    * land on the wrong side of a tie when fl(v·1e9) loses bits. */
  private[graft] def nanosOf(v: Double): Long =
    if (v.toFloat.toDouble == v) {
      val x = v * 1e9
      val f = math.floor(x)
      val r = x - f
      (if (r > 0.5) f + 1 else if (r < 0.5) f
       else if (x > 0) f + 1 else f).toLong
    } else
      new java.math.BigDecimal(java.lang.Double.toString(v))
        .setScale(9, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()

  def cosineSimilarity(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      CosineSimilarity(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def wordShingleHashes(tokensCol: Column, w: Int): Column =
    GraftColumnBridge.column(
      WordShingleHashes(GraftColumnBridge.expression(tokensCol), w))

  def charNgramHashes(textCol: Column, n: Int): Column =
    GraftColumnBridge.column(
      CharNgramHashes(GraftColumnBridge.expression(textCol), n))

  def jaccardSorted(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      JaccardSorted(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def intersectCountSorted(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      IntersectCountSorted(
        GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    GraftColumnBridge.column(
      LshBandKeys(GraftColumnBridge.expression(sig), bands, rowsPerBand))

  def sqDistMicro(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      SqDistMicro(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

/** Input validation for expressions over a single array<string> child. */
trait StringArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${t.sql}")
  }
}

private[functions] object ComputeCodegen {
  /** Java expression converting the boxed `compute` result to the
    * unboxed/JVM type codegen expects for `dataType`. Explicit unboxing —
    * janino does not auto-unbox. */
  def unbox(call: String, dataType: DataType): String = dataType match {
    case DoubleType => s"((java.lang.Double) $call).doubleValue()"
    case LongType => s"((java.lang.Long) $call).longValue()"
    case BooleanType => s"((java.lang.Boolean) $call).booleanValue()"
    case BinaryType => s"((byte[]) $call)"
    case StringType =>
      s"((org.apache.spark.unsafe.types.UTF8String) $call)"
    case _: ArrayType =>
      s"((org.apache.spark.sql.catalyst.util.ArrayData) $call)"
    case _: StructType =>
      s"((org.apache.spark.sql.catalyst.InternalRow) $call)"
    case t => throw new IllegalStateException(s"unsupported codegen type $t")
  }
}

/** Unary expression whose codegen calls `this.compute(child)` through a
  * codegen reference — children stay in whole-stage codegen. */
trait ComputeUnaryCodegen { self: UnaryExpression =>
  /** Boxed-compatible compute over the single non-null child value. */
  def compute(input: Any): Any

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = compute(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this, classOf[ComputeUnaryCodegen].getName)
    // compute may return null (e.g. regex non-match) — re-set isNull, which
    // nullSafeCodeGen declares as an assignable local. When the expression
    // is non-nullable, isNull is a literal and compute never returns null.
    if (nullable) {
      // fresh per-expression local: two of these in one codegen scope
      // (e.g. a wide projection) must not collide on the variable name —
      // a collision fails compilation and drops the whole stage to the
      // interpreted fallback
      val r = ctx.freshName("graftR")
      nullSafeCodeGen(ctx, ev, c => s"""
        Object $r = $ref.compute($c);
        if ($r == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = ${ComputeCodegen.unbox(r, dataType)};
        }""")
    } else
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = ${ComputeCodegen.unbox(s"$ref.compute($c)", dataType)};")
  }
}

/** Binary analogue of [[ComputeUnaryCodegen]]. */
trait ComputeBinaryCodegen { self: BinaryExpression =>
  def compute(l: Any, r: Any): Any

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(l: Any, r: Any): Any = compute(l, r)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this, classOf[ComputeBinaryCodegen].getName)
    if (nullable) {
      val r = ctx.freshName("graftR")
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        Object $r = $ref.compute($a, $b);
        if ($r == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = ${ComputeCodegen.unbox(r, dataType)};
        }""")
    } else
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = ${ComputeCodegen.unbox(s"$ref.compute($a, $b)", dataType)};")
  }
}

/** MinHash signature of a set column — array<string> (elements hashed with
  * xxhash64, seed 42) or array<long> (pre-hashed, e.g. WordShingleHashes
  * output): sig_i = min over elements of (a_i * h + b_i) mod P with h the
  * element hash reduced into [0, P), P = 2^31 - 1. Value-identical to the
  * higher-order-function formulation (same hash family, same seeds) but one
  * pass over the set per row.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ComputeUnaryCodegen {

  private val P = 2147483647L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType | LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string|bigint> input, got ${t.sql}")
  }

  @transient private lazy val fromStrings: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == StringType

  @transient private lazy val as: Array[Long] =
    (1 to numHashes).map(i => (SketchExpressions.mix(i.toLong) & 0x7fffffffL) | 1L).toArray
  @transient private lazy val bs: Array[Long] =
    (1 to numHashes).map(i => SketchExpressions.mix(i.toLong + 7919) & 0x7fffffffL).toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def compute(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h0 =
          if (fromStrings)
            XxHash64Function.hash(arr.getUTF8String(j), StringType, 42L)
          else arr.getLong(j)
        val h = ((h0 % P) + P) % P
        var i = 0
        while (i < numHashes) {
          val v = (as(i) * h + bs(i)) % P
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Distinct xxhash64 (seed 42) values of the word w-shingles of a token
  * array — the fused equivalent of
  * transform(wordShingles(tokens, w), xxhash64): shingle strings are built
  * and hashed inside one loop and never leave the expression, so the plan
  * carries array<long> instead of large string arrays. A doc shorter than
  * w yields one truncated shingle (same convention as Dedup.wordShingles).
  * Output is SORTED ascending — set semantics only, which lets
  * JaccardSorted merge-scan two sets without building hash tables. */
case class WordShingleHashes(child: Expression, w: Int)
    extends UnaryExpression with StringArrayInput with ComputeUnaryCodegen {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def compute(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sep = UTF8String.fromString(" ")
    val nShingles = math.max(n - w + 1, 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long](nShingles * 2)
    val window = new Array[UTF8String](w)
    var i = 0
    while (i < nShingles) {
      var j = 0
      var m = 0
      // SKIP null tokens (concat_ws semantics — the HOF formulation this
      // expression documents as identical skips nulls without a
      // separator; substituting "" would inject a double separator and
      // diverge from Dedup.wordShingles on null-bearing arrays)
      while (j < w && i + j < n) {
        if (!arr.isNullAt(i + j)) {
          window(m) = arr.getUTF8String(i + j)
          m += 1
        }
        j += 1
      }
      val shingle =
        if (m == 0) UTF8String.EMPTY_UTF8
        else if (m == 1) window(0)
        else UTF8String.concatWs(sep, java.util.Arrays.copyOfRange(window, 0, m): _*)
      seen.add(XxHash64Function.hash(shingle, StringType, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

/** Distinct xxhash64 (seed 42) values of the character n-grams of a string
  * — the fused equivalent of transform(charNgrams(text, n), xxhash64).
  * A string shorter than n yields one (whole-string) gram, matching
  * Dedup.charNgrams. Output is SORTED ascending (set semantics only). */
case class CharNgramHashes(child: Expression, n: Int)
    extends UnaryExpression with ComputeUnaryCodegen {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def compute(input: Any): Any = {
    val str = input.asInstanceOf[UTF8String]
    val bytes = str.getBytes
    val totalChars = str.numChars()
    // One UTF-8 walk recording each character's byte offset, then grams
    // hash byte ranges directly. substringSQL per gram re-walks the
    // string from byte 0 on every call (charAt is O(position) for
    // multibyte-capable strings) — O(len²) per row, measured 3.4 s for
    // 5 000 docs at sf0.1 vs ~0.3 s with the offset table.
    val offs = new Array[Int](totalChars + 1)
    var c = 0
    var b = 0
    while (b < bytes.length) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(totalChars) = bytes.length
    val nGrams = math.max(totalChars - n + 1, 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long](nGrams * 2)
    var i = 0
    while (i < nGrams) {
      val start = offs(i)
      val end = offs(math.min(i + n, totalChars))
      // same value as xxhash64(substr(text, i+1, n), seed 42): the hash
      // covers the identical UTF-8 byte slice
      seen.add(XXH64.hashUnsafeBytes(
        bytes, Platform.BYTE_ARRAY_OFFSET + start, end - start, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgramHashes =
    copy(child = newChild)
}

/** 64-bit SimHash of an array<string> token column: bit i of the result is
  * set iff the sum over tokens of ±1 (sign of bit i of xxhash64(token)) is
  * positive. Value-identical to the HOF formulation in Dedup.simhash. */
case class SimHash64(child: Expression)
    extends UnaryExpression with StringArrayInput with ComputeUnaryCodegen {

  override def dataType: DataType = LongType

  override def compute(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = XxHash64Function.hash(arr.getUTF8String(j), StringType, 42L)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** 64-bit sign-random-projection (SRP) code of an exact-integer vector
  * (Charikar's simhash for real vectors): bit j = [Σ_i nanos(i)·s(j,i)
  * > 0] with the ±1 sign matrix s(j, i) = ((j·31 + i·17) mod 97 mod 2)
  * ·2 − 1 regenerated per element — the same matrix as the s21 JL
  * projection, never stored. Input is the s29/s21 nano-unit long array
  * (each element the 9-dp-rounded component × 1e9), so the sign test is
  * exact integer arithmetic and a DECIMAL oracle is decision-identical.
  * One tight 64×dim loop per row; the equivalent nested higher-order
  * `aggregate(transform(zip_with(…)))` runs interpreted with per-element
  * boxing and measured 17× slower at the same plan shape. */
case class SrpCode64(child: Expression)
    extends UnaryExpression with ComputeUnaryCodegen {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def compute(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val v = new Array[Long](n)
    var i = 0
    while (i < n) {
      v(i) = if (arr.isNullAt(i)) 0L else arr.getLong(i)
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      var sum = 0L
      var k = 0
      while (k < n) {
        // s(j,k) = ((31j + 17k) mod 97 mod 2)*2 - 1 — operands stay
        // far under Long range
        val sgn = ((31L * j + 17L * k) % 97 % 2) * 2 - 1
        sum += v(k) * sgn
        k += 1
      }
      if (sum > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SrpCode64 =
    copy(child = newChild)

  override def prettyName: String = "srp_code64"
}

/** k-dim Johnson–Lindenstrauss ±1 projection of an exact-integer
  * nano-unit vector, rounded to 6-dp doubles (the s21 contract): out(j)
  * = micro(Σ_i nanos(i)·s(j,i)) / 1e6 with the same never-stored sign
  * matrix as [[SrpCode64]], s(j,i) = ((j·31 + i·17) mod 97 mod 2)·2 − 1,
  * and micro(x) = half-away-from-zero rounding of x/1000 in pure longs
  * — identical values to a DECIMAL(27,9)-accumulating oracle.
  *
  * All k dot products run in ONE pass over the vector per row. The
  * equivalent per-dim `aggregate(zip_with(…, transform(sequence(…))))`
  * regenerates the sign sequence through interpreted higher-order
  * lambdas with per-element boxing — measured ~7× slower than DuckDB at
  * sf1 and NOT shrinking with scale (the one perf-weak r10 entry);
  * this expression is a plain codegen-friendly scalar, so the whole
  * projection stays inside WholeStageCodegen. */
case class JlProjectMicros(child: Expression, k: Int)
    extends UnaryExpression with ComputeUnaryCodegen {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) | ArrayType(DoubleType, _) if k >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires k >= 1, got $k")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> or array<double> input, " +
        s"got ${t.sql}")
  }

  private lazy val fromDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def compute(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sums = new Array[Long](k)
    val dbl = fromDouble
    var i = 0
    while (i < n) {
      val v =
        if (arr.isNullAt(i)) 0L
        else if (dbl) SketchExpressions.nanosOf(arr.getDouble(i))
        else arr.getLong(i)
      var j = 0
      while (j < k) {
        // s(j,i) = ((31j + 17i) mod 97 mod 2)*2 - 1 — operands stay far
        // under Long range (|nanos| <= ~1e10 per element, n <= ~1e4)
        val sgn = ((31L * j + 17L * i) % 97 % 2) * 2 - 1
        sums(j) += v * sgn
        j += 1
      }
      i += 1
    }
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      val s = sums(j)
      // integer half-away-from-zero to micro units; /1e6 then yields
      // the double nearest the 6-dp decimal (t14/s21 replay contract)
      val micro = if (s >= 0) (s + 500L) / 1000L else -((-s + 500L) / 1000L)
      out(j) = micro / 1e6
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): JlProjectMicros =
    copy(child = newChild)

  override def prettyName: String = "jl_project_micros"
}

/** `width`-bit sign-random-projection code as packed little-endian
  * 64-bit words (word q carries global bits [64q, 64q+64), bit j at
  * position j−64q): the arbitrary-width generalization of
  * [[SrpCode64]], same never-stored sign matrix s(j,i) = ((j·31 +
  * i·17) mod 97 mod 2)·2 − 1 with j now ranging to width−1 — word 0 of
  * a wide code equals [[SrpCode64]]'s long exactly. Input is
  * array<double> (round-9-to-nanos inlined via
  * [[SketchExpressions.nanosOf]], exact vs a DECIMAL oracle) or the
  * pre-converted nano-unit array<long>. Signature WIDTH is the
  * density-scaling lever for banded hamming joins: per-chunk key space
  * 2^(width/chunks) must stay ahead of the corpus, or bucket occupancy
  * — and the within-bucket candidate term — grows linearly with n
  * (the s29 sf10 creep). */
case class SrpCodeWide(child: Expression, width: Int)
    extends UnaryExpression with ComputeUnaryCodegen {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) | ArrayType(DoubleType, _)
        if width >= 1 && width <= 1024 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName width $width out of range [1, 1024]")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> or array<double> input, " +
        s"got ${t.sql}")
  }

  private lazy val fromDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def compute(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val v = new Array[Long](n)
    val dbl = fromDouble
    var i = 0
    while (i < n) {
      v(i) =
        if (arr.isNullAt(i)) 0L
        else if (dbl) SketchExpressions.nanosOf(arr.getDouble(i))
        else arr.getLong(i)
      i += 1
    }
    val words = new Array[Long]((width + 63) / 64)
    var j = 0
    while (j < width) {
      var sum = 0L
      var i2 = 0
      while (i2 < n) {
        val sgn = ((31L * j + 17L * i2) % 97 % 2) * 2 - 1
        sum += v(i2) * sgn
        i2 += 1
      }
      if (sum > 0) words(j >> 6) |= (1L << (j & 63))
      j += 1
    }
    new GenericArrayData(words)
  }

  override protected def withNewChildInternal(newChild: Expression): SrpCodeWide =
    copy(child = newChild)

  override def prettyName: String = "srp_code_wide"
}

/** Split a packed `width`-bit signature (array of little-endian 64-bit
  * words, [[SrpCodeWide]] layout) into `nChunks` contiguous bit chunks
  * for pigeonhole banding: chunk b covers bits [b·(width/nChunks),
  * …) with the last chunk absorbing the remainder; keys extract across
  * word boundaries. A pair within hamming radius nChunks−1 agrees on
  * at least one chunk — full recall by construction. Chunks wider than
  * 63 bits (e.g. nChunks=1: one chunk = the whole signature, the
  * maxHamming=0 exact-match band) XOR-fold into one signed long — a
  * fold can only MERGE buckets, so recall is still structural. */
case class BitChunks(child: Expression, width: Int, nChunks: Int)
    extends UnaryExpression with ComputeUnaryCodegen {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if nChunks >= 1 && width >= nChunks =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs 1 <= nChunks <= width, " +
        s"got width=$width nChunks=$nChunks")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def bitsAt(words: ArrayData, start: Int, len: Int): Long = {
    // little-endian across words: bit g of the signature is word g/64,
    // position g%64
    val w0 = start >> 6
    val off = start & 63
    val lo = (words.getLong(w0) >>> off)
    val hi =
      if (off + len <= 64 || w0 + 1 >= words.numElements()) 0L
      else words.getLong(w0 + 1) << (64 - off)
    (lo | hi) & (if (len == 64) -1L else (1L << len) - 1)
  }

  override def compute(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val base = width / nChunks
    val out = new Array[Long](nChunks)
    var b = 0
    while (b < nChunks) {
      val start = b * base
      val len = if (b == nChunks - 1) width - start else base
      // last chunk may exceed 63 bits when the remainder piles up; fold
      // the overflow in with XOR so the key stays one signed long while
      // still depending on every bit (a fold can only MERGE buckets —
      // recall is unaffected, candidates grow negligibly)
      out(b) =
        if (len <= 63) bitsAt(words, start, len)
        else {
          var k = 0L
          var s = start
          var rem = len
          while (rem > 0) {
            val take = math.min(63, rem)
            k ^= bitsAt(words, s, take)
            s += take
            rem -= take
          }
          k
        }
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): BitChunks =
    copy(child = newChild)

  override def prettyName: String = "bit_chunks"
}

/** Index of the FIRST chunk (see [[BitChunks]]) on which two packed
  * `width`-bit signatures agree, −1 if none: the distinct-free dedup
  * key for banded hamming self-joins — a pair found in band b is kept
  * iff b is its first agreeing band, so each pair survives exactly
  * once without shuffling the candidate set through a distinct. */
case class FirstAgreeChunk(left: Expression, right: Expression,
    width: Int, nChunks: Int)
    extends BinaryExpression with ComputeBinaryCodegen {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _))
          if nChunks >= 1 && width >= nChunks =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs 1 <= nChunks <= width, " +
            s"got width=$width nChunks=$nChunks")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = LongType

  private def word(a: ArrayData, q: Int): Long =
    if (q < a.numElements() && !a.isNullAt(q)) a.getLong(q) else 0L

  override def compute(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val base = width / nChunks
    var c = 0
    while (c < nChunks) {
      val start = c * base
      val end = if (c == nChunks - 1) width else start + base
      // chunk-equal iff no differing bit in [start, end)
      var agree = true
      var g = start
      while (agree && g < end) {
        val q = g >> 6
        val off = g & 63
        val take = math.min(64 - off, end - g)
        val mask =
          if (take == 64) -1L else ((1L << take) - 1) << off
        if (((word(a, q) ^ word(b, q)) & mask) != 0L) agree = false
        g += take
      }
      if (agree) return c.toLong
      c += 1
    }
    -1L
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstAgreeChunk =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "first_agree_chunk"
}

/** Σ over tokens t of the exact 9-dp rounding of weight(t)/n — in NANO
  * units (one long per row), where n is the token count and missing
  * tokens weigh 0: the linear-classifier scoring loop (t15 / fastText
  * shape) as one compiled pass. Value-identical to the
  * `aggregate(toks, 0.0::DECIMAL(27,9), (acc, t) -> acc +
  * round(coalesce(wmap[t], 0.0) / n, 9))` formulation (per-term round-9
  * makes terms exact multiples of 1e-9, so the nano-long sum IS the
  * decimal sum; [[SketchExpressions.nanosOf]]'s BigDecimal path matches
  * `round`'s own semantics on the full-width quotient) — but the HOF
  * version runs interpreted with a per-token BigDecimal cast+add AND an
  * O(|vocab|) literal-map scan per lookup; this is a hash lookup and a
  * long add inside whole-stage codegen. */
case class WeightedNanoSum(child: Expression, weights: Map[String, Double])
    extends UnaryExpression with StringArrayInput with ComputeUnaryCodegen {

  override def dataType: DataType = LongType

  // UTF8String-keyed view of the weight table: one conversion at plan
  // time instead of a String decode per token per row
  @transient private lazy val table: java.util.HashMap[UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](
      weights.size * 2)
    weights.foreach { case (k, v) =>
      m.put(UTF8String.fromString(k), java.lang.Double.valueOf(v))
    }
    m
  }

  override def compute(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return 0L
    var s = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = table.get(arr.getUTF8String(i))
        if (w != null && w.doubleValue() != 0.0)
          s += SketchExpressions.nanosOf(w.doubleValue() / n)
      }
      i += 1
    }
    s
  }

  override protected def withNewChildInternal(newChild: Expression): WeightedNanoSum =
    copy(child = newChild)

  override def prettyName: String = "weighted_nano_sum"
}

/** Σ over tokens t of a PRE-ROUNDED nano-long table value (default for
  * out-of-vocabulary tokens) — the unigram-LM scoring loop (t13 / CCNet
  * perplexity shape) as one compiled pass. The per-token term of the
  * explode → join formulation, `round(-ln((c+1)/(N+V)), 9)` summed in
  * DECIMAL(27,9), depends only on the token's reference count, so every
  * distinct vocabulary entry's nano value is computed ONCE at plan time
  * ([[SketchExpressions.nanosOf]] — the same round-9 ⇒ nano-longs-are-
  * the-decimal-sum identity as [[WeightedNanoSum]]); scoring is then a
  * hash lookup and a long add per token inside whole-stage codegen, with
  * no (doc, token) explode and no shuffled join against the count table. */
case class TokenNanoLookupSum(child: Expression, nanos: Map[String, Long],
    defaultNanos: Long)
    extends UnaryExpression with StringArrayInput with ComputeUnaryCodegen {

  override def dataType: DataType = LongType

  @transient private lazy val table: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](nanos.size * 2)
    nanos.foreach { case (k, v) =>
      m.put(UTF8String.fromString(k), java.lang.Long.valueOf(v))
    }
    m
  }

  override def compute(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      // a null element scores as out-of-vocabulary — parity with the
      // join path, where a null token misses the count table and
      // coalesces to count 0
      val v = if (arr.isNullAt(i)) null else table.get(arr.getUTF8String(i))
      s += (if (v == null) defaultNanos else v.longValue())
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenNanoLookupSum =
    copy(child = newChild)

  override def prettyName: String = "token_nano_lookup_sum"
}

/** Σ over ADJACENT token pairs (w1, w2) of the round-9 nano-long of the
  * interpolated bigram NLL
  *   −ln( λ·(c(w1,w2)+1)/(c(w1)+V) + (1−λ)·(c(w2)+1)/(N+V) )
  * — the bigram-LM scoring loop (t18) as one compiled pass, replacing
  * the bigram explode + THREE shuffled count joins. Value-identical to
  * that dataflow: the floating-point evaluation order matches the
  * Column formulation term for term, and rounding goes through
  * [[SketchExpressions.nanosOf]] (the same round-9 ⇒ nano-longs-are-
  * the-decimal-sum identity as [[TokenNanoLookupSum]]).
  *
  * Reference bigrams pre-round at plan time (one nano per table entry);
  * an UNSEEN pair's NLL depends only on (c(w1), c(w2)) — far fewer
  * distinct values than distinct pairs — so those round-9 results are
  * memoized at runtime in a shared map keyed by the packed count pair,
  * bounded by |distinct count values|², not by corpus bigrams. */
case class BigramNanoSum(child: Expression,
    uniCounts: Map[String, Long], biCounts: Map[(String, String), Long],
    lambda: Double, nTokens: Double, vocab: Double)
    extends UnaryExpression with StringArrayInput with ComputeUnaryCodegen {

  override def dataType: DataType = LongType

  @transient private lazy val uniTable: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](uniCounts.size * 2)
    uniCounts.foreach { case (k, v) =>
      m.put(UTF8String.fromString(k), java.lang.Long.valueOf(v))
    }
    m
  }

  // two-level (w1 → (w2 → nano)) — no per-pair key allocation at runtime
  @transient private lazy val biNano:
      java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, java.lang.Long]] = {
    val m = new java.util.HashMap[
      UTF8String, java.util.HashMap[UTF8String, java.lang.Long]]()
    biCounts.foreach { case ((w1, w2), cb) =>
      val c1 = uniCounts.getOrElse(w1, 0L)
      val c2 = uniCounts.getOrElse(w2, 0L)
      m.computeIfAbsent(UTF8String.fromString(w1),
          _ => new java.util.HashMap[UTF8String, java.lang.Long]())
        .put(UTF8String.fromString(w2),
          java.lang.Long.valueOf(nanoNll(cb, c1, c2)))
    }
    m
  }

  // unseen pairs: cb = 0, so the NLL is a function of (c1, c2) alone —
  // memoized across rows AND tasks (the expression instance is shared)
  @transient private lazy val unseenMemo =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Long, java.lang.Long]()

  // approximate entry count for the MemoCap check: CHM.size() traverses
  // counter cells, which on a corpus with many unseen pairs turns every
  // miss into an O(cells) walk (ADVICE r12). A LongAdder bumped on each
  // successful insert is O(1); racy double-puts of the same key may
  // overcount slightly, which only makes the backstop trip earlier.
  @transient private lazy val unseenMemoCount =
    new java.util.concurrent.atomic.LongAdder()

  private def nanoNll(cb: Long, c1: Long, c2: Long): Long =
    SketchExpressions.nanosOf(-math.log(
      lambda * ((cb + 1L).toDouble / (c1.toDouble + vocab)) +
        (1.0 - lambda) * ((c2 + 1L).toDouble / (nTokens + vocab))))

  override def compute(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var s = 0L
    var i = 0
    while (i < n - 1) {
      // a null token misses every count table — parity with the join
      // path, where a null key matches nothing and coalesces to 0
      val w1 = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      val w2 = if (arr.isNullAt(i + 1)) null else arr.getUTF8String(i + 1)
      val inner = if (w1 == null) null else biNano.get(w1)
      val hit = if (inner == null || w2 == null) null else inner.get(w2)
      if (hit != null) s += hit.longValue()
      else {
        val u1 = if (w1 == null) null else uniTable.get(w1)
        val u2 = if (w2 == null) null else uniTable.get(w2)
        val c1 = if (u1 == null) 0L else u1.longValue()
        val c2 = if (u2 == null) 0L else u2.longValue()
        // the packed memo key is only injective below 2^31 per count —
        // a web-scale reference's hot token can exceed that, so compute
        // directly rather than risk a silent collision. The memo is
        // also size-capped: distinct (c1, c2) pairs are usually few
        // (count VALUES, not tokens), but a diverse corpus against a
        // near-gate vocabulary could otherwise grow an executor-lifetime
        // map without bound — past the cap, hits still win and misses
        // compute directly.
        val memoizable = ((c1 | c2) >>> 31) == 0L
        val key = if (memoizable) java.lang.Long.valueOf((c1 << 32) | c2)
          else null
        val cached = if (memoizable) unseenMemo.get(key) else null
        s += (if (cached != null) cached.longValue()
        else {
          val v = nanoNll(0L, c1, c2)
          if (memoizable && unseenMemoCount.sum < BigramNanoSum.MemoCap &&
              unseenMemo.putIfAbsent(key, java.lang.Long.valueOf(v)) == null)
            unseenMemoCount.increment()
          v
        })
      }
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  override protected def withNewChildInternal(newChild: Expression): BigramNanoSum =
    copy(child = newChild)

  override def prettyName: String = "bigram_nano_sum"
}

object BigramNanoSum {
  /** Unseen-pair memo entry cap (~48 MB worst case of boxed
    * entries) — a backstop, not a tuning knob. */
  private[functions] val MemoCap: Int = 1 << 20
}

/** Correctly-rounded double of `child · 10^-scale` over a LONG child —
  * exactly `cast(decimal_of_scale(child) AS double)`, i.e. what the
  * nano/micro fixed-point paths need when converting an integer-exact
  * sum to the double an external oracle computes. Replaces the
  * `cast(decimal(38,s)) / 10^s` divide whose QUOTIENT type (and
  * null/overflow behavior past ~1e8 units) depends on the session conf
  * `spark.sql.decimalOperations.allowPrecisionLoss` (ADVICE r12): this
  * expression is a pure function of the long, independent of any
  * decimal-arithmetic conf. `BigDecimal.valueOf(v, scale).doubleValue()`
  * is round-to-nearest per IEEE 754, the same conversion Spark's
  * `Cast(decimal → double)` performs. */
case class ScaledLongToDouble(child: Expression, scale: Int)
    extends UnaryExpression with ComputeUnaryCodegen {
  require(scale >= 0 && scale <= 18, s"bad scale $scale")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint input, got ${t.sql}")
  }

  override def compute(input: Any): Any =
    java.lang.Double.valueOf(
      java.math.BigDecimal.valueOf(input.asInstanceOf[Long], scale)
        .doubleValue())

  override protected def withNewChildInternal(
      newChild: Expression): ScaledLongToDouble = copy(child = newChild)

  override def prettyName: String = "scaled_long_to_double"
}

/** Hamming distance between two equal-width packed bit signatures
  * ([[SrpCodeWide]] layout): Σ bitCount(a(q) XOR b(q)). Extra words on
  * either side count all their set bits (differing-width inputs are a
  * caller bug that surfaces as distance, never silently truncates). */
case class HammingWords(left: Expression, right: Expression)
    extends BinaryExpression with ComputeBinaryCodegen {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = LongType

  override def compute(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    val n = math.max(na, nb)
    var d = 0L
    var q = 0
    while (q < n) {
      val wa = if (q < na && !a.isNullAt(q)) a.getLong(q) else 0L
      val wb = if (q < nb && !b.isNullAt(q)) b.getLong(q) else 0L
      d += java.lang.Long.bitCount(wa ^ wb)
      q += 1
    }
    d
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingWords =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hamming_words"
}

/** Base for float/double array pairwise math: reads both children as
  * numeric arrays, computes in double. */
trait VectorBinaryExpression extends BinaryExpression with ComputeBinaryCodegen {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  @transient protected lazy val leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient protected lazy val rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def elem(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
}

/** Sequential-order dot product of two numeric arrays (matches the
  * aggregate(zip_with(...)) formulation bit-for-bit: left-to-right
  * double accumulation). Extra elements on the longer side are ignored. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def compute(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += elem(a, i, leftIsFloat) * elem(b, i, rightIsFloat)
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity dot(a,b) / (||a|| * ||b||), all three sums accumulated
  * left-to-right in double — value-identical to
  * dot(a,b)/(sqrt(dot(a,a))*sqrt(dot(b,b))) over the same arrays. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def compute(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = elem(a, i, leftIsFloat)
      val y = elem(b, i, rightIsFloat)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    // zero-norm vectors: 0/0 would be NaN, which Spark orders ABOVE every
    // real score and which passes >= thresholds — a single zero embedding
    // would pollute top-k and mark whole clusters as duplicates. Define
    // cosine-with-zero as 0.0 (no similarity), like Int8Cosine.
    if (na == 0.0 || nb == 0.0) java.lang.Double.valueOf(0.0)
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}


/** Squared Euclidean distance in exact integer MICRO-UNITS: each
  * per-dimension term (a−b)² is quantized to 1e-12 units with the
  * explicit `floor(x·1e12 + 0.5)` formula and summed as a long — an
  * EXACT, order-independent value any engine replays bit-for-bit (the
  * k-means assignment/convergence contract; double accumulation would
  * make argmin ties partitioning-dependent). Range: |terms| ≤ 4e12 per
  * dim — safe for ~2M dims before overflow. Extra elements on the
  * longer side are ignored. */
case class SqDistMicro(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def dataType: DataType = LongType

  override def compute(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = elem(a, i, leftIsFloat) - elem(b, i, rightIsFloat)
      acc += math.floor(d * d * 1e12 + 0.5).toLong
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SqDistMicro =
    copy(left = newLeft, right = newRight)
}

/** Jaccard similarity |A ∩ B| / |A ∪ B| of two SORTED distinct long
  * arrays (WordShingleHashes / CharNgramHashes output) via a linear merge
  * scan — no per-call hash-table builds, unlike
  * size(array_intersect)/size(array_union). Both empty → 0.0. */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression with ComputeBinaryCodegen {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> inputs, got ${l.sql}, ${r.sql}")
    }

  override def compute(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
}


/** |A ∩ B| of two SORTED long arrays by one merge pass — the count-only
  * sibling of [[JaccardSorted]] for asymmetric measures (containment
  * |∩|/|A|). Counting without materializing the intersection array is
  * what makes verifying millions of candidate pairs cheap: built-in
  * array_intersect allocates a hash set and an output array per row. */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends BinaryExpression with ComputeBinaryCodegen {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> inputs, got ${l.sql}, ${r.sql}")
    }

  override def compute(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IntersectCountSorted =
    copy(left = newLeft, right = newRight)
}


/** Band keys of a MinHash signature: key_b = xxhash64 chained over
  * (band index, the band's rowsPerBand signature entries). One loop over
  * the signature — replaces a transform/slice/hash HOF pipeline. Equal
  * (band, entries) → equal key, which is all LSH banding needs. */
case class LshBandKeys(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression with ComputeUnaryCodegen {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def compute(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = XxHash64Function.hash(b.toLong, LongType, 42L)
      var i = b * rowsPerBand
      val end = math.min(i + rowsPerBand, sig.numElements())
      while (i < end) {
        h = XxHash64Function.hash(sig.getLong(i), LongType, h)
        i += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBandKeys =
    copy(child = newChild)
}
