package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All stride-1 fixed-width window hashes of a string in ONE O(len)
  * character walk (Rabin–Karp) — the decision stream of the ExactSubstr
  * dedup pass (Lee et al. 2021; reference anchor: the dedup contract of
  * core/src/main/scala/com/cardinal/model/query/pipeline/Extractor.scala
  * analogue queries, re-expressed distributed in
  * [[graft.operators.Dedup.duplicatedSubstringSpans]]).
  *
  * Returns `array<long>` of length `len - window + 1` (empty when the
  * string is shorter than `window`): element i is a 64-bit hash of the
  * `window`-character substring starting at character i. The direct
  * formulation — `transform(sequence(...), p => xxhash64(substr(p+1,W)))`
  * — copies W characters and re-hashes them at EVERY position, an
  * O(len·W) projection that was d12's whole cost at sf0.1 (5.7 s for
  * W=30). This expression rolls the polynomial state instead:
  *
  *   h(i+1) = (h(i) − c(i)·B^(W−1))·B + c(i+W)   (mod 2^64)
  *
  * then avalanches each state through the splitmix64 finalizer (a
  * 64-bit bijection, so it cannot introduce collisions beyond the
  * polynomial stage's). B is odd ⇒ invertible mod 2^64 ⇒ two windows
  * collide only when their difference polynomial vanishes mod 2^64 —
  * the same ~2^-64 per-pair posture as the xxhash64 it replaces, and
  * the same documented collision stance as every dedup entry (the
  * DuckDB oracle replays decisions on window TEXT).
  *
  * Positions are CHARACTER indices (matching `substring`/`length`
  * semantics on both engines), so the walk decodes the UTF8String once
  * into a char array — one O(len) allocation per row, amortized over
  * all len windows, vs len allocations of W chars each before.
  */
case class RollingHashWindows(child: Expression, window: Int)
    extends UnaryExpression with ComputeUnaryCodegen {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      if (window <= 0)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: window $window must be positive")
      else TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // FNV-1a's 64-bit prime: odd (invertible mod 2^64), well-dispersed
  private final val B = 0x100000001b3L
  @transient private lazy val bTop: Long = { // B^(window-1) mod 2^64
    var p = 1L; var j = 1
    while (j < window) { p *= B; j += 1 }
    p
  }

  override def compute(input: Any): Any = {
    val cs = input.asInstanceOf[UTF8String].toString.toCharArray
    val n = cs.length
    if (n < window) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - window + 1)
    var h = 0L
    var j = 0
    while (j < window) { h = h * B + cs(j); j += 1 }
    out(0) = mix(h)
    var i = 1
    while (i <= n - window) {
      h = (h - cs(i - 1) * bTop) * B + cs(i + window - 1)
      out(i) = mix(h)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** splitmix64 finalizer — bijective avalanche. */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  override protected def withNewChildInternal(
      newChild: Expression): RollingHashWindows = copy(child = newChild)

  override def prettyName: String = "rolling_hash_windows"
}

object RollingHashWindows {
  def apply(text: Column, window: Int): Column =
    GraftColumnBridge.column(
      new RollingHashWindows(GraftColumnBridge.expression(text), window))
}
