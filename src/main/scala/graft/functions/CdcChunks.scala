package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk spans of a string (Rabin-style CDC — the
  * boundary calculus behind rsync/LBFS and the dedup literature's
  * variable-size chunking): a chunk ends at every character position
  * whose trailing `window`-char polynomial hash is ≡ 0 (mod `divisor`),
  * plus the end of the string. Because the boundary predicate looks
  * only at a local sliding window, chunk boundaries are SHIFT-INVARIANT
  * — inserting text near the front of a document leaves every boundary
  * beyond the insertion's window shadow in place, so downstream
  * chunk-hash dedup still matches the unshifted remainder (the failure
  * mode fixed-window dedup like [[RollingHashWindows]]-based d12 spans
  * cannot see past).
  *
  * Returns `array<struct<start:int, len:int>>` of 1-based,
  * `substring`-compatible chunk spans that concatenate back to the full
  * string; a string shorter than `window` (but non-empty) is one chunk,
  * the empty string has none. Expected chunk length ≈ `divisor` chars.
  *
  * The hash is Σ c_i·257^(w−1−i) mod 1e9+7, rolled in ONE O(len) char
  * walk — and, deliberately, arithmetic a DuckDB oracle can replay
  * per-position with an 8-term nested-mod expression (no 2^64
  * wraparound, which DuckDB BIGINTs refuse). Positions are CHARACTER
  * indices, matching `substring`/`length` on both engines.
  */
case class CdcChunks(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression with ComputeUnaryCodegen {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      if (window <= 0 || divisor <= 0)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: window $window and divisor $divisor must be positive")
      else TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("start", IntegerType, nullable = false),
      StructField("len", IntegerType, nullable = false))),
    containsNull = false)

  private final val B = 257L
  private final val M = 1000000007L // prime; B·M < 2^63, no wraparound
  @transient private lazy val bTop: Long = { // B^(window-1) mod M
    var p = 1L; var j = 1
    while (j < window) { p = p * B % M; j += 1 }
    p
  }

  override def compute(input: Any): Any = {
    val cs = input.asInstanceOf[UTF8String].toString.toCharArray
    val n = cs.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val spans = Array.newBuilder[Any]
    var start = 0 // 0-based chunk start
    if (n >= window) {
      var h = 0L
      var j = 0
      while (j < window) { h = (h * B + cs(j)) % M; j += 1 }
      var p = window - 1 // 0-based end of the current window
      while (p < n) {
        if (h % divisor == 0) {
          spans += new GenericInternalRow(
            Array[Any](start + 1, p - start + 1))
          start = p + 1
        }
        p += 1
        if (p < n) {
          h = ((h - cs(p - window) * bTop) % M + M) % M
          h = (h * B + cs(p)) % M
        }
      }
    }
    if (start < n) // tail (or the whole string when n < window)
      spans += new GenericInternalRow(Array[Any](start + 1, n - start))
    new GenericArrayData(spans.result())
  }

  override protected def withNewChildInternal(
      newChild: Expression): CdcChunks = copy(child = newChild)

  override def prettyName: String = "cdc_chunks"
}

object CdcChunks {
  def apply(text: Column, window: Int, divisor: Int): Column =
    GraftColumnBridge.column(
      new CdcChunks(GraftColumnBridge.expression(text), window, divisor))
}
