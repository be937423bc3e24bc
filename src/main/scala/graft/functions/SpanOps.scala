package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared single-walk tokenizer for the C4 span-dedup family
  * ([[graft.operators.Dedup.spanDedup]]; reference behavior anchor: the
  * repeated-span rule the lakeside curation queries apply, re-expressed
  * Spark-first). Parity contract: token boundaries must equal Spark's
  * `split(trim(text), "\\s+")` — `trim` strips 0x20 SPACES only (not
  * Java `String.trim`'s `<= ' '` rule), and `split` runs Java regex
  * `\s+` with limit -1, which emits a leading "" when the string starts
  * with whitespace and KEEPS a trailing "" when it ends with
  * non-space whitespace. The DuckDB oracle replays the same rule with
  * `regexp_split_to_array(trim(text), '\s+')`. */
private[functions] object SpanOps {
  /** Java-regex `\s` — ASCII-only: [ \t\n\x0B\f\r]. */
  @inline def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** Token boundaries of `split(trim(s), "\\s+")` (limit -1) as flat
    * (start, end) offset pairs — no per-token String allocation. */
  def tokenBounds(s: String): Array[Int] = {
    var b = 0
    var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    // worst case: alternating char/ws → ~len/2 + 2 tokens
    val out = new Array[Int](math.max(4, (e - b) + 4))
    var n = 0
    var i = b
    var start = b
    while (i < e) {
      if (isWs(s.charAt(i))) {
        out(n) = start; out(n + 1) = i; n += 2
        i += 1
        while (i < e && isWs(s.charAt(i))) i += 1
        start = i
      } else i += 1
    }
    // final remainder — possibly empty (trailing non-space whitespace),
    // matching limit = -1 semantics
    out(n) = start; out(n + 1) = e; n += 2
    java.util.Arrays.copyOf(out, n)
  }

  /** FNV-1a's 64-bit prime — odd (invertible mod 2^64), well-dispersed;
    * same polynomial family + splitmix64 avalanche as
    * [[RollingHashWindows]], same ~2^-64 per-pair collision posture. */
  final val B = 0x100000001b3L

  /** splitmix64 finalizer — bijective avalanche. */
  @inline def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
}

/** One 64-bit hash per `spanTokens`-token tile of a document, in ONE
  * O(len) walk — the decision stream of [[graft.operators.Dedup.spanDedup]].
  * Element i hashes the string `concat_ws(" ", tokens[i·k+1 .. i·k+k])`
  * (the span TEXT — a function of content only, so equal spans collide
  * across documents by construction). The functions-API spelling —
  * `transform(sequence(...), i => concat_ws(" ", slice(split(...), ...)))`
  * — re-runs the O(len) `split` inside the lambda on EVERY span
  * (Catalyst expressions are trees, not DAGs) and allocates every span
  * string just to hash it; this walks the text once and hashes token
  * bytes in place. Never shorter than 1 element: an empty/null-ish
  * document tokenizes to [""] and yields the hash of "". */
case class SpanHashes(child: Expression, spanTokens: Int)
    extends UnaryExpression with ComputeUnaryCodegen {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      if (spanTokens <= 0)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: spanTokens $spanTokens must be positive")
      else TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def compute(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val bounds = SpanOps.tokenBounds(s)
    val nToks = bounds.length / 2
    val k = spanTokens
    val nSpans = (nToks + k - 1) / k
    val out = new Array[Long](nSpans)
    var sp = 0
    while (sp < nSpans) {
      var h = 0L
      var t = sp * k
      val tEnd = math.min(t + k, nToks)
      while (t < tEnd) {
        if (t > sp * k) h = h * SpanOps.B + ' '
        var c = bounds(2 * t)
        val ce = bounds(2 * t + 1)
        while (c < ce) { h = h * SpanOps.B + s.charAt(c); c += 1 }
        t += 1
      }
      out(sp) = SpanOps.mix(h)
      sp += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): SpanHashes = copy(child = newChild)

  override def prettyName: String = "span_hashes"
}

object SpanHashes {
  def apply(text: Column, spanTokens: Int): Column =
    GraftColumnBridge.column(
      new SpanHashes(GraftColumnBridge.expression(text), spanTokens))
}

/** Reassemble the surviving text of a span-deduped document in ONE
  * O(len + |keep|) walk: join (with single spaces, in span order) the
  * `spanTokens`-token tiles whose indices appear in the SORTED int array
  * `keepIdx`. Replaces the collect-struct + `array_sort` + `filter` +
  * `array_join` reassembly, which shuffled every span's TEXT through a
  * per-document aggregation just to reorder what the document already
  * contains. Span indices outside [0, nSpans) are ignored. */
case class SpanKept(left: Expression, right: Expression, spanTokens: Int)
    extends BinaryExpression with ComputeBinaryCodegen {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(IntegerType, _)) =>
        if (spanTokens <= 0)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName: spanTokens $spanTokens must be positive")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<int>), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = StringType

  override def compute(l: Any, r: Any): Any = {
    val s = l.asInstanceOf[UTF8String].toString
    val keep = r.asInstanceOf[ArrayData].toIntArray()
    if (keep.isEmpty) return UTF8String.EMPTY_UTF8
    val bounds = SpanOps.tokenBounds(s)
    val nToks = bounds.length / 2
    val k = spanTokens
    val nSpans = (nToks + k - 1) / k
    val sb = new java.lang.StringBuilder(s.length)
    var first = true
    var i = 0
    while (i < keep.length) {
      val sp = keep(i)
      if (sp >= 0 && sp < nSpans) {
        if (!first) sb.append(' ')
        first = false
        var t = sp * k
        val tEnd = math.min(t + k, nToks)
        while (t < tEnd) {
          if (t > sp * k) sb.append(' ')
          sb.append(s, bounds(2 * t), bounds(2 * t + 1))
          t += 1
        }
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanKept =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "span_kept"
}

object SpanKept {
  def apply(text: Column, keepIdx: Column, spanTokens: Int): Column =
    GraftColumnBridge.column(
      new SpanKept(GraftColumnBridge.expression(text),
        GraftColumnBridge.expression(keepIdx), spanTokens))
}

/** `id·2^posBits + pos` as a single codegen expression — the packed
  * decision-stream key of the span/substring dedup passes
  * ([[graft.operators.Dedup.packIdPos]] documents the domain and why
  * min/max over the packing recover min/max id). A `when(..., shift +
  * pos).otherwise(raise_error(...))` spelling is semantically identical
  * but NULLABLE (the error branch types as null), which invites the
  * optimizer to infer `isnotnull(...)` filters above ONE consumer of a
  * shared exchange — defeating exchange reuse and re-evaluating the
  * whole guard per row. Here the guard is two compares that THROW in
  * place, and nullability follows the inputs. */
case class PackIdPos(left: Expression, right: Expression, posBits: Int)
    extends BinaryExpression with ComputeBinaryCodegen {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, IntegerType | LongType) =>
        if (posBits <= 0 || posBits >= 62)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName: posBits $posBits out of (0, 62)")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, int|bigint), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = LongType

  private val idLim = 1L << (62 - posBits)
  private val posLim = 1L << posBits

  override def compute(l: Any, r: Any): Any = {
    val id = l.asInstanceOf[Long]
    val pos = r match {
      case i: java.lang.Integer => i.longValue()
      case j: java.lang.Long => j.longValue()
    }
    if (id < 0 || id >= idLim || pos < 0 || pos >= posLim)
      throw new IllegalArgumentException(
        s"$prettyName overflow (id < 2^${62 - posBits}, pos < 2^$posBits " +
          s"required): id=$id pos=$pos")
    java.lang.Long.valueOf((id << posBits) + pos)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PackIdPos =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pack_id_pos"
}

object PackIdPos {
  def apply(id: Column, pos: Column, posBits: Int): Column =
    GraftColumnBridge.column(
      new PackIdPos(GraftColumnBridge.expression(id),
        GraftColumnBridge.expression(pos), posBits))
}

/** Merge a SORTED int array of seed positions into maximal intervals
  * [pos, pos+window) and return struct(n_dup_spans bigint, dup_chars
  * bigint) in one O(n) walk — the per-document interval merge of
  * [[graft.operators.Dedup.duplicatedSubstringSpans]]. Replaces a
  * Sort + two running-frame Windows + two HashAggregates over the seed
  * stream: the seeds are already grouped per document by then, and a
  * document's seed count is bounded by its length, so the walk is a
  * scalar expression, not a distributed pass. */
case class MergeIntervals(child: Expression, window: Int)
    extends UnaryExpression with ComputeUnaryCodegen {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) =>
      if (window <= 0)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: window $window must be positive")
      else TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int> input, got ${t.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_dup_spans", LongType, nullable = false),
    StructField("dup_chars", LongType, nullable = false)))

  override def compute(input: Any): Any = {
    val ps = input.asInstanceOf[ArrayData].toIntArray()
    var n = 0L
    var chars = 0L
    var start = 0L
    var end = Long.MinValue
    var i = 0
    while (i < ps.length) {
      val p = ps(i).toLong
      if (p > end) { // strictly after every earlier seed's end → new span
        if (end != Long.MinValue) chars += end - start
        n += 1
        start = p
        end = p + window
      } else if (p + window > end) end = p + window
      i += 1
    }
    if (end != Long.MinValue) chars += end - start
    org.apache.spark.sql.catalyst.InternalRow(n, chars)
  }

  override protected def withNewChildInternal(
      newChild: Expression): MergeIntervals = copy(child = newChild)

  override def prettyName: String = "merge_intervals"
}

object MergeIntervals {
  def apply(sortedPos: Column, window: Int): Column =
    GraftColumnBridge.column(
      new MergeIntervals(GraftColumnBridge.expression(sortedPos), window))
}
