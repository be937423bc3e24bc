package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass log-template masking — the compiled form of
  * [[graft.operators.TextAnalysis.templateRules]] (the masking half of
  * Drain, He et al. ICWS 2017).
  *
  * The rule chain is FOUR sequential `regexp_replace` passes, each of
  * which re-walks and re-allocates the whole message through
  * `java.util.regex` — ~5 µs per line, and the entire cost of the t23
  * entry (the masked stream collapses to a handful of templates, so the
  * aggregation after it is free). This expression computes the identical
  * string in hand-rolled scans with no regex engine, no backtracking
  * explosion, and at most one allocation per applied rule.
  *
  * EQUIVALENCE, rule by rule (java.util.regex `find()` semantics: try a
  * match at each position left to right, continue after each match's
  * end; `\b` tests `'_' || Character.isLetterOrDigit` over code points —
  * see the note on [[wordBefore]]):
  *
  *  1. `[0-9a-f]{8}(-[0-9a-f]{4}){3}-[0-9a-f]{12}` — all counts fixed, so
  *     the regex admits exactly one candidate (length 36) per start
  *     position: a direct positional check is the whole semantics.
  *  2. `\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b` — greedy `{1,3}` with
  *     backtracking: octet lengths are tried in descending order,
  *     outermost octet varying slowest, and the first combination that
  *     satisfies the dots and the trailing boundary wins. Four nested
  *     descending loops (≤ 81 combinations) replicate the engine's
  *     preference order exactly.
  *  3. `\b[0-9a-f]{12,}\b` — greedy `{12,}` takes the maximal hex run;
  *     every shorter backtrack ends between two hex characters, i.e.
  *     between two word characters, where `\b` can never hold. So the
  *     rule matches exactly the maximal hex runs of length ≥ 12 whose
  *     neighbours on BOTH sides are non-word (or string edges).
  *  4. `[0-9]+` — maximal digit runs, no context.
  *
  * LogMaskSpec pins equivalence against the live `regexp_replace` chain
  * on the planted t23 corpus shape plus property-generated adversarial
  * strings (octet overflows, 11/12/13-char hex runs, word-glued IPs,
  * UUID near-misses), so a drift in either spelling fails the build.
  */
object LogMask {

  /** `logTemplate(msg)` as a Column (codegen expression, no UDF). */
  def logTemplate(c: Column): Column =
    GraftColumnBridge.column(LogTemplateExpr(GraftColumnBridge.expression(c)))

  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  @inline private def isHex(c: Char): Boolean =
    isDigit(c) || (c >= 'a' && c <= 'f')

  // java.util.regex's \b WITHOUT UNICODE_CHARACTER_CLASS is NOT the
  // ASCII \w: Pattern$Bound.isWord is `ch == '_' ||
  // Character.isLetterOrDigit(ch)` over CODE POINTS — Unicode letters
  // and digits count as word chars for boundaries even in default mode
  // (the LogMaskSpec property test caught an ASCII-\w spelling of this
  // against a CJK neighbour). Replicated exactly; the interior chars of
  // every match candidate are ASCII digits/hex, so only the two edge
  // probes need code-point handling.
  @inline private def wordBefore(s: String, p: Int): Boolean = {
    val cp = s.codePointBefore(p)
    cp == '_' || Character.isLetterOrDigit(cp)
  }
  @inline private def wordAt(s: String, p: Int): Boolean = {
    val cp = s.codePointAt(p)
    cp == '_' || Character.isLetterOrDigit(cp)
  }

  /** The full 4-rule chain. Returns `s` itself (same reference) when no
    * rule fires, so the caller can skip re-encoding. */
  def mask(s: String): String = maskNums(maskHex(maskIps(maskUuids(s))))

  // ------------------------------------------------------------- rule 1
  private def hexRun(s: String, p: Int, n: Int): Boolean = {
    var i = p
    val end = p + n
    while (i < end) { if (!isHex(s.charAt(i))) return false; i += 1 }
    true
  }

  private def uuidAt(s: String, p: Int): Boolean =
    p + 36 <= s.length &&
      hexRun(s, p, 8) && s.charAt(p + 8) == '-' &&
      hexRun(s, p + 9, 4) && s.charAt(p + 13) == '-' &&
      hexRun(s, p + 14, 4) && s.charAt(p + 18) == '-' &&
      hexRun(s, p + 19, 4) && s.charAt(p + 23) == '-' &&
      hexRun(s, p + 24, 12)

  private def maskUuids(s: String): String = {
    var sb: java.lang.StringBuilder = null
    var i = 0
    var last = 0
    while (i < s.length) {
      if (uuidAt(s, i)) {
        if (sb == null) sb = new java.lang.StringBuilder(s.length)
        sb.append(s, last, i).append("<uuid>")
        i += 36
        last = i
      } else i += 1
    }
    if (sb == null) s else sb.append(s, last, s.length).toString
  }

  // ------------------------------------------------------------- rule 2
  private def digitsAt(s: String, p: Int, n: Int): Boolean = {
    if (p + n > s.length) return false
    var i = p
    val end = p + n
    while (i < end) { if (!isDigit(s.charAt(i))) return false; i += 1 }
    true
  }

  @inline private def dotAt(s: String, p: Int): Boolean =
    p < s.length && s.charAt(p) == '.'

  /** Match end (exclusive) of rule 2 at position `p`, or -1. */
  private def ipAt(s: String, p: Int): Int = {
    if (p > 0 && wordBefore(s, p)) return -1
    var o1 = 3
    while (o1 >= 1) {
      if (digitsAt(s, p, o1) && dotAt(s, p + o1)) {
        val p2 = p + o1 + 1
        var o2 = 3
        while (o2 >= 1) {
          if (digitsAt(s, p2, o2) && dotAt(s, p2 + o2)) {
            val p3 = p2 + o2 + 1
            var o3 = 3
            while (o3 >= 1) {
              if (digitsAt(s, p3, o3) && dotAt(s, p3 + o3)) {
                val p4 = p3 + o3 + 1
                var o4 = 3
                while (o4 >= 1) {
                  if (digitsAt(s, p4, o4)) {
                    val end = p4 + o4
                    if (end >= s.length || !wordAt(s, end)) return end
                  }
                  o4 -= 1
                }
              }
              o3 -= 1
            }
          }
          o2 -= 1
        }
      }
      o1 -= 1
    }
    -1
  }

  private def maskIps(s: String): String = {
    var sb: java.lang.StringBuilder = null
    var i = 0
    var last = 0
    while (i < s.length) {
      val end = if (isDigit(s.charAt(i))) ipAt(s, i) else -1
      if (end >= 0) {
        if (sb == null) sb = new java.lang.StringBuilder(s.length)
        sb.append(s, last, i).append("<ip>")
        i = end
        last = i
      } else i += 1
    }
    if (sb == null) s else sb.append(s, last, s.length).toString
  }

  // ------------------------------------------------------------- rule 3
  private def maskHex(s: String): String = {
    var sb: java.lang.StringBuilder = null
    var i = 0
    var last = 0
    while (i < s.length) {
      if (isHex(s.charAt(i)) && (i == 0 || !wordBefore(s, i))) {
        var j = i
        while (j < s.length && isHex(s.charAt(j))) j += 1
        // maximal hex run [i, j); matches iff >= 12 long and the char
        // after the run is non-word (shorter backtracks end inside the
        // run — between two word chars — where \b cannot hold)
        if (j - i >= 12 && (j >= s.length || !wordAt(s, j))) {
          if (sb == null) sb = new java.lang.StringBuilder(s.length)
          sb.append(s, last, i).append("<hex>")
          i = j
          last = i
        } else i = j // no later start inside the run has \b before it
      } else i += 1
    }
    if (sb == null) s else sb.append(s, last, s.length).toString
  }

  // ------------------------------------------------------------- rule 4
  private def maskNums(s: String): String = {
    var sb: java.lang.StringBuilder = null
    var i = 0
    var last = 0
    while (i < s.length) {
      if (isDigit(s.charAt(i))) {
        var j = i
        while (j < s.length && isDigit(s.charAt(j))) j += 1
        if (sb == null) sb = new java.lang.StringBuilder(s.length)
        sb.append(s, last, i).append("<num>")
        i = j
        last = i
      } else i += 1
    }
    if (sb == null) s else sb.append(s, last, s.length).toString
  }
}

/** Codegen wrapper over [[LogMask.mask]]. */
case class LogTemplateExpr(child: Expression)
    extends UnaryExpression with ComputeUnaryCodegen {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.sql}")
  }

  override def dataType: DataType = StringType

  override def compute(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val m = LogMask.mask(s)
    if (m eq s) input else UTF8String.fromString(m)
  }

  override def prettyName: String = "graft_log_template"

  override protected def withNewChildInternal(newChild: Expression)
      : LogTemplateExpr = copy(child = newChild)
}
