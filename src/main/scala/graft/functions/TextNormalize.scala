package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for corpus preprocessing — the first pass of
  * every web-scale text pipeline (dedup keys, tokenizer input, language-ID
  * features all want one canonical byte form per logical string).
  *
  * Spark ships no Unicode-normalization SQL function, so these are custom
  * codegen Catalyst expressions (no UDF boxing; they stay inside
  * whole-stage codegen like the rest of the text stack):
  *
  *  - [[UnicodeNormalizeExpr]] — NFC/NFD/NFKC/NFKD via `java.text.Normalizer`.
  *    NFC is the storage canonical form (decomposed "e"+U+0301 and composed
  *    "é" become one representation, so exact-dedup hashing stops splitting
  *    logically-identical documents).
  *  - [[StripAccentsExpr]] — NFD-decompose then drop combining marks
  *    (`Character.getType == NON_SPACING_MARK` etc.), the same semantics as
  *    DuckDB's `strip_accents` / Lucene's ASCIIFolding for Latin scripts:
  *    "naïve résumé" → "naive resume". Ligatures (ﬁ) are NOT folded — that
  *    is NFKC's job, kept separate deliberately (the two transforms have
  *    different information-loss profiles).
  *
  * Both are pure per-row functions of the input string: map-side, no
  * shuffle, deterministic on any cluster (the JDK normalizer implements
  * Unicode TR-15, version-stable for the assigned code points we target).
  *
  * Reference anchor: lakeside lowercases/regexes tag values at query time
  * (`core/src/main/scala/com/cardinal/utils/ast/BaseExpr.scala:469-504`
  * case-insensitive regex matching) but has no corpus-normalization pass;
  * this is part of the training-data-pipeline surface built beyond it.
  */
object TextNormalize {

  /** `normalize(s, "NFC"|"NFD"|"NFKC"|"NFKD")` as a Column. */
  def normalize(c: Column, form: String): Column =
    GraftColumnBridge.column(
      UnicodeNormalizeExpr(GraftColumnBridge.expression(c), form))

  /** Accent/diacritic removal (NFD → drop combining marks). */
  def stripAccents(c: Column): Column =
    GraftColumnBridge.column(
      StripAccentsExpr(GraftColumnBridge.expression(c)))

  /** The canonical corpus key: NFC → strip accents → lowercase(ROOT).
    * Matches DuckDB `lower(strip_accents(nfc_normalize(s)))` — used by the
    * oracle-checked entry. */
  def canonical(c: Column): Column =
    org.apache.spark.sql.functions.lower(stripAccents(normalize(c, "NFC")))
}

case class UnicodeNormalizeExpr(child: Expression, form: String)
    extends UnaryExpression with ComputeUnaryCodegen {

  private val normForm: Normalizer.Form = form.toUpperCase match {
    case "NFC" => Normalizer.Form.NFC
    case "NFD" => Normalizer.Form.NFD
    case "NFKC" => Normalizer.Form.NFKC
    case "NFKD" => Normalizer.Form.NFKD
    case other => throw new IllegalArgumentException(
      s"unknown normalization form '$other' (want NFC|NFD|NFKC|NFKD)")
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.sql}")
  }

  override def dataType: DataType = StringType

  override def compute(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // already-normalized fast path: isNormalized is a cheap scan and the
    // common case for ASCII/NFC web text — avoids the rebuild allocation
    if (Normalizer.isNormalized(s, normForm)) input
    else UTF8String.fromString(Normalizer.normalize(s, normForm))
  }

  override def prettyName: String = "graft_unicode_normalize"

  override protected def withNewChildInternal(newChild: Expression)
      : UnicodeNormalizeExpr = copy(child = newChild)
}

case class StripAccentsExpr(child: Expression)
    extends UnaryExpression with ComputeUnaryCodegen {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.sql}")
  }

  override def dataType: DataType = StringType

  override def compute(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // ASCII fast path — no decomposition can introduce marks
    var ascii = true
    var i = 0
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return input
    val d = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK && t != Character.ENCLOSING_MARK &&
          t != Character.COMBINING_SPACING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  override def prettyName: String = "graft_strip_accents"

  override protected def withNewChildInternal(newChild: Expression)
      : StripAccentsExpr = copy(child = newChild)
}
