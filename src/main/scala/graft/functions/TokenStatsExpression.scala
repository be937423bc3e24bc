package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

object TokenStatsExpression {
  /** One-pass token statistics for the text-analysis profile. */
  def tokenStats(tokensCol: Column, profiles: Seq[Seq[String]]): Column =
    GraftColumnBridge.column(
      TokenStats(GraftColumnBridge.expression(tokensCol), profiles))
}

/** Per-row token statistics in ONE pass over the token array:
  * token count, total character count, distinct-token count, long-word
  * subword surplus (Σ floor((len−8)/4) for len>8), and per-profile
  * distinct-stopword hit counts (profiles are matched against the
  * lowercased token set — Cavnar-Trenkle-style function-word scoring).
  *
  * Value-identical to the higher-order-function formulation
  * (`aggregate`/`transform`/`array_intersect` over the same tokens) but
  * those HOFs are CodegenFallback: they evaluate interpreted, disable
  * whole-stage codegen for the whole projection (losing common-
  * subexpression elimination, so the tokenizing split re-runs per
  * reference), and pay a lambda interpretation per element. This
  * expression keeps the projection in codegen and walks the array once.
  */
case class TokenStats(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression with ComputeUnaryCodegen with StringArrayInput {

  // tokens are matched LOWERCASED, so profile words must be lowercase
  // too — normalize once at construction rather than trusting every
  // caller (a profile containing "The" would silently never hit)
  @transient private lazy val lowerProfiles: Seq[Seq[String]] =
    profiles.map(_.map(_.toLowerCase))

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("char_sum", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("long_extra", LongType, nullable = false),
    StructField("profile_hits", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def compute(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var cnt = 0L
    var charSum = 0L
    var longExtra = 0L
    val seen = new java.util.HashSet[String]()
    val seenLower = new java.util.HashSet[String]()
    var i = 0
    while (i < n) {
      // user-supplied array<string> columns may carry null elements —
      // skip them (split() output never does, but the input type allows it)
      if (!arr.isNullAt(i)) {
        cnt += 1
        val t = arr.getUTF8String(i)
        val len = t.numChars()
        charSum += len
        if (len > 8) longExtra += (len - 8) / 4
        val s = t.toString
        seen.add(s)
        seenLower.add(t.toLowerCase.toString)
      }
      i += 1
    }
    val hits = new Array[Any](lowerProfiles.length)
    var p = 0
    while (p < lowerProfiles.length) {
      hits(p) = lowerProfiles(p).count(seenLower.contains).toLong
      p += 1
    }
    new GenericInternalRow(Array[Any](
      cnt, charSum, seen.size.toLong, longExtra,
      new GenericArrayData(hits)))
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}
