package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass multi-group regex extraction (the reference's `extract`
  * stage: one regex with N capture groups projected to N fields, reference
  * BaseExpr.scala:244-265 / RegexpStage.scala:21-55).
  *
  * `regexp_extract(msg, re, i)` per field runs the matcher N times per
  * row; this expression runs it once and returns a struct — null when the
  * regex doesn't match (callers gate on struct IS NOT NULL, same contract
  * as the reference's regexp_matches guard). Unmatched optional groups
  * become null fields.
  *
  * The pattern is compiled once per task (lazy val on the expression
  * instance), using `find()` — substring semantics, matching the
  * reference's regexp_matches/RE2 "contains a match" behavior.
  */
case class RegexExtractStruct(child: Expression, regex: String,
    fields: Seq[String])
    extends UnaryExpression with ComputeUnaryCodegen {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.sql}")
  }

  override def dataType: DataType =
    StructType(fields.map(f => StructField(f, StringType, nullable = true)))

  override def nullable: Boolean = true

  @transient private lazy val pattern = java.util.regex.Pattern.compile(regex)

  override def compute(input: Any): Any = {
    val m = pattern.matcher(input.asInstanceOf[UTF8String].toString)
    if (!m.find()) null
    else {
      val out = new Array[Any](fields.length)
      var i = 0
      while (i < fields.length) {
        val g = m.group(i + 1)
        // unmatched optional group → "" (regexp_extract's convention, so
        // swapping the per-field formulation for this one is value-neutral)
        out(i) = if (g == null) UTF8String.EMPTY_UTF8 else UTF8String.fromString(g)
        i += 1
      }
      new GenericInternalRow(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): RegexExtractStruct =
    copy(child = newChild)

  override def prettyName: String = "regex_extract_struct"
}

object RegexExtractStruct {
  def apply(msg: Column, regex: String, fields: Seq[String]): Column =
    GraftColumnBridge.column(
      new RegexExtractStruct(GraftColumnBridge.expression(msg), regex, fields))
}
