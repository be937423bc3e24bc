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
    case StringType =>
      // validate the pattern and its group count at ANALYSIS time —
      // Spark's own regexp_extract validates the group index; without
      // this a short pattern fails per-row on executors instead
      try {
        val p = java.util.regex.Pattern.compile(regex)
        val groups = p.matcher("").groupCount()
        if (groups < fields.length)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName: regex has $groups capture group(s) but " +
              s"${fields.length} field(s) were requested")
        else TypeCheckResult.TypeCheckSuccess
      } catch {
        case e: java.util.regex.PatternSyntaxException =>
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName: invalid regex: ${e.getMessage}")
      }
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
        // unmatched optional group → NULL field (the class contract):
        // "" would crash a downstream numeric cast under ANSI and count
        // as existing for IS NOT NULL filters — regexp_extract's ""
        // convention is the wrong default for typed extraction
        out(i) = if (g == null) null else UTF8String.fromString(g)
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
