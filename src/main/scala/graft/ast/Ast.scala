package graft.ast

/** Query AST — the engine's user-facing IR, mirroring the reference's JSON
  * query surface (shapes from
  * reference core/src/main/scala/com/cardinal/utils/ast/ASTUtils.scala:101-137,
  * 276-377). Queries arrive as JSON (`baseExpressions` + `formulae`) and
  * compile to DataFrame plans in [[graft.engine.QueryEngine]].
  */
object Ops {
  val EQ = "eq"; val NOT_EQUALS = "!="; val IN = "in"; val NOT_IN = "not_in"
  val GT = "gt"; val GE = "ge"; val LT = "lt"; val LE = "le"
  val REGEX = "regex"; val CONTAINS = "contains"
  val HAS = "has"; val EXISTS = "exists"
}

object DataTypes {
  val STRING = "string"; val NUMBER = "number"
  val DURATION = "duration"; val DATA_SIZE = "datasize"
}

/** Filter tree (reference ASTUtils.scala:101-137). */
sealed trait QueryClause {
  /** Human-readable form, used as the series label when there are no
    * groupBys (reference QueryClause.toString, ASTUtils.scala:102-121). */
  def show: String = this match {
    case Filter(k, v, op, _, _, _) => op match {
      case Ops.EQ => s"$k = ${v.headOption.getOrElse("")}"
      case Ops.GT => s"$k > ${v.head}"
      case Ops.GE => s"$k >= ${v.head}"
      case Ops.LT => s"$k < ${v.head}"
      case Ops.LE => s"$k <= ${v.head}"
      case Ops.REGEX => s"regexMatches($k, ${v.head})"
      case Ops.CONTAINS => s"$k contains ${v.head}"
      case Ops.IN => s"$k in (${v.mkString(", ")})"
      case Ops.NOT_IN => s"$k not in (${v.mkString(", ")})"
      case Ops.HAS | Ops.EXISTS => s"$k exists"
      case _ => ""
    }
    case BinaryClause(q1, q2, op) => s"(${q1.show} $op ${q2.show})"
    case NotClause(q) => s"not(${q.show})"
  }

  def fields: Set[String] = this match {
    case Filter(k, _, _, _, _, _) => Set(k)
    case BinaryClause(q1, q2, _) => q1.fields ++ q2.fields
    case NotClause(q) => q.fields
  }
}

final case class Filter(
    k: String,
    v: List[String] = Nil,
    op: String,
    dataType: String = DataTypes.STRING,
    extracted: Boolean = false,
    computed: Boolean = false
) extends QueryClause

final case class BinaryClause(q1: QueryClause, q2: QueryClause, op: String)
    extends QueryClause

final case class NotClause(not: QueryClause) extends QueryClause

/** Regex extraction of named fields from the message column
  * (reference Extractor.scala:21-22). `fields` must appear in capture-group
  * order; a `number`-typed field is cast to double post-extraction. */
final case class ExtractedField(name: String, dataType: String)
final case class Extractor(regex: String, fields: List[ExtractedField])

/** Scalar expression tree for derived columns
  * (reference ComputeFunction.scala:25-180). */
sealed trait ComputeArg
final case class LabelArg(name: String, dataType: String = DataTypes.STRING)
    extends ComputeArg
final case class LiteralArg(value: String, dataType: String) extends ComputeArg
final case class FunctionCall(name: String, args: List[ComputeArg])
    extends ComputeArg

final case class Compute(labelName: String, functionCall: FunctionCall)

/** Chart options (reference ASTUtils.scala:221-262). `chartType` is
  * "count" or "rate" (A12 transform); `fieldName`/`fieldType` chart a tag
  * value instead of the row value. */
final case class ChartOptions(
    aggregation: String = "sum",
    groupBys: List[String] = Nil,
    chartType: String = "count",
    rollup: Option[String] = None,
    fieldName: Option[String] = None,
    fieldType: Option[String] = None
)

/** Formula-evaluable AST node (reference AST.scala / ASTUtils.scala:40-85). */
sealed trait AstNode

final case class ConstantExpr(value: Double) extends AstNode

final case class Formula(e1: AstNode, e2: AstNode, op: String) extends AstNode

final case class BaseExpr(
    id: String,
    dataset: String = "logs",
    filter: QueryClause,
    extractor: Option[Extractor] = None,
    compute: Option[Compute] = None,
    chart: Option[ChartOptions] = None,
    order: String = "DESC",
    limit: Int = 1000,
    metricType: String = "gauge",
    returnResults: Boolean = true
) extends AstNode {
  def syntheticFields: Set[String] =
    extractor.map(_.fields.map(_.name).toSet).getOrElse(Set.empty) ++
      compute.map(c => Set(c.labelName)).getOrElse(Set.empty)
}

final case class ASTInput(
    baseExpressions: Map[String, BaseExpr],
    formulae: List[String] = Nil
)

object AstOps {
  /** Union of groupBys across the formula tree
    * (reference ASTUtils.getFinalGrouping:79-85). */
  def finalGrouping(ast: AstNode): Set[String] = ast match {
    case b: BaseExpr => b.chart.map(_.groupBys.toSet).getOrElse(Set.empty)
    case Formula(e1, e2, _) => finalGrouping(e1) ++ finalGrouping(e2)
    case _ => Set.empty
  }

  def baseExprsIn(ast: AstNode): List[BaseExpr] = ast match {
    case b: BaseExpr => List(b)
    case Formula(e1, e2, _) => baseExprsIn(e1) ++ baseExprsIn(e2)
    case _ => Nil
  }
}
