package graft.compile

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ast._

/** FunctionCall tree → Catalyst Column (SURVEY §2.3, E2-E9).
  *
  * Function registry mirrors the reference's
  * (reference ComputeFunction.scala:100-183): n-ary `mul`/`add`/`concat`,
  * binary `div`/`sub`/`strpos`. Numeric labels go through try_cast-to-double
  * (reference Label.toSql, ComputeFunction.scala:36-39); `strpos` is the
  * 1-based SQL `position(needle IN hay)`.
  *
  * Pure Column composition — stays inside whole-stage codegen.
  */
object ComputeCompiler {

  private val arity: Map[String, Option[Int]] = Map(
    "mul" -> None, "add" -> None, "concat" -> None,
    "div" -> Some(2), "sub" -> Some(2), "strpos" -> Some(2)
  )

  /** Function-spec metadata: name → arity (None = variadic) — the
    * payload behind the reference's functionSpecs endpoint
    * (reference QueryApi.scala:356-359, ComputeFunction.getSpecs); an
    * API layer serializes this map directly. */
  def specs: Map[String, Option[Int]] = arity

  def validate(fc: FunctionCall): Unit = {
    arity.get(fc.name) match {
      case None =>
        throw new IllegalArgumentException(s"unknown compute function ${fc.name}")
      case Some(Some(n)) if fc.args.size != n =>
        throw new IllegalArgumentException(
          s"${fc.name} requires $n arguments, got ${fc.args.size}")
      case Some(None) if fc.args.isEmpty =>
        throw new IllegalArgumentException(s"${fc.name} requires arguments")
      case _ =>
    }
    fc.args.foreach { case nested: FunctionCall => validate(nested); case _ => }
  }

  def compile(fc: FunctionCall): Column = {
    validate(fc)
    compileCall(fc)
  }

  private def compileCall(fc: FunctionCall): Column = {
    val args = fc.args.map(compileArg)
    fc.name match {
      case "mul" => args.reduceLeft(_ * _)
      // null on zero divisor — DuckDB's `/` semantics (the reference's
      // execution engine), and ANSI-safe in Spark 4
      case "div" => try_divide(args.head, args(1))
      case "add" => args.reduceLeft(_ + _)
      case "sub" => args.head - args(1)
      case "concat" => concat(args: _*)
      case "strpos" =>
        // position(needle IN hay): locate(substr, str) is 1-based
        locate_col(args.head, args(1))
    }
  }

  private def locate_col(needle: Column, hay: Column): Column =
    call_function("locate", needle, hay).cast("double")

  private def compileArg(arg: ComputeArg): Column = arg match {
    case LabelArg(name, dataType) =>
      dataType match {
        case DataTypes.NUMBER =>
          // the safe always-backtick form — a dot-only check let
          // "x-request-id" parse as the subtraction x - request - id
          FilterCompiler.tryCastDouble(name)
        case _ => FilterCompiler.fieldCol(name)
      }
    case LiteralArg(value, dataType) =>
      dataType match {
        case DataTypes.NUMBER => lit(value.toDouble)
        case _ => lit(value)
      }
    case fc: FunctionCall => compileCall(fc)
  }
}
