package graft.compile

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ast._
import graft.functions.QuantityParser

/** QueryClause → Catalyst Column (SURVEY §2.2, F1-F10).
  *
  * Semantics match the reference's SQL generation
  * (reference BaseExpr.scala:433-513):
  *  - regex/contains are case-insensitive find-anywhere (`'i'` flag);
  *    contains compiles the BARE pattern (match-set identical to the
  *    reference's `.*v.*` spelling under find() semantics, but linear-time
  *    under java.util.regex where the greedy `.*` wrapper is O(len²));
  *    regex metacharacters stay active, as in the reference;
  *  - gt/ge/lt/le normalize duration/datasize/number literals at plan time
  *    and compare via try_cast-to-double (null on garbage → row dropped,
  *    DuckDB try_cast parity);
  *  - a filter on a column absent from the scan schema (and not produced
  *    by extract/compute) constant-folds to `false`
  *    (reference BaseExpr.scala:462-464) — load-bearing for dynamic
  *    per-segment schemas, where Catalyst would instead fail analysis.
  *
  * Everything here is a plain Column expression, so Catalyst pushes the
  * non-synthetic conjuncts into the parquet scan.
  */
object FilterCompiler {

  /** Backtick-quote dotted tag names (reference quotes with `"`,
    * BaseExpr.scala:465-467). */
  def fieldCol(name: String): Column =
    if (name.contains(".")) col(s"`$name`") else col(name)

  private[graft] def tryCastDouble(name: String): Column = {
    // ALWAYS backtick-quote (same hazard QueryEngine.chart escapes): an
    // unquoted "x-request-id" parses as the subtraction x - request - id
    val quoted = s"`${name.replace("`", "``")}`"
    expr(s"try_cast($quoted as double)")
  }

  /** @param existingFields columns present in the scan schema (post
    *   extract/compute, synthetic fields included by the caller). */
  def compile(clause: QueryClause, existingFields: Set[String]): Column =
    clause match {
      case f: Filter => compileFilter(f, existingFields)
      case BinaryClause(q1, q2, op) =>
        val c1 = compile(q1, existingFields)
        val c2 = compile(q2, existingFields)
        op match {
          case "and" => c1 && c2
          case "or" => c1 || c2
          case other =>
            throw new IllegalArgumentException(s"unknown binary op $other")
        }
      case NotClause(q) => !compile(q, existingFields)
    }

  private def compileFilter(f: Filter, existing: Set[String]): Column = {
    // F9: missing non-synthetic column → false
    if (!existing.contains(f.k) && !f.extracted && !f.computed)
      return lit(false)

    val c = fieldCol(f.k)
    def headV = f.v.head
    def normalized: Double = QuantityParser.normalize(headV, f.dataType)

    f.op match {
      case Ops.HAS | Ops.EXISTS => c.isNotNull
      case Ops.EQ => c === headV
      case Ops.NOT_EQUALS => c =!= headV
      case Ops.IN => c.isin(f.v: _*)
      case Ops.NOT_IN => !c.isin(f.v: _*)
      case Ops.REGEX => c.rlike(s"(?i)$headV")
      // Reference spelling is `regexp_matches(col, '.*v.*', 'i')`
      // (BaseExpr.scala:500-501) — but the reference runs RE2
      // (linear-time) and rlike runs java.util.regex, where the greedy
      // `.*` wrappers retry failing rows from every start offset:
      // O(len²) per row, ~25× on long text columns (measured at the
      // sf10 soak). Under find() semantics the wrappers never change
      // the MATCH SET (`.*v.*` finds a match iff `v` does, for any
      // inner pattern — lookarounds consult the input, not the
      // wrappers' consumption), so the engine compiles the bare
      // pattern. The value stays a regex fragment, as in the
      // reference.
      case Ops.CONTAINS => c.rlike(s"(?i)$headV")
      // an unparseable threshold (normalize → NaN) must match NOTHING for
      // every comparison: Spark orders NaN above all numbers, so a bare
      // `x < NaN` would be TRUE for every castable row (gt/ge only
      // happen to work). The reference fails the query outright (DuckDB
      // cannot bind its NaN literal); matching nothing is the documented
      // graceful form of the same outcome.
      case Ops.GT | Ops.GE | Ops.LT | Ops.LE if normalized.isNaN =>
        lit(false)
      case Ops.GT => tryCastDouble(f.k) > normalized
      case Ops.GE => tryCastDouble(f.k) >= normalized
      case Ops.LT => tryCastDouble(f.k) < normalized
      case Ops.LE => tryCastDouble(f.k) <= normalized
      case other =>
        throw new IllegalArgumentException(s"Invalid operator $other")
    }
  }
}
