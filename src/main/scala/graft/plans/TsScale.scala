package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Storage-resolution adapter rule: unwraps comparisons against a
  * positively-scaled long attribute so they reach the parquet scan as
  * plain attribute predicates.
  *
  * Why it exists: the engine's canonical event-time column is epoch-nanos
  * LongType, but the raw segment files may store TIMESTAMP(MICROS)
  * (`Tables.load` reads the raw int64 micros and projects `ts_raw * 1000`).
  * A user filter `ts >= :nanos` then collapses through the projection to
  * `ts_raw * 1000 >= :nanos`, which the parquet source cannot push. This
  * rule rewrites it to `ts_raw >= ceilDiv(:nanos, 1000)` — an exact
  * algebraic equivalence over longs (multiplication by a positive constant
  * is monotone), after which FileSourceStrategy extracts it into
  * `PushedFilters` and row groups prune on int64 min/max again.
  *
  * Scope kept deliberately narrow: only `AttributeReference * positive
  * long literal` compared to a long literal. Precondition (documented, not
  * checked): the scaled product must not overflow Long for any data value —
  * epoch micros × 1000 tops out ~2×10^18 < Long.Max. Null semantics are
  * unchanged (comparisons stay null-propagating in `a`); an EqualTo with a
  * non-divisible literal is left untouched rather than folded to false so
  * the rewrite never changes nullability.
  *
  * Installed via `spark.experimental.extraOptimizations` (runs after the
  * main optimizer batch, by which point predicates sit directly above the
  * relation with aliases substituted — exactly the shape this matches), or
  * at session build time through [[GraftExtensions]].
  */
object UnwrapScaledComparison extends Rule[LogicalPlan] {

  // ceilDiv via negated floorDiv: overflow-free for all v > Long.Min.
  private def floorDiv(v: Long, c: Long): Long = Math.floorDiv(v, c)
  private def ceilDiv(v: Long, c: Long): Long = -Math.floorDiv(-v, c)

  private object Scaled {
    def unapply(e: Expression): Option[(AttributeReference, Long)] = e match {
      case Multiply(a: AttributeReference, Literal(c: Long, LongType), _)
        if c > 0 => Some((a, c))
      case Multiply(Literal(c: Long, LongType), a: AttributeReference, _)
        if c > 0 => Some((a, c))
      case _ => None
    }
  }

  private object Lit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // a*c > v  ⟺  a > floor(v/c)     (strict: any a beyond the floor)
      case GreaterThan(Scaled(a, c), Lit(v)) => GreaterThan(a, Literal(floorDiv(v, c)))
      // a*c >= v ⟺  a >= ceil(v/c)
      case GreaterThanOrEqual(Scaled(a, c), Lit(v)) => GreaterThanOrEqual(a, Literal(ceilDiv(v, c)))
      // a*c < v  ⟺  a < ceil(v/c)
      case LessThan(Scaled(a, c), Lit(v)) => LessThan(a, Literal(ceilDiv(v, c)))
      // a*c <= v ⟺  a <= floor(v/c)
      case LessThanOrEqual(Scaled(a, c), Lit(v)) => LessThanOrEqual(a, Literal(floorDiv(v, c)))
      case EqualTo(Scaled(a, c), Lit(v)) if v % c == 0 => EqualTo(a, Literal(v / c))
      case EqualTo(Lit(v), Scaled(a, c)) if v % c == 0 => EqualTo(a, Literal(v / c))
      // literal-on-left mirrors, normalized to attribute-on-left
      case GreaterThan(Lit(v), Scaled(a, c)) => LessThan(a, Literal(ceilDiv(v, c)))
      case GreaterThanOrEqual(Lit(v), Scaled(a, c)) => LessThanOrEqual(a, Literal(floorDiv(v, c)))
      case LessThan(Lit(v), Scaled(a, c)) => GreaterThan(a, Literal(floorDiv(v, c)))
      case LessThanOrEqual(Lit(v), Scaled(a, c)) => GreaterThanOrEqual(a, Literal(ceilDiv(v, c)))
    }

  /** Idempotently append this rule to a running session's experimental
    * optimizations (extensions can only inject at builder time). */
  def install(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_ eq this))
      spark.experimental.extraOptimizations = cur :+ this
  }
}
