package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as an ordinary Catalyst expression.
  *
  * The filter bytes are a PLAN CONSTANT (an offline artifact — e.g. the
  * fingerprint set of everything ever ingested), shipped to executors
  * once via the expression's codegen reference object and deserialized
  * lazily per executor, so the probe is a map-side test with no join, no
  * shuffle, and no per-row deserialization. Spark's own
  * `BloomFilterMightContain` is reserved for internal runtime filters;
  * this is the user-facing equivalent for persisted filters.
  */
object BloomExpressions {

  /** True iff `hash` (a 64-bit key column) might be in the serialized
    * `org.apache.spark.util.sketch.BloomFilter`. No false negatives. */
  def mightContain(filterBytes: Array[Byte], hash: Column): Column =
    GraftColumnBridge.column(
      BloomMightContainLong(GraftColumnBridge.expression(hash), filterBytes))
}

/** `bloom.mightContainLong(child)` with the deserialized filter cached in
  * the expression instance — whole-stage-codegen friendly via
  * [[ComputeUnaryCodegen]] (one virtual call per row, no fallback). */
case class BloomMightContainLong(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with ComputeUnaryCodegen {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint hash input, got ${t.sql}")
  }

  override def dataType: DataType = BooleanType

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  override def compute(input: Any): Any =
    java.lang.Boolean.valueOf(bloom.mightContainLong(input.asInstanceOf[Long]))

  override def prettyName: String = "graft_bloom_might_contain"

  // content-based equality over the byte payload: Array[Byte] compares
  // by reference in a case class, which would defeat expression
  // canonicalization (semanticEquals, common-subexpression elimination,
  // plan/exchange reuse) for byte-identical filters from separate reads
  override def equals(other: Any): Boolean = other match {
    case o: BloomMightContainLong =>
      child == o.child && java.util.Arrays.equals(filterBytes, o.filterBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(filterBytes)

  override protected def withNewChildInternal(newChild: Expression)
      : BloomMightContainLong = copy(child = newChild)
}
