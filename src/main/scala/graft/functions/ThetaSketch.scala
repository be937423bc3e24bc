package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketches (DataSketches): mergeable distinct-count sketches that
  * — unlike HLL — support SET OPERATIONS on the sketches themselves:
  * |A ∩ B| and |A \ B| without a second pass over raw data. The
  * "distinct users in both cohorts" / audience-overlap query class at
  * 100 TB: per-segment sketches are bytes in a column, unions/
  * intersections run on the merged payloads. Same TypedImperativeAggregate
  * + binary-payload idiom as the HLL/DDSketch interop aggregates; the
  * library's fixed default seed keeps every estimate deterministic. */
object ThetaFunctions {
  import GraftColumnBridge.{column => toCol, expression => toExpr}

  /** Aggregate raw values into a compact theta sketch (binary). */
  def thetaSketch(c: Column, lgK: Int = 12): Column =
    toCol(ThetaAgg(toExpr(c), lgK).toAggregateExpression())

  /** Union serialized theta sketches (binary column) into one. */
  def thetaUnion(c: Column, lgK: Int = 12): Column =
    toCol(ThetaUnionAgg(toExpr(c), lgK).toAggregateExpression())

  /** Distinct estimate of a serialized sketch. */
  def thetaEstimateOf(sketch: Column): Column =
    toCol(ThetaEstimateOf(toExpr(sketch)))

  /** |A ∩ B| estimate from two serialized sketches. */
  def thetaIntersectEstimate(a: Column, b: Column): Column =
    toCol(ThetaSetOpEstimate(toExpr(a), toExpr(b), intersect = true))

  /** |A \ B| estimate from two serialized sketches. */
  def thetaDiffEstimate(a: Column, b: Column): Column =
    toCol(ThetaSetOpEstimate(toExpr(a), toExpr(b), intersect = false))
}

sealed trait ThetaAggBase extends TypedImperativeAggregate[Union] {
  def lgK: Int
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
  override def merge(b: Union, o: Union): Union = {
    b.union(o.getResult); b
  }
  override def eval(b: Union): Any = b.getResult.toByteArray
  override def serialize(b: Union): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): Union =
    SetOperation.heapify(Memory.wrap(bytes)).asInstanceOf[Union]
}

/** Aggregate: theta sketch of an atomic column. Strings update as UTF-8
  * via the library's own update(String) — cross-engine-stable identity
  * hashing, like the HLL interop aggregate. */
case class ThetaAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends ThetaAggBase {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType | DoubleType | BinaryType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an atomic input, got ${t.sql}")
  }

  override def update(b: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case s: UTF8String => b.update(s.toString)
      case l: java.lang.Long => b.update(l.longValue())
      case i: java.lang.Integer => b.update(i.longValue())
      case d: java.lang.Double => b.update(d.doubleValue())
      case bytes: Array[Byte] => b.update(bytes)
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "theta_sketch"
}

/** Aggregate: union serialized theta sketches. */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends ThetaAggBase {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${t.sql}")
  }

  override def update(b: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null)
      b.union(Sketches.wrapSketch(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaUnionAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "theta_union"
}

/** Scalar: distinct estimate of a serialized theta sketch. */
case class ThetaEstimateOf(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ComputeUnaryCodegen {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"theta_estimate_of requires binary input, got ${t.sql}")
  }

  override def compute(input: Any): Any =
    Sketches.wrapSketch(Memory.wrap(input.asInstanceOf[Array[Byte]]))
      .getEstimate

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimateOf =
    copy(child = newChild)
}

/** Scalar: |A ∩ B| (intersect = true) or |A \ B| estimate from two
  * serialized theta sketches. */
case class ThetaSetOpEstimate(left: Expression, right: Expression,
    intersect: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ComputeBinaryCodegen {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary inputs, got ${l.sql}, ${r.sql}")
    }

  override def compute(l: Any, r: Any): Any = {
    val a = Sketches.wrapSketch(Memory.wrap(l.asInstanceOf[Array[Byte]]))
    val b = Sketches.wrapSketch(Memory.wrap(r.asInstanceOf[Array[Byte]]))
    if (intersect)
      SetOperation.builder().buildIntersection().intersect(a, b).getEstimate
    else
      SetOperation.builder().buildANotB().aNotB(a, b).getEstimate
  }

  override def prettyName: String =
    if (intersect) "theta_intersect_estimate" else "theta_diff_estimate"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaSetOpEstimate =
    copy(left = newLeft, right = newRight)
}
