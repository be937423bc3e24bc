package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007, with the
  * standard small/large-range corrections) at the reference's accuracy
  * point: lgK=12 → m=4096 registers, ~±1.6% standard error (reference
  * Aggregator.scala:43-60, HllSketch(12, HLL_4)).
  *
  * The register array is the aggregation buffer; merge is register-wise
  * max — the canonical mergeable-sketch contract, so partial aggregation,
  * shuffle, and persisted per-segment sketches (union-merged at query
  * time, reference QueryEngineV2.scala:653-668) all compose. Spark's own
  * `approx_count_distinct` (HLL++) remains the default query path; this
  * aggregate exists for sketch-column persistence and running unions.
  */
final class HllBuffer(val lgK: Int) extends Serializable {
  // lower bound: the bias constant below assumes m >= 128; upper bound:
  // keeps the register array sane and the idx shift meaningful (Scala
  // shifts wrap mod 32 — an unchecked lgK=32 would give m = 1)
  require(lgK >= 7 && lgK <= 26, s"lgK $lgK out of range [7, 26]")
  val m: Int = 1 << lgK
  val registers = new Array[Byte](m)

  def insertHash(h: Long): Unit = {
    val idx = (h >>> (64 - lgK)).toInt
    val rest = h << lgK
    // rank = leading zeros of the remaining bits + 1, capped
    val rank = (java.lang.Long.numberOfLeadingZeros(rest | (1L << (lgK - 1))) + 1)
      .min(64 - lgK + 1).toByte
    if (rank > registers(idx)) registers(idx) = rank
  }

  def merge(o: HllBuffer): Unit = {
    require(o.lgK == lgK, "cannot merge HLL sketches of different lgK")
    var i = 0
    while (i < m) {
      if (o.registers(i) > registers(i)) registers(i) = o.registers(i)
      i += 1
    }
  }

  def estimate(): Double = {
    val alpha = 0.7213 / (1 + 1.079 / m) // m >= 128
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += 1.0 / (1L << registers(i))
      if (registers(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / sum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
    else if (raw > (1L << 32) / 30.0)
      -(1L << 32).toDouble * math.log1p(-raw / (1L << 32).toDouble)
    else raw
  }

  def serialize(): Array[Byte] = {
    val out = new Array[Byte](1 + m)
    out(0) = lgK.toByte
    System.arraycopy(registers, 0, out, 1, m)
    out
  }
}

object HllBuffer {
  def deserialize(bytes: Array[Byte]): HllBuffer = {
    // a foreign/corrupt payload must fail loudly, not produce a
    // confident estimate from garbage registers: the header byte must be
    // a legal lgK AND the length must match exactly
    require(bytes != null && bytes.length >= 1,
      "malformed HLL payload: empty")
    val lgK = bytes(0).toInt
    require(lgK >= 7 && lgK <= 26,
      s"malformed HLL payload: header lgK $lgK out of range")
    require(bytes.length == 1 + (1 << lgK),
      s"malformed HLL payload: ${bytes.length} bytes for lgK $lgK")
    val b = new HllBuffer(lgK)
    System.arraycopy(bytes, 1, b.registers, 0, b.m)
    b
  }
}

sealed trait HllAggBase extends TypedImperativeAggregate[HllBuffer] {
  def child: Expression
  def lgK: Int

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType | DoubleType | BinaryType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an atomic input, got ${t.sql}")
  }

  override def createAggregationBuffer(): HllBuffer = new HllBuffer(lgK)

  override def update(b: HllBuffer, input: InternalRow): HllBuffer = {
    val v = child.eval(input)
    if (v != null) b.insertHash(XxHash64Function.hash(v, child.dataType, 42L))
    b
  }

  override def merge(b: HllBuffer, o: HllBuffer): HllBuffer = { b.merge(o); b }
  override def serialize(b: HllBuffer): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): HllBuffer =
    HllBuffer.deserialize(bytes)
}

/** Distinct estimate (double). */
case class HllEstimate(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends HllAggBase {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def eval(b: HllBuffer): Any = b.estimate()

  override def withNewMutableAggBufferOffset(o: Int): HllEstimate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllEstimate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllEstimate =
    copy(child = newChildren.head)
  override def prettyName: String = "hll_estimate"
}

/** Serialized sketch (binary) for persisted rollups / running unions. */
case class HllAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends HllAggBase {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def eval(b: HllBuffer): Any = b.serialize()

  override def withNewMutableAggBufferOffset(o: Int): HllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "hll_sketch"
}

/** Scalar: estimate from a serialized sketch. */
case class HllEstimateOf(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ComputeUnaryCodegen {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hll_estimate_of requires binary input, got ${t.sql}")
  }

  override def compute(input: Any): Any =
    HllBuffer.deserialize(input.asInstanceOf[Array[Byte]]).estimate()

  override protected def withNewChildInternal(newChild: Expression): HllEstimateOf =
    copy(child = newChild)
}

object HllFunctions {
  def hllEstimate(c: Column, lgK: Int = 12): Column =
    GraftColumnBridge.column(
      HllEstimate(GraftColumnBridge.expression(c), lgK).toAggregateExpression())

  def hllSketch(c: Column, lgK: Int = 12): Column =
    GraftColumnBridge.column(
      HllAgg(GraftColumnBridge.expression(c), lgK).toAggregateExpression())

  def hllEstimateOf(sketch: Column): Column =
    GraftColumnBridge.column(
      HllEstimateOf(GraftColumnBridge.expression(sketch)))
}
