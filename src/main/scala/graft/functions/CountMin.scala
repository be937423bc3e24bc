package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Count-Min frequency sketch (Cormode & Muthukrishnan 2005): a
  * depth×width counter matrix; insert adds 1 to one counter per row,
  * estimate takes the min over the rows — never an underestimate, over
  * by at most ε·N with probability 1−δ (ε = e/width, δ = e^−depth).
  *
  * This is the 100 TB frequency path: memory is FIXED at depth·width
  * counters no matter how large the vocabulary grows (an exact
  * groupBy(token) count table grows with the distinct-token count —
  * unbounded on web-scale corpora), and the matrix is ADDITIVE — merge
  * is element-wise sum, so partial aggregation collapses updates
  * map-side, the shuffle carries one matrix per group, per-segment
  * sketches persist as columns, and any set of sketches unions by
  * addition. Addition commutes: the sketch is identical under any row
  * order or partitioning, so estimates are deterministic facts of the
  * input multiset (unlike sampling-based frequency estimators).
  *
  * The depth bucket indices derive from one 64-bit hash via
  * Kirsch–Mitzenmacher double hashing (h1 + d·h2, h2 forced odd) —
  * one xxhash64 per update, not depth of them.
  */
final class CmBuffer(val depth: Int, val width: Int) extends Serializable {
  require(depth >= 1 && depth <= 16, s"depth $depth out of range [1, 16]")
  require(width >= 16 && width <= (1 << 24),
    s"width $width out of range [16, ${1 << 24}]")
  val counters = new Array[Long](depth * width)

  private def bucket(h: Long, d: Int): Int = {
    val h1 = h
    val h2 = (h >>> 32) | 1L // odd → full period mod any power-of-two width
    (((h1 + d.toLong * h2) & Long.MaxValue) % width).toInt
  }

  def add(h: Long, inc: Long = 1L): Unit = {
    var d = 0
    while (d < depth) {
      counters(d * width + bucket(h, d)) += inc
      d += 1
    }
  }

  def estimate(h: Long): Long = {
    var est = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = counters(d * width + bucket(h, d))
      if (c < est) est = c
      d += 1
    }
    est
  }

  def merge(o: CmBuffer): Unit = {
    require(o.depth == depth && o.width == width,
      s"cannot merge CM sketches of shape ${o.depth}x${o.width} into ${depth}x$width")
    var i = 0
    while (i < counters.length) {
      counters(i) += o.counters(i)
      i += 1
    }
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(1 + 4 + counters.length * 8)
    bb.put(depth.toByte).putInt(width)
    var i = 0
    while (i < counters.length) { bb.putLong(counters(i)); i += 1 }
    bb.array()
  }
}

object CmBuffer {
  def deserialize(bytes: Array[Byte]): CmBuffer = {
    // a foreign/corrupt payload must fail loudly, not estimate from
    // garbage counters: header shape must be legal AND the length exact
    require(bytes != null && bytes.length >= 5,
      "malformed CM payload: too short for the depth/width header")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val depth = bb.get().toInt
    val width = bb.getInt()
    require(depth >= 1 && depth <= 16 && width >= 16 && width <= (1 << 24),
      s"malformed CM payload: header shape ${depth}x$width")
    require(bytes.length == 1 + 4 + depth * width * 8,
      s"malformed CM payload: ${bytes.length} bytes for shape ${depth}x$width")
    val b = new CmBuffer(depth, width)
    var i = 0
    while (i < b.counters.length) { b.counters(i) = bb.getLong(); i += 1 }
    b
  }
}

/** Aggregate: serialized CM sketch (binary) of the input values. */
case class CmAgg(
    child: Expression,
    depth: Int = 4,
    width: Int = 8192,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType | DoubleType | BinaryType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an atomic input, got ${t.sql}")
  }

  override def createAggregationBuffer(): CmBuffer = new CmBuffer(depth, width)

  override def update(b: CmBuffer, input: InternalRow): CmBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(XxHash64Function.hash(v, child.dataType, 42L))
    b
  }

  override def merge(b: CmBuffer, o: CmBuffer): CmBuffer = { b.merge(o); b }
  override def eval(b: CmBuffer): Any = b.serialize()
  override def serialize(b: CmBuffer): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): CmBuffer =
    CmBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CmAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "cm_sketch"
}

/** Aggregate: union (element-wise sum) of serialized CM sketches — the
  * rollup/re-aggregation path over persisted per-segment sketch columns. */
case class CmMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[CmBuffer]] {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  // null for zero input sketches: there is no universal empty shape
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary CM payloads, got ${t.sql}")
  }

  override def createAggregationBuffer(): Option[CmBuffer] = None

  override def update(b: Option[CmBuffer], input: InternalRow): Option[CmBuffer] = {
    child.eval(input) match {
      case null => b
      case bytes =>
        val o = CmBuffer.deserialize(bytes.asInstanceOf[Array[Byte]])
        b match {
          case Some(acc) => acc.merge(o); b
          case None => Some(o)
        }
    }
  }

  override def merge(b: Option[CmBuffer], o: Option[CmBuffer]): Option[CmBuffer] =
    (b, o) match {
      case (Some(x), Some(y)) => x.merge(y); b
      case (None, _) => o
      case _ => b
    }

  override def eval(b: Option[CmBuffer]): Any = b.map(_.serialize()).orNull

  override def serialize(b: Option[CmBuffer]): Array[Byte] =
    b.map(_.serialize()).getOrElse(Array.emptyByteArray)
  override def deserialize(bytes: Array[Byte]): Option[CmBuffer] =
    if (bytes.isEmpty) None else Some(CmBuffer.deserialize(bytes))

  override def withNewMutableAggBufferOffset(o: Int): CmMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmMergeAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "cm_merge"
}

/** Scalar: estimated count of `right` in a serialized CM sketch. The
  * probe hashes exactly as [[CmAgg.update]] does, so estimates are valid
  * for any probe value of the aggregated input type. */
case class CmEstimateOf(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ComputeBinaryCodegen {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType | LongType | IntegerType | DoubleType |
            BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cm_estimate_of requires (binary, atomic), got ${l.sql}, ${r.sql}")
    }

  override def compute(sketch: Any, v: Any): Any = {
    val b = CmBuffer.deserialize(sketch.asInstanceOf[Array[Byte]])
    b.estimate(XxHash64Function.hash(v, right.dataType, 42L))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmEstimateOf =
    copy(left = newLeft, right = newRight)
}

object CmFunctions {
  /** CM sketch aggregate as a Column (binary). */
  def cmSketch(c: Column, depth: Int = 4, width: Int = 8192): Column =
    GraftColumnBridge.column(
      CmAgg(GraftColumnBridge.expression(c), depth, width)
        .toAggregateExpression())

  /** union of serialized sketches as a Column (binary). */
  def cmMerge(sketch: Column): Column =
    GraftColumnBridge.column(
      CmMergeAgg(GraftColumnBridge.expression(sketch)).toAggregateExpression())

  /** estimated count of `v` in a serialized sketch column. */
  def cmEstimateOf(sketch: Column, v: Column): Column =
    GraftColumnBridge.column(CmEstimateOf(
      GraftColumnBridge.expression(sketch), GraftColumnBridge.expression(v)))
}
