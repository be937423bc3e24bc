package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** KLL quantile sketch aggregates (Karnin–Lang–Liberty 2016) over the
  * public DataSketches library — the UNIFORM-rank-error complement to the
  * DDSketch family ([[DDSketchAgg]]): DDSketch bounds RELATIVE VALUE
  * error (±α·v per quantile, unbounded bucket count on heavy tails);
  * KLL bounds RANK error (±ε of the true rank, ~1.65% at k=200, hard
  * ~3 KB state cap regardless of the value distribution). A telemetry
  * engine wants both: DDSketch for latency percentiles (value accuracy
  * near p99), KLL for budget/threshold questions ("what value splits the
  * top decile") where rank accuracy matters and adversarial value
  * distributions must not grow state.
  *
  * 100 TB shape: the classic partial/final TypedImperativeAggregate
  * split — per-partition sketches of ≤ ~3 KB merge associatively on the
  * reduce side, so the exchange carries one sketch per (group,
  * partition), never rows. The byte image is the library's portable
  * serialization: sketches written here heapify anywhere DataSketches
  * runs (Druid, Hive, Pinot, the reference's JVM) and vice versa — the
  * same interop contract as [[DsHllAgg]] (k1) and the DDSketch proto
  * codec (k2).
  */
sealed trait KllAggBase extends TypedImperativeAggregate[KllDoublesSketch] {
  def k: Int
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)
  override def merge(b: KllDoublesSketch, o: KllDoublesSketch): KllDoublesSketch = {
    b.merge(o); b
  }
  override def eval(b: KllDoublesSketch): Any = b.toByteArray
  override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    val s = KllDoublesSketch.newHeapInstance(k)
    s.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    s
  }
}

/** Aggregate: KLL(k) sketch of a numeric column → portable byte image. */
case class KllAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KllAggBase {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | LongType | IntegerType | FloatType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric input, got ${t.sql}")
  }

  override def update(b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) v match {
      case d: java.lang.Double => b.update(d.doubleValue())
      case f: java.lang.Float => b.update(f.doubleValue())
      case l: java.lang.Long => b.update(l.doubleValue())
      case i: java.lang.Integer => b.update(i.doubleValue())
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): KllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "kll_sketch"
}

/** Aggregate: merge serialized KLL byte images (the query-time re-merge
  * of per-segment sketches — the same shape as [[DsHllUnionAgg]]). */
case class KllMergeAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KllAggBase {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${t.sql}")
  }

  override def update(b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      b.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "kll_merge"
}

/** Scalar: quantile estimate at `rank` from a serialized KLL image
  * (inclusive search criterion — the library default). Null for an
  * empty sketch. */
case class KllQuantileOf(child: Expression, rank: Double)
    extends UnaryExpression with ComputeUnaryCodegen {
  require(rank >= 0.0 && rank <= 1.0, s"rank $rank outside [0, 1]")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kll_quantile_of requires binary input, got ${t.sql}")
  }

  override def compute(input: Any): Any = {
    val s = KllDoublesSketch.heapify(
      Memory.wrap(input.asInstanceOf[Array[Byte]]))
    if (s.isEmpty) null else s.getQuantile(rank)
  }

  override protected def withNewChildInternal(newChild: Expression): KllQuantileOf =
    copy(child = newChild)
}

object KllFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column => col, expression => expr}

  def kllSketch(c: Column, k: Int = 200): Column =
    col(KllAgg(expr(c), k).toAggregateExpression())

  def kllMerge(c: Column, k: Int = 200): Column =
    col(KllMergeAgg(expr(c), k).toAggregateExpression())

  def kllQuantileOf(sketch: Column, rank: Double): Column =
    col(KllQuantileOf(expr(sketch), rank))
}
