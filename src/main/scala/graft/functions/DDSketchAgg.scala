package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** DDSketch (Masson, Rim, Lee: "DDSketch: A Fast and Fully-Mergeable
  * Quantile Sketch with Relative-Error Guarantees", VLDB 2019) — the same
  * quantile contract as the reference's percentile aggregation
  * (reference core/src/main/scala/com/cardinal/utils/ast/Aggregator.scala:28-41,
  * relative accuracy 0.01): quantile estimates within ±1% *relative*
  * error, and sketches merge losslessly (merge-then-query ==
  * query-of-union), which is what makes the partial/final aggregation
  * split safe on any executor topology.
  *
  * Log-bucketed counts: bucket(x) = ceil(log_gamma(x)), gamma =
  * (1+α)/(1-α). Sparse map store (bucket -> count) with zero- and
  * negative-value side stores. ~log_gamma(max/min) entries — a few hundred
  * for realistic value ranges.
  */
final class DDSketchBuffer(val alpha: Double) extends Serializable {
  val gamma: Double = (1 + alpha) / (1 - alpha)
  private val logGamma: Double = math.log(gamma)

  var zeroCount: Long = 0L
  val positive = new java.util.HashMap[Int, Long]()
  val negative = new java.util.HashMap[Int, Long]()
  var count: Long = 0L

  private def bucket(x: Double): Int = math.ceil(math.log(x) / logGamma).toInt

  /** Bucket midpoint: 2*gamma^i/(gamma+1) — the canonical DDSketch
    * estimate minimizing relative error within the bucket. */
  private def value(i: Int): Double = 2.0 * math.pow(gamma, i) / (gamma + 1)

  def insert(x: Double): Unit = {
    if (x > 0) addTo(positive, bucket(x), 1L)
    else if (x < 0) addTo(negative, bucket(-x), 1L)
    else zeroCount += 1
    count += 1
  }

  private def addTo(m: java.util.HashMap[Int, Long], k: Int, n: Long): Unit =
    m.merge(k, n, (a, b) => a + b)

  def merge(other: DDSketchBuffer): Unit = {
    require(other.alpha == alpha, "cannot merge sketches of different accuracy")
    other.positive.forEach((k, v) => addTo(positive, k, v))
    other.negative.forEach((k, v) => addTo(negative, k, v))
    zeroCount += other.zeroCount
    count += other.count
  }

  /** Quantile by rank walk: negatives (descending magnitude), zeros,
    * positives (ascending bucket). */
  def quantile(q: Double): Double = {
    // an out-of-range q would silently clamp — q>1 walks off the end and
    // returns the max bucket, masking the caller's bug
    require(q >= 0.0 && q <= 1.0, s"quantile $q out of [0, 1]")
    if (count == 0) return Double.NaN
    val rank = math.max(math.ceil(q * count).toLong, 1L)
    var seen = 0L
    val negKeys = {
      val ks = new Array[Int](negative.size)
      val it = negative.keySet.iterator; var i = 0
      while (it.hasNext) { ks(i) = it.next(); i += 1 }
      java.util.Arrays.sort(ks)
      ks.reverse // large magnitude (most negative) first
    }
    for (k <- negKeys) {
      seen += negative.get(k)
      if (seen >= rank) return -value(k)
    }
    seen += zeroCount
    if (seen >= rank) return 0.0
    val posKeys = {
      val ks = new Array[Int](positive.size)
      val it = positive.keySet.iterator; var i = 0
      while (it.hasNext) { ks(i) = it.next(); i += 1 }
      java.util.Arrays.sort(ks)
      ks
    }
    for (k <- posKeys) {
      seen += positive.get(k)
      if (seen >= rank) return value(k)
    }
    if (posKeys.nonEmpty) value(posKeys.last) else 0.0
  }

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(
      8 + 8 + 8 + 4 + positive.size * 12 + 4 + negative.size * 12)
    buf.putDouble(alpha).putLong(zeroCount).putLong(count)
    buf.putInt(positive.size)
    positive.forEach((k, v) => { buf.putInt(k); buf.putLong(v) })
    buf.putInt(negative.size)
    negative.forEach((k, v) => { buf.putInt(k); buf.putLong(v) })
    buf.array()
  }
}

object DDSketchBuffer {
  def deserialize(bytes: Array[Byte]): DDSketchBuffer = {
    val buf = ByteBuffer.wrap(bytes)
    val s = new DDSketchBuffer(buf.getDouble)
    s.zeroCount = buf.getLong
    s.count = buf.getLong
    var n = buf.getInt
    while (n > 0) { s.positive.put(buf.getInt, buf.getLong); n -= 1 }
    n = buf.getInt
    while (n > 0) { s.negative.put(buf.getInt, buf.getLong); n -= 1 }
    s
  }
}

/** Aggregate function: DDSketch quantile of a double column.
  * TypedImperativeAggregate gives the classic partial/final split: update
  * on executors, binary-serialized partial buffers through the shuffle,
  * merge on reducers (ObjectHashAggregateExec).
  */
case class DDSketchQuantile(
    child: Expression,
    quantile: Double,
    alpha: Double = 0.01,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DDSketchBuffer] {

  require(quantile >= 0.0 && quantile <= 1.0,
    s"quantile $quantile out of [0, 1]")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | LongType | IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ddsketch_quantile requires a numeric input, got ${t.sql}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): DDSketchBuffer =
    new DDSketchBuffer(alpha)

  override def update(b: DDSketchBuffer, input: InternalRow): DDSketchBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val d = v match {
        case d: Double => d
        case f: Float => f.toDouble
        case l: Long => l.toDouble
        case i: Int => i.toDouble
      }
      if (!d.isNaN) b.insert(d)
    }
    b
  }

  override def merge(b: DDSketchBuffer, o: DDSketchBuffer): DDSketchBuffer = {
    b.merge(o); b
  }

  override def eval(b: DDSketchBuffer): Any =
    if (b.count == 0) null else b.quantile(quantile)

  override def serialize(b: DDSketchBuffer): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): DDSketchBuffer =
    DDSketchBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): DDSketchQuantile =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DDSketchQuantile =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DDSketchQuantile =
    copy(child = newChildren.head)

  override def prettyName: String = "ddsketch_quantile"
}

/** Aggregate function returning the serialized sketch itself (binary) —
  * for materialized rollups that are re-merged at query time, the way the
  * reference persists per-segment sketches and merges them at the
  * coordinator (TimeGroupedSketchAggregator.scala:36-55). */
case class DDSketchAgg(
    child: Expression,
    alpha: Double = 0.01,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DDSketchBuffer] {

  override def children: Seq[Expression] = Seq(child)

  // same numeric gate as DDSketchQuantile: without it a string column
  // passes analysis and every task dies in update's type match
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | LongType | IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ddsketch requires a numeric input, got ${t.sql}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): DDSketchBuffer =
    new DDSketchBuffer(alpha)

  override def update(b: DDSketchBuffer, input: InternalRow): DDSketchBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val d = v match {
        case d: Double => d
        case f: Float => f.toDouble
        case l: Long => l.toDouble
        case i: Int => i.toDouble
      }
      if (!d.isNaN) b.insert(d)
    }
    b
  }

  override def merge(b: DDSketchBuffer, o: DDSketchBuffer): DDSketchBuffer = {
    b.merge(o); b
  }

  override def eval(b: DDSketchBuffer): Any = b.serialize()
  override def serialize(b: DDSketchBuffer): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): DDSketchBuffer =
    DDSketchBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): DDSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DDSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DDSketchAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "ddsketch"
}

/** Scalar: quantile of a serialized DDSketch (query-time read of a
  * persisted rollup sketch). */
case class DDSketchQuantileOf(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ComputeBinaryCodegen {

  override def dataType: DataType = DoubleType
  // null for an empty sketch even over non-nullable children — the
  // codegen trait only emits the null-result branch when nullable
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ddsketch_quantile_of requires (binary, double), got ${l.sql}, ${r.sql}")
    }

  override def compute(sketch: Any, q: Any): Any = {
    val b = DDSketchBuffer.deserialize(sketch.asInstanceOf[Array[Byte]])
    // empty sketch → null, matching the aggregate's convention — a NaN
    // would rank ABOVE every real value in orderBy/max
    if (b.count == 0) null else b.quantile(q.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DDSketchQuantileOf =
    copy(left = newLeft, right = newRight)
}

object DDSketchFunctions {
  /** ddsketch quantile aggregate as a Column. */
  def ddsketchQuantile(c: Column, q: Double, alpha: Double = 0.01): Column =
    GraftColumnBridge.column(
      DDSketchQuantile(GraftColumnBridge.expression(c), q, alpha)
        .toAggregateExpression())

  /** serialized-sketch aggregate as a Column (binary). */
  def ddsketch(c: Column, alpha: Double = 0.01): Column =
    GraftColumnBridge.column(
      DDSketchAgg(GraftColumnBridge.expression(c), alpha)
        .toAggregateExpression())

  /** quantile of a serialized sketch column. */
  def ddsketchQuantileOf(sketch: Column, q: Column): Column =
    GraftColumnBridge.column(DDSketchQuantileOf(
      GraftColumnBridge.expression(sketch), GraftColumnBridge.expression(q)))
}
