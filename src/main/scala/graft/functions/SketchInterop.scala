package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level interoperability with the reference's persisted sketch
  * payloads.
  *
  * The reference stores two sketch families in segment data and merges
  * them at query time (reference TimeGroupedSketchAggregator.scala:36-55):
  *
  *  - DDSketch, written by `DDSketches.unboundedDense(0.01)` and read back
  *    via `DDSketchProto.parseFrom` + `DDSketchProtoBinding.fromProto`
  *    (reference BaseExpr.scala:97-102) — i.e. the interchange format is
  *    the public protobuf schema `DDSketch.proto` (DataDog/sketches-java):
  *
  *      message DDSketch { IndexMapping mapping = 1; Store positiveValues = 2;
  *                         Store negativeValues = 3; double zeroCount = 4; }
  *      message IndexMapping { double gamma = 1; double indexOffset = 2;
  *                             Interpolation interpolation = 3; }
  *      message Store { map<sint32, double> binCounts = 1;
  *                      repeated double contiguousBinCounts = 2;
  *                      sint32 contiguousBinIndexOffset = 3; }
  *
  *    [[DdProto]] hand-rolls that wire format (standard protobuf varint /
  *    zigzag / packed-fixed64 encoding — ~100 lines, no library needed)
  *    over [[DdogBuffer]], which reproduces the LogarithmicMapping
  *    semantics of the reader: index(v) = floor(log_γ(v) + indexOffset),
  *    value(i) = γ^(i-indexOffset) · 2γ/(γ+1), quantile by rank
  *    q·(count-1) walking negatives-descending / zero / positives-ascending
  *    (the read surface the reference exposes in BaseExpr.scala:57-84:
  *    p*, min, max, sum, count, avg).
  *
  *  - HLL, written as `new HllSketch(12, TgtHllType.HLL_4).toCompactByteArray`
  *    (reference Aggregator.scala:43-58) and read via `HllSketch.heapify`
  *    + `Union` — the Apache DataSketches library, WHICH SPARK BUNDLES
  *    (datasketches-java backs Spark's own hll_sketch_agg). [[DsHllAgg]]
  *    and friends wrap that same library pinned to the reference's
  *    parameters, so the bytes are mutually mergeable by construction:
  *    sketches we write heapify in the reference, and vice versa.
  *
  * Note on conventions: graft's native [[DDSketchBuffer]] uses
  * ceil-bucketing (bucket i covers (γ^(i-1), γ^i], estimate 2γ^i/(γ+1));
  * the DataDog mapping uses floor-bucketing ([γ^j, γ^(j+1)), estimate
  * γ^j·2γ/(γ+1)). Both satisfy the ±α relative-error contract and align
  * bin-for-bin under j = i - 1, which is what [[DdProto.fromNative]] /
  * [[DdProto.toNative]] apply. Values exactly on a bucket boundary may
  * land one bin apart across the conventions; the returned estimate stays
  * within the accuracy contract either way.
  */
final class DdogBuffer(val gamma: Double, val indexOffset: Double)
    extends Serializable {
  private val logGamma: Double = math.log(gamma)
  /** (1 + relativeAccuracy) = 2γ/(γ+1): bucket-estimate multiplier. */
  private val estMul: Double = 2.0 * gamma / (gamma + 1.0)

  var zeroCount: Double = 0.0
  val positive = new java.util.HashMap[Int, java.lang.Double]()
  val negative = new java.util.HashMap[Int, java.lang.Double]()

  def index(v: Double): Int =
    math.floor(math.log(v) / logGamma + indexOffset).toInt

  def value(i: Int): Double =
    math.exp((i - indexOffset) * logGamma) * estMul

  private def addTo(m: java.util.HashMap[Int, java.lang.Double], k: Int,
      n: Double): Unit =
    m.merge(k, n, (a, b) => a + b)

  def insert(x: Double): Unit =
    if (x > 0) addTo(positive, index(x), 1.0)
    else if (x < 0) addTo(negative, index(-x), 1.0)
    else zeroCount += 1.0

  def addBin(store: Int, bin: Int, count: Double): Unit =
    if (count > 0) addTo(if (store > 0) positive else negative, bin, count)

  def merge(o: DdogBuffer): Unit = {
    require(o.gamma == gamma && o.indexOffset == indexOffset,
      "cannot merge DDSketches with different index mappings")
    o.positive.forEach((k, v) => addTo(positive, k, v))
    o.negative.forEach((k, v) => addTo(negative, k, v))
    zeroCount += o.zeroCount
  }

  private def total(m: java.util.HashMap[Int, java.lang.Double]): Double = {
    var s = 0.0
    val it = m.values.iterator
    while (it.hasNext) s += it.next()
    s
  }

  def count: Double = total(positive) + total(negative) + zeroCount

  private def sortedKeys(m: java.util.HashMap[Int, java.lang.Double]): Array[Int] = {
    val ks = new Array[Int](m.size)
    val it = m.keySet.iterator; var i = 0
    while (it.hasNext) { ks(i) = it.next(); i += 1 }
    java.util.Arrays.sort(ks)
    ks
  }

  /** The reference read path's quantile rule (sketches-java
    * getValueAtQuantile): rank = q·(count-1); walk negatives by
    * descending index (most negative value first), then zeros, then
    * positives ascending; return the first bin whose cumulated count
    * exceeds the rank. */
  def quantile(q: Double): Double = {
    val c = count
    if (c == 0) return Double.NaN
    val rank = q * (c - 1.0)
    var n = 0.0
    val negKeys = sortedKeys(negative)
    var i = negKeys.length - 1
    while (i >= 0) {
      n += negative.get(negKeys(i))
      if (n > rank) return -value(negKeys(i))
      i -= 1
    }
    n += zeroCount
    if (n > rank) return 0.0
    val posKeys = sortedKeys(positive)
    i = 0
    while (i < posKeys.length) {
      n += positive.get(posKeys(i))
      if (n > rank) return value(posKeys(i))
      i += 1
    }
    if (posKeys.nonEmpty) value(posKeys(posKeys.length - 1)) else 0.0
  }

  def min: Double = quantile(0.0)
  def max: Double = quantile(1.0)

  /** Bin-derived sum: Σ count·estimate — within ±α relative of the true
    * sum, which is all the proto payload can reconstruct (the schema
    * carries no exact sum; the reference derives these stats from the
    * parsed bins the same way). */
  def sum: Double = {
    var s = 0.0
    positive.forEach((k, v) => s += v * value(k))
    negative.forEach((k, v) => s -= v * value(k))
    s
  }

  /** (minIndex, dense counts) for the contiguous proto encoding; null
    * counts array when the store is empty. */
  def dense(m: java.util.HashMap[Int, java.lang.Double]): (Int, Array[Double]) = {
    if (m.isEmpty) return (0, null)
    val ks = sortedKeys(m)
    val lo = ks(0); val hi = ks(ks.length - 1)
    val arr = new Array[Double](hi - lo + 1)
    m.forEach((k, v) => arr(k - lo) = v)
    (lo, arr)
  }
}

/** Hand-rolled protobuf wire codec for DDSketch.proto (schema above).
  * Encode emits the canonical layout protobuf-java produces for a
  * dense-store sketch: fields in field-number order, defaults omitted,
  * contiguous counts as a packed fixed64 run. Decode accepts any field
  * order, both bin encodings (sparse map entries and contiguous runs),
  * and skips unknown fields — standard proto semantics, so payloads from
  * any conforming writer parse. */
object DdProto {

  /** γ for relative accuracy α, as the reference's unboundedDense(0.01)
    * computes it: (1+α)/(1-α). */
  def gammaOf(alpha: Double): Double = (1 + alpha) / (1 - alpha)

  // ---- wire primitives ----

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def zigzag32(n: Int): Long = ((n << 1) ^ (n >> 31)).toLong & 0xffffffffL
  private def unzigzag32(n: Long): Int = { val i = n.toInt; (i >>> 1) ^ -(i & 1) }

  private def writeDoubleField(out: ByteArrayOutputStream, field: Int,
      v: Double): Unit = {
    out.write((field << 3) | 1) // wire type 1 = fixed64
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v)
    out.write(b.array(), 0, 8)
  }

  private def writeLenField(out: ByteArrayOutputStream, field: Int,
      payload: Array[Byte]): Unit = {
    out.write((field << 3) | 2) // wire type 2 = length-delimited
    writeVarint(out, payload.length.toLong)
    out.write(payload, 0, payload.length)
  }

  // ---- encode ----

  private def encodeMapping(b: DdogBuffer): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    if (b.gamma != 0.0) writeDoubleField(out, 1, b.gamma)
    if (b.indexOffset != 0.0) writeDoubleField(out, 2, b.indexOffset)
    // interpolation = NONE (0) omitted, proto3 default
    out.toByteArray
  }

  private def encodeStore(minIndex: Int, counts: Array[Double]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    if (counts != null && counts.length > 0) {
      // field 2: contiguousBinCounts, packed doubles
      out.write((2 << 3) | 2)
      writeVarint(out, counts.length * 8L)
      val buf = ByteBuffer.allocate(counts.length * 8)
        .order(ByteOrder.LITTLE_ENDIAN)
      counts.foreach(buf.putDouble)
      out.write(buf.array(), 0, counts.length * 8)
      // field 3: contiguousBinIndexOffset, sint32
      if (minIndex != 0) {
        out.write((3 << 3) | 0)
        writeVarint(out, zigzag32(minIndex))
      }
    }
    out.toByteArray
  }

  def encode(b: DdogBuffer): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeLenField(out, 1, encodeMapping(b))
    val (pLo, pCounts) = b.dense(b.positive)
    writeLenField(out, 2, encodeStore(pLo, pCounts))
    val (nLo, nCounts) = b.dense(b.negative)
    writeLenField(out, 3, encodeStore(nLo, nCounts))
    if (b.zeroCount != 0.0) writeDoubleField(out, 4, b.zeroCount)
    out.toByteArray
  }

  // ---- decode ----

  private final class Reader(bytes: Array[Byte], var pos: Int, val end: Int) {
    private def fail(what: String): Nothing =
      throw new IllegalArgumentException(
        s"malformed DDSketch payload: $what at byte $pos of $end")
    def hasNext: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0; var v = 0L
      while (shift <= 63) {
        if (pos >= end) fail("truncated varint")
        val b = bytes(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
      }
      fail("varint longer than 64 bits")
    }
    def readDouble(): Double = {
      if (pos + 8 > end) fail("truncated double")
      val v = ByteBuffer.wrap(bytes, pos, 8).order(ByteOrder.LITTLE_ENDIAN)
        .getDouble
      pos += 8
      v
    }
    def sub(len: Int): Reader = {
      if (len < 0 || pos + len > end) fail(s"bad length $len")
      val r = new Reader(bytes, pos, pos + len); pos += len; r
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => if (pos + 8 > end) fail("truncated fixed64") else pos += 8
      case 2 =>
        val len = readVarint().toInt
        if (len < 0 || pos + len > end) fail(s"bad length $len") else pos += len
      case 5 => if (pos + 4 > end) fail("truncated fixed32") else pos += 4
      case t => fail(s"unsupported wire type $t")
    }
  }

  /** (bin → count) pairs of one Store message, in encounter order. */
  private def decodeStore(r: Reader): Seq[(Int, Double)] = {
    val bins = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    var contiguous: Array[Double] = null
    var contiguousOffset = 0
    while (r.hasNext) {
      val tag = r.readVarint()
      val field = (tag >>> 3).toInt; val wt = (tag & 7).toInt
      (field, wt) match {
        case (1, 2) => // binCounts map entry
          val e = r.sub(r.readVarint().toInt)
          var k = 0; var v = 0.0
          while (e.hasNext) {
            val et = e.readVarint()
            ((et >>> 3).toInt, (et & 7).toInt) match {
              case (1, 0) => k = unzigzag32(e.readVarint())
              case (2, 1) => v = e.readDouble()
              case (_, w) => e.skip(w)
            }
          }
          bins += ((k, v))
        case (2, 2) => // packed contiguousBinCounts
          val len = r.readVarint().toInt
          if (len % 8 != 0)
            throw new IllegalArgumentException(
              s"malformed DDSketch payload: packed double run of "
                + s"$len bytes is not 8-aligned")
          val n = len / 8
          val arr = new Array[Double](n)
          var i = 0
          while (i < n) { arr(i) = r.readDouble(); i += 1 }
          // proto3: a packed repeated field may arrive as several runs —
          // parsers must concatenate, not last-wins
          contiguous = if (contiguous == null) arr else contiguous ++ arr
        case (2, 1) => // unpacked repeated double
          contiguous =
            (if (contiguous == null) Array.empty[Double] else contiguous) :+
              r.readDouble()
        case (3, 0) => contiguousOffset = unzigzag32(r.readVarint())
        case (_, w) => r.skip(w)
      }
    }
    if (contiguous != null)
      bins ++= contiguous.iterator.zipWithIndex.collect {
        case (c, i) if c != 0.0 => (contiguousOffset + i, c)
      }
    bins.toSeq
  }

  def decode(bytes: Array[Byte]): DdogBuffer = {
    var gamma = 0.0; var indexOffset = 0.0; var interpolation = 0L
    var pos: Seq[(Int, Double)] = Nil
    var neg: Seq[(Int, Double)] = Nil
    var zero = 0.0
    val r = new Reader(bytes, 0, bytes.length)
    while (r.hasNext) {
      val tag = r.readVarint()
      ((tag >>> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) =>
          val m = r.sub(r.readVarint().toInt)
          while (m.hasNext) {
            val mt = m.readVarint()
            ((mt >>> 3).toInt, (mt & 7).toInt) match {
              case (1, 1) => gamma = m.readDouble()
              case (2, 1) => indexOffset = m.readDouble()
              case (3, 0) => interpolation = m.readVarint()
              case (_, w) => m.skip(w)
            }
          }
        // proto3 merges repeated occurrences of an embedded message;
        // for stores the bin lists concatenate (addBin accumulates)
        case (2, 2) => pos = pos ++ decodeStore(r.sub(r.readVarint().toInt))
        case (3, 2) => neg = neg ++ decodeStore(r.sub(r.readVarint().toInt))
        case (4, 1) => zero = r.readDouble()
        case (_, w) => r.skip(w)
      }
    }
    require(gamma > 1.0, s"DDSketch payload without a valid mapping (gamma=$gamma)")
    require(interpolation == 0L,
      s"unsupported IndexMapping interpolation $interpolation (reference writes NONE)")
    val b = new DdogBuffer(gamma, indexOffset)
    b.zeroCount = zero
    pos.foreach { case (k, v) => b.addBin(1, k, v) }
    neg.foreach { case (k, v) => b.addBin(-1, k, v) }
    b
  }

  // ---- bridges to graft's native DDSketchBuffer format ----

  /** Native (ceil-convention, long counts) → DataDog proto payload.
    * Native bucket i ↔ DataDog bin i-1 (same covered interval and
    * estimate; see class doc). */
  def fromNative(s: DDSketchBuffer): DdogBuffer = {
    val b = new DdogBuffer(s.gamma, 0.0)
    b.zeroCount = s.zeroCount.toDouble
    s.positive.forEach((k, v) => b.addBin(1, k - 1, v.toDouble))
    s.negative.forEach((k, v) => b.addBin(-1, k - 1, v.toDouble))
    b
  }

  /** DataDog proto payload → native buffer (bin j → bucket j+1); counts
    * round to whole insertions. */
  def toNative(b: DdogBuffer): DDSketchBuffer = {
    // (gamma-1)/(gamma+1) is not FP-exact: gamma built from alpha=0.01
    // round-trips to 0.009999999999999957, and the native merge requires
    // EXACT accuracy equality — snap to 12 significant decimals so a
    // converted sketch merges with natively-built ones
    val raw = (b.gamma - 1) / (b.gamma + 1)
    val alpha = BigDecimal(raw)
      .round(new java.math.MathContext(12)).toDouble
    val s = new DDSketchBuffer(alpha)
    s.zeroCount = math.round(b.zeroCount)
    s.count += s.zeroCount
    b.positive.forEach { (k, v) =>
      val n = math.round(v)
      s.positive.merge(k + 1, n, (x, y) => x + y); s.count += n
    }
    b.negative.forEach { (k, v) =>
      val n = math.round(v)
      s.negative.merge(k + 1, n, (x, y) => x + y); s.count += n
    }
    s
  }
}

// ================= DDSketch proto aggregates / scalars =================

sealed trait DdProtoAggBase extends TypedImperativeAggregate[DdogBuffer] {
  def alpha: Double
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): DdogBuffer =
    new DdogBuffer(DdProto.gammaOf(alpha), 0.0)
  override def merge(b: DdogBuffer, o: DdogBuffer): DdogBuffer = { b.merge(o); b }
  override def eval(b: DdogBuffer): Any = DdProto.encode(b)
  override def serialize(b: DdogBuffer): Array[Byte] = DdProto.encode(b)
  override def deserialize(bytes: Array[Byte]): DdogBuffer = DdProto.decode(bytes)
}

/** Aggregate: DDSketch of a numeric column, emitted as the reference's
  * protobuf payload (readable by BaseExpr.ddSketchFromBytes). */
case class DdProtoSketchAgg(
    child: Expression,
    alpha: Double = 0.01,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends DdProtoAggBase {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | LongType | IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric input, got ${t.sql}")
  }

  override def update(b: DdogBuffer, input: InternalRow): DdogBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val d = v match {
        case d: Double => d
        case f: Float => f.toDouble
        case l: Long => l.toDouble
        case i: Int => i.toDouble
      }
      // infinities map to a bin at Int.MaxValue and a later dense()
      // materialization then allocates a 2^31 array (or a negative
      // size) — drop them like NaN rather than killing the job
      if (!d.isNaN && !d.isInfinite) b.insert(d)
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): DdProtoSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DdProtoSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DdProtoSketchAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "dd_proto_sketch"
}

/** Aggregate: merge serialized DDSketch proto payloads (the query-time
  * re-aggregation over persisted per-segment sketch columns — reference
  * TimeGroupedSketchAggregator.scala:40-46). */
case class DdProtoMergeAgg(
    child: Expression,
    alpha: Double = 0.01,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends DdProtoAggBase {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${t.sql}")
  }

  // An EMPTY accumulation buffer adopts the first payload's index
  // mapping instead of pinning gammaOf(alpha): payloads written at a
  // different relative accuracy are mutually mergeable and must not
  // throw just because the default buffer disagrees with them. A
  // genuine mapping mismatch BETWEEN payloads still fails loudly in
  // DdogBuffer.merge.
  private def adoptOrMerge(b: DdogBuffer, o: DdogBuffer): DdogBuffer =
    if (b.count == 0.0 &&
        (b.gamma != o.gamma || b.indexOffset != o.indexOffset)) o
    else { b.merge(o); b }

  override def merge(b: DdogBuffer, o: DdogBuffer): DdogBuffer =
    if (o.count == 0.0) b else adoptOrMerge(b, o)

  override def update(b: DdogBuffer, input: InternalRow): DdogBuffer = {
    val v = child.eval(input)
    if (v == null) b
    else {
      // Same empty-payload short-circuit as merge(): a serialized EMPTY
      // sketch may carry a different index mapping than the buffer, and
      // DdogBuffer.merge would throw on the mapping mismatch even though
      // the payload contributes no data.
      val o = DdProto.decode(v.asInstanceOf[Array[Byte]])
      if (o.count == 0.0) b else adoptOrMerge(b, o)
    }
  }

  override def withNewMutableAggBufferOffset(o: Int): DdProtoMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DdProtoMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DdProtoMergeAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "dd_proto_merge"
}

/** Scalar: quantile of a serialized DDSketch proto payload, with the
  * reference read path's semantics (BaseExpr.scala:59-61). */
case class DdProtoQuantileOf(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ComputeBinaryCodegen {

  override def dataType: DataType = DoubleType

  // returns null for an empty sketch even when inputs are non-nullable —
  // without this override the non-nullable codegen path would unbox the
  // null and NPE
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dd_proto_quantile_of requires (binary, double), got ${l.sql}, ${r.sql}")
    }

  override def compute(sketch: Any, q: Any): Any = {
    val b = DdProto.decode(sketch.asInstanceOf[Array[Byte]])
    if (b.count == 0) null else b.quantile(q.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DdProtoQuantileOf =
    copy(left = newLeft, right = newRight)
}

/** Scalar: count/sum/min/max/avg of a serialized DDSketch proto payload
  * (the non-quantile branches of the reference read path,
  * BaseExpr.scala:63-81). */
case class DdProtoStatOf(child: Expression, stat: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ComputeUnaryCodegen {

  require(Set("count", "sum", "min", "max", "avg").contains(stat),
    s"unknown DDSketch stat '$stat'")

  override def dataType: DataType = DoubleType

  // min/max of an empty sketch are null regardless of child nullability
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"dd_proto_stat_of requires binary input, got ${t.sql}")
  }

  override def compute(input: Any): Any = {
    val b = DdProto.decode(input.asInstanceOf[Array[Byte]])
    stat match {
      case "count" => b.count
      case "sum" => b.sum
      case "min" => if (b.count == 0) null else b.min
      case "max" => if (b.count == 0) null else b.max
      // null, not 0.0: an empty sketch has no average, and 0.0 would be
      // indistinguishable from a genuinely measured zero
      case "avg" => if (b.count == 0) null else b.sum / b.count
    }
  }

  override protected def withNewChildInternal(newChild: Expression): DdProtoStatOf =
    copy(child = newChild)
}

/** Scalar: graft-native DDSketch bytes → DataDog proto payload. */
case class DdToProto(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ComputeUnaryCodegen {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"dd_to_proto requires binary input, got ${t.sql}")
  }

  override def compute(input: Any): Any =
    DdProto.encode(DdProto.fromNative(
      DDSketchBuffer.deserialize(input.asInstanceOf[Array[Byte]])))

  override protected def withNewChildInternal(newChild: Expression): DdToProto =
    copy(child = newChild)
}

/** Scalar: DataDog proto payload → graft-native DDSketch bytes. */
case class DdFromProto(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ComputeUnaryCodegen {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"dd_from_proto requires binary input, got ${t.sql}")
  }

  override def compute(input: Any): Any =
    DdProto.toNative(DdProto.decode(input.asInstanceOf[Array[Byte]])).serialize()

  override protected def withNewChildInternal(newChild: Expression): DdFromProto =
    copy(child = newChild)
}

// ================= DataSketches HLL aggregates / scalars =================

sealed trait DsHllAggBase extends TypedImperativeAggregate[Union] {
  def lgK: Int
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): Union = new Union(lgK)
  override def merge(b: Union, o: Union): Union = {
    b.update(o.getResult(TgtHllType.HLL_8)); b
  }
  /** Reference byte contract: HLL_4, compact image
    * (Aggregator.scala:56-58 toCompactByteArray). */
  override def eval(b: Union): Any = b.getResult(TgtHllType.HLL_4).toCompactByteArray
  override def serialize(b: Union): Array[Byte] =
    b.getResult(TgtHllType.HLL_8).toUpdatableByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = new Union(lgK)
    u.update(HllSketch.heapify(bytes))
    u
  }
}

/** Aggregate: DataSketches HLL of a column, emitted as the reference's
  * exact byte format — HllSketch(lgK=12, HLL_4) compact image. String
  * inputs hash as UTF-8 via the library's own update(String), the same
  * call the reference's HLLAggregator makes, so identical entities
  * produce identical coupons and the sketches union exactly. */
case class DsHllAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends DsHllAggBase {

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

  override def withNewMutableAggBufferOffset(o: Int): DsHllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DsHllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DsHllAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "ds_hll_sketch"
}

/** Aggregate: union serialized DataSketches HLL images (the reference's
  * query-time merge: HllSketch.heapify + Union,
  * TimeGroupedSketchAggregator.scala:48-55). Accepts any target type /
  * lgK ≤ lgMaxK the payloads carry — Union downsamples, exactly as the
  * reference's merge does. */
case class DsHllUnionAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends DsHllAggBase {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary input, got ${t.sql}")
  }

  override def update(b: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) b.update(HllSketch.heapify(v.asInstanceOf[Array[Byte]]))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): DsHllUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DsHllUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DsHllUnionAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "ds_hll_union"
}

/** Scalar: estimate from a serialized DataSketches HLL image — the
  * reference's hllSketchFromBytes(bytes).getEstimate
  * (BaseExpr.scala:57-58, 104-106). */
case class DsHllEstimateOf(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ComputeUnaryCodegen {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ds_hll_estimate_of requires binary input, got ${t.sql}")
  }

  override def compute(input: Any): Any =
    HllSketch.heapify(input.asInstanceOf[Array[Byte]]).getEstimate

  override protected def withNewChildInternal(newChild: Expression): DsHllEstimateOf =
    copy(child = newChild)
}

object SketchInteropFunctions {
  import GraftColumnBridge.{column => col, expression => expr}

  def ddProtoSketch(c: Column, alpha: Double = 0.01): Column =
    col(DdProtoSketchAgg(expr(c), alpha).toAggregateExpression())

  def ddProtoMerge(c: Column, alpha: Double = 0.01): Column =
    col(DdProtoMergeAgg(expr(c), alpha).toAggregateExpression())

  def ddProtoQuantileOf(sketch: Column, q: Column): Column =
    col(DdProtoQuantileOf(expr(sketch), expr(q)))

  def ddProtoStatOf(sketch: Column, stat: String): Column =
    col(DdProtoStatOf(expr(sketch), stat))

  def ddToProto(sketch: Column): Column = col(DdToProto(expr(sketch)))
  def ddFromProto(sketch: Column): Column = col(DdFromProto(expr(sketch)))

  def dsHllSketch(c: Column, lgK: Int = 12): Column =
    col(DsHllAgg(expr(c), lgK).toAggregateExpression())

  def dsHllUnion(c: Column, lgK: Int = 12): Column =
    col(DsHllUnionAgg(expr(c), lgK).toAggregateExpression())

  def dsHllEstimateOf(sketch: Column): Column =
    col(DsHllEstimateOf(expr(sketch)))
}
