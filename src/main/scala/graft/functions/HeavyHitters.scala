package graft.functions

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary (Misra & Gries 1982; mergeability per
  * Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * The 100 TB frequent-items path: the summary holds AT MOST `capacity`
  * (token, count) pairs no matter how large the vocabulary grows, and two
  * summaries merge by pointwise addition followed by subtracting the
  * (capacity+1)-th largest count — so Spark's partial aggregation builds
  * one bounded summary per partition map-side and the shuffle carries
  * `capacity` entries per group, never the vocabulary.
  *
  * Guarantee (survives any merge tree): for every key,
  * `true_count − N/(capacity+1) ≤ summary_count ≤ true_count`, and any key
  * with `true_count > N/(capacity+1)` is PRESENT in the summary. The
  * summary's *extra* entries are arrival-order-dependent, so consumers
  * must treat it as a candidate set: recount the candidates exactly (a
  * narrow filtered aggregation) and threshold at `T > N/(capacity+1)` —
  * the result is then the exact, deterministic set `{key: count ≥ T}`
  * (recall by the theorem, precision by the recount). `k5_heavy_hitters`
  * wires exactly that gate.
  *
  * Unlike [[CmBuffer]] (fixed-size counters, estimates for ANY probe key,
  * overestimates) Misra–Gries carries the keys themselves and
  * underestimates — the right shape for "which tokens are frequent"
  * discovery where the vocabulary is unknown up front.
  */
final class MgBuffer(val capacity: Int) extends Serializable {
  require(capacity >= 1 && capacity <= (1 << 20),
    s"capacity $capacity out of range [1, ${1 << 20}]")
  val counts = new java.util.HashMap[String, Long](capacity * 2)
  var n: Long = 0L // exact total increments — the recall threshold's N

  def add(key: String): Unit = {
    n += 1
    val cur = counts.get(key)
    if (cur != 0L || counts.containsKey(key)) counts.put(key, cur + 1L)
    else if (counts.size < capacity) counts.put(key, 1L)
    else {
      // decrement-all event: removes capacity+1 total mass (1 from each
      // resident counter + the incoming item) — at most N/(capacity+1)
      // such events can occur, which is the error bound
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val v = e.getValue - 1L
        if (v <= 0L) it.remove() else e.setValue(v)
      }
    }
  }

  /** Pointwise sum, then subtract the (capacity+1)-th largest count and
    * drop non-positive entries (Agarwal et al. 2012 §3.2 — keeps the
    * combined error ≤ N_total/(capacity+1)). */
  def merge(o: MgBuffer): Unit = {
    n += o.n
    o.counts.forEach { (k, v) =>
      val cur = counts.get(k)
      counts.put(k, cur + v)
    }
    if (counts.size > capacity) {
      val vals = counts.values().asScala.toArray.sorted(Ordering[Long].reverse)
      val sub = vals(capacity) // (capacity+1)-th largest
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val v = e.getValue - sub
        if (v <= 0L) it.remove() else e.setValue(v)
      }
    }
  }

  def serialize(): Array[Byte] = {
    val entries = counts.entrySet().asScala.toArray
    val keyBytes = entries.map(e => e.getKey.getBytes("UTF-8"))
    var size = 4 + 8 + 4
    keyBytes.foreach(b => size += 4 + b.length + 8)
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(capacity).putLong(n).putInt(entries.length)
    var i = 0
    while (i < entries.length) {
      bb.putInt(keyBytes(i).length).put(keyBytes(i)).putLong(entries(i).getValue)
      i += 1
    }
    bb.array()
  }
}

object MgBuffer {
  def deserialize(bytes: Array[Byte]): MgBuffer = {
    require(bytes != null && bytes.length >= 16,
      "malformed MG payload: too short for the header")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val capacity = bb.getInt()
    val b = new MgBuffer(capacity)
    b.n = bb.getLong()
    val sz = bb.getInt()
    require(sz >= 0 && sz <= capacity,
      s"malformed MG payload: $sz entries for capacity $capacity")
    var i = 0
    while (i < sz) {
      val kl = bb.getInt()
      require(kl >= 0 && kl <= bb.remaining() - 8,
        s"malformed MG payload: key length $kl")
      val kb = new Array[Byte](kl)
      bb.get(kb)
      b.counts.put(new String(kb, "UTF-8"), bb.getLong())
      i += 1
    }
    b
  }
}

/** Aggregate: Misra–Gries summary of a string column as
  * `struct(n BIGINT, items ARRAY<STRUCT<token STRING, cnt BIGINT>>)`,
  * items sorted (cnt DESC, token ASC) for a deterministic presentation of
  * the (order-dependent) candidate set. */
case class MgAgg(
    child: Expression,
    capacity: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] {

  override def children: Seq[Expression] = Seq(child)

  override val dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false),
      nullable = false)))

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.sql}")
  }

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(capacity)

  override def update(b: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: MgBuffer, o: MgBuffer): MgBuffer = { b.merge(o); b }

  override def eval(b: MgBuffer): Any = {
    val items = b.counts.entrySet().asScala.toArray
      .sortBy(e => (-e.getValue, e.getKey))
      .map(e => new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.getKey), e.getValue)): Any)
    new GenericInternalRow(Array[Any](b.n, new GenericArrayData(items)))
  }

  override def serialize(b: MgBuffer): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): MgBuffer =
    MgBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): MgAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MgAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MgAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "mg_summary"
}

object HeavyHitters {
  /** Misra–Gries summary aggregate as a Column. */
  def mgSummary(c: Column, capacity: Int = 256): Column =
    GraftColumnBridge.column(
      MgAgg(GraftColumnBridge.expression(c), capacity).toAggregateExpression())
}
