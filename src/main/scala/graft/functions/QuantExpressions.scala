package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Int8 scalar quantization for embedding columns — the memory-scale path
  * for similarity search: 4 bytes/dim float32 → 1 byte/dim + one double
  * scale per vector (~4× smaller scans, cache-resident ANN indexes at
  * 100 TB corpus scale).
  *
  * Symmetric per-vector quantization: scale = maxAbs/127,
  * q_i = round(x_i/scale) ∈ [-127, 127]. Cosine over quantized vectors
  * needs NO dequantization — per-vector scales cancel in the ratio, so
  * [[Int8Cosine]] runs on exact integer accumulators (bit-deterministic
  * on any engine) with one final double division.
  *
  * Same custom-Expression idiom as SketchExpressions: tight per-row
  * loops, real codegen via the Compute*Codegen traits, no UDFs.
  */
object QuantExpressions {

  /** array<float|double> → struct(q: binary, scale: double). */
  def int8Quantize(vec: Column): Column =
    GraftColumnBridge.column(Int8Quantize(GraftColumnBridge.expression(vec)))

  /** Cosine similarity of two int8-quantized vectors (binary columns of
    * equal length): integer dot/norm accumulators, one double division.
    * Scales cancel, so they are not inputs. */
  def int8Cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      Int8Cosine(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

case class Int8Quantize(child: Expression)
    extends UnaryExpression with ComputeUnaryCodegen {

  override def dataType: DataType = StructType(Seq(
    StructField("q", BinaryType, nullable = false),
    StructField("scale", DoubleType, nullable = false)))

  private lazy val childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${t.sql}")
  }

  override def compute(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      // a null element would NPE on the generic path or silently read
      // as 0.0 on the unsafe path — same guard as the sibling
      // array expressions (TokenStats/MinHash/SimHash)
      if (a.isNullAt(i))
        throw new IllegalArgumentException(
          s"$prettyName: embedding has a null element at index $i")
      val x = if (childIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val ax = math.abs(x)
      if (ax > maxAbs) maxAbs = ax
      i += 1
    }
    val scale = if (maxAbs == 0.0) 0.0 else maxAbs / 127.0
    val q = new Array[Byte](n)
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        val x = if (childIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val r = math.rint(x / scale)
        q(i) = (if (r > 127) 127 else if (r < -127) -127 else r.toInt).toByte
        i += 1
      }
    }
    InternalRow(q, scale)
  }

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

case class Int8Cosine(left: Expression, right: Expression)
    extends BinaryExpression with ComputeBinaryCodegen {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary inputs, got ${l.sql}, ${r.sql}")
    }

  override def compute(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Array[Byte]]
    val b = r.asInstanceOf[Array[Byte]]
    // mismatched widths mean mixed embedding versions — a silent
    // truncated dot product would return plausible-but-wrong scores
    if (a.length != b.length) throw new IllegalArgumentException(
      s"int8_cosine: code widths differ (${a.length} vs ${b.length})")
    val n = a.length
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    while (i < n) {
      val x = a(i).toLong
      val y = b(i).toLong
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0L || nb == 0L) 0.0
    else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Cosine =
    copy(left = newLeft, right = newRight)
}
