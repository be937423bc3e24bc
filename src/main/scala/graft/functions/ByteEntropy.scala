package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Shannon entropy of a binary column's byte histogram, in bits per byte
  * (0 for empty/constant payloads, 8 for uniform random bytes). */
object ByteEntropy {
  def of(payload: Column): Column =
    GraftColumnBridge.column(
      ByteEntropyExpr(GraftColumnBridge.expression(payload)))
}

case class ByteEntropyExpr(child: Expression)
    extends UnaryExpression with ComputeUnaryCodegen {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got ${t.sql}")
  }

  override def dataType: DataType = DoubleType

  override def compute(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes == null || bytes.isEmpty) java.lang.Double.valueOf(0.0)
    else {
      val hist = new Array[Long](256)
      var i = 0
      while (i < bytes.length) { hist(bytes(i) & 0xff) += 1; i += 1 }
      val n = bytes.length.toDouble
      var h = 0.0
      var b = 0
      while (b < 256) {
        if (hist(b) > 0) {
          val p = hist(b) / n
          h -= p * (math.log(p) / math.log(2.0))
        }
        b += 1
      }
      java.lang.Double.valueOf(h)
    }
  }

  override def prettyName: String = "graft_byte_entropy"

  override protected def withNewChildInternal(newChild: Expression)
      : ByteEntropyExpr = copy(child = newChild)
}
