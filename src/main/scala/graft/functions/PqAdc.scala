package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization asymmetric-distance computation (ADC) as ONE
  * compiled expression.
  *
  * The declarative spelling — per subspace, `array_min` over
  * `codebookSize` structs of `floor(Σ diff² · 1e12 + 0.5)` built from
  * `element_at` chains, then a sum of `element_at(dt, code+1)` lookups —
  * is value-correct but costs a ~10k-node expression tree that Catalyst
  * re-analyzes and re-optimizes on EVERY query construction: 1.7 s of
  * driver time per s23 evaluation at sf0.1 (StageProfile r14), dwarfing
  * the 0.7 s of executor work. Same cure as s21's JlProjectMicros: the
  * whole computation compiles to one expression node walked per row.
  *
  * Value-identical to the tree by construction — every IEEE operation
  * runs in the same order (ascending-i left fold inside a subspace
  * distance, `(d · 1e12) + 0.5` then floor for the micro-unit argmin
  * with ties to the LOWER code, ascending-s left fold for the final
  * ADC sum). PqSpec pins expression-vs-tree equality on the live
  * corpus, so a drift in either spelling fails the build.
  *
  * `books(s)(c)(i)` = centroid i-th component of code c in subspace s;
  * `dt(s)(c)` = ‖q_s − books(s)(c)‖² (the driver-side query table).
  * Arrays compare by reference in the case-class equality — fine for
  * the single-use-per-plan pattern (no cross-plan reuse is claimed).
  */
case class PqAdcExpr(child: Expression,
    books: Array[Array[Array[Double]]], dt: Array[Array[Double]])
    extends UnaryExpression with ComputeUnaryCodegen {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${t.sql}")
  }

  override def dataType: DataType = DoubleType

  // compute() itself returns null for a short vector (the tree's
  // element_at out-of-bounds → null propagation), independent of the
  // child's nullability — the codegen must keep the isNull branch
  override def nullable: Boolean = true

  private lazy val subspaces = books.length
  private lazy val sub = books.headOption.map(_.head.length).getOrElse(0)

  override def compute(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val used = subspaces * sub
    if (vec.numElements() < used) return null
    // a null ELEMENT nulls the whole ADC in the tree spelling
    // (element_at → null diff² → null sum); getDouble on a null slot
    // is undefined, so check the used prefix up front (ADVICE r14)
    var j = 0
    while (j < used) {
      if (vec.isNullAt(j)) return null
      j += 1
    }
    var adc = 0.0
    var s = 0
    while (s < subspaces) {
      val cents = books(s)
      var bestDu = Long.MaxValue
      var bestC = 0
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d = 0.0
        var i = 0
        while (i < sub) {
          // same fold order as the tree: ascending i, one diff² per step
          val diff = vec.getDouble(s * sub + i) - cent(i)
          d += diff * diff
          i += 1
        }
        val du = math.floor(d * 1e12 + 0.5).toLong
        if (du < bestDu) { bestDu = du; bestC = c } // ties: lower code
        c += 1
      }
      adc += dt(s)(bestC) // ascending-s left fold
      s += 1
    }
    java.lang.Double.valueOf(adc)
  }

  override def prettyName: String = "graft_pq_adc"

  override protected def withNewChildInternal(newChild: Expression)
      : PqAdcExpr = copy(child = newChild)
}

object PqAdc {
  def apply(vec: Column, books: Array[Array[Array[Double]]],
      dt: Array[Array[Double]]): Column =
    GraftColumnBridge.column(
      PqAdcExpr(GraftColumnBridge.expression(vec), books, dt))
}
