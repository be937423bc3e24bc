package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ast._
import graft.engine.{QueryEngine, Telemetry}

/** Property test for the shared-scan multi-expression rewrite: on random
  * ASTs (random filters, aggregations, groupBys, charted fields, rate
  * transforms, formulas with constants), the shared-scan plan must
  * produce exactly the per-node path's rows. This is the rewrite's
  * contract — one scan/one shuffle is only admissible because it is
  * row-for-row indistinguishable from N independent plans.
  *
  * Values are compared after rounding to 9 decimals (the two paths run
  * the same aggregate functions over the same row sets, but double
  * summation order may differ across plan shapes).
  */
class SharedScanPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // fixture with nulls (tags AND the value column — a null value must
  // count as one distinct "" ces key, not vanish), duplicate keys,
  // non-numeric strings, and a zero value (div-by-zero drops)
  private lazy val df = Seq(
    (1000L, "a", "svc1", "10", Some(2.0)),
    (2000L, "b", "svc1", "x", Some(3.0)),
    (3000L, "a", "svc2", "30", Some(4.0)),
    (4000L, null.asInstanceOf[String], "svc2", "7", Some(5.0)),
    (11000L, "a", "svc1", "40", Some(0.0)),
    (12000L, "b", null.asInstanceOf[String], "12", Some(6.0)),
    (13000L, "a", "svc1", "9", None),
    (21000L, "c", "svc3", "1", Some(1.5))
  ).toDF("ts", "level", "service", "dur", "value")

  private lazy val tel =
    Telemetry.millis(df, "ts", col("value"), message = Some(col("level")))

  private val aggs =
    Seq("sum", "count", "min", "max", "avg", "p50", "p90", "ces")
  private val filters: Seq[QueryClause] = Seq(
    Filter("level", List("a"), Ops.EQ),
    Filter("level", List("b"), Ops.NOT_EQUALS),
    Filter("value", List("2"), Ops.GT, dataType = DataTypes.NUMBER),
    Filter("dur", List("5"), Ops.GE, dataType = DataTypes.NUMBER),
    Filter("service", List("svc"), Ops.CONTAINS),
    Filter("level", Nil, Ops.EXISTS),
    BinaryClause(Filter("level", List("a", "b"), Ops.IN),
      Filter("value", List("100"), Ops.LT, dataType = DataTypes.NUMBER),
      "and"),
    NotClause(Filter("service", List("svc2"), Ops.EQ)))

  private val genExpr: Gen[BaseExpr] = for {
    f <- Gen.oneOf(filters)
    agg <- Gen.oneOf(aggs)
    gbs <- Gen.someOf(Seq("level", "service", "missing_col"))
    fieldName <- Gen.oneOf(None, None, Some("dur"), Some("value"))
    chartType <- Gen.oneOf("count", "rate")
    ret <- Gen.oneOf(true, true, false)
  } yield BaseExpr(id = "x", filter = f,
    chart = Some(ChartOptions(aggregation = agg, groupBys = gbs.toList,
      fieldName = fieldName, chartType = chartType)),
    returnResults = ret)

  private val genAst: Gen[ASTInput] = for {
    n <- Gen.chooseNum(2, 4)
    exprs <- Gen.listOfN(n, genExpr)
    ids = exprs.zipWithIndex.map { case (e, i) =>
      val id = ('a' + i).toChar.toString
      id -> e.copy(id = id)
    }
    formulaOp <- Gen.oneOf("+", "-", "*", "/")
    cst <- Gen.oneOf("", " + 2", " * 3")
    useFormula <- Gen.oneOf(true, true, false)
    lhs <- Gen.oneOf(ids.map(_._1))
    rhs <- Gen.oneOf(ids.map(_._1))
  } yield {
    // guarantee at least one output: a formula, or the first expr returning
    val base0 = ids.toMap
    val base =
      if (useFormula) base0
      else base0.updated(ids.head._1,
        ids.head._2.copy(returnResults = true))
    ASTInput(base,
      formulae = if (useFormula) List(s"$lhs $formulaOp $rhs$cst") else Nil)
  }

  private def run(ast: ASTInput, noShared: Boolean): Seq[(Long, String, Double, String)] = {
    def go = QueryEngine.evaluate(_ => tel, ast, 0L, 100000L, 10000L)
      .collect().map { r =>
        val v = r.getDouble(2)
        (r.getLong(0), r.getString(1),
          if (v.isNaN || v.isInfinite) Double.MaxValue
          else math.rint(v * 1e9) / 1e9,
          r.getString(3))
      }.sorted.toSeq
    if (noShared) QueryEngine.withoutSharedScan(go) else go
  }

  test("random multi-expression ASTs: shared scan ≡ per-node plans") {
    var checked = 0
    for (i <- 0 until 60) {
      val ast = genAst(Gen.Parameters.default, Seed(i.toLong)).get
      val shared = run(ast, noShared = false)
      val perNode = run(ast, noShared = true)
      assert(shared == perNode,
        s"seed $i diverged for AST $ast\nshared:\n${shared.mkString("\n")}\n" +
          s"per-node:\n${perNode.mkString("\n")}")
      checked += 1
    }
    assert(checked == 60)
  }

  // ---- metrics rollup path: random rollup/aggregation combinations ----

  private lazy val mdf = Seq(
    (1000L, "m1", "svc1", Some(10.0), 2.0, 1.0, 9.0),
    (2000L, "m2", "svc1", Some(6.0), 3.0, 1.0, 3.0),
    (3000L, "m1", "svc2", Some(7.5), 1.0, 7.5, 7.5),
    (4000L, null.asInstanceOf[String], "svc2", Some(4.0), 2.0, 0.0, 4.0),
    (5000L, "m1", "svc2", None, 1.0, 0.0, 0.0), // null rollup_sum
    (11000L, "m1", "svc1", Some(8.0), 4.0, 0.5, 4.0),
    (12000L, "m2", null.asInstanceOf[String], Some(0.0), 2.0, 0.0, 0.0)
  ).toDF("ts", "name", "service", "rollup_sum", "rollup_count",
    "rollup_min", "rollup_max")

  private lazy val telM =
    Telemetry.millis(mdf, "ts", col("rollup_sum"))

  private val genMetricsExpr: Gen[BaseExpr] = for {
    f <- Gen.oneOf(Seq[QueryClause](
      Filter("name", List("m1"), Ops.EQ),
      Filter("name", Nil, Ops.EXISTS),
      Filter("rollup_count", List("1"), Ops.GT, dataType = DataTypes.NUMBER),
      NotClause(Filter("service", List("svc2"), Ops.EQ))))
    agg <- Gen.oneOf(aggs :+ "p75")
    rollup <- Gen.oneOf(None, None, Some("sum"), Some("count"), Some("min"),
      Some("max"), Some("p90"))
    gbs <- Gen.someOf(Seq("name", "service"))
    chartType <- Gen.oneOf("count", "rate")
    metricType <- Gen.oneOf("gauge", "rate")
    ret <- Gen.oneOf(true, true, false)
  } yield BaseExpr(id = "x", dataset = "metrics", filter = f,
    chart = Some(ChartOptions(aggregation = agg, groupBys = gbs.toList,
      rollup = rollup, chartType = chartType)),
    metricType = metricType, returnResults = ret)

  private val genMetricsAst: Gen[ASTInput] = for {
    n <- Gen.chooseNum(2, 3)
    exprs <- Gen.listOfN(n, genMetricsExpr)
    ids = exprs.zipWithIndex.map { case (e, i) =>
      val id = ('a' + i).toChar.toString
      id -> e.copy(id = id)
    }
    formulaOp <- Gen.oneOf("+", "-", "*", "/")
    useFormula <- Gen.oneOf(true, true, false)
    lhs <- Gen.oneOf(ids.map(_._1))
    rhs <- Gen.oneOf(ids.map(_._1))
  } yield {
    val base0 = ids.toMap
    val base =
      if (useFormula) base0
      else base0.updated(ids.head._1,
        ids.head._2.copy(returnResults = true))
    ASTInput(base,
      formulae = if (useFormula) List(s"$lhs $formulaOp $rhs") else Nil)
  }

  test("random metrics rollup ASTs: shared scan ≡ per-node plans") {
    var checked = 0
    for (i <- 0 until 40) {
      val ast = genMetricsAst(Gen.Parameters.default, Seed(1000L + i)).get
      def go(noShared: Boolean) = {
        def body = QueryEngine.evaluate(_ => telM, ast, 0L, 100000L, 10000L)
          .collect().map { r =>
            val v = r.getDouble(2)
            (r.getLong(0), r.getString(1),
              if (v.isNaN || v.isInfinite) Double.MaxValue
              else math.rint(v * 1e9) / 1e9,
              r.getString(3))
          }.sorted.toSeq
        if (noShared) QueryEngine.withoutSharedScan(body) else body
      }
      val shared = go(noShared = false)
      val perNode = go(noShared = true)
      assert(shared == perNode,
        s"seed ${1000 + i} diverged for AST $ast\n" +
          s"shared:\n${shared.mkString("\n")}\n" +
          s"per-node:\n${perNode.mkString("\n")}")
      checked += 1
    }
    assert(checked == 40)
  }
}
