package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ast._
import graft.compile.{ComputeCompiler, FilterCompiler}
import graft.engine.{QueryEngine, Telemetry}

class EngineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def df = Seq(
    (1000L, "a", "svc1", "10", 2.0),
    (2000L, "b", "svc1", "x", 3.0),
    (3000L, "a", "svc2", "30", 4.0),
    (11000L, "a", "svc1", "40", 5.0)
  ).toDF("ts", "level", "service", "dur", "value")

  private def tel = Telemetry.millis(df, "ts", col("value"),
    message = Some(col("level")))

  test("filter compiler: missing column folds to false, not analysis error") {
    val c = FilterCompiler.compile(
      BinaryClause(
        Filter("nope", List("x"), Ops.EQ),
        Filter("level", List("a"), Ops.EQ), "or"),
      df.columns.toSet)
    assert(df.where(c).count() == 3)
  }

  test("filter compiler: unparseable threshold (NaN) matches NOTHING for all comparisons") {
    // Spark orders NaN above every double: a bare `x < NaN` would be TRUE
    // for every castable row — lt/le must fold to false like gt/ge do
    for (op <- Seq(Ops.GT, Ops.GE, Ops.LT, Ops.LE)) {
      val c = FilterCompiler.compile(
        Filter("dur", List("100"), op), // dataType defaults STRING → NaN
        df.columns.toSet)
      assert(df.where(c).count() == 0, s"op=$op must match nothing")
    }
  }

  test("filter compiler: try_cast numeric comparison drops garbage rows") {
    val c = FilterCompiler.compile(
      Filter("dur", List("15"), Ops.GT, dataType = DataTypes.NUMBER),
      df.columns.toSet)
    // "x" casts to null -> dropped; 30, 40 survive
    assert(df.where(c).count() == 2)
  }

  test("filter compiler: contains is case-insensitive regex") {
    val c = FilterCompiler.compile(
      Filter("service", List("SVC"), Ops.CONTAINS), df.columns.toSet)
    assert(df.where(c).count() == 4)
  }

  test("compute compiler: nested function calls") {
    // (dur / 2) + 1
    val fc = FunctionCall("add", List(
      FunctionCall("div", List(
        LabelArg("dur", DataTypes.NUMBER),
        LiteralArg("2", DataTypes.NUMBER))),
      LiteralArg("1", DataTypes.NUMBER)))
    val out = df.withColumn("c", ComputeCompiler.compile(fc))
      .where($"level" === "a").select("c").as[Double].collect().sorted
    assert(out.sameElements(Array(6.0, 16.0, 21.0)))
    assertThrows[IllegalArgumentException](
      ComputeCompiler.compile(FunctionCall("div", List(LiteralArg("1", "number")))))
    assertThrows[IllegalArgumentException](
      ComputeCompiler.compile(FunctionCall("nope", Nil)))
  }

  test("chart: step bucketing and group-by with missing groupBys dropped") {
    val e = BaseExpr(id = "a", filter = Filter("level", List("a"), Ops.EQ),
      chart = Some(ChartOptions(aggregation = "sum",
        groupBys = List("service", "not_there"))))
    val rows = QueryEngine.chart(tel, e, 0L, 100000L, 10000L)
      .orderBy("step_ts", "service").collect()
    // bucket 0: (svc1, 2.0), (svc2, 4.0); bucket 10000: (svc1, 5.0)
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((0L, "svc1", 2.0), (0L, "svc2", 4.0), (10000L, "svc1", 5.0)))
  }

  test("chart: rate transform divides by step seconds") {
    val e = BaseExpr(id = "a", filter = Filter("level", List("a"), Ops.EQ),
      chart = Some(ChartOptions(aggregation = "count", chartType = "rate")))
    val rows = QueryEngine.chart(tel, e, 0L, 100000L, 10000L)
      .orderBy("step_ts").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((0L, 0.2), (10000L, 0.1)))
  }

  test("metrics dataset re-aggregates rollup columns") {
    val mdf = Seq(
      (1000L, 5.0, 2.0), (2000L, 7.0, 3.0), (11000L, 1.0, 1.0)
    ).toDF("ts", "rollup_sum", "rollup_max")
    val mtel = Telemetry.millis(mdf, "ts", lit(1.0))
    val e = BaseExpr(id = "m", dataset = "metrics",
      filter = Filter("ts", Nil, Ops.EXISTS), metricType = "gauge",
      chart = Some(ChartOptions(aggregation = "sum", rollup = Some("sum"))))
    val rows = QueryEngine.chart(mtel, e, 0L, 100000L, 10000L)
      .orderBy("step_ts").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((0L, 12.0), (10000L, 1.0)))
  }

  test("formula: add zero-fills, div drops zero denominators") {
    val t = Telemetry.millis(Seq(
      (1000L, "a", 1.0), (1000L, "b", 0.0), (11000L, "a", 3.0)
    ).toDF("ts", "k", "value"), "ts", col("value"))
    val ea = BaseExpr(id = "ea", filter = Filter("k", List("a"), Ops.EQ),
      chart = Some(ChartOptions("sum")))
    val eb = BaseExpr(id = "eb", filter = Filter("k", List("b"), Ops.EQ),
      chart = Some(ChartOptions("sum")))
    val ast = ASTInput(Map("ea" -> ea.copy(returnResults = false),
      "eb" -> eb.copy(returnResults = false)), List("ea + eb", "ea / eb"))
    val out = QueryEngine.evaluate(_ => t, ast, 0L, 100000L, 10000L)
      .select("step_ts", "value", "label").collect()
    val adds = out.filter(_.getString(2) == "ea + eb")
    // bucket 0: 1+0=1; bucket 10000: 3+0(filled)=3
    assert(adds.map(r => (r.getLong(0), r.getDouble(1))).toSet ==
      Set((0L, 1.0), (10000L, 3.0)))
    // div: bucket 0 dropped (denominator 0), bucket 10000 dropped (missing side)
    assert(!out.exists(_.getString(2) == "ea / eb"))
  }

  test("formula: constants broadcast") {
    val t = Telemetry.millis(Seq((1000L, "a", 2.0)).toDF("ts", "k", "value"),
      "ts", col("value"))
    val ea = BaseExpr(id = "ea", filter = Filter("k", List("a"), Ops.EQ),
      chart = Some(ChartOptions("sum")), returnResults = false)
    val ast = ASTInput(Map("ea" -> ea), List("100 * ea"))
    val out = QueryEngine.evaluate(_ => t, ast, 0L, 10000L, 10000L).collect()
    assert(out.length == 1 && out(0).getAs[Double]("value") == 200.0)
  }

  test("exemplars: order and limit") {
    val e = BaseExpr(id = "a", filter = Filter("level", List("a"), Ops.EQ),
      order = "DESC", limit = 2)
    val rows = QueryEngine.exemplars(tel, e, 0L, 100000L).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("ts")).toSeq == Seq(11000L, 3000L))
  }

  test("evaluateWithExemplars: exemplars for log exprs only, one evaluation") {
    val ast = AstJson.parseAstInput(
      """{"baseExpressions": {
        |  "a": {"dataset": "logs", "limit": 10,
        |        "filter": {"k": "level", "v": ["a"], "op": "eq"},
        |        "chart": {"aggregation": "count", "groupBys": []}},
        |  "m": {"dataset": "metrics",
        |        "filter": {"k": "level", "v": ["a"], "op": "eq"},
        |        "chart": {"aggregation": "sum", "rollup": "sum", "groupBys": []}}
        |}}""".stripMargin)
    val mtel = Telemetry.millis(
      df.withColumn("rollup_sum", col("value"))
        .withColumn("rollup_count", lit(1.0)),
      "ts", col("value"))
    val res = QueryEngine.evaluateWithExemplars(
      d => if (d == "metrics") mtel else tel, ast, 0L, 100000L, 10000L)
    assert(res.chart.count() > 0)
    assert(res.exemplars.keySet == Set("a"), "metrics exprs get no exemplars")
    assert(res.exemplars("a").count() == 3) // the three level=a rows
  }

  test("tag values and cardinality") {
    val e = BaseExpr(id = "a", filter = Filter("value", List("0"), Ops.GT,
      dataType = DataTypes.NUMBER))
    val tv = QueryEngine.tagValues(tel, e, "service", 0L, 100000L).collect()
    assert(tv.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("svc1", 3L), ("svc2", 1L)))
    val card = QueryEngine.cardinality(tel, e, Seq("level", "service"),
      0L, 100000L).collect()(0).getLong(0)
    assert(card == 3L) // (a,svc1), (b,svc1), (a,svc2)
  }

  test("raw-path ces counts distinct tag tuples per bucket, never 1 per tag") {
    // bucket [0,10s): tuples (a,svc1),(b,svc1),(a,svc2) -> 3;
    // bucket [10s,20s): (a,svc1) -> 1. Grouping by the same tags the key
    // is built from would have made every value identically 1.
    val e = BaseExpr(id = "a",
      filter = Filter("value", List("0"), Ops.GT, dataType = DataTypes.NUMBER),
      chart = Some(ChartOptions(aggregation = "ces",
        groupBys = List("level", "service"))))
    val rows = QueryEngine.chart(tel, e, 0L, 100000L, 10000L)
      .orderBy("step_ts").collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((0L, 3.0), (10000L, 1.0)))
  }

  test("raw-path ces-with-groupBys series gets the series label, not ''/':'") {
    // the ces chart drops the tag columns (they feed the distinct KEY,
    // not the grouping), so the group key is the constant ""/":" — the
    // label must fall back to the series label instead of emitting it
    val ast = AstJson.parseAstInput(
      """{"baseExpressions": {
        |  "a": {"dataset": "logs",
        |        "filter": {"k": "value", "v": ["0"], "op": "gt",
        |                   "dataType": "number"},
        |        "chart": {"aggregation": "ces",
        |                  "groupBys": ["level", "service"]}}
        |}}""".stripMargin)
    val rows = QueryEngine.evaluate(_ => tel, ast, 0L, 100000L, 10000L)
      .collect()
    assert(rows.nonEmpty)
    val labels = rows.map(_.getAs[String]("label")).distinct.toSeq
    assert(labels.forall(l => l.nonEmpty && l != ":"),
      s"ces-over-tuples label fell through to the raw group key: $labels")
    // a genuinely grouped aggregation still labels with the group key
    val grouped = AstJson.parseAstInput(
      """{"baseExpressions": {
        |  "a": {"dataset": "logs",
        |        "filter": {"k": "value", "v": ["0"], "op": "gt",
        |                   "dataType": "number"},
        |        "chart": {"aggregation": "count", "groupBys": ["level"]}}
        |}}""".stripMargin)
    val gl = QueryEngine.evaluate(_ => tel, grouped, 0L, 100000L, 10000L)
      .collect().map(_.getAs[String]("label")).distinct.toSet
    assert(gl.subsetOf(Set("a", "b")), s"grouped labels: $gl")
  }

  test("shared-scan rewrite is row-equivalent to the per-node path") {
    // grouped series + ungrouped series + two formulas (one with a dead-
    // key operand under the formula's grouping, one with a constant and a
    // zero-denominator bucket) — every alignment rule the per-node path
    // implements with joins, expressed as presence algebra in one plan
    val ast = AstJson.parseAstInput(
      """{"baseExpressions": {
        |  "a": {"dataset": "logs",
        |        "filter": {"k": "level", "v": ["a"], "op": "eq"},
        |        "chart": {"aggregation": "sum", "groupBys": ["service"]}},
        |  "b": {"dataset": "logs",
        |        "filter": {"k": "level", "v": ["b"], "op": "eq"},
        |        "chart": {"aggregation": "avg", "groupBys": []}},
        |  "c": {"dataset": "logs",
        |        "filter": {"k": "dur", "v": ["0"], "op": "gt",
        |                   "dataType": "number"},
        |        "chart": {"aggregation": "max", "groupBys": [],
        |                  "fieldName": "dur", "chartType": "rate"}},
        |  "d": {"dataset": "logs",
        |        "filter": {"k": "value", "v": ["0"], "op": "gt",
        |                   "dataType": "number"},
        |        "chart": {"aggregation": "ces",
        |                  "groupBys": ["level", "service"]}}
        |}, "formulae": ["a + b", "(a / b) * 2"]}""".stripMargin)
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.collect().map(r => (r.getLong(0), r.getString(1),
        math.rint(r.getDouble(2) * 1e9) / 1e9, r.getString(3))).sorted.toSeq
    val shared = run(QueryEngine.evaluate(_ => tel, ast, 0L, 100000L, 10000L))
    val perNode = QueryEngine.withoutSharedScan {
      run(QueryEngine.evaluate(_ => tel, ast, 0L, 100000L, 10000L))
    }
    assert(shared == perNode,
      s"shared:\n${shared.mkString("\n")}\nper-node:\n${perNode.mkString("\n")}")
    // and the two paths genuinely differ: per-node aligns formulas with
    // joins, the shared plan has none
    val sharedPlan = QueryEngine.evaluate(_ => tel, ast, 0L, 100000L, 10000L)
      .queryExecution.executedPlan.toString
    val perNodePlan = QueryEngine.withoutSharedScan {
      QueryEngine.evaluate(_ => tel, ast, 0L, 100000L, 10000L)
        .queryExecution.executedPlan.toString
    }
    assert(!sharedPlan.contains("Join"), s"join in shared plan:\n$sharedPlan")
    assert(perNodePlan.contains("Join"), "per-node path lost its joins")
  }

  test("shared-scan rewrite matches per-node on the metrics rollup path") {
    // two metrics expressions re-aggregating pre-rolled columns + a div
    // formula; avg rides (rollup_sum, rollup_count) as a two-column slot
    val mdf = Seq(
      (1000L, "m1", 10.0, 2.0, 1.0, 9.0),
      (2000L, "m2", 6.0, 3.0, 1.0, 3.0),
      (11000L, "m1", 8.0, 4.0, 0.5, 4.0),
      (12000L, "m2", 0.0, 2.0, 0.0, 0.0)
    ).toDF("ts", "name", "rollup_sum", "rollup_count", "rollup_min",
      "rollup_max")
    val telM = Telemetry.millis(mdf, "ts", col("rollup_sum"))
    val ast = AstJson.parseAstInput(
      """{"baseExpressions": {
        |  "a": {"dataset": "metrics",
        |        "filter": {"k": "name", "v": ["m1"], "op": "eq"},
        |        "chart": {"aggregation": "avg", "groupBys": ["name"]}},
        |  "b": {"dataset": "metrics",
        |        "filter": {"k": "name", "op": "exists"},
        |        "chart": {"aggregation": "sum", "groupBys": ["name"]}}
        |}, "formulae": ["b / a"]}""".stripMargin)
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.collect().map(r => (r.getLong(0), r.getString(1),
        math.rint(r.getDouble(2) * 1e9) / 1e9, r.getString(3))).sorted.toSeq
    val shared = run(QueryEngine.evaluate(_ => telM, ast, 0L, 100000L, 10000L))
    val perNode = QueryEngine.withoutSharedScan {
      run(QueryEngine.evaluate(_ => telM, ast, 0L, 100000L, 10000L))
    }
    assert(shared == perNode,
      s"shared:\n${shared.mkString("\n")}\nper-node:\n${perNode.mkString("\n")}")
  }

  test("mixed-dataset AST shares per dataset bucket and matches per-node") {
    // logs panels + metrics panels in one dashboard AST: each dataset
    // bucket gets its own shared scan; results must match per-node
    val mdf = Seq(
      (1000L, "m1", 10.0, 2.0, 1.0, 9.0),
      (11000L, "m1", 8.0, 4.0, 0.5, 4.0),
      (12000L, "m2", 6.0, 2.0, 2.0, 4.0)
    ).toDF("ts", "name", "rollup_sum", "rollup_count", "rollup_min",
      "rollup_max")
    val telM = Telemetry.millis(mdf, "ts", col("rollup_sum"))
    val tabs: String => Telemetry =
      d => if (d == "metrics") telM else tel
    val ast = AstJson.parseAstInput(
      """{"baseExpressions": {
        |  "a": {"dataset": "logs",
        |        "filter": {"k": "level", "v": ["a"], "op": "eq"},
        |        "chart": {"aggregation": "count", "groupBys": []}},
        |  "b": {"dataset": "logs",
        |        "filter": {"k": "level", "v": ["b"], "op": "eq"},
        |        "chart": {"aggregation": "sum", "groupBys": []}},
        |  "m": {"dataset": "metrics",
        |        "filter": {"k": "name", "op": "exists"},
        |        "chart": {"aggregation": "avg", "groupBys": ["name"]}},
        |  "n": {"dataset": "metrics",
        |        "filter": {"k": "name", "v": ["m1"], "op": "eq"},
        |        "chart": {"aggregation": "max", "groupBys": []}}
        |}, "formulae": ["a + b"]}""".stripMargin)
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.collect().map(r => (r.getLong(0), r.getString(1),
        math.rint(r.getDouble(2) * 1e9) / 1e9, r.getString(3))).sorted.toSeq
    val shared = run(QueryEngine.evaluate(tabs, ast, 0L, 100000L, 10000L))
    val perNode = QueryEngine.withoutSharedScan {
      run(QueryEngine.evaluate(tabs, ast, 0L, 100000L, 10000L))
    }
    assert(shared == perNode,
      s"shared:\n${shared.mkString("\n")}\nper-node:\n${perNode.mkString("\n")}")
  }

  test("a 10-expression dashboard still compiles to one scan and matches per-node") {
    // wide ASTs stress the slot machinery: 10 filters x varied aggs in
    // one explode array, 20 conditional aggregate columns in one pass
    val exprs = (0 until 10).map { k =>
      val id = ('a' + k).toChar.toString
      val agg = Seq("sum", "count", "min", "max", "avg")(k % 5)
      s""""$id": {"dataset": "logs",
         |  "filter": {"k": "value", "v": ["${k % 3}"], "op": "gt",
         |             "dataType": "number"},
         |  "chart": {"aggregation": "$agg",
         |            "groupBys": ${if (k % 2 == 0) """["level"]""" else "[]"}}}"""
        .stripMargin
    }.mkString(",\n")
    val ast = AstJson.parseAstInput(
      s"""{"baseExpressions": {$exprs}, "formulae": ["a + c", "b / d"]}""")
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.collect().map(r => (r.getLong(0), r.getString(1),
        math.rint(r.getDouble(2) * 1e9) / 1e9, r.getString(3))).sorted.toSeq
    val sharedDf = QueryEngine.evaluate(_ => tel, ast, 0L, 100000L, 10000L)
    val shared = run(sharedDf)
    val perNode = QueryEngine.withoutSharedScan {
      run(QueryEngine.evaluate(_ => tel, ast, 0L, 100000L, 10000L))
    }
    assert(shared == perNode)
    assert(shared.nonEmpty)
    val plan = sharedDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "wide AST must stay join-free")
  }

  test("null tags make distinct key parts, not conflated tuples") {
    import spark.implicits._
    val t = Telemetry.millis(Seq(
        (1000L, "x", null, 1.0), (1000L, null, "x", 1.0))
        .toDF("ts", "a", "b", "value"),
      "ts", col("value"))
    val e = BaseExpr(id = "a", filter = Filter("value", List("0"), Ops.GT,
      dataType = DataTypes.NUMBER))
    // concat_ws alone skips nulls: both rows would key as "x" and count 1
    val card = QueryEngine.cardinality(t, e, Seq("a", "b"), 0L, 10000L)
      .collect()(0).getLong(0)
    assert(card == 2L)
  }

  test("topSeriesOther conserves each step's total and keeps top labels verbatim") {
    import spark.implicits._
    val chart = Seq(
      (0L, "a", 10.0), (0L, "b", 5.0), (0L, "c", 1.0), (0L, "d", 2.0),
      (1000L, "a", 7.0), (1000L, "c", 4.0), (1000L, "d", 1.0)
    ).toDF("step_ts", "label", "value")
    val out = QueryEngine.topSeriesOther(chart, 2)
      .collect().map(r => (r.getLong(1), r.getString(0), r.getDouble(2)))
    // top-2 by total |value|: a (17) and b (5 — ties with c's 5, label
    // asc breaks toward b); c+d collapse per step
    assert(out.filter(_._2 == "a").map(_._3).sorted.toSeq == Seq(7.0, 10.0))
    assert(out.filter(_._2 == "b").map(_._3).toSeq == Seq(5.0))
    val other = out.filter(_._2 == "__other__").map(t => t._1 -> t._3).toMap
    assert(other == Map(0L -> 3.0, 1000L -> 5.0))
    // conservation: per-step totals unchanged by the cut
    val before = chart.groupBy("step_ts").agg(sum("value")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val after = out.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(after == before)
  }

  test("heatmap buckets on floor(value/width) with half-open edges") {
    import spark.implicits._
    val t = Telemetry.millis(Seq(
        (1000L, 0.0), (1000L, 24.999), (1000L, 25.0), (1000L, 49.9),
        (90000000L, -0.1), (90000000L, 50.0))
        .toDF("ts", "value"),
      "ts", col("value"))
    val e = BaseExpr(id = "a", filter = Filter("value", List("x"), Ops.EXISTS))
    val out = QueryEngine.heatmap(t, e, 0L, 86400000L * 2, 86400000L, 25.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // 25.0 lands in bucket 1 (half-open), -0.1 floors to bucket -1
    assert(out == Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 2L,
      (86400000L, -1L) -> 1L, (86400000L, 2L) -> 1L))
  }
}
