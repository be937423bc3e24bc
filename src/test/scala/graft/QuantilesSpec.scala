package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distributed selection vs a literal sort: same order statistics. */
class QuantilesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def oracle(values: Seq[Double], q: Double): Double = {
    val sorted = values.sorted
    sorted(math.floor(q * (sorted.size - 1)).toInt)
  }

  test("exactByGroup equals the sorted-array order statistic") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (1 to 5000).map { i =>
      (s"g${i % 4}", rng.nextInt(1000).toDouble + rng.nextDouble())
    }
    val df = rows.toDF("g", "v").repartition(16)
    val got = graft.operators.Quantiles
      .exactByGroup(df, "g", col("v"), Seq("p50" -> 0.5, "p95" -> 0.95, "p0" -> 0.0, "p100" -> 1.0))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val byG = rows.groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2) }
    assert(got.keySet === byG.keySet)
    byG.foreach { case (g, vs) =>
      val (p50, p95, p0, p100) = got(g)
      assert(p50 === oracle(vs, 0.5), s"p50 of $g")
      assert(p95 === oracle(vs, 0.95), s"p95 of $g")
      assert(p0 === vs.min, s"min of $g")
      assert(p100 === vs.max, s"max of $g")
    }
  }

  test("groups spanning many partitions and duplicate-heavy values") {
    import spark.implicits._
    // one dominant group with few distinct values: rank picks must respect
    // multiplicity, and the group spans several range partitions
    val rows = (1 to 10000).map(i => ("big", (i % 7).toDouble)) ++
      (1 to 5).map(i => ("tiny", i.toDouble))
    val df = rows.toDF("g", "v").repartition(32)
    val got = graft.operators.Quantiles
      .exactByGroup(df, "g", col("v"), Seq("p50" -> 0.5), numPartitions = 8)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("big") === oracle(rows.filter(_._1 == "big").map(_._2), 0.5))
    assert(got("tiny") === 3.0)
  }

  test("null group and null value rows are ignored") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", None), (null, Some(9.0)))
      .toDF("g", "v")
    val got = graft.operators.Quantiles
      .exactByGroup(df, "g", col("v"), Seq("p50" -> 0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === Map("a" -> 2.0))
  }

  private def weightedOracle(rows: Seq[(Double, Long)], q: Double): Double = {
    // nearest-rank over the weight-expanded multiset
    val sorted = rows.sortBy(_._1)
    val w = rows.map(_._2).sum
    val rank = math.floor(q * (w - 1)).toLong + 1
    var cum = 0L
    sorted.find { case (_, rw) => cum += rw; cum >= rank }.get._1
  }

  test("exactWeightedByGroup equals the weight-expanded order statistic") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = (1 to 3000).map { i =>
      (s"g${i % 3}", rng.nextInt(500).toDouble, rng.nextInt(9).toLong + 1L)
    }
    val df = rows.toDF("g", "v", "w").repartition(13)
    val got = graft.operators.Quantiles
      .exactWeightedByGroup(df, "g", col("v"), col("w"),
        Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val byG = rows.groupBy(_._1)
      .map { case (g, vs) => g -> vs.map(t => (t._2, t._3)) }
    assert(got.keySet === byG.keySet)
    byG.foreach { case (g, vs) =>
      val (p25, p50, p90) = got(g)
      assert(p25 === weightedOracle(vs, 0.25), s"p25 of $g")
      assert(p50 === weightedOracle(vs, 0.5), s"p50 of $g")
      assert(p90 === weightedOracle(vs, 0.9), s"p90 of $g")
    }
    // partitioning must not change the answer
    val again = graft.operators.Quantiles
      .exactWeightedByGroup(rows.toDF("g", "v", "w").repartition(3),
        "g", col("v"), col("w"), Seq("p50" -> 0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    byG.keys.foreach(g => assert(again(g) === got(g)._2))
  }

  test("fast lane and selection path agree value-for-value on both " +
    "rank rules (and the gate routes as designed)") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val rows = (1 to 4000).map { i =>
      (s"g${i % 5}", rng.nextInt(700).toDouble + rng.nextDouble())
    }
    val qs = Seq("p10" -> 0.1, "p50" -> 0.5, "p99" -> 0.99)
    // LocalRelation stats are known and tiny -> fast lane
    val small = rows.toDF("g", "v")
    // a LogicalRDD carries the sentinel size (statsBytes None) -> the
    // gate must refuse to trust it and take the selection path
    val schema = small.schema
    val unsized = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => org.apache.spark.sql
        .Row(r._1, r._2)), 6), schema)
    for (rule <- Seq(graft.operators.Quantiles.NearestRank,
        graft.operators.Quantiles.CeilRank)) {
      val a = graft.operators.Quantiles
        .exactByGroup(small, "g", col("v"), qs, rule = rule)
      val b = graft.operators.Quantiles
        .exactByGroup(unsized, "g", col("v"), qs, rule = rule)
      // route pin: the selection path materializes eagerly into a
      // LocalRelation; the fast lane stays a lazy aggregate plan
      assert(!a.queryExecution.optimizedPlan.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
        "fast lane must not have run the selection jobs")
      assert(b.queryExecution.optimizedPlan.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
        "unknown stats must route to the selection path")
      val am = a.collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      val bm = b.collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      assert(am === bm, s"paths diverged under $rule")
    }
  }

  test("exactWeightedByGroup rejects non-positive weights") {
    import spark.implicits._
    val df = Seq(("g", 1.0, 0L)).toDF("g", "v", "w")
    val e = intercept[Exception] {
      graft.operators.Quantiles.exactWeightedByGroup(df, "g", col("v"),
        col("w"), Seq("p50" -> 0.5)).collect()
    }
    assert(e.getMessage.contains("positive weights") ||
      e.getCause != null)
  }
}
