package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{DDSketchBuffer, DDSketchFunctions}

class DDSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("quantiles within 1% relative error of exact") {
    import spark.implicits._
    val df = Tables.load(spark, SparkTestSession.sfDir, "events")
    for (q <- Seq(0.5, 0.9, 0.99)) {
      val approx = df.agg(
        DDSketchFunctions.ddsketchQuantile(col("value"), q).as("v"))
        .as[Double].head()
      val exact = df.agg(
        expr(s"percentile(value, $q)").as("v")).as[Double].head()
      assert(math.abs(approx - exact) <= 0.01 * math.abs(exact) + 1e-12,
        s"q=$q approx=$approx exact=$exact")
    }
  }

  test("merge-then-query equals query-of-union (mergeability)") {
    val r = new scala.util.Random(7)
    val xs = Array.fill(10000)(math.exp(r.nextGaussian() * 2))
    val (left, right) = xs.splitAt(3000)
    val all = new DDSketchBuffer(0.01)
    xs.foreach(all.insert)
    val a = new DDSketchBuffer(0.01)
    left.foreach(a.insert)
    val b = new DDSketchBuffer(0.01)
    right.foreach(b.insert)
    a.merge(b)
    for (q <- Seq(0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999))
      assert(a.quantile(q) == all.quantile(q), s"q=$q")
    assert(a.count == all.count)
  }

  test("serialization round-trips; sketch column merges at query time") {
    import spark.implicits._
    val s = new DDSketchBuffer(0.01)
    Seq(-5.0, -1.0, 0.0, 0.0, 1.0, 2.0, 100.0).foreach(s.insert)
    val back = DDSketchBuffer.deserialize(s.serialize())
    for (q <- Seq(0.0, 0.3, 0.5, 0.9, 1.0))
      assert(back.quantile(q) == s.quantile(q))
    assert(back.quantile(0.5) == 0.0) // 4th of 7 ranked values is the second 0

    // persisted per-group sketches re-merged at "query time"
    val df = Tables.load(spark, SparkTestSession.sfDir, "events")
    val perType = df.groupBy("event_type")
      .agg(DDSketchFunctions.ddsketch(col("value")).as("sk"))
    val merged = perType.select(col("sk")).as[Array[Byte]].collect()
      .map(DDSketchBuffer.deserialize)
      .reduce { (x, y) => x.merge(y); x }
    val direct = new DDSketchBuffer(0.01)
    df.select(col("value")).as[Double].collect().foreach(direct.insert)
    assert(merged.quantile(0.9) == direct.quantile(0.9))
  }

  test("negative and zero handling") {
    val s = new DDSketchBuffer(0.01)
    Seq(-100.0, -10.0, 0.0, 10.0, 100.0).foreach(s.insert)
    assert(s.quantile(0.0) < 0)
    assert(math.abs(s.quantile(0.5)) < 1e-12)
    assert(math.abs(s.quantile(1.0) - 100.0) <= 1.0)
    assert(math.abs(s.quantile(0.1) - (-100.0)) <= 1.0)
  }
}
