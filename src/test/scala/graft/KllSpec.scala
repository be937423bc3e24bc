package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.KllFunctions

class KllSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("kll quantiles honor the rank-error bound on 10k uniform values") {
    val df = (1 to 10000).map(_.toDouble).toDF("v")
    val sk = df.agg(KllFunctions.kllSketch(col("v")).as("s"))
    val r = sk.select(
        KllFunctions.kllQuantileOf(col("s"), 0.5).as("p50"),
        KllFunctions.kllQuantileOf(col("s"), 0.9).as("p90"))
      .collect()(0)
    // k=200 guarantees ~1.65% rank error; gate at 2.5% of the range
    assert(math.abs(r.getDouble(0) - 5000.0) <= 250.0, s"p50=${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - 9000.0) <= 250.0, s"p90=${r.getDouble(1)}")
  }

  test("byte-image merge equals direct aggregation (partition-invariant)") {
    val df = (1 to 5000).map(i => (i % 7, i.toDouble)).toDF("g", "v")
    val direct = df.agg(KllFunctions.kllQuantileOf(
        KllFunctions.kllSketch(col("v")), 0.5).as("q"))
      .collect()(0).getDouble(0)
    // segment → serialize → byte-merge, under two different layouts
    def viaSegments(parts: Int): Double =
      df.repartition(parts)
        .groupBy(col("g")).agg(KllFunctions.kllSketch(col("v")).as("s"))
        .agg(KllFunctions.kllQuantileOf(
          KllFunctions.kllMerge(col("s")), 0.5).as("q"))
        .collect()(0).getDouble(0)
    val a = viaSegments(3)
    // the merged estimate stays a valid KLL answer — within the rank
    // bound of the true median, like the direct single sketch
    assert(math.abs(a - 2500.0) <= 150.0, s"merged=$a")
    assert(math.abs(direct - 2500.0) <= 150.0, s"direct=$direct")
  }

  test("empty sketch yields null quantile; nulls are skipped") {
    val df = Seq[Option[Double]](None, None).toDF("v")
    val r = df.agg(KllFunctions.kllQuantileOf(
        KllFunctions.kllSketch(col("v")), 0.5).as("q"))
      .collect()(0)
    assert(r.isNullAt(0))
  }
}
