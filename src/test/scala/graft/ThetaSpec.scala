package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{ThetaFunctions => TF}

class ThetaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("exact mode: estimates equal exact counts below nominal entries") {
    import spark.implicits._
    // A = 0..999, B = 500..1499 -> |A∩B| = 500, |A\B| = 500
    val df = ((0 until 1000).map(i => ("a", i.toLong)) ++
      (500 until 1500).map(i => ("b", i.toLong))).toDF("grp", "v")
    val sk = df.groupBy("grp").agg(TF.thetaSketch(col("v")).as("sk"))
    val row = sk.where(col("grp") === "a").select(col("sk").as("sk_a"))
      .crossJoin(sk.where(col("grp") === "b").select(col("sk").as("sk_b")))
      .select(
        TF.thetaEstimateOf(col("sk_a")).as("ea"),
        TF.thetaIntersectEstimate(col("sk_a"), col("sk_b")).as("ei"),
        TF.thetaDiffEstimate(col("sk_a"), col("sk_b")).as("ed"))
      .collect().head
    assert(row.getDouble(0) === 1000.0)
    assert(row.getDouble(1) === 500.0)
    assert(row.getDouble(2) === 500.0)
  }

  test("two-level merge (segments -> union) equals a one-level sketch") {
    import spark.implicits._
    val df = (0 until 5000).map(i => (i % 16, (i % 700).toLong)).toDF("seg", "v")
    val merged = df.groupBy("seg").agg(TF.thetaSketch(col("v")).as("sk"))
      .agg(TF.thetaEstimateOf(TF.thetaUnion(col("sk"))).as("est"))
      .collect().head.getDouble(0)
    val direct = df.agg(TF.thetaEstimateOf(TF.thetaSketch(col("v"))).as("est"))
      .collect().head.getDouble(0)
    assert(merged === direct)
    assert(merged === 700.0)
  }

  test("estimation mode stays within the sketch's error bound") {
    import spark.implicits._
    // 30k distinct >> k=1024 (lgK=10): estimation mode, RSE ~3.1%
    val df = (0 until 30000).map(_.toLong).toDF("v")
    val est = df.agg(TF.thetaEstimateOf(TF.thetaSketch(col("v"), lgK = 10)))
      .collect().head.getDouble(0)
    assert(math.abs(est - 30000.0) / 30000.0 < 0.1,
      s"estimate $est too far from 30000")
    assert(est !== 30000.0, "30k distinct must exceed k=1024 exact mode")
  }
}
