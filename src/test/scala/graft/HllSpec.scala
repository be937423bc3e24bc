package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{HllBuffer, HllFunctions}

class HllSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("estimate within ~2% on 100k distinct longs") {
    val b = new HllBuffer(12)
    var i = 0L
    while (i < 100000) {
      b.insertHash(graft.functions.SketchExpressions.mix(i))
      i += 1
    }
    val est = b.estimate()
    assert(math.abs(est - 100000) / 100000.0 < 0.05, s"est=$est")
  }

  test("small cardinalities exact via linear counting") {
    val b = new HllBuffer(12)
    (1L to 50L).foreach(i => b.insertHash(graft.functions.SketchExpressions.mix(i)))
    assert(math.round(b.estimate()) == 50L)
  }

  test("merge equals union; serialization round-trips") {
    def filled(range: Range): HllBuffer = {
      val b = new HllBuffer(12)
      range.foreach(i => b.insertHash(graft.functions.SketchExpressions.mix(i.toLong)))
      b
    }
    val a = filled(0 until 60000)
    val c = filled(30000 until 90000) // overlap in the middle
    val union = filled(0 until 90000)
    a.merge(c)
    assert(a.estimate() == union.estimate())
    val back = HllBuffer.deserialize(a.serialize())
    assert(back.estimate() == a.estimate())
  }

  test("aggregate column: estimate tracks exact distinct; sketches merge in SQL") {
    import spark.implicits._
    val df = Tables.load(spark, SparkTestSession.sfDir, "events")
    val est = df.agg(HllFunctions.hllEstimate(col("user_id")).as("e"))
      .as[Double].head()
    val exact = df.select(countDistinct(col("user_id"))).as[Long].head()
    assert(math.abs(est - exact) / exact.toDouble < 0.05, s"est=$est exact=$exact")

    // per-group persisted sketches, union-merged at "query time"
    val sketches = df.groupBy("event_type")
      .agg(HllFunctions.hllSketch(col("user_id")).as("sk"))
      .select("sk").as[Array[Byte]].collect()
      .map(graft.functions.HllBuffer.deserialize)
    val merged = sketches.reduce { (x, y) => x.merge(y); x }
    assert(math.abs(merged.estimate() - est) < 1e-9)
  }
}
