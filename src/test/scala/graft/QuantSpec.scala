package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

class QuantSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def vecs(n: Int, dim: Int): Seq[(Long, Seq[Float])] = {
    val rng = new scala.util.Random(11)
    (0L until n).map(i => i -> Seq.fill(dim)(rng.nextFloat() * 2 - 1))
  }

  test("quantize: binary is dim bytes; codes reconstruct within scale/2") {
    import spark.implicits._
    val data = vecs(50, 64)
    val rows = data.toDF("id", "v")
      .select(col("id"), col("v"), Similarity.quantizeInt8(col("v")).as("s"))
      .select(col("id"), col("v"), col("s.q"), col("s.scale"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      val q = r.getAs[Array[Byte]](2)
      val scale = r.getDouble(3)
      assert(q.length === 64, "1 byte per dimension")
      v.zip(q).foreach { case (x, b) =>
        assert(math.abs(b * scale - x) <= scale / 2 + 1e-12,
          s"reconstruction error beyond half a step: $x vs ${b * scale}")
      }
    }
  }

  test("driver-side quantizeInt8Bytes matches the Catalyst expression") {
    import spark.implicits._
    val data = vecs(20, 64)
    val exprQ = data.toDF("id", "v")
      .select(col("id"), Similarity.quantizeInt8(col("v")).getField("q").as("q"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    data.foreach { case (id, v) =>
      val driverQ = Similarity.quantizeInt8Bytes(v.map(_.toDouble))
      assert(driverQ.sameElements(exprQ(id)), s"vec $id codes diverge")
    }
  }

  test("int8 cosine tracks float cosine within 2 percent absolute") {
    import spark.implicits._
    val data = vecs(200, 64)
    val query = data.head._2.map(_.toDouble)
    val qq = lit(Similarity.quantizeInt8Bytes(query))
    val rows = data.toDF("id", "v")
      .select(col("id"),
        Similarity.cosine(col("v"), array(query.map(lit): _*)).as("exact"),
        Similarity.int8Cosine(
          Similarity.quantizeInt8(col("v")).getField("q"), qq).as("q8"))
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 0.02,
        s"id ${r.getLong(0)}: exact ${r.getDouble(1)} vs int8 ${r.getDouble(2)}")
    }
  }

  test("quantizedTopK has full recall vs brute force at overFetch=3") {
    import spark.implicits._
    val data = vecs(500, 64)
    val query = data(7)._2.map(_.toDouble)
    val df = data.toDF("id", "v")
    val exact = Similarity.bruteForceTopK(df, "id", "v", query, k = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    val quant = Similarity.quantizedTopK(df, "id", "v", query, k = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(quant === exact, "re-ranked quantized top-k equals exact top-k")
  }

  test("zero vector quantizes to zero codes and cosine 0") {
    import spark.implicits._
    val df = Seq((1L, Seq.fill(8)(0f)), (2L, Seq.fill(8)(1f)))
      .toDF("id", "v")
      .select(col("id"), Similarity.quantizeInt8(col("v")).as("s"))
    val byId = df.select(col("id"), col("s.q"), col("s.scale"))
      .collect().map(r => r.getLong(0) -> ((r.getAs[Array[Byte]](1), r.getDouble(2)))).toMap
    assert(byId(1L)._1.forall(_ == 0) && byId(1L)._2 === 0.0)
    assert(byId(2L)._1.forall(_ == 127))
    val cos = df.where(col("id") === 1)
      .crossJoin(df.where(col("id") === 2).select(col("s.q").as("q2")))
      .select(Similarity.int8Cosine(col("s.q"), col("q2")))
      .collect().head.getDouble(0)
    assert(cos === 0.0)
  }
}
