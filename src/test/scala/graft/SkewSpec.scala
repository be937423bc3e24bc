package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 10k rows on one hot key + a tail of cold keys
  private lazy val skewed = (
    (1 to 10000).map(i => ("hot", i.toLong, i.toDouble)) ++
      (1 to 100).map(i => (s"cold$i", i.toLong, i.toDouble))
  ).toDF("k", "id", "v")

  test("salted aggregate equals plain aggregate") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("count"))
      .orderBy("k").collect()
    val salted = Skew.saltedAggregate(skewed, Seq("k"), "v", Seq("id"), n = 8)
      .orderBy("k").collect()
    assert(salted.length == plain.length)
    salted.zip(plain).foreach { case (s, p) => assert(s == p) }
  }

  test("salted aggregate actually spreads the hot key across salts") {
    val partials = skewed
      .withColumn("_salt", Skew.salt(8, col("id")))
      .where(col("k") === "hot")
      .select("_salt").distinct().count()
    assert(partials > 4) // hot key split over most of the 8 salt buckets
  }

  test("salted join equals plain join") {
    val dim = (Seq("hot") ++ (1 to 100).map(i => s"cold$i"))
      .zipWithIndex.map { case (k, i) => (k, s"attr$i") }
      .toDF("k", "attr")
    val plain = skewed.join(dim, "k")
      .select("k", "id", "v", "attr").orderBy("k", "id").collect()
    val salted = Skew.saltedJoin(skewed, dim, "k", n = 8, Seq("id"))
      .select("k", "id", "v", "attr").orderBy("k", "id").collect()
    assert(salted.length == plain.length)
    salted.zip(plain).foreach { case (s, p) => assert(s == p) }
  }
}
