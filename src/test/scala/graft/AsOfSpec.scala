package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def naive(left: Seq[(String, Long, Long)],
      right: Seq[(String, Long, Long)], tol: Long)
      : Map[(String, Long, Long), Option[(Long, Long)]] =
    left.map { case (k, ts, id) =>
      val m = right.filter(r => r._1 == k && r._2 <= ts && ts - r._2 < tol)
        .sortBy(_._2).lastOption.map(r => (r._2, r._3))
      (k, ts, id) -> m
    }.toMap

  private def run(left: Seq[(String, Long, Long)],
      right: Seq[(String, Long, Long)], tol: Long, bucket: Long)
      : Map[(String, Long, Long), Option[(Long, Long)]] = {
    import spark.implicits._
    val l = left.toDF("k", "ts", "id").repartition(8)
    val r = right.toDF("k", "ts", "x").repartition(4)
    AsOf.joinAsOf(l, r, Seq("k"), "ts", "ts", Seq("x"),
        toleranceMs = tol, bucketMs = bucket)
      .collect()
      .map { row =>
        val key = (row.getString(0), row.getLong(1), row.getLong(2))
        val m = if (row.isNullAt(3)) None
          else Some((row.getLong(3), row.getLong(4)))
        key -> m
      }.toMap
  }

  test("as-of matches the latest anchor within tolerance (randomized)") {
    val rng = new scala.util.Random(23)
    val keys = Seq("a", "b", "c")
    val right = for (k <- keys; i <- 1 to 40)
      yield (k, rng.nextInt(10000).toLong, rng.nextInt(1000).toLong)
    // dedup anchor timestamps per key (operator requirement)
    val rightDedup = right.groupBy(r => (r._1, r._2))
      .map(_._2.head).toSeq
    val left = for (i <- 1 to 500)
      yield (keys(rng.nextInt(3)), rng.nextInt(11000).toLong, i.toLong)
    for (tol <- Seq(50L, 500L, 20000L); bucket <- Seq(64L, 1000L)) {
      val got = run(left, rightDedup, tol, bucket)
      val want = naive(left, rightDedup, tol)
      assert(got === want, s"tol=$tol bucket=$bucket")
    }
  }

  test("boundary semantics: exact tie matches, tolerance edge excluded") {
    val right = Seq(("k", 100L, 7L))
    // tie: leftTs == anchorTs matches; ts - anchor == tol is excluded
    val got = run(Seq(("k", 100L, 1L), ("k", 149L, 2L), ("k", 150L, 3L)),
      right, tol = 50L, bucket = 10L)
    assert(got(("k", 100L, 1L)) === Some((100L, 7L)))
    assert(got(("k", 149L, 2L)) === Some((100L, 7L)))
    assert(got(("k", 150L, 3L)) === None)
  }

  test("inner join drops unmatched left rows") {
    import spark.implicits._
    val l = Seq(("k", 5L, 1L), ("k", 200L, 2L)).toDF("k", "ts", "id")
    val r = Seq(("k", 100L, 9L)).toDF("k", "ts", "x")
    val out = AsOf.joinAsOf(l, r, Seq("k"), "ts", "ts", Seq("x"),
        toleranceMs = 1000L, bucketMs = 50L, joinType = "inner")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out === Set(2L))
  }
}
