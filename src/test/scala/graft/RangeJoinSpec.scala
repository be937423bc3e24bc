package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("point-in-interval equals the naive quadratic join (randomized)") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val keys = Seq("a", "b")
    val right = for (k <- keys; i <- 1 to 60) yield {
      val lo = rng.nextInt(5000).toLong
      (k, lo, lo + 1 + rng.nextInt(400).toLong, i.toLong)
    }
    val left = for (i <- 1 to 300)
      yield (keys(rng.nextInt(2)), rng.nextInt(6000).toLong, i.toLong)
    val got = RangeJoin.pointInInterval(
        left.toDF("k", "ts", "id").repartition(8),
        right.toDF("k", "lo", "hi", "x").repartition(4),
        Seq("k"), "ts", "lo", "hi", Seq("x"),
        bucketMs = 64L, maxLenMs = 512L)
      .select("id", "range_lo", "x").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      (lk, ts, id) <- left
      (rk, lo, hi, x) <- right
      if lk == rk && lo <= ts && ts < hi
    } yield (id, lo, x)).toSet
    assert(got === want)
  }

  test("left join keeps uncovered points with null range columns") {
    import spark.implicits._
    val out = RangeJoin.pointInInterval(
        Seq(("k", 10L, 1L), ("k", 999L, 2L)).toDF("k", "ts", "id"),
        Seq(("k", 5L, 20L, 7L)).toDF("k", "lo", "hi", "x"),
        Seq("k"), "ts", "lo", "hi", Seq("x"),
        bucketMs = 16L, maxLenMs = 64L, joinType = "left")
      .select("id", "x").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out === Map(1L -> Some(7L), 2L -> None))
  }

  test("intervalOverlap equals brute force on random intervals and " +
      "emits each overlapping pair exactly once") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val lefts = (0 until 120).map { i =>
      val lo = rnd.nextInt(5000).toLong
      (i.toLong, lo, lo + 1 + rnd.nextInt(900)) // up to many buckets @ 64
    }
    val rights = (0 until 80).map { j =>
      val lo = rnd.nextInt(5000).toLong
      (j.toLong, lo, lo + 1 + rnd.nextInt(900))
    }
    val out = RangeJoin.intervalOverlap(
        lefts.toDF("lid", "a_lo", "a_hi"),
        rights.toDF("rid", "b_lo", "b_hi"),
        Seq.empty, "a_lo", "a_hi", "b_lo", "b_hi", Seq("rid"),
        bucketMs = 64L, maxLenMs = 1024L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = for {
      (li, alo, ahi) <- lefts
      (ri, blo, bhi) <- rights
      if alo < bhi && blo < ahi
    } yield (li, ri)
    assert(out.length === out.distinct.length, "pair emitted twice")
    assert(out.toSet === brute.toSet)
    assert(out.length === brute.length)
  }

  test("intervalOverlap honors keys: pairs never cross key values") {
    import spark.implicits._
    val out = RangeJoin.intervalOverlap(
        Seq(("a", 1L, 0L, 100L), ("b", 2L, 0L, 100L))
          .toDF("k", "lid", "a_lo", "a_hi"),
        Seq(("a", 7L, 50L, 150L), ("b", 8L, 500L, 600L))
          .toDF("k", "rid", "b_lo", "b_hi"),
        Seq("k"), "a_lo", "a_hi", "b_lo", "b_hi", Seq("rid"),
        bucketMs = 32L, maxLenMs = 256L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 7L)))
  }

  test("an interval longer than maxLenMs fails loudly, never silently") {
    import spark.implicits._
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(
          Seq(("k", 10L, 1L)).toDF("k", "ts", "id"),
          Seq(("k", 0L, 10000L, 7L)).toDF("k", "lo", "hi", "x"),
          Seq("k"), "ts", "lo", "hi", Seq("x"),
          bucketMs = 16L, maxLenMs = 64L)
        .collect()
    }
    assert(ex.getMessage.contains("maxLenMs") ||
      Option(ex.getCause).exists(_.getMessage.contains("maxLenMs")))
  }
}
