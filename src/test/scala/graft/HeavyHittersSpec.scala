package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{HeavyHitters, MgBuffer}

class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def exact(stream: Seq[String]): Map[String, Long] =
    stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("Misra-Gries guarantee: count error <= N/(m+1), heavy keys present") {
    val rnd = new Random(7)
    // zipf-ish: a few heavy keys over a long singleton tail
    val stream = Seq.fill(2000)(s"h${rnd.nextInt(5)}") ++
      Seq.tabulate(3000)(i => s"tail$i") ++
      Seq.fill(500)("h0")
    val b = new MgBuffer(16)
    rnd.shuffle(stream).foreach(b.add)
    val truth = exact(stream)
    val n = stream.size.toLong
    assert(b.n == n)
    assert(b.counts.size <= 16)
    val bound = n / 17 + 1
    b.counts.forEach { (k, v) =>
      assert(v <= truth(k), s"$k overestimated: $v > ${truth(k)}")
      assert(v >= truth(k) - bound, s"$k undershoots the bound")
    }
    truth.filter(_._2 > n / 17).keys.foreach { k =>
      assert(b.counts.containsKey(k), s"heavy key $k evicted")
    }
  }

  test("merge keeps the combined bound and capacity") {
    val rnd = new Random(13)
    val parts = Seq.fill(8) {
      Seq.fill(500)(s"h${rnd.nextInt(4)}") ++
        Seq.tabulate(700)(_ => s"t${rnd.nextInt(5000)}")
    }
    val whole = parts.flatten
    val truth = exact(whole)
    val n = whole.size.toLong
    val merged = parts.map { p =>
      val b = new MgBuffer(32); p.foreach(b.add); b
    }.reduce { (a, c) => a.merge(c); a }
    assert(merged.n == n)
    assert(merged.counts.size <= 32)
    val bound = n / 33 + 1
    merged.counts.forEach { (k, v) =>
      assert(v <= truth(k) && v >= truth(k) - bound)
    }
    truth.filter(_._2 > n / 33).keys.foreach { k =>
      assert(merged.counts.containsKey(k), s"heavy key $k lost in merge")
    }
  }

  test("serialization roundtrip") {
    val b = new MgBuffer(8)
    Seq("a", "b", "a", "c", "ü¢", "a", "ü¢").foreach(b.add)
    val r = MgBuffer.deserialize(b.serialize())
    assert(r.capacity == 8 && r.n == b.n)
    assert(r.counts == b.counts)
    intercept[IllegalArgumentException](MgBuffer.deserialize(Array[Byte](1, 2)))
  }

  test("aggregate over a DataFrame matches a single-node buffer gate") {
    val stream = (0 until 4000).map { i =>
      if (i % 3 == 0) s"heavy${i % 7}" else s"tail$i"
    }
    val df = stream.toDF("t").repartition(8)
    val row = df.agg(HeavyHitters.mgSummary(col("t"), 64).as("mg")).head()
    val mg = row.getStruct(0)
    val n = mg.getLong(0)
    assert(n == 4000L)
    val items = mg.getSeq[org.apache.spark.sql.Row](1)
    assert(items.size <= 64)
    // presentation order is (cnt desc, token asc)
    val pairs = items.map(r => (r.getString(0), r.getLong(1)))
    assert(pairs == pairs.sortBy(p => (-p._2, p._1)))
    val truth = exact(stream)
    val candidates = pairs.map(_._1).toSet
    truth.filter(_._2 > n / 65).keys.foreach { k =>
      assert(candidates.contains(k), s"heavy key $k missing from summary")
    }
    pairs.foreach { case (k, v) =>
      assert(v <= truth(k) && v >= truth(k) - (n / 65 + 1))
    }
  }
}
