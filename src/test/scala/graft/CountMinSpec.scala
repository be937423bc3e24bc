package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{CmBuffer, CmFunctions}

class CountMinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def mix(i: Long): Long = graft.functions.SketchExpressions.mix(i)

  test("never undercounts; exact on a sparse vocabulary") {
    val b = new CmBuffer(4, 8192)
    // 100 distinct keys, key i inserted i+1 times
    for (i <- 0L until 100L; _ <- 0 to i.toInt) b.add(mix(i))
    for (i <- 0L until 100L) {
      val est = b.estimate(mix(i))
      assert(est >= i + 1, s"undercount at $i: $est")
      // 100 keys in 4x8192 counters: collisions in all 4 rows are
      // (100/8192)^4-improbable, and mix() is fixed — deterministic
      assert(est === i + 1, s"collision inflated $i: $est")
    }
    // absent keys estimate 0 on this near-empty matrix
    assert(b.estimate(mix(100000L)) === 0L)
  }

  test("merge is element-wise addition: merged == insert-all") {
    val a = new CmBuffer(4, 1024)
    val b = new CmBuffer(4, 1024)
    val both = new CmBuffer(4, 1024)
    for (i <- 0L until 500L) {
      if (i % 2 == 0) a.add(mix(i)) else b.add(mix(i))
      both.add(mix(i))
    }
    a.merge(b)
    assert(a.counters.toSeq === both.counters.toSeq)
  }

  test("estimate error is bounded by eps*N even under heavy collision") {
    // tiny width forces collisions; the eps*N = (e/width)*N bound must
    // hold for every probe (with depth 8, failure prob e^-8 per probe —
    // and the fixed hash family makes the outcome deterministic anyway)
    val n = 20000
    val width = 64
    val b = new CmBuffer(8, width)
    for (i <- 0L until n.toLong) b.add(mix(i % 1000))
    val bound = math.ceil(math.E / width * n).toLong
    for (i <- 0L until 1000L) {
      val exact = n / 1000
      val est = b.estimate(mix(i))
      assert(est >= exact)
      assert(est - exact <= bound, s"key $i: est $est exact $exact bound $bound")
    }
  }

  test("serialization round-trips; corrupt payloads fail loudly") {
    val b = new CmBuffer(4, 256)
    for (i <- 0L until 100L) b.add(mix(i))
    val back = CmBuffer.deserialize(b.serialize())
    assert(back.depth === 4 && back.width === 256)
    assert(back.counters.toSeq === b.counters.toSeq)
    intercept[IllegalArgumentException] {
      CmBuffer.deserialize(Array[Byte](1, 2))
    }
    intercept[IllegalArgumentException] {
      CmBuffer.deserialize(b.serialize().dropRight(1))
    }
    intercept[IllegalArgumentException] {
      val bad = b.serialize(); bad(0) = 99; CmBuffer.deserialize(bad)
    }
  }

  test("aggregate + merge aggregate + probe through the Column API") {
    import spark.implicits._
    // 3 groups x tokens with known counts; partial aggregation across
    // partitions must not change the additive result
    val rows = for {
      g <- Seq("a", "b", "c"); i <- 0 until 50; _ <- 0 to (i % 3)
    } yield (g, s"tok$i")
    val df = rows.toDF("g", "w").repartition(8)
    val perGroup = df.groupBy($"g")
      .agg(CmFunctions.cmSketch($"w", depth = 4, width = 4096).as("sk"))
    val probed = perGroup
      .select($"g", CmFunctions.cmEstimateOf($"sk", lit("tok4")).as("est"))
      .orderBy("g").collect()
    // tok4 appears (4 % 3) + 1 = 2 times per group
    assert(probed.map(_.getLong(1)).toSeq === Seq(2L, 2L, 2L))
    // union of the three sketches == sketch of everything
    val merged = perGroup.agg(CmFunctions.cmMerge($"sk").as("sk"))
      .select(CmFunctions.cmEstimateOf($"sk", lit("tok4")).as("est"))
      .head().getLong(0)
    assert(merged === 6L)
    // merge of zero sketches is null, not a crash
    val none = perGroup.where($"g" === "zzz")
      .agg(CmFunctions.cmMerge($"sk").as("sk")).head()
    assert(none.isNullAt(0))
  }
}
