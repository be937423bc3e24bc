package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.CoreQueries

class CoreQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = SparkTestSession.sfDir

  test("every registered query runs and yields rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      assert(df.count() > 0, s"query $name returned 0 rows")
    }
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without query impl: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("Ema.finalEma closed form equals the sequential recurrence") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val xs = Seq(10.0, 12.0, 9.0, 20.0, 15.0, 15.0, 3.25)
    val df = xs.zipWithIndex
      .map { case (x, i) => ("g", i.toLong, x) }.toDF("g", "i", "x")
      // shuffled input: ordering must come from the window, not the data
      .repartition(4)
    val row = graft.functions.Ema.finalEma(
      df, Seq("g"), col("i"), col("x"), alpha = 0.3).collect()(0)
    // the reference recurrence (EMA.scala:20-40): seed first, then
    // ema += alpha * (sample - ema)
    val want = xs.tail.foldLeft(xs.head)((e, x) => e + 0.3 * (x - e))
    assert(row.getLong(1) == xs.length)
    // per-term round-9 accumulation bounds the divergence at n·5e-10
    assert(math.abs(row.getDouble(2) - want) < xs.length * 5e-10 + 1e-12,
      s"closed form ${row.getDouble(2)} vs recurrence $want")
  }

  test("Ema.finalEma refuses group columns colliding with working names") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(("g", 1L, 1.0)).toDF("_k", "i", "x")
    val e = intercept[IllegalArgumentException] {
      graft.functions.Ema.finalEma(df, Seq("_k"), col("i"), col("x"), 0.3)
    }
    assert(e.getMessage.contains("_k"))
  }

  test("a3_pricing_agg values are sane") {
    val rows = CoreQueries.a3_pricing_agg(spark, dir).collect()
    assert(rows.length >= 3)
    val r = rows.head
    assert(r.getAs[Double]("sum_base_price") > 0)
    assert(r.getAs[Long]("count_order") > 0)
  }

  test("o1_topk is ts-descending") {
    val ts = CoreQueries.o1_topk(spark, dir).collect().map(_.getAs[Long]("ts_ms"))
    assert(ts.sameElements(ts.sorted(Ordering[Long].reverse)))
  }

  test("j1_formula_add zero-fills missing sides") {
    // full-outer + coalesce: row count >= either input's bucket count
    val n = CoreQueries.j1_formula_add(spark, dir).count()
    assert(n > 0)
  }

  test("j10_scd2 intervals tile each user's timeline without overlap") {
    val rows = CoreQueries.j10_scd2(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("valid_from"),
        r.getAs[Long]("valid_to"), r.getAs[Boolean]("is_current")))
      .groupBy(_._1)
    rows.foreach { case (_, ivs) =>
      val sorted = ivs.sortBy(x => (x._2, x._3))
      // each interval's valid_to is the next interval's valid_from
      // (equal-ms change pairs collapse the interval to zero length but
      // never overlap), and exactly the last one is open/current
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 == b._2); case _ =>
      }
      assert(sorted.count(_._4) == 1 && sorted.last._4)
      assert(sorted.last._3 == 253402300800000L)
    }
  }

  test("a25_unpivot is the exact long-form of the wide aggregate") {
    val long = CoreQueries.a25_unpivot(spark, dir).collect()
    val flags = long.map(_.getAs[String]("l_returnflag")).distinct
    // 3 measures per flag, no nulls, measure names fixed
    assert(long.length == flags.length * 3)
    assert(long.map(_.getAs[String]("measure")).toSet ==
      Set("qty", "price", "disc"))
    assert(long.forall(!_.isNullAt(2)))
  }

  test("a26 z-scores: flagged rows all exceed the 2-sigma threshold") {
    val rows = CoreQueries.a26_rolling_anomaly(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val z = r.getAs[Double]("z")
      assert(!z.isNaN && !z.isInfinite)
      assert(r.getAs[Boolean]("is_anomaly") == (math.abs(z) > 2.0))
    }
  }
}
