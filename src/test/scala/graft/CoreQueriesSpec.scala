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
}
