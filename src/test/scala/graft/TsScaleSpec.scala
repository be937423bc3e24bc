package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.UnwrapScaledComparison

/** UnwrapScaledComparison: `attr * c cmp lit` must collapse to a plain
  * attribute predicate (so parquet can push it) without changing a single
  * row of output — including non-divisible literals, strict/non-strict
  * bounds, negative values, and literal-on-left mirrors.
  */
class TsScaleSpec extends AnyFunSuite {
  private lazy val s = SparkTestSession.spark
  import scala.jdk.CollectionConverters._

  private lazy val base = {
    UnwrapScaledComparison.install(s)
    val rows = (-5L to 5L).map(v => org.apache.spark.sql.Row(v)).asJava
    s.createDataFrame(rows, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType))))
  }

  /** Evaluate the same predicate through (a) the optimized plan with the
    * rule installed and (b) literal row-by-row Scala arithmetic. */
  private def check(opName: String, f: Long => Boolean,
                    cond: org.apache.spark.sql.Column): Unit = {
    val got = base.where(cond).collect().map(_.getLong(0)).toSet
    val want = (-5L to 5L).filter(v => f(v * 1000L)).toSet
    assert(got == want, s"$opName: got $got want $want")
    // and the optimized plan must not retain the multiply
    val opt = base.where(cond).queryExecution.optimizedPlan.toString
    assert(!opt.contains("* 1000"), s"$opName plan still scales: $opt")
  }

  test("strict and non-strict bounds, divisible literals") {
    check(">= 2000", _ >= 2000L, col("v") * 1000L >= 2000L)
    check("> 2000", _ > 2000L, col("v") * 1000L > 2000L)
    check("<= -3000", _ <= -3000L, col("v") * 1000L <= -3000L)
    check("< -3000", _ < -3000L, col("v") * 1000L < -3000L)
    check("= 4000", _ == 4000L, col("v") * 1000L === 4000L)
  }

  test("non-divisible literals keep exact semantics") {
    check(">= 1500", _ >= 1500L, col("v") * 1000L >= 1500L)
    check("> 1500", _ > 1500L, col("v") * 1000L > 1500L)
    check("<= 1500", _ <= 1500L, col("v") * 1000L <= 1500L)
    check("< -1500", _ < -1500L, col("v") * 1000L < -1500L)
    check("> -999", _ > -999L, col("v") * 1000L > -999L)
    check("< 999", _ < 999L, col("v") * 1000L < 999L)
  }

  test("literal-on-left mirrors normalize to attribute-on-left") {
    check("2000 <= v*c", v => 2000L <= v, lit(2000L) <= col("v") * 1000L)
    check("1500 < v*c", v => 1500L < v, lit(1500L) < col("v") * 1000L)
    check("-1500 >= v*c", v => -1500L >= v, lit(-1500L) >= col("v") * 1000L)
    check("999 > v*c", v => 999L > v, lit(999L) > col("v") * 1000L)
  }

  test("constant-on-left multiply form unwraps too") {
    check("c*v >= 2000", _ >= 2000L, lit(1000L) * col("v") >= 2000L)
  }

  test("non-divisible equality is left untouched (no false fold)") {
    val df = base.where(col("v") * 1000L === 1500L)
    assert(df.count() == 0)
  }

  test("TsEncoding.nanosScale separates the four storage units") {
    // 2024-01-15 in each unit
    assert(TsEncoding.nanosScale(1705276800000000000L) == 1L) // nanos
    assert(TsEncoding.nanosScale(1705276800000000L) == 1000L) // micros
    assert(TsEncoding.nanosScale(1705276800000L) == 1000000L) // millis
    assert(TsEncoding.nanosScale(1705276800L) == 1000000000L) // seconds
    // band edges: 1973 and 2100 stay inside their unit
    assert(TsEncoding.nanosScale(java.time.Instant.parse("1973-04-01T00:00:00Z")
      .toEpochMilli * 1000000L) == 1L)
    assert(TsEncoding.nanosScale(java.time.Instant.parse("2100-01-01T00:00:00Z")
      .toEpochMilli) == 1000000L)
  }

  test("events load at the fixture exposes canonical epoch-nanos ts") {
    val df = Tables.load(s, SparkTestSession.sfDir, "events")
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)
    val mn = df.agg(min("ts")).collect()(0).getLong(0)
    // 2024 in nanos is ~1.7e18; any unit slip shows up as a 1000× shift
    assert(mn > 1700000000000000000L && mn < 1740000000000000000L,
      s"min ts $mn is not epoch-nanos in 2024")
  }
}
