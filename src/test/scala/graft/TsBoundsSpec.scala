package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins the r16 footer-statistics bounds lookup: the incremental
  * entries' SegmentSpan now comes from `Tables.tsBoundsNanos` (parquet
  * footer min/max, no Spark job) with the one-row aggregate as the
  * fallback. int64 footer statistics are exact, so the two paths MUST
  * agree bit-for-bit on every fixture — the emit_seq day grid derives
  * from these values, and any divergence renumbers every replay group
  * and fails the oracle. */
class TsBoundsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"footer ts bounds equal the aggregate bounds on $sf") {
      val dir = s"/root/testdata/$sf"
      val footer = Tables.tsBoundsNanos(spark, dir, "events")
      assert(footer.isDefined,
        "events.parquet must carry usable int64 ts statistics")
      val b = Tables.load(spark, dir, "events")
        .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")).head()
      assert(footer.get === ((b.getLong(0), b.getLong(1))))
    }
  }

  test("a table without the ts column yields None, not a bad bound") {
    assert(Tables.tsBoundsNanos(spark, "/root/testdata/sf0.001",
      "documents").isEmpty)
  }
}
