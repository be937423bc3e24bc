package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.StreamingQueries
import graft.streaming.StreamingEngine

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("streaming windowed agg converges to the batch answer") {
    val streamed = StreamingQueries.st1_stream_window(spark, sf).collect()
    val batch = Tables.load(spark, sf, "events")
      .groupBy(
        (expr("ts div 1000000") - expr("ts div 1000000") % 3600000L).as("step_ts"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy("step_ts", "event_type")
      .collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("running stats via flatMapGroupsWithState equals batch aggregate") {
    val streamed = StreamingQueries.st2_running_stats(spark, sf).collect()
    val batch = Tables.load(spark, sf, "events")
      .groupBy(col("event_type").as("key"))
      .agg(count(lit(1)).as("n"), max("value").as("max_value"),
        max(expr("ts div 1000000")).as("last_ts"))
      .orderBy("key")
      .collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("st10: sealed segments and live state store tile the full rollup") {
    // the union view must equal the complete-mode answer over ALL events,
    // and the two halves must be disjoint (eviction-on-emit: a window is
    // in the state store iff the watermark has not closed it)
    val union = StreamingQueries.st10_live_sealed_union(spark, sf).collect()
    val sealedN = StreamingQueries.st4_rollup_segments(spark, sf).count()
    assert(sealedN < union.length,
      "expected at least one unsealed in-flight window")
    val complete = Tables.load(spark, sf, "events")
      .groupBy(
        (expr("ts div 1000000") - expr("ts div 1000000") % 60000L).as("ts"),
        col("event_type"))
      .agg(
        sum(col("value").cast("decimal(18,2)")).cast("double").as("rollup_sum"),
        count(lit(1)).cast("double").as("rollup_count"),
        min("value").as("rollup_min"), max("value").as("rollup_max"))
      .withColumn("rollup_avg", col("rollup_sum") / col("rollup_count"))
      .select("ts", "event_type", "rollup_sum", "rollup_count",
        "rollup_min", "rollup_max", "rollup_avg")
      .orderBy("ts", "event_type")
      .collect()
    assert(union.length == complete.length,
      s"union ${union.length} windows vs batch ${complete.length}")
    union.zip(complete).foreach { case (u, b) => assert(u == b) }
  }

  test("append mode with watermark drops late rows and closes windows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Double)]
    val df = input.toDF().toDF("ts", "value")
    val agg = StreamingEngine.windowedAgg(
      df, "ts", stepMs = 10000L, groupBys = Nil,
      aggs = Seq(sum(col("value")).as("total")))
    val q = agg.writeStream.format("memory").queryName("wm_test")
      .outputMode(OutputMode.Append()).start()

    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    // bucket [0,10): 1.0 + 2.0
    input.addData((ts(1), 1.0), (ts(5), 2.0))
    q.processAllAvailable()
    // jump far ahead: watermark (2 steps = 20 s behind max) passes bucket 0
    input.addData((ts(100), 7.0))
    q.processAllAvailable()
    // late row for bucket 0: behind the watermark → dropped
    input.addData((ts(6), 100.0))
    q.processAllAvailable()
    val closed = spark.table("wm_test")
      .select(col("step_ts"), col("total")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    q.stop()
    assert(closed == Map(0L -> 3.0)) // closed without the late 100.0;
    // bucket [100,110) still open (watermark 80 s) → not emitted in append
  }

  test("stream-stream interval join emits pairs incrementally, both arrival orders") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // NOT near epoch 0: the initial global watermark clamps at 0, and the
    // interval join's derived state bound (watermark − delay, also
    // clamped) treats epoch-adjacent rows as already-expired — a real
    // 1970-timestamp corpus would silently join to nothing
    def ts(sec: Long) = new java.sql.Timestamp((1700000000L + sec) * 1000)
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val c = clicks.toDF().toDF("click_id", "user_id", "c_t")
      .withWatermark("c_t", "1 hour")
    val p = purchases.toDF().toDF("purchase_id", "p_user_id", "p_t")
      .withWatermark("p_t", "1 hour")
    val joined = c.join(p,
      col("user_id") === col("p_user_id") &&
        col("p_t") >= col("c_t") &&
        col("p_t") <= col("c_t") + org.apache.spark.sql.functions
          .expr("INTERVAL 100 SECONDS"))
      .select(col("click_id"), col("purchase_id"))
    val q = joined.writeStream.format("memory").queryName("ss_join_test")
      .outputMode(OutputMode.Append()).start()
    def rows() = spark.table("ss_join_test").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // click first, matching purchase later (same user, inside the window)
    clicks.addData((1L, 10L, ts(0)))
    q.processAllAvailable()
    assert(rows() === Set.empty)
    purchases.addData((100L, 10L, ts(50)))
    q.processAllAvailable()
    assert(rows() === Set((1L, 100L)), "purchase-after-click pair")
    // purchase first, click arrives later: state holds BOTH sides
    purchases.addData((101L, 20L, ts(60)))
    q.processAllAvailable()
    clicks.addData((2L, 20L, ts(30)))
    q.processAllAvailable()
    assert(rows() === Set((1L, 100L), (2L, 101L)), "click-after-purchase pair")
    // same user but outside the interval → no pair; wrong user → no pair
    purchases.addData((102L, 10L, ts(200)), (103L, 99L, ts(55)))
    q.processAllAvailable()
    q.stop()
    assert(rows() === Set((1L, 100L), (2L, 101L)))
  }
}
