package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, Trigger}

/** Structured Streaming layer — the reference's incremental-delivery
  * semantics (SURVEY.md §2.8) re-expressed on Spark's native streaming:
  *
  *  - T1 (event-time tumbling step buckets, reference
  *    TimeGroupedSketchAggregator step grouping): `window($"ts", step)`
  *    over a streaming source;
  *  - T2 (bounded out-of-order buffering with late-drop, reference's
  *    2-buffer flush + `t <= cutoffTime` drop,
  *    TimeGroupedSketchAggregator.scala:200-228): `withWatermark` of
  *    2 steps — the same "hold two buckets, drop older" contract, but
  *    enforced by Spark's state store instead of hand-rolled buffers;
  *  - T4 (stateful running aggregation, reference's coordinator-side
  *    running HLL union, QueryEngineV2.scala:653-668):
  *    `flatMapGroupsWithState` keeping a per-key running state and
  *    emitting an update whenever the value changes.
  *
  * Everything here takes/returns DataFrames: the same chart aggregations
  * compile onto a batch or a streaming source, which is the Spark way to
  * get the reference's "one engine, incremental delivery" behavior.
  */
object StreamingEngine {

  /** Event-time tumbling-window aggregation with a watermark.
    *
    * @param df          streaming (or batch) DataFrame
    * @param tsCol       event-time column (TimestampType)
    * @param stepMs      bucket width (reference step selection,
    *                    QueryApi.scala:297-309)
    * @param groupBys    additional grouping columns
    * @param aggs        aggregation columns (over the windowed group)
    * @param lateness    watermark delay; default 2 steps = the reference's
    *                    two-buffer reordering tolerance
    */
  def windowedAgg(df: DataFrame, tsCol: String, stepMs: Long,
      groupBys: Seq[String], aggs: Seq[Column],
      lateness: Option[String] = None): DataFrame = {
    val delay = lateness.getOrElse(s"${2 * stepMs} milliseconds")
    val windowed = df
      .withWatermark(tsCol, delay)
      .groupBy((window(col(tsCol), s"$stepMs milliseconds") ::
        groupBys.map(col).toList): _*)
      .agg(aggs.headOption.getOrElse(throw new IllegalArgumentException(
        "windowedAgg requires at least one aggregation")), aggs.tail: _*)
    // expose the bucket as epoch-millis step_ts, like the batch chart path
    windowed.withColumn("step_ts",
        expr("unix_millis(window.start)"))
      .drop("window")
  }

  /** Drain a bounded file-stream plan into a memory sink and return the
    * result table. `outputMode` defaults to append — note that under
    * append a WATERMARKED windowed aggregation emits a window only once
    * the watermark passes its end, so the trailing ~watermark-delay of
    * windows stays in the state store at termination and is absent from
    * the result. Pass "complete" when the result must equal the batch
    * twin over ALL input (the mode every oracle-compared entry uses);
    * append is the production shape for closed-window emission. */
  def runToCompletion(spark: SparkSession, sourceDir: String,
      schema: org.apache.spark.sql.types.StructType,
      plan: DataFrame => DataFrame, queryName: String,
      maxFilesPerTrigger: Int = 1, outputMode: String = "append"): DataFrame = {
    val src = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    val q = plan(src).writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  // ------------------------------------------------------- stateful running

  final case class KeyedEvent(key: String, ts: Long, value: Double)
  final case class RunningStat(key: String, ts: Long, count: Long,
      sum: Double, max: Double)

  /** T4: per-key running aggregate emitting an update row per micro-batch
    * in which the key changed — the streaming equivalent of the
    * reference's running cardinality updates. State is one small struct
    * per key in the state store. (A long-lived deployment would add an
    * idle-key timeout; processing-time timeouts don't compose with
    * Trigger.AvailableNow, which this engine uses for bounded replays.) */
  def runningStats(events: org.apache.spark.sql.Dataset[KeyedEvent])
      : org.apache.spark.sql.Dataset[RunningStat] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[RunningStat, RunningStat](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[KeyedEvent], state: GroupState[RunningStat]) =>
          var s = state.getOption.getOrElse(
            RunningStat(key, Long.MinValue, 0L, 0.0, Double.NegativeInfinity))
          var changed = false
          rows.foreach { e =>
            s = RunningStat(key, math.max(s.ts, e.ts), s.count + 1,
              s.sum + e.value, math.max(s.max, e.value))
            changed = true
          }
          if (changed) {
            state.update(s)
            Iterator.single(s)
          } else Iterator.empty
      }
  }
}
