package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed AS-OF join: each left row is matched to the single right
  * row with the greatest `rightTs <= leftTs` for its key, if
  * `leftTs - rightTs < toleranceMs` — the tolerance horizon is
  * EXCLUSIVE (a row exactly toleranceMs after its anchor does not
  * match; pandas merge_asof is inclusive — half-open intervals tile the
  * timeline without overlap, and the spec + DuckDB oracle pin this
  * choice). The "enrich each event with the latest preceding
  * rollup/quote/state" operator (DuckDB/kdb ASOF JOIN; Spark has no
  * native equivalent).
  *
  * Scale shape: the textbook formulation — union both sides, window over
  * key ordered by ts, `last(value, ignoreNulls)` — partitions by KEY
  * alone; observability keys are few (one per series), so the whole fact
  * table serializes into a handful of window tasks (the same
  * low-cardinality trap [[Quantiles]] replaces). Here the RIGHT side
  * (the anchor series, orders of magnitude smaller than the fact table)
  * computes its validity interval `[ts, next_ts)` with a window over
  * ITSELF, intervals are clipped to the tolerance and exploded into
  * fixed `bucketMs` time buckets (≤ toleranceMs/bucketMs + 1 rows per
  * anchor), and the join is a plain equi-join on (key…, bucket):
  * shuffle-partitioned by key AND time, so hot keys spread across the
  * cluster; broadcast/AQE eligible when the anchor side is small.
  * Intervals are disjoint and each left row occupies one bucket, so at
  * most one right row survives the range predicate — no dedup pass.
  *
  * Requirements: `rightTs` strictly increasing per key (pre-aggregate
  * duplicate anchors); finite positive `toleranceMs` (it bounds the
  * interval explosion; an unbounded as-of would explode a key's final
  * anchor over the whole remaining timeline).
  */
object AsOf {

  /** @param rightCols right columns to carry into the output (the
    *   matched anchor's `rightTs` is always included, as `asof_ts`);
    *   null on unmatched left rows under `joinType = "left"`. */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightCols: Seq[String],
      toleranceMs: Long, bucketMs: Long,
      joinType: String = "left"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    require(toleranceMs > 0 && toleranceMs < Long.MaxValue / 2,
      s"toleranceMs $toleranceMs must be finite positive")
    require(bucketMs > 0, s"bucketMs $bucketMs must be positive")
    require(joinType == "left" || joinType == "inner",
      s"unsupported join type $joinType")
    require(!left.columns.contains("_b"),
      "as-of join uses a _b bucket column; rename the left side's first")
    val clash = rightCols.toSet ++ Set("asof_ts")
    require(left.columns.count(clash.contains) == 0,
      s"output columns ${left.columns.filter(clash.contains).mkString(",")} " +
      "exist on both sides; alias the left side's first")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col(rightTs))
    // interval end: next anchor, clipped to the tolerance horizon
    val withEnd = right
      .withColumn("_end", least(
        coalesce(lead(col(rightTs), 1).over(w), lit(Long.MaxValue)),
        col(rightTs) + lit(toleranceMs)))
      .where(col("_end") > col(rightTs)) // drop empty intervals (dup anchors)
    val rk = keys.indices.map(i => s"_rk$i")
    val anchors = withEnd.select(
      keys.zip(rk).map { case (k, n) => col(k).as(n) } ++
        Seq(col(rightTs).cast("long").as("_rts"), col("_end").as("_e")) ++
        rightCols.map(c => col(c).as(s"_rv_$c")): _*)
      .withColumn("_b", explode(sequence(
        expr(s"_rts div $bucketMs"),
        expr(s"(_e - 1) div $bucketMs"))))
    val probe = left.withColumn("_b",
      expr(s"CAST(`$leftTs` AS BIGINT) div $bucketMs"))
    val cond = keys.zip(rk).map { case (k, n) => probe(k) === anchors(n) }
      .reduce(_ && _) &&
      probe("_b") === anchors("_b") &&
      anchors("_rts") <= probe(leftTs) &&
      probe(leftTs) < anchors("_e")
    probe.join(anchors, cond, joinType)
      .select(left.columns.toIndexedSeq.map(col) ++
        Seq(col("_rts").as("asof_ts")) ++
        rightCols.map(c => col(s"_rv_$c").as(c)): _*)
  }
}
