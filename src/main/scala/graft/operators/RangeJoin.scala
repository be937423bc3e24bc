package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed point-in-interval range join: every right row whose
  * `[loCol, hiCol)` interval contains the left row's point, per key —
  * the "which incident windows / sessions / validity ranges cover this
  * event" operator. Spark plans a raw `l.ts >= r.lo AND l.ts < r.hi`
  * join as BroadcastNestedLoop (or worse, a cartesian product) because
  * neither predicate is an equality; this operator manufactures the
  * equality: intervals explode into fixed `bucketMs` time buckets,
  * points hash to their bucket, and the join is a plain equi-join on
  * (key…, bucket) + the range residual — shuffle-partitioned by key AND
  * time. Unlike [[AsOf.joinAsOf]] (latest-anchor, ≤1 match), overlapping
  * intervals produce one output row per covering interval.
  *
  * `maxLenMs` bounds the per-interval bucket explosion
  * (≤ maxLenMs/bucketMs + 1 rows); a right interval longer than
  * `maxLenMs` (or inverted) fails the join at runtime via an
  * `assert_true` guard folded into the join condition — never a silent
  * truncation.
  */
object RangeJoin {

  def pointInInterval(left: DataFrame, right: DataFrame, keys: Seq[String],
      pointCol: String, loCol: String, hiCol: String,
      rightCols: Seq[String], bucketMs: Long, maxLenMs: Long,
      joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "range join needs at least one key column")
    require(bucketMs > 0 && maxLenMs >= bucketMs,
      s"need maxLenMs >= bucketMs > 0, got bucket=$bucketMs max=$maxLenMs")
    require(joinType == "inner" || joinType == "left",
      s"unsupported join type $joinType")
    require(!left.columns.contains("_b"),
      "range join uses a _b bucket column; rename the left side's first")
    val clash = rightCols.toSet ++ Set("range_lo", "range_hi")
    require(left.columns.count(clash.contains) == 0,
      s"output columns ${left.columns.filter(clash.contains).mkString(",")} " +
      "exist on both sides; alias the left side's first")
    val rk = keys.indices.map(i => s"_rk$i")
    val anchors = right.select(
      keys.zip(rk).map { case (k, n) => col(k).as(n) } ++
        Seq(col(loCol).cast("long").as("_lo"),
          col(hiCol).cast("long").as("_hi")) ++
        rightCols.map(c => col(c).as(s"_rv_$c")): _*)
      .where(col("_hi") > col("_lo")) // empty intervals match nothing
      // referenced by the join condition, so pruning can't drop it; any
      // over-long interval throws instead of silently under-matching
      .withColumn("_guard", assert_true(col("_hi") - col("_lo") <= maxLenMs,
        lit(s"range interval longer than maxLenMs=$maxLenMs")))
      .withColumn("_b", explode(sequence(
        expr(s"_lo div $bucketMs"), expr(s"(_hi - 1) div $bucketMs"))))
    val probe = left.withColumn("_b",
      expr(s"CAST(`$pointCol` AS BIGINT) div $bucketMs"))
    val cond = keys.zip(rk).map { case (k, n) => probe(k) === anchors(n) }
      .reduce(_ && _) &&
      probe("_b") === anchors("_b") &&
      anchors("_guard").isNull &&
      anchors("_lo") <= probe(pointCol) &&
      probe(pointCol) < anchors("_hi")
    probe.join(anchors, cond, joinType)
      .select(left.columns.toIndexedSeq.map(col) ++
        Seq(col("_lo").as("range_lo"), col("_hi").as("range_hi")) ++
        rightCols.map(c => col(s"_rv_$c").as(c)): _*)
  }
}
