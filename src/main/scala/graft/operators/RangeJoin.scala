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

  /** Interval-INTERVAL overlap join: every (left, right) pair whose
    * half-open ranges intersect, per key (keys may be EMPTY — then the
    * time bucket alone is the equi-key, which is the right partitioning
    * for the classic keyless "sessions × incident windows" correlation).
    * Both sides explode into `bucketMs` buckets and equi-join on
    * (keys…, bucket) + the overlap residual (`lLo < rHi && rLo < lHi`).
    *
    * Pairs sharing several buckets are NOT deduplicated with a
    * `distinct` shuffle: the overlap of two intersecting intervals
    * starts at max(lLo, rLo), whose bucket — `greatest(floor(lLo/b),
    * floor(rLo/b))` (floor is monotone, so floor∘max = max∘floor) — is
    * covered by BOTH explosions; keeping a pair only in that first
    * shared bucket is a stateless tie-break that emits each pair
    * exactly once for free.
    *
    * Both sides carry the `maxLenMs` assert-guard: an over-long
    * interval throws rather than silently under-matching. */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
      lLoCol: String, lHiCol: String, rLoCol: String, rHiCol: String,
      rightCols: Seq[String], bucketMs: Long, maxLenMs: Long): DataFrame = {
    require(bucketMs > 0 && maxLenMs >= bucketMs,
      s"need maxLenMs >= bucketMs > 0, got bucket=$bucketMs max=$maxLenMs")
    require(!left.columns.contains("_b"),
      "overlap join uses a _b bucket column; rename the left side's first")
    val clash = rightCols.toSet ++ Set(rLoCol, rHiCol)
    require(left.columns.count(clash.contains) == 0,
      s"columns ${left.columns.filter(clash.contains).mkString(",")} " +
      "exist on both sides; alias one side's first")
    val rk = keys.indices.map(i => s"_rk$i")
    // _sb = the interval's start bucket; _guard referenced by the join
    // condition so pruning can't drop the over-length check
    def exploded(df: DataFrame, lo: String, hi: String, tag: String)
        : DataFrame =
      df.where(col(hi) > col(lo))
        .withColumn(s"_guard$tag",
          assert_true(col(hi).cast("long") - col(lo).cast("long") <= maxLenMs,
            lit(s"interval longer than maxLenMs=$maxLenMs")))
        .withColumn(s"_sb$tag",
          expr(s"CAST(`$lo` AS BIGINT) div $bucketMs"))
        .withColumn("_b", explode(sequence(col(s"_sb$tag"),
          expr(s"(CAST(`$hi` AS BIGINT) - 1) div $bucketMs"))))
    val l = exploded(left, lLoCol, lHiCol, "L")
    val r = exploded(
      right.select(
        keys.zip(rk).map { case (k, n) => col(k).as(n) } ++
          (Seq(rLoCol, rHiCol) ++ rightCols).distinct.map(col): _*),
      rLoCol, rHiCol, "R")
    val cond = (keys.zip(rk).map { case (k, n) => l(k) === r(n) } ++ Seq(
      l("_b") === r("_b"),
      l("_guardL").isNull, r("_guardR").isNull,
      l(lLoCol) < r(rHiCol), r(rLoCol) < l(lHiCol),
      // first-shared-bucket tie-break: exactly one emission per pair
      l("_b") === greatest(l("_sbL"), r("_sbR")))).reduce(_ && _)
    l.join(r, cond, "inner")
      .select(left.columns.toIndexedSeq.map(col) ++
        rightCols.map(c => r(c)): _*)
  }
}
