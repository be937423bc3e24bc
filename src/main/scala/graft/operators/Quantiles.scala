package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

/** Exact per-group order statistics by distributed selection.
  *
  * A `Window.partitionBy(group).orderBy(value)` row_number plan sorts
  * every row of a group inside ONE task — with a handful of groups that
  * is a handful of tasks sorting the whole table, the classic low-
  * cardinality window trap. This helper instead:
  *
  *   1. range-partitions the narrow (group, value) projection across the
  *      full shuffle width (a group larger than one partition simply
  *      spans several — each task sorts ~1/parts of the data);
  *   2. counts rows per (partition, group) — one tiny row per pair — and
  *      prefix-sums them on the driver into global rank offsets (planning
  *      metadata, KBs, same defensible collect as Sampling's prefix sum);
  *   3. picks the target order statistics with one targeted job over only
  *      the partitions that contain them, tracking local ranks.
  *
  * The shuffle carries (group, value) only; no task ever holds more than
  * its partition slice; the result (groups × quantiles values) is
  * inherently tiny. Rank convention: the statistic at quantile q over n
  * rows is the value with 1-based rank `floor(q*(n-1)) + 1` — the
  * nearest-rank form DDSketch's accuracy contract is stated against
  * (reference BaseExpr.scala:97-102 quantile read path).
  */
object Quantiles {

  /** Default rank convention: 1-based `floor(q*(n-1)) + 1` (see class
    * doc). */
  def nearestRank(q: Double, n: Long): Long =
    math.floor(q * (n - 1)).toLong + 1

  /** `max(ceil(q*n), 1)` — the convention a5's DDSketch verification
    * gate is stated against. */
  def ceilRank(q: Double, n: Long): Long =
    math.max(math.ceil(q * n).toLong, 1L)

  /** Exact quantile values for each group of `groupCol` (a string
    * column). Returns one row per group: (groupCol, <name> ...) with a
    * double column per requested quantile. `qs` maps output column name
    * to quantile in [0, 1]; `rankOf` maps (q, group size) to the 1-based
    * rank of the statistic. */
  def exactByGroup(df: DataFrame, groupCol: String, value: Column,
      qs: Seq[(String, Double)], numPartitions: Int = 0,
      rankOf: (Double, Long) => Long = nearestRank): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val narrow = df
      .select(col(groupCol).cast("string").as("_g"),
        value.cast("double").as("_v"))
      .where(col("_g").isNotNull && col("_v").isNotNull)
      .repartitionByRange(parts, col("_g"), col("_v"))
      .sortWithinPartitions(col("_g"), col("_v"))
      .persist()
    try {
      // (pid, group) -> row count; partitions hold contiguous (g, v)
      // ranges so each pair appears once per partition it spans.
      val counts: Array[(Int, String, Long)] = narrow.rdd
        .mapPartitionsWithIndex { (pid, it) =>
          val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
          it.foreach { r =>
            val g = r.getString(0)
            m.update(g, m.getOrElse(g, 0L) + 1L)
          }
          m.iterator.map { case (g, c) => (pid, g, c) }
        }.collect()
      // Per group, its partition spans in pid order with running "rows
      // before" offsets (range partitioning keeps groups contiguous
      // across pid order). Built once, looked up per target — linear in
      // groups × partitions, not quadratic.
      val spans: Map[String, Array[(Int, Long, Long)]] = // (pid, before, c)
        counts.groupBy(_._2).map { case (g, cs) =>
          val sorted = cs.sortBy(_._1)
          g -> sorted.zip(sorted.scanLeft(0L)(_ + _._3))
            .map { case ((pid, _, c), before) => (pid, before, c) }
            .toArray
        }
      // (pid -> targets within it): group, quantile name, 1-based local rank
      val targets: Map[Int, Seq[(String, String, Long)]] = (for {
        (g, gSpans) <- spans.toSeq
        n = gSpans.map(_._3).sum
        (name, q) <- qs
      } yield {
        val rank = rankOf(q, n) // 1-based global
        // binary search: last span with before < rank holds the target
        val i = {
          var lo = 0; var hi = gSpans.length - 1
          while (lo < hi) {
            val mid = (lo + hi + 1) >>> 1
            if (gSpans(mid)._2 < rank) lo = mid else hi = mid - 1
          }
          lo
        }
        val (pid, before, _) = gSpans(i)
        (pid, (g, name, rank - before))
      }).groupBy(_._1).map { case (p, ts) => p -> ts.map(_._2) }
      val picked: Array[(String, String, Double)] = {
        if (targets.isEmpty) Array.empty
        else spark.sparkContext.runJob(
          narrow.rdd,
          (ctx: org.apache.spark.TaskContext, it: Iterator[Row]) => {
            val want = targets(ctx.partitionId())
            val local = scala.collection.mutable.HashMap.empty[String, Long]
            val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Double)]
            var remaining = want.size
            while (remaining > 0 && it.hasNext) {
              val r = it.next()
              val g = r.getString(0)
              val idx = local.getOrElse(g, 0L) + 1L
              local.update(g, idx)
              want.foreach { case (wg, name, lr) =>
                if (wg == g && lr == idx) { out += ((g, name, r.getDouble(1))); remaining -= 1 }
              }
            }
            out.toArray
          },
          targets.keys.toSeq.sorted).flatten
      }
      val names = qs.map(_._1)
      val rows = picked.groupBy(_._1).toSeq.map { case (g, vs) =>
        val byName = vs.map(v => v._2 -> v._3).toMap
        Row.fromSeq(g +: names.map(byName))
      }
      val schema = StructType(StructField(groupCol, StringType) +:
        names.map(n => StructField(n, DoubleType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
    } finally narrow.unpersist(blocking = false)
  }

  /** Exact WEIGHTED quantiles per group — the statistic Spark has no
    * built-in for at all (percentile_approx is unweighted): the smallest
    * value v such that the cumulative weight of rows ≤ v reaches the
    * target. Semantics are [[exactByGroup]]'s nearest-rank convention
    * over the weight-expanded multiset (a row with weight w counts as w
    * copies): target weight-rank = floor(q·(W−1)) + 1 with W the group's
    * total weight. Token-weighted length quantiles ("the document length
    * below which half of all TOKENS live") are the canonical curation
    * use — an unweighted median over documents badly misstates where the
    * token mass sits.
    *
    * Same distributed-selection shape as [[exactByGroup]]: range
    * partition the narrow (group, value, weight) projection, per-span
    * WEIGHT sums prefix-summed on the driver (planning metadata), one
    * targeted job over only the partitions containing a target,
    * accumulating local weight until the rank is crossed. Ties in value
    * are safe under any row order — every row of a tied run carries the
    * same value, so the crossing row's value is deterministic. Weights
    * must be positive integers (fail-fast on ≤ 0 / null). */
  def exactWeightedByGroup(df: DataFrame, groupCol: String, value: Column,
      weight: Column, qs: Seq[(String, Double)],
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val narrow = df
      .select(col(groupCol).cast("string").as("_g"),
        value.cast("double").as("_v"), weight.cast("long").as("_w"))
      .where(col("_g").isNotNull && col("_v").isNotNull)
      .repartitionByRange(parts, col("_g"), col("_v"))
      .sortWithinPartitions(col("_g"), col("_v"))
      .persist()
    try {
      val counts: Array[(Int, String, Long)] = narrow.rdd
        .mapPartitionsWithIndex { (pid, it) =>
          val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
          it.foreach { r =>
            val g = r.getString(0)
            val w = if (r.isNullAt(2)) 0L else r.getLong(2)
            require(w > 0, s"exactWeightedByGroup needs positive weights; " +
              s"got $w in group $g")
            m.update(g, m.getOrElse(g, 0L) + w)
          }
          m.iterator.map { case (g, c) => (pid, g, c) }
        }.collect()
      val spans: Map[String, Array[(Int, Long, Long)]] =
        counts.groupBy(_._2).map { case (g, cs) =>
          val sorted = cs.sortBy(_._1)
          g -> sorted.zip(sorted.scanLeft(0L)(_ + _._3))
            .map { case ((pid, _, c), before) => (pid, before, c) }
            .toArray
        }
      val targets: Map[Int, Seq[(String, String, Long)]] = (for {
        (g, gSpans) <- spans.toSeq
        w = gSpans.map(_._3).sum
        (name, q) <- qs
      } yield {
        val rank = math.floor(q * (w - 1)).toLong + 1 // 1-based weight rank
        val i = {
          var lo = 0; var hi = gSpans.length - 1
          while (lo < hi) {
            val mid = (lo + hi + 1) >>> 1
            if (gSpans(mid)._2 < rank) lo = mid else hi = mid - 1
          }
          lo
        }
        val (pid, before, _) = gSpans(i)
        (pid, (g, name, rank - before))
      }).groupBy(_._1).map { case (p, ts) => p -> ts.map(_._2) }
      val picked: Array[(String, String, Double)] = {
        if (targets.isEmpty) Array.empty
        else spark.sparkContext.runJob(
          narrow.rdd,
          (ctx: org.apache.spark.TaskContext, it: Iterator[Row]) => {
            val want = targets(ctx.partitionId())
            val localW = scala.collection.mutable.HashMap.empty[String, Long]
            val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Double)]
            val pending = scala.collection.mutable.ArrayBuffer(want: _*)
            while (pending.nonEmpty && it.hasNext) {
              val r = it.next()
              val g = r.getString(0)
              val before = localW.getOrElse(g, 0L)
              val after = before + r.getLong(2)
              localW.update(g, after)
              var i = 0
              while (i < pending.size) {
                val (wg, name, lr) = pending(i)
                if (wg == g && before < lr && lr <= after) {
                  out += ((g, name, r.getDouble(1)))
                  pending.remove(i)
                } else i += 1
              }
            }
            out.toArray
          },
          targets.keys.toSeq.sorted).flatten
      }
      val names = qs.map(_._1)
      val rows = picked.groupBy(_._1).toSeq.map { case (g, vs) =>
        val byName = vs.map(v => v._2 -> v._3).toMap
        Row.fromSeq(g +: names.map(byName))
      }
      val schema = StructType(StructField(groupCol, StringType) +:
        names.map(n => StructField(n, DoubleType)))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
    } finally narrow.unpersist(blocking = false)
  }
}
