package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

/** Exact per-group order statistics.
  *
  * A `Window.partitionBy(group).orderBy(value)` row_number plan sorts
  * every row of a group inside ONE task — with a handful of groups that
  * is a handful of tasks sorting the whole table, the classic low-
  * cardinality window trap. The at-scale path here is distributed
  * selection instead:
  *
  *   1. range-partition the narrow (group, value) projection across the
  *      full shuffle width (a group larger than one partition simply
  *      spans several — each task sorts ~1/parts of the data);
  *   2. count rows per (partition, group) — one tiny row per pair — and
  *      prefix-sum them on the driver into global rank offsets (planning
  *      metadata, KBs, same defensible collect as Sampling's prefix sum);
  *   3. pick the target order statistics with one targeted job over only
  *      the partitions that contain them, tracking local ranks.
  *
  * The shuffle carries (group, value) only; no task ever holds more than
  * its partition slice; the result (groups × quantiles values) is
  * inherently tiny. Rank convention: the statistic at quantile q over n
  * rows is the value with 1-based rank `floor(q*(n-1)) + 1` — the
  * nearest-rank form DDSketch's accuracy contract is stated against
  * (reference BaseExpr.scala:97-102 quantile read path).
  *
  * Small-corpus fast lane (r15): the selection is a three-job chain
  * (range sampler, shuffle+counts, targeted pick) whose scheduling floor
  * dwarfs the work when the whole projection is a few MB — and on a
  * single-row-group file the sampler and shuffle map side each re-run
  * the scan SERIALLY. Below an ABSOLUTE byte ceiling (plan statistics,
  * deliberately not scaled by cluster size — the r14 spread-gate lesson)
  * the same statistic computes as ONE job: group-aggregate
  * `sort_array(collect_list(v))` and index it at the rule's rank. Value-
  * identical by construction — the value at a rank is a multiset
  * property — and the ceiling bounds the per-task sort to what a single
  * task comfortably holds. Past the gate the selection path is the only
  * shape that survives 100 TB. Job economy on the selection path itself:
  * the counts and pick jobs run over ONE shared lineage (the pick job
  * skips scan + shuffle map stages via registered map outputs and
  * re-sorts only the targeted partitions' slices), there is no persist,
  * and the result lands as a LocalRelation (no trailing parallelize
  * jobs).
  */
object Quantiles {

  /** Rank convention: 1-based rank of the q-statistic over a group of n
    * rows, as both driver arithmetic (selection path) and a Column over
    * the group size (fast lane) — the two spellings run the same IEEE
    * ops so the paths cannot diverge. */
  sealed trait RankRule extends Serializable {
    def rank(q: Double, n: Long): Long
    def rankCol(q: Double, n: Column): Column
  }

  /** `floor(q*(n-1)) + 1` — the default (see class doc). */
  case object NearestRank extends RankRule {
    def rank(q: Double, n: Long): Long = math.floor(q * (n - 1)).toLong + 1
    def rankCol(q: Double, n: Column): Column =
      floor(lit(q) * (n.cast("double") - 1)).cast("long") + 1L
  }

  /** `max(ceil(q*n), 1)` — the convention a5's DDSketch verification
    * gate is stated against. */
  case object CeilRank extends RankRule {
    def rank(q: Double, n: Long): Long =
      math.max(math.ceil(q * n).toLong, 1L)
    def rankCol(q: Double, n: Column): Column =
      greatest(ceil(lit(q) * n.cast("double")).cast("long"), lit(1L))
  }

  /** Absolute uncompressed-byte ceiling for the one-job fast lane: a
    * single final-aggregate task may hold and sort one group's values,
    * so the whole projection must stay comfortably inside task memory.
    * NOT scaled by cluster size on purpose — a threshold in units of
    * `cores × maxPartitionBytes` would widen with the cluster and
    * funnel a huge corpus into one task. */
  private[graft] val SmallPathBytes: Long = 128L << 20

  /** Exact quantile values for each group of `groupCol` (a string
    * column). Returns one row per group: (groupCol, <name> ...) with a
    * double column per requested quantile. `qs` maps output column name
    * to quantile in [0, 1]; `rule` maps (q, group size) to the 1-based
    * rank of the statistic. */
  def exactByGroup(df: DataFrame, groupCol: String, value: Column,
      qs: Seq[(String, Double)], numPartitions: Int = 0,
      rule: RankRule = NearestRank): DataFrame = {
    val narrow = df
      .select(col(groupCol).cast("string").as("_g"),
        value.cast("double").as("_v"))
      .where(col("_g").isNotNull && col("_v").isNotNull)
    if (Dedup.statsBytes(narrow).exists(_ < SmallPathBytes)) {
      // fast lane: one job, one shuffle of partial collect buffers
      val vs = col("_vs")
      narrow.groupBy(col("_g"))
        .agg(sort_array(collect_list(col("_v"))).as("_vs"))
        .select(col("_g").as(groupCol) +: qs.map { case (name, q) =>
          element_at(vs, rule.rankCol(q, size(vs)).cast("int")).as(name)
        }: _*)
    } else selectByGroup(narrow, groupCol, qs, numPartitions, rule)
  }

  /** The at-scale distributed-selection path (see class doc §1-3). */
  private def selectByGroup(narrow: DataFrame, groupCol: String,
      qs: Seq[(String, Double)], numPartitions: Int,
      rule: RankRule): DataFrame = {
    val spark = narrow.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    // ONE physical lineage for both jobs below: the counts job
    // materializes scan + range exchange + per-partition sort; the pick
    // job reuses the registered map outputs (scan and shuffle map stages
    // SKIP) and re-runs only the targeted reduce partitions.
    val sortedRdd = narrow
      .repartitionByRange(parts, col("_g"), col("_v"))
      .sortWithinPartitions(col("_g"), col("_v"))
      .rdd
    // (pid, group) -> row count; partitions hold contiguous (g, v)
    // ranges so each pair appears once per partition it spans. Returned
    // as the job RESULT (not an accumulator), so task retries cannot
    // double-count.
    val counts: Array[(Int, String, Long)] = sortedRdd
      .mapPartitionsWithIndex { (pid, it) =>
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach { r =>
          val g = r.getString(0)
          m.update(g, m.getOrElse(g, 0L) + 1L)
        }
        m.iterator.map { case (g, c) => (pid, g, c) }
      }.collect()
    val targets = rankTargets(groupSpans(counts), qs, rule.rank)
    val picked: Array[(String, String, Double)] =
      if (targets.isEmpty) Array.empty
      else spark.sparkContext.runJob(
        sortedRdd,
        (ctx: org.apache.spark.TaskContext, it: Iterator[Row]) => {
          val want = targets(ctx.partitionId())
          val local = scala.collection.mutable.HashMap.empty[String, Long]
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(String, String, Double)]
          var remaining = want.size
          while (remaining > 0 && it.hasNext) {
            val r = it.next()
            val g = r.getString(0)
            val idx = local.getOrElse(g, 0L) + 1L
            local.update(g, idx)
            want.foreach { case (wg, name, lr) =>
              if (wg == g && lr == idx) {
                out += ((g, name, r.getDouble(1))); remaining -= 1
              }
            }
          }
          out.toArray
        },
        targets.keys.toSeq.sorted).flatten
    toLocalResult(spark, picked, groupCol, qs.map(_._1))
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
    * Same selection shape as [[exactByGroup]]'s at-scale path (shared
    * shuffle lineage, no cache): range partition the narrow (group,
    * value, weight) projection, per-span WEIGHT sums prefix-summed on
    * the driver (planning metadata), one targeted job over only the
    * partitions containing a target, accumulating local weight until the
    * rank is crossed. Ties in value are safe under any row order — every
    * row of a tied run carries the same value, so the crossing row's
    * value is deterministic. Weights must be positive integers
    * (fail-fast on ≤ 0 / null). */
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
    val sortedRdd = narrow
      .repartitionByRange(parts, col("_g"), col("_v"))
      .sortWithinPartitions(col("_g"), col("_v"))
      .rdd
    val counts: Array[(Int, String, Long)] = sortedRdd
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
    val targets = rankTargets(groupSpans(counts), qs,
      (q, w) => math.floor(q * (w - 1)).toLong + 1)
    val picked: Array[(String, String, Double)] =
      if (targets.isEmpty) Array.empty
      else spark.sparkContext.runJob(
        sortedRdd,
        (ctx: org.apache.spark.TaskContext, it: Iterator[Row]) => {
          val want = targets(ctx.partitionId())
          val localW = scala.collection.mutable.HashMap.empty[String, Long]
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(String, String, Double)]
          val pending = scala.collection.mutable.ArrayBuffer(want: _*)
          while (pending.nonEmpty && it.hasNext) {
            val r = it.next()
            val g = r.getString(0)
            val before = localW.getOrElse(g, 0L)
            val after = before + r.getLong(2)
            localW.update(g, after)
            var j = 0
            while (j < pending.size) {
              val (wg, name, lr) = pending(j)
              if (wg == g && before < lr && lr <= after) {
                out += ((g, name, r.getDouble(1)))
                pending.remove(j)
              } else j += 1
            }
          }
          out.toArray
        },
        targets.keys.toSeq.sorted).flatten
    toLocalResult(spark, picked, groupCol, qs.map(_._1))
  }

  // ------------------------------------------------------- shared pieces

  /** Contiguous spans of each group across partitions in pid order:
    * group -> (pid, rows-or-weight before this span, span total). */
  private def groupSpans(counts: Array[(Int, String, Long)])
      : Map[String, Array[(Int, Long, Long)]] =
    counts.groupBy(_._2).map { case (g, cs) =>
      val sorted = cs.sortBy(_._1)
      g -> sorted.zip(sorted.scanLeft(0L)(_ + _._3))
        .map { case ((pid, _, c), before) => (pid, before, c) }
        .toArray
    }

  /** pid -> (group, quantile name, 1-based LOCAL rank) for every
    * requested statistic, via binary search over the group's spans. */
  private def rankTargets(spans: Map[String, Array[(Int, Long, Long)]],
      qs: Seq[(String, Double)], rankOf: (Double, Long) => Long)
      : Map[Int, Seq[(String, String, Long)]] = (for {
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

  /** (group, stat name, value) triples -> one LOCAL row per group — a
    * LocalRelation result plans no extra job downstream (the groups ×
    * quantiles output is inherently tiny). */
  private def toLocalResult(spark: SparkSession,
      picked: Array[(String, String, Double)], groupCol: String,
      names: Seq[String]): DataFrame = {
    val rows = picked.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, vs) =>
      val byName = vs.map(v => v._2 -> v._3).toMap
      Row.fromSeq(g +: names.map(byName))
    }
    val schema = StructType(StructField(groupCol, StringType) +:
      names.map(n => StructField(n, DoubleType)))
    val list = new java.util.ArrayList[Row](rows.size)
    rows.foreach(list.add)
    spark.createDataFrame(list, schema)
  }
}
