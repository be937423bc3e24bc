package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / selection for training-data pipelines.
  *
  * Everything here is reproducible by construction: membership depends
  * only on row keys (never on partitioning, task retries, or row order),
  * so a re-run — or an incremental run over late-arriving shards —
  * selects the same rows. `df.sample()` can't promise that; hash-gating
  * can.
  */
object Sampling {

  /** 32-bit multiplicative (Knuth) mix of a long key — good enough to
    * decorrelate sequential ids, and cheap to replicate in any engine
    * (pure integer arithmetic, no hash library).
    *
    * The key is masked to 31 bits BEFORE multiplying so the product
    * (≤ 2^31 · 2654435761 ≈ 5.7e18) stays inside signed-64-bit range:
    * engines that promote to wider integers (DuckDB HUGEINT) and engines
    * that wrap at 64 bits (Java/Spark) then compute identical results.
    * Unmasked, keys above ~3.46e9 would silently diverge across engines. */
  def mix32(key: Column): Column =
    pmod(pmod(key, lit(2147483648L)) * lit(2654435761L), lit(4294967296L))

  /** Deterministic Bernoulli sample: keep a row iff the mix of its key
    * falls under `rate`. xxhash64 mixes arbitrary/multi-column keys;
    * `mix32` covers plain integer ids when cross-engine replication
    * matters. No shuffle — a pure filter, pushes down to the scan. */
  def hashSample(df: DataFrame, rate: Double, keys: Column*): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate $rate outside [0,1]")
    df.where(pmod(xxhash64(keys: _*), lit(1000000L)) < (rate * 1000000L).toLong)
  }

  /** Same gate with a caller-supplied deterministic score in [0, modulus)
    * — use with [[mix32]] for an oracle-replicable sample. */
  def gateSample(df: DataFrame, score: Column, modulus: Long,
      rate: Double): DataFrame =
    df.where(score < (rate * modulus).toLong)

  /** Per-stratum top-N by a deterministic priority — the "cap every
    * source/language at N docs" quota step. One shuffle on the stratum
    * key; Spark 4 plans the rank filter as WindowGroupLimit, so the cap
    * applies map-side too (a dominant stratum never floods one reducer).
    */
  def stratifiedTopN(df: DataFrame, strataCol: String, n: Int,
      priority: Seq[Column]): DataFrame = {
    require(!df.columns.contains("_rank"),
      "input already has a _rank column") // same guard as globalShuffle
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(priority: _*)
    df.withColumn("_rank", row_number().over(w))
      .where(col("_rank") <= n)
      .drop("_rank")
  }

  /** Select rows in priority order until a running budget (e.g. token
    * count) is exhausted: the "fill a 10B-token training mix from the
    * best documents" step. Keeps every row whose inclusive running sum
    * is within the budget. Weights must be non-negative and `priority`
    * must be a TOTAL order (add a unique id as the last key). Null
    * priority values are handled with the sort's own NULLS FIRST
    * ascending semantics, so a nullable score column cannot silently
    * drop within-budget rows.
    *
    * Scale shape: a naive `Window.orderBy(...)` with no partition key
    * plans a SINGLE-partition global sort — a non-starter at corpus
    * scale. And shuffling the full-width corpus just to find a prefix is
    * wasteful too: only the (priority, weight) projection is ever
    * shuffled here. Phase 1 range-partitions that narrow projection,
    * sums weights per partition (one long each, prefixed on the driver),
    * and scans the single crossing partition for the first row whose
    * running sum exceeds the budget — the cutoff key. Phase 2 is a pure
    * lexicographic filter `priority < cutoff` on the ORIGINAL DataFrame:
    * no wide shuffle, no wide persist, and when the priority keys are
    * stored columns the filter pushes down to the scan. */
  def takeUntilBudget(df: DataFrame, weightCol: String, budget: Long,
      priority: Seq[Column], numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val pNames = priority.indices.map(i => s"_p$i")
    val pCols = pNames.map(col)
    val narrow = df
      .select(priority.zip(pNames).map { case (c, n) => c.as(n) } :+
        col(weightCol).cast("long").as("_w"): _*)
      .repartitionByRange(parts, pCols: _*)
      .sortWithinPartitions(pCols: _*)
      .persist()
    try {
      val offsets = weightOffsets(narrow.rdd) // offsets(i) = sum before partition i
      // first partition whose cumulative end exceeds the budget
      val crossing = (0 until offsets.length - 1)
        .find(i => offsets(i + 1) > budget)
      crossing match {
        case None => df // total weight fits the budget: keep everything
        case Some(pid) =>
          val startOffset = offsets(pid)
          val nP = priority.size
          // single-partition job: first row in the crossing partition whose
          // inclusive running sum exceeds the budget = first EXCLUDED row
          val firstExcluded = spark.sparkContext.runJob(
            narrow.rdd,
            (it: Iterator[org.apache.spark.sql.Row]) => {
              var cum = startOffset
              var found: Option[Seq[Any]] = None
              while (found.isEmpty && it.hasNext) {
                val r = it.next()
                cum += r.getAs[Long]("_w")
                if (cum > budget) found = Some((0 until nP).map(r.get))
              }
              found.get // exists: offsets(pid+1) > budget
            },
            Seq(pid)).head
          // keep the strict lexicographic prefix before the excluded
          // row, under the SAME null ordering the range partition used
          // (ascending, nulls first): null < v for non-null v, nothing
          // is < null, and equality is null-safe — a plain `c < lit(v)`
          // returns NULL for null inputs and where() would silently
          // drop the best-priority rows
          def ltNullsFirst(c: Column, v: Any): Column =
            if (v == null) lit(false) else c.isNull || (c < lit(v))
          def eqNullSafe(c: Column, v: Any): Column =
            if (v == null) c.isNull else c <=> lit(v)
          val keep = priority.zip(firstExcluded).foldRight(lit(false)) {
            case ((c, v), rest) => ltNullsFirst(c, v) || (eqNullSafe(c, v) && rest)
          }
          df.where(keep)
      }
    } finally narrow.unpersist(blocking = false)
  }

  /** Deterministic global shuffle for training-data ordering: assign
    * every row a (shard, pos) coordinate that is a pure function of its
    * key — shard = mix(key) mod numShards, pos = dense rank of
    * (mix(key), key) within the shard. Reading shards in any fixed
    * discipline (concatenated, or round-robin by pos) replays the same
    * pseudorandom permutation on every run, over any partitioning, and
    * after appending late shards — which `df.orderBy(rand())` cannot
    * promise.
    *
    * Scale shape: one shuffle on the shard key, then a per-shard sort.
    * With numShards ≫ cores (training runs shard into thousands of
    * files) every shard sorts in parallel and no single-partition global
    * sort appears anywhere — the window's partitionBy is the shard key,
    * never empty. Use `score` = [[mix32]] on an integer id when the
    * permutation must replay in other engines. */
  def globalShuffle(df: DataFrame, keyCol: String, numShards: Int,
      score: Column): DataFrame = {
    require(numShards > 0, s"numShards $numShards must be positive")
    require(!df.columns.exists(c => c == "shard" || c == "pos" || c == "_h"),
      "globalShuffle adds shard/pos columns (and a _h scratch column); " +
      "rename the existing ones first")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("_h"), col(keyCol))
    df.withColumn("_h", score)
      .withColumn("shard", pmod(col("_h"), lit(numShards.toLong)))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("_h")
  }

  /** Greedy contiguous packing of the priority-ordered corpus into
    * fixed-budget bins — the "shard a 10B-token mix into ~2B-token
    * training files" step. A row's bin is `pre_cum / binSize` where
    * pre_cum is its EXCLUSIVE running weight sum in priority order, so
    * bins are contiguous spans of the ordered corpus and every bin
    * except possibly the last holds ≥ binSize weight once its boundary
    * row lands (a row straddling a boundary belongs to the bin where it
    * starts). Deterministic for a total-order `priority` (append a
    * unique id as the last key).
    *
    * Scale shape: same two-phase distributed prefix sum as
    * [[takeUntilBudget]] — only (id, weight, priority) is ever
    * shuffled; per-partition sums are prefix-summed on the driver (one
    * long per partition) and each partition assigns its rows' bins in
    * one local pass. Output: (idCol, weight, bin, tok_offset) where
    * tok_offset is the row's starting weight offset WITHIN its bin
    * (pre_cum mod binSize) — the per-sequence start position a training
    * loader needs to place documents inside a packed context window. */
  def packByBudget(df: DataFrame, idCol: String, weightCol: String,
      binSize: Long, priority: Seq[Column],
      numPartitions: Int = 0): DataFrame = {
    require(binSize > 0, s"binSize $binSize must be positive")
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val pNames = priority.indices.map(i => s"_p$i")
    // not persisted: both passes hang off the SAME shuffle dependency, so
    // the range-exchange map outputs are written once and re-read (not
    // recomputed) by the second pass; a partition's sorted order is
    // deterministic for a total-order priority, so offsets stay valid
    val narrow = df
      .select(col(idCol).cast("long").as("_id") +:
        col(weightCol).cast("long").as("_w") +:
        priority.zip(pNames).map { case (c, n) => c.as(n) }: _*)
      .repartitionByRange(parts, pNames.map(col): _*)
      .sortWithinPartitions(pNames.map(col): _*)
    val narrowRdd = narrow.rdd
    val offsets = weightOffsets(narrowRdd)
    val out = narrowRdd.mapPartitionsWithIndex { (pid, it) =>
      var cum = offsets(pid)
      it.map { r =>
        // a non-numeric id/weight casts to null, and getAs[Long] would
        // silently unbox that to 0 — corrupt coordinates, no error
        if (r.isNullAt(r.fieldIndex("_id")) || r.isNullAt(r.fieldIndex("_w")))
          throw new IllegalArgumentException(
            "packByBudget: idCol/weightCol must be numeric and non-null")
        val w = r.getAs[Long]("_w")
        val bin = cum / binSize
        val off = cum - bin * binSize
        cum += w
        org.apache.spark.sql.Row(r.getAs[Long]("_id"), w, bin, off)
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(idCol,
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField(weightCol,
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bin",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("tok_offset",
        org.apache.spark.sql.types.LongType)))
    spark.createDataFrame(out, schema)
  }

  /** Systematic (fixed-interval) weighted sampling: lay ticks at every
    * `step` weight units along the corpus ordered by `priority`, and
    * select each row whose weight interval (cum, cum + w] contains a
    * tick. Inclusion probability is proportional to weight — the classic
    * probability-proportional-to-size systematic design — with a
    * deterministic permutation (make `priority` a hash of the id) in
    * place of the textbook's random start, so re-runs and other engines
    * replay the same selection. Rows heavier than `step` are selected
    * exactly once (no with-replacement multiplicity). Zero-weight rows
    * are never selected.
    *
    * Scale shape: inherits [[packByBudget]]'s two-pass prefix sum over a
    * narrow (id, weight, priority) projection — range-partitioned, both
    * passes off one shuffle dependency, no global sort, no driver-side
    * row data (one long per partition). The selection itself is a
    * map-side filter on the packed coordinates. */
  def systematicSample(df: DataFrame, idCol: String, weightCol: String,
      step: Long, priority: Seq[Column],
      numPartitions: Int = 0): DataFrame = {
    require(step > 0, s"step $step must be positive")
    packByBudget(df, idCol, weightCol, binSize = step, priority,
        numPartitions)
      .where(col("tok_offset") + col(weightCol) >= step)
      .select(col(idCol), col(weightCol))
  }

  /** Temperature-flattened stratum mixing at T = 2: keep the largest
    * subcorpus whose stratum proportions follow sqrt(n_s) renormalized —
    * the multilingual-rebalancing rule (p_s ∝ n_s^(1/T), XLM-R style)
    * that upweights tail strata without letting the head dominate. The
    * smallest stratum is kept whole; every stratum s keeps rate
    * min_t(sqrt(n_t)) / sqrt(n_s), derived IN-PLAN from the stratum
    * counts (tiny aggregate, broadcast back), membership by the
    * deterministic hash gate — no shuffle of the corpus itself.
    *
    * T = 2 specifically because IEEE-754 sqrt is correctly rounded in
    * every engine, so the float rates — and therefore the exact row set —
    * replay bit-for-bit cross-engine; a general pow(n, 1/T) carries no
    * such guarantee. */
  def temperatureMixT2(df: DataFrame, strataCol: String, score: Column,
      modulus: Long = 4294967296L): DataFrame = {
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).cast("double").as("_n"))
    val minS = counts.agg(min(sqrt(col("_n"))).as("_ms"))
    val rates = counts.crossJoin(broadcast(minS))
      .select(col(strataCol),
        floor(col("_ms") / sqrt(col("_n")) * lit(modulus.toDouble))
          .as("_cut"))
    df.join(broadcast(rates), strataCol)
      .where(score < col("_cut"))
      .drop("_cut")
  }

  /** Deterministic corpus mixing to target stratum weights — the "40%
    * web, 30% books, …" data-mixture step. Given target proportions
    * `weights` (relative; strata absent from the map are dropped), keeps
    * the LARGEST subcorpus achieving them exactly: the feasible total is
    * T = min over strata of n_s / w_s, each stratum's keep rate is
    * w_s · T / n_s, and membership is the [[gateSample]] hash gate —
    * reproducible across runs, partitionings, and engines.
    *
    * Scale shape: stratum counts + rates are computed IN-PLAN (a tiny
    * aggregate broadcast back), so the result composes lazily like any
    * DataFrame; the corpus itself only ever flows through one map-side
    * filter — no shuffle, no action at build time. All rate arithmetic
    * is float64 with a fixed evaluation order ((w·T)/n, floor to the
    * gate threshold), so any engine replays the exact row set. */
  def mixToWeights(df: DataFrame, strataCol: String,
      weights: Map[String, Double], score: Column,
      modulus: Long = 4294967296L): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    val spark = df.sparkSession
    val wDf = spark.createDataFrame(
      weights.toSeq.sortBy(_._1)).toDF(strataCol, "_w")
    // LEFT join from the weights: a weighted stratum with no corpus rows
    // gets _n = 0, making T = min(n/w) = 0 and the result EMPTY — the
    // honest answer (no non-empty subcorpus can achieve a share of a
    // stratum that has no rows), rather than silently renormalizing to
    // the strata that happen to exist
    val counts = wDf.join(
        broadcast(df.groupBy(col(strataCol))
          .agg(count(lit(1)).cast("double").as("_c"))),
        Seq(strataCol), "left")
      .select(col(strataCol), col("_w"),
        coalesce(col("_c"), lit(0.0)).as("_n"))
    val tCap = counts.agg(min(col("_n") / col("_w")).as("_t"))
    val rates = counts.crossJoin(broadcast(tCap))
      .select(col(strataCol),
        floor(when(col("_n") === 0.0, lit(0.0)) // empty stratum (T = 0)
          .otherwise(least(lit(1.0), col("_w") * col("_t") / col("_n"))) *
          lit(modulus.toDouble)).as("_cut"))
    df.join(broadcast(rates), strataCol)
      .where(score < col("_cut"))
      .drop("_cut")
  }

  /** Deterministic upsampling to target stratum proportions, preserving
    * the corpus size in expectation — the "repeat the high-quality
    * source for multiple epochs" step of a training mix. Each stratum's
    * rate is r_s = (w_s / Σw) · N / n_s, which (unlike [[mixToWeights]])
    * may EXCEED 1: a row is emitted ⌊r⌋ times plus once more iff its
    * hash score falls under the fractional remainder, with a `copy`
    * index (1-based) distinguishing the repeats downstream (e.g. for
    * shuffling copies into different shards via [[globalShuffle]] on
    * (key, copy)).
    *
    * Scale shape: identical to [[mixToWeights]] — rates derive from a
    * tiny in-plan aggregate that broadcasts back; the corpus flows
    * through one broadcast join + a Generate (explode) whose fan-out is
    * the copy count. No shuffle, fixed float64 evaluation order, so any
    * engine replays the same multiset. For bit-exact cross-engine replay
    * prefer weights whose sum is exact in float64 (e.g. dyadic
    * fractions): Σw is accumulated in map iteration order here and in
    * declaration order in a SQL mirror. */
  def upsampleToWeights(df: DataFrame, strataCol: String,
      weights: Map[String, Double], score: Column,
      modulus: Long = 4294967296L, maxRate: Double = 1000.0): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      "weights must be positive")
    require(!df.columns.contains("copy"),
      "upsampleToWeights adds a copy column; rename the existing one first")
    val spark = df.sparkSession
    val wSum = weights.values.sum
    val wDf = spark.createDataFrame(
      weights.toSeq.sortBy(_._1)).toDF(strataCol, "_w")
    // Joined from the OBSERVED-strata side with an in-plan assert: a
    // stratum present in the corpus but absent from the weights map
    // would otherwise be silently dropped by the final inner join —
    // contradicting the "preserves corpus size in expectation" contract.
    // An upsampler must be told about every stratum it sees.
    val observed = df.groupBy(col(strataCol))
      .agg(count(lit(1)).cast("double").as("_c"))
    val counts = observed
      .join(broadcast(wDf), Seq(strataCol), "left")
      .withColumn("_cov", assert_true(col("_w").isNotNull,
        concat(lit("upsampleToWeights: stratum '"), col(strataCol),
          lit("' has no weight — cover every observed stratum"))))
      .where(col("_cov").isNull) // assert_true yields null; keeps the check live
      .select(col(strataCol), col("_w"), col("_c").as("_n"))
    // converse coverage: a WEIGHTED stratum absent from the corpus would
    // silently shrink the output below N (its weight inflates wSum while
    // _tot only counts observed rows). Zero rows when coverage holds;
    // any survivor trips the runtime assert (the condition references a
    // column, so constant folding cannot evaluate it at plan time).
    // the assert must reference the OBSERVED side (_c0): a left-only
    // condition would let Catalyst push the project below the join and
    // evaluate the assert on every weight row before filtering
    val absentCheck = broadcast(wDf)
      .join(observed.select(col(strataCol), col("_c").as("_c0")),
        Seq(strataCol), "left")
      .where(col("_c0").isNull)
      .select(col(strataCol), col("_w"),
        assert_true(col("_c0").isNotNull,
          concat(lit("upsampleToWeights: weighted stratum '"),
            col(strataCol), lit("' is absent from the corpus")))
          .cast("double").as("_n"))
    val countsAll = counts.unionByName(absentCheck)
    val total = countsAll.agg(sum(col("_n")).as("_tot"))
    // rate cap folded into the plan (the RangeJoin fan-out pattern): a
    // tiny stratum under a big weight means one row explodes r× on one
    // task — fail the job loudly instead of silently flooding it
    val rateExpr = col("_w") / lit(wSum) * col("_tot") / col("_n")
    val rates = countsAll.crossJoin(broadcast(total))
      .where(col("_n") > 0.0) // an empty stratum cannot be upsampled
      .withColumn("_chk", assert_true(rateExpr <= lit(maxRate),
        lit(s"upsample rate exceeds maxRate=$maxRate for a stratum — " +
          "raise maxRate only if the explode fan-out is intended")))
      .where(col("_chk").isNull) // assert_true returns null; keeps the check live
      .select(col(strataCol),
        floor(col("_w") / lit(wSum) * col("_tot") / col("_n")).as("_base"),
        floor((col("_w") / lit(wSum) * col("_tot") / col("_n") -
          floor(col("_w") / lit(wSum) * col("_tot") / col("_n"))) *
          lit(modulus.toDouble)).as("_fcut"))
    val copies = (col("_base") +
      when(score < col("_fcut"), 1L).otherwise(0L)).cast("long")
    df.join(broadcast(rates), strataCol)
      .withColumn("copy", explode(
        when(copies >= 1L, sequence(lit(1L), copies))
          .otherwise(array().cast("array<long>"))))
      .drop("_base", "_fcut")
  }

  /** Exclusive per-partition prefix offsets of the "_w" column of a
    * partition-ordered narrow frame: offsets(i) = Σ weights before
    * partition i (one long per partition collected — the planning-
    * metadata footprint every two-phase prefix pass here shares). */
  private def weightOffsets(rdd: org.apache.spark.rdd.RDD[
      org.apache.spark.sql.Row]): Array[Long] =
    rdd.mapPartitionsWithIndex { (pid, it) =>
        Iterator.single(pid -> it.map(_.getAs[Long]("_w")).sum)
      }.collect().sortBy(_._1).map(_._2)
      .scanLeft(0L)(_ + _)
}
