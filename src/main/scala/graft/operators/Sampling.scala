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
    * (pure integer arithmetic, no hash library). */
  def mix32(key: Column): Column =
    pmod(key * lit(2654435761L), lit(4294967296L))

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
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(priority: _*)
    df.withColumn("_rank", row_number().over(w))
      .where(col("_rank") <= n)
      .drop("_rank")
  }

  /** Select rows in priority order until a running budget (e.g. token
    * count) is exhausted: the "fill a 10B-token training mix from the
    * best documents" step. Keeps every row whose inclusive running sum
    * is within the budget. Weights must be non-negative.
    *
    * Scale shape: a naive `Window.orderBy(...)` with no partition key
    * plans a SINGLE-partition global sort — a non-starter at corpus
    * scale. This is the textbook two-phase distributed prefix sum
    * instead: range-partition by the priority keys (so partition i holds
    * globally-contiguous ranks), take per-partition weight sums (tiny:
    * one row per partition), prefix them on the driver, and stream each
    * partition once adding its offset. The only driver-side data is one
    * long per partition; the `mapPartitions` is justified — a global
    * prefix sum is not expressible as a hash aggregation. */
  def takeUntilBudget(df: DataFrame, weightCol: String, budget: Long,
      priority: Seq[Column], numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(parts, priority: _*)
      .sortWithinPartitions(priority: _*)
      .persist()
    try {
      val perPartition = ranged
        .select(col(weightCol).cast("long"))
        .rdd.mapPartitionsWithIndex { (pid, it) =>
          Iterator.single(pid -> it.map(_.getLong(0)).sum)
        }.collect().sortBy(_._1).map(_._2)
      val offsets = perPartition.scanLeft(0L)(_ + _) // offsets(i) = sum before partition i
      val bOffsets = spark.sparkContext.broadcast(offsets)
      val schema = ranged.schema
      val weightIdx = schema.fieldIndex(weightCol)
      val out = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
        var cum = bOffsets.value(pid)
        it.flatMap { row =>
          cum += row.getAs[Number](weightIdx).longValue()
          if (cum <= budget) Some(row) else None
        }
      }
      // partitions are range-ordered, so this preserves global order
      spark.createDataFrame(out, schema)
    } finally ranged.unpersist(blocking = false)
  }
}
