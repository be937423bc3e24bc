package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exponential moving average over per-group ordered series — the
  * reference smooths operational metrics this way (query latency per
  * worker for load-aware routing; reference
  * core/src/main/scala/com/cardinal/datastructures/EMA.scala:20-40:
  * `ema += alpha * (sample - ema)`, seeded with the first sample).
  *
  * The sequential recurrence has a closed form over a finite series
  * x_1..x_n:  EMA_n = (1-α)^(n-1)·x_1 + α·Σ_{k=2..n} (1-α)^(n-k)·x_k —
  * a per-group WEIGHTED SUM, which is what makes it Spark-expressible
  * without any sequential state: rank rows within the group, weight each
  * by its distance from the end, aggregate. One window pass over
  * already-aggregated series rows (not raw events) plus one partial/final
  * aggregation; the group count stays tiny relative to the corpus, so
  * the window sort touches series points, never raw data.
  *
  * For an unbounded stream the same recurrence rides
  * [[graft.streaming.StreamingEngine]]-style keyed state (one double per
  * key); this is the batch/backfill form.
  */
object Ema {

  /** Final EMA per group of `valueCol` ordered by `orderCol`.
    * Output: group columns + `n_points` + `ema`.
    *
    * `orderCol` should be unique within a group (it is a time series
    * axis); ties are broken deterministically by value so repeated runs
    * agree, but the tie ORDER is this function's convention, not the
    * sequential recurrence's (which has no tie concept). Each weighted
    * term is rounded to 9 places and accumulated in DECIMAL, so the sum
    * is independent of row order and partitioning — replayable exactly
    * by an external engine. */
  /** `outScale >= 0` rounds the exact DECIMAL accumulator to that many
    * places BEFORE the double cast — rounding after the conversion is
    * engine-dependent when the exact sum ends in 5 one place past the
    * target (the t14 tie case); callers that hash-compare against
    * another engine should round here, not on the returned double. */
  def finalEma(df: DataFrame, groupCols: Seq[String], orderCol: Column,
      valueCol: Column, alpha: Double, outScale: Int = -1): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    // internal working columns; a group column with one of these names
    // would make the window/agg expressions ambiguous or silently wrong
    val reserved = Set("_ord", "_x", "_k", "_n")
    val clash = groupCols.filter(reserved)
    require(clash.isEmpty,
      s"finalEma group columns ${clash.mkString(", ")} collide with " +
        s"internal working columns ${reserved.mkString("/")}; rename them")
    val grp = groupCols.map(col)
    val w = Window.partitionBy(grp: _*).orderBy(col("_ord"), col("_x"))
    val wAll = Window.partitionBy(grp: _*)
    val decay = lit(1.0 - alpha)
    df.select(grp :+ orderCol.as("_ord") :+ valueCol.as("_x"): _*)
      .withColumn("_k", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(wAll))
      .groupBy(grp: _*)
      .agg(
        max(col("_n")).as("n_points"), {
          val acc = sum(round(
              when(col("_k") === 1, pow(decay, col("_n") - 1))
                .otherwise(lit(alpha) * pow(decay, col("_n") - col("_k")))
                * col("_x"), 9)
            .cast(org.apache.spark.sql.types.DecimalType(27, 9)))
          (if (outScale >= 0) round(acc, outScale) else acc)
            .cast("double").as("ema")
        })
  }
}
