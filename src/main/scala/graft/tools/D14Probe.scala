package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for d14_fuzzy_join's funnel: how many candidate pair
  * EVALUATIONS the PassJoin blocking emits (duplicates included — the
  * entry dedups after verify), how many would survive the q-gram count
  * prefilter, and how many the banded levenshtein verifies — the
  * numbers that decide whether a prefilter between blocking and verify
  * can pay for itself. Measured r13 at sf10: 66.6M evaluations,
  * 26.6M gram-pass, 174k verified (7.9k distinct pairs) — candidate
  * generation/movement dominates, verify does not, so the prefilter
  * was rejected (it measured 146 → 228 s when attached via joins).
  * Usage: runMain graft.tools.D14Probe <sfDir>
  */
object D14Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.LocalTuning(SparkSession.builder())
      .appName("graft-d14probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "24g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pairs = graft.queries.PipelineQueries.d14Pairs(spark, sfDir)
      .cache()
    val gramOk = graft.functions.SketchExpressions
      .intersectCountSorted(col("g_a"), col("g_b")) >=
      greatest(size(col("g_a")), size(col("g_b"))) - lit(30)
    val agg = pairs.agg(
      count(lit(1)).as("cands"),
      sum(when(gramOk, 1L).otherwise(0L)).as("gram_pass"),
      sum(when(levenshtein(col("pfx_a"), col("pfx_b"), 10) >= 0, 1L)
        .otherwise(0L)).as("verified")).collect()(0)
    println(s"[d14probe] $sfDir cands=${agg.getLong(0)} " +
      s"gram_pass=${agg.getLong(1)} verified=${agg.getLong(2)}")
    pairs.unpersist()
    spark.stop()
  }
}
