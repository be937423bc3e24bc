package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: k4_countmin's tokenize-pass A/B at arbitrary scale
  * (VERDICT r15 #6 — "measure the cut, don't assume it"). The entry's
  * plan re-expands its shared subtrees per consumer: perSource (the
  * sketch aggregate) is consumed by est AND its own ALL-row merge,
  * exactSrc by the exact union's both branches, probes by two broadcast
  * consumers — 7 tokenize passes over the documents table in the r16
  * before-plan. Three variants:
  *
  *  - recompute (the entry's shape): 7 tokenize passes, zero
  *    materialization;
  *  - cut_toks: Lineage.cutShared of the per-OCCURRENCE token stream —
  *    corpus-token-scale executor memory (the variant
  *    OPTIMIZATION_r15.md predicted loses);
  *  - cut_small: cutShared of the three SMALL reused aggregates
  *    (perSource ≈ sources rows × 256 KB sketches, probes = 10 rows,
  *    exactSrc ≈ sources×10 rows) — 3 tokenize passes, three tiny
  *    checkpoint jobs.
  *
  * Usage: runMain graft.tools.K4Ab <dir> [dir...]
  */
object K4Ab {
  import graft.functions.{CmFunctions => CM}
  import graft.operators.{Lineage, TextAnalysis}

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.Tables.load(s, dir, "documents")

  private val width = 8192

  private def build(s: SparkSession, dir: String,
      cutToks: Boolean, cutSmall: Boolean): DataFrame = {
    val d = docs(s, dir)
    val toks0 = d.select(col("source"),
      explode(TextAnalysis.tokens(col("text"))).as("w"))
    val toks = if (cutToks) Lineage.cutShared(toks0) else toks0
    def small(df: DataFrame): DataFrame =
      if (cutSmall) Lineage.cutShared(df) else df
    val perSource = small(toks.groupBy(col("source"))
      .agg(CM.cmSketch(col("w"), depth = 4, width = width).as("sk"),
        count(lit(1)).as("n_tok")))
    val all = perSource
      .agg(CM.cmMerge(col("sk")).as("sk"), sum(col("n_tok")).as("n_tok"))
      .select(lit("ALL").as("source"), col("sk"), col("n_tok"))
    val probes = small(d
      .select(explode(array_distinct(
        TextAnalysis.tokens(col("text")))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .orderBy(desc("df"), col("token")).limit(10)
      .select(col("token")))
    val est = perSource.select(col("source"), col("sk"), col("n_tok"))
      .union(all)
      .crossJoin(broadcast(probes))
      .select(col("source"), col("token"), col("n_tok"),
        CM.cmEstimateOf(col("sk"), col("token")).as("est"))
    val exactSrc = small(toks
      .join(broadcast(probes), col("w") === col("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("n_occ")))
    val exact = exactSrc.union(
      exactSrc.groupBy(col("token")).agg(sum(col("n_occ")).as("n_occ"))
        .select(lit("ALL").as("source"), col("token"), col("n_occ")))
    est.join(exact, Seq("source", "token"), "left")
      .select(col("source"), col("token"),
        coalesce(col("n_occ"), lit(0L)).as("n_occurrences"),
        col("est"), col("n_tok"))
      .where(col("est") >= col("n_occurrences") &&
        col("est") - col("n_occurrences") <=
          ceil(col("n_tok") * (math.E / width)).cast("long"))
      .select(col("source"), col("token"), col("n_occurrences"))
      .orderBy("source", "token")
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.LocalTuning(SparkSession.builder()).appName("graft-k4ab")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "24g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val iters = sys.env.getOrElse("SPARK_GRAFT_TIMEQ_ITERS", "3").toInt
    def med(run: () => Unit): Double = {
      run() // warm
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(ts.size / 2)
    }
    args.foreach { dir =>
      Seq(("recompute", false, false), ("cut_toks", true, false),
          ("cut_small", false, true)).foreach { case (nm, ct, cs) =>
        val t = med(() => build(spark, dir, ct, cs)
          .write.format("noop").mode("overwrite").save())
        println(f"[k4ab] $dir $nm%-10s median=$t%.3f")
      }
    }
    spark.stop()
  }
}
