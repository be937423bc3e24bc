package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: t4's recompute-twice vs persist-narrow A/B at arbitrary
  * scale. The design decision (recompute the pruned-column DAG for each
  * of the two `exact` consumers instead of persisting) was measured at
  * sf0.1 where the profile pass costs ~0.3 s per branch; at sf10 it is
  * ~13 s per branch and t4 is the #2 soak entry, so the tradeoff needs
  * a number at that scale too (VERDICT r14 #5).
  *
  * Usage: runMain graft.tools.T4Ab <dir> [dir...]
  */
object T4Ab {
  import graft.operators.{Dedup, TextAnalysis}

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.Tables.load(s, dir, "documents")

  /** The entry's shape: recompute `exact`'s DAG per consumer. */
  private def recomputeTwice(s: SparkSession, dir: String): DataFrame = {
    val profiled = TextAnalysis.profile(
        Dedup.spreadBarrier(docs(s, dir), "t4ab_a"), "doc_id", "text")
      .join(docs(s, dir).select(col("doc_id"), col("text"),
        col("source")), "doc_id")
    val kept = profiled
      .where(col("lang_pred") =!= "unknown" && col("quality") >= 0.5)
    val exact = Dedup.exact(kept, "doc_id", Seq("text"))
    val nearDupIds = Dedup.minhashNearDuplicates(exact, "doc_id", "text",
        shingleWidth = 3, numHashes = 128, bands = 16, threshold = 0.8)
      .select(col("id_b").as("doc_id")).distinct()
    val surviving = exact.join(nearDupIds, Seq("doc_id"), "left_anti")
    surviving.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("n_tokens"))
      .orderBy("source")
  }

  /** Persist the narrow post-filter frame (incl. text) once; both
    * consumers read the cache. */
  private def persistNarrow(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val profiled = TextAnalysis.profile(
        Dedup.spreadBarrier(docs(s, dir), "t4ab_b"), "doc_id", "text")
      .join(docs(s, dir).select(col("doc_id"), col("text"),
        col("source")), "doc_id")
    val kept = profiled
      .where(col("lang_pred") =!= "unknown" && col("quality") >= 0.5)
      .select(col("doc_id"), col("text"), col("source"), col("n_tokens"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exact = Dedup.exact(kept, "doc_id", Seq("text"))
    val nearDupIds = Dedup.minhashNearDuplicates(exact, "doc_id", "text",
        shingleWidth = 3, numHashes = 128, bands = 16, threshold = 0.8)
      .select(col("id_b").as("doc_id")).distinct()
    val surviving = exact.join(nearDupIds, Seq("doc_id"), "left_anti")
    val out = surviving.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("n_tokens"))
      .orderBy("source")
    (out, kept)
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.LocalTuning(SparkSession.builder()).appName("graft-t4ab")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "24g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val iters = sys.env.getOrElse("SPARK_GRAFT_TIMEQ_ITERS", "2").toInt
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
      val tA = med(() => recomputeTwice(spark, dir)
        .write.format("noop").mode("overwrite").save())
      println(f"[t4ab] $dir recompute_twice median=$tA%.2f")
      val tB = med { () =>
        val (out, kept) = persistNarrow(spark, dir)
        try out.write.format("noop").mode("overwrite").save()
        finally kept.unpersist(blocking = true)
      }
      println(f"[t4ab] $dir persist_narrow  median=$tB%.2f")
    }
    spark.stop()
  }
}
