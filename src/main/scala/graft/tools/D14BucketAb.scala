package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: same-session A/B of d14's length-bucket blocking key
  * (VERDICT r16 work). Runs the FULL d14 entry shape (verify + dedup +
  * sort) with and without the bucket composed into the key,
  * interleaved, so shared-box drift hits both sides equally.
  * Usage: runMain graft.tools.D14BucketAb <dir> [iters]
  */
object D14BucketAb {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val iters = if (args.length > 1) args(1).toInt else 3
    val spark = graft.LocalTuning(SparkSession.builder())
      .appName("graft-d14bucketab")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "24g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def entry(lenBucketKey: Boolean) = {
      graft.queries.PipelineQueries
        .d14Pairs(spark, dir, lenBucketKey = lenBucketKey)
        .withColumn("dist",
          levenshtein(col("pfx_a"), col("pfx_b"), 10).cast("long"))
        .where(col("dist") >= 0 && col("dist") <= 10)
        .groupBy(col("id_a"), col("id_b"))
        .agg(min(col("dist")).as("dist"))
        .orderBy("id_a", "id_b")
    }
    def once(b: Boolean): Double = {
      val t0 = System.nanoTime()
      entry(b).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both
    once(true); once(false)
    val withB = scala.collection.mutable.ArrayBuffer[Double]()
    val without = scala.collection.mutable.ArrayBuffer[Double]()
    (1 to iters).foreach { _ =>
      withB += once(true)
      without += once(false)
    }
    def fmt(xs: Seq[Double]) = {
      val s = xs.sorted
      f"median=${s(s.size / 2)}%.2f all=" + xs.map(x => f"$x%.2f").mkString(",")
    }
    println(s"[d14ab] $dir bucket_key    ${fmt(withB.toSeq)}")
    println(s"[d14ab] $dir flat_key      ${fmt(without.toSeq)}")
    spark.stop()
  }
}
