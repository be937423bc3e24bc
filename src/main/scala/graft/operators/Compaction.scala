package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Segment compaction EXECUTION — the rewrite half of the small-file
  * story (p17_compaction_plan is the planning half; the reference's
  * ingest lands one rollup segment per closed block per hour, and scan
  * efficiency at 100 TB needs them re-packed toward the parquet
  * row-group sweet spot — the st4 bench documents the cost: 719
  * KB-scale files whose footer opens dominate the read).
  *
  * Binning mirrors p17's rule exactly: files in stable (path-sorted)
  * order, each assigned the bin its cumulative START byte offset falls
  * in — greedy first-fit with exact integer arithmetic, planned from a
  * manifest-sized frame (one row per FILE; driver-side listing is the
  * same planning metadata the manifest build uses).
  *
  * The rewrite is one distributed pass: rows get their bin by a
  * broadcast join of `input_file_name()` against the plan,
  * `repartition(bin)` co-locates each bin on one task, and a
  * `partitionBy(bin)` write emits EXACTLY one file per bin (all rows of
  * a bin share a shuffle partition, so the writer opens one file per
  * bin dir). The shuffle carries each data row once — the unavoidable
  * cost of a rewrite — and never the driver.
  */
object Compaction {

  /** Outcome of one policy pass: the post-policy file list (compacted
    * outputs + untouched originals) and per-key actions for audit. */
  case class PolicyResult(files: Seq[String],
      compactedKeys: Seq[String], keptKeys: Seq[String])

  /** Manifest-driven compaction POLICY — the ingest-loop half of the
    * small-file story: the streaming collector lands one rollup segment
    * per closed block per partition dir (the reference's hourly object
    * layout, Commons.scala:160-177), and read latency decays as footer
    * opens accumulate. This pass walks the landed file list grouped by
    * `keyOf` (e.g. the date_int of the partition path) and rewrites ONLY
    * the keys holding more than `maxFilesPerKey` files, leaving sparse
    * keys untouched — compaction as threshold policy, not a bulk job.
    *
    * Deterministic: same file list + threshold + target → same actions,
    * same binning (compact() is deterministic per key). Idempotent at
    * the layout level: re-running over a compacted layout finds every
    * key at or under the threshold and rewrites nothing. */
  def applyPolicy(spark: SparkSession, files: Seq[String], outBase: String,
      maxFilesPerKey: Int, targetBytes: Long,
      keyOf: String => String): PolicyResult = {
    require(maxFilesPerKey >= 1, s"maxFilesPerKey $maxFilesPerKey")
    val byKey = files.groupBy(keyOf).toSeq.sortBy(_._1)
    val (dense, sparse) = byKey.partition(_._2.size > maxFilesPerKey)
    // Sanitizing can collapse distinct raw keys ('2024/01' and '2024_01'
    // both → '2024_01'), which would make the second compact() overwrite
    // the first key's output dir. Disambiguate colliding keys with a hash
    // of the RAW key so every dense key gets its own directory.
    val safeDir: Map[String, String] = {
      val base = dense.map { case (k, _) =>
        k -> k.replaceAll("[^A-Za-z0-9_=-]", "_")
      }
      val collided = base.groupBy(_._2).filter(_._2.size > 1)
        .values.flatten.map(_._1).toSet
      val out = base.map { case (k, s) =>
        if (collided(k))
          k -> f"$s-${scala.util.hashing.MurmurHash3.stringHash(k) & 0xffffffffL}%08x"
        else k -> s
      }.toMap
      require(out.values.toSeq.distinct.size == out.size,
        s"compaction key sanitization still collides: $out")
      out
    }
    val compacted = dense.flatMap { case (key, fs) =>
      val dir = s"$outBase/${safeDir(key)}"
      compact(spark, fs, dir, targetBytes)
      listParquet(new java.io.File(dir))
    }
    PolicyResult(
      files = (compacted ++ sparse.flatMap(_._2)).sorted,
      compactedKeys = dense.map(_._1),
      keptKeys = sparse.map(_._1))
  }

  private def listParquet(dir: java.io.File): Seq[String] = {
    val fs = Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
    fs.filter(_.isDirectory).flatMap(listParquet) ++
      fs.filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath)
  }

  /** One row per source file: (file, bytes, bin). */
  def plan(spark: SparkSession, files: Seq[String], targetBytes: Long)
      : DataFrame = {
    require(targetBytes > 0, s"targetBytes $targetBytes must be positive")
    import spark.implicits._
    val sized = files.sorted.map(f => (f, new java.io.File(f).length()))
    val starts = sized.scanLeft(0L)(_ + _._2).init
    sized.zip(starts)
      .map { case ((f, len), start) => (f, len, start / targetBytes) }
      .toDF("file", "bytes", "bin")
  }

  /** Compact `files` into `outDir` (one parquet file per bin, laid out
    * as bin=K partition dirs). Returns the number of bins written.
    * Deterministic: same files + target → same binning, same rows per
    * output file. */
  def compact(spark: SparkSession, files: Seq[String], outDir: String,
      targetBytes: Long): Int = {
    if (files.isEmpty) return 0
    val p = plan(spark, files, targetBytes)
    // a file larger than targetBytes advances the cumulative offset past
    // several bin indices, so max(bin)+1 would overcount — count the bins
    // actually assigned
    val nBins = p.select("bin").distinct().count().toInt
    // input_file_name() is non-deterministic, so it must be PROJECTED
    // before joining (a join condition requires determinism); it is also
    // a URI, so the plan side must go through the same URI encoding
    // (spaces, '%', unicode) rather than a "file://" string concat
    val rows = spark.read.parquet(files: _*)
      .withColumn("_src", input_file_name())
    val inCount = rows.count()
    // File.toURI percent-encodes (spaces, '%', unicode) and getRawPath
    // keeps that encoding; re-prefixing with "file://" yields the same
    // triple-slash form input_file_name() emits for local files
    val keyed = p.collect().map { r =>
      ("file://" + new java.io.File(r.getString(0)).toURI.getRawPath,
        r.getLong(2))
    }.toSeq
    import spark.implicits._
    val keyedDf = keyed.toDF("_src", "bin")
    val joined = rows.join(broadcast(keyedDf), "_src").drop("_src")
      .repartition(col("bin"))
      .cache()
    val outCount = joined.count()
    require(outCount == inCount,
      s"compaction plan/scan path mismatch: $inCount rows scanned, " +
        s"$outCount matched the plan (URI normalization drift?)")
    joined.write.mode("overwrite").partitionBy("bin").parquet(outDir)
    joined.unpersist()
    nBins
  }
}
