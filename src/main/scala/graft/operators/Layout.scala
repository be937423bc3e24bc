package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: cluster a table on the bit
  * interleave of two quantized dimensions so that a 2-D range predicate
  * prunes most of the layout before any file is opened.
  *
  * Why this matters at 100 TB: directory partitioning and min/max
  * skipping are ONE-dimensional — a layout partitioned by x answers
  * x-range queries with tight pruning but reads everything for a
  * y-range. The z-curve gives a SINGLE cluster key that preserves
  * locality in both dimensions: any query box over (x, y) maps to a
  * small set of contiguous z-ranges (computed driver-side by
  * [[zCover]], pure arithmetic over the bucket grid), which Catalyst
  * turns into partition-directory pruning — whole directories are
  * skipped from the file listing, before footers, row groups, or rows.
  * The same z value works as a `repartitionByRange` key for min/max
  * footer skipping where directory partitioning is too coarse.
  *
  * Everything is deterministic Column bit math (shift/mask interleave —
  * no UDFs), and the exact box predicate is always re-applied after the
  * cover, so a laid-out scan provably returns the plain-table answer.
  */
object Layout {

  /** Interleave the low 16 bits of two bucket ids: bit i of `bx` goes to
    * bit 2i, bit i of `by` to bit 2i+1 (the classic parallel-prefix
    * spread, as Column ops). */
  def zInterleave(bx: Column, by: Column): Column =
    spread(bx).bitwiseOR(shiftleft(spread(by), 1))

  private def spread(c: Column): Column = {
    var x = c.cast("long")
    x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x33333333L))
    x = (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x55555555L))
    x
  }

  /** Driver-side twin of [[zInterleave]] — [[zCover]] plans with it. */
  def zOf(bx: Int, by: Int): Long = spreadL(bx) | (spreadL(by) << 1)

  private def spreadL(v: Int): Long = {
    var x = v.toLong & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Fixed-width bucket id of `c` over [min, max] in 2^bits buckets
    * (clamped, so out-of-domain rows land in the edge buckets and are
    * never lost). */
  def bucketCol(c: Column, min: Double, max: Double, bits: Int): Column = {
    val n = 1 << bits
    val w = if (max > min) (max - min) / n else 1.0
    least(greatest(floor((c.cast("double") - lit(min)) / lit(w)),
      lit(0.0)), lit((n - 1).toDouble)).cast("int")
  }

  /** Driver-side twin of [[bucketCol]] — same IEEE arithmetic. */
  def bucketOf(v: Double, min: Double, max: Double, bits: Int): Int = {
    val n = 1 << bits
    val w = if (max > min) (max - min) / n else 1.0
    math.min(math.max(math.floor((v - min) / w), 0.0), (n - 1).toDouble).toInt
  }

  /** The z-bucket cluster key for a row. */
  def zBucket(x: Column, xMin: Double, xMax: Double,
      y: Column, yMin: Double, yMax: Double, bits: Int): Column =
    zInterleave(bucketCol(x, xMin, xMax, bits), bucketCol(y, yMin, yMax, bits))

  /** Write `df` clustered by z-bucket partition directories. `bits` per
    * dimension → up to 4^bits directories; size it so a directory holds
    * at least a few files' worth of data at the target scale. */
  def zorderWrite(df: DataFrame, x: Column, xMin: Double, xMax: Double,
      y: Column, yMin: Double, yMax: Double, bits: Int, path: String): Unit =
    df.withColumn("z_bucket",
        zBucket(x, xMin, xMax, y, yMin, yMax, bits))
      .write.mode("overwrite").partitionBy("z_bucket").parquet(path)

  /** Covering z-ranges of the query box [xLo,xHi]×[yLo,yHi]: every bucket
    * combo intersecting the box, z-valued, sorted, and merged into
    * contiguous [lo,hi] ranges. Sound by bucket monotonicity — any row
    * satisfying the box predicate lives in a covered bucket; the z-curve's
    * locality keeps the merged range count far below the bucket count. */
  def zCover(xLo: Double, xHi: Double, xMin: Double, xMax: Double,
      yLo: Double, yHi: Double, yMin: Double, yMax: Double,
      bits: Int): Seq[(Long, Long)] = {
    val bxs = bucketOf(xLo, xMin, xMax, bits) to bucketOf(xHi, xMin, xMax, bits)
    val bys = bucketOf(yLo, yMin, yMax, bits) to bucketOf(yHi, yMin, yMax, bits)
    val zs = (for (bx <- bxs; by <- bys) yield zOf(bx, by)).sorted
    zs.foldLeft(List.empty[(Long, Long)]) {
      case ((lo, hi) :: tail, z) if z == hi + 1 => (lo, z) :: tail
      case (acc, z) => (z, z) :: acc
    }.reverse
  }

  /** The cover as a partition-prunable predicate on `z_bucket`. */
  def zCoverFilter(ranges: Seq[(Long, Long)]): Column =
    ranges.map { case (lo, hi) =>
      if (lo == hi) col("z_bucket") === lo
      else col("z_bucket").between(lo, hi)
    }.reduce(_ || _)
}
