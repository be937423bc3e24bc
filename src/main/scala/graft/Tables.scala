package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver-generated test tables (TESTDATA.md) and registers them
  * as temp views so both the DataFrame DSL and spark.sql can reach them.
  *
  * At 100 TB these would be partitioned roots
  * (`customer/collector/dateInt=/hour=` in the reference's layout — see
  * reference core/src/main/scala/com/cardinal/utils/Commons.scala:160-177);
  * here each table is a single parquet file. All reads go through
  * mergeSchema=true so per-file schema evolution (the norm for telemetry
  * segments) unions by name, mirroring DuckDB's `union_by_name=True`
  * (reference Commons.scala:200-254).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Collision-free per-dataset tmp path: the sanitized name alone is
    * ambiguous ("/data/sf0.1" and "/data/sf0_1" both sanitize to
    * "_data_sf0_1" — one dataset's artifacts would silently serve the
    * other), so the full path's spec-fixed String.hashCode rides along. */
  private[graft] def tmpDirFor(prefix: String, dir: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"${prefix}_${dir.replaceAll("[^a-zA-Z0-9]", "_")}_" +
        Integer.toHexString(dir.hashCode)).getAbsolutePath

  // DataFrames are immutable logical plans — memoize per (session, path) so
  // repeated loads reuse one relation (no re-listing / schema re-inference
  // per query).
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, s"$sfDir/$name.parquet"), { case (s, path) =>
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 has no
      // timestamp type for — read it as epoch-nanos LongType. Comparisons/
      // bucketing on the raw long keep predicate pushdown intact.
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.read.option("mergeSchema", "true").parquet(path)
    })

  /** Register every table as a temp view named after itself; idempotent. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
}
