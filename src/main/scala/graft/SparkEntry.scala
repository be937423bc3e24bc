package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CoreQueries, EngineQueries, PipelineQueries, SourceQueries, StreamingQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps each implemented operator from SURVEY.md §2 (plus the
  * training-data-pipeline operators) to a DataFrame builder; `oracleSql`
  * carries the DuckDB-equivalent SQL the driver hash-compares against.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full JSON-AST → Catalyst pipeline (parse → filter compile →
    * step-bucketed agg → series output). */
  def entry(spark: SparkSession): DataFrame =
    EngineQueries.ast_chart_sum(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ EngineQueries.queries ++ PipelineQueries.queries ++
      StreamingQueries.queries ++ SourceQueries.queries

  /** Pre-build one-time ingest artifacts (multi-file segment dir,
    * manifest index, per-minute metrics rollup, IVF centroids) so bench
    * timings measure queries, not ingest. Safe to skip — every query
    * builds what it needs lazily. */
  def prepare(spark: SparkSession, sfDir: String): Unit = {
    queries_prepare(spark, sfDir)
  }

  private def queries_prepare(spark: SparkSession, sfDir: String): Unit = {
    graft.queries.SourceQueries.prepare(spark, sfDir)
    graft.queries.EngineQueries.prepare(spark, sfDir)
    graft.queries.PipelineQueries.prepare(spark, sfDir)
    graft.queries.StreamingQueries.prepare(spark, sfDir)
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ EngineQueries.oracleSql ++ PipelineQueries.oracleSql ++
      StreamingQueries.oracleSql ++ SourceQueries.oracleSql
}
