package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.SketchExpressions

/** Distributed Lloyd k-means over an embedding column — the full-corpus
  * clustering pass (topic bucketing, SemDeDup cluster assignment, IVF
  * index builds when a driver sample is not representative).
  *
  * Scale shape per iteration: assignment is a MAP-ONLY pass (centroids
  * are plan constants — k·dim doubles shipped once per executor, argmin
  * as a codegen expression); the centroid update is one partial/final
  * aggregation over (cluster, dim, quantized value) — the shuffle
  * carries k·dim partial sums per task, never vectors. The k·dim update
  * result is collected to the driver (bounded — it IS the model) and
  * becomes the next iteration's plan constants. Nothing corpus-sized
  * ever leaves the executors.
  *
  * Determinism contract (what makes the result an exact, replayable
  * fact rather than a float race): distances are exact integer
  * micro-units ([[SketchExpressions.sqDistMicro]] — per-dim terms
  * quantized to 1e-12 with `floor(x·1e12 + 0.5)`, summed as longs);
  * argmin tie-breaks on cluster id; centroid sums quantize per-dim
  * values the same way and divide as `sum.toDouble / (1e12 · n)`
  * (exact for n ≤ 9e3 · 1e12/1e12). Any engine repeating these integer
  * ops gets bit-identical assignments — the s18 DuckDB oracle does.
  */
object Clustering {

  private def litVec(v: Seq[Double]): Column = array(v.map(lit): _*)

  /** (cluster, dist_units) struct for a vector under plan-constant
    * centroids: lexicographic least over (dist, cluster id). */
  private def assignStruct(v: Column, cents: Array[Array[Double]]): Column = {
    val scored = cents.zipWithIndex.map { case (c, i) =>
      struct(
        SketchExpressions.sqDistMicro(v, litVec(c.toIndexedSeq)).as("dist"),
        lit(i).as("cl"))
    }
    if (scored.length == 1) scored.head
    else least(scored.toIndexedSeq: _*)
  }

  /** Final per-vector assignments (id, cluster, dist_units) after
    * `iters` Lloyd centroid updates from deterministic seeds (the first
    * k vectors by id). Empty clusters keep their previous centroid. */
  def kmeansAssignments(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val data = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    var cents: Array[Array[Double]] = data.orderBy("id").limit(k)
      .collect().map(_.getSeq[Double](1).toArray)
    require(cents.nonEmpty, "empty input — no seed vectors")
    for (_ <- 1 to iters) {
      val updated = data
        .withColumn("_a", assignStruct(col("v"), cents))
        .select(col("_a").getField("cl").as("cl"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cl"), col("pos"))
        .agg(sum(floor(col("x") * lit(1e12) + lit(0.5)).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      updated.foreach { r =>
        val (cl, pos) = (r.getInt(0), r.getInt(1))
        next(cl)(pos) = r.getLong(2).toDouble / (1e12 * r.getLong(3))
      }
      cents = next
    }
    data.withColumn("_a", assignStruct(col("v"), cents))
      .select(col("id"),
        col("_a").getField("cl").as("cluster"),
        col("_a").getField("dist").as("dist_units"))
  }
}
