package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, leakage-free train/val/test splitting.
  *
  * The split key is a GROUP (domain/source), not the document: hashing
  * doc ids scatters near-duplicate documents from one site across splits
  * and leaks eval data into training. All documents of a group land in
  * one split, decided by a pure integer hash of the group key — stable
  * across runs, machines, and engines (no RNG, no `rand()`
  * seed-per-partition trap). The per-domain QUOTA companion (the
  * C4-style "no domain dominates" cap) is `Sampling.stratifiedTopN` with
  * a quality ordering — not duplicated here.
  *
  * 100 TB notes: groupSplit hashes the DISTINCT group keys (a tiny
  * frame) and broadcast-joins the assignment back — the corpus itself
  * only passes a map-side hash join, no shuffle. The polynomial hash is
  * ASCII-stable arithmetic (h·31 + code mod 2³¹, then a Knuth
  * multiplicative mix) chosen because any engine can replay it exactly —
  * the DuckDB oracle does.
  */
object Splits {

  /** Polynomial rolling hash of a string column: fold(h·31 + ascii) mod
    * 2³¹, then `(h · 2654435761) mod 2³²` (the p1/p5 Knuth mix) — pure
    * integer Column arithmetic, replayable in any SQL engine. */
  def stringHash(c: Column): Column = {
    val poly = aggregate(
      transform(sequence(lit(1), length(c)),
        i => ascii(substring(c, i, lit(1)))),
      lit(0L),
      (h, code) => pmod(h * 31 + code.cast("long"), lit(2147483648L)))
    pmod(poly * 2654435761L, lit(4294967296L))
  }

  /** Assign each group (distinct value of `groupCol`) to train/val/test
    * by thousandths of the group-key hash: bucket < trainPermille →
    * train, < trainPermille+valPermille → val, else test. Returns the
    * input plus a `split` column; the corpus side is a broadcast
    * map-side join against the hashed distinct-group frame. */
  def groupSplit(
      df: DataFrame,
      groupCol: String,
      trainPermille: Int = 900,
      valPermille: Int = 50): DataFrame = {
    require(trainPermille > 0 && valPermille > 0 &&
      trainPermille + valPermille < 1000,
      s"invalid split permilles ($trainPermille, $valPermille)")
    val buckets = df.select(col(groupCol)).distinct()
      .select(col(groupCol),
        (stringHash(col(groupCol)) % 1000).as("_bucket"))
      .select(col(groupCol),
        when(col("_bucket") < trainPermille, "train")
          .when(col("_bucket") < trainPermille + valPermille, "val")
          .otherwise("test").as("split"))
    df.join(broadcast(buckets), Seq(groupCol))
  }
}
