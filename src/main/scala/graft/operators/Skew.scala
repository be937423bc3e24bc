package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at cluster scale.
  *
  * AQE's skew-join split (spark.sql.adaptive.skewJoin) is the first line
  * of defense and needs no code. These cover the two cases it doesn't:
  *
  *  - `saltedAggregate`: a groupBy whose hottest key overwhelms one
  *    reducer. Two-phase: salt the key with `pmod(hash(random-ish), n)`
  *    derived from a row-local column (deterministic — no rand(), so
  *    retries/speculation recompute identical results), partially
  *    aggregate per (key, salt), then finish per key. This helper
  *    implements the sum/count pair (avg = sum/count at the caller);
  *    the two-phase pattern generalizes to any algebraic aggregate with
  *    a (partial, finish) decomposition — min/max/sum-of-squares follow
  *    the same shape.
  *  - `saltedJoin`: a fact-side hot key joined against a dimension too
  *    big to broadcast. Fact rows get a deterministic salt in [0, n);
  *    the dimension is replicated n ways (explode over the salt range);
  *    the join key becomes (key, salt), splitting each hot key across n
  *    reducers.
  */
object Skew {

  /** Deterministic per-row salt in [0, n): hash of the given columns.
    * Using row content (not rand()) keeps task retries idempotent. */
  def salt(n: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(n)).as("_salt")

  /** Two-phase salted sum/count aggregate: per-(key, salt) partial, then
    * per-key final. Returns (keyCols..., sum_<valueCol>, count). */
  def saltedAggregate(df: DataFrame, keyCols: Seq[String], valueCol: String,
      saltCols: Seq[String], n: Int = 16): DataFrame = {
    val partial = df
      .withColumn("_salt", salt(n, saltCols.map(col): _*))
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_psum")).as(s"sum_$valueCol"),
        sum(col("_pcnt")).as("count"))
  }

  /** Salted equi-join: fact (large, skewed) ⋈ dim (too big to broadcast,
    * small enough to replicate n×). Inner join on the original key. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      n: Int = 16, factSaltCols: Seq[String] = Nil): DataFrame = {
    val saltSrc =
      if (factSaltCols.nonEmpty) factSaltCols.map(col)
      else fact.columns.map(c => col(s"`$c`")).toSeq
    val saltedFact = fact.withColumn("_salt", salt(n, saltSrc: _*))
    val replicatedDim = dim
      .withColumn("_salt", explode(sequence(lit(0), lit(n - 1))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }
}
