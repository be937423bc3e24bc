package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus retrieval scoring — the ranking layer over the inverted-index /
  * token machinery (s20, t9): BM25, the standard lexical relevance score
  * used to mine training data by query ("find documents about X") and to
  * build retrieval-augmented training sets.
  *
  * 100 TB shape: one corpus scan computes per-document length map-side
  * (a codegen token-count expression — no explode for the length) and the
  * query-term frequencies via an explode FILTERED TO THE QUERY TERMS
  * before any shuffle — the aggregation exchange carries only
  * (doc, query_term) hit rows, proportional to the posting lists of the
  * queried terms, never the corpus token stream. Document frequencies and
  * the corpus constants (N, avgdl) come from two tiny aggregates broadcast
  * back; the final score is a per-document weighted sum with the repo's
  * determinism contract (per-term round-9, DECIMAL(27,9) accumulation) so
  * any partitioning yields bit-identical scores; top-k goes through
  * TakeOrderedAndProject (no global sort).
  *
  * With a prebuilt inverted index (s20) the tf pass reads posting lists
  * instead of rescanning the corpus; this operator is the index-free
  * one-pass form.
  */
object Retrieval {

  /** BM25 scores for `queryTerms` over whitespace-tokenized `textCol`;
    * returns (id, n_tok, n_hit, score) for documents matching ≥1 term,
    * top `k` by (score DESC, id ASC).
    *
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5))  (Lucene's non-negative form)
    * tf-sat = tf·(k1+1) / (tf + k1·(1 − b + b·len/avgdl))
    */
  def bm25(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val dec = DecimalType(27, 9)

    val base = df.select(col(idCol).as("_id"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("_len"),
      Dedup.tokens(col(textCol)).as("_toks"))

    // corpus constants: one 1-row aggregate, broadcast back
    val consts = base.agg(
      count(lit(1)).cast("double").as("_n"),
      (sum(col("_len")).cast("double") / count(lit(1))).as("_avgdl"))

    // (doc, term) hits: filter to the query terms BEFORE the aggregation
    // shuffle — the exchange carries posting-list rows only
    val tf = base
      .select(col("_id"), col("_len"), explode(col("_toks")).as("_t"))
      .where(col("_t").isin(queryTerms: _*))
      .groupBy(col("_id"), col("_len"), col("_t"))
      .agg(count(lit(1)).cast("double").as("_tf"))

    // per-term document frequency over the tiny hit frame
    val dfT = tf.groupBy(col("_t")).agg(count(lit(1)).cast("double").as("_df"))

    val lenNorm = lit(k1) * (lit(1.0 - b) +
      lit(b) * col("_len").cast("double") / col("_avgdl"))
    val idf = log(lit(1.0) + (col("_n") - col("_df") + lit(0.5)) /
      (col("_df") + lit(0.5)))
    val term = round(idf * (col("_tf") * lit(k1 + 1.0)) /
      (col("_tf") + lenNorm), 9)

    tf.join(broadcast(dfT), Seq("_t"))
      .crossJoin(broadcast(consts))
      .select(col("_id"), col("_len"), term.as("_s"))
      .groupBy(col("_id"), col("_len"))
      .agg(count(lit(1)).as("n_hit"),
        // round the exact DECIMAL before the double cast (the t14
        // tie-at-7th-decimal lesson — see TextAnalysis.tfidf)
        round(sum(col("_s").cast(dec)), 6).cast("double").as("score"))
      .select(col("_id").as("id"), col("_len").as("n_tok"),
        col("n_hit"), col("score"))
      .orderBy(desc("score"), col("id"))
      .limit(k)
  }
}
