package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Bpe

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("training derives the hand-computed merge sequence") {
    // word freqs: ab×3, cd×1 → pairs (a,b):3 (b,</w>):3 (c,d):1 (d,</w>):1
    // tie (a,b)/(b,</w>) breaks lexicographic → merge1=(a,b);
    // then (ab,</w>):3 dominates → merge2=(ab,</w>)
    val merges = Bpe.trainFromCounts(Seq(("ab", 3L), ("cd", 1L)), numMerges = 2)
    assert(merges === Seq(("a", "b"), ("ab", Bpe.EndOfWord)))
  }

  test("encoding applies merges greedily by rank, every occurrence") {
    val merges = Bpe.trainFromCounts(Seq(("ab", 3L), ("cd", 1L)), numMerges = 2)
    val got = Seq("ab abab cd").toDF("text")
      .select(Bpe.encode(col("text"), merges).as("s"))
      .collect()(0).getSeq[String](0)
    // "ab" → [ab</w>]; "abab" → (a,b) fires twice → [ab, ab, </w>] →
    // (ab,</w>) fires on the tail → [ab, ab</w>]; "cd" has no merges
    assert(got === Seq("ab</w>", "ab", "ab</w>", "c", "d", Bpe.EndOfWord))
  }

  test("decode(encode(text)) round-trips the normalized corpus text") {
    val docs = Seq(
      (0L, "the quick brown fox  jumps"),
      (1L, "the the the lazy dog"),
      (2L, "héllo wörld 日本 text"),
      (3L, "single"),
      (4L, " leading and trailing  ")
    ).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 50, vocabCap = 100)
    val rows = docs.select(col("doc_id"), col("text"),
        Bpe.encode(col("text"), merges).as("s"))
      .as[(Long, String, Seq[String])].collect()
    rows.foreach { case (id, text, subs) =>
      val want = text.trim.split("\\s+").mkString(" ")
      assert(Bpe.decode(subs) === want, s"doc $id")
    }
  }

  test("merge table is deterministic across input partitioning") {
    val docs = (0L until 200L).map(i =>
      (i, s"tok${i % 7} tok${i % 3} shared words tok${i % 11}"))
      .toDF("doc_id", "text")
    val m1 = Bpe.train(docs, "text", numMerges = 64, vocabCap = 50)
    val m2 = Bpe.train(docs.repartition(13), "text", numMerges = 64, vocabCap = 50)
    assert(m1 === m2)
  }

  test("trained merges compress the corpus (fewer symbols than characters)") {
    val docs = Seq.tabulate(50)(i => (i.toLong, "compression ability " * 5))
      .toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 100, vocabCap = 100)
    val n = docs.select(size(Bpe.encode(col("text"), merges)).as("n"))
      .agg(sum("n")).as[Long].collect()(0)
    // "compression" and "ability" each collapse to ONE token (the </w>
    // merges into the word) after 100 merges: 50 docs × 10 words
    assert(n === 50L * 10L, s"expected fully merged words, got $n symbols")
  }
}
