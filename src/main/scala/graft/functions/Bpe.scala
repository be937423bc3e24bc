package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization: a corpus-trained merge table applied
  * by a codegen-friendly Catalyst expression — real subword tokenization
  * (not the length-heuristic estimate) for token budgeting, packing, and
  * sequence statistics.
  *
  * Training (the classic Sennrich et al. 2016 procedure) is driver-side
  * over a BOUNDED word-frequency table — like the IVF centroids, the
  * driver holds a capped vocabulary (top-N words by frequency), never
  * corpus rows; the distributed part is one groupBy(word) count. The
  * resulting merge list is a plan constant shipped once per executor.
  *
  * Encoding runs per row inside whole-stage codegen: whitespace
  * pre-tokenization, then greedy lowest-rank adjacent merges per word
  * (standard BPE apply). Deterministic end-to-end: merge ties break by
  * (count desc, pair lexicographic asc).
  */
object Bpe {

  /** End-of-word marker (Sennrich-style); keeps merges word-bounded and
    * makes decoding unambiguous — provided the corpus does not contain
    * the literal string "</w>" (production tokenizers escape to byte
    * level; this implementation enforces the assumption at training
    * time so a violation fails loudly at the source rather than as a
    * confusing decode mismatch downstream). */
  val EndOfWord = "</w>"

  /** Train `numMerges` BPE merges from a (word, freq) table. */
  def trainFromCounts(wordCounts: Seq[(String, Long)], numMerges: Int)
      : Seq[(String, String)] = {
    wordCounts.find(_._1.contains(EndOfWord)).foreach { case (w, _) =>
      throw new IllegalArgumentException(
        s"BPE corpus word '$w' contains the reserved end-of-word marker " +
          s"'$EndOfWord'; escape or strip it before training")
    }
    var words: Array[(Array[String], Long)] = wordCounts.map { case (w, f) =>
      (splitSymbols(w) :+ EndOfWord, f)
    }.toArray
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var continue = true
    while (continue && merges.length < numMerges) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) continue = false
      else {
        val best = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, f) => (applyMerge(syms, best), f) }
      }
    }
    merges.toSeq
  }

  private[functions] def splitSymbols(w: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  private[functions] def applyMerge(syms: Array[String], m: (String, String))
      : Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == m._1 && syms(i + 1) == m._2) {
        out += (m._1 + m._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Train merges on a corpus text column. One distributed
    * groupBy(word) count; the driver collects only the top `vocabCap`
    * (freq desc, word asc — deterministic) word rows. */
  def train(df: DataFrame, textCol: String, numMerges: Int = 256,
      vocabCap: Int = 5000): Seq[(String, String)] = {
    val words = df
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .where(col("w") =!= "")
    // the marker guard must see the WHOLE corpus: trainFromCounts only
    // inspects the collected top-vocabCap words, and a marker hiding in
    // a rarer word would still corrupt decode() downstream (the encoder
    // rejects it per row, but training is the documented fail point)
    val offending = words.where(col("w").contains(EndOfWord))
      .limit(1).collect()
    if (offending.nonEmpty)
      throw new IllegalArgumentException(
        s"BPE corpus word '${offending(0).getString(0)}' contains the " +
          s"reserved end-of-word marker '$EndOfWord'; escape or strip " +
          "it before training")
    val counts = words
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(desc("f"), col("w"))
      .limit(vocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromCounts(counts, numMerges)
  }

  /** Encode a text column into its BPE subword array. */
  def encode(textCol: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(
      BpeEncodeExpr(GraftColumnBridge.expression(textCol), merges))

  /** Decode subwords back to text (spec/debug path): concatenation with
    * end-of-word markers restored to spaces. */
  def decode(subwords: Seq[String]): String =
    subwords.mkString("").replace(EndOfWord, " ").trim
}

/** Greedy BPE application per row — one tight JVM loop, no UDF. */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ComputeUnaryCodegen {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + " " + b, i) }
    m
  }

  override def compute(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer[UTF8String]()
    text.trim.split("\\s+").foreach { w =>
      if (w.nonEmpty) {
        // same reserved-marker contract as training: a marker inside a
        // word would decode ambiguously, so it fails loudly here too
        if (w.contains(Bpe.EndOfWord))
          throw new IllegalArgumentException(
            s"BPE input word '$w' contains the reserved end-of-word " +
              s"marker '${Bpe.EndOfWord}'")
        // the SAME split/merge helpers training uses — round-trip parity
        // by construction, not by parallel-maintained copies
        var syms = Bpe.splitSymbols(w) :+ Bpe.EndOfWord
        var done = false
        while (!done && syms.length > 1) {
          // lowest-rank adjacent pair
          var bestRank = Int.MaxValue; var bestAt = -1
          var i = 0
          while (i < syms.length - 1) {
            val r = ranks.get(syms(i) + " " + syms(i + 1))
            if (r != null && r < bestRank) { bestRank = r; bestAt = i }
            i += 1
          }
          if (bestAt < 0) done = true
          else syms = Bpe.applyMerge(syms, (syms(bestAt), syms(bestAt + 1)))
        }
        syms.foreach(s => out += UTF8String.fromString(s))
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def prettyName: String = "graft_bpe_encode"

  override protected def withNewChildInternal(newChild: Expression)
      : BpeEncodeExpr = copy(child = newChild)
}
