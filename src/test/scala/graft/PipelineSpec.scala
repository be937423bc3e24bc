package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // corpus with planted exact and near duplicates
  private def corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup of 0
    (3L, "completely different content about database query optimization and join ordering"),
    (4L, "another unrelated text discussing machine learning training pipelines at scale"),
    (5L, "the quick brown fox leaps over the lazy dog near the river bank today") // near dup of 0
  ).toDF("doc_id", "text")

  test("charNgramHashes byte-offset walk matches substring hashing on multibyte text") {
    // the offset-table fast path must produce the exact hashes of
    // xxhash64(substr(text, i, n), 42) — including for multibyte UTF-8
    // (é=2 bytes, 試/験=3, 😀=4) and strings shorter than n
    val texts = Seq("héllo wörld", "日本語の試験テキストです", "a😀b😀c",
      "plain ascii text", "ab", "é", "")
    import graft.functions.SketchExpressions
    for (t <- texts; n <- Seq(3, 4, 8)) {
      val fast = Seq(t).toDF("text")
        .select(SketchExpressions.charNgramHashes(col("text"), n).as("h"))
        .collect()(0).getSeq[Long](0)
      // reference: Spark's own substring + xxhash64, deduped + sorted
      val len = t.codePointCount(0, t.length)
      val grams = (0 until math.max(len - n + 1, 1)).map { i =>
        val s = t.offsetByCodePoints(0, i)
        val e = t.offsetByCodePoints(0, math.min(i + n, len))
        t.substring(s, e)
      }
      val want = Seq(grams).toDF("g")
        .select(explode(col("g")).as("g"))
        .select(xxhash64(col("g")).as("h"))
        .distinct().collect().map(_.getLong(0)).sorted.toSeq
      assert(fast == want, s"text='$t' n=$n: $fast != $want")
    }
  }

  test("exact dedup keeps min id per distinct content") {
    val kept = Dedup.exact(corpus, "doc_id", Seq("text"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(0L, 2L, 3L, 4L, 5L)))
  }

  test("crossNearDuplicates finds batch-vs-history near-dups, never batch-internal pairs") {
    val history = corpus.where(col("doc_id") <= 2) // 0, 1 (exact dups), 2 (near)
    val batch = corpus.where(col("doc_id") >= 3)   // 5 is a near-dup of 0/1/2
    // bands=32 (r=4) to band aggressively at this low threshold — same
    // tuning as the within-corpus planted-dup test above
    val pairs = Dedup.crossNearDuplicates(batch, history, "doc_id", "text",
        numHashes = 128, bands = 32, threshold = 0.5)
      .select("id_new", "id_hist").as[(Long, Long)].collect().toSet
    assert(pairs.contains((5L, 0L)) && pairs.contains((5L, 1L)),
      s"planted cross near-dup missing from $pairs")
    assert(pairs.forall { case (n, h) => n >= 3 && h <= 2 },
      s"only batch→history pairs allowed: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._1 == 4L), "3/4 are unrelated")
  }

  test("incrementalNew is exact: equals the plain anti-join on content") {
    val history = corpus.where(col("doc_id") <= 2)
    val batch = corpus.where(col("doc_id") >= 1) // 1,2 dup history; 3,4,5 new
    val got = Dedup.incrementalNew(batch, history, Seq("text"),
        expectedItems = 100)
      .select("doc_id").as[Long].collect().sorted
    assert(got === Array(3L, 4L, 5L))
    // a pre-built filter artifact routes identically
    val bytes = Dedup.contentBloom(history, Seq("text"), expectedItems = 100)
    val again = Dedup.incrementalNew(batch, history, Seq("text"),
        expectedItems = 100, bloomBytes = bytes)
      .select("doc_id").as[Long].collect().sorted
    assert(again === got)
  }

  test("incrementalNew survives an aggressively small filter (false positives verified)") {
    // fpp 0.5 at 4 expected items forces Bloom false positives on some of
    // 200 new rows — the anti-join must still return the exact answer
    val history = Seq((0L, "seen a"), (1L, "seen b")).toDF("doc_id", "text")
    val batch = (2L until 202L).map(i => (i, s"fresh text $i")).toDF("doc_id", "text")
      .unionByName(Seq((500L, "seen a")).toDF("doc_id", "text"))
    val got = Dedup.incrementalNew(batch, history, Seq("text"),
        expectedItems = 4, fpp = 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(got === (2L until 202L).toArray)
  }

  test("spanDedup keeps first global span occurrence and reassembles survivors") {
    // 4-token spans: doc 0 = [a b c d][e f g h]; doc 1 repeats doc 0's
    // first span then adds fresh text; doc 2 repeats its own first span
    // in-document; doc 3 is entirely spans seen earlier
    val docs = Seq(
      (0L, "a b c d e f g h"),
      (1L, "a b c d x y z w"),
      (2L, "p q r s p q r s"),
      (3L, "a b c d p q r s")
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, "doc_id", "text", spanTokens = 4)
      .orderBy("id")
      .select("id", "n_spans", "n_kept", "text_kept")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (0L, 2L, 2L, "a b c d e f g h"),
      (1L, 2L, 1L, "x y z w"),   // shared prefix struck
      (2L, 2L, 1L, "p q r s"),   // in-document repeat struck
      (3L, 2L, 0L, "")))         // nothing new survives
  }

  test("spanDedup handles a final truncated span") {
    val docs = Seq((7L, "a b c d e")).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, "doc_id", "text", spanTokens = 4)
      .select("n_spans", "n_kept", "text_kept")
      .as[(Long, Long, String)].collect()(0)
    assert(out === ((2L, 2L, "a b c d e")))
  }

  test("minhash LSH finds planted near-duplicates and skips unrelated docs") {
    val pairs = Dedup.minhashNearDuplicates(corpus, "doc_id", "text",
        shingleWidth = 3, numHashes = 128, bands = 32, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), "exact dup must collide")
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)),
      s"near dup 2 missing from $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "3 is unrelated")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "4 is unrelated")
  }

  test("minhash signature approximates jaccard") {
    val sig = corpus.select(col("doc_id"),
      Dedup.minhashSignature(
        Dedup.wordShingles(Dedup.tokens(col("text")), 3), 256).as("sig"))
    val rows = sig.collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1)).toMap
    def simEst(a: Long, b: Long): Double =
      rows(a).zip(rows(b)).count { case (x, y) => x == y }.toDouble / 256
    assert(simEst(0L, 1L) == 1.0, "identical docs -> identical signatures")
    assert(simEst(0L, 2L) > 0.5, s"near dup est ${simEst(0L, 2L)}")
    assert(simEst(0L, 3L) < 0.2, s"unrelated est ${simEst(0L, 3L)}")
  }

  test("simhash near-dup pairs via hamming banding") {
    val pairs = Dedup.simhashNearDuplicates(corpus, "doc_id", "text",
        maxHamming = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ngram jaccard pairs within block") {
    val blocked = corpus.withColumn("block", lit("all"))
    val pairs = Dedup.ngramJaccardPairs(blocked, "doc_id", "text",
        "block", n = 4, threshold = 0.8)
      .select("id_a", "id_b", "jaccard").collect()
    val ids = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ids.contains((0L, 1L)))
    val j01 = pairs.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L).get.getDouble(2)
    assert(j01 == 1.0)
  }

  test("prefix-filter similarity join equals brute force at every threshold") {
    // All-Pairs prefix filtering guarantees full recall; verify exact
    // output equality against the single-block brute-force formulation
    val blocked = corpus.withColumn("block", lit("all"))
    for (t <- Seq(0.3, 0.5, 0.8, 0.95)) {
      val brute = Dedup.ngramJaccardPairs(blocked, "doc_id", "text",
          "block", n = 4, threshold = t)
        .select("id_a", "id_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val pf = Dedup.jaccardSimilarityJoin(corpus, "doc_id", "text",
          n = 4, threshold = t)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pf == brute, s"threshold $t: prefix-filter $pf != brute $brute")
    }
  }

  test("contamination counts distinct shared n-grams against a benchmark") {
    // 29 chars → 22 distinct 8-grams; fully contained in docs 0/1/2,
    // partially in doc 5 ("fox LEAPS over"), absent from docs 3/4
    val bench = Seq((100L, "brown fox jumps over the lazy")).toDF("doc_id", "text")
    val out = TextAnalysis.contamination(corpus, bench, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 5L), s"got $out")
    assert(out(0L) == 22 && out(1L) == 22 && out(2L) == 22)
    assert(out(5L) > 0 && out(5L) < 22, s"partial overlap, got ${out(5L)}")
    assert(!out.contains(3L) && !out.contains(4L), "unrelated docs clean")
  }

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),
    (4L, Array(0.7f, 0.7f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("brute force cosine top-k") {
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      Seq(1.0, 0.0, 0.0, 0.0), k = 3).collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(0L, 1L, 4L))
    assert(math.abs(top(0).getDouble(1) - 1.0) < 1e-12)
  }

  test("exact kNN graph ranks neighbors by cosine") {
    val g = Similarity.knnGraphExact(vecs, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    // neighbors of 0 = (1.0,0,0,0): closest 1 (cos≈0.994), then 4 (≈0.707)
    assert(g((0L, 1)) == 1L && g((0L, 2)) == 4L)
    // neighbors of 3 = (-1,0,0,0): everything is <= 0; best is 2 (cos 0)
    assert(g((3L, 1)) == 2L)
  }

  test("hardNegatives excludes labeled positives and ranks the rest " +
    "by cosine") {
    // query = vec 0 (1,0,0,0); positives = itself and vec 1 -> the
    // mined negatives are 4 (cos .707), 2 (cos 0), 3 (cos -1)
    val q = vecs.where(col("vec_id") === 0L)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val pos = Seq((0L, 0L), (0L, 1L)).toDF("qid", "vec_id")
    val got = Similarity.hardNegatives(q, "qid", "qv",
        vecs, "vec_id", "embedding", pos, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getInt(3)))
    assert(got.toSeq == Seq((4L, 1), (2L, 2), (3L, 3)))
    // k smaller than the candidate pool truncates
    assert(Similarity.hardNegatives(q, "qid", "qv", vecs, "vec_id",
      "embedding", pos, k = 1).count() == 1)
  }

  test("autoBits scales hyperplane count with corpus density and keeps " +
    "expected block occupancy ~constant") {
    import org.apache.spark.sql.functions.{col => c}
    // log-growth: 10x the corpus adds ~log2(10) = 3-4 bits
    val small = spark.range(1000).toDF("id")
    val big = spark.range(10000).toDF("id")
    val bSmall = Similarity.autoBits(small, targetOccupancy = 16)
    val bBig = Similarity.autoBits(big, targetOccupancy = 16)
    assert(bSmall == math.max(8, 6)) // ceil(log2(1000/16)) = 6 -> floor 8
    assert(bBig == 10)               // ceil(log2(10000/16)) = 10
    // occupancy bound holds on real vectors: with autoBits the MEAN
    // bucket occupancy stays near target as n grows 8x
    def occupancy(n: Int): Double = {
      val vs = spark.range(n).selectExpr("id as vec_id",
        "array(cast(sin(id) as float), cast(cos(id * 0.7) as float), " +
        "cast(sin(id * 1.3) as float), cast(cos(id * 2.1) as float)) as embedding")
      val bits = Similarity.autoBits(vs, targetOccupancy = 32, floor = 4)
      vs.select(Similarity.hyperplaneBucket(c("embedding"), bits, 4).as("b"))
        .groupBy("b").count()
        .agg(org.apache.spark.sql.functions.avg("count")).head().getDouble(0)
    }
    val o1 = occupancy(2000)
    val o8 = occupancy(16000)
    // 8x the data, same order of occupancy (hash spread is not uniform
    // on structured vectors, so allow a wide band — fixed bits would
    // grow occupancy 8x)
    assert(o8 < o1 * 4, s"occupancy grew superlinearly: $o1 -> $o8")
    intercept[IllegalArgumentException](
      Similarity.autoBits(small, targetOccupancy = 0))
  }

  test("exact twins refuse oversized inputs loudly (scale guard)") {
    val eNd = intercept[IllegalArgumentException] {
      Dedup.embeddingNearDuplicates(vecs, "vec_id", "embedding",
        threshold = 0.95, maxExactRows = 3L).collect()
    }
    assert(eNd.getMessage.contains("all-pairs"))
    val eKnn = intercept[IllegalArgumentException] {
      Similarity.knnGraphExact(vecs, "vec_id", "embedding", k = 2,
        maxExactRows = 3L).collect()
    }
    assert(eKnn.getMessage.contains("knnGraph"))
  }

  test("embedding near-dup pairs") {
    val pairs = Dedup.embeddingNearDuplicates(vecs, "vec_id", "embedding",
        threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("embedding near-dup LSH-blocked scale path finds the same near-dups") {
    // near-identical vectors always share the hyperplane bucket, so the
    // blocked (scale) path must recover the pair the exact path finds
    val blocked = Dedup.embeddingNearDuplicates(vecs, "vec_id", "embedding",
        threshold = 0.95, lshBits = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(blocked == Set((0L, 1L)))
  }

  test("zero-norm embeddings score 0 cosine, never NaN (NaN outranks everything)") {
    val vs = Seq(
      (0L, Array(0f, 0f, 0f, 0f)),          // zero vector
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0.99f, 0.01f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val c = vs.where(col("vec_id") === 0)
      .crossJoin(vs.where(col("vec_id") === 1).select(col("embedding").as("e2")))
      .select(Similarity.cosine(col("embedding"), col("e2")))
      .as[Double].collect()(0)
    assert(c === 0.0 && !c.isNaN)
    // a zero vector must not pollute top-k or mark others as duplicates
    val top = Similarity.bruteForceTopK(vs, "vec_id", "embedding",
      Seq(1.0, 0.0, 0.0, 0.0), k = 2).select("id").as[Long].collect()
    assert(top.toSeq === Seq(1L, 2L))
    val dups = Dedup.embeddingNearDuplicates(vs, "vec_id", "embedding",
      threshold = 0.9).select("id_b").as[Long].collect().toSet
    assert(!dups.contains(1L) || dups === Set(2L))
    assert(dups === Set(2L)) // only the planted near-dup of 1
  }

  test("semanticDedup collapses planted paraphrase groups and never over-drops") {
    // three tight groups of near-identical vectors (jittered copies of
    // orthogonal bases) + two isolated points; near-identical vectors
    // always share the nearest centroid, so within-group recall is exact
    def jitter(base: Array[Float], i: Int): Array[Float] =
      base.zipWithIndex.map { case (x, d) => x + 0.01f * ((i + d) % 3 - 1) }
    val bases = Seq(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f), Array(0f, 0f, 1f, 0f))
    val rows =
      bases.zipWithIndex.flatMap { case (b, g) =>
        (0 until 4).map(i => (g * 10L + i, jitter(b, i)))
      } ++ Seq((90L, Array(0f, 0f, 0f, 1f)),
               (91L, Array(-1f, -1f, 0f, 0f).map(_ / math.sqrt(2).toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    // k = number of planted groups: the deterministic init seeds one
    // centroid per group, so no group is split across two centroids
    // (with k > groups a tight group can straddle two nearby centroids —
    // exactly the recall trade the operator documents)
    val cents = Similarity.ivfCentroids(df, "vec_id", "embedding", k = 3,
      maxSample = 100)
    val surv = Dedup.semanticDedup(df, "vec_id", "embedding", cents,
        threshold = 0.95)
      .select("id").as[Long].collect().toSet
    // each group keeps exactly its min id; isolated points survive
    assert(surv === Set(0L, 10L, 20L, 90L, 91L))
    // precision: survivors always contain the exact no-clustering survivors
    val exactDrops = Dedup.embeddingNearDuplicates(df, "vec_id", "embedding",
        threshold = 0.95).select("id_b").as[Long].collect().toSet
    val exactSurv = rows.map(_._1).toSet -- exactDrops
    assert(exactSurv.subsetOf(surv))
  }

  test("semanticDedup array route and semanticDedupFrame forced-frame " +
    "route (no broadcast) agree row-for-row") {
    // s37's two routes: in-gate the codebook rides as a driver array /
    // local relation; past the broadcast gate it stays a frame through a
    // shuffled hash join. Same training, bucketing, scoring, and drop
    // stage — survivors must be identical. The frame side gets the
    // SORTED-by-cluster array relabeled to dense indices, mirroring what
    // hierCentroidsArray inverts: monotone relabeling preserves the
    // lower-cluster-id tie-break, so candidate ranking cannot differ.
    def jitter(base: Array[Float], i: Int): Array[Float] =
      base.zipWithIndex.map { case (x, d) => x + 0.01f * ((i + d) % 3 - 1) }
    val bases = Seq(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f), Array(0f, 0f, 1f, 0f))
    val rows =
      bases.zipWithIndex.flatMap { case (b, g) =>
        (0 until 4).map(i => (g * 10L + i, jitter(b, i)))
      } ++ Seq((90L, Array(0f, 0f, 0f, 1f)))
    val df = rows.toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(df, "vec_id", "embedding", k = 3,
      maxSample = 100)
    val arr = Dedup.semanticDedup(df, "vec_id", "embedding", cents,
        threshold = 0.95, probes = 2, assignBits = 2, assignTables = 4)
      .select("id").as[Long].collect().toSet
    val centDf = cents.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }.toDF("cluster", "cvec")
    val framed = Dedup.semanticDedupFrame(df, "vec_id", "embedding",
      centDf, threshold = 0.95, probes = 2, assignBits = 2,
      assignTables = 4, broadcastCentroids = false)
    // only the centroid-assignment join (keyed on the LSH bucket
    // columns t/block) must avoid broadcast; the tiny id-keyed
    // left-join and anti-join in the drop stage may broadcast freely
    val plan = framed.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      "forced-frame route must shuffle-hash-join the centroid side:\n" +
        plan.linesIterator.take(30).mkString("\n"))
    assert(!plan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("block")),
      "centroid bucket join must not broadcast:\n" +
        plan.linesIterator.take(30).mkString("\n"))
    assert(framed.select("id").as[Long].collect().toSet === arr)
  }

  test("hardNegatives enforces its broadcast contract; the blocked " +
    "variant agrees with the exact path on planted structure") {
    // 30 corpus vectors around 3 orthogonal bases + 3 queries equal to
    // the bases; each query labels its own exact copy positive, so the
    // top-1 hard negative is the nearest jittered sibling — high
    // cosine, the regime LSH collision odds are strongest in
    def jig(base: Array[Float], i: Int): Array[Float] =
      base.zipWithIndex.map { case (x, d) => x + 0.02f * ((i + d) % 3 - 1) }
    val bases = Seq(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f))
    val corpus = bases.zipWithIndex.flatMap { case (b, g) =>
      (0 until 10).map(i => (g * 100L + i, if (i == 0) b else jig(b, i)))
    }.toDF("vec_id", "embedding")
    val q = bases.zipWithIndex
      .map { case (b, g) => (g * 100L, b) }.toDF("qid", "qv")
    val pos = q.select(col("qid"), col("qid").as("vec_id"))
    val exact = Similarity.hardNegatives(q, "qid", "qv", corpus,
        "vec_id", "embedding", pos, k = 2)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
    val blocked = Similarity.hardNegativesBlocked(q, "qid", "qv", corpus,
        "vec_id", "embedding", pos, k = 2, bits = 6, dim = 4, tables = 4)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(exact === blocked,
      "blocked candidate generation must recover the exact top-k here")
    assert(exact.size === 6 && exact.forall { case (qid, id, _) =>
      id / 100 == qid / 100 && id != qid }, // same family, not self
      s"unexpected hard negatives: $exact")
    // the contract gate: a corpus-scale query set fails loudly and
    // points at the blocked alternative
    val e = intercept[IllegalArgumentException] {
      Similarity.hardNegatives(corpus.toDF("qid", "qv"), "qid", "qv",
        corpus, "vec_id", "embedding", pos, k = 1, maxQueryRows = 10)
    }
    assert(e.getMessage.contains("hardNegativesBlocked"))
  }

  test("semanticDedup probes=2 recovers a cluster-boundary near-dup pair " +
    "that probes=1 misses (index-side multi-probe recall buy-back)") {
    // two fixed centroids; a near-identical pair straddling the boundary:
    // a's nearest centroid is c0, b's is c1, cosine(a,b) ~ 0.99995
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val df = Seq(
      (1L, Array(1.00f, 0.99f)), (2L, Array(0.99f, 1.00f)),
      (50L, Array(1f, 0f)), (60L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val single = Dedup.semanticDedup(df, "vec_id", "embedding", cents,
      threshold = 0.95).select("id").as[Long].collect().toSet
    assert(single === Set(1L, 2L, 50L, 60L),
      "probes=1 must MISS the straddling pair (the documented trade)")
    val multi = Dedup.semanticDedup(df, "vec_id", "embedding", cents,
      threshold = 0.95, probes = 2).select("id").as[Long].collect().toSet
    assert(multi === Set(1L, 50L, 60L),
      "probes=2 must drop the higher id of the straddling pair")
    // reported cluster stays the NEAREST one under multi-probe
    val clusters = Dedup.semanticDedup(df, "vec_id", "embedding", cents,
      threshold = 0.95, probes = 2)
      .select("id", "cluster").as[(Long, Int)].collect().toMap
    assert(clusters(50L) === 0 && clusters(60L) === 1 && clusters(1L) === 0)
  }

  test("ivfAssignTop ranks clusters like ivfAssign and autoClusters " +
    "tracks corpus density") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(-1.0, 0.0))
    val df = Seq((1L, Array(0.9f, 0.5f)), (2L, Array(-0.9f, 0.4f)))
      .toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"),
        Similarity.ivfAssignTop(
          Similarity.toDoubleVec(col("embedding")), cents, 2).as("top"),
        Similarity.ivfAssign(
          Similarity.toDoubleVec(col("embedding")), cents).as("nearest"))
      .as[(Long, Seq[Int], Int)].collect()
      .map { case (k, t, n) => k -> ((t, n)) }.toMap
    assert(got(1L)._1 === Seq(0, 1) && got(1L)._2 === 0)
    assert(got(2L)._1 === Seq(2, 1) && got(2L)._2 === 2)
    val small = Seq.tabulate(64)(i => (i.toLong, Array(1f, i.toFloat)))
      .toDF("vec_id", "embedding")
    assert(Similarity.autoClusters(small, targetOccupancy = 128) === 16,
      "floor binds below the density point")
    assert(Similarity.autoClusters(small, targetOccupancy = 2,
      floor = 4) === 32, "k = ceil(n / occupancy) above the floor")
  }

  test("detectFormat reads real magic bytes; byteEntropy is bounded and exact on known input") {
    import graft.operators.Multimodal
    val media = Multimodal.syntheticMediaTable(corpus, "doc_id", "text")
    val rows = media.select(col("meta.format").as("fmt"),
        Multimodal.detectFormat(col("payload")).as("det"),
        Multimodal.byteEntropy(col("payload")).as("ent"))
      .as[(String, String, Double)].collect()
    rows.foreach { case (fmt, det, ent) =>
      assert(det === fmt, "detector must agree with the header it was given")
      assert(ent > 0.0 && ent <= 8.0)
    }
    // hand-check entropy: payload of 4 distinct equi-frequent bytes = 2 bits
    val two = Seq(Tuple1(Array[Byte](1, 2, 3, 4, 1, 2, 3, 4))).toDF("p")
      .select(Multimodal.byteEntropy(col("p"))).as[Double].collect()(0)
    assert(math.abs(two - 2.0) < 1e-12)
    // corrupt header → unknown
    val unk = Seq(Tuple1("plain text".getBytes("UTF-8"))).toDF("p")
      .select(Multimodal.detectFormat(col("p"))).as[String].collect()(0)
    assert(unk === "unknown")
  }

  test("dup clusters: transitive chains collapse to the min id") {
    // chain 0-1-2 (0≈1, 1≈2 but 0 and 2 never paired directly) + 4-5
    val pairs = Seq((0L, 1L), (1L, 2L), (4L, 5L)).toDF("id_a", "id_b")
    val got = Dedup.dupClusters(corpus, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 4L, 5L -> 4L))
  }

  test("connected components converge on a long chain (pointer jumping)") {
    // a 200-node path has diameter 199: pure min-label propagation needs
    // 199 rounds and would exhaust maxIters=25; pointer jumping doubles
    // reach per round and must converge in ~log2(199)+const rounds
    val chain = spark.range(199)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val labels = Dedup.connectedComponents(chain)
      .as[(Long, Long)].collect()
    assert(labels.length == 200)
    assert(labels.forall(_._2 == 0L), "every node joins cluster 0")
  }

  test("LSH bucket cap bounds a degenerate hot bucket") {
    // 50k identical docs → every id lands in one bucket per band. The cap
    // must apply BEFORE per-bucket materialization: the pairing completes
    // with bounded reducer memory and emits exactly C(maxBucket, 2)
    // distinct pairs (the maxBucket smallest ids, identical per band).
    val hot = spark.range(50000).select(col("id").as("doc_id"),
      lit("identical spam content repeated across the whole corpus shard")
        .as("text"))
    val n = Dedup.minhashNearDuplicates(hot, "doc_id", "text",
      shingleWidth = 3, numHashes = 16, bands = 4, threshold = 0.8,
      maxBucket = 32).count()
    assert(n == 32L * 31 / 2, s"expected C(32,2) capped pairs, got $n")
  }

  test("d5 LSH entry recovers exactly the planted near-copy pairs") {
    // the gated entry plants a near-copy (id+100000, cos ≈ 0.997) for
    // vec_ids 0..24; at threshold 0.9 the exact answer is precisely
    // those pairs, and the OR-amplified blocked path must find them all
    // (full recall) and nothing else (precision via cosine verification)
    val lsh = graft.queries.PipelineQueries
      .d5_embedding_lsh(spark, SparkTestSession.sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = (0L until 25L).map(i => (i, i + 100000L)).toSet
    assert(lsh == want, s"missed=${want -- lsh} extra=${lsh -- want}")
  }

  test("ann LSH top-k recall vs brute force on real embeddings") {
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val q = embs.where(col("vec_id") === 0).select("embedding")
      .collect()(0).getSeq[Float](0).map(_.toDouble)
    val brute = Similarity.bruteForceTopK(embs, "vec_id", "embedding", q, 10)
      .select("id").as[Long].collect().toSet
    val ann = Similarity.annTopK(embs, "vec_id", "embedding", q, 10,
      bits = 12, probeRadius = 4).select("id").as[Long].collect().toSet
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall >= 0.5, s"ANN recall $recall too low (got $ann vs $brute)")
  }

  test("ivf ann: probing more clusters raises recall; full probe is exact") {
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val q = embs.where(col("vec_id") === 0).select("embedding")
      .collect()(0).getSeq[Float](0).map(_.toDouble)
    val brute = Similarity.bruteForceTopK(embs, "vec_id", "embedding", q, 10)
      .select("id").as[Long].collect().toSet
    val cents = Similarity.ivfCentroids(embs, "vec_id", "embedding", k = 16)
    def recallAt(nProbe: Int): Double = {
      val got = Similarity.ivfTopK(embs, "vec_id", "embedding", q, 10,
        cents, nProbe).select("id").as[Long].collect().toSet
      (brute & got).size.toDouble / brute.size
    }
    assert(recallAt(16) == 1.0) // probing every cluster ≡ brute force
    val r6 = recallAt(6)
    assert(r6 >= 0.3, s"IVF recall@6 too low: $r6")
    assert(recallAt(16) >= r6)
  }

  test("curation pipeline composes: deterministic, removes planted dups") {
    val r1 = graft.queries.PipelineQueries
      .t4_curation_pipeline(spark, SparkTestSession.sfDir).collect()
    val r2 = graft.queries.PipelineQueries
      .t4_curation_pipeline(spark, SparkTestSession.sfDir).collect()
    assert(r1.sameElements(r2)) // deterministic end to end
    val totalKept = r1.map(_.getAs[Long]("n_docs")).sum
    val totalDocs = Tables.load(spark, SparkTestSession.sfDir, "documents").count()
    assert(totalKept > 0 && totalKept < totalDocs) // filters + dedup removed rows
  }

  test("language id on multilingual samples") {
    val samples = Seq(
      ("en", "the cat sat on the mat and it was happy with this"),
      ("es", "el perro corre por la calle y se sienta en una casa del pueblo"),
      ("de", "der hund läuft auf der straße und das ist nicht ein problem für die stadt"),
      ("fr", "le chien court dans la rue et les enfants sont pour une maison qui est plus grande"),
      ("zh", "这是一个中文句子用来测试语言识别功能的准确性")
    ).toDF("expected", "text")
    val out = samples.withColumn("pred", TextAnalysis.languageId(col("text")))
      .select("expected", "pred").as[(String, String)].collect()
    out.foreach { case (exp, pred) => assert(exp == pred, s"want $exp got $pred") }
  }

  test("quality score orders garbage below clean text") {
    val df = Seq(
      ("clean", "the quick brown fox jumps over the lazy dog and runs through the quiet forest"),
      ("repeat", "spam spam spam spam spam spam spam spam spam spam spam spam"),
      ("punct", "!!! ??? ### $$$ %%% @@@ !!! ??? ### $$$ %%% @@@ ..."),
      ("short", "ok")
    ).toDF("kind", "text")
    val scores = df.select(col("kind"),
        TextAnalysis.qualityScore(col("text")).as("q"))
      .as[(String, Double)].collect().toMap
    assert(scores("clean") > scores("repeat"))
    assert(scores("clean") > scores("punct"))
    assert(scores("clean") > scores("short"))
    assert(scores("clean") > 0.8)
  }

  test("fingerprint sketch stable and content-sensitive") {
    val fp = corpus.select(col("doc_id"),
      TextAnalysis.fingerprintSketch(col("text")).as("fp")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fp(0L) == fp(1L), "identical docs -> identical fingerprints")
    assert(fp(0L) != fp(3L))
    // near dup shares most fingerprint hashes
    assert(fp(0L).toSet.intersect(fp(2L).toSet).size >= 2)
  }

  test("multimodal: stub decode is deterministic, frame sampling bounded") {
    // doc 6 repeats doc 0's text at the same id%3, so its payload
    // (header + text bytes) is byte-identical to doc 0's
    val media = Multimodal.syntheticMediaTable(
      corpus.unionByName(Seq((6L,
        "the quick brown fox jumps over the lazy dog near the river bank today"))
        .toDF("doc_id", "text")),
      "doc_id", "text")
    assert(media.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val f1 = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val f2 = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f1 == f2, "stub codec must be deterministic")
    assert(f1(0L) == f1(6L), "same payload -> same features")
    assert(f1(0L) != f1(3L))
    val frames = Multimodal.sampleFrames(media, 60000, maxFrames = 4)
    val perDoc = frames.groupBy("media_id").count()
      .select("count").as[Long].collect()
    assert(perDoc.forall(_ <= 4))
  }
  test("resize caps metadata dimensions and never touches the payload") {
    val media = Multimodal.syntheticMediaTable(corpus, "doc_id", "text")
    val r = Multimodal.resize(media, 64, 48).collect()
    val orig = media.collect().map(x => x.getLong(0) -> x).toMap
    assert(r.nonEmpty)
    r.foreach { row =>
      val m = row.getStruct(2)
      assert(m.getInt(1) <= 64 && m.getInt(2) <= 48)
      val o = orig(row.getLong(0))
      assert(java.util.Arrays.equals(
        row.getAs[Array[Byte]](1), o.getAs[Array[Byte]](1)),
        "resize is a metadata stage; payload must pass through unchanged")
      assert(m.getString(0) == o.getStruct(2).getString(0))
    }
  }

  test("decode of a recognized-magic but unparseable payload yields None") {
    // png magic + text body: ImageIO selects the PNG reader and throws —
    // the codec must translate that to None, not kill the task
    val media = Multimodal.syntheticMediaTable(corpus, "doc_id", "text")
    val stats = Multimodal.decodeImages(media).collect()
    assert(stats.length == corpus.count())
    stats.foreach { r =>
      assert(r.isNullAt(1) && r.isNullAt(3), "no payload here is decodable")
      assert(r.getLong(4) > 0, "byte count survives undecodable payloads")
    }
  }

  test("BMP encode → javax.imageio decode round-trips every pixel") {
    import graft.operators.Multimodal
    // non-multiple-of-4 widths exercise row padding; the decoded raster
    // must equal the source pixel function exactly, pixel for pixel
    for ((w, h) <- Seq((17, 5), (16, 16), (1, 1), (33, 2))) {
      val bytes = Multimodal.Bmp.encodeGray(w, h,
        (x, y) => Multimodal.fixturePixel(42L, x, y))
      val di = Multimodal.ImageIoCodec.decodeImage(bytes)
        .getOrElse(fail(s"imageio could not decode ${w}x$h BMP"))
      assert(di.width == w && di.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(di.gray(y * w + x) == Multimodal.fixturePixel(42L, x, y),
          s"pixel ($x,$y) of ${w}x$h")
    }
    // a payload no JDK reader accepts falls back to None
    assert(Multimodal.ImageIoCodec.decodeImage("not an image".getBytes).isEmpty)
  }

  test("WAV encode → javax.sound decode round-trips every sample") {
    import graft.operators.Multimodal
    for ((rate, n) <- Seq((8000, 256), (12000, 1), (16000, 352))) {
      val samples = Array.tabulate(n)(i =>
        Multimodal.fixtureSample(7L, i).toShort)
      val bytes = Multimodal.Wav.encodePcm16(rate, samples)
      assert(bytes.length == 44 + 2 * n, "canonical header size")
      val da = Multimodal.JavaSoundCodec.decodeAudio(bytes)
        .getOrElse(fail(s"javax.sound could not decode $rate Hz/$n WAV"))
      assert(da.sampleRate == rate)
      assert(da.samples.toSeq == samples.map(_.toInt).toSeq)
    }
    // extremes of the 16-bit range survive the byte reassembly
    val edge = Array(Short.MinValue, Short.MaxValue, 0.toShort, (-1).toShort)
    val dEdge = Multimodal.JavaSoundCodec
      .decodeAudio(Multimodal.Wav.encodePcm16(8000, edge)).get
    assert(dEdge.samples.toSeq == edge.map(_.toInt).toSeq)
    // payloads no JDK reader accepts (or a recognized-magic corrupt RIFF
    // body) decode to None, never a task-killing exception
    assert(Multimodal.JavaSoundCodec.decodeAudio("not audio".getBytes).isEmpty)
    val corrupt = "RIFF\u0000\u0000\u0000\u0000WAVEjunk".getBytes("US-ASCII")
    assert(Multimodal.JavaSoundCodec.decodeAudio(corrupt).isEmpty)
  }

  test("decodeAudioClips derives stats from decoded PCM") {
    import graft.operators.Multimodal
    val media = Multimodal.syntheticAudioTable(
      spark.range(5).select(col("id").as("doc_id")), "doc_id")
    val stats = Multimodal.decodeAudioClips(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (id <- 0L until 5L) {
      val rate = 8000 + (id % 3).toInt * 4000
      val n = 256 + ((id * 7) % 97).toInt
      val r = stats(id)
      assert(r.getInt(1) == rate && r.getLong(2) == n)
      assert(r.getLong(3) == n * 1000L / rate)
      val sumSq = (0 until n)
        .map(i => { val s = Multimodal.fixtureSample(id, i).toLong; s * s }).sum
      assert(r.getLong(4) == sumSq, s"sum_sq of id=$id")
      assert(r.getDouble(5) == math.sqrt(sumSq.toDouble / n))
      assert(r.getLong(6) == 44L + 2L * n)
    }
    // undecodable payloads keep their byte count with null audio columns
    import spark.implicits._
    val bad = Seq((99L, "noise".getBytes)).toDF("media_id", "payload")
    val br = Multimodal.decodeAudioClips(bad).collect()(0)
    assert(br.isNullAt(1) && br.isNullAt(5) && br.getLong(6) == 5L)
  }

  test("decodeImages and sampleImageRows derive stats from decoded pixels") {
    import graft.operators.Multimodal
    val media = Multimodal.syntheticImageTable(
      spark.range(5).select(col("id").as("doc_id")), "doc_id")
    val stats = Multimodal.decodeImages(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (id <- 0L until 5L) {
      val w = 16 + (id % 17).toInt; val h = 16 + ((id * 7) % 13).toInt
      val r = stats(id)
      assert(r.getInt(1) == w && r.getInt(2) == h)
      val want = (for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.fixturePixel(id, x, y)).map(_.toLong).sum
          .toDouble / (w * h)
      assert(r.getDouble(3) == want, s"mean luminance of id=$id")
    }
    val frames = Multimodal.sampleImageRows(media, everyN = 4, maxFrames = 8)
      .collect()
    assert(frames.nonEmpty)
    frames.foreach { r =>
      val id = r.getLong(0); val y = r.getInt(2)
      val w = 16 + (id % 17).toInt
      val want = (0 until w).map(x => Multimodal.fixturePixel(id, x, y).toLong)
        .sum.toDouble / w
      assert(r.getDouble(3) == want && y == r.getInt(1) * 4)
    }
  }

  test("AVI-DIB encode → RIFF walk → frame decode round-trips every pixel") {
    import graft.operators.Multimodal
    // non-multiple-of-4 widths exercise frame stride padding
    for ((w, h, n) <- Seq((9, 5, 3), (16, 8, 1), (13, 11, 6))) {
      val uspf = 1000000L / 15
      val bytes = Multimodal.Avi.encodeDib(w, h, uspf,
        IndexedSeq.tabulate(n)(f =>
          (x: Int, y: Int) => Multimodal.fixtureVideoPixel(5L, f, x, y)))
      // closed-form container size the oracle relies on
      val stride = (w * 3 + 3) / 4 * 4
      assert(bytes.length == 224 + n * (8 + stride * h), "canonical size")
      val dv = Multimodal.RiffVideoCodec.decodeVideo(bytes)
        .getOrElse(fail(s"could not decode ${w}x$h x$n AVI"))
      assert(dv.width == w && dv.height == h && dv.frames.size == n)
      assert(dv.microSecPerFrame == uspf)
      for (f <- 0 until n; y <- 0 until h; x <- 0 until w)
        assert(dv.frames(f)(y * w + x) ==
          Multimodal.fixtureVideoPixel(5L, f, x, y),
          s"pixel ($x,$y) of frame $f in ${w}x$h")
    }
    // malformed payloads decode to None, never a task-killing exception
    assert(Multimodal.RiffVideoCodec.decodeVideo("not a video".getBytes).isEmpty)
    assert(Multimodal.RiffVideoCodec
      .decodeVideo("RIFF\u0000\u0000\u0000\u0000AVI junk".getBytes).isEmpty)
  }

  test("corrupt media headers decode to None, never task-killing exceptions") {
    import graft.operators.Multimodal
    // WAV declaring sampleRate=0 passes javax.sound's reader but would
    // divide-by-zero in duration/RMS math — must be rejected up front
    val wav = Multimodal.Wav.encodePcm16(8000, Array[Short](1, 2, 3))
    val rate0 = wav.clone()
    java.nio.ByteBuffer.wrap(rate0).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(24, 0) // fmt chunk sample-rate field
    assert(Multimodal.JavaSoundCodec.decodeAudio(rate0).isEmpty)
    // AVI whose strf declares 65536x32769: stride*h and w*h overflow Int
    // (the old guards passed and the allocation threw); must be None
    val avi = Multimodal.Avi.encodeDib(8, 8, 100000L,
      IndexedSeq((_: Int, _: Int) => 7))
    val bigDims = avi.clone()
    java.nio.ByteBuffer.wrap(bigDims).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(176, 65536).putInt(180, 32769) // strf biWidth / biHeight
    assert(Multimodal.RiffVideoCodec.decodeVideo(bigDims).isEmpty)
    // chunk size near Int.MaxValue must fail bounds, not wrap negative
    // into a ~2 GB copyOfRange
    val hugeChunk = avi.clone()
    java.nio.ByteBuffer.wrap(hugeChunk).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(228, 0x7FFFFFF0) // movi frame chunk size field
    assert(Multimodal.RiffVideoCodec.decodeVideo(hugeChunk).isEmpty)
    // an audio stream's strf after the video one must not clobber dims:
    // decode still succeeds with the video raster geometry
    val dv = Multimodal.RiffVideoCodec.decodeVideo(avi).get
    assert(dv.width == 8 && dv.height == 8 && dv.frames.size == 1)
  }

  test("detectFormat recognizes AVI containers from magic bytes") {
    import graft.operators.Multimodal
    val media = Multimodal.syntheticVideoTable(
      spark.range(3).select(col("id").as("doc_id")), "doc_id")
    val fmts = media
      .select(Multimodal.detectFormat(col("payload")).as("f"))
      .collect().map(_.getString(0)).toSet
    assert(fmts == Set("avi"), s"detected $fmts")
  }

  test("AVI-MJPEG frames decode through imageio within JPEG tolerance") {
    import graft.operators.Multimodal
    // flat-luminance frames: JPEG is lossy but near-exact on constants
    val levels = IndexedSeq(40, 128, 220)
    val bytes = Multimodal.Avi.encodeMjpeg(16, 16, 1000000L / 10,
      levels.map(l => (_: Int, _: Int) => l))
    val dv = Multimodal.RiffVideoCodec.decodeVideo(bytes)
      .getOrElse(fail("could not decode MJPEG AVI"))
    assert(dv.width == 16 && dv.height == 16 && dv.frames.size == 3)
    for ((l, f) <- levels.zipWithIndex) {
      val mean = dv.frames(f).map(_.toLong).sum.toDouble / dv.frames(f).length
      assert(math.abs(mean - l) <= 4.0,
        s"frame $f mean $mean vs source level $l")
    }
  }

  test("decodeVideos and sampleVideoFrames derive stats from decoded frames") {
    import graft.operators.Multimodal
    val media = Multimodal.syntheticVideoTable(
      spark.range(5).select(col("id").as("doc_id")), "doc_id")
    val stats = Multimodal.decodeVideos(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (id <- 0L until 5L) {
      val w = 8 + (id % 13).toInt; val h = 8 + ((id * 3) % 11).toInt
      val n = 3 + (id % 4).toInt
      val uspf = 1000000L / (10 + (id % 3).toInt * 5)
      val r = stats(id)
      assert(r.getInt(1) == w && r.getInt(2) == h && r.getInt(3) == n)
      assert(r.getLong(4) == n * uspf / 1000L)
      val want = (for (f <- 0 until n; y <- 0 until h; x <- 0 until w)
        yield Multimodal.fixtureVideoPixel(id, f, x, y).toLong).sum
          .toDouble / (n.toLong * w * h)
      assert(r.getDouble(5) == want, s"mean luminance of id=$id")
    }
    val frames = Multimodal.sampleVideoFrames(media, everyN = 2, maxFrames = 4)
      .collect()
    assert(frames.nonEmpty)
    frames.foreach { r =>
      val id = r.getLong(0); val idx = r.getInt(1)
      val w = 8 + (id % 13).toInt; val h = 8 + ((id * 3) % 11).toInt
      val uspf = 1000000L / (10 + (id % 3).toInt * 5)
      val f = idx * 2
      assert(r.getLong(2) == f * uspf / 1000L)
      val want = (for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.fixtureVideoPixel(id, f, x, y).toLong).sum
          .toDouble / (w.toLong * h)
      assert(r.getDouble(3) == want, s"frame $f mean of id=$id")
    }
    // undecodable payloads keep their byte count with null video columns
    import spark.implicits._
    val bad = Seq((99L, "noise".getBytes)).toDF("media_id", "payload")
    val br = Multimodal.decodeVideos(bad).collect()(0)
    assert(br.isNullAt(1) && br.isNullAt(5) && br.getLong(6) == 5L)
  }

  test("lmScore: reference-like text scores below out-of-distribution text") {
    import spark.implicits._
    val ref = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the dog sleeps near the quiet river all day"),
      (2L, "a fox and a dog play near the river")).toDF("doc_id", "text")
    val scored = Seq(
      (10L, "the fox jumps over the dog"), // in-distribution
      (11L, "zx9 qw7 blorp vmme kkjq zzt")) // all-OOV garbage
      .toDF("doc_id", "text")
    val m = graft.operators.TextAnalysis
      .lmScore(scored, "doc_id", "text", ref, "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(m(10L) < m(11L),
      s"in-distribution ${m(10L)} must score below OOV ${m(11L)}")
    // all-OOV: every token hits the same add-one floor -ln(1/(N+V))
    val nTotal = 27.0 // tokens in ref (9 + 9 + 9)
    val vocab = ref.select(explode(graft.operators.TextAnalysis
      .tokens(org.apache.spark.sql.functions.col("text")))).distinct().count()
    val floor = -math.log(1.0 / (nTotal + vocab))
    assert(math.abs(m(11L) - floor) < 1e-6,
      s"OOV doc should sit at the smoothing floor $floor, got ${m(11L)}")
  }

  test("lmScore / bigramLmScore: compiled plan-constant path is " +
    "value-identical to the explode+join fallback (gate seam)") {
    import spark.implicits._
    val ref = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the dog sleeps near the quiet river all day"),
      (2L, "a fox and a dog play near the river")).toDF("doc_id", "text")
    val scored = Seq(
      (10L, "the fox jumps over the dog and the dog jumps back"),
      (11L, "zx9 qw7 blorp vmme kkjq zzt"),
      (12L, "one"), // single token: no bigram evidence, drops from t18
      (13L, "near the river the fox sleeps"),
      (14L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val ta = graft.operators.TextAnalysis
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().map(_.toSeq).toSeq
    // exact equality, not approx: both paths must produce the SAME
    // round-9/round-6 doubles or the verify hash compare would split
    assert(rows(ta.lmScoreGated(scored, "doc_id", "text", ref, "text",
        gate = 1 << 17)) ==
      rows(ta.lmScoreGated(scored, "doc_id", "text", ref, "text",
        gate = 0)))
    assert(rows(ta.bigramLmScoreGated(scored, "doc_id", "text", ref,
        "text", lambda = 0.5, gate = 1 << 17)) ==
      rows(ta.bigramLmScoreGated(scored, "doc_id", "text", ref, "text",
        lambda = 0.5, gate = 0)))
    // and an asymmetric lambda to catch a swapped interpolation term
    assert(rows(ta.bigramLmScoreGated(scored, "doc_id", "text", ref,
        "text", lambda = 0.7, gate = 1 << 17)) ==
      rows(ta.bigramLmScoreGated(scored, "doc_id", "text", ref, "text",
        lambda = 0.7, gate = 0)))
  }

  test("dsirScore: compiled plan-constant path is value-identical to " +
    "the explode+join fallback (gate seam)") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "en", "the quick brown fox jumps over the lazy dog"),
      (1L, "en", "the dog sleeps near the quiet river all day"),
      (2L, "de", "der schnelle braune fuchs springt über den faulen hund"),
      (3L, "de", "the dog und the fox"), // cross-lang shared tokens
      (4L, "fr", "le renard brun rapide saute"),
      (5L, "en", null.asInstanceOf[String])) // null text drops out
      .toDF("doc_id", "lang", "text")
    val ta = graft.operators.TextAnalysis
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().map(_.toSeq).toSeq
    val compiled = rows(ta.dsirScoreGated(corpus, "doc_id", "text",
      "lang", "en", gate = 1 << 17))
    val joined = rows(ta.dsirScoreGated(corpus, "doc_id", "text",
      "lang", "en", gate = 0))
    // exact equality: both paths must round the same doubles to the
    // same nano-longs or the verify hash compare would split
    assert(compiled == joined)
    assert(compiled.map(_.head) == Seq(0L, 1L, 2L, 3L, 4L)) // 5L absent
    // target-language docs must outscore the pure-foreign doc
    val score = compiled.map(r => r.head.asInstanceOf[Long] ->
      r(3).asInstanceOf[Long]).toMap
    assert(score(0L) > score(4L) && score(1L) > score(4L))
  }

  test("tokenDrift: exact integer drift numerator ranks vocabulary " +
    "divergence; null labels count in neither slice") {
    import spark.implicits._
    val corpus = Seq(
      ("en", "alpha alpha shared"),
      ("en", "alpha shared"),
      ("de", "beta beta shared"),
      ("de", "beta shared"),
      (null.asInstanceOf[String], "ghost shared"),
      ("en", null.asInstanceOf[String])) // null text drops out
      .toDF("lang", "text")
    val out = graft.operators.TextAnalysis
      .tokenDrift(corpus, "text", col("lang") === "en")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // slice A (en): alpha x3, shared x2  (N_a = 5)
    // slice B (de): beta x3, shared x2   (N_b = 5)
    // ghost rows have a null label: counted in NEITHER slice
    assert(out("alpha") == ((3L, 0L, 15L)))  // |3*5 - 0*5|
    assert(out("beta") == ((0L, 3L, 15L)))
    assert(out("shared") == ((2L, 2L, 0L)))  // identical frequency
    assert(out("ghost") == ((0L, 0L, 0L)))
  }

  test("chunkByTokens: windows tile the token stream with the overlap") {
    import spark.implicits._
    val text = (1 to 75).map(i => s"w$i").mkString(" ")
    val out = graft.operators.TextAnalysis.chunkByTokens(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
        width = 32, overlap = 8)
      .orderBy("chunk_idx")
      .collect()
    // starts 0, 24, 48; start 72 >= 75-8 is a pure suffix and is dropped
    assert(out.length === 3)
    val chunks = out.map(_.getString(2).split(" ").toSeq)
    assert(chunks(0) === (1 to 32).map(i => s"w$i"))
    assert(chunks(1) === (25 to 56).map(i => s"w$i"))
    assert(chunks(2) === (49 to 75).map(i => s"w$i"))
    assert(out.map(_.getLong(3)).toSeq === Seq(32L, 32L, 27L))
    // overlap: each window re-reads the previous window's last 8 tokens
    assert(chunks(0).takeRight(8) === chunks(1).take(8))
  }

  test("chunkByTokens: short document yields exactly one full-copy chunk") {
    import spark.implicits._
    val out = graft.operators.TextAnalysis.chunkByTokens(
        Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", "text",
        width = 32, overlap = 8)
      .collect()
    assert(out.length === 1)
    assert(out.head.getString(2) === "a b c")
    assert(out.head.getLong(3) === 3L)
  }

  test("tfidf: hand-computed scores on a 3-doc corpus") {
    import spark.implicits._
    // N=3; df: a->2, b->2, c->1, d->1; idf(a)=idf(b)=ln 1.5, idf(c)=idf(d)=ln 3
    //   doc 0 "a a b":   (2/3)ln1.5 + (1/3)ln1.5 = ln 1.5      = 0.405465
    //   doc 1 "a c":     (1/2)ln1.5 + (1/2)ln3                 = 0.752039
    //   doc 2 "b b b d": (3/4)ln1.5 + (1/4)ln3                 = 0.578752
    val out = TextAnalysis.tfidf(
        Seq((0L, "a a b"), (1L, "a c"), (2L, "b b b d"))
          .toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("id").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(3L, 2L, 4L))
    assert(out.map(_.getDouble(2)).toSeq === Seq(0.405465, 0.752039, 0.578752))
  }

  test("containmentJoin and crossContainmentJoin find the embedded quote " +
      "with full recall; intersectCountSorted matches array_intersect") {
    import spark.implicits._
    val quote = "the quick brown fox jumps over the lazy dog by the river"
    val d = Seq(
      (0L, quote), // fully contained in 1
      (1L, quote + " and then continues with much longer original prose " +
        "about training data pipelines at corpus scale with many words"),
      (2L, "completely unrelated document concerning database internals")
    ).toDF("doc_id", "text")
    val self = Dedup.containmentJoin(d, "doc_id", "text", n = 4,
        threshold = 0.9)
      .select("contained_id", "container_id").as[(Long, Long)]
      .collect().toSet
    assert(self.contains((0L, 1L)), s"quote not found: $self")
    assert(!self.contains((2L, 0L)) && !self.contains((2L, 1L)))
    // directional: batch = doc 0 only, corpus = all; same pair, one side
    val cross = Dedup.crossContainmentJoin(
        d.where(col("doc_id") === 0), d, "doc_id", "text",
        n = 4, threshold = 0.9)
      .select("contained_id", "container_id").as[(Long, Long)]
      .collect().toSet
    assert(cross === Set((0L, 1L)))
    // the codegen count-merge equals array_intersect size on sorted input
    import graft.functions.SketchExpressions
    val eq = Seq((0L, 1L)).toDF("x", "y")
      .select(
        SketchExpressions.charNgramHashes(lit(quote), 4).as("a"),
        SketchExpressions.charNgramHashes(lit(quote + " more"), 4).as("b"))
      .select(
        SketchExpressions.intersectCountSorted(col("a"), col("b")).as("m"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .collect()(0)
    assert(eq.getLong(0) === eq.getLong(1))
  }

  test("audioFingerprint: known energy profile, noise invariance, " +
      "distinct groups") {
    import spark.implicits._
    // 4 frames: quiet, loud, quiet, loud at amplitudes 100/1000
    val samples = Array.tabulate(1024) { i =>
      val amp = if ((i / 256) % 2 == 1) 1000 else 100
      (amp * (1 - 2 * (i % 2))).toShort
    }
    val wav = Multimodal.Wav.encodePcm16(8000, samples)
    val fp = Multimodal.audioFingerprint(
        Seq((1L, wav)).toDF("media_id", "payload"))
      .collect()(0).getString(1)
    assert(fp === "0101")
    // near-dup fixture: triples share a fingerprint, groups differ
    val media = Multimodal.syntheticNearDupAudioTable(
      spark.range(12).toDF("doc_id"), "doc_id")
    val fps = Multimodal.audioFingerprint(media)
      .orderBy("media_id").collect().map(_.getString(1))
    assert(fps.forall(_.length == 8))
    assert(fps.grouped(3).forall(g => g.distinct.length == 1),
      "triples share a fingerprint")
    assert(fps.grouped(3).map(_.head).toSeq.distinct.length == 4,
      "distinct groups differ")
  }

  test("imageAHash: known bit pattern, noise invariance, distinct groups") {
    import spark.implicits._
    // left half dark (10), right half bright (240): bits = 4 zeros then
    // 4 ones per block row
    val half = Multimodal.Bmp.encodeGray(32, 32,
      (x, _) => if (x < 16) 10 else 240)
    val hh = Multimodal.imageAHash(
        Seq((1L, half)).toDF("media_id", "payload"))
      .collect()(0).getString(1)
    assert(hh === "00001111" * 8)
    // the near-dup fixture: variants of a group hash identically,
    // different groups differently
    val media = Multimodal.syntheticNearDupImageTable(
      spark.range(12).toDF("doc_id"), "doc_id")
    val hs = Multimodal.imageAHash(media)
      .orderBy("media_id").collect().map(_.getString(1))
    assert(hs.grouped(3).forall(g => g.distinct.length == 1),
      "triples share a hash")
    assert(hs.grouped(3).map(_.head).toSeq.distinct.length == 4,
      "distinct groups differ")
  }

  test("c4LineClean: each rule drops exactly its violating line") {
    import spark.implicits._
    val text = Seq(
      "this line has enough words to survive.",  // keep
      "{ json spill }",                          // brace rule
      "Lorem Ipsum dolor sit amet forever.",     // boilerplate (ci)
      "too short.",                              // min-words
      "five words but no punctuation here",      // terminal punct
      "and a final proper sentence ends here!"   // keep
    ).mkString("\n")
    val out = graft.operators.TextAnalysis
      .c4LineClean(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .head()
    assert(out.getLong(1) === 6L && out.getLong(2) === 2L)
    assert(out.getString(3) ===
      "this line has enough words to survive.\n" +
      "and a final proper sentence ends here!")
    // null text behaves as one empty (dropped) line, document retained
    val nullOut = graft.operators.TextAnalysis
      .c4LineClean(Seq((2L, null: String)).toDF("doc_id", "text"),
        "doc_id", "text").head()
    assert(nullOut.getLong(1) === 1L && nullOut.getLong(2) === 0L)
  }

  test("damaged-image fixture plants exact 1/1/2 hamming triples and " +
      "the banded join recovers them with exact distances") {
    import spark.implicits._
    val media = Multimodal.syntheticDamagedImageTable(
      spark.range(12).toDF("doc_id"), "doc_id")
    val packed = Multimodal.imageAHash(media)
      .withColumn("sh", org.apache.spark.sql.functions.expr(
        "aggregate(sequence(0, 63), 0L, (acc, i) -> acc | " +
          "IF(substring(ahash, i + 1, 1) = '1', shiftleft(1L, i), 0L))"))
    val pairs = Dedup.hammingNearDuplicates64(
        packed, "media_id", "sh", maxHamming = 2)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // per triple (3k, 3k+1, 3k+2): damage-free vs damaged at 1, the two
    // damaged variants at 2; nothing across triples
    val expected = (0 until 4).flatMap { k =>
      val b = k * 3L
      Seq((b, b + 1, 1), (b, b + 2, 1), (b + 1, b + 2, 2))
    }
    assert(pairs.toSeq === expected)
  }

  test("duplicatedSubstringSpans: planted cross-doc run, interval merge, " +
      "short docs, within-doc repeats excluded") {
    import spark.implicits._
    val shared = "0123456789abcdefghijklmnopqrstuvwxyzABCD" // 40 chars
    val u = "qwertyuiopasdfghjklzxcvbnm1234" // 30 chars, doc-14-only
    val d = Seq(
      (10L, "XX" + shared + "YY"), // shared run at [2, 42)
      (11L, shared + " tail words all distinct here padding"),
      (12L, "totally distinct content with no common windows anywhere!!"),
      (13L, "short doc"), // < 30 chars
      (14L, u + "-" + u) // repeats only WITHIN itself → not a dup
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSubstringSpans(d, "doc_id", "text", 30)
      .orderBy("id").collect()
    // (id, doc_len, n_dup_spans, dup_chars)
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq === Seq(
      (10L, 44L, 1L, 40L), // seeds 2..12 merge to [2, 42): 40 chars
      (11L, 77L, 1L, 40L), // seeds 0..10 merge to [0, 40)
      (12L, 58L, 0L, 0L),
      (13L, 9L, 0L, 0L),
      (14L, 61L, 0L, 0L)))
  }

  test("logTemplate masks in rule order: uuid before hex, ip before num") {
    import spark.implicits._
    val masked = Seq(
      "GET /u/123 from 10.1.2.3 req=deadbeefcafe id=3f2a8b1c-0000-4d5e-8f00-a1b2c3d4e5f6",
      "retry 7 of 10", // bare numbers only
      "hex run 0123456789ab tail", // exactly 12 hex chars
      "short hex 0123456789a stays" // 11 chars: below the hex floor
    ).toDF("msg").select(TextAnalysis.logTemplate(col("msg")).as("t"))
      .as[String].collect().toSeq
    assert(masked == Seq(
      "GET /u/<num> from <ip> req=<hex> id=<uuid>",
      "retry <num> of <num>",
      "hex run <hex> tail",
      "short hex <num>a stays"))
  }

  test("logTemplates groups by template with deterministic min example") {
    import spark.implicits._
    val df = Seq("boot in 5ms", "boot in 17ms", "halt code 9")
      .toDF("msg")
    val out = TextAnalysis.logTemplates(df, col("msg"))
      .orderBy("template").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(out == Seq(
      ("boot in <num>ms", 2L, "boot in 17ms"),
      ("halt code <num>", 1L, "halt code 9")))
  }

  test("decontaminate flags exactly the train docs sharing a w-shingle " +
    "with the eval corpus, counting distinct overlaps") {
    // eval doc 0; train: 1 = exact dup (every shingle shared), 2 = near
    // dup (prefix shingles shared), 3/4 = clean, 5 = near dup with an
    // earlier edit (fewer shared shingles than 2)
    val ev = corpus.where(col("doc_id") === 0L)
    val tr = corpus.where(col("doc_id") =!= 0L)
    val got = Dedup.decontaminate(tr, "doc_id", "text", ev, "text", w = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc0 has 14 tokens -> 7 distinct 8-shingles
    assert(got(1L) == 7L) // exact dup: all 7
    // doc2 changes the LAST token: offsets 0..5 avoid it -> 6 shared
    assert(got(2L) == 6L)
    // doc5 changes "jumps" (token index 4): shingle offset i covers
    // tokens i..i+7, so offsets 0..4 all contain the edit; offsets 5
    // and 6 survive -> 2 shared
    assert(got(5L) == 2L)
    assert(!got.contains(3L) && !got.contains(4L))
    // a doc shorter than w contributes its truncated shingle: an exact
    // short dup in both corpora is flagged with one hit
    val shortEv = Seq((10L, "tiny text")).toDF("doc_id", "text")
    val shortTr = Seq((11L, "tiny text"), (12L, "other words"))
      .toDF("doc_id", "text")
    val short = Dedup.decontaminate(shortTr, "doc_id", "text",
        shortEv, "text", w = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(short == Map(11L -> 1L))
  }
}
