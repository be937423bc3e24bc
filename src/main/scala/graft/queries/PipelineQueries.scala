package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{HeavyHitters, TextNormalize}
import graft.operators.{Dedup, Graphs, Multimodal, Retrieval, Sampling, Similarity, Splits, TextAnalysis}

/** Training-data pipeline operators (dedup / similarity / text analysis /
  * multimodal) exposed over the `documents` and `embeddings` tables.
  *
  * Oracle-checked where DuckDB can express the same deterministic
  * computation (exact dedup, n-gram Jaccard, cosine top-k, token counts);
  * sketch-based operators (MinHash/SimHash/LSH buckets) are rows-only here
  * and property-tested in DedupSpec with planted near-duplicates.
  */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** documents source for per-row-CPU-heavy entries (profile, BPE
    * encode, PII scan, tf-idf, Gopher rules, line cleaning): the
    * sandbox corpus is ONE parquet split, so a tokenize-everything
    * pass otherwise runs on one core — 350-700 ms of single-task wall
    * per entry at sf0.1 (StageProfile, r14). Spread is the identity at
    * scale, where the scan already carries more splits than cores
    * (Dedup.spreadIfUnderParallel's stats gate). NOT used by entries
    * whose plan contract pins text-free exchanges (t13/t15/p16 — their
    * compiled map-only shapes are the point). */
  private def docsSpread(s: SparkSession, dir: String): DataFrame =
    Dedup.spreadIfUnderParallel(docs(s, dir))

  /** orderBy with a materialization barrier for MAP-HEAVY plans: a
    * global sort's range partitioner SAMPLES its child, and when
    * nothing below the sort is an exchange the sampling job re-executes
    * the whole pipeline — for per-row-expensive map work (regex packs,
    * tokenize-everything profiles, media decode) that runs the entry
    * 2-3× (measured r13 at sf10: t19_gopher_rules spent 3 × ~35 core-s
    * passes for one answer). A round-robin repartition materializes the
    * NARROW result rows once (5-8 MB at sf10); the sampler and the
    * range exchange then read shuffle files. Gated on the plan-stats
    * estimate of the SOURCE the map work scans: below the gate (one
    * local job floor ≈ the whole query) the plain orderBy is cheaper.
    * On a cluster the gate is effectively always open for these
    * entries, which is right — the barrier trades one narrow exchange
    * for a full re-execution of the expensive pass. */
  private def sortedBarrier(source: DataFrame, out: DataFrame,
      cols: String*): DataFrame = {
    val big = Dedup.statsBytes(source).exists(_ > (64L << 20))
    val base = if (big)
      out.repartition(source.sparkSession.sessionState
        .conf.numShufflePartitions)
    else out
    base.orderBy(cols.map(col): _*)
  }

  // ------------------------------------------------------------- dedup

  // exact dedup group summary (hash-groupBy; shuffle carries hashes only)
  def d1_dedup_exact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(docs(s, dir), "doc_id", "text")
      .select(col("keep_id"), col("n_dups"))
      .orderBy("keep_id")

  // exact dedup surviving rows
  def d1_dedup_exact_rows(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(docs(s, dir), "doc_id", Seq("text"))
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  // MinHash+LSH near-dup pairs, oracle-gated like d4: every emitted pair
  // is exact-Jaccard-verified (precision 1 by construction), and the
  // corpus's true pairs sit at J >= 0.9 where the r=8/b=16 banding miss
  // probability is ~1e-4 — with a FIXED hash family the band keys are
  // deterministic, so recall here is a reproducible fact, not a per-run
  // gamble. The oracle brute-forces word-3-shingle Jaccard; the hashed
  // shingle sets preserve distinct counts barring 64-bit collisions.
  def d2_minhash_lsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDuplicates(docs(s, dir), "doc_id", "text",
        shingleWidth = 3, numHashes = 128, bands = 16, threshold = 0.8)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_a", "id_b")

  // SimHash near-dup pairs, self-gated with planted known answers so the
  // whole tokenize → simhash → pigeonhole-band → bucket-join → verify
  // path is oracle-checkable. Each doc_id < 25 gets TWO planted twins:
  //   +100000: the identical text        → same token multiset → hamming 0
  //   +200000: text || ' ' || text       → every token count doubled; a
  //            64-bit SimHash bit is sign(sum of per-token ±1 weights),
  //            and doubling all counts scales every sum by 2, which
  //            preserves its sign class — so hamming 0 PROVABLY, on a
  //            document that is NOT byte-identical (this distinguishes a
  //            real content simhash from a text-equality hash).
  // The pigeonhole banding has full recall at hamming <= maxHamming, so
  // all 3 pairs per family MUST surface. Output restricts to same-family
  // pairs (ids congruent mod 100000 — organic ids are < 100000 and can
  // never differ by a multiple of it), giving the analytic 75-row oracle:
  // {(i, i+1e5, 0), (i, i+2e5, 0), (i+1e5, i+2e5, 0) | i < 25}. Organic
  // pair determinism stays asserted in DedupSpec.
  def d3_simhash(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    // planted-family offset: the smallest power of 10 strictly above
    // every organic id (min 1e5, the historical value for the small
    // SFs), so planted ids never collide with organic ones and the
    // mod-offset congruence admits no organic pair AT ANY SCALE — a
    // d-digit max id is always < 10^d, so 10^digits is strictly greater
    // (the fixed 1e5 offset failed loudly at the sf1 soak's 904999 max).
    // The oracle derives the identical offset in SQL.
    val maxId = d.agg(max(col("doc_id"))).head().getLong(0)
    val off = math.max(100000L,
      BigInt(10).pow(maxId.toString.length).toLong)
    val base = d.where(col("doc_id") < 25)
    val fam1 = base.select((col("doc_id") + off).as("doc_id"), col("text"))
    val fam2 = base.select((col("doc_id") + 2 * off).as("doc_id"),
      concat(col("text"), lit(" "), col("text")).as("text"))
    Dedup.simhashNearDuplicates(d.union(fam1).union(fam2),
        "doc_id", "text", maxHamming = 3)
      .where(pmod(col("id_a"), lit(off)) === pmod(col("id_b"), lit(off)))
      .orderBy("id_a", "id_b")
  }

  // exact n-gram Jaccard near-dup pairs over the WHOLE table: LSH-banded
  // candidate generation + exact jaccardSorted verification — no blocking
  // column, no corpus-sized block anywhere in the plan. The oracle
  // brute-forces all pairs; equivalence holds because the corpus's
  // near-dup pairs sit far above the threshold (J >= 0.94, where the
  // r=8/b=16 LSH miss probability is < 1e-4). For Zipfian corpora where
  // provable full recall matters, Dedup.jaccardSimilarityJoin is the
  // prefix-filtered exact alternative (spec-tested equal to brute force);
  // this corpus's flat 985-gram vocabulary (every gram in ~900 of 5000
  // docs) leaves prefix filtering nothing rare to index.
  def d4_ngram_jaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardLsh(docs(s, dir), "doc_id", "text",
        n = 4, numHashes = 128, bands = 16, threshold = 0.8)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_a", "id_b")

  // d11: directional containment pairs — the asymmetric near-dup
  // relation (short doc quoted inside a long one) that Jaccard cannot
  // see; prefix-filtered contained side ⋈ full inverted index, exact
  // verify. Oracle replays distinct char-4-grams and |∩|/|A| directly.
  def d11_containment(s: SparkSession, dir: String): DataFrame = {
    // directional batch-vs-corpus (the scale path): candidates scale
    // with |batch|·df, not |corpus|² — on this saturated gram space the
    // symmetric self-join twin is inherently ~n² (every doc pair shares
    // rare grams) and benches accordingly
    val d = docs(s, dir)
    Dedup.crossContainmentJoin(d.where(col("doc_id") < 250), d,
        "doc_id", "text", n = 4, threshold = 0.9)
      .select(col("contained_id"), col("container_id"),
        round(col("containment"), 6).as("containment"))
      .orderBy("contained_id", "container_id")
  }

  // embedding cosine near-dup pairs, exact all-pairs (the synthetic
  // embeddings are near-orthogonal — 0.4 marks the "most similar" tail)
  def d5_embedding_neardup(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDuplicates(embs(s, dir), "vec_id", "embedding",
        threshold = 0.4, lshBits = 0)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
      .orderBy("id_a", "id_b")

  // transitive dedup clusters: connected components over the exact
  // n-gram-Jaccard pair list; every doc gets the smallest doc_id
  // reachable through the near-dup graph (isolated docs → themselves).
  // Deterministic end-to-end → oracle via a recursive-CTE closure.
  def d6_dup_clusters(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val pairs = Dedup.ngramJaccardLsh(d, "doc_id", "text",
        n = 4, numHashes = 128, bands = 16, threshold = 0.8)
      .select("id_a", "id_b")
    Dedup.dupClusters(d, "doc_id", pairs).orderBy("doc_id")
  }

  // embedding near-dup through the hyperplane-LSH blocked path — the
  // scale path (candidate pairs restricted to colliding buckets, never
  // all-pairs), self-gated with a planted known answer: each of
  // vec_ids 0..24 gets a deterministic near-copy (id+100000) at cosine
  // ≈ 0.997, so the exact pair set at threshold 0.9 is exactly those 25
  // pairs (organic pairs top out near 0.52). The 4-table × 8-bit
  // OR-amplified blocking must recover every planted pair — a missed
  // collision drops a row and fails the oracle hash. Precision is
  // structural: candidates are exact-cosine-verified before emission.
  /** The corpus ∪ 25 planted near-twins: each of vec_ids 0..24 gets a
    * deterministic near-copy (id + 100000) at cosine ≈ 0.997 — the
    * known answer the d5/s16 LSH gates must recover. Two selects: the
    * perturbation is seeded by the SOURCE id, and a single select
    * aliasing "vec_id" would lateral-resolve the seed to the new id
    * instead of the input column. Any change here must be mirrored in
    * the d5_embedding_lsh / s16_knn_graph_lsh oracle SQL. */
  private def withPlantedTwins(s: SparkSession, dir: String): DataFrame =
    withPlantedTwinsAt(s, dir, 100000L)

  /** Same planting at a caller-chosen id offset. The autoBits twins
    * (s33/d19/s34) run in the sf1 soak, whose ten copies occupy vec_ids
    * up to ~1e6 (`vec_id + copy·1e5` in tools/gen_sf1.py) — the default
    * 1e5 offset collides with copy 1 there, so they plant at 1e7. */
  private def withPlantedTwinsAt(s: SparkSession, dir: String,
      offset: Long): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val planted = e.where(col("vec_id") < 25)
      .select(col("vec_id").as("src_id"),
        perturbedVec(col("embedding"), col("vec_id")).as("embedding"))
      .select((col("src_id") + offset).as("vec_id"), col("embedding"))
    e.unionByName(planted)
  }

  def d5_embedding_lsh(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDuplicates(withPlantedTwins(s, dir), "vec_id",
        "embedding", threshold = 0.9, lshBits = 8, lshTables = 4)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
      .orderBy("id_a", "id_b")

  // d10: transitive clusters on a HIGH-DIAMETER graph via the
  // large-star/small-star algorithm (Kiveris et al. 2014) — the planted
  // edge set is chains of 50 consecutive doc_ids, the worst case for
  // per-round label propagation (diameter = chain length) and exactly
  // the regime the edge-rewriting algorithm exists for. Cluster = chain
  // head, a closed form the oracle computes arithmetically.
  def d10_chain_clusters(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"))
    val pairs = d.where(pmod(col("doc_id") + 1, lit(50)) =!= 0)
      .select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
      .join(d.select(col("doc_id").as("id_b")), Seq("id_b")) // extant nodes only
    val comps = Dedup.connectedComponentsStar(pairs)
      .withColumnRenamed("id", "doc_id")
    d.join(comps, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      .orderBy("doc_id")
  }

  // d7: incremental dedup of a "daily batch" against a historical corpus
  // through the Bloom-routed exact path. History = doc_id < 250; the
  // batch = doc_id >= 250 plus PLANTED copies of 50 historical texts
  // (re-keyed to doc_id + 10000) so the duplicate path has real work.
  // The result is exact (Bloom false positives are anti-join-verified),
  // so the oracle is a plain NOT EXISTS on text.
  def d7_incremental_dedup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val history = d.where(col("doc_id") < 250)
    val batch = d.where(col("doc_id") >= 250)
      .unionByName(d.where(col("doc_id") < 50)
        .withColumn("doc_id", col("doc_id") + 10000))
    Dedup.incrementalNew(batch, history, Seq("text"),
        expectedItems = 1L << 17, bloomBytes = d7BloomFor(s, dir))
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")
  }

  // d9: cross-corpus near-dup — the daily batch (doc_id >= 250) checked
  // for near-duplicates against history (doc_id < 250) through the
  // banded-LSH candidate join + exact verification. Oracle-gated on the
  // same recall fact as d2 (cross pairs sit at J >= 0.9).
  def d9_incremental_neardup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Dedup.crossNearDuplicates(
        d.where(col("doc_id") >= 250), d.where(col("doc_id") < 250),
        "doc_id", "text", shingleWidth = 3, numHashes = 128, bands = 16,
        threshold = 0.8)
      .select(col("id_new"), col("id_hist"),
        round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_new", "id_hist")
  }

  /** d16's persisted MinHash index: the history corpus's shingle sets +
    * signatures written ONCE as a parquet table (per sf dir, rebuilt
    * per process like every ingest artifact). In production this is an
    * offline index maintained beside the corpus — re-minhashing 100 TB
    * of history per daily batch is the cost it avoids. */
  private val sigStores =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def sigStoreDir(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent(dir, { d =>
      val out = graft.Tables.tmpDirFor("graft_sigstore", d)
      val sets = docs(s, d).where(col("doc_id") < 250)
        .select(col("doc_id").as("id"),
          graft.functions.SketchExpressions
            .wordShingleHashes(Dedup.tokens(col("text")), 3).as("set"))
      sets.select(col("id"), col("set"),
          Dedup.minhashSignature(col("set"), 128).as("sig"))
        .write.mode("overwrite").parquet(out)
      out
    })

  // d16: d9's incremental near-dup THROUGH the persisted signature
  // store — the batch side computes its own shingles/signatures, the
  // history side reads (id, set, sig) from the index table and never
  // touches text. Same answer as d9 by construction (the store carries
  // the identical deterministic hashes), which is exactly the property
  // that makes the index trustworthy; the oracle is d9's.
  def d16_signature_store(s: SparkSession, dir: String): DataFrame = {
    val store = s.read.parquet(sigStoreDir(s, dir))
    Dedup.crossNearDuplicatesFromStore(
        docs(s, dir).where(col("doc_id") >= 250), store,
        "doc_id", "text", shingleWidth = 3, numHashes = 128, bands = 16,
        threshold = 0.8)
      .select(col("id_new"), col("id_hist"),
        round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_new", "id_hist")
  }

  // d8: C4-style repeated-span removal — 10-token spans, first global
  // occurrence (by doc_id, span index) survives, documents reassembled
  // from surviving spans. Deterministic → the oracle replays the same
  // tiling + first-occurrence window + ordered reassembly in DuckDB.
  def d8_span_dedup(s: SparkSession, dir: String): DataFrame =
    Dedup.spanDedup(docs(s, dir), "doc_id", "text", spanTokens = 10)
      .select(col("id").as("doc_id"), col("n_spans"), col("n_kept"),
        col("text_kept"))
      .orderBy("doc_id")

  // d12: character-level cross-document duplicated-substring spans (the
  // ExactSubstr pass of Lee et al. 2021, suffix array re-expressed as a
  // distributed stride-1 window hash + interval merge). Integer output
  // (doc_len, span count, covered chars) → the oracle replays the same
  // windowing, >=2-distinct-docs test, and interval merge on window TEXT
  // (Spark groups a 64-bit Rabin–Karp rolling hash of the window — one
  // O(len) walk per document via RollingHashWindows — same answer absent
  // a 64-bit collision, the documented posture of every dedup entry).
  def d12_substring_dedup(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicatedSubstringSpans(docs(s, dir), "doc_id", "text",
        windowChars = 30)
      .select(col("id").as("doc_id"), col("doc_len"), col("n_dup_spans"),
        col("dup_chars"))
      .orderBy("doc_id")

  // -------------------------------------------------------- similarity

  /** Query vector: embedding of vec_id = 0 (a query parameter, fetched
    * driver-side — not a data-flow collect). */
  private def queryVec(s: SparkSession, dir: String): Seq[Double] =
    embs(s, dir).where(col("vec_id") === 0)
      .select(col("embedding")).collect()(0)
      .getSeq[Float](0).map(_.toDouble)

  /** Deterministic near-copy of a unit vector: element i (1-based)
    * shifted by scale·(((seed·31 + i) mod 7) − 3). Integer arithmetic +
    * one double multiply, so Spark and DuckDB replay it bit-for-bit; at
    * scale 0.005 over 64 dims the copy sits at cosine ≈ 0.997 to its
    * source — squarely in the regime hyperplane LSH is built for, far
    * above this synthetic corpus's organic maximum (≈ 0.52). */
  private def perturbedVec(vecCol: Column, seedCol: Column,
      scale: Double = 0.005): Column =
    transform(sequence(lit(1), size(vecCol)), i =>
      element_at(vecCol, i) +
        lit(scale) * (pmod(seedCol * 31 + i, lit(7)) - lit(3)).cast("double"))

  /** The ANN gate corpus: the embeddings table (as double vectors) plus
    * 25 planted near-copies of the query vector under ids 100001..100025.
    * With organic cosine-to-query ≤ ~0.41, the exact top-26 is precisely
    * {query} ∪ planted — a known answer an approximate path must fully
    * recover for the oracle hash to match. */
  private def withPlantedQueryCopies(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val planted = e.where(col("vec_id") === 0)
      .select(explode(sequence(lit(1L), lit(25L))).as("i"), col("embedding"))
      .select((col("i") + 100000L).as("vec_id"),
        perturbedVec(col("embedding"), col("i") + 100000L).as("embedding"))
    e.unionByName(planted)
  }

  // §2.9: the SQL-registered function surface end-to-end — the same
  // custom Catalyst expressions (graft_cosine here) callable from
  // spark.sql via GraftExtensions, oracle-checked against DuckDB's
  // native list_cosine_similarity
  def s9_sql_cosine(s: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftExtensions.register(s)
    embs(s, dir).createOrReplaceTempView("embeddings_v")
    s.sql(
      """SELECT a.vec_id,
        |  round(graft_cosine(CAST(a.embedding AS ARRAY<DOUBLE>),
        |                     CAST(q.embedding AS ARRAY<DOUBLE>)), 6) AS cos0
        |FROM embeddings_v a,
        |     (SELECT embedding FROM embeddings_v WHERE vec_id = 0) q
        |ORDER BY a.vec_id""".stripMargin)
  }

  // s16: the kNN graph through the LSH-BLOCKED scale path (the plan a
  // 100 TB corpus runs — block-join quadratic within buckets, never
  // all-pairs), self-gated with planted known answers like s2/s5/d5:
  // each of vec_ids 0..24 gets a deterministic near-copy at cosine
  // ≈ 0.997, making the rank-1 neighbor of all 50 gated nodes a known
  // (twin, cosine) fact far above the organic maximum (≈ 0.52). The
  // 4-table × 8-bit OR-amplified blocking must put every twin pair in
  // at least one shared bucket — a missed collision surfaces a wrong
  // rank-1 neighbor and fails the oracle hash. The exact twin s8 stays
  // the full-graph oracle at test scale.
  def s16_knn_graph_lsh(s: SparkSession, dir: String): DataFrame = {
    Similarity.knnGraph(withPlantedTwins(s, dir), "vec_id", "embedding",
        k = 1, bits = 8, tables = 4)
      .where((col("id_a") < 25 || col("id_a") >= 100000L) && col("rank") === 1)
      .select(col("id_a"), col("id_b"), round(col("score"), 6).as("score"))
      .orderBy("id_a")
  }

  // --------------------------- density-scaled (autoBits) soak twins
  //
  // s33/d19/s34 are s16/d5_lsh/s12's twins through the DENSITY-SCALED
  // parameter seams (Similarity.autoBits / autoClusters): the pinned
  // entries keep their oracle parameters forever, so at the sf1 soak
  // (10x corpus) their block/cluster occupancy — and the per-block
  // quadratic candidate term — grows 10x (the r9 1.17–1.35 slope
  // band). The twins derive bits/k from the corpus count, holding
  // expected occupancy constant, and buy the per-pair recall back with
  // OR-amplified tables / index-side multi-probe. At sf0.01/sf0.1 the
  // derived parameters land on the floors (8 bits / 16 clusters —
  // plans identical to the pinned twins), so the DuckDB oracles pin
  // correctness; at the soak the parameters grow and the slope should
  // flatten toward ~1. Planted recall is REQUIRED in-entry, so a
  // recall regression fails loudly even where no oracle runs.

  /** One extra OR-amplified table per bit above the 8-bit floor: each
    * bit multiplies a fixed-angle pair's per-table collision odds by
    * p≈0.975 (cos 0.997), and one added table restores the OR-union
    * 1−(1−p^bits)^t above its floor value. */
  private def tablesFor(bits: Int): Int = 4 + math.max(0, bits - 8)

  /** Planted-recall gates run ONCE per (entry, dataset) per process:
    * the gate re-executes the operator to count recovered plants, and
    * running it inside every bench iteration would either double the
    * measured work or (persisted) turn the timed iterations into cache
    * reads. One check per process is the correctness contract; the
    * timed plan stays the pure operator. A failed gate re-arms so a
    * retry re-checks. */
  private val recallGates =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def gateOnce(key: String)(check: => Unit): Unit =
    if (recallGates.add(key)) {
      try check
      catch { case t: Throwable => recallGates.remove(key); throw t }
    }

  def s33_knn_graph_auto(s: SparkSession, dir: String): DataFrame = {
    val corpus = withPlantedTwinsAt(s, dir, 10000000L)
    val bits = Similarity.autoBits(corpus, targetOccupancy = 64)
    val g = Similarity.knnGraph(corpus, "vec_id", "embedding", k = 1,
        bits = bits, tables = tablesFor(bits))
      .where((col("id_a") < 25 || col("id_a") >= 10000000L) &&
        col("rank") === 1)
      .select(col("id_a"), col("id_b"), round(col("score"), 6).as("score"))
    gateOnce(dir + "#s33") {
      val recovered = g.where(
        (col("id_a") < 25 && col("id_b") === col("id_a") + 10000000L) ||
        (col("id_a") >= 10000000L &&
          col("id_b") === col("id_a") - 10000000L))
        .count()
      require(recovered == 50, s"autoBits kNN graph planted recall " +
        s"$recovered/50 (bits=$bits tables=${tablesFor(bits)})")
    }
    g.orderBy("id_a")
  }

  def d19_embedding_neardup_auto(s: SparkSession, dir: String): DataFrame = {
    val corpus = withPlantedTwinsAt(s, dir, 10000000L)
    val bits = Similarity.autoBits(corpus, targetOccupancy = 64)
    val pairs = Dedup.embeddingNearDuplicates(corpus, "vec_id",
        "embedding", threshold = 0.9, lshBits = bits,
        lshTables = tablesFor(bits))
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
    gateOnce(dir + "#d19") {
      val planted = pairs.where(col("id_a") < 25 &&
        col("id_b") === col("id_a") + 10000000L).count()
      require(planted == 25, s"autoBits near-dup planted recall " +
        s"$planted/25 (bits=$bits tables=${tablesFor(bits)})")
    }
    pairs.orderBy("id_a", "id_b")
  }

  // s34: SemDeDup through autoClusters (k tracks corpus density) +
  // index-side multi-probe (probes=2 — a boundary-straddling twin pair
  // still meets in a shared cluster). At threshold 0.9 no ORGANIC pair
  // qualifies at any sf (organic cosines top out ~0.52), so the exact
  // survivor set is closed-form: the corpus minus the planted copies —
  // the oracle is the embeddings id list itself, and any recall miss
  // (a surviving planted copy) or precision bug (a dropped organic id)
  // breaks the hash.
  private val autoCents = new java.util.concurrent.ConcurrentHashMap[
    String, Array[Array[Double]]]()

  def s34_semantic_dedup_auto(s: SparkSession, dir: String): DataFrame = {
    val corpus = withPlantedTwinsAt(s, dir, 10000000L)
    val k = Similarity.autoClusters(corpus, targetOccupancy = 128)
    val cents = autoCents.computeIfAbsent(dir, { _ =>
      Similarity.ivfCentroids(corpus, "vec_id", "embedding", k = k)
    })
    // assignment goes LSH-bucketed with k (flat assignment is O(n·k) —
    // the quadratic term once k tracks the corpus; bits hold ~16
    // candidate centroids per bucket, 8 OR-tables + 3 probes buy the
    // pair-level assignment recall back: a near-identical pair misses
    // only when its per-table bucket sets diverge enough that the two
    // top-3 candidate lists are disjoint)
    val assignBits = math.max(1,
      math.ceil(math.log(k / 16.0) / math.log(2)).toInt)
    val out = Dedup.semanticDedup(corpus, "vec_id", "embedding", cents,
        threshold = 0.9, probes = 4, assignBits = assignBits,
        assignTables = 8)
      .select(col("id").as("vec_id"))
    gateOnce(dir + "#s34") {
      val survivingPlanted = out.where(col("vec_id") >= 10000000L).count()
      require(survivingPlanted == 0, s"autoClusters semantic dedup " +
        s"missed $survivingPlanted/25 planted copies " +
        s"(k=$k, bits=$assignBits, tables=8, probes=4)")
    }
    out.orderBy("vec_id")
  }

  // s37: s34 with the codebook trained HIERARCHICALLY
  // (Similarity.ivfCentroidsHierarchical: √k driver supers + per-super
  // reducer-local k-means) and dedup running over the centroid FRAME
  // (Dedup.semanticDedupFrame → ivfAssignTopLshFrame) — the training
  // and assignment shapes that exist past driver-array k. Same
  // closed-form oracle as s34: at threshold 0.9 only planted twins
  // qualify, so survivors = the organic id list; a recall miss (a
  // surviving copy) or a precision bug (a dropped organic id) breaks
  // the hash. The trained codebook is memoized as a per-dataset PARQUET
  // artifact (the s20 inverted-index / trigram-manifest pattern), keyed
  // by the SHA-256 (name, size, mtime) signature of the source table so
  // regenerated testdata can never be served a stale codebook — bench
  // iterations time the dedup, not the trainer, and the memo itself
  // stays frame-native: no driver collect anywhere in the entry, which
  // is the property the operator exists to demonstrate at k past
  // driver-array scale.
  private val hierCentDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val hierCentBuildLock = new Object

  private def hierCentroidsDir(s: SparkSession, dir: String,
      corpus: DataFrame, k: Int): String = {
    // the signature is recomputed on EVERY access (two stat calls) and
    // the memo is keyed by (dir, sig), so a regenerated
    // embeddings.parquet within one JVM gets a fresh codebook too —
    // keying by dir alone only protected across process restarts
    // (ADVICE r12)
    val sig = SourceQueries.artifactSignature(
      Seq(s"$dir/embeddings.parquet"))
    hierCentDirs.computeIfAbsent(s"$dir#$sig", { _ =>
      val out = Tables.tmpDirFor(s"graft_hiercents_$sig", dir)
      hierCentBuildLock.synchronized {
        if (!new java.io.File(out, "_SUCCESS").exists()) {
          Similarity
            .ivfCentroidsHierarchical(corpus, "vec_id", "embedding", k)
            .write.mode("overwrite").parquet(out)
          // reap superseded signatures (regenerated testdata) like the
          // trigram manifests — one orphan dir per rewrite otherwise
          SourceQueries.dropSupersededArtifacts("graft_hiercents", out)
        }
      }
      out
    })
  }

  // read-back cached per (context, artifact PATH) — the manifestArtifact
  // pattern: one tiny relation, reused across iterations and probes. The
  // path embeds the source signature, so a regenerated dataset keys a
  // fresh entry here automatically.
  // keyed by (context, DATASET dir) with the artifact path tracked in
  // the value: the path embeds the source signature, so keying the memo
  // BY path let every in-JVM dataset regeneration add a new .cache()d
  // frame while stale ones were never unpersisted (unbounded executor-
  // memory growth in long-lived processes — ADVICE r13). A superseded
  // signature now unpersists and replaces its predecessor.
  private val hierCentFrames = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.SparkContext, String), (String, DataFrame)]()

  private[graft] def hierCentroidsFrame(s: SparkSession, dir: String,
      corpus: DataFrame, k: Int): DataFrame = {
    val out = hierCentroidsDir(s, dir, corpus, k)
    hierCentFrames.compute((s.sparkContext, dir), { (_, prev) =>
      if (prev != null && prev._1 == out) prev
      else {
        if (prev != null) prev._2.unpersist()
        (out, s.read.parquet(out).select(col("cluster"), col("cvec")).cache())
      }
    })._2
  }

  // in-gate codebook as a DRIVER ARRAY, memoized per artifact path —
  // collected ONCE from the parquet artifact, and only ever when the
  // broadcast gate says k·tables bucket rows fit (≤ 2^17 ≈ 16k
  // centroids at 8 tables, single-digit MB). Sorted by cluster id so
  // cents(i) is cluster i, the layout ivfAssignTopLsh compiles.
  private val hierCentArrays = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.SparkContext, String),
    (String, Array[Array[Double]])]()

  private def hierCentroidsArray(s: SparkSession, dir: String,
      corpus: DataFrame, k: Int): Array[Array[Double]] = {
    val out = hierCentroidsDir(s, dir, corpus, k)
    // same latest-signature-per-dir eviction as hierCentFrames (driver
    // arrays are gate-bounded but still superseded on regeneration)
    hierCentArrays.compute((s.sparkContext, dir), { (_, prev) =>
      if (prev != null && prev._1 == out) prev
      else (out, s.read.parquet(out).select(col("cluster"), col("cvec"))
        .orderBy("cluster").collect()
        .map(_.getAs[scala.collection.Seq[Double]]("cvec").toArray))
    })._2
  }

  def s37_semantic_dedup_hier(s: SparkSession, dir: String): DataFrame = {
    val corpus = withPlantedTwinsAt(s, dir, 10000000L)
    val k = Similarity.autoClusters(corpus, targetOccupancy = 128)
    val assignBits = math.max(1,
      math.ceil(math.log(k / 16.0) / math.log(2)).toInt)
    // Route the trained codebook by the SAME size gate the assignment
    // join uses (judge ask r12 #2): in-gate, the codebook rides as a
    // plan-local relation (one memoized driver collect, bounded by the
    // gate) — no per-iteration broadcast-subplan re-execution, no dim
    // peek job, ~2× cheaper locally. Past the gate — autoClusters at
    // 10⁹+ embeddings — the codebook stays a FRAME end-to-end
    // (semanticDedupFrame, broadcastCentroids = false ⇒ shuffled hash
    // join), the shape IvfScaleSpec pins and the sf10 floor probes
    // keep exercising. Both routes share training, bucketing, scoring,
    // and the exact-cosine drop stage; PipelineSpec asserts they agree
    // row-for-row on a planted corpus.
    val inGate = k.toLong * 8 <= Similarity.MaxBroadcastCentroidRows
    val out = (if (inGate) {
      val cents = hierCentroidsArray(s, dir, corpus, k)
      Dedup.semanticDedup(corpus, "vec_id", "embedding", cents,
        threshold = 0.9, probes = 4, assignBits = assignBits,
        assignTables = 8)
    } else {
      val centDf = hierCentroidsFrame(s, dir, corpus, k)
      Dedup.semanticDedupFrame(corpus, "vec_id", "embedding",
        centDf, threshold = 0.9, probes = 4, assignBits = assignBits,
        assignTables = 8, broadcastCentroids = false)
    }).select(col("id").as("vec_id"))
    gateOnce(dir + "#s37") {
      val survivingPlanted = out.where(col("vec_id") >= 10000000L).count()
      require(survivingPlanted == 0, s"hierarchical semantic dedup " +
        s"missed $survivingPlanted/25 planted copies " +
        s"(k=$k, bits=$assignBits, tables=8, probes=4)")
    }
    out.orderBy("vec_id")
  }

  /** Assignment-floor attribution probes (tools.FloorProfile): for each
    * of the three linear-slope entries (s33/s34/s37) the ASSIGNMENT
    * subplan alone, built with exactly the entry's parameters, so
    * `full − assign` at each scale attributes the wall between the
    * linear per-vector assignment term and the candidate-pair
    * verification term. A slope ≈ 1 is the assignment floor only if the
    * assignment probe carries it; a verification-side residual would
    * instead indicate a hidden candidate blow-up. */
  private[graft] def floorProbes(s: SparkSession, dir: String)
      : Seq[(String, () => DataFrame)] = {
    val corpus = withPlantedTwinsAt(s, dir, 10000000L)
    val bits = Similarity.autoBits(corpus, targetOccupancy = 64)
    val k = Similarity.autoClusters(corpus, targetOccupancy = 128)
    val assignBits = math.max(1,
      math.ceil(math.log(k / 16.0) / math.log(2)).toInt)
    Seq(
      "s33_assign" -> (() => Similarity.knnBlocked(corpus, "vec_id",
        "embedding", bits, 64, tablesFor(bits))),
      "s33_full" -> (() => s33_knn_graph_auto(s, dir)),
      "s34_assign" -> (() => {
        val cents = autoCents.computeIfAbsent(dir, { _ =>
          Similarity.ivfCentroids(corpus, "vec_id", "embedding", k = k)
        })
        Similarity.ivfAssignTopLsh(corpus, "vec_id", "embedding", cents,
          probes = 4, bits = assignBits, dim = cents.head.length,
          tables = 8)
      }),
      "s34_full" -> (() => s34_semantic_dedup_auto(s, dir)),
      "s37_assign" -> (() => {
        val centDf = hierCentroidsFrame(s, dir, corpus, k)
        val dim = centDf.select(size(col("cvec"))).head().getInt(0)
        Similarity.ivfAssignTopLshFrame(
          corpus.select(col("vec_id").as("id"), col("embedding").as("v")),
          "id", "v", centDf, probes = 4, bits = assignBits, dim = dim,
          tables = 8)
      }),
      "s37_full" -> (() => s37_semantic_dedup_hier(s, dir)))
  }

  // exact kNN graph (top-5 neighbors per vector) via broadcast
  // nested-loop + WindowGroupLimit — deterministic, DuckDB-expressible
  def s8_knn_graph(s: SparkSession, dir: String): DataFrame =
    Similarity.knnGraphExact(embs(s, dir), "vec_id", "embedding", k = 5)
      .select(col("id_a"), col("id_b"), round(col("score"), 6).as("score"),
        col("rank").cast("long").as("rank"))
      .orderBy("id_a", "rank")

  // s32: hard-negative mining (DPR-style training-data step) — each
  // query (vec_ids 0..19, their own vectors) labels itself and its
  // successor as positives; the miner returns the top-3 most-similar
  // REMAINING corpus vectors per query. Queries + labels broadcast,
  // corpus streams once, WindowGroupLimit caps to k before the one
  // (qid) shuffle. The oracle brute-forces the same exclusion.
  def s32_hard_negatives(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val q = e.where(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val pos = q.select(col("qid"), col("qid").as("vec_id"))
      .union(q.select(col("qid"), (col("qid") + 1).as("vec_id")))
    Similarity.hardNegatives(q, "qid", "qv", e, "vec_id", "embedding",
        pos, k = 3)
      .select(col("qid"), col("id"), round(col("score"), 6).as("score"),
        col("rank").cast("long").as("rank"))
      .orderBy("qid", "rank")
  }

  // s35: s32's corpus-scale twin — hard-negative mining with LSH
  // candidate generation instead of a broadcast query set (nothing
  // broadcasts; candidates are bucket-join collisions). The planted
  // structure makes the answer exact-closed-form: queries are the 25
  // planted twins (ids >= 1e7), each labels ITSELF positive (it sits in
  // the corpus at cosine 1.0), so its top-1 hard negative is its source
  // vector at cosine ~0.997 — far above the organic ceiling (~0.52) and
  // the regime where LSH collision odds are strongest. The 8-bit /
  // 4-table blocking must recover every (twin -> src) pair or the
  // oracle hash fails: recall@1 is pinned at 100%.
  def s35_hard_negatives_blocked(s: SparkSession, dir: String): DataFrame = {
    val corpus = withPlantedTwinsAt(s, dir, 10000000L)
    val q = corpus.where(col("vec_id") >= 10000000L)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val pos = q.select(col("qid"), col("qid").as("vec_id"))
    Similarity.hardNegativesBlocked(q, "qid", "qv", corpus, "vec_id",
        "embedding", pos, k = 1, bits = 8, tables = 4)
      .select(col("qid"), col("id"), round(col("score"), 6).as("score"),
        col("rank").cast("long").as("rank"))
      .orderBy("qid")
  }

  def s1_ann_bruteforce(s: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(embs(s, dir), "vec_id", "embedding",
        queryVec(s, dir), k = 20)
      .select(col("id"), round(col("score"), 6).as("score"))
      .orderBy(desc("score"), col("id"))

  // s19: max-inner-product top-k via norm augmentation (Bachrach 2014) —
  // dot-product retrieval through the cosine machinery: M² is one scalar
  // aggregate broadcast in-plan, scoring is a single scan + distributed
  // top-k. The oracle ranks by list_dot_product AND recomputes the
  // augmented cosine from its own max-norm — a broken reduction (wrong M,
  // wrong augmentation algebra) diverges in either column.
  def s19_mips(s: SparkSession, dir: String): DataFrame =
    Similarity.mipsTopK(embs(s, dir), "vec_id", "embedding",
        queryVec(s, dir), k = 20)
      .select(col("id"), round(col("score"), 6).as("score"),
        round(col("aug_cos"), 6).as("aug_cos"))
      .orderBy(desc("score"), col("id"))

  // s11: int8-quantized ANN, self-gated k1/k2-style — candidates come
  // from the 1-byte-per-dim quantized-cosine scan (the 4×-smaller index
  // a 100 TB deployment holds in memory), full-precision re-rank restores
  // exact order, and the inner join keeps only exact-top-20 rows the
  // quantized path confirmed: a recall miss or codec bug drops rows and
  // fails the hash match. Oracle = the exact top-20 (s1's query).
  def s11_quantized_ann(s: SparkSession, dir: String): DataFrame = {
    val q = queryVec(s, dir)
    val exact = Similarity.bruteForceTopK(embs(s, dir), "vec_id",
      "embedding", q, k = 20)
    val confirmed = Similarity.quantizedTopK(embs(s, dir), "vec_id",
      "embedding", q, k = 20, overFetch = 3).select("id")
    exact.join(confirmed, "id")
      .select(col("id"), round(col("score"), 6).as("score"))
      .orderBy(desc("score"), col("id"))
  }

  // s12: SemDeDup semantic dedup over the IVF centroids. The entry gates
  // PRECISION end-to-end: semanticDedup only ever drops an id with a
  // verified lower-id neighbor at cosine >= threshold, so its survivors
  // are a SUPERSET of the exact no-clustering survivors; the inner join
  // therefore equals the exact survivor set (= the DuckDB oracle) unless
  // the operator wrongly drops a row — which then fails the hash match.
  // Recall across cluster boundaries (the paper's accepted trade) is
  // asserted on planted near-identical vectors in PipelineSpec.
  def s12_semantic_dedup(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val cents = ivfCents.computeIfAbsent(dir, { d =>
      Similarity.ivfCentroids(embs(s, d), "vec_id", "embedding", k = 16)
    })
    val clustered = Dedup.semanticDedup(e, "vec_id", "embedding",
        cents, threshold = 0.4)
      .select(col("id").as("vec_id"))
    val exactDrops = Dedup.embeddingNearDuplicates(e, "vec_id", "embedding",
        threshold = 0.4, lshBits = 0)
      .select(col("id_b").as("vec_id")).distinct()
    val exactSurvivors = e.select(col("vec_id"))
      .join(exactDrops, Seq("vec_id"), "left_anti")
    clustered.join(exactSurvivors, Seq("vec_id"))
      .orderBy("vec_id")
  }

  // s2: hyperplane-LSH ANN, self-gated k1/k2-style in the regime LSH
  // serves (high similarity — this near-orthogonal corpus's organic
  // top-20 at cosine ~0.4 is information-theoretically NOT LSH-findable,
  // so the gate plants the known answer instead): 25 deterministic
  // near-copies of the query at cosine ≈ 0.997 make the exact top-26
  // exactly {query} ∪ planted, and the bucket-pruned scan (Hamming ≤ 3
  // of 12-bit codes — candidates ≈ 3% of the corpus) must recover every
  // one for the hash to match. A recall or bucketing bug drops rows and
  // fails the oracle.
  def s2_ann_lsh(s: SparkSession, dir: String): DataFrame =
    Similarity.annTopK(withPlantedQueryCopies(s, dir), "vec_id", "embedding",
        queryVec(s, dir), k = 26, bits = 12, probeRadius = 3)
      .select(col("id"), round(col("score"), 6).as("score"))

  // IVF ANN: spherical-kmeans centroids (trained once per dataset, a
  // plan-time constant) + nProbe-cluster scan (rows-only; recall asserted
  // in PipelineSpec)
  private val ivfCents = new java.util.concurrent.ConcurrentHashMap[
    String, Array[Array[Double]]]()

  private val pqBooks = new java.util.concurrent.ConcurrentHashMap[
    String, Array[Array[Array[Double]]]]()

  // s23: product-quantization ANN — codebook-per-subspace encoding (4
  // bytes/vector vs 256 for the floats, the 64× compression a 100 TB
  // ANN index persists), in-plan map-only encode against plan-literal
  // codebooks, ADC lookup-table scoring, exact re-rank of the bounded
  // candidate set. Gated on the s2/s5 planted known answer: the 25
  // near-copies of the query sit at the GLOBAL ADC minimum (their codes
  // are the query's own nearest cells, so every organic vector's ADC is
  // ≥ theirs), and the oracle's exact top-26 must come back whole — any
  // encode/table/re-rank defect breaks the hash. On iid-random organic
  // vectors PQ's cell resolution cannot separate near-tied cosines
  // (measured: exact-top-20 recall needs ~60% of such a corpus — the
  // honest property of PQ on unclustered data; real embedding corpora
  // are clustered, which is the regime PQ exists for), so the verified
  // claim is machinery correctness + planted recall, same as s2/s5.
  def s23_pq_ann(s: SparkSession, dir: String): DataFrame = {
    val books = pqBooks.computeIfAbsent(dir, { d =>
      Similarity.pqCodebooks(embs(s, d), "vec_id", "embedding",
        subspaces = 8, codebookSize = 16)
    })
    Similarity.pqTopK(withPlantedQueryCopies(s, dir), "vec_id", "embedding",
        queryVec(s, dir), k = 26, subspaces = 8, codebookSize = 16,
        overFetch = 4, codebooksIn = books)
      .select(col("id"), round(col("score"), 6).as("score"))
  }

  /** d7's history fingerprint — in production a persisted offline
    * artifact built once per corpus, so (like the IVF centroids) it is
    * prepared per dataset rather than rebuilt inside every query. */
  private val d7Bloom = new java.util.concurrent.ConcurrentHashMap[
    String, Array[Byte]]()

  private def d7BloomFor(s: SparkSession, dir: String): Array[Byte] =
    d7Bloom.computeIfAbsent(dir, { d =>
      Dedup.contentBloom(docs(s, d).where(col("doc_id") < 250),
        Seq("text"), expectedItems = 1L << 17)
    })

  private[graft] def prepare(s: SparkSession, dir: String): Unit = {
    ivfCents.computeIfAbsent(dir, { d =>
      Similarity.ivfCentroids(embs(s, d), "vec_id", "embedding", k = 16)
    })
    d7BloomFor(s, dir)
    bpeFor(s, dir)
    sigStoreDir(s, dir)
  }

  // s5: IVF ANN with the same planted-answer gate as s2 — centroids
  // stay trained on the organic corpus (prepare()), the planted copies
  // assign to clusters at query time, and all of them must land inside
  // the 6 probed clusters (verified: they do, with margin) or rows drop
  // and the hash fails. Scan cost stays ~nProbe/k of the corpus.
  def s5_ann_ivf(s: SparkSession, dir: String): DataFrame = {
    val cents = ivfCents.computeIfAbsent(dir, { d =>
      Similarity.ivfCentroids(embs(s, d), "vec_id", "embedding", k = 16)
    })
    Similarity.ivfTopK(withPlantedQueryCopies(s, dir), "vec_id", "embedding",
        queryVec(s, dir), k = 26, cents, nProbe = 6)
      .select(col("id"), round(col("score"), 6).as("score"))
  }

  // s13: per-dimension embedding calibration stats — the quantization /
  // normalization table. Decimal-accumulated sums keep the mean exact
  // across partition orders; the oracle replays the same decimal
  // accumulation.
  def s13_dim_stats(s: SparkSession, dir: String): DataFrame =
    Similarity.dimStats(embs(s, dir), "embedding")
      .select(col("dim").cast("long").as("dim"), col("n"),
        round(col("mn"), 6).as("mn"), round(col("mx"), 6).as("mx"),
        round(col("sx") / col("n"), 6).as("mean"))
      .orderBy("dim")

  // s14: per-source embedding centroids — the "domain centroid" table
  // for routing, drift monitoring, and cluster labeling. Long format
  // (source, dim, mean): scalar columns hash-compare cleanly and the
  // shuffle still carries only (key, dim, partial aggregates).
  def s14_group_centroids(s: SparkSession, dir: String): DataFrame = {
    // spreadBarrier (not a bare spread): the join would otherwise let
    // Catalyst re-plan the exchange away, re-serializing the
    // per-dimension explode on the single-split embeddings scan
    val joined = Dedup.spreadBarrier(embs(s, dir), "s14").join(
      docs(s, dir).select(col("doc_id").as("vec_id"), col("source")),
      "vec_id")
    Similarity.dimStats(joined, "embedding", keys = Seq("source"))
      .select(col("source"), col("dim").cast("long").as("dim"), col("n"),
        round(col("sx") / col("n"), 6).as("mean"))
      .orderBy("source", "dim")
  }

  // s18: distributed Lloyd k-means over the embedding corpus — per
  // iteration a map-only assignment under plan-constant centroids plus
  // ONE (cluster, dim) aggregation whose shuffle carries k·dim partial
  // sums, never vectors. Exactly replayable (and replayed by the
  // oracle, iteration for iteration): distances and centroid sums are
  // integer micro-units (floor(x·1e12 + 0.5) longs), argmin tie-breaks
  // on cluster id, updates divide as sum/(1e12·n) — no float race
  // anywhere, so the cluster sizes and mean distortion are exact facts.
  def s18_kmeans(s: SparkSession, dir: String): DataFrame =
    graft.operators.Clustering.kmeansAssignments(
        embs(s, dir), "vec_id", "embedding", k = 10, iters = 2)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vectors"),
        round(sum(col("dist_units")).cast("double") /
          (lit(1e12) * count(lit(1))), 6).as("avg_sqdist"))
      .select(col("cluster").cast("long").as("cluster"),
        col("n_vectors"), col("avg_sqdist"))
      .orderBy("cluster")

  // --------------------------------------------------------- sampling

  // p1: deterministic Bernoulli sample — membership depends only on the
  // row key (Knuth mix, replicated arithmetically in the oracle), so a
  // re-run or an incremental shard selects the same rows
  def p1_hash_sample(s: SparkSession, dir: String): DataFrame =
    Sampling.gateSample(docs(s, dir),
        Sampling.mix32(col("doc_id")), 4294967296L, rate = 0.25)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  // p2: per-source quota — top-10 per stratum by deterministic priority
  // (WindowGroupLimit applies the cap map-side; a dominant source never
  // floods one reducer)
  def p2_stratified_sample(s: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedTopN(docs(s, dir), "source", n = 10,
        priority = Seq(Sampling.mix32(col("doc_id")), col("doc_id")))
      .select(col("source"), col("doc_id"))
      .orderBy("source", "doc_id")

  // p4: corpus mixing to target source weights — keeps the largest
  // subcorpus matching the 0.4/0.3/0.2/0.1 mixture over four sources
  // (others dropped); stratum rates are derived in-plan from the stratum
  // counts and membership is the cross-engine mix32 gate, so DuckDB
  // replays the identical row set from the same float64 rate arithmetic
  def p4_source_mix(s: SparkSession, dir: String): DataFrame =
    Sampling.mixToWeights(docs(s, dir), "source",
        Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1),
        Sampling.mix32(col("doc_id")))
      .select(col("doc_id"), col("source"))
      .orderBy("doc_id")

  // p11: systematic weighted sampling — ticks every 600 tokens along the
  // mix32-permuted corpus; a doc is selected iff its token interval
  // contains a tick (inclusion probability ∝ token count, PPS design).
  // Integer tick arithmetic on packByBudget's prefix-sum coordinates →
  // the oracle replays the permutation, prefix sum, and tick test.
  def p11_systematic_sample(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    Sampling.systematicSample(d, "doc_id", "n_tokens", step = 600L,
        priority = Seq(Sampling.mix32(col("doc_id")), col("doc_id")))
      .orderBy("doc_id")
  }

  // p12: temperature-flattened language mixing (T = 2) — stratum
  // proportions ∝ sqrt(count), smallest language kept whole; rates are
  // derived in-plan and membership is the cross-engine mix32 gate. sqrt
  // is IEEE-correctly-rounded, so DuckDB replays the identical row set.
  // (Stratifies on lang — the skewed column; source is uniform in the
  // fixture, which would make flattening a no-op.)
  def p12_temperature_mix(s: SparkSession, dir: String): DataFrame =
    Sampling.temperatureMixT2(docs(s, dir), "lang",
        Sampling.mix32(col("doc_id")))
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  // p6: deterministic global shuffle — every doc gets a (shard, pos)
  // training-order coordinate from pure key arithmetic (8 shards, mix32
  // order within shard); the oracle replays the identical permutation
  def p6_global_shuffle(s: SparkSession, dir: String): DataFrame =
    Sampling.globalShuffle(docs(s, dir), "doc_id", numShards = 8,
        score = Sampling.mix32(col("doc_id")))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy("doc_id")

  // p7: deterministic upsampling — reweight four sources to
  // 0.5/0.25/0.125/0.125 preserving corpus size, so the dominant target
  // stratum repeats for multiple epochs (⌊r⌋ copies + hash-gated
  // fractional copy). Dyadic weights sum to exactly 1.0 in float64, so
  // the oracle's rate arithmetic replays bit-for-bit.
  def p7_upsample(s: SparkSession, dir: String): DataFrame =
    // the explicit isin() selection mirrors the oracle's inner join:
    // upsampleToWeights itself rejects observed-but-unweighted strata
    Sampling.upsampleToWeights(
        docs(s, dir).where(col("source").isin("src0", "src1", "src2", "src3")),
        "source",
        Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.125, "src3" -> 0.125),
        Sampling.mix32(col("doc_id")))
      .select(col("doc_id"), col("copy"))
      .orderBy("doc_id", "copy")

  // p9: sharded training-order export — the materialization step after
  // p6: write the corpus as parquet partitioned by shard (one directory
  // per training file), then read the layout BACK from the files. The
  // oracle is p6's: the hash match proves the persisted shards contain
  // exactly the computed (shard, pos) permutation — the write→read loop
  // loses nothing. Written once per dataset (an export artifact);
  // partitionBy(shard) writes each shard's rows together, which at
  // corpus scale is the layout a training loader streams sequentially.
  private val shardDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def shardedExport(s: SparkSession, dir: String): String =
    shardDirs.computeIfAbsent(dir, { d =>
      val out = graft.Tables.tmpDirFor("graft_shards", d)
      Sampling.globalShuffle(docs(s, d), "doc_id", numShards = 8,
          score = Sampling.mix32(col("doc_id")))
        .select(col("doc_id"), col("shard"), col("pos"))
        .repartition(col("shard"))
        .write.mode("overwrite").partitionBy("shard").parquet(out)
      out
    })

  def p9_sharded_export(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(shardedExport(s, dir))
      .select(col("doc_id"), col("shard").cast("long").as("shard"),
        col("pos"))
      .orderBy("doc_id")

  // p5: sequence packing — shard the priority-ordered corpus into
  // contiguous ~2000-token bins via the distributed prefix sum; output
  // is per-bin shard stats. The oracle replays the same exclusive
  // running sum with a window.
  def p5_sequence_pack(s: SparkSession, dir: String): DataFrame = {
    val t = docs(s, dir).select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
      Sampling.mix32(col("doc_id")).as("pri"))
    Sampling.packByBudget(t, "doc_id", "n_tokens", binSize = 2000L,
        priority = Seq(col("pri"), col("doc_id")))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"))
      .orderBy("bin")
  }

  // p8: packed-sequence layout — the per-document (bin, tok_offset)
  // coordinates a training loader consumes to place documents inside
  // fixed 2000-token context windows; same distributed prefix sum as
  // p5, replayed by the oracle's running-sum window.
  def p8_pack_offsets(s: SparkSession, dir: String): DataFrame = {
    val t = docs(s, dir).select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
      Sampling.mix32(col("doc_id")).as("pri"))
    Sampling.packByBudget(t, "doc_id", "n_tokens", binSize = 2000L,
        priority = Seq(col("pri"), col("doc_id")))
      .select(col("doc_id"), col("bin"), col("tok_offset"))
      .orderBy("doc_id")
  }

  // t8: context-window chunking — 32-token windows, 8-token overlap,
  // over a 50-doc slice (the oracle explodes every window as strings)
  def t8_chunking(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chunkByTokens(
        docs(s, dir).where(col("doc_id") < 50), "doc_id", "text",
        width = 32, overlap = 8)
      .orderBy("doc_id", "chunk_idx")

  // p3: token-budget selection — fill a 20k-token mix in deterministic
  // shuffle order via the two-phase distributed prefix sum
  def p3_token_budget(s: SparkSession, dir: String): DataFrame = {
    val t = docs(s, dir).select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
      Sampling.mix32(col("doc_id")).as("pri"))
    Sampling.takeUntilBudget(t, "n_tokens", budget = 20000L,
        priority = Seq(col("pri"), col("doc_id")))
      .select(col("doc_id"), col("n_tokens"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------ text analysis

  def t1_token_count(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_actual"))
      .orderBy("doc_id")

  // language-ID + quality + token counts — all deterministic Column math,
  // replicated in the DuckDB oracle below. The sketch columns
  // (content_hash, fingerprint) live in t2_fingerprint: they are
  // engine-specific xxhash64 values, and array columns crash the
  // harness's pandas compare.
  def t2_profile(s: SparkSession, dir: String): DataFrame =
    sortedBarrier(docs(s, dir),
      TextAnalysis.profile(docsSpread(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("lang_pred"),
          col("n_tokens").cast("long").as("n_tokens"),
          col("n_subwords_est").cast("long").as("n_subwords_est"),
          col("quality")),
      "doc_id")

  // fingerprint sketches, oracle-checked STRUCTURALLY: DuckDB cannot
  // reproduce xxhash64 values, but it can reproduce what the hashes are
  // FOR. Per doc we emit the content_hash group's size, canonical (min)
  // id, and the number of distinct winnowing fingerprints inside the
  // group; the oracle computes the same three numbers grouped on raw
  // `text`. Equality holds iff (a) content_hash is deterministic and
  // injective on the corpus — a merge of two texts or a split of one
  // changes a group size — and (b) the fingerprint is a pure function of
  // the text (one distinct fingerprint per content group). Fingerprint
  // injectivity is NOT claimed: winnowing intentionally collides on
  // near-dups. Raw hex determinism stays asserted in TextAnalysisSpec.
  def t2_fingerprint(s: SparkSession, dir: String): DataFrame = {
    val wH = org.apache.spark.sql.expressions.Window.partitionBy("content_hash")
    TextAnalysis.profile(docsSpread(s, dir), "doc_id", "text")
      .select(col("doc_id"), col("content_hash"),
        // explicit per-element hex: a transform() lambda here would be
        // CodegenFallback and drop the whole projection out of codegen
        concat_ws("-", (1 to 4).map(i =>
          hex(element_at(col("fingerprint"), i))): _*)
          .as("fp_hex"))
      .select(col("doc_id"),
        count(lit(1)).over(wH).as("hash_group_size"),
        min("doc_id").over(wH).as("hash_canonical_id"),
        size(collect_set(col("fp_hex")).over(wH)).cast("long")
          .as("n_fp_in_group"))
      .orderBy("doc_id")
  }

  // quality-filter pass rate per source — the curation aggregate
  def t3_quality_by_source(s: SparkSession, dir: String): DataFrame =
    docsSpread(s, dir)
      .select(col("source"), TextAnalysis.qualityScore(col("text")).as("q"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("q") >= 0.8, 1L).otherwise(0L)).as("n_pass"))
      .orderBy("source")

  // t5: eval-set decontamination — distinct shared 8-grams between each
  // corpus doc and a benchmark slice; the benchmark gram set is broadcast
  // so the corpus never shuffles (only matched doc_ids do)
  def t5_contamination(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    // corpus side spread (the t3/t23 single-split serial-scan fix);
    // the 20-doc benchmark side stays a plain pushed-filter scan
    TextAnalysis.contamination(
        Dedup.spreadIfUnderParallel(d.where(col("doc_id") >= 20)),
        d.where(col("doc_id") < 20),
        "doc_id", "text", n = 8)
      .orderBy("doc_id")
  }

  // t6: duplicate word-bigram fraction (Gopher repetition rule) —
  // deterministic, DuckDB-expressible via string bigrams (the hashed
  // shingles preserve distinct counts barring 64-bit collisions)
  def t6_repetition(s: SparkSession, dir: String): DataFrame =
    sortedBarrier(docs(s, dir),
      TextAnalysis.repetitionProfile(docs(s, dir), "doc_id", "text"),
      "doc_id")

  // t4: the composed curation pipeline — profile → language/quality
  // filter → exact dedup → near-dup removal (minhash LSH) → corpus stats.
  // The end-to-end shape a pre-training data pipeline runs. Fully
  // oracle-checked: the profile stage mirrors t2's expression-for-
  // expression SQL, exact dedup is a window, and the near-dup stage is
  // exact on this corpus for the same reason d2's oracle is (true pairs
  // at J >= 0.9, deterministic banding, verified pairs only).
  def t4_curation_pipeline(s: SparkSession, dir: String): DataFrame = {
    // profile's input is spread WITH the pushdown barrier: the `kept`
    // filter below references profile-derived columns (lang_pred,
    // quality), so PushDownPredicates substitutes the full tokenstats
    // expression into the filter and pushes it below a bare spread —
    // the whole profile pass ran ~20× inside the scan stage's Filter
    // on ONE task, in BOTH recompute branches (2 × 1.7 s single-task
    // stages, StageProfile r14). The recompute-twice design below is
    // still the documented winner; the barrier just keeps each
    // recompute cluster-wide and single-evaluation.
    val profiled = TextAnalysis.profile(
        Dedup.spreadBarrier(docs(s, dir), "t4"), "doc_id", "text")
      // Second pushdown barrier ABOVE the profile projection: the `kept`
      // filter references profile-DERIVED columns, and un-barriered
      // PushDownPredicates substitutes the full tokenstats expression
      // into the filter condition — 20 tokenstats(split(...)) copies per
      // row in the r16 before-plan, per recompute branch. FilterExec
      // codegen does NO subexpression elimination on its condition
      // (unlike ProjectExec), so every copy ran. Behind the barrier the
      // profile Project computes tokenstats ONCE per row (runtime CSE)
      // and the filter reads plain attributes. Same observe trick as
      // spreadBarrier; the name repeats across the recompute branches
      // (one logical node, cloned with the subtree) — that is legal,
      // only distinct observe() calls need distinct names.
      .observe("graft_t4_profile",
        org.apache.spark.sql.functions.count(lit(1)).as("rows"))
      .join(docs(s, dir).select(col("doc_id"), col("text"), col("source")), "doc_id")
    val kept = profiled
      .where(col("lang_pred") =!= "unknown" && col("quality") >= 0.5)
    // `exact` is consumed twice (near-dup detection + anti-join);
    // recomputing the pruned-column DAG per consumer is the measured
    // winner at sf0.1: recompute-twice 4.97s vs wide persist 7.5s,
    // narrow persist incl. text 6.4s, tiny no-text persist + parquet
    // text re-read 7.5s — every variant that moves corpus text through
    // the block store or an extra shuffle loses to re-scanning parquet
    // with pushdown. Same calculus at 100 TB: text is the corpus itself.
    val exact = Dedup.exact(kept, "doc_id", Seq("text"))
    val nearDupIds = Dedup.minhashNearDuplicates(exact, "doc_id", "text",
        shingleWidth = 3, numHashes = 128, bands = 16, threshold = 0.8)
      .select(col("id_b").as("doc_id")).distinct() // drop the higher id
    val surviving = exact.join(nearDupIds, Seq("doc_id"), "left_anti")
    surviving.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("n_tokens"))
      .orderBy("source")
  }

  // t22: C4 line-level cleaning — the corpus ships single-line word-soup
  // documents, so (the t7 pattern) the entry PLANTS a line structure
  // deterministically: an 8-word sentence, a brace line (doc_id%3=0), a
  // "lorem ipsum" line (doc_id%5=0), a 3-word fragment, and a tail
  // sentence — then cleans it. Each planted line violates exactly one
  // rule (braces, boilerplate, min-words/punctuation), so a rule
  // regression flips specific n_kept values and hash-mismatches; the
  // oracle replays the planting and all four predicates.
  def t22_c4_line_clean(s: SparkSession, dir: String): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    val n = size(toks)
    val lineA = concat(array_join(slice(toks, 1, 8), " "), lit("."))
    val lineD = array_join(slice(toks, 9, 3), " ")
    val lineE = array_join(
      concat(slice(toks, lit(12), greatest(n - 11, lit(0))),
        array(lit("end"), lit("of"), lit("doc."))), " ")
    val none = array().cast("array<string>")
    val planted = docsSpread(s, dir).select(col("doc_id"),
      array_join(concat(
        array(lineA),
        when(col("doc_id") % 3 === 0,
          array(lit("{ config = true }"))).otherwise(none),
        when(col("doc_id") % 5 === 0,
          array(lit("lorem ipsum dolor sit amet."))).otherwise(none),
        array(lineD),
        array(lineE)), "\n").as("text"))
    TextAnalysis.c4LineClean(planted, "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_lines"), col("n_kept"),
        col("text_kept"))
      .orderBy("doc_id")
  }

  // t23: log-template mining (the masking half of Drain) — 10k raw log
  // lines collapse to 5 templates. Messages are planted deterministically
  // from events (the t7 pattern): every variable token the masker must
  // catch appears — decimal ids, an IPv4, a 12-char hex request id —
  // against the event_type literal that must SURVIVE masking. All
  // arithmetic in the plant is integer (floor(value·100) before any
  // cast), and the oracle replays the identical plant + the identical
  // 4-rule regexp_replace chain, so a rule-order regression (numbers
  // masked before the IP, hex before the UUID) changes the template
  // strings and hash-mismatches.
  private def t23Message(): Column = concat(
    col("event_type"), lit(" user="), col("user_id").cast("string"),
    lit(" v="), floor(col("value") * 100).cast("long").cast("string"),
    lit(" src=10.0."), expr("user_id div 256").cast("string"),
    lit("."), (col("user_id") % 256).cast("string"),
    lit(" req="), lpad(lower(hex(col("event_id"))), 12, "0"))

  def t23_log_templates(s: SparkSession, dir: String): DataFrame = {
    // The 4-rule masking chain is the whole cost of this query (~25 µs
    // per line), and the sandbox events table is ONE parquet split — an
    // unspread scan runs every regex on one core (measured 0.84 s of a
    // 1.16 s wall at sf0.1). Spread the NARROW source columns (the
    // message is built after the exchange, so raw text never shuffles)
    // across the cluster first; identity at scale, where the scan
    // already carries more splits than cores.
    val m = Dedup.spreadIfUnderParallel(
      Tables.load(s, dir, "events")
        .where(col("value").isNotNull)
        .select(col("event_type"), col("user_id"), col("value"),
          col("event_id")))
      .select(t23Message().as("msg"))
    TextAnalysis.logTemplates(m, col("msg"))
      .orderBy(desc("n"), col("template"))
  }

  // t24: token-distribution drift between the English slice and the
  // rest of the corpus — the data-ops gate before mixing a new batch
  // into a training corpus. One explode pass, one token-keyed
  // aggregation (two long partials per token), a 1-row total broadcast,
  // TakeOrderedAndProject top-50. diff_num = |c_a*N_b - c_b*N_a| is the
  // exact integer numerator of the probability drift |p_A - p_B| — no
  // floating point anywhere, so the ranking and the hash are
  // engine-independent by construction (DuckDB replays the products
  // through HUGEINT).
  def t24_token_drift(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenDrift(docs(s, dir), "text", col("lang") === "en")
      .orderBy(desc("diff_num"), col("token"))
      .limit(50)

  // d17: content-defined-chunk dedup — CDC boundaries (trailing-8-char
  // polynomial hash ≡ 0 mod 64, expected chunk ≈ 64 chars) land INSIDE
  // the corpus's ~500-char planted duplicate spans, so donor/copy pairs
  // share their interior chunks even though the spans sit at different
  // offsets. The oracle replays the identical per-position nested-mod
  // hash, the same lag()-derived chunk spans, and the dedup decision on
  // chunk TEXT (the d12 stance: Spark shuffles 64-bit chunk hashes).
  def d17_cdc_chunks(s: SparkSession, dir: String): DataFrame =
    Dedup.cdcChunkStats(docs(s, dir), "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_chunks"),
        col("n_dup_chunks"), col("dup_chars"))
      .orderBy("doc_id")

  // d18: exact n-gram decontamination (train/test-overlap scrub, Brown
  // et al. 2020 app. C) — eval corpus = every 11th doc (a benchmark-
  // sized slice), train = the rest; a train doc is contaminated iff it
  // shares an 8-token shingle with ANY eval doc (the corpus's planted
  // near-dup structure crosses the slice boundary, so hits exist at
  // every SF). Scale shape in Dedup.decontaminate: eval shingle set
  // broadcasts, train side is one map pass + per-doc count — no text
  // shuffles. The oracle replays the same whitespace tokens, truncated-
  // shingle rule, and distinct-overlap count.
  def d18_decontaminate(s: SparkSession, dir: String): DataFrame = {
    // eval slice BOUNDED (id < 10000 ∧ ≡0 mod 11): a benchmark doesn't
    // grow with the training corpus, and the operator's broadcast
    // contract needs the eval shingle set benchmark-sized — the first
    // sf1 soak measured the unbounded slice at 28 s (a ~3M-shingle
    // broadcast); bounded it stays a few hundred docs at any SF
    val d = docs(s, dir)
    val isEval = col("doc_id") % 11 === 0 && col("doc_id") < 10000
    Dedup.decontaminate(
        d.where(!isEval), "doc_id", "text",
        d.where(isEval), "text", w = 8)
      .select(col("doc_id"), col("n_hits").cast("long").as("n_hits"))
      .orderBy("doc_id")
  }

  // t7: PII redaction — the synthetic corpus is PII-free, so the entry
  // plants deterministic PII (email / IP / SSN-shaped / phone-shaped
  // strings derived from doc_id) and scrubs it with the codegen'd
  // regexp_replace chain; the oracle replays the identical plant + scrub
  // in DuckDB (patterns are RE2/Java-compatible by construction). Output
  // proves both the match counts and the redacted text lengths per
  // source. Map-only stage: at corpus scale this adds zero shuffles.
  private def t7Augmented(idCol: Column, textCol: Column): Column = {
    def z(c: Column, w: Int) = lpad(c.cast("string"), w, "0")
    concat(textCol,
      lit(" Contact user"), idCol.cast("string"),
      lit("@example.com from 10."), (idCol % 256).cast("string"),
      lit(".0."), (idCol % 100).cast("string"),
      lit(" call 555-"), z(idCol % 1000, 3), lit("-"), z(idCol % 10000, 4),
      lit(" ssn "), z(idCol % 1000, 3), lit("-"), z(idCol % 100, 2),
      lit("-"), z(idCol % 10000, 4))
  }

  def t7_pii_redact(s: SparkSession, dir: String): DataFrame =
    docsSpread(s, dir)
      .select(col("source"),
        t7Augmented(col("doc_id"), col("text")).as("_aug"))
      .select(col("source"),
        TextAnalysis.piiCounts(col("_aug")).as("c"),
        length(TextAnalysis.redactPii(col("_aug"))).as("rlen"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("c.n_email").cast("long")).as("n_email"),
        sum(col("c.n_ip").cast("long")).as("n_ip"),
        sum(col("c.n_ssn").cast("long")).as("n_ssn"),
        sum(col("c.n_phone").cast("long")).as("n_phone"),
        sum(col("rlen").cast("long")).as("redacted_chars"))
      .orderBy("source")

  // t9: corpus vocabulary / document-frequency statistics — the global
  // term table a curation pipeline derives for stopword discovery, df
  // cutoffs, and prefix-filter indexes. explode(distinct tokens) →
  // groupBy(token): partial aggregation absorbs token skew map-side;
  // the shuffle carries (token, partial count), never document text.
  def t9_vocab_df(s: SparkSession, dir: String): DataFrame =
    docsSpread(s, dir)
      .select(explode(array_distinct(
        TextAnalysis.tokens(col("text")))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .orderBy(desc("df"), col("token"))
      .limit(50)

  // t11: real BPE tokenization — merges trained once per dataset (a plan
  // constant, like the IVF centroids), greedy encode per row inside
  // codegen. The oracle checks the codec end-to-end: decoding the
  // subword stream must reproduce the whitespace-normalized document,
  // which DuckDB computes directly. Merge-table quality and subword
  // counts are asserted in BpeSpec (hand-derived merges, round trips,
  // partition determinism).
  private val bpeMerges = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(String, String)]]()

  private def bpeFor(s: SparkSession, dir: String): Seq[(String, String)] =
    bpeMerges.computeIfAbsent(dir, { d =>
      graft.functions.Bpe.train(docs(s, d), "text", numMerges = 200)
    })

  def t11_bpe_roundtrip(s: SparkSession, dir: String): DataFrame = {
    val merges = bpeFor(s, dir)
    docsSpread(s, dir).select(col("doc_id"),
        trim(regexp_replace(
          concat_ws("", graft.functions.Bpe.encode(col("text"), merges)),
          graft.functions.Bpe.EndOfWord, " ")).as("decoded"))
      .orderBy("doc_id")
  }

  /** Fixed merge table for the ORACLED stats entry: the four pairs share
    * no symbols (8 distinct letters, none reappearing in a merged token),
    * so greedy rank order cannot interfere and the subword count has a
    * closed form — chars + 1 − Σ non-overlapping pair occurrences — that
    * an independent SQL implementation (left-to-right `replace`
    * counting) replays exactly. The production path (corpus-trained
    * merges) stays oracled by t11's decode∘encode round-trip. */
  private val t12FixedMerges =
    Seq("t" -> "h", "e" -> "r", "i" -> "n", "o" -> "u")

  // t12: tokenizer-grade corpus statistics — per-source subword counts
  // and compression vs whitespace tokens, the budgeting table a real
  // pipeline derives. The REAL greedy encoder (same codegen expression
  // the trained path uses) runs against the fixed merge table above, so
  // its merge application is externally verified pair by pair.
  def t12_bpe_stats(s: SparkSession, dir: String): DataFrame = {
    docsSpread(s, dir).select(col("source"),
        size(graft.functions.Bpe.encode(col("text"), t12FixedMerges)).as("n_sub"),
        TextAnalysis.tokenCount(col("text")).as("n_tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_sub").cast("long")).as("n_subwords"),
        sum(col("n_tok").cast("long")).as("n_tokens"))
      .orderBy("source")
  }

  // t13: CCNet-style LM quality scoring — per-token negative
  // log-likelihood under an add-one unigram LM trained on the reference
  // half of the corpus (doc_id < 250, the same history convention d7/d9
  // use). The classic perplexity filter's score column; the oracle
  // replays counts, smoothing, and the round-9 decimal-accumulated NLL.
  def t13_lm_score(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    sortedBarrier(d,
      TextAnalysis.lmScore(d, "doc_id", "text",
          d.where(col("doc_id") < 250), "text")
        .select(col("id").as("doc_id"), col("n_tok"),
          round(col("avg_nll"), 4).as("avg_nll")),
      "doc_id")
  }

  // t14: per-document TF-IDF mass — explode → (doc, token) counts →
  // document-frequency join (AQE-broadcast while the vocab fits) →
  // round-9 DECIMAL-accumulated per-doc sum (the t13 determinism
  // contract). The oracle replays counts, idf = ln(N/df), and the
  // decimal accumulation term-for-term.
  def t14_tfidf(s: SparkSession, dir: String): DataFrame =
    sortedBarrier(docs(s, dir),
      TextAnalysis.tfidf(docsSpread(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_tokens"), col("tfidf")),
      "doc_id")

  // t15: fastText-style linear classifier scoring — bounded vocabulary
  // (top-32 reference-half DF tokens, deterministic analytic weights) as
  // a plan-constant map, then MAP-ONLY scoring: no explode, no join, no
  // shuffle over the scored corpus (PlanShapeSpec pins zero exchanges).
  // The oracle rebuilds vocab, weights, per-term rounding, and the
  // decimal accumulation term-for-term.
  def t15_classifier_score(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    sortedBarrier(d,
      TextAnalysis.linearClassifierScore(d, "doc_id", "text",
          d.where(col("doc_id") < 250), "text")
        .select(col("id").as("doc_id"), col("n_tok"), col("score"),
          col("keep")),
      "doc_id")
  }

  // p10: sequence-length histogram in power-of-2 bins — the length
  // distribution that sizes p5's packing window and flags truncation
  // loss. Exact integer binning via the binary-representation length
  // (floor(log2) without floating-point: `length(bin(n)) - 1`, identical
  // in Spark and DuckDB — a float log2 diverges at exact powers of two).
  // One partial/final aggregation; the shuffle carries ~20 bin rows.
  def p10_length_histogram(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))
      .select((length(bin(col("n_tok"))) - 1).cast("long").as("len_bin"),
        col("n_tok"))
      .groupBy("len_bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        min(col("n_tok")).as("min_tok"),
        max(col("n_tok")).as("max_tok"))
      .orderBy("len_bin")

  // s21: Johnson–Lindenstrauss random projection 64 → 8 dims — the
  // map-only dimensionality-reduction step ahead of ANN/clustering at
  // corpus scale (no shuffle, no state; the ±1 projection matrix is
  // pure integer arithmetic regenerated per element, never stored).
  // Replayability contract (t14's): each element is rounded to 9
  // decimals, so sums are order-independent. The rounded terms are
  // carried as SCALED LONGS (nano-units) rather than DECIMAL(27,9):
  // round(v·sgn, 9) = sgn·round(v, 9) (HALF_UP is sign-symmetric), so
  // the per-element round happens ONCE (k-independent). All 8 dot
  // products then run in one compiled pass per row
  // (functions.JlProjectMicros) — the per-dim interpreted
  // aggregate/zip_with/sequence formulation regenerated the sign
  // sequence through boxed lambdas, 8×dim expression evaluations per
  // row, and was the one >2×-vs-oracle entry whose gap GREW with scale
  // (r10 verdict: 5.9× at sf0.1 → 6.9× at sf1). The expression's
  // integer micro rounding and /1e6 agree exactly with the oracle's
  // CAST(round(DECIMAL, 6) AS DOUBLE), so the DuckDB formulation is
  // unchanged. The 8 element_at projections share one JlProjectMicros
  // subtree, evaluated once per row by codegen subexpression
  // elimination (verified in the generated code).
  def s21_random_projection(s: SparkSession, dir: String): DataFrame = {
    val k = 8
    // the round-9-to-nanos conversion happens INSIDE the expression
    // (exact tie-correct double→long, see JlProjectMicros.nanosOf): a
    // transform(...) HOF here would run 64 interpreted boxed lambda
    // evaluations per row — the exact cost class this entry sheds
    val proj = graft.functions.SketchExpressions.jlProjectMicros(
      col("embedding").cast("array<double>"), k)
    embs(s, dir)
      .select(col("vec_id") +:
        (0 until k).map(j => element_at(proj, j + 1).as(s"p$j")): _*)
      .orderBy("vec_id")
  }

  // s29: embedding near-dup via 64-bit sign-random-projection codes —
  // the cosine analogue of d3/m12: SRP (Charikar's simhash for real
  // vectors) maps angle to expected hamming, so "cosine near-dup" joins
  // become the SAME banded hamming-<=k self-join (candidates ∝ band
  // buckets, full recall at the radius by chunk pigeonhole), with no n²
  // stage anywhere — the scale path SemDeDup (s12) trades recall for
  // and brute-force cosine (d5-style) can't offer. Projections reuse
  // s21's exact-integer discipline: elements rounded to 9 dp, carried
  // as nano-unit longs, ±1 signs regenerated per (j, i) — the sign bit
  // is an exact-integer comparison, so the DuckDB oracle (DECIMAL(27,9)
  // sums, brute-forced pairs) is decision-identical.
  def s29_srp_hamming_neardup(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"),
      transform(col("embedding").cast("array<double>"),
        v => round(round(v, 9) * lit(1e9), 0).cast("long")).as("nanos"))
    val packed = e.select(col("vec_id"),
      graft.functions.SketchExpressions.srpCode64(col("nanos")).as("sh"))
    Dedup.hammingNearDuplicates64(packed, "vec_id", "sh", maxHamming = 3)
      .select(col("id_a"), col("id_b"),
        col("hamming").cast("long").as("hamming"))
      .orderBy("id_a", "id_b")
  }

  // s36: s29's density-scaled twin — signature width (and with it the
  // hamming radius: E[hamming] at a fixed angle ∝ width) tracks corpus
  // size via Dedup.autoSrpParams, so the per-chunk key space stays
  // ahead of n and the within-bucket candidate term stops growing (the
  // s29 fixed-64-bit creep, sf10 slope 0.88 — the same lesson
  // Similarity.autoBits applied to hyperplane LSH). At the sf0.01
  // verification floor the rule selects (64, 3), so the oracle is
  // PINNED to s29's exact semantics there; the rule itself is mirrored
  // in the oracle SQL (CASE over count(*)), so a testdata-size change
  // moves both sides together. Recall here is STRUCTURAL (chunk
  // pigeonhole), not probabilistic — the in-entry gate therefore
  // checks the banded join against directly-computed pairwise hamming
  // on TWO id subsets: the lowest 50 ids (dense in planted near-dup
  // pairs — a chunk-extraction or bucketing bug surfaces as a missing
  // pair at every scale the soak runs) UNIONED with ~50 hash-selected
  // ids spread uniformly through the id space. The second subset is
  // what makes maxBucket-cap loss OBSERVABLE: the cap's row_number
  // orders by id, so low ids always rank inside the cap and can never
  // witness a capped-out pair; a rank-uniform id can, so an overflowing
  // bucket that silently drops pairs fails this gate at soak scale
  // instead of shipping reduced recall.
  def s36_srp_neardup_auto(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val n = e.count()
    val (w, h) = Dedup.autoSrpParams(n)
    val packed = e.select(col("vec_id"),
      graft.functions.SketchExpressions.srpCodeWide(
        col("embedding").cast("array<double>"), w).as("sig"))
    // UNCAPPED: this entry's contract is full structural recall (the
    // gate below asserts it), and at the ladder's 192-bit saturation
    // point the default 1000-row bucket cap measurably bites (sf10: 44%
    // of banded rows in over-cap buckets — every one a silently lost
    // candidate). The cap stays the default for generic callers; here
    // the quadratic-volume guard is the width ladder itself.
    val pairs = Dedup.hammingNearDuplicatesWide(packed, "vec_id", "sig",
      w, h, maxBucket = Int.MaxValue)
    gateOnce(dir + "#s36") {
      val stride = math.max(1L, n / 50)
      def inGate(c: Column): Column =
        c < 50 || pmod(xxhash64(c), lit(stride)) === 0
      val sub = packed.where(inGate(col("vec_id"))).cache()
      val direct = sub.select(col("vec_id").as("id_a"), col("sig").as("sig_a"))
        .crossJoin(
          sub.select(col("vec_id").as("id_b"), col("sig").as("sig_b")))
        .where(col("id_a") < col("id_b"))
        .where(graft.functions.SketchExpressions
          .hammingWords(col("sig_a"), col("sig_b")) <= h)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val found = pairs.where(inGate(col("id_a")) && inGate(col("id_b")))
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      sub.unpersist()
      require(found == direct, s"banded hamming recall gap at " +
        s"(w=$w, h=$h): missing ${(direct -- found).take(5)}, " +
        s"spurious ${(found -- direct).take(5)}")
    }
    pairs.select(col("id_a"), col("id_b"),
        col("hamming").cast("long").as("hamming"))
      .orderBy("id_a", "id_b")
  }

  // s20: inverted-index build + conjunctive retrieval — the posting-list
  // structure every corpus-scale term query stands on. The index (term →
  // sorted doc postings + df) is materialized ONCE per dataset as a
  // parquet artifact (like p9's shard export); the conjunctive query
  // then reads ONLY the queried terms' rows (term filter pushed to the
  // index scan — O(df) retrieval, never a corpus scan) and intersects
  // postings by explode + count. The hash match proves the round-tripped
  // index contains exactly the corpus's postings.
  private val invIndexDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def invertedIndexDir(s: SparkSession, dir: String): String =
    invIndexDirs.computeIfAbsent(dir, { d =>
      val out = graft.Tables.tmpDirFor("graft_invidx", d)
      docs(s, d)
        .select(col("doc_id"),
          explode(Dedup.tokens(col("text"))).as("term"))
        .distinct()
        .groupBy(col("term"))
        .agg(sort_array(collect_list(col("doc_id"))).as("postings"),
          count(lit(1)).as("df"))
        .write.mode("overwrite").parquet(out)
      out
    })

  def s20_inverted_index(s: SparkSession, dir: String): DataFrame = {
    val terms = Seq("query", "vector")
    s.read.parquet(invertedIndexDir(s, dir))
      .where(col("term").isin(terms: _*))
      .select(explode(col("postings")).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"))
      .where(col("n_terms") === terms.size)
      .orderBy("doc_id")
  }

  // p13: curriculum binning — quartile buckets of document length (the
  // shortest-first ordering curricula schedule over). Thresholds are
  // EXACT corpus order statistics from the distributed-selection helper
  // (no global sort, no low-cardinality window trap), broadcast back as
  // a 1-row frame; binning is a map-side comparison. Ties sit in the
  // lower bin (value > threshold moves up) — deterministic, and the
  // oracle replays the same rank convention floor(q·(N−1))+1.
  def p13_curriculum_bins(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    val th = graft.operators.Quantiles.exactByGroup(
        d.withColumn("_all", lit("all")), "_all", col("n_tokens"),
        Seq(("t25", 0.25), ("t50", 0.5), ("t75", 0.75)))
      .select(col("t25"), col("t50"), col("t75"))
    d.crossJoin(broadcast(th))
      .select(col("doc_id"), col("n_tokens"),
        ((col("n_tokens") > col("t25")).cast("long") +
          (col("n_tokens") > col("t50")).cast("long") +
          (col("n_tokens") > col("t75")).cast("long")).as("bin"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------- multimodal

  // m1: REAL image decode end-to-end — genuine BMP containers (written
  // by the deterministic fixture encoder) decoded back through
  // javax.imageio to pixels, with dimensions, mean luminance, and
  // container byte size derived from the decoded raster. The oracle
  // replays the pixel function and the BMP size formula analytically —
  // a wrong header, row order, padding, or channel read diverges.
  def m1_multimodal_features(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticImageTable(
      docs(s, dir).where(col("doc_id") < 200), "doc_id")
    Multimodal.decodeImages(media)
      .select(col("media_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        round(col("mean_lum"), 4).as("mean_lum"), col("n_bytes"))
      .orderBy("media_id")
  }

  // m3: byte-level media validation — REAL compute (no codec): container
  // format from magic bytes + Shannon entropy of the payload histogram,
  // rolled up per detected format. Oracled: the payload is magic-header
  // + utf-8 text with an id-arithmetic format choice, so DuckDB rebuilds
  // the exact byte multiset and replays the 0..255-ordered entropy sum.
  def m3_format_detect(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticMediaTable(
      docs(s, dir).where(col("doc_id") < 200), "doc_id", "text")
    media.select(
        Multimodal.detectFormat(col("payload")).as("detected"),
        Multimodal.byteEntropy(col("payload")).as("ent"))
      .groupBy("detected")
      .agg(count(lit(1)).as("n"),
        round(sum(col("ent").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 4).as("mean_entropy"))
      .orderBy("detected")
  }

  // m2: frame sampling over REAL pixel data — every 4th scanline of the
  // decoded raster (capped at 8), each with its decoded mean luminance.
  // Oracle = the same rows from the analytic pixel function.
  def m2_frame_sample(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticImageTable(
      docs(s, dir).where(col("doc_id") < 100), "doc_id")
    Multimodal.sampleImageRows(media, everyN = 4, maxFrames = 8)
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("row_y").cast("long").as("row_y"),
        round(col("row_mean_lum"), 4).as("row_mean_lum"))
      .orderBy("media_id", "frame_idx")
  }

  // m11: luminance histogram over REAL decoded BMP pixels — the
  // exposure/contrast profile image-curation filters threshold on.
  // The fixture images are decodable containers with analytic pixels
  // (fixturePixel = (id·31 + x·7 + y·13) mod 256), so the oracle
  // regenerates the exact pixel multiset from the formula over the
  // (x, y) grid and counts the same integer buckets — a full
  // round-trip proof of encode → container → decode → histogram.
  def m11_lum_histogram(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticImageTable(
      docs(s, dir).where(col("doc_id") < 100), "doc_id")
    Multimodal.lumHistogram(media, buckets = 8)
      .orderBy("media_id", "bucket")
  }

  // m4: REAL audio decode end-to-end — genuine RIFF/WAVE PCM16 containers
  // (written by the deterministic fixture encoder) decoded back through
  // javax.sound.sampled to samples, with rate, length, duration, energy,
  // and RMS derived from the decoded PCM. The oracle replays the sample
  // function and the 44-byte-header container size analytically — a
  // wrong header field, sample width, endianness, or channel count
  // diverges. rms = sqrt(sum_sq/n) is IEEE-exact on both sides: integer
  // sum_sq and n match exactly, and /, sqrt are correctly rounded.
  def m4_audio_decode(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticAudioTable(
      docs(s, dir).where(col("doc_id") < 200), "doc_id")
    Multimodal.decodeAudioClips(media)
      .select(col("media_id"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("n_samples"), col("duration_ms"), col("sum_sq"), col("rms"),
        col("n_bytes"))
      .orderBy("media_id")
  }

  // m7: perceptual-hash (aHash) image dedup over REAL decoded pixels —
  // genuine 32×32 BMPs whose consecutive id-triples share a block
  // pattern but differ in per-pixel noise; the 8×8 block-mean-vs-global-
  // mean bit string groups exactly the planted triples (distinct across
  // groups and noise-proof within them by fixture construction). The
  // oracle replays pixels → block sums → bits → grouping analytically.
  def m7_image_phash_dedup(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticNearDupImageTable(
      docs(s, dir).where(col("doc_id") < 150), "doc_id")
    val hashed = Multimodal.imageAHash(media)
    val byHash = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ahash"))
    hashed.select(col("media_id"),
        min(col("media_id")).over(byHash).as("dup_group"),
        count(lit(1)).over(byHash).as("group_size"))
      .orderBy("media_id")
  }

  // m12: hamming-radius perceptual image dedup — m7's exact-aHash
  // grouping misses re-encodes/small edits that flip a FEW bits, the
  // case perceptual hashing exists for. Fixture triples carry planted
  // 1–2-bit aHash damage (one inverted block per variant); the decoded
  // aHash packs to a 64-bit signature and the banded hamming-<=2
  // self-join (Dedup.hammingNearDuplicates64 — maxHamming+1 chunk
  // pigeonhole, FULL recall, candidates ∝ band buckets not n²) must
  // recover exactly the within-triple pairs at their exact distances.
  // The oracle replays pixels → damage → bits analytically and
  // brute-forces all pairs (sound because banded recall is total at
  // the radius).
  def m12_image_hamming_neardup(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticDamagedImageTable(
      docs(s, dir).where(col("doc_id") < 150), "doc_id")
    val packed = Multimodal.imageAHash(media)
      .withColumn("sh", expr(
        "aggregate(sequence(0, 63), 0L, (acc, i) -> acc | " +
          "IF(substring(ahash, i + 1, 1) = '1', shiftleft(1L, i), 0L))"))
    Dedup.hammingNearDuplicates64(packed, "media_id", "sh", maxHamming = 2)
      .select(col("id_a"), col("id_b"),
        col("hamming").cast("long").as("hamming"))
      .orderBy("id_a", "id_b")
  }

  // m13: near-duplicate VIDEOS by frame-hash voting — the multimodal
  // dedup class image-level hashing cannot see (re-encoded, trimmed, or
  // locally-edited clips). Real AVI decode map-side (payload bytes
  // never shuffle), per-frame aHash packed to one long, frame-level
  // banded hamming join (pigeonhole full recall at the radius, so the
  // brute-force oracle is decision-equal), then a vote: video pairs
  // sharing >= 2 frame matches at hamming <= 6. Planted structure:
  // id-triples share content with a trimmed (k=1) and a block-edited
  // (k=2) variant, so every triple must pair through BOTH damage
  // classes. 100 TB shape: decode+hash are one map pass, the join
  // carries (packed id, 64-bit hash) only, the vote is one aggregation
  // keyed by video pair.
  def m13_video_neardup(s: SparkSession, dir: String): DataFrame =
    m13VideoNearDup(s, dir, maxDocId = 120L)

  /** m13 body with the video-count gate as a parameter: the ORACLED
    * entry keeps the fixed 120-video corpus (its brute-force oracle
    * replays every planted pixel), while tools.MediaSoak drives the
    * same decode → frame-hash → banded-join → vote pipeline over the
    * full soak corpus to measure the decade-up slope the bounded entry
    * cannot show.
    *
    * The frame-hash WIDTH is auto-selected by corpus size
    * ([[Multimodal.autoFrameHashParams]], the s36/autoSrpParams
    * precedent): past ~128 frames the 64-bit hash's 9-bit band chunks
    * saturate structurally, so the DEFAULT shape is the 256-bit /
    * 36-bit-chunk configuration MediaSoak proved holds exact planted
    * recall at sf10 — the 64-bit path stays as the small-corpus fast
    * lane. The 120-video oracle corpus lands on the WIDE rung, so the
    * oracle replays the wide predicate: the fixture's pixels are
    * constant within each 4×4 block (64 cells of entropy), hence every
    * 16-block cell mean equals its containing 8-block value and the
    * 256-bit hash is the 64-bit hash with each bit duplicated 4× —
    * ham₂₅₆ = 4·ham₆₄ exactly, so `ham₂₅₆ ≤ 6 ⟺ ham₆₄ ≤ 1` (the CASE
    * in the oracle SQL). */
  private[graft] def m13VideoNearDup(s: SparkSession, dir: String,
      maxDocId: Long): DataFrame = {
    val vids = docs(s, dir).where(col("doc_id") < maxDocId)
    // frame upper bound (≤ 4 frames per video by the fixture
    // contract): a finite doc-id gate bounds it at PLAN time — no
    // count job; only the unbounded soak path pays the count(*) the
    // s36 oracle mirrors. Over-estimating can only push WIDE, the
    // scale-safe direction.
    val nFrames =
      if (maxDocId != Long.MaxValue) 4L * maxDocId
      else 4L * vids.select(col("doc_id")).count()
    val (blocks, width) = Multimodal.autoFrameHashParams(nFrames,
      maxHamming = 6)
    val media = Multimodal.syntheticNearDupVideoTable(vids, "doc_id")
    val packed = Multimodal.videoFrameAHashPacked(media, blocks)
      // frames-per-video < 64, so (media_id, frame_idx) packs
      // losslessly into one long and unpacks with div/mod
      .select((col("media_id") * 64 + col("frame_idx")).as("fid"),
        col("sig"))
    Dedup.hammingNearDuplicatesWide(packed, "fid", "sig", width,
        maxHamming = 6)
      .where(expr("id_a div 64") =!= expr("id_b div 64"))
      .groupBy(expr("id_a div 64").as("id_a"),
        expr("id_b div 64").as("id_b"))
      .agg(count(lit(1)).as("n_matches"))
      .where(col("n_matches") >= 2)
      .orderBy("id_a", "id_b")
  }

  // m8: audio fingerprint dedup over REAL decoded PCM — genuine WAV
  // clips whose consecutive id-triples share an 8-frame energy profile
  // under per-id sample noise; the frame-energy-vs-clip-mean bit string
  // (integer cross-multiplication) groups exactly the planted triples.
  // The oracle replays samples → frame energies → bits → grouping.
  def m8_audio_fingerprint(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticNearDupAudioTable(
      docs(s, dir).where(col("doc_id") < 120), "doc_id")
    val fp = Multimodal.audioFingerprint(media)
    val byFp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("afp"))
    fp.select(col("media_id"),
        min(col("media_id")).over(byFp).as("dup_group"),
        count(lit(1)).over(byFp).as("group_size"))
      .orderBy("media_id")
  }

  // m5: REAL video decode end-to-end — genuine RIFF/AVI containers with
  // uncompressed-DIB frames (written by the deterministic fixture
  // encoder) parsed back through the chunk walker to per-frame rasters,
  // with dimensions, frame count, container timing, and mean luminance
  // derived from the decoded frames. The oracle replays the per-frame
  // pixel function and the closed-form container size — a wrong chunk
  // layout, stride, row order, or frame timing diverges. (The MJPEG
  // codec variant is exercised in MultimodalSpec with decode tolerance;
  // JPEG is lossy so it cannot carry an exact-hash oracle.)
  def m5_video_decode(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticVideoTable(
      docs(s, dir).where(col("doc_id") < 200), "doc_id")
    Multimodal.decodeVideos(media)
      .select(col("media_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_frames").cast("long").as("n_frames"), col("duration_ms"),
        round(col("mean_lum"), 4).as("mean_lum"), col("n_bytes"))
      .orderBy("media_id")
  }

  // m6: video frame sampling over REAL decoded frames — every 2nd frame
  // (capped at 4) with its container timestamp and decoded mean
  // luminance. Oracle = the same rows from the analytic per-frame pixel
  // function and integer frame timing.
  def m6_video_frames(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticVideoTable(
      docs(s, dir).where(col("doc_id") < 100), "doc_id")
    Multimodal.sampleVideoFrames(media, everyN = 2, maxFrames = 4)
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("frame_ts_ms"),
        round(col("frame_mean_lum"), 4).as("frame_mean_lum"))
      .orderBy("media_id", "frame_idx")
  }

  // ------------------------------------------------------- round 6 ops

  // t16: Unicode canonicalization — NFC-compose, strip diacritics, lower
  // — via the custom codegen expressions (Spark ships no normalization
  // function). The fixture corpus is ASCII, where canonicalization is the
  // identity, so a planted non-ASCII family (the d3/m1 pattern) carries
  // the signal: composed é, DECOMPOSED e+U+0301 (NFC must fold these to
  // one form), accents and uppercase across scripts. Map-only, no
  // shuffle; the oracle replays with DuckDB's own
  // lower(strip_accents(nfc_normalize(...))) — an independent
  // implementation of the same Unicode algorithms, so agreement is a
  // real cross-engine check, not a tautology.
  def t16_normalize(s: SparkSession, dir: String): DataFrame = {
    val prefixes = array(
      lit("Café"), lit("Café"), lit("naïve RÉSUMÉ"),
      lit("Ångström"), lit("ñ São Ü"), lit("ASCII only"))
    docs(s, dir).where(col("doc_id") < 60)
      .select(col("doc_id"),
        concat(element_at(prefixes, (col("doc_id") % 6 + 1).cast("int")),
          lit(" "), col("text")).as("text"))
      .select(col("doc_id"),
        TextNormalize.canonical(col("text")).as("canon"))
      .select(col("doc_id"),
        substring(col("canon"), 1, 48).as("head"),
        length(col("canon")).cast("long").as("n_chars"))
      .orderBy("doc_id")
  }

  // k5: heavy hitters via a Misra–Gries summary UDAF — the frequent-items
  // path whose state is CAPPED at 256 (token, count) pairs per partial
  // no matter the vocabulary size (an exact groupBy count table grows
  // with the vocab — unbounded on web corpora). The fixture vocab is only
  // 31 tokens, so a planted long tail (40 distinct singleton tokens per
  // document, ~12800/128000 distinct at sf0.01/0.1) forces real
  // evictions. The MG guarantee — every token with true count >
  // N/(capacity+1) survives any merge tree — makes the summary a
  // candidate set; recounting the ≤256 candidates exactly (a narrow
  // filtered aggregation) and thresholding at T = N div 257 + 1 > N/257
  // yields the exact deterministic set {token: count ≥ T}: recall by the
  // theorem, precision by the recount. The oracle computes that set
  // directly.
  def k5_heavy_hitters(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val real = d.select(explode(Dedup.tokens(col("text"))).as("token"))
    val tail = d.select(explode(transform(sequence(lit(0L), lit(39L)),
      j => concat(lit("syn"), (col("doc_id") * 40 + j).cast("string"))))
      .as("token"))
    val tok = real.unionByName(tail)
    val m = 256
    val mg = tok.agg(HeavyHitters.mgSummary(col("token"), m).as("mg"))
      .head().getStruct(0)
    val n = mg.getLong(0)
    val cands = mg.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0))
    require(cands.size <= m,
      s"MG summary overflowed its capacity: ${cands.size} > $m")
    val t = n / (m + 1) + 1
    tok.where(col("token").isin(cands: _*))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= t)
      .orderBy(desc("cnt"), col("token"))
  }

  // s22: BM25 relevance scoring (the ranking layer over s20's posting
  // machinery, index-free one-pass form). The corpus-side shuffle
  // carries only (doc, query_term) hit rows — the explode is filtered to
  // the query terms BEFORE any exchange; df/N/avgdl are tiny broadcast
  // aggregates. Per-term round-9 + DECIMAL accumulation (the t13/t14
  // contract) keeps scores bit-stable under repartitioning; the oracle
  // replays idf/tf-saturation/length-norm term by term.
  def s22_bm25(s: SparkSession, dir: String): DataFrame =
    Retrieval.bm25(docs(s, dir), "doc_id", "text",
        Seq("join", "filter", "scan"), k = 25)
      .withColumnRenamed("id", "doc_id")

  // p14: leakage-free train/val/test split — whole SOURCES (domains) are
  // assigned to splits by a replayable integer hash of the group key
  // (fold h·31+ascii mod 2³¹, Knuth-mixed, thousandths bucket), so
  // near-duplicate documents from one site can never straddle the
  // train/eval boundary. Only the 20-row distinct-source frame is
  // hashed; the corpus passes one broadcast map-side join. 700/150
  // permille splits the fixture's 20 sources 15/3/2 — all three splits
  // non-empty at every SF.
  def p14_group_split(s: SparkSession, dir: String): DataFrame =
    Splits.groupSplit(docs(s, dir), "source",
        trainPermille = 700, valPermille = 150)
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("n_tokens"))
      .orderBy("source")

  // g1: fixed-iteration PageRank over a deterministic planted link graph
  // (doc i → (2i+1) mod N and (3i+2) mod N; N is even so in-degree is 3
  // for odd ids and 1 for even — genuinely non-uniform ranks). Five
  // rounds of join-aggregate dataflow in FIXED-POINT 1e-9 units — pure
  // 64-bit integer arithmetic end to end, so the result is bit-identical
  // under any partitioning and the oracle replays the iteration exactly
  // (a double pipeline was measured drifting 3e-9 across engines'
  // round conventions — see Graphs scaladoc).
  def g1_pagerank(s: SparkSession, dir: String): DataFrame = {
    val nodes = docs(s, dir).select(col("doc_id").as("id"))
    // plan-time scalar: the modulus of the planted edge generator
    val n = nodes.count()
    val edges = nodes.select(col("id").as("src"),
        ((col("id") * 2 + 1) % n).as("dst"))
      .unionByName(nodes.select(col("id").as("src"),
        ((col("id") * 3 + 2) % n).as("dst")))
    Graphs.pageRank(nodes, edges, iterations = 5)
      .select(col("id").as("doc_id"), col("rank_units"))
      .orderBy("doc_id")
  }

  // t17: robust outlier flagging on document length — median/MAD, the
  // quality-control filter that survives the heavy-tailed length
  // distributions where mean/stddev break (one 10M-token page drags the
  // mean past half the corpus). Thresholds are EXACT order statistics
  // from the distributed-selection helper (two passes, no global sort),
  // broadcast back as 1-row frames; flagging is a map-side comparison
  // of integer-valued doubles — exact in any engine. The oracle replays
  // the floor(q·(N−1))+1 rank convention as pure integer ranks.
  def t17_outlier_filter(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    val med = graft.operators.Quantiles.exactByGroup(
        d.withColumn("_all", lit("all")), "_all", col("n_tokens"),
        Seq(("med", 0.5))).select(col("med"))
    // Materialize the deviation frame once: it feeds the MAD quantile
    // AND the final flagging pass, and un-cut each consumer re-expanded
    // the tokenize + median subtree (3 tokenize passes over the corpus).
    // Narrow (id, n_tokens, dev) — the g2/t21 treatment. cutShared so a
    // durable checkpointDir posture registers the per-query rdd-N dir
    // for app-end deletion + releaseAll (no per-request leak).
    val dev = graft.operators.Lineage.cutShared(d.crossJoin(broadcast(med))
      .select(col("doc_id"), col("n_tokens"),
        abs(col("n_tokens") - col("med")).as("dev")))
    val mad = graft.operators.Quantiles.exactByGroup(
        dev.withColumn("_all", lit("all")), "_all", col("dev"),
        Seq(("mad", 0.5))).select(col("mad"))
    dev.crossJoin(broadcast(mad))
      .select(col("doc_id"), col("n_tokens"),
        col("dev").cast("long").as("dev"),
        (col("dev") > lit(3.0) * col("mad")).as("is_outlier"))
      .orderBy("doc_id")
  }

  // m9: scene-change detection over REAL decoded video frames —
  // consecutive-frame luminance deltas (the shot-boundary primitive
  // video curation cuts and samples by). Rides m5/m6's real RIFF/AVI
  // decode: payload bytes never shuffle, only (id, frame_idx, mean_lum)
  // scalars reach the lag window, which partitions per clip. The cut
  // predicate compares UNROUNDED doubles that both engines derive from
  // the same integer pixel sums — exact replay; only the reported delta
  // is display-rounded.
  def m9_scene_change(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticVideoTable(
      docs(s, dir).where(col("doc_id") < 100), "doc_id")
    val frames = Multimodal.sampleVideoFrames(media, everyN = 1, maxFrames = 8)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_idx"))
    frames
      .withColumn("prev", lag(col("frame_mean_lum"), 1).over(w))
      .where(col("prev").isNotNull)
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        round(col("frame_mean_lum") - col("prev"), 4).as("delta"),
        (abs(col("frame_mean_lum") - col("prev")) > 4.0).as("is_cut"))
      .orderBy("media_id", "frame_idx")
  }

  // m10: decode + nearest-neighbor resize to an 8×8 thumbnail over the
  // REAL decoded raster — integer source-index arithmetic, so the oracle
  // replays every sampled pixel analytically; thumb_chk position-weights
  // each pixel so a wrong index, row order, or transpose diverges.
  def m10_image_resize(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.syntheticImageTable(
      docs(s, dir).where(col("doc_id") < 200), "doc_id")
    Multimodal.resizeImages(media, outW = 8, outH = 8)
      .select(col("media_id"), col("src_w").cast("long").as("src_w"),
        col("src_h").cast("long").as("src_h"),
        col("thumb_sum"), col("thumb_chk"),
        round(col("thumb_sum").cast("double") / 64, 4).as("mean_lum"))
      .orderBy("media_id")
  }

  // t18: interpolated bigram LM scoring — the n-gram upgrade of t13's
  // unigram NLL (real perplexity filters are n-gram models). Bigrams
  // zip map-side (no posexplode self-join); the shuffle carries
  // (doc, w1, w2) rows; reference tables broadcast under AQE. Oracle
  // replays counts, smoothing, interpolation, and the round-9 decimal
  // accumulation pair-for-pair.
  def t18_bigram_lm(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    sortedBarrier(d,
      TextAnalysis.bigramLmScore(d, "doc_id", "text",
          d.where(col("doc_id") < 250), "text")
        .select(col("id").as("doc_id"), col("n_pairs"),
          round(col("avg_nll"), 4).as("avg_nll")),
      "doc_id")
  }

  // a18: exact WEIGHTED quantiles per language — token-weighted length
  // quantiles ("the document length below which a quarter / half / 90%
  // of the TOKENS live"), the curation statistic an unweighted median
  // misstates whenever long documents carry the mass. Spark has no
  // weighted percentile at all; this is the distributed-selection
  // helper extended to weight ranks (floor(q·(W−1))+1 over the
  // weight-expanded multiset). The oracle replays cumulative weights
  // over distinct values.
  def a18_weighted_quantiles(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("lang"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    graft.operators.Quantiles.exactWeightedByGroup(
        d, "lang", col("n_tokens"), col("n_tokens"),
        Seq(("w25", 0.25), ("w50", 0.5), ("w90", 0.9)))
      .select(col("lang"), col("w25").cast("long").as("w25"),
        col("w50").cast("long").as("w50"),
        col("w90").cast("long").as("w90"))
      .orderBy("lang")
  }

  // t19: Gopher-style quality rules (Rae et al. 2021, Appendix A) — the
  // published rule set most large-scale text pipelines start from: word
  // count bounds, mean word length, symbol-to-word ratio (#/ellipsis),
  // bullet-started and ellipsis-ended line fractions, alphabetic-word
  // ratio, and the ≥2-stopword test. Map-only over the corpus; every
  // ratio threshold is a CROSS-MULTIPLIED integer comparison (3·n ≤
  // chars, 5·alpha ≥ 4·words, …) so no float division exists to diverge
  // between engines. The alphabetic test is translate()-based — no
  // regex dialect in the contract.
  def t19_gopher_rules(s: SparkSession, dir: String): DataFrame = {
    val alphabet =
      "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    val gopherStops = Seq("the", "be", "to", "of", "and", "that",
      "have", "with")
    val toks = Dedup.tokens(col("text"))
    val lines = split(col("text"), "\n")
    val base = docsSpread(s, dir).select(
      col("doc_id"),
      size(toks).cast("long").as("n_words"),
      aggregate(transform(toks, w => length(w).cast("long")),
        lit(0L), (a, x) => a + x).as("char_sum"),
      size(filter(toks,
        w => length(translate(w, alphabet, "")) < length(w)))
        .cast("long").as("n_alpha"),
      size(filter(toks, w => w.isin(gopherStops: _*)))
        .cast("long").as("n_stop"),
      size(lines).cast("long").as("n_lines"),
      size(filter(lines, l => l.startsWith("-") || l.startsWith("•")))
        .cast("long").as("n_bullet"),
      size(filter(lines, l => l.endsWith("...")))
        .cast("long").as("n_ell_end"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "#", ""))).cast("long")
        .as("n_hash"),
      ((length(col("text")) -
        length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3)
        .cast("long").as("n_ell"))
    val rules = base.select(
        col("doc_id"), col("n_words"),
        (col("n_words") >= 50 && col("n_words") <= 100000).as("words_ok"),
        (lit(3L) * col("n_words") <= col("char_sum") &&
          col("char_sum") <= lit(10L) * col("n_words")).as("mwl_ok"),
        (lit(10L) * (col("n_hash") + col("n_ell")) <= col("n_words"))
          .as("sym_ok"),
        (lit(10L) * col("n_bullet") <= lit(9L) * col("n_lines"))
          .as("bullet_ok"),
        (lit(10L) * col("n_ell_end") <= lit(3L) * col("n_lines"))
          .as("ellipsis_ok"),
        (lit(5L) * col("n_alpha") >= lit(4L) * col("n_words"))
          .as("alpha_ok"),
        (col("n_stop") >= 2L).as("stop_ok"))
      .withColumn("keep",
        col("words_ok") && col("mwl_ok") && col("sym_ok") &&
          col("bullet_ok") && col("ellipsis_ok") && col("alpha_ok") &&
          col("stop_ok"))
    sortedBarrier(docs(s, dir), rules, "doc_id")
  }

  // p16: DSIR-style importance selection (Xie et al. 2023) — score each
  // raw document by how target-like its unigram distribution is
  // (log p_target(w)/p_raw(w), add-1 smoothed; target = the English
  // slice) and keep the top 50. Scoring is TextAnalysis.dsirScore: the
  // t13/t15-style size-gated compile (in-gate vocabulary → one
  // token→nano table walked in a single codegen pass, constants folded
  // at plan time; past the gate → explode + two broadcast joins + one
  // doc-keyed aggregation); selection is TakeOrderedAndProject.
  // Determinism: each token's log-ratio is one ln() of a ratio of exact
  // integer products (< 2^53), rounded to 9 decimals and carried as
  // nano-unit LONGS — the t13/t14 contract — integer-exact output.
  def p16_dsir_select(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.dsirScore(docs(s, dir), "doc_id", "text", "lang", "en")
      .select(col("id").as("doc_id"), col("lang"), col("n_tok"),
        col("score_nanos"))
      .orderBy(desc("score_nanos"), col("doc_id"))
      .limit(50)

  // s24: hybrid retrieval via reciprocal-rank fusion (Cormack et al.
  // 2009) — the standard way RAG/curation stacks combine a lexical
  // (BM25) and a dense (embedding cosine) ranker without score
  // calibration. Both legs are top-20 plans that already exist (s22's
  // BM25, s1's brute-force cosine over the doc-aligned vectors); fusion
  // touches 2×20 rows: a full-outer join on doc id, RRF mass
  // 1e9/(60+rank) rounded to integer nanos (exact in any engine), and
  // a 10-row TakeOrderedAndProject. Ranks use each leg's ROUNDED score
  // with id tie-break — the replayable order both engines agree on.
  def s24_rrf_fusion(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the two unpartitioned windows below rank each leg's TOP-K output
    // (k=20 rows), not the corpus — WindowExec's single-partition
    // warning is about a 20-row frame, bounded at any corpus size
    val terms = Seq("join", "filter", "scan")
    val lex = Retrieval.bm25(docsSpread(s, dir), "doc_id", "text", terms,
        k = 20)
      .select(col("id"),
        row_number().over(Window.orderBy(desc("score"), col("id")))
          .as("r_lex"))
    val dense = Similarity.bruteForceTopK(
        embs(s, dir).where(col("vec_id") < 500), "vec_id", "embedding",
        queryVec(s, dir), k = 20)
      .select(col("id"), round(col("score"), 6).as("score"))
      .select(col("id"),
        row_number().over(Window.orderBy(desc("score"), col("id")))
          .as("r_dense"))
    lex.join(dense, Seq("id"), "full_outer")
      .select(col("id").as("doc_id"),
        coalesce(col("r_lex"), lit(0)).cast("long").as("r_lex"),
        coalesce(col("r_dense"), lit(0)).cast("long").as("r_dense"),
        (coalesce(round(lit(1e9) / (lit(60) + col("r_lex")), 0), lit(0.0)) +
          coalesce(round(lit(1e9) / (lit(60) + col("r_dense")), 0),
            lit(0.0))).cast("long").as("rrf_nanos"))
      .orderBy(desc("rrf_nanos"), col("doc_id"))
      .limit(10)
  }

  // g2: per-document triangle counts over a planted in-block graph
  // (chain edges i→i+1 plus skip edges i→i+2 inside blocks of 50 —
  // every in-block consecutive triple closes a triangle). Runs the
  // degree-oriented wedge algorithm whose work is bounded by higher-
  // ordered neighborhoods (Graphs.triangleCounts); the oracle counts
  // the same triangles by naive triple self-join, which is feasible
  // exactly because it is DuckDB running on the fixture, not the
  // 100 TB path.
  def g2_triangle_count(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"))
    val e1 = d.where(pmod(col("doc_id"), lit(50)) =!= 49)
      .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
    val e2 = d.where(pmod(col("doc_id"), lit(50)) <= 47)
      .select(col("doc_id").as("src"), (col("doc_id") + 2).as("dst"))
    val edges = e1.unionByName(e2)
      .join(d.select(col("doc_id").as("dst")), Seq("dst")) // extant only
    Graphs.triangleCounts(d.select(col("doc_id").as("id")), edges)
      .select(col("id").as("doc_id"), col("n_triangles"))
      .orderBy("doc_id")
  }

  // g3: multi-source BFS hop distance — "how many clicks from a seed
  // page", the crawl-frontier depth signal quality pipelines bucket by
  // (seed-distance correlates with page quality in web corpora). The
  // planted graph is the d10 chain family plus +10 "express" edges, so
  // min-hop = greedy decomposition r = 10a + b → a + b hops, a closed
  // form the oracle computes arithmetically while the Spark side runs
  // the real 13-round frontier iteration (delta frontier, one O(|E|)
  // shuffle per round — see Graphs.bfsHops).
  def g3_bfs_hops(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"))
    val step1 = d.where(pmod(col("doc_id"), lit(50)) =!= 49)
      .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
    val step10 = d.where(pmod(col("doc_id"), lit(50)) <= 39)
      .select(col("doc_id").as("src"), (col("doc_id") + 10).as("dst"))
    val edges = step1.unionByName(step10)
      .join(d.select(col("doc_id").as("dst")), Seq("dst")) // extant nodes only
    val sources = d.where(pmod(col("doc_id"), lit(50)) === 0)
      .select(col("doc_id").as("id"))
    Graphs.bfsHops(edges, sources, maxHops = 13)
      .select(col("id").as("doc_id"), col("dist"))
      .orderBy("doc_id")
  }

  // p17: compaction planning — bin-pack small segment files into
  // ~target-byte compaction groups (the small-file problem: a streaming
  // ingest lands thousands of KB-scale rollup segments per hour — the
  // reference's collector emits one per closed block — and scan
  // efficiency needs them re-packed toward the parquet row-group
  // sweet spot). Greedy first-fit in file order = assign each file the
  // bin its cumulative START offset falls in: one window cumsum per
  // source partition, exact integer arithmetic end-to-end. At 100 TB
  // the frame is manifest-sized (one row per FILE, not per data row),
  // so even a million-file table plans in one executor wave.
  def p17_compaction_plan(s: SparkSession, dir: String): DataFrame = {
    val target = 25000L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Long.MinValue, -1)
    docs(s, dir).select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("start_off", coalesce(sum(col("n_chars")).over(w), lit(0L)))
      .withColumn("bin", expr(s"start_off div $target"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("n_chars")).as("bytes"),
        min(col("doc_id")).as("first_id"), max(col("doc_id")).as("last_id"))
      .orderBy("source", "bin")
  }

  // d14: fuzzy (edit-distance) dedup pairs — catches the OCR-noise /
  // minor-edit duplicate class where token-set measures (d2/d4) stay
  // high but byte-exact d1 misses. Quadratic lev(a, b) can never run
  // all-pairs at corpus scale, so candidates are BLOCKED on
  // (lang, length-bucket, aligned PassJoin segment): content blocking
  // (see d14Pairs) composed with the |Δn| ≤ 24 length constraint keyed
  // in (probe side on floor(n/50), seg side on the 1–2 buckets covering
  // n ± 24 — exact coverage, r16). The distance
  // runs on fixed 40-char prefixes with Spark's THRESHOLDED
  // levenshtein(l, r, k): the banded O(len·k) computation short-circuits
  // to -1 past k=10, which cut the sf0.1 bench from 44 s to ~1 s versus
  // the unbounded 80² variant — the per-pair constant is the whole cost
  // of a blocked similarity join. distinct() collapses the ≤ 2 grid
  // hits per pair. The oracle brute-forces the same predicate with
  // DuckDB's unbounded levenshtein (≤ k filters identically; only pairs
  // within the band are emitted, where banded == exact).
  def d14_fuzzy_join(s: SparkSession, dir: String): DataFrame = {
    val pairs = d14Pairs(s, dir)
    pairs
      .withColumn("dist",
        levenshtein(col("pfx_a"), col("pfx_b"), 10).cast("long"))
      .where(col("dist") >= 0 && col("dist") <= 10)
      // pair dedup happens HERE, on the verified survivors (thousands),
      // not on the raw candidate stream (tens of millions at sf10): the
      // old pre-verify distinct() exchanged the full candidate stream
      // once just to collapse multi-segment grid hits, and the final
      // orderBy's range-sampling job then re-executed the whole verify
      // pipeline a second time. The min() is inert (duplicates carry
      // identical dist) — the aggregate exists to dedup and to give the
      // sort a materialized exchange to sample. Measured r13 at sf10:
      // 146 s → see PLANS.md (with the probe-window and attach fixes
      // below).
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("dist")).as("dist"))
      .orderBy("id_a", "id_b")
  }

  /** d14's candidate funnel up to (but not including) the banded
    * levenshtein verify: PassJoin segment blocking → prefix attach.
    * Duplicate pairs (a pair can share several aligned segments) are
    * NOT collapsed here — the entry dedups after verify, where the
    * stream is thousands of rows instead of tens of millions. Exposed
    * for tools.D14Probe, which counts the funnel stages: measured r13
    * at sf10, candidates = 74M distinct pairs vs 7.9k verified, so the
    * expensive part is generating/moving candidates, not verifying
    * them — a q-gram count prefilter between blocking and verify was
    * measured SLOWER (146 → 228 s) and rejected; the wins were cutting
    * candidate volume (probe window ±K/2) and candidate movement
    * (no pre-verify distinct, gate-broadcast attach). */
  /** Default per-key member cap for [[d14Pairs]]' blocking join: a
    * single (lang, segment) key shared by N documents contributes
    * O(N²) candidate pairs — super-linear on boilerplate-heavy corpora
    * (D14Probe's a·c + b·c² fit: ~55% collision pairs at 100 copies) —
    * so a key past 1000 members is dropped WHOLE from the seg side of
    * the join, with the drop LOUD (capDroppedLast / stderr, the
    * hamming-cap contract; see [[Dedup.capKeyMembers]] for why
    * whole-key). Normal corpora (including the sf10 soak, whose
    * densest planted clique is ~100 copies) never reach it, so the cap
    * is a skew guard, not a recall ceiling — and when it does fire,
    * the counter says so. */
  private[graft] val D14MaxKeyMembers = 1000

  private[graft] def d14Pairs(s: SparkSession, dir: String,
      maxKeyMembers: Int = D14MaxKeyMembers,
      lenBucketKey: Boolean = false): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"), col("lang"),
        col("n_chars"), substring(col("text"), 1, 40).as("prefix"))
      // distinct 3-gram hash set per prefix, computed ONCE per document
      // (not per candidate pair) — feeds D14Probe's count prefilter
      .withColumn("g", graft.functions.SketchExpressions
        .charNgramHashes(col("prefix"), 3))
    // PassJoin segment blocking (Li/Deng/Feng, VLDB'11) over the
    // equal-length 40-char prefixes: ed(a,b) <= K with K+1 segments of b
    // leaves at least one segment untouched by any edit, so it occurs
    // EXACTLY in a at a shifted start. Candidates = pairs sharing an
    // aligned segment — CONTENT-based blocking, so candidate count
    // tracks true near-duplicate density instead of (lang, length)
    // block sizes squared. The sf1 soak caught the old length-bucket
    // blocking at slope 1.94 (305 s).
    //
    // Probe window: both sides of the long path are EXACTLY L chars, so
    // any ed <= K transcript has #insertions == #deletions, each <= K/2
    // — an untouched segment's shift (#ins - #del before it) lies in
    // [-K/2, +K/2], not [-K, +K]. Halving the window halves the probe
    // stream and the blocking-join output (measured r13 at sf10: 66.6M
    // pair evaluations pre-dedup, vs 74M already-DEDUPED pairs under
    // the ±K window) at zero recall cost; the sf0.01 brute-force
    // oracle pins the guarantee.
    val L = 40
    val K = 10
    val nSeg = K + 1
    val S = K / 2
    val segBounds = (0 until nSeg).map { i =>
      val st = i * L / nSeg
      (i, st, (i + 1) * L / nSeg - st)
    }
    // spread the one-split sandbox scan before the 100-200x explode
    // (identity at scale — see spreadIfUnderParallel): the probe
    // generation stage otherwise runs 14-way with one straggler task
    // carrying the biggest split (measured 69 s of the 146 s wall)
    val long = Dedup.spreadIfUnderParallel(
      base.where(length(col("prefix")) === L))
    // pigeonhole needs the fixed-length layout; prefixes under 40 chars
    // (doc shorter than the prefix window) fall back to the dense
    // same-lang pairing — bounded by the short-doc count, usually zero
    val short = base.where(length(col("prefix")) < L)

    // blocking key = one 64-bit hash of (lang, segment index, segment
    // text): the join compares/shuffles longs, not (string, int,
    // string) triples, and the probe distinct dedups narrow rows. A
    // 64-bit collision can only ADD a candidate pair, which the exact
    // levenshtein verify then rejects — same 2^-64 posture as every
    // dedup entry, and here it cannot even reach the output.
    val segExprs = array(segBounds.map { case (i, st, ln) =>
      struct(lit(i).as("i"),
        substring(col("prefix"), st + 1, ln).as("s"))
    }: _*)
    // lenBucketKey composes the |Δn| <= 24 length constraint into the
    // blocking key (probe side on floor(n_y/50), seg side on the 1–2
    // buckets covering n_x ± 24 — coverage exact, candidate multiset
    // within the length band identical). Measured r16 at sf10 in an
    // interleaved same-session A/B (tools/D14BucketAb): bucket_key
    // 38.25 s vs flat_key 35.25 s median — the 2× seg-stream blowup
    // (sort/build) costs MORE than the rejected pairs' condition evals
    // saved (a rejected pair never materializes a row; it is one
    // join-condition evaluation). Default stays FLAT; the toggle and
    // the proof stay for the receipt. The real sf10 wall is the probe
    // explode→distinct→cap pipeline (667 core-s, 1.9 GB shuffled,
    // StageProfile r16) — attacked by the map-side array_distinct
    // dedup below (the full distinct exchange was within-document
    // dedup in disguise).
    def lenBucket(n: org.apache.spark.sql.Column) =
      floor(n / 50.0).cast("long")
    val segs0 = long.select(col("doc_id").as("id_x"),
        col("n_chars").as("n_x"), col("lang"),
        explode(segExprs).as("seg"))
    val segs =
      if (lenBucketKey) segs0
        .select(col("id_x"), col("n_x"), col("lang"), col("seg"),
          explode(array_distinct(array(
            lenBucket(col("n_x") - 24), lenBucket(col("n_x") + 24))))
            .as("bkt"))
        .select(col("id_x"), col("n_x"),
          xxhash64(col("lang"), col("bkt"), col("seg.i"), col("seg.s"))
            .as("k"))
      else segs0.select(col("id_x"), col("n_x"),
        xxhash64(col("lang"), col("seg.i"), col("seg.s")).as("k"))
    // The probe-window dedup is WITHIN-document by construction (the
    // old distinct key was (id_y, n_y, k) and id_y differs across
    // docs), so it needs NO exchange at all: hash every window in the
    // probe ARRAY and array_distinct it before the explode — one
    // hashset over ~110 longs per document, map-side. The r15 spelling
    // paid a full distinct shuffle of the exploded stream for exactly
    // this dedup: 501 core-s of partial hashmaps + an 835 MB exchange
    // at sf10 (StageProfile r16), the entry's #2 stage. Keys are
    // bit-identical (same xxhash64 over (lang[, bucket], i, s)), so
    // the downstream cap/join sees the identical row multiset.
    // (A seg-key Bloom prefilter here was measured and REJECTED, like
    // r13's q-gram idea: 3–4-char segments are dense in content space
    // at corpus scale, so ~90% of windows match SOME document's
    // segment — the filter kept the stream, cost 11 s of build and
    // ~350 core-s of probes at sf10.)
    val probeHashExprs = array((for {
      (i, st, ln) <- segBounds
      o <- -S to S
      p = st + o
      if p >= 0 && p + ln <= L
    } yield {
      val s = substring(col("prefix"), p + 1, ln)
      if (lenBucketKey)
        xxhash64(col("lang"), lenBucket(col("n_chars")), lit(i), s)
      else xxhash64(col("lang"), lit(i), s)
    }): _*)
    val probes = long.select(col("doc_id").as("id_y"),
      col("n_chars").as("n_y"),
      explode(array_distinct(probeHashExprs)).as("k"))
    // loud per-key truncation on the PROBE side (capping one input
    // already zeroes a degenerate key's join product — see
    // capKeyMembers). The probe stream, not segs, on purpose: probes
    // is always the ~6× larger side, so the planner keeps it STREAMED
    // — an observe() under a BroadcastExchange build never reports its
    // metrics (the build runs outside the query's execution context;
    // measured r15), and at sandbox scale the smaller segs side is
    // exactly what AQE broadcasts. Completeness note: with no key past
    // the cap — every normal corpus — the count filter keeps all rows
    // and the output is bit-identical to the uncapped join; a fired
    // cap is reported via capDroppedLast and stderr rather than
    // silently quadratifying the candidate stream.
    val probesCapped = Dedup.capKeyMembers(probes, Seq("k"),
      maxKeyMembers)
    val candLong = segs.join(probesCapped, Seq("k"))
      .where(col("id_x") =!= col("id_y") &&
        abs(col("n_x") - col("n_y")) <= 24)
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"))
    val candShort = short.select(col("doc_id").as("id_x"), col("lang"),
        col("n_chars").as("n_x"))
      .join(base.select(col("doc_id").as("id_y"), col("lang"),
        col("n_chars").as("n_y")), Seq("lang"))
      .where(col("id_x") =!= col("id_y") &&
        abs(col("n_x") - col("n_y")) <= 24)
      .select(least(col("id_x"), col("id_y")).as("id_a"),
        greatest(col("id_x"), col("id_y")).as("id_b"))
    val cands = candLong.unionByName(candShort)
    // prefix attach: size-gated broadcast (the ivfAssignTopLsh
    // pattern). In-gate the candidate stream never exchanges at all —
    // blocking join output pipelines map-side through both attaches
    // into the verify. Past the gate (a 100 TB documents table) the
    // attaches become ordinary shuffled joins keyed by id, the shape
    // the old code always paid.
    def attach(idAlias: String, pfxAlias: String, gAlias: String) = {
      val sel = base.select(col("doc_id").as(idAlias),
        col("prefix").as(pfxAlias), col("g").as(gAlias))
      if (Dedup.statsBytes(base).exists(_ < (512L << 20))) broadcast(sel)
      else sel
    }
    cands
      .join(attach("id_a", "pfx_a", "g_a"), "id_a")
      .join(attach("id_b", "pfx_b", "g_b"), "id_b")
  }

  // s25: late-interaction (MaxSim) retrieval — ColBERT-style scoring
  // where query and document are each a BAG of vectors and
  // score = Σ_q max_d ⟨q, d⟩, the retrieval shape that beats
  // single-vector cosine on long documents. Multi-vector docs are
  // synthesized as groups of 4 consecutive embedding rows; the 4-vector
  // query side broadcasts, the dot products run as codegen'd
  // zip_with + aggregate higher-order expressions (no UDF), and the
  // two-level max-then-sum is two hash aggregations. Per-query maxes
  // pass through DECIMAL before the final sum so the 4-way addition is
  // order-independent — the oracle replays it with list_dot_product.
  // At 100 TB: cost is one scan of the vector table × |Q| broadcast
  // rows; the (m_id, q_idx) aggregate is map-side partial because the
  // grouping key extends the scan's natural grain.
  def s25_maxsim(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    val d = e.select(expr("vec_id div 4").as("m_id"), col("embedding"))
    val q = e.where(col("vec_id") < 4)
      .select(col("vec_id").as("q_idx"), col("embedding").as("qe"))
    d.join(broadcast(q))
      .select(col("m_id"), col("q_idx"),
        expr("""aggregate(
                 zip_with(embedding, qe,
                   (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                 CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""").as("dot"))
      .groupBy(col("m_id"), col("q_idx"))
      .agg(max(col("dot")).as("mx"))
      .groupBy(col("m_id"))
      .agg(sum(col("mx").cast(org.apache.spark.sql.types.DecimalType(28, 10)))
        .cast("double").as("score"))
      .orderBy(desc("score"), col("m_id"))
      .limit(10)
      .select(col("m_id"), round(col("score"), 6).as("score"))
  }

  // p19: epoch reshuffling — a training loader wants a DIFFERENT
  // deterministic global permutation each epoch (same-order epochs
  // correlate gradient noise). Each epoch salts the replayable mix32
  // ordering key with an epoch offset, giving an independent
  // permutation that any engine (and any retry) reproduces; shard/pos
  // come from the same globalShuffle machinery as p6, so one window
  // per epoch over shard-partitioned hashes, no global sort.
  def p19_epoch_shuffle(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"))
    (0 until 2).map { e =>
      Sampling.globalShuffle(base, "doc_id", numShards = 4,
          score = Sampling.mix32(col("doc_id") + lit(e * 1000003L)))
        .withColumn("epoch", lit(e.toLong))
    }.reduce(_ unionByName _)
      .select(col("epoch"), col("doc_id"), col("shard"), col("pos"))
      .orderBy("epoch", "shard", "pos")
  }

  // t21: cross-source vocabulary overlap matrix — pairwise Jaccard of
  // the per-source token sets, the corpus diagnostic behind "are these
  // two crawls near-duplicates of each other / is this source already
  // covered". The token-set frame dedups to (source, token) first
  // (vocabulary-sized, tiny next to the corpus), so the pairwise join
  // runs over vocabularies, not documents; |A∪B| derives from sizes
  // and the intersection — never materialized. Exact integers; one
  // double division per pair.
  def t21_source_overlap(s: SparkSession, dir: String): DataFrame = {
    // Materialize the distinct (source, token) set once: it feeds three
    // consumers (the per-source sizes and both self-join sides), and
    // Catalyst re-expands shared subtrees per consumer — un-cut, the
    // tokenize + explode + distinct pipeline ran three times. The frame
    // is vocabulary-sized (distinct tokens × sources), far below the
    // corpus it derives from — the g2 oriented-edge treatment (cutShared:
    // durable-mode rdd-N dirs registered for app-end + releaseAll).
    val st = graft.operators.Lineage.cutShared(docs(s, dir)
      .select(col("source"), explode(Dedup.tokens(col("text"))).as("tok"))
      .distinct())
    val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("sz"))
    st.as("a")
      .join(st.as("b"),
        col("a.tok") === col("b.tok") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(sizes.select(col("source").as("src_a"),
        col("sz").as("sz_a"))), Seq("src_a"))
      .join(broadcast(sizes.select(col("source").as("src_b"),
        col("sz").as("sz_b"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("inter"),
        (col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter"))).as("jaccard"))
      .orderBy("src_a", "src_b")
  }

  // p18: weighted sampling without replacement (Efraimidis–Spiliopoulos
  // A-Res): each row draws key = ln(u)/w from a deterministic uniform
  // u = (mix32(id)+1)/2^32, and the global top-k by key IS a weighted
  // sample — the distributed-friendly formulation (one
  // TakeOrderedAndProject, no sequential scan over cumulative weights).
  // Weights = n_chars, so long documents are proportionally likelier.
  // Keys follow the t13/p16 nano-long contract (ln of an exact-integer-
  // derived double, round-9, carried as BIGINT) so both engines rank
  // the identical integers.
  def p18_weighted_sample(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("key_nanos",
        expr("""CAST(round(round(
                 ln(CAST(((doc_id % 2147483648) * 2654435761 % 4294967296)
                         + 1 AS DOUBLE) / 4294967296.0)
                 / n_chars, 9) * 1e9, 0) AS BIGINT)"""))
      .orderBy(desc("key_nanos"), col("doc_id"))
      .limit(20)

  // s26: distributed covariance matrix of the embedding space — the
  // one-pass statistic PCA / whitening / Mahalanobis outlier scoring
  // all start from. Shape at 100 TB: explode to (vec, dim, x), self-join
  // per vector (each vector contributes its d(d+1)/2 upper-triangle
  // products locally), and aggregate to d² cells with map-side partial
  // combine — the shuffle carries AT MOST d(d+1)/2 partial sums per
  // partition regardless of row count. Products accumulate as exact
  // int64 (|xq| ≤ 1e6 ⇒ |xq·xq| ≤ 1e12, so the sum stays inside int64
  // up to ~9.2e6 vectors per cell — beyond that, route the sum through
  // DecimalType(38,0)); cov = E[xy] − E[x]E[y] derives in a verbatim-
  // mirrored double expression, so the full matrix hash-matches.
  def s26_covariance(s: SparkSession, dir: String): DataFrame = {
    val n = embs(s, dir).count() // plan-time scalar, one metadata-cheap pass
    // 1e-6 input quantization → every accumulation is exact int64 (a
    // double→decimal cast ties differently across engines; integers
    // never do). Statistically invisible at covariance scale.
    val el = Dedup.spreadIfUnderParallel(embs(s, dir))
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("p", "xf")))
      .select(col("vec_id"), (col("p") + 1).cast("long").as("i"),
        expr("CAST(floor(CAST(xf AS DOUBLE) * 1000000 + 0.5) AS BIGINT)")
          .as("xq"))
    val sums = el.groupBy(col("i")).agg(sum(col("xq")).as("sx"))
    val prods = el.as("a")
      .join(el.as("b"),
        col("a.vec_id") === col("b.vec_id") && col("a.i") <= col("b.i"))
      .select(col("a.i").as("i"), col("b.i").as("j"),
        (col("a.xq") * col("b.xq")).as("xy"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("xy")).as("sxy"))
    prods
      .join(broadcast(sums.select(col("i"), col("sx").as("si"))), Seq("i"))
      .join(broadcast(sums.select(col("i").as("j"), col("sx").as("sj"))),
        Seq("j"))
      .select(col("i"), col("j"),
        expr(s"""CAST(sxy AS DOUBLE) / $n / 1000000000000.0
                - (CAST(si AS DOUBLE) / $n / 1000000.0)
                  * (CAST(sj AS DOUBLE) / $n / 1000000.0)""").as("cov"))
      .orderBy("i", "j")
  }

  // s27: embedding outlier scoring — diagonal Mahalanobis (per-dim
  // z² sum), the cheap first-line filter for corrupted/off-manifold
  // vectors before they poison ANN indexes or clustering. Entirely
  // integer arithmetic on the 1e-6-quantized grid (s26's discipline):
  // per-dim mean/variance come from exact int64 sums with floor
  // division, and each vector's score is a sum of integer terms —
  // order-free, so the distributed aggregation can never drift a bit.
  // Shape at 100 TB: the 64-row stats frame broadcasts; scoring is
  // map-side; the only shuffle is the final top-k
  // (TakeOrderedAndProject).
  def s27_embedding_outliers(s: SparkSession, dir: String): DataFrame = {
    val n = embs(s, dir).count()
    val el = Dedup.spreadIfUnderParallel(embs(s, dir))
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("p", "xf")))
      .select(col("vec_id"), (col("p") + 1).cast("long").as("i"),
        expr("CAST(floor(CAST(xf AS DOUBLE) * 1000000 + 0.5) AS BIGINT)")
          .as("xq"))
    // mq/vq via floor(double/n): si ≤ ~6e9 and ssi ≤ ~2e15 are exact in
    // double (< 2^53), and floor of the identical quotient is the same
    // in both engines — unlike bare integer division, which truncates
    // toward zero in Spark but floors in DuckDB (sign-divergent).
    val stats = el.groupBy(col("i"))
      .agg(sum(col("xq")).as("si"), sum(col("xq") * col("xq")).as("ssi"))
      .select(col("i"),
        expr(s"CAST(floor(CAST(si AS DOUBLE) / $n) AS BIGINT)").as("mq"),
        expr(s"""greatest(
                  CAST(floor(CAST(ssi AS DOUBLE) / $n) AS BIGINT)
                  - CAST(floor(CAST(si AS DOUBLE) / $n) AS BIGINT)
                    * CAST(floor(CAST(si AS DOUBLE) / $n) AS BIGINT),
                  1L)""").as("vq"))
    el.join(broadcast(stats), Seq("i"))
      .select(col("vec_id"),
        expr("((xq - mq) * (xq - mq) * 1000) div vq").as("term"))
      .groupBy(col("vec_id"))
      .agg(sum(col("term")).as("score"))
      .orderBy(desc("score"), col("vec_id"))
      .limit(20)
  }

  // t20: URL parsing + domain blocklist — the UT1-blocklist-style
  // source filter every crawl pipeline runs before anything else.
  // Spark's parse_url (codegen'd) extracts HOST/PATH; the blocklist is
  // a broadcast LEFT ANTI join, so at 100 TB the filter is map-side
  // with zero shuffle. URLs are synthesized deterministically from the
  // documents table (the container data has no URL column); the oracle
  // reconstructs host/path with independent string algebra, so the
  // parse itself is what gets cross-checked.
  def t20_url_filter(s: SparkSession, dir: String): DataFrame = {
    val urls = docs(s, dir).select(col("doc_id"), col("lang"),
      concat(lit("https://"), col("source"), lit(".example.com/"),
        col("lang"), lit("/doc-"), col("doc_id")).as("url"))
    val parsed = urls.select(col("doc_id"),
      parse_url(col("url"), lit("HOST")).as("host"),
      parse_url(col("url"), lit("PATH")).as("path"))
    val blocked = s.createDataFrame(
      Seq("src3", "src7", "src11").map(Tuple1.apply))
      .toDF("b").select(concat(col("b"), lit(".example.com")).as("host"))
    parsed.join(broadcast(blocked), Seq("host"), "left_anti")
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n"), min(col("path")).as("first_path"))
      .orderBy("host")
  }

  // d13: canonicalization dedup — exact dedup modulo case, punctuation
  // and whitespace (the "same page, different boilerplate" class that
  // byte-exact d1 misses and fuzzy d2 overkills). 50 planted variants
  // (uppercased, doubled spaces, trailing bangs, re-keyed +30000) must
  // collapse onto their sources. The shuffle key is md5(canon) — 32
  // bytes regardless of document length, and DuckDB replays md5
  // bit-for-bit (unlike xxhash64), so the exchange never carries text
  // and the oracle still hash-matches.
  def d13_canonical_dedup(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val variants = d.where(col("doc_id") < 50)
      .select((col("doc_id") + 30000).as("doc_id"),
        concat(upper(col("text")), lit("  !!!")).as("text"))
    val all = d.select(col("doc_id"), col("text")).unionByName(variants)
    val canon = lower(trim(regexp_replace(
      regexp_replace(col("text"), "[^A-Za-z0-9 ]", ""), " +", " ")))
    all.select(col("doc_id"), md5(canon).as("ck"))
      .groupBy(col("ck"))
      .agg(min(col("doc_id")).as("survivor_id"),
        count(lit(1)).as("n_copies"))
      .select(col("survivor_id"), col("n_copies"))
      .orderBy("survivor_id")
  }

  // j9: bucketed co-located join — corpus and batch both written
  // bucketBy(8, doc_id).sortBy(doc_id) as ingest-time artifacts
  // (saveAsTable with explicit path, memoized per session+dataset like
  // s20's index); the verification join then runs with ZERO hash
  // exchanges — bucket files align 1:1 and the sort-merge join reads
  // them pre-partitioned. At 100 TB this converts every repeated
  // corpus equi-join (dedup verification, enrichment, incremental
  // batches) from a full corpus shuffle into a local per-bucket merge —
  // the single biggest lever the README's cluster posture names.
  // keyed by context: newSession() shares the catalog (saveAsTable
  // registers in the shared external catalog), so concurrent requests
  // must reuse the bucketed tables, not race to rebuild them
  private val j9Built = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.SparkContext, String), (String, String)]()

  private def j9TablesFor(s: SparkSession, dir: String): (String, String) =
    j9Built.computeIfAbsent((s.sparkContext, dir), { case (_, d) =>
      val ss = s
      val sfx = Integer.toHexString(d.hashCode)
      val corpusT = s"graft_j9_corpus_$sfx"
      val batchT = s"graft_j9_batch_$sfx"
      val base = docs(ss, d).select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      def write(df: DataFrame, name: String, path: String): Unit = {
        ss.sql(s"DROP TABLE IF EXISTS $name")
        df.write.mode("overwrite").format("parquet").option("path", path)
          .bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable(name)
      }
      write(base, corpusT, graft.Tables.tmpDirFor("graft_j9c", d))
      write(base.where(col("doc_id") % 5 === 0).select(col("doc_id")),
        batchT, graft.Tables.tmpDirFor("graft_j9b", d))
      (corpusT, batchT)
    })

  def j9_bucketed_join(s: SparkSession, dir: String): DataFrame = {
    val (cT, bT) = j9TablesFor(s, dir)
    s.table(cT).join(s.table(bT).hint("merge"), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("n_tokens"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d13_canonical_dedup" -> d13_canonical_dedup _,
    "j9_bucketed_join" -> j9_bucketed_join _,
    "t19_gopher_rules" -> t19_gopher_rules _,
    "p16_dsir_select" -> p16_dsir_select _,
    "s24_rrf_fusion" -> s24_rrf_fusion _,
    "g2_triangle_count" -> g2_triangle_count _,
    "a18_weighted_quantiles" -> a18_weighted_quantiles _,
    "t18_bigram_lm" -> t18_bigram_lm _,
    "m10_image_resize" -> m10_image_resize _,
    "t17_outlier_filter" -> t17_outlier_filter _,
    "m9_scene_change" -> m9_scene_change _,
    "t16_normalize" -> t16_normalize _,
    "k5_heavy_hitters" -> k5_heavy_hitters _,
    "s22_bm25" -> s22_bm25 _,
    "p14_group_split" -> p14_group_split _,
    "g1_pagerank" -> g1_pagerank _,
    "g3_bfs_hops" -> g3_bfs_hops _,
    "p17_compaction_plan" -> p17_compaction_plan _,
    "d14_fuzzy_join" -> d14_fuzzy_join _,
    "t20_url_filter" -> t20_url_filter _,
    "s25_maxsim" -> s25_maxsim _,
    "s26_covariance" -> s26_covariance _,
    "s27_embedding_outliers" -> s27_embedding_outliers _,
    "p18_weighted_sample" -> p18_weighted_sample _,
    "t21_source_overlap" -> t21_source_overlap _,
    "p19_epoch_shuffle" -> p19_epoch_shuffle _,
    "d1_dedup_exact" -> d1_dedup_exact _,
    "d1_dedup_exact_rows" -> d1_dedup_exact_rows _,
    "d2_minhash_lsh" -> d2_minhash_lsh _,
    "d3_simhash" -> d3_simhash _,
    "d4_ngram_jaccard" -> d4_ngram_jaccard _,
    "d11_containment" -> d11_containment _,
    "d5_embedding_neardup" -> d5_embedding_neardup _,
    "d5_embedding_lsh" -> d5_embedding_lsh _,
    "d6_dup_clusters" -> d6_dup_clusters _,
    "d7_incremental_dedup" -> d7_incremental_dedup _,
    "d8_span_dedup" -> d8_span_dedup _,
    "d12_substring_dedup" -> d12_substring_dedup _,
    "d9_incremental_neardup" -> d9_incremental_neardup _,
    "d16_signature_store" -> d16_signature_store _,
    "p1_hash_sample" -> p1_hash_sample _,
    "p2_stratified_sample" -> p2_stratified_sample _,
    "p3_token_budget" -> p3_token_budget _,
    "p4_source_mix" -> p4_source_mix _,
    "p5_sequence_pack" -> p5_sequence_pack _,
    "p6_global_shuffle" -> p6_global_shuffle _,
    "p7_upsample" -> p7_upsample _,
    "p8_pack_offsets" -> p8_pack_offsets _,
    "p9_sharded_export" -> p9_sharded_export _,
    "p11_systematic_sample" -> p11_systematic_sample _,
    "p12_temperature_mix" -> p12_temperature_mix _,
    "p13_curriculum_bins" -> p13_curriculum_bins _,
    "s20_inverted_index" -> s20_inverted_index _,
    "s21_random_projection" -> s21_random_projection _,
    "s29_srp_hamming_neardup" -> s29_srp_hamming_neardup _,
    "s36_srp_neardup_auto" -> s36_srp_neardup_auto _,
    "t8_chunking" -> t8_chunking _,
    "t9_vocab_df" -> t9_vocab_df _,
    "t13_lm_score" -> t13_lm_score _,
    "t14_tfidf" -> t14_tfidf _,
    "t15_classifier_score" -> t15_classifier_score _,
    "p10_length_histogram" -> p10_length_histogram _,
    "d10_chain_clusters" -> d10_chain_clusters _,
    "s1_ann_bruteforce" -> s1_ann_bruteforce _,
    "s11_quantized_ann" -> s11_quantized_ann _,
    "s23_pq_ann" -> s23_pq_ann _,
    "s12_semantic_dedup" -> s12_semantic_dedup _,
    "s13_dim_stats" -> s13_dim_stats _,
    "s14_group_centroids" -> s14_group_centroids _,
    "s18_kmeans" -> s18_kmeans _,
    "s19_mips" -> s19_mips _,
    "s8_knn_graph" -> s8_knn_graph _,
    "s32_hard_negatives" -> s32_hard_negatives _,
    "s16_knn_graph_lsh" -> s16_knn_graph_lsh _,
    "s33_knn_graph_auto" -> s33_knn_graph_auto _,
    "s35_hard_negatives_blocked" -> s35_hard_negatives_blocked _,
    "d19_embedding_neardup_auto" -> d19_embedding_neardup_auto _,
    "s34_semantic_dedup_auto" -> s34_semantic_dedup_auto _,
    "s37_semantic_dedup_hier" -> s37_semantic_dedup_hier _,
    "s9_sql_cosine" -> s9_sql_cosine _,
    "s2_ann_lsh" -> s2_ann_lsh _,
    "s5_ann_ivf" -> s5_ann_ivf _,
    "t1_token_count" -> t1_token_count _,
    "t2_profile" -> t2_profile _,
    "t2_fingerprint" -> t2_fingerprint _,
    "t3_quality_by_source" -> t3_quality_by_source _,
    "t4_curation_pipeline" -> t4_curation_pipeline _,
    "t5_contamination" -> t5_contamination _,
    "t6_repetition" -> t6_repetition _,
    "t7_pii_redact" -> t7_pii_redact _,
    "t22_c4_line_clean" -> t22_c4_line_clean _,
    "t23_log_templates" -> t23_log_templates _,
    "t24_token_drift" -> t24_token_drift _,
    "d17_cdc_chunks" -> d17_cdc_chunks _,
    "d18_decontaminate" -> d18_decontaminate _,
    "t11_bpe_roundtrip" -> t11_bpe_roundtrip _,
    "t12_bpe_stats" -> t12_bpe_stats _,
    "m1_multimodal_features" -> m1_multimodal_features _,
    "m2_frame_sample" -> m2_frame_sample _,
    "m3_format_detect" -> m3_format_detect _,
    "m4_audio_decode" -> m4_audio_decode _,
    "m5_video_decode" -> m5_video_decode _,
    "m6_video_frames" -> m6_video_frames _,
    "m7_image_phash_dedup" -> m7_image_phash_dedup _,
    "m12_image_hamming_neardup" -> m12_image_hamming_neardup _,
    "m13_video_neardup" -> m13_video_neardup _,
    "m8_audio_fingerprint" -> m8_audio_fingerprint _,
    "m11_lum_histogram" -> m11_lum_histogram _
  )

  /** s18 oracle: replays the Lloyd iterations CTE-for-iteration with the
    * SAME integer micro-unit discipline as [[graft.operators.Clustering]]
    * (floor(x·1e12 + 0.5) longs; argmin ORDER BY dist, cl; update
    * sum/(1e12·n) with empty clusters keeping the previous centroid). */
  private val s18OracleSql: String = {
    def dist(c: String, d: String) =
      s"""$d AS (
         |  SELECT ev.vec_id, c.cl,
         |    sum(CAST(floor((ev.x - c.y) * (ev.x - c.y) * 1e12 + 0.5)
         |        AS BIGINT)) AS dist
         |  FROM ev JOIN $c c ON ev.i = c.i
         |  GROUP BY ev.vec_id, c.cl)"""
    def argmin(d: String, a: String) =
      s"""$a AS (
         |  SELECT vec_id, cl, dist FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |      ORDER BY dist, cl) AS rn FROM $d) WHERE rn = 1)"""
    def update(a: String, cPrev: String, cNext: String) =
      s"""${cNext}_u AS (
         |  SELECT a.cl, e.i,
         |    sum(CAST(floor(e.x * 1e12 + 0.5) AS BIGINT)) AS s,
         |    count(*) AS n
         |  FROM $a a JOIN ev e USING (vec_id)
         |  GROUP BY a.cl, e.i),
         |$cNext AS (
         |  SELECT p.cl, p.i,
         |    coalesce(CAST(u.s AS DOUBLE) / (1e12 * u.n), p.y) AS y
         |  FROM $cPrev p LEFT JOIN ${cNext}_u u
         |    ON p.cl = u.cl AND p.i = u.i)"""
    s"""WITH ev AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |    CAST(unnest(embedding) AS DOUBLE) AS x
       |  FROM embeddings),
       |seed AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
       |    AS cl, embedding
       |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 10)),
       |c0 AS (
       |  SELECT cl, generate_subscripts(embedding, 1) AS i,
       |    CAST(unnest(embedding) AS DOUBLE) AS y
       |  FROM seed),
       |${dist("c0", "d1")},
       |${argmin("d1", "a1")},
       |${update("a1", "c0", "c1")},
       |${dist("c1", "d2")},
       |${argmin("d2", "a2")},
       |${update("a2", "c1", "c2")},
       |${dist("c2", "d3")},
       |${argmin("d3", "a3")}
       |SELECT cl AS cluster, count(*) AS n_vectors,
       |  round(CAST(sum(dist) AS DOUBLE) / (1e12 * count(*)), 6)
       |    AS avg_sqdist
       |FROM a3 GROUP BY cl ORDER BY cluster""".stripMargin
  }

  private val t7OracleSql: String = {
    val ps = TextAnalysis.piiPatterns
    val redacted = ps.foldLeft("t") { case (acc, (tag, re)) =>
      s"regexp_replace($acc, '$re', '[$tag]', 'g')"
    }
    val countCols = ps.map { case (tag, re) =>
      s"len(regexp_extract_all(t, '$re')) AS n_${tag.toLowerCase}"
    }.mkString(",\n    ")
    val sumCols = ps.map { case (tag, _) =>
      val n = s"n_${tag.toLowerCase}"
      s"CAST(sum($n) AS BIGINT) AS $n"
    }.mkString(",\n  ")
    s"""WITH aug AS (
       |  SELECT source,
       |    text || ' Contact user' || CAST(doc_id AS VARCHAR)
       |      || '@example.com from 10.' || CAST(doc_id % 256 AS VARCHAR)
       |      || '.0.' || CAST(doc_id % 100 AS VARCHAR)
       |      || ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
       |      || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |      || ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
       |      || '-' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
       |      || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
       |  FROM documents),
       |red AS (
       |  SELECT source,
       |    $countCols,
       |    length($redacted) AS rlen
       |  FROM aug)
       |SELECT source, count(*) AS n_docs,
       |  $sumCols,
       |  CAST(sum(rlen) AS BIGINT) AS redacted_chars
       |FROM red GROUP BY source ORDER BY source""".stripMargin
  }

  /** Shared exact-top-26 oracle for the planted-answer ANN gates: the
    * corpus plus 25 deterministic near-copies of the query vector
    * (same integer-seeded perturbation as [[perturbedVec]]). */
  private val plantedAnnOracle: String =
    """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      |q AS (SELECT e AS qe FROM base WHERE vec_id = 0),
      |planted AS (
      |  SELECT 100000 + u.i AS vec_id,
      |    list_transform(range(1, len(qe) + 1),
      |      j -> qe[j] + 0.005 * (((100000 + u.i) * 31 + j) % 7 - 3)) AS e
      |  FROM q, unnest(range(1, 26)) AS u(i)),
      |v AS (SELECT vec_id, e FROM base UNION ALL SELECT vec_id, e FROM planted),
      |scored AS (
      |  SELECT vec_id AS id, list_cosine_similarity(e, qe) AS raw
      |  FROM v, q)
      |SELECT id, round(raw, 6) AS score FROM scored
      |ORDER BY raw DESC, id LIMIT 26""".stripMargin

  /** g1: 5 unrolled fixed-point iterations — every step integer-exact
    * (`//` floor division, BIGINT sums), replaying Graphs.pageRank's
    * arithmetic bit for bit. */
  private val g1OracleSql: String = {
    var inner =
      "SELECT id, 1000000000 // nn.cnt AS rank_units FROM nodes, n nn"
    for (_ <- 1 to 5) {
      inner = s"""
        |  SELECT nd.id,
        |    ((1000000000 // nn.cnt) * 150) // 1000 +
        |      (850 * CAST(coalesce(c.m, 0) AS BIGINT)) // 1000 AS rank_units
        |  FROM nodes nd CROSS JOIN n nn
        |  LEFT JOIN (
        |    SELECT e.dst AS id,
        |      CAST(sum(r.rank_units // d.deg) AS BIGINT) AS m
        |    FROM edges e
        |    JOIN ($inner) r ON r.id = e.src
        |    JOIN deg d ON d.src = e.src
        |    GROUP BY e.dst) c ON c.id = nd.id""".stripMargin
    }
    s"""WITH nodes AS (SELECT doc_id AS id FROM documents),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM nodes),
       |edges AS (
       |  SELECT id AS src, (2 * id + 1) % nn.cnt AS dst FROM nodes, n nn
       |  UNION ALL
       |  SELECT id, (3 * id + 2) % nn.cnt FROM nodes, n nn),
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)
       |SELECT id AS doc_id, rank_units FROM ($inner) ORDER BY doc_id"""
      .stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    // d13: same canonicalization chain (punct strip → space collapse →
    // trim → lower → md5); DuckDB regexp_replace needs the 'g' flag for
    // the global semantics Spark applies by default
    "d13_canonical_dedup" ->
      """WITH a AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 30000, upper(text) || '  !!!'
        |  FROM documents WHERE doc_id < 50),
        |c AS (
        |  SELECT doc_id, md5(lower(trim(regexp_replace(regexp_replace(
        |    text, '[^A-Za-z0-9 ]', '', 'g'), ' +', ' ', 'g')))) AS ck
        |  FROM a)
        |SELECT min(doc_id) AS survivor_id,
        |  CAST(count(*) AS BIGINT) AS n_copies
        |FROM c GROUP BY ck ORDER BY survivor_id""".stripMargin,
    // j9: the bucketed layout is a physical property — the logical
    // result is the plain equi-join
    "j9_bucketed_join" ->
      """SELECT doc_id, source,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |    AS n_tokens
        |FROM documents WHERE doc_id % 5 = 0
        |ORDER BY doc_id""".stripMargin,
    // t19: the same integer cross-multiplied rule thresholds over
    // DuckDB's independent list/string primitives (translate-based
    // alphabetic test — no regex dialect in the contract)
    "t19_gopher_rules" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    regexp_split_to_array(trim(text), '\s+') AS toks,
        |    string_split(text, chr(10)) AS lines
        |  FROM documents),
        |f AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(coalesce(list_sum(list_transform(toks,
        |      w -> length(w))), 0) AS BIGINT) AS char_sum,
        |    CAST(len(list_filter(toks, w -> length(translate(w,
        |      'abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ',
        |      '')) < length(w))) AS BIGINT) AS n_alpha,
        |    CAST(len(list_filter(toks, w -> list_contains(
        |      ['the','be','to','of','and','that','have','with'], w)))
        |      AS BIGINT) AS n_stop,
        |    CAST(len(lines) AS BIGINT) AS n_lines,
        |    CAST(len(list_filter(lines, l -> starts_with(l, '-')
        |      OR starts_with(l, '•'))) AS BIGINT) AS n_bullet,
        |    CAST(len(list_filter(lines, l -> ends_with(l, '...')))
        |      AS BIGINT) AS n_ell_end,
        |    CAST(length(text) - length(replace(text, '#', ''))
        |      AS BIGINT) AS n_hash,
        |    CAST((length(text) - length(replace(text, '...', ''))) // 3
        |      AS BIGINT) AS n_ell
        |  FROM t)
        |SELECT doc_id, n_words,
        |  n_words BETWEEN 50 AND 100000 AS words_ok,
        |  (3 * n_words <= char_sum AND char_sum <= 10 * n_words)
        |    AS mwl_ok,
        |  10 * (n_hash + n_ell) <= n_words AS sym_ok,
        |  10 * n_bullet <= 9 * n_lines AS bullet_ok,
        |  10 * n_ell_end <= 3 * n_lines AS ellipsis_ok,
        |  5 * n_alpha >= 4 * n_words AS alpha_ok,
        |  n_stop >= 2 AS stop_ok,
        |  (words_ok AND mwl_ok AND sym_ok AND bullet_ok
        |    AND ellipsis_ok AND alpha_ok AND stop_ok) AS keep
        |FROM f ORDER BY doc_id""".stripMargin,
    // p16: same smoothed log-ratio per token occurrence, round-9 nano
    // longs (ln over a ratio of exact integer products)
    "p16_dsir_select" ->
      """WITH tok AS (
        |  SELECT doc_id, lang,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        |  FROM documents),
        |r AS (SELECT t, count(*) AS rc FROM tok GROUP BY t),
        |tg AS (SELECT t, count(*) AS tc FROM tok WHERE lang = 'en'
        |  GROUP BY t),
        |c AS (SELECT
        |  (SELECT CAST(sum(rc) AS BIGINT) FROM r) AS rr,
        |  (SELECT CAST(count(*) AS BIGINT) FROM r) AS vv,
        |  (SELECT CAST(count(*) AS BIGINT) FROM tok WHERE lang = 'en')
        |    AS tt),
        |sc AS (
        |  SELECT doc_id, max(lang) AS lang, count(*) AS n_tok,
        |    CAST(sum(CAST(round(round(ln(
        |      (CAST(coalesce(tg.tc, 0) + 1 AS DOUBLE)
        |        * CAST(c.rr + c.vv AS DOUBLE)) /
        |      (CAST(r.rc + 1 AS DOUBLE)
        |        * CAST(c.tt + c.vv AS DOUBLE))), 9) * 1e9, 0)
        |      AS BIGINT)) AS BIGINT) AS score_nanos
        |  FROM tok JOIN r USING (t) LEFT JOIN tg USING (t) CROSS JOIN c
        |  GROUP BY doc_id)
        |SELECT doc_id, lang, CAST(n_tok AS BIGINT) AS n_tok, score_nanos
        |FROM sc ORDER BY score_nanos DESC, doc_id LIMIT 50""".stripMargin,
    // s24: both legs replayed (s22's BM25 SQL at k=20; s1's cosine SQL
    // over the doc-aligned vectors), ranks over each leg's ROUNDED
    // score with id tie-break, RRF mass as integer nanos
    "s24_rrf_fusion" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |      AS len
        |  FROM documents),
        |consts AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(len) AS DOUBLE) / count(*) AS avgdl FROM base),
        |tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+'))
        |    AS t
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS tf FROM tok
        |  WHERE t IN ('join', 'filter', 'scan') GROUP BY doc_id, t),
        |dfr AS (SELECT t, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY t),
        |terms AS (
        |  SELECT tf.doc_id, b.len,
        |    round(ln(CAST(1.0 AS DOUBLE) + (c.n - dfr.df + CAST(0.5 AS DOUBLE))
        |        / (dfr.df + CAST(0.5 AS DOUBLE)))
        |      * (tf.tf * CAST(2.2 AS DOUBLE))
        |      / (tf.tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
        |        + CAST(0.75 AS DOUBLE) * CAST(b.len AS DOUBLE) / c.avgdl)),
        |      9) AS s
        |  FROM tf JOIN dfr USING (t) JOIN base b ON b.doc_id = tf.doc_id,
        |    consts c),
        |lexs AS (
        |  SELECT doc_id,
        |    CAST(round(sum(CAST(s AS DECIMAL(27, 9))), 6) AS DOUBLE)
        |      AS score
        |  FROM terms GROUP BY doc_id
        |  ORDER BY score DESC, doc_id LIMIT 20),
        |lex AS (
        |  SELECT doc_id,
        |    row_number() OVER (ORDER BY score DESC, doc_id) AS r_lex
        |  FROM lexs),
        |q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
        |  WHERE vec_id = 0),
        |dsr AS (
        |  SELECT vec_id AS doc_id,
        |    list_cosine_similarity(embedding::DOUBLE[], qe) AS raw
        |  FROM embeddings, q WHERE vec_id < 500
        |  ORDER BY raw DESC, doc_id LIMIT 20),
        |den AS (
        |  SELECT doc_id, row_number() OVER (
        |    ORDER BY round(raw, 6) DESC, doc_id) AS r_dense
        |  FROM dsr),
        |fu AS (
        |  SELECT coalesce(lex.doc_id, den.doc_id) AS doc_id,
        |    coalesce(lex.r_lex, 0) AS r_lex,
        |    coalesce(den.r_dense, 0) AS r_dense,
        |    CAST(coalesce(round(1e9 / (60 + lex.r_lex), 0), 0)
        |      + coalesce(round(1e9 / (60 + den.r_dense), 0), 0)
        |      AS BIGINT) AS rrf_nanos
        |  FROM lex FULL OUTER JOIN den ON lex.doc_id = den.doc_id)
        |SELECT doc_id, r_lex, r_dense, rrf_nanos FROM fu
        |ORDER BY rrf_nanos DESC, doc_id LIMIT 10""".stripMargin,
    // g2: the naive triple self-join counts the same planted triangles
    // (feasible because it is DuckDB on the fixture, not the 100 TB
    // path the oriented-wedge plan exists for)
    "g2_triangle_count" ->
      """WITH n AS (SELECT doc_id AS id FROM documents),
        |e AS (
        |  SELECT a.id AS s, b.id AS t FROM n a JOIN n b
        |    ON b.id = a.id + 1 WHERE a.id % 50 <> 49
        |  UNION ALL
        |  SELECT a.id, b.id FROM n a JOIN n b
        |    ON b.id = a.id + 2 WHERE a.id % 50 <= 47),
        |tri AS (
        |  SELECT e1.s AS a, e1.t AS b, e2.t AS c
        |  FROM e e1 JOIN e e2 ON e2.s = e1.s AND e2.t > e1.t
        |  JOIN e e3 ON e3.s = e1.t AND e3.t = e2.t),
        |pn AS (
        |  SELECT id, count(*) AS n_triangles FROM (
        |    SELECT a AS id FROM tri
        |    UNION ALL SELECT b FROM tri
        |    UNION ALL SELECT c FROM tri)
        |  GROUP BY id)
        |SELECT n.id AS doc_id,
        |  CAST(coalesce(pn.n_triangles, 0) AS BIGINT) AS n_triangles
        |FROM n LEFT JOIN pn ON pn.id = n.id ORDER BY doc_id""".stripMargin,
    // t16: DuckDB's independent Unicode implementation of the same
    // canonicalization; the decomposed prefix (Cafe + U+0301) is the
    // case NFC must fold
    "t16_normalize" ->
      s"""WITH pre AS (
         |  SELECT doc_id,
         |    (['Café', 'Café', 'naïve RÉSUMÉ', 'Ångström',
         |      'ñ São Ü', 'ASCII only'])[CAST(doc_id % 6 AS INT) + 1]
         |      || ' ' || text AS text
         |  FROM documents WHERE doc_id < 60),
         |c AS (SELECT doc_id,
         |    lower(strip_accents(nfc_normalize(text))) AS canon FROM pre)
         |SELECT doc_id, substr(canon, 1, 48) AS head,
         |  CAST(length(canon) AS BIGINT) AS n_chars
         |FROM c ORDER BY doc_id""".stripMargin,
    // k5: the exact heavy-hitter set the MG candidate gate must produce
    "k5_heavy_hitters" ->
      """WITH real AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |  FROM documents),
        |tail AS (
        |  SELECT 'syn' || (doc_id * 40 + j) AS token
        |  FROM documents, (SELECT unnest(range(40)) AS j)),
        |tok AS (SELECT token FROM real UNION ALL SELECT token FROM tail),
        |tot AS (SELECT count(*) AS n FROM tok)
        |SELECT token, count(*) AS cnt FROM tok, tot GROUP BY token, tot.n
        |HAVING count(*) >= tot.n // 257 + 1
        |ORDER BY cnt DESC, token""".stripMargin,
    // s22: BM25 replayed term by term (Lucene idf, k1=1.2, b=0.75),
    // per-term round-9, DECIMAL accumulation, top-25 by (score, id)
    "s22_bm25" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |      AS len
        |  FROM documents),
        |consts AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(len) AS DOUBLE) / count(*) AS avgdl FROM base),
        |tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+'))
        |    AS t
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS tf FROM tok
        |  WHERE t IN ('join', 'filter', 'scan') GROUP BY doc_id, t),
        |dfr AS (SELECT t, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY t),
        |terms AS (
        |  SELECT tf.doc_id, b.len,
        |    round(ln(CAST(1.0 AS DOUBLE) + (c.n - dfr.df + CAST(0.5 AS DOUBLE))
        |        / (dfr.df + CAST(0.5 AS DOUBLE)))
        |      * (tf.tf * CAST(2.2 AS DOUBLE))
        |      / (tf.tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
        |        + CAST(0.75 AS DOUBLE) * CAST(b.len AS DOUBLE) / c.avgdl)),
        |      9) AS s
        |  FROM tf JOIN dfr USING (t) JOIN base b ON b.doc_id = tf.doc_id,
        |    consts c)
        |SELECT doc_id, min(len) AS n_tok, count(*) AS n_hit,
        |  CAST(round(sum(CAST(s AS DECIMAL(27, 9))), 6) AS DOUBLE) AS score
        |FROM terms GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 25""".stripMargin,
    // p14: the split hash replayed as pure integer arithmetic over the
    // distinct sources
    "p14_group_split" ->
      """WITH b AS (
        |  SELECT source,
        |    ((list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(range(1, length(source) + 1),
        |          i -> ascii(source[i]))),
        |      (h, c) -> (h * 31 + c) % 2147483648) * 2654435761)
        |      % 4294967296) % 1000 AS bucket
        |  FROM (SELECT DISTINCT source FROM documents)),
        |a AS (
        |  SELECT source,
        |    CASE WHEN bucket < 700 THEN 'train'
        |         WHEN bucket < 850 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM b)
        |SELECT d.source, a.split, count(*) AS n_docs,
        |  CAST(sum(len(regexp_split_to_array(trim(d.text), '\s+')))
        |    AS BIGINT) AS n_tokens
        |FROM documents d JOIN a USING (source)
        |GROUP BY d.source, a.split ORDER BY source""".stripMargin,
    "g1_pagerank" -> g1OracleSql,
    "g3_bfs_hops" ->
      """SELECT doc_id,
        |  (doc_id % 50) // 10 + (doc_id % 50) % 10 AS dist
        |FROM documents ORDER BY doc_id""".stripMargin,
    "p17_compaction_plan" ->
      """WITH f AS (
        |  SELECT source, doc_id, n_chars,
        |    COALESCE(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
        |  FROM documents)
        |SELECT source, CAST(start_off // 25000 AS BIGINT) AS bin,
        |  count(*) AS n_files,
        |  CAST(sum(n_chars) AS BIGINT) AS bytes,
        |  min(doc_id) AS first_id, max(doc_id) AS last_id
        |FROM f GROUP BY 1, 2 ORDER BY source, bin""".stripMargin,
    "d14_fuzzy_join" ->
      """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  levenshtein(substring(a.text, 1, 40), substring(b.text, 1, 40)) AS dist
        |FROM documents a JOIN documents b
        |  ON a.lang = b.lang AND a.doc_id < b.doc_id
        | AND abs(a.n_chars - b.n_chars) <= 24
        |WHERE levenshtein(substring(a.text, 1, 40), substring(b.text, 1, 40)) <= 10
        |ORDER BY id_a, id_b""".stripMargin,
    "p19_epoch_shuffle" ->
      """WITH ep AS (SELECT * FROM (VALUES (0), (1)) AS t(epoch)),
        |m AS (
        |  SELECT epoch, doc_id,
        |    ((doc_id + epoch * 1000003) % 2147483648)
        |      * 2654435761 % 4294967296 AS h
        |  FROM documents CROSS JOIN ep)
        |SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
        |  CAST(h % 4 AS BIGINT) AS shard,
        |  row_number() OVER (PARTITION BY epoch, h % 4 ORDER BY h, doc_id) - 1
        |    AS pos
        |FROM m ORDER BY epoch, shard, pos""".stripMargin,
    "t21_source_overlap" ->
      """WITH st AS (
        |  SELECT DISTINCT source,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |sz AS (SELECT source, count(*) AS sz FROM st GROUP BY source),
        |ix AS (
        |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter
        |  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, CAST(inter AS BIGINT) AS inter,
        |  CAST(inter AS DOUBLE) / (za.sz + zb.sz - inter) AS jaccard
        |FROM ix
        |JOIN sz za ON za.source = src_a
        |JOIN sz zb ON zb.source = src_b
        |ORDER BY src_a, src_b""".stripMargin,
    "p18_weighted_sample" ->
      """SELECT doc_id, source, n_chars,
        |  CAST(round(round(
        |    ln(CAST(((doc_id % 2147483648) * 2654435761 % 4294967296)
        |            + 1 AS DOUBLE) / 4294967296.0)
        |    / n_chars, 9) * 1e9, 0) AS BIGINT) AS key_nanos
        |FROM documents
        |ORDER BY key_nanos DESC, doc_id LIMIT 20""".stripMargin,
    "s27_embedding_outliers" ->
      """WITH el AS (
        |  SELECT vec_id, i,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
        |      AS xq
        |  FROM embeddings, generate_series(1, 64) AS t(i)),
        |n AS (SELECT count(*) AS n FROM embeddings),
        |stats AS (
        |  SELECT i,
        |    CAST(floor(CAST(sum(xq) AS DOUBLE) / n.n) AS BIGINT) AS mq,
        |    greatest(
        |      CAST(floor(CAST(sum(xq * xq) AS DOUBLE) / n.n) AS BIGINT)
        |      - CAST(floor(CAST(sum(xq) AS DOUBLE) / n.n) AS BIGINT)
        |        * CAST(floor(CAST(sum(xq) AS DOUBLE) / n.n) AS BIGINT),
        |      1) AS vq
        |  FROM el CROSS JOIN n GROUP BY i, n.n)
        |SELECT vec_id, CAST(sum(term) AS BIGINT) AS score FROM (
        |  SELECT el.vec_id,
        |    ((el.xq - st.mq) * (el.xq - st.mq) * 1000) // st.vq AS term
        |  FROM el JOIN stats st ON el.i = st.i)
        |GROUP BY vec_id
        |ORDER BY score DESC, vec_id LIMIT 20""".stripMargin,
    "s26_covariance" ->
      """WITH el AS (
        |  SELECT vec_id, i,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
        |      AS xq
        |  FROM embeddings, generate_series(1, 64) AS t(i)),
        |sums AS (
        |  SELECT i, CAST(sum(xq) AS BIGINT) AS sx FROM el GROUP BY i),
        |prods AS (
        |  SELECT a.i AS i, b.i AS j, CAST(sum(a.xq * b.xq) AS BIGINT) AS sxy
        |  FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.i <= b.i
        |  GROUP BY 1, 2),
        |n AS (SELECT count(*) AS n FROM embeddings)
        |SELECT p.i, p.j,
        |  CAST(sxy AS DOUBLE) / n.n / 1000000000000.0
        |    - (CAST(si.sx AS DOUBLE) / n.n / 1000000.0)
        |      * (CAST(sj.sx AS DOUBLE) / n.n / 1000000.0)
        |    AS cov
        |FROM prods p
        |JOIN sums si ON si.i = p.i
        |JOIN sums sj ON sj.i = p.j
        |CROSS JOIN n
        |ORDER BY p.i, p.j""".stripMargin,
    "s25_maxsim" ->
      """WITH q AS (
        |  SELECT vec_id AS q_idx, embedding::DOUBLE[] AS qe
        |  FROM embeddings WHERE vec_id < 4),
        |d AS (
        |  SELECT vec_id // 4 AS m_id, embedding::DOUBLE[] AS de
        |  FROM embeddings),
        |mx AS (
        |  SELECT m_id, q_idx, max(list_dot_product(de, qe)) AS mx
        |  FROM d, q GROUP BY 1, 2),
        |sc AS (
        |  SELECT m_id,
        |    CAST(sum(CAST(mx AS DECIMAL(28,10))) AS DOUBLE) AS score
        |  FROM mx GROUP BY 1)
        |SELECT m_id, round(score, 6) AS score FROM sc
        |ORDER BY sc.score DESC, m_id LIMIT 10""".stripMargin,
    "t20_url_filter" ->
      """SELECT source || '.example.com' AS host, count(*) AS n,
        |  min('/' || lang || '/doc-' || doc_id) AS first_path
        |FROM documents
        |WHERE source NOT IN ('src3', 'src7', 'src11')
        |GROUP BY 1 ORDER BY host""".stripMargin,
    // m10: every thumbnail pixel replayed via the analytic fixture pixel
    // at the integer NN source index (x·w div 8, y·h div 8)
    "m10_image_resize" ->
      """WITH g AS (SELECT unnest(range(0, 8)) AS v),
        |dims AS (
        |  SELECT doc_id AS id, CAST(16 + doc_id % 17 AS INT) AS w,
        |    CAST(16 + (doc_id * 7) % 13 AS INT) AS h
        |  FROM documents WHERE doc_id < 200),
        |px AS (
        |  SELECT d.id, d.w, d.h,
        |    sum((d.id * 31 + (gx.v * d.w // 8) * 7
        |      + (gy.v * d.h // 8) * 13) % 256) AS s,
        |    sum(((d.id * 31 + (gx.v * d.w // 8) * 7
        |      + (gy.v * d.h // 8) * 13) % 256)
        |      * (gy.v * 8 + gx.v + 1)) AS chk
        |  FROM dims d JOIN g gx ON true JOIN g gy ON true
        |  GROUP BY d.id, d.w, d.h)
        |SELECT id AS media_id, CAST(w AS BIGINT) AS src_w,
        |  CAST(h AS BIGINT) AS src_h, CAST(s AS BIGINT) AS thumb_sum,
        |  CAST(chk AS BIGINT) AS thumb_chk,
        |  round(CAST(s AS DOUBLE) / 64, 4) AS mean_lum
        |FROM px ORDER BY media_id""".stripMargin,
    // a18: weighted ranks replayed as cumulative weights over distinct
    // values; rank = floor(q·(W−1))+1 in the same IEEE arithmetic
    "a18_weighted_quantiles" ->
      """WITH t AS (
        |  SELECT lang,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |      AS v
        |  FROM documents),
        |w AS (SELECT lang, v, sum(v) AS gw FROM t GROUP BY lang, v),
        |c AS (SELECT lang, v,
        |    sum(gw) OVER (PARTITION BY lang ORDER BY v) AS cum FROM w),
        |tot AS (SELECT lang, sum(v) AS tw FROM t GROUP BY lang),
        |r AS (SELECT lang,
        |    CAST(floor(CAST(0.25 AS DOUBLE) * (tw - 1)) AS BIGINT) + 1 AS r25,
        |    CAST(floor(CAST(0.5 AS DOUBLE) * (tw - 1)) AS BIGINT) + 1 AS r50,
        |    CAST(floor(CAST(0.9 AS DOUBLE) * (tw - 1)) AS BIGINT) + 1 AS r90
        |  FROM tot)
        |SELECT c.lang,
        |  CAST(min(CASE WHEN cum >= r25 THEN v END) AS BIGINT) AS w25,
        |  CAST(min(CASE WHEN cum >= r50 THEN v END) AS BIGINT) AS w50,
        |  CAST(min(CASE WHEN cum >= r90 THEN v END) AS BIGINT) AS w90
        |FROM c JOIN r USING (lang) GROUP BY c.lang ORDER BY lang""".stripMargin,
    // t18: the interpolated bigram NLL replayed pair-for-pair
    "t18_bigram_lm" ->
      """WITH dl AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS l
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(l)),
        |    i -> struct_pack(w1 := l[i], w2 := l[i + 1]))) AS p
        |  FROM dl),
        |rb AS (
        |  SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS cb
        |  FROM bg WHERE doc_id < 250
        |  GROUP BY 1, 2),
        |ru AS (
        |  SELECT w, count(*) AS cu FROM (
        |    SELECT unnest(l) AS w FROM dl WHERE doc_id < 250)
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(cu) AS DOUBLE) AS n,
        |  CAST(count(*) AS DOUBLE) AS v FROM ru),
        |pairs AS (
        |  SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bg),
        |nll AS (
        |  SELECT p.doc_id,
        |    round(-ln(CAST(0.5 AS DOUBLE)
        |        * ((coalesce(rb.cb, 0) + 1) / (coalesce(r1.cu, 0) + tot.v))
        |      + CAST(0.5 AS DOUBLE)
        |        * ((coalesce(r2.cu, 0) + 1) / (tot.n + tot.v))), 9) AS s
        |  FROM pairs p
        |  LEFT JOIN rb ON rb.w1 = p.w1 AND rb.w2 = p.w2
        |  LEFT JOIN ru r1 ON r1.w = p.w1
        |  LEFT JOIN ru r2 ON r2.w = p.w2, tot)
        |SELECT doc_id, count(*) AS n_pairs,
        |  round(CAST(round(sum(CAST(s AS DECIMAL(27, 9))), 6) AS DOUBLE)
        |    / count(*), 4) AS avg_nll
        |FROM nll GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // t17: median and MAD replayed as integer nearest-rank statistics
    "t17_outlier_filter" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents),
        |o1 AS (SELECT n_tokens, row_number() OVER (ORDER BY n_tokens) rn,
        |    count(*) OVER () cnt FROM t),
        |med AS (SELECT n_tokens AS med FROM o1 WHERE rn = (cnt - 1) // 2 + 1),
        |d AS (SELECT doc_id, n_tokens, abs(n_tokens - med.med) AS dev
        |  FROM t, med),
        |o2 AS (SELECT dev, row_number() OVER (ORDER BY dev) rn,
        |    count(*) OVER () cnt FROM d),
        |mad AS (SELECT dev AS mad FROM o2 WHERE rn = (cnt - 1) // 2 + 1)
        |SELECT doc_id, n_tokens, CAST(d.dev AS BIGINT) AS dev,
        |  d.dev > 3 * mad.mad AS is_outlier
        |FROM d, mad ORDER BY doc_id""".stripMargin,
    // m9: consecutive-frame luminance deltas from the analytic pixel
    // function (the m6 oracle's frame model at everyN=1, maxFrames=8)
    "m9_scene_change" ->
      """WITH g AS (SELECT unnest(range(0, 32)) AS v),
        |clips AS (
        |  SELECT doc_id AS id, 8 + doc_id % 13 AS w,
        |    8 + (doc_id * 3) % 11 AS h, 3 + doc_id % 4 AS n
        |  FROM documents WHERE doc_id < 100),
        |fr AS (
        |  SELECT c.id, f.v AS frame_idx, c.w, c.h
        |  FROM clips c JOIN g f ON f.v < 8 AND f.v < c.n),
        |px AS (
        |  SELECT fr.id, fr.frame_idx, any_value(fr.w) AS w,
        |    any_value(fr.h) AS h,
        |    sum((fr.id * 31 + fr.frame_idx * 41 + gx.v * 7 + gy.v * 13)
        |      % 256) AS s
        |  FROM fr JOIN g gx ON gx.v < fr.w JOIN g gy ON gy.v < fr.h
        |  GROUP BY fr.id, fr.frame_idx),
        |lum AS (
        |  SELECT id, frame_idx, CAST(s AS DOUBLE) / (w * h) AS ml FROM px),
        |pairs AS (
        |  SELECT id, frame_idx, ml,
        |    lag(ml) OVER (PARTITION BY id ORDER BY frame_idx) AS prev
        |  FROM lum)
        |SELECT id AS media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  round(ml - prev, 4) AS delta, abs(ml - prev) > 4.0 AS is_cut
        |FROM pairs WHERE prev IS NOT NULL
        |ORDER BY media_id, frame_idx""".stripMargin,
    "t7_pii_redact" -> t7OracleSql,
    // d18: same whitespace tokens, same truncated-shingle rule (a doc
    // shorter than 8 tokens yields its one truncated shingle), distinct
    // shared shingles per contaminated train doc
    "d18_decontaminate" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct([array_to_string(t[i:i+7], ' ')
        |    for i in range(1, greatest(len(t), 8) - 6)]) AS grams
        |  FROM tok),
        |ev AS (SELECT DISTINCT unnest(grams) AS g FROM sh
        |       WHERE doc_id % 11 = 0 AND doc_id < 10000),
        |tr AS (SELECT doc_id, unnest(grams) AS g FROM sh
        |       WHERE NOT (doc_id % 11 = 0 AND doc_id < 10000))
        |SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_hits
        |FROM tr JOIN ev USING (g)
        |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin,
    // t22: replay the planted line structure and all four C4 rules
    "d17_cdc_chunks" ->
      """WITH d AS (
        |  SELECT doc_id, coalesce(text, '') AS t,
        |    CAST(length(coalesce(text, '')) AS BIGINT) AS n
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, CAST(p.v AS BIGINT) AS p,
        |    ((((((((((((((CAST(ascii(substring(t, CAST(p.v AS INT) - 7, 1))
        |        AS BIGINT)
        |      * 257 + ascii(substring(t, CAST(p.v AS INT) - 6, 1)))
        |        % 1000000007)
        |      * 257 + ascii(substring(t, CAST(p.v AS INT) - 5, 1)))
        |        % 1000000007)
        |      * 257 + ascii(substring(t, CAST(p.v AS INT) - 4, 1)))
        |        % 1000000007)
        |      * 257 + ascii(substring(t, CAST(p.v AS INT) - 3, 1)))
        |        % 1000000007)
        |      * 257 + ascii(substring(t, CAST(p.v AS INT) - 2, 1)))
        |        % 1000000007)
        |      * 257 + ascii(substring(t, CAST(p.v AS INT) - 1, 1)))
        |        % 1000000007)
        |      * 257 + ascii(substring(t, CAST(p.v AS INT), 1)))
        |        % 1000000007) AS h
        |  FROM d, LATERAL (SELECT unnest(range(8, n + 1)) AS v) p
        |  WHERE n >= 8),
        |ends AS (
        |  SELECT DISTINCT doc_id, e FROM (
        |    SELECT doc_id, p AS e FROM pos WHERE h % 64 = 0
        |    UNION ALL
        |    SELECT doc_id, n AS e FROM d WHERE n >= 1)),
        |ch AS (
        |  SELECT doc_id,
        |    coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY e), 0) + 1
        |      AS s,
        |    e
        |  FROM ends),
        |ct AS (
        |  SELECT ch.doc_id,
        |    substring(d.t, CAST(s AS INT), CAST(e - s + 1 AS INT)) AS c,
        |    e - s + 1 AS clen
        |  FROM ch JOIN d USING (doc_id)),
        |dup AS (SELECT c FROM ct GROUP BY c
        |        HAVING count(DISTINCT doc_id) >= 2),
        |st AS (
        |  SELECT doc_id, count(*) AS n_dup_chunks,
        |    CAST(sum(clen) AS BIGINT) AS dup_chars
        |  FROM ct JOIN dup USING (c) GROUP BY doc_id),
        |nc AS (SELECT doc_id, count(*) AS n_chunks FROM ct GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(nc.n_chunks, 0) AS n_chunks,
        |  coalesce(st.n_dup_chunks, 0) AS n_dup_chunks,
        |  coalesce(st.dup_chars, 0) AS dup_chars
        |FROM d LEFT JOIN nc USING (doc_id) LEFT JOIN st USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "t24_token_drift" ->
      """WITH tok AS (
        |  SELECT lang,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (
        |  SELECT t,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c_a,
        |    CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c_b
        |  FROM tok GROUP BY t),
        |n AS (SELECT CAST(sum(c_a) AS BIGINT) AS n_a,
        |             CAST(sum(c_b) AS BIGINT) AS n_b FROM c)
        |SELECT t AS token, c_a, c_b,
        |  CAST(abs(CAST(c_a AS HUGEINT) * n_b - CAST(c_b AS HUGEINT) * n_a)
        |    AS BIGINT) AS diff_num
        |FROM c CROSS JOIN n
        |ORDER BY diff_num DESC, token LIMIT 50""".stripMargin,
    "t23_log_templates" ->
      """WITH m AS (
        |  SELECT event_type || ' user=' || CAST(user_id AS VARCHAR)
        |    || ' v='
        |    || CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR)
        |    || ' src=10.0.' || CAST(user_id // 256 AS VARCHAR)
        |    || '.' || CAST(user_id % 256 AS VARCHAR)
        |    || ' req=' || lpad(lower(to_hex(event_id)), 12, '0') AS msg
        |  FROM events WHERE value IS NOT NULL),
        |t AS (
        |  SELECT regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(msg,
        |        '[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}',
        |        '<uuid>', 'g'),
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
        |      '<ip>', 'g'),
        |    '\b[0-9a-f]{12,}\b', '<hex>', 'g'),
        |    '[0-9]+', '<num>', 'g') AS template, msg
        |  FROM m)
        |SELECT template, count(*) AS n, min(msg) AS example
        |FROM t GROUP BY template
        |ORDER BY n DESC, template""".stripMargin,
    "t22_c4_line_clean" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS v
        |  FROM documents),
        |built AS (
        |  SELECT doc_id,
        |    [array_to_string(v[1:8], ' ') || '.']
        |    || (CASE WHEN doc_id % 3 = 0
        |          THEN ['{ config = true }'] ELSE [] END)
        |    || (CASE WHEN doc_id % 5 = 0
        |          THEN ['lorem ipsum dolor sit amet.'] ELSE [] END)
        |    || [array_to_string(v[9:11], ' ')]
        |    || [array_to_string(list_concat(v[12:],
        |          ['end', 'of', 'doc.']), ' ')] AS lines
        |  FROM d),
        |f AS (
        |  SELECT doc_id, lines,
        |    list_filter(lines, l ->
        |      len(regexp_split_to_array(trim(l), '\s+')) >= 5
        |      AND regexp_matches(trim(l), '[.!?"]$')
        |      AND position('{' IN l) = 0 AND position('}' IN l) = 0
        |      AND position('lorem ipsum' IN lower(l)) = 0) AS kept
        |  FROM built)
        |SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  array_to_string(kept, chr(10)) AS text_kept
        |FROM f ORDER BY doc_id""".stripMargin,
    // d3: planted families only — see d3_simhash for the hamming-0 proof.
    // 25 families x 3 pairs, all analytic; organic ids never satisfy the
    // mod-100000 congruence filter.
    // the offset replays the Spark side's rule: smallest power of 10
    // strictly above max(doc_id), floored at 1e5 (string length is the
    // exact digit count — no log10 float edge at exact powers)
    "d3_simhash" ->
      """WITH m AS (
        |  SELECT greatest(100000, CAST(power(10,
        |    length(CAST(max(doc_id) AS VARCHAR))) AS BIGINT)) AS off
        |  FROM documents)
        |SELECT id_a, id_b, hamming FROM (
        |  SELECT doc_id AS id_a, doc_id + off AS id_b,
        |    CAST(0 AS INTEGER) AS hamming FROM documents, m WHERE doc_id < 25
        |  UNION ALL
        |  SELECT doc_id, doc_id + 2 * off, CAST(0 AS INTEGER)
        |  FROM documents, m WHERE doc_id < 25
        |  UNION ALL
        |  SELECT doc_id + off, doc_id + 2 * off, CAST(0 AS INTEGER)
        |  FROM documents, m WHERE doc_id < 25
        |) ORDER BY id_a, id_b""".stripMargin,
    // t2_fingerprint: hash-group structure replayed by grouping on the
    // raw text — equal iff content_hash is deterministic+injective on
    // the corpus and the fingerprint is a pure function of the text.
    "t2_fingerprint" ->
      """SELECT doc_id,
        |  count(*) OVER (PARTITION BY text) AS hash_group_size,
        |  min(doc_id) OVER (PARTITION BY text) AS hash_canonical_id,
        |  CAST(1 AS BIGINT) AS n_fp_in_group
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d1_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,
    "d1_dedup_exact_rows" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "t4_curation_pipeline" ->
      """WITH p AS (
        |  SELECT doc_id, source, text,
        |    regexp_split_to_array(trim(text), '\s+') AS toks,
        |    list_transform(regexp_split_to_array(trim(text), '\s+'),
        |      w -> lower(w)) AS ltoks,
        |    greatest(length(text), 1) AS glen
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, source, text, toks, glen,
        |    greatest(len(toks), 1) AS ntok,
        |    length(regexp_replace(text, '[^\x{4E00}-\x{9FFF}]', '', 'g')) AS cjk,
        |    len(list_intersect(ltoks, ['der','die','und','in','den','von','zu','das','mit','sich','des','auf','für','ist','im','dem','nicht','ein'])) AS s_de,
        |    len(list_intersect(ltoks, ['the','of','and','to','in','is','that','it','was','for','on','are','with','as','his','they','at','be','this'])) AS s_en,
        |    len(list_intersect(ltoks, ['de','la','que','el','en','y','los','del','se','las','por','un','para','con','una','su','al','es','lo'])) AS s_es,
        |    len(list_intersect(ltoks, ['de','la','le','et','les','des','en','un','du','une','que','est','pour','qui','dans','par','plus','pas','au'])) AS s_fr,
        |    length(regexp_replace(text, '[^\p{L} ]', '', 'g'))::DOUBLE / glen AS alpha_ratio,
        |    CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE)
        |      / greatest(len(toks), 1) AS mean_wl,
        |    length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS n_punct,
        |    CAST(len(list_distinct(toks)) AS DOUBLE)
        |      / greatest(len(toks), 1) AS distinct_ratio
        |  FROM p),
        |q AS (
        |  SELECT doc_id, source, text, toks,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CASE WHEN cjk > length(text) * 0.2 THEN 'zh'
        |         WHEN greatest(s_de, s_en, s_es, s_fr) > 0 THEN
        |           CASE WHEN s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
        |                WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
        |                WHEN s_en >= s_de THEN 'en'
        |                ELSE 'de' END
        |         ELSE 'unknown' END AS lang_pred,
        |    alpha_ratio * 0.3
        |      + (CASE WHEN mean_wl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2
        |      + (CASE WHEN ntok BETWEEN 10 AND 100000 THEN 1.0
        |              WHEN ntok BETWEEN 3 AND 9 THEN 0.5 ELSE 0.1 END) * 0.2
        |      + (CASE WHEN n_punct::DOUBLE / glen < 0.2 THEN 1.0 ELSE 0.3 END) * 0.15
        |      + (CASE WHEN distinct_ratio > 0.3 THEN 1.0
        |              WHEN distinct_ratio > 0.1 THEN 0.6 ELSE 0.2 END) * 0.15
        |      AS quality
        |  FROM f),
        |kept AS (
        |  SELECT doc_id, source, text, toks, n_tokens FROM q
        |  WHERE lang_pred != 'unknown' AND quality >= 0.5),
        |ex AS (
        |  SELECT doc_id, source, toks, n_tokens FROM (
        |    SELECT doc_id, source, toks, n_tokens,
        |      row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |    FROM kept) WHERE rn = 1),
        |g AS (
        |  SELECT doc_id AS id,
        |    list_distinct([array_to_string(toks[i : i + 2], ' ')
        |      for i in range(1, greatest(len(toks) - 2, 1) + 1)]) AS sh
        |  FROM ex),
        |drops AS (
        |  SELECT DISTINCT b.id FROM g a JOIN g b ON a.id < b.id
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        |FROM ex WHERE doc_id NOT IN (SELECT id FROM drops)
        |GROUP BY source ORDER BY source""".stripMargin,
    // m11: replay the analytic pixel function over each image's grid
    "m11_lum_histogram" ->
      """WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 100),
        |dims AS (
        |  SELECT id, 16 + id % 17 AS w, 16 + (id * 7) % 13 AS h FROM ids),
        |px AS (
        |  SELECT d.id, (d.id * 31 + x.x * 7 + y.y * 13) % 256 AS lum
        |  FROM dims d
        |  JOIN generate_series(0, 32) AS x(x) ON x.x < d.w
        |  JOIN generate_series(0, 28) AS y(y) ON y.y < d.h)
        |SELECT id AS media_id, CAST(lum // 32 AS BIGINT) AS bucket,
        |  count(*) AS n
        |FROM px GROUP BY 1, 2 ORDER BY media_id, bucket""".stripMargin,
    // d16 = d9 through the persisted signature index: same oracle
    "d16_signature_store" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id AS id,
        |    list_distinct([array_to_string(toks[i : i + 2], ' ')
        |      for i in range(1, greatest(len(toks) - 2, 1) + 1)]) AS sh
        |  FROM t)
        |SELECT n.id AS id_new, h.id AS id_hist,
        |  round(CAST(len(list_intersect(n.sh, h.sh)) AS DOUBLE)
        |    / len(list_distinct(list_concat(n.sh, h.sh))), 6) AS jaccard
        |FROM g n JOIN g h ON n.id >= 250 AND h.id < 250
        |WHERE CAST(len(list_intersect(n.sh, h.sh)) AS DOUBLE)
        |    / len(list_distinct(list_concat(n.sh, h.sh))) >= 0.8
        |ORDER BY id_new, id_hist""".stripMargin,
    "d9_incremental_neardup" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id AS id,
        |    list_distinct([array_to_string(toks[i : i + 2], ' ')
        |      for i in range(1, greatest(len(toks) - 2, 1) + 1)]) AS sh
        |  FROM t)
        |SELECT n.id AS id_new, h.id AS id_hist,
        |  round(CAST(len(list_intersect(n.sh, h.sh)) AS DOUBLE)
        |    / len(list_distinct(list_concat(n.sh, h.sh))), 6) AS jaccard
        |FROM g n JOIN g h ON n.id >= 250 AND h.id < 250
        |WHERE CAST(len(list_intersect(n.sh, h.sh)) AS DOUBLE)
        |    / len(list_distinct(list_concat(n.sh, h.sh))) >= 0.8
        |ORDER BY id_new, id_hist""".stripMargin,
    "d2_minhash_lsh" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id AS id,
        |    list_distinct([array_to_string(toks[i : i + 2], ' ')
        |      for i in range(1, greatest(len(toks) - 2, 1) + 1)]) AS sh
        |  FROM t)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
        |FROM g a JOIN g b ON a.id < b.id
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    "d7_incremental_dedup" ->
      """WITH batch AS (
        |  SELECT doc_id, source, text FROM documents WHERE doc_id >= 250
        |  UNION ALL
        |  SELECT doc_id + 10000, source, text FROM documents WHERE doc_id < 50)
        |SELECT b.doc_id, b.source FROM batch b
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM documents h WHERE h.doc_id < 250 AND h.text = b.text)
        |ORDER BY doc_id""".stripMargin,
    "d8_span_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, unnest(range(0, len(toks), 10)) AS strt, toks
        |  FROM t),
        |sp AS (
        |  SELECT doc_id, CAST(strt // 10 AS BIGINT) AS idx,
        |    array_to_string(toks[strt + 1 : strt + 10], ' ') AS span
        |  FROM s),
        |k AS (
        |  SELECT doc_id, idx, span, row_number() OVER (
        |    PARTITION BY span ORDER BY doc_id, idx) AS rn
        |  FROM sp)
        |SELECT doc_id, count(*) AS n_spans,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  coalesce(string_agg(CASE WHEN rn = 1 THEN span END, ' '
        |    ORDER BY idx), '') AS text_kept
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // d12: replay windows on TEXT (engine groups xxhash64 of the window
    // — same grouping absent a 64-bit collision); merge rule replayed
    // verbatim: new span iff pos > every earlier seed's end
    "d12_substring_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, coalesce(text, '') AS t,
        |    CAST(length(coalesce(text, '')) AS BIGINT) AS doc_len
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, CAST(p.v AS INT) AS pos,
        |    substring(t, CAST(p.v AS INT) + 1, 30) AS s
        |  FROM d, LATERAL (SELECT unnest(range(0, doc_len - 29)) AS v) p
        |  WHERE doc_len >= 30),
        |dup AS (SELECT s FROM w GROUP BY s HAVING count(DISTINCT doc_id) >= 2),
        |seeds AS (SELECT w.doc_id, w.pos FROM w JOIN dup USING (s)),
        |m AS (
        |  SELECT doc_id, pos,
        |    max(pos + 30) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM seeds),
        |g AS (
        |  SELECT doc_id, pos,
        |    sum(CASE WHEN prev_end IS NULL OR pos > prev_end
        |      THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id ORDER BY pos
        |        ROWS UNBOUNDED PRECEDING) AS span_id
        |  FROM m),
        |sp AS (
        |  SELECT doc_id, span_id, min(pos) AS st, max(pos + 30) AS en
        |  FROM g GROUP BY doc_id, span_id),
        |per AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
        |    CAST(sum(en - st) AS BIGINT) AS dup_chars
        |  FROM sp GROUP BY doc_id)
        |SELECT d.doc_id, d.doc_len,
        |  CAST(coalesce(per.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
        |  CAST(coalesce(per.dup_chars, 0) AS BIGINT) AS dup_chars
        |FROM d LEFT JOIN per USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    "d4_ngram_jaccard" ->
      """WITH g AS (
        |  SELECT doc_id AS id,
        |    list_distinct([substr(text, i, 4)
        |      for i in range(1, greatest(length(text), 4) - 2)]) AS grams
        |  FROM documents)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard
        |FROM g a JOIN g b ON a.id < b.id
        |WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    "d11_containment" ->
      """WITH g AS (
        |  SELECT doc_id AS id,
        |    list_distinct([substr(text, i, 4)
        |      for i in range(1, greatest(length(text), 4) - 2)]) AS grams
        |  FROM documents)
        |SELECT a.id AS contained_id, b.id AS container_id,
        |  round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |    / len(a.grams), 6) AS containment
        |FROM g a JOIN g b ON a.id <> b.id
        |WHERE a.id < 250
        |  AND CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |    / len(a.grams) >= 0.9
        |ORDER BY contained_id, container_id""".stripMargin,
    "t6_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |b AS (
        |  SELECT doc_id,
        |    list_transform(range(1, greatest(len(toks), 2)),
        |      i -> CASE WHEN i + 1 <= len(toks)
        |                THEN toks[i] || ' ' || toks[i + 1]
        |                ELSE toks[i] END) AS bigrams
        |  FROM t)
        |SELECT doc_id,
        |  CAST(len(bigrams) AS BIGINT) AS n_bigrams,
        |  CAST(len(list_distinct(bigrams)) AS BIGINT) AS n_distinct_bigrams,
        |  round(1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE)
        |    / len(bigrams), 6) AS dup_frac
        |FROM b ORDER BY doc_id""".stripMargin,
    "t5_contamination" ->
      """WITH bg AS (
        |  SELECT DISTINCT unnest(list_distinct([substr(text, i, 8)
        |    for i in range(1, greatest(length(text), 8) - 6)])) AS g
        |  FROM documents WHERE doc_id < 20),
        |cg AS (
        |  SELECT doc_id, unnest(list_distinct([substr(text, i, 8)
        |    for i in range(1, greatest(length(text), 8) - 6)])) AS g
        |  FROM documents WHERE doc_id >= 20)
        |SELECT cg.doc_id, count(*) AS n_shared
        |FROM cg JOIN bg USING (g)
        |GROUP BY cg.doc_id ORDER BY doc_id""".stripMargin,
    "p1_hash_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ((doc_id % 2147483648) * 2654435761) % 4294967296 < 1073741824
        |ORDER BY doc_id""".stripMargin,
    // chain heads in closed form: 50-blocks of consecutive ids
    "d10_chain_clusters" ->
      """SELECT doc_id, (doc_id // 50) * 50 AS cluster
        |FROM documents ORDER BY doc_id""".stripMargin,
    // add-one unigram NLL vs the doc_id<250 reference corpus; per-token
    // terms rounded to 9 places and summed in DECIMAL so the per-doc
    // mean is order-independent on both engines
    "s18_kmeans" -> s18OracleSql,
    "t13_lm_score" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |  FROM documents),
        |ref AS (
        |  SELECT w, count(*) AS c FROM tok WHERE doc_id < 250 GROUP BY w),
        |tot AS (
        |  SELECT CAST(sum(c) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v
        |  FROM ref),
        |terms AS (
        |  SELECT t.doc_id,
        |    round(-ln(CAST(coalesce(r.c, 0) + 1 AS DOUBLE) / (tot.n + tot.v)),
        |      9) AS nll
        |  FROM tok t LEFT JOIN ref r USING (w), tot)
        |SELECT doc_id, count(*) AS n_tok,
        |  round(CAST(sum(CAST(nll AS DECIMAL(27, 9))) AS DOUBLE) / count(*),
        |    4) AS avg_nll
        |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t15_classifier_score" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |  FROM documents),
        |refdf AS (
        |  SELECT w, count(DISTINCT doc_id) AS df FROM tok
        |  WHERE doc_id < 250 GROUP BY w),
        |nref AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n FROM documents
        |  WHERE doc_id < 250),
        |vocab AS (
        |  SELECT w, round(ln(n / df), 6)
        |      * (CASE WHEN w < 'm' THEN 1 ELSE -1 END) AS wt
        |  FROM refdf, nref ORDER BY df DESC, w LIMIT 32),
        |lens AS (SELECT doc_id, count(*) AS len FROM tok GROUP BY doc_id),
        |terms AS (
        |  SELECT t.doc_id,
        |    round(coalesce(v.wt, 0) / lens.len, 9) AS term
        |  FROM tok t LEFT JOIN vocab v USING (w)
        |  JOIN lens USING (doc_id)),
        |raw AS (
        |  SELECT doc_id, count(*) AS n_tok,
        |    CAST(sum(CAST(term AS DECIMAL(27, 9))) AS DOUBLE) AS s
        |  FROM terms GROUP BY doc_id)
        |SELECT doc_id, n_tok,
        |  round(1.0 / (1.0 + exp(-(-0.25 + s))), 4) AS score,
        |  round(1.0 / (1.0 + exp(-(-0.25 + s))), 4) >= 0.5 AS keep
        |FROM raw ORDER BY doc_id""".stripMargin,
    "p10_length_histogram" ->
      """WITH t AS (
        |  SELECT CAST(len(regexp_split_to_array(trim(text), '\s+'))
        |    AS BIGINT) AS n_tok
        |  FROM documents)
        |SELECT CAST(length(bin(n_tok)) - 1 AS BIGINT) AS len_bin,
        |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  min(n_tok) AS min_tok, max(n_tok) AS max_tok
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "t14_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w),
        |lens AS (SELECT doc_id, sum(c) AS len FROM tf GROUP BY doc_id),
        |dfr AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        |terms AS (
        |  SELECT tf.doc_id, lens.len,
        |    round((CAST(tf.c AS DOUBLE) / lens.len) * ln(n.n / dfr.df), 9)
        |      AS s
        |  FROM tf JOIN dfr USING (w) JOIN lens USING (doc_id), n)
        |SELECT doc_id, CAST(min(len) AS BIGINT) AS n_tokens,
        |  CAST(round(sum(CAST(s AS DECIMAL(27, 9))), 6) AS DOUBLE) AS tfidf
        |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t9_vocab_df" ->
      """SELECT token, count(*) AS df FROM (
        |  SELECT doc_id,
        |    unnest(list_distinct(regexp_split_to_array(trim(text), '\s+')))
        |      AS token
        |  FROM documents)
        |GROUP BY token ORDER BY df DESC, token LIMIT 50""".stripMargin,
    "p5_sequence_pack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |      AS n_tokens,
        |    ((doc_id % 2147483648) * 2654435761) % 4294967296 AS pri
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    sum(n_tokens) OVER (ORDER BY pri, doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens AS pre_cum
        |  FROM t)
        |SELECT CAST(pre_cum // 2000 AS BIGINT) AS bin,
        |  count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    // s21: replay each projected coordinate with the same ±1 sign
    // arithmetic, per-term round-9, and exact DECIMAL accumulation
    "s21_random_projection" -> {
      val cols = (0 until 8).map { j =>
        s"""  CAST(round(list_sum(list_transform(range(0, len(v)),
           |    i -> CAST(round(v[i + 1] * ((($j * 31 + i * 17) % 97) % 2
           |      * 2 - 1), 9) AS DECIMAL(27, 9)))), 6) AS DOUBLE) AS p$j"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
         |SELECT vec_id,
         |$cols
         |FROM e ORDER BY vec_id""".stripMargin
    },
    // s29: replay the SRP sign bits with exact DECIMAL(27,9) sums (same
    // discipline as s21 — the engine's integer nano sums and these
    // decimal sums are the same exact numbers, so the > 0 sign test is
    // decision-identical), then brute-force pairs at hamming <= 3
    // (sound vs the banded join: chunk-pigeonhole recall is total)
    "s29_srp_hamming_neardup" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |proj AS (
        |  SELECT e.vec_id, j.v AS j,
        |    list_sum(list_transform(range(0, len(e.v)),
        |      i -> CAST(round(e.v[i + 1]
        |        * ((CAST(j.v AS BIGINT) * 31 + i * 17) % 97 % 2 * 2 - 1), 9)
        |        AS DECIMAL(27, 9)))) AS s
        |  FROM e, LATERAL (SELECT unnest(range(0, 64)) AS v) j),
        |bits AS (
        |  SELECT vec_id,
        |    string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END,
        |      '' ORDER BY j) AS h
        |  FROM proj GROUP BY vec_id)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  CAST(mismatches(a.h, b.h) AS BIGINT) AS hamming
        |FROM bits a JOIN bits b ON a.vec_id < b.vec_id
        |WHERE mismatches(a.h, b.h) <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    // s36: s29 with the density-scaled (width, radius) rule mirrored in
    // SQL — m from count(*) exactly as Dedup.autoSrpParams (4n against
    // per-chunk key spaces 2^16 / 2^18, capped at m=3), width 64m,
    // radius 3m. At the sf0.01 floor m=1, so this degenerates to s29's
    // exact brute force.
    "s36_srp_neardup_auto" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |par AS (
        |  SELECT CASE WHEN 4 * count(*) <= 65536 THEN 1
        |              WHEN 4 * count(*) <= 262144 THEN 2
        |              ELSE 3 END AS m
        |  FROM e),
        |proj AS (
        |  SELECT e.vec_id, j.v AS j,
        |    list_sum(list_transform(range(0, len(e.v)),
        |      i -> CAST(round(e.v[i + 1]
        |        * ((CAST(j.v AS BIGINT) * 31 + i * 17) % 97 % 2 * 2 - 1), 9)
        |        AS DECIMAL(27, 9)))) AS s
        |  FROM e, par,
        |    LATERAL (SELECT unnest(range(0, 64 * par.m)) AS v) j),
        |bits AS (
        |  SELECT vec_id,
        |    string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END,
        |      '' ORDER BY j) AS h
        |  FROM proj GROUP BY vec_id)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  CAST(mismatches(a.h, b.h) AS BIGINT) AS hamming
        |FROM bits a JOIN bits b ON a.vec_id < b.vec_id, par
        |WHERE mismatches(a.h, b.h) <= 3 * par.m
        |ORDER BY id_a, id_b""".stripMargin,
    // s20: the conjunctive query over the materialized index equals the
    // direct corpus predicate — distinct (doc, term) pairs, keep docs
    // carrying both query terms
    "s20_inverted_index" ->
      """WITH t AS (
        |  SELECT DISTINCT doc_id, t.term
        |  FROM documents,
        |    LATERAL (SELECT unnest(regexp_split_to_array(trim(text),
        |      '\s+')) AS term) t)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms
        |FROM t WHERE term IN ('query', 'vector')
        |GROUP BY doc_id HAVING count(*) = 2
        |ORDER BY doc_id""".stripMargin,
    // p13: thresholds replayed with the engine's rank convention
    // floor(q·(N−1))+1 as pure integer ranks (q ∈ {1/4, 1/2, 3/4} are
    // dyadic — float and integer floor agree)
    "p13_curriculum_bins" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents),
        |o AS (
        |  SELECT n_tokens, row_number() OVER (ORDER BY n_tokens) AS rn,
        |    count(*) OVER () AS cnt
        |  FROM t),
        |th AS (
        |  SELECT
        |    max(CASE WHEN rn = (cnt - 1) // 4 + 1 THEN n_tokens END) AS t25,
        |    max(CASE WHEN rn = (cnt - 1) // 2 + 1 THEN n_tokens END) AS t50,
        |    max(CASE WHEN rn = 3 * (cnt - 1) // 4 + 1 THEN n_tokens END) AS t75
        |  FROM o)
        |SELECT t.doc_id, t.n_tokens,
        |  CAST((CASE WHEN t.n_tokens > th.t25 THEN 1 ELSE 0 END)
        |    + (CASE WHEN t.n_tokens > th.t50 THEN 1 ELSE 0 END)
        |    + (CASE WHEN t.n_tokens > th.t75 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS bin
        |FROM t, th ORDER BY t.doc_id""".stripMargin,
    // p11: replay the mix32 permutation, exclusive prefix sum, and the
    // 600-token tick test ((pre mod 600) + w >= 600 ⟺ the row's weight
    // interval contains a multiple of 600)
    "p11_systematic_sample" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |      AS n_tokens,
        |    ((doc_id % 2147483648) * 2654435761) % 4294967296 AS pri
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    coalesce(sum(n_tokens) OVER (ORDER BY pri, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
        |  FROM t)
        |SELECT doc_id, n_tokens FROM c
        |WHERE (pre % 600) + n_tokens >= 600
        |ORDER BY doc_id""".stripMargin,
    // p12: rates replayed with the same float evaluation order
    // floor((min_sqrt / sqrt(n)) * 2^32); sqrt is correctly rounded in
    // IEEE-754, so both engines compute identical cut thresholds
    "p12_temperature_mix" ->
      """WITH n AS (
        |  SELECT lang, CAST(count(*) AS DOUBLE) AS n_s
        |  FROM documents GROUP BY lang),
        |m AS (SELECT min(sqrt(n_s)) AS ms FROM n),
        |r AS (
        |  SELECT n.lang,
        |    CAST(floor(ms / sqrt(n_s) * 4294967296.0) AS BIGINT) AS cut
        |  FROM n, m)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN r USING (lang)
        |WHERE ((d.doc_id % 2147483648) * 2654435761) % 4294967296 < r.cut
        |ORDER BY d.doc_id""".stripMargin,
    "p8_pack_offsets" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |      AS n_tokens,
        |    ((doc_id % 2147483648) * 2654435761) % 4294967296 AS pri
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    sum(n_tokens) OVER (ORDER BY pri, doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens AS pre_cum
        |  FROM t)
        |SELECT doc_id, CAST(pre_cum // 2000 AS BIGINT) AS bin,
        |  CAST(pre_cum % 2000 AS BIGINT) AS tok_offset
        |FROM c ORDER BY doc_id""".stripMargin,
    "p7_upsample" ->
      """WITH w AS (
        |  SELECT source, CAST(wd AS DOUBLE) AS w FROM (
        |    VALUES ('src0', 0.5), ('src1', 0.25),
        |           ('src2', 0.125), ('src3', 0.125)) v(source, wd)),
        |n AS (
        |  SELECT source, CAST(count(*) AS DOUBLE) AS n_s
        |  FROM documents GROUP BY source),
        |j AS (SELECT w.source, w.w, n.n_s FROM w JOIN n USING (source)),
        |t AS (SELECT sum(n_s) AS tot FROM j),
        |r AS (
        |  SELECT j.source,
        |    floor(j.w / 1.0 * t.tot / j.n_s) AS base,
        |    CAST(floor((j.w / 1.0 * t.tot / j.n_s
        |      - floor(j.w / 1.0 * t.tot / j.n_s)) * 4294967296.0)
        |      AS BIGINT) AS fcut
        |  FROM j, t)
        |SELECT d.doc_id, CAST(u.cp AS BIGINT) AS copy
        |FROM documents d
        |JOIN r ON d.source = r.source,
        |unnest(range(1, CAST(r.base AS BIGINT)
        |  + (CASE WHEN ((d.doc_id % 2147483648) * 2654435761) % 4294967296
        |          < r.fcut THEN 1 ELSE 0 END) + 1)) AS u(cp)
        |ORDER BY doc_id, copy""".stripMargin,
    "p6_global_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    ((doc_id % 2147483648) * 2654435761) % 4294967296 AS hh
        |  FROM documents)
        |SELECT doc_id, hh % 8 AS shard,
        |  CAST(row_number() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id)
        |    - 1 AS BIGINT) AS pos
        |FROM h ORDER BY doc_id""".stripMargin,
    "p9_sharded_export" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    ((doc_id % 2147483648) * 2654435761) % 4294967296 AS hh
        |  FROM documents)
        |SELECT doc_id, hh % 8 AS shard,
        |  CAST(row_number() OVER (PARTITION BY hh % 8 ORDER BY hh, doc_id)
        |    - 1 AS BIGINT) AS pos
        |FROM h ORDER BY doc_id""".stripMargin,
    "t8_chunking" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents WHERE doc_id < 50),
        |s AS (
        |  SELECT doc_id, toks,
        |    unnest(range(0, len(toks), 24)) AS strt
        |  FROM t)
        |SELECT doc_id,
        |  CAST(strt // 24 AS BIGINT) AS chunk_idx,
        |  array_to_string(toks[strt + 1 : strt + 32], ' ') AS chunk_text,
        |  CAST(least(len(toks) - strt, 32) AS BIGINT) AS n_tokens
        |FROM s
        |WHERE strt = 0 OR strt < len(toks) - 8
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "p4_source_mix" ->
      """WITH w AS (
        |  SELECT source, CAST(wd AS DOUBLE) AS w FROM (
        |    VALUES ('src0', 0.4), ('src1', 0.3), ('src2', 0.2), ('src3', 0.1)
        |  ) v(source, wd)),
        |n AS (
        |  SELECT source, CAST(count(*) AS DOUBLE) AS n_s
        |  FROM documents GROUP BY source),
        |j AS (SELECT n.source, n.n_s, w.w FROM n JOIN w USING (source)),
        |t AS (SELECT min(n_s / w) AS t FROM j),
        |r AS (
        |  SELECT j.source,
        |    CAST(floor(LEAST(1.0, j.w * t.t / j.n_s) * 4294967296.0)
        |      AS BIGINT) AS cut
        |  FROM j, t)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN r ON d.source = r.source
        |WHERE ((d.doc_id % 2147483648) * 2654435761) % 4294967296 < r.cut
        |ORDER BY d.doc_id""".stripMargin,
    "p2_stratified_sample" ->
      """SELECT source, doc_id FROM (
        |  SELECT source, doc_id, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY ((doc_id % 2147483648) * 2654435761) % 4294967296, doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 10 ORDER BY source, doc_id""".stripMargin,
    "p3_token_budget" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |      AS n_tokens,
        |    ((doc_id % 2147483648) * 2654435761) % 4294967296 AS pri
        |  FROM documents)
        |SELECT doc_id, n_tokens FROM (
        |  SELECT doc_id, n_tokens,
        |    sum(n_tokens) OVER (ORDER BY pri, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |WHERE cum <= 20000 ORDER BY doc_id""".stripMargin,
    "d6_dup_clusters" ->
      """WITH RECURSIVE g AS (
        |  SELECT doc_id AS id,
        |    list_distinct([substr(text, i, 4)
        |      for i in range(1, greatest(length(text), 4) - 2)]) AS grams
        |  FROM documents),
        |p AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM g a JOIN g b ON a.id < b.id
        |  WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8),
        |edges AS (
        |  SELECT id_a AS u, id_b AS v FROM p
        |  UNION SELECT id_b, id_a FROM p),
        |walk(u, v) AS (
        |  SELECT u, v FROM edges
        |  UNION
        |  SELECT w.u, e.v FROM walk w JOIN edges e ON w.v = e.u),
        |m AS (SELECT u, min(v) AS minv FROM walk GROUP BY u)
        |SELECT d.doc_id,
        |  COALESCE(least(d.doc_id, m.minv), d.doc_id) AS cluster
        |FROM (SELECT doc_id FROM documents) d
        |LEFT JOIN m ON d.doc_id = m.u
        |ORDER BY doc_id""".stripMargin,
    "s9_sql_cosine" ->
      """SELECT a.vec_id,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], q.e), 6) AS cos0
        |FROM embeddings a,
        |  (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 0) q
        |ORDER BY a.vec_id""".stripMargin,
    "s8_knn_graph" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_cosine_similarity(a.e, b.e) AS score
        |  FROM v a JOIN v b ON a.vec_id != b.vec_id),
        |r AS (
        |  SELECT id_a, id_b, score, row_number() OVER (
        |    PARTITION BY id_a ORDER BY score DESC, id_b) AS rank
        |  FROM p)
        |SELECT id_a, id_b, round(score, 6) AS score, rank
        |FROM r WHERE rank <= 5 ORDER BY id_a, rank""".stripMargin,
    // brute-force replay of the mined negatives with the same
    // (self, successor) positive exclusion
    "s32_hard_negatives" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id < 20),
        |s AS (
        |  SELECT q.qid, v.vec_id AS id,
        |    list_cosine_similarity(v.e, q.qe) AS score
        |  FROM q JOIN v ON v.vec_id != q.qid AND v.vec_id != q.qid + 1),
        |r AS (
        |  SELECT qid, id, score, row_number() OVER (
        |    PARTITION BY qid ORDER BY score DESC, id) AS rank
        |  FROM s)
        |SELECT qid, id, round(score, 6) AS score, CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 3 ORDER BY qid, rank""".stripMargin,
    // every gated node's rank-1 neighbor is its planted twin at a
    // cosine the oracle replays from the perturbation arithmetic
    "s16_knn_graph_lsh" ->
      """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |planted AS (
        |  SELECT vec_id, vec_id + 100000 AS pid, e,
        |    list_transform(range(1, len(e) + 1),
        |      j -> e[j] + 0.005 * ((vec_id * 31 + j) % 7 - 3)) AS pe
        |  FROM base WHERE vec_id < 25),
        |twin_edges AS (
        |  SELECT vec_id AS id_a, pid AS id_b,
        |    round(list_cosine_similarity(e, pe), 6) AS score FROM planted
        |  UNION ALL
        |  SELECT pid AS id_a, vec_id AS id_b,
        |    round(list_cosine_similarity(e, pe), 6) AS score FROM planted)
        |SELECT id_a, id_b, score FROM twin_edges ORDER BY id_a""".stripMargin,
    // s33: s16's known answer at the collision-free 1e7 offset — at
    // sf0.01 autoBits lands on the same 8-bit floor, so the auto twin
    // must recover the identical 50 twin edges
    "s33_knn_graph_auto" ->
      """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |planted AS (
        |  SELECT vec_id, vec_id + 10000000 AS pid, e,
        |    list_transform(range(1, len(e) + 1),
        |      j -> e[j] + 0.005 * ((vec_id * 31 + j) % 7 - 3)) AS pe
        |  FROM base WHERE vec_id < 25),
        |twin_edges AS (
        |  SELECT vec_id AS id_a, pid AS id_b,
        |    round(list_cosine_similarity(e, pe), 6) AS score FROM planted
        |  UNION ALL
        |  SELECT pid AS id_a, vec_id AS id_b,
        |    round(list_cosine_similarity(e, pe), 6) AS score FROM planted)
        |SELECT id_a, id_b, score FROM twin_edges ORDER BY id_a""".stripMargin,
    // s35: each planted twin's top-1 non-positive neighbor is its source
    // (cosine ~0.997 vs organic <=0.52) — exact closed form
    "s35_hard_negatives_blocked" ->
      """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |planted AS (
        |  SELECT vec_id, vec_id + 10000000 AS pid, e,
        |    list_transform(range(1, len(e) + 1),
        |      j -> e[j] + 0.005 * ((vec_id * 31 + j) % 7 - 3)) AS pe
        |  FROM base WHERE vec_id < 25)
        |SELECT pid AS qid, vec_id AS id,
        |  round(list_cosine_similarity(pe, e), 6) AS score,
        |  CAST(1 AS BIGINT) AS rank
        |FROM planted ORDER BY qid""".stripMargin,
    // d19: d5_embedding_lsh's pair set at the 1e7 offset (organic pairs
    // never reach 0.9, so the >=0.9 pair list is exactly the 25 twins)
    "d19_embedding_neardup_auto" ->
      """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |planted AS (
        |  SELECT vec_id + 10000000 AS pid,
        |    list_transform(range(1, len(e) + 1),
        |      j -> e[j] + 0.005 * ((vec_id * 31 + j) % 7 - 3)) AS pe
        |  FROM base WHERE vec_id < 25),
        |v AS (SELECT vec_id, e FROM base
        |      UNION ALL SELECT pid AS vec_id, pe AS e FROM planted)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.e, b.e), 6) AS cosine
        |FROM v a JOIN v b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.e, b.e) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,
    // s34: at threshold 0.9 the exact survivor set is closed-form — the
    // organic corpus (every planted copy has its lower-id twin at
    // cosine ~0.997; no organic pair reaches 0.9). A recall miss adds a
    // >=1e7 row; a precision bug removes an organic one.
    "s34_semantic_dedup_auto" ->
      "SELECT vec_id FROM embeddings ORDER BY vec_id",
    // s37: same closed form — hierarchical training changes the
    // codebook, not the survivor set (only planted twins reach 0.9)
    "s37_semantic_dedup_hier" ->
      "SELECT vec_id FROM embeddings ORDER BY vec_id",
    "d5_embedding_neardup" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.e, b.e), 6) AS cosine
        |FROM v a JOIN v b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.e, b.e) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,
    "s1_ann_bruteforce" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
        |scored AS (
        |  SELECT vec_id AS id,
        |    list_cosine_similarity(embedding::DOUBLE[], qe) AS raw
        |  FROM embeddings, q)
        |SELECT id, round(raw, 6) AS score FROM scored
        |ORDER BY raw DESC, id LIMIT 20""".stripMargin,
    "s19_mips" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
        |m AS (
        |  SELECT sqrt(max(list_dot_product(embedding::DOUBLE[],
        |    embedding::DOUBLE[]))) AS mx
        |  FROM embeddings),
        |qn AS (SELECT sqrt(list_dot_product(qe, qe)) AS qnorm FROM q),
        |scored AS (
        |  SELECT vec_id AS id,
        |    list_dot_product(embedding::DOUBLE[], qe) AS raw
        |  FROM embeddings, q)
        |SELECT id, round(raw, 6) AS score,
        |  round(raw / (m.mx * qn.qnorm), 6) AS aug_cos
        |FROM scored, m, qn
        |ORDER BY raw DESC, id LIMIT 20""".stripMargin,
    "s11_quantized_ann" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
        |scored AS (
        |  SELECT vec_id AS id,
        |    list_cosine_similarity(embedding::DOUBLE[], qe) AS raw
        |  FROM embeddings, q)
        |SELECT id, round(raw, 6) AS score FROM scored
        |ORDER BY raw DESC, id LIMIT 20""".stripMargin,
    // s23: the planted known answer (s2/s5's oracle) — the PQ path must
    // fully recover the 26 planted-near-copy exact winners
    "s23_pq_ann" -> plantedAnnOracle,
    // s2/s5: exact top-26 over the corpus ∪ 25 planted near-copies of
    // the query — the known answer the LSH / IVF paths must fully recover
    "s2_ann_lsh" -> plantedAnnOracle,
    "s5_ann_ivf" -> plantedAnnOracle,
    "d5_embedding_lsh" ->
      """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |planted AS (
        |  SELECT vec_id + 100000 AS pid,
        |    list_transform(range(1, len(e) + 1),
        |      j -> e[j] + 0.005 * ((vec_id * 31 + j) % 7 - 3)) AS pe
        |  FROM base WHERE vec_id < 25),
        |v AS (SELECT vec_id, e FROM base
        |      UNION ALL SELECT pid AS vec_id, pe AS e FROM planted)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.e, b.e), 6) AS cosine
        |FROM v a JOIN v b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.e, b.e) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,
    "s14_group_centroids" ->
      """WITH x AS (
        |  SELECT d.source, CAST(u.i - 1 AS BIGINT) AS dim,
        |    CAST(e.embedding[u.i] AS DOUBLE) AS x
        |  FROM embeddings e
        |  JOIN documents d ON e.vec_id = d.doc_id,
        |    unnest(range(1, len(e.embedding) + 1)) AS u(i))
        |SELECT source, dim, count(*) AS n,
        |  round(CAST(sum(CAST(x AS DECIMAL(27, 9))) AS DOUBLE) / count(*), 6)
        |    AS mean
        |FROM x GROUP BY source, dim ORDER BY source, dim""".stripMargin,
    "t11_bpe_roundtrip" ->
      """SELECT doc_id,
        |  regexp_replace(trim(text), '\s+', ' ', 'g') AS decoded
        |FROM documents ORDER BY doc_id""".stripMargin,
    "s13_dim_stats" ->
      """WITH x AS (
        |  SELECT CAST(u.i - 1 AS BIGINT) AS dim,
        |    CAST(embedding[u.i] AS DOUBLE) AS x
        |  FROM embeddings,
        |    unnest(range(1, len(embedding) + 1)) AS u(i))
        |SELECT dim, count(*) AS n,
        |  round(min(x), 6) AS mn, round(max(x), 6) AS mx,
        |  round(CAST(sum(CAST(x AS DECIMAL(27, 9))) AS DOUBLE) / count(*), 6)
        |    AS mean
        |FROM x GROUP BY dim ORDER BY dim""".stripMargin,
    "s12_semantic_dedup" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |drops AS (
        |  SELECT DISTINCT b.vec_id FROM v a JOIN v b ON a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.e, b.e) >= 0.4)
        |SELECT vec_id FROM v
        |WHERE vec_id NOT IN (SELECT vec_id FROM drops)
        |ORDER BY vec_id""".stripMargin,
    "t1_token_count" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tokens,
        |  length(text) AS n_chars_actual
        |FROM documents ORDER BY doc_id""".stripMargin,
    // closed-form subword counts: the fixed merge pairs are symbol-
    // disjoint, so greedy BPE application = chars+1 − Σ left-to-right
    // non-overlapping occurrences, countable with replace()
    "t12_bpe_stats" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |  FROM documents),
        |sub AS (
        |  SELECT doc_id,
        |    CASE WHEN w = '' THEN 0 ELSE
        |      len(w) + 1
        |      - (len(w) - len(replace(w, 'th', ''))) // 2
        |      - (len(w) - len(replace(w, 'er', ''))) // 2
        |      - (len(w) - len(replace(w, 'in', ''))) // 2
        |      - (len(w) - len(replace(w, 'ou', ''))) // 2
        |    END AS n_sub
        |  FROM w),
        |per AS (
        |  SELECT doc_id, sum(n_sub) AS n_sub, count(*) AS n_tok
        |  FROM sub GROUP BY doc_id)
        |SELECT d.source, count(*) AS n_docs,
        |  CAST(sum(p.n_sub) AS BIGINT) AS n_subwords,
        |  CAST(sum(p.n_tok) AS BIGINT) AS n_tokens
        |FROM documents d JOIN per p USING (doc_id)
        |GROUP BY d.source ORDER BY d.source""".stripMargin,
    // analytic replay of the BMP fixture: pixel function, dimensions,
    // and container size (54-byte headers + 4-byte-padded BGR rows)
    "m1_multimodal_features" ->
      """WITH g AS (SELECT unnest(range(0, 32)) AS v),
        |dims AS (
        |  SELECT doc_id AS id, CAST(16 + doc_id % 17 AS INT) AS w,
        |    CAST(16 + (doc_id * 7) % 13 AS INT) AS h
        |  FROM documents WHERE doc_id < 200),
        |px AS (
        |  SELECT d.id, d.w, d.h,
        |    sum((d.id * 31 + gx.v * 7 + gy.v * 13) % 256) AS s
        |  FROM dims d
        |  JOIN g gx ON gx.v < d.w
        |  JOIN g gy ON gy.v < d.h
        |  GROUP BY d.id, d.w, d.h)
        |SELECT id AS media_id, CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height,
        |  round(CAST(s AS DOUBLE) / (w * h), 4) AS mean_lum,
        |  CAST(54 + (3 * w + (4 - (3 * w) % 4) % 4) * h AS BIGINT) AS n_bytes
        |FROM px ORDER BY media_id""".stripMargin,
    // m7: replay the 32×32 near-dup fixture (group g = id//3, block b
    // high iff bit (b%6) of g+1 is set, noise (id·31+x·7+y·13)%3), the
    // 8×8 block sums, the integer bit test (cell_sum·1024 > total·16 ⟺
    // cell_sum·64 > total for uniform 4×4 cells), and the hash grouping
    "m7_image_phash_dedup" ->
      """WITH g AS (SELECT unnest(range(0, 32)) AS v),
        |ids AS (
        |  SELECT doc_id AS id, doc_id // 3 AS grp
        |  FROM documents WHERE doc_id < 150),
        |px AS (
        |  SELECT i.id,
        |    (gy.v // 4) * 8 + (gx.v // 4) AS b,
        |    (CASE WHEN ((i.grp + 1) >>
        |        (((gy.v // 4) * 8 + (gx.v // 4)) % 6)) & 1 = 1
        |      THEN 220 ELSE 30 END)
        |      + (i.id * 31 + gx.v * 7 + gy.v * 13) % 3 AS p
        |  FROM ids i, g gx, g gy),
        |bs AS (SELECT id, b, sum(p) AS s FROM px GROUP BY id, b),
        |ts AS (SELECT id, sum(s) AS t FROM bs GROUP BY id),
        |bits AS (
        |  SELECT bs.id,
        |    string_agg(CASE WHEN bs.s * 64 > ts.t THEN '1' ELSE '0' END,
        |      '' ORDER BY bs.b) AS h
        |  FROM bs JOIN ts USING (id) GROUP BY bs.id)
        |SELECT id AS media_id,
        |  min(id) OVER (PARTITION BY h) AS dup_group,
        |  count(*) OVER (PARTITION BY h) AS group_size
        |FROM bits ORDER BY media_id""".stripMargin,
    // m12: replay the damaged-image fixture (pattern bit XOR the planted
    // per-variant block inversion), the block/global mean bits, then
    // brute-force all pairs at hamming <= 2 — decision-equal to the
    // banded join because chunk-pigeonhole recall is total at the radius
    // m13: replays the planted clip pixels (trim and block-edit
    // variants), the per-frame 8x8 cell bits (integer cross-multiply),
    // brute-force frame pairs at hamming <= 6 (decision-equal to the
    // banded join: chunk-pigeonhole recall is total at the radius), and
    // the >= 2-frame vote
    // the width ladder mirrored in SQL (the s36 CASE-over-count
    // precedent): the small rung needs 512 >= 4 * frames (frames
    // bounded by 4 * videos); past it the 16-block hash applies. The
    // fixture's pixels are constant within 4x4 blocks, so the 256-bit
    // hash duplicates each 64-bit hash bit 4x and ham256 = 4 * ham64
    // exactly - the wide predicate is ham64 * mult <= 6 with mult = 4.
    "m13_video_neardup" ->
      """WITH g AS (SELECT unnest(range(0, 32)) AS v),
        |vids AS (
        |  SELECT doc_id AS id, doc_id // 3 AS grp, doc_id % 3 AS k,
        |    CASE WHEN doc_id % 3 = 1 THEN 3 ELSE 4 END AS n
        |  FROM documents WHERE doc_id < 120),
        |par AS (
        |  SELECT CASE WHEN 4 * (4 * count(*)) <= 512 THEN 1 ELSE 4 END
        |    AS mult
        |  FROM vids),
        |pc AS (
        |  SELECT v.id, v.k, v.grp, f.v AS f,
        |    (gy.v // 4) * 8 + (gx.v // 4) AS cell,
        |    CASE WHEN ((s.s * s.s * s.s + 7 * s.s) % 1021) & 1 = 1
        |      THEN 180 ELSE 20 END AS base
        |  FROM vids v JOIN g f ON f.v < v.n
        |  CROSS JOIN g gx CROSS JOIN g gy,
        |  LATERAL (SELECT (v.grp * 4 + f.v) * 64
        |    + (gy.v // 4) * 8 + (gx.v // 4) AS s) s),
        |px AS (
        |  SELECT id, f, cell,
        |    CASE WHEN k = 2 AND cell = (grp + f) % 64
        |      THEN 200 - base ELSE base END AS p
        |  FROM pc),
        |cells AS (
        |  SELECT id, f, cell, sum(p) AS cs, count(*) AS cn
        |  FROM px GROUP BY id, f, cell),
        |tot AS (
        |  SELECT id, f, sum(cs) AS ts, sum(cn) AS tn
        |  FROM cells GROUP BY id, f),
        |bits AS (
        |  SELECT c.id, c.f, c.cell,
        |    CASE WHEN c.cs * t.tn > t.ts * c.cn THEN 1 ELSE 0 END AS b
        |  FROM cells c JOIN tot t ON c.id = t.id AND c.f = t.f),
        |fp AS (
        |  SELECT a.id AS ia, a.f AS fa, b.id AS ib, b.f AS fb,
        |    sum(CASE WHEN a.b <> b.b THEN 1 ELSE 0 END) AS ham
        |  FROM bits a JOIN bits b ON a.cell = b.cell AND a.id < b.id
        |  GROUP BY a.id, a.f, b.id, b.f)
        |SELECT ia AS id_a, ib AS id_b, CAST(count(*) AS BIGINT) AS n_matches
        |FROM fp, par WHERE ham * par.mult <= 6
        |GROUP BY ia, ib HAVING count(*) >= 2
        |ORDER BY id_a, id_b""".stripMargin,
    "m12_image_hamming_neardup" ->
      """WITH g AS (SELECT unnest(range(0, 32)) AS v),
        |ids AS (
        |  SELECT doc_id AS id, doc_id // 3 AS grp, doc_id % 3 AS k
        |  FROM documents WHERE doc_id < 150),
        |px AS (
        |  SELECT i.id,
        |    (gy.v // 4) * 8 + (gx.v // 4) AS b,
        |    (CASE WHEN
        |        ((((i.grp + 1) >> (((gy.v // 4) * 8 + (gx.v // 4)) % 6))
        |           & 1) = 1)
        |        <> (i.k <> 0 AND ((gy.v // 4) * 8 + (gx.v // 4))
        |              = (i.grp * 5 + i.k * 11) % 64)
        |      THEN 220 ELSE 30 END)
        |      + (i.id * 31 + gx.v * 7 + gy.v * 13) % 3 AS p
        |  FROM ids i, g gx, g gy),
        |bs AS (SELECT id, b, sum(p) AS s FROM px GROUP BY id, b),
        |ts AS (SELECT id, sum(s) AS t FROM bs GROUP BY id),
        |bits AS (
        |  SELECT bs.id,
        |    string_agg(CASE WHEN bs.s * 64 > ts.t THEN '1' ELSE '0' END,
        |      '' ORDER BY bs.b) AS h
        |  FROM bs JOIN ts USING (id) GROUP BY bs.id)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(mismatches(a.h, b.h) AS BIGINT) AS hamming
        |FROM bits a JOIN bits b ON a.id < b.id
        |WHERE mismatches(a.h, b.h) <= 2
        |ORDER BY id_a, id_b""".stripMargin,
    // m8: replay the PCM near-dup fixture (group g = id//3, frame f of
    // 256 samples loud iff bit (f%6) of g+1 set, alternating sign,
    // noise (id·31+i·17)%3−1), the frame energies, the integer bit test
    // (e_f·8 > total), and the fingerprint grouping
    "m8_audio_fingerprint" ->
      """WITH ids AS (
        |  SELECT doc_id AS id, doc_id // 3 AS grp
        |  FROM documents WHERE doc_id < 120),
        |s AS (
        |  SELECT i.id, CAST(p.v // 256 AS INT) AS f,
        |    (CASE WHEN ((i.grp + 1) >> (CAST(p.v // 256 AS INT) % 6)) & 1 = 1
        |       THEN 1000 ELSE 200 END) * (1 - 2 * (p.v % 2))
        |      + (i.id * 31 + p.v * 17) % 3 - 1 AS v
        |  FROM ids i, LATERAL (SELECT unnest(range(0, 2048)) AS v) p),
        |e AS (SELECT id, f, sum(v * v) AS ef FROM s GROUP BY id, f),
        |t AS (SELECT id, sum(ef) AS tot FROM e GROUP BY id),
        |bits AS (
        |  SELECT e.id,
        |    string_agg(CASE WHEN e.ef * 8 > t.tot THEN '1' ELSE '0' END,
        |      '' ORDER BY e.f) AS h
        |  FROM e JOIN t USING (id) GROUP BY e.id)
        |SELECT id AS media_id,
        |  min(id) OVER (PARTITION BY h) AS dup_group,
        |  count(*) OVER (PARTITION BY h) AS group_size
        |FROM bits ORDER BY media_id""".stripMargin,
    "m2_frame_sample" ->
      """WITH g AS (SELECT unnest(range(0, 32)) AS v),
        |dims AS (
        |  SELECT doc_id AS id, CAST(16 + doc_id % 17 AS INT) AS w,
        |    CAST(16 + (doc_id * 7) % 13 AS INT) AS h
        |  FROM documents WHERE doc_id < 100),
        |fr AS (
        |  SELECT d.id, f.v AS frame_idx, f.v * 4 AS row_y, d.w
        |  FROM dims d JOIN g f ON f.v < 8 AND f.v * 4 < d.h),
        |px AS (
        |  SELECT fr.id, fr.frame_idx, fr.row_y, any_value(fr.w) AS w,
        |    sum((fr.id * 31 + gx.v * 7 + fr.row_y * 13) % 256) AS s
        |  FROM fr JOIN g gx ON gx.v < fr.w
        |  GROUP BY fr.id, fr.frame_idx, fr.row_y)
        |SELECT id AS media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(row_y AS BIGINT) AS row_y,
        |  round(CAST(s AS DOUBLE) / w, 4) AS row_mean_lum
        |FROM px ORDER BY media_id, frame_idx""".stripMargin,
    // exact byte multiset of each payload (magic header + ascii text),
    // entropy summed in the same 0..255 byte order as ByteEntropyExpr.
    // ASCII-only assumption made LOUD: the engine histograms the UTF-8
    // bytes of the payload while ord() yields code points, so the two
    // agree only when every character is single-byte — any non-ASCII
    // fixture text raises via error() instead of silently diverging
    // (DuckDB 1.0 has no blob indexing to replay multi-byte exactly).
    "m3_format_detect" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 3 AS INT)
        |      WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'wav' END AS fmt,
        |    CASE CAST(doc_id % 3 AS INT)
        |      WHEN 0 THEN [255, 216, 255]
        |      WHEN 1 THEN [137, 80, 78, 71, 13, 10, 26, 10]
        |      ELSE [82, 73, 70, 70, 0, 0, 0, 0, 87, 65, 86, 69] END
        |      || list_transform(range(1, length(text) + 1),
        |           i -> CASE WHEN octet_length(encode(text)) != length(text)
        |                THEN error('m3 oracle assumes ASCII-only text; '
        |                  || 'doc ' || doc_id || ' is multi-byte')
        |                ELSE ord(substr(text, i, 1)) END) AS bytes
        |  FROM documents WHERE doc_id < 200),
        |b AS (SELECT doc_id, fmt, unnest(bytes) AS byte FROM m),
        |hist AS (
        |  SELECT doc_id, fmt, byte, count(*) AS c FROM b GROUP BY ALL),
        |tot AS (
        |  SELECT doc_id, CAST(sum(c) AS DOUBLE) AS n FROM hist GROUP BY doc_id),
        |ent AS (
        |  SELECT h.doc_id, any_value(h.fmt) AS fmt,
        |    -sum((h.c / t.n) * (ln(h.c / t.n) / ln(2)) ORDER BY h.byte) AS ent
        |  FROM hist h JOIN tot t USING (doc_id) GROUP BY h.doc_id)
        |SELECT fmt AS detected, count(*) AS n,
        |  round(CAST(sum(CAST(ent AS DECIMAL(18, 6))) AS DOUBLE) / count(*), 4)
        |    AS mean_entropy
        |FROM ent GROUP BY fmt ORDER BY detected""".stripMargin,
    // analytic replay of the WAV fixture: sample function, rate/length
    // arithmetic, 44-byte canonical header size; rms replayed with the
    // same IEEE double ops (exact-match safe — see m4_audio_decode)
    "m4_audio_decode" ->
      """WITH clips AS (
        |  SELECT doc_id AS media_id,
        |    CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS sample_rate,
        |    CAST(256 + (doc_id * 7) % 97 AS BIGINT) AS n_samples
        |  FROM documents WHERE doc_id < 200),
        |g AS (SELECT unnest(range(0, 353)) AS v),
        |s AS (
        |  SELECT c.media_id, c.sample_rate, c.n_samples,
        |    sum(((c.media_id * 31 + g.v * 17) % 4096 - 2048)
        |      * ((c.media_id * 31 + g.v * 17) % 4096 - 2048)) AS sum_sq
        |  FROM clips c JOIN g ON g.v < c.n_samples
        |  GROUP BY c.media_id, c.sample_rate, c.n_samples)
        |SELECT media_id, sample_rate, n_samples,
        |  n_samples * 1000 // sample_rate AS duration_ms,
        |  CAST(sum_sq AS BIGINT) AS sum_sq,
        |  sqrt(CAST(sum_sq AS DOUBLE) / n_samples) AS rms,
        |  44 + 2 * n_samples AS n_bytes
        |FROM s ORDER BY media_id""".stripMargin,
    // replay of the AVI-DIB container: per-frame pixel function, closed
    // form header size (224 fixed + per-frame chunk with 4-byte-padded
    // stride), and integer frame timing (uspf = 1000000 // fps)
    "m5_video_decode" ->
      """WITH g AS (SELECT unnest(range(0, 32)) AS v),
        |clips AS (
        |  SELECT doc_id AS id, 8 + doc_id % 13 AS w,
        |    8 + (doc_id * 3) % 11 AS h, 3 + doc_id % 4 AS n,
        |    1000000 // (10 + (doc_id % 3) * 5) AS uspf
        |  FROM documents WHERE doc_id < 200),
        |px AS (
        |  SELECT c.id, c.w, c.h, c.n, c.uspf,
        |    sum((c.id * 31 + gf.v * 41 + gx.v * 7 + gy.v * 13) % 256) AS s
        |  FROM clips c
        |  JOIN g gf ON gf.v < c.n
        |  JOIN g gx ON gx.v < c.w
        |  JOIN g gy ON gy.v < c.h
        |  GROUP BY c.id, c.w, c.h, c.n, c.uspf)
        |SELECT id AS media_id, CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height, CAST(n AS BIGINT) AS n_frames,
        |  n * uspf // 1000 AS duration_ms,
        |  round(CAST(s AS DOUBLE) / (n * w * h), 4) AS mean_lum,
        |  CAST(224 + n * (8 + ((3 * w + 3) // 4) * 4 * h) AS BIGINT)
        |    AS n_bytes
        |FROM px ORDER BY media_id""".stripMargin,
    "m6_video_frames" ->
      """WITH g AS (SELECT unnest(range(0, 32)) AS v),
        |clips AS (
        |  SELECT doc_id AS id, 8 + doc_id % 13 AS w,
        |    8 + (doc_id * 3) % 11 AS h, 3 + doc_id % 4 AS n,
        |    1000000 // (10 + (doc_id % 3) * 5) AS uspf
        |  FROM documents WHERE doc_id < 100),
        |fr AS (
        |  SELECT c.id, f.v AS frame_idx, f.v * 2 AS f, c.w, c.h, c.uspf
        |  FROM clips c JOIN g f ON f.v < 4 AND f.v * 2 < c.n),
        |px AS (
        |  SELECT fr.id, fr.frame_idx, any_value(fr.f) AS f,
        |    any_value(fr.w) AS w, any_value(fr.h) AS h,
        |    any_value(fr.uspf) AS uspf,
        |    sum((fr.id * 31 + fr.f * 41 + gx.v * 7 + gy.v * 13) % 256) AS s
        |  FROM fr JOIN g gx ON gx.v < fr.w JOIN g gy ON gy.v < fr.h
        |  GROUP BY fr.id, fr.frame_idx)
        |SELECT id AS media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  f * uspf // 1000 AS frame_ts_ms,
        |  round(CAST(s AS DOUBLE) / (w * h), 4) AS frame_mean_lum
        |FROM px ORDER BY media_id, frame_idx""".stripMargin,
    // mirrors TextAnalysis.languageId / subwordCountEstimate / qualityScore
    // expression-for-expression so the double arithmetic matches bit-wise
    "t2_profile" ->
      """WITH p AS (
         |  SELECT doc_id, text,
         |    regexp_split_to_array(trim(text), '\s+') AS toks,
         |    list_transform(regexp_split_to_array(trim(text), '\s+'),
         |      t -> lower(t)) AS ltoks,
         |    greatest(length(text), 1) AS glen
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, text, toks, glen,
         |    greatest(len(toks), 1) AS ntok,
         |    length(regexp_replace(text, '[^\x{4E00}-\x{9FFF}]', '', 'g')) AS cjk,
         |    len(list_intersect(ltoks, ['der','die','und','in','den','von','zu','das','mit','sich','des','auf','für','ist','im','dem','nicht','ein'])) AS s_de,
         |    len(list_intersect(ltoks, ['the','of','and','to','in','is','that','it','was','for','on','are','with','as','his','they','at','be','this'])) AS s_en,
         |    len(list_intersect(ltoks, ['de','la','que','el','en','y','los','del','se','las','por','un','para','con','una','su','al','es','lo'])) AS s_es,
         |    len(list_intersect(ltoks, ['de','la','le','et','les','des','en','un','du','une','que','est','pour','qui','dans','par','plus','pas','au'])) AS s_fr,
         |    length(regexp_replace(text, '[^\p{L} ]', '', 'g'))::DOUBLE / glen AS alpha_ratio,
         |    CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE)
         |      / greatest(len(toks), 1) AS mean_wl,
         |    length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS n_punct,
         |    CAST(len(list_distinct(toks)) AS DOUBLE)
         |      / greatest(len(toks), 1) AS distinct_ratio,
         |    len(list_filter(regexp_split_to_array(text, '[^0-9]+'),
         |      s2 -> length(s2) > 0)) AS n_digit_runs,
         |    COALESCE(list_sum(list_transform(toks,
         |      w -> CASE WHEN length(w) > 8
         |                THEN CAST(floor((length(w) - 8) / 4) AS BIGINT)
         |                ELSE CAST(0 AS BIGINT) END)), 0) AS long_extra
         |  FROM p)
         |SELECT doc_id,
         |  CASE WHEN cjk > length(text) * 0.2 THEN 'zh'
         |       WHEN greatest(s_de, s_en, s_es, s_fr) > 0 THEN
         |         CASE WHEN s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
         |              WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
         |              WHEN s_en >= s_de THEN 'en'
         |              ELSE 'de' END
         |       ELSE 'unknown' END AS lang_pred,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(toks) + n_punct + n_digit_runs + long_extra AS BIGINT)
         |    AS n_subwords_est,
         |  round(alpha_ratio * 0.3
         |    + (CASE WHEN mean_wl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2
         |    + (CASE WHEN ntok BETWEEN 10 AND 100000 THEN 1.0
         |            WHEN ntok BETWEEN 3 AND 9 THEN 0.5 ELSE 0.1 END) * 0.2
         |    + (CASE WHEN n_punct::DOUBLE / glen < 0.2 THEN 1.0 ELSE 0.3 END) * 0.15
         |    + (CASE WHEN distinct_ratio > 0.3 THEN 1.0
         |            WHEN distinct_ratio > 0.1 THEN 0.6 ELSE 0.2 END) * 0.15, 6)
         |    AS quality
         |FROM f ORDER BY doc_id""".stripMargin,
    "t3_quality_by_source" ->
      """WITH p AS (
        |  SELECT source, text,
        |    regexp_split_to_array(trim(text), '\s+') AS toks,
        |    greatest(length(text), 1) AS glen
        |  FROM documents),
        |f AS (
        |  SELECT source,
        |    greatest(len(toks), 1) AS ntok,
        |    length(regexp_replace(text, '[^\p{L} ]', '', 'g'))::DOUBLE / glen AS alpha_ratio,
        |    CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE)
        |      / greatest(len(toks), 1) AS mean_wl,
        |    length(regexp_replace(text, '[^[:punct:]]', '', 'g'))::DOUBLE / glen AS punct_ratio,
        |    CAST(len(list_distinct(toks)) AS DOUBLE)
        |      / greatest(len(toks), 1) AS distinct_ratio
        |  FROM p),
        |g AS (
        |  SELECT source,
        |    alpha_ratio * 0.3
        |      + (CASE WHEN mean_wl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.2
        |      + (CASE WHEN ntok BETWEEN 10 AND 100000 THEN 1.0
        |              WHEN ntok BETWEEN 3 AND 9 THEN 0.5 ELSE 0.1 END) * 0.2
        |      + (CASE WHEN punct_ratio < 0.2 THEN 1.0 ELSE 0.3 END) * 0.15
        |      + (CASE WHEN distinct_ratio > 0.3 THEN 1.0
        |              WHEN distinct_ratio > 0.1 THEN 0.6 ELSE 0.2 END) * 0.15 AS q
        |  FROM f)
        |SELECT source, count(*) AS n,
        |  CAST(sum(CASE WHEN q >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
        |FROM g GROUP BY source ORDER BY source""".stripMargin
  )
}
