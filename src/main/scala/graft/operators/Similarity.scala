package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Brute-force cosine top-k is the baseline (a single scan + distributed
  * top-k via TakeOrderedAndProject — no shuffle of the vectors); the
  * random-hyperplane LSH bucketing is the scale path: candidates are
  * restricted to buckets within a small Hamming radius of the query's
  * bucket, so the scan prunes to a fraction of the corpus. Vector math is
  * custom Catalyst expressions (graft.functions.SketchExpressions) — tight
  * per-row loops, no UDF.
  */
object Similarity {

  /** Centroid-bucket-row bound under which the assignment join
    * broadcasts the centroid side (k·tables rows ≈ 67 MB of vector
    * payload at dim 64). Shared by [[ivfAssignTopLsh]]'s route gate and
    * by callers deciding whether a trained codebook is small enough to
    * carry as a driver array / local relation at all (s37's entry-side
    * routing). */
  val MaxBroadcastCentroidRows: Long = 1L << 17

  /** array<float> → array<double> (all arithmetic in double for
    * cross-engine determinism). */
  def toDoubleVec(vecCol: Column): Column =
    transform(vecCol, x => x.cast("double"))

  // Custom Catalyst expressions (tight per-row loops) — value-identical to
  // the aggregate(zip_with(...)) formulation but not interpreter-bound.
  def dot(a: Column, b: Column): Column =
    graft.functions.SketchExpressions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    graft.functions.SketchExpressions.cosineSimilarity(a, b)

  private def litVec(v: Seq[Double]): Column = array(v.map(lit): _*)

  /** Brute-force cosine top-k against a literal query vector.
    * Output: (id, score), score descending. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int): DataFrame =
    df.select(col(idCol).as("id"),
        cosine(col(vecCol), litVec(query)).as("score"))
      .orderBy(desc("score"), col("id"))
      .limit(k)

  /** Max-inner-product top-k (MIPS) via the norm-augmentation reduction
    * (Bachrach et al., 2014, RecSys, "Speeding up the Xbox recommender
    * system…"): append sqrt(M² − ‖x‖²) to each corpus vector (M = the max
    * corpus norm) and 0 to the query — every augmented corpus vector then
    * has norm exactly M, so cosine against the augmented query equals
    * dot(x,q)/(M·‖q‖): a constant positive rescaling of the inner
    * product. Ranking by augmented cosine IS ranking by dot product,
    * which means the entire cosine ANN stack (hyperplane LSH buckets,
    * IVF cells, int8 re-rank) applies unchanged to dot-product retrieval
    * — the objective dual-encoder/recommender models actually ship,
    * where vector norm carries popularity/confidence signal that cosine
    * retrieval would erase.
    *
    * Dataflow at 100 TB: M² is ONE scalar aggregate broadcast back as a
    * 1-row crossJoin (the engine's applyConst shape — no shuffle of the
    * vectors), then a single scan scores and TakeOrderedAndProject
    * returns k rows per partition → k global; the corpus is never
    * shuffled or collected.
    *
    * Output: (id, score=dot, aug_cos), dot descending; `aug_cos` is the
    * augmented-space cosine the ANN stack would index — emitting both
    * makes the rank equivalence externally checkable. */
  def mipsTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int): DataFrame = {
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    require(qNorm > 0, "MIPS query vector must be non-zero")
    val m2 = df.agg(max(dot(col(vecCol), col(vecCol))).as("_m2"))
    df.crossJoin(broadcast(m2))
      .select(col(idCol).as("id"),
        dot(col(vecCol), litVec(query)).as("score"),
        col("_m2"))
      .select(col("id"), col("score"),
        (col("score") / (sqrt(col("_m2")) * lit(qNorm))).as("aug_cos"))
      .orderBy(desc("score"), col("id"))
      .limit(k)
  }

  // ------------------------------------------------------ hyperplane LSH

  /** Deterministic pseudo-random hyperplanes (SplitMix64 → uniform in
    * [-1, 1)); plane j of bank b is global plane index b·bits + j, so
    * bank 0 reproduces the historical planes and banks are mutually
    * independent — the ingredient OR-amplified (multi-table) LSH needs. */
  def hyperplanes(bits: Int, dim: Int, bank: Int = 0): Seq[Seq[Double]] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (0 until bits).map { j =>
      (0 until dim).map { i =>
        mix((bank.toLong * bits + j) * 100003 + i).toDouble /
          Long.MaxValue.toDouble
      }
    }
  }

  /** Sign-bucket of a vector under `bits` random hyperplanes: bit j set
    * iff dot(v, plane_j) > 0. */
  def hyperplaneBucket(vecCol: Column, bits: Int, dim: Int,
      bank: Int = 0): Column =
    hyperplanes(bits, dim, bank).zipWithIndex.map { case (p, j) =>
      when(dot(vecCol, litVec(p)) > 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** Hamming distance between two long bucket codes. */
  private def hammingBits(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** ANN top-k: prune to vectors whose LSH bucket is within
    * `probeRadius` bits of the query's bucket, then exact cosine top-k on
    * the candidates. Recall/coverage is tunable via bits and probeRadius.
    */
  def annTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, bits: Int = 16,
      probeRadius: Int = 2): DataFrame = {
    val dim = query.size
    val queryBucket = {
      // compute the query's bucket driver-side with the same planes
      val planes = hyperplanes(bits, dim)
      planes.zipWithIndex.foldLeft(0L) { case (acc, (p, j)) =>
        val d = p.zip(query).map { case (x, y) => x * y }.sum
        if (d > 0.0) acc | (1L << j) else acc
      }
    }
    val withBucket = df.select(col(idCol).as("id"),
      col(vecCol).as("v"),
      hyperplaneBucket(col(vecCol), bits, dim).as("bucket"))
    withBucket
      .where(hammingBits(col("bucket"), lit(queryBucket)) <= probeRadius)
      .select(col("id"), cosine(col("v"), litVec(query)).as("score"))
      .orderBy(desc("score"), col("id"))
      .limit(k)
  }

  // ------------------------------------------------------------- IVF ANN

  /** Train IVF centroids: deterministic sample to the driver (centroids
    * are query-plan constants, like any learned index), k-means with
    * cosine assignment (spherical k-means), fixed iterations, seeded
    * init. At 100 TB the sample stays bounded (maxSample), the index is a
    * few KB, and assignment is a per-row scan — no shuffle. */
  def ivfCentroids(df: DataFrame, idCol: String, vecCol: String, k: Int,
      maxSample: Int = 0, iters: Int = 5): Array[Array[Double]] = {
    // maxSample = 0 derives the training-sample budget from k:
    // max(2048, 32·k) — the standard ~tens-of-points-per-centroid
    // training floor (FAISS warns below ~39·k). A fixed 2048 is fine
    // for the k≤64 callers (and keeps them byte-identical), but
    // density-scaled k (autoClusters at a 100× corpus → k in the
    // thousands) would train ~1 point per centroid — a degenerate
    // codebook that silently costs SemDeDup recall. The sample stays a
    // driver-side plan constant (32·k × dim doubles ≈ 25 MB at
    // k=1563/dim=64).
    val budget =
      if (maxSample > 0) maxSample
      else math.min(math.max(2048, 32 * k), 1 << 17)
    val n = df.count()
    val rate = math.max(1L, n / budget)
    // hash gate, NOT id arithmetic: strided/block-allocated ids can all
    // satisfy `id % rate == 0` and collect the whole corpus; the hash
    // makes the kept fraction ~1/rate for ANY id distribution, so the
    // driver sample stays O(maxSample) w.h.p.
    // sorted by id — a bare collect returns partition order, which would
    // make the trained centroids depend on the input's layout (see the
    // same fix in pqCodebooks; caught by PqSpec's repartition case)
    val sample = df
      .where(pmod(xxhash64(col(idCol)), lit(rate)) === 0)
      .select(col(idCol), toDoubleVec(col(vecCol)))
      .collect()
      .sortBy(_.get(0).toString)
      .map(_.getSeq[Double](1).toArray)
    require(sample.nonEmpty, "empty training sample")
    lloyd(sample, k, iters, parallel = true)
  }

  private def normalizeVec(v: Array[Double]): Array[Double] = {
    val nrm = math.sqrt(v.map(x => x * x).sum)
    if (nrm == 0) v else v.map(_ / nrm)
  }

  /** Seeded spherical k-means over an in-memory sample (the shared
    * training loop of [[ivfCentroids]] and the per-super-cluster groups
    * of [[ivfCentroidsHierarchical]]). `parallel` toggles the
    * driver-core IntStream over the O(sample·k·dim) assignment — the
    * result is deterministic either way (disjoint writes, same argmax);
    * executor-side callers keep it sequential so one group doesn't
    * oversubscribe its task's core. */
  private[operators] def lloyd(sample: Array[Array[Double]], k: Int,
      iters: Int, parallel: Boolean): Array[Array[Double]] = {
    val pts = sample.map(normalizeVec)
    var cents = Array.tabulate(math.min(k, pts.length))(i =>
      pts((i * 2654435761L % pts.length).toInt.abs).clone())
    for (_ <- 1 to iters) {
      // assignment is the O(sample·k·dim) term — each point's argmax is
      // independent, so it parallelizes with plain disjoint array
      // writes; the centroid update below is O(sample·dim), sequential
      val assign = new Array[Int](pts.length)
      val centsNow = cents
      val body: java.util.function.IntConsumer = { pi =>
        val p = pts(pi)
        var best = 0; var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < centsNow.length) {
          var d = 0.0; var i = 0
          while (i < p.length) { d += p(i) * centsNow(c)(i); i += 1 }
          if (d > bestDot) { bestDot = d; best = c }
          c += 1
        }
        assign(pi) = best
      }
      val range = java.util.stream.IntStream.range(0, pts.length)
      if (parallel) range.parallel().forEach(body) else range.forEach(body)
      val sums = Array.fill(cents.length)(new Array[Double](pts.head.length))
      val counts = new Array[Int](cents.length)
      var pi = 0
      while (pi < pts.length) {
        val p = pts(pi); val best = assign(pi)
        var i = 0
        while (i < p.length) { sums(best)(i) += p(i); i += 1 }
        counts(best) += 1
        pi += 1
      }
      cents = cents.indices.map { c =>
        if (counts(c) == 0) cents(c) else normalizeVec(sums(c))
      }.toArray
    }
    cents
  }

  /** Cluster id of each vector under the trained centroids. Cosine
    * assignment ≙ argmax over centroids of dot(v, c)/‖v‖ — but ‖v‖ is a
    * positive per-row constant, so the argmax is the plain dot argmax:
    * no norm loop per centroid, and a zero vector (norm 0) degrades to
    * all-zero scores instead of NaN. */
  def ivfAssign(vecCol: Column, cents: Array[Array[Double]]): Column = {
    require(cents.nonEmpty, "no centroids")
    // greatest() requires >= 2 args — a single-centroid index trivially
    // assigns cluster 0 instead of failing analysis
    if (cents.length == 1) return lit(0)
    val scored = cents.zipWithIndex.map { case (c, i) =>
      struct(
        dot(vecCol, litVec(c.toIndexedSeq)).as("score"),
        lit(i).as("cluster"))
    }
    greatest(scored.toIndexedSeq: _*).getField("cluster")
  }

  /** The `probes` nearest centroids per vector (descending score) — the
    * index-side multi-probe companion of [[ivfAssign]]: a vector sitting
    * near a cluster boundary lists BOTH clusters, so boundary-straddling
    * near-duplicate pairs still meet in at least one shared cluster
    * (recall buy-back for [[graft.operators.Dedup.semanticDedup]], the
    * same trade [[ivfTopK]]'s nProbe makes query-side). probes=1 ranks
    * identically to [[ivfAssign]] (max by (score, cluster)). */
  def ivfAssignTop(vecCol: Column, cents: Array[Array[Double]],
      probes: Int): Column = {
    require(cents.nonEmpty, "no centroids")
    require(probes >= 1 && probes <= cents.length,
      s"probes $probes out of range [1, ${cents.length}]")
    val scored = array(cents.zipWithIndex.map { case (c, i) =>
      struct(
        dot(vecCol, litVec(c.toIndexedSeq)).as("score"),
        lit(i).as("cluster"))
    }.toIndexedSeq: _*)
    transform(slice(sort_array(scored, asc = false), 1, probes),
      s => s.getField("cluster"))
  }

  /** Approximate nearest-centroid assignment for LARGE centroid counts —
    * the piece that keeps SemDeDup/IVF assignment from going quadratic
    * when k scales with the corpus ([[autoClusters]]): flat [[ivfAssign]]
    * scores every centroid per row (O(n·k·dim) total — with k ∝ n that
    * is O(n²·dim), measured superlinear at the sf10 soak), while here
    * rows and centroids hash into the same hyperplane buckets
    * ([[hyperplaneBucket]], `tables` independent banks) and each row
    * scores ONLY the centroids sharing a bucket — O(n·dim·(tables·bits
    * + candidates)) with candidates ≈ tables·k/2^bits, held constant by
    * choosing bits ≈ log2(k/occupancy).
    *
    * Returns (id, clusters ARRAY<int>) — the row's top `probes`
    * candidate clusters by dot score (nearest first; ties by lower
    * cluster id, matching [[ivfAssignTop]]'s order on the candidates it
    * sees). Rows whose buckets contain no centroid are ABSENT from the
    * output — callers left-join and treat them as unclustered (SemDeDup:
    * never dropped, never drop others). Approximation costs RECALL (a
    * pair assigned to
    * different clusters is not compared); every downstream drop remains
    * exact-cosine-verified.
    *
    * The centroid side is k·tables bucket rows. Up to
    * `maxBroadcastCentroidRows` (default 2^17 ≈ 67 MB of vector payload
    * at dim 64) it is broadcast — one hash build, zero shuffle of the
    * row side's join. Past the bound (autoClusters at 10⁹–10¹⁰
    * embeddings yields k ~ 10⁷–10⁸; broadcasting GBs to every executor
    * is infeasible) the route flips to a SHUFFLED HASH JOIN on (t,
    * block): both sides hash-partition by bucket — the centroid side's
    * shards build per-partition tables, nothing is replicated, and the
    * candidate scoring itself is unchanged. The centroid frame is
    * parallelized off the driver in that regime rather than planned as
    * a single local relation. */
  def ivfAssignTopLsh(df: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]], probes: Int, bits: Int,
      dim: Int = 64, tables: Int = 4,
      maxBroadcastCentroidRows: Long = Similarity.MaxBroadcastCentroidRows)
      : DataFrame = {
    require(cents.nonEmpty, "no centroids")
    val spark = df.sparkSession
    import spark.implicits._
    val small = cents.length.toLong * tables <= maxBroadcastCentroidRows
    val centSeq = cents.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq) }
    val centDf =
      if (small) centSeq.toDF("cluster", "cvec")
      else spark.createDataFrame(
        spark.sparkContext.parallelize(centSeq,
          math.max(1, spark.sparkContext.defaultParallelism))
          .map { case (i, c) => org.apache.spark.sql.Row(i, c) },
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("cluster",
            org.apache.spark.sql.types.IntegerType, nullable = false),
          org.apache.spark.sql.types.StructField("cvec",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType), nullable = false))))
    ivfAssignTopLshFrame(df, idCol, vecCol, centDf, probes, bits, dim,
      tables, broadcastCentroids = small)
  }

  /** [[ivfAssignTopLsh]] over a centroid FRAME (cluster int, cvec
    * array<double>) — the shape [[ivfCentroidsHierarchical]] produces
    * and the only one that exists at k past driver-array scale. */
  def ivfAssignTopLshFrame(df: DataFrame, idCol: String, vecCol: String,
      centDf: DataFrame, probes: Int, bits: Int,
      dim: Int = 64, tables: Int = 4,
      broadcastCentroids: Boolean = true): DataFrame = {
    require(probes >= 1 && bits >= 1 && tables >= 1,
      s"bad params (probes=$probes, bits=$bits, tables=$tables)")
    def explodeBuckets(d: DataFrame, vec: String): DataFrame =
      d.select(col("*"),
        posexplode(array((0 until tables).map(t =>
          hyperplaneBucket(col(vec), bits, dim, t)): _*))
          .as(Seq("t", "block")))
    val cb0 = explodeBuckets(
      centDf.select(col("cluster"), toDoubleVec(col("cvec")).as("cvec")),
      "cvec")
    // shuffle_hash (not sort-merge) on the big-k path: the centroid
    // shards stay hash tables per partition, no sort of the row side
    val cb = if (broadcastCentroids) broadcast(cb0) else cb0.hint("shuffle_hash")
    // spread an under-parallel row-side scan before the tables-way
    // bucket explode + candidate scoring: the per-row work (tables ×
    // bits hyperplane dots + candidate dot products) is the operator's
    // dominant term, and a skewed split serializes it — measured r13 at
    // sf10, one scan task carried 60% of s34's assignment stage (27 s
    // of a 34 s wall). Identity at scale (statsBytes gate in
    // spreadIfUnderParallel).
    val rows = explodeBuckets(
      Dedup.spreadIfUnderParallel(
        df.select(col(idCol).as("id"), toDoubleVec(col(vecCol)).as("v"))),
      "v")
    // dedup multi-table collisions and rank candidates in one pass: the
    // (id, cluster) max-score aggregate and the per-id window share the
    // same hash partitioning on id
    val cand = rows.join(cb, Seq("t", "block"))
      .select(col("id"), col("cluster"), dot(col("v"), col("cvec")).as("s"))
      .groupBy("id", "cluster").agg(max(col("s")).as("s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(desc("s"), col("cluster"))
    cand.withColumn("r", row_number().over(w))
      .where(col("r") <= probes)
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("r"), col("cluster"))))
        .as("rc"))
      .select(col("id"),
        transform(col("rc"), x => x.getField("cluster")).as("clusters"))
    // rows whose buckets matched no centroid are ABSENT — callers
    // left-join and treat them as unclustered
  }

  /** Two-level IVF training for centroid counts past the driver-sample
    * bound: [[ivfCentroids]]' single driver sample caps at 2^17 points,
    * which silently floors training quality at k ≳ 4k (≪ the 32·k
    * budget) — and at autoClusters-at-100TB k the codebook itself
    * outgrows a driver array. Level 1 trains ⌈√k⌉ SUPER-centroids from
    * one driver sample (√k is always driver-sized) and assigns every
    * row its super-cluster as a plan constant ([[ivfAssign]] — √k
    * broadcast scan terms). Level 2 hash-gates a 32·⌈k/√k⌉-expected
    * sample PER super-cluster and trains each group's sub-centroids in
    * its own reducer (sorted by id before seeding, so the codebook is
    * layout-independent like ivfCentroids'). Output: (cluster, cvec)
    * frame with cluster = super·ksub + sub — feed straight to
    * [[ivfAssignTopLshFrame]]; no stage holds more than one group's
    * sample in memory, no driver state beyond the √k supers. */
  def ivfCentroidsHierarchical(df: DataFrame, idCol: String,
      vecCol: String, k: Int, iters: Int = 5): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val ksup = math.ceil(math.sqrt(k.toDouble)).toInt
    val ksub = math.ceil(k.toDouble / ksup).toInt
    val sup = ivfCentroids(df, idCol, vecCol, ksup, iters = iters)
    val n = df.count()
    // expected 32·ksub training points per super-cluster, gated by row
    // hash BEFORE grouping (per-group exact budgets would need a
    // per-group count — an extra shuffle for no training benefit)
    val rate = math.max(1L, n / math.min(n, 32L * k))
    val sampled = df
      .select(col(idCol).as("id"), toDoubleVec(col(vecCol)).as("v"))
      .where(pmod(xxhash64(col("id")), lit(rate)) === 0)
      .withColumn("sup", ivfAssign(col("v"), sup))
    sampled.select(col("id").cast("string").as("id"), col("v"), col("sup"))
      .as[(String, Seq[Double], Int)]
      .groupByKey(_._3)
      .flatMapGroups { (supId: Int, it: Iterator[(String, Seq[Double], Int)]) =>
        // sorted by id string like ivfCentroids' driver sample — the
        // codebook must not depend on shuffle arrival order
        val pts = it.toArray.sortBy(_._1).map(_._2.toArray)
        if (pts.isEmpty) Iterator.empty
        else lloyd(pts, ksub, iters, parallel = false)
          .iterator.zipWithIndex.map { case (c, sub) =>
            (supId * ksub + sub, c.toSeq)
          }
      }
      .toDF("cluster", "cvec")
  }

  /** Density-scaled centroid count for [[ivfCentroids]]/semanticDedup:
    * k = max(floor, ⌈n / targetOccupancy⌉), so expected cluster size —
    * and the per-cluster quadratic pair term — stays ~constant as the
    * corpus grows. The k-means analogue of [[autoBits]]. */
  def autoClusters(df: DataFrame, targetOccupancy: Int = 128,
      floor: Int = 16): Int = {
    require(targetOccupancy >= 1 && floor >= 1,
      s"bad autoClusters params ($targetOccupancy, $floor)")
    val n = df.count()
    math.max(floor, math.ceil(n.toDouble / targetOccupancy).toInt)
  }

  /** IVF ANN top-k: restrict the exact scan to the nProbe clusters whose
    * centroids are nearest the query. Coverage/recall is tunable with
    * (k centroids, nProbe); scan cost drops to ~nProbe/k of the corpus. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, cents: Array[Array[Double]],
      nProbe: Int = 4): DataFrame = {
    val qn = {
      val nrm = math.sqrt(query.map(x => x * x).sum)
      if (nrm == 0) query else query.map(_ / nrm)
    }
    val probes = cents.zipWithIndex
      .map { case (c, i) => (c.zip(qn).map { case (a, b) => a * b }.sum, i) }
      .sortBy(-_._1).take(nProbe).map(_._2).toSeq
    df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .where(ivfAssign(col("v"), cents).isin(probes: _*))
      .select(col("id"), cosine(col("v"), litVec(query)).as("score"))
      .orderBy(desc("score"), col("id"))
      .limit(k)
  }

  /** Per-dimension calibration statistics of an embedding column —
    * (dim, n, mn, mx, sx) with sx the dimension's value sum. This is the
    * table int8 quantization ([[quantizeInt8]] calibration), feature
    * normalization, and drift monitoring read.
    *
    * Scale shape: posexplode emits narrow (dim, value) pairs and partial
    * aggregation collapses them to `dim` rows (= vector width) per
    * mapper BEFORE the shuffle — the exchange carries ~dim × partitions
    * tiny rows regardless of corpus size. The sum accumulates in
    * DECIMAL(27,9) so partition order can never flip a low bit of the
    * result (same posture as the engine's float aggregates). */
  def dimStats(df: DataFrame, vecCol: String, keys: Seq[String] = Nil)
      : DataFrame =
    df.select(keys.map(col) :+
        posexplode(toDoubleVec(col(vecCol))).as(Seq("dim", "x")): _*)
      .groupBy(keys.map(col) :+ col("dim"): _*)
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("mn"),
        max(col("x")).as("mx"),
        sum(col("x").cast(org.apache.spark.sql.types.DecimalType(27, 9)))
          .cast("double").as("sx"))

  /** Exact kNN graph by broadcast nested-loop: the corpus joins against a
    * broadcast copy of itself, so every partition scores its rows against
    * all vectors locally — embarrassingly parallel, no pair shuffle. The
    * per-row top-k compiles to WindowGroupLimit, which caps map-side
    * BEFORE the window shuffle: 25M scored pairs shrink to ≤ k per vector
    * in flight. Exact kNN is inherently quadratic — right while one side
    * fits a broadcast (≲ 1M vectors); beyond that, [[knnGraph]]
    * (LSH-blocked) is the approximate scale path. */
  def knnGraphExact(df: DataFrame, idCol: String, vecCol: String,
      k: Int, maxExactRows: Long = 1000000L): DataFrame = {
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    // LOUD size gate (one tiny count, like RangeJoin's fan-out cap):
    // the exact twin is the oracle for [[knnGraph]] and must not be
    // invocable on a real corpus by accident — O(N²) scoring against a
    // full-corpus broadcast.
    val n = vecs.count()
    require(n <= maxExactRows,
      s"knnGraphExact is O(N²) with a full-corpus broadcast and is " +
        s"capped at $maxExactRows rows; got $n. Use knnGraph (LSH-" +
        "blocked) at scale, or raise maxExactRows deliberately.")
    val right = broadcast(
      vecs.select(col("id").as("id_b"), col("v").as("v_b")))
    // the probe side carries ALL the O(N²) scoring work — spread it
    // across the cluster even when the source is one small file (a
    // single-partition probe side serializes the whole join on one core)
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val scored = vecs.select(col("id").as("id_a"), col("v").as("v_a"))
      .repartition(parts, col("id_a"))
      .join(right, col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("v_a"), col("v_b")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id_a").orderBy(desc("score"), col("id_b"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("id_a", "id_b", "score", "rank")
  }

  /** The per-vector LSH block assignment [[knnGraph]] pairs within —
    * exposed for floor attribution (tools.FloorProfile): this is the
    * LINEAR term of the blocked kNN graph, the wall the pair term is
    * measured against at each scale. */
  private[graft] def knnBlocked(df: DataFrame, idCol: String,
      vecCol: String, bits: Int, dim: Int, tables: Int): DataFrame = {
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    if (tables == 1)
      vecs.select(lit(0).as("t"), col("id"), col("v"),
        hyperplaneBucket(col("v"), bits, dim).as("block"))
    else vecs.select(col("id"), col("v"),
      posexplode(array((0 until tables).map(t =>
        hyperplaneBucket(col("v"), bits, dim, t)): _*))
        .as(Seq("t", "block")))
      .select(col("t"), col("id"), col("v"), col("block"))
  }

  /** All-pairs top-k neighbors per vector within LSH blocks — the batch
    * companion of annTopK for building kNN graphs. Quadratic within a
    * block; block count grows with bits. `dim` is the embedding width the
    * hyperplanes are drawn over. `tables` > 1 OR-amplifies recall with
    * independent hyperplane banks (the standard multi-table trade: t×
    * the block-join shuffle buys 1−(1−p^bits)^t recall per pair); a pair
    * colliding in several tables is deduplicated by the max-score
    * aggregate before ranking, so the graph itself is table-agnostic. */
  def knnGraph(df: DataFrame, idCol: String, vecCol: String, k: Int,
      bits: Int = 12, dim: Int = 64, tables: Int = 1): DataFrame = {
    require(tables >= 1, "tables must be >= 1")
    val blocked = knnBlocked(df, idCol, vecCol, bits, dim, tables)
    val a = blocked.select(col("t"), col("block"),
      col("id").as("id_a"), col("v").as("v_a"))
    val b = blocked.select(col("t"), col("block"),
      col("id").as("id_b"), col("v").as("v_b"))
    val collisions = a.join(b, Seq("t", "block"))
      .where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("v_a"), col("v_b")).as("score"))
    // single-table blocks are disjoint — no cross-table duplicates to
    // collapse, and the ranking window's shuffle doubles as the only one
    val scored =
      if (tables == 1) collisions
      else collisions.groupBy("id_a", "id_b").agg(max(col("score")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id_a").orderBy(desc("score"), col("id_b"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("id_a", "id_b", "score", "rank")
  }

  /** Hard-negative mining for retrieval/embedding training (the DPR /
    * contrastive fine-tuning data step): for every query vector, the
    * top-k most-similar corpus items that are NOT its labeled positives
    * — the near-boundary negatives that actually teach the ranker.
    * `positives` carries (qIdCol, idCol) label pairs; the query itself
    * is excluded implicitly when present among its positives.
    *
    * 100 TB shape: the query set is a training batch (1e3–1e6 rows) —
    * it BROADCASTS, as does the positive-label list; the corpus streams
    * once map-side (broadcast nested-loop score against every query),
    * the labeled pairs drop in the same pass via a broadcast anti-join,
    * and WindowGroupLimit caps candidates to k per query BEFORE the
    * single (qid)-keyed shuffle — in-flight rows ∝ queries·k, never
    * queries·corpus. Output: (qid, id, score, rank). */
  def hardNegatives(queries: DataFrame, qIdCol: String, qVecCol: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      positives: DataFrame, k: Int,
      maxQueryRows: Long = 1000000L): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    // LOUD broadcast-contract gate (the knnGraphExact posture): the
    // exact path is queries × corpus work behind a full-query-set
    // broadcast — the right shape for a training batch, a multi-GB
    // broadcast and an accidental cartesian for a corpus-scale query
    // set. One tiny count; the scale path is [[hardNegativesBlocked]].
    val nq = queries.count()
    require(nq <= maxQueryRows,
      s"hardNegatives broadcasts the query set and scores queries x " +
        s"corpus exactly; capped at $maxQueryRows query rows, got $nq. " +
        "Use hardNegativesBlocked (LSH candidate generation) for " +
        "corpus-scale query sets, or raise maxQueryRows deliberately.")
    val q = broadcast(
      queries.select(col(qIdCol).as("qid"), col(qVecCol).as("qv")))
    val pos = broadcast(
      positives.select(col(qIdCol).as("qid"), col(idCol).as("id")))
    val scored = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(q)
      .join(pos, Seq("qid", "id"), "left_anti")
      .select(col("qid"), col("id"), cosine(col("v"), col("qv")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("score"), col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "id", "score", "rank")
  }

  /** [[hardNegatives]] for corpus-scale query sets: candidate
    * generation through the same OR-amplified hyperplane blocking as
    * [[knnGraph]], so NOTHING broadcasts — queries and corpus hash into
    * the same per-table buckets and candidates are the bucket-join
    * collisions (shuffle ∝ colliding pairs, quadratic only within a
    * block). Each candidate is exact-cosine-scored, labeled positives
    * drop via anti-join, and WindowGroupLimit caps to k per query
    * before the final shuffle — precision is exact; recall is the LSH
    * trade, 1−(1−p^bits)^tables per (query, neighbor) pair, bought
    * back with `tables` (and `bits` from [[autoBits]] at scale). The
    * mining regime is exactly where that trade is strong: hard
    * negatives are by definition the HIGH-similarity corpus items,
    * whose collision probability is the highest. */
  def hardNegativesBlocked(queries: DataFrame, qIdCol: String,
      qVecCol: String, corpus: DataFrame, idCol: String, vecCol: String,
      positives: DataFrame, k: Int, bits: Int = 12, dim: Int = 64,
      tables: Int = 4): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    require(bits >= 1 && tables >= 1, s"bad LSH params ($bits, $tables)")
    def blocked(df: DataFrame, id: String, vec: String,
        idAs: String, vecAs: String): DataFrame =
      df.select(col(id).as(idAs), col(vec).as(vecAs),
          posexplode(array((0 until tables).map(t =>
            hyperplaneBucket(col(vec), bits, dim, t)): _*))
            .as(Seq("t", "block")))
        .select(col("t"), col("block"), col(idAs), col(vecAs))
    val q = blocked(queries, qIdCol, qVecCol, "qid", "qv")
    val c = blocked(corpus, idCol, vecCol, "id", "v")
    // a pair colliding in several tables scores identically each time —
    // the max-aggregate dedups it with the same (qid,id)-keyed shuffle
    // a distinct would need
    val scored = c.join(q, Seq("t", "block"))
      .select(col("qid"), col("id"),
        cosine(col("v"), col("qv")).as("score"))
      .groupBy("qid", "id").agg(max(col("score")).as("score"))
      .join(positives.select(col(qIdCol).as("qid"), col(idCol).as("id")),
        Seq("qid", "id"), "left_anti")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("score"), col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "id", "score", "rank")
  }

  /** Density-scaled hyperplane count for [[knnGraph]]/[[annTopK]]
    * blocking: bits = max(`floor`, ⌈log2(n / targetOccupancy)⌉), so
    * expected block occupancy — and with it the per-block quadratic
    * candidate term — stays ~constant as the corpus grows (the fixed-
    * bits entries pin their planted-recall oracles, so they keep their
    * pinned parameters; a production index derives bits from the
    * corpus count with THIS rule and buys back recall with `tables`,
    * the standard multi-probe trade). One tiny count job. */
  def autoBits(df: DataFrame, targetOccupancy: Int = 64,
      floor: Int = 8): Int = {
    require(targetOccupancy >= 1 && floor >= 1 && floor <= 30,
      s"bad autoBits params ($targetOccupancy, $floor)")
    val n = df.count()
    val needed = math.ceil(
      math.log(math.max(n.toDouble / targetOccupancy, 1.0)) / math.log(2)).toInt
    math.max(floor, needed)
  }

  // -------------------------------------------------- int8 quantization

  /** Quantize an embedding column: struct(q: binary, scale: double) —
    * 1 byte/dim instead of 4, the format a 100 TB ANN index persists. */
  def quantizeInt8(vecCol: Column): Column =
    graft.functions.QuantExpressions.int8Quantize(vecCol)

  /** Cosine over int8-quantized binary vectors (scales cancel). */
  def int8Cosine(a: Column, b: Column): Column =
    graft.functions.QuantExpressions.int8Cosine(a, b)

  /** Driver-side mirror of [[Int8Quantize]] for literal query vectors —
    * identical arithmetic (maxAbs/127 scale, rint, clamp). */
  def quantizeInt8Bytes(v: Seq[Double]): Array[Byte] = {
    val maxAbs = v.foldLeft(0.0)((m, x) => math.max(m, math.abs(x)))
    if (maxAbs == 0.0) Array.fill(v.size)(0: Byte)
    else {
      val scale = maxAbs / 127.0
      v.map { x =>
        val r = math.rint(x / scale)
        (if (r > 127) 127 else if (r < -127) -127 else r.toInt).toByte
      }.toArray
    }
  }

  /** Top-k by quantized-cosine candidate generation + full-precision
    * re-rank. The candidate pass carries ONLY (id, qscore) through the
    * distributed top-k — never a vector — and the re-rank is a separate
    * id-filtered scan (an IN-list of ≤ k·overFetch ids, pushed into the
    * parquet reader's row-group stats). With a PERSISTED code column
    * (`quantizeInt8`'s struct written at ingest) the candidate scan
    * reads 1 byte/dim; here codes are derived in-plan, which reads the
    * float column once but keeps the memory/shuffle shape identical.
    * Recall loss is bounded by the int8 cosine error (≲0.5% absolute at
    * dim 64) against the score gap at the candidate cutoff — size
    * overFetch accordingly. The candidate-id collect is ≤ k·overFetch
    * values of planning metadata (same class as the query vector). */
  def quantizedTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, overFetch: Int = 3): DataFrame = {
    val qq = lit(quantizeInt8Bytes(query))
    val candIds = df
      .select(col(idCol).as("id"),
        int8Cosine(quantizeInt8(col(vecCol)).getField("q"), qq).as("qscore"))
      .orderBy(desc("qscore"), col("id"))
      .limit(k * overFetch)
      .select("id").collect().map(_.get(0)).toSeq
    df.where(col(idCol).isin(candIds: _*))
      .select(col(idCol).as("id"),
        cosine(col(vecCol), litVec(query)).as("score"))
      .orderBy(desc("score"), col("id"))
      .limit(k)
  }

  // ------------------------------------------- product quantization (PQ)

  /** Train PQ codebooks (Jégou et al. 2011): the embedding splits into
    * `subspaces` contiguous subvectors; each subspace gets its own
    * `codebookSize`-centroid L2 k-means codebook, trained driver-side on
    * a hash-gated bounded sample (the [[ivfCentroids]] play, without its
    * cosine normalization — PQ approximates raw L2 geometry). Returns
    * codebooks(s)(c) = centroid vector c of subspace s. Deterministic:
    * seeding by Knuth-multiplicative index, argmin ties to the lower
    * centroid id, fixed iteration count. */
  def pqCodebooks(df: DataFrame, idCol: String, vecCol: String,
      subspaces: Int, codebookSize: Int = 16, maxSample: Int = 2048,
      iters: Int = 5): Array[Array[Array[Double]]] = {
    val n = df.count()
    val rate = math.max(1L, n / maxSample)
    // collect (id, vec) and sort by id: a bare collect returns rows in
    // PARTITION order, which changes under repartitioning and would
    // reseed the k-means — training must be a function of the data set,
    // not of its layout
    val sample = df
      .where(pmod(xxhash64(col(idCol)), lit(rate)) === 0)
      .select(col(idCol), toDoubleVec(col(vecCol)))
      .collect()
      .sortBy(_.get(0).toString)
      .map(_.getSeq[Double](1).toArray)
    require(sample.nonEmpty, "empty PQ training sample")
    val dim = sample.head.length
    require(dim % subspaces == 0,
      s"dim $dim not divisible into $subspaces subspaces")
    val sub = dim / subspaces
    Array.tabulate(subspaces) { s =>
      val pts = sample.map(_.slice(s * sub, (s + 1) * sub))
      var cents = Array.tabulate(math.min(codebookSize, pts.length))(i =>
        pts((i * 2654435761L % pts.length).toInt.abs).clone())
      for (_ <- 1 to iters) {
        val sums = Array.fill(cents.length)(new Array[Double](sub))
        val counts = new Array[Int](cents.length)
        pts.foreach { p =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < cents.length) {
            var d = 0.0; var i = 0
            while (i < sub) {
              val t = p(i) - cents(c)(i); d += t * t; i += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          counts(best) += 1
          var i = 0
          while (i < sub) { sums(best)(i) += p(i); i += 1 }
        }
        cents = Array.tabulate(cents.length)(c =>
          if (counts(c) == 0) cents(c)
          else sums(c).map(_ / counts(c)))
      }
      cents
    }
  }

  /** PQ-encode + asymmetric-distance top-k + exact re-rank. The encode
    * pass is MAP-ONLY: each subspace's code is an in-plan argmin over
    * the (plan-literal) codebook, and the ADC score is a lookup-table
    * sum — the query-to-centroid distance table (subspaces ×
    * codebookSize doubles) is computed driver-side and baked into the
    * plan. The distributed top-k carries (id, adc) pairs only. At 100 TB
    * the codes are what an index PERSISTS — subspaces·log2(codebookSize)
    * bits per vector (4 bytes/vector here vs 256 for the floats, a 64×
    * compression) — and this operator's candidate scan reads only the
    * code column; the float column is touched just for the ≤ k·overFetch
    * re-rank ids. Recall is the PQ trade: size overFetch against the
    * quantization error (the s23 entry self-gates by intersecting with
    * the exact answer). */
  def pqTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, subspaces: Int = 8,
      codebookSize: Int = 16, overFetch: Int = 5,
      codebooksIn: Array[Array[Array[Double]]] = null): DataFrame = {
    val books = if (codebooksIn != null) codebooksIn
      else pqCodebooks(df, idCol, vecCol, subspaces, codebookSize)
    val dim = query.size
    val sub = dim / subspaces
    // driver-side distance table: dt(s)(c) = ||q_s − books(s)(c)||²
    val dt = pqDistanceTable(books, query, subspaces, sub)
    val vec = toDoubleVec(col(vecCol))
    // ONE compiled expression instead of the ~10k-node per-subspace
    // argmin/lookup tree: value-identical by construction (PqSpec pins
    // tree-vs-expression equality on the live corpus), and Catalyst
    // stops paying 1.7 s of analysis/optimization per query
    // construction (StageProfile r14 — the driver gap dwarfed the
    // executor work). The tree spelling stays below as the spec seam.
    val adc = graft.functions.PqAdc(vec, books, dt)
    val candIds = df
      .select(col(idCol).as("id"), adc.as("adc"))
      .orderBy(col("adc"), col("id"))
      .limit(k * overFetch)
      .select("id").collect().map(_.get(0)).toSeq
    df.where(col(idCol).isin(candIds: _*))
      .select(col(idCol).as("id"),
        cosine(col(vecCol), litVec(query)).as("score"))
      .orderBy(desc("score"), col("id"))
      .limit(k)
  }

  private[graft] def pqDistanceTable(books: Array[Array[Array[Double]]],
      query: Seq[Double], subspaces: Int, sub: Int): Array[Array[Double]] =
    Array.tabulate(subspaces) { s =>
      books(s).map { cent =>
        var d = 0.0; var i = 0
        while (i < sub) {
          val t = query(s * sub + i) - cent(i); d += t * t; i += 1
        }
        d
      }
    }

  /** The declarative ADC spelling [[graft.functions.PqAdcExpr]]
    * replaced — per-subspace in-plan argmin (integer micro-unit
    * distances, ties to the lower code — the Clustering determinism
    * discipline) over `element_at` chains, then the dt lookup sum.
    * Kept as the executable SPEC: PqSpec asserts the compiled
    * expression equals this tree value-for-value on the live corpus.
    * Not used on the query path (Catalyst re-analysis of the ~10k-node
    * tree cost 1.7 s of driver time per construction). */
  private[graft] def pqAdcTree(vec: Column,
      books: Array[Array[Array[Double]]], dt: Array[Array[Double]],
      subspaces: Int, sub: Int): Column = {
    def codeCol(s: Int): Column = {
      val dists = books(s).indices.map { c =>
        val d = (0 until sub).map { i =>
          val diff = element_at(vec, s * sub + i + 1) -
            lit(books(s)(c)(i))
          diff * diff
        }.reduce(_ + _)
        struct(floor(d * lit(1e12) + lit(0.5)).cast("long").as("du"),
          lit(c).as("c"))
      }
      array_min(array(dists: _*)).getField("c")
    }
    (0 until subspaces).map { s =>
      element_at(array(dt(s).map(lit).toSeq: _*), codeCol(s) + 1)
    }.reduce(_ + _)
  }
}
