package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SketchExpressions
import graft.operators.Dedup

/** The density-scaled banded-hamming stack: wide SRP signatures
  * (SrpCodeWide), chunk extraction across word boundaries (BitChunks),
  * packed hamming (HammingWords), distinct-free band dedup
  * (FirstAgreeChunk), the autoSrpParams ladder, and the wide self-join
  * operator against brute force at a width the sf0.01 oracle never
  * exercises (the auto rule picks 64 bits at the floor). */
class WideHammingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic float-origin vectors (the embedding shape)
  private def vec(seed: Long, dim: Int = 64): Seq[Double] =
    (0 until dim).map { i =>
      val h = SketchExpressions.mix(seed * 1000003L + i)
      ((h % 2000001L) / 1000000.0).toFloat.toDouble
    }

  private lazy val base = (0L until 30L).map(i => (i, vec(i)))

  test("SrpCodeWide word 0 at width 64 equals SrpCode64 on the same input") {
    val df = base.toDF("id", "v")
      .withColumn("nanos", transform(col("v"),
        x => round(round(x, 9) * lit(1e9), 0).cast("long")))
      .withColumn("w64", SketchExpressions.srpCode64(col("nanos")))
      .withColumn("wideN", SketchExpressions.srpCodeWide(col("nanos"), 64))
      .withColumn("wideD", SketchExpressions.srpCodeWide(col("v"), 64))
    val rows = df.select("w64", "wideN", "wideD").collect()
    rows.foreach { r =>
      assert(r.getAs[scala.collection.Seq[Long]]("wideN") == Seq(r.getLong(0)),
        "nanos-input wide code != SrpCode64")
      assert(r.getAs[scala.collection.Seq[Long]]("wideD") == Seq(r.getLong(0)),
        "double-input wide code != SrpCode64 (nanosOf drift)")
    }
  }

  test("SrpCodeWide at width 128: low word equals the 64-bit code; " +
    "high word matches a per-bit reference") {
    val df = base.toDF("id", "v")
      .withColumn("wide", SketchExpressions.srpCodeWide(col("v"), 128))
    val byId = df.collect().map(r =>
      r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("wide")).toMap
    base.foreach { case (id, v) =>
      val nanos = v.map(x => BigDecimal(x).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).*(BigDecimal(1000000000L)).toLongExact)
      def bit(j: Int): Boolean = {
        val s = nanos.zipWithIndex.map { case (n, i) =>
          n * (((31L * j + 17L * i) % 97 % 2) * 2 - 1)
        }.sum
        s > 0
      }
      val words = byId(id)
      assert(words.length == 2)
      (0 until 128).foreach { j =>
        val got = (words(j / 64) >>> (j % 64) & 1L) == 1L
        assert(got == bit(j), s"id=$id bit $j mismatch")
      }
    }
  }

  test("BitChunks extracts contiguous chunks across word boundaries") {
    // width=128, 7 chunks of 18 bits (last 20): chunks 3 and 4 cross
    // the word boundary at bit 64
    val w0 = 0x123456789abcdef0L
    val w1 = 0x0fedcba987654321L
    val df = Seq(Tuple1(Seq(w0, w1))).toDF("sig")
      .select(SketchExpressions.bitChunks(col("sig"), 128, 7).as("c"))
    val got = df.collect()(0).getAs[scala.collection.Seq[Long]]("c")
    def refBit(g: Int): Long =
      if (g < 64) (w0 >>> g) & 1L else (w1 >>> (g - 64)) & 1L
    val exp = (0 until 7).map { b =>
      val start = b * 18
      val len = if (b == 6) 128 - start else 18
      (0 until len).map(k => refBit(start + k) << k).reduce(_ | _)
    }
    assert(got == exp, s"got $got expected $exp")
  }

  test("HammingWords: packed distance, width-mismatch counts extra bits") {
    val df = Seq(
      (Seq(0L, 0L), Seq(0L, 0L), 0L),
      (Seq(-1L, 0L), Seq(0L, 0L), 64L),
      (Seq(5L, 9L), Seq(6L, 8L), 3L),
      (Seq(7L), Seq(7L, 3L), 2L) // extra word = extra distance
    ).toDF("a", "b", "exp")
      .withColumn("d", SketchExpressions.hammingWords(col("a"), col("b")))
    df.collect().foreach(r =>
      assert(r.getAs[Long]("d") == r.getAs[Long]("exp"), r.toString))
  }

  test("FirstAgreeChunk returns the first bit-agreeing chunk or -1") {
    // width=128, 7 chunks; flip one bit inside chunks 0..2 of b so the
    // first agreement is chunk 3
    val a = Seq(0x5555555555555555L, 0x3333333333333333L)
    def flip(w: Seq[Long], g: Int): Seq[Long] =
      w.updated(g / 64, w(g / 64) ^ (1L << (g % 64)))
    val b = flip(flip(flip(a, 1), 19), 40) // chunks 0,1,2 (18-bit chunks)
    val df = Seq((a, a, 0L), (a, b, 3L),
      (a, a.map(~_), -1L)).toDF("x", "y", "exp")
      .withColumn("f",
        SketchExpressions.firstAgreeChunk(col("x"), col("y"), 128, 7))
    df.collect().foreach(r =>
      assert(r.getAs[Long]("f") == r.getAs[Long]("exp"), r.toString))
  }

  test("autoSrpParams ladder: floor pins s29's (64, 3); width and " +
    "radius scale together; capped at 192") {
    assert(Dedup.autoSrpParams(500) == ((64, 3)))
    assert(Dedup.autoSrpParams(16384) == ((64, 3)))
    assert(Dedup.autoSrpParams(16385) == ((128, 6)))
    assert(Dedup.autoSrpParams(65536) == ((128, 6)))
    assert(Dedup.autoSrpParams(65537) == ((192, 9)))
    assert(Dedup.autoSrpParams(100000000L) == ((192, 9)))
  }

  test("autoFrameHashParams ladder: 4x coverage boundary between the " +
    "64-bit fast lane and the 256-bit scale rung") {
    import graft.operators.Multimodal
    // radius 6 -> 7 chunks of 9 bits on the small rung: 512 >= 4n
    // admits up to 128 frames; frame 129 must jump to 16 blocks
    assert(Multimodal.autoFrameHashParams(0) == ((8, 64)))
    assert(Multimodal.autoFrameHashParams(128) == ((8, 64)))
    assert(Multimodal.autoFrameHashParams(129) == ((16, 256)))
    assert(Multimodal.autoFrameHashParams(500000) == ((16, 256)))
    // the m13 oracle corpus (120 videos, <= 480 frames) sits on the
    // WIDE rung - the CASE in its oracle SQL mirrors exactly this
    assert(Multimodal.autoFrameHashParams(480) == ((16, 256)))
    // a tighter radius widens the small rung's chunks (64/(k+1) bits)
    assert(Multimodal.autoFrameHashParams(100000, maxHamming = 1)
      == ((8, 64)))
    assert(Multimodal.autoFrameHashParams(2000000000L, maxHamming = 1)
      == ((16, 256)))
  }

  test("videoFrameAHashPacked equals the ahash bit-string packed via " +
    "the SQL fold (the spec seam for the in-decode packing)") {
    import graft.operators.Multimodal
    val ids = spark.range(6).toDF("doc_id")
    val media = Multimodal.syntheticNearDupVideoTable(ids, "doc_id")
    for (blocks <- Seq(8, 16)) {
      val words = blocks * blocks / 64
      val viaString = Multimodal.videoFrameAHash(media, blocks = blocks)
        .withColumn("sig", expr(
          s"transform(sequence(0, ${words - 1}), w -> " +
            "aggregate(sequence(0, 63), 0L, (acc, i) -> " +
            "acc | IF(substring(ahash, w*64 + i + 1, 1) = '1', " +
            "shiftleft(1L, i), 0L)))"))
        .select("media_id", "frame_idx", "sig")
        .as[(Long, Int, Seq[Long])].collect().sortBy(r => (r._1, r._2))
      val packed = Multimodal.videoFrameAHashPacked(media, blocks)
        .as[(Long, Int, Seq[Long])].collect().sortBy(r => (r._1, r._2))
      assert(packed.toSeq == viaString.toSeq, s"blocks=$blocks")
    }
  }

  test("the two frame-hash rungs agree on planted video pairs at the " +
    "boundary (videoFrameAHashPacked feeds both)") {
    import graft.operators.Multimodal
    // tiny planted corpus: triples share content through trim/edit
    // damage; at 9 videos the ladder picks the 64-bit rung, and the
    // wide rung must find the same planted video pairs (the fixture's
    // block-constant pixels make ham256 = 4*ham64, and planted damage
    // is <= 1 coarse bit per frame, inside both radii)
    val ids = spark.range(9).toDF("doc_id")
    val media = Multimodal.syntheticNearDupVideoTable(ids, "doc_id")
    def pairsAt(blocks: Int, width: Int): Set[(Long, Long)] =
      Dedup.hammingNearDuplicatesWide(
          Multimodal.videoFrameAHashPacked(media, blocks)
            .select((col("media_id") * 64 + col("frame_idx")).as("fid"),
              col("sig")),
          "fid", "sig", width, maxHamming = 6)
        .where(expr("id_a div 64") =!= expr("id_b div 64"))
        .groupBy(expr("id_a div 64").as("va"),
          expr("id_b div 64").as("vb"))
        .agg(count(lit(1)).as("m")).where(col("m") >= 2)
        .select("va", "vb").as[(Long, Long)].collect().toSet
    val fast = pairsAt(8, 64)
    val wide = pairsAt(16, 256)
    val planted = (for (g <- 0 until 3; a <- 0 until 3; b <- a + 1 until 3)
      yield (g * 3L + a, g * 3L + b)).toSet
    assert(fast == planted, s"64-bit rung missed planted pairs: $fast")
    assert(wide == planted, s"256-bit rung missed planted pairs: $wide")
  }

  test("hammingNearDuplicatesWide at 128 bits equals brute force " +
    "(planted near-dups + organic pairs)") {
    // plant near-identical copies of ids 0..4 at +100: one perturbed
    // element each — tiny angle, near-zero hamming
    val planted = (0L until 5L).map(i =>
      (i + 100L, vec(i).updated(3, vec(i)(3) + 1e-6)))
    val df = (base ++ planted).toDF("id", "v")
      .withColumn("sig", SketchExpressions.srpCodeWide(col("v"), 128))
    val got = Dedup.hammingNearDuplicatesWide(df, "id", "sig", 128, 6)
      .select("id_a", "id_b", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sigs = df.select("id", "sig").collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Long]]("sig")).toMap
    val ids = sigs.keys.toSeq.sorted
    val exp = (for {
      i <- ids; j <- ids if i < j
      d = sigs(i).zip(sigs(j))
        .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      if d <= 6
    } yield (i, j, d.toLong)).toSet
    assert((0L until 5L).forall(i =>
      exp.exists(p => p._1 == i && p._2 == i + 100L)),
      "planted pairs must be within the radius (test construction)")
    assert(got == exp,
      s"missing ${(exp -- got).take(5)}, spurious ${(got -- exp).take(5)}")
  }

  test("maxHamming=0: single full-width band is an exact-signature " +
    "equi-join (the >63-bit chunk XOR-folds; firstAgreeChunk kills " +
    "fold collisions)") {
    // duplicate signatures → exact pairs; distinct ones → none
    val df = Seq((1L, 7L), (2L, 7L), (3L, 7L), (4L, 9L), (5L, 10L))
      .toDF("id", "sh")
    val got = Dedup.hammingNearDuplicates64(df, "id", "sh", maxHamming = 0)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // wide variant at 128 bits: the single chunk folds two words.
    // ids 1/2 are identical; id 3 is a GENUINE fold collision with them:
    // bit 0 set (fold window [0,63) → key 1) vs bit 63 set (fold window
    // [63,126) → key 1) — same bucket, different bits, must NOT pair.
    val wide = Seq(
      (1L, Seq(1L, 0L)), (2L, Seq(1L, 0L)),
      (3L, Seq(java.lang.Long.MIN_VALUE, 0L)),
      (4L, Seq(11L, 23L)))
      .toDF("id", "sig")
    val gotW = Dedup.hammingNearDuplicatesWide(wide, "id", "sig", 128, 0)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotW == Set((1L, 2L)))
  }

  test("bucket-cap truncation fires the observability counter on a " +
    "mode-collapsed corpus and stays silent when nothing is capped") {
    // 40 identical signatures — one bucket of 40 in every band. A cap
    // of 10 truncates 30 banded rows per band; the s36 failure class
    // (silent cap-induced recall loss) must now be loud for EVERY
    // capped caller, not just the one with a bespoke recall gate.
    val collapsed = (0L until 40L).map(i => (i, Seq(5L, 9L)))
      .toDF("id", "sig")
    def drain(): Unit = org.apache.spark.GraftListenerBridge
      .flushListeners(spark.sparkContext)
    Dedup.hammingNearDuplicatesWide(collapsed, "id", "sig", 128, 1,
        maxBucket = 10)
      .write.format("noop").mode("overwrite").save()
    drain()
    val fired = Dedup.capDroppedLast(spark)
    assert(fired > 0, "cap truncated the collapsed bucket but the " +
      "observability counter did not fire")
    // uncapped run on a corpus with small buckets: counter reports 0
    val sparse = (0L until 8L).map(i => (i, Seq(1L << i, 0L)))
      .toDF("id", "sig")
    Dedup.hammingNearDuplicatesWide(sparse, "id", "sig", 128, 1,
        maxBucket = 10)
      .write.format("noop").mode("overwrite").save()
    drain()
    assert(Dedup.capDroppedLast(spark) == 0L,
      "no bucket exceeded the cap but rows_dropped was non-zero")
  }
}
