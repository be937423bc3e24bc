package graft

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{DdProto, DdogBuffer, DDSketchBuffer, SketchInteropFunctions => SI}

/** Byte-level interop with the reference's persisted sketch payloads.
  *
  * The HLL tests build payloads through the SAME library calls the
  * reference makes (datasketches-java: HllSketch(12, HLL_4)
  * .toCompactByteArray to write, HllSketch.heapify + Union to read,
  * reference Aggregator.scala:43-58 / TimeGroupedSketchAggregator
  * .scala:48-55) — those byte arrays ARE what lakeside segments carry, so
  * round-tripping them through graft aggregates is a ground-truth
  * compatibility check, not a self-consistency check.
  *
  * The DDSketch tests pin the hand-rolled protobuf codec to the public
  * DDSketch.proto wire format with hand-assembled golden bytes, and the
  * mapping/quantile math to the published DDSketch contract (±α relative
  * error at every quantile).
  */
class SketchInteropSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // ---------------- HLL: reference byte format ----------------

  /** Build a payload exactly as the reference's HLLAggregator does. */
  private def referenceHllBytes(values: Seq[String]): Array[Byte] = {
    val sk = new HllSketch(12, TgtHllType.HLL_4)
    values.foreach(sk.update)
    sk.toCompactByteArray
  }

  test("sketch cascade: minute→hour→query DD merge equals the direct " +
    "minute→query merge (rollup cascades lose nothing)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.SketchInteropFunctions._
    // 360 "minutes" of values across 6 "hours"
    val rows = (0 until 360).flatMap { m =>
      (0 until 5).map(i => (m.toLong, m / 60L, (m * 31 + i * 7) % 199 + 0.25))
    }
    val minute = rows.toDF("minute", "hour", "v")
      .groupBy("minute", "hour").agg(ddProtoSketch(col("v")).as("sk"))
    val direct = minute.agg(
      ddProtoQuantileOf(ddProtoMerge(col("sk")), lit(0.9))).head().getDouble(0)
    val cascaded = minute.groupBy("hour").agg(ddProtoMerge(col("sk")).as("hk"))
      .agg(ddProtoQuantileOf(ddProtoMerge(col("hk")), lit(0.9)))
      .head().getDouble(0)
    // bin-count addition is associative on these integer counts — the
    // cascade is EXACT, not merely within sketch error
    assert(cascaded === direct)
  }

  test("hll: reference-written payloads union to the right estimate") {
    import spark.implicits._
    // 8 "segments" with overlapping user sets, as lakeside would persist
    val segs = (0 until 8).map { s =>
      referenceHllBytes((s * 500 until s * 500 + 1500).map(i => s"user-$i"))
    }
    // distinct ids span 0 until 8*500+1000 = 5000 (last segment covers
    // 3500 until 5000)
    val exact = (8 * 500 + 1000).toDouble
    val df = segs.toDF("sketch")
    val est = df.agg(SI.dsHllEstimateOf(SI.dsHllUnion(col("sketch"))).as("est"))
      .head().getDouble(0)
    assert(math.abs(est - exact) / exact < 0.05, s"est=$est exact=$exact")
  }

  test("hll: graft-written payloads are readable by the reference read path") {
    import spark.implicits._
    val df = (0 until 4000).map(i => s"entity-${i % 1700}").toDF("v")
    val bytes = df.agg(SI.dsHllSketch(col("v")).as("sk")).head()
      .getAs[Array[Byte]](0)
    // Exactly BaseExpr.hllSketchFromBytes(bytes).getEstimate
    val sk = HllSketch.heapify(bytes)
    assert(sk.getLgConfigK == 12)
    assert(sk.getTgtHllType == TgtHllType.HLL_4)
    val est = sk.getEstimate
    assert(math.abs(est - 1700.0) / 1700.0 < 0.05, s"est=$est")
    // ...and mergeable with a reference-written sketch, via the
    // reference's own merge (TimeGroupedSketchAggregator.scala:48-55)
    val u = new Union()
    u.update(sk)
    u.update(HllSketch.heapify(referenceHllBytes(
      (1000 until 2500).map(i => s"entity-$i"))))
    val merged = u.toCompactByteArray
    val mergedEst = HllSketch.heapify(merged).getEstimate
    assert(math.abs(mergedEst - 2500.0) / 2500.0 < 0.05, s"merged=$mergedEst")
  }

  test("hll: string hashing matches the reference's update(String) exactly") {
    import spark.implicits._
    val values = (0 until 3000).map(i => s"svc-${i % 997}")
    // graft agg (single partition for a deterministic build order)
    val bytes = values.toDF("v").coalesce(1)
      .agg(SI.dsHllSketch(col("v")).as("sk")).head().getAs[Array[Byte]](0)
    val ref = HllSketch.heapify(referenceHllBytes(values))
    val ours = HllSketch.heapify(bytes)
    // same library, same coupons -> identical estimates on identical input
    assert(ours.getEstimate === ref.getEstimate)
  }

  // ---------------- DDSketch: protobuf wire format ----------------

  test("ddsketch proto: golden bytes for a two-bin sketch") {
    val b = new DdogBuffer(DdProto.gammaOf(0.01), 0.0)
    b.insert(1.0) // log(1)/log(gamma) = 0 -> bin 0
    b.insert(2.0) // floor(log(2)/log(gamma)) -> bin 34
    assert(b.index(2.0) == 34)
    val got = DdProto.encode(b)

    // Hand-assembled per DDSketch.proto + the protobuf wire spec:
    val expected = {
      val out = new ByteArrayOutputStream()
      def dbl(v: Double): Array[Byte] =
        ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array()
      // field 1 (mapping): tag 0x0a, len 9 = [gamma tag 0x09 + fixed64]
      out.write(0x0a); out.write(9)
      out.write(0x09); out.write(dbl((1 + 0.01) / (1 - 0.01)), 0, 8)
      // field 2 (positiveValues): contiguous counts bins 0..34 (35 doubles)
      val store = new ByteArrayOutputStream()
      store.write(0x12) // field 2, len-delim (packed doubles)
      store.write(35 * 8) // 280 < 16384 -> two-byte varint? 280 > 127!
      store.toByteArray
      // NOTE: 280 needs a 2-byte varint (0x98 0x02); assembled below.
      val storeBytes = {
        val s = new ByteArrayOutputStream()
        s.write(0x12); s.write(0x98); s.write(0x02) // varint 280
        val counts = new Array[Double](35)
        counts(0) = 1.0; counts(34) = 1.0
        counts.foreach(c => s.write(dbl(c), 0, 8))
        s.toByteArray // offset field omitted: minIndex == 0
      }
      out.write(0x12)
      // storeBytes.length = 3 + 280 = 283 -> varint 0x9b 0x02
      out.write(0x9b); out.write(0x02)
      out.write(storeBytes, 0, storeBytes.length)
      // field 3 (negativeValues): empty store message
      out.write(0x1a); out.write(0)
      // zeroCount 0 -> omitted
      out.toByteArray
    }
    assert(java.util.Arrays.equals(got, expected),
      s"wire mismatch:\n got=${got.map("%02x".format(_)).mkString}\n exp=${expected.map("%02x".format(_)).mkString}")
  }

  test("ddsketch proto: decode handles sparse map encoding and unknown fields") {
    // Hand-encode the same logical sketch using binCounts map entries
    // (the OTHER legal Store encoding) plus an unknown field to skip.
    val out = new ByteArrayOutputStream()
    def dbl(v: Double): Array[Byte] =
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array()
    out.write(0x0a); out.write(9)
    out.write(0x09); out.write(dbl(DdProto.gammaOf(0.01)), 0, 8)
    // positiveValues with two map entries: (0 -> 1.0), (34 -> 1.0)
    def mapEntry(k: Int, v: Double): Array[Byte] = {
      val e = new ByteArrayOutputStream()
      e.write(0x08); e.write(((k << 1) ^ (k >> 31)) & 0x7f) // sint32 zigzag, small
      e.write(0x11); e.write(dbl(v), 0, 8)
      e.toByteArray
    }
    val store = new ByteArrayOutputStream()
    for ((k, v) <- Seq(0 -> 1.0, 34 -> 1.0)) {
      val e = mapEntry(k, v)
      store.write(0x0a); store.write(e.length); store.write(e, 0, e.length)
    }
    val sb = store.toByteArray
    out.write(0x12); out.write(sb.length); out.write(sb, 0, sb.length)
    // unknown field 7 (varint) — must be skipped
    out.write(0x38); out.write(0x05)
    // zeroCount = 3
    out.write(0x21); out.write(dbl(3.0), 0, 8)

    val b = DdProto.decode(out.toByteArray)
    assert(b.count === 5.0)
    assert(b.zeroCount === 3.0)
    assert(b.positive.get(0) === 1.0 && b.positive.get(34) === 1.0)
    // and the contiguous encoding of the same sketch decodes identically
    val b2 = DdProto.decode(DdProto.encode(b))
    assert(b2.count === b.count && b2.positive === b.positive
      && b2.zeroCount === b.zeroCount)
  }

  test("ddsketch proto: quantiles within the published ±1% relative error") {
    val rnd = new scala.util.Random(42)
    val values = Array.fill(20000)(math.exp(rnd.nextGaussian() * 2.0) * 100.0)
    val b = new DdogBuffer(DdProto.gammaOf(0.01), 0.0)
    values.foreach(b.insert)
    val decoded = DdProto.decode(DdProto.encode(b))
    val sorted = values.sorted
    for (q <- Seq(0.0, 0.1, 0.5, 0.9, 0.95, 0.99, 1.0)) {
      val est = decoded.quantile(q)
      val exact = sorted(math.floor(q * (values.length - 1)).toInt)
      assert(math.abs(est - exact) / exact <= 0.0101,
        s"q=$q est=$est exact=$exact")
    }
    assert(decoded.count === values.length.toDouble)
    val exactSum = values.sum
    assert(math.abs(decoded.sum - exactSum) / exactSum <= 0.0101)
  }

  test("ddsketch proto: negatives, zeros, and merge = single-pass bytes") {
    val rnd = new scala.util.Random(7)
    val values = Array.fill(5000)(rnd.nextGaussian() * 50.0) ++ Array(0.0, 0.0)
    val parts = values.grouped(1300).toSeq
    val merged = new DdogBuffer(DdProto.gammaOf(0.01), 0.0)
    parts.foreach { p =>
      val part = new DdogBuffer(DdProto.gammaOf(0.01), 0.0)
      p.foreach(part.insert)
      merged.merge(DdProto.decode(DdProto.encode(part)))
    }
    val direct = new DdogBuffer(DdProto.gammaOf(0.01), 0.0)
    values.foreach(direct.insert)
    assert(java.util.Arrays.equals(DdProto.encode(merged), DdProto.encode(direct)))
    val sorted = values.sorted
    for (q <- Seq(0.05, 0.5, 0.95)) {
      val est = merged.quantile(q)
      val exact = sorted(math.floor(q * (values.length - 1)).toInt)
      assert(math.abs(est - exact) <= 0.0101 * math.abs(exact) + 1e-9,
        s"q=$q est=$est exact=$exact")
    }
  }

  test("ddsketch proto: native bridge preserves counts and the accuracy contract") {
    val rnd = new scala.util.Random(11)
    val values = Array.fill(8000)(math.abs(rnd.nextGaussian()) * 300.0 + 0.5)
    val native = new DDSketchBuffer(0.01)
    values.foreach(native.insert)
    val proto = DdProto.fromNative(native)
    assert(proto.count === native.count.toDouble)
    val back = DdProto.toNative(DdProto.decode(DdProto.encode(proto)))
    assert(back.count === native.count)
    val sorted = values.sorted
    for (q <- Seq(0.5, 0.9, 0.99)) {
      val exact = sorted(math.floor(q * (values.length - 1)).toInt)
      // native ceil-convention and ddog floor-convention both promise ±1%
      assert(math.abs(proto.quantile(q) - exact) / exact <= 0.0101)
      assert(math.abs(back.quantile(q) - exact) / exact <= 0.0201)
    }
  }

  test("ddsketch proto: empty sketch yields null quantile, not an NPE, under codegen") {
    import spark.implicits._
    // lit(bytes) is non-nullable, so this exercises the non-nullable
    // codegen path that unboxes the compute() result
    val empty = DdProto.encode(new DdogBuffer(DdProto.gammaOf(0.01), 0.0))
    val r = Seq(1).toDF("x")
      .select(SI.ddProtoQuantileOf(lit(empty), lit(0.5)).as("q"))
      .head()
    assert(r.isNullAt(0))
  }

  test("ddsketch proto: merge agg adopts the first payload's mapping (alpha != default)") {
    import spark.implicits._
    // payloads written at alpha=0.02 — the default-alpha agg buffer must
    // adopt their mapping instead of throwing a mapping mismatch
    def payload(vs: Seq[Double]): Array[Byte] = {
      val b = new DdogBuffer(DdProto.gammaOf(0.02), 0.0)
      vs.foreach(b.insert)
      DdProto.encode(b)
    }
    val df = Seq(payload(Seq(1.0, 2.0)), payload(Seq(3.0, 4.0, 100.0)))
      .toDF("sk")
    val p50 = df.agg(SI.ddProtoQuantileOf(
        SI.ddProtoMerge(col("sk")), lit(0.5)).as("q"))
      .head().getDouble(0)
    assert(math.abs(p50 - 3.0) <= 3.0 * 0.02 + 1e-9)
  }

  test("ddsketch proto: concatenated messages decode as a protobuf merge") {
    // proto3: concatenating two serialized messages merges them — the
    // repeated/message store fields concatenate (bin counts add), while
    // the scalar zero_count field last-wins (so zeros live only in the
    // SECOND payload here, where last-wins equals the sum)
    def payload(vs: Seq[Double]): Array[Byte] = {
      val b = new DdogBuffer(DdProto.gammaOf(0.01), 0.0)
      vs.foreach(b.insert)
      DdProto.encode(b)
    }
    val p1 = payload(Seq(1.0, 2.0, -5.0))
    val p2 = payload(Seq(3.0, 4.0, 0.0))
    val merged = DdProto.decode(p1 ++ p2)
    assert(merged.count === 6.0)
    val reference = DdProto.decode(p1)
    reference.merge(DdProto.decode(p2))
    assert(math.abs(merged.quantile(0.5) - reference.quantile(0.5)) < 1e-12)
  }

  test("ddsketch proto: malformed payloads fail cleanly, not with index errors") {
    val b = new DdogBuffer(DdProto.gammaOf(0.01), 0.0)
    (1 to 100).foreach(i => b.insert(i.toDouble))
    val good = DdProto.encode(b)
    // truncations at every prefix length must raise IllegalArgumentException
    // (or decode successfully when the cut lands on a field boundary)
    for (len <- 0 until good.length) {
      try DdProto.decode(java.util.Arrays.copyOf(good, len))
      catch {
        case _: IllegalArgumentException => // expected shape
        case e: Throwable => fail(s"truncation at $len threw ${e.getClass}")
      }
    }
    // garbage bytes
    intercept[IllegalArgumentException] {
      DdProto.decode(Array.fill[Byte](16)(0x7f))
    }
  }

  test("sketch interop functions work through SQL registration") {
    graft.plans.GraftExtensions.register(spark)
    import spark.implicits._
    (1 to 1000).map(i => (i % 7, (i % 100).toDouble + 1.0, s"u${i % 321}"))
      .toDF("g", "v", "u").createOrReplaceTempView("si_t")
    val row = spark.sql(
      """SELECT graft_dd_proto_quantile(graft_dd_proto_merge(sk), 0.5d) AS p50,
        |       graft_dd_proto_stat(graft_dd_proto_merge(sk), 'count') AS cnt,
        |       graft_hll_compat_estimate(graft_hll_compat_union(hsk)) AS users
        |FROM (SELECT g, graft_dd_proto(v) AS sk, graft_hll_compat(u) AS hsk
        |      FROM si_t GROUP BY g)""".stripMargin).head()
    assert(row.getDouble(1) === 1000.0)
    // discrete 1..100 deciles: rank rule lands on the 50/51 bucket, ±1% each
    assert(row.getDouble(0) >= 49.0 && row.getDouble(0) <= 53.0,
      s"p50=${row.getDouble(0)}")
    assert(math.abs(row.getDouble(2) - 321.0) / 321.0 < 0.05)
    // round-trip between native and proto formats through SQL
    val rt = spark.sql(
      """SELECT ddsketch_quantile_of(
        |         graft_dd_from_proto(graft_dd_to_proto(ddsketch(v))), 0.9d) AS p90
        |FROM si_t""".stripMargin).head().getDouble(0)
    assert(math.abs(rt - 91.0) / 91.0 < 0.03, s"p90=$rt")
  }
}
