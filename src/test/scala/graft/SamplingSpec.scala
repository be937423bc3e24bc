package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows = spark.range(1000).select(
    col("id"), (col("id") % 7 + 1).as("w"), (col("id") % 5).cast("string").as("src"))

  test("hashSample is deterministic and monotone in rate") {
    val a = Sampling.hashSample(rows, 0.2, col("id")).select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(rows, 0.2, col("id")).select("id").as[Long].collect().toSet
    assert(a == b, "same rate, same keys -> same sample")
    val wider = Sampling.hashSample(rows, 0.5, col("id")).select("id").as[Long].collect().toSet
    assert(a.subsetOf(wider), "raising the rate only adds rows")
    assert(math.abs(a.size - 200) < 60, s"rate 0.2 of 1000 gave ${a.size}")
  }

  test("stratifiedTopN caps every stratum deterministically") {
    val out = Sampling.stratifiedTopN(rows, "src", 13,
      Seq(Sampling.mix32(col("id")), col("id")))
    val perStratum = out.groupBy("src").count().select("count").as[Long].collect()
    assert(perStratum.forall(_ == 13))
    val again = Sampling.stratifiedTopN(rows, "src", 13,
      Seq(Sampling.mix32(col("id")), col("id")))
      .select("id").as[Long].collect().sorted
    assert(again.sameElements(out.select("id").as[Long].collect().sorted))
  }

  test("globalShuffle is a deterministic permutation with dense per-shard positions") {
    val df = (0L until 1000L).toDF("id")
    val out = Sampling.globalShuffle(df, "id", numShards = 7,
      score = Sampling.mix32(col("id")))
    val rows = out.select("id", "shard", "pos")
      .as[(Long, Long, Long)].collect()
    assert(rows.length === 1000)
    // (shard, pos) is a bijection onto dense 0..n_s-1 ranges
    assert(rows.map(r => (r._2, r._3)).distinct.length === 1000)
    rows.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).sorted === (0L until g.length.toLong).toArray)
    }
    // re-running over a different partitioning replays the same coordinates
    val again = Sampling.globalShuffle(df.repartition(13), "id", 7,
      Sampling.mix32(col("id")))
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect()
    assert(again.sortBy(_._1) === rows.sortBy(_._1))
  }

  test("upsampleToWeights emits floor(rate) copies plus a hash-gated fractional copy") {
    // strata: a = 2 rows, b = 6 rows; equal target weights over 8 total
    // → r_a = 0.5·8/2 = 2.0 exactly (2 copies each, no fractional gate),
    //   r_b = 0.5·8/6 = 2/3 (0 or 1 copies, gated on mix32 < frac·2^32)
    val df = (0L until 2L).map(i => (i, "a")).toDF("id", "s")
      .unionByName((10L until 16L).map(i => (i, "b")).toDF("id", "s"))
    val out = Sampling.upsampleToWeights(df, "s",
        Map("a" -> 0.5, "b" -> 0.5), Sampling.mix32(col("id")))
      .select("id", "copy").as[(Long, Long)].collect()
    val byId = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byId(0L) === Seq(1L, 2L) && byId(1L) === Seq(1L, 2L))
    val rB = 0.5 * 8 / 6
    val fcut = math.floor((rB - math.floor(rB)) * 4294967296.0).toLong
    def mix(k: Long) = ((k % 2147483648L) * 2654435761L) % 4294967296L
    (10L until 16L).foreach { i =>
      val want = if (mix(i) < fcut) Seq(1L) else Seq.empty
      assert(byId.getOrElse(i, Seq.empty) === want, s"row $i")
    }
    // a weighted-but-ABSENT stratum fails loudly: its weight inflates
    // wSum while the corpus cannot supply it, silently shrinking the
    // output below N otherwise
    intercept[Exception] {
      Sampling.upsampleToWeights(df.where($"s" === "a"), "s",
          Map("a" -> 0.5, "ghost" -> 0.5), Sampling.mix32(col("id")))
        .select("id").as[Long].collect()
    }
    // an observed stratum with no weight fails loudly instead of being
    // silently dropped (the "preserves corpus size" contract)
    intercept[Exception] {
      Sampling.upsampleToWeights(df, "s", Map("a" -> 1.0),
          Sampling.mix32(col("id")))
        .count()
    }
    // a rate above maxRate fails the job loudly (explode-bomb guard)
    intercept[Exception] {
      Sampling.upsampleToWeights(df, "s", Map("a" -> 0.5, "b" -> 0.5),
          Sampling.mix32(col("id")), maxRate = 1.5)
        .count()
    }
  }

  test("takeUntilBudget equals the single-node prefix-sum answer") {
    // local reference: sort by (mix32, id), keep while inclusive cum <= budget
    def mix(id: Long): Long = {
      val m = (id * 2654435761L) % 4294967296L
      if (m < 0) m + 4294967296L else m
    }
    val local = rows.select("id", "w").as[(Long, Long)].collect()
      .sortBy { case (id, _) => (mix(id), id) }
    val budget = 1500L
    var cum = 0L
    val want = local.flatMap { case (id, w) =>
      cum += w; if (cum <= budget) Some(id) else None
    }.sorted
    val got = Sampling.takeUntilBudget(
        rows.withColumn("pri", Sampling.mix32(col("id"))),
        "w", budget, Seq(col("pri"), col("id")), numPartitions = 7)
      .select("id").as[Long].collect().sorted
    assert(got.sameElements(want),
      s"got ${got.length} rows, want ${want.length}")
  }

  test("takeUntilBudget excludes the row that crosses the budget") {
    val df = Seq((1L, 10L), (2L, 10L), (3L, 10L)).toDF("id", "w")
    val got = Sampling.takeUntilBudget(df, "w", 25L, Seq(col("id")),
      numPartitions = 2).select("id").as[Long].collect().sorted
    assert(got.sameElements(Array(1L, 2L)))
  }

  test("takeUntilBudget boundary cases: nothing fits / everything fits") {
    val df = Seq((1L, 10L), (2L, 10L)).toDF("id", "w")
    // first row already exceeds the budget → empty prefix
    assert(Sampling.takeUntilBudget(df, "w", 5L, Seq(col("id")),
      numPartitions = 2).count() == 0L)
    // total weight within budget → identity (no filter at all)
    val all = Sampling.takeUntilBudget(df, "w", 20L, Seq(col("id")),
      numPartitions = 2).select("id").as[Long].collect().sorted
    assert(all.sameElements(Array(1L, 2L)))
    // budget exactly at a row boundary keeps that row (inclusive sum)
    val boundary = Sampling.takeUntilBudget(df, "w", 10L, Seq(col("id")),
      numPartitions = 2).select("id").as[Long].collect()
    assert(boundary.sameElements(Array(1L)))
  }
  test("mixToWeights hits the target mixture exactly at the feasible max") {
    // strata sizes: src 0..4 each have 200 rows; weights favor src0 2:1:1
    val out = Sampling.mixToWeights(rows, "src",
      Map("0" -> 0.5, "1" -> 0.25, "2" -> 0.25),
      Sampling.mix32(col("id")))
    val counts = out.groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // feasible T = min(200/.5, 200/.25, 200/.25) = 400
    // -> rates: src0 = 1.0 (kept fully), src1/2 = 0.5
    assert(counts("0") == 200, s"binding stratum kept fully: $counts")
    assert(counts.keySet == Set("0", "1", "2"), "unweighted strata dropped")
    assert(math.abs(counts("1") - 100) < 40, s"src1 ~rate 0.5: $counts")
    assert(math.abs(counts("2") - 100) < 40, s"src2 ~rate 0.5: $counts")
    val again = Sampling.mixToWeights(rows, "src",
      Map("0" -> 0.5, "1" -> 0.25, "2" -> 0.25),
      Sampling.mix32(col("id")))
      .select("id").as[Long].collect().sorted
    assert(again.sameElements(
      out.select("id").as[Long].collect().sorted), "deterministic")
  }
  test("mixToWeights: a weighted stratum absent from the corpus -> empty") {
    val out = Sampling.mixToWeights(rows, "src",
      Map("0" -> 0.5, "nonexistent" -> 0.5),
      Sampling.mix32(col("id")))
    assert(out.count() === 0L,
      "no subcorpus can give half its mass to a stratum with no rows")
  }

  test("packByBudget: bins are contiguous prefix spans with exact sums") {
    val out = Sampling.packByBudget(rows, "id", "w", binSize = 100L,
      priority = Seq(Sampling.mix32(col("id")), col("id")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // replay the greedy packing single-threaded in priority order
    val pri = rows.select(col("id"), col("w"),
        Sampling.mix32(col("id")).as("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (id, _, p) => (p, id) }
    var cum = 0L
    val expect = pri.map { case (id, w, _) =>
      val bin = cum / 100L; cum += w; (id, w, bin)
    }.toSet
    assert(out.toSet === expect, "distributed bins equal sequential replay")
    // every bin except the last must close at or past its budget
    // boundary: bin b's cumulative span ends at or after (b+1)*binSize
    val totals = expect.groupBy(_._3).toSeq.sortBy(_._1)
      .map { case (b, rs) => b -> rs.toSeq.map(_._2).sum }
    var cumEnd = 0L
    totals.dropRight(1).foreach { case (b, tot) =>
      cumEnd += tot
      assert(cumEnd >= (b + 1) * 100L,
        s"bin $b closed at $cumEnd before its boundary ${(b + 1) * 100L}")
    }
  }

  test("systematicSample selects exactly the rows whose weight interval " +
      "contains a tick") {
    // ids 0..99, weights 1..8 cycling; step 20 → ticks at 20, 40, …
    val d = spark.range(100).select(col("id"), (col("id") % 8 + 1).as("w"))
    val got = Sampling.systematicSample(d, "id", "w", step = 20L,
        priority = Seq(col("id"))) // identity order: easy reference
      .select("id").as[Long].collect().toSet
    // single-node reference replay
    val ws = (0L until 100L).map(i => (i, i % 8 + 1))
    var cum = 0L
    val want = ws.filter { case (_, w) =>
      val pre = cum; cum += w
      (pre % 20) + w >= 20
    }.map(_._1).toSet
    assert(got === want)
    assert(got.nonEmpty && got.size < 100)
    // zero-weight rows are never selected
    val z = Sampling.systematicSample(
        spark.range(10).select(col("id"), lit(0L).as("w")),
        "id", "w", step = 5L, priority = Seq(col("id")))
      .collect()
    assert(z.isEmpty)
  }

  test("temperatureMixT2 keeps the smallest stratum whole and flattens " +
      "the rest at sqrt proportions") {
    // strata a:16, b:64, c:256 → rates 1, 1/2, 1/4 exactly (powers of 4)
    val d = spark.range(16 + 64 + 256).select(col("id"),
      when(col("id") < 16, "a").when(col("id") < 80, "b").otherwise("c")
        .as("s"))
    val kept = Sampling.temperatureMixT2(d, "s", Sampling.mix32(col("id")))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(kept("a") === 16L, "smallest stratum kept whole")
    // dyadic rates make the cut an exact power of two; replay the gate
    def mix32(k: Long) = ((k % 2147483648L) * 2654435761L) % 4294967296L
    val wantB = (16L until 80L).count(i => mix32(i) < (1L << 31))
    val wantC = (80L until 336L).count(i => mix32(i) < (1L << 30))
    assert(kept("b") === wantB.toLong)
    assert(kept("c") === wantC.toLong)
  }

  test("packByBudget with a single partition equals many partitions") {
    val many = Sampling.packByBudget(rows, "id", "w", 250L,
      Seq(Sampling.mix32(col("id")), col("id")), numPartitions = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val one = Sampling.packByBudget(rows, "id", "w", 250L,
      Seq(Sampling.mix32(col("id")), col("id")), numPartitions = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(many === one)
  }
}
