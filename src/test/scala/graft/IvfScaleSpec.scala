package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** The large-k IVF assignment route: past the broadcast bound the
  * centroid side must go through a shuffled hash join on (table,
  * bucket) — broadcasting k·tables centroid rows is infeasible when
  * autoClusters yields k ~ 10⁷ at real corpus sizes — and assignment
  * recall must hold through the route flip. Plus the two-level trainer
  * that replaces the driver-sample bound past k ≈ 4096. */
class IvfScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dim = 8

  // k distinct deterministic unit-ish vectors
  private def synthCents(k: Int): Array[Array[Double]] =
    Array.tabulate(k) { c =>
      val v = Array.tabulate(dim) { i =>
        val h = graft.functions.SketchExpressions.mix(c * 131L + i)
        (h % 1999L).toDouble / 1000.0 - 0.999
      }
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }

  test("k >= 1e5 assignment plans a shuffled hash join, NO broadcast, " +
    "and recall holds (rows planted at centroids all self-assign)") {
    val k = 100000
    val cents = synthCents(k)
    // 200 rows sitting exactly AT centroids spread across the id space:
    // identical vector => identical buckets in every table => the true
    // centroid is always a candidate and its self-dot is the argmax, so
    // recall through the route flip is deterministic, not statistical
    val ids = (0 until 200).map(i => i * 499L % k)
    val rows = ids.map(c => (c, cents(c.toInt).toSeq)).toDF("id", "v")
    val bits = math.ceil(math.log(k / 16.0) / math.log(2)).toInt
    val out = Similarity.ivfAssignTopLsh(rows, "id", "v", cents,
      probes = 1, bits = bits, dim = dim, tables = 4)
    val got = out.collect().map(r =>
      r.getLong(0) -> r.getAs[scala.collection.Seq[Int]]("clusters")).toMap
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange") &&
      !plan.contains("BroadcastHashJoin"),
      s"k=$k (400k centroid bucket rows) must not broadcast:\n" +
        plan.linesIterator.take(30).mkString("\n"))
    assert(plan.contains("ShuffledHashJoin"),
      "large-k route should be a shuffled hash join, not sort-merge")
    ids.foreach { c =>
      assert(got.contains(c), s"row at centroid $c got no assignment")
      assert(got(c).head == c.toInt,
        s"row at centroid $c assigned ${got(c)}")
    }
  }

  test("small k keeps the broadcast route") {
    val k = 64
    val cents = synthCents(k)
    val rows = (0 until k).map(c => (c.toLong, cents(c).toSeq)).toDF("id", "v")
    val out = Similarity.ivfAssignTopLsh(rows, "id", "v", cents,
      probes = 1, bits = 2, dim = dim, tables = 4)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      "small-k assignment should broadcast the centroid buckets")
  }

  test("hierarchical two-level training: k centroids from sharded " +
    "group-local k-means; blob members co-assign through the frame") {
    // 16 well-separated blobs of 40 points each in dim 16
    val blobDim = 16
    val blobs = Array.tabulate(16) { b =>
      val v = Array.tabulate(blobDim)(i =>
        if (i == b) 1.0 else 0.02 * ((b * 31 + i) % 5 - 2))
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val pts = for {
      b <- 0 until 16; j <- 0 until 40
    } yield {
      val noise = Array.tabulate(blobDim)(i =>
        0.01 * (graft.functions.SketchExpressions.mix(
          b * 1000L + j * 17L + i) % 7 - 3))
      val v = blobs(b).zip(noise).map { case (x, e) => x + e }
      (b * 1000L + j, v.toSeq, b)
    }
    val df = pts.map(p => (p._1, p._2)).toDF("id", "v")
    val centDf = Similarity.ivfCentroidsHierarchical(df, "id", "v", k = 16)
      .cache()
    val nc = centDf.count()
    assert(nc >= 8 && nc <= 16, s"expected ~16 centroids, got $nc")
    // assignment through the frame with multi-probe: a blob may own TWO
    // sub-centroids (k-means splits dense blobs when its super-cluster
    // has spare k) — the SemDeDup contract is that same-blob pairs
    // still MEET on at least one probed cluster
    val assigned = Similarity.ivfAssignTopLshFrame(df, "id", "v", centDf,
        probes = 2, bits = 3, dim = blobDim, tables = 8)
      .select(col("id"), col("clusters"))
      .collect().map(r =>
        r.getLong(0) -> r.getAs[scala.collection.Seq[Int]]("clusters").toSet)
      .toMap
    val byBlob = pts.groupBy(_._3)
    byBlob.foreach { case (b, members) =>
      val lists = members.map(m => assigned.getOrElse(m._1,
        fail(s"row ${m._1} unassigned")))
      lists.tail.foreach { l =>
        assert(l.intersect(lists.head).nonEmpty,
          s"blob $b pair with disjoint probe lists: ${lists.head} vs $l")
      }
    }
    // assignment quality: every row's nearest probed centroid is close
    val cents = centDf.collect().map(r => r.getInt(0) ->
      r.getAs[scala.collection.Seq[Double]](1).toArray).toMap
    pts.foreach { case (id, v, _) =>
      val best = assigned(id).map { c =>
        val cv = cents(c)
        val dot = v.zip(cv).map { case (a, b) => a * b }.sum
        val nv = math.sqrt(v.map(x => x * x).sum)
        val ncv = math.sqrt(cv.map(x => x * x).sum)
        dot / (nv * ncv)
      }.max
      // an unbalanced super-cluster can hand two near-orthogonal blobs
      // ONE merged centroid (cosine ~0.71 to each member) — legitimate
      // k-means at k = #blobs; a genuinely wrong assignment (bucket or
      // join bug → arbitrary centroid) scores near the ~0.0–0.3 floor
      assert(best >= 0.55, s"row $id's best probed centroid cosine $best")
    }
    centDf.unpersist()
  }
}
