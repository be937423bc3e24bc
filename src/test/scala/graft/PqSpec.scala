package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

class PqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // clustered corpus: 4 well-separated axis blocks + jitter — the regime
  // PQ exists for (unlike the iid fixture embeddings, where cell
  // resolution cannot separate near-tied cosines)
  private def clustered = {
    val rows = for (i <- 0 until 256) yield {
      val c = i % 4
      val v = Array.tabulate(16) { d =>
        val base = if (d / 4 == c) 1.0 else 0.0
        base + 0.02 * (((i * 31 + d) % 7) - 3)
      }
      val n = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(_ / n).toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("codebooks are deterministic and shaped (subspaces x k x sub)") {
    val df = clustered
    val a = Similarity.pqCodebooks(df, "vec_id", "embedding",
      subspaces = 4, codebookSize = 8)
    val b = Similarity.pqCodebooks(df.repartition(7), "vec_id", "embedding",
      subspaces = 4, codebookSize = 8)
    assert(a.length == 4 && a.forall(_.length == 8) &&
      a.forall(_.forall(_.length == 4)))
    assert(a.map(_.map(_.toSeq).toSeq).toSeq ==
      b.map(_.map(_.toSeq).toSeq).toSeq,
      "training must not depend on partitioning")
  }

  test("pqTopK recovers cluster-mates of the query on clustered data") {
    val df = clustered
    val q = df.where(col("vec_id") === 0)
      .select(col("embedding")).as[Seq[Double]].head()
    val got = Similarity.pqTopK(df, "vec_id", "embedding", q, k = 10,
      subspaces = 4, codebookSize = 8, overFetch = 4)
      .select("id").as[Long].collect().toSet
    // the query's cluster is ids ≡ 0 (mod 4); all top-10 must come from it
    assert(got.forall(_ % 4 == 0), s"non-cluster ids in $got")
    assert(got.contains(0L))
    // and must equal the exact answer (re-rank is exact cosine)
    val exact = Similarity.bruteForceTopK(df, "vec_id", "embedding", q,
      k = 10).select("id").as[Long].collect().toSet
    assert(got == exact)
  }

  test("pqTopK guards a non-divisible subspace split") {
    val df = clustered
    val q = Seq.fill(16)(0.25)
    intercept[IllegalArgumentException] {
      Similarity.pqCodebooks(df, "vec_id", "embedding", subspaces = 5)
    }
  }

  test("compiled PqAdc equals the declarative argmin/lookup tree " +
    "value-for-value (the spec seam)") {
    // the expression replaced a ~10k-node tree Catalyst re-analyzed per
    // query construction; bit-equality (not approx) is the contract —
    // both spellings fold IEEE operations in the same order
    val df = clustered
    val q = df.where(col("vec_id") === 3)
      .select(col("embedding")).as[Seq[Double]].head()
    val books = Similarity.pqCodebooks(df, "vec_id", "embedding",
      subspaces = 4, codebookSize = 8)
    val dt = Similarity.pqDistanceTable(books, q, subspaces = 4, sub = 4)
    val vec = Similarity.toDoubleVec(col("embedding"))
    val rows = df.select(
        graft.functions.PqAdc(vec, books, dt).as("compiled"),
        Similarity.pqAdcTree(vec, books, dt, subspaces = 4, sub = 4)
          .as("tree"))
      .collect()
    assert(rows.length == 256)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"compiled=${r.getDouble(0)} tree=${r.getDouble(1)}")
    }
  }

  test("PqAdc nulls out on a null array element (element_at semantics)") {
    // the tree's element_at yields null for a null slot, which nulls the
    // whole ADC sum; the compiled path must match, not read undefined
    // memory (ADVICE r14)
    val df = clustered
    val q = df.where(col("vec_id") === 0)
      .select(col("embedding")).as[Seq[Double]].head()
    val books = Similarity.pqCodebooks(df, "vec_id", "embedding",
      subspaces = 4, codebookSize = 8)
    val dt = Similarity.pqDistanceTable(books, q, subspaces = 4, sub = 4)
    val withNull = df.select(transform(
      Similarity.toDoubleVec(col("embedding")),
      (x, i) => when(i === 5, lit(null)).otherwise(x)).as("v"))
    val rows = withNull
      .select(graft.functions.PqAdc(col("v"), books, dt).as("adc"))
      .collect()
    assert(rows.length == 256 && rows.forall(_.isNullAt(0)))
  }
}
