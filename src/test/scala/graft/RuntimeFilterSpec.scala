package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RuntimeFilter

class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bloomJoin equals the plain join even with forced false positives") {
    import spark.implicits._
    val fact = (0L until 5000L).map(i => (i % 997, i)).toDF("k", "v")
    val dim = (0L until 50L).map(i => (i * 13, s"d$i")).toDF("dk", "name")
    // fpp 0.5 makes false positives near-certain; the exact join must
    // discard every one of them
    val viaBloom = RuntimeFilter.bloomJoin(fact, "k", dim, "dk", fpp = 0.5)
      .select($"k", $"v", $"name").orderBy("k", "v").collect()
    val plain = fact.join(dim, $"k" === $"dk")
      .select($"k", $"v", $"name").orderBy("k", "v").collect()
    assert(viaBloom.toSeq === plain.toSeq)
    assert(plain.nonEmpty)
  }

  test("keyBloom bytes are reusable across joins (offline-artifact path)") {
    import spark.implicits._
    val dim = (0L until 100L).map(i => (i * 3, i)).toDF("dk", "x")
    val bytes = RuntimeFilter.keyBloom(dim, "dk", fpp = 0.01)
    val fact = (0L until 1000L).map(i => (i, i)).toDF("k", "v")
    val out = RuntimeFilter.bloomJoin(fact, "k", dim, "dk",
        bloomBytes = bytes)
      .select($"k").distinct().count()
    // keys 0,3,...,297 → 100 matches
    assert(out === 100L)
  }
}
