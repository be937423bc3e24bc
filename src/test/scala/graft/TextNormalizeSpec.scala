package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextNormalize

class TextNormalizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(col: org.apache.spark.sql.Column, input: String*): Seq[String] =
    input.toDF("s").select(col.as("r")).as[String].collect().toSeq

  test("NFC composes decomposed sequences; ASCII passes through") {
    // "Cafe" + combining acute = decomposed é
    val dec = "Café"
    assert(run(TextNormalize.normalize($"s", "NFC"), dec) == Seq("Café"))
    assert(run(TextNormalize.normalize($"s", "NFC"), "plain ascii") ==
      Seq("plain ascii"))
  }

  test("NFKC folds compatibility forms (ligatures, fullwidth)") {
    assert(run(TextNormalize.normalize($"s", "NFKC"), "ﬁre ﬂow") ==
      Seq("fire flow"))
    assert(run(TextNormalize.normalize($"s", "NFKC"), "ＡＢＣ　１２３") ==
      Seq("ABC 123"))
  }

  test("stripAccents drops combining marks, keeps base letters") {
    assert(run(TextNormalize.stripAccents($"s"),
      "naïve résumé", "Ångström", "ñ São", "ascii") ==
      Seq("naive resume", "Angstrom", "n Sao", "ascii"))
    // combining mark on a decomposed input too
    assert(run(TextNormalize.stripAccents($"s"), "Café") == Seq("Cafe"))
    // ligatures are NOT accent marks — untouched (that's NFKC's job)
    assert(run(TextNormalize.stripAccents($"s"), "ﬁre") == Seq("ﬁre"))
  }

  test("canonical = lower(strip(nfc)) and null-safety") {
    assert(run(TextNormalize.canonical($"s"), "Café ÜNÏCÖDÉ", "Café") ==
      Seq("cafe unicode", "cafe"))
    val withNull = Seq(Some("Ärger"), None).toDF("s")
      .select(TextNormalize.canonical($"s").as("r"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(withNull == Seq("arger", null))
  }

  test("expressions stay inside whole-stage codegen") {
    // non-foldable input (a local literal row would be constant-folded
    // into a LocalTableScan with no codegen stage at all)
    val df = spark.range(2)
      .select(TextNormalize.canonical(
        concat(lit("Åb"), col("id").cast("string"))).as("r"))
    // "*(1) Project" = the projection runs inside WholeStageCodegen
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.as[String].collect().toSeq == Seq("ab0", "ab1"))
  }

  test("unknown form fails loudly") {
    intercept[IllegalArgumentException] {
      Seq("x").toDF("s").select(TextNormalize.normalize($"s", "NFX")).collect()
    }
  }
}
