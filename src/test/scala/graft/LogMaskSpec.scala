package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.LogMask
import graft.operators.TextAnalysis

/** Pins [[LogMask.mask]] (the compiled single-pass masker) to the literal
  * `regexp_replace` rule chain ([[TextAnalysis.templateRules]]) it
  * replaces — the exact chain the DuckDB oracle replays for t23. */
class LogMaskSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** The executable spec: java.util.regex replaceAll in rule order —
    * the same engine and semantics Spark's regexp_replace uses. */
  private def regexChain(s: String): String =
    TextAnalysis.templateRules.foldLeft(s) { case (acc, (pat, tok)) =>
      java.util.regex.Pattern.compile(pat).matcher(acc).replaceAll(tok)
    }

  private def check(ss: String*): Unit = ss.foreach { s =>
    assert(LogMask.mask(s) == regexChain(s), s"input: ${s.inspect}")
  }

  private implicit class Insp(val s: String) {
    def inspect: String = "\"" + s.flatMap {
      case c if c >= ' ' && c <= '~' => c.toString
      case c => f"\\u$c%04x"
    } + "\""
  }

  test("planted t23 corpus shape and each rule's canonical hits") {
    check(
      "login user=4821 v=314159 src=10.0.18.213 req=0000001a2b3c",
      "GET /u/123 from 10.1.2.3 req=deadbeefcafe " +
        "id=3f2a8b1c-0000-4d5e-8f00-a1b2c3d4e5f6",
      "retry 7 of 10",
      "hex run 0123456789ab tail",
      "short hex 0123456789a stays",
      "")
  }

  test("uuid near-misses: wrong group widths, uppercase, 13-hex tail") {
    check(
      "3f2a8b1c-0000-4d5e-8f00-a1b2c3d4e5f6",   // exact
      "3f2a8b1c-0000-4d5e-8f00-a1b2c3d4e5f67",  // 13-char tail group
      "3f2a8b1-0000-4d5e-8f00-a1b2c3d4e5f6",    // 7-char head group
      "3F2A8B1C-0000-4D5E-8F00-A1B2C3D4E5F6",   // uppercase: no match
      "x3f2a8b1c-0000-4d5e-8f00-a1b2c3d4e5f6",  // no \b in rule 1: matches
      "3f2a8b1c-0000-4d5e-8f00-a1b2c3d4e5f63f2a8b1c-0000-4d5e-8f00-" +
        "a1b2c3d4e5f6") // back-to-back
  }

  test("ip backtracking: octet overflow, word-glued edges, mid-string") {
    check(
      "1.2.3.4", "1234.1.1.1", "1.2.3.45a", "a1.2.3.4", "1.2.3.4.5",
      "10.0.18.213 and 255.255.255.255", "x=1.2.3.4,y", "1.2.3.",
      ".1.2.3.4", "12.34.56.789", "999.999.999.999", "1.2.3.4_",
      "0.0.0.0e", "1.1.1.12345")
  }

  test("hex runs: 11/12/13 chars, word-glued, digit-only, punctuated") {
    check(
      "deadbeefcafe", "deadbeefcaf", "deadbeefcafe0", "deadbeefcafeg",
      "xdeadbeefcafe", "_deadbeefcafe", "012345678901", "0123456789012z",
      "req=deadbeefcafe;", "deadbeefcafe deadbeefcafe",
      "ffffffffffffffffffffffff")
  }

  test("masking cascade: earlier rules' tokens survive later rules") {
    // <ip>'s and <hex>'s letters must not re-match rule 3/4
    check("10.1.2.3deadbeefcafe", "deadbeefcafe10.1.2.3",
      "1.2.3.4 0000001a2b3c 99")
  }

  test("property: equivalence on seeded log-ish and adversarial strings") {
    val rnd = new scala.util.Random(4242)
    val atoms = Array(
      "user=", " ", ".", "-", "_", "req=", "<", ">", "=", ":", "/", "g",
      "x", "A", "f", "0", "1", "9", "deadbeefcafe", "0123456789a",
      "0123456789ab", "10.0.", "1.2.3.4", "255.", "1234", "a1b2c3d4e5f6",
      "3f2a8b1c-0000-4d5e-8f00-a1b2c3d4e5f6", "é", "世")
    (1 to 2000).foreach { _ =>
      val n = rnd.nextInt(12)
      val s = (1 to n).map(_ => atoms(rnd.nextInt(atoms.length))).mkString
      assert(LogMask.mask(s) == regexChain(s), s"input: ${s.inspect}")
    }
    // fully random over the rules' alphabet (digits, hex, dots, dashes)
    val alpha = "0123456789abcdefg.-_ x"
    (1 to 2000).foreach { _ =>
      val n = rnd.nextInt(40)
      val s = (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      assert(LogMask.mask(s) == regexChain(s), s"input: ${s.inspect}")
    }
  }

  test("expression matches the live regexp_replace chain on a DataFrame " +
    "and passes nulls through") {
    import spark.implicits._
    val df = Seq(
      Some("boot 10.1.2.3 in 5ms req=deadbeefcafe"),
      Some("id=3f2a8b1c-0000-4d5e-8f00-a1b2c3d4e5f6"), None)
      .toDF("msg")
    val got = df.select(
        TextAnalysis.logTemplate(col("msg")).as("fast"),
        TextAnalysis.logTemplateRegex(col("msg")).as("spec"))
      .collect()
    got.foreach { r => assert(r.get(0) == r.get(1)) }
    assert(got.count(_.isNullAt(0)) == 1)
  }
}
