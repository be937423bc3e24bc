package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PiiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def redact(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t")
      .select(graft.operators.TextAnalysis.redactPii(col("t")).as("r"))
      .collect().head.getString(0)
  }

  test("each PII class is masked with its own tag") {
    assert(redact("mail a.b+c@sub.example.org now") === "mail [EMAIL] now")
    assert(redact("from 192.168.0.1 port 80") === "from [IP] port 80")
    assert(redact("ssn 123-45-6789.") === "ssn [SSN].")
    assert(redact("call 555-867-5309!") === "call [PHONE]!")
  }

  test("all classes in one document; every occurrence replaced") {
    val in = "a@b.co or c@d.io at 10.0.0.1 and 10.0.0.2 ssn 111-22-3333 " +
      "tel 222-333-4444 tel 222-333-4445"
    assert(redact(in) ===
      "[EMAIL] or [EMAIL] at [IP] and [IP] ssn [SSN] tel [PHONE] tel [PHONE]")
  }

  test("clean text is unchanged; lookalikes are not over-matched") {
    val clean = "version 1.2 costs 12-34 dollars for 12345-678 units"
    assert(redact(clean) === clean)
  }

  test("piiCounts counts matches per class") {
    import spark.implicits._
    val row = Seq("a@b.co 10.0.0.1 111-22-3333 222-333-4444 c@d.io")
      .toDF("t")
      .select(graft.operators.TextAnalysis.piiCounts(col("t")).as("c"))
      .select("c.n_email", "c.n_ip", "c.n_ssn", "c.n_phone")
      .collect().head
    assert((row.getInt(0), row.getInt(1), row.getInt(2), row.getInt(3))
      === ((2, 1, 1, 1)))
  }
}
