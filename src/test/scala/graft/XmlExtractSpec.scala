package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.XmlExtractStruct

class XmlExtractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def one(xml: String, elem: String, fields: String*): Seq[String] = {
    val r = Seq(xml).toDF("x")
      .select(XmlExtractStruct(col("x"), elem, fields).as("s"))
      .head()
    if (r.isNullAt(0)) null
    else fields.indices.map(i => r.getStruct(0).getAs[String](i))
  }

  test("attribute extraction, first matching element wins") {
    assert(one("""<e k="42"/>""", "e", "k") === Seq("42"))
    assert(one("""<r><e k="1" j="a"/><e k="2"/></r>""", "e", "k", "j") ===
      Seq("1", "a"))
    // single quotes, whitespace around =, attribute order independent
    assert(one("""<e  j = 'x'   k="7" >t</e>""", "e", "k", "j") ===
      Seq("7", "x"))
  }

  test("#text pseudo-field and missing attr → null field") {
    assert(one("""<e k="1">hello</e>""", "e", "k", "#text") ===
      Seq("1", "hello"))
    assert(one("""<e k="1"/>""", "e", "k", "missing") === Seq("1", null))
    // self-closing tag has no text
    assert(one("""<e k="1"/>""", "e", "#text") === Seq(null))
  }

  test("element name must end at a delimiter (no prefix-match)") {
    assert(one("""<ee k="1"/>""", "e", "k") === null)
    assert(one("""<ee k="1"/><e k="2"/>""", "e", "k") === Seq("2"))
  }

  test("comments and CDATA are skipped, entities decoded") {
    assert(one("""<!-- <e k="0"/> --><e k="1"/>""", "e", "k") === Seq("1"))
    assert(one("""<![CDATA[<e k="0"/>]]><e k="1"/>""", "e", "k") === Seq("1"))
    assert(one("""<e k="a&amp;b &lt;&gt; &quot;&apos; &#65;&#x42;"/>""",
      "e", "k") === Seq("a&b <> \"' AB"))
    // unknown entity stays literal (xpath decodes only the defined ones)
    assert(one("""<e>5 &unknown; 6</e>""", "e", "#text") ===
      Seq("5 &unknown; 6"))
  }

  test("malformed input degrades to null, never throws") {
    assert(one("""<e k="unterminated""", "e", "k") === null)
    assert(one("""<e k=bare/>""", "e", "k") === null)
    assert(one("""<e k="1" """, "e", "k") === null) // tag never closed
    assert(one("no xml at all", "e", "k") === null)
    assert(one("", "e", "k") === null)
  }

  test("agrees with xpath_string/xpath_long on generated documents") {
    val docs = (0 until 500).map { i =>
      val pad = if (i % 3 == 0) s"<!-- c$i -->" else ""
      s"""$pad<root a="x$i"><e k="${i * 7}" j='v$i'>${i + 1}</e></root>"""
    }
    val df = docs.toDF("x").select(
      col("x"),
      XmlExtractStruct(col("x"), "e", Seq("k", "j", "#text")).as("s"),
      xpath_long(col("x"), lit("//e/@k")).as("xk"),
      xpath_string(col("x"), lit("//e/@j")).as("xj"),
      xpath_long(col("x"), lit("//e")).as("xt"))
    df.collect().foreach { r =>
      assert(r.getStruct(1).getAs[String]("k").toLong === r.getLong(2))
      assert(r.getStruct(1).getAs[String]("j") === r.getString(3))
      assert(r.getStruct(1).getAs[String]("#text").toLong === r.getLong(4))
    }
  }

  private def all(xml: String, elem: String, field: String): Seq[String] = {
    val r = Seq(xml).toDF("x")
      .select(graft.functions.XmlExtractAll(col("x"), elem, field).as("a"))
      .head()
    if (r.isNullAt(0)) null else r.getSeq[String](0)
  }

  test("XmlExtractAll collects every occurrence in document order, " +
    "skipping elements lacking the field") {
    assert(all("""<r><e k="1"/><e j="x"/><e k="2">t</e></r>""", "e", "k") ===
      Seq("1", "2"))
    assert(all("""<e>a</e><e/><e>b</e>""", "e", "#text") === Seq("a", "b"))
    assert(all("no xml", "e", "k") === Seq.empty)
    // a '>' inside a quoted attribute must not close the tag early
    assert(all("""<e k="a&gt;b"/><e k="c>d"/><e k="2"/>""", "e", "k") ===
      Seq("a>b", "c>d", "2"))
    // comments/CDATA skipped; prefix names don't match
    assert(all("""<!--<e k="0"/>--><ee k="9"/><e k="1"/>""", "e", "k") ===
      Seq("1"))
    // malformed tag anywhere → null (same contract as the struct form)
    assert(all("""<e k="1"/><e k=bare/>""", "e", "k") === null)
  }

  test("XmlExtractAll agrees with the xpath built-in on generated docs") {
    val docs = (0 until 300).map { i =>
      s"""<r><e k="$i"/><e k="${i * 2}"/>${if (i % 2 == 0) """<e j="n"/>"""
        else ""}</r>"""
    }
    val df = docs.toDF("x").select(
      graft.functions.XmlExtractAll(col("x"), "e", "k").as("mine"),
      xpath(col("x"), lit("//e/@k")).as("theirs"))
    df.collect().foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
    }
  }

  test("survives whole-stage codegen in a filtered aggregate") {
    val n = (1 to 1000).map(i => s"""<e k="$i"/>""").toDF("x")
      .select(XmlExtractStruct(col("x"), "e", Seq("k"))
        .getField("k").cast("long").as("k"))
      .where(col("k") % 2 === 0)
      .agg(sum("k")).head().getLong(0)
    assert(n === (2 to 1000 by 2).map(_.toLong).sum)
  }
}
