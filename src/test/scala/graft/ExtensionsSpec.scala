package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  // getOrCreate reuses the shared test session, so register into its
  // function registry directly (the extension class and register() share
  // one function list — same registration either way).
  lazy val spark: SparkSession = {
    val s = SparkTestSession.spark
    graft.plans.GraftExtensions.register(s)
    s
  }

  test("graft functions callable from SQL") {
    val r = spark.sql(
      """SELECT
        |  graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
        |  graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |  size(graft_minhash(array('a', 'b', 'c'), 16)) AS m,
        |  graft_simhash(array('hello', 'world')) AS sh,
        |  size(graft_char_ngrams('hello world', 3)) AS ng,
        |  graft_regex_extract_struct('lat=12 lon=34',
        |    'lat=(\\d+) lon=(\\d+)', 'lat', 'lon').lat AS lat,
        |  graft_byte_entropy(cast('aabb' AS BINARY)) AS ent
        |""".stripMargin).head()
    assert(math.abs(r.getAs[Double]("c") - 1.0) < 1e-12)
    assert(r.getAs[Double]("d") == 11.0)
    assert(r.getAs[Int]("m") == 16)
    assert(r.getAs[Int]("ng") == 9) // 11 chars → 9 distinct trigrams
    assert(r.getAs[String]("lat") == "12")
    assert(math.abs(r.getAs[Double]("ent") - 1.0) < 1e-12) // 2 symbols 50/50
  }

  test("xml extraction and rolling-hash windows callable from SQL") {
    val r = spark.sql(
      """SELECT
        |  graft_xml_extract_struct('<e k="42">hi</e>', 'e', 'k', '#text') AS x,
        |  graft_rolling_hash_windows('abcdef', 3) AS h,
        |  graft_rolling_hash_windows('xxabcdexx', 3) AS h2
        |""".stripMargin).head()
    val x = r.getStruct(0)
    assert(x.getAs[String]("k") == "42" && x.getAs[String]("#text") == "hi")
    val h = r.getSeq[Long](1)
    assert(h.length == 4)
    // the same 3-char windows (abc, bcd, cde) hash identically wherever
    // they occur in a string
    val h2 = r.getSeq[Long](2)
    assert(h2.slice(2, 5) == h.take(3))
  }

  test("binary-returning scalars survive whole-stage codegen (unbox byte[])") {
    import spark.implicits._
    Seq(1.0, 2.0, 3.0).toDF("v").createOrReplaceTempView("bc_vals")
    // the outer projection over the aggregate output runs in whole-stage
    // codegen: ComputeCodegen.unbox must handle BinaryType
    val p = spark.sql(
      """SELECT graft_dd_to_proto(sk) AS p FROM
        |  (SELECT ddsketch(v) AS sk FROM bc_vals)""".stripMargin)
      .head().getAs[Array[Byte]](0)
    assert(p.nonEmpty)
    val q = spark.sql(
      s"""SELECT graft_dd_proto_quantile(graft_dd_to_proto(sk), 0.5d) FROM
         |  (SELECT ddsketch(v) AS sk FROM bc_vals)""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(q - 2.0) <= 2.0 * 0.011)
  }

  test("ddsketch SQL aggregate matches the DataFrame form") {
    import spark.implicits._
    Seq(1.0, 2.0, 3.0, 4.0, 100.0).toDF("v").createOrReplaceTempView("vals")
    val sqlQ = spark.sql(
      "SELECT ddsketch_quantile(v, 0.5d) AS p50 FROM vals").head().getDouble(0)
    assert(math.abs(sqlQ - 3.0) <= 0.03 + 1e-9)
    val viaSketch = spark.sql(
      "SELECT ddsketch_quantile_of(ddsketch(v), 0.5d) FROM vals")
      .head().getDouble(0)
    assert(viaSketch == sqlQ)
  }
  test("theta and int8 SQL functions work end-to-end") {
    import spark.implicits._
    (0 until 100).map(i => ("a", i.toLong)).toDF("g", "v")
      .createOrReplaceTempView("theta_vals")
    val est = spark.sql(
      """SELECT graft_theta_estimate(graft_theta(v)) AS e,
        |  graft_theta_intersect(graft_theta(v),
        |    graft_theta(v % 50)) AS i
        |FROM theta_vals""".stripMargin).head()
    assert(est.getDouble(0) === 100.0)
    assert(est.getDouble(1) === 50.0)
    val cos = spark.sql(
      """SELECT graft_int8_cosine(
        |  graft_int8_quantize(array(1.0F, 0.0F, 1.0F)).q,
        |  graft_int8_quantize(array(1.0F, 0.0F, 1.0F)).q) AS c""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-9)
  }
}
