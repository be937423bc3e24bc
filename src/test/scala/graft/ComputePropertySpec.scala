package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.ast.{ComputeArg, DataTypes => GDataTypes, FunctionCall, LabelArg, LiteralArg}
import graft.compile.ComputeCompiler

/** Property test: the compute compiler agrees with an independent scalar
  * evaluator on random function-call trees (mul/add n-ary, div/sub binary,
  * numeric labels through try-cast) over random string rows. Null
  * propagates through every arithmetic op (SQL semantics; the reference's
  * NaN-on-garbage maps to null via try_cast). */
class ComputePropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val cols = Vector("a", "b", "c")
  private val schema = StructType(cols.map(c => StructField(c, StringType)))

  // cell values: numerics, garbage, null handled via Gen.option
  private val cellGen: Gen[String] = Gen.oneOf(
    Gen.chooseNum(-20, 20).map(_.toString),
    Gen.chooseNum(0.25, 8.0).map(d => (math.round(d * 4) / 4.0).toString),
    Gen.const("garbage"))

  private val rowGen: Gen[Map[String, String]] =
    Gen.sequence[Map[String, String], (String, String)](
      cols.map(c => Gen.option(cellGen).map(v => c -> v.orNull)))

  private val numericArg: Gen[ComputeArg] = Gen.oneOf(
    Gen.oneOf(cols).map(c => LabelArg(c, GDataTypes.NUMBER)),
    Gen.chooseNum(-5.0, 5.0).map(d =>
      LiteralArg((math.round(d * 4) / 4.0).toString, GDataTypes.NUMBER)))

  private def callGen(depth: Int): Gen[FunctionCall] = {
    val arg: Gen[ComputeArg] =
      if (depth == 0) numericArg
      else Gen.frequency(3 -> numericArg, 1 -> callGen(depth - 1))
    for {
      name <- Gen.oneOf("mul", "add", "div", "sub")
      n <- if (name == "div" || name == "sub") Gen.const(2) else Gen.choose(2, 3)
      args <- Gen.listOfN(n, arg)
    } yield FunctionCall(name, args)
  }

  // ---------------------------------------------------- reference evaluator

  private def evalArg(a: ComputeArg, row: Map[String, String]): Option[Double] =
    a match {
      case LabelArg(name, _) =>
        Option(row.getOrElse(name, null)).flatMap(s =>
          try Some(s.trim.toDouble) catch { case _: Exception => None })
      case LiteralArg(v, _) => Some(v.toDouble)
      case fc: FunctionCall => evalCall(fc, row)
    }

  private def evalCall(fc: FunctionCall, row: Map[String, String]): Option[Double] = {
    val args = fc.args.map(evalArg(_, row))
    if (args.exists(_.isEmpty)) None
    else {
      val vs = args.map(_.get)
      fc.name match {
        case "mul" => Some(vs.reduceLeft(_ * _))
        case "add" => Some(vs.reduceLeft(_ + _))
        case "sub" => Some(vs.head - vs(1))
        case "div" =>
          // null on zero divisor — DuckDB `/` semantics, matched by the
          // compiler's try_divide
          if (vs(1) == 0.0) None else Some(vs.head / vs(1))
      }
    }
  }

  private def sample[A](g: Gen[A], seed: Long): A =
    g(Gen.Parameters.default, Seed(seed)).get

  test("compute compiler ≡ reference evaluator on random trees × rows") {
    val rowMaps = (0 until 30).map(i => sample(rowGen, 2000L + i)).toList
    val rows = rowMaps.zipWithIndex.map { case (m, i) =>
      Row.fromSeq(i.toString +: cols.map(m.getOrElse(_, null)))
    }
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      StructType(StructField("_id", StringType) +: schema.fields)).cache()
    for (t <- 0 until 40) {
      val call = sample(callGen(2), 9000L + t)
      val got = df.select(df.col("_id"), ComputeCompiler.compile(call).as("v"))
        .collect().map(r => r.getString(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      rowMaps.zipWithIndex.foreach { case (m, i) =>
        val want = evalCall(call, m)
        val g = got(i.toString)
        val same = (g, want) match {
          case (Some(x), Some(y)) =>
            (x.isNaN && y.isNaN) || x == y ||
              math.abs(x - y) <= 1e-9 * math.max(math.abs(x), math.abs(y))
          case (a, b) => a == b
        }
        assert(same, s"call=$call row=$m got=$g want=$want")
      }
    }
    df.unpersist()
  }
}
