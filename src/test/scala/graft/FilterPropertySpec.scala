package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.ast.{BinaryClause, DataTypes => GDataTypes, Filter, NotClause, Ops, QueryClause}
import graft.compile.FilterCompiler

/** Property test: the filter compiler agrees with an independent
  * in-memory reference evaluator on random predicate trees over random
  * rows (SURVEY.md §5: "ScalaCheck property tests for filter-compiler
  * equivalence"). The reference evaluator re-implements the documented
  * semantics directly (string compare, try-cast numeric compare,
  * case-insensitive regex/contains, missing column → false, tri-state
  * and/or/not with null-row handling collapsed to false).
  */
class FilterPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val cols = Vector("a", "b", "c") // "m" is intentionally absent
  private val schema = StructType(cols.map(c => StructField(c, StringType)))

  private val valueGen: Gen[String] = Gen.oneOf(
    Gen.oneOf("x", "y", "foo", "Foo", "bar baz", ""),
    Gen.chooseNum(-50, 150).map(_.toString),
    Gen.chooseNum(0.5, 99.5).map(d => f"$d%.1f"))

  private val fieldGen: Gen[String] = Gen.oneOf(cols :+ "m")

  private val numericGen: Gen[String] = Gen.oneOf(
    Gen.chooseNum(-50, 150).map(_.toString),
    Gen.chooseNum(0.5, 99.5).map(d => f"$d%.1f"))

  private val leafGen: Gen[QueryClause] = for {
    k <- fieldGen
    op <- Gen.oneOf(Ops.EQ, Ops.NOT_EQUALS, Ops.IN, Ops.NOT_IN, Ops.GT,
      Ops.GE, Ops.LT, Ops.LE, Ops.CONTAINS, Ops.HAS)
    isCmp = Set(Ops.GT, Ops.GE, Ops.LT, Ops.LE).contains(op)
    // comparison literals must parse as quantities (the compiler, like the
    // reference's QuantityParser, rejects non-numeric cmp literals at plan
    // time)
    v <- if (isCmp) numericGen else valueGen
    v2 <- if (isCmp) numericGen else valueGen
    dt = if (isCmp) GDataTypes.NUMBER else GDataTypes.STRING
  } yield Filter(k, List(v, v2).take(if (op == Ops.IN || op == Ops.NOT_IN) 2 else 1), op, dt)

  private def treeGen(depth: Int): Gen[QueryClause] =
    if (depth == 0) leafGen
    else Gen.frequency(
      3 -> leafGen,
      2 -> (for {
        l <- treeGen(depth - 1); r <- treeGen(depth - 1)
        op <- Gen.oneOf("and", "or")
      } yield BinaryClause(l, r, op)),
      1 -> treeGen(depth - 1).map(NotClause(_)))

  private val rowGen: Gen[Map[String, String]] = Gen.sequence[Map[String, String], (String, String)](
    cols.map(c => Gen.option(valueGen).map(v => c -> v.orNull)))

  // ------------------------------------------------- reference evaluator

  /** Tri-state boolean, SQL-style: None = NULL. */
  private def eval(clause: QueryClause, row: Map[String, String]): Option[Boolean] =
    clause match {
      case NotClause(q) => eval(q, row).map(!_)
      case BinaryClause(l, r, "and") => (eval(l, row), eval(r, row)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      case BinaryClause(l, r, _) => (eval(l, row), eval(r, row)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      case Filter(k, vs, op, dt, _, _) =>
        if (!row.contains(k)) return Some(false) // missing column folds to false
        val x = row(k)
        def num(s: String): Option[Double] =
          try Some(s.trim.toDouble) catch { case _: Exception => None }
        op match {
          case Ops.HAS | Ops.EXISTS => Some(x != null)
          case _ if x == null => None
          case Ops.EQ => Some(x == vs.head)
          case Ops.NOT_EQUALS => Some(x != vs.head)
          case Ops.IN => Some(vs.contains(x))
          case Ops.NOT_IN => Some(!vs.contains(x))
          case Ops.CONTAINS => Some(x.toLowerCase.contains(vs.head.toLowerCase))
          case Ops.GT | Ops.GE | Ops.LT | Ops.LE =>
            (num(x), num(vs.head)) match {
              case (Some(a), Some(b)) => Some(op match {
                case Ops.GT => a > b
                case Ops.GE => a >= b
                case Ops.LT => a < b
                case Ops.LE => a <= b
              })
              case _ => None // try_cast null → comparison null
            }
        }
    }

  /** Deterministic sampling: scalacheck Gen driven by a fixed seed (the
    * scalatest/scalacheck bridge artifact isn't in the offline cache). */
  private def sample[A](g: Gen[A], seed: Long): A =
    g(Gen.Parameters.default, Seed(seed)).get

  test("filter compiler ≡ reference evaluator on random trees × rows") {
    // one DataFrame of many random rows, checked against 60 random trees —
    // one Spark job per tree keeps the property test fast
    val rowMaps = (0 until 40).map(i => sample(rowGen, 1000L + i)).toList
    val rows = rowMaps.zipWithIndex.map { case (m, i) =>
      Row.fromSeq(i.toString +: cols.map(m.getOrElse(_, null)))
    }
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      StructType(StructField("_id", StringType) +: schema.fields)).cache()
    for (t <- 0 until 60) {
      val clause = sample(treeGen(3), 5000L + t)
      val got = df
        .where(FilterCompiler.compile(clause, df.columns.toSet))
        .select("_id").collect().map(_.getString(0)).toSet
      val want = rowMaps.zipWithIndex.collect {
        case (m, i) if eval(clause, m).contains(true) => i.toString
      }.toSet
      assert(got == want,
        s"clause=${clause.show}\ngot=$got want=$want")
    }
    df.unpersist()
  }
}
