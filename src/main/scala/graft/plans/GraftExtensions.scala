package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions._

/** SparkSessionExtensions registration: every graft custom expression and
  * aggregate as a SQL function, so `spark.sql("SELECT graft_cosine(a, b)")`
  * works anywhere the DataFrame helpers do. Activate with
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)
  *     // or spark.sql.extensions=graft.plans.GraftExtensions
  *
  * This is the idiomatic packaging for a Spark-native library: no fork, no
  * session hijack — the extension injects into the session's function
  * registry at build time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => UnwrapScaledComparison)
    GraftExtensions.functions.foreach { case (name, (info, builder)) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
  }
}

object GraftExtensions {

  /** Register every graft function into an already-running session
    * (extensions only bind at session build; this covers getOrCreate
    * reuse, REPLs, and shared test sessions). Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    UnwrapScaledComparison.install(spark)
    functions.foreach { case (name, (i, b)) =>
      org.apache.spark.sql.GraftColumnBridge.registerFunction(spark, name, i, b)
    }
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  /** Evaluate a parameter argument that must be a compile-time constant
    * — any foldable expression qualifies (0.5 + 0.45 included), and a
    * column reference gets a proper analysis-style error instead of a
    * ClassCastException. */
  private def const(e: Expression, what: String): Any = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$what must be a constant, got: ${e.sql}")
    val v = e.eval()
    if (v == null)
      throw new IllegalArgumentException(s"$what must not be null")
    v
  }

  private def str(e: Expression): String = const(e, "argument").toString

  private def int(e: Expression): Int = const(e, "argument").toString.toInt

  private def dbl(e: Expression): Double =
    const(e, "argument").toString.toDouble

  val functions: Seq[(String, (ExpressionInfo, FunctionBuilder))] = Seq(
    "graft_minhash" -> ((
      info("graft_minhash", "_FUNC_(set, numHashes) - MinHash signature of a string/long array."),
      (args: Seq[Expression]) => MinHashSignature(args.head, int(args(1))))),
    "graft_simhash" -> ((
      info("graft_simhash", "_FUNC_(tokens) - 64-bit SimHash of a token array."),
      (args: Seq[Expression]) => SimHash64(args.head))),
    "graft_word_shingles" -> ((
      info("graft_word_shingles", "_FUNC_(tokens, w) - distinct hashed word w-shingles."),
      (args: Seq[Expression]) => WordShingleHashes(args.head, int(args(1))))),
    "graft_char_ngrams" -> ((
      info("graft_char_ngrams", "_FUNC_(text, n) - distinct hashed char n-grams."),
      (args: Seq[Expression]) => CharNgramHashes(args.head, int(args(1))))),
    "graft_dot" -> ((
      info("graft_dot", "_FUNC_(a, b) - dot product of two numeric arrays."),
      (args: Seq[Expression]) => DotProduct(args.head, args(1)))),
    "graft_cosine" -> ((
      info("graft_cosine", "_FUNC_(a, b) - cosine similarity of two numeric arrays."),
      (args: Seq[Expression]) => CosineSimilarity(args.head, args(1)))),
    "graft_byte_entropy" -> ((
      info("graft_byte_entropy",
        "_FUNC_(payload) - Shannon entropy (bits/byte) of a binary column."),
      (args: Seq[Expression]) => ByteEntropyExpr(args.head))),
    "graft_regex_extract_struct" -> ((
      info("graft_regex_extract_struct",
        "_FUNC_(msg, regex, f1, f2, ...) - single-pass multi-group extraction to a struct."),
      (args: Seq[Expression]) =>
        RegexExtractStruct(args.head, str(args(1)), args.drop(2).map(str)))),
    "graft_xml_extract_struct" -> ((
      info("graft_xml_extract_struct",
        "_FUNC_(xml, elem, f1, f2, ...) - single-pass XML attribute/#text extraction to a struct (no DOM)."),
      (args: Seq[Expression]) =>
        XmlExtractStruct(args.head, str(args(1)), args.drop(2).map(str)))),
    "graft_rolling_hash_windows" -> ((
      info("graft_rolling_hash_windows",
        "_FUNC_(text, w) - all stride-1 w-char window hashes in one O(len) walk (Rabin-Karp)."),
      (args: Seq[Expression]) =>
        RollingHashWindows(args.head, int(args(1))))),
    "ddsketch" -> ((
      info("ddsketch", "_FUNC_(col) - mergeable DDSketch (binary), relative accuracy 0.01."),
      (args: Seq[Expression]) => DDSketchAgg(args.head).toAggregateExpression())),
    "ddsketch_quantile" -> ((
      info("ddsketch_quantile", "_FUNC_(col, q) - DDSketch quantile with 1% relative error."),
      (args: Seq[Expression]) =>
        DDSketchQuantile(args.head, dbl(args(1))).toAggregateExpression())),
    "ddsketch_quantile_of" -> ((
      info("ddsketch_quantile_of", "_FUNC_(sketch, q) - quantile of a serialized DDSketch."),
      (args: Seq[Expression]) => DDSketchQuantileOf(args.head, args(1)))),
    "hll_estimate" -> ((
      info("hll_estimate", "_FUNC_(col) - HLL distinct estimate (lgK=12, ~1.6% sigma)."),
      (args: Seq[Expression]) => HllEstimate(args.head).toAggregateExpression())),
    "hll_sketch" -> ((
      info("hll_sketch", "_FUNC_(col) - mergeable HLL sketch (binary)."),
      (args: Seq[Expression]) => HllAgg(args.head).toAggregateExpression())),
    "hll_estimate_of" -> ((
      info("hll_estimate_of", "_FUNC_(sketch) - estimate from a serialized HLL sketch."),
      (args: Seq[Expression]) => HllEstimateOf(args.head))),
    // ---- reference-interop sketch payloads (SketchInterop.scala) ----
    "graft_dd_proto" -> ((
      info("graft_dd_proto", "_FUNC_(col) - DDSketch as the reference's protobuf payload."),
      (args: Seq[Expression]) => DdProtoSketchAgg(args.head).toAggregateExpression())),
    "graft_dd_proto_merge" -> ((
      info("graft_dd_proto_merge", "_FUNC_(sketch) - merge serialized DDSketch proto payloads."),
      (args: Seq[Expression]) => DdProtoMergeAgg(args.head).toAggregateExpression())),
    "graft_dd_proto_quantile" -> ((
      info("graft_dd_proto_quantile", "_FUNC_(sketch, q) - quantile of a DDSketch proto payload."),
      (args: Seq[Expression]) => DdProtoQuantileOf(args.head, args(1)))),
    "graft_dd_proto_stat" -> ((
      info("graft_dd_proto_stat", "_FUNC_(sketch, stat) - count/sum/min/max/avg of a DDSketch proto payload."),
      (args: Seq[Expression]) => DdProtoStatOf(args.head, str(args(1))))),
    "graft_dd_to_proto" -> ((
      info("graft_dd_to_proto", "_FUNC_(sketch) - native DDSketch bytes to proto payload."),
      (args: Seq[Expression]) => DdToProto(args.head))),
    "graft_dd_from_proto" -> ((
      info("graft_dd_from_proto", "_FUNC_(sketch) - proto payload to native DDSketch bytes."),
      (args: Seq[Expression]) => DdFromProto(args.head))),
    "graft_hll_compat" -> ((
      info("graft_hll_compat", "_FUNC_(col) - DataSketches HLL_4 compact image (reference byte format)."),
      (args: Seq[Expression]) => DsHllAgg(args.head).toAggregateExpression())),
    "graft_hll_compat_union" -> ((
      info("graft_hll_compat_union", "_FUNC_(sketch) - union serialized DataSketches HLL images."),
      (args: Seq[Expression]) => DsHllUnionAgg(args.head).toAggregateExpression())),
    "graft_hll_compat_estimate" -> ((
      info("graft_hll_compat_estimate", "_FUNC_(sketch) - estimate from a DataSketches HLL image."),
      (args: Seq[Expression]) => DsHllEstimateOf(args.head))),
    // ---- theta set-operation sketches (ThetaSketch.scala) ----
    "graft_theta" -> ((
      info("graft_theta", "_FUNC_(col) - mergeable theta sketch (binary, lgK=12)."),
      (args: Seq[Expression]) => ThetaAgg(args.head).toAggregateExpression())),
    "graft_theta_union" -> ((
      info("graft_theta_union", "_FUNC_(sketch) - union serialized theta sketches."),
      (args: Seq[Expression]) => ThetaUnionAgg(args.head).toAggregateExpression())),
    "graft_theta_estimate" -> ((
      info("graft_theta_estimate", "_FUNC_(sketch) - distinct estimate of a theta sketch."),
      (args: Seq[Expression]) => ThetaEstimateOf(args.head))),
    "graft_theta_intersect" -> ((
      info("graft_theta_intersect", "_FUNC_(a, b) - |A INTERSECT B| estimate from two theta sketches."),
      (args: Seq[Expression]) => ThetaSetOpEstimate(args.head, args(1), intersect = true))),
    "graft_theta_diff" -> ((
      info("graft_theta_diff", "_FUNC_(a, b) - |A EXCEPT B| estimate from two theta sketches."),
      (args: Seq[Expression]) => ThetaSetOpEstimate(args.head, args(1), intersect = false))),
    // ---- int8 embedding quantization (QuantExpressions.scala) ----
    "graft_int8_quantize" -> ((
      info("graft_int8_quantize", "_FUNC_(vec) - int8 scalar quantization: struct(q binary, scale double)."),
      (args: Seq[Expression]) => Int8Quantize(args.head))),
    "graft_int8_cosine" -> ((
      info("graft_int8_cosine", "_FUNC_(a, b) - cosine of two int8 code vectors (scales cancel)."),
      (args: Seq[Expression]) => Int8Cosine(args.head, args(1))))
  )
}
