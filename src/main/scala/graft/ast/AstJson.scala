package graft.ast

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** JSON → AST decoder. Accepts the reference's query payload shape
  * (reference ASTUtils.scala:163-187 deserializer, :276-416 field decode,
  * ComputeFunction.scala:226-279 compute decode):
  *
  * {{{
  * {"baseExpressions": {"a": {
  *    "dataset": "logs",
  *    "limit": 1000, "order": "DESC",
  *    "filter": {"op":"and",
  *      "q1": {"k":"resource.container.name","v":["agent"],"op":"eq"},
  *      "q2": {"k":"_cardinalhq.message","v":["compressed"],"op":"contains"}},
  *    "extract": {"regex":"...", "fields":[{"name":"raw","type":"number"}]},
  *    "compute": {"labelName":"x","functionCall":{"name":"mul","args":[...]}},
  *    "chart": {"aggregation":"sum","groupBys":["_cardinalhq.level"]}
  *  }},
  *  "formulae": ["a / b"]}
  * }}}
  *
  * Binary clauses accept both named sub-objects (`q1`/`q2`) and the
  * reference's positional object-members form (any non-textual members of
  * the filter node are clauses, left-folded — ASTUtils.scala:379-404).
  */
object AstJson {
  private val mapper = new ObjectMapper()

  def parseAstInput(json: String): ASTInput = {
    val root = mapper.readTree(json)
    val baseExprs = Option(root.get("baseExpressions")).map { node =>
      node.properties().asScala.map { e =>
        e.getKey -> parseBaseExpr(e.getKey, e.getValue)
      }.toMap
    }.getOrElse(Map.empty[String, BaseExpr])
    val formulae = Option(root.get("formulae")).map {
      _.elements().asScala.map(_.textValue()).toList
    }.getOrElse(Nil)
    ASTInput(baseExprs, formulae)
  }

  def parseBaseExpr(json: String): BaseExpr = {
    val node = mapper.readTree(json)
    val id = Option(node.get("id")).map(_.textValue()).getOrElse("_")
    parseBaseExpr(id, node)
  }

  def parseBaseExpr(id: String, node: JsonNode): BaseExpr = {
    val filterNode = node.get("filter")
    require(filterNode != null, "No filter provided!")
    BaseExpr(
      id = id,
      // reference default is "metrics" (ASTUtils.scala:297 getOrElse) —
      // a payload omitting dataset must chart metrics with rollup
      // re-aggregation, not per-row log semantics
      dataset = str(node, "dataset").getOrElse("metrics"),
      filter = parseFilter(filterNode),
      extractor = obj(node, "extract").map(parseExtractor),
      compute = obj(node, "compute").map(parseCompute),
      chart = obj(node, "chart").map(parseChart),
      order = str(node, "order").getOrElse("DESC"),
      // a JSON null or textual value must fall back to the default, not
      // decode as 0 (NullNode/TextNode.intValue() == 0 → a silent
      // zero-row limit)
      limit = Option(node.get("limit")).filter(_.isNumber)
        .map(_.intValue()).getOrElse(1000),
      metricType = str(node, "metricType").getOrElse("gauge"),
      returnResults = Option(node.get("returnResults")).filter(_.isBoolean)
        .forall(_.booleanValue())
    )
  }

  def parseFilter(node: JsonNode): QueryClause = {
    Option(node.get("not")) match {
      case Some(embedded) => NotClause(parseFilter(embedded))
      case None =>
        if (node.get("k") != null) parseBasicFilter(node)
        else parseBinaryClause(node)
    }
  }

  private def parseBasicFilter(node: JsonNode): Filter = {
    val k = str(node, "k").getOrElse(
      throw new IllegalArgumentException("No `k` provided in filter!"))
    val op = str(node, "op").getOrElse(
      throw new IllegalArgumentException("No op provided for filter!"))
    // a scalar v decodes as a one-element list (elements() on a scalar
    // node is empty — it would otherwise become Nil and the error below
    // would claim no value was provided when one clearly was)
    val v = Option(node.get("v")).filterNot(_.isNull).map { n =>
      if (n.isArray) n.elements().asScala.map(_.asText()).toList
      else List(n.asText())
    }.getOrElse(Nil)
    if (v.isEmpty && op != Ops.EXISTS && op != Ops.HAS)
      throw new IllegalArgumentException(s"No value for key = $k provided in filter!")
    Filter(
      k = k, v = v, op = op,
      dataType = str(node, "dataType").getOrElse(DataTypes.STRING),
      extracted = Option(node.get("extracted")).exists(_.booleanValue()),
      computed = Option(node.get("computed")).exists(_.booleanValue())
    )
  }

  private def parseBinaryClause(node: JsonNode): QueryClause = {
    val op = str(node, "op").getOrElse(
      throw new IllegalArgumentException("No `op` provided in binary query clause!"))
    val clauses = node.properties().asScala.toList
      .filterNot(_.getKey == "op")
      .filterNot(_.getValue.isTextual)
      .map(e => parseFilter(e.getValue))
    require(clauses.size >= 2, "Atleast two clauses required in a binary clause!")
    clauses.reduceLeft((acc, c) => BinaryClause(acc, c, op))
  }

  /** `(?P<name>…)` (RE2, what the reference's re2j stage accepts) and
    * `(?<name>…)` (Java) named capture groups, in order. */
  private val NamedGroup = """\(\?P?<([a-zA-Z][a-zA-Z0-9]*)>""".r

  private def parseExtractor(node: JsonNode): Extractor = {
    val regex = reqText(node, "regex", "extractor")
    val fields = Option(node.get("fields")).filter(_.isArray) match {
      case Some(arr) =>
        arr.elements().asScala.map { f =>
          ExtractedField(reqText(f, "name", "extracted field"),
            reqText(f, "type", "extracted field"))
        }.toList
      case None =>
        // the reference derives names from the regex's named groups when
        // no explicit list is given (RegexpStage.scala:27-40); types
        // default to string — a number field still casts downstream via
        // an explicit fields list or a compute
        val derived = NamedGroup.findAllMatchIn(regex)
          .map(m => ExtractedField(m.group(1), "string")).toList
        if (derived.isEmpty)
          throw new IllegalArgumentException(
            s"extractor without a fields array or named groups: $node")
        derived
    }
    // java.util.regex rejects the RE2 `(?P<name>` spelling; rewrite it
    // only where it opens a named group (anchored to the group-name
    // grammar, so the contiguous text '(?P<' inside e.g. a character
    // class is left untouched)
    val normalized = """\(\?P<([a-zA-Z][a-zA-Z0-9]*)>""".r
      .replaceAllIn(regex, m => java.util.regex.Matcher.quoteReplacement(
        s"(?<${m.group(1)}>"))
    Extractor(regex = normalized, fields = fields)
  }

  private def parseChart(node: JsonNode): ChartOptions =
    ChartOptions(
      aggregation = str(node, "aggregation").getOrElse("sum"),
      groupBys = Option(node.get("groupBys")).filter(_.isArray)
        .map(_.elements().asScala.map(_.textValue()).toList).getOrElse(Nil),
      chartType = str(node, "type").getOrElse("count"),
      rollup = str(node, "rollup"),
      fieldName = str(node, "fieldName"),
      fieldType = str(node, "fieldType")
    )

  private def parseCompute(node: JsonNode): Compute =
    Compute(
      labelName = reqText(node, "labelName", "compute"),
      functionCall = parseFunctionCall(Option(node.get("functionCall"))
        .getOrElse(throw new IllegalArgumentException(
          s"compute without a functionCall: $node")))
    )

  def parseFunctionCall(node: JsonNode): FunctionCall = {
    // the reference payload key is "arguments" (ComputeFunction.scala:235);
    // "args" is kept as a shorthand alias
    val args = Option(node.get("arguments")).orElse(Option(node.get("args")))
      .map(_.elements().asScala.map(parseComputeArg).toList)
      .getOrElse(Nil)
    FunctionCall(reqText(node, "name", "functionCall"), args)
  }

  private def parseComputeArg(node: JsonNode): ComputeArg =
    str(node, "type").getOrElse("literal") match {
      case "label" =>
        LabelArg(reqText(node, "name", "label compute arg"),
          str(node, "dataType").getOrElse(DataTypes.STRING))
      case "functionCall" =>
        parseFunctionCall(if (node.has("functionCall")) node.get("functionCall") else node)
      case _ =>
        val v = node.get("value")
        require(v != null, // decode error, not an NPE (reference
          s"literal compute arg without a value: $node") // ComputeFunction.scala:261
        val dt = str(node, "dataType").getOrElse(
          if (v.isNumber) DataTypes.NUMBER else DataTypes.STRING)
        LiteralArg(v.asText(), dt)
    }

  private def str(node: JsonNode, field: String): Option[String] =
    Option(node.get(field)).filter(n => n.isTextual).map(_.textValue())

  /** Required textual field — a decode error naming the key, never an
    * NPE (the file-wide convention). */
  private def reqText(node: JsonNode, field: String, what: String): String =
    str(node, field).getOrElse(throw new IllegalArgumentException(
      s"$what without a `$field`: $node"))

  private def obj(node: JsonNode, field: String): Option[JsonNode] =
    Option(node.get(field)).filterNot(_.isNull)
}
