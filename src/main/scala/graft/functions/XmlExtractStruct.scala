package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass XML field extraction (the reference's `extract` stage
  * contract, reference Extractor.scala:21-22, applied to an XML dialect
  * the way RegexExtractStruct applies it to log lines).
  *
  * Spark's built-in `xpath_*` family instantiates a full `javax.xml`
  * DOM parse per row — correct, but a per-row constant ~100× what
  * attribute extraction needs (it was the slowest entry in the whole
  * round-6 bench at 147× the oracle). This expression is the
  * [[RegexExtractStruct]] play for XML: ONE forward byte-walk over the
  * document per row, no DOM, no allocation beyond the output fields.
  *
  * Contract: find the FIRST element named `elem` (document order — the
  * same element `/…/elem[1]`-style XPath attribute lookups resolve) and
  * return a struct with one string field per requested name:
  *   - a plain name `k`     → the value of attribute `k` on that element
  *   - the pseudo-name `#text` → the text content between the open tag
  *     and the next `<` (enough for leaf elements like `<e>42</e>`)
  * The whole struct is NULL when the element is absent; a missing
  * attribute is a NULL field (never "" — same typed-extraction contract
  * as RegexExtractStruct: "" would crash downstream ANSI casts and
  * falsely pass IS NOT NULL gates).
  *
  * The scanner understands the subset that telemetry payloads actually
  * use: single/double-quoted attributes, self-closing tags, `<!-- -->`
  * comments and `<![CDATA[…]]>` skipped, and the five predefined
  * entities plus `&#NNN;` / `&#xHH;` decoded in extracted values.
  * Malformed input degrades to null (never throws) — matching
  * `xpath_*`'s null-on-unparseable behavior closely enough for gated
  * pipelines while staying a total function.
  */
case class XmlExtractStruct(child: Expression, elem: String,
    fields: Seq[String])
    extends UnaryExpression with ComputeUnaryCodegen {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      if (elem.isEmpty || !elem.forall(c => c.isLetterOrDigit || c == '_' ||
          c == '-' || c == ':' || c == '.'))
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: '$elem' is not a valid XML element name")
      else if (fields.isEmpty)
        TypeCheckResult.TypeCheckFailure(s"$prettyName: no fields requested")
      else TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.sql}")
  }

  override def dataType: DataType =
    StructType(fields.map(f => StructField(f, StringType, nullable = true)))

  override def nullable: Boolean = true

  // resolved once per expression instance, not per row
  @transient private lazy val elemChars: Array[Char] = elem.toCharArray
  @transient private lazy val fieldNames: Array[String] = fields.toArray
  @transient private lazy val textIdx: Int = fields.indexOf("#text")

  override def compute(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val open = findElement(s)
    if (open < 0) return null
    val out = parseAt(s, open)
    if (out == null) null else new GenericInternalRow(out)
  }

  /** Parse the element whose `<` sits at `open` (the name is already
    * known to match): field values array, or null for malformed input.
    * Index-based so [[XmlExtractAll]] can walk a large document without
    * copying the tail per element. */
  private[functions] def parseAt(s: String, open: Int): Array[Any] = {
    val out = new Array[Any](fieldNames.length)
    // walk the tag body once: i sits just past "<elem"
    var i = open + 1 + elemChars.length
    val n = s.length
    var selfClosed = false
    var done = false
    while (!done && i < n) {
      val c = s.charAt(i)
      if (c == '>') { done = true; i += 1 }
      else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '>') {
        selfClosed = true; done = true; i += 2
      } else if (isSpace(c)) i += 1
      else {
        // attribute name
        val nameStart = i
        while (i < n && !isSpace(s.charAt(i)) && s.charAt(i) != '=' &&
          s.charAt(i) != '>' && s.charAt(i) != '/') i += 1
        val nameEnd = i
        while (i < n && isSpace(s.charAt(i))) i += 1
        if (i < n && s.charAt(i) == '=') {
          i += 1
          while (i < n && isSpace(s.charAt(i))) i += 1
          if (i < n && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
            val q = s.charAt(i); i += 1
            val valStart = i
            while (i < n && s.charAt(i) != q) i += 1
            if (i >= n) return null // unterminated quote → unparseable
            val fi = fieldIndexOf(s, nameStart, nameEnd)
            if (fi >= 0 && out(fi) == null)
              out(fi) = UTF8String.fromString(decode(s, valStart, i))
            i += 1
          } else return null // bare (unquoted) value → unparseable
        }
        // valueless attribute (HTML-style flag): skip, not extractable
      }
    }
    if (!done) return null // tag never closed → unparseable
    if (textIdx >= 0 && !selfClosed && out(textIdx) == null && i <= n) {
      val textStart = i
      while (i < n && s.charAt(i) != '<') i += 1
      out(textIdx) = UTF8String.fromString(decode(s, textStart, i))
    }
    out
  }

  /** Index of the first `<elem` whose name ends at a delimiter (space,
    * `/`, `>`), skipping comments, CDATA, PIs and non-matching tags —
    * one forward walk, no backtracking. Returns -1 when absent. */
  private def findElement(s: String): Int = {
    val n = s.length
    var i = 0
    while (i < n) {
      val lt = s.indexOf('<', i)
      if (lt < 0) return -1
      if (s.startsWith("<!--", lt)) {
        val end = s.indexOf("-->", lt + 4)
        if (end < 0) return -1
        i = end + 3
      } else if (s.startsWith("<![CDATA[", lt)) {
        val end = s.indexOf("]]>", lt + 9)
        if (end < 0) return -1
        i = end + 3
      } else if (matchesAt(s, lt + 1)) {
        val after = lt + 1 + elemChars.length
        if (after >= n) return -1
        val c = s.charAt(after)
        if (isSpace(c) || c == '>' || c == '/') return lt
        i = lt + 1
      } else i = lt + 1
    }
    -1
  }

  private def matchesAt(s: String, at: Int): Boolean = {
    if (at + elemChars.length > s.length) return false
    var j = 0
    while (j < elemChars.length) {
      if (s.charAt(at + j) != elemChars(j)) return false
      j += 1
    }
    true
  }

  private def fieldIndexOf(s: String, from: Int, to: Int): Int = {
    val len = to - from
    var fi = 0
    while (fi < fieldNames.length) {
      val f = fieldNames(fi)
      if (f.length == len && s.regionMatches(from, f, 0, len)) return fi
      fi += 1
    }
    -1
  }

  private def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'

  /** Entity-decode s[from, to). Fast path: no '&' → substring, zero
    * extra allocation. */
  private def decode(s: String, from: Int, to: Int): String = {
    val amp = s.indexOf('&', from)
    if (amp < 0 || amp >= to) return s.substring(from, to)
    val sb = new java.lang.StringBuilder(to - from)
    var i = from
    while (i < to) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi < to && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val rep: String = ent match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
              try String.valueOf(Character.toChars(
                Integer.parseInt(ent.substring(2), 16)))
              catch { case _: RuntimeException => null }
            case _ if ent.startsWith("#") =>
              try String.valueOf(Character.toChars(
                Integer.parseInt(ent.substring(1))))
              catch { case _: RuntimeException => null }
            case _ => null
          }
          if (rep != null) { sb.append(rep); i = semi + 1 }
          else { sb.append(c); i += 1 } // unknown entity → literal
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  override protected def withNewChildInternal(
      newChild: Expression): XmlExtractStruct = copy(child = newChild)

  override def prettyName: String = "xml_extract_struct"
}

object XmlExtractStruct {
  def apply(xml: Column, elem: String, fields: Seq[String]): Column =
    GraftColumnBridge.column(
      new XmlExtractStruct(GraftColumnBridge.expression(xml), elem, fields))
}
