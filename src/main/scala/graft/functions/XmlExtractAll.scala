package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** EVERY occurrence of an attribute (or `#text`) across all elements
  * named `elem`, in document order — the list semantics of Spark's
  * `xpath(xml, '//elem/@attr')` built-in, as one forward byte-walk per
  * row instead of a per-row DOM ([[XmlExtractStruct]] is the
  * first-match variant; same scanner subset: quoted attributes,
  * self-closing tags, comments/CDATA skipped, entities decoded).
  *
  * Elements where the attribute is absent contribute NOTHING (matching
  * `xpath`'s node-set semantics — an absent node is not an empty
  * string). Malformed XML → null array, same degradation contract as
  * XmlExtractStruct. Result: `array<string>`, empty when the element
  * never occurs.
  */
case class XmlExtractAll(child: Expression, elem: String, field: String)
    extends UnaryExpression with ComputeUnaryCodegen {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      if (elem.isEmpty || !elem.forall(c => c.isLetterOrDigit || c == '_' ||
          c == '-' || c == ':' || c == '.'))
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: '$elem' is not a valid XML element name")
      else TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  @transient private lazy val probe = XmlExtractStruct(child, elem,
    Seq(field))

  override def compute(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer[UTF8String]()
    val n = s.length
    var i = 0
    while (i < n) {
      val lt = s.indexOf('<', i)
      if (lt < 0) return new GenericArrayData(out.toArray[Any])
      if (s.startsWith("<!--", lt)) {
        val end = s.indexOf("-->", lt + 4)
        if (end < 0) return new GenericArrayData(out.toArray[Any])
        i = end + 3
      } else if (s.startsWith("<![CDATA[", lt)) {
        val end = s.indexOf("]]>", lt + 9)
        if (end < 0) return new GenericArrayData(out.toArray[Any])
        i = end + 3
      } else if (nameMatches(s, lt + 1)) {
        // delegate the single-element parse to the struct scanner's
        // index-based walker — same attribute/entity/tag semantics, one
        // code path to keep correct, and no tail copy per element
        val vals = probe.parseAt(s, lt)
        if (vals == null) return null // malformed tag → null array
        val v = vals(0)
        if (v != null) out += v.asInstanceOf[UTF8String]
        // advance past this tag's closing '>', honoring quoted attribute
        // values (a '>' inside quotes does not close the tag)
        val end = tagEnd(s, lt + 1)
        if (end < 0) return null
        i = end + 1
      } else i = lt + 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  private def tagEnd(s: String, from: Int): Int = {
    var i = from
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '"' || c == '\'') {
        val q = s.indexOf(c, i + 1)
        if (q < 0) return -1
        i = q + 1
      } else if (c == '>') return i
      else i += 1
    }
    -1
  }

  private def nameMatches(s: String, at: Int): Boolean = {
    if (at + elem.length > s.length) return false
    var j = 0
    while (j < elem.length) {
      if (s.charAt(at + j) != elem.charAt(j)) return false
      j += 1
    }
    val after = at + elem.length
    after < s.length && {
      val c = s.charAt(after)
      c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '>' || c == '/'
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): XmlExtractAll = copy(child = newChild)

  override def prettyName: String = "xml_extract_all"
}

object XmlExtractAll {
  def apply(xml: Column, elem: String, field: String): Column =
    GraftColumnBridge.column(
      new XmlExtractAll(GraftColumnBridge.expression(xml), elem, field))
}
