package graft

/** Shared JSON string escaping for the driver-facing artifact writers
  * (Verify / RunOne / Bench). One implementation: backslash, quote, and
  * ALL control chars (< 0x20) — a tab, CR, or ANSI escape in
  * builder-authored SQL or a Spark error message would otherwise make
  * the driver's strict json.load fail and zero the round's record. */
object JsonOut {
  def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def obj(entries: Iterable[(String, String)], quoteValues: Boolean): String =
    entries.map { case (k, v) =>
      s"${q(k)}:${if (quoteValues) q(v) else v}"
    }.mkString("{", ",", "}")
}
