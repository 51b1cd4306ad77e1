package graft

/** Minimal JSON string escaping shared by the driver-contract mains:
  * backslash, quote, and ALL control chars (<0x20) — an unescaped tab
  * or quote in builder-authored SQL or an env-provided path would make
  * the driver's json.load fail and silently zero the round's results.
  */
object Json {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
