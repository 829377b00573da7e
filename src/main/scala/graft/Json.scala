package graft

/** The one JSON string escaper for driver-artifact writers (Verify,
  * QueryDump) and the graftsink line format. Escapes backslash, quote,
  * and ALL control chars (< 0x20) — a tab or CR in builder-authored
  * SQL would otherwise make the driver's `json.load` fail and silently
  * zero the round's correctness.
  *
  * Surrogate code units (0xD800-0xDFFF) are ALWAYS `\\uXXXX`-escaped,
  * paired or not: truncated string bounds in graftsink manifests can
  * legitimately end in a LONE surrogate (a 16-char cut through an
  * emoji's pair), and `String.getBytes("UTF-8")` replaces an unpaired
  * surrogate with '?' (0x3F) — which sorts BELOW almost everything and
  * would silently turn an upper bound into a lie (unsound file
  * skipping). Escaped units survive the byte round-trip exactly; every
  * JSON parser in play (Jackson, Python's json, the sink's own
  * unescape) rebuilds the original UTF-16 unit from the escape.
  */
private[graft] object Json {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' || (c >= 0xD800 && c <= 0xDFFF) =>
      f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
