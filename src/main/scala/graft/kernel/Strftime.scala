package graft.kernel

/** chrono/strftime → Java DateTimeFormatter pattern translation.
  *
  * The reference's `str.strptime` / `dt.strftime` (reference:
  * lib/polars/string_expr.rb:40-252, date_time_expr.rb:263-272) take
  * C-strftime/chrono formats; Spark's `date_format`/`to_timestamp` take Java
  * patterns. Literal text is quoted so user punctuation survives.
  */
object Strftime {
  private val mapping: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'C' -> "",
    'm' -> "MM", 'b' -> "MMM", 'B' -> "MMMM", 'h' -> "MMM",
    'd' -> "dd", 'e' -> "d", 'j' -> "DDD",
    'a' -> "EEE", 'A' -> "EEEE", 'u' -> "e",
    'H' -> "HH", 'k' -> "H", 'I' -> "hh", 'l' -> "h",
    'M' -> "mm", 'S' -> "ss",
    'f' -> "SSSSSSSSS", '3' -> "SSS", '6' -> "SSSSSS", '9' -> "SSSSSSSSS",
    'p' -> "a", 'P' -> "a",
    'z' -> "xx", 'Z' -> "zz",
    'G' -> "YYYY", 'V' -> "ww",
    'D' -> "MM/dd/yy", 'F' -> "yyyy-MM-dd", 'T' -> "HH:mm:ss", 'R' -> "HH:mm",
    's' -> "" // epoch seconds — handled by caller via unix_timestamp
  )

  def toJava(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    def literal(s: String): Unit =
      if (s.nonEmpty) {
        if (s.exists(c => c.isLetter || c == '\'')) sb.append("'").append(s.replace("'", "''")).append("'")
        else sb.append(s)
      }
    val lit = new StringBuilder
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        literal(lit.toString); lit.clear()
        val n = fmt.charAt(i + 1)
        if (n == '%') { lit.append('%'); i += 2 }
        else if (n == '.' && i + 2 < fmt.length && mapping.contains(fmt.charAt(i + 2))) {
          sb.append(".").append(mapping(fmt.charAt(i + 2))); i += 3
        } else {
          sb.append(mapping.getOrElse(n, n.toString)); i += 2
        }
      } else { lit.append(c); i += 1 }
    }
    literal(lit.toString)
    sb.toString
  }
}
