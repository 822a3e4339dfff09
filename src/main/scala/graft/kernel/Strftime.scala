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
    'a' -> "EEE", 'A' -> "EEEE",
    'H' -> "HH", 'k' -> "H", 'I' -> "hh", 'l' -> "h",
    'M' -> "mm", 'S' -> "ss",
    'f' -> "SSSSSSSSS", '3' -> "SSS", '6' -> "SSSSSS", '9' -> "SSSSSSSSS",
    'p' -> "a", 'P' -> "a",
    'z' -> "xx", 'Z' -> "zz",
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
        } else if (n == 'G' || n == 'V' || n == 'u') {
          // Spark >= 3.0 rejects week-based patterns (YYYY/ww/e) at runtime;
          // the formatting path computes these natively — see [[format]].
          throw new IllegalArgumentException(
            s"%$n is week-based and unsupported for parsing; use Strftime.format / dt.strftime for output")
        } else {
          sb.append(mapping.getOrElse(n, n.toString)); i += 2
        }
      } else { lit.append(c); i += 1 }
    }
    literal(lit.toString)
    sb.toString
  }

  import org.apache.spark.sql.{Column, functions => F}

  /** ISO weekday 1=Mon..7=Sun (Spark dayofweek is 1=Sun..7=Sat). */
  def isoWeekday(c: Column): Column = ((F.dayofweek(c) + 5) % 7) + 1

  /** ISO-8601 week-based year WITHOUT week-based format patterns (Spark >= 3.0
    * throws on 'YYYY'): the ISO year of a date equals the calendar year of
    * that ISO week's Thursday. */
  def isoYear(c: Column): Column =
    F.year(F.date_add(F.to_date(c), F.lit(4) - isoWeekday(c)))

  /** Column-level strftime formatter. Week-based directives %G/%V/%u are
    * computed natively (Spark rejects the YYYY/ww/e pattern letters); all other
    * runs go through one `date_format` per contiguous chunk, so a format with
    * no week-based directives stays a single codegen'd `date_format` call. */
  def format(c: Column, fmt: String): Column = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[Column]
    val buf = new StringBuilder
    def flush(): Unit = if (buf.nonEmpty) { parts += F.date_format(c, toJava(buf.toString)); buf.setLength(0) }
    var i = 0
    while (i < fmt.length) {
      val ch = fmt.charAt(i)
      if (ch == '%' && i + 1 < fmt.length && "GVu".indexOf(fmt.charAt(i + 1)) >= 0) {
        flush()
        fmt.charAt(i + 1) match {
          case 'G' => parts += F.lpad(isoYear(c).cast("string"), 4, "0")
          case 'V' => parts += F.lpad(F.weekofyear(c).cast("string"), 2, "0")
          case 'u' => parts += isoWeekday(c).cast("string")
        }
        i += 2
      } else if (ch == '%' && i + 1 < fmt.length) { buf.append(ch).append(fmt.charAt(i + 1)); i += 2 }
      else { buf.append(ch); i += 1 }
    }
    flush()
    if (parts.isEmpty) F.lit("") else if (parts.size == 1) parts.head else F.concat(parts.toSeq: _*)
  }
}
