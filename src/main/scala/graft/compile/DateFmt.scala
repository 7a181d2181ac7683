package graft.compile

/** strptime/strftime → Spark datetime-pattern translation.
  *
  * Two variants because width semantics differ between parse and format:
  * Python's `%d`/`%m`/`%H`/`%I` ACCEPT unpadded digits when parsing but
  * EMIT zero-padded when formatting. Spark's single-letter fields accept
  * 1-2 digits (parse-lenient) while double-letter fields emit padded
  * output, so: parsePattern uses single letters, formatPattern doubles.
  *
  * Reference context: transform `date_format` (dynamic.py:105-124) and the
  * hardcoded multi-format parsers (revolut_stocks.py:86-102,
  * revolut_crypto.py:113-128).
  */
object DateFmt {
  private val parseMap = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'm' -> "M", 'd' -> "d",
    'H' -> "H", 'I' -> "h", 'M' -> "m", 'S' -> "s",
    'p' -> "a", 'b' -> "MMM", 'B' -> "MMMM",
    'a' -> "EEE", 'A' -> "EEEE", 'j' -> "DDD",
    'f' -> "SSSSSS", 'z' -> "xx", 'Z' -> "zz")

  private val formatMap = parseMap ++ Map(
    'm' -> "MM", 'd' -> "dd", 'H' -> "HH", 'I' -> "hh",
    'M' -> "mm", 'S' -> "ss", 'j' -> "DDD")

  private def translate(fmt: String, table: Map[Char, String]): String = {
    val out = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        val d = fmt.charAt(i + 1)
        if (d == '%') out.append("'%'")
        else out.append(table.getOrElse(d, s"'%$d'"))
        i += 2
      } else {
        // letters are pattern syntax in Java — quote them literal
        if (c.isLetter) out.append('\'').append(c).append('\'')
        else if (c == '\'') out.append("''")
        else out.append(c)
        i += 1
      }
    }
    // merge adjacent quoted literals ('T''Z' is fine in java.time, keep simple)
    out.toString
  }

  /** lenient-width pattern for to_timestamp / to_date */
  def parsePattern(strptime: String): String = translate(strptime, parseMap)
  /** zero-padded pattern for date_format output */
  def formatPattern(strftime: String): String = translate(strftime, formatMap)
}
