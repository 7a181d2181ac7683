package graft.engine

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Python-compatible number → string formatting.
  *
  * Two formats appear at the reference's output boundary:
  *  1. `str(float)` — CPython's shortest-repr with fixed notation for
  *     10^-4 ≤ |x| < 10^16 and `e±XX` outside (csv.DictWriter stringifies
  *     dynamic-path values, dynamic.py:340-342).
  *  2. `f"{v:.8f}".rstrip("0").rstrip(".")` — the Ghostfolio money format
  *     (ghostfolio.py:48-51): fixed 8 decimals, trailing zeros then a bare
  *     dot stripped; `0→"0"`, `1.50→"1.5"`, `123.0→"123"`.
  */
object PyFormat {

  /** CPython str(float). Java's Double.toString also emits shortest digits
    * but switches to E-notation at 1e7 and formats exponents differently;
    * we re-assemble from Java's digits using Python's thresholds. */
  def pyFloatStr(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d == Double.PositiveInfinity) return "inf"
    if (d == Double.NegativeInfinity) return "-inf"
    val neg = (d < 0.0) || (d == 0.0 && 1.0 / d < 0)
    val a = math.abs(d)
    // shortest decimal digits that round-trip to the same double (what
    // CPython's repr computes; Java's Double.toString is NOT shortest for
    // subnormals, so search explicitly)
    val (digits: String, exp10n: Int) =
      if (a == 0.0) ("0", 0)
      else {
        val exact = new JBigDecimal(a)
        var chosen: JBigDecimal = null
        var k = 1
        while (chosen == null && k <= 17) {
          val c = exact.round(new java.math.MathContext(k, RoundingMode.HALF_EVEN))
          if (c.doubleValue() == a) chosen = c
          k += 1
        }
        if (chosen == null) chosen = exact
        val ds = chosen.unscaledValue.abs.toString
        (ds, ds.length - 1 - chosen.scale)
      }
    val trimmed = digits.reverse.dropWhile(_ == '0').reverse match {
      case "" => "0"
      case s  => s
    }
    val s =
      if (a == 0.0) "0.0"
      else if (exp10n >= -4 && exp10n < 16) {
        // fixed notation
        if (exp10n >= trimmed.length - 1) {
          trimmed + "0" * (exp10n - trimmed.length + 1) + ".0"
        } else if (exp10n >= 0) {
          val (i, f) = trimmed.splitAt(exp10n + 1)
          s"$i.$f"
        } else {
          "0." + "0" * (-exp10n - 1) + trimmed
        }
      } else {
        // e-notation: d[.ddd]e±XX (exponent ≥ 2 digits, sign always;
        // single-digit mantissa has NO ".0" — str(1e-05) == '1e-05')
        val mant =
          if (trimmed.length == 1) trimmed
          else trimmed.charAt(0) + "." + trimmed.substring(1)
        val sign = if (exp10n < 0) "-" else "+"
        f"${mant}e$sign${math.abs(exp10n)}%02d"
      }
    if (neg) "-" + s else s
  }

  /** Python str(x) of an arbitrary cell value for CSV output. */
  def pyCellStr(v: Any): String = v match {
    case null           => ""
    case s: String      => s
    case d: Double      => pyFloatStr(d)
    case f: Float       => pyFloatStr(f.toDouble)
    case b: Boolean     => if (b) "True" else "False"
    case other          => other.toString
  }

  /** Ghostfolio money format: %.8f then strip trailing zeros and dot.
    * Uses the exact binary value (new BigDecimal(d)) with HALF_EVEN — the
    * same rounding CPython's format() applies. */
  def money8(d: Double): String = {
    val s = new JBigDecimal(d).setScale(8, RoundingMode.HALF_EVEN).toPlainString
    val noZeros = s.reverse.dropWhile(_ == '0').reverse
    val stripped = if (noZeros.endsWith(".")) noZeros.dropRight(1) else noZeros
    // Python's %.8f keeps the sign of -0.0 ("-0"); BigDecimal drops it
    if ((d == 0.0) && (1.0 / d < 0) && !stripped.startsWith("-")) "-" + stripped
    else stripped
  }
}
