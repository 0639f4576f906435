package graft.functions

/** Locale-string parsers for the reference's raw catalog encodings
  * (crocus output_examples/ishares.json:6-8, vanguard.json:7-9):
  * comma-decimal percents ("0,22%", "0,07"), currency-affixed money
  * ("USD 632,42", "144,12 USD", "5,66 €"), Italian-month dates
  * ("28 feb 2025") and dd/MM/yy dates ("21/02/25").
  *
  * Static JVM methods so the Catalyst expressions in
  * [[GraftExpressions]] can call them from generated code without
  * breaking whole-stage codegen. Pure functions; explicit month map —
  * never JVM locale data (SURVEY.md §7 hard part 2).
  */
object LocaleParse {
  private val itMonths: Map[String, Int] = Map(
    "gen" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4, "mag" -> 5,
    "giu" -> 6, "lug" -> 7, "ago" -> 8, "set" -> 9, "ott" -> 10,
    "nov" -> 11, "dic" -> 12)

  private val numRe = "[-+]?[0-9][0-9.,]*".r

  /** "1.234,56" / "1234,56" / "1234.56" → double; null on failure.
    * Comma is the decimal mark when present; dots before a comma are
    * thousands separators. */
  def parseDecimal(s: String): java.lang.Double = {
    if (s == null) return null
    val raw = s.trim
    val norm =
      if (raw.contains(',')) raw.replace(".", "").replace(',', '.')
      else raw
    try java.lang.Double.valueOf(norm)
    catch { case _: NumberFormatException => null }
  }

  /** Percent string ("0,22%" or bare "0,07" — both are percents in the
    * reference data) → fraction as double (0.0022 / 0.0007). */
  def parsePct(s: String): java.lang.Double = {
    if (s == null) return null
    val v = parseDecimal(s.trim.stripSuffix("%"))
    if (v == null) null else java.lang.Double.valueOf(v.doubleValue() / 100.0)
  }

  private val symbolCcy: Map[String, String] =
    Map("€" -> "EUR", "$" -> "USD", "£" -> "GBP", "¥" -> "JPY", "Fr" -> "CHF")

  /** Money with currency prefix or suffix, code or symbol. Returns
    * (amount, ISO ccy) or null. "USD 632,42" → (632.42, "USD");
    * "5,66 €" → (5.66, "EUR"). */
  def parseMoney(s: String): (java.lang.Double, String) = {
    if (s == null) return null
    val raw = s.trim
    val m = numRe.findFirstIn(raw).orNull
    if (m == null) return null
    val amount = parseDecimal(m)
    if (amount == null) return null
    val rest = raw.replaceFirst(java.util.regex.Pattern.quote(m), "").trim
    val ccy =
      if (rest.isEmpty) null
      else symbolCcy.getOrElse(rest, if (rest.matches("[A-Za-z]{3}")) rest.toUpperCase else rest)
    (amount, ccy)
  }

  /** "28 feb 2025" (Italian month abbreviation) or "21/02/25"
    * (dd/MM/yy, 2000-pivot) → epoch days; null on failure. */
  def parseDateIt(s: String): java.lang.Integer = {
    if (s == null) return null
    val raw = s.trim.toLowerCase
    try {
      val slash = raw.split('/')
      if (slash.length == 3) {
        val d = slash(0).toInt; val m = slash(1).toInt
        val yRaw = slash(2).toInt
        val y = if (slash(2).length == 2) 2000 + yRaw else yRaw
        return java.lang.Integer.valueOf(
          java.time.LocalDate.of(y, m, d).toEpochDay.toInt)
      }
      val parts = raw.split("\\s+")
      if (parts.length != 3) return null
      val m = itMonths.getOrElse(parts(1).take(3), -1)
      if (m < 0) return null
      java.lang.Integer.valueOf(
        java.time.LocalDate.of(parts(2).toInt, m, parts(0).toInt).toEpochDay.toInt)
    } catch { case _: RuntimeException => null }
  }
}
