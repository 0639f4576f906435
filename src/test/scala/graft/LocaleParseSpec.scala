package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.LocaleParse

/** Golden tests for the reference's exact raw encodings (FIXTURES.md §A,
  * crocus output_examples/) + ScalaCheck round-trips (SURVEY.md §5.4). */
class LocaleParseSpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A])(f: A => Boolean): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(g)(f))
    assert(res.passed, res.status.toString)
  }

  test("golden: iShares TER '0,07' (percent, no sign) → 0.0007") {
    assert(LocaleParse.parsePct("0,07") == 0.07 / 100)
  }
  test("golden: Vanguard TER '0,22%' → 0.0022") {
    assert(LocaleParse.parsePct("0,22%") == 0.22 / 100)
  }
  test("golden: iShares price 'USD 632,42' (ccy prefix)") {
    assert(LocaleParse.parseMoney("USD 632,42") == (632.42, "USD"))
  }
  test("golden: Vanguard price '144,12 USD' (ccy suffix)") {
    assert(LocaleParse.parseMoney("144,12 USD") == (144.12, "USD"))
  }
  test("golden: Vanguard price '5,66 €' (symbol suffix)") {
    assert(LocaleParse.parseMoney("5,66 €") == (5.66, "EUR"))
  }
  test("golden: iShares date '28 feb 2025' (Italian month)") {
    assert(LocaleParse.parseDateIt("28 feb 2025") ==
      java.time.LocalDate.of(2025, 2, 28).toEpochDay.toInt)
  }
  test("golden: Vanguard date '21/02/25' (dd/MM/yy)") {
    assert(LocaleParse.parseDateIt("21/02/25") ==
      java.time.LocalDate.of(2025, 2, 21).toEpochDay.toInt)
  }
  test("thousands separator '1.234,56'") {
    assert(LocaleParse.parseDecimal("1.234,56") == 1234.56)
  }
  test("negative amounts parse with sign preserved") {
    assert(LocaleParse.parseDecimal("-1.234,56") == -1234.56)
    assert(LocaleParse.parseMoney("-12,50 EUR") == (-12.50, "EUR"))
  }

  test("money without currency affix → null ccy, amount kept") {
    assert(LocaleParse.parseMoney("632,42") == (632.42, null))
  }

  test("invalid calendar dates → null (not an exception)") {
    assert(LocaleParse.parseDateIt("30 feb 2025") == null)
    assert(LocaleParse.parseDateIt("32/01/25") == null)
    assert(LocaleParse.parseDateIt("29 feb 2024") == // leap year OK
      java.time.LocalDate.of(2024, 2, 29).toEpochDay.toInt)
    assert(LocaleParse.parseDateIt("29 feb 2025") == null) // non-leap
  }

  test("whitespace tolerance") {
    assert(LocaleParse.parsePct("  0,22%  ") == 0.22 / 100)
    assert(LocaleParse.parseMoney("  144,12   USD  ") == (144.12, "USD"))
  }

  test("garbage → null, never throws") {
    assert(LocaleParse.parsePct("n/a") == null)
    assert(LocaleParse.parseMoney("--") == null)
    assert(LocaleParse.parseDateIt("sometime") == null)
    assert(LocaleParse.parseDateIt("28 xyz 2025") == null)
    assert(LocaleParse.parsePct(null) == null)
  }

  private val months = Seq("gen", "feb", "mar", "apr", "mag", "giu",
    "lug", "ago", "set", "ott", "nov", "dic")

  test("property: decimal format→parse round-trip") {
    forAll(Gen.chooseNum(0L, 99999999L)) { cents =>
      val d = BigDecimal(cents, 2)
      val it = d.toString.replace('.', ',')
      LocaleParse.parseDecimal(it) == d.toDouble &&
        LocaleParse.parseMoney(s"$it EUR") == (d.toDouble, "EUR") &&
        LocaleParse.parseMoney(s"USD $it") == (d.toDouble, "USD")
    }
  }

  test("property: Italian date format→parse round-trip") {
    forAll(Gen.zip(Gen.choose(0, 364), Gen.choose(1995, 2030))) { case (off, y) =>
      val date = java.time.LocalDate.of(y, 1, 1).plusDays(off)
      val raw = s"${date.getDayOfMonth} ${months(date.getMonthValue - 1)} ${date.getYear}"
      LocaleParse.parseDateIt(raw) == date.toEpochDay.toInt
    }
  }
}
