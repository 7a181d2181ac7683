package graft

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{CsvSource, RowEdit}

/** Property pin for the csv-module dialect pair: RowEdit.renderCell/
  * renderRecords is the reference writer twin (QUOTE_MINIMAL, doubled
  * quotes), CsvSource.parseLine the DictReader twin — parse must invert
  * render for ANY field content without embedded newlines or CR (those go
  * through the multiline reader, pinned by the fuzz ml family). The fuzz
  * suite pins parity against the EXECUTED reference on sampled cases; this
  * property closes the space in between with 500 random rows per run. */
class CsvDialectPropertySpec extends AnyFunSuite {

  // printable-ish field content, quote/comma/space-heavy on purpose
  private val fieldGen: Gen[String] = Gen.frequency(
    3 -> Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(',', '"', '\'', ' ',
      ';', '™', 'é', '\t'))).map(_.mkString),
    1 -> Gen.const(""),
    1 -> Gen.oneOf("None", "_default", "say \"hi\"", "a,,b", "\"\"", "\"x"))
  private val rowGen: Gen[List[String]] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, fieldGen))

  test("parseLine inverts renderRecords for any newline-free row") {
    val prop = Prop.forAll(rowGen) { row =>
      val rendered = RowEdit.renderRecords(Seq(row)).stripSuffix("\r\n")
      val back = CsvSource.parseLine(rendered, ',')
      Prop(back == row) :| s"rendered=<$rendered> back=$back"
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(500).withInitialSeed(12L), prop)
    assert(res.passed, res.status.toString)
  }

  test("parseLine matches Python's lenient quote handling on raw lines") {
    // cases cross-checked against csv.reader directly (see fuzz_golden's
    // provenance): quote special only at field start; text after a closing
    // quote is literal; doubled quote in unquoted field stays
    assert(CsvSource.parseLine("""say "hi",x""", ',') == Seq("say \"hi\"", "x"))
    assert(CsvSource.parseLine(""""a"b,c""", ',') == Seq("ab", "c"))
    assert(CsvSource.parseLine("a\"\"b,\"say \"\"hi\"\"\",z", ',')
      == Seq("a\"\"b", "say \"hi\"", "z"))
    assert(CsvSource.parseLine("\"\"", ',') == Seq(""))
    assert(CsvSource.parseLine("a,", ',') == Seq("a", ""))
    assert(CsvSource.parseLine(",", ',') == Seq("", ""))
    // unterminated quote: field taken as-is to end of line (non-strict)
    assert(CsvSource.parseLine("\"open,ended", ',') == Seq("open,ended"))
  }
}
