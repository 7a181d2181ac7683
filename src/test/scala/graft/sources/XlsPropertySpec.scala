package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for the whole .xls encode→decode loop: for ANY rows in
  * the flat interchange subset (long/double/string incl. nulls, wide
  * unicode, empty and near-record-size strings) and ANY legal record
  * budget, `sheetRows(workbookStream(encode(...)))` must return the rows
  * exactly — across LABELSST/SST-CONTINUE, FORMULA cached values, and
  * STRING-CONTINUE paths at once. The fuzz suite pins outcomes on
  * STRUCTURAL mutations; this property closes the VALUE space between
  * the hand-written cases with 120 random tables per run. */
class XlsPropertySpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("s", StringType),
    StructField("f", StringType), StructField("v", DoubleType)))
  private val types = schema.fields.map(_.dataType)

  // string content: SST-interned and formula-cached cells both see it.
  // Mix narrow/wide/empty/long — long entries push past small budgets
  private val strGen: Gen[String] = Gen.frequency(
    4 -> Gen.listOf(Gen.oneOf(Gen.alphaNumChar,
      Gen.oneOf(' ', ',', '"', 'é', 'ÿ', '→', '☃', '™'))).map(_.mkString),
    1 -> Gen.const(""),
    1 -> Gen.choose(30, 220).map("n" * _),
    1 -> Gen.choose(20, 120).map("→☃" * _))
  private val doubleGen: Gen[Double] = Gen.oneOf(
    Gen.choose(-1e9, 1e9), Gen.oneOf(0.0, -0.0, 1.5, -2.25, 1e15, 1e-7))
  private val rowGen: Gen[(Long, Option[String], Option[String], Double)] =
    for {
      k <- Gen.choose(-9007199254740992L, 9007199254740992L) // 2^53-exact
      s <- Gen.option(strGen)
      f <- Gen.option(strGen)
      v <- doubleGen
    } yield (k, s, f, v)
  private val tableGen: Gen[(List[(Long, Option[String], Option[String], Double)], Int)] =
    for {
      rows <- Gen.choose(1, 25).flatMap(n => Gen.listOfN(n, rowGen))
      budget <- Gen.oneOf(16, 24, 48, 120, 8224)
    } yield (rows, budget)

  test("encode->decode is identity for any rows and any record budget") {
    val prop = Prop.forAll(tableGen) { case (tuples, budget) =>
      val rows = tuples.map { case (k, s, f, v) =>
        Row(k, s.orNull, f.orNull, v)
      }
      val img = XlsTable.encode(schema, rows.iterator,
        formulaCols = Set("f"), boolCols = Set.empty, sstBudget = budget)
      val got = XlsTable.sheetRows(XlsTable.workbookStream(img),
        schema.length, types).toList
      // nulls round-trip through BLANK records, "" formula results
      // through the blank-string cached tag — both come back as written
      Prop(got == rows) :| s"budget=$budget rows=${rows.take(3)}... got=${got.take(3)}..."
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(120).withInitialSeed(41L), prop)
    assert(res.passed, res.status.toString)
  }
}
