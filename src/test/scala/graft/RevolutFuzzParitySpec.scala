package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.builtin.Revolut
import graft.engine.CsvSource
import graft.spec.FileSpec

/** Differential fuzz parity for the HARDCODED Revolut pipelines (round-12
  * verdict item 1). tools/fuzz_revolut.py generates 280 deterministic
  * pseudo-random export CSVs — every TYPE_MAP/SKIP_TYPES key plus
  * BUY/SELL-prefix fallbacks, SYMBOL_MAP and GBX/suffix-guard edges,
  * `€$£`- and currency-code-prefixed money, every H4 date format plus
  * near-misses (unpadded strptime fields, case-variant month names,
  * out-of-range dates), empty tickers/symbols, dropped and shuffled
  * columns — runs the reference's EXECUTED ETLPipeline
  * (revolut_stocks.py:13-126, revolut_crypto.py:18-151) on each, and
  * commits loaded counts + output bytes as goldens. This suite replays
  * each case through Revolut.stocksPlan / cryptoPlan and must match both.
  *
  * Declared-fixture coverage lives in RevolutParitySpec; this covers the
  * unenumerated export space. Grouped in blocks so one divergence names
  * its case id without costing a Spark session per case.
  */
class RevolutFuzzParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "src/test/resources/golden/fuzz_revolut"
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def read(name: String): String =
    Files.readString(Paths.get(s"$dir/$name"))

  private def cases(index: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    mapper.readTree(read(index)).elements.asScala.map(_.asText).toSeq
  }

  private def diverge(name: String,
                      plan: DataFrame => DataFrame): Option[String] = {
    val raw = CsvSource.read(spark, s"$dir/$name.csv", FileSpec("t", "t"))
    val out = Files.createTempDirectory("rfuzz").resolve(s"$name.csv").toString
    val n = Revolut.writeGhostfolio(plan(raw), out)
    val gold = mapper.readTree(read(s"$name.result.json"))
    val mismatches = scala.collection.mutable.ListBuffer[String]()
    if (n != gold.get("loaded_count").asLong)
      mismatches += s"loaded_count: engine=$n reference=${gold.get("loaded_count").asLong}"
    val goldCsv = read(s"$name.out.csv").replace("\r\n", "\n")
    val ourCsv = Files.readString(Paths.get(out)).replace("\r\n", "\n")
    if (ourCsv != goldCsv) {
      val gl = goldCsv.split("\n", -1); val ol = ourCsv.split("\n", -1)
      val firstDiff = gl.zip(ol).indexWhere { case (a, b) => a != b } match {
        case -1 => s"line-count ${ol.length} vs ${gl.length}"
        case i  => s"line $i: engine='${ol(i)}' reference='${gl(i)}'"
      }
      mismatches += s"output bytes: $firstDiff"
    }
    if (mismatches.isEmpty) None else Some(s"$name → ${mismatches.mkString("; ")}")
  }

  private val Block = 20
  for (block <- cases("cases_stocks.json").grouped(Block).zipWithIndex.toSeq) {
    val (names, idx) = block
    test(f"stocks fuzz parity block ${idx}%02d (${names.head}..${names.last})") {
      val divergences = names.flatMap(diverge(_, Revolut.stocksPlan(_)))
      assert(divergences.isEmpty,
        s"${divergences.size} divergent case(s):\n${divergences.mkString("\n")}")
    }
  }
  for (block <- cases("cases_crypto.json").grouped(Block).zipWithIndex.toSeq) {
    val (names, idx) = block
    test(f"crypto fuzz parity block ${idx}%02d (${names.head}..${names.last})") {
      val divergences = names.flatMap(diverge(_, Revolut.cryptoPlan(_)))
      assert(divergences.isEmpty,
        s"${divergences.size} divergent case(s):\n${divergences.mkString("\n")}")
    }
  }

  // exotic-whitespace micro-family: padding Python str.strip() removes but
  // Java's \s alone would keep (\x1c-\x1f, NEL, NBSP) — pyStrip parity
  test("stocks fuzz parity: exotic-whitespace strip family") {
    val divergences = cases("cases_strip.json")
      .flatMap(diverge(_, Revolut.stocksPlan(_)))
    assert(divergences.isEmpty,
      s"${divergences.size} divergent case(s):\n${divergences.mkString("\n")}")
  }
}
