package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.builtin.Revolut
import graft.engine.CsvSource
import graft.spec.FileSpec

/** Byte parity for the hardcoded pipelines (SURVEY.md §2.A H1-H9, EP1):
  * goldens were produced by EXECUTING the reference's
  * RevolutStocks/CryptoTransformer via ETLPipeline (tools/gen_golden.py). */
class RevolutParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val res = "src/test/resources"

  private def gold(name: String): String =
    Files.readString(Paths.get(s"$res/golden/$name")).replace("\r\n", "\n")

  private def runCase(name: String, plan: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
    val raw = CsvSource.read(spark, s"$res/fixtures/$name.csv", FileSpec("t", "t"))
    val out = Files.createTempDirectory("revolut").resolve(s"$name.csv").toString
    val n = Revolut.writeGhostfolio(plan(raw), out)
    val goldJson = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(gold(s"$name.result.json"))
    assert(n == goldJson.get("loaded_count").asLong, "loaded count")
    assert(Files.readString(Paths.get(out)).replace("\r\n", "\n") == gold(s"$name.out.csv"),
      "output CSV bytes")
  }

  test("stocks hardcoded pipeline matches reference output byte-for-byte") {
    runCase("stocks_hardcoded", Revolut.stocksPlan(_))
  }

  test("crypto hardcoded pipeline matches reference output byte-for-byte") {
    runCase("crypto_hardcoded", Revolut.cryptoPlan(_))
  }
}
