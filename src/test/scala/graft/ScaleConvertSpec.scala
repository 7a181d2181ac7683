package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{CsvSource, Runner}
import graft.spec.{FileSpec, SpecStore}

/** convertAtScale (single-pass observe + quarantine-commit) must agree with
  * the cache-based convert on counters and the gate decision, and its
  * written rows must match (directory sink vs single file). */
class ScaleConvertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val res = "src/test/resources"

  private def mapping(name: String) = SpecStore.parseMapping(
    Files.readString(Paths.get(s"$res/golden/$name.mapping.json")))

  private def read(name: String) =
    CsvSource.readWithLineNumbers(spark, s"$res/fixtures/$name.csv", FileSpec("t", "t"))

  test("gate trips identically and output is retracted") {
    val out = Files.createTempDirectory("scale").resolve("gated").toString
    val r = Runner.convertAtScale(read("kitchen"), mapping("kitchen"), out, failOnError = true)
    val ref = Runner.convert(read("kitchen"), mapping("kitchen"),
      Files.createTempDirectory("scale").resolve("ref.csv").toString, failOnError = true)
    assert((r.successCount, r.skippedCount, r.errorCount, r.written) ==
           (ref.successCount, ref.skippedCount, ref.errorCount, ref.written))
    assert(!r.written && !Files.exists(Paths.get(out)), "gated output not retracted")
  }

  test("ungated run writes the same rows as the single-file path") {
    val outDir = Files.createTempDirectory("scale").resolve("ok").toString
    val outFile = Files.createTempDirectory("scale").resolve("ok.csv").toString
    val r = Runner.convertAtScale(read("filters"), mapping("filters"), outDir, failOnError = true)
    val ref = Runner.convert(read("filters"), mapping("filters"), outFile, failOnError = true)
    assert(r.written && ref.written)
    assert((r.successCount, r.skippedCount, r.errorCount) ==
           (ref.successCount, ref.skippedCount, ref.errorCount))
    val dirRows = spark.read.option("header", "true").csv(outDir)
      .collect().map(_.mkString("|")).sorted.toSeq
    val fileRows = spark.read.option("header", "true").csv(outFile)
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(dirRows == fileRows && dirRows.nonEmpty)
  }
}
