package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Api
import graft.spec.{FileSpec, SpecStore}

/** D1/D3 payload shapes against the kitchen golden case (whose counts and
  * per-line errors are pinned to the executed reference by EtlParitySpec). */
class ApiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val res = "src/test/resources"

  private def mapping = SpecStore.parseMapping(
    Files.readString(Paths.get(s"$res/golden/kitchen.mapping.json")))

  test("preview returns line-numbered raw rows starting at 2") {
    val p = Api.preview(spark, s"$res/fixtures/kitchen.csv", FileSpec("k", "k"), None, n = 3)
    assert(p.rows.map(_.line) == Seq(2L, 3L, 4L))
    assert(p.rows.head.cells("name") == "alpha")
    assert(p.result.isEmpty && p.errorsByLine.isEmpty)
  }

  test("preview with mapping validates the whole file and groups errors by line") {
    val p = Api.preview(spark, s"$res/fixtures/kitchen.csv", FileSpec("k", "k"),
      Some(mapping), n = 2)
    assert(p.rows.size == 2)
    val r = p.result.get
    // golden: 0 success, 2 skipped, 7 field errors (kitchen.result.json)
    assert(r.successCount == 0 && r.skippedCount == 2 && r.errorCount == 7)
    assert(p.errorsByLine.keySet == r.errors.map(_.line_number).toSet)
    assert(p.errorsByLine.values.map(_.size).sum == 7)
  }

  test("convert honors the fail-on-error gate") {
    val out = Files.createTempDirectory("api").resolve("out.csv").toString
    val gated = Api.convert(spark, s"$res/fixtures/kitchen.csv", FileSpec("k", "k"),
      mapping, out, failOnError = true)
    assert(!gated.written && !Files.exists(Paths.get(out)))
    val loose = Api.convert(spark, s"$res/fixtures/kitchen.csv", FileSpec("k", "k"),
      mapping, out, failOnError = false)
    assert(loose.written && Files.exists(Paths.get(out)))
  }
}
