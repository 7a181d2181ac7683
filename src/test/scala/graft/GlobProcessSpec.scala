package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.builtin.Revolut
import graft.engine.CsvSource
import graft.spec.FileSpec

/** Glob mode (one job, per-file provenance, partitioned outputs) must agree
  * with the per-file compat loop on counts and row content. */
class GlobProcessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("processStocksGlob == per-file loop on a two-file directory") {
    val in = Files.createTempDirectory("glob_in")
    val fixture = Files.readString(Paths.get("src/test/resources/fixtures/stocks_hardcoded.csv"))
    Files.writeString(in.resolve("jan.csv"), fixture)
    Files.writeString(in.resolve("feb.csv"), fixture)
    val out = Files.createTempDirectory("glob_out").resolve("gf").toString

    val counts = Revolut.processStocksGlob(spark, s"$in/*.csv", out)
    assert(counts.keySet == Set("jan", "feb"))
    assert(counts.values.toSeq == Seq(8L, 8L), s"counts: $counts")

    // row content of one partition equals the single-file pipeline output
    val single = Files.createTempDirectory("glob_ref").resolve("ref.csv").toString
    Revolut.writeGhostfolio(
      Revolut.stocksPlan(CsvSource.read(spark, in.resolve("jan.csv").toString,
        FileSpec("t", "t"))), single)
    val part = spark.read.option("header", "true").csv(s"$out/src_file=jan")
      .collect().map(_.mkString("|")).sorted.toSeq
    val ref = spark.read.option("header", "true").csv(single)
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(part == ref && part.nonEmpty)
  }

  test("processCryptoGlob matches per-file counts") {
    val in = Files.createTempDirectory("glob_cin")
    val fixture = Files.readString(Paths.get("src/test/resources/fixtures/crypto_hardcoded.csv"))
    Files.writeString(in.resolve("a.csv"), fixture)
    Files.writeString(in.resolve("b.csv"), fixture)
    val out = Files.createTempDirectory("glob_cout").resolve("gf").toString
    val counts = Revolut.processCryptoGlob(spark, s"$in/*.csv", out)
    assert(counts == Map("a" -> 6L, "b" -> 6L), s"counts: $counts")
  }
}
