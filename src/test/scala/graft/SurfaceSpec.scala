package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.collection.immutable.VectorMap
import graft.engine.RowEdit
import graft.spec._

/** Reference dashboard surface: D2 row update (app.py:577-623), D4 spec
  * store write side (models.py:174-267), template CSV generation
  * (app.py:715-747). Goldens under golden/surface were produced by executing
  * the reference's own csv/json calls (see that directory's generator
  * provenance in the round-3 commit).
  */
class SurfaceSpec extends AnyFunSuite {

  private val goldenDir = "src/test/resources/golden/surface"
  private val cfgDir = "/root/reference/data/config"

  private def bytes(p: String): Array[Byte] = Files.readAllBytes(Paths.get(p))
  private def str(p: String): String = new String(bytes(p), StandardCharsets.UTF_8)

  test("D2 row update matches reference DictReader/DictWriter bytes") {
    val work = Files.createTempFile("rowedit", ".csv")
    Files.write(work, bytes(s"$goldenDir/rowedit_input.csv"))
    val res = RowEdit.updateRow(work.toString, 3,
      Map("Ticker" -> "MSFT2", "Price per share" -> "391.00", "Notes" -> "edited, ok"))
    assert(res.isRight)
    assert(new String(Files.readAllBytes(work), StandardCharsets.UTF_8)
      === str(s"$goldenDir/rowedit_expected.csv"))
  }

  test("D2 row update error cases mirror the reference") {
    assert(RowEdit.updateRow("/no/such/file.csv", 2, Map()).isLeft)
  }

  test("D2 lone empty field is quoted so the record survives the next read") {
    val work = Files.createTempFile("lonecol", ".csv")
    Files.write(work, bytes(s"$goldenDir/lonecol_input.csv"))
    assert(RowEdit.updateRow(work.toString, 2, Map("OnlyCol" -> "")).isRight)
    assert(new String(Files.readAllBytes(work), StandardCharsets.UTF_8)
      === str(s"$goldenDir/lonecol_expected.csv"))
  }

  test("D2 row update fuzz corpus: 20 random cases match Python csv bytes") {
    val fuzzDir = "src/test/resources/golden/rowedit_fuzz"
    val cases = SpecStore.parseAny(str(s"$fuzzDir/cases.json"))
      .asInstanceOf[List[Map[String, Any]]]
    cases.foreach { c =>
      val i = c("case").asInstanceOf[Long]
      val line = c("line").asInstanceOf[Long].toInt
      val upd = c("update").asInstanceOf[Map[String, Any]]
        .map { case (k, v) => k -> String.valueOf(v) }
      val work = Files.createTempFile(f"fz$i%02d", ".csv")
      Files.write(work, bytes(f"$fuzzDir/case$i%02d_input.csv"))
      assert(RowEdit.updateRow(work.toString, line, upd).isRight, s"case $i")
      assert(new String(Files.readAllBytes(work), StandardCharsets.UTF_8)
        === str(f"$fuzzDir/case$i%02d_expected.csv"), s"case $i")
    }
  }

  test("template CSV generation matches reference bytes for every shipped spec") {
    val specs = SpecStore.loadFileSpecs(s"$cfgDir/sources.json") ++
      SpecStore.loadFileSpecs(s"$cfgDir/destinations.json")
    val withCols = specs.values.filter(_.columns.nonEmpty)
    assert(withCols.nonEmpty)
    withCols.foreach { spec =>
      val golden = s"$goldenDir/template_${spec.id}.csv"
      assert(Files.exists(Paths.get(golden)), s"missing golden for ${spec.id}")
      assert(Templates.templateCsv(spec) === str(golden), s"template ${spec.id}")
    }
  }

  test("template writer creates directory and file like the reference") {
    val tmp = Files.createTempDirectory("tmpl").toString
    val spec = SpecStore.loadFileSpecs(s"$cfgDir/sources.json")("revolut_stocks")
    val out = Templates.createSpecDirectoryAndTemplate(spec, tmp)
    assert(out.isDefined)
    assert(str(out.get) === str(s"$goldenDir/template_revolut_stocks.csv"))
    // no-op cases
    assert(Templates.createSpecDirectoryAndTemplate(
      spec.copy(defaultDirectory = ""), tmp).isEmpty)
    assert(Templates.createSpecDirectoryAndTemplate(
      spec.copy(columns = Nil), tmp).isEmpty)
  }

  test("SpecJson round-trips every shipped config file byte-for-byte") {
    assert(SpecJson.dumpFileSpecs(SpecStore.loadFileSpecs(s"$cfgDir/sources.json"))
      === str(s"$cfgDir/sources.json"))
    assert(SpecJson.dumpFileSpecs(SpecStore.loadFileSpecs(s"$cfgDir/destinations.json"))
      === str(s"$cfgDir/destinations.json"))
    assert(SpecJson.dumpMappings(SpecStore.loadMappings(s"$cfgDir/mappings.json"))
      === str(s"$cfgDir/mappings.json"))
  }

  test("SpecStore upsert matches reference save_mapping bytes (in-place + append)") {
    val work = Files.createTempFile("mappings", ".json")
    Files.write(work, bytes(s"$cfgDir/mappings.json"))
    val existing = SpecStore.loadMappings(work.toString)("revolut_stocks_to_ghostfolio")
    SpecStore.upsertMapping(work.toString, existing.copy(
      description = "Convert Revolut stock trades to Ghostfolio format (v2 — edited)"))
    SpecStore.upsertMapping(work.toString, ETLMapping(
      id = "unit_test_mapping", name = "Unit → Test",
      sourceId = "revolut_stocks", destinationId = "ghostfolio",
      fieldMappings = Seq(
        FieldMapping("date", Some("Date"), "direct", VectorMap.empty),
        FieldMapping("fee", None, "constant", VectorMap("value" -> 0.5))),
      filterRules = Seq(FilterRule("Type", "equals", value = Some("SKIP")))))
    assert(new String(Files.readAllBytes(work), StandardCharsets.UTF_8)
      === str(s"$goldenDir/mappings_upsert_expected.json"))
  }

  test("SpecStore delete removes the key and reports absence") {
    val work = Files.createTempFile("mappings", ".json")
    Files.write(work, bytes(s"$cfgDir/mappings.json"))
    assert(SpecStore.deleteMapping(work.toString, "revolut_crypto_to_ghostfolio"))
    assert(!SpecStore.deleteMapping(work.toString, "revolut_crypto_to_ghostfolio"))
    val left = SpecStore.loadMappings(work.toString)
    assert(!left.contains("revolut_crypto_to_ghostfolio"))
    // what remains still round-trips through the Python-parity writer
    assert(SpecJson.dumpMappings(left)
      === new String(Files.readAllBytes(work), StandardCharsets.UTF_8))
  }
}
