package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.spec.{FileSpec, SpecStore, SpecJson}
import graft.engine.{CsvSource, Runner}

/** t12 — aggregation transforms in the mapping DSL (reference ROADMAP.md:51
  * planned `sum/count/avg` as a transform_type; never implemented there, so
  * the semantics are this engine's, documented at Runner.aggregatePlan and
  * oracle-pinned by the t12 catalog entry). */
class AggregateMappingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val mappingJson = """{
    "id": "agg", "name": "agg", "source_id": "s", "destination_id": "d",
    "field_mappings": [
      {"destination_field": "city", "source_field": "town",
       "transform_type": "direct", "transform_config": {}},
      {"destination_field": "total", "source_field": "amount",
       "transform_type": "aggregate",
       "transform_config": {"group_by": ["city"], "agg": "sum"}},
      {"destination_field": "mean", "source_field": "amount",
       "transform_type": "aggregate",
       "transform_config": {"group_by": ["city"], "agg": "avg"}},
      {"destination_field": "n", "source_field": "amount",
       "transform_type": "aggregate",
       "transform_config": {"group_by": ["city"], "agg": "count"}}
    ],
    "filter_rules": [{"field": "town", "operator": "equals", "value": "skipme"}]
  }"""

  private def fixture(): String = {
    val dir = Files.createTempDirectory("aggmap")
    val f = dir.resolve("in.csv")
    Files.writeString(f,
      "town,amount\n" +
      "a,\"1,000.25\"\n" + // comma-grouped, quoted (H5 strips the comma)
      "a,2.25\n" +
      "a,n/a\n" +        // unparsable -> 0.0, still counted (truthy)
      "b,\n" +           // empty -> 0.0 for sum/avg, NOT counted
      "b,10\n" +
      "skipme,999\n")    // filter rule drops pre-aggregation
    f.toString
  }

  test("t12: convert writes the grouped, money8-formatted output") {
    val m = SpecStore.parseMapping(mappingJson)
    assert(Runner.hasAggregates(m))
    val df = CsvSource.readWithLineNumbers(spark, fixture(), FileSpec("t", "t"))
    val out = Files.createTempDirectory("aggout").resolve("out.csv").toString
    val r = Runner.convert(df, m, out)
    assert(r.written && r.errorCount == 0)
    assert(r.skippedCount == 1) // the skipme row
    val csv = Files.readString(java.nio.file.Paths.get(out)).replace("\r\n", "\n")
    // header = field_mappings order; sums in decimal, rendered per §1.3.2
    // a: 1000.25 + 2.25 + 0.0 = 1002.5; avg = 1002.5/3; count 3 (all truthy)
    // b: 0.0 + 10 = 10; avg 5; count 1 (empty not truthy)
    val avgA = graft.engine.PyFormat.money8(1002.5 / 3)
    assert(csv ==
      s"city,total,mean,n\na,1002.5,$avgA,3\nb,10,5,1\n", csv)
  }

  test("t12: result is invariant to input partitioning (decimal accumulation)") {
    val m = SpecStore.parseMapping(mappingJson)
    val df = CsvSource.read(spark, fixture(), FileSpec("t", "t"))
    val one = Runner.aggregatePlan(df.coalesce(1), m).orderBy("city").collect().toSeq
    val many = Runner.aggregatePlan(df.repartition(7), m).orderBy("city").collect().toSeq
    assert(one == many && one.nonEmpty)
  }

  test("t12: aggregate mapping JSON round-trips byte-for-byte through the store") {
    val m = SpecStore.parseMapping(mappingJson)
    val dumped = SpecJson.dumps(SpecJson.etlMappingDict(m))
    val reparsed = SpecStore.parseMapping(dumped)
    assert(SpecJson.dumps(SpecJson.etlMappingDict(reparsed)) == dumped)
    // the aggregate config survives as data, not a lossy projection
    val agg = reparsed.fieldMappings.find(_.destinationField == "total").get
    assert(agg.transformType == "aggregate")
    assert(agg.config("group_by") == List("city"))
    assert(agg.config("agg") == "sum")
  }

  test("t12: mismatched group_by and unknown agg fail loudly") {
    val bad1 = SpecStore.parseMapping(mappingJson.replaceFirst(
      """\{"group_by": \["city"\], "agg": "avg"\}""",
      """{"group_by": ["other"], "agg": "avg"}"""))
    val df = CsvSource.read(spark, fixture(), FileSpec("t", "t"))
    intercept[IllegalArgumentException](Runner.aggregatePlan(df, bad1))
    val bad2 = SpecStore.parseMapping(mappingJson.replaceFirst(
      "\"agg\": \"sum\"", "\"agg\": \"median\""))
    intercept[IllegalArgumentException](Runner.aggregatePlan(df, bad2))
  }

  test("t12: count without source_field counts surviving rows") {
    val m = SpecStore.parseMapping("""{
      "id": "c", "name": "c", "source_id": "s", "destination_id": "d",
      "field_mappings": [
        {"destination_field": "city", "source_field": "town",
         "transform_type": "direct", "transform_config": {}},
        {"destination_field": "rows", "source_field": null,
         "transform_type": "aggregate",
         "transform_config": {"group_by": ["city"], "agg": "count"}}
      ], "filter_rules": []}""")
    val df = CsvSource.read(spark, fixture(), FileSpec("t", "t"))
    val got = Runner.aggregatePlan(df, m).orderBy("city")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("a", "3"), ("b", "2"), ("skipme", "1")), got.toString)
  }
}
