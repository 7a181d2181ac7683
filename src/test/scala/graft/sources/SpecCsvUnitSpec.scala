package graft.sources

import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins on the DSv2 spec source's filter-pushdown contract (round-10
  * advice): null comparison values must be REJECTED by `evaluable` (so
  * Spark keeps Catalyst's null semantics) rather than stringified to
  * "null" by the native evaluator. */
class SpecCsvUnitSpec extends AnyFunSuite {

  test("filters carrying null literals are not claimed as handled") {
    assert(!SpecCsvTable.evaluable(EqualTo("k", null)))
    assert(!SpecCsvTable.evaluable(In("k", Array("a", null))))
    assert(!SpecCsvTable.evaluable(And(EqualTo("k", "x"), EqualTo("v", null))))
    assert(!SpecCsvTable.evaluable(Or(EqualTo("k", null), EqualTo("v", "x"))))
    assert(!SpecCsvTable.evaluable(Not(EqualTo("k", null))))
    // the non-null forms stay handled
    assert(SpecCsvTable.evaluable(EqualTo("k", "x")))
    assert(SpecCsvTable.evaluable(In("k", Array("a", "b"))))
  }

  test("a null value never matches even if one reached the evaluator") {
    def get(f: String): String = "null" // cell whose TEXT is the word null
    assert(!SpecCsvTable.evalFilter(EqualTo("k", null), get))
    assert(!SpecCsvTable.evalFilter(In("k", Array[Any](null)), get))
    // sanity: the literal string still matches a real comparison value
    assert(SpecCsvTable.evalFilter(EqualTo("k", "null"), get))
  }

  test("consumed-files offset round-trips through JSON incl. escapes") {
    val off = ConsumedFilesOffset(Set("/a/b \"q\".csv", "/a\\c.csv"))
    val mb = off.json()
    // reparse through the stream's deserializer shape
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(mb)
    val b = Set.newBuilder[String]
    node.elements().forEachRemaining(e => b += e.asText())
    assert(b.result() == off.consumed)
  }
}
