package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spec.{FilterRule, OrderKey, QueryBuilder, QuerySpec, SpecStore}

/** Pins for the source-side query builder (k37): exact SQL shape, the
  * skip-rule NOT(OR) with Q1 polarity, residual split for contains,
  * identifier validation (no injection), and literal escaping. */
class QueryBuilderSpec extends AnyFunSuite {

  test("full spec compiles to the exact dialect SQL") {
    val q = SpecStore.parseQuery("""{
      "id": "q", "table": "T",
      "columns": ["A", "B"],
      "filters": [
        {"field": "A", "operator": "equals", "value": "x"},
        {"field": "B", "operator": "not_in", "values": ["p", "q"]}],
      "order_by": [{"field": "B", "dir": "desc"}, {"field": "A"}],
      "limit": 10}""")
    val (sql, residual) = QueryBuilder.compile(q)
    assert(sql ==
      """SELECT "A", "B" FROM "T"""" +
      """ WHERE NOT (("A" IS NOT NULL AND "A" = 'x')""" +
      """ OR ("B" IS NULL OR "B" NOT IN ('p', 'q')))""" +
      """ ORDER BY "B" DESC, "A" ASC FETCH FIRST 10 ROWS ONLY""")
    assert(residual.isEmpty)
  }

  test("null-safe render mirrors FilterCompiler: NULL rows survive NOT(equals/in)") {
    // engine: equals/in never match a NULL cell (`c <=> v`), so NOT(skip)
    // KEEPS null rows; not_equals/not_in DO match NULL, so it drops them
    val eq = QueryBuilder.compile(QuerySpec("q", "T", Seq("A"), filters = Seq(
      FilterRule("A", "equals", Some("x")),
      FilterRule("B", "in", values = Seq("p")))))._1
    assert(eq.contains("""("A" IS NOT NULL AND "A" = 'x')"""))
    assert(eq.contains("""("B" IS NOT NULL AND "B" IN ('p'))"""))
    val ne = QueryBuilder.compile(QuerySpec("q", "T", Seq("A"), filters = Seq(
      FilterRule("A", "not_equals", Some("x")))))._1
    assert(ne.contains("""("A" IS NULL OR "A" <> 'x')"""))
  }

  test("a missing value compiles to the engine's null comparison, not ''") {
    // FilterCompiler builds `c <=> NULL` when value is absent — skip iff
    // the cell is NULL; the old render compared against '' instead
    val eqNull = QueryBuilder.compile(QuerySpec("q", "T", Seq("A"),
      filters = Seq(FilterRule("A", "equals", None))))._1
    assert(eqNull == """SELECT "A" FROM "T" WHERE NOT ("A" IS NULL)""")
    val neNull = QueryBuilder.compile(QuerySpec("q", "T", Seq("A"),
      filters = Seq(FilterRule("A", "not_equals", None))))._1
    assert(neNull == """SELECT "A" FROM "T" WHERE NOT ("A" IS NOT NULL)""")
  }

  test("contains rules are returned as residuals, not mistranslated") {
    val q = QuerySpec("q", "T", Seq("A"), filters = Seq(
      FilterRule("A", "equals", Some("x")),
      FilterRule("A", "contains", Some("z"))))
    val (sql, residual) = QueryBuilder.compile(q)
    assert(sql ==
      """SELECT "A" FROM "T" WHERE NOT (("A" IS NOT NULL AND "A" = 'x'))""")
    assert(residual.map(_.operator) == Seq("contains"))
  }

  test("identifiers are validated — a crafted name throws, never quotes") {
    val bad = QuerySpec("q", """T" ; DROP TABLE X --""", Seq("A"))
    intercept[IllegalArgumentException](QueryBuilder.compile(bad))
    val badCol = QuerySpec("q", "T", Seq("""A" OR "1"="1"""))
    intercept[IllegalArgumentException](QueryBuilder.compile(badCol))
  }

  test("literal values escape embedded quotes") {
    val q = QuerySpec("q", "T", Seq("A"),
      filters = Seq(FilterRule("A", "equals", Some("o'brien"))))
    assert(QueryBuilder.compile(q)._1.contains("'o''brien'"))
  }

  test("empty-state edges: no filters/order/limit, empty columns rejected") {
    assert(QueryBuilder.compile(QuerySpec("q", "T", Seq("A")))._1
      == """SELECT "A" FROM "T"""")
    intercept[IllegalArgumentException](
      QueryBuilder.compile(QuerySpec("q", "T", Nil)))
    intercept[IllegalArgumentException](QueryBuilder.compile(
      QuerySpec("q", "T", Seq("A"), limit = Some(0L))))
    intercept[IllegalArgumentException](QueryBuilder.compile(
      QuerySpec("q", "T", Seq("A"), orderBy = Seq(OrderKey("A", "sideways")))))
    // empty IN lists would render invalid SQL — rejected at build time
    intercept[IllegalArgumentException](QueryBuilder.compile(
      QuerySpec("q", "T", Seq("A"), filters = Seq(FilterRule("A", "in")))))
    intercept[IllegalArgumentException](QueryBuilder.compile(
      QuerySpec("q", "T", Seq("A"), filters = Seq(FilterRule("A", "not_in")))))
  }
}
