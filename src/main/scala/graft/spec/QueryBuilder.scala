package graft.spec

/** Source-side query builder (reference ROADMAP.md:35 "Query builder for
  * source data selection" — the last database-features row): compiles a
  * declarative query spec to ONE dialect SQL string the source database
  * executes, so selection, skip-rule filtering, total ordering, and the row
  * limit all run AT THE SOURCE — at warehouse scale only the selected,
  * filtered, limited rows ever cross the wire (k33's pushdown argument,
  * extended from WHERE to the whole query).
  *
  * Skip-rule semantics follow the reference (dynamic.py:57-82): a row
  * matching ANY rule is dropped, so the WHERE is `NOT (r1 OR r2 OR …)`,
  * with the Q1 `not_in` literal polarity preserved. Only operators whose
  * SQL translation is exactly the engine's semantics compile here
  * (equals / not_equals / in / not_in / is_empty / is_not_empty);
  * `contains` carries the Python `str(None)` quirk, so contains rules are
  * returned as RESIDUALS for the engine-side FilterCompiler — the k22
  * convention of claiming only what the source truly handled.
  *
  * Identifiers are validated (not quoted-and-hoped): a name that is not a
  * plain SQL identifier throws at build time, and literal values escape
  * embedded quotes — the spec file cannot inject SQL.
  */
final case class OrderKey(field: String, dir: String = "asc")

final case class QuerySpec(
    id: String,
    table: String,
    columns: Seq[String],
    filters: Seq[FilterRule] = Nil,
    orderBy: Seq[OrderKey] = Nil,
    limit: Option[Long] = None)

object QueryBuilder {

  private val Ident = "^[A-Za-z_][A-Za-z0-9_]*$".r

  private def ident(s: String): String = s match {
    case Ident() => "\"" + s + "\""
    case other => throw new IllegalArgumentException(
      s"not a plain SQL identifier: '$other'")
  }

  private def lit(v: String): String = "'" + v.replace("'", "''") + "'"

  /** one rule's MATCH predicate (the skip condition), or None if the rule
    * must stay engine-side.
    *
    * NULL handling mirrors FilterCompiler's null-safe `<=>` semantics
    * EXACTLY (round-11 advice: the naive `f = 'x'` / `f IN (...)` render
    * evaluates UNKNOWN on NULL inside `NOT(...)` and DROPS rows the engine
    * keeps). Three-valued logic is defused with explicit IS [NOT] NULL
    * conjuncts instead of boolean literals, so the SQL stays portable to
    * dialects without TRUE/FALSE:
    *   - equals 'x':      matches iff f IS NOT NULL AND f = 'x'
    *   - equals  ∅:       value absent → engine compares `c <=> NULL`,
    *                      i.e. matches iff f IS NULL (pushable, not '')
    *   - not_equals 'x':  matches iff f IS NULL OR f <> 'x'
    *   - not_equals ∅:    matches iff f IS NOT NULL
    *   - in (…):          matches iff f IS NOT NULL AND f IN (…)
    *   - not_in (…):      matches iff f IS NULL OR f NOT IN (…)  (Q1 polarity)
    */
  private def matchSql(r: FilterRule): Option[String] = {
    val f = ident(r.field)
    r.operator match {
      case "equals" => Some(r.value match {
        case Some(v) => s"($f IS NOT NULL AND $f = ${lit(v)})"
        case None    => s"$f IS NULL"
      })
      case "not_equals" => Some(r.value match {
        case Some(v) => s"($f IS NULL OR $f <> ${lit(v)})"
        case None    => s"$f IS NOT NULL"
      })
      case "in" =>
        // an empty list would render `IN ()` — invalid SQL; fail at build
        require(r.values.nonEmpty, s"in rule on ${r.field}: empty value list")
        Some(s"($f IS NOT NULL AND $f IN (${r.values.map(lit).mkString(", ")}))")
      // Q1 literal polarity: skip if NOT in the list
      case "not_in" =>
        require(r.values.nonEmpty, s"not_in rule on ${r.field}: empty value list")
        Some(s"($f IS NULL OR $f NOT IN (${r.values.map(lit).mkString(", ")}))")
      case "is_empty"     => Some(s"($f IS NULL OR $f = '')")
      case "is_not_empty" => Some(s"($f IS NOT NULL AND $f <> '')")
      case _              => None // contains (str(None) quirk) etc: residual
    }
  }

  /** (sql, residual rules the engine must still apply after the read). */
  def compile(q: QuerySpec): (String, Seq[FilterRule]) = {
    require(q.columns.nonEmpty, s"query ${q.id}: no columns")
    val (pushed, residual) = q.filters.partition(r => matchSql(r).isDefined)
    val select = q.columns.map(ident).mkString(", ")
    val where =
      if (pushed.isEmpty) ""
      else " WHERE NOT (" + pushed.flatMap(matchSql).mkString(" OR ") + ")"
    val order =
      if (q.orderBy.isEmpty) ""
      else " ORDER BY " + q.orderBy.map { k =>
        val d = k.dir.toLowerCase match {
          case "asc" => "ASC"
          case "desc" => "DESC"
          case other => throw new IllegalArgumentException(s"bad dir: $other")
        }
        s"${ident(k.field)} $d"
      }.mkString(", ")
    val fetch = q.limit.map { n =>
      require(n > 0, s"query ${q.id}: non-positive limit")
      s" FETCH FIRST $n ROWS ONLY"
    }.getOrElse("")
    (s"SELECT $select FROM ${ident(q.table)}$where$order$fetch", residual)
  }
}
