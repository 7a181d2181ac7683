package graft.compile

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.spec.FilterRule

/** Compiles filter rules to a single skip predicate (reference
  * dynamic.py:57-82): a row matching ANY rule is skipped; the kept side is
  * the negation. All semantics are over raw string columns (the dynamic
  * engine's rows are `dict[str, str]`):
  *
  *   - equals:       skip if row[f] == value        (null-safe: null == null skips)
  *   - not_equals:   skip if row[f] != value        (null != "x" → skip, as Python)
  *   - in:           skip if row[f] ∈ values
  *   - not_in:       skip if row[f] ∉ values        (LITERAL polarity, quirk Q1)
  *   - is_empty:     skip if falsy ("" or null)
  *   - is_not_empty: skip if truthy
  *   - contains:     skip if value != "" && value ∈ str(row[f]); Python
  *                   str(None) == "None", reproduced for parity
  *
  * A rule naming a column absent from the schema sees null (Python
  * `row.get(field)`), so the predicate is built against lit(null).
  */
object FilterCompiler {

  /** Python str(x) view of a nullable string column (None → "None"). */
  private def pyStr(c: Column): Column = coalesce(c, lit("None"))

  def rulePredicate(rule: FilterRule, schema: Set[String]): Column = {
    val c: Column =
      if (schema.contains(rule.field)) col(rule.field)
      else lit(null).cast("string")
    val v = rule.value.map(lit(_)).getOrElse(lit(null).cast("string"))

    rule.operator match {
      case "equals"     => c <=> v
      case "not_equals" => !(c <=> v)
      case "in"         =>
        if (rule.values.isEmpty) lit(false)
        else rule.values.map(x => c <=> lit(x)).reduce(_ || _)
      case "not_in"     =>
        if (rule.values.isEmpty) lit(true)
        else !rule.values.map(x => c <=> lit(x)).reduce(_ || _)
      case "is_empty"     => c.isNull || c === ""
      case "is_not_empty" => !(c.isNull || c === "")
      case "contains"     =>
        rule.value match {
          case Some(s) if s.nonEmpty => pyStr(c).contains(s)
          case _                     => lit(false)
        }
      case _ => lit(false) // unknown operator: no rule matches (reference falls through)
    }
  }

  /** OR of all rules — true means the row is skipped. */
  def skipPredicate(rules: Seq[FilterRule], schema: Set[String]): Column =
    if (rules.isEmpty) lit(false)
    else rules.map(rulePredicate(_, schema)).reduce(_ || _)

  /** The kept side (what flows into the projection). */
  def keepPredicate(rules: Seq[FilterRule], schema: Set[String]): Column =
    !skipPredicate(rules, schema)
}
