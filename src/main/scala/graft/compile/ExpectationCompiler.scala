package graft.compile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.spec.{Expectation, ExpectationSuite}

/** Compiles a declarative expectation suite (spec.ExpectationSuite — the
  * reference's config-JSON idea pointed at data quality) into ONE aggregate
  * pass over the audited table: every expectation becomes one counting
  * aggregate, the suite becomes a single `df.agg(...)`, and the 1×N result
  * row unpivots into the (check, col_name, n_violations, pass) audit frame.
  *
  * Scale shape: a suite of ANY size costs exactly one scan + one
  * map-side-combined aggregation — no per-rule scans, no joins. `unique`
  * rides the same pass as a distinct aggregate (Catalyst plans the Expand
  * for mixed distinct/plain aggregates; still one scan). NULL semantics per
  * the model's contract: only `not_null` counts NULLs.
  */
object ExpectationCompiler {

  private def violations(e: Expectation): Column = {
    val c = col(e.column)
    e.check match {
      case "not_null" =>
        sum(when(c.isNull, 1L).otherwise(0L))
      case "unique" =>
        count(c) - countDistinct(c)
      case "accepted_values" =>
        // an empty list would flag every non-null row — that is a spec
        // authoring error, not a data-quality finding
        require(e.values.nonEmpty,
          s"accepted_values ${e.column}: empty value list")
        sum(when(c.isNotNull &&
          !c.cast("string").isin(e.values: _*), 1L).otherwise(0L))
      case "range" =>
        val lo = e.lo.getOrElse(Double.NegativeInfinity)
        val hi = e.hi.getOrElse(Double.PositiveInfinity)
        sum(when(c.isNotNull &&
          (c.cast("double") < lo || c.cast("double") > hi), 1L).otherwise(0L))
      case "regex_match" =>
        val p = e.pattern.getOrElse(
          throw new IllegalArgumentException(s"regex_match ${e.column}: no pattern"))
        sum(when(c.isNotNull && !c.cast("string").rlike(p), 1L).otherwise(0L))
      case other =>
        throw new IllegalArgumentException(s"unknown expectation check: $other")
    }
  }

  /** One row per expectation: (check_name, col_name, n_violations, pass). */
  def audit(df: DataFrame, suite: ExpectationSuite): DataFrame = {
    require(suite.expectations.nonEmpty, s"suite ${suite.id}: no expectations")
    val aggs = suite.expectations.zipWithIndex.map { case (e, i) =>
      coalesce(violations(e), lit(0L)).cast("long").as(s"v_$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    def sq(s: String) = "'" + s.replace("'", "\\'") + "'"
    val stackArgs = suite.expectations.zipWithIndex.map { case (e, i) =>
      s"${sq(e.check)}, ${sq(e.column)}, v_$i"
    }.mkString(", ")
    one.selectExpr(
        s"stack(${suite.expectations.size}, $stackArgs) AS (check_name, col_name, n_violations)")
      .withColumn("pass", col("n_violations") === 0L)
  }
}
