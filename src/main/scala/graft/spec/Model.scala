package graft.spec

/** Declarative schema/mapping model, JSON-interoperable with the reference's
  * config files (`data/config/{sources,destinations,mappings}.json`).
  *
  * Mirrors /root/reference/src/converter_dashboard/models.py:10-171 —
  * `ColumnType` (models.py:10-17), `ColumnSpec` (:32-64), `FileSpec`
  * (:67-102), `FieldMapping`/`TransformType` (:20-29, 105-135),
  * `FilterRule` + `ETLMapping` (:138-171). Field names in JSON are the
  * reference's snake_case keys.
  */
sealed abstract class ColumnType(val name: String)
object ColumnType {
  case object StringT   extends ColumnType("string")
  case object IntegerT  extends ColumnType("integer")
  case object FloatT    extends ColumnType("float")
  case object DateT     extends ColumnType("date")
  case object DatetimeT extends ColumnType("datetime")
  case object BooleanT  extends ColumnType("boolean")
  case object MoneyT    extends ColumnType("money")
  val all: Seq[ColumnType] = Seq(StringT, IntegerT, FloatT, DateT, DatetimeT, BooleanT, MoneyT)
  def of(s: String): ColumnType = all.find(_.name == s).getOrElse(StringT)
}

final case class ColumnSpec(
    name: String,
    colType: ColumnType = ColumnType.StringT,
    sourceName: Option[String] = None,
    maxLength: Option[Int] = None,
    required: Boolean = false,
    default: Option[Any] = None,
    dateFormat: Option[String] = None)

final case class FileSpec(
    id: String,
    name: String,
    description: String = "",
    defaultDirectory: String = "",
    columns: Seq[ColumnSpec] = Nil,
    delimiter: String = ",",
    encoding: String = "utf-8",
    hasHeader: Boolean = true)

/** One skip rule; a row matching ANY rule is dropped (rules are OR'd —
  * reference dynamic.py:57-82). `value` for scalar ops, `values` for set
  * ops. The literal skip-if-match polarity (incl. `not_in`, quirk Q1 in
  * SURVEY.md §2) is preserved. */
final case class FilterRule(
    field: String,
    operator: String,
    value: Option[String] = None,
    values: Seq[String] = Nil,
    /** Raw parsed JSON object — the reference stores rules as pass-through
      * dicts (models.py:149 `filter_rules: list[dict]`), so saving must
      * reproduce the original keys/order, not a typed projection. */
    raw: Map[String, Any] = Map.empty)

/** One destination field: `transformType` ∈ {direct, constant, date_format,
  * lookup, suffix, prefix, formula, conditional}; unknown types fall back to
  * direct (reference dynamic.py:185). `config` carries the raw JSON object
  * (for `lookup` the config IS the lookup table). */
final case class FieldMapping(
    destinationField: String,
    sourceField: Option[String] = None,
    transformType: String = "direct",
    config: Map[String, Any] = Map.empty)

final case class ETLMapping(
    id: String,
    name: String,
    sourceId: String,
    destinationId: String,
    description: String = "",
    fieldMappings: Seq[FieldMapping] = Nil,
    filterRules: Seq[FilterRule] = Nil)

/** A named database/endpoint connection (reference ROADMAP.md database
  * features — k32): `url` and property VALUES may embed `${ENV_VAR}`
  * references resolved at use time (spec.Connections.resolve*). Keys
  * listed in `secretKeys` are REDACTED when the store writes the spec to
  * disk unless their value is itself an env reference — a literal secret
  * never round-trips through connections.json. */
final case class ConnectionSpec(
    id: String,
    name: String,
    description: String = "",
    url: String = "",
    properties: Map[String, String] = Map.empty,
    secretKeys: Seq[String] = Seq("password"))

/** One step of a declarative mapping chain (reference ROADMAP.md:53
  * "multi-step pipelines" — planned, never implemented there; semantics
  * defined by this engine at graft.engine.Pipeline). `failOnError`
  * carries the K3 gate to the stage boundary. */
final case class PipelineStep(
    mappingId: String,
    failOnError: Boolean = true)

/** A pipeline: ordered mapping ids, destination of step N feeding step
  * N+1's source. Stored in the SpecStore's keyed-JSON format
  * (`pipelines.json`) like sources/destinations/mappings. */
final case class PipelineSpec(
    id: String,
    name: String,
    description: String = "",
    steps: Seq[PipelineStep] = Nil)

/** One conversion schedule (reference ROADMAP.md:48 "Scheduled/automated
  * conversions" — planned, never implemented there; semantics defined by
  * this engine at spec.Schedules). `every` is the step ("6 hours",
  * "1 day", "7 days"); `at` ("HH:MM") aligns daily+ steps within the day;
  * `dow` (1 = Monday .. 7 = Sunday) aligns weekly steps. Stored in the
  * SpecStore's keyed-JSON format (`schedules.json`). */
final case class ScheduleSpec(
    id: String,
    mappingId: String,
    every: String,
    at: Option[String] = None,
    dow: Option[Int] = None)

/** One declarative data-quality expectation (dq20). `check` ∈ {not_null,
  * unique, accepted_values, range, regex_match}. NULL handling follows the
  * composable convention: only `not_null` counts NULLs — value checks
  * (accepted_values / range / regex_match) skip NULL cells so each rule
  * audits exactly one property. `unique` counts surplus rows per repeated
  * non-null value (n − n_distinct). */
final case class Expectation(
    column: String,
    check: String,
    values: Seq[String] = Nil,
    lo: Option[Double] = None,
    hi: Option[Double] = None,
    pattern: Option[String] = None)

/** A named expectation suite over one table — the reference's config-file
  * idea (declarative JSON the dashboard edits) pointed at data quality;
  * stored keyed-by-id like sources/destinations/mappings. */
final case class ExpectationSuite(
    id: String,
    name: String,
    table: String = "",
    expectations: Seq[Expectation] = Nil)

/** One convert/validate/process run's persisted summary (D5 run history —
  * reference ROADMAP's "Conversion history and logs" UI row; app.py:215-224
  * aggregates these counts into the volatile Flask session, this store
  * makes them durable and queryable as a `runs.json` SpecStore type).
  * Timestamps are CALLER-injected ISO-8601 strings — the engine never reads
  * a clock (deterministic specs/oracles; the Dashboard injects real time
  * through its clock parameter). */
final case class RunRecord(
    id: String,
    mappingId: String,
    kind: String, // "convert" | "validate" | "process"
    inputFile: String,
    outputFile: Option[String],
    successCount: Long,
    skippedCount: Long,
    errorCount: Long,
    written: Boolean,
    startedAt: String,
    finishedAt: String)
