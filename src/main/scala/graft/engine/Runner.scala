package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.spec.ETLMapping
import graft.compile.TransformCompiler

/** One row-level error (reference RowError, dynamic.py:14-21; row_data is
  * reconstructable by line number and intentionally not duplicated). */
final case class RowError(
    line_number: Long,
    field: String,
    error_message: String,
    source_value: String)

/** Run summary (reference TransformResult, dynamic.py:24-40):
  *  - successCount: rows transformed with no field errors
  *  - skippedCount: rows dropped by filter rules (plus ALL rows when the
  *    mapping has zero field_mappings — empty dict is falsy,
  *    dynamic.py:309-318)
  *  - errorCount: number of field errors, not errored rows
  */
final case class TransformResult(
    successCount: Long,
    skippedCount: Long,
    errorCount: Long,
    errors: Seq[RowError],
    written: Boolean)

/** The dynamic-mapping engine: mapping JSON compiles once to a single
  * filter+project plan (scan → filter(!skip) → select(T* columns + error
  * array)); Catalyst pushes the filter into the scan and codegens the
  * projection — the per-row Python interpretation of the reference
  * (dynamic.py:239-348) becomes one shuffle-free stage.
  */
object Runner {
  /** Upper bound on per-row error DETAIL collected to the driver (counts
    * stay exact). Far above any interactive file; a 100 TB adversarial
    * input cannot OOM the driver through the compat path. */
  val MaxCollectedErrors = 100000

  private[engine] val LINE = "__line_number"
  private[engine] val SKIP = "__skip"
  private[engine] val ERRS = "__errors"
  private val ERR_TYPE = "array<struct<field:string,error_message:string,source_value:string>>"

  /** Annotated plan: all input rows, plus skip flag, destination values and
    * error array. Lazy — callers pick the action. */
  def plan(df: DataFrame, m: ETLMapping): DataFrame = {
    val schema = df.columns.toSet - LINE
    val cm = TransformCompiler.compile(m, schema)
    val lineCol = if (df.columns.contains(LINE)) col(LINE) else lit(-1L).as(LINE)
    val skip = cm.skip
    // field values & errors are only meaningful on non-skipped rows
    val valueCols = cm.fields.map { case (d, c) => when(!skip, c).as(d) }
    val errCol = when(skip, array().cast(ERR_TYPE)).otherwise(cm.errors.cast(ERR_TYPE)).as(ERRS)
    df.select(lineCol.cast("long").as(LINE) +: skip.as(SKIP) +: errCol +: valueCols: _*)
  }

  def destFields(m: ETLMapping): Seq[String] =
    TransformCompiler.compile(m, Set.empty).destOrder

  private[engine] final case class Counts(skipped: Long, clean: Long, errs: Long, total: Long)

  private[engine] def summarize(planned: DataFrame, m: ETLMapping,
                        collectErrors: Boolean): (TransformResult, Counts) = {
    val emptyMapping = m.fieldMappings.isEmpty
    val agg = planned.agg(
      coalesce(sum(when(col(SKIP), 1L).otherwise(0L)), lit(0L)).as("skipped"),
      coalesce(sum(when(!col(SKIP) && size(col(ERRS)) === 0, 1L).otherwise(0L)), lit(0L)).as("clean"),
      coalesce(sum(when(!col(SKIP), size(col(ERRS)).cast("long")).otherwise(0L)), lit(0L)).as("errs"),
      count(lit(1)).as("total")
    ).head()
    val c = Counts(agg.getLong(0), agg.getLong(1), agg.getLong(2), agg.getLong(3))
    val errors: Seq[RowError] =
      if (collectErrors && c.errs > 0) {
        import planned.sparkSession.implicits._
        // driver-side error detail is BOUNDED: adversarial input with an
        // error on every row must not OOM the driver (errorCount still
        // reports the true total; past the cap, per-row detail comes from
        // errorDataset/convertAtScale). Deterministic prefix: lowest line
        // numbers first, not first-collected partitions.
        planned.filter(!col(SKIP) && size(col(ERRS)) > 0)
          .select(col(LINE), explode(col(ERRS)).as("e"))
          .select(col(LINE).as("line_number"), col("e.field"),
                  col("e.error_message"), col("e.source_value"))
          .orderBy(col("line_number"), col("field"), col("error_message"))
          .limit(MaxCollectedErrors)
          .as[RowError].collect().toSeq
      } else Nil
    val result =
      if (emptyMapping) TransformResult(0L, c.total, 0L, Nil, written = false)
      else TransformResult(c.clean, c.skipped, c.errs, errors, written = false)
    (result, c)
  }

  /** Dry-run (reference validate_file, dynamic.py:259-265). */
  def validate(df: DataFrame, m: ETLMapping): TransformResult =
    summarize(plan(df, m), m, collectErrors = true)._1

  // --- t12: aggregation transforms in the mapping DSL -----------------------
  // Reference ROADMAP.md:51 plans `sum/count/avg` as a transform type but
  // never implemented it, so the semantics here are defined by this engine
  // (documented, oracle-pinned):
  //   * `transform_type: "aggregate"`, config
  //     `{group_by: [dest fields...], agg: "sum"|"count"|"avg"}` +
  //     the FieldMapping's own source_field as the aggregated input;
  //   * filter rules skip rows FIRST (pre-aggregation), row-level transforms
  //     build the group keys, and every aggregate entry in one mapping must
  //     declare the same group_by;
  //   * sum/avg parse the source with H5 leniency (strip commas,
  //     empty/unparsable -> 0.0) and ACCUMULATE IN DECIMAL(38,12) so the
  //     result is order-independent — a float fold would differ run-to-run
  //     under Spark's partial aggregation (and at 1000 executors); avg =
  //     decimal sum cast double / row count (exact IEEE division);
  //   * count counts truthy source values (non-empty, the engine's falsy
  //     convention), or all surviving rows when source_field is absent;
  //   * outputs render per §1.3.2 (`%.8f` then strip — money8), counts as
  //     plain integers; row-level destinations not named in group_by have
  //     no defined post-aggregation value and are dropped.
  // Scale shape: one hash aggregation with map-side partial combine on the
  // group keys — the same plan TPC-H q1 runs; no extra shuffle beyond the
  // groupBy exchange.

  def hasAggregates(m: ETLMapping): Boolean =
    m.fieldMappings.exists(_.transformType == "aggregate")

  /** Grouped output frame for a mapping with aggregate fields: group keys +
    * formatted aggregate strings, columns in field_mappings order. */
  def aggregatePlan(df: DataFrame, m: ETLMapping): DataFrame = {
    import graft.spec.FieldMapping
    val (aggFms, rowFms) = m.fieldMappings.partition(_.transformType == "aggregate")
    require(aggFms.nonEmpty, "aggregatePlan needs at least one aggregate field")
    val schema = df.columns.toSet - LINE
    val groupBys = aggFms.map(_.config.get("group_by") match {
      case Some(l: List[_]) => l.map(String.valueOf)
      case Some(s: String)  => Seq(s)
      case _                => Nil
    })
    val groupBy = groupBys.head
    require(groupBys.forall(_ == groupBy),
      s"all aggregate fields must share one group_by; saw ${groupBys.distinct}")
    val cm = TransformCompiler.compile(m.copy(fieldMappings = rowFms), schema)
    val rowDests = cm.destOrder.toSet
    require(groupBy.forall(rowDests.contains),
      s"group_by names destination fields; missing: ${groupBy.filterNot(rowDests.contains)}")

    def srcOf(fm: FieldMapping): Column =
      TransformCompiler.compileField(fm.copy(transformType = "direct"), schema).value
    // H5 lenient float (revolut_stocks.py:104-111): strip commas, 0.0 fallback
    def h5(c: Column): Column =
      coalesce(regexp_replace(c.cast("string"), ",", "").try_cast("double"), lit(0.0))

    val keyCols = cm.fields.filter { case (d, _) => groupBy.contains(d) }
      .map { case (d, c) => c.as(d) }
    val aggIns = aggFms.zipWithIndex.map { case (fm, i) =>
      srcOf(fm).as(s"__agg_in_$i")
    }
    val base = df.filter(!cm.skip).select(keyCols ++ aggIns: _*)

    val dec = "decimal(38,12)"
    val aggExprs = aggFms.zipWithIndex.map { case (fm, i) =>
      val in = col(s"__agg_in_$i")
      fm.config.get("agg").map(String.valueOf).getOrElse("count") match {
        case "sum" =>
          CsvSink.money8Udf(coalesce(sum(h5(in).cast(dec)), lit(0).cast(dec))
            .cast("double")).as(fm.destinationField)
        case "avg" =>
          CsvSink.money8Udf(coalesce(sum(h5(in).cast(dec)), lit(0).cast(dec))
            .cast("double") / count(lit(1))).as(fm.destinationField)
        case "count" =>
          (if (fm.sourceField.isEmpty) count(lit(1))
           else sum(when(in.isNotNull && in =!= "", 1L).otherwise(0L)))
            .cast("string").as(fm.destinationField)
        case other =>
          throw new IllegalArgumentException(
            s"aggregate field '${fm.destinationField}': unknown agg '$other'")
      }
    }
    val grouped = base.groupBy(groupBy.map(col): _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
    // output order = field_mappings first-occurrence order over the
    // surviving destinations (§1.3.4 header convention)
    val outOrder = m.fieldMappings.map(_.destinationField).distinct
      .filter(d => groupBy.contains(d) || aggFms.exists(_.destinationField == d))
    grouped.select(outOrder.map(col): _*)
  }

  /** Transform + conditional write (reference transform_file,
    * dynamic.py:267-278, 334-343): output written only when there are
    * surviving rows AND (no errors OR !failOnError); errored rows are still
    * written when the gate allows (quirk Q4).
    *
    * The two-phase gate needs error counts before writing — `cache()` here;
    * at 100 TB swap for `observe()` metrics + quarantine-path rewrite.
    */
  def convert(df: DataFrame, m: ETLMapping, outFile: String,
              failOnError: Boolean = true): TransformResult = {
    val planned = plan(df, m).cache()
    try {
      val (result, counts) = summarize(planned, m, collectErrors = true)
      val fields = TransformCompiler.compile(m, df.columns.toSet - LINE).destOrder
      // reference gate: `results` non-empty (any non-skipped row producing a
      // non-empty dict) and no errors unless failOnError is off
      val anyRows = fields.nonEmpty && (counts.total - counts.skipped) > 0
      val shouldWrite = anyRows && (result.errorCount == 0 || !failOnError)
      if (shouldWrite) {
        if (hasAggregates(m)) {
          // t12: the written output is the grouped frame (header = its
          // field_mappings-ordered columns), sorted by group key so the
          // single-file output is deterministic; the gate/counters above
          // stay row-level, computed on the pre-aggregation plan
          val out = aggregatePlan(df, m)
          val keys = out.columns.filterNot(c =>
            m.fieldMappings.exists(fm =>
              fm.destinationField == c && fm.transformType == "aggregate"))
          val sorted = if (keys.isEmpty) out else out.orderBy(keys.map(col): _*)
          CsvSink.writeSingleFile(sorted, out.columns.toSeq, outFile)
        } else {
          val kept = planned.filter(!col(SKIP))
          CsvSink.writeSingleFile(kept.select(fields.map(col): _*), fields, outFile)
        }
        result.copy(written = true)
      } else result
    } finally planned.unpersist()
  }

  /** Scale-mode convert: ONE pass instead of cache + count + write. The
    * plan streams straight to a directory sink (no single-file coalesce, no
    * caching of the whole input) while `observe()` accumulates the gate
    * metrics on the same pass; if the fail-on-error gate then trips, the
    * output directory is deleted (cheap metadata op) — the quarantine-commit
    * pattern for inputs that don't fit in cache at 100 TB.
    *
    * Returns the same counters as `convert` (without per-row error detail —
    * at scale errors go to `errorDataset` jobs, not driver lists). */
  def convertAtScale(df: DataFrame, m: ETLMapping, outDir: String,
                     failOnError: Boolean = true): TransformResult = {
    val fields = TransformCompiler.compile(m, df.columns.toSet - LINE).destOrder
    // unique per call: concurrent converts in one session must not
    // cross-capture each other's observed metrics
    val gateName = s"etl_gate_${java.util.UUID.randomUUID().toString.take(8)}"
    val observed = plan(df, m)
      .observe(gateName,
        coalesce(sum(when(col(SKIP), 1L).otherwise(0L)), lit(0L)).as("skipped"),
        coalesce(sum(when(!col(SKIP) && size(col(ERRS)) === 0, 1L).otherwise(0L)), lit(0L)).as("clean"),
        coalesce(sum(when(!col(SKIP), size(col(ERRS)).cast("long")).otherwise(0L)), lit(0L)).as("errs"),
        count(lit(1)).as("total"))
    val kept = observed.filter(!col(SKIP)).select(fields.map(col): _*)
    // observed metrics surface on the EXECUTED QueryExecution (the write's),
    // delivered async via the listener bus — capture and await them
    val spark = df.sparkSession
    val captured = new java.util.concurrent.atomic.AtomicReference[Option[org.apache.spark.sql.Row]](None)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        qe.observedMetrics.get(gateName).foreach(r => captured.compareAndSet(None, Some(r)))
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    // stage-then-commit: the job writes to a staging dir; only a passing
    // gate publishes it (atomic directory move), so readers can never
    // observe a torn or gate-failed output at outDir
    val staging = outDir + ".__staging__"
    val metrics = try {
      CsvSink.write(kept, fields, staging)
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (captured.get().isEmpty && System.nanoTime() < deadline) Thread.sleep(20)
      captured.get().getOrElse(sys.error(s"$gateName metrics not delivered within 30s"))
    } finally spark.listenerManager.unregister(listener)
    val (skipped, clean, errs, total) =
      (metrics.getLong(0), metrics.getLong(1), metrics.getLong(2), metrics.getLong(3))
    val anyRows = fields.nonEmpty && (total - skipped) > 0
    val keep = anyRows && (errs == 0 || !failOnError)
    def rmTree(dir: String): Unit = {
      val p = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(p)) {
        java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
      }
    }
    if (keep) {
      rmTree(outDir)
      java.nio.file.Files.move(java.nio.file.Paths.get(staging),
        java.nio.file.Paths.get(outDir),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } else rmTree(staging)
    if (m.fieldMappings.isEmpty) TransformResult(0L, total, 0L, Nil, written = false)
    else TransformResult(clean, skipped, errs, Nil, written = keep)
  }

  /** Typed error dataset for downstream analysis (explode of the error
    * column — reference errors list). */
  def errorDataset(df: DataFrame, m: ETLMapping): Dataset[RowError] = {
    import df.sparkSession.implicits._
    val planned = plan(df, m)
    planned.filter(!col(SKIP) && size(col(ERRS)) > 0)
      .select(col(LINE), explode(col(ERRS)).as("e"))
      .select(col(LINE).as("line_number"), col("e.field"),
              col("e.error_message"), col("e.source_value"))
      .as[RowError]
  }
}
