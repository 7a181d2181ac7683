package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.spec.{ETLMapping, PipelineSpec}

/** One pipeline stage's outcome. `ran = false` marks stages after a tripped
  * fail_on_error gate — exactly a sequential runner's behavior, where a
  * gated stage that errors writes nothing and downstream steps never run. */
final case class StageResult(
    mappingId: String,
    ran: Boolean,
    successCount: Long,
    skippedCount: Long,
    errorCount: Long)

final case class PipelineResult(
    stages: Seq[StageResult],
    written: Boolean,
    /** index of the stage whose gate aborted the chain, if any */
    gatedStage: Option[Int])

/** Declarative multi-step mapping chains — reference ROADMAP.md:53
  * ("Multi-step pipelines: destination of mapping A feeding mapping B"),
  * planned there and implemented here.
  *
  * Execution is ONE composed Catalyst plan: each step's destination columns
  * become the next step's source schema, stringified between stages with
  * the same Python-str semantics the CSV boundary applies (`None` → "",
  * floats via str(float)) so the chain is bit-identical to running each
  * mapping separately through Runner.convert and re-reading the
  * intermediate CSV — pinned both ways by PipelineSpec tests and the c17
  * oracle entry. Nothing materializes between steps UNLESS a step carries
  * `fail_on_error`: that forces the reference's K3 two-phase at the stage
  * boundary (persist + count errors before any downstream work), and a
  * tripped gate aborts the chain with no output written — the reference's
  * quarantine behavior (dynamic.py:334-343) lifted to chains.
  *
  * Ungated stage counters ride the plan as `observe()` metrics and are
  * collected from the final action's QueryExecution — zero extra passes.
  * Scale shape: an all-ungated chain is a single filter+project pipeline
  * (one stage, no shuffle; aggregate steps add exactly their groupBy
  * exchange); each fail_on_error gate adds one materialization boundary,
  * which is the cost the K3 semantics inherently require.
  *
  * Stage-2+ error DETAIL carries line_number -1 (the intermediate "file"
  * never exists, so there is no file line to report); counters are exact.
  */
object Pipeline {

  def runSpec(df: DataFrame, p: PipelineSpec,
              mappings: Map[String, ETLMapping], outFile: String): PipelineResult = {
    val steps = p.steps.map { s =>
      val m = mappings.getOrElse(s.mappingId,
        throw new IllegalArgumentException(
          s"pipeline '${p.id}': unknown mapping_id '${s.mappingId}'"))
      (m, s.failOnError)
    }
    run(df, steps, outFile)
  }

  /** The composed chain as one lazy frame — the all-ungated scale path and
    * the c17 oracle surface. Equivalent to run() with every gate off,
    * minus the metrics/write plumbing. */
  def compose(df: DataFrame, steps: Seq[ETLMapping]): DataFrame = {
    var cur = df
    steps.foreach { m =>
      require(m.fieldMappings.nonEmpty,
        s"pipeline step '${m.id}': empty field_mappings cannot feed a chain")
      cur = stringified(stageOutput(Runner.plan(cur, m), cur, m))
    }
    cur
  }

  def run(df: DataFrame, steps: Seq[(ETLMapping, Boolean)],
          outFile: String): PipelineResult = {
    require(steps.nonEmpty, "pipeline needs at least one step")
    steps.foreach { case (m, _) =>
      require(m.fieldMappings.nonEmpty,
        s"pipeline step '${m.id}': empty field_mappings cannot feed a chain")
    }
    val spark = df.sparkSession
    val runId = java.util.UUID.randomUUID().toString.take(8)

    // chain state
    var cur = df
    var abort: Option[Int] = None
    val persisted = List.newBuilder[DataFrame]
    // stage index -> either exact counters (gated) or observe metric name
    val gatedResults = scala.collection.mutable.Map[Int, StageResult]()
    val observeNames = scala.collection.mutable.Map[Int, String]()

    steps.zipWithIndex.foreach { case ((m, foe), i) =>
      if (abort.isEmpty) {
        if (foe) {
          // K3 two-phase at this boundary: materialize, gate, then continue
          // from the persisted frame (downstream work starts only if clean)
          val planned = Runner.plan(cur, m).persist()
          persisted += planned
          val (result, _) = Runner.summarize(planned, m, collectErrors = false)
          gatedResults(i) = StageResult(m.id, ran = true,
            result.successCount, result.skippedCount, result.errorCount)
          // reference write gate: any surviving row AND no errors (K3)
          val survivors = planned.filter(!col(Runner.SKIP)).limit(1).count()
          if (result.errorCount > 0 || survivors == 0) abort = Some(i)
          else cur = stringified(stageOutput(planned, cur, m))
        } else {
          val name = s"pipe_${runId}_$i"
          observeNames(i) = name
          val planned = Runner.plan(cur, m).observe(name,
            coalesce(sum(when(col(Runner.SKIP), 1L).otherwise(0L)), lit(0L)).as("skipped"),
            coalesce(sum(when(!col(Runner.SKIP) && size(col(Runner.ERRS)) === 0, 1L)
              .otherwise(0L)), lit(0L)).as("clean"),
            coalesce(sum(when(!col(Runner.SKIP), size(col(Runner.ERRS)).cast("long"))
              .otherwise(0L)), lit(0L)).as("errs"))
          cur = stringified(stageOutput(planned, cur, m))
        }
      }
    }

    // collect the ungated stages' observed metrics from whatever action
    // executes the final plan (the count below)
    val captured = new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.Row]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (k, v) =>
          if (k.startsWith(s"pipe_${runId}_")) captured.putIfAbsent(k, v)
        }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }

    val written =
      if (abort.nonEmpty) false
      else {
        spark.listenerManager.register(listener)
        try {
          val finalFrame = cur.persist()
          persisted += finalFrame
          val n = finalFrame.count()
          if (n > 0)
            CsvSink.writeSingleFile(finalFrame, finalFrame.columns.toSeq, outFile)
          // metrics are delivered async on the listener bus
          val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
          while (captured.size < observeNames.size && System.nanoTime() < deadline)
            Thread.sleep(10)
          n > 0
        } finally spark.listenerManager.unregister(listener)
      }

    persisted.result().foreach(_.unpersist())

    val stages = steps.zipWithIndex.map { case ((m, _), i) =>
      gatedResults.get(i).getOrElse {
        observeNames.get(i).flatMap(n => Option(captured.get(n))) match {
          case Some(r) =>
            StageResult(m.id, ran = true, r.getLong(1), r.getLong(0), r.getLong(2))
          case None => // after an abort (or an unexecuted chain) nothing ran
            StageResult(m.id, ran = false, 0L, 0L, 0L)
        }
      }
    }
    PipelineResult(stages, written, abort)
  }

  /** A stage's destination frame from its annotated plan (or the grouped
    * frame for an aggregate mapping — t12 steps chain like any other). */
  private def stageOutput(planned: DataFrame, stageIn: DataFrame,
                          m: ETLMapping): DataFrame =
    if (Runner.hasAggregates(m)) {
      // sorted by group key — the same deterministic order Runner.convert
      // writes, so an aggregate FINAL step stays byte-identical to the
      // sequential run
      val out = Runner.aggregatePlan(stageIn, m)
      val keys = out.columns.filterNot(c => m.fieldMappings.exists(fm =>
        fm.destinationField == c && fm.transformType == "aggregate"))
      if (keys.isEmpty) out else out.orderBy(keys.map(col): _*)
    } else {
      val dests = Runner.destFields(m)
      planned.filter(!col(Runner.SKIP)).select(dests.map(col): _*)
    }

  /** The CSV-boundary string semantics a sequential run would apply between
    * mappings: Python str() per type, null → "" (csv.DictWriter + the
    * DictReader round-trip). Applying it in-plan keeps chain == sequential
    * bit-for-bit without materializing the intermediate file. */
  private def stringified(df: DataFrame): DataFrame =
    df.select(df.columns.toSeq.map(c =>
      coalesce(CsvSink.pyStringify(df, c), lit("")).as(c)): _*)
}
