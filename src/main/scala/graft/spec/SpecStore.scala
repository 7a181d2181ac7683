package graft.spec

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.collection.immutable.VectorMap
import scala.jdk.CollectionConverters._
import java.nio.file.{Files, Paths}

/** JSON codec for the reference's config-file format (models.py:174-267
  * `SpecStore`): each file is a JSON object keyed by spec id. */
object SpecStore {
  private val mapper = new ObjectMapper()

  /** JsonNode → plain Scala value (String / Long / Double / Boolean / null /
    * List[Any] / Map[String, Any]); keeps transform_config faithful to the
    * raw JSON incl. nulls (e.g. lookup `_default: null`). */
  def anyOf(n: JsonNode): Any =
    if (n == null || n.isNull) null
    else if (n.isTextual) n.asText
    else if (n.isIntegralNumber) n.asLong
    else if (n.isNumber) n.asDouble
    else if (n.isBoolean) n.asBoolean
    else if (n.isArray) n.elements.asScala.map(anyOf).toList
    else VectorMap.from(n.properties.iterator.asScala.map(e => e.getKey -> anyOf(e.getValue)))

  private def optText(n: JsonNode, k: String): Option[String] =
    Option(n.get(k)).filterNot(_.isNull).map(_.asText)
  private def text(n: JsonNode, k: String, d: String = ""): String =
    optText(n, k).getOrElse(d)
  private def bool(n: JsonNode, k: String, d: Boolean): Boolean =
    Option(n.get(k)).filterNot(_.isNull).map(_.asBoolean).getOrElse(d)
  private def arr(n: JsonNode, k: String): Seq[JsonNode] =
    Option(n.get(k)).filterNot(_.isNull).map(_.elements.asScala.toSeq).getOrElse(Nil)

  def columnSpec(n: JsonNode): ColumnSpec = ColumnSpec(
    name = text(n, "name"),
    colType = ColumnType.of(text(n, "type", "string")),
    sourceName = optText(n, "source_name"),
    maxLength = Option(n.get("max_length")).filterNot(_.isNull).map(_.asInt),
    required = bool(n, "required", d = false),
    default = Option(n.get("default")).filterNot(_.isNull).map(anyOf),
    dateFormat = optText(n, "date_format"))

  def fileSpec(n: JsonNode): FileSpec = FileSpec(
    id = text(n, "id"),
    name = text(n, "name"),
    description = text(n, "description"),
    defaultDirectory = text(n, "default_directory"),
    columns = arr(n, "columns").map(columnSpec),
    delimiter = text(n, "delimiter", ","),
    encoding = text(n, "encoding", "utf-8"),
    hasHeader = bool(n, "has_header", d = true))

  def filterRule(n: JsonNode): FilterRule = FilterRule(
    field = text(n, "field"),
    operator = text(n, "operator"),
    value = optText(n, "value"),
    values = arr(n, "values").map(_.asText),
    raw = anyOf(n).asInstanceOf[Map[String, Any]])

  def fieldMapping(n: JsonNode): FieldMapping = FieldMapping(
    destinationField = text(n, "destination_field"),
    sourceField = optText(n, "source_field"),
    transformType = text(n, "transform_type", "direct"),
    config = Option(n.get("transform_config")).filterNot(_.isNull)
      .map(c => anyOf(c).asInstanceOf[Map[String, Any]]).getOrElse(Map.empty))

  def etlMapping(n: JsonNode): ETLMapping = ETLMapping(
    id = text(n, "id"),
    name = text(n, "name"),
    sourceId = text(n, "source_id"),
    destinationId = text(n, "destination_id"),
    description = text(n, "description"),
    fieldMappings = arr(n, "field_mappings").map(fieldMapping),
    filterRules = arr(n, "filter_rules").map(filterRule))

  def connectionSpec(n: JsonNode): ConnectionSpec = ConnectionSpec(
    id = text(n, "id"),
    name = text(n, "name"),
    description = text(n, "description"),
    url = text(n, "url"),
    properties = Option(n.get("properties")).filterNot(_.isNull)
      .map(p => VectorMap.from(p.properties.iterator.asScala
        .map(e => e.getKey -> e.getValue.asText)))
      .getOrElse(VectorMap.empty),
    secretKeys = {
      val ks = arr(n, "secret_keys").map(_.asText)
      if (n.has("secret_keys")) ks else Seq("password")
    })

  def pipelineStep(n: JsonNode): PipelineStep = PipelineStep(
    mappingId = text(n, "mapping_id"),
    failOnError = bool(n, "fail_on_error", d = true))

  def pipelineSpec(n: JsonNode): PipelineSpec = PipelineSpec(
    id = text(n, "id"),
    name = text(n, "name"),
    description = text(n, "description"),
    steps = arr(n, "steps").map(pipelineStep))

  def querySpec(n: JsonNode): QuerySpec = QuerySpec(
    id = text(n, "id"),
    table = text(n, "table"),
    columns = arr(n, "columns").map(_.asText),
    filters = arr(n, "filters").map(filterRule),
    orderBy = arr(n, "order_by").map(o =>
      OrderKey(text(o, "field"), text(o, "dir", "asc"))),
    limit = Option(n.get("limit")).filterNot(_.isNull).map(_.asLong))

  def scheduleSpec(n: JsonNode): ScheduleSpec = ScheduleSpec(
    id = text(n, "id"),
    mappingId = text(n, "mapping_id"),
    every = text(n, "every"),
    at = optText(n, "at"),
    dow = Option(n.get("dow")).filterNot(_.isNull).map(_.asInt))

  def expectation(n: JsonNode): Expectation = Expectation(
    column = text(n, "column"),
    check = text(n, "check"),
    values = arr(n, "values").map(_.asText),
    lo = Option(n.get("lo")).filterNot(_.isNull).map(_.asDouble),
    hi = Option(n.get("hi")).filterNot(_.isNull).map(_.asDouble),
    pattern = optText(n, "pattern"))

  def expectationSuite(n: JsonNode): ExpectationSuite = ExpectationSuite(
    id = text(n, "id"),
    name = text(n, "name"),
    table = text(n, "table"),
    expectations = arr(n, "expectations").map(expectation))

  def runRecord(n: JsonNode): RunRecord = RunRecord(
    id = text(n, "id"),
    mappingId = text(n, "mapping_id"),
    kind = text(n, "kind", "convert"),
    inputFile = text(n, "input_file"),
    outputFile = optText(n, "output_file"),
    successCount = Option(n.get("success_count")).filterNot(_.isNull).map(_.asLong).getOrElse(0L),
    skippedCount = Option(n.get("skipped_count")).filterNot(_.isNull).map(_.asLong).getOrElse(0L),
    errorCount = Option(n.get("error_count")).filterNot(_.isNull).map(_.asLong).getOrElse(0L),
    written = bool(n, "written", d = false),
    startedAt = text(n, "started_at"),
    finishedAt = text(n, "finished_at"))

  private def readKeyed[T](path: String, f: JsonNode => T): Map[String, T] = {
    val root = mapper.readTree(Files.readString(Paths.get(path)))
    VectorMap.from(root.properties.iterator.asScala.map(e => e.getKey -> f(e.getValue)))
  }

  def loadFileSpecs(path: String): Map[String, FileSpec] =
    if (Files.exists(Paths.get(path))) readKeyed(path, fileSpec) else VectorMap.empty
  def loadMappings(path: String): Map[String, ETLMapping] =
    if (Files.exists(Paths.get(path))) readKeyed(path, etlMapping) else VectorMap.empty

  def loadPipelines(path: String): Map[String, PipelineSpec] =
    if (Files.exists(Paths.get(path))) readKeyed(path, pipelineSpec) else VectorMap.empty

  def loadConnections(path: String): Map[String, ConnectionSpec] =
    if (Files.exists(Paths.get(path))) readKeyed(path, connectionSpec) else VectorMap.empty

  def loadSchedules(path: String): Map[String, ScheduleSpec] =
    if (Files.exists(Paths.get(path))) readKeyed(path, scheduleSpec)
    else VectorMap.empty
  def parseSchedule(json: String): ScheduleSpec =
    scheduleSpec(mapper.readTree(json))
  def parseQuery(json: String): QuerySpec = querySpec(mapper.readTree(json))

  def loadExpectationSuites(path: String): Map[String, ExpectationSuite] =
    if (Files.exists(Paths.get(path))) readKeyed(path, expectationSuite)
    else VectorMap.empty

  def parseMapping(json: String): ETLMapping = etlMapping(mapper.readTree(json))
  def parseExpectationSuite(json: String): ExpectationSuite =
    expectationSuite(mapper.readTree(json))
  def parseFileSpec(json: String): FileSpec = fileSpec(mapper.readTree(json))
  def parsePipeline(json: String): PipelineSpec = pipelineSpec(mapper.readTree(json))
  /** Generic JSON → plain Scala tree (VectorMap/List/primitives). */
  def parseAny(json: String): Any = anyOf(mapper.readTree(json))

  // ---- write side (models.py:174-267 save_*/delete_*): read-modify-write
  // the keyed JSON file, byte-compatible with json.dump(..., indent=2) ----

  def saveFileSpecs(path: String, specs: collection.Map[String, FileSpec]): Unit =
    Files.writeString(Paths.get(path), SpecJson.dumpFileSpecs(specs))

  def saveMappings(path: String, ms: collection.Map[String, ETLMapping]): Unit =
    Files.writeString(Paths.get(path), SpecJson.dumpMappings(ms))

  /** CPython dict upsert: an existing key keeps its position, a new key
    * appends. (VectorMap's `+` moves an updated key to the end, so replace
    * in place explicitly.) */
  private def upsertOrdered[T](m: Map[String, T], k: String, v: T): Map[String, T] =
    if (m.contains(k)) VectorMap.from(m.map { case (k0, v0) => k0 -> (if (k0 == k) v else v0) })
    else m + (k -> v)

  /** save_source/save_destination twin. */
  def upsertFileSpec(path: String, spec: FileSpec): Unit =
    saveFileSpecs(path, upsertOrdered(loadFileSpecs(path), spec.id, spec))

  /** delete_source/delete_destination twin; false when the id is absent. */
  def deleteFileSpec(path: String, id: String): Boolean = {
    val specs = loadFileSpecs(path)
    if (!specs.contains(id)) false
    else { saveFileSpecs(path, specs - id); true }
  }

  def upsertMapping(path: String, m: ETLMapping): Unit =
    saveMappings(path, upsertOrdered(loadMappings(path), m.id, m))

  def savePipelines(path: String, ps: collection.Map[String, PipelineSpec]): Unit =
    Files.writeString(Paths.get(path), SpecJson.dumpPipelines(ps))

  def saveConnections(path: String, cs: collection.Map[String, ConnectionSpec]): Unit =
    Files.writeString(Paths.get(path), SpecJson.dumpConnections(cs))

  def upsertConnection(path: String, c: ConnectionSpec): Unit =
    saveConnections(path, upsertOrdered(loadConnections(path), c.id, c))

  def deleteConnection(path: String, id: String): Boolean = {
    val cs = loadConnections(path)
    if (!cs.contains(id)) false
    else { saveConnections(path, cs - id); true }
  }

  def upsertPipeline(path: String, p: PipelineSpec): Unit =
    savePipelines(path, upsertOrdered(loadPipelines(path), p.id, p))

  def deletePipeline(path: String, id: String): Boolean = {
    val ps = loadPipelines(path)
    if (!ps.contains(id)) false
    else { savePipelines(path, ps - id); true }
  }

  // ---- D6 mapping-template library: templates.json holds UNBOUND mappings
  // (same wire shape as mappings.json — ETLMapping's codec/serializer are
  // reused byte-for-byte); instantiation copies a template into the mapping
  // store under new identity/bindings (Templates.instantiate) ----

  def loadTemplates(path: String): Map[String, ETLMapping] = loadMappings(path)

  def saveTemplates(path: String, ts: collection.Map[String, ETLMapping]): Unit =
    saveMappings(path, ts)

  def upsertTemplate(path: String, t: ETLMapping): Unit =
    saveTemplates(path, upsertOrdered(loadTemplates(path), t.id, t))

  def deleteTemplate(path: String, id: String): Boolean = {
    val ts = loadTemplates(path)
    if (!ts.contains(id)) false
    else { saveTemplates(path, ts - id); true }
  }

  def loadRuns(path: String): Map[String, RunRecord] =
    if (Files.exists(Paths.get(path))) readKeyed(path, runRecord) else VectorMap.empty

  def saveRuns(path: String, rs: collection.Map[String, RunRecord]): Unit =
    Files.writeString(Paths.get(path), SpecJson.dumpRuns(rs))

  /** Append one run (ids are caller-unique; an existing id keeps position —
    * the CPython dict upsert all stores share). */
  def appendRun(path: String, r: RunRecord): Unit =
    saveRuns(path, upsertOrdered(loadRuns(path), r.id, r))

  // Store-level lock for run-id allocation (round-12 verdict item 6): id
  // monotonicity must not depend on the HTTP server happening to be
  // single-threaded — two concurrent converts get DISTINCT ids and both
  // records survive. One JVM owns a config dir's stores, so an object
  // monitor is the right scope (same assumption every SpecStore write
  // already makes).
  private val runsLock = new Object

  /** Atomically allocate the next `run_N` id and append the built record. */
  def appendRunNext(path: String, build: Int => RunRecord): RunRecord =
    runsLock.synchronized {
      val rs = loadRuns(path)
      val rec = build(rs.size)
      saveRuns(path, upsertOrdered(rs, rec.id, rec))
      rec
    }

  /** Batch form for the per-directory process loop: ONE load+save for the
    * whole batch (the O(files × history) fix stays), ids allocated
    * contiguously under the same lock. */
  def appendRunsNext(path: String, builds: Seq[Int => RunRecord]): Seq[RunRecord] =
    runsLock.synchronized {
      val rs = loadRuns(path)
      val recs = builds.zipWithIndex.map { case (b, i) => b(rs.size + i) }
      saveRuns(path, recs.foldLeft(rs)((m, r) => upsertOrdered(m, r.id, r)))
      recs
    }

  def parseRun(json: String): RunRecord = runRecord(mapper.readTree(json))

  def deleteMapping(path: String, id: String): Boolean = {
    val ms = loadMappings(path)
    if (!ms.contains(id)) false
    else { saveMappings(path, ms - id); true }
  }
}
