package graft.spec

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
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
    else n.properties.asScala.map(e => e.getKey -> anyOf(e.getValue)).toMap

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
    values = arr(n, "values").map(_.asText))

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

  private def readKeyed[T](path: String, f: JsonNode => T): Map[String, T] = {
    val root = mapper.readTree(Files.readString(Paths.get(path)))
    root.properties.asScala.map(e => e.getKey -> f(e.getValue)).toMap
  }

  def loadFileSpecs(path: String): Map[String, FileSpec] = readKeyed(path, fileSpec)
  def loadMappings(path: String): Map[String, ETLMapping] = readKeyed(path, etlMapping)

  def parseMapping(json: String): ETLMapping = etlMapping(mapper.readTree(json))
  def parseFileSpec(json: String): FileSpec = fileSpec(mapper.readTree(json))
}
