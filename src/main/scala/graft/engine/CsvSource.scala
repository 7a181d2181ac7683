package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.spec.FileSpec

/** CSV ingestion per FileSpec (reference S1/S2, extractors/base.py:8-14,
  * dynamic.py:298-302). All columns are read as strings — the reference's
  * runtime is `dict[str, str]`; typed casts happen lazily downstream.
  *
  * Unlike the reference's dynamic engine (which hardcodes UTF-8 + comma,
  * dynamic.py:298-299 — SURVEY §1.3.6), the spec's delimiter/encoding are
  * honored here.
  */
object CsvSource {

  /** Python's csv.DictReader yields "" for empty cells (never None for a
    * present column) — coalesce Spark's CSV nulls to "" so downstream
    * truthiness/str() semantics match the reference's dict[str,str] rows. */
  private def pyStrings(df: DataFrame): DataFrame =
    df.select(df.columns.map(c =>
      coalesce(col(s"`$c`"), lit("")).as(c)): _*)

  /** Fast path: header-driven all-string read; scales to a directory glob
    * (one Spark job over many files — partitioned by file splits). */
  def read(spark: SparkSession, path: String, spec: FileSpec): DataFrame =
    pyStrings(spark.read
      .option("header", spec.hasHeader)
      .option("sep", spec.delimiter)
      .option("encoding", spec.encoding)
      .option("inferSchema", value = false)
      .option("mode", "PERMISSIVE")
      .csv(path))

  /** Provenance path: attaches the reference's 1-based file line numbers
    * (header = line 1, first data row = 2 — dynamic.py:302). Built from a
    * text scan + zipWithIndex (contiguous, unlike
    * monotonically_increasing_id) and from_csv for quoted-field parsing.
    *
    * Assumes no embedded newlines inside quoted fields (same rows the
    * reference's csv.DictReader would see line-aligned); use `read` when
    * line provenance isn't needed — it's the fast path at scale.
    */
  def readWithLineNumbers(spark: SparkSession, path: String, spec: FileSpec): DataFrame = {
    import spark.implicits._
    val lines = spark.read.text(path).as[String].rdd
      .zipWithIndex()
      .map { case (l, i) => (l, i + 1) } // 1-based file lines
    val df = spark.createDataFrame(lines).toDF("__line", "__line_number")
    val header = df.filter($"__line_number" === 1).head().getString(0)
    val colNames = parseHeader(header, spec.delimiter)
    val schema = StructType(colNames.map(StructField(_, StringType, nullable = true)))
    val opts = Map("sep" -> spec.delimiter)
    df.filter($"__line_number" > 1 && $"__line" =!= "")
      .withColumn("__parsed", from_csv($"__line", schema, opts))
      .select(col("__line_number") +:
        colNames.map(n => coalesce(col(s"__parsed.`$n`"), lit("")).as(n)): _*)
  }

  /** Record-ordinal provenance path: the reference's "line numbers" are
    * really `enumerate(DictReader, start=2)` — RECORD ordinals, which
    * diverge from physical file lines when a quoted field embeds a newline
    * (dynamic.py:302; pinned by the `multiline` golden). This reader parses
    * with multiLine=true (whole-file, unsplittable — compat path only; such
    * CSVs cannot split at scale anyway) and numbers records in file order. */
  def readRecordsWithOrdinals(spark: SparkSession, path: String, spec: FileSpec): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    val base = spark.read
      .option("header", spec.hasHeader)
      .option("sep", spec.delimiter)
      .option("encoding", spec.encoding)
      .option("multiLine", value = true)
      .option("inferSchema", value = false)
      .option("mode", "PERMISSIVE")
      .csv(path)
    val withOrd = base.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq((i + 2) +: r.toSeq)
    }
    val schema = StructType(StructField("__line_number", LongType, nullable = false) +:
      base.schema.fields.toSeq)
    val df = spark.createDataFrame(withOrd, schema)
    df.select(col("__line_number") +:
      base.columns.toSeq.map(c => coalesce(col(s"`$c`"), lit("")).as(c)): _*)
  }

  private[engine] def parseHeader(header: String, delimiter: String): Seq[String] = {
    // minimal RFC-4180 header split (quotes + doubled quotes)
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    val d = delimiter.head
    while (i < header.length) {
      val c = header.charAt(i)
      if (inQ) {
        if (c == '"' && i + 1 < header.length && header.charAt(i + 1) == '"') { cur.append('"'); i += 1 }
        else if (c == '"') inQ = false
        else cur.append(c)
      } else {
        if (c == '"') inQ = true
        else if (c == d) { out += cur.toString; cur.clear() }
        else cur.append(c)
      }
      i += 1
    }
    out += cur.toString
    out.result()
  }
}
