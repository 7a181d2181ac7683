package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** CSV writer matching the reference's csv.DictWriter output
  * (csv_loader.py:11-23; dynamic.py:334-343):
  *   - header row in the given field order,
  *   - None → empty cell, Python str() for numerics/booleans,
  *   - QUOTE_MINIMAL with doubled quotes (Spark: escape = quote char).
  *
  * `writeSingleFile` reproduces the reference's one-output-file-per-input
  * contract via coalesce(1) + commit-rename; `write` is the scale path
  * (one directory of part files, fully parallel).
  */
object CsvSink {

  /** CPython str(float) as a Column-level UDF — the single shared instance
    * (TransformCompiler's formula render uses it too). */
  val pyFloatUdf = udf((d: java.lang.Double) =>
    if (d == null) null else PyFormat.pyFloatStr(d))

  /** §1.3.2 money format as a Column (exact CPython `f"{v:.8f}"` rounding —
    * HALF_EVEN on the binary value — then trailing-zero/dot strip; a
    * format-boundary UDF like pyFloatUdf, not a hot-path kernel). */
  val money8Udf = udf((d: java.lang.Double) =>
    if (d == null) null else PyFormat.money8(d))

  /** str(value) per Python semantics, as a Column. */
  def pyStringify(df: DataFrame, name: String): Column = {
    val c = col(s"`$name`")
    df.schema(name).dataType match {
      case StringType => c
      case DoubleType | FloatType => pyFloatUdf(c.cast("double"))
      case BooleanType => when(c, "True").otherwise("False")
      case _ => c.cast("string")
    }
  }

  private def prepared(df: DataFrame, fieldOrder: Seq[String]): DataFrame =
    df.select(fieldOrder.map(n => pyStringify(df, n).as(n)): _*)

  private def writer(df: DataFrame, delimiter: String) = {
    // csv.writer quirk: an empty (or None) value in a ONE-column row is
    // written as `""` — a quoted empty — so the record is distinguishable
    // from a blank line; in multi-column rows empties stay unquoted.
    // univocity substitutes empty/nullValue BEFORE quote processing, so the
    // two-char `""` lands raw, exactly as Python emits it.
    val lone = if (df.columns.length == 1) "\"\"" else ""
    df.write
      .option("header", value = true)
      .option("sep", delimiter)
      .option("escape", "\"")       // RFC-4180 doubled quotes, like csv module
      .option("emptyValue", lone)   // like DictWriter
      .option("nullValue", lone)
      // Spark's CSV writer TRIMS cell whitespace by default; csv.writer
      // preserves it verbatim (fuzz case: a value ending in '\n' lost its
      // newline inside the quoted cell)
      .option("ignoreLeadingWhiteSpace", value = false)
      .option("ignoreTrailingWhiteSpace", value = false)
      .mode("overwrite")
  }

  /** Scale path: parallel multi-part CSV directory. */
  def write(df: DataFrame, fieldOrder: Seq[String], outDir: String,
            delimiter: String = ","): Unit =
    writer(prepared(df, fieldOrder), delimiter).csv(outDir)

  /** Reference-compat path: exactly one CSV file at `outFile`. */
  def writeSingleFile(df: DataFrame, fieldOrder: Seq[String], outFile: String,
                      delimiter: String = ","): Unit = {
    val tmp = outFile + ".__tmp__"
    writer(prepared(df, fieldOrder).coalesce(1), delimiter).csv(tmp)
    val part = Files.list(Paths.get(tmp)).toArray.map(_.asInstanceOf[Path])
      .find(_.getFileName.toString.startsWith("part-"))
      .getOrElse(sys.error(s"no part file produced under $tmp"))
    val target = Paths.get(outFile)
    if (target.getParent != null) Files.createDirectories(target.getParent)
    Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
    // clean the temp dir
    Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }
}
