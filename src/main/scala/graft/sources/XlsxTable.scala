package graft.sources

import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Excel .xlsx sink + source hand-rolled on java.util.zip + StAX — the
  * reference's highest-ranked spreadsheet roadmap item (ROADMAP.md:40
  * "Excel file support (.xlsx)"); no spreadsheet library ships on this
  * classpath, so the OOXML container is implemented directly, the same
  * genuine-custom-source pattern as AvroTable.
  *
  * Write: one `part-NNNNN.xlsx` per input partition — a minimal but
  * standard-conformant SpreadsheetML package ([Content_Types].xml, the two
  * .rels, workbook.xml, sheet1.xml) with a header row and one sheet row
  * per record. Strings are written as INLINE strings (`t="inlineStr"`,
  * XML-escaped) so no sharedStrings table is needed; numbers go through
  * `<v>` with the canonical Java decimal/int rendering. No shuffle, no
  * driver hop — parallel by input split, exactly the Avro/ORC sink shape.
  *
  * Read: files globbed once on the driver (metadata only), one task per
  * .xlsx; each task streams the zip to `xl/worksheets/sheet1.xml` and
  * StAX-parses rows — cells are taken in document order (the writer emits
  * every column), the header row is skipped, and values are decoded by the
  * caller's schema (long/int/double/string — the flat interchange subset).
  * An .xlsx is a single zip (not block-splittable), so per-file tasks are
  * the natural parallelism; read parallelism mirrors write parallelism
  * like the Avro source. Excel's 1,048,576-row sheet cap is a per-FILE
  * cap — at scale the per-partition layout keeps each file far under it.
  */
object XlsxTable {

  private def esc(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => b.append("&amp;")
        case '<' => b.append("&lt;")
        case '>' => b.append("&gt;")
        case '"' => b.append("&quot;")
        case c   => b.append(c)
      }
      i += 1
    }
    b.result()
  }

  private val ContentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
      |<Default Extension="xml" ContentType="application/xml"/>
      |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
      |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
      |</Types>""".stripMargin

  private val RootRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
      |</Relationships>""".stripMargin

  private val Workbook =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
      |<sheets><sheet name="data" sheetId="1" r:id="rId1"/></sheets>
      |</workbook>""".stripMargin

  private val WorkbookRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
      |</Relationships>""".stripMargin

  /** A1-style column name for 0-based index (0 → A, 25 → Z, 26 → AA). */
  private def colName(i: Int): String = {
    var n = i + 1
    val b = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; b.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    b.result()
  }

  private def confEntries(spark: SparkSession): Array[(String, String)] = {
    import scala.jdk.CollectionConverters._
    spark.sparkContext.hadoopConfiguration.iterator().asScala
      .map(e => e.getKey -> e.getValue).toArray
  }

  private def rebuild(entries: Array[(String, String)]): Configuration = {
    val c = new Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Write `df` as `part-NNNNN.xlsx` packages under `path`. */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val entries = confEntries(df.sparkSession)
    df.foreachPartition { (it: Iterator[Row]) =>
      val conf = rebuild(entries)
      val part = new Path(path, f"part-${TaskContext.getPartitionId()}%05d.xlsx")
      val fs = part.getFileSystem(conf)
      val out = fs.create(part, true)
      val zip = new ZipOutputStream(out)
      def entry(name: String, content: String): Unit = {
        zip.putNextEntry(new ZipEntry(name))
        zip.write(content.getBytes("UTF-8"))
        zip.closeEntry()
      }
      try {
        entry("[Content_Types].xml", ContentTypes)
        entry("_rels/.rels", RootRels)
        entry("xl/workbook.xml", Workbook)
        entry("xl/_rels/workbook.xml.rels", WorkbookRels)
        zip.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
        val w = new java.io.OutputStreamWriter(zip, "UTF-8")
        w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
        w.write("<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
        // header row: column names as inline strings
        w.write("<row r=\"1\">")
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          w.write(s"""<c r="${colName(i)}1" t="inlineStr"><is><t>${esc(f.name)}</t></is></c>""")
        }
        w.write("</row>")
        var rn = 2L
        it.foreach { row =>
          w.write(s"""<row r="$rn">""")
          var i = 0
          while (i < schema.length) {
            val ref = s"${colName(i)}$rn"
            if (row.isNullAt(i)) {
              // omitted cell = empty — the standard sparse representation
            } else schema.fields(i).dataType match {
              case StringType =>
                w.write(s"""<c r="$ref" t="inlineStr"><is><t>${esc(row.getString(i))}</t></is></c>""")
              case LongType    => w.write(s"""<c r="$ref"><v>${row.getLong(i)}</v></c>""")
              case IntegerType => w.write(s"""<c r="$ref"><v>${row.getInt(i)}</v></c>""")
              case DoubleType  => w.write(s"""<c r="$ref"><v>${row.getDouble(i)}</v></c>""")
              case dt => throw new IllegalArgumentException(s"unsupported xlsx field type: $dt")
            }
            i += 1
          }
          w.write("</row>")
          rn += 1
        }
        w.write("</sheetData></worksheet>")
        w.flush()
        zip.closeEntry()
      } finally zip.close() // closes the FS stream
    }
  }

  /** Read the .xlsx packages under `path` back as a DataFrame with
    * `schema` (the sink's write contract). Cells are matched to schema
    * positions by their `r` reference column (sparse rows stay aligned). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val glob = new Path(path, "part-*.xlsx")
    val fs = glob.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.globStatus(glob).map(_.getPath.toString).sorted.toSeq
    val types = schema.fields.map(_.dataType)
    val nCols = schema.length
    val entries = confEntries(spark)
    val rows = spark.sparkContext.parallelize(files, math.max(files.size, 1))
      .flatMap { file =>
        val conf = rebuild(entries)
        val p = new Path(file)
        val in = p.getFileSystem(conf).open(p)
        val zin = new ZipInputStream(in)
        Option(TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => zin.close()))
        var sheet: ZipInputStream = null
        var ze = zin.getNextEntry
        while (ze != null && sheet == null) {
          if (ze.getName == "xl/worksheets/sheet1.xml") sheet = zin
          else ze = zin.getNextEntry
        }
        if (sheet == null) Iterator.empty
        else {
          val f = javax.xml.stream.XMLInputFactory.newInstance()
          f.setProperty(javax.xml.stream.XMLInputFactory.IS_COALESCING, true)
          val xr = f.createXMLStreamReader(sheet)
          new Iterator[Row] {
            private var nextRow: Row = null
            private var headerSkipped = false
            private def colIdx(ref: String): Int = {
              var n = 0; var i = 0
              while (i < ref.length && ref.charAt(i).isLetter) {
                n = n * 26 + (ref.charAt(i) - 'A' + 1); i += 1
              }
              n - 1
            }
            private def advance(): Unit = {
              nextRow = null
              var vals: Array[Any] = null
              var cellCol = -1
              var isStr = false
              var inV = false
              var inT = false
              val buf = new StringBuilder
              while (nextRow == null && xr.hasNext) {
                xr.next() match {
                  case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
                    xr.getLocalName match {
                      case "row" => vals = new Array[Any](nCols)
                      case "c" =>
                        val ref = xr.getAttributeValue(null, "r")
                        cellCol = if (ref == null) cellCol + 1 else colIdx(ref)
                        isStr = xr.getAttributeValue(null, "t") == "inlineStr"
                        buf.clear()
                      case "v" => inV = true
                      case "t" => inT = true
                      case _ =>
                    }
                  case javax.xml.stream.XMLStreamConstants.CHARACTERS =>
                    if (inV || inT) buf.append(xr.getText)
                  case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
                    xr.getLocalName match {
                      case "v" => inV = false
                      case "t" => inT = false
                      case "c" =>
                        if (vals != null && cellCol >= 0 && cellCol < nCols) {
                          val s = buf.result()
                          vals(cellCol) =
                            if (isStr) s
                            else types(cellCol) match {
                              case LongType    => s.toLong
                              case IntegerType => s.toInt
                              case DoubleType  => s.toDouble
                              case StringType  => s
                              case dt => throw new IllegalArgumentException(
                                s"unsupported xlsx field type: $dt")
                            }
                        }
                        buf.clear()
                      case "row" =>
                        if (!headerSkipped) headerSkipped = true
                        else nextRow = Row.fromSeq(vals.toIndexedSeq)
                        vals = null
                      case _ =>
                    }
                  case _ =>
                }
              }
            }
            advance()
            override def hasNext: Boolean = nextRow != null
            override def next(): Row = {
              val r = nextRow; advance(); r
            }
          }
        }
      }
    spark.createDataFrame(rows, schema)
  }
}
