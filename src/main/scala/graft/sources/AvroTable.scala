package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file sink + source built directly on avro-core (the Avro
  * DataSource module is not on this classpath, so the interchange format is
  * implemented as a first-class custom source — SURVEY.md §2.B source
  * formats row; the reference is CSV-only, no citation).
  *
  * Write: one Avro object-container file per input partition (the standard
  * `part-NNNNN.avro` layout every warehouse reader accepts), each task
  * streaming its rows through a `DataFileWriter` — no shuffle, no driver
  * hop, parallel by input split, exactly how the parquet/ORC sinks scale.
  * Null-union schemas are derived from the DataFrame's StructType.
  *
  * Read: the file list is globbed once on the driver (metadata-only), then
  * parallelized one task per container file; each task decodes its file
  * with `DataFileReader` over the Hadoop FS input stream, so the same code
  * reads local, HDFS, or object-store paths. Container files are
  * block-splittable via sync markers; per-file tasks are the simple variant
  * and parallelism = file count (one file per write partition, so read
  * parallelism mirrors write parallelism). Supported Spark types: long,
  * int, double, float, boolean, string — the flat-interchange subset.
  */
object AvroTable {

  private def avroSchemaJson(schema: StructType, name: String): String = {
    var fields = SchemaBuilder.record(name).namespace("graft").fields()
    schema.fields.foreach { f =>
      val base = f.dataType match {
        case LongType    => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case FloatType   => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType  => Schema.create(Schema.Type.STRING)
        case dt => throw new IllegalArgumentException(s"unsupported Avro field type: $dt")
      }
      val union = Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
      fields = fields.name(f.name).`type`(union).withDefault(null)
    }
    fields.endRecord().toString
  }

  /** The session's Hadoop configuration flattened to entries — the
    * closure-safe form (Configuration itself is not serializable): rebuilt
    * per task so executor-side FS access carries the same credentials/
    * nameservice config the driver resolved paths with. */
  private def confEntries(spark: SparkSession): Array[(String, String)] =
    spark.sparkContext.hadoopConfiguration.iterator().asScala
      .map(e => e.getKey -> e.getValue).toArray

  private def rebuild(entries: Array[(String, String)]): Configuration = {
    val c = new Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Write `df` as `part-NNNNN.avro` container files under `path`. */
  def write(df: DataFrame, path: String): Unit = {
    val structType = df.schema
    // Schema objects don't cross the closure boundary; ship the JSON form
    val json = avroSchemaJson(structType, "row")
    val entries = confEntries(df.sparkSession)
    df.foreachPartition { (it: Iterator[Row]) =>
      val avroSchema = new Schema.Parser().parse(json)
      val conf = rebuild(entries)
      val part = new Path(path, f"part-${TaskContext.getPartitionId()}%05d.avro")
      val fs = part.getFileSystem(conf)
      val out = fs.create(part, true)
      val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](avroSchema))
      writer.create(avroSchema, out)
      try {
        it.foreach { row =>
          val rec = new GenericData.Record(avroSchema)
          var i = 0
          while (i < structType.length) {
            if (!row.isNullAt(i)) rec.put(i, row.get(i))
            i += 1
          }
          writer.append(rec)
        }
      } finally writer.close() // closes the FS stream
    }
  }

  /** Read the container files under `path` back as a DataFrame with
    * `schema` (the sink's write contract — same type subset). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val glob = new Path(path, "part-*.avro")
    val fs = glob.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.globStatus(glob).map(_.getPath.toString).sorted.toSeq
    val names = schema.fieldNames
    val types = schema.fields.map(_.dataType)
    val entries = confEntries(spark)
    val rows = spark.sparkContext.parallelize(files, math.max(files.size, 1))
      .flatMap { file =>
        val in = new FsInput(new Path(file), rebuild(entries))
        val reader = new DataFileReader(in, new GenericDatumReader[GenericRecord]())
        // close at task end regardless of how far the consumer iterates
        // (limit/take/exception would otherwise leak the file handle)
        Option(TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => reader.close()))
        reader.iterator().asScala.map { rec =>
          val vals = new Array[Any](names.length)
          var i = 0
          while (i < names.length) {
            val v = rec.get(i)
            vals(i) = (v, types(i)) match {
              case (null, _)          => null
              case (u, StringType)    => u.toString // avro Utf8 → String
              case (u, _)             => u
            }
            i += 1
          }
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
    spark.createDataFrame(rows, schema)
  }
}
