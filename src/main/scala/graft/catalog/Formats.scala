package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}

/** Columnar-format interchange beyond the parquet testdata: ORC sink +
  * source round-trip under the correctness gate (SURVEY.md §2.B source
  * formats row; the reference is CSV-only, no citation).
  *
  * k4 writes a lineitem projection to ORC (Spark's built-in vectorized ORC
  * writer), reads it back, and aggregates; the oracle aggregates the
  * ORIGINAL parquet — a green row pins value preservation across the
  * encode/decode, not just "the files exist". DuckDB cannot read ORC, so
  * the round-trip must re-enter from the Spark side; aggregation decimals
  * follow the repo-wide dec2/asDbl convention (Relational scaladoc).
  *
  * Scale notes: the write is a straight columnar re-encode — no shuffle,
  * parallel by input split; locally it lands in a per-run temp dir, on a
  * cluster the same two lines target shared storage. Column projection is
  * pushed to the ORC reader the same way as parquet (ReadSchema).
  */
object Formats extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "k4_orc_roundtrip" -> { (s, dir) =>
      import s.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft-orc-")
        .toFile.getAbsolutePath
      Tables(s, dir).lineitem
        .select($"l_orderkey", $"l_returnflag", $"l_quantity")
        .write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
             sum($"l_quantity".cast("decimal(18,2)"))
               .cast("decimal(38,2)").cast("double").as("sum_qty"))
        .orderBy($"l_returnflag")
    }
  )

  val oracle: Map[String, String] = Map(
    "k4_orc_roundtrip" -> """
      SELECT l_returnflag, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
  )
}
