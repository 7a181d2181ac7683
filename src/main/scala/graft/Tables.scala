package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated star schema (see /root/repo/TESTDATA.md).
  *
  * Tables: region nation customer supplier part orders lineitem events
  * documents embeddings — one parquet each under `dir`.
  *
  * At 100 TB these would be partitioned parquet/Delta directories; all query
  * code below only depends on `spark.read.parquet(path)` returning the
  * declared schema, so swapping in a partitioned catalog table is a one-line
  * change here and nowhere else.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** The driver's events.parquet has shipped two physical encodings for `ts`:
    * TIMESTAMP(NANOS) (Spark's vectorized reader rejects it — read nanos as
    * long and convert; values are whole micros) and timestamp[us] without the
    * isAdjustedToUTC flag (Spark infers TIMESTAMP_NTZ — cast to TIMESTAMP;
    * every session here runs UTC so the micros value is unchanged). Tables
    * re-written by Spark (e.g. StressGen output) already carry TIMESTAMP and
    * pass through. Normalizing HERE, not per-query, keeps event-time code
    * (windows, watermarks, unix_micros) on one type under any session. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t("events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

/** A named bundle of queries plus (where SQL-expressible) a DuckDB oracle.
  *
  * Contract (driver-checked): for every key in `oracle` there is a key in
  * `queries` whose DataFrame result matches the oracle SQL run by DuckDB on
  * the same parquet tables — same column names, same values. Determinism
  * rules used throughout:
  *   - every query ends in a total ORDER BY (unique tiebreaker columns);
  *   - no raw double arithmetic crosses an aggregation: doubles are cast to
  *     exact DECIMAL before sum/avg so Spark's parallel aggregation order
  *     cannot change low bits vs DuckDB's serial sum;
  *   - final decimal outputs are cast to an explicit DECIMAL(38, s) on both
  *     sides so the two engines' precision-inference rules can't diverge.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
