package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from per-domain packs (graft.queries.*); each pack
  * pairs DataFrame plans with DuckDB oracle SQL where the operator is
  * SQL-expressible (non-SQL-expressible ops get a rows-only check).
  */
object SparkEntry {
  private def packs: Seq[QueryPack] = Seq(
    catalog.Relational,
    catalog.Semantics,
    catalog.Text,
    catalog.Events,
    catalog.Streams,
    catalog.Dedup,
    catalog.Similarity,
    catalog.Multimodal,
    catalog.Temporal,
    catalog.Analytics,
    catalog.Strings,
    catalog.Formats,
    catalog.Quality,
    catalog.CorpusGate
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    catalog.Relational.queries("q5_nation_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
