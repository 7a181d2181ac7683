package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}
import graft.functions.TextKernels.NBands
import Tx.wsSql

/** The COMPOSED curation pipeline (pipelines/Corpus.curate) under the
  * driver gate: lang-ID filter → quality filter → exact dedup → MinHash+LSH
  * near-dedup → token-stat enrich, end to end, against one DuckDB oracle
  * assembled from the same SQL fragments that pin the individual operators
  * (x2/x3 scoring, d1 digest keeper, d2 signature/band generators). This is
  * the whole-pipeline integration check: a drift in ANY stage (or in how
  * stages compose) breaks the final survivor set.
  */
object CorpusGate extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c1_corpus_curate" -> { (s, dir) =>
      import s.implicits._
      val (curated, _) = graft.pipelines.Corpus.curate(Tables(s, dir).documents)
      curated.select($"doc_id", $"lang_pred",
                     $"n_tokens".cast("long").as("n_tokens"), $"quality_score")
        .orderBy($"doc_id")
    }
  )

  private val markerScores = Text.markers.map { case (l, ms) =>
    s"len(list_filter(ws, t -> ${Text.inList("t", ms)})) AS s_$l"
  }.mkString(", ")

  val oracle: Map[String, String] = Map(
    "c1_corpus_curate" -> s"""
      WITH base AS (SELECT doc_id, text, $wsSql AS ws FROM documents),
      scored AS (
        SELECT doc_id, text, ws, $markerScores,
               length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS punct_cnt,
               length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS digit_cnt,
               greatest(length(text), 1) AS tl
        FROM base),
      langq AS (
        SELECT doc_id, text, ws, ${Text.caseSql} AS lang_pred,
               1.0 - (punct_cnt::DOUBLE / tl) * 2.0 - (digit_cnt::DOUBLE / tl) AS quality_score
        FROM scored),
      kept AS (
        SELECT * FROM langq
        WHERE lang_pred IN ('en', 'de') AND quality_score >= 0.8),
      keep AS (
        SELECT doc_id, text, ws, lang_pred, quality_score FROM (
          SELECT k.*, row_number() OVER (
            PARTITION BY md5(trim(regexp_replace(lower(text), '[^a-z ]', '', 'g')))
            ORDER BY doc_id) AS rn
          FROM kept k) z WHERE rn = 1),
      sig AS (
        SELECT doc_id, ${Dedup.sigSql("hs")} AS sig
        FROM (SELECT doc_id, ${Dedup.shingleHashesSql} AS hs FROM keep) t1),
      bk AS (
        SELECT doc_id, sig, b.band_idx, bands[b.band_idx + 1] AS band_hash
        FROM (SELECT doc_id, sig, ${Dedup.bandsSql("sig")} AS bands FROM sig) t
        CROSS JOIN (SELECT unnest(range(0, $NBands)) AS band_idx) b),
      drops AS (
        SELECT DISTINCT d2 AS doc_id FROM (
          SELECT a.doc_id AS d1, b.doc_id AS d2,
                 len(list_filter(range(1, 17), i -> a.sig[i] = b.sig[i]))::DOUBLE / 16.0 AS est
          FROM bk a JOIN bk b
            ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
           AND a.doc_id < b.doc_id) p
        WHERE est >= 0.5)
      SELECT k.doc_id, k.lang_pred, len(k.ws)::BIGINT AS n_tokens, k.quality_score
      FROM keep k WHERE k.doc_id NOT IN (SELECT doc_id FROM drops)
      ORDER BY k.doc_id"""
  )
}
