package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}
import graft.multimodal.Media

/** Oracle-pinned views of the multimodal operators (graft.multimodal.Media).
  * The payload/metadata derivations are deterministic functions of
  * documents(doc_id, text), so DuckDB can recompute them in SQL — that pins
  * the TYPED Dataset pipeline (case-class encoders, mapPartitions batches)
  * against an independent engine. m3 (feature extraction) has no SQL twin
  * (byte-histogram over blob) → rows-only check + MultimodalSpec.
  */
object Multimodal extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // m1: media catalog — typed ingest, metadata flatten, payload digest
    "m1_media_catalog" -> { (s, dir) =>
      import s.implicits._
      Media.mediaFromDocuments(Tables(s, dir).documents)
        .toDF()
        .select($"media_id", $"kind",
                octet_length($"payload").cast("long").as("n_bytes"),
                md5($"payload").as("digest"),
                $"meta.width".as("width"), $"meta.height".as("height"),
                $"meta.sample_rate_hz".as("sample_rate_hz"),
                $"meta.n_frames".as("n_frames"))
        .orderBy($"media_id")
    },
    // m2: frame sampling over video payloads (typed flatMap path)
    "m2_frame_sample" -> { (s, dir) =>
      import s.implicits._
      Media.frameSample(Media.mediaFromDocuments(Tables(s, dir).documents))
        .toDF()
        .select($"media_id", $"frame_idx".cast("long").as("frame_idx"),
                $"byte_offset", $"frame_len".cast("long").as("frame_len"),
                md5($"frame_bytes").as("frame_digest"))
        .orderBy($"media_id", $"frame_idx")
    },
    // m3: decode-stub + feature extraction (no SQL twin → rows-only check).
    // The embedding vector is emitted comma-joined: the driver's rows-only
    // check still sorts the frame in pandas, which cannot process array
    // cells; the joined string is deterministic (histogram of fixed bytes).
    "m3_media_features" -> { (s, dir) =>
      import s.implicits._
      Media.featureExtract(Media.mediaFromDocuments(Tables(s, dir).documents))
        .toDF()
        .select($"media_id", $"kind",
                array_join(transform($"embedding", _.cast("string")), ",").as("embedding"))
        .orderBy($"media_id")
    }
  )

  val oracle: Map[String, String] = Map(
    "m1_media_catalog" -> """
      SELECT doc_id AS media_id,
             (['image','audio','video'])[(doc_id % 3) + 1] AS kind,
             octet_length(encode(text))::BIGINT AS n_bytes,
             md5(text) AS digest,
             (64 + (doc_id % 16) * 16)::INT AS width,
             (48 + (doc_id % 9) * 16)::INT AS height,
             (8000 + (doc_id % 5) * 8000)::INT AS sample_rate_hz,
             (8 + (doc_id % 24))::INT AS n_frames
      FROM documents ORDER BY media_id""",
    "m2_frame_sample" -> """
      SELECT media_id, frame_idx::BIGINT AS frame_idx,
             (frame_idx * 1024)::BIGINT AS byte_offset,
             least(n_bytes - frame_idx * 1024, 1024)::BIGINT AS frame_len,
             md5(substr(text, frame_idx * 1024 + 1, 1024)) AS frame_digest
      FROM (
        SELECT doc_id AS media_id, text, octet_length(encode(text)) AS n_bytes,
               unnest(range(0, 8 + (doc_id % 24), 4)) AS frame_idx
        FROM documents WHERE (doc_id % 3) = 2) t
      WHERE n_bytes - frame_idx * 1024 > 0
      ORDER BY media_id, frame_idx"""
  )
}
