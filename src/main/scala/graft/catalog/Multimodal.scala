package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}
import graft.multimodal.Media

/** Oracle-pinned views of the multimodal operators (graft.multimodal.Media).
  * The payload/metadata derivations are deterministic functions of
  * documents(doc_id, text), so DuckDB can recompute them in SQL — that pins
  * the TYPED Dataset pipeline (case-class encoders, mapPartitions batches)
  * against an independent engine — including m3's byte-histogram features,
  * recovered as exact integer counts on both sides.
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
    // m4: metadata resize through the typed map path — target dims update,
    // payload passes through untouched (the pixel resample is part of the
    // stubbed codec), proven by the unchanged digest.
    "m4_resize" -> { (s, dir) =>
      import s.implicits._
      Media.resize(Media.mediaFromDocuments(Tables(s, dir).documents), 256, 144)
        .toDF()
        .select($"media_id", $"kind",
                $"meta.width".as("width"), $"meta.height".as("height"),
                md5($"payload").as("digest"))
        .orderBy($"media_id")
    },
    // m3: decode-stub + feature extraction through the typed mapPartitions
    // batch path. The normalized float32 embedding is projected back to the
    // EXACT integer byte-histogram (round(x_i * n_bytes) is exact while
    // hist_i, n_bytes < 2^24 / bin-count), which DuckDB recomputes with
    // per-bin character-class counts — documents text is ASCII, so
    // codepoint counts == byte counts.
    "m3_media_features" -> { (s, dir) =>
      import s.implicits._
      val media = Media.mediaFromDocuments(Tables(s, dir).documents)
      val sizes = media.toDF()
        .select($"media_id", octet_length($"payload").cast("double").as("n_bytes"))
      Media.featureExtract(media).toDF()
        .join(sizes, Seq("media_id"))
        .select($"media_id", $"kind",
                array_join(transform($"embedding",
                  x => round(x.cast("double") * $"n_bytes")
                    .cast("long").cast("string")), ",").as("hist"))
        .orderBy($"media_id")
    }
  )

  /** 16 histogram bins as regex character-class counts: bin b = #chars in
    * [16b, 16b+15]. ASCII input ⇒ identical to the Spark side's byte bins. */
  private val histBins: String = (0 until 16).map { b =>
    val lo = f"${b * 16}%02x"; val hi = f"${b * 16 + 15}%02x"
    s"(length(text) - length(regexp_replace(text, '[\\x$lo-\\x$hi]', '', 'g')))::BIGINT"
  }.mkString(", ")

  val oracle: Map[String, String] = Map(
    "m4_resize" -> """
      SELECT doc_id AS media_id,
             (['image','audio','video'])[(doc_id % 3) + 1] AS kind,
             256::INT AS width, 144::INT AS height,
             md5(text) AS digest
      FROM documents ORDER BY media_id""",
    "m3_media_features" -> s"""
      SELECT doc_id AS media_id,
             (['image','audio','video'])[(doc_id % 3) + 1] AS kind,
             array_to_string([$histBins], ',') AS hist
      FROM documents ORDER BY media_id""",
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
