package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}
import graft.multimodal.Media

/** Oracle-pinned views of the multimodal operators (graft.multimodal.Media).
  *
  * Image payloads are REAL PNGs of a closed-form 16×16-tile pixel pattern
  * (Media.tileRgb — a pure function of media_id), so DuckDB can recompute
  * every DECODED property (dims, Σ(r+g+b) checksum, byte histogram) from
  * the formula without a codec, while the Spark side must actually run
  * generate → PNG-encode → `javax.imageio` decode (→ resample → re-encode →
  * decode for m4) to produce the same integers. A green row therefore pins
  * the whole codec loop, not just metadata plumbing. AUDIO payloads are
  * real WAVs of a closed-form PCM16 series (u_i = (id·31 + i·7) mod 2^16),
  * decoded with `javax.sound.sampled` — checksums and PCM-byte histograms
  * recomputed in SQL from the formula (little-endian two's complement:
  * byte0 = u mod 256, byte1 = (u div 256 + 128) mod 256). Only VIDEO
  * payloads stay UTF-8 text bytes (stub decode), pinned via
  * md5/character-class counts. Tile dims divide both W (64 + id%16·16) and
  * H (48 + id%9·16), so a full image is (W/16)·(H/16) exact tile repeats;
  * m4's nearest-neighbor map x → (x·W)/256 is mirrored with integer
  * division on residue counts.
  */
object Multimodal extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // m1: media catalog — typed ingest + batched decode: image dims and
    // digest (pixel checksum) come from DECODING the PNG payload.
    "m1_media_catalog" -> { (s, dir) =>
      import s.implicits._
      Media.catalogStats(Media.mediaFromDocuments(Tables(s, dir).documents))
        .toDF()
        .select($"media_id", $"kind", $"n_bytes", $"digest",
                $"width", $"height", $"sample_rate_hz", $"n_frames")
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
    // m4: REAL resize — image payloads are decoded, nearest-neighbor
    // resampled to 256×144, re-encoded; the output digest is the checksum
    // of the RESIZED pixels (recovered by a second decode), which differs
    // from the input payload's. Audio/video rows pass through.
    "m4_resize" -> { (s, dir) =>
      import s.implicits._
      Media.catalogStats(
          Media.resize(Media.mediaFromDocuments(Tables(s, dir).documents), 256, 144))
        .toDF()
        .select($"media_id", $"kind", $"width", $"height", $"digest")
        .orderBy($"media_id")
    },
    // m3: decode + feature extraction through the typed mapPartitions batch
    // path. The normalized float32 embedding is projected back to the EXACT
    // integer byte-histogram of the DECODED content (round(x_i · n_bytes)
    // is exact while hist_i, n_bytes < 2^24 / bin-count): raw RGB bytes for
    // images (recomputed from the tile formula in SQL), payload text bytes
    // for the stub kinds (per-bin character-class counts — ASCII, so
    // codepoint counts == byte counts).
    "m3_media_features" -> { (s, dir) =>
      import s.implicits._
      Media.featureExtract(Media.mediaFromDocuments(Tables(s, dir).documents))
        .toDF()
        .select($"media_id", $"kind",
                array_join(transform($"embedding",
                  x => round(x.cast("double") * $"n_bytes".cast("double"))
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

  /** Shared oracle CTEs: image dims + the 16×16 tile with its channel sums. */
  private val imgCtes = """
      imgs AS (
        SELECT doc_id, 64 + (doc_id % 16) * 16 AS w, 48 + (doc_id % 9) * 16 AS h
        FROM documents WHERE doc_id % 3 = 0),
      tile AS (
        SELECT a.tx, b.ty FROM (SELECT unnest(range(0, 16)) AS tx) a
        CROSS JOIN (SELECT unnest(range(0, 16)) AS ty) b)"""

  /** Shared audio CTEs: per-doc sample counts, the closed-form unsigned
    * 16-bit sample series u_i = (id·31 + i·7) mod 2^16, and its sum — the
    * checksum the Spark side recovers by DECODING the WAV payload
    * (stored PCM value = u − 32768, two's-complement little-endian). */
  private val audCtes = """
      auds AS (
        SELECT doc_id, 400 + (doc_id % 7) * 200 AS n
        FROM documents WHERE doc_id % 3 = 1),
      au AS (
        SELECT doc_id, (doc_id * 31 + i * 7) % 65536 AS u
        FROM (SELECT doc_id, unnest(range(0, n)) AS i FROM auds) t),
      achk AS (SELECT doc_id, SUM(u)::BIGINT AS checksum FROM au GROUP BY doc_id)"""

  /** Σ of the three channel formulas at tile coordinate (tx, ty). */
  private def rgbSum(id: String, tx: String, ty: String): String =
    s"((($id * 31 + 7 * $tx + 13 * $ty) % 256)" +
      s" + (($id * 17 + 11 * $tx + 3 * $ty) % 256)" +
      s" + (($id * 29 + 5 * $tx + 2 * $ty) % 256))"

  val oracle: Map[String, String] = Map(
    "m1_media_catalog" -> s"""
      WITH $imgCtes,
      $audCtes,
      chk AS (
        SELECT i.doc_id, (i.w // 16) * (i.h // 16)
               * SUM(${rgbSum("i.doc_id", "t.tx", "t.ty")}) AS checksum
        FROM imgs i CROSS JOIN tile t GROUP BY i.doc_id, i.w, i.h)
      SELECT d.doc_id AS media_id,
             (['image','audio','video'])[(d.doc_id % 3) + 1] AS kind,
             CASE WHEN d.doc_id % 3 = 0 THEN (i.w * i.h * 3)::BIGINT
                  WHEN d.doc_id % 3 = 1 THEN (a.n * 2)::BIGINT
                  ELSE octet_length(encode(d.text))::BIGINT END AS n_bytes,
             CASE WHEN d.doc_id % 3 = 0 THEN chk.checksum::VARCHAR
                  WHEN d.doc_id % 3 = 1 THEN achk.checksum::VARCHAR
                  ELSE md5(d.text) END AS digest,
             (64 + (d.doc_id % 16) * 16)::INT AS width,
             (48 + (d.doc_id % 9) * 16)::INT AS height,
             (8000 + (d.doc_id % 5) * 8000)::INT AS sample_rate_hz,
             (8 + (d.doc_id % 24))::INT AS n_frames
      FROM documents d
      LEFT JOIN imgs i ON i.doc_id = d.doc_id
      LEFT JOIN chk ON chk.doc_id = d.doc_id
      LEFT JOIN auds a ON a.doc_id = d.doc_id
      LEFT JOIN achk ON achk.doc_id = d.doc_id
      ORDER BY media_id""",
    "m4_resize" -> s"""
      WITH $imgCtes,
      $audCtes,
      cntx AS (
        SELECT i.doc_id, ((r.x * i.w) // 256) % 16 AS tx, COUNT(*) AS cx
        FROM imgs i CROSS JOIN (SELECT unnest(range(0, 256)) AS x) r
        GROUP BY 1, 2),
      cnty AS (
        SELECT i.doc_id, ((r.y * i.h) // 144) % 16 AS ty, COUNT(*) AS cy
        FROM imgs i CROSS JOIN (SELECT unnest(range(0, 144)) AS y) r
        GROUP BY 1, 2),
      rchk AS (
        SELECT x.doc_id,
               SUM(${rgbSum("x.doc_id", "x.tx", "y.ty")} * x.cx * y.cy) AS checksum
        FROM cntx x JOIN cnty y ON x.doc_id = y.doc_id
        GROUP BY x.doc_id)
      SELECT d.doc_id AS media_id,
             (['image','audio','video'])[(d.doc_id % 3) + 1] AS kind,
             CASE WHEN d.doc_id % 3 = 0 THEN 256
                  ELSE 64 + (d.doc_id % 16) * 16 END::INT AS width,
             CASE WHEN d.doc_id % 3 = 0 THEN 144
                  ELSE 48 + (d.doc_id % 9) * 16 END::INT AS height,
             CASE WHEN d.doc_id % 3 = 0 THEN rchk.checksum::VARCHAR
                  WHEN d.doc_id % 3 = 1 THEN achk.checksum::VARCHAR
                  ELSE md5(d.text) END AS digest
      FROM documents d
      LEFT JOIN rchk ON rchk.doc_id = d.doc_id
      LEFT JOIN achk ON achk.doc_id = d.doc_id
      ORDER BY media_id""",
    "m3_media_features" -> s"""
      WITH $imgCtes,
      $audCtes,
      avals AS (
        SELECT doc_id, unnest([u % 256, ((u // 256) + 128) % 256]) AS v FROM au),
      avc AS (SELECT doc_id, v // 16 AS bin, COUNT(*) AS c FROM avals GROUP BY 1, 2),
      ah AS (
        SELECT a.doc_id,
               string_agg(COALESCE(avc.c, 0)::VARCHAR, ',' ORDER BY b.bin) AS hist
        FROM auds a
        CROSS JOIN (SELECT unnest(range(0, 16)) AS bin) b
        LEFT JOIN avc ON avc.doc_id = a.doc_id AND avc.bin = b.bin
        GROUP BY a.doc_id),
      vals AS (
        SELECT i.doc_id,
               unnest([((i.doc_id * 31 + 7 * t.tx + 13 * t.ty) % 256),
                       ((i.doc_id * 17 + 11 * t.tx + 3 * t.ty) % 256),
                       ((i.doc_id * 29 + 5 * t.tx + 2 * t.ty) % 256)]) AS v
        FROM imgs i CROSS JOIN tile t),
      vc AS (SELECT doc_id, v // 16 AS bin, COUNT(*) AS c FROM vals GROUP BY 1, 2),
      ih AS (
        SELECT i.doc_id,
               string_agg((COALESCE(vc.c, 0) * (i.w // 16) * (i.h // 16))::VARCHAR,
                          ',' ORDER BY b.bin) AS hist
        FROM imgs i
        CROSS JOIN (SELECT unnest(range(0, 16)) AS bin) b
        LEFT JOIN vc ON vc.doc_id = i.doc_id AND vc.bin = b.bin
        GROUP BY i.doc_id)
      SELECT d.doc_id AS media_id,
             (['image','audio','video'])[(d.doc_id % 3) + 1] AS kind,
             CASE WHEN d.doc_id % 3 = 0 THEN ih.hist
                  WHEN d.doc_id % 3 = 1 THEN ah.hist
                  ELSE array_to_string([$histBins], ',') END AS hist
      FROM documents d
      LEFT JOIN ih ON ih.doc_id = d.doc_id
      LEFT JOIN ah ON ah.doc_id = d.doc_id
      ORDER BY media_id""",
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
