package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed media metadata carried alongside the opaque payload. */
final case class MediaMeta(width: Int, height: Int, sample_rate_hz: Int, n_frames: Int)

/** One multimodal row: opaque binary payload + typed metadata. At 100 TB the
  * payload column dominates storage; metadata-only queries must prune it
  * (parquet column pruning — see MultimodalSpec's ReadSchema assertion). */
final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte],
                             meta: MediaMeta)

/** One sampled frame of a video payload. */
final case class MediaFrame(media_id: Long, frame_idx: Int, byte_offset: Long,
                            frame_len: Int, frame_bytes: Array[Byte])

/** Deterministic fake "embedding" from the decode stub. */
final case class MediaFeatures(media_id: Long, kind: String, embedding: Array[Float])

/** Multimodal-column operators (north-star mandate — SURVEY.md §2.B; no
  * reference citation: the reference is CSV-only).
  *
  * Images/audio/video are opaque `binary` columns with typed metadata.
  * Decode / feature-extract / resize / frame-sample run as BATCHED
  * per-partition operators (`mapPartitions` + `grouped(batchSize)`) — the
  * JVM analog of arrow-batch Pandas UDFs: a real deployment hands each batch
  * to a codec library. The codec itself is STUBBED (this container has no
  * image/audio libs): `decodeStub` is a deterministic fake, clearly marked.
  * Everything around it — schema, encoders, batch shape, laziness,
  * partitioning — is real and tested (MultimodalSpec).
  *
  * Scale notes (100 TB):
  *  - all operators are per-row/per-partition (no shuffle); parallelism
  *    comes from input splits;
  *  - frameSample explodes rows but never copies the full payload per frame
  *    (each frame slices its own byte range);
  *  - metadata-only plans never deserialize `payload` (column pruning);
  *  - batches bound peak memory per task: batchSize × max payload size.
  */
object Media {

  /** Deterministic synthetic media table derived from `documents` (payload =
    * UTF-8 bytes of the text; kind/dims from doc_id). Stands in for a real
    * ingest of binary files; derivations are mirrored by the m-pack oracle. */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        $"doc_id".as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod($"doc_id", lit(3)) + 1).cast("int")).as("kind"),
        encode($"text", "UTF-8").as("payload"),
        struct(
          (lit(64) + pmod($"doc_id", lit(16)) * 16).cast("int").as("width"),
          (lit(48) + pmod($"doc_id", lit(9)) * 16).cast("int").as("height"),
          (lit(8000) + pmod($"doc_id", lit(5)) * 8000).cast("int").as("sample_rate_hz"),
          (lit(8) + pmod($"doc_id", lit(24))).cast("int").as("n_frames")).as("meta"))
      .as[MediaRecord]
  }

  /** STUB — a real build calls an image/audio codec here (not present in
    * this container). Deterministic identity stand-in so downstream shapes
    * are exercised end-to-end. */
  def decodeStub(payload: Array[Byte], kind: String): Array[Byte] = payload

  /** Decode (stub) + feature-extract in explicit batches: the fake embedding
    * is a 16-bin normalized byte histogram — deterministic, codec-free. */
  def featureExtract(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a codec would receive one arrow batch
        batch.iterator.map { r =>
          val decoded = decodeStub(r.payload, r.kind)
          val hist = new Array[Long](16)
          var i = 0
          while (i < decoded.length) { hist((decoded(i) & 0xff) >> 4) += 1; i += 1 }
          val n = math.max(decoded.length, 1).toFloat
          MediaFeatures(r.media_id, r.kind, hist.map(_ / n))
        }
      }
    }
  }

  /** Metadata resize: updates target dims; the pixel resample itself is part
    * of the stubbed codec (payload passes through). */
  def resize(ds: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.map(r => r.copy(meta = r.meta.copy(width = w, height = h)))
  }

  /** Sample every `every`-th frame of video payloads: 1024-byte frame
    * windows, slicing (never copying the whole payload per frame). Non-video
    * rows are filtered BEFORE any payload work. */
  def frameSample(ds: Dataset[MediaRecord], every: Int = 4,
                  frameBytes: Int = 1024): Dataset[MediaFrame] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(_.kind == "video").flatMap { r =>
      (0 until r.meta.n_frames by every).iterator.flatMap { idx =>
        val off = idx.toLong * frameBytes
        val len = math.max(math.min(r.payload.length - off, frameBytes.toLong), 0L).toInt
        if (len > 0)
          Some(MediaFrame(r.media_id, idx, off,
            len, java.util.Arrays.copyOfRange(r.payload, off.toInt, off.toInt + len)))
        else None
      }
    }
  }
}
