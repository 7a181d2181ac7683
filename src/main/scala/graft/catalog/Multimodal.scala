package graft.catalog

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryPack, Scratch, Tables}
import graft.multimodal.{Media, MediaRecord}

/** Oracle-pinned views of the multimodal operators (graft.multimodal.Media).
  *
  * Every modality's payload is REAL encoded media whose decoded content is
  * a closed-form function of media_id, so DuckDB can recompute each decoded
  * integer without any codec while the Spark side must actually run
  * generate → encode → decode (→ resample → re-encode → decode for m4):
  *
  *  - IMAGE: PNG of the 16×16-tile pattern (Media.tileRgb); decoded dims,
  *    Σ(r+g+b) checksum, byte histogram. Tile dims divide W (64+id%16·16)
  *    and H (48+id%9·16), so a full image is (W/16)·(H/16) exact tile
  *    repeats; m4's nearest-neighbor map x → (x·W)/256 is mirrored with
  *    integer division on residue counts.
  *  - AUDIO: WAV of the PCM16 series u_i = (id·31 + i·7) mod 2^16 (stored
  *    value u − 32768, two's-complement little-endian): checksum = Σ u_i,
  *    histogram over PCM bytes (byte0 = u mod 256,
  *    byte1 = (u div 256 + 128) mod 256), rate from the decoded header.
  *  - VIDEO: length-prefixed PNG-frame container, frame f = tile PNG of
  *    derived id id·131 + f at 32×32 (= 4 tile repeats): per-frame and
  *    whole-clip checksums/histograms from the same tile formula.
  *
  * A green row therefore pins the full codec loop, not metadata plumbing.
  */
object Multimodal extends QueryPack {

  /** Staged media fixture: the deterministic synthetic media table is
    * synthesized (encoder side) ONCE per (JVM, testdata dir) and written to
    * scratch parquet; every query after the first reads the staged table.
    * m1 stays end-to-end (it pins the encoders); m2–m6 measure what they
    * are about — decode / resample / hash — not repeated fixture synthesis
    * (round-4 verdict item 1: m3's 12 s was mostly encoder cost). The
    * parquet hop also restores the production shape: payloads arrive FROM
    * STORAGE, and metadata-only plans prune the payload column at the scan
    * (MultimodalSpec's ReadSchema assertion runs against this path). */
  private def stagedMedia(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    val path = Scratch.staged(s"media#$dir", "media") { p =>
      Media.mediaFromDocuments(Tables(s, dir).documents)
        .write.mode("overwrite").parquet(p)
    }
    Scratch.parquet(s, path).as[MediaRecord]
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // m1: media catalog — typed ingest + batched decode: image dims/digest
    // from PNG decode, audio n_bytes/rate/digest from WAV decode, video
    // frame count/digest from decoding every container frame.
    "m1_media_catalog" -> { (s, dir) =>
      import s.implicits._
      Media.catalogStats(Media.mediaFromDocuments(Tables(s, dir).documents))
        .toDF()
        .select($"media_id", $"kind", $"n_bytes", $"digest",
                $"width", $"height", $"sample_rate_hz", $"n_frames")
        .orderBy($"media_id")
    },
    // m14: MULTIMODAL QUALITY RULE GATE — x30's published-pipeline rule
    // table pointed at media: per-kind integer rules over the DECODED
    // catalog metadata (small image, low-rate audio, short video, tiny
    // payload — each fires on a real slice of the synthetic fixture),
    // unpivoted to per-(kind, rule) counts plus the per-kind all-pass
    // row. The Spark side reads what the CODECS decoded; the oracle
    // recomputes the same fields from the payload closed forms — so a
    // green row pins decode AND gate. Scale: one metadata-only pass
    // (payload column pruned at the scan), a bounded (kind × rule)
    // aggregate.
    "m14_media_rule_gate" -> { (s, dir) =>
      import s.implicits._
      val st = Media.catalogStats(stagedMedia(s, dir)).toDF()
      st.select($"kind",
          ($"kind" === "image" && ($"width" < 128 || $"height" < 96))
            .as("small_image"),
          ($"kind" === "audio" && $"sample_rate_hz" < 16000).as("low_rate"),
          ($"kind" === "video" && $"n_frames" < 12).as("short_video"),
          ($"n_bytes" < 20000).as("tiny_payload"))
        .withColumn("zz_pass",
          !($"small_image" || $"low_rate" || $"short_video" || $"tiny_payload"))
        .selectExpr("kind",
          """stack(5, 'small_image', small_image, 'low_rate', low_rate,
                      'short_video', short_video, 'tiny_payload', tiny_payload,
                      'zz_pass', zz_pass) as (rule, flagged)""")
        .groupBy($"kind", $"rule")
        .agg(sum(when($"flagged", 1L).otherwise(0L)).as("n_docs"),
             count(lit(1)).as("n_kind"))
        .select($"kind", $"rule", $"n_docs",
                expr("n_docs * 10000 div n_kind").as("rate_bp"))
        .orderBy($"kind", $"rule")
    },
    // m2: frame sampling — container parse skips unsampled frames, only
    // every 4th frame pays the PNG decode; output is the DECODED frame's
    // dims + pixel checksum.
    "m2_frame_sample" -> { (s, dir) =>
      import s.implicits._
      Media.frameSample(stagedMedia(s, dir))
        .toDF()
        .select($"media_id", $"frame_idx".cast("long").as("frame_idx"),
                $"width", $"height", $"checksum")
        .orderBy($"media_id", $"frame_idx")
    },
    // m4: REAL resize — image payloads decoded, nearest-neighbor resampled
    // to 256×144, re-encoded; digest is the RESIZED pixels' checksum
    // (recovered by a second decode) and differs from the input payload's.
    // Audio/video pass through (their digests = unchanged decoded sums).
    "m4_resize" -> { (s, dir) =>
      import s.implicits._
      Media.catalogStats(
          Media.resize(stagedMedia(s, dir), 256, 144))
        .toDF()
        .select($"media_id", $"kind", $"width", $"height", $"digest")
        .orderBy($"media_id")
    },
    // m5: PERCEPTUAL-HASH image dedup — 64-bit aHash from an 8×8 NN sample
    // of the DECODED pixels; `scale_invariant` compares it against the hash
    // of a REAL half-scale resample (a second full decode→resample→encode→
    // decode loop), and near-dup groups form by exact hash equality
    // (window partitioned by the hash — group-sized state, no all-pairs).
    // The oracle recomputes the hash from the tile closed form, pinning
    // both codec paths AND their agreement.
    "m5_phash_dedup" -> { (s, dir) =>
      import s.implicits._
      val h = Media.perceptualHash(stagedMedia(s, dir))
        .toDF()
      val wB = Window.partitionBy($"ahash")
      h.withColumn("scale_invariant", $"ahash" === $"ahash_half")
        .withColumn("n_same_hash", count(lit(1)).over(wB))
        .select($"media_id", $"ahash", $"scale_invariant", $"n_same_hash")
        .orderBy($"media_id")
    },
    // m15: CROSS-MODAL PAIR GATE — the LAION-style image–text alignment
    // filter: per-modality signatures joined on the pair id, a bitwise
    // similarity score, a keep threshold. The image signature is m5's
    // 64-bit aHash of the DECODED pixels (real PNG decode on the Spark
    // side, closed-form tile math in the oracle); the text signature is
    // d3's 32-bit simhash of the paired document — deterministic stand-ins
    // for the learned CLIP embeddings (this container ships no model), so
    // the GATE MECHANISM is fully real and oracle-pinned end to end:
    // signature computation, id-keyed join, per-bit agreement score,
    // threshold keep. Scale shape: one equi-join on the pair id carrying
    // two fixed-width signatures (12 B/row), one projection — embeddings
    // would swap the signature columns, nothing else.
    "m15_cross_modal_gate" -> { (s, dir) =>
      import s.implicits._
      val img = Media.perceptualHash(stagedMedia(s, dir)).toDF()
        .select($"media_id", $"ahash")
      // round-14 (guide §2.3): join on the id FIRST, hash after — the text
      // simhash kernel ran over every document, but only the rows paired
      // with an image row survive the join (1/3 of the corpus); computing
      // the projection on the joined rows emits identical signatures for
      // identical inputs, 3× less kernel work
      val txt = Tables(s, dir).documents.select($"doc_id", $"text")
      img.join(txt, img("media_id") === txt("doc_id"))
        .withColumn("simhash",
          graft.functions.TextKernels.simhashUdf($"text"))
        .withColumn("tbits", expr(
          "concat_ws('', transform(sequence(31, 0, -1)," +
            " j -> cast((shiftright(simhash, j) & 1) as string)))"))
        .withColumn("align_score", expr(
          "32 - cast(size(filter(sequence(1, 32)," +
            " i -> substring(ahash, i, 1) <> substring(tbits, i, 1))) as bigint)"))
        .select($"media_id", $"align_score",
                ($"align_score" >= 17).as("keep"))
        .orderBy($"media_id")
    },
    // m6: AUDIO perceptual fingerprint — the aHash analog over the DECODED
    // PCM: 8 chunk energies of the first 400 samples, bit = chunk above the
    // mean. Pins the WAV decode (two's-complement → unsigned recovery) and
    // gives audio the same hash-equality near-dup grouping as m5's images.
    "m6_audio_fingerprint" -> { (s, dir) =>
      import s.implicits._
      val f = Media.audioFingerprints(stagedMedia(s, dir))
        .toDF()
      val wB = Window.partitionBy($"afp")
      f.withColumn("n_same_fp", count(lit(1)).over(wB))
        .select($"media_id", $"afp", $"n_samples", $"n_same_fp")
        .orderBy($"media_id")
    },
    // m7: FULL-MODALITY resample — one pass that normalizes every modality
    // through its real codec: images NN-resampled to 256×144, audio
    // time-base-resampled to 16 kHz (out sample j = src sample (j·r)/16000,
    // re-encoded WAV — upsampling duplicates, downsampling drops), video
    // per-frame resized to 20×12 and re-packed. catalogStats then re-decodes
    // everything, so digest/n_bytes/rate pin decode → resample → re-encode →
    // decode for all three modalities (the audio rate comes from the
    // re-encoded WAV header).
    "m7_media_resample" -> { (s, dir) =>
      import s.implicits._
      Media.catalogStats(
          Media.resize(stagedMedia(s, dir), 256, 144,
            audioRateHz = 16000, frameW = 20, frameH = 12))
        .toDF()
        .select($"media_id", $"kind", $"n_bytes", $"sample_rate_hz", $"digest")
        .orderBy($"media_id")
    },
    // m8: VIDEO perceptual fingerprint — the m5/m6 analog for clips,
    // completing hash-equality near-dup grouping across all three
    // modalities: aHash of every 8th frame (container slice decodes ONLY
    // sampled frames), concatenated in frame order. The oracle recomputes
    // every sampled frame's 64 bits from the tile closed form (frame id
    // id·131+f at 32×32 → grid sample (4x,4y)), pinning the slice seek,
    // the per-frame decode, and the bit derivation.
    "m8_video_fingerprint" -> { (s, dir) =>
      import s.implicits._
      val f = Media.videoFingerprints(stagedMedia(s, dir)).toDF()
      val wB = Window.partitionBy($"vfp")
      f.withColumn("n_same_fp", count(lit(1)).over(wB))
        .select($"media_id", $"vfp", $"n_sampled", $"n_same_fp")
        .orderBy($"media_id")
    },
    // m9: MULTIMODAL DEDUP GATE — the keep/drop decision a curation
    // pipeline consumes, composed from all three modality fingerprints
    // (m5 image aHash, m6 audio chunk-energy fp, m8 video frame-hash
    // concat): one row per media row, keeper = min media_id within its
    // (kind, fingerprint) group, is_dup flags the rest. Grouping state is
    // group-sized (window over the hash), never all-pairs; each modality's
    // fingerprint is the per-row projection its own entry pins.
    "m9_media_dedup_gate" -> { (s, dir) =>
      import s.implicits._
      val staged = stagedMedia(s, dir)
      val img = Media.perceptualHash(staged).toDF()
        .select($"media_id", lit("image").as("kind"), $"ahash".as("fp"))
      val aud = Media.audioFingerprints(staged).toDF()
        .select($"media_id", lit("audio").as("kind"), $"afp".as("fp"))
      val vid = Media.videoFingerprints(staged).toDF()
        .select($"media_id", lit("video").as("kind"), $"vfp".as("fp"))
      val wG = Window.partitionBy($"kind", $"fp")
      img.unionByName(aud).unionByName(vid)
        .withColumn("keeper_media_id", min($"media_id").over(wG))
        .withColumn("is_dup", $"media_id" =!= $"keeper_media_id")
        .select($"media_id", $"kind", $"fp", $"keeper_media_id", $"is_dup")
        .orderBy($"media_id")
    },
    // m10: SCENE-CUT DETECTION — the shot-boundary pass a video curation
    // pipeline runs before sampling frames for training: decode EVERY
    // frame (frameSample every=1), then flag frames whose pixel-checksum
    // jump from the previous frame exceeds the threshold. The temporal
    // diff is a lag window PARTITIONED BY media_id ordered by frame_idx —
    // state is one frame's checksum per clip, never the decoded pixels,
    // and clips parallelize independently (the 100 TB shape: a shuffle
    // keyed by clip id moves 16-byte checksum rows, not video). The
    // oracle recomputes every checksum from the closed tile form and runs
    // the identical integer lag/threshold chain.
    "m10_scene_cut" -> { (s, dir) =>
      import s.implicits._
      val fr = Media.frameSample(stagedMedia(s, dir), every = 1).toDF()
      val wF = Window.partitionBy($"media_id").orderBy($"frame_idx")
      fr.withColumn("diff", abs($"checksum" - lag($"checksum", 1).over(wF)))
        .withColumn("is_cut", coalesce($"diff" > 50000L, lit(false)))
        .select($"media_id", $"frame_idx".cast("long").as("frame_idx"),
                $"checksum", coalesce($"diff", lit(0L)).as("diff"), $"is_cut")
        .orderBy($"media_id", $"frame_idx")
    },
    // m11: SILENCE-SPAN DETECTION — the audio VAD pass that trims dead air
    // before ASR/training: per-chunk PCM loudness (Σ|sample| over 64-sample
    // windows, decoded through the real WAV codec), chunks below the
    // per-sample threshold (loud·64 < T·n — scale-invariant for the
    // partial last chunk, no division) merged into maximal consecutive
    // SPANS with w10's gaps-and-islands (lag + flag + running island id,
    // partitioned by media_id). State per clip is one chunk row — the
    // energy series, never the PCM, reaches the shuffle. The oracle
    // recomputes every |u−32768| from the closed PCM form and runs the
    // identical island chain.
    "m11_silence_spans" -> { (s, dir) =>
      import s.implicits._
      val ch = Media.audioChunkLoudness(stagedMedia(s, dir)).toDF()
      val silent = ch.filter($"loudness" * 64 < lit(950000L) * $"n_samples")
      val wP = Window.partitionBy($"media_id").orderBy($"chunk_idx")
      silent
        .withColumn("prev", lag($"chunk_idx", 1).over(wP))
        .withColumn("nf",
          when($"prev".isNull || $"chunk_idx" =!= $"prev" + 1, 1L).otherwise(0L))
        .withColumn("sid", sum($"nf").over(
          wP.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"media_id", $"sid")
        .agg(min($"chunk_idx").cast("long").as("start_chunk"),
             max($"chunk_idx").cast("long").as("end_chunk"),
             count(lit(1)).as("n_chunks"),
             sum($"loudness").as("sum_loud"))
        .select($"media_id", $"start_chunk", $"end_chunk", $"n_chunks",
                $"sum_loud")
        .orderBy($"media_id", $"start_chunk")
    },
    // m12: PEAK-NORMALIZATION PLAN — the gain-staging pass an audio
    // pipeline runs before training (normalize every clip to a common
    // peak): per-clip peak/Σ|sample| reduce INSIDE the real WAV decode
    // loop (Media.audioStats — one row per clip reaches the shuffle,
    // never the PCM), then the gain to hit target peak 30000 and the
    // post-gain loudness derive as exact integer per-mille arithmetic.
    // The oracle recomputes peak and Σ|u−32768| from the closed PCM form
    // — a green row pins the full encode→decode→reduce loop.
    "m12_audio_normalize" -> { (s, dir) =>
      import s.implicits._
      Media.audioStats(stagedMedia(s, dir)).toDF()
        .withColumn("gain_pm", expr("30000000 div greatest(peak, 1)"))
        .withColumn("norm_sum_abs", expr("(sum_abs * gain_pm) div 1000"))
        .select($"media_id", $"n_samples", $"peak", $"gain_pm",
                $"norm_sum_abs")
        .orderBy($"media_id")
    },
    // m3: decode + feature extraction through the typed mapPartitions batch
    // path. The normalized float32 embedding is projected back to the EXACT
    // integer byte-histogram of the DECODED content (round(x_i · n_bytes)
    // is exact while hist_i, n_bytes < 2^24 / bin-count): RGB bytes for
    // images and video frames, PCM bytes for audio — every bin count
    // recomputed from the closed forms in SQL.
    "m3_media_features" -> { (s, dir) =>
      import s.implicits._
      Media.featureExtract(stagedMedia(s, dir))
        .toDF()
        .select($"media_id", $"kind",
                array_join(transform($"embedding",
                  x => round(x.cast("double") * $"n_bytes".cast("double"))
                    .cast("long").cast("string")), ",").as("hist"))
        .orderBy($"media_id")
    },
    // m13: FUSED MULTI-FEATURE DECODE — the whole-curation sweep. Run
    // separately, m3 + m5/m6/m8 + m10 decode the same payload three-to-four
    // times; at 100 TB the decode bill dominates the cluster cost, so the
    // production pass decodes ONCE and derives every feature family in the
    // same pixel/PCM sweep: the m3 byte histogram, the modality fingerprint
    // (image aHash / audio chunk-energy / video sampled-frame concat), and
    // the checksum series (per-frame, in frame order — m10's scene-cut
    // input). The oracle recomputes all three families from the closed
    // forms and joins them, so a green row pins feature EQUIVALENCE with
    // the unfused entries, not just plumbing.
    "m13_fused_media_pass" -> { (s, dir) =>
      import s.implicits._
      Media.fusedFeatures(stagedMedia(s, dir)).toDF()
        .select($"media_id", $"kind", $"hist", $"fp", $"checksums")
        .orderBy($"media_id")
    }
  )

  /** Shared oracle CTEs: image dims + the 16×16 tile grid. */
  private val imgCtes = """
      imgs AS (
        SELECT doc_id, 64 + (doc_id % 16) * 16 AS w, 48 + (doc_id % 9) * 16 AS h
        FROM documents WHERE doc_id % 3 = 0),
      tile AS (
        SELECT a.tx, b.ty FROM (SELECT unnest(range(0, 16)) AS tx) a
        CROSS JOIN (SELECT unnest(range(0, 16)) AS ty) b)"""

  /** Shared audio CTEs: the closed-form unsigned sample series and its sum. */
  private val audCtes = """
      auds AS (
        SELECT doc_id, 400 + (doc_id % 7) * 200 AS n
        FROM documents WHERE doc_id % 3 = 1),
      au AS (
        SELECT doc_id, (doc_id * 31 + i * 7) % 65536 AS u
        FROM (SELECT doc_id, unnest(range(0, n)) AS i FROM auds) t),
      achk AS (SELECT doc_id, SUM(u)::BIGINT AS checksum FROM au GROUP BY doc_id)"""

  /** Shared video CTEs: per-doc frame list and the whole-clip checksum
    * (each 32×32 frame = 4 exact tile repeats of derived id id·131 + f). */
  private def vidCtes = s"""
      vids AS (
        SELECT doc_id, 8 + (doc_id % 24) AS nf
        FROM documents WHERE doc_id % 3 = 2),
      vfr AS (SELECT doc_id, nf, unnest(range(0, nf)) AS f FROM vids),
      vchk AS (
        SELECT v.doc_id,
               4 * SUM(${rgbSum("(v.doc_id * 131 + v.f)", "t.tx", "t.ty")}) AS checksum
        FROM vfr v CROSS JOIN tile t GROUP BY v.doc_id)"""

  /** Σ of the three channel formulas at tile coordinate (tx, ty). */
  private def rgbSum(id: String, tx: String, ty: String): String =
    s"((($id * 31 + 7 * $tx + 13 * $ty) % 256)" +
      s" + (($id * 17 + 11 * $tx + 3 * $ty) % 256)" +
      s" + (($id * 29 + 5 * $tx + 2 * $ty) % 256))"

  /** The 3 channel formulas as a list (for histogram unnests). */
  private def rgbVals(id: String, tx: String, ty: String): String =
    s"[(($id * 31 + 7 * $tx + 13 * $ty) % 256), " +
      s"(($id * 17 + 11 * $tx + 3 * $ty) % 256), " +
      s"(($id * 29 + 5 * $tx + 2 * $ty) % 256)]"

  val oracle: Map[String, String] = Map(
    "m6_audio_fingerprint" -> """
      WITH auds AS (
        SELECT doc_id, 400 + (doc_id % 7) * 200 AS n
        FROM documents WHERE doc_id % 3 = 1),
      ai AS (SELECT doc_id, unnest(range(0, 400)) AS i FROM auds),
      en AS (
        SELECT doc_id, (i // 50) AS c,
               SUM((doc_id * 31 + i * 7) % 65536)::BIGINT AS e
        FROM ai GROUP BY doc_id, i // 50),
      tot AS (SELECT doc_id, SUM(e) AS total FROM en GROUP BY doc_id),
      fp AS (
        SELECT en.doc_id,
               string_agg(CASE WHEN en.e * 8 > t.total THEN '1' ELSE '0' END,
                          '' ORDER BY en.c) AS afp
        FROM en JOIN tot t USING (doc_id) GROUP BY en.doc_id)
      SELECT a.doc_id AS media_id, f.afp, a.n::INT AS n_samples,
             (COUNT(*) OVER (PARTITION BY f.afp))::BIGINT AS n_same_fp
      FROM auds a JOIN fp f USING (doc_id)
      ORDER BY media_id""",
    // m15: image aHash from the tile closed form (m5's CTEs), text simhash
    // from d3's fold, per-bit agreement over the first 32 hash positions
    "m15_cross_modal_gate" -> s"""
      WITH $imgCtes,
      grid AS (
        SELECT a.x, b.y FROM (SELECT unnest(range(0, 8)) AS x) a
        CROSS JOIN (SELECT unnest(range(0, 8)) AS y) b),
      samp AS (
        SELECT i.doc_id, g.x, g.y,
               ${rgbSum("i.doc_id", "(((g.x * i.w) // 8) % 16)",
                        "(((g.y * i.h) // 8) % 16)")} AS s
        FROM imgs i CROSS JOIN grid g),
      tot AS (SELECT doc_id, SUM(s) AS total FROM samp GROUP BY doc_id),
      hsh AS (
        SELECT s.doc_id,
               string_agg(CASE WHEN s.s * 64 > t.total THEN '1' ELSE '0' END,
                          '' ORDER BY s.y, s.x) AS ahash
        FROM samp s JOIN tot t USING (doc_id) GROUP BY s.doc_id),
      sh AS (
        SELECT doc_id, (${Dedup.simhashSql("hs")})::BIGINT AS simhash
        FROM (SELECT doc_id, list_transform(ws, t -> ${Tx.polyHashSql("t")}) AS hs
              FROM (SELECT doc_id, ${Tx.wsSql} AS ws FROM documents) t0) t1),
      tb AS (
        SELECT sh.doc_id,
               string_agg(((sh.simhash >> b.j) & 1)::VARCHAR,
                          '' ORDER BY b.j DESC) AS tbits
        FROM sh CROSS JOIN (SELECT unnest(range(0, 32)) AS j) b
        GROUP BY sh.doc_id),
      sc AS (
        SELECT h.doc_id,
               (32 - len(list_filter(range(1, 33),
                 i -> h.ahash[i] <> t.tbits[i])))::BIGINT AS align_score
        FROM hsh h JOIN tb t USING (doc_id))
      SELECT doc_id AS media_id, align_score, align_score >= 17 AS keep
      FROM sc ORDER BY media_id""",
    "m5_phash_dedup" -> s"""
      WITH $imgCtes,
      grid AS (
        SELECT a.x, b.y FROM (SELECT unnest(range(0, 8)) AS x) a
        CROSS JOIN (SELECT unnest(range(0, 8)) AS y) b),
      samp AS (
        SELECT i.doc_id, g.x, g.y,
               ${rgbSum("i.doc_id", "(((g.x * i.w) // 8) % 16)",
                        "(((g.y * i.h) // 8) % 16)")} AS s
        FROM imgs i CROSS JOIN grid g),
      tot AS (SELECT doc_id, SUM(s) AS total FROM samp GROUP BY doc_id),
      hsh AS (
        SELECT s.doc_id,
               string_agg(CASE WHEN s.s * 64 > t.total THEN '1' ELSE '0' END,
                          '' ORDER BY s.y, s.x) AS ahash
        FROM samp s JOIN tot t USING (doc_id) GROUP BY s.doc_id)
      SELECT doc_id AS media_id, ahash, TRUE AS scale_invariant,
             (COUNT(*) OVER (PARTITION BY ahash))::BIGINT AS n_same_hash
      FROM hsh ORDER BY media_id""",
    "m1_media_catalog" -> s"""
      WITH $imgCtes,
      $audCtes,
      $vidCtes,
      chk AS (
        SELECT i.doc_id, (i.w // 16) * (i.h // 16)
               * SUM(${rgbSum("i.doc_id", "t.tx", "t.ty")}) AS checksum
        FROM imgs i CROSS JOIN tile t GROUP BY i.doc_id, i.w, i.h)
      SELECT d.doc_id AS media_id,
             (['image','audio','video'])[(d.doc_id % 3) + 1] AS kind,
             CASE WHEN d.doc_id % 3 = 0 THEN (i.w * i.h * 3)::BIGINT
                  WHEN d.doc_id % 3 = 1 THEN (a.n * 2)::BIGINT
                  ELSE (vd.nf * ${Media.FrameW * Media.FrameH * 3})::BIGINT END AS n_bytes,
             CASE WHEN d.doc_id % 3 = 0 THEN chk.checksum::VARCHAR
                  WHEN d.doc_id % 3 = 1 THEN achk.checksum::VARCHAR
                  ELSE vchk.checksum::VARCHAR END AS digest,
             (64 + (d.doc_id % 16) * 16)::INT AS width,
             (48 + (d.doc_id % 9) * 16)::INT AS height,
             (8000 + (d.doc_id % 5) * 8000)::INT AS sample_rate_hz,
             (8 + (d.doc_id % 24))::INT AS n_frames
      FROM documents d
      LEFT JOIN imgs i ON i.doc_id = d.doc_id
      LEFT JOIN chk ON chk.doc_id = d.doc_id
      LEFT JOIN auds a ON a.doc_id = d.doc_id
      LEFT JOIN achk ON achk.doc_id = d.doc_id
      LEFT JOIN vids vd ON vd.doc_id = d.doc_id
      LEFT JOIN vchk ON vchk.doc_id = d.doc_id
      ORDER BY media_id""",
    // m14: metadata closed forms + the same rule CASEs, stacked by kind
    "m14_media_rule_gate" -> s"""
      WITH $imgCtes,
      $audCtes,
      $vidCtes,
      meta AS (
        SELECT d.doc_id,
               (['image','audio','video'])[(d.doc_id % 3) + 1] AS kind,
               CASE WHEN d.doc_id % 3 = 0 THEN (i.w * i.h * 3)::BIGINT
                    WHEN d.doc_id % 3 = 1 THEN (a.n * 2)::BIGINT
                    ELSE (vd.nf * ${Media.FrameW * Media.FrameH * 3})::BIGINT
                 END AS n_bytes,
               (64 + (d.doc_id % 16) * 16) AS width,
               (48 + (d.doc_id % 9) * 16) AS height,
               (8000 + (d.doc_id % 5) * 8000) AS sample_rate_hz,
               (8 + (d.doc_id % 24)) AS n_frames
        FROM documents d
        LEFT JOIN imgs i ON i.doc_id = d.doc_id
        LEFT JOIN auds a ON a.doc_id = d.doc_id
        LEFT JOIN vids vd ON vd.doc_id = d.doc_id),
      f AS (
        SELECT kind,
               kind = 'image' AND (width < 128 OR height < 96) AS small_image,
               kind = 'audio' AND sample_rate_hz < 16000 AS low_rate,
               kind = 'video' AND n_frames < 12 AS short_video,
               n_bytes < 20000 AS tiny_payload
        FROM meta),
      f2 AS (
        SELECT *, NOT (small_image OR low_rate OR short_video OR tiny_payload)
                    AS zz_pass
        FROM f),
      long AS (
        SELECT kind, 'small_image' AS rule, small_image AS flagged FROM f2
        UNION ALL SELECT kind, 'low_rate', low_rate FROM f2
        UNION ALL SELECT kind, 'short_video', short_video FROM f2
        UNION ALL SELECT kind, 'tiny_payload', tiny_payload FROM f2
        UNION ALL SELECT kind, 'zz_pass', zz_pass FROM f2)
      SELECT kind, rule,
             SUM(CASE WHEN flagged THEN 1 ELSE 0 END)::BIGINT AS n_docs,
             (SUM(CASE WHEN flagged THEN 1 ELSE 0 END) * 10000 // COUNT(*))::BIGINT
               AS rate_bp
      FROM long GROUP BY 1, 2 ORDER BY kind, rule""",
    "m2_frame_sample" -> s"""
      WITH $imgCtes,
      $vidCtes
      SELECT v.doc_id AS media_id, v.f::BIGINT AS frame_idx,
             ${Media.FrameW}::INT AS width, ${Media.FrameH}::INT AS height,
             (4 * SUM(${rgbSum("(v.doc_id * 131 + v.f)", "t.tx", "t.ty")}))::BIGINT AS checksum
      FROM vfr v CROSS JOIN tile t
      WHERE v.f % 4 = 0
      GROUP BY v.doc_id, v.f
      ORDER BY media_id, frame_idx""",
    "m12_audio_normalize" -> s"""
      WITH $audCtes,
      st AS (
        SELECT doc_id, COUNT(*)::BIGINT AS n_samples,
               MAX(abs(u - 32768))::BIGINT AS peak,
               SUM(abs(u - 32768))::BIGINT AS sum_abs
        FROM au GROUP BY doc_id)
      SELECT doc_id AS media_id, n_samples, peak,
             (30000000 // greatest(peak, 1))::BIGINT AS gain_pm,
             ((sum_abs * (30000000 // greatest(peak, 1))) // 1000)::BIGINT
               AS norm_sum_abs
      FROM st ORDER BY media_id""",
    "m11_silence_spans" -> s"""
      WITH auds AS (
        SELECT doc_id, 400 + (doc_id % 7) * 200 AS n
        FROM documents WHERE doc_id % 3 = 1),
      ch AS (
        SELECT doc_id, i // 64 AS c, COUNT(*) AS ns,
               SUM(abs(((doc_id * 31 + i * 7) % 65536) - 32768))::BIGINT AS loud
        FROM (SELECT doc_id, unnest(range(0, n)) AS i FROM auds) t
        GROUP BY 1, 2),
      sil AS (SELECT * FROM ch WHERE loud * 64 < 950000 * ns),
      sp AS (
        SELECT doc_id, c, loud,
               CASE WHEN c - 1 = lag(c) OVER (PARTITION BY doc_id ORDER BY c)
                    THEN 0 ELSE 1 END AS nf
        FROM sil),
      isl AS (
        SELECT doc_id, c, loud,
               SUM(nf) OVER (PARTITION BY doc_id ORDER BY c
                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM sp)
      SELECT doc_id AS media_id, MIN(c)::BIGINT AS start_chunk,
             MAX(c)::BIGINT AS end_chunk, COUNT(*)::BIGINT AS n_chunks,
             SUM(loud)::BIGINT AS sum_loud
      FROM isl GROUP BY doc_id, sid ORDER BY media_id, start_chunk""",
    "m10_scene_cut" -> s"""
      WITH $imgCtes,
      $vidCtes,
      chk AS (
        SELECT v.doc_id, v.f,
               (4 * SUM(${rgbSum("(v.doc_id * 131 + v.f)", "t.tx", "t.ty")}))::BIGINT AS checksum
        FROM vfr v CROSS JOIN tile t
        GROUP BY v.doc_id, v.f)
      SELECT doc_id AS media_id, f::BIGINT AS frame_idx, checksum,
             COALESCE(diff, 0)::BIGINT AS diff,
             COALESCE(diff > 50000, FALSE) AS is_cut
      FROM (
        SELECT doc_id, f, checksum,
               abs(checksum - lag(checksum) OVER (PARTITION BY doc_id ORDER BY f)) AS diff
        FROM chk) t
      ORDER BY media_id, frame_idx""",
    "m4_resize" -> s"""
      WITH $imgCtes,
      $audCtes,
      $vidCtes,
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
                  ELSE vchk.checksum::VARCHAR END AS digest
      FROM documents d
      LEFT JOIN rchk ON rchk.doc_id = d.doc_id
      LEFT JOIN achk ON achk.doc_id = d.doc_id
      LEFT JOIN vchk ON vchk.doc_id = d.doc_id
      ORDER BY media_id""",
    // m9: the three fingerprint derivations (m5/m6/m8 shapes, prefixed
    // CTE names) unioned, keeper = min per (kind, fp) group.
    "m9_media_dedup_gate" -> s"""
      WITH $imgCtes,
      $audCtes,
      g9 AS (
        SELECT a.x, b.y FROM (SELECT unnest(range(0, 8)) AS x) a
        CROSS JOIN (SELECT unnest(range(0, 8)) AS y) b),
      is9 AS (
        SELECT i.doc_id, g.x, g.y,
               ${rgbSum("i.doc_id", "(((g.x * i.w) // 8) % 16)",
                        "(((g.y * i.h) // 8) % 16)")} AS s
        FROM imgs i CROSS JOIN g9 g),
      it9 AS (SELECT doc_id, SUM(s) AS total FROM is9 GROUP BY doc_id),
      ih9 AS (
        SELECT s.doc_id,
               string_agg(CASE WHEN s.s * 64 > t.total THEN '1' ELSE '0' END,
                          '' ORDER BY s.y, s.x) AS fp
        FROM is9 s JOIN it9 t USING (doc_id) GROUP BY s.doc_id),
      ae9 AS (
        SELECT doc_id, (i // 50) AS c,
               SUM((doc_id * 31 + i * 7) % 65536)::BIGINT AS e
        FROM (SELECT doc_id, unnest(range(0, 400)) AS i FROM auds) t
        GROUP BY doc_id, i // 50),
      at9 AS (SELECT doc_id, SUM(e) AS total FROM ae9 GROUP BY doc_id),
      af9 AS (
        SELECT ae9.doc_id,
               string_agg(CASE WHEN ae9.e * 8 > t.total THEN '1' ELSE '0' END,
                          '' ORDER BY ae9.c) AS fp
        FROM ae9 JOIN at9 t USING (doc_id) GROUP BY ae9.doc_id),
      vd9 AS (
        SELECT doc_id, 8 + (doc_id % 24) AS nf
        FROM documents WHERE doc_id % 3 = 2),
      vs9 AS (
        SELECT doc_id, f FROM (SELECT doc_id, unnest(range(0, nf)) AS f FROM vd9) t
        WHERE f % 8 = 0),
      vp9 AS (
        SELECT s.doc_id, s.f, g.x, g.y,
               ${rgbSum("(s.doc_id * 131 + s.f)", "((g.x * 4) % 16)",
                        "((g.y * 4) % 16)")} AS v
        FROM vs9 s CROSS JOIN g9 g),
      vt9 AS (SELECT doc_id, f, SUM(v) AS total FROM vp9 GROUP BY doc_id, f),
      vh9 AS (
        SELECT s.doc_id, s.f,
               string_agg(CASE WHEN s.v * 64 > t.total THEN '1' ELSE '0' END,
                          '' ORDER BY s.y, s.x) AS h
        FROM vp9 s JOIN vt9 t ON s.doc_id = t.doc_id AND s.f = t.f
        GROUP BY s.doc_id, s.f),
      vf9 AS (
        SELECT doc_id, string_agg(h, '' ORDER BY f) AS fp
        FROM vh9 GROUP BY doc_id),
      allf AS (
        SELECT doc_id AS media_id, 'image' AS kind, fp FROM ih9
        UNION ALL SELECT doc_id, 'audio', fp FROM af9
        UNION ALL SELECT doc_id, 'video', fp FROM vf9)
      SELECT media_id, kind, fp,
             MIN(media_id) OVER (PARTITION BY kind, fp) AS keeper_media_id,
             media_id <> MIN(media_id) OVER (PARTITION BY kind, fp) AS is_dup
      FROM allf ORDER BY media_id""",
    "m8_video_fingerprint" -> s"""
      WITH vids AS (
        SELECT doc_id, 8 + (doc_id % 24) AS nf
        FROM documents WHERE doc_id % 3 = 2),
      sfs AS (
        SELECT doc_id, f FROM (SELECT doc_id, unnest(range(0, nf)) AS f FROM vids) t
        WHERE f % 8 = 0),
      grid AS (
        SELECT a.x, b.y FROM (SELECT unnest(range(0, 8)) AS x) a
        CROSS JOIN (SELECT unnest(range(0, 8)) AS y) b),
      samp AS (
        SELECT s.doc_id, s.f, g.x, g.y,
               ${rgbSum("(s.doc_id * 131 + s.f)", "((g.x * 4) % 16)",
                        "((g.y * 4) % 16)")} AS v
        FROM sfs s CROSS JOIN grid g),
      tot AS (SELECT doc_id, f, SUM(v) AS total FROM samp GROUP BY doc_id, f),
      fh AS (
        SELECT s.doc_id, s.f,
               string_agg(CASE WHEN s.v * 64 > t.total THEN '1' ELSE '0' END,
                          '' ORDER BY s.y, s.x) AS h
        FROM samp s JOIN tot t ON s.doc_id = t.doc_id AND s.f = t.f
        GROUP BY s.doc_id, s.f),
      fp AS (
        SELECT doc_id, string_agg(h, '' ORDER BY f) AS vfp,
               COUNT(*)::INT AS n_sampled
        FROM fh GROUP BY doc_id)
      SELECT doc_id AS media_id, vfp, n_sampled,
             (COUNT(*) OVER (PARTITION BY vfp))::BIGINT AS n_same_fp
      FROM fp ORDER BY media_id""",
    "m7_media_resample" -> s"""
      WITH $imgCtes,
      $audCtes,
      $vidCtes,
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
        GROUP BY x.doc_id),
      ares AS (
        SELECT doc_id, n, 8000 + (doc_id % 5) * 8000 AS r,
               (n * 16000) // (8000 + (doc_id % 5) * 8000) AS m
        FROM auds),
      archk AS (
        SELECT doc_id,
               SUM((doc_id * 31 + ((j * r) // 16000) * 7) % 65536)::BIGINT AS checksum
        FROM (SELECT doc_id, r, unnest(range(0, m)) AS j FROM ares) t
        GROUP BY doc_id),
      vcx AS (
        SELECT ((x * 32) // 20) % 16 AS tx, COUNT(*) AS cx
        FROM (SELECT unnest(range(0, 20)) AS x) GROUP BY 1),
      vcy AS (
        SELECT ((y * 32) // 12) % 16 AS ty, COUNT(*) AS cy
        FROM (SELECT unnest(range(0, 12)) AS y) GROUP BY 1),
      vrchk AS (
        SELECT v.doc_id,
               SUM(${rgbSum("(v.doc_id * 131 + v.f)", "x.tx", "y.ty")}
                   * x.cx * y.cy) AS checksum
        FROM vfr v CROSS JOIN vcx x CROSS JOIN vcy y
        GROUP BY v.doc_id)
      SELECT d.doc_id AS media_id,
             (['image','audio','video'])[(d.doc_id % 3) + 1] AS kind,
             CASE WHEN d.doc_id % 3 = 0 THEN ${256 * 144 * 3}::BIGINT
                  WHEN d.doc_id % 3 = 1 THEN (a2.m * 2)::BIGINT
                  ELSE (vd.nf * ${20 * 12 * 3})::BIGINT END AS n_bytes,
             CASE WHEN d.doc_id % 3 = 1 THEN 16000
                  ELSE 8000 + (d.doc_id % 5) * 8000 END::INT AS sample_rate_hz,
             CASE WHEN d.doc_id % 3 = 0 THEN rchk.checksum::VARCHAR
                  WHEN d.doc_id % 3 = 1 THEN archk.checksum::VARCHAR
                  ELSE vrchk.checksum::VARCHAR END AS digest
      FROM documents d
      LEFT JOIN rchk ON rchk.doc_id = d.doc_id
      LEFT JOIN ares a2 ON a2.doc_id = d.doc_id
      LEFT JOIN archk ON archk.doc_id = d.doc_id
      LEFT JOIN vids vd ON vd.doc_id = d.doc_id
      LEFT JOIN vrchk ON vrchk.doc_id = d.doc_id
      ORDER BY media_id""",
    // m13: hist = m3's three histogram chains; fp = m9's three fingerprint
    // chains; checksums = m1's whole-image/audio sums + m10's per-frame
    // series string_agg'd in frame order — all joined per media row.
    "m13_fused_media_pass" -> s"""
      WITH $imgCtes,
      $audCtes,
      $vidCtes,
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
               unnest(${rgbVals("i.doc_id", "t.tx", "t.ty")}) AS v
        FROM imgs i CROSS JOIN tile t),
      vc AS (SELECT doc_id, v // 16 AS bin, COUNT(*) AS c FROM vals GROUP BY 1, 2),
      ih AS (
        SELECT i.doc_id,
               string_agg((COALESCE(vc.c, 0) * (i.w // 16) * (i.h // 16))::VARCHAR,
                          ',' ORDER BY b.bin) AS hist
        FROM imgs i
        CROSS JOIN (SELECT unnest(range(0, 16)) AS bin) b
        LEFT JOIN vc ON vc.doc_id = i.doc_id AND vc.bin = b.bin
        GROUP BY i.doc_id),
      vvals AS (
        SELECT fr.doc_id,
               unnest(${rgbVals("(fr.doc_id * 131 + fr.f)", "t.tx", "t.ty")}) AS v
        FROM vfr fr CROSS JOIN tile t),
      vvc AS (SELECT doc_id, v // 16 AS bin, COUNT(*) * 4 AS c FROM vvals GROUP BY 1, 2),
      vh AS (
        SELECT vd.doc_id,
               string_agg(COALESCE(vvc.c, 0)::VARCHAR, ',' ORDER BY b.bin) AS hist
        FROM vids vd
        CROSS JOIN (SELECT unnest(range(0, 16)) AS bin) b
        LEFT JOIN vvc ON vvc.doc_id = vd.doc_id AND vvc.bin = b.bin
        GROUP BY vd.doc_id),
      g9 AS (
        SELECT a.x, b.y FROM (SELECT unnest(range(0, 8)) AS x) a
        CROSS JOIN (SELECT unnest(range(0, 8)) AS y) b),
      is9 AS (
        SELECT i.doc_id, g.x, g.y,
               ${rgbSum("i.doc_id", "(((g.x * i.w) // 8) % 16)",
                        "(((g.y * i.h) // 8) % 16)")} AS s
        FROM imgs i CROSS JOIN g9 g),
      it9 AS (SELECT doc_id, SUM(s) AS total FROM is9 GROUP BY doc_id),
      ih9 AS (
        SELECT s.doc_id,
               string_agg(CASE WHEN s.s * 64 > t.total THEN '1' ELSE '0' END,
                          '' ORDER BY s.y, s.x) AS fp
        FROM is9 s JOIN it9 t USING (doc_id) GROUP BY s.doc_id),
      ae9 AS (
        SELECT doc_id, (i // 50) AS c,
               SUM((doc_id * 31 + i * 7) % 65536)::BIGINT AS e
        FROM (SELECT doc_id, unnest(range(0, 400)) AS i FROM auds) t
        GROUP BY doc_id, i // 50),
      at9 AS (SELECT doc_id, SUM(e) AS total FROM ae9 GROUP BY doc_id),
      af9 AS (
        SELECT ae9.doc_id,
               string_agg(CASE WHEN ae9.e * 8 > t.total THEN '1' ELSE '0' END,
                          '' ORDER BY ae9.c) AS fp
        FROM ae9 JOIN at9 t USING (doc_id) GROUP BY ae9.doc_id),
      vs9 AS (
        SELECT doc_id, f FROM (SELECT doc_id, unnest(range(0, nf)) AS f FROM vids) t
        WHERE f % 8 = 0),
      vp9 AS (
        SELECT s.doc_id, s.f, g.x, g.y,
               ${rgbSum("(s.doc_id * 131 + s.f)", "((g.x * 4) % 16)",
                        "((g.y * 4) % 16)")} AS v
        FROM vs9 s CROSS JOIN g9 g),
      vt9 AS (SELECT doc_id, f, SUM(v) AS total FROM vp9 GROUP BY doc_id, f),
      vh9 AS (
        SELECT s.doc_id, s.f,
               string_agg(CASE WHEN s.v * 64 > t.total THEN '1' ELSE '0' END,
                          '' ORDER BY s.y, s.x) AS h
        FROM vp9 s JOIN vt9 t ON s.doc_id = t.doc_id AND s.f = t.f
        GROUP BY s.doc_id, s.f),
      vf9 AS (
        SELECT doc_id, string_agg(h, '' ORDER BY f) AS fp
        FROM vh9 GROUP BY doc_id),
      ichk AS (
        SELECT i.doc_id, (i.w // 16) * (i.h // 16)
               * SUM(${rgbSum("i.doc_id", "t.tx", "t.ty")}) AS checksum
        FROM imgs i CROSS JOIN tile t GROUP BY i.doc_id, i.w, i.h),
      vfc AS (
        SELECT v.doc_id, v.f,
               (4 * SUM(${rgbSum("(v.doc_id * 131 + v.f)", "t.tx", "t.ty")}))::BIGINT AS checksum
        FROM vfr v CROSS JOIN tile t
        GROUP BY v.doc_id, v.f),
      vcs AS (
        SELECT doc_id, string_agg(checksum::VARCHAR, ',' ORDER BY f) AS cs
        FROM vfc GROUP BY doc_id)
      SELECT d.doc_id AS media_id,
             (['image','audio','video'])[(d.doc_id % 3) + 1] AS kind,
             CASE WHEN d.doc_id % 3 = 0 THEN ih.hist
                  WHEN d.doc_id % 3 = 1 THEN ah.hist
                  ELSE vh.hist END AS hist,
             CASE WHEN d.doc_id % 3 = 0 THEN ih9.fp
                  WHEN d.doc_id % 3 = 1 THEN af9.fp
                  ELSE vf9.fp END AS fp,
             CASE WHEN d.doc_id % 3 = 0 THEN ichk.checksum::VARCHAR
                  WHEN d.doc_id % 3 = 1 THEN achk.checksum::VARCHAR
                  ELSE vcs.cs END AS checksums
      FROM documents d
      LEFT JOIN ih ON ih.doc_id = d.doc_id
      LEFT JOIN ah ON ah.doc_id = d.doc_id
      LEFT JOIN vh ON vh.doc_id = d.doc_id
      LEFT JOIN ih9 ON ih9.doc_id = d.doc_id
      LEFT JOIN af9 ON af9.doc_id = d.doc_id
      LEFT JOIN vf9 ON vf9.doc_id = d.doc_id
      LEFT JOIN ichk ON ichk.doc_id = d.doc_id
      LEFT JOIN achk ON achk.doc_id = d.doc_id
      LEFT JOIN vcs ON vcs.doc_id = d.doc_id
      ORDER BY media_id""",
    "m3_media_features" -> s"""
      WITH $imgCtes,
      $audCtes,
      $vidCtes,
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
               unnest(${rgbVals("i.doc_id", "t.tx", "t.ty")}) AS v
        FROM imgs i CROSS JOIN tile t),
      vc AS (SELECT doc_id, v // 16 AS bin, COUNT(*) AS c FROM vals GROUP BY 1, 2),
      ih AS (
        SELECT i.doc_id,
               string_agg((COALESCE(vc.c, 0) * (i.w // 16) * (i.h // 16))::VARCHAR,
                          ',' ORDER BY b.bin) AS hist
        FROM imgs i
        CROSS JOIN (SELECT unnest(range(0, 16)) AS bin) b
        LEFT JOIN vc ON vc.doc_id = i.doc_id AND vc.bin = b.bin
        GROUP BY i.doc_id),
      vvals AS (
        SELECT fr.doc_id,
               unnest(${rgbVals("(fr.doc_id * 131 + fr.f)", "t.tx", "t.ty")}) AS v
        FROM vfr fr CROSS JOIN tile t),
      vvc AS (SELECT doc_id, v // 16 AS bin, COUNT(*) * 4 AS c FROM vvals GROUP BY 1, 2),
      vh AS (
        SELECT vd.doc_id,
               string_agg(COALESCE(vvc.c, 0)::VARCHAR, ',' ORDER BY b.bin) AS hist
        FROM vids vd
        CROSS JOIN (SELECT unnest(range(0, 16)) AS bin) b
        LEFT JOIN vvc ON vvc.doc_id = vd.doc_id AND vvc.bin = b.bin
        GROUP BY vd.doc_id)
      SELECT d.doc_id AS media_id,
             (['image','audio','video'])[(d.doc_id % 3) + 1] AS kind,
             CASE WHEN d.doc_id % 3 = 0 THEN ih.hist
                  WHEN d.doc_id % 3 = 1 THEN ah.hist
                  ELSE vh.hist END AS hist
      FROM documents d
      LEFT JOIN ih ON ih.doc_id = d.doc_id
      LEFT JOIN ah ON ah.doc_id = d.doc_id
      LEFT JOIN vh ON vh.doc_id = d.doc_id
      ORDER BY media_id"""
  )
}
