package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed media metadata carried alongside the opaque payload. */
final case class MediaMeta(width: Int, height: Int, sample_rate_hz: Int, n_frames: Int)

/** One multimodal row: opaque binary payload + typed metadata. At 100 TB the
  * payload column dominates storage; metadata-only queries must prune it
  * (parquet column pruning — see MultimodalSpec's ReadSchema assertion). */
final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte],
                             meta: MediaMeta)

/** One sampled, DECODED frame of a video payload. */
final case class MediaFrame(media_id: Long, frame_idx: Int, width: Int,
                            height: Int, checksum: Long)

/** Perceptual hash of an image payload at two scales (m5). */
final case class MediaPHash(media_id: Long, ahash: String, ahash_half: String)

/** Perceptual fingerprint of an audio payload (m6). */
final case class MediaAFp(media_id: Long, afp: String, n_samples: Int)

/** Perceptual fingerprint of a video payload (m8): concatenated per-
  * sampled-frame aHashes, in frame order. */
final case class MediaVFp(media_id: Long, vfp: String, n_sampled: Int)

/** Per-chunk PCM loudness of decoded audio (m11): Σ|sample| over a
  * fixed-size sample window (last chunk may be partial — n_samples < chunk). */
final case class MediaChunk(media_id: Long, chunk_idx: Int, n_samples: Int,
                            loudness: Long)

/** Per-clip decoded PCM statistics (m12 normalization planning): sample
  * count, peak |amplitude|, and Σ|amplitude| over the whole clip. */
final case class MediaAudioStats(media_id: Long, n_samples: Long, peak: Long,
                                 sum_abs: Long)

/** Fused single-decode feature row (m13): every feature family the curation
  * pipeline consumes — byte histogram (m3 shape), perceptual fingerprint
  * (m5/m6/m8 shape), and content checksum series (m10's scene-cut input for
  * video) — derived from ONE decode of the payload. */
final case class MediaFused(media_id: Long, kind: String, hist: String,
                            fp: String, checksums: String)

/** Decoded-content embedding: 16-bin byte histogram over the DECODED bytes
  * (raw RGB for images), normalized by `n_bytes` = decoded length. */
final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                               embedding: Array[Float])

/** Per-row decoded catalog stats: dims/digest come from actually decoding
  * the payload (images), not from trusting the metadata. */
final case class MediaStats(media_id: Long, kind: String, width: Int, height: Int,
                            sample_rate_hz: Int, n_frames: Int, n_bytes: Long,
                            digest: String)

/** Multimodal-column operators (north-star mandate — SURVEY.md §2.B; no
  * reference citation: the reference is CSV-only).
  *
  * Images/audio/video are opaque `binary` columns with typed metadata.
  * Decode / feature-extract / resize / frame-sample run as BATCHED
  * per-partition operators (`mapPartitions` + `grouped(batchSize)`) — the
  * JVM analog of arrow-batch Pandas UDFs: each batch boundary is where a
  * codec library would receive one buffer block.
  *
  * The IMAGE codec is REAL: payloads are PNG bytes (deterministic 16×16-tile
  * pattern, a pure function of media_id — `synthPng`), decoded with the
  * in-JDK `javax.imageio`, and `resize` is an actual nearest-neighbor pixel
  * resample whose re-encoded payload differs from the input. Because the
  * pixel pattern is closed-form, a SQL engine can recompute decoded
  * checksums/histograms without any codec — that is how the m-pack oracles
  * pin the full generate → encode → decode → resample loop. The AUDIO
  * codec is REAL as well: payloads are WAV bytes (closed-form PCM16 tone,
  * `synthWav`), decoded with the in-JDK `javax.sound.sampled` reader, the
  * sample rate recovered from the decoded header. VIDEO payloads are a
  * length-prefixed PNG-frame container (the MJPEG shape — `synthVideo`):
  * frame extraction is a seek+slice that decodes only sampled frames, and
  * full decode concatenates per-frame RGB. All three modalities therefore
  * run genuine codecs end-to-end.
  *
  * Scale notes (100 TB):
  *  - all operators are per-row/per-partition (no shuffle); parallelism
  *    comes from input splits. Locally the single-split testdata files
  *    would serialize the codec-bound stages onto one task, so
  *    `mediaFromDocuments` spreads ONLY when the input has fewer splits
  *    than the cluster has slots (a real 100 TB input never triggers it);
  *  - frameSample explodes rows but never copies the full payload per frame
  *    (each frame slices its own byte range), and non-video rows are
  *    filtered by COLUMN before any payload is materialized so the filter
  *    pushes below the payload projection;
  *  - metadata-only plans never deserialize `payload` (column pruning);
  *  - batches bound peak memory per task: batchSize × max payload size.
  */
object Media {

  // ImageIO's default scratch space is a temp FILE per encode/decode; keep
  // codec work purely in-memory on every executor that loads this object
  ImageIO.setUseCache(false)

  // ---- deterministic synthetic image: 16×16 tile pattern ------------------

  /** Channel values for tile coordinate (tx, ty) of image `id` — the
    * closed form the m-pack oracles recompute in SQL. */
  def tileRgb(id: Long, tx: Int, ty: Int): (Int, Int, Int) = (
    ((id * 31 + 7 * tx + 13 * ty) % 256).toInt,
    ((id * 17 + 11 * tx + 3 * ty) % 256).toInt,
    ((id * 29 + 5 * tx + 2 * ty) % 256).toInt)

  /** Deterministic PNG payload for image `id` (dims from the same doc_id
    * formulas as MediaMeta; both divisible by 16, so every tile repeats a
    * whole number of times).
    *
    * Round-14 optimization (guide §1.2 step 2 — per-task work): the tile
    * pattern repeats every 16×16, so the closed form is evaluated once per
    * tile cell (256 evals) and the packed ints are copied into the raster's
    * backing array row by row. `setRGB` per pixel paid a color-model
    * conversion per call; writing the TYPE_INT_RGB DataBufferInt directly
    * stores the identical 24-bit value, so the encoded PNG bytes are
    * unchanged (MultimodalSpec + the m-pack oracles pin this). */
  def synthPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val tile = new Array[Int](256)
    var ty = 0
    while (ty < 16) {
      var tx = 0
      while (tx < 16) {
        val (r, g, b) = tileRgb(id, tx, ty)
        tile(ty * 16 + tx) = (r << 16) | (g << 8) | b
        tx += 1
      }
      ty += 1
    }
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData
    var y = 0
    while (y < h) {
      val trow = (y & 15) * 16
      val orow = y * w
      var x = 0
      while (x < w) {
        data(orow + x) = tile(trow + (x & 15))
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  // Per-thread cached PNG reader/writer: ImageIO.read/write scan the
  // service-provider registry and build a fresh reader/writer PER CALL —
  // measurable overhead at tiny-image sizes. The cached instances are the
  // same in-JDK codec classes with default parameters, so decoded pixels
  // and encoded bytes are identical. Thread-confined via ThreadLocal
  // (ImageReader/Writer are not thread-safe).
  private val pngWriter =
    ThreadLocal.withInitial[javax.imageio.ImageWriter](() =>
      ImageIO.getImageWritersByFormatName("png").next())
  private val pngReader =
    ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
      ImageIO.getImageReadersByFormatName("png").next())

  private def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream(1 << 14)
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    val w = pngWriter.get
    w.setOutput(ios)
    try w.write(img)
    finally { w.setOutput(null); ios.close() }
    bos.toByteArray
  }

  /** REAL decode — in-JDK PNG codec (cached reader instance). */
  def decodeImage(payload: Array[Byte]): BufferedImage = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(payload))
    val r = pngReader.get
    r.setInput(iis)
    try r.read(0)
    finally { r.setInput(null); iis.close() }
  }

  /** The decoded image's byte raster in B,G,R scanline order when the
    * codec produced the standard TYPE_3BYTE_BGR layout (the in-JDK PNG
    * reader's output for 8-bit RGB), else null → callers fall back to the
    * per-pixel color-model path. Reading the backing array skips a
    * color-model conversion per pixel; channel VALUES are identical. */
  private def bgrData(img: BufferedImage): Array[Byte] =
    if (img.getType == BufferedImage.TYPE_3BYTE_BGR)
      img.getRaster.getDataBuffer match {
        case b: java.awt.image.DataBufferByte
            if b.getData.length == img.getWidth * img.getHeight * 3 =>
          b.getData
        case _ => null
      }
    else null

  /** Raw RGB triplets of a decoded image (PNG is lossless 8-bit RGB, so
    * the raster recovers the exact generated channels). */
  private def rgbOf(img: BufferedImage): Array[Byte] = {
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Byte](w * h * 3)
    val bgr = bgrData(img)
    if (bgr != null) {
      // same triplets, read straight from the raster (B,G,R → R,G,B)
      var i = 0
      while (i < out.length) {
        out(i) = bgr(i + 2); out(i + 1) = bgr(i + 1); out(i + 2) = bgr(i)
        i += 3
      }
      return out
    }
    var i = 0; var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        out(i) = (p >> 16).toByte; out(i + 1) = (p >> 8).toByte; out(i + 2) = p.toByte
        i += 3; x += 1
      }
      y += 1
    }
    out
  }

  /** Decoded byte content per modality: raw RGB for images, raw PCM for
    * audio (WAV is lossless), concatenated per-frame RGB for video. */
  def decodeBytes(payload: Array[Byte], kind: String): Array[Byte] = kind match {
    case "image" => rgbOf(decodeImage(payload))
    case "audio" => decodeWav(payload).pcm
    case "video" => decodeVideo(payload).rgb
    case _ => payload
  }

  /** Σ(r+g+b) over all decoded pixels — the integer fingerprint the SQL
    * twin recomputes from the tile formula. */
  def imageChecksum(img: BufferedImage): Long = {
    val bgr = bgrData(img)
    if (bgr != null) {
      // Σ(r+g+b) = Σ over all channel bytes — order-free, so the BGR
      // raster sums directly to the identical value
      var sum = 0L; var i = 0
      while (i < bgr.length) { sum += bgr(i) & 0xff; i += 1 }
      return sum
    }
    var sum = 0L; var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
        x += 1
      }
      y += 1
    }
    sum
  }

  /** Adds each decoded channel value's 16-bin histogram count to `hist`
    * and returns Σ(r+g+b) — the fused m15 kernel. Channel-order-free
    * (bins and sum ignore which channel a byte came from), so the BGR
    * raster fast path is value-identical to the per-pixel RGB loop. */
  private def addHistChk(img: BufferedImage, hist: Array[Long]): Long = {
    val bgr = bgrData(img)
    var chk = 0L
    if (bgr != null) {
      var i = 0
      while (i < bgr.length) {
        val v = bgr(i) & 0xff
        hist(v >> 4) += 1; chk += v
        i += 1
      }
      return chk
    }
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        val rr = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
        hist(rr >> 4) += 1; hist(g >> 4) += 1; hist(b >> 4) += 1
        chk += rr + g + b
        x += 1
      }
      y += 1
    }
    chk
  }

  /** REAL pixel resample: nearest-neighbor (src = x·W/tw, y·H/th in integer
    * arithmetic — the mapping the oracle mirrors), re-encoded as PNG. */
  def resizeImage(payload: Array[Byte], tw: Int, th: Int): Array[Byte] = {
    val src = decodeImage(payload)
    val w = src.getWidth; val h = src.getHeight
    val out = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
    val bgr = bgrData(src)
    if (bgr != null) {
      // identical integer NN map, reading the BGR raster and writing the
      // INT_RGB raster directly (same packed value setRGB would store)
      val data = out.getRaster.getDataBuffer
        .asInstanceOf[java.awt.image.DataBufferInt].getData
      // column source offsets precomputed once (same x·W/tw map per row)
      val sx = new Array[Int](tw)
      var x = 0
      while (x < tw) { sx(x) = (x * w / tw) * 3; x += 1 }
      var y = 0
      while (y < th) {
        val srow = (y * h / th) * w * 3
        val orow = y * tw
        x = 0
        while (x < tw) {
          val o = srow + sx(x)
          data(orow + x) = ((bgr(o + 2) & 0xff) << 16) |
            ((bgr(o + 1) & 0xff) << 8) | (bgr(o) & 0xff)
          x += 1
        }
        y += 1
      }
      return encodePng(out)
    }
    var y = 0
    while (y < th) {
      val sy = y * h / th
      var x = 0
      while (x < tw) {
        out.setRGB(x, y, src.getRGB(x * w / tw, sy))
        x += 1
      }
      y += 1
    }
    encodePng(out)
  }

  // ---- deterministic synthetic audio: closed-form PCM16 mono WAV ---------

  /** Unsigned 16-bit sample value at index i of audio `id` — the closed
    * form the m-pack oracles recompute (stored PCM value = u − 32768,
    * two's-complement little-endian). */
  def audioU16(id: Long, i: Int): Int = ((id * 31 + i.toLong * 7) % 65536).toInt

  /** Sample count for audio `id` (kept audible-length-ish but small). */
  def audioLen(id: Long): Int = (400 + (id % 7) * 200).toInt

  /** Deterministic WAV payload: PCM 16-bit signed little-endian mono at the
    * meta sample rate, encoded with the in-JDK `javax.sound.sampled` WAV
    * writer. */
  def synthWav(id: Long, rateHz: Int): Array[Byte] = {
    val n = audioLen(id)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = audioU16(id, i) - 32768
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(rateHz.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream(n * 2 + 64)
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decoded WAV: recovered sample rate, frame count, and raw PCM bytes. */
  final case class DecodedAudio(sampleRateHz: Int, nSamples: Int, pcm: Array[Byte])

  /** REAL decode — in-JDK WAV codec. */
  def decodeWav(payload: Array[Byte]): DecodedAudio = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    val fmt = ais.getFormat
    val pcm = ais.readAllBytes()
    DecodedAudio(fmt.getSampleRate.toInt, pcm.length / fmt.getFrameSize, pcm)
  }

  /** Σ of unsigned 16-bit sample values over the decoded PCM — the integer
    * fingerprint the SQL twin recomputes from the closed form. */
  def audioChecksum(pcm: Array[Byte]): Long = {
    var sum = 0L
    var i = 0
    while (i + 1 < pcm.length) {
      val s = (pcm(i) & 0xff) | (pcm(i + 1).toInt << 8)
      sum += s + 32768
      i += 2
    }
    sum
  }

  // ---- deterministic synthetic video: length-prefixed PNG frame container -

  /** Container magic: "GFV0" + int32 frame count, then per frame
    * int32 length + PNG bytes — the MJPEG shape (a video as a sequence of
    * independently-decodable stills), so frame extraction is a seek +
    * slice and only SAMPLED frames pay the image codec. */
  private val VideoMagic = Array[Byte]('G', 'F', 'V', '0')

  /** Frame dims (divisible by 16 → exactly 4 tile repeats per frame). */
  final val FrameW = 32
  final val FrameH = 32

  /** Frame f of video `id` is the tile-pattern PNG of derived id
    * id·131 + f — the closed form the m2 oracle recomputes. */
  def frameId(id: Long, f: Int): Long = id * 131 + f

  def synthVideo(id: Long, nFrames: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream(1 << 15)
    val out = new java.io.DataOutputStream(bos)
    out.write(VideoMagic)
    out.writeInt(nFrames)
    var f = 0
    while (f < nFrames) {
      val png = synthPng(frameId(id, f), FrameW, FrameH)
      out.writeInt(png.length)
      out.write(png)
      f += 1
    }
    out.flush()
    bos.toByteArray
  }

  /** (frame_idx, png bytes) for every `every`-th frame — pure container
    * parsing, skipping (not decoding) unsampled frames. */
  def videoFrameSlices(payload: Array[Byte], every: Int): Iterator[(Int, Array[Byte])] = {
    val in = new java.io.DataInputStream(new ByteArrayInputStream(payload))
    in.skipBytes(VideoMagic.length)
    val n = in.readInt()
    var pos = VideoMagic.length + 4
    (0 until n).iterator.flatMap { f =>
      val len = {
        val b = java.nio.ByteBuffer.wrap(payload, pos, 4); b.getInt
      }
      val start = pos + 4
      pos = start + len
      if (f % every == 0)
        Some(f -> java.util.Arrays.copyOfRange(payload, start, start + len))
      else None
    }
  }

  /** Decoded video content: every frame decoded, RGB bytes concatenated in
    * frame order, checksum = Σ per-frame pixel checksums. */
  final case class DecodedVideo(nFrames: Int, checksum: Long, rgb: Array[Byte])

  def decodeVideo(payload: Array[Byte]): DecodedVideo = {
    val bos = new ByteArrayOutputStream(1 << 15)
    var checksum = 0L
    var n = 0
    videoFrameSlices(payload, every = 1).foreach { case (_, png) =>
      val img = decodeImage(png)
      checksum += imageChecksum(img)
      bos.write(rgbOf(img))
      n += 1
    }
    DecodedVideo(n, checksum, bos.toByteArray)
  }

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"$b%02x").mkString

  // ---- operators ----------------------------------------------------------

  /** Deterministic synthetic media table derived from `documents`: image
    * rows carry a REAL PNG payload (tile pattern above), audio rows a REAL
    * WAV payload (`synthWav`), video rows a REAL PNG-frame container
    * (`synthVideo`); kind/dims from doc_id, mirrored by the m-pack oracles.
    * The CaseWhen evaluates exactly one encoder per row. */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val slots = spark.sparkContext.defaultParallelism
    // codec-bound stages starve on fewer input splits than executor slots
    // (the local testdata is one parquet split); a genuinely large input
    // has splits >= slots and never pays this shuffle
    val spread = if (docs.rdd.getNumPartitions < slots) docs.repartition(slots) else docs
    val pngUdf = udf { (id: Long) =>
      synthPng(id, (64 + (id % 16) * 16).toInt, (48 + (id % 9) * 16).toInt)
    }
    val wavUdf = udf { (id: Long) => synthWav(id, (8000 + (id % 5) * 8000).toInt) }
    val vidUdf = udf { (id: Long) => synthVideo(id, (8 + (id % 24)).toInt) }
    spread.select(
        $"doc_id".as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod($"doc_id", lit(3)) + 1).cast("int")).as("kind"),
        when(pmod($"doc_id", lit(3)) === 0, pngUdf($"doc_id"))
          .when(pmod($"doc_id", lit(3)) === 1, wavUdf($"doc_id"))
          .otherwise(vidUdf($"doc_id")).as("payload"),
        struct(
          (lit(64) + pmod($"doc_id", lit(16)) * 16).cast("int").as("width"),
          (lit(48) + pmod($"doc_id", lit(9)) * 16).cast("int").as("height"),
          (lit(8000) + pmod($"doc_id", lit(5)) * 8000).cast("int").as("sample_rate_hz"),
          (lit(8) + pmod($"doc_id", lit(24))).cast("int").as("n_frames")).as("meta"))
      .as[MediaRecord]
  }

  /** Batched per-row decode → catalog stats, every modality through its
    * REAL codec: image width/height/n_bytes/digest from the DECODED pixels
    * (dims recovered by the codec, digest = Σ(r+g+b)); audio rate/n_bytes/
    * digest from the DECODED WAV (header rate + PCM sum); video frame
    * count/n_bytes/digest from decoding every container frame. Only an
    * unknown `kind` falls back to payload length + md5. */
  def catalogStats(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaStats] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          if (r.kind == "image") {
            val img = decodeImage(r.payload)
            MediaStats(r.media_id, r.kind, img.getWidth, img.getHeight,
              r.meta.sample_rate_hz, r.meta.n_frames,
              3L * img.getWidth * img.getHeight, imageChecksum(img).toString)
          } else if (r.kind == "audio") {
            // rate comes from the DECODED header, not the metadata
            val au = decodeWav(r.payload)
            MediaStats(r.media_id, r.kind, r.meta.width, r.meta.height,
              au.sampleRateHz, r.meta.n_frames,
              au.pcm.length.toLong, audioChecksum(au.pcm).toString)
          } else if (r.kind == "video") {
            // every frame decoded; meta dims kept (display dims — the
            // 32×32 frame dims surface through frameSample/m2)
            val vid = decodeVideo(r.payload)
            MediaStats(r.media_id, r.kind, r.meta.width, r.meta.height,
              r.meta.sample_rate_hz, vid.nFrames,
              vid.rgb.length.toLong, vid.checksum.toString)
          } else
            MediaStats(r.media_id, r.kind, r.meta.width, r.meta.height,
              r.meta.sample_rate_hz, r.meta.n_frames,
              r.payload.length.toLong, md5Hex(r.payload))
        }
      }
    }
  }

  /** Decode + feature-extract in explicit batches: the embedding is a
    * 16-bin normalized byte histogram over the DECODED content — raw RGB
    * bytes for images and video frames, raw PCM bytes for audio. */
  def featureExtract(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a codec would receive one arrow batch
        batch.iterator.map { r =>
          val decoded = decodeBytes(r.payload, r.kind)
          val hist = new Array[Long](16)
          var i = 0
          while (i < decoded.length) { hist((decoded(i) & 0xff) >> 4) += 1; i += 1 }
          val n = math.max(decoded.length, 1).toFloat
          MediaFeatures(r.media_id, r.kind, decoded.length.toLong, hist.map(_ / n))
        }
      }
    }
  }

  /** Time-base audio resample to `targetHz`: decode WAV, nearest-neighbor
    * sample the PCM series on the time axis (out sample j = src sample
    * (j·r)/R in integer arithmetic — the 1-D analog of `resizeImage`'s
    * pixel map; m = (n·R)/r output samples), re-encode WAV at the target
    * rate. The oracle recomputes every output sample from the closed-form
    * series, so a green row pins decode → resample → re-encode → decode. */
  def resampleAudio(payload: Array[Byte], targetHz: Int): Array[Byte] = {
    val au = decodeWav(payload)
    val n = au.nSamples
    val r = au.sampleRateHz
    val m = ((n.toLong * targetHz) / r).toInt
    val out = new Array[Byte](m * 2)
    var j = 0
    while (j < m) {
      val src = ((j.toLong * r) / targetHz).toInt
      out(2 * j) = au.pcm(2 * src)
      out(2 * j + 1) = au.pcm(2 * src + 1)
      j += 1
    }
    val fmt = new AudioFormat(targetHz.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(out), fmt, m.toLong)
    val bos = new ByteArrayOutputStream(m * 2 + 64)
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Per-frame video resize: every container frame is decoded, NN-resampled
    * to tw×th (`resizeImage`), re-encoded, and re-packed into a new
    * container with the same frame count. */
  def resizeVideo(payload: Array[Byte], tw: Int, th: Int): Array[Byte] = {
    val nFrames = java.nio.ByteBuffer.wrap(payload, VideoMagic.length, 4).getInt
    val bos = new ByteArrayOutputStream(1 << 15)
    val out = new java.io.DataOutputStream(bos)
    out.write(VideoMagic)
    out.writeInt(nFrames)
    videoFrameSlices(payload, every = 1).foreach { case (_, png) =>
      val resized = resizeImage(png, tw, th)
      out.writeInt(resized.length)
      out.write(resized)
    }
    out.flush()
    bos.toByteArray
  }

  /** Resize/resample across modalities, each through its REAL codec: image
    * rows get a nearest-neighbor pixel resample to w×h (meta updated to the
    * target dims); audio rows a time-base PCM resample to `audioRateHz`
    * (meta rate updated); video rows a per-frame resize to frameW×frameH.
    * The audio/video targets default to 0 = pass-through, so `resize(ds, w,
    * h)` remains the image-only normalization (m4) while m7 exercises all
    * three. Pure per-row map — no shuffle. */
  def resize(ds: Dataset[MediaRecord], w: Int, h: Int,
             audioRateHz: Int = 0, frameW: Int = 0, frameH: Int = 0): Dataset[MediaRecord] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.map { r =>
      r.kind match {
        case "image" =>
          r.copy(payload = resizeImage(r.payload, w, h),
                 meta = r.meta.copy(width = w, height = h))
        case "audio" if audioRateHz > 0 =>
          r.copy(payload = resampleAudio(r.payload, audioRateHz),
                 meta = r.meta.copy(sample_rate_hz = audioRateHz))
        case "video" if frameW > 0 && frameH > 0 =>
          r.copy(payload = resizeVideo(r.payload, frameW, frameH))
        case _ => r
      }
    }
  }

  /** 64-bit average-hash (aHash) of a decoded image as a 64-char bit string,
    * row-major: sample an 8×8 nearest-neighbor grid (src pixel
    * (x·W/8, y·H/8) — the same integer map as `resizeImage`), gray = r+g+b,
    * bit = [gray·64 > Σgray]. Integer-only, so the SQL twin recomputes it
    * from the tile closed form. Because W and H are divisible by 16, the
    * 8×8 sample points of the half-scale NN resample land on the SAME
    * source pixels (x·(W/2)/8 in the resized image → src 2·(x·(W/2)/8) =
    * x·W/8), so the hash is exactly invariant under
    * `resizeImage(W/2, H/2)` — the property m5 pins through two real
    * codec round-trips. */
  def aHash(img: BufferedImage): String = {
    val w = img.getWidth; val h = img.getHeight
    val g = new Array[Long](64)
    var total = 0L
    val bgr = bgrData(img)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val gray =
          if (bgr != null) {
            val o = ((y * h / 8) * w + (x * w / 8)) * 3
            ((bgr(o) & 0xff) + (bgr(o + 1) & 0xff) + (bgr(o + 2) & 0xff)).toLong
          } else {
            val p = img.getRGB(x * w / 8, y * h / 8)
            (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)).toLong
          }
        g(y * 8 + x) = gray
        total += gray
        x += 1
      }
      y += 1
    }
    val sb = new StringBuilder(64)
    var i = 0
    while (i < 64) { sb.append(if (g(i) * 64L > total) '1' else '0'); i += 1 }
    sb.toString
  }

  /** Perceptual hashes of the image rows: aHash of the original payload plus
    * aHash of a REAL half-scale resample (decode → NN resample → re-encode →
    * decode). Pure per-row projection — no shuffle; the near-dup grouping
    * happens downstream on the hash value. */
  def perceptualHash(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaPHash] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(col("kind") === lit("image")).as[MediaRecord].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val img = decodeImage(r.payload)
          val half = decodeImage(
            resizeImage(r.payload, img.getWidth / 2, img.getHeight / 2))
          MediaPHash(r.media_id, aHash(img), aHash(half))
        }
      }
    }
  }

  /** Chunk-energy fingerprint of DECODED PCM (the aHash analog for audio,
    * m6): split the first 8 × 50-sample window into chunks, chunk energy =
    * Σ unsigned sample values, bit = [energy·8 > Σ energies]. Integer-only
    * over the closed-form series, so the SQL twin recomputes it — and it
    * pins the WAV decode because the stored PCM is two's-complement while
    * the formula speaks unsigned (the +32768 recovery must be right). */
  def audioFingerprint(pcm: Array[Byte]): String = {
    val e = new Array[Long](8)
    var total = 0L
    var c = 0
    while (c < 8) {
      var i = c * 50
      val end = i + 50
      var s = 0L
      while (i < end) {
        s += ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1).toInt << 8)) + 32768
        i += 1
      }
      e(c) = s; total += s; c += 1
    }
    val sb = new StringBuilder(8)
    c = 0
    while (c < 8) { sb.append(if (e(c) * 8L > total) '1' else '0'); c += 1 }
    sb.toString
  }

  /** Audio fingerprints of the audio rows via the REAL WAV decode. Pure
    * per-row projection, no shuffle. */
  def audioFingerprints(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaAFp] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(col("kind") === lit("audio")).as[MediaRecord].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val au = decodeWav(r.payload)
          MediaAFp(r.media_id, audioFingerprint(au.pcm), au.nSamples)
        }
      }
    }
  }

  /** Per-chunk loudness over DECODED PCM (m11's kernel): Σ|sample| per
    * `chunk`-sample window — the energy series silence/VAD analysis runs
    * on. Same batched mapPartitions shape as the fingerprints; output is
    * one small row per chunk, never the PCM itself. */
  def audioChunkLoudness(ds: Dataset[MediaRecord], chunk: Int = 64,
                         batchSize: Int = 64): Dataset[MediaChunk] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(col("kind") === lit("audio")).as[MediaRecord].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val au = decodeWav(r.payload)
          val pcm = au.pcm
          val nCh = (au.nSamples + chunk - 1) / chunk
          (0 until nCh).iterator.map { c =>
            val end = math.min(au.nSamples, (c + 1) * chunk)
            var i = c * chunk
            var s = 0L
            while (i < end) {
              val v = (((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff))).toShort.toLong
              s += math.abs(v)
              i += 1
            }
            MediaChunk(r.media_id, c, end - c * chunk, s)
          }
        }
      }
    }
  }

  /** Per-clip PCM amplitude statistics through the REAL WAV decode — the
    * single pass a peak-normalization (gain-staging) plan needs: peak and
    * Σ|sample| reduce inside the decode loop, so only ONE ROW per clip
    * (never the PCM) reaches the shuffle — the m11 scale shape. */
  def audioStats(ds: Dataset[MediaRecord],
                 batchSize: Int = 64): Dataset[MediaAudioStats] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(col("kind") === lit("audio")).as[MediaRecord].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val au = decodeWav(r.payload)
          val pcm = au.pcm
          var i = 0
          var peak = 0L
          var sumAbs = 0L
          while (i < au.nSamples) {
            val v = (((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff))).toShort.toLong
            val a = math.abs(v)
            if (a > peak) peak = a
            sumAbs += a
            i += 1
          }
          MediaAudioStats(r.media_id, au.nSamples.toLong, peak, sumAbs)
        }
      }
    }
  }

  /** Video perceptual fingerprint (the m5/m6 analog for clips): aHash of
    * every `every`-th frame — the container slice decodes ONLY sampled
    * frames — concatenated in frame order. Hash-equality grouping then
    * gives near-dup video detection with the same shuffle story as m5:
    * a pure per-row projection here, group-sized state downstream. */
  def videoFingerprints(ds: Dataset[MediaRecord], every: Int = 8,
                        batchSize: Int = 64): Dataset[MediaVFp] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(col("kind") === lit("video")).as[MediaRecord].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val hs = videoFrameSlices(r.payload, every)
            .map { case (_, png) => aHash(decodeImage(png)) }.toSeq
          MediaVFp(r.media_id, hs.mkString, hs.size)
        }
      }
    }
  }

  /** FUSED multi-feature pass (m13): one decode of each payload emits every
    * per-content feature family downstream curation consumes — the 16-bin
    * byte histogram (m3's hist), the modality's perceptual fingerprint
    * (m5 image aHash / m6 audio chunk-energy fp / m8 video sampled-frame
    * concat), and the content checksum series (whole-image Σ(r+g+b), audio
    * Σu, per-frame checksums in frame order — m10's scene-cut input).
    *
    * This is the 100 TB decode-bill optimization: run separately, m3 + m5 +
    * m10 (+ m8 for the fp) decode the SAME video frames three-to-four times
    * and the same image pixels twice; here each frame's pixels are decoded
    * once and all three families reduce in the same pixel sweep. Output is
    * one small row per media row — payloads never cross a shuffle. */
  def fusedFeatures(ds: Dataset[MediaRecord], every: Int = 8,
                    batchSize: Int = 64): Dataset[MediaFused] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          r.kind match {
            case "image" =>
              val img = decodeImage(r.payload)
              val hist = new Array[Long](16)
              val chk = addHistChk(img, hist)
              MediaFused(r.media_id, r.kind, hist.mkString(","), aHash(img),
                chk.toString)
            case "audio" =>
              val au = decodeWav(r.payload)
              val hist = new Array[Long](16)
              var i = 0
              while (i < au.pcm.length) { hist((au.pcm(i) & 0xff) >> 4) += 1; i += 1 }
              MediaFused(r.media_id, r.kind, hist.mkString(","),
                audioFingerprint(au.pcm), audioChecksum(au.pcm).toString)
            case "video" =>
              val hist = new Array[Long](16)
              val fps = new StringBuilder
              val chks = new scala.collection.mutable.ArrayBuffer[Long]
              videoFrameSlices(r.payload, every = 1).foreach { case (f, png) =>
                val img = decodeImage(png) // ONE decode serves all 3 families
                val chk = addHistChk(img, hist)
                chks += chk
                if (f % every == 0) fps.append(aHash(img))
              }
              MediaFused(r.media_id, r.kind, hist.mkString(","), fps.toString,
                chks.mkString(","))
            case _ =>
              MediaFused(r.media_id, r.kind, "", "", md5Hex(r.payload))
          }
        }
      }
    }
  }

  /** Sample every `every`-th frame of video payloads and DECODE only the
    * sampled frames: the container parse skips unsampled frames without
    * touching the image codec. Non-video rows are filtered by COLUMN
    * before any payload work, so Catalyst pushes the predicate below the
    * payload projection and image/audio rows never pay their encoders. */
  def frameSample(ds: Dataset[MediaRecord], every: Int = 4): Dataset[MediaFrame] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(col("kind") === lit("video")).as[MediaRecord].flatMap { r =>
      videoFrameSlices(r.payload, every).map { case (f, png) =>
        val img = decodeImage(png)
        MediaFrame(r.media_id, f, img.getWidth, img.getHeight, imageChecksum(img))
      }
    }
  }
}
