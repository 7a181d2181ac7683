package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Media

/** Multimodal operators through the REAL codecs (in-JDK PNG / WAV / the
  * PNG-frame container): typed schema, batch shape, determinism, payload
  * slicing, resample loops, and (critically at 100 TB) payload column
  * pruning for metadata-only plans. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Tables(spark, TestSpark.sf).documents
  private def media = Media.mediaFromDocuments(docs)

  test("mediaFromDocuments: typed schema with binary payload + meta struct") {
    val sch = media.schema
    assert(sch("payload").dataType.typeName == "binary")
    assert(sch("meta").dataType.typeName == "struct")
    assert(media.count() == docs.count())
  }

  test("featureExtract: deterministic 16-dim embedding, histogram sums to ~1") {
    val a = Media.featureExtract(media, batchSize = 7).collect().sortBy(_.media_id)
    val b = Media.featureExtract(media, batchSize = 64).collect().sortBy(_.media_id)
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) =>
      assert(x.embedding.toSeq == y.embedding.toSeq, s"batch size changed result for ${x.media_id}")
    }
    a.foreach { f =>
      assert(f.embedding.length == 16)
      assert(math.abs(f.embedding.map(_.toDouble).sum - 1.0) < 1e-3)
    }
  }

  test("resize: image payloads are really resampled; audio/video pass through") {
    val r = Media.resize(media, 224, 224).collect().sortBy(_.media_id)
    val o = media.collect().sortBy(_.media_id)
    r.zip(o).foreach { case (x, y) =>
      if (x.kind == "image") {
        assert(x.meta.width == 224 && x.meta.height == 224)
        assert(!java.util.Arrays.equals(x.payload, y.payload),
          s"resize left payload bytes unchanged for ${x.media_id}")
        val img = Media.decodeImage(x.payload)
        assert(img.getWidth == 224 && img.getHeight == 224)
      } else {
        assert(x.meta == y.meta)
        assert(java.util.Arrays.equals(x.payload, y.payload))
      }
    }
  }

  test("resampleAudio: NN time-base map, re-encoded header carries the target rate") {
    val wav = Media.synthWav(45L, 8000)          // n = audioLen(45) samples
    val res = Media.resampleAudio(wav, 16000)    // 2× upsample
    val au = Media.decodeWav(res)
    assert(au.sampleRateHz == 16000)
    val n = Media.audioLen(45L)
    assert(au.nSamples == n * 2)
    for (j <- 0 until au.nSamples) {
      val s = (au.pcm(2 * j) & 0xff) | (au.pcm(2 * j + 1).toInt << 8)
      // out sample j = src sample (j·8000)/16000 = j/2
      assert(s + 32768 == Media.audioU16(45L, j / 2), s"sample $j mismatch")
    }
    // downsample: 24000 → 16000 keeps 2 of every 3 samples
    val down = Media.decodeWav(Media.resampleAudio(Media.synthWav(46L, 24000), 16000))
    assert(down.nSamples == Media.audioLen(46L) * 16000 / 24000)
    for (j <- 0 until down.nSamples) {
      val s = (down.pcm(2 * j) & 0xff) | (down.pcm(2 * j + 1).toInt << 8)
      assert(s + 32768 == Media.audioU16(46L, j * 24000 / 16000), s"down sample $j")
    }
  }

  test("resizeVideo: every frame NN-resampled, container re-packed intact") {
    val payload = Media.synthVideo(47L, nFrames = 5)
    val resized = Media.resizeVideo(payload, 20, 12)
    val slices = Media.videoFrameSlices(resized, every = 1).toSeq
    assert(slices.map(_._1) == (0 until 5))
    slices.foreach { case (f, png) =>
      val img = Media.decodeImage(png)
      assert(img.getWidth == 20 && img.getHeight == 12)
      // pixel (x,y) of the resized frame = src pixel (x·32/20, y·32/12)
      val p = img.getRGB(7, 5)
      val (r, g, b) = Media.tileRgb(Media.frameId(47L, f),
        (7 * Media.FrameW / 20) & 15, (5 * Media.FrameH / 12) & 15)
      assert(((p >> 16) & 0xff) == r && ((p >> 8) & 0xff) == g && (p & 0xff) == b)
    }
  }

  test("resize with all-modality targets reaches every kind through its codec") {
    val r = Media.resize(media, 256, 144, audioRateHz = 16000,
        frameW = 20, frameH = 12)
      .collect().sortBy(_.media_id)
    r.foreach { x =>
      x.kind match {
        case "image" =>
          val img = Media.decodeImage(x.payload)
          assert(img.getWidth == 256 && img.getHeight == 144)
        case "audio" =>
          assert(Media.decodeWav(x.payload).sampleRateHz == 16000)
          assert(x.meta.sample_rate_hz == 16000)
        case "video" =>
          val (_, png) = Media.videoFrameSlices(x.payload, 1).next()
          val img = Media.decodeImage(png)
          assert(img.getWidth == 20 && img.getHeight == 12)
      }
    }
  }

  test("WAV round-trip: decode recovers rate and the exact PCM sample series") {
    val rate = 16000
    val wav = Media.synthWav(43L, rate)
    val au = Media.decodeWav(wav)
    assert(au.sampleRateHz == rate)
    assert(au.nSamples == Media.audioLen(43L))
    for (i <- 0 until au.nSamples) {
      val s = (au.pcm(2 * i) & 0xff) | (au.pcm(2 * i + 1).toInt << 8)
      assert(s + 32768 == Media.audioU16(43L, i), s"sample $i mismatch")
    }
  }

  test("PNG round-trip: decode recovers the exact generated tile pattern") {
    val png = Media.synthPng(42L, 96, 64)
    val img = Media.decodeImage(png)
    assert(img.getWidth == 96 && img.getHeight == 64)
    for (y <- 0 until 64; x <- 0 until 96) {
      val p = img.getRGB(x, y)
      val (r, g, b) = Media.tileRgb(42L, x & 15, y & 15)
      assert(((p >> 16) & 0xff) == r && ((p >> 8) & 0xff) == g && (p & 0xff) == b,
        s"pixel ($x,$y) mismatch")
    }
  }

  test("video container round-trip: sliced frames decode to the tile formula") {
    val payload = Media.synthVideo(44L, nFrames = 9)
    val full = Media.decodeVideo(payload)
    assert(full.nFrames == 9)
    // every=2 samples frames 0,2,4,6,8 without decoding the rest
    val sampled = Media.videoFrameSlices(payload, every = 2).toSeq
    assert(sampled.map(_._1) == Seq(0, 2, 4, 6, 8))
    sampled.foreach { case (f, png) =>
      val img = Media.decodeImage(png)
      assert(img.getWidth == Media.FrameW && img.getHeight == Media.FrameH)
      val p = img.getRGB(5, 7)
      val (r, g, b) = Media.tileRgb(Media.frameId(44L, f), 5, 7)
      assert(((p >> 16) & 0xff) == r && ((p >> 8) & 0xff) == g && (p & 0xff) == b)
    }
    // whole-clip checksum = Σ per-frame checksums
    val expect = (0 until 9).map { f =>
      Media.imageChecksum(Media.decodeImage(
        Media.videoFrameSlices(payload, 1).toSeq(f)._2))
    }.sum
    assert(full.checksum == expect)
  }

  test("frameSample decodes sampled frames of every video row") {
    val frames = Media.frameSample(media, every = 4).collect()
      .groupBy(_.media_id).view.mapValues(_.sortBy(_.frame_idx)).toMap
    val videos = media.filter(_.kind == "video").collect()
    assert(videos.nonEmpty && frames.nonEmpty)
    videos.foreach { v =>
      val fs = frames(v.media_id)
      assert(fs.map(_.frame_idx).toSeq == (0 until v.meta.n_frames by 4).toSeq)
      fs.foreach { f =>
        assert(f.width == Media.FrameW && f.height == Media.FrameH)
        assert(f.checksum > 0)
      }
    }
  }

  test("m8 video fingerprint: 64 bits per sampled frame, frame order, batch invariant") {
    val a = Media.videoFingerprints(media, batchSize = 5).collect().sortBy(_.media_id)
    val b = Media.videoFingerprints(media, batchSize = 64).collect().sortBy(_.media_id)
    assert(a.nonEmpty && a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x.vfp == y.vfp) }
    val metas = media.filter(_.kind == "video").collect()
      .map(r => r.media_id -> r.meta.n_frames).toMap
    a.foreach { p =>
      // sampled frames = 0, 8, 16, 24 below n_frames
      val expect = (0 until metas(p.media_id) by 8).size
      assert(p.n_sampled == expect, s"${p.media_id}: ${p.n_sampled} != $expect")
      assert(p.vfp.length == 64 * expect && p.vfp.forall(c => c == '0' || c == '1'))
      // first sampled frame's hash must equal aHash of the decoded frame 0
      val payload = media.filter(_.media_id == p.media_id).head().payload
      val (_, png0) = Media.videoFrameSlices(payload, every = 8).next()
      assert(p.vfp.take(64) == Media.aHash(Media.decodeImage(png0)))
    }
  }

  test("metadata-only plan prunes the payload column from the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    media.write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir).select($"media_id", $"meta.width")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("payload"), s"payload not pruned:\n$plan")
  }

  test("m5 aHash: 64-bit, scale-invariant under the real half resample, discriminating") {
    val h = Media.perceptualHash(media, batchSize = 16).collect()
    assert(h.nonEmpty)
    h.foreach { p =>
      assert(p.ahash.length == 64 && p.ahash.forall(c => c == '0' || c == '1'))
      // the half-scale hash went through a SECOND full decode→resample→
      // encode→decode loop and must land on the same bits
      assert(p.ahash == p.ahash_half, s"scale variance at ${p.media_id}")
    }
    // distinct tile patterns → overwhelmingly distinct hashes (the dedup
    // property: near-dup groups stay tiny, not one giant bucket)
    assert(h.map(_.ahash).distinct.length > h.length * 3 / 4)
  }

  test("m6 audio fingerprint: 8 bits from decoded PCM, batch-size invariant") {
    val a = Media.audioFingerprints(media, batchSize = 9).collect().sortBy(_.media_id)
    val b = Media.audioFingerprints(media, batchSize = 64).collect().sortBy(_.media_id)
    assert(a.nonEmpty && a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x.afp == y.afp) }
    a.foreach { p =>
      assert(p.afp.length == 8 && p.afp.forall(c => c == '0' || c == '1'))
      assert(p.n_samples >= 400)
    }
  }

  test("m13 fused pass: one decode reproduces every unfused feature family") {
    val fused = Media.fusedFeatures(media).collect().map(f => f.media_id -> f).toMap
    assert(fused.nonEmpty)
    // hist == m3's integer histogram (embedding·n_bytes is exact — see m3)
    Media.featureExtract(media).collect().foreach { f =>
      val hist = f.embedding.map(x => math.round(x.toDouble * f.n_bytes)).mkString(",")
      assert(fused(f.media_id).hist == hist, s"hist mismatch at ${f.media_id}")
    }
    // fp: m5 image aHash / m6 audio chunk fp / m8 video sampled-frame concat
    Media.perceptualHash(media).collect().foreach { p =>
      assert(fused(p.media_id).fp == p.ahash, s"image fp mismatch at ${p.media_id}") }
    Media.audioFingerprints(media).collect().foreach { p =>
      assert(fused(p.media_id).fp == p.afp, s"audio fp mismatch at ${p.media_id}") }
    Media.videoFingerprints(media).collect().foreach { p =>
      assert(fused(p.media_id).fp == p.vfp, s"video fp mismatch at ${p.media_id}") }
    // checksums: video per-frame series == m10's frameSample(every=1) chain;
    // image/audio == the whole-payload catalogStats digest
    Media.frameSample(media, every = 1).collect()
      .groupBy(_.media_id).foreach { case (id, fs) =>
        val cs = fs.sortBy(_.frame_idx).map(_.checksum).mkString(",")
        assert(fused(id).checksums == cs, s"frame checksum series mismatch at $id")
      }
    Media.catalogStats(media).collect().filter(_.kind != "video").foreach { s =>
      assert(fused(s.media_id).checksums == s.digest,
        s"checksum mismatch at ${s.media_id}") }
  }
}
