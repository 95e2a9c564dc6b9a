package graft

import java.sql.Timestamp

import graft.multimodal.{GifCodec, ImageCodec, Multimodal}
import graft.multimodal.Multimodal.MediaRow

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def row(id: Long, kind: String, bytes: Array[Byte]) =
    MediaRow(id, kind, bytes, "image/png", Timestamp.valueOf("2026-01-01 00:00:00"))

  private def media = Seq(
    row(1L, "image", ImageCodec.synthesize(1L)),
    row(2L, "video", GifCodec.synthesizeAnimation(2L)) // real animated GIF
  ).toDS()

  test("decode recovers EXACT dimensions and mean luma from a real PNG") {
    // constant gray 200: BT.601 luma = (299+587+114)*200/1000 = 200 exactly
    val bytes = ImageCodec.encodePng(ImageCodec.grayImage(128, 64, (_, _) => 200))
    val d = ImageCodec.decode(bytes)
    assert(d.width === 128)
    assert(d.height === 64)
    assert(d.meanLuma === 200.0)
    assert(d.aHash === 0L, "constant image: no cell exceeds the mean")
    // a genuinely non-gray image: pure red, luma = 299*255/1000 = 76.245
    val red = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 8).foreach(y => (0 until 8).foreach(x => red.setRGB(x, y, 0xff0000)))
    assert(ImageCodec.decode(ImageCodec.encodePng(red)).meanLuma === 76.245)
  }

  test("aHash: resolution-invariant on block patterns, hamming == flipped cells") {
    val pattern = Array.tabulate(64)(k => if ((k + k / 8) % 2 == 0) 230 else 20)
    def render(w: Int, h: Int, p: Array[Int]) =
      ImageCodec.decode(ImageCodec.encodePng(
        ImageCodec.grayImage(w, h, (x, y) => p((y * 8 / h) * 8 + (x * 8 / w)))))
    val a = render(64, 64, pattern)
    val b = render(256, 128, pattern) // same pattern, different resolution
    assert(a.aHash === b.aHash, "average hash must not depend on resolution")
    assert(java.lang.Long.bitCount(a.aHash) === 32, "checkerboard: half the cells high")
    val flipped = pattern.clone()
    flipped(5) = if (flipped(5) == 230) 20 else 230
    flipped(40) = if (flipped(40) == 230) 20 else 230
    val c = render(64, 64, flipped)
    assert(java.lang.Long.bitCount(a.aHash ^ c.aHash) === 2,
      "two flipped cells move the hash by exactly two bits")
  }

  test("decode fails through IOException on undecodable bytes, never garbage") {
    intercept[java.io.IOException](ImageCodec.decode("not-a-png".getBytes("UTF-8")))
    intercept[java.io.IOException](ImageCodec.decode(Array.emptyByteArray))
    // a truncated PNG: header survives, data stream does not
    val good = ImageCodec.synthesize(7L)
    intercept[java.io.IOException](
      ImageCodec.decode(java.util.Arrays.copyOfRange(good, 0, good.length / 4)))
  }

  test("synthesize: same family yields REAL near-dups (hamming <= 6), PNG round-trips") {
    // ids 3 and 100 share family 3 (mod 97); dims are family-banded
    val a = ImageCodec.decode(ImageCodec.synthesize(3L))
    val b = ImageCodec.decode(ImageCodec.synthesize(100L))
    assert(java.lang.Long.bitCount(a.aHash ^ b.aHash) <= 6,
      "family members differ by at most 2x3 flipped cells")
    assert(a.width % 8 === 0 && a.height % 8 === 0)
    assert(a.width / 256 === b.width / 256, "dimension jitter stays in-band")
    assert(a.height / 256 === b.height / 256)
    assert(math.abs(a.meanLuma - b.meanLuma) < 36.0, "luma moves by <= 3 cells * 255/64 * 3")
    // determinism: byte-identical payloads on re-synthesis
    assert(ImageCodec.synthesize(3L).sameElements(ImageCodec.synthesize(3L)))
    // the ≥4-cells-per-level floor: no member (0-3 flips included) can
    // collapse to a uniform pattern, whose aHash would degenerate to 0 and
    // break the family hamming bound — every hash keeps 1..63 set bits
    (0L until 300L).foreach { id =>
      val bits = java.lang.Long.bitCount(ImageCodec.decode(ImageCodec.synthesize(id)).aHash)
      assert(bits >= 1 && bits <= 63, s"id $id degenerated to a uniform pattern ($bits bits)")
    }
  }

  test("extractFeatures decodes real pixels; deterministic, schema-typed") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.mediaId)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.mediaId)
    assert(f1.map(_.aHash).sameElements(f2.map(_.aHash)), "decode deterministic")
    assert(f1(0).nFrames === 1, "images are single-frame")
    assert(f1(1).nFrames === GifCodec.frameCount(GifCodec.synthesizeAnimation(2L)) &&
      f1(1).nFrames >= 2, "videos report the container's REAL frame count")
    assert(f1.forall(_.featureVec.length === 8))
    assert(f1.forall(f => f.featureVec.forall(v => v >= 0f && v <= 1f)))
    val d0 = ImageCodec.decode(ImageCodec.synthesize(1L))
    assert(f1(0).width === d0.width && f1(0).height === d0.height, "real decoded dims")
    assert(f1(0).meanLuma === d0.meanLuma)
    assert(f1(0).sizeBytes === ImageCodec.synthesize(1L).length.toLong)
  }

  test("metadata projection is blob-free and hash-stable") {
    val m = Multimodal.metadata(media.toDF()).collect()
    assert(!m.head.schema.fieldNames.contains("bytes"))
    assert(m.map(_.getAs[String]("contentHash")).distinct.length === 2)
  }

  test("resize really resamples: exact target dims, deterministic, hash-preserving on 2x") {
    val r1 = Multimodal.resize(media, 64, 64).collect().sortBy(_.mediaId)
    val r2 = Multimodal.resize(media, 64, 64).collect().sortBy(_.mediaId)
    assert(r1.map(_.bytes.toSeq) === r2.map(_.bytes.toSeq))
    val d = ImageCodec.decode(r1.head.bytes)
    assert(d.width === 64 && d.height === 64, "decoded output has the target dims")
    assert(r1.head.mimeType === "image/png", "metadata preserved")
    // nearest-neighbor 2x upscale duplicates pixels -> pooled cells unchanged
    val src = ImageCodec.synthesize(5L)
    val s = ImageCodec.decode(src)
    val up = ImageCodec.decode(ImageCodec.resizePng(src, s.width * 2, s.height * 2))
    assert(up.aHash === s.aHash, "2x NN upscale preserves the average hash")
    assert(up.meanLuma === s.meanLuma)
  }

  test("sampleFrames explodes videos to strided REAL frames, images to one") {
    val frames = Multimodal.sampleFrames(media, stride = 2).collect()
    val byId = frames.groupBy(_.mediaId)
    assert(byId(1L).length === 1, "image → exactly one frame")
    val n = GifCodec.frameCount(GifCodec.synthesizeAnimation(2L))
    assert(byId(2L).length === (n + 1) / 2, "every 2nd real frame sampled")
    assert(byId(2L).map(_.frameIdx).toSeq.sorted === (0 until n by 2).toSeq)
    // each payload is the REAL composited frame, PNG-re-encoded: its
    // decoded features must equal the frame features the decoder computes
    val feats = GifCodec.decodeFrames(GifCodec.synthesizeAnimation(2L))
    byId(2L).foreach { fr =>
      val d = ImageCodec.decode(fr.bytes)
      assert(d.aHash === feats(fr.frameIdx).aHash, s"frame ${fr.frameIdx} payload hash")
      assert(d.meanLuma === feats(fr.frameIdx).meanLuma)
    }
  }

  test("GIF: encode→decodeFrames round-trips exact frame count and per-frame features") {
    // three hand-built gray frames; identity palette ⇒ lossless, so the
    // composited features must equal the PNG-rendered equivalents exactly
    val patterns = Seq(
      Array.tabulate(64)(k => if (k % 2 == 0) 220 else 30),
      Array.tabulate(64)(k => if (k % 2 == 0) 220 else 30).updated(5, 30),
      Array.tabulate(64)(k => if ((k / 8) % 2 == 0) 200 else 40))
    def lumaFn(p: Array[Int]): (Int, Int) => Int =
      (x, y) => p((y * 8 / 48) * 8 + (x * 8 / 64))
    val gif = GifCodec.encodeGif(patterns.map(p => GifCodec.grayIndexedImage(64, 48, lumaFn(p))))
    assert(GifCodec.frameCount(gif) === 3)
    val frames = GifCodec.decodeFrames(gif)
    assert(frames.length === 3)
    patterns.zip(frames).zipWithIndex.foreach { case ((p, f), i) =>
      val ref = ImageCodec.decode(ImageCodec.encodePng(ImageCodec.grayImage(64, 48, lumaFn(p))))
      assert(f.width === 64 && f.height === 48)
      assert(f.aHash === ref.aHash, s"frame $i hash != PNG-rendered reference")
      assert(f.meanLuma === ref.meanLuma, s"frame $i luma != PNG-rendered reference")
    }
    // determinism: byte-identical re-encode
    assert(gif.sameElements(GifCodec.encodeGif(patterns.map(p =>
      GifCodec.grayIndexedImage(64, 48, lumaFn(p))))))
  }

  test("GIF: offsets and disposal composite per the logical-screen semantics") {
    import GifCodec.FramePlacement
    val base = GifCodec.grayIndexedImage(64, 64, (_, _) => 60)
    val patch = GifCodec.grayIndexedImage(32, 32, (_, _) => 200)
    val patch2 = GifCodec.grayIndexedImage(16, 16, (_, _) => 200)
    val gif = GifCodec.encodeGif(
      Seq(base, patch, patch2),
      Seq(FramePlacement(0, 0, "doNotDispose"),
        FramePlacement(16, 16, "restoreToPrevious"),
        FramePlacement(0, 0, "doNotDispose")))
    val frames = GifCodec.decodeFrames(gif)
    assert(frames.length === 3)
    assert(frames.forall(f => f.width === 64 && f.height === 64),
      "every composited frame spans the logical screen")
    // frame 0: uniform 60
    assert(frames(0).meanLuma === 60.0)
    // frame 1: 32x32 patch of 200 at (16,16) over the kept canvas:
    // mean = 60*(3/4) + 200*(1/4) = 95
    assert(frames(1).meanLuma === 95.0)
    // frame 2: the patch was REWOUND (restoreToPrevious), then a 16x16
    // patch at the origin: mean = 60*(15/16) + 200*(1/16) = 68.75
    assert(frames(2).meanLuma === 68.75)
  }

  test("GIF: synthesizeAnimation is deterministic; frame 0 matches the still corpus") {
    val gif = GifCodec.synthesizeAnimation(2L) // id 2 is a video id (2 % 3)
    assert(gif.sameElements(GifCodec.synthesizeAnimation(2L)))
    val n = GifCodec.frameCount(gif)
    assert(n >= 2 && n <= 8, s"frame count $n out of the synthesis envelope")
    val frames = GifCodec.decodeFrames(gif)
    assert(frames.length === n)
    // frame 0 paints the SAME member pattern the PNG still path paints —
    // the two corpus paths pin each other
    val still = ImageCodec.decode(ImageCodec.synthesize(2L))
    assert(frames(0).width === still.width && frames(0).height === still.height)
    assert(frames(0).aHash === still.aHash, "first frame != still member pattern")
    assert(frames(0).meanLuma === still.meanLuma)
    // consecutive frames either DRIFT one pattern cell (≤ 2 hash bits) or
    // open a new scene on the deterministic isSceneCut marks
    frames.sliding(2).zipWithIndex.foreach { case (Seq(a, b), i) =>
      val d = java.lang.Long.bitCount(a.aHash ^ b.aHash)
      if (!GifCodec.isSceneCut(2L, i + 1))
        assert(d <= 2, s"non-cut step ${i + 1} drifted $d bits")
    }
    // a non-GIF payload decodes as a single frame through the same path
    val still5 = ImageCodec.synthesize(5L)
    val one = GifCodec.decodeFrames(still5)
    assert(one.length === 1 && one.head.aHash === ImageCodec.decode(still5).aHash)
    intercept[java.io.IOException](GifCodec.decodeFrames("junk".getBytes("UTF-8")))
  }

  test("sub-8px images: merge-safe pooling, defined aHash (no phantom 0-luma cells)") {
    // 3x5 gray ramp; merge-safe pooling == pooling of the 8x8 NN upscale,
    // which is exactly what resizePng(…, 8, 8) produces
    val tiny = ImageCodec.encodePng(ImageCodec.grayImage(3, 5, (x, y) => 40 + 40 * x + 8 * y))
    val d = ImageCodec.decode(tiny)
    assert(d.width === 3 && d.height === 5)
    val up = ImageCodec.decode(ImageCodec.resizePng(tiny, 8, 8))
    assert(d.aHash === up.aHash, "tiny-image hash must equal its NN-upscale's hash")
    // mean luma still averages the ACTUAL 15 pixels
    val expected = (for (y <- 0 until 5; x <- 0 until 3) yield 40 + 40 * x + 8 * y).sum / 15.0
    assert(d.meanLuma === expected)
    assert(java.lang.Long.bitCount(d.aHash) > 0 && java.lang.Long.bitCount(d.aHash) < 64,
      "a ramp must produce a non-degenerate hash")
  }

  test("frameFeatures: videos explode per composited frame, stills stay single") {
    val ff = Multimodal.frameFeatures(media).collect().groupBy(_.mediaId)
    assert(ff(1L).length === 1 && ff(1L).head.frameIdx === 0)
    val n = GifCodec.frameCount(GifCodec.synthesizeAnimation(2L))
    assert(ff(2L).length === n)
    assert(ff(2L).map(_.frameIdx).toSeq.sorted === (0 until n).toSeq)
    val direct = GifCodec.decodeFrames(GifCodec.synthesizeAnimation(2L))
    ff(2L).sortBy(_.frameIdx).zip(direct).foreach { case (r, d) =>
      assert(r.aHash === d.aHash && r.meanLuma === d.meanLuma)
    }
  }

  test("scene structure: big hash jumps happen ONLY at the deterministic cut marks") {
    // within-scene drift flips one two-level cell (≤ 2 hash bits: the bit
    // itself plus at most the threshold's neighbors — provably bounded by
    // the ≥4-cells-per-level floor), so any adjacent-frame hamming > 6
    // must be a scene cut; and the corpus really contains cuts
    var cuts = 0
    var steps = 0
    (0L until 120L).map(_ * 3 + 2).foreach { id => // video ids
      val frames = GifCodec.decodeFrames(GifCodec.synthesizeAnimation(id))
      frames.sliding(2).zipWithIndex.foreach { case (Seq(a, b), i) =>
        steps += 1
        val d = java.lang.Long.bitCount(a.aHash ^ b.aHash)
        if (d > 6) {
          assert(GifCodec.isSceneCut(id, i + 1), s"id $id step ${i + 1}: $d-bit jump off-mark")
          cuts += 1
        }
      }
    }
    assert(cuts > 20, s"corpus must contain real scene cuts (saw $cuts over $steps steps)")
  }

  test("WAV codec: encode→decode recovers exact header counts and sample stats") {
    import graft.multimodal.AudioCodec
    // 256 samples of a ±40 square wave: meanAmp = 40, rms = 40 exactly
    val samples = Array.tabulate(256)(i => (if ((i / 4) % 2 == 0) 40 else -40).toByte)
    val wav = AudioCodec.encodeWav(samples, 8000)
    val d = AudioCodec.decode(wav)
    assert(d.sampleRate === 8000 && d.channels === 1)
    assert(d.nSamples === 256, "frame count from the REAL parsed header")
    assert(d.meanAmp === 40.0 && d.rms === 40.0)
    // constant |amplitude|: no window exceeds the global mean
    assert(d.fingerprint === 0L)
    // a two-level envelope sets exactly the high windows' bits
    val env = Array.tabulate(64)(w => if (w % 2 == 0) 100 else 10)
    val s2 = Array.tabulate(64 * 64) { i =>
      val a = env(i / 64); (if ((i / 4) % 2 == 0) a else -a).toByte
    }
    val d2 = AudioCodec.decode(AudioCodec.encodeWav(s2, 16000))
    assert(java.lang.Long.bitCount(d2.fingerprint) === 32)
    assert((0 until 64).forall(w => ((d2.fingerprint >> w) & 1L) == (if (w % 2 == 0) 1L else 0L)))
    // undecodable and truncated payloads fail through IOException
    intercept[java.io.IOException](AudioCodec.decode("not-a-wav".getBytes("UTF-8")))
    intercept[java.io.IOException](
      AudioCodec.decode(java.util.Arrays.copyOfRange(wav, 0, wav.length / 2)))
    // sub-64-sample clips: merge-safe windows, defined fingerprint
    val tiny = AudioCodec.decode(AudioCodec.encodeWav(
      Array.tabulate(10)(i => (if (i < 5) 80 else -4).toByte), 8000))
    assert(tiny.nSamples === 10)
    assert(java.lang.Long.bitCount(tiny.fingerprint) > 0 &&
      java.lang.Long.bitCount(tiny.fingerprint) < 64)
  }

  test("WAV synthesis: deterministic family near-dup clips with stable band traits") {
    import graft.multimodal.AudioCodec
    assert(AudioCodec.synthesizeClip(3L).sameElements(AudioCodec.synthesizeClip(3L)))
    // ids 3 and 100 share family 3 (mod 97)
    val a = AudioCodec.decode(AudioCodec.synthesizeClip(3L))
    val b = AudioCodec.decode(AudioCodec.synthesizeClip(100L))
    assert(java.lang.Long.bitCount(a.fingerprint ^ b.fingerprint) <= 6,
      "family members differ by at most 2x3 flipped envelope segments")
    assert(a.sampleRate === b.sampleRate, "sample rate is family-stable")
    assert(a.nSamples / 2048 === b.nSamples / 2048, "duration jitter stays in-band")
    assert(a.nSamples % 64 === 0, "whole windows")
    // different family: nothing forces proximity
    val c = AudioCodec.decode(AudioCodec.synthesizeClip(4L))
    assert(c.nSamples >= 64 * 64 && c.nSamples <= 223 * 64)
  }

  test("synthesize builds a typed media table of decodable payloads (PNG stills, GIF videos)") {
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val rows = Multimodal.synthesize(docs).collect().sortBy(_.mediaId)
    assert(rows.length === 3)
    assert(rows.map(_.kind).toSeq === Seq("audio", "video", "image"))
    assert(rows.map(_.mimeType).toSeq === Seq("image/png", "image/gif", "image/png"))
    rows.foreach { r =>
      val d = ImageCodec.decode(r.bytes) // every payload really decodes
      assert(d.width >= 64 && d.width <= 1016)
    }
    // the video payload is a REAL multi-frame animation
    assert(GifCodec.frameCount(rows(1).bytes) >= 2)
  }
}
