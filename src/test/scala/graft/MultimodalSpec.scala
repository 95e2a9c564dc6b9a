package graft

import java.sql.Timestamp

import graft.multimodal.{ImageCodec, Multimodal}
import graft.multimodal.Multimodal.MediaRow

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def row(id: Long, kind: String, bytes: Array[Byte]) =
    MediaRow(id, kind, bytes, "image/png", Timestamp.valueOf("2026-01-01 00:00:00"))

  private def media = Seq(
    row(1L, "image", ImageCodec.synthesize(1L)),
    row(2L, "video", ImageCodec.synthesize(2L))
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
    assert(f1(1).nFrames > 1 || f1(1).sizeBytes % 64 == 0, "videos get size-derived frames")
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

  test("sampleFrames explodes videos to strided frames, images to one") {
    val frames = Multimodal.sampleFrames(media, stride = 7).collect()
    val byId = frames.groupBy(_.mediaId)
    assert(byId(1L).length === 1, "image → exactly one frame")
    assert(byId(2L).length >= 1)
    assert(byId(2L).map(_.frameIdx).forall(_ % 7 == 0), "strided indices")
    assert(frames.forall(_.bytes.nonEmpty))
  }

  test("synthesize builds a typed media table of decodable PNG payloads") {
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val rows = Multimodal.synthesize(docs).collect().sortBy(_.mediaId)
    assert(rows.length === 3)
    assert(rows.map(_.kind).toSeq === Seq("audio", "video", "image"))
    rows.foreach { r =>
      val d = ImageCodec.decode(r.bytes) // every payload really decodes
      assert(d.width >= 64 && d.width <= 1016)
    }
  }
}
