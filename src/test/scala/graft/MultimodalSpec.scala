package graft

import java.sql.Timestamp

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRow

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    MediaRow(1L, "image", "fake-jpeg-bytes".getBytes("UTF-8"), "image/jpeg",
      Timestamp.valueOf("2026-01-01 00:00:00")),
    MediaRow(2L, "video", "fake-mp4-bytes-longer-payload".getBytes("UTF-8"), "video/mp4",
      Timestamp.valueOf("2026-01-01 00:00:00"))
  ).toDS()

  test("extractFeatures is deterministic, partition-preserving, schema-typed") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.mediaId)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.mediaId)
    assert(f1.map(_.meanLuma).sameElements(f2.map(_.meanLuma)), "stub decode deterministic")
    assert(f1(0).nFrames === 1, "images are single-frame")
    assert(f1(1).nFrames > 1, "videos get frame counts")
    assert(f1.forall(_.featureVec.length === 8))
    assert(f1(0).sizeBytes === "fake-jpeg-bytes".getBytes("UTF-8").length.toLong)
  }

  test("metadata projection is blob-free and hash-stable") {
    val m = Multimodal.metadata(media.toDF()).collect()
    assert(!m.head.schema.fieldNames.contains("bytes"))
    assert(m.map(_.getAs[String]("contentHash")).distinct.length === 2)
  }

  test("resize rewrites payloads deterministically, scaled to target dims") {
    val r1 = Multimodal.resize(media, 64, 64).collect().sortBy(_.mediaId)
    val r2 = Multimodal.resize(media, 64, 64).collect().sortBy(_.mediaId)
    assert(r1.map(_.bytes.toSeq) === r2.map(_.bytes.toSeq))
    val big = Multimodal.resize(media, 256, 256).collect().head
    assert(big.bytes.length > r1.head.bytes.length, "larger target → larger payload")
    assert(r1.head.mimeType === "image/jpeg", "metadata preserved")
  }

  test("sampleFrames explodes videos to strided frames, images to one") {
    val frames = Multimodal.sampleFrames(media, stride = 7).collect()
    val byId = frames.groupBy(_.mediaId)
    assert(byId(1L).length === 1, "image → exactly one frame")
    assert(byId(2L).length >= 1)
    assert(byId(2L).map(_.frameIdx).forall(_ % 7 == 0), "strided indices")
    assert(frames.forall(_.bytes.nonEmpty))
  }

  test("fromDocuments synthesizes a typed media table from text payloads") {
    val docs = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val rows = Multimodal.fromDocuments(docs).collect().sortBy(_.mediaId)
    assert(rows.length === 3)
    assert(rows.map(_.kind).toSet.subsetOf(Set("image", "audio", "video")))
    assert(new String(rows(0).bytes, "UTF-8") === "alpha")
  }
}
