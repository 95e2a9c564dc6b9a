package graft.multimodal

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata. The Spark-side plumbing (schema, partition-preserving
  * batch transforms, deterministic batching) is real; the codec step is a
  * clearly-marked stub (`fakeDecode`) because no image/audio libraries exist
  * in this environment — a production deployment swaps `fakeDecode` for a
  * JNI/ffmpeg-backed decoder with the same signature.
  *
  * Scale posture: media bytes never pass through a shuffle — all transforms
  * are `mapPartitions` (narrow); metadata extraction projects away the blob
  * before any wide operator.
  */
object Multimodal {

  final case class MediaRow(
      mediaId: Long,
      kind: String,            // "image" | "audio" | "video"
      bytes: Array[Byte],      // opaque encoded payload
      mimeType: String,
      capturedAt: Timestamp
  )

  final case class MediaFeatures(
      mediaId: Long,
      kind: String,
      sizeBytes: Long,
      width: Int,              // decoded dimensions (stubbed)
      height: Int,
      nFrames: Int,            // 1 for images
      meanLuma: Double,        // stub feature
      featureVec: Array[Float] // fixed 8-dim stub descriptor
  )

  /** STUB decode: deterministic pseudo-decode from the payload bytes.
    * Stands in for a real codec; everything downstream (schema, batching,
    * partitioning) is production-shaped.
    *
    * The pseudo-decode is PORTABLE by construction: every field derives
    * from fixed hex slices of `md5(payload)` — the same derivation any
    * SQL engine can reproduce (`('0x' || substr(md5(x), …))::BIGINT`),
    * which is what makes the m2/m3 contract queries oracle-checkable
    * instead of rows-only. Slices (1-based hex positions, as in SQL
    * `substr`): width ← [1,4], height ← [5,8], frames ← [9,10],
    * luma ← [11,14].
    */
  def fakeDecode(bytes: Array[Byte], md: java.security.MessageDigest): (Int, Int, Int, Double) = {
    md.reset()
    val d = md.digest(bytes)
    def u8(i: Int): Int = d(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1) // 4 hex chars at 2i
    val w = 64 + u16(0) % 1024
    val ht = 64 + u16(2) % 1024
    val frames = 1 + u8(4) % 64
    val luma = u16(5).toDouble / 65535.0 * 255.0
    (w, ht, frames, luma)
  }

  def fakeDecode(bytes: Array[Byte]): (Int, Int, Int, Double) =
    fakeDecode(bytes, java.security.MessageDigest.getInstance("MD5"))

  /** Feature extraction as a partition-preserving typed transform — the shape
    * a Pandas-UDF/`mapInPandas` stage takes in PySpark, expressed with
    * `mapPartitions` on the JVM: batch-in/batch-out, no driver involvement.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5") // one per partition, reset per row
      it.map { m =>
        val (w, h, frames, luma) = fakeDecode(m.bytes, md)
        val vec = Array.tabulate(8) { i =>
          (((w * 31 + h) * 31 + frames) * 31 + i).toFloat % 997f / 997f
        }
        MediaFeatures(m.mediaId, m.kind, m.bytes.length.toLong, w, h,
          if (m.kind == "image") 1 else frames, luma, vec)
      }
    }
  }

  /** STUB resize: deterministic payload rewrite standing in for an image
    * resize codec — output bytes derive from (input bytes, target dims), and
    * the byte count scales with the target area the way a re-encoded
    * image's would. Swaps for a real codec with the same signature.
    */
  def fakeResize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val n = math.max(16, (w.toLong * h / 64).toInt)
    val out = new Array[Byte](n)
    var hsh = 0x9e3779b97f4a7c15L ^ (w.toLong << 32 | h.toLong)
    var i = 0
    while (i < n) {
      // an empty payload (document with empty text) must hash as constant
      // input, not crash on modulo-by-zero
      hsh = (hsh ^ (if (bytes.isEmpty) 0L else bytes(i % bytes.length))) * 0x100000001b3L
      out(i) = (hsh >>> 56).toByte
      i += 1
    }
    out
  }

  /** Resize stage: partition-preserving typed transform; blobs never cross a
    * shuffle boundary.
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m => m.copy(bytes = fakeResize(m.bytes, w, h))))
  }

  final case class Frame(mediaId: Long, frameIdx: Int, bytes: Array[Byte])

  /** Frame sampling: one output row per sampled frame (every `stride`-th of
    * the decoded frame count) — the 1→N explode shape of video pipelines,
    * expressed as a flatMap over partitions so decoding stays local to the
    * executor holding the payload.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { m =>
        val (_, _, frames, _) = fakeDecode(m.bytes, md)
        val n = if (m.kind == "image") 1 else frames
        (0 until n by stride).map { i =>
          // stub frame payload: deterministic slice-hash of the source bytes
          Frame(m.mediaId, i, fakeResize(m.bytes, 8 + i, 8))
        }
      }
    }
  }

  /** Metadata projection: blob-free frame safe to join/aggregate at scale. */
  def metadata(df: DataFrame): DataFrame =
    df.select(col("mediaId"), col("kind"), col("mimeType"), col("capturedAt"),
      octet_length(col("bytes")).as("sizeBytes"),
      sha2(col("bytes"), 256).as("contentHash"))

  /** Synthesize a deterministic media table from any source table (used by
    * tests and the driver harness: documents' text bytes stand in for encoded
    * payloads).
    */
  def fromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("mediaId"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      lit("application/octet-stream").as("mimeType"),
      lit(Timestamp.valueOf("2026-01-01 00:00:00")).as("capturedAt")
    ).as[MediaRow]
  }
}
