package graft.multimodal

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata. The image path is REAL end to end: payloads are
  * actual PNG bytes, and [[ImageCodec.decode]] (javax.imageio — in the JDK,
  * no external dependency) recovers exact dimensions, the BT.601 mean luma
  * and a 64-bit average hash from the decoded raster. Audio/video FRAME
  * decode would need ffmpeg-class native libraries absent here — those rows
  * still carry real PNG payloads, their frame count derives from payload
  * size, and the per-frame payload rewrite ([[frameStub]]) is the one
  * remaining clearly-marked stub.
  *
  * Scale posture: media bytes never pass through a shuffle — all transforms
  * are `mapPartitions` (narrow); metadata extraction projects away the blob
  * before any wide operator; feature extraction runs ONCE and persists (the
  * m2/m4/m5/m6 queries read the persisted feature table, never re-decode).
  */
object Multimodal {

  final case class MediaRow(
      mediaId: Long,
      kind: String,            // "image" | "audio" | "video"
      bytes: Array[Byte],      // encoded payload (real PNG)
      mimeType: String,
      capturedAt: Timestamp
  )

  final case class MediaFeatures(
      mediaId: Long,
      kind: String,
      sizeBytes: Long,
      width: Int,              // REAL decoded dimensions
      height: Int,
      nFrames: Int,            // 1 for images; size-derived for audio/video
      meanLuma: Double,        // REAL BT.601 mean over every decoded pixel
      aHash: Long,             // REAL 64-bit average hash of the luma plane
      featureVec: Array[Float] // 8 row-means of the pooled luma plane, /255
  )

  /** Frame count: one per image; for audio/video a deterministic function
    * of payload size stands in for the container's frame index (a real
    * demuxer is unavailable here). Portable: any SQL engine reproduces it
    * from `octet_length(bytes)`.
    */
  def frameCount(kind: String, sizeBytes: Long): Int =
    if (kind == "image") 1 else (1L + sizeBytes % 64L).toInt

  /** Feature extraction as a partition-preserving typed transform — the shape
    * a Pandas-UDF/`mapInPandas` stage takes in PySpark, expressed with
    * `mapPartitions` on the JVM: batch-in/batch-out, no driver involvement.
    * Every field but `nFrames` comes from real decoded pixels.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val d = ImageCodec.decode(m.bytes)
      val vec = Array.tabulate(8) { r =>
        var s = 0.0
        var c = 0
        while (c < 8) { s += d.cellMeans(r * 8 + c); c += 1 }
        (s / (8.0 * 255.0)).toFloat
      }
      MediaFeatures(m.mediaId, m.kind, m.bytes.length.toLong, d.width, d.height,
        frameCount(m.kind, m.bytes.length.toLong), d.meanLuma, d.aHash, vec)
    })
  }

  /** STUB frame payload: deterministic rewrite standing in for a demuxed
    * frame (a real video container decode needs ffmpeg-class libraries).
    * Output bytes derive from (input bytes, target dims); the byte count
    * scales with the target area the way a re-encoded frame's would.
    */
  def frameStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val n = math.max(16, (w.toLong * h / 64).toInt)
    val out = new Array[Byte](n)
    var hsh = 0x9e3779b97f4a7c15L ^ (w.toLong << 32 | h.toLong)
    var i = 0
    while (i < n) {
      // an empty payload must hash as constant input, not crash on mod-zero
      hsh = (hsh ^ (if (bytes.isEmpty) 0L else bytes(i % bytes.length))) * 0x100000001b3L
      out(i) = (hsh >>> 56).toByte
      i += 1
    }
    out
  }

  /** REAL resize: decode → nearest-neighbor resample → lossless re-encode
    * ([[ImageCodec.resizePng]]). Partition-preserving; blobs never cross a
    * shuffle boundary.
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m => m.copy(bytes = ImageCodec.resizePng(m.bytes, w, h))))
  }

  final case class Frame(mediaId: Long, frameIdx: Int, bytes: Array[Byte])

  /** Frame sampling: one output row per sampled frame (every `stride`-th of
    * the frame count) — the 1→N explode shape of video pipelines, expressed
    * as a flatMap over partitions so payload access stays local to the
    * executor holding it. Frame payloads are the [[frameStub]] rewrite.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      val n = frameCount(m.kind, m.bytes.length.toLong)
      (0 until n by stride).map(i => Frame(m.mediaId, i, frameStub(m.bytes, 8 + i, 8)))
    })
  }

  /** The media-dedup banding projection over a feature frame (batch OR
    * streaming): dimension bands of 256, luma bands of 64 — the blocking
    * key shared by the m4 buckets, m5/m6/x4 pair generation, the m7 screen
    * and the st8 streaming screen. ONE definition so engine queries and
    * their oracle mirrors cannot drift apart.
    */
  def bandFeatures(feats: DataFrame): DataFrame =
    feats.select(col("mediaId"), col("kind"),
      floor(col("width") / 256).cast("long").as("w_band"),
      floor(col("height") / 256).cast("long").as("h_band"),
      floor(col("meanLuma") / 64).cast("long").as("luma_band"),
      col("aHash"))

  /** The m7/st8 screen VERDICT: aggregate match rows
    * `(batch_id, hist_id, hamming)` to a per-item count + argmin (lowest
    * hamming, ties to the lowest history id) and left-join every batch id
    * back in (no-match items report 0 / null). ONE definition — the
    * streaming screen replays the batch screen's oracle, so the two
    * assemblies must never drift.
    */
  def screenVerdict(matches: DataFrame, batchIds: DataFrame): DataFrame = {
    val hits = matches.groupBy("batch_id")
      .agg(count(lit(1)).as("n_matches"),
        min(struct(col("hamming"), col("hist_id"))).as("best"))
    batchIds.join(hits, Seq("batch_id"), "left")
      .select(col("batch_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        col("best.hist_id").as("best_id"),
        col("best.hamming").as("best_hamming"))
      .orderBy("batch_id")
  }

  /** Metadata projection: blob-free frame safe to join/aggregate at scale. */
  def metadata(df: DataFrame): DataFrame =
    df.select(col("mediaId"), col("kind"), col("mimeType"), col("capturedAt"),
      octet_length(col("bytes")).as("sizeBytes"),
      sha2(col("bytes"), 256).as("contentHash"))

  /** Synthesize a deterministic REAL-image media corpus keyed by the source
    * table's ids: every payload is actual PNG bytes from
    * [[ImageCodec.synthesize]], with `mediaId % families` family patterns so
    * genuine near-duplicates exist for the dedup operators (same pattern,
    * 0–3 flipped cells, in-band resolution jitter). The modality label
    * cycles image/audio/video as metadata; every payload is a decodable
    * image (frame decode for the other modalities is out of scope here).
    */
  def synthesize(docs: DataFrame, families: Int = 97): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    val kinds = Array("image", "audio", "video")
    // a small id table usually arrives as ONE parquet split — repartition
    // so the (CPU-heavy) per-id render+encode actually fans out
    val par = docs.sparkSession.sparkContext.defaultParallelism * 2
    docs.select(col("doc_id").cast("long")).as[Long]
      .repartition(par).mapPartitions(_.map { id =>
      MediaRow(id, kinds(java.lang.Math.floorMod(id, 3L).toInt),
        ImageCodec.synthesize(id, families), "image/png",
        Timestamp.valueOf("2026-01-01 00:00:00"))
    })
  }
}
