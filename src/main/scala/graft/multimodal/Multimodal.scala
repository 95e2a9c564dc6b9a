package graft.multimodal

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata. The VISUAL path is REAL end to end: image payloads
  * are actual PNG bytes, video payloads are actual animated GIFs, and
  * [[ImageCodec]]/[[GifCodec]] (javax.imageio — in the JDK, no external
  * dependency) recover exact dimensions, BT.601 luma, 64-bit average
  * hashes, and per-frame COMPOSITED rasters. The former size-derived frame
  * stub is gone: frame counts come from the container's real block
  * structure and sampled frame payloads are the real displayed frames,
  * PNG-re-encoded. The `audio` modality remains metadata-plus-poster (its
  * payload is a decodable still — a real audio demuxer/ffmpeg class
  * dependency does not exist in the JDK; this is the one documented
  * modality boundary).
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
      nFrames: Int,            // REAL container frame count (GIF blocks; 1 for stills)
      meanLuma: Double,        // REAL BT.601 mean over every decoded pixel
      aHash: Long,             // REAL 64-bit average hash of the luma plane
      featureVec: Array[Float] // 8 row-means of the pooled luma plane, /255
  )

  /** Feature extraction as a partition-preserving typed transform — the shape
    * a Pandas-UDF/`mapInPandas` stage takes in PySpark, expressed with
    * `mapPartitions` on the JVM: batch-in/batch-out, no driver involvement.
    * EVERY field comes from the real payload: stills decode their raster,
    * videos additionally report the container's true frame count
    * ([[GifCodec.frameCount]] — the former size-derived pseudo-count is
    * gone), and an animated payload's raster features are its first frame.
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
        GifCodec.frameCount(m.bytes), d.meanLuma, d.aHash, vec)
    })
  }

  final case class FrameFeatures(
      mediaId: Long,
      frameIdx: Int,
      width: Int,              // logical-screen (composited canvas) dims
      height: Int,
      meanLuma: Double,        // BT.601 mean of the COMPOSITED frame
      aHash: Long              // 64-bit average hash of the composited frame
  )

  /** Per-frame features over real decoded frames: a video explodes to one
    * row per composited GIF frame ([[GifCodec.decodeFrames]] — offsets and
    * disposal applied, so each row describes the frame a viewer displays),
    * a still is its own single frame. Narrow 1→N flatMap; payload bytes
    * never cross a shuffle, only the 8-byte hash and scalars do.
    */
  def frameFeatures(media: Dataset[MediaRow]): Dataset[FrameFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      GifCodec.decodeFrames(m.bytes).zipWithIndex.map { case (d, i) =>
        FrameFeatures(m.mediaId, i, d.width, d.height, d.meanLuma, d.aHash)
      }
    })
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
    * the REAL frame count) — the 1→N explode shape of video pipelines,
    * expressed as a flatMap over partitions so payload access stays local
    * to the executor holding it. Each payload is the actual COMPOSITED
    * frame, losslessly PNG-re-encoded ([[GifCodec.sampleFramePayloads]]);
    * a still samples as its own frame 0.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      GifCodec.sampleFramePayloads(m.bytes, stride)
        .map { case (i, png) => Frame(m.mediaId, i, png) }
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

  /** Synthesize a deterministic REAL-media corpus keyed by the source
    * table's ids: image and audio rows carry actual PNG bytes from
    * [[ImageCodec.synthesize]] (audio's payload is its poster still — the
    * documented modality boundary), VIDEO rows carry actual multi-frame
    * animated GIFs ([[GifCodec.synthesizeAnimation]]: frame 0 equals the
    * member pattern, later frames mutate one cell each). `mediaId %
    * families` family patterns put genuine near-duplicates in the corpus
    * for the dedup operators (same pattern, 0–3 flipped cells, in-band
    * resolution jitter) — at the STILL level and at the FRAME level.
    */
  def synthesize(docs: DataFrame, families: Int = 97): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    val kinds = Array("image", "audio", "video")
    // a small id table usually arrives as ONE parquet split — repartition
    // so the (CPU-heavy) per-id render+encode actually fans out
    val par = docs.sparkSession.sparkContext.defaultParallelism * 2
    docs.select(col("doc_id").cast("long")).as[Long]
      .repartition(par).mapPartitions(_.map { id =>
      val kind = kinds(java.lang.Math.floorMod(id, 3L).toInt)
      val (bytes, mime) =
        if (kind == "video") (GifCodec.synthesizeAnimation(id, families), "image/gif")
        else (ImageCodec.synthesize(id, families), "image/png")
      MediaRow(id, kind, bytes, mime, Timestamp.valueOf("2026-01-01 00:00:00"))
    })
  }
}
