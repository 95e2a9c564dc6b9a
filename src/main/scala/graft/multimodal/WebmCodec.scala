package graft.multimodal

import java.io.{ByteArrayOutputStream, IOException}

/** WebM/Matroska (EBML) CONTAINER-STRUCTURE codec — metadata only, the
  * [[Mp4Codec]] discipline for the other container a scraped-video corpus
  * ships. EBML is a length-prefixed binary tree: every element is a
  * variable-length ID (marker bit kept), a variable-length size (marker
  * stripped; all-ones = "unknown"), and a payload. `Segment → Info` carries
  * the timestamp scale and duration, `Segment → Tracks → TrackEntry` the
  * track inventory (type, codec, pixel dims), and `Segment → Cluster →
  * SimpleBlock` the actual frames — counting a video track's SimpleBlocks
  * is the container's real frame count, the number a loader budget trusts.
  *
  * Strict parse: truncated VINTs, elements overrunning their parent, a
  * SimpleBlock naming an undeclared track, a declared duration that does
  * not cover the last block's timestamp, or a missing Info/Tracks/video
  * track all fail through the IOException channel — never a silent wrong
  * decode. Frame PIXELS are out of scope (VP8/VP9/AV1 have no JDK
  * decoder — the documented boundary, same as MP4's codecs).
  *
  * Scale posture: one bounded pass per payload on executors, O(#elements)
  * state, flat integer/string output row; the blob never crosses a shuffle.
  */
object WebmCodec {

  final case class WebmMeta(
      docType: String,
      docTypeVersion: Int,
      timestampScaleNs: Long,
      durationTicks: Long,     // Duration element, exact (synthesized integral)
      nTracks: Int,
      videoTrackNumber: Long,
      codecId: String,
      pixelWidth: Int,
      pixelHeight: Int,
      videoBlocks: Long,       // SimpleBlock count on the video track
      keyframeBlocks: Long,    // ... of which carry the keyframe flag
      nClusters: Int
  )

  private def fail(msg: String): Nothing =
    throw new IOException(s"WebM parse: $msg")

  // ------------------------------------------------------------------ IDs
  private final val IdEbml = 0x1a45dfa3L
  private final val IdDocType = 0x4282L
  private final val IdDocTypeVersion = 0x4287L
  private final val IdSegment = 0x18538067L
  private final val IdInfo = 0x1549a966L
  private final val IdTimestampScale = 0x2ad7b1L
  private final val IdDuration = 0x4489L
  private final val IdTracks = 0x1654ae6bL
  private final val IdTrackEntry = 0xaeL
  private final val IdTrackNumber = 0xd7L
  private final val IdTrackType = 0x83L
  private final val IdCodecId = 0x86L
  private final val IdVideo = 0xe0L
  private final val IdPixelWidth = 0xb0L
  private final val IdPixelHeight = 0xbaL
  private final val IdAudio = 0xe1L
  private final val IdSamplingFreq = 0xb5L
  private final val IdCluster = 0x1f43b675L
  private final val IdClusterTimestamp = 0xe7L
  private final val IdSimpleBlock = 0xa3L

  // ---------------------------------------------------------------- parse

  private final class Rd(val b: Array[Byte], var pos: Int, val end: Int) {
    def remaining: Int = end - pos
    def u8(): Int = {
      if (pos >= end) fail("truncated read")
      val v = b(pos) & 0xff; pos += 1; v
    }

    /** EBML element ID: VINT with the marker bit KEPT (the conventional
      * form the spec lists IDs in), 1–4 bytes.
      */
    def elementId(): Long = {
      val b0 = u8()
      val len = vintLen(b0, max = 4, what = "element ID")
      var v = b0.toLong
      var i = 1
      while (i < len) { v = (v << 8) | u8(); i += 1 }
      v
    }

    /** EBML size: VINT with the marker stripped; returns -1 for the
      * all-ones "unknown size" form.
      */
    def elementSize(): Long = {
      val b0 = u8()
      val len = vintLen(b0, max = 8, what = "size")
      val markerMask = 1 << (8 - len)
      var v = (b0 & (markerMask - 1)).toLong
      var ones = b0 == (markerMask | (markerMask - 1))
      var i = 1
      while (i < len) {
        val x = u8(); if (x != 0xff) ones = false
        v = (v << 8) | x; i += 1
      }
      if (ones) -1L else v
    }

    private def vintLen(b0: Int, max: Int, what: String): Int = {
      if (b0 == 0) fail(s"$what VINT longer than 8 bytes")
      val len = java.lang.Integer.numberOfLeadingZeros(b0) - 23 // 32-bit NLZ → 1..8
      if (len > max) fail(s"$what VINT of $len bytes exceeds the $max-byte cap")
      len
    }

    def uintPayload(): Long = {
      if (remaining > 8) fail(s"unsigned int payload of $remaining bytes")
      var v = 0L
      while (pos < end) v = (v << 8) | u8()
      v
    }

    def floatPayload(): Double = {
      if (remaining == 4) java.lang.Float.intBitsToFloat(uintPayload().toInt).toDouble
      else if (remaining == 8) java.lang.Double.longBitsToDouble(uintPayload())
      else fail(s"float payload must be 4 or 8 bytes, got $remaining")
    }

    def stringPayload(): String = {
      val s = new String(b, pos, remaining, java.nio.charset.StandardCharsets.US_ASCII)
      pos = end
      s.takeWhile(_ != '\u0000') // EBML strings may be zero-padded
    }
  }

  /** Walk one level: `f(id, payload reader)` per child element. Unknown-size
    * elements are accepted only where Matroska streams use them (Segment,
    * Cluster — `unknownOkIds`) and extend to the parent's end.
    */
  private def walk(r: Rd, unknownOkIds: Set[Long])(f: (Long, Rd) => Unit): Unit = {
    while (r.remaining > 0) {
      val id = r.elementId()
      val size = r.elementSize()
      val payloadEnd =
        if (size < 0) {
          if (!unknownOkIds.contains(id)) fail(f"element 0x$id%x has unknown size")
          r.end.toLong
        } else r.pos.toLong + size
      if (payloadEnd > r.end) fail(f"element 0x$id%x overruns its parent")
      f(id, new Rd(r.b, r.pos, payloadEnd.toInt))
      r.pos = payloadEnd.toInt
    }
  }

  private final class Track {
    var number: Long = -1
    var kind: Long = -1 // 1 = video, 2 = audio
    var codecId: String = ""
    var w: Int = 0
    var h: Int = 0
  }

  /** One video SimpleBlock in stream order: 1-based `blockNo`, absolute
    * presentation time in timestamp-scale ticks (Cluster Timestamp +
    * s16 relative), and the keyframe header flag — the WebM analog of the
    * MP4 sample table ([[graft.multimodal.Mp4Codec.parseFrames]]), and the
    * planning surface for seek-aligned sampling on EBML containers.
    */
  final case class WebmBlock(blockNo: Long, ticks: Long, keyframe: Boolean)

  def parse(bytes: Array[Byte]): WebmMeta = parseWithBlocks(bytes)._1

  def parseBlocks(bytes: Array[Byte]): IndexedSeq[WebmBlock] =
    parseWithBlocks(bytes)._2

  private def parseWithBlocks(bytes: Array[Byte])
      : (WebmMeta, IndexedSeq[WebmBlock]) = {
    val root = new Rd(bytes, 0, bytes.length)
    val blocks = IndexedSeq.newBuilder[WebmBlock]

    var docType: String = null
    var docTypeVersion = 1
    var sawEbmlFirst = false
    var firstElement = true
    var timestampScale = 1000000L // EBML default: 1 ms ticks
    var durationTicksD = -1.0
    var sawSegment = false
    var sawInfo = false
    val tracks = scala.collection.mutable.ArrayBuffer.empty[Track]
    var nClusters = 0
    var videoBlocks = 0L
    var keyframes = 0L
    var lastBlockTicks = -1L

    walk(root, unknownOkIds = Set(IdSegment)) { (id, r) =>
      if (firstElement) { sawEbmlFirst = id == IdEbml; firstElement = false }
      id match {
        case IdEbml =>
          walk(r, Set.empty) {
            case (IdDocType, d) => docType = d.stringPayload()
            case (IdDocTypeVersion, d) => docTypeVersion = d.uintPayload().toInt
            case _ => ()
          }
        case IdSegment =>
          if (sawSegment) fail("second Segment element")
          sawSegment = true
          walk(r, unknownOkIds = Set(IdCluster)) {
            case (IdInfo, in) =>
              sawInfo = true
              walk(in, Set.empty) {
                case (IdTimestampScale, d) =>
                  timestampScale = d.uintPayload()
                  if (timestampScale <= 0) fail("TimestampScale must be positive")
                case (IdDuration, d) => durationTicksD = d.floatPayload()
                case _ => ()
              }
            case (IdTracks, tr) =>
              walk(tr, Set.empty) {
                case (IdTrackEntry, te) =>
                  val t = new Track
                  walk(te, Set.empty) {
                    case (IdTrackNumber, d) => t.number = d.uintPayload()
                    case (IdTrackType, d) => t.kind = d.uintPayload()
                    case (IdCodecId, d) => t.codecId = d.stringPayload()
                    case (IdVideo, v) =>
                      walk(v, Set.empty) {
                        case (IdPixelWidth, d) => t.w = d.uintPayload().toInt
                        case (IdPixelHeight, d) => t.h = d.uintPayload().toInt
                        case _ => ()
                      }
                    case _ => ()
                  }
                  if (t.number <= 0) fail("TrackEntry without a TrackNumber")
                  if (tracks.exists(_.number == t.number))
                    fail(s"duplicate TrackNumber ${t.number}")
                  tracks += t
                case _ => ()
              }
            case (IdCluster, cl) =>
              nClusters += 1
              var clusterTs = -1L
              walk(cl, Set.empty) {
                case (IdClusterTimestamp, d) => clusterTs = d.uintPayload()
                case (IdSimpleBlock, blk) =>
                  if (clusterTs < 0) fail("SimpleBlock before the Cluster Timestamp")
                  // block header: VINT track, s16 relative timestamp, flags
                  val b0 = blk.u8()
                  if ((b0 & 0x80) == 0) fail("SimpleBlock track VINT longer than 1 byte")
                  val trackNo = (b0 & 0x7f).toLong
                  val track = tracks.find(_.number == trackNo)
                    .getOrElse(fail(s"SimpleBlock names undeclared track $trackNo"))
                  val rel = ((blk.u8() << 8) | blk.u8()).toShort.toLong
                  val flags = blk.u8()
                  if (track.kind == 1L) {
                    videoBlocks += 1
                    if ((flags & 0x80) != 0) keyframes += 1
                    lastBlockTicks = math.max(lastBlockTicks, clusterTs + rel)
                    blocks += WebmBlock(videoBlocks, clusterTs + rel,
                      (flags & 0x80) != 0)
                  }
                case _ => ()
              }
            case _ => ()
          }
        case _ => () // Void/CRC etc. at top level: valid header, ignored
      }
    }

    if (!sawEbmlFirst) fail("file does not start with an EBML header")
    if (docType == null) fail("EBML header has no DocType")
    if (docType != "webm" && docType != "matroska")
      fail(s"DocType '$docType' is not webm/matroska")
    if (!sawSegment) fail("no Segment element")
    if (!sawInfo) fail("Segment has no Info element")
    if (tracks.isEmpty) fail("Segment has no Tracks")
    val vid = tracks.find(_.kind == 1L).getOrElse(fail("no video TrackEntry"))
    if (vid.w <= 0 || vid.h <= 0) fail("video track missing pixel dimensions")
    if (durationTicksD < 0) fail("Info has no Duration")
    if (durationTicksD != math.rint(durationTicksD))
      fail(s"non-integral Duration $durationTicksD (synthesized containers are tick-exact)")
    val durationTicks = durationTicksD.toLong
    if (videoBlocks == 0) fail("video track has no SimpleBlocks")
    if (lastBlockTicks >= durationTicks)
      fail(s"declared Duration $durationTicks does not cover the last block at $lastBlockTicks")

    (WebmMeta(docType, docTypeVersion, timestampScale, durationTicks,
      tracks.length, vid.number, vid.codecId, vid.w, vid.h,
      videoBlocks, keyframes, nClusters), blocks.result())
  }

  // ----------------------------------------------------------- synthesize

  private final class Bw {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): Bw = { out.write(v & 0xff); this }
    def raw(b: Array[Byte]): Bw = { out.write(b); this }
    def bytes: Array[Byte] = out.toByteArray
  }

  /** Element ID in its conventional marker-kept form, minimal bytes. */
  private def idBytes(id: Long): Array[Byte] = {
    val n = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
    Array.tabulate(n)(i => ((id >> (8 * (n - 1 - i))) & 0xff).toByte)
  }

  /** Size as a minimal VINT (marker bit added), avoiding the all-ones form. */
  private def sizeBytes(size: Long): Array[Byte] = {
    require(size >= 0)
    var len = 1
    while (len <= 8 && size >= (1L << (7 * len)) - 1) len += 1
    require(len <= 8, s"size $size too large")
    val marked = size | (1L << (7 * len))
    Array.tabulate(len)(i => ((marked >> (8 * (len - 1 - i))) & 0xff).toByte)
  }

  private def element(id: Long)(body: Bw => Unit): Array[Byte] = {
    val b = new Bw
    body(b)
    val payload = b.bytes
    val h = new Bw
    h.raw(idBytes(id)).raw(sizeBytes(payload.length.toLong)).raw(payload)
    h.bytes
  }

  private def uintElement(id: Long, v: Long): Array[Byte] = element(id) { b =>
    val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
    (0 until n).foreach(i => b.u8(((v >> (8 * (n - 1 - i))) & 0xff).toInt))
  }

  private def floatElement(id: Long, v: Double): Array[Byte] = element(id) { b =>
    val bits = java.lang.Double.doubleToLongBits(v)
    (0 until 8).foreach(i => b.u8(((bits >> (8 * (7 - i))) & 0xff).toInt))
  }

  private def stringElement(id: Long, s: String): Array[Byte] =
    element(id)(_.raw(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)))

  private val Codecs = Array("V_VP8", "V_VP9", "V_AV1")
  /** Whole-millisecond frame spacings (40 = 25 fps, …): with the default
    * 1 ms timestamp scale every block timestamp and the total Duration are
    * exact integers — no float ever diverges.
    */
  private val SpacingMs = Array(25L, 40L, 50L, 125L)

  /** Build a valid WebM container for video `mediaId` carrying exactly
    * `nFrames` video SimpleBlocks of `width`×`height` — frame count and
    * dims from the REAL decoded payload, like the MP4 sidecar. Shape
    * varies per id: codec V_VP8/VP9/AV1, an extra Opus audio track (odd
    * ids), blocks split across 1–3 clusters, keyframe every 1–4 blocks.
    */
  def synthesize(mediaId: Long, nFrames: Int, width: Int, height: Int): Array[Byte] = {
    require(nFrames >= 1, s"nFrames $nFrames")
    val mix1 = ImageCodec.mix(mediaId + 15485863L)
    val codec = Codecs(java.lang.Math.floorMod(mix1, 3L).toInt)
    val spacing = SpacingMs(java.lang.Math.floorMod(ImageCodec.mix(mediaId + 32452843L), 4L).toInt)
    val keyEvery = 1 + java.lang.Math.floorMod(ImageCodec.mix(mediaId + 49979687L), 4L).toInt
    val withAudio = mediaId % 2 != 0
    val nClusters = 1 + java.lang.Math.floorMod(mix1 >> 8, 3L).toInt min nFrames
    val frameBytes = 120 + java.lang.Math.floorMod(ImageCodec.mix(mediaId + 67867967L), 200L).toInt
    val durationTicks = nFrames.toLong * spacing

    val ebml = element(IdEbml) { b =>
      b.raw(uintElement(0x4286L, 1L)) // EBMLVersion
      b.raw(uintElement(0x42f7L, 1L)) // EBMLReadVersion
      b.raw(uintElement(0x42f2L, 4L)) // EBMLMaxIDLength
      b.raw(uintElement(0x42f3L, 8L)) // EBMLMaxSizeLength
      b.raw(stringElement(IdDocType, "webm"))
      b.raw(uintElement(IdDocTypeVersion, 4L))
      b.raw(uintElement(0x4285L, 2L)) // DocTypeReadVersion
    }

    val info = element(IdInfo) { b =>
      b.raw(uintElement(IdTimestampScale, 1000000L)) // 1 ms ticks
      b.raw(floatElement(IdDuration, durationTicks.toDouble))
      b.raw(stringElement(0x4d80L, "graft"))  // MuxingApp
      b.raw(stringElement(0x5741L, "graft"))  // WritingApp
    }

    val videoTrack = element(IdTrackEntry) { b =>
      b.raw(uintElement(IdTrackNumber, 1L))
      b.raw(uintElement(0x73c5L, mediaId + 1)) // TrackUID
      b.raw(uintElement(IdTrackType, 1L))
      b.raw(stringElement(IdCodecId, codec))
      b.raw(element(IdVideo) { v =>
        v.raw(uintElement(IdPixelWidth, width.toLong))
        v.raw(uintElement(IdPixelHeight, height.toLong))
      })
    }
    val audioTrack = element(IdTrackEntry) { b =>
      b.raw(uintElement(IdTrackNumber, 2L))
      b.raw(uintElement(0x73c5L, mediaId + 2))
      b.raw(uintElement(IdTrackType, 2L))
      b.raw(stringElement(IdCodecId, "A_OPUS"))
      b.raw(element(IdAudio)(a => a.raw(floatElement(IdSamplingFreq, 48000.0))))
    }
    val tracksEl = element(IdTracks) { b =>
      b.raw(videoTrack)
      if (withAudio) b.raw(audioTrack)
    }

    // frames spread across clusters; block timestamps are cluster-relative
    // (s16), cluster Timestamp carries the base
    val perCluster = (nFrames + nClusters - 1) / nClusters
    val clusters = (0 until nClusters).map { c =>
      val lo = c * perCluster
      val hi = math.min(nFrames, lo + perCluster)
      element(IdCluster) { b =>
        b.raw(uintElement(IdClusterTimestamp, lo.toLong * spacing))
        (lo until hi).foreach { k =>
          val rel = (k - lo).toLong * spacing
          require(rel <= Short.MaxValue, "cluster-relative timestamp overflows s16")
          val keyframe = k % keyEvery == 0
          b.raw(element(IdSimpleBlock) { blk =>
            blk.u8(0x80 | 1) // 1-byte track VINT → track 1
            blk.u8(((rel >> 8) & 0xff).toInt).u8((rel & 0xff).toInt)
            blk.u8(if (keyframe) 0x80 else 0x00)
            val fb = new Array[Byte](frameBytes)
            var i = 0
            while (i < fb.length) {
              fb(i) = (ImageCodec.mix(mediaId * 131L + k * 17L + i) & 0xffL).toByte
              i += 1
            }
            blk.raw(fb)
          })
        }
      }
    }

    val segment = element(IdSegment) { b =>
      b.raw(info)
      b.raw(tracksEl)
      clusters.foreach(b.raw)
    }

    val out = new ByteArrayOutputStream()
    out.write(ebml); out.write(segment)
    out.toByteArray
  }
}
