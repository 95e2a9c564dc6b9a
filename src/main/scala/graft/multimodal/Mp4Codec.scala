package graft.multimodal

import java.io.{ByteArrayOutputStream, IOException}

/** MP4 (ISO BMFF) CONTAINER-STRUCTURE codec — metadata only, no sample
  * decode. The containers a real scraped-video corpus ships (MP4/WebM)
  * have no JDK decoder for their CODECS, but their container structure is
  * plain big-endian binary the same way GRIB2 was: box = u32 size + fourcc
  * (+ u64 largesize when size==1), `moov/mvhd` carries the movie timescale
  * and duration, each `trak/mdia/mdhd` its media timescale, and the
  * `stbl/stts` run-length table the REAL sample (frame) count and exact
  * media duration. This module parses that structure strictly — every
  * malformed shape (truncated header, box overrunning its parent, stts
  * that disagrees with mdhd, stsz total that disagrees with mdat) fails
  * through the IOException channel like every corrupt GRIB2 section —
  * and synthesizes valid containers for the deterministic test corpus.
  *
  * Reference semantics: jackfruit's media pipeline records per-asset
  * duration/frame metadata from the upstream container; this is the
  * honest Spark-side equivalent (real numbers from the actual boxes, no
  * ffmpeg dependency). Frame PIXELS remain GIF/still-backed ([[GifCodec]])
  * — the documented codec boundary.
  *
  * Scale posture: parse runs on executors inside `mapPartitions`, reads
  * each payload once, holds only O(#boxes) state, and returns a flat
  * integer/string row — the blob never crosses a shuffle.
  */
object Mp4Codec {

  /** Everything the container's own boxes declare, as exact integers (the
    * oracle replays arithmetic over these; no float leaves the parse).
    *  - `movieDurationTicks` is in `movieTimescale` units (mvhd),
    *    `videoDurationTicks` in `videoTimescale` units (the video trak's
    *    mdhd) — the parser cross-checks the latter against the stts sum.
    *  - `videoFrames` = Σ stts sample counts: the container's real frame
    *    count, the number a transcoder or loader budget would trust.
    *  - `width`/`height` from tkhd's 16.16 fixed-point, exact for the
    *    integer dims we (and every sane encoder) write.
    *  - `sampleBytes` = Σ stsz sizes, cross-checked against the mdat
    *    payload length (`mdatBytes`).
    */
  final case class Mp4Meta(
      majorBrand: String,
      mvhdVersion: Int,
      movieTimescale: Long,
      movieDurationTicks: Long,
      nTracks: Int,
      videoFrames: Long,
      videoTimescale: Long,
      videoDurationTicks: Long,
      width: Int,
      height: Int,
      sampleBytes: Long,
      mdatBytes: Long
  )

  private def fail(msg: String): Nothing =
    throw new IOException(s"MP4 parse: $msg")

  // ---------------------------------------------------------------- parse

  /** Big-endian reader bounded to [pos, end) — the Grib2 discipline: a
    * lying box length fails here instead of reading past its parent.
    */
  private final class Rd(val b: Array[Byte], var pos: Int, val end: Int) {
    def remaining: Int = end - pos
    def u8(): Int = {
      if (pos + 1 > end) fail("truncated read (u8)")
      val v = b(pos) & 0xff; pos += 1; v
    }
    def u16(): Int = (u8() << 8) | u8()
    def u32(): Long = ((u16().toLong << 16) | u16().toLong) & 0xffffffffL
    def u64(): Long = (u32() << 32) | u32()
    def fourcc(): String = {
      if (pos + 4 > end) fail("truncated read (fourcc)")
      val s = new String(b, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
      pos += 4; s
    }
    def skip(n: Long): Unit = {
      if (n < 0 || pos + n > end) fail(s"skip of $n overruns bound")
      pos += n.toInt
    }
  }

  /** One box header: (fourcc, payloadStart, payloadEnd). Handles the
    * size==1 largesize form; size==0 ("to end of file") is accepted only
    * at top level per the spec, where `topLevel` says so.
    */
  private def boxHeader(r: Rd, topLevel: Boolean): (String, Int, Int) = {
    val start = r.pos
    if (r.remaining < 8) fail(s"truncated box header at $start")
    val size32 = r.u32()
    val cc = r.fourcc()
    val (payloadStart, boxEnd) =
      if (size32 == 1L) {
        if (r.remaining < 8) fail(s"box '$cc' declares largesize but truncates")
        val size64 = r.u64()
        if (size64 < 16) fail(s"box '$cc' largesize $size64 < 16")
        (r.pos, start.toLong + size64)
      } else if (size32 == 0L) {
        if (!topLevel) fail(s"box '$cc' size 0 (to-EOF) below top level")
        (r.pos, r.end.toLong)
      } else {
        if (size32 < 8) fail(s"box '$cc' size $size32 < 8")
        (r.pos, start.toLong + size32)
      }
    if (boxEnd > r.end) fail(s"box '$cc' (${boxEnd - start} bytes) overruns its parent")
    (cc, payloadStart, boxEnd.toInt)
  }

  /** Walk one container level, calling `f(fourcc, payload reader)` per box.
    * Unknown boxes are skipped — but only over VALID headers, so garbage
    * still fails.
    */
  private def walk(r: Rd, topLevel: Boolean)(f: (String, Rd) => Unit): Unit = {
    while (r.remaining > 0) {
      val (cc, ps, pe) = boxHeader(r, topLevel)
      f(cc, new Rd(r.b, ps, pe))
      r.pos = pe
    }
  }

  private final class TrakAcc {
    var handler: String = ""
    var mediaTimescale: Long = -1
    var mediaDurationTicks: Long = -1
    var tkhdDurationTicks: Long = -1
    var width: Int = 0
    var height: Int = 0
    var sttsFrames: Long = -1
    var sttsDurationTicks: Long = -1
    var stszTotal: Long = 0
    var firstChunkOffset: Long = -1
    val sttsRuns = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    // None = no stss box (ISO-BMFF: EVERY sample is a sync sample);
    // Some(ns) = exactly the listed 1-based sample numbers are sync
    var stssSamples: Option[Array[Long]] = None
  }

  /** One video sample (frame) expanded from the sample tables: 1-based
    * `sampleNo` (the stss numbering), decode timestamp `startTicks` (prefix
    * sum of stts deltas, in media-timescale ticks), its `durTicks`, and
    * whether it is a sync sample (keyframe) per stss — absent stss means
    * all sync, the spec default.
    */
  final case class Mp4Frame(sampleNo: Long, startTicks: Long,
      durTicks: Long, sync: Boolean)

  /** Strict parse of the full container. Structural requirements (each a
    * fail-fast, not a default): `ftyp` first; exactly one `moov` with one
    * `mvhd`; at least one trak whose handler is `vide`, carrying `mdhd` +
    * `stts`; positive timescales; stts duration == mdhd duration; Σ stsz
    * == Σ mdat payload bytes; no trailing garbage after the last box.
    */
  def parse(bytes: Array[Byte]): Mp4Meta = parseWithVid(bytes)._1

  /** Expand the video track's sample tables into per-frame rows — the
    * planning surface for frame-selection policies (m3-style stride,
    * m9-style cut windows) on REAL containers where pixels have no JDK
    * decoder: timestamps are exact prefix sums of stts deltas and sync
    * flags replay stss, so a sampling plan computed from these rows names
    * exactly the frames a real demuxer would extract.
    */
  def parseFrames(bytes: Array[Byte]): IndexedSeq[Mp4Frame] = {
    val vid = parseWithVid(bytes)._2
    val syncSet = vid.stssSamples.map(_.toSet)
    val out = IndexedSeq.newBuilder[Mp4Frame]
    var no = 1L
    var t = 0L
    vid.sttsRuns.foreach { case (cnt, delta) =>
      var i = 0L
      while (i < cnt) {
        out += Mp4Frame(no, t, delta, syncSet.forall(_.contains(no)))
        t += delta
        no += 1
        i += 1
      }
    }
    out.result()
  }

  private def parseWithVid(bytes: Array[Byte]): (Mp4Meta, TrakAcc) = {
    val root = new Rd(bytes, 0, bytes.length)

    var majorBrand: String = null
    var sawFtypFirst = false
    var firstBox = true
    var mvhdVersion = -1
    var movieTimescale = -1L
    var movieDurationTicks = -1L
    var mdatBytes = 0L
    var mdatPayloadStart = -1L
    val traks = scala.collection.mutable.ArrayBuffer.empty[TrakAcc]
    var sawMoov = false

    walk(root, topLevel = true) { (cc, r) =>
      if (firstBox) { sawFtypFirst = cc == "ftyp"; firstBox = false }
      cc match {
        case "ftyp" =>
          majorBrand = r.fourcc()
          r.skip(4) // minor_version
          // compatible brands: must tile the remainder exactly
          if (r.remaining % 4 != 0) fail("ftyp compatible-brand list not 4-aligned")
        case "moov" =>
          if (sawMoov) fail("second moov box")
          sawMoov = true
          walk(r, topLevel = false) {
            case ("mvhd", m) =>
              mvhdVersion = m.u8()
              m.skip(3) // flags
              if (mvhdVersion == 1) {
                m.skip(16) // creation + modification (u64 each)
                movieTimescale = m.u32()
                movieDurationTicks = m.u64()
              } else if (mvhdVersion == 0) {
                m.skip(8)
                movieTimescale = m.u32()
                movieDurationTicks = m.u32()
              } else fail(s"mvhd version $mvhdVersion")
              if (movieTimescale <= 0) fail("mvhd timescale must be positive")
            case ("trak", tr) =>
              val acc = new TrakAcc
              walk(tr, topLevel = false) {
                case ("tkhd", k) =>
                  val v = k.u8(); k.skip(3)
                  if (v == 1) { k.skip(16); k.skip(4); k.skip(4); acc.tkhdDurationTicks = k.u64() }
                  else { k.skip(8); k.skip(4); k.skip(4); acc.tkhdDurationTicks = k.u32() }
                  // reserved(8) + layer/group(4) + volume(2) + reserved(2) + matrix(36)
                  k.skip(52)
                  acc.width = {
                    val fx = k.u32()
                    if ((fx & 0xffffL) != 0) fail("tkhd width has a fractional 16.16 part")
                    (fx >> 16).toInt
                  }
                  acc.height = {
                    val fx = k.u32()
                    if ((fx & 0xffffL) != 0) fail("tkhd height has a fractional 16.16 part")
                    (fx >> 16).toInt
                  }
                case ("mdia", md) =>
                  walk(md, topLevel = false) {
                    case ("mdhd", h) =>
                      val v = h.u8(); h.skip(3)
                      if (v == 1) { h.skip(16); acc.mediaTimescale = h.u32(); acc.mediaDurationTicks = h.u64() }
                      else { h.skip(8); acc.mediaTimescale = h.u32(); acc.mediaDurationTicks = h.u32() }
                      if (acc.mediaTimescale <= 0) fail("mdhd timescale must be positive")
                    case ("hdlr", h) =>
                      h.skip(4); h.skip(4) // version/flags + pre_defined
                      acc.handler = h.fourcc()
                    case ("minf", mi) =>
                      walk(mi, topLevel = false) {
                        case ("stbl", st) =>
                          walk(st, topLevel = false) {
                            case ("stts", s) =>
                              s.skip(4)
                              val n = s.u32()
                              if (n * 8 > s.remaining) fail(s"stts declares $n entries but has ${s.remaining} bytes")
                              var frames = 0L
                              var dur = 0L
                              var i = 0L
                              while (i < n) {
                                val cnt = s.u32(); val delta = s.u32()
                                if (delta == 0 && cnt > 0) fail("stts sample delta 0")
                                frames += cnt; dur += cnt * delta; i += 1
                                acc.sttsRuns += ((cnt, delta))
                              }
                              acc.sttsFrames = frames
                              acc.sttsDurationTicks = dur
                            case ("stss", s) =>
                              s.skip(4)
                              val n = s.u32()
                              if (n * 4 > s.remaining)
                                fail(s"stss declares $n entries but has ${s.remaining} bytes")
                              val ns = new Array[Long](n.toInt)
                              var i = 0
                              while (i < n) {
                                ns(i) = s.u32()
                                if (ns(i) < 1) fail(s"stss sample number ${ns(i)} < 1")
                                if (i > 0 && ns(i) <= ns(i - 1))
                                  fail("stss sample numbers must be strictly increasing")
                                i += 1
                              }
                              acc.stssSamples = Some(ns)
                            case ("stsz", s) =>
                              s.skip(4)
                              val uniform = s.u32()
                              val n = s.u32()
                              if (uniform != 0) acc.stszTotal = uniform * n
                              else {
                                if (n * 4 > s.remaining) fail(s"stsz declares $n sizes but has ${s.remaining} bytes")
                                var t = 0L; var i = 0L
                                while (i < n) { t += s.u32(); i += 1 }
                                acc.stszTotal = t
                              }
                            case ("stco", s) =>
                              s.skip(4)
                              val n = s.u32()
                              if (n > 0) acc.firstChunkOffset = s.u32()
                            case _ => ()
                          }
                        case _ => ()
                      }
                    case _ => ()
                  }
                case _ => ()
              }
              traks += acc
            case _ => ()
          }
        case "mdat" =>
          if (mdatPayloadStart < 0) mdatPayloadStart = r.pos.toLong
          mdatBytes += r.remaining.toLong
        case _ => () // free/skip/uuid etc.: valid header, ignored payload
      }
    }

    if (!sawFtypFirst) fail("file does not start with an ftyp box")
    if (majorBrand == null) fail("ftyp too short for a major brand")
    if (!sawMoov) fail("no moov box")
    if (movieTimescale < 0) fail("moov has no mvhd")
    if (traks.isEmpty) fail("moov has no trak")
    val vid = traks.find(_.handler == "vide").getOrElse(fail("no video (hdlr 'vide') track"))
    if (vid.mediaTimescale < 0) fail("video trak has no mdhd")
    if (vid.sttsFrames < 0) fail("video trak has no stts")
    // stss numbering is validated against the REAL frame census, not taken
    // on faith: a sync table naming a sample past the stts count is a
    // malformed wire, the same channel as every other cross-check here
    vid.stssSamples.foreach { ns =>
      if (ns.nonEmpty && ns.last > vid.sttsFrames)
        fail(s"stss names sample ${ns.last} but stts carries only ${vid.sttsFrames}")
    }
    if (vid.sttsDurationTicks != vid.mediaDurationTicks)
      fail(s"stts duration ${vid.sttsDurationTicks} != mdhd duration ${vid.mediaDurationTicks}")
    if (vid.tkhdDurationTicks >= 0 && vid.tkhdDurationTicks != movieDurationTicks)
      fail(s"video tkhd duration ${vid.tkhdDurationTicks} != mvhd duration $movieDurationTicks")
    val sampleTotal = traks.map(_.stszTotal).sum
    if (mdatBytes > 0 && sampleTotal != mdatBytes)
      fail(s"stsz total $sampleTotal != mdat payload $mdatBytes")
    if (vid.firstChunkOffset >= 0 && mdatPayloadStart >= 0 &&
        vid.firstChunkOffset != mdatPayloadStart)
      fail(s"stco first chunk ${vid.firstChunkOffset} does not point at the mdat payload $mdatPayloadStart")

    (Mp4Meta(majorBrand, mvhdVersion, movieTimescale, movieDurationTicks,
      traks.length, vid.sttsFrames, vid.mediaTimescale, vid.mediaDurationTicks,
      vid.width, vid.height, sampleTotal, mdatBytes), vid)
  }

  // ----------------------------------------------------------- synthesize

  private final class Bw {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): Bw = { out.write(v & 0xff); this }
    def u16(v: Int): Bw = { u8(v >>> 8); u8(v) }
    def u32(v: Long): Bw = { u16((v >>> 16).toInt); u16(v.toInt) }
    def u64(v: Long): Bw = { u32(v >>> 32); u32(v) }
    def cc(s: String): Bw = { out.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)); this }
    def raw(b: Array[Byte]): Bw = { out.write(b); this }
    def bytes: Array[Byte] = out.toByteArray
  }

  private def box(cc: String)(body: Bw => Unit): Array[Byte] = {
    val b = new Bw
    body(b)
    val payload = b.bytes
    val h = new Bw
    h.u32(8L + payload.length).cc(cc).raw(payload)
    h.bytes
  }

  /** The per-id container parameters — all derived from the same
    * deterministic mix the GIF/WAV synthesizers use, chosen so every
    * tick arithmetic is EXACT (each media timescale is divisible by
    * every fps and by the movie-timescale ratio; see Mp4Spec).
    */
  private val MediaTimescales = Array(24000L, 30000L, 90000L, 120000L)
  private val Fps = Array(8L, 12L, 24L, 30L)
  private val MovieTimescale = 600L

  /** Build a valid MP4 sidecar container for video `mediaId` whose stts
    * carries exactly `nFrames` samples of `width`×`height` — the frame
    * count and dims of the REAL decoded payload the corpus holds, so a
    * parse of this container agrees with the pixel-level decode the way a
    * faithful transcode's metadata would. Shape varies per id to exercise
    * the parser: mvhd version 1 for id%7==0, a second (empty, `soun`)
    * trak for even ids, two-run variable-frame-rate stts for id%5==0, and
    * an stss sync table (keyframe every GOP-th sample, GOP in 2..5) for
    * id%3!=0 — id%3==0 omits stss, the all-sync spec default.
    */
  def synthesize(mediaId: Long, nFrames: Int, width: Int, height: Int): Array[Byte] = {
    require(nFrames >= 1, s"nFrames $nFrames")
    val mix = ImageCodec.mix(mediaId + 7919)
    val mediaTs = MediaTimescales(java.lang.Math.floorMod(mix, 4L).toInt)
    val fps = Fps(java.lang.Math.floorMod(ImageCodec.mix(mediaId + 104729), 4L).toInt)
    val delta = mediaTs / fps
    val vfr = mediaId % 5 == 0 && nFrames >= 3
    val sttsRuns: Seq[(Long, Long)] =
      if (vfr) { val n1 = nFrames / 2L; Seq((n1, delta), (nFrames - n1, 2L * delta)) }
      else Seq((nFrames.toLong, delta))
    val mediaDur = sttsRuns.map { case (c, d) => c * d }.sum
    // exact by construction: mediaTs % (MovieTimescale * fps) arithmetic
    // keeps mediaDur * MovieTimescale / mediaTs an integer (Mp4Spec pins it)
    val movieDur = mediaDur * MovieTimescale / mediaTs
    val mvhdV1 = mediaId % 7 == 0
    val withAudio = mediaId % 2 == 0
    val sampleSize = 200L + java.lang.Math.floorMod(ImageCodec.mix(mediaId + 13), 312L)
    // sync table: keyframe every gop-th sample starting at 1 (sample 1 is
    // always sync, as every real encoder emits); id%3==0 omits the box
    val stssSamples: Option[Seq[Long]] =
      if (mediaId % 3 == 0) None
      else {
        val gop = 2L + java.lang.Math.floorMod(ImageCodec.mix(mediaId + 31), 4L)
        Some((1L to nFrames.toLong).filter(n => (n - 1) % gop == 0))
      }

    val ftyp = box("ftyp") { b =>
      b.cc("isom").u32(0x200L).cc("isom").cc("iso2").cc("mp41")
    }

    def fullHeader(b: Bw, version: Int): Unit = { b.u8(version).u8(0).u16(0) }

    val traksNext: Long = if (withAudio) 3L else 2L

    val mvhd = box("mvhd") { b =>
      fullHeader(b, if (mvhdV1) 1 else 0)
      if (mvhdV1) { b.u64(0L).u64(0L).u32(MovieTimescale).u64(movieDur) }
      else { b.u32(0L).u32(0L).u32(MovieTimescale).u32(movieDur) }
      b.u32(0x00010000L).u16(0x0100).u16(0) // rate 1.0, volume 1.0, reserved
      b.u32(0L).u32(0L)                     // reserved
      Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L).foreach(b.u32)
      (0 until 6).foreach(_ => b.u32(0L))   // pre_defined
      b.u32(traksNext)                      // next_track_ID
    }

    def tkhd(trackId: Long, dur: Long, w: Int, h: Int, volume: Int): Array[Byte] =
      box("tkhd") { b =>
        fullHeader(b, 0)
        b.u32(0L).u32(0L)          // creation, modification
        b.u32(trackId).u32(0L)     // track_ID, reserved
        b.u32(dur)
        b.u32(0L).u32(0L)          // reserved
        b.u16(0).u16(0).u16(volume).u16(0) // layer, alternate_group, volume, reserved
        Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L).foreach(b.u32)
        b.u32(w.toLong << 16).u32(h.toLong << 16)
      }

    def mdhd(ts: Long, dur: Long): Array[Byte] = box("mdhd") { b =>
      fullHeader(b, 0)
      b.u32(0L).u32(0L).u32(ts).u32(dur)
      b.u16(0x55c4).u16(0) // language 'und', pre_defined
    }

    def hdlr(kind: String, name: String): Array[Byte] = box("hdlr") { b =>
      fullHeader(b, 0)
      b.u32(0L).cc(kind)
      b.u32(0L).u32(0L).u32(0L)
      b.raw(name.getBytes(java.nio.charset.StandardCharsets.US_ASCII)).u8(0)
    }

    def dinf: Array[Byte] = box("dinf") { b =>
      b.raw(box("dref") { d =>
        fullHeader(d, 0); d.u32(1L)
        d.raw(box("url ") { u => u.u8(0).u8(0).u16(1) }) // self-contained
      })
    }

    def stsdVideo: Array[Byte] = box("stsd") { b =>
      fullHeader(b, 0); b.u32(1L)
      b.raw(box("mp4v") { e =>
        (0 until 6).foreach(_ => e.u8(0))  // reserved
        e.u16(1)                           // data_reference_index
        e.u16(0).u16(0)                    // pre_defined, reserved
        (0 until 3).foreach(_ => e.u32(0L))
        e.u16(width).u16(height)
        e.u32(0x00480000L).u32(0x00480000L) // 72 dpi
        e.u32(0L).u16(1)                    // reserved, frame_count
        e.raw(new Array[Byte](32))          // compressorname
        e.u16(24).u16(0xffff)               // depth, pre_defined
      })
    }

    def sttsBox(runs: Seq[(Long, Long)]): Array[Byte] = box("stts") { b =>
      fullHeader(b, 0); b.u32(runs.length.toLong)
      runs.foreach { case (c, d) => b.u32(c).u32(d) }
    }

    // stco needs the absolute mdat payload offset — computed after the
    // moov bytes are known, so the video stbl is built as a function of it
    def stblVideo(chunkOffset: Long): Array[Byte] = box("stbl") { b =>
      b.raw(stsdVideo)
      b.raw(sttsBox(sttsRuns))
      b.raw(box("stsc") { s =>
        fullHeader(s, 0); s.u32(1L)
        s.u32(1L).u32(nFrames.toLong).u32(1L) // one chunk holds every sample
      })
      b.raw(box("stsz") { s => fullHeader(s, 0); s.u32(sampleSize).u32(nFrames.toLong) })
      stssSamples.foreach { ns =>
        b.raw(box("stss") { s =>
          fullHeader(s, 0); s.u32(ns.length.toLong); ns.foreach(s.u32)
        })
      }
      b.raw(box("stco") { s => fullHeader(s, 0); s.u32(1L).u32(chunkOffset) })
    }

    def trakVideo(chunkOffset: Long): Array[Byte] = box("trak") { b =>
      b.raw(tkhd(1L, movieDur, width, height, 0))
      b.raw(box("mdia") { m =>
        m.raw(mdhd(mediaTs, mediaDur))
        m.raw(hdlr("vide", "VideoHandler"))
        m.raw(box("minf") { mi =>
          // vmhd is version 0 with the spec-mandated flags=1
          mi.raw(box("vmhd") { v => v.u8(0).u8(0).u16(1); v.u16(0).u16(0).u16(0).u16(0) })
          mi.raw(dinf)
          mi.raw(stblVideo(chunkOffset))
        })
      })
    }

    // an EMPTY audio track (0 samples, duration 0): exercises multi-trak
    // walking and the handler-based video-track selection without putting
    // un-inventoried bytes in mdat (Σ stsz == mdat stays exact)
    def trakAudio: Array[Byte] = box("trak") { b =>
      b.raw(tkhd(2L, 0L, 0, 0, 0x0100))
      b.raw(box("mdia") { m =>
        m.raw(mdhd(48000L, 0L))
        m.raw(hdlr("soun", "SoundHandler"))
        m.raw(box("minf") { mi =>
          mi.raw(box("smhd") { s => fullHeader(s, 0); s.u16(0).u16(0) })
          mi.raw(dinf)
          mi.raw(box("stbl") { st =>
            st.raw(box("stsd") { s => fullHeader(s, 0); s.u32(0L) })
            st.raw(sttsBox(Seq.empty))
            st.raw(box("stsz") { s => fullHeader(s, 0); s.u32(0L).u32(0L) })
            st.raw(box("stco") { s => fullHeader(s, 0); s.u32(0L) })
          })
        })
      })
    }

    def moov(chunkOffset: Long): Array[Byte] = box("moov") { b =>
      b.raw(mvhd)
      b.raw(trakVideo(chunkOffset))
      if (withAudio) b.raw(trakAudio)
    }

    // two-pass offset fix-up: moov's size is offset-independent (stco is
    // fixed-width), so build once with 0, then rebuild with the real offset
    val moov0 = moov(0L)
    val mdatPayloadOffset = ftyp.length.toLong + moov0.length.toLong + 8L
    val moovFinal = moov(mdatPayloadOffset)
    require(moovFinal.length == moov0.length, "moov size must be offset-independent")

    val payload = new Array[Byte]((nFrames.toLong * sampleSize).toInt)
    var i = 0
    while (i < payload.length) {
      payload(i) = (ImageCodec.mix(mediaId * 31L + i) & 0xffL).toByte
      i += 1
    }
    val mdat = box("mdat")(_.raw(payload))

    val out = new ByteArrayOutputStream()
    out.write(ftyp); out.write(moovFinal); out.write(mdat)
    out.toByteArray
  }
}
