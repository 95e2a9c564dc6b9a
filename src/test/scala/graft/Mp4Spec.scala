package graft

import java.io.IOException

import graft.multimodal.Mp4Codec

import org.scalatest.funsuite.AnyFunSuite

/** MP4 container-structure codec: synthesize → parse round-trips exactly,
  * tick arithmetic is integer-exact by construction, and every malformed
  * shape fails through the IOException channel (the Grib2 discipline) —
  * never a silent wrong decode. Pure byte-level tests, no Spark session.
  */
class Mp4Spec extends AnyFunSuite {

  private def meta(id: Long, n: Int, w: Int = 320, h: Int = 240) =
    Mp4Codec.parse(Mp4Codec.synthesize(id, n, w, h))

  test("round-trip: parse recovers the exact frame count and dims for every shape variant") {
    // ids chosen to cover: mvhd v1 (id%7==0), VFR stts (id%5==0), audio
    // trak present (even) / absent (odd), each media timescale (mix-derived)
    for (id <- 0L to 40L) {
      val n = 2 + (id % 7).toInt
      val m = meta(id, n)
      assert(m.videoFrames === n.toLong, s"id=$id")
      assert(m.width === 320 && m.height === 240, s"id=$id")
      assert(m.majorBrand === "isom")
      assert(m.nTracks === (if (id % 2 == 0) 2 else 1), s"id=$id")
      assert(m.mvhdVersion === (if (id % 7 == 0) 1 else 0), s"id=$id")
      assert(m.movieTimescale === 600L)
      assert(m.videoTimescale > 0)
      // stsz total must equal the mdat payload (the parser cross-checks;
      // assert it surfaced too)
      assert(m.sampleBytes === m.mdatBytes, s"id=$id")
    }
  }

  test("tick arithmetic is integer-exact: movie duration * mediaTs == video duration * movieTs") {
    for (id <- 0L to 40L) {
      val m = meta(id, 2 + (id % 7).toInt)
      // exact cross-timescale identity — no rounding anywhere in the container
      assert(m.movieDurationTicks * m.videoTimescale ===
        m.videoDurationTicks * m.movieTimescale, s"id=$id")
    }
  }

  test("variable-frame-rate stts (two runs) still sums to the mdhd duration") {
    // id 5: VFR (id%5==0, n>=3) — parse would fail on any stts/mdhd
    // disagreement, so a successful parse IS the assertion; pin the split
    val m = meta(5L, 7)
    assert(m.videoFrames === 7L)
    assert(m.videoDurationTicks % m.videoFrames !== 0L,
      "VFR: total ticks must NOT be frames * one uniform delta")
  }

  private def expectFail(bytes: Array[Byte]): IOException =
    intercept[IOException](Mp4Codec.parse(bytes))

  test("fail-fast: truncated file, empty file, garbage tail") {
    val good = Mp4Codec.synthesize(3L, 5, 64, 64)
    assert(Mp4Codec.parse(good).videoFrames === 5L)
    expectFail(good.take(good.length / 2))
    expectFail(good.take(7)) // shorter than one box header
    expectFail(Array.emptyByteArray)
    // trailing bytes that are not a valid box header
    expectFail(good ++ Array[Byte](1, 2, 3))
  }

  test("fail-fast: file must start with ftyp and contain moov") {
    val good = Mp4Codec.synthesize(4L, 3, 64, 64)
    // strip the ftyp box: first box becomes moov → "does not start with ftyp"
    val ftypLen = ((good(0) & 0xff) << 24) | ((good(1) & 0xff) << 16) |
      ((good(2) & 0xff) << 8) | (good(3) & 0xff)
    val e1 = expectFail(good.drop(ftypLen))
    assert(e1.getMessage.contains("ftyp"))
    // ftyp + mdat only (moov removed): find the moov box and excise it
    val moovStart = indexOfBox(good, "moov")
    val moovLen = beU32(good, moovStart)
    val e2 = expectFail(good.take(moovStart) ++ good.drop(moovStart + moovLen))
    assert(e2.getMessage.contains("moov"))
  }

  test("fail-fast: a lying box size (overrun) is rejected, not read past") {
    val good = Mp4Codec.synthesize(6L, 4, 64, 64)
    val bad = good.clone()
    bad(0) = 0x7f.toByte // ftyp size becomes ~2 GB
    val e = expectFail(bad)
    assert(e.getMessage.contains("overruns"))
  }

  test("fail-fast: stsz/mdat disagreement is rejected (truncated media data)") {
    val good = Mp4Codec.synthesize(8L, 4, 64, 64)
    // shrink the mdat box: drop the last 16 payload bytes and patch its size
    val mdatStart = indexOfBox(good, "mdat")
    val mdatLen = beU32(good, mdatStart)
    val shrunk = new Array[Byte](good.length - 16)
    System.arraycopy(good, 0, shrunk, 0, mdatStart)
    val newLen = mdatLen - 16
    shrunk(mdatStart) = (newLen >>> 24).toByte
    shrunk(mdatStart + 1) = (newLen >>> 16).toByte
    shrunk(mdatStart + 2) = (newLen >>> 8).toByte
    shrunk(mdatStart + 3) = newLen.toByte
    System.arraycopy(good, mdatStart + 4, shrunk, mdatStart + 4, newLen - 4)
    val e = expectFail(shrunk)
    assert(e.getMessage.contains("stsz total"))
  }

  test("fail-fast: stts entry count overrunning its box is rejected") {
    val good = Mp4Codec.synthesize(9L, 4, 64, 64)
    val stts = indexOfBox(good, "stts")
    val bad = good.clone()
    // entry count field sits at stts payload + 4 (after version/flags)
    bad(stts + 8 + 4) = 0x7f.toByte
    val e = expectFail(bad)
    assert(e.getMessage.contains("stts"))
  }

  test("deterministic: same id, same bytes") {
    assert(Mp4Codec.synthesize(12L, 6, 128, 96)
      .sameElements(Mp4Codec.synthesize(12L, 6, 128, 96)))
  }

  test("parseFrames: timestamps are exact stts prefix sums; count and total match the meta") {
    for (id <- 0L to 40L) {
      val n = 2 + (id % 7).toInt
      val bytes = Mp4Codec.synthesize(id, n, 64, 64)
      val m = Mp4Codec.parse(bytes)
      val fr = Mp4Codec.parseFrames(bytes)
      assert(fr.length === n, s"id=$id")
      assert(fr.map(_.sampleNo) === (1L to n.toLong), s"id=$id")
      // decode times = running sum of the durations before each sample
      assert(fr.head.startTicks === 0L, s"id=$id")
      fr.sliding(2).foreach { case Seq(a, b) =>
        assert(b.startTicks === a.startTicks + a.durTicks, s"id=$id")
      }
      assert(fr.map(_.durTicks).sum === m.videoDurationTicks, s"id=$id")
      // VFR shape (id%5==0, n>=3): the second half runs at twice the delta
      if (id % 5 == 0 && n >= 3)
        assert(fr.last.durTicks === 2 * fr.head.durTicks, s"id=$id")
    }
  }

  test("parseFrames: stss sync flags — GOP pattern when present, all-sync when absent") {
    for (id <- 0L to 40L) {
      val n = 2 + (id % 7).toInt
      val fr = Mp4Codec.parseFrames(Mp4Codec.synthesize(id, n, 64, 64))
      if (id % 3 == 0) assert(fr.forall(_.sync), s"id=$id: absent stss = all sync")
      else {
        assert(fr.head.sync, s"id=$id: sample 1 must be sync")
        val syncNos = fr.filter(_.sync).map(_.sampleNo)
        val gaps = syncNos.sliding(2).collect { case Seq(a, b) => b - a }.toSeq
        assert(gaps.distinct.lengthIs <= 1, s"id=$id: GOP spacing must be regular")
        // gop >= 2, so with n >= 2 frames at least one sample is non-sync
        assert(fr.exists(!_.sync), s"id=$id")
      }
    }
    // both shapes occur across the id range (the selection policy needs both)
    val anyNonSync = (0L to 40L).exists { id =>
      Mp4Codec.parseFrames(Mp4Codec.synthesize(id, 8, 64, 64)).exists(!_.sync)
    }
    assert(anyNonSync, "no id produced a sparse sync table")
  }

  test("fail-fast: stss naming a sample past the stts count is rejected") {
    // pick an id whose container HAS an stss box (id%3!=0)
    val good = Mp4Codec.synthesize(1L, 4, 64, 64)
    val stss = indexOfBox(good, "stss")
    assert(stss > 0, "fixture must carry an stss box")
    val n = beU32(good, stss + 8 + 4)
    assert(n >= 1)
    // overwrite the LAST entry with sample number 99 (> 4 frames)
    val lastEntry = stss + 8 + 8 + (n - 1) * 4
    val bad = good.clone()
    bad(lastEntry) = 0; bad(lastEntry + 1) = 0; bad(lastEntry + 2) = 0
    bad(lastEntry + 3) = 99.toByte
    val e = expectFail(bad)
    assert(e.getMessage.contains("stss"), e.getMessage)
  }

  test("fail-fast: non-increasing stss sample numbers are rejected") {
    val good = Mp4Codec.synthesize(1L, 8, 64, 64)
    val stss = indexOfBox(good, "stss")
    val n = beU32(good, stss + 8 + 4)
    assume(n >= 2, "need two stss entries to invert")
    val e1 = stss + 8 + 8
    val bad = good.clone()
    // copy entry 1 over entry 2 → duplicate (not strictly increasing)
    System.arraycopy(good, e1, bad, e1 + 4, 4)
    val e = expectFail(bad)
    assert(e.getMessage.contains("strictly increasing"), e.getMessage)
  }

  private def beU32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Byte index of the first box whose fourcc is `cc` (header start). */
  private def indexOfBox(b: Array[Byte], cc: String): Int = {
    val pat = cc.getBytes("US-ASCII")
    var i = 4
    while (i + 4 <= b.length) {
      if (b(i) == pat(0) && b(i + 1) == pat(1) && b(i + 2) == pat(2) && b(i + 3) == pat(3))
        return i - 4
      i += 1
    }
    fail(s"box $cc not found")
  }
}
