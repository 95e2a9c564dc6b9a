package graft

import java.io.IOException

import graft.multimodal.WebmCodec

import org.scalatest.funsuite.AnyFunSuite

/** WebM/Matroska (EBML) container codec: synthesize → parse round-trips
  * exactly, block accounting is integer-exact (1 ms timestamp grid), and
  * malformed EBML fails through the IOException channel. Byte-level, no
  * Spark session.
  */
class WebmSpec extends AnyFunSuite {

  private def meta(id: Long, n: Int, w: Int = 320, h: Int = 240) =
    WebmCodec.parse(WebmCodec.synthesize(id, n, w, h))

  test("round-trip: frame count, dims, track inventory across shape variants") {
    for (id <- 0L to 40L) {
      val n = 2 + (id % 7).toInt
      val m = meta(id, n)
      assert(m.videoBlocks === n.toLong, s"id=$id")
      assert(m.pixelWidth === 320 && m.pixelHeight === 240, s"id=$id")
      assert(m.docType === "webm")
      assert(m.nTracks === (if (id % 2 != 0) 2 else 1), s"id=$id")
      assert(m.videoTrackNumber === 1L)
      assert(Set("V_VP8", "V_VP9", "V_AV1").contains(m.codecId), s"id=$id")
      assert(m.timestampScaleNs === 1000000L)
      assert(m.nClusters >= 1 && m.nClusters <= 3, s"id=$id")
      // duration covers every block with exactly one trailing frame period:
      // durationTicks = nFrames * spacing and blocks sit at k * spacing
      assert(m.durationTicks % m.videoBlocks === 0L, s"id=$id")
      assert(m.keyframeBlocks >= 1L && m.keyframeBlocks <= m.videoBlocks, s"id=$id")
    }
  }

  test("keyframe cadence: every id=0 block pattern starts with a keyframe") {
    // block 0 satisfies k % keyEvery == 0 for every keyEvery
    for (id <- 0L to 10L) {
      val m = meta(id, 6)
      assert(m.keyframeBlocks >= 1L, s"id=$id must flag block 0 as keyframe")
    }
  }

  private def expectFail(bytes: Array[Byte]): IOException =
    intercept[IOException](WebmCodec.parse(bytes))

  test("fail-fast: truncated, empty, garbage tail") {
    val good = WebmCodec.synthesize(3L, 5, 64, 64)
    assert(WebmCodec.parse(good).videoBlocks === 5L)
    expectFail(good.take(good.length / 2))
    expectFail(good.take(3))
    expectFail(Array.emptyByteArray)
    expectFail(good ++ Array[Byte](0x00, 0x01)) // 0x00 first byte: VINT > 8 bytes
  }

  test("fail-fast: must start with an EBML header carrying a webm/matroska DocType") {
    val good = WebmCodec.synthesize(4L, 3, 64, 64)
    // flip the EBML magic's last byte: first element id is no longer 0x1A45DFA3
    val bad = good.clone()
    bad(3) = 0x42.toByte
    expectFail(bad)
    // corrupt the DocType string "webm" -> "xebm"
    val idx = indexOf(good, "webm".getBytes("US-ASCII"))
    assert(idx > 0)
    val badDoc = good.clone()
    badDoc(idx) = 'x'.toByte
    val e = expectFail(badDoc)
    assert(e.getMessage.contains("DocType"))
  }

  test("fail-fast: an element overrunning its parent is rejected") {
    val good = WebmCodec.synthesize(6L, 4, 64, 64)
    // the EBML header's size byte: inflate it past EOF. Header is small, so
    // its size is a 1-byte VINT at offset 4 (after the 4-byte magic).
    val bad = good.clone()
    bad(4) = 0xfe.toByte // 0x80|0x7e = claims 126 bytes of header payload
    val e = expectFail(bad)
    assert(e.getMessage.contains("overrun"))
  }

  test("fail-fast: a SimpleBlock naming an undeclared track is rejected") {
    val good = WebmCodec.synthesize(8L, 4, 64, 64) // even id → video track only
    // locate the FIRST SimpleBlock's track VINT: element id 0xa3, a 1–2
    // byte size VINT, then the block header 0x81 (track 1), rel-ts 00 00
    // (first block of its cluster), keyframe flag 0x80
    var found = -1
    var i = 0
    while (found < 0 && i + 6 < good.length) {
      if ((good(i) & 0xff) == 0xa3) {
        Seq(1, 2).foreach { sz =>
          val t = i + 1 + sz
          if (found < 0 && t + 3 < good.length && (good(t) & 0xff) == 0x81 &&
              good(t + 1) == 0 && good(t + 2) == 0 && (good(t + 3) & 0xff) == 0x80)
            found = t
        }
      }
      i += 1
    }
    assert(found > 0)
    val bad = good.clone()
    bad(found) = 0x83.toByte // track 3
    val e = expectFail(bad)
    assert(e.getMessage.contains("undeclared track"))
  }

  test("fail-fast: Duration must cover the last block timestamp") {
    val good = WebmCodec.synthesize(9L, 4, 64, 64)
    // Duration is the only 8-byte float element under Info (id 0x4489);
    // zero it out — 0.0 cannot cover block timestamps
    val idx = indexOf(good, Array(0x44.toByte, 0x89.toByte))
    assert(idx > 0)
    val bad = good.clone()
    // element: 44 89 88 <8 bytes double> — overwrite payload with 0.0
    (0 until 8).foreach(i => bad(idx + 3 + i) = 0)
    val e = expectFail(bad)
    assert(e.getMessage.contains("Duration"))
  }

  test("deterministic: same id, same bytes") {
    assert(WebmCodec.synthesize(12L, 6, 128, 96)
      .sameElements(WebmCodec.synthesize(12L, 6, 128, 96)))
  }

  test("parseBlocks: stream order, exact cross-cluster ticks, flags match the census") {
    for (id <- 0L to 30L) {
      val n = 2 + (id % 7).toInt
      val bytes = WebmCodec.synthesize(id, n, 64, 64)
      val m = WebmCodec.parse(bytes)
      val blocks = WebmCodec.parseBlocks(bytes)
      assert(blocks.length === n, s"id=$id")
      assert(blocks.map(_.blockNo) === (1L to n.toLong), s"id=$id")
      // absolute ticks are uniform at the synthesizer's spacing EVEN across
      // cluster boundaries (Cluster Timestamp + s16 relative must compose)
      val spacing = if (n >= 2) blocks(1).ticks - blocks(0).ticks else 0L
      assert(blocks.head.ticks === 0L, s"id=$id")
      blocks.sliding(2).foreach { case Seq(a, b) =>
        assert(b.ticks - a.ticks === spacing, s"id=$id: uneven block spacing")
      }
      assert(blocks.last.ticks < m.durationTicks, s"id=$id")
      // per-block flags must sum to exactly the parse's keyframe census,
      // and block 1 is always a keyframe (the seek plans rely on it)
      assert(blocks.count(_.keyframe).toLong === m.keyframeBlocks, s"id=$id")
      assert(blocks.head.keyframe, s"id=$id")
    }
  }

  /** First index of `pat` in `b`. */
  private def indexOf(b: Array[Byte], pat: Array[Byte]): Int = {
    var i = 0
    while (i + pat.length <= b.length) {
      var j = 0
      while (j < pat.length && b(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i += 1
    }
    -1
  }
}
