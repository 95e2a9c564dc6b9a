package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, IOException}

import javax.imageio.ImageIO

/** Real JVM-native image codec — no external dependency: PNG encode/decode
  * via `javax.imageio` (in the JDK), features computed from actual pixels.
  *
  *   - decode: exact width/height from the decoded raster, mean luma as the
  *     ITU-R BT.601 integer weighting `(299R + 587G + 114B)/1000` averaged
  *     over every pixel, and a 64-bit AVERAGE HASH (aHash): average-pool the
  *     luma plane to 8×8 cells, set bit `cy*8+cx` when the cell mean exceeds
  *     the mean of the 64 cell means. aHash is the standard cheap perceptual
  *     signature: resolution-invariant (pooling commutes with block upscale)
  *     and local — k changed cells move the hash by ≤ k hamming bits.
  *   - encode: lossless PNG, so decode(encode(img)) recovers the exact
  *     pixels and every feature above is exact, not approximate.
  *
  * This replaces the former md5-slice stub codec: every m1–m6 media operator
  * now runs on real decoded pixels. (Audio/video frame DECODE would need
  * ffmpeg-class native libraries that do not exist here and stays out of
  * scope; those payloads still carry real PNG bytes and the image path is
  * fully real.)
  *
  * Everything is pure deterministic arithmetic — safe on executors, no AWT
  * rendering pipeline, no dither, no platform-dependent color management.
  */
object ImageCodec {

  // never spill ImageIO's stream cache to executor-local temp files
  ImageIO.setUseCache(false)

  final case class Decoded(
      width: Int,
      height: Int,
      meanLuma: Double,        // 0..255, exact BT.601 integer-weighted mean
      aHash: Long,             // 64-bit average hash, bit cy*8+cx
      cellMeans: Array[Double] // the 8×8 pooled luma plane (row-major, 64)
  )

  /** Lossless PNG encode. The JDK PNG writer emits no timestamp chunks, so
    * equal pixels encode to equal bytes — content hashes are stable.
    */
  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    if (!ImageIO.write(img, "png", bos))
      throw new IOException("no PNG writer available in this JVM")
    bos.toByteArray
  }

  /** Build a TYPE_INT_RGB image from a luma function (gray pixels). */
  def grayImage(w: Int, h: Int, luma: (Int, Int) => Int): BufferedImage = {
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = luma(x, y) & 0xff
        row(x) = (g << 16) | (g << 8) | g
        x += 1
      }
      img.setRGB(0, y, w, 1, row, 0, w)
      y += 1
    }
    img
  }

  /** Decode any ImageIO-supported payload (PNG/BMP/GIF/JPEG…) and compute
    * the real features (an animated GIF yields its FIRST frame — per-frame
    * features live in [[GifCodec.decodeFrames]]). Fails through IOException
    * on undecodable bytes — never returns garbage.
    */
  def decode(bytes: Array[Byte]): Decoded = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case e: Exception => throw new IOException(s"image decode failed: ${e.getMessage}", e) }
    if (img == null) throw new IOException("undecodable image payload (no ImageIO reader matched)")
    features(img)
  }

  /** The feature computation over an in-memory raster — shared by
    * [[decode]] and the per-frame GIF path, so a video frame and a still
    * carry the SAME luma/aHash definition.
    */
  def features(img: BufferedImage): Decoded = {
    val w = img.getWidth
    val h = img.getHeight
    // one pass over the raster: per-cell luma·1000 sums (exact integers)
    val cellSum = new Array[Long](64)
    val cellN = new Array[Long](64)
    var totalMilli = 0L
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      val cy = y * 8 / h // floor pooling: pixel rows [cy*h/8, …) per cell row
      var x = 0
      while (x < w) {
        val rgb = row(x)
        val lumaMilli = 299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)
        val c = cy * 8 + x * 8 / w
        cellSum(c) += lumaMilli
        cellN(c) += 1
        totalMilli += lumaMilli
        x += 1
      }
      y += 1
    }
    if (w < 8 || h < 8) {
      // merge-safe pooling for sub-8-pixel dimensions: re-pool over the
      // nearest-neighbor upscale to max(w,8) × max(h,8). Pooling commutes
      // with block upscale, so this is the SAME definition the normal path
      // computes when both dims are ≥ 8 — and no pooling cell is ever
      // empty, so a 3×5 thumbnail can no longer vote phantom 0-luma cells
      // into the aHash threshold (the mean luma above still averages the
      // actual pixels, not the upscale).
      java.util.Arrays.fill(cellSum, 0L)
      java.util.Arrays.fill(cellN, 0L)
      val upW = math.max(w, 8)
      val upH = math.max(h, 8)
      var uy = 0
      while (uy < upH) {
        val cy = uy * 8 / upH
        val srcY = uy * h / upH
        var ux = 0
        while (ux < upW) {
          val rgb = img.getRGB(ux * w / upW, srcY)
          val lumaMilli = 299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)
          val c = cy * 8 + ux * 8 / upW
          cellSum(c) += lumaMilli
          cellN(c) += 1
          ux += 1
        }
        uy += 1
      }
    }
    val cells = new Array[Double](64)
    var sumOfMeans = 0.0
    var i = 0
    while (i < 64) {
      cells(i) = cellSum(i).toDouble / (1000.0 * cellN(i)) // cellN ≥ 1 on both paths
      sumOfMeans += cells(i)
      i += 1
    }
    val threshold = sumOfMeans / 64.0
    var hash = 0L
    i = 0
    while (i < 64) {
      if (cells(i) > threshold) hash |= (1L << i)
      i += 1
    }
    Decoded(w, h, totalMilli.toDouble / (1000.0 * w * h), hash, cells)
  }

  /** Real resize: decode, nearest-neighbor resample (deterministic pure
    * arithmetic — no Graphics2D interpolation pipeline), lossless re-encode.
    */
  def resizePng(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bad target dimensions ${w}x$h")
    val src =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case e: Exception => throw new IOException(s"image decode failed: ${e.getMessage}", e) }
    if (src == null) throw new IOException("undecodable image payload (no ImageIO reader matched)")
    val sw = src.getWidth
    val sh = src.getHeight
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * sh / h).toInt
      var x = 0
      while (x < w) {
        row(x) = src.getRGB((x.toLong * sw / w).toInt, sy) & 0xffffff
        x += 1
      }
      out.setRGB(0, y, w, 1, row, 0, w)
      y += 1
    }
    encodePng(out)
  }

  // ---------------------------------------------------------------- corpus

  /** splitmix64 — the deterministic seed mixer used for corpus synthesis. */
  def mix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** The 8 per-axis base dimensions — one per 256-wide band, placed so the
    * per-member jitter (+0..56) never crosses a band boundary and every
    * dimension stays a multiple of 8 (pooling cells then align exactly with
    * painted pattern cells, making the aHash EXACTLY the pattern bits).
    */
  private val bandBases = Array(64, 192, 320, 448, 576, 704, 832, 960)

  /** Deterministic synthetic image: `mediaId % families` selects a family
    * pattern (an 8×8 two-level luma grid plus dimensions); the member index
    * adds in-band dimension jitter and flips 0–3 pattern cells. Members of
    * one family are therefore REAL near-duplicates: same aHash up to the
    * flipped cells (pairwise hamming ≤ 6), slightly different resolutions —
    * exactly the corpus shape the m4/m5/m6 media-dedup operators exist for.
    * PNG is lossless, so all of this survives encode→decode exactly.
    */
  /** One synthesized corpus member: the flipped family pattern, its
    * jittered dimensions, the two luma levels, and the seeds — `fseed`
    * drives family-stable traits (dimensions bands, audio rate/duration
    * bands), `mseed` member-level jitter (flips, in-band jitter, frame
    * mutations).
    */
  private[multimodal] final case class Member(
      pattern: Array[Int], w: Int, h: Int, lo: Int, hi: Int,
      fseed: Long, mseed: Long)

  private[multimodal] def member(mediaId: Long, families: Int): Member = {
    val family = java.lang.Math.floorMod(mediaId, families.toLong)
    val fseed = mix(family * 0x100000001b3L + 17L)
    val mseed = mix(mediaId * 0xc2b2ae3d27d4eb4fL + 71L)
    val lo = 8 + java.lang.Math.floorMod(mix(fseed + 1), 80L).toInt            // 8..87
    val hi = 168 + java.lang.Math.floorMod(mix(fseed + 2), 80L).toInt          // 168..247
    // 4..60 high cells: with at least FOUR cells of each level, the ≤3
    // member flips can never collapse the pattern to uniform — a uniform
    // member would aHash to 0 while its siblings keep ~nHigh set bits,
    // breaking the family hamming ≤ 6 invariant the corpus exists for
    val nHigh = 4 + java.lang.Math.floorMod(mix(fseed + 3), 57L).toInt         // 4..60 high cells
    // exact count via a seeded shuffle of the 64 cell indices (a
    // probabilistic per-cell coin could underrun the 4-cell floor)
    val order = (0 until 64).sortBy(k => mix(fseed + 16 + k))
    val pattern = new Array[Int](64)
    order.zipWithIndex.foreach { case (cell, rank) =>
      pattern(cell) = if (rank < nHigh) hi else lo
    }
    // member noise: flip 0..3 cells (low<->high)
    val nFlips = java.lang.Math.floorMod(mix(mseed + 4), 4L).toInt
    var f = 0
    while (f < nFlips) {
      val c = java.lang.Math.floorMod(mix(mseed + 32 + f), 64L).toInt
      pattern(c) = if (pattern(c) == hi) lo else hi
      f += 1
    }
    val w = bandBases(java.lang.Math.floorMod(mix(fseed + 5), 8L).toInt) +
      java.lang.Math.floorMod(mix(mseed + 6), 8L).toInt * 8
    val h = bandBases(java.lang.Math.floorMod(mix(fseed + 7), 8L).toInt) +
      java.lang.Math.floorMod(mix(mseed + 8), 8L).toInt * 8
    Member(pattern, w, h, lo, hi, fseed, mseed)
  }

  def synthesize(mediaId: Long, families: Int = 97): Array[Byte] = {
    val m = member(mediaId, families)
    encodePng(grayImage(m.w, m.h, (x, y) => m.pattern((y * 8 / m.h) * 8 + (x * 8 / m.w))))
  }
}
