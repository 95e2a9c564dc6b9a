package graft.sources

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import java.time.{LocalDateTime, ZoneOffset}

import scala.collection.mutable.ArrayBuffer

/** Pure-Scala GRIB2 codec for the message shapes the reference ingests
  * (WMO FM 92 GRIB Edition 2; reference decodes via pygrib/ecCodes —
  * `grib2/adapters/cams_adapter.py:9-59`, `ecmwf_adapter.py:10-61`,
  * `docs/ADR/002-grib-library.md`):
  *
  *  - Grid Definition Template 3.0 — regular latitude/longitude grid
  *  - Product Definition Template 4.0 (analysis/forecast at a horizontal
  *    level: ECMWF `2t`/`2d`) and 4.40 (atmospheric chemical constituents:
  *    CAMS `constituentType` 40008 pm10 / 40009 pm2p5)
  *  - Data Representation Template 5.0 — simple packing
  *    `value = (R + X·2^E) / 10^D`, no bitmap (section 6 indicator 255)
  *
  * Both directions are implemented: `encode` produces spec-conformant
  * binary messages (the test-fixture generator — this environment has no
  * ecCodes to produce files), `decode` parses any message within the
  * template subset above. Grib2Spec round-trips through both and pins the
  * reference's documented prime-meridian longitude bug (grids spanning
  * 335°E→45°E must yield longitudes in [-25°, 45°), not [-335°, 45°)).
  *
  * Binary conventions (GRIB2 §92.1): big-endian octets, sign-magnitude
  * negatives (high bit = sign) for scale factors and coordinates, bit
  * streams packed MSB-first across octet boundaries.
  */
object Grib2 {

  // ── data model ─────────────────────────────────────────────────────────

  /** Regular lat/lon grid, +i (west→east) / −j (north→south) scanning. */
  final case class GridSpec(ni: Int, nj: Int,
      lat1Deg: Double, lon1Deg: Double, dLatDeg: Double, dLonDeg: Double) {
    require(ni > 0 && nj > 0, s"empty grid $ni x $nj")
    def numPoints: Int = ni * nj
    def lat2Deg: Double = lat1Deg - (nj - 1) * dLatDeg
    def lon2Deg: Double = (lon1Deg + (ni - 1) * dLonDeg) % 360.0
  }

  sealed trait Product
  /** PDT 4.0 — e.g. ECMWF 2 m temperature (category 0, number 0) and
    * dewpoint (category 0, number 6).
    */
  final case class Meteo(category: Int, number: Int) extends Product
  /** PDT 4.40 — CAMS chemical constituent (40008 = pm10, 40009 = pm2p5). */
  final case class Chemical(constituentType: Int) extends Product

  final case class Decoded(
      discipline: Int,
      product: Product,
      refTime: LocalDateTime,
      forecastHours: Int,
      grid: GridSpec,
      values: Array[Double]) {
    def validTime: Timestamp =
      Timestamp.from(refTime.plusHours(forecastHours.toLong).toInstant(ZoneOffset.UTC))
  }

  // ── encoding ───────────────────────────────────────────────────────────

  private final class Writer {
    val buf = new ArrayBuffer[Byte]()
    def u8(v: Int): Unit = buf += (v & 0xff).toByte
    def u16(v: Int): Unit = { u8(v >>> 8); u8(v) }
    def u32(v: Long): Unit = { u8((v >>> 24).toInt); u8((v >>> 16).toInt); u8((v >>> 8).toInt); u8(v.toInt) }
    def u64(v: Long): Unit = { u32(v >>> 32); u32(v & 0xffffffffL) }
    def f32(v: Float): Unit = u32(java.lang.Float.floatToIntBits(v) & 0xffffffffL)
    /** Sign-magnitude 16-bit (GRIB2 negative convention). */
    def sm16(v: Int): Unit = u16(if (v < 0) 0x8000 | -v else v)
    /** Sign-magnitude 32-bit. */
    def sm32(v: Long): Unit = u32(if (v < 0) 0x80000000L | -v else v)
  }

  private def microDeg(d: Double): Long = Math.round(d * 1e6)

  /** Simple-packing parameters chosen for `nbits`: binary scale E is the
    * smallest integer with `(max−min)/2^E ≤ 2^nbits − 1` (negative E =
    * sub-unit precision), reference value R is the minimum as float32 (the
    * stored width — using the f32-rounded value in X keeps the error one
    * quantum).
    */
  private[sources] def packingParams(values: Array[Double], nbits: Int): (Float, Int) = {
    val min = values.min
    val max = values.max
    // R must not exceed the true minimum after float32 rounding — if the
    // cast rounds UP, (min − R) goes negative and the packed value
    // underflows. Step down one ulp in that case.
    var r = min.toFloat
    if (r.toDouble > min) r = Math.nextDown(r)
    val range = max - r.toDouble
    val maxX = (1L << nbits) - 1
    var e =
      if (range <= 0) 0
      else math.ceil(math.log(range / maxX) / math.log(2.0)).toInt
    // guard against log/ceil float error leaving range/2^e a hair over maxX
    if (range > 0 && Math.round(range / math.pow(2.0, e)) > maxX) e += 1
    (r, e)
  }

  /** Encode one message. `values` are row-major (lat rows north→south, lon
    * west→east within a row), `grid.numPoints` long.
    */
  def encode(product: Product, grid: GridSpec, refTime: LocalDateTime,
      forecastHours: Int, values: Array[Double], nbits: Int = 16): Array[Byte] = {
    require(values.length == grid.numPoints,
      s"${values.length} values for ${grid.numPoints}-point grid")
    require(nbits >= 1 && nbits <= 32, s"nbits out of (0,32]: $nbits")
    val discipline = 0 // meteorological products (incl. chemical constituents)

    val w = new Writer

    // Section 1 — identification
    val s1 = new Writer
    s1.u32(21); s1.u8(1)
    s1.u16(98) // originating centre: ECMWF
    s1.u16(0); s1.u8(2); s1.u8(1)
    s1.u8(1) // significance of reference time: start of forecast
    s1.u16(refTime.getYear); s1.u8(refTime.getMonthValue); s1.u8(refTime.getDayOfMonth)
    s1.u8(refTime.getHour); s1.u8(refTime.getMinute); s1.u8(refTime.getSecond)
    s1.u8(0) // production status: operational
    s1.u8(1) // type of data: forecast

    // Section 3 — grid definition, template 3.0
    val s3 = new Writer
    s3.u32(72); s3.u8(3)
    s3.u8(0) // source: specified in template
    s3.u32(grid.numPoints)
    s3.u8(0); s3.u8(0) // no optional list
    s3.u16(0) // template 3.0: regular lat/lon
    s3.u8(6) // shape of earth: spherical r=6371229 m
    s3.u8(0xff); s3.u32(0xffffffffL) // radius scale/value: missing
    s3.u8(0xff); s3.u32(0xffffffffL) // major axis: missing
    s3.u8(0xff); s3.u32(0xffffffffL) // minor axis: missing
    s3.u32(grid.ni); s3.u32(grid.nj)
    s3.u32(0) // basic angle: 0 → micro-degree units
    s3.u32(0xffffffffL) // subdivisions: missing
    s3.sm32(microDeg(grid.lat1Deg))
    s3.u32(microDeg(((grid.lon1Deg % 360.0) + 360.0) % 360.0))
    s3.u8(0x30) // resolution flags: Di and Dj given
    s3.sm32(microDeg(grid.lat2Deg))
    s3.u32(microDeg(((grid.lon2Deg % 360.0) + 360.0) % 360.0))
    s3.u32(microDeg(grid.dLonDeg)) // Di — i direction increment (longitude)
    s3.u32(microDeg(grid.dLatDeg)) // Dj
    s3.u8(0x00) // scanning mode: +i, −j, row-major

    // Section 4 — product definition, template 4.0 or 4.40
    val s4 = new Writer
    val (templateNo, cat, num, constituent) = product match {
      case Meteo(c, n)   => (0, c, n, None)
      case Chemical(ct)  => (40, 20, 0, Some(ct)) // category 20: chemical constituents, number 0: mass density
    }
    s4.u32(if (constituent.isEmpty) 34 else 36); s4.u8(4)
    s4.u16(0) // no coordinate values
    s4.u16(templateNo)
    s4.u8(cat); s4.u8(num)
    constituent.foreach(s4.u16)
    s4.u8(2) // generating process: forecast
    s4.u8(255); s4.u8(255) // background/process id: missing
    s4.u16(0); s4.u8(0) // data cutoff
    s4.u8(1) // time unit: hour
    s4.u32(forecastHours)
    s4.u8(103); s4.u8(0); s4.u32(2) // first surface: 2 m above ground
    s4.u8(255); s4.u8(0xff); s4.u32(0xffffffffL) // second surface: missing

    // Section 5 — data representation, template 5.0 (simple packing)
    val (r, e) = packingParams(values, nbits)
    val s5 = new Writer
    s5.u32(21); s5.u8(5)
    s5.u32(values.length)
    s5.u16(0) // template 5.0
    s5.f32(r)
    s5.sm16(e)
    s5.sm16(0) // decimal scale D = 0
    s5.u8(nbits)
    s5.u8(0) // values are floating-point

    // Section 6 — bitmap: none
    val s6 = new Writer
    s6.u32(6); s6.u8(6); s6.u8(255)

    // Section 7 — packed data, MSB-first bit stream
    val dataBytes = (values.length.toLong * nbits + 7) / 8
    val s7 = new Writer
    s7.u32(5 + dataBytes); s7.u8(7)
    val scale = math.pow(2.0, -e)
    var acc = 0L
    var accBits = 0
    values.foreach { v =>
      val x = Math.round((v - r.toDouble) * scale)
      require(x >= 0 && (nbits == 32 || x < (1L << nbits)), s"packed value out of range: $x")
      acc = (acc << nbits) | x
      accBits += nbits
      while (accBits >= 8) {
        accBits -= 8
        s7.u8(((acc >>> accBits) & 0xff).toInt)
      }
    }
    if (accBits > 0) s7.u8(((acc << (8 - accBits)) & 0xff).toInt)

    // Section 0 + body + section 8
    val bodyLen = s1.buf.length + s3.buf.length + s4.buf.length +
      s5.buf.length + s6.buf.length + s7.buf.length
    w.buf ++= "GRIB".getBytes("ASCII")
    w.u16(0xffff) // reserved
    w.u8(discipline)
    w.u8(2) // edition
    w.u64(16L + bodyLen + 4L)
    w.buf ++= s1.buf; w.buf ++= s3.buf; w.buf ++= s4.buf
    w.buf ++= s5.buf; w.buf ++= s6.buf; w.buf ++= s7.buf
    w.buf ++= "7777".getBytes("ASCII")
    w.buf.toArray
  }

  // ── decoding ───────────────────────────────────────────────────────────

  private final class Reader(bytes: Array[Byte], var pos: Int) {
    def u8(): Int = { val v = bytes(pos) & 0xff; pos += 1; v }
    def u16(): Int = (u8() << 8) | u8()
    def u32(): Long = (u16().toLong << 16) | u16()
    def u64(): Long = (u32() << 32) | u32()
    def f32(): Float = java.lang.Float.intBitsToFloat(u32().toInt)
    def sm16(): Int = { val v = u16(); if ((v & 0x8000) != 0) -(v & 0x7fff) else v }
    def sm32(): Long = { val v = u32(); if ((v & 0x80000000L) != 0) -(v & 0x7fffffffL) else v }
    def skip(n: Int): Unit = pos += n
  }

  private def fail(msg: String): Nothing =
    throw new java.io.IOException(s"GRIB2 decode: $msg")

  /** Decode every message in the byte array (GRIB files concatenate
    * messages back to back).
    */
  def decode(bytes: Array[Byte]): Seq[Decoded] = {
    val out = ArrayBuffer[Decoded]()
    var off = 0
    while (off + 16 <= bytes.length) {
      if (!(bytes(off) == 'G' && bytes(off + 1) == 'R' &&
            bytes(off + 2) == 'I' && bytes(off + 3) == 'B'))
        fail(s"bad magic at offset $off")
      val r = new Reader(bytes, off + 4)
      r.skip(2)
      val discipline = r.u8()
      val edition = r.u8()
      if (edition != 2) fail(s"unsupported edition $edition")
      val totalLen = r.u64()
      out += decodeBody(bytes, off, totalLen, discipline)
      off += totalLen.toInt
    }
    if (out.isEmpty) fail("no GRIB messages found")
    out.toSeq
  }

  private def decodeBody(bytes: Array[Byte], msgOff: Int, totalLen: Long,
      discipline: Int): Decoded = {
    var refTime: LocalDateTime = null
    var grid: GridSpec = null
    var product: Product = null
    var forecastHours = 0
    var rRef = 0f
    var eScale = 0
    var dScale = 0
    var nbits = 0
    var numValues = 0
    var values: Array[Double] = null
    var bitmapIndicator = 255

    var pos = msgOff + 16
    val end = msgOff + totalLen.toInt - 4 // trailing "7777"
    while (pos < end) {
      val r = new Reader(bytes, pos)
      val secLen = r.u32().toInt
      val secNum = r.u8()
      secNum match {
        case 1 =>
          r.skip(2 + 2 + 1 + 1 + 1) // centre, subcentre, tables, local tables, significance
          val y = r.u16(); val mo = r.u8(); val d = r.u8()
          val h = r.u8(); val mi = r.u8(); val s = r.u8()
          refTime = LocalDateTime.of(y, mo, d, h, mi, s)
        case 2 => // local use — skip
        case 3 =>
          r.skip(1) // source
          val nPoints = r.u32().toInt
          r.skip(1 + 1)
          val template = r.u16()
          if (template != 0) fail(s"unsupported grid template 3.$template")
          r.skip(1 + 5 + 5 + 5) // earth shape + radius + axes
          val ni = r.u32().toInt
          val nj = r.u32().toInt
          val basicAngle = r.u32()
          // only basic angle 0 (micro-degree units) decodes faithfully —
          // accepting other values and still dividing by 1e6 would produce
          // silently wrong coordinates
          if (basicAngle != 0) fail(s"unsupported basic angle $basicAngle")
          r.skip(4) // subdivisions
          val lat1 = r.sm32() / 1e6
          val lon1 = r.u32() / 1e6
          r.skip(1) // resolution flags
          r.skip(4 + 4) // lat2/lon2 (derived from increments)
          val di = r.u32() / 1e6
          val dj = r.u32() / 1e6
          val scan = r.u8()
          if ((scan & 0xf0) != 0) fail(f"unsupported scanning mode 0x$scan%02x")
          if (ni.toLong * nj != nPoints) fail(s"grid $ni x $nj != $nPoints points")
          grid = GridSpec(ni, nj, lat1, lon1, dj, di)
        case 4 =>
          r.skip(2) // NV
          val template = r.u16()
          val cat = r.u8()
          val num = r.u8()
          product = template match {
            case 0 => Meteo(cat, num)
            case 40 => Chemical(r.u16())
            case t => fail(s"unsupported product template 4.$t")
          }
          r.skip(1 + 1 + 1 + 2 + 1) // process ids + cutoff
          val timeUnit = r.u8()
          val ft = r.u32().toInt
          forecastHours = timeUnit match {
            case 0 => ft / 60 // minutes
            case 1 => ft // hours
            case 2 => ft * 24 // days
            case u => fail(s"unsupported time unit $u")
          }
        case 5 =>
          numValues = r.u32().toInt
          val template = r.u16()
          if (template != 0) fail(s"unsupported data representation 5.$template")
          rRef = r.f32()
          eScale = r.sm16()
          dScale = r.sm16()
          nbits = r.u8()
        case 6 =>
          bitmapIndicator = r.u8()
          if (bitmapIndicator != 255) fail(s"bitmaps not supported (indicator $bitmapIndicator)")
        case 7 =>
          if (nbits == 0) {
            values = Array.fill(numValues)(rRef.toDouble / math.pow(10.0, dScale))
          } else {
            val mul = math.pow(2.0, eScale)
            val div = math.pow(10.0, dScale)
            values = new Array[Double](numValues)
            var acc = 0L
            var accBits = 0
            var bi = r.pos
            var i = 0
            while (i < numValues) {
              while (accBits < nbits) {
                acc = (acc << 8) | (bytes(bi) & 0xffL)
                bi += 1
                accBits += 8
              }
              val x = (acc >>> (accBits - nbits)) & ((1L << nbits) - 1)
              accBits -= nbits
              values(i) = (rRef.toDouble + x * mul) / div
              i += 1
            }
          }
        case 8 => // end section reached via loop bound; not expected here
        case n => fail(s"unexpected section $n")
      }
      pos += secLen
    }
    if (refTime == null || grid == null || product == null || values == null)
      fail("incomplete message (missing section 1, 3, 4, or 7)")
    Decoded(discipline, product, refTime, forecastHours, grid, values)
  }

  // ── GribReader adapters (the reference's per-source adapter shape) ─────

  /** Lat/lon arrays for a decoded grid, row-major to match the values.
    * Longitudes are normalized to [−180, 180) HERE, at the decode boundary:
    * the reference's documented corruption bug (ADR 002) was exactly a
    * prime-meridian-crossing grid (335°E→45°E) surfacing as [−335°, 45°].
    */
  private def gridArrays(g: GridSpec): (Array[Double], Array[Double]) = {
    val lats = new Array[Double](g.numPoints)
    val lons = new Array[Double](g.numPoints)
    var idx = 0
    var j = 0
    while (j < g.nj) {
      val lat = g.lat1Deg - j * g.dLatDeg
      var i = 0
      while (i < g.ni) {
        lats(idx) = lat
        lons(idx) = Grib.normalizeLon(g.lon1Deg + i * g.dLonDeg)
        idx += 1
        i += 1
      }
      j += 1
    }
    (lats, lons)
  }

  private final case class DecodedMessage(
      variableName: String, unit: String, timestamp: Timestamp,
      values: Array[Double], lats: Array[Double], lons: Array[Double])
    extends GribMessage

  /** CAMS adapter: constituentType → variable name
    * (`cams_adapter.py:9-12`), unit "kg m-3" (mass density — the engine's canonical spelling, GridFunctions.kgM3ToUgM3).
    *
    * `openBytes` is the executor-side entry point: decoding is a pure
    * function of the payload, so streaming/batch ingestion decodes WHERE
    * THE BYTES LAND (e.g. a `binaryFile` stream) instead of funneling
    * files through the driver.
    */
  object CamsGrib2Reader extends GribReader with Serializable {
    val ConstituentNames: Map[Int, String] = Map(40008 -> "pm10", 40009 -> "pm2p5")

    def openBytes(bytes: Array[Byte]): Iterator[GribMessage] =
      decode(bytes).iterator.map { d =>
        val ct = d.product match {
          case Chemical(c) => c
          case p => fail(s"CAMS reader expects chemical constituents, got $p")
        }
        val name = ConstituentNames.getOrElse(ct, fail(s"unknown constituent $ct"))
        val (lats, lons) = gridArrays(d.grid)
        DecodedMessage(name, "kg m-3", d.validTime, d.values, lats, lons)
      }

    override def open(path: String): Iterator[GribMessage] =
      openBytes(Files.readAllBytes(Paths.get(path)))
  }

  /** ECMWF adapter: (category, number) → shortName → variable name
    * (`ecmwf_adapter.py:10-13`), unit K.
    */
  object EcmwfGrib2Reader extends GribReader with Serializable {
    val VariableNames: Map[(Int, Int), String] =
      Map((0, 0) -> "temperature", (0, 6) -> "dewpoint") // 2t, 2d

    def openBytes(bytes: Array[Byte]): Iterator[GribMessage] =
      decode(bytes).iterator.map { d =>
        val key = d.product match {
          case Meteo(c, n) => (c, n)
          case p => fail(s"ECMWF reader expects meteo products, got $p")
        }
        val name = VariableNames.getOrElse(key, fail(s"unknown parameter $key"))
        val (lats, lons) = gridArrays(d.grid)
        DecodedMessage(name, "K", d.validTime, d.values, lats, lons)
      }

    override def open(path: String): Iterator[GribMessage] =
      openBytes(Files.readAllBytes(Paths.get(path)))
  }
}
