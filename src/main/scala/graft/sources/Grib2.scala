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
  *  - Data Representation Template 5.2 — complex packing (general group
  *    splitting: per-group reference + width, bit-packed group ref/width/
  *    length arrays each padded to whole octets)
  *  - Data Representation Template 5.41 — PNG packing: the scaled
  *    integers ride a lossless PNG raster (grayscale 8/16-bit or RGB
  *    24-bit), decoded with the JDK's own `javax.imageio` codec; 5.40
  *    (JPEG2000) has no JDK codec and stays unsupported-fail-fast
  *  - Data Representation Template 5.3 — complex packing with spatial
  *    differencing (order 1 or 2): the scaled integers are differenced,
  *    the overall minimum of the differences and the initial value(s) ride
  *    in section 7 as sign-magnitude extra descriptors, and the residual
  *    field group-packs far tighter on smooth fields. Real CAMS/ECMWF
  *    production files predominantly use 5.2/5.3 (the reference decodes
  *    them via ecCodes — `grib2/reader.py:36-37`).
  *  - Section-6 bitmaps (indicator 0): missing grid points decode as NaN
  *    (sea-masked land fields and friends); packing covers present points
  *    only, and the adapters drop missing points into the irregular-points
  *    form the reference's clip fallback models (`defs/assets.py:59-70`).
  *
  * Both directions are implemented: `encode`/`encodeComplex` produce
  * spec-conformant binary messages (the test-fixture generator — this
  * environment has no ecCodes to produce files), `decode` parses any
  * message within the template subset above. Grib2Spec round-trips through
  * both and pins the reference's documented prime-meridian longitude bug
  * (grids spanning 335°E→45°E must yield longitudes in [-25°, 45°), not
  * [-335°, 45°)).
  *
  * Binary conventions (GRIB2 §92.1): big-endian octets, sign-magnitude
  * negatives (high bit = sign) for scale factors and coordinates, bit
  * streams packed MSB-first across octet boundaries.
  */
object Grib2 {

  // ── data model ─────────────────────────────────────────────────────────

  /** Lambert conformal conic projection parameters (GDT 3.30): spherical
    * earth (shape 6, R = 6371229 m), secant cone through `latin1`/`latin2`,
    * central meridian `loV`, grid spacing `dxM`/`dyM` in metres true at
    * `laD`. `yPositive` mirrors scanning-mode bit 2: rows advance +y
    * (south→north, the NAM/HRRR convention) when set, −y otherwise.
    */
  final case class LambertSpec(laDDeg: Double, loVDeg: Double,
      latin1Deg: Double, latin2Deg: Double, dxM: Double, dyM: Double,
      yPositive: Boolean = false) {
    require(dxM > 0 && dyM > 0, s"bad grid spacing ${dxM}x$dyM")
    // |latin1+latin2| below a millidegree ⇒ cone constant n ≈ 0 and the
    // projection radii diverge — as degenerate as the exact-zero sum
    require(math.abs(latin1Deg) < 90 && math.abs(latin2Deg) < 90 &&
      math.abs(latin1Deg + latin2Deg) >= 1e-3,
      s"unsupported cone parallels $latin1Deg/$latin2Deg")
  }

  /** Polar stereographic projection parameters (GDT 3.20): spherical earth
    * (shape 6, R = 6371229 m), pole given by `southPole` (projection-centre
    * flag bit 1), central meridian `loV`, grid spacing `dxM`/`dyM` in
    * metres true at `laDDeg`. `yPositive` mirrors scanning-mode bit 2.
    */
  final case class PolarSpec(laDDeg: Double, loVDeg: Double,
      dxM: Double, dyM: Double, southPole: Boolean = false,
      yPositive: Boolean = false) {
    require(dxM > 0 && dyM > 0, s"bad grid spacing ${dxM}x$dyM")
    require(math.abs(laDDeg) <= 90, s"bad LaD $laDDeg")
    // LaD at the OPPOSITE pole degenerates the projection constant
    // c = R(1 ± sin LaD) to 0 and every radius diverges
    require(
      (if (southPole) 1.0 - math.sin(math.toRadians(laDDeg))
       else 1.0 + math.sin(math.toRadians(laDDeg))) >= 1e-6,
      s"unsupported LaD $laDDeg for ${if (southPole) "south" else "north"}-polar projection")
  }

  /** Mercator projection parameters (GDT 3.10): spherical earth (shape 6,
    * R = 6371229 m), grid spacing `dxM`/`dyM` in metres true at `laDDeg`
    * (the standard parallel — scale factor cos LaD). Mercator carries no
    * central-meridian parameter; the x origin anchors at the grid's first
    * point. `yPositive` mirrors scanning-mode bit 2. Orientation other
    * than equator-aligned (template octets 61-64 ≠ 0) is refused at
    * decode — a rotated Mercator has no faithful representation here.
    */
  final case class MercatorSpec(laDDeg: Double, dxM: Double, dyM: Double,
      yPositive: Boolean = false) {
    require(dxM > 0 && dyM > 0, s"bad grid spacing ${dxM}x$dyM")
    // cos LaD is the map scale: at the poles it vanishes and every metre
    // of grid spacing maps to unbounded degrees
    require(math.cos(math.toRadians(laDDeg)) >= 1e-6 && math.abs(laDDeg) <= 90,
      s"unsupported mercator LaD $laDDeg")
  }

  /** Lat/lon grid, +i (west→east) scanning. Three forms:
    *   - regular (GDT 3.0): rows at `lat1Deg − j·dLatDeg` (gaussianN = 0);
    *   - Gaussian (GDT 3.40): `gaussianN` parallels between pole and
    *     equator — row latitudes are the Gaussian latitudes (arcsin of the
    *     Legendre P₂ₙ roots), `gaussianStart` indexing the first row into
    *     the full north→south table (a non-global subset grid starts
    *     mid-table). Longitude spacing stays regular in both forms;
    *   - Lambert conformal (GDT 3.30): `lambert` carries the projection —
    *     points are regular in PROJECTED metres anchored at the first
    *     point `(lat1Deg, lon1Deg)`, and per-point lat/lon come from the
    *     inverse projection ([[Lcc]]).
    */
  final case class GridSpec(ni: Int, nj: Int,
      lat1Deg: Double, lon1Deg: Double, dLatDeg: Double, dLonDeg: Double,
      gaussianN: Int = 0, gaussianStart: Int = 0,
      lambert: Option[LambertSpec] = None,
      polar: Option[PolarSpec] = None,
      mercator: Option[MercatorSpec] = None) {
    require(ni > 0 && nj > 0, s"empty grid $ni x $nj")
    require(gaussianN >= 0 && gaussianStart >= 0, s"bad gaussian fields $gaussianN/$gaussianStart")
    require(gaussianN == 0 || gaussianStart + nj <= 2 * gaussianN,
      s"$nj rows from $gaussianStart overrun the ${2 * gaussianN} gaussian parallels")
    require(Seq(gaussianN > 0, lambert.isDefined, polar.isDefined,
        mercator.isDefined).count(identity) <= 1,
      "a grid carries at most one of: gaussian parallels, a lambert cone, a polar plane, a mercator cylinder")
    def isGaussian: Boolean = gaussianN > 0
    def isLambert: Boolean = lambert.isDefined
    def isPolar: Boolean = polar.isDefined
    def isMercator: Boolean = mercator.isDefined
    /** True for the grids whose points are regular in projected METRES
      * (3.30/3.20/3.10) rather than in degrees.
      */
    def isProjected: Boolean = isLambert || isPolar || isMercator
    def numPoints: Int = ni * nj
    /** Row latitudes north→south — the coordinate source for the lat/lon
      * forms (a projected grid has no shared row latitude; see [[Lcc]]/[[Pst]]).
      */
    def rowLats: Array[Double] = {
      require(!isProjected, "rowLats undefined for a projected grid (lat varies per point)")
      if (isGaussian) {
        val gl = gaussianLatitudes(gaussianN)
        java.util.Arrays.copyOfRange(gl, gaussianStart, gaussianStart + nj)
      } else Array.tabulate(nj)(j => lat1Deg - j * dLatDeg)
    }
    def lat2Deg: Double =
      if (isGaussian) rowLats(nj - 1) else lat1Deg - (nj - 1) * dLatDeg
    def lon2Deg: Double = (lon1Deg + (ni - 1) * dLonDeg) % 360.0
  }

  object GridSpec {
    /** Gaussian grid constructor: rows `start until start+nj` of the
      * 2N-parallel Gaussian latitude table.
      */
    def gaussian(ni: Int, nj: Int, n: Int, start: Int,
        lon1Deg: Double, dLonDeg: Double): GridSpec = {
      require(n > 0 && start >= 0 && start + nj <= 2 * n,
        s"$nj rows from $start overrun the ${2 * n} gaussian parallels")
      GridSpec(ni, nj, gaussianLatitudes(n)(start), lon1Deg, 0.0, dLonDeg, n, start)
    }

    /** Lambert conformal grid constructor: first point + projection. */
    def lambertConformal(ni: Int, nj: Int, lat1Deg: Double, lon1Deg: Double,
        spec: LambertSpec): GridSpec =
      GridSpec(ni, nj, lat1Deg, lon1Deg, 0.0, 0.0, lambert = Some(spec))

    /** Polar stereographic grid constructor: first point + projection. */
    def polarStereographic(ni: Int, nj: Int, lat1Deg: Double, lon1Deg: Double,
        spec: PolarSpec): GridSpec =
      GridSpec(ni, nj, lat1Deg, lon1Deg, 0.0, 0.0, polar = Some(spec))

    /** Mercator grid constructor: first point + projection. */
    def mercator(ni: Int, nj: Int, lat1Deg: Double, lon1Deg: Double,
        spec: MercatorSpec): GridSpec = {
      // the first point anchors the projected walk; at (or within a
      // millidegree of) a pole its y diverges through ln tan(π/2)
      require(math.abs(lat1Deg) <= 90.0 - 1e-3,
        s"mercator first-point latitude $lat1Deg at a pole")
      GridSpec(ni, nj, lat1Deg, lon1Deg, 0.0, 0.0, mercator = Some(spec))
    }
  }

  /** Lambert conformal conic on the sphere — the Snyder 1987 ("Map
    * Projections: A Working Manual", USGS PP 1395, eqs. 15-1..15-5 and
    * 14-15..14-11) secant formulation the GRIB2 3.30 template encodes.
    * Pure arithmetic, no geodesy library.
    */
  object Lcc {
    val EarthRadiusM: Double = 6371229.0 // GRIB2 earth shape 6

    final case class Proj(n: Double, rF: Double, rho0: Double, lam0Rad: Double)

    def proj(s: LambertSpec, radiusM: Double = EarthRadiusM): Proj = {
      val p1 = math.toRadians(s.latin1Deg)
      val p2 = math.toRadians(s.latin2Deg)
      def t(p: Double) = math.tan(math.Pi / 4 + p / 2)
      val n =
        if (s.latin1Deg == s.latin2Deg) math.sin(p1)
        else math.log(math.cos(p1) / math.cos(p2)) / math.log(t(p2) / t(p1))
      val rF = radiusM * math.cos(p1) * math.pow(t(p1), n) / n
      val rho0 = rF / math.pow(t(math.toRadians(s.laDDeg)), n)
      Proj(n, rF, rho0, math.toRadians(s.loVDeg))
    }

    /** (lat°, lon°) → projected metres relative to (laD, loV). */
    def forward(p: Proj, latDeg: Double, lonDeg: Double): (Double, Double) = {
      val rho = p.rF / math.pow(math.tan(math.Pi / 4 + math.toRadians(latDeg) / 2), p.n)
      // wrap the meridian offset to (-180, 180] BEFORE scaling by n: a
      // 0..360-convention longitude west of loV would otherwise sweep the
      // cone the long way around
      var dLon = lonDeg - math.toDegrees(p.lam0Rad)
      while (dLon > 180) dLon -= 360
      while (dLon <= -180) dLon += 360
      val theta = p.n * math.toRadians(dLon)
      (rho * math.sin(theta), p.rho0 - rho * math.cos(theta))
    }

    /** Projected metres → (lat°, lon° in [−180, 180) — the
      * [[Grib.normalizeLon]] convention; the antimeridian maps to −180).
      */
    def inverse(p: Proj, x: Double, y: Double): (Double, Double) = {
      val sgn = if (p.n >= 0) 1.0 else -1.0
      val rho = sgn * math.hypot(x, p.rho0 - y)
      val theta = math.atan2(sgn * x, sgn * (p.rho0 - y))
      val lat = 2 * math.atan(math.pow(p.rF / rho, 1.0 / p.n)) - math.Pi / 2
      val lon = math.toDegrees(p.lam0Rad + theta / p.n)
      (math.toDegrees(lat), ((lon + 540.0) % 360.0) - 180.0)
    }
  }

  /** Polar stereographic on the sphere — Snyder 1987 (USGS PP 1395, eqs.
    * 21-1..21-4 forward and 20-14..20-18 inverse, spherical case), scale
    * true at LaD — the limit of the Lambert cone as the parallels reach
    * the pole (cone constant n = ±1), which is exactly how GRIB2 3.20
    * accompanies 3.30 in regional-model output. Pure arithmetic.
    */
  object Pst {

    /** `c = R·(1 ± sin LaD)`: ρ(φ) = c·tan(π/4 ∓ φ/2); sign per pole. */
    final case class Proj(south: Boolean, c: Double, lam0Rad: Double)

    def proj(s: PolarSpec, radiusM: Double = Lcc.EarthRadiusM): Proj = {
      val phiC = math.toRadians(s.laDDeg)
      val c =
        if (s.southPole) radiusM * (1.0 - math.sin(phiC))
        else radiusM * (1.0 + math.sin(phiC))
      Proj(s.southPole, c, math.toRadians(s.loVDeg))
    }

    /** (lat°, lon°) → projected metres; origin at the pole, y toward LoV's
      * antimeridian on the north plane (the GRIB/Snyder orientation:
      * y = −ρ·cos θ north, +ρ·cos θ south).
      */
    def forward(p: Proj, latDeg: Double, lonDeg: Double): (Double, Double) = {
      var dLon = lonDeg - math.toDegrees(p.lam0Rad)
      while (dLon > 180) dLon -= 360
      while (dLon <= -180) dLon += 360
      val theta = math.toRadians(dLon)
      val phi = math.toRadians(latDeg)
      if (p.south) {
        val rho = p.c * math.tan(math.Pi / 4 + phi / 2)
        (rho * math.sin(theta), rho * math.cos(theta))
      } else {
        val rho = p.c * math.tan(math.Pi / 4 - phi / 2)
        (rho * math.sin(theta), -rho * math.cos(theta))
      }
    }

    /** Projected metres → (lat°, lon° in [−180, 180)). The pole itself
      * (ρ = 0) reports LoV as its longitude.
      */
    def inverse(p: Proj, x: Double, y: Double): (Double, Double) = {
      val rho = math.hypot(x, y)
      val (lat, lonRad) =
        if (p.south)
          (-90.0 + 2.0 * math.toDegrees(math.atan(rho / p.c)),
            if (rho == 0.0) p.lam0Rad else p.lam0Rad + math.atan2(x, y))
        else
          (90.0 - 2.0 * math.toDegrees(math.atan(rho / p.c)),
            if (rho == 0.0) p.lam0Rad else p.lam0Rad + math.atan2(x, -y))
      val lon = math.toDegrees(lonRad)
      (lat, ((lon + 540.0) % 360.0) - 180.0)
    }
  }

  /** Mercator on the sphere — Snyder 1987 (USGS PP 1395, eqs. 7-1/7-2
    * forward and 7-4/7-5 inverse, spherical case) with scale true at the
    * standard parallel LaD, the cylindrical member of the projected-grid
    * family GRIB2 ships for tropical/regional models (GDT 3.10). The
    * template names no central meridian, so the x origin anchors at the
    * grid's first point (`lam0`). Pure arithmetic.
    */
  object Mrc {

    /** `rPrime = R·cos LaD` (the scaled cylinder radius); x = rPrime·Δλ,
      * y = rPrime·ln tan(π/4 + φ/2).
      */
    final case class Proj(rPrime: Double, lam0Rad: Double)

    def proj(s: MercatorSpec, lon0Deg: Double,
        radiusM: Double = Lcc.EarthRadiusM): Proj =
      Proj(radiusM * math.cos(math.toRadians(s.laDDeg)), math.toRadians(lon0Deg))

    /** (lat°, lon°) → projected metres relative to (equator, lam0). */
    def forward(p: Proj, latDeg: Double, lonDeg: Double): (Double, Double) = {
      var dLon = lonDeg - math.toDegrees(p.lam0Rad)
      while (dLon > 180) dLon -= 360
      while (dLon <= -180) dLon += 360
      (p.rPrime * math.toRadians(dLon),
        p.rPrime * math.log(math.tan(math.Pi / 4 + math.toRadians(latDeg) / 2)))
    }

    /** Projected metres → (lat°, lon° in [−180, 180)). */
    def inverse(p: Proj, x: Double, y: Double): (Double, Double) = {
      val lat = math.toDegrees(2.0 * math.atan(math.exp(y / p.rPrime)) - math.Pi / 2)
      val lon = math.toDegrees(p.lam0Rad + x / p.rPrime)
      (lat, ((lon + 540.0) % 360.0) - 180.0)
    }
  }

  /** The 2N Gaussian latitudes (degrees, north→south): arcsin of the roots
    * of Legendre P₂ₙ, found by Newton iteration from the Gauss–Legendre
    * cosine initial guess (the classic `gauleg` scheme; converges
    * quadratically, ~5 iterations to machine precision). Memoized per N —
    * every message of an O(N) product recomputes otherwise, and the table
    * is shared by decode (row latitudes) and encode (wire lat1/lat2).
    */
  private val gaussCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Double]]()
  def gaussianLatitudes(n: Int): Array[Double] = {
    require(n >= 1, s"need >= 1 gaussian parallels per hemisphere: $n")
    gaussCache.computeIfAbsent(n, _ => {
      val m = 2 * n
      val lats = new Array[Double](m)
      var i = 1
      while (i <= n) {
        var x = math.cos(math.Pi * (i - 0.25) / (m + 0.5))
        var delta = 1.0
        var iter = 0
        while (math.abs(delta) > 1e-15 && iter < 100) {
          var p0 = 1.0
          var p1 = x
          var k = 2
          while (k <= m) {
            val p2 = ((2 * k - 1) * x * p1 - (k - 1) * p0) / k
            p0 = p1; p1 = p2; k += 1
          }
          val dp = m * (x * p1 - p0) / (x * x - 1.0)
          delta = p1 / dp
          x -= delta
          iter += 1
        }
        val lat = math.toDegrees(math.asin(x))
        lats(i - 1) = lat       // northern hemisphere, descending from the pole
        lats(m - i) = -lat      // southern mirror
        i += 1
      }
      lats
    })
  }

  sealed trait Product
  /** PDT 4.0 — e.g. ECMWF 2 m temperature (category 0, number 0) and
    * dewpoint (category 0, number 6).
    */
  final case class Meteo(category: Int, number: Int) extends Product
  /** PDT 4.40 — CAMS chemical constituent (40008 = pm10, 40009 = pm2p5). */
  final case class Chemical(constituentType: Int) extends Product
  /** PDT 4.8 — a statistic over a time interval (WMO table 4.10 `process`:
    * 0 average, 1 accumulation, 2 maximum, 3 minimum), the template real
    * precipitation/radiation products ship. The interval STARTS at
    * `refTime + forecastHours` and runs `rangeHours`; one continuous time
    * range (the overwhelmingly common wire shape — multi-range messages
    * are refused, not mis-summed).
    */
  final case class Statistical(category: Int, number: Int,
      process: Int, rangeHours: Int) extends Product {
    require(process >= 0 && process <= 3, s"unsupported statistical process $process")
    require(rangeHours >= 1, s"empty statistical range $rangeHours h")
  }

  final case class Decoded(
      discipline: Int,
      product: Product,
      refTime: LocalDateTime,
      forecastHours: Int,
      grid: GridSpec,
      values: Array[Double]) {
    /** Instantaneous fields stamp `ref + leadtime`; interval statistics
      * stamp the END of their interval — the convention every archive
      * (and the reference's hourly pipeline) uses for accumulations.
      */
    def validTime: Timestamp = product match {
      case Statistical(_, _, _, rangeH) => Timestamp.from(
        refTime.plusHours(forecastHours.toLong + rangeH.toLong)
          .toInstant(ZoneOffset.UTC))
      case _ =>
        Timestamp.from(refTime.plusHours(forecastHours.toLong).toInstant(ZoneOffset.UTC))
    }
  }

  /** Missing grid points (section-6 bitmap zeros) decode as NaN; encoders
    * treat NaN inputs as missing and emit a bitmap. The adapters DROP
    * missing points (the irregular-points form the reference's clip
    * fallback already models — `defs/assets.py:59-70`).
    */
  def isMissing(v: Double): Boolean = java.lang.Double.isNaN(v)

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

  /** Section 3 — grid definition, template 3.0 (regular lat/lon) or 3.40
    * (Gaussian): identical 72-octet layout except octets 68–71, which carry
    * the j-direction increment Dj (3.0) or N, the parallels between pole
    * and equator (3.40). Shared by all three encoders so the grid wire
    * format cannot drift between packings.
    */
  private def gridSection(grid: GridSpec): Writer = {
    val s3 = new Writer
    // shared 38-octet prelude: length + number + source + point count +
    // template + spherical earth (shape 6, axes missing) + Ni/Nj — ONE
    // writer so the grid templates cannot drift on the common header
    def prelude(length: Int, template: Int): Unit = {
      s3.u32(length.toLong); s3.u8(3)
      s3.u8(0) // source: specified in template
      s3.u32(grid.numPoints)
      s3.u8(0); s3.u8(0) // no optional list
      s3.u16(template)
      s3.u8(6) // shape of earth: spherical r=6371229 m
      s3.u8(0xff); s3.u32(0xffffffffL) // radius scale/value: missing
      s3.u8(0xff); s3.u32(0xffffffffL) // major axis: missing
      s3.u8(0xff); s3.u32(0xffffffffL) // minor axis: missing
      s3.u32(grid.ni); s3.u32(grid.nj)
    }
    (grid.lambert, grid.polar, grid.mercator) match {
      case (None, None, Some(ms)) =>
        // template 3.10 — Mercator, 72 octets (note the wire order: scan
        // mode at octet 60, BEFORE orientation/Di/Dj — unlike 3.0/3.20/3.30)
        prelude(72, 10)
        s3.sm32(microDeg(grid.lat1Deg)) // La1 — first point
        s3.u32(microDeg(((grid.lon1Deg % 360.0) + 360.0) % 360.0))
        s3.u8(0x08) // resolution flags
        s3.sm32(microDeg(ms.laDDeg)) // LaD — where Di/Dj are true
        // La2/Lo2 — the LAST grid point, derived through the projection
        val mp = Mrc.proj(ms, grid.lon1Deg)
        val (mx1, my1) = Mrc.forward(mp, grid.lat1Deg, grid.lon1Deg)
        val mySign = if (ms.yPositive) 1.0 else -1.0
        val (la2, lo2) = Mrc.inverse(mp, mx1 + (grid.ni - 1) * ms.dxM,
          my1 + mySign * (grid.nj - 1) * ms.dyM)
        s3.sm32(microDeg(la2))
        s3.u32(microDeg(((lo2 % 360.0) + 360.0) % 360.0))
        s3.u8(if (ms.yPositive) 0x40 else 0x00) // scanning: +i, ±j
        s3.u32(0) // orientation: i along the equator
        s3.u32(Math.round(ms.dxM * 1000.0)) // Di in 10^-3 m
        s3.u32(Math.round(ms.dyM * 1000.0)) // Dj
      case (Some(lc), _, _) =>
        // template 3.30 — Lambert conformal, 81 octets
        prelude(81, 30)
        s3.sm32(microDeg(grid.lat1Deg)) // La1 — first point
        s3.u32(microDeg(((grid.lon1Deg % 360.0) + 360.0) % 360.0))
        s3.u8(0x08) // resolution flags
        s3.sm32(microDeg(lc.laDDeg)) // LaD — where Dx/Dy are true
        s3.u32(microDeg(((lc.loVDeg % 360.0) + 360.0) % 360.0)) // LoV
        s3.u32(Math.round(lc.dxM * 1000.0)) // Dx in 10^-3 m
        s3.u32(Math.round(lc.dyM * 1000.0)) // Dy
        s3.u8(0) // projection centre: north pole on the plane
        s3.u8(if (lc.yPositive) 0x40 else 0x00) // scanning: +i, ±j
        s3.sm32(microDeg(lc.latin1Deg))
        s3.sm32(microDeg(lc.latin2Deg))
        s3.sm32(-90000000L); s3.u32(0L) // southern pole of projection
      case (None, Some(ps), _) =>
        // template 3.20 — polar stereographic, 65 octets
        prelude(65, 20)
        s3.sm32(microDeg(grid.lat1Deg)) // La1 — first point
        s3.u32(microDeg(((grid.lon1Deg % 360.0) + 360.0) % 360.0))
        s3.u8(0x08) // resolution flags
        s3.sm32(microDeg(ps.laDDeg)) // LaD — where Dx/Dy are true
        s3.u32(microDeg(((ps.loVDeg % 360.0) + 360.0) % 360.0)) // LoV
        s3.u32(Math.round(ps.dxM * 1000.0)) // Dx in 10^-3 m
        s3.u32(Math.round(ps.dyM * 1000.0)) // Dy
        s3.u8(if (ps.southPole) 0x80 else 0x00) // projection centre flag
        s3.u8(if (ps.yPositive) 0x40 else 0x00) // scanning: +i, ±j
      case (None, None, None) =>
        // template 3.0 (regular lat/lon) or 3.40 (Gaussian), 72 octets
        prelude(72, if (grid.isGaussian) 40 else 0)
        s3.u32(0) // basic angle: 0 → micro-degree units
        s3.u32(0xffffffffL) // subdivisions: missing
        s3.sm32(microDeg(grid.lat1Deg))
        s3.u32(microDeg(((grid.lon1Deg % 360.0) + 360.0) % 360.0))
        // resolution flags: i increment given always; j only on the regular grid
        s3.u8(if (grid.isGaussian) 0x20 else 0x30)
        s3.sm32(microDeg(grid.lat2Deg))
        s3.u32(microDeg(((grid.lon2Deg % 360.0) + 360.0) % 360.0))
        s3.u32(microDeg(grid.dLonDeg)) // Di — i direction increment (longitude)
        if (grid.isGaussian) s3.u32(grid.gaussianN.toLong) // N
        else s3.u32(microDeg(grid.dLatDeg))                // Dj
        s3.u8(0x00) // scanning mode: +i, −j, row-major
    }
    s3
  }

  /** Section 4 — product definition: template 4.0 (instantaneous meteo),
    * 4.40 (chemical constituent), or 4.8 (interval statistic: 4.0's 34
    * octets, then end-of-overall-interval time and ONE continuous time
    * range — 58 octets total). Shared by every packing encoder.
    */
  private def productSection(product: Product, refTime: LocalDateTime,
      forecastHours: Int): Writer = {
    val s4 = new Writer
    val (templateNo, cat, num, constituent, stat) = product match {
      case Meteo(c, n)   => (0, c, n, None, None)
      case Chemical(ct)  => (40, 20, 0, Some(ct), None) // category 20: chemical constituents, number 0: mass density
      case s @ Statistical(c, n, _, _) => (8, c, n, None, Some(s))
    }
    val secLen =
      if (stat.isDefined) 58 else if (constituent.isEmpty) 34 else 36
    s4.u32(secLen); s4.u8(4)
    s4.u16(0) // no coordinate values
    s4.u16(templateNo)
    s4.u8(cat); s4.u8(num)
    constituent.foreach(s4.u16)
    s4.u8(2) // generating process: forecast
    s4.u8(255); s4.u8(255) // background/process id: missing
    s4.u16(0); s4.u8(0) // data cutoff
    s4.u8(1) // time unit: hour
    s4.u32(forecastHours) // 4.8: the START of the interval
    s4.u8(103); s4.u8(0); s4.u32(2) // first surface: 2 m above ground
    s4.u8(255); s4.u8(0xff); s4.u32(0xffffffffL) // second surface: missing
    stat.foreach { s =>
      val end = refTime.plusHours(forecastHours.toLong + s.rangeHours.toLong)
      s4.u16(end.getYear); s4.u8(end.getMonthValue); s4.u8(end.getDayOfMonth)
      s4.u8(end.getHour); s4.u8(end.getMinute); s4.u8(end.getSecond)
      s4.u8(1)  // one time range
      s4.u32(0) // no values missing from the statistic
      s4.u8(s.process) // table 4.10
      s4.u8(2)  // increment type: same start, forecast time incremented
      s4.u8(1)  // range length unit: hour
      s4.u32(s.rangeHours.toLong)
      s4.u8(255) // increment unit: missing —
      s4.u32(0)  // increment 0: a continuous process
    }
    s4
  }

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

  /** Section 6 for a value field: indicator 255 (no bitmap) when every
    * point is present, else indicator 0 with one MSB-first bit per grid
    * point (1 = present).
    */
  private def bitmapSection(values: Array[Double]): Writer = {
    val s6 = new Writer
    if (!values.exists(isMissing)) { s6.u32(6); s6.u8(6); s6.u8(255) }
    else {
      s6.u32(6 + (values.length + 7) / 8); s6.u8(6); s6.u8(0)
      var acc = 0
      var accBits = 0
      values.foreach { v =>
        acc = (acc << 1) | (if (isMissing(v)) 0 else 1)
        accBits += 1
        if (accBits == 8) { s6.u8(acc); acc = 0; accBits = 0 }
      }
      if (accBits > 0) s6.u8(acc << (8 - accBits))
    }
    s6
  }

  /** Encode one message. `values` are row-major (lat rows north→south, lon
    * west→east within a row), `grid.numPoints` long; NaN marks a missing
    * point and switches on the section-6 bitmap.
    */
  def encode(product: Product, grid: GridSpec, refTime: LocalDateTime,
      forecastHours: Int, values: Array[Double], nbits: Int = 16): Array[Byte] = {
    require(values.length == grid.numPoints,
      s"${values.length} values for ${grid.numPoints}-point grid")
    require(nbits >= 1 && nbits <= 32, s"nbits out of (0,32]: $nbits")
    val present = values.filter(v => !isMissing(v))
    require(present.nonEmpty, "every grid point is missing")
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

    // Section 3 — grid definition, template 3.0 or 3.40 (shared writer)
    val s3 = gridSection(grid)

    // Section 4 — product definition (templates 4.0 / 4.40 / 4.8)
    val s4 = productSection(product, refTime, forecastHours)

    // Section 5 — data representation, template 5.0 (simple packing);
    // counts and packing parameters cover PRESENT points only
    val (r, e) = packingParams(present, nbits)
    val s5 = new Writer
    s5.u32(21); s5.u8(5)
    s5.u32(present.length)
    s5.u16(0) // template 5.0
    s5.f32(r)
    s5.sm16(e)
    s5.sm16(0) // decimal scale D = 0
    s5.u8(nbits)
    s5.u8(0) // values are floating-point

    // Section 6 — bitmap (255 when nothing is missing)
    val s6 = bitmapSection(values)

    // Section 7 — packed data, MSB-first bit stream
    val dataBytes = (present.length.toLong * nbits + 7) / 8
    val s7 = new Writer
    s7.u32(5 + dataBytes); s7.u8(7)
    val scale = math.pow(2.0, -e)
    var acc = 0L
    var accBits = 0
    present.foreach { v =>
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

  /** Encode one message with DRT 5.41 (PNG packing): the scaled integers X
    * of the [[encode]] quantization written as a lossless PNG raster —
    * depth 8 (grayscale), 16 (16-bit grayscale) or 24 (RGB, X decomposed
    * big-endian across the channels) chosen from `nbits`; one pixel per
    * PRESENT point, Ni×Nj when nothing is missing, numValues×1 under a
    * bitmap (packing covers present points only, like every other DRT).
    * The PNG codec is the JDK's own `javax.imageio` (the path the r9 media
    * codec proved out), so decode(encode(…)) is value-exact at E=0. 5.40
    * (JPEG2000) has no JDK codec and stays on the unsupported-template
    * fail-fast. The reference reads any eccodes-supported packing through
    * pygrib (`pipeline-python/src/pipeline_python/grib2/reader.py:36-37`).
    */
  def encodePngPacked(product: Product, grid: GridSpec, refTime: LocalDateTime,
      forecastHours: Int, values: Array[Double], nbits: Int = 12): Array[Byte] = {
    require(values.length == grid.numPoints,
      s"${values.length} values for ${grid.numPoints}-point grid")
    require(nbits >= 1 && nbits <= 24, s"nbits out of (0,24] for PNG packing: $nbits")
    val present = values.filter(v => !isMissing(v))
    require(present.nonEmpty, "every grid point is missing")
    val n = present.length
    val depth = if (nbits <= 8) 8 else if (nbits <= 16) 16 else 24

    val (rRef, e) = packingParams(present, nbits)
    val scale = math.pow(2.0, -e)
    // present points lay out as the grid raster when nothing is missing,
    // else as a single pixel row (the shape eccodes' png packer emits)
    val (iw, ih) = if (n == grid.numPoints) (grid.ni, grid.nj) else (n, 1)
    import java.awt.image.BufferedImage
    val img = new BufferedImage(iw, ih, depth match {
      case 8  => BufferedImage.TYPE_BYTE_GRAY
      case 16 => BufferedImage.TYPE_USHORT_GRAY
      case _  => BufferedImage.TYPE_INT_RGB
    })
    val raster = img.getRaster
    var i = 0
    while (i < n) {
      val x = Math.round((present(i) - rRef.toDouble) * scale)
      require(x >= 0 && x < (1L << nbits), s"packed value out of range: $x")
      val px = i % iw
      val py = i / iw
      if (depth == 24) {
        raster.setSample(px, py, 0, ((x >> 16) & 0xff).toInt)
        raster.setSample(px, py, 1, ((x >> 8) & 0xff).toInt)
        raster.setSample(px, py, 2, (x & 0xff).toInt)
      } else raster.setSample(px, py, 0, x.toInt)
      i += 1
    }
    val payload = graft.multimodal.ImageCodec.encodePng(img)

    val w = new Writer

    // Section 1 — identification (same as simple packing)
    val s1 = new Writer
    s1.u32(21); s1.u8(1)
    s1.u16(98); s1.u16(0); s1.u8(2); s1.u8(1); s1.u8(1)
    s1.u16(refTime.getYear); s1.u8(refTime.getMonthValue); s1.u8(refTime.getDayOfMonth)
    s1.u8(refTime.getHour); s1.u8(refTime.getMinute); s1.u8(refTime.getSecond)
    s1.u8(0); s1.u8(1)

    // Section 3 — grid definition (shared writer, all grid templates)
    val s3 = gridSection(grid)

    // Section 4 — product definition (shared writer, templates 4.0/4.40/4.8)
    val s4 = productSection(product, refTime, forecastHours)

    // Section 5 — DRT 5.41 (21 octets: R, E, D, image depth, field type)
    val s5 = new Writer
    s5.u32(21); s5.u8(5)
    s5.u32(n)
    s5.u16(41)
    s5.f32(rRef)
    s5.sm16(e)
    s5.sm16(0) // decimal scale D = 0
    s5.u8(depth)
    s5.u8(0) // original values: floating point

    // Section 6 — bitmap (255 when nothing is missing)
    val s6 = bitmapSection(values)

    // Section 7 — the PNG bitstream
    val s7 = new Writer
    s7.u32(5 + payload.length); s7.u8(7)
    s7.buf ++= payload

    val bodyLen = s1.buf.length + s3.buf.length + s4.buf.length +
      s5.buf.length + s6.buf.length + s7.buf.length
    w.buf ++= "GRIB".getBytes("ASCII")
    w.u16(0xffff)
    w.u8(0) // discipline: meteorological
    w.u8(2)
    w.u64(16L + bodyLen + 4L)
    w.buf ++= s1.buf; w.buf ++= s3.buf; w.buf ++= s4.buf
    w.buf ++= s5.buf; w.buf ++= s6.buf; w.buf ++= s7.buf
    w.buf ++= "7777".getBytes("ASCII")
    w.buf.toArray
  }

  /** Bits needed to represent non-negative `v` (0 → 0 bits). */
  private def bitsFor(v: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(v)

  /** A bit sink that packs values MSB-first and can pad to octet edges. */
  private final class BitWriter(w: Writer) {
    private var acc = 0L
    private var accBits = 0
    def put(v: Long, nbits: Int): Unit = {
      require(nbits >= 0 && nbits <= 32, s"field width out of [0,32]: $nbits")
      if (nbits == 0) return
      acc = (acc << nbits) | (v & ((1L << nbits) - 1))
      accBits += nbits
      while (accBits >= 8) { accBits -= 8; w.u8(((acc >>> accBits) & 0xff).toInt) }
    }
    def align(): Unit =
      if (accBits > 0) { w.u8(((acc << (8 - accBits)) & 0xff).toInt); accBits = 0; acc = 0L }
  }

  /** Encode one message with complex packing: DRT 5.2 (`order = 0`) or 5.3
    * with spatial differencing (`order` 1 or 2). Same quantization as
    * [[encode]] — `x = round((v − R)/2^E)` with E sized for `nbits` — so a
    * field that is value-exact under simple packing is value-exact here
    * too. General group splitting with fixed `groupLen` runs (the split is
    * encoder's choice under the spec; decoders honor whatever the group
    * length array says).
    */
  def encodeComplex(product: Product, grid: GridSpec, refTime: LocalDateTime,
      forecastHours: Int, values: Array[Double], nbits: Int = 16,
      order: Int = 2, groupLen: Int = 32): Array[Byte] = {
    require(values.length == grid.numPoints,
      s"${values.length} values for ${grid.numPoints}-point grid")
    // order-k differencing widens residuals by up to k+... bits: |d| ≤
    // 2^(nbits+order), so group widths reach nbits+order+1 and descriptor
    // magnitudes 2^(nbits+order) — cap nbits so widths stay ≤ 32 (the
    // BitWriter field limit) and descriptors inside 4-octet sign-magnitude
    val maxNbits = if (order == 0) 31 else 29
    require(nbits >= 1 && nbits <= maxNbits,
      s"nbits out of (0,$maxNbits] for order-$order packing: $nbits")
    require(order >= 0 && order <= 2, s"spatial differencing order out of [0,2]: $order")
    require(groupLen >= 1, s"groupLen must be positive: $groupLen")
    // with a bitmap, packing (and spatial differencing) runs over the
    // present-point SEQUENCE — section 7 carries present points only
    val present = values.filter(v => !isMissing(v))
    require(present.length > order, s"need more than $order present points for order-$order differencing")
    val n = present.length

    // quantize exactly as simple packing does
    val (rRef, e) = packingParams(present, nbits)
    val scale = math.pow(2.0, -e)
    val x = new Array[Long](n)
    var i = 0
    while (i < n) { x(i) = Math.round((present(i) - rRef.toDouble) * scale); i += 1 }

    // spatial differencing on the scaled integers (template 7.3 note 1):
    // h_i = x_i − x_{i−1} (order 1) or x_i − 2x_{i−1} + x_{i−2} (order 2);
    // the first `order` initial values and the overall minimum of the
    // differences travel as section-7 extra descriptors, and the packed
    // field is h − min (first `order` slots zeroed — the decoder overwrites
    // them with the initial values).
    val ivals = (0 until order).map(x(_)).toArray
    val p = new Array[Long](n)
    var gmin = 0L
    if (order > 0) {
      i = order
      var mn = Long.MaxValue
      while (i < n) {
        p(i) = if (order == 1) x(i) - x(i - 1) else x(i) - 2 * x(i - 1) + x(i - 2)
        if (p(i) < mn) mn = p(i)
        i += 1
      }
      gmin = mn
      i = order
      while (i < n) { p(i) -= gmin; i += 1 }
    } else System.arraycopy(x, 0, p, 0, n)

    // group split: fixed-length runs, last group ragged
    val ng = (n + groupLen - 1) / groupLen
    val grpRef = new Array[Long](ng)
    val grpWidth = new Array[Int](ng)
    val grpLen = new Array[Int](ng)
    var g = 0
    while (g < ng) {
      val from = g * groupLen
      val until = math.min(from + groupLen, n)
      grpLen(g) = until - from
      var mn = Long.MaxValue
      var mx = Long.MinValue
      i = from
      while (i < until) { val v = p(i); if (v < mn) mn = v; if (v > mx) mx = v; i += 1 }
      grpRef(g) = mn
      grpWidth(g) = bitsFor(mx - mn)
      g += 1
    }
    val refBits = math.max(1, grpRef.map(bitsFor).max)
    val widthRef = grpWidth.min
    val widthBits = bitsFor((grpWidth.max - widthRef).toLong)
    val lenRef = grpLen.min
    val lenBits = bitsFor((grpLen.max - lenRef).toLong)
    val lastLen = grpLen(ng - 1)

    val w = new Writer

    // Section 1 — identification (same as simple packing)
    val s1 = new Writer
    s1.u32(21); s1.u8(1)
    s1.u16(98); s1.u16(0); s1.u8(2); s1.u8(1); s1.u8(1)
    s1.u16(refTime.getYear); s1.u8(refTime.getMonthValue); s1.u8(refTime.getDayOfMonth)
    s1.u8(refTime.getHour); s1.u8(refTime.getMinute); s1.u8(refTime.getSecond)
    s1.u8(0); s1.u8(1)

    // Section 3 — grid definition, template 3.0 or 3.40 (shared writer)
    val s3 = gridSection(grid)

    // Section 4 — product definition (shared writer, templates 4.0/4.40/4.8)
    val s4 = productSection(product, refTime, forecastHours)

    // Section 5 — DRT 5.2 (47 octets) / 5.3 (49 octets)
    val extraOctets = 4 // sign-magnitude width of ival/gmin descriptors
    val s5 = new Writer
    s5.u32(if (order == 0) 47 else 49); s5.u8(5)
    s5.u32(n)
    s5.u16(if (order == 0) 2 else 3)
    s5.f32(rRef)
    s5.sm16(e)
    s5.sm16(0)       // decimal scale D = 0
    s5.u8(refBits)   // bits per group reference value
    s5.u8(0)         // original values: floating point
    s5.u8(1)         // group splitting: general
    s5.u8(0)         // missing value management: none
    s5.u32(0); s5.u32(0) // primary/secondary missing substitutes: unused
    s5.u32(ng)
    s5.u8(widthRef); s5.u8(widthBits)
    s5.u32(lenRef); s5.u8(1) // length increment 1
    s5.u32(lastLen)
    s5.u8(lenBits)
    if (order > 0) { s5.u8(order); s5.u8(extraOctets) }

    // Section 6 — bitmap (255 when nothing is missing)
    val s6 = bitmapSection(values)

    // Section 7 — extra descriptors (5.3), then the four bit-packed arrays,
    // each padded to a whole octet (the layout every public implementation
    // emits)
    val s7body = new Writer
    def smN(v: Long): Unit = {
      val mag = math.abs(v)
      require(bitsFor(mag) <= extraOctets * 8 - 1, s"descriptor overflows $extraOctets octets: $v")
      val bits = (if (v < 0) 1L << (extraOctets * 8 - 1) else 0L) | mag
      var sh = (extraOctets - 1) * 8
      while (sh >= 0) { s7body.u8(((bits >>> sh) & 0xff).toInt); sh -= 8 }
    }
    if (order > 0) { ivals.foreach(smN); smN(gmin) }
    val bw = new BitWriter(s7body)
    grpRef.foreach(bw.put(_, refBits)); bw.align()
    grpWidth.foreach(wd => bw.put((wd - widthRef).toLong, widthBits)); bw.align()
    grpLen.foreach(l => bw.put((l - lenRef).toLong, lenBits)); bw.align()
    g = 0
    while (g < ng) {
      val from = g * groupLen
      val until = from + grpLen(g)
      i = from
      while (i < until) { bw.put(p(i) - grpRef(g), grpWidth(g)); i += 1 }
      g += 1
    }
    bw.align()
    val s7 = new Writer
    s7.u32(5 + s7body.buf.length); s7.u8(7)
    s7.buf ++= s7body.buf

    val bodyLen = s1.buf.length + s3.buf.length + s4.buf.length +
      s5.buf.length + s6.buf.length + s7.buf.length
    w.buf ++= "GRIB".getBytes("ASCII")
    w.u16(0xffff)
    w.u8(0) // discipline: meteorological
    w.u8(2)
    w.u64(16L + bodyLen + 4L)
    w.buf ++= s1.buf; w.buf ++= s3.buf; w.buf ++= s4.buf
    w.buf ++= s5.buf; w.buf ++= s6.buf; w.buf ++= s7.buf
    w.buf ++= "7777".getBytes("ASCII")
    w.buf.toArray
  }

  /** CCSDS 121.0-B-2 entropy coding of non-negative `nbits`-wide samples:
    * unit-delta preprocessing per reference sample interval, then per
    * `blockSize`-sample block the cheapest of the four coding options
    * (zero-run / second extension / split-k / uncompressed). Emission
    * mirrors [[unpackCcsds]]'s stream contract exactly — reference sample
    * after the (possibly extended) ID field, FS high parts before the k-bit
    * low parts, decoder's pair layout for the second extension.
    */
  private[sources] def packCcsds(xs: Array[Long], nbits: Int,
      blockSize: Int, rsiBlocks: Int): Array[Byte] = {
    val w = new Writer
    val bw = new BitWriter(w)
    val idLen = if (nbits > 16) 5 else if (nbits > 8) 4 else if (nbits > 4) 3
      else if (nbits > 2) 2 else 1
    val uncompId = (1 << idLen) - 1
    val maxK = math.min(nbits - 1, uncompId - 2) // split ids occupy 1..uncompId-1
    val xmax = (1L << nbits) - 1
    def putFs(v: Long): Unit = {
      var z = v
      while (z >= 32) { bw.put(0L, 32); z -= 32 }
      bw.put(1L, z.toInt + 1) // z zeros then the terminating 1
    }
    val n = xs.length
    var rsiStart = 0
    while (rsiStart < n) {
      val rsiSamples = math.min(rsiBlocks * blockSize, n - rsiStart)
      val nb = (rsiSamples + blockSize - 1) / blockSize
      // preprocess: slot 0 keeps the raw reference, the rest become mapped
      // unit-delta prediction errors (the inverse of unpackCcsds's unmap)
      val d = new Array[Long](rsiSamples)
      d(0) = xs(rsiStart)
      var prev = xs(rsiStart)
      var i = 1
      while (i < rsiSamples) {
        val x = xs(rsiStart + i)
        val delta = x - prev
        val theta = math.min(prev, xmax - prev)
        d(i) =
          if (delta >= 0 && delta <= theta) 2 * delta
          else if (delta < 0 && -delta <= theta) -2 * delta - 1
          else theta + math.abs(delta)
        prev = x
        i += 1
      }
      def blkLenOf(b: Int): Int =
        math.min(blockSize, rsiSamples - b * blockSize)
      // coded samples of block b (slot 0 of block 0 is the reference)
      def codedStart(b: Int): Int = if (b == 0) 1 else 0
      def blockAllZero(b: Int): Boolean = {
        var j = b * blockSize + codedStart(b)
        val until = b * blockSize + blkLenOf(b)
        while (j < until) { if (d(j) != 0L) return false; j += 1 }
        true
      }
      var b = 0
      while (b < nb) {
        val ref = b == 0
        val blkStart = b * blockSize
        val blkLen = blkLenOf(b)
        val start = codedStart(b)
        if (blockAllZero(b)) {
          // extend the zero run to the 64-block segment / RSI boundary
          val segEnd = math.min(nb, b + (64 - (b % 64)))
          var z = 1
          while (b + z < segEnd && blockAllZero(b + z)) z += 1
          bw.put(0L, idLen); bw.put(0L, 1)
          if (ref) bw.put(d(0), nbits)
          if (b + z == segEnd) putFs(4L) // ROS: rest of segment
          else if (z <= 4) putFs((z - 1).toLong)
          else putFs(z.toLong)
          b += z
        } else {
          // cost the three non-zero options over the coded samples
          var uncompCost = (blkLen - start).toLong * nbits
          var seCost = 0L
          var i2 = start
          while (i2 < blkLen) {
            val (a, b2) =
              if ((i2 & 1) == 1) (0L, d(blkStart + i2))
              else (d(blkStart + i2),
                if (i2 + 1 < blkLen) d(blkStart + i2 + 1) else 0L)
            seCost += (a + b2) * (a + b2 + 1) / 2 + b2 + 1
            i2 += (if ((i2 & 1) == 1) 1 else 2)
          }
          var bestK = -1
          var bestCost = Long.MaxValue
          var k = 0
          while (k <= maxK) {
            var c = 0L
            var j = blkStart + start
            while (j < blkStart + blkLen) { c += (d(j) >>> k) + 1 + k; j += 1 }
            if (c < bestCost) { bestCost = c; bestK = k }
            k += 1
          }
          val refBits = if (ref) nbits.toLong else 0L
          // nbits 1-2 leaves no representable split option (maxK < 0): the
          // Long.MaxValue sentinel must not enter the cost sum, where the
          // addition would wrap negative and minBy would select a split
          // the emitter cannot encode (bestK = -1 -> negative field width)
          val splitCost =
            if (bestK < 0) Long.MaxValue else idLen + refBits + bestCost
          val costs = Seq(
            (0, idLen + 1 + refBits + seCost),       // second extension
            (1, splitCost),                          // split bestK
            (2, idLen + refBits + uncompCost))       // uncompressed
          costs.minBy(_._2)._1 match {
            case 0 =>
              bw.put(0L, idLen); bw.put(1L, 1)
              if (ref) bw.put(d(blkStart), nbits)
              var i3 = start
              while (i3 < blkLen) {
                val (a, b2) =
                  if ((i3 & 1) == 1) (0L, d(blkStart + i3))
                  else (d(blkStart + i3),
                    if (i3 + 1 < blkLen) d(blkStart + i3 + 1) else 0L)
                putFs((a + b2) * (a + b2 + 1) / 2 + b2)
                i3 += (if ((i3 & 1) == 1) 1 else 2)
              }
            case 1 =>
              bw.put((bestK + 1).toLong, idLen)
              if (ref) bw.put(d(blkStart), nbits)
              var i3 = blkStart + start
              while (i3 < blkStart + blkLen) { putFs(d(i3) >>> bestK); i3 += 1 }
              i3 = blkStart + start
              while (i3 < blkStart + blkLen) { bw.put(d(i3), bestK); i3 += 1 }
            case _ =>
              bw.put(uncompId.toLong, idLen)
              var i3 = blkStart
              while (i3 < blkStart + blkLen) { bw.put(d(i3), nbits); i3 += 1 }
          }
          b += 1
        }
      }
      rsiStart += rsiSamples
    }
    bw.align()
    w.buf.toArray
  }

  /** Encode one message with DRT 5.42 (CCSDS adaptive entropy coding) — the
    * template real ECMWF products ship with. Same quantization as
    * [[encode]], so an integer-valued field (E=0) round-trips value-exact.
    * Exists to make the 5.42 DECODER provable on arbitrary fields: the real
    * fixture exercises one encoder's option choices; the round-trip
    * property tests exercise every branch (zero runs, second extension,
    * split-k, uncompressed, partial blocks, partial RSIs, bitmaps).
    */
  def encodeCcsds(product: Product, grid: GridSpec, refTime: LocalDateTime,
      forecastHours: Int, values: Array[Double], nbits: Int = 12,
      blockSize: Int = 32, rsiBlocks: Int = 128): Array[Byte] = {
    require(values.length == grid.numPoints,
      s"${values.length} values for ${grid.numPoints}-point grid")
    // mapped deltas stay ≤ xmax < 2^nbits; cap below 28 keeps every FS
    // codeword and second-extension pair index comfortably inside Long
    require(nbits >= 1 && nbits <= 24, s"nbits out of (0,24] for CCSDS packing: $nbits")
    require(blockSize == 8 || blockSize == 16 || blockSize == 32 || blockSize == 64,
      s"CCSDS block size must be 8/16/32/64: $blockSize")
    require(rsiBlocks >= 1 && rsiBlocks <= 0xffff, s"CCSDS rsi out of range: $rsiBlocks")
    val present = values.filter(v => !isMissing(v))
    require(present.nonEmpty, "every grid point is missing")
    val n = present.length

    val (rRef, e) = packingParams(present, nbits)
    val scale = math.pow(2.0, -e)
    val x = new Array[Long](n)
    var i = 0
    while (i < n) { x(i) = Math.round((present(i) - rRef.toDouble) * scale); i += 1 }
    val payload = packCcsds(x, nbits, blockSize, rsiBlocks)

    val w = new Writer

    // Section 1 — identification (same as simple packing)
    val s1 = new Writer
    s1.u32(21); s1.u8(1)
    s1.u16(98); s1.u16(0); s1.u8(2); s1.u8(1); s1.u8(1)
    s1.u16(refTime.getYear); s1.u8(refTime.getMonthValue); s1.u8(refTime.getDayOfMonth)
    s1.u8(refTime.getHour); s1.u8(refTime.getMinute); s1.u8(refTime.getSecond)
    s1.u8(0); s1.u8(1)

    // Section 3 — grid definition, template 3.0 or 3.40 (shared writer)
    val s3 = gridSection(grid)

    // Section 4 — product definition (shared writer, templates 4.0/4.40/4.8)
    val s4 = productSection(product, refTime, forecastHours)

    // Section 5 — DRT 5.42 (25 octets)
    val s5 = new Writer
    s5.u32(25); s5.u8(5)
    s5.u32(n)
    s5.u16(42)
    s5.f32(rRef)
    s5.sm16(e)
    s5.sm16(0) // decimal scale D = 0
    s5.u8(nbits)
    s5.u8(0) // original values: floating point
    s5.u8(CcsdsPreprocess | 0x04) // AEC_DATA_MSB | AEC_DATA_PREPROCESS
    s5.u8(blockSize)
    s5.u16(rsiBlocks)

    // Section 6 — bitmap (255 when nothing is missing)
    val s6 = bitmapSection(values)

    // Section 7 — the CCSDS stream
    val s7 = new Writer
    s7.u32(5 + payload.length); s7.u8(7)
    s7.buf ++= payload

    val bodyLen = s1.buf.length + s3.buf.length + s4.buf.length +
      s5.buf.length + s6.buf.length + s7.buf.length
    w.buf ++= "GRIB".getBytes("ASCII")
    w.u16(0xffff)
    w.u8(0) // discipline: meteorological
    w.u8(2)
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

  /** MSB-first bit stream reader with octet realignment between arrays.
    * Reads are bounded to `end` (exclusive): a truncated or lying section-7
    * length fails through the IOException channel instead of running past
    * the section into the '7777' trailer / next message and decoding
    * garbage that still passes the final point-count check.
    */
  private final class BitReader(bytes: Array[Byte], var bytePos: Int, end: Int) {
    private var acc = 0L
    private var accBits = 0
    def get(nbits: Int): Long = {
      if (nbits == 0) return 0L
      while (accBits < nbits) {
        if (bytePos >= end) fail(s"packed data truncated at octet $bytePos (section ends at $end)")
        acc = (acc << 8) | (bytes(bytePos) & 0xffL); bytePos += 1; accBits += 8
      }
      val v = (acc >>> (accBits - nbits)) & ((1L << nbits) - 1)
      accBits -= nbits
      v
    }
    /** Unary fundamental-sequence codeword: zeros-then-one, value = #zeros. */
    def fs(limit: Int): Int = {
      var z = 0
      while (get(1) == 0L) {
        z += 1
        if (z > limit) fail(s"fundamental-sequence run exceeds $limit (corrupt stream)")
      }
      z
    }
    def align(): Unit = { acc = 0L; accBits = 0 }
  }

  /** Section-7 payload of DRT 5.2/5.3: optional spatial-differencing
    * descriptors, then the octet-aligned group reference / width / length
    * arrays, then the per-group packed residuals.
    */
  private def unpackComplex(bytes: Array[Byte], dataPos: Int, dataEnd: Int, numValues: Int,
      rRef: Float, eScale: Int, dScale: Int, refBits: Int, ng: Int,
      widthRef: Int, widthBits: Int, lenRef: Int, lenInc: Int, lastLen: Int,
      lenBits: Int, sdOrder: Int, sdOctets: Int): Array[Double] = {
    if (ng <= 0) fail(s"complex packing with $ng groups")
    // wire-read bit widths are u8 (0..255); anything past 32 would wrap
    // BitReader's shift and decode silent garbage — reject up front
    if (refBits > 32) fail(s"group reference width out of range: $refBits")
    if (widthBits > 32) fail(s"group width-field width out of range: $widthBits")
    if (lenBits > 32) fail(s"group length-field width out of range: $lenBits")
    // u32-wire fields read as Int: a 2^31..2^32-1 value wraps negative and
    // would corrupt the length arithmetic below
    if (lenRef < 0) fail(s"group length reference out of range: $lenRef")
    if (lastLen < 0) fail(s"last group length out of range: $lastLen")
    var pos = dataPos
    // sign-magnitude big-endian extra descriptors: `sdOrder` initial values
    // then the overall minimum of the differenced field
    val descriptors = new Array[Long](if (sdOrder > 0) sdOrder + 1 else 0)
    if (pos + descriptors.length.toLong * sdOctets > dataEnd)
      fail("section 7 too short for spatial-differencing descriptors")
    var d = 0
    while (d < descriptors.length) {
      var raw = 0L
      var k = 0
      while (k < sdOctets) { raw = (raw << 8) | (bytes(pos) & 0xffL); pos += 1; k += 1 }
      val signBit = 1L << (sdOctets * 8 - 1)
      descriptors(d) = if ((raw & signBit) != 0) -(raw & (signBit - 1)) else raw
      d += 1
    }
    val br = new BitReader(bytes, pos, dataEnd)
    val grpRef = Array.fill(ng)(br.get(refBits)); br.align()
    val grpWidth = Array.fill(ng)(widthRef + br.get(widthBits).toInt); br.align()
    val grpLen = Array.fill(ng)(lenRef + br.get(lenBits).toInt * lenInc); br.align()
    grpLen(ng - 1) = lastLen
    val total = grpLen.map(_.toLong).sum
    if (total != numValues) fail(s"group lengths sum to $total, expected $numValues")

    val x = new Array[Long](numValues)
    var i = 0
    var g = 0
    while (g < ng) {
      val w = grpWidth(g)
      if (w < 0 || w > 32) fail(s"group width out of range: $w")
      val ref = grpRef(g)
      var j = 0
      while (j < grpLen(g)) { x(i) = ref + br.get(w); i += 1; j += 1 }
      g += 1
    }

    if (sdOrder > 0) {
      if (numValues <= sdOrder) fail(s"$numValues points with order-$sdOrder differencing")
      val gmin = descriptors(sdOrder)
      i = sdOrder
      while (i < numValues) { x(i) += gmin; i += 1 }
      // overwrite the placeholder slots with the transported initial values,
      // then integrate the differences back to the field
      var o = 0
      while (o < sdOrder) { x(o) = descriptors(o); o += 1 }
      if (sdOrder == 1) {
        i = 1
        while (i < numValues) { x(i) += x(i - 1); i += 1 }
      } else {
        i = 2
        while (i < numValues) { x(i) += 2 * x(i - 1) - x(i - 2); i += 1 }
      }
    }

    val mul = math.pow(2.0, eScale)
    val div = math.pow(10.0, dScale)
    val out = new Array[Double](numValues)
    i = 0
    while (i < numValues) { out(i) = (rRef.toDouble + x(i) * mul) / div; i += 1 }
    out
  }

  /** Section-7 payload of DRT 5.41: a PNG bitstream whose raster carries
    * the scaled integers — 1-band rasters (grayscale, wire depths
    * 1/2/4/8/16) read the sample directly, 3-band rasters (wire depth 24)
    * compose big-endian RGB. 4-band (depth 32, RGBA) and palette-indexed
    * rasters are not a shape any 5.41 packer emits and fail fast.
    * Undecodable bytes route through the malformed-wire IOException
    * channel like every other corrupt section.
    */
  private def unpackPng(bytes: Array[Byte], dataPos: Int, dataEnd: Int,
      numValues: Int, rRef: Float, eScale: Int, dScale: Int,
      nbits: Int): Array[Double] = {
    if (dataEnd > bytes.length || dataPos > dataEnd) fail("section 7 overruns the message")
    val slice = java.util.Arrays.copyOfRange(bytes, dataPos, dataEnd)
    javax.imageio.ImageIO.setUseCache(false) // no executor-local temp spill
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(slice))
      catch { case e: Exception => fail(s"PNG-packed data failed to decode: ${e.getMessage}") }
    if (img == null) fail("PNG-packed data: no ImageIO reader matched")
    val w = img.getWidth
    val h = img.getHeight
    if (w.toLong * h != numValues)
      fail(s"PNG raster ${w}x$h carries ${w.toLong * h} pixels for $numValues declared values")
    val raster = img.getRaster
    val bands = raster.getNumBands
    if (bands != 1 && bands != 3)
      fail(s"unsupported PNG-packed band count $bands")
    if (bands == 1 && img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel])
      fail("palette-indexed PNG is not a 5.41 packing shape")
    // cross-check the raster's ACTUAL depth against the depth octet 20
    // declares (the [[encodePng]] mapping: ≤8 → 8-bit gray, ≤16 → 16-bit
    // gray, ≤24 → 8-bit RGB) — a mismatched payload would otherwise decode
    // silently wrong (16-bit gray declared as 8 scales every value ~257×;
    // 48-bit RGB masked &0xff truncates the high bits) instead of failing
    // through the malformed-wire channel, like the pixel-count check above
    val (wantBands, wantSample) =
      if (nbits <= 8) (1, 8) else if (nbits <= 16) (1, 16) else (3, 8)
    val sampleBits = raster.getSampleModel.getSampleSize(0)
    if (bands != wantBands || sampleBits != wantSample)
      fail(s"PNG raster depth mismatch: declared $nbits bits/value wants " +
        s"$wantBands band(s) x $wantSample-bit, decoded $bands x $sampleBits-bit")
    val mul = math.pow(2.0, eScale)
    val div = math.pow(10.0, dScale)
    val out = new Array[Double](numValues)
    var idx = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v: Long =
          if (bands == 1) raster.getSample(x, y, 0).toLong & 0xffffffffL
          else ((raster.getSample(x, y, 0).toLong & 0xff) << 16) |
            ((raster.getSample(x, y, 1).toLong & 0xff) << 8) |
            (raster.getSample(x, y, 2).toLong & 0xff)
        out(idx) = (rRef.toDouble + v * mul) / div
        idx += 1
        x += 1
      }
      y += 1
    }
    out
  }

  // CCSDS 121.0-B-2 AEC flag bits (template 5.42 octet 22; libaec public ABI)
  private val CcsdsSigned = 0x01
  private val CcsdsMsb = 0x04
  private val CcsdsPreprocess = 0x08
  private val CcsdsRestricted = 0x10
  private val CcsdsPadRsi = 0x20

  /** Section-7 payload of DRT 5.42: a CCSDS 121.0-B-2 adaptive-entropy
    * (Rice) coded stream, as produced by libaec/eccodes for real ECMWF
    * products. The stream is a sequence of coded blocks of `blockSize`
    * samples; every `rsiBlocks` blocks start a reference-sample interval
    * whose first sample is stored raw (when the unit-delta preprocessor is
    * on) and whose remaining samples are mapped prediction errors. Per
    * block, an ID field selects the coding option:
    *
    *   - all-ones ID          → uncompressed: `nbits` raw bits per sample
    *   - ID k (1..)           → split: unary (FS) high parts for the whole
    *                            block, then k−1 low bits per sample
    *   - ID 0 + extension '0' → run of all-zero blocks (FS-coded length;
    *                            run value 5 = "rest of 64-block segment")
    *   - ID 0 + extension '1' → second extension: FS-coded pair index
    *                            m = (a+b)(a+b+1)/2 + b per sample pair
    *
    * Reference: CCSDS 121.0-B-2 (public Blue Book) §3–5; wire layout of
    * template 5.42 per WMO GRIB2 code tables. The reference pipeline gets
    * this codec from eccodes+libaec (`pipeline-python/grib2/adapters/
    * ecmwf_adapter.py` via pygrib); this is a clean-room Scala decoder.
    */
  private def unpackCcsds(bytes: Array[Byte], dataPos: Int, dataEnd: Int,
      numValues: Int, rRef: Float, eScale: Int, dScale: Int, nbits: Int,
      flags: Int, blockSize: Int, rsiBlocks: Int): Array[Double] = {
    if (nbits < 1 || nbits > 32) fail(s"CCSDS bits-per-sample out of range: $nbits")
    if (blockSize != 8 && blockSize != 16 && blockSize != 32 && blockSize != 64)
      fail(s"CCSDS block size must be 8/16/32/64, got $blockSize")
    if (rsiBlocks < 1) fail(s"CCSDS reference sample interval out of range: $rsiBlocks")
    if ((flags & CcsdsRestricted) != 0) fail("CCSDS restricted coding not supported")
    // the decoder assumes MSB-first unsigned samples throughout; a stream
    // declaring signed or LSB-first data would decode to silently-wrong
    // values, so refuse it the same way restricted coding is refused
    if ((flags & CcsdsSigned) != 0) fail("CCSDS signed samples not supported")
    if ((flags & CcsdsMsb) == 0) fail("CCSDS LSB-first samples not supported")
    val preprocess = (flags & CcsdsPreprocess) != 0
    val idLen = if (nbits > 16) 5 else if (nbits > 8) 4 else if (nbits > 4) 3
      else if (nbits > 2) 2 else 1
    val uncompId = (1 << idLen) - 1
    val xmax = (1L << nbits) - 1
    val fsLimit = (1 << math.min(nbits, 28)) + 64 // any valid FS is far below this
    val br = new BitReader(bytes, dataPos, dataEnd)
    val x = new Array[Long](numValues)
    var rsiStart = 0
    while (rsiStart < numValues) {
      val rsiSamples = math.min(rsiBlocks * blockSize, numValues - rsiStart)
      val rsiBlocksUsed = (rsiSamples + blockSize - 1) / blockSize
      var b = 0
      while (b < rsiBlocksUsed) {
        val blkStart = rsiStart + b * blockSize
        val blkSamples = math.min(blockSize, rsiStart + rsiSamples - blkStart)
        val ref = preprocess && b == 0 // reference sample leads each RSI
        val id = br.get(idLen).toInt
        if (id == uncompId) {
          var i = 0
          while (i < blkSamples) { x(blkStart + i) = br.get(nbits); i += 1 }
          b += 1
        } else if (id > 0) {
          // split mode, k low bits split off: FS high parts for the whole
          // block first, then the k-bit low parts in sample order
          val k = id - 1
          if (ref) x(blkStart) = br.get(nbits)
          val start = if (ref) 1 else 0
          var i = start
          while (i < blkSamples) { x(blkStart + i) = br.fs(fsLimit).toLong << k; i += 1 }
          i = start
          while (i < blkSamples) { x(blkStart + i) |= br.get(k); i += 1 }
          b += 1
        } else {
          val secondExt = br.get(1) == 1L
          if (ref) x(blkStart) = br.get(nbits)
          if (secondExt) {
            var i = if (ref) 1 else 0
            while (i < blkSamples) {
              val m = br.fs(fsLimit)
              var g = 0
              while ((g + 1).toLong * (g + 2) / 2 <= m) g += 1
              val d1 = m - g.toLong * (g + 1) / 2
              val d0 = g - d1
              // pairs are laid out on even boundaries; a leading reference
              // sample consumes the first pair's first element
              if ((i & 1) == 0) {
                x(blkStart + i) = d0; i += 1
                if (i < blkSamples) { x(blkStart + i) = d1; i += 1 }
                else if (d1 != 0) fail("second-extension pair overruns block")
              } else {
                x(blkStart + i) = d1; i += 1
              }
            }
            b += 1
          } else {
            // zero-block run; FS value 4 = "rest of segment" (ROS): zero to
            // the end of the current 64-block segment within this RSI
            val f = br.fs(fsLimit)
            var zb = f + 1
            if (zb == 5) zb = math.min(rsiBlocksUsed - b, 64 - (b % 64))
            else if (zb > 5) zb -= 1
            if (zb > rsiBlocksUsed - b) fail(s"zero-block run of $zb crosses the RSI boundary")
            var bb = 0
            while (bb < zb) {
              val s0 = rsiStart + (b + bb) * blockSize
              val ns = math.min(blockSize, rsiStart + rsiSamples - s0)
              var i = if (bb == 0 && ref) 1 else 0
              while (i < ns) { x(s0 + i) = 0L; i += 1 }
              bb += 1
            }
            b += zb
          }
        }
      }
      if (preprocess) {
        // invert the unit-delta mapper: prediction is the previous sample,
        // theta the headroom to the nearer range edge; mapped d ≤ 2θ
        // alternates sign by parity, d > 2θ is the one-sided overflow
        var prev = x(rsiStart)
        if (prev > xmax) fail(s"reference sample $prev exceeds $xmax")
        var i = rsiStart + 1
        while (i < rsiStart + rsiSamples) {
          val dd = x(i)
          val theta = math.min(prev, xmax - prev)
          val v =
            if (dd > 2 * theta) { if (theta == prev) prev + (dd - theta) else prev - (dd - theta) }
            else if ((dd & 1L) == 1L) prev - ((dd + 1L) >> 1)
            else prev + (dd >> 1)
          if (v < 0L || v > xmax) fail(s"CCSDS post-processed sample $v out of [0, $xmax]")
          x(i) = v
          prev = v
          i += 1
        }
      }
      if ((flags & CcsdsPadRsi) != 0) br.align()
      rsiStart += rsiSamples
    }
    val mul = math.pow(2.0, eScale)
    val div = math.pow(10.0, dScale)
    val out = new Array[Double](numValues)
    var i = 0
    while (i < numValues) { out(i) = (rRef.toDouble + x(i) * mul) / div; i += 1 }
    out
  }

  /** Split a (possibly multi-message) GRIB file into per-message byte
    * slices WITHOUT decoding — only the 16-byte section-0 headers are read.
    * The distributed-ingest lever for few-huge-files inputs: a landing
    * file's messages re-partition across executors and decode in parallel
    * (each message is independently decodable by construction).
    */
  def splitMessages(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = ArrayBuffer[Array[Byte]]()
    var off = 0
    while (off + 16 <= bytes.length) {
      if (!(bytes(off) == 'G' && bytes(off + 1) == 'R' &&
            bytes(off + 2) == 'I' && bytes(off + 3) == 'B'))
        fail(s"bad magic at offset $off")
      val r = new Reader(bytes, off + 8)
      val totalLen = r.u64()
      if (totalLen < 20 || off + totalLen > bytes.length)
        fail(s"message length $totalLen at offset $off overruns the file")
      out += java.util.Arrays.copyOfRange(bytes, off, off + totalLen.toInt)
      off += totalLen.toInt
    }
    if (out.isEmpty) fail("no GRIB messages found")
    out.toSeq
  }

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
      // same bound splitMessages enforces: a truncated file declaring a
      // length past the buffer must fail here, not surface later as an
      // unclassified ArrayIndexOutOfBounds from a section read
      if (totalLen < 20 || off + totalLen > bytes.length)
        fail(s"message length $totalLen at offset $off overruns the file")
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
    var bitmap: Array[Boolean] = null
    // complex packing (DRT 5.2/5.3) state
    var drTemplate = 0
    var ng = 0
    var widthRef = 0; var widthBits = 0
    var lenRef = 0; var lenInc = 0; var lastLen = 0; var lenBits = 0
    var sdOrder = 0; var sdOctets = 0
    // CCSDS packing (DRT 5.42) state
    var ccsdsFlags = 0; var ccsdsBlock = 0; var ccsdsRsi = 0

    var pos = msgOff + 16
    val end = msgOff + totalLen.toInt - 4 // trailing "7777"
    while (pos < end) {
      val r = new Reader(bytes, pos)
      val secLen = r.u32().toInt
      // a zero/short length would loop this cursor forever, and a length
      // past the message end would let later reads (incl. the BitReader's
      // dataEnd bound) index beyond the buffer as AIOOBE instead of the
      // IOException fail channel — validate the wire field before use
      if (secLen < 5 || pos + secLen.toLong > end)
        fail(s"section length $secLen out of message bounds at offset $pos")
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
          if (template != 0 && template != 40 && template != 30 &&
              template != 20 && template != 10)
            fail(s"unsupported grid template 3.$template")
          // a section LENGTH that understates its template's fixed size
          // would read the next section's header bytes as projection/grid
          // parameters — silently wrong coordinates that still pass every
          // later check, or an AIOOBE past the last message. Bound FIRST.
          val templateLen =
            if (template == 30) 81 else if (template == 20) 65 else 72 // 3.10/3.0/3.40 all 72
          if (secLen < templateLen)
            fail(s"section 3 length $secLen too short for template 3.$template ($templateLen)")
          r.skip(1 + 5 + 5 + 5) // earth shape + radius + axes
          val ni = r.u32().toInt
          val nj = r.u32().toInt
          if (template == 10) {
            // Mercator: first point, standard parallel, derived last point,
            // then (wire order!) scan mode, orientation, Di/Dj
            val la1 = r.sm32() / 1e6
            val lo1 = r.u32() / 1e6
            r.skip(1) // resolution flags
            val laD = r.sm32() / 1e6
            r.skip(4 + 4) // La2/Lo2 (derived from the increments)
            val scanM = r.u8()
            if ((scanM & 0xb0) != 0) fail(f"unsupported scanning mode 0x$scanM%02x")
            val orient = r.u32()
            // a rotated Mercator (i not along the equator) has no faithful
            // representation here — silently decoding it as equator-aligned
            // would mis-place every point
            if (orient != 0) fail(s"unsupported mercator orientation $orient")
            val dx = r.u32() / 1000.0 // wire 10^-3 m → metres
            val dy = r.u32() / 1000.0
            if (ni.toLong * nj != nPoints) fail(s"grid $ni x $nj != $nPoints points")
            if (dx <= 0 || dy <= 0) fail(s"bad mercator grid spacing ${dx}x$dy m")
            // cos LaD is the cylinder scale: at a pole it vanishes and the
            // metre spacing maps to unbounded degrees — quarantine, with
            // the same millidegree margin as the other projected grids
            if (math.abs(laD) > 90 || math.cos(math.toRadians(laD)) < 1e-6)
              fail(s"unsupported mercator LaD $laD")
            // first point at (or within a millidegree of) a pole: its
            // projected y diverges through ln tan(π/2)
            if (math.abs(la1) > 90.0 - 1e-3)
              fail(s"mercator first-point latitude $la1 at a pole")
            grid = GridSpec.mercator(ni, nj, la1, lo1,
              MercatorSpec(laD, dx, dy, yPositive = (scanM & 0x40) != 0))
          } else if (template == 20) {
            // polar stereographic: first point, then the projection params
            val la1 = r.sm32() / 1e6
            val lo1 = r.u32() / 1e6
            r.skip(1) // resolution flags
            val laD = r.sm32() / 1e6
            val loV = r.u32() / 1e6
            val dx = r.u32() / 1000.0 // wire 10^-3 m → metres
            val dy = r.u32() / 1000.0
            val centre = r.u8()
            // flag table 3.5: bit 1 (0x80) = south pole on the plane; bit 2
            // (0x40) = bipolar/symmetric — not a shape this decoder can
            // represent faithfully, refuse
            if ((centre & 0x7f) != 0) fail(f"unsupported projection centre flag 0x$centre%02x")
            val south = (centre & 0x80) != 0
            val scanP = r.u8()
            if ((scanP & 0xb0) != 0) fail(f"unsupported scanning mode 0x$scanP%02x")
            if (ni.toLong * nj != nPoints) fail(s"grid $ni x $nj != $nPoints points")
            if (dx <= 0 || dy <= 0) fail(s"bad polar grid spacing ${dx}x$dy m")
            if (math.abs(la1) > 90 || math.abs(laD) > 90)
              fail(s"bad polar latitudes la1=$la1 laD=$laD")
            // a first point at (or within a millidegree of) the projection's
            // FAR pole maps to tan(±π/2) — absurd-but-finite radii, the
            // same degenerate-wire class as the near-antisymmetric Lambert
            // cone: quarantine through the malformed channel
            if (if ((centre & 0x80) != 0) la1 > 90.0 - 1e-3 else la1 < -90.0 + 1e-3)
              fail(s"first point la1=$la1 at the projection's far pole")
            // LaD at the opposite pole ⇒ projection constant c → 0 and the
            // inverse blows up: quarantine through the malformed channel
            if ((if (south) 1.0 - math.sin(math.toRadians(laD))
                 else 1.0 + math.sin(math.toRadians(laD))) < 1e-6)
              fail(s"unsupported LaD $laD for ${if (south) "south" else "north"}-polar grid")
            grid = GridSpec.polarStereographic(ni, nj, la1, lo1,
              PolarSpec(laD, loV, dx, dy, southPole = south,
                yPositive = (scanP & 0x40) != 0))
          } else if (template == 30) {
            // Lambert conformal: first point, then the projection params
            val la1 = r.sm32() / 1e6
            val lo1 = r.u32() / 1e6
            r.skip(1) // resolution flags
            val laD = r.sm32() / 1e6
            val loV = r.u32() / 1e6
            val dx = r.u32() / 1000.0 // wire 10^-3 m → metres
            val dy = r.u32() / 1000.0
            val centre = r.u8()
            if (centre != 0) fail(f"unsupported projection centre flag 0x$centre%02x")
            val scanL = r.u8()
            if ((scanL & 0xb0) != 0) fail(f"unsupported scanning mode 0x$scanL%02x")
            val latin1 = r.sm32() / 1e6
            val latin2 = r.sm32() / 1e6
            r.skip(4 + 4) // southern pole of projection
            if (ni.toLong * nj != nPoints) fail(s"grid $ni x $nj != $nPoints points")
            // degenerate wire parameters surface through the codec's
            // IOException channel like every other malformed-wire case —
            // LambertSpec's own require is a programming-error guard, not
            // the quarantine path a corrupt file must take
            if (dx <= 0 || dy <= 0) fail(s"bad lambert grid spacing ${dx}x$dy m")
            // NEAR-antisymmetric parallels (0.001/−0.001) are as degenerate
            // as exact ones: the cone constant n ≈ sin((latin1+latin2)/2)
            // underflows toward 0 and rF = R·cosφ₁·t₁ⁿ/n blows up into
            // absurd-but-finite coordinates — quarantine them through the
            // malformed-wire channel, not just the exact-zero sum
            if (math.abs(latin1) >= 90 || math.abs(latin2) >= 90 ||
                math.abs(latin1 + latin2) < 1e-3)
              fail(s"unsupported lambert cone parallels $latin1/$latin2")
            // first point at the cone's FAR pole (opposite the parallels'
            // hemisphere): ρ = rF / tan(π/4 + φ/2)ⁿ diverges — same
            // quarantine as the polar-stereographic far-pole case
            if (math.abs(la1) > 90) fail(s"bad lambert first-point latitude $la1")
            if (if (latin1 + latin2 > 0) la1 < -90.0 + 1e-3 else la1 > 90.0 - 1e-3)
              fail(s"first point la1=$la1 at the cone's far pole")
            grid = GridSpec.lambertConformal(ni, nj, la1, lo1,
              LambertSpec(laD, loV, latin1, latin2, dx, dy,
                yPositive = (scanL & 0x40) != 0))
          } else {
          val basicAngle = r.u32()
          // only basic angle 0 (micro-degree units) decodes faithfully —
          // accepting other values and still dividing by 1e6 would produce
          // silently wrong coordinates
          if (basicAngle != 0) fail(s"unsupported basic angle $basicAngle")
          r.skip(4) // subdivisions
          val lat1 = r.sm32() / 1e6
          val lon1 = r.u32() / 1e6
          r.skip(1) // resolution flags
          r.skip(4 + 4) // lat2/lon2 (derived from increments / the N table)
          val di = r.u32() / 1e6
          // octets 68-71: Dj on 3.0; N (parallels pole→equator) on 3.40
          val djOrN = r.u32()
          val scan = r.u8()
          if ((scan & 0xf0) != 0) fail(f"unsupported scanning mode 0x$scan%02x")
          if (ni.toLong * nj != nPoints) fail(s"grid $ni x $nj != $nPoints points")
          grid =
            if (template == 0) GridSpec(ni, nj, lat1, lon1, djOrN / 1e6, di)
            else {
              // Gaussian: locate the wire lat1 in the computed 2N-latitude
              // table (wire precision is micro-degrees; the Newton roots are
              // exact to ~1e-13°, so a 1e-5° tolerance separates cleanly)
              val n = djOrN.toInt
              if (n < 1 || n > 4096) fail(s"gaussian N out of range: $n")
              val gl = gaussianLatitudes(n)
              var start = 0
              var best = Double.MaxValue
              var k = 0
              while (k < gl.length) {
                val diff = math.abs(gl(k) - lat1)
                if (diff < best) { best = diff; start = k }
                k += 1
              }
              if (best > 1e-5)
                fail(f"first latitude $lat1%.6f is not a gaussian N=$n parallel")
              if (start + nj > 2 * n)
                fail(s"$nj rows from gaussian parallel $start overrun the ${2 * n}-row table")
              GridSpec.gaussian(ni, nj, n, start, lon1, di)
            }
          }
        case 4 =>
          r.skip(2) // NV
          val template = r.u16()
          val cat = r.u8()
          val num = r.u8()
          product = template match {
            case 0 => Meteo(cat, num)
            case 40 => Chemical(r.u16())
            case 8 => Meteo(cat, num) // placeholder until the interval block parses
            case t => fail(s"unsupported product template 4.$t")
          }
          r.skip(1 + 1 + 1 + 2 + 1) // process ids + cutoff
          val timeUnit = r.u8()
          val ft = r.u32().toInt
          // integer division would silently truncate a sub-hour value
          // (90 min -> 1 h) and shift validTime — fail like every other
          // unsupported case instead of mis-stamping the field
          def toHours(unit: Int, len: Int, what: String): Int = unit match {
            case 0 =>
              if (len % 60 != 0) fail(s"sub-hour $what ($len min) not supported")
              len / 60
            case 1 => len // hours
            case 2 => len * 24 // days
            case u => fail(s"unsupported time unit $u in $what")
          }
          forecastHours = toHours(timeUnit, ft, "forecast step")
          if (template == 8) {
            // PDT 4.8: the two fixed surfaces close the 4.0-shaped prefix,
            // then end-of-overall-interval time and the time-range block
            if (secLen < 58)
              fail(s"section 4 length $secLen too short for template 4.8 (58)")
            r.skip(6 + 6) // first + second fixed surface (octets 23-34)
            val ey = r.u16(); val emo = r.u8(); val ed = r.u8()
            val eh = r.u8(); val emi = r.u8(); val es = r.u8()
            val nRanges = r.u8()
            // a multi-range statistic (nested accumulations) mis-read as a
            // single range would mis-stamp the field — refuse
            if (nRanges != 1) fail(s"unsupported $nRanges statistical time ranges")
            r.skip(4) // values missing from the statistic
            val proc = r.u8()
            // table 4.10: only avg/accum/max/min decode; difference &c.
            // have no faithful downstream semantic here
            if (proc > 3) fail(s"unsupported statistical process $proc")
            r.skip(1) // increment type
            val rangeHours = toHours(r.u8(), r.u32().toInt, "statistical range")
            if (rangeHours < 1) fail(s"empty statistical range $rangeHours h")
            // the wire's declared interval end must equal start + range —
            // a mismatch means the octets were produced (or parsed) wrong,
            // and trusting either side silently would mis-stamp validTime
            val end =
              try LocalDateTime.of(ey, emo, ed, eh, emi, es)
              catch { case _: java.time.DateTimeException =>
                fail(s"bad statistical interval end $ey-$emo-$ed $eh:$emi:$es") }
            val expect = refTime.plusHours(forecastHours.toLong + rangeHours.toLong)
            if (end != expect)
              fail(s"statistical interval end $end != start+range $expect")
            product = Statistical(cat, num, proc, rangeHours)
          }
        case 5 =>
          numValues = r.u32().toInt
          // u32 wire field read as Int: 2^31..2^32-1 wraps negative and
          // crashes array allocation downstream — same guard class as
          // unpackComplex's lenRef/lastLen
          if (numValues < 0) fail(s"section 5 point count out of range: $numValues")
          val template = r.u16()
          if (template != 0 && template != 2 && template != 3 &&
              template != 41 && template != 42)
            fail(s"unsupported data representation 5.$template")
          drTemplate = template
          rRef = r.f32()
          eScale = r.sm16()
          dScale = r.sm16()
          nbits = r.u8()
          // wire-read u8 (0..255): past 32 the unpack accumulator wraps and
          // values silently decode wrong — same guard class as unpackComplex
          if (nbits > 32) fail(s"bits-per-value out of range: $nbits")
          if (template == 41) {
            // octet 21: type of original field values; the image depth
            // rode octet 20 (read as nbits above) — constrain it to the
            // PNG depths a conformant packer can emit
            if (nbits != 0 && nbits != 1 && nbits != 2 && nbits != 4 &&
                nbits != 8 && nbits != 16 && nbits != 24)
              fail(s"unsupported PNG image depth $nbits")
            r.skip(1)
          }
          if (template == 42) {
            r.skip(1) // type of original field values
            ccsdsFlags = r.u8()
            ccsdsBlock = r.u8()
            ccsdsRsi = r.u16()
          }
          if (template == 2 || template == 3) {
            r.skip(1) // type of original field values
            val splitting = r.u8()
            if (splitting != 1) fail(s"unsupported group splitting method $splitting")
            val missingMgmt = r.u8()
            if (missingMgmt != 0) fail(s"missing-value management not supported ($missingMgmt)")
            r.skip(8) // primary/secondary missing substitutes
            ng = r.u32().toInt
            widthRef = r.u8(); widthBits = r.u8()
            lenRef = r.u32().toInt; lenInc = r.u8()
            lastLen = r.u32().toInt
            lenBits = r.u8()
            if (template == 3) {
              sdOrder = r.u8()
              if (sdOrder < 1 || sdOrder > 2) fail(s"unsupported spatial differencing order $sdOrder")
              sdOctets = r.u8()
              if (sdOctets < 1 || sdOctets > 8) fail(s"bad descriptor octet count $sdOctets")
            }
          }
        case 6 =>
          bitmapIndicator = r.u8()
          bitmapIndicator match {
            case 255 => // no bitmap
            case 0 =>
              if (grid == null) fail("bitmap before grid definition")
              if (secLen < 6 + (grid.numPoints + 7) / 8)
                fail(s"bitmap section length $secLen too short for ${grid.numPoints} points")
              bitmap = new Array[Boolean](grid.numPoints)
              var i = 0
              while (i < grid.numPoints) {
                bitmap(i) = (bytes(r.pos + (i >> 3)) & (0x80 >> (i & 7))) != 0
                i += 1
              }
            case ind => fail(s"unsupported bitmap indicator $ind (only 0 and 255)")
          }
        case 7 =>
          val dataEnd = pos + secLen // section 7 body ends here; reads beyond = corrupt
          if (drTemplate == 42) {
            values = unpackCcsds(bytes, r.pos, dataEnd, numValues, rRef, eScale,
              dScale, nbits, ccsdsFlags, ccsdsBlock, ccsdsRsi)
          } else if (drTemplate == 2 || drTemplate == 3) {
            values = unpackComplex(bytes, r.pos, dataEnd, numValues, rRef, eScale, dScale,
              nbits, ng, widthRef, widthBits, lenRef, lenInc, lastLen, lenBits,
              sdOrder, sdOctets)
          } else if (nbits == 0) {
            values = Array.fill(numValues)(rRef.toDouble / math.pow(10.0, dScale))
          } else if (drTemplate == 41) {
            values = unpackPng(bytes, r.pos, dataEnd, numValues, rRef, eScale, dScale, nbits)
          } else {
            if (numValues.toLong * nbits > (secLen - 5).toLong * 8)
              fail(s"section 7 too short: $numValues x $nbits-bit values in ${secLen - 5} octets")
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
          // scatter present-point values over the grid, NaN where the
          // bitmap says missing
          if (bitmap != null) {
            val present = bitmap.count(identity)
            if (present != numValues)
              fail(s"bitmap has $present set bits but section 5 declares $numValues values")
            val full = new Array[Double](bitmap.length)
            var src = 0
            var i = 0
            while (i < bitmap.length) {
              if (bitmap(i)) { full(i) = values(src); src += 1 }
              else full(i) = Double.NaN
              i += 1
            }
            values = full
          }
        case 8 => // end section reached via loop bound; not expected here
        case n => fail(s"unexpected section $n")
      }
      pos += secLen
    }
    if (refTime == null || grid == null || product == null || values == null)
      fail("incomplete message (missing section 1, 3, 4, or 7)")
    if (values.length != grid.numPoints)
      fail(s"${values.length} decoded values for ${grid.numPoints}-point grid (missing bitmap?)")
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
    (g.lambert, g.polar, g.mercator) match {
      case (None, None, Some(ms)) =>
        // Mercator: the same projected-metres walk; within a ROW the
        // latitude is constant (the cylinder's parallel) and within a
        // COLUMN the longitude is constant — but both still come from the
        // per-point Snyder inverse for uniformity with 3.30/3.20
        val p = Mrc.proj(ms, g.lon1Deg)
        val (x1, y1) = Mrc.forward(p, g.lat1Deg, g.lon1Deg)
        val ySign = if (ms.yPositive) 1.0 else -1.0
        var idx = 0
        var j = 0
        while (j < g.nj) {
          val y = y1 + ySign * j * ms.dyM
          var i = 0
          while (i < g.ni) {
            val (la, lo) = Mrc.inverse(p, x1 + i * ms.dxM, y)
            lats(idx) = la
            lons(idx) = Grib.normalizeLon(lo)
            idx += 1
            i += 1
          }
          j += 1
        }
      case (Some(lc), _, _) =>
        // Lambert conformal: regular in PROJECTED metres, anchored at the
        // first point; every grid point inverse-projects individually
        val p = Lcc.proj(lc)
        val (x1, y1) = Lcc.forward(p, g.lat1Deg, g.lon1Deg)
        val ySign = if (lc.yPositive) 1.0 else -1.0
        var idx = 0
        var j = 0
        while (j < g.nj) {
          val y = y1 + ySign * j * lc.dyM
          var i = 0
          while (i < g.ni) {
            val (la, lo) = Lcc.inverse(p, x1 + i * lc.dxM, y)
            lats(idx) = la
            lons(idx) = Grib.normalizeLon(lo)
            idx += 1
            i += 1
          }
          j += 1
        }
      case (None, Some(ps), _) =>
        // polar stereographic: same projected-metres walk, Snyder polar
        // inverse per point
        val p = Pst.proj(ps)
        val (x1, y1) = Pst.forward(p, g.lat1Deg, g.lon1Deg)
        val ySign = if (ps.yPositive) 1.0 else -1.0
        var idx = 0
        var j = 0
        while (j < g.nj) {
          val y = y1 + ySign * j * ps.dyM
          var i = 0
          while (i < g.ni) {
            val (la, lo) = Pst.inverse(p, x1 + i * ps.dxM, y)
            lats(idx) = la
            lons(idx) = Grib.normalizeLon(lo)
            idx += 1
            i += 1
          }
          j += 1
        }
      case (None, None, None) =>
        val rows = g.rowLats // regular arithmetic or the Gaussian table window
        var idx = 0
        var j = 0
        while (j < g.nj) {
          val lat = rows(j)
          var i = 0
          while (i < g.ni) {
            lats(idx) = lat
            lons(idx) = Grib.normalizeLon(g.lon1Deg + i * g.dLonDeg)
            idx += 1
            i += 1
          }
          j += 1
        }
    }
    (lats, lons)
  }

  private final case class DecodedMessage(
      variableName: String, unit: String, timestamp: Timestamp,
      values: Array[Double], lats: Array[Double], lons: Array[Double])
    extends GribMessage

  /** `(values, lats, lons)` with bitmap-missing points dropped — the
    * irregular-points form downstream already handles (F1's reshape
    * fallback). A bitmap-free message passes through untouched.
    */
  private def presentArrays(d: Decoded): (Array[Double], Array[Double], Array[Double]) = {
    val (lats, lons) = gridArrays(d.grid)
    if (!d.values.exists(isMissing)) (d.values, lats, lons)
    else {
      val idx = d.values.indices.filterNot(i => isMissing(d.values(i))).toArray
      (idx.map(d.values), idx.map(lats), idx.map(lons))
    }
  }

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
        val (values, lats, lons) = presentArrays(d)
        DecodedMessage(name, "kg m-3", d.validTime, values, lats, lons)
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
    /** Interval-statistic parameters (PDT 4.8): (category, number) →
      * (name, unit). Total precipitation is the canonical accumulated
      * field (ECMWF `tp`, kg m⁻² ≡ mm of water).
      */
    val StatVariableNames: Map[(Int, Int), (String, String)] =
      Map((1, 8) -> ("total_precipitation", "kg m-2")) // WMO 4.2 disc 0 cat 1 num 8

    def openBytes(bytes: Array[Byte]): Iterator[GribMessage] =
      decode(bytes).iterator.map { d =>
        val (name, unit) = d.product match {
          case Meteo(c, n) =>
            (VariableNames.getOrElse((c, n), fail(s"unknown parameter ${(c, n)}")), "K")
          case Statistical(c, n, _, _) =>
            StatVariableNames.getOrElse((c, n), fail(s"unknown statistical parameter ${(c, n)}"))
          case p => fail(s"ECMWF reader expects meteo products, got $p")
        }
        val (values, lats, lons) = presentArrays(d)
        // validTime is the interval END for 4.8 — the archive convention
        DecodedMessage(name, unit, d.validTime, values, lats, lons)
      }

    override def open(path: String): Iterator[GribMessage] =
      openBytes(Files.readAllBytes(Paths.get(path)))
  }
}
