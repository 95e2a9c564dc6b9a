package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UuidV7
import graft.sources.Grib

/** Property-based checks for the pure (driver-side) functions — scalacheck
  * driven directly (no scalatest bridge in the offline cache).
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(result.passed, result.status.toString)
  }

  test("normalizeLon maps any longitude into [-180, 180) and is idempotent") {
    check(Prop.forAll(Gen.chooseNum(-1e6, 1e6)) { lon =>
      val n = Grib.normalizeLon(lon)
      val inRange = n >= -180.0 && n < 180.0
      val idempotent = math.abs(Grib.normalizeLon(n) - n) < 1e-9
      val diff = math.abs((lon - n) % 360.0)
      val sameAngle = diff < 1e-6 || math.abs(diff - 360.0) < 1e-6
      inRange && idempotent && sameAngle
    })
  }

  test("UuidV7 time ordering is monotone in epoch millis") {
    check(Prop.forAll(Gen.chooseNum(0L, 1L << 47), Gen.chooseNum(0L, 1L << 47)) {
      (a, b) =>
        a == b || {
          val (lo, hi) = if (a < b) (a, b) else (b, a)
          UuidV7.deterministic(lo, 1L) < UuidV7.deterministic(hi, 1L)
        }
    })
  }

  test("deterministic UuidV7 is a pure function of (millis, seed)") {
    check(Prop.forAll(Gen.chooseNum(0L, 1L << 40), Gen.choose(Long.MinValue, Long.MaxValue)) {
      (ms, seed) => UuidV7.deterministic(ms, seed) == UuidV7.deterministic(ms, seed)
    })
  }

  test("GRIB2 encode→decode round-trips any grid within the packing quantum") {
    import graft.sources.Grib2
    val refTime = java.time.LocalDateTime.of(2024, 6, 1, 0, 0)
    val genCase = for {
      ni <- Gen.choose(1, 20)
      nj <- Gen.choose(1, 12)
      lat1 <- Gen.chooseNum(-89.0, 89.0)
      lon1 <- Gen.chooseNum(0.0, 359.9)
      nbits <- Gen.oneOf(8, 16, 24)
      base <- Gen.oneOf(-40.0, 0.0, 280.0, 5e-9, 1.6e7)
      amp <- Gen.chooseNum(0.0, 50.0)
      seed <- Gen.choose(0, 10000)
    } yield (Grib2.GridSpec(ni, nj, lat1, lon1, 0.25, 0.25), nbits, base, amp, seed)
    check(Prop.forAll(genCase) { case (grid, nbits, base, amp, seed) =>
      val scale = if (base.abs < 1e-3 && base != 0.0) base.abs else 1.0
      val values = Array.tabulate(grid.numPoints)(i =>
        base + amp * scale * math.sin(i * 0.7 + seed))
      val bytes = Grib2.encode(Grib2.Meteo(0, 0), grid, refTime, 3, values, nbits)
      val d = Grib2.decode(bytes).head
      val range = values.max - values.min
      // error sources: one packing quantum + the float32 granularity of the
      // reference value R (dominates for large-magnitude, small-range fields)
      val f32ulp = math.ulp(values.min.toFloat).toDouble
      val quantum = range / ((1L << nbits) - 1).toDouble * 1.01 + 2 * f32ulp + 1e-12
      d.values.length == values.length &&
        values.zip(d.values).forall { case (v, got) => math.abs(v - got) <= quantum }
    })
  }

  test("projected grids (3.30/3.20/3.10, any supported params) round-trip the wire") {
    import graft.sources.Grib2
    val refTime = java.time.LocalDateTime.of(2024, 6, 1, 0, 0)
    val genDx = Gen.chooseNum(1000.0, 500000.0)
    val genLambert = for {
      latin1 <- Gen.chooseNum(-80.0, 80.0)
      latin2 <- Gen.chooseNum(-80.0, 80.0)
      if math.abs(latin1 + latin2) >= 0.1
      laD <- Gen.chooseNum(-80.0, 80.0)
      loV <- Gen.chooseNum(0.0, 359.9)
      la1 <- Gen.chooseNum(-60.0, 70.0)
      lon1 <- Gen.chooseNum(0.0, 359.9)
      dx <- genDx; dy <- genDx; yPos <- Gen.oneOf(true, false)
    } yield Grib2.GridSpec.lambertConformal(7, 5, la1, lon1,
      Grib2.LambertSpec(laD, loV, latin1, latin2, dx, dy, yPos))
    val genPolar = for {
      south <- Gen.oneOf(true, false)
      laDm <- Gen.chooseNum(30.0, 89.0)
      loV <- Gen.chooseNum(0.0, 359.9)
      la1m <- Gen.chooseNum(0.0, 85.0)
      lon1 <- Gen.chooseNum(0.0, 359.9)
      dx <- genDx; dy <- genDx; yPos <- Gen.oneOf(true, false)
    } yield Grib2.GridSpec.polarStereographic(7, 5,
      if (south) -la1m else la1m, lon1,
      Grib2.PolarSpec(if (south) -laDm else laDm, loV, dx, dy, south, yPos))
    val genMercator = for {
      laD <- Gen.chooseNum(-85.0, 85.0)
      la1 <- Gen.chooseNum(-85.0, 85.0)
      lon1 <- Gen.chooseNum(0.0, 359.9)
      dx <- genDx; dy <- genDx; yPos <- Gen.oneOf(true, false)
    } yield Grib2.GridSpec.mercator(7, 5, la1, lon1,
      Grib2.MercatorSpec(laD, dx, dy, yPos))
    val genCase = for {
      grid <- Gen.oneOf(genLambert, genPolar, genMercator)
      seed <- Gen.choose(0, 10000)
    } yield (grid, seed)
    check(Prop.forAll(genCase) { case (grid, seed) =>
      val values = Array.tabulate(grid.numPoints)(i =>
        280.0 + 30.0 * math.sin(i * 0.7 + seed))
      val d = Grib2.decode(
        Grib2.encode(Grib2.Meteo(0, 0), grid, refTime, 3, values, 16)).head
      val g = d.grid
      // wire quantization: lat/lon to micro-degrees (≤5e-7°), dx/dy to mm
      def degEq(a: Double, b: Double) = {
        val an = ((a % 360.0) + 360.0) % 360.0
        val bn = ((b % 360.0) + 360.0) % 360.0
        math.abs(an - bn) <= 1e-6 || math.abs(math.abs(an - bn) - 360.0) <= 1e-6
      }
      def mEq(a: Double, b: Double) = math.abs(a - b) <= 5e-4
      val specOk = (grid.lambert, grid.polar, grid.mercator) match {
        case (Some(w), _, _) =>
          val r = g.lambert.get
          degEq(r.laDDeg, w.laDDeg) && degEq(r.loVDeg, w.loVDeg) &&
            degEq(r.latin1Deg, w.latin1Deg) && degEq(r.latin2Deg, w.latin2Deg) &&
            mEq(r.dxM, w.dxM) && mEq(r.dyM, w.dyM) && r.yPositive == w.yPositive
        case (_, Some(w), _) =>
          val r = g.polar.get
          degEq(r.laDDeg, w.laDDeg) && degEq(r.loVDeg, w.loVDeg) &&
            mEq(r.dxM, w.dxM) && mEq(r.dyM, w.dyM) &&
            r.southPole == w.southPole && r.yPositive == w.yPositive
        case (_, _, Some(w)) =>
          val r = g.mercator.get
          degEq(r.laDDeg, w.laDDeg) &&
            mEq(r.dxM, w.dxM) && mEq(r.dyM, w.dyM) && r.yPositive == w.yPositive
        case _ => false
      }
      val quantum = 60.0 / ((1L << 16) - 1).toDouble * 1.01 +
        2 * math.ulp(250f).toDouble + 1e-12
      specOk && g.ni == grid.ni && g.nj == grid.nj &&
        degEq(g.lat1Deg, grid.lat1Deg) && degEq(g.lon1Deg, grid.lon1Deg) &&
        values.zip(d.values).forall { case (v, got) => math.abs(v - got) <= quantum }
    })
  }

  test("complex packing (5.2/5.3, any order/groupLen/missing mask) decodes identically to simple packing") {
    import graft.sources.Grib2
    val refTime = java.time.LocalDateTime.of(2024, 6, 1, 0, 0)
    val genCase = for {
      ni <- Gen.choose(2, 20)
      nj <- Gen.choose(1, 12)
      nbits <- Gen.oneOf(8, 12, 16)
      base <- Gen.oneOf(-40.0, 0.0, 280.0)
      amp <- Gen.chooseNum(0.0, 50.0)
      order <- Gen.oneOf(0, 1, 2)
      groupLen <- Gen.oneOf(1, 3, 7, 32, 500)
      missEvery <- Gen.oneOf(0, 3, 5) // 0 = no bitmap
      seed <- Gen.choose(0, 10000)
    } yield (Grib2.GridSpec(ni, nj, 50.0, 10.0, 0.25, 0.25),
      nbits, base, amp, order, groupLen, missEvery, seed)
    check(Prop.forAll(genCase) {
      case (grid, nbits, base, amp, order, groupLen, missEvery, seed) =>
        val values = Array.tabulate(grid.numPoints) { i =>
          if (missEvery > 0 && i % missEvery == 1) Double.NaN
          else base + amp * math.sin(i * 0.7 + seed)
        }
        val present = values.count(v => !v.isNaN)
        // both encoders need > order present points
        (present <= order) || {
          val simple = Grib2.decode(
            Grib2.encode(Grib2.Meteo(0, 0), grid, refTime, 3, values, nbits)).head
          val complex = Grib2.decode(Grib2.encodeComplex(Grib2.Meteo(0, 0), grid,
            refTime, 3, values, nbits, order, groupLen)).head
          // identical quantization → identical decode, NaNs in the same slots
          simple.values.length == complex.values.length &&
            simple.values.zip(complex.values).forall { case (a, b) =>
              (a.isNaN && b.isNaN) || a == b
            }
        }
    })
  }

  test("CCSDS packing (5.42, any block/rsi/missing mask) decodes identically to simple packing") {
    import graft.sources.Grib2
    val refTime = java.time.LocalDateTime.of(2024, 6, 1, 0, 0)
    val genCase = for {
      ni <- Gen.choose(2, 24)
      nj <- Gen.choose(1, 12)
      nbits <- Gen.oneOf(4, 8, 12, 16)
      base <- Gen.oneOf(-40.0, 0.0, 280.0)
      amp <- Gen.chooseNum(0.0, 50.0)
      blockSize <- Gen.oneOf(8, 16, 32, 64)
      rsiBlocks <- Gen.oneOf(1, 2, 7, 128)
      missEvery <- Gen.oneOf(0, 3, 5) // 0 = no bitmap
      seed <- Gen.choose(0, 10000)
    } yield (Grib2.GridSpec(ni, nj, 50.0, 10.0, 0.25, 0.25),
      nbits, base, amp, blockSize, rsiBlocks, missEvery, seed)
    check(Prop.forAll(genCase) {
      case (grid, nbits, base, amp, blockSize, rsiBlocks, missEvery, seed) =>
        val values = Array.tabulate(grid.numPoints) { i =>
          if (missEvery > 0 && i % missEvery == 1) Double.NaN
          else base + amp * math.sin(i * 0.7 + seed)
        }
        values.exists(v => !v.isNaN) && {
          val simple = Grib2.decode(
            Grib2.encode(Grib2.Meteo(0, 0), grid, refTime, 3, values, nbits)).head
          val ccsds = Grib2.decode(Grib2.encodeCcsds(Grib2.Meteo(0, 0), grid,
            refTime, 3, values, nbits, blockSize, rsiBlocks)).head
          // identical quantization → identical decode, NaNs in the same slots
          simple.values.length == ccsds.values.length &&
            simple.values.zip(ccsds.values).forall { case (a, b) =>
              (a.isNaN && b.isNaN) || a == b
            }
        }
    })
  }
}
