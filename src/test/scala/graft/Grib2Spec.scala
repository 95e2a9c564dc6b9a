package graft

import java.nio.file.Files
import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Grib2
import graft.sources.Grib2.{Chemical, GridSpec, Meteo}

/** Binary GRIB2 codec: encode → decode round-trips, adapter semantics
  * (constituentType / shortName mapping, valid time), packing error bounds,
  * and the reference's documented prime-meridian longitude corruption
  * (ADR 002) as an explicit regression.
  */
class Grib2Spec extends AnyFunSuite {

  private val refTime = LocalDateTime.of(2024, 6, 1, 0, 0, 0)

  /** Deterministic value field with realistic spatial structure. */
  private def field(grid: GridSpec, base: Double, amp: Double): Array[Double] =
    Array.tabulate(grid.numPoints) { idx =>
      val i = idx % grid.ni; val j = idx / grid.ni
      base + amp * (math.sin(i * 0.37) * math.cos(j * 0.23) + 1.0) / 2.0
    }

  test("round-trip: ECMWF temperature message survives encode→decode") {
    val grid = GridSpec(ni = 40, nj = 30, lat1Deg = 72.0, lon1Deg = 335.0,
      dLatDeg = 0.5, dLonDeg = 0.5)
    val values = field(grid, 250.0, 40.0) // Kelvin range
    val bytes = Grib2.encode(Meteo(0, 0), grid, refTime, 12, values, nbits = 16)

    val msgs = Grib2.decode(bytes)
    assert(msgs.length === 1)
    val d = msgs.head
    assert(d.product === Meteo(0, 0))
    assert(d.refTime === refTime)
    assert(d.forecastHours === 12)
    assert(d.grid.ni === 40 && d.grid.nj === 30)
    assert(math.abs(d.grid.lat1Deg - 72.0) < 1e-6)
    assert(d.values.length === values.length)
    // simple packing with 16 bits: error bounded by one quantum 2^E
    val range = values.max - values.min
    val quantum = range / ((1 << 16) - 1)
    values.zip(d.values).foreach { case (v, got) =>
      assert(math.abs(v - got) <= quantum + 1e-9, s"packing error beyond quantum")
    }
  }

  test("round-trip: tiny CAMS concentrations keep relative precision (negative E)") {
    val grid = GridSpec(20, 10, 60.0, 350.0, 0.1, 0.1)
    val values = field(grid, 5e-9, 4e-9) // kg m^-3 magnitudes
    val bytes = Grib2.encode(Chemical(40009), grid, refTime, 24, values, nbits = 24)
    val d = Grib2.decode(bytes).head
    assert(d.product === Chemical(40009))
    val quantum = (values.max - values.min) / ((1 << 24) - 1)
    values.zip(d.values).foreach { case (v, got) =>
      assert(math.abs(v - got) <= quantum + 1e-24)
    }
  }

  test("round-trip survives a minimum that float32 rounds UP") {
    // 16777219.0 rounds to 16777220f: R must step down, not underflow X
    val grid = GridSpec(4, 2, 50.0, 0.0, 1.0, 1.0)
    val values = Array(16777219.0, 16777221.0, 16777224.0, 16777229.0,
      16777219.0, 16777225.0, 16777227.0, 16777223.0)
    val bytes = Grib2.encode(Meteo(0, 0), grid, refTime, 0, values, nbits = 16)
    val d = Grib2.decode(bytes).head
    val quantum = math.max(1e-9, (values.max - values.min) / ((1 << 16) - 1)) * 2
    values.zip(d.values).foreach { case (v, got) =>
      assert(math.abs(v - got) <= quantum, s"$v decoded as $got")
    }
  }

  test("complex packing 5.2: round-trip decodes to the SAME values as simple packing") {
    // identical quantization (same R, E) means complex-packed decode must be
    // bit-identical to simple-packed decode, not just within a quantum
    val grid = GridSpec(ni = 40, nj = 30, lat1Deg = 72.0, lon1Deg = 335.0,
      dLatDeg = 0.5, dLonDeg = 0.5)
    val values = field(grid, 250.0, 40.0)
    val simple = Grib2.decode(Grib2.encode(Meteo(0, 0), grid, refTime, 12, values)).head
    val complex = Grib2.decode(Grib2.encodeComplex(Meteo(0, 0), grid, refTime, 12,
      values, order = 0)).head
    assert(complex.product === Meteo(0, 0) && complex.forecastHours === 12)
    assert(simple.values.sameElements(complex.values), "5.2 decode != 5.0 decode")
  }

  test("complex packing 5.3: spatial differencing orders 1 and 2 round-trip exactly") {
    val grid = GridSpec(ni = 50, nj = 20, lat1Deg = 60.0, lon1Deg = 350.0,
      dLatDeg = 0.25, dLonDeg = 0.25)
    val values = field(grid, 250.0, 40.0)
    val simple = Grib2.decode(Grib2.encode(Meteo(0, 6), grid, refTime, 6, values)).head
    Seq(1, 2).foreach { order =>
      val complex = Grib2.decode(Grib2.encodeComplex(Meteo(0, 6), grid, refTime, 6,
        values, order = order)).head
      assert(simple.values.sameElements(complex.values), s"5.3 order-$order decode diverged")
    }
  }

  test("complex packing 5.3: smooth fields pack smaller than simple packing") {
    // the point of spatial differencing: a smooth field's residuals need far
    // fewer bits per point than the raw 16-bit simple packing
    val grid = GridSpec(ni = 100, nj = 50, lat1Deg = 72.0, lon1Deg = 335.0,
      dLatDeg = 0.25, dLonDeg = 0.25)
    val values = field(grid, 250.0, 40.0) // sinusoidal — smooth
    val simpleLen = Grib2.encode(Meteo(0, 0), grid, refTime, 0, values).length
    val complexLen = Grib2.encodeComplex(Meteo(0, 0), grid, refTime, 0,
      values, order = 2).length
    assert(complexLen < simpleLen,
      s"order-2 packing ($complexLen B) should beat simple packing ($simpleLen B)")
  }

  test("complex packing: ragged last group, constant field, and negative values") {
    // 7 points with groupLen 3 → groups of 3/3/1 exercise the true-last-length path
    val grid = GridSpec(7, 1, 50.0, 0.0, 1.0, 1.0)
    val ragged = Array(-5.0, -3.0, 0.0, 4.0, 9.0, 2.0, -1.0)
    Seq(0, 1, 2).foreach { order =>
      val d = Grib2.decode(Grib2.encodeComplex(Meteo(0, 0), grid, refTime, 0,
        ragged, order = order, groupLen = 3)).head
      // integer-valued field with E=0 decodes exactly
      assert(d.values.toSeq === ragged.toSeq, s"ragged order-$order")
    }
    val const = Array.fill(7)(3.25)
    val d2 = Grib2.decode(Grib2.encodeComplex(Meteo(0, 0), grid, refTime, 0,
      const, order = 2, groupLen = 3)).head
    d2.values.foreach(v => assert(math.abs(v - 3.25) < 1e-6, s"constant field: $v"))
  }

  test("complex packing feeds the adapters like any other message") {
    val grid = GridSpec(20, 10, 60.0, 350.0, 0.1, 0.1)
    val values = field(grid, 5e-9, 4e-9)
    val bytes = Grib2.encodeComplex(Chemical(40008), grid, refTime, 24, values,
      nbits = 24, order = 2)
    val msgs = Grib2.CamsGrib2Reader.openBytes(bytes).toSeq
    assert(msgs.length === 1)
    assert(msgs.head.variableName === "pm10" && msgs.head.unit === "kg m-3")
    val quantum = (values.max - values.min) / ((1 << 24) - 1)
    values.zip(msgs.head.values).foreach { case (v, got) =>
      assert(math.abs(v - got) <= quantum + 1e-24)
    }
  }

  test("multi-message file: messages decode in order with their own metadata") {
    val grid = GridSpec(8, 6, 55.0, 10.0, 1.0, 1.0)
    val bytes =
      Grib2.encode(Chemical(40008), grid, refTime, 0, field(grid, 1e-8, 1e-8)) ++
      Grib2.encode(Chemical(40009), grid, refTime, 1, field(grid, 2e-8, 1e-8)) ++
      Grib2.encode(Meteo(0, 6), grid, refTime, 2, field(grid, 270.0, 10.0))
    val msgs = Grib2.decode(bytes)
    assert(msgs.map(_.product) === Seq(Chemical(40008), Chemical(40009), Meteo(0, 6)))
    assert(msgs.map(_.forecastHours) === Seq(0, 1, 2))
    // header-only split: slices reassemble the file exactly, and each slice
    // decodes independently to the same message (the parallel-ingest path)
    val slices = Grib2.splitMessages(bytes)
    assert(slices.size === 3)
    assert(slices.flatten.toSeq === bytes.toSeq)
    slices.zip(msgs).foreach { case (slice, whole) =>
      val d = Grib2.decode(slice)
      assert(d.size === 1)
      assert(d.head.product === whole.product)
      assert(d.head.forecastHours === whole.forecastHours)
      assert(d.head.values.toSeq === whole.values.toSeq)
    }
    intercept[java.io.IOException](Grib2.splitMessages(bytes.dropRight(30)))
  }

  test("ADR-002 regression: prime-meridian-crossing grid yields [-25, 45), never -335") {
    // the reference's corruption case: CAMS Europe spans 335°E → 45°E
    val grid = GridSpec(ni = 1400, nj = 2, lat1Deg = 71.95, lon1Deg = 335.0,
      dLatDeg = 0.05, dLonDeg = 0.05)
    val bytes = Grib2.encode(Chemical(40009), grid, refTime, 0,
      field(grid, 5e-9, 1e-9))
    val tmp = Files.createTempFile("cams", ".grib2")
    try {
      Files.write(tmp, bytes)
      val msg = Grib2.CamsGrib2Reader.open(tmp.toString).toSeq.head
      assert(msg.variableName === "pm2p5")
      assert(msg.unit === "kg m-3")
      val lons = msg.lons
      assert(math.abs(lons.min - -25.0) < 1e-4, s"lon min ${lons.min}")
      assert(lons.max < 45.0 && lons.max > 44.9, s"lon max ${lons.max}")
      assert(lons.forall(l => l >= -180.0 && l < 180.0))
      // row-major: longitudes ascend 335→360 then wrap to -180-normalized ascending
      assert(math.abs(lons(0) - -25.0) < 1e-9)
    } finally Files.delete(tmp)
  }

  test("adapters: variable names, units, valid time = ref + leadtime") {
    val grid = GridSpec(4, 3, 50.0, 0.0, 1.0, 1.0)
    val tmp = Files.createTempFile("ecmwf", ".grib2")
    try {
      Files.write(tmp,
        Grib2.encode(Meteo(0, 0), grid, refTime, 6, field(grid, 280.0, 5.0)) ++
        Grib2.encode(Meteo(0, 6), grid, refTime, 6, field(grid, 275.0, 5.0)))
      val msgs = Grib2.EcmwfGrib2Reader.open(tmp.toString).toSeq
      assert(msgs.map(_.variableName) === Seq("temperature", "dewpoint"))
      assert(msgs.forall(_.unit === "K"))
      val expected = java.sql.Timestamp.from(
        refTime.plusHours(6).toInstant(java.time.ZoneOffset.UTC))
      assert(msgs.forall(_.timestamp === expected))
      assert(msgs.forall(m => m.values.length === 12 && m.lats.length === 12))
      // -j scanning: first row is the northernmost latitude
      assert(msgs.head.lats.take(4).forall(_ === 50.0))
      assert(msgs.head.lats.drop(8).forall(l => math.abs(l - 48.0) < 1e-9))
    } finally Files.delete(tmp)
  }

  test("bitmap: NaN points round-trip as missing under simple AND complex packing") {
    val grid = GridSpec(10, 5, 60.0, 350.0, 0.5, 0.5)
    // integer field (E=0, exact) with a deterministic missing pattern —
    // every 7th point masked, including index 0 (bitmap's first bit)
    val values = Array.tabulate(grid.numPoints) { i =>
      if (i % 7 == 0) Double.NaN else ((i * 31 + 5) % 512).toDouble
    }
    val simple = Grib2.decode(Grib2.encode(Meteo(0, 0), grid, refTime, 6, values)).head
    val complex = Grib2.decode(Grib2.encodeComplex(Meteo(0, 0), grid, refTime, 6,
      values, order = 2, groupLen = 5)).head
    Seq("simple" -> simple, "complex" -> complex).foreach { case (label, d) =>
      assert(d.values.length === grid.numPoints, label)
      values.zip(d.values).zipWithIndex.foreach { case ((v, got), i) =>
        if (v.isNaN) assert(got.isNaN, s"$label: point $i should be missing")
        else assert(got === v, s"$label: point $i")
      }
    }
  }

  test("bitmap: adapters drop missing points, keeping value/coord alignment") {
    val grid = GridSpec(10, 5, 60.0, 350.0, 0.5, 0.5)
    val values = Array.tabulate(grid.numPoints) { i =>
      if (i < 10) Double.NaN else ((i * 31 + 5) % 512).toDouble // whole first row masked
    }
    val bytes = Grib2.encode(Meteo(0, 0), grid, refTime, 6, values)
    val msg = Grib2.EcmwfGrib2Reader.openBytes(bytes).toSeq.head
    assert(msg.values.length === 40)
    assert(msg.lats.length === 40 && msg.lons.length === 40)
    // the masked row was lat 60.0 — no surviving point carries it
    assert(msg.lats.forall(_ < 60.0))
    // alignment: the first surviving point is grid index 10 → value 315
    assert(msg.values.head === ((10 * 31 + 5) % 512).toDouble)
    assert(math.abs(msg.lats.head - 59.5) < 1e-9)
  }

  test("decoder rejects what it cannot faithfully decode") {
    val grid = GridSpec(4, 3, 50.0, 0.0, 1.0, 1.0)
    val good = Grib2.encode(Meteo(0, 0), grid, refTime, 6, field(grid, 280.0, 5.0))
    // corrupt the magic
    val bad = good.clone(); bad(0) = 'X'.toByte
    intercept[java.io.IOException](Grib2.decode(bad))
    // truncated file
    intercept[Exception](Grib2.decode(good.dropRight(20)))
    // wrong adapter for the product template
    val tmp = Files.createTempFile("x", ".grib2")
    try {
      Files.write(tmp, good)
      intercept[java.io.IOException](Grib2.CamsGrib2Reader.open(tmp.toString).toSeq)
    } finally Files.delete(tmp)
  }

  // The reference's REAL ECMWF fixture: all 4 messages are DRT 5.42
  // (CCSDS/AEC), grid template 3.0, 721x1440 at 0.25 deg. Golden facts from
  // the reference's own adapter test
  // (pipeline-python/tests/unit/test_grib2/test_ecmwf_adapter.py:17-80):
  // 4 messages, variable in {temperature, dewpoint}, unit K (faithful, no
  // conversion), shape 721x1440, lats -90..90, lons -180..179.75, values in
  // Kelvin range (150, 350).
  private val realEcmwfFixture = java.nio.file.Paths.get(
    "/root/reference/pipeline-python/tests/fixtures/019cf6d7-02a0-745b-ac05-e1201d8f8a72.grib")

  test("CCSDS 5.42: decodes the reference's real ECMWF file to its golden facts") {
    assume(Files.exists(realEcmwfFixture), "reference fixture not present")
    val msgs = Grib2.EcmwfGrib2Reader.open(realEcmwfFixture.toString).toSeq
    assert(msgs.size === 4)
    msgs.foreach { m =>
      assert(Set("temperature", "dewpoint").contains(m.variableName))
      assert(m.unit === "K")
      assert(m.values.length === 721 * 1440)
      assert(m.lats.length === 721 * 1440 && m.lons.length === 721 * 1440)
      assert(math.abs(m.lats.min - -90.0) < 0.5 && math.abs(m.lats.max - 90.0) < 0.5)
      assert(math.abs(m.lons.min - -180.0) < 0.5 && math.abs(m.lons.max - 179.75) < 0.5)
      assert(m.values.min > 150.0 && m.values.max < 350.0)
    }
    // 2 variables x 2 valid times (ref 2026-03-16T00Z + leadtime 0h/3h)
    assert(msgs.map(_.variableName).toSet === Set("temperature", "dewpoint"))
    assert(msgs.map(_.timestamp).distinct.size === 2)
    // decoded minima must equal each message's section-5 reference value R
    // (eccodes packs with R = field minimum): an independent bit-level
    // cross-check of the entropy decoder against the file's own header
    val rRefs = Seq(208.55186462402344, 210.51910400390625, 212.5752716064453, 209.05172729492188)
    msgs.zip(rRefs).foreach { case (m, r) => assert(math.abs(m.values.min - r) < 1e-6) }
    // a real temperature field is spatially smooth: the mean step between
    // longitude-adjacent points is a fraction of a kelvin — a desynchronized
    // bitstream would decode white noise with mean steps of tens of K
    val first = msgs.head.values
    var sumAbs = 0.0; var n = 0
    var i = 0
    while (i < 721 * 1440 - 1) {
      if ((i + 1) % 1440 != 0) { sumAbs += math.abs(first(i + 1) - first(i)); n += 1 }
      i += 1
    }
    assert(sumAbs / n < 0.5, s"mean adjacent-point step ${sumAbs / n} K too large")
  }

  test("CCSDS 5.42: truncated stream fails through the IOException channel") {
    assume(Files.exists(realEcmwfFixture), "reference fixture not present")
    val bytes = Files.readAllBytes(realEcmwfFixture)
    // keep message 0's sections but chop the tail of its section-7 payload:
    // patch total length + section-7 length so the walk stays in bounds
    val cut = 100000
    val truncated = java.util.Arrays.copyOfRange(bytes, 0, cut + 4)
    val totalLen = (cut + 4).toLong
    var i = 0
    while (i < 8) { truncated(8 + i) = (totalLen >>> (8 * (7 - i))).toByte; i += 1 }
    val sec7Len = cut - 191 // section 7 starts at 191 in message 0
    truncated(191) = (sec7Len >>> 24).toByte
    truncated(192) = (sec7Len >>> 16).toByte
    truncated(193) = (sec7Len >>> 8).toByte
    truncated(194) = sec7Len.toByte
    truncated(cut) = '7'; truncated(cut + 1) = '7'; truncated(cut + 2) = '7'; truncated(cut + 3) = '7'
    val e = intercept[java.io.IOException](Grib2.decode(truncated))
    assert(e.getMessage.contains("truncated") || e.getMessage.contains("section"))
  }

  test("CCSDS 5.42 round-trip: every coding option decodes value-exact") {
    val grid = GridSpec(40, 25, 60.0, 350.0, 0.25, 0.25)
    val rnd = new scala.util.Random(7)
    // fields chosen to force each encoder branch: constant → zero runs;
    // tiny deltas → second extension; smooth ramp → split-k; white noise →
    // uncompressed. Integer values pack with E=0, so decode is value-exact.
    val fields: Seq[(String, Array[Double])] = Seq(
      "constant" -> Array.fill(grid.numPoints)(42.0),
      "near-constant" -> Array.tabulate(grid.numPoints)(i =>
        if (i % 37 == 0) 1.0 else 0.0),
      "smooth-ramp" -> Array.tabulate(grid.numPoints)(i =>
        (i / 7 + (i % 5)).toDouble),
      "white-noise" -> Array.fill(grid.numPoints)(rnd.nextInt(4096).toDouble),
      "steps" -> Array.tabulate(grid.numPoints)(i => ((i / 100) * 500).toDouble))
    fields.foreach { case (name, values) =>
      val bytes = Grib2.encodeCcsds(Meteo(0, 0), grid,
        refTime, 3, values, nbits = 12)
      val decoded = Grib2.decode(bytes)
      assert(decoded.size === 1, name)
      assert(decoded.head.values.toSeq === values.toSeq, s"field $name")
    }
    // compression sanity: the entropy layer must actually compress — a
    // constant field is a handful of zero-run codewords, noise ≈ raw size
    val tiny = Grib2.encodeCcsds(Meteo(0, 0), grid, refTime, 3, fields(0)._2, nbits = 12)
    val noisy = Grib2.encodeCcsds(Meteo(0, 0), grid, refTime, 3, fields(3)._2, nbits = 12)
    assert(tiny.length < 300, s"constant field should collapse: ${tiny.length} bytes")
    assert(noisy.length > grid.numPoints * 12 / 8, "noise cannot beat raw")
  }

  test("CCSDS 5.42 round-trip: random fields, block sizes, RSIs, partial tails") {
    val rnd = new scala.util.Random(13)
    (0 until 20).foreach { trial =>
      val ni = 3 + rnd.nextInt(40)
      val nj = 2 + rnd.nextInt(20)
      val grid = GridSpec(ni, nj, 70.0, 10.0, 0.5, 0.5)
      val nbits = 4 + rnd.nextInt(13) // 4..16
      val blockSize = Seq(8, 16, 32, 64)(rnd.nextInt(4))
      val rsiBlocks = 1 + rnd.nextInt(8) // tiny RSIs → many boundaries
      // mixture process: runs of constancy, small steps, and jumps, so one
      // message exercises several options across blocks
      var level = rnd.nextInt(1 << nbits)
      val values = Array.tabulate(grid.numPoints) { _ =>
        val roll = rnd.nextInt(100)
        if (roll < 60) () // hold
        else if (roll < 90) level = math.max(0,
          math.min((1 << nbits) - 1, level + rnd.nextInt(5) - 2))
        else level = rnd.nextInt(1 << nbits)
        level.toDouble
      }
      val bytes = Grib2.encodeCcsds(Meteo(0, 6), grid, refTime, trial % 7,
        values, nbits = nbits, blockSize = blockSize, rsiBlocks = rsiBlocks)
      val decoded = Grib2.decode(bytes)
      assert(decoded.head.values.toSeq === values.toSeq,
        s"trial $trial (nbits=$nbits block=$blockSize rsi=$rsiBlocks n=${grid.numPoints})")
    }
  }

  test("CCSDS 5.42 round-trip: nbits 1-3 (no or tiny split option) still encode") {
    // regression: with nbits <= 2 the split option does not exist (maxK < 0)
    // and its Long.MaxValue sentinel used to wrap into the cost sum, making
    // the encoder pick an unemittable option and crash
    val grid = GridSpec(16, 4, 70.0, 10.0, 0.5, 0.5)
    val rnd = new scala.util.Random(42)
    Seq(1, 2, 3).foreach { nbits =>
      val values = Array.tabulate(grid.numPoints)(_ => rnd.nextInt(1 << nbits).toDouble)
      val bytes = Grib2.encodeCcsds(Meteo(0, 0), grid, refTime, 0, values, nbits = nbits)
      assert(Grib2.decode(bytes).head.values.toSeq === values.toSeq, s"nbits=$nbits")
    }
  }

  test("PNG packing 5.41: 8/16/24-bit depths decode identical to simple packing") {
    // same quantization (packingParams) as 5.0, lossless PNG carrier →
    // decode must be BIT-identical to the simple-packed decode per depth
    val grid = GridSpec(ni = 40, nj = 30, lat1Deg = 72.0, lon1Deg = 335.0,
      dLatDeg = 0.5, dLonDeg = 0.5)
    val values = field(grid, 250.0, 40.0)
    Seq(8, 16, 24).foreach { nb =>
      val simple = Grib2.decode(Grib2.encode(Meteo(0, 0), grid, refTime, 12,
        values, nbits = nb)).head
      val png = Grib2.decode(Grib2.encodePngPacked(Meteo(0, 0), grid, refTime, 12,
        values, nbits = nb)).head
      assert(png.product === Meteo(0, 0) && png.forecastHours === 12)
      assert(simple.values.sameElements(png.values), s"5.41 depth-$nb decode != 5.0 decode")
    }
    // non-octet nbits pick the enclosing depth (12 → 16-bit grayscale)
    val png12 = Grib2.decode(Grib2.encodePngPacked(Meteo(0, 0), grid, refTime, 12,
      values, nbits = 12)).head
    val simple12 = Grib2.decode(Grib2.encode(Meteo(0, 0), grid, refTime, 12,
      values, nbits = 12)).head
    assert(simple12.values.sameElements(png12.values))
  }

  test("PNG packing 5.41: bitmap composes, gaussian and lambert grids carry PNG too") {
    // bitmap: present points pack as a single pixel row; missing decode NaN
    val grid = GridSpec(10, 6, 60.0, 350.0, 0.5, 0.5)
    val values = field(grid, 250.0, 40.0)
    values(3) = Double.NaN; values(17) = Double.NaN; values(59) = Double.NaN
    val d = Grib2.decode(Grib2.encodePngPacked(Meteo(0, 0), grid, refTime, 6,
      values, nbits = 16)).head
    val simple = Grib2.decode(Grib2.encode(Meteo(0, 0), grid, refTime, 6,
      values, nbits = 16)).head
    assert(Seq(3, 17, 59).forall(i => d.values(i).isNaN))
    values.indices.foreach { i =>
      if (!values(i).isNaN)
        assert(d.values(i) === simple.values(i), s"bitmapped point $i diverged")
    }
    // the PNG payload rides any grid template the codec supports
    val gauss = GridSpec.gaussian(ni = 18, nj = 14, n = 12, start = 5,
      lon1Deg = 350.0, dLonDeg = 1.0)
    val gv = field(gauss, 250.0, 30.0)
    val gd = Grib2.decode(Grib2.encodePngPacked(Meteo(0, 0), gauss, refTime, 3,
      gv, nbits = 16)).head
    assert(gd.grid.isGaussian && gd.values.length === gauss.numPoints)
    val lam = GridSpec.lambertConformal(ni = 12, nj = 9, lat1Deg = 55.5,
      lon1Deg = 350.25, Grib2.LambertSpec(laDDeg = 48.0, loVDeg = 355.0,
        latin1Deg = 42.5, latin2Deg = 54.5, dxM = 12000.0, dyM = 12000.0))
    val lv = field(lam, 250.0, 30.0)
    val ld = Grib2.decode(Grib2.encodePngPacked(Meteo(0, 0), lam, refTime, 3,
      lv, nbits = 16)).head
    assert(ld.grid.isLambert && ld.values.length === lam.numPoints)
  }

  test("PNG packing 5.41: corrupt payload, depth lies, pixel-count lies all fail fast") {
    val grid = GridSpec(10, 6, 60.0, 350.0, 0.5, 0.5)
    val good = Grib2.encodePngPacked(Meteo(0, 0), grid, refTime, 6,
      field(grid, 250.0, 40.0), nbits = 16)
    // fixed layout: header 16, s1 21, s3 72, s4 34, s5 21 (depth at +19),
    // s6 6, s7 from 170 (PNG payload from 175)
    val depthLie = good.clone(); depthLie(143 + 19) = 13
    val e1 = intercept[java.io.IOException](Grib2.decode(depthLie))
    assert(e1.getMessage.contains("PNG image depth"))
    // a SUPPORTED depth octet that lies about the actual raster (payload
    // is a 16-bit PNG, header claims 8): without the decoded-depth
    // cross-check every value would decode silently ~257× off instead of
    // failing through the malformed-wire channel
    val rasterLie = good.clone(); rasterLie(143 + 19) = 8
    val e1b = intercept[java.io.IOException](Grib2.decode(rasterLie))
    assert(e1b.getMessage.contains("depth mismatch"), e1b.getMessage)
    val countLie = good.clone(); countLie(143 + 8) = (countLie(143 + 8) - 1).toByte
    val e2 = intercept[java.io.IOException](Grib2.decode(countLie))
    assert(e2.getMessage.contains("pixels"), e2.getMessage)
    val corrupt = good.clone()
    var i = 200
    while (i < 230 && i < corrupt.length - 10) { corrupt(i) = 0x55; i += 1 }
    intercept[java.io.IOException](Grib2.decode(corrupt))
    // 5.40 (JPEG2000) stays refused: flip the wire template 41 → 40
    val jpeg = good.clone(); jpeg(143 + 10) = 40
    val e4 = intercept[java.io.IOException](Grib2.decode(jpeg))
    assert(e4.getMessage.contains("5.40"))
  }

  test("gaussian latitudes: known values, symmetry, monotone north to south") {
    // N=1: P2 root sqrt(1/3) -> arcsin = 35.264390°
    val g1 = Grib2.gaussianLatitudes(1)
    assert(g1.length === 2)
    assert(math.abs(g1(0) - 35.264390) < 1e-5)
    assert(g1(1) === -g1(0))
    // N=48: the published ECMWF N48 first parallel is 88.5722° (octahedral
    // and linear N48 tables alike start there)
    val g48 = Grib2.gaussianLatitudes(48)
    assert(g48.length === 96)
    assert(math.abs(g48(0) - 88.5722) < 1e-3)
    assert((0 until 95).forall(i => g48(i) > g48(i + 1)), "strictly descending")
    assert((0 until 48).forall(i => math.abs(g48(i) + g48(95 - i)) < 1e-12), "hemispheric mirror")
  }

  test("gaussian grid 3.40: global and subset round-trip through ALL three packings") {
    val n = 16
    val global = Grib2.GridSpec.gaussian(ni = 64, nj = 2 * n, n = n, start = 0,
      lon1Deg = 0.0, dLonDeg = 5.625)
    val subset = Grib2.GridSpec.gaussian(ni = 40, nj = 12, n = n, start = 8,
      lon1Deg = 350.0, dLonDeg = 0.5)
    Seq(global, subset).foreach { grid =>
      val values = field(grid, 250.0, 40.0)
      val simple = Grib2.decode(Grib2.encode(Meteo(0, 0), grid, refTime, 12, values)).head
      assert(simple.grid === grid, "decoded GridSpec carries the gaussian identity")
      assert(simple.grid.isGaussian && simple.grid.gaussianN === n)
      val quantum = (values.max - values.min) / ((1 << 16) - 1)
      values.zip(simple.values).foreach { case (v, got) =>
        assert(math.abs(v - got) <= quantum + 1e-9)
      }
      // the shared section-3 writer must carry the gaussian grid through
      // the complex and CCSDS packings identically
      val complex = Grib2.decode(Grib2.encodeComplex(Meteo(0, 0), grid, refTime, 12,
        values, order = 2)).head
      assert(complex.grid === grid)
      assert(simple.values.sameElements(complex.values))
      val ccsds = Grib2.decode(Grib2.encodeCcsds(Meteo(0, 0), grid, refTime, 12,
        values.map(v => (v * 10).floor / 10), nbits = 12)).head
      assert(ccsds.grid === grid)
    }
  }

  test("gaussian grid 3.40: adapters emit the gaussian row latitudes") {
    val n = 8
    val grid = Grib2.GridSpec.gaussian(ni = 10, nj = 2 * n, n = n, start = 0,
      lon1Deg = 355.0, dLonDeg = 1.0)
    val values = field(grid, 250.0, 30.0)
    val bytes = Grib2.encode(Meteo(0, 0), grid, refTime, 6, values)
    val msgs = Grib2.EcmwfGrib2Reader.openBytes(bytes).toSeq
    assert(msgs.length === 1)
    val m = msgs.head
    val gl = Grib2.gaussianLatitudes(n)
    assert(m.lats.length === grid.numPoints)
    // row j carries gaussian parallel j, exactly (shared table, no rounding)
    (0 until 2 * n).foreach { j =>
      assert(m.lats(j * grid.ni) === gl(j), s"row $j latitude")
    }
    // prime-meridian crossing longitudes normalized at the boundary as ever
    assert(m.lons.take(grid.ni).toSeq === (0 until grid.ni).map(i =>
      if (355.0 + i < 360.0) 355.0 + i - 360.0 else (355.0 + i) % 360.0))
    // a lat1 that is NOT a gaussian parallel is refused, not mis-gridded
    val lying = bytes.clone()
    // section 3 starts at 16+21=37; lat1 is at octet offset 46 within s3
    val lat1Off = 37 + 46
    lying(lat1Off) = 0x02; lying(lat1Off + 1) = 0x0f
    lying(lat1Off + 2) = 0x7c.toByte; lying(lat1Off + 3) = 0x10 // 34.5°
    val e = intercept[java.io.IOException](Grib2.decode(lying))
    assert(e.getMessage.contains("gaussian"))
  }

  test("lambert conformal: Snyder's textbook forward values, inverse identity") {
    import Grib2.{LambertSpec, Lcc}
    // Snyder 1987 (USGS PP 1395) numerical example p. 295: sphere R=1,
    // standard parallels 33°/45°, origin (23°, −96°); the projection of
    // (35°, −75°) is x=0.2966785, y=0.2462112 with n=0.6304777
    val s = LambertSpec(laDDeg = 23.0, loVDeg = -96.0,
      latin1Deg = 33.0, latin2Deg = 45.0, dxM = 1.0, dyM = 1.0)
    val p = Lcc.proj(s, radiusM = 1.0)
    assert(math.abs(p.n - 0.6304777) < 1e-7)
    val (x, y) = Lcc.forward(p, 35.0, -75.0)
    assert(math.abs(x - 0.2966785) < 1e-7, s"x=$x")
    assert(math.abs(y - 0.2462112) < 1e-7, s"y=$y")
    // inverse identity across the cone (both conventions of longitude)
    val pr = Lcc.proj(s) // real earth radius
    for (lat <- Seq(22.0, 35.0, 51.5); lon <- Seq(-120.0, -96.0, -70.0, 290.0)) {
      val (fx, fy) = Lcc.forward(pr, lat, lon)
      val (bla, blo) = Lcc.inverse(pr, fx, fy)
      assert(math.abs(bla - lat) < 1e-9, s"lat $lat -> $bla")
      val expectLon = ((lon + 540.0) % 360.0) - 180.0
      assert(math.abs(blo - expectLon) < 1e-9, s"lon $lon -> $blo")
    }
  }

  test("lambert grid 3.30: round-trip through all three packings, both scan orders") {
    import Grib2.{GridSpec, LambertSpec}
    // a NAM-like tangent cone (latin1 == latin2 exercises the n = sin branch)
    val tangent = GridSpec.lambertConformal(ni = 30, nj = 20,
      lat1Deg = 12.19, lon1Deg = 226.541,
      LambertSpec(laDDeg = 25.0, loVDeg = 265.0, latin1Deg = 25.0,
        latin2Deg = 25.0, dxM = 32463.0, dyM = 32463.0, yPositive = true))
    // a secant cone scanning north→south
    val secant = GridSpec.lambertConformal(ni = 25, nj = 16,
      lat1Deg = 55.5, lon1Deg = 350.25,
      LambertSpec(laDDeg = 48.0, loVDeg = 355.0, latin1Deg = 42.5,
        latin2Deg = 54.5, dxM = 12000.0, dyM = 12000.0))
    Seq(tangent, secant).foreach { grid =>
      val values = field(grid, 250.0, 40.0)
      val simple = Grib2.decode(Grib2.encode(Meteo(0, 0), grid, refTime, 12, values)).head
      assert(simple.grid === grid, "decoded GridSpec carries the full projection")
      assert(simple.grid.isLambert)
      val quantum = (values.max - values.min) / ((1 << 16) - 1)
      values.zip(simple.values).foreach { case (v, got) =>
        assert(math.abs(v - got) <= quantum + 1e-9)
      }
      val complex = Grib2.decode(Grib2.encodeComplex(Meteo(0, 0), grid, refTime, 12,
        values, order = 1)).head
      assert(complex.grid === grid)
      assert(simple.values.sameElements(complex.values))
      val ccsds = Grib2.decode(Grib2.encodeCcsds(Meteo(0, 6), grid, refTime, 6,
        values.map(v => v.floor), nbits = 10)).head
      assert(ccsds.grid === grid)
    }
  }

  test("lambert grid 3.30: adapters emit inverse-projected per-point coordinates") {
    import Grib2.{GridSpec, LambertSpec, Lcc}
    val spec = LambertSpec(laDDeg = 48.0, loVDeg = 355.0, latin1Deg = 42.5,
      latin2Deg = 54.5, dxM = 24000.0, dyM = 24000.0)
    val grid = GridSpec.lambertConformal(ni = 12, nj = 8,
      lat1Deg = 55.5, lon1Deg = 350.25, spec)
    val values = field(grid, 275.0, 20.0)
    val m = Grib2.EcmwfGrib2Reader.openBytes(
      Grib2.encode(Meteo(0, 0), grid, refTime, 6, values)).toSeq.head
    assert(m.lats.length === grid.numPoints)
    // anchor: the first grid point is (La1, Lo1) itself
    assert(math.abs(m.lats(0) - 55.5) < 1e-6)
    assert(math.abs(m.lons(0) - (350.25 - 360.0)) < 1e-6)
    // unlike the lat/lon grids, latitude VARIES WITHIN a row on a conic
    // projection (that is the point of per-point inverse projection)
    val row0 = m.lats.take(grid.ni)
    assert(row0.distinct.length > 1, "conic row must not be an isoline of latitude")
    // spot-check an interior point against a direct inverse projection
    val p = Lcc.proj(spec)
    val (x1, y1) = Lcc.forward(p, 55.5, 350.25)
    val (ela, elo) = Lcc.inverse(p, x1 + 7 * spec.dxM, y1 - 5 * spec.dyM)
    val idx = 5 * grid.ni + 7
    assert(math.abs(m.lats(idx) - ela) < 1e-6)
    assert(math.abs(m.lons(idx) - elo) < 1e-6)
  }

  test("lambert grid 3.30: unsupported projection variants are refused, not mis-gridded") {
    import Grib2.{GridSpec, LambertSpec}
    val grid = GridSpec.lambertConformal(ni = 10, nj = 8,
      lat1Deg = 55.5, lon1Deg = 350.25,
      LambertSpec(laDDeg = 48.0, loVDeg = 355.0, latin1Deg = 42.5,
        latin2Deg = 54.5, dxM = 24000.0, dyM = 24000.0))
    val bytes = Grib2.encode(Meteo(0, 0), grid, refTime, 6, field(grid, 275.0, 20.0))
    // section 3 starts at 16+21=37; 1-based octets within it:
    // 64 = projection centre flag, 65 = scanning mode
    def mangled(off1Based: Int, v: Int): Array[Byte] = {
      val out = bytes.clone(); out(37 + off1Based - 1) = v.toByte; out
    }
    // south-pole-on-plane projection centre: would need mirrored math
    val e1 = intercept[java.io.IOException](Grib2.decode(mangled(64, 0x80)))
    assert(e1.getMessage.contains("projection centre"))
    // -i scanning / transposed consecutivity: silently wrong point order
    val e2 = intercept[java.io.IOException](Grib2.decode(mangled(65, 0x80)))
    assert(e2.getMessage.contains("scanning"))
    intercept[java.io.IOException](Grib2.decode(mangled(65, 0x20)))
    // ... while the supported +j order still decodes
    assert(Grib2.decode(mangled(65, 0x40)).head.grid.lambert.get.yPositive)
    // a section LENGTH that understates the 81-octet template would read
    // the next section's header bytes as projection parameters — silently
    // wrong coordinates. Must fail through the codec channel instead.
    val lying = bytes.clone()
    lying(37 + 3) = 72.toByte // section-3 length 81 -> 72 (template still 30)
    val e3 = intercept[java.io.IOException](Grib2.decode(lying))
    assert(e3.getMessage.contains("too short for template"))
    // degenerate cone parameters ON THE WIRE take the same IOException
    // quarantine path as every other malformed-wire case
    def withLatins(l1: Long, l2: Long): Array[Byte] = {
      val out = bytes.clone()
      def sm32(at: Int, v: Long): Unit = {
        val raw = if (v < 0) 0x80000000L | -v else v
        out(at) = (raw >>> 24).toByte; out(at + 1) = (raw >>> 16).toByte
        out(at + 2) = (raw >>> 8).toByte; out(at + 3) = raw.toByte
      }
      sm32(37 + 65, l1 * 1000000L); sm32(37 + 69, l2 * 1000000L) // octets 66-73
      out
    }
    val e4 = intercept[java.io.IOException](Grib2.decode(withLatins(30L, -30L)))
    assert(e4.getMessage.contains("cone parallels"))
    // first point at the cone's far pole (northern cone, la1 = −90):
    // ρ diverges through tanⁿ — quarantined like the polar case
    val farPole = bytes.clone()
    val rawLa1 = 0x80000000L | 90000000L
    farPole(37 + 38) = (rawLa1 >>> 24).toByte
    farPole(37 + 39) = (rawLa1 >>> 16).toByte
    farPole(37 + 40) = (rawLa1 >>> 8).toByte
    farPole(37 + 41) = rawLa1.toByte
    val e4b = intercept[java.io.IOException](Grib2.decode(farPole))
    assert(e4b.getMessage.contains("far pole"))
    // degenerate cones are also refused at construction (programming-error guard)
    intercept[IllegalArgumentException](
      LambertSpec(48.0, 355.0, latin1Deg = 30.0, latin2Deg = -30.0,
        dxM = 1000.0, dyM = 1000.0))
    intercept[IllegalArgumentException](
      LambertSpec(48.0, 355.0, 42.5, 54.5, dxM = 0.0, dyM = 1000.0))
  }

  test("polar stereographic: analytic anchor values, inverse identity, both poles") {
    import Grib2.{PolarSpec, Pst}
    // at the true-scale latitude LaD the projected radius is EXACTLY the
    // parallel circle's radius R·cos(LaD) (scale is true there):
    // ρ = R(1+sin φc)·tan(π/4 − φc/2) = R·cos φc — an independent closed
    // form that pins the tan-form implementation
    val north = Pst.proj(PolarSpec(laDDeg = 60.0, loVDeg = -100.0,
      dxM = 1.0, dyM = 1.0))
    val r = Grib2.Lcc.EarthRadiusM
    val (x0, y0) = Pst.forward(north, 60.0, -100.0)
    assert(math.abs(x0) < 1e-6 && math.abs(y0 - (-r * 0.5)) < 1e-6,
      s"rho at LaD must be R*cos(60) = R/2: ($x0, $y0)")
    val (x90, y90) = Pst.forward(north, 60.0, -10.0) // 90° east of LoV
    assert(math.abs(x90 - r * 0.5) < 1e-6 && math.abs(y90) < 1e-6)
    // the pole projects to the origin and inverts back to (90, LoV)
    val (px, py) = Pst.forward(north, 90.0, 123.0)
    assert(math.abs(px) < 1e-6 && math.abs(py) < 1e-6)
    assert(Pst.inverse(north, 0.0, 0.0) === ((90.0, -100.0)))
    val south = Pst.proj(PolarSpec(laDDeg = -60.0, loVDeg = 40.0,
      dxM = 1.0, dyM = 1.0, southPole = true))
    val (sx, sy) = Pst.forward(south, -60.0, 40.0)
    assert(math.abs(sx) < 1e-6 && math.abs(sy - r * 0.5) < 1e-6,
      s"south plane: rho at LaD = R/2 toward +y: ($sx, $sy)")
    assert(Pst.inverse(south, 0.0, 0.0) === ((-90.0, 40.0)))
    // inverse identity across both planes (0..360 longitudes included)
    for (proj <- Seq(north, south); lat <- Seq(30.0, 52.5, 75.0, 88.0);
         lon <- Seq(-170.0, -100.0, 0.0, 260.0)) {
      val signedLat = if (proj.south) -lat else lat
      val (fx, fy) = Pst.forward(proj, signedLat, lon)
      val (bla, blo) = Pst.inverse(proj, fx, fy)
      assert(math.abs(bla - signedLat) < 1e-9, s"lat $signedLat -> $bla")
      val expectLon = ((lon + 540.0) % 360.0) - 180.0
      assert(math.abs(blo - expectLon) < 1e-9, s"lon $lon -> $blo")
    }
  }

  test("polar grid 3.20: round-trip through all four packings, both poles and scan orders") {
    import Grib2.{GridSpec, PolarSpec}
    // an AROME/HRRR-arctic-like north plane scanning south→north
    val northGrid = GridSpec.polarStereographic(ni = 30, nj = 20,
      lat1Deg = 52.3, lon1Deg = 215.0,
      PolarSpec(laDDeg = 60.0, loVDeg = 249.0, dxM = 22500.0, dyM = 22500.0,
        yPositive = true))
    // an Antarctic south plane, default scan
    val southGrid = GridSpec.polarStereographic(ni = 25, nj = 16,
      lat1Deg = -58.0, lon1Deg = 330.0,
      PolarSpec(laDDeg = -60.0, loVDeg = 0.0, dxM = 25000.0, dyM = 25000.0,
        southPole = true))
    Seq(northGrid, southGrid).foreach { grid =>
      val values = field(grid, 250.0, 40.0)
      val simple = Grib2.decode(Grib2.encode(Meteo(0, 0), grid, refTime, 12, values)).head
      assert(simple.grid === grid, "decoded GridSpec carries the full projection")
      assert(simple.grid.isPolar)
      val quantum = (values.max - values.min) / ((1 << 16) - 1)
      values.zip(simple.values).foreach { case (v, got) =>
        assert(math.abs(v - got) <= quantum + 1e-9)
      }
      val complex = Grib2.decode(Grib2.encodeComplex(Meteo(0, 0), grid, refTime, 12,
        values, order = 1)).head
      assert(complex.grid === grid)
      assert(simple.values.sameElements(complex.values))
      val ccsds = Grib2.decode(Grib2.encodeCcsds(Meteo(0, 6), grid, refTime, 6,
        values.map(v => v.floor), nbits = 10)).head
      assert(ccsds.grid === grid)
      val png = Grib2.decode(Grib2.encodePngPacked(Meteo(0, 0), grid, refTime, 12,
        values, nbits = 16)).head
      assert(png.grid === grid)
      assert(simple.values.sameElements(png.values))
    }
  }

  test("polar grid 3.20: adapters emit inverse-projected per-point coordinates") {
    import Grib2.{GridSpec, PolarSpec, Pst}
    val spec = PolarSpec(laDDeg = 60.0, loVDeg = 249.0, dxM = 45000.0,
      dyM = 45000.0)
    val grid = GridSpec.polarStereographic(ni = 12, nj = 8,
      lat1Deg = 52.3, lon1Deg = 215.0, spec)
    val values = field(grid, 275.0, 20.0)
    val m = Grib2.EcmwfGrib2Reader.openBytes(
      Grib2.encode(Meteo(0, 0), grid, refTime, 6, values)).toSeq.head
    assert(m.lats.length === grid.numPoints)
    // anchor: the first grid point is (La1, Lo1) itself
    assert(math.abs(m.lats(0) - 52.3) < 1e-6)
    assert(math.abs(m.lons(0) - (215.0 - 360.0)) < 1e-6)
    // latitude varies within a row on the polar plane too
    val row0 = m.lats.take(grid.ni)
    assert(row0.distinct.length > 1, "projected row must not be an isoline of latitude")
    // spot-check an interior point against a direct inverse projection
    val p = Pst.proj(spec)
    val (x1, y1) = Pst.forward(p, 52.3, 215.0)
    val (ela, elo) = Pst.inverse(p, x1 + 7 * spec.dxM, y1 - 5 * spec.dyM)
    val idx = 5 * grid.ni + 7
    assert(math.abs(m.lats(idx) - ela) < 1e-6)
    assert(math.abs(m.lons(idx) - elo) < 1e-6)
  }

  test("polar grid 3.20: unsupported projection variants are refused, not mis-gridded") {
    import Grib2.{GridSpec, PolarSpec}
    val grid = GridSpec.polarStereographic(ni = 10, nj = 8,
      lat1Deg = 52.3, lon1Deg = 215.0,
      PolarSpec(laDDeg = 60.0, loVDeg = 249.0, dxM = 45000.0, dyM = 45000.0))
    val bytes = Grib2.encode(Meteo(0, 0), grid, refTime, 6, field(grid, 275.0, 20.0))
    // section 3 starts at 16+21=37; template 3.20's 1-based octets:
    // 64 = projection centre flag, 65 = scanning mode, 48-51 = LaD
    def mangled(off1Based: Int, v: Int): Array[Byte] = {
      val out = bytes.clone(); out(37 + off1Based - 1) = v.toByte; out
    }
    // bit 2 of the centre flag = bipolar symmetric — not representable
    val e1 = intercept[java.io.IOException](Grib2.decode(mangled(64, 0x40)))
    assert(e1.getMessage.contains("projection centre"))
    // -i scanning / transposed consecutivity: silently wrong point order
    val e2 = intercept[java.io.IOException](Grib2.decode(mangled(65, 0x80)))
    assert(e2.getMessage.contains("scanning"))
    intercept[java.io.IOException](Grib2.decode(mangled(65, 0x20)))
    // ... while the supported +j and south-pole forms still decode
    assert(Grib2.decode(mangled(65, 0x40)).head.grid.polar.get.yPositive)
    assert(Grib2.decode(mangled(64, 0x80)).head.grid.polar.get.southPole)
    // a length lie reads past the 65-octet template — refuse first
    val lying = bytes.clone()
    lying(37 + 3) = 60.toByte
    val e3 = intercept[java.io.IOException](Grib2.decode(lying))
    assert(e3.getMessage.contains("too short for template"))
    // LaD at the OPPOSITE pole on the wire (north plane, LaD = −90):
    // projection constant c → 0, quarantined as malformed
    val badLaD = bytes.clone()
    val raw = 0x80000000L | 90000000L // sign-magnitude −90°
    badLaD(37 + 47) = (raw >>> 24).toByte
    badLaD(37 + 48) = (raw >>> 16).toByte
    badLaD(37 + 49) = (raw >>> 8).toByte
    badLaD(37 + 50) = raw.toByte
    val e4 = intercept[java.io.IOException](Grib2.decode(badLaD))
    assert(e4.getMessage.contains("LaD"))
    // a first point at the FAR pole maps through tan(±π/2) to absurd
    // finite radii — must quarantine, not mis-grid (la1 octets 39-42)
    def withLa1(deg: Double): Array[Byte] = {
      val out = bytes.clone()
      val v = Math.round(math.abs(deg) * 1e6)
      val raw = if (deg < 0) 0x80000000L | v else v
      out(37 + 38) = (raw >>> 24).toByte
      out(37 + 39) = (raw >>> 16).toByte
      out(37 + 40) = (raw >>> 8).toByte
      out(37 + 41) = raw.toByte
      out
    }
    val e5 = intercept[java.io.IOException](Grib2.decode(withLa1(-90.0)))
    assert(e5.getMessage.contains("far pole"))
    val e6 = intercept[java.io.IOException](Grib2.decode(withLa1(-89.9995)))
    assert(e6.getMessage.contains("far pole"))
    // construction-time guards (programming-error channel)
    intercept[IllegalArgumentException](
      PolarSpec(laDDeg = -90.0, loVDeg = 0.0, dxM = 1000.0, dyM = 1000.0))
    intercept[IllegalArgumentException](
      PolarSpec(laDDeg = 60.0, loVDeg = 0.0, dxM = 0.0, dyM = 1000.0))
  }

  test("statistical 4.8: accumulation round-trips every packing, validTime is the interval END") {
    import Grib2.{GridSpec, Statistical}
    val grid = GridSpec(ni = 12, nj = 8, lat1Deg = 60.0, lon1Deg = 350.0,
      dLatDeg = 0.5, dLonDeg = 0.5)
    // 6-hour precipitation accumulation starting at lead 12 h
    val tp = Statistical(category = 1, number = 8, process = 1, rangeHours = 6)
    val values = field(grid, 3.0, 2.5).map(v => math.max(v, 0.0))
    val simple = Grib2.decode(Grib2.encode(tp, grid, refTime, 12, values)).head
    assert(simple.product === tp, "the full statistical spec survives the wire")
    assert(simple.forecastHours === 12)
    // the stamp is the END of the interval: ref + 12 + 6
    assert(simple.validTime.toInstant ===
      refTime.plusHours(18).toInstant(java.time.ZoneOffset.UTC))
    val complex = Grib2.decode(Grib2.encodeComplex(tp, grid, refTime, 12,
      values, order = 1)).head
    assert(complex.product === tp)
    assert(simple.values.sameElements(complex.values))
    val ccsds = Grib2.decode(Grib2.encodeCcsds(tp, grid, refTime, 12,
      values.map(_.floor), nbits = 8)).head
    assert(ccsds.product === tp)
    val png = Grib2.decode(Grib2.encodePngPacked(tp, grid, refTime, 12,
      values, nbits = 16)).head
    assert(png.product === tp)
    assert(simple.values.sameElements(png.values))
    // the adapter names the accumulated field and keeps the end stamp
    val m = Grib2.EcmwfGrib2Reader.openBytes(
      Grib2.encode(tp, grid, refTime, 12, values)).toSeq.head
    assert(m.variableName === "total_precipitation")
    assert(m.unit === "kg m-2")
    assert(m.timestamp === simple.validTime)
  }

  test("statistical 4.8: malformed interval blocks are refused, not mis-stamped") {
    import Grib2.{GridSpec, Statistical}
    val grid = GridSpec(ni = 10, nj = 6, lat1Deg = 60.0, lon1Deg = 350.0,
      dLatDeg = 0.5, dLonDeg = 0.5)
    val tp = Statistical(1, 8, process = 1, rangeHours = 6)
    val bytes = Grib2.encode(tp, grid, refTime, 12, field(grid, 3.0, 2.0))
    // section 4 starts at 16+21+72 = 109; 1-based octets within it:
    // 42 = number of time ranges, 47 = statistical process,
    // 49/50-53 = range unit/length, 41 = interval-end seconds
    def mangled(off1Based: Int, v: Int): Array[Byte] = {
      val out = bytes.clone(); out(109 + off1Based - 1) = v.toByte; out
    }
    val e1 = intercept[java.io.IOException](Grib2.decode(mangled(42, 2)))
    assert(e1.getMessage.contains("time ranges"))
    // process 4 (difference) has no faithful downstream semantic
    val e2 = intercept[java.io.IOException](Grib2.decode(mangled(47, 4)))
    assert(e2.getMessage.contains("statistical process"))
    // a range in minutes that is not whole hours must not truncate
    val subHour = bytes.clone()
    subHour(109 + 48) = 0.toByte // unit: minutes
    subHour(109 + 52) = 90.toByte // length 90 (octet 53, low byte)
    val e3 = intercept[java.io.IOException](Grib2.decode(subHour))
    assert(e3.getMessage.contains("sub-hour"))
    // the declared interval end must equal start + range exactly
    val e4 = intercept[java.io.IOException](Grib2.decode(mangled(41, 1)))
    assert(e4.getMessage.contains("interval end"))
    // a section-4 length lie reads surface octets as interval fields
    val lying = bytes.clone()
    lying(109 + 3) = 50.toByte
    val e5 = intercept[java.io.IOException](Grib2.decode(lying))
    assert(e5.getMessage.contains("too short for template 4.8"))
    // construction-time guards (programming-error channel)
    intercept[IllegalArgumentException](Statistical(1, 8, process = 7, rangeHours = 6))
    intercept[IllegalArgumentException](Statistical(1, 8, process = 1, rangeHours = 0))
  }

  test("mercator: independent asinh closed form, scaled radius, inverse identity") {
    import Grib2.{MercatorSpec, Mrc}
    val r = Grib2.Lcc.EarthRadiusM
    // cos 60° = 1/2 exactly: the scaled cylinder radius is R/2
    val p60 = Mrc.proj(MercatorSpec(laDDeg = 60.0, dxM = 1.0, dyM = 1.0), 10.0)
    assert(math.abs(p60.rPrime - r * 0.5) < 1e-6)
    // INDEPENDENT closed form: ln tan(π/4 + φ/2) ≡ asinh(tan φ) — pins the
    // tan-form implementation the same way the polar test pins ρ(LaD)
    val p0 = Mrc.proj(MercatorSpec(laDDeg = 0.0, dxM = 1.0, dyM = 1.0), 0.0)
    for (lat <- Seq(-75.0, -30.0, 0.0, 15.0, 45.0, 60.0, 82.5)) {
      val (_, y) = Mrc.forward(p0, lat, 0.0)
      val t = math.tan(math.toRadians(lat))
      assert(math.abs(y - r * math.log(t + math.hypot(t, 1.0))) < 1e-6,
        s"y(φ=$lat) must equal R*asinh(tan φ)")
    }
    // the equator is y = 0 and 1° of longitude is R'·π/180 of x
    val (x1, y1) = Mrc.forward(p0, 0.0, 1.0)
    assert(math.abs(y1) < 1e-9 && math.abs(x1 - r * math.Pi / 180) < 1e-6)
    // inverse identity, wrap-around longitudes included
    for (proj <- Seq(p0, p60); lat <- Seq(-80.0, -12.5, 0.0, 33.0, 71.0);
         lon <- Seq(-170.0, 0.0, 185.0, 350.0)) {
      val (fx, fy) = Mrc.forward(proj, lat, lon)
      val (bla, blo) = Mrc.inverse(proj, fx, fy)
      assert(math.abs(bla - lat) < 1e-9, s"lat $lat -> $bla")
      val expectLon = ((lon + 540.0) % 360.0) - 180.0
      assert(math.abs(blo - expectLon) < 1e-9, s"lon $lon -> $blo")
    }
  }

  test("mercator grid 3.10: round-trip through all four packings, both scan orders") {
    import Grib2.{GridSpec, MercatorSpec}
    // a tropical strip crossing the antimeridian (the ADR-002 shape),
    // scanning south→north
    val tropics = GridSpec.mercator(ni = 30, nj = 20,
      lat1Deg = -12.0, lon1Deg = 150.0,
      MercatorSpec(laDDeg = 20.0, dxM = 55000.0, dyM = 55000.0,
        yPositive = true))
    // a mid-latitude strip, default north→south scan
    val midLat = GridSpec.mercator(ni = 25, nj = 16,
      lat1Deg = 58.0, lon1Deg = 340.0,
      MercatorSpec(laDDeg = 45.0, dxM = 40000.0, dyM = 40000.0))
    Seq(tropics, midLat).foreach { grid =>
      val values = field(grid, 250.0, 40.0)
      val simple = Grib2.decode(Grib2.encode(Meteo(0, 0), grid, refTime, 12, values)).head
      assert(simple.grid === grid, "decoded GridSpec carries the full projection")
      assert(simple.grid.isMercator)
      val quantum = (values.max - values.min) / ((1 << 16) - 1)
      values.zip(simple.values).foreach { case (v, got) =>
        assert(math.abs(v - got) <= quantum + 1e-9)
      }
      val complex = Grib2.decode(Grib2.encodeComplex(Meteo(0, 0), grid, refTime, 12,
        values, order = 1)).head
      assert(complex.grid === grid)
      assert(simple.values.sameElements(complex.values))
      val ccsds = Grib2.decode(Grib2.encodeCcsds(Meteo(0, 6), grid, refTime, 6,
        values.map(v => v.floor), nbits = 10)).head
      assert(ccsds.grid === grid)
      val png = Grib2.decode(Grib2.encodePngPacked(Meteo(0, 0), grid, refTime, 12,
        values, nbits = 16)).head
      assert(png.grid === grid)
      assert(simple.values.sameElements(png.values))
    }
  }

  test("mercator grid 3.10: adapters emit cylindrical per-point coordinates") {
    import Grib2.{GridSpec, MercatorSpec, Mrc}
    val spec = MercatorSpec(laDDeg = 20.0, dxM = 60000.0, dyM = 60000.0)
    // crosses the antimeridian: lons must normalize to [−180, 180)
    val grid = GridSpec.mercator(ni = 80, nj = 8,
      lat1Deg = -12.0, lon1Deg = 150.0, spec)
    val values = field(grid, 300.0, 10.0)
    val m = Grib2.EcmwfGrib2Reader.openBytes(
      Grib2.encode(Meteo(0, 0), grid, refTime, 6, values)).toSeq.head
    assert(m.lats.length === grid.numPoints)
    // anchor: the first grid point is (La1, Lo1) itself
    assert(math.abs(m.lats(0) - (-12.0)) < 1e-6)
    assert(math.abs(m.lons(0) - 150.0) < 1e-6)
    // unlike the conic/polar planes, a Mercator ROW is an isoline of
    // latitude and a COLUMN an isoline of longitude
    val row0 = m.lats.take(grid.ni)
    assert(row0.forall(la => math.abs(la - row0(0)) < 1e-9))
    val col0 = (0 until grid.nj).map(j => m.lons(j * grid.ni))
    assert(col0.forall(lo => math.abs(lo - col0(0)) < 1e-9))
    // every longitude is normalized even across the antimeridian
    assert(m.lons.forall(lo => lo >= -180.0 && lo < 180.0))
    assert(m.lons.exists(_ < 0.0) && m.lons.exists(_ > 0.0),
      "the strip must actually cross the antimeridian")
    // spot-check an interior point against a direct inverse projection
    val p = Mrc.proj(spec, 150.0)
    val (x1, y1) = Mrc.forward(p, -12.0, 150.0)
    val (ela, elo) = Mrc.inverse(p, x1 + 7 * spec.dxM, y1 - 5 * spec.dyM)
    val idx = 5 * grid.ni + 7
    assert(math.abs(m.lats(idx) - ela) < 1e-6)
    assert(math.abs(m.lons(idx) - elo) < 1e-6)
  }

  test("mercator grid 3.10: unsupported projection variants are refused, not mis-gridded") {
    import Grib2.{GridSpec, MercatorSpec}
    val grid = GridSpec.mercator(ni = 10, nj = 8,
      lat1Deg = -12.0, lon1Deg = 150.0,
      MercatorSpec(laDDeg = 20.0, dxM = 60000.0, dyM = 60000.0))
    val bytes = Grib2.encode(Meteo(0, 0), grid, refTime, 6, field(grid, 300.0, 10.0))
    // section 3 starts at 16+21=37; template 3.10's 1-based octets:
    // 39-42 = La1, 48-51 = LaD, 60 = scanning mode, 61-64 = orientation
    def mangled(off1Based: Int, v: Int): Array[Byte] = {
      val out = bytes.clone(); out(37 + off1Based - 1) = v.toByte; out
    }
    // -i scanning / transposed consecutivity: silently wrong point order
    val e1 = intercept[java.io.IOException](Grib2.decode(mangled(60, 0x80)))
    assert(e1.getMessage.contains("scanning"))
    intercept[java.io.IOException](Grib2.decode(mangled(60, 0x20)))
    // ... while the supported +j form still decodes
    assert(Grib2.decode(mangled(60, 0x40)).head.grid.mercator.get.yPositive)
    // a rotated Mercator (orientation ≠ 0) would mis-place every point
    val e2 = intercept[java.io.IOException](Grib2.decode(mangled(61, 0x01)))
    assert(e2.getMessage.contains("orientation"))
    // a length lie reads past the 72-octet template — refuse first
    val lying = bytes.clone()
    lying(37 + 3) = 60.toByte
    val e3 = intercept[java.io.IOException](Grib2.decode(lying))
    assert(e3.getMessage.contains("too short for template"))
    def sm32At(off1Based: Int, deg: Double): Array[Byte] = {
      val out = bytes.clone()
      val v = Math.round(math.abs(deg) * 1e6)
      val raw = if (deg < 0) 0x80000000L | v else v
      out(37 + off1Based - 1) = (raw >>> 24).toByte
      out(37 + off1Based) = (raw >>> 16).toByte
      out(37 + off1Based + 1) = (raw >>> 8).toByte
      out(37 + off1Based + 2) = raw.toByte
      out
    }
    // LaD at a pole: cos LaD → 0 and metres map to unbounded degrees
    val e4 = intercept[java.io.IOException](Grib2.decode(sm32At(48, 90.0)))
    assert(e4.getMessage.contains("LaD"))
    intercept[java.io.IOException](Grib2.decode(sm32At(48, -89.99999)))
    // first point at (or within a millidegree of) a pole: y diverges
    // through ln tan(π/2)
    val e5 = intercept[java.io.IOException](Grib2.decode(sm32At(39, 90.0)))
    assert(e5.getMessage.contains("pole"))
    intercept[java.io.IOException](Grib2.decode(sm32At(39, -89.9995)))
    // construction-time guards (programming-error channel)
    intercept[IllegalArgumentException](
      MercatorSpec(laDDeg = 90.0, dxM = 1000.0, dyM = 1000.0))
    intercept[IllegalArgumentException](
      MercatorSpec(laDDeg = 20.0, dxM = 0.0, dyM = 1000.0))
    intercept[IllegalArgumentException](
      GridSpec.mercator(ni = 4, nj = 4, lat1Deg = 90.0, lon1Deg = 0.0,
        MercatorSpec(laDDeg = 0.0, dxM = 1000.0, dyM = 1000.0)))
  }

  test("complex 5.2/5.3: truncated and length-lying section 7 fail, never decode garbage") {
    // unpackComplex must bound every descriptor/group-array read to section
    // 7's declared end: a section-7 length that understates its own group
    // arrays must raise the codec's IOException — silently reading into the
    // 7777 trailer could decode garbage that still sums to numPoints
    val grid = GridSpec(ni = 40, nj = 30, lat1Deg = 72.0, lon1Deg = 335.0,
      dLatDeg = 0.5, dLonDeg = 0.5)
    val values = field(grid, 250.0, 40.0)
    def sectionPos(bytes: Array[Byte], num: Int): Int = {
      var pos = 16
      while (bytes(pos + 4) != num.toByte)
        pos += java.nio.ByteBuffer.wrap(bytes, pos, 4).getInt
      pos
    }
    def putU32(bytes: Array[Byte], at: Int, v: Int): Unit = {
      bytes(at) = (v >>> 24).toByte; bytes(at + 1) = (v >>> 16).toByte
      bytes(at + 2) = (v >>> 8).toByte; bytes(at + 3) = v.toByte
    }
    Seq(0, 2).foreach { order => // DRT 5.2 (order 0) and 5.3 (order 2)
      val bytes = Grib2.encodeComplex(Meteo(0, 0), grid, refTime, 12, values, order = order)
      val pos7 = sectionPos(bytes, 7)
      val sec7Len = java.nio.ByteBuffer.wrap(bytes, pos7, 4).getInt
      // (a) consistent truncation: cut the message inside section 7's group
      // arrays, with indicator + section lengths updated to the short size —
      // only unpackComplex's own bound can catch this
      val cutLen = 5 + (sec7Len - 5) / 4 // keep a quarter of the payload
      val truncated = new Array[Byte]((pos7 + cutLen + 4).toInt)
      System.arraycopy(bytes, 0, truncated, 0, pos7 + cutLen)
      truncated(pos7 + cutLen) = '7'; truncated(pos7 + cutLen + 1) = '7'
      truncated(pos7 + cutLen + 2) = '7'; truncated(pos7 + cutLen + 3) = '7'
      putU32(truncated, pos7, cutLen)
      // indicator total length is u64 big-endian at octets 9-16
      val total = truncated.length.toLong
      var i = 0
      while (i < 8) { truncated(8 + i) = (total >>> (8 * (7 - i))).toByte; i += 1 }
      // intercept[IOException] itself proves no raw AIOOBE leaks out
      intercept[java.io.IOException](Grib2.decode(truncated))
      // (b) length-lying: bytes intact, but section 7 DECLARES a length too
      // short for its group arrays — reads crossing the declared end must
      // fail through the codec's channel, not read into the trailer
      val lying = bytes.clone()
      putU32(lying, pos7, cutLen)
      intercept[java.io.IOException](Grib2.decode(lying))
    }
  }

  test("corrupt section lengths fail through the IOException channel, never hang") {
    val grid = GridSpec(8, 4, 70.0, 10.0, 0.5, 0.5)
    val values = Array.tabulate(grid.numPoints)(i => (i % 16).toDouble)
    val bytes = Grib2.encodeCcsds(Meteo(0, 0), grid, refTime, 0, values, nbits = 5)
    // zero out section 1's length (first section after the 16-byte
    // indicator): an unvalidated read would loop forever at pos += 0
    val zeroLen = bytes.clone()
    zeroLen(16) = 0; zeroLen(17) = 0; zeroLen(18) = 0; zeroLen(19) = 0
    val e1 = intercept[java.io.IOException](Grib2.decode(zeroLen))
    assert(e1.getMessage.contains("section length"))
    // oversize the same length field past the message end: reads past the
    // buffer must surface as the fail() channel, not AIOOBE
    val overLen = bytes.clone()
    overLen(16) = 0x7f.toByte; overLen(17) = 0xff.toByte
    overLen(18) = 0xff.toByte; overLen(19) = 0xff.toByte
    val e2 = intercept[java.io.IOException](Grib2.decode(overLen))
    assert(e2.getMessage.contains("section length"))
  }

  test("CCSDS flags the decoder cannot honor are refused, not mis-decoded") {
    val grid = GridSpec(8, 4, 70.0, 10.0, 0.5, 0.5)
    val values = Array.tabulate(grid.numPoints)(i => (i % 16).toDouble)
    val bytes = Grib2.encodeCcsds(Meteo(0, 0), grid, refTime, 0, values, nbits = 5)
    // octet 22 of section 5 carries the AEC flags; find section 5 and
    // rewrite its flags byte (signed set / MSB cleared)
    def withFlags(f: Int): Array[Byte] = {
      val out = bytes.clone()
      var pos = 16
      while (!(out(pos + 4) == 5.toByte)) {
        val len = java.nio.ByteBuffer.wrap(out, pos, 4).getInt
        pos += len
      }
      out(pos + 21) = f.toByte // octet 22, 1-based, of section 5
      out
    }
    val signed = intercept[java.io.IOException](Grib2.decode(withFlags(0x0D)))
    assert(signed.getMessage.contains("signed"))
    val lsb = intercept[java.io.IOException](Grib2.decode(withFlags(0x08)))
    assert(lsb.getMessage.contains("LSB"))
  }

  test("CCSDS 5.42: bitmap composes — missing points NaN, adapters drop them") {
    val grid = GridSpec(20, 10, 55.0, 340.0, 0.5, 0.5)
    val values = Array.tabulate(grid.numPoints)(i =>
      if (i % 9 == 0) Double.NaN else (i % 2048).toDouble)
    val bytes = Grib2.encodeCcsds(Chemical(40008), grid, refTime, 6, values, nbits = 11)
    val d = Grib2.decode(bytes).head
    assert(d.values.length === grid.numPoints)
    values.indices.foreach { i =>
      if (values(i).isNaN) assert(d.values(i).isNaN, s"point $i should be missing")
      else assert(d.values(i) === values(i), s"point $i")
    }
    val msgs = Grib2.CamsGrib2Reader.openBytes(bytes).toSeq
    assert(msgs.head.values.length === values.count(!_.isNaN))
  }

  test("decoded messages flow through Grib.toDataFrame into the pipeline shape") {
    val spark = TestSession.spark
    val grid = GridSpec(10, 5, 60.0, 355.0, 0.5, 0.5)
    val bytes = Grib2.encode(Chemical(40008), grid, refTime, 3, field(grid, 1e-8, 5e-9))
    val tmp = Files.createTempFile("cams2", ".grib2")
    try {
      Files.write(tmp, bytes)
      val msgs = Grib2.CamsGrib2Reader.open(tmp.toString).toSeq
      val df = graft.sources.Grib.toDataFrame(spark, msgs)
      assert(df.columns.toSeq === Seq("variable", "unit", "timestamp", "lat", "lon", "value"))
      assert(df.count() === 50)
      import org.apache.spark.sql.functions._
      val lonRange = df.agg(min("lon"), max("lon")).collect()(0)
      assert(lonRange.getFloat(0) >= -5.0f && lonRange.getFloat(1) < 0.0f ||
        lonRange.getFloat(0) >= -5.0f && lonRange.getFloat(1) <= 180.0f)
      assert(df.select("variable").distinct().collect().map(_.getString(0)).toSeq === Seq("pm10"))
    } finally Files.delete(tmp)
  }
}
