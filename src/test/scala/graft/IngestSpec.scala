package graft

import java.io.FileNotFoundException
import java.sql.Date
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Fetchers, LocalObjectStore}
import graft.sources.Fetchers.{CdsClient, EcmwfClient}

/** S3–S5/K2 — ingestion boundary: request building, horizon validation,
  * object-store round-trip (mirrors `tests/unit/test_ingestion_assets.py`
  * and `test_storage/test_object_store.py` invariants).
  */
class IngestSpec extends AnyFunSuite {

  test("S4: CDS request maps variables, hourly leadtimes 0..h, ensemble/00:00/grib") {
    val r = CdsClient.buildRequest(Date.valueOf("2026-01-15"),
      Seq("pm2p5", "pm10"), "/tmp/x.grib", maxLeadtimeHours = 48)
    assert(r.params("variable") === Seq("particulate_matter_2.5um", "particulate_matter_10um"))
    assert(r.params("leadtime_hour").length === 49)
    assert(r.params("leadtime_hour").head === "0" && r.params("leadtime_hour").last === "48")
    assert(r.params("model") === Seq("ensemble"))
    assert(r.params("time") === Seq("00:00"))
    assert(r.params("format") === Seq("grib"))
  }

  test("S4: horizon bounds and unknown variables rejected") {
    intercept[IllegalArgumentException](
      CdsClient.buildRequest(Date.valueOf("2026-01-15"), Seq("pm10"), "t", 0))
    intercept[IllegalArgumentException](
      CdsClient.buildRequest(Date.valueOf("2026-01-15"), Seq("pm10"), "t", 49))
    intercept[IllegalArgumentException](
      CdsClient.buildRequest(Date.valueOf("2026-01-15"), Seq("ozone"), "t", 24))
  }

  test("S5: ECMWF request uses 3-hourly steps filtered to horizon, fc/oper/sfc") {
    val r = EcmwfClient.buildRequest(Date.valueOf("2026-01-15"), "/tmp/y.grib", 10)
    assert(r.params("step") === Seq("0", "3", "6", "9"))
    assert(r.params("param") === Seq("2t", "2d"))
    assert(r.params("type") === Seq("fc"))
    assert(r.params("stream") === Seq("oper"))
    assert(r.params("levtype") === Seq("sfc"))
    val full = EcmwfClient.buildRequest(Date.valueOf("2026-01-15"), "/tmp/y.grib", 48)
    assert(full.params("step").length === 17)
  }

  test("S3/K2: object store round-trips by exact key; missing key → 404-like") {
    val root = Files.createTempDirectory("objstore").toString
    val store = new LocalObjectStore(root)
    val local = Files.createTempFile("payload", ".grib")
    Files.writeString(local, "grib-bytes")
    val key = "ads/cams-europe-air-quality-forecast/2026-01-15/run-1.grib"
    store.uploadRaw(local.toString, key)
    assert(store.exists(key))
    val out = Paths.get(Files.createTempDirectory("dl").toString, "dl.grib")
    store.downloadRaw(key, out.toString)
    assert(Files.readString(out) === "grib-bytes")
    intercept[FileNotFoundException](store.downloadRaw("missing/key.grib", out.toString))
  }

  test("transport abstraction produces the requested target") {
    val r = EcmwfClient.buildRequest(Date.valueOf("2026-01-15"),
      Files.createTempDirectory("f").toString + "/t.grib", 6)
    val produced = Fetchers.retrieveForecast(r,
      req => Files.writeString(Paths.get(req.target), "fake"))
    assert(Files.readString(Paths.get(produced)) === "fake")
  }
}
